/* Native augmentation library: codecs, resampling, IR convolution, leveling.
 *
 * Host-side C++ tier of the channel-simulation capability
 * (/root/reference/channel_simulation/): where the reference shells out to an
 * external acoustic-simulator per (file, codec), this library provides the
 * codec and filtering primitives in-process behind a C API (ctypes-friendly).
 *
 * All audio buffers are mono float32 in [-1, 1].
 */

#ifndef ASVSPOOF_AUGMENT_H_
#define ASVSPOOF_AUGMENT_H_

#include <cstddef>
#include <cstdint>

extern "C" {

/* ---- G.711 (bit-exact ITU companding) ---- */
/* encode float [-1,1] -> 8-bit code; decode back. Round trip applies the
 * exact 8-bit companded quantization of a G.711 landline hop. */
void g711_ulaw_roundtrip(const float* in, float* out, size_t n);
void g711_alaw_roundtrip(const float* in, float* out, size_t n);
uint8_t g711_ulaw_encode_sample(int16_t pcm);
int16_t g711_ulaw_decode_sample(uint8_t code);
uint8_t g711_alaw_encode_sample(int16_t pcm);
int16_t g711_alaw_decode_sample(uint8_t code);

/* ---- G.726 ADPCM (adaptive quantizer + 2-pole/6-zero adaptive predictor).
 * bits_per_sample in {2,3,4,5} => 16/24/32/40 kbps at 8 kHz. Round trip
 * encodes then decodes in one pass (faithful algorithmic implementation of
 * the ADPCM structure; not validated against ITU bit-exact test vectors). */
void g726_roundtrip(const float* in, float* out, size_t n, int bits_per_sample);

/* ---- Windowed-sinc rational resampler (e.g. 16000 <-> 8000). Returns the
 * number of output samples written (caller sizes out as
 * ceil(n * out_rate / in_rate) + taps). */
size_t resample_sinc(const float* in, size_t n, float* out,
                     int in_rate, int out_rate, int taps);

/* ---- FFT-based IR convolution: y[0..n) = (x * ir)[0..n). */
void fft_convolve(const float* x, size_t n, const float* ir, size_t k,
                  float* out);

/* ---- RMS level normalization to target dBFS. */
void rms_normalize(const float* in, float* out, size_t n, float target_dbfs);

/* ---- GSM 06.10 Full-Rate (RPE-LTP), 8 kHz, 160-sample frames, 260 bits
 * packed as 33 bytes with a 0xD magic nibble. gsmfr_encode returns frames
 * written (out sized ceil(n/160)*33); gsmfr_decode returns samples written
 * or -1 on a bad magic nibble; gsmfr_roundtrip is encode->decode. */
long gsmfr_encode(const float* in, size_t n, uint8_t* out);
long gsmfr_decode(const uint8_t* in, long n_frames, float* out);
void gsmfr_roundtrip(const float* in, float* out, size_t n);

/* ---- ITU-T G.722 wideband sub-band ADPCM, 16 kHz native (no resampling
 * hop). 24-tap QMF band split + embedded low-band ADPCM (6/5/4-bit) +
 * 2-bit high-band ADPCM. One 8-bit code per two samples; mode selects the
 * decoder's low-band depth: 1=64k (6-bit), 2=56k (5-bit), 3=48k (4-bit).
 * g722_encode returns codes written (out sized n/2); g722_decode returns
 * samples written (out sized 2*n_codes). */
long g722_encode(const float* in, size_t n, uint8_t* out);
long g722_decode(const uint8_t* codes, long n_codes, float* out, int mode);
void g722_roundtrip(const float* in, float* out, size_t n, int mode);

/* ---- Generic ACELP codec (analysis-by-synthesis CELP with an
 * interleaved-track algebraic codebook; AMR-matched frame structure and
 * mode ladder, not 3GPP bit-compatible). sample_rate 8000 (NB, LP order 10)
 * or 16000 (WB, order 16); bitrate_kbps selects the pulse density.
 * acelp_channel wraps the resample-to-codec-rate hop. */
void acelp_roundtrip(const float* in, float* out, size_t n, int sample_rate,
                     float bitrate_kbps);
void acelp_channel(const float* in, float* out, size_t n, int in_rate,
                   int codec_rate, float bitrate_kbps);

/* ---- AMR-NB MR122 (12.2 kbps): real 3GPP-interoperable bitstreams from
 * probe-recovered tables (native/augment/amrnb.cc; tools/amr_tables/).
 * 8 kHz mono. amrnb_encode emits RFC 4867 octet-aligned storage frames
 * (32 bytes/frame incl. TOC 0x3C; size out as ceil(n/160)*32) and
 * returns bytes written. amrnb_decode returns samples written or -1 on
 * a non-12.2 frame type. amrnb_roundtrip is encode->decode at 8 kHz. */
long amrnb_encode(const float* in, size_t n, uint8_t* out);
long amrnb_decode(const uint8_t* data, size_t size, float* out,
                  size_t max_samples);
void amrnb_roundtrip(const float* in, float* out, size_t n);

/* ---- AMR-NB low-rate modes 0..6 (4.75 - 10.2 kbps): real bitstreams
 * from the same probe-recovered table campaign (amrnb_low.cc;
 * tools/amr_tables/ FACTS.md "Low-mode"). amrnb_encode_mode emits
 * storage frames of {13,14,16,18,20,21,27,32} bytes for modes 0..7
 * (mode 7 delegates to amrnb_encode); amrnb_decode_any dispatches on
 * each frame's TOC (12.2-only streams delegate to amrnb_decode);
 * amrnb_roundtrip_mode is encode->decode at 8 kHz. */
long amrnb_encode_mode(int mode, const float* in, size_t n, uint8_t* out);
long amrnb_decode_any(const uint8_t* data, size_t size, float* out,
                      size_t max_samples);
void amrnb_roundtrip_mode(int mode, const float* in, float* out, size_t n);

/* ---- DTX (the dtx-default amr entries): VAD-gated speech frames with
 * SID comfort-noise updates (frame type 8, 6 bytes, own payload layout
 * — the in-image lavc decoder rejects SID, so this tier is oracle-free)
 * and NO_DATA frames (type 15, TOC only). amrnb_decode_any decodes
 * DTX streams; lavc does not. */
long amrnb_encode_dtx(int mode, const float* in, size_t n, uint8_t* out);
void amrnb_roundtrip_dtx(int mode, const float* in, float* out, size_t n);

/* ---- Transform-codec (MDCT) round trip for the mp3/aac compression
 * tier: band-grouped quantization under the mode's bit budget. frame_half:
 * 576 (mp3 granule) or 1024 (aac). */
void mdct_codec_roundtrip(const float* in, float* out, size_t n,
                          int sample_rate, float bitrate_kbps,
                          int frame_half);

/* ---- Full telephony channel: resample to 8k, codec, resample back to
 * in_rate. codec: 0=g711u, 1=g711a, 2..5=g726 with 2..5 bits, 6=gsmfr. */
void telephony_channel(const float* in, float* out, size_t n, int in_rate,
                       int codec);

/* ---- MPEG Layer III (mp3) codec, from scratch (mp3.cc). 16 kHz mono is
 * MPEG-2 LSF (8..160 kbps); 32/44.1/48 kHz are MPEG-1 (32..320 kbps).
 * mp3_encode returns bytes written or -1; size `out` via mp3_encode_bound.
 * mp3_decode returns samples written or -1. mp3_roundtrip is the
 * compression-augmentation hop (encode+decode+delay alignment), matching
 * /root/reference/channel_simulation/simulated_compression.py:11-13. */
long mp3_encode(const float* in, size_t n, int sample_rate, int kbps,
                uint8_t* out, size_t out_cap);
size_t mp3_encode_bound(size_t n, int sample_rate, int kbps);
long mp3_decode(const uint8_t* data, size_t size, float* out,
                size_t max_samples, int* sample_rate_out);
void mp3_roundtrip(const float* in, float* out, size_t n, int sample_rate,
                   float bitrate_kbps);

/* ---- MPEG-2/4 AAC-LC codec, from scratch (aac.cc). Mono, 16/8 kHz,
 * long sine windows, ADTS framing. aac_encode returns bytes written or
 * -1; size `out` via aac_encode_bound. aac_decode returns samples written
 * or -1 (decodes this encoder's emission set; libavcodec is the wider
 * conformance oracle). aac_roundtrip is the compression-augmentation hop
 * (encode+decode+delay alignment), matching
 * /root/reference/channel_simulation/simulated_compression.py:11-13. */
long aac_encode(const float* in, size_t n, int sample_rate, int kbps,
                uint8_t* out, size_t out_cap);
size_t aac_encode_bound(size_t n, int sample_rate, int kbps);
long aac_decode(const uint8_t* data, size_t size, float* out,
                size_t max_samples, int* sample_rate_out);
void aac_roundtrip(const float* in, float* out, size_t n, int sample_rate,
                   float bitrate_kbps);

/* ---- FLAC decoding (native, no external deps). Returns samples written
 * PER CHANNEL into `out` (interleaved int32, sign-extended to the stream's
 * bit depth), or -1 on malformed input. */
long flac_decode(const uint8_t* data, size_t size, int32_t* out,
                 size_t max_samples, int* sample_rate, int* channels,
                 int* bits_per_sample);

}  /* extern "C" */

#endif  /* ASVSPOOF_AUGMENT_H_ */
