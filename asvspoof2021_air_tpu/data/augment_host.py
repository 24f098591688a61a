"""ctypes binding to the native augmentation library (native/libaugment.so).

Builds the library on first use (g++ via the Makefile) and exposes the codec
/ DSP primitives over numpy float32 buffers. This is the bit-exact host tier
of the channel-simulation capability; the on-device jittable tier lives in
ops/augment.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB: Optional[ctypes.CDLL] = None

_FloatPtr = ctypes.POINTER(ctypes.c_float)
_U8Ptr = ctypes.POINTER(ctypes.c_uint8)


def _build() -> str:
    so = os.path.join(_NATIVE_DIR, "libaugment.so")
    if not os.path.exists(so):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    return so


def get_lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build())
        lib.g711_ulaw_roundtrip.argtypes = [_FloatPtr, _FloatPtr, ctypes.c_size_t]
        lib.g711_alaw_roundtrip.argtypes = [_FloatPtr, _FloatPtr, ctypes.c_size_t]
        lib.g726_roundtrip.argtypes = [_FloatPtr, _FloatPtr, ctypes.c_size_t,
                                       ctypes.c_int]
        lib.resample_sinc.argtypes = [_FloatPtr, ctypes.c_size_t, _FloatPtr,
                                      ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.resample_sinc.restype = ctypes.c_size_t
        lib.fft_convolve.argtypes = [_FloatPtr, ctypes.c_size_t, _FloatPtr,
                                     ctypes.c_size_t, _FloatPtr]
        lib.rms_normalize.argtypes = [_FloatPtr, _FloatPtr, ctypes.c_size_t,
                                      ctypes.c_float]
        lib.telephony_channel.argtypes = [_FloatPtr, _FloatPtr, ctypes.c_size_t,
                                          ctypes.c_int, ctypes.c_int]
        _LIB = lib
    return _LIB


def _as_f32(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32))


def _ptr(x: np.ndarray):
    return x.ctypes.data_as(_FloatPtr)


def g711_roundtrip(wave, law: str = "u") -> np.ndarray:
    x = _as_f32(wave)
    out = np.empty_like(x)
    fn = (get_lib().g711_ulaw_roundtrip if law == "u"
          else get_lib().g711_alaw_roundtrip)
    fn(_ptr(x), _ptr(out), x.size)
    return out


def g726_encode(wave, bits_per_sample: int = 4) -> np.ndarray:
    """Encode 8 kHz float audio to G.726 codes, one code per byte
    (native/augment/g726.cc; bit-exact vs the reference implementation,
    tests/test_g726_conformance.py)."""
    lib = get_lib()
    if not hasattr(lib.g726_encode, "_configured"):
        lib.g726_encode.argtypes = [_FloatPtr, ctypes.c_size_t,
                                    ctypes.c_int, _U8Ptr]
        lib.g726_encode.restype = ctypes.c_long
        lib.g726_decode.argtypes = [_U8Ptr, ctypes.c_long, ctypes.c_int,
                                    _FloatPtr]
        lib.g726_decode.restype = ctypes.c_long
        lib.g726_encode._configured = True
    x = _as_f32(wave)
    out = np.zeros(x.size, np.uint8)
    lib.g726_encode(_ptr(x), x.size, int(bits_per_sample),
                    out.ctypes.data_as(_U8Ptr))
    return out


def g726_decode(codes, bits_per_sample: int = 4) -> np.ndarray:
    """Decode one-code-per-byte G.726 to 8 kHz float audio."""
    g726_encode(np.zeros(0, np.float32), bits_per_sample)  # configure
    lib = get_lib()
    codes = np.ascontiguousarray(codes, np.uint8)
    out = np.empty(codes.size, np.float32)
    lib.g726_decode(codes.ctypes.data_as(_U8Ptr), codes.size,
                    int(bits_per_sample), _ptr(out))
    return out


def g726_roundtrip(wave, bits_per_sample: int = 4) -> np.ndarray:
    x = _as_f32(wave)
    out = np.empty_like(x)
    get_lib().g726_roundtrip(_ptr(x), _ptr(out), x.size, bits_per_sample)
    return out


def resample(wave, in_rate: int, out_rate: int, taps: int = 33) -> np.ndarray:
    x = _as_f32(wave)
    n_out = int(np.ceil(x.size * out_rate / in_rate)) + taps
    out = np.zeros(n_out, np.float32)
    written = get_lib().resample_sinc(_ptr(x), x.size, _ptr(out),
                                      in_rate, out_rate, taps)
    return out[:written]


def fft_convolve(wave, ir) -> np.ndarray:
    x = _as_f32(wave)
    h = _as_f32(ir)
    out = np.empty_like(x)
    get_lib().fft_convolve(_ptr(x), x.size, _ptr(h), h.size, _ptr(out))
    return out


def rms_normalize(wave, target_dbfs: float) -> np.ndarray:
    x = _as_f32(wave)
    out = np.empty_like(x)
    get_lib().rms_normalize(_ptr(x), _ptr(out), x.size, float(target_dbfs))
    return out


CODEC_IDS = {"g711u": 0, "g711a": 1, "g726_16k": 2, "g726_24k": 3,
             "g726_32k": 4, "g726_40k": 5, "gsmfr": 6}


def telephony_channel(wave, codec: str = "g711u", sample_rate: int = 16000) -> np.ndarray:
    """Full landline hop: resample to 8 kHz, codec round trip, resample back."""
    x = _as_f32(wave)
    out = np.empty_like(x)
    get_lib().telephony_channel(_ptr(x), _ptr(out), x.size, sample_rate,
                                CODEC_IDS[codec])
    return out


def acelp_channel(wave, codec_rate: int = 8000, bitrate_kbps: float = 12.2,
                  sample_rate: int = 16000) -> np.ndarray:
    """Analysis-by-synthesis ACELP hop (native/augment/acelp.cc): resample to
    the codec rate (8000 = AMR-NB/SILK-NB ladder, 16000 = AMR-WB/SILK-WB),
    code with the mode's pulse density, resample back."""
    lib = get_lib()
    if not hasattr(lib.acelp_channel, "_configured"):
        lib.acelp_channel.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_size_t, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ]
        lib.acelp_channel._configured = True
    x = _as_f32(wave)
    out = np.empty_like(x)
    lib.acelp_channel(_ptr(x), _ptr(out), x.size, sample_rate,
                      codec_rate, bitrate_kbps)
    return out


# AMR-NB storage frame sizes (bytes incl. TOC) for modes 0..7
AMRNB_MODE_BYTES = (13, 14, 16, 18, 20, 21, 27, 32)
AMRNB_MODE_NAMES = ("4k75", "5k15", "5k9", "6k7", "7k4", "7k95", "10k2",
                    "12k2")


# AMR-WB storage frame sizes (bytes incl. TOC) for modes 0..8
AMRWB_MODE_BYTES = (18, 24, 33, 37, 41, 47, 51, 59, 61)
AMRWB_MODE_NAMES = ("6k60", "8k85", "12k65", "14k25", "15k85", "18k25",
                    "19k85", "23k05", "23k85")


def amrwb_encode(wave, dtx: bool = False, mode: int = 2) -> bytes:
    """Encode 16 kHz float mono to AMR-WB storage frames at the given
    TS 26.201 mode (all 9 encoder modes, 0=6.60k .. 8=23.85k;
    native/augment/amrwb.cc: exact lavc-decode
    replica + AbS encoder on the binary-recovered 3GPP tables,
    tools/amrwb_tables/; RFC 4867 octet-aligned framing). Streams
    reach 0.85-0.93 waveform conformance on libavcodec's amrwb decoder
    (tools/amrwb_tables/measure_conf.py). With ``dtx`` silence runs
    carry SID updates (type 9) and NO_DATA frames, mirroring the NB
    design; lavc does not implement WB DTX either, so the DTX tier is
    structural (docs/CODECS.md)."""
    lib = get_lib()
    for fn in ("amrwb_encode_mode", "amrwb_encode_dtx_mode"):
        f = getattr(lib, fn)
        if not hasattr(f, "_configured"):
            f.argtypes = [
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_uint8)]
            f.restype = ctypes.c_long
            f._configured = True
    sig = np.ascontiguousarray(wave, np.float32)
    out = np.zeros((len(sig) // 320 + 4) * 61, np.uint8)
    enc = lib.amrwb_encode_dtx_mode if dtx else lib.amrwb_encode_mode
    n = enc(mode, sig.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(sig), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return bytes(out[:max(n, 0)].tobytes())


def amrwb_decode(data: bytes) -> np.ndarray:
    """Decode AMR-WB 12.65k storage frames to 16 kHz float mono
    (native tracking decoder; lavc is the oracle tier)."""
    lib = get_lib()
    if not hasattr(lib.amrwb_decode, "_configured"):
        lib.amrwb_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_float), ctypes.c_size_t]
        lib.amrwb_decode.restype = ctypes.c_long
        lib.amrwb_decode._configured = True
    buf = np.frombuffer(data, np.uint8)
    # size by walking the TOCs: DTX streams carry 1-byte NO_DATA and
    # 6-byte SID frames (same fix as amrnb_decode); speech frames may
    # be any of the 9 TS 26.201 modes
    sizes = {m: AMRWB_MODE_BYTES[m] for m in range(9)}
    sizes.update({9: 6, 15: 1})
    nframes, pos = 0, 0
    while pos < len(data):
        step = sizes.get((data[pos] >> 3) & 0x0F)
        if step is None:
            nframes = len(data)
            break
        nframes += 1
        pos += step
    out = np.zeros(max(nframes, 1) * 320, np.float32)
    n = lib.amrwb_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(out))
    return out[:max(n, 0)].copy()


def amrwb_channel(wave, sample_rate: int = 16000,
                  dtx: bool = False, mode: int = 2) -> np.ndarray:
    """Real AMR-WB hop at the given mode: resample to 16 kHz, full
    bitstream round trip (VAD/SID-gated when ``dtx``), resample back.
    Matches the reference's amrwb[br=6k6/12k65/15k85/23k05] entries
    (/root/reference/channel_simulation/simulated_channel.py:33-35;
    dtx is the 3GPP default there, `nodtx` the variant)."""
    lib = get_lib()
    for fn in ("amrwb_roundtrip_mode", "amrwb_roundtrip_dtx_mode"):
        f = getattr(lib, fn)
        if not hasattr(f, "_configured"):
            f.argtypes = [
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.c_size_t]
            f._configured = True
    x = _as_f32(wave)
    if sample_rate != 16000:
        x = _as_f32(resample(x, sample_rate, 16000))
    out = np.empty_like(x)
    rt = (lib.amrwb_roundtrip_dtx_mode if dtx
          else lib.amrwb_roundtrip_mode)
    rt(mode, _ptr(x), _ptr(out), x.size)
    if sample_rate != 16000:
        out = resample(out, 16000, sample_rate)[: np.asarray(wave).size]
        pad = np.asarray(wave).size - out.size
        if pad > 0:
            out = np.concatenate([out, np.zeros(pad, np.float32)])
    return out


def amrnb_encode(wave, mode: int = 7, dtx: bool = False) -> bytes:
    """Encode 8 kHz float mono to real AMR-NB storage frames at the
    given mode (0..7 = 4.75..12.2 kbps; native/augment/amrnb.cc +
    amrnb_low.cc: from-scratch codecs against probe-recovered 3GPP
    tables; RFC 4867 octet-aligned framing). With ``dtx`` the stream is
    VAD-gated: silence runs carry SID comfort-noise updates (type 8)
    and NO_DATA frames (type 15) — the reference's dtx-default entries.
    DTX streams decode with amrnb_decode but NOT with the in-image lavc
    (it rejects SID frames; see docs/CODECS.md)."""
    lib = get_lib()
    for fn in ("amrnb_encode_mode", "amrnb_encode_dtx"):
        f = getattr(lib, fn)
        if not hasattr(f, "_configured"):
            f.argtypes = [
                ctypes.c_int, ctypes.POINTER(ctypes.c_float),
                ctypes.c_size_t, ctypes.POINTER(ctypes.c_uint8)]
            f.restype = ctypes.c_long
            f._configured = True
    if not 0 <= mode <= 7:
        raise ValueError(f"AMR-NB mode {mode} out of range")
    x = _as_f32(wave)
    fb = AMRNB_MODE_BYTES[mode]
    out = np.zeros(((x.size + 159) // 160) * fb, np.uint8)
    enc = lib.amrnb_encode_dtx if dtx else lib.amrnb_encode_mode
    n = enc(mode, _ptr(x), x.size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if n < 0:
        raise ValueError(f"AMR-NB encode failed (mode {mode})")
    return bytes(out[:n])


def amrnb_decode(data: bytes) -> np.ndarray:
    """Decode AMR-NB storage frames (any mode, per-frame TOC dispatch)
    to 8 kHz float mono (native decoder replicas; lavc via
    interop/avcodec.py is the oracle tier)."""
    lib = get_lib()
    if not hasattr(lib.amrnb_decode_any, "_configured"):
        lib.amrnb_decode_any.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_float), ctypes.c_size_t]
        lib.amrnb_decode_any.restype = ctypes.c_long
        lib.amrnb_decode_any._configured = True
    buf = np.frombuffer(data, np.uint8)
    # Size the output for the actual frame count by walking the TOCs:
    # DTX streams carry 1-byte NO_DATA and 6-byte SID frames, so the
    # old >=13-bytes/frame assumption undercounted and the C decoder
    # silently truncated at max_samples (round-4 advisor finding).
    sizes = {8: 6, 15: 1}
    sizes.update({m: b for m, b in enumerate(AMRNB_MODE_BYTES)})
    nframes, pos = 0, 0
    while pos < len(data):
        ft = (data[pos] >> 3) & 0x0F
        step = sizes.get(ft)
        if step is None:  # unknown frame type: let the C decoder reject
            nframes = len(data)
            break
        nframes += 1
        pos += step
    out = np.zeros(max(nframes, 1) * 160, np.float32)
    n = lib.amrnb_decode_any(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.size, _ptr(out), out.size)
    if n < 0:
        raise ValueError("not a decodable AMR-NB stream")
    return out[:n]


def amrnb_channel(wave, sample_rate: int = 16000, mode: int = 7,
                  dtx: bool = False) -> np.ndarray:
    """Real AMR-NB telephony hop: resample to 8 kHz, full bitstream
    round trip at the given mode (VAD/SID-gated when ``dtx``), resample
    back. Matches the reference's amr[br=*] channel entries
    (/root/reference/channel_simulation/simulated_channel.py:30-35;
    dtx is the 3GPP default there, `nodtx` the variant)."""
    lib = get_lib()
    for fn in ("amrnb_roundtrip_mode", "amrnb_roundtrip_dtx"):
        f = getattr(lib, fn)
        if not hasattr(f, "_configured"):
            f.argtypes = [
                ctypes.c_int, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.c_size_t]
            f._configured = True
    x = _as_f32(wave)
    if sample_rate != 8000:
        x = _as_f32(resample(x, sample_rate, 8000))
    out = np.empty_like(x)
    rt = lib.amrnb_roundtrip_dtx if dtx else lib.amrnb_roundtrip_mode
    rt(mode, _ptr(x), _ptr(out), x.size)
    if sample_rate != 8000:
        out = resample(out, 8000, sample_rate)[: np.asarray(wave).size]
        pad = np.asarray(wave).size - out.size
        if pad > 0:
            out = np.concatenate([out, np.zeros(pad, np.float32)])
    return out


def mdct_codec(wave, bitrate_kbps: float, kind: str = "mp3",
               sample_rate: int = 16000) -> np.ndarray:
    """Transform-codec round trip (native/augment/mdct.cc): MDCT band
    quantization under the mode's bit budget (mp3: 576-coefficient
    granules, aac: 1024). Superseded for the compression augmentation by
    the real bitstream codecs (mp3_codec / aac_codec); kept as the fast
    transform-class approximation and the on-device tier's host
    counterpart."""
    lib = get_lib()
    if not hasattr(lib.mdct_codec_roundtrip, "_configured"):
        lib.mdct_codec_roundtrip.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_size_t, ctypes.c_int, ctypes.c_float, ctypes.c_int,
        ]
        lib.mdct_codec_roundtrip._configured = True
    x = _as_f32(wave)
    out = np.empty_like(x)
    half = 576 if kind == "mp3" else 1024
    lib.mdct_codec_roundtrip(_ptr(x), _ptr(out), x.size, sample_rate,
                             bitrate_kbps, half)
    return out


def mp3_codec(wave, bitrate_kbps: float, sample_rate: int = 16000) -> np.ndarray:
    """Real MPEG Layer III round trip (native/augment/mp3.cc): from-scratch
    encoder (polyphase analysis, MDCT, Huffman, bit reservoir) + decoder.
    16 kHz runs MPEG-2 LSF natively at 8..160 kbps — the reference's DF
    compression tier uses mp3 at 8/16/32 kbps
    (/root/reference/channel_simulation/simulated_compression.py:11-13).
    Output is delay-aligned with the input."""
    lib = get_lib()
    if not hasattr(lib.mp3_roundtrip, "_configured"):
        lib.mp3_roundtrip.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_size_t, ctypes.c_int, ctypes.c_float,
        ]
        lib.mp3_roundtrip._configured = True
    x = _as_f32(wave)
    out = np.empty_like(x)
    lib.mp3_roundtrip(_ptr(x), _ptr(out), x.size, sample_rate, bitrate_kbps)
    return out


def mp3_encode(wave, bitrate_kbps: int, sample_rate: int = 16000) -> bytes:
    """Encode to actual .mp3 bytes (valid standard frames; used by tests
    and available for artifact export)."""
    lib = get_lib()
    if not hasattr(lib.mp3_encode, "_configured"):
        lib.mp3_encode.restype = ctypes.c_long
        lib.mp3_encode.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_size_t, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
        ]
        lib.mp3_encode_bound.restype = ctypes.c_size_t
        lib.mp3_encode_bound.argtypes = [
            ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
        ]
        lib.mp3_encode._configured = True
    x = _as_f32(wave)
    cap = lib.mp3_encode_bound(x.size, sample_rate, int(bitrate_kbps))
    buf = (ctypes.c_uint8 * cap)()
    n = lib.mp3_encode(_ptr(x), x.size, sample_rate, int(bitrate_kbps),
                       buf, cap)
    if n < 0:
        raise ValueError(
            f"unsupported mp3 config: {sample_rate} Hz @ {bitrate_kbps} kbps")
    return bytes(buf[:n])


def mp3_decode(data: bytes):
    """Decode .mp3 bytes -> (float32 pcm, sample_rate)."""
    lib = get_lib()
    if not hasattr(lib.mp3_decode, "_configured"):
        lib.mp3_decode.restype = ctypes.c_long
        lib.mp3_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_float), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.mp3_decode._configured = True
    arr = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    out = np.zeros(max(4096, len(data) * 60), np.float32)
    sr = ctypes.c_int(0)
    n = lib.mp3_decode(arr, len(data), _ptr(out), out.size,
                       ctypes.byref(sr))
    if n < 0:
        raise ValueError("malformed mp3 stream")
    return out[:n], sr.value


def aac_codec(wave, bitrate_kbps: float,
              sample_rate: int = 16000) -> np.ndarray:
    """Real AAC-LC round trip (native/augment/aac.cc): from-scratch
    encoder (sine-window MDCT, two-loop scalefactor search, spectral
    Huffman books, ADTS framing with a bit reservoir) + matching decoder.
    Mono 16/8 kHz — the reference's DF compression tier uses aac at
    8/16/32 kbps
    (/root/reference/channel_simulation/simulated_compression.py:11-13).
    Output is delay-aligned with the input."""
    lib = get_lib()
    if not hasattr(lib.aac_roundtrip, "_configured"):
        lib.aac_roundtrip.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_size_t, ctypes.c_int, ctypes.c_float,
        ]
        lib.aac_roundtrip._configured = True
    x = _as_f32(wave)
    out = np.empty_like(x)
    lib.aac_roundtrip(_ptr(x), _ptr(out), x.size, sample_rate, bitrate_kbps)
    return out


def aac_encode(wave, bitrate_kbps: int, sample_rate: int = 16000) -> bytes:
    """Encode to actual AAC-LC ADTS bytes (valid standard frames; used by
    tests and available for artifact export)."""
    lib = get_lib()
    if not hasattr(lib.aac_encode, "_configured"):
        lib.aac_encode.restype = ctypes.c_long
        lib.aac_encode.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_size_t, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
        ]
        lib.aac_encode_bound.restype = ctypes.c_size_t
        lib.aac_encode_bound.argtypes = [
            ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
        ]
        lib.aac_encode._configured = True
    x = _as_f32(wave)
    cap = lib.aac_encode_bound(x.size, sample_rate, int(bitrate_kbps))
    buf = (ctypes.c_uint8 * cap)()
    n = lib.aac_encode(_ptr(x), x.size, sample_rate, int(bitrate_kbps),
                       buf, cap)
    if n < 0:
        raise ValueError(
            f"unsupported aac config: {sample_rate} Hz @ {bitrate_kbps} kbps")
    return bytes(buf[:n])


def aac_decode(data: bytes):
    """Decode AAC-LC ADTS bytes -> (float32 pcm, sample_rate).  Covers this
    encoder's emission set (mono SCE, long sine windows); see
    native/augment/aac.cc."""
    lib = get_lib()
    if not hasattr(lib.aac_decode, "_configured"):
        lib.aac_decode.restype = ctypes.c_long
        lib.aac_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_float), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.aac_decode._configured = True
    arr = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    out = np.zeros(max(8192, len(data) * 120), np.float32)
    sr = ctypes.c_int(0)
    n = lib.aac_decode(arr, len(data), _ptr(out), out.size,
                       ctypes.byref(sr))
    if n < 0:
        raise ValueError("malformed aac stream")
    return out[:n], sr.value


def frame_erasure(wave, loss_pct: float, seed: int = 0,
                  frame: int = 320) -> np.ndarray:
    """Packet-loss simulation for the SILK loss=N variants: each 20 ms frame
    is dropped with probability loss_pct/100 and concealed by repeating the
    previous frame (capability of the acoustic-simulator's loss option,
    /root/reference/channel_simulation/simulated_channel.py:22-31)."""
    x = _as_f32(wave).copy()
    g = np.random.default_rng(seed)
    prev = np.zeros(frame, np.float32)
    for pos in range(0, len(x) - frame + 1, frame):
        if g.random() * 100.0 < loss_pct:
            x[pos:pos + frame] = prev
        else:
            prev = x[pos:pos + frame]
    return x


def _configure_gsmfr(lib):
    if not hasattr(lib.gsmfr_roundtrip, "_configured"):
        fptr = ctypes.POINTER(ctypes.c_float)
        u8ptr = ctypes.POINTER(ctypes.c_uint8)
        lib.gsmfr_roundtrip.argtypes = [fptr, fptr, ctypes.c_size_t]
        lib.gsmfr_encode.argtypes = [fptr, ctypes.c_size_t, u8ptr]
        lib.gsmfr_encode.restype = ctypes.c_long
        lib.gsmfr_decode.argtypes = [u8ptr, ctypes.c_long, fptr]
        lib.gsmfr_decode.restype = ctypes.c_long
        lib.gsmfr_roundtrip._configured = True


def gsmfr_roundtrip(wave) -> np.ndarray:
    """GSM 06.10 Full-Rate encode->decode at 8 kHz (native RPE-LTP,
    native/augment/gsmfr.cc). Input/output are 8 kHz float; use
    telephony_channel(wave, 'gsmfr') for the full 16 kHz hop."""
    lib = get_lib()
    _configure_gsmfr(lib)
    x = _as_f32(wave)
    out = np.empty_like(x)
    lib.gsmfr_roundtrip(_ptr(x), _ptr(out), x.size)
    return out


def gsmfr_encode(wave) -> bytes:
    """Encode 8 kHz float audio to packed 33-byte GSM frames."""
    lib = get_lib()
    _configure_gsmfr(lib)
    x = _as_f32(wave)
    n_frames = -(-x.size // 160)
    out = np.zeros(n_frames * 33, np.uint8)
    n = lib.gsmfr_encode(_ptr(x), x.size,
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out[: n * 33].tobytes()


def gsmfr_decode(frames: bytes) -> np.ndarray:
    """Decode packed 33-byte GSM frames to 8 kHz float audio."""
    lib = get_lib()
    _configure_gsmfr(lib)
    buf = np.frombuffer(frames, np.uint8)
    n_frames = buf.size // 33
    out = np.empty(n_frames * 160, np.float32)
    n = lib.gsmfr_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_frames,
        _ptr(out))
    if n < 0:
        raise ValueError("bad GSM frame magic")
    return out[:n]


def _configure_g722(lib):
    if not hasattr(lib.g722_roundtrip, "_configured"):
        fptr = ctypes.POINTER(ctypes.c_float)
        u8ptr = ctypes.POINTER(ctypes.c_uint8)
        lib.g722_roundtrip.argtypes = [fptr, fptr, ctypes.c_size_t,
                                       ctypes.c_int]
        lib.g722_encode.argtypes = [fptr, ctypes.c_size_t, u8ptr]
        lib.g722_encode.restype = ctypes.c_long
        lib.g722_decode.argtypes = [u8ptr, ctypes.c_long, fptr, ctypes.c_int]
        lib.g722_decode.restype = ctypes.c_long
        lib.g722_roundtrip._configured = True


def g729_encode(wave) -> bytes:
    """Encode 8 kHz float mono to raw ITU-T G.729 frames (10 bytes per
    10 ms; native/augment/g729.cc: AbS encoder against a decoder
    replica whose EXCITATION is bit-exact vs the in-image lavc `g729`
    — tools/g729_tables/FACTS.md). Streams reach 0.90 waveform
    conformance on lavc's decoder."""
    lib = get_lib()
    f = lib.g729_encode
    if not hasattr(f, "_configured"):
        f.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_size_t,
                      ctypes.POINTER(ctypes.c_uint8)]
        f.restype = ctypes.c_long
        f._configured = True
    sig = np.ascontiguousarray(wave, np.float32)
    out = np.zeros((len(sig) // 80 + 2) * 10, np.uint8)
    n = f(sig.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(sig),
          out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return bytes(out[:max(n, 0)].tobytes())


def g729_decode(data: bytes) -> np.ndarray:
    """Decode raw G.729 frames to 8 kHz float mono (bit-exact
    excitation replica + structural postfilter + exact 100 Hz HPF)."""
    lib = get_lib()
    f = lib.g729_decode
    if not hasattr(f, "_configured"):
        f.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
                      ctypes.POINTER(ctypes.c_float), ctypes.c_size_t]
        f.restype = ctypes.c_long
        f._configured = True
    buf = np.frombuffer(data, np.uint8)
    out = np.zeros((len(data) // 10 + 1) * 80, np.float32)
    n = f(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
          out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(out))
    return out[:max(n, 0)].copy()


def g729_channel(wave, sample_rate: int = 16000) -> np.ndarray:
    """Real G.729 hop: resample to 8 kHz, full bitstream round trip,
    resample back (the reference's `g729a` common-tier entry,
    /root/reference/channel_simulation/simulated_channel.py:36-39)."""
    lib = get_lib()
    f = lib.g729_roundtrip
    if not hasattr(f, "_configured"):
        f.argtypes = [ctypes.POINTER(ctypes.c_float),
                      ctypes.POINTER(ctypes.c_float), ctypes.c_size_t]
        f._configured = True
    x = _as_f32(wave)
    if sample_rate != 8000:
        x = _as_f32(resample(x, sample_rate, 8000))
    out = np.empty_like(x)
    f(_ptr(x), _ptr(out), x.size)
    if sample_rate != 8000:
        out = resample(out, 8000, sample_rate)[: np.asarray(wave).size]
        pad = np.asarray(wave).size - out.size
        if pad > 0:
            out = np.concatenate([out, np.zeros(pad, np.float32)])
    return out


_G722_MODES = {64: 1, 56: 2, 48: 3}


def g722_roundtrip(wave, kbps: int = 64) -> np.ndarray:
    """ITU-T G.722 sub-band ADPCM encode->decode at 16 kHz
    (native/augment/g722.cc). kbps in {64, 56, 48}: the embedded modes of
    the reference vocabulary g722[br=64k|56k|48k]
    (/root/reference/channel_simulation/simulated_channel.py:36)."""
    lib = get_lib()
    _configure_g722(lib)
    if int(kbps) not in _G722_MODES:
        raise ValueError(
            f"G.722 has embedded modes 64/56/48 kbps, got {kbps}"
        )
    x = _as_f32(wave)
    out = np.empty_like(x)
    lib.g722_roundtrip(_ptr(x), _ptr(out), x.size, _G722_MODES[int(kbps)])
    return out


def g722_encode(wave) -> bytes:
    """Encode 16 kHz float audio to the G.722 bitstream (1 byte / 2 samples,
    full 64 kbps embedded codes; lower modes drop decoder bits)."""
    lib = get_lib()
    _configure_g722(lib)
    x = _as_f32(wave)
    out = np.zeros(x.size // 2 + 1, np.uint8)
    n = lib.g722_encode(_ptr(x), x.size,
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out[:n].tobytes()


def g722_decode(codes: bytes, kbps: int = 64) -> np.ndarray:
    """Decode a G.722 bitstream to 16 kHz float audio at the given mode."""
    lib = get_lib()
    _configure_g722(lib)
    if int(kbps) not in _G722_MODES:
        raise ValueError(
            f"G.722 has embedded modes 64/56/48 kbps, got {kbps}"
        )
    buf = np.frombuffer(codes, np.uint8)
    out = np.empty(buf.size * 2, np.float32)
    n = lib.g722_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size,
        _ptr(out), _G722_MODES[int(kbps)])
    return out[:n]


def flac_decode(data: bytes):
    """Decode a FLAC stream via the native decoder.

    Returns (samples (n, channels) int32, sample_rate, bits_per_sample) or
    raises ValueError on malformed input.
    """
    lib = get_lib()
    if not hasattr(lib.flac_decode, "_configured"):
        lib.flac_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.flac_decode.restype = ctypes.c_long
        lib.flac_stream_info.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.flac_stream_info.restype = ctypes.c_long
        lib.flac_decode._configured = True

    buf = np.frombuffer(data, dtype=np.uint8)
    sr = ctypes.c_int(0)
    nch = ctypes.c_int(0)
    bps = ctypes.c_int(0)
    data_ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    # Size the output from STREAMINFO's total-samples field; total == 0 is
    # the spec's "unknown", fall back to a growable size estimate so highly
    # compressible streams (long silence) are never silently truncated.
    total = lib.flac_stream_info(data_ptr, buf.size, ctypes.byref(sr),
                                 ctypes.byref(nch), ctypes.byref(bps))
    if total < 0:
        raise ValueError("malformed FLAC stream")
    channels = max(nch.value, 1)
    # Sanity-bound the header's 36-bit total-samples field (corrupt headers
    # would otherwise force absurd allocations); out-of-bound totals fall
    # back to the growable unknown-length path.
    cap = min(max(len(data) * 1024, 1 << 16), 1 << 28)
    trusted = 0 < total <= cap
    max_samples = total if trusted else max(len(data) * 4, 1 << 16)
    while True:
        out = np.empty(max_samples * channels, np.int32)
        n = lib.flac_decode(
            data_ptr, buf.size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_samples, ctypes.byref(sr), ctypes.byref(nch), ctypes.byref(bps),
        )
        if n < 0:
            raise ValueError("malformed FLAC stream")
        if n < max_samples or trusted:
            break
        max_samples *= 4  # unknown length and the buffer filled: grow
    samples = out[: n * nch.value].reshape(n, nch.value).copy()
    return samples, sr.value, bps.value
