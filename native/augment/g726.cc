/* ITU-T G.726 ADPCM codec at 16/24/32/40 kbps (2/3/4/5 bits per sample),
 * 8 kHz, implemented as the Recommendation's fixed-point state machine:
 * log-domain adaptive quantizer (4.2.2), inverse quantizer (4.2.3),
 * quantizer scale-factor adaptation with locked/unlocked speed control
 * (4.2.4), the 2-pole/6-zero adaptive predictor with sign-sign updates,
 * tone/transition detection, and the spec's 11-bit floating-point FMULT
 * arithmetic for the predictor filter.
 *
 * Covers the reference vocabulary entries g726[law=*,br=16k..40k]
 * (/root/reference/channel_simulation/simulated_channel.py:19-26).
 *
 * Tables are the Recommendation's quantizer/log tables (decision levels
 * in Q7 log2 units, reconstruction levels, W scale-factor multipliers,
 * F speed-control weights), recovered from the in-image reference
 * implementation's data section and verified by bit-exact cross-tests:
 * encoder code sequences and decoder PCM match ffmpeg's g726 for all
 * four rates (tests/test_g726_conformance.py).
 *
 * PCM interface: 16-bit convention (sl = s/4 inside, output << 2), like
 * the reference implementation, so streams are directly comparable.
 */

#include "augment.h"

#include <algorithm>
#include <cstdint>
#include <cstring>

namespace {

struct Float11 {
  uint8_t sign;
  uint8_t exp;
  uint16_t mant;
};

inline int log2_16bit(int x) {
  int n = 0;
  if (x >= 1 << 8) { x >>= 8; n += 8; }
  if (x >= 1 << 4) { x >>= 4; n += 4; }
  if (x >= 1 << 2) { x >>= 2; n += 2; }
  if (x >= 1 << 1) n += 1;
  return n;
}

inline Float11* i2f(int i, Float11* f) {
  f->sign = (i < 0);
  if (f->sign) i = -i;
  f->exp = static_cast<uint8_t>(log2_16bit(i) + (i ? 1 : 0));
  f->mant = static_cast<uint16_t>(i ? ((i << 6) >> f->exp) : (1 << 5));
  return f;
}

/* Spec FMULT: 11-bit float multiply used by the predictor filter. The
 * result truncates to 16 bits (the reference implementation returns it
 * through an int16). */
inline int fmult(const Float11* f1, const Float11* f2) {
  int exp = f1->exp + f2->exp;
  int res = ((f1->mant * f2->mant) + 0x30) >> 4;
  res = exp > 19 ? res << (exp - 19) : res >> (19 - exp);
  return static_cast<int16_t>((f1->sign ^ f2->sign) ? -res : res);
}

inline int clip(int v, int lo, int hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

inline int sgn(int v) { return v < 0 ? -1 : (v > 0 ? 1 : 0); }

const int kIntMax = 0x7fffffff;

/* Decision levels (Q7 log2), reconstruction levels (Q7 log2, -32768 =
 * -inf), W scale multipliers, F speed weights — ITU G.726 tables. */
const int kQuant16[2] = {260, kIntMax};
const int16_t kIq16[4] = {116, 365, 365, 116};
const int16_t kW16[4] = {-22, 439, 439, -22};
const uint8_t kF16[4] = {0, 7, 7, 0};

const int kQuant24[4] = {7, 217, 330, kIntMax};
const int16_t kIq24[8] = {-32768, 135, 273, 373, 373, 273, 135, -32768};
const int16_t kW24[8] = {-4, 30, 137, 582, 582, 137, 30, -4};
const uint8_t kF24[8] = {0, 1, 2, 7, 7, 2, 1, 0};

const int kQuant32[8] = {-125, 79, 177, 245, 299, 348, 399, kIntMax};
const int16_t kIq32[16] = {-32768, 4, 135, 213, 273, 323, 373, 425,
                           425, 373, 323, 273, 213, 135, 4, -32768};
const int16_t kW32[16] = {-12, 18, 41, 64, 112, 198, 355, 1122,
                          1122, 355, 198, 112, 64, 41, 18, -12};
const uint8_t kF32[16] = {0, 0, 0, 1, 1, 1, 3, 7, 7, 3, 1, 1, 1, 0, 0, 0};

const int kQuant40[16] = {-122, -16, 67, 138, 197, 249, 297, 338,
                          377, 412, 444, 474, 501, 527, 552, kIntMax};
const int16_t kIq40[32] = {-32768, -66, 28, 104, 169, 224, 274, 318,
                           358, 395, 429, 459, 488, 514, 539, 566,
                           566, 539, 514, 488, 459, 429, 395, 358,
                           318, 274, 224, 169, 104, 28, -66, -32768};
const int16_t kW40[32] = {14, 14, 24, 39, 40, 41, 58, 100,
                          141, 179, 219, 280, 358, 440, 529, 696,
                          696, 529, 440, 358, 280, 219, 179, 141,
                          100, 58, 41, 40, 39, 24, 14, 14};
const uint8_t kF40[32] = {0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 2, 3, 4, 5, 6, 6,
                          6, 6, 5, 4, 3, 2, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0};

struct Tables {
  const int* quant;
  const int16_t* iquant;
  const int16_t* W;
  const uint8_t* F;
};

inline Tables tables_for(int code_size) {
  switch (code_size) {
    case 2: return {kQuant16, kIq16, kW16, kF16};
    case 3: return {kQuant24, kIq24, kW24, kF24};
    case 5: return {kQuant40, kIq40, kW40, kF40};
    default: return {kQuant32, kIq32, kW32, kF32};
  }
}

struct G726 {
  Tables tbls;
  int code_size;
  int y, yu, yl;
  int dms, dml, ap;
  int a[2], b[6];
  int pk[2];
  Float11 sr[2], dq[6];
  int se, sez;
  int td;

  explicit G726(int cs) : tbls(tables_for(cs)), code_size(cs) {
    y = 544;
    yu = 544;
    yl = 34816;
    dms = dml = ap = 0;
    a[0] = a[1] = 0;
    for (int i = 0; i < 6; ++i) b[i] = 0;
    pk[0] = pk[1] = 1;
    for (int i = 0; i < 2; ++i) i2f(0, &sr[i]);
    for (int i = 0; i < 6; ++i) i2f(0, &dq[i]);
    se = sez = 0;
    td = 0;
  }

  /* Adaptive quantizer (4.2.2): d -> code. */
  int quantize(int d) const {
    int sign = 0, i = 0;
    if (d < 0) {
      sign = 1;
      d = -d;
    }
    int exp = log2_16bit(d);
    int dln = ((exp << 7) + (((d << 7) >> exp) & 0x7f)) - (y >> 2);
    while (tbls.quant[i] < kIntMax && tbls.quant[i] < dln) ++i;
    if (sign) i = ~i;
    if (code_size != 2 && i == 0)  /* spec: all-zero code is remapped */
      i = 0xff;
    return i & ((1 << code_size) - 1);
  }

  /* Inverse adaptive quantizer (4.2.3): code -> |dq|. */
  int inverse_quant(int i) const {
    int dql = tbls.iquant[i] + (y >> 2);
    int dex = (dql >> 7) & 0xf;
    int dqt = (1 << 7) + (dql & 0x7f);
    return (dql < 0) ? 0 : ((dqt << dex) >> 7);
  }

  /* Full decode step (shared by the encoder): code -> reconstructed
   * 14-bit sample, with all state adaptation. */
  int decode(int I) {
    const int i_sig = I >> (code_size - 1);
    int dqv = inverse_quant(I);

    /* transition detect (4.2.7) */
    int ylint = yl >> 15;
    int ylfrac = (yl >> 10) & 0x1f;
    int thr2 = (ylint > 9) ? (0x1f << 10) : ((0x20 + ylfrac) << ylint);
    int tr = (td == 1 && dqv > ((3 * thr2) >> 2));

    if (i_sig) dqv = -dqv;
    int re_signal = static_cast<int16_t>(se + dqv);

    /* predictor coefficient adaptation (4.2.5): the pole updates key on
     * the PARTIAL reconstruction p = sez + dq (spec PARREC), not on the
     * full signal estimate. */
    int pk0 = sgn(sez + dqv);
    int dq0 = sgn(dqv);
    if (tr) {
      a[0] = a[1] = 0;
      for (int i = 0; i < 6; ++i) b[i] = 0;
    } else {
      int fa1 = clip((-a[0] * pk[0] * pk0) >> 5, -256, 255);
      a[1] += 128 * pk0 * pk[1] + fa1 - (a[1] >> 7);
      a[1] = clip(a[1], -12288, 12288);
      a[0] += 64 * 3 * pk0 * pk[0] - (a[0] >> 8);
      a[0] = clip(a[0], -(15360 - a[1]), 15360 - a[1]);
      for (int i = 0; i < 6; ++i)
        b[i] += 128 * dq0 * (dq[i].sign ? -1 : 1) - (b[i] >> 8);
    }

    /* delay lines */
    pk[1] = pk[0];
    pk[0] = pk0 ? pk0 : 1;
    sr[1] = sr[0];
    i2f(re_signal, &sr[0]);
    for (int i = 5; i > 0; --i) dq[i] = dq[i - 1];
    i2f(dqv, &dq[0]);
    dq[0].sign = static_cast<uint8_t>(i_sig);  /* sign of the CODE */

    td = a[1] < -11776;

    /* speed control (4.2.4): exponential averages toward F<<9 / F<<11 */
    dms += (tbls.F[I] << 4) + ((-dms) >> 5);
    dml += (tbls.F[I] << 4) + ((-dml) >> 7);
    if (tr) {
      ap = 256;
    } else {
      ap += (-ap) >> 4;
      if (y <= 1535 || td ||
          std::abs((dms << 2) - dml) >= (dml >> 3))
        ap += 0x20;
    }

    /* scale factor adaptation (4.2.4) */
    yu = clip(y + tbls.W[I] + ((-y) >> 5), 544, 5120);
    yl += yu + ((-yl) >> 6);

    int al = (ap >= 256) ? (1 << 6) : (ap >> 2);
    y = (yl + (yu - (yl >> 6)) * al) >> 6;

    /* signal estimate for the next step */
    Float11 f;
    se = 0;
    for (int i = 0; i < 6; ++i) se += fmult(i2f(b[i] >> 2, &f), &dq[i]);
    sez = se >> 1;
    for (int i = 0; i < 2; ++i) se += fmult(i2f(a[i] >> 2, &f), &sr[i]);
    se >>= 1;

    return re_signal;
  }

  /* Decoder output conversion: 14-bit reconstruction -> 16-bit PCM,
   * clamped at +/-65535 before the int16 truncation (matches the
   * reference implementation's overflow behavior exactly). */
  static int16_t to_out16(int re) {
    int v = re << 2;
    if (v > 65535) v = 65535;
    if (v < -65535) v = -65535;
    return static_cast<int16_t>(v);
  }

  int encode(int sig16) {
    int i = quantize(sig16 / 4 - se);
    decode(i);
    return i;
  }
};

inline int to_pcm16(float v) {
  int s = static_cast<int>(v * 32768.0f + (v >= 0 ? 0.5f : -0.5f));
  return std::min(32767, std::max(-32768, s));
}

}  // namespace

extern "C" {

/* Encode float audio to one G.726 code per output byte (code_size =
 * bits per sample, 2..5). Returns the number of codes. */
long g726_encode(const float* in, size_t n, int code_size, uint8_t* out) {
  G726 st(code_size);
  for (size_t i = 0; i < n; ++i)
    out[i] = static_cast<uint8_t>(st.encode(to_pcm16(in[i])));
  return static_cast<long>(n);
}

/* Decode one-code-per-byte G.726 to float audio. */
long g726_decode(const uint8_t* codes, long n, int code_size, float* out) {
  G726 st(code_size);
  for (long i = 0; i < n; ++i)
    out[i] = static_cast<float>(G726::to_out16(
                 st.decode(codes[i] & ((1 << code_size) - 1)))) / 32768.0f;
  return n;
}

void g726_roundtrip(const float* in, float* out, size_t n,
                    int bits_per_sample) {
  G726 enc(bits_per_sample);
  G726 dec(bits_per_sample);
  for (size_t i = 0; i < n; ++i) {
    int code = enc.encode(to_pcm16(in[i]));
    out[i] = static_cast<float>(G726::to_out16(dec.decode(code))) / 32768.0f;
  }
}

}  /* extern "C" */
