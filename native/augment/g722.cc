/* ITU-T G.722 wideband sub-band ADPCM codec (64 / 56 / 48 kbps), 16 kHz.
 *
 * The reference channel vocabulary includes g722[br=64k|56k|48k]
 * (/root/reference/channel_simulation/simulated_channel.py:36), produced
 * there by shelling out to the external acoustic-simulator. Here it is a
 * real in-process implementation of the Recommendation's signal flow in
 * fixed point:
 *
 *   - 24-tap quadrature-mirror analysis filter splits the 16 kHz input
 *     into two 8 kHz sub-bands (0-4 kHz, 4-8 kHz);
 *   - low band: embedded 60-level (6-bit) adaptive quantizer whose
 *     predictor adapts on the 4-bit core codes only, so the two LSBs can
 *     be dropped (56k / 48k modes) without encoder/decoder divergence;
 *   - high band: 4-level (2-bit) ADPCM;
 *   - both bands share the 2-pole / 6-zero sign-sign adaptive predictor
 *     ("block 4") with leakage and stability clamps;
 *   - receive QMF reconstructs the 16 kHz signal.
 *
 * Quantizer decision levels / reconstruction values, log-scale-factor
 * multipliers and the QMF taps follow the Recommendation's tables (the
 * log-to-linear table is the analytic round(2048 * 2^(i/32))). ITU test
 * vectors are not available offline; validation is by QMF reconstruction,
 * round-trip SNR, embedded mode ordering and idle-channel tests
 * (tests/test_g722.py).
 *
 * The encoder always emits the full 8-bit code word (2 high-band bits,
 * 6 low-band bits) at one code per two input samples; the mode only
 * selects how many low-band bits the decoder uses, exactly like the
 * embedded bitstream of the Recommendation.
 */

#include "augment.h"

#include <algorithm>
#include <cstring>

namespace {

inline int sat16(int x) {
  return std::min(32767, std::max(-32768, x));
}

/* Per-band predictor/quantizer state. */
struct Band {
  int s = 0;        /* predicted signal  */
  int sp = 0;       /* pole-section output */
  int sz = 0;       /* zero-section output */
  int r[3] = {0};   /* reconstructed signal memory */
  int a[3] = {0};   /* pole coefficients */
  int ap[3] = {0};
  int p[3] = {0};   /* partially reconstructed memory */
  int d[7] = {0};   /* quantized difference memory */
  int b[7] = {0};   /* zero coefficients */
  int bp[7] = {0};
  int sg[7] = {0};
  int nb = 0;       /* log scale factor */
  int det = 32;     /* linear scale factor (low band starts at 32, high 8) */
};

struct G722State {
  Band band[2];
  int x[24] = {0};  /* QMF delay line */
  G722State() { band[1].det = 8; }  /* high band starts at 8, low at 32 */
};

/* 12 even-half taps of the 24-tap QMF (tap sum 4096 = unit DC gain after
 * the >>12 inherent in the (sum >> 14, << 2 ... >> 11) scaling chain). */
const int kQmf[12] = {3, -11, 12, 32, -210, 951, 3876,
                      -805, 362, -156, 53, -11};

/* Low-band 6-bit quantizer decision levels (units of det/4096). */
const int kQ6[30] = {0,    35,   72,   110,  150,  190,  233,  276,
                     323,  370,  422,  473,  530,  587,  650,  714,
                     786,  858,  940,  1023, 1121, 1219, 1339, 1458,
                     1612, 1765, 1980, 2195, 2557, 2919};
/* Decision region -> 6-bit code, negative / positive difference; the
 * overflow region (|diff| beyond the last decision level) maps to the
 * maximum-magnitude codes (4 / 32). */
const int kIln[32] = {0,  63, 62, 31, 30, 29, 28, 27, 26, 25, 24,
                      23, 22, 21, 20, 19, 18, 17, 16, 15, 14, 13,
                      12, 11, 10, 9,  8,  7,  6,  5,  4,  4};
const int kIlp[32] = {0,  61, 60, 59, 58, 57, 56, 55, 54, 53, 52,
                      51, 50, 49, 48, 47, 46, 45, 44, 43, 42, 41,
                      40, 39, 38, 37, 36, 35, 34, 33, 32, 32};
/* Inverse quantizer outputs: 4-bit core (predictor path + 48k decode),
 * 5-bit (56k) and 6-bit (64k) refinements. Units of det/32768. */
const int kQm4[16] = {0,     -20456, -12896, -8968, -6288, -4240,
                      -2584, -1200,  20456,  12896, 8968,  6288,
                      4240,  2584,   1200,   0};
const int kQm5[32] = {-280,   -280,   -23352, -17560, -14120, -11664,
                      -9752,  -8184,  -6864,  -5712,  -4696,  -3784,
                      -2960,  -2208,  -1520,  -880,   23352,  17560,
                      14120,  11664,  9752,   8184,   6864,   5712,
                      4696,   3784,   2960,   2208,   1520,   880,
                      280,    -280};
const int kQm6[64] = {-136,   -136,   -136,   -136,   -24808, -21904,
                      -19008, -16704, -14984, -13512, -12280, -11192,
                      -10232, -9360,  -8576,  -7856,  -7192,  -6576,
                      -6000,  -5456,  -4944,  -4464,  -4008,  -3576,
                      -3168,  -2776,  -2400,  -2032,  -1688,  -1360,
                      -1040,  -728,   24808,  21904,  19008,  16704,
                      14984,  13512,  12280,  11192,  10232,  9360,
                      8576,   7856,   7192,   6576,   6000,   5456,
                      4944,   4464,   4008,   3576,   3168,   2776,
                      2400,   2032,   1688,   1360,   1040,   728,
                      432,    136,    -432,   -136};
/* Log scale-factor multipliers, indexed by the folded 4-bit / 2-bit code. */
const int kWl[8] = {-60, -30, 58, 172, 334, 538, 1198, 3042};
const int kRl42[16] = {0, 7, 6, 5, 4, 3, 2, 1, 7, 6, 5, 4, 3, 2, 1, 0};
const int kWh[3] = {0, -214, 798};
const int kRh2[4] = {2, 1, 2, 1};
const int kIhn[3] = {0, 1, 0};
const int kIhp[3] = {0, 3, 2};
/* Log -> linear: round(2048 * 2^(i/32)). */
const int kIlb[32] = {2048, 2093, 2139, 2186, 2233, 2282, 2332, 2383,
                      2435, 2489, 2543, 2599, 2656, 2714, 2774, 2834,
                      2896, 2960, 3025, 3091, 3158, 3228, 3298, 3371,
                      3444, 3520, 3597, 3676, 3756, 3838, 3922, 4008};
/* 2-bit inverse quantizer outputs (shared by encoder and decoder). */
const int kQm2[4] = {-7408, -1616, 7408, 1616};

/* Shared 2-pole / 6-zero predictor adaptation + prediction ("block 4"). */
void block4(Band* bd, int d) {
  bd->d[0] = d;
  bd->r[0] = sat16(bd->s + d);   /* RECONS */
  bd->p[0] = sat16(bd->sz + d);  /* PARREC */

  /* UPPOL2: second pole coefficient */
  for (int i = 0; i < 3; ++i) bd->sg[i] = bd->p[i] >> 15;
  int wd1 = sat16(bd->a[1] * 4);
  int wd2 = (bd->sg[0] == bd->sg[1]) ? -wd1 : wd1;
  if (wd2 > 32767) wd2 = 32767;
  int wd3 = ((bd->sg[0] == bd->sg[2]) ? 128 : -128) + (wd2 >> 7) +
            ((bd->a[2] * 32512) >> 15);
  wd3 = std::min(12288, std::max(-12288, wd3));
  bd->ap[2] = wd3;

  /* UPPOL1: first pole coefficient, bounded by the second */
  bd->sg[0] = bd->p[0] >> 15;
  bd->sg[1] = bd->p[1] >> 15;
  wd1 = (bd->sg[0] == bd->sg[1]) ? 192 : -192;
  wd2 = (bd->a[1] * 32640) >> 15;
  bd->ap[1] = sat16(wd1 + wd2);
  wd3 = sat16(15360 - bd->ap[2]);
  if (bd->ap[1] > wd3) bd->ap[1] = wd3;
  else if (bd->ap[1] < -wd3) bd->ap[1] = -wd3;

  /* UPZERO: six zero coefficients, sign-sign LMS with leakage */
  wd1 = (d == 0) ? 0 : 128;
  bd->sg[0] = d >> 15;
  for (int i = 1; i < 7; ++i) {
    bd->sg[i] = bd->d[i] >> 15;
    wd2 = (bd->sg[i] == bd->sg[0]) ? wd1 : -wd1;
    wd3 = (bd->b[i] * 32640) >> 15;
    bd->bp[i] = sat16(wd2 + wd3);
  }

  /* DELAYA / DELAYB */
  for (int i = 6; i > 0; --i) {
    bd->d[i] = bd->d[i - 1];
    bd->b[i] = bd->bp[i];
  }
  for (int i = 2; i > 0; --i) {
    bd->r[i] = bd->r[i - 1];
    bd->p[i] = bd->p[i - 1];
    bd->a[i] = bd->ap[i];
  }

  /* FILTEP: pole section */
  wd1 = sat16(bd->r[1] + bd->r[1]);
  wd1 = (bd->a[1] * wd1) >> 15;
  wd2 = sat16(bd->r[2] + bd->r[2]);
  wd2 = (bd->a[2] * wd2) >> 15;
  bd->sp = sat16(wd1 + wd2);

  /* FILTEZ: zero section */
  int sz = 0;
  for (int i = 6; i > 0; --i) {
    int wd = sat16(bd->d[i] + bd->d[i]);
    sz += (bd->b[i] * wd) >> 15;
  }
  bd->sz = sat16(sz);

  /* PREDIC */
  bd->s = sat16(bd->sp + bd->sz);
}

/* Low-band scale-factor update on the folded 4-bit core code. */
void logscl(Band* bd, int ril) {
  int nb = ((bd->nb * 127) >> 7) + kWl[kRl42[ril]];
  bd->nb = std::min(18432, std::max(0, nb));
  int wd1 = kIlb[(bd->nb >> 6) & 31];
  int shift = bd->nb >> 11;  /* 0..9 */
  bd->det = ((wd1 << shift) >> 8) << 2;
}

/* High-band scale-factor update. */
void logsch(Band* bd, int ih) {
  int nb = ((bd->nb * 127) >> 7) + kWh[kRh2[ih]];
  bd->nb = std::min(22528, std::max(0, nb));
  int wd1 = kIlb[(bd->nb >> 6) & 31];
  int shift = bd->nb >> 11;  /* 0..10 */
  bd->det = ((wd1 << shift) >> 10) << 2;
}

/* One encoder step: two 14-bit input samples -> one 8-bit code. */
int encode_pair(G722State* st, int s0, int s1) {
  /* Transmit QMF */
  std::memmove(st->x, st->x + 2, 22 * sizeof(int));
  st->x[22] = s0;
  st->x[23] = s1;
  long long sumodd = 0, sumeven = 0;
  for (int i = 0; i < 12; ++i) {
    sumodd += static_cast<long long>(st->x[2 * i]) * kQmf[i];
    sumeven += static_cast<long long>(st->x[2 * i + 1]) * kQmf[11 - i];
  }
  int xlow = static_cast<int>((sumeven + sumodd) >> 14);
  int xhigh = static_cast<int>((sumeven - sumodd) >> 14);

  /* ---- low band: 6-bit quantize, 4-bit-core adapt ---- */
  Band* lo = &st->band[0];
  int el = sat16(xlow - lo->s);
  int wd = (el >= 0) ? el : -(el + 1);
  int i = 1;
  for (; i < 30; ++i) {
    int wd1 = (kQ6[i] * lo->det) >> 12;
    if (wd < wd1) break;
  }
  int ilow = (el < 0) ? kIln[i] : kIlp[i];

  int ril = ilow >> 2;                      /* 4-bit core */
  int dlow = (lo->det * kQm4[ril]) >> 15;   /* core reconstruction */
  logscl(lo, ril);
  block4(lo, dlow);

  /* ---- high band: 2-bit ---- */
  Band* hi = &st->band[1];
  int eh = sat16(xhigh - hi->s);
  wd = (eh >= 0) ? eh : -(eh + 1);
  int wd1 = (564 * hi->det) >> 12;
  int mih = (wd >= wd1) ? 2 : 1;
  int ihigh = (eh < 0) ? kIhn[mih] : kIhp[mih];
  int dhigh = (hi->det * kQm2[ihigh]) >> 15;
  logsch(hi, ihigh);
  block4(hi, dhigh);

  return (ihigh << 6) | ilow;
}

/* One decoder step: one code -> two output samples. mode: 1=64k (6-bit),
 * 2=56k (5-bit), 3=48k (4-bit). */
void decode_code(G722State* st, int code, int mode, int* out0, int* out1) {
  Band* lo = &st->band[0];
  int wd1 = code & 0x3f;
  int ril = wd1 >> 2;

  int rlow;
  switch (mode) {
    case 1: {  /* 64k: full 6-bit refinement */
      int dlowt = (lo->det * kQm6[wd1]) >> 15;
      rlow = lo->s + dlowt;
      break;
    }
    case 2: {  /* 56k: 5-bit */
      int dlowt = (lo->det * kQm5[wd1 >> 1]) >> 15;
      rlow = lo->s + dlowt;
      break;
    }
    default: {  /* 48k: 4-bit core only */
      int dlowt = (lo->det * kQm4[ril]) >> 15;
      rlow = lo->s + dlowt;
      break;
    }
  }
  rlow = std::min(16383, std::max(-16384, rlow));

  /* predictor adapts on the 4-bit core exactly like the encoder */
  int dlow = (lo->det * kQm4[ril]) >> 15;
  logscl(lo, ril);
  block4(lo, dlow);

  Band* hi = &st->band[1];
  int ihigh = (code >> 6) & 3;
  int dhigh = (hi->det * kQm2[ihigh]) >> 15;
  int rhigh = std::min(16383, std::max(-16384, dhigh + hi->s));
  logsch(hi, ihigh);
  block4(hi, dhigh);

  /* Receive QMF */
  std::memmove(st->x, st->x + 2, 22 * sizeof(int));
  st->x[22] = sat16(rlow + rhigh);
  st->x[23] = sat16(rlow - rhigh);
  long long sumodd = 0, sumeven = 0;
  for (int i = 0; i < 12; ++i) {
    sumodd += static_cast<long long>(st->x[2 * i]) * kQmf[i];
    sumeven += static_cast<long long>(st->x[2 * i + 1]) * kQmf[11 - i];
  }
  *out0 = sat16(static_cast<int>(sumeven >> 11));
  *out1 = sat16(static_cast<int>(sumodd >> 11));
}

/* Float -> 16-bit PCM. The QMF consumes full 16-bit samples and the
 * >>14 after the tap sum yields the Recommendation's 14-bit sub-band
 * signals — the same convention as the reference implementations
 * (spandsp / ffmpeg g722), so bitstreams are directly comparable. */
inline int to_pcm16(float v) {
  int s = static_cast<int>(v * 32768.0f + (v >= 0 ? 0.5f : -0.5f));
  return std::min(32767, std::max(-32768, s));
}

}  // namespace

extern "C" {

long g722_encode(const float* in, size_t n, uint8_t* out) {
  G722State st;
  long n_codes = 0;
  for (size_t i = 0; i + 1 < n; i += 2) {
    out[n_codes++] = static_cast<uint8_t>(
        encode_pair(&st, to_pcm16(in[i]), to_pcm16(in[i + 1])));
  }
  return n_codes;
}

long g722_decode(const uint8_t* codes, long n_codes, float* out, int mode) {
  G722State st;
  long n = 0;
  for (long i = 0; i < n_codes; ++i) {
    int s0, s1;
    decode_code(&st, codes[i], mode, &s0, &s1);
    out[n++] = static_cast<float>(s0) / 32768.0f;
    out[n++] = static_cast<float>(s1) / 32768.0f;
  }
  return n;
}

void g722_roundtrip(const float* in, float* out, size_t n, int mode) {
  G722State enc;
  G722State dec;
  size_t i = 0;
  for (; i + 1 < n; i += 2) {
    int code = encode_pair(&enc, to_pcm16(in[i]), to_pcm16(in[i + 1]));
    int s0, s1;
    decode_code(&dec, code, mode, &s0, &s1);
    out[i] = static_cast<float>(s0) / 32768.0f;
    out[i + 1] = static_cast<float>(s1) / 32768.0f;
  }
  if (i < n) out[i] = in[i];  /* odd tail passes through */
}

}  /* extern "C" */
