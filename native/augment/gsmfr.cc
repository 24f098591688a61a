/* GSM 06.10 Full-Rate (RPE-LTP) speech codec, implemented from the public
 * ETSI specification (EN 300 961): 8 kHz, 160-sample frames, 260 bits/frame
 * (13 kbit/s), packed in the conventional 33-byte format with a 0xD magic
 * nibble.
 *
 * This provides the real 'gsmfr' codec of the reference channel vocabulary
 * (/root/reference/channel_simulation/simulated_channel.py:36-38) instead of
 * a band-limit + noise stand-in. All quantizers — LAR (6/6/5/5/4/4/3/3-bit
 * log-area ratios), LTP (7-bit lag, 2-bit gain), RPE grid (2-bit) and APCM
 * (6-bit block maximum, 3-bit samples) — and the filter structures
 * (offset compensation, pre/de-emphasis, short-term lattice, long-term
 * predictor, RPE weighting) follow the spec's fixed-point pseudocode,
 * including the lossy dynamic scaling of s[] inside the autocorrelation
 * and the block-scaled LTP correlation arithmetic.
 *
 * CONFORMANCE: encoder bitstreams and decoder PCM are verified BIT-EXACT
 * against the canonical libgsm implementation (the de-facto ETSI
 * reference, in-image as libgsm.so.1) across silence/noise/tone/impulse/
 * clipping stress classes — tests/test_gsmfr_conformance.py;
 * tests/test_gsmfr.py keeps the oracle-free self-consistency checks.
 */

#include <cstdint>
#include <cstring>

#include "augment.h"

namespace {

/* ---- GSM 06.10 section 3.1 basic saturating arithmetic ---- */

inline int16_t sat16(int32_t x) {
  if (x > 32767) return 32767;
  if (x < -32768) return -32768;
  return static_cast<int16_t>(x);
}

inline int16_t add16(int16_t a, int16_t b) {
  return sat16(static_cast<int32_t>(a) + b);
}

inline int16_t sub16(int16_t a, int16_t b) {
  return sat16(static_cast<int32_t>(a) - b);
}

inline int16_t mult(int16_t a, int16_t b) {
  if (a == -32768 && b == -32768) return 32767;
  return static_cast<int16_t>((static_cast<int32_t>(a) * b) >> 15);
}

inline int16_t mult_r(int16_t a, int16_t b) {
  if (a == -32768 && b == -32768) return 32767;
  return sat16((static_cast<int32_t>(a) * b + 16384) >> 15);
}

inline int16_t abs_s(int16_t a) {
  if (a == -32768) return 32767;
  return a < 0 ? static_cast<int16_t>(-a) : a;
}

inline int32_t L_add(int32_t a, int32_t b) {
  int64_t s = static_cast<int64_t>(a) + b;
  if (s > 2147483647LL) return 2147483647;
  if (s < -2147483648LL) return -2147483648;
  return static_cast<int32_t>(s);
}

/* norm(): left shifts needed to normalize a 32-bit value into
 * [2^30, 2^31) (section 3.1.9; 0 for a <= -2^30). */
inline int16_t gsm_norm(int32_t a) {
  if (a < 0) {
    if (a <= -1073741824) return 0;
    a = ~a;
  }
  return static_cast<int16_t>(__builtin_clz(static_cast<uint32_t>(a)) - 1);
}

/* Fractional division: 0 <= num <= denom, denom > 0; returns num/denom in
 * Q15 (section 3.1.8). */
inline int16_t div16(int16_t num, int16_t denom) {
  if (num == 0) return 0;
  int32_t L_num = num;
  int32_t L_denom = denom;
  int16_t div = 0;
  for (int k = 0; k < 15; ++k) {
    div <<= 1;
    L_num <<= 1;
    if (L_num >= L_denom) {
      L_num -= L_denom;
      div = static_cast<int16_t>(div + 1);
    }
  }
  return div;
}

/* ---- Quantization tables (GSM 06.10 section 5.1 / annex tables) ---- */

/* LAR quantization: LARc = (A*LAR + B + 256) >> 9, clamped to [MIC, MAC]. */
const int16_t kA[8] = {20480, 20480, 20480, 20480, 13964, 15360, 8534, 9036};
const int16_t kB[8] = {0, 0, 2048, -2560, 94, -1792, -341, -1144};
const int16_t kMIC[8] = {-32, -32, -16, -16, -8, -8, -4, -4};
const int16_t kMAC[8] = {31, 31, 15, 15, 7, 7, 3, 3};
/* Inverse of A for LARc decoding. */
const int16_t kINVA[8] = {13107, 13107, 13107, 13107, 19223, 17476,
                          31454, 29708};
/* LTP gain decision levels / quantized levels (Q15: .2/.5/.8 ; .1/.35/.65/1). */
const int16_t kDLB[4] = {6554, 16384, 26214, 32767};
const int16_t kQLB[4] = {3277, 11469, 21299, 32767};
/* RPE weighting filter impulse response (Q13). */
const int16_t kH[11] = {-134, -374, 0, 2054, 5741, 8192, 5741, 2054, 0,
                        -374, -134};
/* APCM normalized inverse mantissa / normalization factors. */
const int16_t kNRFAC[8] = {29128, 26215, 23832, 21846, 20165, 18725, 17476,
                           16384};
const int16_t kFAC[8] = {18431, 20479, 22527, 24575, 26623, 28671, 30719,
                         32767};

/* ---- Frame parameter block (76 parameters / 260 bits) ---- */

struct FrameParams {
  int16_t LARc[8];          /* 6,6,5,5,4,4,3,3 bits */
  int16_t Nc[4];            /* 7 bits: LTP lag 40..120 */
  int16_t bc[4];            /* 2 bits: LTP gain index */
  int16_t Mc[4];            /* 2 bits: RPE grid */
  int16_t xmaxc[4];         /* 6 bits: block maximum */
  int16_t xMc[4][13];       /* 3 bits each */
};

struct EncoderState {
  int16_t z1 = 0;           /* offset compensation */
  int32_t L_z2 = 0;
  int16_t mp = 0;           /* preemphasis memory */
  int16_t u[8] = {0};       /* short-term analysis lattice */
  int16_t dp[120 + 160] = {0};  /* LTP reconstructed residual history */
  int16_t LARpp_prev[8] = {0};
};

struct DecoderState {
  int16_t nrp = 40;         /* received lag memory (error concealment) */
  int16_t drp[120 + 160] = {0};
  int16_t v[9] = {0};       /* short-term synthesis lattice */
  int16_t msr = 0;          /* deemphasis memory */
  int16_t LARpp_prev[8] = {0};
};

/* ---- Shared parameter decoding (encoder local decoder == decoder) ---- */

/* LARc -> LARpp (section 5.2.8 decoding of coded log-area ratios). */
void decode_larc(const int16_t* LARc, int16_t* LARpp) {
  for (int i = 0; i < 8; ++i) {
    int16_t temp1 = sat16((static_cast<int32_t>(LARc[i]) + kMIC[i]) << 10);
    int16_t temp2 = sat16(static_cast<int32_t>(kB[i]) << 1);
    temp1 = sub16(temp1, temp2);
    temp1 = mult_r(kINVA[i], temp1);
    LARpp[i] = add16(temp1, temp1);
  }
}

/* LARp -> rp (section 5.2.9.2 piecewise inverse of the LAR transform). */
void larp_to_rp(const int16_t* LARp, int16_t* rp) {
  for (int i = 0; i < 8; ++i) {
    int16_t temp = abs_s(LARp[i]);
    if (temp < 11059) {
      temp = static_cast<int16_t>(temp << 1);
    } else if (temp < 20070) {
      temp = add16(temp, 11059);
    } else {
      temp = add16(static_cast<int16_t>(temp >> 2), 26112);
    }
    rp[i] = LARp[i] < 0 ? sub16(0, temp) : temp;
  }
}

/* Interpolated LARp for the 4 zones of a frame (section 5.2.9.1). */
void interpolate_larp(const int16_t* prev, const int16_t* cur, int zone,
                      int16_t* LARp) {
  for (int i = 0; i < 8; ++i) {
    switch (zone) {
      case 0:  /* k = 0..12: 3/4 old + 1/4 new */
        LARp[i] = add16(static_cast<int16_t>(prev[i] >> 2),
                        static_cast<int16_t>(cur[i] >> 2));
        LARp[i] = add16(LARp[i], static_cast<int16_t>(prev[i] >> 1));
        break;
      case 1:  /* k = 13..26: 1/2 old + 1/2 new */
        LARp[i] = add16(static_cast<int16_t>(prev[i] >> 1),
                        static_cast<int16_t>(cur[i] >> 1));
        break;
      case 2:  /* k = 27..39: 1/4 old + 3/4 new */
        LARp[i] = add16(static_cast<int16_t>(prev[i] >> 2),
                        static_cast<int16_t>(cur[i] >> 2));
        LARp[i] = add16(LARp[i], static_cast<int16_t>(cur[i] >> 1));
        break;
      default: /* k = 40..159: new */
        LARp[i] = cur[i];
    }
  }
}

const int kZoneStart[4] = {0, 13, 27, 40};
const int kZoneEnd[4] = {13, 27, 40, 160};

/* xmaxc -> (exp, mant) (section 5.2.15 APCM block-maximum decoding). */
void xmaxc_to_exp_mant(int16_t xmaxc, int16_t* exp_out, int16_t* mant_out) {
  int16_t exp = 0;
  if (xmaxc > 15) exp = static_cast<int16_t>((xmaxc >> 3) - 1);
  int16_t mant = static_cast<int16_t>(xmaxc - (exp << 3));
  if (mant == 0) {
    exp = -4;
    mant = 7;
  } else {
    while (mant <= 7) {
      mant = static_cast<int16_t>((mant << 1) | 1);
      exp = static_cast<int16_t>(exp - 1);
    }
    mant = static_cast<int16_t>(mant - 8);
  }
  *exp_out = exp;
  *mant_out = mant;
}

/* Inverse APCM (section 5.2.16): xMc[0..12] -> xMp[0..12]. */
void apcm_inverse(const int16_t* xMc, int16_t exp, int16_t mant,
                  int16_t* xMp) {
  int16_t temp1 = kFAC[mant];
  int16_t temp2 = static_cast<int16_t>(6 - exp);  /* 0..10 */
  int16_t temp3 = static_cast<int16_t>(temp2 > 0 ? 1 << (temp2 - 1) : 0);
  for (int i = 0; i < 13; ++i) {
    int16_t temp = static_cast<int16_t>((xMc[i] << 1) - 7);  /* -7..7 */
    temp = static_cast<int16_t>(temp << 12);
    temp = mult_r(temp1, temp);
    temp = add16(temp, temp3);
    xMp[i] = static_cast<int16_t>(temp >> temp2);
  }
}

/* RPE grid positioning (section 5.2.17). */
void rpe_grid_position(const int16_t* xMp, int16_t Mc, int16_t* ep) {
  std::memset(ep, 0, 40 * sizeof(int16_t));
  for (int i = 0; i < 13; ++i) ep[Mc + 3 * i] = xMp[i];
}

/* ---- Encoder ---- */

/* LPC analysis: autocorrelation with the spec's lossy dynamic scaling of
 * s[] + Schur recursion -> r[0..7] in Q15 (sections 5.2.4-5.2.5).
 *
 * NOTE: s[] is scaled DOWN with rounding (mult_r) for the accumulation
 * and then shifted back up, exactly as the spec prescribes — this is
 * deliberately lossy, and the short-term analysis consumes the modified
 * signal. Conformance is pinned bit-for-bit against the canonical libgsm
 * implementation in tests/test_gsmfr_conformance.py. */
void lpc_reflection(int16_t* s, int16_t* r) {
  /* Dynamic scaling of the array s[0..159] (5.2.4). */
  int16_t smax = 0;
  for (int k = 0; k < 160; ++k) {
    int16_t temp = abs_s(s[k]);
    if (temp > smax) smax = temp;
  }
  int16_t scalauto = 0;
  if (smax > 0)
    scalauto = static_cast<int16_t>(
        4 - gsm_norm(static_cast<int32_t>(smax) << 16));
  if (scalauto > 0) {
    int16_t t = static_cast<int16_t>(16384 >> (scalauto - 1));
    for (int k = 0; k < 160; ++k) s[k] = mult_r(s[k], t);
  }

  /* Autocorrelation in 32-bit (overflow impossible after scaling). */
  int32_t acf[9];
  for (int j = 0; j < 9; ++j) {
    int32_t sum = 0;
    for (int k = j; k < 160; ++k)
      sum += (static_cast<int32_t>(s[k]) * s[k - j]) << 1;
    acf[j] = sum;
  }

  /* Rescaling of the array s[0..159]. */
  if (scalauto > 0)
    for (int k = 0; k < 160; ++k)
      s[k] = static_cast<int16_t>(s[k] << scalauto);

  if (acf[0] == 0) {
    for (int i = 0; i < 8; ++i) r[i] = 0;
    return;
  }
  /* Schur recursion with normalized 16-bit ACF windows (5.2.5). */
  int16_t norm = gsm_norm(acf[0]);
  int16_t P[9], K[9];
  for (int j = 0; j < 9; ++j)   /* |acf[j]| <= acf[0], so << norm fits */
    P[j] = static_cast<int16_t>(
        (static_cast<int64_t>(acf[j]) << norm) >> 16);
  for (int j = 1; j <= 7; ++j) K[j] = P[j];

  for (int n = 1; n <= 8; ++n) {
    int16_t temp = abs_s(P[1]);
    if (P[0] < temp || P[0] <= 0) {
      for (int i = n; i <= 8; ++i) r[i - 1] = 0;
      return;
    }
    int16_t rn = div16(temp, P[0]);
    if (P[1] > 0) rn = sub16(0, rn);
    r[n - 1] = rn;
    if (n == 8) return;
    /* Schur recursion update. */
    P[0] = add16(P[0], mult_r(P[1], rn));
    for (int m = 1; m <= 8 - n; ++m) {
      int16_t t = add16(P[m + 1], mult_r(K[m], rn));
      K[m] = add16(K[m], mult_r(P[m + 1], rn));
      P[m] = t;
    }
  }
}

/* r -> LAR (section 5.2.6 piecewise log-area-ratio transform). */
void r_to_lar(const int16_t* r, int16_t* LAR) {
  for (int i = 0; i < 8; ++i) {
    int16_t temp = abs_s(r[i]);
    if (temp < 22118) {
      temp = static_cast<int16_t>(temp >> 1);
    } else if (temp < 31130) {
      temp = static_cast<int16_t>(temp - 11059);
    } else {
      temp = sat16((static_cast<int32_t>(temp) - 26112) << 2);
    }
    LAR[i] = r[i] < 0 ? sub16(0, temp) : temp;
  }
}

/* LAR quantization (section 5.2.7). */
void quantize_lar(const int16_t* LAR, int16_t* LARc) {
  for (int i = 0; i < 8; ++i) {
    int16_t temp = mult(kA[i], LAR[i]);
    temp = add16(temp, kB[i]);
    temp = add16(temp, 256);
    temp = static_cast<int16_t>(temp >> 9);
    if (temp > kMAC[i]) temp = kMAC[i];
    if (temp < kMIC[i]) temp = kMIC[i];
    LARc[i] = static_cast<int16_t>(temp - kMIC[i]);  /* transmitted >= 0 */
  }
}

void encode_frame(EncoderState& st, const int16_t* sop, FrameParams& f) {
  int16_t s[160];

  /* -- Preprocessing (5.2.1-5.2.3): downscale, offset compensation,
   * preemphasis. -- */
  for (int k = 0; k < 160; ++k) {
    int16_t so = static_cast<int16_t>((sop[k] >> 3) << 2);  /* 13-bit, <<2 */
    int16_t s1 = sub16(so, st.z1);
    st.z1 = so;
    int32_t L_s2 = static_cast<int32_t>(s1) << 15;
    int16_t msp = static_cast<int16_t>(st.L_z2 >> 15);
    int16_t lsp = static_cast<int16_t>(st.L_z2 - (static_cast<int32_t>(msp)
                                                  << 15));
    L_s2 = L_add(L_s2, mult_r(lsp, 32735));
    /* L_z2 = L_mult(msp, 32735) >> 1 + L_s2 == msp*32735 + L_s2 */
    st.L_z2 = L_add(static_cast<int32_t>(msp) * 32735, L_s2);
    int16_t sof = sat16((L_add(st.L_z2, 16384)) >> 15);
    s[k] = add16(sof, mult_r(st.mp, -28180));
    st.mp = sof;
  }

  /* -- LPC: reflection coefficients -> LAR -> quantize -- */
  int16_t r[8], LAR[8];
  lpc_reflection(s, r);
  r_to_lar(r, LAR);
  quantize_lar(LAR, f.LARc);

  /* -- Local decode + zone interpolation + short-term analysis -- */
  int16_t LARpp[8];
  decode_larc(f.LARc, LARpp);
  int16_t d[160];
  for (int zone = 0; zone < 4; ++zone) {
    int16_t LARp[8], rp[8];
    interpolate_larp(st.LARpp_prev, LARpp, zone, LARp);
    larp_to_rp(LARp, rp);
    for (int k = kZoneStart[zone]; k < kZoneEnd[zone]; ++k) {
      /* analysis lattice (5.2.10) */
      int16_t di = s[k];
      int16_t sav = di;
      for (int i = 0; i < 8; ++i) {
        int16_t temp = add16(st.u[i], mult_r(rp[i], di));
        di = add16(di, mult_r(rp[i], st.u[i]));
        st.u[i] = sav;
        sav = temp;
      }
      d[k] = di;
    }
  }
  std::memcpy(st.LARpp_prev, LARpp, sizeof(LARpp));

  /* -- Per-subframe LTP + RPE -- */
  for (int j = 0; j < 4; ++j) {
    const int16_t* dsub = d + 40 * j;
    int16_t* dp = st.dp + 120 + 40 * j;  /* dp[-120..-1] is history */

    /* LTP lag search (5.2.11): cross-correlation over the dynamically
     * scaled 16-bit copy wt = d >> scal, 32-bit accumulation, exactly as
     * the spec's pseudocode (conformance vs libgsm). */
    int16_t dmax = 0;
    for (int k = 0; k < 40; ++k) {
      int16_t temp = abs_s(dsub[k]);
      if (temp > dmax) dmax = temp;
    }
    int16_t scal = 0;
    if (dmax > 0) {
      int16_t temp = gsm_norm(static_cast<int32_t>(dmax) << 16);
      scal = temp > 6 ? 0 : static_cast<int16_t>(6 - temp);
    }
    int16_t wt[40];
    for (int k = 0; k < 40; ++k)
      wt[k] = static_cast<int16_t>(dsub[k] >> scal);

    int32_t L_max = 0;
    int16_t Nc = 40;
    for (int lag = 40; lag <= 120; ++lag) {
      int32_t acc = 0;
      for (int k = 0; k < 40; ++k)
        acc += static_cast<int32_t>(wt[k]) * dp[k - lag];
      if (acc > L_max) {
        L_max = acc;
        Nc = static_cast<int16_t>(lag);
      }
    }
    f.Nc[j] = Nc;
    L_max <<= 1;                    /* from the implicit L_mult */
    L_max >>= (6 - scal);           /* rescaling */

    /* LTP gain quantization (5.2.11 cont.): power of dp[-Nc..] at >>3,
     * then 16-bit normalized comparison against the DLB thresholds. */
    int32_t L_power = 0;
    for (int k = 0; k < 40; ++k) {
      int16_t w3 = static_cast<int16_t>(dp[k - Nc] >> 3);
      L_power += static_cast<int32_t>(w3) * w3;
    }
    L_power <<= 1;

    int16_t bc;
    if (L_max <= 0) {
      bc = 0;
    } else if (L_max >= L_power) {
      bc = 3;
    } else {
      int16_t temp = gsm_norm(L_power);
      int16_t R = static_cast<int16_t>(
          (static_cast<int64_t>(L_max) << temp) >> 16);
      int16_t S = static_cast<int16_t>(
          (static_cast<int64_t>(L_power) << temp) >> 16);
      bc = 3;
      for (int b = 0; b <= 2; ++b) {
        if (R <= mult(S, kDLB[b])) {
          bc = static_cast<int16_t>(b);
          break;
        }
      }
    }
    f.bc[j] = bc;

    /* LTP filtering (5.2.12): e = d - bp * dp[-Nc]. */
    int16_t bp = kQLB[bc];
    int16_t e[40], dpp[40];
    for (int k = 0; k < 40; ++k) {
      dpp[k] = mult_r(bp, dp[k - Nc]);
      e[k] = sub16(dsub[k], dpp[k]);
    }

    /* RPE weighting filter (5.2.13): H is Q13. 32-bit accumulation with
     * a final >>13 + clamp, matching the canonical implementation. */
    int16_t x[40];
    for (int k = 0; k < 40; ++k) {
      int32_t acc = 8192 >> 1;  /* rounding at Q13 */
      for (int i = 0; i < 11; ++i) {
        int kk = k + 5 - i;
        int16_t ei = (kk >= 0 && kk < 40) ? e[kk] : 0;
        acc += static_cast<int32_t>(kH[i]) * ei;
      }
      x[k] = sat16(acc >> 13);
    }

    /* Grid selection (5.2.14): max energy over the 4 decimations. */
    int64_t EM = -1;
    int16_t Mc = 0;
    for (int m = 0; m < 4; ++m) {
      int64_t en = 0;
      for (int i = 0; i < 13; ++i) {
        int16_t v = static_cast<int16_t>(x[m + 3 * i] >> 2);
        en += static_cast<int64_t>(v) * v;
      }
      if (en > EM) {
        EM = en;
        Mc = static_cast<int16_t>(m);
      }
    }
    f.Mc[j] = Mc;
    int16_t xM[13];
    for (int i = 0; i < 13; ++i) xM[i] = x[Mc + 3 * i];

    /* APCM quantization of the block maximum (5.2.15). */
    int16_t xmax = 0;
    for (int i = 0; i < 13; ++i) {
      int16_t a = abs_s(xM[i]);
      if (a > xmax) xmax = a;
    }
    int16_t exp = 0;
    int16_t temp = static_cast<int16_t>(xmax >> 9);
    for (int i = 0; i <= 5; ++i) {
      if (temp <= 0) break;
      temp = static_cast<int16_t>(temp >> 1);
      exp = static_cast<int16_t>(exp + 1);
    }
    int16_t xmaxc = add16(static_cast<int16_t>(xmax >> (exp + 5)),
                          static_cast<int16_t>(exp << 3));
    f.xmaxc[j] = xmaxc;

    /* Quantize the 13 samples with the decoded (exp, mant). */
    int16_t dexp, dmant;
    xmaxc_to_exp_mant(xmaxc, &dexp, &dmant);
    int16_t temp1 = static_cast<int16_t>(6 - dexp);
    int16_t temp2 = kNRFAC[dmant];
    for (int i = 0; i < 13; ++i) {
      int16_t t = sat16(static_cast<int32_t>(xM[i]) << temp1);
      t = mult(t, temp2);
      f.xMc[j][i] = static_cast<int16_t>((t >> 12) + 4);  /* 0..7 */
    }

    /* Local reconstruction -> update dp history (5.2.16-5.2.18). */
    int16_t xMp[13], ep[40];
    apcm_inverse(f.xMc[j], dexp, dmant, xMp);
    rpe_grid_position(xMp, Mc, ep);
    for (int k = 0; k < 40; ++k) dp[k] = add16(ep[k], dpp[k]);
  }
  /* Shift residual history left by one frame. */
  std::memmove(st.dp, st.dp + 160, 120 * sizeof(int16_t));
}

/* ---- Decoder ---- */

void decode_frame(DecoderState& st, const FrameParams& f, int16_t* srop) {
  int16_t wt[160];

  for (int j = 0; j < 4; ++j) {
    /* Inverse APCM + grid positioning. */
    int16_t exp, mant, xMp[13], erp[40];
    xmaxc_to_exp_mant(f.xmaxc[j], &exp, &mant);
    apcm_inverse(f.xMc[j], exp, mant, xMp);
    rpe_grid_position(xMp, f.Mc[j], erp);

    /* LTP synthesis (5.3.2) with lag sanity check. */
    int16_t Nr = f.Nc[j];
    if (Nr < 40 || Nr > 120) Nr = st.nrp;
    st.nrp = Nr;
    int16_t brp = kQLB[f.bc[j]];
    int16_t* drp = st.drp + 120 + 40 * j;
    for (int k = 0; k < 40; ++k) {
      int16_t drpp = mult_r(brp, drp[k - Nr]);
      drp[k] = add16(erp[k], drpp);
    }
    std::memcpy(wt + 40 * j, drp, 40 * sizeof(int16_t));
  }
  std::memmove(st.drp, st.drp + 160, 120 * sizeof(int16_t));

  /* Short-term synthesis lattice (5.3.4) with zone interpolation. */
  int16_t LARpp[8];
  decode_larc(f.LARc, LARpp);
  int16_t sr[160];
  for (int zone = 0; zone < 4; ++zone) {
    int16_t LARp[8], rp[8];
    interpolate_larp(st.LARpp_prev, LARpp, zone, LARp);
    larp_to_rp(LARp, rp);
    for (int k = kZoneStart[zone]; k < kZoneEnd[zone]; ++k) {
      int16_t sri = wt[k];
      for (int i = 7; i >= 0; --i) {
        sri = sub16(sri, mult_r(rp[i], st.v[i]));
        st.v[i + 1] = add16(st.v[i], mult_r(rp[i], sri));
      }
      st.v[0] = sri;
      sr[k] = sri;
    }
  }
  std::memcpy(st.LARpp_prev, LARpp, sizeof(LARpp));

  /* Postprocessing (5.3.5): deemphasis, upscale, 13-bit truncation. */
  for (int k = 0; k < 160; ++k) {
    int16_t temp = add16(sr[k], mult_r(st.msr, 28180));
    st.msr = temp;
    int16_t sro = add16(st.msr, st.msr);
    srop[k] = static_cast<int16_t>(sro & ~7);
  }
}

/* ---- 33-byte frame packing (260 bits + 0xD magic nibble, MSB-first) ---- */

struct BitWriter {
  uint8_t* buf;
  int bitpos = 0;
  void put(uint32_t value, int bits) {
    for (int i = bits - 1; i >= 0; --i) {
      int byte = bitpos >> 3;
      int off = 7 - (bitpos & 7);
      buf[byte] = static_cast<uint8_t>(
          (buf[byte] & ~(1u << off)) | (((value >> i) & 1u) << off));
      ++bitpos;
    }
  }
};

struct BitReader2 {
  const uint8_t* buf;
  int bitpos = 0;
  uint32_t get(int bits) {
    uint32_t v = 0;
    for (int i = 0; i < bits; ++i) {
      int byte = bitpos >> 3;
      int off = 7 - (bitpos & 7);
      v = (v << 1) | ((buf[byte] >> off) & 1u);
      ++bitpos;
    }
    return v;
  }
};

const int kLARBits[8] = {6, 6, 5, 5, 4, 4, 3, 3};

void pack_frame(const FrameParams& f, uint8_t* out) {
  std::memset(out, 0, 33);
  BitWriter w{out};
  w.put(0xD, 4);  /* GSM magic nibble */
  for (int i = 0; i < 8; ++i) w.put(static_cast<uint32_t>(f.LARc[i]),
                                    kLARBits[i]);
  for (int j = 0; j < 4; ++j) {
    w.put(static_cast<uint32_t>(f.Nc[j]), 7);
    w.put(static_cast<uint32_t>(f.bc[j]), 2);
    w.put(static_cast<uint32_t>(f.Mc[j]), 2);
    w.put(static_cast<uint32_t>(f.xmaxc[j]), 6);
    for (int i = 0; i < 13; ++i)
      w.put(static_cast<uint32_t>(f.xMc[j][i]), 3);
  }
}

bool unpack_frame(const uint8_t* in, FrameParams& f) {
  BitReader2 r{in};
  if (r.get(4) != 0xD) return false;
  for (int i = 0; i < 8; ++i) f.LARc[i] = static_cast<int16_t>(
      r.get(kLARBits[i]));
  for (int j = 0; j < 4; ++j) {
    f.Nc[j] = static_cast<int16_t>(r.get(7));
    f.bc[j] = static_cast<int16_t>(r.get(2));
    f.Mc[j] = static_cast<int16_t>(r.get(2));
    f.xmaxc[j] = static_cast<int16_t>(r.get(6));
    for (int i = 0; i < 13; ++i)
      f.xMc[j][i] = static_cast<int16_t>(r.get(3));
  }
  return true;
}

inline int16_t float_to_pcm(float x) {
  float v = x * 32768.0f;
  if (v > 32767.0f) v = 32767.0f;
  if (v < -32768.0f) v = -32768.0f;
  return static_cast<int16_t>(v);
}

}  // namespace

extern "C" {

/* Encode n samples (8 kHz float in [-1,1]) to packed 33-byte frames.
 * Returns the number of frames written; out must hold
 * ceil(n/160) * 33 bytes. The final partial frame is zero-padded. */
long gsmfr_encode(const float* in, size_t n, uint8_t* out) {
  EncoderState st;
  FrameParams f;
  long frames = 0;
  int16_t pcm[160];
  for (size_t pos = 0; pos < n; pos += 160) {
    for (int k = 0; k < 160; ++k) {
      size_t idx = pos + k;
      pcm[k] = idx < n ? float_to_pcm(in[idx]) : 0;
    }
    encode_frame(st, pcm, f);
    pack_frame(f, out + frames * 33);
    ++frames;
  }
  return frames;
}

/* Decode packed 33-byte frames to 8 kHz float samples. Returns samples
 * written (n_frames * 160) or -1 on a bad magic nibble. */
long gsmfr_decode(const uint8_t* in, long n_frames, float* out) {
  DecoderState st;
  FrameParams f;
  int16_t pcm[160];
  for (long j = 0; j < n_frames; ++j) {
    if (!unpack_frame(in + j * 33, f)) return -1;
    decode_frame(st, f, pcm);
    for (int k = 0; k < 160; ++k)
      out[j * 160 + k] = static_cast<float>(pcm[k]) / 32768.0f;
  }
  return n_frames * 160;
}

/* Full encode->decode round trip at 8 kHz (in-place-safe). */
void gsmfr_roundtrip(const float* in, float* out, size_t n) {
  EncoderState enc;
  DecoderState dec;
  FrameParams f;
  int16_t pcm[160], rec[160];
  for (size_t pos = 0; pos < n; pos += 160) {
    for (int k = 0; k < 160; ++k) {
      size_t idx = pos + k;
      pcm[k] = idx < n ? float_to_pcm(in[idx]) : 0;
    }
    encode_frame(enc, pcm, f);
    decode_frame(dec, f, rec);
    for (int k = 0; k < 160; ++k) {
      size_t idx = pos + k;
      if (idx < n) out[idx] = static_cast<float>(rec[k]) / 32768.0f;
    }
  }
}

}  /* extern "C" */
