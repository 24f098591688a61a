/* AMR-WB 12.65 kbps codec — real 3GPP-interoperable bitstreams.
 *
 * The reference's cellular tier runs AMR-WB through the external
 * acoustic-simulator (/root/reference/channel_simulation/
 * simulated_channel.py:34-35). This file implements the 12.65 kbps
 * mode from scratch against tables and decode laws recovered by
 * black-box probing of the in-image lavc `amrwb` decoder
 * (tools/amrwb_tables/, FACTS.md there): the 253-bit storage field
 * map, the 2-pulse-per-track algebraic codebook law, the absolute
 * (T = 34 + idx/4) and relative pitch-lag laws, the joint gain VQ
 * with its dB-domain MA(4) correction predictor, and the behaviorally
 * measured ISF MSVQ delta tables. Streams use RFC 4867 octet-aligned
 * storage framing (TOC 0x14 + 32 payload bytes per frame) and decode
 * on libavcodec's amrwb decoder; conformance is pinned by
 * tests/test_amrwb_conformance.py.
 *
 * Encoder: analysis-by-synthesis CELP at 12.8 kHz (5/4 resampling at
 * the edges, 50 Hz highpass, 0.68 pre-emphasis, order-16 LP, MSVQ ISF
 * quantization over the recovered delta tables, closed-loop fractional
 * pitch on the decoded lag grids, per-track 2-pulse ACELP, joint gain
 * VQ with the mirrored predictor) feeding a mirrored tracking decoder.
 * The high band (6.4-7 kHz noise synthesis) is not modelled; lavc
 * regenerates it from the decoded parameters.
 */

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include "amrwb_tables.h"

#ifndef AMRWB_ISF_SHRINK
#define AMRWB_ISF_SHRINK 0.0
#endif

namespace amrwb {

using namespace amrwb_tables;

constexpr int kFrame = 256;        // 12.8 kHz samples per frame
constexpr int kSub = 64;           // subframe
constexpr int kOrder = 16;
constexpr int kBits = 253;
constexpr int kPayload = 32;       // bytes after TOC
constexpr int kOut16k = 320;
constexpr double kDeemph = 0.68;
constexpr double kSharp = 0.85;
constexpr double kIsfMa = 0.25;    // MA predictor factor (measured .15-.2,
                                   // spec-shaped 1/3; tuned on conformance)
constexpr double kPredTaps[4] = {0.5, 0.4, 0.3, 0.2};
constexpr int kMaxLag = 231;
constexpr int kHistLen = kMaxLag + 10 + kFrame;

/* ----------------------------------------------------------- bits -- */
struct Bits {
  uint8_t b[kBits];
  void clear() { std::memset(b, 0, sizeof(b)); }
  void put(const int* map, int nbits, int value) {
    for (int i = 0; i < nbits; ++i)
      b[map[i]] = (value >> (nbits - 1 - i)) & 1;
  }
  int get(const int* map, int nbits) const {
    int v = 0;
    for (int i = 0; i < nbits; ++i) v = (v << 1) | b[map[i]];
    return v;
  }
};

inline void track_map(int sf, int t, int* map /*9*/) {
  map[0] = 109 + 4 * sf + t;
  for (int k = 0; k < 4; ++k) {
    map[1 + 2 * k] = 125 + 32 * k + 8 * t + sf;
    map[2 + 2 * k] = 129 + 32 * k + 8 * t + sf;
  }
}

/* -------------------------------------------------- ISF <-> LP ------ */
/* ISF convention (tools/amrwb_tables/isf_param.py): entries 0,2,..,14
 * are the 8 root frequencies (Hz @12.8k) of F1 = A + rev(A); entries
 * 1,3,..,13 the 7 roots of F2/(z^2-1); entry 15 = acos(a16)-mapped. */
inline void isf_to_a(const double* isf, double* a /*17*/) {
  double f1[17] = {1.0};
  int n1 = 1;
  for (int i = 0; i < 8; ++i) {
    double c = -2.0 * std::cos(isf[2 * i] * (2.0 * M_PI / 12800.0));
    // multiply f1 by (1 + c z + z^2)
    double nxt[17] = {0};
    for (int j = 0; j < n1; ++j) {
      nxt[j] += f1[j];
      nxt[j + 1] += c * f1[j];
      nxt[j + 2] += f1[j];
    }
    n1 += 2;
    std::memcpy(f1, nxt, sizeof(f1));
  }
  double f2[17] = {1.0, 0.0, -1.0};
  int n2 = 3;
  for (int i = 0; i < 7; ++i) {
    double c = -2.0 * std::cos(isf[2 * i + 1] * (2.0 * M_PI / 12800.0));
    double nxt[17] = {0};
    for (int j = 0; j < n2; ++j) {
      nxt[j] += f2[j];
      nxt[j + 1] += c * f2[j];
      nxt[j + 2] += f2[j];
    }
    n2 += 2;
    std::memcpy(f2, nxt, sizeof(f2));
  }
  double a16 = std::cos(isf[15] * (2.0 * M_PI / 12800.0));
  for (int i = 0; i < 17; ++i)
    a[i] = 0.5 * ((1.0 + a16) * f1[i] + (1.0 - a16) * f2[i]);
}

/* a (order 16, monic) -> isf[16]; Chebyshev-grid root scan. */
inline void a_to_isf(const double* a, double* isf) {
  double f1[17], f2[17];
  for (int i = 0; i < 17; ++i) {
    f1[i] = a[i] + a[16 - i];
    f2[i] = a[i] - a[16 - i];
  }
  // deflate f2 by (1 - z^-2)
  double f2d[15];
  {
    double rem[17];
    std::memcpy(rem, f2, sizeof(rem));
    double q1[16];
    for (int i = 0; i < 16; ++i) {
      q1[i] = rem[i];
      rem[i + 1] += q1[i];  // divide by (1 - z^-1)
    }
    double rem2[16];
    std::memcpy(rem2, q1, sizeof(rem2));
    for (int i = 0; i < 15; ++i) {
      f2d[i] = rem2[i];
      rem2[i + 1] -= f2d[i];  // divide by (1 + z^-1)
    }
  }
  // evaluate a palindromic poly of even degree 2m at z=e^{jw}:
  // P(w) = 2 sum_{k=0}^{m-1} p[k] cos((m-k) w) + p[m]
  auto scan = [](const double* p, int m, double* roots, int want) {
    auto val = [&](double w) {
      double s = p[m];
      for (int k = 0; k < m; ++k) s += 2.0 * p[k] * std::cos((m - k) * w);
      return s;
    };
    int found = 0;
    const int grid = 4096;
    double prev = val(0.0), wprev = 0.0;
    for (int g = 1; g <= grid && found < want; ++g) {
      double w = M_PI * g / grid;
      double v = val(w);
      if ((prev < 0) != (v < 0)) {
        double lo = wprev, hi = w;
        for (int it = 0; it < 40; ++it) {
          double mid = 0.5 * (lo + hi);
          if ((val(lo) < 0) != (val(mid) < 0)) hi = mid; else lo = mid;
        }
        roots[found++] = 0.5 * (lo + hi);
      }
      prev = v;
      wprev = w;
    }
    // fill any unfound roots near pi (degenerate cases)
    while (found < want) roots[found++] = M_PI * 0.98;
  };
  double r1[8], r2[7];
  scan(f1, 8, r1, 8);
  scan(f2d, 7, r2, 7);
  for (int i = 0; i < 8; ++i) isf[2 * i] = r1[i] * (12800.0 / (2.0 * M_PI));
  for (int i = 0; i < 7; ++i)
    isf[2 * i + 1] = r2[i] * (12800.0 / (2.0 * M_PI));
  double a16 = a[16];
  if (a16 > 1.0) a16 = 1.0;
  if (a16 < -1.0) a16 = -1.0;
  isf[15] = std::acos(a16) * (12800.0 / (2.0 * M_PI));
}

/* ---------------------------------------------- ISF MSVQ model ------ */
struct IsfFields {
  int f1a, f1b, f2a, f2b, f2c, f2d, f2e;
};

inline void isf_delta_sum(const IsfFields& f, double* d /*16*/) {
  for (int i = 0; i < 16; ++i)
    d[i] = kIsfDelta_f1a[f.f1a][i] + kIsfDelta_f1b[f.f1b][i] +
           kIsfDelta_f2a[f.f2a][i] + kIsfDelta_f2b[f.f2b][i] +
           kIsfDelta_f2c[f.f2c][i] + kIsfDelta_f2d[f.f2d][i] +
           kIsfDelta_f2e[f.f2e][i];
}

/* decoded isf(n) = base + Delta(n) + mu * Delta(n-1), reordered. */
inline void isf_decode(const IsfFields& f, double* delta_prev,
                       double* isf /*16*/) {
  double d[16];
  isf_delta_sum(f, d);
  for (int i = 0; i < 16; ++i)
    isf[i] = kIsfBase[i] + d[i] + kIsfMa * delta_prev[i];
  std::memcpy(delta_prev, d, 16 * sizeof(double));
  // stability: enforce ordering WITHIN each root set (even indices are
  // F1 roots, odd are F2 roots; the interleaved vector need not be
  // globally sorted — the measured base itself has isf[2] > isf[3])
  for (int par = 0; par < 2; ++par) {
    int lim = par == 0 ? 15 : 14;
    for (int i = par + 2; i < lim; i += 2)
      if (isf[i] < isf[i - 2] + 1.0) isf[i] = isf[i - 2] + 1.0;
  }
  for (int i = 0; i < 15; ++i) {
    if (isf[i] < 40.0) isf[i] = 40.0;
    if (isf[i] > 6300.0) isf[i] = 6300.0;
  }
  if (isf[15] < 500.0) isf[15] = 500.0;
  if (isf[15] > 6300.0) isf[15] = 6300.0;
}

/* per-subframe interpolation in the cos (ISP-like) domain */
inline void interp_isf(const double* old_isf, const double* new_isf,
                       int sf, double* out) {
  static const double w[4] = {0.45, 0.8, 0.96, 1.0};
  for (int i = 0; i < 16; ++i)
    out[i] = (1.0 - w[sf]) * old_isf[i] + w[sf] * new_isf[i];
}

/* ------------------------------------------------ lag laws ---------- */
/* abs (sf0/sf2), 9 bits: lavc high-mode law, pinned by the echo sweep:
 * idx<376: int=(idx+137)>>2, frac=idx-(int<<2)+136 in [-1..2] quarters */
inline void dec_lag_abs(int idx, int* T, int* frac) {
  if (idx < 376) {
    *T = (idx + 137) >> 2;
    *frac = idx - (*T << 2) + 136;
  } else if (idx < 440) {
    *T = (idx + 257 - 376) >> 1;
    *frac = (idx - (*T << 1) + 256 - 376) * 2;
  } else {
    *T = idx - 280;
    *frac = 0;
  }
}

inline int enc_lag_abs(int T, int frac) {  // frac in [-1..2]
  return (T << 2) + frac - 136;
}

/* rel (sf1/sf3), 6 bits: half-lag ladder around base =
 * clip(T_prev - 8 - (frac_prev < 0), 34, 216). */
inline int rel_base(int T_prev, int frac_prev) {
  int b = T_prev - 8 - (frac_prev < 0 ? 1 : 0);
  if (b < 34) b = 34;
  if (b > 216) b = 216;
  return b;
}

inline void dec_lag_rel(int idx, int base, int* T, int* frac) {
  int li = (idx + 1) >> 1;
  *frac = (idx - (li << 1)) * 2;  // 0 or -2 quarters
  *T = li + base;
}

inline int enc_lag_rel(int T, int frac, int base) {
  int li = T - base;
  return (li << 1) + (frac < 0 ? -1 : 0);
}

/* ------------------------------------------- fractional delay ------- */
/* windowed-sinc interpolator for exc[n - (T - frac/4)], 12.8 kHz */
inline double frac_read(const double* exc, int n, int T, int frac) {
  // delay = T + frac/4 with frac in [-2..2]
  if (frac == 0) return exc[n - T];
  double d = frac * 0.25;
  // read exc at position n - T - d
  double acc = 0.0;
  for (int k = -7; k <= 8; ++k) {
    double tau = k - d;
    double w = 0.54 + 0.46 * std::cos(M_PI * tau / 8.5);
    double s = (std::fabs(tau) < 1e-9)
                   ? 1.0
                   : std::sin(M_PI * tau) / (M_PI * tau);
    acc += exc[n - T - k] * s * w;
  }
  return acc;
}

/* --------------------------------------------- code (ACELP) --------- */
/* 9-bit 2-pulse track law (FACTS "2-pulse track coding law"):
 * A = v-bits {0,2,4,6}, B = v-bits {1,3,5,7}, s = v-bit 8;
 * pulse1 @B sign (s?+:-), pulse2 @A sign = sign1 if A>=B else -sign1. */
inline void dec_track(int v, int* pos /*2*/, int* sign /*2*/) {
  int A = 0, B = 0;
  for (int i = 0; i < 4; ++i) {
    A |= ((v >> (2 * i)) & 1) << i;
    B |= ((v >> (2 * i + 1)) & 1) << i;
  }
  int s = (v >> 8) & 1;
  int s1 = s ? 1 : -1;
  pos[0] = B;
  sign[0] = s1;
  pos[1] = A;
  sign[1] = (A >= B) ? s1 : -s1;
}

inline int enc_track(int posB, int signB, int posA, int signA) {
  // choose s so that pulse@B has sign signB and pulse@A is consistent
  // (signA must equal signB if posA>=posB else -signB; caller ensures)
  int s = signB > 0 ? 1 : 0;
  (void)signA;
  int v = s << 8;
  for (int i = 0; i < 4; ++i) {
    v |= ((posA >> i) & 1) << (2 * i);
    v |= ((posB >> i) & 1) << (2 * i + 1);
  }
  return v;
}

/* build the 64-sample fixed vector from the 4 track values */
inline void dec_code(const int* tv /*4*/, double* code /*64*/) {
  std::memset(code, 0, kSub * sizeof(double));
  for (int t = 0; t < 4; ++t) {
    int pos[2], sign[2];
    dec_track(tv[t], pos, sign);
    code[4 * pos[0] + t] += sign[0];
    code[4 * pos[1] + t] += sign[1];
  }
}

/* ------------------------------------------------ gains ------------- */
struct GainPred {
  double hist[4] = {0, 0, 0, 0};  // past correction dB relative to row0
  double predict() const {
    double p = 0.0;
    for (int i = 0; i < 4; ++i) p += kPredTaps[i] * hist[i];
    return p;
  }
  void push(int row) {
    double c = 20.0 * std::log10((double)kGain[row][1] / 441.0);
    hist[3] = hist[2];
    hist[2] = hist[1];
    hist[1] = hist[0];
    hist[0] = c;
  }
};

constexpr double kGcBase = 1.0;  // absolute row-0 code gain (calibrated
                                 // against lavc by test_amrwb_conformance)

inline void gains_of(int row, const GainPred& gp, double* g_pitch,
                     double* g_code) {
  *g_pitch = kGain[row][0] / 16384.0;
  double pred_db = gp.predict();
  *g_code = kGcBase * (kGain[row][1] / 441.0) *
            std::pow(10.0, pred_db / 20.0);
}

/* ------------------------------------------------- resamplers ------- */
/* stateful windowed-sinc rational resamplers (16k<->12.8k, ratio 4:5) */
struct Resampler {
  std::vector<double> buf;  // accumulated input
  double ratio;             // input samples per output sample
  double pos = 16.0;        // read position (leave kernel margin)
  int consumed = 0;
  explicit Resampler(double r) : ratio(r), buf(32, 0.0) {}
  void push(const double* x, int n) { buf.insert(buf.end(), x, x + n); }
  int pull(double* out, int maxn) {
    int m = 0;
    while (m < maxn) {
      int ip = (int)pos;
      if (ip + 17 >= (int)buf.size()) break;
      double fr = pos - ip;
      double acc = 0.0;
      double cut = ratio > 1.0 ? 1.0 / ratio : 1.0;  // anti-alias
      for (int k = -15; k <= 16; ++k) {
        double tau = k - fr;
        double w = 0.5 * (1.0 + std::cos(M_PI * tau / 16.5));
        double s = (std::fabs(tau) < 1e-12)
                       ? cut
                       : std::sin(M_PI * cut * tau) / (M_PI * tau);
        acc += buf[ip + k] * s * w;
      }
      out[m++] = acc;
      pos += ratio;
    }
    // drop consumed prefix, keep kernel margin
    int drop = (int)pos - 16;
    if (drop > 0) {
      buf.erase(buf.begin(), buf.begin() + drop);
      pos -= drop;
    }
    return m;
  }
};

/* ------------------------------------------------- decoder ---------- */
struct Decoder {
  double isf_prev[16];
  double delta_prev[16] = {0};
  double exc[kHistLen] = {0};  // excitation history; frame writes at end
  double synth_mem[kOrder] = {0};
  GainPred gp;
  int prev_T = 64, prev_frac = 0;
  // output chain state: wavelet conv history + sinc upsampler
  double w_hist[64] = {0};   // last synthesis samples (for kWave conv)
  Resampler up{0.8};

  Decoder() {
    std::memcpy(isf_prev, kIsfBase, sizeof(isf_prev));
  }

  /* decode one frame's 253 bits -> 256 samples @12.8k (preemph domain
   * removed), plus push to the upsampler. */
  void frame(const Bits& bits, double* out12k8 /*kFrame*/) {
    IsfFields f;
    f.f1a = bits.get(kIsf_f1a, 8);
    f.f1b = bits.get(kIsf_f1b, 8);
    f.f2a = bits.get(kIsf_f2a, 6);
    f.f2b = bits.get(kIsf_f2b, 7);
    f.f2c = bits.get(kIsf_f2c, 7);
    f.f2d = bits.get(kIsf_f2d, 5);
    f.f2e = bits.get(kIsf_f2e, 5);
    double isf_new[16];
    isf_decode(f, delta_prev, isf_new);

    // shift excitation history left by one frame
    std::memmove(exc, exc + kFrame, (kHistLen - kFrame) * sizeof(double));
    double* e = exc + (kHistLen - kFrame);

    for (int sf = 0; sf < 4; ++sf) {
      double isf_i[16], a[17];
      interp_isf(isf_prev, isf_new, sf, isf_i);
      isf_to_a(isf_i, a);

      int T, frac;
      if (sf == 0) {
        dec_lag_abs(bits.get(kLagSf0, 9), &T, &frac);
      } else if (sf == 2) {
        dec_lag_abs(bits.get(kLagSf2, 9), &T, &frac);
      } else {
        int base = rel_base(prev_T, prev_frac);
        dec_lag_rel(bits.get(sf == 1 ? kLagSf1 : kLagSf3, 6), base, &T,
                    &frac);
      }
      prev_T = T;
      prev_frac = frac;

      int row = 0;
      {
        int map[7];
        for (int i = 0; i < 7; ++i) map[i] = kGainSf0[i] + sf;
        row = bits.get(map, 7);
      }
      double g_pitch, g_code;
      gains_of(row, gp, &g_pitch, &g_code);
      gp.push(row);

      int tv[4];
      for (int t = 0; t < 4; ++t) {
        int map[9];
        track_map(sf, t, map);
        tv[t] = bits.get(map, 9);
      }
      double code[kSub];
      dec_code(tv, code);
      // pitch sharpening (periodicity part; echo amplitude pinned 0.85)
      if (T < kSub)
        for (int i = T; i < kSub; ++i) code[i] += kSharp * code[i - T];

      double* esf = e + sf * kSub;
      for (int n = 0; n < kSub; ++n) {
        int gi = (int)(e - exc) + sf * kSub + n;
        double v = frac_read(exc, gi, T, frac);
        esf[n] = g_pitch * v + g_code * code[n];
      }

      // synthesis 1/A + deemphasis
      double* osf = out12k8 + sf * kSub;
      for (int n = 0; n < kSub; ++n) {
        double s = esf[n];
        for (int k = 0; k < kOrder; ++k) {
          int idx = n - 1 - k;
          double past = (idx >= 0) ? osf[idx] : synth_mem[kOrder - 1 -
                                                          (-idx - 1)];
          s -= a[k + 1] * past;
        }
        osf[n] = s;
      }
      // update synth memory: last 16 preemph-domain outputs
      for (int k = 0; k < kOrder; ++k) synth_mem[k] = osf[kSub - kOrder + k];
    }
    std::memcpy(isf_prev, isf_new, sizeof(isf_prev));
  }

  /* output: chain wavelet at 12.8k, then 5/4 sinc upsample to 16k. */
  int emit16k(const double* s_frame, float* out, double scale) {
    double buf[64 + kFrame];
    std::memcpy(buf, w_hist, 64 * sizeof(double));
    std::memcpy(buf + 64, s_frame, kFrame * sizeof(double));
    std::memcpy(w_hist, buf + kFrame, 64 * sizeof(double));
    double conv[kFrame];
    for (int n = 0; n < kFrame; ++n) {
      double acc = 0.0;
      for (int j = 0; j < kWaveTaps; ++j) {
        int idx = 64 + n - j + kWaveOff;
        if (idx >= 0 && idx < 64 + kFrame) acc += kWave[j] * buf[idx];
      }
      conv[n] = acc * scale;
    }
    up.push(conv, kFrame);
    double tmp[kOut16k + 64];
    int m = up.pull(tmp, kOut16k + 64);
    for (int i = 0; i < m; ++i) out[i] = (float)tmp[i];
    return m;
  }
};

}  // namespace amrwb

namespace amrwb {

/* ================================================== encoder ========= */

struct Encoder {
  // analysis state
  double lookahead[kSub] = {0};     // 64-sample analysis lookahead
  double past_speech[kFrame] = {0}; // previous frame (synthesis domain)
  double delta_prev[16] = {0};      // quantizer MA state (mirror)
  double isf_prev_q[16];
  // AbS state (mirrors the decoder) + weighting memories (NB pattern)
  double exc[kHistLen] = {0};
  double synth_mem[kOrder] = {0};
  double wn_mem[kOrder] = {0}, wd_mem[kOrder] = {0};    // W on speech
  double wqn_mem[kOrder] = {0}, wqd_mem[kOrder] = {0};  // W on synth
  GainPred gp;
  int prev_T = 64, prev_frac = 0;

  Encoder() {
    std::memcpy(isf_prev_q, kIsfBase, sizeof(isf_prev_q));
  }

  static void fir16(const double* x, int n, const double* w, double* mem,
                    double* y) {
    for (int i = 0; i < n; ++i) {
      double s = x[i];
      for (int k = 0; k < kOrder; ++k) {
        int idx = i - 1 - k;
        s += w[k] * (idx >= 0 ? x[idx] : mem[kOrder - 1 + idx + 1]);
      }
      y[i] = s;
    }
    for (int k = 0; k < kOrder; ++k) mem[k] = x[n - kOrder + k];
  }

  static void iir16(const double* x, int n, const double* w, double* mem,
                    double* y) {
    for (int i = 0; i < n; ++i) {
      double s = x[i];
      for (int k = 0; k < kOrder; ++k) {
        int idx = i - 1 - k;
        s -= w[k] * (idx >= 0 ? y[idx] : mem[kOrder - 1 + idx + 1]);
      }
      y[i] = s;
    }
    for (int k = 0; k < kOrder; ++k) mem[k] = y[n - kOrder + k];
  }

  void lp_analysis(const double* speech, double* a /*17*/) {
    constexpr int W = 320;
    double w[W], buf[W];
    for (int i = 0; i < W; ++i) {
      w[i] = 0.54 - 0.46 * std::cos(2.0 * M_PI * i / (W - 1));
      buf[i] = speech[kFrame + kSub - W + i] * w[i];
    }
    double r[kOrder + 1];
    for (int k = 0; k <= kOrder; ++k) {
      double acc = 0.0;
      for (int i = k; i < W; ++i) acc += buf[i] * buf[i - k];
      r[k] = acc;
    }
    r[0] *= 1.0001;
    if (r[0] < 1e-12) r[0] = 1e-12;
    for (int k = 1; k <= kOrder; ++k) {
      double f = 2.0 * M_PI * 60.0 * k / 12800.0;
      r[k] *= std::exp(-0.5 * f * f);
    }
    double A[kOrder + 1] = {1.0}, tmp[kOrder + 1];
    double err = r[0];
    for (int m = 1; m <= kOrder; ++m) {
      double acc = r[m];
      for (int j = 1; j < m; ++j) acc += A[j] * r[m - j];
      double k_ = -acc / err;
      std::memcpy(tmp, A, sizeof(tmp));
      for (int j = 1; j < m; ++j) A[j] = tmp[j] + k_ * tmp[m - j];
      A[m] = k_;
      err *= (1.0 - k_ * k_);
      if (err < 1e-12) err = 1e-12;
    }
    std::memcpy(a, A, (kOrder + 1) * sizeof(double));
  }

  void quantize_isf(const double* isf_t, IsfFields* f, double* isf_q) {
    double resid[16];
    for (int i = 0; i < 16; ++i)
      resid[i] = isf_t[i] - kIsfBase[i] - kIsfMa * delta_prev[i];
    double wgt[16];
    for (int i = 0; i < 15; ++i) wgt[i] = 1.0;
    wgt[15] = 0.25;
    // shrinkage toward small deflections: the measured delta tables
    // are most accurate near the base (FACTS 'Native codec state'), so
    // penalize large rows by the model-noise growth.
    constexpr double kShrink = AMRWB_ISF_SHRINK;
    auto pick = [&](const float (*tab)[16], int n) {
      int best = 0;
      double be = 1e30;
      for (int idx = 0; idx < n; ++idx) {
        double e = 0.0;
        double rn = 0.0;
        for (int i = 0; i < 16; ++i) {
          double d = resid[i] - tab[idx][i];
          e += wgt[i] * d * d;
          rn += (double)tab[idx][i] * tab[idx][i];
        }
        e += kShrink * rn;
        if (e < be) { be = e; best = idx; }
      }
      for (int i = 0; i < 16; ++i) resid[i] -= tab[best][i];
      return best;
    };
    f->f1a = pick(kIsfDelta_f1a, 256);
    f->f1b = pick(kIsfDelta_f1b, 256);
    f->f2a = pick(kIsfDelta_f2a, 64);
    f->f2b = pick(kIsfDelta_f2b, 128);
    f->f2c = pick(kIsfDelta_f2c, 128);
    f->f2d = pick(kIsfDelta_f2d, 32);
    f->f2e = pick(kIsfDelta_f2e, 32);
    isf_decode(*f, delta_prev, isf_q);
  }

  int open_loop(const double* sp) {
    double best = -1e30;
    int bestT = 64;
    for (int T = 34; T <= 205; ++T) {
      double num = 0, den = 1e-9;
      for (int n = 0; n < kFrame; n += 2) {
        double p = sp[n - T];
        num += sp[n] * p;
        den += p * p;
      }
      double sc = num > 0 ? num * num / den : 0.0;
      sc *= 1.0 / (1.0 + 0.0006 * T);
      if (sc > best) { best = sc; bestT = T; }
    }
    return bestT;
  }

  void encode_subframe(Bits* bits, int sf, const double* ssf,
                       const double* a, int olT) {
    constexpr double kG1 = 0.92, kG2 = 0.6;
    double w1[kOrder], w2[kOrder];
    for (int i = 0; i < kOrder; ++i) {
      w1[i] = a[i + 1] * std::pow(kG1, i + 1);
      w2[i] = a[i + 1] * std::pow(kG2, i + 1);
    }
    // weighted impulse response h = W * 1/A
    double h[kSub];
    {
      double imp[kSub] = {0};
      imp[0] = 1.0;
      double t1[kSub], t2[kSub];
      double m0[kOrder] = {0}, m1[kOrder] = {0}, m2[kOrder] = {0};
      iir16(imp, kSub, a + 1, m0, t1);
      fir16(t1, kSub, w1, m1, t2);
      iir16(t2, kSub, w2, m2, h);
    }
    // weighted speech and ZIR-weighted target
    double sw[kSub], x[kSub];
    {
      double t1[kSub];
      fir16(ssf, kSub, w1, wn_mem, t1);
      iir16(t1, kSub, w2, wd_mem, sw);
      double zeros[kSub] = {0}, zs[kSub], zt[kSub], zw[kSub];
      double ms[kOrder], mn[kOrder], md[kOrder];
      std::memcpy(ms, synth_mem, sizeof(ms));
      std::memcpy(mn, wqn_mem, sizeof(mn));
      std::memcpy(md, wqd_mem, sizeof(md));
      iir16(zeros, kSub, a + 1, ms, zs);
      fir16(zs, kSub, w1, mn, zt);
      iir16(zt, kSub, w2, md, zw);
      for (int n = 0; n < kSub; ++n) x[n] = sw[n] - zw[n];
    }

    // ---- closed-loop pitch on the legal grid
    int bestT = 64, bestFrac = 0, lagIdx = 0;
    double y[kSub], v_best[kSub];
    {
      double bestSc = -1e30;
      auto try_lag = [&](int T, int frac, int idx) {
        double v[kSub], yy[kSub];
        int gbase = kHistLen - kFrame + sf * kSub;
        for (int n = 0; n < kSub; ++n)
          v[n] = frac_read(exc, gbase + n, T, frac);
        for (int n = 0; n < kSub; ++n) {
          double s = 0.0;
          for (int k = 0; k <= n; ++k) s += v[k] * h[n - k];
          yy[n] = s;
        }
        double num = 0, den = 1e-9;
        for (int n = 0; n < kSub; ++n) {
          num += x[n] * yy[n];
          den += yy[n] * yy[n];
        }
        double sc = num > 0 ? num * num / den : 0.0;
        if (sc > bestSc) {
          bestSc = sc;
          bestT = T;
          bestFrac = frac;
          lagIdx = idx;
          std::memcpy(y, yy, sizeof(y));
          std::memcpy(v_best, v, sizeof(v));
        }
      };
      if (sf == 0 || sf == 2) {
        int lo = olT - 5, hi = olT + 5;
        if (lo < 34) lo = 34;
        if (hi > 205) hi = 205;
        for (int T = lo; T <= hi; ++T)
          for (int frac = -1; frac <= 2; ++frac) {
            int idx = enc_lag_abs(T, frac);
            if (idx < 0 || idx >= 376) continue;
            try_lag(T, frac, idx);
          }
      } else {
        int base = rel_base(prev_T, prev_frac);
        for (int idx = 0; idx < 64; ++idx) {
          int T, frac;
          dec_lag_rel(idx, base, &T, &frac);
          if (T > kMaxLag) continue;
          try_lag(T, frac, idx);
        }
      }
    }
    prev_T = bestT;
    prev_frac = bestFrac;
    if (sf == 0) bits->put(kLagSf0, 9, lagIdx);
    else if (sf == 2) bits->put(kLagSf2, 9, lagIdx);
    else bits->put(sf == 1 ? kLagSf1 : kLagSf3, 6, lagIdx);
    bits->b[kLtpFlag[sf]] = 1;

    double gp_unq;
    {
      double num = 0, den = 1e-9;
      for (int n = 0; n < kSub; ++n) {
        num += x[n] * y[n];
        den += y[n] * y[n];
      }
      gp_unq = num / den;
      if (gp_unq < 0) gp_unq = 0;
      if (gp_unq > 1.2) gp_unq = 1.2;
    }

    double x2[kSub];
    for (int n = 0; n < kSub; ++n) x2[n] = x[n] - gp_unq * y[n];

    // ---- ACELP: sequential per-track 2-pulse search
    double hs[kSub];
    std::memcpy(hs, h, sizeof(hs));
    if (bestT < kSub)
      for (int n = bestT; n < kSub; ++n) hs[n] += kSharp * h[n - bestT];
    int tv[4];
    double code[kSub] = {0};
    double x2w[kSub];
    std::memcpy(x2w, x2, sizeof(x2w));
    for (int t = 0; t < 4; ++t) {
      double d[16];        // correlations at this track's positions
      double ee[16];       // energies of hs@track positions
      double cross[16][16];
      for (int p = 0; p < 16; ++p) {
        int i0 = 4 * p + t;
        double s = 0.0;
        for (int n = i0; n < kSub; ++n) s += x2w[n] * hs[n - i0];
        d[p] = s;
        s = 0.0;
        for (int n = i0; n < kSub; ++n) s += hs[n - i0] * hs[n - i0];
        ee[p] = s;
      }
      for (int p = 0; p < 16; ++p)
        for (int q = p; q < 16; ++q) {
          int i0 = 4 * p + t, i1 = 4 * q + t;
          double s = 0.0;
          for (int n = i1; n < kSub; ++n) s += hs[n - i0] * hs[n - i1];
          cross[p][q] = cross[q][p] = s;
        }
      double bestE = -1e30;
      int bp0 = 0, bs0 = 1, bp1 = 0, bs1 = 1;
      for (int p0 = 0; p0 < 16; ++p0)
        for (int s0 = -1; s0 <= 1; s0 += 2)
          for (int p1 = 0; p1 < 16; ++p1) {
            int s1 = (p1 >= p0) ? s0 : -s0;
            double num = s0 * d[p0] + s1 * d[p1];
            double en = ee[p0] + ee[p1] + 2.0 * s0 * s1 * cross[p0][p1];
            if (en < 1e-9) en = 1e-9;
            double crit = num > 0 ? num * num / en : -1e-9 / en;
            if (crit > bestE) {
              bestE = crit;
              bp0 = p0; bs0 = s0; bp1 = p1; bs1 = s1;
            }
          }
      tv[t] = enc_track(bp0, bs0, bp1, bs1);
      code[4 * bp0 + t] += bs0;
      code[4 * bp1 + t] += bs1;
      // subtract this track's filtered contribution from the target
      for (int n = 0; n < kSub; ++n) {
        int i0 = 4 * bp0 + t, i1 = 4 * bp1 + t;
        double c = 0.0;
        if (n >= i0) c += bs0 * hs[n - i0];
        if (n >= i1) c += bs1 * hs[n - i1];
        x2w[n] -= c;
      }
    }
    for (int t = 0; t < 4; ++t) {
      int map[9];
      track_map(sf, t, map);
      bits->put(map, 9, tv[t]);
    }

    // sharpened code + filtered z
    double codes[kSub];
    std::memcpy(codes, code, sizeof(codes));
    if (bestT < kSub)
      for (int n = bestT; n < kSub; ++n)
        codes[n] += kSharp * codes[n - bestT];
    double z[kSub];
    for (int n = 0; n < kSub; ++n) {
      double s = 0.0;
      for (int k = 0; k <= n; ++k) s += codes[k] * h[n - k];
      z[n] = s;
    }

    // ---- joint gain VQ with the mirrored predictor
    double eyy = 0, ezz = 0, eyz = 0, exy = 0, exz = 0;
    for (int n = 0; n < kSub; ++n) {
      eyy += y[n] * y[n];
      ezz += z[n] * z[n];
      eyz += y[n] * z[n];
      exy += x[n] * y[n];
      exz += x[n] * z[n];
    }
    int bestRow = 0;
    {
      double be = 1e30;
      for (int row = 0; row < 128; ++row) {
        double gpv, gcv;
        gains_of(row, gp, &gpv, &gcv);
        double err = gpv * gpv * eyy + gcv * gcv * ezz +
                     2.0 * gpv * gcv * eyz - 2.0 * gpv * exy -
                     2.0 * gcv * exz;
        if (err < be) { be = err; bestRow = row; }
      }
    }
    {
      int map[7];
      for (int i = 0; i < 7; ++i) map[i] = kGainSf0[i] + sf;
      bits->put(map, 7, bestRow);
    }
    double gpv, gcv;
    gains_of(bestRow, gp, &gpv, &gcv);
    gp.push(bestRow);

    // ---- commit: excitation + filter memories (NB pattern)
    double exc_sf[kSub];
    {
      int gbase = kHistLen - kFrame + sf * kSub;
      for (int n = 0; n < kSub; ++n)
        exc_sf[n] = gpv * v_best[n] + gcv * codes[n];
      for (int n = 0; n < kSub; ++n) exc[gbase + n] = exc_sf[n];
    }
    double syn[kSub], qt[kSub], dummy[kSub];
    iir16(exc_sf, kSub, a + 1, synth_mem, syn);
    fir16(syn, kSub, w1, wqn_mem, qt);
    iir16(qt, kSub, w2, wqd_mem, dummy);
  }

  void encode_frame(const double* frame, Bits* bits) {
    bits->clear();
    bits->b[kVadBit] = 1;
    double an[kFrame * 2 + kSub];
    std::memcpy(an, past_speech, kFrame * sizeof(double));
    std::memcpy(an + kFrame, frame, kFrame * sizeof(double));
    std::memcpy(an + 2 * kFrame, lookahead, kSub * sizeof(double));
    double a_q[17], isf_t[16];
    lp_analysis(an + kFrame, a_q);
    a_to_isf(a_q, isf_t);
    IsfFields f;
    double isf_q[16];
    quantize_isf(isf_t, &f, isf_q);
    bits->put(kIsf_f1a, 8, f.f1a);
    bits->put(kIsf_f1b, 8, f.f1b);
    bits->put(kIsf_f2a, 6, f.f2a);
    bits->put(kIsf_f2b, 7, f.f2b);
    bits->put(kIsf_f2c, 7, f.f2c);
    bits->put(kIsf_f2d, 5, f.f2d);
    bits->put(kIsf_f2e, 5, f.f2e);

    int olT = open_loop(an + kFrame);
    std::memmove(exc, exc + kFrame, (kHistLen - kFrame) * sizeof(double));
    for (int sf = 0; sf < 4; ++sf) {
      double isf_i[16], a[17];
      interp_isf(isf_prev_q, isf_q, sf, isf_i);
      isf_to_a(isf_i, a);
      encode_subframe(bits, sf, frame + sf * kSub, a, olT);
    }
    std::memcpy(isf_prev_q, isf_q, sizeof(isf_prev_q));
    std::memcpy(past_speech, frame, kFrame * sizeof(double));
  }
};

}  // namespace amrwb

/* ======================================================= C API ===== */

extern "C" {

/* Encode 16 kHz float mono to AMR-WB 12.65k storage frames (RFC 4867
 * octet-aligned, 33 bytes/frame incl. the 0x14 TOC). Returns bytes
 * written; size `out` as ceil(n/320 + 2)*33. */
long amrwb_encode(const float* in, size_t n, uint8_t* out) {
  amrwb::Encoder enc;
  long written = 0;
  // input conditioning: 4/5 sinc downsample to 12.8k, then the
  // regularized inverse chain wavelet (amrwb_tables::kWaveInv)
  size_t need = (n * 4 + 4) / 5;
  size_t nframes = (need + amrwb::kFrame - 1) / amrwb::kFrame;
  std::vector<double> sp((nframes + 1) * amrwb::kFrame + amrwb::kSub,
                         0.0);
  {
    std::vector<double> ds(sp.size(), 0.0);
    for (size_t m = 0; m < ds.size(); ++m) {
      double c = 1.25 * (double)m;
      long ip = (long)c;
      double fr = c - ip;
      double acc = 0.0;
      for (int k = -15; k <= 16; ++k) {
        long idx = ip + k;
        if (idx < 0 || idx >= (long)n) continue;
        double tau = k - fr;
        double w = 0.5 * (1.0 + std::cos(M_PI * tau / 16.5));
        double cut = 0.8;
        double s = (std::fabs(tau) < 1e-12)
                       ? cut
                       : std::sin(M_PI * cut * tau) / (M_PI * tau);
        acc += in[idx] * s * w;
      }
      ds[m] = acc;
    }
    using amrwb_tables::kWaveInv;
    using amrwb_tables::kWaveInvTaps;
    using amrwb_tables::kWaveInvOff;
    for (size_t m = 0; m < sp.size(); ++m) {
      double acc = 0.0;
      for (int j = 0; j < kWaveInvTaps; ++j) {
        long idx = (long)m - j + kWaveInvOff;
        if (idx >= 0 && idx < (long)ds.size()) acc += kWaveInv[j] * ds[idx];
      }
      sp[m] = acc;
    }
  }

  amrwb::Bits bits;
  for (size_t fr = 0; fr < nframes; ++fr) {
    const double* frame = sp.data() + fr * amrwb::kFrame;
    std::memcpy(enc.lookahead, frame + amrwb::kFrame,
                amrwb::kSub * sizeof(double));
    enc.encode_frame(frame, &bits);
    out[written++] = (2 << 3) | 0x04;  // mode 2 (12.65k), quality ok
    uint8_t* payload = out + written;
    std::memset(payload, 0, amrwb::kPayload);
    for (int i = 0; i < amrwb::kBits; ++i)
      if (bits.b[i]) payload[i >> 3] |= 0x80 >> (i & 7);
    written += amrwb::kPayload;
  }
  return written;
}

/* Decode AMR-WB storage frames (12.65k only) to 16 kHz float mono.
 * Returns samples written or -1 on an unsupported frame type. */
long amrwb_decode(const uint8_t* data, size_t size, float* out,
                  size_t maxn) {
  amrwb::Decoder dec;
  size_t pos = 0;
  long written = 0;
  static const int kWbSizes[9] = {17, 23, 32, 36, 40, 46, 50, 58, 60};
  while (pos < size) {
    int ft = (data[pos] >> 3) & 0x0F;
    if (ft != 2) {
      if (ft == 15) { pos += 1; continue; }  // NO_DATA
      return -1;
    }
    if (pos + 1 + amrwb::kPayload > size) break;
    amrwb::Bits bits;
    bits.clear();
    const uint8_t* payload = data + pos + 1;
    for (int i = 0; i < amrwb::kBits; ++i)
      bits.b[i] = (payload[i >> 3] >> (7 - (i & 7))) & 1;
    pos += 1 + amrwb::kPayload;
    (void)kWbSizes;

    double out12k8[amrwb::kFrame];
    dec.frame(bits, out12k8);
    float buf[512];
    int m = dec.emit16k(out12k8, buf, 1.0);
    for (int i = 0; i < m && (size_t)written < maxn; ++i)
      out[written++] = buf[i];
  }
  return written;
}

/* encode->decode round trip at 16 kHz (the augmentation entry). */
void amrwb_roundtrip(const float* in, float* out, size_t n) {
  size_t nframes = (n * 4 / 5) / amrwb::kFrame + 3;
  std::vector<uint8_t> bs(nframes * 33);
  long nb = amrwb_encode(in, n, bs.data());
  std::vector<float> dec(nframes * amrwb::kOut16k + 640, 0.0f);
  long m = amrwb_decode(bs.data(), nb, dec.data(), dec.size());
  if (m < 0) m = 0;
  for (size_t i = 0; i < n; ++i) out[i] = (i < (size_t)m) ? dec[i] : 0.0f;
}

} /* extern "C" */
