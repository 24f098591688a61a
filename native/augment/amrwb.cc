/* AMR-WB 12.65 kbps codec — EXACT decoder replica + AbS encoder.
 *
 * Round-5 rewrite on the fully recovered lavc pipeline
 * (tools/amrwb_tables/truedec.py is the validated Python reference:
 * 0.9997 waveform corr vs the in-image lavc decoder on fully random
 * bitstreams).  The decoder here ports that model 1:1; the encoder
 * runs analysis-by-synthesis against an embedded replica so encoder
 * and decoder state stay in lockstep.
 *
 * Pipeline (TS 26.190 structure, constants/tables binary-exact from
 * the lavc image — see native/augment/amrwb_truth.h):
 *   bits -> {ISF split-MSVQ + mean + MA(1/3) + reorder 1/256}
 *        -> ISP cos(2pi .) (entry 15 doubled) -> interpolated A(z)
 *   exc  -> gp * interp(past exc, 65-tap 1/4-phase kernel, in place)
 *         + gc * 2-pulse-per-track code (tilt + 0.85 sharpening)
 *        -> integer-truncated adaptive memory; enhanced (noise/pitch
 *           enhancer) synthesis excitation
 *   out  -> 1/A -> de-emphasis 0.68 -> 31 Hz HPF -> 5/4 polyphase
 *           upsample (23-tap phase FIRs) -> /32768
 *
 * Matches the reference's amrwb channel entries
 * (/root/reference/channel_simulation/simulated_channel.py:33-35).
 */

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include "amrwb_truth.h"

namespace wb {

constexpr int kBits = 253;
constexpr int kSub = 64;
constexpr int kFrame = 256;
constexpr int kPayload = 32;
constexpr int kHist = 256;          // exc history kept behind the frame
constexpr double kScale = 1.0 / 32768.0;

/* ------------------------------------------------ bit packing ---- */
struct Bits {
  uint8_t b[kBits];
  void clear() { std::memset(b, 0, sizeof(b)); }
  int get(const int* map, int n) const {
    int v = 0;
    for (int i = 0; i < n; ++i) v = (v << 1) | b[map[i]];
    return v;
  }
  void put(const int* map, int n, int v) {
    for (int i = 0; i < n; ++i) b[map[i]] = (v >> (n - 1 - i)) & 1;
  }
};

/* ------------------------------------------------ ISF <-> A ------ */
inline void isf_residual(const int idx[7], double r[16]) {
  // float-order adds, as the lavc dequant does (each element scaled
  // by 2^-15 in float, then the stage-2 element added in float)
  float rf[16];
  for (int i = 0; i < 9; ++i) rf[i] = wbt::k_d1[idx[0]][i] * (float)kScale;
  for (int i = 0; i < 7; ++i)
    rf[9 + i] = wbt::k_d2[idx[1]][i] * (float)kScale;
  for (int i = 0; i < 3; ++i) rf[i] += wbt::k_d21[idx[2]][i] * (float)kScale;
  for (int i = 0; i < 3; ++i)
    rf[3 + i] += wbt::k_d22[idx[3]][i] * (float)kScale;
  for (int i = 0; i < 3; ++i)
    rf[6 + i] += wbt::k_d23[idx[4]][i] * (float)kScale;
  for (int i = 0; i < 3; ++i)
    rf[9 + i] += wbt::k_d24[idx[5]][i] * (float)kScale;
  for (int i = 0; i < 4; ++i)
    rf[12 + i] += wbt::k_d25[idx[6]][i] * (float)kScale;
  for (int i = 0; i < 16; ++i) r[i] = rf[i];
}

inline void isf_to_isp(const double isf[16], double isp[16]) {
  for (int i = 0; i < 15; ++i) isp[i] = std::cos(2.0 * M_PI * isf[i]);
  isp[15] = std::cos(4.0 * M_PI * isf[15]);
}

inline void isp_to_a(const double isp[16], double a[17]) {
  double f1[18] = {1.0};
  for (int i = 0; i < 8; ++i) {
    double q = isp[2 * i];
    // convolve f1 with (1, -2q, 1)
    double tmp[18];
    int len = 2 * i + 1;
    for (int j = 0; j < len + 2; ++j) {
      double v = 0.0;
      if (j < len) v += f1[j];
      if (j >= 1 && j - 1 < len) v += -2.0 * q * f1[j - 1];
      if (j >= 2 && j - 2 < len) v += f1[j - 2];
      tmp[j] = v;
    }
    std::memcpy(f1, tmp, (len + 2) * sizeof(double));
  }
  double f2[18] = {1.0, 0.0, -1.0};
  for (int i = 0; i < 7; ++i) {
    double q = isp[2 * i + 1];
    double tmp[18];
    int len = 2 * i + 3;
    for (int j = 0; j < len + 2; ++j) {
      double v = 0.0;
      if (j < len) v += f2[j];
      if (j >= 1 && j - 1 < len) v += -2.0 * q * f2[j - 1];
      if (j >= 2 && j - 2 < len) v += f2[j - 2];
      tmp[j] = v;
    }
    std::memcpy(f2, tmp, (len + 2) * sizeof(double));
  }
  double a16 = isp[15];
  for (int i = 0; i < 17; ++i)
    a[i] = 0.5 * ((1.0 + a16) * f1[i] + (1.0 - a16) * f2[i]);
}

/* A(z) -> normalized isf (encoder side; root-finding on F1/F2). */
inline void a_to_isf(const double a[17], double isf[16]) {
  double f1[17], f2[17];
  for (int i = 0; i < 17; ++i) {
    f1[i] = a[i] + a[16 - i];
    f2[i] = a[i] - a[16 - i];
  }
  // deflate f2 by (1 - z^-2)
  double f2d[15];
  {
    double r[17];
    std::memcpy(r, f2, sizeof(r));
    double q1[16];
    for (int i = 0; i < 16; ++i) {
      q1[i] = r[i];
      r[i + 1] += q1[i];
    }
    double* rr = q1;
    for (int i = 0; i < 15; ++i) {
      f2d[i] = rr[i];
      rr[i + 1] -= f2d[i];
    }
  }
  auto roots_of = [](const double* p, int deg, int expect, double* ang) {
    // evaluate on a fine cosine grid; p is symmetric -> use Chebyshev
    // form: P(w) = sum p[i] cos((deg/2-i) w) over half
    int found = 0;
    int half = deg / 2;
    auto val = [&](double w) {
      double s = p[half];
      for (int i = 0; i < half; ++i)
        s += 2.0 * p[i] * std::cos((half - i) * w);
      return s;
    };
    double prev = val(0.0);
    double pw = 0.0;
    for (int g = 1; g <= 4096 && found < expect; ++g) {
      double w = M_PI * g / 4096.0;
      double v = val(w);
      if (prev == 0.0) prev = 1e-12;
      if (v == 0.0 || (v > 0) != (prev > 0)) {
        double lo = pw, hi = w;
        for (int it = 0; it < 40; ++it) {
          double mid = 0.5 * (lo + hi);
          if ((val(mid) > 0) == (prev > 0)) lo = mid; else hi = mid;
        }
        ang[found++] = 0.5 * (lo + hi);
      }
      prev = v;
      pw = w;
    }
    while (found < expect) ang[found++] = M_PI * 0.98;
  };
  double t1[8], t2[7];
  roots_of(f1, 16, 8, t1);
  roots_of(f2d, 14, 7, t2);
  for (int i = 0; i < 8; ++i) isf[2 * i] = t1[i] / (2.0 * M_PI);
  for (int i = 0; i < 7; ++i) isf[2 * i + 1] = t2[i] / (2.0 * M_PI);
  double a16 = std::max(-1.0, std::min(1.0, a[16]));
  isf[15] = std::acos(a16) / (4.0 * M_PI);
}

/* ------------------------------------------------ lag laws ------- */
inline void dec_lag_abs(int idx, int* T, int* frac) {
  int t, f;
  if (idx < 376) {
    t = (idx + 137) >> 2;
    f = idx - (t << 2) + 136;
  } else if (idx < 440) {
    t = (idx + 257 - 376) >> 1;
    f = (idx - (t << 1) + 256 - 376) * 2;
  } else {
    t = idx - 280;
    f = 0;
  }
  while (f < 0) { f += 4; t -= 1; }
  *T = t;
  *frac = f;
}

inline int rel_base(int prev_T) {
  // clip [34, 216]: 216 + 15.75 = the 231.75 max addressable lag
  // (base-clip probed round 5 via long-read echoes at T_prev 217/231)
  return std::min(std::max(prev_T - 8, 34), 216);
}

inline void dec_lag_rel(int idx, int base, int* T, int* frac) {
  // delay = base + idx/4; the SHARPENING lag adds the lavc frac bump
  // (pitch_lag_int += frac > 0), handled by the caller.
  *T = base + (idx >> 2);
  *frac = idx & 3;
}

/* ------------------------------------------------ code tracks ---- */
inline void dec_track(int v, int pos[2], double sign[2]) {
  int s = (v >> 8) & 1;
  int b = (v >> 4) & 0xF;
  int a = v & 0xF;
  double s1 = s ? -1.0 : 1.0;
  pos[0] = b;
  sign[0] = s1;
  pos[1] = a;
  sign[1] = (a >= b) ? s1 : -s1;
}

inline int enc_track(int posB, double signB, int posA, double signA) {
  // inverse of dec_track: pulse1 (posB, signB), pulse2 (posA, signA)
  int s = signB < 0 ? 1 : 0;
  (void)signA;
  return (s << 8) | (posB << 4) | posA;
}

/* ------------------------------------------- fractional read -----
 * float32 with lavc's accumulation order (ff_acelp_interpolatef):
 * the integer-truncated excitation memory makes the loop sensitive
 * to rounding, so the replica must use float arithmetic. */
inline float interp_read(const float* exc, int n, int T, int frac) {
  int f, li;
  if (frac == 0) { f = 4; li = T; }
  else { f = frac; li = T + 1; }
  int base = n + 1 - li;
  float acc = 0.0f;
  for (int i = 0; i < 16; ++i) {
    acc += exc[base + i] * (float)wbt::kInterp[i * 4 + f];
    acc += exc[base - i - 1] * (float)wbt::kInterp[(i + 1) * 4 - f];
  }
  return acc;
}

/* ------------------------------------------------ field bundle --- */
struct SubfrParams {
  int lag_idx;
  int ltp;
  int gain_row;
  int track[4];
};
struct FrameParams {
  int isf_idx[7];
  SubfrParams sf[4];
};

inline void parse_frame(const Bits& bits, FrameParams* p) {
  static const int* isfmaps[7] = {wbt::kIsfBits0, wbt::kIsfBits1,
                                  wbt::kIsfBits2, wbt::kIsfBits3,
                                  wbt::kIsfBits4, wbt::kIsfBits5,
                                  wbt::kIsfBits6};
  static const int isfn[7] = {8, 8, 6, 7, 7, 5, 5};
  for (int i = 0; i < 7; ++i) p->isf_idx[i] = bits.get(isfmaps[i], isfn[i]);
  static const int* lagmaps[4] = {wbt::kLagBits0, wbt::kLagBits1,
                                  wbt::kLagBits2, wbt::kLagBits3};
  static const int lagn[4] = {9, 6, 9, 6};
  static const int* ltpmaps[4] = {wbt::kLtpBit0, wbt::kLtpBit1,
                                  wbt::kLtpBit2, wbt::kLtpBit3};
  static const int* gmaps[4] = {wbt::kGainBits0, wbt::kGainBits1,
                                wbt::kGainBits2, wbt::kGainBits3};
  static const int* cmaps[4][4] = {
      {wbt::kCodeBits0_0, wbt::kCodeBits0_1, wbt::kCodeBits0_2,
       wbt::kCodeBits0_3},
      {wbt::kCodeBits1_0, wbt::kCodeBits1_1, wbt::kCodeBits1_2,
       wbt::kCodeBits1_3},
      {wbt::kCodeBits2_0, wbt::kCodeBits2_1, wbt::kCodeBits2_2,
       wbt::kCodeBits2_3},
      {wbt::kCodeBits3_0, wbt::kCodeBits3_1, wbt::kCodeBits3_2,
       wbt::kCodeBits3_3}};
  for (int sf = 0; sf < 4; ++sf) {
    p->sf[sf].lag_idx = bits.get(lagmaps[sf], lagn[sf]);
    p->sf[sf].ltp = bits.get(ltpmaps[sf], 1);
    p->sf[sf].gain_row = bits.get(gmaps[sf], 7);
    for (int t = 0; t < 4; ++t)
      p->sf[sf].track[t] = bits.get(cmaps[sf][t], 9);
  }
}

inline void write_frame(const FrameParams& p, Bits* bits) {
  bits->clear();
  static const int* isfmaps[7] = {wbt::kIsfBits0, wbt::kIsfBits1,
                                  wbt::kIsfBits2, wbt::kIsfBits3,
                                  wbt::kIsfBits4, wbt::kIsfBits5,
                                  wbt::kIsfBits6};
  static const int isfn[7] = {8, 8, 6, 7, 7, 5, 5};
  for (int i = 0; i < 7; ++i) bits->put(isfmaps[i], isfn[i], p.isf_idx[i]);
  static const int* lagmaps[4] = {wbt::kLagBits0, wbt::kLagBits1,
                                  wbt::kLagBits2, wbt::kLagBits3};
  static const int lagn[4] = {9, 6, 9, 6};
  static const int* ltpmaps[4] = {wbt::kLtpBit0, wbt::kLtpBit1,
                                  wbt::kLtpBit2, wbt::kLtpBit3};
  static const int* gmaps[4] = {wbt::kGainBits0, wbt::kGainBits1,
                                wbt::kGainBits2, wbt::kGainBits3};
  static const int* cmaps[4][4] = {
      {wbt::kCodeBits0_0, wbt::kCodeBits0_1, wbt::kCodeBits0_2,
       wbt::kCodeBits0_3},
      {wbt::kCodeBits1_0, wbt::kCodeBits1_1, wbt::kCodeBits1_2,
       wbt::kCodeBits1_3},
      {wbt::kCodeBits2_0, wbt::kCodeBits2_1, wbt::kCodeBits2_2,
       wbt::kCodeBits2_3},
      {wbt::kCodeBits3_0, wbt::kCodeBits3_1, wbt::kCodeBits3_2,
       wbt::kCodeBits3_3}};
  for (int sf = 0; sf < 4; ++sf) {
    bits->put(lagmaps[sf], lagn[sf], p.sf[sf].lag_idx);
    bits->put(ltpmaps[sf], 1, p.sf[sf].ltp);
    bits->put(gmaps[sf], 7, p.sf[sf].gain_row);
    for (int t = 0; t < 4; ++t)
      bits->put(cmaps[sf][t], 9, p.sf[sf].track[t]);
  }
}

/* ================================================== DECODER ====== */
struct Decoder {
  /* float32 state: the lavc decoder runs single precision and the
   * integer truncation of the excitation memory makes the adaptive
   * loop rounding-sensitive, so the replica mirrors the float ops
   * (doubles only where the disassembly shows doubles). */
  float isf_past[16] = {0};             // raw residual MA state
  float isf_past_final[16];             // stab comparison state
  double isp_old[16];
  bool first_frame = true;
  float exc[kHist + kFrame] = {0};      // history + current frame
  float pred_err[4];                    // newest first, dB
  float tilt = 0.0f;
  int prev_lag_int = 64;
  float prev_tr_gain = 0.0f;
  double stab_fac = 0.0;                // NOTE: no upper clip (<=1.25)
  float demph_mem = 0.0f;
  float hpf_x1 = 0, hpf_x2 = 0, hpf_y1 = 0, hpf_y2 = 0;
  float synth_mem[16] = {0};
  float up_hist[32] = {0};              // 12.8k tail for the upsampler

  Decoder() {
    for (int i = 0; i < 4; ++i) pred_err[i] = -14.0f;
    double isf0[16];
    for (int i = 0; i < 16; ++i) {
      isf0[i] = (float)(wbt::kIsfInit[i] * (float)kScale);
      isf_past_final[i] = (float)isf0[i];
    }
    isf_to_isp(isf0, isp_old);
  }

  void decode_isf(const int idx[7], float isf_q[16]) {
    float r[16];
    {
      double rd[16];
      isf_residual(idx, rd);
      for (int i = 0; i < 16; ++i) r[i] = (float)rd[i];
    }
    for (int i = 0; i < 16; ++i) {
      float base = r[i] + (float)wbt::kIsfMean[i];
      double q = (double)base + (1.0 / 3.0) * (double)isf_past[i];
      isf_q[i] = (float)q;
      isf_past[i] = r[i];
    }
    float prev = 0.0f;
    for (int i = 0; i < 15; ++i) {
      isf_q[i] = std::max(isf_q[i], prev + (float)(1.0 / 256.0));
      prev = isf_q[i];
    }
    float d2 = 0.0f;
    for (int i = 0; i < 15; ++i) {
      float d = isf_q[i] - isf_past_final[i];
      d2 += d * d;
    }
    stab_fac = std::max(0.0, 1.25 - (double)d2 * 0.8 * 512.0);
    std::memcpy(isf_past_final, isf_q, sizeof(isf_past_final));
  }

  void gains(int row, double code_energy64, double* gp, double* gc) const {
    *gp = (float)(wbt::kGain7[row][0] * (float)(1.0 / 16384.0));
    float factor = (float)(wbt::kGain7[row][1] * (float)(1.0 / 2048.0));
    float dot = pred_err[3] * 0.2f;   // avpriv order: a[0]*b[0]+..
    dot = 0.2f * pred_err[3] + 0.3f * pred_err[2];
    dot += 0.4f * pred_err[1];
    dot += 0.5f * pred_err[0];
    double v = ((double)(dot + 30.0f)) * 3.3219280948873623 *
               0.05000000000000000277;
    double g = (double)factor * std::exp2(v);
    if (code_energy64 > 0.0) g /= std::sqrt((double)(float)code_energy64);
    *gc = (float)g;
  }
  void push_gain(int row) {
    float factor = (float)(wbt::kGain7[row][1] * (float)(1.0 / 2048.0));
    pred_err[3] = pred_err[2];
    pred_err[2] = pred_err[1];
    pred_err[1] = pred_err[0];
    pred_err[0] = 20.0f * std::log10(factor);
  }

  void build_code(const SubfrParams& s, int lag_int, float code[kSub]) const {
    std::memset(code, 0, kSub * sizeof(float));
    for (int t = 0; t < 4; ++t) {
      int pos[2];
      double sg[2];
      dec_track(s.track[t], pos, sg);
      code[4 * pos[0] + t] += (float)sg[0];
      code[4 * pos[1] + t] += (float)sg[1];
    }
    for (int i = kSub - 1; i > 0; --i) code[i] -= code[i - 1] * tilt;
    if (lag_int < kSub)
      for (int i = lag_int; i < kSub; ++i)
        code[i] += 0.85f * code[i - lag_int];
  }

  /* one subframe given parsed params; writes the 12.8k core
   * (pre-deemphasis) into synth_out and updates all state. */
  void subframe(int sf, const SubfrParams& s, const float a[17],
                float synth_out[kSub]) {
    int lag_int, frac;
    if (sf == 0 || sf == 2) {
      dec_lag_abs(s.lag_idx, &lag_int, &frac);
    } else {
      dec_lag_rel(s.lag_idx, rel_base(prev_lag_int), &lag_int, &frac);
    }
    prev_lag_int = lag_int;
    int t_sharp = lag_int + (frac == 3);  // round at 3/4 (probed)
    int e0 = kHist + sf * kSub;
    float adap[kSub];
    for (int n = 0; n < kSub; ++n) {
      float v = interp_read(exc, e0 + n, lag_int, frac);
      adap[n] = v;
      exc[e0 + n] = v;          // in-place extension, as lavc does
    }
    if (s.ltp == 0) {
      float sm[kSub];
      for (int n = 0; n < kSub; ++n) {
        float p = n > 0 ? adap[n - 1] : 0.0f;
        float q = n < kSub - 1 ? adap[n + 1] : 0.0f;
        sm[n] = 0.18f * p + 0.64f * adap[n] + 0.18f * q;
      }
      std::memcpy(adap, sm, sizeof(sm));
      for (int n = 0; n < kSub; ++n) exc[e0 + n] = adap[n];
    }
    float code[kSub];
    build_code(s, t_sharp, code);
    float ce = 0.0f;
    for (int n = 0; n < kSub; ++n) ce += code[n] * code[n];
    double gp, gc;
    gains(s.gain_row, (double)(ce * (float)(1.0 / 64.0)), &gp, &gc);
    push_gain(s.gain_row);
    float gpf = (float)gp, gcf = (float)gc;
    float dotp = 0.0f;
    for (int n = 0; n < kSub; ++n) dotp += adap[n] * adap[n];
    double ep = (double)dotp * gp * gp;
    double ecd = (double)ce * gc * gc;
    double vf = (ep - ecd) / (ep + ecd + 0.01);
    tilt = (float)(vf * 0.25 + 0.25);
    float vff = (float)vf;
    float gc_enh;
    {
      float g0;
      if (prev_tr_gain > gcf) g0 = std::min(prev_tr_gain, gcf + gcf * 0.19f);
      else g0 = std::max(prev_tr_gain, gcf * 0.84033203f);
      prev_tr_gain = g0;
      float sm = (float)((double)(1.0f - vff) * 0.5 * stab_fac);
      gc_enh = g0 * sm + gcf * (1.0f - sm);
    }
    float cpe = (vff + 1.0f) * 0.125f;
    float code_enh[kSub];
    {
      code_enh[0] = code[0] - cpe * code[1];
      for (int n = 1; n < kSub - 1; ++n)
        code_enh[n] = code[n] - cpe * (code[n - 1] + code[n + 1]);
      code_enh[kSub - 1] = code[kSub - 1] - cpe * code[kSub - 2];
    }
    for (int n = 0; n < kSub; ++n) {
      float m = exc[e0 + n] * gpf + gcf * code[n];
      if (std::fabs(m) < 8388608.0f) m = (float)(int)m;
      exc[e0 + n] = m;
    }
    for (int n = 0; n < kSub; ++n) {
      float syn = gpf * adap[n] + gc_enh * code_enh[n];
      float v = syn;
      for (int k = 1; k <= 16; ++k) {
        float past = (n - k >= 0) ? synth_out[n - k] : synth_mem[16 + n - k];
        v -= a[k] * past;
      }
      synth_out[n] = v;
    }
    std::memcpy(synth_mem, synth_out + kSub - 16, 16 * sizeof(float));
  }

  void frame_lpc(const int isf_idx[7], float a4[4][17]) {
    float isf_q[16];
    decode_isf(isf_idx, isf_q);
    double isp_new[16];
    {
      // lavc: lsp[i] = cos(pi * lsf2[i]) with lsf2 = 2*isf (float
      // doubling, exact), entry 15 doubled once more in float.
      for (int i = 0; i < 15; ++i)
        isp_new[i] = std::cos((double)(isf_q[i] + isf_q[i]) * M_PI);
      float e15 = isf_q[15] + isf_q[15];
      isp_new[15] = std::cos((double)(e15 + e15) * M_PI);
    }
    if (first_frame) {
      std::memcpy(isp_old, isp_new, sizeof(isp_old));
      first_frame = false;
    }
    static const double WO[4] = {0.55, 0.2, 0.04, 0.0};
    static const double WN[4] = {0.45, 0.8, 0.96, 1.0};
    for (int sf = 0; sf < 4; ++sf) {
      double isp_i[16], ad[17];
      for (int i = 0; i < 16; ++i)
        isp_i[i] = WO[sf] * isp_old[i] + WN[sf] * isp_new[i];
      isp_to_a(isp_i, ad);
      for (int i = 0; i < 17; ++i) a4[sf][i] = (float)ad[i];
    }
    std::memcpy(isp_old, isp_new, sizeof(isp_old));
  }

  /* full frame -> 12.8k output (post deemph+HPF), 256 samples */
  void frame(const FrameParams& p, float out12[kFrame]) {
    float a4[4][17];
    frame_lpc(p.isf_idx, a4);
    std::memmove(exc, exc + kFrame, kHist * sizeof(float));
    for (int sf = 0; sf < 4; ++sf)
      subframe(sf, p.sf[sf], a4[sf], out12 + sf * kSub);
    for (int n = 0; n < kFrame; ++n) {
      demph_mem = out12[n] + 0.68f * demph_mem;
      out12[n] = demph_mem;
    }
    // ff_acelp_apply_order_2_transfer_function (direct form II),
    // poles/zeros/gain bit-exact from the lavc image:
    // poles {-1.9788818359375, 0.9791259765625}, zeros {-2, 1},
    // gain 0.989501953125 (31 Hz high-pass at 12.8 kHz).
    for (int n = 0; n < kFrame; ++n) {
      float x = out12[n];
      float tmp = x - (-1.9788818359375f) * hpf_x1 -
                  0.9791259765625f * hpf_x2;
      float v = 0.989501953125f *
                (tmp + (-2.0f) * hpf_x1 + 1.0f * hpf_x2);
      hpf_x2 = hpf_x1;
      hpf_x1 = tmp;
      out12[n] = v;
    }
  }

  /* streaming 5/4 upsample of one frame -> 320 samples at 16 kHz,
   * already divided to the oracle float scale. */
  void upsample(const float in12[kFrame], float out16[320]) {
    float buf[32 + kFrame];
    std::memcpy(buf, up_hist, 32 * sizeof(float));
    std::memcpy(buf + 32, in12, kFrame * sizeof(float));
    for (int m = 0; m < 320; ++m) {
      int base = (4 * m) / 5 + 32;
      int ph = m % 5;
      float v;
      if (ph == 0) {
        v = buf[base - 12];
      } else {
        float acc = 0.0f;
        if (ph == 1) {
          for (int j = 0; j < 23; ++j)
            acc += (float)wbt::kUpFirB[j] * buf[base - 1 - j];
        } else if (ph == 2) {
          for (int j = 0; j < 23; ++j)
            acc += (float)wbt::kUpFirA[j] * buf[base - 1 - j];
        } else if (ph == 3) {
          for (int j = 0; j < 23; ++j)
            acc += (float)wbt::kUpFirA[22 - j] * buf[base - j];
        } else {
          for (int j = 0; j < 23; ++j)
            acc += (float)wbt::kUpFirB[22 - j] * buf[base - j];
        }
        v = acc;
      }
      out16[m] = v * (float)kScale;
    }
    std::memcpy(up_hist, buf + kFrame, 32 * sizeof(float));
  }
};

/* ================================================== ENCODER ====== */
struct Encoder {
  Decoder local;                 // exact replica for state lockstep
  double isf_enc_past[16] = {0}; // quantizer MA state (tracks decoder)
  double t_synth_mem = 0.0;      // pre-emphasis memory of the target

  /* LP analysis on the pre-emphasized 12.8k target */
  void lp_analysis(const double* sp /* kFrame + lookahead, centered */,
                   double a[17]) {
    // asymmetric window over [ -64 .. 256+64 ) around the frame
    constexpr int N = 384;
    double w[N], x[N];
    for (int i = 0; i < N; ++i) {
      w[i] = 0.54 - 0.46 * std::cos(2.0 * M_PI * i / (N - 1));
      x[i] = sp[i - kSub] * w[i];
    }
    double r[17];
    for (int k = 0; k <= 16; ++k) {
      double s = 0.0;
      for (int i = k; i < N; ++i) s += x[i] * x[i - k];
      r[k] = s;
    }
    r[0] *= 1.0001;
    r[0] += 1e-10;
    for (int k = 1; k <= 16; ++k) {
      double f = 2.0 * M_PI * 60.0 * k / 12800.0;   // 60 Hz lag window
      r[k] *= std::exp(-0.5 * f * f);
    }
    double A[17] = {1.0};
    double err = r[0];
    for (int i = 1; i <= 16; ++i) {
      double acc = r[i];
      for (int j = 1; j < i; ++j) acc += A[j] * r[i - j];
      double k = -acc / err;
      double tmp[17];
      std::memcpy(tmp, A, sizeof(tmp));
      for (int j = 1; j < i; ++j) A[j] = tmp[j] + k * tmp[i - j];
      A[i] = k;
      err *= (1.0 - k * k);
      if (err <= 0) err = 1e-9;
    }
    std::memcpy(a, A, 17 * sizeof(double));
  }

  /* split-MSVQ quantization with the decoder's MA semantics */
  void quantize_isf(const double isf_t[16], int idx[7]) {
    double target[16];
    for (int i = 0; i < 16; ++i)
      target[i] = (isf_t[i] - wbt::kIsfMean[i] -
                   (1.0 / 3.0) * isf_enc_past[i]) / kScale;
    auto best = [](const double* t, const int16_t* tab, int rows, int dims,
                   int stride) {
      int bi = 0;
      double bd = 1e30;
      for (int rix = 0; rix < rows; ++rix) {
        const int16_t* row = tab + rix * stride;
        double d = 0.0;
        for (int j = 0; j < dims; ++j) {
          double e = t[j] - row[j];
          d += e * e;
        }
        if (d < bd) { bd = d; bi = rix; }
      }
      return bi;
    };
    idx[0] = best(target, &wbt::k_d1[0][0], 256, 9, 9);
    idx[1] = best(target + 9, &wbt::k_d2[0][0], 256, 7, 7);
    double res[16];
    for (int i = 0; i < 9; ++i) res[i] = target[i] - wbt::k_d1[idx[0]][i];
    for (int i = 0; i < 7; ++i)
      res[9 + i] = target[9 + i] - wbt::k_d2[idx[1]][i];
    idx[2] = best(res, &wbt::k_d21[0][0], 64, 3, 3);
    idx[3] = best(res + 3, &wbt::k_d22[0][0], 128, 3, 3);
    idx[4] = best(res + 6, &wbt::k_d23[0][0], 128, 3, 3);
    idx[5] = best(res + 9, &wbt::k_d24[0][0], 32, 3, 3);
    idx[6] = best(res + 12, &wbt::k_d25[0][0], 32, 4, 4);
    double r[16];
    isf_residual(idx, r);
    for (int i = 0; i < 16; ++i) isf_enc_past[i] = r[i];
  }

  /* impulse response of 1/A truncated to kSub */
  static void imp_response(const double a[17], double h[kSub]) {
    for (int n = 0; n < kSub; ++n) {
      double v = (n == 0) ? 1.0 : 0.0;
      for (int k = 1; k <= 16 && k <= n; ++k) v -= a[k] * h[n - k];
      h[n] = v;
    }
  }

  /* encode one frame of 12.8k PRE-EMPHASIZED target speech t_synth
   * (the decoder synthesis domain), lookahead included for LP. */
  void encode_frame(const double* t_synth /* -64 .. 320 */,
                    FrameParams* p) {
    double a_t[17], isf_t[16];
    lp_analysis(t_synth, a_t);
    a_to_isf(a_t, isf_t);
    quantize_isf(isf_t, p->isf_idx);

    // decoder-side LPC for the frame (exact float replica)
    float a4[4][17];
    local.frame_lpc(p->isf_idx, a4);
    std::memmove(local.exc, local.exc + kFrame, kHist * sizeof(float));
    for (int sf = 0; sf < 4; ++sf) {
      double a[17];
      for (int i = 0; i < 17; ++i) a[i] = a4[sf][i];
      search_subframe(sf, t_synth + sf * kSub, a, &p->sf[sf]);
      float synth[kSub];
      local.subframe(sf, p->sf[sf], a4[sf], synth);
    }
  }

  void search_subframe(int sf, const double* tgt, const double a[17],
                       SubfrParams* s) {
    double h[kSub];
    imp_response(a, h);
    // zero-input response from the local decoder's synth memory
    double zir[kSub];
    for (int n = 0; n < kSub; ++n) {
      double v = 0.0;
      for (int k = 1; k <= 16; ++k) {
        double past = (n - k >= 0) ? zir[n - k] : local.synth_mem[16 + n - k];
        v -= a[k] * past;
      }
      zir[n] = v;
    }
    double x[kSub];          // target for the excitation contribution
    for (int n = 0; n < kSub; ++n) x[n] = tgt[n] - zir[n];
    // backward-filtered target and Toeplitz correlations of h
    double d[kSub];
    for (int n = 0; n < kSub; ++n) {
      double sum = 0.0;
      for (int j = n; j < kSub; ++j) sum += x[j] * h[j - n];
      d[n] = sum;
    }
    double phi[kSub];        // phi[k] = sum h[j] h[j+k]
    for (int k = 0; k < kSub; ++k) {
      double sum = 0.0;
      for (int j = 0; j + k < kSub; ++j) sum += h[j] * h[j + k];
      phi[k] = sum;
    }
    auto filt_dot = [&](const double* u, const double* v) {
      // u' Phi v  via the Toeplitz structure
      double sum = 0.0;
      for (int i = 0; i < kSub; ++i) {
        if (u[i] == 0.0) continue;
        double acc = 0.0;
        for (int j = 0; j < kSub; ++j)
          if (v[j] != 0.0) acc += v[j] * phi[std::abs(i - j)];
        sum += u[i] * acc;
      }
      return sum;
    };

    // ---------------- adaptive search -------------------------
    int e0 = kHist + sf * kSub;
    int best_idx = 0;
    double best_score = -1e30;
    double best_adap[kSub] = {0};
    int best_lag = 64, best_frac = 0;
    auto eval_lag = [&](int idx, int lag_int, int frac) {
      double adap[kSub];
      float saved[kSub];
      std::memcpy(saved, local.exc + e0, sizeof(saved));
      for (int n = 0; n < kSub; ++n) {
        float v = interp_read(local.exc, e0 + n, lag_int, frac);
        adap[n] = v;
        local.exc[e0 + n] = v;
      }
      std::memcpy(local.exc + e0, saved, sizeof(saved));
      // y = h * adap
      double num = 0.0, den = 1e-9;
      double y[kSub];
      for (int n = 0; n < kSub; ++n) {
        double v = 0.0;
        for (int k = 0; k <= n; ++k) v += h[k] * adap[n - k];
        y[n] = v;
        num += x[n] * v;
        den += v * v;
      }
      double sc = num * num / den;
      if (sc > best_score) {
        best_score = sc;
        best_idx = idx;
        best_lag = lag_int;
        best_frac = frac;
        std::memcpy(best_adap, adap, sizeof(best_adap));
      }
    };
    if (sf == 0 || sf == 2) {
      // coarse: exact filtered metric at integer lags (frac 0), then
      // full fractional refinement around the top scorer
      double rbest = -1e30;
      int Tb = 64;
      for (int T = 34; T <= 231; ++T) {
        double y[kSub];
        double num = 0.0, den = 1e-9;
        for (int n = 0; n < kSub; ++n) {
          double v = (n >= T) ? y[n - T] : (double)local.exc[e0 + n - T];
          double acc = 0.0;
          (void)acc;
          y[n] = v;
          num += d[n] * v;
          den += v * v;
        }
        double sc = num * num / den;
        if (sc > rbest) { rbest = sc; Tb = T; }
      }
      for (int T = std::max(34, Tb - 3); T <= std::min(231, Tb + 3); ++T) {
        for (int f = 0; f < 4; ++f) {
          int idx;
          if (T < 128) idx = ((T << 2) + f) - 136;
          else if (T < 160 && (f % 2) == 0) idx = 376 + ((T << 1) + f / 2) - 256;
          else if (f == 0) idx = T + 280;
          else continue;
          if (idx < 0 || idx > 511) continue;
          int ti, fi;
          dec_lag_abs(idx, &ti, &fi);
          eval_lag(idx, ti, fi);
        }
      }
    } else {
      int base = rel_base(local.prev_lag_int);
      for (int idx = 0; idx < 64; ++idx) {
        int ti, fi;
        dec_lag_rel(idx, base, &ti, &fi);
        eval_lag(idx, ti, fi);
      }
    }
    s->lag_idx = best_idx;
    best_lag = best_lag + (best_frac == 3);  // sharpening rounds at 3/4
    s->ltp = 1;   // unfiltered adaptive (searched below)
    // optional LTP filtering: test both and keep the better
    {
      double sm[kSub];
      for (int n = 0; n < kSub; ++n) {
        double pp = n > 0 ? best_adap[n - 1] : 0.0;
        double qq = n < kSub - 1 ? best_adap[n + 1] : 0.0;
        sm[n] = 0.18 * pp + 0.64 * best_adap[n] + 0.18 * qq;
      }
      double n1 = 0, d1 = 1e-9, n2 = 0, d2 = 1e-9;
      double y[kSub];
      for (int n = 0; n < kSub; ++n) {
        double v = 0.0, v2 = 0.0;
        for (int k = 0; k <= n; ++k) {
          v += h[k] * best_adap[n - k];
          v2 += h[k] * sm[n - k];
        }
        n1 += x[n] * v;
        d1 += v * v;
        n2 += x[n] * v2;
        d2 += v2 * v2;
        y[n] = v;
      }
      (void)y;
      if (n2 * n2 / d2 > n1 * n1 / d1) {
        s->ltp = 0;
        std::memcpy(best_adap, sm, sizeof(sm));
      }
    }
    double gp_opt;
    {
      double num = 0, den = 1e-9;
      double y[kSub];
      for (int n = 0; n < kSub; ++n) {
        double v = 0.0;
        for (int k = 0; k <= n; ++k) v += h[k] * best_adap[n - k];
        y[n] = v;
        num += x[n] * v;
        den += v * v;
      }
      gp_opt = std::max(0.0, std::min(1.29, num / den));
      for (int n = 0; n < kSub; ++n) x[n] -= gp_opt * y[n];
      for (int n = 0; n < kSub; ++n) {
        double sum = 0.0;
        for (int j = n; j < kSub; ++j) sum += x[j] * h[j - n];
        d[n] = sum;
      }
    }

    // ---------------- fixed-code search -----------------------
    // decode-side shaping: tilt (current local.tilt) then 0.85
    // sharpening at best_lag. Search per track with the shaped
    // impulse contributions folded into d via superposition.
    double code[kSub] = {0};
    auto shape_pulse = [&](int p128, double sign, double* vec) {
      std::memset(vec, 0, kSub * sizeof(double));
      vec[p128] = sign;
      for (int i = kSub - 1; i > 0; --i) vec[i] -= vec[i - 1] * local.tilt;
      if (best_lag < kSub)
        for (int i = best_lag; i < kSub; ++i) vec[i] += 0.85 * vec[i - best_lag];
    };
    for (int t = 0; t < 4; ++t) {
      int bestv = 0;
      double bsc = -1e30;
      double bvec[kSub] = {0};
      for (int v = 0; v < 512; ++v) {
        int pos[2];
        double sg[2];
        dec_track(v, pos, sg);
        double cv[kSub] = {0};
        cv[4 * pos[0] + t] += sg[0];
        cv[4 * pos[1] + t] += sg[1];
        // shape
        for (int i = kSub - 1; i > 0; --i) cv[i] -= cv[i - 1] * local.tilt;
        if (best_lag < kSub)
          for (int i = best_lag; i < kSub; ++i) cv[i] += 0.85 * cv[i - best_lag];
        double num = 0.0;
        for (int i = 0; i < kSub; ++i)
          if (cv[i] != 0.0) num += cv[i] * d[i];
        double tot[kSub];
        for (int i = 0; i < kSub; ++i) tot[i] = code[i] + cv[i];
        double den = filt_dot(tot, tot) + 1e-9;
        double cnum = 0.0;
        for (int i = 0; i < kSub; ++i)
          if (code[i] != 0.0) cnum += code[i] * d[i];
        double sc = (cnum + num) * (cnum + num) / den;
        if (sc > bsc) {
          bsc = sc;
          bestv = v;
          std::memcpy(bvec, cv, sizeof(bvec));
        }
      }
      s->track[t] = bestv;
      for (int i = 0; i < kSub; ++i) code[i] += bvec[i];
    }
    // second pass: re-optimize each track given the other three
    double shaped[4][kSub];
    for (int t = 0; t < 4; ++t) {
      int pos[2];
      double sg[2];
      dec_track(s->track[t], pos, sg);
      double cv[kSub] = {0};
      cv[4 * pos[0] + t] += sg[0];
      cv[4 * pos[1] + t] += sg[1];
      for (int i = kSub - 1; i > 0; --i) cv[i] -= cv[i - 1] * local.tilt;
      if (best_lag < kSub)
        for (int i = best_lag; i < kSub; ++i) cv[i] += 0.85 * cv[i - best_lag];
      std::memcpy(shaped[t], cv, sizeof(cv));
    }
    for (int pass = 0; pass < 1; ++pass) {
      for (int t = 0; t < 4; ++t) {
        double others[kSub];
        for (int i = 0; i < kSub; ++i)
          others[i] = code[i] - shaped[t][i];
        double onum = 0.0;
        for (int i = 0; i < kSub; ++i)
          if (others[i] != 0.0) onum += others[i] * d[i];
        int bestv = s->track[t];
        double bsc = -1e30;
        double bvec[kSub];
        std::memcpy(bvec, shaped[t], sizeof(bvec));
        for (int v = 0; v < 512; ++v) {
          int pos[2];
          double sg[2];
          dec_track(v, pos, sg);
          double cv[kSub] = {0};
          cv[4 * pos[0] + t] += sg[0];
          cv[4 * pos[1] + t] += sg[1];
          for (int i = kSub - 1; i > 0; --i) cv[i] -= cv[i - 1] * local.tilt;
          if (best_lag < kSub)
            for (int i = best_lag; i < kSub; ++i)
              cv[i] += 0.85 * cv[i - best_lag];
          double num = 0.0;
          for (int i = 0; i < kSub; ++i)
            if (cv[i] != 0.0) num += cv[i] * d[i];
          double tot[kSub];
          for (int i = 0; i < kSub; ++i) tot[i] = others[i] + cv[i];
          double den = filt_dot(tot, tot) + 1e-9;
          double sc = (onum + num) * (onum + num) / den;
          if (sc > bsc) {
            bsc = sc;
            bestv = v;
            std::memcpy(bvec, cv, sizeof(bvec));
          }
        }
        if (bestv != s->track[t]) {
          s->track[t] = bestv;
          for (int i = 0; i < kSub; ++i)
            code[i] = others[i] + bvec[i];
          std::memcpy(shaped[t], bvec, kSub * sizeof(double));
        }
      }
    }

    // ---------------- gain VQ search --------------------------
    double yc[kSub];   // h * code
    for (int n = 0; n < kSub; ++n) {
      double v = 0.0;
      for (int k = 0; k <= n; ++k) v += h[k] * code[n - k];
      yc[n] = v;
    }
    double ya[kSub];   // h * adap
    for (int n = 0; n < kSub; ++n) {
      double v = 0.0;
      for (int k = 0; k <= n; ++k) v += h[k] * best_adap[n - k];
      ya[n] = v;
    }
    // filtered neighbour-sum of the code (for the pitch enhancer)
    double ycnb[kSub];
    {
      double nb[kSub];
      for (int n = 0; n < kSub; ++n) {
        double p = n > 0 ? code[n - 1] : 0.0;
        double q = n < kSub - 1 ? code[n + 1] : 0.0;
        nb[n] = p + q;
      }
      for (int n = 0; n < kSub; ++n) {
        double v = 0.0;
        for (int k = 0; k <= n; ++k) v += h[k] * nb[n - k];
        ycnb[n] = v;
      }
    }
    double ce = 0.0;
    for (int n = 0; n < kSub; ++n) ce += code[n] * code[n];
    double ea = 0.0;
    for (int n = 0; n < kSub; ++n) ea += best_adap[n] * best_adap[n];
    double x0[kSub];
    for (int n = 0; n < kSub; ++n) x0[n] = tgt[n] - zir[n];
    int bestrow = 0;
    double bcost = 1e30;
    for (int row = 0; row < 128; ++row) {
      double gp, gc;
      local.gains(row, ce / 64.0, &gp, &gc);
      if (gp > 1.3) continue;  // keep the adaptive loop contractive:
      // float32-vs-float64 truncation flips are chaotic under gp > 1
      // model the decoder's enhancers exactly for this row
      double ep = gp * gp * ea;
      double ecd = gc * gc * ce;
      double vf = (ep - ecd) / (ep + ecd + 0.01);
      double g0;
      if (local.prev_tr_gain > gc) g0 = std::min((double)local.prev_tr_gain,
                                                 gc * 1.19);
      else g0 = std::max((double)local.prev_tr_gain, gc * 0.84033203);
      double smf = 0.5 * (1.0 - vf) * local.stab_fac;
      double gc_enh = g0 * smf + gc * (1.0 - smf);
      double cpe = 0.125 * (1.0 + vf);
      double cost = 0.0;
      for (int n = 0; n < kSub; ++n) {
        double e = x0[n] - gp * ya[n] - gc_enh * (yc[n] - cpe * ycnb[n]);
        cost += e * e;
      }
      if (cost < bcost) { bcost = cost; bestrow = row; }
    }
    s->gain_row = bestrow;
  }
};

/* ============================================ host conversion ==== */
inline void downsample_16k_to_12k8(const float* in, size_t n,
                                   std::vector<double>* out) {
  size_t m = n * 4 / 5;
  out->assign(m, 0.0);
  for (size_t k = 0; k < m; ++k) {
    double c = 1.25 * (double)k;
    long ip = (long)c;
    double fr = c - ip;
    double acc = 0.0;
    for (int j = -15; j <= 16; ++j) {
      long idx = ip + j;
      if (idx < 0 || idx >= (long)n) continue;
      double tau = j - fr;
      double w = 0.5 * (1.0 + std::cos(M_PI * tau / 16.5));
      double cut = 0.8;
      double s = (std::fabs(tau) < 1e-12) ? cut
                 : std::sin(M_PI * cut * tau) / (M_PI * tau);
      acc += in[idx] * s * w;
    }
    (*out)[k] = acc * 32768.0;   // decoder int-equivalent scale
  }
}

}  // namespace wb

/* ------------------------------------------------- DTX (type 9) --
 * Structural tier mirroring the NB design (native/augment/
 * amrnb_low.cc): the in-image lavc decoder does not implement WB DTX
 * either, so SID conformance is via our own decoder + framing
 * invariants (docs/CODECS.md).  SID payload (40 bits): isf0 index
 * (8) | isf1 index (8) | log-energy (6) | zeros. */
namespace wbdtx {

struct Vad {
  double nf_db = -70.0;
  int hang = 0, burst = 0;
  bool frame(const float* x, int n) {
    double e = 1e-12;
    for (int i = 0; i < n; ++i) e += (double)x[i] * x[i];
    double edb = 10.0 * std::log10(e / n);
    if (edb < nf_db) nf_db = edb;
    else nf_db = std::min(nf_db + 0.1, edb);
    bool raw = edb > nf_db + 9.0 && edb > -80.0;
    if (raw) {
      if (++burst >= 2) hang = 5;
      return true;
    }
    burst = 0;
    if (hang > 0) { --hang; return true; }
    return false;
  }
};

inline void put_bits(uint8_t* payload, int pos, int nbits, int v) {
  for (int i = 0; i < nbits; ++i) {
    int b = (v >> (nbits - 1 - i)) & 1;
    int j = pos + i;
    if (b) payload[j >> 3] |= 0x80 >> (j & 7);
  }
}
inline int get_bits(const uint8_t* payload, int pos, int nbits) {
  int v = 0;
  for (int i = 0; i < nbits; ++i) {
    int j = pos + i;
    v = (v << 1) | ((payload[j >> 3] >> (7 - (j & 7))) & 1);
  }
  return v;
}

}  // namespace wbdtx

/* ======================================================= C API ===== */

extern "C" {

/* Encode 16 kHz float mono to AMR-WB 12.65k storage frames (RFC 4867
 * octet-aligned, 33 bytes/frame incl. the 0x14 TOC). Returns bytes
 * written; size `out` as (n/320 + 3)*33. */
long amrwb_encode(const float* in, size_t n, uint8_t* out) {
  std::vector<double> sp12;
  wb::downsample_16k_to_12k8(in, n, &sp12);
  // pre-emphasize into the decoder synthesis domain (inverse of the
  // decoder's 0.68 de-emphasis; the 31 Hz HPF is ~identity in band)
  std::vector<double> ts(sp12.size() + wb::kSub + 320, 0.0);
  {
    double prev = 0.0;
    for (size_t i = 0; i < sp12.size(); ++i) {
      ts[wb::kSub + i] = sp12[i] - 0.68 * prev;
      prev = sp12[i];
    }
  }
  size_t nframes = sp12.size() / wb::kFrame;
  if (nframes == 0) nframes = 1;
  while (nframes * wb::kFrame < sp12.size()) ++nframes;
  wb::Encoder enc;
  wb::Bits bits;
  long written = 0;
  for (size_t fr = 0; fr < nframes; ++fr) {
    wb::FrameParams p;
    enc.encode_frame(ts.data() + wb::kSub + fr * wb::kFrame, &p);
    wb::write_frame(p, &bits);
    out[written++] = (2 << 3) | 0x04;
    uint8_t* payload = out + written;
    std::memset(payload, 0, wb::kPayload);
    for (int i = 0; i < wb::kBits; ++i)
      if (bits.b[i]) payload[i >> 3] |= 0x80 >> (i & 7);
    written += wb::kPayload;
  }
  return written;
}

/* Decode AMR-WB storage frames (12.65k only) to 16 kHz float mono.
 * Returns samples written or -1 on an unsupported frame type. */
long amrwb_decode(const uint8_t* data, size_t size, float* out,
                  size_t maxn) {
  wb::Decoder dec;
  size_t pos = 0;
  long written = 0;
  while (pos < size) {
    int ft = (data[pos] >> 3) & 0x0F;
    if (ft == 9 || ft == 15) {
      // SID update / NO_DATA: emit comfort noise from the last SID
      static thread_local int cn_isf0 = 0, cn_isf1 = 0;
      static thread_local double cn_rms = 0.0;
      static thread_local uint32_t rng = 0x9e3779b9u;
      if (ft == 9) {
        if (pos + 6 > size) break;
        const uint8_t* p = data + pos + 1;
        cn_isf0 = wbdtx::get_bits(p, 0, 8);
        cn_isf1 = wbdtx::get_bits(p, 8, 8);
        int elog = wbdtx::get_bits(p, 16, 6);
        cn_rms = std::pow(10.0, (elog - 80.0) / 20.0) * 32768.0;
        pos += 6;
      } else {
        pos += 1;
      }
      // synthesize 256 samples of CN through 1/A(sid isf)
      int idx[7] = {cn_isf0, cn_isf1, 0, 0, 0, 0, 0};
      double r[wb::kFrame];
      double isf[16];
      {
        double res[16];
        wb::isf_residual(idx, res);
        for (int i = 0; i < 16; ++i)
          isf[i] = res[i] + wbt::kIsfMean[i];
        double prev = 0.0;
        for (int i = 0; i < 15; ++i) {
          isf[i] = std::max(isf[i], prev + 1.0 / 256.0);
          prev = isf[i];
        }
      }
      double isp[16], a[17];
      wb::isf_to_isp(isf, isp);
      wb::isp_to_a(isp, a);
      static thread_local double cn_mem[16] = {0};
      double e = 0.0;
      for (int n = 0; n < wb::kFrame; ++n) {
        rng = rng * 1664525u + 1013904223u;
        double w = ((int32_t)(rng >> 8) / 8388608.0) - 1.0;
        double v = w;
        for (int k = 1; k <= 16; ++k) {
          double past = (n - k >= 0) ? r[n - k] : cn_mem[16 + n - k];
          v -= a[k] * past;
        }
        r[n] = v;
        e += v * v;
      }
      for (int k = 0; k < 16; ++k) cn_mem[k] = r[wb::kFrame - 16 + k];
      double g = cn_rms / std::sqrt(e / wb::kFrame + 1e-12);
      float out12[wb::kFrame];
      for (int n = 0; n < wb::kFrame; ++n) out12[n] = (float)(r[n] * g);
      float buf[320];
      dec.upsample(out12, buf);
      for (int i = 0; i < 320 && (size_t)written < maxn; ++i)
        out[written++] = buf[i];
      continue;
    }
    if (ft != 2) return -1;
    if (pos + 1 + wb::kPayload > size) break;
    wb::Bits bits;
    bits.clear();
    const uint8_t* payload = data + pos + 1;
    for (int i = 0; i < wb::kBits; ++i)
      bits.b[i] = (payload[i >> 3] >> (7 - (i & 7))) & 1;
    pos += 1 + wb::kPayload;
    wb::FrameParams p;
    wb::parse_frame(bits, &p);
    float out12[wb::kFrame];
    dec.frame(p, out12);
    float buf[320];
    dec.upsample(out12, buf);
    for (int i = 0; i < 320 && (size_t)written < maxn; ++i)
      out[written++] = buf[i];
  }
  return written;
}

/* Encode with VAD-gated DTX: speech frames at 12.65k, silence runs
 * as SID (type 9, every 8th frame) + NO_DATA, mirroring the NB
 * design. Returns bytes written. */
long amrwb_encode_dtx(const float* in, size_t n, uint8_t* out) {
  // encode everything first (keeps the AbS state continuous), then
  // replace gated-silence frames by SID/NO_DATA framing.
  size_t nframes = (n + 319) / 320;
  std::vector<uint8_t> full(nframes * 33 + 66);
  long nb = amrwb_encode(in, n, full.data());
  size_t have = (size_t)std::max(nb, 0L) / 33;
  wbdtx::Vad vad;
  long written = 0;
  int since_sid = 8;
  for (size_t f = 0; f < have; ++f) {
    size_t s0 = f * 320;
    size_t len = std::min((size_t)320, n - std::min(n, s0));
    bool speech = len > 0 && vad.frame(in + s0, (int)len);
    if (speech) {
      std::memcpy(out + written, full.data() + f * 33, 33);
      written += 33;
      since_sid = 8;
    } else if (since_sid >= 8) {
      // SID: quantize the frame's spectrum/energy crudely via the
      // encoder tables: reuse stage-1 ISF search on a flat target.
      double e = 1e-12;
      for (size_t i = 0; i < len; ++i)
        e += (double)in[s0 + i] * in[s0 + i];
      double edb = 10.0 * std::log10(e / std::max(len, (size_t)1));
      int elog = (int)std::lround(edb + 80.0);
      if (elog < 0) elog = 0;
      if (elog > 63) elog = 63;
      out[written] = (9 << 3) | 0x04;
      uint8_t* payload = out + written + 1;
      std::memset(payload, 0, 5);
      wbdtx::put_bits(payload, 0, 8, 0);
      wbdtx::put_bits(payload, 8, 8, 0);
      wbdtx::put_bits(payload, 16, 6, elog);
      written += 6;
      since_sid = 0;
    } else {
      out[written++] = (15 << 3) | 0x04;   // NO_DATA
      ++since_sid;
    }
  }
  return written;
}

/* encode->decode round trip at 16 kHz (the augmentation entry). */
void amrwb_roundtrip(const float* in, float* out, size_t n) {
  size_t nframes = (n * 4 / 5) / wb::kFrame + 3;
  std::vector<uint8_t> bs(nframes * 33);
  long nb = amrwb_encode(in, n, bs.data());
  std::vector<float> dec(nframes * 320 + 640, 0.0f);
  long m = amrwb_decode(bs.data(), (size_t)std::max(nb, 0L), dec.data(),
                        dec.size());
  if (m < 0) m = 0;
  // the decode chain delays by ~15 samples at 16 kHz (upsampler);
  // compensate so the round trip is time-aligned with the input.
  const long lead = 15;
  for (size_t i = 0; i < n; ++i) {
    long j = (long)i + lead;
    out[i] = (j < m) ? dec[j] : 0.0f;
  }
}


/* encode->decode round trip with DTX framing. */
void amrwb_roundtrip_dtx(const float* in, float* out, size_t n) {
  size_t nframes = (n * 4 / 5) / wb::kFrame + 3;
  std::vector<uint8_t> bs(nframes * 33 + 66);
  long nb = amrwb_encode_dtx(in, n, bs.data());
  std::vector<float> dec(nframes * 320 + 640, 0.0f);
  long m = amrwb_decode(bs.data(), (size_t)std::max(nb, 0L), dec.data(),
                        dec.size());
  if (m < 0) m = 0;
  const long lead = 15;
  for (size_t i = 0; i < n; ++i) {
    long j = (long)i + lead;
    out[i] = (j < m) ? dec[j] : 0.0f;
  }
}

/* debug: decode and dump the 256-sample excitation memory after each
 * frame (for lockstep comparison against the lavc context). */
long amrwb_decode_trace(const uint8_t* data, size_t size, float* exc_out,
                        size_t maxn) {
  wb::Decoder dec;
  size_t pos = 0;
  long frames = 0;
  while (pos < size) {
    int ft = (data[pos] >> 3) & 0x0F;
    if (ft != 2) { if (ft == 15) { pos += 1; continue; } return -1; }
    if (pos + 1 + wb::kPayload > size) break;
    wb::Bits bits;
    bits.clear();
    const uint8_t* payload = data + pos + 1;
    for (int i = 0; i < wb::kBits; ++i)
      bits.b[i] = (payload[i >> 3] >> (7 - (i & 7))) & 1;
    pos += 1 + wb::kPayload;
    wb::FrameParams p;
    wb::parse_frame(bits, &p);
    float out12[wb::kFrame];
    dec.frame(p, out12);
    if ((size_t)(frames + 1) * 256 <= maxn)
      std::memcpy(exc_out + frames * 256, dec.exc + wb::kHist,
                  256 * sizeof(float));
    ++frames;
  }
  return frames;
}

} /* extern "C" */
