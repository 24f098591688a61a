/* ITU-T G.729 (8 kbps, CS-ACELP) — fixed-point decoder with BIT-EXACT
 * excitation vs the in-image lavc `g729` decoder, plus an AbS encoder
 * running against an embedded replica for state lockstep.
 *
 * Recovery route (tools/g729_tables/FACTS.md): tables extracted from
 * the libavcodec object files; laws pinned by disassembly of
 * g729dec.o/lsp.o/acelp_*.o and ctypes context introspection
 * (truedec729.py is the validated Python reference — 12-frame random
 * streams match lavc's excitation buffer sample-exactly). The output
 * enhancement (G.729 4.2 long/short-term postfilter + tilt + AGC) is
 * a float structural model (lavc's is fixed-point); the 100 Hz output
 * HPF is exact. Matches the reference's `g729a` common-tier entry
 * (/root/reference/channel_simulation/simulated_channel.py:36-39).
 *
 * Frame: 80 bits / 10 ms: L0(1) L1(7) L2(5) L3(5) | P1(8) P0(1)
 * C1(13) S1(4) GA1(3) GB1(4) | P2(5) C2(13) S2(4) GA2(3) GB2(4).
 */

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include "g729_truth.h"

namespace g729 {

constexpr int kSub = 40;
constexpr int kFrame = 80;
constexpr int kHist = 154;          // PITCH_MAX(143) + interp margin

inline int sat16(int64_t v) {
  return (int)std::min<int64_t>(32767, std::max<int64_t>(-32768, v));
}

inline int log2_q15(int v) {
  int x = v | 1;
  int msb = 31 - __builtin_clz((unsigned)x);
  uint32_t norm = (uint32_t)v << (31 - msb);
  int ind = (norm >> 26) & 0x1F;
  int mant = (norm >> 11) & 0x7FFF;
  return (msb << 15) + g729t::kTabLog2[ind] +
         (((g729t::kTabLog2[ind + 1] - g729t::kTabLog2[ind]) * mant) >> 15);
}

/* ------------------------------------------------ bit fields ----- */
struct Params {
  int L0, L1, L2, L3;
  int P1, P0, C1, S1, GA1, GB1;
  int P2, C2, S2, GA2, GB2;
};

inline int parity_p1(int P1) {
  int x = 1;
  for (int b = 2; b < 8; ++b) x ^= (P1 >> b) & 1;
  return x;
}

inline void unpack(const uint8_t* p, Params* o) {
  uint64_t hi = 0, lo = 0;
  for (int i = 0; i < 8; ++i) hi = (hi << 8) | p[i];
  lo = ((uint64_t)p[8] << 8) | p[9];
  // 80 bits: hi = bits 0..63, lo = bits 64..79
  auto get = [&](int pos, int n) {
    uint64_t v;
    if (pos + n <= 64) v = (hi >> (64 - pos - n)) & ((1ULL << n) - 1);
    else if (pos >= 64) v = (lo >> (80 - pos - n)) & ((1ULL << n) - 1);
    else {
      int n1 = 64 - pos;
      v = ((hi & ((1ULL << n1) - 1)) << (n - n1)) |
          ((lo >> (80 - 64 - (n - n1))) & ((1ULL << (n - n1)) - 1));
    }
    return (int)v;
  };
  int pos = 0;
  auto next = [&](int n) { int v = get(pos, n); pos += n; return v; };
  o->L0 = next(1); o->L1 = next(7); o->L2 = next(5); o->L3 = next(5);
  o->P1 = next(8); o->P0 = next(1); o->C1 = next(13); o->S1 = next(4);
  o->GA1 = next(3); o->GB1 = next(4);
  o->P2 = next(5); o->C2 = next(13); o->S2 = next(4);
  o->GA2 = next(3); o->GB2 = next(4);
}

inline void pack(const Params& f, uint8_t* p) {
  uint8_t buf[10] = {0};
  int pos = 0;
  auto put = [&](int v, int n) {
    for (int i = 0; i < n; ++i) {
      int b = (v >> (n - 1 - i)) & 1;
      if (b) buf[pos >> 3] |= 0x80 >> (pos & 7);
      ++pos;
    }
  };
  put(f.L0, 1); put(f.L1, 7); put(f.L2, 5); put(f.L3, 5);
  put(f.P1, 8); put(f.P0, 1); put(f.C1, 13); put(f.S1, 4);
  put(f.GA1, 3); put(f.GB1, 4);
  put(f.P2, 5); put(f.C2, 13); put(f.S2, 4); put(f.GA2, 3); put(f.GB2, 4);
  std::memcpy(p, buf, 10);
}

/* ================================================== DECODER ====== */
struct Decoder {
  int64_t qpast[4][10];
  int64_t lsp_old[10];
  int64_t exc[kHist + kFrame];
  int64_t quant_energy[4];
  int gain_pitch = 0;     // Q14
  int gain_code = 0;
  int pitch_prev = 20;
  int64_t synth_mem[10];
  // postfilter / hpf state
  double pf_res_hist[10] = {0};
  double pf_res_long[143 + kSub] = {0};
  double pf_syn_hist[10] = {0};
  double pf_tilt_mem = 0.0;
  double pf_agc = 1.0;
  int64_t hpf_f[2] = {0, 0};
  int hpf_x[2] = {0, 0};

  Decoder() {
    static const int16_t init[10] = {2339, 4679, 7018, 9358, 11698,
                                     14037, 16377, 18717, 21056, 23396};
    for (int k = 0; k < 4; ++k)
      for (int i = 0; i < 10; ++i) qpast[k][i] = init[i];
    static const int16_t lspi[10] = {30000, 26000, 21000, 15000, 8000,
                                     0, -8000, -15000, -21000, -26000};
    for (int i = 0; i < 10; ++i) lsp_old[i] = lspi[i];
    std::memset(exc, 0, sizeof(exc));
    for (int i = 0; i < 4; ++i) quant_energy[i] = -14336;
    std::memset(synth_mem, 0, sizeof(synth_mem));
  }

  void lsf_decode(int L0, int L1, int L2, int L3, int64_t lsf[10]) {
    int64_t q[10];
    for (int i = 0; i < 5; ++i)
      q[i] = g729t::kLsp1st[L1][i] + g729t::kLsp2nd[L2][i];
    for (int i = 5; i < 10; ++i)
      q[i] = g729t::kLsp1st[L1][i] + g729t::kLsp2nd[L3][i];
    for (int gap : {10, 5})
      for (int i = 1; i < 10; ++i) {
        int64_t d = q[i - 1] - q[i] + gap;
        if (d > 0) {
          q[i - 1] -= d >> 1;
          q[i] += (d + 1) >> 1;
        }
      }
    for (int i = 0; i < 10; ++i) {
      int64_t acc = (int64_t)g729t::kMaPredictorSum[L0][i] * q[i];
      for (int k = 0; k < 4; ++k)
        acc += (int64_t)g729t::kMaPredictor[L0][k][i] * qpast[k][i];
      lsf[i] = acc >> 15;
    }
    for (int k = 3; k > 0; --k)
      std::memcpy(qpast[k], qpast[k - 1], sizeof(qpast[0]));
    std::memcpy(qpast[0], q, sizeof(q));
    // ff_acelp_reorder_lsf(lsf, 321, 40, 25681, 10)
    std::sort(lsf, lsf + 10);
    int64_t mn = 40;
    for (int i = 0; i < 10; ++i) {
      lsf[i] = std::max(lsf[i], mn);
      mn = lsf[i] + 321;
    }
    lsf[9] = std::min<int64_t>(lsf[9], 25681);
  }

  static void lsf2lsp(const int64_t lsf[10], int64_t lsp[10]) {
    for (int i = 0; i < 10; ++i) {
      int x = (int)((lsf[i] * 20861) >> 15);
      int ind = (x >> 8) & 0xFF, off = x & 0xFF;
      lsp[i] = g729t::kTabCos[ind] +
               ((off * (g729t::kTabCos[ind + 1] - g729t::kTabCos[ind]))
                >> 8);
    }
  }

  static void lsp2lp(const int64_t lsp[10], int64_t lp[11]) {
    auto poly = [](const int64_t* l, int64_t f[6]) {
      f[0] = 1 << 22;
      f[1] = -l[0] << 8;
      for (int i = 2; i < 6; ++i) {
        f[i] = f[i - 2];
        for (int j = i; j > 1; --j)
          f[j] += f[j - 2] - ((l[2 * (i - 1)] * f[j - 1]) >> 14);
        f[1] -= l[2 * (i - 1)] << 8;
      }
    };
    int64_t even[5], odd[5];
    for (int i = 0; i < 5; ++i) { even[i] = lsp[2 * i]; odd[i] = lsp[2 * i + 1]; }
    int64_t le[10], lo[10];
    for (int i = 0; i < 5; ++i) { le[2 * i] = even[i]; lo[2 * i] = odd[i]; }
    int64_t f1[6], f2[6];
    poly(le, f1);
    poly(lo, f2);
    lp[0] = 4096;
    for (int i = 1; i < 6; ++i) {
      int64_t ff1 = f1[i] + f1[i - 1] + (1 << 10);
      int64_t ff2 = f2[i] - f2[i - 1];
      lp[i] = (ff1 + ff2) >> 11;
      lp[11 - i] = (ff1 - ff2) >> 11;
    }
  }

  static int pitch_abs(int P1) {
    // probe-pinned: d3 = P1 + 58 below the integer segment
    return P1 < 197 ? P1 + 58 : 3 * (P1 - 112);
  }

  static int pitch_rel(int P2, int prev_int) {
    int t_min = std::min(std::max(prev_int - 5, 20), 134);
    return 3 * t_min - 2 + P2;
  }

  void adaptive(int d3, int n0) {
    int pitch_int = d3 / 3;
    int frac = (d3 - 3 * pitch_int) * 2;
    int base = kHist + n0;
    for (int n = 0; n < kSub; ++n) {
      int64_t v = 0x4000;
      int idx = 0;
      int p = base + n - pitch_int;
      for (int i = 0; i < 10;) {
        v += exc[p + i] * g729t::kInterpFilter[idx + frac];
        idx += 6;
        ++i;
        v += exc[p - i] * g729t::kInterpFilter[idx - frac];
      }
      exc[base + n] = sat16(v >> 15);
    }
  }

  static void fixed_vector(int C, int S, int64_t fc[kSub]) {
    std::memset(fc, 0, kSub * sizeof(int64_t));
    int idx = C, sgn = S;
    for (int tr = 0; tr < 3; ++tr) {
      int pos = g729t::kFcTracks13[idx & 7] + tr;
      fc[pos] += (sgn & 1) ? 8191 : -8192;
      idx >>= 3;
      sgn >>= 1;
    }
    fc[g729t::kFcTrack4[idx & 0xF]] += (sgn & 1) ? 8191 : -8192;
  }

  void sharpen(int64_t fc[kSub], int pitch_round) const {
    if (pitch_round < kSub) {
      int gp = std::min(std::max(gain_pitch, 3277), 13017);
      for (int i = pitch_round; i < kSub; ++i)
        fc[i] = sat16((0x4000 * fc[i] + (int64_t)gp * fc[i - pitch_round])
                      >> 14);
    }
  }

  void gains(int GA, int GB, const int64_t fc[kSub]) {
    gain_pitch = g729t::kGain1st[GA][0] + g729t::kGain2nd[GB][0];
    int factor = g729t::kGain1st[GA][1] + g729t::kGain2nd[GB][1];
    int64_t ene = (int64_t)1018156 << 10;
    for (int i = 0; i < 4; ++i)
      ene += quant_energy[i] * g729t::kMaPredictionCoeff[i];
    double val = factor *
                 std::exp2((double)ene / 1.6777216e8 * 3.321928094887362);
    int64_t dot = 0;
    for (int i = 0; i < kSub; ++i) dot += fc[i] * fc[i];
    val /= std::sqrt((double)dot);
    gain_code = (int)((int64_t)val >> 12);
    // ff_acelp_update_past_gain (non-erasure)
    quant_energy[3] = quant_energy[2];
    quant_energy[2] = quant_energy[1];
    quant_energy[1] = quant_energy[0];
    uint32_t y = (uint32_t)((log2_q15(factor) >> 2) * 6165);
    uint32_t esi = (uint32_t)(y * 8u - 0x39110000u);
    int q0 = (int)((esi >> 16) & 0xFFFF);
    quant_energy[0] = q0 >= 0x8000 ? q0 - 0x10000 : q0;
  }

  /* ---- float structural postfilter + exact output HPF ---------- */
  void postfilter(int64_t* speech, const int64_t lp[11], int pitch_round) {
    double a[10], an[10], ad[10];
    double gn = 1.0, gd = 1.0;
    for (int i = 0; i < 10; ++i) {
      a[i] = (double)lp[i + 1] / 4096.0;
      gn *= 0.55;
      gd *= 0.7;
      an[i] = a[i] * gn;
      ad[i] = a[i] * gd;
    }
    double res[kSub];
    {
      double x[10 + kSub];
      std::memcpy(x, pf_res_hist, sizeof(pf_res_hist));
      for (int n = 0; n < kSub; ++n) x[10 + n] = (double)speech[n];
      for (int n = 0; n < kSub; ++n) {
        double v = x[10 + n];
        for (int k = 0; k < 10; ++k) v += an[k] * x[10 + n - 1 - k];
        res[n] = v;
      }
      std::memcpy(pf_res_hist, x + kSub, sizeof(pf_res_hist));
    }
    // long-term 3-candidate search
    double rh[143 + 2 * kSub];
    std::memcpy(rh, pf_res_long, sizeof(pf_res_long));
    std::memcpy(rh + 143 + kSub, res, sizeof(res));
    int off = 143 + kSub;
    double bs = -1.0, best_g = 0.0;
    int best_T = pitch_round;
    for (int t = std::max(pitch_round - 1, 20);
         t < std::min(pitch_round + 2, 144); ++t) {
      double num = 0, den = 0;
      for (int n = 0; n < kSub; ++n) {
        num += res[n] * rh[off - t + n];
        den += rh[off - t + n] * rh[off - t + n];
      }
      double sc = den > 0 ? num * num / den : -1;
      if (sc > bs) {
        bs = sc;
        best_T = t;
        best_g = den > 0 ? num / den : 0.0;
      }
    }
    double gl = std::min(std::max(best_g, 0.0), 1.0);
    double resf[kSub];
    for (int n = 0; n < kSub; ++n)
      resf[n] = (res[n] + 0.5 * gl * rh[off - best_T + n]) / (1 + 0.5 * gl);
    std::memmove(pf_res_long, rh + kSub, sizeof(pf_res_long));
    // short-term 1/A(z/0.7)
    double y[kSub];
    {
      double buf[10 + kSub];
      std::memcpy(buf, pf_syn_hist, sizeof(pf_syn_hist));
      for (int n = 0; n < kSub; ++n) {
        double v = resf[n];
        for (int k = 0; k < 10; ++k) v -= ad[k] * buf[10 + n - 1 - k];
        buf[10 + n] = v;
        y[n] = v;
      }
      std::memcpy(pf_syn_hist, buf + kSub, sizeof(pf_syn_hist));
    }
    // tilt
    double num = 0, den = 0;
    for (int n = 1; n < kSub; ++n) num += y[n] * y[n - 1];
    for (int n = 0; n < kSub; ++n) den += y[n] * y[n];
    double k1 = den > 1e-9 ? num / den : 0.0;
    double mu = 0.2 * std::max(k1, 0.0);
    double yt[kSub];
    double prev = pf_tilt_mem;
    for (int n = 0; n < kSub; ++n) {
      yt[n] = y[n] - mu * prev;
      prev = y[n];
    }
    pf_tilt_mem = y[kSub - 1];
    // AGC
    double ein = 0, eout = 0;
    for (int n = 0; n < kSub; ++n) {
      ein += (double)speech[n] * (double)speech[n];
      eout += yt[n] * yt[n];
    }
    double g_tgt = eout > 0 ? std::sqrt(ein / eout) : 1.0;
    double g = pf_agc;
    for (int n = 0; n < kSub; ++n) {
      g = 0.9875 * g + 0.0125 * g_tgt;
      speech[n] = sat16((int64_t)std::llround(yt[n] * g));
    }
    pf_agc = g;
  }

  void hpf(int64_t* x, int n) {
    for (int i = 0; i < n; ++i) {
      int d = (int)x[i] - 2 * hpf_x[0] + hpf_x[1];
      int64_t tmp = (int64_t)7699 * d;
      tmp += (hpf_f[0] * 15836) >> 13;
      tmp += (hpf_f[1] * -7667) >> 13;
      hpf_x[1] = hpf_x[0];
      hpf_x[0] = (int)x[i];
      x[i] = sat16((tmp + 0x800) >> 12);
      hpf_f[1] = hpf_f[0];
      hpf_f[0] = tmp;
    }
  }

  /* decode one frame into out[80] (int16-range values) */
  void frame(const Params& f, int64_t out[kFrame], bool enhance = true) {
    int64_t lsf[10], lsp[10];
    lsf_decode(f.L0, f.L1, f.L2, f.L3, lsf);
    lsf2lsp(lsf, lsp);
    int64_t lsp1[10];
    for (int i = 0; i < 10; ++i) lsp1[i] = (lsp_old[i] + lsp[i]) >> 1;
    int64_t lp2[2][11];
    lsp2lp(lsp1, lp2[0]);
    lsp2lp(lsp, lp2[1]);
    std::memcpy(lsp_old, lsp, sizeof(lsp_old));
    std::memmove(exc, exc + kFrame, kHist * sizeof(int64_t));
    for (int sf = 0; sf < 2; ++sf) {
      int d3 = sf == 0 ? pitch_abs(f.P1) : pitch_rel(f.P2, pitch_prev);
      adaptive(d3, sf * kSub);
      pitch_prev = (d3 + 1) / 3;
      int pitch_round = (d3 + 1) / 3;
      int64_t fc[kSub];
      fixed_vector(sf == 0 ? f.C1 : f.C2, sf == 0 ? f.S1 : f.S2, fc);
      sharpen(fc, pitch_round);
      gains(sf == 0 ? f.GA1 : f.GA2, sf == 0 ? f.GB1 : f.GB2, fc);
      int e0 = kHist + sf * kSub;
      for (int n = 0; n < kSub; ++n)
        exc[e0 + n] = sat16((gain_pitch * exc[e0 + n] +
                             (int64_t)gain_code * fc[n] + 0x2000) >> 14);
      const int64_t* a = lp2[sf];
      int64_t* o = out + sf * kSub;
      for (int n = 0; n < kSub; ++n) {
        int64_t v = exc[e0 + n] << 12;
        for (int k = 1; k <= 10; ++k) {
          int64_t past = (n - k >= 0) ? o[n - k] : synth_mem[10 + n - k];
          v -= a[k] * past;
        }
        o[n] = sat16((v + 0x800) >> 12);
      }
      std::memcpy(synth_mem, o + kSub - 10, 10 * sizeof(int64_t));
      if (enhance) {
        postfilter(o, lp2[sf], pitch_round);
        hpf(o, kSub);
      }
    }
  }
};

/* ================================================== ENCODER ====== */
struct Encoder {
  double* dbg_snr = nullptr;   // [total_snr_sum, count, pitch_snr_sum]
  Decoder local;                 // bit-exact replica (no postfilter)
  int64_t qpast_enc[4][10];      // mirror of the quantizer MA ring

  Encoder() {
    std::memcpy(qpast_enc, local.qpast, sizeof(qpast_enc));
  }

  /* LP analysis over a 240-sample asymmetric-ish window ending at the
   * frame (we use a Hamming window + 60 Hz lag window like the WB
   * encoder; the quantizer is what locks decoder parity). */
  static void lp_analysis(const double* sp /* centered on the frame */,
                          double a[11]) {
    constexpr int N = 240;
    double x[N];
    for (int i = 0; i < N; ++i) {
      double w = 0.54 - 0.46 * std::cos(2.0 * M_PI * i / (N - 1));
      x[i] = sp[i - 120] * w;
    }
    double r[11];
    for (int k = 0; k <= 10; ++k) {
      double s = 0.0;
      for (int i = k; i < N; ++i) s += x[i] * x[i - k];
      r[k] = s;
    }
    r[0] *= 1.0001;
    r[0] += 1e-10;
    for (int k = 1; k <= 10; ++k) {
      double f = 2.0 * M_PI * 60.0 * k / 8000.0;
      r[k] *= std::exp(-0.5 * f * f);
    }
    double A[11] = {1.0};
    double err = r[0];
    for (int i = 1; i <= 10; ++i) {
      double acc = r[i];
      for (int j = 1; j < i; ++j) acc += A[j] * r[i - j];
      double k = -acc / err;
      double tmp[11];
      std::memcpy(tmp, A, sizeof(tmp));
      for (int j = 1; j < i; ++j) A[j] = tmp[j] + k * tmp[i - j];
      A[i] = k;
      err *= (1.0 - k * k);
      if (err <= 0) err = 1e-9;
    }
    std::memcpy(a, A, sizeof(A));
  }

  /* A(z) -> lsf in the decoder's Q13-angle domain via Chebyshev root
   * finding on F1/F2. */
  static void a_to_lsf(const double a[11], double lsf[10]) {
    // P(z) = A(z) + z^-11 A(z^-1), Q(z) = A(z) - z^-11 A(z^-1)
    // deflated by (1 +- z^-1): ITU recurrences with a[11] = 0
    double p1[6], p2[6];
    p1[0] = a[0];
    p2[0] = a[0];
    for (int i = 1; i <= 5; ++i) {
      double am = (11 - i <= 10) ? a[11 - i] : 0.0;
      p1[i] = a[i] + am - p1[i - 1];
      p2[i] = a[i] - am + p2[i - 1];
    }
    auto roots_of = [](const double* p, double* ang) {
      // symmetric degree-10 polynomial (p[0..5] is the half):
      // val(w) = p[5] + sum_{i<5} 2 p[i] cos((5-i) w)
      auto val = [&](double w) {
        double s = p[5];
        for (int i = 0; i < 5; ++i) s += 2.0 * p[i] * std::cos((5 - i) * w);
        return s;
      };
      int found = 0;
      double prev = val(0.0), pw = 0.0;
      for (int gix = 1; gix <= 2048 && found < 5; ++gix) {
        double w = M_PI * gix / 2048.0;
        double v = val(w);
        if (v == 0.0 || (v > 0) != (prev > 0)) {
          double lo = pw, hi = w;
          for (int it = 0; it < 40; ++it) {
            double mid = 0.5 * (lo + hi);
            if ((val(mid) > 0) == (prev > 0)) lo = mid;
            else hi = mid;
          }
          ang[found++] = 0.5 * (lo + hi);
        }
        prev = v;
        pw = w;
      }
      while (found < 5) ang[found++] = M_PI * 0.95;
    };
    double t1[5], t2[5];
    roots_of(p1, t1);
    roots_of(p2, t2);
    // interleave even/odd; convert rad -> Q13 angle (pi = 25736)
    for (int i = 0; i < 5; ++i) {
      lsf[2 * i] = t1[i] * 25736.0 / M_PI;
      lsf[2 * i + 1] = t2[i] * 25736.0 / M_PI;
    }
    std::sort(lsf, lsf + 10);
  }

  /* quantize lsf with the decoder's exact MA semantics */
  void quantize_lsf(const double lsf_t[10], Params* f) {
    double best_err = 1e30;
    for (int L0 = 0; L0 < 2; ++L0) {
      // target quantizer output: q such that decoded lsf ~ lsf_t
      double tgt[10];
      for (int i = 0; i < 10; ++i) {
        double pred = 0;
        for (int k = 0; k < 4; ++k)
          pred += (double)g729t::kMaPredictor[L0][k][i] * qpast_enc[k][i];
        tgt[i] = (lsf_t[i] * 32768.0 - pred) /
                 (double)g729t::kMaPredictorSum[L0][i];
      }
      // stage 1
      int bL1 = 0;
      double bd = 1e30;
      for (int r = 0; r < 128; ++r) {
        double d = 0;
        for (int i = 0; i < 10; ++i) {
          double e = tgt[i] - g729t::kLsp1st[r][i];
          d += e * e;
        }
        if (d < bd) { bd = d; bL1 = r; }
      }
      // stage 2 halves
      int bL2 = 0, bL3 = 0;
      bd = 1e30;
      for (int r = 0; r < 32; ++r) {
        double d = 0;
        for (int i = 0; i < 5; ++i) {
          double e = tgt[i] - g729t::kLsp1st[bL1][i] -
                     g729t::kLsp2nd[r][i];
          d += e * e;
        }
        if (d < bd) { bd = d; bL2 = r; }
      }
      bd = 1e30;
      for (int r = 0; r < 32; ++r) {
        double d = 0;
        for (int i = 5; i < 10; ++i) {
          double e = tgt[i] - g729t::kLsp1st[bL1][i] -
                     g729t::kLsp2nd[r][i];
          d += e * e;
        }
        if (d < bd) { bd = d; bL3 = r; }
      }
      // evaluate the DECODED lsf for this candidate (exact replica,
      // without committing state)
      Decoder probe;
      std::memcpy(probe.qpast, qpast_enc, sizeof(qpast_enc));
      int64_t lsf_dec[10];
      probe.lsf_decode(L0, bL1, bL2, bL3, lsf_dec);
      double err = 0;
      for (int i = 0; i < 10; ++i) {
        double e = lsf_dec[i] - lsf_t[i];
        err += e * e;
      }
      if (err < best_err) {
        best_err = err;
        f->L0 = L0;
        f->L1 = bL1;
        f->L2 = bL2;
        f->L3 = bL3;
      }
    }
  }

  static void imp_response(const int64_t lp[11], double h[kSub]) {
    for (int n = 0; n < kSub; ++n) {
      double v = (n == 0) ? 1.0 : 0.0;
      for (int k = 1; k <= 10 && k <= n; ++k)
        v -= (double)lp[k] / 4096.0 * h[n - k];
      h[n] = v;
    }
  }

  void search_subframe(int sf, const double* tgt, const int64_t lp[11],
                       Params* f) {
    double h[kSub];
    imp_response(lp, h);
    double zir[kSub];
    for (int n = 0; n < kSub; ++n) {
      double v = 0.0;
      for (int k = 1; k <= 10; ++k) {
        double past = (n - k >= 0) ? zir[n - k]
                                   : (double)local.synth_mem[10 + n - k];
        v -= (double)lp[k] / 4096.0 * past;
      }
      zir[n] = v;
    }
    double x[kSub];
    for (int n = 0; n < kSub; ++n) x[n] = tgt[n] - zir[n];

    // ---------------- pitch search ----------------
    int e0 = kHist + sf * kSub;
    int best_idx = 0, best_d3 = 60;
    double best_score = -1e30;
    auto eval_d3 = [&](int idx, int d3) {
      int pitch_int = d3 / 3;
      int frac = (d3 - 3 * pitch_int) * 2;
      double adap[kSub];
      // interpolated adaptive with in-place extension semantics
      int64_t saved[kSub];
      std::memcpy(saved, local.exc + e0, sizeof(saved));
      for (int n = 0; n < kSub; ++n) {
        int64_t v = 0x4000;
        int fidx = 0;
        int p = e0 + n - pitch_int;
        for (int i = 0; i < 10;) {
          v += local.exc[p + i] * g729t::kInterpFilter[fidx + frac];
          fidx += 6;
          ++i;
          v += local.exc[p - i] * g729t::kInterpFilter[fidx - frac];
        }
        local.exc[e0 + n] = sat16(v >> 15);
        adap[n] = (double)local.exc[e0 + n];
      }
      std::memcpy(local.exc + e0, saved, sizeof(saved));
      double num = 0, den = 1e-9;
      double y = 0;
      double yv[kSub];
      for (int n = 0; n < kSub; ++n) {
        y = 0;
        for (int k = 0; k <= n; ++k) y += h[k] * adap[n - k];
        yv[n] = y;
        num += x[n] * y;
        den += y * y;
      }
      // gp >= 0 in the codebook: require POSITIVE correlation
      double sc = num * std::fabs(num) / den;
      if (sc > best_score) {
        best_score = sc;
        best_idx = idx;
        best_d3 = d3;
      }
      (void)yv;
    };
    if (sf == 0) {
      // coarse integer scan on the FILTERED metric via the
      // backward-filtered target (exact at integer lags)
      double dbk[kSub];
      for (int n = 0; n < kSub; ++n) {
        double s = 0;
        for (int j = n; j < kSub; ++j) s += x[j] * h[j - n];
        dbk[n] = s;
      }
      double phi0[kSub];
      for (int k = 0; k < kSub; ++k) {
        double s = 0;
        for (int j = 0; j + k < kSub; ++j) s += h[j] * h[j + k];
        phi0[k] = s;
      }
      double rbest = -1e30;
      int Tb = 60;
      for (int T = 20; T <= 143; ++T) {
        double num = 0, den = 1e-9;
        double v[kSub];
        for (int n = 0; n < kSub; ++n) {
          v[n] = (n >= T) ? v[n - T] : (double)local.exc[e0 + n - T];
          num += dbk[n] * v[n];
        }
        for (int i = 0; i < kSub; ++i) {
          if (v[i] == 0.0) continue;
          double acc = 0;
          for (int j = 0; j < kSub; ++j)
            if (v[j] != 0.0) acc += v[j] * phi0[std::abs(i - j)];
          den += v[i] * acc;
        }
        double sc = num * num / den;
        if (sc > rbest) { rbest = sc; Tb = T; }
      }
      for (int P1 = 0; P1 < 256; ++P1) {
        int d3 = Decoder::pitch_abs(P1);
        if (std::abs(d3 / 3 - Tb) > 6) continue;
        eval_d3(P1, d3);
      }
      f->P1 = best_idx;
      f->P0 = parity_p1(best_idx);
    } else {
      for (int P2 = 0; P2 < 32; ++P2) {
        int d3 = Decoder::pitch_rel(P2, local.pitch_prev);
        if ((d3 + 1) / 3 > 143) continue;  // lavc rejects int 144
        eval_d3(P2, d3);
      }
      f->P2 = best_idx;
    }
    // commit the adaptive into the replica exc (decoder order)
    local.adaptive(best_d3, sf * kSub);
    int pitch_round = (best_d3 + 1) / 3;
    double adap[kSub];
    for (int n = 0; n < kSub; ++n) adap[n] = (double)local.exc[e0 + n];

    // optimal gp for target update
    double ya[kSub];
    for (int n = 0; n < kSub; ++n) {
      double v = 0;
      for (int k = 0; k <= n; ++k) v += h[k] * adap[n - k];
      ya[n] = v;
    }
    double num = 0, den = 1e-9;
    for (int n = 0; n < kSub; ++n) {
      num += x[n] * ya[n];
      den += ya[n] * ya[n];
    }
    double gp_opt = std::max(0.0, std::min(1.2, num / den));
    double x2[kSub], d[kSub];
    for (int n = 0; n < kSub; ++n) x2[n] = x[n] - gp_opt * ya[n];
    for (int n = 0; n < kSub; ++n) {
      double s = 0;
      for (int j = n; j < kSub; ++j) s += x2[j] * h[j - n];
      d[n] = s;
    }

    // ---------------- fixed codebook search ----------------
    // shaped basis: sharpening at pitch_round with the replica's
    // CLIPPED previous gain_pitch (decoder law)
    int gp_sh = std::min(std::max(local.gain_pitch, 3277), 13017);
    auto shape = [&](const int64_t* fc, double* out) {
      for (int n = 0; n < kSub; ++n) out[n] = (double)fc[n];
      if (pitch_round < kSub)
        for (int n = pitch_round; n < kSub; ++n)
          out[n] += (double)gp_sh / 16384.0 * out[n - pitch_round];
    };
    // greedy per-track + refinement passes on PRECOMPUTED filtered
    // shaped-pulse bases: yb[p] = h * S(e_p) (S = pitch sharpening),
    // so each candidate evaluation is O(subframe) instead of a fresh
    // convolution per candidate
    int bestC = 0, bestS = 0;
    {
      static thread_local double yb[kSub][kSub];
      for (int p = 0; p < kSub; ++p) {
        double sv[kSub] = {0};
        sv[p] = 1.0;
        if (pitch_round < kSub)
          for (int n = std::max(pitch_round, p); n < kSub; ++n)
            sv[n] += (double)gp_sh / 16384.0 * sv[n - pitch_round];
        for (int n = 0; n < kSub; ++n) {
          double y = 0;
          for (int k = 0; k <= n; ++k)
            if (sv[n - k] != 0.0) y += h[k] * sv[n - k];
          yb[p][n] = y;
        }
      }
      auto tpos = [&](int tr, int pi) {
        return tr < 3 ? g729t::kFcTracks13[pi] + tr
                      : g729t::kFcTrack4[pi];
      };
      int pos_idx[4] = {0, 0, 0, 0};
      int sgn[4] = {1, 1, 1, 1};
      double ycur[4][kSub];
      double ytot[kSub] = {0};
      for (int tr = 0; tr < 4; ++tr) {
        double amp = sgn[tr] ? 8191.0 : -8192.0;
        for (int n = 0; n < kSub; ++n) {
          ycur[tr][n] = amp * yb[tpos(tr, pos_idx[tr])][n];
          ytot[n] += ycur[tr][n];
        }
      }
      for (int pass = 0; pass < 3; ++pass) {
        for (int tr = 0; tr < 4; ++tr) {
          int npos = tr < 3 ? 8 : 16;
          double tb = -1e30;
          int bp = pos_idx[tr], bsg = sgn[tr];
          double yoth[kSub];
          for (int n = 0; n < kSub; ++n) yoth[n] = ytot[n] - ycur[tr][n];
          for (int pi = 0; pi < npos; ++pi) {
            const double* b = yb[tpos(tr, pi)];
            for (int sg = 0; sg < 2; ++sg) {
              double amp = sg ? 8191.0 : -8192.0;
              double nume = 0, dene = 1e-9;
              for (int n = 0; n < kSub; ++n) {
                double y = yoth[n] + amp * b[n];
                nume += x2[n] * y;
                dene += y * y;
              }
              // gc >= 0: positive-correlation score (regression:
              // the NB encoder's silent-attractor bug class)
              double sc = nume * std::fabs(nume) / dene;
              if (sc > tb) { tb = sc; bp = pi; bsg = sg; }
            }
          }
          pos_idx[tr] = bp;
          sgn[tr] = bsg;
          double amp = bsg ? 8191.0 : -8192.0;
          for (int n = 0; n < kSub; ++n) {
            ycur[tr][n] = amp * yb[tpos(tr, bp)][n];
            ytot[n] = yoth[n] + ycur[tr][n];
          }
        }
      }
      bestC = pos_idx[0] | (pos_idx[1] << 3) | (pos_idx[2] << 6) |
              (pos_idx[3] << 9);
      bestS = (sgn[0] & 1) | ((sgn[1] & 1) << 1) | ((sgn[2] & 1) << 2) |
              ((sgn[3] & 1) << 3);
    }
    if (sf == 0) { f->C1 = bestC; f->S1 = bestS; }
    else { f->C2 = bestC; f->S2 = bestS; }

    // ---------------- gain search (exact decoded pairs) ----------
    int64_t fc[kSub];
    Decoder::fixed_vector(bestC, bestS, fc);
    local.sharpen(fc, pitch_round);   // uses replica's prev gain state
    double yc[kSub];
    for (int n = 0; n < kSub; ++n) {
      double v = 0;
      for (int k = 0; k <= n; ++k) v += h[k] * (double)fc[n - k];
      yc[n] = v;
    }
    int64_t dotfc = 0;
    for (int n = 0; n < kSub; ++n) dotfc += fc[n] * fc[n];
    int64_t ene = (int64_t)1018156 << 10;
    for (int i = 0; i < 4; ++i)
      ene += local.quant_energy[i] * g729t::kMaPredictionCoeff[i];
    double base_val =
        std::exp2((double)ene / 1.6777216e8 * 3.321928094887362) /
        std::sqrt((double)dotfc);
    int bGA = 0, bGB = 0;
    double bcost = 1e30;
    for (int GA = 0; GA < 8; ++GA)
      for (int GB = 0; GB < 16; ++GB) {
        double gp = (double)(g729t::kGain1st[GA][0] +
                             g729t::kGain2nd[GB][0]) / 16384.0;
        if (gp > 1.5) continue;
        int factor = g729t::kGain1st[GA][1] + g729t::kGain2nd[GB][1];
        int gc = (int)((int64_t)(factor * base_val) >> 12);
        // decoder: exc = (gp_q14*adap + gc*fc + 0x2000) >> 14
        double gcf = (double)gc / 16384.0;
        double cost = 0;
        for (int n = 0; n < kSub; ++n) {
          double e = x[n] - gp * ya[n] - gcf * yc[n];
          cost += e * e;
        }
        if (cost < bcost) { bcost = cost; bGA = GA; bGB = GB; }
      }
    if (sf == 0) { f->GA1 = bGA; f->GB1 = bGB; }
    else { f->GA2 = bGA; f->GB2 = bGB; }
    if (dbg_snr) {
      double ex = 1e-9, er = 1e-9;
      double gp = (double)(g729t::kGain1st[bGA][0] +
                           g729t::kGain2nd[bGB][0]) / 16384.0;
      int factor = g729t::kGain1st[bGA][1] + g729t::kGain2nd[bGB][1];
      double gcf = (double)((int)((int64_t)(factor * base_val) >> 12)) /
                   16384.0;
      for (int n = 0; n < kSub; ++n) {
        double e = x[n] - gp * ya[n] - gcf * yc[n];
        ex += x[n] * x[n];
        er += e * e;
      }
      dbg_snr[0] += 10.0 * std::log10(ex / er);
      dbg_snr[1] += 1.0;
      // pitch-only SNR
      double er2 = 1e-9;
      for (int n = 0; n < kSub; ++n) {
        double e = x[n] - gp_opt * ya[n];
        er2 += e * e;
      }
      dbg_snr[2] += 10.0 * std::log10(ex / er2);
      // unquantized joint-gain bound on the SAME (adap, fc)
      double raa = 1e-9, rcc = 1e-9, rac = 0, rxa = 0, rxc = 0;
      for (int n = 0; n < kSub; ++n) {
        raa += ya[n] * ya[n];
        rcc += yc[n] * yc[n];
        rac += ya[n] * yc[n];
        rxa += x[n] * ya[n];
        rxc += x[n] * yc[n];
      }
      double det = raa * rcc - rac * rac;
      if (std::fabs(det) > 1e-6) {
        double gpo = (rxa * rcc - rxc * rac) / det;
        double gco = (rxc * raa - rxa * rac) / det;
        double er3 = 1e-9;
        for (int n = 0; n < kSub; ++n) {
          double e = x[n] - gpo * ya[n] - gco * yc[n];
          er3 += e * e;
        }
        dbg_snr[3] += 10.0 * std::log10(ex / er3);
        // per-subframe trace rows at dbg_snr[8 + 4*k]
        int k = (int)dbg_snr[4];
        if (k < 64) {
          double* row = dbg_snr + 8 + 4 * k;
          row[0] = gpo;
          row[1] = gco * 16384.0;
          int fmin = 10000000, fmax = -10000000;
          for (int GA = 0; GA < 8; ++GA)
            for (int GB = 0; GB < 16; ++GB) {
              int fac = g729t::kGain1st[GA][1] + g729t::kGain2nd[GB][1];
              fmin = std::min(fmin, fac);
              fmax = std::max(fmax, fac);
            }
          row[2] = (double)((int64_t)(fmin * base_val) >> 12);
          row[3] = (double)((int64_t)(fmax * base_val) >> 12);
          dbg_snr[4] += 1.0;
        }
      }
    }
    // commit replica state: gains + exc build (decoder-exact)
    local.pitch_prev = pitch_round;
    local.gains(bGA, bGB, fc);
    for (int n = 0; n < kSub; ++n)
      local.exc[e0 + n] =
          sat16((local.gain_pitch * local.exc[e0 + n] +
                 (int64_t)local.gain_code * fc[n] + 0x2000) >> 14);
    // replica synthesis memory for the next ZIR
    const int64_t* a = lp;
    int64_t o[kSub];
    for (int n = 0; n < kSub; ++n) {
      int64_t v = local.exc[e0 + n] << 12;
      for (int k = 1; k <= 10; ++k) {
        int64_t past = (n - k >= 0) ? o[n - k] : local.synth_mem[10 + n - k];
        v -= a[k] * past;
      }
      o[n] = sat16((v + 0x800) >> 12);
    }
    std::memcpy(local.synth_mem, o + kSub - 10, 10 * sizeof(int64_t));
  }

  void encode_frame(const double* sp /* -120 .. +120 around frame */,
                    Params* f) {
    double a_t[11], lsf_t[10];
    lp_analysis(sp + 120, a_t);
    a_to_lsf(a_t, lsf_t);
    quantize_lsf(lsf_t, f);
    // decoder-side LP replica for this frame
    int64_t lsf_dec[10], lsp[10], lsp1[10], lp2[2][11];
    {
      Decoder probe;
      std::memcpy(probe.qpast, qpast_enc, sizeof(qpast_enc));
      probe.lsf_decode(f->L0, f->L1, f->L2, f->L3, lsf_dec);
      std::memcpy(qpast_enc, probe.qpast, sizeof(qpast_enc));
    }
    // run the real replica's lsf path to keep its state in lockstep
    local.lsf_decode(f->L0, f->L1, f->L2, f->L3, lsf_dec);
    Decoder::lsf2lsp(lsf_dec, lsp);
    for (int i = 0; i < 10; ++i) lsp1[i] = (local.lsp_old[i] + lsp[i]) >> 1;
    Decoder::lsp2lp(lsp1, lp2[0]);
    Decoder::lsp2lp(lsp, lp2[1]);
    std::memcpy(local.lsp_old, lsp, sizeof(local.lsp_old));
    std::memmove(local.exc, local.exc + kFrame,
                 kHist * sizeof(int64_t));
    for (int sf = 0; sf < 2; ++sf)
      search_subframe(sf, sp + 120 + sf * kSub, lp2[sf], f);
  }
};

}  // namespace g729

/* ======================================================= C API ===== */

extern "C" {

/* Encode 8 kHz float mono to raw G.729 frames (10 bytes per 10 ms).
 * Returns bytes written; size `out` as (n/80 + 2) * 10. */
long g729_encode_dbg(const float* in, size_t n, uint8_t* out,
                     double* snr3) {
  using namespace g729;
  size_t nframes = (n + kFrame - 1) / kFrame;
  if (nframes == 0) return 0;
  std::vector<double> sp(n + 280, 0.0);
  for (size_t i = 0; i < n; ++i) sp[120 + i] = (double)in[i] * 32768.0;
  Encoder enc;
  enc.dbg_snr = snr3;
  long written = 0;
  for (size_t fr = 0; fr < nframes; ++fr) {
    Params p{};
    enc.encode_frame(sp.data() + fr * kFrame, &p);
    pack(p, out + written);
    written += 10;
  }
  return written;
}

long g729_encode(const float* in, size_t n, uint8_t* out) {
  using namespace g729;
  size_t nframes = (n + kFrame - 1) / kFrame;
  if (nframes == 0) return 0;
  // int16-domain working copy with LP lookahead margins
  std::vector<double> sp(n + 280, 0.0);
  for (size_t i = 0; i < n; ++i) sp[120 + i] = (double)in[i] * 32768.0;
  Encoder enc;
  long written = 0;
  for (size_t fr = 0; fr < nframes; ++fr) {
    Params p{};
    enc.encode_frame(sp.data() + fr * kFrame, &p);
    pack(p, out + written);
    written += 10;
  }
  return written;
}

/* Decode raw G.729 frames to 8 kHz float mono. */
long g729_decode(const uint8_t* data, size_t size, float* out,
                 size_t maxn) {
  using namespace g729;
  Decoder dec;
  size_t pos = 0;
  long written = 0;
  while (pos + 10 <= size) {
    Params p;
    unpack(data + pos, &p);
    pos += 10;
    int64_t buf[kFrame];
    dec.frame(p, buf);
    for (int i = 0; i < kFrame && (size_t)written < maxn; ++i)
      out[written++] = (float)buf[i] / 32768.0f;
  }
  return written;
}

/* debug: decode without the postfilter/HPF enhancement */
long g729_decode_raw(const uint8_t* data, size_t size, float* out,
                     size_t maxn) {
  using namespace g729;
  Decoder dec;
  size_t pos = 0;
  long written = 0;
  while (pos + 10 <= size) {
    Params p;
    unpack(data + pos, &p);
    pos += 10;
    int64_t buf[kFrame];
    dec.frame(p, buf, false);
    for (int i = 0; i < kFrame && (size_t)written < maxn; ++i)
      out[written++] = (float)buf[i] / 32768.0f;
  }
  return written;
}

/* encode->decode round trip at 8 kHz (the augmentation entry). */
void g729_roundtrip(const float* in, float* out, size_t n) {
  using namespace g729;
  size_t nframes = (n + kFrame - 1) / kFrame;
  std::vector<uint8_t> bs(nframes * 10 + 20);
  long nb = g729_encode(in, n, bs.data());
  std::vector<float> dec(nframes * kFrame + kFrame, 0.0f);
  long m = g729_decode(bs.data(), (size_t)std::max(nb, 0L), dec.data(),
                       dec.size());
  if (m < 0) m = 0;
  for (size_t i = 0; i < n; ++i)
    out[i] = (i < (size_t)m) ? dec[i] : 0.0f;
}

} /* extern "C" */
