/* ITU-T G.729 (8 kbps, CS-ACELP) — fixed-point decoder BIT-EXACT vs
 * the in-image lavc `g729` decoder (full output chain: excitation,
 * synthesis incl. the trial-overflow exc>>2 redo, fixed-point
 * long/short-term postfilter + tilt + gain scale, adaptive gain
 * control, 100 Hz HPF), plus an AbS encoder running against an
 * embedded replica for state lockstep.
 *
 * Recovery route (tools/g729_tables/FACTS.md): tables extracted from
 * the libavcodec object files; laws pinned by disassembly of
 * g729dec.o/g729postfilter.o/lsp.o/acelp_*.o, ctypes context
 * introspection, and DIRECT probing of the archive object code (the
 * postfilter/AGC/lsp helpers linked into a fork-isolated probe server
 * and fuzzed against the Python port — tools/g729_tables/pf_exact.py /
 * fuzz_pf.py). truedec729.py is the validated reference: random
 * multi-frame streams match lavc's int16 output SAMPLE-EXACTLY.
 * Matches the reference's `g729a` common-tier entry
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

inline int32_t wrap32(int64_t v) { return (int32_t)(uint32_t)(v & 0xFFFFFFFF); }
inline int16_t wrap16(int64_t v) { return (int16_t)(uint16_t)(v & 0xFFFF); }
inline int64_t cdiv(int64_t a, int64_t b) { return a / b; }  // C trunc

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
  // exact fixed-point postfilter / AGC / HPF state (bit-exact vs the
  // lavc ff_g729_postfilter object code; see tools/g729_tables/pf_exact.py)
  int64_t pf_residual[192] = {0};   // RES_PREV(152) + subframe
  int64_t pf_rfd[10] = {0};         // res_filter_data (speech history)
  int64_t pf_pfd[50] = {0};         // pos_filter_data (10 hist + 40 out)
  int pf_ht_prev = 0;
  int pf_voicing = 0;
  int agc_gain = 0x4000;            // decoder_init: ctx+0x53c
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
          // both halves truncate (lavc g729dec; ctx-introspection fit —
          // an odd overlap leaves the pair 1 closer than `gap`)
          q[i - 1] -= d >> 1;
          q[i] += d >> 1;
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
      // f[] are wrapping int32 in lavc; MULL = 64-bit product >> 14
      // truncated to int32
      f[0] = 1 << 22;
      f[1] = -l[0] << 8;
      for (int i = 2; i < 6; ++i) {
        f[i] = f[i - 2];
        for (int j = i; j > 1; --j)
          f[j] = wrap32(f[j] + f[j - 2] -
                        wrap32((l[2 * (i - 1)] * f[j - 1]) >> 14));
        f[1] = wrap32(f[1] - (l[2 * (i - 1)] << 8));
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
      int64_t ff1 = wrap32(f1[i] + f1[i - 1] + (1 << 10));
      int64_t ff2 = wrap32(f2[i] - f2[i - 1]);
      lp[i] = wrap16(wrap32(ff1 + ff2) >> 11);
      lp[11 - i] = wrap16(wrap32(ff1 - ff2) >> 11);
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
    // exact lavc double expression (operation order matters for the
    // borderline truncations): gain_corr_factor *
    //   exp(M_LN10/(20<<23) * mr_energy) / sqrt(dot(fc,fc)), trunc, >>12
    const double c1 = 2.30258509299404568402 / (double)(20 << 23);
    int64_t dot = 0;
    for (int i = 0; i < kSub; ++i) dot += fc[i] * fc[i];
    double val = factor * std::exp(c1 * (double)ene) /
                 std::sqrt((double)dot);
    gain_code = (int)((int64_t)val >> 12);
    // ff_acelp_update_past_gain (non-erasure):
    // q0 = (6165*((ff_log2(factor)>>2) - (13<<13))) >> 13
    quant_energy[3] = quant_energy[2];
    quant_energy[2] = quant_energy[1];
    quant_energy[1] = quant_energy[0];
    quant_energy[0] =
        ((int64_t)6165 * ((log2_q15(factor) >> 2) - (13 << 13))) >> 13;
  }

  /* ---- exact fixed-point postfilter (ff_g729_postfilter port) --- */
  /* Constants: gamma_n=0.55 / gamma_d=0.7 power products (Q15). */
  static constexpr int kGnPow[10] = {18022, 9912, 5451, 2998, 1649,
                                     907,  499,  274,  151,  83};
  static constexpr int kGdPow[10] = {22938, 16057, 11240, 7868, 5508,
                                     3856, 2699, 1889, 1322, 925};

  static int64_t pf_dot(const int64_t* a, const int64_t* b, int n) {
    int64_t s = 0;
    for (int i = 0; i < n; ++i) s = wrap32(s + a[i] * b[i]);
    return s;
  }
  static int64_t abs16u(int64_t v) { return v == -32768 ? 32768 : (v < 0 ? -v : v); }
  static int bsr32(int64_t v) {
    uint32_t u = (uint32_t)(v & 0xFFFFFFFF) | 1u;
    return 31 - __builtin_clz(u);
  }

  /* ff_acelp_interpolate over kPfFilt (long table at 0, short at 64). */
  static void pf_interp(const int64_t* in, int base, int filt_off,
                        int precision, int frac, int filt_len, int length,
                        int64_t* out) {
    for (int n = 0; n < length; ++n) {
      int64_t v = 0x4000;
      int idx = 0;
      for (int i = 0; i < filt_len;) {
        v += in[base + n + i] * g729t::kPfFilt[filt_off + idx + frac];
        idx += precision;
        ++i;
        v += in[base + n - i] * g729t::kPfFilt[filt_off + idx - frac];
      }
      out[n] = sat16(v >> 15);
    }
  }

  /* ff_celp_lp_synthesis_filter, shift 0 / rounder 0x800: int32
   * wrapping accumulator, in[n] added AFTER the >> 12. */
  static void pf_synth(const int* coeffs, const int64_t* in, int n,
                       const int64_t* hist10, int64_t* out) {
    for (int i = 0; i < n; ++i) {
      int64_t v = 0x800;
      for (int k = 1; k <= 10; ++k) {
        int64_t past = (i - k >= 0) ? out[i - k] : hist10[10 + i - k];
        v -= (int64_t)coeffs[k - 1] * past;
      }
      out[i] = sat16((wrap32(v) >> 12) + in[i]);
    }
  }

  /* Exact ff_g729_postfilter: mutates pf_* state and speech in place. */
  void postfilter(int64_t* speech, const int64_t lp[11], int pdi) {
    int lp_gn[10], lp_gd[10];
    for (int i = 0; i < 10; ++i) {
      lp_gn[i] = (int)(((int64_t)lp[i + 1] * kGnPow[i] + 0x4000) >> 15);
      lp_gd[i] = (int)(((int64_t)lp[i + 1] * kGdPow[i] + 0x4000) >> 15);
    }
    // residual of A(z/gn) with 16-bit wrapping add
    {
      int64_t sp[50];
      for (int i = 0; i < 10; ++i) sp[i] = pf_rfd[i];
      for (int i = 0; i < kSub; ++i) sp[10 + i] = speech[i];
      for (int i = 0; i < kSub; ++i) {
        int64_t acc = 0x800;
        for (int k = 1; k <= 10; ++k)
          acc += (int64_t)lp_gn[k - 1] * sp[10 + i - k];
        pf_residual[152 + i] = wrap16((wrap32(acc) >> 12) + sp[10 + i]);
      }
      for (int i = 0; i < 10; ++i) pf_rfd[i] = sp[40 + i];
    }
    bool filtered = false;
    int64_t residual_filt[kSub];
    // bit-length normalization of the whole 192-entry buffer
    int64_t t = 0;
    for (int i = 0; i < 192; ++i) t |= abs16u(pf_residual[i]);
    int shift = t == 0 ? 3 : bsr32(t) - 11;
    int64_t norm[192];
    if (shift > 0)
      for (int i = 0; i < 192; ++i) norm[i] = pf_residual[i] >> shift;
    else
      for (int i = 0; i < 192; ++i)
        norm[i] = wrap16(pf_residual[i] << (-shift));
    do {
      const int64_t* cur = norm + 152;
      int64_t ener = pf_dot(cur, cur, kSub);
      if (ener == 0) break;
      int64_t best_corr = 0;
      int best_delay = pdi - 1;
      for (int T = pdi - 1; T <= pdi + 1; ++T) {
        int64_t c = pf_dot(cur, norm + 152 - T, kSub);
        if (c > best_corr) { best_corr = c; best_delay = T; }
      }
      if (best_corr == 0) break;
      int64_t en_int = pf_dot(norm + 152 - best_delay,
                              norm + 152 - best_delay, kSub);
      // 7 fractional candidates via the 2-tap short filter
      int64_t bufs[8][41];
      int64_t ens[8][2];
      for (int label = 1; label <= 7; ++label) {
        pf_interp(norm, 152 - best_delay, 64, 8, 8 - label, 2, 41,
                  bufs[label]);
        int64_t e = pf_dot(bufs[label] + 1, bufs[label] + 1, 39);
        ens[label][0] = wrap32(e + bufs[label][0] * bufs[label][0]);
        ens[label][1] = wrap32(e + bufs[label][40] * bufs[label][40]);
      }
      int64_t maxen = en_int;
      for (int label = 1; label <= 7; ++label) {
        int64_t m = ens[label][0] > ens[label][1] ? ens[label][0]
                                                  : ens[label][1];
        if (m > maxen) maxen = m;
      }
      int sh_max = 17 - (31 - bsr32(maxen));
      if (sh_max < 0) break;
      int sh_ener = std::max(0, 17 - (31 - bsr32(ener)));
      int S = std::max(sh_max, sh_ener);
      int64_t en_int_n = en_int >> (sh_max & 31);
      int64_t corr_int_n = wrap16(best_corr >> (S & 31));
      struct { int win, label; int64_t corr_n, corr_sq, en_n; } best =
          {1, 0, corr_int_n, wrap32(corr_int_n * corr_int_n), en_int_n};
      for (int label = 1; label <= 7; ++label)
        for (int win = 0; win < 2; ++win) {
          int64_t ck = pf_dot(bufs[label] + win, cur, kSub);
          ck >>= (S & 31);
          if (ck < 0) ck = 0;
          ck = wrap16(ck);
          int64_t cksq = wrap32(ck * ck);
          int64_t ek = wrap16(ens[label][win] >> (sh_max & 31));
          if (((cksq * best.en_n) >> 15) > ((best.corr_sq * ek) >> 15))
            best = {win, label, ck, cksq, ek};
        }
      // threshold: corr^2 << (2S+1) >= ener*en (normalized shifts)
      int64_t lhs = best.corr_sq << (2 * S + 1);
      int64_t ener_n = wrap32(ener) >> (sh_ener & 31);
      int64_t rhs = (ener_n * best.en_n) << (sh_ener + sh_max);
      if (lhs < rhs || best.corr_n == 0) break;
      int64_t src[kSub];
      int64_t corr_n, en_n;
      int shA, shB;
      if (best.label == 0) {
        int delay = best_delay + 1 - best.win;
        for (int i = 0; i < kSub; ++i) src[i] = pf_residual[152 - delay + i];
        corr_n = best.corr_n; en_n = best.en_n; shB = S; shA = sh_max;
      } else {
        // 8-tap re-interpolation, adversarially re-checked vs the
        // 2-tap search winner
        int64_t rf[41];
        pf_interp(norm, 152 - best_delay + best.win, 0, 8,
                  8 - best.label, 8, 41, rf);
        int64_t corr_f = pf_dot(rf, cur, kSub);
        int sh2 = 0;
        int64_t corr_f_n16 = 0, r_frac = 0;
        if (corr_f >= 0) {
          sh2 = std::max(0, bsr32(corr_f) - 14);
          corr_f_n16 = wrap16(corr_f >> sh2);
          r_frac = wrap32((corr_f_n16 * corr_f_n16 * best.en_n) >> 15);
        }
        int64_t en_f = pf_dot(rf, rf, kSub);
        int sh3 = std::max(0, bsr32(en_f) - 14);
        int64_t en_f_n16 = wrap16(en_f >> sh3);
        int64_t r_int =
            wrap32((best.corr_n * best.corr_n * en_f_n16) >> 15);
        int sh_delta = sh_max + 2 * (sh2 - S) - sh3;
        if (sh_delta > 0) r_int >>= (sh_delta & 31);
        else r_frac >>= std::min(31, -sh_delta);
        if (r_int < r_frac) {
          for (int i = 0; i < kSub; ++i) src[i] = rf[i];
          corr_n = corr_f_n16; en_n = en_f_n16; shA = sh3; shB = sh2;
        } else {
          for (int i = 0; i < kSub; ++i) src[i] = bufs[best.label][best.win + i];
          corr_n = best.corr_n; en_n = best.en_n; shA = sh_max; shB = S;
        }
        // denormalize the candidate (16-bit store on the << path)
        if (shift > 0)
          for (int i = 0; i < kSub; ++i) src[i] = wrap16(src[i] << shift);
        else
          for (int i = 0; i < kSub; ++i) src[i] >>= -shift;
      }
      int64_t en64 = en_n << (shA & 63);
      int64_t corr64 = corr_n << (shB & 63);
      int64_t w_cur = cdiv(en64 << 15, en64 + (corr64 >> 1));
      if (w_cur < 0x5555) w_cur = 0x5555;
      int wd = wrap16(0x8000 - w_cur), wc = wrap16(w_cur);
      for (int i = 0; i < kSub; ++i)
        residual_filt[i] = sat16((pf_residual[152 + i] * wc +
                                  src[i] * wd + 0x4000) >> 15);
      filtered = true;
    } while (false);
    if (!filtered)
      for (int i = 0; i < kSub; ++i) residual_filt[i] = pf_residual[152 + i];
    pf_voicing = std::max(pf_voicing, filtered ? 1 : 0);
    std::memmove(pf_residual, pf_residual + kSub, 152 * sizeof(int64_t));
    // hf impulse response of A(z/gn)/A(z/gd) for gain scale + tilt
    int64_t hf[33] = {0};
    hf[10] = 4096;
    for (int i = 0; i < 10; ++i) hf[11 + i] = lp_gn[i];
    {
      int64_t seq[22];
      for (int i = 0; i < 22; ++i) seq[i] = hf[11 + i];
      pf_synth(lp_gd, seq, 22, hf + 1, hf + 11);
    }
    int64_t rh0 = pf_dot(hf + 10, hf + 10, 20);
    int64_t rh1 = pf_dot(hf + 10, hf + 11, 20);
    int k = bsr32(rh0) - 14;
    if (k > 0) { rh0 >>= k; rh1 = wrap32(rh1) >> k; }
    int64_t tsum = 0;
    for (int i = 10; i < 30; ++i) tsum += abs16u(hf[i]);
    if (tsum > 0x1003) {
      int64_t f2 = cdiv(0x2000000, tsum >> 2);
      for (int i = 0; i < kSub; ++i)
        residual_filt[i] = wrap16(wrap32(residual_filt[i] * f2 + 0x4000)
                                  >> 15);
    }
    int64_t gt_half = 0, r10 = 0, fact = 0x800, rnd = 0x400;
    int shc = 11;
    if (!((rh1 < 0 ? -rh1 : rh1) > rh0 || rh0 == 0)) {
      int rc = wrap16(cdiv((int64_t)wrap32((int64_t)wrap32(-wrap32(rh1))
                                           << 15), rh0));
      int64_t pl;
      if (rc > 0) {
        pl = (int64_t)rc * 0x199A + 0x4000;
        int gt = (int)(pl >> 15);
        gt_half = pl >> 16;
        fact = gt ? cdiv(0x20000000, wrap16(0x8000 - gt)) : 0x4000;
        rnd = 0x2000; shc = 14;
      } else {
        pl = wrap32((int64_t)rc * 0x7333 + 0x4000);
        int gt = (int)(pl >> 15);
        gt_half = pl >> 16;
        fact = gt ? cdiv(0x4000000, wrap16(0x8000 + gt)) : 0x800;
        rnd = 0x400; shc = 11;
      }
      r10 = (2 * (pf_ht_prev * gt_half) + 0x4000) >> 15;
    }
    // short-term 1/A(z/gd) into pos_filter_data[10..49]
    {
      int64_t hist[10];
      for (int i = 0; i < 10; ++i) hist[i] = pf_pfd[i];
      pf_synth(lp_gd, residual_filt, kSub, hist, pf_pfd + 10);
    }
    for (int i = 0; i < 10; ++i) pf_pfd[i] = pf_pfd[40 + i];
    int last = (int)pf_pfd[10 + kSub - 1];
    const int64_t* pos10 = pf_pfd + 10;
    for (int i = kSub - 1; i >= 1; --i) {
      int64_t tilt = wrap32(2 * (pos10[i - 1] * gt_half) + 0x4000) >> 15;
      speech[i] = wrap16(wrap32(wrap32(pos10[i] + tilt) * fact + rnd)
                         >> shc);
    }
    speech[0] = wrap16(wrap32(wrap32(pos10[0] + r10) * fact + rnd) >> shc);
    pf_ht_prev = last;
  }

  /* Exact ff_g729_adaptive_gain_control. */
  void agc(int64_t gain_before, int64_t gain_after, int64_t* speech) {
    if (gain_after == 0 && gain_before != 0) { agc_gain = 0; return; }
    int64_t gain0 = 0;
    if (gain_before != 0) {
      int clz_b = 31 - bsr32(gain_before);
      int sh_b = clz_b - 17;
      int64_t nb = sh_b >= 0 ? (gain_before << sh_b) : (gain_before >> -sh_b);
      int clz_a = 31 - bsr32(gain_after);
      int sh_a = clz_a - 17;
      int64_t na = sh_a >= 0 ? (gain_after << sh_a) : (gain_after >> -sh_a);
      int d = clz_a - clz_b;
      int64_t g;
      if (nb < na) {
        g = cdiv((int64_t)wrap32(nb << 15), na);
        g = d - 1 >= 0 ? wrap32(g << ((d - 1) & 31))
                       : (int64_t)(((uint32_t)g) >> (clz_b + 1 - clz_a));
      } else {
        g = cdiv((int64_t)wrap32((nb - na) << 14), na) + 0x4000;
        g = d >= 0 ? wrap32(g << (d & 31))
                   : (int64_t)(((uint32_t)(g & 0xFFFFFFFF)) >> -d);
      }
      if (!(g >= 0 && g <= 0x7FFF))
        g = ((uint32_t)(g & 0xFFFFFFFF)) > 0x7FFF ? 0x7FFF : g;
      gain0 = (g * 0x19A + 0x4000) >> 15;
    }
    int64_t g = agc_gain;
    for (int i = 0; i < kSub; ++i) {
      g = ((wrap16(g) * 0x7E66 + 0x4000) >> 15) + gain0;
      speech[i] = sat16((speech[i] * wrap16(g) + 0x2000) >> 14);
    }
    agc_gain = wrap16(g);
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

  /* decode one frame into out[80] (int16-range values).

     The synthesis runs into a RAW buffer (lavc keeps it for the filter
     memories) and the enhanced output is produced separately:
     postfilter -> adaptive gain control -> 100 Hz HPF. */
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
    int64_t raw[kFrame];
    pf_voicing = 0;                // per-frame reset (decode_frame 0x19d)
    int pf_pitch = 20;
    for (int sf = 0; sf < 2; ++sf) {
      int d3 = sf == 0 ? pitch_abs(f.P1) : pitch_rel(f.P2, pitch_prev);
      adaptive(d3, sf * kSub);
      pitch_prev = (d3 + 1) / 3;
      int pitch_round = (d3 + 1) / 3;
      if (sf == 0) pf_pitch = pitch_round;  // postfilter uses the FIRST
      // subframe's rounded int pitch for BOTH subframes
      int64_t fc[kSub];
      fixed_vector(sf == 0 ? f.C1 : f.C2, sf == 0 ? f.S1 : f.S2, fc);
      sharpen(fc, pitch_round);
      gains(sf == 0 ? f.GA1 : f.GA2, sf == 0 ? f.GB1 : f.GB2, fc);
      int e0 = kHist + sf * kSub;
      for (int n = 0; n < kSub; ++n)
        exc[e0 + n] = sat16((gain_pitch * exc[e0 + n] +
                             (int64_t)gain_code * fc[n] + 0x2000) >> 14);
      const int64_t* a = lp2[sf];
      int64_t* o = raw + sf * kSub;
      // TRIAL synthesis (decode_frame asm ba8, stop_on_overflow=1): an
      // int16 overflow shifts the ENTIRE exc_base >> 2 before the real
      // synthesis (asm 1272-128d)
      for (int attempt = 0; attempt < 2; ++attempt) {
        bool overflow = false;
        for (int n = 0; n < kSub; ++n) {
          int64_t v = 0x800;
          for (int k = 1; k <= 10; ++k) {
            int64_t past = (n - k + sf * kSub >= 0)
                               ? raw[sf * kSub + n - k]
                               : synth_mem[10 + n - k];
            v -= a[k] * past;
          }
          // int32-wrapping accumulator; in[n] added after >> 12
          int64_t sum = (wrap32(v) >> 12) + exc[e0 + n];
          if (attempt == 0 && (sum < -32768 || sum > 32767)) {
            overflow = true;
            break;
          }
          o[n] = sat16(sum);
        }
        if (!overflow) break;
        for (int i = 0; i < kHist + kFrame; ++i) exc[i] >>= 2;
      }
      std::memcpy(synth_mem, o + kSub - 10, 10 * sizeof(int64_t));
      int64_t* fo = out + sf * kSub;
      std::memcpy(fo, o, kSub * sizeof(int64_t));
      if (enhance) {
        int64_t gain_before = 0, gain_after = 0;
        for (int n = 0; n < kSub; ++n) gain_before += abs16u(fo[n]);
        postfilter(fo, lp2[sf], pf_pitch);
        for (int n = 0; n < kSub; ++n) gain_after += abs16u(fo[n]);
        agc(gain_before, gain_after, fo);
        hpf(fo, kSub);
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
    // replica synthesis memory for the next ZIR — mirrors the decoder
    // EXACTLY, including the trial-overflow exc_base >> 2 redo
    const int64_t* a = lp;
    int64_t o[kSub];
    for (int attempt = 0; attempt < 2; ++attempt) {
      bool overflow = false;
      for (int n = 0; n < kSub; ++n) {
        int64_t v = 0x800;
        for (int k = 1; k <= 10; ++k) {
          int64_t past = (n - k >= 0) ? o[n - k]
                                      : local.synth_mem[10 + n - k];
          v -= a[k] * past;
        }
        int64_t sum = (wrap32(v) >> 12) + local.exc[e0 + n];
        if (attempt == 0 && (sum < -32768 || sum > 32767)) {
          overflow = true;
          break;
        }
        o[n] = sat16(sum);
      }
      if (!overflow) break;
      for (int i = 0; i < kHist + kFrame; ++i) local.exc[i] >>= 2;
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
