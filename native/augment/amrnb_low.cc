/* AMR-NB low-rate modes 0..6 (4.75 - 10.2 kbps) — real 3GPP-
 * interoperable bitstreams, completing the reference's cellular tier
 * (/root/reference/channel_simulation/simulated_channel.py:30-33,
 * amr[br=4k75 .. 10k2]).
 *
 * Every table and decode law comes from the black-box recovery lab
 * (tools/amr_tables/, FACTS.md "Low-mode" sections): 3-split LSF
 * residual tables + per-coefficient MA predictor, per-mode 1/3-
 * fractional lag grids, the per-mode algebraic codebooks (incl.
 * MR102's joint ordered-pair coding and circular smoothing kernel),
 * joint gain VQ tables with the 4-tap log-energy predictor, the
 * previous-subframe pitch sharpening clamp, phase dispersion, and the
 * feedback truncation. Decoder + encoders ported from the pinned
 * python replicas (tools/amr_tables/amrnb_low.py, amrnb_low_enc.py);
 * conformance: tests/test_amr_conformance.py (streams decode
 * error-free on libavcodec's amrnb decoder).
 *
 * MR475's joint 2-subframe gain VQ uses a snapshot/replay: both
 * subframes are searched under tentative unquantized gains, the
 * 256-row table is scanned with exact predictor coupling, then both
 * subframes are re-committed through the decode path. */

#include <algorithm>
#include <cmath>
#include <cstddef>
#include <cstdint>
#include <cstring>
#include <vector>

#include "amrnb_celp.h"
#include "amrnb_internal.h"
#include "amrnb_low_tables.h"
#include "augment.h"

namespace {

using namespace amrnb_low;
using namespace amrnb_celp;

constexpr double kG1 = 0.94, kG2 = 0.6;  /* low-mode encoder weighting */
constexpr double kLowPfGn = 0.55, kLowPfGd = 0.7;
const int kDG[8] = {0, 1, 3, 2, 5, 6, 4, 7};  /* EFR Gray decode */

const double kLspInit[10] = {30000 / 32768.0,  26000 / 32768.0,
                             21000 / 32768.0,  15000 / 32768.0,
                             8000 / 32768.0,   0.0,
                             -8000 / 32768.0,  -15000 / 32768.0,
                             -21000 / 32768.0, -26000 / 32768.0};

/* MR475/MR515 track pairs: startPos[i][subframe] -> (track0, track1) */
const int kStartPos[2][4][2] = {
    {{0, 2}, {0, 3}, {0, 2}, {0, 3}},
    {{1, 3}, {2, 4}, {1, 4}, {1, 4}},
};

/* ------------------------------------------------------------- LSF */
void lsf3_rows(int mode, int i0, int i1, int i2, double r_hz[10]) {
  const int16_t* r0 = (mode == 5) ? kLsf31_795[i0] : kLsf31[i0];
  const int16_t* r1 = (mode <= 1) ? kLsf32[i1 << 1] : kLsf32[i1];
  const int16_t* r2 = (mode <= 1) ? kLsf33_515[i2] : kLsf33[i2];
  for (int j = 0; j < 3; j++) r_hz[j] = r0[j] / 4.096;
  for (int j = 0; j < 3; j++) r_hz[3 + j] = r1[j] / 4.096;
  for (int j = 0; j < 4; j++) r_hz[6 + j] = r2[j] / 4.096;
}

void lsf3_decode(int mode, int i0, int i1, int i2, double* past_r,
                 double q_hz[10]) {
  double r[10];
  lsf3_rows(mode, i0, i1, i2, r);
  for (int j = 0; j < 10; j++) {
    q_hz[j] = kMeanLsf3Hz[j] + r[j] + kPredFac3[j] * past_r[j];
    past_r[j] = r[j];
  }
  reorder_lsf(q_hz, 10);
}

/* ------------------------------------------------------------- lags */
void dec_lag3_abs(int index, int* T0, int* frac) {
  if (index < 197) {
    *T0 = (index + 2) / 3 + 19;
    *frac = index - 3 * (*T0 - 19) + 1;
  } else {
    *T0 = index - 112;
    *frac = 0;
  }
}

void dec_lag3_rel(int index, int t0_prev, int nbits, int* T0, int* frac) {
  int d3;
  if (nbits == 4) {
    int t0min = std::min(std::max(t0_prev - 5, 20), 134);
    if (index < 4) {
      *T0 = t0min + index;
      *frac = 0;
      return;
    }
    if (index >= 13) {
      *T0 = t0min + index - 6;
      *frac = 0;
      return;
    }
    d3 = 3 * t0min + index + 6;
  } else if (nbits == 5) {
    int t0min = std::min(std::max(t0_prev - 5, 20), 134);
    d3 = 3 * t0min + index - 2;
  } else { /* 6 bits (MR795) */
    int t0min = std::min(std::max(t0_prev - 10, 20), 124);
    d3 = 3 * t0min + index - 2;
  }
  *T0 = (d3 + 1) / 3;
  *frac = d3 - 3 * (*T0);
}

inline void pred_lt_3(const double* hist, int T0, int frac, double* v) {
  pred_lt_6(hist, T0, 2 * frac, v);
}

/* ------------------------------------------------------ fixed codes */
/* Sign convention (all low modes except MR102): bit 0 -> -1, 1 -> +1. */
inline double sgn_low(int field, int bit) {
  return ((field >> bit) & 1) ? 1.0 : -1.0;
}

void pulses_2_9bit(int sf, int pos_field, int sign_field, double* code) {
  std::memset(code, 0, sizeof(double) * kSub);
  int i = (pos_field >> 6) & 1;
  int p0 = pos_field & 7;
  int p1 = (pos_field >> 3) & 7;
  int t0 = kStartPos[i][sf][0], t1 = kStartPos[i][sf][1];
  code[t0 + 5 * p0] += sgn_low(sign_field, 0);
  code[t1 + 5 * p1] += sgn_low(sign_field, 1);
}

void pulses_5k9(int pos_field, int sign_field, double* code) {
  std::memset(code, 0, sizeof(double) * kSub);
  static const int tr0[4] = {0, 1, 2, 4};
  int v0 = (pos_field >> 4) & 31;
  int v1 = pos_field & 15;
  code[5 * (v0 >> 2) + tr0[v0 & 3]] += sgn_low(sign_field, 1);
  code[1 + 5 * (v1 >> 1) + 2 * (v1 & 1)] += sgn_low(sign_field, 0);
}

void pulses_6k7(int pos_field, int sign_field, double* code) {
  std::memset(code, 0, sizeof(double) * kSub);
  int p0 = 5 * (pos_field & 7);
  int v1 = (pos_field >> 3) & 15;
  int v2 = (pos_field >> 7) & 15;
  code[p0] += sgn_low(sign_field, 0);
  code[1 + 5 * (v1 >> 1) + 2 * (v1 & 1)] += sgn_low(sign_field, 1);
  code[2 + 5 * (v2 >> 1) + 2 * (v2 & 1)] += sgn_low(sign_field, 2);
}

void pulses_7k4(int pos_field, int sign_field, double* code) {
  std::memset(code, 0, sizeof(double) * kSub);
  for (int k = 0; k < 3; k++) {
    int v = (pos_field >> (3 * k)) & 7;
    code[k + 5 * kDG[v]] += sgn_low(sign_field, k);
  }
  int v3 = (pos_field >> 9) & 15;
  code[(3 + (v3 & 1)) + 5 * kDG[v3 >> 1]] += sgn_low(sign_field, 3);
}

/* MR102: 8 pulses, 2 per 4-wide track; joint ordered-pair tables;
 * sign bit 1 -> -1 (opposite of the other low modes); the innovation is
 * then smoothed with a circular 40-sample kernel. */
void pulses_10k2(int p4, int p5, int p6, int signs, double* code) {
  std::memset(code, 0, sizeof(double) * kSub);
  auto add_pair = [&](int track, int first, int second, double s) {
    int q1 = track + 4 * first, q2 = track + 4 * second;
    code[q1] += s;
    code[q2] += (q2 >= q1) ? s : -s;
  };
  const int8_t* t4 = kMr102T4[p4];
  const int8_t* t5 = kMr102T5[p5];
  const int8_t* t6 = kMr102T6[p6];
  add_pair(0, t4[0], t4[1], (signs & 1) ? -1.0 : 1.0);
  add_pair(1, t4[2], t5[2], (signs & 2) ? -1.0 : 1.0);
  add_pair(2, t5[0], t5[1], (signs & 4) ? -1.0 : 1.0);
  add_pair(3, t6[0], t6[1], (signs & 8) ? -1.0 : 1.0);
}

void circ_conv40(const double* code, const double* kern, double* out) {
  for (int n = 0; n < kSub; n++) {
    double s = 0;
    for (int m = 0; m < kSub; m++) s += code[m] * kern[(n - m + kSub) % kSub];
    out[n] = s;
  }
}

/* ------------------------------------------------------------ gains */
struct LowDecCore {
  double past_r[10];
  double past_lsp[10];
  double exc[154];
  double ener_pred[4];
  int t0_prev;
  double gp_prev;
  /* anti-sparseness (H-DISP) machine */
  double gp_hist[5];
  int onset, prev_nr;
  double prev_sparse_gc;
  bool first;
  void reset() {
    std::memset(this, 0, sizeof(*this));
    std::memcpy(past_lsp, kLspInit, sizeof(past_lsp));
    for (int i = 0; i < 4; i++) ener_pred[i] = kEnerInitLow;
    t0_prev = 20;
    first = true;
  }
};

double code_energy_db(const double* code) {
  double e = 0;
  for (int n = 0; n < kSub; n++) e += code[n] * code[n];
  double mean_e = e / kSub;
  /* H-E0: degenerate all-zero codes use mean energy 1 so gc is finite */
  return 10.0 * std::log10(mean_e > 0.0 ? mean_e : 1.0);
}

double gc_base(int mode, const LowDecCore& st, const double* code) {
  double ep = 0;
  for (int i = 0; i < 4; i++) ep += amrnb::kPredMa[i] * st.ener_pred[i];
  return std::pow(10.0, 0.05 * (ep + kEnergyMean[mode] - kPredC -
                                code_energy_db(code)));
}

void push_pred(LowDecCore* st, double corr) {
  for (int i = 3; i > 0; i--) st->ener_pred[i] = st->ener_pred[i - 1];
  st->ener_pred[0] = 20.0 * std::log10(corr);
}

/* Decode (gp, gc) for one subframe from the gain field values. For
 * MR475 the caller passes the selected half-row via row475. */
void gains_decode(int mode, LowDecCore* st, int p_gain, int fixed_gain,
                  const int16_t* row475, const double* code, double* gp,
                  double* gc) {
  double gc0 = gc_base(mode, *st, code);
  double corr;
  if (mode == 5) { /* 7k95: scalar Q14 gp + 2x MR122 gc ladder */
    *gp = kQuaGainPitchQ14[p_gain] / 16384.0;
    corr = 2.0 * amrnb::kQuaGainCode[fixed_gain];
  } else if (mode == 0) {
    *gp = row475[0] / 16384.0;
    corr = row475[1] / 2048.0;
  } else {
    const int16_t* row = (mode >= 3) ? kGainsHigh[p_gain]
                                     : kGainsLow[p_gain];
    *gp = row[0] / 16384.0;
    corr = row[1] / 2048.0;
  }
  *gc = gc0 * corr;
  push_pred(st, corr);
}

/* Anti-sparseness selection state machine (H-DISP, probe_disp_rows.py):
 * level nr in {0 strong, 1 medium, 2 none} from the current pitch gain,
 * with onset detector, gp-history vote, hysteresis, low-gain bypass. */
int disp_select(LowDecCore* st, double gp, double gc) {
  for (int i = 0; i < 4; i++) st->gp_hist[i] = st->gp_hist[i + 1];
  st->gp_hist[4] = gp;
  double gci = gc * 16384.0;
  int nr = gp < 0.6 ? 0 : (gp < 0.9 ? 1 : 2);
  if (gci > 2.0 * st->prev_sparse_gc)
    st->onset = 2;
  else if (st->onset)
    st->onset--;
  if (!st->onset) {
    int low = 0;
    for (int i = 0; i < 5; i++)
      if (st->gp_hist[i] < 0.6) low++;
    if (low > 2) nr = 0;
    if (nr > st->prev_nr + 1) nr--;
  } else if (nr < 2) {
    nr++;
  }
  if (gci < 5.0) nr = 2;
  st->prev_sparse_gc = gci;
  st->prev_nr = nr;
  return nr;
}

/* --------------------------------------------------- frame decoding */
struct LowDecState {
  LowDecCore core;
  ChainState chain;
  void reset() {
    core.reset();
    std::memset(&chain, 0, sizeof(chain));
  }
};

void build_code(int mode, const Bits& bits, const LowModeMap& M, int k,
                double* code) {
  if (mode == 6) {
    int p4 = bits.get16(M.pulse[4][k].pos, M.pulse[4][k].len);
    int p5 = bits.get16(M.pulse[5][k].pos, M.pulse[5][k].len);
    int p6 = bits.get16(M.pulse[6][k].pos, M.pulse[6][k].len);
    int signs = 0;
    for (int j = 0; j < 4; j++)
      signs |= bits.get16(M.pulse[j][k].pos, 1) << j;
    double plain[kSub];
    pulses_10k2(p4, p5, p6, signs, plain);
    circ_conv40(plain, kMr102Kernel, code);
    return;
  }
  int pos_field = bits.get16(M.pulse[0][k].pos, M.pulse[0][k].len);
  int sign_field = bits.get16(M.pulse[1][k].pos, M.pulse[1][k].len);
  switch (mode) {
    case 0:
    case 1:
      pulses_2_9bit(k, pos_field, sign_field, code);
      break;
    case 2:
      pulses_5k9(pos_field, sign_field, code);
      break;
    case 3:
      pulses_6k7(pos_field, sign_field, code);
      break;
    default:
      pulses_7k4(pos_field, sign_field, code);
  }
}

void decode_frame_low(int mode, const Bits& bits, LowDecState* st,
                      double* out /*160*/) {
  const LowModeMap& M = kLowModes[mode];
  LowDecCore* c = &st->core;
  int i0 = bits.get16(M.lsf[0].pos, M.lsf[0].len);
  int i1 = bits.get16(M.lsf[1].pos, M.lsf[1].len);
  int i2 = bits.get16(M.lsf[2].pos, M.lsf[2].len);
  double q_hz[10], lsp_new[10];
  lsf3_decode(mode, i0, i1, i2, c->past_r, q_hz);
  lsf_to_lsp(q_hz, lsp_new);
  for (int k = 0; k < 4; k++) {
    double w = (k + 1) / 4.0;
    double lsp[10], a[10];
    for (int i = 0; i < 10; i++)
      lsp[i] = (1.0 - w) * c->past_lsp[i] + w * lsp_new[i];
    sort_desc(lsp, 10);
    lsp_to_a(lsp, a);
    int T0, frac;
    int lag_idx = bits.get16(M.lag[k].pos, M.lag[k].len);
    if (M.lag[k].len == 8)
      dec_lag3_abs(lag_idx, &T0, &frac);
    else
      dec_lag3_rel(lag_idx, c->t0_prev, M.lag[k].len, &T0, &frac);
    c->t0_prev = T0;
    double v[kSub], code[kSub];
    pred_lt_3(c->exc, T0, frac, v);
    build_code(mode, bits, M, k, code);
    double sharp = std::min(std::max(c->gp_prev, 0.0), kSharpMaxLow);
    if (T0 < kSub)
      for (int n = T0; n < kSub; n++) code[n] += sharp * code[n - T0];
    double gp, gc;
    if (mode == 0) {
      int rowi = bits.get16(M.pgain[2 * (k / 2)].pos,
                            M.pgain[2 * (k / 2)].len);
      const int16_t* row = kGains475[rowi];
      gains_decode(mode, c, 0, 0, row + 2 * (k % 2), code, &gp, &gc);
    } else {
      int pg = bits.get16(M.pgain[k].pos, M.pgain[k].len);
      int fg = (mode == 5) ? bits.get16(M.fgain[k].pos, M.fgain[k].len)
                           : 0;
      gains_decode(mode, c, pg, fg, nullptr, code, &gp, &gc);
    }
    c->gp_prev = gp;
    double exc[kSub];
    for (int n = 0; n < kSub; n++) exc[n] = gp * v[n] + gc * code[n];
    std::memmove(c->exc, c->exc + kSub, sizeof(double) * (154 - kSub));
    for (int n = 0; n < kSub; n++)
      c->exc[154 - kSub + n] = std::trunc(exc[n] * 16384.0) / 16384.0;
    int nr = disp_select(c, gp, gc);
    double exc_syn[kSub];
    /* modes 7k4/10k2 never disperse (10k2's smoothing kernel is part of
     * its codebook); 7k95 uses its own filter pair */
    if (mode != 4 && mode != 6 && nr < 2) {
      int row = (mode == 5) ? (nr == 0 ? 2 : 1) : (nr == 0 ? 1 : 0);
      double cd[kSub];
      circ_conv40(code, kIrFilters[row], cd);
      for (int n = 0; n < kSub; n++) exc_syn[n] = gp * v[n] + gc * cd[n];
    } else {
      std::memcpy(exc_syn, exc, sizeof(exc));
    }
    if (gp > 0.5) {
      /* pinned low-mode synthesis emphasis: 0.5*gp*min(gp, SHARP_MAX)
       * with MR122's energy renormalization */
      double e0 = 0;
      for (int n = 0; n < kSub; n++) e0 += exc_syn[n] * exc_syn[n];
      double pf = 0.5 * gp * std::min(gp, kSharpMaxLow);
      double e2[kSub], s2 = 0;
      for (int n = 0; n < kSub; n++) {
        e2[n] = exc_syn[n] + pf * v[n];
        s2 += e2[n] * e2[n];
      }
      if (s2 > 0) {
        double s = std::sqrt(e0 / s2);
        for (int n = 0; n < kSub; n++) exc_syn[n] = e2[n] * s;
      }
    }
    chain_subframe(exc_syn, a, kLowPfGn, kLowPfGd, &st->chain,
                   out + kSub * k);
  }
  std::memcpy(c->past_lsp, lsp_new, sizeof(lsp_new));
  c->first = false;
}

/* =================================================== encoder ======= */
struct LowEncState {
  LowDecCore dec;            /* mirrored decoder-side state */
  double sp_mem[80];
  double ol_hist[143];
  double synth_mem[10];
  double wn_mem[10], wd_mem[10];
  double wqn_mem[10], wqd_mem[10];
  double sw_in[10], sw_out[10];
  LowEncState() {
    std::memset(this, 0, sizeof(*this));
    dec.reset();
  }
};

/* snapshot of everything a MR475 gain-pair replay must rewind */
struct PairSnap {
  LowDecCore dec;
  double synth_mem[10], wqn_mem[10], wqd_mem[10];
  double wn_mem[10], wd_mem[10];
};

void take_snap(const LowEncState& st, PairSnap* s) {
  s->dec = st.dec;
  std::memcpy(s->synth_mem, st.synth_mem, sizeof(s->synth_mem));
  std::memcpy(s->wqn_mem, st.wqn_mem, sizeof(s->wqn_mem));
  std::memcpy(s->wqd_mem, st.wqd_mem, sizeof(s->wqd_mem));
  std::memcpy(s->wn_mem, st.wn_mem, sizeof(s->wn_mem));
  std::memcpy(s->wd_mem, st.wd_mem, sizeof(s->wd_mem));
}

void restore_snap(const PairSnap& s, LowEncState* st) {
  st->dec = s.dec;
  std::memcpy(st->synth_mem, s.synth_mem, sizeof(s.synth_mem));
  std::memcpy(st->wqn_mem, s.wqn_mem, sizeof(s.wqn_mem));
  std::memcpy(st->wqd_mem, s.wqd_mem, sizeof(s.wqd_mem));
  std::memcpy(st->wn_mem, s.wn_mem, sizeof(s.wn_mem));
  std::memcpy(st->wd_mem, s.wd_mem, sizeof(s.wd_mem));
}

void lsf_quantize_3(int mode, const double* lsf_hz, const double* past_r,
                    int idx[3], double* r_hz /*10*/) {
  double tgt[10];
  for (int j = 0; j < 10; j++)
    tgt[j] = lsf_hz[j] - kMeanLsf3Hz[j] - kPredFac3[j] * past_r[j];
  struct G {
    const int16_t* tab;
    int rows, stride, width, off;
  } gs[3];
  if (mode == 5) {
    gs[0] = {&kLsf31_795[0][0], 512, 1, 3, 0};
    gs[1] = {&kLsf32[0][0], 512, 1, 3, 3};
    gs[2] = {&kLsf33[0][0], 512, 1, 4, 6};
  } else if (mode <= 1) {
    gs[0] = {&kLsf31[0][0], 256, 1, 3, 0};
    gs[1] = {&kLsf32[0][0], 256, 2, 3, 3};
    gs[2] = {&kLsf33_515[0][0], 128, 1, 4, 6};
  } else {
    gs[0] = {&kLsf31[0][0], 256, 1, 3, 0};
    gs[1] = {&kLsf32[0][0], 512, 1, 3, 3};
    gs[2] = {&kLsf33[0][0], 512, 1, 4, 6};
  }
  for (int g = 0; g < 3; g++) {
    const G& gg = gs[g];
    int bi = 0;
    double be = 1e30;
    for (int i = 0; i < gg.rows; i++) {
      const int16_t* row = gg.tab + (size_t)i * gg.stride * gg.width;
      double e = 0;
      for (int j = 0; j < gg.width; j++) {
        double d = row[j] / 4.096 - tgt[gg.off + j];
        e += d * d;
      }
      if (e < be) {
        be = e;
        bi = i;
      }
    }
    idx[g] = bi;
    const int16_t* row = gg.tab + (size_t)bi * gg.stride * gg.width;
    for (int j = 0; j < gg.width; j++) r_hz[gg.off + j] = row[j] / 4.096;
  }
}

/* ---------------------------------------------- fixed-code searches */
void corr_d(const double* x2, const double* hs, double* d) {
  for (int i = 0; i < kSub; i++) {
    double s = 0;
    for (int n = i; n < kSub; n++) s += x2[n] * hs[n - i];
    d[i] = s;
  }
}

void autocorr_phi(const double* hs, double phi[kSub][kSub]) {
  for (int i = 0; i < kSub; i++)
    for (int j = i; j < kSub; j++) {
      double s = 0;
      for (int n = j; n < kSub; n++) s += hs[n - i] * hs[n - j];
      phi[i][j] = phi[j][i] = s;
    }
}

/* MR475/MR515: exhaustive (2 configs x 8 x 8 x 4 signs, optimal). */
void search_2_9bit(int sf, const double* d, double phi[kSub][kSub],
                   int* pos_field, int* sign_field) {
  double bbest = -1e30;
  int bi = 0, bp0 = 0, bp1 = 0;
  double bs0 = 1, bs1 = 1;
  for (int i = 0; i < 2; i++) {
    int t0 = kStartPos[i][sf][0], t1 = kStartPos[i][sf][1];
    for (int p0 = 0; p0 < 8; p0++)
      for (int p1 = 0; p1 < 8; p1++) {
        int q0 = t0 + 5 * p0, q1 = t1 + 5 * p1;
        for (int s = 0; s < 4; s++) {
          double s0 = (s & 1) ? -1.0 : 1.0;
          double s1 = (s & 2) ? -1.0 : 1.0;
          double num = s0 * d[q0] + s1 * d[q1];
          double den = phi[q0][q0] + phi[q1][q1] + 2 * s0 * s1 * phi[q0][q1];
          double sc = num * num / std::max(den, 1e-12);
          if (sc > bbest) {
            bbest = sc;
            bi = i;
            bp0 = p0;
            bp1 = p1;
            bs0 = s0;
            bs1 = s1;
          }
        }
      }
  }
  /* keep the positively-correlated mirror (decoded gains are positive) */
  int q0 = kStartPos[bi][sf][0] + 5 * bp0, q1 = kStartPos[bi][sf][1] + 5 * bp1;
  if (bs0 * d[q0] + bs1 * d[q1] < 0) {
    bs0 = -bs0;
    bs1 = -bs1;
  }
  *pos_field = (bi << 6) | (bp1 << 3) | bp0;
  *sign_field = (bs0 > 0 ? 1 : 0) | ((bs1 > 0 ? 1 : 0) << 1);
}

/* Preset-sign exhaustive over up to 4 position lists (signs from
 * sign(d), classic ACELP practice). */
struct PosList {
  int n;
  int pos[32];
};

void preset_exhaustive(const double* d, double phi[kSub][kSub],
                       const PosList* pl, int np, int* picks,
                       double* sgns) {
  double s[kSub], ds[kSub];
  for (int i = 0; i < kSub; i++) {
    s[i] = d[i] >= 0 ? 1.0 : -1.0;
    ds[i] = std::fabs(d[i]);
  }
  auto phiS = [&](int p, int q) { return s[p] * s[q] * phi[p][q]; };
  double bbest = -1e30;
  int bp[4] = {0, 0, 0, 0};
  int i3max = np > 3 ? pl[3].n : 1;
  int i2max = np > 2 ? pl[2].n : 1;
  for (int i0 = 0; i0 < pl[0].n; i0++) {
    int p0 = pl[0].pos[i0];
    double n0 = ds[p0], d0 = phi[p0][p0];
    for (int i1 = 0; i1 < pl[1].n; i1++) {
      int p1 = pl[1].pos[i1];
      double n1 = n0 + ds[p1];
      double d1 = d0 + phi[p1][p1] + 2 * phiS(p0, p1);
      for (int i2 = 0; i2 < i2max; i2++) {
        double n2 = n1, d2 = d1;
        int p2 = 0;
        if (np > 2) {
          p2 = pl[2].pos[i2];
          n2 += ds[p2];
          d2 += phi[p2][p2] + 2 * (phiS(p0, p2) + phiS(p1, p2));
        }
        for (int i3 = 0; i3 < i3max; i3++) {
          double n3 = n2, d3 = d2;
          if (np > 3) {
            int p3 = pl[3].pos[i3];
            n3 += ds[p3];
            d3 += phi[p3][p3] +
                  2 * (phiS(p0, p3) + phiS(p1, p3) + phiS(p2, p3));
          }
          double sc = n3 * n3 / std::max(d3, 1e-12);
          if (sc > bbest) {
            bbest = sc;
            bp[0] = i0;
            bp[1] = i1;
            bp[2] = i2;
            bp[3] = i3;
          }
        }
      }
    }
  }
  for (int j = 0; j < np; j++) {
    picks[j] = bp[j];
    sgns[j] = s[pl[j].pos[bp[j]]];
  }
}

void search_5k9(const double* d, double phi[kSub][kSub], int* pos_field,
                int* sign_field) {
  static const int tr0[4] = {0, 1, 2, 4};
  PosList pl[2];
  pl[0].n = 32;
  for (int v = 0; v < 32; v++) pl[0].pos[v] = 5 * (v >> 2) + tr0[v & 3];
  pl[1].n = 16;
  for (int v = 0; v < 16; v++) pl[1].pos[v] = 1 + 5 * (v >> 1) + 2 * (v & 1);
  int picks[2];
  double sg[2];
  preset_exhaustive(d, phi, pl, 2, picks, sg);
  *pos_field = (picks[0] << 4) | picks[1];
  *sign_field = (sg[1] > 0 ? 1 : 0) | ((sg[0] > 0 ? 1 : 0) << 1);
}

void search_6k7(const double* d, double phi[kSub][kSub], int* pos_field,
                int* sign_field) {
  PosList pl[3];
  pl[0].n = 8;
  for (int v = 0; v < 8; v++) pl[0].pos[v] = 5 * v;
  pl[1].n = 16;
  for (int v = 0; v < 16; v++) pl[1].pos[v] = 1 + 5 * (v >> 1) + 2 * (v & 1);
  pl[2].n = 16;
  for (int v = 0; v < 16; v++) pl[2].pos[v] = 2 + 5 * (v >> 1) + 2 * (v & 1);
  int picks[3];
  double sg[3];
  preset_exhaustive(d, phi, pl, 3, picks, sg);
  *pos_field = picks[0] | (picks[1] << 3) | (picks[2] << 7);
  *sign_field = (sg[0] > 0 ? 1 : 0) | ((sg[1] > 0 ? 1 : 0) << 1) |
                ((sg[2] > 0 ? 1 : 0) << 2);
}

void search_7k4(const double* d, double phi[kSub][kSub], int* pos_field,
                int* sign_field) {
  PosList pl[4];
  for (int k = 0; k < 3; k++) {
    pl[k].n = 8;
    for (int v = 0; v < 8; v++) pl[k].pos[v] = k + 5 * kDG[v];
  }
  pl[3].n = 16;
  for (int v = 0; v < 16; v++)
    pl[3].pos[v] = (3 + (v & 1)) + 5 * kDG[v >> 1];
  int picks[4];
  double sg[4];
  preset_exhaustive(d, phi, pl, 4, picks, sg);
  *pos_field = picks[0] | (picks[1] << 3) | (picks[2] << 6) |
               (picks[3] << 9);
  *sign_field = 0;
  for (int j = 0; j < 4; j++)
    if (sg[j] > 0) *sign_field |= 1 << j;
}

/* MR102 greedy over the smoothed pulse basis + reverse joint-table
 * lookup. */
struct Mr102Rev {
  int16_t r4[10][10][10];
  int16_t r5[10][10][10];
  int16_t r6[10][10];
  Mr102Rev() {
    std::memset(r4, -1, sizeof(r4));
    std::memset(r5, -1, sizeof(r5));
    std::memset(r6, -1, sizeof(r6));
    for (int i = 1023; i >= 0; i--) {
      const int8_t* t = kMr102T4[i];
      r4[t[0]][t[1]][t[2]] = (int16_t)i;
      const int8_t* u = kMr102T5[i];
      r5[u[0]][u[1]][u[2]] = (int16_t)i;
    }
    for (int i = 127; i >= 0; i--)
      r6[kMr102T6[i][0]][kMr102T6[i][1]] = (int16_t)i;
  }
};
const Mr102Rev kRev;

void search_10k2(const double* x2, const double* hs, int fields[7]) {
  /* basis: y_p = (kernel circularly shifted to p) convolved with hs */
  static thread_local double Y[kSub][kSub], phi[kSub][kSub];
  for (int p = 0; p < kSub; p++)
    for (int n = 0; n < kSub; n++) {
      double sum = 0;
      for (int m = 0; m <= n; m++)
        sum += kMr102Kernel[(m - p + kSub) % kSub] * hs[n - m];
      Y[p][n] = sum;
    }
  double d[kSub];
  for (int p = 0; p < kSub; p++) {
    double sum = 0;
    for (int n = 0; n < kSub; n++) sum += Y[p][n] * x2[n];
    d[p] = sum;
  }
  for (int p = 0; p < kSub; p++)
    for (int q = p; q < kSub; q++) {
      double sum = 0;
      for (int n = 0; n < kSub; n++) sum += Y[p][n] * Y[q][n];
      phi[p][q] = phi[q][p] = sum;
    }
  double pc[kSub] = {0};
  double dc = 0, den = 0;
  int pos[8];
  double sgn[8];
  auto place = [&](int j, int t) {
    double bbest = -1e30;
    int bp = t;
    double bs = 1.0;
    for (int p = t; p < kSub; p += 4)
      for (int si = 0; si < 2; si++) {
        double s = si ? -1.0 : 1.0;
        double nm = dc + s * d[p];
        double dn = den + 2 * s * pc[p] + phi[p][p];
        double sc = nm * nm / std::max(dn, 1e-12);
        if (sc > bbest) {
          bbest = sc;
          bp = p;
          bs = s;
        }
      }
    dc += bs * d[bp];
    den += 2 * bs * pc[bp] + phi[bp][bp];
    for (int i = 0; i < kSub; i++) pc[i] += bs * phi[bp][i];
    pos[j] = bp;
    sgn[j] = bs;
  };
  auto remove = [&](int j) {
    int p = pos[j];
    double s = sgn[j];
    dc -= s * d[p];
    for (int i = 0; i < kSub; i++) pc[i] -= s * phi[p][i];
    den -= 2 * s * pc[p] + phi[p][p];
  };
  for (int r = 0; r < 2; r++)
    for (int t = 0; t < 4; t++) place(4 * r + t, t);
  for (int sweep = 0; sweep < 3; sweep++)
    for (int j = 0; j < 8; j++) {
      remove(j);
      place(j, j % 4);
    }
  if (dc < 0)
    for (int j = 0; j < 8; j++) sgn[j] = -sgn[j];
  /* per track: ordered pair + sign bit (second flips iff lower pos) */
  int first[4], second[4];
  int signs = 0;
  for (int t = 0; t < 4; t++) {
    int jA = (pos[t] - t) / 4, jB = (pos[t + 4] - t) / 4;
    double sA = sgn[t], sB = sgn[t + 4];
    double s;
    if (sA == sB) {
      first[t] = std::min(jA, jB);
      second[t] = std::max(jA, jB);
      s = sA;
    } else if (jA > jB) {
      first[t] = jA;
      second[t] = jB;
      s = sA;
    } else {
      first[t] = jB;
      second[t] = jA;
      s = sB;
    }
    if (s < 0) signs |= 1 << t;
  }
  fields[4] = kRev.r4[first[0]][second[0]][first[1]];
  fields[5] = kRev.r5[first[2]][second[2]][second[1]];
  fields[6] = kRev.r6[first[3]][second[3]];
  for (int t = 0; t < 4; t++) fields[t] = (signs >> t) & 1;
  /* joint tables cover all ordered pairs; guard against a hole */
  for (int j = 4; j < 7; j++)
    if (fields[j] < 0) fields[j] = 0;
}

/* -------------------------------------------------- subframe commit */
void enc_commit(LowEncState* st, const double* a_q, const double* v,
                const double* code_s, double gp, double gc) {
  st->dec.gp_prev = gp;
  double exc[kSub];
  for (int n = 0; n < kSub; n++) exc[n] = gp * v[n] + gc * code_s[n];
  std::memmove(st->dec.exc, st->dec.exc + kSub,
               sizeof(double) * (154 - kSub));
  for (int n = 0; n < kSub; n++)
    st->dec.exc[154 - kSub + n] = std::trunc(exc[n] * 16384.0) / 16384.0;
  double w1[10], w2[10];
  for (int i = 0; i < 10; i++) {
    w1[i] = a_q[i] * std::pow(kG1, i + 1);
    w2[i] = a_q[i] * std::pow(kG2, i + 1);
  }
  double syn[kSub], qt[kSub], dummy[kSub];
  iir10(exc, kSub, a_q, st->synth_mem, syn);
  fir10(syn, kSub, w1, st->wqn_mem, qt);
  iir10(qt, kSub, w2, st->wqd_mem, dummy);
}

struct JointInfo {
  double gc0, e_yy, e_xy, e_y2y2, e_y1y2, e_xy2;
};

/* Search + (for non-joint modes) quantize + commit one subframe.
 * Returns via *ji when joint (MR475): gains deferred to the pair. */
void enc_subframe(int mode, LowEncState* st, Bits* bits, int k,
                  const double* frame, const double* a_q, int T_op,
                  bool joint, JointInfo* ji) {
  const LowModeMap& M = kLowModes[mode];
  double h[kSub];
  weighted_ir(a_q, kG1, kG2, h);
  const double* sub = frame + kSub * k;
  double w1[10], w2[10];
  for (int i = 0; i < 10; i++) {
    w1[i] = a_q[i] * std::pow(kG1, i + 1);
    w2[i] = a_q[i] * std::pow(kG2, i + 1);
  }
  double t1[kSub], sw[kSub];
  fir10(sub, kSub, w1, st->wn_mem, t1);
  iir10(t1, kSub, w2, st->wd_mem, sw);
  double zeros[kSub] = {0}, zir_s[kSub], zt[kSub], zw[kSub];
  double msyn[10], mn[10], md[10];
  std::memcpy(msyn, st->synth_mem, sizeof(msyn));
  std::memcpy(mn, st->wqn_mem, sizeof(mn));
  std::memcpy(md, st->wqd_mem, sizeof(md));
  iir10(zeros, kSub, a_q, msyn, zir_s);
  fir10(zir_s, kSub, w1, mn, zt);
  iir10(zt, kSub, w2, md, zw);
  double x[kSub];
  for (int n = 0; n < kSub; n++) x[n] = sw[n] - zw[n];

  /* ---- adaptive codebook */
  double best = -1e30;
  int bidx = -1, bT0 = 20;
  double bv[kSub], by1[kSub];
  auto try_cand = [&](int idx, int T0, int frac) {
    double v[kSub], y1[kSub];
    pred_lt_3(st->dec.exc, T0, frac, v);
    conv_h(v, h, y1);
    double dn = 0, nm = 0;
    for (int n = 0; n < kSub; n++) {
      dn += y1[n] * y1[n];
      nm += x[n] * y1[n];
    }
    double sc = dn < 1e-14 ? -1e29 : (nm > 0 ? nm * nm / dn : nm * 1e-6);
    if (bidx < 0 || sc > best) {
      best = sc;
      bidx = idx;
      bT0 = T0;
      std::memcpy(bv, v, sizeof(v));
      std::memcpy(by1, y1, sizeof(y1));
    }
  };
  int nb = M.lag[k].len;
  if (nb == 8) {
    for (int T0 = std::max(20, T_op - 5); T0 <= std::min(143, T_op + 5);
         T0++) {
      if (T0 <= 84) {
        for (int frac = -1; frac <= 1; frac++) {
          int i = 3 * (T0 - 19) + frac - 1;
          if (i >= 0 && i < 197) {
            int dT, df;
            dec_lag3_abs(i, &dT, &df);
            try_cand(i, dT, df);
          }
        }
      } else {
        int dT, df;
        dec_lag3_abs(T0 + 112, &dT, &df);
        try_cand(T0 + 112, dT, df);
      }
    }
  } else {
    for (int i = 0; i < (1 << nb); i++) {
      int dT, df;
      dec_lag3_rel(i, st->dec.t0_prev, nb, &dT, &df);
      if (dT >= 20 && dT <= 143) try_cand(i, dT, df);
    }
  }
  bits->put16(M.lag[k].pos, nb, bidx);
  st->dec.t0_prev = bT0;

  double e_yy = 0, e_xy = 0;
  for (int n = 0; n < kSub; n++) {
    e_yy += by1[n] * by1[n];
    e_xy += x[n] * by1[n];
  }
  double gp_unq = std::min(std::max(e_xy / std::max(e_yy, 1e-12), 0.0),
                           1.2);

  /* ---- fixed codebook (sharpening from the PREVIOUS subframe's
   * decoded pitch gain, folded into the search IR) */
  double x2[kSub], hs[kSub];
  for (int n = 0; n < kSub; n++) x2[n] = x[n] - gp_unq * by1[n];
  std::memcpy(hs, h, sizeof(hs));
  double sharp = std::min(std::max(st->dec.gp_prev, 0.0), kSharpMaxLow);
  if (bT0 < kSub)
    for (int n = bT0; n < kSub; n++) hs[n] += sharp * hs[n - bT0];
  double code[kSub];
  if (mode == 6) {
    int fields[7];
    search_10k2(x2, hs, fields);
    for (int j = 0; j < 7; j++)
      bits->put16(M.pulse[j][k].pos, M.pulse[j][k].len, fields[j]);
    double plain[kSub];
    pulses_10k2(fields[4], fields[5], fields[6],
                fields[0] | (fields[1] << 1) | (fields[2] << 2) |
                    (fields[3] << 3),
                plain);
    circ_conv40(plain, kMr102Kernel, code);
  } else {
    static thread_local double phi[kSub][kSub];
    double d[kSub];
    corr_d(x2, hs, d);
    autocorr_phi(hs, phi);
    int pos_field, sign_field;
    switch (mode) {
      case 0:
      case 1:
        search_2_9bit(k, d, phi, &pos_field, &sign_field);
        break;
      case 2:
        search_5k9(d, phi, &pos_field, &sign_field);
        break;
      case 3:
        search_6k7(d, phi, &pos_field, &sign_field);
        break;
      default:
        search_7k4(d, phi, &pos_field, &sign_field);
    }
    bits->put16(M.pulse[0][k].pos, M.pulse[0][k].len, pos_field);
    bits->put16(M.pulse[1][k].pos, M.pulse[1][k].len, sign_field);
    build_code(mode, *bits, M, k, code);
  }
  double code_s[kSub];
  std::memcpy(code_s, code, sizeof(code_s));
  if (bT0 < kSub)
    for (int n = bT0; n < kSub; n++) code_s[n] += sharp * code_s[n - bT0];
  double y2[kSub];
  conv_h(code_s, h, y2);

  /* ---- gains */
  double gc0 = gc_base(mode, st->dec, code_s);
  double e_y2y2 = 0, e_y1y2 = 0, e_xy2 = 0;
  for (int n = 0; n < kSub; n++) {
    e_y2y2 += y2[n] * y2[n];
    e_y1y2 += by1[n] * y2[n];
    e_xy2 += x[n] * y2[n];
  }

  if (joint) {
    /* MR475: defer gain quantization to the pair; commit tentatively
     * with unquantized gains and a NEUTRAL predictor push (corr=1). */
    double gc_unq =
        std::max((e_xy2 - gp_unq * e_y1y2) / std::max(e_y2y2, 1e-12), 0.0);
    push_pred(&st->dec, 1.0);
    enc_commit(st, a_q, bv, code_s, gp_unq, gc_unq);
    ji->gc0 = gc0;
    ji->e_yy = e_yy;
    ji->e_xy = e_xy;
    ji->e_y2y2 = e_y2y2;
    ji->e_y1y2 = e_y1y2;
    ji->e_xy2 = e_xy2;
    return;
  }

  double gp, gc, corr;
  if (mode == 5) { /* 7k95: scalar gp then gc ladder */
    int gp_idx = 0;
    double be = 1e30;
    for (int i = 0; i < 16; i++) {
      double g = kQuaGainPitchQ14[i] / 16384.0;
      double e = e_yy * g * g - 2 * e_xy * g;
      if (e < be) {
        be = e;
        gp_idx = i;
      }
    }
    gp = kQuaGainPitchQ14[gp_idx] / 16384.0;
    double c1 = e_xy2 - gp * e_y1y2;
    int gc_idx = 0;
    be = 1e30;
    for (int i = 0; i < 32; i++) {
      double g = gc0 * 2.0 * amrnb::kQuaGainCode[i];
      double e = e_y2y2 * g * g - 2 * c1 * g;
      if (e < be) {
        be = e;
        gc_idx = i;
      }
    }
    gc = gc0 * 2.0 * amrnb::kQuaGainCode[gc_idx];
    corr = 2.0 * amrnb::kQuaGainCode[gc_idx];
    bits->put16(M.pgain[k].pos, M.pgain[k].len, gp_idx);
    bits->put16(M.fgain[k].pos, M.fgain[k].len, gc_idx);
  } else {
    const int16_t(*tab)[2] = (mode >= 3) ? kGainsHigh : kGainsLow;
    int rows = (mode >= 3) ? 128 : 64;
    int gi = 0;
    double be = 1e30;
    for (int i = 0; i < rows; i++) {
      double g = tab[i][0] / 16384.0;
      double c = gc0 * tab[i][1] / 2048.0;
      double e = g * g * e_yy + c * c * e_y2y2 + 2 * g * c * e_y1y2 -
                 2 * g * e_xy - 2 * c * e_xy2;
      if (e < be) {
        be = e;
        gi = i;
      }
    }
    gp = tab[gi][0] / 16384.0;
    gc = gc0 * tab[gi][1] / 2048.0;
    corr = tab[gi][1] / 2048.0;
    bits->put16(M.pgain[k].pos, M.pgain[k].len, gi);
  }
  push_pred(&st->dec, corr);
  enc_commit(st, a_q, bv, code_s, gp, gc);
}

int joint_gain_pick(const JointInfo& i0, const JointInfo& i1) {
  int bi = 0;
  double be = 1e30;
  for (int r = 0; r < 256; r++) {
    double g0 = kGains475[r][0] / 16384.0;
    double c0 = kGains475[r][1] / 2048.0;
    double g1 = kGains475[r][2] / 16384.0;
    double c1 = kGains475[r][3] / 2048.0;
    double gc0 = i0.gc0 * c0;
    /* predictor coupling: sf1's base scales by corr0^MA[0] */
    double gc1 = i1.gc0 * std::pow(std::max(c0, 1e-6), 0.68) * c1;
    double e = g0 * g0 * i0.e_yy + gc0 * gc0 * i0.e_y2y2 +
               2 * g0 * gc0 * i0.e_y1y2 - 2 * g0 * i0.e_xy -
               2 * gc0 * i0.e_xy2;
    e += g1 * g1 * i1.e_yy + gc1 * gc1 * i1.e_y2y2 +
         2 * g1 * gc1 * i1.e_y1y2 - 2 * g1 * i1.e_xy - 2 * gc1 * i1.e_xy2;
    if (e < be) {
      be = e;
      bi = r;
    }
  }
  return bi;
}

/* Re-commit subframe k by DECODING its bits (MR475 replay after the
 * joint gain decision) — guarantees decoder-state mirroring. */
void enc_commit_from_bits(int mode, LowEncState* st, const Bits& bits,
                          int k, const double* a_q) {
  const LowModeMap& M = kLowModes[mode];
  int T0, frac;
  int lag_idx = bits.get16(M.lag[k].pos, M.lag[k].len);
  if (M.lag[k].len == 8)
    dec_lag3_abs(lag_idx, &T0, &frac);
  else
    dec_lag3_rel(lag_idx, st->dec.t0_prev, M.lag[k].len, &T0, &frac);
  st->dec.t0_prev = T0;
  double v[kSub], code[kSub];
  pred_lt_3(st->dec.exc, T0, frac, v);
  build_code(mode, bits, M, k, code);
  double sharp = std::min(std::max(st->dec.gp_prev, 0.0), kSharpMaxLow);
  if (T0 < kSub)
    for (int n = T0; n < kSub; n++) code[n] += sharp * code[n - T0];
  int rowi = bits.get16(M.pgain[2 * (k / 2)].pos, M.pgain[2 * (k / 2)].len);
  double gp, gc;
  gains_decode(mode, &st->dec, 0, 0, kGains475[rowi] + 2 * (k % 2), code,
               &gp, &gc);
  enc_commit(st, a_q, v, code, gp, gc);
}

void enc_frame_low(int mode, LowEncState* st, const double* frame,
                   Bits* bits) {
  const LowModeMap& M = kLowModes[mode];
  double buf[240];
  std::memcpy(buf, st->sp_mem, sizeof(double) * 80);
  std::memcpy(buf + 80, frame, sizeof(double) * kFrame);
  double a[10];
  lp_window(buf, 232, 8, a);
  double lsf[10];
  a_to_lsf_hz(a, lsf);
  std::sort(lsf, lsf + 10);
  int idx[3];
  double r_hz[10];
  lsf_quantize_3(mode, lsf, st->dec.past_r, idx, r_hz);
  double q_hz[10], lsp_new[10];
  for (int j = 0; j < 10; j++) {
    q_hz[j] = kMeanLsf3Hz[j] + r_hz[j] + kPredFac3[j] * st->dec.past_r[j];
    st->dec.past_r[j] = r_hz[j];
  }
  reorder_lsf(q_hz, 10);
  lsf_to_lsp(q_hz, lsp_new);
  for (int g = 0; g < 3; g++)
    bits->put16(M.lsf[g].pos, M.lsf[g].len, idx[g]);

  double lsps[4][10], a_qs[4][10];
  for (int k = 0; k < 4; k++) {
    double w = (k + 1) / 4.0;
    for (int i = 0; i < 10; i++)
      lsps[k][i] = (1.0 - w) * st->dec.past_lsp[i] + w * lsp_new[i];
    double lsp[10];
    std::memcpy(lsp, lsps[k], sizeof(lsp));
    sort_desc(lsp, 10);
    lsp_to_a(lsp, a_qs[k]);
  }
  std::memcpy(st->dec.past_lsp, lsp_new, sizeof(lsp_new));
  st->dec.first = false;

  /* open-loop pitch on perceptually weighted speech */
  double a_w[10], lspw[10];
  std::memcpy(lspw, lsp_new, sizeof(lspw));
  sort_desc(lspw, 10);
  lsp_to_a(lspw, a_w);
  double w1[10], w2[10];
  for (int i = 0; i < 10; i++) {
    w1[i] = a_w[i] * std::pow(kG1, i + 1);
    w2[i] = a_w[i] * std::pow(kG2, i + 1);
  }
  double t1[kFrame], swf[kFrame];
  fir10(frame, kFrame, w1, st->sw_in, t1);
  iir10(t1, kFrame, w2, st->sw_out, swf);
  std::memcpy(st->sw_in, frame + kFrame - 10, sizeof(double) * 10);
  std::memcpy(st->sw_out, swf + kFrame - 10, sizeof(double) * 10);
  int T_ops[2];
  T_ops[0] = open_loop(st->ol_hist, swf, 80, 20);
  std::memmove(st->ol_hist, st->ol_hist + 80, sizeof(double) * 63);
  std::memcpy(st->ol_hist + 63, swf, sizeof(double) * 80);
  T_ops[1] = open_loop(st->ol_hist, swf + 80, 80, 20);
  std::memmove(st->ol_hist, st->ol_hist + 80, sizeof(double) * 63);
  std::memcpy(st->ol_hist + 63, swf + 80, sizeof(double) * 80);

  if (mode == 0) {
    for (int half = 0; half < 2; half++) {
      int k0 = 2 * half, k1 = 2 * half + 1;
      PairSnap snap;
      take_snap(*st, &snap);
      JointInfo i0, i1;
      enc_subframe(mode, st, bits, k0, frame, a_qs[k0], T_ops[half], true,
                   &i0);
      enc_subframe(mode, st, bits, k1, frame, a_qs[k1], T_ops[half], true,
                   &i1);
      int row = joint_gain_pick(i0, i1);
      bits->put16(M.pgain[k0].pos, M.pgain[k0].len, row);
      restore_snap(snap, st);
      enc_commit_from_bits(mode, st, *bits, k0, a_qs[k0]);
      enc_commit_from_bits(mode, st, *bits, k1, a_qs[k1]);
    }
  } else {
    for (int k = 0; k < 4; k++)
      enc_subframe(mode, st, bits, k, frame, a_qs[k], T_ops[k / 2], false,
                   nullptr);
  }
  std::memcpy(st->sp_mem, frame + kFrame - 80, sizeof(double) * 80);
}

/* ============================================== DTX / SID ========== */
/* The reference's dtx-default AMR entries gate speech frames with VAD
 * and carry silence as SID comfort-noise updates + NO_DATA frames
 * (/root/reference/channel_simulation/simulated_channel.py:30-35 — the
 * `nodtx` strings are the exceptions). The in-image lavc amrnb decoder
 * REJECTS SID frames ("dtx mode is not implemented"), so this layer is
 * oracle-free by necessity: the framing follows RFC 4867/TS 26.101
 * (SID = frame type 8, 39 bits / 6 bytes; NO_DATA = type 15, TOC only)
 * but the SID payload layout and comfort-noise laws are our own.
 * Encoder and decoder share a deterministic CN excitation generator
 * (seeded LCG, advanced per CN frame), so the encoder's mirrored
 * decoder state stays in sync across silence runs and speech restarts
 * are clean. docs/CODECS.md carries the oracle caveat. */

constexpr int kSidBytes = 6;   /* TOC + 5 payload (39 bits) */
constexpr int kSidBits = 39;

struct CnState {
  double lsf_hz[10];   /* comfort-noise LP (quantized LSF) */
  double res_rms;      /* residual excitation RMS */
  uint32_t rng;        /* shared deterministic CN generator */
  bool valid;
  void reset() {
    for (int i = 0; i < 10; i++) lsf_hz[i] = 400.0 * (i + 1) / 1.1;
    res_rms = 0.0;
    rng = 0x1f2e3d4cu;
    valid = false;
  }
};

inline double cn_rand(uint32_t* s) { /* uniform in [-0.5, 0.5) */
  *s = *s * 1664525u + 1013904223u;
  return (double)(*s >> 8) / 16777216.0 - 0.5;
}

/* 6-bit log RMS grid: 1.5 dB steps from -96 dBFS */
inline int cn_energy_encode(double rms) {
  double db = 20.0 * std::log10(std::max(rms, 1e-7));
  int idx = (int)std::lround((db + 96.0) / 1.5);
  return std::min(std::max(idx, 0), 63);
}

inline double cn_energy_decode(int idx) {
  return std::pow(10.0, (idx * 1.5 - 96.0) / 20.0);
}

/* Comfort-noise frame: deterministic white excitation at the decoded
 * residual level through 1/A(CN-LSF), then the postfilter chain of the
 * active codec family. The generated excitation is returned so the
 * caller can push it into the adaptive-codebook history of whichever
 * codec states are live (speech restarts then see a sane state). */
void cn_frame(CnState* cn, double gn, double gd, ChainState* chain,
              double* out /*160 or null*/, double* exc_out /*160*/) {
  double lsp[10], a[10];
  lsf_to_lsp(cn->lsf_hz, lsp);
  sort_desc(lsp, 10);
  lsp_to_a(lsp, a);
  for (int k = 0; k < 4; k++) {
    double exc[kSub];
    double e = 0;
    for (int n = 0; n < kSub; n++) {
      /* sum of 3 uniforms: near-gaussian, var 1/4 */
      exc[n] = cn_rand(&cn->rng) + cn_rand(&cn->rng) + cn_rand(&cn->rng);
      e += exc[n] * exc[n];
    }
    double scale = cn->res_rms / std::max(std::sqrt(e / kSub), 1e-12);
    for (int n = 0; n < kSub; n++) exc[n] *= scale;
    std::memcpy(exc_out + kSub * k, exc, sizeof(exc));
    if (out) chain_subframe(exc, a, gn, gd, chain, out + kSub * k);
  }
}

/* push one frame of CN excitation into a low-mode core (truncated like
 * the speech feedback) and reset the sharpening driver */
void low_push_cn(LowDecCore* core, const double* exc160) {
  for (int k = 0; k < 4; k++) {
    std::memmove(core->exc, core->exc + kSub,
                 sizeof(double) * (154 - kSub));
    for (int n = 0; n < kSub; n++)
      core->exc[154 - kSub + n] =
          std::trunc(exc160[kSub * k + n] * 16384.0) / 16384.0;
  }
  core->gp_prev = 0.0;
}

/* SID payload: lsf0 8 | lsf1 9 | lsf2 9 | energy 6 | 8 spare bits,
 * MSB-first in natural order (own layout — no oracle, see above). */
void sid_pack(const int idx[3], int eidx, uint8_t* payload /*5*/) {
  uint64_t v = 0;
  v = (v << 8) | (unsigned)idx[0];
  v = (v << 9) | (unsigned)idx[1];
  v = (v << 9) | (unsigned)idx[2];
  v = (v << 6) | (unsigned)eidx;
  v <<= 8; /* 32 payload bits left-aligned in the 40-bit field */
  for (int i = 0; i < 5; i++)
    payload[i] = (uint8_t)((v >> (32 - 8 * i)) & 0xFF);
}

void sid_unpack(const uint8_t* payload, int idx[3], int* eidx) {
  uint64_t v = 0;
  for (int i = 0; i < 5; i++) v = (v << 8) | payload[i];
  v >>= 8; /* drop the spare bits */
  *eidx = (int)(v & 0x3F);
  idx[2] = (int)((v >> 6) & 0x1FF);
  idx[1] = (int)((v >> 15) & 0x1FF);
  idx[0] = (int)((v >> 24) & 0xFF);
}

/* Energy + hangover VAD (algorithmic-class: the 3GPP VAD1/VAD2 option
 * is far richer; what the channel simulation needs is the dtx FRAMING
 * behavior — speech gated, silence as SID/NO_DATA). */
struct VadState {
  double nf_db;
  int hang, burst;
  void reset() {
    nf_db = -70.0;
    hang = 0;
    burst = 0;
  }
  bool frame(const double* x /*160*/) {
    double e = 1e-12;
    for (int i = 0; i < kFrame; i++) e += x[i] * x[i];
    double edb = 10.0 * std::log10(e / kFrame);
    if (edb < nf_db)
      nf_db = edb;
    else
      nf_db = std::min(nf_db + 0.1, edb);
    /* Relative-SNR gate with only a deep -80 dBFS absolute floor so
     * quiet-but-valid speech survives the dtx-default path (round-4
     * advisor finding: a hard -55 dBFS floor replaced whole quiet
     * utterances with comfort noise); true digital silence still
     * never trips the gate. */
    bool raw = edb > nf_db + 9.0 && edb > -80.0;
    if (raw) {
      if (++burst >= 2) hang = 5;
      return true;
    }
    burst = 0;
    if (hang > 0) {
      hang--;
      return true;
    }
    return false;
  }
};

}  // namespace

extern "C" {

/* Encode 8 kHz float mono to AMR storage frames of the given mode
 * (0..6 low modes, 7 = 12.2 via amrnb_encode). RFC 4867 octet-aligned:
 * TOC (mode<<3)|0x04 + packed payload, kModeBytes[mode] bytes/frame.
 * Returns bytes written; size `out` as ceil(n/160)*kModeBytes[mode]. */
long amrnb_encode_mode(int mode, const float* in, size_t n, uint8_t* out) {
  if (mode < 0 || mode > 7) return -1;
  if (mode == 7) return amrnb_encode(in, n, out);
  LowEncState st;
  size_t frames = (n + kFrame - 1) / kFrame;
  double buf[kFrame];
  long w = 0;
  int fb = kModeBytes[mode];
  for (size_t f = 0; f < frames; f++) {
    for (int i = 0; i < kFrame; i++) {
      size_t idx = f * kFrame + i;
      buf[i] = idx < n ? in[idx] : 0.0;
    }
    Bits bits(kModeBits[mode]);
    enc_frame_low(mode, &st, buf, &bits);
    out[w] = (uint8_t)((mode << 3) | 0x04);
    pack_bits(bits, out + w + 1, fb - 1);
    w += fb;
  }
  return w;
}

/* Decode AMR storage frames of ANY frame type (per-frame TOC dispatch:
 * speech modes 0..7, SID = 8, NO_DATA = 15). Returns samples written
 * or -1 on a malformed frame type. */
long amrnb_decode_any(const uint8_t* data, size_t size, float* out,
                      size_t max_samples) {
  LowDecState st;
  st.reset();
  Amrnb122Dec* d122 = nullptr;
  CnState cn;
  cn.reset();
  int family = 0; /* 0 = low modes, 1 = MR122 (last speech frame seen) */
  size_t p = 0;
  long w = 0;
  long rc = 0;
  while (p < size) {
    int ft = (data[p] >> 3) & 0x0F;
    double o[kFrame];
    int fb;
    if (ft <= 6) {
      fb = kModeBytes[ft];
      if (p + (size_t)fb > size) break;
      Bits bits(kModeBits[ft]);
      unpack_bits(data + p + 1, &bits);
      decode_frame_low(ft, bits, &st, o);
      family = 0;
    } else if (ft == 7) {
      fb = kModeBytes[7];
      if (p + (size_t)fb > size) break;
      if (!d122) d122 = amrnb122_dec_new();
      Bits bits(kModeBits[7]);
      unpack_bits(data + p + 1, &bits);
      amrnb122_dec_frame(d122, bits, o);
      family = 1;
    } else if (ft == 8 || ft == 15) {
      fb = (ft == 8) ? kSidBytes : 1;
      if (p + (size_t)fb > size) break;
      if (ft == 8) {
        int idx[3], eidx;
        sid_unpack(data + p + 1, idx, &eidx);
        double r[10];
        for (int j = 0; j < 3; j++) r[j] = kLsf31[idx[0]][j] / 4.096;
        for (int j = 0; j < 3; j++) r[3 + j] = kLsf32[idx[1]][j] / 4.096;
        for (int j = 0; j < 4; j++) r[6 + j] = kLsf33[idx[2]][j] / 4.096;
        for (int j = 0; j < 10; j++) cn.lsf_hz[j] = kMeanLsf3Hz[j] + r[j];
        reorder_lsf(cn.lsf_hz, 10);
        cn.res_rms = cn_energy_decode(eidx);
        cn.valid = true;
      }
      double exc[kFrame];
      if (family == 1 && d122) {
        cn_frame(&cn, amrnb::kPfGn, amrnb::kPfGd, amrnb122_dec_chain(d122),
                 o, exc);
      } else {
        cn_frame(&cn, kLowPfGn, kLowPfGd, &st.chain, o, exc);
      }
      low_push_cn(&st.core, exc);
      if (d122) amrnb122_dec_push_cn(d122, exc);
    } else {
      rc = -1;
      break;
    }
    for (int i = 0; i < kFrame && (size_t)w < max_samples; i++)
      out[w++] = (float)o[i];
    p += fb;
  }
  if (d122) amrnb122_dec_free(d122);
  return rc < 0 ? rc : w;
}

/* Full 8 kHz round trip (encode -> decode) at the given mode. */
void amrnb_roundtrip_mode(int mode, const float* in, float* out,
                          size_t n) {
  size_t frames = (n + kFrame - 1) / kFrame;
  int fb = (mode >= 0 && mode <= 7) ? kModeBytes[mode] : 32;
  std::vector<uint8_t> bs(frames * fb);
  long nb = amrnb_encode_mode(mode, in, n, bs.data());
  if (nb < 0) {
    std::memset(out, 0, sizeof(float) * n);
    return;
  }
  std::vector<float> dec(frames * kFrame);
  long ns = amrnb_decode_any(bs.data(), (size_t)nb, dec.data(), dec.size());
  for (size_t i = 0; i < n; i++) out[i] = i < (size_t)ns ? dec[i] : 0.0f;
}

/* DTX encode: VAD-gated speech frames; silence runs carry a SID
 * comfort-noise update at onset and every 8th frame, NO_DATA (TOC
 * only) otherwise — matching the reference's dtx-default amr entries
 * (/root/reference/channel_simulation/simulated_channel.py:30-35).
 * Size `out` as ceil(n/160)*kModeBytes[mode] (worst case all-speech).
 * NOTE: the in-image lavc amrnb decoder rejects SID frames ("dtx mode
 * is not implemented"), so DTX streams decode with amrnb_decode_any
 * but NOT with lavc — an oracle-free tier, documented in
 * docs/CODECS.md. */
long amrnb_encode_dtx(int mode, const float* in, size_t n, uint8_t* out) {
  if (mode < 0 || mode > 7) return -1;
  LowEncState low;
  Amrnb122Enc* e122 = (mode == 7) ? amrnb122_enc_new() : nullptr;
  VadState vad;
  vad.reset();
  CnState cn;
  cn.reset();
  double spm[80] = {0}; /* DTX-local LP memory for SID analysis */
  int since_sid = 1 << 20;
  size_t frames = (n + kFrame - 1) / kFrame;
  double buf[kFrame];
  long w = 0;
  for (size_t f = 0; f < frames; f++) {
    for (int i = 0; i < kFrame; i++) {
      size_t idx = f * kFrame + i;
      buf[i] = idx < n ? in[idx] : 0.0;
    }
    if (vad.frame(buf)) {
      if (mode == 7) {
        Bits bits(kModeBits[7]);
        amrnb122_enc_frame(e122, buf, &bits);
        out[w] = (7 << 3) | 0x04;
        pack_bits(bits, out + w + 1, kModeBytes[7] - 1);
        w += kModeBytes[7];
      } else {
        Bits bits(kModeBits[mode]);
        enc_frame_low(mode, &low, buf, &bits);
        out[w] = (uint8_t)((mode << 3) | 0x04);
        pack_bits(bits, out + w + 1, kModeBytes[mode] - 1);
        w += kModeBytes[mode];
      }
      since_sid = 1 << 20;
    } else {
      if (since_sid >= 8) {
        /* SID: quantize this frame's LSF (absolute 3-split) + residual
         * energy */
        double b240[240];
        std::memcpy(b240, spm, sizeof(spm));
        std::memcpy(b240 + 80, buf, sizeof(buf));
        double a[10], lsf[10];
        lp_window(b240, 232, 8, a);
        a_to_lsf_hz(a, lsf);
        std::sort(lsf, lsf + 10);
        int idx[3] = {0, 0, 0};
        double tgt[10];
        for (int j = 0; j < 10; j++) tgt[j] = lsf[j] - kMeanLsf3Hz[j];
        const struct {
          const int16_t* tab;
          int rows, width, off;
        } gs[3] = {{&kLsf31[0][0], 256, 3, 0},
                   {&kLsf32[0][0], 512, 3, 3},
                   {&kLsf33[0][0], 512, 4, 6}};
        double r_sel[10];
        for (int g = 0; g < 3; g++) {
          double be = 1e30;
          for (int i = 0; i < gs[g].rows; i++) {
            const int16_t* row = gs[g].tab + (size_t)i * gs[g].width;
            double e = 0;
            for (int j = 0; j < gs[g].width; j++) {
              double dd = row[j] / 4.096 - tgt[gs[g].off + j];
              e += dd * dd;
            }
            if (e < be) {
              be = e;
              idx[g] = i;
            }
          }
          const int16_t* row = gs[g].tab + (size_t)idx[g] * gs[g].width;
          for (int j = 0; j < gs[g].width; j++)
            r_sel[gs[g].off + j] = row[j] / 4.096;
        }
        /* residual RMS through A(z) over this frame */
        double e = 1e-12;
        for (int i = 0; i < kFrame; i++) {
          double s = buf[i];
          for (int j = 0; j < 10; j++)
            s += a[j] * ((i - 1 - j >= 0) ? buf[i - 1 - j]
                                          : spm[80 + (i - 1 - j)]);
          e += s * s;
        }
        int eidx = cn_energy_encode(std::sqrt(e / kFrame));
        out[w] = (8 << 3) | 0x04;
        sid_pack(idx, eidx, out + w + 1);
        w += kSidBytes;
        /* mirror the decoder's CN parameter update (quantized) */
        for (int j = 0; j < 10; j++)
          cn.lsf_hz[j] = kMeanLsf3Hz[j] + r_sel[j];
        reorder_lsf(cn.lsf_hz, 10);
        cn.res_rms = cn_energy_decode(eidx);
        cn.valid = true;
        since_sid = 0;
      } else {
        out[w++] = (15 << 3) | 0x04; /* NO_DATA: TOC only */
        since_sid++;
      }
      /* advance the shared CN generator on the encoder mirror */
      double exc[kFrame];
      cn_frame(&cn, kLowPfGn, kLowPfGd, nullptr, nullptr, exc);
      if (mode == 7)
        amrnb122_enc_push_cn(e122, exc);
      else
        low_push_cn(&low.dec, exc);
      /* keep the low encoder's LP memory warm across silence */
      if (mode != 7)
        std::memcpy(low.sp_mem, buf + kFrame - 80, sizeof(double) * 80);
    }
    std::memcpy(spm, buf + kFrame - 80, sizeof(spm));
  }
  if (e122) amrnb122_enc_free(e122);
  return w;
}

/* Full 8 kHz round trip with DTX framing. */
void amrnb_roundtrip_dtx(int mode, const float* in, float* out, size_t n) {
  size_t frames = (n + kFrame - 1) / kFrame;
  int fb = (mode >= 0 && mode <= 7) ? kModeBytes[mode] : 32;
  std::vector<uint8_t> bs(frames * fb);
  long nb = amrnb_encode_dtx(mode, in, n, bs.data());
  if (nb < 0) {
    std::memset(out, 0, sizeof(float) * n);
    return;
  }
  std::vector<float> dec(frames * kFrame);
  long ns = amrnb_decode_any(bs.data(), (size_t)nb, dec.data(), dec.size());
  for (size_t i = 0; i < n; i++) out[i] = i < (size_t)ns ? dec[i] : 0.0f;
}

} /* extern "C" */
