/* AMR-NB MR122 (12.2 kbps) codec — real 3GPP-interoperable bitstreams.
 *
 * The reference's cellular tier runs real AMR through the external
 * acoustic-simulator (/root/reference/channel_simulation/
 * simulated_channel.py:30-33). This file implements the 12.2 kbps mode
 * from scratch against tables and decode laws recovered by black-box
 * probing of the in-image lavc `amrnb` decoder (tools/amr_tables/,
 * FACTS.md): split-matrix LSF codebooks, pitch/code gain tables, the
 * 244-bit storage order, the b60 fractional interpolator, the
 * synthesis-path pitch emphasis, and the decoder's feedback truncation.
 * Streams use RFC 4867 octet-aligned storage framing (TOC 0x3C + 31
 * payload bytes per frame) and decode on libavcodec's amrnb decoder;
 * conformance is pinned by tests/test_amr_conformance.py.
 *
 * Encoder: classic analysis-by-synthesis CELP (LP analysis, weighted-
 * domain target, fractional closed-loop pitch over the decoded lag laws,
 * 10-pulse interleaved-track ACELP search, predictor-quantized gains)
 * with a mirrored decoder state, ported from tools/amr_tables/
 * amrnb_enc.py. Shared CELP primitives live in amrnb_celp.h; the
 * low-rate modes 0..6 are in amrnb_low.cc.
 */

#include <algorithm>
#include <cmath>
#include <cstddef>
#include <cstdint>
#include <cstring>
#include <vector>

#include "amrnb_celp.h"
#include "amrnb_tables.h"
#include "augment.h"

namespace {

using namespace amrnb;
using namespace amrnb_celp;

constexpr int kBits = 244;
constexpr int kFrameBytes = 32; /* TOC + 31 payload */
constexpr double kG1 = 0.9, kG2 = 0.6; /* encoder weighting */

/* ------------------------------------------------------ decoder state */
struct DecState {
  double past_r[10];   /* LSF MA predictor residual (Hz) */
  double past_lsp[10]; /* previous frame q2 (cos domain) */
  double exc[154];     /* adaptive codebook history */
  double ener_pred[4]; /* gc predictor (dB), newest first */
  int t0_prev;
  ChainState chain; /* postfilter chain + output HP */
  bool first;
  DecState() { reset(); }
  void reset() {
    std::memset(this, 0, sizeof(*this));
    t0_prev = 18;
    first = true;
    for (int i = 0; i < 4; i++) ener_pred[i] = kEnerInit;
  }
};

void lsf_decode(const Bits& bits, DecState* st, double* lsf1, double* lsf2) {
  static const int* kGroups[5] = {kLsfBits0, kLsfBits1, kLsfBits2,
                                  kLsfBits3, kLsfBits4};
  static const int kGroupLen[5] = {7, 8, 9, 8, 6};
  static const int16_t (*kTabs[5])[4] = {kLsfTable0, kLsfTable1, kLsfTable2,
                                         kLsfTable3, kLsfTable4};
  double r2sel[10];
  for (int g = 0; g < 5; g++) {
    int v = bits.get(kGroups[g], kGroupLen[g]);
    double sgn = 1.0;
    if (g == 2) {
      if (v & 256) sgn = -1.0;
      v &= 255;
    }
    const int16_t* row = kTabs[g][v];
    for (int j = 0; j < 2; j++) {
      double base = kMeanLsfHz[2 * g + j] +
                    kLsfPredFac * st->past_r[2 * g + j];
      lsf1[2 * g + j] = base + sgn * row[j] / 4.096;
      lsf2[2 * g + j] = base + sgn * row[2 + j] / 4.096;
      r2sel[2 * g + j] = sgn * row[2 + j] / 4.096;
    }
  }
  std::memcpy(st->past_r, r2sel, sizeof(r2sel));
  reorder_lsf(lsf1, 10);
  reorder_lsf(lsf2, 10);
}

void dec_lag6_abs(int index, int* T0, int* frac) {
  if (index < 463) {
    *T0 = (index + 5) / 6 + 17;
    *frac = index - 6 * (*T0 - 17) + 3;
  } else {
    *T0 = index - 368;
    *frac = 0;
  }
}

void dec_lag6_rel(int index, int t0_prev, int* T0, int* frac) {
  int t0min = t0_prev - 5;
  if (t0min < 18) t0min = 18;
  if (t0min > 134) t0min = 134;
  int i = (index + 5) / 6;
  *T0 = t0min + i - 1;
  *frac = index - 6 * i + 3;
}

void decode_positions(const int* pv /*10*/, const int* sv /*5*/,
                      double* code) {
  std::memset(code, 0, sizeof(double) * kSub);
  int pos[10];
  for (int j = 0; j < 10; j++) pos[j] = (j % 5) + 5 * kDGray[pv[j]];
  for (int t = 0; t < 5; t++) {
    double s = sv[t] ? -1.0 : 1.0;
    int p0 = pos[t], p1 = pos[t + 5];
    code[p0] += s;
    code[p1] += (p1 >= p0) ? s : -s;
  }
}

/* ------------------------------------------------------ frame decode */
const double kLspInit[10] = {30000 / 32768.0,  26000 / 32768.0,
                             21000 / 32768.0,  15000 / 32768.0,
                             8000 / 32768.0,   0.0,
                             -8000 / 32768.0,  -15000 / 32768.0,
                             -21000 / 32768.0, -26000 / 32768.0};

struct SubframeParams {
  int T0, frac, gp_idx, gc_idx;
  double gp, gc;
  double v[kSub], code[kSub]; /* code = sharpened */
};

void decode_subframe_params(const Bits& bits, int k, DecState* st,
                            SubframeParams* sp) {
  static const int* kLags[4] = {kLagBits0, kLagBits1, kLagBits2, kLagBits3};
  static const int kLagLen[4] = {9, 6, 9, 6};
  int lag = bits.get(kLags[k], kLagLen[k]);
  if (k == 0 || k == 2)
    dec_lag6_abs(lag, &sp->T0, &sp->frac);
  else
    dec_lag6_rel(lag, st->t0_prev, &sp->T0, &sp->frac);
  st->t0_prev = sp->T0;
  pred_lt_6(st->exc, sp->T0, sp->frac, sp->v);
  sp->gp_idx = bits.get(kGpBits[k], 4);
  sp->gp = kQuaGainPitch[sp->gp_idx];
  int pv[10], sv[5];
  for (int j = 0; j < 10; j++) {
    const int* f = &kPosBits[k][3 * j];
    int raw = bits.b[f[2]] * 4 + bits.b[f[1]] * 2 + bits.b[f[0]];
    pv[j] = raw;
  }
  for (int i = 0; i < 5; i++) sv[i] = bits.b[kSignBits[k][i]];
  decode_positions(pv, sv, sp->code);
  double sharp = std::min(sp->gp, 1.0);
  if (sp->T0 < kSub)
    for (int n = sp->T0; n < kSub; n++)
      sp->code[n] += sharp * sp->code[n - sp->T0];
  double ec = 0;
  for (int n = 0; n < kSub; n++) ec += sp->code[n] * sp->code[n];
  double ec_db = 10.0 * std::log10(std::max(ec, 1e-12) / kSub);
  double ep = 0;
  for (int i = 0; i < 4; i++) ep += kPredMa[i] * st->ener_pred[i];
  double gc0 = std::pow(10.0, 0.05 * (ep + kMeanEner - ec_db)) / 16384.0;
  sp->gc_idx = bits.get(kGcBits[k], 5);
  sp->gc = gc0 * kQuaGainCode[sp->gc_idx];
  for (int i = 3; i > 0; i--) st->ener_pred[i] = st->ener_pred[i - 1];
  st->ener_pred[0] = 20.0 * std::log10(kQuaGainCode[sp->gc_idx]);
}

void commit_subframe(DecState* st, const SubframeParams& sp,
                     const double* a, double* out /*40 or null*/) {
  double exc[kSub], exc_syn[kSub];
  for (int n = 0; n < kSub; n++)
    exc[n] = sp.gp * sp.v[n] + sp.gc * sp.code[n];
  std::memcpy(exc_syn, exc, sizeof(exc));
  if (sp.gp > 0.5) { /* synthesis-path pitch emphasis */
    double e0 = 0, pf = sp.gp * 0.25 * std::min(sp.gp, 1.0);
    for (int n = 0; n < kSub; n++) e0 += exc[n] * exc[n];
    double e2[kSub], s2 = 0;
    for (int n = 0; n < kSub; n++) {
      e2[n] = exc[n] + pf * sp.v[n];
      s2 += e2[n] * e2[n];
    }
    if (s2 > 0) {
      double s = std::sqrt(e0 / s2);
      for (int n = 0; n < kSub; n++) exc_syn[n] = e2[n] * s;
    }
  }
  /* feedback history: plain excitation TRUNCATED toward zero at the
   * oracle's internal unit of 2/32768 output (FACTS.md) */
  std::memmove(st->exc, st->exc + kSub, sizeof(double) * (154 - kSub));
  for (int n = 0; n < kSub; n++)
    st->exc[154 - kSub + n] = std::trunc(exc[n] * 16384.0) / 16384.0;
  if (out) chain_subframe(exc_syn, a, kPfGn, kPfGd, &st->chain, out);
}

void frame_lsps(const Bits& bits, DecState* st, double lsps[4][10]) {
  double lsf1[10], lsf2[10], l1[10], l2[10];
  lsf_decode(bits, st, lsf1, lsf2);
  lsf_to_lsp(lsf1, l1);
  lsf_to_lsp(lsf2, l2);
  const double* past = st->first ? kLspInit : st->past_lsp;
  for (int i = 0; i < 10; i++) {
    lsps[0][i] = 0.5 * past[i] + 0.5 * l1[i];
    lsps[1][i] = l1[i];
    lsps[2][i] = 0.5 * l1[i] + 0.5 * l2[i];
    lsps[3][i] = l2[i];
  }
  std::memcpy(st->past_lsp, l2, sizeof(l2));
  st->first = false;
}

void decode_frame(const Bits& bits, DecState* st, double* out /*160*/) {
  double lsps[4][10];
  frame_lsps(bits, st, lsps);
  for (int k = 0; k < 4; k++) {
    double lsp[10], a[10];
    std::memcpy(lsp, lsps[k], sizeof(lsp));
    sort_desc(lsp, 10);
    lsp_to_a(lsp, a);
    SubframeParams sp;
    decode_subframe_params(bits, k, st, &sp);
    commit_subframe(st, sp, a, out + kSub * k);
  }
}

/* =================================================== encoder ======= */
struct EncState {
  DecState dec;             /* mirrored decoder-side state */
  double sp_mem[80];        /* past input for LP windows */
  double ol_hist[143];      /* open-loop pitch history */
  double synth_mem[10];     /* 1/A_q over quantized excitation */
  double wn_mem[10], wd_mem[10];   /* weighting over input */
  double wqn_mem[10], wqd_mem[10]; /* weighting over quantized synth */
  double sw_in[10], sw_out[10];    /* open-loop weighting memories */
  /* zero everything from sp_mem onward — offsetof, not sizeof(dec), so
     any padding the compiler inserts after `dec` can't push the write
     past the end of the object */
  EncState() {
    std::memset(sp_mem, 0, sizeof(*this) - offsetof(EncState, sp_mem));
  }
};

void lp_analysis(const double* frame, const double* mem, double a1[10],
                 double a2[10]) {
  double buf[240];
  std::memcpy(buf, mem, sizeof(double) * 80);
  std::memcpy(buf + 80, frame, sizeof(double) * kFrame);
  lp_window(buf, 160, 80, a1);
  lp_window(buf, 232, 8, a2);
}

void lsf_quantize(const double* lsf1, const double* lsf2, double* past_r,
                  int rows[5], double* q1, double* q2) {
  static const int16_t (*kTabs[5])[4] = {kLsfTable0, kLsfTable1, kLsfTable2,
                                         kLsfTable3, kLsfTable4};
  double sel[10];
  for (int g = 0; g < 5; g++) {
    double tgt[4];
    for (int j = 0; j < 2; j++) {
      double base = kMeanLsfHz[2 * g + j] + kLsfPredFac * past_r[2 * g + j];
      tgt[j] = lsf1[2 * g + j] - base;
      tgt[2 + j] = lsf2[2 * g + j] - base;
    }
    int n = kLsfRows[g];
    int bi = 0;
    double be = 1e30;
    double bsgn = 1.0;
    for (int i = 0; i < n; i++) {
      const int16_t* row = kTabs[g][i];
      double ep = 0, en = 0;
      for (int j = 0; j < 4; j++) {
        double rv = row[j] / 4.096;
        ep += (rv - tgt[j]) * (rv - tgt[j]);
        en += (rv + tgt[j]) * (rv + tgt[j]);
      }
      if (ep < be) {
        be = ep;
        bi = i;
        bsgn = 1.0;
      }
      if (g == 2 && en < be) {
        be = en;
        bi = i;
        bsgn = -1.0;
      }
    }
    rows[g] = g == 2 && bsgn < 0 ? (bi | 256) : bi;
    for (int j = 0; j < 2; j++) {
      double base = kMeanLsfHz[2 * g + j] + kLsfPredFac * past_r[2 * g + j];
      q1[2 * g + j] = base + bsgn * kTabs[g][bi][j] / 4.096;
      q2[2 * g + j] = base + bsgn * kTabs[g][bi][2 + j] / 4.096;
      sel[2 * g + j] = bsgn * kTabs[g][bi][2 + j] / 4.096;
    }
  }
  std::memcpy(past_r, sel, sizeof(sel));
  reorder_lsf(q1, 10);
  reorder_lsf(q2, 10);
}

void acelp_search(const double* x2, const double* h, double* code_out,
                  int* pos_vals, int* sgn_vals) {
  double d[kSub];
  for (int i = 0; i < kSub; i++) {
    double s = 0;
    for (int n = i; n < kSub; n++) s += x2[n] * h[n - i];
    d[i] = s;
  }
  static thread_local double phi[kSub][kSub];
  for (int i = 0; i < kSub; i++)
    for (int j = i; j < kSub; j++) {
      double s = 0;
      for (int n = j; n < kSub; n++) s += h[n - i] * h[n - j];
      phi[i][j] = phi[j][i] = s;
    }
  double code[kSub] = {0}, pc[kSub] = {0};
  double dc = 0, den = 0;
  int pos[10];
  double sgn[10];
  auto place = [&](int j, int t) {
    double bbest = -1e30;
    int bp = t;
    double bs = 1.0;
    for (int p = t; p < kSub; p += 5)
      for (int si = 0; si < 2; si++) {
        double s = si ? -1.0 : 1.0;
        double num = dc + s * d[p];
        double dn = den + 2 * s * pc[p] + phi[p][p];
        double sc = num * num / std::max(dn, 1e-12);
        if (sc > bbest) {
          bbest = sc;
          bp = p;
          bs = s;
        }
      }
    code[bp] += bs;
    dc += bs * d[bp];
    den += 2 * bs * pc[bp] + phi[bp][bp];
    for (int i = 0; i < kSub; i++) pc[i] += bs * phi[bp][i];
    pos[j] = bp;
    sgn[j] = bs;
  };
  auto remove = [&](int j) {
    int p = pos[j];
    double s = sgn[j];
    code[p] -= s;
    dc -= s * d[p];
    for (int i = 0; i < kSub; i++) pc[i] -= s * phi[p][i];
    den -= 2 * s * pc[p] + phi[p][p];
  };
  for (int r = 0; r < 2; r++)
    for (int t = 0; t < 5; t++) place(5 * r + t, t);
  for (int sweep = 0; sweep < 3; sweep++)
    for (int j = 0; j < 10; j++) {
      remove(j);
      place(j, j % 5);
    }
  /* decoded gains are always positive: if the greedy settled on an
   * anti-correlated pattern, its mirror (all signs flipped) scores
   * identically and correlates positively — use that one */
  if (dc < 0)
    for (int j = 0; j < 10; j++) sgn[j] = -sgn[j];
  std::memset(code_out, 0, sizeof(double) * kSub);
  for (int t = 0; t < 5; t++) {
    int pA = pos[t], pB = pos[t + 5];
    double sA = sgn[t], sB = sgn[t + 5];
    int p0, p1;
    double s0;
    if (sA == sB) {
      p0 = std::min(pA, pB);
      p1 = std::max(pA, pB);
      s0 = sA;
    } else if (pA > pB) {
      p0 = pA;
      p1 = pB;
      s0 = sA;
    } else {
      p0 = pB;
      p1 = pA;
      s0 = sB;
    }
    pos_vals[t] = (p0 - t) / 5;
    pos_vals[t + 5] = (p1 - t) / 5;
    sgn_vals[t] = s0 > 0 ? 0 : 1;
    code_out[p0] += s0;
    code_out[p1] += (p1 >= p0) ? s0 : -s0;
  }
}

void encode_subframe(EncState* st, Bits* bits, int k, const double* sub,
                     const double* a_q, int T_op) {
  static const int* kLags[4] = {kLagBits0, kLagBits1, kLagBits2, kLagBits3};
  static const int kLagLen[4] = {9, 6, 9, 6};
  DecState* dec = &st->dec;
  double w1[10], w2[10];
  for (int i = 0; i < 10; i++) {
    w1[i] = a_q[i] * std::pow(kG1, i + 1);
    w2[i] = a_q[i] * std::pow(kG2, i + 1);
  }
  double h[kSub];
  weighted_ir(a_q, kG1, kG2, h);

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

  /* adaptive search */
  double best = -1e30;
  int bidx = 0, bT0 = 18, bfrac = 0;
  double bv[kSub], by1[kSub];
  auto try_cand = [&](int idx, int T0, int frac) {
    double v[kSub], y1[kSub];
    pred_lt_6(dec->exc, T0, frac, v);
    conv_h(v, h, y1);
    double dn = 0, nm = 0;
    for (int n = 0; n < kSub; n++) {
      dn += y1[n] * y1[n];
      nm += x[n] * y1[n];
    }
    double sc = dn < 1e-14 ? -1e29 : (nm > 0 ? nm * nm / dn : nm * 1e-6);
    if (sc > best) {
      best = sc;
      bidx = idx;
      bT0 = T0;
      bfrac = frac;
      std::memcpy(bv, v, sizeof(v));
      std::memcpy(by1, y1, sizeof(y1));
    }
  };
  if (k == 0 || k == 2) {
    for (int T0 = std::max(18, T_op - 5); T0 <= std::min(143, T_op + 5);
         T0++)
      for (int frac = -3; frac <= 3; frac++) {
        int idx = (T0 - 17) * 6 + frac - 3;
        if (idx < 0 || idx >= 463) continue;
        int dT, df;
        dec_lag6_abs(idx, &dT, &df);
        try_cand(idx, dT, df);
      }
  } else {
    for (int idx = 0; idx < 64; idx++) {
      int dT, df;
      dec_lag6_rel(idx, dec->t0_prev, &dT, &df);
      if (dT >= 18 && dT <= 143) try_cand(idx, dT, df);
    }
  }
  bits->put(kLags[k], kLagLen[k], bidx);
  dec->t0_prev = bT0;

  double e_yy = 0, e_xy = 0;
  for (int n = 0; n < kSub; n++) {
    e_yy += by1[n] * by1[n];
    e_xy += x[n] * by1[n];
  }
  int gp_idx = 0;
  double gbest = 1e30;
  for (int i = 0; i < 16; i++) {
    double g = kQuaGainPitch[i];
    double e = e_yy * g * g - 2 * e_xy * g;
    if (e < gbest) {
      gbest = e;
      gp_idx = i;
    }
  }
  double gp = kQuaGainPitch[gp_idx];

  /* fixed codebook with sharpening folded into the search IR */
  double x2[kSub], hs[kSub];
  for (int n = 0; n < kSub; n++) x2[n] = x[n] - gp * by1[n];
  std::memcpy(hs, h, sizeof(hs));
  double sharp = std::min(gp, 1.0);
  if (bT0 < kSub)
    for (int n = bT0; n < kSub; n++) hs[n] += sharp * hs[n - bT0];
  double code[kSub];
  int pv[10], sv[5];
  acelp_search(x2, hs, code, pv, sv);
  for (int j = 0; j < 10; j++) {
    const int* f = &kPosBits[k][3 * j];
    int raw = 0;
    for (int r = 0; r < 8; r++)
      if (kDGray[r] == pv[j]) raw = r;
    bits->b[f[2]] = (raw >> 2) & 1;
    bits->b[f[1]] = (raw >> 1) & 1;
    bits->b[f[0]] = raw & 1;
  }
  for (int i = 0; i < 5; i++) bits->b[kSignBits[k][i]] = sv[i];

  auto sharpen = [&](double g, double* cs) {
    std::memcpy(cs, code, sizeof(double) * kSub);
    double b = std::min(g, 1.0);
    if (bT0 < kSub)
      for (int n = bT0; n < kSub; n++) cs[n] += b * cs[n - bT0];
  };
  double code_s[kSub], y2[kSub];
  sharpen(gp, code_s);
  conv_h(code_s, h, y2);
  double ep = 0;
  for (int i = 0; i < 4; i++) ep += kPredMa[i] * dec->ener_pred[i];
  auto pick_gc = [&](double g_pitch, const double* cs, const double* yy2,
                     int* gci, double* gc) {
    double ec = 0;
    for (int n = 0; n < kSub; n++) ec += cs[n] * cs[n];
    double ec_db = 10.0 * std::log10(std::max(ec, 1e-12) / kSub);
    double gc0 = std::pow(10.0, 0.05 * (ep + kMeanEner - ec_db)) / 16384.0;
    double e22 = 0, e12 = 0, ex2 = 0;
    for (int n = 0; n < kSub; n++) {
      e22 += yy2[n] * yy2[n];
      e12 += by1[n] * yy2[n];
      ex2 += x[n] * yy2[n];
    }
    double c1 = ex2 - g_pitch * e12;
    int bi = 0;
    double be = 1e30;
    for (int i = 0; i < 32; i++) {
      double g = gc0 * kQuaGainCode[i];
      double e = e22 * g * g - 2 * c1 * g;
      if (e < be) {
        be = e;
        bi = i;
      }
    }
    *gci = bi;
    *gc = gc0 * kQuaGainCode[bi];
    return e12;
  };
  int gc_idx;
  double gc;
  double e12 = pick_gc(gp, code_s, y2, &gc_idx, &gc);
  /* one gp refinement given gc, then rebuild the code path under the
   * final gp (the decoder sharpens with it) and re-pick gc */
  {
    double c2 = e_xy - gc * e12;
    int bi = gp_idx;
    double be = 1e30;
    for (int i = 0; i < 16; i++) {
      double g = kQuaGainPitch[i];
      double e = e_yy * g * g - 2 * c2 * g;
      if (e < be) {
        be = e;
        bi = i;
      }
    }
    gp_idx = bi;
    gp = kQuaGainPitch[gp_idx];
    sharpen(gp, code_s);
    conv_h(code_s, h, y2);
    pick_gc(gp, code_s, y2, &gc_idx, &gc);
  }
  bits->put(kGpBits[k], 4, gp_idx);
  bits->put(kGcBits[k], 5, gc_idx);
  for (int i = 3; i > 0; i--) dec->ener_pred[i] = dec->ener_pred[i - 1];
  dec->ener_pred[0] = 20.0 * std::log10(kQuaGainCode[gc_idx]);

  /* mirror the decoder's state update + track quantized-path memories */
  double exc[kSub];
  for (int n = 0; n < kSub; n++) exc[n] = gp * bv[n] + gc * code_s[n];
  std::memmove(dec->exc, dec->exc + kSub, sizeof(double) * (154 - kSub));
  for (int n = 0; n < kSub; n++)
    dec->exc[154 - kSub + n] = std::trunc(exc[n] * 16384.0) / 16384.0;
  double syn[kSub], qt[kSub], dummy[kSub];
  iir10(exc, kSub, a_q, st->synth_mem, syn);
  fir10(syn, kSub, w1, st->wqn_mem, qt);
  iir10(qt, kSub, w2, st->wqd_mem, dummy);
}

void encode_frame(EncState* st, const double* frame, Bits* bits) {
  double a1[10], a2[10];
  lp_analysis(frame, st->sp_mem, a1, a2);
  double lsf1[10], lsf2[10];
  a_to_lsf_hz(a1, lsf1);
  a_to_lsf_hz(a2, lsf2);
  int rows[5];
  double q1[10], q2[10];
  lsf_quantize(lsf1, lsf2, st->dec.past_r, rows, q1, q2);
  double l1[10], l2[10];
  lsf_to_lsp(q1, l1);
  lsf_to_lsp(q2, l2);
  const double* past = st->dec.first ? kLspInit : st->dec.past_lsp;
  double lsps[4][10];
  for (int i = 0; i < 10; i++) {
    lsps[0][i] = 0.5 * past[i] + 0.5 * l1[i];
    lsps[1][i] = l1[i];
    lsps[2][i] = 0.5 * l1[i] + 0.5 * l2[i];
    lsps[3][i] = l2[i];
  }
  std::memcpy(st->dec.past_lsp, l2, sizeof(l2));
  st->dec.first = false;
  std::memset(bits->b, 0, sizeof(bits->b));
  static const int* kGroups[5] = {kLsfBits0, kLsfBits1, kLsfBits2,
                                  kLsfBits3, kLsfBits4};
  static const int kGroupLen[5] = {7, 8, 9, 8, 6};
  for (int g = 0; g < 5; g++) bits->put(kGroups[g], kGroupLen[g], rows[g]);

  /* open-loop pitch on weighted speech (this frame's first LP set) */
  double a_w[10], lspw[10];
  std::memcpy(lspw, l1, sizeof(l1));
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
  int T_ops[2];
  T_ops[0] = open_loop(st->ol_hist, swf, 80, 18);
  std::memmove(st->ol_hist, st->ol_hist + 80, sizeof(double) * 63);
  std::memcpy(st->ol_hist + 63, swf, sizeof(double) * 80);
  T_ops[1] = open_loop(st->ol_hist, swf + 80, 80, 18);
  std::memmove(st->ol_hist, st->ol_hist + 80, sizeof(double) * 63);
  std::memcpy(st->ol_hist + 63, swf + 80, sizeof(double) * 80);

  for (int k = 0; k < 4; k++) {
    double lsp[10], a_q[10];
    std::memcpy(lsp, lsps[k], sizeof(lsp));
    sort_desc(lsp, 10);
    lsp_to_a(lsp, a_q);
    encode_subframe(st, bits, k, frame + kSub * k, a_q, T_ops[k / 2]);
  }
  std::memcpy(st->sp_mem, frame + kFrame - 80, sizeof(double) * 80);
}

}  // namespace

/* ---- internal per-frame hooks for the DTX layer (amrnb_internal.h) */
#include "amrnb_internal.h"

struct Amrnb122Enc {
  EncState st;
};
struct Amrnb122Dec {
  DecState st;
};

Amrnb122Enc* amrnb122_enc_new() { return new Amrnb122Enc(); }
void amrnb122_enc_free(Amrnb122Enc* e) { delete e; }
void amrnb122_enc_frame(Amrnb122Enc* e, const double* frame,
                        amrnb_celp::Bits* bits) {
  encode_frame(&e->st, frame, bits);
}
void amrnb122_enc_push_cn(Amrnb122Enc* e, const double* exc160) {
  DecState* d = &e->st.dec;
  for (int k = 0; k < 4; k++) {
    std::memmove(d->exc, d->exc + kSub, sizeof(double) * (154 - kSub));
    for (int n = 0; n < kSub; n++)
      d->exc[154 - kSub + n] =
          std::trunc(exc160[kSub * k + n] * 16384.0) / 16384.0;
  }
}

Amrnb122Dec* amrnb122_dec_new() { return new Amrnb122Dec(); }
void amrnb122_dec_free(Amrnb122Dec* d) { delete d; }
void amrnb122_dec_frame(Amrnb122Dec* d, const amrnb_celp::Bits& bits,
                        double* out160) {
  decode_frame(bits, &d->st, out160);
}
void amrnb122_dec_push_cn(Amrnb122Dec* d, const double* exc160) {
  DecState* s = &d->st;
  for (int k = 0; k < 4; k++) {
    std::memmove(s->exc, s->exc + kSub, sizeof(double) * (154 - kSub));
    for (int n = 0; n < kSub; n++)
      s->exc[154 - kSub + n] =
          std::trunc(exc160[kSub * k + n] * 16384.0) / 16384.0;
  }
}
amrnb_celp::ChainState* amrnb122_dec_chain(Amrnb122Dec* d) {
  return &d->st.chain;
}

extern "C" {

/* Encode 8 kHz float mono to AMR storage frames (RFC 4867 octet-aligned,
 * 32 bytes/frame incl. the 0x3C TOC). Returns bytes written; size `out`
 * as ceil(n/160)*32. */
long amrnb_encode(const float* in, size_t n, uint8_t* out) {
  EncState st;
  size_t frames = (n + kFrame - 1) / kFrame;
  double buf[kFrame];
  long w = 0;
  for (size_t f = 0; f < frames; f++) {
    for (int i = 0; i < kFrame; i++) {
      size_t idx = f * kFrame + i;
      buf[i] = idx < n ? in[idx] : 0.0;
    }
    Bits bits(kBits);
    encode_frame(&st, buf, &bits);
    out[w] = (7 << 3) | 0x04; /* FT=7 (12.2), quality ok */
    pack_bits(bits, out + w + 1, kFrameBytes - 1);
    w += kFrameBytes;
  }
  return w;
}

/* Decode AMR storage frames (12.2 mode only) to 8 kHz float mono.
 * Returns samples written or -1 on a non-12.2 frame type. Modes 0..6
 * are handled by amrnb_decode_any (amrnb_low.cc). */
long amrnb_decode(const uint8_t* data, size_t size, float* out,
                  size_t max_samples) {
  DecState st;
  size_t p = 0;
  long w = 0;
  while (p + kFrameBytes <= size) {
    int ft = (data[p] >> 3) & 0x0F;
    if (ft != 7) return -1;
    Bits bits(kBits);
    unpack_bits(data + p + 1, &bits);
    double o[kFrame];
    decode_frame(bits, &st, o);
    for (int i = 0; i < kFrame && (size_t)w < max_samples; i++)
      out[w++] = (float)o[i];
    p += kFrameBytes;
  }
  return w;
}

/* Full 8 kHz round trip (encode -> decode), in-process. */
void amrnb_roundtrip(const float* in, float* out, size_t n) {
  size_t frames = (n + kFrame - 1) / kFrame;
  std::vector<uint8_t> bs(frames * kFrameBytes);
  long nb = amrnb_encode(in, n, bs.data());
  std::vector<float> dec(frames * kFrame);
  long ns = amrnb_decode(bs.data(), (size_t)nb, dec.data(), dec.size());
  for (size_t i = 0; i < n; i++) out[i] = i < (size_t)ns ? dec[i] : 0.0f;
}

} /* extern "C" */
