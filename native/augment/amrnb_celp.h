/* Shared CELP primitives for the from-scratch AMR-NB codecs
 * (amrnb.cc: MR122; amrnb_low.cc: modes 0..6). Every law here was
 * recovered by black-box probing of the in-image lavc amrnb decoder
 * (tools/amr_tables/, FACTS.md): the synthesis/postfilter chain
 * realization, the b60 fractional interpolator, the LSF reorder
 * push-up, and the output high-pass biquad. Internal header — not part
 * of the public augment.h API. */
#ifndef ASVSPOOF_AMRNB_CELP_H_
#define ASVSPOOF_AMRNB_CELP_H_

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

#include "amrnb_tables.h"

namespace amrnb_celp {

constexpr int kSub = 40;
constexpr int kFrame = 160;

/* ------------------------------------------------------------ bit utils */
struct Bits {
  uint8_t b[244];
  int n;
  explicit Bits(int nbits = 244) : n(nbits) { std::memset(b, 0, sizeof(b)); }
  int get(const int* pos, int len) const {
    int v = 0;
    for (int i = 0; i < len; i++) v = (v << 1) | b[pos[i]];
    return v;
  }
  void put(const int* pos, int len, int v) {
    for (int i = 0; i < len; i++) b[pos[i]] = (v >> (len - 1 - i)) & 1;
  }
  int get16(const int16_t* pos, int len) const {
    int v = 0;
    for (int i = 0; i < len; i++) v = (v << 1) | b[pos[i]];
    return v;
  }
  void put16(const int16_t* pos, int len, int v) {
    for (int i = 0; i < len; i++) b[pos[i]] = (v >> (len - 1 - i)) & 1;
  }
};

inline void unpack_bits(const uint8_t* payload, Bits* bits) {
  for (int i = 0; i < bits->n; i++)
    bits->b[i] = (payload[i >> 3] >> (7 - (i & 7))) & 1;
}

inline void pack_bits(const Bits& bits, uint8_t* payload, int nbytes) {
  std::memset(payload, 0, nbytes);
  for (int i = 0; i < bits.n; i++)
    if (bits.b[i]) payload[i >> 3] |= 0x80 >> (i & 7);
}

/* ------------------------------------------------------------- LP/LSF */
inline void lsp_to_a(const double* lsp /*cos, descending*/, double* a) {
  /* P from even-indexed, Q from odd-indexed; A = (P(1+z^-1)+Q(1-z^-1))/2 */
  double P[12], Q[12];
  auto poly = [](const double* qs, int n, double* p) {
    p[0] = 1.0;
    int len = 1;
    for (int i = 0; i < n; i++) {
      double nxt[12] = {0};
      for (int j = 0; j < len; j++) {
        nxt[j] += p[j];
        nxt[j + 1] += -2.0 * qs[i] * p[j];
        nxt[j + 2] += p[j];
      }
      len += 2;
      std::memcpy(p, nxt, sizeof(double) * len);
    }
  };
  double qe[5], qo[5];
  for (int i = 0; i < 5; i++) {
    qe[i] = lsp[2 * i];
    qo[i] = lsp[2 * i + 1];
  }
  poly(qe, 5, P);
  poly(qo, 5, Q);
  double P1[12], Q1[12];
  for (int i = 0; i < 12; i++) {
    P1[i] = (i < 11 ? P[i] : 0.0) + (i > 0 ? P[i - 1] : 0.0);
    Q1[i] = (i < 11 ? Q[i] : 0.0) - (i > 0 ? Q[i - 1] : 0.0);
  }
  for (int i = 0; i < 10; i++) a[i] = 0.5 * (P1[i + 1] + Q1[i + 1]);
}

inline void reorder_lsf(double* f, int n) {
  const double dmin = 50.048828125; /* refit_bad.py pinned push-up */
  for (int i = 1; i < n; i++)
    if (f[i] < f[i - 1] + dmin) f[i] = f[i - 1] + dmin;
}

inline void lsf_to_lsp(const double* hz, double* cosv) {
  for (int i = 0; i < 10; i++)
    cosv[i] = std::cos(2.0 * M_PI * hz[i] / 8000.0);
}

inline void sort_desc(double* v, int n) {
  std::sort(v, v + n, std::greater<>());
}

/* b60 6-phase fractional interpolation of the past excitation (writes
 * recursively so lags < 40 read freshly interpolated samples). */
inline void pred_lt_6(const double* hist /*154*/, int T0, int frac,
                      double* v) {
  using amrnb::kB60;
  double buf[154 + kSub];
  std::memcpy(buf, hist, sizeof(double) * 154);
  frac = -frac;
  int t0 = T0;
  if (frac < 0) {
    frac += 6;
    t0 += 1;
  }
  for (int i = 0; i < kSub; i++) {
    double s = 0.0;
    for (int k = 0; k < 10; k++) {
      s += buf[154 + i - t0 - k] * kB60[frac + 6 * k];
      s += buf[154 + i - t0 + 1 + k] * kB60[6 - frac + 6 * k];
    }
    buf[154 + i] = s;
    v[i] = s;
  }
}

/* ----------------------------------------- synthesis/postfilter chain */
struct ChainState {
  double m_syn[10], m_den[10], m_tilt, m_agc;
  double hp[4];
};

inline double k1_truncated(const double* a, double gn, double gd) {
  double h[22] = {0};
  double wn[10], wd[10];
  for (int i = 0; i < 10; i++) {
    wn[i] = a[i] * std::pow(gn, i + 1);
    wd[i] = a[i] * std::pow(gd, i + 1);
  }
  double fir[22] = {0};
  fir[0] = 1.0;
  for (int n = 1; n < 22 && n <= 10; n++) fir[n] = wn[n - 1];
  for (int n = 0; n < 22; n++) {
    double s = fir[n];
    for (int i = 0; i < 10 && i < n; i++) s -= wd[i] * h[n - 1 - i];
    h[n] = s;
  }
  double r0 = 0, r1 = 0;
  for (int n = 0; n < 22; n++) r0 += h[n] * h[n];
  for (int n = 0; n < 21; n++) r1 += h[n] * h[n + 1];
  /* lavc clamps the tilt to 0 when rh1 < 0 (pinned bit-exactly by
   * tools/amr_tables/nbexact.py, FACTS.md round-5b law 3). */
  if (r1 < 0) return 0.0;
  return r0 > 0 ? r1 / r0 : 0.0;
}

/* Synthesis 1/A -> formant postfilter (pole-first realization, pinned)
 * -> tilt -> AGC -> output HP biquad. gn/gd select the per-family
 * postfilter gammas (MR122: 0.7/0.75; low modes: 0.55/0.7). */
inline void chain_subframe(const double* exc, const double* a, double gn,
                           double gd, ChainState* st, double* out) {
  using namespace amrnb;
  double x[kSub];
  {
    double m[10];
    std::memcpy(m, st->m_syn, sizeof(m));
    for (int n = 0; n < kSub; n++) {
      double s = exc[n];
      for (int i = 0; i < 10; i++) {
        double xm = (n - 1 - i >= 0) ? x[n - 1 - i] : m[10 + (n - 1 - i)];
        s -= a[i] * xm;
      }
      x[n] = s;
    }
    for (int i = 0; i < 10; i++) st->m_syn[i] = x[kSub - 10 + i];
  }
  double wd[10], wn[10];
  for (int i = 0; i < 10; i++) {
    wd[i] = a[i] * std::pow(gd, i + 1);
    wn[i] = a[i] * std::pow(gn, i + 1);
  }
  double v[kSub], vtail[10];
  std::memcpy(vtail, st->m_den, sizeof(vtail));
  for (int n = 0; n < kSub; n++) {
    double s = x[n];
    for (int i = 0; i < 10; i++) {
      double vm = (n - 1 - i >= 0) ? v[n - 1 - i] : vtail[10 + (n - 1 - i)];
      s -= wd[i] * vm;
    }
    v[n] = s;
  }
  double vz[kSub];
  for (int n = 0; n < kSub; n++) {
    double s = v[n];
    for (int i = 0; i < 10; i++) {
      double vm = (n - 1 - i >= 0) ? v[n - 1 - i] : vtail[10 + (n - 1 - i)];
      s += wn[i] * vm;
    }
    vz[n] = s;
  }
  for (int i = 0; i < 10; i++) st->m_den[i] = v[kSub - 10 + i];
  double mu = kTiltFac * k1_truncated(a, gn, gd);
  double t[kSub];
  double prev = st->m_tilt;
  for (int n = 0; n < kSub; n++) {
    t[n] = vz[n] - mu * prev;
    prev = vz[n];
  }
  st->m_tilt = prev;
  double ex = 0, et = 0;
  for (int n = 0; n < kSub; n++) {
    ex += x[n] * x[n];
    et += t[n] * t[n];
  }
  double gt = et > 0 ? std::sqrt(ex / et) : 1.0;
  double g = st->m_agc;
  for (int n = 0; n < kSub; n++) {
    g = kAgcAlpha * g + (1.0 - kAgcAlpha) * gt;
    out[n] = t[n] * g;
  }
  st->m_agc = g;
  double y1 = st->hp[0], y2 = st->hp[1], o1 = st->hp[2], o2 = st->hp[3];
  for (int n = 0; n < kSub; n++) {
    double o = kHpGain * (out[n] - 2.0 * y1 + y2) + kHpPole1 * o1 +
               kHpPole2 * o2;
    y2 = y1;
    y1 = out[n];
    o2 = o1;
    o1 = o;
    out[n] = o;
  }
  st->hp[0] = y1;
  st->hp[1] = y2;
  st->hp[2] = o1;
  st->hp[3] = o2;
}

/* --------------------------------------------------- encoder analysis */
inline void levinson(const double* r, double* a /*10*/) {
  double A[11] = {1.0};
  double e = r[0];
  for (int i = 1; i <= 10; i++) {
    double acc = r[i];
    for (int j = 1; j < i; j++) acc += A[j] * r[i - j];
    double k = -acc / e;
    double tmp[11];
    std::memcpy(tmp, A, sizeof(A));
    for (int j = 1; j < i; j++) A[j] = tmp[j] + k * tmp[i - j];
    A[i] = k;
    e *= (1 - k * k);
    if (e <= 0) e = 1e-12;
  }
  std::memcpy(a, A + 1, sizeof(double) * 10);
}

/* One LP analysis over buf[240] with the (n1 Hamming | n2 quarter-cos)
 * asymmetric window, white-noise + lag windowing, Levinson. */
inline void lp_window(const double* buf /*240*/, int n1, int n2,
                      double* a_out) {
  double x[240];
  for (int i = 0; i < n1; i++)
    x[i] = buf[i] * (0.54 - 0.46 * std::cos(2 * M_PI * i / (2.0 * n1 - 1)));
  for (int i = 0; i < n2; i++)
    x[n1 + i] = buf[n1 + i] * std::cos(2 * M_PI * i / (4.0 * n2 - 1));
  double r[11];
  for (int k = 0; k <= 10; k++) {
    double s = 0;
    for (int i = 0; i < 240 - k; i++) s += x[i] * x[i + k];
    r[k] = s;
  }
  r[0] *= 1.0001;
  if (r[0] < 1e-10) r[0] = 1e-10;
  for (int k = 0; k <= 10; k++) {
    double f = 2 * M_PI * 60.0 * k / 8000.0;
    r[k] *= std::exp(-0.5 * f * f);
  }
  levinson(r, a_out);
}

inline void a_to_lsf_hz(const double* a, double* lsf /*10, ascending*/) {
  double A[11] = {1.0};
  std::memcpy(A + 1, a, sizeof(double) * 10);
  double P1[12], Q1[12];
  for (int i = 0; i < 12; i++) {
    double ai = i < 11 ? A[i] : 0.0;
    P1[i] = ai + ((i >= 1) ? A[11 - i] : 0.0);
    Q1[i] = ai - ((i >= 1) ? A[11 - i] : 0.0);
  }
  double p[11], q[11];
  {
    double acc = 0;
    for (int i = 0; i < 11; i++) {
      acc = P1[i] - acc;
      p[i] = acc;
    }
    acc = 0;
    for (int i = 0; i < 11; i++) {
      acc = Q1[i] + acc;
      q[i] = acc;
    }
  }
  int found = 0;
  double roots[16];
  for (int which = 0; which < 2; which++) {
    const double* c = which == 0 ? p : q;
    auto f = [&](double th) {
      double s = c[5];
      for (int k = 0; k < 5; k++) s += 2.0 * c[k] * std::cos((5 - k) * th);
      return s;
    };
    const int N = 1024;
    double prev_th = 1e-4, prev_v = f(prev_th);
    for (int i = 1; i <= N; i++) {
      double th = 1e-4 + (M_PI - 2e-4) * i / N;
      double v = f(th);
      if (prev_v * v <= 0.0 && found < 16) {
        double lo = prev_th, hi = th, flo = prev_v;
        for (int it = 0; it < 40; it++) {
          double mid = 0.5 * (lo + hi), fm = f(mid);
          if (flo * fm <= 0) {
            hi = mid;
          } else {
            lo = mid;
            flo = fm;
          }
        }
        roots[found++] = 0.5 * (lo + hi);
      }
      prev_th = th;
      prev_v = v;
    }
  }
  std::sort(roots, roots + found);
  if (found < 10) { /* degenerate: pad evenly */
    for (int i = found; i < 10; i++) roots[i] = 0.1 + 0.3 * i;
    std::sort(roots, roots + 10);
  }
  for (int i = 0; i < 10; i++) lsf[i] = roots[i] * 8000.0 / (2 * M_PI);
}

/* FIR 1 + sum w_i z^-(i+1) with 10-sample memory */
inline void fir10(const double* x, int n, const double* w, double* mem,
                  double* out) {
  double buf[10 + kFrame];
  std::memcpy(buf, mem, sizeof(double) * 10);
  std::memcpy(buf + 10, x, sizeof(double) * n);
  for (int i = 0; i < n; i++) {
    double s = buf[10 + i];
    for (int j = 0; j < 10; j++) s += w[j] * buf[10 + i - 1 - j];
    out[i] = s;
  }
  std::memcpy(mem, buf + n, sizeof(double) * 10);
}

inline void iir10(const double* x, int n, const double* w, double* mem,
                  double* out) {
  double buf[10 + kFrame];
  std::memcpy(buf, mem, sizeof(double) * 10);
  for (int i = 0; i < n; i++) {
    double s = x[i];
    for (int j = 0; j < 10; j++) s -= w[j] * buf[10 + i - 1 - j];
    buf[10 + i] = s;
    out[i] = s;
  }
  std::memcpy(mem, buf + n, sizeof(double) * 10);
}

/* Impulse response of H(z) = A(z/g1) / (A_q(z) A(z/g2)), 40 taps. */
inline void weighted_ir(const double* a_q, double g1, double g2,
                        double* h /*40*/) {
  double w1[10], w2[10];
  for (int i = 0; i < 10; i++) {
    w1[i] = a_q[i] * std::pow(g1, i + 1);
    w2[i] = a_q[i] * std::pow(g2, i + 1);
  }
  double x[kSub] = {0};
  x[0] = 1.0;
  for (int i = 1; i <= 10 && i < kSub; i++) x[i] = w1[i - 1];
  double m1[10] = {0}, m2[10] = {0};
  double y[kSub];
  iir10(x, kSub, a_q, m1, y);
  iir10(y, kSub, w2, m2, h);
}

inline void conv_h(const double* sig, const double* h, double* out) {
  for (int n = 0; n < kSub; n++) {
    double s = 0;
    for (int k = 0; k <= n; k++) s += sig[k] * h[n - k];
    out[n] = s;
  }
}

/* Open-loop pitch: normalized cross-correlation over [Tmin, 143] on the
 * concatenation of a 143-sample history and the current segment; the
 * caller shifts the history afterwards. */
inline int open_loop(const double* hist143, const double* seg, int n,
                     int Tmin) {
  double buf[143 + 80];
  std::memcpy(buf, hist143, sizeof(double) * 143);
  std::memcpy(buf + 143, seg, sizeof(double) * n);
  const double* x0 = buf + 143;
  double best = -1e30;
  int bT = 40;
  for (int T = Tmin; T <= 143; T++) {
    const double* x1 = buf + 143 - T;
    double c = 0, e = 1e-9;
    for (int i = 0; i < n; i++) {
      c += x0[i] * x1[i];
      e += x1[i] * x1[i];
    }
    if (c <= 0) continue;
    double sc = c / std::sqrt(e);
    if (sc > best) {
      best = sc;
      bT = T;
    }
  }
  return bT;
}

}  // namespace amrnb_celp

#endif /* ASVSPOOF_AMRNB_CELP_H_ */
