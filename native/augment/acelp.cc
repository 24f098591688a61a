/* Generic ACELP (Algebraic Code-Excited Linear Prediction) codec for the
 * cellular/VoIP channel-simulation tier.
 *
 * The reference's channel vocabulary runs real AMR-NB / AMR-WB / SILK
 * encoders via the external acoustic-simulator
 * (/root/reference/channel_simulation/simulated_channel.py:19-38). The 3GPP
 * AMR codecs cannot be reproduced offline (their standardized LSF/gain
 * codebooks span thousands of table entries), so this file implements a REAL
 * analysis-by-synthesis ACELP codec with AMR-matched structure — LPC
 * short-term prediction with quantized log-area ratios, closed-loop
 * adaptive-codebook pitch prediction, an interleaved-track algebraic fixed
 * codebook with mode-dependent pulse counts, quantized gains, and
 * perceptually weighted search — parameterized by the AMR mode bit budgets.
 * It produces true codec-class distortion (LPC envelope quantization,
 * sparse-pulse residual, pitch-predictor artifacts) rather than the
 * band-limit + noise stand-in it replaces. NOT bit-compatible with 3GPP
 * AMR; see tests/test_acelp.py for the validation strategy.
 *
 * Narrowband: 8 kHz, 20 ms frames (160), 4 subframes of 40, LP order 10.
 * Wideband: 16 kHz, 20 ms frames (320), 4 subframes of 80, LP order 16.
 */

#include <algorithm>
#include <cmath>
#include <cstddef>
#include <cstring>
#include <vector>

#include "augment.h"

namespace {

struct AcelpParams {
  int sr;
  int frame;          /* samples per frame */
  int sub;            /* samples per subframe */
  int order;          /* LP order */
  int min_lag, max_lag;
  int n_pulses;       /* algebraic codebook pulses per subframe */
  int n_tracks = 5;
};

/* Pulses per subframe vs AMR mode bitrate (TS 26.090 table structure for
 * NB; TS 26.190 for WB). */
int nb_pulses(float kbps) {
  if (kbps >= 12.0f) return 10;
  if (kbps >= 10.0f) return 8;
  if (kbps >= 7.9f) return 4;
  if (kbps >= 7.0f) return 4;
  if (kbps >= 6.5f) return 3;
  return 2;  /* 4.75 / 5.15 / 5.9 */
}

int wb_pulses(float kbps) {
  if (kbps >= 20.0f) return 18;
  if (kbps >= 15.0f) return 12;
  if (kbps >= 12.0f) return 8;
  if (kbps >= 8.0f) return 4;
  return 2;  /* 6.6 */
}

AcelpParams make_params(int sr, float kbps) {
  AcelpParams p;
  p.sr = sr;
  if (sr <= 8000) {
    p.frame = 160; p.sub = 40; p.order = 10;
    p.min_lag = 20; p.max_lag = 143;
    p.n_pulses = nb_pulses(kbps);
  } else {
    p.frame = 320; p.sub = 80; p.order = 16;
    p.min_lag = 34; p.max_lag = 231;
    p.n_pulses = wb_pulses(kbps);
  }
  return p;
}

/* ---- LP analysis ---- */

void autocorr(const float* x, int n, int order, double* r, int sr) {
  std::vector<double> w(n);
  for (int k = 0; k < n; ++k)  /* Hamming analysis window */
    w[k] = x[k] * (0.54 - 0.46 * std::cos(2.0 * M_PI * k / (n - 1)));
  for (int j = 0; j <= order; ++j) {
    double s = 0.0;
    for (int k = j; k < n; ++k) s += w[k] * w[k - j];
    r[j] = s;
  }
  r[0] *= 1.0001;              /* white-noise correction */
  if (r[0] < 1e-9) r[0] = 1e-9;
  for (int j = 1; j <= order; ++j) {   /* 60 Hz lag window */
    double f = 60.0;
    double w = std::exp(-0.5 * std::pow(2.0 * M_PI * f * j / sr, 2));
    r[j] *= w;
  }
}

/* Levinson-Durbin: returns reflection coefficients k[1..order] and LP
 * coefficients a[0..order] (a[0]=1, A(z) = 1 + a1 z^-1 + ...). */
void levinson(const double* r, int order, double* a, double* refl) {
  std::vector<double> tmp(order + 1);
  double err = r[0];
  a[0] = 1.0;
  for (int i = 1; i <= order; ++i) a[i] = 0.0;
  for (int i = 1; i <= order; ++i) {
    double acc = r[i];
    for (int j = 1; j < i; ++j) acc += a[j] * r[i - j];
    double k = (err > 1e-12) ? -acc / err : 0.0;
    k = std::max(-0.999, std::min(0.999, k));
    refl[i] = k;
    for (int j = 0; j <= i; ++j) tmp[j] = a[j];
    for (int j = 1; j < i; ++j) a[j] = tmp[j] + k * tmp[i - j];
    a[i] = k;
    err *= (1.0 - k * k);
    if (err < 1e-12) err = 1e-12;
  }
}

/* Reflection <-> LAR with mu-law-companded quantization: the short-term
 * envelope quantizer. Companding gives fine resolution near zero (where the
 * high-order reflection coefficients live) while keeping the full +-lar_max
 * range (tonal signals legitimately push high-order |k| toward 1, i.e.
 * |LAR| >> 1 — hard range clamps destabilize the analysis). */
double quantize_lar(double k, int bits, double lar_max = 7.0,
                    double mu = 15.0) {
  double lar = std::log((1.0 + k) / (1.0 - k));
  double a = std::min(std::fabs(lar), lar_max) / lar_max;
  double y = std::copysign(std::log1p(mu * a) / std::log1p(mu), lar);
  double step = 2.0 / ((1 << bits) - 1);
  double q = std::round((y + 1.0) / step);
  q = std::max(0.0, std::min((double)((1 << bits) - 1), q));
  double yq = q * step - 1.0;
  double lq = std::copysign((std::exp(std::fabs(yq) * std::log1p(mu)) - 1.0)
                                / mu * lar_max,
                            yq);
  return std::tanh(lq / 2.0);  /* back to reflection */
}

/* Reflection -> direct-form LP coefficients. */
void refl_to_lpc(const double* refl, int order, double* a) {
  std::vector<double> tmp(order + 1);
  a[0] = 1.0;
  for (int i = 1; i <= order; ++i) a[i] = 0.0;
  for (int i = 1; i <= order; ++i) {
    double k = refl[i];
    for (int j = 0; j <= i; ++j) tmp[j] = a[j];
    for (int j = 1; j < i; ++j) a[j] = tmp[j] + k * tmp[i - j];
    a[i] = k;
  }
}

/* ---- Codec state ---- */

struct AcelpCodec {
  AcelpParams p;
  /* gain quantizers: pitch gain 4 bits in [0, 1.2]; code gain 5 bits as a
   * log-uniform CORRECTION FACTOR to a gain predicted from the decoded
   * fixed-codebook energy of past subframes (the AMR scheme — scale-free,
   * so float-scale audio quantizes as well as int16-scale). */
  static double q_pitch_gain(double g) {
    g = std::max(0.0, std::min(1.2, g));
    double q = std::round(g / 1.2 * 15.0);
    return q * 1.2 / 15.0;
  }
  static double q_code_gain(double g, double pred) {
    if (g <= 0.0) return 0.0;
    pred = std::max(pred, 1e-12);
    double c = g / pred;                 /* correction factor */
    double lo = 1.0 / 64.0, hi = 64.0;   /* +-36 dB around prediction */
    c = std::max(lo, std::min(hi, c));
    double step = std::log(hi / lo) / 31.0;
    double q = std::round(std::log(c / lo) / step);
    return pred * lo * std::exp(q * step);
  }

  std::vector<float> exc_hist;     /* past excitation (max_lag + frame) */
  std::vector<double> synth_mem;   /* 1/A(z): past reconstructed speech */
  std::vector<double> wgt_x_mem;   /* A(z/g1) FIR: past raw speech */
  std::vector<double> wgt_sw_mem;  /* 1/A(z/g2): past weighted speech */
  std::vector<double> rec_sw_mem;  /* 1/A(z/g2): past weighted reconstr. */
  std::vector<double> prev_refl;   /* for LAR interpolation */
  double gc_pred = 1e-4;           /* decoded code-gain energy predictor */
  float pre_mem = 0.0f;            /* HP filter state */
  float pre_mem2 = 0.0f;
  float emph_mem = 0.0f;           /* WB pre-emphasis state */
  float deemph_mem = 0.0f;         /* WB de-emphasis state */

  /* Fractional-pitch interpolation reads up to kExcGuard samples beyond
   * max_lag into the past (8-tap kernel at lag max_lag+1). */
  static constexpr int kExcGuard = 8;

  explicit AcelpCodec(const AcelpParams& params) : p(params) {
    exc_hist.assign(kExcGuard + p.max_lag + p.frame, 0.0f);
    synth_mem.assign(p.order, 0.0);
    wgt_x_mem.assign(p.order, 0.0);
    wgt_sw_mem.assign(p.order, 0.0);
    rec_sw_mem.assign(p.order, 0.0);
    prev_refl.assign(p.order + 1, 0.0);
  }
};

const double GAMMA1 = 0.94, GAMMA2 = 0.60;

void bw_expand(const double* a, int order, double gamma, double* out) {
  double g = 1.0;
  out[0] = 1.0;
  for (int i = 1; i <= order; ++i) {
    g *= gamma;
    out[i] = a[i] * g;
  }
}

/* One frame of analysis-by-synthesis coding; in/out are p.frame samples. */
void code_frame(AcelpCodec& st, const float* in, float* out) {
  const AcelpParams& p = st.p;
  const int F = p.frame, S = p.sub, O = p.order;
  const int n_sub = F / S;

  /* High-pass (~80 Hz) preprocessing, first-order. */
  std::vector<float> x(F);
  for (int i = 0; i < F; ++i) {
    float v = in[i] - st.pre_mem2 + 0.989f * st.pre_mem;
    st.pre_mem2 = in[i];
    x[i] = v;
    st.pre_mem = v;
  }
  /* WB: pre-emphasis (1 - 0.68 z^-1) before coding, de-emphasized at the
   * output (TS 26.190 structure) — balances the spectral tilt so the
   * algebraic codebook serves the full band. */
  const bool wb = p.sr > 8000;
  if (wb) {
    for (int i = 0; i < F; ++i) {
      float v = x[i] - 0.68f * st.emph_mem;
      st.emph_mem = x[i];
      x[i] = v;
    }
  }

  /* LP on the current frame (Levinson over lag-windowed autocorrelation) —
   * models the envelope-quantization artifact; per-subframe interpolation
   * below supplies the time smoothing the asymmetric-window analysis gives
   * the 3GPP codec. */
  std::vector<double> r(O + 1), a_raw(O + 1), refl(O + 1);
  autocorr(x.data(), F, O, r.data(), p.sr);
  levinson(r.data(), O, a_raw.data(), refl.data());

  /* Quantize reflection coefficients through LARs: AMR-like bit layout —
   * more bits for low coefficients. */
  std::vector<double> qrefl(O + 1, 0.0);
  for (int i = 1; i <= O; ++i) {
    int bits = i <= 2 ? 6 : i <= 4 ? 5 : i <= 6 ? 4 : 3;
    qrefl[i] = quantize_lar(refl[i], bits);
  }

  float* exc = st.exc_hist.data() + AcelpCodec::kExcGuard + p.max_lag;

  for (int sub = 0; sub < n_sub; ++sub) {
    const float* xs = x.data() + sub * S;

    /* Per-subframe LP: linear interpolation prev->current in reflection
     * space (stable by construction). */
    double t = (sub + 1.0) / n_sub;
    std::vector<double> ksub(O + 1), a(O + 1), a1(O + 1), a2(O + 1);
    for (int i = 1; i <= O; ++i)
      ksub[i] = (1.0 - t) * st.prev_refl[i] + t * qrefl[i];
    refl_to_lpc(ksub.data(), O, a.data());
    bw_expand(a.data(), O, GAMMA1, a1.data());
    bw_expand(a.data(), O, GAMMA2, a2.data());

    /* Generic filter helpers over this subframe: FIR y = A*(x) and
     * all-pole y = x / A, both with explicit O-sample history vectors. */
    auto fir = [&](const double* coef, const double* xin,
                   const std::vector<double>& hist, std::vector<double>& y) {
      for (int n = 0; n < S; ++n) {
        double v = xin[n];
        for (int i = 1; i <= O; ++i)
          v += coef[i] * ((n - i >= 0) ? xin[n - i] : hist[O + (n - i)]);
        y[n] = v;
      }
    };
    auto allpole = [&](const double* coef, const double* xin,
                       const std::vector<double>& hist,
                       std::vector<double>& y) {
      for (int n = 0; n < S; ++n) {
        double v = xin[n];
        for (int i = 1; i <= O; ++i)
          v -= coef[i] * ((n - i >= 0) ? y[n - i] : hist[O + (n - i)]);
        y[n] = v;
      }
    };
    auto tail = [&](const std::vector<double>& y, std::vector<double>& hist) {
      for (int i = 0; i < O; ++i) hist[i] = y[S - O + i];
    };

    /* Weighted speech sw = x * A(z/g1) / A(z/g2). */
    std::vector<double> xd(S), w1(S), sws(S);
    for (int n = 0; n < S; ++n) xd[n] = xs[n];
    fir(a1.data(), xd.data(), st.wgt_x_mem, w1);
    allpole(a2.data(), w1.data(), st.wgt_sw_mem, sws);

    /* Zero-input response of the weighted RECONSTRUCTION cascade
     * 1/A^(z) -> A(z/g1) -> 1/A(z/g2) from the encoder's real filter
     * memories; the search target is sw - zir. */
    std::vector<double> zeros(S, 0.0), s_zir(S), w1_zir(S), sw_zir(S);
    allpole(a.data(), zeros.data(), st.synth_mem, s_zir);
    fir(a1.data(), s_zir.data(), st.synth_mem, w1_zir);
    allpole(a2.data(), w1_zir.data(), st.rec_sw_mem, sw_zir);
    std::vector<double> sw(S);  /* the search target */
    for (int n = 0; n < S; ++n) sw[n] = sws[n] - sw_zir[n];

    /* Impulse response h of the full weighted synthesis filter
     * A(z/g1) / (A^(z) A(z/g2)), zero-state. */
    std::vector<double> h(S, 0.0), hs(S, 0.0), hw1(S, 0.0);
    hs[0] = 1.0;
    for (int n = 1; n < S; ++n) {
      double v = 0.0;
      for (int i = 1; i <= std::min(O, n); ++i) v -= a[i] * hs[n - i];
      hs[n] = v;
    }
    for (int n = 0; n < S; ++n) {
      double v = hs[n];
      for (int i = 1; i <= std::min(O, n); ++i) v += a1[i] * hs[n - i];
      hw1[n] = v;
    }
    for (int n = 0; n < S; ++n) {
      double v = hw1[n];
      for (int i = 1; i <= std::min(O, n); ++i) v -= a2[i] * h[n - i];
      h[n] = v;
    }

    /* ---- adaptive codebook: closed-loop lag search, integer pass then
     * 1/6-fractional refinement around the winner (AMR-style; without it,
     * non-integer pitch periods cost >10 dB) ---- */
    auto ext = [&](int m, int lag) -> float {
      while (m >= sub * S) m -= lag;  /* periodic ext. for lag < S */
      return exc[m];                  /* m >= -max_lag is in-buffer */
    };
    const int FD = 6;                 /* fraction denominator */
    /* 8-tap Hann-windowed sinc interpolators per fraction */
    static thread_local std::vector<double> itp;
    if (itp.size() != (size_t)FD * 8) {
      itp.assign(FD * 8, 0.0);
      for (int f = 0; f < FD; ++f)
        for (int j = -3; j <= 4; ++j) {
          double u = j - (double)f / FD;
          double s = (u == 0.0) ? 1.0 : std::sin(M_PI * u) / (M_PI * u);
          double w = 0.5 + 0.5 * std::cos(M_PI * u / 4.5);
          itp[f * 8 + (j + 3)] = s * w;
        }
    }
    auto adaptive_vec = [&](int lag, int frac, std::vector<double>& v) {
      for (int n = 0; n < S; ++n) {
        if (frac == 0) {
          v[n] = ext(sub * S + n - lag, lag);
        } else {
          double acc = 0.0;
          for (int j = -3; j <= 4; ++j)
            acc += itp[frac * 8 + (j + 3)] * ext(sub * S + n - lag + j, lag);
          v[n] = acc;
        }
      }
    };
    auto score_vec = [&](const std::vector<double>& v, std::vector<double>& y,
                         double* gp_out) {
      double num = 0.0, den = 1e-9;
      for (int n = 0; n < S; ++n) {
        double acc = 0.0;
        for (int k = 0; k <= n; ++k) acc += v[k] * h[n - k];
        y[n] = acc;
        num += sw[n] * acc;
        den += acc * acc;
      }
      *gp_out = num / den;
      return num * num / den;
    };
    int best_lag = p.min_lag;
    double best_score = -1e30, best_gp = 0.0;
    std::vector<double> v(S), y(S), best_y(S), best_v(S);
    for (int lag = p.min_lag; lag <= p.max_lag; ++lag) {
      adaptive_vec(lag, 0, v);
      double gp_c;
      double score = score_vec(v, y, &gp_c);
      if (score > best_score) {
        best_score = score;
        best_lag = lag;
        best_gp = gp_c;
        best_y = y;
        best_v = v;
      }
    }
    for (int frac = 1; frac < FD; ++frac) {  /* refine below the winner */
      adaptive_vec(best_lag, frac, v);
      double gp_c;
      double score = score_vec(v, y, &gp_c);
      if (score > best_score) {
        best_score = score;
        best_gp = gp_c;
        best_y = y;
        best_v = v;
      }
      adaptive_vec(best_lag + 1, frac, v);   /* and above it */
      double score2 = score_vec(v, y, &gp_c);
      if (score2 > best_score) {
        best_score = score2;
        best_lag = best_lag + 1;
        best_gp = gp_c;
        best_y = y;
        best_v = v;
        break;  /* lag base moved; fractions now relative to the new base */
      }
    }
    double gp = AcelpCodec::q_pitch_gain(best_gp);

    /* residual target for the fixed codebook */
    std::vector<double> x2(S);
    for (int n = 0; n < S; ++n) x2[n] = sw[n] - gp * best_y[n];

    /* ---- algebraic codebook: greedy track search with joint-gain
     * matching-pursuit scoring max (x2.c_h)^2 / ||c_h||^2 ---- */
    std::vector<double> d(S);              /* d[pos] = <x2, h_pos> */
    std::vector<double> phi(S * S);        /* phi[p1*S+p2] = <h_p1, h_p2> */
    for (int pos = 0; pos < S; ++pos) {
      double c = 0.0;
      for (int n = pos; n < S; ++n) c += x2[n] * h[n - pos];
      d[pos] = c;
    }
    for (int p1 = 0; p1 < S; ++p1)
      for (int p2 = p1; p2 < S; ++p2) {
        double c = 0.0;
        for (int n = p2; n < S; ++n) c += h[n - p1] * h[n - p2];
        phi[p1 * S + p2] = phi[p2 * S + p1] = c;
      }
    std::vector<double> code(S, 0.0);
    std::vector<double> conv_code(S, 0.0);  /* code * h */
    std::vector<int> sel_pos;
    std::vector<int> sel_sign;
    double num = 0.0, den = 1e-12;
    int per_track = (p.n_pulses + p.n_tracks - 1) / p.n_tracks;
    std::vector<int> track_used(p.n_tracks, 0);
    for (int pulse = 0; pulse < p.n_pulses; ++pulse) {
      /* each pulse takes the best (position, sign) among tracks with
       * remaining capacity (positions pos % n_tracks == track) */
      int best_pos = -1, best_sign = 1;
      double best_sc = -1.0, best_num = num, best_den = den;
      for (int pos = 0; pos < S; ++pos) {
        if (track_used[pos % p.n_tracks] >= per_track) continue;
        double cross = 0.0;  /* <conv_code, h_pos> */
        for (size_t j = 0; j < sel_pos.size(); ++j)
          cross += sel_sign[j] * phi[sel_pos[j] * S + pos];
        for (int s = -1; s <= 1; s += 2) {
          double nn = num + s * d[pos];
          double dd = den + 2.0 * s * cross + phi[pos * S + pos];
          double score = nn * nn / dd;
          if (score > best_sc) {
            best_sc = score;
            best_pos = pos;
            best_sign = s;
            best_num = nn;
            best_den = dd;
          }
        }
      }
      ++track_used[best_pos % p.n_tracks];
      code[best_pos] += best_sign;
      sel_pos.push_back(best_pos);
      sel_sign.push_back(best_sign);
      num = best_num;
      den = best_den;
      for (int n = best_pos; n < S; ++n)
        conv_code[n] += best_sign * h[n - best_pos];
    }
    /* The matching-pursuit score nn^2/dd is sign-invariant, so the greedy
     * can converge with num < 0; the optimum then is the sign-flipped
     * codevector with num > 0 (identical energy). Without this the code
     * gain clamps to zero and the encoder can stick in a silent state. */
    if (num < 0.0) {
      num = -num;
      for (int n = 0; n < S; ++n) {
        code[n] = -code[n];
        conv_code[n] = -conv_code[n];
      }
    }
    double gc = AcelpCodec::q_code_gain(std::max(0.0, num / den),
                                        st.gc_pred);
    /* moving-average energy predictor over DECODED gains (decoder can
     * reproduce it) */
    if (gc > 0.0) st.gc_pred = 0.5 * st.gc_pred + 0.5 * gc;

    /* ---- excitation, reconstruction cascade, memory updates ---- */
    for (int n = 0; n < S; ++n)
      exc[sub * S + n] = (float)(gp * best_v[n] + gc * code[n]);
    std::vector<double> excd(S), shat(S), w1r(S), swr(S);
    for (int n = 0; n < S; ++n) excd[n] = exc[sub * S + n];
    allpole(a.data(), excd.data(), st.synth_mem, shat);
    fir(a1.data(), shat.data(), st.synth_mem, w1r);
    allpole(a2.data(), w1r.data(), st.rec_sw_mem, swr);
    for (int n = 0; n < S; ++n) out[sub * S + n] = (float)shat[n];
    tail(shat, st.synth_mem);
    tail(swr, st.rec_sw_mem);
    tail(xd, st.wgt_x_mem);
    tail(sws, st.wgt_sw_mem);
  }

  if (wb) {  /* de-emphasis 1/(1 - 0.68 z^-1) on the decoded output */
    for (int i = 0; i < F; ++i) {
      float v = out[i] + 0.68f * st.deemph_mem;
      st.deemph_mem = v;
      out[i] = v;
    }
  }

  /* roll excitation history */
  std::memmove(st.exc_hist.data(), st.exc_hist.data() + F,
               (st.exc_hist.size() - F) * sizeof(float));
  st.prev_refl = qrefl;
}

}  // namespace

extern "C" {

/* ACELP round trip at the native codec rate (8000 or 16000). bitrate_kbps
 * selects the algebraic-codebook density per the AMR mode ladder. */
void acelp_roundtrip(const float* in, float* out, size_t n, int sample_rate,
                     float bitrate_kbps) {
  AcelpParams p = make_params(sample_rate, bitrate_kbps);
  AcelpCodec st(p);
  std::vector<float> inbuf(p.frame), outbuf(p.frame);
  for (size_t pos = 0; pos < n; pos += p.frame) {
    for (int k = 0; k < p.frame; ++k) {
      size_t idx = pos + k;
      inbuf[k] = idx < n ? in[idx] : 0.0f;
    }
    code_frame(st, inbuf.data(), outbuf.data());
    for (int k = 0; k < p.frame; ++k) {
      size_t idx = pos + k;
      if (idx < n) out[idx] = outbuf[k];
    }
  }
}

/* Full cellular/VoIP hop: resample 16 kHz input to the codec rate, ACELP
 * round trip, resample back. codec_rate 8000 (AMR-NB/SILK-NB ladder) or
 * 16000 (AMR-WB/SILK-WB ladder). */
void acelp_channel(const float* in, float* out, size_t n, int in_rate,
                   int codec_rate, float bitrate_kbps) {
  if (codec_rate == in_rate) {
    acelp_roundtrip(in, out, n, codec_rate, bitrate_kbps);
    return;
  }
  const int taps = 33;
  std::vector<float> nb((size_t)std::ceil((double)n * codec_rate / in_rate) +
                        taps);
  size_t n8 = resample_sinc(in, n, nb.data(), in_rate, codec_rate, taps);
  std::vector<float> coded(n8);
  acelp_roundtrip(nb.data(), coded.data(), n8, codec_rate, bitrate_kbps);
  std::vector<float> up(n + taps);
  size_t n_up = resample_sinc(coded.data(), n8, up.data(), codec_rate,
                              in_rate, taps);
  for (size_t i = 0; i < n; ++i) out[i] = i < n_up ? up[i] : 0.0f;
}

}  /* extern "C" */
