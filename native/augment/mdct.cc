/* Transform-codec simulation for the mp3/aac compression tier.
 *
 * The reference compresses with real mp3/aac encoders via the external
 * acoustic-simulator (/root/reference/channel_simulation/
 * simulated_compression.py:11-13). Bit-compatible MPEG codecs are not
 * reproducible offline (Huffman tables, psychoacoustic model), so this
 * implements the transform-coding pipeline that produces their
 * characteristic artifacts: windowed MDCT -> scalefactor-band grouping ->
 * energy-ordered band selection under the mode's bit budget (spectral holes
 * and the low-bitrate high-frequency cutoff) -> uniform mid-tread
 * quantization of kept bands -> iMDCT with sine-window overlap-add
 * (time-domain aliasing cancellation; quantization spreads as pre-echo over
 * the window like real MPEG audio). mp3 uses 1152-sample granules
 * (Layer III long blocks), aac 2048-sample frames.
 */

#include <algorithm>
#include <cmath>
#include <cstddef>
#include <cstring>
#include <vector>

#include "augment.h"

namespace {

struct Mdct {
  int M;                       /* half frame = coefficients per frame */
  std::vector<double> win;     /* sine window, length 2M */
  std::vector<double> cosbuf;  /* (M, 2M) cos table */

  explicit Mdct(int half) : M(half), win(2 * half), cosbuf() {
    for (int n = 0; n < 2 * M; ++n)
      win[n] = std::sin(M_PI / (2.0 * M) * (n + 0.5));
    cosbuf.resize((size_t)M * 2 * M);
    for (int k = 0; k < M; ++k)
      for (int n = 0; n < 2 * M; ++n)
        cosbuf[(size_t)k * 2 * M + n] =
            std::cos(M_PI / M * (n + 0.5 + M / 2.0) * (k + 0.5));
  }

  void forward(const double* x, double* X) const {
    for (int k = 0; k < M; ++k) {
      const double* c = &cosbuf[(size_t)k * 2 * M];
      double acc = 0.0;
      for (int n = 0; n < 2 * M; ++n) acc += x[n] * win[n] * c[n];
      X[k] = acc;
    }
  }

  void inverse_add(const double* X, double* out) const {
    /* out += win * imdct(X), length 2M (caller overlap-adds) */
    for (int n = 0; n < 2 * M; ++n) {
      double acc = 0.0;
      for (int k = 0; k < M; ++k)
        acc += X[k] * cosbuf[(size_t)k * 2 * M + n];
      out[n] += acc * win[n] * 2.0 / M;
    }
  }
};

/* ~Bark-spaced scalefactor bands over M coefficients. */
std::vector<int> band_edges(int M, int n_bands) {
  std::vector<int> edges(n_bands + 1);
  for (int b = 0; b <= n_bands; ++b) {
    /* warped spacing: narrow low bands, wide high bands */
    double frac = std::pow((double)b / n_bands, 1.6);
    edges[b] = (int)std::lround(frac * M);
  }
  edges[0] = 0;
  edges[n_bands] = M;
  for (int b = 1; b <= n_bands; ++b)
    edges[b] = std::max(edges[b], edges[b - 1] + 1);
  return edges;
}

}  // namespace

extern "C" {

/* Transform-codec round trip. frame_half: MDCT size (576 for the mp3
 * granule ladder, 1024 for aac); bitrate_kbps at `sample_rate` sets the
 * per-frame bit budget for band selection + quantization. */
void mdct_codec_roundtrip(const float* in, float* out, size_t n,
                          int sample_rate, float bitrate_kbps,
                          int frame_half) {
  const int M = frame_half > 0 ? frame_half : 576;
  const int n_bands = 32;
  Mdct mdct(M);
  std::vector<int> edges = band_edges(M, n_bands);

  const double bits_per_frame = bitrate_kbps * 1000.0 * M / sample_rate;
  const double kBitsPerCoef = 3.0;   /* quantizer resolution of kept coefs */
  const double kBandHeader = 10.0;   /* scalefactor cost per kept band */

  size_t n_frames = n / M + 2;
  std::vector<double> buf((n_frames + 2) * (size_t)M, 0.0);
  for (size_t i = 0; i < n; ++i) buf[M + i] = in[i];
  std::vector<double> acc(buf.size(), 0.0);

  std::vector<double> X(M), E(n_bands);
  std::vector<int> order(n_bands);
  for (size_t f = 0; f + 2 * (size_t)M <= buf.size(); f += M) {
    mdct.forward(&buf[f], X.data());

    for (int b = 0; b < n_bands; ++b) {
      double e = 0.0;
      for (int k = edges[b]; k < edges[b + 1]; ++k) e += X[k] * X[k];
      E[b] = e;
      order[b] = b;
    }
    std::sort(order.begin(), order.end(),
              [&](int a, int b2) { return E[a] > E[b2]; });

    /* keep the highest-energy bands that fit the budget; zero the rest */
    std::vector<char> keep(n_bands, 0);
    double bits = 0.0;
    for (int oi = 0; oi < n_bands; ++oi) {
      int b = order[oi];
      double cost = kBandHeader + kBitsPerCoef * (edges[b + 1] - edges[b]);
      if (bits + cost > bits_per_frame) continue;
      if (E[b] <= 1e-20) continue;
      bits += cost;
      keep[b] = 1;
    }

    for (int b = 0; b < n_bands; ++b) {
      if (!keep[b]) {
        for (int k = edges[b]; k < edges[b + 1]; ++k) X[k] = 0.0;
        continue;
      }
      double amax = 0.0;
      for (int k = edges[b]; k < edges[b + 1]; ++k)
        amax = std::max(amax, std::fabs(X[k]));
      /* mid-tread uniform quantizer at kBitsPerCoef bits */
      double levels = std::pow(2.0, kBitsPerCoef) - 1.0;
      double step = 2.0 * amax / levels;
      if (step <= 0.0) continue;
      for (int k = edges[b]; k < edges[b + 1]; ++k)
        X[k] = std::round(X[k] / step) * step;
    }

    mdct.inverse_add(X.data(), &acc[f]);
  }

  for (size_t i = 0; i < n; ++i) out[i] = (float)acc[M + i];
}

}  /* extern "C" */
