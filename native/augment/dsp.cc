/* Resampling, FFT convolution, and leveling primitives. */

#include "augment.h"

#include <algorithm>
#include <cmath>
#include <complex>
#include <numeric>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

double sinc(double x) {
  if (std::abs(x) < 1e-12) return 1.0;
  return std::sin(kPi * x) / (kPi * x);
}

/* iterative radix-2 FFT (in-place, complex<double>) */
void fft(std::vector<std::complex<double>>& a, bool invert) {
  const size_t n = a.size();
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    double ang = 2 * kPi / static_cast<double>(len) * (invert ? 1 : -1);
    std::complex<double> wlen(std::cos(ang), std::sin(ang));
    for (size_t i = 0; i < n; i += len) {
      std::complex<double> w(1.0);
      for (size_t j = 0; j < len / 2; ++j) {
        std::complex<double> u = a[i + j];
        std::complex<double> v = a[i + j + len / 2] * w;
        a[i + j] = u + v;
        a[i + j + len / 2] = u - v;
        w *= wlen;
      }
    }
  }
  if (invert) {
    for (auto& x : a) x /= static_cast<double>(n);
  }
}

size_t next_pow2(size_t n) {
  size_t p = 1;
  while (p < n) p <<= 1;
  return p;
}

}  // namespace

extern "C" {

size_t resample_sinc(const float* in, size_t n, float* out,
                     int in_rate, int out_rate, int taps) {
  if (in_rate == out_rate) {
    std::copy(in, in + n, out);
    return n;
  }
  const double ratio = static_cast<double>(out_rate) / in_rate;
  const size_t n_out = static_cast<size_t>(std::ceil(n * ratio));
  /* anti-alias cutoff at the lower Nyquist */
  const double fc = 0.5 * std::min(1.0, ratio);
  const int half = taps / 2;
  for (size_t m = 0; m < n_out; ++m) {
    const double t = static_cast<double>(m) / ratio;  /* input-time position */
    const long center = static_cast<long>(std::floor(t));
    double acc = 0.0;
    for (long k = center - half; k <= center + half; ++k) {
      if (k < 0 || k >= static_cast<long>(n)) continue;
      const double x = t - static_cast<double>(k);
      /* Hamming-windowed sinc */
      const double w =
          0.54 + 0.46 * std::cos(kPi * x / (half + 1e-9));
      if (std::abs(x) > half) continue;
      acc += in[k] * 2.0 * fc * sinc(2.0 * fc * x) * w;
    }
    out[m] = static_cast<float>(acc);
  }
  return n_out;
}

void fft_convolve(const float* x, size_t n, const float* ir, size_t k,
                  float* out) {
  const size_t m = next_pow2(n + k - 1);
  std::vector<std::complex<double>> X(m), H(m);
  for (size_t i = 0; i < n; ++i) X[i] = x[i];
  for (size_t i = 0; i < k; ++i) H[i] = ir[i];
  fft(X, false);
  fft(H, false);
  for (size_t i = 0; i < m; ++i) X[i] *= H[i];
  fft(X, true);
  for (size_t i = 0; i < n; ++i) out[i] = static_cast<float>(X[i].real());
}

void rms_normalize(const float* in, float* out, size_t n, float target_dbfs) {
  double ms = 0.0;
  for (size_t i = 0; i < n; ++i) ms += static_cast<double>(in[i]) * in[i];
  ms /= std::max<size_t>(n, 1);
  const double rms = std::sqrt(ms + 1e-12);
  const double target = std::pow(10.0, target_dbfs / 20.0);
  const double g = target / rms;
  for (size_t i = 0; i < n; ++i)
    out[i] = static_cast<float>(std::min(1.0, std::max(-1.0, in[i] * g)));
}

void telephony_channel(const float* in, float* out, size_t n, int in_rate,
                       int codec) {
  const int taps = 33;
  std::vector<float> nb(static_cast<size_t>(std::ceil(n * 8000.0 / in_rate)) +
                        taps);
  const size_t n8 = resample_sinc(in, n, nb.data(), in_rate, 8000, taps);

  std::vector<float> coded(n8);
  switch (codec) {
    case 0:
      g711_ulaw_roundtrip(nb.data(), coded.data(), n8);
      break;
    case 1:
      g711_alaw_roundtrip(nb.data(), coded.data(), n8);
      break;
    case 6:
      gsmfr_roundtrip(nb.data(), coded.data(), n8);
      break;
    default: {
      int bits = std::min(5, std::max(2, codec));
      g726_roundtrip(nb.data(), coded.data(), n8, bits);
    }
  }

  std::vector<float> up(n + taps);
  const size_t n_up = resample_sinc(coded.data(), n8, up.data(), 8000, in_rate,
                                    taps);
  for (size_t i = 0; i < n; ++i) out[i] = i < n_up ? up[i] : 0.0f;
}

}  /* extern "C" */
