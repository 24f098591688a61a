/* MPEG-2/4 AAC-LC encoder + decoder, from scratch (mono, long windows).
 *
 * Replaces the external aac tool the reference shells out to for its
 * DF compression augmentation (/root/reference/channel_simulation/
 * simulated_compression.py:11-13: aac at 8/16/32 kbps).  16 kHz mono is
 * the native operating point; 8 kHz is also supported.
 *
 * Encoder (Shine-style, executable spec: tools/aac_tables/encoder.py):
 * sine-window 2048-point MDCT -> psychoacoustic-lite per-band noise
 * targets -> two-loop rate/distortion scalefactor search -> per-band
 * spectral Huffman book choice with greedy section merge -> ADTS framing
 * with a small bit reservoir.  Decoder: the matching AAC-LC SCE long-
 * window path (ADTS parse, section/scalefactor/spectral Huffman decode
 * incl. book-11 escapes, inverse quantizer, IMDCT + overlap-add); short
 * windows / TNS / PNS / intensity are not emitted by this encoder and are
 * rejected, with libavcodec + tools/aac_tables/decoder.py as the wider
 * conformance oracles (tests/test_aac.py).
 *
 * All ISO 13818-7 tables in aac_tables.h were recovered and verified
 * against the system's reference AAC decoder (tools/aac_tables/).
 */
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include "aac_tables.h"

namespace {

using std::vector;

constexpr int kSfOffset = 100;
constexpr int kMaxQ = 8191;
constexpr double kPcmScale = 32768.0;  /* spec operates at int16 scale */

/* ---------------- bit I/O ---------------- */

struct BitWriter {
  vector<uint8_t> bytes;
  uint32_t acc = 0;
  int nbits = 0;
  void put(uint32_t v, int n) {
    for (int i = n - 1; i >= 0; --i) {
      acc = (acc << 1) | ((v >> i) & 1);
      if (++nbits == 8) {
        bytes.push_back(static_cast<uint8_t>(acc));
        acc = 0;
        nbits = 0;
      }
    }
  }
  size_t bitpos() const { return bytes.size() * 8 + nbits; }
  void pad_to_byte() {
    while (nbits) put(0, 1);
  }
};

struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t pos = 0;  /* bit position */
  explicit BitReader(const uint8_t* d, size_t n) : data(d), size(n) {}
  bool ok() const { return pos <= size * 8; }
  uint32_t get(int n) {
    uint32_t v = 0;
    for (int i = 0; i < n; ++i) {
      size_t byte = pos >> 3;
      int bit = 7 - static_cast<int>(pos & 7);
      uint32_t b = byte < size ? (data[byte] >> bit) & 1 : 0;
      v = (v << 1) | b;
      ++pos;
    }
    return v;
  }
};

/* ---------------- shared MDCT basis ----------------
 * ISO 13818-7 convention (matches tools/aac_tables/decoder.py imdct):
 *   forward  X[k] = 2       * sum_n cos(2pi/N (n + n0)(k + 0.5)) x[n]
 *   inverse  y[n] = (2 / N) * sum_k cos(2pi/N (n + n0)(k + 0.5)) X[k]
 * with N = 2048, n0 = (N/2 + 1)/2 = 512.5.  One basis matrix serves
 * both directions. */

vector<double>* g_cos = nullptr;  /* [1024][2048] row-major */
double g_win[2048];
bool g_init_done = false;

void init_tables() {
  if (g_init_done) return;
  const int N = 2048, N2 = 1024;
  const double n0 = (N2 + 1) / 2.0;
  g_cos = new vector<double>(static_cast<size_t>(N2) * N);
  for (int k = 0; k < N2; ++k)
    for (int n = 0; n < N; ++n)
      (*g_cos)[static_cast<size_t>(k) * N + n] =
          std::cos(2.0 * M_PI / N * (n + n0) * (k + 0.5));
  for (int n = 0; n < N; ++n)
    g_win[n] = std::sin(M_PI / N * (n + 0.5));
  g_init_done = true;
}

void mdct_forward(const double* xw, double* X) {
  for (int k = 0; k < 1024; ++k) {
    const double* row = g_cos->data() + static_cast<size_t>(k) * 2048;
    double acc = 0.0;
    for (int n = 0; n < 2048; ++n) acc += row[n] * xw[n];
    X[k] = 2.0 * acc;
  }
}

void imdct_inverse(const double* X, double* y) {
  for (int n = 0; n < 2048; ++n) y[n] = 0.0;
  for (int k = 0; k < 1024; ++k) {
    const double* row = g_cos->data() + static_cast<size_t>(k) * 2048;
    double c = X[k] / 1024.0;  /* 2/N */
    if (c == 0.0) continue;
    for (int n = 0; n < 2048; ++n) y[n] += row[n] * c;
  }
}

/* ---------------- quantizer ---------------- */

int64_t quantize_one(double x, int sf) {
  double mag = std::pow(std::fabs(x) * std::pow(2.0, -0.25 * (sf - kSfOffset)),
                        0.75);
  double q = std::floor(mag + 0.4054);
  return x < 0.0 ? -static_cast<int64_t>(q) : static_cast<int64_t>(q);
}

double dequantize_one(int64_t q, int sf) {
  double mag = std::pow(static_cast<double>(q < 0 ? -q : q), 4.0 / 3.0);
  double v = mag * std::pow(2.0, 0.25 * (sf - kSfOffset));
  return q < 0 ? -v : v;
}

/* ---------------- spectral Huffman cost / write ---------------- */

int esc_bits(int64_t v) {
  /* extra bits for a book-11 escape value (|v| >= 16): (n-4) ones, a
   * zero, then the n low bits, n = bit_length(|v|) - 1 */
  int64_t a = v < 0 ? -v : v;
  if (a < 16) return 0;
  int n = 0;
  while ((a >> (n + 1)) != 0) ++n;  /* n = bit_length(a) - 1 */
  return (n - 4 + 1) + n;
}

int band_bits(const int64_t* q, int width, int book) {
  const aactab::BookMeta& m = aactab::kBooks[book];
  const uint8_t* lens = aactab::kBookLens[book];
  int total = 0;
  for (int i = 0; i < width; i += m.dim) {
    int idx = 0;
    if (m.is_signed) {
      for (int d = 0; d < m.dim; ++d)
        idx = idx * (2 * m.lav + 1) + static_cast<int>(q[i + d]) + m.lav;
    } else {
      for (int d = 0; d < m.dim; ++d) {
        int64_t a = q[i + d] < 0 ? -q[i + d] : q[i + d];
        int c = a > m.lav ? m.lav : static_cast<int>(a);
        idx = idx * (m.lav + 1) + c;
      }
      for (int d = 0; d < m.dim; ++d)
        if (q[i + d] != 0) ++total;  /* sign bits */
      if (book == 11)
        for (int d = 0; d < m.dim; ++d) total += esc_bits(q[i + d]);
    }
    total += lens[idx];
  }
  return total;
}

/* cheapest feasible book for a quantized band (0 = ZERO) */
int best_book(const int64_t* q, int width, int* bits_out) {
  int64_t amax = 0;
  for (int i = 0; i < width; ++i) {
    int64_t a = q[i] < 0 ? -q[i] : q[i];
    if (a > amax) amax = a;
  }
  if (amax == 0) {
    *bits_out = 0;
    return 0;
  }
  int best = -1, best_bits = 0;
  for (int book = 1; book <= 11; ++book) {
    const aactab::BookMeta& m = aactab::kBooks[book];
    if (book != 11 && amax > m.lav) continue;
    if (book == 11 && amax > kMaxQ) continue;
    int b = band_bits(q, width, book);
    if (best < 0 || b < best_bits) {
      best = book;
      best_bits = b;
    }
  }
  *bits_out = best_bits;
  return best;
}

void write_spectral(BitWriter* bw, const int64_t* q, int width, int book) {
  const aactab::BookMeta& m = aactab::kBooks[book];
  const uint8_t* lens = aactab::kBookLens[book];
  const uint32_t* codes = aactab::kBookCodes[book];
  for (int i = 0; i < width; i += m.dim) {
    int idx = 0;
    if (m.is_signed) {
      for (int d = 0; d < m.dim; ++d)
        idx = idx * (2 * m.lav + 1) + static_cast<int>(q[i + d]) + m.lav;
      bw->put(codes[idx], lens[idx]);
    } else {
      for (int d = 0; d < m.dim; ++d) {
        int64_t a = q[i + d] < 0 ? -q[i + d] : q[i + d];
        int c = a > m.lav ? m.lav : static_cast<int>(a);
        idx = idx * (m.lav + 1) + c;
      }
      bw->put(codes[idx], lens[idx]);
      for (int d = 0; d < m.dim; ++d)
        if (q[i + d] != 0) bw->put(q[i + d] < 0 ? 1 : 0, 1);
      if (book == 11) {
        for (int d = 0; d < m.dim; ++d) {
          int64_t a = q[i + d] < 0 ? -q[i + d] : q[i + d];
          if (a >= 16) {
            int n = 0;
            while ((a >> (n + 1)) != 0) ++n;
            bw->put((1u << (n - 4)) - 1, n - 4); /* n-4 ones */
            bw->put(0, 1);
            bw->put(static_cast<uint32_t>(a - (1ll << n)), n);
          }
        }
      }
    }
  }
}

/* ---------------- encoder ---------------- */

class AacEncoder {
 public:
  AacEncoder(int sample_rate, int bitrate) {
    init_tables();
    valid_ = sample_rate == 16000 || sample_rate == 8000;
    if (!valid_) return;
    fs_ = sample_rate;
    sfi_ = sample_rate == 16000 ? 8 : 11;
    swb_ = sample_rate == 16000 ? aactab::swb_long_16 : aactab::swb_long_8;
    n_swb_ = (sample_rate == 16000
                  ? sizeof(aactab::swb_long_16) / sizeof(int16_t)
                  : sizeof(aactab::swb_long_8) / sizeof(int16_t)) - 1;
    double kbps = bitrate / 1000.0;
    double cutoff = std::min(0.47 * fs_, 650.0 * std::pow(kbps, 0.78));
    double binw = fs_ / 2048.0;
    int cut_bin = static_cast<int>(cutoff / binw);
    max_sfb_ = 1;
    for (int b = 0; b < n_swb_; ++b)
      if (swb_[b] < cut_bin) max_sfb_ = b + 1;
    for (int i = 0; i < 1024; ++i) prev_[i] = 0.0;
    frame_bits_mean_ = bitrate * 1024.0 / fs_;
    reservoir_ = 0.0;
  }

  bool valid() const { return valid_; }

  /* one ADTS frame from 1024 new samples (int16 scale) */
  void encode_frame(const double* pcm1024, vector<uint8_t>* out) {
    double frame[2048];
    for (int i = 0; i < 1024; ++i) frame[i] = prev_[i] * g_win[i];
    for (int i = 0; i < 1024; ++i)
      frame[1024 + i] = pcm1024[i] * g_win[1024 + i];
    std::memcpy(prev_, pcm1024, sizeof(prev_));
    double X[1024];
    mdct_forward(frame, X);

    const int nb = max_sfb_;
    double targets[64], band_amax[64];
    noise_targets(X, targets, band_amax);
    double budget = frame_bits_mean_ + reservoir_ - 7 * 8 - 3 - 3;
    if (budget < 200.0) budget = 200.0;

    /* start: common sf keeping the global max in quantizer range */
    double amax = 1e-9;
    for (int k = 0; k < 1024; ++k)
      if (std::fabs(X[k]) > amax) amax = std::fabs(X[k]);
    int sf0 = static_cast<int>(std::ceil(
                  4.0 * std::log2(amax / std::pow(kMaxQ - 100, 4.0 / 3.0)))) +
              kSfOffset;
    if (sf0 < 0) sf0 = 0;
    if (sf0 > 255) sf0 = 255;
    int sfs[64];
    for (int b = 0; b < nb; ++b) sfs[b] = sf0;

    int64_t q[1024];
    int books[64];
    /* outer distortion loop with inner rate loop (spec: encoder.py
     * encode_frame) */
    for (int it = 0; it < 60; ++it) {
      long used = quant_all(X, sfs, q, books);
      if (used < 0) {  /* quantizer overflow: coarsen everywhere */
        for (int b = 0; b < nb; ++b) sfs[b] += 1;
        continue;
      }
      if (used > budget) {  /* rate too high: uniform coarsening */
        for (int b = 0; b < nb; ++b) sfs[b] = std::min(sfs[b] + 1, 255);
        continue;
      }
      /* distortion check: amplify violating bands */
      int n_viol = 0;
      bool can_amplify = used <= budget * 0.98;
      for (int b = 0; b < nb; ++b) {
        double err = band_err(X, q, sfs[b], b);
        if (err > targets[b] && sfs[b] > 0 && band_amax[b] > 0.0) {
          ++n_viol;
          if (can_amplify) sfs[b] -= 1;
        }
      }
      if (n_viol == 0 || !can_amplify) break;
    }
    quant_all(X, sfs, q, books);
    vector<uint8_t> body;
    write_frame(q, sfs, books, &body);
    reservoir_ = std::min(reservoir_ + frame_bits_mean_ -
                              static_cast<double>(body.size()) * 8.0,
                          4.0 * frame_bits_mean_);
    out->insert(out->end(), body.begin(), body.end());
  }

 private:
  void noise_targets(const double* X, double* targets, double* band_amax) {
    /* allowed noise energy per band: band energy over an SNR ladder with
     * +-1-band spreading at extra -12 dB and an absolute floor */
    const int nb = max_sfb_;
    double mask[64];
    for (int b = 0; b < nb; ++b) {
      double s = 1e-9, am = 0.0;
      for (int k = swb_[b]; k < swb_[b + 1]; ++k) {
        s += X[k] * X[k];
        if (std::fabs(X[k]) > am) am = std::fabs(X[k]);
      }
      band_amax[b] = am;
      mask[b] = s * std::pow(10.0, -17.0 / 10.0);  /* self-mask at -17 dB */
    }
    for (int b = 0; b < nb; ++b) {
      double spread = 0.0;
      if (b > 0) spread = mask[b - 1] * std::pow(10.0, -1.2);
      if (b + 1 < nb)
        spread = std::max(spread, mask[b + 1] * std::pow(10.0, -1.2));
      targets[b] = std::max(std::max(mask[b], spread), 1e-2);
    }
  }

  /* quantize every band, pick books, return total ics bits or -1 on
   * quantizer overflow */
  long quant_all(const double* X, const int* sfs, int64_t* q, int* books) {
    const int nb = max_sfb_;
    int spec_bits[64];
    for (int b = 0; b < nb; ++b) {
      for (int k = swb_[b]; k < swb_[b + 1]; ++k) {
        q[k] = quantize_one(X[k], sfs[b]);
        int64_t a = q[k] < 0 ? -q[k] : q[k];
        if (a > kMaxQ) return -1;
      }
      books[b] = best_book(q + swb_[b], swb_[b + 1] - swb_[b], &spec_bits[b]);
    }
    return count_bits(sfs, books, spec_bits);
  }

  /* ics bit cost (header + sections + scalefactors + spectral) */
  long count_bits(const int* sfs, const int* books, const int* spec_bits) {
    const int nb = max_sfb_;
    long bits = 8 + 1 + 2 + 1 + 6 + 1;  /* gg + ics_info long */
    int b = 0;
    while (b < nb) {  /* sections: merge adjacent equal books */
      int ln = 1;
      while (b + ln < nb && books[b + ln] == books[b]) ++ln;
      bits += 4 + 5 * (1 + ln / 31);
      b += ln;
    }
    /* scalefactors: dpcm chain seeded at global_gain (= first band's sf,
     * so the first delta is 0), one code per non-zero band */
    bool have_last = false;
    int last = 0;
    for (int i = 0; i < nb; ++i) {
      if (books[i] == 0) continue;
      if (!have_last) {
        last = sfs[i];
        have_last = true;
      }
      int d = sfs[i] - last;
      if (d < -60 || d > 60) return -1;
      bits += aactab::sf_lens[d + 60];
      last = sfs[i];
    }
    bits += 1 + 1 + 1;  /* pulse/tns/gain-control presence */
    for (int i = 0; i < nb; ++i)
      if (books[i]) bits += spec_bits[i];
    return bits;
  }

  void write_frame(const int64_t* q, const int* sfs, const int* books,
                   vector<uint8_t>* out) {
    const int nb = max_sfb_;
    /* global gain = first transmitted sf (or first band's sf if silent) */
    int gg = sfs[0];
    for (int b = 0; b < nb; ++b)
      if (books[b]) {
        gg = sfs[b];
        break;
      }
    BitWriter body;
    body.put(0, 3);  /* SCE */
    body.put(0, 4);  /* element_instance_tag */
    body.put(static_cast<uint32_t>(gg), 8);
    body.put(0, 1);  /* ics_reserved */
    body.put(0, 2);  /* ONLY_LONG */
    body.put(0, 1);  /* sine window */
    body.put(static_cast<uint32_t>(nb), 6);
    body.put(0, 1);  /* predictor_data_present */
    /* section_data */
    int b = 0;
    while (b < nb) {
      int ln = 1;
      while (b + ln < nb && books[b + ln] == books[b]) ++ln;
      body.put(static_cast<uint32_t>(books[b]), 4);
      int rem = ln;
      while (rem >= 31) {
        body.put(31, 5);
        rem -= 31;
      }
      body.put(static_cast<uint32_t>(rem), 5);
      b += ln;
    }
    /* scale_factor_data: dpcm chain seeded at global_gain */
    int last = gg;
    for (int i = 0; i < nb; ++i) {
      if (books[i] == 0) continue;
      int d = sfs[i] - last;
      if (d < -60) d = -60;  /* unreachable by construction; bounds guard */
      if (d > 60) d = 60;
      body.put(aactab::sf_codes[d + 60], aactab::sf_lens[d + 60]);
      last += d;
    }
    body.put(0, 1);  /* pulse_data_present */
    body.put(0, 1);  /* tns_data_present */
    body.put(0, 1);  /* gain_control_data_present */
    for (int i = 0; i < nb; ++i)
      if (books[i]) write_spectral(&body, q + swb_[i], swb_[i + 1] - swb_[i],
                                   books[i]);
    body.put(7, 3);  /* END */
    body.pad_to_byte();
    /* ADTS header (7 bytes, protection absent) */
    BitWriter hdr;
    uint32_t flen = static_cast<uint32_t>(body.bytes.size()) + 7;
    hdr.put(0xFFF, 12);
    hdr.put(0, 1);  /* MPEG-4 */
    hdr.put(0, 2);  /* layer */
    hdr.put(1, 1);  /* protection_absent */
    hdr.put(1, 2);  /* profile: AAC-LC */
    hdr.put(static_cast<uint32_t>(sfi_), 4);
    hdr.put(0, 1);
    hdr.put(1, 3);  /* mono */
    hdr.put(0, 1);
    hdr.put(0, 1);
    hdr.put(0, 1);
    hdr.put(0, 1);
    hdr.put(flen, 13);
    hdr.put(0x7FF, 11);
    hdr.put(0, 2);
    out->insert(out->end(), hdr.bytes.begin(), hdr.bytes.end());
    out->insert(out->end(), body.bytes.begin(), body.bytes.end());
  }

  double band_err(const double* X, const int64_t* q, int sf, int b) {
    double err = 0.0;
    for (int k = swb_[b]; k < swb_[b + 1]; ++k) {
      double d = X[k] - dequantize_one(q[k], sf);
      err += d * d;
    }
    return err;
  }

  bool valid_ = false;
  int fs_ = 16000, sfi_ = 8, max_sfb_ = 1, n_swb_ = 0;
  const int16_t* swb_ = nullptr;
  double prev_[1024];
  double frame_bits_mean_ = 0.0, reservoir_ = 0.0;
};

/* ---------------- decoder ---------------- */

struct HuffNode {
  int16_t child[2];  /* >=0: node index; <0: -(symbol+1) */
};

struct DecodeTree {
  vector<HuffNode> nodes;
  void build(const uint32_t* codes, const uint8_t* lens, int n) {
    nodes.clear();
    nodes.push_back({{-32768, -32768}});
    for (int s = 0; s < n; ++s) {
      int len = lens[s];
      if (len == 0) continue;
      int cur = 0;
      for (int b = len - 1; b >= 0; --b) {
        int bit = (codes[s] >> b) & 1;
        if (b == 0) {
          nodes[cur].child[bit] = static_cast<int16_t>(-(s + 1));
        } else {
          if (nodes[cur].child[bit] <= 0) {
            nodes[cur].child[bit] = static_cast<int16_t>(nodes.size());
            nodes.push_back({{-32768, -32768}});
          }
          cur = nodes[cur].child[bit];
        }
      }
    }
  }
  int decode(BitReader* r, size_t limit) const {
    int cur = 0;
    while (true) {
      if (r->pos >= limit) return -1;
      int bit = r->get(1);
      int16_t nxt = nodes[cur].child[bit];
      if (nxt <= 0) {
        if (nxt == -32768) return -1;
        return -nxt - 1;
      }
      cur = nxt;
    }
  }
};

DecodeTree g_spec_trees[12];
DecodeTree g_sf_tree;
bool g_trees_built = false;

void build_trees() {
  if (g_trees_built) return;
  for (int b = 1; b <= 11; ++b)
    g_spec_trees[b].build(aactab::kBookCodes[b], aactab::kBookLens[b],
                          aactab::kBooks[b].size);
  g_sf_tree.build(aactab::sf_codes, aactab::sf_lens, 121);
  g_trees_built = true;
}

class AacDecoder {
 public:
  AacDecoder() {
    init_tables();
    build_trees();
    for (int i = 0; i < 1024; ++i) overlap_[i] = 0.0;
  }

  int sample_rate() const { return fs_; }

  /* decode a whole ADTS stream; returns 0 ok, -1 malformed/unsupported */
  int decode(const uint8_t* data, size_t size, vector<float>* out) {
    size_t i = 0;
    while (i + 7 <= size) {
      if (data[i] != 0xFF || (data[i + 1] & 0xF6) != 0xF0) return -1;
      size_t flen = (static_cast<size_t>(data[i + 3] & 0x03) << 11) |
                    (static_cast<size_t>(data[i + 4]) << 3) |
                    (data[i + 5] >> 5);
      if (flen < 7 || i + flen > size) return -1;
      if (decode_packet(data + i, flen, out) < 0) return -1;
      i += flen;
    }
    return i == size ? 0 : -1;
  }

 private:
  int decode_packet(const uint8_t* pkt, size_t n, vector<float>* out) {
    BitReader bs(pkt, n);
    const size_t limit = n * 8;
    /* ADTS header */
    bs.get(12);  /* sync (already checked) */
    bs.get(1);   /* ID */
    bs.get(2);   /* layer */
    int prot_absent = bs.get(1);
    bs.get(2);   /* profile */
    int sfi = bs.get(4);
    if (sfi == 8) fs_ = 16000;
    else if (sfi == 11) fs_ = 8000;
    else return -1;
    bs.get(1);
    if (bs.get(3) != 1) return -1;  /* mono only */
    bs.get(4);
    bs.get(13);  /* frame length */
    bs.get(11);  /* buffer fullness */
    bs.get(2);   /* raw blocks - 1 */
    if (!prot_absent) bs.get(16);

    bool have_sce = false;
    while (bs.pos + 3 <= limit) {
      int ele = bs.get(3);
      if (ele == 7) break;  /* END */
      if (ele == 0) {       /* SCE */
        bs.get(4);          /* element_instance_tag */
        if (decode_sce(&bs, limit, out) < 0) return -1;
        have_sce = true;
      } else if (ele == 6) {  /* FIL */
        int cnt = bs.get(4);
        if (cnt == 15) cnt += bs.get(8) - 1;
        for (int j = 0; j < cnt; ++j) bs.get(8);
      } else {
        return -1;  /* CPE/LFE/DSE/PCE not emitted by this encoder */
      }
    }
    return have_sce ? 0 : -1;
  }

  int decode_sce(BitReader* bs, size_t limit, vector<float>* out) {
    const int16_t* swb = fs_ == 16000 ? aactab::swb_long_16
                                      : aactab::swb_long_8;
    int n_swb = (fs_ == 16000 ? sizeof(aactab::swb_long_16)
                              : sizeof(aactab::swb_long_8)) /
                    static_cast<int>(sizeof(int16_t)) - 1;
    int gg = bs->get(8);
    if (bs->get(1) != 0) return -1;  /* ics_reserved */
    if (bs->get(2) != 0) return -1;  /* long windows only */
    if (bs->get(1) != 0) return -1;  /* sine window only */
    int max_sfb = bs->get(6);
    if (max_sfb > n_swb) return -1;
    if (bs->get(1) != 0) return -1;  /* predictor (LC) */
    /* section_data */
    int band_cb[64];
    int k = 0;
    while (k < max_sfb) {
      int cb = bs->get(4);
      if (cb > 11) return -1;  /* PNS/intensity not emitted */
      int length = 0, inc;
      do {
        inc = bs->get(5);
        length += inc;
      } while (inc == 31 && bs->pos < limit);
      if (k + length > max_sfb) return -1;
      for (int b = 0; b < length; ++b) band_cb[k + b] = cb;
      k += length;
      if (bs->pos >= limit) return -1;
    }
    /* scale_factor_data */
    int sf[64];
    int last = gg;
    for (int b = 0; b < max_sfb; ++b) {
      sf[b] = 0;
      if (band_cb[b] == 0) continue;
      int idx = g_sf_tree.decode(bs, limit);
      if (idx < 0) return -1;
      last += idx - 60;
      sf[b] = last;
    }
    if (bs->get(1)) return -1;  /* pulse */
    if (bs->get(1)) return -1;  /* tns */
    if (bs->get(1)) return -1;  /* gain control (SSR) */
    /* spectral_data */
    double X[1024];
    for (int i = 0; i < 1024; ++i) X[i] = 0.0;
    for (int b = 0; b < max_sfb; ++b) {
      int cb = band_cb[b];
      if (cb == 0) continue;
      const aactab::BookMeta& m = aactab::kBooks[cb];
      for (int i = swb[b]; i < swb[b + 1]; i += m.dim) {
        int idx = g_spec_trees[cb].decode(bs, limit);
        if (idx < 0) return -1;
        int64_t vals[4];
        if (m.is_signed) {
          for (int d = m.dim - 1; d >= 0; --d) {
            vals[d] = idx % (2 * m.lav + 1) - m.lav;
            idx /= (2 * m.lav + 1);
          }
        } else {
          for (int d = m.dim - 1; d >= 0; --d) {
            vals[d] = idx % (m.lav + 1);
            idx /= (m.lav + 1);
          }
          for (int d = 0; d < m.dim; ++d)
            if (vals[d] && bs->get(1)) vals[d] = -vals[d];
          if (cb == 11) {
            for (int d = 0; d < m.dim; ++d) {
              int64_t a = vals[d] < 0 ? -vals[d] : vals[d];
              if (a == 16) {
                int nb2 = 4;
                while (bs->get(1) && bs->pos < limit) ++nb2;
                int64_t word = bs->get(nb2);
                int64_t mag = (1ll << nb2) + word;
                vals[d] = vals[d] < 0 ? -mag : mag;
              }
            }
          }
        }
        for (int d = 0; d < m.dim && i + d < swb[b + 1]; ++d)
          X[i + d] = dequantize_one(vals[d], sf[b]);
      }
    }
    if (bs->pos > limit) return -1;
    /* IMDCT + sine-window overlap-add */
    double t[2048];
    imdct_inverse(X, t);
    for (int i = 0; i < 2048; ++i) t[i] *= g_win[i];
    for (int i = 0; i < 1024; ++i)
      out->push_back(static_cast<float>(t[i] + overlap_[i]));
    for (int i = 0; i < 1024; ++i) overlap_[i] = t[1024 + i];
    return 0;
  }

  int fs_ = 16000;
  double overlap_[1024];
};

}  // namespace

extern "C" {

/* Encode mono float [-1,1] -> AAC-LC ADTS bytes.  Returns bytes written,
 * or -1 on unsupported sample_rate / overflow.  Size `out` via
 * aac_encode_bound. */
long aac_encode(const float* in, size_t n, int sample_rate, int kbps,
                uint8_t* out, size_t out_cap) {
  AacEncoder enc(sample_rate, kbps * 1000);
  if (!enc.valid()) return -1;
  vector<uint8_t> buf;
  size_t pos = 0;
  double frame[1024];
  while (pos < n) {
    size_t m = std::min<size_t>(1024, n - pos);
    for (size_t i = 0; i < m; ++i) frame[i] = in[pos + i] * kPcmScale;
    for (size_t i = m; i < 1024; ++i) frame[i] = 0.0;
    enc.encode_frame(frame, &buf);
    pos += 1024;
  }
  /* flush the 1024-sample overlap */
  for (int i = 0; i < 1024; ++i) frame[i] = 0.0;
  enc.encode_frame(frame, &buf);
  if (buf.size() > out_cap) return -1;
  std::memcpy(out, buf.data(), buf.size());
  return static_cast<long>(buf.size());
}

size_t aac_encode_bound(size_t n, int sample_rate, int kbps) {
  size_t frames = n / 1024 + 3;
  size_t fb = static_cast<size_t>(
      kbps * 1000.0 * 1024.0 / (8.0 * (sample_rate > 0 ? sample_rate : 16000)));
  return frames * (5 * fb + 64) + 1024;
}

/* Decode ADTS AAC-LC bytes (this encoder's emission set: mono SCE, long
 * sine windows) -> mono float PCM.  Returns samples written (up to
 * max_samples) or -1 on malformed/unsupported input. */
long aac_decode(const uint8_t* data, size_t size, float* out,
                size_t max_samples, int* sample_rate_out) {
  AacDecoder dec;
  vector<float> pcm;
  if (dec.decode(data, size, &pcm) < 0) return -1;
  if (sample_rate_out) *sample_rate_out = dec.sample_rate();
  size_t m = std::min(pcm.size(), max_samples);
  for (size_t i = 0; i < m; ++i) out[i] = pcm[i] / kPcmScale;
  return static_cast<long>(m);
}

/* Full compression hop: encode at kbps, decode, align the deterministic
 * 1024-sample codec delay (encoder frame buffering; the MDCT overlap
 * itself is centered) and write n samples back. */
void aac_roundtrip(const float* in, float* out, size_t n, int sample_rate,
                   float bitrate_kbps) {
  const long kDelay = 1024;
  size_t cap = aac_encode_bound(n, sample_rate, (int)bitrate_kbps);
  vector<uint8_t> buf(cap);
  long nb = aac_encode(in, n, sample_rate, (int)bitrate_kbps, buf.data(), cap);
  if (nb < 0) {  /* unsupported config: pass through */
    std::memcpy(out, in, n * sizeof(float));
    return;
  }
  vector<float> pcm(n + 4096);
  int sr = 0;
  long m = aac_decode(buf.data(), nb, pcm.data(), pcm.size(), &sr);
  if (m < 0) {
    std::memcpy(out, in, n * sizeof(float));
    return;
  }
  for (size_t i = 0; i < n; ++i) {
    long j = static_cast<long>(i) + kDelay;
    out[i] = j < m ? pcm[j] : 0.0f;
  }
}

}  /* extern "C" */
