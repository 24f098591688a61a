/* MPEG-1/MPEG-2 Audio Layer III (mp3) encoder + decoder, from scratch.
 *
 * Replaces the external mp3 tool the reference shells out to for its
 * DF compression augmentation (/root/reference/channel_simulation/
 * simulated_compression.py:11-13: mp3 at 8/16/32 kbps).  16 kHz mono is
 * the native operating point (MPEG-2 LSF); MPEG-1 rates (32/44.1/48 kHz)
 * are also supported.
 *
 * Encoder: polyphase analysis (512-tap ISO window) -> 36-point MDCT with
 * inverse alias butterflies -> Shine-style rate control (all-zero
 * scalefactors, global_gain binary search) -> Huffman coding with
 * per-region table selection + count1 tables -> frame packing with a bit
 * reservoir.  Decoder: full Layer III mono path — long blocks, short
 * blocks (sfb reorder, subblock gains, 12-point IMDCT), transition
 * window types 1/3, MPEG-1 and LSF scalefactors incl. scfsi reuse, bit
 * reservoir — verified sample-identical (>126 dB) against the system's
 * reference decoder on default-settings LAME streams at every Layer III
 * rate, as well as on its own streams.
 *
 * All ISO tables in mp3_tables.h were recovered and verified by black-box
 * probing of the system's reference MPEG decoder (tools/mp3_tables/).
 * Validation: tests/test_mp3.py round-trips through this codec AND
 * cross-checks both directions against libmpg123/libmp3lame when present.
 */
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include "mp3_tables.h"

namespace {

using std::vector;

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
  bool eof() const { return pos >= size * 8; }
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

/* ---------------- shared constants ---------------- */

const double kCi[8] = {-0.6, -0.535, -0.33, -0.185,
                       -0.095, -0.041, -0.0142, -0.0037};
double kCs[8], kCa[8];
double kMdctM[36][18];     /* cos(pi/72 (2i+1+18)(2k+1)) */
double kMdctWin[36];       /* sin(pi/36 (i+0.5)) (block type 0) */
double kWinStart[36];      /* block type 1 (long->short transition) */
double kWinStop[36];       /* block type 3 (short->long transition) */
double kMdctMS[12][6];     /* short: cos(pi/24 (2i+1+6)(2k+1)) */
double kMdctWinS[12];      /* short: sin(pi/12 (i+0.5)) */
double kSynthN[64][32];    /* cos((2k+1)(j+16)pi/64) */
double kAnaM[32][64];      /* cos((2k+1)(j-16)pi/64) */
bool g_init_done = false;

void init_tables() {
  if (g_init_done) return;
  for (int j = 0; j < 8; ++j) {
    kCs[j] = 1.0 / std::sqrt(1.0 + kCi[j] * kCi[j]);
    kCa[j] = kCi[j] / std::sqrt(1.0 + kCi[j] * kCi[j]);
  }
  for (int i = 0; i < 36; ++i) {
    kMdctWin[i] = std::sin(M_PI / 36.0 * (i + 0.5));
    for (int k = 0; k < 18; ++k)
      kMdctM[i][k] = std::cos(M_PI / 72.0 * (2 * i + 1 + 18) * (2 * k + 1));
  }
  for (int i = 0; i < 36; ++i) {
    /* ISO transition windows: start = long rise, flat, short fall;
     * stop = mirrored */
    if (i < 18) kWinStart[i] = std::sin(M_PI / 36.0 * (i + 0.5));
    else if (i < 24) kWinStart[i] = 1.0;
    else if (i < 30) kWinStart[i] = std::sin(M_PI / 12.0 * (i - 18 + 0.5));
    else kWinStart[i] = 0.0;
    if (i < 6) kWinStop[i] = 0.0;
    else if (i < 12) kWinStop[i] = std::sin(M_PI / 12.0 * (i - 6 + 0.5));
    else if (i < 18) kWinStop[i] = 1.0;
    else kWinStop[i] = std::sin(M_PI / 36.0 * (i + 0.5));
  }
  for (int i = 0; i < 12; ++i) {
    kMdctWinS[i] = std::sin(M_PI / 12.0 * (i + 0.5));
    for (int k = 0; k < 6; ++k)
      kMdctMS[i][k] = std::cos(M_PI / 24.0 * (2 * i + 1 + 6) * (2 * k + 1));
  }
  for (int j = 0; j < 64; ++j)
    for (int k = 0; k < 32; ++k)
      kSynthN[j][k] = std::cos((2 * k + 1) * (j + 16) * M_PI / 64.0);
  for (int k = 0; k < 32; ++k)
    for (int j = 0; j < 64; ++j)
      kAnaM[k][j] = std::cos((2 * k + 1) * (j - 16) * M_PI / 64.0);
  g_init_done = true;
}

/* header tables */
const int kBitrate1[15] = {0, 32, 40, 48, 56, 64, 80, 96,
                           112, 128, 160, 192, 224, 256, 320};
const int kBitrate2[15] = {0, 8, 16, 24, 32, 40, 48, 56,
                           64, 80, 96, 112, 128, 144, 160};
const int kSr1[3] = {44100, 48000, 32000};
const int kSr2[3] = {22050, 24000, 16000};

int sr_index(int sr, int* mpeg) {
  for (int i = 0; i < 3; ++i) {
    if (kSr1[i] == sr) { *mpeg = 1; return i; }
    if (kSr2[i] == sr) { *mpeg = 2; return i; }
  }
  return -1;
}

/* ---------------- encoder ---------------- */

struct GranuleData {
  int part2_3_length = 0;
  int big_values = 0;
  int global_gain = 210;
  int table_select[3] = {0, 0, 0};
  int region0_count = 7;
  int region1_count = 7;
  int count1table_select = 1;
  vector<uint8_t> bits;  /* 0/1 per entry */
};

struct PairCost {
  bool ok;
  int bits;
};

PairCost huff_cost(int tno, const int* ix, int lo, int hi) {
  const mp3tab::HuffTable& h = mp3tab::kHuff[tno];
  if (h.codes == nullptr) return {false, 0};
  int maxv = h.linbits ? 15 + ((1 << h.linbits) - 1) : h.xlen - 1;
  int total = 0;
  for (int i = lo; i < hi; i += 2) {
    int ax = std::abs(ix[i]), ay = std::abs(ix[i + 1]);
    if (ax > maxv || ay > maxv) return {false, 0};
    int cx = ax > 15 ? 15 : ax, cy = ay > 15 ? 15 : ay;
    if (cx >= h.xlen || cy >= h.ylen) return {false, 0};
    /* a literal 15 needs the escape path in linbits tables; same index */
    total += h.lens[cx * h.ylen + cy];
    if (cx == 15 && h.linbits) total += h.linbits;
    if (cy == 15 && h.linbits) total += h.linbits;
    total += (ax ? 1 : 0) + (ay ? 1 : 0);
  }
  return {true, total};
}

const int kNonEsc[13] = {1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 13, 15};

int table_capacity(int tno) {
  const mp3tab::HuffTable& h = mp3tab::kHuff[tno];
  if (h.codes == nullptr) return -1;
  return h.linbits ? 15 + ((1 << h.linbits) - 1) : h.xlen - 1;
}

int best_table(const int* ix, int lo, int hi, int* cost_out) {
  int mx = 0;
  for (int i = lo; i < hi; ++i) mx = std::max(mx, std::abs(ix[i]));
  if (hi <= lo || mx == 0) { *cost_out = 0; return 0; }
  int best = -1, best_cost = 0;
  for (int t = 0; t < 13; ++t) {
    if (table_capacity(kNonEsc[t]) < mx) continue;
    PairCost c = huff_cost(kNonEsc[t], ix, lo, hi);
    if (c.ok && (best < 0 || c.bits < best_cost)) {
      best = kNonEsc[t];
      best_cost = c.bits;
    }
  }
  for (int t = 16; t < 32; ++t) {
    if (table_capacity(t) < mx) continue;
    PairCost c = huff_cost(t, ix, lo, hi);
    if (c.ok && (best < 0 || c.bits < best_cost)) {
      best = t;
      best_cost = c.bits;
    }
  }
  *cost_out = best_cost;
  return best;  /* -1 if nothing fits */
}

void write_bigpair(BitWriter* w, int tno, int x, int y) {
  const mp3tab::HuffTable& h = mp3tab::kHuff[tno];
  int ax = std::abs(x), ay = std::abs(y);
  int cx = ax > 15 ? 15 : ax, cy = ay > 15 ? 15 : ay;
  int idx = cx * h.ylen + cy;
  w->put(h.codes[idx], h.lens[idx]);
  if (cx == 15 && h.linbits) w->put(ax - 15, h.linbits);
  if (ax) w->put(x < 0 ? 1 : 0, 1);
  if (cy == 15 && h.linbits) w->put(ay - 15, h.linbits);
  if (ay) w->put(y < 0 ? 1 : 0, 1);
}

/* encode one granule's quantized spectrum; returns false if a value
 * exceeds every table (caller coarsens quantization) */
bool granule_encode(const int* ix, const int16_t* sfb, GranuleData* out) {
  int nz = 576;
  while (nz > 0 && ix[nz - 1] == 0) --nz;
  int c1 = nz;
  while (c1 > 0 && std::abs(ix[c1 - 1]) <= 1) --c1;
  if (c1 & 1) ++c1;
  int n_quads = (nz - c1 + 3) / 4;
  int big_values = c1 / 2;
  if (big_values > 288) return false;

  /* region partition search: boundaries snap to scalefactor bands; the
   * best (region0_count, region1_count) split lets each region use a
   * cheaper Huffman table */
  /* region1_count is a 3-bit field: candidates must keep r1 <= 7 */
  static const int kR0R1[][2] = {{7, 7}, {4, 3}, {2, 2}, {9, 5},
                                 {12, 3}, {15, 5}, {0, 1}, {5, 7}};
  int r0 = 7, r1 = 7, sel[3] = {0, 0, 0}, cost = -1;
  int bounds[4] = {0, 0, 0, c1};
  /* candidates share boundaries: memoize (lo,hi) -> (table, bits) */
  struct Memo { int lo, hi, tno, bits; };
  Memo memo[24];
  int n_memo = 0;
  auto region_best = [&](int lo, int hi, int* c) {
    for (int m = 0; m < n_memo; ++m)
      if (memo[m].lo == lo && memo[m].hi == hi) {
        *c = memo[m].bits;
        return memo[m].tno;
      }
    int tno = best_table(ix, lo, hi, c);
    if (n_memo < 24) memo[n_memo++] = {lo, hi, tno, *c};
    return tno;
  };
  for (const auto& cand : kR0R1) {
    int b1 = std::min<int>(sfb[cand[0] + 1], c1);
    int b2 = std::min<int>(sfb[std::min(cand[0] + cand[1] + 2, 22)], c1);
    int cb[4] = {0, b1, b2, c1};
    int csel[3], ccost = 0;
    bool ok = true;
    for (int r = 0; r < 3; ++r) {
      int c;
      csel[r] = region_best(cb[r], cb[r + 1], &c);
      if (csel[r] < 0) { ok = false; break; }
      ccost += c;
    }
    if (!ok) continue;
    if (cost < 0 || ccost < cost) {
      cost = ccost;
      r0 = cand[0]; r1 = cand[1];
      for (int r = 0; r < 3; ++r) sel[r] = csel[r];
      for (int r = 0; r < 4; ++r) bounds[r] = cb[r];
    }
  }
  if (cost < 0) return false;
  /* count1 table choice */
  int costA = 0, costB = 0;
  for (int q = 0; q < n_quads; ++q) {
    int base = c1 + 4 * q;
    int idx = 0, signs = 0;
    for (int j = 0; j < 4; ++j) {
      int v = base + j < 576 ? ix[base + j] : 0;
      if (std::abs(v) > 1) return false;
      idx = (idx << 1) | (v != 0);
      signs += v != 0;
    }
    costA += mp3tab::kCount1A_lens[idx] + signs;
    costB += 4 + signs;
  }
  bool use_b = costB < costA;
  cost += use_b ? costB : costA;

  BitWriter w;
  for (int r = 0; r < 3; ++r) {
    if (sel[r] == 0) continue;
    for (int i = bounds[r]; i < bounds[r + 1]; i += 2)
      write_bigpair(&w, sel[r], ix[i], ix[i + 1]);
  }
  for (int q = 0; q < n_quads; ++q) {
    int base = c1 + 4 * q;
    int v[4], idx = 0;
    for (int j = 0; j < 4; ++j) {
      v[j] = base + j < 576 ? ix[base + j] : 0;
      idx = (idx << 1) | (v[j] != 0);
    }
    if (use_b)
      w.put(~idx & 0xF, 4);
    else
      w.put(mp3tab::kCount1A_codes[idx], mp3tab::kCount1A_lens[idx]);
    for (int j = 0; j < 4; ++j)
      if (v[j]) w.put(v[j] < 0 ? 1 : 0, 1);
  }
  w.pad_to_byte();  /* we track exact bit count separately */
  out->part2_3_length = cost;
  out->big_values = big_values;
  out->table_select[0] = sel[0];
  out->table_select[1] = sel[1];
  out->table_select[2] = sel[2];
  out->region0_count = r0;
  out->region1_count = r1;
  out->count1table_select = use_b ? 1 : 0;
  out->bits.clear();
  for (int i = 0; i < cost; ++i) {
    int byte = i >> 3, bit = 7 - (i & 7);
    out->bits.push_back((w.bytes[byte] >> bit) & 1);
  }
  return true;
}

void quantize(const double* xr, int gg, int* ix) {
  double step = std::pow(2.0, (gg - 210) / 4.0);
  for (int i = 0; i < 576; ++i) {
    double q = std::pow(std::fabs(xr[i]) / step, 0.75) + 0.4054;
    int v = static_cast<int>(q);  /* floor for q >= 0 */
    ix[i] = xr[i] < 0 ? -v : v;
  }
}

/* rate loop: smallest global_gain (finest step) fitting the bit budget */
bool encode_granule(const double* xr, const int16_t* sfb, int budget,
                    GranuleData* out) {
  int lo = 0, hi = 255;
  bool have = false;
  GranuleData best;
  int ix[576];
  while (lo <= hi) {
    int gg = (lo + hi) / 2;
    quantize(xr, gg, ix);
    int mx = 0;
    for (int i = 0; i < 576; ++i) mx = std::max(mx, std::abs(ix[i]));
    GranuleData g;
    if (mx <= 15 + 8191 && granule_encode(ix, sfb, &g) &&
        g.part2_3_length <= budget) {
      g.global_gain = gg;
      best = g;
      have = true;
      hi = gg - 1;
    } else {
      lo = gg + 1;
    }
  }
  if (have) *out = best;
  return have;
}

class Mp3Encoder {
 public:
  Mp3Encoder(int sample_rate, int kbps)
      : sr_(sample_rate), kbps_(kbps) {
    init_tables();
    sr_idx_ = sr_index(sample_rate, &mpeg_);
    sfb_ = mp3tab::kSfbLong[mpeg_ - 1][sr_idx_];
    std::memset(fifo_, 0, sizeof(fifo_));
    std::memset(prev_, 0, sizeof(prev_));
    granules_per_frame_ = mpeg_ == 1 ? 2 : 1;
    frame_bytes_ = (mpeg_ == 1 ? 144 : 72) * kbps * 1000 / sample_rate;
    header_side_bytes_ = 4 + (mpeg_ == 1 ? 17 : 9);
    cap_ = frame_bytes_ - header_side_bytes_;
    mdb_max_ = mpeg_ == 1 ? 511 : 255;
  }
  bool valid() const {
    if (sr_idx_ < 0) return false;
    const int* br = mpeg_ == 1 ? kBitrate1 : kBitrate2;
    for (int i = 1; i < 15; ++i)
      if (br[i] == kbps_) return true;
    return false;
  }

  /* feed 576 samples -> one granule; emits frames into out when ready */
  void push_granule(const double* x, vector<uint8_t>* out) {
    double S[18][32];
    for (int t = 0; t < 18; ++t) {
      /* shift 32 newest (reversed) into the 512 fifo */
      std::memmove(fifo_ + 32, fifo_, sizeof(double) * 480);
      for (int i = 0; i < 32; ++i) fifo_[i] = x[t * 32 + 31 - i];
      double Y[64];
      for (int j = 0; j < 64; ++j) {
        double acc = 0;
        for (int b = 0; b < 8; ++b)
          acc += fifo_[j + 64 * b] * mp3tab::kAnalysisWindow[j + 64 * b];
        Y[j] = acc;
      }
      for (int k = 0; k < 32; ++k) {
        double acc = 0;
        for (int j = 0; j < 64; ++j) acc += kAnaM[k][j] * Y[j];
        S[t][k] = acc;
      }
    }
    /* MDCT with previous granule + frequency inversion + butterflies */
    double xr[576];
    for (int sb = 0; sb < 32; ++sb) {
      double seg[36];
      for (int i = 0; i < 18; ++i) seg[i] = prev_[i][sb];
      for (int i = 0; i < 18; ++i) seg[18 + i] = S[i][sb];
      if (sb & 1)
        for (int i = 1; i < 36; i += 2) seg[i] = -seg[i];
      for (int k = 0; k < 18; ++k) {
        double acc = 0;
        for (int i = 0; i < 36; ++i)
          acc += kMdctM[i][k] * seg[i] * kMdctWin[i];
        xr[sb * 18 + k] = acc / 9.0;
      }
    }
    std::memcpy(prev_, S, sizeof(S));
    for (int b = 1; b < 32; ++b) {
      for (int j = 0; j < 8; ++j) {
        int lo = 18 * b - 1 - j, hi = 18 * b + j;
        double a = xr[lo], c = xr[hi];
        xr[lo] = a * kCs[j] + c * kCa[j];
        xr[hi] = c * kCs[j] - a * kCa[j];
      }
    }
    /* rate control with reservoir borrowing.  Placement model: granule
     * data streams contiguously into frames' main-data slots starting at
     * slot 0; main_data_begin_i = i*cap - data_start_i >= 0 is how far
     * frame i's data reaches back into earlier frames' slots.  A frame's
     * data must end within its own slots: L_i <= cap + mdb_i.  Frames are
     * assembled in flush() because a frame's trailing slot bytes hold
     * FUTURE frames' data (this is what makes the reservoir work). */
    int pending_bits = 0;
    for (const GranuleData& g : pending_) pending_bits += g.part2_3_length;
    int remaining = granules_per_frame_ - static_cast<int>(pending_.size());
    int avail = (cap_ + mdb_sim_) * 8 - pending_bits - 7;  /* byte pad */
    int budget = avail / (remaining > 0 ? remaining : 1);
    if (budget > 4088) budget = 4088;  /* part2_3_length is 12 bits */
    if (budget < 0) budget = 0;
    GranuleData g;
    if (!encode_granule(xr, sfb_, budget, &g)) {
      g = GranuleData();  /* silence granule (coarsest always fits) */
    }
    pending_.push_back(g);
    if (static_cast<int>(pending_.size()) == granules_per_frame_)
      finish_frame();
    (void)out;
  }

  void flush(vector<uint8_t>* out) {
    if (!pending_.empty()) {
      while (static_cast<int>(pending_.size()) < granules_per_frame_)
        pending_.push_back(GranuleData());
      finish_frame();
    }
    /* assemble: data stream with per-frame stuffing, then interleave
     * headers with cap_-byte slot regions */
    vector<uint8_t> stream;
    for (const FrameRec& f : frames_) {
      stream.insert(stream.end(), f.data.begin(), f.data.end());
      stream.insert(stream.end(), f.stuffing, 0);
    }
    stream.resize(frames_.size() * cap_, 0);  /* trailing ancillary */
    for (size_t i = 0; i < frames_.size(); ++i) {
      write_header_side(frames_[i], out);
      out->insert(out->end(), stream.begin() + i * cap_,
                  stream.begin() + (i + 1) * cap_);
    }
    frames_.clear();
  }

 private:
  struct FrameRec {
    GranuleData gr[2];
    vector<uint8_t> data;  /* byte-padded granule bits */
    int stuffing = 0;
    int mdb = 0;
  };

  void finish_frame() {
    FrameRec f;
    f.mdb = mdb_sim_;
    for (int i = 0; i < granules_per_frame_; ++i) f.gr[i] = pending_[i];
    vector<uint8_t> bitbuf;
    for (const GranuleData& g : pending_)
      for (uint8_t b : g.bits) bitbuf.push_back(b);
    while (bitbuf.size() % 8) bitbuf.push_back(0);
    for (size_t i = 0; i < bitbuf.size(); i += 8) {
      uint8_t v = 0;
      for (int j = 0; j < 8; ++j) v = (v << 1) | bitbuf[i + j];
      f.data.push_back(v);
    }
    pending_.clear();
    int L = static_cast<int>(f.data.size());
    /* keep the next frame's main_data_begin within reach */
    int stuff = mdb_sim_ + cap_ - L - mdb_max_;
    f.stuffing = stuff > 0 ? stuff : 0;
    mdb_sim_ = mdb_sim_ + cap_ - L - f.stuffing;
    if (mdb_sim_ < 0) mdb_sim_ = 0;  /* budget rule prevents this */
    frames_.push_back(std::move(f));
  }

  void write_header_side(const FrameRec& f, vector<uint8_t>* out) {
    BitWriter w;
    w.put(0x7FF, 11);
    w.put(mpeg_ == 1 ? 3 : 2, 2);
    w.put(1, 2);             /* layer III */
    w.put(1, 1);             /* no CRC */
    const int* br = mpeg_ == 1 ? kBitrate1 : kBitrate2;
    int bidx = 0;
    for (int i = 1; i < 15; ++i)
      if (br[i] == kbps_) bidx = i;
    w.put(bidx, 4);
    w.put(sr_idx_, 2);
    w.put(0, 1); w.put(0, 1);             /* padding, private */
    w.put(3, 2); w.put(0, 2);             /* mono, mode_ext */
    w.put(0, 1); w.put(1, 1); w.put(0, 2);  /* copy, original, emphasis */
    if (mpeg_ == 1) {
      w.put(f.mdb, 9);
      w.put(0, 5);
      w.put(0, 4);  /* scfsi */
      for (int gi = 0; gi < 2; ++gi) {
        const GranuleData& g = f.gr[gi];
        w.put(g.part2_3_length, 12);
        w.put(g.big_values, 9);
        w.put(g.global_gain, 8);
        w.put(0, 4);  /* scalefac_compress */
        w.put(0, 1);  /* window_switching */
        for (int r = 0; r < 3; ++r) w.put(g.table_select[r], 5);
        w.put(g.region0_count, 4);
        w.put(g.region1_count, 3);
        w.put(0, 1);  /* preflag */
        w.put(0, 1);  /* scalefac_scale */
        w.put(g.count1table_select, 1);
      }
    } else {
      w.put(f.mdb, 8);
      w.put(0, 1);
      const GranuleData& g = f.gr[0];
      w.put(g.part2_3_length, 12);
      w.put(g.big_values, 9);
      w.put(g.global_gain, 8);
      w.put(0, 9);  /* scalefac_compress (LSF) */
      w.put(0, 1);
      for (int r = 0; r < 3; ++r) w.put(g.table_select[r], 5);
      w.put(g.region0_count, 4);
      w.put(g.region1_count, 3);
      w.put(0, 1);  /* scalefac_scale */
      w.put(g.count1table_select, 1);
    }
    out->insert(out->end(), w.bytes.begin(), w.bytes.end());
  }

  int sr_, kbps_, mpeg_ = 0, sr_idx_ = -1;
  const int16_t* sfb_ = nullptr;
  int granules_per_frame_ = 1, frame_bytes_ = 0, header_side_bytes_ = 0;
  int cap_ = 0, mdb_max_ = 255;
  double fifo_[512];
  double prev_[18][32];
  vector<GranuleData> pending_;
  vector<FrameRec> frames_;
  int mdb_sim_ = 0;
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
      if (len == 0 && s != 0) continue;
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
        return -(nxt)-1;
      }
      cur = nxt;
    }
  }
};

DecodeTree g_trees[32];
DecodeTree g_count1a;
bool g_trees_built = false;

void build_trees() {
  if (g_trees_built) return;
  for (int t = 0; t < 32; ++t) {
    const mp3tab::HuffTable& h = mp3tab::kHuff[t];
    if (h.codes) g_trees[t].build(h.codes, h.lens, h.xlen * h.ylen);
  }
  uint32_t codes32[16];
  for (int i = 0; i < 16; ++i) codes32[i] = mp3tab::kCount1A_codes[i];
  g_count1a.build(codes32, mp3tab::kCount1A_lens, 16);
  g_trees_built = true;
}

struct SideGranule {
  int part2_3_length, big_values, global_gain, scalefac_compress;
  int window_switching, block_type = 0, mixed = 0;
  int table_select[3];
  int region0_count, region1_count;
  int preflag, scalefac_scale, count1table_select;
  int subblock_gain[3] = {0, 0, 0};
};

struct FrameInfo {
  int mpeg, sr, sr_idx, kbps, frame_bytes, granules, mdb;
  int scfsi[4];
  SideGranule gr[2];
  size_t main_off;  /* byte offset of main data within the frame */
};

/* MPEG-1 scalefac_compress -> (slen1, slen2) */
const int kSlen1[16] = {0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4};
const int kSlen2[16] = {0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3};
const int kPretab[22] = {0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
                         1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0};

bool parse_header(const uint8_t* p, size_t n, FrameInfo* f) {
  if (n < 4) return false;
  if (p[0] != 0xFF || (p[1] & 0xE0) != 0xE0) return false;
  int version = (p[1] >> 3) & 3;       /* 3=MPEG1, 2=MPEG2, 0=MPEG2.5 */
  int layer = (p[1] >> 1) & 3;         /* 1 = layer III */
  if (layer != 1) return false;
  if (version != 3 && version != 2) return false;
  f->mpeg = version == 3 ? 1 : 2;
  int prot = p[1] & 1;
  int bidx = (p[2] >> 4) & 0xF;
  int sridx = (p[2] >> 2) & 3;
  int padding = (p[2] >> 1) & 1;
  int mode = (p[3] >> 6) & 3;
  if (bidx == 0 || bidx == 15 || sridx == 3) return false;
  if (mode != 3) return false;  /* mono only */
  f->sr_idx = sridx;
  f->sr = f->mpeg == 1 ? kSr1[sridx] : kSr2[sridx];
  f->kbps = f->mpeg == 1 ? kBitrate1[bidx] : kBitrate2[bidx];
  f->frame_bytes = (f->mpeg == 1 ? 144 : 72) * f->kbps * 1000 / f->sr +
                   padding;
  f->granules = f->mpeg == 1 ? 2 : 1;
  f->main_off = 4 + (prot ? 0 : 2) + (f->mpeg == 1 ? 17 : 9);
  if (f->frame_bytes <= 0 ||
      static_cast<size_t>(f->frame_bytes) > n) return false;
  /* side info */
  BitReader r(p + 4 + (prot ? 0 : 2), n - 4);
  if (f->mpeg == 1) {
    f->mdb = r.get(9);
    r.get(5);
    for (int i = 0; i < 4; ++i) f->scfsi[i] = r.get(1);
    for (int gi = 0; gi < 2; ++gi) {
      SideGranule& g = f->gr[gi];
      g.part2_3_length = r.get(12);
      g.big_values = r.get(9);
      g.global_gain = r.get(8);
      g.scalefac_compress = r.get(4);
      g.window_switching = r.get(1);
      if (g.window_switching) {
        g.block_type = r.get(2);
        g.mixed = r.get(1);
        g.table_select[0] = r.get(5);
        g.table_select[1] = r.get(5);
        g.table_select[2] = 0;
        for (int i = 0; i < 3; ++i) g.subblock_gain[i] = r.get(3);
        g.region0_count = g.block_type == 2 && !g.mixed ? 8 : 7;
        g.region1_count = 20 - g.region0_count;
      } else {
        for (int i = 0; i < 3; ++i) g.table_select[i] = r.get(5);
        g.region0_count = r.get(4);
        g.region1_count = r.get(3);
        g.block_type = 0;
      }
      g.preflag = r.get(1);
      g.scalefac_scale = r.get(1);
      g.count1table_select = r.get(1);
    }
  } else {
    f->mdb = r.get(8);
    r.get(1);
    SideGranule& g = f->gr[0];
    g.part2_3_length = r.get(12);
    g.big_values = r.get(9);
    g.global_gain = r.get(8);
    g.scalefac_compress = r.get(9);
    g.window_switching = r.get(1);
    if (g.window_switching) {
      g.block_type = r.get(2);
      g.mixed = r.get(1);
      g.table_select[0] = r.get(5);
      g.table_select[1] = r.get(5);
      g.table_select[2] = 0;
      for (int i = 0; i < 3; ++i) g.subblock_gain[i] = r.get(3);
      g.region0_count = g.block_type == 2 && !g.mixed ? 8 : 7;
      g.region1_count = 20 - g.region0_count;
    } else {
      for (int i = 0; i < 3; ++i) g.table_select[i] = r.get(5);
      g.region0_count = r.get(4);
      g.region1_count = r.get(3);
      g.block_type = 0;
    }
    g.preflag = 0;  /* LSF: folded into scalefac_compress >= 500 */
    g.scalefac_scale = r.get(1);
    g.count1table_select = r.get(1);
  }
  return true;
}

class Mp3Decoder {
 public:
  Mp3Decoder() {
    init_tables();
    build_trees();
    std::memset(overlap_, 0, sizeof(overlap_));
    std::memset(v_fifo_, 0, sizeof(v_fifo_));
  }

  /* decode whole stream; appends samples to out; returns sample rate */
  int decode(const uint8_t* data, size_t n, vector<float>* out) {
    size_t pos = 0;
    int sr = 0;
    while (pos + 4 <= n) {
      FrameInfo f;
      if (!parse_header(data + pos, n - pos, &f)) {
        ++pos;
        continue;
      }
      sr = f.sr;
      decode_frame(data + pos, &f, out);
      pos += f.frame_bytes;
    }
    return sr;
  }

 private:
  void decode_frame(const uint8_t* p, FrameInfo* f, vector<float>* out) {
    /* reservoir: append this frame's main-data bytes, locate start */
    size_t frame_main = f->frame_bytes - f->main_off;
    size_t start_in_res = reservoir_.size();
    for (size_t i = 0; i < frame_main; ++i)
      reservoir_.push_back(p[f->main_off + i]);
    if (static_cast<size_t>(f->mdb) > start_in_res) return;  /* missing */
    size_t begin = start_in_res - f->mdb;
    BitReader r(reservoir_.data(), reservoir_.size());
    r.pos = begin * 8;
    for (int gi = 0; gi < f->granules; ++gi) {
      double xr[576];
      int btype = 0;
      if (!decode_granule(&r, f, gi, xr, &btype)) {
        std::memset(xr, 0, sizeof(xr));
        btype = 0;
      }
      synth_granule(xr, btype, out);
    }
    /* trim reservoir (keep the max addressable backlog) */
    size_t keep = 512;
    if (reservoir_.size() > keep + frame_main) {
      size_t drop = reservoir_.size() - keep - frame_main;
      reservoir_.erase(reservoir_.begin(), reservoir_.begin() + drop);
    }
  }

  bool decode_granule(BitReader* r, FrameInfo* f, int gi, double* xr,
                      int* btype_out) {
    const SideGranule& g = f->gr[gi];
    size_t limit = r->pos + g.part2_3_length;
    bool short_block = g.window_switching && g.block_type == 2;
    *btype_out = g.window_switching ? g.block_type : 0;
    int scalefac[22] = {0};
    int scalefac_s[13][3] = {{0}};
    if (short_block && g.mixed) {
      /* mixed blocks: not emitted by this encoder nor by LAME defaults */
      r->pos = limit;
      return false;
    }
    if (short_block && f->mpeg == 1) {
      /* 12 short bands x 3 windows, band-major (scfsi does not apply) */
      int s1 = kSlen1[g.scalefac_compress], s2 = kSlen2[g.scalefac_compress];
      for (int b = 0; b < 12; ++b) {
        int sl = b < 6 ? s1 : s2;
        for (int w = 0; w < 3; ++w)
          scalefac_s[b][w] = sl ? static_cast<int>(r->get(sl)) : 0;
      }
    } else if (short_block) {
      /* LSF short: the slen partitions scale to 36 scalefactors */
      int sfc = g.scalefac_compress;
      int slen[4], nr[4];
      if (sfc < 400) {
        slen[0] = (sfc >> 4) / 5; slen[1] = (sfc >> 4) % 5;
        slen[2] = (sfc & 15) >> 2; slen[3] = sfc & 3;
        nr[0] = 9; nr[1] = 9; nr[2] = 9; nr[3] = 9;
      } else if (sfc < 500) {
        int c = sfc - 400;
        slen[0] = (c >> 2) / 5; slen[1] = (c >> 2) % 5;
        slen[2] = c & 3; slen[3] = 0;
        nr[0] = 9; nr[1] = 9; nr[2] = 12; nr[3] = 6;
      } else {
        int c = sfc - 500;
        slen[0] = c / 3; slen[1] = c % 3; slen[2] = 0; slen[3] = 0;
        nr[0] = 18; nr[1] = 18; nr[2] = 0; nr[3] = 0;
      }
      int idx = 0;
      for (int part = 0; part < 4; ++part)
        for (int i = 0; i < nr[part] && idx < 36; ++i, ++idx)
          scalefac_s[idx / 3][idx % 3] =
              slen[part] ? static_cast<int>(r->get(slen[part])) : 0;
    } else if (f->mpeg == 1) {
      /* scfsi reuse applies to any LONG-layout granule 1 — including the
       * window-switching transition types 1/3 (LAME emits this); only
       * short blocks always re-read */
      int s1 = kSlen1[g.scalefac_compress], s2 = kSlen2[g.scalefac_compress];
      for (int b = 0; b < 11; ++b) {
        if (gi == 1 && f->scfsi[b < 6 ? 0 : 1]) {
          scalefac[b] = prev_scalefac_[b];
        } else if (s1) {
          scalefac[b] = r->get(s1);
        }
      }
      for (int b = 11; b < 21; ++b) {
        if (gi == 1 && f->scfsi[b < 16 ? 2 : 3]) {
          scalefac[b] = prev_scalefac_[b];
        } else if (s2) {
          scalefac[b] = r->get(s2);
        }
      }
      for (int b = 0; b < 21; ++b) prev_scalefac_[b] = scalefac[b];
    } else {
      /* LSF scalefactors, non-intensity mono (ISO 13818-3) */
      int sfc = g.scalefac_compress;
      int slen[4], nr[4], preflag = 0;
      if (sfc < 400) {
        slen[0] = (sfc >> 4) / 5;
        slen[1] = (sfc >> 4) % 5;
        slen[2] = (sfc & 15) >> 2;
        slen[3] = sfc & 3;
        nr[0] = 6; nr[1] = 5; nr[2] = 5; nr[3] = 5;
      } else if (sfc < 500) {
        int c = sfc - 400;
        slen[0] = (c >> 2) / 5;
        slen[1] = (c >> 2) % 5;
        slen[2] = c & 3;
        slen[3] = 0;
        nr[0] = 6; nr[1] = 5; nr[2] = 7; nr[3] = 3;
      } else {
        int c = sfc - 500;
        slen[0] = c / 3;
        slen[1] = c % 3;
        slen[2] = 0;
        slen[3] = 0;
        nr[0] = 11; nr[1] = 10; nr[2] = 0; nr[3] = 0;
        preflag = 1;
      }
      int b = 0;
      for (int part = 0; part < 4; ++part)
        for (int i = 0; i < nr[part] && b < 21; ++i, ++b)
          scalefac[b] = slen[part] ? r->get(slen[part]) : 0;
      if (preflag)
        for (int bb = 0; bb < 21; ++bb) scalefac[bb] += kPretab[bb];
    }
    /* ---- Huffman data ---- */
    const int16_t* sfb = mp3tab::kSfbLong[f->mpeg - 1][f->sr_idx];
    int ix[576] = {0};
    /* big_values is a 9-bit field (max 511) but only 288 pairs fit the
     * spectrum; clamp so hostile streams cannot write past ix[576] */
    int bv2 = std::min(g.big_values, 288) * 2;
    int bounds[4];
    if (g.window_switching) {
      /* fixed regions, no region2: short blocks end region0 at 36 stored
       * coefficients; transition types 1/3 at sfbLong[8] (both measured
       * by probing the reference decoder, tools/mp3_tables/learn_short) */
      int r0 = short_block ? mp3tab::kShortRegion0 : sfb[8];
      int b1 = std::min<int>(r0, bv2);
      bounds[0] = 0; bounds[1] = b1; bounds[2] = bv2; bounds[3] = bv2;
    } else {
      int b1 = std::min<int>(sfb[g.region0_count + 1], bv2);
      int b2 = std::min<int>(
          sfb[std::min(g.region0_count + g.region1_count + 2, 22)], bv2);
      bounds[0] = 0; bounds[1] = b1; bounds[2] = b2; bounds[3] = bv2;
    }
    for (int reg = 0; reg < 3; ++reg) {
      int tno = g.table_select[reg];
      const mp3tab::HuffTable& h = mp3tab::kHuff[tno];
      for (int i = bounds[reg]; i < bounds[reg + 1]; i += 2) {
        if (tno == 0 || h.codes == nullptr) { continue; }
        int sym = g_trees[tno].decode(r, limit);
        if (sym < 0) return false;
        int x = sym / h.ylen, y = sym % h.ylen;
        if (x == 15 && h.linbits) x += r->get(h.linbits);
        if (x && r->pos < limit && r->get(1)) x = -x;
        if (y == 15 && h.linbits) y += r->get(h.linbits);
        if (y && r->pos < limit && r->get(1)) y = -y;
        ix[i] = x;
        ix[i + 1] = y;
      }
    }
    /* count1 */
    int pos = bv2;
    while (r->pos < limit && pos <= 572) {
      int quad;
      if (g.count1table_select) {
        if (limit - r->pos < 4) break;
        quad = ~static_cast<int>(r->get(4)) & 0xF;
      } else {
        quad = g_count1a.decode(r, limit);
        if (quad < 0) break;
      }
      for (int j = 3; j >= 0; --j) {
        int v = (quad >> j) & 1;
        if (v) {
          /* sign bits missing at region end are dropped (matches the
           * reference decoder's tolerant count1 parse) */
          v = r->pos >= limit ? 0 : (r->get(1) ? -1 : 1);
        }
        ix[pos + (3 - j)] = v;
      }
      pos += 4;
    }
    r->pos = limit;
    /* ---- requantize ---- */
    double gain = std::pow(2.0, (g.global_gain - 210) / 4.0);
    double sf_mult = g.scalefac_scale ? 1.0 : 0.5;
    if (short_block) {
      /* stored order is scalefactor-band-major (W lines of window 0,
       * then 1, then 2); requantize with the per-window gain and reorder
       * into window-major spectra xr[w*192 + line] for the short IMDCT */
      const int16_t* sfbS = mp3tab::kSfbShort[f->mpeg - 1][f->sr_idx];
      double wgain[3];
      for (int w = 0; w < 3; ++w)
        wgain[w] = gain * std::pow(2.0, -2.0 * g.subblock_gain[w]);
      std::memset(xr, 0, sizeof(double) * 576);
      int pos = 0;
      for (int b = 0; b < 13 && pos < 576; ++b) {
        int W = sfbS[b + 1] - sfbS[b];
        for (int w = 0; w < 3; ++w) {
          /* band 12 (beyond the scalefactored range) uses scalefac 0 */
          int sf = b < 12 ? scalefac_s[b][w] : 0;
          double sc = wgain[w] * std::pow(2.0, -sf_mult * sf);
          for (int l = 0; l < W; ++l, ++pos) {
            double v = std::pow(std::fabs(static_cast<double>(ix[pos])),
                                4.0 / 3.0);
            xr[w * 192 + sfbS[b] + l] = (ix[pos] < 0 ? -v : v) * sc;
          }
        }
      }
      return true;
    }
    int band = 0;
    for (int i = 0; i < 576; ++i) {
      while (band < 21 && i >= sfb[band + 1]) ++band;
      int sf = scalefac[band] +
               (f->mpeg == 1 && g.preflag ? kPretab[band] : 0);
      double s = gain * std::pow(2.0, -sf_mult * sf);
      double v = std::pow(std::fabs(static_cast<double>(ix[i])), 4.0 / 3.0);
      xr[i] = (ix[i] < 0 ? -v : v) * s;
    }
    return true;
  }

  void synth_granule(const double* xr_in, int btype, vector<float>* out) {
    double xr[576];
    std::memcpy(xr, xr_in, sizeof(xr));
    if (btype != 2) {
      /* alias reduction (long and transition windows only) */
      for (int b = 1; b < 32; ++b) {
        for (int j = 0; j < 8; ++j) {
          int lo = 18 * b - 1 - j, hi = 18 * b + j;
          double a = xr[lo], c = xr[hi];
          xr[lo] = a * kCs[j] - c * kCa[j];
          xr[hi] = c * kCs[j] + a * kCa[j];
        }
      }
    }
    /* IMDCT + overlap-add -> S[18][32] */
    double S[18][32];
    const double* win = btype == 1 ? kWinStart
                        : (btype == 3 ? kWinStop : kMdctWin);
    for (int sb = 0; sb < 32; ++sb) {
      double z[36];
      if (btype == 2) {
        /* three 12-point IMDCTs (6 lines each per window), short-sine
         * windowed, composed at 6-sample offsets starting at 6 */
        for (int i = 0; i < 36; ++i) z[i] = 0.0;
        for (int w = 0; w < 3; ++w) {
          const double* X = xr + w * 192 + sb * 6;
          for (int i = 0; i < 12; ++i) {
            double acc = 0;
            for (int k = 0; k < 6; ++k) acc += kMdctMS[i][k] * X[k];
            z[6 + 6 * w + i] += acc * kMdctWinS[i];
          }
        }
      } else {
        for (int i = 0; i < 36; ++i) {
          double acc = 0;
          for (int k = 0; k < 18; ++k)
            acc += kMdctM[i][k] * xr[sb * 18 + k];
          z[i] = acc * win[i];
        }
      }
      for (int i = 0; i < 18; ++i) {
        S[i][sb] = z[i] + overlap_[sb][i];
        overlap_[sb][i] = z[18 + i];
      }
    }
    /* frequency inversion (odd subband, odd global step) */
    for (int i = 0; i < 18; ++i) {
      if ((step_ + i) & 1)
        for (int sb = 1; sb < 32; sb += 2) S[i][sb] = -S[i][sb];
    }
    step_ += 18;
    /* polyphase synthesis */
    for (int t = 0; t < 18; ++t) {
      std::memmove(v_fifo_ + 64, v_fifo_, sizeof(double) * (1024 - 64));
      for (int j = 0; j < 64; ++j) {
        double acc = 0;
        for (int k = 0; k < 32; ++k) acc += kSynthN[j][k] * S[t][k];
        v_fifo_[j] = acc;
      }
      double U[512];
      for (int i = 0; i < 8; ++i) {
        for (int j = 0; j < 32; ++j) {
          U[i * 64 + j] = v_fifo_[i * 128 + j];
          U[i * 64 + 32 + j] = v_fifo_[i * 128 + 96 + j];
        }
      }
      for (int j = 0; j < 32; ++j) {
        double acc = 0;
        for (int i = 0; i < 16; ++i)
          acc += mp3tab::kSynthWindow[j + 32 * i] * U[j + 32 * i];
        out->push_back(static_cast<float>(acc));
      }
    }
  }

  vector<uint8_t> reservoir_;
  double overlap_[32][18];
  double v_fifo_[1024];
  int prev_scalefac_[22] = {0};
  long step_ = 0;
};

}  // namespace

extern "C" {

/* Encode mono float [-1,1] -> mp3 bytes.  Returns bytes written, or -1 on
 * unsupported (sample_rate, kbps).  `out` must hold at least
 * n * kbps / (8 * sample_rate) + 4 * frame_size bytes (call
 * mp3_encode_bound). */
long mp3_encode(const float* in, size_t n, int sample_rate, int kbps,
                uint8_t* out, size_t out_cap) {
  Mp3Encoder enc(sample_rate, kbps);
  if (!enc.valid()) return -1;
  vector<uint8_t> buf;
  size_t pos = 0;
  double gran[576];
  while (pos < n) {
    size_t m = std::min<size_t>(576, n - pos);
    for (size_t i = 0; i < m; ++i) gran[i] = in[pos + i];
    for (size_t i = m; i < 576; ++i) gran[i] = 0.0;
    enc.push_granule(gran, &buf);
    pos += 576;
  }
  enc.flush(&buf);
  if (buf.size() > out_cap) return -1;
  std::memcpy(out, buf.data(), buf.size());
  return static_cast<long>(buf.size());
}

size_t mp3_encode_bound(size_t n, int sample_rate, int kbps) {
  size_t frames = n / 576 + 4;
  size_t fb = static_cast<size_t>(
      (sample_rate >= 32000 ? 144 : 72) * kbps * 1000 /
      (sample_rate > 0 ? sample_rate : 16000)) + 2;
  return frames * fb + 1024;
}

/* Decode mp3 bytes -> mono float PCM.  Returns samples written (up to
 * max_samples) or -1 on malformed input; *sample_rate_out receives the
 * stream's rate. */
long mp3_decode(const uint8_t* data, size_t size, float* out,
                size_t max_samples, int* sample_rate_out) {
  Mp3Decoder dec;
  vector<float> pcm;
  int sr = dec.decode(data, size, &pcm);
  if (sr == 0) return -1;
  if (sample_rate_out) *sample_rate_out = sr;
  size_t m = std::min(pcm.size(), max_samples);
  std::memcpy(out, pcm.data(), m * sizeof(float));
  return static_cast<long>(m);
}

/* Full compression hop: encode at kbps, decode, align (fixed codec delay)
 * and write n samples back.  sample_rate must be a Layer III rate
 * (16 kHz -> MPEG-2 LSF).  The codec delay of this encoder/decoder pair
 * is 481 (analysis/synthesis) + 576 (granule buffering) + 252
 * (MDCT overlap center) = deterministic; measured once = 1057 samples. */
void mp3_roundtrip(const float* in, float* out, size_t n, int sample_rate,
                   float bitrate_kbps) {
  const long kDelay = 1057;
  /* pad two zero granules so the delayed tail is fully emitted */
  vector<float> padded(n + 1152, 0.0f);
  std::memcpy(padded.data(), in, n * sizeof(float));
  size_t np = padded.size();
  size_t cap = mp3_encode_bound(np, sample_rate, (int)bitrate_kbps);
  vector<uint8_t> buf(cap);
  long nb = mp3_encode(padded.data(), np, sample_rate, (int)bitrate_kbps,
                       buf.data(), cap);
  if (nb < 0) {  /* unsupported config: pass through */
    std::memcpy(out, in, n * sizeof(float));
    return;
  }
  vector<float> pcm(np + 4096);
  int sr = 0;
  long m = mp3_decode(buf.data(), nb, pcm.data(), pcm.size(), &sr);
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
