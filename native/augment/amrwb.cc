/* AMR-WB 12.65 kbps codec — EXACT decoder replica + AbS encoder.
 *
 * Round-5 rewrite on the fully recovered lavc pipeline
 * (tools/amrwb_tables/truedec.py is the validated Python reference:
 * 0.9997 waveform corr vs the in-image lavc decoder on fully random
 * bitstreams).  The decoder here ports that model 1:1; the encoder
 * runs analysis-by-synthesis against an embedded replica so encoder
 * and decoder state stay in lockstep.
 *
 * Pipeline (TS 26.190 structure, constants/tables binary-exact from
 * the lavc image — see native/augment/amrwb_truth.h):
 *   bits -> {ISF split-MSVQ + mean + MA(1/3) + reorder 1/256}
 *        -> ISP cos(2pi .) (entry 15 doubled) -> interpolated A(z)
 *   exc  -> gp * interp(past exc, 65-tap 1/4-phase kernel, in place)
 *         + gc * 2-pulse-per-track code (tilt + 0.85 sharpening)
 *        -> integer-truncated adaptive memory; enhanced (noise/pitch
 *           enhancer) synthesis excitation
 *   out  -> 1/A -> de-emphasis 0.68 -> 31 Hz HPF -> 5/4 polyphase
 *           upsample (23-tap phase FIRs) -> /32768
 *
 * Matches the reference's amrwb channel entries
 * (/root/reference/channel_simulation/simulated_channel.py:33-35).
 */

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include "amrwb_truth.h"

namespace wb {

constexpr int kBits = 253;          // 12.65k speech bits (legacy name)
constexpr int kMaxBits = 477;
constexpr int kSub = 64;
constexpr int kFrame = 256;
constexpr int kPayload = 32;
constexpr int kHist = 256;          // exc history kept behind the frame
constexpr double kScale = 1.0 / 32768.0;

/* ------------------------------------------------ bit packing ---- */
struct Bits {
  uint8_t b[kMaxBits];
  void clear() { std::memset(b, 0, sizeof(b)); }
  int get(const int* map, int n) const {
    int v = 0;
    for (int i = 0; i < n; ++i) v = (v << 1) | b[map[i]];
    return v;
  }
  void put(const int* map, int n, int v) {
    for (int i = 0; i < n; ++i) b[map[i]] = (v >> (n - 1 - i)) & 1;
  }
};

/* --------------------------------------------- mode layouts ------
 * Parsed from the serialized per-mode order tables
 * (wbt::kLayouts, extracted from the lavc binary). */
struct ModeLayout {
  int nbits = 0, nbytes = 0, n_isf = 7, tracks = 4, spacing = 4;
  bool low = false;                  // 6k60 / 8k85
  std::vector<int> vad, isf[7], lag[4], ltp[4], gain[4], hbe[4];
  std::vector<std::vector<int>> code[4];
};

inline const ModeLayout& layout(int mode) {
  static ModeLayout lays[9];
  static bool init = false;
  if (!init) {
    for (int m = 0; m < 9; ++m) {
      ModeLayout& L = lays[m];
      L.nbits = wbt::kModeBits[m];
      L.nbytes = wbt::kModeSizes[m];
      L.low = m <= 1;
      L.tracks = (m == 0) ? 2 : 4;
      L.spacing = (m == 0) ? 2 : 4;
      const int* p = wbt::kLayouts[m];
      const int* end = p + wbt::kLayoutLens[m];
      int nisf = 0;
      while (p < end) {
        int id = p[0], n = p[1];
        std::vector<int> bitsv(p + 2, p + 2 + n);
        p += 2 + n;
        if (id == 0) L.vad = bitsv;
        else if (id <= 7) { L.isf[id - 1] = bitsv; nisf = id; }
        else if (id < 20) L.lag[id - 10] = bitsv;
        else if (id < 30) L.ltp[id - 20] = bitsv;
        else if (id < 40) L.gain[id - 30] = bitsv;
        else if (id < 50) L.hbe[id - 40] = bitsv;
        else {
          int sf = (id - 50) / 8;
          L.code[sf].push_back(bitsv);
        }
      }
      L.n_isf = nisf;
    }
    init = true;
  }
  return lays[mode];
}

/* --------------------------------- pulse-index laws (all modes) --
 * From the amrwbdec.o disassembly (decode_1p..6p_track): sign bit 0
 * -> positive; in each 2p pair the high-bits position keeps the pair
 * sign and the other flips when the keeper's position is larger.
 * Track-local positions; at most 6 pulses. */
struct Pulses {
  int n = 0;
  int pos[6];
  float sg[6];
  void add(int p, float s) { pos[n] = p; sg[n] = s; ++n; }
};

inline void dec_1p(int v, int m, int base, Pulses* o) {
  o->add(base + (v & ((1 << m) - 1)), ((v >> m) & 1) ? -1.0f : 1.0f);
}
inline void dec_2p(int v, int m, int base, Pulses* o) {
  int mask = (1 << m) - 1;
  int b = (v >> m) & mask, a = v & mask;
  float s1 = ((v >> (2 * m)) & 1) ? -1.0f : 1.0f;
  o->add(base + b, s1);
  o->add(base + a, b <= a ? s1 : -s1);
}
inline void dec_3p(int v, int m, int base, Pulses* o) {
  int half = ((v >> (2 * m - 1)) & 1) << (m - 1);
  dec_2p(v & ((1 << (2 * m - 1)) - 1), m - 1, base + half, o);
  dec_1p(v >> (2 * m), m, base, o);
}
inline void dec_4p(int v, int m, int base, Pulses* o) {
  int cas = (v >> (4 * m - 2)) & 3;
  int b_off = 1 << (m - 1);
  if (cas == 0) {
    int half = ((v >> (4 * m - 3)) & 1) << (m - 1);
    int sub = ((v >> (2 * m - 3)) & 1) << (m - 2);
    dec_2p(v & ((1 << (2 * m - 3)) - 1), m - 2, base + half + sub, o);
    dec_2p((v >> (2 * m - 2)) & ((1 << (2 * m - 1)) - 1), m - 1,
           base + half, o);
  } else if (cas == 1) {
    dec_1p((v >> (3 * m - 2)) & ((1 << m) - 1), m - 1, base, o);
    dec_3p(v & ((1 << (3 * m - 2)) - 1), m - 1, base + b_off, o);
  } else if (cas == 2) {
    dec_2p((v >> (2 * m - 1)) & ((1 << (2 * m - 1)) - 1), m - 1, base, o);
    dec_2p(v & ((1 << (2 * m - 1)) - 1), m - 1, base + b_off, o);
  } else {
    dec_3p((v >> m) & ((1 << (3 * m - 2)) - 1), m - 1, base, o);
    dec_1p(v & ((1 << m) - 1), m - 1, base + b_off, o);
  }
}
inline void dec_5p(int v, int m, int base, Pulses* o) {
  int half = ((v >> (5 * m - 1)) & 1) << (m - 1);
  dec_3p((v >> (2 * m + 1)) & ((1 << (3 * m - 2)) - 1), m - 1,
         base + half, o);
  dec_2p(v & ((1 << (2 * m + 1)) - 1), m, base, o);
}
inline void dec_6p(int v, int m, int base, Pulses* o) {
  int cas = (v >> (6 * m - 4)) & 3;
  int b_off = 1 << (m - 1);
  int h_more = ((v >> (6 * m - 5)) & 1) << (m - 1);
  int h_other = b_off - h_more;
  if (cas == 0 || cas == 1) {
    dec_1p(v & ((1 << m) - 1), m - 1,
           base + (cas == 0 ? h_more : h_other), o);
    dec_2p((v >> m) & ((1 << (2 * m - 1)) - 1), m - 1, base + h_more, o);
    int quarter = ((v >> (6 * m - 6)) & 1) << (m - 2);
    dec_3p((v >> (3 * m - 1)) & ((1 << (3 * m - 5)) - 1), m - 2,
           base + h_more + quarter, o);
  } else if (cas == 2) {
    dec_2p(v & ((1 << (2 * m - 1)) - 1), m - 1, base + h_other, o);
    dec_4p((v >> (2 * m - 1)) & ((1 << (4 * m - 4)) - 1), m - 1,
           base + h_more, o);
  } else {
    dec_3p((v >> (3 * m - 2)) & ((1 << (3 * m - 2)) - 1), m - 1, base, o);
    dec_3p(v & ((1 << (3 * m - 2)) - 1), m - 1, base + b_off, o);
  }
}

inline int track_pulses(int mode, int t);

/* ------------------------- pulse-index ENCODERS (inverse laws) ---
 * Input: track-local pulse multisets (pos, sign). Every P-multiset is
 * encodable: the half/quarter constraints are pigeonhole-guaranteed.
 * Pulses are picked out of a small working list by index. */
struct PulseList {
  int n = 0;
  int pos[6];
  int neg[6];  // 1 = negative
  void add(int p, int s) { pos[n] = p; neg[n] = s; ++n; }
  void remove_at(int i) { --n; pos[i] = pos[n]; neg[i] = neg[n]; }
};

inline int enc_1p(int p, int neg, int m) { return (neg << m) | p; }

inline int enc_2p(int p1, int n1, int p2, int n2, int m) {
  int b, a, s;
  if (n1 == n2) {
    b = std::min(p1, p2); a = std::max(p1, p2); s = n1;
  } else {
    // keeper (high bits) must be the larger position; its sign rules
    if (p1 > p2) { b = p1; a = p2; s = n1; }
    else { b = p2; a = p1; s = n2; }
  }
  return (s << (2 * m)) | (b << m) | a;
}

/* pick two pulses sharing a section (pos >> shift equal); returns
 * indices via i/j and removes them from l */
inline void take_pair_in_section(PulseList* l, int shift, int* pa,
                                 int* na, int* pb, int* nb) {
  for (int i = 0; i < l->n; ++i)
    for (int j = i + 1; j < l->n; ++j)
      if ((l->pos[i] >> shift) == (l->pos[j] >> shift)) {
        *pa = l->pos[i]; *na = l->neg[i];
        *pb = l->pos[j]; *nb = l->neg[j];
        l->remove_at(j);
        l->remove_at(i);
        return;
      }
  // unreachable when the caller's pigeonhole precondition holds
  *pa = l->pos[0]; *na = l->neg[0];
  *pb = l->pos[1]; *nb = l->neg[1];
  l->remove_at(1);
  l->remove_at(0);
}

inline int enc_3p(PulseList l, int m) {
  int p1, n1, p2, n2;
  take_pair_in_section(&l, m - 1, &p1, &n1, &p2, &n2);
  int h = p1 >> (m - 1);
  int mask = (1 << (m - 1)) - 1;
  int v2 = enc_2p(p1 & mask, n1, p2 & mask, n2, m - 1);
  int v1 = enc_1p(l.pos[0], l.neg[0], m);
  return (v1 << (2 * m)) | (h << (2 * m - 1)) | v2;
}

inline int enc_4p(PulseList l, int m) {
  int half = 1 << (m - 1), mask = half - 1;
  int u = 0;
  for (int i = 0; i < l.n; ++i) u += l.pos[i] >> (m - 1);
  if (u == 0 || u == 4) {
    int hbit = u == 4;
    PulseList loc;
    for (int i = 0; i < 4; ++i) loc.add(l.pos[i] & mask, l.neg[i]);
    int p1, n1, p2, n2;
    take_pair_in_section(&loc, m - 2, &p1, &n1, &p2, &n2);
    int sub = p1 >> (m - 2);
    int smask = (1 << (m - 2)) - 1;
    int v2s = enc_2p(p1 & smask, n1, p2 & smask, n2, m - 2);
    int v2h = enc_2p(loc.pos[0], loc.neg[0], loc.pos[1], loc.neg[1],
                     m - 1);
    return (0 << (4 * m - 2)) | (hbit << (4 * m - 3)) |
           (v2h << (2 * m - 2)) | (sub << (2 * m - 3)) | v2s;
  }
  if (u == 2) {
    PulseList lo, hi;
    for (int i = 0; i < 4; ++i)
      (l.pos[i] < half ? lo : hi).add(l.pos[i] & mask, l.neg[i]);
    int v2lo = enc_2p(lo.pos[0], lo.neg[0], lo.pos[1], lo.neg[1], m - 1);
    int v2hi = enc_2p(hi.pos[0], hi.neg[0], hi.pos[1], hi.neg[1], m - 1);
    return (2 << (4 * m - 2)) | (v2lo << (2 * m - 1)) | v2hi;
  }
  // u==3: case 1 (1 lower + 3 upper); u==1: case 3 (3 lower + 1 upper)
  PulseList lo, hi;
  for (int i = 0; i < 4; ++i)
    (l.pos[i] < half ? lo : hi).add(l.pos[i] & mask, l.neg[i]);
  if (u == 3) {
    int v1 = enc_1p(lo.pos[0], lo.neg[0], m - 1);
    int v3 = enc_3p(hi, m - 1);
    return (1 << (4 * m - 2)) | (v1 << (3 * m - 2)) | v3;
  }
  int v3 = enc_3p(lo, m - 1);
  int v1 = enc_1p(hi.pos[0], hi.neg[0], m - 1);
  return (3 << (4 * m - 2)) | (v3 << m) | v1;
}

inline int enc_5p(PulseList l, int m) {
  int half = 1 << (m - 1), mask = half - 1;
  int u = 0;
  for (int i = 0; i < 5; ++i) u += l.pos[i] >> (m - 1);
  int hbit = u >= 3;
  PulseList in, rest;
  for (int i = 0; i < 5; ++i) {
    if (in.n < 3 && (l.pos[i] >> (m - 1)) == hbit)
      in.add(l.pos[i] & mask, l.neg[i]);
    else
      rest.add(l.pos[i], l.neg[i]);
  }
  int v3 = enc_3p(in, m - 1);
  int v2 = enc_2p(rest.pos[0], rest.neg[0], rest.pos[1], rest.neg[1], m);
  return (hbit << (5 * m - 1)) | (v3 << (2 * m + 1)) | v2;
}

inline int enc_6p(PulseList l, int m) {
  int half = 1 << (m - 1), mask = half - 1;
  PulseList lo, hi;
  for (int i = 0; i < 6; ++i)
    (l.pos[i] < half ? lo : hi).add(l.pos[i] & mask, l.neg[i]);
  if (lo.n == 3) {
    int v3lo = enc_3p(lo, m - 1);
    int v3hi = enc_3p(hi, m - 1);
    return (3 << (6 * m - 4)) | (v3lo << (3 * m - 2)) | v3hi;
  }
  PulseList& more = lo.n > hi.n ? lo : hi;
  PulseList& other = lo.n > hi.n ? hi : lo;
  int hm = (&more == &hi) ? 1 : 0;
  if (more.n == 4) {
    int v4 = enc_4p(more, m - 1);
    int v2 = enc_2p(other.pos[0], other.neg[0], other.pos[1],
                    other.neg[1], m - 1);
    return (2 << (6 * m - 4)) | (hm << (6 * m - 5)) |
           (v4 << (2 * m - 1)) | v2;
  }
  // 5+1 (case 1) or 6+0 (case 0): 3 in a quarter + 2p + 1p in `more`
  PulseList q3;
  int qbit = 0;
  {
    int cnt[2] = {0, 0};
    for (int i = 0; i < more.n; ++i) cnt[more.pos[i] >> (m - 2)]++;
    qbit = cnt[1] >= 3;
    int smask = (1 << (m - 2)) - 1;
    PulseList rest;
    for (int i = 0; i < more.n; ++i) {
      if (q3.n < 3 && (more.pos[i] >> (m - 2)) == qbit)
        q3.add(more.pos[i] & smask, more.neg[i]);
      else
        rest.add(more.pos[i], more.neg[i]);
    }
    more = rest;
  }
  int v3 = enc_3p(q3, m - 2);
  int v2 = enc_2p(more.pos[0], more.neg[0], more.pos[1], more.neg[1],
                  m - 1);
  int cas, p1, n1;
  if (other.n == 1) {
    cas = 1; p1 = other.pos[0]; n1 = other.neg[0];
  } else {
    cas = 0; p1 = more.pos[2]; n1 = more.neg[2];
  }
  int v1 = enc_1p(p1, n1, m - 1);
  return (cas << (6 * m - 4)) | (hm << (6 * m - 5)) |
         (qbit << (6 * m - 6)) | (v3 << (3 * m - 1)) | (v2 << m) | v1;
}

/* encode a track-local pulse multiset to the mode's track word */
inline int enc_track_pulses(int mode, int t, const PulseList& l) {
  switch (track_pulses(mode, t)) {
    case 1: return enc_1p(l.pos[0], l.neg[0], mode == 0 ? 5 : 4);
    case 2: return enc_2p(l.pos[0], l.neg[0], l.pos[1], l.neg[1], 4);
    case 3: return enc_3p(l, 4);
    case 4: return enc_4p(l, 4);
    case 5: return enc_5p(l, 4);
    default: return enc_6p(l, 4);
  }
}

/* pulse count / slot structure per mode+track (slots: some tracks
 * split the code word over an (ih, il) slot pair in the layout) */
inline int track_pulses(int mode, int t) {
  switch (mode) {
    case 0: case 1: return 1;
    case 2: return 2;
    case 3: return t < 2 ? 3 : 2;
    case 4: return 3;
    case 5: return 4;
    case 6: return t < 2 ? 5 : 4;
    default: return 6;
  }
}

/* decode one track's code word (already assembled from its slots)
 * into track-local pulses */
inline void dec_track_pulses(int mode, int t, int v, Pulses* o) {
  o->n = 0;
  switch (track_pulses(mode, t)) {
    case 1: dec_1p(v, mode == 0 ? 5 : 4, 0, o); break;
    case 2: dec_2p(v, 4, 0, o); break;
    case 3: dec_3p(v, 4, 0, o); break;
    case 4: dec_4p(v, 4, 0, o); break;
    case 5: dec_5p(v, 4, 0, o); break;
    default: dec_6p(v, 4, 0, o); break;
  }
}

/* assemble per-track code words from the layout's slot values; vals
 * follow the layout order (ih[0..T-1] then il[0..T-1] when split) */
inline void track_words(int mode, const int* vals, int nvals,
                        int words[4]) {
  const ModeLayout& L = layout(mode);
  if (nvals == L.tracks) {
    for (int t = 0; t < L.tracks; ++t) words[t] = vals[t];
    return;
  }
  // split slots: code = (ih << il_bits) | il
  for (int t = 0; t < 4; ++t) {
    int il_bits = mode == 5 ? 14 : mode == 6 ? (t < 2 ? 10 : 14) : 11;
    words[t] = (vals[t] << il_bits) | vals[4 + t];
  }
}

/* ------------------------------------------------ ISF <-> A ------ */
inline void isf_residual(const int idx[7], double r[16]) {
  // float-order adds, as the lavc dequant does (each element scaled
  // by 2^-15 in float, then the stage-2 element added in float)
  float rf[16];
  for (int i = 0; i < 9; ++i) rf[i] = wbt::k_d1[idx[0]][i] * (float)kScale;
  for (int i = 0; i < 7; ++i)
    rf[9 + i] = wbt::k_d2[idx[1]][i] * (float)kScale;
  for (int i = 0; i < 3; ++i) rf[i] += wbt::k_d21[idx[2]][i] * (float)kScale;
  for (int i = 0; i < 3; ++i)
    rf[3 + i] += wbt::k_d22[idx[3]][i] * (float)kScale;
  for (int i = 0; i < 3; ++i)
    rf[6 + i] += wbt::k_d23[idx[4]][i] * (float)kScale;
  for (int i = 0; i < 3; ++i)
    rf[9 + i] += wbt::k_d24[idx[5]][i] * (float)kScale;
  for (int i = 0; i < 4; ++i)
    rf[12 + i] += wbt::k_d25[idx[6]][i] * (float)kScale;
  for (int i = 0; i < 16; ++i) r[i] = rf[i];
}

inline void isf_to_isp(const double isf[16], double isp[16]) {
  for (int i = 0; i < 15; ++i) isp[i] = std::cos(2.0 * M_PI * isf[i]);
  isp[15] = std::cos(4.0 * M_PI * isf[15]);
}

inline void isp_to_a(const double isp[16], double a[17]) {
  double f1[18] = {1.0};
  for (int i = 0; i < 8; ++i) {
    double q = isp[2 * i];
    // convolve f1 with (1, -2q, 1)
    double tmp[18];
    int len = 2 * i + 1;
    for (int j = 0; j < len + 2; ++j) {
      double v = 0.0;
      if (j < len) v += f1[j];
      if (j >= 1 && j - 1 < len) v += -2.0 * q * f1[j - 1];
      if (j >= 2 && j - 2 < len) v += f1[j - 2];
      tmp[j] = v;
    }
    std::memcpy(f1, tmp, (len + 2) * sizeof(double));
  }
  double f2[18] = {1.0, 0.0, -1.0};
  for (int i = 0; i < 7; ++i) {
    double q = isp[2 * i + 1];
    double tmp[18];
    int len = 2 * i + 3;
    for (int j = 0; j < len + 2; ++j) {
      double v = 0.0;
      if (j < len) v += f2[j];
      if (j >= 1 && j - 1 < len) v += -2.0 * q * f2[j - 1];
      if (j >= 2 && j - 2 < len) v += f2[j - 2];
      tmp[j] = v;
    }
    std::memcpy(f2, tmp, (len + 2) * sizeof(double));
  }
  double a16 = isp[15];
  for (int i = 0; i < 17; ++i)
    a[i] = 0.5 * ((1.0 + a16) * f1[i] + (1.0 - a16) * f2[i]);
}

/* A(z) -> normalized isf (encoder side; root-finding on F1/F2). */
inline void a_to_isf(const double a[17], double isf[16]) {
  double f1[17], f2[17];
  for (int i = 0; i < 17; ++i) {
    f1[i] = a[i] + a[16 - i];
    f2[i] = a[i] - a[16 - i];
  }
  // deflate f2 by (1 - z^-2)
  double f2d[15];
  {
    double r[17];
    std::memcpy(r, f2, sizeof(r));
    double q1[16];
    for (int i = 0; i < 16; ++i) {
      q1[i] = r[i];
      r[i + 1] += q1[i];
    }
    double* rr = q1;
    for (int i = 0; i < 15; ++i) {
      f2d[i] = rr[i];
      rr[i + 1] -= f2d[i];
    }
  }
  auto roots_of = [](const double* p, int deg, int expect, double* ang) {
    // evaluate on a fine cosine grid; p is symmetric -> use Chebyshev
    // form: P(w) = sum p[i] cos((deg/2-i) w) over half
    int found = 0;
    int half = deg / 2;
    auto val = [&](double w) {
      double s = p[half];
      for (int i = 0; i < half; ++i)
        s += 2.0 * p[i] * std::cos((half - i) * w);
      return s;
    };
    double prev = val(0.0);
    double pw = 0.0;
    for (int g = 1; g <= 4096 && found < expect; ++g) {
      double w = M_PI * g / 4096.0;
      double v = val(w);
      if (prev == 0.0) prev = 1e-12;
      if (v == 0.0 || (v > 0) != (prev > 0)) {
        double lo = pw, hi = w;
        for (int it = 0; it < 40; ++it) {
          double mid = 0.5 * (lo + hi);
          if ((val(mid) > 0) == (prev > 0)) lo = mid; else hi = mid;
        }
        ang[found++] = 0.5 * (lo + hi);
      }
      prev = v;
      pw = w;
    }
    while (found < expect) ang[found++] = M_PI * 0.98;
  };
  double t1[8], t2[7];
  roots_of(f1, 16, 8, t1);
  roots_of(f2d, 14, 7, t2);
  for (int i = 0; i < 8; ++i) isf[2 * i] = t1[i] / (2.0 * M_PI);
  for (int i = 0; i < 7; ++i) isf[2 * i + 1] = t2[i] / (2.0 * M_PI);
  double a16 = std::max(-1.0, std::min(1.0, a[16]));
  isf[15] = std::acos(a16) / (4.0 * M_PI);
}

/* ------------------------------------------------ lag laws -------
 * RAW lavc form (amrwbdec.asm 18c1-1916 / 22b9-2315 / 397d): lag_int
 * with frac in {-2..2}; the raw lag_int IS the pitch-sharpening
 * integer, and base = clip(lag_int - 8 - (frac<0), 34, 216), updated
 * on ABSOLUTE subframes only. */
inline void dec_lag_abs(int idx, int* T, int* frac) {
  if (idx < 376) {
    *T = (idx + 137) >> 2;
    *frac = ((idx + 137) & 3) - 1;
  } else if (idx < 440) {
    *T = (idx - 119) >> 1;
    *frac = (((idx - 119) & 1) - 1) * 2;
  } else {
    *T = idx - 280;
    *frac = 0;
  }
}

inline void dec_lag_rel(int idx, int base, int* T, int* frac) {
  *T = base + ((idx + 1) >> 2);
  *frac = ((idx + 1) & 3) - 1;
}

/* 6k60/8k85: 8-bit abs on the half-sample grid 34 + idx/2 up to idx
 * 115, integer idx-24 above; 5-bit rel delay = base + idx/2. */
inline void dec_lag_abs_low(int idx, int* T, int* frac) {
  if (idx <= 115) {
    *T = (idx + 69) >> 1;
    *frac = (((idx + 69) & 1) - 1) * 2;
  } else {
    *T = idx - 24;
    *frac = 0;
  }
}

inline void dec_lag_rel_low(int idx, int base, int* T, int* frac) {
  *T = base + ((idx + 1) >> 1);
  *frac = (((idx + 1) & 1) - 1) * 2;
}

inline int lag_base_next(int T, int frac) {
  return std::min(std::max(T - 8 - (frac < 0 ? 1 : 0), 34), 216);
}

inline void lag_normalize(int* T, int* frac) {
  while (*frac < 0) { *frac += 4; *T -= 1; }
}

/* ------------------------------------------------ code tracks ---- */
inline void dec_track(int v, int pos[2], double sign[2]) {
  int s = (v >> 8) & 1;
  int b = (v >> 4) & 0xF;
  int a = v & 0xF;
  double s1 = s ? -1.0 : 1.0;
  pos[0] = b;
  sign[0] = s1;
  pos[1] = a;
  sign[1] = (a >= b) ? s1 : -s1;
}

inline int enc_track(int posB, double signB, int posA, double signA) {
  // inverse of dec_track: pulse1 (posB, signB), pulse2 (posA, signA)
  int s = signB < 0 ? 1 : 0;
  (void)signA;
  return (s << 8) | (posB << 4) | posA;
}

/* ------------------------------------------- fractional read -----
 * float32 with lavc's accumulation order (ff_acelp_interpolatef):
 * the integer-truncated excitation memory makes the loop sensitive
 * to rounding, so the replica must use float arithmetic. */
inline float interp_read(const float* exc, int n, int T, int frac) {
  int f, li;
  if (frac == 0) { f = 4; li = T; }
  else { f = frac; li = T + 1; }
  int base = n + 1 - li;
  float acc = 0.0f;
  for (int i = 0; i < 16; ++i) {
    acc += exc[base + i] * (float)wbt::kInterp[i * 4 + f];
    acc += exc[base - i - 1] * (float)wbt::kInterp[(i + 1) * 4 - f];
  }
  return acc;
}

/* ------------------------------------------------ field bundle --- */
struct SubfrParams {
  int lag_idx;
  int ltp;           // 1 when absent (modes without the flag)
  int gain_row;
  int track[4];      // assembled per-track code words
};
struct FrameParams {
  int isf_idx[7];
  SubfrParams sf[4];
};

inline void parse_frame(int mode, const Bits& bits, FrameParams* p) {
  const ModeLayout& L = layout(mode);
  for (int i = 0; i < 7; ++i)
    p->isf_idx[i] = i < L.n_isf
        ? bits.get(L.isf[i].data(), (int)L.isf[i].size()) : 0;
  for (int sf = 0; sf < 4; ++sf) {
    p->sf[sf].lag_idx = bits.get(L.lag[sf].data(), (int)L.lag[sf].size());
    p->sf[sf].ltp = L.ltp[sf].empty()
        ? 0 : bits.get(L.ltp[sf].data(), (int)L.ltp[sf].size());
    p->sf[sf].gain_row =
        bits.get(L.gain[sf].data(), (int)L.gain[sf].size());
    int vals[8];
    int nv = (int)L.code[sf].size();
    for (int k = 0; k < nv; ++k)
      vals[k] = bits.get(L.code[sf][k].data(), (int)L.code[sf][k].size());
    track_words(mode, vals, nv, p->sf[sf].track);
  }
}

inline void write_frame(int mode, const FrameParams& p, Bits* bits) {
  const ModeLayout& L = layout(mode);
  bits->clear();
  for (int i = 0; i < L.n_isf; ++i)
    bits->put(L.isf[i].data(), (int)L.isf[i].size(), p.isf_idx[i]);
  for (int sf = 0; sf < 4; ++sf) {
    bits->put(L.lag[sf].data(), (int)L.lag[sf].size(), p.sf[sf].lag_idx);
    if (!L.ltp[sf].empty())
      bits->put(L.ltp[sf].data(), (int)L.ltp[sf].size(), p.sf[sf].ltp);
    bits->put(L.gain[sf].data(), (int)L.gain[sf].size(), p.sf[sf].gain_row);
    int nv = (int)L.code[sf].size();
    if (nv == L.tracks) {
      for (int t = 0; t < L.tracks; ++t)
        bits->put(L.code[sf][t].data(), (int)L.code[sf][t].size(),
                  p.sf[sf].track[t]);
    } else {
      for (int t = 0; t < 4; ++t) {
        int il_bits = (int)L.code[sf][4 + t].size();
        bits->put(L.code[sf][t].data(), (int)L.code[sf][t].size(),
                  p.sf[sf].track[t] >> il_bits);
        bits->put(L.code[sf][4 + t].data(), il_bits,
                  p.sf[sf].track[t] & ((1 << il_bits) - 1));
      }
    }
  }
}

/* ================================================== DECODER ====== */
struct Decoder {
  /* float32 state: the lavc decoder runs single precision and the
   * integer truncation of the excitation memory makes the adaptive
   * loop rounding-sensitive, so the replica mirrors the float ops
   * (doubles only where the disassembly shows doubles). */
  int mode = 2;                         // TS 26.201 mode index
  float isf_past[16] = {0};             // raw residual MA state
  float isf_past_final[16];             // stab comparison state
  double isp_old[16];
  bool first_frame = true;
  float exc[kHist + kFrame] = {0};      // history + current frame
  float pred_err[4];                    // newest first, dB
  float tilt = 0.0f;
  int base_lag = 64;                    // rel-lag base (abs sf updates)
  float prev_tr_gain = 0.0f;
  double stab_fac = 0.0;                // NOTE: no upper clip (<=1.25)
  float demph_mem = 0.0f;
  float hpf_x1 = 0, hpf_x2 = 0, hpf_y1 = 0, hpf_y2 = 0;
  float synth_mem[16] = {0};
  float up_hist[32] = {0};              // 12.8k tail for the upsampler
  // anti-sparseness state (6k60/8k85 only)
  float gp_hist[5] = {0};               // previous 5 pitch gains
  float prev_gc = 0.0f;
  int as_state = 0;

  explicit Decoder(int mode_ = 2) : mode(mode_) {
    for (int i = 0; i < 4; ++i) pred_err[i] = -14.0f;
    double isf0[16];
    for (int i = 0; i < 16; ++i) {
      isf0[i] = (float)(wbt::kIsfInit[i] * (float)kScale);
      isf_past_final[i] = (float)isf0[i];
    }
    isf_to_isp(isf0, isp_old);
  }

  void isf_residual_mode(const int idx[7], double r[16]) const {
    if (mode == 0) {
      // 36-bit path: same 2-split stage 1, 3-split stage 2 over the
      // d2x_36 codebooks (dims [0-4][5-8][9-15])
      float rf[16];
      for (int i = 0; i < 9; ++i)
        rf[i] = wbt::k_d1[idx[0]][i] * (float)kScale;
      for (int i = 0; i < 7; ++i)
        rf[9 + i] = wbt::k_d2[idx[1]][i] * (float)kScale;
      for (int i = 0; i < 5; ++i)
        rf[i] += wbt::k_d21_36[idx[2]][i] * (float)kScale;
      for (int i = 0; i < 4; ++i)
        rf[5 + i] += wbt::k_d22_36[idx[3]][i] * (float)kScale;
      for (int i = 0; i < 7; ++i)
        rf[9 + i] += wbt::k_d23_36[idx[4]][i] * (float)kScale;
      for (int i = 0; i < 16; ++i) r[i] = rf[i];
    } else {
      isf_residual(idx, r);
    }
  }

  void decode_isf(const int idx[7], float isf_q[16]) {
    float r[16];
    {
      double rd[16];
      isf_residual_mode(idx, rd);
      for (int i = 0; i < 16; ++i) r[i] = (float)rd[i];
    }
    for (int i = 0; i < 16; ++i) {
      float base = r[i] + (float)wbt::kIsfMean[i];
      double q = (double)base + (1.0 / 3.0) * (double)isf_past[i];
      isf_q[i] = (float)q;
      isf_past[i] = r[i];
    }
    float prev = 0.0f;
    for (int i = 0; i < 15; ++i) {
      isf_q[i] = std::max(isf_q[i], prev + (float)(1.0 / 256.0));
      prev = isf_q[i];
    }
    float d2 = 0.0f;
    for (int i = 0; i < 15; ++i) {
      float d = isf_q[i] - isf_past_final[i];
      d2 += d * d;
    }
    stab_fac = std::max(0.0, 1.25 - (double)d2 * 0.8 * 512.0);
    std::memcpy(isf_past_final, isf_q, sizeof(isf_past_final));
  }

  float gain_factor(int row) const {
    const int16_t* g = layout(mode).gain[0].size() == 6
        ? wbt::kGain6[row] : wbt::kGain7[row];
    return (float)(g[1] * (float)(1.0 / 2048.0));
  }

  void gains(int row, double code_energy64, double* gp, double* gc) const {
    const int16_t* grow = layout(mode).gain[0].size() == 6
        ? wbt::kGain6[row] : wbt::kGain7[row];
    *gp = (float)(grow[0] * (float)(1.0 / 16384.0));
    float factor = (float)(grow[1] * (float)(1.0 / 2048.0));
    float dot = pred_err[3] * 0.2f;   // avpriv order: a[0]*b[0]+..
    dot = 0.2f * pred_err[3] + 0.3f * pred_err[2];
    dot += 0.4f * pred_err[1];
    dot += 0.5f * pred_err[0];
    double v = ((double)(dot + 30.0f)) * 3.3219280948873623 *
               0.05000000000000000277;
    double g = (double)factor * std::exp2(v);
    if (code_energy64 > 0.0) g /= std::sqrt((double)(float)code_energy64);
    *gc = (float)g;
  }
  void push_gain(int row) {
    float factor = gain_factor(row);
    pred_err[3] = pred_err[2];
    pred_err[2] = pred_err[1];
    pred_err[1] = pred_err[0];
    pred_err[0] = 20.0f * std::log10(factor);
  }

  void raw_code(const SubfrParams& s, float code[kSub]) const {
    const ModeLayout& L = layout(mode);
    std::memset(code, 0, kSub * sizeof(float));
    for (int t = 0; t < L.tracks; ++t) {
      Pulses pl;
      dec_track_pulses(mode, t, s.track[t], &pl);
      for (int k = 0; k < pl.n; ++k)
        code[L.spacing * pl.pos[k] + t] += pl.sg[k];
    }
  }

  void build_code(const SubfrParams& s, int lag_int, float code[kSub]) const {
    raw_code(s, code);
    for (int i = kSub - 1; i > 0; --i) code[i] -= code[i - 1] * tilt;
    if (lag_int < kSub)
      for (int i = lag_int; i < kSub; ++i)
        code[i] += 0.85f * code[i - lag_int];
  }

  /* phase dispersion for 6k60/8k85 (amrwbdec.asm 2082-2235 + the
   * 34ef/3508/3517 branches): impNr from gp thresholds 0.6/0.9 with
   * an onset override (gc > 3*prev_gc; LC56), a low-gp majority vote over
   * the last 6 subframes, a one-step state-increase limit; filter
   * index = mode + impNr (0 strong, 1 medium, >1 none). Returns
   * whether `code` was replaced by its circular ir convolution. */
  bool anti_sparseness(float gp, float gc, float code[kSub]) {
    int imp;
    bool onset = gc > 3.0f * prev_gc;   // LC56 = 3.0 (rodata.cst8)
    if (gp < 0.6f) {
      if (onset) {
        as_state = 1;
        if (mode + 1 > 1) return false;
        imp = 1;
        return as_apply(code, wbt::kIrMedium);
      }
      imp = 0;
    } else if (gp < 0.9f) {
      if (onset) { as_state = 2; return false; }
      imp = 1;
    } else {
      if (onset) { as_state = 2; return false; }
      imp = 2;
    }
    int cnt = gp < 0.6f ? 1 : 0;
    for (int i = 0; i < 5; ++i) cnt += gp_hist[i] < 0.6f;
    if (cnt > 2) {
      imp = 0;
      as_state = 0;
    } else {
      if (imp > as_state + 1) imp = 1;
      as_state = imp;
      if (mode + imp > 1) return false;
    }
    return as_apply(code, mode + imp == 0 ? wbt::kIrStrong
                                          : wbt::kIrMedium);
  }

  static bool as_apply(float code[kSub], const double ir[kSub]) {
    float out[kSub] = {0};
    for (int i = 0; i < kSub; ++i) {
      if (code[i] == 0.0f) continue;
      float v = code[i];
      for (int n = 0; n < kSub; ++n)
        out[n] += v * (float)ir[(n - i + kSub) & (kSub - 1)];
    }
    std::memcpy(code, out, sizeof(out));
    return true;
  }

  /* one subframe given parsed params; writes the 12.8k core
   * (pre-deemphasis) into synth_out and updates all state. */
  void subframe(int sf, const SubfrParams& s, const float a[17],
                float synth_out[kSub]) {
    const ModeLayout& L = layout(mode);
    int lag_int, frac;
    bool abs_sf = sf == 0 || (sf == 2 && mode != 0);
    if (abs_sf) {
      if (L.low) dec_lag_abs_low(s.lag_idx, &lag_int, &frac);
      else dec_lag_abs(s.lag_idx, &lag_int, &frac);
      base_lag = lag_base_next(lag_int, frac);
    } else {
      if (L.low) dec_lag_rel_low(s.lag_idx, base_lag, &lag_int, &frac);
      else dec_lag_rel(s.lag_idx, base_lag, &lag_int, &frac);
    }
    int t_sharp = lag_int;      // raw lavc int IS the sharpening lag
    int li = lag_int, fr = frac;
    lag_normalize(&li, &fr);
    int e0 = kHist + sf * kSub;
    float adap[kSub];
    for (int n = 0; n < kSub; ++n) {
      float v = interp_read(exc, e0 + n, li, fr);
      adap[n] = v;
      exc[e0 + n] = v;          // in-place extension, as lavc does
    }
    if (s.ltp == 0) {
      float sm[kSub];
      for (int n = 0; n < kSub; ++n) {
        float p = n > 0 ? adap[n - 1] : 0.0f;
        float q = n < kSub - 1 ? adap[n + 1] : 0.0f;
        sm[n] = 0.18f * p + 0.64f * adap[n] + 0.18f * q;
      }
      std::memcpy(adap, sm, sizeof(sm));
      for (int n = 0; n < kSub; ++n) exc[e0 + n] = adap[n];
    }
    float code[kSub];
    build_code(s, t_sharp, code);
    float ce = 0.0f;
    for (int n = 0; n < kSub; ++n) ce += code[n] * code[n];
    double gp, gc;
    gains(s.gain_row, (double)(ce * (float)(1.0 / 64.0)), &gp, &gc);
    push_gain(s.gain_row);
    float gpf = (float)gp, gcf = (float)gc;
    float dotp = 0.0f;
    for (int n = 0; n < kSub; ++n) dotp += adap[n] * adap[n];
    double ep = (double)dotp * gp * gp;
    double ecd = (double)ce * gc * gc;
    double vf = (ep - ecd) / (ep + ecd + 0.01);
    tilt = (float)(vf * 0.25 + 0.25);
    float vff = (float)vf;
    float gc_enh;
    {
      float g0;
      if (prev_tr_gain > gcf) g0 = std::min(prev_tr_gain, gcf + gcf * 0.19f);
      else g0 = std::max(prev_tr_gain, gcf * 0.84033203f);
      prev_tr_gain = g0;
      float sm = (float)((double)(1.0f - vff) * 0.5 * stab_fac);
      gc_enh = g0 * sm + gcf * (1.0f - sm);
    }
    float code_as[kSub];
    std::memcpy(code_as, code, sizeof(code_as));
    if (L.low) anti_sparseness(gpf, gcf, code_as);
    gp_hist[4] = gp_hist[3]; gp_hist[3] = gp_hist[2];
    gp_hist[2] = gp_hist[1]; gp_hist[1] = gp_hist[0];
    gp_hist[0] = gpf;
    prev_gc = gcf;
    float cpe = (vff + 1.0f) * 0.125f;
    float code_enh[kSub];
    {
      code_enh[0] = code_as[0] - cpe * code_as[1];
      for (int n = 1; n < kSub - 1; ++n)
        code_enh[n] = code_as[n] - cpe * (code_as[n - 1] + code_as[n + 1]);
      code_enh[kSub - 1] = code_as[kSub - 1] - cpe * code_as[kSub - 2];
    }
    for (int n = 0; n < kSub; ++n) {
      float m = exc[e0 + n] * gpf + gcf * code[n];
      if (std::fabs(m) < 8388608.0f) m = (float)(int)m;
      exc[e0 + n] = m;
    }
    for (int n = 0; n < kSub; ++n) {
      float syn = gpf * adap[n] + gc_enh * code_enh[n];
      float v = syn;
      for (int k = 1; k <= 16; ++k) {
        float past = (n - k >= 0) ? synth_out[n - k] : synth_mem[16 + n - k];
        v -= a[k] * past;
      }
      synth_out[n] = v;
    }
    std::memcpy(synth_mem, synth_out + kSub - 16, 16 * sizeof(float));
  }

  void frame_lpc(const int isf_idx[7], float a4[4][17]) {
    float isf_q[16];
    decode_isf(isf_idx, isf_q);
    double isp_new[16];
    {
      // lavc: lsp[i] = cos(pi * lsf2[i]) with lsf2 = 2*isf (float
      // doubling, exact), entry 15 doubled once more in float.
      for (int i = 0; i < 15; ++i)
        isp_new[i] = std::cos((double)(isf_q[i] + isf_q[i]) * M_PI);
      float e15 = isf_q[15] + isf_q[15];
      isp_new[15] = std::cos((double)(e15 + e15) * M_PI);
    }
    if (first_frame) {
      std::memcpy(isp_old, isp_new, sizeof(isp_old));
      first_frame = false;
    }
    static const double WO[4] = {0.55, 0.2, 0.04, 0.0};
    static const double WN[4] = {0.45, 0.8, 0.96, 1.0};
    for (int sf = 0; sf < 4; ++sf) {
      double isp_i[16], ad[17];
      for (int i = 0; i < 16; ++i)
        isp_i[i] = WO[sf] * isp_old[i] + WN[sf] * isp_new[i];
      isp_to_a(isp_i, ad);
      for (int i = 0; i < 17; ++i) a4[sf][i] = (float)ad[i];
    }
    std::memcpy(isp_old, isp_new, sizeof(isp_old));
  }

  /* full frame -> 12.8k output (post deemph+HPF), 256 samples */
  void frame(const FrameParams& p, float out12[kFrame]) {
    float a4[4][17];
    frame_lpc(p.isf_idx, a4);
    std::memmove(exc, exc + kFrame, kHist * sizeof(float));
    for (int sf = 0; sf < 4; ++sf)
      subframe(sf, p.sf[sf], a4[sf], out12 + sf * kSub);
    for (int n = 0; n < kFrame; ++n) {
      demph_mem = out12[n] + 0.68f * demph_mem;
      out12[n] = demph_mem;
    }
    // ff_acelp_apply_order_2_transfer_function (direct form II),
    // poles/zeros/gain bit-exact from the lavc image:
    // poles {-1.9788818359375, 0.9791259765625}, zeros {-2, 1},
    // gain 0.989501953125 (31 Hz high-pass at 12.8 kHz).
    for (int n = 0; n < kFrame; ++n) {
      float x = out12[n];
      float tmp = x - (-1.9788818359375f) * hpf_x1 -
                  0.9791259765625f * hpf_x2;
      float v = 0.989501953125f *
                (tmp + (-2.0f) * hpf_x1 + 1.0f * hpf_x2);
      hpf_x2 = hpf_x1;
      hpf_x1 = tmp;
      out12[n] = v;
    }
  }

  /* streaming 5/4 upsample of one frame -> 320 samples at 16 kHz,
   * already divided to the oracle float scale. */
  void upsample(const float in12[kFrame], float out16[320]) {
    float buf[32 + kFrame];
    std::memcpy(buf, up_hist, 32 * sizeof(float));
    std::memcpy(buf + 32, in12, kFrame * sizeof(float));
    for (int m = 0; m < 320; ++m) {
      int base = (4 * m) / 5 + 32;
      int ph = m % 5;
      float v;
      if (ph == 0) {
        v = buf[base - 12];
      } else {
        float acc = 0.0f;
        if (ph == 1) {
          for (int j = 0; j < 23; ++j)
            acc += (float)wbt::kUpFirB[j] * buf[base - 1 - j];
        } else if (ph == 2) {
          for (int j = 0; j < 23; ++j)
            acc += (float)wbt::kUpFirA[j] * buf[base - 1 - j];
        } else if (ph == 3) {
          for (int j = 0; j < 23; ++j)
            acc += (float)wbt::kUpFirA[22 - j] * buf[base - j];
        } else {
          for (int j = 0; j < 23; ++j)
            acc += (float)wbt::kUpFirB[22 - j] * buf[base - j];
        }
        v = acc;
      }
      out16[m] = v * (float)kScale;
    }
    std::memcpy(up_hist, buf + kFrame, 32 * sizeof(float));
  }
};

/* ================================================== ENCODER ====== */
struct Encoder {
  int mode = 2;
  Decoder local;                 // exact replica for state lockstep
  double isf_enc_past[16] = {0}; // quantizer MA state (tracks decoder)
  double t_synth_mem = 0.0;      // pre-emphasis memory of the target

  explicit Encoder(int mode_ = 2) : mode(mode_), local(mode_) {}

  /* LP analysis on the pre-emphasized 12.8k target */
  void lp_analysis(const double* sp /* kFrame + lookahead, centered */,
                   double a[17]) {
    // asymmetric window over [ -64 .. 256+64 ) around the frame
    constexpr int N = 384;
    double w[N], x[N];
    for (int i = 0; i < N; ++i) {
      w[i] = 0.54 - 0.46 * std::cos(2.0 * M_PI * i / (N - 1));
      x[i] = sp[i - kSub] * w[i];
    }
    double r[17];
    for (int k = 0; k <= 16; ++k) {
      double s = 0.0;
      for (int i = k; i < N; ++i) s += x[i] * x[i - k];
      r[k] = s;
    }
    r[0] *= 1.0001;
    r[0] += 1e-10;
    for (int k = 1; k <= 16; ++k) {
      double f = 2.0 * M_PI * 60.0 * k / 12800.0;   // 60 Hz lag window
      r[k] *= std::exp(-0.5 * f * f);
    }
    double A[17] = {1.0};
    double err = r[0];
    for (int i = 1; i <= 16; ++i) {
      double acc = r[i];
      for (int j = 1; j < i; ++j) acc += A[j] * r[i - j];
      double k = -acc / err;
      double tmp[17];
      std::memcpy(tmp, A, sizeof(tmp));
      for (int j = 1; j < i; ++j) A[j] = tmp[j] + k * tmp[i - j];
      A[i] = k;
      err *= (1.0 - k * k);
      if (err <= 0) err = 1e-9;
    }
    std::memcpy(a, A, 17 * sizeof(double));
  }

  /* split-MSVQ quantization with the decoder's MA semantics */
  void quantize_isf(const double isf_t[16], int idx[7]) {
    double target[16];
    for (int i = 0; i < 16; ++i)
      target[i] = (isf_t[i] - wbt::kIsfMean[i] -
                   (1.0 / 3.0) * isf_enc_past[i]) / kScale;
    auto best = [](const double* t, const int16_t* tab, int rows, int dims,
                   int stride) {
      int bi = 0;
      double bd = 1e30;
      for (int rix = 0; rix < rows; ++rix) {
        const int16_t* row = tab + rix * stride;
        double d = 0.0;
        for (int j = 0; j < dims; ++j) {
          double e = t[j] - row[j];
          d += e * e;
        }
        if (d < bd) { bd = d; bi = rix; }
      }
      return bi;
    };
    idx[0] = best(target, &wbt::k_d1[0][0], 256, 9, 9);
    idx[1] = best(target + 9, &wbt::k_d2[0][0], 256, 7, 7);
    double res[16];
    for (int i = 0; i < 9; ++i) res[i] = target[i] - wbt::k_d1[idx[0]][i];
    for (int i = 0; i < 7; ++i)
      res[9 + i] = target[9 + i] - wbt::k_d2[idx[1]][i];
    if (mode == 0) {
      idx[2] = best(res, &wbt::k_d21_36[0][0], 128, 5, 5);
      idx[3] = best(res + 5, &wbt::k_d22_36[0][0], 128, 4, 4);
      idx[4] = best(res + 9, &wbt::k_d23_36[0][0], 64, 7, 7);
      idx[5] = idx[6] = 0;
    } else {
      idx[2] = best(res, &wbt::k_d21[0][0], 64, 3, 3);
      idx[3] = best(res + 3, &wbt::k_d22[0][0], 128, 3, 3);
      idx[4] = best(res + 6, &wbt::k_d23[0][0], 128, 3, 3);
      idx[5] = best(res + 9, &wbt::k_d24[0][0], 32, 3, 3);
      idx[6] = best(res + 12, &wbt::k_d25[0][0], 32, 4, 4);
    }
    double r[16];
    local.isf_residual_mode(idx, r);
    for (int i = 0; i < 16; ++i) isf_enc_past[i] = r[i];
  }

  /* impulse response of 1/A truncated to kSub */
  static void imp_response(const double a[17], double h[kSub]) {
    for (int n = 0; n < kSub; ++n) {
      double v = (n == 0) ? 1.0 : 0.0;
      for (int k = 1; k <= 16 && k <= n; ++k) v -= a[k] * h[n - k];
      h[n] = v;
    }
  }

  /* encode one frame of 12.8k PRE-EMPHASIZED target speech t_synth
   * (the decoder synthesis domain), lookahead included for LP. */
  void encode_frame(const double* t_synth /* -64 .. 320 */,
                    FrameParams* p) {
    double a_t[17], isf_t[16];
    lp_analysis(t_synth, a_t);
    a_to_isf(a_t, isf_t);
    quantize_isf(isf_t, p->isf_idx);

    // decoder-side LPC for the frame (exact float replica)
    float a4[4][17];
    local.frame_lpc(p->isf_idx, a4);
    std::memmove(local.exc, local.exc + kFrame, kHist * sizeof(float));
    for (int sf = 0; sf < 4; ++sf) {
      double a[17];
      for (int i = 0; i < 17; ++i) a[i] = a4[sf][i];
      search_subframe(sf, t_synth + sf * kSub, a, &p->sf[sf]);
      float synth[kSub];
      local.subframe(sf, p->sf[sf], a4[sf], synth);
    }
  }

  void search_subframe(int sf, const double* tgt, const double a[17],
                       SubfrParams* s) {
    double h[kSub];
    imp_response(a, h);
    // zero-input response from the local decoder's synth memory
    double zir[kSub];
    for (int n = 0; n < kSub; ++n) {
      double v = 0.0;
      for (int k = 1; k <= 16; ++k) {
        double past = (n - k >= 0) ? zir[n - k] : local.synth_mem[16 + n - k];
        v -= a[k] * past;
      }
      zir[n] = v;
    }
    double x[kSub];          // target for the excitation contribution
    for (int n = 0; n < kSub; ++n) x[n] = tgt[n] - zir[n];
    // backward-filtered target and Toeplitz correlations of h
    double d[kSub];
    for (int n = 0; n < kSub; ++n) {
      double sum = 0.0;
      for (int j = n; j < kSub; ++j) sum += x[j] * h[j - n];
      d[n] = sum;
    }
    double phi[kSub];        // phi[k] = sum h[j] h[j+k]
    for (int k = 0; k < kSub; ++k) {
      double sum = 0.0;
      for (int j = 0; j + k < kSub; ++j) sum += h[j] * h[j + k];
      phi[k] = sum;
    }
    auto filt_dot = [&](const double* u, const double* v) {
      // u' Phi v  via the Toeplitz structure
      double sum = 0.0;
      for (int i = 0; i < kSub; ++i) {
        if (u[i] == 0.0) continue;
        double acc = 0.0;
        for (int j = 0; j < kSub; ++j)
          if (v[j] != 0.0) acc += v[j] * phi[std::abs(i - j)];
        sum += u[i] * acc;
      }
      return sum;
    };

    // ---------------- adaptive search -------------------------
    int e0 = kHist + sf * kSub;
    int best_idx = 0;
    double best_score = -1e30;
    double best_adap[kSub] = {0};
    int best_lag = 64, best_frac = 0;
    auto eval_lag = [&](int idx, int lag_int, int frac) {
      double adap[kSub];
      float saved[kSub];
      int li = lag_int, fr = frac;
      lag_normalize(&li, &fr);
      std::memcpy(saved, local.exc + e0, sizeof(saved));
      for (int n = 0; n < kSub; ++n) {
        float v = interp_read(local.exc, e0 + n, li, fr);
        adap[n] = v;
        local.exc[e0 + n] = v;
      }
      std::memcpy(local.exc + e0, saved, sizeof(saved));
      // y = h * adap
      double num = 0.0, den = 1e-9;
      double y[kSub];
      for (int n = 0; n < kSub; ++n) {
        double v = 0.0;
        for (int k = 0; k <= n; ++k) v += h[k] * adap[n - k];
        y[n] = v;
        num += x[n] * v;
        den += v * v;
      }
      double sc = num * num / den;
      if (sc > best_score) {
        best_score = sc;
        best_idx = idx;
        best_lag = lag_int;
        best_frac = frac;
        std::memcpy(best_adap, adap, sizeof(best_adap));
      }
    };
    const ModeLayout& L = layout(mode);
    bool abs_sf = sf == 0 || (sf == 2 && mode != 0);
    if (abs_sf) {
      // coarse: exact filtered metric at integer lags (frac 0), then
      // full fractional refinement around the top scorer
      double rbest = -1e30;
      int Tb = 64;
      for (int T = 34; T <= 231; ++T) {
        double y[kSub];
        double num = 0.0, den = 1e-9;
        for (int n = 0; n < kSub; ++n) {
          double v = (n >= T) ? y[n - T] : (double)local.exc[e0 + n - T];
          y[n] = v;
          num += d[n] * v;
          den += v * v;
        }
        double sc = num * num / den;
        if (sc > rbest) { rbest = sc; Tb = T; }
      }
      if (L.low) {
        // 8-bit grid: delay = 34 + idx/2 (idx<=115), idx-24 above
        for (int idx = 0; idx < 256; ++idx) {
          int ti, fi;
          dec_lag_abs_low(idx, &ti, &fi);
          if (std::abs(ti - Tb) > 3) continue;
          eval_lag(idx, ti, fi);
        }
      } else {
        for (int T = std::max(34, Tb - 3); T <= std::min(231, Tb + 3);
             ++T) {
          for (int f = 0; f < 4; ++f) {
            int idx;
            if (T < 128) idx = ((T << 2) + f) - 136;
            else if (T < 160 && (f % 2) == 0)
              idx = 376 + ((T << 1) + f / 2) - 256;
            else if (f == 0) idx = T + 280;
            else continue;
            if (idx < 0 || idx > 511) continue;
            int ti, fi;
            dec_lag_abs(idx, &ti, &fi);
            eval_lag(idx, ti, fi);
          }
        }
      }
      local.base_lag = lag_base_next(best_lag, best_frac);
    } else {
      int base = local.base_lag;
      int nrel = 1 << (int)L.lag[sf].size();
      for (int idx = 0; idx < nrel; ++idx) {
        int ti, fi;
        if (L.low) dec_lag_rel_low(idx, base, &ti, &fi);
        else dec_lag_rel(idx, base, &ti, &fi);
        eval_lag(idx, ti, fi);
      }
    }
    s->lag_idx = best_idx;
    // raw best_lag IS the sharpening integer (lavc keeps the raw int)
    s->ltp = L.ltp[sf].empty() ? 0 : 1;
    // optional LTP filtering: test both and keep the better (modes
    // without the flag ALWAYS smooth — forced below)
    if (L.ltp[sf].empty()) {
      double sm[kSub];
      for (int n = 0; n < kSub; ++n) {
        double pp = n > 0 ? best_adap[n - 1] : 0.0;
        double qq = n < kSub - 1 ? best_adap[n + 1] : 0.0;
        sm[n] = 0.18 * pp + 0.64 * best_adap[n] + 0.18 * qq;
      }
      std::memcpy(best_adap, sm, sizeof(sm));
    } else {
      double sm[kSub];
      for (int n = 0; n < kSub; ++n) {
        double pp = n > 0 ? best_adap[n - 1] : 0.0;
        double qq = n < kSub - 1 ? best_adap[n + 1] : 0.0;
        sm[n] = 0.18 * pp + 0.64 * best_adap[n] + 0.18 * qq;
      }
      double n1 = 0, d1 = 1e-9, n2 = 0, d2 = 1e-9;
      double y[kSub];
      for (int n = 0; n < kSub; ++n) {
        double v = 0.0, v2 = 0.0;
        for (int k = 0; k <= n; ++k) {
          v += h[k] * best_adap[n - k];
          v2 += h[k] * sm[n - k];
        }
        n1 += x[n] * v;
        d1 += v * v;
        n2 += x[n] * v2;
        d2 += v2 * v2;
        y[n] = v;
      }
      (void)y;
      if (n2 * n2 / d2 > n1 * n1 / d1) {
        s->ltp = 0;
        std::memcpy(best_adap, sm, sizeof(sm));
      }
    }
    double gp_opt;
    {
      double num = 0, den = 1e-9;
      double y[kSub];
      for (int n = 0; n < kSub; ++n) {
        double v = 0.0;
        for (int k = 0; k <= n; ++k) v += h[k] * best_adap[n - k];
        y[n] = v;
        num += x[n] * v;
        den += v * v;
      }
      gp_opt = std::max(0.0, std::min(1.29, num / den));
      for (int n = 0; n < kSub; ++n) x[n] -= gp_opt * y[n];
      for (int n = 0; n < kSub; ++n) {
        double sum = 0.0;
        for (int j = n; j < kSub; ++j) sum += x[j] * h[j - n];
        d[n] = sum;
      }
    }

    // ---------------- fixed-code search -----------------------
    // Decode-side shaping: tilt (current local.tilt) then 0.85
    // sharpening at the raw best_lag. All shaped quantities reduce to
    // RAW pulse coordinates through Psi = S' Phi S and dv = S' d
    // (S = shaping operator), so candidate evaluation is O(1) per
    // pulse move; the multiset search is greedy + swap refinement and
    // every resulting multiset is encodable (pigeonhole).
    int tracks = L.tracks, spacing = L.spacing;
    double B[kSub][kSub];     // B[p] = shaped unit pulse at sample p
    for (int p = 0; p < kSub; ++p) {
      double* v = B[p];
      std::memset(v, 0, kSub * sizeof(double));
      v[p] = 1.0;
      for (int i = kSub - 1; i > p; --i) v[i] -= v[i - 1] * local.tilt;
      if (best_lag < kSub)
        for (int i = std::max(best_lag, p); i < kSub; ++i)
          v[i] += 0.85 * v[i - best_lag];
    }
    static thread_local double Psi[kSub][kSub];
    double dv[kSub];
    for (int p = 0; p < kSub; ++p) {
      // C = Phi * B[p], then Psi[p][q] = B[q] . C
      double C[kSub];
      for (int i = 0; i < kSub; ++i) {
        double acc = 0.0;
        for (int j = p; j < kSub; ++j)   // B[p][j] = 0 for j < p
          acc += phi[std::abs(i - j)] * B[p][j];
        C[i] = acc;
      }
      for (int q = 0; q <= p; ++q) {
        double acc = 0.0;
        for (int j = q; j < kSub; ++j) acc += B[q][j] * C[j];
        Psi[p][q] = Psi[q][p] = acc;
      }
      double acc = 0.0;
      for (int j = p; j < kSub; ++j) acc += B[p][j] * d[j];
      dv[p] = acc;
    }
    // raw signed amplitude vector + its Psi image, across all tracks
    double c[kSub] = {0};
    double w[kSub] = {0};     // w = Psi c
    double num = 0.0, den = 1e-9;
    auto move_pulse = [&](int samp, double amp) {
      num += amp * dv[samp];
      den += 2.0 * amp * w[samp] + amp * amp * Psi[samp][samp];
      for (int i = 0; i < kSub; ++i) w[i] += amp * Psi[samp][i];
      c[samp] += amp;
    };
    auto score_with = [&](int samp, double amp) {
      double n2 = num + amp * dv[samp];
      double d2 = den + 2.0 * amp * w[samp] + amp * amp * Psi[samp][samp];
      return n2 * n2 / d2;
    };
    PulseList pl[4];
    int npos = (mode == 0) ? 32 : 16;   // positions per track
    int P_of[4];
    for (int t = 0; t < tracks; ++t) P_of[t] = track_pulses(mode, t);
    // greedy fill, track-round-robin (pulse k of every track, then
    // pulse k+1 ...), so early tracks don't starve later ones
    int maxP = 0;
    for (int t = 0; t < tracks; ++t) maxP = std::max(maxP, P_of[t]);
    for (int k = 0; k < maxP; ++k) {
      for (int t = 0; t < tracks; ++t) {
        if (k >= P_of[t]) continue;
        int bq = 0;
        double bamp = 1.0, bsc = -1e30;
        for (int p = 0; p < npos; ++p) {
          int samp = spacing * p + t;
          for (double amp : {1.0, -1.0}) {
            double sc = score_with(samp, amp);
            if (sc > bsc) { bsc = sc; bq = samp; bamp = amp; }
          }
        }
        move_pulse(bq, bamp);
        pl[t].add(bq / spacing, bamp < 0 ? 1 : 0);
      }
    }
    // refinement: tracks with <=2 pulses get EXHAUSTIVE re-search over
    // their full index space (joint within the track, like the round-4
    // 12k65 searcher); larger tracks get pulse-swap refinement.
    for (int pass = 0; pass < 2; ++pass) {
      for (int t = 0; t < tracks; ++t) {
        int P = P_of[t];
        if (P <= 2) {
          // remove the track's pulses
          for (int k = 0; k < pl[t].n; ++k)
            move_pulse(spacing * pl[t].pos[k] + t,
                       pl[t].neg[k] ? 1.0 : -1.0);
          int nbits_t = P == 1 ? (mode == 0 ? 6 : 5) : 9;
          int bestv = -1;
          double bsc = -1e30;
          Pulses bestp;
          for (int v = 0; v < (1 << nbits_t); ++v) {
            Pulses cand;
            dec_track_pulses(mode, t, v, &cand);
            // score the multiset incrementally against (num, den, w)
            double dn = 0.0, dd = 0.0;
            int samp[2];
            for (int k = 0; k < cand.n; ++k) {
              samp[k] = spacing * cand.pos[k] + t;
              dn += cand.sg[k] * dv[samp[k]];
              dd += 2.0 * cand.sg[k] * w[samp[k]];
            }
            for (int j = 0; j < cand.n; ++j)
              for (int k = 0; k < cand.n; ++k)
                dd += cand.sg[j] * cand.sg[k] * Psi[samp[j]][samp[k]];
            double n2 = num + dn, d2 = den + dd;
            double sc = n2 * n2 / d2;
            if (sc > bsc) { bsc = sc; bestv = v; bestp = cand; }
          }
          pl[t].n = 0;
          for (int k = 0; k < bestp.n; ++k) {
            move_pulse(spacing * bestp.pos[k] + t, bestp.sg[k]);
            pl[t].add(bestp.pos[k], bestp.sg[k] < 0 ? 1 : 0);
          }
          (void)bestv;
          continue;
        }
        for (int k = 0; k < pl[t].n; ++k) {
          int old_samp = spacing * pl[t].pos[k] + t;
          double old_amp = pl[t].neg[k] ? -1.0 : 1.0;
          move_pulse(old_samp, -old_amp);
          int bq = old_samp;
          double bamp = old_amp, bsc = -1e30;
          for (int p = 0; p < npos; ++p) {
            int samp = spacing * p + t;
            for (double amp : {1.0, -1.0}) {
              double sc = score_with(samp, amp);
              if (sc > bsc) { bsc = sc; bq = samp; bamp = amp; }
            }
          }
          move_pulse(bq, bamp);
          pl[t].pos[k] = bq / spacing;
          pl[t].neg[k] = bamp < 0 ? 1 : 0;
        }
      }
    }
    for (int t = 0; t < tracks; ++t)
      s->track[t] = enc_track_pulses(mode, t, pl[t]);
    // reconstruct the shaped code for the gain search
    double code[kSub] = {0};
    for (int i = 0; i < kSub; ++i)
      if (c[i] != 0.0)
        for (int j = i; j < kSub; ++j) code[j] += c[i] * B[i][j];

    // ---------------- gain VQ search --------------------------
    double yc[kSub];   // h * code
    for (int n = 0; n < kSub; ++n) {
      double v = 0.0;
      for (int k = 0; k <= n; ++k) v += h[k] * code[n - k];
      yc[n] = v;
    }
    double ya[kSub];   // h * adap
    for (int n = 0; n < kSub; ++n) {
      double v = 0.0;
      for (int k = 0; k <= n; ++k) v += h[k] * best_adap[n - k];
      ya[n] = v;
    }
    // filtered neighbour-sum of the code (for the pitch enhancer)
    double ycnb[kSub];
    {
      double nb[kSub];
      for (int n = 0; n < kSub; ++n) {
        double p = n > 0 ? code[n - 1] : 0.0;
        double q = n < kSub - 1 ? code[n + 1] : 0.0;
        nb[n] = p + q;
      }
      for (int n = 0; n < kSub; ++n) {
        double v = 0.0;
        for (int k = 0; k <= n; ++k) v += h[k] * nb[n - k];
        ycnb[n] = v;
      }
    }
    double ce = 0.0;
    for (int n = 0; n < kSub; ++n) ce += code[n] * code[n];
    double ea = 0.0;
    for (int n = 0; n < kSub; ++n) ea += best_adap[n] * best_adap[n];
    double x0[kSub];
    for (int n = 0; n < kSub; ++n) x0[n] = tgt[n] - zir[n];
    // low modes: precompute the filtered responses of the two
    // anti-sparseness variants (the row decides which applies)
    double yc_as[2][kSub], ycnb_as[2][kSub];
    if (L.low) {
      for (int variant = 0; variant < 2; ++variant) {
        const double* ir = variant == 0 ? wbt::kIrStrong : wbt::kIrMedium;
        double cas[kSub] = {0};
        for (int i = 0; i < kSub; ++i) {
          if (code[i] == 0.0) continue;
          for (int n = 0; n < kSub; ++n)
            cas[n] += code[i] * ir[(n - i + kSub) & (kSub - 1)];
        }
        double nb[kSub];
        for (int n = 0; n < kSub; ++n) {
          double p = n > 0 ? cas[n - 1] : 0.0;
          double q = n < kSub - 1 ? cas[n + 1] : 0.0;
          nb[n] = p + q;
        }
        for (int n = 0; n < kSub; ++n) {
          double v = 0.0, v2 = 0.0;
          for (int k = 0; k <= n; ++k) {
            v += h[k] * cas[n - k];
            v2 += h[k] * nb[n - k];
          }
          yc_as[variant][n] = v;
          ycnb_as[variant][n] = v2;
        }
      }
    }
    int rows = (int)(1 << L.gain[sf].size());
    int bestrow = 0;
    double bcost = 1e30;
    for (int row = 0; row < rows; ++row) {
      double gp, gc;
      local.gains(row, ce / 64.0, &gp, &gc);
      if (gp > 1.3) continue;  // keep the adaptive loop contractive:
      // float32-vs-float64 truncation flips are chaotic under gp > 1
      // model the decoder's enhancers exactly for this row
      double ep = gp * gp * ea;
      double ecd = gc * gc * ce;
      double vf = (ep - ecd) / (ep + ecd + 0.01);
      double g0;
      if (local.prev_tr_gain > gc) g0 = std::min((double)local.prev_tr_gain,
                                                 gc * 1.19);
      else g0 = std::max((double)local.prev_tr_gain, gc * 0.84033203);
      double smf = 0.5 * (1.0 - vf) * local.stab_fac;
      double gc_enh = g0 * smf + gc * (1.0 - smf);
      double cpe = 0.125 * (1.0 + vf);
      const double* ycr = yc;
      const double* ycnbr = ycnb;
      if (L.low) {
        // replicate the decoder's anti-sparseness decision for this
        // row WITHOUT mutating its state
        Decoder probe = local;   // cheap relative to the search
        float tmp[kSub] = {0};
        tmp[0] = 1.0f;           // decision only depends on gains/state
        bool fired0 = false, firedm = false;
        int save_state = probe.as_state;
        (void)save_state;
        bool fired = probe.anti_sparseness((float)gp, (float)gc, tmp);
        if (fired) {
          // which filter? strong iff mode + imp == 0; recover from
          // the filtered impulse's first sample
          fired0 = std::fabs(tmp[0] - (float)wbt::kIrStrong[0]) <
                   std::fabs(tmp[0] - (float)wbt::kIrMedium[0]);
          firedm = !fired0;
        }
        if (fired0) { ycr = yc_as[0]; ycnbr = ycnb_as[0]; }
        else if (firedm) { ycr = yc_as[1]; ycnbr = ycnb_as[1]; }
      }
      double cost = 0.0;
      for (int n = 0; n < kSub; ++n) {
        double e = x0[n] - gp * ya[n] - gc_enh * (ycr[n] - cpe * ycnbr[n]);
        cost += e * e;
      }
      if (cost < bcost) { bcost = cost; bestrow = row; }
    }
    s->gain_row = bestrow;
  }
};

/* ============================================ host conversion ==== */
inline void downsample_16k_to_12k8(const float* in, size_t n,
                                   std::vector<double>* out) {
  size_t m = n * 4 / 5;
  out->assign(m, 0.0);
  for (size_t k = 0; k < m; ++k) {
    double c = 1.25 * (double)k;
    long ip = (long)c;
    double fr = c - ip;
    double acc = 0.0;
    for (int j = -15; j <= 16; ++j) {
      long idx = ip + j;
      if (idx < 0 || idx >= (long)n) continue;
      double tau = j - fr;
      double w = 0.5 * (1.0 + std::cos(M_PI * tau / 16.5));
      double cut = 0.8;
      double s = (std::fabs(tau) < 1e-12) ? cut
                 : std::sin(M_PI * cut * tau) / (M_PI * tau);
      acc += in[idx] * s * w;
    }
    (*out)[k] = acc * 32768.0;   // decoder int-equivalent scale
  }
}

}  // namespace wb

/* ------------------------------------------------- DTX (type 9) --
 * Structural tier mirroring the NB design (native/augment/
 * amrnb_low.cc): the in-image lavc decoder does not implement WB DTX
 * either, so SID conformance is via our own decoder + framing
 * invariants (docs/CODECS.md).  SID payload (40 bits): isf0 index
 * (8) | isf1 index (8) | log-energy (6) | zeros. */
namespace wbdtx {

struct Vad {
  double nf_db = -70.0;
  int hang = 0, burst = 0;
  bool frame(const float* x, int n) {
    double e = 1e-12;
    for (int i = 0; i < n; ++i) e += (double)x[i] * x[i];
    double edb = 10.0 * std::log10(e / n);
    if (edb < nf_db) nf_db = edb;
    else nf_db = std::min(nf_db + 0.1, edb);
    bool raw = edb > nf_db + 9.0 && edb > -80.0;
    if (raw) {
      if (++burst >= 2) hang = 5;
      return true;
    }
    burst = 0;
    if (hang > 0) { --hang; return true; }
    return false;
  }
};

inline void put_bits(uint8_t* payload, int pos, int nbits, int v) {
  for (int i = 0; i < nbits; ++i) {
    int b = (v >> (nbits - 1 - i)) & 1;
    int j = pos + i;
    if (b) payload[j >> 3] |= 0x80 >> (j & 7);
  }
}
inline int get_bits(const uint8_t* payload, int pos, int nbits) {
  int v = 0;
  for (int i = 0; i < nbits; ++i) {
    int j = pos + i;
    v = (v << 1) | ((payload[j >> 3] >> (7 - (j & 7))) & 1);
  }
  return v;
}

}  // namespace wbdtx

/* ======================================================= C API ===== */

extern "C" {

/* Encode 16 kHz float mono to AMR-WB storage frames of the given
 * TS 26.201 mode (RFC 4867 octet-aligned, kModeSizes[mode] bytes per
 * frame incl. TOC). Supported encoder modes: 0 (6.60), 2 (12.65),
 * 4 (15.85), 7 (23.05). Returns bytes written; size `out` as
 * (n/320 + 3) * 61. */
long amrwb_encode_mode(int mode, const float* in, size_t n,
                       uint8_t* out) {
  if (mode < 0 || mode > 8) return -1;
  std::vector<double> sp12;
  wb::downsample_16k_to_12k8(in, n, &sp12);
  // pre-emphasize into the decoder synthesis domain (inverse of the
  // decoder's 0.68 de-emphasis; the 31 Hz HPF is ~identity in band)
  std::vector<double> ts(sp12.size() + wb::kSub + 320, 0.0);
  {
    double prev = 0.0;
    for (size_t i = 0; i < sp12.size(); ++i) {
      ts[wb::kSub + i] = sp12[i] - 0.68 * prev;
      prev = sp12[i];
    }
  }
  size_t nframes = sp12.size() / wb::kFrame;
  if (nframes == 0) nframes = 1;
  while (nframes * wb::kFrame < sp12.size()) ++nframes;
  const wb::ModeLayout& L = wb::layout(mode);
  int payload_bytes = L.nbytes - 1;
  wb::Encoder enc(mode);
  wb::Bits bits;
  long written = 0;
  for (size_t fr = 0; fr < nframes; ++fr) {
    wb::FrameParams p;
    enc.encode_frame(ts.data() + wb::kSub + fr * wb::kFrame, &p);
    wb::write_frame(mode, p, &bits);
    out[written++] = (uint8_t)((mode << 3) | 0x04);
    uint8_t* payload = out + written;
    std::memset(payload, 0, payload_bytes);
    for (int i = 0; i < L.nbits; ++i)
      if (bits.b[i]) payload[i >> 3] |= 0x80 >> (i & 7);
    written += payload_bytes;
  }
  return written;
}

long amrwb_encode(const float* in, size_t n, uint8_t* out) {
  return amrwb_encode_mode(2, in, n, out);
}

/* Decode AMR-WB storage frames (all 9 speech modes, mixed-mode
 * streams included) to 16 kHz float mono. Returns samples written or
 * -1 on an unsupported frame type. */
long amrwb_decode(const uint8_t* data, size_t size, float* out,
                  size_t maxn) {
  wb::Decoder dec;
  size_t pos = 0;
  long written = 0;
  int cn_isf0 = 0, cn_isf1 = 0;
  double cn_rms = 0.0;
  uint32_t rng = 0x9e3779b9u;
  double cn_mem[16] = {0};
  while (pos < size) {
    int ft = (data[pos] >> 3) & 0x0F;
    if (ft == 9 || ft == 15) {
      // SID update / NO_DATA: emit comfort noise from the last SID
      if (ft == 9) {
        if (pos + 6 > size) break;
        const uint8_t* p = data + pos + 1;
        cn_isf0 = wbdtx::get_bits(p, 0, 8);
        cn_isf1 = wbdtx::get_bits(p, 8, 8);
        int elog = wbdtx::get_bits(p, 16, 6);
        cn_rms = std::pow(10.0, (elog - 80.0) / 20.0) * 32768.0;
        pos += 6;
      } else {
        pos += 1;
      }
      // synthesize 256 samples of CN through 1/A(sid isf)
      int idx[7] = {cn_isf0, cn_isf1, 0, 0, 0, 0, 0};
      double r[wb::kFrame];
      double isf[16];
      {
        double res[16];
        wb::isf_residual(idx, res);
        for (int i = 0; i < 16; ++i)
          isf[i] = res[i] + wbt::kIsfMean[i];
        double prev = 0.0;
        for (int i = 0; i < 15; ++i) {
          isf[i] = std::max(isf[i], prev + 1.0 / 256.0);
          prev = isf[i];
        }
      }
      double isp[16], a[17];
      wb::isf_to_isp(isf, isp);
      wb::isp_to_a(isp, a);
      double e = 0.0;
      for (int n = 0; n < wb::kFrame; ++n) {
        rng = rng * 1664525u + 1013904223u;
        double w = ((int32_t)(rng >> 8) / 8388608.0) - 1.0;
        double v = w;
        for (int k = 1; k <= 16; ++k) {
          double past = (n - k >= 0) ? r[n - k] : cn_mem[16 + n - k];
          v -= a[k] * past;
        }
        r[n] = v;
        e += v * v;
      }
      for (int k = 0; k < 16; ++k) cn_mem[k] = r[wb::kFrame - 16 + k];
      double g = cn_rms / std::sqrt(e / wb::kFrame + 1e-12);
      float out12[wb::kFrame];
      for (int n = 0; n < wb::kFrame; ++n) out12[n] = (float)(r[n] * g);
      float buf[320];
      dec.upsample(out12, buf);
      for (int i = 0; i < 320 && (size_t)written < maxn; ++i)
        out[written++] = buf[i];
      continue;
    }
    if (ft > 8) return -1;
    const wb::ModeLayout& L = wb::layout(ft);
    if (pos + (size_t)L.nbytes > size) break;
    wb::Bits bits;
    bits.clear();
    const uint8_t* payload = data + pos + 1;
    for (int i = 0; i < L.nbits; ++i)
      bits.b[i] = (payload[i >> 3] >> (7 - (i & 7))) & 1;
    pos += L.nbytes;
    dec.mode = ft;               // per-frame mode switch, like lavc
    wb::FrameParams p;
    wb::parse_frame(ft, bits, &p);
    float out12[wb::kFrame];
    dec.frame(p, out12);
    float buf[320];
    dec.upsample(out12, buf);
    for (int i = 0; i < 320 && (size_t)written < maxn; ++i)
      out[written++] = buf[i];
  }
  return written;
}

/* Encode with VAD-gated DTX: speech frames at 12.65k, silence runs
 * as SID (type 9, every 8th frame) + NO_DATA, mirroring the NB
 * design. Returns bytes written. */
long amrwb_encode_dtx_mode(int mode, const float* in, size_t n,
                           uint8_t* out) {
  // encode everything first (keeps the AbS state continuous), then
  // replace gated-silence frames by SID/NO_DATA framing.
  int fsz = wb::layout(mode).nbytes;
  size_t nframes = (n + 319) / 320;
  std::vector<uint8_t> full(nframes * fsz + 2 * fsz);
  long nb = amrwb_encode_mode(mode, in, n, full.data());
  if (nb < 0) return nb;
  size_t have = (size_t)nb / fsz;
  wbdtx::Vad vad;
  long written = 0;
  int since_sid = 8;
  for (size_t f = 0; f < have; ++f) {
    size_t s0 = f * 320;
    size_t len = std::min((size_t)320, n - std::min(n, s0));
    bool speech = len > 0 && vad.frame(in + s0, (int)len);
    if (speech) {
      std::memcpy(out + written, full.data() + f * fsz, fsz);
      written += fsz;
      since_sid = 8;
    } else if (since_sid >= 8) {
      // SID: quantize the frame's spectrum/energy crudely via the
      // encoder tables: reuse stage-1 ISF search on a flat target.
      double e = 1e-12;
      for (size_t i = 0; i < len; ++i)
        e += (double)in[s0 + i] * in[s0 + i];
      double edb = 10.0 * std::log10(e / std::max(len, (size_t)1));
      int elog = (int)std::lround(edb + 80.0);
      if (elog < 0) elog = 0;
      if (elog > 63) elog = 63;
      out[written] = (9 << 3) | 0x04;
      uint8_t* payload = out + written + 1;
      std::memset(payload, 0, 5);
      wbdtx::put_bits(payload, 0, 8, 0);
      wbdtx::put_bits(payload, 8, 8, 0);
      wbdtx::put_bits(payload, 16, 6, elog);
      written += 6;
      since_sid = 0;
    } else {
      out[written++] = (15 << 3) | 0x04;   // NO_DATA
      ++since_sid;
    }
  }
  return written;
}

long amrwb_encode_dtx(const float* in, size_t n, uint8_t* out) {
  return amrwb_encode_dtx_mode(2, in, n, out);
}

/* encode->decode round trip at 16 kHz (the augmentation entry). */
void amrwb_roundtrip_mode(int mode, const float* in, float* out,
                          size_t n) {
  int fsz = wb::layout(mode).nbytes;
  size_t nframes = (n * 4 / 5) / wb::kFrame + 3;
  std::vector<uint8_t> bs(nframes * fsz);
  long nb = amrwb_encode_mode(mode, in, n, bs.data());
  std::vector<float> dec(nframes * 320 + 640, 0.0f);
  long m = amrwb_decode(bs.data(), (size_t)std::max(nb, 0L), dec.data(),
                        dec.size());
  if (m < 0) m = 0;
  // the decode chain delays by ~15 samples at 16 kHz (upsampler);
  // compensate so the round trip is time-aligned with the input.
  const long lead = 15;
  for (size_t i = 0; i < n; ++i) {
    long j = (long)i + lead;
    out[i] = (j < m) ? dec[j] : 0.0f;
  }
}

void amrwb_roundtrip(const float* in, float* out, size_t n) {
  amrwb_roundtrip_mode(2, in, out, n);
}

/* encode->decode round trip with DTX framing. */
void amrwb_roundtrip_dtx_mode(int mode, const float* in, float* out,
                              size_t n) {
  int fsz = wb::layout(mode).nbytes;
  size_t nframes = (n * 4 / 5) / wb::kFrame + 3;
  std::vector<uint8_t> bs(nframes * fsz + 2 * fsz);
  long nb = amrwb_encode_dtx_mode(mode, in, n, bs.data());
  std::vector<float> dec(nframes * 320 + 640, 0.0f);
  long m = amrwb_decode(bs.data(), (size_t)std::max(nb, 0L), dec.data(),
                        dec.size());
  if (m < 0) m = 0;
  const long lead = 15;
  for (size_t i = 0; i < n; ++i) {
    long j = (long)i + lead;
    out[i] = (j < m) ? dec[j] : 0.0f;
  }
}

void amrwb_roundtrip_dtx(const float* in, float* out, size_t n) {
  amrwb_roundtrip_dtx_mode(2, in, out, n);
}

/* debug: decode and dump the 256-sample excitation memory after each
 * frame (for lockstep comparison against the lavc context). */
long amrwb_decode_trace(const uint8_t* data, size_t size, float* exc_out,
                        size_t maxn) {
  wb::Decoder dec;
  size_t pos = 0;
  long frames = 0;
  while (pos < size) {
    int ft = (data[pos] >> 3) & 0x0F;
    if (ft != 2) { if (ft == 15) { pos += 1; continue; } return -1; }
    if (pos + 1 + wb::kPayload > size) break;
    wb::Bits bits;
    bits.clear();
    const uint8_t* payload = data + pos + 1;
    for (int i = 0; i < wb::kBits; ++i)
      bits.b[i] = (payload[i >> 3] >> (7 - (i & 7))) & 1;
    pos += 1 + wb::kPayload;
    wb::FrameParams p;
    wb::parse_frame(2, bits, &p);
    float out12[wb::kFrame];
    dec.frame(p, out12);
    if ((size_t)(frames + 1) * 256 <= maxn)
      std::memcpy(exc_out + frames * 256, dec.exc + wb::kHist,
                  256 * sizeof(float));
    ++frames;
  }
  return frames;
}

} /* extern "C" */
