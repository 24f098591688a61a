/* ITU-T G.711 mu-law / A-law companding, bit-exact segment encoding. */

#include "augment.h"

#include <algorithm>
#include <cmath>

namespace {

constexpr int kUlawBias = 0x84;  /* 132 */
constexpr int kUlawClip = 32635;

int16_t clamp_pcm(float x) {
  float s = x * 32768.0f;
  s = std::max(-32768.0f, std::min(32767.0f, s));
  return static_cast<int16_t>(std::lrintf(s));
}

int segment(int value, const int16_t* seg_ends, int n_segs) {
  for (int i = 0; i < n_segs; ++i) {
    if (value <= seg_ends[i]) return i;
  }
  return n_segs;
}

constexpr int16_t kSegUend[8] = {0xFF, 0x1FF, 0x3FF, 0x7FF,
                                 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF};
constexpr int16_t kSegAend[8] = {0x1F, 0x3F, 0x7F, 0xFF,
                                 0x1FF, 0x3FF, 0x7FF, 0xFFF};

}  // namespace

extern "C" {

uint8_t g711_ulaw_encode_sample(int16_t pcm) {
  int mask;
  int value = pcm;
  if (value < 0) {
    value = -value;
    mask = 0x7F;
  } else {
    mask = 0xFF;
  }
  if (value > kUlawClip) value = kUlawClip;
  value += kUlawBias;
  int seg = segment(value, kSegUend, 8);
  if (seg >= 8) return static_cast<uint8_t>(0x7F ^ mask);
  uint8_t code = static_cast<uint8_t>((seg << 4) | ((value >> (seg + 3)) & 0xF));
  return static_cast<uint8_t>(code ^ mask);
}

int16_t g711_ulaw_decode_sample(uint8_t code) {
  code = ~code;
  int t = ((code & 0x0F) << 3) + kUlawBias;
  t <<= (code & 0x70) >> 4;
  return static_cast<int16_t>((code & 0x80) ? (kUlawBias - t) : (t - kUlawBias));
}

uint8_t g711_alaw_encode_sample(int16_t pcm) {
  int mask;
  int value = pcm >> 3;  /* 13-bit A-law input */
  if (value >= 0) {
    mask = 0xD5;  /* sign (7th) bit = 1, with even-bit inversion */
  } else {
    mask = 0x55;
    value = -value - 1;
  }
  int seg = segment(value, kSegAend, 8);
  uint8_t code;
  if (seg >= 8) {
    code = 0x7F;
  } else {
    code = static_cast<uint8_t>(seg << 4);
    code |= (seg < 2) ? ((value >> 1) & 0xF) : ((value >> seg) & 0xF);
  }
  return static_cast<uint8_t>(code ^ mask);
}

int16_t g711_alaw_decode_sample(uint8_t code) {
  code ^= 0x55;
  int t = (code & 0x0F) << 4;
  int seg = (code & 0x70) >> 4;
  switch (seg) {
    case 0:
      t += 8;
      break;
    case 1:
      t += 0x108;
      break;
    default:
      t += 0x108;
      t <<= seg - 1;
  }
  return static_cast<int16_t>((code & 0x80) ? t : -t);
}

void g711_ulaw_roundtrip(const float* in, float* out, size_t n) {
  for (size_t i = 0; i < n; ++i) {
    int16_t pcm = clamp_pcm(in[i]);
    out[i] = g711_ulaw_decode_sample(g711_ulaw_encode_sample(pcm)) / 32768.0f;
  }
}

void g711_alaw_roundtrip(const float* in, float* out, size_t n) {
  for (size_t i = 0; i < n; ++i) {
    int16_t pcm = clamp_pcm(in[i]);
    out[i] = g711_alaw_decode_sample(g711_alaw_encode_sample(pcm)) / 32768.0f;
  }
}

}  /* extern "C" */
