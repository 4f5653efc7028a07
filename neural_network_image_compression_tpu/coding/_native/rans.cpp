// rANS entropy coder for quantized latent symbols.
//
// TPU-native replacement for the reference's PNG/DEFLATE stand-in (the
// reference writes the packed uint8 latent as an optimized PNG and calls that
// the bitstream — reference tf2_0/src/utils.py:42-43,85-87). Here the learned
// per-channel CDF tables (coding/cdf.py, from models/entropy.py) drive a
// byte-wise range Asymmetric Numeral System coder.
//
// Layout contract with the Python side:
//   - cdfs: [num_channels][levels+1] uint32, cdf[ch][levels] == 1 << prob_bits
//   - the channel of flattened symbol i is (i % num_channels), i.e. symbols
//     are a row-major [spatial, channels] array
//   - streams are independent per plane/tile (embarrassingly parallel), so
//     the multi-chip path can gather per-tile segments with ICI collectives.
//
// Encoding walks the symbols in reverse (rANS is LIFO); decode is forward.
// Decode uses a slot->symbol lookup table per channel (size 1<<prob_bits)
// built once per call batch for O(1) symbol resolution.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kStateLowerBound = 1u << 23;  // renormalization threshold

struct Encoder {
  std::vector<uint8_t> bytes;  // emitted in reverse order
  uint32_t state = kStateLowerBound;

  inline void put(uint32_t start, uint32_t freq, uint32_t prob_bits) {
    // Renormalize: emit low bytes until state fits.
    const uint32_t x_max = ((kStateLowerBound >> prob_bits) << 8) * freq;
    while (state >= x_max) {
      bytes.push_back(static_cast<uint8_t>(state & 0xff));
      state >>= 8;
    }
    state = ((state / freq) << prob_bits) + (state % freq) + start;
  }
};

}  // namespace

extern "C" {

// Returns the number of bytes written to `out`, or -1 if `out_cap` is too
// small / inputs are invalid.
int64_t rans_encode(const uint8_t* symbols, int64_t n, int32_t num_channels,
                    int32_t levels, const uint32_t* cdfs, int32_t prob_bits,
                    uint8_t* out, int64_t out_cap) {
  if (n < 0 || num_channels <= 0 || levels <= 0 || prob_bits < 9 ||
      prob_bits > 16) {
    return -1;
  }
  Encoder enc;
  enc.bytes.reserve(static_cast<size_t>(n) + 16);
  const int64_t stride = levels + 1;
  for (int64_t i = n - 1; i >= 0; --i) {
    const int32_t ch = static_cast<int32_t>(i % num_channels);
    const uint32_t* cdf = cdfs + static_cast<int64_t>(ch) * stride;
    const uint32_t s = symbols[i];
    const uint32_t start = cdf[s];
    const uint32_t freq = cdf[s + 1] - cdf[s];
    if (freq == 0) return -1;  // tables must give every symbol mass >= 1
    enc.put(start, freq, static_cast<uint32_t>(prob_bits));
  }
  // Flush the 32-bit state (little-endian), then reverse everything so the
  // decoder reads forward.
  const int64_t total = static_cast<int64_t>(enc.bytes.size()) + 4;
  if (total > out_cap) return -1;
  uint8_t* p = out;
  *p++ = static_cast<uint8_t>(enc.state & 0xff);
  *p++ = static_cast<uint8_t>((enc.state >> 8) & 0xff);
  *p++ = static_cast<uint8_t>((enc.state >> 16) & 0xff);
  *p++ = static_cast<uint8_t>((enc.state >> 24) & 0xff);
  for (auto it = enc.bytes.rbegin(); it != enc.bytes.rend(); ++it) *p++ = *it;
  return total;
}

// Decodes exactly `n` symbols into `out_symbols`. Returns n on success, -1 on
// malformed input.
int64_t rans_decode(const uint8_t* in, int64_t in_len, int64_t n,
                    int32_t num_channels, int32_t levels, const uint32_t* cdfs,
                    int32_t prob_bits, uint8_t* out_symbols) {
  if (in_len < 4 || n < 0 || num_channels <= 0 || levels <= 0 ||
      prob_bits < 9 || prob_bits > 16) {
    return -1;
  }
  const uint32_t prob_mask = (1u << prob_bits) - 1;
  const int64_t stride = levels + 1;

  // Build slot -> symbol lookup per channel.
  std::vector<uint8_t> slot2sym(static_cast<size_t>(num_channels)
                                << prob_bits);
  for (int32_t ch = 0; ch < num_channels; ++ch) {
    const uint32_t* cdf = cdfs + static_cast<int64_t>(ch) * stride;
    if (cdf[levels] != (1u << prob_bits)) return -1;
    uint8_t* lut = slot2sym.data() + (static_cast<size_t>(ch) << prob_bits);
    for (int32_t s = 0; s < levels; ++s) {
      for (uint32_t slot = cdf[s]; slot < cdf[s + 1]; ++slot) {
        lut[slot] = static_cast<uint8_t>(s);
      }
    }
  }

  const uint8_t* p = in;
  const uint8_t* end = in + in_len;
  uint32_t state = static_cast<uint32_t>(p[0]) |
                   (static_cast<uint32_t>(p[1]) << 8) |
                   (static_cast<uint32_t>(p[2]) << 16) |
                   (static_cast<uint32_t>(p[3]) << 24);
  p += 4;

  for (int64_t i = 0; i < n; ++i) {
    const int32_t ch = static_cast<int32_t>(i % num_channels);
    const uint32_t* cdf = cdfs + static_cast<int64_t>(ch) * stride;
    const uint8_t* lut = slot2sym.data() + (static_cast<size_t>(ch) << prob_bits);
    const uint32_t slot = state & prob_mask;
    const uint8_t s = lut[slot];
    out_symbols[i] = s;
    const uint32_t start = cdf[s];
    const uint32_t freq = cdf[s + 1] - cdf[s];
    state = freq * (state >> prob_bits) + slot - start;
    while (state < kStateLowerBound) {
      if (p >= end) return -1;
      state = (state << 8) | *p++;
    }
  }
  return n;
}

// Indexed variants: symbol i uses CDF row index[i] (instead of i % C).
// This is what conditional (context-model) coding needs: the per-symbol row
// is the quantized scale bin of the predicted conditional distribution.

int64_t rans_encode_indexed(const uint8_t* symbols, const int32_t* index,
                            int64_t n, int32_t num_rows, int32_t levels,
                            const uint32_t* cdfs, int32_t prob_bits,
                            uint8_t* out, int64_t out_cap) {
  if (n < 0 || num_rows <= 0 || levels <= 0 || prob_bits < 9 ||
      prob_bits > 16) {
    return -1;
  }
  Encoder enc;
  enc.bytes.reserve(static_cast<size_t>(n) + 16);
  const int64_t stride = levels + 1;
  for (int64_t i = n - 1; i >= 0; --i) {
    const int32_t row = index[i];
    if (row < 0 || row >= num_rows) return -1;
    const uint32_t* cdf = cdfs + static_cast<int64_t>(row) * stride;
    const uint32_t s = symbols[i];
    const uint32_t start = cdf[s];
    const uint32_t freq = cdf[s + 1] - cdf[s];
    if (freq == 0) return -1;
    enc.put(start, freq, static_cast<uint32_t>(prob_bits));
  }
  const int64_t total = static_cast<int64_t>(enc.bytes.size()) + 4;
  if (total > out_cap) return -1;
  uint8_t* p = out;
  *p++ = static_cast<uint8_t>(enc.state & 0xff);
  *p++ = static_cast<uint8_t>((enc.state >> 8) & 0xff);
  *p++ = static_cast<uint8_t>((enc.state >> 16) & 0xff);
  *p++ = static_cast<uint8_t>((enc.state >> 24) & 0xff);
  for (auto it = enc.bytes.rbegin(); it != enc.bytes.rend(); ++it) *p++ = *it;
  return total;
}

int64_t rans_decode_indexed(const uint8_t* in, int64_t in_len, int64_t n,
                            const int32_t* index, int32_t num_rows,
                            int32_t levels, const uint32_t* cdfs,
                            int32_t prob_bits, uint8_t* out_symbols) {
  if (in_len < 4 || n < 0 || num_rows <= 0 || levels <= 0 || prob_bits < 9 ||
      prob_bits > 16) {
    return -1;
  }
  const uint32_t prob_mask = (1u << prob_bits) - 1;
  const int64_t stride = levels + 1;

  std::vector<uint8_t> slot2sym(static_cast<size_t>(num_rows) << prob_bits);
  for (int32_t row = 0; row < num_rows; ++row) {
    const uint32_t* cdf = cdfs + static_cast<int64_t>(row) * stride;
    if (cdf[levels] != (1u << prob_bits)) return -1;
    uint8_t* lut = slot2sym.data() + (static_cast<size_t>(row) << prob_bits);
    for (int32_t s = 0; s < levels; ++s) {
      for (uint32_t slot = cdf[s]; slot < cdf[s + 1]; ++slot) {
        lut[slot] = static_cast<uint8_t>(s);
      }
    }
  }

  const uint8_t* p = in;
  const uint8_t* end = in + in_len;
  uint32_t state = static_cast<uint32_t>(p[0]) |
                   (static_cast<uint32_t>(p[1]) << 8) |
                   (static_cast<uint32_t>(p[2]) << 16) |
                   (static_cast<uint32_t>(p[3]) << 24);
  p += 4;

  for (int64_t i = 0; i < n; ++i) {
    const int32_t row = index[i];
    if (row < 0 || row >= num_rows) return -1;
    const uint32_t* cdf = cdfs + static_cast<int64_t>(row) * stride;
    const uint8_t* lut = slot2sym.data() + (static_cast<size_t>(row) << prob_bits);
    const uint32_t slot = state & prob_mask;
    const uint8_t s = lut[slot];
    out_symbols[i] = s;
    const uint32_t start = cdf[s];
    const uint32_t freq = cdf[s + 1] - cdf[s];
    state = freq * (state >> prob_bits) + slot - start;
    while (state < kStateLowerBound) {
      if (p >= end) return -1;
      state = (state << 8) | *p++;
    }
  }
  return n;
}

}  // extern "C"
