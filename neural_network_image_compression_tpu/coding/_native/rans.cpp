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

// ---------------------------------------------------------------------------
// rans64x4: 64-bit-state rANS, u32 renormalization, 4 interleaved states.
//
// The 32-bit coder above is a single serial dependency chain — every symbol's
// state update waits on the previous one, which caps decode near ~40 Msym/s.
// Interleaving W=4 independent states (symbol i uses state i % 4) gives the
// CPU four independent chains to pipeline, and the 64-bit state with 32-bit
// renormalization turns the per-symbol byte-at-a-time renorm loop into at
// most one u32 word in/out. Same CDF tables, different byte format (the
// container records which coder wrote a stream — flag bit4).
//
// Stream layout: little-endian u32 words. The first 8 words are the four
// final encoder states (state 3 first: hi32, lo32, then state 2, ...), the
// rest are renormalization words in decode order. Encode walks symbols in
// reverse pushing words, then reverses the word vector, so global word order
// is LIFO and the interleaving needs no per-lane framing.

namespace {

constexpr uint64_t kRans64L = 1ull << 31;  // state lower bound
constexpr int kWays = 4;

inline void rans64_put(uint64_t& state, std::vector<uint32_t>& words,
                       uint32_t start, uint32_t freq, uint32_t prob_bits) {
  const uint64_t x_max = ((kRans64L >> prob_bits) << 32) * freq;
  if (state >= x_max) {
    words.push_back(static_cast<uint32_t>(state));
    state >>= 32;
  }
  state = ((state / freq) << prob_bits) + (state % freq) + start;
}

inline int64_t rans64_flush(std::vector<uint32_t>& words, uint64_t* states,
                            uint8_t* out, int64_t out_cap) {
  for (int w = 0; w < kWays; ++w) {
    words.push_back(static_cast<uint32_t>(states[w]));
    words.push_back(static_cast<uint32_t>(states[w] >> 32));
  }
  const int64_t total = static_cast<int64_t>(words.size()) * 4;
  if (total > out_cap) return -1;
  uint8_t* p = out;
  for (auto it = words.rbegin(); it != words.rend(); ++it) {
    const uint32_t v = *it;
    std::memcpy(p, &v, 4);
    p += 4;
  }
  return total;
}

struct Rans64Reader {
  const uint8_t* p;
  const uint8_t* end;
  uint64_t states[kWays];

  // Returns false on truncated input.
  bool init(const uint8_t* in, int64_t in_len) {
    if (in_len < 4 * 2 * kWays || (in_len & 3)) return false;
    p = in;
    end = in + in_len;
    for (int w = kWays - 1; w >= 0; --w) {
      uint32_t hi, lo;
      std::memcpy(&hi, p, 4);
      std::memcpy(&lo, p + 4, 4);
      p += 8;
      states[w] = (static_cast<uint64_t>(hi) << 32) | lo;
    }
    return true;
  }

  inline bool renorm(uint64_t& state) {
    if (state < kRans64L) {
      if (p >= end) return false;
      uint32_t v;
      std::memcpy(&v, p, 4);
      p += 4;
      state = (state << 32) | v;
    }
    return true;
  }
};

// Builds the slot->symbol table (rows << prob_bits bytes). Returns false if a
// row's CDF does not sum to 1 << prob_bits.
bool build_lut(const uint32_t* cdfs, int32_t rows, int32_t levels,
               int32_t prob_bits, uint8_t* lut) {
  const int64_t stride = levels + 1;
  for (int32_t row = 0; row < rows; ++row) {
    const uint32_t* cdf = cdfs + static_cast<int64_t>(row) * stride;
    if (cdf[levels] != (1u << prob_bits)) return false;
    uint8_t* dst = lut + (static_cast<size_t>(row) << prob_bits);
    for (int32_t s = 0; s < levels; ++s) {
      for (uint32_t slot = cdf[s]; slot < cdf[s + 1]; ++slot) {
        dst[slot] = static_cast<uint8_t>(s);
      }
    }
  }
  return true;
}

}  // namespace

int64_t rans_build_lut(const uint32_t* cdfs, int32_t rows, int32_t levels,
                       int32_t prob_bits, uint8_t* lut_out) {
  if (rows <= 0 || levels <= 0 || levels > 256 || prob_bits < 9 ||
      prob_bits > 16) {
    return -1;
  }
  return build_lut(cdfs, rows, levels, prob_bits, lut_out)
             ? (static_cast<int64_t>(rows) << prob_bits)
             : -1;
}

int64_t rans64_encode(const uint8_t* symbols, int64_t n, int32_t num_channels,
                      int32_t levels, const uint32_t* cdfs, int32_t prob_bits,
                      uint8_t* out, int64_t out_cap) {
  if (n < 0 || num_channels <= 0 || levels <= 0 || prob_bits < 9 ||
      prob_bits > 16) {
    return -1;
  }
  std::vector<uint32_t> words;
  words.reserve(static_cast<size_t>(n) / 2 + 16);
  uint64_t states[kWays] = {kRans64L, kRans64L, kRans64L, kRans64L};
  const int64_t stride = levels + 1;
  for (int64_t i = n - 1; i >= 0; --i) {
    const int32_t ch = static_cast<int32_t>(i % num_channels);
    const uint32_t* cdf = cdfs + static_cast<int64_t>(ch) * stride;
    const uint32_t s = symbols[i];
    const uint32_t start = cdf[s];
    const uint32_t freq = cdf[s + 1] - cdf[s];
    if (freq == 0) return -1;
    rans64_put(states[i % kWays], words, start, freq,
               static_cast<uint32_t>(prob_bits));
  }
  return rans64_flush(words, states, out, out_cap);
}

int64_t rans64_decode(const uint8_t* in, int64_t in_len, int64_t n,
                      int32_t num_channels, int32_t levels,
                      const uint32_t* cdfs, int32_t prob_bits,
                      const uint8_t* lut_opt, uint8_t* out_symbols) {
  if (n < 0 || num_channels <= 0 || levels <= 0 || levels > 256 ||
      prob_bits < 9 || prob_bits > 16) {
    return -1;
  }
  const uint32_t prob_mask = (1u << prob_bits) - 1;
  const int64_t stride = levels + 1;
  std::vector<uint8_t> lut_store;
  const uint8_t* lut = lut_opt;
  if (!lut) {
    lut_store.resize(static_cast<size_t>(num_channels) << prob_bits);
    if (!build_lut(cdfs, num_channels, levels, prob_bits, lut_store.data()))
      return -1;
    lut = lut_store.data();
  }
  Rans64Reader r;
  if (!r.init(in, in_len)) return -1;
  uint64_t x0 = r.states[0], x1 = r.states[1], x2 = r.states[2],
           x3 = r.states[3];
  const int64_t n4 = n & ~static_cast<int64_t>(3);
  int64_t i = 0;
  // Main unrolled loop: lanes decode independently (ILP); the shared renorm
  // pointer advances in lane order, matching the encoder's reversed pushes.
  for (; i < n4; i += 4) {
#define NNIC_DECODE_LANE(X, OFF)                                           \
  {                                                                        \
    const int32_t ch = static_cast<int32_t>((i + (OFF)) % num_channels);   \
    const uint32_t slot = static_cast<uint32_t>(X) & prob_mask;            \
    const uint8_t s =                                                      \
        lut[(static_cast<size_t>(ch) << prob_bits) + slot];                \
    out_symbols[i + (OFF)] = s;                                            \
    const uint32_t* cdf = cdfs + static_cast<int64_t>(ch) * stride;        \
    const uint32_t start = cdf[s];                                         \
    const uint32_t freq = cdf[s + 1] - start;                              \
    X = freq * (X >> prob_bits) + slot - start;                            \
    if (!r.renorm(X)) return -1;                                           \
  }
    NNIC_DECODE_LANE(x0, 0)
    NNIC_DECODE_LANE(x1, 1)
    NNIC_DECODE_LANE(x2, 2)
    NNIC_DECODE_LANE(x3, 3)
  }
  uint64_t tail_states[kWays] = {x0, x1, x2, x3};
  for (; i < n; ++i) {
    const int32_t ch = static_cast<int32_t>(i % num_channels);
    uint64_t& x = tail_states[i % kWays];
    const uint32_t slot = static_cast<uint32_t>(x) & prob_mask;
    const uint8_t s = lut[(static_cast<size_t>(ch) << prob_bits) + slot];
    out_symbols[i] = s;
    const uint32_t* cdf = cdfs + static_cast<int64_t>(ch) * stride;
    const uint32_t start = cdf[s];
    const uint32_t freq = cdf[s + 1] - start;
    x = freq * (x >> prob_bits) + slot - start;
    if (!r.renorm(x)) return -1;
  }
  return n;
}

int64_t rans64_encode_indexed(const uint8_t* symbols, const int32_t* index,
                              int64_t n, int32_t num_rows, int32_t levels,
                              const uint32_t* cdfs, int32_t prob_bits,
                              uint8_t* out, int64_t out_cap) {
  if (n < 0 || num_rows <= 0 || levels <= 0 || prob_bits < 9 ||
      prob_bits > 16) {
    return -1;
  }
  std::vector<uint32_t> words;
  words.reserve(static_cast<size_t>(n) / 2 + 16);
  uint64_t states[kWays] = {kRans64L, kRans64L, kRans64L, kRans64L};
  const int64_t stride = levels + 1;
  for (int64_t i = n - 1; i >= 0; --i) {
    const int32_t row = index[i];
    if (row < 0 || row >= num_rows) return -1;
    const uint32_t* cdf = cdfs + static_cast<int64_t>(row) * stride;
    const uint32_t s = symbols[i];
    const uint32_t start = cdf[s];
    const uint32_t freq = cdf[s + 1] - cdf[s];
    if (freq == 0) return -1;
    rans64_put(states[i % kWays], words, start, freq,
               static_cast<uint32_t>(prob_bits));
  }
  return rans64_flush(words, states, out, out_cap);
}

int64_t rans64_decode_indexed(const uint8_t* in, int64_t in_len, int64_t n,
                              const int32_t* index, int32_t num_rows,
                              int32_t levels, const uint32_t* cdfs,
                              int32_t prob_bits, const uint8_t* lut_opt,
                              uint8_t* out_symbols) {
  if (n < 0 || num_rows <= 0 || levels <= 0 || levels > 256 ||
      prob_bits < 9 || prob_bits > 16) {
    return -1;
  }
  const uint32_t prob_mask = (1u << prob_bits) - 1;
  const int64_t stride = levels + 1;
  std::vector<uint8_t> lut_store;
  const uint8_t* lut = lut_opt;
  if (!lut) {
    lut_store.resize(static_cast<size_t>(num_rows) << prob_bits);
    if (!build_lut(cdfs, num_rows, levels, prob_bits, lut_store.data()))
      return -1;
    lut = lut_store.data();
  }
  Rans64Reader r;
  if (!r.init(in, in_len)) return -1;
  uint64_t x0 = r.states[0], x1 = r.states[1], x2 = r.states[2],
           x3 = r.states[3];
  const int64_t n4 = n & ~static_cast<int64_t>(3);
  int64_t i = 0;
  for (; i < n4; i += 4) {
#define NNIC_DECODE_LANE_IDX(X, OFF)                                       \
  {                                                                        \
    const int32_t row = index[i + (OFF)];                                  \
    if (row < 0 || row >= num_rows) return -1;                             \
    const uint32_t slot = static_cast<uint32_t>(X) & prob_mask;            \
    const uint8_t s =                                                      \
        lut[(static_cast<size_t>(row) << prob_bits) + slot];               \
    out_symbols[i + (OFF)] = s;                                            \
    const uint32_t* cdf = cdfs + static_cast<int64_t>(row) * stride;       \
    const uint32_t start = cdf[s];                                         \
    const uint32_t freq = cdf[s + 1] - start;                              \
    X = freq * (X >> prob_bits) + slot - start;                            \
    if (!r.renorm(X)) return -1;                                           \
  }
    NNIC_DECODE_LANE_IDX(x0, 0)
    NNIC_DECODE_LANE_IDX(x1, 1)
    NNIC_DECODE_LANE_IDX(x2, 2)
    NNIC_DECODE_LANE_IDX(x3, 3)
  }
  uint64_t tail_states[kWays] = {x0, x1, x2, x3};
  for (; i < n; ++i) {
    const int32_t row = index[i];
    if (row < 0 || row >= num_rows) return -1;
    uint64_t& x = tail_states[i % kWays];
    const uint32_t slot = static_cast<uint32_t>(x) & prob_mask;
    const uint8_t s = lut[(static_cast<size_t>(row) << prob_bits) + slot];
    out_symbols[i] = s;
    const uint32_t* cdf = cdfs + static_cast<int64_t>(row) * stride;
    const uint32_t start = cdf[s];
    const uint32_t freq = cdf[s + 1] - start;
    x = freq * (x >> prob_bits) + slot - start;
    if (!r.renorm(x)) return -1;
  }
  return n;
}

// ---------------------------------------------------------------------------
// Lane-parallel format (coding/lane.py; container v3 coder=2): K interleaved
// 32-bit states with 16-bit renorm, encoded ON the TPU (jnp lax.scan); this
// is the matching host decoder. Stream: u16 K | u32 states[K] | u16 words in
// consumption order. Symbol i lives in lane i % K; CDF row of symbol i is
// rows[i].
int64_t rans_lane_decode(const uint8_t* in, int64_t in_len, int64_t n,
                         const int32_t* rows, int32_t n_rows, int32_t levels,
                         const uint32_t* cdfs, int32_t prob_bits,
                         const uint8_t* lut, uint8_t* out_symbols) {
  if (n < 0 || n_rows <= 0 || levels <= 0 || levels > 256 || prob_bits < 9 ||
      prob_bits > 16 || in_len < 2) {
    return -1;
  }
  const uint32_t k = static_cast<uint32_t>(in[0]) |
                     (static_cast<uint32_t>(in[1]) << 8);
  if (k == 0 || in_len < 2 + 4 * static_cast<int64_t>(k)) return -1;
  std::vector<uint32_t> states(k);
  const uint8_t* p = in + 2;
  for (uint32_t l = 0; l < k; ++l) {
    states[l] = static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
                (static_cast<uint32_t>(p[2]) << 16) |
                (static_cast<uint32_t>(p[3]) << 24);
    p += 4;
  }
  const uint8_t* words = p;
  const int64_t n_words = (in_len - 2 - 4 * static_cast<int64_t>(k)) / 2;
  int64_t wp = 0;
  const uint32_t mask = (1u << prob_bits) - 1u;
  const int64_t stride = levels + 1;
  const uint32_t lower = 1u << 16;
  uint32_t l = 0;  // lane counter: i % k without a per-symbol divide
  for (int64_t i = 0; i < n; ++i, l = (l + 1 == k) ? 0 : l + 1) {
    const int32_t row = rows[i];
    if (row < 0 || row >= n_rows) return -1;
    uint32_t x = states[l];
    const uint32_t slot = x & mask;
    const uint8_t s = lut[(static_cast<size_t>(row) << prob_bits) + slot];
    out_symbols[i] = s;
    const uint32_t* cdf = cdfs + static_cast<int64_t>(row) * stride;
    const uint32_t start = cdf[s];
    const uint32_t freq = cdf[s + 1] - start;
    x = freq * (x >> prob_bits) + slot - start;
    if (x < lower) {
      if (wp >= n_words) return -1;
      const uint32_t w = static_cast<uint32_t>(words[2 * wp]) |
                         (static_cast<uint32_t>(words[2 * wp + 1]) << 8);
      x = (x << 16) | w;
      ++wp;
    }
    states[l] = x;
  }
  return n;
}

}  // extern "C"
