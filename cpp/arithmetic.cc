// Integer arithmetic coder for the .rec container — host-side native codec.
//
// TPU-native equivalent of the reference's Cython ArithmeticCoder
// (rec/io/entropy_coding.pyx): same integer interval-subdivision algorithm at
// configurable precision over a count histogram, EOF = symbol 0, but
// re-designed in C++ with
//   * O(log V) symbol lookup via plain binary search over the cumulative
//     counts (the intervals partition [0, width), so no AVL tree is needed —
//     cf. entropy_coding.pyx:212-302 + data_structures.py),
//   * 128-bit intermediate products so any count total < 2^62 is safe,
//   * packed-bit IO end to end (no per-bit Python string churn),
//   * a C ABI suitable for ctypes/cffi so the Python layer stays thin.
//
// Arithmetic coding is inherently serial bit manipulation, so it stays on the
// host CPU; the TPU produces the index streams (SURVEY.md §2.7).  Streams are
// independent per res-block, so callers parallelise across streams with
// rec_ac_encode_many (std::thread fan-out).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC arithmetic.cc -o librec_ac.so

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

using u64 = std::uint64_t;
using u128 = unsigned __int128;

struct BitWriter {
  std::uint8_t* buf;
  std::int64_t capacity_bits;
  std::int64_t n = 0;
  bool overflow = false;

  inline void push(int bit) {
    if (n >= capacity_bits) {
      overflow = true;
      return;
    }
    if (bit) buf[n >> 3] |= static_cast<std::uint8_t>(0x80u >> (n & 7));
    n++;
  }
  inline void push_run(int bit, std::int64_t count) {
    for (std::int64_t i = 0; i < count; ++i) push(bit);
  }
};

struct BitReader {
  const std::uint8_t* buf;
  std::int64_t nbits;
  inline int get(std::int64_t i) const {
    if (i >= nbits) return 0;
    return (buf[i >> 3] >> (7 - (i & 7))) & 1;
  }
};

// Cumulative counts: cdf[j] = sum of counts[0..j), cdf[V] = total.
static std::vector<u64> make_cdf(const std::int64_t* counts, int n_symbols) {
  std::vector<u64> cdf(n_symbols + 1);
  u64 c = 0;
  for (int i = 0; i < n_symbols; ++i) {
    cdf[i] = c;
    c += static_cast<u64>(counts[i]);
  }
  cdf[n_symbols] = c;
  return cdf;
}

}  // namespace

extern "C" {

// Upper bound on encoded size in bits for a message of msg_len symbols.
std::int64_t rec_ac_encode_bound_bits(std::int64_t msg_len, int precision) {
  return (msg_len + 2) * (precision + 2) + 64;
}

// Encode `message` (symbols in [0, n_symbols)) against the histogram
// `counts`.  Writes MSB-first packed bits into out (zeroed here), sets
// *out_bits.  Returns 0 on success, <0 on error.
int rec_ac_encode(const std::int64_t* counts, int n_symbols, int precision,
                  const std::int32_t* message, std::int64_t msg_len,
                  std::uint8_t* out, std::int64_t out_capacity_bytes,
                  std::int64_t* out_bits) {
  if (precision < 2 || precision > 60) return -1;
  std::vector<u64> cdf = make_cdf(counts, n_symbols);
  const u64 R = cdf[n_symbols];
  if (R == 0 || R >= (1ull << 62) / (1ull << precision)) return -2;

  const u64 whole = 1ull << precision;
  const u64 half = whole >> 1;
  const u64 quarter = whole >> 2;

  std::memset(out, 0, static_cast<size_t>(out_capacity_bytes));
  BitWriter w{out, out_capacity_bytes * 8};

  u64 low = 0, high = whole;
  std::int64_t s = 0;

  for (std::int64_t k = 0; k < msg_len; ++k) {
    const std::int32_t sym = message[k];
    if (sym < 0 || sym >= n_symbols || counts[sym] <= 0) return -3;
    const u64 width = high - low;
    high = low + static_cast<u64>((static_cast<u128>(width) * cdf[sym + 1]) / R);
    low = low + static_cast<u64>((static_cast<u128>(width) * cdf[sym]) / R);

    for (;;) {
      if (high < half) {
        w.push(0);
        w.push_run(1, s);
        s = 0;
        low <<= 1;
        high <<= 1;
      } else if (low > half) {
        w.push(1);
        w.push_run(0, s);
        s = 0;
        low = (low - half) << 1;
        high = (high - half) << 1;
      } else {
        break;
      }
    }
    while (low > quarter && high < 3 * quarter) {
      s++;
      low = (low - quarter) << 1;
      high = (high - quarter) << 1;
    }
  }

  s++;
  if (low <= quarter) {
    w.push(0);
    w.push_run(1, s);
  } else {
    w.push(1);
    w.push_run(0, s);
  }
  if (w.overflow) return -4;
  *out_bits = w.n;
  return 0;
}

// Decode until the EOF symbol 0 is emitted (inclusive).  Returns 0 on
// success; -5 if out capacity exhausted before EOF; -6 if the stream is
// corrupt (no progress possible).
int rec_ac_decode(const std::int64_t* counts, int n_symbols, int precision,
                  const std::uint8_t* bits, std::int64_t nbits,
                  std::int32_t* out_msg, std::int64_t out_capacity,
                  std::int64_t* out_len) {
  if (precision < 2 || precision > 60) return -1;
  std::vector<u64> cdf = make_cdf(counts, n_symbols);
  const u64 R = cdf[n_symbols];
  if (R == 0) return -2;

  const u64 whole = 1ull << precision;
  const u64 half = whole >> 1;
  const u64 quarter = whole >> 2;

  BitReader r{bits, nbits};
  u64 low = 0, high = whole, z = 0;
  std::int64_t i = 0;
  for (; i < precision; ++i) z = (z << 1) | static_cast<u64>(r.get(i));

  std::int64_t m = 0;
  for (;;) {
    const u64 width = high - low;
    const u64 zoff = z - low;
    // Largest j with (width * cdf[j]) / R <= zoff: binary search (the
    // symbol intervals partition [0, width)).
    int lo = 0, hi = n_symbols - 1;
    while (lo < hi) {
      const int mid = (lo + hi + 1) >> 1;
      const u64 l = static_cast<u64>((static_cast<u128>(width) * cdf[mid]) / R);
      if (l <= zoff)
        lo = mid;
      else
        hi = mid - 1;
    }
    const int j = lo;
    const u64 high_ = low + static_cast<u64>(
                                (static_cast<u128>(width) * cdf[j + 1]) / R);
    const u64 low_ = low + static_cast<u64>(
                               (static_cast<u128>(width) * cdf[j]) / R);
    if (!(low_ <= z && z < high_)) return -6;

    if (m >= out_capacity) return -5;
    out_msg[m++] = j;
    low = low_;
    high = high_;
    if (j == 0) {  // EOF
      *out_len = m;
      return 0;
    }

    for (;;) {
      if (high < half) {
        low <<= 1;
        high <<= 1;
        z = (z << 1) | static_cast<u64>(r.get(i++));
      } else if (low > half) {
        low = (low - half) << 1;
        high = (high - half) << 1;
        z = ((z - half) << 1) | static_cast<u64>(r.get(i++));
      } else {
        break;
      }
    }
    while (low > quarter && high < 3 * quarter) {
      low = (low - quarter) << 1;
      high = (high - quarter) << 1;
      z = ((z - quarter) << 1) | static_cast<u64>(r.get(i++));
    }
  }
}

// Parallel multi-stream encode: `num_streams` independent messages coded
// against per-stream histograms on host threads (per-res-block streams are
// independent in the .rec format, ref rec/io/utils.py:66-68).
// Layout: messages/counts are concatenated with offset arrays.
int rec_ac_encode_many(const std::int64_t* counts, const std::int64_t* counts_off,
                       const std::int32_t* n_symbols, int precision,
                       const std::int32_t* messages, const std::int64_t* msg_off,
                       int num_streams, std::uint8_t* out,
                       const std::int64_t* out_byte_off, std::int64_t* out_bits,
                       std::int32_t* status) {
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  if (hw < 1) hw = 1;
  const int n_threads = num_streams < hw ? num_streams : hw;
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) {
    threads.emplace_back([&, t]() {
      for (int sidx = t; sidx < num_streams; sidx += n_threads) {
        status[sidx] = rec_ac_encode(
            counts + counts_off[sidx], n_symbols[sidx], precision,
            messages + msg_off[sidx], msg_off[sidx + 1] - msg_off[sidx],
            out + out_byte_off[sidx], out_byte_off[sidx + 1] - out_byte_off[sidx],
            &out_bits[sidx]);
      }
    });
  }
  for (auto& th : threads) th.join();
  for (int sidx = 0; sidx < num_streams; ++sidx)
    if (status[sidx] != 0) return status[sidx];
  return 0;
}

}  // extern "C"
