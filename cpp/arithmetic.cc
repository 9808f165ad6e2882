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

// ---------------------------------------------------------------------------
// Class-segmented arithmetic coding: ONE interval/stream, per-symbol
// histogram selected by a class id the DECODER can recompute (the residual
// codec's activity classes, rec_tpu/io/residual.py — both sides hold the
// decoded reconstruction, so the class map costs zero side information).
// Compared with one stream per class this removes K-1 stream terminations
// and the per-class length table, and needs no EOF at all: the message
// length is known to the decoder (= pixel count), so symbols are coded
// bare with exactly one final flush.
// ---------------------------------------------------------------------------

// Encode message[k] (in [0, n_symbols)) against histogram classes[k]
// (counts laid out as n_classes consecutive n_symbols-length histograms).
int rec_ac_encode_classes(const std::int64_t* counts, int n_classes,
                          int n_symbols, int precision,
                          const std::int32_t* message,
                          const std::int32_t* classes, std::int64_t msg_len,
                          std::uint8_t* out, std::int64_t out_capacity_bytes,
                          std::int64_t* out_bits) {
  if (precision < 2 || precision > 60) return -1;
  std::vector<std::vector<u64>> cdfs(n_classes);
  std::vector<u64> totals(n_classes);
  for (int c = 0; c < n_classes; ++c) {
    cdfs[c] = make_cdf(counts + static_cast<std::int64_t>(c) * n_symbols,
                       n_symbols);
    totals[c] = cdfs[c][n_symbols];
    if (totals[c] == 0 ||
        totals[c] >= (1ull << 62) / (1ull << precision))
      return -2;
  }

  const u64 whole = 1ull << precision;
  const u64 half = whole >> 1;
  const u64 quarter = whole >> 2;

  std::memset(out, 0, static_cast<size_t>(out_capacity_bytes));
  BitWriter w{out, out_capacity_bytes * 8};

  u64 low = 0, high = whole;
  std::int64_t s = 0;

  for (std::int64_t k = 0; k < msg_len; ++k) {
    const std::int32_t sym = message[k];
    const std::int32_t cls = classes[k];
    if (cls < 0 || cls >= n_classes) return -3;
    const std::vector<u64>& cdf = cdfs[cls];
    const u64 R = totals[cls];
    if (sym < 0 || sym >= n_symbols || cdf[sym + 1] == cdf[sym]) return -3;
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

// Decode exactly msg_len symbols, position k against histogram classes[k].
int rec_ac_decode_classes(const std::int64_t* counts, int n_classes,
                          int n_symbols, int precision,
                          const std::uint8_t* bits, std::int64_t nbits,
                          const std::int32_t* classes, std::int64_t msg_len,
                          std::int32_t* out_msg) {
  if (precision < 2 || precision > 60) return -1;
  std::vector<std::vector<u64>> cdfs(n_classes);
  std::vector<u64> totals(n_classes);
  for (int c = 0; c < n_classes; ++c) {
    cdfs[c] = make_cdf(counts + static_cast<std::int64_t>(c) * n_symbols,
                       n_symbols);
    totals[c] = cdfs[c][n_symbols];
    if (totals[c] == 0) return -2;
  }

  const u64 whole = 1ull << precision;
  const u64 half = whole >> 1;
  const u64 quarter = whole >> 2;

  BitReader r{bits, nbits};
  u64 low = 0, high = whole, z = 0;
  std::int64_t i = 0;
  for (; i < precision; ++i) z = (z << 1) | static_cast<u64>(r.get(i));

  for (std::int64_t m = 0; m < msg_len; ++m) {
    const std::int32_t cls = classes[m];
    if (cls < 0 || cls >= n_classes) return -3;
    const std::vector<u64>& cdf = cdfs[cls];
    const u64 R = totals[cls];
    const u64 width = high - low;
    const u64 zoff = z - low;
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
    out_msg[m] = j;
    low = low_;
    high = high_;

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
  return 0;
}

// ---------------------------------------------------------------------------
// rANS (range asymmetric numeral systems) — the entropy coder the reference
// declares as a TODO and never ships (ref rec/io/entropy_coding.pyx:304-306).
// Byte-wise renormalizing rANS with a 32-bit state: decode is a tight
// divide-free loop (one multiply + binary search per symbol vs the
// arithmetic coder's interval arithmetic), encode runs the message in
// reverse (LIFO).  Same modelling interface as the arithmetic coder: a
// count histogram, EOF = symbol 0.
// ---------------------------------------------------------------------------

namespace {

constexpr std::uint32_t kRansL = 1u << 23;  // state lower bound

// Normalize counts to frequencies summing to exactly 1 << prob_bits, every
// present symbol keeping freq >= 1.  Deterministic (mirrored bit-for-bit by
// the Python twin in rec_tpu/io/rans.py — the table is part of the format).
static int normalize_freqs(const std::int64_t* counts, int n_symbols,
                           int prob_bits, std::vector<std::uint32_t>& freqs) {
  const std::uint32_t scale = 1u << prob_bits;
  u64 total = 0;
  int present = 0;
  for (int i = 0; i < n_symbols; ++i) {
    if (counts[i] < 0) return -3;
    total += static_cast<u64>(counts[i]);
    if (counts[i] > 0) present++;
  }
  if (total == 0 || present > static_cast<int>(scale)) return -2;
  freqs.assign(n_symbols, 0);
  u64 cur = 0;
  for (int i = 0; i < n_symbols; ++i) {
    if (counts[i] > 0) {
      u64 f = (static_cast<u128>(counts[i]) * scale) / total;
      if (f < 1) f = 1;
      freqs[i] = static_cast<std::uint32_t>(f);
      cur += f;
    }
  }
  while (cur != scale) {
    int j = 0;
    for (int i = 1; i < n_symbols; ++i)
      if (freqs[i] > freqs[j]) j = i;
    if (cur > scale) {
      u64 d = cur - scale;
      if (d > freqs[j] - 1) d = freqs[j] - 1;
      if (d == 0) return -2;  // cannot shrink further (n_symbols ~ scale)
      freqs[j] -= static_cast<std::uint32_t>(d);
      cur -= d;
    } else {
      freqs[j] += static_cast<std::uint32_t>(scale - cur);
      cur = scale;
    }
  }
  return 0;
}

}  // namespace

// Encode `message` (symbols in [0, n_symbols), counts[sym] > 0) with rANS.
// Writes bytes into out, sets *out_bytes.  Returns 0 on success.
int rec_rans_encode(const std::int64_t* counts, int n_symbols, int prob_bits,
                    const std::int32_t* message, std::int64_t msg_len,
                    std::uint8_t* out, std::int64_t out_capacity_bytes,
                    std::int64_t* out_bytes) {
  if (prob_bits < 2 || prob_bits > 16) return -1;
  std::vector<std::uint32_t> freqs;
  int rc = normalize_freqs(counts, n_symbols, prob_bits, freqs);
  if (rc != 0) return rc;
  std::vector<std::uint32_t> start(n_symbols + 1, 0);
  for (int i = 0; i < n_symbols; ++i) start[i + 1] = start[i] + freqs[i];

  std::vector<std::uint8_t> rev;
  rev.reserve(static_cast<size_t>(msg_len) + 16);
  std::uint32_t x = kRansL;
  for (std::int64_t k = msg_len - 1; k >= 0; --k) {  // LIFO
    const std::int32_t sym = message[k];
    if (sym < 0 || sym >= n_symbols || freqs[sym] == 0) return -3;
    const std::uint32_t f = freqs[sym];
    const std::uint32_t x_max = ((kRansL >> prob_bits) << 8) * f;
    while (x >= x_max) {
      rev.push_back(static_cast<std::uint8_t>(x & 0xFFu));
      x >>= 8;
    }
    x = ((x / f) << prob_bits) + (x % f) + start[sym];
  }
  const std::int64_t total = 4 + static_cast<std::int64_t>(rev.size());
  if (total > out_capacity_bytes) return -4;
  // Final state little-endian first, then the emitted bytes in decode order.
  out[0] = static_cast<std::uint8_t>(x & 0xFF);
  out[1] = static_cast<std::uint8_t>((x >> 8) & 0xFF);
  out[2] = static_cast<std::uint8_t>((x >> 16) & 0xFF);
  out[3] = static_cast<std::uint8_t>((x >> 24) & 0xFF);
  for (size_t i = 0; i < rev.size(); ++i) out[4 + i] = rev[rev.size() - 1 - i];
  *out_bytes = total;
  return 0;
}

// Decode until the EOF symbol 0 (inclusive).  Returns 0 on success, -5 if
// out capacity exhausted, -6 on a corrupt stream.
int rec_rans_decode(const std::int64_t* counts, int n_symbols, int prob_bits,
                    const std::uint8_t* data, std::int64_t n_bytes,
                    std::int32_t* out_msg, std::int64_t out_capacity,
                    std::int64_t* out_len) {
  if (prob_bits < 2 || prob_bits > 16) return -1;
  if (n_bytes < 4) return -6;
  std::vector<std::uint32_t> freqs;
  int rc = normalize_freqs(counts, n_symbols, prob_bits, freqs);
  if (rc != 0) return rc;
  std::vector<std::uint32_t> start(n_symbols + 1, 0);
  for (int i = 0; i < n_symbols; ++i) start[i + 1] = start[i] + freqs[i];

  const std::uint32_t mask = (1u << prob_bits) - 1;
  std::uint32_t x = static_cast<std::uint32_t>(data[0]) |
                    (static_cast<std::uint32_t>(data[1]) << 8) |
                    (static_cast<std::uint32_t>(data[2]) << 16) |
                    (static_cast<std::uint32_t>(data[3]) << 24);
  std::int64_t i = 4, m = 0;
  for (;;) {
    const std::uint32_t slot = x & mask;
    // Largest j with start[j] <= slot (start partitions [0, scale)).
    int lo = 0, hi = n_symbols - 1;
    while (lo < hi) {
      const int mid = (lo + hi + 1) >> 1;
      if (start[mid] <= slot)
        lo = mid;
      else
        hi = mid - 1;
    }
    const int j = lo;
    if (freqs[j] == 0) return -6;
    if (m >= out_capacity) return -5;
    out_msg[m++] = j;
    x = freqs[j] * (x >> prob_bits) + slot - start[j];
    while (x < kRansL) {
      if (i >= n_bytes) return -6;
      x = (x << 8) | static_cast<std::uint32_t>(data[i++]);
    }
    if (j == 0) {  // EOF
      *out_len = m;
      return 0;
    }
  }
}

// Parallel multi-stream rANS encode (same layout as rec_ac_encode_many;
// offsets in BYTES).
int rec_rans_encode_many(const std::int64_t* counts, const std::int64_t* counts_off,
                         const std::int32_t* n_symbols, int prob_bits,
                         const std::int32_t* messages, const std::int64_t* msg_off,
                         int num_streams, std::uint8_t* out,
                         const std::int64_t* out_byte_off, std::int64_t* out_bytes,
                         std::int32_t* status) {
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  if (hw < 1) hw = 1;
  const int n_threads = num_streams < hw ? num_streams : hw;
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) {
    threads.emplace_back([&, t]() {
      for (int sidx = t; sidx < num_streams; sidx += n_threads) {
        status[sidx] = rec_rans_encode(
            counts + counts_off[sidx], n_symbols[sidx], prob_bits,
            messages + msg_off[sidx], msg_off[sidx + 1] - msg_off[sidx],
            out + out_byte_off[sidx], out_byte_off[sidx + 1] - out_byte_off[sidx],
            &out_bytes[sidx]);
      }
    });
  }
  for (auto& th : threads) th.join();
  for (int sidx = 0; sidx < num_streams; ++sidx)
    if (status[sidx] != 0) return status[sidx];
  return 0;
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
