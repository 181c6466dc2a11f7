// Native data feeder: synthetic query generation + Criteo raw-text parsing.
//
// TPU-native counterpart of the reference's native input path
// (upmem/src/load_generator.c: synthetic_populate/synthetic_inference build
// random tables and uniform random queries in C at native speed).  The hot
// JAX path never touches this — it exists to keep host-side batch
// production off the accelerator's critical path (SURVEY.md §7 hard part
// (d)): multi-threaded index generation and dataset parsing feed pinned
// numpy buffers consumed by the Python data layer via ctypes
// (pim_embedding_lookup_tpu/utils/native.py).
//
// Build: make -C native   ->  native/libpelfeeder.so
#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <cstdlib>
#include <functional>
#include <thread>
#include <vector>

namespace {

// splitmix64 —— tiny, fast, seedable PRNG (public-domain algorithm).
struct SplitMix64 {
  uint64_t s;
  explicit SplitMix64(uint64_t seed) : s(seed) {}
  inline uint64_t next() {
    uint64_t z = (s += 0x9E3779B97f4A7C15ull);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
    return z ^ (z >> 31);
  }
  inline double uniform() {  // [0, 1)
    return (next() >> 11) * 0x1.0p-53;
  }
};

void fill_uniform(int32_t* out, int64_t n, int64_t num_rows, uint64_t seed) {
  SplitMix64 rng(seed);
  for (int64_t i = 0; i < n; ++i)
    out[i] = static_cast<int32_t>(rng.next() % static_cast<uint64_t>(num_rows));
}

// Bounded zipf(alpha) over [0, num_rows) by inverse-CDF on the
// generalized-harmonic integral approximation (no per-sample loops).
void fill_zipf(int32_t* out, int64_t n, int64_t num_rows, double alpha,
               uint64_t seed) {
  SplitMix64 rng(seed);
  const double nmax = static_cast<double>(num_rows);
  if (alpha == 1.0) alpha = 1.0000001;
  const double one_minus_a = 1.0 - alpha;
  const double hmax = (std::pow(nmax + 1.0, one_minus_a) - 1.0) / one_minus_a;
  for (int64_t i = 0; i < n; ++i) {
    double u = rng.uniform();
    // invert H(x) = u * hmax  ->  x = ((u*hmax*(1-a)) + 1)^(1/(1-a)) - 1
    double x = std::pow(u * hmax * one_minus_a + 1.0, 1.0 / one_minus_a) - 1.0;
    int64_t v = static_cast<int64_t>(x);
    if (v >= num_rows) v = num_rows - 1;
    if (v < 0) v = 0;
    out[i] = static_cast<int32_t>(v);
  }
}

void parallel_for(int64_t n, int nthreads,
                  const std::function<void(int64_t, int64_t, int)>& fn) {
  if (nthreads <= 1 || n < (1 << 16)) {
    fn(0, n, 0);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (n + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back([=, &fn] { fn(lo, hi, t); });
  }
  for (auto& th : ts) th.join();
}

}  // namespace

extern "C" {

// Fill out[0..n) with uniform ids in [0, num_rows).  Threaded.
void pel_gen_uniform(int32_t* out, int64_t n, int64_t num_rows, uint64_t seed,
                     int nthreads) {
  parallel_for(n, nthreads, [&](int64_t lo, int64_t hi, int t) {
    fill_uniform(out + lo, hi - lo, num_rows, seed ^ (0x9E3779B9ull * (t + 1)));
  });
}

// Fill out[0..n) with zipf(alpha) ids in [0, num_rows).  Threaded.
void pel_gen_zipf(int32_t* out, int64_t n, int64_t num_rows, double alpha,
                  uint64_t seed, int nthreads) {
  parallel_for(n, nthreads, [&](int64_t lo, int64_t hi, int t) {
    fill_zipf(out + lo, hi - lo, num_rows, alpha,
              seed ^ (0x9E3779B9ull * (t + 1)));
  });
}

// Multi-table query: out is [num_tables, batch, pooling] row-major; table t
// draws from [0, rows[t]).  The shape contract of the dense DLRM query
// (EmbeddingCollection.lookup).
void pel_gen_query(int32_t* out, const int64_t* rows, int64_t num_tables,
                   int64_t batch, int64_t pooling, int dist_zipf, double alpha,
                   uint64_t seed, int nthreads) {
  const int64_t per_table = batch * pooling;
  for (int64_t t = 0; t < num_tables; ++t) {
    uint64_t s = seed + 0x51ED2701ull * (t + 1);
    if (dist_zipf)
      pel_gen_zipf(out + t * per_table, per_table, rows[t], alpha, s, nthreads);
    else
      pel_gen_uniform(out + t * per_table, per_table, rows[t], s, nthreads);
  }
}

// Parse Criteo raw train.txt: "label \t 13 ints \t 26 hex" per line.
// Writes labels[i], dense[i*13..], cat[i*26..] (hashed % hash_mod).
// Returns number of rows parsed (<= max_rows), or -1 on open failure.
int64_t pel_parse_criteo(const char* path, int64_t max_rows, int64_t hash_mod,
                         float* labels, int32_t* dense, int32_t* cat) {
  FILE* f = std::fopen(path, "r");
  if (!f) return -1;
  // generous line buffer: 13 ints + 26 hex fields
  std::vector<char> buf(1 << 16);
  int64_t row = 0;
  while (row < max_rows && std::fgets(buf.data(), buf.size(), f)) {
    char* p = buf.data();
    char* end;
    labels[row] = static_cast<float>(std::strtol(p, &end, 10));
    p = (*end == '\t') ? end + 1 : end;
    for (int j = 0; j < 13; ++j) {
      if (*p == '\t' || *p == '\n' || *p == '\0') {
        dense[row * 13 + j] = 0;
        if (*p == '\t') ++p;
        continue;
      }
      long v = std::strtol(p, &end, 10);
      dense[row * 13 + j] = static_cast<int32_t>(v < 0 ? 0 : v);
      p = (*end == '\t') ? end + 1 : end;
    }
    for (int j = 0; j < 26; ++j) {
      if (*p == '\t' || *p == '\n' || *p == '\0') {
        cat[row * 26 + j] = 0;
        if (*p == '\t') ++p;
        continue;
      }
      unsigned long v = std::strtoul(p, &end, 16);
      cat[row * 26 + j] =
          static_cast<int32_t>((v & 0xFFFFFFFFull) % static_cast<uint64_t>(hash_mod));
      p = (*end == '\t') ? end + 1 : end;
    }
    ++row;
  }
  std::fclose(f);
  return row;
}

// CSR wire packer: per-table concatenated bag values + per-bag lengths ->
// the data-sharded fixed-capacity wire buffers of
// EmbeddingCollection.lookup_csr(data_sharded=True) (the serving payload
// assembly the host runtime owns — ops/ragged.shard_csr's contract, at
// native speed, threaded over tables).
//
//   values        [sum of all lens] int32, concatenated table-major then
//                 bag-major (table t's bags are values[voff[t]..voff[t+1]))
//   voff          [T+1] int64 offsets into values per table
//   lens          [T*B] int32 bag lengths, row-major [T][B]
//   out_idx       [T * nd*cap] int32   (padded with pad_index)
//   out_off       [T * nd*(bd+1)] int32 (window-local offsets)
//
// B must be divisible by nd.  Returns 0, or -1 if any (table, shard)
// window's entries exceed cap (nothing partial is written for that window).
int pel_pack_csr(const int32_t* values, const int64_t* voff,
                 const int32_t* lens, int64_t t_cnt, int64_t b,
                 int64_t nd, int64_t cap, int32_t pad_index,
                 int32_t* out_idx, int32_t* out_off, int nthreads) {
  if (nd <= 0 || b % nd) return -1;
  const int64_t bd = b / nd;
  std::vector<int> rc(static_cast<size_t>(t_cnt), 0);
  parallel_for(t_cnt, nthreads, [&](int64_t lo, int64_t hi, int) {
    for (int64_t t = lo; t < hi; ++t) {
      const int32_t* lt = lens + t * b;
      const int32_t* vt = values + voff[t];
      int64_t vpos = 0;
      for (int64_t d = 0; d < nd; ++d) {
        int32_t* idx_w = out_idx + (t * nd + d) * cap;
        int32_t* off_w = out_off + t * nd * (bd + 1) + d * (bd + 1);
        int64_t fill = 0;
        off_w[0] = 0;
        for (int64_t j = 0; j < bd; ++j) {
          const int64_t n = lt[d * bd + j];
          if (fill + n > cap) { rc[t] = -1; break; }
          std::memcpy(idx_w + fill, vt + vpos, n * sizeof(int32_t));
          fill += n;
          vpos += n;
          off_w[j + 1] = static_cast<int32_t>(fill);
        }
        if (rc[t]) break;
        for (int64_t p = fill; p < cap; ++p) idx_w[p] = pad_index;
      }
    }
  });
  for (int64_t t = 0; t < t_cnt; ++t)
    if (rc[t]) return -1;
  return 0;
}

}  // extern "C"
