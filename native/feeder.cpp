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

// Length-bucket packer: the native fast path of ops/ragged.py's
// pack_length_buckets (same semantics, threaded over tables).  The python
// packer's 7-19 ms/batch dominates the 1.3 ms device dispatch it feeds
// (docs/PERF.md, bucketed-CSR section); the reference likewise preps its
// wire on the host at native speed (emb_host.h:234-268 builds the padded
// buffers in C before the DPU call).
//
//   indices     [T, cap_c] int32 flat per-table ids (CSR values)
//   offsets     [T, B+1] int64
//   bucket_ls   [nk] ascending fixed pooling widths
//   caps        [nk] slots per bucket
//   idx_flat    [T * sum(caps[k]*ls[k])] int32, bucket-major blocks, each
//               block row-major [T, caps[k]*ls[k]]   (padded pad_index)
//   mask_flat   same layout, uint8 (1 = real entry)
//   pos_flat    [sum(caps[k])] int32 batch positions (sentinel = B)
//   tail_idx    [T * tail_entries] int32 (ignored when tail_bags == 0)
//   tail_off    [T * (tail_bags+1)] int32
//   tail_pos    [tail_bags] int32
//
// A batch element packs into the first bucket with L >= its max bag
// length across tables that has a free slot; full buckets spill onward;
// elements longer than bucket_ls[-1] (or spilled past every bucket) ride
// the tail CSR.  Returns 0, -1 on tail-bag overflow, -2 on tail-entry
// overflow, -3 on bad arguments.
int pel_pack_buckets(const int32_t* indices, const int64_t* offsets,
                     int64_t t_cnt, int64_t b, int64_t cap_c,
                     const int64_t* bucket_ls, int64_t nk,
                     const int64_t* caps, int64_t tail_bags,
                     int64_t tail_entries, int32_t pad_index,
                     int32_t* idx_flat, uint8_t* mask_flat, int32_t* pos_flat,
                     int32_t* tail_idx, int32_t* tail_off, int32_t* tail_pos,
                     int nthreads) {
  if (t_cnt <= 0 || b <= 0 || nk <= 0) return -3;
  for (int64_t k = 1; k < nk; ++k)
    if (bucket_ls[k] <= bucket_ls[k - 1]) return -3;

  // per-batch-element max bag length across tables (threaded over elements)
  std::vector<int64_t> blen(static_cast<size_t>(b), 0);
  parallel_for(b, nthreads, [&](int64_t lo, int64_t hi, int) {
    for (int64_t t = 0; t < t_cnt; ++t) {
      const int64_t* ot = offsets + t * (b + 1);
      for (int64_t j = lo; j < hi; ++j) {
        int64_t n = ot[j + 1] - ot[j];
        if (n > blen[j]) blen[j] = n;
      }
    }
  });

  // greedy assignment in arrival order == the staged spill of the python
  // packer (first caps[k] arrivals keep bucket k, the rest move onward)
  std::vector<int32_t> assign(static_cast<size_t>(b));  // -1 empty, nk tail
  std::vector<int32_t> slot(static_cast<size_t>(b), -1);
  std::vector<int64_t> used(static_cast<size_t>(nk), 0);
  int64_t n_tail = 0;
  for (int64_t j = 0; j < b; ++j) {
    if (blen[j] == 0) { assign[j] = -1; continue; }
    int64_t k = 0;
    while (k < nk && (bucket_ls[k] < blen[j] || used[k] >= caps[k])) ++k;
    if (k < nk) {
      assign[j] = static_cast<int32_t>(k);
      slot[j] = static_cast<int32_t>(used[k]++);
    } else {
      assign[j] = static_cast<int32_t>(nk);
      slot[j] = static_cast<int32_t>(n_tail++);
    }
  }
  if (n_tail > tail_bags) return -1;

  // block base offsets (per bucket) into idx_flat/mask_flat/pos_flat
  std::vector<int64_t> ibase(static_cast<size_t>(nk) + 1, 0);
  std::vector<int64_t> pbase(static_cast<size_t>(nk) + 1, 0);
  for (int64_t k = 0; k < nk; ++k) {
    ibase[k + 1] = ibase[k] + t_cnt * caps[k] * bucket_ls[k];
    pbase[k + 1] = pbase[k] + caps[k];
  }

  // positions (serial: tiny)
  for (int64_t k = 0; k < nk; ++k)
    for (int64_t s = 0; s < caps[k]; ++s)
      pos_flat[pbase[k] + s] = static_cast<int32_t>(b);
  for (int64_t s = 0; s < tail_bags; ++s)
    tail_pos[s] = static_cast<int32_t>(b);
  for (int64_t j = 0; j < b; ++j) {
    if (assign[j] < 0) continue;
    if (assign[j] == nk)
      tail_pos[slot[j]] = static_cast<int32_t>(j);
    else
      pos_flat[pbase[assign[j]] + slot[j]] = static_cast<int32_t>(j);
  }

  // per-table fill, threaded over tables
  std::vector<int> rc(static_cast<size_t>(t_cnt), 0);
  parallel_for(t_cnt, nthreads, [&](int64_t lo, int64_t hi, int) {
    for (int64_t t = lo; t < hi; ++t) {
      const int64_t* ot = offsets + t * (b + 1);
      const int32_t* it = indices + t * cap_c;
      for (int64_t k = 0; k < nk; ++k) {
        const int64_t w = caps[k] * bucket_ls[k];
        int32_t* iw = idx_flat + ibase[k] + t * w;
        uint8_t* mw = mask_flat + ibase[k] + t * w;
        std::fill(iw, iw + w, pad_index);
        std::memset(mw, 0, static_cast<size_t>(w));
      }
      int32_t* tw = tail_bags ? tail_idx + t * tail_entries : nullptr;
      int32_t* tow = tail_bags ? tail_off + t * (tail_bags + 1) : nullptr;
      if (tw) std::fill(tw, tw + tail_entries, pad_index);
      if (tow) tow[0] = 0;
      int64_t toff = 0;
      for (int64_t j = 0; j < b; ++j) {
        const int32_t a = assign[j];
        if (a < 0) continue;
        const int64_t n = ot[j + 1] - ot[j];
        if (a == static_cast<int32_t>(nk)) {
          if (toff + n > tail_entries) { rc[t] = -2; break; }
          std::memcpy(tw + toff, it + ot[j], n * sizeof(int32_t));
          toff += n;
          tow[slot[j] + 1] = static_cast<int32_t>(toff);
        } else {
          int32_t* iw = idx_flat + ibase[a] +
                        t * caps[a] * bucket_ls[a] + slot[j] * bucket_ls[a];
          uint8_t* mw = mask_flat + ibase[a] +
                        t * caps[a] * bucket_ls[a] + slot[j] * bucket_ls[a];
          std::memcpy(iw, it + ot[j], n * sizeof(int32_t));
          std::memset(mw, 1, static_cast<size_t>(n));
        }
      }
      if (tow)
        for (int64_t s = n_tail; s < tail_bags; ++s)
          tow[s + 1] = static_cast<int32_t>(toff);
    }
  });
  for (int64_t t = 0; t < t_cnt; ++t)
    if (rc[t]) return rc[t];
  return 0;
}

}  // extern "C"
