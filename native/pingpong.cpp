// Native host-path ping-pong SFS search over the flat FMD layout.
//
// The role of the reference's per-thread serial search (ping_pong_search,
// /root/reference/ping_pong.cpp:4-49 — one rb3_fmd_extend per base against
// an RLE rope): here each extension is one O(1) rank against the fused
// occ+BWT rows (rank.h), and reads fan out across a thread pool (the
// reference's `omp parallel for` over batch slots, ping_pong.cpp:329).
//
// Used two ways:
//   * production fallback for device lanes that overflow their emission
//     buffers (pipeline/search.py), replacing a ~100x slower pure-Python
//     walk;
//   * the measured CPU baseline for bench.py's vs_baseline — an honest
//     stand-in for 16-thread C++ SVDSS, since flat-array rank is at least
//     as fast as ropebwt3's run-length rope rank.
//
// Per-phase state is the rank-side coordinate + size only, exactly like
// the device kernel (ops/fmd_jax.py extend_rank_step): over a two-strand
// text a forward extension of W by c equals a backward extension of
// revcomp(W) by comp(c), so both phases run one-directional with
//   pos' = acc[c] + rank(c, pos);  sz' = rank(c, pos + sz) - rank(c, pos)
// and phase transitions reseed from a single symbol.
//
// C ABI (ctypes):
//   void* svdss_fmd_create(const uint8_t* bwt, int64_t n, int threads);
//   void  svdss_fmd_destroy(void* fmd);
//   int   svdss_ping_pong_batch(void* fmd,
//             const uint8_t* reads, const int64_t* offsets, int64_t n_reads,
//             int overlap, int threads, int32_t cap,
//             int32_t* out_qs, int32_t* out_len, int32_t* out_n);
//
// reads: concatenated nt6 read symbols; read i occupies
// [offsets[i], offsets[i+1]). out_qs/out_len are [n_reads, cap];
// out_n[i] < 0 flags overflow (more than cap SFSs).

#include <atomic>
#include <cstdint>
#include <thread>
#include <vector>

#include "rank.h"

namespace {

using i64 = int64_t;

struct Interval {
  i64 pos, sz;
};

inline Interval seed(const svdss::RankIndex &rk, int c) {
  return {rk.acc[c], rk.acc[c + 1] - rk.acc[c]};
}

inline Interval extend(const svdss::RankIndex &rk, Interval ik, int c) {
  i64 lo = rk.rank(c, ik.pos);
  i64 hi = rk.rank(c, ik.pos + ik.sz);
  return {rk.acc[c] + lo, hi - lo};
}

inline int comp6(int c) { return (c >= 1 && c <= 4) ? 5 - c : c; }

// Exact ping_pong.cpp:4-49 semantics (see ops/pingpong_host.py for the
// annotated Python oracle). P[l] must be 0 (NUL sentinel terminates the
// forward phase, ping_pong.cpp:36).
int search_read(const svdss::RankIndex &rk, const uint8_t *P, i64 l,
                int overlap, int32_t cap, int32_t *qs, int32_t *ln) {
  int nsfs = 0;
  i64 begin = l - 1;
  while (begin >= 0) {
    // backward phase
    Interval ik = seed(rk, P[begin]);
    while (ik.sz != 0 && begin > 0) {
      --begin;
      ik = extend(rk, ik, P[begin]);
    }
    if (begin == 0 && ik.sz != 0) break;  // whole prefix matches
    // forward phase from the mismatch
    i64 end = begin;
    ik = seed(rk, comp6(P[end]));
    while (ik.sz != 0) {
      ++end;
      ik = extend(rk, ik, comp6(P[end]));  // P[l] == 0 stops (sz -> 0)
    }
    if (nsfs < cap) {
      qs[nsfs] = (int32_t)begin;
      ln[nsfs] = (int32_t)(end - begin + 1);
    }
    ++nsfs;
    if (begin == 0) break;
    begin = overlap == 0 ? begin - 1 : end + overlap;
  }
  return nsfs;
}

}  // namespace

extern "C" {

void *svdss_fmd_create(const uint8_t *bwt, i64 n, int threads) {
  auto *rk = new svdss::RankIndex();
  rk->build(bwt, n, threads > 0 ? threads : 1);
  return rk;
}

void svdss_fmd_destroy(void *fmd) {
  delete static_cast<svdss::RankIndex *>(fmd);
}

int svdss_ping_pong_batch(void *fmd, const uint8_t *reads,
                          const i64 *offsets, i64 n_reads, int overlap,
                          int threads, int32_t cap, int32_t *out_qs,
                          int32_t *out_len, int32_t *out_n) {
  const auto &rk = *static_cast<svdss::RankIndex *>(fmd);
  if (threads <= 0) threads = 1;
  std::atomic<i64> next{0};
  std::atomic<int> bad{0};
  auto worker = [&] {
    for (;;) {
      i64 i = next.fetch_add(1);
      if (i >= n_reads) return;
      const uint8_t *P = reads + offsets[i];
      i64 l = offsets[i + 1] - offsets[i] - 1;  // trailing 0 sentinel
      if (l < 0 || P[l] != 0) { bad.store(1); return; }
      int n = search_read(rk, P, l, overlap, cap,
                          out_qs + i * cap, out_len + i * cap);
      out_n[i] = n > cap ? -n : n;
    }
  };
  std::vector<std::thread> ts;
  for (int t = 1; t < threads; ++t) ts.emplace_back(worker);
  worker();
  for (auto &th : ts) th.join();
  return bad.load();
}

}  // extern "C"
