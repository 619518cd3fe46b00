// Whole-genome BWT construction: grouped SA-IS + FM-walk merge.
//
// Plays the role of ropebwt3's parallel incremental build (the reference's
// `SVDSS index` = ropebwt3 `build`, /root/reference/main.cpp:34-37,
// CMakeLists.txt:151-172) for texts far past what one in-RAM SA-IS pass
// can handle: a human two-strand genome is ~6.2G symbols, whose int64
// suffix array alone is ~50 GB and hours of single-threaded SA-IS.
//
// Input text layout (svdss_tpu.index.fmd.genome_text): a concatenation of
// strings, each ENDING with a 0 sentinel (chromosome strand = one string).
// Suffix-order semantics: comparisons stop at sentinels, with sentinels
// ordered by string index. The FMD ping-pong search is invariant to
// sentinel tie-breaking (patterns never contain the sentinel and interval
// boundaries depend only on real-symbol prefixes — see index/fmd.py), so
// this order and the content-crossing order produced by plain SA-IS yield
// interchangeable indexes.
//
// Algorithm:
//   1. Partition the strings into consecutive groups of <= group_max
//      symbols (default 3/8 * 2^31). Each group's BWT is built locally by
//      int32 SA-IS (4 bytes/sym SA instead of 8, ~2x faster); the next
//      group's SA-IS runs concurrently with the current group's merge.
//   2. Merge groups left to right. To insert group B into the accumulated
//      BWT A: for each string s of B (independently -> thread pool), walk
//      s backward computing r(p) = #A-suffixes < (B-suffix at p) via
//        r(sentinel) = count_0(A)          [all A sentinels sort first]
//        r(p)        = acc_A[c] + rank_A(c, r(p+1)),  c = s[p]
//      one rank per symbol. Ranks hit a FUSED layout — 192-byte rows
//      holding a block's 6 int64 occ checkpoints followed by its 128 BWT
//      bytes — so a random rank touches one contiguous row (sequential
//      cache lines) instead of two far-apart arrays. Then interleave A
//      and BWT_B by these insertion ranks (B-rank order is non-decreasing
//      in r) and rebuild the fused rows.
//
// Total work: one int32 SA-IS per group + exactly one rank query per
// symbol of groups 1.. (sum = n), all O(1) flat lookups.
//
// C ABI (ctypes):
//   int svdss_build_bwt(const uint8_t* text, int64_t n,
//                       const int64_t* str_ends, int64_t n_strings,
//                       int32_t n_threads, int64_t group_max,
//                       uint8_t* bwt_out);

#include <atomic>
#include <cstdint>
#include <cstring>
#include <future>
#include <thread>
#include <vector>

#include "rank.h"
#include "sais_impl.h"

namespace {

using i64 = int64_t;

struct GroupBuild {
  int rc = 0;
  svdss::hvector<uint8_t> bwt;
  svdss::hvector<int32_t> sa;
};

// Local BWT of one group via int32 SA-IS. Local wraparound: the row of
// position 0 gets the group's final sentinel, which equals the char
// globally preceding the group (both are string-terminating sentinels).
void group_bwt(const uint8_t *g, i64 m, GroupBuild &out) {
  if (m + 1 >= (1ll << 31)) { out.rc = 2; return; }
  int32_t n1 = (int32_t)(m + 1);
  svdss::hvector<uint8_t> s((size_t)n1);
  for (i64 i = 0; i < m; ++i) s[i] = g[i] + 1;
  s[m] = 0;  // unique terminator (text symbols are 1..6 after shift)
  svdss::hvector<int32_t> SA((size_t)n1);
  svdss::sais_rec<uint8_t, int32_t>(s.data(), SA.data(), n1, 8);
  out.sa.assign(SA.begin() + 1, SA.end());  // drop the terminator row
  out.bwt.resize((size_t)m);
  for (i64 i = 0; i < m; ++i) {
    int32_t p = out.sa[i];
    out.bwt[i] = g[p == 0 ? m - 1 : p - 1];
  }
}

}  // namespace

extern "C" int svdss_build_bwt(const uint8_t *text, i64 n,
                               const i64 *str_ends, i64 n_strings,
                               int32_t n_threads, i64 group_max,
                               uint8_t *bwt_out) {
  if (n <= 0 || n_strings <= 0) return 1;
  if (str_ends[n_strings - 1] != n) return 1;
  for (i64 s = 0; s < n_strings; ++s)
    if (str_ends[s] - (s ? str_ends[s - 1] : 0) <= 0 ||
        text[str_ends[s] - 1] != 0)
      return 1;  // strings must be non-empty and end with the 0 sentinel
  int threads = n_threads > 0 ? n_threads : 1;
  if (group_max <= 0) group_max = (1ll << 31) * 3 / 8;

  // partition strings into consecutive groups
  struct Group { i64 str0, str1, beg, end; };
  std::vector<Group> groups;
  {
    i64 s = 0;
    while (s < n_strings) {
      i64 beg = s == 0 ? 0 : str_ends[s - 1];
      i64 e = s;
      while (e < n_strings && (str_ends[e] - beg) <= group_max) ++e;
      if (e == s) ++e;  // a single oversized string gets its own group
      if (str_ends[e - 1] - beg >= (1ll << 31) - 1) return 2;
      groups.push_back({s, e, beg, str_ends[e - 1]});
      s = e;
    }
  }

  // accumulated BWT lives in bwt_out[0 : nA)
  i64 nA = 0;
  svdss::RankIndex rk;
  svdss::hvector<uint8_t> merged;
  auto launch = [&](size_t gi) {
    return std::async(std::launch::async, [&, gi] {
      GroupBuild gb;
      group_bwt(text + groups[gi].beg, groups[gi].end - groups[gi].beg, gb);
      return gb;
    });
  };
  std::future<GroupBuild> fut = launch(0);

  for (size_t gi = 0; gi < groups.size(); ++gi) {
    const Group &G = groups[gi];
    i64 nB = G.end - G.beg;
    GroupBuild gb = fut.get();
    if (gb.rc) return gb.rc;
    if (gi + 1 < groups.size()) fut = launch(gi + 1);
    if (gi == 0) {
      std::memcpy(bwt_out, gb.bwt.data(), (size_t)nB);
      nA = nB;
      if (groups.size() > 1) rk.build(bwt_out, nA, threads);
      continue;
    }

    // FM-walk each string of B through A (independent -> thread pool)
    svdss::hvector<i64> ins((size_t)nB);
    i64 sent_A = rk.acc[1];  // count of sentinel(0) symbols in A
    std::atomic<i64> next_str{G.str0};
    auto walk = [&] {
      for (;;) {
        i64 s = next_str.fetch_add(1);
        if (s >= G.str1) return;
        i64 st = (s == 0 ? 0 : str_ends[s - 1]) - G.beg;
        i64 en = str_ends[s] - G.beg;
        const uint8_t *B = text + G.beg;
        i64 r = sent_A;
        ins[en - 1] = r;
        for (i64 j = en - 2; j >= st; --j) {
          int c = B[j];
          r = rk.acc[c] + rk.rank(c, r);
          ins[j] = r;
        }
      }
    };
    {
      std::vector<std::thread> ts;
      int tw = (int)std::min<i64>(threads, G.str1 - G.str0);
      for (int t = 1; t < tw; ++t) ts.emplace_back(walk);
      walk();
      for (auto &th : ts) th.join();
    }

    // interleave: B-rank order k visits non-decreasing insertion ranks
    merged.resize((size_t)(nA + nB));
    i64 ai = 0, mi = 0;
    for (i64 k = 0; k < nB; ++k) {
      i64 r = ins[gb.sa[k]];
      if (r < ai || r > nA) return 3;  // merge invariant violated
      if (r > ai) {
        std::memcpy(&merged[mi], bwt_out + ai, (size_t)(r - ai));
        mi += r - ai;
        ai = r;
      }
      merged[mi++] = gb.bwt[k];
    }
    if (ai < nA) std::memcpy(&merged[mi], bwt_out + ai, (size_t)(nA - ai));
    nA += nB;
    std::memcpy(bwt_out, merged.data(), (size_t)nA);
    if (gi + 1 < groups.size()) rk.build(bwt_out, nA, threads);
  }
  return 0;
}
