// Fused flat rank over a BWT byte array: per-block rows holding the six
// int64 occ checkpoints followed by the block's 128 symbols, so a random
// rank touches one contiguous row (sequential cache lines). Rows are
// hugepage-backed (see sais_impl.h). Shared by the grouped builder
// (bwtbuild.cpp) and the native host search (pingpong.cpp).

#pragma once

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include "sais_impl.h"

namespace svdss {

constexpr int kBlockLog = 7;                 // 128-symbol occ blocks
constexpr int64_t kBlock = 1ll << kBlockLog;
constexpr size_t kRow = 192;                 // 6*8 occ + 128 syms + 16 pad
constexpr size_t kOccBytes = 48;

struct RankIndex {
  hvector<uint8_t> rows;
  int64_t n = 0;
  int64_t acc[8] = {0};  // acc[c] = #symbols < c (c in 0..7)

  void build(const uint8_t *bwt, int64_t len, int threads) {
    n = len;
    int64_t nblk = (n >> kBlockLog) + 1;
    rows.assign((size_t)nblk * kRow, 0);
    int64_t chunk_blocks = (nblk + threads - 1) / threads;
    std::vector<std::thread> ts;
    for (int t = 0; t < threads; ++t) {
      ts.emplace_back([&, t] {
        int64_t b0 = t * chunk_blocks;
        int64_t b1 = std::min(nblk, b0 + chunk_blocks);
        for (int64_t blk = b0; blk < b1; ++blk) {
          int64_t s = blk << kBlockLog, e = std::min(n, s + kBlock);
          uint8_t *row = &rows[(size_t)blk * kRow];
          int64_t *occ = reinterpret_cast<int64_t *>(row);
          if (e > s) std::memcpy(row + kOccBytes, bwt + s, (size_t)(e - s));
          for (int64_t i = s; i < e; ++i) ++occ[bwt[i]];  // symbols 0..5
        }
      });
    }
    for (auto &th : ts) th.join();
    // exclusive prefix over blocks (occ rows currently hold block counts)
    int64_t run[6] = {0};
    for (int64_t blk = 0; blk < nblk; ++blk) {
      int64_t *occ = reinterpret_cast<int64_t *>(&rows[(size_t)blk * kRow]);
      for (int c = 0; c < 6; ++c) {
        int64_t v = occ[c];
        occ[c] = run[c];
        run[c] += v;
      }
    }
    int64_t s = 0;
    for (int c = 0; c < 8; ++c) {
      acc[c] = s;
      if (c < 6) s += run[c];
    }
  }

  inline int64_t rank(int c, int64_t pos) const {
    const uint8_t *row = &rows[(size_t)(pos >> kBlockLog) * kRow];
    int64_t r = reinterpret_cast<const int64_t *>(row)[c];
    const uint8_t *p = row + kOccBytes;
    int64_t e = pos & (kBlock - 1);
    for (int64_t i = 0; i < e; ++i) r += (p[i] == c);
    return r;
  }
};

}  // namespace svdss
