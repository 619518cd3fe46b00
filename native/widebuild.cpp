// Native passes for the wide (whole-genome) anchor-table build.
//
// build_anchor_index_wide (svdss_tpu/ops/anchor_wide.py) is chunked
// numpy; at GRCh38 scale (3.1G forward symbols) its base-4 keys pass
// alone is ~25 minutes and the poslist argsort several more. These
// three single-pass C++ equivalents run at memory speed and replace
// the argsort with a counting-sort scatter (offsets are precomputed
// from the counts, so the grouped order — by key, position ascending —
// is identical to the stable argsort of position-ascending entries).
//
// Semantics are bit-identical to the numpy passes they replace:
//   keys[p]   = sum_i ((text[p-i]-1)&3) << 2i  for i < k  (junk digits
//               where text is non-ACGT, exactly like the numpy
//               (text-1)&3 arithmetic; positions p < k-1 hold the
//               partial window, also like numpy's zero-extension)
//   cleanc[p] = ACGT run length ending at p, saturated at 255
//
// Role equivalent of the reference's index-construction parallelism
// (ropebwt3 build path, SURVEY.md section 2b); loaded via ctypes from
// svdss_tpu/io/native.py.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

// comparator symbol: (c-1)&3 — ACGT -> 0..3, deterministic junk for
// non-ACGT (matches the numpy _bucket_order mapping; device probes
// touching non-ACGT spans fall back, so only determinism matters there)
inline int wsym(const uint8_t *text, int64_t p) {
    return (int)((uint8_t)(text[p] - 1) & 3);
}

// lexicographic on the suffix starting at a+k / b+k; past-end compares
// smaller (suffix-array sentinel convention). Distinct positions never
// compare equal (their runs-to-boundary differ in length or content).
struct LessRight {
    const uint8_t *text;
    int64_t n;
    int k;
    bool operator()(uint32_t a, uint32_t b) const {
        int64_t pa = (int64_t)a + k, pb = (int64_t)b + k;
        for (;;) {
            if (pa >= n) return true;
            if (pb >= n) return false;
            const int sa = wsym(text, pa), sb = wsym(text, pb);
            if (sa != sb) return sa < sb;
            ++pa; ++pb;
        }
    }
};

// lexicographic on the reversed prefix before a / b (symbols at p-1,
// p-2, ...); before-start compares smaller.
struct LessLeft {
    const uint8_t *text;
    const uint32_t *pos;
    bool operator()(uint8_t ia, uint8_t ib) const {
        int64_t pa = (int64_t)pos[ia] - 1, pb = (int64_t)pos[ib] - 1;
        for (;;) {
            if (pa < 0) return true;
            if (pb < 0) return false;
            const int sa = wsym(text, pa), sb = wsym(text, pb);
            if (sa != sb) return sa < sb;
            --pa; --pb;
        }
    }
};

struct LessLeft16 {
    const uint8_t *text;
    const uint32_t *pos;
    bool operator()(uint16_t ia, uint16_t ib) const {
        int64_t pa = (int64_t)pos[ia] - 1, pb = (int64_t)pos[ib] - 1;
        for (;;) {
            if (pa < 0) return true;
            if (pb < 0) return false;
            const int sa = wsym(text, pa), sb = wsym(text, pb);
            if (sa != sb) return sa < sb;
            --pa; --pb;
        }
    }
};

// RAW-byte comparators for the host-only heavy store: the resolver's
// binary search must agree with the oracle's N-matching semantics
// (raw equality is the match predicate), so heavy buckets sort on the
// raw nt6 byte values, not the 2-bit classes.
struct LessRightRaw {
    const uint8_t *text;
    int64_t n;
    int k;
    bool operator()(uint32_t a, uint32_t b) const {
        int64_t pa = (int64_t)a + k, pb = (int64_t)b + k;
        for (;;) {
            if (pa >= n) return true;
            if (pb >= n) return false;
            if (text[pa] != text[pb]) return text[pa] < text[pb];
            ++pa; ++pb;
        }
    }
};

struct LessLeftRaw {
    const uint8_t *text;
    const uint32_t *pos;
    bool operator()(uint32_t ia, uint32_t ib) const {
        int64_t pa = (int64_t)pos[ia] - 1, pb = (int64_t)pos[ib] - 1;
        for (;;) {
            if (pa < 0) return true;
            if (pb < 0) return false;
            if (text[pa] != text[pb]) return text[pa] < text[pb];
            --pa; --pb;
        }
    }
};

}  // namespace

extern "C" {

// keys + clean-run lengths in one pass. keys/cleanc are caller-owned
// arrays of length n.
void svdss_wide_keys(const uint8_t *text, int64_t n, int k,
                     int32_t *keys, uint8_t *cleanc) {
    const int32_t mask = (int32_t)((1u << (2 * k)) - 1);
    int32_t key = 0;
    uint32_t run = 0;
    for (int64_t p = 0; p < n; ++p) {
        const uint8_t c = text[p];
        key = ((key << 2) | ((int32_t)((c - 1) & 0xff) & 3)) & mask;
        keys[p] = key;
        if (c >= 1 && c <= 4) {
            if (run < 255) ++run;
        } else {
            run = 0;
        }
        cleanc[p] = (uint8_t)run;
    }
}

// cnts[key] += 1 for every clean k-window (cleanc[p] >= k). cnts is a
// caller-zeroed int64 array of length 4^k.
void svdss_wide_count(const int32_t *keys, const uint8_t *cleanc,
                      int64_t n, int k, int64_t *cnts) {
    for (int64_t p = 0; p < n; ++p) {
        if (cleanc[p] >= k) ++cnts[keys[p]];
    }
}

// Grouped poslist fill (counting sort by key, position ascending inside
// each group) + inline singleton writes into aux. cursor holds each
// kept key's running write offset (caller passes a copy of the segment
// starts; mutated in place). Returns the number of entries written.
int64_t svdss_wide_scatter(const int32_t *keys, const uint8_t *cleanc,
                           int64_t n, int k, const uint8_t *keep,
                           int64_t *cursor, uint32_t *poslist,
                           const uint8_t *single, uint32_t *aux) {
    int64_t written = 0;
    for (int64_t p = 0; p < n; ++p) {
        if (cleanc[p] < k) continue;
        const int32_t key = keys[p];
        const uint32_t start = (uint32_t)(p - (k - 1));
        if (keep[key]) {
            poslist[cursor[key]++] = start;
            ++written;
        } else if (single[key]) {
            aux[key] = start;
        }
    }
    return written;
}

// Suffix-order the kept buckets: sort each kept key's poslist slice by
// the text FOLLOWING the occurrence (right order, in place) and write
// leftidx[off+m] = bucket-local index of the m-th entry ordered by the
// text BEFORE the occurrence. The binary-probe device engine's table
// format (ops/anchor_wide_jax.py); keys are walked in blocks by a
// thread pool (buckets are independent).
void svdss_wide_sort(const uint8_t *text, int64_t n, int k,
                     const uint32_t *aux, const uint8_t *cnts,
                     const uint8_t *keep, uint32_t *poslist,
                     uint8_t *leftidx, int threads) {
    const int64_t nk = (int64_t)1 << (2 * k);
    const int64_t block = 1 << 14;
    std::atomic<int64_t> next(0);
    auto worker = [&]() {
        std::vector<uint8_t> idx;
        for (;;) {
            const int64_t lo = next.fetch_add(block);
            if (lo >= nk) return;
            const int64_t hi = lo + block < nk ? lo + block : nk;
            for (int64_t key = lo; key < hi; ++key) {
                if (!keep[key]) continue;
                const int c = cnts[key];
                if (c < 2) continue;
                uint32_t *bucket = poslist + aux[key];
                std::sort(bucket, bucket + c, LessRight{text, n, k});
                idx.resize(c);
                for (int i = 0; i < c; ++i) idx[i] = (uint8_t)i;
                std::sort(idx.begin(), idx.end(), LessLeft{text, bucket});
                uint8_t *lout = leftidx + aux[key];
                for (int i = 0; i < c; ++i) lout[i] = idx[i];
            }
        }
    };
    const int nt = threads < 1 ? 1 : threads;
    std::vector<std::thread> pool;
    for (int t = 0; t < nt - 1; ++t) pool.emplace_back(worker);
    worker();
    for (auto &t : pool) t.join();
}

// Right-order-only variant of svdss_wide_sort: sorts each kept bucket
// by the following suffix but emits NO left-order permutation. The
// GRCh38-fit table format (ARCHITECTURE.md): at 3.1G forward symbols
// the 1-byte leftidx alone is ~3.1 GB of HBM, pushing the full sorted
// format past one v5e chip; dropping it keeps orientation-A probes
// O(log cnt) while orientation B scans linearly. cnts are the raw
// int64 counts (callers need not narrow them first).
void svdss_wide_sort_right(const uint8_t *text, int64_t n, int k,
                           const uint32_t *aux, const int64_t *cnts,
                           const uint8_t *keep, uint32_t *poslist,
                           int threads) {
    const int64_t nk = (int64_t)1 << (2 * k);
    const int64_t block = 1 << 14;
    std::atomic<int64_t> next(0);
    auto worker = [&]() {
        for (;;) {
            const int64_t lo = next.fetch_add(block);
            if (lo >= nk) return;
            const int64_t hi = lo + block < nk ? lo + block : nk;
            for (int64_t key = lo; key < hi; ++key) {
                if (!keep[key]) continue;
                const int64_t c = cnts[key];
                if (c < 2) continue;
                uint32_t *bucket = poslist + aux[key];
                std::sort(bucket, bucket + c, LessRight{text, n, k});
            }
        }
    };
    const int nt = threads < 1 ? 1 : threads;
    std::vector<std::thread> pool;
    for (int t = 0; t < nt - 1; ++t) pool.emplace_back(worker);
    worker();
    for (auto &t : pool) t.join();
}

// uint16 variant of svdss_wide_sort for the deep-residency table
// format (cmax up to 65534: counts and the left-order inverse
// permutation are 16-bit). Same comparators, same order.
void svdss_wide_sort16(const uint8_t *text, int64_t n, int k,
                       const uint32_t *aux, const uint16_t *cnts,
                       const uint8_t *keep, uint32_t *poslist,
                       uint16_t *leftidx, int threads) {
    const int64_t nk = (int64_t)1 << (2 * k);
    const int64_t block = 1 << 14;
    std::atomic<int64_t> next(0);
    auto worker = [&]() {
        std::vector<uint16_t> idx;
        for (;;) {
            const int64_t lo = next.fetch_add(block);
            if (lo >= nk) return;
            const int64_t hi = lo + block < nk ? lo + block : nk;
            for (int64_t key = lo; key < hi; ++key) {
                if (!keep[key]) continue;
                const int c = cnts[key];
                if (c < 2) continue;
                uint32_t *bucket = poslist + aux[key];
                std::sort(bucket, bucket + c, LessRight{text, n, k});
                idx.resize(c);
                for (int i = 0; i < c; ++i) idx[i] = (uint16_t)i;
                std::sort(idx.begin(), idx.end(),
                          LessLeft16{text, bucket});
                uint16_t *lout = leftidx + aux[key];
                for (int i = 0; i < c; ++i) lout[i] = idx[i];
            }
        }
    };
    const int nt = threads < 1 ? 1 : threads;
    std::vector<std::thread> pool;
    for (int t = 0; t < nt - 1; ++t) pool.emplace_back(worker);
    worker();
    for (auto &t : pool) t.join();
}

// Sort the host-only heavy store: each pruned bucket's slice of
// heavy_poslist goes to right-suffix order (RAW nt6 byte comparator)
// and heavy_leftperm[off+m] gets the bucket-local index of the m-th
// entry in left order. Buckets run to millions of entries (satellite
// arrays) — a thread pool walks them by index.
void svdss_wide_sort_heavy(const uint8_t *text, int64_t n, int k,
                           const int64_t *heavy_keys,
                           const int64_t *heavy_offs, int64_t nh,
                           uint32_t *heavy_poslist,
                           uint32_t *heavy_leftperm, int threads) {
    (void)heavy_keys;
    std::atomic<int64_t> next(0);
    auto worker = [&]() {
        std::vector<uint32_t> idx;
        for (;;) {
            const int64_t h = next.fetch_add(1);
            if (h >= nh) return;
            const int64_t o0 = heavy_offs[h], o1 = heavy_offs[h + 1];
            const int64_t c = o1 - o0;
            if (c < 2) {
                if (c == 1) heavy_leftperm[o0] = 0;
                continue;
            }
            uint32_t *bucket = heavy_poslist + o0;
            std::sort(bucket, bucket + c, LessRightRaw{text, n, k});
            idx.resize(c);
            for (int64_t i = 0; i < c; ++i) idx[i] = (uint32_t)i;
            std::sort(idx.begin(), idx.end(), LessLeftRaw{text, bucket});
            uint32_t *lout = heavy_leftperm + o0;
            for (int64_t i = 0; i < c; ++i) lout[i] = idx[i];
        }
    };
    const int nt = threads < 1 ? 1 : threads;
    std::vector<std::thread> pool;
    for (int t = 0; t < nt - 1; ++t) pool.emplace_back(worker);
    worker();
    for (auto &t : pool) t.join();
}

}  // extern "C"
