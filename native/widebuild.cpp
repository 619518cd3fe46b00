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

#include <cstdint>

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

}  // extern "C"
