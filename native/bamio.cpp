// Parallel BGZF decompression + BAM record scanning.
//
// Native IO backend for svdss_tpu.io: the reference leans on htslib with an
// 8-thread BGZF pool for all BAM IO (bgzf_mt, ping_pong.cpp:249 etc.); this
// provides the equivalent host-side muscle for our own codec. Two passes:
// scan BGZF block headers (cheap: BSIZE in the BC extra field, ISIZE in the
// footer), then inflate blocks in parallel into one contiguous buffer.
// Record scanning returns fixed-width per-record fields + byte offsets so
// Python touches only the records it needs.
//
// C ABI (ctypes):
//   int  svdss_bgzf_read(path, &data, &size, n_threads)
//   void svdss_free(ptr)
//   int  svdss_bam_scan(data, size, &recs, &nrecs)  // recs: int64[nrecs*8]

#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Block {
  int64_t coff;   // compressed payload offset
  int32_t csize;  // compressed payload size
  int64_t uoff;   // uncompressed output offset
  int32_t usize;  // uncompressed size (ISIZE)
};

int inflate_block(const uint8_t *src, int32_t csize, uint8_t *dst,
                  int32_t usize) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, -15) != Z_OK) return 1;
  zs.next_in = const_cast<Bytef *>(src);
  zs.avail_in = csize;
  zs.next_out = dst;
  zs.avail_out = usize;
  int ret = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return (ret == Z_STREAM_END && (int32_t)zs.total_out == usize) ? 0 : 1;
}

}  // namespace

extern "C" {

void svdss_free(void *p) { std::free(p); }

int svdss_bgzf_read(const char *path, uint8_t **out_data, int64_t *out_size,
                    int n_threads) {
  FILE *fp = std::fopen(path, "rb");
  if (!fp) return 1;
  std::fseek(fp, 0, SEEK_END);
  int64_t fsize = std::ftell(fp);
  std::fseek(fp, 0, SEEK_SET);
  std::vector<uint8_t> raw(fsize);
  if ((int64_t)std::fread(raw.data(), 1, fsize, fp) != fsize) {
    std::fclose(fp);
    return 1;
  }
  std::fclose(fp);

  std::vector<Block> blocks;
  int64_t off = 0;
  int64_t total = 0;
  while (off + 28 <= fsize) {
    if (raw[off] != 0x1f || raw[off + 1] != 0x8b) return 2;
    uint16_t xlen;
    std::memcpy(&xlen, raw.data() + off + 10, 2);
    int64_t xoff = off + 12;
    int32_t bsize = -1;
    int64_t xend = xoff + xlen;
    while (xoff + 4 <= xend) {
      uint8_t si1 = raw[xoff], si2 = raw[xoff + 1];
      uint16_t slen;
      std::memcpy(&slen, raw.data() + xoff + 2, 2);
      if (si1 == 66 && si2 == 67 && slen == 2) {
        uint16_t bs;
        std::memcpy(&bs, raw.data() + xoff + 4, 2);
        bsize = (int32_t)bs + 1;
      }
      xoff += 4 + slen;
    }
    if (bsize < 0) return 2;
    int32_t csize = bsize - 12 - xlen - 8;
    uint32_t isize;
    std::memcpy(&isize, raw.data() + off + bsize - 4, 4);
    if (isize > 0)
      blocks.push_back({off + 12 + xlen, csize, total, (int32_t)isize});
    total += isize;
    off += bsize;
  }

  uint8_t *out = (uint8_t *)std::malloc(total ? total : 1);
  if (!out) return 3;
  std::atomic<size_t> next(0);
  std::atomic<int> err(0);
  int nt = n_threads < 1 ? 1 : n_threads;
  auto worker = [&]() {
    for (;;) {
      size_t i = next.fetch_add(1);
      if (i >= blocks.size()) break;
      const Block &b = blocks[i];
      if (inflate_block(raw.data() + b.coff, b.csize, out + b.uoff,
                        b.usize))
        err.store(1);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < nt - 1; ++t) threads.emplace_back(worker);
  worker();
  for (auto &t : threads) t.join();
  if (err.load()) {
    std::free(out);
    return 4;
  }
  *out_data = out;
  *out_size = total;
  return 0;
}

// Per record, 8 int64 fields:
//   [0] record byte offset (start of the 32B fixed header)
//   [1] block_size  [2] tid  [3] pos  [4] flag  [5] mapq  [6] l_seq
//   [7] n_cigar
int svdss_bam_scan(const uint8_t *data, int64_t size, int64_t **out_recs,
                   int64_t *out_n) {
  if (size < 12 || std::memcmp(data, "BAM\x01", 4) != 0) return 1;
  int32_t l_text;
  std::memcpy(&l_text, data + 4, 4);
  int64_t off = 8 + l_text;
  int32_t n_ref;
  std::memcpy(&n_ref, data + off, 4);
  off += 4;
  for (int32_t i = 0; i < n_ref; ++i) {
    int32_t l_name;
    std::memcpy(&l_name, data + off, 4);
    off += 4 + l_name + 4;
  }
  std::vector<int64_t> recs;
  recs.reserve(1 << 20);
  while (off + 4 <= size) {
    int32_t bs;
    std::memcpy(&bs, data + off, 4);
    if (bs <= 0 || off + 4 + bs > size) break;
    int64_t r = off + 4;
    int32_t tid, pos, l_seq;
    uint16_t ncig, flag;
    uint8_t mapq;
    std::memcpy(&tid, data + r, 4);
    std::memcpy(&pos, data + r + 4, 4);
    mapq = data[r + 9];
    std::memcpy(&ncig, data + r + 12, 2);
    std::memcpy(&flag, data + r + 14, 2);
    std::memcpy(&l_seq, data + r + 16, 4);
    recs.push_back(r);
    recs.push_back(bs);
    recs.push_back(tid);
    recs.push_back(pos);
    recs.push_back(flag);
    recs.push_back(mapq);
    recs.push_back(l_seq);
    recs.push_back(ncig);
    off += 4 + bs;
  }
  int64_t n = (int64_t)recs.size() / 8;
  int64_t *buf = (int64_t *)std::malloc(sizeof(int64_t) * recs.size() + 1);
  if (!buf) return 3;
  std::memcpy(buf, recs.data(), sizeof(int64_t) * recs.size());
  *out_recs = buf;
  *out_n = n;
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------
// Search-stage read extraction (pipeline/search.py::eligible_reads_bam
// in native form — the Python per-record parse fed the device at only
// a few hundred reads/s on whole-genome BAMs; the 1 Gbp end-to-end's
// search stage was input-bound on it). Eligibility matches
// ping_pong.cpp:66-79, 196-203: primary alignment (flag clear of
// 0x4|0x100|0x800), l_seq >= min_len, and (when putative) XF == 0.
// XF/HP integer aux tags are parsed here; hp defaults to 0.

namespace {
inline int64_t aux_int(const uint8_t *p, char type) {
  switch (type) {
    case 'c': return *(const int8_t *)p;
    case 'C': return *p;
    case 's': { int16_t v; std::memcpy(&v, p, 2); return v; }
    case 'S': { uint16_t v; std::memcpy(&v, p, 2); return v; }
    case 'i': { int32_t v; std::memcpy(&v, p, 4); return v; }
    case 'I': { uint32_t v; std::memcpy(&v, p, 4); return v; }
    default: return 0;
  }
}

inline int64_t aux_size(const uint8_t *p, const uint8_t *end,
                        char type) {
  switch (type) {
    case 'A': case 'c': case 'C': return 1;
    case 's': case 'S': return 2;
    case 'i': case 'I': case 'f': return 4;
    case 'Z': case 'H': {
      const uint8_t *q = p;
      while (q < end && *q) ++q;
      return (q - p) + 1;
    }
    case 'B': {
      if (p + 5 > end) return end - p;
      char sub = (char)p[0];
      uint32_t cnt;
      std::memcpy(&cnt, p + 1, 4);
      int64_t es = (sub == 'c' || sub == 'C') ? 1
                   : (sub == 's' || sub == 'S') ? 2 : 4;
      return 5 + (int64_t)cnt * es;
    }
    default: return end - p;   // unknown: stop the scan
  }
}
}  // namespace

extern "C" {

// recs: the [n,8] table from svdss_bam_scan. elig/xf/hp caller-owned.
void svdss_search_scan(const uint8_t *data, const int64_t *recs,
                       int64_t n, int32_t min_len, int32_t putative,
                       uint8_t *elig, int32_t *xf, int32_t *hp) {
  for (int64_t i = 0; i < n; ++i) {
    const int64_t *rs = recs + i * 8;
    const int64_t r = rs[0], bs = rs[1];
    const int64_t flag = rs[4], l_seq = rs[6], ncig = rs[7];
    xf[i] = 0;
    hp[i] = 0;
    elig[i] = 0;
    if ((flag & (0x4 | 0x100 | 0x800)) || l_seq < min_len) continue;
    const int64_t lrn = data[r + 8];
    const uint8_t *p = data + r + 32 + lrn + 4 * ncig
                       + (l_seq + 1) / 2 + l_seq;
    const uint8_t *end = data + r + bs;
    while (p + 3 <= end) {
      const char t0 = (char)p[0], t1 = (char)p[1], ty = (char)p[2];
      const uint8_t *val = p + 3;
      const int64_t sz = aux_size(val, end, ty);
      if (val + sz > end) break;
      if (t0 == 'X' && t1 == 'F') xf[i] = (int32_t)aux_int(val, ty);
      else if (t0 == 'H' && t1 == 'P') hp[i] = (int32_t)aux_int(val, ty);
      p = val + sz;
    }
    if (putative && xf[i] != 0) continue;
    elig[i] = 1;
  }
}

// nt16 nibble -> nt6 (A=1 C=2 G=3 T=4, everything else 5 — matches
// NT16_STR x utils/seq.NT6_TABLE composition)
static const uint8_t kNib2Nt6[16] = {5, 1, 2, 5, 3, 5, 5, 5,
                                     4, 5, 5, 5, 5, 5, 5, 5};

// starts[i]: output offset for eligible record i (caller prefix-sums
// eligible l_seq); out_seq receives nt6 codes.
void svdss_search_extract(const uint8_t *data, const int64_t *recs,
                          int64_t n, const uint8_t *elig,
                          const int64_t *starts, uint8_t *out_seq) {
  for (int64_t i = 0; i < n; ++i) {
    if (!elig[i]) continue;
    const int64_t *rs = recs + i * 8;
    const int64_t r = rs[0], l_seq = rs[6], ncig = rs[7];
    const int64_t lrn = data[r + 8];
    const uint8_t *sq = data + r + 32 + lrn + 4 * ncig;
    uint8_t *out = out_seq + starts[i];
    for (int64_t j = 0; j < l_seq; ++j) {
      const uint8_t nib = (j & 1) ? (sq[j >> 1] & 0xF)
                                  : (sq[j >> 1] >> 4);
      out[j] = kNib2Nt6[nib];
    }
  }
}

}  // extern "C"
