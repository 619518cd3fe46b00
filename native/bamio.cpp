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
