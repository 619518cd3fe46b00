// Native smoother hot path: CIGAR-rewrite of BAM records + parallel BGZF
// deflate.
//
// Role of the reference's threaded smoother (smooth_read + the
// triple-buffered OpenMP pipeline, smoother.cpp:84-232, 349-494). The
// Python implementation (pipeline/smooth.py) is the semantic oracle; this
// produces field-identical records (pinned by tests/test_smooth_native.py)
// at ~two orders of magnitude higher record rate, threaded over record
// ranges with input order preserved.
//
// C ABI (ctypes):
//   int svdss_smooth_ratios(data, size, recs, n_recs, ref_buf, ref_off,
//                           ref_len, n_tid, min_mapq, sample_n,
//                           out_ratios, out_n)
//   int svdss_smooth_run(data, size, recs, n_recs, ref_buf, ref_off,
//                        ref_len, n_tid, threshold, min_mapq, min_indel,
//                        threads, &out_buf, &out_size, stats[5])
//   int svdss_bgzf_write(path, data, size, level, threads)
//
// recs is the [n,8] int64 record table from svdss_bam_scan. ref_buf holds
// the uppercase chromosome sequences concatenated in tid order; ref_off[t]
// is -1 for tids absent from the loaded genome. stats: XF0..XF3 counts +
// dropped. The record stream in out_buf (block_size-prefixed records, no
// header) is BGZF-compressed by svdss_bgzf_write.

#include <zlib.h>

#include <atomic>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

using i64 = int64_t;

constexpr uint16_t FUNMAP = 4, FSECONDARY = 256, FSUPPLEMENTARY = 2048;
constexpr const char *NT16_STR = "=ACMGRSVTWYHKDBN";

// htslib seq_nt16_table semantics as used by the Python codec
// (utils/seq.py NT16_TABLE: unknown chars map to 15)
struct Nt16 {
  uint8_t t[256];
  Nt16() {
    std::memset(t, 15, sizeof(t));
    for (int i = 0; i < 16; ++i) {
      t[(uint8_t)NT16_STR[i]] = (uint8_t)i;
      t[(uint8_t)std::tolower(NT16_STR[i])] = (uint8_t)i;
    }
  }
};
const Nt16 NT16;

struct RecView {
  const uint8_t *p;  // start of the 32-byte fixed header
  i64 block_size;
  int32_t tid, pos, l_seq;
  uint16_t flag, n_cigar;
  uint8_t mapq;
};

inline RecView view(const uint8_t *data, const i64 *rec) {
  RecView v;
  v.p = data + rec[0];
  v.block_size = rec[1];
  v.tid = (int32_t)rec[2];
  v.pos = (int32_t)rec[3];
  v.flag = (uint16_t)rec[4];
  v.mapq = (uint8_t)rec[5];
  v.l_seq = (int32_t)rec[6];
  v.n_cigar = (uint16_t)rec[7];
  return v;
}

inline bool eligible(const RecView &v, const i64 *ref_off, int32_t n_tid,
                     int32_t min_mapq) {
  if (v.flag & (FUNMAP | FSECONDARY | FSUPPLEMENTARY)) return false;
  if (v.mapq < min_mapq || v.l_seq < 2 || v.tid < 0) return false;
  return v.tid < n_tid && ref_off[v.tid] >= 0;
}

// layout offsets within a record body
struct Body {
  uint8_t l_qname;
  const uint8_t *qname;     // l_qname bytes incl. NUL padding
  const uint32_t *cigar;    // n_cigar u32
  const uint8_t *seq;       // (l_seq+1)/2 packed nibbles
  const uint8_t *qual;      // l_seq bytes
  const uint8_t *aux;       // rest
  i64 aux_len;
  uint16_t bin;
  int32_t mtid, mpos, tlen;
};

inline Body body(const RecView &v) {
  Body b;
  b.l_qname = v.p[8];
  std::memcpy(&b.bin, v.p + 10, 2);
  std::memcpy(&b.mtid, v.p + 20, 4);
  std::memcpy(&b.mpos, v.p + 24, 4);
  std::memcpy(&b.tlen, v.p + 28, 4);
  const uint8_t *q = v.p + 32;
  b.qname = q;
  q += b.l_qname;
  b.cigar = (const uint32_t *)q;
  q += 4LL * v.n_cigar;
  b.seq = q;
  q += (v.l_seq + 1) / 2;
  b.qual = q;
  q += v.l_seq;
  b.aux = q;
  b.aux_len = v.p + v.block_size - q;
  return b;
}

inline uint8_t seq_nib(const uint8_t *seq, i64 i) {
  uint8_t byte = seq[i >> 1];
  return (i & 1) ? (byte & 0xF) : (byte >> 4);
}

// skip one aux tag starting at p (after nothing: p points at tag byte 0);
// returns bytes consumed or -1 on malformed/unknown
inline i64 aux_skip(const uint8_t *p, i64 avail) {
  if (avail < 3) return -1;
  char ty = (char)p[2];
  static const int8_t fixed[256] = {0};
  (void)fixed;
  i64 used = 3;
  switch (ty) {
    case 'c':
    case 'C':
    case 'A':
      return used + 1;
    case 's':
    case 'S':
      return used + 2;
    case 'i':
    case 'I':
    case 'f':
      return used + 4;
    case 'Z':
    case 'H': {
      i64 k = used;
      while (k < avail && p[k] != 0) ++k;
      return k < avail ? k + 1 : -1;
    }
    case 'B': {
      if (avail < used + 5) return -1;
      char sub = (char)p[used];
      uint32_t cnt;
      std::memcpy(&cnt, p + used + 1, 4);
      int sz = (sub == 'c' || sub == 'C') ? 1
               : (sub == 's' || sub == 'S') ? 2
               : (sub == 'i' || sub == 'I' || sub == 'f') ? 4 : -1;
      if (sz < 0) return -1;
      return used + 5 + (i64)cnt * sz;
    }
    default:
      return -1;
  }
}

// mismatch stats for the accuracy pass (_mismatch_stats, smoother.cpp walk
// at 314-336): M/=/X compare, I/S advance query, D advances ref, anything
// else stops the walk
void mismatch_stats(const RecView &v, const Body &b, const uint8_t *ref,
                    i64 ref_len, i64 *out_match, i64 *out_mis) {
  i64 nmatch = 0, nmis = 0;
  i64 ro = v.pos, qo = 0;
  for (int k = 0; k < v.n_cigar; ++k) {
    uint32_t c = b.cigar[k];
    i64 ln = c >> 4;
    int op = c & 0xF;
    if (op == 0 || op == 7 || op == 8) {  // M / = / X
      i64 lim = ln;
      if (ro + lim > ref_len) lim = ref_len > ro ? ref_len - ro : 0;
      if (qo + lim > v.l_seq) lim = v.l_seq > qo ? v.l_seq - qo : 0;
      for (i64 i = 0; i < lim; ++i) {
        char rc = (char)ref[ro + i];
        char qc = NT16_STR[seq_nib(b.seq, qo + i)];
        if (rc == qc)
          ++nmatch;
        else
          ++nmis;
      }
      nmis += ln - lim;  // out-of-range tails count as mismatch-free in
                         // Python only when slices clamp equally; in
                         // practice reads never overhang (asserted by the
                         // parity test); keep the count consistent anyway
      ro += ln;
      qo += ln;
    } else if (op == 1) {  // I
      qo += ln;
    } else if (op == 2) {  // D
      ro += ln;
    } else if (op == 4) {  // S
      qo += ln;
    } else {
      break;
    }
  }
  *out_match = nmatch;
  *out_mis = nmis;
}

struct Rewrite {
  std::vector<uint8_t> seq_ascii;  // new sequence, ASCII
  std::vector<uint8_t> qual;
  std::vector<uint32_t> cigar;
  int xf;  // 0..3
  i64 nmatch, nmis;
};

// smooth_read (pipeline/smooth.py:115-203; reference smoother.cpp:84-232)
void smooth_one(const RecView &v, const Body &b, const uint8_t *ref,
                i64 ref_len, double threshold, bool thr_inf,
                int32_t min_indel, Rewrite &rw) {
  rw.seq_ascii.clear();
  rw.qual.clear();
  rw.cigar.clear();
  rw.nmatch = 0;
  rw.nmis = 0;
  bool should_ignore = true;
  i64 ro = v.pos, qo = 0, m_diff = 0;
  for (int k = 0; k < v.n_cigar; ++k) {
    uint32_t c = b.cigar[k];
    i64 ln = c >> 4;
    int op = c & 0xF;
    if (op == 0 || op == 7 || op == 8) {  // M / = / X -> reference bases
      i64 rlim = ln;
      if (ro + rlim > ref_len) rlim = ref_len > ro ? ref_len - ro : 0;
      i64 qlim = ln;
      if (qo + qlim > v.l_seq) qlim = v.l_seq > qo ? v.l_seq - qo : 0;
      for (i64 i = 0; i < rlim; ++i) rw.seq_ascii.push_back(ref[ro + i]);
      for (i64 i = 0; i < qlim; ++i) rw.qual.push_back(b.qual[qo + i]);
      i64 lim = rlim < qlim ? rlim : qlim;
      for (i64 i = 0; i < lim; ++i) {
        char qc = NT16_STR[seq_nib(b.seq, qo + i)];
        if ((char)ref[ro + i] == qc)
          ++rw.nmatch;
        else
          ++rw.nmis;
      }
      rw.nmis += ln - lim;
      ro += ln;
      qo += ln;
      if (!rw.cigar.empty() && (rw.cigar.back() & 0xF) == 0)
        rw.cigar.back() += (uint32_t)((ln + m_diff) << 4);
      else
        rw.cigar.push_back((uint32_t)((ln + m_diff) << 4));
      m_diff = 0;
    } else if (op == 1) {  // I
      if (ln > min_indel) {
        should_ignore = false;
        i64 qlim = ln;
        if (qo + qlim > v.l_seq) qlim = v.l_seq > qo ? v.l_seq - qo : 0;
        for (i64 i = 0; i < qlim; ++i) {
          rw.seq_ascii.push_back((uint8_t)NT16_STR[seq_nib(b.seq, qo + i)]);
          rw.qual.push_back(b.qual[qo + i]);
        }
        rw.cigar.push_back((uint32_t)(ln << 4) | 1);
      }
      qo += ln;
    } else if (op == 2) {  // D
      if (ln <= min_indel) {
        i64 rlim = ln;
        if (ro + rlim > ref_len) rlim = ref_len > ro ? ref_len - ro : 0;
        for (i64 i = 0; i < rlim; ++i) rw.seq_ascii.push_back(ref[ro + i]);
        // fill quals reuse the *upcoming* read quals without advancing
        // (Python qual[q_off:q_off+ln] on a DEL; documented quirk)
        i64 qlim = ln;
        if (qo + qlim > v.l_seq) qlim = v.l_seq > qo ? v.l_seq - qo : 0;
        for (i64 i = 0; i < qlim; ++i) rw.qual.push_back(b.qual[qo + i]);
        m_diff += ln;
      } else {
        should_ignore = false;
        rw.cigar.push_back((uint32_t)(ln << 4) | 2);
      }
      ro += ln;
    } else if (op == 4) {  // S
      should_ignore = false;
      i64 qlim = ln;
      if (qo + qlim > v.l_seq) qlim = v.l_seq > qo ? v.l_seq - qo : 0;
      for (i64 i = 0; i < qlim; ++i) {
        rw.seq_ascii.push_back((uint8_t)NT16_STR[seq_nib(b.seq, qo + i)]);
        rw.qual.push_back(b.qual[qo + i]);
      }
      rw.cigar.push_back((uint32_t)(ln << 4) | 4);
      qo += ln;
    } else {
      break;
    }
  }
  bool dirty;
  if (rw.nmatch == 0) {
    // IEEE parity (smooth.py:178-181): 0/0 NaN falls through; x/0 = +inf
    // is dirty unless the threshold itself is +inf
    dirty = rw.nmis > 0 && !thr_inf;
  } else {
    dirty = (double)rw.nmis / (double)rw.nmatch > threshold;
  }
  if (dirty) {
    rw.xf = 1;
    return;
  }
  if (should_ignore) {
    rw.xf = 2;
    return;
  }
  // internal-error guard (smoother.cpp:218-227)
  i64 expect = 0;
  for (uint32_t c : rw.cigar) {
    int op = c & 0xF;
    if (op == 0 || op == 1 || op == 4) expect += c >> 4;
  }
  if ((i64)rw.seq_ascii.size() != expect ||
      rw.qual.size() != rw.seq_ascii.size()) {
    rw.xf = 3;
    return;
  }
  rw.xf = 0;
}

// append an encoded record (matching io/bam.py _encode_record byte for
// byte: qname re-terminated with one NUL, odd seq pad nibble zeroed, XF
// aux tag replaced in place or appended as type 'i')
void emit_record(std::vector<uint8_t> &out, const RecView &v, const Body &b,
                 const Rewrite *rw, int xf) {
  i64 qname_len = 0;
  while (qname_len < b.l_qname && b.qname[qname_len] != 0) ++qname_len;
  i64 l_qname = qname_len + 1;

  const uint32_t *cig = rw && rw->xf == 0 ? rw->cigar.data() : b.cigar;
  i64 n_cigar = rw && rw->xf == 0 ? (i64)rw->cigar.size() : v.n_cigar;
  i64 l_seq = rw && rw->xf == 0 ? (i64)rw->seq_ascii.size() : v.l_seq;

  // aux: copy with XF replaced (type 'i') or appended
  std::vector<uint8_t> aux;
  aux.reserve(b.aux_len + 7);
  bool replaced = false;
  i64 off = 0;
  while (off + 3 <= b.aux_len) {
    i64 used = aux_skip(b.aux + off, b.aux_len - off);
    if (used < 0) break;  // malformed tail: keep verbatim below
    if (b.aux[off] == 'X' && b.aux[off + 1] == 'F') {
      aux.push_back('X');
      aux.push_back('F');
      aux.push_back('i');
      int32_t val = xf;
      aux.insert(aux.end(), (uint8_t *)&val, (uint8_t *)&val + 4);
      replaced = true;
    } else {
      aux.insert(aux.end(), b.aux + off, b.aux + off + used);
    }
    off += used;
  }
  if (off < b.aux_len) aux.insert(aux.end(), b.aux + off, b.aux + b.aux_len);
  if (!replaced) {
    aux.push_back('X');
    aux.push_back('F');
    aux.push_back('i');
    int32_t val = xf;
    aux.insert(aux.end(), (uint8_t *)&val, (uint8_t *)&val + 4);
  }

  i64 body_size = 32 + l_qname + 4 * n_cigar + (l_seq + 1) / 2 + l_seq +
                  (i64)aux.size();
  size_t base = out.size();
  out.resize(base + 4 + body_size);
  uint8_t *w = out.data() + base;
  int32_t bs32 = (int32_t)body_size;
  std::memcpy(w, &bs32, 4);
  w += 4;
  std::memcpy(w, &v.tid, 4);
  std::memcpy(w + 4, &v.pos, 4);
  w[8] = (uint8_t)l_qname;
  w[9] = v.mapq;
  std::memcpy(w + 10, &b.bin, 2);
  uint16_t nc16 = (uint16_t)n_cigar;
  std::memcpy(w + 12, &nc16, 2);
  std::memcpy(w + 14, &v.flag, 2);
  int32_t ls32 = (int32_t)l_seq;
  std::memcpy(w + 16, &ls32, 4);
  std::memcpy(w + 20, &b.mtid, 4);
  std::memcpy(w + 24, &b.mpos, 4);
  std::memcpy(w + 28, &b.tlen, 4);
  w += 32;
  std::memcpy(w, b.qname, qname_len);
  w[qname_len] = 0;
  w += l_qname;
  std::memcpy(w, cig, 4 * n_cigar);
  w += 4 * n_cigar;
  if (rw && rw->xf == 0) {
    for (i64 i = 0; i < l_seq; i += 2) {
      uint8_t hi = NT16.t[rw->seq_ascii[i]];
      uint8_t lo = (i + 1 < l_seq) ? NT16.t[rw->seq_ascii[i + 1]] : 0;
      *w++ = (uint8_t)((hi << 4) | lo);
    }
    std::memcpy(w, rw->qual.data(), l_seq);
    w += l_seq;
  } else {
    i64 nb = (l_seq + 1) / 2;
    std::memcpy(w, b.seq, nb);
    if (l_seq & 1) w[nb - 1] &= 0xF0;  // zero the odd pad nibble
    w += nb;
    std::memcpy(w, b.qual, l_seq);
    w += l_seq;
  }
  std::memcpy(w, aux.data(), aux.size());
}

}  // namespace

extern "C" {

int svdss_smooth_ratios(const uint8_t *data, i64 size, const i64 *recs,
                        i64 n_recs, const uint8_t *ref_buf,
                        const i64 *ref_off, const i64 *ref_len,
                        int32_t n_tid, int32_t min_mapq, int32_t sample_n,
                        double *out_ratios, i64 *out_n) {
  (void)size;
  i64 n = 0;
  for (i64 i = 0; i < n_recs && n < sample_n; ++i) {
    RecView v = view(data, recs + i * 8);
    if (!eligible(v, ref_off, n_tid, min_mapq)) continue;
    Body b = body(v);
    i64 nmatch, nmis;
    mismatch_stats(v, b, ref_buf + ref_off[v.tid], ref_len[v.tid], &nmatch,
                   &nmis);
    out_ratios[n++] =
        nmatch ? (double)nmis / (double)nmatch : INFINITY;
  }
  *out_n = n;
  return 0;
}

int svdss_smooth_run(const uint8_t *data, i64 size, const i64 *recs,
                     i64 n_recs, const uint8_t *ref_buf, const i64 *ref_off,
                     const i64 *ref_len, int32_t n_tid, double threshold,
                     int32_t min_mapq, int32_t min_indel, int threads,
                     uint8_t **out_buf, i64 *out_size, i64 *stats) {
  (void)size;
  if (threads <= 0) threads = 1;
  bool thr_inf = std::isinf(threshold) && threshold > 0;
  std::vector<std::vector<uint8_t>> chunks(threads);
  std::vector<std::vector<i64>> lstats(threads,
                                       std::vector<i64>(5, 0));
  std::atomic<int> bad{0};
  auto worker = [&](int t) {
    i64 lo = n_recs * t / threads, hi = n_recs * (t + 1) / threads;
    std::vector<uint8_t> &out = chunks[t];
    out.reserve((size_t)((hi - lo) * 256));
    Rewrite rw;
    for (i64 i = lo; i < hi; ++i) {
      RecView v = view(data, recs + i * 8);
      if (!eligible(v, ref_off, n_tid, min_mapq)) {
        lstats[t][4]++;
        continue;
      }
      Body b = body(v);
      smooth_one(v, b, ref_buf + ref_off[v.tid], ref_len[v.tid], threshold,
                 thr_inf, min_indel, rw);
      lstats[t][rw.xf]++;
      emit_record(out, v, b, &rw, rw.xf);
    }
  };
  std::vector<std::thread> ts;
  for (int t = 1; t < threads; ++t) ts.emplace_back(worker, t);
  worker(0);
  for (auto &th : ts) th.join();
  if (bad.load()) return 1;
  i64 total = 0;
  for (auto &c : chunks) total += (i64)c.size();
  uint8_t *buf = (uint8_t *)std::malloc(total ? total : 1);
  if (!buf) return 3;
  i64 off = 0;
  for (auto &c : chunks) {
    std::memcpy(buf + off, c.data(), c.size());
    off += (i64)c.size();
  }
  for (int k = 0; k < 5; ++k) {
    stats[k] = 0;
    for (int t = 0; t < threads; ++t) stats[k] += lstats[t][k];
  }
  *out_buf = buf;
  *out_size = total;
  return 0;
}

// BGZF-compress `data` to `path` in 65280-byte blocks (matching
// io/bgzf.py BgzfWriter's member framing byte for byte), deflating blocks
// in parallel. flags: bit0 = append to path, bit1 = omit the EOF block
// (for multi-part streams: header part with flags=2, body with flags=1).
int svdss_bgzf_write(const char *path, const uint8_t *data, i64 size,
                     int level, int threads, int flags) {
  constexpr i64 BLK = 65280;
  if (threads <= 0) threads = 1;
  i64 n_blocks = (size + BLK - 1) / BLK;
  std::vector<std::vector<uint8_t>> out((size_t)n_blocks);
  std::atomic<i64> next{0};
  std::atomic<int> err{0};
  auto worker = [&] {
    std::vector<uint8_t> cbuf(BLK + 1024);
    for (;;) {
      i64 i = next.fetch_add(1);
      if (i >= n_blocks) return;
      i64 lo = i * BLK;
      i64 len = std::min(BLK, size - lo);
      z_stream zs;
      std::memset(&zs, 0, sizeof(zs));
      if (deflateInit2(&zs, level, Z_DEFLATED, -15, 8,
                       Z_DEFAULT_STRATEGY) != Z_OK) {
        err.store(1);
        return;
      }
      zs.next_in = const_cast<Bytef *>(data + lo);
      zs.avail_in = (uInt)len;
      zs.next_out = cbuf.data();
      zs.avail_out = (uInt)cbuf.size();
      if (deflate(&zs, Z_FINISH) != Z_STREAM_END) {
        deflateEnd(&zs);
        err.store(1);
        return;
      }
      i64 clen = (i64)zs.total_out;
      deflateEnd(&zs);
      uint32_t crc = crc32(0, data + lo, (uInt)len);
      std::vector<uint8_t> &b = out[i];
      b.resize(18 + clen + 8);
      static const uint8_t hdr[12] = {0x1f, 0x8b, 8,    4, 0, 0,
                                      0,    0,    0,    0xff, 6, 0};
      std::memcpy(b.data(), hdr, 12);
      b[12] = 'B';
      b[13] = 'C';
      b[14] = 2;
      b[15] = 0;
      uint16_t bsize = (uint16_t)(clen + 25);
      std::memcpy(b.data() + 16, &bsize, 2);
      std::memcpy(b.data() + 18, cbuf.data(), clen);
      uint32_t isize = (uint32_t)len;
      std::memcpy(b.data() + 18 + clen, &crc, 4);
      std::memcpy(b.data() + 18 + clen + 4, &isize, 4);
    }
  };
  std::vector<std::thread> ts;
  for (int t = 1; t < threads; ++t) ts.emplace_back(worker);
  worker();
  for (auto &th : ts) th.join();
  if (err.load()) return 1;
  FILE *fp = std::fopen(path, (flags & 1) ? "ab" : "wb");
  if (!fp) return 2;
  for (auto &b : out)
    if (b.size() && std::fwrite(b.data(), 1, b.size(), fp) != b.size()) {
      std::fclose(fp);
      return 3;
    }
  if (!(flags & 2)) {
    // standard BGZF EOF block
    static const uint8_t eof[28] = {
        0x1f, 0x8b, 0x08, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00, 0xff,
        0x06, 0x00, 0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00,
        0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00};
    std::fwrite(eof, 1, 28, fp);
  }
  std::fclose(fp);
  return 0;
}

}  // extern "C"
