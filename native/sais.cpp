// SA-IS suffix-array construction (Nong, Zhang & Chan 2009).
//
// Native backend for svdss_tpu.index.suffix_array: builds the suffix array
// of the two-strand nt6 genome text from which the flat FMD layout (BWT +
// occ checkpoints) is derived. Plays the role ropebwt3's libsais plays for
// the reference (`SVDSS index`, main.cpp:34-37) but emits a plain suffix
// array over the in-memory text; sentinels (0) may repeat, ties break by
// suffix content, which the FMD search is invariant to (see
// svdss_tpu/index/fmd.py).
//
// Exposed via a C ABI for ctypes:
//   int svdss_sais(const uint8_t* text, int64_t* sa, int64_t n);

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

using i64 = int64_t;

// Induced sort core, generic over the text symbol type.
template <typename T>
void sais_rec(const T *s, i64 *SA, i64 n, i64 K, std::vector<i64> &work) {
  if (n == 0) return;
  if (n == 1) { SA[0] = 0; return; }

  std::vector<bool> is_s(n);
  is_s[n - 1] = true;
  for (i64 i = n - 2; i >= 0; --i)
    is_s[i] = (s[i] < s[i + 1]) || (s[i] == s[i + 1] && is_s[i + 1]);

  auto is_lms = [&](i64 i) { return i > 0 && is_s[i] && !is_s[i - 1]; };

  std::vector<i64> bkt(K + 1);
  auto get_buckets = [&](bool end) {
    std::fill(bkt.begin(), bkt.end(), 0);
    for (i64 i = 0; i < n; ++i) ++bkt[s[i]];
    i64 sum = 0;
    for (i64 c = 0; c <= K; ++c) {
      sum += bkt[c];
      bkt[c] = end ? sum : sum - bkt[c];
    }
  };

  // stage 1: sort LMS substrings by induced sort
  std::fill(SA, SA + n, -1);
  get_buckets(true);
  for (i64 i = n - 1; i >= 1; --i)
    if (is_lms(i)) SA[--bkt[s[i]]] = i;
  get_buckets(false);
  for (i64 i = 0; i < n; ++i) {
    i64 j = SA[i];
    if (j > 0 && !is_s[j - 1]) SA[bkt[s[j - 1]]++] = j - 1;
  }
  get_buckets(true);
  for (i64 i = n - 1; i >= 0; --i) {
    i64 j = SA[i];
    if (j > 0 && is_s[j - 1]) SA[--bkt[s[j - 1]]] = j - 1;
  }

  // collect sorted LMS positions
  i64 n1 = 0;
  for (i64 i = 0; i < n; ++i)
    if (SA[i] > 0 && is_lms(SA[i])) SA[n1++] = SA[i];

  // name LMS substrings
  std::fill(SA + n1, SA + n, -1);
  i64 name = 0, prev = -1;
  for (i64 i = 0; i < n1; ++i) {
    i64 pos = SA[i];
    bool diff = false;
    if (prev == -1) {
      diff = true;
    } else {
      for (i64 d = 0;; ++d) {
        if (pos + d >= n || prev + d >= n) { diff = true; break; }
        if (s[pos + d] != s[prev + d] || is_s[pos + d] != is_s[prev + d]) {
          diff = true; break;
        }
        if (d > 0 && (is_lms(pos + d) || is_lms(prev + d))) {
          diff = !(is_lms(pos + d) && is_lms(prev + d));
          break;
        }
      }
    }
    if (diff) { ++name; prev = pos; }
    SA[n1 + pos / 2] = name - 1;
  }
  i64 *s1 = SA + n - n1;
  {
    i64 j = n - 1;
    for (i64 i = n - 1; i >= n1; --i)
      if (SA[i] >= 0) SA[j--] = SA[i];
  }

  // stage 2: order LMS suffixes
  std::vector<i64> lms_pos;
  lms_pos.reserve(n1);
  for (i64 i = 1; i < n; ++i)
    if (is_lms(i)) lms_pos.push_back(i);

  if (name < n1) {
    std::vector<i64> sub(s1, s1 + n1);
    sais_rec<i64>(sub.data(), SA, n1, name - 1, work);
  } else {
    for (i64 i = 0; i < n1; ++i) SA[s1[i]] = i;
  }
  // map recursive SA back to text positions
  for (i64 i = 0; i < n1; ++i) SA[i] = lms_pos[SA[i]];

  // stage 3: induce the full SA from sorted LMS suffixes
  std::fill(SA + n1, SA + n, -1);
  get_buckets(true);
  for (i64 i = n1 - 1; i >= 0; --i) {
    i64 j = SA[i];
    SA[i] = -1;
    SA[--bkt[s[j]]] = j;
  }
  get_buckets(false);
  for (i64 i = 0; i < n; ++i) {
    i64 j = SA[i];
    if (j > 0 && !is_s[j - 1]) SA[bkt[s[j - 1]]++] = j - 1;
  }
  get_buckets(true);
  for (i64 i = n - 1; i >= 0; --i) {
    i64 j = SA[i];
    if (j > 0 && is_s[j - 1]) SA[--bkt[s[j - 1]]] = j - 1;
  }
}

}  // namespace

extern "C" int svdss_sais(const uint8_t *text, int64_t *sa, int64_t n) {
  if (n < 0) return 1;
  if (n == 0) return 0;
  // SA-IS as implemented requires the final symbol to be a unique minimum
  // ("sentinel"). Our genome text ends with 0 but 0 repeats, so build over
  // text+[terminator] shifted by +1, then drop the terminator row.
  std::vector<uint16_t> s(n + 1);
  for (int64_t i = 0; i < n; ++i) s[i] = (uint16_t)text[i] + 1;
  s[n] = 0;
  std::vector<int64_t> SA(n + 1);
  std::vector<int64_t> work;
  sais_rec<uint16_t>(s.data(), SA.data(), n + 1, 256, work);
  // SA[0] is the terminator suffix; drop it
  std::memcpy(sa, SA.data() + 1, sizeof(int64_t) * n);
  return 0;
}
