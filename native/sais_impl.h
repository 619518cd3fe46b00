// SA-IS suffix-array construction core (Nong, Zhang & Chan 2009),
// templated over the text symbol type T and the index type I (int32 for
// texts under 2^31, halving memory and roughly doubling speed vs int64).
//
// Requirements: s[n-1] must be a unique minimum symbol ("sentinel").
// Shared by sais.cpp (legacy int64 ABI) and bwtbuild.cpp (grouped
// whole-genome builder).

#pragma once

#include <cstdint>
#include <cstdlib>
#include <new>
#include <vector>

#include <sys/mman.h>

namespace svdss {

// Allocator backing large arrays with transparent hugepages (the host runs
// THP in madvise mode, so GB-scale suffix arrays otherwise random-access
// through 4KB pages — measured as the dominant SA-IS cost: TLB misses).
// Small allocations fall through to plain new.
template <typename T>
struct huge_allocator {
  using value_type = T;
  static constexpr std::size_t kHuge = std::size_t(1) << 21;

  huge_allocator() = default;
  template <class U> huge_allocator(const huge_allocator<U> &) {}

  static std::size_t rounded(std::size_t n) {
    return (n * sizeof(T) + kHuge - 1) & ~(kHuge - 1);
  }
  T *allocate(std::size_t n) {
    if (n * sizeof(T) < kHuge)
      return static_cast<T *>(::operator new(n * sizeof(T)));
    void *p = mmap(nullptr, rounded(n), PROT_READ | PROT_WRITE,
                   MAP_PRIVATE | MAP_ANONYMOUS, -1, 0);
    if (p == MAP_FAILED) throw std::bad_alloc();
    madvise(p, rounded(n), MADV_HUGEPAGE);
    return static_cast<T *>(p);
  }
  void deallocate(T *p, std::size_t n) noexcept {
    if (n * sizeof(T) < kHuge)
      ::operator delete(p);
    else
      munmap(p, rounded(n));
  }
  bool operator==(const huge_allocator &) const { return true; }
  bool operator!=(const huge_allocator &) const { return false; }
};

template <typename T>
using hvector = std::vector<T, huge_allocator<T>>;

template <typename T, typename I>
void sais_rec(const T *s, I *SA, I n, I K) {
  if (n == 0) return;
  if (n == 1) { SA[0] = 0; return; }

  // suffix types as plain bytes (vector<bool> bit ops cost ~2x in the
  // induced-sort scans, the dominant loops at scale)
  hvector<uint8_t> is_s(n);
  is_s[n - 1] = 1;
  for (I i = n - 2; i >= 0; --i)
    is_s[i] = (s[i] < s[i + 1]) || (s[i] == s[i + 1] && is_s[i + 1]);

  auto is_lms = [&](I i) { return i > 0 && is_s[i] && !is_s[i - 1]; };

  // symbol counts once; bucket heads/tails are K-length derivations
  std::vector<I> cnt(K + 1, 0), bkt(K + 1);
  for (I i = 0; i < n; ++i) ++cnt[s[i]];
  auto get_buckets = [&](bool end) {
    I sum = 0;
    for (I c = 0; c <= K; ++c) {
      sum += cnt[c];
      bkt[c] = end ? sum : sum - cnt[c];
    }
  };

  // stage 1: sort LMS substrings by induced sort
  std::fill(SA, SA + n, (I)-1);
  get_buckets(true);
  for (I i = n - 1; i >= 1; --i)
    if (is_lms(i)) SA[--bkt[s[i]]] = i;
  get_buckets(false);
  for (I i = 0; i < n; ++i) {
    I j = SA[i];
    if (j > 0 && !is_s[j - 1]) SA[bkt[s[j - 1]]++] = j - 1;
  }
  get_buckets(true);
  for (I i = n - 1; i >= 0; --i) {
    I j = SA[i];
    if (j > 0 && is_s[j - 1]) SA[--bkt[s[j - 1]]] = j - 1;
  }

  // collect sorted LMS positions
  I n1 = 0;
  for (I i = 0; i < n; ++i)
    if (SA[i] > 0 && is_lms(SA[i])) SA[n1++] = SA[i];

  // name LMS substrings
  std::fill(SA + n1, SA + n, (I)-1);
  I name = 0, prev = -1;
  for (I i = 0; i < n1; ++i) {
    I pos = SA[i];
    bool diff = false;
    if (prev == -1) {
      diff = true;
    } else {
      for (I d = 0;; ++d) {
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
  I *s1 = SA + n - n1;
  {
    I j = n - 1;
    for (I i = n - 1; i >= n1; --i)
      if (SA[i] >= 0) SA[j--] = SA[i];
  }

  // stage 2: order LMS suffixes
  hvector<I> lms_pos;
  lms_pos.reserve(n1);
  for (I i = 1; i < n; ++i)
    if (is_lms(i)) lms_pos.push_back(i);

  if (name < n1) {
    hvector<I> sub(s1, s1 + n1);
    sais_rec<I, I>(sub.data(), SA, n1, name - 1);
  } else {
    for (I i = 0; i < n1; ++i) SA[s1[i]] = i;
  }
  // map recursive SA back to text positions
  for (I i = 0; i < n1; ++i) SA[i] = lms_pos[SA[i]];

  // stage 3: induce the full SA from sorted LMS suffixes
  std::fill(SA + n1, SA + n, (I)-1);
  get_buckets(true);
  for (I i = n1 - 1; i >= 0; --i) {
    I j = SA[i];
    SA[i] = -1;
    SA[--bkt[s[j]]] = j;
  }
  get_buckets(false);
  for (I i = 0; i < n; ++i) {
    I j = SA[i];
    if (j > 0 && !is_s[j - 1]) SA[bkt[s[j - 1]]++] = j - 1;
  }
  get_buckets(true);
  for (I i = n - 1; i >= 0; --i) {
    I j = SA[i];
    if (j > 0 && is_s[j - 1]) SA[--bkt[s[j - 1]]] = j - 1;
  }
}

}  // namespace svdss
