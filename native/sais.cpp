// SA-IS suffix-array construction (Nong, Zhang & Chan 2009).
//
// Native backend for svdss_tpu.index.suffix_array: builds the suffix array
// of a (small/medium) nt6 text from which the flat FMD layout (BWT +
// occ checkpoints) is derived. Plays the role ropebwt3's libsais plays for
// the reference (`SVDSS index`, main.cpp:34-37) but emits a plain suffix
// array over the in-memory text; sentinels (0) may repeat, ties break by
// suffix content, which the FMD search is invariant to (see
// svdss_tpu/index/fmd.py). Whole-genome builds use the grouped builder in
// bwtbuild.cpp instead (per-group int32 SA-IS + FM-walk BWT merge).
//
// Exposed via a C ABI for ctypes:
//   int svdss_sais(const uint8_t* text, int64_t* sa, int64_t n);

#include <cstdint>
#include <cstring>
#include <vector>

#include "sais_impl.h"

extern "C" int svdss_sais(const uint8_t *text, int64_t *sa, int64_t n) {
  if (n < 0) return 1;
  if (n == 0) return 0;
  // SA-IS requires the final symbol to be a unique minimum ("sentinel").
  // Our genome text ends with 0 but 0 repeats, so build over
  // text+[terminator] shifted by +1, then drop the terminator row.
  std::vector<uint16_t> s(n + 1);
  for (int64_t i = 0; i < n; ++i) s[i] = (uint16_t)text[i] + 1;
  s[n] = 0;
  std::vector<int64_t> SA(n + 1);
  svdss::sais_rec<uint16_t, int64_t>(s.data(), SA.data(), n + 1, 256);
  // SA[0] is the terminator suffix; drop it
  std::memcpy(sa, SA.data() + 1, sizeof(int64_t) * n);
  return 0;
}
