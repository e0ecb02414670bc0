// Native text-metric kernels: Levenshtein distance + LCS length.
//
// The benchmark/metrics path (layerskip_tpu/metrics.py) computes
// character-level edit distance and token-level LCS per sample; both are
// O(n*m) dynamic programs that dominate metric time for long generations in
// pure Python. These are the C++ equivalents, exposed through a flat C ABI
// (ctypes) with rolling-row DP (O(min(n,m)) memory).
//
// Built by native/build.sh into native/lib/libtext_metrics.so.

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

// Character-level Levenshtein over uint32 codepoint arrays.
int64_t levenshtein_u32(const uint32_t *a, int64_t na, const uint32_t *b,
                        int64_t nb) {
  if (na < nb) {
    std::swap(a, b);
    std::swap(na, nb);
  }
  std::vector<int64_t> prev(nb + 1), cur(nb + 1);
  for (int64_t j = 0; j <= nb; j++) prev[j] = j;
  for (int64_t i = 1; i <= na; i++) {
    cur[0] = i;
    const uint32_t ca = a[i - 1];
    for (int64_t j = 1; j <= nb; j++) {
      const int64_t sub = prev[j - 1] + (ca != b[j - 1] ? 1 : 0);
      cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, sub});
    }
    std::swap(prev, cur);
  }
  return prev[nb];
}

// Longest-common-subsequence length over uint32 token-id arrays.
int64_t lcs_u32(const uint32_t *a, int64_t na, const uint32_t *b, int64_t nb) {
  if (na == 0 || nb == 0) return 0;
  if (na < nb) {
    std::swap(a, b);
    std::swap(na, nb);
  }
  std::vector<int64_t> prev(nb + 1, 0), cur(nb + 1, 0);
  for (int64_t i = 1; i <= na; i++) {
    const uint32_t ca = a[i - 1];
    for (int64_t j = 1; j <= nb; j++) {
      cur[j] = (ca == b[j - 1]) ? prev[j - 1] + 1
                                : std::max(prev[j], cur[j - 1]);
    }
    std::swap(prev, cur);
    std::fill(cur.begin(), cur.end(), 0);
  }
  return prev[nb];
}

}  // extern "C"
