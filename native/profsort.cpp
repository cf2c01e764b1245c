// profsort: native sort primitives for the symbolic assembly profiles.
//
// TPU-native replacement for the profile-construction cost of the
// reference's matrix front end (hecmw1/src/solver/matrix/hecmw_mat_con.c
// CSR profile build): the ELL / cluster-ELL builders (assembly/ell.py,
// assembly/bell.py) reduce to two primitives over ~31M int64 keys at
// 1M-dof tet — sorted-unique-with-inverse and stable argsort — which
// dominate the 60 s numpy setup.  LSD radix sort (8-bit digits, passes
// bounded by the key magnitude) runs them in O(P) instead of numpy's
// comparison sort.
//
// C ABI (ctypes):
//   ps_argsort(key[P] int64 >=0, P, out perm[P] int32)      stable order
//   ps_unique_inverse(key[P], P, out uniq[P] int64,
//                     out inv[P] int32) -> U (count)        uniq sorted

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// stable LSD radix argsort of non-negative int64 keys; perm gets the
// order (perm[k] = original index of k-th smallest).  Keys travel WITH
// their indices so every pass reads sequentially (an index-only radix
// does a random 8-byte gather per element per pass and loses to the
// comparison sort it replaces).  11-bit digits: 37-bit pair keys at
// 1M-dof tet finish in 4 passes.
void radix_argsort(const int64_t* key, int64_t P, int32_t* perm) {
  constexpr int KB = 11;               // digit bits
  constexpr int NB = 1 << KB;
  int64_t mx = 0;
  for (int64_t i = 0; i < P; ++i)
    if (key[i] > mx) mx = key[i];
  int passes = 1;
  while (passes < (63 + KB - 1) / KB && (mx >> (KB * passes)) != 0)
    ++passes;

  std::vector<int64_t> ka(P), kb(P);
  std::vector<int32_t> ia(P), ib(P);
  std::memcpy(ka.data(), key, P * sizeof(int64_t));
  for (int64_t i = 0; i < P; ++i) ia[i] = (int32_t)i;
  int64_t* kc = ka.data();
  int64_t* kn = kb.data();
  int32_t* ic = ia.data();
  int32_t* in_ = ib.data();
  std::vector<int64_t> cnt(NB);
  for (int p = 0; p < passes; ++p) {
    const int sh = KB * p;
    std::memset(cnt.data(), 0, NB * sizeof(int64_t));
    for (int64_t i = 0; i < P; ++i)
      ++cnt[(kc[i] >> sh) & (NB - 1)];
    int64_t run = 0;
    for (int d = 0; d < NB; ++d) {
      int64_t c = cnt[d];
      cnt[d] = run;
      run += c;
    }
    for (int64_t i = 0; i < P; ++i) {
      const int64_t k = kc[i];
      const int64_t pos = cnt[(k >> sh) & (NB - 1)]++;
      kn[pos] = k;
      in_[pos] = ic[i];
    }
    std::swap(kc, kn);
    std::swap(ic, in_);
  }
  std::memcpy(perm, ic, P * sizeof(int32_t));
}

}  // namespace

extern "C" {

void ps_argsort(const int64_t* key, int64_t P, int32_t* perm) {
  radix_argsort(key, P, perm);
}

int64_t ps_unique_inverse(const int64_t* key, int64_t P, int64_t* uniq,
                          int32_t* inv) {
  if (P == 0) return 0;
  std::vector<int32_t> perm(P);
  radix_argsort(key, P, perm.data());
  // sequential walk over the sorted order; the only random access is
  // the inv scatter (one pass)
  int64_t u = -1;
  int64_t prev = -1;
  for (int64_t k = 0; k < P; ++k) {
    const int32_t src = perm[k];
    const int64_t v = key[src];
    if (u < 0 || v != prev) {
      ++u;
      uniq[u] = v;
      prev = v;
    }
    inv[src] = (int32_t)u;
  }
  return u + 1;
}

}  // extern "C"
