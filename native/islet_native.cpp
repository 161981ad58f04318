// Native kernels for the offline Islet basis derivation tools.
//
// Counterpart of the LAPACK-backed stability analysis in
// /root/reference/methods/islet/islet_maxeigcomp.{hpp,cpp}: the basis search
// evaluates the spectral radius of thousands of dense 1-D advection
// operators; dgeev dominates. This module exposes a C-ABI batched
// spectral-radius routine that fans matrices out over a thread pool, each
// thread calling LAPACK dgeev. Loaded from Python via ctypes
// (compose_tpu/islet_tools.py builds it on demand with g++).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
void dgeev_(const char* jobvl, const char* jobvr, const int* n, double* a,
            const int* lda, double* wr, double* wi, double* vl,
            const int* ldvl, double* vr, const int* ldvr, double* work,
            const int* lwork, int* info);
}

namespace {

// Spectral radius of one dense n x n row-major matrix (copied; dgeev
// destroys its input). Returns -1.0 on LAPACK failure.
double spectral_radius_one(const double* mat, int n, std::vector<double>& a,
                           std::vector<double>& wr, std::vector<double>& wi,
                           std::vector<double>& work) {
  a.assign(mat, mat + static_cast<size_t>(n) * n);  // dgeev is
  // column-major, but eigenvalues of A and A^T coincide, so no transpose.
  wr.assign(n, 0.0);
  wi.assign(n, 0.0);
  const char jobn = 'N';
  int info = 0;
  int lwork = std::max(64 * n, 4 * n);
  if (static_cast<int>(work.size()) < lwork) work.resize(lwork);
  dgeev_(&jobn, &jobn, &n, a.data(), &n, wr.data(), wi.data(), nullptr, &n,
         nullptr, &n, work.data(), &lwork, &info);
  if (info != 0) return -1.0;
  double r = 0.0;
  for (int i = 0; i < n; ++i)
    r = std::max(r, std::sqrt(wr[i] * wr[i] + wi[i] * wi[i]));
  return r;
}

}  // namespace

extern "C" {

// mats: n_mats dense n x n matrices, contiguous. out: n_mats spectral radii
// (-1.0 where LAPACK failed). nthreads <= 0 selects hardware concurrency.
void islet_spectral_radius(const double* mats, int n_mats, int n, double* out,
                           int nthreads) {
  if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
  nthreads = std::max(1, std::min(nthreads, n_mats));
  std::atomic<int> next(0);
  auto worker = [&]() {
    std::vector<double> a, wr, wi, work;
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n_mats) break;
      out[i] = spectral_radius_one(mats + static_cast<size_t>(i) * n * n, n,
                                   a, wr, wi, work);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 1; t < nthreads; ++t) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();
}

}  // extern "C"
