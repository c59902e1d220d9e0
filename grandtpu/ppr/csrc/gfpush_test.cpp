// Standalone driver for sanitizer runs of the GFPush kernel (no Python, so
// TSAN/ASAN reports implicate only our code). Builds a random graph, runs
// gfpush_run multithreaded, and sanity-checks the output.
//
//   g++ -O1 -g -std=c++17 -fopenmp -fsanitize=thread \
//       gfpush.cpp gfpush_test.cpp -o gfpush_tsan && ./gfpush_tsan

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

extern "C" int gfpush_run(const int32_t*, const int32_t*, int64_t,
                          const int32_t*, int64_t, const double*, int32_t,
                          double, int32_t, int32_t*, double*, int32_t);

int main() {
  const int n = 5000, avg_deg = 12, n_src = 1024, k = 16, n_coef = 8;
  std::mt19937 rng(7);
  std::uniform_int_distribution<int> pick(0, n - 1);

  std::vector<std::vector<int32_t>> adj(n);
  for (int e = 0; e < n * avg_deg; ++e) {
    int u = pick(rng), v = pick(rng);
    adj[u].push_back(v);
    adj[v].push_back(u);
  }
  for (int u = 0; u < n; ++u) adj[u].push_back(u);  // self loops

  std::vector<int32_t> indptr(n + 1, 0), indices;
  for (int u = 0; u < n; ++u) {
    indptr[u + 1] = indptr[u] + static_cast<int32_t>(adj[u].size());
    indices.insert(indices.end(), adj[u].begin(), adj[u].end());
  }
  std::vector<int32_t> sources(n_src);
  for (int i = 0; i < n_src; ++i) sources[i] = pick(rng);
  std::vector<double> coef(n_coef, 1.0 / n_coef);
  std::vector<int32_t> out_cols(static_cast<size_t>(n_src) * k, 0);
  std::vector<double> out_vals(static_cast<size_t>(n_src) * k, 0.0);

  int rc = gfpush_run(indptr.data(), indices.data(), n, sources.data(),
                      n_src, coef.data(), n_coef, 1e-5, k,
                      out_cols.data(), out_vals.data(), /*threads=*/4);
  if (rc != 0) {
    std::fprintf(stderr, "gfpush_run rc=%d\n", rc);
    return 1;
  }
  double mass = 0.0;
  int nonzero_rows = 0;
  for (int i = 0; i < n_src; ++i) {
    double row = 0.0;
    for (int j = 0; j < k; ++j) row += out_vals[static_cast<size_t>(i) * k + j];
    mass += row;
    if (row > 0.0) ++nonzero_rows;
  }
  // top-k truncation keeps only the head of the distribution; every row
  // must still be nonempty and hold positive mass <= 1
  if (nonzero_rows != n_src || !(mass > 0.0) || mass > n_src + 1e-6) {
    std::fprintf(stderr, "suspicious output: rows=%d mass=%f\n",
                 nonzero_rows, mass);
    return 2;
  }
  std::printf("ok mass=%f\n", mass);
  return 0;
}
