// C++ binding smoke test (rust/cuvs cargo-test analog): exercises the
// RAII wrapper over the C ABI — typed build/search, extend, move
// semantics, serialize round-trip, mg index, exception on bad algo.
#include "cuvs_tpu.hpp"

#include <cstdio>
#include <random>

int main() {
  const int64_t n = 2000, d = 16, nq = 8, k = 5;
  std::vector<float> data(n * d);
  std::mt19937 rng(42);
  std::uniform_real_distribution<float> uni(0.f, 1.f);
  for (auto& v : data) v = uni(rng);

  cuvs_tpu::init("cpu");

  auto index = cuvs_tpu::Index::build("ivf_flat", data.data(), n, d,
                                      "sqeuclidean", "{\"n_lists\": 8}");
  auto res = index.search(data.data(), nq, d, k, "{\"n_probes\": 8}");
  for (int64_t q = 0; q < nq; ++q) {
    if (res.neighbors[q * k] != (int32_t)q) {
      std::fprintf(stderr, "FAIL self-nn q=%lld id=%d\n", (long long)q,
                   res.neighbors[q * k]);
      return 1;
    }
  }
  std::printf("cpp search ok\n");

  index.extend(data.data(), 10, d);  // duplicate rows; must not throw
  index.serialize("/tmp/cpp_binding_index.npz");
  auto loaded = cuvs_tpu::Index::deserialize("/tmp/cpp_binding_index.npz");
  auto res2 = loaded.search(data.data(), nq, d, k, "{\"n_probes\": 8}");
  if (res2.neighbors[0] != 0) {
    std::fprintf(stderr, "FAIL round-trip\n");
    return 1;
  }
  std::printf("cpp serialize round-trip ok\n");

  // move semantics: handle transfers, no double free
  cuvs_tpu::Index moved = std::move(loaded);
  auto res3 = moved.search(data.data(), 2, d, k, "{\"n_probes\": 8}");
  (void)res3;

  // int8 typed path
  std::vector<int8_t> i8(n * d);
  for (auto& v : i8) v = (int8_t)(rng() % 200 - 100);
  auto idx8 = cuvs_tpu::Index::build<int8_t>("brute_force", i8.data(), n, d);
  auto res8 = idx8.search<int8_t>(i8.data(), nq, d, k);
  if (res8.neighbors[0] != 0) {
    std::fprintf(stderr, "FAIL int8 self-nn\n");
    return 1;
  }
  std::printf("cpp int8 ok\n");

  // mg index
  auto mg = cuvs_tpu::MgIndex::build("brute_force", data.data(), n, d);
  auto mres = mg.search(data.data(), nq, d, k);
  if (mres.neighbors[0] != 0) {
    std::fprintf(stderr, "FAIL mg self-nn\n");
    return 1;
  }
  std::printf("cpp mg ok\n");

  // error path: exception carries the python error text
  bool threw = false;
  try {
    cuvs_tpu::Index::build("no_such_algo", data.data(), n, d);
  } catch (const std::runtime_error& e) {
    threw = true;
    std::printf("cpp bad algo rejected: %s\n", e.what());
  }
  if (!threw) {
    std::fprintf(stderr, "FAIL: bad algo accepted\n");
    return 1;
  }

  std::printf("C++ binding test PASSED\n");
  return 0;
}
