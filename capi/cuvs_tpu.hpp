/* cuvs_tpu C++ binding: header-only RAII wrapper over the C ABI.
 *
 * Reference counterpart: the safe Rust crate over cuvs-sys
 * (/root/reference/rust/cuvs/src/ — Resources + per-algo Index types with
 * build/search/serialize) and the Java Panama binding's CuVSIndex shape.
 * Rust/Go/Java toolchains are not available in this environment, so C++
 * is the supported non-Python binding; the API shape mirrors the Rust
 * crate: exceptions carry cuvsTpuGetLastError(), handles are move-only
 * RAII, tensors are std::vector + explicit shape.
 *
 * Usage:
 *   cuvs_tpu::init("cpu");
 *   auto index = cuvs_tpu::Index::build("cagra", data, n, d);
 *   auto res = index.search(queries, nq, d, k);
 */

#ifndef CUVS_TPU_CPP_BINDING_HPP
#define CUVS_TPU_CPP_BINDING_HPP

#include <cstdint>
#include <stdexcept>
#include <string>
#include <utility>
#include <vector>

#include "cuvs_tpu.h"

namespace cuvs_tpu {

inline void check(cuvsTpuError_t err, const char* what) {
  if (err != CUVS_TPU_SUCCESS) {
    throw std::runtime_error(std::string(what) + ": " + cuvsTpuGetLastError());
  }
}

inline void init(const std::string& platform = "") {
  check(cuvsTpuInit(platform.empty() ? nullptr : platform.c_str()), "init");
}

struct SearchResult {
  std::vector<float> distances;   // [n_queries * k] row-major
  std::vector<int32_t> neighbors; // [n_queries * k]
  int64_t n_queries = 0;
  int64_t k = 0;
};

template <typename T>
constexpr cuvsTpuDtype_t dtype_of();
template <> constexpr cuvsTpuDtype_t dtype_of<float>() { return CUVS_TPU_F32; }
template <> constexpr cuvsTpuDtype_t dtype_of<int8_t>() { return CUVS_TPU_I8; }
template <> constexpr cuvsTpuDtype_t dtype_of<uint8_t>() { return CUVS_TPU_U8; }

class Index {
 public:
  Index() = default;
  Index(const Index&) = delete;
  Index& operator=(const Index&) = delete;
  Index(Index&& o) noexcept : handle_(o.handle_) { o.handle_ = nullptr; }
  Index& operator=(Index&& o) noexcept {
    std::swap(handle_, o.handle_);
    return *this;
  }
  ~Index() {
    if (handle_) cuvsTpuIndexDestroy(handle_);
  }

  /* Build from a row-major [n_rows, dim] host buffer of T. */
  template <typename T = float>
  static Index build(const std::string& algo, const T* data, int64_t n_rows,
                     int64_t dim, const std::string& metric = "sqeuclidean",
                     const std::string& params_json = "{}") {
    Index ix;
    cuvsTpuTensor_t t{data, dtype_of<T>(), n_rows, dim};
    check(cuvsTpuIndexBuildTensor(algo.c_str(), metric.c_str(),
                                  params_json.c_str(), &t, &ix.handle_),
          "build");
    return ix;
  }

  template <typename T = float>
  SearchResult search(const T* queries, int64_t n_queries, int64_t dim,
                      int64_t k, const std::string& params_json = "{}") const {
    SearchResult r;
    r.n_queries = n_queries;
    r.k = k;
    r.distances.resize(n_queries * k);
    r.neighbors.resize(n_queries * k);
    cuvsTpuTensor_t t{queries, dtype_of<T>(), n_queries, dim};
    check(cuvsTpuIndexSearchTensor(handle_, params_json.c_str(), &t, k,
                                   r.distances.data(), r.neighbors.data()),
          "search");
    return r;
  }

  template <typename T = float>
  void extend(const T* rows, int64_t n_rows, int64_t dim) {
    cuvsTpuTensor_t t{rows, dtype_of<T>(), n_rows, dim};
    check(cuvsTpuIndexExtend(handle_, &t), "extend");
  }

  void serialize(const std::string& path) const {
    check(cuvsTpuIndexSerialize(handle_, path.c_str()), "serialize");
  }

  static Index deserialize(const std::string& path) {
    Index ix;
    check(cuvsTpuIndexDeserialize(path.c_str(), &ix.handle_), "deserialize");
    return ix;
  }

 private:
  cuvsTpuIndex_t handle_ = nullptr;
};

/* Multi-chip index over the local device mesh (mg_cagra.h analog). */
class MgIndex {
 public:
  MgIndex() = default;
  MgIndex(const MgIndex&) = delete;
  MgIndex& operator=(const MgIndex&) = delete;
  MgIndex(MgIndex&& o) noexcept : handle_(o.handle_) { o.handle_ = nullptr; }
  MgIndex& operator=(MgIndex&& o) noexcept {
    std::swap(handle_, o.handle_);
    return *this;
  }
  ~MgIndex() {
    if (handle_) cuvsTpuMgDestroy(handle_);
  }

  template <typename T = float>
  static MgIndex build(const std::string& algo, const T* data, int64_t n_rows,
                       int64_t dim, const std::string& mode = "sharded",
                       const std::string& metric = "sqeuclidean",
                       const std::string& params_json = "{}") {
    MgIndex ix;
    cuvsTpuTensor_t t{data, dtype_of<T>(), n_rows, dim};
    check(cuvsTpuMgBuild(algo.c_str(), mode.c_str(), metric.c_str(),
                         params_json.c_str(), &t, &ix.handle_),
          "mg_build");
    return ix;
  }

  template <typename T = float>
  SearchResult search(const T* queries, int64_t n_queries, int64_t dim,
                      int64_t k, const std::string& params_json = "{}") const {
    SearchResult r;
    r.n_queries = n_queries;
    r.k = k;
    r.distances.resize(n_queries * k);
    r.neighbors.resize(n_queries * k);
    cuvsTpuTensor_t t{queries, dtype_of<T>(), n_queries, dim};
    check(cuvsTpuMgSearch(handle_, params_json.c_str(), &t, k,
                          r.distances.data(), r.neighbors.data()),
          "mg_search");
    return r;
  }

  void serialize(const std::string& path) const {
    check(cuvsTpuMgSerialize(handle_, path.c_str()), "mg_serialize");
  }

  static MgIndex deserialize(const std::string& path) {
    MgIndex ix;
    check(cuvsTpuMgDeserialize(path.c_str(), &ix.handle_), "mg_deserialize");
    return ix;
  }

 private:
  cuvsTpuMgIndex_t handle_ = nullptr;
};

}  // namespace cuvs_tpu

#endif  // CUVS_TPU_CPP_BINDING_HPP
