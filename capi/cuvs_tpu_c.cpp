// cuvs_tpu C API implementation: embeds CPython and dispatches into the
// cuvs_tpu package via the capi_bridge helper module (keeps the C side to
// pointer marshalling; all logic stays in Python/JAX).
//
// Reference counterpart: /root/reference/c/src/ — the cuVS C shim that
// maps DLPack dtypes onto C++ templates. Here "dispatch" is one bridge
// call per API function; tensors travel as (address, shape) pairs.

#include "cuvs_tpu.h"

#include <Python.h>

#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>

namespace {

std::once_flag g_init_flag;
bool g_inited = false;
thread_local std::string g_last_error;

struct GIL {
  PyGILState_STATE st;
  GIL() : st(PyGILState_Ensure()) {}
  ~GIL() { PyGILState_Release(st); }
};

void set_error_from_python() {
  PyObject *type, *value, *tb;
  PyErr_Fetch(&type, &value, &tb);
  if (value) {
    PyObject* s = PyObject_Str(value);
    g_last_error = s ? PyUnicode_AsUTF8(s) : "unknown python error";
    Py_XDECREF(s);
  } else {
    g_last_error = "unknown error";
  }
  Py_XDECREF(type);
  Py_XDECREF(value);
  Py_XDECREF(tb);
}

PyObject* bridge() {
  static PyObject* mod = nullptr;
  if (!mod) mod = PyImport_ImportModule("cuvs_tpu.capi_bridge");
  return mod;
}

}  // namespace

extern "C" {

struct cuvsTpuIndex {
  PyObject* obj;  // (algo, index) tuple held by the bridge
};

cuvsTpuError_t cuvsTpuInit(const char* platform) {
  std::call_once(g_init_flag, [&] {
    if (!Py_IsInitialized()) {
      Py_InitializeEx(0);
      // release the GIL acquired by Py_Initialize so GIL{} works later
      PyEval_SaveThread();
    }
    g_inited = true;
  });
  GIL gil;
  PyObject* b = bridge();
  if (!b) {
    set_error_from_python();
    return CUVS_TPU_ERROR;
  }
  PyObject* r = PyObject_CallMethod(b, "init", "s", platform ? platform : "");
  if (!r) {
    set_error_from_python();
    return CUVS_TPU_ERROR;
  }
  Py_DECREF(r);
  return CUVS_TPU_SUCCESS;
}

const char* cuvsTpuGetLastError(void) { return g_last_error.c_str(); }

cuvsTpuError_t cuvsTpuIndexBuild(const char* algo, const char* metric,
                                 const char* params_json, const float* dataset,
                                 int64_t n_rows, int64_t dim,
                                 cuvsTpuIndex_t* out_index) {
  GIL gil;
  PyObject* b = bridge();
  if (!b) { set_error_from_python(); return CUVS_TPU_ERROR; }
  PyObject* r = PyObject_CallMethod(
      b, "build", "sssKLL", algo, metric ? metric : "sqeuclidean",
      params_json ? params_json : "{}",
      (unsigned long long)(uintptr_t)dataset, (long long)n_rows, (long long)dim);
  if (!r) { set_error_from_python(); return CUVS_TPU_ERROR; }
  auto* h = new cuvsTpuIndex;
  h->obj = r;  // owned reference
  *out_index = h;
  return CUVS_TPU_SUCCESS;
}

cuvsTpuError_t cuvsTpuIndexSearch(cuvsTpuIndex_t index, const char* params_json,
                                  const float* queries, int64_t n_queries,
                                  int64_t dim, int64_t k, float* out_distances,
                                  int32_t* out_neighbors) {
  GIL gil;
  PyObject* b = bridge();
  if (!b || !index) { set_error_from_python(); return CUVS_TPU_ERROR; }
  PyObject* r = PyObject_CallMethod(
      b, "search", "OsKLLLKK", index->obj, params_json ? params_json : "{}",
      (unsigned long long)(uintptr_t)queries, (long long)n_queries,
      (long long)dim, (long long)k,
      (unsigned long long)(uintptr_t)out_distances,
      (unsigned long long)(uintptr_t)out_neighbors);
  if (!r) { set_error_from_python(); return CUVS_TPU_ERROR; }
  Py_DECREF(r);
  return CUVS_TPU_SUCCESS;
}

namespace {
const char* dtype_name(cuvsTpuDtype_t d) {
  switch (d) {
    case CUVS_TPU_F32: return "float32";
    case CUVS_TPU_F16: return "float16";
    case CUVS_TPU_I8: return "int8";
    case CUVS_TPU_U8: return "uint8";
  }
  return "float32";
}
}  // namespace

cuvsTpuError_t cuvsTpuIndexBuildTensor(const char* algo, const char* metric,
                                       const char* params_json,
                                       const cuvsTpuTensor_t* dataset,
                                       cuvsTpuIndex_t* out_index) {
  GIL gil;
  PyObject* b = bridge();
  if (!b || !dataset) { set_error_from_python(); return CUVS_TPU_ERROR; }
  PyObject* r = PyObject_CallMethod(
      b, "build_typed", "sssKLLs", algo, metric ? metric : "sqeuclidean",
      params_json ? params_json : "{}",
      (unsigned long long)(uintptr_t)dataset->data, (long long)dataset->n_rows,
      (long long)dataset->n_cols, dtype_name(dataset->dtype));
  if (!r) { set_error_from_python(); return CUVS_TPU_ERROR; }
  auto* h = new cuvsTpuIndex;
  h->obj = r;
  *out_index = h;
  return CUVS_TPU_SUCCESS;
}

cuvsTpuError_t cuvsTpuIndexSearchTensor(cuvsTpuIndex_t index,
                                        const char* params_json,
                                        const cuvsTpuTensor_t* queries,
                                        int64_t k, float* out_distances,
                                        int32_t* out_neighbors) {
  GIL gil;
  PyObject* b = bridge();
  if (!b || !index || !queries) { set_error_from_python(); return CUVS_TPU_ERROR; }
  PyObject* r = PyObject_CallMethod(
      b, "search_typed", "OsKLLsLKK", index->obj,
      params_json ? params_json : "{}",
      (unsigned long long)(uintptr_t)queries->data, (long long)queries->n_rows,
      (long long)queries->n_cols, dtype_name(queries->dtype), (long long)k,
      (unsigned long long)(uintptr_t)out_distances,
      (unsigned long long)(uintptr_t)out_neighbors);
  if (!r) { set_error_from_python(); return CUVS_TPU_ERROR; }
  Py_DECREF(r);
  return CUVS_TPU_SUCCESS;
}

/* ---- DLPack surface ---- */

namespace {

// maps a DLDataType to the bridge's dtype name; NULL = unsupported
const char* dl_dtype_name(DLDataType t) {
  if (t.lanes != 1) return nullptr;
  if (t.code == kDLFloat && t.bits == 32) return "float32";
  if (t.code == kDLFloat && t.bits == 16) return "float16";
  if (t.code == kDLBfloat && t.bits == 16) return "bfloat16";
  if (t.code == kDLInt && t.bits == 8) return "int8";
  if (t.code == kDLUInt && t.bits == 8) return "uint8";
  if (t.code == kDLInt && t.bits == 32) return "int32";
  return nullptr;
}

// validates a 2-D compact row-major host tensor; returns data pointer
const void* dl_check_2d(const DLManagedTensor* mt, const char* what,
                        int64_t* rows, int64_t* cols) {
  if (!mt) { g_last_error = std::string(what) + ": null tensor"; return nullptr; }
  const DLTensor& t = mt->dl_tensor;
  if (t.device.device_type != kDLCPU) {
    g_last_error = std::string(what) + ": only kDLCPU host tensors accepted";
    return nullptr;
  }
  if (t.ndim != 2 || !t.shape) {
    g_last_error = std::string(what) + ": expected a 2-D tensor";
    return nullptr;
  }
  if (t.strides && (t.strides[1] != 1 || t.strides[0] != t.shape[1])) {
    g_last_error = std::string(what) + ": expected compact row-major strides";
    return nullptr;
  }
  *rows = t.shape[0];
  *cols = t.shape[1];
  return static_cast<const char*>(t.data) + t.byte_offset;
}

}  // namespace

cuvsTpuError_t cuvsTpuIndexBuildDL(const char* algo, const char* metric,
                                   const char* params_json,
                                   const DLManagedTensor* dataset,
                                   cuvsTpuIndex_t* out_index) {
  int64_t rows = 0, cols = 0;
  const void* data = dl_check_2d(dataset, "dataset", &rows, &cols);
  if (!data) return CUVS_TPU_ERROR;
  const char* dt = dl_dtype_name(dataset->dl_tensor.dtype);
  if (!dt) { g_last_error = "dataset: unsupported DLDataType"; return CUVS_TPU_ERROR; }
  GIL gil;
  PyObject* b = bridge();
  if (!b) { set_error_from_python(); return CUVS_TPU_ERROR; }
  PyObject* r = PyObject_CallMethod(
      b, "build_typed", "sssKLLs", algo, metric ? metric : "sqeuclidean",
      params_json ? params_json : "{}", (unsigned long long)(uintptr_t)data,
      (long long)rows, (long long)cols, dt);
  if (!r) { set_error_from_python(); return CUVS_TPU_ERROR; }
  auto* h = new cuvsTpuIndex;
  h->obj = r;
  *out_index = h;
  return CUVS_TPU_SUCCESS;
}

cuvsTpuError_t cuvsTpuIndexSearchDL(cuvsTpuIndex_t index,
                                    const char* params_json,
                                    const DLManagedTensor* queries,
                                    DLManagedTensor* out_distances,
                                    DLManagedTensor* out_neighbors) {
  int64_t qr = 0, qc = 0, dr = 0, dk = 0, nr = 0, nk = 0;
  const void* qdata = dl_check_2d(queries, "queries", &qr, &qc);
  const void* ddata = dl_check_2d(out_distances, "out_distances", &dr, &dk);
  const void* ndata = dl_check_2d(out_neighbors, "out_neighbors", &nr, &nk);
  if (!qdata || !ddata || !ndata) return CUVS_TPU_ERROR;
  const char* qt = dl_dtype_name(queries->dl_tensor.dtype);
  if (!qt) { g_last_error = "queries: unsupported DLDataType"; return CUVS_TPU_ERROR; }
  const DLDataType& dd = out_distances->dl_tensor.dtype;
  const DLDataType& nd = out_neighbors->dl_tensor.dtype;
  if (!(dd.code == kDLFloat && dd.bits == 32)) {
    g_last_error = "out_distances must be float32"; return CUVS_TPU_ERROR;
  }
  if (!(nd.code == kDLInt && nd.bits == 32)) {
    g_last_error = "out_neighbors must be int32"; return CUVS_TPU_ERROR;
  }
  if (dr != qr || nr != qr || dk != nk) {
    g_last_error = "output shapes must be [n_queries, k]"; return CUVS_TPU_ERROR;
  }
  GIL gil;
  PyObject* b = bridge();
  if (!b || !index) { set_error_from_python(); return CUVS_TPU_ERROR; }
  PyObject* r = PyObject_CallMethod(
      b, "search_typed", "OsKLLsLKK", index->obj,
      params_json ? params_json : "{}", (unsigned long long)(uintptr_t)qdata,
      (long long)qr, (long long)qc, qt, (long long)dk,
      (unsigned long long)(uintptr_t)ddata,
      (unsigned long long)(uintptr_t)ndata);
  if (!r) { set_error_from_python(); return CUVS_TPU_ERROR; }
  Py_DECREF(r);
  return CUVS_TPU_SUCCESS;
}

cuvsTpuError_t cuvsTpuIndexSearchFilteredDL(cuvsTpuIndex_t index,
                                            const char* params_json,
                                            const DLManagedTensor* queries,
                                            const cuvsTpuFilter_t* filter,
                                            DLManagedTensor* out_distances,
                                            DLManagedTensor* out_neighbors) {
  if (!filter || filter->type == CUVS_TPU_FILTER_NONE)
    return cuvsTpuIndexSearchDL(index, params_json, queries, out_distances,
                                out_neighbors);
  int64_t qr = 0, qc = 0, dr = 0, dk = 0, nr = 0, nk = 0;
  const void* qdata = dl_check_2d(queries, "queries", &qr, &qc);
  const void* ddata = dl_check_2d(out_distances, "out_distances", &dr, &dk);
  const void* ndata = dl_check_2d(out_neighbors, "out_neighbors", &nr, &nk);
  if (!qdata || !ddata || !ndata) return CUVS_TPU_ERROR;
  const char* qt = dl_dtype_name(queries->dl_tensor.dtype);
  if (!qt) { g_last_error = "queries: unsupported DLDataType"; return CUVS_TPU_ERROR; }
  if (!filter->words || filter->n_words <= 0) {
    g_last_error = "filter: null/empty words buffer"; return CUVS_TPU_ERROR;
  }
  if (filter->type == CUVS_TPU_FILTER_BITMAP && filter->n_words % qr != 0) {
    g_last_error = "bitmap filter: n_words must be n_queries * words_per_row";
    return CUVS_TPU_ERROR;
  }
  GIL gil;
  PyObject* b = bridge();
  if (!b || !index) { set_error_from_python(); return CUVS_TPU_ERROR; }
  PyObject* r = PyObject_CallMethod(
      b, "search_filtered", "OsKLLsLiKKKK", index->obj,
      params_json ? params_json : "{}", (unsigned long long)(uintptr_t)qdata,
      (long long)qr, (long long)qc, qt, (long long)dk, (int)filter->type,
      (unsigned long long)(uintptr_t)filter->words,
      (unsigned long long)filter->n_words,
      (unsigned long long)(uintptr_t)ddata,
      (unsigned long long)(uintptr_t)ndata);
  if (!r) { set_error_from_python(); return CUVS_TPU_ERROR; }
  Py_DECREF(r);
  return CUVS_TPU_SUCCESS;
}

/* ---- per-algo param structs ---- */

void cuvsTpuIvfFlatIndexParamsDefault(cuvsTpuIvfFlatIndexParams_t* p) {
  p->n_lists = 1024;
  p->kmeans_n_iters = 20;
  p->kmeans_trainset_fraction = 0.5;
  p->adaptive_centers = 0;
  p->add_data_on_build = 1;
}
void cuvsTpuIvfFlatSearchParamsDefault(cuvsTpuIvfFlatSearchParams_t* p) {
  p->n_probes = 20;
  p->recall_target = 0.0;
}
void cuvsTpuIvfPqIndexParamsDefault(cuvsTpuIvfPqIndexParams_t* p) {
  p->n_lists = 1024;
  p->pq_dim = 0;
  p->pq_bits = 8;
  p->kmeans_n_iters = 20;
  p->force_random_rotation = 0;
  p->codebook_kind = "per_subspace";
}
void cuvsTpuIvfPqSearchParamsDefault(cuvsTpuIvfPqSearchParams_t* p) {
  p->n_probes = 20;
  p->recall_target = 0.0;
  p->lut_dtype = nullptr;  /* full-precision LUT */
}
void cuvsTpuCagraIndexParamsDefault(cuvsTpuCagraIndexParams_t* p) {
  p->intermediate_graph_degree = 128;
  p->graph_degree = 64;
  p->build_algo = "auto";
  p->guarantee_connectivity = 0;
}
void cuvsTpuCagraSearchParamsDefault(cuvsTpuCagraSearchParams_t* p) {
  p->itopk_size = 64;
  p->search_width = 1;
  p->max_iterations = 0;
}
void cuvsTpuVamanaIndexParamsDefault(cuvsTpuVamanaIndexParams_t* p) {
  p->graph_degree = 32;
  p->visited_size = 64;
  p->alpha = 1.2;
  p->max_fraction = 0.06;
}
void cuvsTpuVamanaSearchParamsDefault(cuvsTpuVamanaSearchParams_t* p) {
  p->itopk_size = 64;
  p->search_width = 1;
}
void cuvsTpuNnDescentParamsDefault(cuvsTpuNnDescentParams_t* p) {
  p->graph_degree = 64;
  p->intermediate_graph_degree = 128;
  p->max_iterations = 20;
  p->termination_threshold = 1e-4;
}
void cuvsTpuAllNeighborsParamsDefault(cuvsTpuAllNeighborsParams_t* p) {
  p->algo = "auto";
  p->n_clusters = 1;
  p->overlap_factor = 2;
}
void cuvsTpuTieredIndexParamsDefault(cuvsTpuTieredIndexParams_t* p) {
  p->upstream_algo = "cagra";
  p->upstream_params_json = nullptr;
  p->min_ann_rows = 100000;
}
void cuvsTpuHnswParamsDefault(cuvsTpuHnswParams_t* p) {
  p->hierarchy = "none";
  p->ef_construction = 200;
}
void cuvsTpuHnswSearchParamsDefault(cuvsTpuHnswSearchParams_t* p) {
  p->ef = 64;
}
void cuvsTpuMgIndexParamsDefault(cuvsTpuMgIndexParams_t* p) {
  p->mode = "sharded";
  p->distributed_build = "auto";
}
void cuvsTpuMgSearchParamsDefault(cuvsTpuMgSearchParams_t* p) {
  p->routing = "load_balancer";
}

cuvsTpuError_t cuvsTpuIvfFlatBuild(const cuvsTpuIvfFlatIndexParams_t* p,
                                   const char* metric,
                                   const DLManagedTensor* dataset,
                                   cuvsTpuIndex_t* out_index) {
  char js[256];
  std::snprintf(js, sizeof(js),
                "{\"n_lists\": %lld, \"kmeans_n_iters\": %lld, "
                "\"kmeans_trainset_fraction\": %g, \"adaptive_centers\": %s, "
                "\"add_data_on_build\": %s}",
                (long long)p->n_lists, (long long)p->kmeans_n_iters,
                p->kmeans_trainset_fraction,
                p->adaptive_centers ? "true" : "false",
                p->add_data_on_build ? "true" : "false");
  return cuvsTpuIndexBuildDL("ivf_flat", metric, js, dataset, out_index);
}

cuvsTpuError_t cuvsTpuIvfFlatSearch(cuvsTpuIndex_t index,
                                    const cuvsTpuIvfFlatSearchParams_t* p,
                                    const DLManagedTensor* queries,
                                    DLManagedTensor* out_distances,
                                    DLManagedTensor* out_neighbors) {
  char js[160];
  if (p->recall_target > 0)
    std::snprintf(js, sizeof(js), "{\"n_probes\": %lld, \"recall_target\": %g}",
                  (long long)p->n_probes, p->recall_target);
  else
    std::snprintf(js, sizeof(js), "{\"n_probes\": %lld}", (long long)p->n_probes);
  return cuvsTpuIndexSearchDL(index, js, queries, out_distances, out_neighbors);
}

cuvsTpuError_t cuvsTpuIvfPqBuild(const cuvsTpuIvfPqIndexParams_t* p,
                                 const char* metric,
                                 const DLManagedTensor* dataset,
                                 cuvsTpuIndex_t* out_index) {
  char js[320];
  std::snprintf(js, sizeof(js),
                "{\"n_lists\": %lld, \"pq_dim\": %lld, \"pq_bits\": %lld, "
                "\"kmeans_n_iters\": %lld, \"force_random_rotation\": %s, "
                "\"codebook_gen\": \"%s\"}",
                (long long)p->n_lists, (long long)p->pq_dim,
                (long long)p->pq_bits, (long long)p->kmeans_n_iters,
                p->force_random_rotation ? "true" : "false",
                p->codebook_kind ? p->codebook_kind : "per_subspace");
  return cuvsTpuIndexBuildDL("ivf_pq", metric, js, dataset, out_index);
}

cuvsTpuError_t cuvsTpuIvfPqSearch(cuvsTpuIndex_t index,
                                  const cuvsTpuIvfPqSearchParams_t* p,
                                  const DLManagedTensor* queries,
                                  DLManagedTensor* out_distances,
                                  DLManagedTensor* out_neighbors) {
  char js[224];
  int n = std::snprintf(js, sizeof(js), "{\"n_probes\": %lld",
                        (long long)p->n_probes);
  if (p->recall_target > 0)
    n += std::snprintf(js + n, sizeof(js) - n, ", \"recall_target\": %g",
                       p->recall_target);
  if (p->lut_dtype && *p->lut_dtype)
    n += std::snprintf(js + n, sizeof(js) - n, ", \"lut_dtype\": \"%s\"",
                       p->lut_dtype);
  std::snprintf(js + n, sizeof(js) - n, "}");
  return cuvsTpuIndexSearchDL(index, js, queries, out_distances, out_neighbors);
}

cuvsTpuError_t cuvsTpuCagraBuild(const cuvsTpuCagraIndexParams_t* p,
                                 const char* metric,
                                 const DLManagedTensor* dataset,
                                 cuvsTpuIndex_t* out_index) {
  char js[320];
  std::snprintf(js, sizeof(js),
                "{\"intermediate_graph_degree\": %lld, \"graph_degree\": %lld, "
                "\"build_algo\": \"%s\", \"guarantee_connectivity\": %s}",
                (long long)p->intermediate_graph_degree,
                (long long)p->graph_degree,
                p->build_algo ? p->build_algo : "auto",
                p->guarantee_connectivity ? "true" : "false");
  return cuvsTpuIndexBuildDL("cagra", metric, js, dataset, out_index);
}

cuvsTpuError_t cuvsTpuCagraSearch(cuvsTpuIndex_t index,
                                  const cuvsTpuCagraSearchParams_t* p,
                                  const DLManagedTensor* queries,
                                  DLManagedTensor* out_distances,
                                  DLManagedTensor* out_neighbors) {
  char js[200];
  if (p->max_iterations > 0)
    std::snprintf(js, sizeof(js),
                  "{\"itopk_size\": %lld, \"search_width\": %lld, "
                  "\"max_iterations\": %lld}",
                  (long long)p->itopk_size, (long long)p->search_width,
                  (long long)p->max_iterations);
  else
    std::snprintf(js, sizeof(js),
                  "{\"itopk_size\": %lld, \"search_width\": %lld}",
                  (long long)p->itopk_size, (long long)p->search_width);
  return cuvsTpuIndexSearchDL(index, js, queries, out_distances, out_neighbors);
}

cuvsTpuError_t cuvsTpuVamanaBuild(const cuvsTpuVamanaIndexParams_t* p,
                                  const char* metric,
                                  const DLManagedTensor* dataset,
                                  cuvsTpuIndex_t* out_index) {
  char js[256];
  std::snprintf(js, sizeof(js),
                "{\"graph_degree\": %lld, \"visited_size\": %lld, "
                "\"alpha\": %g, \"max_fraction\": %g}",
                (long long)p->graph_degree, (long long)p->visited_size,
                p->alpha, p->max_fraction);
  return cuvsTpuIndexBuildDL("vamana", metric, js, dataset, out_index);
}

cuvsTpuError_t cuvsTpuVamanaSearch(cuvsTpuIndex_t index,
                                   const cuvsTpuVamanaSearchParams_t* p,
                                   const DLManagedTensor* queries,
                                   DLManagedTensor* out_distances,
                                   DLManagedTensor* out_neighbors) {
  char js[160];
  std::snprintf(js, sizeof(js),
                "{\"itopk_size\": %lld, \"search_width\": %lld}",
                (long long)p->itopk_size, (long long)p->search_width);
  return cuvsTpuIndexSearchDL(index, js, queries, out_distances, out_neighbors);
}

cuvsTpuError_t cuvsTpuVamanaSerialize(cuvsTpuIndex_t index, const char* path) {
  GIL gil;
  PyObject* b = bridge();
  if (!b || !index) { set_error_from_python(); return CUVS_TPU_ERROR; }
  PyObject* r = PyObject_CallMethod(b, "vamana_serialize", "Os", index->obj, path);
  if (!r) { set_error_from_python(); return CUVS_TPU_ERROR; }
  Py_DECREF(r);
  return CUVS_TPU_SUCCESS;
}

namespace {

// shared body for the two k-NN-graph builders: validates outputs and
// dispatches to the bridge's knn_graph entry
cuvsTpuError_t knn_graph_build(const char* kind, const char* params_js,
                               const char* metric, int64_t k,
                               const DLManagedTensor* dataset,
                               DLManagedTensor* out_graph,
                               DLManagedTensor* out_distances) {
  int64_t xr = 0, xc = 0, gr = 0, gk = 0;
  const void* xdata = dl_check_2d(dataset, "dataset", &xr, &xc);
  const void* gdata = dl_check_2d(out_graph, "out_graph", &gr, &gk);
  if (!xdata || !gdata) return CUVS_TPU_ERROR;
  const char* xt = dl_dtype_name(dataset->dl_tensor.dtype);
  if (!xt) { g_last_error = "dataset: unsupported DLDataType"; return CUVS_TPU_ERROR; }
  const DLDataType& gd = out_graph->dl_tensor.dtype;
  if (!(gd.code == kDLInt && gd.bits == 32)) {
    g_last_error = "out_graph must be int32"; return CUVS_TPU_ERROR;
  }
  if (gr != xr || (k > 0 && gk != k)) {
    g_last_error = "out_graph must be [n_rows, k]"; return CUVS_TPU_ERROR;
  }
  uintptr_t dptr = 0;
  if (out_distances) {
    int64_t dr = 0, dk = 0;
    const void* dd = dl_check_2d(out_distances, "out_distances", &dr, &dk);
    if (!dd) return CUVS_TPU_ERROR;
    const DLDataType& dt = out_distances->dl_tensor.dtype;
    if (!(dt.code == kDLFloat && dt.bits == 32)) {
      g_last_error = "out_distances must be float32"; return CUVS_TPU_ERROR;
    }
    if (dr != gr || dk != gk) {
      g_last_error = "out_distances must match out_graph shape";
      return CUVS_TPU_ERROR;
    }
    dptr = (uintptr_t)dd;
  }
  GIL gil;
  PyObject* b = bridge();
  if (!b) { set_error_from_python(); return CUVS_TPU_ERROR; }
  PyObject* r = PyObject_CallMethod(
      b, "knn_graph", "sssKLLsLKK", kind, metric ? metric : "sqeuclidean",
      params_js, (unsigned long long)(uintptr_t)xdata, (long long)xr,
      (long long)xc, xt, (long long)gk,
      (unsigned long long)(uintptr_t)gdata, (unsigned long long)dptr);
  if (!r) { set_error_from_python(); return CUVS_TPU_ERROR; }
  Py_DECREF(r);
  return CUVS_TPU_SUCCESS;
}

}  // namespace

cuvsTpuError_t cuvsTpuNnDescentBuild(const cuvsTpuNnDescentParams_t* p,
                                     const char* metric,
                                     const DLManagedTensor* dataset,
                                     DLManagedTensor* out_graph,
                                     DLManagedTensor* out_distances) {
  char js[256];
  std::snprintf(js, sizeof(js),
                "{\"graph_degree\": %lld, \"intermediate_graph_degree\": %lld, "
                "\"max_iterations\": %lld, \"termination_threshold\": %g}",
                (long long)p->graph_degree,
                (long long)p->intermediate_graph_degree,
                (long long)p->max_iterations, p->termination_threshold);
  return knn_graph_build("nn_descent", js, metric, p->graph_degree, dataset,
                         out_graph, out_distances);
}

cuvsTpuError_t cuvsTpuAllNeighborsBuild(const cuvsTpuAllNeighborsParams_t* p,
                                        const char* metric, int64_t k,
                                        const DLManagedTensor* dataset,
                                        DLManagedTensor* out_graph,
                                        DLManagedTensor* out_distances) {
  char js[256];
  std::snprintf(js, sizeof(js),
                "{\"algo\": \"%s\", \"n_clusters\": %lld, "
                "\"overlap_factor\": %lld}",
                p->algo ? p->algo : "auto", (long long)p->n_clusters,
                (long long)p->overlap_factor);
  return knn_graph_build("all_neighbors", js, metric, k, dataset, out_graph,
                         out_distances);
}

cuvsTpuError_t cuvsTpuRefine(const char* metric,
                             const DLManagedTensor* dataset,
                             const DLManagedTensor* queries,
                             const DLManagedTensor* candidates, int64_t k,
                             DLManagedTensor* out_distances,
                             DLManagedTensor* out_neighbors) {
  int64_t xr = 0, xc = 0, qr = 0, qc = 0, cr = 0, cc = 0, dr = 0, dk = 0,
          nr = 0, nk = 0;
  const void* xdata = dl_check_2d(dataset, "dataset", &xr, &xc);
  const void* qdata = dl_check_2d(queries, "queries", &qr, &qc);
  const void* cdata = dl_check_2d(candidates, "candidates", &cr, &cc);
  const void* ddata = dl_check_2d(out_distances, "out_distances", &dr, &dk);
  const void* ndata = dl_check_2d(out_neighbors, "out_neighbors", &nr, &nk);
  if (!xdata || !qdata || !cdata || !ddata || !ndata) return CUVS_TPU_ERROR;
  const char* xt = dl_dtype_name(dataset->dl_tensor.dtype);
  const char* qt = dl_dtype_name(queries->dl_tensor.dtype);
  if (!xt || !qt) { g_last_error = "unsupported DLDataType"; return CUVS_TPU_ERROR; }
  const DLDataType& ct = candidates->dl_tensor.dtype;
  if (!(ct.code == kDLInt && ct.bits == 32)) {
    g_last_error = "candidates must be int32"; return CUVS_TPU_ERROR;
  }
  if (cr != qr || dr != qr || nr != qr || dk != k || nk != k || cc < k) {
    g_last_error = "refine: shape mismatch (need candidates [nq, c>=k], "
                   "outputs [nq, k])";
    return CUVS_TPU_ERROR;
  }
  GIL gil;
  PyObject* b = bridge();
  if (!b) { set_error_from_python(); return CUVS_TPU_ERROR; }
  PyObject* r = PyObject_CallMethod(
      b, "refine", "sKLLsKLLsKLLLKK", metric ? metric : "sqeuclidean",
      (unsigned long long)(uintptr_t)xdata, (long long)xr, (long long)xc, xt,
      (unsigned long long)(uintptr_t)qdata, (long long)qr, (long long)qc, qt,
      (unsigned long long)(uintptr_t)cdata, (long long)cr, (long long)cc,
      (long long)k, (unsigned long long)(uintptr_t)ddata,
      (unsigned long long)(uintptr_t)ndata);
  if (!r) { set_error_from_python(); return CUVS_TPU_ERROR; }
  Py_DECREF(r);
  return CUVS_TPU_SUCCESS;
}

cuvsTpuError_t cuvsTpuTieredBuild(const cuvsTpuTieredIndexParams_t* p,
                                  const char* metric,
                                  const DLManagedTensor* dataset,
                                  cuvsTpuIndex_t* out_index) {
  int64_t rows = 0, cols = 0;
  const void* data = dl_check_2d(dataset, "dataset", &rows, &cols);
  if (!data) return CUVS_TPU_ERROR;
  const char* dt = dl_dtype_name(dataset->dl_tensor.dtype);
  if (!dt) { g_last_error = "dataset: unsupported DLDataType"; return CUVS_TPU_ERROR; }
  GIL gil;
  PyObject* b = bridge();
  if (!b) { set_error_from_python(); return CUVS_TPU_ERROR; }
  PyObject* r = PyObject_CallMethod(
      b, "tiered_build", "sssLKLLs", p->upstream_algo ? p->upstream_algo : "cagra",
      metric ? metric : "sqeuclidean",
      p->upstream_params_json ? p->upstream_params_json : "{}",
      (long long)p->min_ann_rows, (unsigned long long)(uintptr_t)data,
      (long long)rows, (long long)cols, dt);
  if (!r) { set_error_from_python(); return CUVS_TPU_ERROR; }
  auto* h = new cuvsTpuIndex;
  h->obj = r;
  *out_index = h;
  return CUVS_TPU_SUCCESS;
}

cuvsTpuError_t cuvsTpuTieredCompact(cuvsTpuIndex_t index) {
  GIL gil;
  PyObject* b = bridge();
  if (!b || !index) { set_error_from_python(); return CUVS_TPU_ERROR; }
  // "(O)" (not "O"): the handle is a tuple, and Py_BuildValue("O", tuple)
  // would splat it as the argument list
  PyObject* r = PyObject_CallMethod(b, "tiered_compact", "(O)", index->obj);
  if (!r) { set_error_from_python(); return CUVS_TPU_ERROR; }
  Py_XDECREF(index->obj);
  index->obj = r;
  return CUVS_TPU_SUCCESS;
}

cuvsTpuError_t cuvsTpuHnswFromCagra(cuvsTpuIndex_t cagra_index,
                                    const cuvsTpuHnswParams_t* p,
                                    const char* path) {
  GIL gil;
  PyObject* b = bridge();
  if (!b || !cagra_index) { set_error_from_python(); return CUVS_TPU_ERROR; }
  PyObject* r = PyObject_CallMethod(
      b, "hnsw_from_cagra", "OssL", cagra_index->obj, path,
      p && p->hierarchy ? p->hierarchy : "none",
      (long long)(p ? p->ef_construction : 200));
  if (!r) { set_error_from_python(); return CUVS_TPU_ERROR; }
  Py_DECREF(r);
  return CUVS_TPU_SUCCESS;
}

cuvsTpuError_t cuvsTpuHnswLoad(const char* path, const char* metric,
                               cuvsTpuIndex_t* out_index) {
  GIL gil;
  PyObject* b = bridge();
  if (!b) { set_error_from_python(); return CUVS_TPU_ERROR; }
  PyObject* r = PyObject_CallMethod(b, "hnsw_load", "ss", path,
                                    metric ? metric : "sqeuclidean");
  if (!r) { set_error_from_python(); return CUVS_TPU_ERROR; }
  auto* h = new cuvsTpuIndex;
  h->obj = r;
  *out_index = h;
  return CUVS_TPU_SUCCESS;
}

cuvsTpuError_t cuvsTpuHnswSearch(cuvsTpuIndex_t index,
                                 const cuvsTpuHnswSearchParams_t* p,
                                 const DLManagedTensor* queries,
                                 DLManagedTensor* out_distances,
                                 DLManagedTensor* out_neighbors) {
  char js[64];
  std::snprintf(js, sizeof(js), "{\"ef\": %lld}", (long long)(p ? p->ef : 64));
  return cuvsTpuIndexSearchDL(index, js, queries, out_distances, out_neighbors);
}

void cuvsTpuClearLastError(void) { g_last_error.clear(); }

cuvsTpuError_t cuvsTpuSync(void) {
  GIL gil;
  PyObject* b = bridge();
  if (!b) { set_error_from_python(); return CUVS_TPU_ERROR; }
  PyObject* r = PyObject_CallMethod(b, "sync", nullptr);
  if (!r) { set_error_from_python(); return CUVS_TPU_ERROR; }
  Py_DECREF(r);
  return CUVS_TPU_SUCCESS;
}

cuvsTpuError_t cuvsTpuIndexExtend(cuvsTpuIndex_t index,
                                  const cuvsTpuTensor_t* new_rows) {
  GIL gil;
  PyObject* b = bridge();
  if (!b || !index || !new_rows) { set_error_from_python(); return CUVS_TPU_ERROR; }
  PyObject* r = PyObject_CallMethod(
      b, "extend", "OKLLs", index->obj,
      (unsigned long long)(uintptr_t)new_rows->data, (long long)new_rows->n_rows,
      (long long)new_rows->n_cols, dtype_name(new_rows->dtype));
  if (!r) { set_error_from_python(); return CUVS_TPU_ERROR; }
  // extend returns the REPLACED handle tuple; swap it in
  Py_XDECREF(index->obj);
  index->obj = r;
  return CUVS_TPU_SUCCESS;
}

struct cuvsTpuMgIndex {
  PyObject* obj;
};

cuvsTpuError_t cuvsTpuMgBuild(const char* algo, const char* mode,
                              const char* metric, const char* params_json,
                              const cuvsTpuTensor_t* dataset,
                              cuvsTpuMgIndex_t* out_index) {
  GIL gil;
  PyObject* b = bridge();
  if (!b || !dataset) { set_error_from_python(); return CUVS_TPU_ERROR; }
  PyObject* r = PyObject_CallMethod(
      b, "mg_build", "ssssKLLs", algo, mode ? mode : "sharded",
      metric ? metric : "sqeuclidean", params_json ? params_json : "{}",
      (unsigned long long)(uintptr_t)dataset->data, (long long)dataset->n_rows,
      (long long)dataset->n_cols, dtype_name(dataset->dtype));
  if (!r) { set_error_from_python(); return CUVS_TPU_ERROR; }
  auto* h = new cuvsTpuMgIndex;
  h->obj = r;
  *out_index = h;
  return CUVS_TPU_SUCCESS;
}

cuvsTpuError_t cuvsTpuMgSearch(cuvsTpuMgIndex_t index, const char* params_json,
                               const cuvsTpuTensor_t* queries, int64_t k,
                               float* out_distances, int32_t* out_neighbors) {
  GIL gil;
  PyObject* b = bridge();
  if (!b || !index || !queries) { set_error_from_python(); return CUVS_TPU_ERROR; }
  PyObject* r = PyObject_CallMethod(
      b, "mg_search", "OsKLLsLKK", index->obj,
      params_json ? params_json : "{}",
      (unsigned long long)(uintptr_t)queries->data, (long long)queries->n_rows,
      (long long)queries->n_cols, dtype_name(queries->dtype), (long long)k,
      (unsigned long long)(uintptr_t)out_distances,
      (unsigned long long)(uintptr_t)out_neighbors);
  if (!r) { set_error_from_python(); return CUVS_TPU_ERROR; }
  Py_DECREF(r);
  return CUVS_TPU_SUCCESS;
}

cuvsTpuError_t cuvsTpuMgSerialize(cuvsTpuMgIndex_t index, const char* path) {
  GIL gil;
  PyObject* b = bridge();
  if (!b || !index) { set_error_from_python(); return CUVS_TPU_ERROR; }
  PyObject* r = PyObject_CallMethod(b, "mg_serialize", "Os", index->obj, path);
  if (!r) { set_error_from_python(); return CUVS_TPU_ERROR; }
  Py_DECREF(r);
  return CUVS_TPU_SUCCESS;
}

cuvsTpuError_t cuvsTpuMgDeserialize(const char* path, cuvsTpuMgIndex_t* out) {
  GIL gil;
  PyObject* b = bridge();
  if (!b) { set_error_from_python(); return CUVS_TPU_ERROR; }
  PyObject* r = PyObject_CallMethod(b, "mg_deserialize", "s", path);
  if (!r) { set_error_from_python(); return CUVS_TPU_ERROR; }
  auto* h = new cuvsTpuMgIndex;
  h->obj = r;
  *out = h;
  return CUVS_TPU_SUCCESS;
}

cuvsTpuError_t cuvsTpuMgDestroy(cuvsTpuMgIndex_t index) {
  if (!index) return CUVS_TPU_SUCCESS;
  GIL gil;
  Py_XDECREF(index->obj);
  delete index;
  return CUVS_TPU_SUCCESS;
}

cuvsTpuError_t cuvsTpuIndexSerialize(cuvsTpuIndex_t index, const char* path) {
  GIL gil;
  PyObject* b = bridge();
  if (!b || !index) { set_error_from_python(); return CUVS_TPU_ERROR; }
  PyObject* r = PyObject_CallMethod(b, "serialize", "Os", index->obj, path);
  if (!r) { set_error_from_python(); return CUVS_TPU_ERROR; }
  Py_DECREF(r);
  return CUVS_TPU_SUCCESS;
}

cuvsTpuError_t cuvsTpuIndexDeserialize(const char* path, cuvsTpuIndex_t* out) {
  GIL gil;
  PyObject* b = bridge();
  if (!b) { set_error_from_python(); return CUVS_TPU_ERROR; }
  PyObject* r = PyObject_CallMethod(b, "deserialize", "s", path);
  if (!r) { set_error_from_python(); return CUVS_TPU_ERROR; }
  auto* h = new cuvsTpuIndex;
  h->obj = r;
  *out = h;
  return CUVS_TPU_SUCCESS;
}

cuvsTpuError_t cuvsTpuIndexDestroy(cuvsTpuIndex_t index) {
  if (!index) return CUVS_TPU_SUCCESS;
  GIL gil;
  Py_XDECREF(index->obj);
  delete index;
  return CUVS_TPU_SUCCESS;
}

}  // extern "C"
