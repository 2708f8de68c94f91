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
