/* cuvs_tpu C API — ABI-stable FFI over the TPU vector-search library.
 *
 * Reference counterpart: the cuVS C API (/root/reference/c/include/cuvs/
 * core/c_api.h — cuvsResources_t, cuvsError_t + thread-local last error,
 * per-algo create/build/search/destroy). Here the engine is JAX, so the C
 * layer embeds a Python interpreter once per process and dispatches into
 * the cuvs_tpu package; tensors cross the boundary as raw host pointers
 * (row-major) with explicit shapes — the moral equivalent of the DLPack
 * structs the reference uses.
 *
 * Thread-safety: calls serialize on the embedded interpreter's GIL.
 */

#ifndef CUVS_TPU_C_API_H
#define CUVS_TPU_C_API_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef enum { CUVS_TPU_SUCCESS = 0, CUVS_TPU_ERROR = 1 } cuvsTpuError_t;

typedef struct cuvsTpuIndex* cuvsTpuIndex_t;

/* Initialize the runtime (idempotent). platform: "tpu", "cpu" or NULL. */
cuvsTpuError_t cuvsTpuInit(const char* platform);

/* Last error message for this thread (valid until the next API call). */
const char* cuvsTpuGetLastError(void);

/* Build an index over a row-major float32 [n_rows, dim] host buffer.
 * algo: "brute_force" | "ivf_flat" | "ivf_pq" | "cagra" | "ivf_sq".
 * params_json: algo build params as JSON (e.g. "{\"n_lists\": 256}"), may
 * be NULL. metric: "sqeuclidean" | "euclidean" | "inner_product" | ... */
cuvsTpuError_t cuvsTpuIndexBuild(const char* algo,
                                 const char* metric,
                                 const char* params_json,
                                 const float* dataset,
                                 int64_t n_rows,
                                 int64_t dim,
                                 cuvsTpuIndex_t* out_index);

/* Search k neighbors for [n_queries, dim] queries. Outputs are row-major
 * [n_queries, k] buffers owned by the caller. params_json may be NULL. */
cuvsTpuError_t cuvsTpuIndexSearch(cuvsTpuIndex_t index,
                                  const char* params_json,
                                  const float* queries,
                                  int64_t n_queries,
                                  int64_t dim,
                                  int64_t k,
                                  float* out_distances,
                                  int32_t* out_neighbors);

/* Serialize / deserialize (npz container with validated header). */
cuvsTpuError_t cuvsTpuIndexSerialize(cuvsTpuIndex_t index, const char* path);
cuvsTpuError_t cuvsTpuIndexDeserialize(const char* path, cuvsTpuIndex_t* out);

cuvsTpuError_t cuvsTpuIndexDestroy(cuvsTpuIndex_t index);

#ifdef __cplusplus
}
#endif

#endif /* CUVS_TPU_C_API_H */
