/* cuvs_tpu C API — ABI-stable FFI over the TPU vector-search library.
 *
 * Reference counterpart: the cuVS C API (/root/reference/c/include/cuvs/
 * core/c_api.h — cuvsResources_t, cuvsError_t + thread-local last error,
 * per-algo create/build/search/destroy; DLPack tensors + runtime dtype
 * dispatch in c/src/neighbors/cagra.cpp:31-110). Here the engine is JAX,
 * so the C layer embeds a Python interpreter once per process and
 * dispatches into the cuvs_tpu package; tensors cross the boundary as
 * cuvsTpuTensor descriptors (DLPack-shaped: data pointer + dtype code +
 * shape) or as raw float32 pointers via the legacy entry points.
 *
 * Thread-safety: calls serialize on the embedded interpreter's GIL.
 */

#ifndef CUVS_TPU_C_API_H
#define CUVS_TPU_C_API_H

#include <stdint.h>

#include "dlpack.h"

#ifdef __cplusplus
extern "C" {
#endif

typedef enum { CUVS_TPU_SUCCESS = 0, CUVS_TPU_ERROR = 1 } cuvsTpuError_t;

typedef struct cuvsTpuIndex* cuvsTpuIndex_t;
typedef struct cuvsTpuMgIndex* cuvsTpuMgIndex_t;

/* Element type codes (DLDataType analog, c_api.h:80). */
typedef enum {
  CUVS_TPU_F32 = 0,
  CUVS_TPU_F16 = 1,
  CUVS_TPU_I8 = 2,
  CUVS_TPU_U8 = 3,
} cuvsTpuDtype_t;

/* Host tensor descriptor (row-major, DLPack-shaped). */
typedef struct {
  const void* data;
  cuvsTpuDtype_t dtype;
  int64_t n_rows;
  int64_t n_cols;
} cuvsTpuTensor_t;

/* Initialize the runtime (idempotent). platform: "tpu", "cpu" or NULL. */
cuvsTpuError_t cuvsTpuInit(const char* platform);

/* Last error message for this thread (valid until the next API call). */
const char* cuvsTpuGetLastError(void);

/* Reset this thread's last-error text (c_api.h last-error semantics). */
void cuvsTpuClearLastError(void);

/* Block until all device work issued by this process has completed —
 * the stream-sync analog (c_api.h:106-123 cuvsStreamSync); the JAX
 * dispatch model syncs per call, so this drains any async transfers. */
cuvsTpuError_t cuvsTpuSync(void);

/* Build an index over a row-major float32 [n_rows, dim] host buffer.
 * algo: "brute_force" | "ivf_flat" | "ivf_pq" | "ivf_sq" | "ivf_rabitq"
 *       | "cagra".
 * params_json: algo build params as JSON (e.g. "{\"n_lists\": 256}"), may
 * be NULL. metric: "sqeuclidean" | "euclidean" | "inner_product" | ... */
cuvsTpuError_t cuvsTpuIndexBuild(const char* algo,
                                 const char* metric,
                                 const char* params_json,
                                 const float* dataset,
                                 int64_t n_rows,
                                 int64_t dim,
                                 cuvsTpuIndex_t* out_index);

/* Typed build: runtime dtype dispatch from the tensor descriptor
 * (f32/f16/i8/u8 datasets, mirroring the reference's DLPack dispatch). */
cuvsTpuError_t cuvsTpuIndexBuildTensor(const char* algo,
                                       const char* metric,
                                       const char* params_json,
                                       const cuvsTpuTensor_t* dataset,
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

/* Typed search (f32/f16/i8/u8 queries). */
cuvsTpuError_t cuvsTpuIndexSearchTensor(cuvsTpuIndex_t index,
                                        const char* params_json,
                                        const cuvsTpuTensor_t* queries,
                                        int64_t k,
                                        float* out_distances,
                                        int32_t* out_neighbors);

/* ---- DLPack surface (c_api.h:80-258 parity): any 2-D compact
 * row-major host DLManagedTensor of f32/f16/bf16/i8/u8. The library
 * never takes ownership: the caller's deleter is not invoked. ---- */
cuvsTpuError_t cuvsTpuIndexBuildDL(const char* algo,
                                   const char* metric,
                                   const char* params_json,
                                   const DLManagedTensor* dataset,
                                   cuvsTpuIndex_t* out_index);

/* out_distances: f32 [n_queries, k]; out_neighbors: i32 [n_queries, k];
 * both pre-allocated host tensors (kDLCPU), shapes validated. */
cuvsTpuError_t cuvsTpuIndexSearchDL(cuvsTpuIndex_t index,
                                    const char* params_json,
                                    const DLManagedTensor* queries,
                                    DLManagedTensor* out_distances,
                                    DLManagedTensor* out_neighbors);

/* ---- Filters (reference cuvsFilter, c/include/cuvs/neighbors/common.h;
 * semantics from cpp common.hpp:500-660). words is a packed little-endian
 * uint32 bit array on the host: bit i set => dataset row i may be
 * returned. BITSET is one shared row mask (n_words = ceil(n_rows/32));
 * BITMAP is per-query (n_words = n_queries * ceil(n_rows/32), row-major
 * [n_queries, ceil(n_rows/32)]). ---- */
typedef enum {
  CUVS_TPU_FILTER_NONE = 0,
  CUVS_TPU_FILTER_BITSET = 1,
  CUVS_TPU_FILTER_BITMAP = 2,
} cuvsTpuFilterType_t;

typedef struct {
  cuvsTpuFilterType_t type;
  const uint32_t* words;
  int64_t n_words;
} cuvsTpuFilter_t;

/* Prefiltered search over any index handle (reference: every *Search C
 * endpoint takes a cuvsFilter; here one filtered entry point serves all
 * algos). filter may be NULL or type NONE for unfiltered. */
cuvsTpuError_t cuvsTpuIndexSearchFilteredDL(cuvsTpuIndex_t index,
                                            const char* params_json,
                                            const DLManagedTensor* queries,
                                            const cuvsTpuFilter_t* filter,
                                            DLManagedTensor* out_distances,
                                            DLManagedTensor* out_neighbors);

/* ---- Per-algo parameter structs (index_params/search_params parity;
 * defaults match the reference headers — pass zero-initialized structs
 * through the *Default helpers first). ---- */
typedef struct {
  int64_t n_lists;               /* 1024 (ivf_flat.hpp:28) */
  int64_t kmeans_n_iters;        /* 20 */
  double kmeans_trainset_fraction; /* 0.5 */
  int32_t adaptive_centers;      /* bool */
  int32_t add_data_on_build;     /* bool */
} cuvsTpuIvfFlatIndexParams_t;

typedef struct {
  int64_t n_probes;              /* 20 */
  double recall_target;          /* 0 = exact selection */
} cuvsTpuIvfFlatSearchParams_t;

typedef struct {
  int64_t n_lists;               /* 1024 (ivf_pq.hpp:47) */
  int64_t pq_dim;                /* 0 = auto */
  int64_t pq_bits;               /* 8 */
  int64_t kmeans_n_iters;        /* 20 */
  int32_t force_random_rotation; /* bool */
  const char* codebook_kind;     /* "per_subspace" | "per_cluster" (codebook_gen) */
} cuvsTpuIvfPqIndexParams_t;

typedef struct {
  int64_t n_probes;              /* 20 */
  double recall_target;
  const char* lut_dtype;         /* NULL/"float32" or "int8": quantize the
                                  * fused kernel's per-tile ADC LUT
                                  * (reference ivf_pq.hpp:339 lut_dtype) */
} cuvsTpuIvfPqSearchParams_t;

typedef struct {
  int64_t intermediate_graph_degree; /* 128 (cagra.hpp:151) */
  int64_t graph_degree;              /* 64 */
  const char* build_algo;            /* "auto" | "nn_descent" | ... */
  int32_t guarantee_connectivity;    /* bool */
} cuvsTpuCagraIndexParams_t;

typedef struct {
  int64_t itopk_size;   /* 64 (cagra.hpp:280) */
  int64_t search_width; /* 1 */
  int64_t max_iterations; /* 0 = auto */
} cuvsTpuCagraSearchParams_t;

typedef struct {
  int64_t graph_degree;  /* 32 (vamana.hpp:59-76) */
  int64_t visited_size;  /* 64 */
  double alpha;          /* 1.2 */
  double max_fraction;   /* 0.06 */
} cuvsTpuVamanaIndexParams_t;

typedef struct {
  int64_t itopk_size;   /* 64: served via the graph engine */
  int64_t search_width; /* 1 */
} cuvsTpuVamanaSearchParams_t;

typedef struct {
  int64_t graph_degree;              /* 64 (nn_descent.hpp:61-76) */
  int64_t intermediate_graph_degree; /* 128 */
  int64_t max_iterations;            /* 20 */
  double termination_threshold;      /* 1e-4 */
} cuvsTpuNnDescentParams_t;

typedef struct {
  const char* algo;       /* "auto" | "brute_force" | "nn_descent" | "ivf_pq" */
  int64_t n_clusters;     /* 1 = single build (all_neighbors.hpp:61-90) */
  int64_t overlap_factor; /* 2 */
} cuvsTpuAllNeighborsParams_t;

typedef struct {
  const char* upstream_algo;        /* "cagra" | "ivf_flat" | "ivf_pq" */
  const char* upstream_params_json; /* NULL = upstream defaults */
  int64_t min_ann_rows;             /* 100000 (tiered_index.hpp:62) */
} cuvsTpuTieredIndexParams_t;

typedef struct {
  const char* hierarchy;   /* "none" | "cpu" | "tpu" (hnsw.hpp:43-61) */
  int64_t ef_construction; /* 200 */
} cuvsTpuHnswParams_t;

typedef struct {
  int64_t ef; /* 64 (hnsw.hpp search_params) */
} cuvsTpuHnswSearchParams_t;

/* Multi-chip param structs (reference mg_common.h: cuvsMultiGpu*Params). */
typedef struct {
  const char* mode;              /* "sharded" | "replicated" (common.hpp:948) */
  const char* distributed_build; /* "auto" | "on" | "off" */
} cuvsTpuMgIndexParams_t;

typedef struct {
  const char* routing; /* "load_balancer" | "round_robin" (common.hpp:956) */
} cuvsTpuMgSearchParams_t;

void cuvsTpuIvfFlatIndexParamsDefault(cuvsTpuIvfFlatIndexParams_t* p);
void cuvsTpuIvfFlatSearchParamsDefault(cuvsTpuIvfFlatSearchParams_t* p);
void cuvsTpuIvfPqIndexParamsDefault(cuvsTpuIvfPqIndexParams_t* p);
void cuvsTpuIvfPqSearchParamsDefault(cuvsTpuIvfPqSearchParams_t* p);
void cuvsTpuCagraIndexParamsDefault(cuvsTpuCagraIndexParams_t* p);
void cuvsTpuCagraSearchParamsDefault(cuvsTpuCagraSearchParams_t* p);
void cuvsTpuVamanaIndexParamsDefault(cuvsTpuVamanaIndexParams_t* p);
void cuvsTpuVamanaSearchParamsDefault(cuvsTpuVamanaSearchParams_t* p);
void cuvsTpuNnDescentParamsDefault(cuvsTpuNnDescentParams_t* p);
void cuvsTpuAllNeighborsParamsDefault(cuvsTpuAllNeighborsParams_t* p);
void cuvsTpuTieredIndexParamsDefault(cuvsTpuTieredIndexParams_t* p);
void cuvsTpuHnswParamsDefault(cuvsTpuHnswParams_t* p);
void cuvsTpuHnswSearchParamsDefault(cuvsTpuHnswSearchParams_t* p);
void cuvsTpuMgIndexParamsDefault(cuvsTpuMgIndexParams_t* p);
void cuvsTpuMgSearchParamsDefault(cuvsTpuMgSearchParams_t* p);

/* Typed per-algo build/search over DLPack tensors. */
cuvsTpuError_t cuvsTpuIvfFlatBuild(const cuvsTpuIvfFlatIndexParams_t* params,
                                   const char* metric,
                                   const DLManagedTensor* dataset,
                                   cuvsTpuIndex_t* out_index);
cuvsTpuError_t cuvsTpuIvfFlatSearch(cuvsTpuIndex_t index,
                                    const cuvsTpuIvfFlatSearchParams_t* params,
                                    const DLManagedTensor* queries,
                                    DLManagedTensor* out_distances,
                                    DLManagedTensor* out_neighbors);
cuvsTpuError_t cuvsTpuIvfPqBuild(const cuvsTpuIvfPqIndexParams_t* params,
                                 const char* metric,
                                 const DLManagedTensor* dataset,
                                 cuvsTpuIndex_t* out_index);
cuvsTpuError_t cuvsTpuIvfPqSearch(cuvsTpuIndex_t index,
                                  const cuvsTpuIvfPqSearchParams_t* params,
                                  const DLManagedTensor* queries,
                                  DLManagedTensor* out_distances,
                                  DLManagedTensor* out_neighbors);
cuvsTpuError_t cuvsTpuCagraBuild(const cuvsTpuCagraIndexParams_t* params,
                                 const char* metric,
                                 const DLManagedTensor* dataset,
                                 cuvsTpuIndex_t* out_index);
cuvsTpuError_t cuvsTpuCagraSearch(cuvsTpuIndex_t index,
                                  const cuvsTpuCagraSearchParams_t* params,
                                  const DLManagedTensor* queries,
                                  DLManagedTensor* out_distances,
                                  DLManagedTensor* out_neighbors);

/* ---- Vamana (reference c/include/cuvs/neighbors/vamana.h). The index
 * serializes to the DiskANN on-disk format via cuvsTpuVamanaSerialize. */
cuvsTpuError_t cuvsTpuVamanaBuild(const cuvsTpuVamanaIndexParams_t* params,
                                  const char* metric,
                                  const DLManagedTensor* dataset,
                                  cuvsTpuIndex_t* out_index);
cuvsTpuError_t cuvsTpuVamanaSearch(cuvsTpuIndex_t index,
                                   const cuvsTpuVamanaSearchParams_t* params,
                                   const DLManagedTensor* queries,
                                   DLManagedTensor* out_distances,
                                   DLManagedTensor* out_neighbors);
cuvsTpuError_t cuvsTpuVamanaSerialize(cuvsTpuIndex_t index, const char* path);

/* ---- k-NN graph builders (nn_descent.h / all_neighbors.h parity).
 * out_graph: i32 [n_rows, graph_degree] (or [n_rows, k]); out_distances:
 * f32 of the same shape, may be NULL. ---- */
cuvsTpuError_t cuvsTpuNnDescentBuild(const cuvsTpuNnDescentParams_t* params,
                                     const char* metric,
                                     const DLManagedTensor* dataset,
                                     DLManagedTensor* out_graph,
                                     DLManagedTensor* out_distances);
cuvsTpuError_t cuvsTpuAllNeighborsBuild(const cuvsTpuAllNeighborsParams_t* params,
                                        const char* metric,
                                        int64_t k,
                                        const DLManagedTensor* dataset,
                                        DLManagedTensor* out_graph,
                                        DLManagedTensor* out_distances);

/* ---- Exact re-rank of candidate lists (refine.h parity). candidates:
 * i32 [n_queries, n_candidates] global ids (negative = invalid). ---- */
cuvsTpuError_t cuvsTpuRefine(const char* metric,
                             const DLManagedTensor* dataset,
                             const DLManagedTensor* queries,
                             const DLManagedTensor* candidates,
                             int64_t k,
                             DLManagedTensor* out_distances,
                             DLManagedTensor* out_neighbors);

/* ---- Tiered index (tiered_index.h parity): brute-force hot tier + ANN
 * cold tier. Search/extend go through the generic handle entry points;
 * Compact folds the BF tier into the ANN tier in place. ---- */
cuvsTpuError_t cuvsTpuTieredBuild(const cuvsTpuTieredIndexParams_t* params,
                                  const char* metric,
                                  const DLManagedTensor* dataset,
                                  cuvsTpuIndex_t* out_index);
cuvsTpuError_t cuvsTpuTieredCompact(cuvsTpuIndex_t index);

/* ---- HNSW interop (hnsw.h parity): CAGRA -> hnswlib-format file;
 * loaded handles search through cuvsTpuHnswSearch (CPU path). ---- */
cuvsTpuError_t cuvsTpuHnswFromCagra(cuvsTpuIndex_t cagra_index,
                                    const cuvsTpuHnswParams_t* params,
                                    const char* path);
cuvsTpuError_t cuvsTpuHnswLoad(const char* path,
                               const char* metric,
                               cuvsTpuIndex_t* out_index);
cuvsTpuError_t cuvsTpuHnswSearch(cuvsTpuIndex_t index,
                                 const cuvsTpuHnswSearchParams_t* params,
                                 const DLManagedTensor* queries,
                                 DLManagedTensor* out_distances,
                                 DLManagedTensor* out_neighbors);

/* Append rows to an existing index (per-algo extend semantics). The
 * handle is updated in place. */
cuvsTpuError_t cuvsTpuIndexExtend(cuvsTpuIndex_t index,
                                  const cuvsTpuTensor_t* new_rows);

/* Serialize / deserialize (npz container with validated header). */
cuvsTpuError_t cuvsTpuIndexSerialize(cuvsTpuIndex_t index, const char* path);
cuvsTpuError_t cuvsTpuIndexDeserialize(const char* path, cuvsTpuIndex_t* out);

cuvsTpuError_t cuvsTpuIndexDestroy(cuvsTpuIndex_t index);

/* ---- Multi-chip (SNMG analog; reference c/include/cuvs/neighbors/
 * mg_cagra.h etc.). Builds over the full local device mesh. mode:
 * "sharded" | "replicated". ---- */
cuvsTpuError_t cuvsTpuMgBuild(const char* algo,
                              const char* mode,
                              const char* metric,
                              const char* params_json,
                              const cuvsTpuTensor_t* dataset,
                              cuvsTpuMgIndex_t* out_index);

cuvsTpuError_t cuvsTpuMgSearch(cuvsTpuMgIndex_t index,
                               const char* params_json,
                               const cuvsTpuTensor_t* queries,
                               int64_t k,
                               float* out_distances,
                               int32_t* out_neighbors);

cuvsTpuError_t cuvsTpuMgSerialize(cuvsTpuMgIndex_t index, const char* path);
cuvsTpuError_t cuvsTpuMgDeserialize(const char* path, cuvsTpuMgIndex_t* out);
cuvsTpuError_t cuvsTpuMgDestroy(cuvsTpuMgIndex_t index);

#ifdef __cplusplus
}
#endif

#endif /* CUVS_TPU_C_API_H */
