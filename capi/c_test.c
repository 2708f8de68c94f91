/* C API smoke test (c/tests analog): build, search, serialize round-trip,
 * and error-path checks, all through the C ABI. */
#include "cuvs_tpu.h"

#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define CHECK(expr)                                                         \
  do {                                                                      \
    if ((expr) != CUVS_TPU_SUCCESS) {                                       \
      fprintf(stderr, "FAIL %s: %s\n", #expr, cuvsTpuGetLastError());       \
      return 1;                                                             \
    }                                                                       \
  } while (0)

int main(void) {
  const int64_t n = 2000, d = 16, nq = 8, k = 5;
  float* data = malloc(n * d * sizeof(float));
  float* queries = malloc(nq * d * sizeof(float));
  srand(42);
  for (int64_t i = 0; i < n * d; ++i) data[i] = (float)rand() / RAND_MAX;
  /* queries = first nq rows => self must be the 1-NN */
  memcpy(queries, data, nq * d * sizeof(float));

  CHECK(cuvsTpuInit("cpu"));

  cuvsTpuIndex_t index;
  CHECK(cuvsTpuIndexBuild("brute_force", "sqeuclidean", NULL, data, n, d, &index));

  float* out_d = malloc(nq * k * sizeof(float));
  int32_t* out_i = malloc(nq * k * sizeof(int32_t));
  CHECK(cuvsTpuIndexSearch(index, NULL, queries, nq, d, k, out_d, out_i));
  for (int64_t q = 0; q < nq; ++q) {
    if (out_i[q * k] != (int32_t)q || out_d[q * k] > 1e-4f) {
      fprintf(stderr, "FAIL self-nn: q=%lld id=%d dist=%f\n", (long long)q,
              out_i[q * k], out_d[q * k]);
      return 1;
    }
  }
  printf("search ok: q0 neighbors = %d %d %d %d %d\n", out_i[0], out_i[1],
         out_i[2], out_i[3], out_i[4]);

  CHECK(cuvsTpuIndexSerialize(index, "/tmp/capi_index.npz"));
  cuvsTpuIndex_t loaded;
  CHECK(cuvsTpuIndexDeserialize("/tmp/capi_index.npz", &loaded));
  float* out_d2 = malloc(nq * k * sizeof(float));
  int32_t* out_i2 = malloc(nq * k * sizeof(int32_t));
  CHECK(cuvsTpuIndexSearch(loaded, NULL, queries, nq, d, k, out_d2, out_i2));
  if (memcmp(out_i, out_i2, nq * k * sizeof(int32_t)) != 0) {
    fprintf(stderr, "FAIL serialize round-trip mismatch\n");
    return 1;
  }
  printf("serialize round-trip ok\n");

  /* error path: unknown algo must fail with a message */
  cuvsTpuIndex_t bad;
  if (cuvsTpuIndexBuild("no_such_algo", NULL, NULL, data, n, d, &bad) !=
      CUVS_TPU_ERROR) {
    fprintf(stderr, "FAIL: bad algo accepted\n");
    return 1;
  }
  printf("bad algo rejected: %s\n", cuvsTpuGetLastError());

  CHECK(cuvsTpuIndexDestroy(index));
  CHECK(cuvsTpuIndexDestroy(loaded));

  /* ---- typed API: int8 dataset + queries (runtime dtype dispatch) ---- */
  int8_t* i8data = malloc(n * d);
  for (int64_t i = 0; i < n * d; ++i) i8data[i] = (int8_t)(rand() % 200 - 100);
  cuvsTpuTensor_t t8 = {i8data, CUVS_TPU_I8, n, d};
  cuvsTpuIndex_t idx8;
  CHECK(cuvsTpuIndexBuildTensor("brute_force", "sqeuclidean", NULL, &t8, &idx8));
  cuvsTpuTensor_t q8 = {i8data, CUVS_TPU_I8, nq, d}; /* first rows again */
  CHECK(cuvsTpuIndexSearchTensor(idx8, NULL, &q8, k, out_d, out_i));
  for (int64_t q = 0; q < nq; ++q) {
    if (out_i[q * k] != (int32_t)q) {
      fprintf(stderr, "FAIL int8 self-nn: q=%lld id=%d\n", (long long)q,
              out_i[q * k]);
      return 1;
    }
  }
  printf("typed int8 search ok\n");
  CHECK(cuvsTpuIndexDestroy(idx8));

  /* ---- extend: append rows to an IVF index, then find them ---- */
  cuvsTpuIndex_t ivf;
  CHECK(cuvsTpuIndexBuild("ivf_flat", "sqeuclidean", "{\"n_lists\": 8}", data,
                          n - 100, d, &ivf));
  cuvsTpuTensor_t tail = {data + (n - 100) * d, CUVS_TPU_F32, 100, d};
  CHECK(cuvsTpuIndexExtend(ivf, &tail));
  cuvsTpuTensor_t qt = {data + (n - 100) * d, CUVS_TPU_F32, 4, d};
  CHECK(cuvsTpuIndexSearchTensor(ivf, "{\"n_probes\": 8}", &qt, k, out_d, out_i));
  for (int64_t q = 0; q < 4; ++q) {
    if (out_i[q * k] != (int32_t)(n - 100 + q)) {
      fprintf(stderr, "FAIL extend self-nn: q=%lld id=%d\n", (long long)q,
              out_i[q * k]);
      return 1;
    }
  }
  printf("extend ok\n");
  CHECK(cuvsTpuIndexDestroy(ivf));

  /* ---- DLPack surface: round-trip per dtype (c_api.h:80-258 parity) */
  {
    int64_t dshape[2] = {n, d};
    int64_t qshape[2] = {nq, d};
    int64_t oshape[2] = {nq, k};
    static const struct { uint8_t code; uint8_t bits; } dts[] = {
        {kDLFloat, 32}, {kDLInt, 8}, {kDLUInt, 8},
    };
    for (int t = 0; t < 3; ++t) {
      void* buf;
      if (dts[t].bits == 32) {
        buf = data; /* reuse the f32 buffer */
      } else if (dts[t].code == kDLInt) {
        buf = i8data;
      } else {
        uint8_t* u8 = malloc(n * d);
        for (int64_t i = 0; i < n * d; ++i) u8[i] = (uint8_t)(i8data[i] + 100);
        buf = u8;
      }
      DLManagedTensor dset = {{buf, {kDLCPU, 0}, 2,
                               {dts[t].code, dts[t].bits, 1}, dshape, NULL, 0},
                              NULL, NULL};
      DLManagedTensor dq = {{buf, {kDLCPU, 0}, 2,
                             {dts[t].code, dts[t].bits, 1}, qshape, NULL, 0},
                            NULL, NULL};
      DLManagedTensor dout = {{out_d, {kDLCPU, 0}, 2, {kDLFloat, 32, 1},
                               oshape, NULL, 0}, NULL, NULL};
      DLManagedTensor iout = {{out_i, {kDLCPU, 0}, 2, {kDLInt, 32, 1},
                               oshape, NULL, 0}, NULL, NULL};
      cuvsTpuIndex_t dlx;
      CHECK(cuvsTpuIndexBuildDL("brute_force", "sqeuclidean", NULL, &dset, &dlx));
      CHECK(cuvsTpuIndexSearchDL(dlx, NULL, &dq, &dout, &iout));
      for (int64_t q = 0; q < nq; ++q) {
        if (out_i[q * k] != (int32_t)q) {
          fprintf(stderr, "FAIL dlpack self-nn (dt %d): q=%lld id=%d\n", t,
                  (long long)q, out_i[q * k]);
          return 1;
        }
      }
      CHECK(cuvsTpuIndexDestroy(dlx));
    }
    /* error paths: device tensor and bad strides must be rejected */
    DLManagedTensor devt = {{data, {kDLCUDA, 0}, 2, {kDLFloat, 32, 1},
                             dshape, NULL, 0}, NULL, NULL};
    cuvsTpuIndex_t bad2;
    if (cuvsTpuIndexBuildDL("brute_force", NULL, NULL, &devt, &bad2) !=
        CUVS_TPU_ERROR) {
      fprintf(stderr, "FAIL: device tensor accepted\n");
      return 1;
    }
    cuvsTpuClearLastError();
    if (strlen(cuvsTpuGetLastError()) != 0) {
      fprintf(stderr, "FAIL: last error not cleared\n");
      return 1;
    }
    printf("dlpack round-trip ok (f32/i8/u8)\n");
  }

  /* ---- per-algo param structs ---- */
  {
    cuvsTpuIvfFlatIndexParams_t bp;
    cuvsTpuIvfFlatIndexParamsDefault(&bp);
    bp.n_lists = 8;
    cuvsTpuIvfFlatSearchParams_t sp;
    cuvsTpuIvfFlatSearchParamsDefault(&sp);
    sp.n_probes = 8;
    int64_t dshape[2] = {n, d};
    int64_t qshape[2] = {nq, d};
    int64_t oshape[2] = {nq, k};
    DLManagedTensor dset = {{data, {kDLCPU, 0}, 2, {kDLFloat, 32, 1},
                             dshape, NULL, 0}, NULL, NULL};
    DLManagedTensor dq = {{queries, {kDLCPU, 0}, 2, {kDLFloat, 32, 1},
                           qshape, NULL, 0}, NULL, NULL};
    DLManagedTensor dout = {{out_d, {kDLCPU, 0}, 2, {kDLFloat, 32, 1},
                             oshape, NULL, 0}, NULL, NULL};
    DLManagedTensor iout = {{out_i, {kDLCPU, 0}, 2, {kDLInt, 32, 1},
                             oshape, NULL, 0}, NULL, NULL};
    cuvsTpuIndex_t ivf2;
    CHECK(cuvsTpuIvfFlatBuild(&bp, "sqeuclidean", &dset, &ivf2));
    CHECK(cuvsTpuIvfFlatSearch(ivf2, &sp, &dq, &dout, &iout));
    for (int64_t q = 0; q < nq; ++q) {
      if (out_i[q * k] != (int32_t)q) {
        fprintf(stderr, "FAIL ivf param-struct self-nn\n");
        return 1;
      }
    }
    CHECK(cuvsTpuSync());
    CHECK(cuvsTpuIndexDestroy(ivf2));
    printf("param-struct ivf_flat ok\n");

    /* typed IVF-PQ endpoints, incl. the lut_dtype precision knob */
    cuvsTpuIvfPqIndexParams_t pbp;
    cuvsTpuIvfPqIndexParamsDefault(&pbp);
    pbp.n_lists = 16;
    pbp.pq_dim = d / 2;
    cuvsTpuIvfPqSearchParams_t psp;
    cuvsTpuIvfPqSearchParamsDefault(&psp);
    psp.n_probes = 16;
    psp.lut_dtype = "int8";
    cuvsTpuIndex_t pq2;
    CHECK(cuvsTpuIvfPqBuild(&pbp, "sqeuclidean", &dset, &pq2));
    CHECK(cuvsTpuIvfPqSearch(pq2, &psp, &dq, &dout, &iout));
    int hits = 0;
    for (int64_t q = 0; q < nq; ++q)
      for (int64_t j = 0; j < k; ++j)
        if (out_i[q * k + j] == (int32_t)q) { ++hits; break; }
    if (hits < (int)(nq * 0.9)) {  /* PQ is lossy: self-nn in top-k */
      fprintf(stderr, "FAIL pq int8-lut self-nn: %d/%d\n", hits, (int)nq);
      return 1;
    }
    CHECK(cuvsTpuSync());
    CHECK(cuvsTpuIndexDestroy(pq2));
    printf("param-struct ivf_pq (int8 lut) ok\n");
  }

  /* ---- mg API over the local device mesh ---- */
  cuvsTpuTensor_t td = {data, CUVS_TPU_F32, n, d};
  cuvsTpuMgIndex_t mgi;
  CHECK(cuvsTpuMgBuild("brute_force", "sharded", "sqeuclidean", NULL, &td, &mgi));
  cuvsTpuTensor_t qm = {queries, CUVS_TPU_F32, nq, d};
  CHECK(cuvsTpuMgSearch(mgi, NULL, &qm, k, out_d, out_i));
  for (int64_t q = 0; q < nq; ++q) {
    if (out_i[q * k] != (int32_t)q) {
      fprintf(stderr, "FAIL mg self-nn: q=%lld id=%d\n", (long long)q,
              out_i[q * k]);
      return 1;
    }
  }
  CHECK(cuvsTpuMgSerialize(mgi, "/tmp/capi_mg_index"));
  cuvsTpuMgIndex_t mg2;
  CHECK(cuvsTpuMgDeserialize("/tmp/capi_mg_index", &mg2));
  CHECK(cuvsTpuMgSearch(mg2, NULL, &qm, k, out_d, out_i));
  printf("mg build/search/serialize ok\n");
  CHECK(cuvsTpuMgDestroy(mgi));
  CHECK(cuvsTpuMgDestroy(mg2));

  /* ---- round-4 surface: filters, vamana, knn-graph, refine, tiered,
   * hnsw (reference c/include/cuvs/neighbors/{vamana,nn_descent,
   * all_neighbors,refine,tiered_index,hnsw}.h parity) ---- */
  {
    int64_t dshape[2] = {n, d};
    int64_t qshape[2] = {nq, d};
    int64_t oshape[2] = {nq, k};
    DLManagedTensor dset = {{data, {kDLCPU, 0}, 2, {kDLFloat, 32, 1},
                             dshape, NULL, 0}, NULL, NULL};
    DLManagedTensor dq = {{queries, {kDLCPU, 0}, 2, {kDLFloat, 32, 1},
                           qshape, NULL, 0}, NULL, NULL};
    DLManagedTensor dout = {{out_d, {kDLCPU, 0}, 2, {kDLFloat, 32, 1},
                             oshape, NULL, 0}, NULL, NULL};
    DLManagedTensor iout = {{out_i, {kDLCPU, 0}, 2, {kDLInt, 32, 1},
                             oshape, NULL, 0}, NULL, NULL};

    /* filtered search: bitset masking out the even rows => every returned
     * id must be odd */
    int64_t n_words = (n + 31) / 32;
    uint32_t* words = malloc(n_words * sizeof(uint32_t));
    for (int64_t w = 0; w < n_words; ++w) words[w] = 0xAAAAAAAAu; /* odd bits */
    cuvsTpuIndex_t bf2;
    CHECK(cuvsTpuIndexBuildDL("brute_force", "sqeuclidean", NULL, &dset, &bf2));
    cuvsTpuFilter_t flt = {CUVS_TPU_FILTER_BITSET, words, n_words};
    CHECK(cuvsTpuIndexSearchFilteredDL(bf2, NULL, &dq, &flt, &dout, &iout));
    for (int64_t q = 0; q < nq * k; ++q) {
      if (out_i[q] >= 0 && out_i[q] % 2 == 0) {
        fprintf(stderr, "FAIL filtered search returned masked id %d\n",
                out_i[q]);
        return 1;
      }
    }
    printf("filtered search ok\n");
    CHECK(cuvsTpuIndexDestroy(bf2));

    /* vamana: build, search (self-nn), DiskANN-format serialize */
    cuvsTpuVamanaIndexParams_t vp;
    cuvsTpuVamanaIndexParamsDefault(&vp);
    cuvsTpuIndex_t vix;
    CHECK(cuvsTpuVamanaBuild(&vp, "sqeuclidean", &dset, &vix));
    cuvsTpuVamanaSearchParams_t vsp;
    cuvsTpuVamanaSearchParamsDefault(&vsp);
    CHECK(cuvsTpuVamanaSearch(vix, &vsp, &dq, &dout, &iout));
    int vhits = 0;
    for (int64_t q = 0; q < nq; ++q) vhits += out_i[q * k] == (int32_t)q;
    if (vhits < nq - 1) {
      fprintf(stderr, "FAIL vamana self-nn: %d/%lld\n", vhits, (long long)nq);
      return 1;
    }
    CHECK(cuvsTpuVamanaSerialize(vix, "/tmp/capi_vamana.bin"));
    CHECK(cuvsTpuIndexDestroy(vix));
    printf("vamana ok\n");

    /* nn_descent + all_neighbors graph builds: neighbor 0 of row i != i
     * never guaranteed, but graph ids must be in range */
    const int64_t gk = 8;
    int32_t* graph = malloc(n * gk * sizeof(int32_t));
    float* gdist = malloc(n * gk * sizeof(float));
    int64_t gshape[2] = {n, gk};
    DLManagedTensor gout = {{graph, {kDLCPU, 0}, 2, {kDLInt, 32, 1},
                             gshape, NULL, 0}, NULL, NULL};
    DLManagedTensor gdout = {{gdist, {kDLCPU, 0}, 2, {kDLFloat, 32, 1},
                              gshape, NULL, 0}, NULL, NULL};
    cuvsTpuNnDescentParams_t np;
    cuvsTpuNnDescentParamsDefault(&np);
    np.graph_degree = gk;
    np.max_iterations = 4;
    CHECK(cuvsTpuNnDescentBuild(&np, "sqeuclidean", &dset, &gout, &gdout));
    for (int64_t i = 0; i < n * gk; ++i) {
      if (graph[i] < 0 || graph[i] >= n) {
        fprintf(stderr, "FAIL nn_descent graph id out of range\n");
        return 1;
      }
    }
    cuvsTpuAllNeighborsParams_t ap;
    cuvsTpuAllNeighborsParamsDefault(&ap);
    ap.algo = "brute_force";
    CHECK(cuvsTpuAllNeighborsBuild(&ap, "sqeuclidean", gk, &dset, &gout, NULL));
    printf("knn-graph builders ok\n");

    /* refine: re-rank the graph rows of the first nq points; with queries
     * = first rows and self in no candidate list, best must be a graph
     * neighbor; instead make candidates = [q, junk...] so self wins */
    int32_t* cand = malloc(nq * gk * sizeof(int32_t));
    for (int64_t q = 0; q < nq; ++q)
      for (int64_t j = 0; j < gk; ++j)
        cand[q * gk + j] = j == 0 ? (int32_t)q : (int32_t)(n - 1 - j);
    int64_t cshape[2] = {nq, gk};
    DLManagedTensor cin = {{cand, {kDLCPU, 0}, 2, {kDLInt, 32, 1},
                            cshape, NULL, 0}, NULL, NULL};
    CHECK(cuvsTpuRefine("sqeuclidean", &dset, &dq, &cin, k, &dout, &iout));
    for (int64_t q = 0; q < nq; ++q) {
      if (out_i[q * k] != (int32_t)q) {
        fprintf(stderr, "FAIL refine self-nn: q=%lld id=%d\n", (long long)q,
                out_i[q * k]);
        return 1;
      }
    }
    printf("refine ok\n");

    /* tiered: small min_ann_rows forces the ANN tier; compact must keep
     * search results valid */
    cuvsTpuTieredIndexParams_t tp;
    cuvsTpuTieredIndexParamsDefault(&tp);
    tp.upstream_algo = "ivf_flat";
    tp.upstream_params_json = "{\"n_lists\": 8}";
    tp.min_ann_rows = 512;
    cuvsTpuIndex_t tix;
    CHECK(cuvsTpuTieredBuild(&tp, "sqeuclidean", &dset, &tix));
    CHECK(cuvsTpuIndexSearchDL(tix, "{\"n_probes\": 8}", &dq, &dout, &iout));
    for (int64_t q = 0; q < nq; ++q) {
      if (out_i[q * k] != (int32_t)q) {
        fprintf(stderr, "FAIL tiered self-nn\n");
        return 1;
      }
    }
    CHECK(cuvsTpuTieredCompact(tix));
    CHECK(cuvsTpuIndexSearchDL(tix, "{\"n_probes\": 8}", &dq, &dout, &iout));
    for (int64_t q = 0; q < nq; ++q) {
      if (out_i[q * k] != (int32_t)q) {
        fprintf(stderr, "FAIL tiered post-compact self-nn\n");
        return 1;
      }
    }
    CHECK(cuvsTpuIndexDestroy(tix));
    printf("tiered ok\n");

    /* hnsw: cagra -> hnswlib file -> load -> search */
    cuvsTpuCagraIndexParams_t cp;
    cuvsTpuCagraIndexParamsDefault(&cp);
    cp.graph_degree = 16;
    cp.intermediate_graph_degree = 32;
    cuvsTpuIndex_t cix;
    CHECK(cuvsTpuCagraBuild(&cp, "sqeuclidean", &dset, &cix));
    cuvsTpuHnswParams_t hp;
    cuvsTpuHnswParamsDefault(&hp);
    CHECK(cuvsTpuHnswFromCagra(cix, &hp, "/tmp/capi_hnsw.bin"));
    cuvsTpuIndex_t hix;
    CHECK(cuvsTpuHnswLoad("/tmp/capi_hnsw.bin", "sqeuclidean", &hix));
    cuvsTpuHnswSearchParams_t hsp;
    cuvsTpuHnswSearchParamsDefault(&hsp);
    CHECK(cuvsTpuHnswSearch(hix, &hsp, &dq, &dout, &iout));
    int hhits = 0;
    for (int64_t q = 0; q < nq; ++q) hhits += out_i[q * k] == (int32_t)q;
    if (hhits < nq - 1) {
      fprintf(stderr, "FAIL hnsw self-nn: %d/%lld\n", hhits, (long long)nq);
      return 1;
    }
    CHECK(cuvsTpuIndexDestroy(cix));
    CHECK(cuvsTpuIndexDestroy(hix));
    printf("hnsw ok\n");

    /* default helpers for the remaining param structs */
    cuvsTpuMgIndexParams_t mp; cuvsTpuMgIndexParamsDefault(&mp);
    cuvsTpuMgSearchParams_t msp; cuvsTpuMgSearchParamsDefault(&msp);
    if (strcmp(mp.mode, "sharded") || strcmp(msp.routing, "load_balancer")) {
      fprintf(stderr, "FAIL mg param defaults\n");
      return 1;
    }
    free(words); free(graph); free(gdist); free(cand);
  }

  printf("C API smoke test PASSED\n");
  return 0;
}
