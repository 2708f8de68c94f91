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

  printf("C API smoke test PASSED\n");
  return 0;
}
