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
  printf("C API smoke test PASSED\n");
  return 0;
}
