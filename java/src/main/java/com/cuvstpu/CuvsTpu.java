/*
 * Java binding for cuvs_tpu (TPU-native vector search) over its C ABI
 * (capi/cuvs_tpu.h), using the java.lang.foreign FFM API (JDK 22+) —
 * the same mechanism as the reference Java binding
 * (java/cuvs-java/src/main/java/com/nvidia/cuvs: Panama downcalls over
 * the cuVS C API), collapsed into one thin class.
 *
 * Build: `make -C ../capi` first (libcuvs_tpu_c.so embeds the Python
 * runtime that drives the TPU through JAX), then
 *   java --enable-native-access=ALL-UNNAMED -Djava.library.path=../capi ...
 *
 * NOTE: no Java toolchain ships in the development image this class was
 * authored in; it is kept in lock-step with the frozen C ABI baseline
 * (ci/c_abi_baseline.txt) and validated through the compiled C tests.
 */
package com.cuvstpu;

import java.lang.foreign.Arena;
import java.lang.foreign.FunctionDescriptor;
import java.lang.foreign.Linker;
import java.lang.foreign.MemorySegment;
import java.lang.foreign.SymbolLookup;
import java.lang.foreign.ValueLayout;
import java.lang.invoke.MethodHandle;

/** Entry point: runtime init + index handles for TPU vector search. */
public final class CuvsTpu {

    /** Error carrying the C layer's thread-local last-error text. */
    public static final class CuvsTpuException extends RuntimeException {
        CuvsTpuException(String message) {
            super("cuvs_tpu: " + message);
        }
    }

    private static final Linker LINKER = Linker.nativeLinker();
    private static final SymbolLookup LIB =
            SymbolLookup.libraryLookup("cuvs_tpu_c", Arena.global());

    private static MethodHandle handle(String name, FunctionDescriptor desc) {
        return LINKER.downcallHandle(
                LIB.find(name).orElseThrow(
                        () -> new CuvsTpuException("missing symbol " + name)),
                desc);
    }

    private static final ValueLayout.OfInt C_INT = ValueLayout.JAVA_INT;
    private static final ValueLayout.OfLong C_LONG = ValueLayout.JAVA_LONG;
    private static final ValueLayout C_PTR = ValueLayout.ADDRESS;

    private static final MethodHandle INIT =
            handle("cuvsTpuInit", FunctionDescriptor.of(C_INT, C_PTR));
    private static final MethodHandle LAST_ERROR =
            handle("cuvsTpuGetLastError", FunctionDescriptor.of(C_PTR));
    private static final MethodHandle SYNC =
            handle("cuvsTpuSync", FunctionDescriptor.of(C_INT));
    private static final MethodHandle BUILD = handle(
            "cuvsTpuIndexBuild",
            FunctionDescriptor.of(
                    C_INT, C_PTR, C_PTR, C_PTR, C_PTR, C_LONG, C_LONG, C_PTR));
    private static final MethodHandle SEARCH = handle(
            "cuvsTpuIndexSearch",
            FunctionDescriptor.of(
                    C_INT, C_PTR, C_PTR, C_PTR, C_LONG, C_LONG, C_LONG,
                    C_PTR, C_PTR));
    private static final MethodHandle SERIALIZE = handle(
            "cuvsTpuIndexSerialize", FunctionDescriptor.of(C_INT, C_PTR, C_PTR));
    private static final MethodHandle DESERIALIZE = handle(
            "cuvsTpuIndexDeserialize", FunctionDescriptor.of(C_INT, C_PTR, C_PTR));
    private static final MethodHandle DESTROY =
            handle("cuvsTpuIndexDestroy", FunctionDescriptor.of(C_INT, C_PTR));
    private static final MethodHandle MG_BUILD = handle(
            "cuvsTpuMgBuild",
            FunctionDescriptor.of(C_INT, C_PTR, C_PTR, C_PTR, C_PTR, C_PTR, C_PTR));
    private static final MethodHandle MG_SEARCH = handle(
            "cuvsTpuMgSearch",
            FunctionDescriptor.of(C_INT, C_PTR, C_PTR, C_PTR, C_LONG, C_PTR, C_PTR));
    private static final MethodHandle MG_DESTROY =
            handle("cuvsTpuMgDestroy", FunctionDescriptor.of(C_INT, C_PTR));

    private CuvsTpu() {}

    private static void check(int code) {
        if (code != 0) {
            String msg;
            try {
                MemorySegment p = (MemorySegment) LAST_ERROR.invokeExact();
                msg = p.equals(MemorySegment.NULL)
                        ? "unknown error"
                        : p.reinterpret(Long.MAX_VALUE).getString(0);
            } catch (Throwable t) {
                msg = "unknown error (" + t + ")";
            }
            throw new CuvsTpuException(msg);
        }
    }

    private static MemorySegment cstr(Arena a, String s) {
        return s == null ? MemorySegment.NULL : a.allocateFrom(s);
    }

    /** Initialize the runtime ("tpu", "cpu" or null). Idempotent. */
    public static void init(String platform) {
        try (Arena a = Arena.ofConfined()) {
            check((int) INIT.invokeExact(cstr(a, platform)));
        } catch (Throwable t) {
            throw wrap(t);
        }
    }

    /** Block until all issued device work completes. */
    public static void sync() {
        try {
            check((int) SYNC.invokeExact());
        } catch (Throwable t) {
            throw wrap(t);
        }
    }

    private static RuntimeException wrap(Throwable t) {
        return t instanceof RuntimeException re
                ? re
                : new CuvsTpuException(t.toString());
    }

    /** Search result: row-major [nQueries, k] distances and neighbor ids. */
    public record SearchResult(float[] distances, int[] neighbors) {}

    /**
     * Single-chip index (algo: "brute_force", "ivf_flat", "ivf_pq",
     * "ivf_sq", "ivf_rabitq", "cagra").
     */
    public static final class Index implements AutoCloseable {
        private MemorySegment handle;

        private Index(MemorySegment handle) {
            this.handle = handle;
        }

        /**
         * Build over a row-major [nRows, dim] float dataset.
         * paramsJson: algo build params, e.g. {"n_lists": 256}; may be null.
         */
        public static Index build(String algo, String metric, String paramsJson,
                                  float[] dataset, long nRows, long dim) {
            if (dataset.length != nRows * dim) {
                throw new IllegalArgumentException("dataset shape mismatch");
            }
            try (Arena a = Arena.ofConfined()) {
                MemorySegment data = a.allocateFrom(ValueLayout.JAVA_FLOAT, dataset);
                MemorySegment out = a.allocate(C_PTR);
                check((int) BUILD.invokeExact(
                        cstr(a, algo), cstr(a, metric), cstr(a, paramsJson),
                        data, nRows, dim, out));
                return new Index(out.get(C_PTR, 0));
            } catch (Throwable t) {
                throw wrap(t);
            }
        }

        /** Search k neighbors for row-major [nQueries, dim] queries. */
        public SearchResult search(String paramsJson, float[] queries,
                                   long nQueries, long dim, long k) {
            if (queries.length != nQueries * dim) {
                throw new IllegalArgumentException("query shape mismatch");
            }
            try (Arena a = Arena.ofConfined()) {
                MemorySegment q = a.allocateFrom(ValueLayout.JAVA_FLOAT, queries);
                MemorySegment dist =
                        a.allocate(ValueLayout.JAVA_FLOAT, nQueries * k);
                MemorySegment ids = a.allocate(ValueLayout.JAVA_INT, nQueries * k);
                check((int) SEARCH.invokeExact(
                        handle, cstr(a, paramsJson), q, nQueries, dim, k,
                        dist, ids));
                return new SearchResult(
                        dist.toArray(ValueLayout.JAVA_FLOAT),
                        ids.toArray(ValueLayout.JAVA_INT));
            } catch (Throwable t) {
                throw wrap(t);
            }
        }

        /** Serialize to path (validated npz container). */
        public void serialize(String path) {
            try (Arena a = Arena.ofConfined()) {
                check((int) SERIALIZE.invokeExact(handle, cstr(a, path)));
            } catch (Throwable t) {
                throw wrap(t);
            }
        }

        /** Read an index back from path. */
        public static Index deserialize(String path) {
            try (Arena a = Arena.ofConfined()) {
                MemorySegment out = a.allocate(C_PTR);
                check((int) DESERIALIZE.invokeExact(cstr(a, path), out));
                return new Index(out.get(C_PTR, 0));
            } catch (Throwable t) {
                throw wrap(t);
            }
        }

        @Override
        public void close() {
            if (handle != null) {
                try {
                    check((int) DESTROY.invokeExact(handle));
                } catch (Throwable t) {
                    throw wrap(t);
                } finally {
                    handle = null;
                }
            }
        }
    }

    /**
     * Multi-chip index over the full local device mesh
     * (mode: "sharded" or "replicated"; SNMG analog). Dataset and queries
     * cross the boundary as cuvsTpuTensor_t descriptors
     * (struct {void* data; int dtype; long nRows; long nCols}).
     */
    public static final class MgIndex implements AutoCloseable {
        private MemorySegment handle;

        private MgIndex(MemorySegment handle) {
            this.handle = handle;
        }

        private static MemorySegment tensor(Arena a, MemorySegment data,
                                            long nRows, long nCols) {
            // layout mirrors cuvsTpuTensor_t: ptr, i32 dtype (+pad), 2x i64
            MemorySegment t = a.allocate(32);
            t.set(C_PTR, 0, data);
            t.set(C_INT, 8, 0 /* CUVS_TPU_F32 */);
            t.set(C_LONG, 16, nRows);
            t.set(C_LONG, 24, nCols);
            return t;
        }

        public static MgIndex build(String algo, String mode, String metric,
                                    String paramsJson, float[] dataset,
                                    long nRows, long dim) {
            if (dataset.length != nRows * dim) {
                throw new IllegalArgumentException("dataset shape mismatch");
            }
            try (Arena a = Arena.ofConfined()) {
                MemorySegment data = a.allocateFrom(ValueLayout.JAVA_FLOAT, dataset);
                MemorySegment out = a.allocate(C_PTR);
                check((int) MG_BUILD.invokeExact(
                        cstr(a, algo), cstr(a, mode), cstr(a, metric),
                        cstr(a, paramsJson), tensor(a, data, nRows, dim), out));
                return new MgIndex(out.get(C_PTR, 0));
            } catch (Throwable t) {
                throw wrap(t);
            }
        }

        /** Search k neighbors across the mesh (all-gather top-k merge). */
        public SearchResult search(String paramsJson, float[] queries,
                                   long nQueries, long dim, long k) {
            if (queries.length != nQueries * dim) {
                throw new IllegalArgumentException("query shape mismatch");
            }
            try (Arena a = Arena.ofConfined()) {
                MemorySegment q = a.allocateFrom(ValueLayout.JAVA_FLOAT, queries);
                MemorySegment dist =
                        a.allocate(ValueLayout.JAVA_FLOAT, nQueries * k);
                MemorySegment ids = a.allocate(ValueLayout.JAVA_INT, nQueries * k);
                check((int) MG_SEARCH.invokeExact(
                        handle, cstr(a, paramsJson),
                        tensor(a, q, nQueries, dim), k, dist, ids));
                return new SearchResult(
                        dist.toArray(ValueLayout.JAVA_FLOAT),
                        ids.toArray(ValueLayout.JAVA_INT));
            } catch (Throwable t) {
                throw wrap(t);
            }
        }

        @Override
        public void close() {
            if (handle != null) {
                try {
                    check((int) MG_DESTROY.invokeExact(handle));
                } catch (Throwable t) {
                    throw wrap(t);
                } finally {
                    handle = null;
                }
            }
        }
    }

    /* ---- Typed per-algo API over DLPack (the reference Java binding's
     * CagraIndexParams/IvfPqIndexParams records, Panama layouts hand-
     * built against capi/cuvs_tpu.h; offsets + sizes machine-checked by
     * tests/test_bindings_lockstep.py). ---- */

    private static final ValueLayout.OfByte C_BYTE = ValueLayout.JAVA_BYTE;
    private static final ValueLayout.OfShort C_SHORT = ValueLayout.JAVA_SHORT;
    private static final ValueLayout.OfDouble C_DOUBLE = ValueLayout.JAVA_DOUBLE;

    private static final MethodHandle IVF_FLAT_BUILD = handle(
            "cuvsTpuIvfFlatBuild",
            FunctionDescriptor.of(C_INT, C_PTR, C_PTR, C_PTR, C_PTR));
    private static final MethodHandle IVF_FLAT_SEARCH = handle(
            "cuvsTpuIvfFlatSearch",
            FunctionDescriptor.of(C_INT, C_PTR, C_PTR, C_PTR, C_PTR, C_PTR));
    private static final MethodHandle IVF_PQ_BUILD = handle(
            "cuvsTpuIvfPqBuild",
            FunctionDescriptor.of(C_INT, C_PTR, C_PTR, C_PTR, C_PTR));
    private static final MethodHandle IVF_PQ_SEARCH = handle(
            "cuvsTpuIvfPqSearch",
            FunctionDescriptor.of(C_INT, C_PTR, C_PTR, C_PTR, C_PTR, C_PTR));
    private static final MethodHandle CAGRA_BUILD = handle(
            "cuvsTpuCagraBuild",
            FunctionDescriptor.of(C_INT, C_PTR, C_PTR, C_PTR, C_PTR));
    private static final MethodHandle CAGRA_SEARCH = handle(
            "cuvsTpuCagraSearch",
            FunctionDescriptor.of(C_INT, C_PTR, C_PTR, C_PTR, C_PTR, C_PTR));

    /** cuvsTpuIvfFlatIndexParams_t (natural LP64 layout). */
    public record IvfFlatIndexParams(long nLists, long kmeansNIters,
            double kmeansTrainsetFraction, boolean adaptiveCenters,
            boolean addDataOnBuild) {
        MemorySegment seg(Arena a) {
            MemorySegment s = a.allocate(32);
            s.set(C_LONG, 0, nLists);
            s.set(C_LONG, 8, kmeansNIters);
            s.set(C_DOUBLE, 16, kmeansTrainsetFraction);
            s.set(C_INT, 24, adaptiveCenters ? 1 : 0);
            s.set(C_INT, 28, addDataOnBuild ? 1 : 0);
            return s;
        }
    }

    /** cuvsTpuIvfFlatSearchParams_t. */
    public record IvfFlatSearchParams(long nProbes, double recallTarget) {
        MemorySegment seg(Arena a) {
            MemorySegment s = a.allocate(16);
            s.set(C_LONG, 0, nProbes);
            s.set(C_DOUBLE, 8, recallTarget);
            return s;
        }
    }

    /** cuvsTpuIvfPqIndexParams_t. */
    public record IvfPqIndexParams(long nLists, long pqDim, long pqBits,
            long kmeansNIters, boolean forceRandomRotation,
            String codebookKind) {
        MemorySegment seg(Arena a) {
            MemorySegment s = a.allocate(48);
            s.set(C_LONG, 0, nLists);
            s.set(C_LONG, 8, pqDim);
            s.set(C_LONG, 16, pqBits);
            s.set(C_LONG, 24, kmeansNIters);
            s.set(C_INT, 32, forceRandomRotation ? 1 : 0);
            s.set(C_PTR, 40, cstr(a, codebookKind));
            return s;
        }
    }

    /** cuvsTpuIvfPqSearchParams_t. lutDtype null keeps the full-precision
     * ADC LUT; "int8" runs the fused scoring matmul at the doubled int8
     * MXU rate (the reference lut_dtype knob). */
    public record IvfPqSearchParams(long nProbes, double recallTarget,
            String lutDtype) {
        MemorySegment seg(Arena a) {
            MemorySegment s = a.allocate(24);
            s.set(C_LONG, 0, nProbes);
            s.set(C_DOUBLE, 8, recallTarget);
            s.set(C_PTR, 16, cstr(a, lutDtype));
            return s;
        }
    }

    /** cuvsTpuCagraIndexParams_t. */
    public record CagraIndexParams(long intermediateGraphDegree,
            long graphDegree, String buildAlgo,
            boolean guaranteeConnectivity) {
        MemorySegment seg(Arena a) {
            MemorySegment s = a.allocate(32);
            s.set(C_LONG, 0, intermediateGraphDegree);
            s.set(C_LONG, 8, graphDegree);
            s.set(C_PTR, 16, cstr(a, buildAlgo));
            s.set(C_INT, 24, guaranteeConnectivity ? 1 : 0);
            return s;
        }
    }

    /** cuvsTpuCagraSearchParams_t. */
    public record CagraSearchParams(long itopkSize, long searchWidth,
            long maxIterations) {
        MemorySegment seg(Arena a) {
            MemorySegment s = a.allocate(24);
            s.set(C_LONG, 0, itopkSize);
            s.set(C_LONG, 8, searchWidth);
            s.set(C_LONG, 16, maxIterations);
            return s;
        }
    }

    /** Row-major 2-D host DLManagedTensor (dlpack.h, LP64: 64 bytes). */
    private static MemorySegment dlTensor(Arena a, MemorySegment data,
                                          byte code, byte bits,
                                          long nRows, long nCols) {
        MemorySegment shape = a.allocate(C_LONG, 2);
        shape.set(C_LONG, 0, nRows);
        shape.set(C_LONG, 8, nCols);
        MemorySegment t = a.allocate(64);
        t.set(C_PTR, 0, data);                   // dl_tensor.data
        t.set(C_INT, 8, 1 /* kDLCPU */);          // device.device_type
        t.set(C_INT, 12, 0);                      // device.device_id
        t.set(C_INT, 16, 2);                      // ndim
        t.set(C_BYTE, 20, code);                  // dtype.code
        t.set(C_BYTE, 21, bits);                  // dtype.bits
        t.set(C_SHORT, 22, (short) 1);            // dtype.lanes
        t.set(C_PTR, 24, shape);                  // shape
        t.set(C_PTR, 32, MemorySegment.NULL);     // strides (compact)
        t.set(C_LONG, 40, 0);                     // byte_offset
        t.set(C_PTR, 48, MemorySegment.NULL);     // manager_ctx
        t.set(C_PTR, 56, MemorySegment.NULL);     // deleter
        return t;
    }

    private static final byte DL_FLOAT = 2;  // kDLFloat
    private static final byte DL_INT = 0;    // kDLInt

    private static Index typedBuild(MethodHandle mh, MemorySegment params,
                                    String metric, float[] dataset,
                                    long nRows, long dim, Arena a) {
        if (dataset.length != nRows * dim) {
            throw new IllegalArgumentException("dataset shape mismatch");
        }
        try {
            MemorySegment data = a.allocateFrom(ValueLayout.JAVA_FLOAT, dataset);
            MemorySegment t = dlTensor(a, data, DL_FLOAT, (byte) 32, nRows, dim);
            MemorySegment out = a.allocate(C_PTR);
            check((int) mh.invokeExact(params, cstr(a, metric), t, out));
            return new Index(out.get(C_PTR, 0));
        } catch (Throwable t) {
            throw wrap(t);
        }
    }

    private static SearchResult typedSearch(MethodHandle mh,
                                            MemorySegment idxHandle,
                                            MemorySegment params,
                                            float[] queries, long nQueries,
                                            long dim, long k, Arena a) {
        if (queries.length != nQueries * dim) {
            throw new IllegalArgumentException("query shape mismatch");
        }
        try {
            MemorySegment q = a.allocateFrom(ValueLayout.JAVA_FLOAT, queries);
            MemorySegment dist = a.allocate(ValueLayout.JAVA_FLOAT, nQueries * k);
            MemorySegment ids = a.allocate(ValueLayout.JAVA_INT, nQueries * k);
            MemorySegment qt = dlTensor(a, q, DL_FLOAT, (byte) 32, nQueries, dim);
            MemorySegment dt = dlTensor(a, dist, DL_FLOAT, (byte) 32, nQueries, k);
            MemorySegment it = dlTensor(a, ids, DL_INT, (byte) 32, nQueries, k);
            check((int) mh.invokeExact(idxHandle, params, qt, dt, it));
            return new SearchResult(
                    dist.toArray(ValueLayout.JAVA_FLOAT),
                    ids.toArray(ValueLayout.JAVA_INT));
        } catch (Throwable t) {
            throw wrap(t);
        }
    }

    /** Typed IVF-Flat build (cuvsTpuIvfFlatBuild). */
    public static Index buildIvfFlat(IvfFlatIndexParams p, String metric,
                                     float[] dataset, long nRows, long dim) {
        try (Arena a = Arena.ofConfined()) {
            return typedBuild(IVF_FLAT_BUILD, p.seg(a), metric, dataset, nRows, dim, a);
        }
    }

    /** Typed IVF-Flat search (cuvsTpuIvfFlatSearch). */
    public static SearchResult searchIvfFlat(Index idx, IvfFlatSearchParams p,
                                             float[] queries, long nQueries,
                                             long dim, long k) {
        try (Arena a = Arena.ofConfined()) {
            return typedSearch(IVF_FLAT_SEARCH, idx.handle, p.seg(a),
                               queries, nQueries, dim, k, a);
        }
    }

    /** Typed IVF-PQ build (cuvsTpuIvfPqBuild). */
    public static Index buildIvfPq(IvfPqIndexParams p, String metric,
                                   float[] dataset, long nRows, long dim) {
        try (Arena a = Arena.ofConfined()) {
            return typedBuild(IVF_PQ_BUILD, p.seg(a), metric, dataset, nRows, dim, a);
        }
    }

    /** Typed IVF-PQ search (cuvsTpuIvfPqSearch). */
    public static SearchResult searchIvfPq(Index idx, IvfPqSearchParams p,
                                           float[] queries, long nQueries,
                                           long dim, long k) {
        try (Arena a = Arena.ofConfined()) {
            return typedSearch(IVF_PQ_SEARCH, idx.handle, p.seg(a),
                               queries, nQueries, dim, k, a);
        }
    }

    /** Typed CAGRA build (cuvsTpuCagraBuild). */
    public static Index buildCagra(CagraIndexParams p, String metric,
                                   float[] dataset, long nRows, long dim) {
        try (Arena a = Arena.ofConfined()) {
            return typedBuild(CAGRA_BUILD, p.seg(a), metric, dataset, nRows, dim, a);
        }
    }

    /** Typed CAGRA search (cuvsTpuCagraSearch). */
    public static SearchResult searchCagra(Index idx, CagraSearchParams p,
                                           float[] queries, long nQueries,
                                           long dim, long k) {
        try (Arena a = Arena.ofConfined()) {
            return typedSearch(CAGRA_SEARCH, idx.handle, p.seg(a),
                               queries, nQueries, dim, k, a);
        }
    }
}
