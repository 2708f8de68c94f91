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
}
