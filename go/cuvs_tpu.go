// Package cuvstpu is the Go binding for cuvs_tpu (TPU-native vector
// search) over its C ABI (capi/cuvs_tpu.h).
//
// Mirrors the reference Go binding's surface (go/brute_force,
// go/ivf_flat, ... — cgo over the cuVS C API) as one thin package:
// Index/MgIndex handles with Build/Search/Extend/Serialize and Go-error
// propagation of the thread-local last-error text.
//
// Build: `make -C ../capi` first (produces libcuvs_tpu_c.so, which
// embeds the Python runtime that drives the TPU through JAX).
//
// NOTE: no Go toolchain ships in the development image this package was
// authored in; it is kept in lock-step with the frozen C ABI baseline
// (ci/c_abi_baseline.txt) and validated through the compiled C tests.
package cuvstpu

/*
#cgo CFLAGS: -I${SRCDIR}/../capi
#cgo LDFLAGS: -L${SRCDIR}/../capi -lcuvs_tpu_c
#include <stdlib.h>
#include "cuvs_tpu.h"
*/
import "C"

import (
	"errors"
	"fmt"
	"runtime"
	"unsafe"
)

// Dtype enumerates element types for typed tensors (cuvsTpuDtype_t).
type Dtype int

const (
	F32 Dtype = 0
	F16 Dtype = 1
	I8  Dtype = 2
	U8  Dtype = 3
)

func lastError() error {
	msg := C.GoString(C.cuvsTpuGetLastError())
	if msg == "" {
		msg = "unknown error"
	}
	return errors.New("cuvs_tpu: " + msg)
}

func check(code C.cuvsTpuError_t) error {
	if code == C.CUVS_TPU_SUCCESS {
		return nil
	}
	return lastError()
}

func cOrNil(s string) *C.char {
	if s == "" {
		return nil
	}
	return C.CString(s)
}

func freeIf(p *C.char) {
	if p != nil {
		C.free(unsafe.Pointer(p))
	}
}

// Init initializes the runtime. platform: "tpu", "cpu" or "" for the
// default backend. Idempotent.
func Init(platform string) error {
	p := cOrNil(platform)
	defer freeIf(p)
	return check(C.cuvsTpuInit(p))
}

// Sync blocks until all issued device work completes.
func Sync() error {
	return check(C.cuvsTpuSync())
}

// Index is a single-chip index handle (algo: "brute_force", "ivf_flat",
// "ivf_pq", "ivf_sq", "ivf_rabitq", "cagra").
type Index struct {
	handle C.cuvsTpuIndex_t
}

// BuildIndex builds an index over a row-major [nRows, dim] f32 slice.
// paramsJSON carries algo build params (e.g. `{"n_lists": 256}`), "" for
// defaults.
func BuildIndex(algo, metric, paramsJSON string, dataset []float32, nRows, dim int) (*Index, error) {
	if len(dataset) != nRows*dim {
		return nil, fmt.Errorf("cuvs_tpu: dataset has %d elements, want %d", len(dataset), nRows*dim)
	}
	a, m, p := C.CString(algo), C.CString(metric), cOrNil(paramsJSON)
	defer C.free(unsafe.Pointer(a))
	defer C.free(unsafe.Pointer(m))
	defer freeIf(p)
	idx := &Index{}
	err := check(C.cuvsTpuIndexBuild(
		a, m, p,
		(*C.float)(unsafe.Pointer(&dataset[0])),
		C.int64_t(nRows), C.int64_t(dim), &idx.handle,
	))
	if err != nil {
		return nil, err
	}
	runtime.SetFinalizer(idx, func(i *Index) { i.Close() })
	return idx, nil
}

// Search finds k neighbors for row-major [nQueries, dim] queries.
// Returns flat [nQueries*k] distance and neighbor-id slices.
func (idx *Index) Search(paramsJSON string, queries []float32, nQueries, dim, k int) ([]float32, []int32, error) {
	if len(queries) != nQueries*dim {
		return nil, nil, fmt.Errorf("cuvs_tpu: queries have %d elements, want %d", len(queries), nQueries*dim)
	}
	p := cOrNil(paramsJSON)
	defer freeIf(p)
	dist := make([]float32, nQueries*k)
	ids := make([]int32, nQueries*k)
	err := check(C.cuvsTpuIndexSearch(
		idx.handle, p,
		(*C.float)(unsafe.Pointer(&queries[0])),
		C.int64_t(nQueries), C.int64_t(dim), C.int64_t(k),
		(*C.float)(unsafe.Pointer(&dist[0])),
		(*C.int32_t)(unsafe.Pointer(&ids[0])),
	))
	if err != nil {
		return nil, nil, err
	}
	return dist, ids, nil
}

// Extend appends rows to the index in place (per-algo extend semantics).
func (idx *Index) Extend(newRows []float32, nRows, dim int) error {
	if len(newRows) != nRows*dim {
		return fmt.Errorf("cuvs_tpu: rows have %d elements, want %d", len(newRows), nRows*dim)
	}
	t := C.cuvsTpuTensor_t{
		data:   unsafe.Pointer(&newRows[0]),
		dtype:  C.CUVS_TPU_F32,
		n_rows: C.int64_t(nRows),
		n_cols: C.int64_t(dim),
	}
	return check(C.cuvsTpuIndexExtend(idx.handle, &t))
}

// Serialize writes the index to path (validated npz container).
func (idx *Index) Serialize(path string) error {
	p := C.CString(path)
	defer C.free(unsafe.Pointer(p))
	return check(C.cuvsTpuIndexSerialize(idx.handle, p))
}

// DeserializeIndex reads an index back from path.
func DeserializeIndex(path string) (*Index, error) {
	p := C.CString(path)
	defer C.free(unsafe.Pointer(p))
	idx := &Index{}
	if err := check(C.cuvsTpuIndexDeserialize(p, &idx.handle)); err != nil {
		return nil, err
	}
	runtime.SetFinalizer(idx, func(i *Index) { i.Close() })
	return idx, nil
}

// Close releases the index handle. Safe to call more than once.
func (idx *Index) Close() error {
	if idx.handle == nil {
		return nil
	}
	err := check(C.cuvsTpuIndexDestroy(idx.handle))
	idx.handle = nil
	runtime.SetFinalizer(idx, nil)
	return err
}

// MgIndex is a multi-chip index over the full local device mesh
// (mode: "sharded" or "replicated"; SNMG analog).
type MgIndex struct {
	handle C.cuvsTpuMgIndex_t
}

// BuildMgIndex builds a multi-chip index over a row-major f32 dataset.
func BuildMgIndex(algo, mode, metric, paramsJSON string, dataset []float32, nRows, dim int) (*MgIndex, error) {
	if len(dataset) != nRows*dim {
		return nil, fmt.Errorf("cuvs_tpu: dataset has %d elements, want %d", len(dataset), nRows*dim)
	}
	a, mo, m, p := C.CString(algo), C.CString(mode), C.CString(metric), cOrNil(paramsJSON)
	defer C.free(unsafe.Pointer(a))
	defer C.free(unsafe.Pointer(mo))
	defer C.free(unsafe.Pointer(m))
	defer freeIf(p)
	t := C.cuvsTpuTensor_t{
		data:   unsafe.Pointer(&dataset[0]),
		dtype:  C.CUVS_TPU_F32,
		n_rows: C.int64_t(nRows),
		n_cols: C.int64_t(dim),
	}
	idx := &MgIndex{}
	if err := check(C.cuvsTpuMgBuild(a, mo, m, p, &t, &idx.handle)); err != nil {
		return nil, err
	}
	runtime.SetFinalizer(idx, func(i *MgIndex) { i.Close() })
	return idx, nil
}

// Search finds k neighbors across the mesh with the all-gather merge.
func (idx *MgIndex) Search(paramsJSON string, queries []float32, nQueries, dim, k int) ([]float32, []int32, error) {
	if len(queries) != nQueries*dim {
		return nil, nil, fmt.Errorf("cuvs_tpu: queries have %d elements, want %d", len(queries), nQueries*dim)
	}
	p := cOrNil(paramsJSON)
	defer freeIf(p)
	t := C.cuvsTpuTensor_t{
		data:   unsafe.Pointer(&queries[0]),
		dtype:  C.CUVS_TPU_F32,
		n_rows: C.int64_t(nQueries),
		n_cols: C.int64_t(dim),
	}
	dist := make([]float32, nQueries*k)
	ids := make([]int32, nQueries*k)
	err := check(C.cuvsTpuMgSearch(
		idx.handle, p, &t, C.int64_t(k),
		(*C.float)(unsafe.Pointer(&dist[0])),
		(*C.int32_t)(unsafe.Pointer(&ids[0])),
	))
	if err != nil {
		return nil, nil, err
	}
	return dist, ids, nil
}

// Serialize writes per-shard files plus a distribution header.
func (idx *MgIndex) Serialize(path string) error {
	p := C.CString(path)
	defer C.free(unsafe.Pointer(p))
	return check(C.cuvsTpuMgSerialize(idx.handle, p))
}

// DeserializeMgIndex reads a multi-chip index back from path.
func DeserializeMgIndex(path string) (*MgIndex, error) {
	p := C.CString(path)
	defer C.free(unsafe.Pointer(p))
	idx := &MgIndex{}
	if err := check(C.cuvsTpuMgDeserialize(p, &idx.handle)); err != nil {
		return nil, err
	}
	runtime.SetFinalizer(idx, func(i *MgIndex) { i.Close() })
	return idx, nil
}

// Close releases the multi-chip index handle. Safe to call twice.
func (idx *MgIndex) Close() error {
	if idx.handle == nil {
		return nil
	}
	err := check(C.cuvsTpuMgDestroy(idx.handle))
	idx.handle = nil
	runtime.SetFinalizer(idx, nil)
	return err
}

/* ---- Typed per-algo API over DLPack (the reference's Go surface
 * shape: go/cuvs/ivf_flat, ivf_pq, cagra packages expose typed param
 * structs compiled against the C headers; here they live in one
 * package, field-for-field against capi/cuvs_tpu.h and machine-checked
 * by tests/test_bindings_lockstep.py). ---- */

// IvfFlatIndexParams mirrors cuvsTpuIvfFlatIndexParams_t.
type IvfFlatIndexParams struct {
	NLists                 int64
	KmeansNIters           int64
	KmeansTrainsetFraction float64
	AdaptiveCenters        bool
	AddDataOnBuild         bool
}

// IvfFlatSearchParams mirrors cuvsTpuIvfFlatSearchParams_t.
type IvfFlatSearchParams struct {
	NProbes      int64
	RecallTarget float64
}

// IvfPqIndexParams mirrors cuvsTpuIvfPqIndexParams_t.
type IvfPqIndexParams struct {
	NLists              int64
	PqDim               int64
	PqBits              int64
	KmeansNIters        int64
	ForceRandomRotation bool
	CodebookKind        string
}

// IvfPqSearchParams mirrors cuvsTpuIvfPqSearchParams_t. LutDtype ""
// keeps the full-precision ADC LUT; "int8" runs the fused scoring
// matmul at the doubled int8 MXU rate (reference lut_dtype knob).
type IvfPqSearchParams struct {
	NProbes      int64
	RecallTarget float64
	LutDtype     string
}

// CagraIndexParams mirrors cuvsTpuCagraIndexParams_t.
type CagraIndexParams struct {
	IntermediateGraphDegree int64
	GraphDegree             int64
	BuildAlgo               string
	GuaranteeConnectivity   bool
}

// CagraSearchParams mirrors cuvsTpuCagraSearchParams_t.
type CagraSearchParams struct {
	ItopkSize     int64
	SearchWidth   int64
	MaxIterations int64
}

func b2i(b bool) C.int32_t {
	if b {
		return 1
	}
	return 0
}

// dlTensor2D wraps a row-major 2-D host buffer as a CPU DLManagedTensor.
// The shape array must outlive the C call — callers keep it in their
// stack frame and pass its address.
func dlTensor2D(data unsafe.Pointer, code C.uint8_t, bits C.uint8_t,
	shape *[2]C.int64_t) C.DLManagedTensor {
	return C.DLManagedTensor{
		dl_tensor: C.DLTensor{
			data:        data,
			device:      C.DLDevice{device_type: C.kDLCPU, device_id: 0},
			ndim:        2,
			dtype:       C.DLDataType{code: code, bits: bits, lanes: 1},
			shape:       &shape[0],
			strides:     nil,
			byte_offset: 0,
		},
	}
}

func typedSearch(call func(*C.DLManagedTensor, *C.DLManagedTensor, *C.DLManagedTensor) C.cuvsTpuError_t,
	queries []float32, nQueries, dim, k int) ([]float32, []int32, error) {
	if len(queries) != nQueries*dim {
		return nil, nil, fmt.Errorf("cuvs_tpu: queries have %d elements, want %d", len(queries), nQueries*dim)
	}
	qShape := [2]C.int64_t{C.int64_t(nQueries), C.int64_t(dim)}
	oShape := [2]C.int64_t{C.int64_t(nQueries), C.int64_t(k)}
	dist := make([]float32, nQueries*k)
	ids := make([]int32, nQueries*k)
	qt := dlTensor2D(unsafe.Pointer(&queries[0]), C.kDLFloat, 32, &qShape)
	dt := dlTensor2D(unsafe.Pointer(&dist[0]), C.kDLFloat, 32, &oShape)
	it := dlTensor2D(unsafe.Pointer(&ids[0]), C.kDLInt, 32, &oShape)
	if err := check(call(&qt, &dt, &it)); err != nil {
		return nil, nil, err
	}
	return dist, ids, nil
}

// BuildIvfFlat builds an IVF-Flat index through the typed DLPack endpoint.
func BuildIvfFlat(params IvfFlatIndexParams, metric string, dataset []float32, nRows, dim int) (*Index, error) {
	if len(dataset) != nRows*dim {
		return nil, fmt.Errorf("cuvs_tpu: dataset has %d elements, want %d", len(dataset), nRows*dim)
	}
	cp := C.cuvsTpuIvfFlatIndexParams_t{
		n_lists:                  C.int64_t(params.NLists),
		kmeans_n_iters:           C.int64_t(params.KmeansNIters),
		kmeans_trainset_fraction: C.double(params.KmeansTrainsetFraction),
		adaptive_centers:         b2i(params.AdaptiveCenters),
		add_data_on_build:        b2i(params.AddDataOnBuild),
	}
	m := C.CString(metric)
	defer C.free(unsafe.Pointer(m))
	shape := [2]C.int64_t{C.int64_t(nRows), C.int64_t(dim)}
	t := dlTensor2D(unsafe.Pointer(&dataset[0]), C.kDLFloat, 32, &shape)
	idx := &Index{}
	if err := check(C.cuvsTpuIvfFlatBuild(&cp, m, &t, &idx.handle)); err != nil {
		return nil, err
	}
	runtime.SetFinalizer(idx, func(i *Index) { i.Close() })
	return idx, nil
}

// SearchIvfFlat searches an IVF-Flat index with typed params.
func (idx *Index) SearchIvfFlat(params IvfFlatSearchParams, queries []float32, nQueries, dim, k int) ([]float32, []int32, error) {
	cp := C.cuvsTpuIvfFlatSearchParams_t{
		n_probes:      C.int64_t(params.NProbes),
		recall_target: C.double(params.RecallTarget),
	}
	return typedSearch(func(q, d, i *C.DLManagedTensor) C.cuvsTpuError_t {
		return C.cuvsTpuIvfFlatSearch(idx.handle, &cp, q, d, i)
	}, queries, nQueries, dim, k)
}

// BuildIvfPq builds an IVF-PQ index through the typed DLPack endpoint.
func BuildIvfPq(params IvfPqIndexParams, metric string, dataset []float32, nRows, dim int) (*Index, error) {
	if len(dataset) != nRows*dim {
		return nil, fmt.Errorf("cuvs_tpu: dataset has %d elements, want %d", len(dataset), nRows*dim)
	}
	kind := cOrNil(params.CodebookKind)
	defer freeIf(kind)
	cp := C.cuvsTpuIvfPqIndexParams_t{
		n_lists:               C.int64_t(params.NLists),
		pq_dim:                C.int64_t(params.PqDim),
		pq_bits:               C.int64_t(params.PqBits),
		kmeans_n_iters:        C.int64_t(params.KmeansNIters),
		force_random_rotation: b2i(params.ForceRandomRotation),
		codebook_kind:         kind,
	}
	m := C.CString(metric)
	defer C.free(unsafe.Pointer(m))
	shape := [2]C.int64_t{C.int64_t(nRows), C.int64_t(dim)}
	t := dlTensor2D(unsafe.Pointer(&dataset[0]), C.kDLFloat, 32, &shape)
	idx := &Index{}
	if err := check(C.cuvsTpuIvfPqBuild(&cp, m, &t, &idx.handle)); err != nil {
		return nil, err
	}
	runtime.SetFinalizer(idx, func(i *Index) { i.Close() })
	return idx, nil
}

// SearchIvfPq searches an IVF-PQ index with typed params.
func (idx *Index) SearchIvfPq(params IvfPqSearchParams, queries []float32, nQueries, dim, k int) ([]float32, []int32, error) {
	lut := cOrNil(params.LutDtype)
	defer freeIf(lut)
	cp := C.cuvsTpuIvfPqSearchParams_t{
		n_probes:      C.int64_t(params.NProbes),
		recall_target: C.double(params.RecallTarget),
		lut_dtype:     lut,
	}
	return typedSearch(func(q, d, i *C.DLManagedTensor) C.cuvsTpuError_t {
		return C.cuvsTpuIvfPqSearch(idx.handle, &cp, q, d, i)
	}, queries, nQueries, dim, k)
}

// BuildCagra builds a CAGRA graph index through the typed DLPack endpoint.
func BuildCagra(params CagraIndexParams, metric string, dataset []float32, nRows, dim int) (*Index, error) {
	if len(dataset) != nRows*dim {
		return nil, fmt.Errorf("cuvs_tpu: dataset has %d elements, want %d", len(dataset), nRows*dim)
	}
	algo := cOrNil(params.BuildAlgo)
	defer freeIf(algo)
	cp := C.cuvsTpuCagraIndexParams_t{
		intermediate_graph_degree: C.int64_t(params.IntermediateGraphDegree),
		graph_degree:              C.int64_t(params.GraphDegree),
		build_algo:                algo,
		guarantee_connectivity:    b2i(params.GuaranteeConnectivity),
	}
	m := C.CString(metric)
	defer C.free(unsafe.Pointer(m))
	shape := [2]C.int64_t{C.int64_t(nRows), C.int64_t(dim)}
	t := dlTensor2D(unsafe.Pointer(&dataset[0]), C.kDLFloat, 32, &shape)
	idx := &Index{}
	if err := check(C.cuvsTpuCagraBuild(&cp, m, &t, &idx.handle)); err != nil {
		return nil, err
	}
	runtime.SetFinalizer(idx, func(i *Index) { i.Close() })
	return idx, nil
}

// SearchCagra beam-searches a CAGRA index with typed params.
func (idx *Index) SearchCagra(params CagraSearchParams, queries []float32, nQueries, dim, k int) ([]float32, []int32, error) {
	cp := C.cuvsTpuCagraSearchParams_t{
		itopk_size:     C.int64_t(params.ItopkSize),
		search_width:   C.int64_t(params.SearchWidth),
		max_iterations: C.int64_t(params.MaxIterations),
	}
	return typedSearch(func(q, d, i *C.DLManagedTensor) C.cuvsTpuError_t {
		return C.cuvsTpuCagraSearch(idx.handle, &cp, q, d, i)
	}, queries, nQueries, dim, k)
}
