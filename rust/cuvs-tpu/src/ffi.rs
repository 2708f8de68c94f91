//! Raw FFI declarations for the cuvs_tpu C ABI (capi/cuvs_tpu.h).
//!
//! Reference counterpart: rust/cuvs/src/*(bindgen over the cuVS C API).
//! Kept hand-written and in lock-step with ci/c_abi_baseline.txt — the
//! CI gate fails if a symbol declared here leaves the header.

use std::os::raw::{c_char, c_double, c_void};

pub const CUVS_TPU_SUCCESS: i32 = 0;

#[repr(C)]
#[derive(Clone, Copy, PartialEq, Eq)]
pub enum Dtype {
    F32 = 0,
    F16 = 1,
    I8 = 2,
    U8 = 3,
}

/// Host tensor descriptor (row-major), `cuvsTpuTensor_t`.
#[repr(C)]
pub struct Tensor {
    pub data: *const c_void,
    pub dtype: Dtype,
    pub n_rows: i64,
    pub n_cols: i64,
}

/// `cuvsTpuIvfFlatIndexParams_t` (defaults: ivf_flat.hpp:28).
#[repr(C)]
pub struct IvfFlatIndexParams {
    pub n_lists: i64,
    pub kmeans_n_iters: i64,
    pub kmeans_trainset_fraction: c_double,
    pub adaptive_centers: i32,
    pub add_data_on_build: i32,
}

#[repr(C)]
pub struct IvfFlatSearchParams {
    pub n_probes: i64,
    pub recall_target: c_double,
}

/// `cuvsTpuIvfPqIndexParams_t` (defaults: ivf_pq.hpp:47).
#[repr(C)]
pub struct IvfPqIndexParams {
    pub n_lists: i64,
    pub pq_dim: i64,
    pub pq_bits: i64,
    pub kmeans_n_iters: i64,
    pub force_random_rotation: i32,
    pub codebook_kind: *const c_char,
}

#[repr(C)]
pub struct IvfPqSearchParams {
    pub n_probes: i64,
    pub recall_target: c_double,
    /// NULL/"float32" or "int8": quantize the fused ADC LUT (the
    /// reference's `lut_dtype`, ivf_pq.hpp:339).
    pub lut_dtype: *const c_char,
}

/// `cuvsTpuCagraIndexParams_t` (defaults: cagra.hpp:151).
#[repr(C)]
pub struct CagraIndexParams {
    pub intermediate_graph_degree: i64,
    pub graph_degree: i64,
    pub build_algo: *const c_char,
    pub guarantee_connectivity: i32,
}

#[repr(C)]
pub struct CagraSearchParams {
    pub itopk_size: i64,
    pub search_width: i64,
    pub max_iterations: i64,
}

pub enum IndexHandle {}
pub enum MgIndexHandle {}

extern "C" {
    pub fn cuvsTpuInit(platform: *const c_char) -> i32;
    pub fn cuvsTpuGetLastError() -> *const c_char;
    pub fn cuvsTpuClearLastError();
    pub fn cuvsTpuSync() -> i32;

    pub fn cuvsTpuIndexBuild(
        algo: *const c_char,
        metric: *const c_char,
        params_json: *const c_char,
        dataset: *const f32,
        n_rows: i64,
        dim: i64,
        out_index: *mut *mut IndexHandle,
    ) -> i32;

    pub fn cuvsTpuIndexBuildTensor(
        algo: *const c_char,
        metric: *const c_char,
        params_json: *const c_char,
        dataset: *const Tensor,
        out_index: *mut *mut IndexHandle,
    ) -> i32;

    pub fn cuvsTpuIndexSearch(
        index: *mut IndexHandle,
        params_json: *const c_char,
        queries: *const f32,
        n_queries: i64,
        dim: i64,
        k: i64,
        out_distances: *mut f32,
        out_neighbors: *mut i32,
    ) -> i32;

    pub fn cuvsTpuIndexSearchTensor(
        index: *mut IndexHandle,
        params_json: *const c_char,
        queries: *const Tensor,
        k: i64,
        out_distances: *mut f32,
        out_neighbors: *mut i32,
    ) -> i32;

    pub fn cuvsTpuIvfFlatIndexParamsDefault(p: *mut IvfFlatIndexParams);
    pub fn cuvsTpuIvfFlatSearchParamsDefault(p: *mut IvfFlatSearchParams);
    pub fn cuvsTpuIvfPqIndexParamsDefault(p: *mut IvfPqIndexParams);
    pub fn cuvsTpuIvfPqSearchParamsDefault(p: *mut IvfPqSearchParams);
    pub fn cuvsTpuCagraIndexParamsDefault(p: *mut CagraIndexParams);
    pub fn cuvsTpuCagraSearchParamsDefault(p: *mut CagraSearchParams);

    pub fn cuvsTpuIndexExtend(index: *mut IndexHandle, new_rows: *const Tensor) -> i32;
    pub fn cuvsTpuIndexSerialize(index: *mut IndexHandle, path: *const c_char) -> i32;
    pub fn cuvsTpuIndexDeserialize(path: *const c_char, out: *mut *mut IndexHandle) -> i32;
    pub fn cuvsTpuIndexDestroy(index: *mut IndexHandle) -> i32;

    pub fn cuvsTpuMgBuild(
        algo: *const c_char,
        mode: *const c_char,
        metric: *const c_char,
        params_json: *const c_char,
        dataset: *const Tensor,
        out_index: *mut *mut MgIndexHandle,
    ) -> i32;

    pub fn cuvsTpuMgSearch(
        index: *mut MgIndexHandle,
        params_json: *const c_char,
        queries: *const Tensor,
        k: i64,
        out_distances: *mut f32,
        out_neighbors: *mut i32,
    ) -> i32;

    pub fn cuvsTpuMgSerialize(index: *mut MgIndexHandle, path: *const c_char) -> i32;
    pub fn cuvsTpuMgDeserialize(path: *const c_char, out: *mut *mut MgIndexHandle) -> i32;
    pub fn cuvsTpuMgDestroy(index: *mut MgIndexHandle) -> i32;
}
