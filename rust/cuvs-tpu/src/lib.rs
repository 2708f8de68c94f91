//! Safe Rust API for cuvs_tpu — TPU-native vector search.
//!
//! Mirrors the reference Rust binding's surface (rust/cuvs/src: Resources
//! + per-algo index types over the C ABI) in one thin crate: RAII index
//! handles, slice-based build/search, `Result`-propagated errors carrying
//! the thread-local last-error text.
//!
//! ```no_run
//! use cuvs_tpu::{init, Index};
//! init(None).unwrap();
//! let data = vec![0f32; 1000 * 64];
//! let index = Index::build("cagra", "sqeuclidean", None, &data, 1000, 64).unwrap();
//! let q = vec![0f32; 8 * 64];
//! let (dist, ids) = index.search(None, &q, 8, 64, 10).unwrap();
//! assert_eq!(ids.len(), 8 * 10);
//! ```

pub mod ffi;

use std::ffi::{CStr, CString};
use std::os::raw::c_char;
use std::ptr;

pub use ffi::{Dtype, Tensor};

#[derive(Debug)]
pub struct Error(pub String);

impl std::fmt::Display for Error {
    fn fmt(&self, f: &mut std::fmt::Formatter<'_>) -> std::fmt::Result {
        write!(f, "cuvs_tpu: {}", self.0)
    }
}

impl std::error::Error for Error {}

pub type Result<T> = std::result::Result<T, Error>;

fn last_error() -> Error {
    unsafe {
        let p = ffi::cuvsTpuGetLastError();
        if p.is_null() {
            return Error("unknown error".into());
        }
        Error(CStr::from_ptr(p).to_string_lossy().into_owned())
    }
}

fn check(code: i32) -> Result<()> {
    if code == ffi::CUVS_TPU_SUCCESS {
        Ok(())
    } else {
        Err(last_error())
    }
}

fn cstr(s: &str) -> Result<CString> {
    CString::new(s).map_err(|e| Error(e.to_string()))
}

fn opt_cstr(s: Option<&str>) -> Result<Option<CString>> {
    s.map(cstr).transpose()
}

fn as_ptr(c: &Option<CString>) -> *const c_char {
    c.as_ref().map_or(ptr::null(), |v| v.as_ptr())
}

/// Initialize the runtime. `platform`: `"tpu"`, `"cpu"`, or `None` for
/// the default backend. Idempotent.
pub fn init(platform: Option<&str>) -> Result<()> {
    let p = opt_cstr(platform)?;
    check(unsafe { ffi::cuvsTpuInit(as_ptr(&p)) })
}

/// Block until all issued device work completes (stream-sync analog).
pub fn sync() -> Result<()> {
    check(unsafe { ffi::cuvsTpuSync() })
}

/// A single-chip index handle (any algo: `"brute_force"`, `"ivf_flat"`,
/// `"ivf_pq"`, `"ivf_sq"`, `"ivf_rabitq"`, `"cagra"`).
pub struct Index {
    handle: *mut ffi::IndexHandle,
}

// The C layer serializes calls on the embedded interpreter's GIL.
unsafe impl Send for Index {}

impl Index {
    /// Build from a row-major `[n_rows, dim]` f32 slice.
    /// `params_json`: algo build params, e.g. `Some("{\"n_lists\":256}")`.
    pub fn build(
        algo: &str,
        metric: &str,
        params_json: Option<&str>,
        dataset: &[f32],
        n_rows: usize,
        dim: usize,
    ) -> Result<Index> {
        assert_eq!(dataset.len(), n_rows * dim, "dataset shape mismatch");
        let (a, m, p) = (cstr(algo)?, cstr(metric)?, opt_cstr(params_json)?);
        let mut handle = ptr::null_mut();
        check(unsafe {
            ffi::cuvsTpuIndexBuild(
                a.as_ptr(),
                m.as_ptr(),
                as_ptr(&p),
                dataset.as_ptr(),
                n_rows as i64,
                dim as i64,
                &mut handle,
            )
        })?;
        Ok(Index { handle })
    }

    /// Typed build from a raw host buffer (f32/f16/i8/u8 datasets).
    ///
    /// # Safety
    /// `data` must point to a row-major `[n_rows, n_cols]` buffer of the
    /// dtype's element size that outlives this call.
    pub unsafe fn build_tensor(
        algo: &str,
        metric: &str,
        params_json: Option<&str>,
        data: *const std::os::raw::c_void,
        dtype: Dtype,
        n_rows: usize,
        n_cols: usize,
    ) -> Result<Index> {
        let (a, m, p) = (cstr(algo)?, cstr(metric)?, opt_cstr(params_json)?);
        let t = Tensor {
            data,
            dtype,
            n_rows: n_rows as i64,
            n_cols: n_cols as i64,
        };
        let mut handle = ptr::null_mut();
        check(ffi::cuvsTpuIndexBuildTensor(
            a.as_ptr(),
            m.as_ptr(),
            as_ptr(&p),
            &t,
            &mut handle,
        ))?;
        Ok(Index { handle })
    }

    /// Search `k` neighbors for row-major `[n_queries, dim]` queries.
    /// Returns `(distances, neighbors)` as flat `[n_queries * k]` vecs.
    pub fn search(
        &self,
        params_json: Option<&str>,
        queries: &[f32],
        n_queries: usize,
        dim: usize,
        k: usize,
    ) -> Result<(Vec<f32>, Vec<i32>)> {
        assert_eq!(queries.len(), n_queries * dim, "query shape mismatch");
        let p = opt_cstr(params_json)?;
        let mut dist = vec![0f32; n_queries * k];
        let mut ids = vec![0i32; n_queries * k];
        check(unsafe {
            ffi::cuvsTpuIndexSearch(
                self.handle,
                as_ptr(&p),
                queries.as_ptr(),
                n_queries as i64,
                dim as i64,
                k as i64,
                dist.as_mut_ptr(),
                ids.as_mut_ptr(),
            )
        })?;
        Ok((dist, ids))
    }

    /// Append rows (per-algo extend semantics); the handle updates in place.
    pub fn extend(&mut self, new_rows: &[f32], n_rows: usize, dim: usize) -> Result<()> {
        assert_eq!(new_rows.len(), n_rows * dim, "extend shape mismatch");
        let t = Tensor {
            data: new_rows.as_ptr().cast(),
            dtype: Dtype::F32,
            n_rows: n_rows as i64,
            n_cols: dim as i64,
        };
        check(unsafe { ffi::cuvsTpuIndexExtend(self.handle, &t) })
    }

    pub fn serialize(&self, path: &str) -> Result<()> {
        let p = cstr(path)?;
        check(unsafe { ffi::cuvsTpuIndexSerialize(self.handle, p.as_ptr()) })
    }

    pub fn deserialize(path: &str) -> Result<Index> {
        let p = cstr(path)?;
        let mut handle = ptr::null_mut();
        check(unsafe { ffi::cuvsTpuIndexDeserialize(p.as_ptr(), &mut handle) })?;
        Ok(Index { handle })
    }
}

impl Drop for Index {
    fn drop(&mut self) {
        unsafe {
            ffi::cuvsTpuIndexDestroy(self.handle);
        }
    }
}

/// A multi-chip index over the full local device mesh
/// (`mode`: `"sharded"` or `"replicated"`; SNMG analog).
pub struct MgIndex {
    handle: *mut ffi::MgIndexHandle,
}

unsafe impl Send for MgIndex {}

impl MgIndex {
    pub fn build(
        algo: &str,
        mode: &str,
        metric: &str,
        params_json: Option<&str>,
        dataset: &[f32],
        n_rows: usize,
        dim: usize,
    ) -> Result<MgIndex> {
        assert_eq!(dataset.len(), n_rows * dim, "dataset shape mismatch");
        let (a, mo, m, p) = (cstr(algo)?, cstr(mode)?, cstr(metric)?, opt_cstr(params_json)?);
        let t = Tensor {
            data: dataset.as_ptr().cast(),
            dtype: Dtype::F32,
            n_rows: n_rows as i64,
            n_cols: dim as i64,
        };
        let mut handle = ptr::null_mut();
        check(unsafe {
            ffi::cuvsTpuMgBuild(a.as_ptr(), mo.as_ptr(), m.as_ptr(), as_ptr(&p), &t, &mut handle)
        })?;
        Ok(MgIndex { handle })
    }

    pub fn search(
        &self,
        params_json: Option<&str>,
        queries: &[f32],
        n_queries: usize,
        dim: usize,
        k: usize,
    ) -> Result<(Vec<f32>, Vec<i32>)> {
        assert_eq!(queries.len(), n_queries * dim, "query shape mismatch");
        let p = opt_cstr(params_json)?;
        let t = Tensor {
            data: queries.as_ptr().cast(),
            dtype: Dtype::F32,
            n_rows: n_queries as i64,
            n_cols: dim as i64,
        };
        let mut dist = vec![0f32; n_queries * k];
        let mut ids = vec![0i32; n_queries * k];
        check(unsafe {
            ffi::cuvsTpuMgSearch(
                self.handle,
                as_ptr(&p),
                &t,
                k as i64,
                dist.as_mut_ptr(),
                ids.as_mut_ptr(),
            )
        })?;
        Ok((dist, ids))
    }

    pub fn serialize(&self, path: &str) -> Result<()> {
        let p = cstr(path)?;
        check(unsafe { ffi::cuvsTpuMgSerialize(self.handle, p.as_ptr()) })
    }

    pub fn deserialize(path: &str) -> Result<MgIndex> {
        let p = cstr(path)?;
        let mut handle = ptr::null_mut();
        check(unsafe { ffi::cuvsTpuMgDeserialize(p.as_ptr(), &mut handle) })?;
        Ok(MgIndex { handle })
    }
}

impl Drop for MgIndex {
    fn drop(&mut self) {
        unsafe {
            ffi::cuvsTpuMgDestroy(self.handle);
        }
    }
}
