fn main() {
    // libcuvs_tpu_c.so is produced by `make -C ../../capi` (embeds the
    // Python runtime that drives the TPU through JAX).
    println!("cargo:rustc-link-search=native=../../capi");
    println!("cargo:rustc-link-lib=dylib=cuvs_tpu_c");
}
