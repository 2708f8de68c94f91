"""Rust/Go/Java bindings stay in lock-step with the C ABI.

The reference ships Rust/Go/Java bindings compiled against its C API
(/root/reference/rust, /root/reference/go, /root/reference/java). Their
toolchains are absent from this image, so the wrappers here are
source-only — these tests machine-check what a compiler would: every C
symbol a binding declares exists in capi/cuvs_tpu.h, and the param
structs mirror the header field-for-field.
"""

import pathlib
import re

ROOT = pathlib.Path(__file__).resolve().parent.parent
HEADER = (ROOT / "capi" / "cuvs_tpu.h").read_text()
HEADER_SYMS = set(re.findall(r"\b(cuvsTpu[A-Za-z0-9_]+)\s*\(", HEADER))


def _declared(path: pathlib.Path, pattern: str) -> set:
    return set(re.findall(pattern, path.read_text()))


def test_rust_ffi_symbols_exist():
    ffi = ROOT / "rust" / "cuvs-tpu" / "src" / "ffi.rs"
    syms = _declared(ffi, r"pub fn (cuvsTpu[A-Za-z0-9_]+)")
    assert syms, "no FFI declarations found"
    missing = syms - HEADER_SYMS
    assert not missing, f"rust declares symbols absent from the header: {missing}"


def test_go_symbols_exist():
    go = ROOT / "go" / "cuvs_tpu.go"
    syms = _declared(go, r"C\.(cuvsTpu[A-Za-z0-9_]+)\(")
    assert syms, "no cgo calls found"
    missing = syms - HEADER_SYMS
    assert not missing, f"go calls symbols absent from the header: {missing}"


def test_java_symbols_exist():
    java = ROOT / "java" / "src" / "main" / "java" / "com" / "cuvstpu" / "CuvsTpu.java"
    syms = _declared(java, r'"(cuvsTpu[A-Za-z0-9_]+)"')
    assert syms, "no downcall symbols found"
    missing = syms - HEADER_SYMS
    assert not missing, f"java binds symbols absent from the header: {missing}"


def _header_struct_fields(name: str):
    m = re.search(r"typedef struct \{([^}]*)\} " + name + ";", HEADER)
    assert m, f"{name} not in header"
    fields = []
    for line in m.group(1).splitlines():
        line = re.sub(r"/\*.*?\*/", "", line).strip().rstrip(";")
        if not line:
            continue
        fields.append(line.split()[-1].lstrip("*"))
    return fields


def test_rust_param_structs_mirror_header():
    ffi = (ROOT / "rust" / "cuvs-tpu" / "src" / "ffi.rs").read_text()
    pairs = {
        "cuvsTpuIvfFlatIndexParams_t": "IvfFlatIndexParams",
        "cuvsTpuIvfFlatSearchParams_t": "IvfFlatSearchParams",
        "cuvsTpuIvfPqIndexParams_t": "IvfPqIndexParams",
        "cuvsTpuIvfPqSearchParams_t": "IvfPqSearchParams",
        "cuvsTpuCagraIndexParams_t": "CagraIndexParams",
        "cuvsTpuCagraSearchParams_t": "CagraSearchParams",
        "cuvsTpuTensor_t": "Tensor",
    }
    for c_name, rs_name in pairs.items():
        m = re.search(r"pub struct " + rs_name + r" \{(.*?)\}", ffi, re.S)
        assert m, f"rust struct {rs_name} missing"
        rs_fields = re.findall(r"pub (\w+):", m.group(1))
        assert rs_fields == _header_struct_fields(c_name), (
            f"{rs_name} fields diverge from {c_name}"
        )


def test_abi_baseline_covers_binding_symbols():
    baseline = set(
        (ROOT / "ci" / "c_abi_baseline.txt").read_text().split()
    )
    ffi = ROOT / "rust" / "cuvs-tpu" / "src" / "ffi.rs"
    syms = _declared(ffi, r"pub fn (cuvsTpu[A-Za-z0-9_]+)")
    unguarded = syms - baseline
    assert not unguarded, (
        f"symbols used by bindings but not frozen in the ABI baseline: {unguarded}"
    )
