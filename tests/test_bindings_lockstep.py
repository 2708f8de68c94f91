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
    body = re.sub(r"/\*.*?\*/", "", m.group(1), flags=re.S)
    fields = []
    for line in body.splitlines():
        line = line.strip().rstrip(";")
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


def test_go_struct_literals_mirror_header():
    """Every named-field composite literal for a C struct in the Go source
    uses exactly the header's field names (what cgo's compiler would check)."""
    go = (ROOT / "go" / "cuvs_tpu.go").read_text()
    lits = re.findall(r"C\.(cuvsTpu\w+_t)\{(.*?)\}", go, re.S)
    assert lits, "no C struct literals found in go source"
    for c_name, body in lits:
        fields = set(re.findall(r"(\w+):", body))
        header_fields = set(_header_struct_fields(c_name))
        assert fields <= header_fields, (
            f"go literal for {c_name} names fields not in the header: "
            f"{fields - header_fields}"
        )


def test_go_param_structs_cover_all_header_fields():
    """The typed per-algo Go API must set EVERY field of each param
    struct (field-for-field parity, like the Rust check): a new header
    field that Go silently drops fails here."""
    go = (ROOT / "go" / "cuvs_tpu.go").read_text()
    param_structs = [
        "cuvsTpuIvfFlatIndexParams_t", "cuvsTpuIvfFlatSearchParams_t",
        "cuvsTpuIvfPqIndexParams_t", "cuvsTpuIvfPqSearchParams_t",
        "cuvsTpuCagraIndexParams_t", "cuvsTpuCagraSearchParams_t",
    ]
    for c_name in param_structs:
        m = re.search(r"C\." + c_name + r"\{(.*?)\}", go, re.S)
        assert m, f"go has no composite literal for {c_name}"
        fields = re.findall(r"(\w+):", m.group(1))
        assert fields == _header_struct_fields(c_name), (
            f"go literal for {c_name} fields {fields} != header "
            f"{_header_struct_fields(c_name)}"
        )


def test_go_dltensor_literals_match_dlpack():
    """The Go DLPack literals name only real dlpack.h struct fields."""
    go = (ROOT / "go" / "cuvs_tpu.go").read_text()
    dl = (ROOT / "capi" / "dlpack.h").read_text()
    for struct in ("DLManagedTensor", "DLTensor", "DLDevice", "DLDataType"):
        m = re.search(r"C\." + struct + r"\{(.*?)\n\t*\}", go, re.S)
        assert m, f"go has no literal for {struct}"
        used = set(re.findall(r"(\w+):", m.group(1))) - {
            "device_type", "device_id", "code", "bits", "lanes",
            "data", "device", "ndim", "dtype", "shape", "strides",
            "byte_offset", "dl_tensor",
        }
        # any leftover name must exist verbatim in dlpack.h
        for f in used:
            assert re.search(r"\b" + f + r"\b", dl), (
                f"go {struct} literal names unknown field {f}"
            )


def test_go_enum_constants_exist():
    go = (ROOT / "go" / "cuvs_tpu.go").read_text()
    consts = set(re.findall(r"C\.(CUVS_TPU_[A-Z0-9_]+)", go))
    assert consts, "no enum constants used in go source"
    header_consts = set(re.findall(r"\b(CUVS_TPU_[A-Z0-9_]+)\b", HEADER))
    missing = consts - header_consts
    assert not missing, f"go uses enum constants absent from the header: {missing}"


def _c_struct_layout(name: str):
    """Natural-alignment offsets + total size for a header struct (the
    layout Panama's canonical layouts would produce on LP64)."""
    m = re.search(r"typedef struct \{([^}]*)\} " + name + ";", HEADER)
    assert m, f"{name} not in header"
    body = re.sub(r"/\*.*?\*/", "", m.group(1), flags=re.S)
    sizes = {
        "int64_t": 8, "uint64_t": 8, "double": 8, "int32_t": 4, "int": 4,
        "float": 4, "uint32_t": 4, "int8_t": 1, "uint8_t": 1,
    }
    offsets, off = {}, 0
    for line in body.splitlines():
        line = line.strip().rstrip(";")
        if not line:
            continue
        toks = line.split()
        fname = toks[-1].lstrip("*")
        if "*" in line or toks[0] in ("const",) and "*" in toks[-1]:
            sz = 8
        else:
            sz = sizes.get(toks[0], 8)  # enums & unknown typedefs: int-like
            if toks[0].startswith("cuvsTpu") and toks[0].endswith("_t"):
                sz = 4 if "Type" in toks[0] or "Dtype" in toks[0] else 8
        off = (off + sz - 1) // sz * sz
        offsets[fname] = off
        off += sz
    total = (off + 7) // 8 * 8
    return offsets, total


def test_java_tensor_layout_matches_header():
    """The hand-built Panama MemorySegment layout for cuvsTpuTensor_t must
    use the header struct's real offsets and size."""
    java = (ROOT / "java" / "src" / "main" / "java" / "com" / "cuvstpu"
            / "CuvsTpu.java").read_text()
    offsets, total = _c_struct_layout("cuvsTpuTensor_t")
    m = re.search(
        r"MemorySegment tensor\(.*?a\.allocate\((\d+)\);(.*?)return t;",
        java, re.S)
    assert m, "tensor() builder not found in java source"
    assert int(m.group(1)) == total, (
        f"java allocates {m.group(1)} bytes for cuvsTpuTensor_t, header "
        f"layout is {total}"
    )
    sets = re.findall(r"t\.set\(C_\w+, (\d+),", m.group(2))
    assert [int(s) for s in sets] == list(offsets.values()), (
        f"java tensor offsets {sets} diverge from header layout {offsets}"
    )


def test_java_param_layouts_match_header():
    """Each typed Java param record's hand-built Panama layout (seg())
    must allocate the header struct's natural-LP64 size and write every
    field at its real offset — the Java analog of the Rust field check."""
    java = (ROOT / "java" / "src" / "main" / "java" / "com" / "cuvstpu"
            / "CuvsTpu.java").read_text()
    pairs = {
        "IvfFlatIndexParams": "cuvsTpuIvfFlatIndexParams_t",
        "IvfFlatSearchParams": "cuvsTpuIvfFlatSearchParams_t",
        "IvfPqIndexParams": "cuvsTpuIvfPqIndexParams_t",
        "IvfPqSearchParams": "cuvsTpuIvfPqSearchParams_t",
        "CagraIndexParams": "cuvsTpuCagraIndexParams_t",
        "CagraSearchParams": "cuvsTpuCagraSearchParams_t",
    }
    for rec, c_name in pairs.items():
        offsets, total = _c_struct_layout(c_name)
        m = re.search(
            r"record " + rec + r"\(.*?a\.allocate\((\d+)\);(.*?)return s;",
            java, re.S)
        assert m, f"java record {rec} with seg() builder not found"
        assert int(m.group(1)) == total, (
            f"java allocates {m.group(1)} bytes for {c_name}, header "
            f"layout is {total}"
        )
        sets = [int(s) for s in re.findall(r"s\.set\(C_\w+, (\d+),", m.group(2))]
        assert sets == list(offsets.values()), (
            f"java {rec} offsets {sets} diverge from header layout {offsets}"
        )


def test_java_typed_symbols_exist():
    """Every typed downcall the Java binding declares exists in the header."""
    java = (ROOT / "java" / "src" / "main" / "java" / "com" / "cuvstpu"
            / "CuvsTpu.java").read_text()
    for sym in ("cuvsTpuIvfFlatBuild", "cuvsTpuIvfFlatSearch",
                "cuvsTpuIvfPqBuild", "cuvsTpuIvfPqSearch",
                "cuvsTpuCagraBuild", "cuvsTpuCagraSearch"):
        assert f'"{sym}"' in java, f"java missing typed downcall {sym}"
        assert sym in HEADER_SYMS


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
