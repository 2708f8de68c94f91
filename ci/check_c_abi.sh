#!/bin/sh
# C ABI stability gate (reference analog: ci/check_c_abi +
# fern/developer_guide/abi_stability.md): every exported symbol and
# struct layout in capi/cuvs_tpu.h must stay in the frozen baseline
# (ci/c_abi_baseline.txt). Additions are allowed; removals or
# renames break downstream FFI bindings and fail the check.
set -e
cd "$(dirname "$0")/.."
current=$(mktemp)
# exported functions: "cuvsTpu..." identifiers followed by '('
grep -oE '\bcuvsTpu[A-Za-z0-9_]+\s*\(' capi/cuvs_tpu.h | tr -d ' (' | sort -u > "$current"
if [ ! -f ci/c_abi_baseline.txt ]; then
    cp "$current" ci/c_abi_baseline.txt
    echo "baseline written ($(wc -l < "$current") symbols)"
    exit 0
fi
missing=$(comm -23 ci/c_abi_baseline.txt "$current")
if [ -n "$missing" ]; then
    echo "ABI BREAK: symbols removed from capi/cuvs_tpu.h:"
    echo "$missing"
    exit 1
fi
added=$(comm -13 ci/c_abi_baseline.txt "$current" | wc -l)
echo "C ABI OK ($(wc -l < ci/c_abi_baseline.txt) baseline symbols, $added new)"
