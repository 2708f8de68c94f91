#!/bin/sh
# Style gate (reference analog: ci/check_style.sh running pre-commit).
# Kept dependency-free: compile-check every Python file and flag
# tabs / trailing whitespace / >100-col lines in the library sources.
set -e
cd "$(dirname "$0")/.."
python - <<'PY'
import pathlib
import py_compile
import sys

bad = []
for p in pathlib.Path(".").rglob("*.py"):
    s = str(p)
    if any(s.startswith(d) for d in (".git", "notebooks")):
        continue
    try:
        py_compile.compile(s, doraise=True)
    except py_compile.PyCompileError as e:
        bad.append(f"{s}: {e.msg}")
        continue
    if not s.startswith(("cuvs_tpu/", "capi/", "native/", "tests/")):
        continue
    for n, line in enumerate(p.read_text().splitlines(), 1):
        if "\t" in line:
            bad.append(f"{s}:{n}: tab")
        if line != line.rstrip():
            bad.append(f"{s}:{n}: trailing whitespace")
        if len(line) > 100:
            bad.append(f"{s}:{n}: line > 100 cols")
print("\n".join(bad))
sys.exit(1 if bad else 0)
PY
echo "style OK"
