"""C API (capi/) build + smoke test through the real C ABI."""

import os
import shutil
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CAPI = os.path.join(ROOT, "capi")


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_capi_smoke():
    r = subprocess.run(["make", "-C", CAPI], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    env = dict(os.environ, PYTHONPATH=ROOT, JAX_PLATFORMS="")
    r = subprocess.run(
        [os.path.join(CAPI, "c_test")],
        capture_output=True,
        text=True,
        env=env,
        cwd=CAPI,
        timeout=540,
    )
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "C API smoke test PASSED" in r.stdout
