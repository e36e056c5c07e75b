"""C ABI test: compile the example C consumer against native/capi.cc and
run it in-process-embedded mode (counterpart of the reference's capi
feature tests + crav1e usage)."""

import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _python_config(*args):
    exe = f"python{sys.version_info.major}.{sys.version_info.minor}-config"
    if shutil.which(exe) is None:
        exe = "python3-config"
    out = subprocess.run([exe, *args], capture_output=True, text=True)
    return out.stdout.split()


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_capi_encode(tmp_path):
    includes = _python_config("--includes")
    ldflags = _python_config("--ldflags", "--embed")
    if not includes or not ldflags:
        pytest.skip("no python embedding config")
    exe = str(tmp_path / "capi_encode")
    build = subprocess.run(
        ["g++", "-O2", os.path.join(ROOT, "native", "capi.cc"),
         os.path.join(ROOT, "examples", "capi_encode.c"),
         "-I" + os.path.join(ROOT, "include"), *includes, *ldflags, "-o", exe],
        capture_output=True, text=True,
    )
    assert build.returncode == 0, build.stderr[-2000:]

    env = dict(os.environ, PYTHONPATH=ROOT, JAX_PLATFORMS="cpu")
    run = subprocess.run([exe], capture_output=True, text=True, env=env, timeout=300)
    assert run.returncode == 0, (run.returncode, run.stdout, run.stderr[-2000:])
    assert "OK: 5 packets" in run.stdout, run.stdout
