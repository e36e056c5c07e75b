"""8-tap MC vs the independent reference-transpiled oracle
(tools/oracle_mc.py, line-by-line from /root/reference/src/mc.rs) — every
filter mode x fractional phase x bit depth, for put/prep/avg, against both
the numpy ops and the native C++ kernels."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
import oracle_mc as O  # noqa: E402

from rav1e_tpu import native  # noqa: E402
from rav1e_tpu.ops import mc  # noqa: E402


@pytest.mark.parametrize("bd", [8, 10, 12])
@pytest.mark.parametrize("mode", [0, 1, 2, 3])
def test_put_8tap_matches_oracle(bd, mode):
    rng = np.random.default_rng(bd * 10 + mode)
    hi = 1 << bd
    dt = np.uint8 if bd == 8 else np.uint16
    ref = rng.integers(0, hi, (64, 64)).astype(dt)
    for (w, h) in [(4, 4), (8, 8), (16, 8), (4, 16)]:
        for cf, rf in [(0, 0), (5, 0), (0, 9), (3, 13), (8, 8), (15, 1)]:
            got = mc.put_8tap(ref, 20, 20, w, h, cf, rf, mode, mode, bd)
            want = O.put_8tap(ref, 20, 20, w, h, cf, rf, mode, mode, bd)
            assert np.array_equal(got, want), (bd, mode, w, h, cf, rf)


@pytest.mark.parametrize("bd", [8, 10, 12])
def test_prep_and_avg_match_oracle(bd):
    rng = np.random.default_rng(bd)
    hi = 1 << bd
    dt = np.uint8 if bd == 8 else np.uint16
    ref = rng.integers(0, hi, (64, 64)).astype(dt)
    w, h = 8, 8
    for cf, rf in [(0, 0), (7, 0), (0, 7), (11, 3)]:
        t1 = mc.prep_8tap(ref, 20, 20, w, h, cf, rf, 0, 0, bd)
        o1 = O.prep_8tap(ref, 20, 20, w, h, cf, rf, 0, 0, bd)
        assert np.array_equal(t1, o1), (bd, cf, rf)
        t2 = mc.prep_8tap(ref, 24, 24, w, h, rf, cf, 0, 0, bd)
        got = mc.mc_avg(t1, t2, bd)
        want = O.mc_avg(o1, O.prep_8tap(ref, 24, 24, w, h, rf, cf, 0, 0, bd), bd)
        assert np.array_equal(got, want), (bd, cf, rf)


def test_native_put_prep_avg_match_oracle():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native unavailable")
    rng = np.random.default_rng(1)
    ref = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    w, h, bd = 8, 8, 8
    for cf, rf in [(0, 0), (5, 3), (15, 15)]:
        out = np.zeros((h, w), dtype=np.int32)
        lib.enc_put_8tap(ref.ctypes.data, 64, 1, 20, 20, w, h, cf, rf, 0, 0,
                         bd, out.ctypes.data)
        assert np.array_equal(out, O.put_8tap(ref, 20, 20, w, h, cf, rf, 0, 0, bd))
        p1 = np.zeros((h, w), dtype=np.int32)
        lib.enc_prep_8tap(ref.ctypes.data, 64, 1, 20, 20, w, h, cf, rf, 0, 0,
                          bd, p1.ctypes.data)
        assert np.array_equal(p1, O.prep_8tap(ref, 20, 20, w, h, cf, rf, 0, 0, bd))
        p2 = np.zeros((h, w), dtype=np.int32)
        lib.enc_prep_8tap(ref.ctypes.data, 64, 1, 24, 24, w, h, rf, cf, 0, 0,
                          bd, p2.ctypes.data)
        avg = np.zeros((h, w), dtype=np.int32)
        lib.enc_mc_avg(p1.ctypes.data, p2.ctypes.data, w * h, bd, avg.ctypes.data)
        want = O.mc_avg(
            O.prep_8tap(ref, 20, 20, w, h, cf, rf, 0, 0, bd),
            O.prep_8tap(ref, 24, 24, w, h, rf, cf, 0, 0, bd), bd,
        )
        assert np.array_equal(avg, want)
