"""CDEF vs the independent reference-transpiled oracle
(tools/oracle_cdef.py, line-by-line from /root/reference/src/cdef.rs).

This breaks the shared-code circularity of the encode-decode round trip:
ops/cdef.py was written from the spec text, the oracle from the reference's
Rust — bit-equality across directions, strengths, damping, bit depths and
edge-availability patterns is an independent gate."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
import oracle_cdef as O  # noqa: E402

from rav1e_tpu.ops.cdef import (  # noqa: E402
    CDEF_VERY_LARGE,
    _adjust_strength,
    cdef_filter_blocks,
    cdef_find_dirs,
)

BDS = [8, 10, 12]


@pytest.mark.parametrize("bd", BDS)
def test_find_dir_matches_oracle(bd):
    rng = np.random.default_rng(bd)
    hi = 1 << bd
    blocks = rng.integers(0, hi, (64, 8, 8)).astype(np.int64)
    dirs, variances = cdef_find_dirs(blocks, bd)
    for n in range(blocks.shape[0]):
        d, v = O.cdef_find_dir(blocks[n], bd - 8)
        assert dirs[n] == d, f"block {n}: dir {dirs[n]} != oracle {d}"
        assert variances[n] == v, f"block {n}: var {variances[n]} != {v}"


def test_adjust_strength_matches_oracle():
    for strength in range(1, 16):
        for var in [0, 1, 63, 64, 100, 1 << 8, 1 << 12, (1 << 18) + 5]:
            got = int(_adjust_strength(strength, np.array([var]))[0])
            assert got == O.adjust_strength(strength, var), (strength, var)


@pytest.mark.parametrize("bd", BDS)
@pytest.mark.parametrize("xdec,ydec", [(0, 0), (1, 1), (1, 0)])
def test_filter_block_matches_oracle(bd, xdec, ydec):
    rng = np.random.default_rng(bd * 10 + xdec * 2 + ydec)
    hi = 1 << bd
    shift = bd - 8
    xs, ys = 8 >> xdec, 8 >> ydec
    plane = rng.integers(0, hi, (24, 24)).astype(np.int64)
    edges_cases = [
        O.CDEF_HAVE_ALL,
        O.CDEF_HAVE_ALL & ~O.CDEF_HAVE_LEFT,
        O.CDEF_HAVE_ALL & ~O.CDEF_HAVE_TOP,
        O.CDEF_HAVE_ALL & ~(O.CDEF_HAVE_RIGHT | O.CDEF_HAVE_BOTTOM),
        0,
    ]
    for dir_ in range(8):
        for pri in [0, 1 << shift, 4 << shift, 15 << shift]:
            for sec in [0, 1 << shift, 2 << shift, 4 << shift]:
                for edges in edges_cases:
                    damping = 3 + shift + (dir_ & 1)  # vary damping too
                    want = O.cdef_filter_block(
                        plane, 8, 8, pri, sec, dir_, damping, bd,
                        xdec, ydec, edges,
                    )
                    # build our window from the oracle's padded tmp so both
                    # see identical availability
                    tmp = O.pad_into_tmp16(plane, None, 8, 8, xs, ys, edges)
                    win = np.asarray(tmp)[: ys + 4, : xs + 4]
                    got = cdef_filter_blocks(
                        win[None].astype(np.int64),
                        np.array([dir_]),
                        np.array([pri]),
                        sec,
                        damping,
                        bd,
                    )[0]
                    assert np.array_equal(got, want), (
                        f"dir={dir_} pri={pri} sec={sec} edges={edges:04b} "
                        f"bd={bd} dec=({xdec},{ydec})\n{got}\n!=\n{want}"
                    )


def test_very_large_constant_matches():
    assert CDEF_VERY_LARGE == O.CDEF_VERY_LARGE
