"""Loop restoration vs the independent reference-transpiled oracle
(tools/oracle_lrf.py, line-by-line from /root/reference/src/lrf.rs).

This breaks the shared-code circularity of the encode-decode round trip:
ops/lrf.py computes SgrProj with vectorized 2-D prefix sums and fused row
math, the oracle with the reference's integral-image walk — bit-equality
over sets, xqd, stripe geometry and bit depths is an independent gate."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
import oracle_lrf as O  # noqa: E402

from rav1e_tpu.ops.lrf import (  # noqa: E402
    SGRPROJ_PARAMS_S,
    sgr_apply,
    sgr_compute_f,
    wiener_filter_stripe,
)

BDS = [8, 10, 12]


def _planes(rng, crop_w, crop_h, bd):
    hi = 1 << bd
    cdef = rng.integers(0, hi, (crop_h, crop_w)).astype(np.int64)
    debl = rng.integers(0, hi, (crop_h, crop_w)).astype(np.int64)
    return cdef, debl


def test_params_table_matches():
    assert [list(r) for r in SGRPROJ_PARAMS_S] == O.SGRPROJ_PARAMS_S


@pytest.mark.parametrize("bd", BDS)
@pytest.mark.parametrize("sgr_set", [0, 5, 9, 10, 12, 14, 15])
def test_sgrproj_stripe_matches_oracle(bd, sgr_set):
    rng = np.random.default_rng(bd * 16 + sgr_set)
    crop_w, crop_h = 52, 44
    cdef, debl = _planes(rng, crop_w, crop_h, bd)
    # stripe geometry: top stripe at y=0, interior, bottom-partial, odd
    # height, unit at x=0 and interior, right edge partial
    cases = [
        (0, 0, 32, 20), (16, 8, 32, 16), (0, 24, 32, 20),
        (16, 8, 36, 9), (20, 20, 32, 24),
    ]
    for px, sy, uw, sh in cases:
        sh = min(sh, crop_h - sy)
        uw = min(uw, crop_w - px)
        for xqd in ([-32, 31], [10, -5], [-96, 95]):
            want = O.sgrproj_stripe_filter(
                sgr_set, xqd, bd, cdef, debl, px, sy, uw, sh,
                crop_w, crop_h,
            )
            s_r2, s_r1 = SGRPROJ_PARAMS_S[sgr_set]
            f2, f1, lines = sgr_compute_f(
                cdef, debl, px, sy, uw, sh, crop_w, crop_h, bd, s_r2, s_r1
            )
            got = sgr_apply(f2, f1, lines, xqd, bd)
            assert np.array_equal(got, want), (
                f"set={sgr_set} xqd={xqd} stripe=({px},{sy},{uw},{sh}) bd={bd}"
            )


@pytest.mark.parametrize("bd", BDS)
def test_wiener_stripe_matches_oracle(bd):
    rng = np.random.default_rng(100 + bd)
    crop_w, crop_h = 48, 40
    cdef, debl = _planes(rng, crop_w, crop_h, bd)
    coeff_cases = [
        [[3, -7, 15], [3, -7, 15]],
        [[0, 0, 0], [0, 0, 0]],
        [[-5, 10, -23], [2, 7, 16]],
    ]
    for px, sy, uw, sh in [(0, 0, 32, 16), (8, 8, 32, 24), (16, 24, 32, 16)]:
        sh = min(sh, crop_h - sy)
        uw = min(uw, crop_w - px)
        for coeffs in coeff_cases:
            want, start_yi = O.wiener_stripe_filter(
                coeffs, bd, crop_w, crop_h, uw, sh, px, sy, cdef, debl,
            )
            out = np.zeros((crop_h, crop_w), dtype=np.int64)
            wiener_filter_stripe(
                coeffs, cdef, debl, out, px, sy, uw, sh, crop_w, crop_h, bd
            )
            got = out[start_yi : start_yi + want.shape[0], px : px + uw]
            assert np.array_equal(got, want), (
                f"coeffs={coeffs} stripe=({px},{sy},{uw},{sh}) bd={bd}"
            )
