"""Intra prediction vs the independent reference-transpiled oracle
(tools/oracle_intra.py, line-by-line from /root/reference/src/predict.rs).

This breaks the shared-code circularity of the encode-decode round trip:
ops/intra.py was written from the spec text, the oracle from the reference's
Rust — bit-equality of every mode/size/depth is an independent gate."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
import oracle_intra as O  # noqa: E402

from rav1e_tpu.ops.intra import IefParams, IntraEdge, predict_intra  # noqa: E402
from rav1e_tpu.partition import (  # noqa: E402
    ANGLE_STEP,
    PredictionMode,
    intra_mode_to_angle,
)

SIZES = [(4, 4), (8, 8), (16, 16), (4, 8), (16, 4), (8, 32), (32, 32)]
BDS = [8, 10, 12]


def _edges(rng, w, h, bd):
    hi = 1 << bd
    above = rng.integers(0, hi, w + h).astype(np.int64)
    left = rng.integers(0, hi, h + w).astype(np.int64)
    tl = int(rng.integers(0, hi))
    return above, left, tl


@pytest.mark.parametrize("w,h", SIZES)
@pytest.mark.parametrize("bd", BDS)
def test_non_directional_modes_match_oracle(w, h, bd):
    rng = np.random.default_rng(w * 100 + h + bd)
    for trial in range(4):
        above, left, tl = _edges(rng, w, h, bd)
        edge = IntraEdge(above=above, left=left, top_left=tl,
                         have_above=True, have_left=True)
        ref_left = left[:h][::-1].copy()  # reference stores bottom-to-top

        got = predict_intra(PredictionMode.DC_PRED, edge, w, h, bd)
        assert np.array_equal(got, O.pred_dc(above, ref_left, w, h))

        got = predict_intra(PredictionMode.V_PRED, edge, w, h, bd)
        assert np.array_equal(got, O.pred_v(above, w, h))

        got = predict_intra(PredictionMode.H_PRED, edge, w, h, bd)
        assert np.array_equal(got, O.pred_h(ref_left, w, h))

        got = predict_intra(PredictionMode.PAETH_PRED, edge, w, h, bd)
        assert np.array_equal(got, O.pred_paeth(above, ref_left, tl, w, h))

        got = predict_intra(PredictionMode.SMOOTH_PRED, edge, w, h, bd)
        assert np.array_equal(got, O.pred_smooth(above, ref_left, w, h))

        got = predict_intra(PredictionMode.SMOOTH_H_PRED, edge, w, h, bd)
        assert np.array_equal(got, O.pred_smooth_h(above, ref_left, w, h))

        got = predict_intra(PredictionMode.SMOOTH_V_PRED, edge, w, h, bd)
        assert np.array_equal(got, O.pred_smooth_v(above, ref_left, w, h))


def test_dc_edge_variants_match_oracle():
    rng = np.random.default_rng(0)
    w = h = 8
    bd = 8
    above, left, tl = _edges(rng, w, h, bd)
    ref_left = left[:h][::-1].copy()
    e = IntraEdge(above=above, left=left, top_left=tl,
                  have_above=True, have_left=False)
    assert np.array_equal(
        predict_intra(PredictionMode.DC_PRED, e, w, h, bd),
        O.pred_dc_top(above, w, h),
    )
    e = IntraEdge(above=above, left=left, top_left=tl,
                  have_above=False, have_left=True)
    assert np.array_equal(
        predict_intra(PredictionMode.DC_PRED, e, w, h, bd),
        O.pred_dc_left(ref_left, w, h),
    )
    e = IntraEdge(above=above, left=left, top_left=tl,
                  have_above=False, have_left=False)
    assert np.array_equal(
        predict_intra(PredictionMode.DC_PRED, e, w, h, bd),
        O.pred_dc_128(w, h, bd),
    )


DIRECTIONAL = [
    PredictionMode.D45_PRED, PredictionMode.D135_PRED,
    PredictionMode.D113_PRED, PredictionMode.D157_PRED,
    PredictionMode.D203_PRED, PredictionMode.D67_PRED,
    PredictionMode.V_PRED, PredictionMode.H_PRED,
]


@pytest.mark.parametrize("mode", DIRECTIONAL)
@pytest.mark.parametrize("ief", [False, True])
def test_directional_modes_match_oracle(mode, ief):
    rng = np.random.default_rng(int(mode) * 7 + ief)
    for (w, h) in [(4, 4), (8, 8), (16, 16), (8, 16), (32, 8)]:
        for bd in (8, 10):
            for delta in (-3, -1, 0, 2, 3):
                p_angle = intra_mode_to_angle(mode) + delta * ANGLE_STEP
                if p_angle <= 0 or p_angle >= 270 or p_angle % 3 != 0:
                    continue
                above, left, tl = _edges(rng, w, h, bd)
                edge = IntraEdge(above=above, left=left, top_left=tl,
                                 have_above=True, have_left=True)
                for smooth in ((False, True) if ief else (None,)):
                    ief_params = None
                    ief_smooth = None
                    if ief:
                        m = (PredictionMode.SMOOTH_PRED if smooth
                             else PredictionMode.DC_PRED)
                        ief_params = IefParams(above_mode=m, left_mode=m)
                        ief_smooth = smooth
                    got = predict_intra(mode, edge, w, h, bd, delta,
                                        ief_params=ief_params)
                    if p_angle == 90:
                        want = O.pred_v(above, w, h)
                    elif p_angle == 180:
                        want = O.pred_h(left[:h][::-1].copy(), w, h)
                    else:
                        want = O.pred_directional(
                            above, left[: h + w][::-1].copy(), [tl],
                            p_angle, w, h, bd, ief_smooth,
                        )
                    assert np.array_equal(got, want), (
                        mode.name, w, h, bd, delta, smooth,
                        (got - want).nonzero(),
                    )
