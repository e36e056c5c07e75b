"""Device intra scorer parity: directional predictions with the normative
intra-edge pipeline (corner filter + edge filter + upsample, spec
7.11.2.7-.12) must be bit-identical to the coder's ops/intra.predict_intra
given the same edges — the device tier ranks modes by these predictions
(analysis.predict_all_modes), so any drift re-opens the f326471 misranking.

Reference counterpart: predict.rs:1125-1266 (filter_edge/upsample_edge) and
the asm/shared parity-test pattern (SURVEY §4).
"""

import numpy as np
import pytest

from rav1e_tpu.ops.intra import IefParams, IntraEdge, predict_intra
from rav1e_tpu.partition import PredictionMode, intra_mode_to_angle

DIR_MODES = [
    PredictionMode.D45_PRED,
    PredictionMode.D135_PRED,
    PredictionMode.D113_PRED,
    PredictionMode.D157_PRED,
    PredictionMode.D203_PRED,
    PredictionMode.D67_PRED,
]


def _host_pred(mode, above2, left2, tl, s, bd):
    """The coder's prediction for one block: build_intra_edge's corner
    filter (intra_edges.py:142-150) + predict_intra with IEF enabled,
    smooth_filter=False (non-smooth neighbors)."""
    p_angle = intra_mode_to_angle(mode)
    tl_h = int(tl)
    if 90 < p_angle < 180 and 2 * s >= 24:
        tl_h = (int(left2[s - 1]) * 5 + tl_h * 6 + int(above2[0]) * 5 + 8) >> 4
    edge = IntraEdge(
        above=above2.astype(np.int32),
        left=left2.astype(np.int32),
        top_left=tl_h,
        have_above=True,
        have_left=True,
    )
    ief = IefParams(above_mode=PredictionMode.DC_PRED,
                    left_mode=PredictionMode.DC_PRED)
    return predict_intra(mode, edge, s, s, bd, ief_params=ief)


@pytest.mark.parametrize("s", [8, 16, 32, 64])
@pytest.mark.parametrize("bd", [8, 10])
def test_directional_ief_parity(s, bd):
    from rav1e_tpu.device.analysis import predict_all_modes

    rng = np.random.default_rng(100 + s + bd)
    n = 6
    hi = 1 << bd
    above2 = rng.integers(0, hi, (n, 2 * s)).astype(np.int32)
    left2 = rng.integers(0, hi, (n, 2 * s)).astype(np.int32)
    tl = rng.integers(0, hi, (n,)).astype(np.int32)

    import jax.numpy as jnp

    preds = np.asarray(
        predict_all_modes(
            jnp.asarray(above2), jnp.asarray(left2), jnp.asarray(tl), s, bd
        )
    )
    for mode in DIR_MODES:
        for b in range(n):
            expect = _host_pred(mode, above2[b], left2[b], int(tl[b]), s, bd)
            got = preds[b, int(mode)]
            assert np.array_equal(got, np.asarray(expect)), (
                f"s={s} bd={bd} mode={mode.name} block={b}: "
                f"max|d|={np.abs(got - expect).max()}"
            )
