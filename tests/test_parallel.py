"""Device analysis + multi-chip sharding tests (8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from rav1e_tpu.ops.analysis import ANALYSIS_MODE_TABLE, BLOCK, analyze_intra_modes, frame_analysis
from rav1e_tpu.parallel import make_mesh, sharded_frame_analysis


def test_analysis_prefers_obvious_modes():
    rng = np.random.default_rng(0)
    h = w = 4 * BLOCK
    # vertical stripes -> V_PRED should win away from the border
    luma = np.tile(rng.integers(0, 256, (1, w)), (h, 1)).astype(np.int32)
    modes, sad = analyze_intra_modes(jnp.asarray(luma), 128)
    modes = np.asarray(modes).reshape(4, 4)
    assert (ANALYSIS_MODE_TABLE[modes[1:, :]] == 1).all()  # V_PRED
    # horizontal stripes -> H_PRED
    luma = np.tile(rng.integers(0, 256, (h, 1)), (1, w)).astype(np.int32)
    modes, _ = analyze_intra_modes(jnp.asarray(luma), 128)
    modes = np.asarray(modes).reshape(4, 4)
    assert (ANALYSIS_MODE_TABLE[modes[:, 1:]] == 2).all()  # H_PRED
    # flat -> DC away from the border fills
    luma = np.full((h, w), 77, np.int32)
    modes, _ = analyze_intra_modes(jnp.asarray(luma), 128)
    modes = np.asarray(modes).reshape(4, 4)
    assert (ANALYSIS_MODE_TABLE[modes[1:, 1:]] == 0).all()


def test_frame_analysis_jits():
    luma = jnp.asarray(np.random.default_rng(1).integers(0, 256, (128, 128), np.int32))
    out = frame_analysis(luma, bit_depth=8)
    assert out["modes"].shape == (16,)
    assert np.isfinite(float(out["rate_proxy"]))


def test_sharded_matches_per_band_analysis():
    """Each mesh shard is an independent tile band (no intra prediction
    across tile edges in AV1), so the sharded result must equal running the
    single-device analysis per band."""
    n = len(jax.devices())
    assert n >= 8, "conftest should provide 8 CPU devices"
    mesh = make_mesh(8)
    h, w = 8 * 2 * BLOCK, 4 * BLOCK
    luma = jnp.asarray(np.random.default_rng(2).integers(0, 256, (h, w), np.int32))
    modes_sharded, rate = sharded_frame_analysis(mesh, luma)
    per_band = [
        np.asarray(analyze_intra_modes(luma[i * 2 * BLOCK : (i + 1) * 2 * BLOCK], 128)[0])
        for i in range(8)
    ]
    assert np.array_equal(np.asarray(modes_sharded), np.concatenate(per_band))
    assert np.isfinite(float(rate))
