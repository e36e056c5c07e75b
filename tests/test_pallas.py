"""Parity: Pallas kernels (interpreter mode) vs the jnp analysis math.

The real kernels run only on TPU backends (pallas_kernels.pallas_ok);
here the interpreter executes the same kernel bodies on CPU and the
results must be bit-identical to the einsum/slice formulations they
replace (device/analysis.satd8, device/me._grid_search)."""

import numpy as np
import pytest

from rav1e_tpu.device import pallas_kernels as pk


def _jnp_satd8(diff):
    import jax.numpy as jnp

    *lead, sh, sw = diff.shape
    d = diff.astype(jnp.float32).reshape(*lead, sh // 8, 8, sw // 8, 8)
    d = jnp.moveaxis(d, -2, -3)
    h = np.array([[1.0]], dtype=np.float32)
    while h.shape[0] < 8:
        h = np.block([[h, h], [h, -h]])
    t = jnp.einsum("ij,...jk,kl->...il", jnp.asarray(h), d, jnp.asarray(h))
    cells = jnp.abs(t).sum(axis=(-1, -2))
    cells = jnp.floor((cells + 4.0) / 8.0)
    return cells.sum(axis=(-1, -2))


@pytest.mark.parametrize("shape", [(7, 8, 8), (3, 13, 16, 16), (2, 32, 32)])
def test_satd8_parity(shape):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    diff = rng.integers(-1023, 1024, shape).astype(np.int32)
    ref = np.asarray(_jnp_satd8(jnp.asarray(diff)))
    got = np.asarray(pk.satd8(jnp.asarray(diff), interpret=True))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("blk,R,step", [(16, 3, 2), (16, 2, 1), (16, 1, 1)])
def test_sad_grid_parity(blk, R, step):
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    n = 37  # not a multiple of the tile: exercises batch padding
    W = blk + 2 * R * step
    src = rng.integers(0, 4096, (n, blk, blk)).astype(np.int32)
    win = rng.integers(0, 4096, (n, W, W)).astype(np.int32)
    ref = np.stack(
        [
            np.abs(
                win[:, oy * step : oy * step + blk,
                    ox * step : ox * step + blk] - src
            ).sum(axis=(1, 2))
            for oy in range(2 * R + 1)
            for ox in range(2 * R + 1)
        ],
        axis=1,
    )
    got = np.asarray(
        pk.sad_grid(jnp.asarray(src), jnp.asarray(win), blk, R, step,
                    interpret=True)
    )
    np.testing.assert_array_equal(got, ref)


def test_me_field_uses_pallas_path(monkeypatch):
    """Force the pallas path (interpret mode) through the full device ME and
    compare against the jnp path — the decision output must be identical."""
    import jax.numpy as jnp

    from rav1e_tpu.device import me

    rng = np.random.default_rng(2)
    luma = rng.integers(0, 256, (128, 192)).astype(np.int32)
    ref = np.roll(luma, (3, -5), axis=(0, 1)).astype(np.int32)

    mv_plain = np.asarray(me.me_field(jnp.asarray(luma), jnp.asarray(ref), 8))

    real_sad_grid = pk.sad_grid
    monkeypatch.setattr(pk, "pallas_ok", lambda: True)
    monkeypatch.setattr(
        pk, "sad_grid",
        lambda s, w, blk, R, step: real_sad_grid(s, w, blk, R, step,
                                                 interpret=True),
    )
    real_satd8 = pk.satd8
    monkeypatch.setattr(
        pk, "satd8", lambda d: real_satd8(d, interpret=True)
    )
    mv_pallas = np.asarray(me.me_field(jnp.asarray(luma), jnp.asarray(ref), 8))
    np.testing.assert_array_equal(mv_pallas, mv_plain)


def test_real_tpu_kernel_parity():
    """TPU-gated: run the REAL (compiled Mosaic) kernels and assert
    bit-parity with the jnp path, including large-magnitude diffs that
    would round under default (bf16-pass) matmul precision (ADVICE r3).

    Skipped on CPU runs (conftest pins JAX_PLATFORMS=cpu); run manually
    with RAV1E_TPU_REAL_PALLAS=1 on TPU hardware."""
    import os

    import pytest

    if os.environ.get("RAV1E_TPU_REAL_PALLAS") != "1":
        pytest.skip("real-TPU pallas run not requested")
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu" or not pk._mosaic_probe():
        pytest.skip("no Mosaic-capable TPU backend")
    rng = np.random.default_rng(7)
    # 12-bit-scale diffs: values beyond +-256 exercise the precision fix
    diff = rng.integers(-4095, 4096, (64, 16, 16)).astype(np.int32)
    ref = np.asarray(_jnp_satd8(jnp.asarray(diff)))
    got = np.asarray(pk.satd8(jnp.asarray(diff)))
    np.testing.assert_array_equal(got, ref)

    src = rng.integers(0, 4096, (8, 16, 16)).astype(np.int32)
    win = rng.integers(0, 4096, (8, 48, 48)).astype(np.int32)
    got = np.asarray(pk.sad_grid(jnp.asarray(src), jnp.asarray(win), 16, 2, 4))
    exp = np.asarray(
        pk.sad_grid(jnp.asarray(src), jnp.asarray(win), 16, 2, 4,
                    interpret=True))
    np.testing.assert_array_equal(got, exp)
