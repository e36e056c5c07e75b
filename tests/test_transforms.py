"""Transform tests.

- 1-D inverse transforms bit-exact vs golden vectors (mechanically generated
  from the reference scalar code by tools/gen_golden_transforms.py — the
  template of the reference's asm<->rust parity tests, asm/shared/).
- 2-D forward -> quantize(step 1) -> dequantize -> inverse round-trips to
  near-identity (gain calibration contract).
- Lossless WHT round-trips exactly.
"""

from pathlib import Path

import numpy as np
import pytest

from rav1e_tpu.ops import transforms as T
from rav1e_tpu.tx import TxSize, TxType, TxType1D, get_log_tx_scale, valid_av1_transform

GOLD = np.load(Path(__file__).parent / "golden" / "inv_tx_1d.npz")

FAMILIES = {
    "dct": (TxType1D.DCT, [4, 8, 16, 32, 64]),
    "adst": (TxType1D.ADST, [4, 8, 16]),
    "flipadst": (TxType1D.FLIPADST, [4, 8, 16]),
    "identity": (TxType1D.IDTX, [4, 8, 16, 32]),
    "wht": (TxType1D.WHT, [4]),
}


@pytest.mark.parametrize("family", list(FAMILIES))
def test_inv_1d_bit_exact(family):
    tx1d, sizes = FAMILIES[family]
    for n in sizes:
        for rg in (16, 18, 20):
            x = GOLD[f"{family}_{n}_r{rg}_in"].astype(np.int32)
            want = GOLD[f"{family}_{n}_r{rg}_out"]
            got = T.inv_tx_1d(x, tx1d, rg)
            assert np.array_equal(got.astype(np.int64), want), (family, n, rg)


@pytest.mark.parametrize(
    "tx_size",
    [
        TxSize.TX_4X4, TxSize.TX_8X8, TxSize.TX_16X16, TxSize.TX_32X32,
        TxSize.TX_64X64, TxSize.TX_4X8, TxSize.TX_8X4, TxSize.TX_16X8,
        TxSize.TX_8X32, TxSize.TX_16X64, TxSize.TX_4X16,
    ],
)
def test_fwd_inv_round_trip_dct(tx_size):
    """fwd -> dequant(identity at step 8/Q3, log_tx_scale) -> inv ~ identity."""
    rng = np.random.default_rng(0)
    bd = 8
    h, w = tx_size.height, tx_size.width
    if max(h, w) > 32:
        # 64-point transforms normatively discard coeffs >= 32: build an
        # exactly bandlimited residual by inverse-transforming low-freq coeffs
        c = np.zeros((8, h, w), dtype=np.int32)
        c[:, : min(h, 32), : min(w, 32)] = rng.integers(
            -300, 300, size=(8, min(h, 32), min(w, 32))
        )
        res = T.inverse_transform_residual(c, tx_size, TxType.DCT_DCT, bd).astype(np.int32)
    else:
        res = rng.integers(-255, 256, size=(8, h, w)).astype(np.int32)
    coeffs = T.forward_transform(res, tx_size, TxType.DCT_DCT, bd)
    # emulate quantize/dequantize at quantizer step 1 (Q3 quant == 8):
    # level = round(coeff << lts / 8); dq = level * 8 >> lts  => dq ~ coeff
    lts = get_log_tx_scale(tx_size)
    level = np.rint((coeffs.astype(np.float64) * (1 << lts)) / 8.0).astype(np.int64)
    dq = (level * 8) >> lts
    recon_res = T.inverse_transform_residual(dq.astype(np.int32), tx_size, TxType.DCT_DCT, bd)
    err = np.abs(recon_res - res)
    # rounding noise only: a few LSBs
    assert err.mean() < 1.0, err.mean()
    assert err.max() <= 8, err.max()


@pytest.mark.parametrize(
    "tx_type",
    [TxType.ADST_ADST, TxType.DCT_ADST, TxType.FLIPADST_DCT, TxType.IDTX,
     TxType.V_DCT, TxType.H_FLIPADST],
)
def test_fwd_inv_round_trip_types(tx_type):
    rng = np.random.default_rng(1)
    bd = 10
    for tx_size in (TxSize.TX_8X8, TxSize.TX_16X8, TxSize.TX_4X16):
        if not valid_av1_transform(tx_size, tx_type):
            continue
        h, w = tx_size.height, tx_size.width
        res = rng.integers(-1023, 1024, size=(4, h, w)).astype(np.int32)
        coeffs = T.forward_transform(res, tx_size, tx_type, bd)
        recon_res = T.inverse_transform_residual(coeffs, tx_size, tx_type, bd)
        err = np.abs(recon_res - res)
        assert err.mean() < 2.0, (tx_type, tx_size, err.mean())


def test_wht_lossless_round_trip():
    rng = np.random.default_rng(2)
    res = rng.integers(-255, 256, size=(16, 4, 4)).astype(np.int32)
    coeffs = T.forward_transform(res, TxSize.TX_4X4, TxType.WHT_WHT, 8)
    recon = T.inverse_transform_residual(coeffs, TxSize.TX_4X4, TxType.WHT_WHT, 8)
    assert np.array_equal(recon, res)


def test_inverse_transform_add_clips():
    coeffs = np.zeros((1, 4, 4), dtype=np.int32)
    coeffs[0, 0, 0] = 30000
    pred = np.full((1, 4, 4), 250, dtype=np.int32)
    out = T.inverse_transform_add(coeffs, pred, TxSize.TX_4X4, TxType.DCT_DCT, 8)
    assert out.max() <= 255 and out.min() >= 0


def test_jax_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    x = rng.integers(-4096, 4096, size=(4, 8, 8)).astype(np.int32)
    pred = rng.integers(0, 255, size=(4, 8, 8)).astype(np.int32)
    out_np = T.inverse_transform_add(x, pred, TxSize.TX_8X8, TxType.DCT_DCT, 8)
    out_j = T.inverse_transform_add(
        jnp.asarray(x), jnp.asarray(pred), TxSize.TX_8X8, TxType.DCT_DCT, 8
    )
    assert np.array_equal(np.asarray(out_j), out_np)


def test_dc_only_fast_path_consistency():
    """A DC-only block's reconstruction must match the full pipeline."""
    c = np.zeros((1, 8, 8), dtype=np.int32)
    c[0, 0, 0] = 1234
    full = T.inverse_transform_residual(c, TxSize.TX_8X8, TxType.DCT_DCT, 8)
    # DC of the 2D DCT spreads evenly
    assert np.ptp(full) <= 1
