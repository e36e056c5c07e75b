"""Bit-parity tests for the device recon-path DSP kernels
(rav1e_tpu/device/dsp.py) against the host oracles: ops/mc.py,
quantize.QuantizationContext, ops/transforms, ops/deblock.

Runs on the CPU jax backend (conftest) — int32 semantics are identical on
TPU (the kernels use only i32 ops, gathers, and static shapes).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from rav1e_tpu.device import dsp  # noqa: E402
from rav1e_tpu.ops import mc as mc_ops  # noqa: E402
from rav1e_tpu.ops import transforms as tf  # noqa: E402
from rav1e_tpu.quantize import QuantizationContext, _scan_u16, dequantize  # noqa: E402
from rav1e_tpu.tx import TxSize, TxType  # noqa: E402

RNG = np.random.default_rng(1234)


def _pad_plane(h, w, pad, bd, rng):
    return rng.integers(0, (1 << bd), (h + 2 * pad, w + 2 * pad)).astype(np.int32)


@pytest.mark.parametrize("bd", [8, 10])
@pytest.mark.parametrize("h,w", [(8, 8), (16, 16), (8, 16), (4, 4), (32, 32)])
def test_mc_put_parity(bd, h, w):
    pad = 32
    ref = _pad_plane(64, 64, pad, bd, RNG)
    n = 24
    pos_y = RNG.integers(0, 48, n).astype(np.int32)
    pos_x = RNG.integers(0, 48, n).astype(np.int32)
    mv_r = RNG.integers(-12 * 8, 12 * 8, n).astype(np.int32)
    mv_c = RNG.integers(-12 * 8, 12 * 8, n).astype(np.int32)

    got = np.asarray(dsp.mc_put_batched(
        jnp.asarray(ref), pad, jnp.asarray(pos_y), jnp.asarray(pos_x),
        jnp.asarray(mv_r), jnp.asarray(mv_c), h, w, bd,
    ))
    for i in range(n):
        ri, ci, rf, cf = mc_ops.mv_to_offsets(int(mv_r[i]), int(mv_c[i]), 0, 0)
        want = mc_ops.put_8tap(
            ref, pad + int(pos_x[i]) + ci, pad + int(pos_y[i]) + ri,
            w, h, cf, rf, 0, 0, bd,
        )
        np.testing.assert_array_equal(got[i], want, err_msg=f"block {i}")


@pytest.mark.parametrize("bd", [8, 10])
def test_mc_put_chroma_decimated(bd):
    """Chroma planes: luma MVs with plane decimation (xdec=ydec=1)."""
    pad = 32
    ref = _pad_plane(40, 40, pad, bd, RNG)
    n, h, w = 16, 8, 8
    pos_y = RNG.integers(0, 30, n).astype(np.int32)
    pos_x = RNG.integers(0, 30, n).astype(np.int32)
    mv_r = RNG.integers(-10 * 8, 10 * 8, n).astype(np.int32)
    mv_c = RNG.integers(-10 * 8, 10 * 8, n).astype(np.int32)
    got = np.asarray(dsp.mc_put_batched(
        jnp.asarray(ref), pad, jnp.asarray(pos_y), jnp.asarray(pos_x),
        jnp.asarray(mv_r), jnp.asarray(mv_c), h, w, bd, xdec=1, ydec=1,
    ))
    for i in range(n):
        ri, ci, rf, cf = mc_ops.mv_to_offsets(int(mv_r[i]), int(mv_c[i]), 1, 1)
        want = mc_ops.put_8tap(
            ref, pad + int(pos_x[i]) + ci, pad + int(pos_y[i]) + ri,
            w, h, cf, rf, 0, 0, bd,
        )
        np.testing.assert_array_equal(got[i], want, err_msg=f"block {i}")


@pytest.mark.parametrize("bd", [8, 10])
def test_mc_compound_parity(bd):
    pad = 32
    ref0 = _pad_plane(48, 48, pad, bd, RNG)
    ref1 = _pad_plane(48, 48, pad, bd, RNG)
    n, h, w = 12, 16, 16
    pos_y = RNG.integers(0, 30, n).astype(np.int32)
    pos_x = RNG.integers(0, 30, n).astype(np.int32)
    mv = RNG.integers(-8 * 8, 8 * 8, (n, 4)).astype(np.int32)

    def windows(ref, mr, mc_):
        iy0 = pad + jnp.asarray(pos_y) + (jnp.asarray(mr) >> 3) - 3
        ix0 = pad + jnp.asarray(pos_x) + (jnp.asarray(mc_) >> 3) - 3
        return dsp.mc_gather_windows(jnp.asarray(ref), iy0, ix0, h, w)

    t0 = dsp.mc_prep_from_windows(
        windows(ref0, mv[:, 0], mv[:, 1]), jnp.asarray(mv[:, 0]),
        jnp.asarray(mv[:, 1]), h, w, bd)
    t1 = dsp.mc_prep_from_windows(
        windows(ref1, mv[:, 2], mv[:, 3]), jnp.asarray(mv[:, 2]),
        jnp.asarray(mv[:, 3]), h, w, bd)
    got = np.asarray(dsp.mc_avg(t0, t1, bd))

    for i in range(n):
        r0i, c0i, r0f, c0f = mc_ops.mv_to_offsets(int(mv[i, 0]), int(mv[i, 1]), 0, 0)
        r1i, c1i, r1f, c1f = mc_ops.mv_to_offsets(int(mv[i, 2]), int(mv[i, 3]), 0, 0)
        w0 = mc_ops.prep_8tap(ref0, pad + int(pos_x[i]) + c0i,
                              pad + int(pos_y[i]) + r0i, w, h, c0f, r0f, 0, 0, bd)
        w1 = mc_ops.prep_8tap(ref1, pad + int(pos_x[i]) + c1i,
                              pad + int(pos_y[i]) + r1i, w, h, c1f, r1f, 0, 0, bd)
        want = mc_ops.mc_avg(w0, w1, bd)
        np.testing.assert_array_equal(got[i], want, err_msg=f"block {i}")


TX_CASES = [
    (TxSize.TX_4X4, TxType.DCT_DCT),
    (TxSize.TX_8X8, TxType.DCT_DCT),
    (TxSize.TX_16X16, TxType.DCT_DCT),
    (TxSize.TX_32X32, TxType.DCT_DCT),
    (TxSize.TX_64X64, TxType.DCT_DCT),
    (TxSize.TX_8X16, TxType.DCT_DCT),
    (TxSize.TX_16X8, TxType.DCT_DCT),
    (TxSize.TX_8X8, TxType.ADST_ADST),
]


@pytest.mark.parametrize("tx_size,tx_type", TX_CASES)
def test_fwd_tx_parity(tx_size, tx_type):
    h, w = tx_size.height, tx_size.width
    res = RNG.integers(-510, 511, (8, h, w)).astype(np.int32)
    got = np.asarray(dsp.fwd_tx_batched(jnp.asarray(res), tx_size, tx_type))
    want = tf.forward_transform(res, tx_size, tx_type, 8)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("tx_size,tx_type", TX_CASES)
@pytest.mark.parametrize("is_intra", [False, True])
def test_quantize_parity(tx_size, tx_type, is_intra):
    h, w = tx_size.height, tx_size.width
    res = RNG.integers(-510, 511, (6, h, w)).astype(np.int32)
    coeffs = tf.forward_transform(res, tx_size, tx_type, 8)
    qindex = 120
    qc = QuantizationContext()
    qc.update(qindex, tx_size, is_intra, 8)

    cw, ch = min(w, 32), min(h, 32)
    scan = _scan_u16(cw, ch, "default")
    levels, eob = dsp.quantize_batched(
        jnp.asarray(coeffs), tx_size, scan, qc.dc_quant, qc.ac_quant, is_intra)
    levels = np.asarray(levels)
    eob = np.asarray(eob)
    qdense = np.asarray(dsp.scan_to_dense(jnp.asarray(levels), tx_size, scan))

    for i in range(coeffs.shape[0]):
        want_q, want_eob = qc.quantize_block(coeffs[i], tx_size, tx_type)
        assert eob[i] == want_eob, f"block {i} eob"
        np.testing.assert_array_equal(qdense[i], want_q, err_msg=f"block {i}")


@pytest.mark.parametrize("tx_size,tx_type", TX_CASES)
def test_itx_recon_parity(tx_size, tx_type):
    h, w = tx_size.height, tx_size.width
    bd = 8
    res = RNG.integers(-200, 201, (5, h, w)).astype(np.int32)
    coeffs = tf.forward_transform(res, tx_size, tx_type, bd)
    qindex = 100
    qc = QuantizationContext()
    qc.update(qindex, tx_size, False, bd)
    cw, ch = min(w, 32), min(h, 32)
    scan = _scan_u16(cw, ch, "default")
    levels, eob = dsp.quantize_batched(
        jnp.asarray(coeffs), tx_size, scan, qc.dc_quant, qc.ac_quant, False)
    qdense = dsp.scan_to_dense(levels, tx_size, scan)
    pred = RNG.integers(0, 256, (5, h, w)).astype(np.int32)

    got = np.asarray(dsp.itx_add_batched(
        qdense, jnp.asarray(pred), tx_size, tx_type, bd,
        qc.dc_quant, qc.ac_quant))

    qdense_np = np.asarray(qdense)
    deq = np.stack([
        dequantize(qindex, qdense_np[i], tx_size, bd)
        for i in range(qdense_np.shape[0])
    ])
    want = tf.inverse_transform_add(deq, pred, tx_size, tx_type, bd)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("per_block_q", [False, True])
def test_quantize_per_block_q(per_block_q):
    """Segmentation: per-block quantizers must match per-block host calls."""
    tx_size, tx_type = TxSize.TX_16X16, TxType.DCT_DCT
    h, w = 16, 16
    res = RNG.integers(-510, 511, (6, h, w)).astype(np.int32)
    coeffs = tf.forward_transform(res, tx_size, tx_type, 8)
    scan = _scan_u16(16, 16, "default")
    qidx = RNG.integers(80, 180, 6) if per_block_q else np.full(6, 120)
    from rav1e_tpu import tables

    dcq = np.array([tables.dc_q(int(q), 0, 8) for q in qidx], dtype=np.int32)
    acq = np.array([tables.ac_q(int(q), 0, 8) for q in qidx], dtype=np.int32)
    levels, eob = dsp.quantize_batched(
        jnp.asarray(coeffs), tx_size, scan, jnp.asarray(dcq),
        jnp.asarray(acq), False)
    qdense = np.asarray(dsp.scan_to_dense(levels, tx_size, scan))
    eob = np.asarray(eob)
    for i in range(6):
        qc = QuantizationContext()
        qc.update(int(qidx[i]), tx_size, False, 8)
        want_q, want_eob = qc.quantize_block(coeffs[i], tx_size, tx_type)
        assert eob[i] == want_eob
        np.testing.assert_array_equal(qdense[i], want_q)


# ---------------------------------------------------------------------------
# deblock
# ---------------------------------------------------------------------------


def _random_blocks(mi_rows, mi_cols, rng):
    from rav1e_tpu.context.block import FrameBlocks

    fb = FrameBlocks(mi_cols, mi_rows)
    # random 8x8/16x16 partition with random tx/skip
    y = 0
    while y < mi_rows:
        x = 0
        step_y = 4 if (y % 8 == 0 and rng.integers(2)) else 2
        while x < mi_cols:
            step = min(step_y, mi_cols - x, mi_rows - y)
            if step >= 4:
                bsize, txs = 9, int(rng.choice([9, 4]))  # 32x32? no: idx
            # use 8x8 / 16x16 blocks
            if step >= 4:
                bsize = 6  # BLOCK_16X16
                txs = int(rng.choice([4, 1]))  # TX_16X16 / TX_8X8
            else:
                bsize = 3  # BLOCK_8X8
                txs = int(rng.choice([1, 0]))  # TX_8X8 / TX_4X4
            skip = int(rng.integers(2))
            inter = int(rng.integers(2))
            fb.bsize[y:y + step, x:x + step] = bsize
            fb.tx_size[y:y + step, x:x + step] = txs
            fb.skip[y:y + step, x:x + step] = skip
            fb.ref_frames[y:y + step, x:x + step, 0] = inter
            fb.ref_frames[y:y + step, x:x + step, 1] = -1
            x += step
        y += step_y
    return fb


def test_deblock_chroma_full_coverage():
    """Regression: chroma deblocking must reach the right/bottom half of the
    plane (the crop handling used to decimate the plane-unit count twice,
    leaving half of every chroma plane unfiltered in encoder AND decoder)."""
    from rav1e_tpu.context.block import FrameBlocks
    from rav1e_tpu.ops.deblock import deblock_plane
    from rav1e_tpu.partition import BlockSize
    from rav1e_tpu.tx import TxSize

    mi_cols, mi_rows = 32, 16
    fb = FrameBlocks(mi_cols, mi_rows)
    fb.bsize[:] = int(BlockSize.BLOCK_8X8)
    fb.tx_size[:] = int(TxSize.TX_8X8)
    fb.skip[:] = False
    fb.ref_frames[:, :, 0] = 0
    pw, ph = 64, 32
    pad = 16
    plane = np.zeros((ph + 2 * pad, pw + 2 * pad), dtype=np.int32)
    for x in range(plane.shape[1]):
        plane[:, x] = 60 + 6 * ((x - pad) // 4 % 2)
    before = plane.copy()
    deblock_plane([31, 31, 24, 24], plane[pad:, pad:], fb, 1, pw, ph, 8, 1, 1)
    diff = np.abs(plane - before)
    assert (diff[:, pad + 32:pad + pw] > 0).any(), "right chroma half unfiltered"
    assert (diff[:, :pad + 32] > 0).any()


@pytest.mark.parametrize("bd", [8, 10])
@pytest.mark.parametrize("pli,xdec,ydec", [(0, 0, 0), (1, 1, 1)])
def test_deblock_pass_parity(bd, pli, xdec, ydec):
    from rav1e_tpu.ops.deblock import (
        _plane_edge_decisions, deblock_plane,
    )

    rng = np.random.default_rng(7)
    mi_rows, mi_cols = 24, 32
    crop_h, crop_w = mi_rows * 4, mi_cols * 4
    fb = _random_blocks(mi_rows, mi_cols, rng)

    ph, pw = crop_h >> ydec, crop_w >> xdec
    pad = 8
    plane = rng.integers(0, 1 << bd, (ph + 2 * pad, pw + 2 * pad)).astype(np.int32)

    levels = [32, 32, 24, 20]
    # host oracle (operates on an unpadded view, in place)
    host = plane.copy()
    deblock_plane(levels, host[pad:, pad:], fb, pli, pw, ph, bd, xdec, ydec)

    # device: per-pass fsize grids from the same host edge-decision code
    cols_p = pw >> 2 << 0
    rows_p = ph >> 2
    dev = jnp.asarray(plane)
    for vertical in (True, False):
        level = levels[0 if vertical else 1] if pli == 0 else levels[pli + 1]
        sizes = _plane_edge_decisions(fb, pli, xdec, ydec, cols_p, rows_p, vertical)
        if vertical:
            sizes[:, 0] = 0
        else:
            sizes[0, :] = 0
        dev = dsp.deblock_pass_device(
            dev, jnp.asarray(sizes.astype(np.int32)), level, bd, vertical)
    np.testing.assert_array_equal(np.asarray(dev)[pad:pad + ph, pad:pad + pw],
                                  host[pad:pad + ph, pad:pad + pw])


@pytest.mark.parametrize("dtype,maxv", [(np.uint8, 255), (np.int32, 4095)])
def test_onehot_gather_parity(dtype, maxv, monkeypatch):
    """The TPU one-hot MXU window gather must equal the advanced-indexing
    gather exactly (bf16 per-byte-half matmuls; dsp.gather_rows_onehot /
    _cols_window).  Forced on under the CPU backend to pin the math."""
    monkeypatch.setattr(dsp, "_on_tpu", lambda: True)
    rng = np.random.default_rng(7)
    H, W = 96, 160
    ref = rng.integers(0, maxv + 1, (H, W)).astype(dtype)
    n = 40
    iy0 = rng.integers(0, H - 16, n).astype(np.int32)
    ix0 = rng.integers(0, W - 16, n).astype(np.int32)
    got = np.asarray(dsp.mc_gather_windows(
        jnp.asarray(ref), jnp.asarray(iy0), jnp.asarray(ix0), 8, 8))
    exp = np.stack([ref[y:y + 15, x:x + 15] for y, x in zip(iy0, ix0)])
    assert np.array_equal(got, exp.astype(np.int32))

    refs = rng.integers(0, maxv + 1, (3, H, W)).astype(dtype)
    ridx = rng.integers(0, 3, n).astype(np.int32)
    got = np.asarray(dsp.mc_gather_windows_ref(
        jnp.asarray(refs), jnp.asarray(ridx), jnp.asarray(iy0),
        jnp.asarray(ix0), 8, 8))
    exp = np.stack([refs[r, y:y + 15, x:x + 15]
                    for r, y, x in zip(ridx, iy0, ix0)])
    assert np.array_equal(got, exp.astype(np.int32))
