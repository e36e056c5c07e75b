"""Device (TPU) recon-path DSP kernels: batched exact-integer MC, forward
transform + quantize, dequantize + inverse transform, and deblocking.

These are the device counterparts of the reference's compiled kernel
families (SURVEY §2.6; reference build.rs:92-133 — mc*.asm, itx*.asm,
sad/satd, deblock.rs) for the *reconstruction* path: every function here is
bit-exact integer math (i32 only — TPU has no i64) asserted against the
host oracles (`ops/mc.py`, `quantize.py`, `ops/transforms.py`,
`ops/deblock.py`) by tests/test_device_dsp.py.

Design (TPU-first, not a port):
 - whole-frame batches of same-shaped blocks ("buckets") with static shapes;
   per-block variation (MV, subpel phase, reference, quantizer) is handled
   by gathers, never by control flow;
 - the decode-side semantics (MC prediction, dequant+inverse tx+add,
   deblock apply) are exact per spec: the recon produced here IS the
   reference buffer the decoder must match;
 - selection-side math (SAD, deblock level search) only needs determinism.

Everything composes under one `jax.jit` per frame geometry
(`device/chain.py`).
"""

from __future__ import annotations

import functools

import numpy as np

from rav1e_tpu.ops.mc import SUBPEL_FILTERS
from rav1e_tpu.ops.transforms import (
    FWD_MAT_SHIFT,
    _fwd_matrices_int,
    inverse_transform_add,
)
from rav1e_tpu.tx import TxSize, TxType, get_log_tx_scale


def _jnp():
    import jax.numpy as jnp

    return jnp


def _rs(x, bit: int):
    """round_shift on int32 (arithmetic shift — matches native rshift12_32)."""
    if bit == 0:
        return x
    return (x + (1 << (bit - 1))) >> bit


# ---------------------------------------------------------------------------
# Motion compensation (exact; ops/mc.py put_8tap / prep_8tap / mc_avg)
# ---------------------------------------------------------------------------
#
# The host kernel has four rounding branches keyed on (col_frac==0,
# row_frac==0).  The general two-stage path with the phase-0 filter row
# ([0,0,0,128,0,...]) is bit-identical to every special branch (the pure
# shifts commute with the round-shifts and the i16 intermediate never wraps
# for <=12-bit pixels), so the batched kernel runs ONE static program and
# per-block subpel phases become a (N, 8) tap gather.


def _filter_table(length: int, mode: int = 0) -> np.ndarray:
    """(16, 8) tap table for this block length / filter mode."""
    idx = mode if (mode == 3 or length > 4) else min(mode, 1) + 4
    return SUBPEL_FILTERS[idx]


def _on_tpu() -> bool:
    import os

    if os.environ.get("RAV1E_TPU_NO_ONEHOT_MC"):
        return False
    try:
        import jax

        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def gather_rows_onehot(ref_pad, iy0, nrows: int):
    """Row gather as a one-hot MXU matmul: (N,) top-left rows ->
    (N, nrows, W) i32 strips of ref_pad (H, W).

    XLA lowers the advanced-indexing gather to a serialized per-row loop
    on TPU (~150 ns/row — 8.8 ms for one frame of 8x8 blocks, measured);
    the same selection as onehot(bf16) @ plane(bf16) -> f32 runs on the
    MXU in ~0.3 ms.  Exact: pixels (<= 12-bit... 8-bit here) are exact in
    bf16? only <= 8-bit — so the plane is fed as TWO bf16 planes (low
    byte, high bits) for bd > 8; each product has a single nonzero term,
    f32 accumulate is exact."""
    jnp = _jnp()
    H, W = ref_pad.shape
    n = iy0.shape[0]
    rows_idx = (iy0[:, None] + jnp.arange(nrows, dtype=jnp.int32)[None, :]
                ).reshape(-1)  # (n*nrows,)
    iota = jnp.arange(H, dtype=jnp.int32)
    onehot = (rows_idx[:, None] == iota[None, :]).astype(jnp.bfloat16)
    p = ref_pad.astype(jnp.int32)
    lo = (p & 0xFF).astype(jnp.bfloat16)
    out = jnp.dot(onehot, lo, preferred_element_type=jnp.float32)
    hi_bits = None
    # static dtype probe: uint8/int8 planes never need the high half
    if ref_pad.dtype not in (jnp.uint8, jnp.int8):
        hi = (p >> 8).astype(jnp.bfloat16)
        hi_bits = jnp.dot(onehot, hi, preferred_element_type=jnp.float32)
    res = out.astype(jnp.int32)
    if hi_bits is not None:
        res = res + (hi_bits.astype(jnp.int32) << 8)
    return res.reshape(n, nrows, W)


def _is_narrow(dtype) -> bool:
    """True when values fit 8 bits (bf16-exact without a byte split)."""
    jnp = _jnp()
    return dtype in (jnp.uint8, jnp.int8)


def mc_gather_windows(ref_pad, iy0, ix0, h: int, w: int):
    """ref_pad: (H, W) padded plane; iy0/ix0: (N,) int32 top-left
    indices INTO THE PADDED ARRAY of the (h+7, w+7) support window.
    Returns (N, h + 7, w + 7) int32."""
    jnp = _jnp()
    if _on_tpu():
        rows = gather_rows_onehot(ref_pad, iy0, h + 7)  # (n, h+7, W)
        return _cols_window(rows, ix0, w + 7, _is_narrow(ref_pad.dtype))
    iy = iy0[:, None, None] + jnp.arange(h + 7, dtype=jnp.int32)[None, :, None]
    ix = ix0[:, None, None] + jnp.arange(w + 7, dtype=jnp.int32)[None, None, :]
    return ref_pad[iy, ix].astype(jnp.int32)


def mc_gather_windows_ref(ref_stack, ridx, iy0, ix0, h: int, w: int):
    """Window gather with a per-block leading reference select:
    ref_stack (R, H, W), ridx (N,) i32 -> (N, h+7, w+7) i32.  On TPU the
    ref select folds into the row one-hot by flattening the stack to
    (R*H, W) and offsetting the row indices by ridx*H."""
    jnp = _jnp()
    if _on_tpu():
        R, H, W = ref_stack.shape
        flat = ref_stack.reshape(R * H, W)
        rows = gather_rows_onehot(flat, ridx * H + iy0, h + 7)
        return _cols_window(rows, ix0, w + 7, _is_narrow(ref_stack.dtype))
    iy = iy0[:, None, None] + jnp.arange(h + 7, dtype=jnp.int32)[None, :, None]
    ix = ix0[:, None, None] + jnp.arange(w + 7, dtype=jnp.int32)[None, None, :]
    return ref_stack[ridx[:, None, None], iy, ix].astype(jnp.int32)


def _cols_window(rows, ix0, ncols: int, narrow: bool = True):
    """(n, r, W) strips -> (n, r, ncols) windows at per-block column
    offsets, as a batched one-hot matmul.

    TPU lowers "f32" matmuls to single-pass bf16 on the MXU
    (xla_allow_excess_precision), so a plain f32 einsum silently rounds
    values above 8 bits — 12-bit pixels came back off by bf16 ulps.  The
    one-hot select is therefore done per byte half (each bf16-exact) and
    recombined in i32; `narrow` skips the high half for 8-bit content."""
    jnp = _jnp()
    n, r, W = rows.shape
    jj = jnp.arange(W, dtype=jnp.int32)
    cc = jnp.arange(ncols, dtype=jnp.int32)
    # sel[n, j, c] = 1 iff j == ix0[n] + c
    sel = (
        jj[None, :, None] - cc[None, None, :] == ix0[:, None, None]
    ).astype(jnp.bfloat16)
    lo = (rows & 0xFF).astype(jnp.bfloat16)
    out = jnp.einsum(
        "nrw,nwc->nrc", lo, sel, preferred_element_type=jnp.float32
    ).astype(jnp.int32)
    if not narrow:
        hi = (rows >> 8).astype(jnp.bfloat16)
        out = out + (jnp.einsum(
            "nrw,nwc->nrc", hi, sel, preferred_element_type=jnp.float32
        ).astype(jnp.int32) << 8)
    return out


def _mc_two_stage(win, xf, yf, h: int, w: int, bd: int):
    """Shared 8-tap horizontal+vertical stages.

    win: (N, h+7, w+7) i32; xf/yf: (N, 8) i32 taps.
    Returns pre-final (N, h, w) i32 accumulator after the vertical stage
    WITHOUT the final shift (callers apply put/prep finals)."""
    jnp = _jnp()
    import jax

    inter_bits = 4 - (2 if bd == 12 else 0)
    horiz = jnp.zeros((win.shape[0], h + 7, w), dtype=jnp.int32)
    for k in range(8):
        horiz = horiz + xf[:, k, None, None] * jax.lax.dynamic_slice_in_dim(
            win, k, w, axis=2
        )
    horiz = _rs(horiz, 7 - inter_bits)
    # i16 intermediate domain (never wraps for <=12-bit input, kept for
    # bit-parity with the host kernel)
    horiz = ((horiz + (1 << 15)) & 0xFFFF) - (1 << 15)
    acc = jnp.zeros((win.shape[0], h, w), dtype=jnp.int32)
    for k in range(8):
        acc = acc + yf[:, k, None, None] * jax.lax.dynamic_slice_in_dim(
            horiz, k, h, axis=1
        )
    return acc


def mc_put_batched(ref_pad, pad: int, pos_y, pos_x, mv_r, mv_c,
                   h: int, w: int, bd: int, xdec: int = 0, ydec: int = 0):
    """Batched put_8tap (REGULAR): (N,) blocks of static (h, w).

    ref_pad: (H+2p, W+2p) padded plane (or (R, H+2p, W+2p) with a leading
    ref-select axis — pass pre-gathered windows via mc_put_from_windows
    instead for that case).
    pos_y/pos_x: (N,) top-left PLANE coords (unpadded, this plane's units).
    mv_r/mv_c: (N,) 1/8-pel LUMA motion vectors.
    Returns (N, h, w) int32 prediction in [0, 2^bd).
    """
    jnp = _jnp()
    row_int = mv_r >> (3 + ydec)
    col_int = mv_c >> (3 + xdec)
    iy0 = pad + pos_y + row_int - 3
    ix0 = pad + pos_x + col_int - 3
    win = mc_gather_windows(ref_pad, iy0, ix0, h, w)
    return mc_put_from_windows(win, mv_r, mv_c, h, w, bd, xdec, ydec)


def mc_put_from_windows(win, mv_r, mv_c, h: int, w: int, bd: int,
                        xdec: int = 0, ydec: int = 0):
    """put_8tap over pre-gathered (N, h+7, w+7) support windows."""
    jnp = _jnp()
    inter_bits = 4 - (2 if bd == 12 else 0)
    row_frac = (mv_r << (1 - ydec)) & 0xF
    col_frac = (mv_c << (1 - xdec)) & 0xF
    xtab = jnp.asarray(_filter_table(w), dtype=jnp.int32)
    ytab = jnp.asarray(_filter_table(h), dtype=jnp.int32)
    xf = xtab[col_frac]
    yf = ytab[row_frac]
    acc = _mc_two_stage(win, xf, yf, h, w, bd)
    out = _rs(acc, 7 + inter_bits)
    return jnp.clip(out, 0, (1 << bd) - 1)


PREP_BIAS = 8192


def mc_prep_from_windows(win, mv_r, mv_c, h: int, w: int, bd: int,
                         xdec: int = 0, ydec: int = 0):
    """prep_8tap over pre-gathered windows: compound intermediate (i16
    domain, no clamp)."""
    jnp = _jnp()
    prep_bias = 0 if bd == 8 else PREP_BIAS
    row_frac = (mv_r << (1 - ydec)) & 0xF
    col_frac = (mv_c << (1 - xdec)) & 0xF
    xtab = jnp.asarray(_filter_table(w), dtype=jnp.int32)
    ytab = jnp.asarray(_filter_table(h), dtype=jnp.int32)
    xf = xtab[col_frac]
    yf = ytab[row_frac]
    acc = _mc_two_stage(win, xf, yf, h, w, bd)
    return _rs(acc, 7) - prep_bias


def mc_avg(t1, t2, bd: int):
    """Compound average of two prep intermediates (ops/mc.py mc_avg)."""
    jnp = _jnp()
    inter_bits = 4 - (2 if bd == 12 else 0)
    prep_bias = 0 if bd == 8 else PREP_BIAS * 2
    v = _rs(t1 + t2 + prep_bias, inter_bits + 1)
    return jnp.clip(v, 0, (1 << bd) - 1)


# ---------------------------------------------------------------------------
# Forward transform + quantize (encoder-side; bit-parity with native
# enc_fwd_quant for 8-bit input, which always satisfies its i32 fast path)
# ---------------------------------------------------------------------------


@functools.lru_cache(None)
def _fwd_mats_i32(tx_size: TxSize, tx_type: TxType):
    fv, fh = _fwd_matrices_int(tx_size, tx_type)
    return (
        np.ascontiguousarray(fv, dtype=np.int32),
        np.ascontiguousarray(fh, dtype=np.int32),
    )


def fwd_tx_batched(res, tx_size: TxSize, tx_type: TxType):
    """(N, h, w) int32 residual -> (N, h, w) int32 coefficients.

    Exact Q12 two-stage integer matmul — bit-identical to the native i32
    fast path (valid whenever the row L1 norms bound accumulators below
    2^31; always true for 8-bit content, native/enc.cc:1291-1296).
    """
    jnp = _jnp()
    fv, fh = _fwd_mats_i32(tx_size, tx_type)
    t = jnp.einsum(
        "ij,bjk->bik", jnp.asarray(fv), res.astype(jnp.int32),
        preferred_element_type=jnp.int32,
    )
    t = _rs(t, FWD_MAT_SHIFT)
    c = jnp.einsum(
        "bij,kj->bik", t, jnp.asarray(fh), preferred_element_type=jnp.int32
    )
    c = _rs(c, FWD_MAT_SHIFT)
    w, h = tx_size.width, tx_size.height
    if w > 32:
        c = jnp.where(jnp.arange(w)[None, None, :] < 32, c, 0)
    if h > 32:
        c = jnp.where(jnp.arange(h)[None, :, None] < 32, c, 0)
    return c


def quantize_batched(coeffs, tx_size: TxSize, scan: np.ndarray,
                     dcq, acq, is_intra: bool):
    """Exact deadzone quantizer over (N, h, w) coefficients.

    dcq/acq: scalar ints or (N,) int32 per-block quants (segmentation).
    scan: (coded_area,) uint16 scan order over the coded (<=32x32) region.
    Returns (levels, eob): levels (N, coded_area) int32 IN SCAN ORDER,
    eob (N,) int32.  Mirrors native enc_fwd_quant's quantize stage
    (enc.cc:1365-1408) bit-for-bit (i32-safe for 8/10-bit).
    """
    jnp = _jnp()
    w, h = tx_size.width, tx_size.height
    cw, ch = min(w, 32), min(h, 32)
    lts = get_log_tx_scale(tx_size)
    dcq = jnp.asarray(dcq, dtype=jnp.int32)
    acq = jnp.asarray(acq, dtype=jnp.int32)
    if dcq.ndim == 0:
        dcq = dcq[None]
    if acq.ndim == 0:
        acq = acq[None]
    dc_off = dcq * (109 if is_intra else 108) // 256
    ac_off0 = acq * (98 if is_intra else 97) // 256
    ac_off1 = acq * (109 if is_intra else 108) // 256
    ac_off_eob = acq * (88 if is_intra else 44) // 256

    sub = coeffs[:, :ch, :cw].reshape(coeffs.shape[0], ch * cw)
    scan_i = jnp.asarray(np.ascontiguousarray(scan, dtype=np.int32))
    s = jnp.take(sub, scan_i, axis=1)  # (N, area) scan-ordered

    area = cw * ch
    idx = jnp.arange(area, dtype=jnp.int32)[None, :]

    # DC
    scaled0 = s[:, 0] << lts
    a0 = jnp.abs(scaled0)
    dc_level = (a0 + dc_off) // dcq
    dc_q = jnp.sign(scaled0) * dc_level

    # deadzone EOB pre-scan over AC positions
    deadzone = (acq - ac_off_eob + (1 << lts) - 1) >> lts
    live = (jnp.abs(s) >= deadzone[:, None]) & (idx >= 1)
    eob0 = jnp.max(jnp.where(live, idx + 1, 0), axis=1)
    eob0 = jnp.maximum(eob0, (dc_q != 0).astype(jnp.int32))

    # AC quantize inside [1, eob0)
    scaled = s << lts
    a = jnp.abs(scaled)
    level0 = a // acq[:, None]
    offset = jnp.where(level0 > 0, ac_off1[:, None], ac_off0[:, None])
    qabs = level0 + ((a + offset) >= (level0 + 1) * acq[:, None]).astype(
        jnp.int32
    )
    qac = jnp.sign(scaled) * qabs
    inside = (idx >= 1) & (idx < eob0[:, None])
    levels = jnp.where(inside, qac, 0)
    levels = levels.at[:, 0].set(dc_q)

    eob = jnp.max(jnp.where(levels != 0, idx + 1, 0), axis=1)
    return levels, eob


def scan_to_dense(levels, tx_size: TxSize, scan: np.ndarray):
    """(N, coded_area) scan-ordered levels -> (N, h, w) dense qcoeffs."""
    jnp = _jnp()
    w, h = tx_size.width, tx_size.height
    cw, ch = min(w, 32), min(h, 32)
    inv = np.zeros(cw * ch, dtype=np.int32)
    inv[np.asarray(scan, dtype=np.int64)] = np.arange(cw * ch)
    sub = jnp.take(levels, jnp.asarray(inv), axis=1).reshape(-1, ch, cw)
    if cw == w and ch == h:
        return sub
    out = jnp.zeros((levels.shape[0], h, w), dtype=jnp.int32)
    return out.at[:, :ch, :cw].set(sub)


def dequant_batched(qdense, tx_size: TxSize, dcq, acq):
    """Exact dequantizer over dense (N, h, w) qcoeffs (quantize.dequantize,
    i32-safe: |level| * q < 2^31 for any codeable stream at 8/10-bit)."""
    jnp = _jnp()
    lts = get_log_tx_scale(tx_size)
    offset = (1 << lts) - 1
    dcq = jnp.asarray(dcq, dtype=jnp.int32).reshape(-1, 1, 1)
    acq = jnp.asarray(acq, dtype=jnp.int32).reshape(-1, 1, 1)
    quant = jnp.broadcast_to(acq, qdense.shape)
    quant = quant.at[:, 0, 0].set(dcq[:, 0, 0])
    prod = qdense * quant
    return (prod + ((prod >> 31) & offset)) >> lts


def itx_add_batched(qdense, pred, tx_size: TxSize, tx_type: TxType,
                    bd: int, dcq, acq):
    """dequant + inverse transform + add + clip: (N, h, w) recon (exact
    decode-side pipeline, ops/transforms.inverse_transform_add)."""
    deq = dequant_batched(qdense, tx_size, dcq, acq)
    return inverse_transform_add(deq, pred, tx_size, tx_type, bd)


# ---------------------------------------------------------------------------
# Deblocking: exact whole-plane apply (ops/deblock.py, vectorized masked
# form) + SSE level search
# ---------------------------------------------------------------------------


def _jx_clamp(v, lo, hi):
    return _jnp().clip(v, lo, hi)


def _jx_ceil_shift(v, shift):
    return (v + (1 << shift) - 1) >> shift if shift else v


def _jx_narrow(p1, p0, q0, q1, shift, use4):
    jnp = _jnp()
    lo, hi = -128 << shift, (128 << shift) - 1
    pix_hi = (256 << shift) - 1
    f0 = _jx_clamp(p1 - q1, lo, hi)
    base2 = f0 + 3 * (q0 - p0)
    f1_2 = _jx_clamp(base2 + 4, lo, hi) >> 3
    f2_2 = _jx_clamp(base2 + 3, lo, hi) >> 3
    base4 = 3 * (q0 - p0)
    f1_4 = _jx_clamp(base4 + 4, lo, hi) >> 3
    f2_4 = _jx_clamp(base4 + 3, lo, hi) >> 3
    f3_4 = (f1_4 + 1) >> 1
    n2 = (p1, _jx_clamp(p0 + f2_2, 0, pix_hi), _jx_clamp(q0 - f1_2, 0, pix_hi), q1)
    n4 = (
        _jx_clamp(p1 + f3_4, 0, pix_hi),
        _jx_clamp(p0 + f2_4, 0, pix_hi),
        _jx_clamp(q0 - f1_4, 0, pix_hi),
        _jx_clamp(q1 - f3_4, 0, pix_hi),
    )
    return [jnp.where(use4, a4, a2) for a4, a2 in zip(n4, n2)]


def _jx_mask_common(diffs, p0, q0, p1, q1, shift):
    jnp = _jnp()
    m = diffs[0]
    for d in diffs[1:]:
        m = jnp.maximum(m, d)
    limit_lvl = _jx_ceil_shift(m, shift)
    blimit = jnp.abs(p0 - q0) * 2 + jnp.abs(p1 - q1) // 2
    blimit_lvl = (_jx_ceil_shift(blimit, shift) - 2) // 3
    return jnp.maximum(limit_lvl, blimit_lvl)


def _jx_nhev4(p1, p0, q0, q1, shift):
    jnp = _jnp()
    t = jnp.maximum(jnp.abs(p1 - p0), jnp.abs(q1 - q0))
    return _jx_ceil_shift(t, shift) << 4


def deblock_groups14(g, level, bd: int, fsize):
    """Filter (N, 4, 14) pixel groups; ``fsize`` (N,) in {0,4,6,8,14}
    selects the filter per group (0 = unfiltered).  Returns the filtered
    (N, 4, 14) groups — the full masked-union of ops/deblock.py's four
    group kernels, centered so window column 7 is q0."""
    jnp = _jnp()
    c = [g[..., i] for i in range(14)]
    res = deblock_taps14(c, level, bd, fsize[:, None])
    return jnp.stack([g[..., 0]] + res + [g[..., 13]], axis=-1)


def deblock_taps14(c, level, bd: int, fs):
    """Layout-agnostic deblock filter core: ``c`` is the 14 tap arrays
    (p6..q6, any common shape), ``fs`` the per-pixel filter-size field
    broadcastable to them.  Returns the 12 modified taps (p5..q5)."""
    jnp = _jnp()
    shift = bd - 8
    flat_t = 1 << shift
    p6, p5, p4, p3, p2, p1, p0, q0, q1, q2, q3, q4, q5, q6 = c

    use4 = _jx_nhev4(p1, p0, q0, q1, shift) <= level

    # per-size decision masks
    m4 = _jx_mask_common(
        [jnp.abs(p1 - p0), jnp.abs(q1 - q0)], p0, q0, p1, q1, shift) <= level
    m6 = _jx_mask_common(
        [jnp.abs(p2 - p1), jnp.abs(p1 - p0), jnp.abs(q2 - q1),
         jnp.abs(q1 - q0)], p0, q0, p1, q1, shift) <= level
    m8 = _jx_mask_common(
        [jnp.abs(p3 - p2), jnp.abs(p2 - p1), jnp.abs(p1 - p0),
         jnp.abs(q3 - q2), jnp.abs(q2 - q1), jnp.abs(q1 - q0)],
        p0, q0, p1, q1, shift) <= level

    flat6 = jnp.maximum(
        jnp.maximum(jnp.abs(p1 - p0), jnp.abs(q1 - q0)),
        jnp.maximum(jnp.abs(p2 - p0), jnp.abs(q2 - q0))) <= flat_t
    f8v = jnp.maximum(
        jnp.maximum(jnp.maximum(jnp.abs(p1 - p0), jnp.abs(q1 - q0)),
                    jnp.maximum(jnp.abs(p2 - p0), jnp.abs(q2 - q0))),
        jnp.maximum(jnp.abs(p3 - p0), jnp.abs(q3 - q0)))
    flat8 = f8v <= flat_t
    flat_out = jnp.maximum(
        jnp.maximum(jnp.maximum(jnp.abs(p4 - p0), jnp.abs(q4 - q0)),
                    jnp.maximum(jnp.abs(p5 - p0), jnp.abs(q5 - q0))),
        jnp.maximum(jnp.abs(p6 - p0), jnp.abs(q6 - q0))) <= flat_t

    narrow = _jx_narrow(p1, p0, q0, q1, shift, use4)

    # wide6 outputs (p1..q1)
    w6 = [
        (p2 * 3 + p1 * 2 + p0 * 2 + q0 + 4) >> 3,
        (p2 + p1 * 2 + p0 * 2 + q0 * 2 + q1 + 4) >> 3,
        (p1 + p0 * 2 + q0 * 2 + q1 * 2 + q2 + 4) >> 3,
        (p0 + q0 * 2 + q1 * 2 + q2 * 3 + 4) >> 3,
    ]
    # wide8 outputs (p2..q2)
    w8 = [
        (p3 * 3 + p2 * 2 + p1 + p0 + q0 + 4) >> 3,
        (p3 * 2 + p2 + p1 * 2 + p0 + q0 + q1 + 4) >> 3,
        (p3 + p2 + p1 + p0 * 2 + q0 + q1 + q2 + 4) >> 3,
        (p2 + p1 + p0 + q0 * 2 + q1 + q2 + q3 + 4) >> 3,
        (p1 + p0 + q0 + q1 * 2 + q2 + q3 * 2 + 4) >> 3,
        (p0 + q0 + q1 + q2 * 2 + q3 * 3 + 4) >> 3,
    ]
    # wide14 outputs (p5..q5)
    w14 = [
        (p6 * 7 + p5 * 2 + p4 * 2 + p3 + p2 + p1 + p0 + q0 + 8) >> 4,
        (p6 * 5 + p5 * 2 + p4 * 2 + p3 * 2 + p2 + p1 + p0 + q0 + q1 + 8) >> 4,
        (p6 * 4 + p5 + p4 * 2 + p3 * 2 + p2 * 2 + p1 + p0 + q0 + q1 + q2 + 8) >> 4,
        (p6 * 3 + p5 + p4 + p3 * 2 + p2 * 2 + p1 * 2 + p0 + q0 + q1 + q2 + q3 + 8) >> 4,
        (p6 * 2 + p5 + p4 + p3 + p2 * 2 + p1 * 2 + p0 * 2 + q0 + q1 + q2 + q3 + q4 + 8) >> 4,
        (p6 + p5 + p4 + p3 + p2 + p1 * 2 + p0 * 2 + q0 * 2 + q1 + q2 + q3 + q4 + q5 + 8) >> 4,
        (p5 + p4 + p3 + p2 + p1 + p0 * 2 + q0 * 2 + q1 * 2 + q2 + q3 + q4 + q5 + q6 + 8) >> 4,
        (p4 + p3 + p2 + p1 + p0 + q0 * 2 + q1 * 2 + q2 * 2 + q3 + q4 + q5 + q6 * 2 + 8) >> 4,
        (p3 + p2 + p1 + p0 + q0 + q1 * 2 + q2 * 2 + q3 * 2 + q4 + q5 + q6 * 3 + 8) >> 4,
        (p2 + p1 + p0 + q0 + q1 + q2 * 2 + q3 * 2 + q4 * 2 + q5 + q6 * 4 + 8) >> 4,
        (p1 + p0 + q0 + q1 + q2 + q3 * 2 + q4 * 2 + q5 * 2 + q6 * 5 + 8) >> 4,
        (p0 + q0 + q1 + q2 + q3 + q4 * 2 + q5 * 2 + q6 * 7 + 8) >> 4,
    ]

    # compose each size's 12 outputs at positions 1..12 (p5..q5)
    out4 = [p5, p4, p3, p2] + narrow + [q2, q3, q4, q5]
    out6 = [p5, p4, p3, p2] + [
        jnp.where(flat6, w, n) for w, n in zip(w6, narrow)
    ] + [q2, q3, q4, q5]
    nar8 = [p2] + narrow + [q2]
    out8 = [p5, p4, p3] + [
        jnp.where(flat8, w, n) for w, n in zip(w8, nar8)
    ] + [q3, q4, q5]
    w8full = [p5, p4, p3] + w8 + [q3, q4, q5]
    nar12 = [p5, p4, p3, p2] + narrow + [q2, q3, q4, q5]
    out14 = [
        jnp.where(flat8, jnp.where(flat_out, wf, w8f), nr)
        for wf, w8f, nr in zip(w14, w8full, nar12)
    ]

    res = [c[i + 1] for i in range(12)]
    for i in range(12):
        v = jnp.where(
            (fs == 4) & m4, out4[i],
            jnp.where((fs == 6) & m6, out6[i],
                      jnp.where((fs == 8) & m8, out8[i],
                                jnp.where((fs == 14) & m8, out14[i], res[i]))))
        res[i] = v
    return res


def deblock_pass_device(rec, fsize_grid, level, bd: int, vertical: bool):
    """One deblock pass over a plane.

    rec: (Hp, Wp) int32 plane padded by >= 8 on each side (pad static,
    Hp/Wp multiples of 4).  fsize_grid: (rows_p, cols_p) int32 filter
    sizes per 4x4 cell edge (0 = skip), as computed by
    ops/deblock._plane_edge_decisions.  level: scalar int.  Returns the
    filtered padded plane.

    TPU-native layout: edges of one orientation are independent (AV1's
    filter-size caps guarantee disjoint modified pixels, ops/deblock.py
    module doc), so each of the 14 window taps is a whole-plane stride-4
    STATIC slice (no gather — XLA serializes gathers on TPU), the filter
    runs as pure elementwise math on (rows, n_edges) tensors, and the
    modified taps recombine via channel-interleave reshapes.
    """
    jnp = _jnp()
    pad = 8
    rows_p, cols_p = fsize_grid.shape
    Hp, Wp = rec.shape
    if vertical:
        ph, n = 4 * rows_p, cols_p
        # tap k lives at column pad + 4*i + (k - 7)
        taps = [rec[pad : pad + ph, pad - 7 + k : pad - 7 + k + 4 * n : 4]
                for k in range(14)]
        fs = jnp.repeat(fsize_grid, 4, axis=0)
        mods = deblock_taps14(taps, level, bd, fs)
        # channel view along columns: col = 4*m + r
        chans = [rec[:, r::4] for r in range(4)]
        for k in range(1, 13):
            d = k - 7
            r = (pad + d) % 4
            m0 = (pad + d) // 4
            delta = jnp.where(fs != 0, mods[k - 1] - taps[k], 0)
            chans[r] = chans[r].at[pad : pad + ph, m0 : m0 + n].add(delta)
        return jnp.stack(chans, axis=-1).reshape(Hp, Wp)
    pw, n = 4 * cols_p, rows_p
    taps = [rec[pad - 7 + k : pad - 7 + k + 4 * n : 4, pad : pad + pw]
            for k in range(14)]
    fs = jnp.repeat(fsize_grid, 4, axis=1)
    mods = deblock_taps14(taps, level, bd, fs)
    chans = [rec[r::4, :] for r in range(4)]
    for k in range(1, 13):
        d = k - 7
        r = (pad + d) % 4
        m0 = (pad + d) // 4
        delta = jnp.where(fs != 0, mods[k - 1] - taps[k], 0)
        chans[r] = chans[r].at[m0 : m0 + n, pad : pad + pw].add(delta)
    return jnp.stack(chans, axis=1).reshape(Hp, Wp)
