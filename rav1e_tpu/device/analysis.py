"""Batched device frame analysis: the jitted search half of the encoder.

Replaces the reference's serial trial loops with whole-frame tensor math
(the redesign SURVEY §7 specifies):

- all 13 intra prediction modes evaluated for every block at every
  partition size as one (n_blocks, n_modes, s, s) batch per size
  (reference: rdo.rs:1394 intra_frame_rdo_mode_decision trial loop);
- SATD mode scoring via batched 8x8 Hadamard matmuls (dist.rs:156);
- transform-domain rate/distortion estimation of the winning mode's
  residual — forward DCT (MXU matmuls), quantize, per-level rate LUT,
  quantization-error distortion — the device analog of the reference's
  ``TxDistEstRate`` RDO type (rdo.rs:53, estimate_rate rdo.rs:127);
- inter costing of the motion-compensated residual from the hierarchical
  ME field (me.rs:153 estimate_tile_motion output);
- bottom-up partition merge D+λR over sizes 8..64
  (rdo.rs:1949 rdo_partition_decision / encoder.rs:2634 bottomup).

Decisions use *source* neighbors for prediction edges (the reference's own
lookahead approximation precedent, api/lookahead.rs:30); the host codes the
winners exactly against reconstruction edges.

Everything traces under ``jax.jit``; one compile per frame geometry.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from rav1e_tpu import tables
from rav1e_tpu.ops.intra import DR_INTRA_DERIVATIVE, SM_WEIGHTS
from rav1e_tpu.partition import PredictionMode, intra_mode_to_angle

# Analysis partition sizes (px log2): 8x8 .. 64x64
SIZE_LOG2S = (3, 4, 5, 6)
N_MODES = 13  # PredictionMode 0..12 (everything except UV_CFL)

# estimated header bits per coded block (partition ctx + skip + tx + ref):
# coarse constants, calibrated against the host trial search on test clips
HDR_BITS = 7.0
SPLIT_BITS = 2.5
# per-mode signaling-cost estimate in bits (DC cheapest, directional dearest)
MODE_BITS = np.array(
    [1.5, 3.0, 3.0, 4.5, 4.5, 4.5, 4.5, 4.5, 4.5, 3.5, 4.0, 4.0, 3.0],
    dtype=np.float32,
)
INTER_BITS = 9.0  # ref + inter mode + mvd estimate


def _jnp():
    import jax.numpy as jnp

    return jnp


# ---------------------------------------------------------------------------
# static per-(mode, size) index plans for directional prediction
# ---------------------------------------------------------------------------


@functools.lru_cache(None)
def _ief_static(s: int, p_angle: int):
    """Static intra-edge-filter config of a square s-block directional mode
    at angle_delta=0, smooth_filter=False (spec 7.11.2.9/.10; the same
    selectors the coder uses, ops/intra.select_ief_strength/..._upsample).

    Returns (st_above, st_left, ups_above, ups_left, num_above, num_left)
    where num_* counts edge SAMPLES (excl. the top-left at buffer index 0).
    """
    from rav1e_tpu.ops.intra import select_ief_strength, select_ief_upsample

    st_a = select_ief_strength(s, s, False, p_angle - 90)
    st_l = select_ief_strength(s, s, False, p_angle - 180)
    ups_a = select_ief_upsample(s, s, False, p_angle - 90)
    ups_l = select_ief_upsample(s, s, False, p_angle - 180)
    num_a = s + (s if p_angle < 90 else 0)
    num_l = s + (s if p_angle > 180 else 0)
    return st_a, st_l, ups_a, ups_l, num_a, num_l


_EDGE_KERNELS = ((0, 4, 8, 4, 0), (0, 5, 6, 5, 0), (2, 4, 4, 4, 2))


@functools.lru_cache(None)
def _filter_idx(L: int, num: int):
    idx = np.arange(L)
    mats = tuple(
        np.clip(idx - 2 + j, 0, num - 1).astype(np.int32) for j in range(5)
    )
    valid = (idx >= 1) & (idx < num)
    return mats, valid


def _filter_edge_dev(buf, num: int, strength: int):
    """Batched spec 7.11.2.12 edge filter over (n, L) buffers: positions
    1..num-1 filtered with taps clamped to [0, num-1], rest untouched
    (ops/intra.filter_edge semantics; buffer index 0 = top-left)."""
    if strength == 0:
        return buf
    jnp = _jnp()
    L = buf.shape[1]
    mats, valid = _filter_idx(L, num)
    k = _EDGE_KERNELS[strength - 1]
    acc = None
    for j in range(5):
        if k[j] == 0:
            continue
        t = k[j] * jnp.take(buf, jnp.asarray(mats[j]), axis=1)
        acc = t if acc is None else acc + t
    out = (acc + 8) >> 4
    return jnp.where(jnp.asarray(valid)[None, :], out, buf)


def _upsample_edge_dev(buf, num_px: int, bd: int):
    """Batched spec 7.11.2.11 edge upsample: (n, >=num_px+1) buffer with
    index 0 = top-left -> (n, 2*num_px+1) where index m = upsampled spec
    position m-2 (ops/intra.upsample_edge semantics, incl. the C-style
    truncating /16)."""
    jnp = _jnp()
    dup = jnp.concatenate(
        [buf[:, :1], buf[:, : num_px + 1], buf[:, num_px : num_px + 1]],
        axis=1,
    )
    t = (
        -dup[:, 0:num_px] + 9 * dup[:, 1 : num_px + 1]
        + 9 * dup[:, 2 : num_px + 2] - dup[:, 3 : num_px + 3]
    )
    q = t + 8
    q = jnp.sign(q) * (jnp.abs(q) // 16)
    odd = jnp.clip(q, 0, (1 << bd) - 1)
    even = dup[:, 2 : num_px + 2]
    inter = jnp.stack([odd, even], axis=2).reshape(buf.shape[0], 2 * num_px)
    return jnp.concatenate([dup[:, 0:1], inter], axis=1)


@functools.lru_cache(None)
def _dir_plan(s: int, p_angle: int, ua: int, ul: int, La: int, Ll: int):
    """Static gather indices / blend shifts of the directional predictor
    (spec 7.11.2.4 steps 4-9) over filtered/upsampled edge buffers of
    lengths La/Ll, exactly mirroring ops/intra._pred_directional."""
    ii, jj = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
    off_a, off_l = 1 << ua, 1 << ul
    if p_angle < 90:
        dx = DR_INTRA_DERIVATIVE[p_angle]
        idx = (ii + 1) * dx
        base = (idx >> (6 - ua)) + (jj << ua)
        shift = ((idx << ua) >> 1) & 31
        max_base = (2 * s - 1) << ua
        basec = np.minimum(base, max_base)
        return (
            "above",
            (off_a + basec).astype(np.int32),
            (off_a + np.minimum(basec + 1, max_base)).astype(np.int32),
            shift.astype(np.int32),
            (base < max_base),
            off_a + max_base,
        )
    if p_angle > 180:
        dy = DR_INTRA_DERIVATIVE[270 - p_angle]
        idx = (jj + 1) * dy
        base = (idx >> (6 - ul)) + (ii << ul)
        shift = ((idx << ul) >> 1) & 31
        max_base = (2 * s - 1) << ul
        basec = np.minimum(base, max_base)
        return (
            "left",
            (off_l + basec).astype(np.int32),
            (off_l + np.minimum(basec + 1, max_base)).astype(np.int32),
            shift.astype(np.int32),
            None,
            None,
        )
    # 90 < angle < 180: mix of above and left
    dx = DR_INTRA_DERIVATIVE[180 - p_angle]
    dy = DR_INTRA_DERIVATIVE[p_angle - 90]
    idx_a = (jj << 6) - (ii + 1) * dx
    base_a = idx_a >> (6 - ua)
    shift_a = ((idx_a << ua) >> 1) & 31
    use_above = base_a >= -(1 << ua)
    ba = np.clip(base_a, -off_a, s << ua)
    idx_l = (ii << 6) - (jj + 1) * dy
    base_l = idx_l >> (6 - ul)
    shift_l = ((idx_l << ul) >> 1) & 31
    bl = np.clip(base_l, -off_l, (2 * s - 1) << ul)
    return (
        "mix",
        (
            np.clip(off_a + ba, 0, La - 1).astype(np.int32),
            np.clip(off_a + ba + 1, 0, La - 1).astype(np.int32),
            shift_a.astype(np.int32),
        ),
        (
            np.clip(off_l + bl, 0, Ll - 1).astype(np.int32),
            np.clip(off_l + bl + 1, 0, Ll - 1).astype(np.int32),
            shift_l.astype(np.int32),
        ),
        use_above,
        None,
    )


def _take_blend(buf, i0, i1, shift):
    """buf: (n, L); static index/blend matrices (s, s) -> (n, s, s)."""
    jnp = _jnp()
    a = jnp.take(buf, jnp.asarray(i0.reshape(-1)), axis=1)
    b = jnp.take(buf, jnp.asarray(i1.reshape(-1)), axis=1)
    sh = jnp.asarray(shift.reshape(-1), dtype=jnp.int32)
    v = (a * (32 - sh) + b * sh + 16) >> 5
    n = buf.shape[0]
    return v.reshape(n, *i0.shape)


def _dir_pred_exact(above_buf, left_buf, tl, mode, s: int, bd: int):
    """One directional mode's prediction with the NORMATIVE edge pipeline:
    top-left corner filter -> edge filter -> edge upsample -> gather/blend
    (spec 7.11.2.7-.12), batched over n blocks.  Bit-identical to the
    coder's ops/intra.predict_intra(ief_params, smooth=False) given the
    same edges — ranking by unfiltered edges misranked directional modes
    badly (the f326471 host-tier fix; this is its device-tier analog)."""
    jnp = _jnp()
    p_angle = intra_mode_to_angle(mode)
    st_a, st_l, ups_a, ups_l, num_a, num_l = _ief_static(s, p_angle)
    abuf, lbuf = above_buf, left_buf
    if 90 < p_angle < 180 and 2 * s >= 24:
        # corner smoothing (ops/intra_edges.build_intra_edge:142-150)
        tlf = (lbuf[:, s] * 5 + tl * 6 + abuf[:, 1] * 5 + 8) >> 4
        abuf = jnp.concatenate([tlf[:, None], abuf[:, 1:]], axis=1)
        lbuf = jnp.concatenate([tlf[:, None], lbuf[:, 1:]], axis=1)
    abuf = _filter_edge_dev(abuf, num_a + 1, st_a)
    lbuf = _filter_edge_dev(lbuf, num_l + 1, st_l)
    ua = ul = 0
    if ups_a:
        abuf = _upsample_edge_dev(abuf, num_a, bd)
        ua = 1
    if ups_l:
        lbuf = _upsample_edge_dev(lbuf, num_l, bd)
        ul = 1
    plan = _dir_plan(s, p_angle, ua, ul, abuf.shape[1], lbuf.shape[1])
    if plan[0] == "above":
        _, i0, i1, sh, in_range, last_i = plan
        v = _take_blend(abuf, i0, i1, sh)
        v = jnp.where(jnp.asarray(in_range), v, abuf[:, last_i][:, None, None])
    elif plan[0] == "left":
        _, i0, i1, sh, _, _ = plan
        v = _take_blend(lbuf, i0, i1, sh)
    else:
        _, pa, pl_, use_above, _ = plan
        va = _take_blend(abuf, *pa)
        vl = _take_blend(lbuf, *pl_)
        v = jnp.where(jnp.asarray(use_above), va, vl)
    return jnp.clip(v, 0, (1 << bd) - 1)


def predict_all_modes(above2, left2, tl, s: int, bd: int):
    """All 13 intra predictions per block: (n, 13, s, s) int32.

    above2/left2: (n, 2s) int32 source edges; tl: (n,) int32.
    """
    jnp = _jnp()
    n = above2.shape[0]
    a = above2[:, :s]
    l = left2[:, :s]
    maxv = (1 << bd) - 1

    dc = (a.sum(-1) + l.sum(-1) + s) // (2 * s)
    dc = jnp.broadcast_to(dc[:, None, None], (n, s, s))
    v = jnp.broadcast_to(a[:, None, :], (n, s, s))
    h = jnp.broadcast_to(l[:, :, None], (n, s, s))

    # Paeth (spec 7.11.2.2)
    base_p = l[:, :, None] + a[:, None, :] - tl[:, None, None]
    pl = jnp.abs(base_p - l[:, :, None])
    pt = jnp.abs(base_p - a[:, None, :])
    ptl = jnp.abs(base_p - tl[:, None, None])
    paeth = jnp.where(
        (pl <= pt) & (pl <= ptl),
        jnp.broadcast_to(l[:, :, None], base_p.shape),
        jnp.where(
            pt <= ptl,
            jnp.broadcast_to(a[:, None, :], base_p.shape),
            jnp.broadcast_to(tl[:, None, None], base_p.shape),
        ),
    )

    # Smooth family (spec 7.11.2.6)
    wv = jnp.asarray(SM_WEIGHTS[s])[None, :, None]
    ww = jnp.asarray(SM_WEIGHTS[s])[None, None, :]
    below = l[:, -1][:, None, None]
    right = a[:, -1][:, None, None]
    smooth = (
        wv * a[:, None, :] + (256 - wv) * below + ww * l[:, :, None] + (256 - ww) * right
        + 256
    ) >> 9
    smooth_v = (wv * a[:, None, :] + (256 - wv) * below + 128) >> 8
    smooth_h = (ww * l[:, :, None] + (256 - ww) * right + 128) >> 8

    # Directional at angle_delta = 0 with the NORMATIVE intra-edge pipeline
    # (corner filter + edge filter + upsample, spec 7.11.2.7-.12) so the
    # scored prediction is the one the coder will emit — scoring raw-edge
    # approximations misranked directional modes badly (f326471)
    above_buf = jnp.concatenate([tl[:, None], above2], axis=1)
    left_buf = jnp.concatenate([tl[:, None], left2], axis=1)
    dir_preds = {}
    for mode in (
        PredictionMode.D45_PRED,
        PredictionMode.D135_PRED,
        PredictionMode.D113_PRED,
        PredictionMode.D157_PRED,
        PredictionMode.D203_PRED,
        PredictionMode.D67_PRED,
    ):
        dir_preds[int(mode)] = _dir_pred_exact(
            above_buf, left_buf, tl, mode, s, bd
        )

    # order must match PredictionMode 0..12
    return jnp.stack(
        [
            dc, v, h,
            dir_preds[3], dir_preds[4], dir_preds[5], dir_preds[6],
            dir_preds[7], dir_preds[8],
            smooth, smooth_v, smooth_h, paeth,
        ],
        axis=1,
    ).astype(jnp.int32)


# ---------------------------------------------------------------------------
# SATD and transform-domain rate/distortion estimation
# ---------------------------------------------------------------------------


@functools.lru_cache(None)
def _hadamard8_f32():
    h = np.array([[1.0]], dtype=np.float32)
    while h.shape[0] < 8:
        h = np.block([[h, h], [h, -h]])
    return h.astype(np.float32)


def satd8(diff):
    """SATD over (..., s, s) int32 diffs using 8x8 Hadamard cells, matching
    ops/dist.get_satd normalization (>> 3 for the 8-point transform).

    On TPU backends this routes through the Pallas MXU kernel
    (device/pallas_kernels.satd8: one 128-lane Kronecker matmul per tile
    with the |.|-sum-floor epilogue fused in VMEM); elsewhere the einsum
    form below is used — both are bit-identical (tests/test_pallas.py)."""
    from rav1e_tpu.device import pallas_kernels as _pk

    if _pk.pallas_ok():
        return _pk.satd8(diff)
    jnp = _jnp()
    *lead, sh, sw = diff.shape
    d = diff.astype(jnp.float32).reshape(*lead, sh // 8, 8, sw // 8, 8)
    d = jnp.moveaxis(d, -2, -3)  # (..., sh/8, sw/8, 8, 8)
    h8 = jnp.asarray(_hadamard8_f32())
    t = jnp.einsum("ij,...jk,kl->...il", h8, d, h8)
    cells = jnp.abs(t).sum(axis=(-1, -2))
    cells = jnp.floor((cells + 4.0) / 8.0)
    return cells.sum(axis=(-1, -2))


@functools.lru_cache(None)
def _dct_basis(s: int):
    """Calibrated forward DCT basis for size s (from ops/transforms) plus
    the tx->pixel SSE gain and the tx size's log_tx_scale."""
    from rav1e_tpu.ops.transforms import _fwd_matrices
    from rav1e_tpu.tx import TxSize, TxType, get_log_tx_scale

    name = f"TX_{s}X{s}"
    tx_size = TxSize[name]
    fv, fh = _fwd_matrices(tx_size, TxType.DCT_DCT)
    gain2 = float((fv[0] ** 2).sum()) * float((fh[0] ** 2).sum())
    return fv.astype(np.float32), fh.astype(np.float32), gain2, get_log_tx_scale(tx_size)


def tx_rd_estimate(residual, s: int, q):
    """Transform-domain rate + distortion estimate of (n, s, s) residuals.

    q: scalar ac quantizer (Q3 table units, tables.ac_q).  Returns
    (bits_est (n,), sse_px_est (n,)) float32 — the device analog of the
    reference's TxDistEstRate mode (rdo.rs:53) with estimate_rate-style
    per-level costs (rdo.rs:127).
    """
    jnp = _jnp()
    fv, fh, gain2, lts = _dct_basis(s)
    c = jnp.einsum(
        "ij,njk,lk->nil",
        jnp.asarray(fv), residual.astype(jnp.float32), jnp.asarray(fh),
        preferred_element_type=jnp.float32,
    )
    if s > 32:
        # only the low 32x32 region is codable (transforms.py _zero_high)
        mask = (jnp.arange(s) < 32).astype(jnp.float32)
        c = c * mask[None, :, None] * mask[None, None, :]
    qeff = q.astype(jnp.float32) / (1 << lts)
    ac = jnp.abs(c)
    level = jnp.floor(ac / qeff + 0.45)
    err = ac - level * qeff
    sse_px = (err * err).sum(axis=(1, 2)) / gain2
    # per-coefficient rate: ~golomb-ish growth, small floor for coded zeros
    bits = jnp.where(level > 0, 1.8 + 1.9 * jnp.log2(level + 1.0), 0.02)
    return bits.sum(axis=(1, 2)), sse_px


# ---------------------------------------------------------------------------
# per-size cost fields
# ---------------------------------------------------------------------------


def _block_edges(luma, s: int, base: int):
    """Split padded (H, W) luma into s-blocks with source edges.

    Returns blocks (n, s, s), above2 (n, 2s), left2 (n, 2s), tl (n,);
    row/col -1 use the spec base values, extensions clamp at the frame edge.
    """
    jnp = _jnp()
    hh, ww = luma.shape
    ny, nx = hh // s, ww // s
    blocks = luma.reshape(ny, s, nx, s).transpose(0, 2, 1, 3).reshape(-1, s, s)

    with_top = jnp.concatenate(
        [jnp.full((1, ww), base - 1, luma.dtype), luma], axis=0
    )
    ys = (jnp.arange(ny) * s)[:, None, None]  # row above block = index ys in with_top
    xs = (jnp.arange(nx) * s)[None, :, None] + jnp.arange(2 * s)[None, None, :]
    above2 = with_top[ys, jnp.minimum(xs, ww - 1)]  # (ny, nx, 2s)

    with_left = jnp.concatenate(
        [jnp.full((hh, 1), base + 1, luma.dtype), luma], axis=1
    )
    xs_l = (jnp.arange(nx) * s)[None, :, None]
    ys_l = (jnp.arange(ny) * s)[:, None, None] + jnp.arange(2 * s)[None, None, :]
    left2 = with_left[jnp.minimum(ys_l, hh - 1), xs_l]  # (ny, nx, 2s)

    corner = jnp.pad(
        luma[s - 1 :: s, s - 1 :: s], ((1, 0), (1, 0)), constant_values=base
    )[:ny, :nx]

    return (
        blocks,
        above2.reshape(-1, 2 * s),
        left2.reshape(-1, 2 * s),
        corner.reshape(-1),
        ny,
        nx,
    )


def intra_cost_field(luma, s: int, bd: int, q, lam):
    """Per-block intra cost at size s: (ny*nx,) cost, (ny*nx,) best mode."""
    jnp = _jnp()
    base = 128 << (bd - 8)
    blocks, above2, left2, tl, ny, nx = _block_edges(luma, s, base)
    preds = predict_all_modes(above2, left2, tl, s, bd)
    diffs = blocks[:, None].astype(jnp.int32) - preds
    satd = satd8(diffs)  # (n, 13)
    mode_rate = jnp.asarray(MODE_BITS)
    # SATD (≈ sqrt-domain) pick with a rate tiebreak scaled to SATD units
    score = satd + jnp.sqrt(lam) * mode_rate[None, :]
    best_mode = jnp.argmin(score, axis=1).astype(jnp.int32)
    best_diff = jnp.take_along_axis(
        diffs, best_mode[:, None, None, None], axis=1
    )[:, 0]
    bits, sse = tx_rd_estimate(best_diff, s, q)
    rate = bits + HDR_BITS + mode_rate[best_mode]
    cost = sse + lam * rate
    return cost, best_mode, rate


def inter_cost_field(residual, s: int, q, lam):
    """Per-block inter cost at size s from the frame MC residual."""
    jnp = _jnp()
    hh, ww = residual.shape
    ny, nx = hh // s, ww // s
    blocks = residual.reshape(ny, s, nx, s).transpose(0, 2, 1, 3).reshape(-1, s, s)
    bits, sse = tx_rd_estimate(blocks, s, q)
    rate = bits + HDR_BITS + INTER_BITS
    cost = sse + lam * rate
    return cost, rate


def mc_residual(luma, ref, mv8):
    """Whole-frame fullpel MC residual from a per-8x8-cell MV field.

    luma/ref: (H, W) int32 padded planes (same geometry); mv8: (H/8, W/8, 2)
    int32 full-pixel (dy, dx).  Out-of-frame reads clamp (padding replicates).
    """
    jnp = _jnp()
    hh, ww = luma.shape
    ii = jnp.arange(hh)[:, None]
    jj = jnp.arange(ww)[None, :]
    dy = jnp.repeat(jnp.repeat(mv8[..., 0], 8, axis=0), 8, axis=1)[:hh, :ww]
    dx = jnp.repeat(jnp.repeat(mv8[..., 1], 8, axis=0), 8, axis=1)[:hh, :ww]
    sy = jnp.clip(ii + dy, 0, hh - 1)
    sx = jnp.clip(jj + dx, 0, ww - 1)
    pred = ref[sy, sx]
    return luma.astype(jnp.int32) - pred


# ---------------------------------------------------------------------------
# bottom-up partition merge + frame entry
# ---------------------------------------------------------------------------


@dataclass
class DeviceMaps:
    """Host-side view of the device decisions (numpy)."""

    size_log2: np.ndarray  # (H/8, W/8) chosen square size log2 per 8px cell
    mode: np.ndarray  # (H/8, W/8) intra PredictionMode at the chosen size
    use_inter: np.ndarray  # (H/8, W/8) bool: inter beat intra at chosen size
    bits_est: float  # frame rate-estimate total (RC aggregation input)
    mv0: np.ndarray = None  # (H/16, W/16, 2) int32 1/8-pel MVs vs fwd ref
    mv1: np.ndarray = None  # same vs bwd ref (when the pyramid provides one)
    mv2: np.ndarray = None  # same vs the far backward anchor (BWDREF)


def _merge_partitions(costs, modes, inters, rates, lam):
    """Bottom-up quadtree merge over SIZE_LOG2S (rdo.rs:1949 semantics as
    tensor select).  All decision maps live on the 8px cell grid; per-level
    block grids shrink as the merge coarsens.

    Returns (size_log2, mode, use_inter, rate_per_cell) maps at 8px cells.
    """
    jnp = _jnp()

    def sum4(a):
        return a[0::2, 0::2] + a[0::2, 1::2] + a[1::2, 0::2] + a[1::2, 1::2]

    def up(a, k):
        f = 1 << k
        return jnp.repeat(jnp.repeat(a, f, axis=0), f, axis=1)

    base_sl = SIZE_LOG2S[0]
    best_cost = costs[base_sl]  # block grid at the current (finest) level
    size_map = jnp.full(best_cost.shape, base_sl, dtype=jnp.int32)
    mode_map = modes[base_sl]
    inter_map = inters[base_sl]
    rate_map = rates[base_sl] / float(1 << (2 * 0))  # per-cell rate share
    for sl in SIZE_LOG2S[1:]:
        k = sl - base_sl
        ncells = float(1 << (2 * k))  # 8px cells covered by one sl-block
        merged = sum4(best_cost) + lam * SPLIT_BITS
        keep_whole = costs[sl] <= merged
        best_cost = jnp.where(keep_whole, costs[sl], merged)
        kw_cells = up(keep_whole, k)
        size_map = jnp.where(kw_cells, sl, size_map)
        mode_map = jnp.where(kw_cells, up(modes[sl], k), mode_map)
        inter_map = jnp.where(kw_cells, up(inters[sl], k), inter_map)
        rate_map = jnp.where(kw_cells, up(rates[sl], k) / ncells, rate_map)
    return size_map, mode_map, inter_map, rate_map


def _frame_analysis(luma, ref0, ref1, ref2, q, lam, bd: int, has_inter: bool,
                    has_bwd: bool = False, has_bwd2: bool = False):
    """Whole-frame analysis: device ME (pyramid + subpel, device/me.py) vs
    each reference, then intra/inter cost fields and the partition merge.

    Returns (size_map, mode_map, inter_map, bits_est, mv0, mv1, mv2) — the
    MV maps are (H/16, W/16, 2) int32 in 1/8-pel units (zeros when
    unused)."""
    jnp = _jnp()
    from rav1e_tpu.device.me import me_field

    ny16, nx16 = luma.shape[0] // 16, luma.shape[1] // 16
    if has_inter:
        mv0 = me_field(luma, ref0, bd)
        # full-pel part on the 8px cell grid drives the residual cost model
        mvpx = mv0 >> 3
        mv8 = jnp.repeat(jnp.repeat(mvpx, 2, axis=0), 2, axis=1)
    else:
        mv0 = jnp.zeros((ny16, nx16, 2), jnp.int32)
        mv8 = None
    mv1 = (
        me_field(luma, ref1, bd)
        if (has_inter and has_bwd)
        else jnp.zeros((ny16, nx16, 2), jnp.int32)
    )
    mv2 = (
        me_field(luma, ref2, bd)
        if (has_inter and has_bwd2)
        else jnp.zeros((ny16, nx16, 2), jnp.int32)
    )

    costs, modes, inters, rates = {}, {}, {}, {}
    res = mc_residual(luma, ref0, mv8) if has_inter else None
    for sl in SIZE_LOG2S:
        s = 1 << sl
        ny, nx = luma.shape[0] // s, luma.shape[1] // s
        ic, im, ir = intra_cost_field(luma, s, bd, q, lam)
        ic = ic.reshape(ny, nx)
        im = im.reshape(ny, nx)
        ir = ir.reshape(ny, nx)
        if has_inter:
            xc, xr = inter_cost_field(res, s, q, lam)
            xc = xc.reshape(ny, nx)
            use_x = xc < ic
            costs[sl] = jnp.where(use_x, xc, ic)
            rates[sl] = jnp.where(use_x, xr.reshape(ny, nx), ir)
            inters[sl] = use_x
        else:
            costs[sl] = ic
            rates[sl] = ir
            inters[sl] = jnp.zeros((ny, nx), dtype=bool)
        modes[sl] = im

    size_map, mode_map, inter_map, rate_map = _merge_partitions(
        costs, modes, inters, rates, lam
    )
    bits_est = rate_map.sum()
    return size_map, mode_map, inter_map, bits_est, mv0, mv1, mv2, rate_map


@functools.lru_cache(None)
def frame_analysis_jit(bd: int, has_inter: bool, has_bwd: bool,
                       has_bwd2: bool = False):
    """Jitted analysis with everything packed into ONE int32 vector on
    device: per-8px-cell `size_log2 | mode<<3 | inter<<9`, then
    round(bits_est*16), then the MV maps as `(dy & 0xFFFF) | dx<<16`
    (1/8-pel int16 lanes).  A single device->host transfer per frame —
    per-fetch latency dominates on a tunneled TPU, so transfer count
    matters more than bytes."""
    import jax

    jnp = _jnp()

    def fn(luma, ref0, ref1, ref2, q, lam):
        (size_map, mode_map, inter_map, bits_est, mv0, mv1,
         mv2, _rate) = _frame_analysis(
            luma.astype(jnp.int32), ref0.astype(jnp.int32),
            ref1.astype(jnp.int32), ref2.astype(jnp.int32), q, lam, bd,
            has_inter, has_bwd, has_bwd2,
        )
        packed = (
            size_map | (mode_map << 3) | (inter_map.astype(jnp.int32) << 9)
        ).reshape(-1)
        bits = jnp.round(bits_est * 16.0).astype(jnp.int32)
        parts = [packed, bits[None]]
        if has_inter:
            pk0 = (mv0[..., 0] & 0xFFFF) | (mv0[..., 1] << 16)
            parts.append(pk0.reshape(-1))
            if has_bwd:
                pk1 = (mv1[..., 0] & 0xFFFF) | (mv1[..., 1] << 16)
                parts.append(pk1.reshape(-1))
            if has_bwd2:
                pk2 = (mv2[..., 0] & 0xFFFF) | (mv2[..., 1] << 16)
                parts.append(pk2.reshape(-1))
        return jnp.concatenate(parts)

    return jax.jit(fn)


def analyze_frame(
    luma_np: np.ndarray,
    ref0_np,
    ref1_np,
    qindex: int,
    lam: float,
    bd: int,
    ref2_np=None,
) -> DeviceMaps:
    """Synchronous host entry: dispatch + fetch in one call."""
    return analyze_finish(
        analyze_frame_async(luma_np, ref0_np, ref1_np, qindex, lam, bd,
                            ref2_np)
    )


@functools.lru_cache(None)
def _analysis_mesh():
    """The production device mesh: all visible chips on a 1-D ``tile``
    axis.  Unlike the reference's opt-in rayon pools (encoder.rs:3249),
    multi-chip is automatic: whenever more than one device exists the
    per-frame analysis inputs are row-sharded over the mesh and GSPMD
    partitions the SAME jitted program (collectives — halo all-gathers
    for the window ops, the rate-estimate reduction — are inserted by
    XLA), so the decisions and therefore the bitstream are bit-identical
    to the single-device run.  ``RAV1E_TPU_NO_SHARD=1`` opts out."""
    import os

    import jax

    if os.environ.get("RAV1E_TPU_NO_SHARD"):
        return None
    devs = jax.devices()
    if len(devs) <= 1:
        return None
    from jax.sharding import Mesh

    return Mesh(np.array(devs), ("tile",))


def _shard_inputs(mesh, planes):
    """device_put each (H, W) plane row-sharded over the mesh (falls back
    to replication when H doesn't split)."""
    import jax
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    n = mesh.devices.size
    spec = P("tile", None) if planes[0].shape[0] % n == 0 else P()
    sh = NamedSharding(mesh, spec)
    return [jax.device_put(p, sh) for p in planes]


def _is_device_array(x) -> bool:
    import jax

    return isinstance(x, jax.Array)


def upload_source_luma(luma_np: np.ndarray):
    """Pad a visible source-luma plane to 64-multiples and upload it once.

    Returned device array is directly usable as any plane input of
    :func:`analyze_frame_async`, so a frame that serves as its own analysis
    subject and later as a reference of up to 3 future frames crosses the
    host->device wire exactly once instead of up to 4 times (the per-frame
    re-upload the round-2 review measured).  Under the production mesh the
    upload is row-sharded exactly as _shard_inputs would."""
    import jax

    h, w = luma_np.shape
    h64 = (h + 63) & ~63
    w64 = (w + 63) & ~63
    arr = (
        np.pad(luma_np, ((0, h64 - h), (0, w64 - w)), mode="edge")
        if (h64 != h or w64 != w)
        else np.ascontiguousarray(luma_np)
    )
    mesh = _analysis_mesh()
    if mesh is not None:
        return _shard_inputs(mesh, [arr])[0]
    return jax.device_put(arr)


def analyze_frame_async(
    luma_np: np.ndarray,
    ref0_np,
    ref1_np,
    qindex: int,
    lam: float,
    bd: int,
    ref2_np=None,
):
    """Host entry: pad to 64-multiples, run the jitted analysis async.

    luma_np / ref0_np / ref1_np / ref2_np: (H, W) visible-luma numpy arrays
    (refs are the *source* planes of the forward / near-backward /
    far-backward references, the reference's own lookahead-ME
    approximation, internal.rs:731-760); device ME runs inside the
    program, so no MV field is uploaded.  Any of them may instead be an
    already-uploaded device plane from :func:`upload_source_luma` (padded
    64-multiple shape), which skips the host pad + upload entirely.

    On a multi-device backend the numpy inputs are row-sharded over the
    ``tile`` mesh (see _analysis_mesh) and the same program runs SPMD
    across all chips.
    """
    import jax.numpy as jnp

    if _is_device_array(luma_np):
        h64, w64 = luma_np.shape
    else:
        h, w = luma_np.shape
        h64 = (h + 63) & ~63
        w64 = (w + 63) & ~63
    mesh = _analysis_mesh()

    def prep(p):
        # upload in the plane's natural dtype (uint8/uint16) — the jitted
        # program widens on device.  Minimises host->device bytes.
        if _is_device_array(p):
            assert p.shape == (h64, w64)
            return p
        arr = np.pad(
            p, ((0, h64 - p.shape[0]), (0, w64 - p.shape[1])), mode="edge"
        )
        if mesh is not None:
            return _shard_inputs(mesh, [arr])[0]
        return arr

    luma = prep(luma_np)
    has_inter = ref0_np is not None
    has_bwd = has_inter and ref1_np is not None
    has_bwd2 = has_bwd and ref2_np is not None
    ref0 = prep(ref0_np) if has_inter else luma
    ref1 = prep(ref1_np) if has_bwd else ref0
    ref2 = prep(ref2_np) if has_bwd2 else ref0

    q = float(tables.ac_q(qindex, 0, bd))
    fn = frame_analysis_jit(bd, has_inter, has_bwd, has_bwd2)
    out = fn(
        jnp.asarray(luma), jnp.asarray(ref0), jnp.asarray(ref1),
        jnp.asarray(ref2), jnp.float32(q), jnp.float32(lam),
    )
    # jax dispatch is asynchronous: `out` is a future until fetched.
    return (out, h64 // 8, w64 // 8, has_inter, has_bwd, has_bwd2)


def _unpack_mv(flat, ny16, nx16):
    dy = (flat & 0xFFFF).astype(np.int16).astype(np.int32)
    dx = (flat >> 16).astype(np.int16).astype(np.int32)
    return np.stack([dy, dx], axis=-1).reshape(ny16, nx16, 2)


def analyze_finish(handle) -> DeviceMaps:
    """Block on an analyze_frame_async handle and unpack the maps."""
    out, ny, nx, has_inter, has_bwd, has_bwd2 = handle
    arr = np.asarray(out)
    ncells = ny * nx
    packed = arr[:ncells].reshape(ny, nx)
    ny16, nx16 = ny // 2, nx // 2
    nmv = ny16 * nx16
    mv0 = mv1 = mv2 = None
    if has_inter:
        mv0 = _unpack_mv(arr[ncells + 1 : ncells + 1 + nmv], ny16, nx16)
        if has_bwd:
            mv1 = _unpack_mv(
                arr[ncells + 1 + nmv : ncells + 1 + 2 * nmv], ny16, nx16
            )
        if has_bwd2:
            mv2 = _unpack_mv(
                arr[ncells + 1 + 2 * nmv : ncells + 1 + 3 * nmv], ny16, nx16
            )
    return DeviceMaps(
        size_log2=packed & 7,
        mode=(packed >> 3) & 0x1F,
        use_inter=((packed >> 9) & 1).astype(bool),
        bits_est=float(arr[ncells]) / 16.0,
        mv0=mv0,
        mv1=mv1,
        mv2=mv2,
    )
