"""Device motion estimation: the whole-frame pyramid search as tensor math.

TPU-first redesign of the reference's serial per-block searches
(``estimate_tile_motion`` me.rs:153, ``full_pixel_me`` me.rs:693,
``sub_pixel_me`` me.rs:857): instead of data-dependent diamond walks, every
level evaluates a *fixed candidate grid* around its seed for every block at
once — SADs are batched elementwise reductions, subpel refinement is a
7x7 eighth-pel grid scored by SATD with exact 8-tap REGULAR interpolation
(mc.rs:110 Subpel_Filters), all static-shaped so XLA tiles it onto the MXU.

Levels (mirrors the reference's 3-pass hierarchy, me.rs:153-284):

  L2 quarter-res 16x16 blocks (64px full-res): step-2 grid R=3 then step-1
     R=1  -> reach +-28 full-res px
  L1 half-res   16x16 blocks (32px):           step-1 grid R=2
  L0 full-res   16x16 blocks:                  step-1 grid R=2
  subpel: 7x7 grid of {-6..6 step 2} eighth-pel offsets, SATD-scored

Output: per-16x16-cell MVs in 1/8-pel units, consumed by the host tile
coders as motion candidates (no host-side search remains on the device
path).  Ties break toward the shorter offset (deterministic).
"""

from __future__ import annotations

import functools

import numpy as np

from rav1e_tpu.ops.mc import SUBPEL_FILTERS

ME_BLOCK = 16


def _jnp():
    import jax.numpy as jnp

    return jnp


def _pool2(a):
    """2x2 mean pool with floor division (downsample one pyramid level)."""
    h2 = (a.shape[0] // 2) * 2
    w2 = (a.shape[1] // 2) * 2
    b = a[:h2, :w2]
    return (b[0::2, 0::2] + b[0::2, 1::2] + b[1::2, 0::2] + b[1::2, 1::2]) // 4


def _blockify(plane, blk):
    ny, nx = plane.shape[0] // blk, plane.shape[1] // blk
    return (
        plane[: ny * blk, : nx * blk]
        .reshape(ny, blk, nx, blk)
        .transpose(0, 2, 1, 3)
        .reshape(-1, blk, blk)
    ), ny, nx


def _gather_windows(ref_pad, ty, tx, W):
    """(n,) top-left coords -> (n, W, W) windows.

    On TPU this routes through the one-hot MXU gather (dsp.py): XLA's
    advanced-indexing gather serializes per row (~150 ns/row) while the
    matmul form runs at MXU speed."""
    from rav1e_tpu.device import dsp

    jnp = _jnp()
    if dsp._on_tpu():
        rows = dsp.gather_rows_onehot(ref_pad, ty.astype(jnp.int32), W)
        return dsp._cols_window(rows, tx.astype(jnp.int32), W,
                                dsp._is_narrow(ref_pad.dtype))
    wy = ty[:, None, None] + jnp.arange(W)[None, :, None]
    wx = tx[:, None, None] + jnp.arange(W)[None, None, :]
    return ref_pad[wy, wx]


def _grid_search(src_blocks, ref_pad, base_y, base_x, seeds, blk, R, step,
                 pad_off, clip_mv):
    """One full-pel candidate-grid round for every block at once.

    src_blocks: (n, blk, blk) int32; seeds: list of (n, 2) int32 px seeds
    (each clipped to +-clip_mv); evaluates the (2R+1)^2 grid at `step` px
    spacing around every seed and picks the global best per block.  Seeds
    beyond the first rescue blocks whose coarser-level decision went wrong
    (the reference's zero/neighbor predictor set, me.rs:386).  Returns the
    updated (n, 2) MVs.  SADs are scaled by 64 and offset by the L1 norm of
    the grid offset so ties deterministically prefer the earlier seed and
    the candidate nearest it.
    """
    jnp = _jnp()
    ncand = (2 * R + 1) ** 2
    sads = []
    origins = []
    for si, seed in enumerate(seeds):
        sy = jnp.clip(seed[:, 0], -clip_mv, clip_mv)
        sx = jnp.clip(seed[:, 1], -clip_mv, clip_mv)
        W = blk + 2 * R * step
        ty = base_y + sy - R * step + pad_off
        tx = base_x + sx - R * step + pad_off
        win = _gather_windows(ref_pad, ty, tx, W)
        origins.append((sy, sx))
        # tie-break: earlier seed first, then shorter offset
        tie = np.array(
            [abs(oy - R) + abs(ox - R)
             for oy in range(2 * R + 1) for ox in range(2 * R + 1)],
            dtype=np.int32,
        )
        from rav1e_tpu.device import pallas_kernels as _pk

        if _pk.pallas_ok():
            # VMEM-resident candidate grid: one HBM sweep over the windows
            # instead of ncand fused slice-reductions
            d = _pk.sad_grid(src_blocks, win, blk, R, step)
        else:
            cols = [
                jnp.abs(
                    win[:, oy * step : oy * step + blk,
                        ox * step : ox * step + blk]
                    - src_blocks
                ).sum(axis=(1, 2))
                for oy in range(2 * R + 1) for ox in range(2 * R + 1)
            ]
            d = jnp.stack(cols, axis=1)
        sads.append(d * 64 + jnp.asarray(tie)[None, :] + si)
    S = jnp.concatenate(sads, axis=1)  # (n, nseeds * ncand)
    k = jnp.argmin(S, axis=1).astype(jnp.int32)
    kk = k % ncand
    oy = kk // (2 * R + 1) - R
    ox = kk % (2 * R + 1) - R
    si = k // ncand
    sy = jnp.stack([o[0] for o in origins], axis=1)  # (n, nseeds)
    sx = jnp.stack([o[1] for o in origins], axis=1)
    by = jnp.take_along_axis(sy, si[:, None], axis=1)[:, 0]
    bx = jnp.take_along_axis(sx, si[:, None], axis=1)[:, 0]
    return jnp.stack([by + step * oy, bx + step * ox], axis=-1)


def _up2_mvs(mv, ny, nx):
    """Double a coarser MV grid (x2 px) and repeat onto the finer grid."""
    jnp = _jnp()
    g = mv.reshape(-1, 2)
    cy, cx = mv.shape[0], mv.shape[1]
    up = jnp.repeat(jnp.repeat(mv * 2, 2, axis=0), 2, axis=1)
    ys = jnp.minimum(jnp.arange(ny), 2 * cy - 1)
    xs = jnp.minimum(jnp.arange(nx), 2 * cx - 1)
    del g
    return up[ys[:, None], xs[None, :]]


# --- subpel: 7x7 eighth-pel grid with exact 8-tap REGULAR interpolation ----

# offsets in 1/8-pel: -6..6 step 2 (half + quarter pel positions)
_SUBPEL_OFFS = (-6, -4, -2, 0, 2, 4, 6)


@functools.lru_cache(None)
def _subpel_variants():
    """(int_shift, frac16) per 1/8-pel offset (mv_to_offsets semantics)."""
    out = []
    for o in _SUBPEL_OFFS:
        out.append((o >> 3, (o << 1) & 0xF))
    return out


def _hadamard16_satd(diff):
    """SATD of (n, k, 16, 16) diffs via 8x8 Hadamard cells (ops/dist
    get_satd normalization).  Routed through the Pallas MXU kernel on TPU
    (device/pallas_kernels.satd8)."""
    from rav1e_tpu.device import pallas_kernels as _pk

    if _pk.pallas_ok():
        return _pk.satd8(diff)
    jnp = _jnp()
    n, k = diff.shape[0], diff.shape[1]
    d = diff.astype(jnp.float32).reshape(n, k, 2, 8, 2, 8)
    d = jnp.moveaxis(d, -2, -3)  # (n, k, 2, 2, 8, 8)
    h = np.array([[1.0]], dtype=np.float32)
    while h.shape[0] < 8:
        h = np.block([[h, h], [h, -h]])
    h8 = jnp.asarray(h)
    t = jnp.einsum("ij,...jk,kl->...il", h8, d, h8)
    cells = jnp.abs(t).sum(axis=(-1, -2))
    cells = jnp.floor((cells + 4.0) / 8.0)
    return cells.sum(axis=(-1, -2))  # (n, k)


def _subpel_refine(src_blocks, ref_pad, base_y, base_x, mv_full, pad_off,
                   clip_mv, bd):
    """7x7 eighth-pel SATD refinement around per-block full-pel MVs.

    Interpolation matches ops/mc.put_8tap bit-exactly (REGULAR filters,
    intermediate >> (7-IB) with rounding, final >> (7+IB), clamp).
    Returns (n, 2) int32 MVs in 1/8-pel units.
    """
    jnp = _jnp()
    n, blk = src_blocks.shape[0], src_blocks.shape[1]
    IB = 4 - (2 if bd == 12 else 0)
    maxval = (1 << bd) - 1
    filt = SUBPEL_FILTERS[0]  # REGULAR, Q7

    my = jnp.clip(mv_full[:, 0], -clip_mv, clip_mv)
    mx = jnp.clip(mv_full[:, 1], -clip_mv, clip_mv)
    # window rows/cols -4 .. blk+4 (int shift -1..0, taps -3..+4)
    W = blk + 9
    ty = base_y + my - 4 + pad_off
    tx = base_x + mx - 4 + pad_off
    win = _gather_windows(ref_pad, ty, tx, W)  # (n, W, W) int32

    variants = _subpel_variants()
    # horizontal pass per column variant: (n, W, blk) int32
    hbufs = []
    for ci, cf in variants:
        if cf == 0:
            hb = win[:, :, 4 + ci : 4 + ci + blk] << IB
        else:
            f = filt[cf]
            x0 = 4 + ci - 3
            acc = None
            for k in range(8):
                t = int(f[k])
                if t == 0:
                    continue
                v = win[:, :, x0 + k : x0 + k + blk] * t
                acc = v if acc is None else acc + v
            hb = (acc + (1 << (6 - IB))) >> (7 - IB)
        hbufs.append(hb)

    preds = []
    for ri, rf in variants:
        for hb in hbufs:
            if rf == 0:
                p = (hb[:, 4 + ri : 4 + ri + blk, :] + (1 << IB >> 1)) >> IB
            else:
                f = filt[rf]
                y0 = 4 + ri - 3
                acc = None
                for k in range(8):
                    t = int(f[k])
                    if t == 0:
                        continue
                    v = hb[:, y0 + k : y0 + k + blk, :] * t
                    acc = v if acc is None else acc + v
                sh = 7 + IB
                p = (acc + (1 << sh >> 1)) >> sh
            preds.append(jnp.clip(p, 0, maxval))
    P = jnp.stack(preds, axis=1)  # (n, 49, blk, blk); index = oy*7 + ox
    diffs = src_blocks[:, None] - P
    satd = _hadamard16_satd(diffs)  # (n, 49) float32
    # deterministic tie-break toward the shorter offset
    pen = np.array(
        [abs(oy) + abs(ox) for oy in _SUBPEL_OFFS for ox in _SUBPEL_OFFS],
        dtype=np.float32,
    )
    k = jnp.argmin(satd * 64.0 + jnp.asarray(pen), axis=1).astype(jnp.int32)
    off = np.array(
        [[oy, ox] for oy in _SUBPEL_OFFS for ox in _SUBPEL_OFFS],
        dtype=np.int32,
    )
    sel = jnp.asarray(off)[k]  # (n, 2)
    return jnp.stack([my * 8, mx * 8], axis=-1) + sel


# pyramid geometry constants (full-res px reach: L2 +-28, +L1 +-4, +L0 +-2)
_L2_CLIP = 8     # qres px after L2 rounds
_L1_CLIP = 18    # hres px seed bound (2*8 + 2)
_L0_CLIP = 38    # full px bound (2*18 + 2)
_PAD_L2 = _L2_CLIP + 3 * 2 + 1 + 2   # seed + R*step + margin
_PAD_L1 = _L1_CLIP + 2 + 2
_PAD_L0 = _L0_CLIP + 2 + 4 + 2       # + subpel window margin (4)


def me_field(luma, ref, bd: int):
    """Whole-frame device ME: (H, W) int32 planes (64-multiple dims) ->
    (H/16, W/16, 2) int32 MVs in 1/8-pel units."""
    jnp = _jnp()
    H, W = luma.shape

    l1s, l1r = _pool2(luma), _pool2(ref)
    l2s, l2r = _pool2(l1s), _pool2(l1r)

    # L2: quarter res, blocks of 16 (64px full-res granularity)
    s2, ny2, nx2 = _blockify(l2s, ME_BLOCK)
    by2 = (jnp.arange(ny2) * ME_BLOCK)[:, None]
    bx2 = (jnp.arange(nx2) * ME_BLOCK)[None, :]
    base_y2 = jnp.broadcast_to(by2, (ny2, nx2)).reshape(-1)
    base_x2 = jnp.broadcast_to(bx2, (ny2, nx2)).reshape(-1)
    r2p = jnp.pad(l2r, _PAD_L2, mode="edge")
    mv = jnp.zeros((ny2 * nx2, 2), jnp.int32)
    mv = _grid_search(s2, r2p, base_y2, base_x2, [mv], ME_BLOCK, 3, 2,
                      _PAD_L2, _L2_CLIP)
    mv = _grid_search(s2, r2p, base_y2, base_x2, [mv], ME_BLOCK, 1, 1,
                      _PAD_L2, _L2_CLIP)
    mv2 = mv.reshape(ny2, nx2, 2)

    # L1: half res
    s1, ny1, nx1 = _blockify(l1s, ME_BLOCK)
    seed1 = _up2_mvs(mv2, ny1, nx1).reshape(-1, 2)
    base_y1 = jnp.broadcast_to(
        (jnp.arange(ny1) * ME_BLOCK)[:, None], (ny1, nx1)
    ).reshape(-1)
    base_x1 = jnp.broadcast_to(
        (jnp.arange(nx1) * ME_BLOCK)[None, :], (ny1, nx1)
    ).reshape(-1)
    r1p = jnp.pad(l1r, _PAD_L1, mode="edge")
    zero1 = jnp.zeros_like(seed1)
    mv1 = _grid_search(s1, r1p, base_y1, base_x1, [seed1, zero1], ME_BLOCK,
                       2, 1, _PAD_L1, _L1_CLIP).reshape(ny1, nx1, 2)

    # L0: full res
    s0, ny0, nx0 = _blockify(luma, ME_BLOCK)
    seed0 = _up2_mvs(mv1, ny0, nx0).reshape(-1, 2)
    base_y0 = jnp.broadcast_to(
        (jnp.arange(ny0) * ME_BLOCK)[:, None], (ny0, nx0)
    ).reshape(-1)
    base_x0 = jnp.broadcast_to(
        (jnp.arange(nx0) * ME_BLOCK)[None, :], (ny0, nx0)
    ).reshape(-1)
    r0p = jnp.pad(ref, _PAD_L0, mode="edge")
    zero0 = jnp.zeros_like(seed0)
    mv0 = _grid_search(s0, r0p, base_y0, base_x0, [seed0, zero0], ME_BLOCK,
                       2, 1, _PAD_L0, _L0_CLIP)

    mv8 = _subpel_refine(s0, r0p, base_y0, base_x0, mv0, _PAD_L0,
                         _L0_CLIP, bd)
    return mv8.reshape(ny0, nx0, 2)
