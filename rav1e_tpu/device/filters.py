"""Device (TPU) in-loop filter stage: CDEF direction search, strength RDO
sweep and apply as one jitted XLA program over whole planes.

TPU-native counterpart of the reference's frame-level loop-filter pass
(encoder.rs:3263-3322 deblock/CDEF/LRF after tile coding, rdo.rs:2104
rdo_loop_decision CDEF axis).  The reference runs these per-superblock on
CPU threads; here every 8x8 cell is filtered for every candidate strength
in parallel (one-hot direction matmuls on the MXU, masked-select taps),
the per-SB argmin picks the strength map on device, and the chosen
reconstruction comes back in a single transfer.

All arithmetic is exact integer (i32/u32 on device; sums that can exceed
31 bits use canonical (hi, lo) 16-bit-split pair accumulators), asserted
bit-equal against the host `rav1e_tpu.ops.cdef` implementation by
tests/test_device_filters.py.
"""

from __future__ import annotations

import functools

import numpy as np

from rav1e_tpu.ops.cdef import (
    CDEF_DIRECTIONS,
    CDEF_SEC_STRENGTHS,
    CDEF_UV_DIR_422,
    CDEF_VERY_LARGE,
    _DIV_TABLE,
    _partial_matrices,
)


def _jnp():
    import jax.numpy as jnp

    return jnp


# ---------------------------------------------------------------------------
# exact wide-sum helpers (device ints are 32-bit; no x64)
# ---------------------------------------------------------------------------


def _pair_sum(terms, axis):
    """Sum of non-negative i32 terms (< 2^31) as a canonical (hi, lo) pair
    with value hi * 2^16 + lo, lo < 2^16.  Exact for up to ~2^15 terms."""
    jnp = _jnp()
    hi = jnp.sum(terms >> 16, axis=axis)
    lo = jnp.sum(terms & 0xFFFF, axis=axis)
    hi = hi + (lo >> 16)
    lo = lo & 0xFFFF
    return hi, lo


def _pair_lt(ah, al, bh, bl):
    return (ah < bh) | ((ah == bh) & (al < bl))


def _pair_sub_shift10(ah, al, bh, bl):
    """(a - b) >> 10 for canonical pairs with a >= b; result fits i32."""
    jnp = _jnp()
    borrow = (al < bl).astype(al.dtype)
    lo = al - bl + (borrow << 16)
    hi = ah - bh - borrow
    return (hi << 6) + (lo >> 10)


def _msb32(v):
    """floor(log2(v)) for v >= 1 (exact, integer shifts only)."""
    jnp = _jnp()
    r = jnp.zeros_like(v)
    for s in (16, 8, 4, 2, 1):
        m = v >= (1 << s)
        r = r + jnp.where(m, s, 0)
        v = jnp.where(m, v >> s, v)
    return r


# ---------------------------------------------------------------------------
# direction / variance estimation (ops/cdef.py cdef_find_dirs, exact)
# ---------------------------------------------------------------------------


def cdef_dirs_cells(cells, bd: int):
    """cells: (..., 8, 8) int luma. Returns (dir, var) i32 arrays (...,)."""
    jnp = _jnp()
    shift = bd - 8
    x = (cells.astype(jnp.int32) >> shift) - 128
    flat = x.reshape(x.shape[:-2] + (64,))
    mats = jnp.asarray(_partial_matrices().astype(np.int32))  # (8, 64, 15)
    partial = jnp.matmul(flat, mats.transpose(1, 0, 2).reshape(64, 8 * 15))
    partial = partial.reshape(x.shape[:-2] + (8, 15))
    div = [int(d) for d in _DIV_TABLE]

    hi_list, lo_list = [], []
    for d in range(8):
        p = partial[..., d, :]
        if d in (2, 6):
            terms = (p[..., :8] * p[..., :8]) * div[8]
        elif d in (0, 4):
            tl = [
                (p[..., i] * p[..., i] + p[..., 14 - i] * p[..., 14 - i])
                * div[i + 1]
                for i in range(7)
            ]
            tl.append(p[..., 7] * p[..., 7] * div[8])
            terms = jnp.stack(tl, axis=-1)
        else:
            base = p[..., 3:8] * p[..., 3:8]
            tl = [base[..., i] * div[8] for i in range(5)]
            for j in range(3):
                tl.append(
                    (p[..., j] * p[..., j] + p[..., 10 - j] * p[..., 10 - j])
                    * div[2 * j + 2]
                )
            terms = jnp.stack(tl, axis=-1)
        th, tlo = _pair_sum(terms, axis=-1)
        hi_list.append(th)
        lo_list.append(tlo)
    cost_hi = jnp.stack(hi_list, axis=-1)  # (..., 8)
    cost_lo = jnp.stack(lo_list, axis=-1)

    # argmax with ties -> first index (np.argmax semantics)
    best_dir = jnp.zeros(cost_hi.shape[:-1], dtype=jnp.int32)
    bh = cost_hi[..., 0]
    bl = cost_lo[..., 0]
    for d in range(1, 8):
        better = _pair_lt(bh, bl, cost_hi[..., d], cost_lo[..., d])
        best_dir = jnp.where(better, d, best_dir)
        bh = jnp.where(better, cost_hi[..., d], bh)
        bl = jnp.where(better, cost_lo[..., d], bl)
    ortho = (best_dir + 4) & 7
    oh = jnp.take_along_axis(cost_hi, ortho[..., None], axis=-1)[..., 0]
    ol = jnp.take_along_axis(cost_lo, ortho[..., None], axis=-1)[..., 0]
    var = _pair_sub_shift10(bh, bl, oh, ol)
    return best_dir, var


# ---------------------------------------------------------------------------
# filter core (ops/cdef.py cdef_filter_blocks, exact) over a cell grid
# ---------------------------------------------------------------------------


def _shifted(win, dy: int, dx: int, ys: int, xs: int):
    return win[..., 2 + dy : 2 + dy + ys, 2 + dx : 2 + dx + xs]


def cdef_tap_precompute(win, dirs):
    """Precompute the 12 displaced-neighbour tensors for a per-cell
    direction field: returns {"p": [12 tensors], "mn", "mx"} with tap order
    (k, which, sgn) matching cdef_filter_cells.  Hoisting this out of the
    candidate loop shares the expensive 8-way masked gathers across all
    strength candidates (the taps depend only on the direction field)."""
    jnp = _jnp()
    ys = win.shape[-2] - 4
    xs = win.shape[-1] - 4
    x = _shifted(win, 0, 0, ys, xs)
    mx = x
    mn = x
    ps = []
    dir_sets = [dirs, (dirs + 2) & 7, (dirs + 6) & 7]
    static_dir = isinstance(dirs, int)
    for k in range(2):
        for which, dset in enumerate(dir_sets):
            for sgn in (1, -1):
                if static_dir:
                    d = [dirs, (dirs + 2) & 7, (dirs + 6) & 7][which]
                    dy = int(CDEF_DIRECTIONS[d, k, 0]) * sgn
                    dx = int(CDEF_DIRECTIONS[d, k, 1]) * sgn
                    p = _shifted(win, dy, dx, ys, xs)
                else:
                    p = None
                    for d in range(8):
                        dy = int(CDEF_DIRECTIONS[d, k, 0]) * sgn
                        dx = int(CDEF_DIRECTIONS[d, k, 1]) * sgn
                        sl = _shifted(win, dy, dx, ys, xs)
                        m = (dset == d)[..., None, None]
                        p = (
                            jnp.where(m, sl, 0)
                            if p is None
                            else jnp.where(m, sl, p)
                        )
                ps.append(p)
                valid = p != CDEF_VERY_LARGE
                mx = jnp.where(valid, jnp.maximum(p, mx), mx)
                mn = jnp.minimum(p, mn)
    return {"x": x, "p": ps, "mn": mn, "mx": mx,
            "diff": [p - x for p in ps],
            "adiff": [jnp.abs(p - x) for p in ps]}


def cdef_filter_from_taps(taps, pri, sec, damping: int, bd: int):
    """Filter using precomputed taps (cdef_tap_precompute); pri (nby, nbx)
    i32, sec traced i32 scalar."""
    jnp = _jnp()
    x = taps["x"]
    pri_bit = (pri >> (bd - 8)) & 1
    pri_tap = [
        jnp.where(pri_bit == 0, 4, 3)[..., None, None],
        jnp.where(pri_bit == 0, 2, 3)[..., None, None],
    ]
    sec_taps = (2, 1)
    sec = jnp.asarray(sec, dtype=jnp.int32)
    pri_b = pri[..., None, None]
    pri_shift = jnp.maximum(0, damping - _msb32(jnp.maximum(pri, 1)))[
        ..., None, None
    ]
    sec_shift = jnp.maximum(0, damping - _msb32(jnp.maximum(sec, 1)))

    total = jnp.zeros_like(x)
    ti = 0
    for k in range(2):
        for which in range(3):
            for sgn in (1, -1):
                diff = taps["diff"][ti]
                adiff = taps["adiff"][ti]
                ti += 1
                if which == 0:
                    mag = jnp.clip(pri_b - (adiff >> pri_shift), 0, adiff)
                    con = jnp.where(diff < 0, -mag, mag)
                    con = jnp.where(pri_b == 0, 0, con)
                    total = total + pri_tap[k] * con
                else:
                    mag = jnp.clip(sec - (adiff >> sec_shift), 0, adiff)
                    con = jnp.where(diff < 0, -mag, mag)
                    con = jnp.where(sec == 0, 0, con)
                    total = total + sec_taps[k] * con

    v = x + ((8 + total - (total < 0).astype(total.dtype)) >> 4)
    return jnp.clip(v, taps["mn"], taps["mx"])


def cdef_filter_cells(win, dirs, pri, sec, damping: int, bd: int):
    """win: (nby, nbx, ys+4, xs+4) i32 with CDEF_VERY_LARGE rings.
    dirs/pri: (nby, nbx) i32; sec: traced i32 scalar (or python int).
    Returns filtered (nby, nbx, ys, xs) i32."""
    jnp = _jnp()
    ys = win.shape[-2] - 4
    xs = win.shape[-1] - 4
    x = _shifted(win, 0, 0, ys, xs)
    pri_bit = (pri >> (bd - 8)) & 1
    pri_tap = [
        jnp.where(pri_bit == 0, 4, 3)[..., None, None],
        jnp.where(pri_bit == 0, 2, 3)[..., None, None],
    ]
    sec_taps = (2, 1)
    sec = jnp.asarray(sec, dtype=jnp.int32)

    total = jnp.zeros_like(x)
    mx = x
    mn = x

    pri_b = pri[..., None, None]
    pri_shift = jnp.maximum(0, damping - _msb32(jnp.maximum(pri, 1)))[
        ..., None, None
    ]
    sec_shift = jnp.maximum(0, damping - _msb32(jnp.maximum(sec, 1)))

    dir_sets = [dirs, (dirs + 2) & 7, (dirs + 6) & 7]
    for k in range(2):
        for which, dset in enumerate(dir_sets):
            for sgn in (1, -1):
                # displaced window for the per-cell direction: masked select
                # over the 8 static displacements
                p = None
                for d in range(8):
                    dy = int(CDEF_DIRECTIONS[d, k, 0]) * sgn
                    dx = int(CDEF_DIRECTIONS[d, k, 1]) * sgn
                    sl = _shifted(win, dy, dx, ys, xs)
                    m = (dset == d)[..., None, None]
                    p = jnp.where(m, sl, 0) if p is None else jnp.where(m, sl, p)
                diff = p - x
                adiff = jnp.abs(diff)
                if which == 0:
                    mag = jnp.clip(pri_b - (adiff >> pri_shift), 0, adiff)
                    con = jnp.where(diff < 0, -mag, mag)
                    con = jnp.where(pri_b == 0, 0, con)
                    total = total + pri_tap[k] * con
                else:
                    mag = jnp.clip(sec - (adiff >> sec_shift), 0, adiff)
                    con = jnp.where(diff < 0, -mag, mag)
                    con = jnp.where(sec == 0, 0, con)
                    total = total + sec_taps[k] * con
                valid = p != CDEF_VERY_LARGE
                mx = jnp.where(valid, jnp.maximum(p, mx), mx)
                mn = jnp.minimum(p, mn)

    v = x + ((8 + total - (total < 0).astype(total.dtype)) >> 4)
    return jnp.clip(v, mn, mx)


# ---------------------------------------------------------------------------
# whole-frame CDEF stage
# ---------------------------------------------------------------------------


def _cell_windows(plane_g, nby, nbx, ys, xs):
    """plane_g: (nby*ys + 4, nbx*xs + 4) i32 (2px ring included).
    Returns (nby, nbx, ys+4, xs+4) overlapping cell windows.

    Built from strided slices (no gather: row index for (cell, offset) is
    cell*ys + offset, an arithmetic progression — TPU-friendly)."""
    jnp = _jnp()
    row_slices = [
        jnp.stack(
            [plane_g[r : r + nby * ys : ys] for r in range(ys + 4)], axis=1
        )
    ][0]  # (nby, ys+4, W+4)
    out = jnp.stack(
        [row_slices[:, :, c : c + nbx * xs : xs] for c in range(xs + 4)],
        axis=-1,
    )  # (nby, ys+4, nbx, xs+4)
    return out.transpose(0, 2, 1, 3)


def _ring_mask(win, have_t, have_l, have_r, have_b):
    jnp = _jnp()
    ring = CDEF_VERY_LARGE
    ys4 = win.shape[-2]
    xs4 = win.shape[-1]
    top = jnp.asarray((np.arange(ys4) < 2)[None, None, :, None])
    bot = jnp.asarray((np.arange(ys4) >= ys4 - 2)[None, None, :, None])
    left = jnp.asarray((np.arange(xs4) < 2)[None, None, None, :])
    right = jnp.asarray((np.arange(xs4) >= xs4 - 2)[None, None, None, :])
    win = jnp.where((~have_t)[..., None, None] & top, ring, win)
    win = jnp.where((~have_l)[..., None, None] & left, ring, win)
    win = jnp.where((~have_r)[..., None, None] & right, ring, win)
    win = jnp.where((~have_b)[..., None, None] & bot, ring, win)
    return win


def cdef_stage_core(planes, grid, damping: int, bd: int, ncand: int):
    """CDEF stage body for a fixed geometry (jit-composable).

    planes: per-plane (ys, xs, vis_h, vis_w) tuples, luma first (cell dims
    ys/xs are 8 >> ydec / 8 >> xdec).  grid: (nby, nbx, sb_rows, sb_cols,
    crop_w, crop_h).

    Returns core(rec_grids, src_grids, filt, y_str, uv_str) ->
    (outs list of filtered mi-extent planes, idx_map (sb_rows, sb_cols)):
    rec_grids[p] is (nby*ys + 4, nbx*xs + 4) i32 (the mi extent plus the
    2px ring read by the filter), src_grids[p] is (nby*ys, nbx*xs) i32,
    filt (nby, nbx) bool (non-skip cells), y_str/uv_str (ncand,) i32
    packed strengths.
    """
    jnp = _jnp()
    nby, nbx, sb_rows, sb_cols, crop_w, crop_h = grid

    by = np.arange(nby)
    bx = np.arange(nbx)
    coeff_shift = bd - 8

    have_top_np = np.broadcast_to((by > 0)[:, None], (nby, nbx))
    have_left_np = np.broadcast_to((bx > 0)[None, :], (nby, nbx))
    have_right_np = np.broadcast_to(
        (((bx + 2) * 8) <= crop_w)[None, :], (nby, nbx)
    )
    have_bottom_np = np.broadcast_to(
        (((by + 2) * 8) <= crop_h)[:, None], (nby, nbx)
    )

    def fn(rec_grids, src_grids, filt, y_str, uv_str):
        have_top = jnp.asarray(have_top_np)
        have_left = jnp.asarray(have_left_np)
        have_right = jnp.asarray(have_right_np)
        have_bottom = jnp.asarray(have_bottom_np)

        # uploads arrive in the plane's native dtype; widen on device
        rec_grids = tuple(g.astype(jnp.int32) for g in rec_grids)
        src_grids = tuple(g.astype(jnp.int32) for g in src_grids)

        # direction search on the luma cells (from the pre-CDEF rec)
        ys0, xs0, vh0, vw0 = planes[0]
        luma = rec_grids[0][2 : 2 + nby * ys0, 2 : 2 + nbx * xs0]
        cells = luma.reshape(nby, ys0, nbx, xs0).transpose(0, 2, 1, 3)
        dirs, variances = cdef_dirs_cells(cells, bd)

        sse_hi = jnp.zeros((ncand, nby, nbx), dtype=jnp.int32)
        sse_lo = jnp.zeros((ncand, nby, nbx), dtype=jnp.int32)
        cand_cells = []

        for pi, (ys, xs, vh, vw) in enumerate(planes):
            win = _cell_windows(rec_grids[pi], nby, nbx, ys, xs)
            win = _ring_mask(win, have_top, have_left, have_right, have_bottom)
            src = src_grids[pi].reshape(nby, ys, nbx, xs).transpose(0, 2, 1, 3)

            rows_in = jnp.asarray(
                (by[:, None] * ys + np.arange(ys)[None, :]) < vh
            )[:, None, :, None]
            cols_in = jnp.asarray(
                (bx[:, None] * xs + np.arange(xs)[None, :]) < vw
            )[None, :, None, :]
            inside = rows_in & cols_in

            damp = damping + coeff_shift - (0 if pi == 0 else 1)
            xd_ne_yd = ys != xs
            # taps depend only on the direction field: compute once for the
            # real-dirs variant and the dir-0 variant (used when pri == 0),
            # then every candidate is pure elementwise work
            if pi == 0:
                base_dir = dirs
            elif xd_ne_yd:
                base_dir = jnp.asarray(CDEF_UV_DIR_422.astype(np.int32))[dirs]
            else:
                base_dir = dirs
            taps_dir = cdef_tap_precompute(win, base_dir)
            taps_0 = cdef_tap_precompute(win, 0)
            plane_cands = []
            for ci in range(ncand):
                v = y_str[ci] if pi == 0 else uv_str[ci]
                pri_u = v // CDEF_SEC_STRENGTHS
                sec_u = v % CDEF_SEC_STRENGTHS
                sec_u = sec_u + (sec_u == 3).astype(jnp.int32)
                sec_s = sec_u << coeff_shift
                if pi == 0:
                    strength = pri_u << coeff_shift
                    idx = jnp.where(
                        (variances >> 6) != 0,
                        jnp.minimum(_msb32(jnp.maximum(variances >> 6, 1)), 12),
                        0,
                    )
                    p0 = jnp.where(
                        variances != 0, (strength * (4 + idx) + 8) >> 4, 0
                    )
                    p0 = jnp.where(pri_u == 0, 0, p0)
                else:
                    p0 = jnp.where(pri_u == 0, 0, pri_u << coeff_shift)
                    p0 = p0 * jnp.ones_like(dirs)
                f_dir = cdef_filter_from_taps(taps_dir, p0, sec_s, damp, bd)
                f_0 = cdef_filter_from_taps(taps_0, p0, sec_s, damp, bd)
                fcells = jnp.where(pri_u != 0, f_dir, f_0)
                plane_cands.append(fcells)
                d = jnp.where(inside, fcells - src, 0)
                cell_sse = jnp.sum(d * d, axis=(-1, -2))
                cell_sse = jnp.where(filt, cell_sse, 0)
                sse_hi = sse_hi.at[ci].add(cell_sse >> 16)
                sse_lo = sse_lo.at[ci].add(cell_sse & 0xFFFF)
            cand_cells.append(jnp.stack(plane_cands))

        # canonicalise, reduce per SB, argmin (ties -> lowest index)
        sse_hi = sse_hi + (sse_lo >> 16)
        sse_lo = sse_lo & 0xFFFF
        pad_y = sb_rows * 8 - nby
        pad_x = sb_cols * 8 - nbx
        ph_ = jnp.pad(sse_hi, ((0, 0), (0, pad_y), (0, pad_x)))
        pl_ = jnp.pad(sse_lo, ((0, 0), (0, pad_y), (0, pad_x)))
        sb_hi = ph_.reshape(ncand, sb_rows, 8, sb_cols, 8).sum(axis=(2, 4))
        sb_lo = pl_.reshape(ncand, sb_rows, 8, sb_cols, 8).sum(axis=(2, 4))
        sb_hi = sb_hi + (sb_lo >> 16)
        sb_lo = sb_lo & 0xFFFF

        idx = jnp.zeros((sb_rows, sb_cols), dtype=jnp.int32)
        bh = sb_hi[0]
        bl = sb_lo[0]
        for ci in range(1, ncand):
            better = _pair_lt(sb_hi[ci], sb_lo[ci], bh, bl)
            idx = jnp.where(better, ci, idx)
            bh = jnp.where(better, sb_hi[ci], bh)
            bl = jnp.where(better, sb_lo[ci], bl)

        cell_idx = idx[np.minimum(by // 8, sb_rows - 1)][
            :, np.minimum(bx // 8, sb_cols - 1)
        ]
        outs = []
        for pi, (ys, xs, vh, vw) in enumerate(planes):
            cands = cand_cells[pi]  # (ncand, nby, nbx, ys, xs)
            chosen = jnp.take_along_axis(
                cands, cell_idx[None, :, :, None, None], axis=0
            )[0]
            pre_cells = (
                rec_grids[pi][2 : 2 + nby * ys, 2 : 2 + nbx * xs]
                .reshape(nby, ys, nbx, xs)
                .transpose(0, 2, 1, 3)
            )
            final = jnp.where(filt[..., None, None], chosen, pre_cells)
            outs.append(final.transpose(0, 2, 1, 3).reshape(nby * ys, nbx * xs))
        return outs, idx

    return fn


@functools.lru_cache(None)
def cdef_stage_jit(planes, grid, damping: int, bd: int, ncand: int):
    """Jitted standalone CDEF stage (host pipeline entry): packs the
    filtered planes + idx_map into ONE flat transfer in the native pixel
    dtype (idx < 4 always fits; per-fetch latency dominates on a tunneled
    TPU, so transfer count matters more than bytes)."""
    import jax

    jnp = _jnp()
    core = cdef_stage_core(planes, grid, damping, bd, ncand)

    def fn(rec_grids, src_grids, filt, y_str, uv_str):
        outs, idx = core(rec_grids, src_grids, filt, y_str, uv_str)
        out_dt = jnp.uint8 if bd == 8 else jnp.uint16
        flat = jnp.concatenate(
            [o.astype(out_dt).reshape(-1) for o in outs]
            + [idx.astype(out_dt).reshape(-1)]
        )
        return flat

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# host wrapper: upload rec/src, run the stage, write decisions + planes back
# ---------------------------------------------------------------------------


def cdef_device_frame(rec_frame, src_frame, blocks, bd, cs, crop_w, crop_h,
                      damping, base_y, base_uv):
    """Device CDEF RDO + apply (drop-in for host cdef_rdo_frame +
    cdef_filter_frame at device-analysis speeds).

    Returns (y_strengths, uv_strengths, idx_map) and applies the chosen
    filtering to rec_frame in place.  Candidate lists match host
    cdef_rdo_frame exactly.
    """
    import jax.numpy as jnp

    from rav1e_tpu.config import ChromaSampling

    pri = base_y // CDEF_SEC_STRENGTHS
    sec = base_y % CDEF_SEC_STRENGTHS
    y_strengths = [0, base_y, max(pri // 2, 1) * CDEF_SEC_STRENGTHS + sec,
                   min(pri * 2 + 1, 15) * CDEF_SEC_STRENGTHS + sec]
    pri_uv = base_uv // CDEF_SEC_STRENGTHS
    sec_uv = base_uv % CDEF_SEC_STRENGTHS
    uv_strengths = [0, base_uv,
                    max(pri_uv // 2, 0) * CDEF_SEC_STRENGTHS + sec_uv,
                    min(pri_uv * 2 + 1, 15) * CDEF_SEC_STRENGTHS + sec_uv]

    sb_rows = (crop_h + 63) // 64
    sb_cols = (crop_w + 63) // 64
    mi_cols, mi_rows = blocks.cols, blocks.rows
    nbx = (mi_cols + 1) // 2
    nby = (mi_rows + 1) // 2

    sk = np.ones((nby * 2, nbx * 2), dtype=bool)
    sk[:mi_rows, :mi_cols] = blocks.skip
    filt_np = ~(sk.reshape(nby, 2, nbx, 2).all(axis=(1, 3)))
    if not filt_np.any():
        return (y_strengths, uv_strengths,
                np.zeros((sb_rows, sb_cols), np.int32), False)

    nplanes = 1 if cs == ChromaSampling.Cs400 else 3
    planes_geom = []
    rec_grids = []
    src_grids = []
    for p in range(nplanes):
        rp = rec_frame.planes[p]
        sp = src_frame.planes[p]
        xd, yd = (0, 0) if p == 0 else cs.decimation()
        ys, xs = 8 >> yd, 8 >> xd
        vh = (crop_h + (1 << yd) - 1) >> yd
        vw = (crop_w + (1 << xd) - 1) >> xd
        planes_geom.append((ys, xs, vh, vw))
        pad = rp.cfg.pad
        gh, gw = nby * ys, nbx * xs
        rg = rp.data[pad - 2 : pad + gh + 2, pad - 2 : pad + gw + 2]
        rec_grids.append(jnp.asarray(np.ascontiguousarray(rg)))
        sg = sp.data[pad : pad + gh, pad : pad + gw]
        src_grids.append(jnp.asarray(np.ascontiguousarray(sg)))

    fn = cdef_stage_jit(tuple(planes_geom),
                        (nby, nbx, sb_rows, sb_cols, crop_w, crop_h),
                        damping, bd, 4)
    out = fn(tuple(rec_grids), tuple(src_grids), jnp.asarray(filt_np),
             jnp.asarray(np.asarray(y_strengths, dtype=np.int32)),
             jnp.asarray(np.asarray(uv_strengths, dtype=np.int32)))
    flat = np.asarray(out)
    off = 0
    for p in range(nplanes):
        rp = rec_frame.planes[p]
        pad = rp.cfg.pad
        ys, xs, vh, vw = planes_geom[p]
        gh, gw = nby * ys, nbx * xs
        rp.data[pad : pad + gh, pad : pad + gw] = (
            flat[off : off + gh * gw].reshape(gh, gw).astype(rp.data.dtype)
        )
        off += gh * gw
    idx_map = flat[off : off + sb_rows * sb_cols].reshape(sb_rows, sb_cols)
    return y_strengths, uv_strengths, idx_map.astype(np.int32), True
