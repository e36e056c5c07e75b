"""Device-resident reconstruction chain: the whole inter-frame recon path
(candidate selection -> MC -> fwd tx -> quantize -> dequant/itx recon ->
deblock -> CDEF) as ONE asynchronous XLA dispatch per frame, with the
reconstruction KEPT on device as the next frames' reference.

This is SURVEY §3.2's device-boundary plan realised: "everything above
write_coeffs_lv_map batches on device; the cw/w symbol stream and CDF
updates stay host."  The host half is the native replay coder
(native/tile.cc coeff_log_mode=2 + reuse grids): a pixel-free serial walk
that turns the device's compact coefficient log + decision grids into the
AV1 symbol stream.

Why this shape (measured on the tunneled TPU this build targets):
  - device->host: ~30ms latency + ~30 MB/s  -> recon must NEVER download;
    everything the host needs returns in ONE flat int16 buffer
  - host->device: ~700 MB/s                 -> sources upload for free
  - dispatch enqueue: free (async queue)    -> the per-frame chain streams

TPU-first layout: every stage is a DENSE per-size grid over the whole
frame with static shapes — no per-block control flow, no dynamic shapes.
Cells not chosen by the partition plan still compute (masked out when
summing); the regularity is worth far more on the MXU/VPU than the waste.

Reference counterparts: encode_tile's DSP chain (encoder.rs:1404-1660),
motion_compensate (encoder.rs:1667), deblock/CDEF frame passes
(encoder.rs:3263-3322).  The selection policy is the device tier's
(candidate grids, not serial diamonds — me.rs redesign per SURVEY §7).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from rav1e_tpu.device import dsp
from rav1e_tpu.tx import TxSize, TxType
from rav1e_tpu import tables

# AV1 ref ids (context/mv.py); device ref index 0/1/2 = LAST/ALTREF/BWDREF
REF_LAST, REF_BWDREF, REF_ALTREF = 1, 5, 7

# device padding of ref/recon planes; MC support reach (mv 80px + 4 + 3)
# must stay inside it, so MVs are clamped to +-MV_CLIP eighth-pels
PADD = 88
MV_CLIP = (PADD - 8) << 3

# block px size -> luma TxSize (MAX_TXSIZE_RECT for square bsizes)
SQ_TX = {8: TxSize.TX_8X8, 16: TxSize.TX_16X16, 32: TxSize.TX_32X32,
         64: TxSize.TX_64X64}
SUB_TX = {TxSize.TX_64X64: TxSize.TX_32X32, TxSize.TX_32X32: TxSize.TX_16X16,
          TxSize.TX_16X16: TxSize.TX_8X8, TxSize.TX_8X8: TxSize.TX_4X4}
# block px -> chroma TxSize at 4:2:0 (largest_chroma_tx_size of the square)
SQ_CTX = {8: TxSize.TX_4X4, 16: TxSize.TX_8X8, 32: TxSize.TX_16X16,
          64: TxSize.TX_32X32}
# square block px -> BlockSize id (partition.py _BS_DIMS order)
SQ_BSIZE = {8: 3, 16: 6, 32: 9, 64: 12}


def _jnp():
    import jax.numpy as jnp

    return jnp


def tx_for_block(size_px: int, tx_split: bool) -> TxSize:
    t = SQ_TX[size_px]
    return SUB_TX[t] if tx_split else t


# ---------------------------------------------------------------------------
# plan builder (host, vectorized): replicate the native partition walk
# (tile_block.inc encode_partition + quantize_inter_blocks job order) and
# assign a walk ordinal to every tx block.  DFS pre-order of the quadtree
# within a superblock is exactly Morton order of the leaf origins, so the
# whole walk vectorizes as one argsort over (sb_raster, morton) keys.
# ---------------------------------------------------------------------------


@dataclass
class ChainPlan:
    mi_cols: int
    mi_rows: int
    tx_split: bool
    n_tx: int = 0
    n_blk: int = 0
    magics: np.ndarray = None       # (n_tx,) i32 native coeff-log magics
    # leaf blocks in walk order
    blk_x8: np.ndarray = None       # (n_blk,) top-left 8px-cell col
    blk_y8: np.ndarray = None
    blk_sl: np.ndarray = None       # (n_blk,) size log2 (3..6)
    # per-bucket walk-ordinal grids: (plane, TxSize) -> (gh, gw) i32, -1
    # inactive.  plane: 0 luma, 1 u, 2 v.  Grids span the SB-aligned extent.
    ords: Dict[tuple, np.ndarray] = field(default_factory=dict)
    eff8: np.ndarray = None         # (nby8, nbx8) chosen size log2 per 8px cell


def effective_size8(size_log2: np.ndarray, mi_cols: int, mi_rows: int,
                    pr_min: int, pr_max: int) -> np.ndarray:
    """The native walk's leaf size per 8px cell (tile_block.inc
    encode_partition, top-down): at each level wl the block splits iff it
    crosses the mi edge (must_split), wl > pr_max, or the clamped device
    size map at its ORIGIN cell asks for something smaller."""
    nby_a = ((mi_rows + 15) // 16) * 8
    nbx_a = ((mi_cols + 15) // 16) * 8
    sz = np.clip(size_log2[:nby_a, :nbx_a], pr_min, pr_max)

    y8, x8 = np.mgrid[0:nby_a, 0:nbx_a]
    eff = np.full((nby_a, nbx_a), 3, dtype=np.int32)
    still = np.ones((nby_a, nbx_a), dtype=bool)  # all ancestors split
    for sl in (6, 5, 4):
        c = 1 << (sl - 3)          # 8px cells per side
        oy, ox = y8 & ~(c - 1), x8 & ~(c - 1)
        hbs = c >> 1               # half extent in 8px cells
        fits = ((ox + hbs) * 2 < mi_cols) & ((oy + hbs) * 2 < mi_rows)
        not_split = (
            fits & (sl <= pr_max) & ((sl <= pr_min) | (sl <= sz[oy, ox]))
        )
        eff = np.where(still & not_split, sl, eff)
        still &= ~not_split
    return eff


def build_plan(size_log2: np.ndarray, mi_cols: int, mi_rows: int,
               pr_min: int, pr_max: int, tx_split: bool) -> ChainPlan:
    """Vectorized walk-order plan for an inter frame (all blocks inter,
    4:2:0).  mi dims are always even (spec 5.9.8 compute_image_size)."""
    assert mi_cols % 2 == 0 and mi_rows % 2 == 0
    plan = ChainPlan(mi_cols, mi_rows, tx_split)
    sb_cols = (mi_cols + 15) // 16
    sb_rows = (mi_rows + 15) // 16
    nby_a, nbx_a = sb_rows * 8, sb_cols * 8

    eff = effective_size8(size_log2, mi_cols, mi_rows, pr_min, pr_max)
    plan.eff8 = eff

    y8, x8 = np.mgrid[0:nby_a, 0:nbx_a]
    c = 1 << (eff - 3)
    # leaf origins with in-mi origin (8px cells beyond the mi grid are not
    # visited: encode_partition returns when x >= mi_w)
    is_origin = ((y8 & (c - 1)) == 0) & ((x8 & (c - 1)) == 0) \
        & (x8 * 2 < mi_cols) & (y8 * 2 < mi_rows)
    oy = y8[is_origin]
    ox = x8[is_origin]
    osl = eff[is_origin]

    # walk order: SB raster, then Morton of the local (y, x) 3-bit coords
    ly, lx = oy & 7, ox & 7
    morton = np.zeros_like(ly)
    for b in range(3):
        morton |= (((ly >> b) & 1) << (2 * b + 1)) | (((lx >> b) & 1) << (2 * b))
    key = ((oy >> 3) * sb_cols + (ox >> 3)) * 64 + morton
    order = np.argsort(key, kind="stable")
    oy, ox, osl = oy[order], ox[order], osl[order]
    n_blk = oy.shape[0]
    plan.n_blk = n_blk
    plan.blk_y8, plan.blk_x8, plan.blk_sl = oy, ox, osl

    # tx blocks per leaf: luma cells (1 or 4 with split, minus mi-clipped
    # ones), then one u and one v cell
    s_px = 1 << osl
    if tx_split:
        # sub-tx cells at pixel offsets (dy, dx) * s/2; clipped when the
        # cell's mi origin crosses the mi grid
        half_px = s_px >> 1
        nl = np.zeros(n_blk, dtype=np.int64)
        for dy in range(2):
            for dx in range(2):
                py = (oy << 3) + dy * half_px
                px = (ox << 3) + dx * half_px
                nl += ((px >> 2 < mi_cols) & (py >> 2 < mi_rows)).astype(
                    np.int64)
    else:
        nl = np.ones(n_blk, dtype=np.int64)
    ntx = nl + 2
    tx0 = np.zeros(n_blk + 1, dtype=np.int64)
    np.cumsum(ntx, out=tx0[1:])
    plan.n_tx = int(tx0[-1])

    magics = np.zeros(plan.n_tx, dtype=np.int32)

    # per-bucket ordinal grids
    def grid(plane: int, t: TxSize) -> np.ndarray:
        keyg = (plane, int(t))
        if keyg not in plan.ords:
            ext_h = sb_rows * (32 if plane else 64)
            ext_w = sb_cols * (32 if plane else 64)
            plan.ords[keyg] = np.full(
                (ext_h // t.height, ext_w // t.width), -1, dtype=np.int32)
        return plan.ords[keyg]

    for sl in (3, 4, 5, 6):
        sel = osl == sl
        if not sel.any():
            continue
        by, bx, b0 = oy[sel], ox[sel], tx0[:-1][sel]
        t = tx_for_block(1 << sl, tx_split)
        g = grid(0, t)
        if tx_split:
            # raster order of the 2x2 sub cells, skipping mi-clipped ones
            half_px = (1 << sl) >> 1
            k = np.zeros_like(b0)
            for dy in range(2):
                for dx in range(2):
                    py = (by << 3) + dy * half_px
                    px = (bx << 3) + dx * half_px
                    ok = (px >> 2 < mi_cols) & (py >> 2 < mi_rows)
                    idx = b0 + k
                    g[py[ok] // t.height, px[ok] // t.width] = idx[ok]
                    magics[idx[ok]] = 0x5A170000 | int(t)
                    k = k + ok.astype(np.int64)
            nl_sel = k
        else:
            g[(by << 3) // t.height, (bx << 3) // t.width] = b0
            magics[b0] = 0x5A170000 | int(t)
            nl_sel = np.ones_like(b0)
        ct = SQ_CTX[1 << sl]
        for p in (1, 2):
            gp = grid(p, ct)
            idx = b0 + nl_sel + (p - 1)
            gp[(by << 2) // ct.height, (bx << 2) // ct.width] = idx
            magics[idx] = 0x5A170000 | (p << 8) | int(ct)
    plan.magics = magics
    return plan


def build_coeff_log(plan: ChainPlan, eobs: np.ndarray,
                    levels: np.ndarray) -> Tuple[np.ndarray, int]:
    """Assemble the native coeff log (magic, eob, levels...) from the
    device outputs.  eobs: (n_tx,) walk-ordered; levels: flat scan-prefix
    values packed by the same walk-order eob cumsum."""
    eobs = eobs.astype(np.int64)
    counts = 2 + eobs
    offs = np.zeros(plan.n_tx + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    total = int(offs[-1])
    log = np.zeros(total, dtype=np.int32)
    log[offs[:-1]] = plan.magics
    log[offs[:-1] + 1] = eobs.astype(np.int32)
    lvl_offs = np.zeros(plan.n_tx + 1, dtype=np.int64)
    np.cumsum(eobs, out=lvl_offs[1:])
    n_lvl = int(lvl_offs[-1])
    if n_lvl:
        dst = np.repeat(offs[:-1] + 2, eobs) + (
            np.arange(n_lvl) - np.repeat(lvl_offs[:-1], eobs)
        )
        log[dst] = levels[:n_lvl].astype(np.int32)
    return log.view(np.uint8), total * 4


# ---------------------------------------------------------------------------
# deblock edge decisions on device (jnp port of ops/deblock.
# _plane_edge_decisions over the chain's mi-granularity grids)
# ---------------------------------------------------------------------------

def _deblock_luts():
    from rav1e_tpu.partition import BlockSize
    lut_txw = np.array([TxSize(t).width >> 2 for t in range(19)],
                       dtype=np.int32)
    lut_txh = np.array([TxSize(t).height >> 2 for t in range(19)],
                       dtype=np.int32)
    lut_n4w = np.array(
        [BlockSize(b).width_mi for b in range(22)], dtype=np.int32)
    lut_n4h = np.array(
        [BlockSize(b).height_mi for b in range(22)], dtype=np.int32)
    return lut_txw, lut_txh, lut_n4w, lut_n4h


@functools.lru_cache(None)
def _chroma_tx_luts(xdec: int, ydec: int):
    from rav1e_tpu.encoder.pipeline import largest_chroma_tx_size
    from rav1e_tpu.partition import BlockSize
    lut_w = np.zeros(22, dtype=np.int32)
    lut_h = np.zeros(22, dtype=np.int32)
    for b in BlockSize:
        if b.width > 64 or b.height > 64:
            continue
        t = largest_chroma_tx_size(b, xdec, ydec)
        lut_w[int(b)] = t.width >> 2
        lut_h[int(b)] = t.height >> 2
    return lut_w, lut_h


def _edge_sizes_device(bsize_mi, tx_mi, skip_mi, pli: int, xdec: int,
                       ydec: int, rows_p: int, cols_p: int, vertical: bool,
                       mi_rows: int, mi_cols: int):
    """filter_size per plane-4x4 position (0 = none) — the chain's device
    version of ops/deblock._plane_edge_decisions (all blocks inter)."""
    jnp = _jnp()
    lut_txw, lut_txh, lut_n4w, lut_n4h = _deblock_luts()

    jj, ii = np.mgrid[0:rows_p, 0:cols_p]
    ly = np.minimum((jj << ydec) | ydec, mi_rows - 1)
    lx = np.minimum((ii << xdec) | xdec, mi_cols - 1)
    ly_j = jnp.asarray(ly)
    lx_j = jnp.asarray(lx)

    bsize_g = bsize_mi[ly_j, lx_j]
    if pli == 0:
        tx_g = tx_mi[ly_j, lx_j]
        txw_mi = jnp.asarray(lut_txw)[tx_g]
        txh_mi = jnp.asarray(lut_txh)[tx_g]
    else:
        lut_w, lut_h = _chroma_tx_luts(xdec, ydec)
        txw_mi = jnp.asarray(lut_w)[bsize_g]
        txh_mi = jnp.asarray(lut_h)[bsize_g]

    if vertical:
        prev_ly, prev_lx = ly, lx - (1 << xdec)
    else:
        prev_ly, prev_lx = ly - (1 << ydec), lx
    valid = (prev_lx >= 0) & (prev_ly >= 0)
    ply = jnp.asarray(np.maximum(prev_ly, 0))
    plx = jnp.asarray(np.maximum(prev_lx, 0))

    prev_bsize = bsize_mi[ply, plx]
    if pli == 0:
        prev_tx = tx_mi[ply, plx]
        ptxw = jnp.asarray(lut_txw)[prev_tx]
        ptxh = jnp.asarray(lut_txh)[prev_tx]
    else:
        ptxw = jnp.asarray(lut_w)[prev_bsize]
        ptxh = jnp.asarray(lut_h)[prev_bsize]

    if vertical:
        tx_edge = (jnp.asarray(ii) & (txw_mi - 1)) == 0
        tx_n, ptx_n = txw_mi, ptxw
    else:
        tx_edge = (jnp.asarray(jj) & (txh_mi - 1)) == 0
        tx_n, ptx_n = txh_mi, ptxh

    n4_w = jnp.asarray(lut_n4w)[bsize_g]
    n4_h = jnp.asarray(lut_n4h)[bsize_g]
    if vertical:
        block_edge = (jnp.asarray(ii << xdec) & (n4_w - 1)) == 0
    else:
        block_edge = (jnp.asarray(jj << ydec) & (n4_h - 1)) == 0

    skip_g = skip_mi[ly_j, lx_j]
    pskip = skip_mi[ply, plx]
    # all-inter frame: the intra terms of the apply mask are False
    apply = block_edge | ~skip_g | ~pskip
    cap = 14 if pli == 0 else 6
    MI_SIZE_LOG2 = 2
    size = jnp.minimum(cap, jnp.minimum(tx_n, ptx_n) << MI_SIZE_LOG2)
    return jnp.where(jnp.asarray(valid) & tx_edge & apply, size, 0)


# ---------------------------------------------------------------------------
# the chain program (one jitted XLA dispatch per inter frame)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ChainGeom:
    """Static geometry + config of a chain program (jit cache key)."""

    vis_w: int
    vis_h: int
    mi_cols: int
    mi_rows: int
    bd: int
    tx_split: bool
    has_bwd: bool
    has_bwd2: bool
    # buckets in a fixed order: ((plane, tx_id, gh_cells, gw_cells), ...)
    buckets: tuple = ()
    # luma block sizes present: (8, 16, 32, 64) subset
    sizes: tuple = ()

    @property
    def gw(self):
        return ((self.mi_cols + 15) // 16) * 64

    @property
    def gh(self):
        return ((self.mi_rows + 15) // 16) * 64

    @property
    def ntx_cap(self):
        n8 = (self.gh // 8) * (self.gw // 8)
        return (6 if self.tx_split else 3) * n8

    @property
    def lcap(self):
        # levels budget: ~1/3 of the pixel count.  1/8 overflowed on ~40%
        # of bench frames at q=120 (noisy content), and every overflow
        # costs the full chain round-trip PLUS a host-tier re-encode; the
        # larger download (~150 KiB at this bench geometry) is cheaper and
        # overlaps the next frame's device compute once chains pipeline.
        return ((self.gh * self.gw * 3 // 2) // 3 + 1023) & ~1023


def geom_for(vis_w, vis_h, mi_cols, mi_rows, bd, tx_split, has_bwd,
             has_bwd2, pr_min, pr_max) -> ChainGeom:
    """Derive the static bucket/size lists from the partition range."""
    sb_cols = (mi_cols + 15) // 16
    sb_rows = (mi_rows + 15) // 16
    # ragged mi edges force 8px blocks regardless of pr_min
    ragged = (mi_cols % 16 != 0) or (mi_rows % 16 != 0)
    sizes = [s for s in (8, 16, 32, 64)
             if (pr_min <= (s.bit_length() - 1) <= pr_max)
             or (s == 8 and ragged)]
    # must_split chains force every size between 8 and the smallest wanted
    smin = min(sizes)
    if ragged:
        sizes = sorted(set(sizes) | {s for s in (8, 16, 32) if s < smin})
    buckets = []
    for s in sorted(sizes):
        t = tx_for_block(s, tx_split)
        key = (0, int(t))
        gh_t = sb_rows * 64 // t.height
        gw_t = sb_cols * 64 // t.width
        if (0, int(t), gh_t, gw_t) not in buckets:
            buckets.append((0, int(t), gh_t, gw_t))
    for s in sorted(sizes):
        ct = SQ_CTX[s]
        for p in (1, 2):
            b = (p, int(ct), sb_rows * 32 // ct.height, sb_cols * 32 // ct.width)
            if b not in buckets:
                buckets.append(b)
    return ChainGeom(vis_w, vis_h, mi_cols, mi_rows, bd, tx_split, has_bwd,
                     has_bwd2, tuple(buckets), tuple(sorted(sizes)))


def _pad_edge(plane, vis_h: int, vis_w: int, pad: int):
    """Edge-replicate `plane` (gh, gw) out to (gh+2p, gw+2p), replicating
    from the VISIBLE crop edge (host Plane.pad semantics)."""
    jnp = _jnp()
    gh, gw = plane.shape
    ry = jnp.clip(jnp.arange(gh + 2 * pad) - pad, 0, vis_h - 1)
    rx = jnp.clip(jnp.arange(gw + 2 * pad) - pad, 0, vis_w - 1)
    return plane[ry[:, None], rx[None, :]]


def _cells(plane, size_h: int, size_w: int):
    """(gh, gw) -> (N, size_h, size_w) raster cells."""
    gh, gw = plane.shape
    ny, nx = gh // size_h, gw // size_w
    return (plane.reshape(ny, size_h, nx, size_w)
            .transpose(0, 2, 1, 3).reshape(ny * nx, size_h, size_w))


def _uncells(cells, gh: int, gw: int, size_h: int, size_w: int):
    ny, nx = gh // size_h, gw // size_w
    return (cells.reshape(ny, nx, size_h, size_w)
            .transpose(0, 2, 1, 3).reshape(gh, gw))


def _field_at(field, s: int, ny: int, nx: int):
    """MV field (ny16, nx16, 2) -> per size-s cell (top-left 16px cell),
    flattened (N, 2)."""
    jnp = _jnp()
    ny16, nx16 = field.shape[0], field.shape[1]
    iy = jnp.minimum((jnp.arange(ny) * s) // 16, ny16 - 1)
    ix = jnp.minimum((jnp.arange(nx) * s) // 16, nx16 - 1)
    return field[iy[:, None], ix[None, :]].reshape(ny * nx, 2)


def _mc_single(ref_pad, pos_y, pos_x, mv, h, w, bd, xdec, ydec):
    jnp = _jnp()
    mv_r, mv_c = mv[:, 0], mv[:, 1]
    iy0 = PADD + pos_y + (mv_r >> (3 + ydec)) - 3
    ix0 = PADD + pos_x + (mv_c >> (3 + xdec)) - 3
    win = dsp.mc_gather_windows(ref_pad, iy0, ix0, h, w)
    return dsp.mc_put_from_windows(win, mv_r, mv_c, h, w, bd, xdec, ydec)


def _mc_prep(ref_pad, pos_y, pos_x, mv, h, w, bd, xdec, ydec):
    mv_r, mv_c = mv[:, 0], mv[:, 1]
    iy0 = PADD + pos_y + (mv_r >> (3 + ydec)) - 3
    ix0 = PADD + pos_x + (mv_c >> (3 + xdec)) - 3
    win = dsp.mc_gather_windows(ref_pad, iy0, ix0, h, w)
    return dsp.mc_prep_from_windows(win, mv_r, mv_c, h, w, bd, xdec, ydec)


# candidate order: 0 LAST@field0, 1 ALTREF@field1, 2 BWDREF@field2,
# 3 LAST@zero, 4 compound LAST@field0 + ALTREF@field1
N_CAND = 5
CAND_REF = (0, 1, 2, 0, 0)


def _active_by_size(geom: ChainGeom, ords):
    """Per-size (ny, nx) active-cell masks from the luma bucket ordinals."""
    g = geom
    gh, gw = g.gh, g.gw
    out = {}
    for s in g.sizes:
        t = tx_for_block(s, g.tx_split)
        bi = g.buckets.index((0, int(t), gh // t.height, gw // t.width))
        k2 = 2 if g.tx_split else 1
        out[s] = ords[bi][::k2, ::k2] >= 0
    return out


@functools.lru_cache(None)
def _aux_layout(geom: ChainGeom):
    """Static (offset, length) of each small per-frame input inside the
    single packed i32 ``aux`` upload.  Per-transfer tunnel latency dwarfs
    these arrays' sizes, so ~15 tiny device_puts per frame become one."""
    g = geom
    ny16, nx16 = g.gh // 16, g.gw // 16
    nby8, nbx8 = g.gh // 8, g.gw // 8
    offs = {}
    off = 0

    def add(name, n):
        nonlocal off
        offs[name] = (off, n)
        off += n

    add("fields", 3 * ny16 * nx16 * 2)
    for i, (_p, _t, ghc, gwc) in enumerate(g.buckets):
        add(("ord", i), ghc * gwc)
    add("dcq8", 3 * nby8 * nbx8)
    add("acq8", 3 * nby8 * nbx8)
    add("dbl", 4)
    add("cdefy", 4)
    add("cdefuv", 4)
    return offs, off


def pack_aux(geom: ChainGeom, plan: "ChainPlan", fields, dcq8, acq8,
             dbl_levels, cdef_y, cdef_uv) -> np.ndarray:
    """Pack the per-frame small chain inputs into one i32 vector."""
    g = geom
    offs, total = _aux_layout(g)
    out = np.empty(total, np.int32)

    def put(name, arr):
        o, n = offs[name]
        out[o : o + n] = np.asarray(arr, dtype=np.int32).reshape(-1)

    put("fields", fields)
    for i, (p, t, ghc, gwc) in enumerate(g.buckets):
        og = plan.ords.get((p, t))
        if og is None:
            og = np.full((ghc, gwc), -1, dtype=np.int32)
        put(("ord", i), og)
    put("dcq8", dcq8)
    put("acq8", acq8)
    put("dbl", dbl_levels)
    put("cdefy", cdef_y)
    put("cdefuv", cdef_uv)
    return out


def _aux_get(geom: ChainGeom, aux, name, shape):
    o, n = _aux_layout(geom)[0][name]
    return aux[o : o + n].reshape(shape)


def _aux_fields(geom: ChainGeom, aux):
    ny16, nx16 = geom.gh // 16, geom.gw // 16
    return _aux_get(geom, aux, "fields", (3, ny16, nx16, 2))


def _aux_ords(geom: ChainGeom, aux):
    return tuple(
        _aux_get(geom, aux, ("ord", i), (ghc, gwc))
        for i, (_p, _t, ghc, gwc) in enumerate(geom.buckets)
    )


def _sel_luma_program(geom: ChainGeom):
    """Stage 1: candidate selection + luma MC.  Returns the composed luma
    prediction plane and the per-size selection grids."""
    jnp = _jnp()
    g = geom
    gh, gw = g.gh, g.gw
    bd = g.bd
    big = jnp.int32(2 ** 30)

    def fn(src_y_raw, refs_y, aux):
        fields = _aux_fields(g, aux)
        ords = _aux_ords(g, aux)
        src_y = src_y_raw.astype(jnp.int32)
        # native-dtype stack: the window gathers widen to i32 themselves,
        # and 8-bit planes skip the high-byte one-hot matmul (dsp.py)
        ref_y = jnp.stack(refs_y)
        active_by_size = _active_by_size(g, ords)
        sel_grids = []
        pred_y = jnp.zeros((gh, gw), jnp.int32)
        for s in g.sizes:
            ny, nx = gh // s, gw // s
            n = ny * nx
            pos_y = jnp.repeat(jnp.arange(ny, dtype=jnp.int32) * s, nx)
            pos_x = jnp.tile(jnp.arange(nx, dtype=jnp.int32) * s, ny)
            f = [_field_at(fields[k], s, ny, nx) for k in range(3)]
            zero = jnp.zeros((n, 2), jnp.int32)
            cand_mv = [f[0], f[1], f[2], zero, f[0]]

            src_cells = _cells(src_y, s, s)
            preds = []
            sads = []
            for k in range(N_CAND):
                if k == 1 and not g.has_bwd:
                    preds.append(preds[0])
                    sads.append(big * jnp.ones((n,), jnp.int32))
                    continue
                if k == 2 and not g.has_bwd2:
                    preds.append(preds[0])
                    sads.append(big * jnp.ones((n,), jnp.int32))
                    continue
                if k == 4:
                    if not g.has_bwd:
                        preds.append(preds[0])
                        sads.append(big * jnp.ones((n,), jnp.int32))
                        continue
                    t0 = _mc_prep(ref_y[0], pos_y, pos_x, f[0], s, s, bd, 0, 0)
                    t1 = _mc_prep(ref_y[1], pos_y, pos_x, f[1], s, s, bd, 0, 0)
                    p = dsp.mc_avg(t0, t1, bd)
                    bias = s  # pair penalty ((w+h)/2, native select_inter)
                else:
                    p = _mc_single(ref_y[CAND_REF[k]], pos_y, pos_x,
                                   cand_mv[k], s, s, bd, 0, 0)
                    bias = 0
                preds.append(p)
                sads.append(
                    jnp.sum(jnp.abs(src_cells - p), axis=(1, 2)) + bias
                )
            sad_all = jnp.stack(sads)  # (K, n)
            sel = jnp.argmin(sad_all, axis=0).astype(jnp.int32)
            pred_stack = jnp.stack(preds)  # (K, n, s, s)
            pred_sel = jnp.take_along_axis(
                pred_stack, sel[None, :, None, None], axis=0)[0]

            active = active_by_size[s]
            mask_px = jnp.repeat(jnp.repeat(active, s, axis=0), s, axis=1)
            pred_y = jnp.where(mask_px, _uncells(pred_sel, gh, gw, s, s),
                               pred_y)
            sel_grids.append(jnp.where(active, sel.reshape(ny, nx), 0))
        return pred_y, tuple(sel_grids)

    return fn


def _chroma_program(geom: ChainGeom):
    """Stage 2: chroma MC (4:2:0) from the per-size selection grids."""
    jnp = _jnp()
    g = geom
    gh, gw = g.gh, g.gw
    ch_h, ch_w = gh // 2, gw // 2
    bd = g.bd

    def fn(refs_u, refs_v, aux, sels):
        fields = _aux_fields(g, aux)
        ords = _aux_ords(g, aux)
        ref_u = jnp.stack(refs_u)
        ref_v = jnp.stack(refs_v)
        active_by_size = _active_by_size(g, ords)
        pred_u = jnp.zeros((ch_h, ch_w), jnp.int32)
        pred_v = jnp.zeros((ch_h, ch_w), jnp.int32)
        for si, s in enumerate(g.sizes):
            sc = s >> 1
            ny, nx = gh // s, gw // s
            n = ny * nx
            pos_y = jnp.repeat(jnp.arange(ny, dtype=jnp.int32) * sc, nx)
            pos_x = jnp.tile(jnp.arange(nx, dtype=jnp.int32) * sc, ny)
            f = [_field_at(fields[k], s, ny, nx) for k in range(3)]
            zero = jnp.zeros((n, 2), jnp.int32)
            cand_mv = [f[0], f[1], f[2], zero, f[0]]
            sel = sels[si].reshape(-1)
            mv0 = jnp.stack(cand_mv)[sel, jnp.arange(n)]
            comp = sel == 4
            ridx = jnp.asarray(np.asarray(CAND_REF, np.int32))[sel]
            for ref_c, out_name in ((ref_u, "u"), (ref_v, "v")):
                mv_r, mv_c = mv0[:, 0], mv0[:, 1]
                iy0 = PADD + pos_y + (mv_r >> 4) - 3
                ix0 = PADD + pos_x + (mv_c >> 4) - 3
                win = dsp.mc_gather_windows_ref(ref_c, ridx, iy0, ix0, sc, sc)
                single = dsp.mc_put_from_windows(win, mv_r, mv_c, sc, sc,
                                                 bd, 1, 1)
                if g.has_bwd:
                    t0 = _mc_prep(ref_c[0], pos_y, pos_x, f[0], sc, sc, bd,
                                  1, 1)
                    t1 = _mc_prep(ref_c[1], pos_y, pos_x, f[1], sc, sc, bd,
                                  1, 1)
                    comp_p = dsp.mc_avg(t0, t1, bd)
                    p = jnp.where(comp[:, None, None], comp_p, single)
                else:
                    p = single
                active = active_by_size[s]
                mask_px = jnp.repeat(jnp.repeat(active, sc, axis=0), sc,
                                     axis=1)
                placed = _uncells(p, ch_h, ch_w, sc, sc)
                if out_name == "u":
                    pred_u = jnp.where(mask_px, placed, pred_u)
                else:
                    pred_v = jnp.where(mask_px, placed, pred_v)
        return pred_u, pred_v

    return fn


def _txq_program(geom: ChainGeom):
    """Stage 3: forward transform + quantize + reconstruct per bucket,
    walk-order level packing, and the block decision grids."""
    jnp = _jnp()
    g = geom
    gh, gw = g.gh, g.gw
    ch_h, ch_w = gh // 2, gw // 2
    bd = g.bd

    def fn(src, preds, aux):
        from rav1e_tpu.quantize import _scan_u16

        nby8_q, nbx8_q = g.gh // 8, g.gw // 8
        ords = _aux_ords(g, aux)
        dcq8 = _aux_get(g, aux, "dcq8", (3, nby8_q, nbx8_q))
        acq8 = _aux_get(g, aux, "acq8", (3, nby8_q, nbx8_q))

        srcs = {0: src[0].astype(jnp.int32), 1: src[1].astype(jnp.int32),
                2: src[2].astype(jnp.int32)}
        predd = {0: preds[0], 1: preds[1], 2: preds[2]}
        exts = {0: (gh, gw), 1: (ch_h, ch_w), 2: (ch_h, ch_w)}
        recons = {0: preds[0], 1: preds[1], 2: preds[2]}

        eob_ord = jnp.zeros((g.ntx_cap + 1,), jnp.int32)
        bucket_levels = []
        overflow = jnp.zeros((), jnp.int32)
        for bi, (plane, tid, gh_t, gw_t) in enumerate(g.buckets):
            t = TxSize(tid)
            th, tw = t.height, t.width
            ph, pw = exts[plane]
            cell_px = th * (2 if plane else 1)  # cell size in luma px
            res = _cells(srcs[plane] - predd[plane], th, tw)
            coeffs = dsp.fwd_tx_batched(res, t, TxType.DCT_DCT)
            scan = _scan_u16(min(tw, 32), min(th, 32), "default")
            nyt, nxt = ph // th, pw // tw
            # segmentation qi is a PER-BLOCK property (the coder quantizes
            # every tx cell with the block-origin seg id, tile_block.inc
            # quantize_inter_blocks): with tx_split each luma block spans
            # 2x2 tx cells, so floor the cell index to the block origin —
            # sampling at cell origins desyncs recon whenever the 8px seg
            # map varies inside a block
            iy, ix = jnp.arange(nyt), jnp.arange(nxt)
            if plane == 0 and g.tx_split:
                iy, ix = (iy // 2) * 2, (ix // 2) * 2
            qy = (iy * cell_px) // 8
            qx = (ix * cell_px) // 8
            dcq = dcq8[plane][qy[:, None], qx[None, :]].reshape(-1)
            acq = acq8[plane][qy[:, None], qx[None, :]].reshape(-1)
            levels, eob = dsp.quantize_batched(coeffs, t, scan, dcq, acq,
                                               False)
            o = ords[bi].reshape(-1)
            active = o >= 0
            eob = jnp.where(active, eob, 0)
            eob_ord = eob_ord.at[jnp.where(active, o, g.ntx_cap)].set(eob)
            overflow = overflow | jnp.any(
                jnp.where(active[:, None], jnp.abs(levels), 0) > 32767
            ).astype(jnp.int32)
            bucket_levels.append((bi, plane, t, scan, levels, eob, active, o))

            qdense = dsp.scan_to_dense(levels, t, scan)
            rec_cells = dsp.itx_add_batched(qdense, _cells(predd[plane], th, tw),
                                            t, TxType.DCT_DCT, bd, dcq, acq)
            mask_px = jnp.repeat(
                jnp.repeat(active.reshape(nyt, nxt), th, axis=0), tw, axis=1)
            recons[plane] = jnp.where(mask_px,
                                      _uncells(rec_cells, ph, pw, th, tw),
                                      recons[plane])

        offs = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(eob_ord[: g.ntx_cap])])
        total_lvl = offs[-1]
        overflow = overflow | (total_lvl > g.lcap).astype(jnp.int32)
        levels_flat = jnp.zeros((g.lcap + 1,), jnp.int32)
        for (bi, plane, t, scan, levels, eob, active, o) in bucket_levels:
            area = levels.shape[1]
            j = jnp.arange(area, dtype=jnp.int32)[None, :]
            base = offs[jnp.where(active, o, g.ntx_cap)][:, None]
            dst = base + j
            ok = active[:, None] & (j < eob[:, None]) & (dst < g.lcap)
            dst = jnp.where(ok, dst, g.lcap)
            levels_flat = levels_flat.at[dst].set(
                jnp.where(ok, levels, 0), mode="drop")

        # ---- block grids (skip, tx size, bsize) -------------------------
        nby8, nbx8 = gh // 8, gw // 8
        nz8 = jnp.zeros((nby8, nbx8), jnp.int32)
        for (bi, plane, t, scan, levels, eob, active, o) in bucket_levels:
            th, tw = t.height, t.width
            ph, pw = exts[plane]
            nyt, nxt = ph // th, pw // tw
            nzg = (jnp.where(active, eob, 0) > 0).astype(jnp.int32)
            cell_px = th * (2 if plane else 1)
            nzg = nzg.reshape(nyt, nxt)
            if cell_px >= 8:
                up = cell_px // 8
                nz8 = nz8 + jnp.repeat(jnp.repeat(nzg, up, axis=0), up,
                                       axis=1)
            else:
                # sub-8px tx cells (tx_split on 8px blocks): pool 2x2
                k = 8 // cell_px
                nz8 = nz8 + nzg.reshape(nyt // k, k, nxt // k, k).sum(
                    axis=(1, 3))

        active_by_size = _active_by_size(g, ords)
        skip8 = jnp.zeros((nby8, nbx8), jnp.int32)
        tx8 = jnp.zeros((nby8, nbx8), jnp.int32)
        bsize8 = jnp.zeros((nby8, nbx8), jnp.int32)
        for s in g.sizes:
            c8 = s // 8
            ny, nx = gh // s, gw // s
            blk_nz = nz8.reshape(ny, c8, nx, c8).sum(axis=(1, 3))
            blk_skip = (blk_nz == 0).astype(jnp.int32)
            active = active_by_size[s].astype(jnp.int32)
            up = jnp.repeat(jnp.repeat(blk_skip * active, c8, axis=0), c8,
                            axis=1)
            upa = jnp.repeat(jnp.repeat(active, c8, axis=0), c8, axis=1)
            skip8 = jnp.where(upa > 0, up, skip8)
            max_tx = int(SQ_TX[s])
            cho_tx = int(tx_for_block(s, g.tx_split))
            tx_val = jnp.where(blk_skip > 0, max_tx, cho_tx)
            tx8 = jnp.where(upa > 0,
                            jnp.repeat(jnp.repeat(tx_val, c8, axis=0), c8,
                                       axis=1), tx8)
            bsize8 = jnp.where(upa > 0, SQ_BSIZE[s], bsize8)

        return (levels_flat, eob_ord, overflow,
                (recons[0], recons[1], recons[2]), skip8, tx8, bsize8)

    return fn


def _filters_program(geom: ChainGeom):
    """Stage 4: deblock + CDEF on the reconstruction; emits the padded
    reference planes for the next frames and the per-SB cdef indices."""
    jnp = _jnp()
    g = geom
    gh, gw = g.gh, g.gw
    ch_h, ch_w = gh // 2, gw // 2
    bd = g.bd

    def fn(recons, src, skip8, tx8, bsize8, aux):
        dbl_levels = _aux_get(g, aux, "dbl", (4,))
        cdef_y = _aux_get(g, aux, "cdefy", (4,))
        cdef_uv = _aux_get(g, aux, "cdefuv", (4,))
        srcs = {0: src[0].astype(jnp.int32), 1: src[1].astype(jnp.int32),
                2: src[2].astype(jnp.int32)}
        exts = {0: (gh, gw), 1: (ch_h, ch_w), 2: (ch_h, ch_w)}

        # mi-granularity grids for the deblock decisions
        skip_mi = jnp.repeat(jnp.repeat(skip8.astype(bool), 2, axis=0), 2,
                             axis=1)
        tx_mi = jnp.repeat(jnp.repeat(tx8, 2, axis=0), 2, axis=1)
        bsize_mi = jnp.repeat(jnp.repeat(bsize8, 2, axis=0), 2, axis=1)

        # ---- deblock ----------------------------------------------------
        planes_rec = [recons[0], recons[1], recons[2]]
        for pli in range(3):
            xdec = 0 if pli == 0 else 1
            ydec = xdec
            ph, pw = exts[pli]
            pw_c = (g.vis_w + xdec) >> xdec
            ph_c = (g.vis_h + ydec) >> ydec
            cols_p = min((pw_c + 3) >> 2, (g.mi_cols + xdec) >> xdec)
            rows_p = min((ph_c + 3) >> 2, (g.mi_rows + ydec) >> ydec)
            rec_p = jnp.pad(planes_rec[pli], 8)
            for vertical in (True, False):
                level = (dbl_levels[0 if vertical else 1] if pli == 0
                         else dbl_levels[pli + 1])
                sizes = _edge_sizes_device(
                    bsize_mi, tx_mi, skip_mi, pli, xdec, ydec, rows_p,
                    cols_p, vertical, g.mi_rows, g.mi_cols)
                if vertical:
                    sizes = sizes.at[:, 0].set(0)
                else:
                    sizes = sizes.at[0, :].set(0)
                full = jnp.zeros((ph // 4, pw // 4), jnp.int32)
                full = full.at[:rows_p, :cols_p].set(sizes)
                full = jnp.where(level > 0, full, 0)
                rec_p = dsp.deblock_pass_device(rec_p, full, level, bd,
                                                vertical)
            planes_rec[pli] = rec_p[8:-8, 8:-8]

        # ---- CDEF -------------------------------------------------------
        from rav1e_tpu.device.filters import cdef_stage_core

        nby_c = g.mi_rows // 2
        nbx_c = g.mi_cols // 2
        sb_rows = (g.vis_h + 63) // 64
        sb_cols = (g.vis_w + 63) // 64
        planes_geom = []
        rec_grids = []
        src_grids = []
        for pli in range(3):
            xd = 0 if pli == 0 else 1
            yd = xd
            ys, xs = 8 >> yd, 8 >> xd
            vh = (g.vis_h + (1 << yd) - 1) >> yd
            vw = (g.vis_w + (1 << xd) - 1) >> xd
            planes_geom.append((ys, xs, vh, vw))
            p = planes_rec[pli]
            gh_c, gw_c = nby_c * ys, nbx_c * xs
            ry = jnp.clip(jnp.arange(gh_c + 4) - 2, 0, p.shape[0] - 1)
            rx = jnp.clip(jnp.arange(gw_c + 4) - 2, 0, p.shape[1] - 1)
            rec_grids.append(p[ry[:, None], rx[None, :]])
            src_grids.append(srcs[pli][:gh_c, :gw_c])

        filt = (skip8[:nby_c, :nbx_c] == 0)
        core = cdef_stage_core(
            tuple(planes_geom),
            (nby_c, nbx_c, sb_rows, sb_cols, g.vis_w, g.vis_h),
            3, bd, 4)
        outs, cdef_idx = core(tuple(rec_grids), tuple(src_grids), filt,
                              cdef_y, cdef_uv)
        for pli in range(3):
            ys, xs, vh, vw = planes_geom[pli]
            gh_c, gw_c = nby_c * ys, nbx_c * xs
            planes_rec[pli] = planes_rec[pli].at[:gh_c, :gw_c].set(outs[pli])

        # ---- final padded recon (next frames' reference) ----------------
        out_dt = jnp.uint8 if bd == 8 else jnp.uint16
        ref_out = []
        for pli in range(3):
            xd = 0 if pli == 0 else 1
            vh = (g.vis_h + (1 << xd) - 1) >> xd
            vw = (g.vis_w + (1 << xd) - 1) >> xd
            ref_out.append(
                _pad_edge(planes_rec[pli], vh, vw, PADD).astype(out_dt))
        return tuple(ref_out), cdef_idx

    return fn


def _pack_program(geom: ChainGeom):
    """Stage 5: assemble the host payload as (header, levels) int16 pair.

    The header (overflow flag, walk-order eobs, selection grids, cdef
    indices) is small and always downloaded whole; the levels buffer is
    lcap-sized but only ``sum(eobs)`` entries are meaningful, so the fetch
    side downloads just that prefix — the lcap slack never crosses the
    tunnel."""
    jnp = _jnp()
    g = geom

    def fn(overflow, eob_ord, sels, cdef_idx, levels_flat):
        parts = [overflow[None].astype(jnp.int16),
                 eob_ord[: g.ntx_cap].astype(jnp.int16)]
        for sg in sels:
            parts.append(sg.reshape(-1).astype(jnp.int16))
        parts.append(cdef_idx.reshape(-1).astype(jnp.int16))
        return jnp.concatenate(parts), levels_flat[: g.lcap].astype(jnp.int16)

    return fn


@functools.lru_cache(None)
def chain_stages_jit(geom: ChainGeom):
    """The five jitted stage programs of the chain.

    One monolithic whole-chain program compiled in ~640 s and executed in
    ~300 ms/frame (XLA fusion blowup); the same math as five programs with
    device-resident intermediates compiles in seconds and runs at the sum
    of the stage times (each sub-ms, measured) — the per-dispatch enqueue
    is free on this backend."""
    import jax

    return (
        jax.jit(_sel_luma_program(geom)),
        jax.jit(_chroma_program(geom)),
        jax.jit(_txq_program(geom)),
        jax.jit(_filters_program(geom)),
        jax.jit(_pack_program(geom)),
    )


# ---------------------------------------------------------------------------
# host-side runner: slot state, dispatch, fetch, decision derivation
# ---------------------------------------------------------------------------


@dataclass
class ChainResult:
    eobs: np.ndarray          # (n_tx,) i32 walk-ordered
    levels: np.ndarray        # flat i32 scan-prefix values (walk-order packed)
    sel: Dict[int, np.ndarray]  # size -> (ny, nx) i16 candidate per cell
    cdef_idx: np.ndarray      # (sb_rows, sb_cols) i32
    overflow: bool
    refs: tuple = None        # (y, u, v) padded device recon planes


def host_pad_planes(frame, vis_w: int, vis_h: int):
    """Host Frame -> the chain's padded device layout (list of 3 numpy
    planes, SB-extent + PADD edge padding, native dtype)."""
    sb_cols = ((vis_w + 7) // 8 * 8 + 63) // 64
    sb_rows = ((vis_h + 7) // 8 * 8 + 63) // 64
    out = []
    for pli in range(3):
        pl = frame.planes[pli]
        xd, yd = pl.cfg.xdec, pl.cfg.ydec
        vw = (vis_w + xd) >> xd
        vh = (vis_h + yd) >> yd
        gw = sb_cols * (64 >> xd)
        gh = sb_rows * (64 >> yd)
        pad = pl.cfg.pad
        vis = pl.data[pad : pad + vh, pad : pad + vw]
        ry = np.clip(np.arange(gh + 2 * PADD) - PADD, 0, vh - 1)
        rx = np.clip(np.arange(gw + 2 * PADD) - PADD, 0, vw - 1)
        out.append(np.ascontiguousarray(vis[ry[:, None], rx[None, :]]))
    return out


def host_src_planes(frame, vis_w: int, vis_h: int):
    """Host Frame -> SB-extent source planes (native dtype, no pad)."""
    sb_cols = ((vis_w + 7) // 8 * 8 + 63) // 64
    sb_rows = ((vis_h + 7) // 8 * 8 + 63) // 64
    out = []
    for pli in range(3):
        pl = frame.planes[pli]
        xd, yd = pl.cfg.xdec, pl.cfg.ydec
        vw = (vis_w + xd) >> xd
        vh = (vis_h + yd) >> yd
        gw = sb_cols * (64 >> xd)
        gh = sb_rows * (64 >> yd)
        pad = pl.cfg.pad
        # include the plane's own edge padding out to the SB extent
        sl = pl.data[pad : pad + gh, pad : pad + gw]
        if sl.shape == (gh, gw):
            out.append(np.ascontiguousarray(sl))
        else:
            vis = pl.data[pad : pad + vh, pad : pad + vw]
            ry = np.clip(np.arange(gh), 0, vh - 1)
            rx = np.clip(np.arange(gw), 0, vw - 1)
            out.append(np.ascontiguousarray(vis[ry[:, None], rx[None, :]]))
    return out


def clamp_fields(maps, ny16: int, nx16: int):
    """Pack + clamp the analysis MV fields -> (3, ny16, nx16, 2) i32."""
    out = np.zeros((3, ny16, nx16, 2), dtype=np.int32)
    for k, f in enumerate((maps.mv0, maps.mv1, maps.mv2)):
        if f is not None:
            out[k] = np.clip(f[:ny16, :nx16], -MV_CLIP, MV_CLIP)
    return out


def dispatch_chain(geom: ChainGeom, plan: ChainPlan, src_planes, ref_planes,
                   fields, dcq8, acq8, dbl_levels, cdef_y, cdef_uv):
    """Enqueue the chain program asynchronously.

    src_planes: 3 numpy SB-extent planes; ref_planes: ((y,u,v),)*3 device
    (or numpy) padded planes; fields: (3, ny16, nx16, 2) i32.
    Returns an opaque handle for fetch_chain."""
    import jax
    import jax.numpy as jnp

    f_sel, f_chroma, f_txq, f_filters, f_pack = chain_stages_jit(geom)
    # ONE host->device transfer for everything but the pixel planes
    aux = jax.device_put(
        pack_aux(geom, plan, fields, dcq8, acq8, dbl_levels, cdef_y, cdef_uv)
    )
    refs = tuple(
        tuple(jnp.asarray(pl) for pl in r) for r in ref_planes
    )
    src = tuple(jnp.asarray(p) for p in src_planes)

    pred_y, sels = f_sel(src[0], tuple(r[0] for r in refs), aux)
    pred_u, pred_v = f_chroma(
        tuple(r[1] for r in refs), tuple(r[2] for r in refs), aux, sels,
    )
    levels_flat, eob_ord, overflow, recons, skip8, tx8, bsize8 = f_txq(
        src, (pred_y, pred_u, pred_v), aux,
    )
    ref_out, cdef_idx = f_filters(recons, src, skip8, tx8, bsize8, aux)
    hdr, levels = f_pack(overflow, eob_ord, sels, cdef_idx, levels_flat)
    # start the header download as soon as the device reaches it; the
    # levels prefix length is only known after the header arrives
    try:
        hdr.copy_to_host_async()
    except Exception:
        pass
    return (geom, plan, ref_out, (hdr, levels))


# previous frame's level count per geometry: sizes the optimistic levels
# prefix download (frames are temporally coherent, so last frame's total
# predicts this one's within the 1.5x slack nearly always)
_LVL_TOTAL_HINT: Dict[ChainGeom, int] = {}


def _lvl_bucket(n: int, cap: int) -> int:
    """Round a levels prefix length up to an 8K bucket (bounds the number
    of distinct device slice shapes — and thus compiles — per geometry)."""
    return min((max(int(n), 1) + 8191) & ~8191, cap)


def fetch_chain(handle) -> ChainResult:
    geom, plan, ref_out, (hdr_dev, lvl_dev) = handle
    g = geom
    from rav1e_tpu.utils.trace import span, trace_enabled

    # start the optimistic levels-prefix download concurrently with the
    # header download; only `sum(eobs)` of the lcap-sized buffer is
    # meaningful and that total is typically far below the cap
    pre_n = _lvl_bucket(_LVL_TOTAL_HINT.get(g, 8192) * 3 // 2, g.lcap)
    pre_dev = lvl_dev[:pre_n]
    try:
        pre_dev.copy_to_host_async()
    except Exception:
        pass

    if trace_enabled():
        with span("chain_wait_ready"):
            hdr_dev.block_until_ready()
        with span("chain_download"):
            arr = np.asarray(hdr_dev)
    else:
        arr = np.asarray(hdr_dev)
    off = 0
    overflow = bool(arr[0])
    off += 1
    eobs_all = arr[off : off + g.ntx_cap]
    eobs = eobs_all[: plan.n_tx].astype(np.int32)
    off += g.ntx_cap
    sel = {}
    for s in g.sizes:
        ny, nx = g.gh // s, g.gw // s
        sel[s] = arr[off : off + ny * nx].reshape(ny, nx)
        off += ny * nx
    sb_rows = (g.vis_h + 63) // 64
    sb_cols = (g.vis_w + 63) // 64
    cdef_idx = arr[off : off + sb_rows * sb_cols].reshape(
        sb_rows, sb_cols).astype(np.int32)

    total = int(eobs_all.astype(np.int64).sum())
    _LVL_TOTAL_HINT[g] = total
    need = min(total, g.lcap)
    if trace_enabled():
        with span("chain_download_levels"):
            if need <= pre_n:
                lv = np.asarray(pre_dev)[:need]
            else:
                lv = np.asarray(lvl_dev[: _lvl_bucket(need, g.lcap)])[:need]
    else:
        if need <= pre_n:
            lv = np.asarray(pre_dev)[:need]
        else:
            lv = np.asarray(lvl_dev[: _lvl_bucket(need, g.lcap)])[:need]
    levels = lv.astype(np.int32)
    return ChainResult(eobs, levels, sel, cdef_idx, overflow, ref_out)


# AV1 ref-type codes per candidate (device index 0/1/2 = LAST/ALTREF/BWDREF)
CAND_REF_TYPE = np.array([REF_LAST, REF_ALTREF, REF_BWDREF, REF_LAST,
                          REF_LAST], dtype=np.int8)


def derive_decisions(geom: ChainGeom, plan: ChainPlan, sel: Dict[int, np.ndarray],
                     fields: np.ndarray):
    """Chain decisions -> the native coder's reuse grids (mi granularity):
    (is_inter u8, ref i8 (.., 2), mv i16 (.., 4)).  Must mirror the device
    program's candidate->mv mapping exactly."""
    g = geom
    mi_rows, mi_cols = g.mi_rows, g.mi_cols
    is_inter = np.ones((mi_rows, mi_cols), dtype=np.uint8)
    ref = np.zeros((mi_rows, mi_cols, 2), dtype=np.int8)
    mv = np.zeros((mi_rows, mi_cols, 4), dtype=np.int16)
    ny16, nx16 = fields.shape[1], fields.shape[2]

    for s in g.sizes:
        t = tx_for_block(s, g.tx_split)
        og = plan.ords.get((0, int(t)))
        if og is None:
            continue
        k2 = 2 if g.tx_split else 1
        active = og[::k2, ::k2] >= 0
        ny, nx = g.gh // s, g.gw // s
        sg = np.asarray(sel[s], dtype=np.int64)
        # top-left 16px cell of each size-s cell (must match _field_at)
        fy = np.minimum(np.arange(ny) * s // 16, ny16 - 1)
        fx = np.minimum(np.arange(nx) * s // 16, nx16 - 1)
        f0 = fields[0][fy[:, None], fx[None, :]]
        f1 = fields[1][fy[:, None], fx[None, :]]
        f2 = fields[2][fy[:, None], fx[None, :]]
        zero = np.zeros_like(f0)
        mv0 = np.choose(sg[..., None], [f0, f1, f2, zero, f0])
        mv1 = np.where((sg == 4)[..., None], f1, 0)
        rt = CAND_REF_TYPE[sg]
        r2 = np.where(sg == 4, np.int8(REF_ALTREF), np.int8(-1))

        c = s // 4  # mi cells per side
        rep = lambda a: np.repeat(np.repeat(a, c, axis=0), c, axis=1)
        am = rep(active)[:mi_rows, :mi_cols]
        ref[..., 0] = np.where(am, rep(rt)[:mi_rows, :mi_cols], ref[..., 0])
        ref[..., 1] = np.where(am, rep(r2)[:mi_rows, :mi_cols], ref[..., 1])
        for i in range(2):
            mv[..., i] = np.where(
                am, rep(mv0[..., i])[:mi_rows, :mi_cols], mv[..., i])
            mv[..., 2 + i] = np.where(
                am, rep(mv1[..., i])[:mi_rows, :mi_cols], mv[..., 2 + i])
    return is_inter, ref, mv


class DeviceReconFrame:
    """A Frame whose planes live on device (the chain's recon) and
    materialize on first host access.  The device layout (SB extent +
    PADD=88 edge padding) is a superset of the host Plane layout
    (visible + PLANE_PADDING=88), so materialization is a slice."""

    def __init__(self, dev_planes, width: int, height: int, cs, bd: int):
        self._dev = dev_planes
        self._w, self._h, self._cs, self._bd = width, height, cs, bd
        self._frame = None

    def _materialize(self):
        if self._frame is None:
            from rav1e_tpu.frame import Frame

            f = Frame.new(self._w, self._h, self._cs, self._bd)
            for pli, pl in enumerate(f.planes):
                arr = np.asarray(self._dev[pli])
                pl.data[:, :] = arr[: pl.data.shape[0], : pl.data.shape[1]]
            self._frame = f
        return self._frame

    @property
    def planes(self):
        return self._materialize().planes

    def pad(self) -> None:  # device layout is already edge-padded
        pass

    def device_planes(self):
        return self._dev
