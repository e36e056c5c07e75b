"""Device-side batched frame analysis (the TPU compute path).

This is the jittable heart of the TPU-native design: instead of the
reference's per-block scalar trial loops (rdo.rs mode decision), candidate
intra predictions and costs for the whole frame evaluate as one batched XLA
program — (n_blocks, modes, h, w) tensors on the VPU/MXU — and only the
argmin decisions flow back to the host symbol coder.

Used by the encoder pipeline for mode pre-selection, by ``__graft_entry__``
as the compile-checked forward step, and sharded over a mesh for the
multi-chip tile-parallel path (rav1e_tpu/parallel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BLOCK = 32  # analysis granularity (matches speed>=10 partition size)
N_MODES = 5  # DC, V, H, PAETH, SMOOTH (order: PredictionMode 0,1,2,12,9)

# smooth weights for 32 (normative table, ops/intra.py)
_SM32 = np.array(
    [255, 240, 225, 210, 196, 182, 169, 157, 145, 133, 122, 111, 101, 92,
     83, 74, 66, 59, 52, 45, 39, 34, 29, 25, 21, 17, 14, 12, 10, 9, 8, 8],
    dtype=np.int32,
)


def block_grid(luma: jnp.ndarray, base: int):
    """Split padded (H, W) luma into (n, B, B) blocks + per-block edges.

    H, W must be multiples of BLOCK. Returns (blocks, above, left, top_left)
    where above/left use source neighbors (frame borders filled with the
    spec's base values).
    """
    h, w = luma.shape
    nby, nbx = h // BLOCK, w // BLOCK
    blocks = luma.reshape(nby, BLOCK, nbx, BLOCK).transpose(0, 2, 1, 3)

    # above rows: row (by*B - 1); for by==0 use base-1
    above_rows = jnp.concatenate(
        [jnp.full((1, w), base - 1, luma.dtype), luma[BLOCK - 1 :: BLOCK][:-1]], axis=0
    )  # (nby, w)
    above = above_rows.reshape(nby, nbx, BLOCK).transpose(0, 1, 2)  # (nby, nbx, B)
    left_cols = jnp.concatenate(
        [jnp.full((h, 1), base + 1, luma.dtype), luma[:, BLOCK - 1 :: BLOCK][:, :-1]],
        axis=1,
    )  # (h, nbx)
    left = left_cols.T.reshape(nbx, nby, BLOCK).transpose(1, 0, 2)  # (nby, nbx, B)

    # top-left corners
    tl = jnp.pad(luma[BLOCK - 1 :: BLOCK, BLOCK - 1 :: BLOCK], ((1, 0), (1, 0)), constant_values=base)
    tl = tl[:nby, :nbx]

    return (
        blocks.reshape(-1, BLOCK, BLOCK),
        above.reshape(-1, BLOCK),
        left.reshape(-1, BLOCK),
        tl.reshape(-1),
    )


def predict_candidates(above: jnp.ndarray, left: jnp.ndarray, tl: jnp.ndarray):
    """All candidate predictions: (n, N_MODES, B, B) int32."""
    n = above.shape[0]
    a = above.astype(jnp.int32)
    l = left.astype(jnp.int32)
    t = tl.astype(jnp.int32)

    dc = ((a.sum(-1) + l.sum(-1) + BLOCK) // (2 * BLOCK))[:, None, None]
    dc = jnp.broadcast_to(dc, (n, BLOCK, BLOCK))
    v = jnp.broadcast_to(a[:, None, :], (n, BLOCK, BLOCK))
    hh = jnp.broadcast_to(l[:, :, None], (n, BLOCK, BLOCK))

    # Paeth
    base_p = l[:, :, None] + a[:, None, :] - t[:, None, None]
    pl = jnp.abs(base_p - l[:, :, None])
    pt = jnp.abs(base_p - a[:, None, :])
    ptl = jnp.abs(base_p - t[:, None, None])
    paeth = jnp.where(
        (pl <= pt) & (pl <= ptl),
        jnp.broadcast_to(l[:, :, None], base_p.shape),
        jnp.where(pt <= ptl, jnp.broadcast_to(a[:, None, :], base_p.shape),
                  jnp.broadcast_to(t[:, None, None], base_p.shape)),
    )

    # Smooth
    wv = jnp.asarray(_SM32)[None, :, None]
    ww = jnp.asarray(_SM32)[None, None, :]
    below = l[:, -1][:, None, None]
    right = a[:, -1][:, None, None]
    smooth = (
        wv * a[:, None, :] + (256 - wv) * below + ww * l[:, :, None] + (256 - ww) * right
    )
    smooth = (smooth + 256) >> 9

    return jnp.stack([dc, v, hh, paeth, smooth], axis=1)


def analyze_intra_modes(luma: jnp.ndarray, base: int):
    """Best candidate mode per 32x32 block by SAD: (n_blocks,) int32.

    Index maps to PredictionMode via ANALYSIS_MODE_TABLE.
    """
    blocks, above, left, tl = block_grid(luma, base)
    preds = predict_candidates(above, left, tl)
    sad = jnp.abs(blocks[:, None].astype(jnp.int32) - preds).sum(axis=(-1, -2))
    # deterministic mode-cost bias: prefer DC on ties
    bias = jnp.array([0, BLOCK, BLOCK, BLOCK, BLOCK], dtype=jnp.int32)[None]
    return jnp.argmin(sad + bias, axis=1).astype(jnp.int32), sad


# PredictionMode values for analysis indices [DC, V, H, PAETH, SMOOTH]
ANALYSIS_MODE_TABLE = np.array([0, 1, 2, 12, 9], dtype=np.int32)


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def frame_analysis(luma: jnp.ndarray, bit_depth: int = 8):
    """Jitted full-frame analysis step (the graft entry forward fn).

    Input: (H, W) luma, superblock-aligned.  Returns dict with per-32x32
    mode decisions, SAD cost matrix and a DCT energy proxy used for rate
    estimation — everything the host symbol coder needs from the device.
    """
    base = 128 << (bit_depth - 8)
    modes, sad = analyze_intra_modes(luma, base)
    # transform-domain energy proxy of the DC-mode residual (MXU matmuls)
    blocks, above, left, tl = block_grid(luma, base)
    preds = predict_candidates(above, left, tl)
    n = blocks.shape[0]
    best = jnp.take_along_axis(preds, modes[:, None, None, None], axis=1)[:, 0]
    residual = blocks.astype(jnp.float32) - best.astype(jnp.float32)
    d = _dct_mat(BLOCK)
    coeffs = jnp.einsum("ij,bjk,lk->bil", d, residual, d, preferred_element_type=jnp.float32)
    rate_proxy = jnp.log1p(jnp.abs(coeffs)).sum()
    return {"modes": modes, "sad": sad, "rate_proxy": rate_proxy}


@functools.lru_cache(None)
def _dct_mat(n: int):
    k = np.arange(n)
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    m[0] *= 1.0 / np.sqrt(2.0)
    return jnp.asarray(m.astype(np.float32))
