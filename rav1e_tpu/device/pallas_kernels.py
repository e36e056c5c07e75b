"""Pallas TPU kernels for the hottest device-analysis stages.

The two stages the analysis profile is dominated by (SURVEY §2.6; the
reference's compiled satd/sad families, build.rs:92-133 `sad_avx.asm`,
`satd16_avx2` dist.rs:156) are re-expressed as hand-tiled Pallas kernels:

 - ``satd_cells``: the 8x8 Hadamard SATD over a batch of cells.  The 2-D
   transform ``H d Hᵀ`` is flattened to ONE MXU matmul per tile via the
   Kronecker identity ``vec(H d Hᵀ) = (H⊗H) vec(d)`` — two 64-lane cells
   are packed per 128-lane row and multiplied by the block-diagonal
   ``I₂ ⊗ (H⊗H)`` 128x128 constant, with the |.|-sum-floor epilogue fused
   in VMEM (XLA runs the same math as an einsum + 3 elementwise passes
   over HBM).

 - ``sad_grid``: the full-pel motion-search candidate grid.  For every
   block the (2R+1)² candidate SADs all read the same (W, W) search
   window; the jnp formulation slices the window per candidate, which XLA
   fuses into ncand separate HBM sweeps.  The kernel holds each tile of
   windows VMEM-resident and unrolls the candidate loop in-register: one
   HBM read per window instead of ncand.

Both kernels are bit-compatible with their jnp counterparts
(tests/test_pallas.py runs them in interpreter mode against
device/analysis.satd8 and device/me._grid_search's inner SADs) and are
selected automatically on TPU backends (``RAV1E_TPU_NO_PALLAS=1`` opts
out; non-TPU backends use the jnp path, so CPU tests and the virtual-mesh
dryrun never require Mosaic).
"""

from __future__ import annotations

import functools
import os

import numpy as np


def _jnp():
    import jax.numpy as jnp

    return jnp


@functools.lru_cache(None)
def _mosaic_probe() -> bool:
    """Cached Mosaic capability probe (backend-level, mesh-independent)."""
    if os.environ.get("RAV1E_TPU_NO_PALLAS"):
        return False
    try:
        import jax

        if jax.default_backend() in ("cpu",):
            return False
        # probe: some experimental TPU plugins tunnel XLA but not Mosaic.
        import jax.numpy as jnp
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def k(x_ref, o_ref):
            o_ref[:] = x_ref[:] + 1.0

        x = jnp.zeros((8, 128), jnp.float32)
        y = pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        return bool(np.asarray(y)[0, 0] == 1.0)
    except Exception:
        return False


_mesh_fallback_logged = False


def pallas_ok() -> bool:
    """Pallas (Mosaic) kernels are used only on real TPU backends.

    The mesh state is evaluated at CALL time (not cached): pallas_call has
    no GSPMD partitioning rule, so when the analysis program is row-sharded
    over a multi-chip mesh (analysis._analysis_mesh) it must stay pure-XLA.
    Toggling RAV1E_TPU_NO_SHARD mid-process therefore needs no cache
    invalidation here."""
    if not _mosaic_probe():
        return False
    try:
        from rav1e_tpu.device.analysis import _analysis_mesh

        if _analysis_mesh() is not None:
            global _mesh_fallback_logged
            if not _mesh_fallback_logged:
                _mesh_fallback_logged = True
                import logging

                logging.getLogger(__name__).info(
                    "multi-chip mesh active: Pallas kernels fall back to "
                    "the sharded pure-XLA path"
                )
            return False
    except Exception:
        return False
    return True


# ---------------------------------------------------------------------------
# SATD: Hadamard cells as one 128x128 MXU matmul per tile
# ---------------------------------------------------------------------------

_SATD_TILE = 256  # rows (= 512 cells) per grid step; 256*128*4B = 128 KiB


@functools.lru_cache(None)
def _kron_h8x2() -> np.ndarray:
    """I₂ ⊗ H₈ ⊗ H₈ as (128, 128) f32 — two independent 64-lane cells."""
    h = np.array([[1.0]], dtype=np.float32)
    while h.shape[0] < 8:
        h = np.block([[h, h], [h, -h]])
    k64 = np.kron(h, h).astype(np.float32)
    out = np.zeros((128, 128), np.float32)
    out[:64, :64] = k64
    out[64:, 64:] = k64
    return out


def _satd_kernel(d_ref, k_ref, o_ref):
    import jax
    import jax.numpy as jnp

    # HIGHEST: the default TPU matmul precision uses bf16 passes, which
    # rounds diffs beyond +-256 (10/12-bit content) and would break the
    # documented bit-parity with the jnp einsum path
    t = jnp.dot(d_ref[:], k_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    a = jnp.abs(t)
    # Mosaic has no rank-3 shape cast: reduce the two 64-lane cells with
    # static slices instead of a (T, 2, 64) reshape
    a0 = a[:, :64].sum(axis=1, keepdims=True)
    a1 = a[:, 64:].sum(axis=1, keepdims=True)
    o_ref[:] = jnp.floor((jnp.concatenate([a0, a1], axis=1) + 4.0) / 8.0)


@functools.lru_cache(None)
def _satd_call(rows: int, interpret: bool):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (rows // _SATD_TILE,)
    return pl.pallas_call(
        _satd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_SATD_TILE, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_SATD_TILE, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 2), jax.numpy.float32),
        interpret=interpret,
    )


def satd_cells(cells, interpret: bool = False):
    """Per-cell Hadamard SATD: (m, 64) f32 |coeff-domain| cells ->
    (m,) f32 ``floor((Σ|H d Hᵀ| + 4) / 8)`` (ops/dist.get_satd
    normalization, dist.rs:156)."""
    jnp = _jnp()
    m = cells.shape[0]
    rows = max(_SATD_TILE, ((m + 1) // 2 + _SATD_TILE - 1)
               // _SATD_TILE * _SATD_TILE)
    d = jnp.zeros((rows * 2, 64), jnp.float32).at[:m].set(cells)
    d = d.reshape(rows, 128)
    out = _satd_call(rows, interpret)(d, jnp.asarray(_kron_h8x2()))
    return out.reshape(rows * 2)[:m]


def satd8(diff, interpret: bool = False):
    """Drop-in for device/analysis.satd8: (..., s, s) int32/float diffs ->
    (...,) f32 SATD summed over the 8x8 Hadamard cells."""
    jnp = _jnp()
    *lead, sh, sw = diff.shape
    d = diff.astype(jnp.float32).reshape(*lead, sh // 8, 8, sw // 8, 8)
    d = jnp.moveaxis(d, -2, -3)  # (..., sh/8, sw/8, 8, 8)
    ncell = (sh // 8) * (sw // 8)
    flat = d.reshape(-1, 64)
    cells = satd_cells(flat, interpret)
    return cells.reshape(*lead, ncell).sum(axis=-1)


# ---------------------------------------------------------------------------
# ME SAD candidate grid: VMEM-resident windows, candidate loop in-register
# ---------------------------------------------------------------------------

_SAD_TILE = 32  # blocks per grid step (bounded by the 16 MiB VMEM budget)


def _sad_kernel_factory(blk: int, R: int, step: int):
    ncand_side = 2 * R + 1

    def kernel(src_ref, win_ref, o_ref):
        import jax.numpy as jnp

        src = src_ref[:]  # (T, blk, blk) i32
        for oy in range(ncand_side):
            # one window row-band load feeds a whole candidate row; each
            # column is stored immediately so per-candidate temps don't
            # stay live (unrolled liveness blew the scoped-VMEM stack)
            band = win_ref[:, oy * step : oy * step + blk, :]
            for ox in range(ncand_side):
                d = jnp.abs(band[:, :, ox * step : ox * step + blk] - src)
                c = oy * ncand_side + ox
                # reduce minor axes stepwise (no rank-3 shape casts)
                o_ref[:, c : c + 1] = d.sum(axis=2).sum(axis=1, keepdims=True)

    return kernel


@functools.lru_cache(None)
def _sad_call(n: int, blk: int, R: int, step: int, Wp: int, interpret: bool):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ncand = (2 * R + 1) ** 2
    grid = (n // _SAD_TILE,)
    return pl.pallas_call(
        _sad_kernel_factory(blk, R, step),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_SAD_TILE, blk, blk), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SAD_TILE, Wp, Wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_SAD_TILE, ncand), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ncand), jax.numpy.int32),
        interpret=interpret,
    )


def sad_grid(src_blocks, win, blk: int, R: int, step: int,
             interpret: bool = False):
    """(n, blk, blk) i32 source blocks x (n, W, W) i32 search windows ->
    (n, (2R+1)²) i32 SADs over the step-spaced candidate grid (the inner
    loop of device/me._grid_search; reference me.rs:693 full_pixel_me)."""
    jnp = _jnp()
    n, W = src_blocks.shape[0], win.shape[1]
    # pad the window spatial dims to sublane multiples (slices only read
    # the leading W region, so trailing garbage is never touched)
    Wp = (W + 7) // 8 * 8
    if Wp != W:
        win = jnp.pad(win, ((0, 0), (0, Wp - W), (0, Wp - W)))
    npad = max(_SAD_TILE, (n + _SAD_TILE - 1) // _SAD_TILE * _SAD_TILE)
    if npad != n:
        src_blocks = jnp.concatenate(
            [src_blocks,
             jnp.zeros((npad - n,) + src_blocks.shape[1:], src_blocks.dtype)]
        )
        win = jnp.concatenate(
            [win, jnp.zeros((npad - n,) + win.shape[1:], win.dtype)]
        )
    out = _sad_call(npad, blk, R, step, Wp, interpret)(
        src_blocks.astype(jnp.int32), win.astype(jnp.int32)
    )
    return out[:n]
