"""Multi-chip sharding: the device analysis stage over an ICI mesh.

The TPU-native replacement for the reference's rayon tile parallelism
(encoder.rs:3249-3257): tile row-bands shard across chips via ``shard_map``
over a 1-D ``tile`` mesh axis, each chip running the full frame-analysis
program (rav1e_tpu/device/analysis.py) on its band.  Per-tile symbol
streams are independent by design (SURVEY.md §2.7) and AV1 intra prediction
never crosses tile edges, so a band analysis equals the single-device
analysis of that band — the only cross-chip traffic is the frame-level
rate-estimate aggregation, a single ``psum`` riding ICI (the analog of the
reference's `fs.enc_stats +=` reduction feeding RCState, encoder.rs:3259 /
rate.rs:1072).
"""

from __future__ import annotations

import numpy as np


def make_mesh(n_devices: int = 0, axis: str = "tile"):
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if n_devices:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"need {n_devices} devices, have {len(devs)} "
                f"(set JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=N)"
            )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def sharded_frame_analysis(mesh, luma, qindex: int, lam: float, bd: int = 8):
    """Band-sharded frame analysis + RC rate-estimate allreduce.

    ``luma``: (H, W) numpy array, H divisible by 64*n_bands (each shard is a
    band of whole superblock rows, standing in for a tile row).  Returns
    (size_log2, mode, use_inter, bits_total) with the per-8px-cell maps
    assembled across bands and bits_total psum'd across chips.
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from rav1e_tpu import tables
    from rav1e_tpu.device.analysis import _frame_analysis

    n = mesh.devices.size
    h, w = luma.shape
    assert h % (n * 64) == 0, "height must split over the mesh in SB rows"
    q = float(tables.ac_q(qindex, 0, bd))

    def band_step(band, q_, lam_):
        band = band[0]  # strip the sharded leading axis
        size_map, mode_map, inter_map, bits, _, _, _, _ = _frame_analysis(
            band, band, band, band, q_, lam_, bd, has_inter=False
        )
        total_bits = jax.lax.psum(bits, "tile")
        return size_map[None], mode_map[None], inter_map[None], total_bits

    fn = shard_map(
        band_step,
        mesh=mesh,
        in_specs=(P("tile", None), P(), P()),
        out_specs=(P("tile"), P("tile"), P("tile"), P()),
    )
    bands = jnp.asarray(luma.astype(np.int32)).reshape(n, h // n, w)
    size_map, mode_map, inter_map, bits = jax.jit(fn)(
        bands, jnp.float32(q), jnp.float32(lam)
    )
    ncells_h = h // 8
    return (
        np.asarray(size_map).reshape(ncells_h, w // 8),
        np.asarray(mode_map).reshape(ncells_h, w // 8),
        np.asarray(inter_map).reshape(ncells_h, w // 8),
        float(bits),
    )


# motion-search reach: L0 clip +-38 px + the subpel window margin, rounded
# up to a whole superblock so band heights stay 64-multiples
ME_HALO = 64


def sharded_inter_analysis(mesh, luma, ref, qindex: int, lam: float,
                           bd: int = 8):
    """Band-sharded INTER frame analysis with an ICI halo exchange.

    Unlike intra analysis, motion estimation reads reference pixels up to
    +-38 px beyond a block, so each band needs its neighbours' edge rows.
    Every chip ships its top/bottom ``ME_HALO`` rows of both source and
    reference to its neighbours with ``jax.lax.ppermute`` (two
    nearest-neighbour ICI transfers), runs the full inter analysis
    (device ME pyramid + subpel + intra/inter cost fields + partition
    merge) on the extended band, and keeps the interior decisions; the
    frame rate estimate is the psum of the interior rate maps.

    Boundary chips replicate their own edge rows (frame-edge semantics).
    Returns (size_log2, mode, use_inter, mv0 (H/16, W/16, 2), bits_total).
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from rav1e_tpu import tables
    from rav1e_tpu.device.analysis import _frame_analysis

    n = mesh.devices.size
    h, w = luma.shape
    assert h % (n * 64) == 0, "height must split over the mesh in SB rows"
    band_h = h // n
    q = float(tables.ac_q(qindex, 0, bd))
    Hh = ME_HALO

    def exchange_halo(x):
        # my bottom rows travel down (become the next chip's top halo);
        # my top rows travel up (the previous chip's bottom halo)
        top = jax.lax.ppermute(x[-Hh:], "tile",
                               [(i, i + 1) for i in range(n - 1)])
        bot = jax.lax.ppermute(x[:Hh], "tile",
                               [(i + 1, i) for i in range(n - 1)])
        idx = jax.lax.axis_index("tile")
        top = jnp.where(idx == 0, jnp.repeat(x[:1], Hh, axis=0), top)
        bot = jnp.where(idx == n - 1, jnp.repeat(x[-1:], Hh, axis=0), bot)
        return jnp.concatenate([top, x, bot], axis=0)

    hc = Hh // 8     # halo in 8px cells
    hm = Hh // 16    # halo in 16px MV cells

    def band_step(band_src, band_ref, q_, lam_):
        bs = exchange_halo(band_src[0])
        br = exchange_halo(band_ref[0])
        size_map, mode_map, inter_map, _bits, mv0, _mv1, _mv2, rate_map = \
            _frame_analysis(bs, br, br, br, q_, lam_, bd, has_inter=True)
        nc = band_h // 8
        nm = band_h // 16
        interior_bits = rate_map[hc : hc + nc].sum()
        total_bits = jax.lax.psum(interior_bits, "tile")
        return (
            size_map[hc : hc + nc][None],
            mode_map[hc : hc + nc][None],
            inter_map[hc : hc + nc][None],
            mv0[hm : hm + nm][None],
            total_bits,
        )

    fn = shard_map(
        band_step,
        mesh=mesh,
        in_specs=(P("tile", None), P("tile", None), P(), P()),
        out_specs=(P("tile"), P("tile"), P("tile"), P("tile"), P()),
    )
    src_b = jnp.asarray(luma.astype(np.int32)).reshape(n, band_h, w)
    ref_b = jnp.asarray(ref.astype(np.int32)).reshape(n, band_h, w)
    size_map, mode_map, inter_map, mv0, bits = jax.jit(fn)(
        src_b, ref_b, jnp.float32(q), jnp.float32(lam)
    )
    return (
        np.asarray(size_map).reshape(h // 8, w // 8),
        np.asarray(mode_map).reshape(h // 8, w // 8),
        np.asarray(inter_map).reshape(h // 8, w // 8),
        np.asarray(mv0).reshape(h // 16, w // 16, 2),
        float(bits),
    )
