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
        size_map, mode_map, inter_map, bits, _, _, _ = _frame_analysis(
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
