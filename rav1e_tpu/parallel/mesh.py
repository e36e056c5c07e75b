"""Multi-chip sharding: tiles over an ICI mesh.

The TPU-native replacement for the reference's rayon tile parallelism
(encoder.rs:3249-3257): tile columns shard across chips via ``shard_map``
over a 1-D ``tile`` mesh axis.  Per-tile symbol streams are independent by
design (SURVEY.md §2.7), so the only cross-chip traffic is the frame-level
rate-control statistic aggregation — a single ``psum`` riding ICI (the
analog of the reference's `fs.enc_stats +=` reduction and RCState bit-count
feedback, encoder.rs:3259 / rate.rs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from rav1e_tpu.ops.analysis import analyze_intra_modes, _dct_mat, BLOCK


def make_mesh(n_devices: int = 0, axis: str = "tile") -> Mesh:
    devs = jax.devices()
    if n_devices:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"need {n_devices} devices, have {len(devs)} "
                f"(set JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=N)"
            )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def sharded_frame_analysis(mesh: Mesh, luma: jnp.ndarray, bit_depth: int = 8):
    """Tile-sharded frame analysis + rate-stat allreduce.

    ``luma``: (H, W) superblock-aligned; H must split evenly over the mesh
    (each shard = a band of superblock rows, standing in for a tile).
    Returns (modes (n_blocks,), total_rate_proxy scalar) with the rate
    aggregated across chips via psum — exercising the ICI collective the
    rate controller consumes.
    """
    base = 128 << (bit_depth - 8)
    n = mesh.devices.size
    h, w = luma.shape
    assert h % (n * BLOCK) == 0, "height must split over mesh in SB rows"

    def tile_step(band):
        band = band[0]  # strip the sharded leading axis
        modes, sad = analyze_intra_modes(band, base)
        best_sad = jnp.take_along_axis(sad, modes[:, None], axis=1)[:, 0]
        local_rate = jnp.log1p(best_sad.astype(jnp.float32)).sum()
        total_rate = jax.lax.psum(local_rate, "tile")
        return modes[None], total_rate

    fn = shard_map(
        tile_step,
        mesh=mesh,
        in_specs=P("tile", None),
        out_specs=(P("tile"), P()),
    )
    bands = luma.reshape(n, h // n, w)
    modes, rate = jax.jit(fn)(bands)
    return modes.reshape(-1), rate
