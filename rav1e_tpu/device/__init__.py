"""Device (TPU) compute stage.

One batched, jitted XLA program per frame performs the encoder's search:
candidate intra predictions for every block at every partition size, SATD
mode scoring, transform-domain rate/distortion estimation, inter residual
costing from the motion-vector field, and the bottom-up partition merge.
The host symbol coder consumes the resulting decision maps
(`rav1e_tpu/encoder/pipeline.py`), which is the TPU-native redesign of the
reference's per-block trial loops (rdo.rs:963 rdo_mode_decision,
rdo.rs:1949 rdo_partition_decision) — score tensors + argmin on device
instead of serial trial encodes.
"""

import os as _os


def _enable_persistent_cache() -> None:
    """Persistent XLA compilation cache keyed by program+geometry.

    The analysis programs take 20-80 s to compile per frame geometry
    (BENCHREPORT first-frame latency); with the on-disk cache a second
    process on the same geometry reaches steady state within 2 frames.
    Opt out with RAV1E_TPU_NO_COMPILE_CACHE=1; relocate with
    RAV1E_TPU_COMPILE_CACHE=<dir>.
    """
    if _os.environ.get("RAV1E_TPU_NO_COMPILE_CACHE"):
        return
    # CPU runs (tests, virtual meshes) skip the cache: XLA:CPU AOT entries
    # embed exact machine-feature lists and reload with mismatch warnings
    # (and SIGILL risk) across processes.  Only the PRIMARY platform counts:
    # "axon,cpu" (TPU with cpu fallback) must still enable the cache.
    def _primary(platforms: str) -> str:
        return platforms.split(",")[0].strip().lower()

    if _primary(_os.environ.get("JAX_PLATFORMS", "tpu")) == "cpu":
        return
    try:
        import jax as _jax

        if _primary(str(_jax.config.jax_platforms or "tpu")) == "cpu":
            return  # pinned to CPU via jax.config (conftest / scripts)
    except Exception:
        pass
    try:
        import jax

        path = _os.environ.get(
            "RAV1E_TPU_COMPILE_CACHE",
            _os.path.join(
                _os.path.expanduser("~"), ".cache", "rav1e_tpu", "xla"
            ),
        )
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every program, however small/fast — the win here is skipping
        # recompiles across processes, not disk economy
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_cache()

from rav1e_tpu.device.analysis import (
    DeviceMaps,
    analyze_finish,
    analyze_frame,
    analyze_frame_async,
    frame_analysis_jit,
    upload_source_luma,
)

__all__ = [
    "DeviceMaps", "analyze_finish", "analyze_frame", "analyze_frame_async",
    "frame_analysis_jit", "upload_source_luma",
]
