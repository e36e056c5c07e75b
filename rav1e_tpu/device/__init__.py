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

from rav1e_tpu.device.analysis import (
    DeviceMaps,
    analyze_finish,
    analyze_frame,
    analyze_frame_async,
    frame_analysis_jit,
)

__all__ = [
    "DeviceMaps", "analyze_finish", "analyze_frame", "analyze_frame_async",
    "frame_analysis_jit",
]
