"""rav1e-tpu: a TPU-native AV1 encoder framework.

A ground-up rebuild of the capabilities of xiph/rav1e (reference mounted at
/root/reference) designed for TPU hardware:

- Frame analysis (intra mode + partition decisions, candidate scoring,
  rate/distortion proxies) runs as one batched jitted XLA program per frame
  (``rav1e_tpu/device``) feeding the host symbol coder; the exact
  reconstruction DSP (transforms, quantize, MC, CDEF, LRF, deblock) runs as
  vectorized array ops with native C++ fast paths for the per-block chain.
- The inherently serial entropy coder (daala range coder, AV1 symbol layer)
  and OBU bitstream packing run on host C++.
- Tile parallelism maps to chip-sharding over an ICI mesh
  (``jax.sharding.Mesh`` + ``shard_map``) of the device analysis stage;
  frame-level rate statistics aggregate via psum (``rav1e_tpu/parallel``).

Public API mirrors the reference (``Config`` / ``Context`` /
``send_frame`` / ``receive_packet``; cf. /root/reference/src/api/context.rs).
"""

__version__ = "0.1.0"

from rav1e_tpu.config import (
    ChromaSampling,
    ChromaSamplePosition,
    Config,
    EncoderConfig,
    InvalidConfig,
    PixelRange,
    RateControlConfig,
    SpeedSettings,
    Tune,
)
from rav1e_tpu.api import (
    Context,
    EncoderStatus,
    Packet,
    FrameType,
    FrameTypeOverride,
    FrameParameters,
)
from rav1e_tpu.frame import Frame, Plane

__all__ = [
    "ChromaSampling",
    "ChromaSamplePosition",
    "Config",
    "Context",
    "EncoderConfig",
    "EncoderStatus",
    "Frame",
    "FrameParameters",
    "InvalidConfig",
    "FrameType",
    "FrameTypeOverride",
    "Packet",
    "PixelRange",
    "Plane",
    "RateControlConfig",
    "SpeedSettings",
    "Tune",
]
