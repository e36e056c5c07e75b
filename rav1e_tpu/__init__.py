"""rav1e-tpu: a TPU-native AV1 encoder framework.

A ground-up rebuild of the capabilities of xiph/rav1e (reference mounted at
/root/reference) designed for TPU hardware:

- The per-block DSP layer (transforms, quantize, distortion, intra/inter
  prediction, CDEF, loop restoration, deblocking) is implemented as batched
  JAX/XLA ops with Pallas TPU kernels on the hot paths, replacing the
  reference's ~216k lines of x86/ARM SIMD.
- Mode/partition search evaluates candidate batches on the MXU instead of
  scalar trial loops.
- The inherently serial entropy coder (daala range coder, AV1 symbol layer)
  and OBU bitstream packing run on host, overlapped with device compute.
- Tile parallelism maps to chip-sharding over an ICI mesh
  (``jax.sharding.Mesh`` + ``shard_map``); frame-level rate-control
  statistics aggregate via collectives.

Public API mirrors the reference (``Config`` / ``Context`` /
``send_frame`` / ``receive_packet``; cf. /root/reference/src/api/context.rs).
"""

__version__ = "0.1.0"

from rav1e_tpu.config import (
    ChromaSampling,
    ChromaSamplePosition,
    Config,
    EncoderConfig,
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
    "FrameType",
    "FrameTypeOverride",
    "Packet",
    "PixelRange",
    "Plane",
    "RateControlConfig",
    "SpeedSettings",
    "Tune",
]
