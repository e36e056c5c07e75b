from rav1e_tpu.api.util import (
    EncoderStatus,
    FrameType,
    FrameTypeOverride,
    Packet,
)
from rav1e_tpu.frame import FrameParameters
from rav1e_tpu.api.context import Context

__all__ = [
    "Context",
    "EncoderStatus",
    "FrameParameters",
    "FrameType",
    "FrameTypeOverride",
    "Packet",
]
