from rav1e_tpu.context.cdf import CDFContext, CDFContextLog
from rav1e_tpu.context.block import BlockContext, FrameBlocks
from rav1e_tpu.context.writer import ContextWriter

__all__ = [
    "BlockContext",
    "CDFContext",
    "CDFContextLog",
    "ContextWriter",
    "FrameBlocks",
]
