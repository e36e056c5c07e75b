"""Native C++ tile coder parity: byte-identical bitstreams vs the Python
TileEncoder path across frame types, chroma samplings, bit depths, odd
dimensions, segmentation, and the CDEF/LRF pass-2 symbol insertion."""

import numpy as np
import pytest

import rav1e_tpu.native_tile as native_tile
from rav1e_tpu import (
    ChromaSampling,
    Config,
    EncoderConfig,
    EncoderStatus,
    SpeedSettings,
)
from rav1e_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _encode(w, h, n, speed, cs, bd, force_python, seed=5, quantizer=110,
            low_latency=False):
    cfg = Config(
        enc=EncoderConfig(
            width=w, height=h, quantizer=quantizer, low_latency=low_latency,
            chroma_sampling=cs, bit_depth=bd,
            speed_settings=SpeedSettings.from_preset(speed),
            min_key_frame_interval=0, max_key_frame_interval=999,
        )
    )
    ctx = cfg.new_context()
    rng = np.random.default_rng(seed)
    hi = 1 << bd
    coarse = rng.integers(0, hi, ((h + 7) // 8 + 2, (w + 7) // 8 + 2))
    base = np.repeat(np.repeat(coarse, 8, 0), 8, 1)[:h, :w].astype(np.int64)
    dt = np.uint8 if bd == 8 else np.uint16

    orig = native_tile.encode_tile_native
    if force_python:
        native_tile.encode_tile_native = lambda te: None
    try:
        for t in range(n):
            f = ctx.new_frame()
            for i, p in enumerate(f.planes):
                ch, cw = p.cfg.height, p.cfg.width
                if i == 0:
                    arr = np.roll(base, 2 * t, axis=1)[:ch, :cw] + rng.integers(
                        -2, 3, (ch, cw)
                    )
                else:
                    arr = rng.integers(hi // 3, 2 * hi // 3, (ch, cw))
                p.copy_from(np.clip(arr, 0, hi - 1).astype(dt))
            ctx.send_frame(f)
        ctx.flush()
        pkts = []
        while True:
            try:
                pkts.append(ctx.receive_packet())
            except EncoderStatus.LimitReached:
                break
        return [p.data for p in pkts]
    finally:
        native_tile.encode_tile_native = orig


CASES = [
    # (w, h, frames, speed, chroma, bd, low_latency)
    (128, 96, 1, 8, ChromaSampling.Cs420, 8, True),     # key only, no filters
    (128, 96, 4, 8, ChromaSampling.Cs420, 8, True),     # low-latency inter
    (192, 128, 5, 6, ChromaSampling.Cs420, 8, False),   # pyramid + CDEF/LRF pass 2
    (99, 75, 3, 6, ChromaSampling.Cs420, 8, True),      # odd dims
    (128, 96, 3, 6, ChromaSampling.Cs444, 8, True),     # 4:4:4
    (116, 96, 3, 6, ChromaSampling.Cs422, 8, True),     # 4:2:2
    (128, 96, 3, 6, ChromaSampling.Cs400, 8, True),     # monochrome
    (128, 96, 3, 6, ChromaSampling.Cs420, 10, True),    # 10-bit
    (128, 96, 3, 9, ChromaSampling.Cs420, 8, True),     # inter tx split
]


@pytest.mark.parametrize("w,h,n,speed,cs,bd,ll", CASES)
def test_native_tile_bitstream_parity(w, h, n, speed, cs, bd, ll):
    py = _encode(w, h, n, speed, cs, bd, force_python=True, low_latency=ll)
    cc = _encode(w, h, n, speed, cs, bd, force_python=False, low_latency=ll)
    assert len(py) == len(cc)
    for i, (a, b) in enumerate(zip(py, cc)):
        assert a == b, f"packet {i} differs: {len(a)} vs {len(b)} bytes"


def test_native_tile_actually_used():
    """Guard against the dispatch silently falling back to Python."""
    used = []
    orig = native_tile.encode_tile_native

    def spy(te):
        r = orig(te)
        used.append(r is not None)
        return r

    native_tile.encode_tile_native = spy
    try:
        _encode(128, 96, 2, 6, ChromaSampling.Cs420, 8, force_python=False)
    finally:
        native_tile.encode_tile_native = orig
    assert used and all(used)
