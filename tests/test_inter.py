"""Inter coding round-trip tests (low-latency, single reference)."""

import numpy as np
import pytest

from rav1e_tpu import ChromaSampling, Config, EncoderConfig, EncoderStatus
from rav1e_tpu.api.util import FrameType
from rav1e_tpu.decoder import decode_packet


def encode_sequence(frames_y, w, h, cs=ChromaSampling.Cs420, q=100, speed=10, keyint=100):
    cfg = Config(
        enc=EncoderConfig(
            width=w, height=h, quantizer=q, chroma_sampling=cs, low_latency=True,
            min_key_frame_interval=0, max_key_frame_interval=keyint,
        )
    ).with_speed_preset(speed)
    ctx = cfg.new_context()
    for y in frames_y:
        f = ctx.new_frame()
        f.planes[0].copy_from(y)
        for p in f.planes[1:]:
            p.copy_from(np.full((p.cfg.height, p.cfg.width), 128, np.uint8))
        ctx.send_frame(f)
    ctx.flush()
    packets = []
    state = None
    while True:
        try:
            pkt = ctx.receive_packet()
        except EncoderStatus.LimitReached:
            break
        dec, state = decode_packet(pkt.data, state)
        for pi, (ep, dp) in enumerate(zip(pkt.rec.planes, dec.planes)):
            assert np.array_equal(ep.as_array(), dp.as_array()), (
                f"frame {pkt.input_frameno} plane {pi} mismatch"
            )
        packets.append(pkt)
    return packets


def _translating_content(w, h, n, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, ((h + 8 * n) // 8 + 2, (w + 8 * n) // 8 + 2))
    big = np.repeat(np.repeat(base, 8, 0), 8, 1)
    return [big[i : i + h, 2 * i : 2 * i + w].astype(np.uint8) for i in range(n)]


def test_inter_roundtrip_translation():
    frames = _translating_content(96, 64, 5)
    pkts = encode_sequence(frames, 96, 64)
    assert pkts[0].frame_type == FrameType.KEY
    assert all(p.frame_type == FrameType.INTER for p in pkts[1:])
    # motion compensation must beat intra coding of the key frame
    assert all(len(p.data) < len(pkts[0].data) for p in pkts[2:])


def test_inter_static_content_cheap():
    rng = np.random.default_rng(1)
    y = np.repeat(np.repeat(rng.integers(0, 256, (8, 12)), 8, 0), 8, 1).astype(np.uint8)
    pkts = encode_sequence([y] * 4, 96, 64)
    # identical frames: inter frames should be tiny (all-zero MVs + no residual)
    assert all(len(p.data) < 120 for p in pkts[1:])


def test_keyframe_interval():
    frames = _translating_content(64, 64, 6)
    pkts = encode_sequence(frames, 64, 64, keyint=3)
    types = [p.frame_type for p in pkts]
    assert types[0] == FrameType.KEY
    assert types[3] == FrameType.KEY
    assert types[1] == FrameType.INTER and types[4] == FrameType.INTER


@pytest.mark.parametrize("dims", [(58, 38), (70, 46)])
def test_inter_odd_dims(dims):
    w, h = dims
    frames = _translating_content(w + 48, h + 48, 4)
    frames = [f[:h, :w].copy() for f in frames]
    encode_sequence(frames, w, h)


def test_inter_444():
    frames = _translating_content(64, 64, 3)
    encode_sequence(frames, 64, 64, cs=ChromaSampling.Cs444)


def test_inter_speed6_with_intra_fallback():
    # scene change mid-sequence forces intra blocks inside an inter frame
    rng = np.random.default_rng(2)
    a = _translating_content(96, 64, 2)
    b = np.repeat(np.repeat(rng.integers(0, 256, (8, 12)), 8, 0), 8, 1).astype(np.uint8)
    encode_sequence(a + [b], 96, 64, speed=6)


def test_nearmv_coded_and_decodes():
    """NEARMV must be selected when the search lands on a non-nearest stack
    candidate, and round-trip bit-exactly."""
    import numpy as np
    from unittest import mock

    from rav1e_tpu import Config, EncoderConfig, EncoderStatus
    from rav1e_tpu.context.writer import ContextWriter
    from rav1e_tpu.decoder import decode_packet
    from rav1e_tpu.partition import PredictionMode

    import rav1e_tpu.native_tile as native_tile

    modes = []
    orig = ContextWriter.write_inter_mode

    def spy(self, w, mode, ctx):
        modes.append(mode)
        return orig(self, w, mode, ctx)

    cfg = Config(
        enc=EncoderConfig(
            width=128, height=96, quantizer=120, low_latency=True,
            min_key_frame_interval=0, max_key_frame_interval=9999,
        )
    ).with_speed_preset(10)
    ctx = cfg.new_context()
    rng = np.random.default_rng(12)
    base = np.clip(np.cumsum(rng.integers(-4, 5, (96 * 2, 128 * 2)), axis=1) + 128, 0, 255)
    pkts = []
    # the spy hooks the Python symbol layer; the C++ path is parity-tested
    with mock.patch.object(ContextWriter, "write_inter_mode", spy), \
         mock.patch.object(native_tile, "encode_tile_native", lambda te: None):
        for i in range(5):
            f = ctx.new_frame()
            # mixed motion: top half pans, bottom half static
            for p in f.planes:
                ch, cw = p.cfg.height, p.cfg.width
                xs = (i * 6) >> p.cfg.xdec
                arr = base[:ch, xs : xs + cw].copy()
                arr[ch // 2 :, :] = base[ch // 2 : ch, :cw]
                p.copy_from(arr.astype(np.uint8))
            ctx.send_frame(f)
        ctx.flush()
        while True:
            try:
                pkts.append(ctx.receive_packet())
            except EncoderStatus.LimitReached:
                break
    state = None
    for pkt in pkts:
        dec, state = decode_packet(pkt.data, state)
        np.testing.assert_array_equal(
            dec.planes[0].as_array(), pkt.rec.planes[0].as_array()
        )
    assert PredictionMode.NEAR0MV in modes, set(modes)


def test_me_search_families_reach():
    """Hexagon/UMH/exhaustive full-pel families (me.rs:1055/:1170/:1464):
    UMH and exhaustive must escape a +37px local-optimum trap that diamond
    cannot, and the python fallback must mirror the native candidate walk."""
    import numpy as np

    from rav1e_tpu import native

    lib = native.get_lib()
    if lib is None:
        import pytest

        pytest.skip("native unavailable")
    rng = np.random.default_rng(0)
    H, W = 256, 256
    ref = rng.integers(0, 50, (H, W)).astype(np.uint8)
    patch = rng.integers(100, 256, (16, 16)).astype(np.uint8)
    ref[120:136, 157:173] = patch
    src = rng.integers(0, 50, (H, W)).astype(np.uint8)
    src[120:136, 120:136] = patch
    seeds = np.zeros(2, dtype=np.int32)
    out = np.zeros(2, dtype=np.int32)
    sads = {}
    try:
        for method in (0, 2, 3):
            lib.enc_me_set_method(method, 48)
            sads[method] = lib.enc_me_search(
                ref.ctypes.data, W, H, W, 1, 120, 120, src.ctypes.data, W,
                120, 120, 16, 16, 8, seeds.ctypes.data, 1, 64,
                out.ctypes.data,
            )
            if method >= 2:
                assert (out[0], out[1]) == (0, 37 * 8), (method, tuple(out))
    finally:
        lib.enc_me_set_method(0, 16)
    assert sads[2] == 0 and sads[3] == 0
    assert sads[0] > 0  # diamond alone is trapped
