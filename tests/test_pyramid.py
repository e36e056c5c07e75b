"""B-pyramid reordering tests: group structure, SEF packets, decode parity,
backward-reference selection."""

import numpy as np
import pytest

from rav1e_tpu import Config, EncoderConfig, EncoderStatus
from rav1e_tpu.decoder import decode_packet
from rav1e_tpu.decoder.headers import parse_frame_header, parse_obus, parse_sequence_header


def _encode(n, w=96, h=64, q=120, low_latency=False, seed=2, shift_per_frame=2):
    cfg = Config(
        enc=EncoderConfig(
            width=w, height=h, quantizer=q, low_latency=low_latency,
            min_key_frame_interval=0, max_key_frame_interval=9999,
        )
    ).with_speed_preset(10)
    cfg.enc.speed_settings.scene_detection_mode = type(
        cfg.enc.speed_settings.scene_detection_mode
    )(0)  # NoDetection: keyframes only at 0
    ctx = cfg.new_context()
    rng = np.random.default_rng(seed)
    base = np.clip(np.cumsum(rng.integers(-4, 5, (h, w * 2)), axis=1) + 128, 0, 255)
    for i in range(n):
        f = ctx.new_frame()
        for p in f.planes:
            ch, cw = p.cfg.height, p.cfg.width
            xs = (i * shift_per_frame) >> p.cfg.xdec
            p.copy_from(base[:ch, xs : xs + cw].astype(np.uint8))
        ctx.send_frame(f)
    ctx.flush()
    pkts = []
    while True:
        try:
            pkts.append(ctx.receive_packet())
        except EncoderStatus.LimitReached:
            break
        except EncoderStatus.NeedMoreData:
            pytest.fail("NeedMoreData after flush")
    return pkts


def _headers(pkt):
    seq = fh = None
    for t, payload in parse_obus(pkt.data):
        if t == 1:
            seq = parse_sequence_header(payload)
        elif t == 3:
            fh = parse_frame_header(payload, _headers.seq or seq, _headers.hints)
            if seq is not None:
                _headers.seq = seq
            if not fh.show_existing_frame:
                for i in range(8):
                    if (fh.refresh_frame_flags >> i) & 1:
                        _headers.hints[i] = fh.order_hint
    return fh


_headers.seq = None
_headers.hints = [0] * 8


def test_group_structure_and_display_order():
    _headers.seq = None
    _headers.hints = [0] * 8
    pkts = _encode(9)  # key + two full groups
    assert len(pkts) == 1 + 6 + 6
    # coding order input framenos per the reference layout (internal.rs:63-77)
    got = [p.input_frameno for p in pkts]
    assert got == [0, 4, 2, 1, 2, 3, 4, 8, 6, 5, 6, 7, 8], got

    # shown packets appear in display order
    shown = []
    for pkt in pkts:
        fh = _headers(pkt)
        if fh.show_existing_frame or fh.show_frame:
            shown.append(pkt.input_frameno)
    assert shown == list(range(9)), shown


def test_pyramid_decode_parity():
    _headers.seq = None
    _headers.hints = [0] * 8
    pkts = _encode(9)
    state = None
    for i, pkt in enumerate(pkts):
        dec, state = decode_packet(pkt.data, state)
        for pl in range(3):
            np.testing.assert_array_equal(
                dec.planes[pl].as_array(), pkt.rec.planes[pl].as_array(),
                err_msg=f"packet {i} (input {pkt.input_frameno}) plane {pl}",
            )


def test_pyramid_partial_tail_fallback():
    _headers.seq = None
    _headers.hints = [0] * 8
    pkts = _encode(7)  # key + one group (1-4) + P,P tail (5,6)
    got = [p.input_frameno for p in pkts]
    assert got == [0, 4, 2, 1, 2, 3, 4, 5, 6], got
    state = None
    for pkt in pkts:
        dec, state = decode_packet(pkt.data, state)
        np.testing.assert_array_equal(
            dec.planes[0].as_array(), pkt.rec.planes[0].as_array()
        )


def test_backward_refs_used():
    """On translating content, B frames should pick the backward ref for some
    blocks (ALTREF coded in the bitstream) — detected via the writer.
    (The spy hooks the Python symbol layer, so the Python tile path is
    forced; the C++ coder's equivalence is covered by test_native_tile.)"""
    from unittest import mock

    import rav1e_tpu.native_tile as native_tile
    from rav1e_tpu.context.writer import ContextWriter

    refs_used = []
    orig = ContextWriter.write_ref_frames_single

    def spy(self, w, x, y, ref_frame, counts):
        refs_used.append(ref_frame)
        return orig(self, w, x, y, ref_frame, counts)

    with mock.patch.object(ContextWriter, "write_ref_frames_single", spy), \
         mock.patch.object(native_tile, "encode_tile_native", lambda te: None):
        _encode(9, w=128, h=96, shift_per_frame=3)
    assert 7 in refs_used, f"ALTREF never chosen: {set(refs_used)}"
    assert 1 in refs_used


def test_pyramid_beats_low_latency_rate():
    """With static-ish content the pyramid should not produce larger streams
    than low-latency at the same quantizer."""
    _headers.seq = None
    a = sum(len(p.data) for p in _encode(9, low_latency=False, shift_per_frame=1))
    b = sum(len(p.data) for p in _encode(9, low_latency=True, shift_per_frame=1))
    assert a <= b * 1.1, (a, b)


def test_compound_prediction_used_and_decodes():
    """B frames must select compound (LAST+ALTREF averaged) blocks on noisy
    motion content, and the stream must round-trip bit-exactly."""
    from unittest import mock

    import rav1e_tpu.native_tile as native_tile
    from rav1e_tpu.context.writer import ContextWriter
    from rav1e_tpu.decoder import decode_packet

    comp = []
    orig = ContextWriter.write_compound_mode

    def spy(self, w, mode, ctx):
        comp.append(mode)
        return orig(self, w, mode, ctx)

    cfg = Config(
        enc=EncoderConfig(
            width=128, height=96, quantizer=110, low_latency=False,
            min_key_frame_interval=0, max_key_frame_interval=9999,
        )
    ).with_speed_preset(10)
    ctx = cfg.new_context()
    rng = np.random.default_rng(10)
    base = np.clip(np.cumsum(rng.integers(-4, 5, (96 * 2, 128 * 3)), axis=1) + 128, 0, 255)
    pkts = []
    with mock.patch.object(ContextWriter, "write_compound_mode", spy), \
         mock.patch.object(native_tile, "encode_tile_native", lambda te: None):
        for i in range(9):
            f = ctx.new_frame()
            for p in f.planes:
                ch, cw = p.cfg.height, p.cfg.width
                xs = (i * 4) >> p.cfg.xdec
                arr = np.clip(base[:ch, xs : xs + cw] + rng.integers(-2, 3, (ch, cw)), 0, 255)
                p.copy_from(arr.astype(np.uint8))
            ctx.send_frame(f)
        ctx.flush()
        while True:
            try:
                pkts.append(ctx.receive_packet())
            except EncoderStatus.LimitReached:
                break
    assert comp, "compound never selected"
    state = None
    for i, pkt in enumerate(pkts):
        dec, state = decode_packet(pkt.data, state)
        for pl in range(3):
            np.testing.assert_array_equal(
                dec.planes[pl].as_array(), pkt.rec.planes[pl].as_array(),
                err_msg=f"packet {i} plane {pl}",
            )


def test_compound_near_near_roundtrip():
    """NEAR_NEARMV: steer the compound decision to the stack[1] pair so the
    NEAR_NEAR + DRL symbol path is exercised, then require bit-exact decode."""
    from unittest import mock

    import rav1e_tpu.native_tile as native_tile
    from rav1e_tpu.context.writer import ContextWriter
    from rav1e_tpu.decoder import decode_packet
    from rav1e_tpu.encoder.pipeline import TileEncoder
    from rav1e_tpu.partition import PredictionMode

    comp = []
    orig_wcm = ContextWriter.write_compound_mode

    def spy(self, w, mode, ctx):
        comp.append(mode)
        return orig_wcm(self, w, mode, ctx)

    orig_sel = TileEncoder.select_inter

    def steer(self, x, y, bsize):
        r = orig_sel(self, x, y, bsize)
        if r is None or not isinstance(r[0], tuple):
            return r
        ref_type, ref_objs, mvs, stack, mode_ctx = r
        if len(stack) > 1:
            mvs = (tuple(stack[1].this_mv), tuple(stack[1].comp_mv))
        return ref_type, ref_objs, mvs, stack, mode_ctx

    cfg = Config(
        enc=EncoderConfig(
            width=128, height=96, quantizer=110, low_latency=False,
            min_key_frame_interval=0, max_key_frame_interval=9999,
        )
    ).with_speed_preset(10)
    ctx = cfg.new_context()
    rng = np.random.default_rng(10)
    base = np.clip(np.cumsum(rng.integers(-4, 5, (96 * 2, 128 * 3)), axis=1) + 128, 0, 255)
    pkts = []
    with mock.patch.object(ContextWriter, "write_compound_mode", spy), \
         mock.patch.object(TileEncoder, "select_inter", steer), \
         mock.patch.object(native_tile, "encode_tile_native", lambda te: None):
        for i in range(9):
            f = ctx.new_frame()
            for p in f.planes:
                ch, cw = p.cfg.height, p.cfg.width
                xs = (i * 4) >> p.cfg.xdec
                arr = np.clip(base[:ch, xs : xs + cw] + rng.integers(-2, 3, (ch, cw)), 0, 255)
                p.copy_from(arr.astype(np.uint8))
            ctx.send_frame(f)
        ctx.flush()
        while True:
            try:
                pkts.append(ctx.receive_packet())
            except EncoderStatus.LimitReached:
                break
    assert PredictionMode.NEAR_NEAR0MV in comp, set(comp)
    state = None
    for i, pkt in enumerate(pkts):
        dec, state = decode_packet(pkt.data, state)
        for pl in range(3):
            np.testing.assert_array_equal(
                dec.planes[pl].as_array(), pkt.rec.planes[pl].as_array(),
                err_msg=f"packet {i} plane {pl}",
            )


def test_switch_frames():
    """S-frames at switch_frame_interval (low-latency): full refresh,
    implied error resilience, explicit frame size, decode parity."""
    from rav1e_tpu.api.util import FrameType
    from rav1e_tpu.decoder import decode_packet

    cfg = Config(
        enc=EncoderConfig(
            width=96, height=64, quantizer=120, low_latency=True,
            min_key_frame_interval=0, max_key_frame_interval=9999,
            switch_frame_interval=3,
        )
    ).with_speed_preset(10)
    ctx = cfg.new_context()
    rng = np.random.default_rng(2)
    base = np.clip(np.cumsum(rng.integers(-4, 5, (64, 140)), axis=1) + 128, 0, 255)
    pkts = []
    for i in range(8):
        f = ctx.new_frame()
        for p in f.planes:
            ch, cw = p.cfg.height, p.cfg.width
            xs = (i * 2) >> p.cfg.xdec
            p.copy_from(base[:ch, xs : xs + cw].astype(np.uint8))
        ctx.send_frame(f)
    ctx.flush()
    while True:
        try:
            pkts.append(ctx.receive_packet())
        except EncoderStatus.LimitReached:
            break
    types = [p.frame_type for p in pkts]
    assert types.count(FrameType.SWITCH) == 2, types
    state = None
    for i, pkt in enumerate(pkts):
        dec, state = decode_packet(pkt.data, state)
        for pl in range(3):
            np.testing.assert_array_equal(
                dec.planes[pl].as_array(), pkt.rec.planes[pl].as_array(),
                err_msg=f"packet {i} plane {pl}",
            )


def test_scene_flash_suppression():
    """A flash frame (A A F A A) must not leave keyframes on the flash or
    the return frame (av-scenechange flash suppression behavior)."""
    from rav1e_tpu import SpeedSettings
    from rav1e_tpu.api.util import FrameType
    from rav1e_tpu.config.speed import SceneDetectionSpeed

    rng = np.random.default_rng(0)
    A = np.repeat(np.repeat(rng.integers(0, 256, (8, 12)), 8, 0), 8, 1)
    F = 255 - A
    for mode in (SceneDetectionSpeed.Fast, SceneDetectionSpeed.Standard):
        ss = SpeedSettings.from_preset(6)
        ss.scene_detection_mode = mode
        cfg = Config(
            enc=EncoderConfig(
                width=96, height=64, quantizer=110, low_latency=True,
                speed_settings=ss, min_key_frame_interval=0,
                max_key_frame_interval=99,
            )
        )
        ctx = cfg.new_context()
        for arr in [A, A, F, A, A, A]:
            f = ctx.new_frame()
            for i, p in enumerate(f.planes):
                a = arr if i == 0 else np.full((p.cfg.height, p.cfg.width), 128)
                p.copy_from(a[: p.cfg.height, : p.cfg.width].astype(np.uint8))
            ctx.send_frame(f)
        ctx.flush()
        types = []
        while True:
            try:
                types.append(ctx.receive_packet().frame_type)
            except EncoderStatus.LimitReached:
                break
        assert types[2] != FrameType.KEY, types
        assert types[3] != FrameType.KEY, types


def test_skip_mode_blocks():
    """Static B-frame content must code some blocks via skip-mode syntax
    (spec 5.9.22/7.8: compound NEAREST on the derived ref pair, no residual,
    no mode/ref syntax) and round-trip bit-exactly."""
    from unittest import mock

    import rav1e_tpu.native_tile as native_tile
    from rav1e_tpu.context.writer import ContextWriter
    from rav1e_tpu.decoder import decode_packet

    sm = []
    orig = ContextWriter.write_skip_mode

    def spy(self, w, x, y, flag):
        sm.append(flag)
        return orig(self, w, x, y, flag)

    cfg = Config(
        enc=EncoderConfig(
            width=128, height=96, quantizer=110, low_latency=False,
            min_key_frame_interval=0, max_key_frame_interval=9999,
        )
    ).with_speed_preset(10)
    ctx = cfg.new_context()
    rng = np.random.default_rng(0)
    base = np.clip(np.cumsum(rng.integers(-4, 5, (96, 128 * 2)), axis=1) + 128, 0, 255)
    pkts = []
    with mock.patch.object(ContextWriter, "write_skip_mode", spy), \
         mock.patch.object(native_tile, "encode_tile_native", lambda te: None):
        for i in range(9):
            f = ctx.new_frame()
            for p in f.planes:
                ch, cw = p.cfg.height, p.cfg.width
                p.copy_from(base[:ch, :cw].astype(np.uint8))
            ctx.send_frame(f)
        ctx.flush()
        while True:
            try:
                pkts.append(ctx.receive_packet())
            except EncoderStatus.LimitReached:
                break
    assert sum(sm) > 0, "skip mode never used on static B content"
    state = None
    for i, pkt in enumerate(pkts):
        dec, state = decode_packet(pkt.data, state)
        for pl in range(3):
            np.testing.assert_array_equal(
                dec.planes[pl].as_array(), pkt.rec.planes[pl].as_array(),
                err_msg=f"packet {i} plane {pl}",
            )


def test_compound_mixed_modes_roundtrip():
    """NEAREST_NEWMV / NEW_NEARESTMV: steer the compound decision so exactly
    one side matches the NEAREST pair (the reference's one-side remap,
    encoder.rs:3053-3067); both modes must be coded and decode bit-exactly."""
    from unittest import mock

    import rav1e_tpu.native_tile as native_tile
    from rav1e_tpu.context.writer import ContextWriter
    from rav1e_tpu.decoder import decode_packet
    from rav1e_tpu.encoder.pipeline import TileEncoder
    from rav1e_tpu.partition import PredictionMode

    comp = []
    orig_wcm = ContextWriter.write_compound_mode

    def spy(self, w, mode, ctx):
        comp.append(mode)
        return orig_wcm(self, w, mode, ctx)

    orig_sel = TileEncoder.select_inter
    flip = [0]

    def steer(self, x, y, bsize):
        r = orig_sel(self, x, y, bsize)
        if r is None or not isinstance(r[0], tuple):
            return r
        ref_type, ref_objs, mvs, stack, mode_ctx = r
        if stack:
            n0 = tuple(stack[0].this_mv)
            n1 = tuple(stack[0].comp_mv)
            if flip[0] % 2 == 0:
                mvs = (n0, (n1[0] + 8, n1[1]))  # NEAREST_NEWMV
            else:
                mvs = ((n0[0], n0[1] + 8), n1)  # NEW_NEARESTMV
            flip[0] += 1
        return ref_type, ref_objs, mvs, stack, mode_ctx

    cfg = Config(
        enc=EncoderConfig(
            width=128, height=96, quantizer=110, low_latency=False,
            min_key_frame_interval=0, max_key_frame_interval=9999,
        )
    ).with_speed_preset(10)
    ctx = cfg.new_context()
    rng = np.random.default_rng(10)
    base = np.clip(np.cumsum(rng.integers(-4, 5, (96 * 2, 128 * 3)), axis=1) + 128, 0, 255)
    pkts = []
    with mock.patch.object(ContextWriter, "write_compound_mode", spy), \
         mock.patch.object(TileEncoder, "select_inter", steer), \
         mock.patch.object(native_tile, "encode_tile_native", lambda te: None):
        for i in range(9):
            f = ctx.new_frame()
            for p in f.planes:
                ch, cw = p.cfg.height, p.cfg.width
                xs = (i * 4) >> p.cfg.xdec
                arr = np.clip(base[:ch, xs : xs + cw] + rng.integers(-2, 3, (ch, cw)), 0, 255)
                p.copy_from(arr.astype(np.uint8))
            ctx.send_frame(f)
        ctx.flush()
        while True:
            try:
                pkts.append(ctx.receive_packet())
            except EncoderStatus.LimitReached:
                break
    assert PredictionMode.NEAREST_NEWMV in comp, set(comp)
    assert PredictionMode.NEW_NEARESTMV in comp, set(comp)
    state = None
    for i, pkt in enumerate(pkts):
        dec, state = decode_packet(pkt.data, state)
        for pl in range(3):
            np.testing.assert_array_equal(
                dec.planes[pl].as_array(), pkt.rec.planes[pl].as_array(),
                err_msg=f"packet {i} plane {pl}",
            )


def test_bwdref_far_anchor_used_and_decodes():
    """The first level-2 frame of each group gets the far GOP anchor as a
    third single-prediction reference (BWDREF; reference rdo.rs:1138-1155
    multi-ref loop).  On translating content some block must code BWDREF,
    and the stream must round-trip bit-exactly (native path included)."""
    from unittest import mock

    import rav1e_tpu.native_tile as native_tile
    from rav1e_tpu.context.mv import BWDREF_FRAME
    from rav1e_tpu.context.writer import ContextWriter
    from rav1e_tpu.decoder import decode_packet

    refs_used = []
    orig = ContextWriter.write_ref_frames_single

    def spy(self, w, x, y, ref_frame, counts):
        refs_used.append(ref_frame)
        return orig(self, w, x, y, ref_frame, counts)

    # python-coder run with the spy proves BWDREF is selected; the
    # native run must produce the identical bitstream
    def run(native_on):
        cfg = Config(
            enc=EncoderConfig(
                width=96, height=64, quantizer=120, low_latency=False,
                min_key_frame_interval=0, max_key_frame_interval=9999,
            )
        ).with_speed_preset(10)
        cfg.enc.speed_settings.scene_detection_mode = type(
            cfg.enc.speed_settings.scene_detection_mode
        )(0)
        # speed 10 disables multiref (reference speedsettings.rs:163);
        # force it on to exercise the third-reference path cheaply
        cfg.enc.speed_settings.multiref = True
        ctx = cfg.new_context()
        rng = np.random.default_rng(2)
        base = np.clip(
            np.cumsum(rng.integers(-4, 5, (64, 96 * 2)), axis=1) + 128, 0, 255
        )
        mgrs = [mock.patch.object(ContextWriter, "write_ref_frames_single", spy)]
        if not native_on:
            mgrs.append(
                mock.patch.object(native_tile, "encode_tile_native", lambda te: None)
            )
        from contextlib import ExitStack

        pkts = []
        with ExitStack() as st:
            for m in mgrs:
                st.enter_context(m)
            for i in range(9):
                f = ctx.new_frame()
                for p in f.planes:
                    ch, cw = p.cfg.height, p.cfg.width
                    xs = (i * 2) >> p.cfg.xdec
                    p.copy_from(base[:ch, xs : xs + cw].astype(np.uint8))
                ctx.send_frame(f)
            ctx.flush()
            while True:
                try:
                    pkts.append(ctx.receive_packet())
                except EncoderStatus.LimitReached:
                    break
        return pkts

    pkts_py = run(False)
    assert BWDREF_FRAME in refs_used, set(refs_used)
    pkts_nat = run(True)
    assert b"".join(p.data for p in pkts_py) == b"".join(
        p.data for p in pkts_nat
    ), "python/native bitstream divergence with BWDREF"
    state = None
    for i, pkt in enumerate(pkts_nat):
        dec, state = decode_packet(pkt.data, state)
        for pl in range(3):
            np.testing.assert_array_equal(
                dec.planes[pl].as_array(), pkt.rec.planes[pl].as_array(),
                err_msg=f"packet {i} plane {pl}",
            )
