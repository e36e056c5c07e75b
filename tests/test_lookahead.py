"""Temporal-RDO lookahead: cost grids, importance propagation, and the
end-to-end effect on the pyramid encode (reference api/lookahead.rs +
internal.rs:912-1259)."""

import numpy as np
import pytest

from rav1e_tpu.encoder import lookahead as la


def test_intra_costs_monotone_with_complexity():
    flat = np.full((32, 32), 100, np.uint8)
    noisy = (np.random.default_rng(0).integers(0, 256, (32, 32))).astype(np.uint8)
    assert la.estimate_intra_costs(noisy, 8).mean() > la.estimate_intra_costs(flat, 8).mean()


def test_lookahead_motion_finds_shift():
    # smooth ramp + texture: a well-behaved SAD landscape the diamond
    # search can descend (pure noise has misleading local minima)
    yy, xx = np.mgrid[0:64, 0:96]
    ref = ((yy * 2 + xx) % 256).astype(np.uint8)
    src = np.roll(ref, 4, axis=1)  # 4px right shift
    mvs, sad = la.lookahead_motion(src, ref, 8)
    assert tuple(mvs[1, 2]) == (0, -4)
    assert sad[1, 2] == 0


def test_propagation_accumulates_on_anchor():
    intra = np.full((4, 4), 100.0)
    inter = np.full((4, 4), 10.0)  # well-predicted: fraction 0.9
    mvs = np.zeros((2, 2, 2), np.int32)
    ref_imp = np.zeros((4, 4))
    la.propagate_importance(np.zeros((4, 4)), intra, inter, mvs, ref_imp)
    assert np.allclose(ref_imp, 90.0)  # (100+0) * (1 - 10/100)
    scales = la.importances_to_scales(ref_imp, intra)
    assert np.all(scales > 1.0) and np.all(scales <= 4.0)


def test_temporal_rdo_end_to_end_round_trip():
    from rav1e_tpu import Config, EncoderConfig, EncoderStatus
    from rav1e_tpu.decoder.decode import decode_packet

    def run(tempo):
        w, h = 128, 96
        cfg = Config(enc=EncoderConfig(
            width=w, height=h, quantizer=100, low_latency=False,
            min_key_frame_interval=0, max_key_frame_interval=9999))
        cfg.enc.speed_settings.temporal_rdo = tempo
        ctx = cfg.new_context()
        rng = np.random.default_rng(7)
        base = np.clip(np.cumsum(rng.integers(-3, 4, (h, w)), axis=1) + 128, 0, 255)
        for i in range(5):
            f = ctx.new_frame()
            f.planes[0].copy_from(np.roll(base, i * 2, axis=1).astype(np.uint8))
            for p in f.planes[1:]:
                p.copy_from(np.full((p.cfg.height, p.cfg.width), 128, np.uint8))
            ctx.send_frame(f)
        ctx.flush()
        pkts = []
        while True:
            try:
                pkts.append(ctx.receive_packet())
            except EncoderStatus.LimitReached:
                break
        return pkts

    pkts = run(True)
    st = None
    for p in pkts:  # importance-driven segmentation must stay decodable
        fr, st = decode_packet(p.data, st)
        if p.rec is not None and fr is not None:
            assert np.array_equal(
                np.asarray(fr.planes[0].as_array()),
                np.asarray(p.rec.planes[0].as_array()),
            )


def test_native_lookahead_kernels_bit_identical():
    """The C++ inter-cost / importance-propagation kernels must match the
    python loops bitwise (doubles included: fp-contract is disabled)."""
    from unittest import mock

    import rav1e_tpu.encoder.lookahead as la
    from rav1e_tpu import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    for dt, bd in ((np.uint8, 8), (np.uint16, 10)):
        src = rng.integers(0, 1 << bd, (200, 328)).astype(dt)
        ref = rng.integers(0, 1 << bd, (200, 328)).astype(dt)
        mvs = rng.integers(-20, 21, (13, 21, 2)).astype(np.int32)
        a = la.inter_costs_8x8(mvs, src, ref, bd)
        with mock.patch.object(native, "get_lib", lambda: None):
            b = la.inter_costs_8x8(mvs, src, ref, bd)
        np.testing.assert_array_equal(a, b)

    intra = rng.random((25, 41)) * 1000
    inter = rng.random((25, 41)) * 1000
    imp = rng.random((25, 41)) * 10
    mvs = rng.integers(-30, 31, (13, 21, 2)).astype(np.int32)
    r1 = np.zeros((25, 41))
    r2 = np.zeros((25, 41))
    la.propagate_importance(imp, intra, inter, mvs, r1)
    with mock.patch.object(native, "get_lib", lambda: None):
        la.propagate_importance(imp, intra, inter, mvs, r2)
    np.testing.assert_array_equal(r1, r2)
