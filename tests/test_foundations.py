"""Plane/Frame container and Config validation tests."""

import numpy as np
import pytest

from rav1e_tpu import ChromaSampling, Config, EncoderConfig, SpeedSettings
from rav1e_tpu.config import InvalidConfig
from rav1e_tpu.frame import Frame, Plane, SB_SIZE


def test_plane_padding_and_views():
    p = Plane.new(100, 60)
    arr = np.arange(100 * 60, dtype=np.uint8).reshape(60, 100) % 251
    p.copy_from(arr)
    assert np.array_equal(p.as_array(), arr)
    # edge replication
    assert np.array_equal(p.region(-4, 0, 1, 60).ravel(), arr[:, 0])
    assert np.array_equal(p.region(103, 0, 1, 60).ravel(), arr[:, 99])
    assert np.array_equal(p.region(0, -3, 100, 1).ravel(), arr[0])
    # superblock alignment of allocation
    vis = p.padded_visible()
    assert vis.shape[0] % SB_SIZE == 0 and vis.shape[1] % SB_SIZE == 0


def test_plane_downsample():
    p = Plane.new(64, 64)
    arr = np.zeros((64, 64), dtype=np.uint8)
    arr[:32] = 100
    arr[32:] = 200
    p.copy_from(arr)
    d = p.downsampled_2x()
    assert d.cfg.width == 32 and d.cfg.height == 32
    assert (d.as_array()[:16] == 100).all()
    assert (d.as_array()[16:] == 200).all()


def test_frame_chroma_shapes():
    f = Frame.new(101, 55, ChromaSampling.Cs420)
    assert len(f.planes) == 3
    assert f.planes[1].cfg.width == 51 and f.planes[1].cfg.height == 28
    f444 = Frame.new(101, 55, ChromaSampling.Cs444)
    assert f444.planes[1].cfg.width == 101
    fmono = Frame.new(101, 55, ChromaSampling.Cs400)
    assert len(fmono.planes) == 1


def test_speed_presets_monotone_knobs():
    s0 = SpeedSettings.from_preset(0)
    s6 = SpeedSettings.from_preset(6)
    s10 = SpeedSettings.from_preset(10)
    assert s0.rdo_lookahead_frames >= s6.rdo_lookahead_frames >= s10.rdo_lookahead_frames
    assert s0.transform.rdo_tx_decision and not s6.transform.rdo_tx_decision
    assert s10.partition.partition_range.min_log2 == 5


def test_config_validation():
    Config(enc=EncoderConfig(width=640, height=480)).validate()
    with pytest.raises(InvalidConfig):
        Config(enc=EncoderConfig(width=4)).validate()
    with pytest.raises(InvalidConfig):
        Config(enc=EncoderConfig(bit_depth=9)).validate()
    with pytest.raises(InvalidConfig):
        Config(enc=EncoderConfig(quantizer=300)).validate()
    with pytest.raises(InvalidConfig):
        Config(enc=EncoderConfig(tile_cols=3)).validate()


def test_config_builders():
    c = Config().with_speed_preset(8).with_threads(4).with_parallel_gops(2)
    assert c.enc.speed_settings.rdo_lookahead_frames == 10
    assert c.threads == 4 and c.parallel_gops == 2


def test_desync_finder_traces_match():
    """RAV1E_TPU_DEBUG symbol traces from encoder and decoder must align
    (the desync-finder debug aid, reference ec.rs desync_finder)."""
    import numpy as np

    from rav1e_tpu import Config, EncoderConfig, EncoderStatus
    from rav1e_tpu.decoder import decode_packet
    from rav1e_tpu.utils import desync

    desync.enable(True)
    desync.reset()
    try:
        cfg = Config(
            enc=EncoderConfig(
                width=64, height=64, quantizer=120, low_latency=True,
                min_key_frame_interval=0, max_key_frame_interval=9999,
            )
        ).with_speed_preset(10)
        ctx = cfg.new_context()
        rng = np.random.default_rng(6)
        f = ctx.new_frame()
        for p in f.planes:
            p.copy_from(rng.integers(0, 256, (p.cfg.height, p.cfg.width)).astype(np.uint8))
        ctx.send_frame(f)
        ctx.flush()
        pkt = ctx.receive_packet()
        decode_packet(pkt.data)
        enc_t, dec_t = desync.traces()
        assert len(enc_t) > 0 and len(enc_t) == len(dec_t)
        assert desync.compare_traces() is None
    finally:
        desync.enable(False)
        desync.reset()
