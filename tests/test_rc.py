"""Rate control tests: bitrate convergence, reservoir, two-pass plumbing."""

import numpy as np
import pytest

from rav1e_tpu import Config, EncoderConfig, EncoderStatus
from rav1e_tpu.config.encoder import Rational


def encode_n(cfg, n, seed=0, content="noise"):
    ctx = cfg.new_context()
    rng = np.random.default_rng(seed)
    pkts = []
    for i in range(n):
        f = ctx.new_frame()
        for p in f.planes:
            ch, cw = p.cfg.height, p.cfg.width
            if content == "noise":
                coarse = rng.integers(0, 256, ((ch + 7) // 8, (cw + 7) // 8))
                arr = np.repeat(np.repeat(coarse, 8, 0), 8, 1)[:ch, :cw]
            else:
                arr = np.full((ch, cw), 100 + i)
            p.copy_from(arr.astype(np.uint8))
        ctx.send_frame(f)
    ctx.flush()
    while True:
        try:
            pkts.append(ctx.receive_packet())
        except EncoderStatus.LimitReached:
            break
    return ctx, pkts


def test_bitrate_mode_converges():
    target_bps = 400_000
    fps = 30
    cfg = Config(
        enc=EncoderConfig(
            width=128, height=128, bitrate=target_bps, quantizer=100,
            time_base=Rational(1, fps),
            min_key_frame_interval=0, max_key_frame_interval=9999,
            low_latency=True,
        )
    ).with_speed_preset(10)
    _, pkts = encode_n(cfg, 20)
    total_bits = sum(len(p.data) * 8 for p in pkts)
    achieved_bps = total_bits * fps / len(pkts)
    # within a factor ~2 after a short adaptation run
    assert 0.4 * target_bps < achieved_bps < 2.2 * target_bps, achieved_bps
    # qp must vary (controller active)
    assert len({p.qp for p in pkts}) > 1


def test_cq_mode_fixed_q():
    cfg = Config(
        enc=EncoderConfig(
            width=64, height=64, quantizer=120,
            min_key_frame_interval=0, max_key_frame_interval=9999, low_latency=True,
        )
    ).with_speed_preset(10)
    _, pkts = encode_n(cfg, 4)
    assert len({p.qp for p in pkts}) == 1


def test_twopass_roundtrip():
    cfg = Config(
        enc=EncoderConfig(
            width=64, height=64, bitrate=200_000, quantizer=100,
            min_key_frame_interval=0, max_key_frame_interval=9999, low_latency=True,
        )
    ).with_speed_preset(10)
    ctx, pkts = encode_n(cfg, 6)
    data = ctx.twopass_out()
    assert data is not None and len(data) > 12

    cfg2 = Config(
        enc=EncoderConfig(
            width=64, height=64, bitrate=200_000, quantizer=100,
            min_key_frame_interval=0, max_key_frame_interval=9999, low_latency=True,
        )
    ).with_speed_preset(10)
    ctx2 = cfg2.new_context()
    assert ctx2.twopass_in(data) == len(pkts)
    # corrupt data rejected
    with pytest.raises(ValueError):
        ctx2.twopass_in(b"\x00" * 16)
