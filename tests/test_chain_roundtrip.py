"""Device-chain round trips: the whole inter recon path runs on the
device (device/chain.py) and the host replay coder emits the stream; the
decoder must reproduce the device reconstruction bit-exactly (the chain's
conformance gate, reference src/test_encode_decode/ semantics)."""

import numpy as np
import pytest

from rav1e_tpu import Config, EncoderConfig, EncoderStatus
from rav1e_tpu.decoder import decode_packet


def run_chain_roundtrip(w, h, q=120, speed=6, nframes=6, low_latency=False,
                        seed=7):
    cfg = Config(
        enc=EncoderConfig(
            width=w, height=h, quantizer=q, low_latency=low_latency,
            min_key_frame_interval=0, max_key_frame_interval=9999,
        )
    ).with_speed_preset(speed)
    ctx = cfg.new_context()
    rng = np.random.default_rng(seed)
    base = {}
    for t in range(nframes):
        f = ctx.new_frame()
        for i, p in enumerate(f.planes):
            ch, cw = p.cfg.height, p.cfg.width
            if i not in base:
                coarse = rng.integers(
                    0, 256, ((ch + 7) // 8 + 2, (cw + 7) // 8 + 4))
                base[i] = np.repeat(
                    np.repeat(coarse, 8, axis=0), 8, axis=1
                ).astype(np.float64)
            arr = base[i][:ch, t * 2 : t * 2 + cw]
            noise = rng.integers(-2, 3, (ch, cw))
            p.copy_from(np.clip(arr + noise, 0, 255).astype(np.uint8))
        ctx.send_frame(f)
    ctx.flush()
    seq = None
    inter = 0
    while True:
        try:
            pkt = ctx.receive_packet()
        except EncoderStatus.LimitReached:
            break
        dec, seq = decode_packet(pkt.data, seq)
        if dec is None:
            continue
        if len(pkt.data) > 100 and pkt.frame_type.name != "KEY":
            inter += 1
        for pi, (ep, dp) in enumerate(zip(pkt.rec.planes, dec.planes)):
            a, b = ep.as_array(), dp.as_array()
            assert np.array_equal(a, b), (
                f"frame {pkt.input_frameno} plane {pi}: "
                f"{np.sum(a != b)} px, max "
                f"{np.abs(a.astype(int) - b.astype(int)).max()}"
            )
    assert inter > 0
    # the chain actually ran: it committed device refs into its slots
    assert any(s is not None for s in ctx.pipeline._chain_slots)


def test_chain_pyramid_roundtrip():
    run_chain_roundtrip(128, 96)


def test_chain_low_latency_roundtrip():
    run_chain_roundtrip(128, 96, low_latency=True, nframes=4)


def test_chain_ragged_dims_roundtrip():
    # mi extent not a superblock multiple: must_split chains + edge blocks
    run_chain_roundtrip(136, 88, nframes=4)


def test_chain_tx_split_roundtrip():
    # speed 9: enable_inter_tx_split + restricted partition range
    run_chain_roundtrip(128, 96, speed=9, nframes=4)


def test_chain_high_q_roundtrip():
    run_chain_roundtrip(128, 96, q=40, nframes=3)
