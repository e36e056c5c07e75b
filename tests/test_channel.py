"""Channel API tests: serial channel parity with pull API, GOP-parallel
ordering and equivalence (reference api/test.rs channel tests)."""

import numpy as np

from rav1e_tpu import Config, EncoderConfig, EncoderStatus


def _frames(ctx_like, n, w, h, seed=5):
    rng = np.random.default_rng(seed)
    base = np.clip(np.cumsum(rng.integers(-4, 5, (h, w)), axis=1) + 128, 0, 255)
    out = []
    for i in range(n):
        f = ctx_like.new_frame()
        for p in f.planes:
            ch, cw = p.cfg.height, p.cfg.width
            noise = rng.integers(-5, 6, (ch, cw))
            f_arr = np.clip(base[:ch, :cw] + noise, 0, 255)
            p.copy_from(f_arr.astype(np.uint8))
        out.append(f)
    return out


def _cfg(w=64, h=64, kf=4, slots=0):
    c = Config(
        enc=EncoderConfig(
            width=w, height=h, quantizer=130, low_latency=True,
            min_key_frame_interval=kf, max_key_frame_interval=kf,
        )
    ).with_speed_preset(10)
    if slots:
        c = c.with_parallel_gops(slots)
    return c


def _pull_encode(cfg, frames):
    ctx = cfg.new_context()
    pkts = []
    for f in frames:
        ctx.send_frame(f)
        while True:
            try:
                pkts.append(ctx.receive_packet())
            except EncoderStatus.NeedMoreData:
                break
    ctx.flush()
    while True:
        try:
            pkts.append(ctx.receive_packet())
        except EncoderStatus.LimitReached:
            break
    return pkts


def test_serial_channel_matches_pull_api():
    cfg = _cfg()
    sender, receiver = cfg.new_channel()
    frames = _frames(sender, 6, 64, 64)
    for f in frames:
        sender.send(f)
    sender.close()
    chan_pkts = list(receiver)

    cfg2 = _cfg()
    ctx2 = cfg2.new_context()
    frames2 = _frames(ctx2, 6, 64, 64)
    pull_pkts = _pull_encode(cfg2, frames2)

    assert [p.input_frameno for p in chan_pkts] == [p.input_frameno for p in pull_pkts]
    assert [p.data for p in chan_pkts] == [p.data for p in pull_pkts]


def test_gop_parallel_ordering_and_decode():
    from rav1e_tpu.decoder import decode_packet

    cfg = _cfg(kf=4, slots=3)
    sender, receiver = cfg.new_channel()
    frames = _frames(sender, 11, 64, 64)  # 3 GOP chunks: 4+4+3
    for f in frames:
        sender.send(f)
    sender.close()
    pkts = list(receiver)
    assert [p.input_frameno for p in pkts] == list(range(11))
    # every chunk starts with a keyframe
    from rav1e_tpu.api.util import FrameType

    assert [i for i, p in enumerate(pkts) if p.frame_type == FrameType.KEY] == [0, 4, 8]
    state = None
    for pkt in pkts:
        dec, state = decode_packet(pkt.data, state)
        np.testing.assert_array_equal(
            dec.planes[0].as_array(), pkt.rec.planes[0].as_array()
        )
