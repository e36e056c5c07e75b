"""Segmentation tests: activation on mixed content, header round-trip,
per-segment quantizer effect, decode parity."""

import numpy as np

from rav1e_tpu import Config, EncoderConfig, EncoderStatus
from rav1e_tpu.decoder import decode_packet
from rav1e_tpu.decoder.headers import parse_frame_header, parse_obus, parse_sequence_header


def _mixed_frame(w, h, seed=7):
    rng = np.random.default_rng(seed)
    base = np.clip(np.cumsum(rng.integers(-1, 2, (h, w)), axis=1) + 128, 0, 255)
    base[: h // 2, w // 2 :] = rng.integers(0, 256, (h // 2, w - w // 2))  # busy
    return base


def _encode(w=128, h=128, q=120, n=2, seg=True):
    cfg = Config(
        enc=EncoderConfig(
            width=w, height=h, quantizer=q, low_latency=True,
            min_key_frame_interval=0, max_key_frame_interval=9999,
        )
    ).with_speed_preset(10)
    if not seg:
        from rav1e_tpu.config.speed import SegmentationLevel

        cfg.enc.speed_settings.segmentation = SegmentationLevel.Disabled
    ctx = cfg.new_context()
    base = _mixed_frame(w, h)
    rng = np.random.default_rng(1)
    for i in range(n):
        f = ctx.new_frame()
        for p in f.planes:
            ch, cw = p.cfg.height, p.cfg.width
            noise = rng.integers(-3, 4, (ch, cw))
            p.copy_from(np.clip(base[:ch, :cw] + noise, 0, 255).astype(np.uint8))
        ctx.send_frame(f)
    ctx.flush()
    pkts = []
    while True:
        try:
            pkts.append(ctx.receive_packet())
        except EncoderStatus.LimitReached:
            break
    return pkts


def test_segmentation_enabled_and_roundtrip():
    pkts = _encode()
    seq = None
    seg_frames = 0
    for pkt in pkts:
        for t, payload in parse_obus(pkt.data):
            if t == 1:
                seq = parse_sequence_header(payload)
            elif t == 3:
                fh = parse_frame_header(payload, seq)
                if fh.enable_segmentation:
                    seg_frames += 1
                    deltas = [
                        fh.segmentation_data[i][0]
                        for i in range(8)
                        if fh.segmentation_features[i][0]
                    ]
                    assert len(deltas) >= 2
                    assert max(deltas) > min(deltas)
    assert seg_frames == len(pkts), "segmentation not active on mixed content"

    state = None
    for i, pkt in enumerate(pkts):
        dec, state = decode_packet(pkt.data, state)
        for pl in range(3):
            np.testing.assert_array_equal(
                dec.planes[pl].as_array(), pkt.rec.planes[pl].as_array(),
                err_msg=f"packet {i} plane {pl}",
            )


def test_segmentation_improves_rd():
    """Masking-aware q should spend fewer bits on the busy half without
    hurting the smooth half; compare against segmentation off."""

    def smooth_psnr(pkt, base):
        rec = pkt.rec.planes[0].as_array().astype(float)
        sm = base[:, : 128 // 2].astype(float)
        mse = np.mean((rec[:, : 128 // 2] - sm) ** 2)
        return 10 * np.log10(255 ** 2 / max(mse, 1e-3))

    base = _mixed_frame(128, 128)
    on = _encode(seg=True, n=1)
    off = _encode(seg=False, n=1)
    size_on = sum(len(p.data) for p in on)
    size_off = sum(len(p.data) for p in off)
    # smooth-region quality must not degrade by more than noise while the
    # busy region absorbs the rate cut
    assert smooth_psnr(on[0], base) >= smooth_psnr(off[0], base) - 0.3
    assert size_on < size_off * 1.02


def test_tune_psychovisual_round_trips_and_differs():
    """Tune::Psychovisual plumbing (activity -> distortion scales,
    reference activity.rs + rdo.rs distortion_scale_for): the stream stays
    decodable and the tune changes the encode on mixed-activity content."""
    import numpy as np

    from rav1e_tpu import Config, EncoderConfig, EncoderStatus, Tune
    from rav1e_tpu.decoder import decode_packet

    def enc(tune):
        cfg = Config(
            enc=EncoderConfig(
                width=128, height=96, quantizer=130, tune=tune,
                low_latency=False, min_key_frame_interval=0,
                max_key_frame_interval=99,
            )
        )
        ctx = cfg.new_context()
        rng = np.random.default_rng(21)
        base = np.full((96, 128), 80, np.int64)
        base[:, 64:] = rng.integers(0, 256, (96, 64))  # flat | busy halves
        data = b""
        for t in range(3):
            f = ctx.new_frame()
            for i, p in enumerate(f.planes):
                ch, cw = p.cfg.height, p.cfg.width
                arr = np.roll(base, t, axis=1)[:ch, :cw] + rng.integers(
                    -2, 3, (ch, cw)
                )
                p.copy_from(np.clip(arr, 0, 255).astype(np.uint8))
            ctx.send_frame(f)
        ctx.flush()
        state = None
        while True:
            try:
                pkt = ctx.receive_packet()
            except EncoderStatus.LimitReached:
                break
            dec, state = decode_packet(pkt.data, state)
            if pkt.rec is not None:
                for pi, dp in enumerate(dec.planes):
                    a = dp.as_array()
                    b = pkt.rec.planes[pi].as_array()
                    assert np.array_equal(a, b[: a.shape[0], : a.shape[1]])
            data += pkt.data
        return data

    d_psnr = enc(Tune.Psnr)
    d_psy = enc(Tune.Psychovisual)
    assert len(d_psy) > 0
    assert d_psnr != d_psy  # the tune must actually steer decisions
