"""Encode -> decode round-trip: the core integration gate.

Modeled on the reference's src/test_encode_decode/ (dav1d round-trip matrix:
speeds, dimensions, quantizers, bit depths, chroma samplings) but using the
bundled verification decoder, since no external AV1 decoder exists in this
environment.  Every case requires the decoder reconstruction to match the
encoder reconstruction bit-exactly on all planes.
"""

import numpy as np
import pytest

from rav1e_tpu import ChromaSampling, Config, EncoderConfig, EncoderStatus
from rav1e_tpu.decoder import decode_packet


def run_roundtrip(w, h, q=100, cs=ChromaSampling.Cs420, bd=8, speed=10, nframes=1, seed=0,
                  tiles=0):
    cfg = Config(
        enc=EncoderConfig(
            width=w,
            height=h,
            quantizer=q,
            chroma_sampling=cs,
            bit_depth=bd,
            min_key_frame_interval=0,
            max_key_frame_interval=1,
            tile_cols=tiles,
            tile_rows=tiles,
        )
    ).with_speed_preset(speed)
    ctx = cfg.new_context()
    rng = np.random.default_rng(seed)
    dtype = np.uint8 if bd == 8 else np.uint16
    maxval = (1 << bd) - 1
    for _ in range(nframes):
        f = ctx.new_frame()
        for p in f.planes:
            # piecewise-smooth random content (realistic for transforms)
            ch, cw = p.cfg.height, p.cfg.width
            coarse = rng.integers(0, maxval + 1, ((ch + 7) // 8, (cw + 7) // 8))
            arr = np.repeat(np.repeat(coarse, 8, axis=0), 8, axis=1)[:ch, :cw]
            noise = rng.integers(-8, 9, (ch, cw))
            p.copy_from(np.clip(arr + noise, 0, maxval).astype(dtype))
        ctx.send_frame(f)
    ctx.flush()
    packets = []
    seq = None
    while True:
        try:
            pkt = ctx.receive_packet()
        except EncoderStatus.LimitReached:
            break
        packets.append(pkt)
        dec, seq = decode_packet(pkt.data, seq)
        for pi, (ep, dp) in enumerate(zip(pkt.rec.planes, dec.planes)):
            enc_rec = ep.as_array()
            dec_rec = dp.as_array()
            assert np.array_equal(enc_rec, dec_rec), (
                f"plane {pi} mismatch: {np.sum(enc_rec != dec_rec)} pixels, "
                f"max {np.abs(enc_rec.astype(int) - dec_rec.astype(int)).max()}"
            )
    assert packets
    return packets


@pytest.mark.parametrize("dims", [(64, 64), (128, 128), (64, 80), (96, 64)])
def test_roundtrip_dims(dims):
    run_roundtrip(*dims)


@pytest.mark.parametrize("dims", [(58, 38), (35, 35), (16, 16), (70, 46)])
def test_roundtrip_odd_dims(dims):
    run_roundtrip(*dims)


@pytest.mark.parametrize("q", [20, 60, 120, 220])
def test_roundtrip_quantizers(q):
    run_roundtrip(64, 64, q=q)


@pytest.mark.parametrize(
    "cs", [ChromaSampling.Cs420, ChromaSampling.Cs422, ChromaSampling.Cs444, ChromaSampling.Cs400]
)
def test_roundtrip_chroma_samplings(cs):
    run_roundtrip(64, 64, cs=cs)


@pytest.mark.parametrize("bd,cs", [(10, ChromaSampling.Cs420), (12, ChromaSampling.Cs420)])
def test_roundtrip_high_bit_depth(bd, cs):
    run_roundtrip(64, 64, bd=bd, cs=cs)


@pytest.mark.parametrize("speed", [6, 8, 10])
def test_roundtrip_speeds(speed):
    run_roundtrip(96, 96, speed=speed)


@pytest.mark.parametrize("speed,bd,dims", [(4, 8, (200, 136)), (2, 12, (256, 128))])
def test_roundtrip_multitile_lrf(speed, bd, dims):
    """LRF under multi-tile: LRUs are frame-global, symbols coded by the
    owning SB within each tile, ref predictors reset per tile
    (tile_restoration_state.rs:49; stretched-LRU odd dims included)."""
    run_roundtrip(*dims, q=110, bd=bd, speed=speed, tiles=2)


def test_roundtrip_still_picture():
    cfg = Config(
        enc=EncoderConfig(
            width=64, height=48, quantizer=80, still_picture=True,
            min_key_frame_interval=0, max_key_frame_interval=1,
        )
    )
    ctx = cfg.new_context()
    f = ctx.new_frame()
    rng = np.random.default_rng(3)
    for p in f.planes:
        ch, cw = p.cfg.height, p.cfg.width
        p.copy_from(rng.integers(0, 256, (ch, cw)).astype(np.uint8))
    ctx.send_frame(f)
    ctx.flush()
    pkt = ctx.receive_packet()
    dec, _ = decode_packet(pkt.data)
    for ep, dp in zip(pkt.rec.planes, dec.planes):
        assert np.array_equal(ep.as_array(), dp.as_array())


def test_roundtrip_multiframe():
    run_roundtrip(64, 64, nframes=3)


def test_corrupt_packet_raises():
    from rav1e_tpu.decoder.headers import DecodeError

    pkts = run_roundtrip(64, 64)
    data = bytearray(pkts[0].data)
    data = data[: len(data) // 2]  # truncate
    with pytest.raises((DecodeError, IndexError, ValueError)):
        decode_packet(bytes(data))


def test_partition_search_rd():
    """Partition RDO (speed<=9) must beat fixed 32x32 partitions (speed 10)
    in rate at equal quantizer, stay bit-exact in round-trip, and actually
    emit split partitions on mixed content."""
    import numpy as np
    from rav1e_tpu import Config, EncoderConfig, EncoderStatus
    from rav1e_tpu.decoder import decode_packet

    def run(speed):
        cfg = Config(
            enc=EncoderConfig(
                width=128, height=128, quantizer=120, low_latency=True,
                min_key_frame_interval=0, max_key_frame_interval=9999,
            )
        ).with_speed_preset(speed)
        ctx = cfg.new_context()
        rng = np.random.default_rng(3)
        base = np.clip(np.cumsum(rng.integers(-2, 3, (128, 128)), axis=1) + 128, 0, 255)
        base[40:80, 40:100] = rng.integers(0, 256, (40, 60))
        f = ctx.new_frame()
        for p in f.planes:
            ch, cw = p.cfg.height, p.cfg.width
            p.copy_from(base[:ch, :cw].astype(np.uint8))
        ctx.send_frame(f)
        ctx.flush()
        pkts = []
        while True:
            try:
                pkts.append(ctx.receive_packet())
            except EncoderStatus.LimitReached:
                break
        dec, _ = decode_packet(pkts[0].data)
        for pl in range(3):
            np.testing.assert_array_equal(
                dec.planes[pl].as_array(), pkts[0].rec.planes[pl].as_array()
            )
        return sum(len(p.data) for p in pkts)

    assert run(9) < run(10)


def test_film_grain_passthrough():
    """Film grain params survive the header round-trip; recon is unaffected
    (grain is display-side synthesis, spec 7.18.3)."""
    import numpy as np
    from rav1e_tpu import Config, EncoderConfig, EncoderStatus
    from rav1e_tpu.config.grain import GrainParams
    from rav1e_tpu.decoder import decode_packet
    from rav1e_tpu.decoder.headers import parse_frame_header, parse_obus, parse_sequence_header

    gp = GrainParams(
        random_seed=1234,
        scaling_points_y=[(0, 20), (128, 30), (255, 25)],
        scaling_points_cb=[(0, 10)],
        scaling_points_cr=[(0, 12)],
        ar_coeff_lag=1,
        ar_coeffs_y=[5, -3, 7, 1],
        ar_coeffs_cb=[2, -1, 3, 0, 4],
        ar_coeffs_cr=[1, 1, -2, 0, 3],
        cb_mult=128, cb_luma_mult=192, cb_offset=256,
        cr_mult=130, cr_luma_mult=190, cr_offset=250,
    )
    cfg = Config(
        enc=EncoderConfig(
            width=64, height=64, quantizer=120, low_latency=True,
            min_key_frame_interval=0, max_key_frame_interval=9999,
            film_grain_params=[gp],
        )
    ).with_speed_preset(10)
    ctx = cfg.new_context()
    rng = np.random.default_rng(1)
    for i in range(2):
        f = ctx.new_frame()
        for p in f.planes:
            ch, cw = p.cfg.height, p.cfg.width
            p.copy_from(rng.integers(0, 256, (ch, cw)).astype(np.uint8))
        ctx.send_frame(f)
    ctx.flush()
    pkts = []
    while True:
        try:
            pkts.append(ctx.receive_packet())
        except EncoderStatus.LimitReached:
            break

    seq = None
    found = 0
    state = None
    for pkt in pkts:
        for t, payload in parse_obus(pkt.data):
            if t == 1:
                seq = parse_sequence_header(payload)
                assert seq.film_grain_params_present
            elif t == 3:
                fh = parse_frame_header(payload, seq)
                g = fh.film_grain_params
                assert g is not None
                assert g.random_seed == 1234
                assert g.scaling_points_y == [(0, 20), (128, 30), (255, 25)]
                assert g.ar_coeffs_y == [5, -3, 7, 1]
                assert g.cb_offset == 256 and g.cr_mult == 130
                found += 1
        dec, state = decode_packet(pkt.data, state)
        np.testing.assert_array_equal(
            dec.planes[0].as_array(), pkt.rec.planes[0].as_array()
        )
    assert found == len(pkts)


def test_rect_partitions():
    """HORZ/VERT partitions selected on banded content and decoded bit-exactly."""
    import numpy as np
    from unittest import mock

    from rav1e_tpu import Config, EncoderConfig, EncoderStatus
    from rav1e_tpu.context.writer import ContextWriter
    from rav1e_tpu.decoder import decode_packet
    from rav1e_tpu.partition import PartitionType

    parts = []
    orig = ContextWriter.write_partition

    def spy(self, w, x, y, p, bsize):
        parts.append(p)
        return orig(self, w, x, y, p, bsize)

    cfg = Config(
        enc=EncoderConfig(
            width=128, height=128, quantizer=110, low_latency=True,
            min_key_frame_interval=0, max_key_frame_interval=9999,
        )
    ).with_speed_preset(5)
    cfg.enc.speed_settings.partition.non_square_partition_max_threshold_log2 = 6
    ctx = cfg.new_context()
    rng = np.random.default_rng(4)
    img = np.zeros((128, 128))
    for r in range(0, 128, 16):
        img[r : r + 16] = 60 + (r * 17) % 160
    img = np.clip(img + rng.integers(-3, 4, (128, 128)), 0, 255)
    f = ctx.new_frame()
    with mock.patch.object(ContextWriter, "write_partition", spy):
        for p in f.planes:
            ch, cw = p.cfg.height, p.cfg.width
            p.copy_from(img[:ch, :cw].astype(np.uint8))
        ctx.send_frame(f)
        ctx.flush()
        pkt = ctx.receive_packet()
    dec, _ = decode_packet(pkt.data)
    for pl in range(3):
        np.testing.assert_array_equal(
            dec.planes[pl].as_array(), pkt.rec.planes[pl].as_array()
        )
    rect = {PartitionType.PARTITION_HORZ, PartitionType.PARTITION_VERT}
    assert rect & set(parts), set(parts)
