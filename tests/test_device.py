"""Device analysis stage unit tests: prediction parity with the exact host
predictors, SATD consistency, and pipeline integration."""

import jax.numpy as jnp
import numpy as np
import pytest

from rav1e_tpu.device.analysis import predict_all_modes, satd8
from rav1e_tpu.ops.dist import get_satd
from rav1e_tpu.ops.intra import IntraEdge, predict_intra
from rav1e_tpu.partition import PredictionMode


@pytest.mark.parametrize("s", [8, 16, 32])
def test_device_predictions_match_host(s):
    """All 13 device mode predictions must bit-match ops/intra.predict_intra
    (angle_delta=0; directional modes through the normative IEF pipeline
    with non-smooth neighbors, the coder's common case) — the same numbers
    the host codes.  Full directional IEF coverage incl. corner filter:
    tests/test_device_ief.py."""
    from rav1e_tpu.ops.intra import IefParams
    from rav1e_tpu.partition import intra_mode_to_angle

    rng = np.random.default_rng(s)
    n = 4
    above2 = rng.integers(0, 256, (n, 2 * s)).astype(np.int32)
    left2 = rng.integers(0, 256, (n, 2 * s)).astype(np.int32)
    tl = rng.integers(0, 256, (n,)).astype(np.int32)
    dev = np.asarray(
        predict_all_modes(
            jnp.asarray(above2), jnp.asarray(left2), jnp.asarray(tl), s, 8
        )
    )
    ief = IefParams(above_mode=PredictionMode.DC_PRED,
                    left_mode=PredictionMode.DC_PRED)
    for i in range(n):
        for m in range(13):
            mode = PredictionMode(m)
            tl_h = int(tl[i])
            if mode.is_directional():
                p_angle = intra_mode_to_angle(mode)
                if 90 < p_angle < 180 and 2 * s >= 24:
                    # build_intra_edge's corner filter, applied by the coder
                    tl_h = (
                        int(left2[i, s - 1]) * 5 + tl_h * 6
                        + int(above2[i, 0]) * 5 + 8
                    ) >> 4
            edge = IntraEdge(
                above=above2[i].astype(np.int64),
                left=left2[i].astype(np.int64),
                top_left=tl_h,
                have_above=True,
                have_left=True,
            )
            host = predict_intra(
                mode, edge, s, s, 8, 0,
                ief_params=ief if mode.is_directional() else None,
            )
            assert np.array_equal(dev[i, m], host), (s, mode.name)


def test_device_satd_close_to_host():
    """Per-cell rounding may differ by <1 per 8x8 cell vs the host SATD."""
    rng = np.random.default_rng(0)
    d = rng.integers(-300, 300, (6, 32, 32)).astype(np.int32)
    dv = np.asarray(satd8(jnp.asarray(d)))
    for i in range(6):
        hv = get_satd(d[i] + 500, np.full((32, 32), 500, np.int32))
        assert abs(float(dv[i]) - hv) <= 16  # one unit per 8x8 cell


def test_device_path_round_trips():
    """speed>=6 encode (device maps on) stays bit-exact through the decoder."""
    from rav1e_tpu import Config, EncoderConfig, EncoderStatus
    from rav1e_tpu.decoder import decode_packet

    h, w = 96, 128
    rng = np.random.default_rng(9)
    cfg = Config(
        enc=EncoderConfig(width=w, height=h, quantizer=110, low_latency=False)
    )
    ctx = cfg.new_context()
    base = rng.integers(0, 256, (h, w))
    for t in range(4):
        f = ctx.new_frame()
        for i, p in enumerate(f.planes):
            ch, cw = p.cfg.height, p.cfg.width
            arr = (
                np.roll(base, 2 * t, axis=1)[:ch, :cw]
                if i == 0
                else rng.integers(100, 156, (ch, cw))
            )
            p.copy_from(np.clip(arr, 0, 255).astype(np.uint8))
        ctx.send_frame(f)
    ctx.flush()
    state = None
    n = 0
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
        n += 1
    assert n >= 4
