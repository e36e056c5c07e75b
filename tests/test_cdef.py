"""CDEF tests: direction search, filter core vs a scalar oracle, and
frame-level round-trip activity."""

import pytest
import numpy as np

from rav1e_tpu.ops.cdef import (
    CDEF_DIRECTIONS,
    CDEF_VERY_LARGE,
    cdef_filter_blocks,
    cdef_find_dirs,
)


def test_find_dirs_flat_block():
    blocks = np.full((3, 8, 8), 130, dtype=np.int64)
    dirs, variances = cdef_find_dirs(blocks, 8)
    assert np.all(variances == 0)


def test_find_dirs_orientation():
    # horizontal stripes: rows constant -> energy concentrates in the
    # per-row buckets (direction 2)
    rows = np.tile(np.arange(8)[:, None] * 16 + 64, (1, 8))
    cols = rows.T
    blocks = np.stack([rows, cols]).astype(np.int64)
    dirs, variances = cdef_find_dirs(blocks, 8)
    assert dirs[0] == 2
    assert dirs[1] == 6
    assert np.all(variances > 0)


def _scalar_filter_block(win, direction, pri, sec, damping):
    """Direct transcription of spec 7.15.3 for one block (slow oracle)."""
    pri_taps = [[4, 2], [3, 3]][(pri >> 0) & 1]
    sec_taps = [2, 1]
    ys, xs = win.shape[0] - 4, win.shape[1] - 4
    out = np.zeros((ys, xs), dtype=np.int64)

    def constrain(diff, threshold):
        if threshold == 0:
            return 0
        shift = max(0, damping - (threshold.bit_length() - 1))
        mag = min(max(threshold - (abs(diff) >> shift), 0), abs(diff))
        return -mag if diff < 0 else mag

    for i in range(ys):
        for j in range(xs):
            x = int(win[2 + i, 2 + j])
            mn = mx = x
            s = 0
            for k in range(2):
                dy, dx = CDEF_DIRECTIONS[direction, k]
                for sgn in (1, -1):
                    p = int(win[2 + i + sgn * dy, 2 + j + sgn * dx])
                    s += pri_taps[k] * constrain(p - x, pri)
                    if p != CDEF_VERY_LARGE:
                        mx = max(mx, p)
                    mn = min(mn, p)
                for d2 in ((direction + 2) & 7, (direction + 6) & 7):
                    dy, dx = CDEF_DIRECTIONS[d2, k]
                    for sgn in (1, -1):
                        p = int(win[2 + i + sgn * dy, 2 + j + sgn * dx])
                        s += sec_taps[k] * constrain(p - x, sec)
                        if p != CDEF_VERY_LARGE:
                            mx = max(mx, p)
                        mn = min(mn, p)
            v = x + ((8 + s - (1 if s < 0 else 0)) >> 4)
            out[i, j] = min(max(v, mn), mx)
    return out


def test_filter_matches_scalar_oracle():
    rng = np.random.default_rng(7)
    for trial in range(6):
        n = 5
        wins = rng.integers(0, 256, (n, 12, 12)).astype(np.int32)
        # punch VERY_LARGE rings into some blocks
        wins[0, :2, :] = CDEF_VERY_LARGE
        wins[1, :, -2:] = CDEF_VERY_LARGE
        dirs = rng.integers(0, 8, n)
        pri = int(rng.integers(0, 16))
        sec = int(rng.integers(0, 3))
        if sec == 3:
            sec = 4
        damping = int(rng.integers(3, 7))
        got = cdef_filter_blocks(wins, dirs, np.full(n, pri), sec, damping, 8)
        for b in range(n):
            want = _scalar_filter_block(wins[b], int(dirs[b]), pri, sec, damping)
            np.testing.assert_array_equal(got[b], want, err_msg=f"trial {trial} block {b}")


def test_cdef_active_in_roundtrip():
    """At moderate q on noisy content CDEF must fire, change pixels, and the
    decoder must still match the encoder reconstruction bit-exactly."""
    from rav1e_tpu import Config, EncoderConfig
    from rav1e_tpu.decoder import decode_packet

    rng = np.random.default_rng(3)

    def run(cdef_on):
        cfg = Config(
            enc=EncoderConfig(
                width=64, height=64, quantizer=140, low_latency=True,
                min_key_frame_interval=0, max_key_frame_interval=9999,
            )
        ).with_speed_preset(10)
        cfg.enc.speed_settings.cdef = cdef_on
        ctx = cfg.new_context()
        f = ctx.new_frame()
        base = rng.integers(0, 255, (64, 64))
        for p in f.planes:
            ch, cw = p.cfg.height, p.cfg.width
            p.copy_from(base[:ch, :cw].astype(np.uint8))
        ctx.send_frame(f)
        ctx.flush()
        return ctx.receive_packet()

    rng = np.random.default_rng(3)
    pkt_on = run(True)
    rng = np.random.default_rng(3)
    pkt_off = run(False)
    y_on = pkt_on.rec.planes[0].as_array()
    y_off = pkt_off.rec.planes[0].as_array()
    assert not np.array_equal(y_on, y_off), "CDEF had no effect"

    dec, _ = decode_packet(pkt_on.data)
    np.testing.assert_array_equal(dec.planes[0].as_array(), y_on)


def test_cdef_rdo_native_matches_python():
    """The one-call native RDO sweep must pick the same per-SB strength map
    as the python candidate loop (which filters whole frames per candidate)."""
    from unittest import mock

    import rav1e_tpu.ops.cdef as cdef_mod
    from rav1e_tpu import native
    from rav1e_tpu.config import ChromaSampling
    from rav1e_tpu.frame import Frame

    if native.get_lib() is None:
        pytest.skip("native library unavailable")

    class Blocks:
        pass

    rng = np.random.default_rng(5)
    W, H = 136, 88
    for bd, dt in ((8, np.uint8), (10, np.uint16)):
        for cs in (ChromaSampling.Cs420, ChromaSampling.Cs422, ChromaSampling.Cs444):
            rec = Frame.new(W, H, cs, bd)
            src = Frame.new(W, H, cs, bd)
            for f in (rec, src):
                for p in f.planes:
                    arr = rng.integers(0, 1 << bd, (p.cfg.height, p.cfg.width))
                    p.copy_from(arr.astype(dt))
                    p.pad()
            mi_cols, mi_rows = (W + 7) // 8 * 2, (H + 7) // 8 * 2
            blocks = Blocks()
            blocks.cols, blocks.rows = mi_cols, mi_rows
            blocks.skip = rng.integers(0, 2, (mi_rows, mi_cols)).astype(bool)
            a = cdef_mod.cdef_rdo_frame(rec, src, blocks, bd, cs, W, H, 3, 9, 5)
            with mock.patch.object(native, "get_lib", lambda: None):
                b = cdef_mod.cdef_rdo_frame(rec, src, blocks, bd, cs, W, H, 3, 9, 5)
            assert a[0] == b[0] and a[1] == b[1]
            np.testing.assert_array_equal(a[2], b[2], err_msg=f"bd={bd} cs={cs}")
