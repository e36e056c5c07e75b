"""Loop restoration tests: filter cores, signaling round-trip, pipeline."""

import numpy as np
import pytest

from rav1e_tpu.ops import lrf as LRF


class _FakePlane:
    def __init__(self, arr, pad=0, xdec=0, ydec=0):
        class Cfg:
            pass

        self.data = arr
        self.cfg = Cfg()
        self.cfg.pad = pad
        self.cfg.xdec = xdec
        self.cfg.ydec = ydec


class _FakeFrame:
    def __init__(self, planes):
        self.planes = planes


def test_wiener_mid_taps_identity_on_flat():
    h, w = 40, 72
    flat = np.full((h, w), 133, dtype=np.int64)
    out = flat.copy()
    LRF.wiener_filter_stripe(
        (tuple(LRF.WIENER_TAPS_MID), tuple(LRF.WIENER_TAPS_MID)),
        flat, flat, out, 0, 0, w, h, w, h, 8,
    )
    np.testing.assert_array_equal(out, flat)


def test_sgr_flat_unchanged():
    h, w = 56, 64
    flat = np.full((h, w), 87, dtype=np.int64)
    for sgr_set in (0, 5, 10, 14):
        s2, s1 = LRF.SGRPROJ_PARAMS_S[sgr_set]
        f2, f1, lines = LRF.sgr_compute_f(flat, flat, 0, 0, w, h, w, h, 8, s2, s1)
        out = LRF.sgr_apply(f2, f1, lines, (-32, 31), 8)
        np.testing.assert_array_equal(out, flat, err_msg=f"set {sgr_set}")


def test_sgr_solve_recovers_denoise_gain():
    """On noisy-vs-clean pairs the solved projection must reduce SSE."""
    rng = np.random.default_rng(4)
    h, w = 64, 64
    clean = np.clip(
        np.cumsum(rng.integers(-2, 3, (h, w)), axis=1) + 128, 0, 255
    ).astype(np.int64)
    noisy = np.clip(clean + rng.integers(-6, 7, (h, w)), 0, 255).astype(np.int64)
    sgr_set = 5
    s2, s1 = LRF.SGRPROJ_PARAMS_S[sgr_set]
    f2, f1, lines = LRF.sgr_compute_f(noisy, noisy, 0, 0, w, h, w, h, 8, s2, s1)
    acc = [0, 0, 0, 0, 0, 0]
    LRF.sgr_solve_accumulate(f2, f1, lines, clean, acc)
    xqd = LRF.sgr_solve_finish(acc, sgr_set)
    out = LRF.sgr_apply(f2, f1, lines, xqd, 8)
    sse_filtered = ((out - clean) ** 2).sum()
    sse_noisy = ((noisy - clean) ** 2).sum()
    assert sse_filtered < sse_noisy


def test_lrf_signaling_roundtrip():
    """write_lrf -> bitstream -> read_lrf recovers every filter exactly."""
    from rav1e_tpu.context.cdf import CDFContext
    from rav1e_tpu.context.writer import ContextWriter
    from rav1e_tpu.decoder.reader import ContextReader
    from rav1e_tpu.ec import Reader, WriterEncoder

    rs_w = LRF.RestorationState.build(192, 192, _cs420(), 100, 3, 3)
    filters = [
        ("none",),
        ("sgr", 5, (-20, 40)),
        ("sgr", 14, (10, 95)),     # s_r1 == 0: xqd[1] derived
        ("sgr", 11, (0, 60)),      # s_r2 == 0: xqd[0] derived
        ("wiener", ((5, -10, 20), (-3, 2, 30))),
        ("sgr", 1, (-96, -32)),
        ("none",),
        ("sgr", 9, (31, 95)),
        ("wiener", ((0, -23, -17), (0, 8, 46))),
    ]
    k = 0
    for rp in [rs_w.planes[0]]:
        for uy in range(rp.cfg.rows):
            for ux in range(rp.cfg.cols):
                rp.units[uy][ux] = filters[k % len(filters)]
                k += 1
    # chroma plane: wiener first tap must be zero
    for rp in rs_w.planes[1:]:
        for uy in range(rp.cfg.rows):
            for ux in range(rp.cfg.cols):
                f = filters[(k + 1) % len(filters)]
                if f[0] == "wiener":
                    f = ("wiener", ((0,) + f[1][0][1:], (0,) + f[1][1][1:]))
                rp.units[uy][ux] = f
                k += 1

    fc = CDFContext(100)
    cw = ContextWriter(fc, None)
    w = WriterEncoder()
    refs = LRF.TileRestorationRefs()
    for sby in range(3):
        for sbx in range(3):
            for pli in range(3):
                cw.write_lrf(w, rs_w, refs, sbx, sby, pli)
    data = w.done()

    rs_r = LRF.RestorationState.build(192, 192, _cs420(), 100, 3, 3)
    fc2 = CDFContext(100)
    cr = ContextReader.__new__(ContextReader)
    cr.fc = fc2
    r = Reader(data)
    refs2 = LRF.TileRestorationRefs()
    for sby in range(3):
        for sbx in range(3):
            for pli in range(3):
                cr.read_lrf(r, rs_r, refs2, sbx, sby, pli)

    for pli in range(3):
        assert rs_r.planes[pli].units == rs_w.planes[pli].units, pli


def _cs420():
    from rav1e_tpu.config import ChromaSampling

    return ChromaSampling.Cs420


def _encode_ctx(w, h, q, lrf=True, n=2, seed=6):
    from rav1e_tpu import Config, EncoderConfig, EncoderStatus

    cfg = Config(
        enc=EncoderConfig(
            width=w, height=h, quantizer=q, low_latency=True,
            min_key_frame_interval=0, max_key_frame_interval=9999,
        )
    ).with_speed_preset(10)
    cfg.enc.speed_settings.lrf = lrf
    ctx = cfg.new_context()
    rng = np.random.default_rng(seed)
    base = np.clip(
        np.cumsum(rng.integers(-3, 4, (h, w)), axis=1) + 120, 0, 255
    )
    pkts = []
    for i in range(n):
        f = ctx.new_frame()
        for p in f.planes:
            ch, cw = p.cfg.height, p.cfg.width
            noise = rng.integers(-10, 11, (ch, cw))
            p.copy_from(np.clip(base[:ch, :cw] + noise, 0, 255).astype(np.uint8))
        ctx.send_frame(f)
    ctx.flush()
    while True:
        try:
            pkts.append(ctx.receive_packet())
        except EncoderStatus.LimitReached:
            break
    return pkts


def test_lrf_pipeline_roundtrip():
    """LRF active end-to-end: filters selected, signaled, and the decoder
    reproduces the encoder reconstruction bit-exactly."""
    from rav1e_tpu.decoder import decode_packet
    from rav1e_tpu.decoder.headers import parse_frame_header, parse_obus, parse_sequence_header

    pkts = _encode_ctx(128, 96, 150)
    # confirm restoration is actually signaled on at least one frame
    seq = None
    signaled = False
    for pkt in pkts:
        for t, payload in parse_obus(pkt.data):
            if t == 1:
                seq = parse_sequence_header(payload)
            elif t == 3:
                fh = parse_frame_header(payload, seq)
                if any(x != 0 for x in fh.lrf_types):
                    signaled = True
    assert signaled, "no frame used loop restoration"

    state = None
    for i, pkt in enumerate(pkts):
        dec, state = decode_packet(pkt.data, state)
        for pl in range(3):
            a = dec.planes[pl].as_array()
            b = pkt.rec.planes[pl].as_array()
            np.testing.assert_array_equal(a, b, err_msg=f"frame {i} plane {pl}")


def test_lrf_wiener_bitstream_roundtrip(monkeypatch):
    """Force Wiener filters through the full encode->decode path."""
    import rav1e_tpu.ops.lrf as lrf_mod
    from rav1e_tpu.decoder import decode_packet

    orig = lrf_mod.lrf_decide_units

    def force_wiener(rs, *args, **kwargs):
        orig(rs, *args, **kwargs)
        coeffs_y = ((4, -9, 18), (2, -5, 12))
        coeffs_uv = ((0, -9, 18), (0, -5, 12))
        for pli, rp in enumerate(rs.planes):
            for uy in range(rp.cfg.rows):
                for ux in range(rp.cfg.cols):
                    if (ux + uy) % 2 == 0:
                        rp.units[uy][ux] = (
                            "wiener", coeffs_y if pli == 0 else coeffs_uv
                        )

    monkeypatch.setattr(lrf_mod, "lrf_decide_units", force_wiener)
    pkts = _encode_ctx(128, 96, 150, n=1, seed=9)
    dec, _ = decode_packet(pkts[0].data)
    for pl in range(3):
        np.testing.assert_array_equal(
            dec.planes[pl].as_array(), pkts[0].rec.planes[pl].as_array(), err_msg=str(pl)
        )


def test_lrf_improves_psnr():
    pkts_on = _encode_ctx(128, 128, 170, lrf=True, n=1)
    pkts_off = _encode_ctx(128, 128, 170, lrf=False, n=1)

    def psnr(pkt, seed=6):
        rng = np.random.default_rng(seed)
        base = np.clip(np.cumsum(rng.integers(-3, 4, (128, 128)), axis=1) + 120, 0, 255)
        noise = rng.integers(-10, 11, (128, 128))
        src = np.clip(base + noise, 0, 255)
        rec = pkt.rec.planes[0].as_array().astype(float)
        return 10 * np.log10(255 ** 2 / np.mean((rec - src) ** 2))

    assert psnr(pkts_on[0]) >= psnr(pkts_off[0]) - 0.01


def test_sgr_decide_native_matches_python():
    """Whole-unit native SGR decision (xqd + SSE) must equal the numpy path,
    including odd stripe heights (the arange(0, sh+2, 2) row-count case)."""
    import rav1e_tpu.ops.lrf as LR
    from rav1e_tpu import native

    if native.get_lib() is None:
        import pytest

        pytest.skip("no native lib")
    rng = np.random.default_rng(11)
    for h, w in ((87, 94), (96, 128), (40, 33), (64, 64)):
        cdef = rng.integers(0, 256, (h, w)).astype(np.uint8)
        debl = np.clip(cdef.astype(int) + rng.integers(-2, 3, (h, w)), 0, 255).astype(np.uint8)
        src = np.clip(cdef.astype(int) + rng.integers(-5, 6, (h, w)), 0, 255).astype(np.uint8)
        pieces = [(0, min(56, h))]
        if h > 56:
            pieces.append((56, min(64, h - 56)))
        nat = LR._sgr_decide_native(
            cdef, debl, src, 0, w, pieces, w, h, 8, LR.SGRPROJ_REDUCED_SETS
        )
        assert nat is not None
        for sgr_set, (x0n, x1n, ssen) in zip(LR.SGRPROJ_REDUCED_SETS, nat):
            s_r2, s_r1 = LR.SGRPROJ_PARAMS_S[sgr_set]
            acc = [0] * 6
            cached = []
            for sy, sh in pieces:
                g = LR.sgr_stripe_geom(cdef, debl, 0, sy, w, sh, w, h)
                f2, f1 = LR.sgr_compute_f_from_geom(g, 8, s_r2, s_r1)
                s_ = src[sy : sy + sh]
                LR.sgr_solve_accumulate(f2, f1, g["lines"], s_, acc)
                cached.append((f2, f1, g["lines"], s_))
            xqd = LR.sgr_solve_finish(acc, sgr_set)
            sse = sum(
                int(((LR.sgr_apply(f2, f1, ln, xqd, 8) - s_) ** 2).sum())
                for f2, f1, ln, s_ in cached
            )
            assert (x0n, x1n) == xqd, (h, w, sgr_set)
            assert ssen == sse, (h, w, sgr_set)


def test_native_lrf_apply_parity():
    """Native SGR/Wiener stripe apply bit-matches the numpy reference."""
    import numpy as np
    from rav1e_tpu import native
    from rav1e_tpu.ops import lrf as L

    lib = native.get_lib()
    if lib is None:
        import pytest

        pytest.skip("native unavailable")
    rng = np.random.default_rng(0)
    crop_w, crop_h, bd = 131, 89, 8
    cdef = rng.integers(0, 256, (160, 160)).astype(np.uint8)
    debl = rng.integers(0, 256, (160, 160)).astype(np.uint8)
    for (sy, sh) in [(0, 56), (56, 33)]:
        for x, uw in [(0, 64), (64, crop_w - 64)]:
            for sset in (2, 10, 14):
                s_r2, s_r1 = L.SGRPROJ_PARAMS_S[sset]
                out_a = cdef.copy()
                out_b = cdef.copy()
                g = L.sgr_stripe_geom(cdef, debl, x, sy, uw, sh, crop_w, crop_h)
                f2, f1 = L.sgr_compute_f_from_geom(g, bd, s_r2, s_r1)
                r = L.sgr_apply(f2, f1, g["lines"], (-20, 40), bd)
                out_a[sy : sy + sh, x : x + uw] = r.astype(np.uint8)
                lib.enc_sgr_apply_stripe(
                    cdef.ctypes.data, 160, debl.ctypes.data, 160, 1,
                    out_b.ctypes.data, 160, x, sy, uw, sh, crop_w, crop_h,
                    bd, s_r2, s_r1, -20, 40,
                )
                assert np.array_equal(out_a, out_b), ("sgr", sset, sy, x)
            out_a = cdef.copy()
            out_b = cdef.copy()
            coeffs = [[2, -5, 12], [-1, 3, 10]]
            L.wiener_filter_stripe(
                coeffs, cdef, debl, out_a, x, sy, uw, sh, crop_w, crop_h, bd
            )
            c6 = np.ascontiguousarray(np.asarray(coeffs, np.int32).reshape(-1))
            lib.enc_wiener_apply_stripe(
                c6.ctypes.data, cdef.ctypes.data, 160, debl.ctypes.data,
                160, 1, out_b.ctypes.data, 160, x, sy, uw, sh, crop_w,
                crop_h, bd,
            )
            assert np.array_equal(out_a, out_b), ("wiener", sy, x)
