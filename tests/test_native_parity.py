"""Bit-exactness of the native (C++) hot loops vs the numpy reference paths."""

import numpy as np
import pytest

from rav1e_tpu import native


pytestmark = pytest.mark.skipif(native.get_lib() is None, reason="no native lib")


def _force_python(monkeypatch, module):
    monkeypatch.setattr(module, "get_lib", lambda: None)


def test_put_8tap_parity(monkeypatch):
    from rav1e_tpu.ops import mc

    rng = np.random.default_rng(8)
    for bd, dt in ((8, np.uint8), (10, np.uint16), (12, np.uint16)):
        ref = rng.integers(0, 1 << bd, (64, 64)).astype(dt)
        for cf in (0, 3, 8, 15):
            for rf in (0, 5, 8, 12):
                for w, h in ((8, 8), (16, 4), (4, 16)):
                    got = mc.put_8tap(ref, 20, 20, w, h, cf, rf, 0, 0, bd)
                    monkeypatch.setattr(native, "get_lib", lambda: None)
                    want = mc.put_8tap(ref, 20, 20, w, h, cf, rf, 0, 0, bd)
                    monkeypatch.undo()
                    np.testing.assert_array_equal(got, want, err_msg=f"{bd} {cf} {rf} {w}x{h}")


def test_quantize_parity(monkeypatch):
    import rav1e_tpu.quantize as qmod
    from rav1e_tpu.quantize import QuantizationContext
    from rav1e_tpu.tx import TxSize, TxType

    rng = np.random.default_rng(5)
    for tx_size in (TxSize.TX_4X4, TxSize.TX_8X8, TxSize.TX_16X8, TxSize.TX_32X32, TxSize.TX_64X64):
        for tx_type in (TxType.DCT_DCT, TxType.ADST_ADST):
            qc = QuantizationContext()
            qc.update(120, tx_size, True, 8, 0, 0)
            coeffs = rng.integers(-5000, 5000, (tx_size.height, tx_size.width))
            q1, e1 = qc.quantize_block(coeffs, tx_size, tx_type)
            monkeypatch.setattr(qmod, "_native_lib", lambda: None)
            q2, e2 = qc.quantize_block(coeffs, tx_size, tx_type)
            monkeypatch.undo()
            assert e1 == e2, (tx_size, tx_type)
            np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))


def test_cdef_frame_parity(monkeypatch):
    from rav1e_tpu.config import ChromaSampling
    from rav1e_tpu.context.block import FrameBlocks
    from rav1e_tpu.frame import Frame
    import rav1e_tpu.ops.cdef as cdef_mod

    rng = np.random.default_rng(9)
    w, h = 96, 64
    blocks = FrameBlocks((w + 3) // 4, (h + 3) // 4)
    blocks.skip[:] = False

    def build():
        f = Frame.new(w, h, ChromaSampling.Cs420, 8)
        for p in f.planes:
            ch, cw = p.cfg.height, p.cfg.width
            p.copy_from(rng.integers(0, 256, (ch, cw)).astype(np.uint8))
        return f

    rng = np.random.default_rng(9)
    f1 = build()
    cdef_mod.cdef_filter_frame((3, 9, 5), f1, blocks, 8, ChromaSampling.Cs420, w, h)

    rng = np.random.default_rng(9)
    f2 = build()
    monkeypatch.setattr(native, "get_lib", lambda: None)
    cdef_mod.cdef_filter_frame((3, 9, 5), f2, blocks, 8, ChromaSampling.Cs420, w, h)
    monkeypatch.undo()

    for pl in range(3):
        np.testing.assert_array_equal(
            f1.planes[pl].as_array(), f2.planes[pl].as_array(), err_msg=str(pl)
        )


def test_me_search_native_matches_python():
    """Native diamond search must land on the same MV/SAD as the Python
    fallback (identical search order)."""
    from rav1e_tpu import Config, EncoderConfig, EncoderStatus

    def encode(force_py):
        import rav1e_tpu.native as nat

        cfg = Config(
            enc=EncoderConfig(
                width=96, height=64, quantizer=120, low_latency=True,
                min_key_frame_interval=0, max_key_frame_interval=9999,
            )
        ).with_speed_preset(10)
        ctx = cfg.new_context()
        rng = np.random.default_rng(4)
        base = np.clip(np.cumsum(rng.integers(-4, 5, (64, 96)), axis=1) + 128, 0, 255)
        orig = nat.get_lib
        if force_py:
            nat.get_lib = lambda: None
        try:
            pkts = []
            for i in range(3):
                f = ctx.new_frame()
                shift = i * 2
                for p in f.planes:
                    ch, cw = p.cfg.height, p.cfg.width
                    arr = np.roll(base[:ch, :cw], shift, axis=1)
                    p.copy_from(arr.astype(np.uint8))
                ctx.send_frame(f)
            ctx.flush()
            while True:
                try:
                    pkts.append(ctx.receive_packet())
                except EncoderStatus.LimitReached:
                    break
        finally:
            nat.get_lib = orig
        return pkts

    a = encode(False)
    b = encode(True)
    for p1, p2 in zip(a, b):
        assert p1.data == p2.data, "native vs python encode mismatch"


def test_full_bitstream_native_parity_pyramid_satd():
    """Native vs python full-encode bit-parity at the default preset (SATD
    subpel ME, pyramid reordering, odd frame dims) — the config that caught
    the native-SATD / python-SAD subpel divergence."""
    from rav1e_tpu import Config, EncoderConfig, EncoderStatus

    def encode(force_py):
        import rav1e_tpu.native as nat

        cfg = Config(
            enc=EncoderConfig(
                width=98, height=66, quantizer=90, low_latency=False,
                min_key_frame_interval=0, max_key_frame_interval=9999,
            )
        )
        ctx = cfg.new_context()
        rng = np.random.default_rng(3)
        base = np.add.outer(np.arange(66), np.arange(98)) % 256
        orig = nat.get_lib
        if force_py:
            nat.get_lib = lambda: None
        try:
            pkts = []
            for i in range(5):
                f = ctx.new_frame()
                y = (np.roll(base, i * 2, axis=1) + rng.integers(0, 5, (66, 98))) % 256
                f.planes[0].copy_from(y.astype(np.uint8))
                for p in f.planes[1:]:
                    p.copy_from(
                        np.full((p.cfg.height, p.cfg.width), 128, np.uint8)
                    )
                ctx.send_frame(f)
            ctx.flush()
            while True:
                try:
                    pkts.append(ctx.receive_packet())
                except EncoderStatus.LimitReached:
                    break
        finally:
            nat.get_lib = orig
        return pkts

    a = encode(False)
    b = encode(True)
    assert len(a) == len(b)
    for p1, p2 in zip(a, b):
        assert p1.data == p2.data, "native vs python encode mismatch (satd/pyramid)"


def test_fwd_quant_native_matches_python():
    """Fused C forward+quantize == numpy forward_transform + quantize_block."""
    from rav1e_tpu import native as nat
    from rav1e_tpu.ops import transforms as T
    from rav1e_tpu.quantize import QuantizationContext
    from rav1e_tpu.tx import TxSize, TxType

    rng = np.random.default_rng(11)
    for tx_size, tx_type in [
        (TxSize.TX_4X4, TxType.DCT_DCT),
        (TxSize.TX_8X8, TxType.ADST_ADST),
        (TxSize.TX_16X8, TxType.ADST_DCT),
        (TxSize.TX_32X32, TxType.DCT_DCT),
        (TxSize.TX_64X64, TxType.DCT_DCT),
    ]:
        w, h = tx_size.width, tx_size.height
        src = rng.integers(0, 255, (h + 8, w + 8)).astype(np.uint8)
        rec = rng.integers(0, 255, (h + 8, w + 8)).astype(np.uint8)
        qc = QuantizationContext()
        qc.update(80, tx_size, True, 8, 0, 0)
        out = nat.fwd_quant_native(src, rec, 4, 4, tx_size, tx_type, qc, 8)
        assert out is not None
        q_n, eob_n = out
        res = src[4 : 4 + h, 4 : 4 + w].astype(np.int32) - rec[4 : 4 + h, 4 : 4 + w]
        coeffs = T.forward_transform(res[None], tx_size, tx_type, 8)[0]
        q_p, eob_p = qc.quantize_block(coeffs, tx_size, tx_type)
        assert eob_n == eob_p, (tx_size, tx_type)
        assert np.array_equal(q_n, q_p), (tx_size, tx_type)
