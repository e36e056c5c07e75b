"""CfL (chroma-from-luma) tests: AC derivation, selection, round-trip."""

import numpy as np

from rav1e_tpu.partition import BlockSize
from rav1e_tpu.tx import TxSize


def test_luma_ac_zero_mean_and_q3():
    from rav1e_tpu.ops.intra import luma_ac

    rng = np.random.default_rng(2)
    luma = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    ac = luma_ac(luma, 0, 0, BlockSize.BLOCK_32X32, 1, 1, TxSize.TX_32X32, 32, 32)
    assert ac.shape == (16, 16)
    # Q3 samples: sum of 4 pixels << 1; mean-removed sum in [-1, 1] per spec rounding
    assert abs(int(ac.sum())) <= 16 * 16
    # flat luma -> all-zero ac
    flat = np.full((64, 64), 77, dtype=np.uint8)
    ac0 = luma_ac(flat, 0, 0, BlockSize.BLOCK_32X32, 1, 1, TxSize.TX_32X32, 32, 32)
    assert np.all(ac0 == 0)


def _encode(w, h, q, n=1, seed=3, corr=True):
    from rav1e_tpu import Config, EncoderConfig, EncoderStatus

    cfg = Config(
        enc=EncoderConfig(
            width=w, height=h, quantizer=q, low_latency=True,
            min_key_frame_interval=0, max_key_frame_interval=9999,
        )
    ).with_speed_preset(10)
    ctx = cfg.new_context()
    rng = np.random.default_rng(seed)
    luma = np.clip(
        np.cumsum(rng.integers(-5, 6, (h, w)), axis=1) + 128, 0, 255
    ).astype(np.int64)
    pkts = []
    for i in range(n):
        f = ctx.new_frame()
        for pi, p in enumerate(f.planes):
            ch, cw = p.cfg.height, p.cfg.width
            if pi == 0:
                arr = luma
            elif corr:
                # chroma strongly correlated with (downsampled) luma
                ds = luma.reshape(ch, h // ch, cw, w // cw).mean(axis=(1, 3))
                arr = np.clip(128 + (ds - 128) * (0.7 if pi == 1 else -0.5), 0, 255)
            else:
                arr = np.full((ch, cw), 90 + pi * 30)
            p.copy_from(arr[:ch, :cw].astype(np.uint8))
        ctx.send_frame(f)
    ctx.flush()
    while True:
        try:
            pkts.append(ctx.receive_packet())
        except EncoderStatus.LimitReached:
            break
    return pkts


def test_cfl_selected_and_roundtrip(monkeypatch):
    from rav1e_tpu.context.writer import ContextWriter
    from rav1e_tpu.decoder import decode_packet
    import rav1e_tpu.native_tile as native_tile

    # the spy hooks the Python symbol layer; force the Python tile path
    # (the C++ coder's CfL is covered by test_native_tile parity)
    monkeypatch.setattr(native_tile, "encode_tile_native", lambda te: None)

    calls = []
    orig = ContextWriter.write_cfl_alphas

    def spy(self, w, joint_sign, u_idx, v_idx):
        calls.append((joint_sign, u_idx, v_idx))
        return orig(self, w, joint_sign, u_idx, v_idx)

    monkeypatch.setattr(ContextWriter, "write_cfl_alphas", spy)
    pkts = _encode(128, 128, 100, corr=True)
    assert calls, "CfL never selected on correlated content"

    dec, _ = decode_packet(pkts[0].data)
    for pl in range(3):
        np.testing.assert_array_equal(
            dec.planes[pl].as_array(), pkts[0].rec.planes[pl].as_array(),
            err_msg=f"plane {pl}",
        )


def test_cfl_improves_chroma_quality():
    pkts = _encode(128, 128, 100, corr=True, seed=11)
    rng = np.random.default_rng(11)
    luma = np.clip(np.cumsum(rng.integers(-5, 6, (128, 128)), axis=1) + 128, 0, 255)
    ds = luma.reshape(64, 2, 64, 2).mean(axis=(1, 3))
    src_u = np.clip(128 + (ds - 128) * 0.7, 0, 255)
    rec_u = pkts[0].rec.planes[1].as_array().astype(float)
    mse = np.mean((rec_u - src_u) ** 2)
    psnr = 10 * np.log10(255 ** 2 / max(mse, 1e-3))
    assert psnr > 30, psnr
