"""Device analysis + multi-chip sharding tests (8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from rav1e_tpu.device.analysis import _frame_analysis, analyze_frame
from rav1e_tpu.parallel import make_mesh, sharded_frame_analysis
from rav1e_tpu import tables


def test_analysis_prefers_obvious_modes():
    rng = np.random.default_rng(0)
    h = w = 128
    # vertical stripes -> V_PRED should win away from the border
    luma = np.tile(rng.integers(0, 256, (1, w)), (h, 1)).astype(np.int32)
    m = analyze_frame(luma, None, None, 110, 30.0, 8)
    assert (m.mode[8:, :] == 1).all()  # V_PRED below the first SB row
    # horizontal stripes -> H_PRED
    luma = np.tile(rng.integers(0, 256, (h, 1)), (1, w)).astype(np.int32)
    m = analyze_frame(luma, None, None, 110, 30.0, 8)
    assert (m.mode[:, 8:] == 2).all()  # H_PRED right of the first SB col
    # flat -> DC + maximum partition size
    luma = np.full((h, w), 77, np.int32)
    m = analyze_frame(luma, None, None, 110, 30.0, 8)
    assert (m.size_log2 == 6).all()
    assert (m.mode[8:, 8:] == 0).all()  # DC away from the base-filled borders


def test_inter_analysis_finds_motion():
    rng = np.random.default_rng(1)
    luma = rng.integers(0, 256, (128, 192)).astype(np.int32)
    ref = np.roll(luma, 3, axis=1)  # pred needs dx=+3 (device ME finds it)
    m = analyze_frame(luma, ref, None, 110, 30.0, 8)
    # away from the wrap seam (roll is circular; honest ME can't match the
    # right edge) every cell should pick inter with the exact pan MV
    assert m.use_inter[:, :-4].mean() > 0.9
    assert m.mv0 is not None
    inner = m.mv0[:, :-2]  # 16px cells left of the seam
    assert (inner[..., 1] == 24).mean() > 0.8  # +3 px = +24 1/8-pel
    intra = analyze_frame(luma, None, None, 110, 30.0, 8)
    assert m.bits_est < 0.5 * intra.bits_est


def test_sharded_matches_per_band_analysis():
    """Each mesh shard is an independent tile band (no intra prediction
    across tile edges in AV1), so the sharded maps must equal running the
    single-device analysis per band, and the psum'd rate must equal the
    band sum."""
    n = len(jax.devices())
    assert n >= 8, "conftest should provide 8 CPU devices"
    mesh = make_mesh(8)
    h, w = 8 * 64, 128
    rng = np.random.default_rng(2)
    luma = rng.integers(0, 256, (h, w)).astype(np.int32)
    qindex, lam, bd = 110, 30.0, 8
    size_map, mode_map, inter_map, bits = sharded_frame_analysis(
        mesh, luma, qindex, lam, bd
    )
    q = jnp.float32(float(tables.ac_q(qindex, 0, bd)))
    total = 0.0
    for i in range(8):
        band = jnp.asarray(luma[i * 64 : (i + 1) * 64])
        s_ref, m_ref, _, b_ref, _, _, _, _ = _frame_analysis(
            band, band, band, band, q, jnp.float32(lam), bd, has_inter=False
        )
        assert np.array_equal(np.asarray(s_ref), size_map[i * 8 : (i + 1) * 8])
        assert np.array_equal(np.asarray(m_ref), mode_map[i * 8 : (i + 1) * 8])
        total += float(b_ref)
    assert abs(total - bits) / total < 1e-3


def test_sharded_maps_drive_identical_bitstream():
    """End-to-end: an encode whose device maps come from the sharded
    analysis must produce byte-identical packets to one whose maps come
    from the per-band single-device analysis."""
    import rav1e_tpu.device as device_mod
    from rav1e_tpu import Config, EncoderConfig, EncoderStatus, SpeedSettings
    from rav1e_tpu.device.analysis import DeviceMaps

    h, w = 128, 128  # 2 bands of one SB row
    rng = np.random.default_rng(3)
    luma = rng.integers(0, 256, (h, w)).astype(np.uint8)

    def encode_with_maps(maps):
        ss = SpeedSettings.from_preset(8)
        cfg = Config(
            enc=EncoderConfig(
                width=w, height=h, quantizer=110, low_latency=True,
                speed_settings=ss, tile_rows=2,
            )
        )
        ctx = cfg.new_context()
        f = ctx.new_frame()
        for i, p in enumerate(f.planes):
            arr = luma if i == 0 else np.full((p.cfg.height, p.cfg.width), 128, np.uint8)
            p.copy_from(arr)
        orig = device_mod.analyze_frame
        device_mod.analyze_frame = lambda *a, **k: maps
        try:
            ctx.send_frame(f)
            ctx.flush()
            return ctx.receive_packet().data
        finally:
            device_mod.analyze_frame = orig

    qindex, bd = 110, 8
    q_step = tables.ac_q(qindex, 0, bd) / 8.0
    lam = 0.12 * q_step * q_step

    mesh = make_mesh(2)
    s1, m1, i1, bits = sharded_frame_analysis(mesh, luma.astype(np.int32), qindex, lam, bd)
    maps_sharded = DeviceMaps(size_log2=s1, mode=m1, use_inter=i1, bits_est=bits)

    q = jnp.float32(float(tables.ac_q(qindex, 0, bd)))
    parts = [
        _frame_analysis(
            jnp.asarray(luma[i * 64 : (i + 1) * 64].astype(np.int32)),
            jnp.asarray(luma[i * 64 : (i + 1) * 64].astype(np.int32)),
            jnp.asarray(luma[i * 64 : (i + 1) * 64].astype(np.int32)),
            jnp.asarray(luma[i * 64 : (i + 1) * 64].astype(np.int32)),
            q, jnp.float32(lam), bd, False,
        )
        for i in range(2)
    ]
    maps_single = DeviceMaps(
        size_log2=np.concatenate([np.asarray(p[0]) for p in parts]),
        mode=np.concatenate([np.asarray(p[1]) for p in parts]),
        use_inter=np.concatenate([np.asarray(p[2]) for p in parts]),
        bits_est=sum(float(p[3]) for p in parts),
    )

    data_sharded = encode_with_maps(maps_sharded)
    data_single = encode_with_maps(maps_single)
    assert data_sharded == data_single and len(data_sharded) > 0


def test_sharded_inter_analysis_halo_exchange():
    """Inter analysis sharded over the mesh with ppermute halo exchange:
    each band's decisions must equal the single-device analysis of the
    halo-extended band, and the psum'd rate must equal the interior sum."""
    import jax
    import jax.numpy as jnp

    from rav1e_tpu import tables
    from rav1e_tpu.device.analysis import _frame_analysis
    from rav1e_tpu.parallel import make_mesh, sharded_inter_analysis
    from rav1e_tpu.parallel.mesh import ME_HALO

    n = 4
    mesh = make_mesh(n)
    band_h, w = 64, 192
    h = n * band_h
    rng = np.random.default_rng(5)
    luma = rng.integers(0, 256, (h, w), dtype=np.int32)
    ref = np.roll(luma, (2, -5), (0, 1)).astype(np.int32)

    qindex, lam, bd = 110, 30.0, 8
    s_map, m_map, i_map, mv0, bits = sharded_inter_analysis(
        mesh, luma, ref, qindex, lam, bd
    )
    assert s_map.shape == (h // 8, w // 8)
    assert mv0.shape == (h // 16, w // 16, 2)
    assert np.isfinite(bits) and bits > 0

    q = jnp.float32(float(tables.ac_q(qindex, 0, bd)))
    Hh = ME_HALO
    total = 0.0
    for i in range(n):
        lo, hi = i * band_h, (i + 1) * band_h
        # replicate frame-edge rows exactly as the boundary chips do
        top = luma[lo - Hh : lo] if i > 0 else np.repeat(luma[:1], Hh, 0)
        bot = luma[hi : hi + Hh] if i < n - 1 else np.repeat(luma[-1:], Hh, 0)
        ext_src = np.concatenate([top, luma[lo:hi], bot])
        rtop = ref[lo - Hh : lo] if i > 0 else np.repeat(ref[:1], Hh, 0)
        rbot = ref[hi : hi + Hh] if i < n - 1 else np.repeat(ref[-1:], Hh, 0)
        ext_ref = np.concatenate([rtop, ref[lo:hi], rbot])
        s_ref, m_ref, i_ref, _b, mv_ref, _m1, _m2, rate = _frame_analysis(
            jnp.asarray(ext_src), jnp.asarray(ext_ref), jnp.asarray(ext_ref),
            jnp.asarray(ext_ref), q, jnp.float32(lam), bd, has_inter=True,
        )
        hc, nc = Hh // 8, band_h // 8
        hm, nm = Hh // 16, band_h // 16
        np.testing.assert_array_equal(
            np.asarray(s_ref)[hc : hc + nc], s_map[lo // 8 : hi // 8],
            err_msg=f"band {i} size map",
        )
        np.testing.assert_array_equal(
            np.asarray(m_ref)[hc : hc + nc], m_map[lo // 8 : hi // 8],
            err_msg=f"band {i} mode map",
        )
        np.testing.assert_array_equal(
            np.asarray(mv_ref)[hm : hm + nm], mv0[lo // 16 : hi // 16],
            err_msg=f"band {i} mv field",
        )
        total += float(np.asarray(rate)[hc : hc + nc].sum())
    assert abs(total - bits) / max(total, 1.0) < 1e-5, (total, bits)


def test_auto_mesh_context_encode_matches_single_device():
    """PRODUCT path: with >1 devices visible, Context.send_frame routes the
    per-frame analysis through the auto mesh (device/analysis._analysis_mesh
    row-shards the inputs and GSPMD partitions the same jitted program) and
    the bitstream must be byte-identical to the single-device run.  No
    monkeypatching — this is the code path a user with 8 chips gets."""
    import os

    from rav1e_tpu import Config, EncoderConfig, EncoderStatus, SpeedSettings
    from rav1e_tpu.device import analysis as ana

    def encode_clip():
        ss = SpeedSettings.from_preset(8)
        ss.device_chain = False  # the chain manages its own residency
        cfg = Config(
            enc=EncoderConfig(
                width=128, height=128, quantizer=120, low_latency=True,
                speed_settings=ss,
            )
        )
        ctx = cfg.new_context()
        rng = np.random.default_rng(11)
        base = rng.integers(0, 256, (128, 128)).astype(np.uint8)
        for t in range(3):
            f = ctx.new_frame()
            for i, p in enumerate(f.planes):
                arr = (
                    np.roll(base, 2 * t, axis=1)
                    if i == 0
                    else np.full((p.cfg.height, p.cfg.width), 128, np.uint8)
                )
                p.copy_from(arr)
            ctx.send_frame(f)
        ctx.flush()
        pkts = []
        while True:
            try:
                pkts.append(ctx.receive_packet().data)
            except EncoderStatus.LimitReached:
                break
        return pkts

    ana._analysis_mesh.cache_clear()
    assert ana._analysis_mesh() is not None  # 8 CPU devices from conftest
    sharded = encode_clip()
    os.environ["RAV1E_TPU_NO_SHARD"] = "1"
    ana._analysis_mesh.cache_clear()
    try:
        single = encode_clip()
    finally:
        del os.environ["RAV1E_TPU_NO_SHARD"]
        ana._analysis_mesh.cache_clear()
    assert len(sharded) == 3 and sharded == single
