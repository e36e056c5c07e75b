#!/usr/bin/env python3
"""Isolate the chain tx_split desync to prediction vs residual: capture
the first desyncing frame's dispatch args, re-run the stage programs, and
compare the device pred/recon with host recomputation per mismatched
block."""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from rav1e_tpu import Config, EncoderConfig, EncoderStatus  # noqa: E402
from rav1e_tpu.decoder import decode_packet  # noqa: E402
from rav1e_tpu.device import chain as chm  # noqa: E402
from rav1e_tpu.encoder import pipeline as plm  # noqa: E402


captures = {}

orig_cd = plm.FramePipeline._chain_dispatch


def cd(self, maps, frame, plan, q, seg, refs3, hb, hb2, fno):
    d = orig_cd(self, maps, frame, plan, q, seg, refs3, hb, hb2, fno)
    captures[fno] = {
        "maps": maps, "frame": frame, "plan": plan, "q": q, "seg": seg,
        "refs3": refs3, "hb": hb, "hb2": hb2, "disp": d,
    }
    return d


plm.FramePipeline._chain_dispatch = cd


def main():
    w, h, q, speed, nframes, seed = 128, 96, 120, 9, 4, 7
    cfg = Config(
        enc=EncoderConfig(
            width=w, height=h, quantizer=q, low_latency=False,
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
    bad = None
    while True:
        try:
            pkt = ctx.receive_packet()
        except EncoderStatus.LimitReached:
            break
        dec, seq = decode_packet(pkt.data, seq)
        if dec is None:
            continue
        a = pkt.rec.planes[0].as_array().astype(int)
        b = dec.planes[0].as_array().astype(int)
        if not np.array_equal(a, b) and bad is None:
            bad = (pkt.input_frameno, a, b)
    if bad is None:
        print("no desync")
        return
    fno, enc_rec, dec_rec = bad
    print(f"first desync frame {fno}")
    cap = captures[fno]
    disp = cap["disp"]
    geom, cplan = disp["geom"], disp["cplan"]
    import jax.numpy as jnp

    f_sel, f_chroma, f_txq, f_filters, f_pack = chm.chain_stages_jit(geom)
    refs = tuple(
        tuple(jnp.asarray(pl) for pl in r) for r in cap["refs3"]
    )
    src_p = chm.host_src_planes(cap["frame"], geom.vis_w, geom.vis_h)
    src = tuple(jnp.asarray(p) for p in src_p)
    fields = chm.clamp_fields(cap["maps"], geom.gh // 16, geom.gw // 16)
    if not cap["hb"]:
        fields[1] = 0
    if not cap["hb2"]:
        fields[2] = 0

    # rebuild dcq/acq exactly as dispatch did
    from rav1e_tpu import tables
    from rav1e_tpu.quantize import chroma_q_deltas

    bd = 8
    dcd, acd = chroma_q_deltas(cap["q"], bd, ctx.config.enc.chroma_sampling)
    nby8, nbx8 = geom.gh // 8, geom.gw // 8
    seg = cap["seg"]
    if seg is not None:
        qidx = np.array([seg.qidx(cap["q"], s) for s in range(8)], np.int64)
        seg8 = np.zeros((nby8, nbx8), np.int64)
        sm = seg.seg_map[::2, ::2]
        seg8[: sm.shape[0], : sm.shape[1]] = sm
    else:
        qidx = np.full(8, cap["q"], np.int64)
        seg8 = np.zeros((nby8, nbx8), np.int64)
    dcq_tab = np.array([[tables.dc_q(int(qq), dcd[pl], bd) for pl in range(3)]
                        for qq in qidx], np.int32)
    acq_tab = np.array([[tables.ac_q(int(qq), acd[pl], bd) for pl in range(3)]
                        for qq in qidx], np.int32)
    dcq8 = dcq_tab[seg8].transpose(2, 0, 1).copy()
    acq8 = acq_tab[seg8].transpose(2, 0, 1).copy()

    import jax

    from rav1e_tpu.ops.cdef import CDEF_SEC_STRENGTHS, cdef_strengths_fast
    from rav1e_tpu.ops.deblock import deblock_levels_fast

    dbl = deblock_levels_fast(cap["q"], bd, False, tables.ac_q(cap["q"], 0, bd))
    cy_s, cuv_s = cdef_strengths_fast(tables.ac_q(cap["q"], 0, bd) >> (bd - 8))
    aux = jax.device_put(chm.pack_aux(
        geom, cplan, fields, dcq8, acq8, dbl,
        [0, cy_s, cy_s, cy_s], [0, cuv_s, cuv_s, cuv_s]))
    pred_y, sels = f_sel(src[0], tuple(r[0] for r in refs), aux)
    pred_u, pred_v = f_chroma(
        tuple(r[1] for r in refs), tuple(r[2] for r in refs), aux, sels)
    levels_flat, eob_ord, overflow, recons, skip8, tx8, bsize8 = f_txq(
        src, (pred_y, pred_u, pred_v), aux)
    pred_y = np.asarray(pred_y)
    recon_y = np.asarray(recons[0])
    print("overflow:", bool(np.asarray(overflow)))

    # mismatch map (visible region) between the PRE-FILTER device recon and
    # nothing-to-compare-yet; instead compare pkt recon vs decoder recon and
    # inspect pred/residual at mismatched 8px cells
    d = enc_rec != dec_rec
    ys, xs = np.nonzero(d)
    print(f"{d.sum()} px differ")
    # pick the worst cell
    err = np.abs(enc_rec - dec_rec)
    iy, ix = np.unravel_index(np.argmax(err), err.shape)
    cy, cx = iy // 8 * 8, ix // 8 * 8
    print(f"worst at ({iy},{ix}) cell ({cy},{cx}) leaf sl="
          f"{cplan.eff8[cy // 8, cx // 8]}")
    print("enc rec:")
    print(enc_rec[cy : cy + 8, cx : cx + 8])
    print("dec rec:")
    print(dec_rec[cy : cy + 8, cx : cx + 8])
    print("device pred:")
    print(pred_y[cy : cy + 8, cx : cx + 8])
    print("device pre-filter recon:")
    print(recon_y[cy : cy + 8, cx : cx + 8])
    print("device residual (recon - pred):")
    print(recon_y[cy : cy + 8, cx : cx + 8].astype(int)
          - pred_y[cy : cy + 8, cx : cx + 8].astype(int))
    # decoder-implied residual = dec_rec - host MC pred; host MC pred from
    # derived decisions
    is_inter_g, ref_g, mv_g = chm.derive_decisions(
        geom, cplan, {s: np.asarray(sels[i]) for i, s in enumerate(geom.sizes)},
        fields)
    my, mx = (cy // 4), (cx // 4)
    print("derived mv at cell:", mv_g.reshape(geom.mi_rows, geom.mi_cols, 4)
          [my, mx], "ref:", ref_g[my, mx])


if __name__ == "__main__":
    main()
