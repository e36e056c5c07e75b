#!/usr/bin/env python3
"""Per-stage device times of the chain program at the bench point."""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import synth_frame  # noqa: E402
from rav1e_tpu import Config, EncoderConfig, EncoderStatus  # noqa: E402
from rav1e_tpu.device import chain as ch  # noqa: E402


def main():
    import jax

    w, h, nframes = 640, 384, 10
    rng = np.random.default_rng(42)
    cfg = Config(
        enc=EncoderConfig(
            width=w, height=h, quantizer=120, low_latency=False,
            min_key_frame_interval=0, max_key_frame_interval=9999,
        )
    )

    stats = {}
    orig = ch.dispatch_chain

    def timed_dispatch(geom, plan, src_planes, ref_planes, fields, dcq8,
                       acq8, dbl_levels, cdef_y, cdef_uv):
        import jax.numpy as jnp

        f_sel, f_chroma, f_txq, f_filters, f_pack = ch.chain_stages_jit(geom)
        aux = jax.device_put(ch.pack_aux(
            geom, plan, fields, dcq8, acq8, dbl_levels, cdef_y, cdef_uv))
        refs = tuple(tuple(jnp.asarray(pl) for pl in r) for r in ref_planes)
        src = tuple(jnp.asarray(p) for p in src_planes)

        def tick(name, out):
            t0 = time.monotonic()
            jax.block_until_ready(out)
            stats.setdefault(name, []).append(time.monotonic() - t0)
            return out

        t_up0 = time.monotonic()
        jax.block_until_ready((refs, src, aux))
        stats.setdefault("upload", []).append(time.monotonic() - t_up0)

        pred_y, sels = tick("sel", f_sel(
            src[0], tuple(r[0] for r in refs), aux))
        pred_u, pred_v = tick("chroma", f_chroma(
            tuple(r[1] for r in refs), tuple(r[2] for r in refs),
            aux, sels))
        out = tick("txq", f_txq(src, (pred_y, pred_u, pred_v), aux))
        levels_flat, eob_ord, overflow, recons, skip8, tx8, bsize8 = out
        ref_out, cdef_idx = tick("filters", f_filters(
            recons, src, skip8, tx8, bsize8, aux))
        hdr, levels = tick("pack", f_pack(overflow, eob_ord, sels, cdef_idx,
                                          levels_flat))
        t0 = time.monotonic()
        arr = np.asarray(hdr)
        n = int(arr[1 : 1 + geom.ntx_cap].astype(np.int64).sum())
        lv = np.asarray(levels[: ch._lvl_bucket(n, geom.lcap)])
        stats.setdefault("download", []).append(time.monotonic() - t0)
        stats.setdefault("dl_bytes", []).append(arr.nbytes + lv.nbytes)
        return (geom, plan, ref_out, (hdr, levels))

    for rep in range(2):
        if rep == 1:
            ch.dispatch_chain = timed_dispatch
            stats.clear()
        ctx = cfg.new_context()
        frames = [synth_frame(ctx, rng, w, h, t) for t in range(nframes)]
        for f in frames:
            ctx.send_frame(f)
        ctx.flush()
        while True:
            try:
                ctx.receive_packet()
            except EncoderStatus.LimitReached:
                break
            except EncoderStatus.Encoded:
                continue

    for k, v in stats.items():
        if k == "dl_bytes":
            print(f"{k:10s} mean={np.mean(v)/1024:.0f} KiB")
        else:
            v = v[1:] if len(v) > 1 else v
            print(f"{k:10s} n={len(v)} mean={np.mean(v)*1e3:7.1f}ms "
                  f"min={np.min(v)*1e3:7.1f}ms max={np.max(v)*1e3:7.1f}ms")


if __name__ == "__main__":
    main()
