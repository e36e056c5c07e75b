#!/usr/bin/env python3
"""Localize the chain tx_split desync: encode the failing test clip and
diff encoder (device) recon vs decoder recon per plane/block."""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from rav1e_tpu import Config, EncoderConfig, EncoderStatus  # noqa: E402
from rav1e_tpu.decoder import decode_packet  # noqa: E402


def main():
    import os
    mode = os.environ.get("CHAIN_OFF", "")
    if "deblock" in mode:
        from rav1e_tpu.ops import deblock as dbm
        dbm.deblock_levels_fast = lambda *a, **k: [0, 0, 0, 0]
    if "cdef" in mode:
        from rav1e_tpu.ops import cdef as cdm
        cdm.cdef_strengths_fast = lambda *a, **k: (0, 0)
    from rav1e_tpu.device import chain as chm
    plans = {}
    obp = chm.build_plan
    def bp(*a, **k):
        p = obp(*a, **k)
        plans[len(plans)] = p
        return p
    chm.build_plan = bp
    ofd = chm.fetch_chain
    results = {}
    def fc(handle):
        r = ofd(handle)
        results[len(results)] = r
        return r
    chm.fetch_chain = fc
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
    while True:
        try:
            pkt = ctx.receive_packet()
        except EncoderStatus.LimitReached:
            break
        dec, seq = decode_packet(pkt.data, seq)
        if dec is None:
            continue
        for pi, (ep, dp) in enumerate(zip(pkt.rec.planes, dec.planes)):
            a = ep.as_array().astype(int)
            b = dp.as_array().astype(int)
            if np.array_equal(a, b):
                continue
            d = a != b
            ys, xs = np.nonzero(d)
            print(f"frame {pkt.input_frameno} plane {pi}: {d.sum()} px "
                  f"y[{ys.min()}..{ys.max()}] x[{xs.min()}..{xs.max()}] "
                  f"maxabs={np.abs(a-b)[d].max()}")
            if pi == 0 and plans:
                pl0 = plans[min(pkt.input_frameno - 1, len(plans) - 1)]
                ch8, cw8 = a.shape[0] // 8, a.shape[1] // 8
                cells = d[: ch8 * 8, : cw8 * 8].reshape(
                    ch8, 8, cw8, 8).any(axis=(1, 3))
                import collections
                cnt = collections.Counter()
                for (ry, rx) in zip(*np.nonzero(cells)):
                    cnt[int(pl0.eff8[ry, rx])] += 1
                print("  mismatch cells by leaf size_log2:", dict(cnt))
            # 8x8 cell map of mismatches
            ch, cw = a.shape
            cells = d[: ch // 8 * 8, : cw // 8 * 8].reshape(
                ch // 8, 8, cw // 8, 8).any(axis=(1, 3))
            for r in range(cells.shape[0]):
                print("".join(".#"[int(v)] for v in cells[r]))
    print("done")


if __name__ == "__main__":
    main()
