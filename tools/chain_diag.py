#!/usr/bin/env python3
"""Diagnose chain fallbacks + per-stage device times at the bench point."""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import synth_frame  # noqa: E402
from rav1e_tpu import Config, EncoderConfig, EncoderStatus  # noqa: E402


def main():
    w, h, nframes = 640, 384, 16
    rng = np.random.default_rng(42)
    cfg = Config(
        enc=EncoderConfig(
            width=w, height=h, quantizer=120, low_latency=False,
            min_key_frame_interval=0, max_key_frame_interval=9999,
        )
    )

    # instrument: count chain outcomes
    from rav1e_tpu.encoder import pipeline as pl
    from rav1e_tpu.device import chain as ch

    outcomes = []
    orig_fetch = ch.fetch_chain
    def fetch_chain(handle):
        r = orig_fetch(handle)
        if r.overflow:
            outcomes.append("overflow")
        return r
    ch.fetch_chain = fetch_chain

    from rav1e_tpu import native_tile as nt
    orig_enc = nt.encode_tile_native
    def enc(te):
        r = orig_enc(te)
        if r is None and getattr(te, "coeff_log_in", None) is not None:
            outcomes.append("replay_diverged")
        elif getattr(te, "coeff_log_in", None) is not None:
            outcomes.append("ok")
        return r
    nt.encode_tile_native = enc

    orig_chain = pl.FramePipeline._encode_frame_chain
    def chain(self, fi, frame, frame_type, plan, input_frameno, q, **kw):
        n0 = len(outcomes)
        r = orig_chain(self, fi, frame, frame_type, plan, input_frameno, q,
                       **kw)
        if r is None and len(outcomes) == n0:
            outcomes.append("pre_dispatch_skip")
        return r
    pl.FramePipeline._encode_frame_chain = chain

    for rep in range(2):
        ctx = cfg.new_context()
        frames = [synth_frame(ctx, rng, w, h, t) for t in range(nframes)]
        t0 = time.monotonic()
        for f in frames:
            ctx.send_frame(f)
        ctx.flush()
        n = 0
        while True:
            try:
                ctx.receive_packet()
                n += 1
            except EncoderStatus.LimitReached:
                break
            except EncoderStatus.Encoded:
                continue
        dt = time.monotonic() - t0
        if rep == 0:
            print(f"warmup {n} pkts {dt:.1f}s outcomes={outcomes}")
            outcomes.clear()
    print(f"timed: {n} pkts in {dt:.2f}s")
    from collections import Counter
    print("chain outcomes:", Counter(outcomes))


if __name__ == "__main__":
    main()
