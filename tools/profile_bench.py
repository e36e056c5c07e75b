#!/usr/bin/env python3
"""Per-stage profile of the bench.py operating point (640x384x16, preset 6).

Runs one warm-up context, then a timed context with span tracing on, and
prints the aggregated stage summary so regressions localize to a stage.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import synth_frame  # noqa: E402
from rav1e_tpu import Config, EncoderConfig, EncoderStatus  # noqa: E402
from rav1e_tpu.utils import trace  # noqa: E402


def run(nframes: int, w: int = 640, h: int = 384, timed: bool = False):
    rng = np.random.default_rng(42)
    cfg = Config(
        enc=EncoderConfig(
            width=w, height=h, quantizer=120, low_latency=False,
            min_key_frame_interval=0, max_key_frame_interval=9999,
        )
    )
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
    return n, dt


def main():
    n, dt = run(6)  # warm-up: compiles
    print(f"warmup: {n} pkts in {dt:.1f}s", flush=True)
    trace.trace_enable()
    n, dt = run(16, timed=True)
    fps = n / dt
    norm = fps * (640 * 384) / (1920 * 1080)
    print(f"timed: {n} pkts in {dt:.2f}s = {fps:.3f} fps ({norm:.4f} norm)")
    summ = trace.stage_summary()
    for k, v in sorted(summ.items(), key=lambda kv: -kv[1]["total_ms"]):
        print(f"{k:36s} n={v['count']:4d} total={v['total_ms']:9.1f}ms mean={v['mean_ms']:8.2f}ms")


if __name__ == "__main__":
    main()
