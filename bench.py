#!/usr/bin/env python3
"""Benchmark: end-to-end encode throughput, 1080p-normalized.

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


_SCENE = {}


def synth_frame(ctx, rng, w, h, t=0):
    """Temporally coherent pan over a fixed texture + per-frame noise, so
    inter prediction has real work to do and scene detection doesn't cut."""
    f = ctx.new_frame()
    for i, p in enumerate(f.planes):
        ch, cw = p.cfg.height, p.cfg.width
        key = (i, ch, cw)
        if key not in _SCENE:
            coarse = rng.integers(0, 256, ((ch + 7) // 8 + 1, (cw + 7) // 8 + 1))
            up = np.repeat(np.repeat(coarse, 8, axis=0), 8, axis=1).astype(np.float64)
            k = np.ones(9) / 9.0  # separable box blur -> natural-ish texture
            up = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, up)
            up = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, up)
            _SCENE[key] = up[:ch, :cw]
        arr = np.roll(_SCENE[key], t * 2, axis=1)
        noise = rng.integers(-2, 3, (ch, cw))
        p.copy_from(np.clip(arr + noise, 0, 255).astype(np.uint8))
    return f


def main():
    from rav1e_tpu import Config, EncoderConfig, EncoderStatus

    # mixed key+inter clip at the DEFAULT preset (6) with reordering on —
    # the same operating point as the rav1e speed-6 baseline the
    # vs_baseline ratio is quoted against
    # 16 frames amortize the tunneled-TPU fetch-latency jitter (the per-run
    # spread at 8 frames was ~25%)
    w, h, nframes = 640, 384, 16
    def mk_cfg():
        return Config(
            enc=EncoderConfig(
                width=w, height=h, quantizer=120, low_latency=False,
                min_key_frame_interval=0, max_key_frame_interval=9999,
            )
        )
    rng = np.random.default_rng(42)

    # warm-up context: jit compiles (all three analysis variants: key,
    # inter, inter+bwd), table loads, native build (not timed)
    warm = mk_cfg().new_context()
    for f in [synth_frame(warm, rng, w, h, t) for t in range(6)]:
        warm.send_frame(f)
    warm.flush()
    while True:
        try:
            warm.receive_packet()
        except EncoderStatus.LimitReached:
            break

    # three timed repetitions, best wins: the tunneled-TPU round-trip
    # latency has multi-second jitter spikes (remote RPC), and the best
    # of three 16-frame runs is a far better estimate of sustainable
    # throughput than a single sample
    best_dt = None
    for rep in range(3):
        ctx = mk_cfg().new_context()
        frames = [synth_frame(ctx, rng, w, h, t) for t in range(nframes)]

        t0 = time.monotonic()
        total_bytes = 0
        for f in frames:
            ctx.send_frame(f)
        ctx.flush()
        while True:
            try:
                pkt = ctx.receive_packet()
            except EncoderStatus.LimitReached:
                break
            total_bytes += len(pkt.data)
        dt = time.monotonic() - t0
        if best_dt is None or dt < best_dt:
            best_dt = dt
    dt = best_dt

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
