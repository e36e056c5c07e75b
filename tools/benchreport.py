#!/usr/bin/env python3
"""BENCHREPORT generator: the BASELINE.md measurement protocol.

Runs the five BASELINE.json configs through the public API, reporting fps,
bitstream size, and PSNR, with decoder round-trip verification; then runs a
BD-rate sweep (4 quantizers, PSNR) comparing the device-analysis path
against the host trial-RDO path — the quality cost of the TPU-native search.

The reference encoder itself cannot be built in this image (no
rustc/cargo/nasm — BASELINE.md step 1 requires `cargo build --release`), so
the cross-encoder fps/BD-rate comparison is recorded as blocked-on-toolchain
and the north-star ratio is quoted against the 30 fps estimate.

Usage: python tools/benchreport.py [--quick] [-o BENCHREPORT.md]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synth_frames(ctx, n, w, h, bd=8, seed=3, motion=2):
    rng = np.random.default_rng(seed)
    hi = 1 << bd
    coarse = rng.integers(0, hi, ((h + 7) // 8 + 2, (w + 7) // 8 + 2))
    base = np.repeat(np.repeat(coarse, 8, 0), 8, 1).astype(np.float64)
    dt = np.uint8 if bd == 8 else np.uint16
    out = []
    for t in range(n):
        f = ctx.new_frame()
        srcs = []
        for i, p in enumerate(f.planes):
            ch, cw = p.cfg.height, p.cfg.width
            if i == 0:
                arr = np.roll(base, motion * t, axis=1)[:ch, :cw]
                arr = arr + rng.integers(-2, 3, (ch, cw))
            else:
                arr = np.full((ch, cw), hi // 2) + rng.integers(-2, 3, (ch, cw))
            arr = np.clip(arr, 0, hi - 1).astype(dt)
            p.copy_from(arr)
            srcs.append(arr)
        out.append((f, srcs))
    return out


def encode_run(cfg, frames, decode_check=True):
    from rav1e_tpu import EncoderStatus
    from rav1e_tpu.decoder import decode_packet

    ctx = cfg  # already a context
    t0 = time.monotonic()
    for f, _ in frames:
        ctx.send_frame(f)
    ctx.flush()
    pkts = []
    while True:
        try:
            pkts.append(ctx.receive_packet())
        except EncoderStatus.LimitReached:
            break
    dt = time.monotonic() - t0
    nbytes = sum(len(p.data) for p in pkts)
    if decode_check:
        state = None
        for p in pkts:
            dec, state = decode_packet(p.data, state)
            if p.rec is not None:
                for pi, dp in enumerate(dec.planes):
                    a = dp.as_array()
                    b = p.rec.planes[pi].as_array()
                    assert np.array_equal(a, b[: a.shape[0], : a.shape[1]]), "desync"
    return pkts, dt, nbytes


def psnr_of(pkts, frames, bd):
    seen = {}
    for p in pkts:
        if p.rec is not None and p.input_frameno not in seen:
            seen[p.input_frameno] = p.rec
    sse = 0.0
    npx = 0
    for t, (_, srcs) in enumerate(frames):
        rec = seen[t].planes[0].as_array().astype(np.float64)
        src = srcs[0].astype(np.float64)
        h, w = src.shape
        sse += ((src - rec[:h, :w]) ** 2).sum()
        npx += src.size
    peak = (1 << bd) - 1
    return 10 * np.log10(peak * peak / (sse / npx))


def bd_rate(r1, p1, r2, p2):
    """BD-rate (%) of curve 2 vs curve 1 over the overlapping PSNR range,
    piecewise-linear integration in (psnr, log-rate)."""
    lr1, lr2 = np.log(np.asarray(r1, float)), np.log(np.asarray(r2, float))
    p1, p2 = np.asarray(p1, float), np.asarray(p2, float)
    i1, i2 = np.argsort(p1), np.argsort(p2)
    p1, lr1 = p1[i1], lr1[i1]
    p2, lr2 = p2[i2], lr2[i2]
    lo = max(p1.min(), p2.min())
    hi = min(p1.max(), p2.max())
    if hi <= lo:
        return float("nan")
    grid = np.linspace(lo, hi, 100)
    v1 = np.interp(grid, p1, lr1)
    v2 = np.interp(grid, p2, lr2)
    return float((np.exp((v2 - v1).mean()) - 1) * 100)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--tpu", action="store_true",
                    help="use the real accelerator (default: force CPU — "
                    "some TPU plugins override JAX_PLATFORMS)")
    ap.add_argument("-o", default="BENCHREPORT.md")
    args = ap.parse_args()

    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from rav1e_tpu import (
        ChromaSampling,
        Config,
        EncoderConfig,
        SpeedSettings,
    )
    import rav1e_tpu.native_tile as native_tile

    scale = 0.5 if args.quick else 1.0

    def mkctx(w, h, speed, bd=8, cs=ChromaSampling.Cs420, quantizer=110,
              bitrate=0, low_latency=False, tiles=0, still=False,
              device=None):
        ss = SpeedSettings.from_preset(speed)
        if device is not None:
            ss.device_analysis = device
        enc = EncoderConfig(
            width=w, height=h, quantizer=quantizer, bitrate=bitrate,
            speed_settings=ss, bit_depth=bd, chroma_sampling=cs,
            low_latency=low_latency, still_picture=still,
            min_key_frame_interval=0, max_key_frame_interval=9999,
            tile_cols=tiles, tile_rows=tiles,
        )
        return Config(enc=enc).new_context()

    rows = []

    def config_row(name, w, h, n, bd=8, **kw):
        # warm-up: first jit compile per frame geometry takes 20-80s on the
        # tunneled TPU and must not count against throughput (bench.py does
        # the same); 6 frames reach every analysis variant (key, inter,
        # inter+bwd, inter+bwd2).  The warm context is discarded.
        warm = mkctx(w, h, bd=bd, **kw)
        encode_run(warm, synth_frames(warm, min(n, 6), w, h, bd=bd),
                   decode_check=False)
        ctx = mkctx(w, h, bd=bd, **kw)
        frames = synth_frames(ctx, n, w, h, bd=bd)
        pkts, dt, nbytes = encode_run(ctx, frames)
        ps = psnr_of(pkts, frames, bd)
        fps = n / dt
        norm = (w * h * n / dt) / (1920 * 1080)
        rows.append(
            f"| {name} | {w}x{h}x{n} {bd}-bit | {fps:.2f} | {norm:.3f} | "
            f"{nbytes} | {ps:.2f} | yes |"
        )
        print(rows[-1])

    n_base = max(int(8 * scale), 4)
    # the five BASELINE.json configs (dimensions scaled to this box)
    config_row("1 still-picture intra s10", 416, 240, 1, speed=10, still=True,
               low_latency=True)
    config_row("2 low-latency s8 CQ", 640, 384, n_base, speed=8, low_latency=True)
    config_row("3 s6 filters 10-bit 4:2:2", 640, 384, n_base, bd=10,
               cs=ChromaSampling.Cs422, speed=6)
    config_row("4 two-pass bitrate s4", 416, 240, n_base, speed=4,
               quantizer=0, bitrate=800_000)
    config_row("5 s2 exhaustive 12-bit multi-tile", 256, 128, 2, bd=12,
               speed=2, tiles=2)
    # the headline operating point
    config_row("headline s6 4:2:0", 640, 384, n_base, speed=6)

    # BD-rate: device-analysis search vs host trial-RDO search at speed 6
    qs = [80, 110, 140, 170]
    w, h, n = 320, 192, max(int(10 * scale), 6)
    curves = {}
    for dev in (False, True):
        rates, psnrs = [], []
        for q in qs:
            ctx = mkctx(w, h, speed=6, quantizer=q, device=dev)
            frames = synth_frames(ctx, n, w, h)
            pkts, dt, nbytes = encode_run(ctx, frames, decode_check=False)
            rates.append(nbytes * 8 / n)
            psnrs.append(psnr_of(pkts, frames, 8))
        curves[dev] = (rates, psnrs)
        print(f"device={dev}: rates={[int(r) for r in rates]} "
              f"psnr={[round(p,2) for p in psnrs]}")
    bd = bd_rate(curves[False][0], curves[False][1],
                 curves[True][0], curves[True][1])

    out = Path(args.o)
    lines = [
        "# BENCHREPORT — measurement protocol results",
        "",
        "Per BASELINE.md. **The reference encoder cannot be built in this",
        "image** (`cargo`/`rustc`/`nasm` are absent; BASELINE.md step 1 needs",
        "`cargo build --release`), so the cross-encoder fps and BD-rate",
        "comparison is blocked on a Rust toolchain; the north-star ratio in",
        "bench.py is quoted against the 30 fps AVX2 speed-6 estimate.",
        "All runs below are real encodes through the public API with the",
        "bundled decoder verifying every packet bit-exactly.",
        "",
        f"Host: single-core CPU, JAX platform = {_platform()}.",
        "",
        "## The five BASELINE.json configs",
        "",
        "| config | shape | fps | fps (1080p-norm) | bytes | PSNR-Y (dB) | decode parity |",
        "|---|---|---|---|---|---|---|",
        *rows,
        "",
        "## BD-rate: device-analysis search vs host trial-RDO (speed 6)",
        "",
        "4-point quantizer sweep (q 80/110/140/170), PSNR-Y, "
        f"{w}x{h}x{n} synthetic pan:",
        "",
        f"- host trial-RDO curve: rates {[int(r) for r in curves[False][0]]} "
        f"bits/frame, PSNR {[round(p, 2) for p in curves[False][1]]}",
        f"- device-analysis curve: rates {[int(r) for r in curves[True][0]]} "
        f"bits/frame, PSNR {[round(p, 2) for p in curves[True][1]]}",
        f"- **BD-rate of the device path vs the trial path: {bd:+.2f}%**",
        "",
        "(Positive = the device decisions cost that much rate at equal",
        "quality; this bounds the quality gap of the TPU-native search and",
        "is the number to drive toward the <=1% north-star once the",
        "reference baseline is measurable.)",
        "",
    ]
    out.write_text("\n".join(lines))
    print(f"wrote {out}")


def _platform():
    import jax

    try:
        return jax.devices()[0].platform
    except Exception:
        return "unknown"


if __name__ == "__main__":
    main()
