"""CLI multi-pass flows (reference tests/binary.rs:62-138): 1-pass bitrate,
2-pass, 3-pass (constrained middle pass re-emitting stats), reconstruction
output, and kv-string speed overrides."""

import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture()
def clip(tmp_path):
    w, h, n = 96, 64, 6
    rng = np.random.default_rng(0)
    base = np.repeat(np.repeat(rng.integers(0, 256, (10, 14)), 8, 0), 8, 1)
    path = tmp_path / "in.y4m"
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F30:1 Ip A1:1 C420jpeg\n".encode())
        for t in range(n):
            f.write(b"FRAME\n")
            y = np.clip(
                np.roll(base, 2 * t, axis=1)[:h, :w] + rng.integers(-2, 3, (h, w)),
                0, 255,
            ).astype(np.uint8)
            f.write(y.tobytes())
            f.write(np.full((h // 2, w // 2), 128, np.uint8).tobytes() * 2)
    return path


def _run(clip, out, *extra):
    cmd = [
        sys.executable, "-m", "rav1e_tpu.cli", str(clip), "-o", str(out),
        "-b", "300", "-q", "0", "-s", "8",
    ] + list(extra)
    r = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    return os.path.getsize(out)


def test_three_pass_and_recon(clip, tmp_path):
    out = tmp_path / "out.ivf"
    p1 = tmp_path / "p1.stats"
    p2 = tmp_path / "p2.stats"
    rec = tmp_path / "rec.y4m"

    assert _run(clip, out, "--first-pass", str(p1)) > 0
    assert p1.stat().st_size > 0
    # middle pass of 3: consumes pass-1 stats, emits refined stats
    assert _run(clip, out, "--second-pass", str(p1), "--first-pass", str(p2)) > 0
    assert p2.stat().st_size > 0
    # final pass with reconstruction out + kv-string speed overrides
    assert _run(
        clip, out, "--second-pass", str(p2), "--reconstruction", str(rec),
        "--set", "motion.me_method=2", "--set", "cdef=false",
    ) > 0
    data = rec.read_bytes()
    assert data.startswith(b"YUV4MPEG2")
    assert data.count(b"FRAME\n") == 6


def test_set_rejects_unknown_key(clip, tmp_path):
    cmd = [
        sys.executable, "-m", "rav1e_tpu.cli", str(clip), "-o",
        str(tmp_path / "o.ivf"), "--set", "nonsense.key=1",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode != 0
