"""Whole-bitstream golden pin: a fixed clip must encode to byte-identical
packets across refactors (the reference pins behavior via dav1d decode of
known streams; without dav1d in this image, the pinned bytes catch any
unintended bitstream change — update the hashes ONLY for an intentional
bitstream-affecting change, and say so in the commit message)."""

import hashlib

import numpy as np
import pytest

from rav1e_tpu import Config, EncoderConfig, EncoderStatus, SpeedSettings
from rav1e_tpu.decoder import decode_packet

GOLDEN_FILE = "tests/golden/bitstream_hashes.txt"


def _clip_packets(speed, device, bd=8, chroma=None, tiles=0, w=112, h=80):
    from rav1e_tpu.config import ChromaSampling

    n = 5
    ss = SpeedSettings.from_preset(speed)
    ss.device_analysis = device
    ss.device_chain = False
    cfg = Config(
        enc=EncoderConfig(
            width=w, height=h, quantizer=115, low_latency=False,
            speed_settings=ss, min_key_frame_interval=0,
            max_key_frame_interval=999, bit_depth=bd,
            chroma_sampling=chroma or ChromaSampling.Cs420,
            tile_rows=tiles, tile_cols=tiles,
        )
    )
    ctx = cfg.new_context()
    rng = np.random.default_rng(77)
    coarse = rng.integers(0, 256, (h // 8 + 2, w // 8 + 2))
    base = np.repeat(np.repeat(coarse, 8, 0), 8, 1)[:h, :w].astype(np.int64)
    shift = bd - 8
    dt = np.uint8 if bd == 8 else np.uint16
    for t in range(n):
        f = ctx.new_frame()
        for i, p in enumerate(f.planes):
            ch, cw = p.cfg.height, p.cfg.width
            if i == 0:
                arr = np.roll(base, 2 * t, axis=1) + rng.integers(-2, 3, (ch, cw))
            else:
                arr = np.full((ch, cw), 128) + rng.integers(-2, 3, (ch, cw))
            arr = np.clip(arr, 0, 255).astype(np.int64) << shift
            p.copy_from(arr.astype(dt))
        ctx.send_frame(f)
    ctx.flush()
    pkts = []
    while True:
        try:
            pkts.append(ctx.receive_packet())
        except EncoderStatus.LimitReached:
            break
    return pkts


def _cs(name):
    from rav1e_tpu.config import ChromaSampling

    return ChromaSampling[name]


# key -> clip config: the python-path pins (the C++ path is pinned
# transitively by the byte-parity matrix); covers the device-analysis
# tier, multi-tile (with LRF at s4), 10-bit, and 4:2:2 per the reference's
# speed x depth x sampling decode matrix (test_encode_decode/mod.rs:214-390)
GOLDEN_CONFIGS = {
    "s4": dict(speed=4, device=False),
    "s8": dict(speed=8, device=False),
    "s8-device": dict(speed=8, device=True, w=128, h=128),
    "s6-device-10bit": dict(speed=6, device=True, bd=10, w=128, h=128),
    "s4-tiles": dict(speed=4, device=False, tiles=1, w=128, h=128),
    "s8-422": dict(speed=8, device=False, chroma="Cs422"),
    "s5-12bit": dict(speed=5, device=False, bd=12),
}


@pytest.mark.parametrize("key", sorted(GOLDEN_CONFIGS))
def test_golden_bitstream(key):
    """Deterministic clip -> pinned per-packet sha256 (python tile path;
    the C++ path is pinned transitively by the byte-parity matrix)."""
    import rav1e_tpu.native_tile as native_tile
    from unittest import mock

    kw = dict(GOLDEN_CONFIGS[key])
    if isinstance(kw.get("chroma"), str):
        kw["chroma"] = _cs(kw["chroma"])
    with mock.patch.object(native_tile, "encode_tile_native", lambda te: None):
        pkts = _clip_packets(**kw)
    # decode parity first: the pin is only meaningful for valid streams
    state = None
    for p in pkts:
        dec, state = decode_packet(p.data, state)
        if p.rec is not None:
            for pi, dp in enumerate(dec.planes):
                a = dp.as_array()
                b = p.rec.planes[pi].as_array()
                assert np.array_equal(a, b[: a.shape[0], : a.shape[1]])
    digest = hashlib.sha256(b"".join(p.data for p in pkts)).hexdigest()

    lines = {}
    try:
        with open(GOLDEN_FILE) as fh:
            for line in fh:
                k, v = line.split()
                lines[k] = v
    except FileNotFoundError:
        pass
    if key not in lines:
        lines[key] = digest
        with open(GOLDEN_FILE, "w") as fh:
            for k, v in sorted(lines.items()):
                fh.write(f"{k} {v}\n")
        pytest.skip(f"golden {key} recorded: {digest}")
    assert lines[key] == digest, (
        f"bitstream changed for {key}: got {digest}, pinned {lines[key]} — "
        "if intentional, delete the line in tests/golden/bitstream_hashes.txt"
    )
