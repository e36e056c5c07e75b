"""Native deblock parity vs the vectorized numpy reference implementation."""

import numpy as np
import pytest

from rav1e_tpu import native
from rav1e_tpu.context import FrameBlocks
from rav1e_tpu.frame import Plane
from rav1e_tpu.ops import deblock as D
from rav1e_tpu.partition import BlockSize
from rav1e_tpu.tx import TxSize

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _random_state(w, h, bd, seed):
    rng = np.random.default_rng(seed)
    mi_cols, mi_rows = (w + 3) >> 2, (h + 3) >> 2
    blocks = FrameBlocks(mi_cols, mi_rows)
    # random but self-consistent block/tx tiling on an 8x8-mi grid
    for y in range(0, mi_rows, 4):
        for x in range(0, mi_cols, 4):
            bs = rng.choice(
                [BlockSize.BLOCK_16X16, BlockSize.BLOCK_8X8, BlockSize.BLOCK_8X16]
            )
            tx = {
                BlockSize.BLOCK_16X16: TxSize.TX_16X16,
                BlockSize.BLOCK_8X8: TxSize.TX_8X8,
                BlockSize.BLOCK_8X16: TxSize.TX_8X16,
            }[bs]
            h_mi = min(4, mi_rows - y)
            w_mi = min(4, mi_cols - x)
            blocks.bsize[y : y + h_mi, x : x + w_mi] = int(bs)
            blocks.tx_size[y : y + h_mi, x : x + w_mi] = int(tx)
            blocks.skip[y : y + h_mi, x : x + w_mi] = rng.random() < 0.3
            blocks.ref_frames[y : y + h_mi, x : x + w_mi, 0] = (
                0 if rng.random() < 0.5 else 1
            )
    return blocks, rng


@pytest.mark.parametrize("bd", [8, 10])
@pytest.mark.parametrize("dims", [(64, 64), (99, 75)])
def test_deblock_plane_native_matches_numpy(bd, dims):
    w, h = dims
    blocks, rng = _random_state(w, h, bd, seed=w + bd)
    hi = 1 << bd
    dt = np.uint8 if bd == 8 else np.uint16
    for pli, (xd, yd) in enumerate([(0, 0), (1, 1)]):
        pw, ph = (w + xd) >> xd, (h + yd) >> yd
        pl_a = Plane.new(pw, ph, xd, yd, bd)
        pl_a.copy_from(rng.integers(0, hi, (ph, pw)).astype(dt))
        pl_b = Plane(pl_a.cfg, bd, pl_a.data.copy())
        levels = [31, 27, 24, 20]
        pad = pl_a.cfg.pad
        D.deblock_plane(
            levels, pl_a.data[pad:, pad:], blocks, pli, pw, ph, bd, xd, yd
        )
        assert D.deblock_plane_native(levels, pl_b, blocks, pli, pw, ph, bd, xd, yd)
        assert np.array_equal(pl_a.data, pl_b.data), f"plane {pli} bd {bd}"


def test_deblock_search_native_matches_numpy(monkeypatch):
    from rav1e_tpu.config import ChromaSampling
    from rav1e_tpu.frame import Frame

    w, h, bd = 96, 64, 8
    blocks, rng = _random_state(w, h, bd, seed=1)
    src = Frame.new(w, h, ChromaSampling.Cs420, bd)
    rec = Frame.new(w, h, ChromaSampling.Cs420, bd)
    for f in (src, rec):
        for p in f.planes:
            p.copy_from(
                rng.integers(0, 256, (p.cfg.height, p.cfg.width)).astype(np.uint8)
            )
    fast = [28, 28, 20, 20]
    got = D.deblock_search_levels(fast, rec, src, blocks, w, h, bd, ChromaSampling.Cs420)
    # force the numpy search path
    monkeypatch.setattr(native, "get_lib", lambda: None)
    want = D.deblock_search_levels(fast, rec, src, blocks, w, h, bd, ChromaSampling.Cs420)
    assert got == want
