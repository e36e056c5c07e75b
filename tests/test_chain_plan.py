"""Chain plan builder parity: the vectorized Morton-order walk must match a
direct recursive port of the native coder's partition walk
(native/tile_block.inc encode_partition + quantize_inter_blocks order)."""

import numpy as np
import pytest

from rav1e_tpu.device.chain import (
    SQ_CTX, ChainPlan, build_coeff_log, build_plan, tx_for_block,
)
from rav1e_tpu.tx import TxSize


def reference_walk(size_log2, mi_cols, mi_rows, pr_min, pr_max, tx_split):
    """Direct recursive port of encode_partition's split rule + the inter
    tx-job emission order (luma rasters, then u, then v)."""
    blocks = []

    def walk(x, y, wl):
        if x >= mi_cols or y >= mi_rows:
            return
        hbs = (1 << (wl - 2)) // 2
        if wl == 3:
            blocks.append((x, y, wl))
            return
        must_split = not ((x + hbs) < mi_cols) or not ((y + hbs) < mi_rows)
        if must_split or wl > pr_max:
            split = True
        elif wl > pr_min:
            chosen = int(size_log2[y >> 1, x >> 1])
            chosen = min(max(chosen, pr_min), pr_max)
            split = wl > chosen
        else:
            split = False
        if not split:
            blocks.append((x, y, wl))
            return
        sw = 1 << (wl - 3)
        walk(x, y, wl - 1)
        walk(x + sw, y, wl - 1)
        walk(x, y + sw, wl - 1)
        walk(x + sw, y + sw, wl - 1)

    for sby in range((mi_rows + 15) // 16):
        for sbx in range((mi_cols + 15) // 16):
            walk(sbx * 16, sby * 16, 6)

    magics = []
    for x_mi, y_mi, wl in blocks:
        s = 1 << wl
        t = tx_for_block(s, tx_split)
        n_side = s // t.width
        for by in range(n_side):
            for bx in range(n_side):
                tx_x = x_mi + bx * (t.width >> 2)
                tx_y = y_mi + by * (t.height >> 2)
                if tx_x >= mi_cols or tx_y >= mi_rows:
                    continue
                magics.append(0x5A170000 | int(t))
        ct = SQ_CTX[s]
        for p in (1, 2):
            magics.append(0x5A170000 | (p << 8) | int(ct))
    return blocks, np.asarray(magics, dtype=np.int32)


@pytest.mark.parametrize("mi_cols,mi_rows", [(16, 16), (32, 16), (26, 22),
                                             (18, 34), (48, 48)])
@pytest.mark.parametrize("pr_min,pr_max,tx_split",
                         [(3, 6, False), (4, 5, False), (5, 5, True),
                          (3, 6, True)])
def test_plan_matches_reference_walk(mi_cols, mi_rows, pr_min, pr_max,
                                     tx_split):
    rng = np.random.default_rng(mi_cols * 100 + mi_rows + pr_max)
    nby_a = ((mi_rows + 15) // 16) * 8
    nbx_a = ((mi_cols + 15) // 16) * 8
    size_log2 = rng.integers(3, 7, (nby_a, nbx_a)).astype(np.int32)

    blocks, ref_magics = reference_walk(
        size_log2, mi_cols, mi_rows, pr_min, pr_max, tx_split)
    plan = build_plan(size_log2, mi_cols, mi_rows, pr_min, pr_max, tx_split)

    assert plan.n_blk == len(blocks)
    np.testing.assert_array_equal(plan.blk_x8, [b[0] >> 1 for b in blocks])
    np.testing.assert_array_equal(plan.blk_y8, [b[1] >> 1 for b in blocks])
    np.testing.assert_array_equal(plan.blk_sl, [b[2] for b in blocks])
    assert plan.n_tx == len(ref_magics)
    np.testing.assert_array_equal(plan.magics, ref_magics)

    # every ordinal appears exactly once across the bucket grids, and each
    # grid position maps back to the magic of its bucket
    seen = np.zeros(plan.n_tx, dtype=np.int64)
    for (plane, t), g in plan.ords.items():
        vals = g[g >= 0]
        seen[vals] += 1
        expect = 0x5A170000 | (plane << 8) | t
        assert (plan.magics[vals] == expect).all()
    assert (seen == 1).all()


def test_coeff_log_layout():
    size_log2 = np.full((8, 8), 4, dtype=np.int32)
    plan = build_plan(size_log2, 16, 16, 3, 6, False)
    rng = np.random.default_rng(0)
    eobs = rng.integers(0, 5, plan.n_tx).astype(np.int32)
    levels = rng.integers(-100, 100, int(eobs.sum())).astype(np.int32)
    log_u8, nbytes = build_coeff_log(plan, eobs, levels)
    log = log_u8.view(np.int32)
    assert nbytes == 4 * (2 * plan.n_tx + eobs.sum())
    pos = 0
    li = 0
    for i in range(plan.n_tx):
        assert log[pos] == plan.magics[i]
        assert log[pos + 1] == eobs[i]
        np.testing.assert_array_equal(
            log[pos + 2 : pos + 2 + eobs[i]], levels[li : li + eobs[i]])
        pos += 2 + eobs[i]
        li += eobs[i]
