"""Deblocking vs the independent reference-transpiled oracle
(tools/oracle_deblock.py, line-by-line from /root/reference/src/deblock.rs).

This breaks the shared-code circularity of the encode-decode round trip:
ops/deblock.py filters whole edge groups as vectorized tap tensors, the
oracle per-edge with the reference's scalar chain — bit-equality across
filter sizes, levels and bit depths over adversarial tap vectors is an
independent gate."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
import oracle_deblock as O  # noqa: E402

from rav1e_tpu.ops.deblock import (  # noqa: E402
    _deblock_group4,
    _deblock_group6,
    _deblock_group8,
    _deblock_group14,
)

BDS = [8, 10, 12]
# MAX_LOOP_FILTER = 63
LEVELS = [0, 1, 2, 4, 7, 15, 31, 63]

CASES = [
    (4, _deblock_group4, O.deblock_size4_inner, 0),
    (6, _deblock_group6, O.deblock_size6_inner, 1),
    (8, _deblock_group8, O.deblock_size8_inner, 1),
    (14, _deblock_group14, O.deblock_size14_inner, 1),
]


def _tap_vectors(rng, taps, bd, n):
    """Adversarial mixes: smooth (wide path), noisy (narrow), near-flat
    boundaries (flat-threshold edges), plus pure random."""
    hi = 1 << bd
    smooth = np.clip(
        rng.integers(0, hi, (n, 1)) + rng.integers(-2 << (bd - 8), 3 << (bd - 8), (n, taps)),
        0, hi - 1,
    )
    noisy = rng.integers(0, hi, (n, taps))
    near = np.clip(
        rng.integers(0, hi, (n, 1))
        + rng.integers(-1, 2, (n, taps)) * (1 << (bd - 8)),
        0, hi - 1,
    )
    return np.concatenate([smooth, noisy, near]).astype(np.int64)


@pytest.mark.parametrize("bd", BDS)
@pytest.mark.parametrize("taps,group_fn,oracle_fn,off", CASES)
def test_deblock_groups_match_oracle(bd, taps, group_fn, oracle_fn, off):
    rng = np.random.default_rng(taps * 100 + bd)
    g = _tap_vectors(rng, taps, bd, 64)
    for level in LEVELS:
        got = group_fn(g.copy(), level, bd)
        for i in range(g.shape[0]):
            vals = [int(v) for v in g[i]]
            data = oracle_fn(vals, level, bd)
            want = list(vals)
            if data is not None:
                want[off : off + len(data)] = data
            assert got[i].tolist() == want, (
                f"taps={taps} level={level} bd={bd} row={i}\n"
                f"in={vals}\ngot={got[i].tolist()}\nwant={want}"
            )
