"""Validate computed top-right/bottom-left availability against the
reference's precomputed bit tables (recon_intra.rs) — bit for bit."""

import re
from pathlib import Path

import pytest

from rav1e_tpu.ops.availability import _has_bl_bit, _has_tr_bit, SB128_MI
from rav1e_tpu.partition import BlockSize

REF = Path("/root/reference/src/recon_intra.rs")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference not mounted")

# table order in recon_intra.rs (has_tr_tables / has_bl_tables)
TABLE_ORDER = [
    BlockSize.BLOCK_4X4, BlockSize.BLOCK_4X8, BlockSize.BLOCK_8X4,
    BlockSize.BLOCK_8X8, BlockSize.BLOCK_8X16, BlockSize.BLOCK_16X8,
    BlockSize.BLOCK_16X16, BlockSize.BLOCK_16X32, BlockSize.BLOCK_32X16,
    BlockSize.BLOCK_32X32, BlockSize.BLOCK_32X64, BlockSize.BLOCK_64X32,
    BlockSize.BLOCK_64X64, BlockSize.BLOCK_64X128, BlockSize.BLOCK_128X64,
    BlockSize.BLOCK_128X128, BlockSize.BLOCK_4X16, BlockSize.BLOCK_16X4,
    BlockSize.BLOCK_8X32, BlockSize.BLOCK_32X8, BlockSize.BLOCK_16X64,
    BlockSize.BLOCK_64X16,
]


def _parse_tables(kind: str):
    src = re.sub(r"//[^\n]*", "", REF.read_text())
    out = {}
    for m in re.finditer(
        rf"static {kind}_(\d+x\d+)\s*:\s*&\[u8\]\s*=\s*&\[(.*?)\];", src, re.S
    ):
        name = m.group(1)
        vals = [int(v) for v in re.findall(r"\d+", m.group(2))]
        out[name] = vals
    return out


@pytest.mark.parametrize("kind", ["has_tr", "has_bl"])
def test_computed_bits_match_reference_tables(kind):
    tables = _parse_tables(kind)
    fn = _has_tr_bit if kind == "has_tr" else _has_bl_bit
    checked = 0
    for bs in TABLE_ORDER:
        key = f"{bs.width}x{bs.height}"
        if key not in tables:
            continue
        if bs.width > 64 or bs.height > 64:
            continue  # 128-wide blocks unsupported (rav1e has no 128 SBs)
        bits = tables[key]
        rows = SB128_MI // bs.height_mi
        cols = SB128_MI // bs.width_mi
        stride = 1 << (5 - (bs.width_log2 - 2))
        for r in range(rows):
            for c in range(cols):
                idx = r * stride + c
                expected = (bits[idx // 8] >> (idx % 8)) & 1
                got = int(fn(bs.width_mi, bs.height_mi, r, c))
                assert got == expected, (kind, key, r, c, got, expected)
                checked += 1
    assert checked > 1000
