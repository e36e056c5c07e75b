"""Device (XLA) in-loop filter stage vs the host ops implementations.

The device CDEF stage (rav1e_tpu/device/filters.py) must reproduce the
host search + apply bit-exactly: same per-SB strength map, same filtered
reconstruction (reference semantics: rdo.rs:2104 CDEF axis + cdef.rs
filter)."""

import copy

import numpy as np
import pytest

import rav1e_tpu.ops.cdef as cdef_mod
from rav1e_tpu.config import ChromaSampling
from rav1e_tpu.frame import Frame


class _Blocks:
    pass


def _mk(rng, W, H, bd, cs):
    dt = np.uint8 if bd == 8 else np.uint16
    rec = Frame.new(W, H, cs, bd)
    src = Frame.new(W, H, cs, bd)
    for f in (rec, src):
        for p in f.planes:
            arr = rng.integers(0, 1 << bd, (p.cfg.height, p.cfg.width))
            p.copy_from(arr.astype(dt))
            p.pad()
    mi_cols, mi_rows = -(-W // 4), -(-H // 4)
    blocks = _Blocks()
    blocks.cols, blocks.rows = mi_cols, mi_rows
    blocks.skip = rng.integers(0, 2, (mi_rows, mi_cols)).astype(bool)
    return rec, src, blocks


def _clone(frame):
    out = copy.copy(frame)
    out.planes = []
    for p in frame.planes:
        q = copy.copy(p)
        q.data = p.data.copy()
        out.planes.append(q)
    return out


@pytest.mark.parametrize(
    "bd,cs",
    [
        (8, ChromaSampling.Cs420),
        (10, ChromaSampling.Cs422),
        (12, ChromaSampling.Cs444),
    ],
)
def test_cdef_device_matches_host(bd, cs):
    from rav1e_tpu.device.filters import cdef_device_frame

    rng = np.random.default_rng(11)
    W, H = 136, 88
    rec, src, blocks = _mk(rng, W, H, bd, cs)
    damping, base_y, base_uv = 3, 9, 5

    # host: search then apply
    host_rec = _clone(rec)
    ys_h, us_h, idx_h, state = cdef_mod.cdef_rdo_frame(
        host_rec, src, blocks, bd, cs, W, H, damping, base_y, base_uv
    )
    cdef_mod.cdef_filter_frame(
        (damping, ys_h, us_h), host_rec, blocks, bd, cs, W, H,
        cdef_idx_map=idx_h, state=state,
    )

    # device: one program
    dev_rec = _clone(rec)
    ys_d, us_d, idx_d, applied = cdef_device_frame(
        dev_rec, src, blocks, bd, cs, W, H, damping, base_y, base_uv
    )
    assert applied
    assert ys_d == ys_h and us_d == us_h
    np.testing.assert_array_equal(idx_d, idx_h)

    for pi, (hp, dp) in enumerate(zip(host_rec.planes, dev_rec.planes)):
        np.testing.assert_array_equal(
            hp.data, dp.data, err_msg=f"plane {pi} bd={bd} cs={cs}"
        )


def test_cdef_device_all_skip():
    from rav1e_tpu.device.filters import cdef_device_frame

    rng = np.random.default_rng(3)
    rec, src, blocks = _mk(rng, 64, 64, 8, ChromaSampling.Cs420)
    blocks.skip[:] = True
    before = [p.data.copy() for p in rec.planes]
    ys, us, idx, applied = cdef_device_frame(
        rec, src, blocks, 8, ChromaSampling.Cs420, 64, 64, 3, 9, 5
    )
    assert not applied
    assert np.all(idx == 0)
    for p, b in zip(rec.planes, before):
        np.testing.assert_array_equal(p.data, b)
