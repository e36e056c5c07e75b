"""Intra predictor unit tests (hand-computable cases + invariants)."""

import numpy as np
import pytest

from rav1e_tpu.ops.intra import IntraEdge, predict_intra
from rav1e_tpu.partition import PredictionMode as PM


def make_edge(above, left, tl, have_above=True, have_left=True):
    return IntraEdge(
        above=np.asarray(above, dtype=np.int32),
        left=np.asarray(left, dtype=np.int32),
        top_left=tl,
        have_above=have_above,
        have_left=have_left,
    )


def test_dc_both():
    e = make_edge([10] * 8, [30] * 8, 20)
    p = predict_intra(PM.DC_PRED, e, 4, 4, 8)
    assert (p == 20).all()


def test_dc_unavailable():
    e = make_edge([0] * 8, [0] * 8, 0, have_above=False, have_left=False)
    assert (predict_intra(PM.DC_PRED, e, 4, 4, 8) == 128).all()
    assert (predict_intra(PM.DC_PRED, e, 4, 4, 10) == 512).all()


def test_v_h():
    above = [1, 2, 3, 4, 9, 9, 9, 9]
    left = [5, 6, 7, 8, 9, 9, 9, 9]
    e = make_edge(above, left, 0)
    v = predict_intra(PM.V_PRED, e, 4, 4, 8)
    assert (v == np.array([1, 2, 3, 4])).all()
    h = predict_intra(PM.H_PRED, e, 4, 4, 8)
    assert (h.T == np.array([5, 6, 7, 8])).all()


def test_paeth_prefers_closest():
    e = make_edge([100] * 8, [50] * 8, 90)
    p = predict_intra(PM.PAETH_PRED, e, 4, 4, 8)
    # base = 50+100-90 = 60 -> |60-50|=10 (left), |60-100|=40, |60-90|=30 -> left
    assert (p == 50).all()


def test_paeth_downgrades_at_corner():
    e = make_edge([77] * 8, [55] * 8, 66, have_above=False, have_left=False)
    p = predict_intra(PM.PAETH_PRED, e, 4, 4, 8)
    assert (p == 128).all()  # becomes DC_128


def test_smooth_constant():
    e = make_edge([42] * 8, [42] * 8, 42)
    for m in (PM.SMOOTH_PRED, PM.SMOOTH_V_PRED, PM.SMOOTH_H_PRED):
        assert (predict_intra(m, e, 4, 4, 8) == 42).all(), m


def test_smooth_interpolates():
    # top=0, bottom-left=255: smooth_v should ramp downward
    e = make_edge([0] * 8, [255] * 8, 0)
    p = predict_intra(PM.SMOOTH_V_PRED, e, 4, 4, 8)
    col = p[:, 0]
    assert col[0] < col[1] < col[2] < col[3]
    # weights for 4: [255,149,85,64] -> p = (w*top + (256-w)*bottom + 128)>>8
    expect = [(w * 0 + (256 - w) * 255 + 128) >> 8 for w in (255, 149, 85, 64)]
    assert col.tolist() == expect


def test_d45_diagonal():
    # 45 degrees: prediction walks up-right; with a ramp above,
    # row i shifts the ramp by i+1
    above = np.arange(1, 9, dtype=np.int32) * 10
    e = make_edge(above, [0] * 8, 0)
    p = predict_intra(PM.D45_PRED, e, 4, 4, 8)
    # dx=64 => idx=(i+1)*64, base=(i+1), shift=0 -> p[i][j]=above[i+1+j]
    for i in range(4):
        for j in range(4):
            assert p[i, j] == above[i + 1 + j], (i, j, p)


def test_d203_uses_left():
    left = np.arange(1, 9, dtype=np.int32) * 10
    e = make_edge([0] * 8, left, 0)
    p = predict_intra(PM.D203_PRED, e, 4, 4, 8)
    # dy=64 (270-203=67? no: dr[270-203=67]=27) -- just check it's left-driven
    assert p.min() >= left.min() - 1 and p.max() <= left.max() + 1


def test_d135_mixes_above_left():
    above = [100] * 8
    left = [50] * 8
    e = make_edge(above, left, 75)
    p = predict_intra(PM.D135_PRED, e, 8, 8, 8)
    assert p.min() >= 50 and p.max() <= 100


def test_cfl_applies_alpha():
    e = make_edge([100] * 8, [100] * 8, 100)
    ac = np.zeros((4, 4), dtype=np.int32)
    ac[0, 0] = 64  # q3 => 8
    p = predict_intra(PM.UV_CFL_PRED, e, 4, 4, 8, alpha=2, ac=ac)
    # dc=100; contribution = (2*64 + 32)>>6 = 2
    assert p[0, 0] == 102
    assert p[1, 1] == 100


def test_directional_angle_deltas_differ():
    rng = np.random.default_rng(0)
    above = rng.integers(0, 256, 16).astype(np.int32)
    left = rng.integers(0, 256, 16).astype(np.int32)
    e = make_edge(above, left, 128)
    p0 = predict_intra(PM.D45_PRED, e, 8, 8, 8, angle_delta=0)
    p1 = predict_intra(PM.D45_PRED, e, 8, 8, 8, angle_delta=2)
    assert not np.array_equal(p0, p1)
