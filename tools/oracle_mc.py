#!/usr/bin/env python3
"""Independent 8-tap motion-compensation oracle, transpiled line-by-line
from the reference's Rust implementation (/root/reference/src/mc.rs mod
rust: put_8tap :250-358, prep_8tap :360-452, mc_avg :454-480, get_filter
:268-276, SUBPEL_FILTERS :110-216).

tests/test_oracle_mc.py asserts bit-equality of rav1e_tpu/ops/mc.py (and the
native enc_put_8tap/enc_prep_8tap/enc_mc_avg) against this oracle for every
filter mode and fractional phase — an independent gate for the MC family.
"""

from __future__ import annotations

import numpy as np

REGULAR, SMOOTH, SHARP, BILINEAR = 0, 1, 2, 3

# SUBPEL_FILTERS (mc.rs:110-216): [filter_idx][frac][tap]
SUBPEL_FILTERS = [
    # REGULAR (8-tap)
    [[0, 0, 0, 128, 0, 0, 0, 0], [0, 2, -6, 126, 8, -2, 0, 0],
     [0, 2, -10, 122, 18, -4, 0, 0], [0, 2, -12, 116, 28, -8, 2, 0],
     [0, 2, -14, 110, 38, -10, 2, 0], [0, 2, -14, 102, 48, -12, 2, 0],
     [0, 2, -16, 94, 58, -12, 2, 0], [0, 2, -14, 84, 66, -12, 2, 0],
     [0, 2, -14, 76, 76, -14, 2, 0], [0, 2, -12, 66, 84, -14, 2, 0],
     [0, 2, -12, 58, 94, -16, 2, 0], [0, 2, -12, 48, 102, -14, 2, 0],
     [0, 2, -10, 38, 110, -14, 2, 0], [0, 2, -8, 28, 116, -12, 2, 0],
     [0, 0, -4, 18, 122, -10, 2, 0], [0, 0, -2, 8, 126, -6, 2, 0]],
    # SMOOTH
    [[0, 0, 0, 128, 0, 0, 0, 0], [0, 2, 28, 62, 34, 2, 0, 0],
     [0, 0, 26, 62, 36, 4, 0, 0], [0, 0, 22, 62, 40, 4, 0, 0],
     [0, 0, 20, 60, 42, 6, 0, 0], [0, 0, 18, 58, 44, 8, 0, 0],
     [0, 0, 16, 56, 46, 10, 0, 0], [0, -2, 16, 54, 48, 12, 0, 0],
     [0, -2, 14, 52, 52, 14, -2, 0], [0, 0, 12, 48, 54, 16, -2, 0],
     [0, 0, 10, 46, 56, 16, 0, 0], [0, 0, 8, 44, 58, 18, 0, 0],
     [0, 0, 6, 42, 60, 20, 0, 0], [0, 0, 4, 40, 62, 22, 0, 0],
     [0, 0, 4, 36, 62, 26, 0, 0], [0, 0, 2, 34, 62, 28, 2, 0]],
    # SHARP
    [[0, 0, 0, 128, 0, 0, 0, 0], [-2, 2, -6, 126, 8, -2, 2, 0],
     [-2, 6, -12, 124, 16, -6, 4, -2], [-2, 8, -18, 120, 26, -10, 6, -2],
     [-4, 10, -22, 116, 38, -14, 6, -2], [-4, 10, -22, 108, 48, -18, 8, -2],
     [-4, 10, -24, 100, 60, -20, 8, -2], [-4, 10, -24, 90, 70, -22, 10, -2],
     [-4, 12, -24, 80, 80, -24, 12, -4], [-2, 10, -22, 70, 90, -24, 10, -4],
     [-2, 8, -20, 60, 100, -24, 10, -4], [-2, 8, -18, 48, 108, -22, 10, -4],
     [-2, 6, -14, 38, 116, -22, 10, -4], [-2, 6, -10, 26, 120, -18, 8, -2],
     [-2, 4, -6, 16, 124, -12, 6, -2], [0, 2, -2, 8, 126, -6, 2, -2]],
    # BILINEAR
    [[0, 0, 0, 128, 0, 0, 0, 0], [0, 0, 0, 120, 8, 0, 0, 0],
     [0, 0, 0, 112, 16, 0, 0, 0], [0, 0, 0, 104, 24, 0, 0, 0],
     [0, 0, 0, 96, 32, 0, 0, 0], [0, 0, 0, 88, 40, 0, 0, 0],
     [0, 0, 0, 80, 48, 0, 0, 0], [0, 0, 0, 72, 56, 0, 0, 0],
     [0, 0, 0, 64, 64, 0, 0, 0], [0, 0, 0, 56, 72, 0, 0, 0],
     [0, 0, 0, 48, 80, 0, 0, 0], [0, 0, 0, 40, 88, 0, 0, 0],
     [0, 0, 0, 32, 96, 0, 0, 0], [0, 0, 0, 24, 104, 0, 0, 0],
     [0, 0, 0, 16, 112, 0, 0, 0], [0, 0, 0, 8, 120, 0, 0, 0]],
    # REGULAR4 (4-tap, filter_idx 4)
    [[0, 0, 0, 128, 0, 0, 0, 0], [0, 0, -4, 126, 8, -2, 0, 0],
     [0, 0, -8, 122, 18, -4, 0, 0], [0, 0, -10, 116, 28, -6, 0, 0],
     [0, 0, -12, 110, 38, -8, 0, 0], [0, 0, -12, 102, 48, -10, 0, 0],
     [0, 0, -14, 94, 58, -10, 0, 0], [0, 0, -12, 84, 66, -10, 0, 0],
     [0, 0, -12, 76, 76, -12, 0, 0], [0, 0, -10, 66, 84, -12, 0, 0],
     [0, 0, -10, 58, 94, -14, 0, 0], [0, 0, -10, 48, 102, -12, 0, 0],
     [0, 0, -8, 38, 110, -12, 0, 0], [0, 0, -6, 28, 116, -10, 0, 0],
     [0, 0, -4, 18, 122, -8, 0, 0], [0, 0, -2, 8, 126, -4, 0, 0]],
    # SMOOTH4 (filter_idx 5)
    [[0, 0, 0, 128, 0, 0, 0, 0], [0, 0, 30, 62, 34, 2, 0, 0],
     [0, 0, 26, 62, 36, 4, 0, 0], [0, 0, 22, 62, 40, 4, 0, 0],
     [0, 0, 20, 60, 42, 6, 0, 0], [0, 0, 18, 58, 44, 8, 0, 0],
     [0, 0, 16, 56, 46, 10, 0, 0], [0, 0, 14, 54, 48, 12, 0, 0],
     [0, 0, 12, 52, 52, 12, 0, 0], [0, 0, 12, 48, 54, 14, 0, 0],
     [0, 0, 10, 46, 56, 16, 0, 0], [0, 0, 8, 44, 58, 18, 0, 0],
     [0, 0, 6, 42, 60, 20, 0, 0], [0, 0, 4, 40, 62, 22, 0, 0],
     [0, 0, 4, 36, 62, 26, 0, 0], [0, 0, 2, 34, 62, 30, 0, 0]],
]


def round_shift(v, s):
    return (v + (1 << (s - 1))) >> s


def get_filter(mode, frac, length):
    idx = mode if (mode == BILINEAR or length > 4) else min(mode, 1) + 4
    return SUBPEL_FILTERS[idx][frac]


def put_8tap(ref, x0, y0, w, h, col_frac, row_frac, mode_x, mode_y, bd):
    """ref: 2-D int array indexable at [y0-3 .. y0+h+4, x0-3 .. x0+w+4]."""
    yf = get_filter(mode_y, row_frac, h)
    xf = get_filter(mode_x, col_frac, w)
    max_val = (1 << bd) - 1
    ib = 4 - (2 if bd == 12 else 0)
    out = np.zeros((h, w), dtype=np.int64)
    if col_frac == 0 and row_frac == 0:
        return ref[y0 : y0 + h, x0 : x0 + w].astype(np.int64)
    if col_frac == 0:
        for r in range(h):
            for c in range(w):
                acc = sum(yf[k] * int(ref[y0 + r - 3 + k, x0 + c]) for k in range(8))
                out[r, c] = min(max(round_shift(acc, 7), 0), max_val)
        return out
    if row_frac == 0:
        for r in range(h):
            for c in range(w):
                acc = sum(xf[k] * int(ref[y0 + r, x0 + c - 3 + k]) for k in range(8))
                out[r, c] = min(max(round_shift(round_shift(acc, 7 - ib), ib), 0), max_val)
        return out
    inter = np.zeros((h + 7, w), dtype=np.int64)
    for r in range(h + 7):
        for c in range(w):
            acc = sum(xf[k] * int(ref[y0 + r - 3, x0 + c - 3 + k]) for k in range(8))
            v = round_shift(acc, 7 - ib)
            inter[r, c] = ((v + (1 << 15)) & 0xFFFF) - (1 << 15)  # as i16
    for r in range(h):
        for c in range(w):
            acc = sum(yf[k] * int(inter[r + k, c]) for k in range(8))
            out[r, c] = min(max(round_shift(acc, 7 + ib), 0), max_val)
    return out


def prep_8tap(ref, x0, y0, w, h, col_frac, row_frac, mode_x, mode_y, bd):
    """Compound intermediate (mc.rs:360-452)."""
    yf = get_filter(mode_y, row_frac, h)
    xf = get_filter(mode_x, col_frac, w)
    ib = 4 - (2 if bd == 12 else 0)
    bias = 0 if bd == 8 else 8192
    out = np.zeros((h, w), dtype=np.int64)
    if col_frac == 0 and row_frac == 0:
        return (ref[y0 : y0 + h, x0 : x0 + w].astype(np.int64) << ib) - bias
    if col_frac == 0:
        for r in range(h):
            for c in range(w):
                acc = sum(yf[k] * int(ref[y0 + r - 3 + k, x0 + c]) for k in range(8))
                out[r, c] = round_shift(acc, 7 - ib) - bias
        return out
    if row_frac == 0:
        for r in range(h):
            for c in range(w):
                acc = sum(xf[k] * int(ref[y0 + r, x0 + c - 3 + k]) for k in range(8))
                out[r, c] = round_shift(acc, 7 - ib) - bias
        return out
    inter = np.zeros((h + 7, w), dtype=np.int64)
    for r in range(h + 7):
        for c in range(w):
            acc = sum(xf[k] * int(ref[y0 + r - 3, x0 + c - 3 + k]) for k in range(8))
            v = round_shift(acc, 7 - ib)
            inter[r, c] = ((v + (1 << 15)) & 0xFFFF) - (1 << 15)
    for r in range(h):
        for c in range(w):
            acc = sum(yf[k] * int(inter[r + k, c]) for k in range(8))
            out[r, c] = round_shift(acc, 7) - bias
    return out


def mc_avg(t1, t2, bd):
    ib = 4 - (2 if bd == 12 else 0)
    bias = 0 if bd == 8 else 2 * 8192
    v = (t1.astype(np.int64) + t2.astype(np.int64) + bias + (1 << ib)) >> (ib + 1)
    return np.clip(v, 0, (1 << bd) - 1)
