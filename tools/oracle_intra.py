#!/usr/bin/env python3
"""Independent intra-prediction oracle, transpiled line-by-line from the
reference's Rust implementations (/root/reference/src/predict.rs mod rust:
pred_dc :786, pred_dc_128 :804, pred_dc_left :814, pred_dc_top :828,
pred_h/pred_v :842-858, pred_paeth :860, pred_smooth{,_h,_v} :889-1040,
filter_edge :1206, upsample_edge :1234, select_ief_* :1125-1204,
pred_directional :1301).

Conventions follow the REFERENCE, not rav1e_tpu: ``left`` is stored
bottom-to-top, ``top_left`` is a 1-element slice.  tests/test_oracle_intra.py
maps between the conventions and asserts bit-equality of every mode against
rav1e_tpu/ops/intra.py — an independent correctness gate for the intra
family (the encode-decode round trip shares that code, this oracle does not).
"""

from __future__ import annotations

import numpy as np

SM_WEIGHT_LOG2_SCALE = 8

# sm_weight_arrays (predict.rs:580-604): indexed from `width`/`height`
_SM = np.zeros(130, dtype=np.int64)
_SM[4:8] = [255, 149, 85, 64]
_SM[8:16] = [255, 197, 146, 105, 73, 50, 37, 32]
_SM[16:32] = [255, 225, 196, 170, 145, 123, 102, 84, 68, 54, 43, 33, 26, 20,
              17, 16]
_SM[32:64] = [255, 240, 225, 210, 196, 182, 169, 157, 145, 133, 122, 111,
              101, 92, 83, 74, 66, 59, 52, 45, 39, 34, 29, 25, 21, 17, 14,
              12, 10, 9, 8, 8]
_SM[64:128] = [255, 248, 240, 233, 225, 218, 210, 203, 196, 189, 182, 176,
               169, 163, 156, 150, 144, 138, 133, 127, 121, 116, 111, 106,
               101, 96, 91, 86, 82, 77, 73, 69, 65, 61, 57, 54, 50, 47, 44,
               41, 38, 35, 32, 29, 27, 25, 22, 20, 18, 16, 15, 13, 12, 10,
               9, 8, 7, 6, 6, 5, 5, 4, 4, 4]


def _dr_intra_derivative(p_angle: int) -> int:
    # predict.rs:1268 (keyed by angle)
    return {
        4: 1023, 7: 547, 10: 372, 14: 273, 17: 215, 20: 178, 23: 151,
        26: 132, 29: 116, 32: 102, 36: 90, 39: 80, 42: 71, 45: 64, 48: 57,
        51: 51, 54: 45, 58: 40, 61: 35, 64: 31, 67: 27, 70: 23, 73: 19,
        76: 15, 81: 11, 84: 7, 87: 3,
        # the reference uses 3/6/9 for the first entries (predict.rs table)
        3: 1023, 6: 547, 9: 372,
    }[p_angle]


def round_shift(v: int, s: int) -> int:
    return (v + (1 << (s - 1))) >> s


def pred_dc(above, left, w, h):
    edges = list(left[:h]) + list(above[:w])
    avg = (sum(int(v) for v in edges) + ((w + h) >> 1)) // (w + h)
    return np.full((h, w), avg, dtype=np.int64)


def pred_dc_128(w, h, bd):
    return np.full((h, w), 128 << (bd - 8), dtype=np.int64)


def pred_dc_left(left, w, h):
    s = sum(int(v) for v in left)
    return np.full((h, w), (s + (h >> 1)) // h, dtype=np.int64)


def pred_dc_top(above, w, h):
    s = sum(int(v) for v in above[:w])
    return np.full((h, w), (s + (w >> 1)) // w, dtype=np.int64)


def pred_h(left, w, h):
    # left is bottom-to-top; rows zip with reversed left (predict.rs:842)
    out = np.zeros((h, w), dtype=np.int64)
    for r, l in enumerate(reversed(left[:h])):
        out[r, :] = l
    return out


def pred_v(above, w, h):
    return np.tile(np.asarray(above[:w], dtype=np.int64), (h, 1))


def pred_paeth(above, left, above_left, w, h):
    out = np.zeros((h, w), dtype=np.int64)
    for r in range(h):
        for c in range(w):
            rtl = int(above_left)
            rl = int(left[h - 1 - r])
            rt = int(above[c])
            p_base = rt + rl - rtl
            p_left = abs(p_base - rl)
            p_top = abs(p_base - rt)
            p_tl = abs(p_base - rtl)
            if p_left <= p_top and p_left <= p_tl:
                out[r, c] = rl
            elif p_top <= p_tl:
                out[r, c] = rt
            else:
                out[r, c] = rtl
    return out


def pred_smooth(above, left, w, h):
    below_pred = int(left[0])
    right_pred = int(above[w - 1])
    swW = _SM[w : w + w]
    swH = _SM[h : h + h]
    log2_scale = 1 + SM_WEIGHT_LOG2_SCALE
    scale = 1 << SM_WEIGHT_LOG2_SCALE
    out = np.zeros((h, w), dtype=np.int64)
    for r in range(h):
        for c in range(w):
            pixels = [int(above[c]), below_pred, int(left[h - 1 - r]), right_pred]
            weights = [int(swH[r]), scale - int(swH[r]), int(swW[c]),
                       scale - int(swW[c])]
            p = sum(wt * px for wt, px in zip(weights, pixels))
            out[r, c] = (p + (1 << (log2_scale - 1))) >> log2_scale
    return out


def pred_smooth_h(above, left, w, h):
    right_pred = int(above[w - 1])
    sw = _SM[w : w + w]
    scale = 1 << SM_WEIGHT_LOG2_SCALE
    out = np.zeros((h, w), dtype=np.int64)
    for r in range(h):
        for c in range(w):
            p = int(sw[c]) * int(left[h - 1 - r]) + (scale - int(sw[c])) * right_pred
            out[r, c] = (p + (scale >> 1)) >> SM_WEIGHT_LOG2_SCALE
    return out


def pred_smooth_v(above, left, w, h):
    below_pred = int(left[0])
    sw = _SM[h : h + h]
    scale = 1 << SM_WEIGHT_LOG2_SCALE
    out = np.zeros((h, w), dtype=np.int64)
    for r in range(h):
        for c in range(w):
            p = int(sw[r]) * int(above[c]) + (scale - int(sw[r])) * below_pred
            out[r, c] = (p + (scale >> 1)) >> SM_WEIGHT_LOG2_SCALE
    return out


# --- edge filter/upsample + strength selection (predict.rs:1125-1266) -------


def select_ief_strength(w, h, smooth_filter, delta):
    blk_wh = w + h
    d = abs(delta)
    if smooth_filter:
        if blk_wh <= 8:
            if d >= 64:
                return 2
            if d >= 40:
                return 1
        elif blk_wh <= 16:
            if d >= 48:
                return 2
            if d >= 20:
                return 1
        elif blk_wh <= 24:
            if d >= 4:
                return 3
        else:
            return 3
    else:
        if blk_wh <= 8:
            if d >= 56:
                return 1
        elif blk_wh <= 16:
            if d >= 40:
                return 1
        elif blk_wh <= 24:
            if d >= 32:
                return 3
            if d >= 16:
                return 2
            if d >= 8:
                return 1
        elif blk_wh <= 32:
            if d >= 32:
                return 3
            if d >= 4:
                return 2
            return 1
        else:
            return 3
    return 0


def select_ief_upsample(w, h, smooth_filter, delta):
    blk_wh = w + h
    d = abs(delta)
    if d <= 0 or d >= 40:
        return False
    return blk_wh <= 8 if smooth_filter else blk_wh <= 16


def filter_edge(size, strength, edge):
    kernel = [[0, 4, 8, 4, 0], [0, 5, 6, 5, 0], [2, 4, 4, 4, 2]]
    if strength == 0:
        return
    src = list(edge)
    for i in range(1, size):
        s = 0
        for j in range(5):
            k = min(max(i + j - 2, 0), size - 1)
            s += kernel[strength - 1][j] * int(src[k])
        edge[i] = (s + 8) >> 4


def upsample_edge(size, edge, bd):
    dup = [0] * (size + 3)
    dup[0] = int(edge[0])
    for i in range(size + 1):
        dup[1 + i] = int(edge[i])
    dup[size + 2] = int(edge[size])
    edge[0] = dup[0]
    for i in range(size):
        s = -dup[i] + 9 * dup[i + 1] + 9 * dup[i + 2] - dup[i + 3]
        q = s + 8
        q = int(np.sign(q)) * (abs(q) // 16)  # rust i32 `/` truncates
        q = min(max(q, 0), (1 << bd) - 1)
        edge[2 * i + 1] = q
        edge[2 * i + 2] = dup[i + 2]


def pred_directional(above, left, top_left, p_angle, w, h, bd,
                     ief_smooth=None):
    """ief_smooth: None = edge filter disabled; bool = IEF enabled with the
    use_smooth_filter() flag (predict.rs:1301 pred_directional)."""
    sample_max = (1 << bd) - 1
    enable_edge_filter = ief_smooth is not None
    above_edge = list(above)
    left_edge = list(left)
    top_left_edge = int(top_left[0])
    upsample_above = False
    upsample_left = False

    if enable_edge_filter:
        above_filtered = [0] * ((w + h) * 2 + 1)
        left_filtered = [0] * ((w + h) * 2 + 1)
        above_len = min(len(above), len(above_filtered) - 1)
        left_len = min(len(left), len(left_filtered) - 1)
        above_filtered[1 : 1 + above_len] = [int(v) for v in above[:above_len]]
        for i in range(1, left_len + 1):
            left_filtered[i] = int(left[len(left) - i])

        if p_angle != 90 and p_angle != 180:
            above_filtered[0] = top_left_edge
            left_filtered[0] = top_left_edge
            num_px = (
                w + (h if p_angle < 90 else 0) + 1,
                h + (w if p_angle > 180 else 0) + 1,
            )
            filter_edge(num_px[0],
                        select_ief_strength(w, h, ief_smooth, p_angle - 90),
                        above_filtered)
            filter_edge(num_px[1],
                        select_ief_strength(w, h, ief_smooth, p_angle - 180),
                        left_filtered)

        num_px = (w + (h if p_angle < 90 else 0),
                  h + (w if p_angle > 180 else 0))
        upsample_above = select_ief_upsample(w, h, ief_smooth, p_angle - 90)
        if upsample_above:
            upsample_edge(num_px[0], above_filtered, bd)
        upsample_left = select_ief_upsample(w, h, ief_smooth, p_angle - 180)
        if upsample_left:
            upsample_edge(num_px[1], left_filtered, bd)
        left_filtered.reverse()
        above_edge = above_filtered
        left_edge = left_filtered

    dx = (_dr_intra_derivative(p_angle) if p_angle < 90
          else _dr_intra_derivative(180 - p_angle) if 90 < p_angle < 180
          else 0)
    dy = (_dr_intra_derivative(p_angle - 90) if 90 < p_angle < 180
          else _dr_intra_derivative(270 - p_angle) if p_angle > 180
          else 0)

    ua = 1 if upsample_above else 0
    ul = 1 if upsample_left else 0
    offset_above = (1 if enable_edge_filter else 0) << ua
    offset_left = (1 if enable_edge_filter else 0) << ul

    out = np.zeros((h, w), dtype=np.int64)
    if p_angle < 90:
        for i in range(h):
            for j in range(w):
                idx = (i + 1) * dx
                base = (idx >> (6 - ua)) + (j << ua)
                shift = ((idx << ua) >> 1) & 31
                max_base_x = (h + w - 1) << ua
                if base < max_base_x:
                    a = int(above_edge[base + offset_above])
                    b = int(above_edge[base + 1 + offset_above])
                    v = round_shift(a * (32 - shift) + b * shift, 5)
                else:
                    v = int(above_edge[max_base_x + offset_above])
                out[i, j] = min(max(v, 0), sample_max)
    elif 90 < p_angle < 180:
        for i in range(h):
            for j in range(w):
                idx = (j << 6) - (i + 1) * dx
                base = idx >> (6 - ua)
                if base >= -(1 << ua):
                    shift = ((idx << ua) >> 1) & 31
                    if not enable_edge_filter and base < 0:
                        a = top_left_edge
                    else:
                        a = int(above_edge[base + offset_above])
                    b = int(above_edge[base + 1 + offset_above])
                    v = round_shift(a * (32 - shift) + b * shift, 5)
                else:
                    idx = (i << 6) - (j + 1) * dy
                    base = idx >> (6 - ul)
                    shift = ((idx << ul) >> 1) & 31
                    last = len(left_edge) - 1
                    if not enable_edge_filter and base < 0:
                        a = top_left_edge
                    elif base + offset_left == -2:
                        a = int(left_edge[0])
                    else:
                        a = int(left_edge[last - (base + offset_left)])
                    if base + offset_left == -2:
                        b = int(left_edge[1])
                    else:
                        b = int(left_edge[last - (base + offset_left + 1)])
                    v = round_shift(a * (32 - shift) + b * shift, 5)
                out[i, j] = min(max(v, 0), sample_max)
    else:  # p_angle > 180
        for i in range(h):
            for j in range(w):
                idx = (j + 1) * dy
                base = (idx >> (6 - ul)) + (i << ul)
                shift = ((idx << ul) >> 1) & 31
                last = len(left_edge) - 1
                a = int(left_edge[max(last - (base + offset_left), 0)])
                b = int(left_edge[max(last - (base + offset_left + 1), 0)])
                v = round_shift(a * (32 - shift) + b * shift, 5)
                out[i, j] = min(max(v, 0), sample_max)
    return out
