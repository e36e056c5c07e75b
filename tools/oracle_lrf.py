#!/usr/bin/env python3
"""Independent loop-restoration oracle, transpiled line-by-line from the
reference's Rust implementation (/root/reference/src/lrf.rs):

- sgrproj_sum_finish :420-447, get_integral_square :449-466
- VertPaddedIter :468-527 / HorzPaddedIter :~490-528 padding semantics
- setup_integral_image :530-628
- mod rust sgrproj_box_ab_internal :176-201, box_f_r0/r1/r2 :242-380
- sgrproj_stripe_filter :630-830
- wiener_stripe_filter :1099-1207

tests/test_oracle_lrf.py asserts bit-equality of rav1e_tpu/ops/lrf.py
against this oracle over stripes, sets, xqd values, stripe positions and
bit depths — an independent gate for the restoration family.

All u32 arithmetic wraps (masking with 0xFFFFFFFF) exactly as the Rust
wrapping_add/wrapping_sub do; overflow cancels in the box sums.
"""

from __future__ import annotations

import numpy as np

SGRPROJ_PRJ_BITS = 7
SGRPROJ_MTABLE_BITS = 20
SGRPROJ_SGR_BITS = 8
SGRPROJ_RECIP_BITS = 12
SGRPROJ_RST_BITS = 4
WIENER_BITS = 7

U32 = 0xFFFFFFFF

# lrf.rs:56-74
SGRPROJ_PARAMS_S = [
    [140, 3236], [112, 2158], [93, 1618], [80, 1438],
    [70, 1295], [58, 1177], [47, 1079], [37, 996],
    [30, 925], [25, 863], [0, 2589], [0, 1618],
    [0, 1177], [0, 925], [56, 0], [22, 0],
]


def sgrproj_sum_finish(ssq, ssum, n, one_over_n, s, bd):
    """lrf.rs:420-447 (u32 ops; p uses saturating_sub)."""
    bdm8 = bd - 8
    scaled_ssq = (ssq + (1 << (2 * bdm8) >> 1)) >> (2 * bdm8) if bdm8 else ssq
    scaled_sum = (ssum + (1 << bdm8 >> 1)) >> bdm8 if bdm8 else ssum
    p = max(scaled_ssq * n - scaled_sum * scaled_sum, 0)
    z = (p * s + (1 << SGRPROJ_MTABLE_BITS >> 1)) >> SGRPROJ_MTABLE_BITS
    if z >= 255:
        a = 256
    elif z == 0:
        a = 1
    else:
        a = ((z << SGRPROJ_SGR_BITS) + z // 2) // (z + 1)
    b = ((1 << SGRPROJ_SGR_BITS) - a) * ssum * one_over_n
    return a, (b + (1 << SGRPROJ_RECIP_BITS >> 1)) >> SGRPROJ_RECIP_BITS


def get_integral_square(iimg, stride, x, y, size):
    """lrf.rs:449-466 (wrapping u32)."""
    return (
        iimg[y * stride + x]
        + iimg[(y + size) * stride + x + size]
        - iimg[(y + size) * stride + x]
        - iimg[y * stride + x + size]
    ) & U32


def _vert_padded_rows(cdeffed, deblocked, stripe_x, stripe_y, stripe_h,
                      crop_h):
    """VertPaddedIter (lrf.rs:468-527): the source row (plane, ly) used for
    each of rows_above + stripe_h + rows_below output rows."""
    rows_above, rows_below = 4, 2
    out = []
    y = stripe_y - rows_above
    end = rows_above + stripe_h + rows_below + y
    while y < end:
        cropped_y = min(max(y, 0), crop_h - 1)
        ly = min(max(cropped_y, stripe_y - 2), stripe_y + stripe_h + 1)
        src = cdeffed if (stripe_y <= ly < stripe_y + stripe_h) else deblocked
        out.append((src, ly))
        y += 1
    return out


def _horz_padded(row, start_index, count):
    """HorzPaddedIter: index < 0 repeats the first element, >= len repeats
    the last, emitting ``count`` values."""
    out = []
    idx = start_index
    for _ in range(count):
        out.append(int(row[min(max(idx, 0), len(row) - 1)]))
        idx += 1
    return out


def setup_integral_image(cdeffed, deblocked, stripe_x, stripe_y, stripe_w,
                         stripe_h, crop_w, crop_h, stride):
    """lrf.rs:530-628.  Planes are 2-D numpy arrays (crop_h, crop_w)+.
    Returns (integral_image, sq_integral_image) flat python lists."""
    left_w = 4
    right_w = 3
    left_uniques = 0 if stripe_x == 0 else left_w
    right_uniques = min(right_w, crop_w - stripe_x - stripe_w)
    row_uniques = left_uniques + stripe_x - (stripe_x - left_uniques) \
        + stripe_w + right_uniques - left_uniques  # == left_uniques + stripe_w + right_uniques
    row_uniques = left_uniques + stripe_w + right_uniques
    start_index_x = -left_w if stripe_x == 0 else 0
    width = left_w + stripe_w + right_w
    x0 = stripe_x - left_uniques

    rows = _vert_padded_rows(
        cdeffed, deblocked, stripe_x, stripe_y,
        stripe_h + (stripe_h & 1), crop_h,
    )
    n_rows = len(rows)
    integral = [0] * (n_rows * stride)
    sq_integral = [0] * (n_rows * stride)

    for ri, (plane, ly) in enumerate(rows):
        row = plane[ly][x0 : x0 + row_uniques]
        vals = _horz_padded(row, start_index_x, width)
        s = 0
        sq = 0
        for ci, v in enumerate(vals):
            s = (s + v) & U32
            sq = (sq + v * v) & U32
            if ri == 0:
                integral[ci] = s
                sq_integral[ci] = sq
            else:
                integral[ri * stride + ci] = (
                    s + integral[(ri - 1) * stride + ci]
                ) & U32
                sq_integral[ri * stride + ci] = (
                    sq + sq_integral[(ri - 1) * stride + ci]
                ) & U32
    return integral, sq_integral


def sgrproj_box_ab_internal(r, iimg, iimg_sq, iimg_stride, y, stripe_w, s,
                            bd):
    """lrf.rs mod rust :176-201: (af, bf) for columns 0..stripe_w+2."""
    d = r * 2 + 1
    n = d * d
    one_over_n = 455 if r == 1 else 164
    af = [0] * (stripe_w + 2)
    bf = [0] * (stripe_w + 2)
    for x in range(stripe_w + 2):
        ssum = get_integral_square(iimg, iimg_stride, x, y, d)
        ssq = get_integral_square(iimg_sq, iimg_stride, x, y, d)
        a, b = sgrproj_sum_finish(ssq, ssum, n, one_over_n, s, bd)
        af[x] = a
        bf[x] = b
    return af, bf


def sgrproj_box_f_r0(line, w):
    """lrf.rs:250-257."""
    return [int(v) << SGRPROJ_RST_BITS for v in line[:w]]


def sgrproj_box_f_r1(af, bf, line, w):
    """lrf.rs:267-295."""
    shift = 5 + SGRPROJ_SGR_BITS - SGRPROJ_RST_BITS
    f = [0] * w
    for x in range(w):
        a = 3 * (af[0][x] + af[2][x] + af[0][x + 2] + af[2][x + 2]) + 4 * (
            af[1][x] + af[0][x + 1] + af[1][x + 1] + af[2][x + 1] + af[1][x + 2]
        )
        b = 3 * (bf[0][x] + bf[2][x] + bf[0][x + 2] + bf[2][x + 2]) + 4 * (
            bf[1][x] + bf[0][x + 1] + bf[1][x + 1] + bf[2][x + 1] + bf[1][x + 2]
        )
        v = a * int(line[x]) + b
        f[x] = (v + (1 << shift >> 1)) >> shift
    return f


def sgrproj_box_f_r2(af, bf, line0, line1, w):
    """lrf.rs:305-380: (f0, f1) for an even/odd row pair."""
    shift = 5 + SGRPROJ_SGR_BITS - SGRPROJ_RST_BITS
    shifto = 4 + SGRPROJ_SGR_BITS - SGRPROJ_RST_BITS
    f0 = [0] * w
    f1 = [0] * w
    for x in range(w):
        a = 5 * (af[0][x] + af[0][x + 2]) + 6 * af[0][x + 1]
        b = 5 * (bf[0][x] + bf[0][x + 2]) + 6 * bf[0][x + 1]
        ao = 5 * (af[1][x] + af[1][x + 2]) + 6 * af[1][x + 1]
        bo = 5 * (bf[1][x] + bf[1][x + 2]) + 6 * bf[1][x + 1]
        v = (a + ao) * int(line0[x]) + b + bo
        f0[x] = (v + (1 << shift >> 1)) >> shift
        vo = ao * int(line1[x]) + bo
        f1[x] = (vo + (1 << shifto >> 1)) >> shifto
    return f0, f1


def sgrproj_stripe_filter(sgr_set, xqd, bd, cdeffed, deblocked, stripe_x,
                          stripe_y, stripe_w, stripe_h, crop_w, crop_h):
    """lrf.rs:630-830.  Returns the filtered (stripe_h, stripe_w) int64."""
    stride = stripe_w + 6 + 2
    integral, sq_integral = setup_integral_image(
        cdeffed, deblocked, stripe_x, stripe_y, stripe_w, stripe_h,
        crop_w, crop_h, stride,
    )
    s_r2 = SGRPROJ_PARAMS_S[sgr_set][0]
    s_r1 = SGRPROJ_PARAMS_S[sgr_set][1]

    def cdeffed_row(y):
        ly = min(max(stripe_y + y, 0), crop_h - 1)
        return cdeffed[ly][stripe_x : stripe_x + stripe_w]

    out = np.zeros((stripe_h, stripe_w), dtype=np.int64)

    a_r2 = [None, None]
    b_r2 = [None, None]
    a_r1 = [None, None, None]
    b_r1 = [None, None, None]
    off = stride + 1
    ii_r1 = integral[off:]
    sq_r1 = sq_integral[off:]
    if s_r2 > 0:
        a_r2[0], b_r2[0] = sgrproj_box_ab_internal(
            2, integral, sq_integral, stride, 0, stripe_w, s_r2, bd)
    if s_r1 > 0:
        a_r1[0], b_r1[0] = sgrproj_box_ab_internal(
            1, ii_r1, sq_r1, stride, 0, stripe_w, s_r1, bd)
        a_r1[1], b_r1[1] = sgrproj_box_ab_internal(
            1, ii_r1, sq_r1, stride, 1, stripe_w, s_r1, bd)

    for y in range(0, stripe_h, 2):
        if s_r2 > 0:
            a_r2[(y // 2 + 1) % 2], b_r2[(y // 2 + 1) % 2] = \
                sgrproj_box_ab_internal(
                    2, integral, sq_integral, stride, y + 2, stripe_w,
                    s_r2, bd)
            ap0 = [a_r2[(y // 2) % 2], a_r2[(y // 2 + 1) % 2]]
            bp0 = [b_r2[(y // 2) % 2], b_r2[(y // 2 + 1) % 2]]
            f_r2_0, f_r2_1 = sgrproj_box_f_r2(
                ap0, bp0, cdeffed_row(y), cdeffed_row(y + 1), stripe_w)
            f_r2_ab = [f_r2_0, f_r2_1]
        else:
            f = sgrproj_box_f_r0(cdeffed_row(y), stripe_w)
            f_r2_ab = [f, f]
        for dy in range(min(2, stripe_h - y)):
            yy = y + dy
            if s_r1 > 0:
                a_r1[(yy + 2) % 3], b_r1[(yy + 2) % 3] = \
                    sgrproj_box_ab_internal(
                        1, ii_r1, sq_r1, stride, yy + 2, stripe_w, s_r1, bd)
                ap1 = [a_r1[yy % 3], a_r1[(yy + 1) % 3], a_r1[(yy + 2) % 3]]
                bp1 = [b_r1[yy % 3], b_r1[(yy + 1) % 3], b_r1[(yy + 2) % 3]]
                f_r1 = sgrproj_box_f_r1(ap1, bp1, cdeffed_row(yy), stripe_w)
            else:
                f_r1 = sgrproj_box_f_r0(cdeffed_row(yy), stripe_w)

            w0 = int(xqd[0])
            w1 = int(xqd[1])
            w2 = (1 << SGRPROJ_PRJ_BITS) - w0 - w1
            line = cdeffed_row(yy)
            for x in range(stripe_w):
                u = int(line[x]) << SGRPROJ_RST_BITS
                v = w0 * f_r2_ab[dy][x] + w1 * u + w2 * f_r1[x]
                s = (
                    v + (1 << (SGRPROJ_RST_BITS + SGRPROJ_PRJ_BITS) >> 1)
                ) >> (SGRPROJ_RST_BITS + SGRPROJ_PRJ_BITS)
                out[yy][x] = min(max(s, 0), (1 << bd) - 1)
    return out


def wiener_stripe_filter(coeffs, bd, crop_w, crop_h, stripe_w, stripe_h,
                         stripe_x, stripe_y, cdeffed, deblocked):
    """lrf.rs:1099-1207.  Returns the output plane copy with the stripe
    region filtered (rows start_yi..start_yi+end_i, cols stripe_x..+w)."""
    round_h = 5 if bd == 12 else 3
    round_v = 9 if bd == 12 else 11
    offset = 1 << (bd + WIENER_BITS - round_h - 1)
    limit = (1 << (bd + 1 + WIENER_BITS - round_h)) - 1

    c = [[int(v) for v in row] for row in coeffs]
    vfilter = [c[0][0], c[0][1], c[0][2],
               128 - 2 * (c[0][0] + c[0][1] + c[0][2]),
               c[0][2], c[0][1], c[0][0]]
    hfilter = [c[1][0], c[1][1], c[1][2],
               128 - 2 * (c[1][0] + c[1][1] + c[1][2]),
               c[1][2], c[1][1], c[1][0]]

    start_wi = -stripe_y if stripe_y < 0 else 0
    start_yi = 0 if stripe_y < 0 else stripe_y
    end_i = max(
        0,
        (crop_h - stripe_y - start_wi)
        if stripe_h + stripe_y > crop_h
        else (stripe_h - start_wi),
    )

    out = np.zeros((end_i, stripe_w), dtype=np.int64)
    for xi in range(stripe_x, stripe_x + stripe_w):
        n = min(7, crop_w + 3 - xi)
        work = {}
        for yi in range(stripe_y - 3, stripe_y + stripe_h + 4):
            acc = 0
            if yi < stripe_y:
                ly = max(min(max(yi, 0), crop_h - 1), stripe_y - 2)
                src = deblocked[ly]
            elif yi < stripe_y + stripe_h:
                ly = min(max(yi, 0), crop_h - 1)
                src = cdeffed[ly]
            else:
                ly = min(min(max(yi, 0), crop_h - 1), stripe_y + stripe_h + 1)
                src = deblocked[ly]
            start = int(src[0])
            end = int(src[crop_w - 1])
            for i in range(0, 3 - xi):
                acc += hfilter[i] * start
            off = 3 - xi
            s = max(0, off)
            s1 = s - off
            n1 = n - off
            for i in range(s, n):
                acc += hfilter[i] * int(src[s1 + (i - s)])
            for i in range(n, 7):
                acc += hfilter[i] * end
            acc = (acc + (1 << round_h >> 1)) >> round_h
            work[yi - stripe_y + 3] = min(max(acc, -offset), limit - offset)

        for row_i, wi in enumerate(range(start_wi, start_wi + end_i)):
            acc = 0
            for i in range(7):
                acc += vfilter[i] * work[wi + i]
            v = (acc + (1 << round_v >> 1)) >> round_v
            out[row_i][xi - stripe_x] = min(max(v, 0), (1 << bd) - 1)
    return out, start_yi
