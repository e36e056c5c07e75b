#!/usr/bin/env python3
"""Independent deblocking-filter oracle, transpiled line-by-line from the
reference's Rust implementation (/root/reference/src/deblock.rs:
filter_narrow2_4 :147, filter_narrow4_4 :198, filter_wide6_4 :248,
filter_wide8_6 :262, filter_wide8_12 :277, filter_wide14_12 :288,
limit/blimit/thresh level conversions :334-362, nhev4 :364, mask4 :369,
deblock_size4_inner :377, mask6/flat6/deblock_size6_inner :475-517,
mask8/flat8/deblock_size8_inner :628-688, flat14_outer /
deblock_size14_inner :830-876).

tests/test_oracle_deblock.py asserts bit-equality of
rav1e_tpu/ops/deblock.py against this oracle for every filter size,
level and bit depth over random edge tap vectors."""

from __future__ import annotations


def clamp(v, lo, hi):
    return min(max(v, lo), hi)


def limit_to_level(limit, shift):
    return (limit + (1 << shift) - 1) >> shift


def blimit_to_level(blimit, shift):
    return (((blimit + (1 << shift) - 1) >> shift) - 2) // 3


def thresh_to_level(thresh, shift):
    return ((thresh + (1 << shift) - 1) >> shift) << 4


def nhev4(p1, p0, q0, q1, shift):
    return thresh_to_level(max(abs(p1 - p0), abs(q1 - q0)), shift)


def mask4(p1, p0, q0, q1, shift):
    return max(
        limit_to_level(max(abs(p1 - p0), abs(q1 - q0)), shift),
        blimit_to_level(abs(p0 - q0) * 2 + abs(p1 - q1) // 2, shift),
    )


def filter_narrow2_4(p1, p0, q0, q1, shift):
    filter0 = clamp(p1 - q1, -128 << shift, (128 << shift) - 1)
    filter1 = clamp(
        filter0 + 3 * (q0 - p0) + 4, -128 << shift, (128 << shift) - 1
    ) >> 3
    filter2 = clamp(
        filter0 + 3 * (q0 - p0) + 3, -128 << shift, (128 << shift) - 1
    ) >> 3
    return [
        p1,
        clamp(p0 + filter2, 0, (256 << shift) - 1),
        clamp(q0 - filter1, 0, (256 << shift) - 1),
        q1,
    ]


def filter_narrow4_4(p1, p0, q0, q1, shift):
    filter1 = clamp(3 * (q0 - p0) + 4, -128 << shift, (128 << shift) - 1) >> 3
    filter2 = clamp(3 * (q0 - p0) + 3, -128 << shift, (128 << shift) - 1) >> 3
    filter3 = (filter1 + 1) >> 1
    return [
        clamp(p1 + filter3, 0, (256 << shift) - 1),
        clamp(p0 + filter2, 0, (256 << shift) - 1),
        clamp(q0 - filter1, 0, (256 << shift) - 1),
        clamp(q1 - filter3, 0, (256 << shift) - 1),
    ]


def filter_wide6_4(p2, p1, p0, q0, q1, q2):
    return [
        (p2 * 3 + p1 * 2 + p0 * 2 + q0 + (1 << 2)) >> 3,
        (p2 + p1 * 2 + p0 * 2 + q0 * 2 + q1 + (1 << 2)) >> 3,
        (p1 + p0 * 2 + q0 * 2 + q1 * 2 + q2 + (1 << 2)) >> 3,
        (p0 + q0 * 2 + q1 * 2 + q2 * 3 + (1 << 2)) >> 3,
    ]


def filter_wide8_6(p3, p2, p1, p0, q0, q1, q2, q3):
    return [
        (p3 * 3 + p2 * 2 + p1 + p0 + q0 + (1 << 2)) >> 3,
        (p3 * 2 + p2 + p1 * 2 + p0 + q0 + q1 + (1 << 2)) >> 3,
        (p3 + p2 + p1 + p0 * 2 + q0 + q1 + q2 + (1 << 2)) >> 3,
        (p2 + p1 + p0 + q0 * 2 + q1 + q2 + q3 + (1 << 2)) >> 3,
        (p1 + p0 + q0 + q1 * 2 + q2 + q3 * 2 + (1 << 2)) >> 3,
        (p0 + q0 + q1 + q2 * 2 + q3 * 3 + (1 << 2)) >> 3,
    ]


def filter_wide8_12(p5, p4, p3, p2, p1, p0, q0, q1, q2, q3, q4, q5):
    x = filter_wide8_6(p3, p2, p1, p0, q0, q1, q2, q3)
    return [p5, p4, p3, x[0], x[1], x[2], x[3], x[4], x[5], q3, q4, q5]


def filter_wide14_12(p6, p5, p4, p3, p2, p1, p0, q0, q1, q2, q3, q4, q5, q6):
    return [
        (p6*7 + p5*2 + p4*2 + p3 + p2 + p1 + p0 + q0 + (1 << 3)) >> 4,
        (p6*5 + p5*2 + p4*2 + p3*2 + p2 + p1 + p0 + q0 + q1 + (1 << 3)) >> 4,
        (p6*4 + p5 + p4*2 + p3*2 + p2*2 + p1 + p0 + q0 + q1 + q2 + (1 << 3)) >> 4,
        (p6*3 + p5 + p4 + p3*2 + p2*2 + p1*2 + p0 + q0 + q1 + q2 + q3 + (1 << 3)) >> 4,
        (p6*2 + p5 + p4 + p3 + p2*2 + p1*2 + p0*2 + q0 + q1 + q2 + q3 + q4 + (1 << 3)) >> 4,
        (p6 + p5 + p4 + p3 + p2 + p1*2 + p0*2 + q0*2 + q1 + q2 + q3 + q4 + q5 + (1 << 3)) >> 4,
        (p5 + p4 + p3 + p2 + p1 + p0*2 + q0*2 + q1*2 + q2 + q3 + q4 + q5 + q6 + (1 << 3)) >> 4,
        (p4 + p3 + p2 + p1 + p0 + q0*2 + q1*2 + q2*2 + q3 + q4 + q5 + q6*2 + (1 << 3)) >> 4,
        (p3 + p2 + p1 + p0 + q0 + q1*2 + q2*2 + q3*2 + q4 + q5 + q6*3 + (1 << 3)) >> 4,
        (p2 + p1 + p0 + q0 + q1 + q2*2 + q3*2 + q4*2 + q5 + q6*4 + (1 << 3)) >> 4,
        (p1 + p0 + q0 + q1 + q2 + q3*2 + q4*2 + q5*2 + q6*5 + (1 << 3)) >> 4,
        (p0 + q0 + q1 + q2 + q3 + q4*2 + q5*2 + q6*7 + (1 << 3)) >> 4,
    ]


def filter_narrow2_6(p2, p1, p0, q0, q1, q2, shift):
    x = filter_narrow2_4(p1, p0, q0, q1, shift)
    return [p2, x[0], x[1], x[2], x[3], q2]


def filter_narrow4_6(p2, p1, p0, q0, q1, q2, shift):
    x = filter_narrow4_4(p1, p0, q0, q1, shift)
    return [p2, x[0], x[1], x[2], x[3], q2]


def filter_narrow2_12(p5, p4, p3, p2, p1, p0, q0, q1, q2, q3, q4, q5, shift):
    x = filter_narrow2_4(p1, p0, q0, q1, shift)
    return [p5, p4, p3, p2, x[0], x[1], x[2], x[3], q2, q3, q4, q5]


def filter_narrow4_12(p5, p4, p3, p2, p1, p0, q0, q1, q2, q3, q4, q5, shift):
    x = filter_narrow4_4(p1, p0, q0, q1, shift)
    return [p5, p4, p3, p2, x[0], x[1], x[2], x[3], q2, q3, q4, q5]


def deblock_size4_inner(vals, level, bd):
    p1, p0, q0, q1 = vals
    if mask4(p1, p0, q0, q1, bd - 8) <= level:
        if nhev4(p1, p0, q0, q1, bd - 8) <= level:
            return filter_narrow4_4(p1, p0, q0, q1, bd - 8)
        return filter_narrow2_4(p1, p0, q0, q1, bd - 8)
    return None


def mask6(p2, p1, p0, q0, q1, q2, shift):
    return max(
        limit_to_level(
            max(abs(p2 - p1), abs(p1 - p0), abs(q2 - q1), abs(q1 - q0)),
            shift,
        ),
        blimit_to_level(abs(p0 - q0) * 2 + abs(p1 - q1) // 2, shift),
    )


def flat6(p2, p1, p0, q0, q1, q2):
    return max(abs(p1 - p0), abs(q1 - q0), abs(p2 - p0), abs(q2 - q0))


def deblock_size6_inner(vals, level, bd):
    p2, p1, p0, q0, q1, q2 = vals
    if mask6(p2, p1, p0, q0, q1, q2, bd - 8) <= level:
        flat = 1 << (bd - 8)
        if flat6(p2, p1, p0, q0, q1, q2) <= flat:
            return filter_wide6_4(p2, p1, p0, q0, q1, q2)
        if nhev4(p1, p0, q0, q1, bd - 8) <= level:
            return filter_narrow4_4(p1, p0, q0, q1, bd - 8)
        return filter_narrow2_4(p1, p0, q0, q1, bd - 8)
    return None


def mask8(p3, p2, p1, p0, q0, q1, q2, q3, shift):
    return max(
        limit_to_level(
            max(
                abs(p3 - p2), abs(p2 - p1), abs(p1 - p0),
                abs(q3 - q2), abs(q2 - q1), abs(q1 - q0),
            ),
            shift,
        ),
        blimit_to_level(abs(p0 - q0) * 2 + abs(p1 - q1) // 2, shift),
    )


def flat8(p3, p2, p1, p0, q0, q1, q2, q3):
    return max(
        abs(p1 - p0), abs(q1 - q0), abs(p2 - p0),
        abs(q2 - q0), abs(p3 - p0), abs(q3 - q0),
    )


def deblock_size8_inner(vals, level, bd):
    p3, p2, p1, p0, q0, q1, q2, q3 = vals
    if mask8(p3, p2, p1, p0, q0, q1, q2, q3, bd - 8) <= level:
        flat = 1 << (bd - 8)
        if flat8(p3, p2, p1, p0, q0, q1, q2, q3) <= flat:
            return filter_wide8_6(p3, p2, p1, p0, q0, q1, q2, q3)
        if nhev4(p1, p0, q0, q1, bd - 8) <= level:
            return filter_narrow4_6(p2, p1, p0, q0, q1, q2, bd - 8)
        return filter_narrow2_6(p2, p1, p0, q0, q1, q2, bd - 8)
    return None


def flat14_outer(p6, p5, p4, p0, q0, q4, q5, q6):
    return max(
        abs(p4 - p0), abs(q4 - q0), abs(p5 - p0),
        abs(q5 - q0), abs(p6 - p0), abs(q6 - q0),
    )


def deblock_size14_inner(vals, level, bd):
    p6, p5, p4, p3, p2, p1, p0, q0, q1, q2, q3, q4, q5, q6 = vals
    if mask8(p3, p2, p1, p0, q0, q1, q2, q3, bd - 8) <= level:
        flat = 1 << (bd - 8)
        if flat8(p3, p2, p1, p0, q0, q1, q2, q3) <= flat:
            if flat14_outer(p6, p5, p4, p0, q0, q4, q5, q6) <= flat:
                return filter_wide14_12(
                    p6, p5, p4, p3, p2, p1, p0, q0, q1, q2, q3, q4, q5, q6
                )
            return filter_wide8_12(
                p5, p4, p3, p2, p1, p0, q0, q1, q2, q3, q4, q5
            )
        if nhev4(p1, p0, q0, q1, bd - 8) <= level:
            return filter_narrow4_12(
                p5, p4, p3, p2, p1, p0, q0, q1, q2, q3, q4, q5, bd - 8
            )
        return filter_narrow2_12(
            p5, p4, p3, p2, p1, p0, q0, q1, q2, q3, q4, q5, bd - 8
        )
    return None
