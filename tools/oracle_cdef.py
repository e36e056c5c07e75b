#!/usr/bin/env python3
"""Independent CDEF oracle, transpiled line-by-line from the reference's
Rust implementation (/root/reference/src/cdef.rs mod rust: cdef_find_dir
:84-143, constrain :146-160, pad_into_tmp16 :162-196, cdef_filter_block
:198-295, adjust_strength :315-318).

tests/test_oracle_cdef.py asserts bit-equality of rav1e_tpu/ops/cdef.py
against this oracle for every direction, strength, damping, bit depth and
edge-availability pattern — an independent gate for the CDEF family that
breaks the shared-code circularity of the encode-decode round trip.
"""

from __future__ import annotations

import numpy as np

CDEF_VERY_LARGE = 0x8000
CDEF_HAVE_LEFT = 1 << 0
CDEF_HAVE_RIGHT = 1 << 1
CDEF_HAVE_TOP = 1 << 2
CDEF_HAVE_BOTTOM = 1 << 3
CDEF_HAVE_ALL = (
    CDEF_HAVE_LEFT | CDEF_HAVE_RIGHT | CDEF_HAVE_TOP | CDEF_HAVE_BOTTOM
)

# cdef.rs:54 (multiply by 3*5*7*8/n instead of dividing by n)
CDEF_DIV_TABLE = [0, 840, 420, 280, 210, 168, 140, 120, 105]


def first_max_element(elems):
    """cdef.rs:68-76: position+value of the first max (ties -> first)."""
    max_idx, max_value = 0, elems[0]
    for i, v in enumerate(elems):
        if v > max_value:
            max_idx, max_value = i, v
    return max_idx, max_value


def cdef_find_dir(img8x8, coeff_shift: int):
    """cdef.rs:84-143. img8x8: (8, 8) ints.  Returns (dir, var)."""
    cost = [0] * 8
    partial = [[0] * 15 for _ in range(8)]
    for i in range(8):
        for j in range(8):
            p = int(img8x8[i][j])
            x = (p >> coeff_shift) - 128
            partial[0][i + j] += x
            partial[1][i + j // 2] += x
            partial[2][i] += x
            partial[3][3 + i - j // 2] += x
            partial[4][7 + i - j] += x
            partial[5][3 - i // 2 + j] += x
            partial[6][j] += x
            partial[7][i // 2 + j] += x
    for i in range(8):
        cost[2] += partial[2][i] * partial[2][i]
        cost[6] += partial[6][i] * partial[6][i]
    cost[2] *= CDEF_DIV_TABLE[8]
    cost[6] *= CDEF_DIV_TABLE[8]
    for i in range(7):
        cost[0] += (
            partial[0][i] ** 2 + partial[0][14 - i] ** 2
        ) * CDEF_DIV_TABLE[i + 1]
        cost[4] += (
            partial[4][i] ** 2 + partial[4][14 - i] ** 2
        ) * CDEF_DIV_TABLE[i + 1]
    cost[0] += partial[0][7] ** 2 * CDEF_DIV_TABLE[8]
    cost[4] += partial[4][7] ** 2 * CDEF_DIV_TABLE[8]
    for i in range(1, 8, 2):
        for j in range(5):
            cost[i] += partial[i][3 + j] ** 2
        cost[i] *= CDEF_DIV_TABLE[8]
        for j in range(3):
            cost[i] += (
                partial[i][j] ** 2 + partial[i][10 - j] ** 2
            ) * CDEF_DIV_TABLE[2 * j + 2]

    best_dir, best_cost = first_max_element(cost)
    var = (best_cost - cost[(best_dir + 4) & 7]) >> 10
    return best_dir, var


def msb(x: int) -> int:
    assert x > 0
    return x.bit_length() - 1


def constrain(diff: int, threshold: int, damping: int) -> int:
    """cdef.rs:146-160."""
    if threshold != 0:
        shift = max(0, damping - msb(threshold))
        magnitude = min(max(threshold - (abs(diff) >> shift), 0), abs(diff))
        return -magnitude if diff < 0 else magnitude
    return 0


def adjust_strength(strength: int, var: int) -> int:
    """cdef.rs:315-318."""
    i = min(msb(var >> 6), 12) if (var >> 6) != 0 else 0
    return (strength * (4 + i) + 8) >> 4 if var != 0 else 0


def pad_into_tmp16(src, src_stride, sy, sx, block_w, block_h, edges):
    """cdef.rs:162-196: build the (2+8+2)^2 u16 tmp with VERY_LARGE where
    pixels are unavailable.  src: flat int array; (sy, sx) = block origin.
    Returns (tmp 2-D array (bh+4, tmpstride), origin offset (2, 2))."""
    tmpstride = 2 + 8 + 2
    tmp = np.full((tmpstride, tmpstride), CDEF_VERY_LARGE, dtype=np.int64)
    w, h = block_w, block_h
    if edges & CDEF_HAVE_LEFT:
        w += 2
        dst_x, src_x = 0, sx - 2
    else:
        dst_x, src_x = 2, sx
    if edges & CDEF_HAVE_RIGHT:
        w += 2
    if edges & CDEF_HAVE_TOP:
        h += 2
        dst_y, src_y = 0, sy - 2
    else:
        dst_y, src_y = 2, sy
    if edges & CDEF_HAVE_BOTTOM:
        h += 2
    for y in range(h):
        for x in range(w):
            tmp[dst_y + y][dst_x + x] = int(src[src_y + y][src_x + x])
    return tmp


def cdef_filter_block(
    inp, iy, ix, pri_strength, sec_strength, dir_, damping, bit_depth,
    xdec, ydec, edges,
):
    """cdef.rs:198-295.  inp: 2-D int array; (iy, ix) = block upper-left.
    Returns the filtered (ysize, xsize) int64 block."""
    if edges != CDEF_HAVE_ALL:
        tmp = pad_into_tmp16(
            inp, None, iy, ix, 8 >> xdec, 8 >> ydec, edges
        )
        return cdef_filter_block(
            tmp, 2, 2, pri_strength, sec_strength, dir_, damping,
            bit_depth, xdec, ydec, CDEF_HAVE_ALL,
        )
    xsize = 8 >> xdec
    ysize = 8 >> ydec
    coeff_shift = bit_depth - 8
    cdef_pri_taps = [[4, 2], [3, 3]]
    cdef_sec_taps = [[2, 1], [2, 1]]
    pri_taps = cdef_pri_taps[(pri_strength >> coeff_shift) & 1]
    sec_taps = cdef_sec_taps[(pri_strength >> coeff_shift) & 1]
    # (dy, dx) pairs: cdef.rs:219-228 offsets decomposed from istride units
    cdef_directions = [
        [(-1, 1), (-2, 2)],
        [(0, 1), (-1, 2)],
        [(0, 1), (0, 2)],
        [(0, 1), (1, 2)],
        [(1, 1), (2, 2)],
        [(1, 0), (2, 1)],
        [(1, 0), (2, 0)],
        [(1, 0), (2, -1)],
    ]
    out = np.zeros((ysize, xsize), dtype=np.int64)
    for i in range(ysize):
        for j in range(xsize):
            x = int(inp[iy + i][ix + j])
            ssum = 0
            mx = x
            mn = x
            for k in range(2):
                cdef_dirs = [
                    cdef_directions[dir_][k],
                    cdef_directions[(dir_ + 2) & 7][k],
                    cdef_directions[(dir_ + 6) & 7][k],
                ]
                pri_tap = pri_taps[k]
                p = [
                    int(inp[iy + i + cdef_dirs[0][0]][ix + j + cdef_dirs[0][1]]),
                    int(inp[iy + i - cdef_dirs[0][0]][ix + j - cdef_dirs[0][1]]),
                ]
                for p_elem in p:
                    ssum += pri_tap * constrain(p_elem - x, pri_strength, damping)
                    if p_elem != CDEF_VERY_LARGE:
                        mx = max(p_elem, mx)
                    mn = min(p_elem, mn)
                s = [
                    int(inp[iy + i + cdef_dirs[1][0]][ix + j + cdef_dirs[1][1]]),
                    int(inp[iy + i - cdef_dirs[1][0]][ix + j - cdef_dirs[1][1]]),
                    int(inp[iy + i + cdef_dirs[2][0]][ix + j + cdef_dirs[2][1]]),
                    int(inp[iy + i - cdef_dirs[2][0]][ix + j - cdef_dirs[2][1]]),
                ]
                sec_tap = sec_taps[k]
                for s_elem in s:
                    if s_elem != CDEF_VERY_LARGE:
                        mx = max(s_elem, mx)
                    mn = min(s_elem, mn)
                    ssum += sec_tap * constrain(s_elem - x, sec_strength, damping)
            v = x + ((8 + ssum - (1 if ssum < 0 else 0)) >> 4)
            out[i][j] = min(max(v, mn), mx)
    return out
