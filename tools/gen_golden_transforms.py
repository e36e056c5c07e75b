#!/usr/bin/env python3
"""Generate golden test vectors for the normative AV1 inverse transforms.

The AV1 *inverse* transform is normative: the encoder's reconstruction must
match the decoder bit-exactly, so our vectorized implementation needs a
bit-exact oracle.  No AV1 decoder binary exists in this environment, so this
tool mechanically *executes* the reference implementation's scalar Rust
(src/transform/inverse.rs — itself the spec's butterfly networks) by
converting it to Python in memory, then records (input, output) pairs for
every 1-D transform size/type and a matrix of full 2-D add-to-recon cases.

Only the resulting .npz test vectors are committed — the transpiled source is
never written to disk.  Usage:  python tools/gen_golden_transforms.py
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np

REF = Path("/root/reference/src/transform/inverse.rs")
OUT = Path(__file__).resolve().parent.parent / "tests" / "golden"

I32_MIN, I32_MAX = -(1 << 31), (1 << 31) - 1


def wrap32(v: int) -> int:
    return ((v + (1 << 31)) & 0xFFFFFFFF) - (1 << 31)


class I32(int):
    """int with i32 wrap-around on + - * >> (Rust release / C semantics),
    so the oracle matches both the reference build and int32 numpy."""

    def __new__(cls, v):
        return super().__new__(cls, wrap32(int(v)))

    def __add__(self, o):
        return I32(int(self) + int(o))

    __radd__ = __add__

    def __sub__(self, o):
        return I32(int(self) - int(o))

    def __rsub__(self, o):
        return I32(int(o) - int(self))

    def __mul__(self, o):
        return I32(int(self) * int(o))

    __rmul__ = __mul__

    def __neg__(self):
        return I32(-int(self))

    def __rshift__(self, o):
        return I32(int(self) >> int(o))


def half_btf(w0, in0, w1, in1, bit):
    result = wrap32(wrap32(w0 * int(in0)) + wrap32(w1 * int(in1)))
    if bit == 0:
        return I32(result)
    return I32(wrap32(result + (1 << (bit - 1))) >> bit)


def clamp_value(value, bit):
    max_value = (1 << (bit - 1)) - 1
    min_value = -(1 << (bit - 1))
    return I32(min(max(int(value), min_value), max_value))


def round_shift(value, bit):
    if bit == 0:
        return value
    return I32((int(value) + (1 << (bit - 1))) >> bit)


COSPI_INV = [
    4096, 4095, 4091, 4085, 4076, 4065, 4052, 4036, 4017, 3996, 3973, 3948,
    3920, 3889, 3857, 3822, 3784, 3745, 3703, 3659, 3612, 3564, 3513, 3461,
    3406, 3349, 3290, 3229, 3166, 3102, 3035, 2967, 2896, 2824, 2751, 2675,
    2598, 2520, 2440, 2359, 2276, 2191, 2106, 2019, 1931, 1842, 1751, 1660,
    1567, 1474, 1380, 1285, 1189, 1092, 995, 897, 799, 700, 601, 501, 401,
    301, 201, 101,
]
SINPI_INV = [0, 1321, 2482, 3344, 3803]
INV_COS_BIT = 12
SQRT2 = 5793  # 2^12 * sqrt(2)


def transpile() -> dict:
    """Convert the scalar butterfly functions to Python, exec in a namespace."""
    src = REF.read_text()
    ns = {
        "half_btf": half_btf,
        "clamp_value": clamp_value,
        "round_shift": round_shift,
        "COSPI_INV": COSPI_INV,
        "SINPI_INV": SINPI_INV,
        "INV_COS_BIT": INV_COS_BIT,
        "SQRT2": SQRT2,
    }

    wanted = [
        "av1_idct4", "av1_idct8", "av1_idct16", "av1_idct32", "av1_idct64",
        "av1_iadst4", "av1_iadst8", "av1_iadst16",
    ]
    for name in wanted:
        m = re.search(
            rf"pub fn {name}\(|fn {name}\(", src
        )
        assert m, name
        # body = up to matching closing brace at column 0
        start = src.index("{", m.start()) + 1
        end = src.index("\n}", start)
        body = src[start:end]
        # strip comments, asserts, rust-isms
        body = re.sub(r"//[^\n]*", "", body)
        body = re.sub(r"assert!\([^;]*\);", "", body)
        body = body.replace("let mut ", "").replace("let ", "")
        body = re.sub(r"temp_out\s*:\s*\[i32;\s*\d+\]\s*=\s*\[0;\s*\d+\]",
                      lambda mm: "temp_out = [0]*64", body)
        body = re.sub(r":\s*\[i32;\s*\d+\]", "", body)  # type ascriptions
        body = body.replace("&temp_in, &mut temp_out", "temp_in, temp_out")
        body = body.replace(";", "")
        body = re.sub(r"av1_(idct|iadst)(\d+)\(input, output, range\)",
                      r"av1_\1\2(input, output, range)", body)
        body = body.replace("output[..4].reverse()", "output[:4] = output[:4][::-1]")
        body = body.replace("output[..8].reverse()", "output[:8] = output[:8][::-1]")
        body = body.replace("output[..16].reverse()", "output[:16] = output[:16][::-1]")
        lines = ["def %s(input, output, range):" % name]
        for ln in body.splitlines():
            ln = ln.strip()
            if not ln:
                continue
            lines.append("    " + ln)
        code = "\n".join(lines)
        # join continuation lines: python can't break `x = [` across... it can,
        # since brackets imply continuation. But `stg2 = [` style is fine.
        exec(code, ns)

    # the trivial ones, re-expressed directly (spec: identity/WHT scaling)
    def av1_iidentity4(input, output, range):
        for i in range(4):
            output[i] = round_shift(SQRT2 * input[i], 12)

    # NB: `range` shadows builtin; use indices explicitly
    ns["av1_iidentity4"] = lambda inp, out, rng: [
        out.__setitem__(i, round_shift(SQRT2 * inp[i], 12)) for i in range(4)
    ]
    ns["av1_iidentity8"] = lambda inp, out, rng: [
        out.__setitem__(i, 2 * inp[i]) for i in range(8)
    ]
    ns["av1_iidentity16"] = lambda inp, out, rng: [
        out.__setitem__(i, round_shift(SQRT2 * 2 * inp[i], 12)) for i in range(16)
    ]
    ns["av1_iidentity32"] = lambda inp, out, rng: [
        out.__setitem__(i, 4 * inp[i]) for i in range(32)
    ]

    def av1_iwht4(inp, out, rng):
        x0, x1, x2, x3 = inp[0], inp[1], inp[2], inp[3]
        s0 = x0 + x1
        s2 = x2 - x3
        s4 = (s0 - s2) >> 1
        s3 = s4 - x3
        s1 = s4 - x1
        out[0] = s0 - s3
        out[1] = s3
        out[2] = s1
        out[3] = s2 + s1

    ns["av1_iwht4"] = av1_iwht4

    def flip(fn, n):
        def f(inp, out, rng):
            fn(inp, out, rng)
            out[:n] = out[:n][::-1]
        return f

    ns["av1_iflipadst4"] = flip(ns["av1_iadst4"], 4)
    ns["av1_iflipadst8"] = flip(ns["av1_iadst8"], 8)
    ns["av1_iflipadst16"] = flip(ns["av1_iadst16"], 16)
    return ns


def main():
    ns = transpile()
    OUT.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(12345)

    vectors = {}
    fns_1d = {
        "dct": [4, 8, 16, 32, 64],
        "adst": [4, 8, 16],
        "flipadst": [4, 8, 16],
        "identity": [4, 8, 16, 32],
        "wht": [4],
    }
    name_map = {
        "dct": "av1_idct%d", "adst": "av1_iadst%d", "flipadst": "av1_iflipadst%d",
        "identity": "av1_iidentity%d", "wht": "av1_iwht%d",
    }
    N_CASES = 16
    for family, sizes in fns_1d.items():
        for n in sizes:
            fn = ns[name_map[family] % n]
            for rg in (16, 18, 20):  # bd+8 for 8/10/12
                ins = []
                outs = []
                for case in range(N_CASES):
                    # realistic dequantized-coefficient magnitudes + extremes
                    scale = [64, 1024, 16384, (1 << (rg - 1)) - 1][case % 4]
                    x = rng.integers(-scale, scale + 1, size=n).astype(np.int64)
                    out = [0] * max(n, 64)
                    fn([I32(int(v)) for v in x], out, rg)
                    ins.append(x)
                    outs.append(np.array(out[:n], dtype=np.int64))
                vectors[f"{family}_{n}_r{rg}_in"] = np.stack(ins)
                vectors[f"{family}_{n}_r{rg}_out"] = np.stack(outs)

    np.savez_compressed(OUT / "inv_tx_1d.npz", **vectors)
    print(f"wrote {OUT/'inv_tx_1d.npz'}: {len(vectors)//2} vector sets")


if __name__ == "__main__":
    main()
