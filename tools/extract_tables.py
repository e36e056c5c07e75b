#!/usr/bin/env python3
"""Extract normative AV1 constant tables into rav1e_tpu/data/*.npz.

AV1 is defined in terms of large normative constant tables: default CDF
initializations (AV1 spec section 9.4 "Default CDF tables"), quantizer
step-size lookups (spec 7.12.2 / Tables Dc_Qlookup & Ac_Qlookup), and
coefficient scan orders (spec 5.11.41 / section 9.5).  These are *data*, not
code; any AV1 implementation must carry bit-identical copies.

This tool parses them out of the reference implementation's table files
(rav1e: src/entropymode.rs, src/token_cdfs.rs, src/quantize/tables.rs,
src/scan_order.rs, src/context/block_unit.rs) and serializes them as numpy
archives consumed by :mod:`rav1e_tpu.tables`.  Conversions applied:

- CDFs: rav1e stores forward cumulative probabilities wrapped in
  ``cdf_Nd()`` helpers that invert them (``32768 - p``) and append a zero
  count slot; we store the *inverted runtime layout* (what the coder uses).
- Scan orders: rav1e transposes coefficient blocks relative to the AV1 spec
  (see the comment at scan_order.rs:71-75); we store **spec orientation**
  (transposed back), since this codebase keeps coefficients in spec layout.

Run:  python tools/extract_tables.py [--reference /root/reference]
"""

from __future__ import annotations

import argparse
import ast
import re
from pathlib import Path

import numpy as np


# --------------------------------------------------------------------------
# A tiny evaluator for the Rust array-literal subset used by the table files:
# nested [..] arrays, integer literals, products like `128 * 125`, and
# cdf()/cdf_2d()/../cdf_5d() calls.
# --------------------------------------------------------------------------


def _strip_comments(src: str) -> str:
    src = re.sub(r"//[^\n]*", "", src)
    src = re.sub(r"/\*.*?\*/", "", src, flags=re.S)
    return src


class RustLiteralParser:
    def __init__(self, text: str):
        self.t = text
        self.i = 0

    def ws(self):
        while self.i < len(self.t) and self.t[self.i] in " \t\r\n,":
            self.i += 1

    def parse_value(self):
        self.ws()
        c = self.t[self.i]
        if c == "[":
            return self.parse_array()
        m = re.match(r"cdf(_[2-5]d)?\s*\(", self.t[self.i :])
        if m:
            self.i += m.end()
            inner = self.parse_value()
            self.ws()
            assert self.t[self.i] == ")", f"expected ) at {self.i}"
            self.i += 1
            return ("cdf", inner)
        # integer expression: number (optionally `* number`)
        m = re.match(r"(\d+)(\s*\*\s*(\d+))?", self.t[self.i :])
        assert m, f"cannot parse at: {self.t[self.i:self.i+40]!r}"
        self.i += m.end()
        v = int(m.group(1))
        if m.group(3):
            v *= int(m.group(3))
        return v

    def parse_array(self):
        assert self.t[self.i] == "["
        self.i += 1
        out = []
        while True:
            self.ws()
            if self.t[self.i] == "]":
                self.i += 1
                return out
            out.append(self.parse_value())
            # Rust repeat syntax: [elem; N]
            self.ws_no_comma()
            if self.t[self.i] == ";":
                self.i += 1
                self.ws()
                m = re.match(r"(\d+)", self.t[self.i :])
                assert m
                self.i += m.end()
                n = int(m.group(1))
                self.ws()
                assert self.t[self.i] == "]"
                self.i += 1
                elem = out.pop()
                return out + [elem] * n

    def ws_no_comma(self):
        while self.i < len(self.t) and self.t[self.i] in " \t\r\n":
            self.i += 1


def _apply_cdf(node):
    """Resolve ('cdf', nested) nodes: invert innermost vectors and append 0."""
    if isinstance(node, tuple) and node[0] == "cdf":
        return _invert(node[1])
    if isinstance(node, list):
        return [_apply_cdf(x) for x in node]
    return node


def _invert(node):
    if isinstance(node, list) and node and isinstance(node[0], list):
        return [_invert(x) for x in node]
    assert isinstance(node, list)
    for v in node:
        assert isinstance(v, int) and v <= 32768
    return [32768 - v for v in node] + [0]


def extract_statics(path: Path, name_filter) -> dict:
    """Parse ``pub static/const NAME: ... = <literal>;`` declarations."""
    src = _strip_comments(path.read_text())
    out = {}
    for m in re.finditer(
        r"pub\s+(?:static|const)\s+(\w+)\s*:\s*[^=]+=\s*", src
    ):
        name = m.group(1)
        if not name_filter(name):
            continue
        p = RustLiteralParser(src)
        p.i = m.end()
        try:
            val = p.parse_value()
        except AssertionError:
            continue  # not a pure literal (e.g. struct init) — handled elsewhere
        arr = np.array(_pad_ragged(_apply_cdf(val)), dtype=np.uint16)
        out[name] = arr
    return out


def _pad_ragged(node):
    """Zero-pad ragged innermost vectors to the global max length (matches
    the reference's fixed-width storage, e.g. palette CDFs padded to
    PALETTE_COLORS; actual nsymbs is context-dependent at runtime)."""

    def innermost_max(n):
        if isinstance(n, list) and n and isinstance(n[0], list):
            return max(innermost_max(x) for x in n)
        return len(n) if isinstance(n, list) else 0

    def pad(n, width):
        if isinstance(n, list) and n and isinstance(n[0], list):
            return [pad(x, width) for x in n]
        return n + [0] * (width - len(n))

    if not isinstance(node, list):
        return node
    return pad(node, innermost_max(node))


def extract_nmv(path: Path) -> dict:
    """Parse the default_nmv_context struct literal (block_unit.rs:556)."""
    src = _strip_comments(path.read_text())
    m = re.search(r"pub\s+static\s+default_nmv_context[^{]*\{(.*?)\n\};", src, flags=re.S)
    assert m, "default_nmv_context not found"
    body = m.group(0)
    fields = {}
    for fm in re.finditer(r"(\w+)\s*:\s*(cdf(?:_[2-5]d)?\s*\()", body):
        fname = fm.group(1)
        p = RustLiteralParser(body)
        p.i = fm.start(2)
        val = p.parse_value()
        arr = np.array(_apply_cdf(val), dtype=np.uint16)
        fields.setdefault(fname, []).append(arr)
    out = {}
    # joints is frame-level; the per-component CDFs appear twice (comps[0], comps[1])
    # and are identical — verify and keep one copy, runtime duplicates them.
    for fname, arrs in fields.items():
        if fname == "joints_cdf":
            assert len(arrs) == 1
            out["nmv_joints_cdf"] = arrs[0]
        else:
            assert len(arrs) == 2 and np.array_equal(arrs[0], arrs[1]), fname
            out[f"nmv_{fname}"] = arrs[0]
    return out


def extract_scans(path: Path) -> dict:
    """Extract scan tables, converting to spec orientation.

    rav1e stores scans over transposed coefficient blocks; a scan is a list
    of raster indices (into the transposed WxH block).  To convert index i
    (row-major in a `rows x cols` transposed block) to spec orientation we
    swap: spec_idx = (i % cols) * rows + (i // cols) over the spec block of
    shape `cols(spec rows) x rows(spec cols)` ... concretely we map via
    (r, c) -> (c, r).
    """
    src = _strip_comments(path.read_text())
    out = {}
    for m in re.finditer(
        r"static\s+((?:default|mrow|mcol)_scan_(\d+)x(\d+))\s*:\s*\[u16;\s*\d+\]\s*=\s*",
        src,
    ):
        name, w, h = m.group(1), int(m.group(2)), int(m.group(3))
        p = RustLiteralParser(src)
        p.i = m.end()
        vals = p.parse_value()
        arr = np.array(vals, dtype=np.uint16)
        # rav1e's NxM scan table indexes a transposed coefficient layout.
        # Its name `AxB` matches the rav1e TxSize; determine the raster shape
        # from the element count and the declared AxB: raster width = w? The
        # tables index position r*stride+c; stride is the rav1e block width.
        # rav1e block (named WxH) stores coefficients transposed, so its
        # in-memory block is laid out with stride = W.
        n = arr.size
        assert n == w * h
        # The table name WxH is the spec block size; rav1e's buffer stores
        # coefficient (row r, col c) of that block at p = c*H + r (transposed,
        # see forward.rs output chunking). Convert each scanned position to a
        # spec row-major index r*W + c.
        c, r = np.divmod(arr.astype(np.int64), h)
        spec = (r * w + c).astype(np.uint16)
        out[f"{name}"] = spec
    return out


def extract_quant(path: Path) -> dict:
    src = _strip_comments(path.read_text())
    out = {}
    for m in re.finditer(
        r"const\s+((?:dc|ac)_qlookup(?:_1[02])?_Q3)_raw\s*:\s*\[u16;\s*\w+\]\s*=\s*",
        src,
    ):
        name = m.group(1)
        p = RustLiteralParser(src)
        p.i = m.end()
        out[name] = np.array(p.parse_value(), dtype=np.uint16)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default=str(Path(__file__).resolve().parent.parent / "rav1e_tpu/data"))
    args = ap.parse_args()
    ref = Path(args.reference)
    outdir = Path(args.out)
    outdir.mkdir(parents=True, exist_ok=True)

    mode_cdfs = extract_statics(ref / "src/entropymode.rs", lambda n: "cdf" in n)
    nmv = extract_nmv(ref / "src/context/block_unit.rs")
    mode_cdfs.update(nmv)
    np.savez_compressed(outdir / "default_cdfs.npz", **mode_cdfs)
    print(f"default_cdfs.npz: {len(mode_cdfs)} tables")

    token = extract_statics(ref / "src/token_cdfs.rs", lambda n: n.startswith("av1_default"))
    np.savez_compressed(outdir / "token_cdfs.npz", **token)
    print(f"token_cdfs.npz: {len(token)} tables")

    scans = extract_scans(ref / "src/scan_order.rs")
    np.savez_compressed(outdir / "scan_orders.npz", **scans)
    print(f"scan_orders.npz: {len(scans)} tables")

    quant = extract_quant(ref / "src/quantize/tables.rs")
    np.savez_compressed(outdir / "quant_tables.npz", **quant)
    print(f"quant_tables.npz: {len(quant)} tables")


if __name__ == "__main__":
    main()
