"""Range coder tests: encoder/decoder round-trip, backend equivalence,
checkpoint/rollback, CDF adaptation.

Modeled on the reference's inline EC tests (ec.rs:958-1152) plus fuzz-style
random round-trips with adaptive CDFs on both sides.
"""

import random

import pytest

from rav1e_tpu.ec import (
    Reader,
    WriterCounter,
    WriterEncoder,
    WriterRecorder,
    update_cdf,
)


def test_booleans_roundtrip():
    w = WriterEncoder()
    seq = [(False, 1), (True, 2), (False, 3), (True, 1), (True, 2), (False, 3)]
    for val, f in seq:
        w.bool(val, f)
    b = w.done()
    r = Reader(b)
    for val, f in seq:
        assert r.read_bool(f) == val


def test_cdf_roundtrip():
    cdf = [7296, 3819, 1716, 0]
    w = WriterEncoder()
    syms = [0, 0, 0, 1, 1, 1, 2, 2, 2]
    for s in syms:
        w.symbol(s, cdf)
    b = w.done()
    r = Reader(b)
    for s in syms:
        assert r.read_symbol(cdf) == s


def test_mixed_roundtrip():
    cdf = [7296, 3819, 1716, 0]
    w = WriterEncoder()
    w.symbol(0, cdf)
    w.bool(True, 2)
    w.symbol(0, cdf)
    w.bool(True, 2)
    w.symbol(0, cdf)
    w.bool(True, 2)
    w.symbol(1, cdf)
    w.bool(True, 1)
    w.symbol(1, cdf)
    w.bool(False, 2)
    w.symbol(1, cdf)
    w.symbol(2, cdf)
    w.symbol(2, cdf)
    w.symbol(2, cdf)
    b = w.done()
    r = Reader(b)
    assert r.read_symbol(cdf) == 0
    assert r.read_bool(2)
    assert r.read_symbol(cdf) == 0
    assert r.read_bool(2)
    assert r.read_symbol(cdf) == 0
    assert r.read_bool(2)
    assert r.read_symbol(cdf) == 1
    assert r.read_bool(1)
    assert r.read_symbol(cdf) == 1
    assert not r.read_bool(2)
    assert r.read_symbol(cdf) == 1
    assert r.read_symbol(cdf) == 2
    assert r.read_symbol(cdf) == 2
    assert r.read_symbol(cdf) == 2


def _random_cdf(rng, nsymbs):
    """Random monotonically-decreasing inverted-Q15 CDF with count=0."""
    cuts = sorted(rng.sample(range(1, 32768), nsymbs - 1), reverse=True)
    return cuts + [0]


@pytest.mark.parametrize("seed", range(4))
def test_adaptive_cdf_roundtrip(seed):
    rng = random.Random(seed)
    n_cdfs = 8
    enc_cdfs = [_random_cdf(rng, rng.randint(2, 16)) for _ in range(n_cdfs)]
    dec_cdfs = [list(c) for c in enc_cdfs]

    w = WriterEncoder()
    trace = []
    for _ in range(2000):
        which = rng.randrange(n_cdfs)
        cdf = enc_cdfs[which]
        s = rng.randrange(len(cdf) - 1)
        w.symbol_with_update(s, cdf)
        trace.append((which, s))
    b = w.done()

    r = Reader(b)
    for which, s in trace:
        assert r.read_symbol_with_update(dec_cdfs[which]) == s
    assert enc_cdfs == dec_cdfs


def test_literal_golomb_quniform_subexp_roundtrip():
    rng = random.Random(42)
    w = WriterEncoder()
    ops = []
    for _ in range(500):
        kind = rng.randrange(4)
        if kind == 0:
            bits = rng.randint(1, 16)
            v = rng.randrange(1 << bits)
            w.literal(bits, v)
            ops.append(("lit", bits, v))
        elif kind == 1:
            v = rng.randrange(100)
            w.write_golomb(v)
            ops.append(("gol", v))
        elif kind == 2:
            n = rng.randint(2, 100)
            v = rng.randrange(n)
            w.write_quniform(n, v)
            ops.append(("qun", n, v))
        else:
            n = rng.randint(2, 100)
            k = rng.randint(0, 3)
            v = rng.randrange(n)
            w.write_subexp(n, k, v)
            ops.append(("sub", n, k, v))
    b = w.done()
    r = Reader(b)
    for op in ops:
        if op[0] == "lit":
            assert r.read_literal(op[1]) == op[2]
        elif op[0] == "gol":
            assert r.read_golomb() == op[1]
        elif op[0] == "qun":
            assert r.read_quniform(op[1]) == op[2]
        else:
            assert r.read_subexp(op[1], op[2]) == op[3]


def test_subexp_with_ref_roundtrip():
    rng = random.Random(7)
    w = WriterEncoder()
    ops = []
    for _ in range(300):
        n = rng.randint(2, 64)
        k = rng.randint(0, 3)
        ref = rng.randrange(n)
        v = rng.randrange(n)
        w.write_unsigned_subexp_with_ref(v, n, k, ref)
        ops.append((n, k, ref, v))
    b = w.done()
    r = Reader(b)
    for n, k, ref, v in ops:
        assert r.read_unsigned_subexp_with_ref(n, k, ref) == v


def test_counter_matches_encoder_bits():
    """Counter and Encoder observe identical symbol streams -> same tell()."""
    rng = random.Random(3)
    cdf_e = _random_cdf(rng, 8)
    cdf_c = list(cdf_e)
    enc = WriterEncoder()
    cnt = WriterCounter()
    for _ in range(1000):
        s = rng.randrange(7)
        enc.symbol_with_update(s, cdf_e)
        cnt.symbol_with_update(s, cdf_c)
    # Counter counts shifted-out bits; encoder counts buffered bytes.
    # tell() must agree to within the encoder's byte-buffering slack.
    assert abs(enc.tell() - cnt.tell()) <= 16


def test_recorder_replay_equals_direct_encode():
    rng = random.Random(11)
    syms = [(rng.randrange(3), _random_cdf(rng, 4)) for _ in range(200)]

    direct = WriterEncoder()
    for s, cdf in syms:
        direct.symbol(s, list(cdf))
    b_direct = direct.done()

    rec = WriterRecorder()
    for s, cdf in syms:
        rec.symbol(s, list(cdf))
    enc = WriterEncoder()
    rec.replay(enc)
    b_replayed = enc.done()

    assert b_direct == b_replayed


def test_checkpoint_rollback_encoder():
    rng = random.Random(5)
    cdf = _random_cdf(rng, 6)

    w1 = WriterEncoder()
    for s in [0, 1, 2, 3]:
        w1.symbol(s, cdf)
    ckpt = w1.checkpoint()
    for s in [4, 4, 4, 0, 1]:
        w1.symbol(s, cdf)
    w1.rollback(ckpt)
    for s in [2, 2]:
        w1.symbol(s, cdf)
    b1 = w1.done()

    w2 = WriterEncoder()
    for s in [0, 1, 2, 3, 2, 2]:
        w2.symbol(s, cdf)
    b2 = w2.done()

    assert b1 == b2


def test_update_cdf_converges():
    """Adapting toward always-symbol-0 should drive cdf[0] down
    (inverted CDF: smaller cdf[0] => higher P(symbol 0))."""
    cdf = [16384, 0]
    before = cdf[0]
    for _ in range(100):
        update_cdf(cdf, 0)
    assert cdf[0] < before
    # counter saturates at 32 (low 6 bits semantics)
    assert cdf[-1] <= 63


def test_tell_monotonic():
    rng = random.Random(9)
    w = WriterEncoder()
    prev = w.tell_frac()
    cdf = _random_cdf(rng, 4)
    for _ in range(100):
        w.symbol(rng.randrange(3), cdf)
        cur = w.tell_frac()
        assert cur >= prev
        prev = cur
