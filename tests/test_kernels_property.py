"""Property tests for the integer-exact kernels behind the SQL-reproduced
oracles (no Spark session — pure numpy, so hypothesis can explore freely).

The load-bearing property everywhere is BIGINT-safety: every intermediate
must stay < 2^63 so an overflow-checked SQL engine can replay the exact
arithmetic. These tests pin that plus determinism and basic semantics.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from omi_cpp_parquet_wide_record_spark.fixtures import lowbias32
from omi_cpp_parquet_wide_record_spark.operators.dedup import (
    MINHASH_P, _minhash_kernel, minhash_perm_params,
)
from omi_cpp_parquet_wide_record_spark.operators.similarity import (
    LSH_SCALE, int_hyperplanes,
)

ascii_text = st.text(alphabet=st.characters(min_codepoint=32,
                                            max_codepoint=126),
                     min_size=5, max_size=120)


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_lowbias32_bigint_safe(x):
    """Every intermediate of lowbias32 must fit BIGINT (the SQL contract):
    replay the steps with unbounded Python ints and compare."""
    v = (x * 2654435761) % 4294967296
    assert x * 2654435761 < 2**63
    v = ((v ^ (v >> 16)) * 73244475) % 4294967296
    v = ((v ^ (v >> 16)) * 73244475) % 4294967296
    v = v ^ (v >> 16)
    got = int(lowbias32(np.array([x], dtype=np.int64))[0])
    assert got == v
    assert 0 <= got < 2**32


@settings(max_examples=30, deadline=None)
@given(st.lists(ascii_text, min_size=1, max_size=8))
def test_minhash_matches_scalar_replay(texts):
    """The vectorized MinHash must equal a scalar mod-p replay per doc —
    and identical docs must get identical signatures."""
    n_perms, n_sh = 8, 5
    kern = _minhash_kernel(n_perms, n_sh, 42)
    A, B = minhash_perm_params(n_perms, 42)
    bs = [t.encode() for t in texts]
    lens = np.array([len(b) for b in bs])
    corpus = np.frombuffer(b"".join(bs), dtype=np.uint8)
    ids = np.arange(len(bs))
    sigs = kern(ids, lens, corpus)
    for i, b in enumerate(bs):
        hs = []
        for o in range(len(b) - n_sh + 1):
            acc = 0
            for c in b[o:o + n_sh]:
                acc = (acc * 257 + c) % MINHASH_P
            hs.append(acc)
        for k in range(n_perms):
            want = (min((int(A[k]) * h + int(B[k])) % MINHASH_P
                        for h in hs) if hs else MINHASH_P)
            assert int(sigs[i, k]) == want
    assert (sigs < MINHASH_P + 1).all() and (sigs >= 0).all()


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=1, max_value=64),
       st.integers(min_value=1, max_value=24))
def test_int_hyperplanes_bounds(dim, n_planes):
    w = int_hyperplanes(dim, n_planes)
    assert w.shape == (n_planes, dim)
    assert w.min() >= -1000 and w.max() <= 1000
    # deterministic across calls
    assert np.array_equal(w, int_hyperplanes(dim, n_planes))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(min_value=-4.0, max_value=4.0,
                          allow_nan=False, width=32),
                min_size=4, max_size=64))
def test_fixed_point_quantization_is_exact(vals):
    """floor(v * 2^20) on float32-representable values: scaling by a power
    of two is exact in binary FP, so numpy and any IEEE SQL engine agree
    bit-for-bit; products with |w|<=1000 over <=64 dims stay << 2^63."""
    v32 = np.array(vals, dtype=np.float32)
    q = np.floor(v32.astype(np.float64) * LSH_SCALE).astype(np.int64)
    for x, qq in zip(v32.tolist(), q.tolist()):
        assert qq == int(np.floor(float(np.float32(x)) * LSH_SCALE))
    assert (np.abs(q) * 1000 * 64 < 2**63).all()


def test_rolling_fingerprint_is_composable():
    """The r3 Rabin-Karp fingerprint must satisfy the rolling property it
    advertises: fp(a || b) == (fp(a) * B^len(b) + poly(b)) mod p, so
    chunk-boundary fingerprints compose without re-reading bytes."""
    P, B = 2147483647, 257
    seed0 = (42 * 1000003 + 1) % P

    def poly(s: bytes) -> int:
        acc = 0
        for c in s:
            acc = (acc * B + c) % P
        return acc

    def fp(s: bytes) -> int:
        acc = seed0
        for c in s:
            acc = (acc * B + c) % P
        return acc

    import random
    rnd = random.Random(9)
    for _ in range(50):
        a = bytes(rnd.randrange(256) for _ in range(rnd.randrange(0, 300)))
        b = bytes(rnd.randrange(256) for _ in range(rnd.randrange(0, 300)))
        assert fp(a + b) == (fp(a) * pow(B, len(b), P) + poly(b)) % P


def test_rolling_fingerprint_kernel_matches_definition(spark):
    """The whole-batch numpy kernel (powers table + reduceat) must equal
    the scalar Horner definition byte for byte, including empty strings
    and mixed lengths in one batch."""
    from omi_cpp_parquet_wide_record_spark.operators.dedup import (
        rolling_fingerprints,
    )
    P, B = 2147483647, 257
    seed0 = (42 * 1000003 + 1) % P

    def fp(s: bytes) -> int:
        acc = seed0
        for c in s:
            acc = (acc * B + c) % P
        return acc

    texts = ["", "a", "hello world", "x" * 5000, "the quick brown fox",
             "", "zz"]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.id: r.fp for r in rolling_fingerprints(df).collect()}
    for i, t in enumerate(texts):
        assert got[i] == fp(t.encode()), (i, t[:20])
