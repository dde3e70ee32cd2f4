"""Codec kernel round trips (SURVEY.md §5.2 item 2, fixtures per FIXTURES.md F6).

Every codec must satisfy decode(encode(x)) == x bitwise on its supported
types, including the edge shapes: empty, all-null, single-run, max
cardinality, exact bit widths (1/7/32/48/64 — the u48 shape mirrors the
reference's 6-byte timestamp decode, ref NQ:2764-2771), non-ASCII UTF-8,
zero-length-vs-NULL strings (the reference distinguishes unset optional from
empty trim, ref NQ:293-304).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from omi_cpp_parquet_wide_record_spark.codecs import (
    decode_column, encode_column,
)
from tests.conftest import arrays_equal

INT_CODECS = ["plain", "for", "delta", "dict", "rle"]
POSINT_CODECS = INT_CODECS + ["bitpack"]
STR_CODECS = ["plain", "dict", "rle", "fsst", "fsst2"]


def roundtrip(arr: pa.Array, codec: str) -> None:
    e = encode_column(arr, codec)
    d = decode_column(e.payload, e.params)
    assert arrays_equal(arr, d), f"{codec} round trip failed"


# ---------------------------------------------------------------- integers

@pytest.mark.parametrize("codec", INT_CODECS)
def test_int64_edges(codec):
    for vals in (
        [],
        [None] * 7,
        [0],
        [5] * 100,                                   # single run
        list(range(1000)),                           # monotone, max cardinality
        [1, None, -1, 2**62, -(2**62), 0, None],     # extremes + nulls
        [2**63 - 1, -(2**63), 0],                    # full int64 range (FOR wrap)
        [(1 << 48) - 1, 1 << 47, 0, 12345],          # u48 timestamp shape
    ):
        roundtrip(pa.array(vals, type=pa.int64()), codec)


@pytest.mark.parametrize("codec", POSINT_CODECS)
@pytest.mark.parametrize("width", [1, 7, 32, 48, 63])
def test_exact_bit_widths(codec, width):
    top = (1 << width) - 1
    vals = [0, 1, top, top // 2, top, None, 0]
    roundtrip(pa.array(vals, type=pa.int64()), codec)


@pytest.mark.parametrize("codec", INT_CODECS)
@pytest.mark.parametrize("t", [pa.int32(), pa.int16(), pa.int8()])
def test_narrow_int_types(codec, t):
    roundtrip(pa.array([1, -5, None, 100, 0, 100], type=t), codec)


@pytest.mark.parametrize("codec", ["plain", "for", "delta", "rle"])
def test_timestamp_and_date(codec):
    roundtrip(pa.array([1735689600000000 + i * 1001 for i in range(500)],
                       type=pa.timestamp("us")), codec)
    roundtrip(pa.array([19000, 19001, None, 20000], type=pa.date32()), codec)


@pytest.mark.parametrize("codec", ["plain", "bitpack", "rle", "dict"])
def test_bool(codec):
    roundtrip(pa.array([True, False, None, True] * 50), codec)


# ---------------------------------------------------------------- floats

@pytest.mark.parametrize("codec", ["plain", "dict", "rle"])
def test_floats(codec):
    roundtrip(pa.array([1.5, None, -0.0, 0.0, float("nan"), float("inf"), 2.5e300],
                       type=pa.float64()), codec)
    roundtrip(pa.array([1.5, None, -0.0], type=pa.float32()), codec)


# ---------------------------------------------------------------- strings

@pytest.mark.parametrize("codec", STR_CODECS)
def test_string_edges(codec):
    for vals in (
        [],
        [None, None],
        [""],                                        # empty != NULL (NQ:293-304)
        ["", None, "", None],
        ["a"] * 200,
        ["日本語テキスト", "über", "naïve", "ÿþ", ""],
        [f"https://example{i % 7}.com/path/{i}" for i in range(300)],
    ):
        roundtrip(pa.array(vals, type=pa.string()), codec)


@pytest.mark.parametrize("codec", STR_CODECS)
def test_binary_with_escape_bytes(codec):
    # 0xFF is the FSST escape: stress runs of it in payload
    vals = [b"\xff" * k for k in range(20)] + [b"\x00\xffa\xff\xff", None, b""]
    roundtrip(pa.array(vals, type=pa.binary()), codec)


def test_fsst_compresses_web_text():
    rng = np.random.default_rng(42)
    words = ["the", "quick", "brown", "compression", "http", "table", "spark"]
    docs = [" ".join(rng.choice(words, 60)) for _ in range(200)]
    arr = pa.array(docs)
    e = encode_column(arr, "fsst")
    assert len(e.payload) < 0.5 * e.bytes_in, (len(e.payload), e.bytes_in)
    assert arrays_equal(arr, decode_column(e.payload, e.params))


def test_fsst_round0_raw_bit_identical():
    # the uint16 raw-byte fast path for the first merge round must produce
    # byte-identical payloads to the generic sentineled path — boundary
    # masking vs sentinel tokens must break the greedy parity runs at the
    # same places (multi-block corpus: > BLOCK_BYTES forces the replay path)
    import omi_cpp_parquet_wide_record_spark.codecs.fsst as FZ
    rng = np.random.default_rng(7)
    words = ["<div>", "</div>", "href=", "banana", "Jabberwock", "\xff\xff"]
    docs = ["".join(rng.choice(words, rng.integers(0, 900)))
            for _ in range(1200)] + ["", "x"]
    arr = pa.array(docs)
    assert arr.nbytes > FZ.BLOCK_BYTES_DEFAULT
    c = FZ.FsstCodec()
    fast, p_fast = c.encode(arr)
    orig = FZ._round0_lut16
    FZ._round0_lut16 = lambda prog: None      # force the generic path
    try:
        slow, p_slow = c.encode(arr)
    finally:
        FZ._round0_lut16 = orig
    assert p_fast == p_slow
    assert all(a == b for a, b in zip(fast, slow))


def test_fsst_shared_plan_reuse_and_roundtrip():
    # a shared dict carries the trained table across chunks of one
    # distribution: chunk 2 must replay chunk 1's plan (no retrain) and
    # still round-trip exactly; ratio must stay within a few % of fresh
    rng = np.random.default_rng(3)
    words = ["lorem", "ipsum", "dolor", "<html>", "</html>", "href=\"x\""]
    docs = ["".join(rng.choice(words, rng.integers(1, 120)))
            for _ in range(4000)]
    arr = pa.array(docs)
    n = len(arr)
    c1, c2 = arr.slice(0, n // 2), arr.slice(n // 2)
    for codec in ("fsst", "fsst2"):
        sh: dict = {}
        e1 = encode_column(c1, codec, shared=sh)
        plan = sh["plan"] if codec == "fsst" else sh["p1"]["plan"]
        e2 = encode_column(c2, codec, shared=sh)
        after = sh["plan"] if codec == "fsst" else sh["p1"]["plan"]
        assert after is plan, f"{codec}: plan retrained without drift"
        assert arrays_equal(c1, decode_column(e1.payload, e1.params))
        assert arrays_equal(c2, decode_column(e2.payload, e2.params))
        fresh = encode_column(c2, codec)
        assert len(e2.payload) <= 1.05 * len(fresh.payload), \
            (codec, len(e2.payload), len(fresh.payload))


def test_fsst_shared_plan_drift_retrains():
    # a chunk whose bytes no longer match the trained distribution must
    # trigger a retrain (and the retrained plan replaces the shared one)
    rng = np.random.default_rng(5)
    tame = pa.array(["abcabcabc" * rng.integers(2, 40)
                     for _ in range(2000)])
    wild = pa.array(["".join(chr(33 + int(x))
                             for x in rng.integers(0, 90, 300))
                     for _ in range(1500)])
    sh: dict = {}
    encode_column(tame, "fsst", shared=sh)
    plan = sh["plan"]
    e = encode_column(wild, "fsst", shared=sh)
    assert sh["plan"] is not plan, "drifted chunk did not retrain"
    assert arrays_equal(wild, decode_column(e.payload, e.params))


# ---------------------------------------------------------------- lists

def test_list_roundtrips():
    """Composite list codec: lengths + flattened values each re-enter the
    selector. Null rows, inner nulls, empty lists, strings, and nested
    lists all round-trip; fixed-dim float lists (the embeddings shape)
    get RLE'd lengths."""
    cases = [
        pa.array([[1.0, 2.5], [], None, [3.25], [float("nan")]],
                 type=pa.list_(pa.float32())),
        pa.array([[1, None, 3], None, [], [2**62]],
                 type=pa.list_(pa.int64())),
        pa.array([["a", None], [], ["日本", ""]],
                 type=pa.list_(pa.string())),
        pa.array([[[1, 2], []], None, [[3], None]],
                 type=pa.list_(pa.list_(pa.int32()))),
        pa.array([], type=pa.list_(pa.float64())),
        pa.array([[0.5] * 16] * 300, type=pa.large_list(pa.float64())),
    ]
    for arr in cases:
        roundtrip(arr, "list")
    # the selector routes list columns to the composite codec
    from omi_cpp_parquet_wide_record_spark.selector import choose_codec
    assert choose_codec(cases[-1]).codec == "list"
    # fixed-dim lengths are one RLE/constant run — the encoded lengths
    # must be tiny next to the values
    e = encode_column(cases[-1], "list")
    assert e.params["lp"]["codec"] in ("rle", "for", "dict", "bitpack")


def test_struct_roundtrips():
    """Composite struct codec: each field encodes independently through
    the selector; null struct rows, null fields, and nesting (struct in
    list, list in struct) round-trip."""
    cases = [
        pa.array([{"a": 1, "b": "x"}, None, {"a": None, "b": ""}],
                 type=pa.struct([("a", pa.int64()), ("b", pa.string())])),
        pa.array([{"v": [1.0, 2.0], "n": 3}, {"v": [], "n": None}],
                 type=pa.struct([("v", pa.list_(pa.float64())),
                                 ("n", pa.int32())])),
        pa.array([[{"k": 1}], None, [{"k": None}, {"k": 2}]],
                 type=pa.list_(pa.struct([("k", pa.int64())]))),
    ]
    for arr in cases:
        codec = "struct" if pa.types.is_struct(arr.type) else "list"
        roundtrip(arr, codec)
    from omi_cpp_parquet_wide_record_spark.selector import choose_codec
    assert choose_codec(cases[0]).codec == "struct"


def test_map_roundtrips():
    """Composite map codec: lengths + keys + items each take their own
    codec; null map rows and null values round-trip."""
    cases = [
        pa.array([{"a": 1, "b": 2}, None, {}, {"c": None}],
                 type=pa.map_(pa.string(), pa.int64())),
        pa.array([[(1, "x"), (2, "y")], []],
                 type=pa.map_(pa.int32(), pa.string())),
    ]
    for arr in cases:
        roundtrip(arr, "map")
    from omi_cpp_parquet_wide_record_spark.selector import choose_codec
    assert choose_codec(cases[0]).codec == "map"


# ---------------------------------------------------------------- hypothesis

@settings(max_examples=60, deadline=None)
@given(st.lists(st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)), max_size=300))
@pytest.mark.parametrize("codec", INT_CODECS)
def test_prop_int64(codec, xs):
    roundtrip(pa.array(xs, type=pa.int64()), codec)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.one_of(st.none(), st.binary(max_size=40)), max_size=200))
@pytest.mark.parametrize("codec", STR_CODECS)
def test_prop_binary(codec, xs):
    roundtrip(pa.array(xs, type=pa.binary()), codec)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=30)), max_size=200))
@pytest.mark.parametrize("codec", STR_CODECS)
def test_prop_text(codec, xs):
    roundtrip(pa.array(xs, type=pa.string()), codec)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(
    st.none(),
    st.lists(st.one_of(st.none(), st.integers(-(2**62), 2**62)),
             max_size=12)), max_size=120))
def test_prop_list_int(xs):
    roundtrip(pa.array(xs, type=pa.list_(pa.int64())), "list")


# ---------------------------------------------------------------- slices

def test_sliced_nested_roundtrips():
    """Nested codecs must be offset-correct on SLICED arrays: a MapArray
    slice exposes slice-adjusted offsets but the FULL child keys/items
    arrays, so the codec has to rebase the children explicitly (r5 fix;
    list/large_list flatten() is already slice-aware but is pinned here
    too so a pyarrow behavior change is caught)."""
    m = pa.array([{"a": 1}, {"b": 2, "c": 3}, {"d": 4}, {"e": 5, "f": 6}],
                 type=pa.map_(pa.string(), pa.int64()))
    for lo, n in ((1, 2), (0, 3), (2, 2), (1, 3)):
        s = m.slice(lo, n)
        e = encode_column(s, "map")
        d = decode_column(e.payload, e.params)
        assert d.to_pylist() == s.to_pylist(), (lo, n)

    ls = pa.array([[1, 2], [3], [], [4, 5, 6], None, [7]],
                  type=pa.list_(pa.int64()))
    for lo, n in ((1, 3), (0, 4), (3, 3), (2, 4)):
        s = ls.slice(lo, n)
        e = encode_column(s, "list")
        d = decode_column(e.payload, e.params)
        assert d.to_pylist() == s.to_pylist(), (lo, n)

    stc = pa.array([{"a": 1, "b": "x"}, {"a": 2, "b": "y"},
                    None, {"a": 4, "b": "w"}],
                   type=pa.struct([("a", pa.int64()), ("b", pa.string())]))
    for lo, n in ((1, 2), (0, 3), (2, 2)):
        s = stc.slice(lo, n)
        e = encode_column(s, "struct")
        d = decode_column(e.payload, e.params)
        assert d.to_pylist() == s.to_pylist(), (lo, n)


def test_struct_field_name_validation():
    """Field names containing ':' ',' '<' '>' cannot be represented in the
    serialized type string; encode must refuse them up front (a store that
    encodes but cannot decode is the worst failure mode)."""
    for bad in ("a:b", "a,b", "a<b", "a>b"):
        arr = pa.array([{bad: 1}], type=pa.struct([(bad, pa.int64())]))
        with pytest.raises(ValueError, match="field name"):
            encode_column(arr, "struct")
    # plain names with other punctuation stay fine
    ok = pa.array([{"a.b c-d": 1}],
                  type=pa.struct([("a.b c-d", pa.int64())]))
    roundtrip(ok, "struct")


# ---------------------------------------------------------------- ALP floats

def test_alp_roundtrip_decimal_with_exceptions():
    """Decimal-valued doubles FOR-pack; specials ride as bit-exact
    positioned exceptions (codecs/alp.py)."""
    vals = [round(x * 0.01, 2) for x in range(-300, 300)]
    vals[7] = float("nan")
    vals[100] = float("inf")
    vals[200] = -0.0
    vals[250] = 2.5e300             # no finite 10^e digit fits -> exception
    arr = pa.array(vals + [None, None], type=pa.float64())
    e = encode_column(arr, "alp")
    assert e.params["nexc"] >= 3     # nan, inf, 2.5e300 at least
    assert len(e.payload) < e.bytes_in / 2
    assert arrays_equal(decode_column(e.payload, e.params), arr)


def test_alp_rejects_high_entropy():
    rng = np.random.default_rng(7)
    arr = pa.array(rng.standard_normal(2000), type=pa.float64())
    with pytest.raises(ValueError):
        encode_column(arr, "alp")


def test_alprd_roundtrip_reals():
    """Unit-range reals share exponent/high-mantissa bits: the left-part
    dictionary beats PLAIN while staying bit-exact (incl -0.0, nan)."""
    rng = np.random.default_rng(11)
    v = (rng.random(4000) * 0.5 - 0.25).astype(np.float32)
    v[5] = np.float32("nan")
    v[6] = np.float32(-0.0)
    arr = pa.array(v, type=pa.float32())
    e = encode_column(arr, "alprd")
    assert len(e.payload) < e.bytes_in
    assert arrays_equal(decode_column(e.payload, e.params), arr)


def test_alp_selector_picks_by_regime():
    from omi_cpp_parquet_wide_record_spark.selector import choose_codec
    decimals = pa.array([round(i * 0.25, 2) for i in range(5000)],
                        type=pa.float64())
    assert choose_codec(decimals).codec in ("alp", "delta", "dict")
    rng = np.random.default_rng(3)
    reals = pa.array((rng.random(5000) - 0.5).astype(np.float32),
                     type=pa.float32())
    assert choose_codec(reals).codec == "alprd"


@settings(max_examples=60, deadline=None)
@given(st.lists(st.one_of(
    st.none(),
    st.floats(allow_nan=True, allow_infinity=True, width=64),
    st.integers(-10**6, 10**6).map(lambda i: i / 100.0)), max_size=300))
@pytest.mark.parametrize("codec", ["alp", "alprd"])
def test_prop_alp_floats(codec, xs):
    """If the regime gate accepts the data, the round trip is bit-exact."""
    arr = pa.array(xs, type=pa.float64())
    try:
        e = encode_column(arr, codec)
    except ValueError:
        return
    assert arrays_equal(decode_column(e.payload, e.params), arr)
