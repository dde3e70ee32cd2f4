"""Composite codec for list<T> columns (embeddings and other nested
data): the value LENGTHS and the flattened child VALUES encode as two
independent sub-columns, each through the sampling selector — lengths
are small ints (DELTA/RLE/BITPACK; a fixed-dim embedding column is one
RLE run), values ride their own type's candidate set (list<float> the
float path, list<string> the FSST/dict path), and nested lists recurse
naturally because the child column is itself a list.

The reference has no nested-column analogue (its wide records are flat,
ref NQ:3078-3153); this extends the engine to the training-data tables
(TESTDATA.md embeddings) without touching the chunk format: sections are
[len_payload, value_payload] and the child params nest in this codec's
params, so footers/manifests stay schema-stable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from omi_cpp_parquet_wide_record_spark.codecs.base import (
    Codec, decode_column, encode_column, name_type, register,
)


class ListCodec(Codec):
    name = "list"

    def encode(self, arr: pa.Array) -> tuple[list[bytes], dict]:
        # encode_column has already stripped null rows; child-value nulls
        # survive flatten() and are handled by the recursive encode_column
        from omi_cpp_parquet_wide_record_spark.selector import choose_codec
        lens = pa.array(arr.value_lengths().to_numpy(zero_copy_only=False)
                        .astype(np.int32), type=pa.int32())
        values = arr.flatten()
        el = encode_column(lens, choose_codec(lens).codec)
        ev = encode_column(values, choose_codec(values).codec)
        return [el.payload, ev.payload], {"lp": el.params, "vp": ev.params}

    def decode(self, sections: list, params: dict) -> pa.Array:
        lens = decode_column(sections[0], params["lp"]) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        values = decode_column(sections[1], params["vp"])
        offsets = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        out = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()), values)
        target = name_type(params["atype"])
        return out if out.type == target else out.cast(target)


class StructCodec(Codec):
    """Composite codec for struct<...> columns: each child field encodes
    as its own sub-column through the sampling selector (sections are the
    child payloads in field order; child params nest under "fields").
    encode_column has already stripped null STRUCT rows; child nulls are
    handled by the recursive encode_column."""

    name = "struct"

    def encode(self, arr: pa.Array) -> tuple[list[bytes], dict]:
        from omi_cpp_parquet_wide_record_spark.selector import choose_codec
        sections, fields = [], []
        for i, f in enumerate(arr.type):
            child = arr.field(i)
            e = encode_column(child, choose_codec(child).codec)
            sections.append(e.payload)
            fields.append({"name": f.name, "p": e.params})
        return sections, {"fields": fields}

    def decode(self, sections: list, params: dict) -> pa.Array:
        children = [decode_column(s, f["p"])
                    for s, f in zip(sections, params["fields"])]
        out = pa.StructArray.from_arrays(
            children, names=[f["name"] for f in params["fields"]])
        target = name_type(params["atype"])
        return out if out.type == target else out.cast(target)


class MapCodec(Codec):
    """Composite codec for map<K, V> columns: entry lengths, keys, and
    items encode as three independent sub-columns through the selector
    (a props-style map column gets DICT'd keys for free)."""

    name = "map"

    def encode(self, arr: pa.Array) -> tuple[list[bytes], dict]:
        from omi_cpp_parquet_wide_record_spark.selector import choose_codec
        # value_lengths has no map kernel in pyarrow: diff the offsets.
        # arr.offsets is slice-adjusted but arr.keys/arr.items are NOT —
        # a MapArray with non-zero offset (e.g. m.slice(1, 2)) exposes the
        # full child arrays, so rebase keys/items onto [off[0], off[-1])
        # explicitly or a sliced input silently mis-pairs entries to rows.
        off = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = pa.array((off[1:] - off[:-1]).astype(np.int32),
                        type=pa.int32())
        lo = int(off[0]) if len(off) else 0
        hi = int(off[-1]) if len(off) else 0
        keys = arr.keys.slice(lo, hi - lo)
        items = arr.items.slice(lo, hi - lo)
        subs = []
        for child in (lens, keys, items):
            e = encode_column(child, choose_codec(child).codec)
            subs.append(e)
        return [e.payload for e in subs], {
            "lp": subs[0].params, "kp": subs[1].params,
            "ip": subs[2].params}

    def decode(self, sections: list, params: dict) -> pa.Array:
        lens = decode_column(sections[0], params["lp"]) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        keys = decode_column(sections[1], params["kp"])
        items = decode_column(sections[2], params["ip"])
        offsets = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        out = pa.MapArray.from_arrays(
            pa.array(offsets, type=pa.int32()).cast(pa.int32()),
            keys, items)
        target = name_type(params["atype"])
        return out if out.type == target else out.cast(target)


register(ListCodec())
register(StructCodec())
register(MapCodec())
