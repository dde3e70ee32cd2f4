"""PLAIN codec — the escape hatch (SURVEY.md §2.3).

Matches the reference's fallback behavior: Parquet PLAIN when dictionary
overflows (ref NQ:3396 default WriterProperties). Fixed-width values at their
natural width, bytes-like columns as packed lengths + corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from omi_cpp_parquet_wide_record_spark.codecs import base
from omi_cpp_parquet_wide_record_spark.codecs.base import (
    Codec, bytes_block, block_to_array, is_bytes_like, name_type, numeric_values,
    pack_uints, register, type_name, unpack_uints, values_to_array,
)

_NP_STORE = {
    "bool": np.uint8, "int8": np.int8, "uint8": np.uint8,
    "int16": np.int16, "uint16": np.uint16, "int32": np.int32,
    "uint32": np.uint32, "int64": np.int64, "uint64": np.uint64,
    "float32": np.float32, "float64": np.float64, "date32": np.int32,
    "timestamp_us": np.int64, "timestamp_us_utc": np.int64, "timestamp_ns": np.int64,
}


class PlainCodec(Codec):
    name = "plain"

    def encode(self, arr: pa.Array) -> tuple[list[bytes], dict]:
        t = arr.type
        if is_bytes_like(t):
            lengths, corpus = bytes_block(arr)
            lens_payload, lp = pack_uints(lengths)
            return [lens_payload, bytes(corpus)], {"lens": lp, "n": len(arr)}
        name = type_name(t)
        if pa.types.is_floating(t):
            v = arr.to_numpy(zero_copy_only=False)
        else:
            v = numeric_values(arr)
        store = v.astype(_NP_STORE[name], copy=False)
        if name == "uint64":
            store = numeric_values(arr).view(np.uint64)
        return [np.ascontiguousarray(store).tobytes()], {"n": len(arr)}

    def decode(self, sections, params: dict) -> pa.Array:
        target = name_type(params["atype"])
        if is_bytes_like(target):
            lengths = unpack_uints(sections[0], params["lens"])
            return block_to_array(lengths, sections[1], target)
        name = params["atype"]
        v = np.frombuffer(sections[0], dtype=_NP_STORE[name])
        if pa.types.is_floating(target):
            return pa.array(v, type=target)
        if v.dtype != np.int64:
            v = v.astype(np.int64) if v.dtype != np.uint64 else v.view(np.int64)
        else:
            v = v.copy() if not v.flags.writeable else v
        return values_to_array(v.astype(np.int64, copy=False), target)


register(PlainCodec())
