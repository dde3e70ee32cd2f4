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

# storage dtype per logical type — the single map lives in base so a new
# logical type cannot silently miss one of two copies
_NP_STORE = base._NP_BY_NAME


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
        # uint64 must reinterpret the int64 bit pattern, not value-cast it
        store = v.view(np.uint64) if name == "uint64" \
            else v.astype(_NP_STORE[name], copy=False)
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
