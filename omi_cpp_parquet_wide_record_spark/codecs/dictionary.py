"""DICT codec: arrow dictionary-encode + bit-packed codes.

The explicit analogue of the Parquet dictionary encoding the reference relies
on implicitly (default WriterProperties, ref NQ:3396). Values page is encoded
recursively with PLAIN; codes are bit-packed at ceil(log2(n_dict)) bits, the
RLE_DICTIONARY shape without the hybrid runs (RLE is its own codec here).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from omi_cpp_parquet_wide_record_spark.codecs.base import (
    Codec, bit_width, name_type, pack_bits, register, split_sections,
    type_name, unpack_bits,
)
from omi_cpp_parquet_wide_record_spark.codecs.plain import PlainCodec


class DictCodec(Codec):
    name = "dict"

    def encode(self, arr: pa.Array) -> tuple[list[bytes], dict]:
        if len(arr) == 0:
            return [b"", b""], {"n": 0, "w": 0, "ndict": 0,
                                "values": {"sections": []}}
        denc = arr.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
        values = denc.dictionary
        w = bit_width(len(values) - 1) if len(values) > 1 else 0
        vsections, vparams = PlainCodec().encode(values)
        vpayload = b"".join(vsections)
        vparams = {**vparams, "atype": type_name(values.type),
                   "sections": [len(s) for s in vsections]}
        return [pack_bits(codes, w), vpayload], {
            "n": len(arr), "w": w, "ndict": len(values), "values": vparams}

    def decode(self, sections, params: dict) -> pa.Array:
        target = name_type(params["atype"])
        if params["n"] == 0:
            return pa.array([], type=target)
        vparams = params["values"]
        vsections = split_sections(sections[1], vparams["sections"])
        values = PlainCodec().decode(vsections, vparams)
        if values.type != target:
            values = values.cast(target)
        codes = unpack_bits(sections[0], params["n"], params["w"]).view(np.int64)
        return values.take(pa.array(codes, type=pa.int64()))


class RleCodec(Codec):
    """Run-length encoding: run values (dict-encoded) + bit-packed run lengths.

    Wins on sorted/clustered columns; the analogue of Parquet's def-level RLE
    that the reference's OPTIONAL columns lean on (ref NQ:286 repetition).
    Works for any logical type by running over dictionary codes.
    """

    name = "rle"

    def encode(self, arr: pa.Array) -> tuple[list[bytes], dict]:
        n = len(arr)
        if n == 0:
            return [b"", b"", b""], {"n": 0, "nruns": 0, "wlen": 0, "wcode": 0,
                                     "values": {"sections": []}}
        denc = arr.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        values = denc.dictionary
        change = np.empty(n, dtype=bool)
        change[0] = True
        np.not_equal(codes[1:], codes[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        run_codes = codes[starts].astype(np.uint64)
        run_lens = (np.diff(np.append(starts, n))).astype(np.uint64)
        wcode = bit_width(len(values) - 1) if len(values) > 1 else 0
        wlen = bit_width(int(run_lens.max()))
        vsections, vparams = PlainCodec().encode(values)
        vparams = {**vparams, "atype": type_name(values.type),
                   "sections": [len(s) for s in vsections]}
        return [pack_bits(run_codes, wcode), pack_bits(run_lens, wlen),
                b"".join(vsections)], {
            "n": n, "nruns": len(starts), "wlen": wlen, "wcode": wcode,
            "values": vparams}

    def decode(self, sections, params: dict) -> pa.Array:
        target = name_type(params["atype"])
        if params["n"] == 0:
            return pa.array([], type=target)
        nruns = params["nruns"]
        run_codes = unpack_bits(sections[0], nruns, params["wcode"]).view(np.int64)
        run_lens = unpack_bits(sections[1], nruns, params["wlen"]).view(np.int64)
        vparams = params["values"]
        vsections = split_sections(sections[2], vparams["sections"])
        values = PlainCodec().decode(vsections, vparams)
        if values.type != target:
            values = values.cast(target)
        codes = np.repeat(run_codes, run_lens)
        return values.take(pa.array(codes, type=pa.int64()))


register(DictCodec())
register(RleCodec())
