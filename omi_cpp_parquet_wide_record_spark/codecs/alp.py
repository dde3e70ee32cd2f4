"""ALP floating-point codecs: ALP (decimal factor) and ALP-RD (real doubles).

After Afroozeh, Kuffo & Boncz, "ALP: Adaptive Lossless floating-Point
Compression" (SIGMOD 2024) — re-expressed as whole-array numpy kernels for
this engine's codec ABC (zero per-row Python, per the north rule).

Two regimes, two codecs, and the sampling selector arbitrates exactly as the
paper's two-stage sampling does:

- ``alp`` — decimal-valued floats (prices, quantities, scores: the TPC-H
  ``l_extendedprice`` shape). Each value is scaled by 10^e to an integer,
  FOR+bitpacked; values that don't survive the round trip bit-exact
  (including NaN/inf/-0.0 and true high-entropy reals) are stored verbatim
  as positioned exceptions. Simplification vs the paper: one factor 10^e
  instead of the (e, f) pair — our check is empirical per value, so the
  second factor only changes *which* values become exceptions, not
  correctness; the selector's trial rejects the codec when exceptions bloat.
- ``alprd`` — high-entropy reals (embeddings). The IEEE bit pattern is cut
  into a left (high) part — few distinct values in real data, so
  dictionary-coded — and a right (low mantissa) part stored as raw bit
  lanes. Unlike the paper's capped 8-entry dictionary + exceptions, the
  dictionary holds *all* distinct left parts (bitpacked codes grow with
  log2(cardinality)); the cut position is chosen by exhaustive cost search
  on one sorted sample, which subsumes the exception machinery.

Both decode bit-identical for every IEEE value (NaN payloads, ±0.0,
subnormals) because the payload is ultimately the bit pattern itself.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from omi_cpp_parquet_wide_record_spark.codecs.base import (
    Codec, bit_width, name_type, pack_bits, pack_uints, register,
    unpack_bits, unpack_uints,
)

# widest exponent worth probing: 10^e must stay exactly representable
# enough that round(v*10^e)/10^e can reproduce v (float64: 10^18 < 2^63;
# float32 decimals live far below that)
_MAX_E = {np.dtype(np.float32): 10, np.dtype(np.float64): 18}
_UINT = {np.dtype(np.float32): np.uint32, np.dtype(np.float64): np.uint64}
_SAMPLE = 4096


def _float_values(arr: pa.Array, codec: str) -> np.ndarray:
    if not (pa.types.is_float32(arr.type) or pa.types.is_float64(arr.type)):
        raise TypeError(f"{codec} supports float32/float64 only, got {arr.type}")
    return arr.to_numpy(zero_copy_only=False)


def _sample(v: np.ndarray) -> np.ndarray:
    if len(v) <= _SAMPLE:
        return v
    return v[:: len(v) // _SAMPLE][:_SAMPLE]


class AlpCodec(Codec):
    """round(v * 10^e) as FOR-packed int64 + bit-exact exception list."""

    name = "alp"

    @staticmethod
    def _convert(v: np.ndarray, e: int):
        """(int64 digits, exact-mask) for one candidate exponent."""
        dt = v.dtype
        scale = dt.type(10.0 ** e)
        with np.errstate(invalid="ignore", over="ignore"):
            d = np.round(v * scale)
            safe = np.isfinite(d) & (np.abs(d) < 2.0 ** 51)
            d = np.where(safe, d, 0)
        di = d.astype(np.int64)
        # exactness must be judged on the STORED digits (int64), not the
        # float intermediates: -0.0 survives float division but its digit
        # is +0, which would silently decode to +0.0
        recon = (di.astype(dt) / scale).astype(dt, copy=False)
        u = _UINT[dt]
        exact = safe & (recon.view(u) == v.view(u))
        return di, exact

    def encode(self, arr: pa.Array) -> tuple[list[bytes], dict]:
        v = _float_values(arr, self.name)
        n = len(v)
        if n == 0:
            return [b"", b"", b""], {"n": 0, "e": 0, "d": {"n": 0},
                                     "p": {"n": 0}, "nexc": 0}
        s = _sample(v)
        best_e, best_exc = 0, len(s) + 1
        for e in range(_MAX_E[v.dtype] + 1):
            _, exact = self._convert(s, e)
            exc = len(s) - int(exact.sum())
            if exc < best_exc:
                best_e, best_exc = e, exc
            if exc == 0:
                break
        if best_exc > 0.3 * len(s):
            raise ValueError("alp: column is not decimal-valued "
                             f"({best_exc}/{len(s)} sample exceptions)")
        d, exact = self._convert(v, best_e)
        exc_idx = np.nonzero(~exact)[0]
        if len(exc_idx):
            # park exceptions on an in-range digit so they don't widen FOR
            d[exc_idx] = d[int(np.argmax(exact))] if exact.any() else 0
        sec_d, p_d = pack_uints(d)
        sec_pos, p_pos = pack_uints(exc_idx)
        sec_exc = v.view(_UINT[v.dtype])[exc_idx].tobytes()
        return [sec_d, sec_pos, sec_exc], {
            "n": n, "e": best_e, "d": p_d, "p": p_pos, "nexc": len(exc_idx)}

    def decode(self, sections, params: dict) -> pa.Array:
        target = name_type(params["atype"])
        dt = np.dtype(np.float32) if params["atype"] == "float32" \
            else np.dtype(np.float64)
        n = params["n"]
        if n == 0:
            return pa.array(np.zeros(0, dt), type=target)
        d = unpack_uints(sections[0], params["d"])
        scale = dt.type(10.0 ** params["e"])
        v = (d.astype(dt) / scale).astype(dt, copy=False)
        if params["nexc"]:
            u = _UINT[dt]
            pos = unpack_uints(sections[1], params["p"])
            v.view(u)[pos] = np.frombuffer(sections[2], dtype=u)
        return pa.array(v, type=target)


class AlpRdCodec(Codec):
    """bits -> (dict-coded left part, raw right bit lanes), cut by cost."""

    name = "alprd"

    def encode(self, arr: pa.Array) -> tuple[list[bytes], dict]:
        v = _float_values(arr, self.name)
        n = len(v)
        width = 32 if v.dtype == np.float32 else 64
        if n == 0:
            return [b"", b"", b""], {"n": 0, "r": 0, "dict": {"n": 0},
                                     "codes": {"n": 0}}
        bits = v.view(_UINT[v.dtype]).astype(np.uint64)
        # cost search: one sort of a sample, then distinct-left counts per
        # candidate left width fall out of adjacent-xor shifts
        s = np.sort(_sample(bits))
        ns = len(s)
        xor = s[1:] ^ s[:-1] if ns > 1 else np.zeros(0, np.uint64)
        best_r, best_cost = None, float(width) * 0.98  # must beat PLAIN
        for left_w in range(1, min(28, width - 1) + 1):
            r = width - left_w
            distinct = 1 + int(np.count_nonzero(xor >> np.uint64(r)))
            per_val = bit_width(distinct - 1) + r
            cost = per_val + distinct * left_w / ns
            if cost < best_cost:
                best_r, best_cost = r, cost
        if best_r is None:
            raise ValueError("alprd: no cut beats PLAIN on this sample")
        r = best_r
        left = bits >> np.uint64(r)
        right = bits & np.uint64((1 << r) - 1)
        uniq, codes = np.unique(left, return_inverse=True)
        # pass the dict as uint64 so pack_uints frames from the unsigned
        # min — an int64 view would put negative-float patterns (sign bit
        # set) below zero and wrap the frame across the whole domain
        sec_dict, p_dict = pack_uints(uniq)
        sec_codes, p_codes = pack_uints(codes.astype(np.int64))
        sec_right = pack_bits(right, r)
        return [sec_dict, sec_codes, sec_right], {
            "n": n, "r": r, "dict": p_dict, "codes": p_codes}

    def decode(self, sections, params: dict) -> pa.Array:
        target = name_type(params["atype"])
        dt = np.dtype(np.float32) if params["atype"] == "float32" \
            else np.dtype(np.float64)
        n = params["n"]
        if n == 0:
            return pa.array(np.zeros(0, dt), type=target)
        r = params["r"]
        uniq = unpack_uints(sections[0], params["dict"]).view(np.uint64)
        codes = unpack_uints(sections[1], params["codes"])
        right = unpack_bits(sections[2], n, r)
        bits = (uniq[codes] << np.uint64(r)) | right
        u = _UINT[dt]
        return pa.array(bits.astype(u).view(dt), type=target)


register(AlpCodec())
register(AlpRdCodec())
