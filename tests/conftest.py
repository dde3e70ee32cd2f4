"""Shared test helpers: one SparkSession per test run, bitwise array equality."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def arrays_equal(a: pa.Array, b: pa.Array) -> bool:
    """Bit-identity compare: validity masks equal, non-null values bitwise
    equal (floats compared on their bit patterns, so NaN == NaN)."""
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    if isinstance(b, pa.ChunkedArray):
        b = b.combine_chunks()
    if len(a) != len(b) or a.type != b.type:
        return False
    av, bv = a.is_valid().to_numpy(zero_copy_only=False), \
        b.is_valid().to_numpy(zero_copy_only=False)
    if not np.array_equal(av, bv):
        return False
    an, bn = a.drop_null(), b.drop_null()
    if pa.types.is_list(a.type) or pa.types.is_large_list(a.type):
        la = an.value_lengths().to_numpy(zero_copy_only=False)
        lb = bn.value_lengths().to_numpy(zero_copy_only=False)
        if not np.array_equal(la, lb):
            return False
        return arrays_equal(an.flatten(), bn.flatten())
    if pa.types.is_struct(a.type):
        return all(arrays_equal(an.field(i), bn.field(i))
                   for i in range(a.type.num_fields))
    if pa.types.is_map(a.type):
        oa = an.offsets.to_numpy(zero_copy_only=False)
        ob = bn.offsets.to_numpy(zero_copy_only=False)
        if not np.array_equal(np.diff(oa), np.diff(ob)):
            return False
        return arrays_equal(an.keys, bn.keys) \
            and arrays_equal(an.items, bn.items)
    if pa.types.is_floating(a.type):
        ai = an.to_numpy(zero_copy_only=False)
        bi = bn.to_numpy(zero_copy_only=False)
        return np.array_equal(ai.view(np.uint64 if ai.dtype == np.float64 else np.uint32),
                              bi.view(np.uint64 if bi.dtype == np.float64 else np.uint32))
    return an.equals(bn)


@pytest.fixture(scope="session")
def spark():
    from omi_cpp_parquet_wide_record_spark.session import get_spark
    s = get_spark("pytest", cores=4, shuffle_partitions=8)
    yield s
