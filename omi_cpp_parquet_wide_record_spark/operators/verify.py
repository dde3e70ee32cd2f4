"""Bit-identity verification: decode(encode(T)) == T, distributed.

The engine's upgrade of the reference's round-trip smoke test (write then
read-back then print, ref NQ:3846-3848): instead of eyeballing a CSV dump,
join the decoded table to the source on the key and demand null-safe
equality on every column — including the byte-identical extracted-text-per-
url invariant (BASELINE.json input_hint). Runs as a Spark job: one join
(sort-merge or broadcast per Catalyst), one aggregate, no driver data.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass
class VerifyResult:
    rows_expected: int
    rows_decoded: int
    rows_joined: int
    mismatches: dict[str, int]

    @property
    def ok(self) -> bool:
        return (self.rows_expected == self.rows_decoded == self.rows_joined
                and all(v == 0 for v in self.mismatches.values()))


def verify_roundtrip(original: DataFrame, decoded: DataFrame,
                     key: str) -> VerifyResult:
    cols = [c for c in original.columns]
    o = original.select([F.col(c).alias(f"o_{c}") for c in cols])
    d = decoded.select([F.col(c).alias(f"d_{c}") for c in cols])
    joined = o.join(d, F.col(f"o_{key}") == F.col(f"d_{key}"), "inner")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        # null-safe inequality per column; binary/timestamp compare exact
        aggs.append(F.sum(
            F.when(F.col(f"o_{c}").eqNullSafe(F.col(f"d_{c}")), 0).otherwise(1)
        ).alias(c))
    row = joined.agg(*aggs).collect()[0].asDict()
    joined_n = row.pop("__n")
    return VerifyResult(
        rows_expected=original.count(),
        rows_decoded=decoded.count(),
        rows_joined=joined_n,
        mismatches={k: int(v or 0) for k, v in row.items()},
    )
