"""Bit-identity verification: decode(encode(T)) == T, distributed.

The engine's upgrade of the reference's round-trip smoke test (write then
read-back then print, ref NQ:3846-3848): instead of eyeballing a CSV dump,
full-outer-join the decoded table to the source on the key and demand
null-safe equality on every column — including the byte-identical
extracted-text-per-url invariant (BASELINE.json input_hint). ONE Spark job:
a single join + aggregate computes row counts, join coverage, per-column
mismatches, AND key-uniqueness diagnostics — the r3 shape ran three
actions, re-executing the full decode once per count.
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
    # rows of the cross-product inflation when the key is NOT unique —
    # nonzero means per-column mismatch counts compare cross-matched pairs
    # and ok=False may be spurious (pick a unique key)
    duplicate_key_rows: int = 0

    @property
    def ok(self) -> bool:
        return (self.rows_expected == self.rows_decoded == self.rows_joined
                and all(v == 0 for v in self.mismatches.values()))


def _comparable(df: DataFrame, cols: list[str], prefix: str) -> DataFrame:
    """Alias columns for the join; map columns canonicalize to sorted
    entry arrays first — Spark's <=> supports no ordering on MAP, and
    map entry order is not semantically significant anyway."""
    from pyspark.sql.types import MapType
    types = {f.name: f.dataType for f in df.schema}
    out = []
    for c in cols:
        col = F.col(c)
        if isinstance(types[c], MapType):
            col = F.sort_array(F.map_entries(col))
        out.append(col.alias(f"{prefix}_{c}"))
    return df.select(out)


def verify_roundtrip(original: DataFrame, decoded: DataFrame,
                     key: str) -> VerifyResult:
    # compare the column intersection: a store whose schema has evolved
    # (renamed/dropped columns) still verifies on the shared columns
    # instead of KeyError-ing; missing ones are reported as -1 so the
    # caller can't mistake "skipped" for "verified"
    cols = [c for c in original.columns if c in decoded.columns]
    skipped = [c for c in original.columns if c not in decoded.columns]
    if key not in cols:
        raise ValueError(
            f"verify key {key!r} is not a column of both sides "
            f"(original: {original.columns}, decoded: {decoded.columns})")
    o = _comparable(original, cols, "o").withColumn("__o", F.lit(1))
    d = _comparable(decoded, cols, "d").withColumn("__d", F.lit(1))
    # eqNullSafe join: null keys still pair up (a bare == would silently
    # exclude them from every column comparison)
    joined = o.join(d, F.col(f"o_{key}").eqNullSafe(F.col(f"d_{key}")),
                    "full_outer")
    aggs = [
        F.sum(F.when(F.col("__o").isNotNull(), 1).otherwise(0))
        .alias("__o_pairs"),
        F.sum(F.when(F.col("__d").isNotNull(), 1).otherwise(0))
        .alias("__d_pairs"),
        F.sum(F.when(F.col("__o").isNotNull() & F.col("__d").isNotNull(),
                     1).otherwise(0)).alias("__joined"),
        F.count_distinct(F.when(F.col("__o").isNotNull(),
                                F.col(f"o_{key}"))).alias("__o_keys"),
    ]
    for c in cols:
        # null-safe inequality per column over MATCHED pairs only;
        # binary/timestamp compare exact
        aggs.append(F.sum(
            F.when(F.col("__o").isNull() | F.col("__d").isNull(), 0)
            .when(F.col(f"o_{c}").eqNullSafe(F.col(f"d_{c}")), 0)
            .otherwise(1)).alias(c))
    row = joined.agg(*aggs).collect()[0].asDict()
    o_pairs = int(row.pop("__o_pairs") or 0)
    d_pairs = int(row.pop("__d_pairs") or 0)
    joined_n = int(row.pop("__joined") or 0)
    o_keys = int(row.pop("__o_keys") or 0)
    mism = {k: int(v or 0) for k, v in row.items()}
    for c in skipped:
        mism[c] = -1     # not present on the decoded side: skipped
    return VerifyResult(
        rows_expected=o_pairs,
        rows_decoded=d_pairs,
        rows_joined=joined_n,
        mismatches=mism,
        duplicate_key_rows=max(o_pairs - o_keys, 0),
    )
