"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at the same sf, compare row count,
column names, result TYPE FAMILIES, and an order-insensitive value hash.

Type faithfulness (r6): the driver's normalization distinguishes value
classes — DuckDB HUGEINT/DECIMAL results surface as decimal.Decimal cells
(via Arrow), which hash differently from Spark's int/float even when
numerically equal (the sessionize/codec_for lesson, red twice). The oracle
side is therefore fetched through .arrow() (the type-preserving path) and
every cell is normalized WITH its class tag, so a BIGINT-vs-HUGEINT or
int-vs-double divergence fails HERE before it fails on the driver. Integer
widths (int32 vs int64) are deliberately the same family — the driver is
proven insensitive to them (scalar_array n_words, green for rounds).

Usage:
    python tools/validate_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    import datetime
    import math
    from decimal import Decimal
    if v is None:
        return "\x00"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        if math.isinf(v):
            return f"f:{v!r}"
        # NO int collapse: 42.0 must hash as a float, not as 42 — the
        # driver's normalization keeps the class (codec_for red row)
        return f"f:{v!r}"
    if isinstance(v, Decimal):
        # HUGEINT/DECIMAL results: a distinct class on the driver too
        return f"d:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, datetime.datetime):
        return f"t:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"t:{v.isoformat()}"
    if isinstance(v, (bytes, bytearray)):   # PySpark binary cells are
        return f"y:{bytes(v).hex()}"        # bytearray, not bytes
    if isinstance(v, (list, tuple)):
        return "l:[" + ",".join(norm_cell(x) for x in v) + "]"
    return f"s:{v}"


def _spark_family(dt) -> str:
    from pyspark.sql import types as T
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "time"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    if isinstance(dt, T.ArrayType):
        return f"list<{_spark_family(dt.elementType)}>"
    return dt.simpleString()


def _arrow_family(dt) -> str:
    import pyarrow as pa
    if pa.types.is_integer(dt):
        return "int"
    if pa.types.is_floating(dt):
        return "float"
    if pa.types.is_decimal(dt):
        return "decimal"
    if pa.types.is_string(dt) or pa.types.is_large_string(dt):
        return "str"
    if pa.types.is_boolean(dt):
        return "bool"
    if pa.types.is_temporal(dt):
        return "time"
    if pa.types.is_binary(dt) or pa.types.is_large_binary(dt):
        return "bytes"
    if pa.types.is_list(dt) or pa.types.is_large_list(dt):
        return f"list<{_arrow_family(dt.value_type)}>"
    return str(dt)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[int, str]:
    import hashlib
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), h


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from omi_cpp_parquet_wide_record_spark.session import get_spark
    spark = get_spark("oracle-validate", cores=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            sfam = {f.name: _spark_family(f.dataType)
                    for f in sdf.schema.fields}
            sn, sh = table_hash(scols, [tuple(r) for r in srows])
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__} {e}")
            fails.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={sn} (rows-only, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            # .arrow() preserves the result's type classes (HUGEINT ->
            # decimal128 -> Decimal cells), exactly the lens the driver
            # judges through; fetchall() would collapse them to int
            tbl = con.execute(oracles[name]).arrow()
            ocols = tbl.schema.names
            ofam = {f.name: _arrow_family(f.type) for f in tbl.schema}
            orows = [tuple(d.values()) for d in tbl.to_pylist()]
            on, oh = table_hash(ocols, orows)
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            fails.append(name)
            continue
        fam_mismatch = {c: (sfam.get(c), ofam.get(c))
                        for c in set(scols) & set(ocols)
                        if sfam.get(c) != ofam.get(c)}
        ok = ((sn, sh) == (on, oh) and sorted(scols) == sorted(ocols)
              and not fam_mismatch)
        status = "ok  " if ok else "FAIL"
        print(f"{status} {name}: spark={sn}/{sh} duck={on}/{oh} "
              f"cols={'=' if sorted(scols) == sorted(ocols) else (scols, ocols)}"
              f" [{time.time()-t0:.1f}s]")
        if fam_mismatch:
            print(f"     TYPE-FAMILY mismatch (spark, duck): {fam_mismatch}")
        if not ok:
            fails.append(name)
            # show a sample diff
            sset = {tuple(norm_cell(v) for v in r) for r in
                    [tuple(r) for r in srows][:100000]}
            oset = {tuple(norm_cell(v) for v in r) for r in orows[:100000]}
            so = list(sset - oset)[:2]
            os_ = list(oset - sset)[:2]
            print(f"     spark-only: {so}")
            print(f"     duck-only : {os_}")
    print(f"\n{len(fails)} failures: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
