"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at the same sf, compare row count,
column names, and an order-insensitive value hash. Usage:

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
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):           # int(inf) raises OverflowError, which
            return repr(v)          # would be misreported as an engine error
        if v == int(v) and abs(v) < 2**53:
            return str(int(v))
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):   # PySpark binary cells are
        return bytes(v).hex()               # bytearray, not bytes
    return str(v)


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
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            on, oh = table_hash(ocols, orows)
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            fails.append(name)
            continue
        status = "ok  " if (sn, sh) == (on, oh) and sorted(scols) == sorted(ocols) \
            else "FAIL"
        print(f"{status} {name}: spark={sn}/{sh} duck={on}/{oh} "
              f"cols={'=' if sorted(scols) == sorted(ocols) else (scols, ocols)}"
              f" [{time.time()-t0:.1f}s]")
        if status == "FAIL":
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
