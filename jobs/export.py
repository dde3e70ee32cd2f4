#!/usr/bin/env python
"""Export job CLI — decode a chunk store back out to Parquet (or CSV).

The outbound half of the store lifecycle (encode.py writes, verify.py
proves, export.py hands the data to downstream consumers that speak plain
Parquet). Projection, predicate pushdown, and time travel all apply, so an
export can be a pruned slice, not just a full dump.

    spark-submit --py-files dist/owr_spark.zip jobs/export.py \
        --store /data/store --output /data/pages_out \
        [--columns url lang] [--snapshot N] \
        [--filter lang == en] [--format parquet|csv] \
        [--planning driver|distributed]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_filter(parts: list[str]):
    """['lang', '==', 'en'] -> ('lang', '==', typed value).

    Numeric-looking values coerce to int/float (zone maps prune on
    numbers); quote the value ('"007"') to force a string comparison on
    string columns whose keys look numeric."""
    if len(parts) != 3:
        raise SystemExit(f"--filter wants: COL OP VALUE (got {parts})")
    col, op, raw = parts
    if op not in ("<", "<=", ">", ">=", "=="):
        raise SystemExit(f"--filter op must be one of < <= > >= == ({op})")
    if len(raw) >= 2 and raw[0] == raw[-1] and raw[0] in "'\"":
        return col, op, raw[1:-1]
    for cast in (int, float):
        try:
            return col, op, cast(raw)
        except ValueError:
            continue
    return col, op, raw


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--columns", nargs="*", default=None)
    ap.add_argument("--snapshot", type=int, default=None,
                    help="time-travel to snapshot N (default: live)")
    ap.add_argument("--since-snapshot", type=int, default=None,
                    help="incremental append scan: only rows committed "
                         "after snapshot M")
    ap.add_argument("--filter", nargs=3, action="append", default=None,
                    metavar=("COL", "OP", "VALUE"),
                    help="pushed-down predicate, repeatable (ANDed)")
    ap.add_argument("--format", choices=["parquet", "csv"],
                    default="parquet")
    ap.add_argument("--planning", choices=["driver", "distributed"],
                    default="driver")
    ap.add_argument("--check-sha", action="store_true")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from omi_cpp_parquet_wide_record_spark.operators.decode import (
        decode_store,
    )
    from omi_cpp_parquet_wide_record_spark.session import get_spark

    spark = get_spark("owr-export", cores=args.cores)
    filters = [_parse_filter(f) for f in args.filter] if args.filter else None
    df = decode_store(spark, args.store, columns=args.columns,
                      check_sha=args.check_sha, snapshot=args.snapshot,
                      filters=filters, planning=args.planning,
                      since_snapshot=args.since_snapshot)
    writer = df.write.mode("overwrite")
    if args.format == "csv":
        writer.option("header", "true").csv(args.output)
        # multiLine: web text contains newlines; the writer quotes them,
        # and a read-back without multiLine would split records at every
        # physical newline and report a wrong count
        n = (spark.read.option("header", "true")
             .option("multiLine", "true").option("escape", '"')
             .csv(args.output).count())
    else:
        writer.parquet(args.output)
        n = spark.read.parquet(args.output).count()
    print(json.dumps({"rows_exported": n, "output": args.output,
                      "format": args.format}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
