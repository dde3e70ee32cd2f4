#!/usr/bin/env python
"""Verify job CLI — decode a chunk store and prove bit-identity against the
original input (the engine's upgrade of the reference read-back, NQ:3846-3848).

    spark-submit --py-files dist/owr_spark.zip jobs/verify.py \
        --store /path/store --input /path/pages.parquet --key url
    # or against the synthetic corpus:
    ... --store /path/store --synthetic-rows N --key url
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True)
    ap.add_argument("--input")
    ap.add_argument("--synthetic-rows", type=int)
    ap.add_argument("--key", required=True)
    ap.add_argument("--check-sha", action="store_true",
                    help="also verify chunk payload sha256s while decoding")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from omi_cpp_parquet_wide_record_spark.operators.decode import decode_store
    from omi_cpp_parquet_wide_record_spark.operators.verify import (
        verify_roundtrip,
    )
    from omi_cpp_parquet_wide_record_spark.plans.snapshot import ChunkStore
    from omi_cpp_parquet_wide_record_spark.session import get_spark

    spark = get_spark("owr-verify", cores=args.cores)
    if args.synthetic_rows:
        from omi_cpp_parquet_wide_record_spark import fixtures as FX
        original = FX.web_pages_df(spark, args.synthetic_rows)
    elif args.input:
        original = spark.read.parquet(args.input)
    else:
        ap.error("need --input or --synthetic-rows")

    decoded = decode_store(spark, args.store, check_sha=args.check_sha)
    v = verify_roundtrip(original, decoded, key=args.key)
    print(json.dumps({
        "ok": v.ok, "rows_expected": v.rows_expected,
        "rows_decoded": v.rows_decoded, "rows_joined": v.rows_joined,
        "mismatches": v.mismatches,
        "store_metrics": ChunkStore(args.store).metrics(),
    }, default=str))
    return 0 if v.ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
