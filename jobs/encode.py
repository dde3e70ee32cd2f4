#!/usr/bin/env python
"""Encode job CLI — the engine's `main` (mirrors the reference driver shape:
argv in, write, optional read-back verify; ref NQ:3826-3849).

    spark-submit --py-files dist/owr_spark.zip jobs/encode.py \
        --input /path/pages.parquet --output /path/store \
        --partition-by lang --salt-key url [--num-pids 256] [--salt 16] \
        [--verify-key url] [--no-resume] [--upsert-key url] [--synthetic-rows N]

With --synthetic-rows the input is the deterministic web corpus instead of
a parquet path (no external data needed anywhere).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="input parquet path/dir (or table)")
    ap.add_argument("--synthetic-rows", type=int,
                    help="generate the deterministic web corpus instead")
    ap.add_argument("--output", required=True, help="chunk store root")
    ap.add_argument("--partition-by", nargs="*", default=None)
    ap.add_argument("--salt-key", default=None)
    ap.add_argument("--num-pids", type=int, default=None)
    ap.add_argument("--salt", type=int, default=16)
    ap.add_argument("--chunk-rows", type=int, default=65536)
    ap.add_argument("--colocate", choices=["shuffle", "local"],
                    default="shuffle",
                    help="'local' skips the repartition entirely (zero-"
                         "shuffle encode; use with coarse pids)")
    ap.add_argument("--sort-by", nargs="*", default=None,
                    help="write sort order: task-local sort on these "
                         "columns before chunking (tight zone maps)")
    ap.add_argument("--zorder-by", nargs="*", default=None,
                    help="multi-column Morton write layout: zone maps "
                         "prune on ANY of these 2-4 columns")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--upsert-key", default=None,
                    help="MERGE-style replace-by-key: commit the batch's "
                         "keys as a same-snapshot equality delete "
                         "(implies --no-resume)")
    ap.add_argument("--branch", default=None,
                    help="stage the commit on a branch (write-audit-"
                         "publish); publish with maintain.py publish")
    ap.add_argument("--verify-key", default=None,
                    help="decode + bit-identity verify on this key column")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from omi_cpp_parquet_wide_record_spark.operators.encode import (
        encode_dataframe,
    )
    from omi_cpp_parquet_wide_record_spark.session import get_spark

    spark = get_spark("owr-encode", cores=args.cores)
    if args.synthetic_rows:
        from omi_cpp_parquet_wide_record_spark import fixtures as FX
        df = FX.web_pages_df(spark, args.synthetic_rows)
        if args.salt_key is None and not args.partition_by:
            args.partition_by, args.salt_key = ["lang"], "url"
    elif args.input:
        df = spark.read.parquet(args.input)
    else:
        ap.error("need --input or --synthetic-rows")

    res = encode_dataframe(
        df, args.output, partition_by=args.partition_by,
        salt_key=args.salt_key, num_pids=args.num_pids, salt=args.salt,
        chunk_rows=args.chunk_rows,
        resume=(not args.no_resume) and args.upsert_key is None,
        colocate=args.colocate, sort_by=args.sort_by,
        zorder_by=args.zorder_by, upsert_key=args.upsert_key,
        branch=args.branch)
    report = {
        "rows": res.rows, "bytes_in": res.bytes_in,
        "bytes_out": res.bytes_out, "ratio": round(res.ratio, 3),
        "seconds": round(res.seconds, 2),
        "gbps": round(res.bytes_in / max(res.seconds, 1e-9) / 1e9, 4),
        "pids_encoded": res.pids_encoded, "pids_skipped": res.pids_skipped,
        "snapshot": res.snapshot["snapshot_id"],
    }

    if args.verify_key:
        from omi_cpp_parquet_wide_record_spark.operators.decode import (
            decode_store,
        )
        from omi_cpp_parquet_wide_record_spark.operators.verify import (
            verify_roundtrip,
        )
        v = verify_roundtrip(df, decode_store(spark, args.output),
                             key=args.verify_key)
        report["verify_ok"] = v.ok
        report["verify_mismatches"] = v.mismatches
        if not v.ok:
            print(json.dumps(report))
            return 1
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
