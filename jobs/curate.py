#!/usr/bin/env python
"""Corpus curation job CLI — the end-to-end training-data workflow:

    quality/language gate -> exact dedup -> MinHash near-dup removal ->
    columnar-encode the surviving corpus into a resumable chunk store

    spark-submit --py-files dist/owr_spark.zip jobs/curate.py \
        --input docs.parquet --output /data/curated_store \
        --min-quality 0.5 --langs en de --near-dup-threshold 0.6
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="parquet with (doc_id, text, ...) columns")
    ap.add_argument("--output", required=True, help="chunk store directory")
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--langs", nargs="+", default=["en", "de", "fr", "es"])
    ap.add_argument("--near-dup-threshold", type=float, default=0.6)
    ap.add_argument("--num-pids", type=int, default=None)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from omi_cpp_parquet_wide_record_spark.operators.dedup import curate_corpus
    from omi_cpp_parquet_wide_record_spark.operators.encode import (
        encode_dataframe,
    )
    from omi_cpp_parquet_wide_record_spark.session import get_spark

    spark = get_spark("owr-curate", cores=args.cores)
    t0 = time.time()
    docs = spark.read.parquet(args.input)
    n_in = docs.count()
    kept = curate_corpus(docs, min_quality=args.min_quality,
                         langs=tuple(args.langs),
                         near_dup_threshold=args.near_dup_threshold)
    curated = docs.join(kept.select("doc_id"), "doc_id")
    res = encode_dataframe(curated, args.output, salt_key="doc_id",
                           num_pids=args.num_pids)
    print(json.dumps({
        "docs_in": n_in, "docs_kept": res.rows,
        "kept_pct": round(100.0 * res.rows / max(n_in, 1), 1),
        "ratio": round(res.ratio, 3),
        "bytes_out": res.bytes_out,
        "seconds": round(time.time() - t0, 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
