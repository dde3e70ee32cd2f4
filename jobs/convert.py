#!/usr/bin/env python
"""Converter job CLI — the direct workflow replacement for the reference
executables (`nasdaq_equities_totalview_itch_v5_0 pcap_file [parquet_file]`,
ref NQ:3826-3849): binary capture in, wide-record chunk store out, read-back
verification, optional CSV sample (the reference's O14 dump).

    spark-submit --py-files dist/owr_spark.zip jobs/convert.py \
        --pcap /data/captures/ --which nasdaq --output /data/store
    # pre-framed packets parquet also accepted:
    python jobs/convert.py --packets capture.parquet --output /tmp/s
    # or fully self-contained on the synthetic capture:
    python jobs/convert.py --synthetic-rows 20000 --which jnx --output /tmp/s
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pcap", help="pcap file or directory of capture files "
                                   "(the reference's own input format)")
    ap.add_argument("--packets", help="parquet of (pcap_sec, pcap_usec, payload)")
    ap.add_argument("--synthetic-rows", type=int,
                    help="use the deterministic capture fixture instead")
    ap.add_argument("--which", choices=["nasdaq", "jnx"], default="nasdaq")
    ap.add_argument("--output", required=True)
    ap.add_argument("--num-pids", type=int, default=None)
    ap.add_argument("--csv-sample", type=int, default=0,
                    help="print N wide rows as CSV (reference read-back dump)")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from omi_cpp_parquet_wide_record_spark.operators.decode import decode_store
    from omi_cpp_parquet_wide_record_spark.operators.encode import (
        encode_dataframe,
    )
    from omi_cpp_parquet_wide_record_spark.operators.etl import csv_sink_format
    from omi_cpp_parquet_wide_record_spark.operators.verify import (
        verify_roundtrip,
    )
    from omi_cpp_parquet_wide_record_spark.operators.wide_record import (
        parse_packets,
    )
    from omi_cpp_parquet_wide_record_spark.session import get_spark

    spark = get_spark("owr-convert", cores=args.cores)
    if args.pcap:
        from omi_cpp_parquet_wide_record_spark.sources.pcap import read_pcap
        pkts = read_pcap(spark, args.pcap)
    elif args.synthetic_rows:
        from omi_cpp_parquet_wide_record_spark import fixtures as FX
        pkts = spark.createDataFrame(
            FX.packets_table(args.synthetic_rows, args.which).to_pandas())
    elif args.packets:
        pkts = spark.read.parquet(args.packets)
    else:
        ap.error("need --pcap, --packets, or --synthetic-rows")

    # row_key must be unique ACROSS capture files too (pcap_index restarts
    # at 1 per file), so fold in the message's full identity
    wide = parse_packets(pkts, args.which).withColumn(
        "row_key", F.xxhash64("pcap_index", "message_index",
                              "pcap_timestamp", "message_sequence",
                              "session"))
    res = encode_dataframe(wide, args.output,
                           partition_by=["message_type"],
                           salt_key="row_key", num_pids=args.num_pids)
    # the reference unconditionally reads back what it wrote (NQ:3846-3848);
    # we additionally demand bit-identity, not just a successful scan
    decoded = decode_store(spark, args.output)
    v = verify_roundtrip(wide, decoded, key="row_key")
    print(json.dumps({
        "which": args.which, "messages": res.rows,
        "ratio": round(res.ratio, 3), "seconds": round(res.seconds, 2),
        "verify_ok": v.ok, "mismatches": {k: n for k, n in
                                          v.mismatches.items() if n},
    }))
    if args.csv_sample:
        cols = [c for c in decoded.columns if c != "row_key"]
        for r in csv_sink_format(decoded.limit(args.csv_sample), cols).collect():
            print(r.csv_row)
    return 0 if v.ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
