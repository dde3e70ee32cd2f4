#!/usr/bin/env python
"""Auxiliary benchmarks (guide §1.4): isolate pieces of the frozen bench
without touching bench.py. Prints one JSON line per measurement.

Usage:
    python bench_extra.py encode        # encode_web + decode_web isolation
    python bench_extra.py transfer     # shuffle/transfer-only floor
    python bench_extra.py query NAME   # noop-sink timing for one query
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _spark(cpus):
    from omi_cpp_parquet_wide_record_spark.session import get_spark
    return get_spark("owr-bench-extra", cores=cpus)


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "encode"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    rows = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", 100000))
    from omi_cpp_parquet_wide_record_spark import fixtures as FX
    from omi_cpp_parquet_wide_record_spark.operators.decode import decode_store
    from omi_cpp_parquet_wide_record_spark.operators.encode import (
        encode_dataframe,
    )
    spark = _spark(cpus)

    if mode == "encode":
        # mirror bench.py's encode_web/decode_web exactly, incl. warmup
        warm_dir = "/tmp/owr_extra_warm"
        shutil.rmtree(warm_dir, ignore_errors=True)
        encode_dataframe(FX.web_pages_df(spark, 4000, partitions=cpus),
                         warm_dir, partition_by=["lang"], salt_key="url",
                         num_pids=cpus, salt=2)
        decode_store(spark, warm_dir).count()
        shutil.rmtree(warm_dir, ignore_errors=True)
        corpus = FX.web_pages_df(spark, rows, partitions=cpus * 2).persist()
        n = corpus.count()
        store_dir = "/tmp/owr_extra_store"
        num_pids = max(cpus, min(cpus * 8, rows * 5200 // (4 << 20)))
        enc = dec = float("inf")
        for _ in range(3):
            shutil.rmtree(store_dir, ignore_errors=True)
            t0 = time.time()
            res = encode_dataframe(corpus, store_dir, partition_by=["lang"],
                                   salt_key="url", num_pids=num_pids,
                                   salt=128)
            enc = min(enc, time.time() - t0)
        for _ in range(3):
            t0 = time.time()
            assert decode_store(spark, store_dir).count() == n
            dec = min(dec, time.time() - t0)
        print(json.dumps({
            "mode": "encode", "encode_web": round(enc, 3),
            "decode_web": round(dec, 3), "rows": n,
            "bytes_in": res.bytes_in, "bytes_out": res.bytes_out,
            "ratio": round(res.ratio, 3),
            "enc_mbps": round(res.bytes_in / enc / 1e6, 1),
            "dec_mbps": round(res.bytes_in / dec / 1e6, 1)}))
        shutil.rmtree(store_dir, ignore_errors=True)
        corpus.unpersist()
        return 0

    if mode == "transfer":
        import pyarrow as pa
        from pyspark.sql import functions as F
        from omi_cpp_parquet_wide_record_spark.operators.encode import (
            PID_COL, _exact_partition_key, pid_expr,
        )
        corpus = FX.web_pages_df(spark, rows, partitions=cpus * 2).persist()
        corpus.count()
        num_pids = max(cpus, min(cpus * 8, rows * 5200 // (4 << 20)))

        def consume(df):
            def task(batches):
                total = 0
                for b in batches:
                    total += b.num_rows
                yield pa.RecordBatch.from_arrays(
                    [pa.array([total], type=pa.int64())], names=["n"])
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                df.mapInArrow(task, "n long").agg(F.sum("n")).collect()
                best = min(best, time.time() - t0)
            return round(best, 3)

        plain = consume(corpus)
        work = corpus.withColumn(
            PID_COL, pid_expr(["lang"], "url", num_pids, 128))
        num_tasks = min(num_pids, max(cpus * 2, -(-num_pids // 2)))
        shuffled = consume(
            work.repartition(num_tasks, _exact_partition_key(num_tasks)))
        print(json.dumps({"mode": "transfer", "transfer_only": plain,
                          "shuffle_transfer": shuffled}))
        return 0

    if mode == "query":
        import __spark_entry__ as entrymod
        name = sys.argv[2]
        qs = entrymod.queries()
        best = float("inf")
        samples = []
        for _ in range(int(sys.argv[3]) if len(sys.argv) > 3 else 3):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            best = min(best, samples[-1])
        print(json.dumps({"mode": "query", "query": name,
                          "best": round(best, 3), "samples": samples}))
        return 0

    raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    raise SystemExit(main())
