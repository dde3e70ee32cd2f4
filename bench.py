#!/usr/bin/env python
"""Engine benchmark. Prints ONE JSON line:

    {"metric": "e2e_bench_seconds", "value": <sum of per-query best sec>,
     "wall_seconds": <wall incl. min-of-N repeats + setup>, "unit": "sec",
     "queries": {<name>: sec, ...},            # min-of-N (warm allowed)
     "queries_cold": {<name>: sec, ...},       # first call, caches dropped
     "cold_value": <sum of cold sec>, "sf": <sf>,
     "encode": {"rows", "bytes_in", "bytes_out", "ratio", "gbps"},
     "golden": {"bytes", "beats_reference_size"}}

Headline work:
  - encode_web / decode_web: the engine pipeline over the deterministic
    synthetic web corpus (FIXTURES.md F1; BASELINE.json input_hint shape) —
    encode GB/s and compression ratio vs the reference-config golden parquet
  - a representative slice of the oracle-checked query surface at
    $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)

Environment: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_ROWS
(web-corpus rows, default 100000 ~= 500 MB).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    rows = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", 100000))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) \
        if "sf" in sf_dir else None

    from omi_cpp_parquet_wide_record_spark import fixtures as FX
    from omi_cpp_parquet_wide_record_spark.operators.decode import decode_store
    from omi_cpp_parquet_wide_record_spark.operators.encode import (
        encode_dataframe,
    )
    from omi_cpp_parquet_wide_record_spark.session import get_spark

    spark = get_spark("owr-bench", cores=cpus)
    timings: dict[str, float] = {}
    t_all = time.time()

    # box-performance canary (VERDICT r4 #8): a fixed pure-numpy kernel —
    # 256 MB memcpy + random gather — whose MB/s depends only on the box's
    # memory subsystem and current load, never on engine code. Cross-round
    # wall-clock comparisons divide by this instead of being argued from
    # same-code A/Bs (r4's regressions were box state; now it's measured).
    import numpy as np
    canary_src = np.arange(32 << 20, dtype=np.int64)        # 256 MB
    canary_dst = np.empty_like(canary_src)
    canary_idx = (canary_src * 2654435761 % len(canary_src)).astype(np.int64)
    canary_best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.copyto(canary_dst, canary_src)                   # memcpy lane
        gathered = canary_src[canary_idx]                   # gather lane
        canary_best = min(canary_best, time.time() - t0)
    canary_mbps = round((canary_src.nbytes * 2) / canary_best / 1e6, 1)
    del canary_src, canary_dst, canary_idx, gathered

    # warmup: spin up python workers + JIT the whole pipeline on a tiny
    # slice so the headline numbers measure steady state, not JVM cold start
    warm_dir = "/tmp/owr_bench_warmup"
    shutil.rmtree(warm_dir, ignore_errors=True)
    encode_dataframe(FX.web_pages_df(spark, 4000, partitions=cpus),
                     warm_dir, partition_by=["lang"], salt_key="url",
                     num_pids=cpus, salt=2)
    decode_store(spark, warm_dir).count()
    shutil.rmtree(warm_dir, ignore_errors=True)

    # ---------------- engine headline: encode + decode the web corpus
    corpus = FX.web_pages_df(spark, rows, partitions=cpus * 2)
    corpus = corpus.persist()
    n = corpus.count()  # materialize so encode timing excludes generation
    store_dir = f"/tmp/owr_bench_store_{rows}"
    shutil.rmtree(store_dir, ignore_errors=True)

    # work units sized for ~4 MB of input each (r5 sweep: 2 MB units paid
    # ~18% in per-call codec overheads — selector trials + per-chunk FSST
    # training are amortized over 2x the bytes at ~1% ratio cost; 16 MB
    # units re-introduced straggler tails). The salt must stay fine
    # enough that a Zipf-hot language splits into units of that size too —
    # coarse salting (r1 used salt=8) left 30+ MB straggler pids that
    # serialized the tail of the job.
    num_pids = max(cpus, min(cpus * 8, rows * 5200 // (4 << 20)))
    timings["encode_web"] = float("inf")
    for _ in range(3):
        shutil.rmtree(store_dir, ignore_errors=True)
        t0 = time.time()
        res = encode_dataframe(corpus, store_dir, partition_by=["lang"],
                               salt_key="url", num_pids=num_pids, salt=128)
        timings["encode_web"] = round(
            min(timings["encode_web"], time.time() - t0), 3)

    timings["decode_web"] = float("inf")
    for _ in range(3):
        t0 = time.time()
        decoded_rows = decode_store(spark, store_dir).count()
        timings["decode_web"] = round(
            min(timings["decode_web"], time.time() - t0), 3)
    assert decoded_rows == n == res.rows, (decoded_rows, n, res.rows)

    # informational (outside the headline sum): the zero-shuffle encode
    # mode — lang-only work units grouped inside each input partition, no
    # repartition at all (the at-scale path when input splits are already
    # sized; SCALE.md). Decode must agree with the shuffled store.
    local_dir = f"/tmp/owr_bench_store_local_{rows}"
    best_local, res_local = float("inf"), None
    for _ in range(2):
        shutil.rmtree(local_dir, ignore_errors=True)
        t0 = time.time()
        res_local = encode_dataframe(corpus, local_dir,
                                     partition_by=["lang"], num_pids=64,
                                     salt=1, colocate="local")
        best_local = min(best_local, time.time() - t0)
    assert decode_store(spark, local_dir).count() == n
    shutil.rmtree(local_dir, ignore_errors=True)

    encode_stats = {
        "local_seconds": round(best_local, 3),
        "local_gbps": round(res_local.bytes_in / best_local / 1e9, 4),
        "local_ratio": round(res_local.ratio, 3),
        "rows": res.rows,
        "bytes_in": res.bytes_in,
        "bytes_out": res.bytes_out,
        "ratio": round(res.ratio, 3),
        "gbps": round(res.bytes_in / timings["encode_web"] / 1e9, 4),
        "decode_gbps": round(res.bytes_in / timings["decode_web"] / 1e9, 4),
    }

    # golden size baseline: reference writer config on the same slice
    golden_path = f"/tmp/owr_bench_golden_{rows}.parquet"
    if not os.path.exists(golden_path):
        FX.write_golden_parquet(FX.web_pages_table(rows), golden_path)
    golden_bytes = os.path.getsize(golden_path)
    chunks_dir = os.path.join(store_dir, "chunks")
    chunk_bytes = sum(os.path.getsize(os.path.join(chunks_dir, f))
                      for f in os.listdir(chunks_dir))
    golden = {"bytes": golden_bytes, "chunk_bytes": chunk_bytes,
              "beats_reference_size": bool(chunk_bytes <= golden_bytes)}
    corpus.unpersist()

    # ---------------- oracle-checked query surface at the sf slice
    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    bench_queries = [
        "tpch_q1_pricing_summary", "topk_per_group", "broadcast_join_enrich",
        "sessionize", "o3_o6_index_sequence", "o7_type_dispatch",
        "dedup_exact_groups", "dedup_ngram_jaccard", "dedup_minhash_lsh",
        "dedup_simhash", "text_profile", "ann_cosine_topk",
        "ann_lsh_candidates", "streaming_tumbling_counts",
        "codec_dict_fsst_roundtrip", "codec_multi_roundtrip_events",
        "pcap_parse", "corpus_curation", "ann_ivf_topk",
        "ann_ivf_topk_indexed",
    ]
    # cold vs warm (VERDICT r3 #3): _rotate_cache reuses persisted plans
    # across identical calls, so a bare min-of-N would report warm-cache
    # readings for the repeated-call queries. Before each query's FIRST
    # run every live operator cache is dropped — that run is recorded as
    # `cold` (the number regressions are judged on); the min over all
    # runs (warm reuse allowed, as a steady-state driver loop would see)
    # stays in `queries` for schema compatibility.
    from omi_cpp_parquet_wide_record_spark.operators.dedup import (
        _LIVE_CACHES,
    )

    def _drop_live_caches():
        for key in list(_LIVE_CACHES):
            try:
                _LIVE_CACHES.pop(key).unpersist(True)
            except Exception:
                pass

    cold: dict[str, float] = {}
    for name in bench_queries:
        # min-of-3 (first run cold): the box swings 2-3x between runs,
        # and the driver records whatever single number this prints
        best = float("inf")
        try:
            for i in range(3):
                if i == 0:
                    _drop_live_caches()
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                took = time.time() - t0
                if i == 0:
                    cold[name] = round(took, 3)
                best = min(best, took)
            timings[name] = round(best, 3)
        except Exception as e:  # keep the bench alive; record the failure
            timings[name] = -1.0
            cold[name] = -1.0
            print(f"bench query {name} failed: {e}", file=sys.stderr)

    # headline value: sum of per-query best times (the steady-state e2e a
    # single pass would cost). Wall-clock is reported alongside but is NOT
    # the headline — the min-of-N repeats that tame this box's 2-3x noise
    # would otherwise double-count every query into the total.
    total = round(sum(v for v in timings.values() if v > 0), 3)
    failed = sorted(k for k, v in timings.items() if v < 0)
    out = {
        "metric": "e2e_bench_seconds",
        "value": total,
        "wall_seconds": round(time.time() - t_all, 3),
        # a failed query records -1 in queries and is EXCLUDED from the
        # sum — surface the names loudly so a crash never reads as a
        # speedup
        "failed_queries": failed,
        "unit": "sec",
        "queries": timings,
        # first-call seconds per query with all operator caches dropped —
        # the regression-judging numbers; encode/decode_web have no plan
        # cache so cold == their recorded first loop iteration
        "queries_cold": cold,
        "cold_value": round(
            sum(v for v in cold.values() if v > 0)
            + sum(timings.get(h, 0) for h in ("encode_web", "decode_web")
                  if timings.get(h, 0) > 0), 3),
        "sf": sf,
        "cpus": cpus,
        "canary_mbps": canary_mbps,
        "web_rows": rows,
        "encode": encode_stats,
        "golden": golden,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
