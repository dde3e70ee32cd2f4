"""Capture .explain('formatted') for declared queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag_suffix> [query ...]
Writes plans/r06/<query>_<tag_suffix>.txt for each query (default: the
bench set). Plans only — nothing is executed except eager plan-time
actions a query itself performs (store builds reuse their caches).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

BENCH_QUERIES = [
    "tpch_q1_pricing_summary", "topk_per_group", "broadcast_join_enrich",
    "sessionize", "o3_o6_index_sequence", "o7_type_dispatch",
    "dedup_exact_groups", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "text_profile", "ann_cosine_topk",
    "ann_lsh_candidates", "streaming_tumbling_counts",
    "codec_dict_fsst_roundtrip", "codec_multi_roundtrip_events",
    "pcap_parse", "corpus_curation", "ann_ivf_topk",
    "ann_ivf_topk_indexed",
]


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = "/root/repo/plans/r06"
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entrymod
    from omi_cpp_parquet_wide_record_spark.session import get_spark
    spark = get_spark("plan-capture", cores=int(
        os.environ.get("SPARK_GRAFT_CPUS", 32)))
    qs = entrymod.queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
        except Exception as e:  # capture the failure instead of dying
            plan = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"captured {name} ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
