#!/usr/bin/env python
"""Store maintenance CLI: snapshot history, GC, row deletes, compaction.

    python jobs/maintain.py --store /data/store history
    python jobs/maintain.py --store /data/store gc --keep-last 2
    python jobs/maintain.py --store /data/store delete --key doc_id \
        --values 7 11 42
    python jobs/maintain.py --store /data/store compact --output /data/new
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
    ap.add_argument("--cores", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("history")
    g = sub.add_parser("gc")
    g.add_argument("--keep-last", type=int, default=1)
    g.add_argument("--older-than", type=float, default=3600,
                   help="only delete unreferenced files older than this "
                        "many seconds (guards against racing an in-flight "
                        "commit, like Iceberg's remove_orphan_files)")
    d = sub.add_parser("delete")
    d.add_argument("--key", required=True)
    d.add_argument("--values", nargs="+", required=True,
                   help="key values; typed per the store schema")
    rw = sub.add_parser("rewrite")
    rw.add_argument("--target-rows", type=int, default=65536)
    rw.add_argument("--min-avg-frac", type=float, default=0.5,
                    help="rewrite pids whose avg chunk is under this "
                         "fraction of --target-rows")
    rw.add_argument("--pids", nargs="*", type=int, default=None)
    rw.add_argument("--sort-by", nargs="*", default=None)
    tg = sub.add_parser("tag")
    tg.add_argument("--name", required=True)
    tg.add_argument("--snapshot", type=int, default=None,
                    help="snapshot to tag (default: live)")
    ut = sub.add_parser("untag")
    ut.add_argument("--name", required=True)
    rb = sub.add_parser("rollback")
    rb.add_argument("--snapshot", type=int, required=True)
    pb = sub.add_parser("publish")
    pb.add_argument("--branch", required=True,
                    help="fast-forward main to this branch head "
                         "(the P of write-audit-publish)")
    db = sub.add_parser("drop-branch")
    db.add_argument("--branch", required=True)
    ev = sub.add_parser("evolve")
    ev.add_argument("--drop", nargs="*", default=None)
    ev.add_argument("--rename", nargs="*", default=None,
                    metavar="OLD=NEW",
                    help="rename columns (metadata-only; old chunks "
                         "resolve through aliases at read time)")
    ins = sub.add_parser("inspect")
    ins.add_argument("--kind", required=True,
                     choices=["snapshots", "history", "refs", "files",
                              "partitions", "deletes"])
    ins.add_argument("--snapshot", type=int, default=None)
    ins.add_argument("--ref", default=None)
    ins.add_argument("--limit", type=int, default=20)
    c = sub.add_parser("compact")
    c.add_argument("--output", required=True)
    c.add_argument("--salt-key", default=None)
    c.add_argument("--sort-by", nargs="*", default=None,
                   help="rewrite with a write sort order (tight zone maps)")
    c.add_argument("--zorder-by", nargs="*", default=None,
                   help="rewrite with the Morton multi-column layout "
                        "(OPTIMIZE ZORDER BY)")
    args = ap.parse_args()

    from omi_cpp_parquet_wide_record_spark.plans.snapshot import ChunkStore
    store = ChunkStore(args.store)

    if args.cmd == "history":
        hist = [{"n": s["n"], "run_id": s["run_id"],
                 "created_ms": s.get("created_ms"),
                 "manifests": len(s.get("manifests", [])),
                 "deletes": len(s.get("delete_files", []))}
                for s in store.snapshots()]
        print(json.dumps({"snapshots": hist, "refs": store.refs(),
                          "metrics": store.metrics()}))
        return 0

    if args.cmd == "tag":
        print(json.dumps(store.create_tag(args.name,
                                          snapshot=args.snapshot)))
        return 0

    if args.cmd == "untag":
        print(json.dumps(store.remove_tag(args.name)))
        return 0

    if args.cmd == "rollback":
        snap = store.rollback_to(args.snapshot)
        print(json.dumps({"snapshot": snap["n"],
                          "rollback_of": snap["rollback_of"]}))
        return 0

    if args.cmd == "publish":
        print(json.dumps(store.fast_forward(args.branch)))
        return 0

    if args.cmd == "drop-branch":
        print(json.dumps(store.drop_branch(args.branch)))
        return 0

    if args.cmd == "gc":
        from omi_cpp_parquet_wide_record_spark.plans.gc import expire_snapshots
        print(json.dumps(expire_snapshots(store, keep_last=args.keep_last,
                                          older_than_s=args.older_than)))
        return 0

    if args.cmd == "evolve":
        # metadata-only commit: no Spark session needed
        from omi_cpp_parquet_wide_record_spark.operators.maintenance import (
            evolve_schema,
        )
        rename = {}
        for spec in (args.rename or []):
            if "=" not in spec:
                raise SystemExit(f"--rename takes OLD=NEW, got {spec!r}")
            old, new = spec.split("=", 1)
            rename[old] = new
        print(json.dumps(evolve_schema(args.store, drop=args.drop,
                                       rename=rename or None)))
        return 0

    from omi_cpp_parquet_wide_record_spark.session import get_spark
    spark = get_spark("owr-maintain", cores=args.cores)

    if args.cmd == "delete":
        from omi_cpp_parquet_wide_record_spark.operators.maintenance import (
            delete_rows,
        )
        # type the key values from the STORE schema — a hardcoded long
        # mis-typed string keys into a delete that reads as null/raises
        import pyarrow as pa
        from pyspark.sql import functions as F
        sch = store.arrow_schema()
        if args.key not in sch.names:
            raise SystemExit(f"--key {args.key} not in store schema "
                             f"{sch.names}")
        spark_t = {"string": "string", "large_string": "string"}.get(
            str(sch.field(args.key).type), None)
        keys = spark.createDataFrame([(v,) for v in args.values],
                                     f"{args.key} string")
        if spark_t != "string":
            from pyspark.sql.pandas.types import from_arrow_type
            keys = keys.select(F.col(args.key).cast(
                from_arrow_type(sch.field(args.key).type)))
        snap = delete_rows(args.store, keys, args.key)
        print(json.dumps({"snapshot": snap["n"],
                          "delete_files": len(snap["delete_files"])}))
        return 0

    if args.cmd == "inspect":
        from omi_cpp_parquet_wide_record_spark.operators.metadata import (
            metadata_table,
        )
        df = metadata_table(spark, args.store, args.kind,
                            snapshot=args.snapshot, ref=args.ref)
        rows = [r.asDict() for r in df.limit(args.limit).collect()]
        print(json.dumps({"kind": args.kind, "rows": rows,
                          "shown": len(rows)}, default=str))
        return 0

    if args.cmd == "rewrite":
        from omi_cpp_parquet_wide_record_spark.operators.maintenance import (
            rewrite_small_chunks,
        )
        print(json.dumps(rewrite_small_chunks(
            spark, args.store, target_rows=args.target_rows,
            min_avg_frac=args.min_avg_frac, pids=args.pids,
            sort_by=args.sort_by)))
        return 0

    if args.cmd == "compact":
        from omi_cpp_parquet_wide_record_spark.operators.maintenance import (
            compact_store,
        )
        print(json.dumps(compact_store(spark, args.store, args.output,
                                       salt_key=args.salt_key,
                                       sort_by=args.sort_by,
                                       zorder_by=args.zorder_by)))
        return 0
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
