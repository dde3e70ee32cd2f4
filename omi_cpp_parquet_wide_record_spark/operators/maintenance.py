"""Table maintenance: row-level deletes (merge-on-read) and compaction.

The Iceberg maintenance surface for the chunk store: `delete_rows` commits
an equality-delete file (data chunks untouched; readers anti-join the keys),
and `compact_store` materializes deletes + rewrites the store into
right-sized chunks under a fresh snapshot lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from omi_cpp_parquet_wide_record_spark.plans.snapshot import ChunkStore


def delete_rows(store_dir: str, keys: DataFrame, key_col: str,
                run_id: str | None = None) -> dict:
    """Merge-on-read delete: commit the key values as a delete file.

    `keys` is a (small) DataFrame holding the key column; only metadata
    plus the key list touch the driver. O(1) in data size — no chunk is
    rewritten; decode anti-joins the keys until compaction materializes
    them.
    """
    import uuid
    store = ChunkStore(store_dir)
    schema_names = store.arrow_schema().names
    if key_col not in schema_names:
        # a typo'd key would commit a delete the readers silently ignore
        # (decode filters delete files to known columns) — the caller
        # would believe rows were deleted while every one stays visible
        raise ValueError(
            f"delete key {key_col!r} is not a column of the store "
            f"(schema: {schema_names})")
    tbl = keys.select(key_col).distinct().toArrow()
    return store.commit_deletes(tbl, key_col, run_id or uuid.uuid4().hex)


def compact_store(spark: SparkSession, store_dir: str, out_dir: str,
                  salt_key: str | None = None,
                  num_pids: int | None = None,
                  sort_by: list[str] | None = None,
                  zorder_by: list[str] | None = None,
                  chunk_rows: int = 65536) -> dict:
    """Materialize deletes and rewrite the table into right-sized chunks
    (Iceberg's rewrite_data_files): decode the live snapshot (deletes
    applied) and encode it into a fresh store. The old store stays intact
    for time travel until the caller swaps/GCs it.

    ``sort_by`` rewrites with a write sort order (Iceberg's sort-strategy
    rewrite): an existing store — e.g. one written by streaming commits
    in arrival order — adopts tight per-chunk zone maps on the given
    columns during the compaction it was already paying for;
    ``zorder_by`` does the same with the Morton multi-column layout
    (Delta/Iceberg OPTIMIZE ZORDER BY) so zone maps prune on any of the
    named columns."""
    from omi_cpp_parquet_wide_record_spark.operators.decode import decode_store
    from omi_cpp_parquet_wide_record_spark.operators.encode import (
        encode_dataframe,
    )
    if ChunkStore(out_dir).current_snapshot() is not None:
        # commit() appends to a parent lineage: compacting INTO an
        # existing store would duplicate every row (and inherit the old
        # delete files) — the contract is a fresh lineage
        raise ValueError(
            f"compact target {out_dir} already holds a committed store; "
            "compact into a fresh directory and swap afterwards")
    live = decode_store(spark, store_dir)
    res = encode_dataframe(live, out_dir, salt_key=salt_key,
                           num_pids=num_pids, resume=False,
                           sort_by=sort_by, zorder_by=zorder_by,
                           chunk_rows=chunk_rows)
    return {"rows": res.rows, "bytes_out": res.bytes_out,
            "chunks": ChunkStore(out_dir).metrics()["chunks"]}
