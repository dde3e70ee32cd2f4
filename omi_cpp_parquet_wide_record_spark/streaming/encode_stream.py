"""Structured Streaming surface of the engine.

The reference's pcap loop (ref NQ:3792-3808) is a batch file iterator — it
has no streaming constructs (SURVEY.md §2.2). The live-capture analogue in
Spark is Structured Streaming: a file/kafka source feeding the same encode
kernels through foreachBatch (exactly-once via the chunk-store commit
protocol: each micro-batch is a run; partition ids already dedupe replays),
plus watermarked windowed aggregates for feed monitoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def tumbling_counts(events: DataFrame, ts_col: str = "ts",
                    key_col: str = "event_type",
                    window: str = "5 minutes",
                    watermark: str = "10 minutes",
                    agg_col: str = "value") -> DataFrame:
    """Watermarked tumbling-window counts — the monitoring aggregate."""
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
            # exact decimal accumulation (the module-wide convention): a
            # raw double sum is order-dependent and a post-hoc round()
            # double-rounds against any decimal consumer — Spark HALF_UP
            # vs DuckDB rounding diverges exactly on the half boundaries
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col(agg_col).cast("decimal(18,4)"))
                  .cast("double").alias("total_value"))
            .select(F.col("w.start").alias("w_start"), key_col, "n",
                    "total_value"))


def session_windows(events: DataFrame, ts_col: str = "ts",
                    key_col: str = "user_id", gap: str = "30 minutes",
                    watermark: str = "1 hour") -> DataFrame:
    """Spark-native session windows (dynamic-gap state store): one row per
    (user, session) with start/end micros and event count. The watermark
    evicts closed sessions from state — the late-data story the reference
    has no analogue for."""
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(F.session_window(ts_col, gap).alias("w"),
                     F.col(key_col))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(key_col,
                    F.unix_micros(F.col("w.start")).alias("sess_start_us"),
                    F.unix_micros(F.col("w.end")).alias("sess_end_us"),
                    "n_events"))


def run_session_stream_once(spark: SparkSession, src_path: str, schema,
                            query_name: str = "owr_sessions") -> DataFrame:
    """Drive the session-window aggregate over a parquet-backed stream to
    completion (memory sink, complete mode); returns the final sessions."""
    import os
    import tempfile
    if os.path.isfile(src_path):
        d = tempfile.mkdtemp(prefix="owr_sess_src_")
        os.symlink(src_path, os.path.join(d, os.path.basename(src_path)))
        src_path = d
    events = (spark.readStream.schema(schema).format("parquet")
              .option("path", src_path).load())
    out = session_windows(events)
    q = (out.writeStream.outputMode("complete").format("memory")
         .queryName(query_name).trigger(availableNow=True).start())
    q.processAllAvailable()
    q.stop()
    return spark.table(query_name)


def run_stream_once(spark: SparkSession, src_path: str, schema,
                    query_name: str = "owr_stream") -> DataFrame:
    """Drive a parquet-source stream to completion synchronously (memory
    sink) and return the result as a batch DataFrame. Local smoke harness;
    a real deployment points the same plan at kafka + a durable sink."""
    import os
    import tempfile
    if os.path.isfile(src_path):
        # parquet file source needs a directory; link the file into one
        d = tempfile.mkdtemp(prefix="owr_stream_src_")
        os.symlink(src_path, os.path.join(d, os.path.basename(src_path)))
        src_path = d
    events = (spark.readStream.schema(schema).format("parquet")
              .option("path", src_path).load())
    agg = tumbling_counts(events)
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName(query_name).trigger(availableNow=True).start())
    q.processAllAvailable()
    q.stop()
    return spark.table(query_name)


def stream_encode(spark: SparkSession, src_path: str, schema, out_dir: str,
                  partition_by: list[str] | None = None,
                  salt_key: str | None = None, num_pids: int = 32,
                  query_name: str = "owr_stream_encode",
                  checkpoint_dir: str | None = None,
                  sort_by: list[str] | None = None,
                  upsert_key: str | None = None,
                  branch: str | None = None):
    """Streaming encode: every micro-batch flows through encode_dataframe
    via foreachBatch; the snapshot commit per batch gives exactly-once
    output (replayed batches hit the resume anti-filter).

    ``upsert_key`` turns the stream into a CDC apply (streaming MERGE):
    each micro-batch replaces prior rows carrying its keys via the
    single-commit upsert — the equality delete and the batch's data land
    in ONE snapshot, so readers always see exactly one row per key no
    matter where the stream is interrupted. Replayed epochs are still
    skipped whole by the run_id guard (the original commit was atomic,
    so a replay has nothing to repair).

    ``branch`` stages every micro-batch on a branch (streaming
    write-audit-publish): main readers see nothing until
    ``ChunkStore.fast_forward(branch)`` publishes the whole staged
    stream atomically. The replay guard reads the BRANCH lineage."""
    import os
    import uuid

    from omi_cpp_parquet_wide_record_spark.operators.encode import (
        encode_dataframe,
    )
    from omi_cpp_parquet_wide_record_spark.plans.snapshot import ChunkStore
    src = (spark.readStream.schema(schema).format("parquet")
           .option("path", src_path).load())

    # epoch ids only advance across restarts when the source offsets are
    # checkpointed — default the checkpoint next to the store so a restarted
    # job sees only new files (new epochs), and a true replay of an old
    # epoch hits the run_id guard below
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    _sid: dict = {}

    def _stream_id() -> str:
        """Stream identity persisted IN the checkpoint dir: epoch ids are
        only unique within one checkpoint lineage, so a bare epoch-N
        run_id silently DROPPED every batch of a second stream (or a
        recreated checkpoint) whose epoch numbers collided with an
        already-committed lineage. Restarts from the same checkpoint keep
        the id (replays dedupe); wiping the checkpoint mints a new id —
        re-encoding as duplicates, never as loss (Iceberg's queryId
        semantics)."""
        if not _sid:
            os.makedirs(checkpoint_dir, exist_ok=True)
            p = os.path.join(checkpoint_dir, "owr_stream_id")
            if not os.path.exists(p):
                tmp = p + f".tmp.{uuid.uuid4().hex[:8]}"
                with open(tmp, "w") as f:
                    f.write(uuid.uuid4().hex[:16])
                os.replace(tmp, p)
            with open(p) as f:
                _sid["v"] = f.read().strip()
        return _sid["v"]

    def sink(batch_df: DataFrame, epoch_id: int):
        if batch_df.isEmpty():
            return
        # exactly-once = epoch-level idempotence: a replayed micro-batch is
        # skipped because its run_id is already in the committed lineage.
        # The pid-level resume anti-filter must stay OFF here (resume=False):
        # pids are content-derived hashes mod N, so a *new* batch's rows can
        # collide with pids committed by earlier epochs — filtering on them
        # would silently drop data (ADVICE r1 #2).
        run_id = f"{_stream_id()}-epoch-{epoch_id}"
        store = ChunkStore(out_dir)
        guard_snap = store.branch_head(branch) if branch is not None \
            else None
        if run_id in store.committed_run_ids(guard_snap):
            return
        encode_dataframe(batch_df, out_dir, partition_by=partition_by,
                         salt_key=salt_key, num_pids=num_pids,
                         run_id=run_id, resume=False, sort_by=sort_by,
                         upsert_key=upsert_key, branch=branch)
    return (src.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).queryName(query_name).start())
