"""Custom stateful streaming operator: per-key sessionization with
applyInPandasWithState (SURVEY.md §2.2 — the reference has no streaming
constructs; this is the engine-side state-store surface).

State per user: (last event micros, running event count, running session
count). Batch math is vectorized numpy over each group's rows; the state
store round-trips through Spark's GroupState.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, n_events long, n_sessions long"
STATE_SCHEMA = "last_us long, n_events long, n_sessions long"


def _session_fn(gap_us: int):
    def fn(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd
        if state.exists:
            last_us, n_events, n_sessions = state.get
        else:
            last_us, n_events, n_sessions = None, 0, 0
        ts = []
        for pdf in pdfs:
            col = pdf["ts"]
            v = col.astype("int64").to_numpy()
            # pandas datetime64[ns]/[us] -> micros
            if str(col.dtype).endswith("[ns]"):
                v = v // 1000
            ts.append(v)
        arr = np.sort(np.concatenate(ts)) if ts else np.array([], np.int64)
        if len(arr):
            if last_us is None:
                n_sessions += 1
            elif arr[0] - last_us > gap_us:
                n_sessions += 1
            gaps = arr[1:] - arr[:-1]
            n_sessions += int((gaps > gap_us).sum())
            n_events += len(arr)
            last_us = int(arr[-1])
        state.update((last_us, n_events, n_sessions))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n_events],
                            "n_sessions": [n_sessions]})

    return fn


def stateful_session_counts(events: DataFrame, gap_minutes: int = 30
                            ) -> DataFrame:
    """Streaming DataFrame (user_id, ts, ...) -> running per-user session
    stats, maintained in the state store across micro-batches."""
    gap_us = gap_minutes * 60 * 1_000_000
    return (events
            .groupBy(F.col("user_id"))
            .applyInPandasWithState(
                _session_fn(gap_us), OUT_SCHEMA, STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))


def run_stateful_once(spark, src_path: str, schema,
                      query_name: str = "owr_stateful") -> DataFrame:
    """Drive the stateful operator over a parquet-backed stream to
    completion (memory sink, update mode); returns the final per-user rows."""
    import os
    import tempfile
    if os.path.isfile(src_path):
        d = tempfile.mkdtemp(prefix="owr_stateful_src_")
        os.symlink(src_path, os.path.join(d, os.path.basename(src_path)))
        src_path = d
    events = (spark.readStream.schema(schema).format("parquet")
              .option("path", src_path).load())
    out = stateful_session_counts(events)
    q = (out.writeStream.outputMode("update").format("memory")
         .queryName(query_name).trigger(availableNow=True).start())
    q.processAllAvailable()
    q.stop()
    # memory sink in update mode appends every update; keep the last per key
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (spark.table(query_name)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))
