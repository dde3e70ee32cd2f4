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
            # NaT would alias to INT64_MIN micros and silently poison the
            # session math (phantom sessions, corrupted last_us) — there
            # is no watermark here to drop null timestamps upstream
            col = pdf["ts"].dropna()
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


CLOSED_SCHEMA = "user_id long, sess_start_us long, sess_end_us long, " \
                "n_events long"
CLOSED_STATE = "start_us long, last_us long, n_events long"


def _closing_fn(gap_us: int):
    """Emit a session row only when the session CLOSES — either a new event
    arrives past the gap, or the event-time timeout fires after the
    watermark passes last_event + gap (state is then evicted). This is the
    pattern that bounds state at 10^12 events: closed sessions leave the
    state store instead of accumulating.

    Known limit (shared with every gap-merge sessionizer that doesn't
    buffer to the watermark): an event older than the carried session's
    last timestamp but within the watermark merges into that session
    rather than re-splitting history — use the batch sessionize or Spark's
    built-in session_window (which buffers) where exact out-of-order
    semantics matter."""
    def fn(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd
        out = []
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            out.append((key[0], start_us, last_us + gap_us, n))
            state.remove()
            yield pd.DataFrame(out, columns=["user_id", "sess_start_us",
                                             "sess_end_us", "n_events"])
            return
        ts = []
        for pdf in pdfs:
            v = pdf["ts"].astype("int64").to_numpy()
            if str(pdf["ts"].dtype).endswith("[ns]"):
                v = v // 1000
            ts.append(v)
        arr = np.sort(np.concatenate(ts)) if ts else np.array([], np.int64)
        if len(arr) == 0:
            yield pd.DataFrame([], columns=["user_id", "sess_start_us",
                                            "sess_end_us", "n_events"])
            return
        # vectorized gaps-and-islands over the batch; the carried state
        # either extends the first island or closes first
        carry_start, carry_last, carry_n = (state.get if state.exists
                                            else (None, None, 0))
        if carry_last is not None and int(arr[0]) - carry_last > gap_us:
            out.append((key[0], carry_start, carry_last + gap_us, carry_n))
            carry_start, carry_n = None, 0
        brk = np.flatnonzero(arr[1:] - arr[:-1] > gap_us)
        seg_lo = np.concatenate(([0], brk + 1))
        seg_hi = np.concatenate((brk, [len(arr) - 1]))
        counts = (seg_hi - seg_lo + 1).astype(np.int64)
        starts = arr[seg_lo].copy()
        if carry_start is not None:            # first island continues it
            starts[0] = carry_start
            counts[0] += carry_n
        # every island but the last closes inside this batch
        for i in range(len(seg_lo) - 1):       # loop over ISLANDS, not rows
            out.append((key[0], int(starts[i]),
                        int(arr[seg_hi[i]]) + gap_us, int(counts[i])))
        start_us = int(starts[-1])
        last_us = int(arr[-1])
        n = int(counts[-1])
        state.update((start_us, last_us, n))
        # evict once the watermark passes the session end
        state.setTimeoutTimestamp(last_us // 1000 + gap_us // 1000)
        yield pd.DataFrame(out, columns=["user_id", "sess_start_us",
                                         "sess_end_us", "n_events"])

    return fn


def closed_sessions(events: DataFrame, gap_minutes: int = 30,
                    watermark: str = "1 hour") -> DataFrame:
    """Streaming (user_id, ts, ...) -> one row per CLOSED session, with
    event-time timeouts evicting idle sessions from the state store."""
    gap_us = gap_minutes * 60 * 1_000_000
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.col("user_id"))
            .applyInPandasWithState(
                _closing_fn(gap_us), CLOSED_SCHEMA, CLOSED_STATE,
                "append", GroupStateTimeout.EventTimeTimeout))


def run_closed_sessions_once(spark, src_dir: str, schema,
                             query_name: str = "owr_closed") -> DataFrame:
    """Drive closed_sessions over a directory of parquet files, one file
    per micro-batch (maxFilesPerTrigger=1) so the watermark advances
    between batches and event-time timeouts actually fire."""
    events = (spark.readStream.schema(schema).format("parquet")
              .option("path", src_dir).option("maxFilesPerTrigger", 1)
              .load())
    out = closed_sessions(events)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName(query_name).trigger(availableNow=True).start())
    q.processAllAvailable()
    q.stop()
    return spark.table(query_name)


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
