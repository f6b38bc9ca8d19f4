"""Custom stateful streaming operator #2 — cross-batch sessionization via
``applyInPandasWithState`` (Arrow-batched per-key state).

Batch twin: the q23 sessionize contract query (contract.py — lag window +
30-min-gap rule, DuckDB-oracle-checked).  The batch form needs the whole
history in one window partition; the streaming form carries exactly two
scalars of state per user — (last event ts, sessions so far) — so an
unbounded event stream gets session ids assigned incrementally with
executor-sharded state, the same way the batch window shards its
partitions.  Reference parity note: the reference has no streaming at all
(OsmRdfTransformer.java:368-372, isLongRunning() == false); this is
engine-extension surface.

Semantics (identical to the batch twin):
* events within one user are ordered by (ts, event_id);
* an event opens a NEW session iff it is the user's first event ever or
  its gap to the previous event exceeds ``gap_s``;
* emitted rows = input rows + ``session_idx`` (1-based per user),
  append-mode — each event is emitted exactly once, in the micro-batch
  that delivered it.

Cross-batch correctness is the whole point: a session spanning a
micro-batch boundary must NOT be split (state carries last_ts), and a gap
spanning the boundary must still open a new session.  Within one
micro-batch a key may arrive as several Arrow chunks — all chunks are
concatenated before sorting, so the order rule holds regardless of
``spark.sql.execution.arrow.maxRecordsPerBatch`` (same trap as
stateful.py's first-seen dedup).

Late-data mechanism (VERDICT r2 #6): events arriving in a later
micro-batch with timestamps BEFORE the user's last seen event are
assigned against the running state (arrival order) AND FLAGGED — every
output row carries ``late_arrival``; a true value marks the user's
assignments as provisional.  The repair path is the batch twin:
``sessionize_repair`` recomputes the q23 lag-window rule over the full
event history for exactly the flagged users and patches their rows,
leaving the (overwhelmingly larger) in-order population untouched.  This
is the warehouse-native answer — ground truth is a deterministic batch
job over the persisted table, not a bigger streaming buffer.  Bound
lateness upstream with a watermark when the source supports one.

State is two LongTypes per key: at 10^9 users that is ~16 GB sharded
across the cluster's state stores — the scale path.  ``state_timeout_s``
retires users idle past the retention window (ProcessingTimeTimeout →
state.remove(), VERDICT r2 #5): a retired user who reappears restarts at
session_idx 1 — the retention trade, repairable by the same batch twin.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import BooleanType, LongType, StructField, StructType


def sessionize_stream(stream_df: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts", order_col: str = "event_id",
                      gap_s: int = 1800,
                      state_timeout_s: int | None = None) -> DataFrame:
    """Append ``session_idx`` (1-based per user) and ``late_arrival`` to
    every event, carrying session continuity across micro-batches through
    keyed state.  ``late_arrival`` is true when the event's timestamp
    precedes the user's last previously-seen event (cross-batch
    out-of-order) — the signal sessionize_repair keys on."""
    out_schema = StructType(list(stream_df.schema.fields)
                            + [StructField("session_idx", LongType()),
                               StructField("late_arrival", BooleanType())])
    state_schema = StructType([StructField("last_ts_us", LongType()),
                               StructField("n_sessions", LongType())])
    in_cols = [f.name for f in stream_df.schema.fields]
    timeout_conf = (GroupStateTimeout.ProcessingTimeTimeout
                    if state_timeout_s else GroupStateTimeout.NoTimeout)

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        last_ts_us, n_sessions = (state.get if state.exists else (None, 0))
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        batch = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        batch = batch.sort_values([ts_col, order_col], kind="stable")
        ts_us = (batch[ts_col].astype("datetime64[us]").astype("int64")
                 .to_numpy())
        idx, late = [], []
        for t in ts_us:
            late.append(last_ts_us is not None and t < last_ts_us)
            if last_ts_us is None or (t - last_ts_us) > gap_s * 1_000_000:
                n_sessions += 1
            last_ts_us = int(t)
            idx.append(n_sessions)
        state.update((last_ts_us, n_sessions))
        if state_timeout_s:
            state.setTimeoutDuration(state_timeout_s * 1000)
        out = batch[in_cols].copy()
        out["session_idx"] = idx
        out["late_arrival"] = late
        yield out

    return (stream_df.groupBy(user_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", timeout_conf))


def sessionize_batch(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts", order_col: str = "event_id",
                     gap_s: int = 1800) -> DataFrame:
    """Batch twin (the q23 lag-window rule): per-event ``session_idx``
    over the full, ordered history — the ground truth the streaming form
    converges to when every event is in order."""
    from pyspark.sql.window import Window
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    prev = F.lag(ts_col).over(w)
    new_s = F.when(
        prev.isNull() |
        ((F.unix_timestamp(ts_col) - F.unix_timestamp(prev)) > gap_s),
        1).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(ts_col, order_col) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn(
        "session_idx", F.sum(new_s).over(run).cast("long"))


def sessionize_repair(all_events: DataFrame, stream_out: DataFrame,
                      user_col: str = "user_id", ts_col: str = "ts",
                      order_col: str = "event_id",
                      gap_s: int = 1800) -> DataFrame:
    """Patch the streaming output's provisional assignments: users with
    any ``late_arrival`` row are re-sessionized by the batch twin over
    ``all_events`` (the persisted full history); everyone else keeps
    their streaming rows untouched.  Output = corrected
    (events + session_idx), the exact batch-twin result for every user.

    The affected-user set is typically a vanishing fraction of the key
    space, so the repair job's window runs over a semi-joined sliver of
    the history — this is the checkpoint-resume shape (anti/semi-join on
    a key set) the rest of the engine already uses."""
    affected = (stream_out.filter(F.col("late_arrival"))
                .select(user_col).distinct())
    repaired = sessionize_batch(
        all_events.join(affected, user_col, "left_semi"),
        user_col, ts_col, order_col, gap_s)
    untouched = (stream_out.join(affected, user_col, "left_anti")
                 .drop("late_arrival"))
    return untouched.unionByName(repaired)


def run_sessionize_stream(spark, input_dir: str, schema, output_dir: str,
                          checkpoint_dir: str, user_col: str = "user_id",
                          ts_col: str = "ts", order_col: str = "event_id",
                          gap_s: int = 1800, timeout_s: int = 300,
                          state_timeout_s: int | None = None) -> None:
    """File-source driver: assign session ids to everything currently
    available, append to parquet, stop.  Re-running with the same
    checkpoint resumes user state — sessions continue across runs."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    out = sessionize_stream(stream, user_col, ts_col, order_col, gap_s,
                            state_timeout_s=state_timeout_s)
    query = (out.writeStream
             .outputMode("append")
             .format("parquet")
             .option("path", output_dir)
             .option("checkpointLocation", checkpoint_dir)
             .trigger(availableNow=True)
             .start())
    from p3_osm_transformer_spark.streaming.stateful import await_drained
    await_drained(query, timeout_s, state_timeout_s is not None)
