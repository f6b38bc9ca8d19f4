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

Late-data note: events arriving in a later micro-batch with timestamps
BEFORE the user's last seen event are assigned against the running state
(arrival order), not re-sorted into history — the batch twin over the
full, ordered table is the ground truth when late data matters; bound
lateness upstream with a watermark + sort per micro-batch if needed.

State is two LongTypes per key: at 10^9 users that is ~16 GB sharded
across the cluster's state stores — the scale path.  A production
deployment adds a GroupStateTimeout to retire users idle past the
retention window; kept explicit here for determinism.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType


def sessionize_stream(stream_df: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts", order_col: str = "event_id",
                      gap_s: int = 1800) -> DataFrame:
    """Append ``session_idx`` (1-based per user) to every event, carrying
    session continuity across micro-batches through keyed state."""
    out_schema = StructType(list(stream_df.schema.fields)
                            + [StructField("session_idx", LongType())])
    state_schema = StructType([StructField("last_ts_us", LongType()),
                               StructField("n_sessions", LongType())])
    in_cols = [f.name for f in stream_df.schema.fields]

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        last_ts_us, n_sessions = (state.get if state.exists else (None, 0))
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        batch = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        batch = batch.sort_values([ts_col, order_col], kind="stable")
        ts_us = (batch[ts_col].astype("datetime64[us]").astype("int64")
                 .to_numpy())
        idx = []
        for t in ts_us:
            if last_ts_us is None or (t - last_ts_us) > gap_s * 1_000_000:
                n_sessions += 1
            last_ts_us = int(t)
            idx.append(n_sessions)
        state.update((last_ts_us, n_sessions))
        out = batch[in_cols].copy()
        out["session_idx"] = idx
        yield out

    return (stream_df.groupBy(user_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def run_sessionize_stream(spark, input_dir: str, schema, output_dir: str,
                          checkpoint_dir: str, user_col: str = "user_id",
                          ts_col: str = "ts", order_col: str = "event_id",
                          gap_s: int = 1800, timeout_s: int = 300) -> None:
    """File-source driver: assign session ids to everything currently
    available, append to parquet, stop.  Re-running with the same
    checkpoint resumes user state — sessions continue across runs."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    out = sessionize_stream(stream, user_col, ts_col, order_col, gap_s)
    query = (out.writeStream
             .outputMode("append")
             .format("parquet")
             .option("path", output_dir)
             .option("checkpointLocation", checkpoint_dir)
             .trigger(availableNow=True)
             .start())
    if not query.awaitTermination(timeout_s):
        query.stop()
        raise TimeoutError(
            f"sessionize stream did not finish within {timeout_s}s; output "
            f"at {output_dir} is incomplete")
