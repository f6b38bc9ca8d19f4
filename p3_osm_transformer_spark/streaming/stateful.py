"""Custom stateful streaming operator — first-seen dedup via
``applyInPandasWithState`` (Arrow-batched per-key state).

The reference has no streaming at all (isLongRunning() == false,
OsmRdfTransformer.java:368-372); this is the engine-extension surface the
training-data pipeline needs: exact dedup of an unbounded image/document
stream by key (``phash`` or ``image_id``), where "already seen" must
survive micro-batch boundaries AND checkpoint restarts.  The batch twin is
``operators.dedup.dedup_exact`` (its oracle); at 10^12-row scale the state
store shards by key hash across executors exactly like the batch
hash-aggregate shards its groups, so the plan scales with executor count.

Why applyInPandasWithState and not dropDuplicates: streaming
``dropDuplicates`` keeps state forever with no hook; the explicit state op
(a) carries a per-key occurrence count (lineage metric the north rule
wants), (b) lets a production deployment set a GroupStateTimeout to bound
state for keys whose dedup window has passed.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType


def first_seen_dedup(stream_df: DataFrame, key_col: str,
                     order_col: str) -> DataFrame:
    """Emit exactly the first-seen row per ``key_col`` across the whole
    stream; within one micro-batch, the smallest ``order_col`` wins
    (deterministic tie-break, same rule as the batch ``dedup_exact``).

    Output schema = input schema + ``first_batch_rank`` (always 1, the
    batch twin's column) so batch and stream results union cleanly.
    """
    out_fields = list(stream_df.schema.fields) + [
        StructField("first_batch_rank", LongType())]
    out_schema = StructType(out_fields)
    state_schema = StructType([StructField("n_seen", LongType())])
    in_cols = [f.name for f in stream_df.schema.fields]

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        n_seen = state.get[0] if state.exists else 0
        # Gate on whether the key was seen in a PREVIOUS micro-batch,
        # captured before the chunk loop: one key's micro-batch arrives as
        # multiple Arrow chunks when it exceeds arrow.maxRecordsPerBatch,
        # and the min-order candidate may live in any chunk — gating on the
        # running count would consider only the first chunk.
        seen_before = n_seen > 0
        first: pd.DataFrame | None = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            if not seen_before:
                cand = pdf.sort_values(order_col, kind="stable").head(1)
                first = cand if first is None else (
                    pd.concat([first, cand])
                    .sort_values(order_col, kind="stable").head(1))
            n_seen += len(pdf)
        state.update((n_seen,))
        if first is not None:
            first = first[in_cols].copy()
            first["first_batch_rank"] = 1
            yield first

    return (stream_df.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def run_dedup_stream(spark, input_dir: str, schema, key_col: str,
                     order_col: str, output_dir: str,
                     checkpoint_dir: str) -> None:
    """File-source driver: dedup everything currently available, append
    survivors to ``output_dir`` parquet, then stop.  Re-running with the
    same checkpoint resumes the state store — keys seen in an earlier run
    stay deduped (the snapshot-resume semantic, state-store edition)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    deduped = first_seen_dedup(stream, key_col, order_col)
    query = (deduped.writeStream
             .outputMode("append")
             .format("parquet")
             .option("path", output_dir)
             .option("checkpointLocation", checkpoint_dir)
             .trigger(availableNow=True)
             .start())
    finished = query.awaitTermination(300)
    if not finished:
        # never hand back partial parquet silently — stop the runaway
        # query and surface the timeout to the caller
        query.stop()
        raise TimeoutError(
            "dedup stream did not finish within 300s; output at "
            f"{output_dir} is incomplete")
