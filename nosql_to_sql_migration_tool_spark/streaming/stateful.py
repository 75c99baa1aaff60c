"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md M6 / brief: "applyInPandasWithState for custom stateful
operators"): a per-user running profile maintained across micro-batches
and across restarts (state lives in the checkpoint).

This is the one streaming shape built-in windowed aggregation cannot
express: arbitrary per-key state transition logic (here: monotonic event
count + running value sum + last-seen timestamp) with explicit state
schema. Per micro-batch each key's rows arrive as Arrow-batched pandas
frames; the state row is the only thing persisted."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, last_ts timestamp"
)
STATE_SCHEMA = "n long, total double, last_ts timestamp"


def _update_user_profile(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total, last_ts = state.get
    else:
        n, total, last_ts = 0, 0.0, None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        if last_ts is None or batch_max > last_ts:
            last_ts = batch_max
    state.update((n, total, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [last_ts],
        }
    )


def running_user_profiles(events_stream: DataFrame) -> DataFrame:
    """Per-user running (count, value sum, last-seen ts) over a stream of
    events — state transitions applied per micro-batch, persisted in the
    checkpoint, resumed across restarts."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_user_profiles(
    events_stream: DataFrame, checkpoint_path: str, output_path: str
) -> StreamingQuery:
    """availableNow run of the stateful profile, appending per-batch
    updated profiles to parquet via foreachBatch (the memory sink cannot
    recover from a checkpoint, so it cannot model restarts)."""

    def write_batch(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(output_path)

    return (
        running_user_profiles(events_stream)
        .writeStream.outputMode("update")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
