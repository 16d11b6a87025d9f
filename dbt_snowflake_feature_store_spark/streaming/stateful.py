"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.D; the "custom operators" path for semantics Spark's
built-in streaming aggregations can't express).

``running_user_stats`` maintains per-key running aggregates (count / sum /
max event time) across micro-batches with explicit state — the template
for any custom accumulator (running quantile sketch, per-entity model
features, ...). State lives in the state store (RocksDB/HDFS-backed on a
real cluster), partitioned by the grouping key: per-key state is O(1) and
the operator scales horizontally with key cardinality.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n LONG, total DOUBLE, last_ts TIMESTAMP"
OUTPUT_SCHEMA = "user_id LONG, f_n LONG, f_total DOUBLE, f_last_ts TIMESTAMP"


def _update_user_stats(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
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
            "user_id": [user_id],
            "f_n": [n],
            "f_total": [total],
            "f_last_ts": [last_ts],
        }
    )


def running_user_stats(events_stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum, last event time) over a streaming
    DataFrame with columns (user_id, ts, value). Emits the updated state
    row for every key seen in each micro-batch."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
