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


# ---------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas — the successor API. Typed state
# variables (ValueState/ListState/MapState), timers, and per-state TTL;
# requires the RocksDB state store provider
# (spark.sql.streaming.stateStore.providerClass =
#  ...state.RocksDBStateStoreProvider), which is also what a production
# cluster runs for large state. Same horizontal-scale story: state is
# partitioned by the grouping key.
# ---------------------------------------------------------------------------

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def tws_available() -> bool:
    """transformWithStateInPandas needs ``protobuf`` at runtime (its state
    protocol is protobuf-encoded; PySpark ships the generated stubs but
    not the library). Minimal containers lack it → the vendored minipb
    clean-room runtime (vendor/minipb) satisfies the generated module's
    API subset; activation is a no-op when real protobuf is installed.
    Must run before the SparkSession exists so workers inherit the
    PYTHONPATH (session.get_spark also activates it)."""
    from ..vendor import ensure_protobuf

    return ensure_protobuf()


def _tws_classes():
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    return StatefulProcessor, StatefulProcessorHandle


def make_running_stats_processor():
    """The RunningStats StatefulProcessor, exposed for direct unit
    testing: the container lacks ``protobuf`` so the state-server
    round-trip can't run here, but the processor's own semantics
    (state fold + emit) are fully testable against a mock handle
    (tests/test_stateful_tws.py). On a real cluster the SAME object is
    what transformWithStateInPandas executes."""
    StatefulProcessor, _ = _tws_classes()

    class _RunningStats(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState("stats", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            if self._state.exists():
                n, total, last_ts = self._state.get()
            else:
                n, total, last_ts = 0, 0.0, None
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                batch_max = pdf["ts"].max()
                if last_ts is None or batch_max > last_ts:
                    last_ts = batch_max
            self._state.update((n, total, last_ts))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "f_n": [n],
                    "f_total": [total],
                    "f_last_ts": [last_ts],
                }
            )

        def close(self) -> None:
            pass

    return _RunningStats()


def running_user_stats_tws(events_stream: DataFrame) -> DataFrame:
    """``running_user_stats`` re-expressed on transformWithStateInPandas
    (Spark 4 typed-state API): a ValueState holds (n, total, last_ts) per
    user; each micro-batch folds its rows in and emits the updated row.
    Output contract is identical to the applyInPandasWithState form —
    tests assert both match the batch recompute."""
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_running_stats_processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


RECENT_OUTPUT_SCHEMA = "user_id LONG, f_n LONG, f_recent_mean DOUBLE"


def make_recent_values_processor(n: int = 5):
    """Recent-N rolling window on ListState, exposed for unit testing
    (see make_running_stats_processor)."""
    StatefulProcessor, _ = _tws_classes()

    class _RecentValues(StatefulProcessor):
        def init(self, handle) -> None:
            self._recent = handle.getListState(
                "recent", "ts TIMESTAMP, value DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            items = [tuple(t) for t in self._recent.get()] if self._recent.exists() else []
            for pdf in rows:
                items.extend(
                    zip(list(pdf["ts"]), (float(v) for v in pdf["value"]))
                )
            # top-N most recent by event time (value tiebreak for
            # determinism under equal timestamps)
            items.sort(key=lambda t: (t[0], t[1]), reverse=True)
            items = items[:n]
            self._recent.put(items)
            vals = [v for _, v in items]
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "f_n": [len(vals)],
                    "f_recent_mean": [sum(vals) / len(vals) if vals else None],
                }
            )

        def close(self) -> None:
            pass

    return _RecentValues()


def recent_values_tws(events_stream: DataFrame, n: int = 5) -> DataFrame:
    """Per-user rolling last-N feature (mean over the N most recent
    events by event time) — the 'last N transactions' feature-store
    pattern. ListState holds exactly N (ts, value) rows per key, so
    state is O(N) per entity regardless of history length; each batch
    rewrites one small list (ListState.put) and emits the updated
    feature row. Shuffles once on user_id."""
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_recent_values_processor(n),
        outputStructType=RECENT_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


TYPE_COUNTS_OUTPUT_SCHEMA = "user_id LONG, event_type STRING, f_count LONG"


def make_type_counts_processor():
    """Per-user categorical counter on MapState, exposed for unit
    testing (see make_running_stats_processor)."""
    StatefulProcessor, _ = _tws_classes()

    class _TypeCounts(StatefulProcessor):
        def init(self, handle) -> None:
            self._counts = handle.getMapState(
                "counts", "event_type STRING", "n LONG"
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            touched: dict[str, int] = {}
            for pdf in rows:
                for et, n in pdf.groupby("event_type").size().items():
                    touched[et] = touched.get(et, 0) + int(n)
            for et, add in touched.items():
                prev = self._counts.getValue((et,))
                total = (int(prev[0]) if prev else 0) + add
                self._counts.updateValue((et,), (total,))
                touched[et] = total
            if touched:
                yield pd.DataFrame(
                    {
                        "user_id": [user_id] * len(touched),
                        "event_type": list(touched),
                        "f_count": list(touched.values()),
                    }
                )

        def close(self) -> None:
            pass

    return _TypeCounts()


def running_type_counts_tws(events_stream: DataFrame) -> DataFrame:
    """Streaming crosstab: per (user, event_type) running counts in a
    MapState keyed by user — the map key is the category, so per-user
    state is O(categories) and the operator shuffles once on user_id.
    Emits the UPDATED (user_id, event_type, count) rows each batch
    (only categories that arrived, not the whole map — state reads are
    point lookups, never a full iteration, which is what keeps the
    per-batch cost independent of history at 100 TB)."""
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_type_counts_processor(),
        outputStructType=TYPE_COUNTS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


DEDUP_OUTPUT_SCHEMA = "dedup_key STRING, doc_id LONG"


def make_first_seen_processor():
    """The FirstSeen dedup StatefulProcessor, exposed for direct unit
    testing (see make_running_stats_processor)."""
    StatefulProcessor, _ = _tws_classes()

    class _FirstSeen(StatefulProcessor):
        def init(self, handle) -> None:
            self._seen = handle.getValueState("seen", "first_doc_id LONG")

        def handleInputRows(self, key, rows, timerValues):
            (dedup_key,) = key
            if self._seen.exists():
                # key known from a prior batch — drop everything
                for _ in rows:
                    pass
                return
            first_id = None
            for pdf in rows:
                if len(pdf):
                    batch_min = int(pdf["doc_id"].min())
                    if first_id is None or batch_min < first_id:
                        first_id = batch_min
            if first_id is not None:
                self._seen.update((first_id,))
                yield pd.DataFrame(
                    {"dedup_key": [dedup_key], "doc_id": [first_id]}
                )

        def close(self) -> None:
            pass

    return _FirstSeen()


def streaming_dedup_first_seen(keyed_stream: DataFrame) -> DataFrame:
    """Cross-batch exact streaming dedup: emit only the FIRST row ever
    seen per dedup_key (content hash), remembering seen keys in a
    ValueState forever. This is the streaming form of q_dedup_exact —
    Spark's built-in ``dropDuplicates`` needs a watermark to bound state
    and forgets keys past it; a training-data ingest pipeline needs
    corpus-lifetime dedup, which is exactly what explicit state gives.
    Input: (dedup_key STRING, doc_id LONG, ...); grouped on dedup_key so
    state scales horizontally with distinct-content cardinality."""
    return keyed_stream.groupBy("dedup_key").transformWithStateInPandas(
        statefulProcessor=make_first_seen_processor(),
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
