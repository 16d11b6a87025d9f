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


SESSION_OUTPUT_SCHEMA = (
    "user_id LONG, session_start TIMESTAMP, session_end TIMESTAMP, f_events LONG"
)


def make_sessionizer_processor(gap_ms: int):
    """Gap-based sessionizer with EVENT-TIME TIMERS, exposed for unit
    testing (see make_running_stats_processor).

    State per key: the OPEN sessions as (start_ms, end_ms, n) intervals
    in a ListState (several can be open at once — a batch may contain
    multiple gap-separated bursts whose closes the watermark has not
    passed yet), plus one live timer at min(end)+gap. Each batch does an
    interval merge of (open sessions ∪ batch events) — late events
    bridge two open sessions into one, exactly like Spark's own
    session-window merge. The timer fires when the watermark passes the
    earliest close: emit every session with end+gap ≤ expiry, keep the
    rest, re-arm at the new earliest close."""
    StatefulProcessor, _ = _tws_classes()

    gap_us = gap_ms * 1000  # session math is exact at µs (timestamp
    # precision); only TIMERS are ms-granular (the runtime's unit), so a
    # close timer rounds UP — firing early would close a session the
    # watermark hasn't actually passed

    class _Sessionizer(StatefulProcessor):
        def init(self, handle) -> None:
            self._handle = handle
            self._open = handle.getListState(
                "open", "start_us LONG, end_us LONG, n LONG"
            )
            self._timer = handle.getValueState("timer", "at_ms LONG")

        def _rearm(self, sessions: list[tuple[int, int, int]]) -> None:
            new_at = (
                -(-(min(e for _, e, _ in sessions) + gap_us) // 1000)
                if sessions
                else None
            )
            old_at = self._timer.get()[0] if self._timer.exists() else None
            if old_at == new_at:
                return
            if old_at is not None:
                self._handle.deleteTimer(old_at)
            if new_at is not None:
                self._handle.registerTimer(new_at)
                self._timer.update((new_at,))
            else:
                self._timer.clear()

        def handleInputRows(self, key, rows, timerValues):
            ivals = (
                [tuple(t) for t in self._open.get()] if self._open.exists() else []
            )
            for pdf in rows:
                if not len(pdf):
                    continue
                for t in pdf["ts"].astype("int64") // 1000:  # ns -> µs
                    ivals.append((int(t), int(t), 1))
            if not ivals:
                return iter(())
            ivals.sort()
            merged = [ivals[0]]
            for s, e, n in ivals[1:]:
                ps, pe, pn = merged[-1]
                if s - pe <= gap_us:
                    merged[-1] = (ps, max(pe, e), pn + n)
                else:
                    merged.append((s, e, n))
            self._open.put(merged)
            self._rearm(merged)
            return iter(())  # sessions emit on CLOSE only (append mode)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            (user_id,) = key
            if not self._open.exists():
                return
            # close by the CURRENT WATERMARK, not the fired timer's
            # expiry: the watermark can jump far past several pending
            # closes in one batch, and one fire must drain all of them
            # (a chain of one-close-per-no-data-batch never catches up)
            wm_ms = timerValues.getCurrentWatermarkInMs() if timerValues else -1
            expiry_us = max(expiredTimerInfo.getExpiryTimeInMs(), wm_ms) * 1000
            sessions = [tuple(t) for t in self._open.get()]
            closed = [t for t in sessions if t[1] + gap_us <= expiry_us]
            still_open = [t for t in sessions if t[1] + gap_us > expiry_us]
            self._open.put(still_open) if still_open else self._open.clear()
            self._timer.clear()
            self._rearm(still_open)
            if closed:
                yield pd.DataFrame(
                    {
                        "user_id": [user_id] * len(closed),
                        "session_start": [
                            pd.to_datetime(s, unit="us") for s, _, _ in closed
                        ],
                        "session_end": [
                            pd.to_datetime(e, unit="us") for _, e, _ in closed
                        ],
                        "f_events": [n for _, _, n in closed],
                    }
                )

        def close(self) -> None:
            pass

    return _Sessionizer()


def sessionize_tws(
    events_stream: DataFrame, gap: str = "30 minutes", watermark_delay: str = "0 seconds"
) -> DataFrame:
    """Streaming gap-sessionization via event-time timers — the custom
    stateful operator Spark's built-in ``session_window`` approximates
    but cannot extend (arbitrary per-session state, exact one-live-timer
    bookkeeping, custom close conditions).

    A session closes when the WATERMARK passes last_event + gap: the
    timer fires once, emits the closed session, clears state. Per-key
    state is O(1) (one open session) and timers are per-key in the state
    store, so the operator scales with key cardinality, not history.
    Input must carry (user_id, ts, ...); the watermark is applied here.
    """
    import re as _re

    m = _re.match(r"(\d+)\s*(second|minute|hour)s?", gap)
    if not m:
        raise ValueError(f"unparseable gap: {gap!r}")
    gap_ms = int(m.group(1)) * {"second": 1, "minute": 60, "hour": 3600}[
        m.group(2)
    ] * 1000
    return (
        events_stream.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=make_sessionizer_processor(gap_ms),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
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


HEAVY_HITTERS_OUTPUT_SCHEMA = (
    "group_key STRING, f_rank LONG, f_token STRING, f_count LONG, f_err LONG"
)


def make_heavy_hitters_processor(k: int = 16):
    """SpaceSaving top-K StatefulProcessor (Metwally et al., "Efficient
    computation of frequent and top-k elements in data streams",
    ICDT'05), exposed for unit testing (see
    make_running_stats_processor)."""
    StatefulProcessor, _ = _tws_classes()

    class _HeavyHitters(StatefulProcessor):
        def init(self, handle) -> None:
            self._summary = handle.getListState(
                "summary", "token STRING, n LONG, err LONG"
            )

        def handleInputRows(self, key, rows, timerValues):
            (group_key,) = key
            counters: dict[str, list[int]] = {}
            if self._summary.exists():
                for tok, n, err in self._summary.get():
                    counters[tok] = [int(n), int(err)]
            batch: dict[str, int] = {}
            for pdf in rows:
                for tok, cnt in pdf.groupby("token").size().items():
                    batch[tok] = batch.get(tok, 0) + int(cnt)
            # apply in sorted token order so the eviction sequence (and
            # therefore the summary) is deterministic for a given batch
            for tok in sorted(batch):
                add = batch[tok]
                if tok in counters:
                    counters[tok][0] += add
                elif len(counters) < k:
                    counters[tok] = [add, 0]
                else:
                    # evict the min counter; ties broken by evicting the
                    # lexicographically greatest token (fixed, arbitrary)
                    evict_tok, (m, _) = min(
                        counters.items(),
                        key=lambda kv: (kv[1][0], _desc_str(kv[0])),
                    )
                    del counters[evict_tok]
                    counters[tok] = [m + add, m]
            ranked = sorted(
                counters.items(), key=lambda kv: (-kv[1][0], kv[0])
            )
            self._summary.put(
                [(tok, n, err) for tok, (n, err) in ranked]
            )
            yield pd.DataFrame(
                {
                    "group_key": [group_key] * len(ranked),
                    "f_rank": list(range(1, len(ranked) + 1)),
                    "f_token": [tok for tok, _ in ranked],
                    "f_count": [n for _, (n, _) in ranked],
                    "f_err": [err for _, (_, err) in ranked],
                }
            )

        def close(self) -> None:
            pass

    return _HeavyHitters()


class _desc_str(str):
    """Reverses string comparison — lets one min() key mix an ascending
    count with a descending token tiebreak."""

    __slots__ = ()

    def __lt__(self, other):  # type: ignore[override]
        return str.__gt__(self, other)


def heavy_hitters_tws(keyed_stream: DataFrame, k: int = 16) -> DataFrame:
    """Streaming heavy hitters: per group_key, the approximate top-K
    tokens by count via the SpaceSaving summary — the streaming twin of
    the batch q_vocab_build key (hot-token / vocabulary-drift tracking
    over an ingest stream, e.g. per-language).

    Guarantees (SpaceSaving): at most K counters per group ever exist
    (state is O(K) per key — bounded forever, no watermark needed);
    every reported count overestimates the true count by at most its
    ``f_err``; any token whose true count exceeds total/K is guaranteed
    present in the summary. With K ≥ distinct tokens the counts are
    EXACT (err 0) — the property the parity test pins.

    Input: (group_key STRING, token STRING, ...); shuffles once on
    group_key; each batch rewrites one K-row list and emits the updated
    ranked summary (Update mode)."""
    return keyed_stream.groupBy("group_key").transformWithStateInPandas(
        statefulProcessor=make_heavy_hitters_processor(k),
        outputStructType=HEAVY_HITTERS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


QUANTILES_OUTPUT_SCHEMA = (
    "user_id LONG, f_n LONG, f_sampled LONG, f_p25 DOUBLE, f_p50 DOUBLE, "
    "f_p75 DOUBLE"
)


def make_running_quantiles_processor(k: int = 64):
    """Bottom-k-by-hash streaming sample + quantiles StatefulProcessor,
    exposed for unit testing (see make_running_stats_processor)."""
    StatefulProcessor, _ = _tws_classes()

    class _RunningQuantiles(StatefulProcessor):
        def init(self, handle) -> None:
            # sample rows keyed by a deterministic per-observation hash:
            # keeping the k hash-SMALLEST observations is a uniform
            # sample of the stream so far (hash order is independent of
            # value and arrival order)
            self._sample = handle.getListState("sample", "h LONG, v DOUBLE")
            self._n = handle.getValueState("n", "n LONG")

        def handleInputRows(self, key, rows, timerValues):
            import zlib

            (user_id,) = key
            items = (
                [(int(h), float(v)) for h, v in self._sample.get()]
                if self._sample.exists()
                else []
            )
            n = int(self._n.get()[0]) if self._n.exists() else 0
            for pdf in rows:
                for eid, v in zip(pdf["event_id"], pdf["value"]):
                    # observation identity (not value) feeds the hash so
                    # duplicate values sample independently
                    h = zlib.crc32(f"{user_id}:{int(eid)}".encode())
                    items.append((h, float(v)))
                    n += 1
            items.sort()
            items = items[:k]
            self._sample.put(items)
            self._n.update((n,))
            vals = sorted(v for _, v in items)

            def q(p: float) -> float:
                # 'lower' sample quantile — index floor(p*(m-1)); exact
                # and engine-independent (no interpolation arithmetic)
                return vals[int(p * (len(vals) - 1))]

            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "f_n": [n],
                    "f_sampled": [len(vals)],
                    "f_p25": [q(0.25)],
                    "f_p50": [q(0.50)],
                    "f_p75": [q(0.75)],
                }
            )

        def close(self) -> None:
            pass

    return _RunningQuantiles()


def running_quantiles_tws(events_stream: DataFrame, k: int = 64) -> DataFrame:
    """Streaming per-key quantiles over a BOUNDED deterministic sample:
    keep the k hash-smallest observations per key (a uniform sample of
    the full history — bottom-k by an identity hash is order- and
    value-independent), emit 'lower' sample quantiles each batch. State
    is O(k) per key forever — no watermark needed; with k ≥ the key's
    history the quantiles are EXACT (the property the parity test
    pins), and at scale they are classic sample quantiles with the
    usual O(1/√k) error. Input: (user_id, event_id, value); shuffles
    once on user_id."""
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_running_quantiles_processor(k),
        outputStructType=QUANTILES_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )

DECAY_OUTPUT_SCHEMA = "user_id LONG, f_decayed DOUBLE, f_last_ts TIMESTAMP"


def make_decayed_value_processor(halflife_s: float):
    """Exponentially time-decayed running value per key — the classic
    streaming feature ("activity score with a 1-hour half-life") that a
    plain windowed aggregation cannot express (every event's weight
    decays CONTINUOUSLY with event-time age, not in bucket steps).

    State: one ValueState (last_ts_us, decayed). Each batch's rows fold
    in EVENT-TIME order (ts, then value for exact-tie stability):
    ``decayed = decayed · 2^(−Δt/halflife) + value``. The fold is the
    closed form of the per-event recurrence, so the result depends only
    on the (key-local) event sequence, not on how batches split it —
    batching invariance is pytest-replayed. O(1) state per key forever."""
    StatefulProcessor, _ = _tws_classes()
    hl_us = float(halflife_s) * 1_000_000.0

    class _Decayed(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState(
                "decay", "last_ts_us LONG, decayed DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            if self._state.exists():
                last_us, decayed = self._state.get()
            else:
                last_us, decayed = None, 0.0
            pdfs = [pdf for pdf in rows]
            batch = pd.concat(pdfs, ignore_index=True)
            batch = batch.sort_values(["ts", "value"], kind="mergesort")
            for ts, value in zip(batch["ts"], batch["value"]):
                ts_us = int(pd.Timestamp(ts).value // 1000)
                if last_us is None or ts_us >= last_us:
                    if last_us is not None:
                        decayed = decayed * (
                            2.0 ** (-(ts_us - last_us) / hl_us)
                        )
                    decayed += float(value)
                    last_us = ts_us
                else:
                    # LATE row (older than the reference time): discount
                    # its value to the reference instead of un-decaying
                    # the whole accumulator — algebraically identical
                    # (the fold is linear) but the exponent stays
                    # NEGATIVE, so a row arbitrarily many half-lives old
                    # underflows toward 0.0 instead of overflowing
                    # 2^(+huge) and crashing the batch
                    decayed += float(value) * (
                        2.0 ** (-(last_us - ts_us) / hl_us)
                    )
            self._state.update((last_us, decayed))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "f_decayed": [decayed],
                    "f_last_ts": [pd.Timestamp(last_us * 1000)],
                }
            )

        def close(self) -> None:
            pass

    return _Decayed()


def decayed_value_tws(
    events_stream: DataFrame, halflife_s: float = 3600.0
) -> DataFrame:
    """Per-user exponentially decayed activity value on
    transformWithStateInPandas. Emits one updated row per key per
    micro-batch (Update mode)."""
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_decayed_value_processor(halflife_s),
        outputStructType=DECAY_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )

