"""transformWithStateInPandas (Spark 4 typed-state API) operators:
running stats parity with the batch recompute, and cross-batch
first-seen streaming dedup. Both need the RocksDB state store provider.

Coverage strategy in this container (no ``protobuf`` → Spark's
state-server protocol can't run; pip installs are off-limits):

1. PLAN — the operator must build and analyze: the logical plan carries
   a TransformWithStateInPySpark node with the declared output schema,
   output mode, and time mode (asserted against the analyzed plan).
2. SEMANTICS — the StatefulProcessor objects themselves are executed
   directly against a mock typed-state handle, replaying multi-batch
   sequences and asserting parity with the batch recompute. This covers
   every line of OUR code; the only thing not executed is Spark's own
   protobuf state transport, which is Spark's contract, not ours.
3. END-TO-END — runs where protobuf exists (real cluster); those tests
   remain, gated.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dbt_snowflake_feature_store_spark.sources import read_table
from dbt_snowflake_feature_store_spark.streaming.stateful import (
    ROCKSDB_PROVIDER,
    make_first_seen_processor,
    make_recent_values_processor,
    make_running_stats_processor,
    make_sessionizer_processor,
    make_type_counts_processor,
    recent_values_tws,
    running_type_counts_tws,
    running_user_stats_tws,
    sessionize_tws,
    streaming_dedup_first_seen,
    tws_available,
)

needs_protobuf = pytest.mark.skipif(
    not tws_available(),
    reason="transformWithStateInPandas needs protobuf (absent in container)",
)

SF = "/root/testdata/sf0.001"


def test_tws_plan_constructs(spark):
    """Even without protobuf the operator must BUILD: groupBy +
    transformWithStateInPandas resolves the output schema at plan time,
    and the analyzed plan carries the declared output mode / time mode."""
    ev = read_table(spark, SF, "events").select("user_id", "ts", "value")
    df = running_user_stats_tws(ev)
    assert [f.name for f in df.schema.fields] == [
        "user_id",
        "f_n",
        "f_total",
        "f_last_ts",
    ]
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "TransformWithStateInPySpark" in plan
    assert "Update" in plan and "NoTime" in plan
    # grouping key is the first UDF argument
    assert "transformWithStateUDF(user_id" in plan

    docs = read_table(spark, SF, "documents").select(
        F.sha2(F.col("text"), 256).alias("dedup_key"), "doc_id"
    )
    ddf = streaming_dedup_first_seen(docs)
    dplan = ddf._jdf.queryExecution().analyzed().toString()
    assert "TransformWithStateInPySpark" in dplan
    assert "Append" in dplan and "NoTime" in dplan
    assert [f.name for f in ddf.schema.fields] == ["dedup_key", "doc_id"]


# ---------------------------------------------------------------------------
# Mock typed-state handle: the exact surface our processors consume
# (handle.getValueState -> ValueState.exists/get/update). Replaying
# micro-batches through handleInputRows executes the full operator logic.
# ---------------------------------------------------------------------------


class _MockValueState:
    def __init__(self):
        self._v = None
        self._set = False

    def exists(self) -> bool:
        return self._set

    def get(self):
        return self._v

    def update(self, v) -> None:
        self._v, self._set = v, True

    def clear(self) -> None:
        self._v, self._set = None, False


class _MockMapState:
    def __init__(self):
        self._m = {}

    def exists(self) -> bool:
        return bool(self._m)

    def getValue(self, key):
        return self._m.get(key)

    def containsKey(self, key) -> bool:
        return key in self._m

    def updateValue(self, key, value) -> None:
        self._m[key] = value

    def iterator(self):
        return iter(self._m.items())


class _MockListState:
    def __init__(self):
        self._l = []

    def exists(self) -> bool:
        return bool(self._l)

    def get(self):
        return iter(self._l)

    def put(self, new_state) -> None:
        self._l = list(new_state)

    def appendValue(self, v) -> None:
        self._l.append(v)

    def appendList(self, vs) -> None:
        self._l.extend(vs)

    def clear(self) -> None:
        self._l = []


class _MockHandle:
    def __init__(self):
        self.states = {}
        self.timers = set()

    def registerTimer(self, ms):
        self.timers.add(ms)

    def deleteTimer(self, ms):
        self.timers.discard(ms)

    def getValueState(self, name, schema):
        return self.states.setdefault(name, _MockValueState())

    def getMapState(self, name, key_schema, value_schema, ttl=None):
        return self.states.setdefault(name, _MockMapState())

    def getListState(self, name, schema, ttl=None):
        return self.states.setdefault(name, _MockListState())


def _replay(processor_factory, batches):
    """Drive a StatefulProcessor over per-key micro-batches the way the
    TWS runtime does: one handle per partition, handleInputRows per
    (key, batch). ``batches`` is a list of dict key -> DataFrame."""
    proc = processor_factory()
    handles = {}
    out = []
    for batch in batches:
        for key, pdf in batch.items():
            if key not in handles:
                handles[key] = _MockHandle()
            proc.init(handles[key])  # re-wire state to this key's handle
            out.extend(proc.handleInputRows((key,), iter([pdf]), None))
    proc.close()
    return out


def test_tws_running_stats_semantics_mock_handle():
    """Multi-batch fold parity with the batch recompute, executed
    against the mock handle (no state server needed)."""
    b1 = {
        1: pd.DataFrame({"value": [1.0, 2.0], "ts": pd.to_datetime(["2024-01-01", "2024-01-02"])}),
        2: pd.DataFrame({"value": [10.0], "ts": pd.to_datetime(["2024-01-05"])}),
    }
    b2 = {
        1: pd.DataFrame({"value": [4.0], "ts": pd.to_datetime(["2024-01-03"])}),
    }
    out = _replay(make_running_stats_processor, [b1, b2])
    final = {int(o["user_id"][0]): o for o in out}
    # last emit per key wins (Update mode)
    assert final[1]["f_n"][0] == 3
    assert final[1]["f_total"][0] == 7.0
    assert final[1]["f_last_ts"][0] == pd.Timestamp("2024-01-03")
    assert final[2]["f_n"][0] == 1
    assert final[2]["f_total"][0] == 10.0


def test_tws_running_stats_state_survives_out_of_order():
    """A later batch with an EARLIER timestamp must not regress
    f_last_ts (max semantics, not last-write)."""
    b1 = {1: pd.DataFrame({"value": [1.0], "ts": pd.to_datetime(["2024-06-01"])})}
    b2 = {1: pd.DataFrame({"value": [1.0], "ts": pd.to_datetime(["2024-01-01"])})}
    out = _replay(make_running_stats_processor, [b1, b2])
    assert out[-1]["f_last_ts"][0] == pd.Timestamp("2024-06-01")


def test_tws_first_seen_dedup_semantics_mock_handle():
    """Corpus-lifetime dedup: a key seen in batch 1 emits nothing in
    batch 2, first_doc_id is the min doc_id of the first-arriving
    batch; within a batch the min wins."""
    b1 = {"k1": pd.DataFrame({"doc_id": [7, 3]}), "k2": pd.DataFrame({"doc_id": [5]})}
    b2 = {"k1": pd.DataFrame({"doc_id": [1]}), "k3": pd.DataFrame({"doc_id": [9]})}
    out = _replay(make_first_seen_processor, [b1, b2])
    emitted = {o["dedup_key"][0]: int(o["doc_id"][0]) for o in out}
    # k1 re-sent in batch 2 with a smaller id: NOT re-emitted (first-seen
    # is sticky), k3 is new
    assert emitted == {"k1": 3, "k2": 5, "k3": 9}
    assert len(out) == 3


def test_tws_type_counts_semantics_mock_handle():
    """MapState categorical counts accumulate across batches; only
    arrived categories are emitted per batch."""
    b1 = {1: pd.DataFrame({"event_type": ["click", "click", "view"]})}
    b2 = {1: pd.DataFrame({"event_type": ["click"]}), 2: pd.DataFrame({"event_type": ["view"]})}
    out = _replay(make_type_counts_processor, [b1, b2])
    rows = {}
    for o in out:
        for _, r in o.iterrows():
            rows[(int(r["user_id"]), r["event_type"])] = int(r["f_count"])
    assert rows == {(1, "click"): 3, (1, "view"): 1, (2, "view"): 1}
    # batch-2 emit for user 1 contains only 'click' (the arrived
    # category), not the untouched 'view'
    last_u1 = [o for o in out if int(o["user_id"][0]) == 1][-1]
    assert list(last_u1["event_type"]) == ["click"]


@needs_protobuf
def test_tws_type_counts_matches_batch(rocksdb, tmp_path):
    """End-to-end MapState path through the state server: final counts
    per (user, event_type) equal the batch groupBy recompute."""
    spark = rocksdb
    ev = read_table(spark, SF, "events").select("user_id", "event_type")
    src = str(tmp_path / "src")
    ev.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)

    out_dir = str(tmp_path / "out")
    epoch = {"n": 0}

    def sink(df, epoch_id):
        epoch["n"] += 1
        df.withColumn("_epoch", F.lit(epoch["n"])).write.mode("append").parquet(
            out_dir
        )

    q = (
        running_type_counts_tws(stream)
        .writeStream.trigger(availableNow=True)
        .outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()

    out = spark.read.parquet(out_dir)
    latest = out.groupBy("user_id", "event_type").agg(
        F.max("_epoch").alias("_epoch")
    )
    got = {
        (r["user_id"], r["event_type"]): r["f_count"]
        for r in out.join(latest, ["user_id", "event_type", "_epoch"]).collect()
    }
    exp = {
        (r["user_id"], r["event_type"]): r["n"]
        for r in ev.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == exp


def test_tws_recent_values_semantics_mock_handle():
    """ListState rolling last-N: state holds exactly N most-recent rows,
    the emitted mean is over those rows only."""
    mk = lambda: make_recent_values_processor(n=3)  # noqa: E731
    b1 = {
        1: pd.DataFrame(
            {"ts": pd.to_datetime(["2024-01-01", "2024-01-02"]), "value": [1.0, 2.0]}
        )
    }
    b2 = {
        1: pd.DataFrame(
            {"ts": pd.to_datetime(["2024-01-04", "2024-01-03"]), "value": [4.0, 3.0]}
        )
    }
    out = _replay(mk, [b1, b2])
    # after batch 2: recent-3 = values at 01-04, 01-03, 01-02 -> mean 3.0
    assert int(out[-1]["f_n"][0]) == 3
    assert out[-1]["f_recent_mean"][0] == pytest.approx(3.0)
    # an old row arriving later does not displace newer ones
    b3 = {1: pd.DataFrame({"ts": pd.to_datetime(["2023-12-01"]), "value": [100.0]})}
    out = _replay(mk, [b1, b2, b3])
    assert out[-1]["f_recent_mean"][0] == pytest.approx(3.0)


@needs_protobuf
def test_tws_recent_values_matches_batch(rocksdb, tmp_path):
    """End-to-end ListState path (get/put through the state server):
    final rolling means equal the batch window recompute."""
    from pyspark.sql import Window

    spark = rocksdb
    ev = read_table(spark, SF, "events").select("user_id", "ts", "value")
    src = str(tmp_path / "src")
    ev.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)

    out_dir = str(tmp_path / "out")
    epoch = {"n": 0}

    def sink(df, epoch_id):
        epoch["n"] += 1
        df.withColumn("_epoch", F.lit(epoch["n"])).write.mode("append").parquet(
            out_dir
        )

    q = (
        recent_values_tws(stream, n=5)
        .writeStream.trigger(availableNow=True)
        .outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()

    out = spark.read.parquet(out_dir)
    latest = out.groupBy("user_id").agg(F.max("_epoch").alias("_epoch"))
    got = {
        r["user_id"]: (r["f_n"], r["f_recent_mean"])
        for r in out.join(latest, ["user_id", "_epoch"]).collect()
    }
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("value").desc()
    )
    exp = {
        r["user_id"]: (r["n"], r["m"])
        for r in ev.withColumn("_rn", F.row_number().over(w))
        .filter("_rn <= 5")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.avg("value").alias("m"))
        .collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0], k
        assert got[k][1] == pytest.approx(exp[k][1]), k


def test_tws_sessionizer_semantics_mock_handle():
    """Interval-merge + timer bookkeeping: a batch with two gap-separated
    bursts opens two sessions with ONE timer at the earliest close; the
    timer emits only watermark-passed sessions and re-arms; a bridging
    event merges two open sessions."""
    from pyspark.sql.streaming.stateful_processor import ExpiredTimerInfo

    gap = 60_000
    proc = make_sessionizer_processor(gap)
    h = _MockHandle()
    proc.init(h)

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    ms = lambda t: int(t.value // 1_000_000)  # noqa: E731
    sec = lambda s: pd.Timedelta(seconds=s)  # noqa: E731

    def fire(at_ms):
        # the runtime removes a fired timer before invoking the handler
        h.timers.discard(at_ms)
        return list(proc.handleExpiredTimer((1,), None, ExpiredTimerInfo(at_ms)))

    # two bursts 5 minutes apart -> two open sessions
    b1 = pd.DataFrame({"ts": [t0, t0 + sec(30), t0 + sec(300), t0 + sec(310)]})
    list(proc.handleInputRows((1,), iter([b1]), None))
    assert h.timers == {ms(t0 + sec(30)) + gap}

    # earliest close fires: burst-1 emitted, timer re-armed for burst 2
    out = fire(ms(t0 + sec(30)) + gap)
    assert len(out) == 1 and out[0].iloc[0]["f_events"] == 2
    assert out[0].iloc[0]["session_end"] == t0 + sec(30)
    assert h.timers == {ms(t0 + sec(310)) + gap}

    # two new bursts, the first bridging into the open session
    b2 = pd.DataFrame({"ts": [t0 + sec(350), t0 + sec(1000)]})
    list(proc.handleInputRows((1,), iter([b2]), None))
    assert h.timers == {ms(t0 + sec(350)) + gap}

    # merged session closes on its timer; the later burst stays open
    out = fire(ms(t0 + sec(350)) + gap)
    assert len(out) == 1
    assert (out[0].iloc[0]["f_events"], out[0].iloc[0]["session_end"]) == (
        3,
        t0 + sec(350),
    )
    assert h.timers == {ms(t0 + sec(1000)) + gap}

    # last session closes on the re-armed timer; nothing remains
    out = fire(ms(t0 + sec(1000)) + gap)
    assert len(out) == 1
    assert (out[0].iloc[0]["f_events"], out[0].iloc[0]["session_end"]) == (
        1,
        t0 + sec(1000),
    )
    assert not h.states["open"].exists() and h.timers == set()


@needs_protobuf
def test_tws_sessionize_event_time_timers_match_batch(rocksdb, tmp_path):
    """End-to-end event-time-timer path: closed sessions equal the batch
    gaps-and-islands recompute. A future sentinel event pushes the
    watermark past every real session's close in the second run."""
    from pyspark.sql import Window

    spark = rocksdb
    ev = (
        read_table(spark, SF, "events")
        .select("user_id", "ts")
        .filter("user_id IS NOT NULL")
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    ev.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            sessionize_tws(stream, gap="30 minutes")
            .writeStream.trigger(availableNow=True)
            .outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()

    run()
    # sentinel far in the future closes every real session
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    spark.createDataFrame(
        [(999_999, max_ts + pd.Timedelta(days=2))], schema="user_id long, ts timestamp"
    ).coalesce(1).write.mode("append").parquet(src)
    run()

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["f_events"])
        for r in spark.read.parquet(out_dir).filter("user_id != 999999").collect()
    }
    w = Window.partitionBy("user_id").orderBy("ts")
    sess = (
        ev.withColumn("_prev", F.lag("ts").over(w))
        .withColumn(
            "_new",
            (
                F.col("_prev").isNull()
                | (
                    F.unix_micros("ts") - F.unix_micros("_prev")
                    > 1800 * 1_000_000
                )
            ).cast("int"),
        )
        .withColumn("_sid", F.sum("_new").over(w))
        .groupBy("user_id", "_sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("f_events"),
        )
    )
    exp = {
        (r["user_id"], r["session_start"], r["session_end"], r["f_events"])
        for r in sess.collect()
    }
    assert got == exp


def test_tws_first_seen_empty_batch_no_state_write():
    """An all-empty input for an unseen key must neither emit nor mark
    the key seen."""
    b1 = {"k1": pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})}
    b2 = {"k1": pd.DataFrame({"doc_id": [4]})}
    out = _replay(make_first_seen_processor, [b1, b2])
    assert len(out) == 1 and int(out[0]["doc_id"][0]) == 4


@pytest.fixture()
def rocksdb(spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    yield spark
    if prev is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prev)


def _drain(df_stream, ckpt, out_dir, mode):
    q = (
        df_stream.writeStream.trigger(availableNow=True)
        .outputMode(mode)
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()


@needs_protobuf
def test_tws_running_stats_matches_batch(rocksdb, tmp_path):
    spark = rocksdb
    ev = read_table(spark, SF, "events")
    src = str(tmp_path / "src")
    ev.select("user_id", "ts", "value").coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)

    out_dir = str(tmp_path / "out")
    epoch = {"n": 0}

    def sink(df, epoch_id):
        epoch["n"] += 1
        df.withColumn("_epoch", F.lit(epoch["n"])).write.mode("append").parquet(
            out_dir
        )

    q = (
        running_user_stats_tws(stream)
        .writeStream.trigger(availableNow=True)
        .outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()

    out = spark.read.parquet(out_dir)
    latest = out.groupBy("user_id").agg(F.max("_epoch").alias("_epoch"))
    got = {
        r["user_id"]: (r["f_n"], r["f_total"])
        for r in out.join(latest, ["user_id", "_epoch"]).collect()
    }
    exp = {
        r["user_id"]: (r["n"], r["t"])
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0], k
        assert abs(got[k][1] - exp[k][1]) < 1e-6, k


@needs_protobuf
def test_tws_dedup_first_seen_across_batches(rocksdb, tmp_path):
    spark = rocksdb
    docs = read_table(spark, SF, "documents")
    keyed = docs.select(
        F.sha2(F.col("text"), 256).alias("dedup_key"), "doc_id"
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    # batch 1: half the corpus
    keyed.filter("doc_id < 250").coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        _drain(streaming_dedup_first_seen(stream), ckpt, out_dir, "append")

    run()
    n1 = spark.read.parquet(out_dir).count()
    exp1 = keyed.filter("doc_id < 250").select("dedup_key").distinct().count()
    assert n1 == exp1

    # batch 2: full corpus re-sent (every batch-1 key is a duplicate now)
    keyed.coalesce(1).write.mode("append").parquet(src)
    run()
    out = spark.read.parquet(out_dir)
    exp_all = keyed.select("dedup_key").distinct().count()
    assert out.count() == exp_all, "each distinct content emitted exactly once"
    assert out.select("dedup_key").distinct().count() == exp_all
    # first-seen = min doc_id per key over everything that arrived
    exp_min = {
        r["dedup_key"]: r["m"]
        for r in keyed.filter("doc_id < 250")
        .groupBy("dedup_key")
        .agg(F.min("doc_id").alias("m"))
        .collect()
    }
    got = {r["dedup_key"]: r["doc_id"] for r in out.collect()}
    for k, m in exp_min.items():
        assert got[k] == m, k


def test_tws_heavy_hitters_semantics_mock_handle():
    """SpaceSaving semantics against the mock handle: exact when K >=
    distinct tokens; bounded and conservative when capped."""
    from dbt_snowflake_feature_store_spark.streaming.stateful import (
        make_heavy_hitters_processor,
    )

    b1 = {"en": pd.DataFrame({"token": ["a", "a", "b", "c"]})}
    b2 = {"en": pd.DataFrame({"token": ["a", "b", "b", "b"]})}
    out = _replay(lambda: make_heavy_hitters_processor(k=16), [b1, b2])
    last = out[-1]
    got = dict(zip(last["f_token"], last["f_count"]))
    assert got == {"a": 3, "b": 4, "c": 1}
    assert list(last["f_token"]) == ["b", "a", "c"]  # count desc, token asc
    assert all(e == 0 for e in last["f_err"])  # K >= distinct -> exact

    # capped: k=2, 'z' dominates; summary never exceeds 2 counters and
    # every count is within its error bound of the truth
    tokens = ["z"] * 10 + ["a", "b", "c", "a", "z", "z"]
    b = {"en": pd.DataFrame({"token": tokens})}
    out = _replay(lambda: make_heavy_hitters_processor(k=2), [b])
    last = out[-1]
    assert len(last) == 2
    truth = {"z": 12, "a": 2, "b": 1, "c": 1}
    for tok, n, err in zip(last["f_token"], last["f_count"], last["f_err"]):
        assert n - err <= truth[tok] <= n, (tok, n, err)
    assert last["f_token"][0] == "z"  # the true heavy hitter surfaces


def test_tws_heavy_hitters_deterministic_across_replays():
    from dbt_snowflake_feature_store_spark.streaming.stateful import (
        make_heavy_hitters_processor,
    )

    b = {"en": pd.DataFrame({"token": ["d", "c", "b", "a", "e", "e"]})}
    a = _replay(lambda: make_heavy_hitters_processor(k=3), [b])
    bb = _replay(lambda: make_heavy_hitters_processor(k=3), [b])
    assert a[-1].equals(bb[-1])


@needs_protobuf
def test_tws_heavy_hitters_matches_batch(rocksdb, tmp_path):
    """End-to-end through the state server with K large enough to be
    exact: final summary equals the batch token counts per language."""
    from dbt_snowflake_feature_store_spark.streaming.stateful import (
        heavy_hitters_tws,
    )

    spark = rocksdb
    docs = read_table(spark, SF, "documents")
    toks = docs.select(
        F.col("lang").alias("group_key"),
        F.explode(F.split(F.trim("text"), r"\s+")).alias("token"),
    )
    src = str(tmp_path / "src")
    toks.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)

    out_dir = str(tmp_path / "out")
    epoch = {"n": 0}

    def sink(df, epoch_id):
        epoch["n"] += 1
        df.withColumn("_epoch", F.lit(epoch["n"])).write.mode("append").parquet(
            out_dir
        )

    q = (
        heavy_hitters_tws(stream, k=4096)
        .writeStream.trigger(availableNow=True)
        .outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()

    out = spark.read.parquet(out_dir)
    latest = out.groupBy("group_key").agg(F.max("_epoch").alias("_epoch"))
    got = {
        (r["group_key"], r["f_token"]): r["f_count"]
        for r in out.join(latest, ["group_key", "_epoch"]).collect()
    }
    exp = {
        (r["group_key"], r["token"]): r["n"]
        for r in toks.groupBy("group_key", "token")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == exp


def test_tws_running_quantiles_semantics_mock_handle():
    """Exactness when k covers the history; bounded sample otherwise;
    insensitive to batch boundaries."""
    from dbt_snowflake_feature_store_spark.streaming.stateful import (
        make_running_quantiles_processor,
    )

    vals = [5.0, 1.0, 9.0, 3.0, 7.0, 2.0, 8.0, 4.0, 6.0]
    b1 = {7: pd.DataFrame({"event_id": range(5), "value": vals[:5]})}
    b2 = {7: pd.DataFrame({"event_id": range(5, 9), "value": vals[5:]})}
    out = _replay(lambda: make_running_quantiles_processor(k=64), [b1, b2])
    last = out[-1]
    assert int(last["f_n"][0]) == 9 and int(last["f_sampled"][0]) == 9
    # exact 'lower' quantiles of 1..9
    assert float(last["f_p50"][0]) == 5.0
    assert float(last["f_p25"][0]) == 3.0
    assert float(last["f_p75"][0]) == 7.0

    # same data in ONE batch -> identical emission (batching invariance)
    b = {7: pd.DataFrame({"event_id": range(9), "value": vals})}
    one = _replay(lambda: make_running_quantiles_processor(k=64), [b])[-1]
    assert one.equals(last)

    # capped: sample never exceeds k, n keeps counting
    capped = _replay(lambda: make_running_quantiles_processor(k=4), [b1, b2])[-1]
    assert int(capped["f_sampled"][0]) == 4 and int(capped["f_n"][0]) == 9


@needs_protobuf
def test_tws_running_quantiles_matches_batch(rocksdb, tmp_path):
    """End-to-end through the state server with k large enough to be
    exact: final quantiles equal the batch recompute of the same
    'lower' sample-quantile definition."""
    from dbt_snowflake_feature_store_spark.streaming.stateful import (
        running_quantiles_tws,
    )

    spark = rocksdb
    ev = read_table(spark, SF, "events").select("user_id", "event_id", "value")
    src = str(tmp_path / "src")
    ev.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)

    out_dir = str(tmp_path / "out")
    epoch = {"n": 0}

    def sink(df, epoch_id):
        epoch["n"] += 1
        df.withColumn("_epoch", F.lit(epoch["n"])).write.mode("append").parquet(
            out_dir
        )

    q = (
        running_quantiles_tws(stream, k=100000)
        .writeStream.trigger(availableNow=True)
        .outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()

    out = spark.read.parquet(out_dir)
    latest = out.groupBy("user_id").agg(F.max("_epoch").alias("_epoch"))
    got = {
        r["user_id"]: (r["f_n"], r["f_p25"], r["f_p50"], r["f_p75"])
        for r in out.join(latest, ["user_id", "_epoch"]).collect()
    }
    pdf = ev.toPandas()
    for uid, grp in pdf.groupby("user_id"):
        vals = sorted(grp["value"])
        exp = tuple(
            vals[int(p * (len(vals) - 1))] for p in (0.25, 0.50, 0.75)
        )
        assert got[uid][0] == len(vals)
        assert got[uid][1:] == exp, uid


# ---------------------------------------------------------------------------
# decayed_value_tws: exponentially time-decayed running value
# ---------------------------------------------------------------------------

def _replay_decay(halflife_s, batches):
    from dbt_snowflake_feature_store_spark.streaming.stateful import (
        make_decayed_value_processor,
    )

    proc = make_decayed_value_processor(halflife_s)
    proc.init(_MockHandle())
    out = None
    for rows in batches:
        pdf = pd.DataFrame(rows, columns=["ts", "value"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        out = list(proc.handleInputRows((7,), iter([pdf]), None))[-1]
    return out


def test_decay_halflife_semantics():
    """One unit at t0, read at t0+halflife via a zero-value event: the
    first unit must weigh exactly 0.5."""
    out = _replay_decay(
        3600.0,
        [
            [("2024-01-01 00:00:00", 1.0)],
            [("2024-01-01 01:00:00", 0.0)],
        ],
    )
    assert out["f_decayed"][0] == pytest.approx(0.5)
    assert out["user_id"][0] == 7


def test_decay_batching_invariance():
    """The same event sequence folded as 1 batch vs 3 batches gives the
    same accumulator — state carries (last_ts, value) exactly."""
    events = [
        ("2024-01-01 00:00:00", 2.0),
        ("2024-01-01 00:30:00", 1.0),
        ("2024-01-01 02:00:00", 4.0),
        ("2024-01-01 02:00:00", 0.5),  # exact tie: value order stable
        ("2024-01-01 03:15:00", 1.5),
    ]
    one = _replay_decay(3600.0, [events])
    three = _replay_decay(3600.0, [events[:2], events[2:4], events[4:]])
    assert one["f_decayed"][0] == pytest.approx(three["f_decayed"][0], rel=1e-12)
    assert one["f_last_ts"][0] == three["f_last_ts"][0]


def test_decay_matches_closed_form():
    """Fold == the closed form Σ vᵢ·2^(−(T−tᵢ)/hl) at the last event."""
    import datetime as dt

    events = [
        ("2024-01-01 00:00:00", 3.0),
        ("2024-01-01 00:45:00", 2.0),
        ("2024-01-01 01:30:00", 5.0),
    ]
    out = _replay_decay(1800.0, [events])
    T = dt.datetime(2024, 1, 1, 1, 30)
    expect = sum(
        v * 2 ** (-(T - dt.datetime.fromisoformat(t)).total_seconds() / 1800.0)
        for t, v in events
    )
    assert out["f_decayed"][0] == pytest.approx(expect, rel=1e-12)


def test_decay_plan_constructs(spark):
    from dbt_snowflake_feature_store_spark.streaming.stateful import (
        decayed_value_tws,
    )

    ev = read_table(spark, SF, "events").select("user_id", "ts", "value")
    df = decayed_value_tws(ev, halflife_s=3600.0)
    assert [f.name for f in df.schema.fields] == [
        "user_id", "f_decayed", "f_last_ts",
    ]
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "TransformWithStateInPySpark" in plan
    assert "Update" in plan and "NoTime" in plan


def test_decay_ancient_late_row_no_overflow():
    """A late row thousands of half-lives old must fold in as ~0 weight
    (discounted to the reference time), never OverflowError."""
    out = _replay_decay(
        3600.0,
        [
            [("2024-06-01 00:00:00", 5.0)],
            [("2014-01-01 00:00:00", 100.0)],  # ~10 years late
        ],
    )
    assert out["f_decayed"][0] == pytest.approx(5.0)
    # reference time unchanged by the late row
    assert str(out["f_last_ts"][0]).startswith("2024-06-01")


def test_decay_late_row_equivalence():
    """Late-row discounting is algebraically the same fold: shuffling a
    mildly-late row across batches changes nothing."""
    ordered = _replay_decay(
        3600.0,
        [[("2024-01-01 00:00:00", 2.0), ("2024-01-01 01:00:00", 3.0)]],
    )
    late = _replay_decay(
        3600.0,
        [
            [("2024-01-01 01:00:00", 3.0)],
            [("2024-01-01 00:00:00", 2.0)],  # arrives after its successor
        ],
    )
    assert ordered["f_decayed"][0] == pytest.approx(late["f_decayed"][0])


def test_decay_batch_twin_parity(spark):
    """decayed_value_batch (backfill/bootstrap recompute) matches the
    streaming processor's fold per key over real events."""
    from dbt_snowflake_feature_store_spark.functions.features import (
        decayed_value_batch,
    )
    from dbt_snowflake_feature_store_spark.streaming.stateful import (
        make_decayed_value_processor,
    )

    ev = read_table(spark, SF, "events").select("user_id", "ts", "value")
    batch = {
        r["user_id"]: (r["f_decayed"], r["f_last_ts"])
        for r in decayed_value_batch(
            ev, "user_id", halflife_s=3600.0
        ).collect()
    }
    pdf = ev.toPandas()
    for uid, grp in list(pdf.groupby("user_id"))[:20]:
        proc = make_decayed_value_processor(3600.0)
        proc.init(_MockHandle())
        out = list(
            proc.handleInputRows((uid,), iter([grp[["ts", "value"]]]), None)
        )[-1]
        assert out["f_decayed"][0] == pytest.approx(
            batch[uid][0], rel=1e-12
        ), uid
        assert pd.Timestamp(batch[uid][1]) == out["f_last_ts"][0], uid
