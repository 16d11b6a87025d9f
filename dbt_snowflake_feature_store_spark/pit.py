"""Point-in-time (as-of) join — the one real algorithm in scope.

Semantics (the reference's ``generate_dataset`` contract,
/root/reference/integration_tests/python_tests/
test_feature_store_workflows.py:128-184): for each spine row, attach the
feature row with the greatest ``feature_ts <= spine_ts`` per entity key;
spine rows with no prior feature row get NULL features; every spine row is
preserved exactly once.

Spark has no native batch as-of join, so we provide two strategies and pick
by size:

``union`` (default, the 100 TB scale path)
    Tag spine and feature rows, ``unionByName``, then one window
    ``partitionBy(keys).orderBy(ts, is_spine)`` with
    ``last(feature_col, ignorenulls=True)`` carrying features forward onto
    spine rows. Cost: ONE shuffle on the entity keys, no join explosion —
    a key with f feature rows and s spine rows costs O(f+s), not O(f*s)
    like the join+filter formulation. Ties (feature_ts == spine_ts) are
    included because feature rows order before spine rows at equal ts.

``broadcast``
    When the feature side is small (a dimension-sized FV), a broadcast
    range-join + ``max_by`` grouped by spine row id avoids shuffling the
    (huge) spine twice. Used automatically when the feature side is below
    ``broadcast_threshold`` bytes (when statistics are available) or when
    requested explicitly.

Both are pure DataFrame compositions — Catalyst/AQE handle partition
coalescing and skew splitting (SURVEY.md §4.2-4.3).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .errors import ValidationError

_SPINE_ID = "__fs_spine_id"
_IS_SPINE = "__fs_is_spine"
_TS = "__fs_ts"


BROADCAST_THRESHOLD_BYTES = 10 * 1024 * 1024  # Spark's autoBroadcast default


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate for a plan (bytes), or None if
    unavailable. For a bare parquet scan this is file-size based, so it
    is the same signal Spark's own broadcast-join planning uses."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # pragma: no cover - py4j edge
        return None


def asof_join(
    spine: DataFrame,
    features: DataFrame,
    on: Sequence[str],
    spine_ts: str,
    feature_ts: str,
    feature_cols: Sequence[str] | None = None,
    strategy: str = "auto",
    tolerance: str | None = None,
    salt: int | None = None,
    broadcast_threshold: int = BROADCAST_THRESHOLD_BYTES,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every spine row + latest feature values at-or-before
    ``spine_ts`` (``direction='backward'``, the PIT default), earliest
    values at-or-after it (``direction='forward'`` — label lookahead /
    next-reading attachment), or whichever side is closer in time
    (``direction='nearest'`` — pandas ``merge_asof`` parity; equal
    distances prefer the backward row, so an exact-timestamp match
    always wins).

    Parameters
    ----------
    on : entity join keys (must exist on both sides).
    feature_cols : feature columns to attach; defaults to every feature
        column that is neither a key nor the feature timestamp.
    strategy : 'auto' (default) picks 'broadcast' when Catalyst's size
        estimate for the feature side is under ``broadcast_threshold``
        (dimension-sized FV → no shuffle of the spine at all), else
        'union' (single-shuffle scale path). Both can be forced.
    tolerance : optional max lookback (backward) / lookahead (forward) as
        an INTERVAL string (e.g. '30 days'); rows outside yield NULLs.
    direction : 'backward' (default) attaches the greatest
        ``feature_ts <= spine_ts``; 'forward' the smallest
        ``feature_ts >= spine_ts``. Both inclusive; both deterministic
        under exact (key, ts) ties (struct-hash tiebreak, identical row
        chosen by either strategy).
    salt : hot-key escape hatch for the union strategy. With ``salt=R``
        each spine row lands in one of R sub-partitions of its entity key
        while feature rows are replicated to all R — a pathological key's
        window splits across R tasks (AQE cannot split a running window).
        Results are identical for any R; cost is R× the feature rows of
        the salted window shuffle. Ignored by the broadcast strategy
        (joins after broadcast never shuffle on the key).
    """
    on = list(on)
    for k in on:
        if k not in spine.columns:
            raise ValidationError(f"as-of join key '{k}' missing from spine")
        if k not in features.columns:
            raise ValidationError(f"as-of join key '{k}' missing from features")
    if spine_ts not in spine.columns:
        raise ValidationError(f"spine timestamp '{spine_ts}' missing from spine")
    if feature_ts not in features.columns:
        raise ValidationError(f"feature timestamp '{feature_ts}' missing from features")

    if feature_cols is None:
        feature_cols = [c for c in features.columns if c not in on and c != feature_ts]
    feature_cols = list(feature_cols)

    if direction not in ("backward", "forward", "nearest"):
        raise ValidationError(f"Unknown as-of direction: {direction!r}")
    if direction == "nearest" and strategy == "broadcast":
        raise ValidationError(
            "as-of direction='nearest' is served by the union strategy "
            "(both direction candidates come out of ONE window pass; a "
            "broadcast range join would need an unbounded key-equality "
            "join to see both sides)"
        )

    if strategy == "auto":
        if direction == "nearest":
            strategy = "union"
        else:
            sz = _plan_size_bytes(features)
            strategy = (
                "broadcast"
                if sz is not None and 0 < sz <= broadcast_threshold
                else "union"
            )

    if strategy == "union":
        return _asof_union(
            spine, features, on, spine_ts, feature_ts, feature_cols, tolerance, salt,
            direction,
        )
    if strategy == "broadcast":
        return _asof_broadcast(
            spine, features, on, spine_ts, feature_ts, feature_cols, tolerance, direction
        )
    raise ValidationError(f"Unknown as-of strategy: {strategy!r}")


def _asof_union(
    spine: DataFrame,
    features: DataFrame,
    on: list[str],
    spine_ts: str,
    feature_ts: str,
    feature_cols: list[str],
    tolerance: str | None,
    salt: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    spine_cols = spine.columns

    # A feature row with NULL feature_ts can never satisfy "at-or-before"
    # or "at-or-after" (the broadcast strategy's range predicate is NULL →
    # no match), so drop it up front — otherwise it would sort at a frame
    # edge and the carry-forward could attach a timestampless row the
    # broadcast path never produces (the r5 ADVICE strategy-divergence).
    features = features.filter(F.col(feature_ts).isNotNull())

    # Deterministic spine identity is NOT required here: each spine row
    # passes through the union exactly once, so row multiplicity is
    # preserved structurally (the spine-row-count invariant the reference
    # asserts, test_feature_store_workflows.py:143, :178-183).
    tagged_spine = (
        spine.withColumn(_IS_SPINE, F.lit(1))
        .withColumn(_TS, F.col(spine_ts))
        .withColumn("__fs_row", F.lit(None))
    )

    # The feature payload travels as ONE struct so the carry-forward is
    # atomic: the join attaches a feature ROW, never a per-column mix.
    # Filling each column independently with last(ignorenulls) would
    # backfill NULL fields of the latest row from older rows —
    # synthesizing a feature row that never existed.
    feat_struct = F.struct(
        F.col(feature_ts).alias("__fs_row_ts"),
        *[F.col(c).alias(c) for c in feature_cols],
    )
    tagged_feat = features.select(
        *on,
        F.col(feature_ts).alias(_TS),
        feat_struct.alias("__fs_row"),
    ).withColumn(_IS_SPINE, F.lit(0))
    for c in spine_cols:
        if c not in on:
            tagged_feat = tagged_feat.withColumn(c, F.lit(None))

    part_keys: list[Column | str] = list(on)
    if salt is not None and salt > 1:
        # Hot-key split: each spine row hashes to one of `salt` sub-
        # partitions (deterministic — xxhash64 of the full row, no rand(),
        # safe under stage retry); every feature row is replicated to all
        # of them, so carry-forward within (key, salt) sees the complete
        # feature timeline. Output rows are independent of the salt value.
        _SALT = "__fs_salt"
        tagged_spine = tagged_spine.withColumn(
            _SALT,
            F.pmod(F.xxhash64(*[F.col(c) for c in spine_cols]), F.lit(salt)),
        )
        tagged_feat = tagged_feat.withColumn(
            _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<long>"))
        )
        part_keys.append(_SALT)
        unioned = tagged_spine.unionByName(tagged_feat.select(tagged_spine.columns))
    else:
        unioned = tagged_spine.unionByName(tagged_feat.select(tagged_spine.columns))

    # Feature rows (_IS_SPINE=0) sort BEFORE spine rows at equal ts →
    # fv.ts <= spine.ts inclusive semantics (backward; the forward
    # direction reverses the ts sort so the carry picks the EARLIEST
    # at-or-after row instead). Among duplicate feature timestamps per
    # key, the struct hash is the final tiebreak so the chosen row is
    # stable across runs/AQE reordering (which row of an exact (key, ts)
    # tie wins is engine-defined, but deterministic). The hash direction
    # flips with ts so both strategies pick the identical tied row
    # (backward: max ts, max hash ↔ max_by; forward: min ts, min hash ↔
    # min_by).
    # NULL-ts SPINE rows must see no features in either direction (the
    # broadcast range predicate is NULL → no match): asc() is nulls-first
    # already, and forward needs desc_nulls_first explicitly (plain desc()
    # is nulls-LAST — a NULL-ts spine row would sort after every feature
    # row and the carry would attach the earliest one).
    if direction == "nearest":
        # BOTH direction candidates out of the SAME sorted partition pass
        # (still one shuffle): the backward frame carries the latest
        # at-or-before row forward; the forward frame looks ahead to the
        # earliest strictly-after row (equal-ts features sort before the
        # spine row, so they are backward candidates at distance zero —
        # which nearest prefers anyway). Ties at equal nonzero distance
        # prefer backward (pandas merge_asof convention); distances are
        # compared as day-time INTERVALS — no epoch casts, no sub-second
        # precision loss.
        order = [
            F.col(_TS).asc(), F.col(_IS_SPINE).asc(), F.xxhash64("__fs_row").asc()
        ]
        w_b = (
            Window.partitionBy(*part_keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_f = (
            Window.partitionBy(*part_keys)
            .orderBy(*order)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        filled = unioned.withColumn(
            "__fs_back", F.last("__fs_row", ignorenulls=True).over(w_b)
        ).withColumn(
            "__fs_fwd", F.first("__fs_row", ignorenulls=True).over(w_f)
        )
        out = filled.filter(F.col(_IS_SPINE) == 1)
        st = F.col(spine_ts)
        b_ts = F.col("__fs_back.__fs_row_ts")
        f_ts = F.col("__fs_fwd.__fs_row_ts")
        b_d = st - b_ts
        f_d = f_ts - st
        valid_b = st.isNotNull() & b_ts.isNotNull()
        valid_f = st.isNotNull() & f_ts.isNotNull()
        if tolerance is not None:
            tol = F.expr(f"INTERVAL {tolerance}")
            valid_b = valid_b & (b_d <= tol)
            valid_f = valid_f & (f_d <= tol)
        use_b = valid_b & (~valid_f | (b_d <= f_d))
        chosen = F.when(use_b, F.col("__fs_back")).when(
            valid_f, F.col("__fs_fwd")
        )
        return out.select(
            *[F.col(c) for c in spine_cols],
            *[chosen.getField(c).alias(c) for c in feature_cols],
        )

    if direction == "backward":
        order = [
            F.col(_TS).asc(), F.col(_IS_SPINE).asc(), F.xxhash64("__fs_row").asc()
        ]
    else:
        order = [
            F.col(_TS).desc_nulls_first(),
            F.col(_IS_SPINE).asc(),
            F.xxhash64("__fs_row").desc(),
        ]
    w = (
        Window.partitionBy(*part_keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    filled = unioned.withColumn(
        "__fs_filled", F.last("__fs_row", ignorenulls=True).over(w)
    )

    out = filled.filter(F.col(_IS_SPINE) == 1)
    if tolerance is not None:
        if direction == "backward":
            within = F.col("__fs_filled.__fs_row_ts") >= F.col(spine_ts) - F.expr(
                f"INTERVAL {tolerance}"
            )
        else:
            within = F.col("__fs_filled.__fs_row_ts") <= F.col(spine_ts) + F.expr(
                f"INTERVAL {tolerance}"
            )
        sel: list[Column] = [
            F.when(within, F.col(f"__fs_filled.{c}")).alias(c)
            for c in feature_cols
        ]
    else:
        sel = [F.col(f"__fs_filled.{c}").alias(c) for c in feature_cols]
    return out.select(*[F.col(c) for c in spine_cols], *sel)


def asof_join_bracket(
    spine: DataFrame,
    features: DataFrame,
    on: Sequence[str],
    spine_ts: str,
    feature_ts: str,
    feature_cols: Sequence[str],
    back_suffix: str = "_prev",
    fwd_suffix: str = "_next",
    assert_unique: bool = False,
) -> DataFrame:
    """FUSED backward+forward as-of join (r17): for each spine row,
    attach BOTH the latest feature row at-or-before ``spine_ts`` and
    the earliest at-or-after it, per entity key, in ONE union shuffle —
    the interpolating as-of join's bracket, which two sequential
    ``asof_join`` passes would pay two entity-key shuffles for. Both
    direction candidates come out of one sorted window pass (the
    'nearest' machinery): the backward frame carries the latest
    at-or-before row forward; the forward frame looks ahead to the
    earliest strictly-after row; an exact-timestamp match is served by
    the backward frame (it IS the at-or-after row too).

    PRECONDITION: the feature side is UNIQUE per (key, feature_ts).
    With duplicates, the inclusive-forward row at an exact-timestamp tie
    would be the backward pass's hash-tiebreak pick rather than the
    forward pass's — the two sequential-pass spelling and this fused one
    agree only when (key, ts) has a single row, which every caller
    guarantees with a pre-aggregation (q_join_asof_interp collapses to
    max(value) per (user, ts)). Pass ``assert_unique=True`` to ENFORCE
    it at run time (ADVICE r17): a count window over (key, feature_ts)
    feeds ``assert_true``, so any duplicate fails the job loudly
    instead of silently diverging. Off by default — the check costs one
    extra exchange of the feature side, and the in-repo callers prove
    uniqueness by construction.

    Output: every spine column, then ``{c}{back_suffix}`` and
    ``{c}{fwd_suffix}`` for each feature column (NULL where that side
    has no row; a NULL spine_ts matches neither side, exactly as the
    sequential passes)."""
    on = list(on)
    feature_cols = list(feature_cols)
    for k in on:
        if k not in spine.columns:
            raise ValidationError(f"as-of join key '{k}' missing from spine")
        if k not in features.columns:
            raise ValidationError(f"as-of join key '{k}' missing from features")
    if spine_ts not in spine.columns:
        raise ValidationError(f"spine timestamp '{spine_ts}' missing from spine")
    if feature_ts not in features.columns:
        raise ValidationError(
            f"feature timestamp '{feature_ts}' missing from features"
        )
    spine_cols = spine.columns
    features = features.filter(F.col(feature_ts).isNotNull())
    if assert_unique:
        w_u = Window.partitionBy(*on, feature_ts)
        # spelled as a FILTER (assert_true returns NULL on success, so
        # isNull() keeps every valid row) — a dropped check column would
        # be pruned by the optimizer and never evaluated
        features = (
            features.withColumn(
                "__fs_dupcnt", F.count(F.lit(1)).over(w_u)
            )
            .where(
                F.assert_true(
                    F.col("__fs_dupcnt") == 1,
                    F.lit(
                        "asof_join_bracket: feature side must be unique "
                        f"per (key, {feature_ts}) — pre-aggregate "
                        "duplicates first"
                    ),
                ).isNull()
            )
            .drop("__fs_dupcnt")
        )
    tagged_spine = (
        spine.withColumn(_IS_SPINE, F.lit(1))
        .withColumn(_TS, F.col(spine_ts))
        .withColumn("__fs_row", F.lit(None))
    )
    feat_struct = F.struct(
        F.col(feature_ts).alias("__fs_row_ts"),
        *[F.col(c).alias(c) for c in feature_cols],
    )
    tagged_feat = features.select(
        *on,
        F.col(feature_ts).alias(_TS),
        feat_struct.alias("__fs_row"),
    ).withColumn(_IS_SPINE, F.lit(0))
    for c in spine_cols:
        if c not in on:
            tagged_feat = tagged_feat.withColumn(c, F.lit(None))
    unioned = tagged_spine.unionByName(tagged_feat.select(tagged_spine.columns))

    # ONE sort order serves both frames (the 'nearest' trick): feature
    # rows sort before spine rows at equal ts, so the backward frame is
    # inclusive and the forward frame strictly-after; NULL-ts spine rows
    # sort first (asc nulls-first) so their backward side is naturally
    # NULL and the forward side is masked below.
    order = [
        F.col(_TS).asc(), F.col(_IS_SPINE).asc(), F.xxhash64("__fs_row").asc()
    ]
    w_b = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = unioned.withColumn(
        "__fs_back", F.last("__fs_row", ignorenulls=True).over(w_b)
    ).withColumn(
        "__fs_fwd_strict", F.first("__fs_row", ignorenulls=True).over(w_f)
    )
    out = filled.filter(F.col(_IS_SPINE) == 1)
    st = F.col(spine_ts)
    back = F.col("__fs_back")
    # inclusive forward: an exact-ts feature row is the backward pick
    # (unique per (key, ts) by precondition); NULL spine_ts → no match
    fwd = (
        F.when(st.isNull(), F.lit(None))
        .when(back.getField("__fs_row_ts") == st, back)
        .otherwise(F.col("__fs_fwd_strict"))
    )
    return out.select(
        *[F.col(c) for c in spine_cols],
        *[back.getField(c).alias(f"{c}{back_suffix}") for c in feature_cols],
        *[fwd.getField(c).alias(f"{c}{fwd_suffix}") for c in feature_cols],
    )


def _asof_broadcast(
    spine: DataFrame,
    features: DataFrame,
    on: list[str],
    spine_ts: str,
    feature_ts: str,
    feature_cols: list[str],
    tolerance: str | None,
    direction: str = "backward",
) -> DataFrame:
    """Broadcast range-join + max_by (min_by forward): correct for any
    size but joins can explode when a key has many feature rows — reserve
    for small feature sides (Catalyst broadcasts, no shuffle of the
    spine)."""
    spine_cols = spine.columns
    sid = spine.withColumn(_SPINE_ID, F.monotonically_increasing_id())

    feat = features.select(
        *[F.col(k).alias(f"__fs_k_{k}") for k in on],
        F.col(feature_ts).alias(_TS),
        *[F.col(c).alias(f"__fs_f_{c}") for c in feature_cols],
    )

    cond = F.lit(True)
    for k in on:
        cond = cond & (F.col(k) == F.col(f"__fs_k_{k}"))
    if direction == "backward":
        cond = cond & (F.col(_TS) <= F.col(spine_ts))
        if tolerance is not None:
            cond = cond & (
                F.col(_TS) >= F.col(spine_ts) - F.expr(f"INTERVAL {tolerance}")
            )
    else:
        cond = cond & (F.col(_TS) >= F.col(spine_ts))
        if tolerance is not None:
            cond = cond & (
                F.col(_TS) <= F.col(spine_ts) + F.expr(f"INTERVAL {tolerance}")
            )

    joined = sid.join(F.broadcast(feat), cond, "left")

    # latest (earliest, forward) feature row per spine row: max_by/min_by
    # over the feature struct — a single hash aggregate, no global window.
    # The ordering key is (ts, struct hash) so exact-(key, ts) ties
    # resolve to the same row the union strategy picks (deterministic
    # across strategies/runs).
    feat_struct = F.struct(F.col(_TS), *[F.col(f"__fs_f_{c}") for c in feature_cols])
    order_key = F.when(
        F.col(_TS).isNotNull(),
        F.struct(F.col(_TS).alias("t"), F.xxhash64(feat_struct).alias("h")),
    )
    pick = F.max_by if direction == "backward" else F.min_by
    agg = (
        joined.groupBy(_SPINE_ID, *[F.col(c) for c in spine_cols])
        .agg(pick(feat_struct, order_key).alias("__fs_best"))
    )
    sel = [F.col(f"__fs_best.__fs_f_{c}").alias(c) for c in feature_cols]
    return agg.select(*spine_cols, *sel)
