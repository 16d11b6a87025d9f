"""Skew mitigation for hot join keys (SURVEY.md §4.3 / BASELINE north
star: "skewed keys hurt ... salting for skew").

First line of defense is AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on by default in session.py) —
it only helps sort-merge joins, post-shuffle. ``salted_left_join`` is the
explicit fallback for pathological fact⋈dim skew (one key = 30% of a
100 TB fact table): the fact side gets a random-but-deterministic salt in
[0, N), the dim side is replicated N×, and the join key becomes
(key, salt) — the hot key's rows spread over N reducers instead of one.

Correctness is unchanged for any join where the dim side is unique per
key (the replication factor cancels out by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__fs_salt"


def salted_left_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    num_salts: int = 16,
) -> DataFrame:
    """Left join fact⋈dim on ``on`` with an N-way salt. ``dim`` must be
    unique per key (dimension semantics). Deterministic: the salt is a
    hash of the full fact row's key columns + a per-row monotonic
    discriminator is avoided — we hash the key AND spread with
    ``spark_partition_id``-free pmod of xxhash64 over all fact columns."""
    # deterministic per-row salt: hash of every fact column (uniform,
    # reproducible — no rand() so re-execution of a failed stage is safe)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(num_salts))
    fact_s = fact.withColumn(_SALT, salt)

    salts = F.explode(
        F.sequence(F.lit(0), F.lit(num_salts - 1))
    ).alias(_SALT)
    dim_s = dim.select("*", salts)

    out = fact_s.join(dim_s, on=[*on, _SALT], how="left")
    return out.drop(_SALT)
