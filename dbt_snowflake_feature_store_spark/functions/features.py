"""Feature-engineering helpers whose exact forms don't scale.

``quantile_bucket`` is the 100 TB replacement for a GLOBAL ``ntile``:
exact n-tiles need a single-partition sort of the whole frame, while
bucket-by-threshold needs one tiny aggregate (the approximate quantile
sketch, driver-collected as `buckets-1` scalars — a parameter, not
data) and a row-local CASE. The trade is exactness at bucket
boundaries: rows within the sketch's rank error of a threshold may
land one bucket off; everything else matches the exact ntile
(tested in tests/test_features.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantile_bucket(
    df: DataFrame,
    col: str,
    buckets: int = 4,
    accuracy: int = 10000,
    ascending: bool = True,
) -> Column:
    """Column assigning each row a bucket 1..``buckets`` by the
    approximate quantile thresholds of ``col`` (bucket 1 = smallest
    values when ``ascending``, else largest — matching
    ``ntile(buckets) OVER (ORDER BY col [DESC])``).

    ``accuracy`` is Spark's percentile_approx knob: rank error is at
    most n/accuracy rows per threshold."""
    probs = [i / buckets for i in range(1, buckets)]
    row = df.agg(
        F.percentile_approx(col, probs, accuracy).alias("_t")
    ).collect()[0]
    thresholds = list(row["_t"])
    c = F.col(col)
    if not ascending:
        # mirror: bucket 1 holds the LARGEST values; STRICT comparisons
        # so a row sitting exactly on a threshold stays in the lower-
        # ranked bucket, matching ntile's row counting
        expr = F.when(c > F.lit(thresholds[-1]), 1)
        for i, th in enumerate(reversed(thresholds[:-1]), start=2):
            expr = expr.when(c > F.lit(th), i)
        return expr.otherwise(buckets)
    expr = F.when(c <= F.lit(thresholds[0]), 1)
    for i, th in enumerate(thresholds[1:], start=2):
        expr = expr.when(c <= F.lit(th), i)
    return expr.otherwise(buckets)
