"""Driver-literal DataFrames that plan audits can PROVE bounded.

PySpark ``spark.createDataFrame(local_rows, ...)`` always parallelizes
through an RDD, so the optimized logical plan shows ``LogicalRDD [...]``
— the same node a ``localCheckpoint`` lineage cut produces. A forced
``F.broadcast`` hint on such a frame is fine when the data is a literal
codebook / probe table / constant dim (fixed size by construction), but
the plan alone cannot distinguish that from a checkpointed
SF-proportional frame, so the registry-wide forced-broadcast sweep
(plans/inspect.py ``unbounded_forced_broadcasts``, tests/test_scale_plans.py)
would have to either trust every LogicalRDD (gate too weak — it would
have missed the r10 q_negative_sample / q_knn_classify quadratic weaks)
or flag every literal table (7 false positives).

``literal_df`` resolves this in-band: it stamps a ``_lit_bound`` marker
column INTO the literal rows, so the LogicalRDD node itself renders as
``LogicalRDD [_lit_bound#N, ...]`` and the plan labeler can classify the
hinted side as ``literal`` with zero allowlists. The marker is dropped
right above the scan (a zero-cost Project); only code paths that hold
the rows driver-side as Python literals can ever produce it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: First-column marker the plan labeler recognizes as "literal data".
LIT_MARKER = "_lit_bound"


def literal_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` for BOUNDED driver-side
    literal data (codebooks, constant dims, probe tables), with the
    ``_lit_bound`` audit marker embedded so forced-broadcast plan audits
    can verify the side is not SF-proportional. ``rows`` is a list of
    tuples; ``schema`` is a DDL string."""
    marked = [(1, *r) for r in rows]
    df = spark.createDataFrame(marked, f"{LIT_MARKER} INT, {schema}")
    return df.drop(LIT_MARKER)
