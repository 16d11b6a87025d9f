"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship end-to-end slice on sf0.001 (SURVEY.md §7 Phase 0):
    register the customer entity + a behavioral feature view over orders
    (the README.md:160-167 aggregation shape), read it back through the
    feature store, and return the result."""
    from dbt_snowflake_feature_store_spark import Entity, FeatureStore, FeatureView
    from dbt_snowflake_feature_store_spark.sources import register_views

    register_views(spark, "/root/testdata/sf0.001")
    fs = FeatureStore(spark, tempfile.mkdtemp(prefix="fs_entry_"), name="ENTRY_FS")
    fs.register_entity(Entity("customer", ["o_custkey"], desc="Customer entity"))
    fv = FeatureView(
        "customer_order_features",
        entities=["customer"],
        sql="""
            SELECT o_custkey,
                   COUNT(*)           AS f_num_orders,
                   SUM(o_totalprice)  AS f_total_spent,
                   MAX(o_orderdate)   AS f_last_order_at
            FROM orders
            GROUP BY o_custkey
        """,
        desc="Behavioral order features per customer",
    )
    fs.register_feature_view(fv, version="1.0")
    return fs.read_feature_view("CUSTOMER_ORDER_FEATURES$1.0")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from dbt_snowflake_feature_store_spark.operators import registry as op_registry

    return op_registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each queries() key."""
    from dbt_snowflake_feature_store_spark.operators import registry as op_registry

    return op_registry.oracle_sql()
