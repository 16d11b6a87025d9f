"""The local oracle canon must be TYPE-aware, not just value-aware.

Round-2 postmortem: three keys (q_text_stats, q_sample_split,
q_pack_sequences) were locally green but failed the driver's hash because
DuckDB ``SUM(BIGINT)`` returns HUGEINT (Arrow decimal128(38,0)) while the
Spark side returned BIGINT — identical printed values, different physical
type. These tests pin that the round-4 canon reproduces every failure in
that class locally."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest

from tests.oracle_utils import check_types, compare_query, types_compatible


def _arrow_type(sql: str) -> pa.DataType:
    tbl = duckdb.connect().execute(sql).fetch_arrow_table()
    return tbl.schema.field(0).type


class TestTypesCompatible:
    def test_hugeint_sum_is_flagged_against_bigint(self):
        """The exact round-2 failure: un-cast SUM(BIGINT) -> HUGEINT."""
        t = _arrow_type("SELECT SUM(x) AS s FROM (VALUES (1::BIGINT), (2::BIGINT)) v(x)")
        assert pa.types.is_decimal(t)  # DuckDB exports HUGEINT as decimal128(38,0)
        assert not types_compatible("bigint", t)

    def test_cast_sum_bigint_is_accepted(self):
        t = _arrow_type(
            "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (VALUES (1::BIGINT)) v(x)"
        )
        assert types_compatible("bigint", t)

    def test_length_bigint_vs_spark_int_ok(self):
        """Integer widths are canon-equivalent (str() identical)."""
        t = _arrow_type("SELECT LENGTH('abc') AS n")
        assert types_compatible("int", t) and types_compatible("bigint", t)

    def test_decimal_sum_flagged_against_double(self):
        """Un-descaled DECIMAL sum vs Spark DOUBLE: '1.500000' != '1.5'."""
        t = _arrow_type(
            "SELECT SUM(CAST(x AS DECIMAL(28,6))) AS s FROM (VALUES (1.5)) v(x)"
        )
        assert not types_compatible("double", t)

    def test_double_roundtrip_ok(self):
        t = _arrow_type(
            "SELECT CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS s"
            " FROM (VALUES (1.5)) v(x)"
        )
        assert types_compatible("double", t)

    def test_decimal_scale_must_match(self):
        t = _arrow_type("SELECT CAST(1.5 AS DECIMAL(10,2)) AS d")
        assert types_compatible("decimal(10,2)", t)
        assert types_compatible("decimal(28,2)", t)  # precision display-only
        assert not types_compatible("decimal(10,3)", t)

    def test_timestamp_and_date(self):
        assert types_compatible("timestamp", _arrow_type("SELECT now() AS t"))
        assert types_compatible("date", _arrow_type("SELECT current_date AS d"))
        assert not types_compatible("date", _arrow_type("SELECT now() AS t"))

    def test_array_element_type_recurses(self):
        t = _arrow_type("SELECT [1::BIGINT, 2::BIGINT] AS a")
        assert types_compatible("array<bigint>", t)
        assert not types_compatible("array<double>", t)


class TestCheckTypes:
    def test_check_types_reports_column(self, spark):
        sdf = spark.createDataFrame([(1, 1.5)], "f_n bigint, f_v double")
        schema = (
            duckdb.connect()
            .execute(
                "SELECT SUM(x) AS f_n, 1.5::DOUBLE AS f_v"
                " FROM (VALUES (1::BIGINT)) v(x)"
            )
            .fetch_arrow_table()
            .schema
        )
        problems = check_types(sdf, schema)
        assert len(problems) == 1 and problems[0].startswith("f_n")

    def test_compare_query_raises_on_hugeint(self, spark, sf_dir):
        """End-to-end: the round-2 bug shape now fails compare_query even
        though row counts and printed values agree."""
        sdf = spark.createDataFrame([(3,)], "f_total bigint")
        with pytest.raises(AssertionError, match="type mismatch"):
            compare_query(
                spark,
                sf_dir,
                sdf,
                "SELECT SUM(x) AS f_total FROM (VALUES (1::BIGINT), (2::BIGINT)) v(x)",
            )
