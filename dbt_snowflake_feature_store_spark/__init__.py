"""dbt_snowflake_feature_store_spark — a PySpark-native feature-store engine.

A brand-new engine with the query and data-processing capabilities of
``sfc-gh-rsureshbabu/dbt-snowflake-feature-store`` (a dbt package that
creates Snowflake Feature Store objects), re-expressed Spark-first:
DataFrame/SQL plans optimized by Catalyst, Parquet storage, Structured
Streaming for incremental materialization. See SURVEY.md for the full
blueprint and reference citations.
"""

from .errors import (
    ConfigurationChangeError,
    DatasetNotFoundError,
    EntityNotFoundError,
    FeatureStoreError,
    FeatureViewNotFoundError,
    ValidationError,
)
from .functions.profile import profile
from .models import (
    build_project,
    check_source_freshness,
    evaluate_metric,
    evaluate_saved_query,
    export_saved_query,
    read_saved_export,
    project_vars,
    export_catalog,
    export_manifest,
    load_exposures,
    load_project,
    load_dbt_project_yml,
    load_selectors_yml,
    run_model_contracts,
    run_operation,
    load_semantic_layer,
    run_data_tests,
    run_schema_tests,
    run_unit_tests,
    select_nodes,
)
from .snapshots import read_snapshot, run_snapshots
from .objects import Dataset, Entity, FeatureView, RefreshSpec
from .pit import asof_join
from .session import get_spark
from .store import FeatureStore

# keep in lockstep with pyproject.toml [project] version.
# 1.13.0: the major resumes the pre-r12 1.x line (r12 briefly reset to
# 0.12.0, which would sort OLDER than an installed 1.0.0 and break >=
# upgrade constraints — ADVICE r12 #5); the minor tracks the build round.
__version__ = "1.14.0"

__all__ = [
    "FeatureStore",
    "Entity",
    "FeatureView",
    "RefreshSpec",
    "Dataset",
    "asof_join",
    "profile",
    "get_spark",
    "load_project",
    "build_project",
    "check_source_freshness",
    "evaluate_metric",
    "evaluate_saved_query",
    "export_saved_query",
    "read_saved_export",
    "project_vars",
    "export_catalog",
    "export_manifest",
    "load_exposures",
    "load_dbt_project_yml",
    "load_selectors_yml",
    "run_model_contracts",
    "run_operation",
    "load_semantic_layer",
    "run_data_tests",
    "run_schema_tests",
    "run_unit_tests",
    "select_nodes",
    "run_snapshots",
    "read_snapshot",
    "FeatureStoreError",
    "EntityNotFoundError",
    "FeatureViewNotFoundError",
    "DatasetNotFoundError",
    "ValidationError",
    "ConfigurationChangeError",
]
