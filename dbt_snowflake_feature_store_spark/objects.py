"""First-class feature-store objects: Entity, FeatureView, Dataset.

Data model per SURVEY.md §1 / the reference:

- Entity is *pure metadata* — name + uppercased join keys + description
  (/root/reference/macros/materializations/entity.sql:23-34). It owns no
  rows.
- FeatureView is a versioned relation ``<NAME>$<version>`` that is either a
  lazily-evaluated view (static / "external") or a materialized, refreshed
  table (managed) (/root/reference/macros/materializations/
  feature_view.sql:36-43, :101-129, :183-195).
- Metadata canonical form: ``entities`` as a list of objects
  ``{"name": <UPPER>, "joinKeys": [<UPPER>, ...]}`` — the object form, which
  the reference's newest artifacts require (SURVEY.md §1.2;
  /root/reference/integration_tests/tests/
  test_feature_view_metadata_structure.sql:25-50;
  /root/reference/scripts/cleanup_old_metadata.py:70-85). ``timestamp_col``
  is the column name or the literal string ``"NULL"`` when absent
  (feature_view.sql:72-75).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Optional

from pyspark.sql import DataFrame

from .errors import ValidationError

PKG_VERSION = "1.0.0"  # mirrors var('fs_pkg_version') /root/reference/dbt_project.yml:14-16

_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def canonical_name(name: str) -> str:
    """Entity / FV names are uppercased everywhere in the reference
    (entity.sql:24-28, feature_view.sql:36, :67-70)."""
    if not name or not _IDENT_RE.match(name):
        raise ValidationError(f"Invalid identifier: {name!r}")
    return name.upper()


def logical_fv_name(name: str, version: str) -> str:
    """Logical API name — ``NAME$version`` (feature_view.sql:36-43)."""
    return f"{canonical_name(name)}${version}"


def physical_fv_name(name: str, version: str) -> str:
    """Physical (Spark-safe) name — ``$`` and ``.`` are hostile to Spark
    identifiers and file paths; canonical mapping is
    ``name__v<version with non-alnum → _>`` (SURVEY.md §1.3)."""
    safe_ver = re.sub(r"[^A-Za-z0-9]", "_", version)
    return f"{canonical_name(name)}__v{safe_ver}"


def parse_logical_fv_name(logical: str) -> tuple[str, str]:
    """Resolve ``NAME$1.0`` (and the Snowflake-mangled ``NAME$1_0``
    spelling — both appear in the reference's tests,
    test_feature_store_api.py:128, :178) to (name, version). The
    registry-key spelling ``name__v1_0`` is accepted too, so every
    identifier a user can observe (logical, mangled, physical) reads
    back the same FV; version-dot vs underscore is normalized at the
    registry-key layer (store._fv_key)."""
    if "$" in logical:
        name, ver = logical.split("$", 1)
        return canonical_name(name), ver
    # Physical spelling: split on the LAST __v marker, and only when the
    # remainder is VERSION-shaped (digit-led, as every physical_fv_name
    # suffix of a real version is) — an unversioned name that merely
    # contains '__v' mid-word ('events__volume') must keep raising the
    # not-versioned error, never silently resolve to a different FV.
    # Only the NAME is case-normalized; the version substring keeps its
    # case (physical_fv_name never case-folds versions).
    idx = logical.upper().rfind("__V")
    if idx > 0 and idx + 3 < len(logical):
        ver = logical[idx + 3 :]
        if re.fullmatch(r"[0-9][A-Za-z0-9_]*", ver):
            return canonical_name(logical[:idx]), ver
    raise ValidationError(f"Not a versioned feature-view name: {logical!r}")


@dataclass
class Entity:
    """Entity: join-key metadata only (entity.sql:23-34)."""

    name: str
    join_keys: list[str]
    desc: str = ""

    def __post_init__(self) -> None:
        if not self.join_keys:
            # mirrors required-config validation entity.sql:3-9
            raise ValidationError(
                f"Entity '{self.name}' requires at least one join key"
            )
        self.name = canonical_name(self.name)
        self.join_keys = [canonical_name(k) for k in self.join_keys]

    def to_doc(self) -> dict[str, Any]:
        return {
            "kind": "entity",
            "name": self.name,
            "join_keys": self.join_keys,
            "desc": self.desc,
        }

    @classmethod
    def from_doc(cls, doc: dict[str, Any]) -> "Entity":
        return cls(name=doc["name"], join_keys=doc["join_keys"], desc=doc.get("desc", ""))


@dataclass
class RefreshSpec:
    """Managed-FV refresh configuration — the Dynamic Table surface
    (feature_view.sql:101-129; /root/reference/README.md:224-237)."""

    refresh_freq: str  # target lag, e.g. '1 minute' — presence ⇒ managed
    refresh_mode: str = "AUTO"  # AUTO | FULL | INCREMENTAL
    initialize: str = "ON_CREATE"  # ON_CREATE | ON_SCHEDULE
    # Snowflake 'warehouse' analog (feature_view.sql:19-26, README.md:
    # 224-237): the compute pool the refresh runs in. Mapped to a Spark
    # FAIR-scheduler pool (spark.scheduler.pool local property) for the
    # duration of the refresh job — the closest Spark concept to routing
    # a Dynamic Table refresh to a named warehouse.
    warehouse: str | None = None

    def __post_init__(self) -> None:
        self.refresh_mode = self.refresh_mode.upper()
        self.initialize = self.initialize.upper()
        if self.refresh_mode not in ("AUTO", "FULL", "INCREMENTAL"):
            raise ValidationError(f"Invalid refresh_mode: {self.refresh_mode}")
        if self.initialize not in ("ON_CREATE", "ON_SCHEDULE"):
            raise ValidationError(f"Invalid initialize: {self.initialize}")

    def to_doc(self) -> dict[str, Any]:
        return {
            "refresh_freq": self.refresh_freq,
            "refresh_mode": self.refresh_mode,
            "initialize": self.initialize,
            "warehouse": self.warehouse,
        }

    @classmethod
    def from_doc(cls, doc: dict[str, Any] | None) -> Optional["RefreshSpec"]:
        if not doc:
            return None
        return cls(**doc)


@dataclass
class FeatureView:
    """A (possibly managed) versioned feature relation.

    ``sql`` is the canonical plan carrier (the reference stores the dbt-
    compiled SELECT body verbatim — feature_view.sql:126, :192); a
    DataFrame may be passed instead for session-scoped registration, in
    which case managed FVs still work cross-session (data is materialized)
    while static FVs are re-readable only in the registering session.
    """

    name: str
    entities: list[str] | list[Entity]
    sql: str | None = None
    df: DataFrame | None = None
    timestamp_col: str | None = None
    desc: str = ""
    refresh: RefreshSpec | None = None
    # Snowflake CLUSTER BY analog for managed FVs: materialize bucketed
    # on the entity join keys (``bucketBy(buckets, keys).sortBy(keys)``
    # + catalog table). Joins against the FV then shuffle ONLY the other
    # side — the FV-side Exchange disappears (SelectedBucketsCount scan).
    # Bucketed tables are rebuilt FULLY on refresh (incremental
    # maintenance of a bucketed layout needs a transactional format).
    buckets: int | None = None
    # Sorted-file layout for managed FVs (the lightweight half of
    # CLUSTER BY): materializations sort rows by these columns WITHIN
    # each written task/partition, so parquet row-group min/max stats
    # become tight and key-predicate reads skip row groups (data
    # skipping without a catalog table — composes with the `_fs_dt`
    # date partitioning). Unlike ``buckets`` this changes only file
    # layout, never the plan contract; incremental appends are not
    # re-sorted until ``compact()`` (which re-applies the sort).
    cluster_by: list[str] | None = None
    # filled on registration:
    version: str | None = None
    schema_json: str | None = None
    status: str = "DRAFT"  # DRAFT | ACTIVE (registered) | SUSPENDED (paused)
    fv_type: str | None = None  # EXTERNAL_FEATURE_VIEW | MANAGED_FEATURE_VIEW
    entity_docs: list[dict[str, Any]] = field(default_factory=list)

    def __post_init__(self) -> None:
        if self.sql is None and self.df is None:
            raise ValidationError(
                f"FeatureView '{self.name}' requires a sql body or a DataFrame"
            )
        self.name = canonical_name(self.name)
        if not self.entities:
            # required-config validation, feature_view.sql:14-26
            raise ValidationError(
                f"FeatureView '{self.name}' requires at least one entity"
            )
        if self.timestamp_col is not None:
            self.timestamp_col = canonical_name(self.timestamp_col)

    @property
    def is_managed(self) -> bool:
        """Presence of refresh_freq ⇒ dynamic-table (managed) FV
        (feature_view.sql:22)."""
        return self.refresh is not None

    @property
    def logical_name(self) -> str:
        return logical_fv_name(self.name, self.version or "?")

    @property
    def physical_name(self) -> str:
        return physical_fv_name(self.name, self.version or "?")

    @property
    def refresh_freq(self) -> str | None:
        return self.refresh.refresh_freq if self.refresh else None

    @property
    def refresh_mode(self) -> str | None:
        return self.refresh.refresh_mode if self.refresh else None

    def entity_names(self) -> list[str]:
        return [
            e.name if isinstance(e, Entity) else canonical_name(e)
            for e in self.entities
        ]

    def metadata_json(self) -> dict[str, Any]:
        """The SNOWML_FEATURE_VIEW_METADATA shape — canonical **object**
        entity form plus 'NULL'-string timestamp quirk (feature_view.sql:
        72-84; asserted test_metadata_compatibility.py:226-239)."""
        return {
            "entities": self.entity_docs
            or [{"name": n, "joinKeys": []} for n in self.entity_names()],
            "timestamp_col": self.timestamp_col if self.timestamp_col else "NULL",
        }

    def object_info_json(self) -> dict[str, Any]:
        """The SNOWML_FEATURE_STORE_OBJECT shape (feature_view.sql:77-83)."""
        return {
            "type": self.fv_type
            or ("MANAGED_FEATURE_VIEW" if self.is_managed else "EXTERNAL_FEATURE_VIEW"),
            "pkg_version": PKG_VERSION,
        }


@dataclass
class Dataset:
    """A generated training set, stored at
    ``<root>/datasets/<name>/<version>`` (SURVEY.md §1.1)."""

    name: str
    version: str
    path: str
    spine_timestamp_col: str | None
    spine_label_cols: list[str]
    feature_views: list[str]  # logical names NAME$version
    desc: str = ""
    _spark: Any = None

    @property
    def read(self) -> "DatasetReader":
        return DatasetReader(self)

    def export(
        self,
        path: str,
        format: str = "parquet",
        mode: str = "error",
        options: dict[str, str] | None = None,
        partition_by: list[str] | None = None,
    ) -> str:
        """Export the dataset to an external sink (parquet/csv/json/orc;
        any Spark DataSource). The training-consumer hand-off: write once
        to the downstream layout, optionally partitioned (e.g. by a date
        column for incremental trainer pickup). Returns the path."""
        writer = self.read.to_df().write.format(format).mode(mode)
        for k, v in (options or {}).items():
            writer = writer.option(k, v)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(path)
        return path

    def to_doc(self) -> dict[str, Any]:
        return {
            "kind": "dataset",
            "name": self.name,
            "version": self.version,
            "path": self.path,
            "spine_timestamp_col": self.spine_timestamp_col,
            "spine_label_cols": self.spine_label_cols,
            "feature_views": self.feature_views,
            "desc": self.desc,
        }

    @classmethod
    def from_doc(cls, doc: dict[str, Any], spark: Any = None) -> "Dataset":
        return cls(
            name=doc["name"],
            version=doc["version"],
            path=doc["path"],
            spine_timestamp_col=doc.get("spine_timestamp_col"),
            spine_label_cols=doc.get("spine_label_cols", []),
            feature_views=doc.get("feature_views", []),
            desc=doc.get("desc", ""),
            _spark=spark,
        )


class DatasetReader:
    """Mirrors the snowflake-ml ``dataset.read.to_pandas()`` surface
    (test_feature_store_workflows.py:140, :259)."""

    def __init__(self, ds: Dataset):
        self._ds = ds

    def to_df(self) -> DataFrame:
        # generate_dataset(save=False) keeps the join plan in memory
        # (ds._df) and writes nothing — reading the path would raise
        # path-not-found for a dataset the API just handed out
        if getattr(self._ds, "_df", None) is not None:
            return self._ds._df
        storage = getattr(self._ds, "_storage", None)
        if storage is not None:
            return storage.read(self._ds._spark, self._ds.path)
        return self._ds._spark.read.parquet(self._ds.path)

    def to_pandas(self):
        return self.to_df().toPandas()
