"""Error types for the feature store engine.

Message shapes mirror the reference's user-facing errors so callers can
match on them (see /root/reference/macros/feature_store/
validate_entity_exists.sql:13-27 — "Entity 'X' not found ...").
"""

from __future__ import annotations


class FeatureStoreError(Exception):
    """Base class for all feature-store errors."""


class EntityNotFoundError(FeatureStoreError):
    def __init__(self, name: str, store: str = "Feature Store"):
        super().__init__(f"Entity '{name}' not found in {store}")
        self.entity_name = name


class FeatureViewNotFoundError(FeatureStoreError):
    def __init__(self, name: str, version: str | None = None):
        suffix = f" version '{version}'" if version else ""
        super().__init__(f"Feature view '{name}'{suffix} not found in Feature Store")
        self.feature_view_name = name
        self.version = version


class DatasetNotFoundError(FeatureStoreError):
    def __init__(self, name: str, version: str | None = None):
        suffix = f" version '{version}'" if version else ""
        super().__init__(f"Dataset '{name}'{suffix} not found in Feature Store")


class ValidationError(FeatureStoreError):
    """Invalid configuration (missing join_keys, bad version string, ...).

    Mirrors the reference's compile-time validation failures
    (/root/reference/macros/materializations/feature_view.sql:14-26,
    /root/reference/macros/materializations/entity.sql:3-9).
    """


class ConfigurationChangeError(FeatureStoreError):
    """Raised when on_configuration_change='fail' and the feature view
    definition changed (/root/reference/macros/materializations/
    feature_view.sql:172-174)."""
