"""Round-16 dbt front-end features and ADVICE-r15 regression pins:

- model ``tags:`` config + ``tag:`` / ``path:`` selector methods
  (select= atoms AND selectors.yml method spellings) — dbt's everyday
  selection idiom (VERDICT-r15 #3);
- slim-CI ``state:modified`` sub-selectors ``.body`` / ``.configs`` /
  ``.contract`` (dbt 1.5 — VERDICT-r15 #4);
- local-path ``packages.yml`` macro packages with dbt's
  project-shadows-package precedence (VERDICT-r15 #5);
- ADVICE-r15 regressions: build_project scoping under a selectors.yml
  default selector, multi-entry test-paths/snapshot-paths honored by
  every consumer, configured custom-named dirs pruned from the model
  walk, numeric exponent literals in templated conversion filters,
  global_drawup_scan on all-NULL partitions.
"""

from __future__ import annotations

import os

import pytest

from dbt_snowflake_feature_store_spark import ValidationError, load_project
from dbt_snowflake_feature_store_spark.models import (
    build_project,
    export_manifest,
    run_data_tests,
    run_operation,
)

ENTITY = """\
{{
  config(
    materialized='entity',
    join_keys=['customer_id'],
    desc='r16 entity'
  )
}}

SELECT 1 WHERE FALSE
"""

FV_A = """\
{{
  config(
    materialized='feature_view',
    entities=['ent_cust'],
    feature_view_version='1.0',
    timestamp_col='updated_at',
    tags=['nightly', 'core'],
    desc='tagged base fv'
  )
}}

SELECT 1 AS customer_id, CURRENT_TIMESTAMP() AS updated_at, 10 AS f1
"""

FV_B = """\
{{
  config(
    materialized='feature_view',
    entities=['ent_cust'],
    feature_view_version='1.0',
    timestamp_col='updated_at',
    tags='daily',
    desc='derived fv'
  )
}}

SELECT customer_id, updated_at, f1 * 2 AS f2 FROM {{ ref('fv_a') }}
"""


def _proj(tmp_path) -> str:
    proj = tmp_path / "proj"
    (proj / "staging").mkdir(parents=True)
    (proj / "marts").mkdir()
    (proj / "ent_cust.sql").write_text(ENTITY)
    (proj / "staging" / "fv_a.sql").write_text(FV_A)
    (proj / "marts" / "fv_b.sql").write_text(FV_B)
    return str(proj)


class TestTagPathSelectors:
    def test_tag_atom_matches_config_tags(self, fs, tmp_path):
        proj = _proj(tmp_path)
        got = load_project(fs, proj, select=["tag:nightly"], dry_run=True)["selected"]
        assert got == load_project(fs, proj, select=["fv_a"], dry_run=True)["selected"]
        # a bare-string tags: config matches too
        got = load_project(fs, proj, select=["tag:daily"], dry_run=True)["selected"]
        assert got == ["FV_B"]

    def test_tag_affixes_and_exclude_compose(self, fs, tmp_path):
        proj = _proj(tmp_path)
        # +tag:daily pulls fv_b's ancestors (fv_a and the entity)
        up = load_project(fs, proj, select=["+tag:daily"], dry_run=True)["selected"]
        assert up == ["ENT_CUST", "FV_A", "FV_B"]
        # tag:nightly+ = fv_a and everything downstream, minus exclude
        down = load_project(
            fs, proj, select=["tag:nightly+"], exclude=["fv_b"],
            dry_run=True,
        )["selected"]
        assert down == ["FV_A"]

    def test_unknown_tag_refuses_loudly(self, fs, tmp_path):
        proj = _proj(tmp_path)
        with pytest.raises(ValidationError, match="tags"):
            load_project(fs, proj, select=["tag:nope"], dry_run=True)

    def test_bad_tags_config_shape_refuses(self, fs, tmp_path):
        proj = tmp_path / "badtags"
        proj.mkdir()
        (proj / "m.sql").write_text(
            FV_A.replace("tags=['nightly', 'core']", "tags=7")
            .replace("entities=['ent_cust']", "entities=['e']")
        )
        with pytest.raises(ValidationError, match="tags"):
            load_project(fs, str(proj), dry_run=True)

    def test_path_selects_by_dir_file_and_glob(self, fs, tmp_path):
        proj = _proj(tmp_path)
        assert load_project(
            fs, proj, select=["path:staging"], dry_run=True
        )["selected"] == ["FV_A"]
        assert load_project(
            fs, proj, select=["path:marts/fv_b.sql"], dry_run=True
        )["selected"] == ["FV_B"]
        assert sorted(
            load_project(fs, proj, select=["path:*/fv_*.sql"], dry_run=True)["selected"]
        ) == ["FV_A", "FV_B"]
        with pytest.raises(ValidationError, match="path"):
            load_project(fs, proj, select=["path:nowhere"], dry_run=True)

    def test_selectors_yml_tag_and_path_methods(self, fs, tmp_path):
        proj = _proj(tmp_path)
        with open(os.path.join(proj, "selectors.yml"), "w") as f:
            f.write(
                "selectors:\n"
                "  - name: nightly_up\n"
                "    definition:\n"
                "      method: tag\n"
                "      value: nightly\n"
                "      parents: true\n"
                "  - name: staging_tree\n"
                "    definition:\n"
                "      union:\n"
                "        - method: path\n"
                "          value: staging\n"
                "          children: true\n"
                "        - exclude:\n"
                "            - tag:daily\n"
            )
        a = load_project(fs, proj, selector="nightly_up", dry_run=True)["selected"]
        assert a == load_project(fs, proj, select=["+fv_a"], dry_run=True)["selected"]
        b = load_project(fs, proj, selector="staging_tree", dry_run=True)["selected"]
        assert b == ["FV_A"]  # fv_b excluded by its tag

    def test_unknown_method_still_refuses(self, fs, tmp_path):
        proj = _proj(tmp_path)
        with open(os.path.join(proj, "selectors.yml"), "w") as f:
            f.write(
                "selectors:\n  - name: s\n    definition:\n"
                "      method: package\n      value: x\n"
            )
        with pytest.raises(ValidationError, match="not supported"):
            load_project(fs, proj, selector="s", dry_run=True)


CONTRACT_YML = """\
models:
  - name: fv_a
    config:
      contract:
        enforced: true
    columns:
      - name: customer_id
        data_type: int
      - name: updated_at
        data_type: timestamp
      - name: f1
        data_type: int
"""


class TestStateModifiedSubSelectors:
    def _manifest(self, fs, proj):
        return export_manifest(fs, proj)

    def test_config_only_change_selects_configs_not_body(
        self, fs, tmp_path
    ):
        proj = _proj(tmp_path)
        man = self._manifest(fs, proj)
        # config-only edit: change the desc
        p = os.path.join(proj, "staging", "fv_a.sql")
        with open(p) as f:
            txt = f.read()
        with open(p, "w") as f:
            f.write(txt.replace("tagged base fv", "retagged"))
        got_cfg = load_project(
            fs, proj, select=["state:modified.configs"], state=man,
            dry_run=True,
        )["selected"]
        assert got_cfg == ["FV_A"]
        got_body = load_project(
            fs, proj, select=["state:modified.body"], state=man,
            dry_run=True,
        )
        assert got_body["selected"] == []
        # the coarse selector still catches it (raw checksum changed)
        assert load_project(
            fs, proj, select=["state:modified"], state=man, dry_run=True
        )["selected"] == ["FV_A"]

    def test_body_only_change_selects_body_not_configs(
        self, fs, tmp_path
    ):
        proj = _proj(tmp_path)
        man = self._manifest(fs, proj)
        p = os.path.join(proj, "marts", "fv_b.sql")
        with open(p) as f:
            txt = f.read()
        with open(p, "w") as f:
            f.write(txt.replace("f1 * 2", "f1 * 3"))
        assert load_project(
            fs, proj, select=["state:modified.body"], state=man,
            dry_run=True,
        )["selected"] == ["FV_B"]
        assert load_project(
            fs, proj, select=["state:modified.configs"], state=man,
            dry_run=True,
        )["selected"] == []

    def test_contract_change_selects_contract_only(self, fs, tmp_path):
        proj = _proj(tmp_path)
        with open(os.path.join(proj, "schema.yml"), "w") as f:
            f.write(CONTRACT_YML)
        man = self._manifest(fs, proj)
        assert "contract_checksum" in man["nodes"]["model.project.fv_a"]
        assert "contract_checksum" not in man["nodes"][
            "model.project.fv_b"
        ]
        # no change at all: nothing selected under any sub-method
        for sub in (".body", ".configs", ".contract"):
            assert load_project(
                fs, proj, select=[f"state:modified{sub}"], state=man,
                dry_run=True,
            )["selected"] == []
        # widen a declared type → contract modified; body/configs not
        with open(os.path.join(proj, "schema.yml"), "w") as f:
            f.write(CONTRACT_YML.replace(
                "name: f1\n        data_type: int",
                "name: f1\n        data_type: bigint",
            ))
        assert load_project(
            fs, proj, select=["state:modified.contract"], state=man,
            dry_run=True,
        )["selected"] == ["FV_A"]
        assert load_project(
            fs, proj, select=["state:modified.body"], state=man,
            dry_run=True,
        )["selected"] == []

    def test_new_model_counts_modified_for_every_sub(self, fs, tmp_path):
        proj = _proj(tmp_path)
        man = self._manifest(fs, proj)
        (tmp_path / "proj" / "marts" / "fv_c.sql").write_text(
            FV_B.replace("fv_b", "fv_c").replace(
                "{{ ref('fv_a') }}", "{{ ref('fv_b') }}"
            )
        )
        for sub in ("", ".body", ".configs", ".contract"):
            assert load_project(
                fs, proj, select=[f"state:modified{sub}"], state=man,
                dry_run=True,
            )["selected"] == ["FV_C"]

    def test_unknown_state_sub_method_refuses(self, fs, tmp_path):
        proj = _proj(tmp_path)
        man = self._manifest(fs, proj)
        with pytest.raises(ValidationError, match="unknown state"):
            load_project(
                fs, proj, select=["state:modified.nope"], state=man,
                dry_run=True,
            )


class TestDefaultSelectorScopesBuild:
    """ADVICE-r15 #1: a selectors.yml `default: true` selector applied
    with NO flags must scope build_project's downstream phases (the
    resolved subset), not leave contracts/tests running unscoped."""

    def test_contract_on_unselected_model_is_skipped(
        self, fs, tmp_path
    ):
        proj = _proj(tmp_path)
        with open(os.path.join(proj, "selectors.yml"), "w") as f:
            f.write(
                "selectors:\n"
                "  - name: a_only\n"
                "    default: true\n"
                "    definition: '+fv_a'\n"
            )
        # an enforced contract on fv_b, which the default selector
        # does NOT select — pre-fix this raised (fv_b unregistered)
        with open(os.path.join(proj, "schema.yml"), "w") as f:
            f.write(
                "models:\n"
                "  - name: fv_b\n"
                "    config:\n"
                "      contract:\n"
                "        enforced: true\n"
                "    columns:\n"
                "      - name: customer_id\n"
                "        data_type: int\n"
                "      - name: updated_at\n"
                "        data_type: timestamp\n"
                "      - name: f2\n"
                "        data_type: int\n"
            )
        rep = build_project(fs, proj)
        assert rep["models"]["selected"] == ["ENT_CUST", "FV_A"]
        assert rep["contracts"] == []  # fv_b's contract out of scope
        # an explicit full-project build still enforces it
        rep2 = build_project(fs, proj, select=["+fv_b"])
        assert [r["model"] for r in rep2["contracts"]] == ["FV_B"]


class TestMultiEntryPathConfigs:
    """ADVICE-r15 #2: every configured test-paths / snapshot-paths
    entry is honored by run_data_tests, build_project, manifest export
    and the unit-test fixture lookup — not just the first."""

    def _proj_two_test_dirs(self, fs, tmp_path):
        proj = _proj(tmp_path)
        with open(os.path.join(proj, "dbt_project.yml"), "w") as f:
            f.write("name: r16\ntest-paths: ['t1', 't2']\n")
        os.makedirs(os.path.join(proj, "t1"))
        os.makedirs(os.path.join(proj, "t2"))
        with open(os.path.join(proj, "t1", "first_ok.sql"), "w") as f:
            f.write("SELECT * FROM {{ ref('fv_a') }} WHERE f1 < 0\n")
        with open(os.path.join(proj, "t2", "second_ok.sql"), "w") as f:
            f.write(
                "SELECT * FROM {{ ref('fv_b') }} WHERE f2 < 0\n"
            )
        return proj

    def test_run_data_tests_runs_all_entries(self, fs, tmp_path):
        proj = self._proj_two_test_dirs(fs, tmp_path)
        load_project(fs, proj)
        names = sorted(r["name"] for r in run_data_tests(fs, proj))
        assert names == ["first_ok", "second_ok"]
        man = export_manifest(fs, proj)
        assert "test.project.first_ok" in man["nodes"]
        assert "test.project.second_ok" in man["nodes"]

    def test_build_project_sees_second_entry_only(self, fs, tmp_path):
        proj = _proj(tmp_path)
        with open(os.path.join(proj, "dbt_project.yml"), "w") as f:
            f.write("name: r16\ntest-paths: ['t1', 't2']\n")
        os.makedirs(os.path.join(proj, "t1"))  # empty first dir
        os.makedirs(os.path.join(proj, "t2"))
        with open(os.path.join(proj, "t2", "only_here.sql"), "w") as f:
            f.write("SELECT * FROM {{ ref('fv_a') }} WHERE f1 < 0\n")
        rep = build_project(fs, proj)
        assert [r["name"] for r in rep["data_tests"]] == ["only_here"]

    def test_snapshot_paths_all_entries_run(self, fs, spark, tmp_path):
        from dbt_snowflake_feature_store_spark.snapshots import (
            run_snapshots,
        )

        proj = _proj(tmp_path)
        with open(os.path.join(proj, "dbt_project.yml"), "w") as f:
            f.write("name: r16\nsnapshot-paths: ['s1', 's2']\n")
        src = str(tmp_path / "snap_src")
        spark.createDataFrame(
            [(1, "gold", "2024-01-01 00:00:00")],
            schema="cid int, tier string, updated_at string",
        ).selectExpr(
            "cid", "tier", "CAST(updated_at AS timestamp) updated_at"
        ).write.mode("overwrite").parquet(src)
        fs.register_source("snap_src", src)
        snap = (
            "{%% snapshot %s %%}\n"
            "{{ config(strategy='timestamp', unique_key='cid', "
            "updated_at='updated_at') }}\n"
            "SELECT cid, tier, updated_at FROM {{ source('raw', 'snap_src') }}\n"
            "{%% endsnapshot %%}\n"
        )
        os.makedirs(os.path.join(proj, "s1"))
        os.makedirs(os.path.join(proj, "s2"))
        with open(os.path.join(proj, "s1", "a.sql"), "w") as f:
            f.write(snap % "snap_one")
        with open(os.path.join(proj, "s2", "b.sql"), "w") as f:
            f.write(snap % "snap_two")
        rep = run_snapshots(fs, proj)
        assert sorted(rep) == ["SNAP_ONE", "SNAP_TWO"]
        man = export_manifest(fs, proj)
        assert "snapshot.project.snap_one" in man["nodes"]
        assert "snapshot.project.snap_two" in man["nodes"]

    def test_fixture_found_in_second_test_path(self, fs, tmp_path):
        from dbt_snowflake_feature_store_spark.models import (
            run_unit_tests,
        )

        proj = _proj(tmp_path)
        with open(os.path.join(proj, "dbt_project.yml"), "w") as f:
            f.write("name: r16\ntest-paths: ['t1', 't2']\n")
        os.makedirs(os.path.join(proj, "t1"))
        os.makedirs(os.path.join(proj, "t2", "fixtures"))
        with open(
            os.path.join(proj, "t2", "fixtures", "exp.csv"), "w"
        ) as f:
            f.write("customer_id,f2\n1,20\n")
        with open(os.path.join(proj, "unit.yml"), "w") as f:
            f.write(
                "unit_tests:\n"
                "  - name: ut_b\n"
                "    model: fv_b\n"
                "    given:\n"
                "      - input: ref('fv_a')\n"
                "        rows:\n"
                "          - {customer_id: 1, f1: 10}\n"
                "    expect:\n"
                "      format: csv\n"
                "      fixture: exp\n"
            )
        load_project(fs, proj)
        res = run_unit_tests(fs, proj)
        assert [r["name"] for r in res] == ["ut_b"]
        assert res[0]["passed"], res[0]

    def test_custom_named_config_dirs_pruned_from_model_walk(
        self, fs, tmp_path
    ):
        """ADVICE-r15 #3: a bare-tree project whose dbt_project.yml
        names custom test/snapshot dirs must not parse their .sql as
        models (config-less test SQL used to become a phantom-model
        parse error)."""
        proj = _proj(tmp_path)
        with open(os.path.join(proj, "dbt_project.yml"), "w") as f:
            f.write(
                "name: r16\ntest-paths: ['qa_tests']\n"
                "snapshot-paths: ['snaps']\n"
            )
        os.makedirs(os.path.join(proj, "qa_tests"))
        os.makedirs(os.path.join(proj, "snaps"))
        with open(os.path.join(proj, "qa_tests", "q.sql"), "w") as f:
            f.write("SELECT * FROM {{ ref('fv_a') }} WHERE f1 < 0\n")
        with open(os.path.join(proj, "snaps", "s.sql"), "w") as f:
            f.write(
                "{% snapshot snp %}\n{{ config(strategy='timestamp',"
                " unique_key='cid', updated_at='u') }}\n"
                "SELECT 1 AS cid\n{% endsnapshot %}\n"
            )
        rep = load_project(fs, proj)
        assert sorted(n for n, _v in rep["feature_views"]) == [
            "FV_A", "FV_B",
        ]
        names = sorted(r["name"] for r in run_data_tests(fs, proj))
        assert names == ["q"]


PKG_MACRO = """\
{% macro greet(tag) -%}
SELECT '{{ tag }}' AS tag, 'package' AS origin
{%- endmacro %}

{% macro pkg_only() -%}
SELECT 1 AS one
{%- endmacro %}
"""

PROJ_MACRO = """\
{% macro greet(tag) -%}
SELECT '{{ tag }}' AS tag, 'project' AS origin
{%- endmacro %}
"""


class TestLocalPackages:
    def _pkg(self, tmp_path, name="pkg_a", macro=PKG_MACRO):
        pkg = tmp_path / name
        (pkg / "macros").mkdir(parents=True)
        (pkg / "dbt_project.yml").write_text(f"name: {name}\n")
        (pkg / "macros" / "m.sql").write_text(macro)
        return pkg

    def test_package_macro_renders_via_run_operation(
        self, fs, tmp_path
    ):
        proj = _proj(tmp_path)
        self._pkg(tmp_path)
        with open(os.path.join(proj, "packages.yml"), "w") as f:
            f.write("packages:\n  - local: ../pkg_a\n")
        load_project(fs, proj)
        rep = run_operation(
            fs, proj, "pkg_only", execute=True
        )
        assert len(rep["rows"]) == 1 and rep["rows"][0]["one"] == 1

    def test_project_macro_shadows_package_macro(self, fs, tmp_path):
        proj = _proj(tmp_path)
        self._pkg(tmp_path)
        os.makedirs(os.path.join(proj, "macros"))
        with open(os.path.join(proj, "macros", "m.sql"), "w") as f:
            f.write(PROJ_MACRO)
        with open(os.path.join(proj, "packages.yml"), "w") as f:
            f.write("packages:\n  - local: ../pkg_a\n")
        rep = run_operation(fs, proj, "greet", args={"tag": "x"})
        assert rep["rows"][0]["origin"] == "project"
        assert rep["rows"][0]["tag"] == "x"

    def test_package_macro_renders_in_models_and_hooks(
        self, fs, tmp_path
    ):
        proj = _proj(tmp_path)
        self._pkg(tmp_path)
        with open(os.path.join(proj, "packages.yml"), "w") as f:
            f.write("packages:\n  - local: ../pkg_a\n")
        with open(os.path.join(proj, "dbt_project.yml"), "w") as f:
            f.write(
                "name: r16\n"
                "on-run-start: \"{{ pkg_only() }}\"\n"
            )
        # a model whose body calls the package macro
        with open(os.path.join(proj, "marts", "fv_m.sql"), "w") as f:
            f.write(
                FV_B.replace("fv_b", "fv_m").replace(
                    "SELECT customer_id, updated_at, f1 * 2 AS f2 "
                    "FROM {{ ref('fv_a') }}",
                    "SELECT customer_id, updated_at, f1 AS f2 "
                    "FROM {{ ref('fv_a') }} WHERE 1 = ({{ pkg_only() }})",
                )
            )
        rep = build_project(fs, proj)
        # hooks report the RENDERED statements (build report contract)
        assert rep["on_run_start"] == ["SELECT 1 AS one"]
        assert ("FV_M", "1.0") in rep["models"]["feature_views"]

    def test_transitive_local_packages_and_cycle(self, fs, tmp_path):
        proj = _proj(tmp_path)
        inner = self._pkg(
            tmp_path, "pkg_inner",
            "{% macro inner_m() -%}SELECT 2 AS two{%- endmacro %}\n",
        )
        outer = self._pkg(tmp_path, "pkg_outer")
        (outer / "packages.yml").write_text(
            "packages:\n  - local: ../pkg_inner\n"
        )
        with open(os.path.join(proj, "packages.yml"), "w") as f:
            f.write("packages:\n  - local: ../pkg_outer\n")
        rep = run_operation(fs, proj, "inner_m")
        assert rep["rows"][0]["two"] == 2
        # cycle refuses loudly
        (inner / "packages.yml").write_text(
            "packages:\n  - local: ../pkg_outer\n"
        )
        with pytest.raises(ValidationError, match="circular"):
            run_operation(fs, proj, "inner_m")

    def test_diamond_dependency_loads_once(self, fs, tmp_path):
        """Two packages sharing a local dep is a DIAMOND, not a
        cycle — the shared package loads once and nothing refuses."""
        proj = _proj(tmp_path)
        self._pkg(
            tmp_path, "pkg_shared",
            "{% macro shared_m() -%}SELECT 4 AS four{%- endmacro %}\n",
        )
        left = self._pkg(
            tmp_path, "pkg_left",
            "{% macro left_m() -%}SELECT 5 AS five{%- endmacro %}\n",
        )
        right = self._pkg(
            tmp_path, "pkg_right",
            "{% macro right_m() -%}SELECT 6 AS six{%- endmacro %}\n",
        )
        (left / "packages.yml").write_text(
            "packages:\n  - local: ../pkg_shared\n"
        )
        (right / "packages.yml").write_text(
            "packages:\n  - local: ../pkg_shared\n"
        )
        with open(os.path.join(proj, "packages.yml"), "w") as f:
            f.write(
                "packages:\n"
                "  - local: ../pkg_left\n"
                "  - local: ../pkg_right\n"
            )
        assert run_operation(fs, proj, "shared_m")["rows"][0]["four"] == 4
        assert run_operation(fs, proj, "right_m")["rows"][0]["six"] == 6

    def test_nonlocal_and_bad_specs_refuse(self, fs, tmp_path):
        proj = _proj(tmp_path)
        with open(os.path.join(proj, "packages.yml"), "w") as f:
            f.write(
                "packages:\n"
                "  - package: dbt-labs/dbt_utils\n"
                "    version: 1.0.0\n"
            )
        with pytest.raises(ValidationError, match="not supported"):
            load_project(fs, proj, dry_run=True)
        with open(os.path.join(proj, "packages.yml"), "w") as f:
            f.write("packages:\n  - local: ../does_not_exist\n")
        with pytest.raises(ValidationError, match="no such directory"):
            load_project(fs, proj, dry_run=True)

    def test_package_inside_project_not_walked_as_models(
        self, fs, tmp_path
    ):
        proj = _proj(tmp_path)
        pkg = tmp_path / "proj" / "vendored"
        (pkg / "macros").mkdir(parents=True)
        (pkg / "dbt_project.yml").write_text("name: vendored\n")
        (pkg / "macros" / "m.sql").write_text(
            "{% macro vm() -%}SELECT 3 AS three{%- endmacro %}\n"
        )
        # a config-less .sql inside the package must not parse as a
        # project model
        (pkg / "install_note.sql").write_text("SELECT 1\n")
        with open(os.path.join(proj, "packages.yml"), "w") as f:
            f.write("packages:\n  - local: vendored\n")
        rep = load_project(fs, proj)
        assert sorted(n for n, _v in rep["feature_views"]) == [
            "FV_A", "FV_B",
        ]
        assert run_operation(fs, proj, "vm")["rows"][0]["three"] == 3


class TestAdviceSmallFixes:
    def test_exponent_literal_in_templated_filter_passes(self):
        from dbt_snowflake_feature_store_spark.models import (
            _assert_templated_only_filter,
        )

        _assert_templated_only_filter(
            "m", "{{ Dimension('x') }} > 1.5e3 AND "
            "{{ Dimension('y') }} < 2E-4"
        )
        _assert_templated_only_filter("m", "{{ Dimension('x') }} >= .5e2")
        with pytest.raises(ValidationError, match="outside a"):
            _assert_templated_only_filter("m", "raw_col > 1.5e3")

    def test_drawup_scan_null_partitions_no_crash(self, spark):
        from dbt_snowflake_feature_store_spark.functions.ranks import (
            global_drawup_scan,
        )

        df = spark.createDataFrame(
            [(i, None) for i in range(8)], schema="id int, v int"
        )
        out = global_drawup_scan(
            df, ["id"], "v", num_partitions=4
        ).collect()
        assert len(out) == 8  # no TypeError on all-NULL partitions
        assert all(r["global_running_sum"] is None for r in out)

    def test_drawup_scan_mixed_null_partition(self, spark):
        from dbt_snowflake_feature_store_spark.functions.ranks import (
            global_drawup_scan,
        )

        rows = [(0, None), (1, None), (2, 5), (3, -7), (4, None), (5, 2)]
        df = spark.createDataFrame(rows, schema="id int, v int")
        out = {
            r["id"]: r
            for r in global_drawup_scan(
                df, ["id"], "v", num_partitions=3
            ).collect()
        }
        # NULLs drop from the running sum (documented); the scan over
        # the non-null suffix matches the sequential spelling
        assert out[2]["global_running_sum"] == 5
        assert out[3]["global_running_sum"] == -2
        assert out[5]["global_running_sum"] == 0
        assert out[3]["global_prefix_min"] == -2
        assert out[5]["global_prefix_min"] == -2


FV_C_DISABLED = FV_B.replace("fv_b", "fv_c").replace(
    "tags='daily',", "tags='daily',\n    enabled=false,"
)


class TestEnabledConfig:
    """r16: dbt `enabled: false` — a disabled model is out of the
    project everywhere (DAG, manifest, test surface); a ref() to it
    gets dbt's specific error; the config may be templated."""

    def test_disabled_model_skips_everywhere(self, fs, tmp_path):
        proj = _proj(tmp_path)
        (tmp_path / "proj" / "marts" / "fv_c.sql").write_text(
            FV_C_DISABLED
        )
        rep = load_project(fs, proj)
        assert sorted(n for n, _v in rep["feature_views"]) == [
            "FV_A", "FV_B",
        ]
        man = export_manifest(fs, proj)
        assert "model.project.fv_c" not in man["nodes"]
        # a schema yml on the disabled model does not run (and does
        # not fail as "target not found" either — dbt skips it)
        with open(os.path.join(proj, "schema.yml"), "w") as f:
            f.write(
                "models:\n"
                "  - name: fv_b\n"
                "    columns:\n"
                "      - name: customer_id\n"
                "        tests: [not_null]\n"
            )
        from dbt_snowflake_feature_store_spark.models import (
            run_schema_tests,
        )

        res = run_schema_tests(fs, proj)
        assert [r["passed"] for r in res] == [True]

    def test_ref_to_disabled_names_the_cause(self, fs, tmp_path):
        proj = _proj(tmp_path)
        # disable fv_a, which fv_b refs
        p = os.path.join(proj, "staging", "fv_a.sql")
        with open(p) as f:
            txt = f.read()
        with open(p, "w") as f:
            f.write(
                txt.replace(
                    "tags=['nightly', 'core'],",
                    "tags=['nightly', 'core'],\n    enabled=false,",
                )
            )
        with pytest.raises(ValidationError, match="disabled"):
            load_project(fs, proj, dry_run=True)

    def test_enabled_accepts_templated_value(self, fs, tmp_path):
        proj = _proj(tmp_path)
        (tmp_path / "proj" / "marts" / "fv_t.sql").write_text(
            "{{ config(materialized='feature_view',"
            " entities=['ent_cust'], feature_view_version='1.0',"
            " timestamp_col='updated_at',"
            " enabled=(var('build_t', 'no') == 'yes')) }}\n"
            "SELECT customer_id, updated_at, f1 FROM {{ ref('fv_a') }}\n"
        )
        off = load_project(fs, proj, dry_run=True)
        assert "FV_T" not in {n for n, _v in off["feature_views"]}
        on = load_project(
            fs, proj, dry_run=True, model_vars={"build_t": "yes"}
        )
        assert ("FV_T", "1.0") in on["feature_views"]

    def test_bad_enabled_shape_refuses(self, fs, tmp_path):
        proj = _proj(tmp_path)
        (tmp_path / "proj" / "marts" / "fv_x.sql").write_text(
            FV_B.replace("fv_b", "fv_x").replace(
                "tags='daily',", "enabled='yep',"
            )
        )
        with pytest.raises(ValidationError, match="enabled"):
            load_project(fs, proj, dry_run=True)


class TestAtOperator:
    def test_at_selects_descendants_and_their_ancestors(
        self, fs, tmp_path
    ):
        proj = _proj(tmp_path)
        # a second parent of fv_b's consumer: fv_d refs fv_a and fv_b
        (tmp_path / "proj" / "marts" / "fv_d.sql").write_text(
            FV_B.replace("fv_b", "fv_d").replace(
                "SELECT customer_id, updated_at, f1 * 2 AS f2 "
                "FROM {{ ref('fv_a') }}",
                "SELECT a.customer_id, a.updated_at, a.f1 + b.f2 AS f2"
                " FROM {{ ref('fv_a') }} a"
                " JOIN {{ ref('fv_b') }} b USING (customer_id)",
            )
        )
        got = load_project(fs, proj, select=["@fv_b"], dry_run=True)[
            "selected"
        ]
        # fv_b + descendant fv_d + fv_d's ancestors (fv_a, entity)
        assert got == ["ENT_CUST", "FV_A", "FV_B", "FV_D"]
        with pytest.raises(ValidationError, match="does not match"):
            load_project(fs, proj, select=["@nope"], dry_run=True)


class TestDisabledModelSurfaces:
    """Code-review r16 regressions: yml resources on a disabled model
    SKIP (never 'not found'), the disabled-duplicate idiom loads, and
    singular tests refing a disabled model disable too."""

    def _proj_with_disabled_c(self, tmp_path):
        proj = _proj(tmp_path)
        (tmp_path / "proj" / "marts" / "fv_c.sql").write_text(
            FV_C_DISABLED
        )
        return proj

    def test_yml_resources_on_disabled_model_skip(self, fs, tmp_path):
        proj = self._proj_with_disabled_c(tmp_path)
        # schema tests + contract + unit test ALL on the DISABLED fv_c
        with open(os.path.join(proj, "schema.yml"), "w") as f:
            f.write(
                "models:\n"
                "  - name: fv_c\n"
                "    config:\n"
                "      contract:\n"
                "        enforced: true\n"
                "    columns:\n"
                "      - name: customer_id\n"
                "        data_type: int\n"
                "        tests: [not_null]\n"
                "unit_tests:\n"
                "  - name: ut_c\n"
                "    model: fv_c\n"
                "    given:\n"
                "      - input: ref('fv_a')\n"
                "        rows:\n"
                "          - {customer_id: 1, f1: 10}\n"
                "    expect:\n"
                "      rows:\n"
                "        - {customer_id: 1, f2: 20}\n"
            )
        rep = build_project(fs, proj)  # pre-fix: 'not found' raises
        assert rep["contracts"] == []
        assert rep["unit_tests"] == []
        assert rep["schema_tests"] == []

    def test_singular_test_on_disabled_model_disables(
        self, fs, tmp_path
    ):
        proj = self._proj_with_disabled_c(tmp_path)
        os.makedirs(os.path.join(proj, "tests"))
        with open(
            os.path.join(proj, "tests", "probe_disabled.sql"), "w"
        ) as f:
            f.write("SELECT * FROM {{ ref('fv_c') }} WHERE f2 < 0\n")
        with open(
            os.path.join(proj, "tests", "probe_enabled.sql"), "w"
        ) as f:
            f.write("SELECT * FROM {{ ref('fv_b') }} WHERE f2 < 0\n")
        load_project(fs, proj)
        res = run_data_tests(fs, proj)
        assert [r["name"] for r in res] == ["probe_enabled"]
        man = export_manifest(fs, proj)
        assert "test.project.probe_enabled" in man["nodes"]
        assert "test.project.probe_disabled" not in man["nodes"]

    def test_disabled_duplicate_idiom(self, fs, tmp_path):
        """Two same-named models, one disabled — dbt's
        swap-implementations idiom. The enabled one loads and refs
        bind to it regardless of file order."""
        proj = _proj(tmp_path)
        # duplicate of fv_a, disabled, in a DIFFERENT dir (both sort
        # orders exercised by the two dirs' walk order)
        (tmp_path / "proj" / "marts" / "alt").mkdir()
        (tmp_path / "proj" / "marts" / "alt" / "fv_a.sql").write_text(
            FV_A.replace(
                "tags=['nightly', 'core'],",
                "tags=['nightly', 'core'],\n    enabled=false,",
            ).replace("10 AS f1", "999 AS f1")
        )
        rep = load_project(fs, proj)
        assert ("FV_A", "1.0") in rep["feature_views"]
        assert ("FV_B", "1.0") in rep["feature_views"]
        # the ENABLED implementation won (f1 = 10, not 999)
        row = fs.read_feature_view("FV_A", "1.0").collect()[0]
        assert row["f1"] == 10


class TestCumulativeFillRefusal:
    def test_fill_on_cumulative_min_refuses(self, fs, tmp_path):
        proj = _proj(tmp_path)
        with open(os.path.join(proj, "sem.yml"), "w") as f:
            f.write(
                "semantic_models:\n"
                "  - name: a_sem\n"
                "    model: ref('fv_a')\n"
                "    entities:\n"
                "      - name: ent_cust\n"
                "        type: primary\n"
                "        expr: customer_id\n"
                "    dimensions:\n"
                "      - name: updated_at\n"
                "        type: time\n"
                "    measures:\n"
                "      - name: min_f1\n"
                "        agg: min\n"
                "        expr: f1\n"
                "metrics:\n"
                "  - name: cum_min_fill\n"
                "    type: cumulative\n"
                "    type_params:\n"
                "      measure:\n"
                "        name: min_f1\n"
                "        fill_nulls_with: 0\n"
            )
        from dbt_snowflake_feature_store_spark import evaluate_metric

        load_project(fs, proj)
        with pytest.raises(ValidationError, match="ill-defined"):
            evaluate_metric(fs, "cum_min_fill", time_grain="day")
