"""dbt snapshots: SCD2 ``{% snapshot %}`` blocks over registered sources.

The reference ships as a dbt package, and dbt's snapshot materialization
is the standard way its users capture slowly-changing source state
(``dbt snapshot`` → a table with ``dbt_valid_from`` / ``dbt_valid_to``
versions per key). This module implements that surface Spark-first:

- ``snapshots/**/*.sql`` files holding ``{% snapshot name %} …
  {% endsnapshot %}`` blocks with a ``{{ config(...) }}`` header —
  ``strategy='timestamp'`` (``unique_key`` + ``updated_at``) and
  ``strategy='check'`` (``unique_key`` + ``check_cols`` list or
  ``'all'``) are supported, anything else fails loudly (the
  models.py ValidationError discipline).
- Each run merges current source state into the snapshot table:
  changed rows get their open version CLOSED (``dbt_valid_to`` set)
  and a new open version inserted; new keys insert an open version;
  unchanged / absent keys keep their state (dbt's default soft-delete
  behavior). ``invalidate_hard_deletes=True`` opts into closing the
  open version of any key that VANISHED from the source (stamped with
  the run's ``at``), and the dbt-1.9 ``snapshot_meta_column_names``
  config renames the four meta columns at the storage boundary (the
  merge always runs on the default names). Unknown config keys fail
  loudly.
- State lives under ``<root>/_snapshots/<NAME>`` through the store's
  TableFormat (ParquetSnapshotFormat crash-safe swap / Delta when
  available), and the snapshot spec is registered so a strategy /
  key-spec change across runs fails instead of silently corrupting
  history (the on_configuration_change='fail' discipline,
  /root/reference/macros/materializations/feature_view.sql:16-34 —
  cited for the change-detection contract, not the implementation).

Scale shape: one equi-join of the open slice against the fresh source
per run (both sides keyed on ``unique_key`` — AQE-shuffleable at any
size), plus unions; the closed history is appended untouched, never
rewritten row-by-row. No window over unbounded data, no Python row
path.
"""

from __future__ import annotations

import os
import re
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .models import (
    _CONFIG_RE,
    _needs_full_jinja,
    _parse_config,
    make_jinja_env,
    _project_macro_paths,
    _resolve_source,
    canonical_name,
)
from .errors import ValidationError

if TYPE_CHECKING:  # pragma: no cover
    from .store import FeatureStore

_SNAPSHOT_RE = re.compile(
    r"\{%-?\s*snapshot\s+([A-Za-z_][A-Za-z0-9_]*)\s*-?%\}(.*?)"
    r"\{%-?\s*endsnapshot\s*-?%\}",
    re.DOTALL,
)
_EXPR_RE = re.compile(
    r"\{\{-?\s*(ref|source)\s*\(\s*([^)]*?)\s*\)\s*-?\}\}", re.DOTALL
)
_ARG_RE = re.compile(r"""^\s*['"]([^'"]+)['"]\s*$""")

SNAPSHOT_COLS = ("dbt_scd_id", "dbt_updated_at", "dbt_valid_from", "dbt_valid_to")

# dbt-1.9 hard_deletes='new_record' adds a fifth meta column: every row
# carries 'False'/'True' (dbt's string spelling), and a delete inserts an
# OPEN marker row with the vanished key's last values and 'True'.
DELETED_COL = "dbt_is_deleted"


def _parse_snapshot_blocks(path: str) -> list[tuple[str, str]]:
    with open(path, encoding="utf-8") as fh:
        raw = fh.read()
    blocks = _SNAPSHOT_RE.findall(raw)
    if not blocks:
        raise ValidationError(
            f"No {{% snapshot %}} block in {path!r} — snapshot files must "
            "wrap their SELECT in {% snapshot <name> %} … {% endsnapshot %}"
        )
    return [(name, body) for name, body in blocks]


def _resolve_refs(
    fs: "FeatureStore",
    body: str,
    source_map: dict[Any, str] | None,
    snapshot_name: str = "<snapshot>",
    declared: "set[tuple[str, str]] | None" = None,
) -> str:
    """Bind ``ref()``/``source()`` to registered source views. Snapshots
    capture SOURCE state (the dbt contract), so a ref() must name a
    registered source or seed — a ref to a model fails loudly."""
    # sources bind their temp view under the ORIGINAL registered name
    # (store._bind_batch_sources), so map canonical → original here
    known = {
        canonical_name(d["name"]): d["name"]
        for d in fs.registry.list("sources")
    }

    def sub(m: re.Match[str]) -> str:
        fn, args_src = m.group(1), m.group(2)
        args = [a.strip() for a in args_src.split(",")]
        if fn == "source":
            if len(args) != 2:
                raise ValidationError(
                    f"source() takes 2 arguments, got {args_src!r}"
                )
            parsed = []
            for a in args:
                am = _ARG_RE.match(a)
                if not am:
                    raise ValidationError(
                        f"source() arguments must be string literals: {a!r}"
                    )
                parsed.append(am.group(1))
            # models._resolve_source takes a Model for its error message;
            # snapshots aren't Models — hand it a named stand-in (ADVICE
            # r10: the old 4-arg call raised TypeError for every
            # snapshot body that used {{ source(...) }})
            from types import SimpleNamespace

            stand_in = SimpleNamespace(name=f"snapshot:{snapshot_name}")
            return _resolve_source(
                fs, stand_in, parsed[0], parsed[1], source_map, declared
            )
        if len(args) != 1:
            raise ValidationError(f"ref() takes 1 argument, got {args_src!r}")
        am = _ARG_RE.match(args[0])
        if not am:
            raise ValidationError(
                f"ref() argument must be a string literal: {args[0]!r}"
            )
        name = canonical_name(am.group(1))
        if name not in known:
            raise ValidationError(
                f"Snapshot ref('{am.group(1)}') does not name a registered "
                "source or seed — snapshots capture source state; register "
                "the table (or load seeds) first"
            )
        return known[name]

    return _EXPR_RE.sub(sub, body)


_KNOWN_CONFIG_KEYS = frozenset(
    {
        "strategy",
        "unique_key",
        "updated_at",
        "check_cols",
        "invalidate_hard_deletes",
        "hard_deletes",
        "snapshot_meta_column_names",
    }
)


def _validate_meta_cols(name: str, raw: Any) -> dict[str, str]:
    """dbt-1.9 ``snapshot_meta_column_names``: rename the four SCD2 meta
    columns. Only non-identity renames are kept in the spec; duplicate
    targets and unknown meta names fail loudly."""
    if not isinstance(raw, dict):
        raise ValidationError(
            f"Snapshot '{name}': snapshot_meta_column_names must be a "
            f"dict of {{default_name: custom_name}}, got {raw!r}"
        )
    out: dict[str, str] = {}
    allowed = SNAPSHOT_COLS + (DELETED_COL,)
    for k, v in raw.items():
        if k not in allowed:
            raise ValidationError(
                f"Snapshot '{name}': snapshot_meta_column_names key {k!r} "
                f"is not a snapshot meta column {allowed}"
            )
        vs = str(v)
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", vs):
            raise ValidationError(
                f"Snapshot '{name}': meta column rename {vs!r} is not a "
                "valid identifier"
            )
        if vs != k:
            out[k] = vs
    finals = [out.get(c, c) for c in SNAPSHOT_COLS + (DELETED_COL,)]
    if len(set(finals)) != len(finals):
        raise ValidationError(
            f"Snapshot '{name}': snapshot_meta_column_names collide: "
            f"{finals}"
        )
    return out


def _validate_config(name: str, cfg: dict[str, Any]) -> dict[str, Any]:
    unknown = sorted(set(cfg) - _KNOWN_CONFIG_KEYS)
    if unknown:
        raise ValidationError(
            f"Snapshot '{name}': unknown config key(s) {unknown} — "
            f"supported: {sorted(_KNOWN_CONFIG_KEYS)}"
        )
    strategy = str(cfg.get("strategy", "")).lower()
    if strategy not in ("timestamp", "check"):
        raise ValidationError(
            f"Snapshot '{name}': strategy must be 'timestamp' or 'check', "
            f"got {cfg.get('strategy')!r}"
        )
    if not cfg.get("unique_key"):
        raise ValidationError(f"Snapshot '{name}': unique_key is required")
    spec: dict[str, Any] = {
        "strategy": strategy,
        "unique_key": str(cfg["unique_key"]),
    }
    ihd = cfg.get("invalidate_hard_deletes", False)
    if not isinstance(ihd, bool):
        raise ValidationError(
            f"Snapshot '{name}': invalidate_hard_deletes must be a bool, "
            f"got {ihd!r}"
        )
    if ihd:
        spec["hard_deletes"] = "invalidate"
    if "hard_deletes" in cfg:
        # dbt-1.9 successor config: 'ignore' (default), 'invalidate'
        # (close vanished keys), 'new_record' (close AND insert an open
        # dbt_is_deleted='True' marker row; reappearance closes the
        # marker and opens a fresh 'False' row)
        hd = str(cfg["hard_deletes"]).lower()
        if hd not in ("ignore", "invalidate", "new_record"):
            raise ValidationError(
                f"Snapshot '{name}': hard_deletes must be 'ignore', "
                f"'invalidate' or 'new_record', got {cfg['hard_deletes']!r}"
            )
        if ihd and hd != "invalidate":
            raise ValidationError(
                f"Snapshot '{name}': invalidate_hard_deletes=True "
                f"conflicts with hard_deletes='{hd}'"
            )
        if hd != "ignore":
            spec["hard_deletes"] = hd
    if "snapshot_meta_column_names" in cfg:
        meta = _validate_meta_cols(name, cfg["snapshot_meta_column_names"])
        if meta:
            spec["meta_cols"] = meta
    if strategy == "timestamp":
        if not cfg.get("updated_at"):
            raise ValidationError(
                f"Snapshot '{name}': updated_at is required for the "
                "timestamp strategy"
            )
        spec["updated_at"] = str(cfg["updated_at"])
    else:
        cols = cfg.get("check_cols")
        if cols != "all" and not (
            isinstance(cols, (list, tuple)) and cols
        ):
            raise ValidationError(
                f"Snapshot '{name}': check_cols must be 'all' or a "
                f"non-empty list, got {cols!r}"
            )
        spec["check_cols"] = (
            "all" if cols == "all" else [str(c) for c in cols]
        )
    return spec


def _snapshot_path(fs: "FeatureStore", name: str) -> str:
    return os.path.join(fs.root, "_snapshots", canonical_name(name))


def _assert_unique(src: DataFrame, key: str, name: str) -> None:
    dup = (
        src.groupBy(key).count().filter(F.col("count") > 1).limit(1).collect()
    )
    if dup:
        raise ValidationError(
            f"Snapshot '{name}': source has duplicate unique_key "
            f"{key}={dup[0][key]!r} — dbt snapshots require one source row "
            "per key per run"
        )


def _merge_timestamp(
    cur: DataFrame | None,
    src: DataFrame,
    key: str,
    ua: str,
    delete_at=None,
    new_record: bool = False,
) -> DataFrame:
    """SCD2 merge, timestamp strategy: a source row with a LATER
    updated_at than the open version closes it and opens a new one.
    With ``delete_at`` set (hard_deletes='invalidate'/'new_record'), an
    open version whose key has VANISHED from the source is closed at
    that stamp; with ``new_record`` additionally (a) every row carries
    ``dbt_is_deleted`` ('False'/'True', dbt's string spelling), (b) a
    delete also inserts an OPEN marker row holding the vanished key's
    last values with 'True', and (c) a key REAPPEARING while its open
    row is a marker closes the marker and opens the fresh source row
    even when its updated_at is not newer (the dbt-1.9 resurrect
    rule)."""
    stamped = src.select(
        "*",
        F.md5(
            F.concat_ws("||", F.col(key).cast("string"), F.col(ua).cast("string"))
        ).alias("dbt_scd_id"),
        F.col(ua).alias("dbt_updated_at"),
        F.col(ua).alias("dbt_valid_from"),
        F.lit(None).cast("timestamp").alias("dbt_valid_to"),
    )
    if new_record:
        stamped = stamped.withColumn(DELETED_COL, F.lit("False"))
    if cur is None:
        return stamped
    closed = cur.filter(F.col("dbt_valid_to").isNotNull())
    opened = cur.filter(F.col("dbt_valid_to").isNull())
    chg = src.select(
        F.col(key).alias("_k"), F.col(ua).alias("_new_ua")
    )
    j = opened.join(chg, opened[key] == chg["_k"], "left")
    is_marker = (
        (F.col(DELETED_COL) == "True") if new_record else F.lit(False)
    )
    change = F.col("_new_ua").isNotNull() & (
        (F.col("_new_ua") > F.col("dbt_updated_at")) | is_marker
    )
    closed_now = (
        j.filter(change)
        .withColumn("dbt_valid_to", F.col("_new_ua"))
        .drop("_k", "_new_ua")
    )
    if delete_at is not None:
        keep_open = j.filter(
            F.col("_new_ua").isNotNull() & ~change
        ).drop("_k", "_new_ua")
        # an absent key closes ONCE: an already-open deletion marker
        # whose key is still absent stays open, never re-closes
        gone = j.filter(F.col("_new_ua").isNull() & ~is_marker).drop(
            "_k", "_new_ua"
        )
        if new_record:
            keep_open = keep_open.unionByName(
                j.filter(F.col("_new_ua").isNull() & is_marker).drop(
                    "_k", "_new_ua"
                )
            )
        closed_now = closed_now.unionByName(
            gone.withColumn("dbt_valid_to", delete_at)
        )
        if new_record:
            marker = (
                gone.withColumn(
                    "dbt_scd_id",
                    F.md5(
                        F.concat_ws(
                            "||",
                            F.col(key).cast("string"),
                            delete_at.cast("string"),
                            F.lit("deleted"),
                        )
                    ),
                )
                .withColumn("dbt_updated_at", delete_at)
                .withColumn("dbt_valid_from", delete_at)
                .withColumn("dbt_valid_to", F.lit(None).cast("timestamp"))
                .withColumn(DELETED_COL, F.lit("True"))
            )
            closed_now = closed_now.unionByName(marker)
    else:
        keep_open = j.filter(~change | F.col("_new_ua").isNull()).drop(
            "_k", "_new_ua"
        )
    prev = opened.select(
        F.col(key).alias("_k"),
        F.col("dbt_updated_at").alias("_old_ua"),
        (
            (F.col(DELETED_COL) == "True") if new_record else F.lit(False)
        ).alias("_old_marker"),
    )
    ins = stamped.join(prev, stamped[key] == prev["_k"], "left").filter(
        F.col("_old_ua").isNull()
        | (F.col("dbt_updated_at") > F.col("_old_ua"))
        | F.col("_old_marker")
    )
    if new_record:
        # a key restored with an updated_at it already carried BEFORE
        # deletion (restore-from-backup) would re-mint md5(key||ua) and
        # collide with the pre-delete closed row's dbt_scd_id — salt the
        # RESURRECT insert with the marker's delete stamp so the SCD2
        # surrogate stays unique (review r11)
        resurrect = F.col("_old_marker") & ~(
            F.col("dbt_updated_at") > F.col("_old_ua")
        )
        ins = ins.withColumn(
            "dbt_scd_id",
            F.when(
                resurrect,
                F.md5(
                    F.concat_ws(
                        "||",
                        F.col(key).cast("string"),
                        F.col("dbt_updated_at").cast("string"),
                        F.lit("resurrect"),
                        F.col("_old_ua").cast("string"),
                    )
                ),
            ).otherwise(F.col("dbt_scd_id")),
        )
    ins = ins.drop("_k", "_old_ua", "_old_marker")
    return closed.unionByName(keep_open).unionByName(closed_now).unionByName(ins)


def _merge_check(
    cur: DataFrame | None,
    src: DataFrame,
    key: str,
    check_cols: Any,
    at_col,
    delete_at=None,
    new_record: bool = False,
) -> DataFrame:
    """SCD2 merge, check strategy: a row is 'changed' when any checked
    column differs (null-safe); version stamps come from ``at``. With
    ``delete_at`` set (hard_deletes='invalidate'/'new_record'), an open
    version whose key has vanished from the source is closed at that
    stamp; ``new_record`` adds the dbt-1.9 deletion-marker row class —
    see :func:`_merge_timestamp`. Resurrect rule here: a key present in
    the source while its open row is a marker ALWAYS closes the marker
    and re-opens, even when the checked columns match the pre-delete
    values."""
    cols = (
        [c for c in src.columns]
        if check_cols == "all"
        else [key] + [c for c in check_cols]
    )
    chk = F.md5(
        F.concat_ws(
            "||", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in sorted(set(cols))]
        )
    )
    stamped = src.select(
        "*",
        F.md5(
            F.concat_ws("||", F.col(key).cast("string"), at_col.cast("string"))
        ).alias("dbt_scd_id"),
        at_col.alias("dbt_updated_at"),
        at_col.alias("dbt_valid_from"),
        F.lit(None).cast("timestamp").alias("dbt_valid_to"),
        chk.alias("_chk"),
    )
    if new_record:
        stamped = stamped.withColumn(DELETED_COL, F.lit("False"))
    if cur is None:
        return stamped.drop("_chk")
    cur_chk = cur.select(
        "*",
        F.md5(
            F.concat_ws(
                "||", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in sorted(set(cols))]
            )
        ).alias("_chk"),
    )
    closed = cur_chk.filter(F.col("dbt_valid_to").isNotNull()).drop("_chk")
    opened = cur_chk.filter(F.col("dbt_valid_to").isNull())
    news = stamped.select(
        F.col(key).alias("_k"), F.col("_chk").alias("_new_chk"),
        F.col("dbt_valid_from").alias("_new_vf"),
    )
    j = opened.join(news, opened[key] == news["_k"], "left")
    is_marker = (
        (F.col(DELETED_COL) == "True") if new_record else F.lit(False)
    )
    change = F.col("_new_chk").isNotNull() & (
        (F.col("_new_chk") != F.col("_chk")) | is_marker
    )
    closed_now = (
        j.filter(change)
        .withColumn("dbt_valid_to", F.col("_new_vf"))
        .drop("_k", "_new_chk", "_new_vf", "_chk")
    )
    if delete_at is not None:
        keep_open = j.filter(
            F.col("_new_chk").isNotNull() & ~change
        ).drop("_k", "_new_chk", "_new_vf", "_chk")
        gone = j.filter(F.col("_new_chk").isNull() & ~is_marker).drop(
            "_k", "_new_chk", "_new_vf", "_chk"
        )
        if new_record:
            keep_open = keep_open.unionByName(
                j.filter(F.col("_new_chk").isNull() & is_marker).drop(
                    "_k", "_new_chk", "_new_vf", "_chk"
                )
            )
        closed_now = closed_now.unionByName(
            gone.withColumn("dbt_valid_to", delete_at)
        )
        if new_record:
            marker = (
                gone.withColumn(
                    "dbt_scd_id",
                    F.md5(
                        F.concat_ws(
                            "||",
                            F.col(key).cast("string"),
                            delete_at.cast("string"),
                            F.lit("deleted"),
                        )
                    ),
                )
                .withColumn("dbt_updated_at", delete_at)
                .withColumn("dbt_valid_from", delete_at)
                .withColumn("dbt_valid_to", F.lit(None).cast("timestamp"))
                .withColumn(DELETED_COL, F.lit("True"))
            )
            closed_now = closed_now.unionByName(marker)
    else:
        keep_open = j.filter(~change).drop(
            "_k", "_new_chk", "_new_vf", "_chk"
        )
    prev = opened.select(
        F.col(key).alias("_k"),
        F.col("_chk").alias("_old_chk"),
        (
            (F.col(DELETED_COL) == "True") if new_record else F.lit(False)
        ).alias("_old_marker"),
    )
    ins = (
        stamped.join(prev, stamped[key] == prev["_k"], "left")
        .filter(
            F.col("_old_chk").isNull()
            | (F.col("_chk") != F.col("_old_chk"))
            | F.col("_old_marker")
        )
        .drop("_k", "_old_chk", "_chk", "_old_marker")
    )
    return closed.unionByName(keep_open).unionByName(closed_now).unionByName(ins)


def run_snapshots(
    fs: "FeatureStore",
    project_dir: str,
    source_map: dict[Any, str] | None = None,
    model_vars: dict[str, Any] | None = None,
    at: Any = None,
) -> dict[str, Any]:
    """Run every snapshot under ``<project_dir>/snapshots``. Returns
    ``{name: {"strategy": …, "rows": total, "open": n_open}}``.

    ``at`` stamps check-strategy versions (a timestamp or ISO string);
    it defaults to the session's ``current_timestamp()`` — pass it
    explicitly for reproducible runs (tests do)."""
    from .models import _cfg_dirs

    # EVERY configured snapshot-paths entry contributes snapshots
    # (ADVICE r15: only the first entry used to run)
    _sdirs = _cfg_dirs(project_dir, "snapshot-paths", "snapshots")
    if not _sdirs:
        raise ValidationError(f"No snapshots/ directory under {project_dir!r}")
    # sources.yml binds/gates source() exactly as in models.load_project
    from .models import load_sources_yml, normalize_source_map

    declared_map, declared = load_sources_yml(project_dir)
    if declared_map is not None:
        source_map = {**declared_map, **normalize_source_map(source_map)}
    paths = []
    for snap_dir in _sdirs:
        for root, _dirs, files in os.walk(snap_dir):
            for fn in sorted(files):
                if fn.endswith(".sql"):
                    paths.append(os.path.join(root, fn))
    if not paths:
        raise ValidationError(
            f"No .sql snapshot files under "
            f"{_sdirs[0] if len(_sdirs) == 1 else _sdirs!r}"
        )

    from .models import project_vars

    model_vars = project_vars(project_dir, model_vars)
    jinja_env = None

    def _env():
        nonlocal jinja_env
        if jinja_env is None:
            jinja_env = make_jinja_env(
                _project_macro_paths(project_dir), model_vars
            )
        return jinja_env

    at_col = (
        F.lit(at).cast("timestamp") if at is not None else F.current_timestamp()
    )
    report: dict[str, Any] = {}
    seen: set[str] = set()
    for p in paths:
        for raw_name, body in _parse_snapshot_blocks(p):
            name = canonical_name(raw_name)
            if name in seen:
                raise ValidationError(f"Duplicate snapshot name '{raw_name}'")
            seen.add(name)
            m = _CONFIG_RE.search(body)
            if not m:
                raise ValidationError(
                    f"Snapshot '{raw_name}' has no {{{{ config(...) }}}} block"
                )
            cfg = _parse_config(m.group(1), raw_name)
            spec = _validate_config(raw_name, cfg)
            sql_body = _CONFIG_RE.sub("", body)
            if _needs_full_jinja(sql_body):
                env = _env()
                sql_body = env.from_string(sql_body).render()
            sql_body = _resolve_refs(
                fs, sql_body, source_map, snapshot_name=raw_name,
                declared=declared,
            ).strip()

            # spec-change detection across runs: silently reinterpreting
            # history under a new strategy/key would corrupt it
            prior = fs.registry.get("snapshots", name)
            if prior is not None and prior.get("spec") != spec:
                hint = ""
                p_spec = dict(prior.get("spec") or {})
                if (
                    spec.get("hard_deletes") == "new_record"
                    and {**p_spec, "hard_deletes": "new_record"} == spec
                ):
                    hint = (
                        " — to adopt hard_deletes='new_record' on an "
                        "existing snapshot, run migrate_snapshot_hard_"
                        f"deletes(fs, '{raw_name}') first (it backfills "
                        "the dbt_is_deleted column and updates the spec)"
                    )
                raise ValidationError(
                    f"Snapshot '{raw_name}' spec changed "
                    f"({prior.get('spec')} -> {spec}); snapshots cannot "
                    "change strategy or keys — create a new snapshot"
                    + hint
                )

            fs._bind_batch_sources()
            src = fs.spark.sql(sql_body)
            key = spec["unique_key"]
            if key not in src.columns:
                raise ValidationError(
                    f"Snapshot '{raw_name}': unique_key '{key}' not in "
                    f"select columns {src.columns}"
                )
            _assert_unique(src, key, raw_name)

            meta_cols: dict[str, str] = spec.get("meta_cols", {})
            clash = [c for c in meta_cols.values() if c in src.columns]
            if clash:
                raise ValidationError(
                    f"Snapshot '{raw_name}': renamed meta column(s) "
                    f"{clash} collide with select columns"
                )
            path = _snapshot_path(fs, name)
            fs.storage.recover(path)
            cur = (
                fs.storage.read(fs.spark, path)
                if os.path.isdir(path)
                else None
            )
            if cur is not None:
                # merge logic runs on the DEFAULT meta names; custom
                # names exist only at the storage boundary
                for dflt, custom in meta_cols.items():
                    cur = cur.withColumnRenamed(custom, dflt)
            hd = spec.get("hard_deletes")
            delete_at = at_col if hd in ("invalidate", "new_record") else None
            new_record = hd == "new_record"
            if new_record and cur is not None and DELETED_COL not in cur.columns:
                raise ValidationError(
                    f"Snapshot '{raw_name}': existing history predates "
                    "hard_deletes='new_record' (no dbt_is_deleted column) "
                    f"— run migrate_snapshot_hard_deletes(fs, '{raw_name}') "
                    "to backfill it"
                )
            if spec["strategy"] == "timestamp":
                ua = spec["updated_at"]
                if ua not in src.columns:
                    raise ValidationError(
                        f"Snapshot '{raw_name}': updated_at '{ua}' not in "
                        f"select columns {src.columns}"
                    )
                out = _merge_timestamp(cur, src.withColumn(
                    ua, F.col(ua).cast("timestamp")
                ), key, ua, delete_at=delete_at, new_record=new_record)
            else:
                out = _merge_check(
                    cur, src, key, spec["check_cols"], at_col,
                    delete_at=delete_at, new_record=new_record,
                )
            for dflt, custom in meta_cols.items():
                out = out.withColumnRenamed(dflt, custom)
            fs.storage.replace(fs.spark, path, out)
            fs.registry.put(
                "snapshots", name, {"name": name, "spec": spec, "sql": sql_body}
            )
            final = fs.storage.read(fs.spark, path)
            vt = meta_cols.get("dbt_valid_to", "dbt_valid_to")
            report[name] = {
                "strategy": spec["strategy"],
                "rows": final.count(),
                "open": final.filter(F.col(vt).isNull()).count(),
            }
    return report


def read_snapshot(fs: "FeatureStore", name: str) -> DataFrame:
    """Read a snapshot table (full SCD2 history)."""
    n = canonical_name(name)
    if fs.registry.get("snapshots", n) is None:
        raise ValidationError(f"Unknown snapshot '{name}'")
    path = _snapshot_path(fs, n)
    fs.storage.recover(path)
    return fs.storage.read(fs.spark, path)


def migrate_snapshot_hard_deletes(fs: "FeatureStore", name: str) -> None:
    """One-time migration of an EXISTING snapshot table to
    ``hard_deletes='new_record'``: backfill the ``dbt_is_deleted``
    column ('False' on every historical row — nothing in a pre-existing
    table can be a deletion marker) through the crash-safe storage
    swap, then update the registered spec so the next ``run_snapshots``
    accepts the new config instead of raising the spec-change error.
    Idempotent; respects a ``snapshot_meta_column_names`` rename of the
    marker column."""
    n = canonical_name(name)
    doc = fs.registry.get("snapshots", n)
    if doc is None:
        raise ValidationError(f"Unknown snapshot '{name}'")
    spec = dict(doc.get("spec") or {})
    delcol = (spec.get("meta_cols") or {}).get(DELETED_COL, DELETED_COL)
    path = _snapshot_path(fs, n)
    fs.storage.recover(path)
    if os.path.isdir(path):
        df = fs.storage.read(fs.spark, path)
        if delcol not in df.columns:
            fs.storage.replace(
                fs.spark, path, df.withColumn(delcol, F.lit("False"))
            )
    spec["hard_deletes"] = "new_record"
    fs.registry.put("snapshots", n, {**doc, "spec": spec})
