"""WebDataset shard export/import (sources/webdataset.py): member
grouping, modality extensions, shard-size bounding, deterministic
bytes, and the Spark round trip over driver tables."""

from __future__ import annotations

import os
import tarfile

import pytest
from pyspark.sql import functions as F

from dbt_snowflake_feature_store_spark.functions import multimodal as MM
from dbt_snowflake_feature_store_spark.sources import read_table
from dbt_snowflake_feature_store_spark.sources.webdataset import (
    export_webdataset,
    read_webdataset,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def media_df(spark):
    """documents as (key, text, png payload, meta json) — the multimodal
    sample shape WebDataset exists for."""
    docs = read_table(spark, SF, "documents").limit(30)
    png = MM.documents_as_png_media(docs).select(
        F.col("media_id").alias("doc_id"), F.col("content").alias("image")
    )
    return (
        docs.select("doc_id", "text", "lang")
        .join(png, "doc_id")
        .select(
            F.format_string("%06d", F.col("doc_id")).alias("key"),
            "text",
            "image",
            F.struct("lang").alias("meta"),
        )
    )


def test_export_layout_and_round_trip(spark, tmp_path, media_df):
    out = str(tmp_path / "wds")
    n = export_webdataset(media_df.repartition(3), out, key_col="key")
    assert n >= 3  # at least one shard per partition with rows
    names = sorted(os.listdir(out))
    assert all(f.startswith("shard-") and f.endswith(".tar") for f in names)

    # direct tarfile inspection: 3 members per sample, grouped by key,
    # png payloads carry the png extension, zeroed mtimes
    with tarfile.open(os.path.join(out, names[0])) as tar:
        members = tar.getmembers()
        assert all(m.mtime == 0 for m in members)
        by_key = {}
        for m in members:
            base, col, ext = m.name.rsplit(".", 2)
            by_key.setdefault(base, set()).add((col, ext))
        for k, got in by_key.items():
            assert got == {("text", "txt"), ("image", "png"), ("meta", "json")}

    # Spark-side inverse scan reconstructs every sample member
    back = read_webdataset(spark, out)
    assert back.count() == media_df.count() * 3
    keys = {r["key"] for r in back.select("key").distinct().collect()}
    want = {r["key"] for r in media_df.select("key").collect()}
    assert keys == want
    # payload fidelity: text member round-trips byte-for-byte
    src = {r["key"]: r["text"] for r in media_df.collect()}
    for r in back.filter("column = 'text'").collect():
        assert bytes(r["payload"]).decode("utf-8") == src[r["key"]]


def test_shard_size_bounded(spark, tmp_path, media_df):
    out = str(tmp_path / "wds_small")
    export_webdataset(
        media_df.repartition(1), out, key_col="key", samples_per_shard=7
    )
    shard_counts = []
    for f in sorted(os.listdir(out)):
        with tarfile.open(os.path.join(out, f)) as tar:
            shard_counts.append(len(tar.getmembers()) // 3)
    assert max(shard_counts) <= 7
    assert sum(shard_counts) == 30


def test_deterministic_bytes(spark, tmp_path, media_df):
    """Re-exporting the same single-partition frame yields byte-identical
    shards (zeroed mtimes, sorted member order)."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    one = media_df.repartition(1).sortWithinPartitions("key")
    export_webdataset(one, a, key_col="key")
    export_webdataset(one, b, key_col="key")
    fa, fb = sorted(os.listdir(a)), sorted(os.listdir(b))
    assert fa == fb
    for f in fa:
        assert (
            open(os.path.join(a, f), "rb").read()
            == open(os.path.join(b, f), "rb").read()
        )


def test_bad_inputs(spark, media_df, tmp_path):
    with pytest.raises(ValueError, match="key_col"):
        export_webdataset(media_df, str(tmp_path / "x"), key_col="nope")
    with pytest.raises(ValueError, match="non-key column"):
        export_webdataset(
            media_df.select("key"), str(tmp_path / "y"), key_col="key"
        )
    # dots in data column names would corrupt the member-name split on
    # read — rejected at export time
    with pytest.raises(ValueError, match="meta.width"):
        export_webdataset(
            media_df.withColumn("meta.width", F.lit(16)),
            str(tmp_path / "z"),
            key_col="key",
        )


def test_reexport_clears_stale_shards(spark, tmp_path, media_df):
    """A re-export that yields FEWER shards must not leave the previous
    run's extra tars mixed into the corpus (ADVICE r7)."""
    out = str(tmp_path / "wds_re")
    export_webdataset(
        media_df.repartition(1), out, key_col="key", samples_per_shard=5
    )  # 30 rows / 5 per shard = 6 tars
    assert len(os.listdir(out)) == 6
    smaller = media_df.limit(4).repartition(1)
    n = export_webdataset(smaller, out, key_col="key", samples_per_shard=5)
    assert n == 1
    assert len([f for f in os.listdir(out) if f.endswith(".tar")]) == 1
    # and the read sees only the re-exported rows
    assert read_webdataset(spark, out).select("key").distinct().count() == 4


def test_failed_reexport_preserves_previous_corpus(spark, tmp_path, media_df):
    """ADVICE r8: a failed/interrupted re-export must NOT destroy the
    previous corpus — shards stage into a temp dir and swap in only
    after the distributed write succeeds."""
    out = str(tmp_path / "wds_crash")
    export_webdataset(
        media_df.repartition(1), out, key_col="key", samples_per_shard=5
    )
    before = sorted(
        f for f in os.listdir(out) if f.endswith(".tar")
    )
    assert len(before) == 6

    @F.udf("string")
    def boom(k):
        raise RuntimeError("simulated mid-export task failure")

    poisoned = media_df.withColumn("key", boom("key"))
    with pytest.raises(Exception):
        export_webdataset(poisoned, out, key_col="key", samples_per_shard=5)
    after = sorted(f for f in os.listdir(out) if f.endswith(".tar"))
    assert after == before  # old corpus intact, no staging leftovers
    assert not [d for d in os.listdir(out) if d.startswith("_staging-")]
    assert read_webdataset(spark, out).select("key").distinct().count() == 30


def test_recover_rolls_forward_committed_staging(spark, tmp_path, media_df):
    """ADVICE r9: a crash AFTER the commit marker but before/during the
    swap must roll FORWARD — the marked staging holds a complete shard
    set. Simulate by hand-building the post-crash state: old corpus in
    place, committed staging dir untouched, plus a half-moved _old dir."""
    import shutil

    from dbt_snowflake_feature_store_spark.sources.webdataset import (
        _WDS_COMMIT,
        recover_webdataset,
    )

    out = str(tmp_path / "wds_rf")
    export_webdataset(
        media_df.repartition(1), out, key_col="key", samples_per_shard=5
    )  # 6 tars = the "old" corpus
    new_dir = str(tmp_path / "wds_new")
    export_webdataset(
        media_df.limit(4).repartition(1),
        new_dir,
        key_col="key",
        samples_per_shard=5,
    )  # 1 tar = the "new" generation
    staging = os.path.join(out, "_staging-deadbeef0000")
    os.makedirs(staging)
    for f in os.listdir(new_dir):
        shutil.copy(os.path.join(new_dir, f), os.path.join(staging, f))
    staged_tars = sorted(
        f for f in os.listdir(staging) if f.endswith(".tar")
    )
    with open(os.path.join(staging, _WDS_COMMIT), "w") as fh:
        import json as _json

        _json.dump({"token": "deadbeef0000", "shards": staged_tars}, fh)
    # a half-done old-move from the simulated crash
    half = os.path.join(out, "_old-deadbeef0000")
    os.makedirs(half)
    victim = sorted(
        f for f in os.listdir(out) if f.endswith(".tar")
    )[-1]
    os.rename(os.path.join(out, victim), os.path.join(half, victim))

    recover_webdataset(out)
    tars = [f for f in os.listdir(out) if f.endswith(".tar")]
    assert len(tars) == 1  # the new generation won
    assert not [d for d in os.listdir(out) if d.startswith(("_staging-", "_old-"))]
    assert read_webdataset(spark, out).select("key").distinct().count() == 4
    # idempotent: a second recover is a no-op
    recover_webdataset(out)
    assert [f for f in os.listdir(out) if f.endswith(".tar")] == tars


def test_recover_survives_crash_between_swap_renames(spark, tmp_path, media_df):
    """ADVICE r10 (high): a crash BETWEEN the per-file renames of the
    swap leaves some committed shards already in out_dir and gone from
    staging. Recovery must read the shard set from the marker MANIFEST
    — recomputing it from the staging listing would classify the
    already-renamed new shards as stale and delete them (permanent data
    loss). Simulate the exact post-crash state: 2-shard committed
    staging with shard #1 already renamed into place."""
    import json as _json
    import shutil

    from dbt_snowflake_feature_store_spark.sources.webdataset import (
        _WDS_COMMIT,
        recover_webdataset,
    )

    out = str(tmp_path / "wds_midswap")
    export_webdataset(
        media_df.repartition(1), out, key_col="key", samples_per_shard=5
    )  # 6 tars = the "old" corpus
    new_dir = str(tmp_path / "wds_midswap_new")
    export_webdataset(
        media_df.limit(10).repartition(1),
        new_dir,
        key_col="key",
        samples_per_shard=5,
    )  # 2 tars = the "new" generation
    new_tars = sorted(f for f in os.listdir(new_dir) if f.endswith(".tar"))
    assert len(new_tars) == 2
    staging = os.path.join(out, "_staging-feedface0000")
    os.makedirs(staging)
    # shard 2 still staged; shard 1 ALREADY renamed into out_dir (it
    # replaced the same-named old tar, exactly as the swap does)
    shutil.copy(
        os.path.join(new_dir, new_tars[1]), os.path.join(staging, new_tars[1])
    )
    shutil.copy(
        os.path.join(new_dir, new_tars[0]), os.path.join(out, new_tars[0])
    )
    with open(os.path.join(staging, _WDS_COMMIT), "w") as fh:
        _json.dump({"token": "feedface0000", "shards": new_tars}, fh)

    recover_webdataset(out)
    tars = sorted(f for f in os.listdir(out) if f.endswith(".tar"))
    assert tars == new_tars  # BOTH committed shards survive
    assert not [d for d in os.listdir(out) if d.startswith(("_staging-", "_old-"))]
    assert read_webdataset(spark, out).select("key").distinct().count() == 10
    # idempotent: a second recover is a no-op
    recover_webdataset(out)
    assert sorted(f for f in os.listdir(out) if f.endswith(".tar")) == tars


def test_swap_refuses_to_finalize_missing_committed_shard(tmp_path):
    """A manifest shard missing from BOTH staging and out_dir means the
    committed corpus cannot be completed — the swap must raise, not
    quietly finalize a hole."""
    import json as _json

    import pytest

    from dbt_snowflake_feature_store_spark.sources.webdataset import (
        _WDS_COMMIT,
        recover_webdataset,
    )

    out = str(tmp_path / "wds_hole")
    staging = os.path.join(out, "_staging-0000dead0000")
    os.makedirs(staging)
    with open(os.path.join(staging, "shard-00000-00000.tar"), "wb") as fh:
        fh.write(b"x")
    with open(os.path.join(staging, _WDS_COMMIT), "w") as fh:
        _json.dump(
            {
                "token": "0000dead0000",
                "shards": ["shard-00000-00000.tar", "shard-00000-00001.tar"],
            },
            fh,
        )
    with pytest.raises(RuntimeError, match="missing from both"):
        recover_webdataset(out)
    # staging preserved for inspection
    assert os.path.isdir(staging)


def test_recover_sweeps_uncommitted_staging(spark, tmp_path, media_df):
    """An UNCOMMITTED staging dir (hard-killed mid-write) is garbage:
    the next export sweeps it and the old corpus survives verbatim."""
    out = str(tmp_path / "wds_sweep")
    export_webdataset(
        media_df.repartition(1), out, key_col="key", samples_per_shard=5
    )
    before = sorted(f for f in os.listdir(out) if f.endswith(".tar"))
    stale = os.path.join(out, "_staging-00000000dead")
    os.makedirs(stale)
    with open(os.path.join(stale, "shard-99999-00000.tar"), "wb") as fh:
        fh.write(b"partial garbage")
    # re-export (same data): stale staging swept, corpus consistent
    export_webdataset(
        media_df.repartition(1), out, key_col="key", samples_per_shard=5
    )
    assert not [d for d in os.listdir(out) if d.startswith("_staging-")]
    assert sorted(f for f in os.listdir(out) if f.endswith(".tar")) == before


def test_recover_refuses_legacy_marker_over_live_corpus(
    spark, tmp_path, media_df
):
    """ADVICE r11: a legacy bare-token marker carries no manifest, so
    the staged shard set must be recomputed from the staging listing —
    which SHRINKS as swap renames proceed. If out_dir already holds
    shard tars we cannot tell old-corpus tars from already-renamed new
    ones, and trusting the listing could delete committed shards.
    Refuse automatic recovery, preserving everything for inspection."""
    import shutil

    from dbt_snowflake_feature_store_spark.sources.webdataset import (
        _WDS_COMMIT,
        recover_webdataset,
    )

    out = str(tmp_path / "wds_legacy")
    export_webdataset(
        media_df.repartition(1), out, key_col="key", samples_per_shard=5
    )  # live corpus in out_dir
    old_tars = sorted(f for f in os.listdir(out) if f.endswith(".tar"))
    staging = os.path.join(out, "_staging-cafebabe0000")
    os.makedirs(staging)
    shutil.copy(
        os.path.join(out, old_tars[0]), os.path.join(staging, old_tars[0])
    )
    with open(os.path.join(staging, _WDS_COMMIT), "w") as fh:
        fh.write("cafebabe0000")  # legacy pre-manifest format

    with pytest.raises(RuntimeError, match="legacy"):
        recover_webdataset(out)
    # nothing was mutated: corpus and staging both intact
    assert sorted(f for f in os.listdir(out) if f.endswith(".tar")) == old_tars
    assert os.path.isdir(staging)
    assert os.path.exists(os.path.join(staging, old_tars[0]))


def test_recover_legacy_marker_fresh_outdir_rolls_forward(
    spark, tmp_path, media_df
):
    """The legacy fallback stays valid for the one state it ever
    guaranteed: no swap step ran (out_dir has no shard tars), so the
    staging listing IS the committed set."""
    import shutil

    from dbt_snowflake_feature_store_spark.sources.webdataset import (
        _WDS_COMMIT,
        recover_webdataset,
    )

    src = str(tmp_path / "wds_src")
    export_webdataset(
        media_df.limit(4).repartition(1), src, key_col="key",
        samples_per_shard=5,
    )
    out = str(tmp_path / "wds_fresh")
    staging = os.path.join(out, "_staging-0badf00d0000")
    os.makedirs(staging)
    for f in os.listdir(src):
        shutil.copy(os.path.join(src, f), os.path.join(staging, f))
    with open(os.path.join(staging, _WDS_COMMIT), "w") as fh:
        fh.write("0badf00d0000")  # legacy pre-manifest format

    recover_webdataset(out)
    assert len([f for f in os.listdir(out) if f.endswith(".tar")]) == 1
    assert not [
        d for d in os.listdir(out) if d.startswith(("_staging-", "_old-"))
    ]
    assert read_webdataset(spark, out).select("key").distinct().count() == 4
