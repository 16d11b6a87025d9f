"""WebDataset-style sharded tar export/import (pure stdlib ``tarfile``).

The delivery format multimodal training loaders consume (WebDataset:
"a tar per shard, files per sample, extension per modality" —
sample ``000017.txt`` + ``000017.png`` + ``000017.json`` grouped by
basename). A 100 TB corpus ships as thousands of independent shards that
data loaders stream sequentially — exactly the layout this writer
produces from any DataFrame.

Spark-first design: the export is ``foreachPartition`` — every partition
writes its OWN shard tars (no driver involvement, no shuffle beyond the
caller's partitioning); shard files are named ``shard-{partition:05d}-
{seq:05d}.tar`` so re-runs overwrite deterministically. Rows must carry
a unique ``key_col`` (the sample basename); every OTHER column becomes
one member file per sample: ``bytes``/``bytearray`` columns verbatim
(e.g. a PNG payload), strings as UTF-8 ``.txt``, everything else JSON.
Determinism: members are written in (key, extension) order with zeroed
mtimes, so a shard's bytes depend only on its rows — re-exports of
identical partitions are byte-identical (pytest-pinned).

Scale note: ``samples_per_shard`` bounds shard size (loaders want
100–1000 samples/shard); a partition with more rows emits several
sequential tars. Import (``read_webdataset``) is the inverse — a
``binaryFile`` scan of the tars + a ``mapInPandas`` member parser —
provided for round-trip tests and small-scale reads; big pipelines read
shards directly in their data loader, not through Spark.
"""

from __future__ import annotations

import io
import json
import os
import shutil
import tarfile
import uuid

from pyspark.sql import DataFrame, SparkSession


_WDS_COMMIT = "_FS_COMMIT"


def _shard_tars(d: str) -> list[str]:
    return sorted(
        f
        for f in os.listdir(d)
        if f.startswith("shard-") and f.endswith(".tar")
    )


def _swap_in(out_dir: str, staging: str, token: str, manifest: list[str]) -> None:
    """Swap a COMMITTED staging dir into place. ``manifest`` is the
    authoritative shard list recorded in the commit marker — NOT a
    listing of the staging dir, which stops naming shards the moment
    they are renamed into place: a crash between the per-file renames
    of step 2 would otherwise make a recovery re-run treat
    already-swapped-in NEW shards as stale and delete them (permanent
    data loss). Against the manifest every step is idempotent: (1) old
    tars NOT in the manifest move aside into ``_old-{token}``, (2)
    manifest tars still in staging ``os.rename`` into place — atomic
    per file, silently replacing the same-named predecessor; manifest
    tars already in ``out_dir`` were swapped in by a previous
    (interrupted) attempt and are kept, (3) the old dir and the staging
    dir (with its commit marker) are removed last."""
    staged = set(manifest)
    # completeness check BEFORE any mutation: if a committed shard is
    # missing from both staging and out_dir, refuse with the corpus
    # intact (review r11: the old mid-loop check fired after old tars
    # had already moved aside, leaving a mixed corpus behind the error)
    missing = [
        f
        for f in sorted(staged)
        if not os.path.exists(os.path.join(staging, f))
        and not os.path.exists(os.path.join(out_dir, f))
    ]
    if missing:
        raise RuntimeError(
            f"webdataset swap: committed shard(s) {missing} missing from "
            f"both staging and '{out_dir}' — corpus incomplete, refusing "
            "to start the swap (old corpus and staging preserved for "
            "inspection)"
        )
    old_dir = os.path.join(out_dir, f"_old-{token}")
    os.makedirs(old_dir, exist_ok=True)
    for f in _shard_tars(out_dir):
        if f not in staged:
            os.rename(
                os.path.join(out_dir, f), os.path.join(old_dir, f)
            )
    for f in sorted(staged):
        src = os.path.join(staging, f)
        if os.path.exists(src):
            os.rename(src, os.path.join(out_dir, f))
        # else: already swapped in by a previous (interrupted) attempt
    shutil.rmtree(old_dir, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)


def _read_manifest(staging: str, out_dir: str) -> list[str]:
    """Shard list from the commit marker. Markers are JSON
    ``{"token": ..., "shards": [...]}``; a legacy bare-token marker
    (pre-manifest format) falls back to listing the staging dir —
    correct ONLY if no swap step ran (the listing shrinks as renames
    proceed, so a mid-swap interrupt would make recovery treat the
    already-renamed new shards as stale and delete them — ADVICE r11).
    If ``out_dir`` already holds shard tars we cannot tell old-corpus
    shards from already-swapped-in new ones: refuse automatic recovery
    and hand the operator the manual path."""
    with open(os.path.join(staging, _WDS_COMMIT)) as f:
        raw = f.read()
    try:
        data = json.loads(raw)
        if isinstance(data, dict) and isinstance(data.get("shards"), list):
            return [str(s) for s in data["shards"]]
    except ValueError:
        pass
    if _shard_tars(out_dir):
        raise RuntimeError(
            f"webdataset recovery: '{staging}' carries a legacy "
            "(pre-manifest) commit marker and the output dir already "
            f"contains shard tars — a legacy swap may have been "
            "interrupted mid-rename, and the staging listing can no "
            "longer be trusted as the committed shard set. Refusing "
            "automatic recovery. Inspect manually: shards still in "
            "staging belong to the new export; decide per shard, then "
            "remove the staging dir (everything is preserved)."
        )
    return _shard_tars(staging)


def recover_webdataset(out_dir: str) -> None:
    """Repair an interrupted :func:`export_webdataset` (idempotent,
    called automatically at the start of every export): a staging dir
    WITH the commit marker holds a complete shard set — roll its swap
    FORWARD against the marker's shard manifest (shards already renamed
    into place by an interrupted swap are recognized and kept); one
    without the marker is an aborted write — delete it (the previous
    corpus is untouched by construction, the swap only starts after
    the marker). Orphaned ``_old-*`` dirs from hard-killed swaps are
    swept last. A staging that REFUSES automatic recovery (legacy
    marker over a live corpus, or a committed shard missing) does not
    block the others: every recoverable staging is processed first,
    the refused ones (and their ``_old-{token}`` dirs, which may hold
    old-corpus tars moved aside mid-swap) are preserved, and ONE
    aggregated error raises at the end. NOT safe to run concurrently
    with a live export into the same dir (it would sweep the in-flight
    staging)."""
    if not os.path.isdir(out_dir):
        return
    refused: list[tuple[str, str]] = []
    refused_tokens: set[str] = set()
    for s in sorted(os.listdir(out_dir)):
        if not s.startswith("_staging-"):
            continue
        sp = os.path.join(out_dir, s)
        if not os.path.isdir(sp):
            continue
        if os.path.exists(os.path.join(sp, _WDS_COMMIT)):
            token = s.split("-", 1)[1]
            try:
                _swap_in(out_dir, sp, token, _read_manifest(sp, out_dir))
            except RuntimeError as e:
                refused.append((s, str(e)))
                refused_tokens.add(token)
        else:
            shutil.rmtree(sp, ignore_errors=True)
    for o in sorted(os.listdir(out_dir)):
        if o.startswith("_old-") and o[5:] not in refused_tokens:
            shutil.rmtree(os.path.join(out_dir, o), ignore_errors=True)
    if refused:
        raise RuntimeError(
            f"webdataset recovery: {len(refused)} staging dir(s) refused "
            "automatic recovery (everything else was recovered; the "
            "refused staging and matching _old dirs are preserved):\n"
            + "\n".join(f"- {s}: {msg}" for s, msg in refused)
        )


def _member_bytes(value, col: str) -> tuple[str, bytes]:
    """(extension, payload) for one column value."""
    if isinstance(value, (bytes, bytearray)):
        ext = "png" if bytes(value[:8]) == b"\x89PNG\r\n\x1a\n" else "bin"
        return ext, bytes(value)
    if isinstance(value, str):
        return "txt", value.encode("utf-8")
    return "json", json.dumps(value, default=str).encode("utf-8")


def export_webdataset(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    samples_per_shard: int = 256,
) -> int:
    """Write ``df`` as WebDataset shard tars under ``out_dir``. Returns
    the number of shards written. Columns other than ``key_col`` become
    per-sample member files named ``{key}.{ext}``."""
    os.makedirs(out_dir, exist_ok=True)
    cols = df.columns
    if key_col not in cols:
        raise ValueError(f"key_col '{key_col}' not in DataFrame columns")
    data_cols = [c for c in cols if c != key_col]
    if not data_cols:
        raise ValueError("export needs at least one non-key column")
    # Member names are '{key}.{column}.{ext}' and the reader splits on
    # the LAST two dots — a dot inside a column name would round-trip
    # with the wrong (key, column, ext) split. Fail fast at export.
    dotted = [c for c in data_cols if "." in c]
    if dotted:
        raise ValueError(
            f"column names must not contain '.' (member-name separator): "
            f"{dotted}; rename before export"
        )
    # A re-export that yields fewer shards (fewer rows/partitions) must
    # not leave stale tars from the previous run mixed into the corpus —
    # but clearing up front would destroy the previous corpus if the
    # distributed write then fails midway. Commit-marker stage-and-swap
    # (the ParquetSnapshotFormat.replace protocol, minus the directory
    # atomicity its single-rename layout buys): shards land in a fresh
    # staging dir; a _FS_COMMIT marker written AFTER foreachPartition
    # certifies completeness; only then does the swap start, and every
    # swap step is idempotent so a crash at ANY point is repaired by
    # recover_webdataset (roll forward if marked, roll back if not).
    # recover also sweeps staging/old orphans from hard-killed runs.
    recover_webdataset(out_dir)
    token = uuid.uuid4().hex[:12]
    staging = os.path.join(out_dir, f"_staging-{token}")
    os.makedirs(staging)

    def write_partition(rows) -> None:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seq, n_in_shard, tar = 0, 0, None

        def _open(seq_no: int):
            return tarfile.open(
                os.path.join(staging, f"shard-{pid:05d}-{seq_no:05d}.tar"),
                "w",
            )

        for row in rows:
            if tar is None:
                tar = _open(seq)
            d = row.asDict()
            key = str(d[key_col])
            for c in sorted(data_cols):
                ext, payload = _member_bytes(d[c], c)
                info = tarfile.TarInfo(name=f"{key}.{c}.{ext}")
                info.size = len(payload)
                info.mtime = 0  # deterministic bytes
                tar.addfile(info, io.BytesIO(payload))
            n_in_shard += 1
            if n_in_shard >= samples_per_shard:
                tar.close()
                tar, seq, n_in_shard = None, seq + 1, 0
        if tar is not None:
            tar.close()

    try:
        df.foreachPartition(write_partition)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    # marker AFTER the data: its presence certifies a complete write,
    # and it carries the authoritative shard MANIFEST so a recovery
    # re-run of the swap never mistakes already-swapped-in shards for
    # stale ones (the staging listing shrinks as renames proceed; the
    # manifest does not)
    manifest = _shard_tars(staging)
    with open(os.path.join(staging, _WDS_COMMIT), "w") as f:
        json.dump({"token": token, "shards": manifest}, f)
    _swap_in(out_dir, staging, token, manifest)
    return len(_shard_tars(out_dir))


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Inverse scan: one output row per (shard, sample key, member) —
    ``binaryFile`` over the tars + an Arrow ``mapInPandas`` member
    parser (executor-local; shards never pass through the driver)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.tar")
    ).select("path", "content")

    def parse(it):
        for pdf in it:
            shards, keys, members, exts, sizes, payloads = [], [], [], [], [], []
            for p, content in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tar:
                    for m in tar.getmembers():
                        base, col, ext = m.name.rsplit(".", 2)
                        shards.append(os.path.basename(p))
                        keys.append(base)
                        members.append(col)
                        exts.append(ext)
                        sizes.append(m.size)
                        payloads.append(tar.extractfile(m).read())
            yield pd.DataFrame(
                {
                    "shard": shards,
                    "key": keys,
                    "column": members,
                    "ext": exts,
                    "n_bytes": sizes,
                    "payload": payloads,
                }
            )

    return files.mapInPandas(
        parse,
        schema=(
            "shard string, key string, column string, ext string, "
            "n_bytes long, payload binary"
        ),
    )
