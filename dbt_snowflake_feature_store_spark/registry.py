"""Metadata registry — the Spark-native replacement for Snowflake TAGs.

The reference encodes ALL feature-store metadata in Snowflake TAG objects
and discovers it with ``SHOW TAGS`` / ``INFORMATION_SCHEMA.TAG_REFERENCES``
(/root/reference/macros/materializations/entity.sql:23-34,
/root/reference/macros/materializations/feature_view.sql:59-97). That is a
metadata-plane concern, not a data-plane one: the payload is a handful of
small JSON documents. We therefore keep the registry as JSON documents under
``<root>/_registry/<kind>/<key>.json`` with atomic tmp+rename writes — no
Spark job is ever needed for a metadata read, which also removes the
reference's N+1 ``SHOW TAGS`` round-trip anti-pattern
(feature_view.sql:45-57 + :85-96 — one ``SHOW TAGS`` per entity, twice).

Scale note: at 100 TB the *data* lives in partitioned Parquet/Delta read by
executors; the registry stays O(number of registered objects) and is read
only by the driver. Plain ``put`` assumes a single writer (the reference has
the same implicit model — dbt runs serially per target); concurrent writers
use ``locked_update`` (flock-serialized read-modify-write with a ``_rev``
counter). On a real cluster the same layout works on any Hadoop-compatible
FS; the local-FS backend here is the only container-testable one.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Callable, Iterator

VALID_KINDS = (
    "entities", "feature_views", "datasets", "sources", "ann_indexes",
    "snapshots", "online_stores", "exposures", "semantic_models",
    "metrics", "saved_queries", "saved_exports",
)


class Registry:
    """JSON-document registry rooted at ``<root>/_registry``."""

    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        self.base = os.path.join(self.root, "_registry")

    # -- lifecycle ---------------------------------------------------------
    def initialize(self) -> None:
        """Idempotent create, mirroring ``CREATE SCHEMA/TAG IF NOT EXISTS``
        (/root/reference/macros/feature_store/init_feature_store.sql:20-32).
        """
        for kind in VALID_KINDS:
            os.makedirs(os.path.join(self.base, kind), exist_ok=True)

    def is_initialized(self) -> bool:
        return os.path.isdir(self.base)

    # -- low-level document ops ---------------------------------------------
    def _path(self, kind: str, key: str) -> str:
        if kind not in VALID_KINDS:
            raise ValueError(
                f"unknown registry kind {kind!r} (valid: {VALID_KINDS})"
            )
        return os.path.join(self.base, kind, f"{key}.json")

    def put(self, kind: str, key: str, doc: dict[str, Any]) -> None:
        """Atomic upsert (write tmp file in the same dir, rename over)."""
        path = self._path(kind, key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(doc, f, indent=1, sort_keys=True)
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def locked_update(
        self,
        kind: str,
        key: str,
        mutate: Callable[[dict[str, Any] | None], dict[str, Any]],
    ) -> dict[str, Any]:
        """Serialized read-modify-write for concurrent writers.

        ``put`` is atomic (tmp+rename) but last-writer-wins: two writers
        doing read→modify→put on the same document can lose an update.
        ``locked_update`` holds an exclusive ``flock`` on a per-document
        lock file across the read-modify-write, so concurrent updates
        serialize instead of clobbering. Each write bumps a ``_rev``
        counter, which doubles as the change-detection epoch.

        This is the multi-writer path; single-writer callers can keep
        using ``put`` (the reference has the same implicit single-writer
        model — dbt runs serially per target). On object stores without
        POSIX locks, replace with a conditional-put (ETag) backend.
        """
        path = self._path(kind, key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        lock_path = path + ".lock"
        import fcntl

        with open(lock_path, "a") as lock_f:
            fcntl.flock(lock_f.fileno(), fcntl.LOCK_EX)
            try:
                current = self.get(kind, key)
                doc = mutate(current)
                doc["_rev"] = (current.get("_rev", 0) if current else 0) + 1
                self.put(kind, key, doc)
                return doc
            finally:
                fcntl.flock(lock_f.fileno(), fcntl.LOCK_UN)

    def get(self, kind: str, key: str) -> dict[str, Any] | None:
        path = self._path(kind, key)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def delete(self, kind: str, key: str) -> bool:
        path = self._path(kind, key)
        if os.path.exists(path):
            os.unlink(path)
            return True
        return False

    def exists(self, kind: str, key: str) -> bool:
        return os.path.exists(self._path(kind, key))

    def list(self, kind: str) -> Iterator[dict[str, Any]]:
        d = os.path.join(self.base, kind)
        if not os.path.isdir(d):
            return
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".json"):
                with open(os.path.join(d, fn)) as f:
                    yield json.load(f)

    def keys(self, kind: str) -> list[str]:
        d = os.path.join(self.base, kind)
        if not os.path.isdir(d):
            return []
        return sorted(fn[:-5] for fn in os.listdir(d) if fn.endswith(".json"))
