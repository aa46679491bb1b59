"""Versioned table sink: snapshot-isolated reads + time travel (K4/O5 made
transactional).

Dynamic partition overwrite (operators/upsert.py) gives idempotent
RECOMPUTE, but a reader that lists files mid-rewrite can still see a
partition half-replaced. This module adds the missing isolation level with
the classic lakehouse commit protocol, reduced to its core: every write
lands in a fresh immutable version directory (``v=N``), and readers resolve
the table through a single manifest file that is published ATOMICALLY
(write-temp + rename). A reader therefore sees exactly one complete
version — never a partial write — and old versions remain readable
(time travel) until vacuumed.

Scale notes: the manifest is one tiny file — the same design point as
Delta's _last_checkpoint / Iceberg's version-hint; data files are immutable
parquet, so concurrent readers of version N are unaffected by the writer
producing N+1. On a POSIX filesystem ``os.replace`` is the atomic commit;
on an object store the equivalent is a conditional put of the manifest
key — the protocol is identical, only the atomic primitive changes. A
crashed writer leaves an orphan ``v=N`` directory that no manifest points
to: readers never see it, and the next successful write simply claims the
next free version (vacuum removes orphans).

Reference grounding: the course's upserts rewrite CSVs in place
(lecture3/13_binance_calculate_hourly.py:79-85) — readers racing that
rewrite see truncated files; this is the at-scale repair.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_manifest.json"


def _manifest_path(path: str) -> str:
    return os.path.join(path, _MANIFEST)


def current_version(path: str) -> int | None:
    """Committed version per the manifest, or None for an empty table.
    Orphan v=N directories without a manifest entry are invisible."""
    try:
        with open(_manifest_path(path)) as f:
            return int(json.load(f)["version"])
    except (OSError, ValueError, KeyError):
        return None


def table_versions(path: str) -> list[int]:
    """All version directories present on disk (committed or orphaned)."""
    try:
        names = os.listdir(path)
    except OSError:
        return []
    out = []
    for n in names:
        if n.startswith("v="):
            try:
                out.append(int(n[2:]))
            except ValueError:
                continue
    return sorted(out)


def write_table_version(df: DataFrame, path: str) -> int:
    """Write ``df`` as the table's next version and atomically publish it.

    The data write (slow, distributed) happens into an unpublished ``v=N``
    directory; the commit is a single manifest rename (fast, atomic). A
    crash before the rename leaves readers on the previous version with no
    cleanup required for correctness."""
    os.makedirs(path, exist_ok=True)
    existing = table_versions(path)
    version = (existing[-1] + 1) if existing else 1
    df.write.mode("errorifexists").parquet(os.path.join(path, f"v={version}"))
    # Preserve the streaming batch ledger (commit_batch) across batch
    # rewrites — dropping it would let a replayed micro-batch double-commit.
    manifest: dict = {"version": version}
    try:
        with open(_manifest_path(path)) as f:
            prior = json.load(f)
        if "batches" in prior:
            manifest["batches"] = prior["batches"]
    except (OSError, ValueError):
        pass
    tmp = _manifest_path(path) + f".tmp.{version}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, _manifest_path(path))  # the atomic commit point
    return version


def read_table(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read the committed snapshot (default) or a specific version (time
    travel). Raises FileNotFoundError for an empty/uncommitted table and
    ValueError for a vacuumed or never-committed version."""
    if version is None:
        version = current_version(path)
        if version is None:
            raise FileNotFoundError(f"no committed version at {path}")
    if version not in table_versions(path):
        raise ValueError(f"version {version} not present at {path}")
    return spark.read.parquet(os.path.join(path, f"v={version}"))


def vacuum_table(path: str, keep_last: int = 2) -> list[int]:
    """Remove all version directories except the newest ``keep_last``
    committed-or-newer ones, INCLUDING orphans from crashed writers.
    Never removes the currently committed version. Returns removed
    versions."""
    import shutil

    committed = current_version(path)
    versions = table_versions(path)
    keep = set(versions[-keep_last:]) if keep_last > 0 else set()
    if committed is not None:
        keep.add(committed)
    removed = []
    for v in versions:
        if v not in keep:
            shutil.rmtree(os.path.join(path, f"v={v}"))
            removed.append(v)
    return removed


def commit_batch(df: DataFrame, path: str, batch_id: int) -> int | None:
    """Exactly-once commit for streaming sinks: write ``df`` as the next
    version UNLESS ``batch_id`` is already in the manifest's batch ledger,
    in which case this is a replay and the call is a no-op (returns None).

    The ledger rides in the same atomically-renamed manifest as the
    version pointer, so "which batches are committed" and "what readers
    see" can never disagree — the property that makes foreachBatch +
    versioned commits exactly-once end-to-end: a crash after the data
    write but before the rename leaves an invisible orphan, and the
    replayed batch claims a fresh version; a crash after the rename makes
    the replay a no-op."""
    committed: dict = {}
    try:
        with open(_manifest_path(path)) as f:
            manifest = json.load(f)
        committed = manifest.get("batches", {})
    except (OSError, ValueError):
        manifest = {}
    if str(batch_id) in committed:
        return None
    os.makedirs(path, exist_ok=True)
    existing = table_versions(path)
    version = (existing[-1] + 1) if existing else 1
    df.write.mode("errorifexists").parquet(os.path.join(path, f"v={version}"))
    committed = dict(committed)
    committed[str(batch_id)] = version
    tmp = _manifest_path(path) + f".tmp.{version}"
    with open(tmp, "w") as f:
        json.dump({"version": version, "batches": committed}, f)
    os.replace(tmp, _manifest_path(path))
    return version
