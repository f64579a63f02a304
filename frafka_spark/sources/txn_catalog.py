"""Cross-table ATOMIC COMMIT — a versioned snapshot CATALOG
(round 12, VERDICT r11 ask #4).

A manifest table commits atomically, but a corpus and its index
tables advance in SEPARATE commits (llm/index_store.py applies the
CDF after the corpus commit): a crash between the two leaves an index
a direct reader can observe behind its corpus. The warehouse answer —
Iceberg's REST-catalog multi-table transactions, Delta's coordinated
commits — is to move the COMMIT POINT up one level: readers resolve
every table's version through a catalog snapshot, and one atomic
catalog-file create publishes the whole set of table versions
together. Table-level commits become invisible staging (exactly like
data files are invisible until a manifest references them).

Protocol:

- a catalog snapshot is a JSON file ``_catalog/v%012d.json`` mapping
  ``alias → {path, version}``, created with ``O_CREAT|O_EXCL`` (the
  same single-create commit point as ``manifest_table._commit`` —
  one writer wins a catalog version);
- a WRITER performs its per-table commits first (corpus append, index
  CDF apply, …) and THEN commits the catalog entry naming the new
  versions. A crash anywhere before the catalog create leaves
  catalog readers on the previous snapshot of EVERY table — the
  pre-transaction pair, never a mixed state;
- RECOVERY is exactly-once per table via txn markers: the FINAL
  table commit of each per-table applier is stamped with the txn id
  (``write_table(manifest_extra={"txn_id": ...})``), so a retry of
  the same transaction ADOPTS a crashed attempt's completed table
  work instead of re-applying it (``run_txn``). Appliers whose
  intermediate commits are effect-idempotent (absolute-predicate DML,
  key-set deletes) therefore converge from ANY crash point.

Scale note: the catalog file is O(tables) bytes — the commit cost of
a cross-table transaction is one conditional PUT regardless of data
size, the same property the table manifests have for files.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from frafka_spark.sources.manifest_table import (
    CommitConflict,
    _manifest_path,
    _read_manifest,
    current_version,
    read_table,
)


def _catalog_dir(cat_dir: str) -> str:
    return os.path.join(cat_dir, "_catalog")


def _catalog_path(cat_dir: str, version: int) -> str:
    return os.path.join(_catalog_dir(cat_dir), f"v{version:012d}.json")


def catalog_current(cat_dir: str) -> tuple[int | None, dict]:
    """(version, snapshot) of the latest catalog commit — ``(None,
    {})`` for an empty catalog. The snapshot maps alias →
    {path, version}."""
    cdir = _catalog_dir(cat_dir)
    if not os.path.isdir(cdir):
        return None, {}
    versions = [
        int(f[1:-5])
        for f in os.listdir(cdir)
        if f.startswith("v") and f.endswith(".json")
    ]
    if not versions:
        return None, {}
    v = max(versions)
    with open(_catalog_path(cat_dir, v)) as fh:
        return v, json.load(fh)


def catalog_commit(
    cat_dir: str,
    tables: dict[str, dict],
    txn_id: str | None = None,
    parent: int | None = None,
) -> int:
    """Atomically publish a new catalog snapshot naming every table's
    version — THE cross-table commit point. ``tables`` maps alias →
    ``{"path": str, "version": int}``; versions must exist and never
    move backwards vs the current snapshot (a transaction may leave a
    table untouched, but never unpublish history). Raises
    ``CommitConflict`` when another writer wins the catalog version
    (or when ``parent`` no longer matches the head — the optimistic
    check for read-modify-write callers)."""
    import time

    cur_v, cur = catalog_current(cat_dir)
    if parent is not None and cur_v != parent:
        raise CommitConflict(
            f"catalog advanced to v{cur_v} (expected v{parent}); "
            "re-read and retry"
        )
    for alias, entry in tables.items():
        head = current_version(entry["path"])
        if head is None or entry["version"] > head:
            raise ValueError(
                f"table {alias!r} has no committed v{entry['version']} "
                f"at {entry['path']}"
            )
        prev = cur.get("tables", {}).get(alias)
        if prev is not None and entry["version"] < prev["version"]:
            raise ValueError(
                f"table {alias!r} would move backwards "
                f"(v{prev['version']} → v{entry['version']}); restore is "
                "a FORWARD table commit, publish that version instead"
            )
    version = 0 if cur_v is None else cur_v + 1
    snapshot = {
        "version": version,
        "parent": cur_v,
        "tables": tables,
        "committed_at": time.time(),
    }
    if txn_id is not None:
        snapshot["txn_id"] = txn_id
    os.makedirs(_catalog_dir(cat_dir), exist_ok=True)
    target = _catalog_path(cat_dir, version)
    try:
        fd = os.open(target, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o644)
    except FileExistsError as exc:
        raise CommitConflict(
            f"catalog version {version} already committed at {target}"
        ) from exc
    with os.fdopen(fd, "w") as fh:
        json.dump(snapshot, fh, indent=1, sort_keys=True)
    return version


def read_catalog_table(
    spark: SparkSession, cat_dir: str, alias: str,
    catalog_version: int | None = None,
) -> DataFrame:
    """Read a table AT the catalog-pinned version — the consistent
    cross-table view. Any commits a table accrued beyond its
    published version (a crashed transaction's staging) are invisible
    here, which is the whole point."""
    v, snap = (
        catalog_current(cat_dir)
        if catalog_version is None
        else (
            catalog_version,
            json.load(open(_catalog_path(cat_dir, catalog_version))),
        )
    )
    if v is None:
        raise FileNotFoundError(f"no catalog snapshot under {cat_dir}")
    entry = snap["tables"][alias]
    return read_table(spark, entry["path"], version=entry["version"])


def txn_table_version(
    path: str, txn_id: str, above_version: int
) -> int | None:
    """The version of a commit stamped with ``txn_id`` strictly above
    ``above_version`` — a crashed attempt's completed work, found by
    scanning the (short: head − published) uncatalogued manifest
    suffix. None when the transaction never finished this table."""
    head = current_version(path)
    if head is None:
        return None
    for v in range(head, above_version, -1):
        if not os.path.exists(_manifest_path(path, v)):
            continue
        if _read_manifest(path, v).get("txn_id") == txn_id:
            return v
    return None


def run_txn(
    cat_dir: str,
    txn_id: str,
    appliers: dict[str, "object"],
    retries: int = 3,
) -> int:
    """Execute a multi-table transaction EXACTLY ONCE and publish it
    atomically. ``appliers`` maps alias → ``fn(pinned_version) ->
    new_version``; each applier must stamp its FINAL table commit
    with ``{"txn_id": txn_id}`` (``write_table(manifest_extra=...)``)
    so a retry after a crash ADOPTS completed per-table work instead
    of re-applying it, and its intermediate commits must be
    effect-idempotent. Appliers run in dict order (so an index
    applier can read the corpus applier's CDF window). Returns the
    committed catalog version; a lost catalog race re-resolves and
    retries the ADOPTION path (the table work is already stamped)."""
    for attempt in range(retries + 1):
        cur_v, cur = catalog_current(cat_dir)
        if cur_v is None:
            raise FileNotFoundError(f"no catalog snapshot under {cat_dir}")
        if cur.get("txn_id") == txn_id:
            return cur_v  # the transaction already published — no-op
        new: dict[str, dict] = {}
        for alias, apply_fn in appliers.items():
            entry = cur["tables"][alias]
            done = txn_table_version(
                entry["path"], txn_id, entry["version"]
            )
            new_version = (
                done if done is not None else apply_fn(entry["version"])
            )
            new[alias] = {"path": entry["path"], "version": new_version}
        try:
            return catalog_commit(cat_dir, new, txn_id=txn_id, parent=cur_v)
        except CommitConflict:
            if attempt == retries:
                raise
    raise AssertionError("unreachable")
