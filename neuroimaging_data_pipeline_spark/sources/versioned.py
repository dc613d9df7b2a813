"""Versioned parquet tables: copy-on-write mutation + time travel.

The reference mutates metadata in place (S10: jq-rewrite of sidecar
JSON, ``preprocess_parallel.sh:110``; fieldmap IntendedFor updates).
In-place mutation doesn't exist in a distributed object store, so the
engine provides the standard lakehouse shape instead (a minimal
Delta/Iceberg-style layer, self-contained — no external packages):

- every write is a NEW immutable version directory ``v=N`` under the
  table root, committed by atomically renaming a manifest file;
- readers resolve the manifest (latest or pinned ``version=`` — time
  travel) and scan exactly one version's parquet;
- ``update_where`` / ``delete_where`` are copy-on-write: read latest,
  apply the mutation as a DataFrame transform, write the next version.

Scale notes: the commit point is a single driver-side manifest rename
(object-store PUT) — data files stream through executors as a normal
distributed parquet write; no listing races because readers never
glob, they read the manifest. Concurrent writers: last manifest wins
(single-writer discipline assumed, like Delta without a log store).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import Column, DataFrame, SparkSession

_MANIFEST = "_manifest.json"


def _read_manifest(root: str) -> dict:
    p = os.path.join(root, _MANIFEST)
    if not os.path.exists(p):
        return {"versions": []}
    with open(p) as f:
        return json.load(f)


def _commit_manifest(root: str, doc: dict) -> None:
    tmp = os.path.join(root, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=2)
    os.replace(tmp, os.path.join(root, _MANIFEST))  # atomic commit


def table_versions(root: str) -> list[int]:
    return [v["version"] for v in _read_manifest(root)["versions"]]


def write_version(df: DataFrame, root: str, operation: str = "write") -> int:
    """Write ``df`` as the table's next version; returns the version."""
    os.makedirs(root, exist_ok=True)
    doc = _read_manifest(root)
    next_v = max(table_versions(root), default=-1) + 1
    path = os.path.join(root, f"v={next_v}")
    df.write.mode("errorifexists").parquet(path)
    doc["versions"].append(
        {
            "version": next_v,
            "path": f"v={next_v}",
            "operation": operation,
            "committed_at": int(time.time()),
        }
    )
    _commit_manifest(root, doc)
    return next_v


def read_version(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read the latest version, or a pinned one (time travel)."""
    doc = _read_manifest(root)
    if not doc["versions"]:
        raise FileNotFoundError(f"no committed versions under {root}")
    versions = {v["version"]: v for v in doc["versions"]}
    live = [n for n, v in versions.items() if not v.get("expired")]
    v = max(live) if version is None else version
    if v not in versions:
        raise ValueError(
            f"version {v} not in table (have {sorted(versions)})"
        )
    if versions[v].get("expired"):
        raise ValueError(f"version {v} was vacuumed (expired)")
    return spark.read.parquet(os.path.join(root, versions[v]["path"]))


def update_where(
    spark: SparkSession,
    root: str,
    condition: Column,
    set_exprs: dict[str, Column],
) -> int:
    """Copy-on-write UPDATE ... SET ... WHERE: rows matching
    ``condition`` get ``set_exprs`` applied; all rows carry forward."""
    from pyspark.sql import functions as F

    cur = read_version(spark, root)
    out = cur.select(
        *[
            F.when(condition, set_exprs[c]).otherwise(F.col(c)).alias(c)
            if c in set_exprs
            else F.col(c)
            for c in cur.columns
        ]
    )
    return write_version(out, root, operation="update")


def delete_where(spark: SparkSession, root: str, condition: Column) -> int:
    """Copy-on-write DELETE WHERE.

    NULL-predicate rows are RETAINED, matching SQL DELETE semantics:
    ``~condition`` alone would evaluate NULL for them and silently drop
    them from the filter, so the condition is coalesced to FALSE first.
    """
    from pyspark.sql import functions as F

    cur = read_version(spark, root)
    keep = ~F.coalesce(condition, F.lit(False))
    return write_version(cur.filter(keep), root, operation="delete")


def merge_into(
    spark: SparkSession,
    root: str,
    source: DataFrame,
    on: list[str],
) -> int:
    """Copy-on-write MERGE (upsert): rows matching ``on`` keys are
    REPLACED by the source row (WHEN MATCHED UPDATE SET *), unmatched
    source rows are inserted (WHEN NOT MATCHED INSERT *), everything
    else carries forward — the Delta-style default upsert. The
    current side moves through a left-anti join on the bare keys
    (compact shuffle), then one unionByName with the source."""
    cur = read_version(spark, root)
    survivors = cur.join(source.select(on), on, "left_anti")
    return write_version(
        survivors.unionByName(source.select(cur.columns)),
        root,
        operation="merge",
    )


def vacuum(root: str, keep_last: int = 1) -> list[int]:
    """Expire all but the newest ``keep_last`` versions: their data
    directories are deleted and their manifest entries marked
    ``expired`` (the history of operations stays auditable, the bytes
    are gone — Delta VACUUM semantics). Returns the expired version
    numbers. Reading an expired version raises; latest reads are
    untouched. The commit point is the same single atomic manifest
    rename as every other mutation."""
    import shutil

    doc = _read_manifest(root)
    live = [v for v in doc["versions"] if not v.get("expired")]
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    to_expire = sorted(live, key=lambda v: v["version"])[:-keep_last]
    expired = []
    for v in to_expire:
        shutil.rmtree(os.path.join(root, v["path"]), ignore_errors=True)
        v["expired"] = True
        v["expired_at"] = int(time.time())
        expired.append(v["version"])
    _commit_manifest(root, doc)
    return expired


def append_txn(df: DataFrame, root: str, txn_id: str) -> int | None:
    """EXACTLY-ONCE append: write ``df`` as the next version tagged
    with ``txn_id``; if a version carrying that txn_id is already
    committed, DO NOTHING and return None (idempotent replay). This
    is the sink contract a Structured Streaming ``foreachBatch``
    needs — micro-batches are delivered at-least-once on failure
    recovery, and the (query_id, batch_id) pair as txn_id turns that
    into exactly-once table state: a replayed batch hits the
    manifest check and is dropped before any data write. The check
    and the manifest append are both against the atomically-replaced
    manifest file, so a half-written data directory without a
    manifest entry is invisible (the same commit protocol the other
    DML ops use)."""
    os.makedirs(root, exist_ok=True)
    doc = _read_manifest(root)
    for v in doc["versions"]:
        if v.get("txn_id") == txn_id:
            return None
    next_v = max(table_versions(root), default=-1) + 1
    path = os.path.join(root, f"v={next_v}")
    df.write.mode("overwrite").parquet(path)  # replay-safe data write
    doc = _read_manifest(root)  # re-read: writer may have raced
    for v in doc["versions"]:
        if v.get("txn_id") == txn_id:
            return None
    doc["versions"].append(
        {
            "version": next_v,
            "path": f"v={next_v}",
            "operation": "append",
            "txn_id": txn_id,
            "committed_at": int(time.time()),
        }
    )
    _commit_manifest(root, doc)
    return next_v


def read_all_appends(spark: SparkSession, root: str) -> DataFrame:
    """Union of every committed append version — the consumer view of
    an append-only exactly-once table."""
    doc = _read_manifest(root)
    paths = [
        os.path.join(root, v["path"])
        for v in doc["versions"]
        if not v.get("expired")
    ]
    if not paths:
        raise FileNotFoundError(f"no committed versions under {root}")
    return spark.read.parquet(*paths)


def list_data_files(root: str, version: int | None = None) -> list[str]:
    """Parquet part files of a version's data directory (latest when
    ``version`` is None) — the observable surface of layout ops."""
    doc = _read_manifest(root)
    versions = {v["version"]: v for v in doc["versions"]}
    live = [n for n, v in versions.items() if not v.get("expired")]
    v = max(live) if version is None else version
    d = os.path.join(root, versions[v]["path"])
    return sorted(
        f for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith("_")
    )


def compact(
    spark: SparkSession,
    root: str,
    target_files: int,
    sort_by: list[str] | None = None,
) -> dict:
    """OPTIMIZE-style file-layout maintenance (the one lakehouse
    verb the DML family above doesn't cover): rewrite the LATEST
    version's rows into ``target_files`` parquet files — bin-packing
    the small-file debris that per-micro-batch appends and
    copy-on-write updates accumulate — optionally range-clustering by
    ``sort_by`` (repartitionByRange + sortWithinPartitions, so each
    output file owns a disjoint key range and min/max footer stats
    prune like a coarse index). Rows are IDENTICAL; the rewrite
    commits as a new version (operation='compact'), so time travel
    still reaches the un-compacted layout and a crashed compaction is
    invisible (no manifest entry). Returns {"version",
    "files_before", "files_after"}.

    Scale: the rewrite is one distributed shuffle-write sized by
    ``target_files`` (pick bytes/file ~ 128-512 MB at 100 TB); the
    commit is the same single atomic manifest rename as every other
    mutation."""
    if target_files < 1:
        raise ValueError("target_files must be >= 1")
    files_before = len(list_data_files(root))
    df = read_version(spark, root)
    if sort_by:
        out = df.repartitionByRange(target_files, *sort_by)
        out = out.sortWithinPartitions(*sort_by)
    else:
        out = df.coalesce(target_files)
    v = write_version(out, root, operation="compact")
    return {
        "version": v,
        "files_before": files_before,
        "files_after": len(list_data_files(root, v)),
    }
