"""Commit snapshots — the SnapshotDeletionPolicy / stale-commit surface.

Reference roles recreated (not ported):

- ``SnapshotDeletionPolicy.snapshot()`` (s84 core
  index/SnapshotDeletionPolicy.java:56): pin the CURRENT commit so its
  files survive later merges/deletes — the backup/replication primitive.
  Here a snapshot is a self-contained copy of the manifest (and of the
  current tombstone generation) under ``<index>/commits/``, plus an entry
  in the snapshot registry listing the pinned segment directories.
- ``IndexDeletionPolicy`` file GC (demo
  LuceneDemo/src/main/java/lucene/index/IndexDeletePolicyTest.java,
  StaleIndexCommit.java): compaction and reclaim normally delete replaced
  segment dirs right after the manifest commit
  (KeepOnlyLastCommitDeletionPolicy); when a snapshot pins a segment the
  delete is DEFERRED — ``protected_segments`` tells the merge paths what
  to skip, and ``gc_unreferenced`` sweeps orphans once the snapshot is
  released.
- ``DirectoryReader.open(IndexCommit)``: ``open_snapshot`` opens an
  IndexSearcher on the pinned manifest — search results as of the old
  commit, unaffected by later compactions/deletes.

The registry commit is atomic (same fsync-then-rename discipline as the
manifest), so a crash never leaves a half-registered snapshot pinning
nothing.
"""

from __future__ import annotations

import os
import shutil

from .livedocs import load_json, tombstones_path
from .manifest import IndexManifest, atomic_write_json

COMMITS_DIR = "commits"
REGISTRY = "snapshots.json"
_EMPTY_REGISTRY = {"next_id": 0, "snapshots": {}, "deferred": []}


def _registry_path(index_dir: str) -> str:
    return os.path.join(index_dir, COMMITS_DIR, REGISTRY)


def _load_registry(index_dir: str) -> dict:
    p = _registry_path(index_dir)
    if not os.path.exists(p):
        return {k: (dict(v) if isinstance(v, dict) else list(v) if isinstance(v, list) else v)
                for k, v in _EMPTY_REGISTRY.items()}
    return load_json(p)


def snapshot_commit(index_dir: str) -> str:
    """Pin the current commit; returns the snapshot id. Ids come from a
    monotonic registry counter (never reused after a release — a counted
    id could collide with a still-live snapshot). Snapshotting the same
    manifest version twice returns distinct ids pinning the same segments
    (Lucene's snapshot() also hands out one IndexCommit per call)."""
    m = IndexManifest.load(index_dir)
    reg = _load_registry(index_dir)
    snap_id = f"snap_{m.version}_{int(reg['next_id'])}"
    reg["next_id"] = int(reg["next_id"]) + 1
    from dataclasses import asdict

    d = asdict(m)
    d.pop("index_dir", None)
    # self-contained tombstones: the live generation file mutates with
    # later deletes and reclaim unlinks old generations, so the snapshot
    # ALWAYS carries its own frozen copy (empty when no deletes exist yet
    # — pointing at the live path would leak post-snapshot deletes in)
    tpath = tombstones_path(index_dir, manifest=m)
    snap_tname = os.path.join(COMMITS_DIR, f"{snap_id}.liv.json")
    frozen = load_json(tpath) if os.path.exists(tpath) else {"deleted": []}
    atomic_write_json(os.path.join(index_dir, snap_tname), frozen)
    d["tombstones_file"] = snap_tname
    # a snapshot always serves from its pinned segments — a later merge
    # invalidates/rebuilds <index>/merged, which is not pinned
    d["merged"] = False
    atomic_write_json(os.path.join(index_dir, COMMITS_DIR, f"{snap_id}.json"), d)
    reg["snapshots"][snap_id] = {
        "version": int(m.version),
        "segments": [s["seg_name"] for s in m.segments],
    }
    atomic_write_json(_registry_path(index_dir), reg)
    return snap_id


def list_snapshots(index_dir: str) -> dict:
    return _load_registry(index_dir)["snapshots"]


def protected_segments(index_dir: str) -> set[str]:
    """Segment names pinned by any live snapshot — merge/reclaim deletion
    paths must skip these (the deletion-policy hook)."""
    return {n for e in list_snapshots(index_dir).values() for n in e["segments"]}


def remove_segments_unless_pinned(index_dir: str, names) -> None:
    """THE deletion-policy enforcement point for merge paths: delete each
    replaced segment dir now (KeepOnlyLastCommit) unless a snapshot pins
    it — pinned names are recorded as deferred and swept by
    ``gc_unreferenced`` once released."""
    reg = _load_registry(index_dir)
    pinned = {n for e in reg["snapshots"].values() for n in e["segments"]}
    deferred = set(reg["deferred"])
    for name in names:
        if name in pinned:
            deferred.add(name)
        else:
            shutil.rmtree(os.path.join(index_dir, "segments", name),
                          ignore_errors=True)
            deferred.discard(name)
    if set(reg["deferred"]) != deferred:
        reg["deferred"] = sorted(deferred)
        atomic_write_json(_registry_path(index_dir), reg)


def release_snapshot(index_dir: str, snap_id: str) -> None:
    """Unpin a snapshot and sweep deferred segment dirs nothing references."""
    reg = _load_registry(index_dir)
    if snap_id not in reg["snapshots"]:
        raise KeyError(f"unknown snapshot {snap_id!r}")
    del reg["snapshots"][snap_id]
    atomic_write_json(_registry_path(index_dir), reg)
    for suffix in (".json", ".liv.json"):
        p = os.path.join(index_dir, COMMITS_DIR, f"{snap_id}{suffix}")
        if os.path.exists(p):
            os.unlink(p)
    gc_unreferenced(index_dir)


def gc_unreferenced(index_dir: str) -> list[str]:
    """Sweep DEFERRED segment dirs (replaced by a merge while pinned) that
    no live commit references any more. Only names the deletion policy
    recorded are candidates — never arbitrary dirs under segments/, which
    may be completed-but-unmanifested partitions of an in-flight build or
    append (the resume checkpoint window)."""
    m = IndexManifest.load(index_dir)
    reg = _load_registry(index_dir)
    live = {s["seg_name"] for s in m.segments} | {
        n for e in reg["snapshots"].values() for n in e["segments"]
    }
    removed, still_deferred = [], []
    for name in reg["deferred"]:
        if name in live:
            still_deferred.append(name)
            continue
        shutil.rmtree(os.path.join(index_dir, "segments", name), ignore_errors=True)
        removed.append(name)
    if removed:
        reg["deferred"] = still_deferred
        atomic_write_json(_registry_path(index_dir), reg)
    return removed


def open_snapshot(index_dir: str, snap_id: str):
    """IndexSearcher over the pinned commit (DirectoryReader.open(commit))."""
    from ..search.searcher import IndexSearcher

    p = os.path.join(index_dir, COMMITS_DIR, f"{snap_id}.json")
    d = load_json(p)
    d["index_dir"] = index_dir
    manifest = IndexManifest(
        **{k: d[k] for k in IndexManifest.__dataclass_fields__ if k in d}
    )
    return IndexSearcher(index_dir, manifest=manifest)
