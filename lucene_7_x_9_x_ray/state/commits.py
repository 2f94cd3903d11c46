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


def _registry_path(index_dir: str) -> str:
    return os.path.join(index_dir, COMMITS_DIR, REGISTRY)


def _load_registry(index_dir: str) -> dict:
    p = _registry_path(index_dir)
    return load_json(p) if os.path.exists(p) else {}


def snapshot_commit(index_dir: str) -> str:
    """Pin the current commit; returns the snapshot id. Idempotent per
    commit generation: snapshotting the same manifest version twice
    returns distinct ids pinning the same segments (Lucene's snapshot()
    also hands out one IndexCommit per call)."""
    m = IndexManifest.load(index_dir)
    reg = _load_registry(index_dir)
    n = sum(1 for k in reg if k.startswith(f"snap_{m.version}_"))
    snap_id = f"snap_{m.version}_{n}"
    from dataclasses import asdict

    d = asdict(m)
    d.pop("index_dir", None)
    # self-contained tombstones: reclaim unlinks old generations, so the
    # snapshot carries its own copy
    tpath = tombstones_path(index_dir, manifest=m)
    if os.path.exists(tpath):
        snap_tname = os.path.join(COMMITS_DIR, f"{snap_id}.liv.json")
        atomic_write_json(os.path.join(index_dir, snap_tname), load_json(tpath))
        d["tombstones_file"] = snap_tname
    # a snapshot always serves from its pinned segments — a later merge
    # invalidates/rebuilds <index>/merged, which is not pinned
    d["merged"] = False
    atomic_write_json(os.path.join(index_dir, COMMITS_DIR, f"{snap_id}.json"), d)
    reg[snap_id] = {
        "version": int(m.version),
        "segments": [s["seg_name"] for s in m.segments],
    }
    atomic_write_json(_registry_path(index_dir), reg)
    return snap_id


def list_snapshots(index_dir: str) -> dict:
    return _load_registry(index_dir)


def protected_segments(index_dir: str) -> set[str]:
    """Segment names pinned by any live snapshot — merge/reclaim deletion
    paths must skip these (the deletion-policy hook)."""
    return {n for e in _load_registry(index_dir).values() for n in e["segments"]}


def release_snapshot(index_dir: str, snap_id: str) -> None:
    """Unpin a snapshot and sweep segment dirs no commit references."""
    reg = _load_registry(index_dir)
    if snap_id not in reg:
        raise KeyError(f"unknown snapshot {snap_id!r}")
    del reg[snap_id]
    atomic_write_json(_registry_path(index_dir), reg)
    for suffix in (".json", ".liv.json"):
        p = os.path.join(index_dir, COMMITS_DIR, f"{snap_id}{suffix}")
        if os.path.exists(p):
            os.unlink(p)
    gc_unreferenced(index_dir)


def gc_unreferenced(index_dir: str) -> list[str]:
    """Delete segment dirs referenced by neither the current manifest nor
    any snapshot (deferred deletes from merges that ran under a pin)."""
    m = IndexManifest.load(index_dir)
    live = {s["seg_name"] for s in m.segments} | protected_segments(index_dir)
    seg_root = os.path.join(index_dir, "segments")
    removed = []
    for name in sorted(os.listdir(seg_root)) if os.path.isdir(seg_root) else []:
        if name not in live and os.path.isdir(os.path.join(seg_root, name)):
            shutil.rmtree(os.path.join(seg_root, name), ignore_errors=True)
            removed.append(name)
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
