"""Numeric doc-values updates: the IndexWriter.updateNumericDocValue
analogue (s84 core/.../index/DocValuesUpdate.java:36,
ReadersAndUpdates.java writeFieldUpdates — per-field docValuesGen files).

Updates are recorded index-level as a per-field patch file next to the
manifest: sorted global docIDs plus replacement values, last-write-wins
on re-update. Readers opened AFTER the update apply the patch to the
column (and to its validity bitmap — updating a previously-missing value
sets it, matching NumericDocValuesField update semantics); like Lucene's
NRT readers, already-open searchers keep serving the generation they
opened. Norms, postings and points are untouched — only DOC-VALUES
reads see the patch, exactly the reference's update scope (points are
not updatable in Lucene either).

At 100-TB scale the patch file stays small because updates are per-doc
metadata corrections (the reference's soft-deletes / re-scoring use
case) — readers apply it as an O(|patch|) scatter after the column
load. Folding patches into rewritten docmaps belongs to a reclaiming
merge (stages/compact.py), the same place tombstones are reclaimed;
until such a merge runs, the file simply rides along with the index.
"""

from __future__ import annotations

import os

import numpy as np

from .manifest import atomic_write_json, load_json

DV_UPDATES_FILE = "dv_updates.json"


def dv_updates_path(index_dir: str) -> str:
    return os.path.join(index_dir, DV_UPDATES_FILE)


def load_dv_updates(index_dir: str) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """field -> (sorted global docIDs, replacement values float64)."""
    path = dv_updates_path(index_dir)
    if not os.path.exists(path):
        return {}
    raw = load_json(path)["fields"]
    out: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for field, rec in raw.items():
        ids = np.asarray(rec["doc_ids"], dtype=np.int64)
        vals = np.asarray(rec["values"], dtype=np.float64)
        order = np.argsort(ids, kind="stable")
        out[field] = (ids[order], vals[order])
    return out


def update_numeric_doc_values(
    index_dir: str, field: str, updates: dict[int, float]
) -> int:
    """Record numeric doc-values updates for ``field`` (last-write-wins
    against any prior update of the same doc). Returns the total number
    of patched docs for the field after the merge."""
    cur = load_dv_updates(index_dir)
    merged: dict[int, float] = {}
    if field in cur:
        ids, vals = cur[field]
        merged.update(zip(map(int, ids), map(float, vals)))
    merged.update({int(d): float(v) for d, v in updates.items()})
    all_fields = {
        f: {"doc_ids": [int(d) for d in ids], "values": [float(v) for v in vals]}
        for f, (ids, vals) in cur.items()
        if f != field
    }
    keys = sorted(merged)
    all_fields[field] = {
        "doc_ids": keys,
        "values": [merged[k] for k in keys],
    }
    atomic_write_json(dv_updates_path(index_dir), {"fields": all_fields})
    return len(keys)
