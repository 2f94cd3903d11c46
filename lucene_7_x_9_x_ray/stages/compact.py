"""Tiered segment compaction: the TieredMergePolicy + SegmentMerger pair.

Keeps segment counts bounded under incremental builds (the NRT/append
path): small adjacent segments are merged into one larger segment —
segment-level merge, distinct from the term-sharded query-optimized merge
in merge.py. Policy semantics follow TieredMergePolicy defaults in spirit
(index/TieredMergePolicy.java:99-106): pick up to ``max_merge_at_once``
ADJACENT segments per merge whose combined docs stay under
``max_merged_docs``, smallest tiers first.

Correctness invariants:
- only doc_base-CONTIGUOUS runs merge, so global docIDs are unchanged
  (the merged segment's doc_base = first input's doc_base; postings
  concatenate in doc_base order with local-id rebasing — the
  MergeState.docMaps remap);
- the new segment dir commits atomically and the manifest is rewritten
  afterwards; inputs are deleted only after the manifest points at the
  new segment.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.codec import encode_segment_terms
from ..state.manifest import IndexManifest, SegmentStats, atomic_write_json
from ..state.segment import (
    DOCMAP_FILE,
    field_prefix,
    NORMS_FILE,
    POSITIONS_FILE,
    POSTINGS_FILE,
    STATS_NAME,
    TERMS_FILE,
    SegmentReader,
    encode_term_table,
)


@dataclass
class CompactionPolicy:
    max_merge_at_once: int = 10  # TieredMergePolicy.maxMergeAtOnce
    max_merged_docs: int = 5_000_000  # 5 GB-segment analogue, in docs
    min_segments_to_merge: int = 2


def plan_compactions(manifest: IndexManifest, policy: CompactionPolicy) -> list[list[str]]:
    """Groups of ADJACENT segment names to merge (doc_base order)."""
    segs = sorted(manifest.segments, key=lambda s: s["doc_base"])
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_docs = 0
    for s in segs:
        if (
            cur
            and (len(cur) >= policy.max_merge_at_once
                 or cur_docs + s["doc_count"] > policy.max_merged_docs)
        ):
            if len(cur) >= policy.min_segments_to_merge:
                groups.append(cur)
            cur, cur_docs = [], 0
        cur.append(s["seg_name"])
        cur_docs += s["doc_count"]
    if len(cur) >= policy.min_segments_to_merge:
        groups.append(cur)
    return groups


def _merge_field_views(views, rebases, has_pos: bool, tmp: str, prefix: str) -> dict:
    """k-way merge ONE field's term tables/postings/norms from per-segment
    views (SegmentReader for the primary field, FieldReader for extras) into
    prefixed artifact files under ``tmp``. Returns the merged field stats."""
    all_terms = np.unique(np.concatenate([v.terms for v in views]))
    d_cat, f_cat, n_cat, p_cat = [], [], [], []
    term_starts = np.zeros(len(all_terms), dtype=np.int64)
    off = 0
    for ti, term in enumerate(all_terms):
        term_starts[ti] = off
        for v, rb in zip(views, rebases):
            i = v.lookup(str(term))
            if i < 0:
                continue
            tp = v.postings_by_ord(i)
            d, f = tp.decode()
            d_cat.append(d + rb)
            f_cat.append(f)
            n_cat.append(v.norms[d])
            if has_pos:
                p_cat.append(v.positions_by_ord(i, f))
            off += len(d)
    term_ends = np.append(term_starts[1:], off)
    docs = np.concatenate(d_cat) if d_cat else np.empty(0, np.int64)
    freqs = np.concatenate(f_cat) if f_cat else np.empty(0, np.int64)
    norms_aligned = np.concatenate(n_cat) if n_cat else np.empty(0, np.uint8)
    pos_stream = np.concatenate(p_cat) if has_pos and p_cat else None
    enc = encode_segment_terms(docs, freqs, norms_aligned, term_starts, term_ends,
                               pos_stream=pos_stream)

    pos = ppos = 0
    regions = []
    meta = (np.zeros(len(all_terms), np.int64), np.zeros(len(all_terms), np.int32),
            np.zeros(len(all_terms), np.int32), np.zeros(len(all_terms), np.int64),
            np.zeros(len(all_terms), np.int64))
    pos_meta = (
        (np.zeros(len(all_terms), np.int64), np.zeros(len(all_terms), np.uint8),
         np.zeros(len(all_terms), np.int64)) if has_pos else None
    )
    pos_blobs = []
    for ti in range(len(all_terms)):
        region, nb, ni, ld, lf = enc.term_region(ti)
        regions.append(region)
        meta[0][ti] = pos
        meta[1][ti] = nb
        meta[2][ti] = ni
        meta[3][ti] = ld
        meta[4][ti] = lf
        pos += len(region)
        if has_pos:
            pb, pw, pl = enc.term_positions_blob(ti)
            pos_blobs.append(pb)
            pos_meta[0][ti] = ppos
            pos_meta[1][ti] = pw
            pos_meta[2][ti] = pl
            ppos += pl
    with open(os.path.join(tmp, prefix + POSTINGS_FILE), "wb") as f:
        for rg in regions:
            f.write(rg)
    if has_pos:
        with open(os.path.join(tmp, prefix + POSITIONS_FILE), "wb") as f:
            for b in pos_blobs:
                f.write(b)
    dfs = (term_ends - term_starts).astype(np.int64)
    pq.write_table(
        encode_term_table(all_terms, dfs, enc.ttfs, meta, pos_meta=pos_meta),
        os.path.join(tmp, prefix + TERMS_FILE),
        row_group_size=65536,
    )
    with open(os.path.join(tmp, prefix + NORMS_FILE), "wb") as f:
        for v in views:
            f.write(v.norms.tobytes())
    return {
        "unique_terms": int(len(all_terms)),
        "sum_doc_freq": int(dfs.sum()),
        "sum_total_term_freq": int(freqs.sum()),
    }


def merge_segment_group(index_dir: str, seg_names: list[str], out_name: str) -> dict:
    """SegmentMerger: k-way merge adjacent segments into one new segment.

    Every indexed field merges (primary + extras) — the per-field pass of
    SegmentMerger.java:100-166 (stored fields -> norms -> terms/postings
    per field), with docIDs rebased to the new segment's local space.
    """
    readers = [
        SegmentReader(os.path.join(index_dir, "segments", n)) for n in seg_names
    ]
    readers.sort(key=lambda r: r.doc_base)
    base = readers[0].doc_base
    doc_count = sum(r.doc_count for r in readers)
    pos_flags = {r.has_positions for r in readers}
    if len(pos_flags) > 1:
        # merging a positions segment into a no-positions one would silently
        # drop .pos data (PhraseQuery over those docs would then fail);
        # plan_compactions/compact_index keep such segments in separate tiers
        raise ValueError(
            f"refusing to merge segments with mixed has_positions: {seg_names}"
        )
    has_pos = pos_flags.pop()
    field_sets = {frozenset((r.stats.field_stats or {}).keys()) for r in readers}
    if len(field_sets) > 1:
        raise ValueError(
            f"refusing to merge segments with differing field sets: {seg_names}"
        )
    extra_names = sorted(field_sets.pop())
    rebases = [r.doc_base - base for r in readers]

    import uuid

    seg_root = os.path.join(index_dir, "segments")
    tmp = os.path.join(seg_root, f".{out_name}.tmp-{uuid.uuid4().hex[:8]}")
    os.makedirs(tmp, exist_ok=True)
    try:
        primary = _merge_field_views(readers, rebases, has_pos, tmp, "")
        field_stats: dict = {}
        for fname in extra_names:
            views = [r.field_view(fname) for r in readers]
            f_has_pos = all(v.has_positions for v in views)
            fres = _merge_field_views(
                views, rebases, f_has_pos, tmp, field_prefix(fname)
            )
            fres["doc_count"] = sum(
                int(r.stats.field_stats[fname]["doc_count"]) for r in readers
            )
            fres["index_positions"] = f_has_pos
            field_stats[fname] = fres
        pq.write_table(
            pa.concat_tables([r.docmap() for r in readers]),
            os.path.join(tmp, DOCMAP_FILE),
            row_group_size=65536,
        )
        import hashlib

        h = hashlib.sha256()
        for r in readers:
            h.update(str(r.stats.lineage_fingerprint).encode())
        st = SegmentStats(
            seg_name=out_name,
            doc_base=base,
            doc_count=doc_count,
            sum_total_term_freq=sum(r.stats.sum_total_term_freq for r in readers),
            sum_doc_freq=primary["sum_doc_freq"],
            unique_terms=primary["unique_terms"],
            lineage_file=";".join(r.stats.lineage_file for r in readers),
            lineage_rg_start=readers[0].stats.lineage_rg_start,
            lineage_rg_end=readers[-1].stats.lineage_rg_end,
            lineage_fingerprint=h.hexdigest(),
            analyzer=readers[0].stats.analyzer,
            field_stats=field_stats,
            elapsed_sec=0.0,
        )
        atomic_write_json(os.path.join(tmp, STATS_NAME), st.to_dict())
        from ..state.manifest import fsync_dir_files

        fsync_dir_files(tmp)
        out_dir = os.path.join(seg_root, out_name)
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)
        os.rename(tmp, out_dir)
        return st.to_dict()
    finally:
        if os.path.exists(tmp):
            shutil.rmtree(tmp, ignore_errors=True)


def compact_index(
    index_dir: str, policy: CompactionPolicy | None = None, use_ray: bool = True
) -> IndexManifest:
    """Run one round of tiered compaction; returns the updated manifest.

    Each group merges in its own Ray task (the ConcurrentMergeScheduler
    background-merge analogue); the manifest is rewritten once at the end
    and input segment dirs are deleted only afterwards.
    """
    policy = policy or CompactionPolicy()
    manifest = IndexManifest.load(index_dir)
    groups = plan_compactions(manifest, policy)
    # split any group at has_positions boundaries: mixed merges would drop
    # .pos data, so positioned and position-less segments stay in separate
    # (still doc_base-adjacent) tiers
    def _has_pos(name: str) -> bool:
        return os.path.exists(
            os.path.join(index_dir, "segments", name, POSITIONS_FILE)
        )

    split_groups: list[list[str]] = []
    for g in groups:
        cur: list[str] = []
        cur_flag: bool | None = None
        for name in g:
            flag = _has_pos(name)
            if cur and flag != cur_flag:
                if len(cur) >= policy.min_segments_to_merge:
                    split_groups.append(cur)
                cur = []
            cur.append(name)
            cur_flag = flag
        if len(cur) >= policy.min_segments_to_merge:
            split_groups.append(cur)
    groups = split_groups
    if not groups:
        return manifest
    jobs = [
        {"segs": g, "out_name": f"{g[0]}_c{len(g)}"} for g in groups
    ]

    if use_ray:
        import ray.data as rd

        def run(batch: pa.Table) -> pa.Table:
            import json as _json

            out = []
            for row in batch.to_pylist():
                d = merge_segment_group(index_dir, row["segs"], row["out_name"])
                d["field_stats"] = _json.dumps(d.get("field_stats") or {})
                out.append(d)
            return pa.Table.from_pylist(out)

        import json as _json

        new_stats = (
            rd.from_items(jobs, override_num_blocks=len(jobs))
            .map_batches(run, batch_size=1, batch_format="pyarrow")
            .take_all()
        )
        for r in new_stats:
            if isinstance(r.get("field_stats"), str):
                r["field_stats"] = _json.loads(r["field_stats"])
    else:
        new_stats = [
            merge_segment_group(index_dir, j["segs"], j["out_name"]) for j in jobs
        ]

    merged_names = {n for g in groups for n in g}
    kept = [s for s in manifest.segments if s["seg_name"] not in merged_names]
    manifest.segments = sorted(kept + list(new_stats), key=lambda s: s["doc_base"])
    manifest.merged = False  # a term-sharded merge (merge.py) is now stale
    manifest.save()
    for name in merged_names:
        shutil.rmtree(os.path.join(index_dir, "segments", name), ignore_errors=True)
    # drop any stale term-sharded merged index: its fingerprint no longer
    # matches and the pull merge would rebuild it anyway
    shutil.rmtree(os.path.join(index_dir, "merged"), ignore_errors=True)
    return manifest
