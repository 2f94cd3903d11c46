"""Segment merge: the groupby-on-term shuffle with head-term salting.

The SegmentMerger equivalent (SURVEY.md §2.5 "Segment merge", §3.3;
s84 index/SegmentMerger.java:100-166) re-expressed as a Ray Data shuffle:

  stage A (driver + tiny Ray pass): global per-term docFreq from the
          per-segment term dictionaries -> the HOT TERM set (df above
          threshold). Zipf head terms ("the" at Common-Crawl scale) would
          otherwise send one reduce group ~10^11 postings.
  stage B (map): each segment emits fragment rows
          (term, shard_id, doc_base, df, ttf, region bytes, norm bytes).
          shard_id = crc32(term) % n_shards for normal terms; hot terms are
          SALTED across `hot_buckets` sub-shards keyed by contiguous
          doc_base ranges, so each reduce group is bounded and the merge
          stays associative + order-preserving (SURVEY.md §7.4).
  stage C (reduce): groupby(shard_id).map_groups writes one merged shard
          per group: fragments of a term are concatenated in doc_base order
          with docIDs rebased to GLOBAL ids (doc_base + local — the
          MergeState.docMaps remap, index/MergeState.java:180-184) and
          re-encoded into packed blocks with fresh impacts.

No docID re-sort is ever needed: doc_base prefix sums make global ids
strictly increasing across fragments (SURVEY.md §7.4).

The partitioning assumptions this stage relies on (documented per the
task brief): one reduce group must fit a worker's heap — bounded by
n_shards for the torso and by hot_buckets salting for the head; fragments
of a term arrive with disjoint, doc_base-ordered doc ranges.

Resume: each shard dir commits atomically with a stats.json keyed by the
segment-set fingerprint; re-running skips completed shards.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid
import zlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.codec import encode_postings
from ..state.manifest import IndexManifest, atomic_write_json, load_json
from ..state.segment import (
    NORMS_FILE,
    POSTINGS_FILE,
    TERMS_FILE,
    SegmentReader,
    _region_blobs,
    encode_term_table,
    parse_region,
)

MERGED_MANIFEST = "merged.json"


@dataclass
class MergeConfig:
    n_shards: int = 32
    hot_df_threshold: int = 1_000_000  # global df above which a term is salted
    hot_buckets: int = 8  # sub-shards per hot term (doc_base ranges)
    emit_chunk_terms: int = 8192  # fragment rows per emitted batch


def shard_of(term: str, n_shards: int) -> int:
    """Deterministic cross-process term -> shard hash (not Python hash())."""
    return zlib.crc32(term.encode("utf-8")) % n_shards


def _hot_shard_id(cfg: MergeConfig, hot_index: int, bucket: int) -> int:
    return cfg.n_shards + hot_index * cfg.hot_buckets + bucket


def compute_hot_terms(index_dir: str, manifest: IndexManifest, cfg: MergeConfig) -> list[str]:
    """Global df per term -> sorted list of head terms to salt.

    Per-segment dictionaries already hold one (term, doc_freq) row per term,
    i.e. the partial aggregate — the groupby here shuffles only dictionary
    rows, never postings.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    paths = [os.path.join(d, TERMS_FILE) for d in manifest.segment_dirs()]
    agg = (
        rd.read_parquet(paths, columns=["term", "doc_freq"])
        .groupby("term")
        .aggregate(Sum("doc_freq", alias_name="df"))
    )
    hot = agg.filter(lambda r: r["df"] > cfg.hot_df_threshold).take_all()
    return sorted(r["term"] for r in hot)


def compute_hot_terms_local(manifest: IndexManifest, cfg: MergeConfig) -> list[str]:
    acc: dict[str, int] = {}
    for d in manifest.segment_dirs():
        t = pq.read_table(os.path.join(d, TERMS_FILE), columns=["term", "doc_freq"])
        for term, df in zip(t["term"].to_pylist(), t["doc_freq"].to_pylist()):
            acc[term] = acc.get(term, 0) + df
    return sorted(t for t, df in acc.items() if df > cfg.hot_df_threshold)


def emit_fragments(
    seg_dir: str, seg_ord: int, n_segs: int, cfg: MergeConfig, hot_rank: dict[str, int]
):
    """Yield fragment batches for one segment (stage B map task)."""
    r = SegmentReader(seg_dir)
    post = r._post
    n_terms = len(r.terms)
    # region byte ranges per term (contiguous by construction)
    region_ends = np.empty(n_terms, dtype=np.int64)
    region_ends[:-1] = r._off[1:]
    if n_terms:
        region_ends[-1] = len(post)
    bucket = seg_ord * cfg.hot_buckets // n_segs

    for s in range(0, n_terms, cfg.emit_chunk_terms):
        e = min(s + cfg.emit_chunk_terms, n_terms)
        terms = r.terms[s:e]
        shard_ids = np.empty(e - s, dtype=np.int32)
        regions: list[bytes] = []
        for i, term in enumerate(terms):
            ti = s + i
            hr = hot_rank.get(term)
            shard_ids[i] = (
                _hot_shard_id(cfg, hr, bucket) if hr is not None else shard_of(term, cfg.n_shards)
            )
            # raw packed region bytes only — postings are NOT decoded here;
            # the reducer reads the segment's norms from shared storage, so
            # the shuffle ships each posting region exactly once, nothing else
            regions.append(bytes(post[r._off[ti] : region_ends[ti]]))
        yield pa.table(
            {
                "term": pa.array(terms, type=pa.string()),
                "shard_id": pa.array(shard_ids),
                "doc_base": pa.array(np.full(e - s, r.doc_base, dtype=np.int64)),
                "seg_dir": pa.array([seg_dir] * (e - s), type=pa.string()),
                "doc_freq": pa.array(r.doc_freqs[s:e]),
                "total_term_freq": pa.array(r.ttfs[s:e]),
                "n_blocks": pa.array(r._n_blocks[s:e]),
                "n_imp": pa.array(r._n_imp[s:e]),
                "len_docs": pa.array(r._len_docs[s:e]),
                "len_freqs": pa.array(r._len_freqs[s:e]),
                "region": pa.array(regions, type=pa.large_binary()),
            }
        )


def write_merged_shard(group: pa.Table, merged_dir: str, fingerprint: str) -> dict:
    """Stage C reduce: merge one shard group's fragments, commit atomically."""
    shard_id = int(group["shard_id"][0].as_py())
    shard_name = f"shard_{shard_id:05d}"
    out_dir = os.path.join(merged_dir, shard_name)
    stats_path = os.path.join(out_dir, "stats.json")
    if os.path.exists(stats_path):
        st = load_json(stats_path)
        if st.get("fingerprint") == fingerprint:
            st["resumed"] = True
            return st

    # sort fragments by (term, doc_base): concatenation order == docID order
    idx = pa.compute.sort_indices(
        group, sort_keys=[("term", "ascending"), ("doc_base", "ascending")]
    )
    g = group.take(idx)
    terms = np.asarray(g["term"].to_numpy(zero_copy_only=False), dtype=object)
    doc_bases = g["doc_base"].to_numpy()
    seg_dirs = g["seg_dir"].to_pylist()
    dfs = g["doc_freq"].to_numpy()
    ttfs = g["total_term_freq"].to_numpy()
    n_blocks = g["n_blocks"].to_numpy()
    n_imps = g["n_imp"].to_numpy()
    len_docs = g["len_docs"].to_numpy()
    len_freqs = g["len_freqs"].to_numpy()
    regions = g["region"].to_pylist()

    # segment norms from shared storage, loaded once per segment per reducer
    # (not shipped through the shuffle)
    norms_cache: dict[str, np.ndarray] = {}

    def seg_norms(sd: str) -> np.ndarray:
        arr = norms_cache.get(sd)
        if arr is None:
            arr = np.fromfile(os.path.join(sd, NORMS_FILE), dtype=np.uint8)
            norms_cache[sd] = arr
        return arr

    uniq, starts = np.unique(terms, return_index=True)
    order = np.argsort(starts)
    uniq = uniq[order]
    starts = starts[order]
    ends = np.append(starts[1:], len(terms))

    out_regions: list[bytes] = []
    meta = (np.zeros(len(uniq), np.int64), np.zeros(len(uniq), np.int32),
            np.zeros(len(uniq), np.int32), np.zeros(len(uniq), np.int64),
            np.zeros(len(uniq), np.int64))
    out_dfs = np.zeros(len(uniq), np.int64)
    out_ttfs = np.zeros(len(uniq), np.int64)
    pos = 0
    for ui in range(len(uniq)):
        s, e = int(starts[ui]), int(ends[ui])
        docs_parts, freqs_parts, norm_parts = [], [], []
        for fi in range(s, e):
            tp = parse_region(
                regions[fi], int(dfs[fi]), int(n_blocks[fi]), int(n_imps[fi]),
                int(len_docs[fi]), int(len_freqs[fi]),
            )
            d, f = tp.decode()
            docs_parts.append(d + doc_bases[fi])  # -> global docIDs
            freqs_parts.append(f)
            norm_parts.append(seg_norms(seg_dirs[fi])[d])
        docs = np.concatenate(docs_parts)
        freqs = np.concatenate(freqs_parts)
        norms = np.concatenate(norm_parts)
        enc = encode_postings(docs, freqs, norms)
        region, nb, ni = _region_blobs(enc)
        out_regions.append(region)
        meta[0][ui] = pos
        meta[1][ui] = nb
        meta[2][ui] = ni
        meta[3][ui] = len(enc.docs_blob)
        meta[4][ui] = len(enc.freqs_blob)
        out_dfs[ui] = enc.doc_freq
        out_ttfs[ui] = int(ttfs[s:e].sum())
        pos += len(region)

    tmp = os.path.join(merged_dir, f".{shard_name}.tmp-{uuid.uuid4().hex[:8]}")
    os.makedirs(tmp, exist_ok=True)
    try:
        with open(os.path.join(tmp, POSTINGS_FILE), "wb") as f:
            for rg in out_regions:
                f.write(rg)
            f.flush()
            if os.environ.get("LUCENE_RAY_FSYNC_SEGMENTS"):
                # durability point is the manifest commit (segments_N
                # analogue); per-file fsync is opt-in for strict mode
                os.fsync(f.fileno())
        pq.write_table(
            encode_term_table(uniq, out_dfs, out_ttfs, meta),
            os.path.join(tmp, TERMS_FILE),
            row_group_size=65536,
        )
        st = {
            "shard_id": shard_id,
            "shard_name": shard_name,
            "n_terms": int(len(uniq)),
            "sum_doc_freq": int(out_dfs.sum()),
            "fingerprint": fingerprint,
            "resumed": False,
        }
        atomic_write_json(os.path.join(tmp, "stats.json"), st)
        if os.path.exists(out_dir):
            shutil.rmtree(tmp)
        else:
            os.rename(tmp, out_dir)
        return st
    finally:
        if os.path.exists(tmp):
            shutil.rmtree(tmp, ignore_errors=True)


def _fingerprint(manifest: IndexManifest) -> str:
    h = hashlib.sha256()
    for s in manifest.segments:
        h.update(s["seg_name"].encode())
        h.update(str(s["lineage_fingerprint"]).encode())
    return h.hexdigest()[:16]


def _finalize(index_dir: str, merged_dir: str, manifest: IndexManifest,
              cfg: MergeConfig, hot_terms: list[str], shard_stats: list[dict]) -> dict:
    # global norms: concatenation of segment norms in doc_base order (the
    # merged .nvd). Kept as one file here; at cluster scale query actors
    # mmap only their doc-range slice.
    norms_path = os.path.join(merged_dir, NORMS_FILE)
    with open(norms_path, "wb") as f:
        for d in manifest.segment_dirs():
            with open(os.path.join(d, NORMS_FILE), "rb") as src:
                shutil.copyfileobj(src, f)
    merged = {
        "n_shards": cfg.n_shards,
        "hot_buckets": cfg.hot_buckets,
        "hot_terms": hot_terms,
        "doc_count": manifest.doc_count,
        "sum_total_term_freq": manifest.sum_total_term_freq,
        "shards": sorted(shard_stats, key=lambda s: s["shard_id"]),
        "fingerprint": _fingerprint(manifest),
    }
    atomic_write_json(os.path.join(merged_dir, MERGED_MANIFEST), merged)
    manifest.merged = True
    manifest.save()
    return merged


def merge_index(index_dir: str, cfg: MergeConfig | None = None) -> dict:
    """Distributed merge via Ray Data groupby (Ray must be initialised)."""
    import ray
    import ray.data as rd

    cfg = cfg or MergeConfig()
    manifest = IndexManifest.load(index_dir)
    merged_dir = os.path.join(index_dir, "merged")
    os.makedirs(merged_dir, exist_ok=True)
    hot_terms = compute_hot_terms(index_dir, manifest, cfg)
    hot_rank = {t: i for i, t in enumerate(hot_terms)}
    hot_ref = ray.put(hot_rank)
    fp = _fingerprint(manifest)
    seg_dirs = manifest.segment_dirs()
    n_segs = len(seg_dirs)
    specs = [{"seg_dir": d, "seg_ord": i} for i, d in enumerate(seg_dirs)]

    def emit(batch: pa.Table):
        hr = ray.get(hot_ref)
        for row in batch.to_pylist():
            yield from emit_fragments(row["seg_dir"], row["seg_ord"], n_segs, cfg, hr)

    def reduce_shard(group: pa.Table) -> pa.Table:
        st = write_merged_shard(group, merged_dir, fp)
        return pa.Table.from_pylist([st])

    shard_stats = (
        rd.from_items(specs, override_num_blocks=len(specs))
        .map_batches(emit, batch_size=1, batch_format="pyarrow")
        .groupby("shard_id")
        .map_groups(reduce_shard, batch_format="pyarrow")
        .take_all()
    )
    return _finalize(index_dir, merged_dir, manifest, cfg, hot_terms, shard_stats)


def merge_index_local(index_dir: str, cfg: MergeConfig | None = None) -> dict:
    """Single-process merge (tests): same artifacts, no Ray session."""
    cfg = cfg or MergeConfig()
    manifest = IndexManifest.load(index_dir)
    merged_dir = os.path.join(index_dir, "merged")
    os.makedirs(merged_dir, exist_ok=True)
    hot_terms = compute_hot_terms_local(manifest, cfg)
    hot_rank = {t: i for i, t in enumerate(hot_terms)}
    fp = _fingerprint(manifest)
    seg_dirs = manifest.segment_dirs()
    frags: list[pa.Table] = []
    for i, d in enumerate(seg_dirs):
        frags.extend(emit_fragments(d, i, len(seg_dirs), cfg, hot_rank))
    all_frags = pa.concat_tables(frags)
    shard_stats = []
    for sid in np.unique(all_frags["shard_id"].to_numpy()):
        group = all_frags.filter(pa.compute.equal(all_frags["shard_id"], int(sid)))
        shard_stats.append(write_merged_shard(group, merged_dir, fp))
    return _finalize(index_dir, merged_dir, manifest, cfg, hot_terms, shard_stats)
