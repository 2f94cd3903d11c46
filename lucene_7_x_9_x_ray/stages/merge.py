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
import os
import shutil
import uuid
import zlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.codec import decode_positions, encode_segment_terms
from ..state.manifest import IndexManifest, atomic_write_json, load_json
from ..state.segment import (
    PAYLOADS_FILE,
    NORMS_FILE,
    POSITIONS_FILE,
    POSTINGS_FILE,
    TERMS_FILE,
    SegmentReader,
    encode_term_table,
    parse_region,
    write_payloads_file,
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
    def over_threshold(batch):
        import pyarrow.compute as _pc

        return batch.filter(_pc.greater(batch["df"], cfg.hot_df_threshold))

    hot = agg.map_batches(over_threshold, batch_format="pyarrow").take_all()
    return sorted(r["term"] for r in hot)


def compute_hot_terms_local(manifest: IndexManifest, cfg: MergeConfig) -> list[str]:
    acc: dict[str, int] = {}
    for d in manifest.segment_dirs():
        t = pq.read_table(os.path.join(d, TERMS_FILE), columns=["term", "doc_freq"])
        for term, df in zip(t["term"].to_pylist(), t["doc_freq"].to_pylist()):
            acc[term] = acc.get(term, 0) + df
    return sorted(t for t, df in acc.items() if df > cfg.hot_df_threshold)


# ---------------------------------------------------------------------------
# pull merge (default): term-RANGE partitioned shuffle with ranged reads
# ---------------------------------------------------------------------------


def collect_term_stats(manifest: IndexManifest, max_workers: int = 16, prefix: str = ""):
    """Driver-side global (term, df) aggregate from per-segment dictionaries.

    Per-segment dicts are already partial aggregates, so this reads only
    vocabulary rows (never postings). Threaded reads are fine up to ~10k
    segments; beyond that, run a hierarchical merge first (TieredMergePolicy
    analogue) or fall back to strategy="groupby".
    """
    from concurrent.futures import ThreadPoolExecutor

    def read_one(d):
        t = pq.read_table(os.path.join(d, prefix + TERMS_FILE), columns=["term", "doc_freq"])
        return (
            np.asarray(t["term"].to_numpy(zero_copy_only=False), dtype=object),
            t["doc_freq"].to_numpy(),
        )

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        parts = list(ex.map(read_one, manifest.segment_dirs()))
    all_terms = np.concatenate([p[0] for p in parts])
    all_dfs = np.concatenate([p[1] for p in parts])
    import pandas as pd

    codes, vocab = pd.factorize(all_terms)
    dfs = np.bincount(codes, weights=all_dfs.astype(np.float64)).astype(np.int64)
    vocab = np.asarray(vocab, dtype=object)
    order = np.argsort(vocab)
    return vocab[order], dfs[order]


def plan_merge_sampled(
    manifest: IndexManifest, cfg: MergeConfig, samples_per_segment: int = 256,
    prefix: str = "",
) -> tuple[list[str], list[str]]:
    """(hot_terms, boundaries) WITHOUT materializing the global vocabulary
    on the driver (the default scale path; collect_term_stats +
    plan_merge_ranges remain as strategy="pull-exact").

    Pass 1 (Ray, per segment): each segment's sorted dictionary emits (a)
    ~samples_per_segment df-mass quantile samples (term, df-mass since the
    previous sample) and (b) its LOCALLY HEAVY terms (df >= hot_threshold /
    n_segments) — any globally hot term must be locally heavy somewhere
    (pigeonhole), so the candidate set is exact-superset and tiny.
    Pass 2 (Ray, per segment): exact global df for the candidates via
    per-dictionary binary-search lookups; driver sums |candidates| ints.
    Boundaries: weighted merge of the samples, equal-df-mass cuts — the
    RangePartitioner-style approximation; balance error is bounded by the
    per-segment sample spacing and hot terms are salted separately anyway.
    Driver state: O(n_segments * samples + |candidates|)."""
    import ray
    import ray.data as rd

    seg_dirs = manifest.segment_dirs()
    n_segs = len(seg_dirs)
    local_thr = max(1, cfg.hot_df_threshold // max(1, n_segs))

    def sample_one(batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            t = pq.read_table(
                os.path.join(row["seg_dir"], prefix + TERMS_FILE),
                columns=["term", "doc_freq"],
            )
            terms = np.asarray(t["term"].to_numpy(zero_copy_only=False), dtype=object)
            dfs = t["doc_freq"].to_numpy()
            if len(terms) == 0:
                continue
            cum = np.cumsum(dfs)
            k = min(samples_per_segment, len(terms))
            targets = cum[-1] * (np.arange(1, k + 1) / k)
            cuts = np.unique(np.minimum(np.searchsorted(cum, targets), len(terms) - 1))
            prev = 0
            for c in cuts:
                out.append(
                    {"kind": "s", "term": str(terms[c]), "w": int(cum[c] - prev)}
                )
                prev = int(cum[c])
            for i in np.flatnonzero(dfs >= local_thr):
                out.append({"kind": "h", "term": str(terms[i]), "w": int(dfs[i])})
        if not out:
            return pa.table(
                {"kind": pa.array([], pa.string()), "term": pa.array([], pa.string()),
                 "w": pa.array([], pa.int64())}
            )
        return pa.Table.from_pylist(out)

    rows = (
        rd.from_items(
            [{"seg_dir": d} for d in seg_dirs],
            override_num_blocks=max(1, n_segs // 8),
        )
        .map_batches(sample_one, batch_size=8, batch_format="pyarrow")
        .take_all()
    )
    samples = sorted(
        ((r["term"], r["w"]) for r in rows if r["kind"] == "s"), key=lambda x: x[0]
    )
    # conservative hot detection from the single pass: a term's unobserved
    # per-segment dfs are each < local_thr, so observed_sum + (n_segs -
    # n_observed) * (local_thr - 1) bounds its global df from above. Any
    # term whose BOUND clears the threshold is salted — a small superset of
    # the true hot set (over-salting only adds a few bucket tasks; it never
    # affects results), and it saves the second cluster pass.
    obs_sum: dict[str, int] = {}
    obs_n: dict[str, int] = {}
    for r in rows:
        if r["kind"] == "h":
            obs_sum[r["term"]] = obs_sum.get(r["term"], 0) + int(r["w"])
            obs_n[r["term"]] = obs_n.get(r["term"], 0) + 1
    hot_terms = sorted(
        t
        for t, s_ in obs_sum.items()
        if s_ + (n_segs - obs_n[t]) * max(0, local_thr - 1) > cfg.hot_df_threshold
    )

    hot_set = set(hot_terms)
    cold = [(t, w) for t, w in samples if t not in hot_set]
    if not cold:
        return hot_terms, [""] if samples else []
    ws = np.array([w for _, w in cold], dtype=np.float64)
    cum = np.cumsum(ws)
    n = min(cfg.n_shards, len(cold))
    targets = cum[-1] * (np.arange(n) / n)
    cuts = np.unique(np.minimum(np.searchsorted(cum, targets, side="left"), len(cold) - 1))
    boundaries = [cold[c][0] for c in cuts]
    boundaries[0] = ""
    return hot_terms, boundaries


def plan_merge_ranges(
    terms_sorted: np.ndarray, dfs: np.ndarray, cfg: MergeConfig
) -> tuple[list[str], list[str]]:
    """(hot_terms, range_boundaries) for the pull merge.

    Boundaries are equal-docFreq quantile cuts over the NON-hot sorted
    vocabulary: each range shard re-encodes ~the same posting volume, which
    is the skew guarantee hashing can't give (hash shards are only equal in
    EXPECTATION; ranges are equal by construction from the measured df).
    Hot terms (df > threshold) are excluded and salted into per-doc-range
    bucket tasks exactly as in the groupby strategy.
    """
    hot_mask = dfs > cfg.hot_df_threshold
    hot_terms = [str(t) for t in terms_sorted[hot_mask]]
    cold_terms = terms_sorted[~hot_mask]
    cold_dfs = dfs[~hot_mask]
    n = min(cfg.n_shards, max(1, len(cold_terms)))
    if len(cold_terms) == 0:
        return hot_terms, []
    cum = np.cumsum(cold_dfs)
    targets = cum[-1] * (np.arange(n) / n)
    cuts = np.searchsorted(cum, targets, side="left")
    cuts = np.unique(np.minimum(cuts, len(cold_terms) - 1))
    boundaries = [str(cold_terms[c]) for c in cuts]
    boundaries[0] = ""  # first range starts at the beginning of term space
    return hot_terms, boundaries


def _bucket_of(seg_ord: int, n_segs: int, hot_buckets: int) -> int:
    return seg_ord * hot_buckets // n_segs


_FRAG_SCHEMA_COLS = (
    "term", "shard_id", "doc_base", "seg_dir", "doc_freq", "total_term_freq",
    "n_blocks", "n_imp", "len_docs", "len_freqs", "region",
)
_FRAG_POS_COLS = ("pos_width", "pos_blob")
_FRAG_PAY_COLS = ("pay_blob",)  # raw float32 payload bytes per term fragment


def _frag_table(cols: dict) -> pa.Table:
    keys = (
        _FRAG_SCHEMA_COLS
        + (_FRAG_POS_COLS if "pos_blob" in cols else ())
        + (_FRAG_PAY_COLS if "pay_blob" in cols else ())
    )
    return pa.table({k: cols[k] for k in keys})


def _empty_frag_table(has_pos: bool) -> pa.Table:
    cols = {
        "term": pa.array([], type=pa.string()),
        "shard_id": pa.array([], type=pa.int32()),
        "doc_base": pa.array([], type=pa.int64()),
        "seg_dir": pa.array([], type=pa.string()),
        "doc_freq": pa.array([], type=pa.int64()),
        "total_term_freq": pa.array([], type=pa.int64()),
        "n_blocks": pa.array([], type=pa.int32()),
        "n_imp": pa.array([], type=pa.int32()),
        "len_docs": pa.array([], type=pa.int64()),
        "len_freqs": pa.array([], type=pa.int64()),
        "region": pa.array([], type=pa.large_binary()),
    }
    if has_pos:
        cols["pos_width"] = pa.array([], type=pa.uint8())
        cols["pos_blob"] = pa.array([], type=pa.large_binary())
    return _frag_table(cols)


def assemble_range_group(
    seg_dirs: list[str],
    doc_bases: list[int],
    lo: str,
    hi: str | None,
    hot_set: frozenset,
    shard_id: int,
    prefix: str = "",
) -> pa.Table:
    """Pull one term-range's fragments from every segment (ranged reads).

    Region bytes for a term range are CONTIGUOUS in postings.bin (regions
    are written in sorted term order), so each segment contributes one
    sequential read — the pull-shuffle property that replaces the
    all-to-all exchange.
    """
    parts = []
    has_pos = False
    for seg_dir, doc_base in zip(seg_dirs, doc_bases):
        t = pq.read_table(os.path.join(seg_dir, prefix + TERMS_FILE))
        terms = np.asarray(t["term"].to_numpy(zero_copy_only=False), dtype=object)
        a = int(np.searchsorted(terms, lo, side="left"))
        b = len(terms) if hi is None else int(np.searchsorted(terms, hi, side="left"))
        if a >= b:
            continue
        keep = np.ones(b - a, dtype=bool)
        if hot_set:
            for i in range(a, b):
                if terms[i] in hot_set:
                    keep[i - a] = False
        off = t["off"].to_numpy()
        post = np.memmap(os.path.join(seg_dir, prefix + POSTINGS_FILE), dtype=np.uint8, mode="r")
        ends = np.empty(len(terms), dtype=np.int64)
        ends[:-1] = off[1:]
        if len(terms):
            ends[-1] = len(post)
        idx = np.arange(a, b)[keep]
        regions = [bytes(post[off[i] : ends[i]]) for i in idx]
        m = len(idx)
        cols = {
            "term": pa.array(terms[idx], type=pa.string()),
            "shard_id": pa.array(np.full(m, shard_id, dtype=np.int32)),
            "doc_base": pa.array(np.full(m, doc_base, dtype=np.int64)),
            "seg_dir": pa.array([seg_dir] * m, type=pa.string()),
            "doc_freq": t["doc_freq"].take(idx),
            "total_term_freq": t["total_term_freq"].take(idx),
            "n_blocks": t["n_blocks"].take(idx),
            "n_imp": t["n_imp"].take(idx),
            "len_docs": t["len_docs"].take(idx),
            "len_freqs": t["len_freqs"].take(idx),
            "region": pa.array(regions, type=pa.large_binary()),
        }
        if "pos_off" in t.column_names:
            has_pos = True
            pos_off = t["pos_off"].to_numpy()
            len_pos = t["len_pos"].to_numpy()
            posf = np.memmap(
                os.path.join(seg_dir, prefix + POSITIONS_FILE), dtype=np.uint8, mode="r"
            )
            cols["pos_width"] = t["pos_width"].take(idx)
            cols["pos_blob"] = pa.array(
                [bytes(posf[pos_off[i] : pos_off[i] + len_pos[i]]) for i in idx],
                type=pa.large_binary(),
            )
        if "pay_off" in t.column_names:
            pay_off = t["pay_off"].to_numpy()
            ttf_arr = t["total_term_freq"].to_numpy()
            pay_path = os.path.join(seg_dir, prefix + PAYLOADS_FILE)
            payf = (
                np.memmap(pay_path, dtype=np.uint8, mode="r")
                if os.path.getsize(pay_path)
                else np.empty(0, dtype=np.uint8)
            )
            cols["pay_blob"] = pa.array(
                [
                    bytes(payf[pay_off[i] * 4 : (pay_off[i] + ttf_arr[i]) * 4])
                    for i in idx
                ],
                type=pa.large_binary(),
            )
        parts.append(_frag_table(cols))
    if not parts:
        return _empty_frag_table(has_pos)
    return pa.concat_tables(parts)


def assemble_hot_group(
    seg_dirs: list[str],
    doc_bases: list[int],
    seg_ords: list[int],
    n_segs: int,
    term: str,
    bucket: int,
    cfg: MergeConfig,
    shard_id: int,
    prefix: str = "",
) -> pa.Table:
    """Pull one salted hot term's fragments for one doc-range bucket."""
    sel = [
        (d, base)
        for d, base, o in zip(seg_dirs, doc_bases, seg_ords)
        if _bucket_of(o, n_segs, cfg.hot_buckets) == bucket
    ]
    rows = []
    has_pos = False
    for seg_dir, doc_base in sel:
        t = pq.read_table(os.path.join(seg_dir, prefix + TERMS_FILE))
        terms = np.asarray(t["term"].to_numpy(zero_copy_only=False), dtype=object)
        i = int(np.searchsorted(terms, term))
        if i >= len(terms) or terms[i] != term:
            continue
        off = t["off"].to_numpy()
        post = np.memmap(os.path.join(seg_dir, prefix + POSTINGS_FILE), dtype=np.uint8, mode="r")
        end = int(off[i + 1]) if i + 1 < len(terms) else len(post)
        row = {
            "term": term,
            "shard_id": shard_id,
            "doc_base": doc_base,
            "seg_dir": seg_dir,
            "doc_freq": int(t["doc_freq"][i].as_py()),
            "total_term_freq": int(t["total_term_freq"][i].as_py()),
            "n_blocks": int(t["n_blocks"][i].as_py()),
            "n_imp": int(t["n_imp"][i].as_py()),
            "len_docs": int(t["len_docs"][i].as_py()),
            "len_freqs": int(t["len_freqs"][i].as_py()),
            "region": bytes(post[int(off[i]) : end]),
        }
        if "pos_off" in t.column_names:
            has_pos = True
            po = int(t["pos_off"][i].as_py())
            lp = int(t["len_pos"][i].as_py())
            posf = np.memmap(
                os.path.join(seg_dir, prefix + POSITIONS_FILE), dtype=np.uint8, mode="r"
            )
            row["pos_width"] = int(t["pos_width"][i].as_py())
            row["pos_blob"] = bytes(posf[po : po + lp])
        if "pay_off" in t.column_names:
            pao = int(t["pay_off"][i].as_py())
            ttf_i = int(t["total_term_freq"][i].as_py())
            pay_path = os.path.join(seg_dir, prefix + PAYLOADS_FILE)
            payf = (
                np.memmap(pay_path, dtype=np.uint8, mode="r")
                if os.path.getsize(pay_path)
                else np.empty(0, dtype=np.uint8)
            )
            row["pay_blob"] = bytes(payf[pao * 4 : (pao + ttf_i) * 4])
        rows.append(row)
    if not rows:
        return _empty_frag_table(False)
    tb = pa.Table.from_pylist(rows)
    cols = {
        **{
            k: tb[k]
            for k in _FRAG_SCHEMA_COLS
            if k not in ("shard_id", "n_blocks", "n_imp", "region")
        },
        "shard_id": tb["shard_id"].cast(pa.int32()),
        "n_blocks": tb["n_blocks"].cast(pa.int32()),
        "n_imp": tb["n_imp"].cast(pa.int32()),
        "region": tb["region"].cast(pa.large_binary()),
    }
    if has_pos:
        cols["pos_width"] = tb["pos_width"].cast(pa.uint8())
        cols["pos_blob"] = tb["pos_blob"].cast(pa.large_binary())
    if "pay_blob" in tb.column_names:
        cols["pay_blob"] = tb["pay_blob"].cast(pa.large_binary())
    return _frag_table(cols)


def merge_index_pull(
    index_dir: str, cfg: MergeConfig | None = None, boundaries: str = "auto"
) -> dict:
    """Range-partitioned pull merge (default strategy).

    One Ray task per output shard assembles its term range (or salted hot
    bucket) by contiguous ranged reads from the sorted segment files on
    shared storage, then re-encodes — no all-to-all exchange, no shuffle
    machinery on the critical path. Range boundaries bound each task's
    work; ``boundaries="auto"`` (default) uses the exact whole-vocabulary
    driver aggregate while the segment count is bounded (<= 1024: a
    threaded dictionary read whose driver memory is n_segments x per-seg
    vocab rows — no extra Ray stage) and switches to distributed
    per-segment df-quantile SAMPLING with O(n_segments) driver state
    (plan_merge_sampled) beyond that — the web-scale regime where the
    union vocabulary cannot live on the driver. "sampled"/"exact" force a
    plan.
    """
    import ray.data as rd

    cfg = cfg or MergeConfig()
    manifest = IndexManifest.load(index_dir)
    merged_dir = os.path.join(index_dir, "merged")
    os.makedirs(merged_dir, exist_ok=True)

    if boundaries == "auto":
        # the exact driver aggregate is one threaded dictionary read — fine
        # while segment count (and so driver vocab memory) is bounded; the
        # sampled plan takes over where the vocabulary would not fit a
        # driver (its fixed Ray-stage latency only amortizes there)
        boundaries = "sampled" if len(manifest.segments) > 1024 else "exact"

    def merge_one_field(prefix: str, out_dir: str):
        """Plan + run the range/hot pull merge for one field's term space."""
        if boundaries == "sampled":
            hot_terms, bnds = plan_merge_sampled(manifest, cfg, prefix=prefix)
        else:
            terms_sorted, dfs = collect_term_stats(manifest, prefix=prefix)
            hot_terms, bnds = plan_merge_ranges(terms_sorted, dfs, cfg)
        hot_set = frozenset(hot_terms)
        fp = _fingerprint(manifest)
        seg_dirs = manifest.segment_dirs()
        doc_bases = [
            s["doc_base"] for s in sorted(manifest.segments, key=lambda s: s["doc_base"])
        ]
        n_segs = len(seg_dirs)
        os.makedirs(out_dir, exist_ok=True)

        specs: list[dict] = []
        for si, lo in enumerate(bnds):
            hi = bnds[si + 1] if si + 1 < len(bnds) else None
            specs.append({"kind": "range", "shard_id": si, "lo": lo, "hi": hi})
        for hr, term in enumerate(hot_terms):
            for bucket in range(cfg.hot_buckets):
                specs.append(
                    {
                        "kind": "hot",
                        "shard_id": _hot_shard_id(cfg, hr, bucket),
                        "term": term,
                        "bucket": bucket,
                    }
                )

        def run_spec(batch: pa.Table) -> pa.Table:
            out = []
            for spec in batch.to_pylist():
                if spec["kind"] == "range":
                    group = assemble_range_group(
                        seg_dirs, doc_bases, spec["lo"], spec["hi"], hot_set,
                        spec["shard_id"], prefix=prefix,
                    )
                else:
                    group = assemble_hot_group(
                        seg_dirs, doc_bases, list(range(n_segs)), n_segs,
                        spec["term"], spec["bucket"], cfg, spec["shard_id"],
                        prefix=prefix,
                    )
                if group.num_rows == 0:
                    continue
                out.append(write_merged_shard(
                    group, out_dir, fp, shard_id=spec["shard_id"],
                    postings_format=manifest.postings_format,
                ))
            return pa.Table.from_pylist(out) if out else pa.Table.from_pylist(
                [{"shard_id": -1, "shard_name": "", "n_terms": 0, "sum_doc_freq": 0,
                  "fingerprint": fp, "resumed": False}]
            ).slice(0, 0)

        # one Ray task per BLOCK of specs, ~2 blocks per CPU: at toy scale
        # a block per spec means hundreds of ~50 ms tasks whose scheduling
        # dwarfs the work; at 100-TB scale each spec is minutes of work and
        # the min() leaves one spec per block. Specs are interleaved
        # range/hot round-robin so a block doesn't accumulate one term's
        # hottest buckets (skew guard).
        try:
            import ray as _ray

            cpus = int(_ray.cluster_resources().get("CPU", 32))
        except Exception:
            cpus = 32
        per_cpu = int(os.environ.get("LUCENE_RAY_MERGE_BLOCKS_PER_CPU", "2"))
        if per_cpu <= 0:  # 0 = one block (task) per spec
            n_blocks = len(specs)
        else:
            n_blocks = max(1, min(len(specs), cpus * per_cpu))
        interleaved = [specs[i::n_blocks] for i in range(n_blocks)]
        flat = [s for group in interleaved for s in group]
        shard_stats = (
            rd.from_items(flat, override_num_blocks=n_blocks)
            .map_batches(run_spec, batch_size=None, batch_format="pyarrow")
            .take_all()
        )
        return hot_terms, bnds, shard_stats

    hot_terms, bnds, shard_stats = merge_one_field("", merged_dir)

    # extra fields: same range/hot pull merge over each field's own term
    # space, shards under merged/f_<name>/ (the per-field structures the
    # per-segment FieldReaders hold, now at the merged tier too)
    from ..state.segment import field_prefix

    # heterogeneous field sets (an incremental build that later added
    # extra_fields) cannot range-pull merge: every segment must hold every
    # merged field's artifacts, or the pull tasks would crash mid-merge on
    # a missing f_<name>.terms.parquet — fail up front with the same
    # explicit error compact.py raises for this case
    for fname in sorted((manifest.field_stats or {}).keys()):
        missing = [
            s["seg_name"]
            for s in manifest.segments
            if fname not in (s.get("field_stats") or {})
        ]
        if missing:
            raise ValueError(
                f"refusing to merge segments with differing field sets: field "
                f"{fname!r} missing from segments {missing[:5]}"
                f"{'...' if len(missing) > 5 else ''} — compact or rebuild the "
                f"older segments with the full field set first"
            )

    field_meta: dict[str, dict] = {}
    for fname in sorted((manifest.field_stats or {}).keys()):
        f_hot, f_bnds, f_stats = merge_one_field(
            field_prefix(fname), os.path.join(merged_dir, f"f_{fname}")
        )
        field_meta[fname] = {
            "n_shards": cfg.n_shards,
            "hot_buckets": cfg.hot_buckets,
            "hot_terms": f_hot,
            "boundaries": f_bnds,
            "shards": sorted(f_stats, key=lambda s: s["shard_id"]),
        }

    return _finalize(
        index_dir, merged_dir, manifest, cfg, hot_terms, shard_stats,
        boundaries=bnds, field_meta=field_meta,
    )


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
        cols = {
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
        if r.has_positions:
            cols["pos_width"] = pa.array(r._pos_width[s:e], type=pa.uint8())
            cols["pos_blob"] = pa.array(
                [
                    bytes(
                        r._positions[
                            int(r._pos_off[ti]) : int(r._pos_off[ti]) + int(r._len_pos[ti])
                        ]
                    )
                    for ti in range(s, e)
                ],
                type=pa.large_binary(),
            )
        if getattr(r, "has_payloads", False):
            pay_u8 = r._payloads.view(np.uint8) if len(r._payloads) else np.empty(0, np.uint8)
            cols["pay_blob"] = pa.array(
                [
                    bytes(
                        pay_u8[
                            int(r._pay_off[ti]) * 4 : (int(r._pay_off[ti]) + int(r.ttfs[ti])) * 4
                        ]
                    )
                    for ti in range(s, e)
                ],
                type=pa.large_binary(),
            )
        yield pa.table(cols)


def write_merged_shard(
    group: pa.Table, merged_dir: str, fingerprint: str, shard_id: int | None = None,
    postings_format: str = "for",
) -> dict:
    """Reduce: merge one shard group's fragments, commit atomically."""
    if shard_id is None:
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
    has_pos = "pos_blob" in g.column_names
    pos_blobs = g["pos_blob"].to_pylist() if has_pos else None
    pos_widths = g["pos_width"].to_numpy() if has_pos else None
    has_pay = "pay_blob" in g.column_names
    pay_blobs = g["pay_blob"].to_pylist() if has_pay else None

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
    out_pos_blobs: list[bytes] = []
    pos_meta = (
        (np.zeros(len(uniq), np.int64), np.zeros(len(uniq), np.uint8),
         np.zeros(len(uniq), np.int64))
        if has_pos
        else None
    )

    # decode every fragment, concatenate into whole-shard arrays with term
    # boundaries, then batch-encode all terms in one vectorized pass
    # (codec.encode_segment_terms — the same fast path the segment flush uses)
    d_cat, f_cat, n_cat, p_cat, pay_cat = [], [], [], [], []
    term_starts = np.zeros(len(uniq), dtype=np.int64)
    off = 0
    for ui in range(len(uniq)):
        s, e = int(starts[ui]), int(ends[ui])
        term_starts[ui] = off
        for fi in range(s, e):
            tp = parse_region(
                regions[fi], int(dfs[fi]), int(n_blocks[fi]), int(n_imps[fi]),
                int(len_docs[fi]), int(len_freqs[fi]),
            )
            d, f = tp.decode()
            d_cat.append(d + doc_bases[fi])  # -> global docIDs
            f_cat.append(f)
            n_cat.append(seg_norms(seg_dirs[fi])[d])
            if has_pos:
                # positions are doc-local: fragment streams concatenate in
                # doc_base order with no remap, then re-pack at the new width
                p_cat.append(decode_positions(pos_blobs[fi], int(pos_widths[fi]), f))
            if has_pay:
                # payloads ride as raw float32 bytes, same concat order
                pay_cat.append(np.frombuffer(pay_blobs[fi], dtype="<f4"))
            off += len(d)
        out_ttfs[ui] = int(ttfs[s:e].sum())
    term_ends = np.append(term_starts[1:], off)
    docs_all = np.concatenate(d_cat) if d_cat else np.empty(0, np.int64)
    freqs_all = np.concatenate(f_cat) if f_cat else np.empty(0, np.int64)
    norms_all = np.concatenate(n_cat) if n_cat else np.empty(0, np.uint8)
    pos_all = np.concatenate(p_cat) if has_pos and p_cat else None
    enc = encode_segment_terms(
        docs_all, freqs_all, norms_all, term_starts, term_ends, pos_stream=pos_all,
        postings_format=postings_format,
    )
    pos = 0
    ppos = 0
    for ui in range(len(uniq)):
        region, nb, ni, ld, lf = enc.term_region(ui)
        out_regions.append(region)
        meta[0][ui] = pos
        meta[1][ui] = nb
        meta[2][ui] = ni
        meta[3][ui] = ld
        meta[4][ui] = lf
        out_dfs[ui] = int(term_ends[ui] - term_starts[ui])
        pos += len(region)
        if has_pos:
            pblob, pw, pl = enc.term_positions_blob(ui)
            out_pos_blobs.append(pblob)
            pos_meta[0][ui] = ppos
            pos_meta[1][ui] = pw
            pos_meta[2][ui] = pl
            ppos += pl

    tmp = os.path.join(merged_dir, f".{shard_name}.tmp-{uuid.uuid4().hex[:8]}")
    os.makedirs(tmp, exist_ok=True)
    try:
        with open(os.path.join(tmp, POSTINGS_FILE), "wb") as f:
            for rg in out_regions:
                f.write(rg)
        if has_pos:
            with open(os.path.join(tmp, POSITIONS_FILE), "wb") as f:
                for b in out_pos_blobs:
                    f.write(b)
        pay_off = None
        if has_pay:
            pay_off = write_payloads_file(
                os.path.join(tmp, PAYLOADS_FILE), pay_cat, out_ttfs
            )
        pq.write_table(
            encode_term_table(uniq, out_dfs, out_ttfs, meta, pos_meta=pos_meta,
                              pay_off=pay_off),
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
        from ..state.manifest import fsync_dir_files

        fsync_dir_files(tmp)
        if os.path.exists(out_dir):
            # keep an existing dir only if it is the SAME fingerprint (a
            # concurrent task of this run won the race — content identical);
            # a stale shard from a previous segment set must be replaced or
            # re-merge-after-append would silently serve the old index
            try:
                same = load_json(os.path.join(out_dir, "stats.json")).get(
                    "fingerprint"
                ) == fingerprint
            except Exception:
                same = False
            if same:
                shutil.rmtree(tmp)
            else:
                from ..state.manifest import durable_rename

                old = out_dir + f".stale-{uuid.uuid4().hex[:8]}"
                os.rename(out_dir, old)
                durable_rename(tmp, out_dir)
                shutil.rmtree(old, ignore_errors=True)
        else:
            from ..state.manifest import durable_rename

            durable_rename(tmp, out_dir)
        return st
    finally:
        if os.path.exists(tmp):
            shutil.rmtree(tmp, ignore_errors=True)


def _fingerprint(manifest: IndexManifest) -> str:
    from ..state.manifest import segments_fingerprint

    return segments_fingerprint(manifest)


def _finalize(index_dir: str, merged_dir: str, manifest: IndexManifest,
              cfg: MergeConfig, hot_terms: list[str], shard_stats: list[dict],
              boundaries: list[str] | None = None,
              field_meta: dict | None = None) -> dict:
    # norms are NOT re-written at merge: readers resolve global docIDs to
    # per-segment norms files via doc_base offsets (SegmentedNorms in
    # search/merged.py) — the driver-side whole-corpus norms concat was a
    # 1-byte-per-doc single-writer bottleneck at scale
    merged = {
        "n_shards": cfg.n_shards,
        "hot_buckets": cfg.hot_buckets,
        "hot_terms": hot_terms,
        "doc_count": manifest.doc_count,
        "sum_total_term_freq": manifest.sum_total_term_freq,
        "shards": sorted(shard_stats, key=lambda s: s["shard_id"]),
        "fingerprint": _fingerprint(manifest),
        # range strategy: shard i covers terms [boundaries[i], boundaries[i+1])
        "strategy": "range" if boundaries is not None else "hash",
        "boundaries": boundaries,
        "fields": field_meta or {},
    }
    atomic_write_json(os.path.join(merged_dir, MERGED_MANIFEST), merged)
    manifest.merged = True
    manifest.save()
    return merged


def merge_index(
    index_dir: str, cfg: MergeConfig | None = None, strategy: str = "pull"
) -> dict:
    """Distributed segment merge (Ray must be initialised).

    strategy="pull" (default): range-partitioned ranged-read merge with
    SAMPLED boundaries — see merge_index_pull. strategy="pull-exact":
    same, with the exact whole-vocabulary driver aggregate for boundary
    planning. strategy="groupby": the Ray Data groupby-on-term shuffle —
    the true all-to-all path, kept for segment counts too large for
    per-reducer fan-in reads.
    """
    if strategy == "pull":
        return merge_index_pull(index_dir, cfg)
    if strategy == "pull-exact":
        return merge_index_pull(index_dir, cfg, boundaries="exact")
    return merge_index_groupby(index_dir, cfg)


def merge_index_groupby(index_dir: str, cfg: MergeConfig | None = None) -> dict:
    """Distributed merge via Ray Data groupby (the all-to-all exchange)."""
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

    pfmt = manifest.postings_format

    def reduce_shard(group: pa.Table) -> pa.Table:
        st = write_merged_shard(group, merged_dir, fp, postings_format=pfmt)
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
        shard_stats.append(write_merged_shard(
            group, merged_dir, fp, postings_format=manifest.postings_format))
    return _finalize(index_dir, merged_dir, manifest, cfg, hot_terms, shard_stats)
