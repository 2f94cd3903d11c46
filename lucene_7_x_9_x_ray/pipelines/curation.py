"""Corpus-curation operators for large-scale training-data pipelines:
benchmark decontamination, deterministic stratified sampling, and
fixed-window document chunking.

Reference role: these are the curation passes an LLM data pipeline runs
next to dedup (GPT-3/The-Pile-style n-gram decontamination; hash-based
reproducible sampling; long-document windowing before tokenization). The
engine side mirrors the repo's design rules:

- **Decontaminate** is a broadcast semi-join: the benchmark side is small
  by nature (eval sets), so its n-gram hash set is built once, sorted and
  ``ray.put`` — every corpus task does a vectorized ``np.isin`` against
  the shared array; the corpus side streams through ``map_batches`` with
  pruned columns and never shuffles. At 100 TB the only state per worker
  is the benchmark hash array.
- **Stratified sample** is stateless per row: keep iff
  ``md5_lower64(str(doc_id)) % 10_000 < rate(lang)`` — deterministic
  under retries/resumes and cluster-size independent, unlike
  ``Dataset.random_sample``.
- **Chunk windows** is a per-row explode (``flat_map`` shape): each doc
  emits ``ceil(n_tokens / W)`` windows with an md5 over the window text,
  so the downstream pack/tokenize stage can shard by (doc_id, chunk_id).

Every output column is reproduced exactly by the SQL oracles below
(md5_number_lower == md5_lower64 — see oracles.py module docstring).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import md5_hex, md5_lower64, md5_lower64_array
from .common import HEAVY_ROWS_PER_BLOCK, sized_read

# n-gram width for decontamination. Real pipelines use 8-13-word grams
# (GPT-3 used 13); the driver corpus' docs are short synthetic text, so 5
# keeps the fixture's overlap non-degenerate. The benchmark slice is
# doc_id % BENCH_MOD == 0 (a stand-in for the external eval-set input).
DECONTAM_NGRAM = 5
BENCH_MOD = 7

# per-language keep rates out of 10_000 (languages of the driver corpus);
# unlisted languages keep everything
SAMPLE_RATES = {"en": 5000, "de": 2500, "fr": 2500, "es": 7500, "zh": 10000}
SAMPLE_MOD = 10_000

CHUNK_W = 64  # tokens per window


def _ngram_strings(tokens: np.ndarray, n: int) -> np.ndarray:
    """Space-joined n-gram windows over one flat token array (vectorized:
    n-1 elementwise object-string concats, no per-window Python join)."""
    m = len(tokens) - n + 1
    if m <= 0:
        return np.empty(0, dtype=object)
    out = tokens[:m].copy()
    for j in range(1, n):
        out = out + " "
        out = out + tokens[j : j + m]
    return out


def _row_ngram_hashes(batch: pa.Table, n: int):
    """Per-row n-gram md5_lower64 hashes: (hashes uint64, parent row per
    hash). Windows never cross document boundaries."""
    toks = pc.split_pattern(batch["text"], pattern=" ")
    flat = np.asarray(
        pc.list_flatten(toks).to_numpy(zero_copy_only=False), dtype=object
    )
    counts = pc.list_value_length(toks).to_numpy().astype(np.int64)
    grams = _ngram_strings(flat, n)
    if len(grams) == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    # window j is valid iff it starts and ends inside the same row
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    parents = np.repeat(np.arange(len(counts)), counts)[: len(grams)]
    ends_ok = np.repeat(starts + counts, counts)[: len(grams)]
    valid = (np.arange(len(grams)) + n) <= ends_ok
    grams = grams[valid]
    parents = parents[valid]
    return md5_lower64_array(grams), parents


def benchmark_ngram_hashes(sf_dir: str) -> np.ndarray:
    """Sorted unique n-gram hashes of the benchmark slice — the small
    broadcast side, read with a pruned duckdb point query (only benchmark
    rows' text leaves storage)."""
    import duckdb

    con = duckdb.connect()
    texts = [
        r[0]
        for r in con.sql(
            f"SELECT text FROM '{sf_dir}/documents.parquet' "
            f"WHERE doc_id % {BENCH_MOD} = 0"
        ).fetchall()
    ]
    parts = []
    for t in texts:
        toks = np.asarray(t.split(" "), dtype=object)
        g = _ngram_strings(toks, DECONTAM_NGRAM)
        if len(g):
            parts.append(md5_lower64_array(g))
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts))


class DecontaminateBatch:
    """Actor-pool stage: holds the broadcast benchmark hash array once per
    worker (resolved from the object store in __init__, not per batch)."""

    def __init__(self, bench_ref):
        import ray

        self.bench = ray.get(bench_ref) if not isinstance(bench_ref, np.ndarray) else bench_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy()
        hashes, parents = _row_ngram_hashes(batch, DECONTAM_NGRAM)
        contaminated = np.zeros(batch.num_rows, dtype=bool)
        if len(hashes) and len(self.bench):
            hit = np.isin(hashes, self.bench, assume_unique=False)
            contaminated[np.unique(parents[hit])] = True
        keep = doc_ids % BENCH_MOD != 0  # benchmark rows are not corpus rows
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[keep], pa.int64()),
                "contaminated": pa.array(contaminated[keep], pa.bool_()),
            }
        )


def q_decontaminate(sf_dir: str) -> pa.Table:
    """(doc_id, contaminated) for every non-benchmark doc: contaminated
    iff it shares a DECONTAM_NGRAM-gram with any benchmark doc."""
    import ray

    bench_ref = ray.put(benchmark_ngram_hashes(sf_dir))
    ds = sized_read(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        rows_per_block=HEAVY_ROWS_PER_BLOCK,
    )
    out = ds.map_batches(
        DecontaminateBatch,
        batch_format="pyarrow",
        concurrency=(1, 8),
        fn_constructor_args=(bench_ref,),
    )
    return pa.concat_tables(ray.get(out.materialize().to_arrow_refs()))


def sample_batch(batch: pa.Table) -> pa.Table:
    """Keep rows whose doc_id hash falls under the language's rate."""
    doc_ids = batch["doc_id"].to_numpy()
    langs = np.asarray(batch["lang"].to_numpy(zero_copy_only=False), dtype=object)
    buckets = md5_lower64_array(
        np.asarray([str(int(d)) for d in doc_ids], dtype=object)
    ) % np.uint64(SAMPLE_MOD)
    rates = np.array(
        [SAMPLE_RATES.get(l, SAMPLE_MOD) for l in langs], dtype=np.uint64
    )
    keep = buckets < rates
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[keep], pa.int64()),
            "lang": pa.array(langs[keep], pa.string()),
        }
    )


def q_stratified_sample(sf_dir: str) -> pa.Table:
    """Deterministic per-language downsampling: (doc_id, lang) of the kept
    rows. Hash-threshold keep (not random_sample) so re-runs, resumes and
    cluster size never change the sample."""
    import ray

    ds = sized_read(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang"],
        rows_per_block=HEAVY_ROWS_PER_BLOCK,
    )
    out = ds.map_batches(sample_batch, batch_format="pyarrow")
    return pa.concat_tables(ray.get(out.materialize().to_arrow_refs()))


def chunk_batch(batch: pa.Table) -> pa.Table:
    """Explode each doc into CHUNK_W-token windows (flat_map shape):
    (doc_id, chunk_id, n_tokens, chunk_md5)."""
    toks = pc.split_pattern(batch["text"], pattern=" ")
    doc_ids = batch["doc_id"].to_numpy()
    counts = pc.list_value_length(toks).to_numpy().astype(np.int64)
    n_chunks = np.maximum((counts + CHUNK_W - 1) // CHUNK_W, 1)
    max_chunks = int(n_chunks.max()) if len(n_chunks) else 0
    out_doc, out_chunk, out_len, out_md5 = [], [], [], []
    for k in range(max_chunks):
        rows = np.flatnonzero(n_chunks > k)
        # vectorized slice+join of window k over every doc that has it
        sliced = pc.binary_join(
            pc.list_slice(toks, k * CHUNK_W, (k + 1) * CHUNK_W), " "
        )
        texts_k = np.asarray(sliced.to_numpy(zero_copy_only=False), dtype=object)[rows]
        out_doc.append(doc_ids[rows])
        out_chunk.append(np.full(len(rows), k, dtype=np.int64))
        out_len.append(np.minimum(counts[rows] - k * CHUNK_W, CHUNK_W))
        out_md5.append(np.asarray([md5_hex(t) for t in texts_k], dtype=object))
    if not out_doc:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "chunk_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "chunk_md5": pa.array([], pa.string()),
            }
        )
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
            "chunk_id": pa.array(np.concatenate(out_chunk), pa.int64()),
            "n_tokens": pa.array(np.concatenate(out_len), pa.int64()),
            "chunk_md5": pa.array(np.concatenate(out_md5), pa.string()),
        }
    )


def q_chunk_windows(sf_dir: str) -> pa.Table:
    import ray

    ds = sized_read(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        rows_per_block=HEAVY_ROWS_PER_BLOCK,
    )
    out = ds.map_batches(chunk_batch, batch_format="pyarrow")
    return pa.concat_tables(ray.get(out.materialize().to_arrow_refs()))


SEQ_LEN = 128  # tokens per packed training sequence

PER_SOURCE_CAP = 40  # max docs kept per source (host-cap role)


def _cap_rank_within(src: np.ndarray, doc_ids: np.ndarray) -> np.ndarray:
    """Keep-mask of the PER_SOURCE_CAP lowest doc_ids per source value
    (vectorized: lexsort + run-relative ranks)."""
    order = np.lexsort((doc_ids, src))
    s = src[order]
    run_starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
    rank = np.arange(len(s)) - np.repeat(run_starts, np.diff(np.r_[run_starts, len(s)]))
    keep = np.zeros(len(s), dtype=bool)
    keep[order] = rank < PER_SOURCE_CAP
    return keep


def _cap_combiner(batch: pa.Table) -> pa.Table:
    """Per-block partial: at most PER_SOURCE_CAP rows per source leave the
    block, so the downstream groupby shuffles ≤ cap × sources × blocks
    rows, not the corpus."""
    src = np.asarray(batch["source"].to_numpy(zero_copy_only=False), dtype=object)
    doc_ids = batch["doc_id"].to_numpy()
    keep = _cap_rank_within(src, doc_ids)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[keep], pa.int64()),
            "source": pa.array(src[keep], pa.string()),
        }
    )


# the final per-source reduce applies the identical cap over the gathered
# partials — one implementation, two stages
_cap_final = _cap_combiner


def q_source_caps(sf_dir: str) -> pa.Table:
    """Per-source document caps (the Common-Crawl per-host cap): keep the
    PER_SOURCE_CAP lowest-doc_id docs of each source. Combiner-first
    shape — per-block partial caps bound the shuffle to cap × sources
    rows per block; the final groupby(source) head-N sees only partials."""
    import ray

    ds = sized_read(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    out = (
        ds.map_batches(_cap_combiner, batch_format="pyarrow")
        .groupby("source")
        .map_groups(_cap_final, batch_format="pyarrow")
    )
    return pa.concat_tables(ray.get(out.materialize().to_arrow_refs()))


def _pack_summary_batch(batch: pa.Table) -> pa.Table:
    """Pass 1 of the distributed prefix sum: one (first_doc, last_doc,
    tok_sum) row per block — the only data that ever reaches the driver."""
    doc_ids = batch["doc_id"].to_numpy()
    if len(doc_ids) == 0:
        return pa.table(
            {
                "first_doc": pa.array([], pa.int64()),
                "last_doc": pa.array([], pa.int64()),
                "tok_sum": pa.array([], pa.int64()),
            }
        )
    if len(doc_ids) > 1 and not np.all(np.diff(doc_ids) > 0):
        raise ValueError("pack_sequences requires doc_id-ordered blocks")
    toks = pc.split_pattern(batch["text"], pattern=" ")
    tok_sum = int(pc.sum(pc.list_value_length(toks)).as_py() or 0)
    return pa.table(
        {
            "first_doc": pa.array([int(doc_ids[0])], pa.int64()),
            "last_doc": pa.array([int(doc_ids[-1])], pa.int64()),
            "tok_sum": pa.array([tok_sum], pa.int64()),
        }
    )


def _pack_assign_batch(batch: pa.Table, first_docs: np.ndarray, bases: np.ndarray) -> pa.Table:
    """Pass 2: each block adds its base offset to a within-block exclusive
    cumsum. The (block first_doc -> base) anchor arrays are tiny
    (O(n_blocks) ints) and ride the task closure. Anchor lookup is exact —
    a batch whose first doc is not a block anchor means the executor
    re-batched, and we fail loudly rather than emit wrong offsets."""
    doc_ids = batch["doc_id"].to_numpy()
    if len(doc_ids) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "tok_start": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "seq_first": pa.array([], pa.int64()),
                "seq_last": pa.array([], pa.int64()),
            }
        )
    toks = pc.split_pattern(batch["text"], pattern=" ")
    counts = pc.list_value_length(toks).to_numpy().astype(np.int64)
    i = np.searchsorted(first_docs, int(doc_ids[0]))
    if i >= len(first_docs) or first_docs[i] != int(doc_ids[0]):
        raise ValueError("pack_sequences batch does not align with a summary block")
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    starts += int(bases[i])
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "tok_start": pa.array(starts, pa.int64()),
            "n_tokens": pa.array(counts, pa.int64()),
            "seq_first": pa.array(starts // SEQ_LEN, pa.int64()),
            "seq_last": pa.array((starts + counts - 1) // SEQ_LEN, pa.int64()),
        }
    )


def q_pack_sequences(sf_dir: str) -> pa.Table:
    """GPT-style concat-and-chunk sequence packing: every doc's tokens are
    laid out contiguously in doc_id order and cut into SEQ_LEN-token
    training sequences; emits (doc_id, tok_start, n_tokens, seq_first,
    seq_last) so the tokenizer stage knows exactly which sequences each
    doc feeds.

    The global token offset is a **two-pass distributed prefix sum** —
    the standard way to scan at 100 TB without a sort or a driver loop:
    pass 1 streams the corpus once and ships 3 ints per block to the
    driver; the driver exclusive-scans the per-block sums (O(n_blocks)
    state) after checking the block doc ranges are disjoint and ordered;
    pass 2 streams again, adding each block's base to a vectorized
    within-block cumsum. Both passes see identical blocks because they
    map over the same materialized dataset with batch_size=None
    (whole-block batches)."""
    # the per-row kernel (split + count) is light — big blocks, plain tasks
    ds = sized_read(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).materialize()
    return _pack_dataset(ds)


def _pack_dataset(ds) -> pa.Table:
    """Both prefix-sum passes over an already-materialized (doc_id, text)
    Dataset (batch_size=None keeps block identity across the passes)."""
    import ray

    summary = pa.concat_tables(
        ray.get(
            ds.map_batches(_pack_summary_batch, batch_size=None, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
    )
    order = np.argsort(summary["first_doc"].to_numpy())
    firsts = summary["first_doc"].to_numpy()[order]
    lasts = summary["last_doc"].to_numpy()[order]
    sums = summary["tok_sum"].to_numpy()[order]
    if len(firsts) > 1 and not np.all(lasts[:-1] < firsts[1:]):
        raise ValueError("pack_sequences requires disjoint ordered block doc ranges")
    bases = np.zeros(len(sums), dtype=np.int64)
    np.cumsum(sums[:-1], out=bases[1:])
    out = ds.map_batches(
        lambda b: _pack_assign_batch(b, firsts, bases),
        batch_size=None,
        batch_format="pyarrow",
    )
    return pa.concat_tables(ray.get(out.materialize().to_arrow_refs()))


def q_corpus_to_sequences(sf_dir: str) -> pa.Table:
    """The composed training-data path: Gopher-style repetition quality
    filter -> concat-and-chunk sequence packing over the SURVIVORS. One
    streaming read feeds the filter; the packed offsets come from the
    same two-pass distributed prefix sum as q_pack_sequences, now over
    the filtered Dataset (row filtering preserves within-block doc order
    and block-range disjointness, so the pass-1 invariants hold; blocks
    filtered to zero rows are handled)."""
    from .textops import quality_filter_batch

    def keep_quality(batch: pa.Table) -> pa.Table:
        keep = quality_filter_batch(batch)["keep"]
        return batch.filter(keep)

    ds = (
        sized_read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(keep_quality, batch_format="pyarrow")
        .materialize()
    )
    return _pack_dataset(ds)


# --- SQL oracles ------------------------------------------------------------


def oracle_decontaminate_sql(relation: str = "documents") -> str:
    """Mirror of q_decontaminate: n-gram membership compared by
    md5_number_lower (the engine compares md5_lower64 hashes — identical
    function, so the oracle is exact including any collision)."""
    n = DECONTAM_NGRAM
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS arr FROM {relation}),
ng AS (SELECT doc_id,
              md5_number_lower(array_to_string(arr[i:i+{n - 1}], ' ')) AS h
       FROM (SELECT doc_id, arr, unnest(generate_series(1, len(arr) - {n - 1})) AS i
             FROM t)),
bench AS (SELECT DISTINCT h FROM ng WHERE doc_id % {BENCH_MOD} = 0)
SELECT d.doc_id,
       EXISTS (SELECT 1 FROM ng JOIN bench USING (h)
               WHERE ng.doc_id = d.doc_id) AS contaminated
FROM {relation} d WHERE d.doc_id % {BENCH_MOD} <> 0"""


def oracle_stratified_sample_sql(relation: str = "documents") -> str:
    cases = " ".join(
        f"WHEN '{lang}' THEN {rate}" for lang, rate in sorted(SAMPLE_RATES.items())
    )
    return f"""
SELECT doc_id, lang FROM {relation}
WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % {SAMPLE_MOD}
      < (CASE lang {cases} ELSE {SAMPLE_MOD} END)"""


def oracle_pack_sequences_sql(relation: str = "documents") -> str:
    """Mirror of q_pack_sequences: the global token offset is a window
    cumsum in doc_id order; sequence ids are integer division by SEQ_LEN."""
    L = SEQ_LEN
    return f"""
WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n FROM {relation}),
o AS (SELECT doc_id, n,
             COALESCE(sum(n) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
      FROM t)
SELECT doc_id, CAST(s AS BIGINT) AS tok_start, CAST(n AS BIGINT) AS n_tokens,
       CAST(s // {L} AS BIGINT) AS seq_first,
       CAST((s + n - 1) // {L} AS BIGINT) AS seq_last
FROM o"""


def oracle_corpus_to_sequences_sql(relation: str = "documents") -> str:
    """Mirror of q_corpus_to_sequences: the quality keep predicate
    (textops.quality_value_ctes — same raw-double comparisons as the
    engine), then the pack window cumsum in doc_id order over survivors."""
    from .textops import QUALITY_DUP_BIGRAM_MAX, QUALITY_MAX_TOK_MAX, quality_value_ctes

    L = SEQ_LEN
    return f"""
WITH {quality_value_ctes(relation)},
kept AS (SELECT doc_id FROM v
         WHERE dup_f <= {QUALITY_DUP_BIGRAM_MAX} AND tok_f <= {QUALITY_MAX_TOK_MAX}),
tt AS (SELECT d.doc_id, len(string_split(d.text, ' ')) AS n
       FROM {relation} d JOIN kept USING (doc_id)),
o AS (SELECT doc_id, n,
             COALESCE(sum(n) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
      FROM tt)
SELECT doc_id, CAST(s AS BIGINT) AS tok_start, CAST(n AS BIGINT) AS n_tokens,
       CAST(s // {L} AS BIGINT) AS seq_first,
       CAST((s + n - 1) // {L} AS BIGINT) AS seq_last
FROM o"""


def oracle_source_caps_sql(relation: str = "documents") -> str:
    return f"""
SELECT doc_id, source FROM {relation}
QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= {PER_SOURCE_CAP}"""


def oracle_chunk_windows_sql(relation: str = "documents") -> str:
    w = CHUNK_W
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS arr FROM {relation}),
k AS (SELECT doc_id, arr, len(arr) AS n,
             unnest(generate_series(0, greatest((len(arr) + {w} - 1) // {w}, 1) - 1)) AS chunk_id
      FROM t)
SELECT doc_id, chunk_id,
       least(n - chunk_id * {w}, {w}) AS n_tokens,
       md5(array_to_string(arr[chunk_id * {w} + 1 : chunk_id * {w} + {w}], ' ')) AS chunk_md5
FROM k"""


# --- mixture sampling (token-budget source weighting) -----------------------

# target token-share weights: head sources (src0-src4) get 3x the mass of
# the tail — the "rebalance the crawl toward curated sources" knob of an
# LLM data mixture. Raw weights; shares normalize over the live sources.
MIX_HEAD_SOURCES = frozenset({"src0", "src1", "src2", "src3", "src4"})
MIX_HEAD_W = 3.0
MIX_TAIL_W = 1.0


def _mix_weight(source: str) -> float:
    return MIX_HEAD_W if source in MIX_HEAD_SOURCES else MIX_TAIL_W


def q_mixture_sample(sf_dir: str) -> pa.Table:
    """Token-budget mixture sampling: choose per-source acceptance rates
    so the SAMPLED token mass follows the target weights, then keep docs
    by deterministic hash threshold: (doc_id, source).

    Two-pass shape (the 100-TB mixture pass): pass 1 aggregates per-source
    token totals with a per-block combiner (only (source, partial-sum)
    rows shuffle — O(sources) per block); the driver solves the water
    level B = min_s(tokens_s * W_total / w_s) so the binding source keeps
    rate 1.0 and every target share is met exactly in expectation; pass 2
    filters by md5 hash threshold (re-runs, resumes and cluster size never
    change the sample). Threshold arithmetic is plain IEEE doubles,
    reproduced verbatim in the SQL oracle."""
    import math

    import ray

    def tok_partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_value_length(
            pc.split_pattern(batch["text"], pattern=" ")
        ).to_numpy().astype(np.int64)
        src = np.asarray(batch["source"].to_numpy(zero_copy_only=False), dtype=object)
        order = np.argsort(src, kind="stable")
        s, t = src[order], toks[order]
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        return pa.table(
            {
                "source": pa.array(s[starts], pa.string()),
                "tok": pa.array(np.add.reduceat(t, starts), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    totals = (
        sized_read(f"{sf_dir}/documents.parquet", columns=["source", "text"])
        .map_batches(tok_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("tok", alias_name="tok"))
        .take_all()  # n_sources rows — tiny by construction
    )
    w_total = sum(_mix_weight(r["source"]) for r in totals)
    # a zero-token source can't anchor the water level (its share is
    # unreachable, not binding) — it just keeps nothing
    budget = min(
        float(r["tok"]) * w_total / _mix_weight(r["source"])
        for r in totals if r["tok"] > 0
    )
    thr = {
        r["source"]: (
            int(
                math.floor(
                    budget * _mix_weight(r["source"])
                    / (w_total * float(r["tok"])) * SAMPLE_MOD
                )
            )
            if r["tok"] > 0 else 0
        )
        for r in totals
    }
    thr_ref = ray.put(thr)

    class MixFilter:
        def __init__(self):
            self.thr = ray.get(thr_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            doc_ids = batch["doc_id"].to_numpy()
            src = np.asarray(
                batch["source"].to_numpy(zero_copy_only=False), dtype=object
            )
            buckets = md5_lower64_array(
                np.asarray([str(int(d)) for d in doc_ids], dtype=object)
            ) % np.uint64(SAMPLE_MOD)
            rates = np.array(
                [self.thr.get(s_, 0) for s_ in src], dtype=np.uint64
            )
            keep = buckets < rates
            return pa.table(
                {
                    "doc_id": pa.array(doc_ids[keep], pa.int64()),
                    "source": pa.array(src[keep], pa.string()),
                }
            )

    out = sized_read(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).map_batches(MixFilter, batch_format="pyarrow", concurrency=2)
    return pa.concat_tables(ray.get(out.materialize().to_arrow_refs()))


def oracle_mixture_sample_sql(relation: str = "documents") -> str:
    """(doc_id, source) mirror of q_mixture_sample: the same water-level
    arithmetic in SQL doubles, the same md5 bucket."""
    heads = ",".join(f"'{s}'" for s in sorted(MIX_HEAD_SOURCES))
    w = f"CASE WHEN source IN ({heads}) THEN {MIX_HEAD_W} ELSE {MIX_TAIL_W} END"
    return f"""WITH tok AS (
  SELECT source, SUM(len(string_split(text, ' '))) AS tok
  FROM {relation} GROUP BY source),
wt AS (SELECT source, tok, {w} AS w FROM tok),
tw AS (SELECT SUM(w) AS w_total FROM wt),
b AS (SELECT MIN(CAST(tok AS DOUBLE) * (SELECT w_total FROM tw) / w) AS budget
      FROM wt WHERE tok > 0),
thr AS (SELECT source,
               CASE WHEN tok > 0
                    THEN CAST(floor((SELECT budget FROM b) * w
                               / ((SELECT w_total FROM tw) * CAST(tok AS DOUBLE))
                               * {SAMPLE_MOD}) AS BIGINT)
                    ELSE 0 END AS thr
        FROM wt)
SELECT d.doc_id, d.source
FROM {relation} d JOIN thr USING (source)
WHERE md5_number_lower(CAST(d.doc_id AS VARCHAR)) % {SAMPLE_MOD} < thr.thr"""
