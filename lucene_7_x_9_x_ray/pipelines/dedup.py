"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine — the training-data-pipeline dedup suite.

Scale notes (designed for 10^12 docs, tested at sf*):
- exact: hash-partitioned groupby on the content hash — the only shuffle
  moves (hash, doc_id) pairs, never text.
- jaccard: classic shingle inverted-index MapReduce: explode distinct
  (shingle, doc) -> groupby(shingle) emits candidate pairs -> groupby(pair)
  counts intersections. Head shingles are the skew hazard: at web scale the
  LSH variant below replaces the full pair expansion; here the exact
  variant is kept oracle-checkable.
- minhash_lsh: signature = 128 universal-hash mins over shingle hashes;
  16 bands x 8 rows; candidates = bucket collisions (groupby on band
  hash), then exact-Jaccard verification. Probabilistic recall -> no SQL
  oracle (driver records rows-only).
- simhash: 64-bit fingerprints; Hamming-distance<=3 pairs found EXACTLY via
  4-band pigeonhole blocking (a pair within distance 3 must agree on one of
  4 disjoint 16-bit bands), so this one IS oracle-checkable.
- embedding: cosine >= threshold pairs via blocked numpy matmul against a
  broadcast matrix (ray.put once, not per batch).
"""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import md5_hex, md5_lower64_array
from ..functions.rounding import round_half_away, round_half_away_np

JACCARD_SHINGLE_N = 2
JACCARD_THRESHOLD = 0.4
MINHASH_PERMS = 128
MINHASH_BANDS = 16  # x 8 rows
SIMHASH_MAX_HAMMING = 3
EMBED_COS_THRESHOLD = 0.35

_MERSENNE = (1 << 61) - 1


def _to_table(ds) -> pa.Table:
    import ray

    parts = ray.get(ds.to_arrow_refs())
    parts = [p for p in parts if p.num_rows] or parts[:1]
    return pa.concat_tables(parts) if parts else pa.table({})


# --- exact dedup ------------------------------------------------------------


def q_exact_dedup(sf_dir: str) -> pa.Table:
    """Exact duplicate groups by content hash: (text_md5, keep_doc_id,
    n_copies). updateDocument/delete-by-term analogue: keep = min doc_id."""
    import ray.data as rd
    from ray.data.aggregate import Count, Min

    def add_hash(batch: pa.Table) -> pa.Table:
        fps = [md5_hex(t) for t in batch["text"].to_pylist()]
        return pa.table({"text_md5": pa.array(fps, pa.string()), "doc_id": batch["doc_id"]})

    ds = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(add_hash, batch_format="pyarrow")
        .groupby("text_md5")
        .aggregate(Min("doc_id", alias_name="keep_doc_id"), Count(alias_name="n_copies"))
    )
    t = _to_table(ds)
    return t.select(["text_md5", "keep_doc_id", "n_copies"]).cast(
        pa.schema(
            [("text_md5", pa.string()), ("keep_doc_id", pa.int64()), ("n_copies", pa.int64())]
        )
    )


def oracle_exact_dedup_sql(relation: str = "documents") -> str:
    return f"""SELECT md5(text) AS text_md5, min(doc_id) AS keep_doc_id,
       count(*) AS n_copies
FROM {relation} GROUP BY md5(text)"""


# --- shingles (shared) ------------------------------------------------------


def shingle_batch(batch: pa.Table, n: int = JACCARD_SHINGLE_N) -> pa.Table:
    """Explode docs to DISTINCT (doc_id, shingle-hash) pairs (uint64)."""
    toks = pc.split_pattern(batch["text"], pattern=" ")
    flat = np.asarray(pc.list_flatten(toks).to_numpy(zero_copy_only=False), dtype=object)
    parents = pc.list_parent_indices(toks).to_numpy()
    doc_ids = batch["doc_id"].to_numpy()
    out_doc, out_sh = [], []
    starts = np.searchsorted(parents, np.arange(batch.num_rows))
    ends = np.append(starts[1:], len(parents))
    for i in range(batch.num_rows):
        t = flat[starts[i] : ends[i]]
        if len(t) < n:
            continue
        sh = {" ".join(t[j : j + n]) for j in range(len(t) - n + 1)}
        hs = md5_lower64_array(sorted(sh))
        out_doc.append(np.full(len(hs), doc_ids[i], dtype=np.int64))
        out_sh.append(hs)
    if not out_doc:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "shingle": pa.array([], pa.uint64())}
        )
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(out_doc)),
            "shingle": pa.array(np.concatenate(out_sh), pa.uint64()),
        }
    )


def _shingle_dataset(sf_dir: str, n: int):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        lambda b: shingle_batch(b, n), batch_format="pyarrow"
    )


PAIR_BUCKETS = 256  # shingle-hash buckets per pair-emit group


def _emit_pairs_vectorized(group: pa.Table) -> pa.Table:
    """All intra-shingle doc pairs of one bucket, numpy run-length style.

    The group holds many shingles (bucketed groupby, not per-shingle):
    sort by shingle, find runs, expand each run of length L to its
    L*(L-1)/2 ordered pairs without a Python loop over shingles.
    """
    sh = group["shingle"].to_numpy()
    docs = group["doc_id"].to_numpy()
    order = np.lexsort((docs, sh))
    sh, docs = sh[order], docs[order]
    run_start = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
    run_len = np.diff(np.r_[run_start, len(sh)])
    keep = run_len > 1
    starts, lens = run_start[keep], run_len[keep]
    if len(starts) == 0:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    n_pairs = lens * (lens - 1) // 2
    # per run: local (i, j) upper-triangle index pairs
    a_idx, b_idx = [], []
    for L in np.unique(lens):
        ii, jj = np.triu_indices(int(L), k=1)
        sel = lens == L
        base = starts[sel]
        a_idx.append((base[:, None] + ii[None, :]).ravel())
        b_idx.append((base[:, None] + jj[None, :]).ravel())
    a = docs[np.concatenate(a_idx)]
    b = docs[np.concatenate(b_idx)]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    # partial aggregation (combiner): count per pair INSIDE the group so the
    # downstream combine only sees one row per (pair, bucket). Pair identity
    # is kept as two int64 columns (lexsort run-length), NOT packed into one
    # word — doc_ids at 10^12-doc scale don't fit 32 bits each.
    order = np.lexsort((hi, lo))
    lo, hi = lo[order], hi[order]
    change = np.r_[True, (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])]
    starts = np.flatnonzero(change)
    cnt = np.diff(np.r_[starts, len(lo)])
    return pa.table(
        {
            "a": pa.array(lo[starts].astype(np.int64)),
            "b": pa.array(hi[starts].astype(np.int64)),
            "inter_part": pa.array(cnt.astype(np.int64)),
        }
    )


def _pairs_from_shingles(sh_table: pa.Table) -> dict[tuple[int, int], int]:
    """Intersection counts per doc pair from the (doc, shingle) relation.

    Shuffle key = shingle-hash bucket (PAIR_BUCKETS groups) so the pair
    expansion runs vectorized per bucket instead of once per shingle —
    the per-group overhead of a per-shingle groupby dominates otherwise.
    """
    import ray.data as rd

    bucket = pa.array(
        (sh_table["shingle"].to_numpy() % np.uint64(PAIR_BUCKETS)).astype(np.int64)
    )
    ds = rd.from_arrow(sh_table.append_column("bucket", bucket))

    partials = _to_table(
        ds.groupby("bucket").map_groups(_emit_pairs_vectorized, batch_format="pyarrow")
    )
    if partials.num_rows == 0 or "a" not in partials.column_names:
        return {}
    # final combine of the per-bucket partial counts: the partials are one
    # row per (pair, bucket) — small by construction (candidate pairs only),
    # so a driver-side segmented sum replaces a second all-to-all shuffle.
    a = partials["a"].to_numpy()
    b = partials["b"].to_numpy()
    c = partials["inter_part"].to_numpy()
    order = np.lexsort((b, a))
    a, b, c = a[order], b[order], c[order]
    starts = np.flatnonzero(np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
    sums = np.add.reduceat(c, starts)
    return {
        (int(aa), int(bb)): int(s)
        for aa, bb, s in zip(a[starts], b[starts], sums)
    }


def q_jaccard_pairs(sf_dir: str) -> pa.Table:
    """Exact n-gram Jaccard near-dup pairs: (doc_a, doc_b, jaccard_r >= θ)."""
    sh = _to_table(_shingle_dataset(sf_dir, JACCARD_SHINGLE_N))
    inter = _pairs_from_shingles(sh)
    sizes: dict[int, int] = {}
    for d, c in zip(*np.unique(sh["doc_id"].to_numpy(), return_counts=True)):
        sizes[int(d)] = int(c)
    out_a, out_b, out_j = [], [], []
    for (a, b), i in sorted(inter.items()):
        j = i / (sizes[a] + sizes[b] - i)
        if j >= JACCARD_THRESHOLD:
            out_a.append(a)
            out_b.append(b)
            out_j.append(round_half_away(j, 6))
    return pa.table(
        {
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "jaccard_r": pa.array(out_j, pa.float64()),
        }
    )


def oracle_jaccard_pairs_sql(relation: str = "documents") -> str:
    n = JACCARD_SHINGLE_N
    expr = " || ' ' || ".join(f"arr[i+{k}]" for k in range(n))
    return f"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS arr FROM {relation}),
sh AS (SELECT DISTINCT doc_id, md5_number_lower({expr}) AS shingle
       FROM (SELECT doc_id, arr,
                    unnest(generate_series(1, greatest(len(arr) - {n - 1}, 0))) AS i
             FROM t)),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
pairs AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter
          FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
          GROUP BY x.doc_id, y.doc_id)
SELECT p.doc_a, p.doc_b,
       ROUND(CAST(p.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - p.inter), 6) AS jaccard_r
FROM pairs p JOIN sizes sa ON sa.doc_id = p.doc_a JOIN sizes sb ON sb.doc_id = p.doc_b
WHERE CAST(p.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - p.inter) >= {JACCARD_THRESHOLD}"""


# --- MinHash + LSH ----------------------------------------------------------


def _minhash_params(seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=MINHASH_PERMS, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=MINHASH_PERMS, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signatures(sh_table: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(doc_ids, signatures[n_docs, MINHASH_PERMS]) from (doc, shingle)."""
    docs = sh_table["doc_id"].to_numpy()
    sh = sh_table["shingle"].to_numpy().astype(np.uint64)
    uniq_docs, inv = np.unique(docs, return_inverse=True)
    a, b = _minhash_params()
    sig = np.full((len(uniq_docs), MINHASH_PERMS), np.iinfo(np.uint64).max, dtype=np.uint64)
    # h_i(x) = (a_i * x + b_i) mod 2^61-1, computed blockwise to bound memory
    block = 1 << 16
    for s in range(0, len(sh), block):
        x = sh[s : s + block]
        hv = (x[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
        np.minimum.at(sig, inv[s : s + block], hv)
    return uniq_docs, sig


def q_minhash_lsh_pairs(sf_dir: str) -> pa.Table:
    """MinHash+LSH candidate pairs verified by exact Jaccard:
    (doc_a, doc_b, jaccard_r). Probabilistic recall — rows-only check."""
    sh = _to_table(_shingle_dataset(sf_dir, JACCARD_SHINGLE_N))
    doc_ids, sig = minhash_signatures(sh)
    rows = MINHASH_PERMS // MINHASH_BANDS
    cand: set[tuple[int, int]] = set()
    for band in range(MINHASH_BANDS):
        chunk = sig[:, band * rows : (band + 1) * rows]
        _, inv = np.unique(chunk, axis=0, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        sorted_inv = inv[order]
        starts = np.searchsorted(sorted_inv, np.arange(sorted_inv.max() + 1))
        ends = np.append(starts[1:], len(sorted_inv))
        for s, e in zip(starts, ends):
            if e - s > 1:
                members = np.sort(doc_ids[order[s:e]])
                cand.update(itertools.combinations(members.tolist(), 2))

    # exact verification against the shingle sets
    sets: dict[int, set[int]] = {}
    for d, s in zip(sh["doc_id"].to_numpy(), sh["shingle"].to_numpy()):
        sets.setdefault(int(d), set()).add(int(s))
    out_a, out_b, out_j = [], [], []
    for a, b in sorted(cand):
        sa, sb = sets[a], sets[b]
        i = len(sa & sb)
        j = i / (len(sa) + len(sb) - i) if i else 0.0
        if j >= JACCARD_THRESHOLD:
            out_a.append(a)
            out_b.append(b)
            out_j.append(round_half_away(j, 6))
    return pa.table(
        {
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "jaccard_r": pa.array(out_j, pa.float64()),
        }
    )


# --- SimHash ----------------------------------------------------------------


def q_simhash_pairs(sf_dir: str) -> pa.Table:
    """SimHash near-dup pairs with Hamming distance <= 3, found exactly via
    4-band pigeonhole blocking: (doc_a, doc_b, hamming)."""
    from .textops import fingerprint_batch

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        fingerprint_batch, batch_format="pyarrow"
    )
    t = _to_table(ds)
    docs = t["doc_id"].to_numpy()
    sims = t["simhash"].to_numpy().astype(np.uint64)
    cand: set[tuple[int, int]] = set()
    for band in range(4):
        key = (sims >> np.uint64(band * 16)) & np.uint64(0xFFFF)
        order = np.argsort(key, kind="stable")
        ks = key[order]
        bounds = np.flatnonzero(np.diff(ks)) + 1
        for s, e in zip(np.r_[0, bounds], np.r_[bounds, len(ks)]):
            if e - s > 1:
                members = np.sort(docs[order[s:e]])
                cand.update(itertools.combinations(members.tolist(), 2))
    idx = {int(d): i for i, d in enumerate(docs)}
    out_a, out_b, out_h = [], [], []
    for a, b in sorted(cand):
        h = int(bin(int(sims[idx[a]]) ^ int(sims[idx[b]])).count("1"))
        if h <= SIMHASH_MAX_HAMMING:
            out_a.append(a)
            out_b.append(b)
            out_h.append(h)
    return pa.table(
        {
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "hamming": pa.array(out_h, pa.int64()),
        }
    )


def oracle_simhash_pairs_sql(relation: str = "documents") -> str:
    from .textops import oracle_fingerprint_sql

    return f"""WITH fp AS ({oracle_fingerprint_sql(relation)})
SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
FROM fp x JOIN fp y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= {SIMHASH_MAX_HAMMING}"""


# --- embedding cosine near-dup ----------------------------------------------


def q_embed_dup_pairs(sf_dir: str) -> pa.Table:
    """Embedding near-dup pairs: cosine >= θ, (vec_a, vec_b, cos_r).

    Blocked matmul of each batch against the full broadcast matrix
    (ray.put once; each task reads the object-store copy zero-copy).
    """
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    full = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids_all = full["vec_id"].to_numpy()
    mat = np.stack(full["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ref = ray.put((ids_all, mat))

    class PairFinder:
        def __init__(self):
            self.ids_all, self.mat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["vec_id"].to_numpy()
            v = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            sims = v @ self.mat.T
            ii, jj = np.nonzero(sims >= EMBED_COS_THRESHOLD)
            a = ids[ii]
            b = self.ids_all[jj]
            keep = a < b
            return pa.table(
                {
                    "vec_a": pa.array(a[keep], pa.int64()),
                    "vec_b": pa.array(b[keep], pa.int64()),
                    "cos_r": pa.array(round_half_away_np(sims[ii, jj][keep], 6), pa.float64()),
                }
            )

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]).map_batches(
        PairFinder, batch_format="pyarrow", concurrency=2
    )
    return _to_table(ds)


def oracle_embed_dup_sql(relation: str = "embeddings") -> str:
    return f"""WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM {relation})
SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
       ROUND(list_dot_product(x.e, y.e)
             / (sqrt(list_dot_product(x.e, x.e)) * sqrt(list_dot_product(y.e, y.e))), 6) AS cos_r
FROM n x JOIN n y ON x.vec_id < y.vec_id
WHERE list_dot_product(x.e, y.e)
      / (sqrt(list_dot_product(x.e, x.e)) * sqrt(list_dot_product(y.e, y.e)))
      >= {EMBED_COS_THRESHOLD}"""
