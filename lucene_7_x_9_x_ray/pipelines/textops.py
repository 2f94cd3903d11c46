"""Text-analysis operators for large-scale training-data pipelines.

All operators are single-pass ``map_batches`` stages over zero-copy Arrow
batches of the ``documents`` table (columns pruned at the read), using
pyarrow.compute / numpy kernels on the exploded token stream — no Python
loop over rows in the hot path. Results are small tables; at 100 TB the
same stages run as ``ds.map_batches(...).write_parquet(...)`` with the
stats columns appended to each block.

Oracle parity: every output column is reproduced exactly by the SQL in
``oracles_textops_*`` below (see oracles.py module docstring for the
tokenizer-equivalence argument).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import md5_hex, md5_lower64_array
from .common import HEAVY_ROWS_PER_BLOCK, sized_read
from ..functions.rounding import round_half_away_np

# stopword list for quality scoring: classic-33-style English function words
# restricted to ones present in the driver vocabulary plus a few real ones
# (EnglishAnalyzer.java:48-56 is the reference shape).
QUALITY_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# word-profile language-ID: argmax of profile-token hits, lexicographically
# smallest profile wins ties, 'und' when nothing hits. (The production path
# for real web text is char-trigram profiles — same shuffle-free shape, the
# profile table just gets bigger; word profiles keep the oracle exact.)
LANG_PROFILES: dict[str, list[str]] = {
    "lang_a": ["the", "a", "key", "hash", "value"],
    "lang_b": ["table", "row", "column", "scan"],
    "lang_c": ["window", "batch", "stream", "spark"],
}

SHINGLE_N = 3  # fingerprint shingle width


def _tok_arrays(batch: pa.Table, text_col: str = "text"):
    """Explode text -> (list array, flat tokens, parent row indices)."""
    toks = pc.split_pattern(batch[text_col], pattern=" ")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy()
    return toks, flat, parents


def _sum_by_parent(values: np.ndarray, parents: np.ndarray, n_rows: int) -> np.ndarray:
    # parents (list_parent_indices) is nondecreasing -> segmented reduceat,
    # not the scalar-loop np.add.at
    out = np.zeros(n_rows, dtype=np.int64)
    if len(parents) == 0:
        return out
    starts = np.flatnonzero(np.r_[True, parents[1:] != parents[:-1]])
    out[parents[starts]] = np.add.reduceat(values.astype(np.int64), starts)
    return out


def doc_stats_batch(batch: pa.Table) -> pa.Table:
    """Per-doc quality stats: token counts, distinct ratio, stopword ratio,
    mean token length. Vectorized: explode + segmented reductions."""
    n = batch.num_rows
    toks, flat, parents = _tok_arrays(batch)
    n_tokens = pc.list_value_length(toks).to_numpy().astype(np.int64)

    tok_lens = pc.utf8_length(flat).to_numpy()
    total_len = _sum_by_parent(tok_lens, parents, n)

    stop_mask = pc.is_in(flat, value_set=pa.array(QUALITY_STOPWORDS)).to_numpy(
        zero_copy_only=False
    )
    stop_hits = _sum_by_parent(stop_mask, parents, n)

    # distinct tokens per row: unique of (parent, token-code) pairs
    codes = pc.dictionary_encode(flat).combine_chunks().indices.to_numpy()
    pair = parents.astype(np.int64) * (int(codes.max()) + 1 if len(codes) else 1) + codes
    uniq_parents = parents[np.unique(pair, return_index=True)[1]]
    n_distinct = np.bincount(uniq_parents, minlength=n).astype(np.int64)

    with np.errstate(invalid="ignore"):
        stop_ratio = round_half_away_np(stop_hits / n_tokens, 6)
        mean_tok_len = round_half_away_np(total_len / n_tokens, 6)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tokens),
            "n_distinct": pa.array(n_distinct),
            "stop_ratio": pa.array(stop_ratio, pa.float64()),
            "mean_tok_len": pa.array(mean_tok_len, pa.float64()),
        }
    )


def _per_row_value_freqs(values: pa.Array, parents: np.ndarray, n_rows: int):
    """Per-(row, value) frequencies via dictionary codes over a flat value
    stream. Returns (n_per_row, n_distinct_per_row, max_freq_per_row) —
    all segmented reductions, no Python loop over rows."""
    n_vals = np.bincount(parents, minlength=n_rows).astype(np.int64)
    n_distinct = np.zeros(n_rows, dtype=np.int64)
    max_freq = np.zeros(n_rows, dtype=np.int64)
    if len(parents) == 0:
        return n_vals, n_distinct, max_freq
    enc = pc.dictionary_encode(values)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy().astype(np.int64)
    ncodes = int(codes.max()) + 1 if len(codes) else 1
    pair = parents.astype(np.int64) * ncodes + codes
    uniq_pair, freq = np.unique(pair, return_counts=True)
    up_parent = (uniq_pair // ncodes).astype(np.int64)
    n_distinct = np.bincount(up_parent, minlength=n_rows).astype(np.int64)
    rstarts = np.flatnonzero(np.r_[True, up_parent[1:] != up_parent[:-1]])
    max_freq[up_parent[rstarts]] = np.maximum.reduceat(freq, rstarts)
    return n_vals, n_distinct, max_freq


# Gopher/C4-style repetition thresholds, set near the corpus q80 so the
# keep flag splits the driver corpus non-trivially at every sf (measured:
# dup-bigram q80 ~= 0.051, max-token q80 ~= 0.12).
QUALITY_DUP_BIGRAM_MAX = 0.05
QUALITY_MAX_TOK_MAX = 0.12


def quality_filter_batch(batch: pa.Table) -> pa.Table:
    """Gopher/C4-style repetition quality filter (Rae et al. 2021 "Scaling
    Language Models" Table A1 repetition rules, re-expressed over the
    whitespace token stream): per doc —

    - ``dup_bigram_frac``: 1 − distinct/total 2-grams (duplicate n-gram
      fraction);
    - ``top_bigram_frac``: most-frequent-2-gram count / total 2-grams
      (top n-gram coverage);
    - ``max_tok_frac``: most-frequent-token count / tokens;
    - ``keep``: dup_bigram_frac ≤ 0.05 AND max_tok_frac ≤ 0.12.

    Fully vectorized: one dictionary-encode + segmented reductions per
    metric; bigram strings built with two elementwise object concats."""
    n = batch.num_rows
    toks, flat, parents = _tok_arrays(batch)
    n_tokens, _, max_tok = _per_row_value_freqs(flat, parents, n)

    flat_np = np.asarray(flat.to_numpy(zero_copy_only=False), dtype=object)
    if len(flat_np) > 1:
        bg = flat_np[:-1] + " "
        bg = bg + flat_np[1:]
        same_row = parents[:-1] == parents[1:]
        bg_vals = pa.array(bg[same_row], pa.string())
        bg_parents = parents[:-1][same_row]
    else:
        bg_vals = pa.array([], pa.string())
        bg_parents = np.empty(0, dtype=parents.dtype)
    n_bg, nd_bg, max_bg = _per_row_value_freqs(bg_vals, bg_parents, n)

    with np.errstate(invalid="ignore", divide="ignore"):
        dup_frac = np.where(n_bg > 0, 1.0 - nd_bg / n_bg, 0.0)
        top_frac = np.where(n_bg > 0, max_bg / n_bg, 0.0)
        tok_frac = np.where(n_tokens > 0, max_tok / n_tokens, 0.0)
    keep = (dup_frac <= QUALITY_DUP_BIGRAM_MAX) & (tok_frac <= QUALITY_MAX_TOK_MAX)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tokens),
            "dup_bigram_frac": pa.array(round_half_away_np(dup_frac, 6), pa.float64()),
            "top_bigram_frac": pa.array(round_half_away_np(top_frac, 6), pa.float64()),
            "max_tok_frac": pa.array(round_half_away_np(tok_frac, 6), pa.float64()),
            "keep": pa.array(keep, pa.bool_()),
        }
    )


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Profile-hit language ID; deterministic argmax with lexicographic ties."""
    n = batch.num_rows
    _, flat, parents = _tok_arrays(batch)
    counts = {}
    for name in sorted(LANG_PROFILES):
        mask = pc.is_in(flat, value_set=pa.array(LANG_PROFILES[name])).to_numpy(
            zero_copy_only=False
        )
        counts[name] = _sum_by_parent(mask, parents, n)
    names = sorted(LANG_PROFILES)
    stacked = np.stack([counts[nm] for nm in names])  # (profiles, rows)
    best = np.argmax(stacked, axis=0)  # first max == lexicographically smallest
    any_hit = stacked.max(axis=0) > 0
    pred = np.where(any_hit, np.array(names, dtype=object)[best], "und")
    cols = {"doc_id": batch["doc_id"], "pred_lang": pa.array(pred, pa.string())}
    for nm in names:
        cols[f"c_{nm}"] = pa.array(counts[nm])
    return pa.table(cols)


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Document fingerprints: full-text md5, 64-bit SimHash over weighted
    token hashes, and the min rolling shingle hash (winnowing-style).

    SimHash: sum freq*(+/-1) per bit of md5_lower64(term); bit set iff
    sum > 0. Shingle hash: min over md5_lower64 of space-joined
    SHINGLE_N-gram windows.
    """
    n = batch.num_rows
    texts = batch["text"].to_pylist()
    _, flat, parents = _tok_arrays(batch)
    flat_np = np.asarray(flat.to_numpy(zero_copy_only=False), dtype=object)

    # per (row, term) frequencies via dictionary codes
    codes = pc.dictionary_encode(flat).combine_chunks()
    dict_vals = np.asarray(codes.dictionary.to_numpy(zero_copy_only=False), dtype=object)
    code_np = codes.indices.to_numpy().astype(np.int64)
    ncodes = len(dict_vals)
    pair = parents.astype(np.int64) * ncodes + code_np
    uniq_pair, freq = np.unique(pair, return_counts=True)
    up_parent = (uniq_pair // ncodes).astype(np.int64)
    up_code = (uniq_pair % ncodes).astype(np.int64)

    term_hash = md5_lower64_array(dict_vals)  # uint64 per dict term
    h = term_hash[up_code]
    # (pairs, 64) of +/-freq
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    contrib = (bits * 2 - 1) * freq[:, None].astype(np.int64)
    acc = np.zeros((n, 64), dtype=np.int64)
    # up_parent is sorted (uniq_pair ascending, parent = pair // ncodes):
    # one reduceat per parent run replaces the scalar-loop np.add.at
    if len(up_parent):
        rstarts = np.flatnonzero(np.r_[True, up_parent[1:] != up_parent[:-1]])
        acc[up_parent[rstarts]] = np.add.reduceat(contrib, rstarts, axis=0)
    simhash = ((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64
    )

    # min shingle hash per row (rolling SHINGLE_N-gram over the token
    # stream): build every window over the FLAT stream with elementwise
    # object concats, drop windows crossing row boundaries, hash once,
    # then one segmented min per row — no Python loop over rows
    min_sh = np.full(n, np.iinfo(np.uint64).max, dtype=np.uint64)
    m = len(flat_np) - SHINGLE_N + 1
    if m > 0:
        grams = flat_np[:m].copy()
        for j in range(1, SHINGLE_N):
            grams = grams + " "
            grams = grams + flat_np[j : j + m]
        same_row = parents[: m] == parents[SHINGLE_N - 1 :]
        g_parents = parents[:m][same_row]
        if len(g_parents):
            hashes = md5_lower64_array(grams[same_row])
            rstarts = np.flatnonzero(np.r_[True, g_parents[1:] != g_parents[:-1]])
            min_sh[g_parents[rstarts]] = np.minimum.reduceat(hashes, rstarts)

    fp = [md5_hex(t) for t in texts]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fp_md5": pa.array(fp, pa.string()),
            "simhash": pa.array(simhash, pa.uint64()),
            "min_shingle_hash": pa.array(min_sh, pa.uint64()),
        }
    )


def _run(sf_dir: str, fn, columns=("doc_id", "text")) -> pa.Table:
    import ray.data as rd

    ds = sized_read(f"{sf_dir}/documents.parquet", columns=list(columns),
                    rows_per_block=HEAVY_ROWS_PER_BLOCK)
    out = ds.map_batches(fn, batch_format="pyarrow")
    import ray

    # materialize() avoids to_arrow_refs' duplicate limit-1 schema execution
    return pa.concat_tables(ray.get(out.materialize().to_arrow_refs()))


def q_doc_stats(sf_dir: str) -> pa.Table:
    return _run(sf_dir, doc_stats_batch)


def q_lang_id(sf_dir: str) -> pa.Table:
    return _run(sf_dir, lang_id_batch)


def q_fingerprint(sf_dir: str) -> pa.Table:
    return _run(sf_dir, fingerprint_batch)


def q_quality_filter(sf_dir: str) -> pa.Table:
    return _run(sf_dir, quality_filter_batch)


# --- SQL oracles ------------------------------------------------------------


def oracle_doc_stats_sql(relation: str = "documents") -> str:
    stops = " OR ".join(f"x = '{s}'" for s in QUALITY_STOPWORDS)
    return f"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS arr FROM {relation})
SELECT doc_id,
       CAST(len(arr) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(arr)) AS BIGINT) AS n_distinct,
       ROUND(CAST(len(list_filter(arr, x -> {stops})) AS DOUBLE) / len(arr), 6) AS stop_ratio,
       ROUND(CAST(list_aggregate(list_transform(arr, x -> length(x)), 'sum') AS DOUBLE)
             / len(arr), 6) AS mean_tok_len
FROM t"""


def oracle_lang_id_sql(relation: str = "documents") -> str:
    names = sorted(LANG_PROFILES)
    hit_cols = []
    for nm in names:
        cond = " OR ".join(f"x = '{t}'" for t in LANG_PROFILES[nm])
        hit_cols.append(f"CAST(len(list_filter(arr, x -> {cond})) AS BIGINT) AS c_{nm}")
    a, b, c = names
    return f"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS arr FROM {relation}),
h AS (SELECT doc_id, {', '.join(hit_cols)} FROM t)
SELECT doc_id,
       CASE WHEN c_{a} >= c_{b} AND c_{a} >= c_{c} AND c_{a} > 0 THEN '{a}'
            WHEN c_{b} >= c_{c} AND c_{b} > 0 THEN '{b}'
            WHEN c_{c} > 0 THEN '{c}'
            ELSE 'und' END AS pred_lang,
       c_{a}, c_{b}, c_{c}
FROM h"""


def quality_value_ctes(relation: str = "documents") -> str:
    """The quality-metric CTE chain ending at ``v`` (doc_id, n_tokens,
    dup_f, top_f, tok_f) — shared by the quality_filter oracle and the
    composed corpus_to_sequences oracle."""
    return f"""t AS (SELECT doc_id, string_split(text, ' ') AS arr FROM {relation}),
tf AS (SELECT doc_id, term, count(*) AS f
       FROM (SELECT doc_id, unnest(arr) AS term FROM t) GROUP BY doc_id, term),
mt AS (SELECT doc_id, CAST(max(f) AS BIGINT) AS max_tok,
              CAST(sum(f) AS BIGINT) AS n_tokens FROM tf GROUP BY doc_id),
bf AS (SELECT doc_id, g, count(*) AS f
       FROM (SELECT doc_id, arr[i] || ' ' || arr[i+1] AS g
             FROM (SELECT doc_id, arr,
                          unnest(generate_series(1, len(arr) - 1)) AS i FROM t))
       GROUP BY doc_id, g),
mb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nd,
              CAST(sum(f) AS BIGINT) AS nb,
              CAST(max(f) AS BIGINT) AS mbf FROM bf GROUP BY doc_id),
j AS (SELECT mt.doc_id, mt.n_tokens, mt.max_tok,
             COALESCE(mb.nd, 0) AS nd, COALESCE(mb.nb, 0) AS nb,
             COALESCE(mb.mbf, 0) AS mbf
      FROM mt LEFT JOIN mb USING (doc_id)),
v AS (SELECT doc_id, n_tokens,
             CASE WHEN nb > 0 THEN 1.0 - CAST(nd AS DOUBLE) / nb ELSE 0.0 END AS dup_f,
             CASE WHEN nb > 0 THEN CAST(mbf AS DOUBLE) / nb ELSE 0.0 END AS top_f,
             CASE WHEN n_tokens > 0 THEN CAST(max_tok AS DOUBLE) / n_tokens
                  ELSE 0.0 END AS tok_f
      FROM j)"""


def oracle_quality_filter_sql(relation: str = "documents") -> str:
    """Exact mirror of quality_filter_batch: both sides compute the
    fractions as IEEE-double divisions of the same integer counts, so the
    raw (unrounded) values the keep flag compares are bit-identical."""
    t1, t2 = QUALITY_DUP_BIGRAM_MAX, QUALITY_MAX_TOK_MAX
    return f"""
WITH {quality_value_ctes(relation)}
SELECT doc_id, n_tokens,
       ROUND(dup_f, 6) AS dup_bigram_frac,
       ROUND(top_f, 6) AS top_bigram_frac,
       ROUND(tok_f, 6) AS max_tok_frac,
       (dup_f <= {t1} AND tok_f <= {t2}) AS keep
FROM v"""


def oracle_fingerprint_sql(relation: str = "documents") -> str:
    return f"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS arr FROM {relation}),
tf AS (SELECT doc_id, term, count(*) AS freq
       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM {relation})
       GROUP BY doc_id, term),
bits AS (SELECT tf.doc_id, g.b,
                SUM(tf.freq * (CASE WHEN (md5_number_lower(tf.term) >> g.b) & 1 = 1
                               THEN 1 ELSE -1 END)) AS sgn
         FROM tf, generate_series(0, 63) AS g(b)
         GROUP BY tf.doc_id, g.b),
sim AS (SELECT doc_id,
               CAST(SUM(CASE WHEN sgn > 0 THEN CAST(1 AS UBIGINT) << b
                        ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS simhash
        FROM bits GROUP BY doc_id),
sh AS (SELECT doc_id,
              min(md5_number_lower(arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])) AS msh
       FROM (SELECT doc_id, arr,
                    unnest(generate_series(1, greatest(len(arr) - {SHINGLE_N - 1}, 0))) AS i
             FROM t)
       GROUP BY doc_id)
SELECT t.doc_id, md5(t.text) AS fp_md5, sim.simhash AS simhash,
       COALESCE(sh.msh, CAST('18446744073709551615' AS UBIGINT)) AS min_shingle_hash
FROM t JOIN sim USING (doc_id) LEFT JOIN sh USING (doc_id)"""


# --- UnifiedHighlighter-equivalent passage highlighting ----------------------

# (query_id, terms, phrases) — common vocabulary terms so every sf yields
# multi-window passages with distinct PassageScorer scores; a phrase spec
# highlights position-aware (strict): only tokens inside an exact phrase
# occurrence match (PhraseHelper model — see search/highlight.py)
HIGHLIGHT_SPECS: list[tuple[str, list[str], list[list[str]]]] = [
    ("hl_join", ["join", "merge"], []),
    ("hl_scan", ["scan", "slow", "fast"], []),
    ("hl_phrase_key_hash", [], [["key", "hash"]]),
]
HIGHLIGHT_WINDOW = 16
HIGHLIGHT_MAX_PASSAGES = 2


def q_highlight_corpus(sf_dir: str) -> pa.Table:
    """Highlight gate: top-``HIGHLIGHT_MAX_PASSAGES`` passages per matching
    document for each query, corpus-wide via a streaming map_batches stage
    (search/highlight.py). Columns: (query_id, doc_id, ord, p_start,
    score_r, snippet)."""
    from ..search.highlight import HighlightStage

    parts = []
    for qid, terms, phrases in HIGHLIGHT_SPECS:
        t = _run(
            sf_dir,
            HighlightStage(terms, HIGHLIGHT_WINDOW, HIGHLIGHT_MAX_PASSAGES,
                           phrases=phrases),
        )
        parts.append(
            pa.table(
                {
                    "query_id": pa.array([qid] * len(t), pa.string()),
                    "doc_id": t["doc_id"],
                    "ord": t["ord"],
                    "p_start": t["p_start"],
                    "score_r": pa.array(
                        round_half_away_np(
                            t["score"].to_numpy(zero_copy_only=False), 4
                        ),
                        pa.float64(),
                    ),
                    "snippet": t["snippet"],
                }
            )
        )
    return pa.concat_tables(parts)


def oracle_highlight_sql(relation: str = "documents") -> str:
    """Exact SQL mirror of q_highlight_corpus: PassageScorer.java formula
    in DOUBLE over fixed token windows, bounded passage queue = row_number
    over (score DESC, p_start DESC), emission ordered by p_start."""
    W = HIGHLIGHT_WINDOW
    N = HIGHLIGHT_MAX_PASSAGES
    ctes = [
        f"""tokc AS (SELECT doc_id, length(text) AS content_len,
              string_split(text, ' ') AS arr FROM {relation}),
tp AS (SELECT doc_id, content_len, i - 1 AS pos, arr[i] AS term,
              length(arr[i]) AS tlen
       FROM (SELECT doc_id, content_len, arr,
                    unnest(generate_series(1, len(arr))) AS i FROM tokc)),
tc AS (SELECT *, CAST(pos // {W} AS BIGINT) AS win,
              CAST(coalesce(sum(tlen + 1) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cstart
       FROM tp),
geom AS (SELECT doc_id, win, min(cstart) AS p_start,
                max(cstart + tlen) - min(cstart) AS p_len
         FROM tc GROUP BY doc_id, win)"""
    ]
    selects = []
    for qid, terms, phrases in HIGHLIGHT_SPECS:
        # matched positions: loose term hits UNION positions participating
        # in an exact phrase occurrence (PhraseHelper-strict — matches the
        # engine's filtered offsets; UNION dedups overlapping occurrences)
        mp_parts = []
        if terms:
            inlist = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
            mp_parts.append(f"SELECT doc_id, pos FROM tc WHERE term IN ({inlist})")
        for pi, ph in enumerate(phrases):
            joins = "tc a0"
            conds = [f"a0.term = '{ph[0].replace(chr(39), chr(39) * 2)}'"]
            for j in range(1, len(ph)):
                joins += (f" JOIN tc a{j} ON a{j}.doc_id = a0.doc_id"
                          f" AND a{j}.pos = a0.pos + {j}")
                conds.append(f"a{j}.term = '{ph[j].replace(chr(39), chr(39) * 2)}'")
            occ = (f"occ_{qid}_{pi} AS (SELECT a0.doc_id, a0.pos FROM {joins}"
                   f" WHERE {' AND '.join(conds)})")
            ctes.append(occ)
            mp_parts += [
                f"SELECT doc_id, pos + {j} AS pos FROM occ_{qid}_{pi}"
                for j in range(len(ph))
            ]
        ctes.append(f"mp_{qid} AS ({' UNION '.join(mp_parts)})")
        ctes.append(f"""
pm_{qid} AS (SELECT tc.doc_id, tc.win, tc.term, tc.pos
             FROM tc JOIN mp_{qid} USING (doc_id, pos)),
m_{qid} AS (SELECT doc_id, win, term, count(*) AS freq
            FROM pm_{qid} GROUP BY doc_id, win, term),
ttf_{qid} AS (SELECT doc_id, term, count(*) AS ttf
              FROM pm_{qid} GROUP BY doc_id, term),
ps_{qid} AS (
  SELECT m.doc_id, m.win, g.p_start,
         (1.0 + 1.0 / ln(87.0 + g.p_start)) * sum(
             (m.freq / (m.freq + 1.2 * ((1.0 - 0.75) + 0.75 * (g.p_len / 87.0))))
             * (2.2 * ln(1.0 + ((1.0 + d.content_len / 87.0) + 0.5)
                               / (t.ttf + 0.5)))) AS score
  FROM m_{qid} m
  JOIN geom g USING (doc_id, win)
  JOIN ttf_{qid} t ON t.doc_id = m.doc_id AND t.term = m.term
  JOIN (SELECT DISTINCT doc_id, content_len FROM tc) d ON d.doc_id = m.doc_id
  GROUP BY m.doc_id, m.win, g.p_start, g.p_len, d.content_len),
sel_{qid} AS (SELECT doc_id, win, p_start, score,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, p_start DESC) AS rk
              FROM ps_{qid}),
snip_{qid} AS (
  SELECT tc.doc_id, tc.win,
         string_agg(CASE WHEN mp.pos IS NOT NULL
                    THEN '<b>' || tc.term || '</b>' ELSE tc.term END,
                    ' ' ORDER BY tc.pos) AS snippet
  FROM tc
  LEFT JOIN mp_{qid} mp ON mp.doc_id = tc.doc_id AND mp.pos = tc.pos
  JOIN (SELECT doc_id, win FROM sel_{qid} WHERE rk <= {N}) s
       ON s.doc_id = tc.doc_id AND s.win = tc.win
  GROUP BY tc.doc_id, tc.win)""")
        selects.append(f"""(SELECT '{qid}' AS query_id, s.doc_id,
        CAST(row_number() OVER (PARTITION BY s.doc_id ORDER BY s.p_start)
             AS BIGINT) AS ord,
        CAST(s.p_start AS BIGINT) AS p_start,
        ROUND(CAST(s.score AS DOUBLE), 4) AS score_r, sn.snippet
 FROM sel_{qid} s JOIN snip_{qid} sn ON sn.doc_id = s.doc_id AND sn.win = s.win
 WHERE s.rk <= {N})""")
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


_STEM_ES_ANALYZER = None


def stem_es_batch(batch: pa.Table) -> pa.Table:
    """Per-block partial stem counts through the SpanishAnalyzer chain
    (standard tokenizer + lowercase + Savoy Spanish light stem,
    functions/lightstem.py — analysis/common/.../es/SpanishLightStemmer
    behavior): (stem, p_n). The stemmer runs once per DISTINCT block
    token (vocab map), the groupby downstream sums partials."""
    global _STEM_ES_ANALYZER
    if _STEM_ES_ANALYZER is None:
        from ..functions.analysis import get_analyzer

        _STEM_ES_ANALYZER = get_analyzer("spanish")
    tokens, _ = _STEM_ES_ANALYZER.tokenize_batch(
        batch["text"].to_pylist()
    )
    uniq, counts = np.unique(tokens.astype("U"), return_counts=True)
    return pa.table(
        {
            "stem": pa.array(uniq, pa.string()),
            "p_n": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


def q_stem_es_tokens(sf_dir: str) -> pa.Table:
    """Language-analyzer gate: corpus token counts AFTER the Spanish
    light stemmer — (stem, n). Distributed shape: per-block vocab-mapped
    partial counts, one small groupby over distinct stems."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = (
        sized_read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
                   rows_per_block=HEAVY_ROWS_PER_BLOCK)
        .map_batches(stem_es_batch, batch_format="pyarrow")
        .groupby("stem")
        .aggregate(Sum("p_n", alias_name="n"))
    )
    t = pa.concat_tables(ray.get(ds.materialize().to_arrow_refs()))
    return pa.table(
        {"stem": t["stem"], "n": t["n"].cast(pa.int64())}
    ).sort_by("stem")


def oracle_stem_es_sql() -> str:
    """SQL mirror of the Spanish light stemmer (len<5 passthrough, accent
    fold, suffix rules in algorithm order) over the token stream."""
    fold = "translate(t, 'àáâäòóôöèéêëùúûüìíîï', 'aaaaooooeeeeuuuuiiii')"
    return f"""
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
ft AS (SELECT t, {fold} AS f, length(t) AS ln FROM tok),
st AS (SELECT CASE
         WHEN ln < 5 THEN t
         WHEN right(f, 1) IN ('o', 'a', 'e') THEN substr(f, 1, ln - 1)
         WHEN right(f, 4) = 'eses' THEN substr(f, 1, ln - 2)
         WHEN right(f, 3) = 'ces' THEN substr(f, 1, ln - 3) || 'z'
         WHEN right(f, 2) IN ('os', 'as', 'es') THEN substr(f, 1, ln - 2)
         ELSE f END AS stem
      FROM ft)
SELECT stem, count(*) AS n FROM st GROUP BY stem"""
