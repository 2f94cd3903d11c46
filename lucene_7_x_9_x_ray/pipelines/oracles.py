"""DuckDB oracle-SQL generators mirroring the Ray pipelines bit-for-bit.

The driver runs each ``queries()`` pipeline AND the matching SQL here on
the same parquet views and compares row-count + schema + value-hash, so
every expression below replicates the engine's arithmetic exactly:

- tokenization: the driver's ``documents.text`` is single-space-joined
  lowercase ASCII words, on which the UAX#29 StandardAnalyzer-equivalent
  (functions/analysis.py) degenerates to ``string_split(text, ' ')`` —
  asserted by tests/test_pipelines.py::test_sql_tokenizer_equivalence.
- SmallFloat norm quantization: byte4ToInt(intToByte4(len)) is the
  largest LENGTH_TABLE entry <= len (intToByte4 floors — SmallFloat.java:
  113-181 behavior), expressed as a join against the inlined 256-entry
  table.
- BM25 float32 discipline: DuckDB FLOAT arithmetic is IEEE binary32 like
  numpy float32, so each step of BM25Similarity.java:196-264 is written
  with explicit FLOAT casts in the same operation order as
  functions/bm25.py; boolean sums accumulate in DOUBLE and cast once
  (scorers.py float discipline). Verified bit-identical by
  tests/test_pipelines.py::test_bm25_sql_float32_identity.
- hashes: DuckDB md5_number_lower(s) == little-endian uint64 of bytes
  8..16 of md5(s) (md5_number_upper == bytes 0..8), matching
  functions used by the dedup/fingerprint pipelines.
"""

from __future__ import annotations

from ..functions.smallfloat import BYTE4_DECODE_TABLE

K1_F = "CAST(1.2 AS FLOAT)"
B_F = "CAST(0.75 AS FLOAT)"
ONE_F = "CAST(1.0 AS FLOAT)"

LENGTH_TABLE_SQL = "[" + ",".join(str(int(v)) for v in BYTE4_DECODE_TABLE) + "]"


def _ident(term: str) -> str:
    return "".join(ch if ch.isalnum() else "_" for ch in term)


def base_ctes(relation: str = "documents") -> str:
    """Shared CTEs: token stream, collection stats, doc lengths, norms."""
    return f"""
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM {relation}),
cs AS (SELECT (SELECT count(*) FROM {relation}) AS n_docs,
              (SELECT count(*) FROM tok) AS sttf,
              CAST(CAST((SELECT count(*) FROM tok) AS DOUBLE)
                   / (SELECT count(*) FROM {relation}) AS FLOAT) AS avgdl),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
lt AS (SELECT unnest({LENGTH_TABLE_SQL}) AS v),
normlen AS (SELECT dl.doc_id, max(lt.v) AS nlen
            FROM dl JOIN lt ON lt.v <= dl.dl GROUP BY dl.doc_id)"""


def term_leaf_ctes(term: str) -> str:
    """Per-term CTEs: idf weight and float32 leaf score per matching doc.

    Mirrors BM25TermWeight.score (functions/bm25.py): norm_inverse =
    1f/(k1*((1-b) + (b*len)/avgdl)); score = w - w/(1f + freq_f*ni).
    """
    t = _ident(term)
    lit = term.replace("'", "''")
    return f"""
w_{t} AS (SELECT CAST(ln(1 + ((SELECT n_docs FROM cs) - df + 0.5) / (df + 0.5)) AS FLOAT) AS w
          FROM (SELECT count(DISTINCT doc_id) AS df FROM tok WHERE term = '{lit}')),
s_{t} AS (SELECT tf.doc_id,
                 (SELECT w FROM w_{t})
                 - (SELECT w FROM w_{t})
                   / ({ONE_F} + CAST(tf.freq AS FLOAT)
                      * ({ONE_F} / ({K1_F} * (({ONE_F} - {B_F})
                         + ({B_F} * CAST(nl.nlen AS FLOAT)) / (SELECT avgdl FROM cs))))) AS s
          FROM (SELECT doc_id, count(*) AS freq FROM tok WHERE term = '{lit}' GROUP BY doc_id) tf
          JOIN normlen nl USING (doc_id))"""


def disjunction_scored_cte(qid: str, terms: list[str]) -> str:
    """SHOULD-sum: per-doc DOUBLE sum of float32 leaves, cast once to FLOAT."""
    union = "\n      UNION ALL ".join(f"SELECT doc_id, s FROM s_{_ident(t)}" for t in terms)
    return f"""
scored_{qid} AS (SELECT doc_id, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
                 FROM ({union}) GROUP BY doc_id)"""


def bm25_topk_sql(
    query_specs: list[tuple[str, list[str], int, int]], relation: str = "documents"
) -> str:
    """Top-k oracle: (query_id, rank, doc_id, score_r) per query spec.

    query_specs: (query_id, terms, k, offset). Ordering (score DESC,
    doc_id ASC) matches TopScoreDocCollector tie-break (topk.py).
    """
    terms = sorted({t for _, ts, _, _ in query_specs for t in ts})
    ctes = [base_ctes(relation)]
    ctes += [term_leaf_ctes(t) for t in terms]
    ctes += [disjunction_scored_cte(qid, ts) for qid, ts, _, _ in query_specs]
    selects = []
    for qid, _, k, offset in query_specs:
        selects.append(
            f"""(SELECT '{qid}' AS query_id,
        CAST(row_number() OVER (ORDER BY score DESC, doc_id) - {offset} AS BIGINT) AS rank,
        doc_id, ROUND(CAST(score AS DOUBLE), 4) AS score_r
 FROM scored_{qid} ORDER BY score DESC, doc_id LIMIT {k} OFFSET {offset})"""
        )
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def bm25_docsonly_topk_sql(
    query_specs: list[tuple[str, list[str], int, int]], relation: str = "documents"
) -> str:
    """BM25 top-k over an IndexOptions.DOCS index (index_freqs=False):
    every freq is 1 and the field's sumTotalTermFreq equals the count of
    distinct (doc, term) pairs, so avgdl = mean distinct-terms-per-doc.
    Norms still encode the TRUE analyzer token count (norms are computed
    at index time independently of IndexOptions).

    NOTE: the dl/lt/normlen scaffolding and the w_/s_ CTE shapes mirror
    base_ctes/term_leaf_ctes with two deltas (df/avgdl from dtok, freq
    pinned to 1) — any change to the shared norm table, float op order,
    or tie-break there must be mirrored here."""
    terms = sorted({t for _, ts, _, _ in query_specs for t in ts})
    ctes = [f"""
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM {relation}),
dtok AS (SELECT DISTINCT doc_id, term FROM tok),
cs AS (SELECT (SELECT count(*) FROM {relation}) AS n_docs,
              CAST(CAST((SELECT count(*) FROM dtok) AS DOUBLE)
                   / (SELECT count(*) FROM {relation}) AS FLOAT) AS avgdl),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
lt AS (SELECT unnest({LENGTH_TABLE_SQL}) AS v),
normlen AS (SELECT dl.doc_id, max(lt.v) AS nlen
            FROM dl JOIN lt ON lt.v <= dl.dl GROUP BY dl.doc_id)"""]
    for t in terms:
        ti = _ident(t)
        lit = t.replace("'", "''")
        ctes.append(f"""
w_{ti} AS (SELECT CAST(ln(1 + ((SELECT n_docs FROM cs) - df + 0.5) / (df + 0.5)) AS FLOAT) AS w
          FROM (SELECT count(*) AS df FROM dtok WHERE term = '{lit}')),
s_{ti} AS (SELECT d.doc_id,
                 (SELECT w FROM w_{ti})
                 - (SELECT w FROM w_{ti})
                   / ({ONE_F} + {ONE_F}
                      * ({ONE_F} / ({K1_F} * (({ONE_F} - {B_F})
                         + ({B_F} * CAST(nl.nlen AS FLOAT)) / (SELECT avgdl FROM cs))))) AS s
          FROM dtok d JOIN normlen nl USING (doc_id) WHERE d.term = '{lit}')""")
    ctes += [disjunction_scored_cte(qid, ts) for qid, ts, _, _ in query_specs]
    selects = []
    for qid, _, k, offset in query_specs:
        selects.append(
            f"""(SELECT '{qid}' AS query_id,
        CAST(row_number() OVER (ORDER BY score DESC, doc_id) - {offset} AS BIGINT) AS rank,
        doc_id, ROUND(CAST(score AS DOUBLE), 4) AS score_r
 FROM scored_{qid} ORDER BY score DESC, doc_id LIMIT {k} OFFSET {offset})"""
        )
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def phrase_topk_sql(
    phrase_specs: list[tuple[str, list[str], int]], relation: str = "documents"
) -> str:
    """Exact-phrase top-k oracle: (query_id, rank, doc_id, score_r).

    Phrase freq = adjacent-position matches counted over the token array;
    the score is BM25 with weight = float32(Σ double(per-term f32 idf))
    (PhraseWeight / idfExplain(TermStatistics[]) semantics, scorers.py
    _eval_phrase)."""
    terms = sorted({t for _, ts, _ in phrase_specs for t in ts})
    ctes = [base_ctes(relation)]
    ctes += [term_leaf_ctes(t) for t in terms]
    for qid, ts, _k in phrase_specs:
        conds = " AND ".join(
            f"arr[i+{j}] = '{t.replace(chr(39), chr(39) * 2)}'" for j, t in enumerate(ts)
        )
        idf_sum = " + ".join(f"CAST((SELECT w FROM w_{_ident(t)}) AS DOUBLE)" for t in ts)
        ctes.append(f"""
pf_{qid} AS (SELECT doc_id, count(*) AS freq
             FROM (SELECT doc_id, arr,
                          unnest(generate_series(1, greatest(len(arr) - {len(ts) - 1}, 0))) AS i
                   FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM {relation}))
             WHERE {conds} GROUP BY doc_id),
ps_{qid} AS (SELECT pf.doc_id,
                    CAST({idf_sum} AS FLOAT)
                    - CAST({idf_sum} AS FLOAT)
                      / ({ONE_F} + CAST(pf.freq AS FLOAT)
                         * ({ONE_F} / ({K1_F} * (({ONE_F} - {B_F})
                            + ({B_F} * CAST(nl.nlen AS FLOAT)) / (SELECT avgdl FROM cs))))) AS score
             FROM pf_{qid} pf JOIN normlen nl USING (doc_id))""")
    selects = [
        f"""(SELECT '{qid}' AS query_id,
        CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
        doc_id, ROUND(CAST(score AS DOUBLE), 4) AS score_r
 FROM ps_{qid} ORDER BY score DESC, doc_id LIMIT {k})"""
        for qid, _ts, k in phrase_specs
    ]
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def multiphrase_topk_sql(
    specs: list[tuple[str, list[list[str]], int]], relation: str = "documents"
) -> str:
    """Exact MultiPhraseQuery top-k oracle: (query_id, rank, doc_id,
    score_r).

    The exact-phrase CTE generalizes per slot: an alignment position i
    matches when arr[i+j] is IN slot j's term set (union postings =
    membership test on the one-token-per-position corpus); freq = the
    number of such i (ExactPhraseMatcher over UnionPostingsEnum,
    scorers.py _eval_multi_phrase). The score weight is the float32 cast
    of the DOUBLE sum of per-term f32 idfs over ALL terms flattened in
    termArrays order (MultiPhraseWeight ctor)."""
    terms = sorted({t for _, slots, _ in specs for s in slots for t in s})
    ctes = [base_ctes(relation)]
    ctes += [term_leaf_ctes(t) for t in terms]
    for qid, slots, _k in specs:
        conds = " AND ".join(
            "arr[i+{}] IN ({})".format(
                j, ",".join("'" + t.replace("'", "''") + "'" for t in slot)
            )
            for j, slot in enumerate(slots)
        )
        flat = [t for slot in slots for t in slot]
        idf_sum = " + ".join(f"CAST((SELECT w FROM w_{_ident(t)}) AS DOUBLE)" for t in flat)
        ctes.append(f"""
mpf_{qid} AS (SELECT doc_id, count(*) AS freq
             FROM (SELECT doc_id, arr,
                          unnest(generate_series(1, greatest(len(arr) - {len(slots) - 1}, 0))) AS i
                   FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM {relation}))
             WHERE {conds} GROUP BY doc_id),
mps_{qid} AS (SELECT pf.doc_id,
                    CAST({idf_sum} AS FLOAT)
                    - CAST({idf_sum} AS FLOAT)
                      / ({ONE_F} + CAST(pf.freq AS FLOAT)
                         * ({ONE_F} / ({K1_F} * (({ONE_F} - {B_F})
                            + ({B_F} * CAST(nl.nlen AS FLOAT)) / (SELECT avgdl FROM cs))))) AS score
             FROM mpf_{qid} pf JOIN normlen nl USING (doc_id))""")
    selects = [
        f"""(SELECT '{qid}' AS query_id,
        CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
        doc_id, ROUND(CAST(score AS DOUBLE), 4) AS score_r
 FROM mps_{qid} ORDER BY score DESC, doc_id LIMIT {k})"""
        for qid, _slots, k in specs
    ]
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def sloppy_phrase2_topk_sql(
    specs: list[tuple[str, list[str], int, int]], relation: str = "documents"
) -> str:
    """Two-term no-repeats sloppy-phrase oracle: (query_id, rank, doc_id,
    score_r).

    For TWO phrase positions the SloppyPhraseMatcher heap traversal
    (SloppyPhraseMatcher.java:165-201) collapses to a zigzag anchor chain
    over the offset-adjusted position lists A (term0) and B (term1 - 1):

      q0 = max(min A, min B), tagged by the larger list (tie -> B: the
           heap pops (pos, ord) so equal positions pop ord 0 first);
      at each anchor q: gap = q - max{other-list p <= q} (always exists),
           emit sloppyWeight = float32(1f / (1 + gap)) iff gap <= slop,
           accumulated float32 each step (PhraseScorer discipline);
      next anchor = min{other-list p > q}, roles swap; chain ends when
           none remains (the final anchor still emits).

    The closed form is duel-tested against the heap transcription over
    exhaustive small position sets (test_sloppy_two_term_chain_closed_form).
    The SQL walks the chain with one recursive CTE per spec; scoring is
    the shared phrase BM25 (weight = float32 of the double idf sum)."""
    terms = sorted({t for _, ts, _, _ in specs for t in ts})
    ctes = [f"t0 AS (SELECT doc_id, string_split(text, ' ') AS arr FROM {relation})"]
    ctes.append(base_ctes(relation))
    ctes += [term_leaf_ctes(t) for t in terms]
    for t in terms:
        lit = t.replace("'", "''")
        ctes.append(f"""
pos_{_ident(t)} AS (SELECT doc_id, i - 1 AS p
      FROM (SELECT doc_id, arr, unnest(generate_series(1, len(arr))) AS i FROM t0)
      WHERE arr[i] = '{lit}')""")
    selects = []
    for qid, (ta, tb), slop, k in specs:
        ia, ib = _ident(ta), _ident(tb)
        idf_sum = (
            f"CAST((SELECT w FROM w_{ia}) AS DOUBLE)"
            f" + CAST((SELECT w FROM w_{ib}) AS DOUBLE)"
        )
        ctes.append(f"""
tp_{qid} AS (SELECT doc_id, 0 AS side, p FROM pos_{ia}
             UNION ALL SELECT doc_id, 1 AS side, p - 1 AS p FROM pos_{ib}),
ini_{qid} AS (SELECT a.doc_id, greatest(a.p, b.p) AS q,
                     CASE WHEN a.p > b.p THEN 0 ELSE 1 END AS tag
  FROM (SELECT doc_id, min(p) AS p FROM tp_{qid} WHERE side = 0 GROUP BY doc_id) a
  JOIN (SELECT doc_id, min(p) AS p FROM tp_{qid} WHERE side = 1 GROUP BY doc_id) b
  USING (doc_id)),
ch_{qid}(doc_id, q, tag, freq) AS (
  SELECT doc_id, q, tag, CAST(0 AS FLOAT) FROM ini_{qid}
  UNION ALL
  SELECT c.doc_id,
         (SELECT min(o.p) FROM tp_{qid} o
          WHERE o.doc_id = c.doc_id AND o.side = 1 - c.tag AND o.p > c.q),
         1 - c.tag,
         CASE WHEN c.q - (SELECT max(o.p) FROM tp_{qid} o
                          WHERE o.doc_id = c.doc_id AND o.side = 1 - c.tag
                            AND o.p <= c.q) <= {slop}
              THEN CAST(c.freq + (CAST(1.0 AS FLOAT)
                   / CAST(1 + c.q - (SELECT max(o.p) FROM tp_{qid} o
                                     WHERE o.doc_id = c.doc_id
                                       AND o.side = 1 - c.tag
                                       AND o.p <= c.q) AS FLOAT)) AS FLOAT)
              ELSE c.freq END
  FROM ch_{qid} c WHERE c.q IS NOT NULL),
pf_{qid} AS (SELECT doc_id, freq FROM ch_{qid} WHERE q IS NULL AND freq > 0),
ps_{qid} AS (SELECT pf.doc_id,
                    CAST({idf_sum} AS FLOAT)
                    - CAST({idf_sum} AS FLOAT)
                      / ({ONE_F} + pf.freq
                         * ({ONE_F} / ({K1_F} * (({ONE_F} - {B_F})
                            + ({B_F} * CAST(nl.nlen AS FLOAT)) / (SELECT avgdl FROM cs))))) AS score
             FROM pf_{qid} pf JOIN normlen nl USING (doc_id))""")
        selects.append(f"""(SELECT '{qid}' AS query_id,
        CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
        doc_id, ROUND(CAST(score AS DOUBLE), 4) AS score_r
 FROM ps_{qid} ORDER BY score DESC, doc_id LIMIT {k})""")
    return "WITH RECURSIVE " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def sloppy_phrase_rpt_topk_sql(
    specs: list[tuple[str, list[str], int, int]], relation: str = "documents"
) -> str:
    """Sloppy-phrase oracle for the REPEATED-term [A, B, A] shape
    (rptGroups matcher path): (query_id, rank, doc_id, score_r).

    scorers._sloppy_freq_repeats transcribes SloppyPhraseMatcher's
    repeat-group machinery (SloppyPhraseMatcher.java:279-358 group
    detection + advanceRpts:278-318). For terms [A, B, A] it flattens to
    a three-cursor state machine over the offset-adjusted lists
    a0(i)=posA[i], a1(j)=posB[j]-1, a2(k)=posA[k]-2:

    - init: i0=0, j=0, k=1 (the stagger — the 2nd group member starts one
      real position in; docs with fewer than two A occurrences never
      match), pop = argmin by (position, offset);
    - invariant i0 < k, so the only possible collision (two group members
      on one real token) is cursor 0 advancing onto k; the LESSER member
      is always the staggered one (a2 = posA[k]-2 < posA[k] = a0), so the
      collision rule degenerates to "bump k once";
    - end == max of the three current adjusted positions at every step
      (every advance routes through advance_pp, which raises end), so end
      need not be carried;
    - each step advances the in-hand cursor, resolves the collision, then
      branches on the CARRIED next_pos (stale by design — the heap
      recomputes it only at pops, even if a collision moved a queued
      cursor): past next_pos -> emit sloppyWeight if match_length <= slop
      and re-pop (argmin + fresh match_length/next_pos); otherwise
      match_length = min(match_length, end - pos) and keep the hand;
    - exhaustion emits the final match_length <= slop window once.

    Equivalence to the heap transcription is duel-tested exhaustively in
    tests/test_search.py::test_sloppy_repeat_flat_state_machine (158k+
    position-set x slop combinations). The SQL walks one recursive CTE
    per spec, one row per (doc, step); freq accumulates FLOAT like
    PhraseScorer. Scoring = shared phrase BM25, idf summed over the
    phrase terms WITH the repeat (PhraseWeight order)."""
    for _qid, ts, _slop, _k in specs:
        if len(ts) != 3 or ts[0] != ts[2] or ts[0] == ts[1]:
            raise ValueError(f"sloppy_phrase_rpt oracle covers [A, B, A] shapes only: {ts}")
    terms = sorted({t for _, ts, _, _ in specs for t in ts})
    ctes = [f"t0 AS (SELECT doc_id, string_split(text, ' ') AS arr FROM {relation})"]
    ctes.append(base_ctes(relation))
    ctes += [term_leaf_ctes(t) for t in terms]
    for t in terms:
        lit = t.replace("'", "''")
        ctes.append(f"""
pos_{_ident(t)} AS (SELECT doc_id, i - 1 AS p
      FROM (SELECT doc_id, arr, unnest(generate_series(1, len(arr))) AS i FROM t0)
      WHERE arr[i] = '{lit}')""")
    selects = []
    nhand = "CASE WHEN a0 <= least(a1, a2) THEN 0 WHEN a1 <= a2 THEN 1 ELSE 2 END"
    nnext = ("CASE WHEN a0 <= least(a1, a2) THEN least(a1, a2) "
             "WHEN a1 <= a2 THEN least(a0, a2) ELSE least(a0, a1) END")
    for qid, (ta, tb, _ta2), slop, k in specs:
        ia, ib = _ident(ta), _ident(tb)
        idf_sum = (
            f"CAST((SELECT w FROM w_{ia}) AS DOUBLE)"
            f" + CAST((SELECT w FROM w_{ib}) AS DOUBLE)"
            f" + CAST((SELECT w FROM w_{ia}) AS DOUBLE)"
        )
        ctes.append(f"""
lst_{qid} AS (SELECT a.doc_id, a.la, b.lb
  FROM (SELECT doc_id, list(p ORDER BY p) AS la FROM pos_{ia}
        GROUP BY doc_id HAVING count(*) >= 2) a
  JOIN (SELECT doc_id, list(p ORDER BY p) AS lb FROM pos_{ib} GROUP BY doc_id) b
  USING (doc_id)),
rec_{qid}(doc_id, la, lb, i0, i1, i2, hand, ml, np, freq, done) AS (
  SELECT doc_id, la, lb, 0, 0, 1,
         {nhand},
         greatest(a0, a1, a2) - least(a0, a1, a2),
         {nnext},
         CAST(0 AS FLOAT), FALSE
  FROM (SELECT doc_id, la, lb, la[1] AS a0, lb[1] - 1 AS a1, la[2] - 2 AS a2
        FROM lst_{qid})
  UNION ALL
  SELECT doc_id, la, lb, n_i0, n_i1, n_i2,
         CASE WHEN fin THEN hand WHEN p > np THEN {nhand} ELSE hand END,
         CASE WHEN fin THEN ml
              WHEN p > np THEN endp - least(a0, a1, a2)
              ELSE least(ml, endp - p) END,
         CASE WHEN fin THEN np WHEN p > np THEN {nnext} ELSE np END,
         CASE WHEN (fin OR p > np) AND ml <= {slop}
              THEN CAST(freq + CAST(1.0 AS FLOAT) / CAST(1 + ml AS FLOAT) AS FLOAT)
              ELSE freq END,
         fin
  FROM (SELECT *,
               (n_i0 >= len(la) OR n_i2 >= len(la) OR n_i1 >= len(lb)) AS fin,
               la[n_i0 + 1] AS a0, lb[n_i1 + 1] - 1 AS a1, la[n_i2 + 1] - 2 AS a2,
               greatest(la[n_i0 + 1], lb[n_i1 + 1] - 1, la[n_i2 + 1] - 2) AS endp,
               CASE hand WHEN 0 THEN la[n_i0 + 1]
                         WHEN 1 THEN lb[n_i1 + 1] - 1
                         ELSE la[n_i2 + 1] - 2 END AS p
        FROM (SELECT *,
                     i0 + CASE WHEN hand = 0 THEN 1 ELSE 0 END AS n_i0,
                     i1 + CASE WHEN hand = 1 THEN 1 ELSE 0 END AS n_i1,
                     i2 + CASE WHEN hand = 2 THEN 1
                               WHEN hand = 0 AND i0 + 1 = i2 THEN 1
                               ELSE 0 END AS n_i2
              FROM rec_{qid} WHERE NOT done) s1) s2),
pf_{qid} AS (SELECT doc_id, freq FROM rec_{qid} WHERE done AND freq > 0),
ps_{qid} AS (SELECT pf.doc_id,
                    CAST({idf_sum} AS FLOAT)
                    - CAST({idf_sum} AS FLOAT)
                      / ({ONE_F} + pf.freq
                         * ({ONE_F} / ({K1_F} * (({ONE_F} - {B_F})
                            + ({B_F} * CAST(nl.nlen AS FLOAT)) / (SELECT avgdl FROM cs))))) AS score
             FROM pf_{qid} pf JOIN normlen nl USING (doc_id))""")
        selects.append(f"""(SELECT '{qid}' AS query_id,
        CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
        doc_id, ROUND(CAST(score AS DOUBLE), 4) AS score_r
 FROM ps_{qid} ORDER BY score DESC, doc_id LIMIT {k})""")
    return "WITH RECURSIVE " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def span_topk_sql(
    specs: list[tuple[str, str, tuple, object, int]], relation: str = "documents"
) -> str:
    """Span-query top-k oracle: (query_id, rank, doc_id, score_r).

    specs: (query_id, kind, clauses, param, k); each clause is a tuple of
    terms (len > 1 = SpanOrQuery — its spans are the merged position
    list, still width 1). kind: "ord" / "unord" (param = slop), "first"
    (param = end), "not" (param = (pre, post)), "or" (standalone).

    Matches are enumerated declaratively (the stateful span iterators are
    history-free over width-1 sub-spans — see search/spans.py docstring;
    the equivalence is duel-tested in tests/test_spans.py):

    - ordered: for each start of clause 0, chain "first position >= prev
      end" scalar mins; width = sum of gaps; NULL chain = clause
      exhausted (Lucene ends the doc there, but exhaustion is monotone in
      the start so dropping NULL rows is identical).
    - unordered (2 clauses): the queue visits (a, b) iff no other a'
      in [b, a) and no other b' in [a, b); match iff
      max-min-1 <= slop, width = max-min+1, emitted in least(a, b) order.
    - first: positions with p+1 <= end, width 0.
    - not: include positions with no exclude position in [p-pre, p+post].
    - or: every clause position, width 0.

    freq replicates SpanScorer.setFreqCurrentDoc: FLOAT freq += DOUBLE
    1/(1+width) in emission order (fold starts at 0.0 and casts to FLOAT
    each step). The SimScorer weight is float32(sum of per-term f32 idfs
    over sorted distinct scoring terms; include-side only for "not")."""
    all_terms = sorted({t for _, _, cls, _, _ in specs for ts in cls for t in ts})
    ctes = [f"t0 AS (SELECT doc_id, string_split(text, ' ') AS arr FROM {relation})"]
    ctes.append(base_ctes(relation))
    ctes += [term_leaf_ctes(t) for t in all_terms]
    for t in all_terms:
        lit = t.replace("'", "''")
        ctes.append(f"""
pos_{_ident(t)} AS (SELECT doc_id, i - 1 AS p
      FROM (SELECT doc_id, arr, unnest(generate_series(1, len(arr))) AS i FROM t0)
      WHERE arr[i] = '{lit}')""")
    selects = []
    for qid, kind, clauses, param, k in specs:
        # per-clause position relation: the term's pos CTE, or a UNION
        # merge for an or-clause (registered as its own CTE)
        ids = []
        for i, ts in enumerate(clauses):
            if len(ts) == 1:
                ids.append(f"pos_{_ident(ts[0])}")
            else:
                union = "\n      UNION ".join(
                    f"SELECT doc_id, p FROM pos_{_ident(t)}" for t in ts
                )
                ctes.append(f"pc{i}_{qid} AS ({union})")
                ids.append(f"pc{i}_{qid}")
        if kind == "ord":
            slop = int(param)
            prev = f"co0_{qid} AS (SELECT doc_id, p AS s0 FROM {ids[0]})"
            ctes.append(prev)
            for i in range(1, len(ids)):
                cols = ", ".join(f"c.s{j}" for j in range(i))
                ctes.append(f"""
co{i}_{qid} AS (SELECT c.doc_id, {cols},
       (SELECT min(x.p) FROM {ids[i]} x
        WHERE x.doc_id = c.doc_id AND x.p >= c.s{i - 1} + 1) AS s{i}
  FROM co{i - 1}_{qid} c)""")
            width = " + ".join(
                f"(s{i} - s{i - 1} - 1)" for i in range(1, len(ids))
            )
            ctes.append(f"""
wv_{qid} AS (SELECT doc_id, s0, {width} AS width
  FROM co{len(ids) - 1}_{qid}
  WHERE s{len(ids) - 1} IS NOT NULL AND {width} <= {slop})""")
        elif kind == "ord_nest":
            # near(near(c0, c1, islop), c2, oslop): the inner chain's
            # matches (start s0, end s1+1, inner width filtered by islop)
            # are the outer's sub-spans; the OUTER width counts only the
            # outer gap (NearSpansOrdered.matchWidth sums gaps between
            # consecutive clause spans — inner widths gate only the inner
            # slop). Emission order = inner-match s0 order.
            islop, oslop = param
            ctes.append(f"""
ni_{qid} AS (SELECT c.doc_id, c.s0, c.s1 + 1 AS e, c.s1 - (c.s0 + 1) AS wi
  FROM (SELECT x.doc_id, x.p AS s0,
               (SELECT min(y.p) FROM {ids[1]} y
                WHERE y.doc_id = x.doc_id AND y.p >= x.p + 1) AS s1
        FROM {ids[0]} x) c
  WHERE c.s1 IS NOT NULL AND c.s1 - (c.s0 + 1) <= {islop}),
wv_{qid} AS (SELECT n.doc_id, n.s0, n.s2 - n.e AS width
  FROM (SELECT i.doc_id, i.s0, i.e,
               (SELECT min(z.p) FROM {ids[2]} z
                WHERE z.doc_id = i.doc_id AND z.p >= i.e) AS s2
        FROM ni_{qid} i) n
  WHERE n.s2 IS NOT NULL AND n.s2 - n.e <= {oslop})""")
        elif kind == "unord":
            slop = int(param)
            a, b = ids
            ctes.append(f"""
wv_{qid} AS (SELECT a.doc_id, least(a.p, b.p) AS s0,
                    greatest(a.p, b.p) - least(a.p, b.p) + 1 AS width
  FROM {a} a JOIN {b} b USING (doc_id)
  WHERE NOT EXISTS (SELECT 1 FROM {a} a2
                    WHERE a2.doc_id = a.doc_id AND a2.p < a.p AND a2.p >= b.p)
    AND NOT EXISTS (SELECT 1 FROM {b} b2
                    WHERE b2.doc_id = a.doc_id AND b2.p < b.p AND b2.p >= a.p)
    AND greatest(a.p, b.p) - least(a.p, b.p) - 1 <= {slop})""")
        elif kind == "first":
            end = int(param)
            ctes.append(f"""
wv_{qid} AS (SELECT doc_id, p AS s0, 0 AS width
  FROM {ids[0]} WHERE p + 1 <= {end})""")
        elif kind == "not":
            pre, post = param
            ctes.append(f"""
wv_{qid} AS (SELECT i.doc_id, i.p AS s0, 0 AS width
  FROM {ids[0]} i
  WHERE NOT EXISTS (SELECT 1 FROM {ids[1]} e
                    WHERE e.doc_id = i.doc_id
                      AND e.p >= i.p - {pre} AND e.p <= i.p + {post}))""")
        elif kind == "or":
            if len(ids) != 1:
                raise ValueError("'or' span specs take exactly one clause tuple")
            ctes.append(f"""
wv_{qid} AS (SELECT doc_id, p AS s0, 0 AS width FROM {ids[0]})""")
        elif kind == "range":
            start, end = param
            ctes.append(f"""
wv_{qid} AS (SELECT doc_id, p AS s0, 0 AS width
  FROM {ids[0]} WHERE p >= {start} AND p + 1 <= {end})""")
        elif kind in ("containing", "within"):
            # big = ordered 2-clause near (slop = param) of clauses 0-1,
            # little = clause 2's positions. ContainSpans' forward-only
            # cursor over width-0 littles / monotone-end bigs equals the
            # declarative EXISTS (see search/spans.py); containing emits
            # big spans [s0, s1+1) holding a little p (s0 <= p <= s1),
            # within emits little positions p enclosed by some big.
            slop = int(param)
            ctes.append(f"""
bg_{qid} AS (SELECT c.doc_id, c.s0, c.s1, c.s1 - c.s0 - 1 AS width
  FROM (SELECT x.doc_id, x.p AS s0,
               (SELECT min(y.p) FROM {ids[1]} y
                WHERE y.doc_id = x.doc_id AND y.p >= x.p + 1) AS s1
        FROM {ids[0]} x) c
  WHERE c.s1 IS NOT NULL AND c.s1 - c.s0 - 1 <= {slop})""")
            if kind == "containing":
                ctes.append(f"""
wv_{qid} AS (SELECT b.doc_id, b.s0, b.width
  FROM bg_{qid} b
  WHERE EXISTS (SELECT 1 FROM {ids[2]} l
                WHERE l.doc_id = b.doc_id
                  AND l.p >= b.s0 AND l.p <= b.s1))""")
            else:
                ctes.append(f"""
wv_{qid} AS (SELECT l.doc_id, l.p AS s0, 0 AS width
  FROM {ids[2]} l
  WHERE EXISTS (SELECT 1 FROM bg_{qid} b
                WHERE b.doc_id = l.doc_id
                  AND b.s0 <= l.p AND b.s1 >= l.p))""")
        else:
            raise ValueError(f"unknown span kind {kind!r}")
        scoring = sorted(
            {t for ts in (clauses[:1] if kind == "not" else clauses) for t in ts}
        )
        idf_sum = " + ".join(
            f"CAST((SELECT w FROM w_{_ident(t)}) AS DOUBLE)" for t in scoring
        )
        ctes.append(f"""
fq_{qid} AS (SELECT doc_id,
    list_reduce(
      list_prepend(CAST(0 AS DOUBLE),
                   list(1.0 / (1.0 + CAST(width AS DOUBLE)) ORDER BY s0)),
      (acc, x) -> CAST(acc + x AS FLOAT)) AS freq
  FROM wv_{qid} GROUP BY doc_id),
sc_{qid} AS (SELECT f.doc_id,
    CAST({idf_sum} AS FLOAT)
    - CAST({idf_sum} AS FLOAT)
      / ({ONE_F} + CAST(f.freq AS FLOAT)
         * ({ONE_F} / ({K1_F} * (({ONE_F} - {B_F})
            + ({B_F} * CAST(nl.nlen AS FLOAT)) / (SELECT avgdl FROM cs))))) AS score
  FROM fq_{qid} f JOIN normlen nl USING (doc_id))""")
        selects.append(f"""(SELECT '{qid}' AS query_id,
        CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
        doc_id, ROUND(CAST(score AS DOUBLE), 4) AS score_r
 FROM sc_{qid} ORDER BY score DESC, doc_id LIMIT {k})""")
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def scoring_variants_sql(ta: str, tb: str, k: int, relation: str = "documents") -> str:
    """Oracle for the non-disjunction scoring operators over terms (ta, tb):

    - syn: SynonymQuery — one pseudo-term with freq = freq_a + freq_b,
      df = max(df_a, df_b) (SynonymQuery TermStatistics aggregation).
    - dismax: DisjunctionMaxQuery tie=0.3 — float64 max + tie*(sum-max),
      cast to float32 (DisjunctionMaxQuery.java:30; scorers.py).
    - boost: SHOULD [ta^2.0, tb] — boost folded into the term weight
      (weight = boost * idf, BM25Similarity weight creation).
    - must_opt: MUST ta SHOULD tb — candidates = ta docs, score = sum.
    """
    a, b = _ident(ta), _ident(tb)
    la, lb = ta.replace("'", "''"), tb.replace("'", "''")
    ctes = [base_ctes(relation), term_leaf_ctes(ta), term_leaf_ctes(tb)]
    ctes.append(f"""
w2_{a} AS (SELECT CAST(2.0 AS FLOAT) * (SELECT w FROM w_{a}) AS w),
s2_{a} AS (SELECT tf.doc_id,
                  (SELECT w FROM w2_{a})
                  - (SELECT w FROM w2_{a})
                    / ({ONE_F} + CAST(tf.freq AS FLOAT)
                       * ({ONE_F} / ({K1_F} * (({ONE_F} - {B_F})
                          + ({B_F} * CAST(nl.nlen AS FLOAT)) / (SELECT avgdl FROM cs))))) AS s
           FROM (SELECT doc_id, count(*) AS freq FROM tok WHERE term = '{la}' GROUP BY doc_id) tf
           JOIN normlen nl USING (doc_id)),
w_syn AS (SELECT CAST(ln(1 + ((SELECT n_docs FROM cs) - df + 0.5) / (df + 0.5)) AS FLOAT) AS w
          FROM (SELECT greatest(
                 (SELECT count(DISTINCT doc_id) FROM tok WHERE term = '{la}'),
                 (SELECT count(DISTINCT doc_id) FROM tok WHERE term = '{lb}')) AS df)),
syn AS (SELECT tf.doc_id,
               (SELECT w FROM w_syn)
               - (SELECT w FROM w_syn)
                 / ({ONE_F} + CAST(tf.freq AS FLOAT)
                    * ({ONE_F} / ({K1_F} * (({ONE_F} - {B_F})
                       + ({B_F} * CAST(nl.nlen AS FLOAT)) / (SELECT avgdl FROM cs))))) AS score
        FROM (SELECT doc_id, count(*) AS freq FROM tok
              WHERE term IN ('{la}', '{lb}') GROUP BY doc_id) tf
        JOIN normlen nl USING (doc_id)),
pair AS (SELECT COALESCE(x.doc_id, y.doc_id) AS doc_id, x.s AS sa, y.s AS sb
         FROM s_{a} x FULL OUTER JOIN s_{b} y ON x.doc_id = y.doc_id),
dismax AS (SELECT doc_id,
                  CAST(CAST(greatest(COALESCE(sa, CAST('-inf' AS FLOAT)),
                                     COALESCE(sb, CAST('-inf' AS FLOAT))) AS DOUBLE)
                       + 0.3 * ((COALESCE(CAST(sa AS DOUBLE), 0) + COALESCE(CAST(sb AS DOUBLE), 0))
                                - CAST(greatest(COALESCE(sa, CAST('-inf' AS FLOAT)),
                                                COALESCE(sb, CAST('-inf' AS FLOAT))) AS DOUBLE))
                       AS FLOAT) AS score
           FROM pair),
boostq AS (SELECT COALESCE(x.doc_id, y.doc_id) AS doc_id,
                  CAST(COALESCE(CAST(x.s AS DOUBLE), 0)
                       + COALESCE(CAST(y.s AS DOUBLE), 0) AS FLOAT) AS score
           FROM s2_{a} x FULL OUTER JOIN s_{b} y ON x.doc_id = y.doc_id),
mustopt AS (SELECT x.doc_id,
                   CAST(CAST(x.s AS DOUBLE) + COALESCE(CAST(y.s AS DOUBLE), 0) AS FLOAT) AS score
            FROM s_{a} x LEFT JOIN s_{b} y ON x.doc_id = y.doc_id)""")
    selects = []
    for qid, rel in (
        (f"syn_{a}_{b}", "syn"),
        (f"dismax_{a}_{b}", "dismax"),
        (f"boost_{a}2_{b}", "boostq"),
        (f"must_{a}_opt_{b}", "mustopt"),
    ):
        selects.append(
            f"""(SELECT '{qid}' AS query_id,
        CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
        doc_id, ROUND(CAST(score AS DOUBLE), 4) AS score_r
 FROM {rel} ORDER BY score DESC, doc_id LIMIT {k})"""
        )
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def similarity_topk_sql(ta: str, tb: str, k: int, relation: str = "documents") -> str:
    """Oracle for the similarity registry gate: one 2-term SHOULD
    disjunction scored under

    - 'classic': ClassicSimilarity/TFIDF (s84 TFIDFSimilarity.java:538-560,
      ClassicSimilarity.java:44-72) — idf = (float)(ln((N+1)/(df+1)) + 1),
      leaf = (sqrtf(freq) * idf) * (float)(1/sqrt(nlen)); the boolean sum
      accumulates DOUBLE then casts float32 (scorers.py discipline).
    - 'legacy': the 7.x BM25 (s75 BM25Similarity.java:257-294) —
      weightValue = idf * (k1+1), norm = k1*((1-b) + (b*nlen)/avgdl),
      leaf = (weightValue * freq) / (freq + norm).
    - 'lmd': LMDirichlet mu=2000 (LMDirichletSimilarity.java:83-87) —
      p = (ttf+1)/(sttf+1) DOUBLE, leaf = float32(max(0,
      ln(1 + freq/(mu*p)) + ln(mu/(nlen + mu)))).
    - 'dfr': DFR G/B/H2 c=1 (DFRSimilarity.java:118-121) — DOUBLE avgfl =
      sttf/N, tfn = freq*log2(1 + avgfl/nlen), lambda = (ttf+1)/(N+ttf+1),
      A = log2(lambda+1), B = log2((1+lambda)/lambda), leaf =
      float32((B - (B-A)/(1+tfn)) * (ttf+2)/(df+1)).
    - 'ib': IB LL/DF/H1 c=1 (IBSimilarity.java:107-112) — lambda =
      FLOAT32((df+1)/(N+1)) then used as double, tfn = freq*(avgfl/nlen),
      leaf = float32(-ln(lambda / (tfn + lambda))).
    - 'dfi': DFI standardized (DFISimilarity.java) — expected =
      (ttf+1)*nlen/(sttf+1) DOUBLE; 0 when freq <= expected, else
      float32(log2(((freq-expected)/sqrt(expected)) + 1)).
    - 'lmjm': LM Jelinek-Mercer λ=0.7 (LMJelinekMercerSimilarity.java:70-75)
      — λ stored float32 then widened, p = (ttf+1)/(sttf+1) DOUBLE, leaf =
      float32(max(0, ln(1 + ((1-λ)·freq/nlen)/(λ·p)))).
    - 'bool': BooleanSimilarity (BooleanSimilarity.java) — every matching
      leaf scores exactly the query boost (1.0); the disjunction sum
      counts matching clauses.
    - 'sweet': misc SweetSpotSimilarity(min=30, max=60, steepness=0.5,
      tf_base=1.5, tf_min=2) — classic idf, baselineTf (freq <= 2 ->
      1.5f, else f32(sqrt(freq + 1.5^2 - 2))), plateau lengthNorm
      f32(1 / sqrt(0.5·(|l-30| + |l-60| - 30) + 1)) — all inner float
      arithmetic exact at these magnitudes, so the double path matches.
    - 'axf1'/'axf2'/'axf3': Axiomatic F1EXP / F2EXP / F3LOG(queryLen=2)
      (Axiomatic.java:103-112 + the subclass component definitions) —
      avgfl = sttf/N DOUBLE, s=0.25 exact-in-float, k widened from the
      float 0.35f; F3's gamma = (nlen − 2)·0.25·2/avgfl subtracts before
      the per-leaf zero clamp.
    """
    a, b = _ident(ta), _ident(tb)
    la, lb = ta.replace("'", "''"), tb.replace("'", "''")
    ctes = [base_ctes(relation), term_leaf_ctes(ta), term_leaf_ctes(tb)]
    for t, lit in ((a, la), (b, lb)):
        ctes.append(f"""
dfw_{t} AS (SELECT (ttf + 1.0) / ((SELECT n_docs FROM cs) + ttf + 1.0) AS lam,
                   (ttf + 2.0) / (df + 1.0) AS ae1p
            FROM (SELECT count(*) AS ttf,
                         count(DISTINCT doc_id) AS df
                  FROM tok WHERE term = '{lit}')),
dfr_{t} AS (SELECT tf.doc_id,
                 CAST(((ln((1.0 + (SELECT lam FROM dfw_{t})) / (SELECT lam FROM dfw_{t})) / ln(2.0))
                       - ((ln((1.0 + (SELECT lam FROM dfw_{t})) / (SELECT lam FROM dfw_{t})) / ln(2.0))
                          - (ln((SELECT lam FROM dfw_{t}) + 1.0) / ln(2.0)))
                         / (1.0 + CAST(tf.freq AS DOUBLE)
                                  * (ln(1.0 + (CAST((SELECT sttf FROM cs) AS DOUBLE)
                                               / (SELECT n_docs FROM cs))
                                              / CAST(nl.nlen AS DOUBLE)) / ln(2.0))))
                      * (SELECT ae1p FROM dfw_{t}) AS FLOAT) AS s
            FROM (SELECT doc_id, count(*) AS freq FROM tok WHERE term = '{lit}' GROUP BY doc_id) tf
            JOIN normlen nl USING (doc_id)),
dfiw_{t} AS (SELECT ttf + 1.0 AS ttf1
             FROM (SELECT count(*) AS ttf FROM tok WHERE term = '{lit}')),
dfis_{t} AS (SELECT doc_id,
                 CAST(CASE WHEN f <= expected THEN 0.0
                           ELSE ln(((f - expected) / sqrt(expected)) + 1.0) / ln(2.0)
                      END AS FLOAT) AS s
             FROM (SELECT tf.doc_id, CAST(tf.freq AS DOUBLE) AS f,
                          ((SELECT ttf1 FROM dfiw_{t}) * CAST(nl.nlen AS DOUBLE))
                          / ((SELECT sttf FROM cs) + 1.0) AS expected
                   FROM (SELECT doc_id, count(*) AS freq FROM tok WHERE term = '{lit}' GROUP BY doc_id) tf
                   JOIN normlen nl USING (doc_id))),
ibw_{t} AS (SELECT CAST(CAST((df + 1.0) / ((SELECT n_docs FROM cs) + 1.0) AS FLOAT) AS DOUBLE) AS lam
            FROM (SELECT count(DISTINCT doc_id) AS df FROM tok WHERE term = '{lit}')),
ibs_{t} AS (SELECT tf.doc_id,
                 CAST(-ln((SELECT lam FROM ibw_{t})
                          / ((CAST(tf.freq AS DOUBLE)
                              * ((CAST((SELECT sttf FROM cs) AS DOUBLE)
                                  / (SELECT n_docs FROM cs))
                                 / CAST(nl.nlen AS DOUBLE)))
                             + (SELECT lam FROM ibw_{t}))) AS FLOAT) AS s
            FROM (SELECT doc_id, count(*) AS freq FROM tok WHERE term = '{lit}' GROUP BY doc_id) tf
            JOIN normlen nl USING (doc_id)),
lmp_{t} AS (SELECT (ttf + 1.0) / ((SELECT sttf FROM cs) + 1.0) AS p
            FROM (SELECT count(*) AS ttf FROM tok WHERE term = '{lit}')),
lmd_{t} AS (SELECT tf.doc_id,
                 CAST(greatest(ln(1.0 + CAST(tf.freq AS DOUBLE)
                                       / (2000.0 * (SELECT p FROM lmp_{t})))
                               + ln(2000.0 / (CAST(nl.nlen AS DOUBLE) + 2000.0)),
                               0.0) AS FLOAT) AS s
            FROM (SELECT doc_id, count(*) AS freq FROM tok WHERE term = '{lit}' GROUP BY doc_id) tf
            JOIN normlen nl USING (doc_id)),
lmjm_{t} AS (SELECT tf.doc_id,
                 CAST(greatest(ln(1.0 + ((1.0 - CAST(CAST(0.7 AS FLOAT) AS DOUBLE))
                                         * CAST(tf.freq AS DOUBLE)
                                         / CAST(nl.nlen AS DOUBLE))
                                        / (CAST(CAST(0.7 AS FLOAT) AS DOUBLE)
                                           * (SELECT p FROM lmp_{t}))),
                               0.0) AS FLOAT) AS s
            FROM (SELECT doc_id, count(*) AS freq FROM tok WHERE term = '{lit}' GROUP BY doc_id) tf
            JOIN normlen nl USING (doc_id)),
bls_{t} AS (SELECT DISTINCT doc_id, {ONE_F} AS s
            FROM tok WHERE term = '{lit}'),
axw_{t} AS (SELECT ((SELECT n_docs FROM cs) + 1.0)
                   / count(DISTINCT doc_id) AS n1df,
                   CAST((SELECT sttf FROM cs) AS DOUBLE)
                   / (SELECT n_docs FROM cs) AS avgfl
            FROM tok WHERE term = '{lit}'),
axf1_{t} AS (SELECT tf.doc_id,
                 CAST((1.0 + ln(1.0 + ln(CAST(tf.freq AS DOUBLE) + 1.0)))
                      * (((SELECT avgfl FROM axw_{t}) + 0.25)
                         / ((SELECT avgfl FROM axw_{t})
                            + CAST(nl.nlen AS DOUBLE) * 0.25))
                      * pow((SELECT n1df FROM axw_{t}),
                            CAST(CAST(0.35 AS FLOAT) AS DOUBLE)) AS FLOAT) AS s
            FROM (SELECT doc_id, count(*) AS freq FROM tok WHERE term = '{lit}' GROUP BY doc_id) tf
            JOIN normlen nl USING (doc_id)),
axf2_{t} AS (SELECT tf.doc_id,
                 CAST((CAST(tf.freq AS DOUBLE)
                       / (CAST(tf.freq AS DOUBLE) + 0.25
                          + 0.25 * CAST(nl.nlen AS DOUBLE)
                            / (SELECT avgfl FROM axw_{t})))
                      * pow((SELECT n1df FROM axw_{t}),
                            CAST(CAST(0.35 AS FLOAT) AS DOUBLE)) AS FLOAT) AS s
            FROM (SELECT doc_id, count(*) AS freq FROM tok WHERE term = '{lit}' GROUP BY doc_id) tf
            JOIN normlen nl USING (doc_id)),
axf3_{t} AS (SELECT tf.doc_id,
                 CAST(greatest((1.0 + ln(1.0 + ln(CAST(tf.freq AS DOUBLE) + 1.0)))
                               * ln((SELECT n1df FROM axw_{t}))
                               - (CAST(nl.nlen AS DOUBLE) - 2.0) * 0.25 * 2.0
                                 / (SELECT avgfl FROM axw_{t}),
                               0.0) AS FLOAT) AS s
            FROM (SELECT doc_id, count(*) AS freq FROM tok WHERE term = '{lit}' GROUP BY doc_id) tf
            JOIN normlen nl USING (doc_id))""")
        ctes.append(f"""
cw_{t} AS (SELECT CAST(ln(((SELECT n_docs FROM cs) + 1) / CAST(df + 1 AS DOUBLE)) + 1.0 AS FLOAT) AS w
           FROM (SELECT count(DISTINCT doc_id) AS df FROM tok WHERE term = '{lit}')),
cls_{t} AS (SELECT tf.doc_id,
                 (CAST(sqrt(CAST(tf.freq AS DOUBLE)) AS FLOAT) * (SELECT w FROM cw_{t}))
                 * CAST(1.0 / sqrt(CAST(nl.nlen AS DOUBLE)) AS FLOAT) AS s
            FROM (SELECT doc_id, count(*) AS freq FROM tok WHERE term = '{lit}' GROUP BY doc_id) tf
            JOIN normlen nl USING (doc_id)),
lgs_{t} AS (SELECT tf.doc_id,
                 (CAST((SELECT w FROM w_{t}) * ({K1_F} + {ONE_F}) AS FLOAT)
                  * CAST(tf.freq AS FLOAT))
                 / (CAST(tf.freq AS FLOAT)
                    + {K1_F} * (({ONE_F} - {B_F})
                       + ({B_F} * CAST(nl.nlen AS FLOAT)) / (SELECT avgdl FROM cs))) AS s
            FROM (SELECT doc_id, count(*) AS freq FROM tok WHERE term = '{lit}' GROUP BY doc_id) tf
            JOIN normlen nl USING (doc_id)),
sws_{t} AS (SELECT tf.doc_id,
                 (CASE WHEN tf.freq <= 2 THEN CAST(1.5 AS FLOAT)
                       ELSE CAST(sqrt(CAST(tf.freq AS DOUBLE) + 2.25 - 2.0) AS FLOAT) END
                  * (SELECT w FROM cw_{t}))
                 * CAST(1.0 / sqrt(0.5 * (abs(CAST(nl.nlen AS DOUBLE) - 30.0)
                                          + abs(CAST(nl.nlen AS DOUBLE) - 60.0)
                                          - 30.0) + 1.0) AS FLOAT) AS s
            FROM (SELECT doc_id, count(*) AS freq FROM tok WHERE term = '{lit}' GROUP BY doc_id) tf
            JOIN normlen nl USING (doc_id))""")
    selects = []
    for qid, pref in (
        ("classic", "cls"), ("legacy", "lgs"), ("lmd", "lmd"),
        ("dfr", "dfr"), ("ib", "ibs"), ("dfi", "dfis"),
        ("lmjm", "lmjm"), ("bool", "bls"),
        ("axf1", "axf1"), ("axf2", "axf2"), ("axf3", "axf3"),
        ("sweet", "sws"),
    ):
        scored = f"""(SELECT COALESCE(x.doc_id, y.doc_id) AS doc_id,
            CAST(COALESCE(CAST(x.s AS DOUBLE), 0)
                 + COALESCE(CAST(y.s AS DOUBLE), 0) AS FLOAT) AS score
     FROM {pref}_{a} x FULL OUTER JOIN {pref}_{b} y ON x.doc_id = y.doc_id)"""
        selects.append(
            f"""(SELECT '{qid}' AS query_id,
        CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
        doc_id, ROUND(CAST(score AS DOUBLE), 4) AS score_r
 FROM {scored} ORDER BY score DESC, doc_id LIMIT {k})"""
        )
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def lang_filtered_topk_sql(
    terms: list[str], lang: str, k: int, relation: str = "documents"
) -> str:
    """BM25 disjunction + lang FILTER (see filtered_topk_sql)."""
    return filtered_topk_sql(terms, f"lang = '{lang}'", k, relation)


def filtered_topk_sql(
    terms: list[str], where_sql: str, k: int, relation: str = "documents"
) -> str:
    """BM25 disjunction + metadata FILTER oracle: every doc of the filtered
    set matches (FILTER-side score contribution is 0), scored by the sum of
    its matching SHOULD leaves: (rank, doc_id, score_r)."""
    ctes = [base_ctes(relation)]
    ctes += [term_leaf_ctes(t) for t in sorted(set(terms))]
    union = "\n      UNION ALL ".join(f"SELECT doc_id, s FROM s_{_ident(t)}" for t in terms)
    ctes.append(f"""
flt AS (SELECT doc_id FROM {relation} WHERE {where_sql}),
scf AS (SELECT flt.doc_id,
               CAST(COALESCE(SUM(CAST(u.s AS DOUBLE)), 0) AS FLOAT) AS score
        FROM flt LEFT JOIN ({union}) u USING (doc_id)
        GROUP BY flt.doc_id)""")
    return (
        "WITH " + ",".join(ctes) + f"""
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
       doc_id, ROUND(CAST(score AS DOUBLE), 4) AS score_r
FROM scf ORDER BY score DESC, doc_id LIMIT {k}"""
    )


def function_topk_sql(terms: list[str], k: int, relation: str = "documents") -> str:
    """FunctionScoreQuery oracle: BM25 disjunction re-scored by
    log1p(doc length) — score = float32(double(bm25) * ln(1 + dl)),
    matching the engine's float64-multiply-then-float32-cast order."""
    ctes = [base_ctes(relation)]
    ctes += [term_leaf_ctes(t) for t in sorted(set(terms))]
    ctes += [disjunction_scored_cte("f", terms)]
    return (
        "WITH " + ",".join(ctes) + f"""
SELECT CAST(row_number() OVER (ORDER BY fscore DESC, doc_id) AS BIGINT) AS rank,
       doc_id, ROUND(CAST(fscore AS DOUBLE), 4) AS score_r
FROM (SELECT s.doc_id,
             CAST(CAST(s.score AS DOUBLE) * ln(1 + dl.dl) AS FLOAT) AS fscore
      FROM scored_f s JOIN dl USING (doc_id))
ORDER BY fscore DESC, doc_id LIMIT {k}"""
    )


def expression_topk_sql(terms: list[str], k: int, relation: str = "documents") -> str:
    """ExpressionScoreQuery oracle: BM25 disjunction re-scored by
    ``0.3*_score + ln(1+length)*(_score>1 ? 1.5 : 1.0) + sqrt(min(length,64))/8``
    — every operation in DOUBLE (Lucene expression semantics) with one
    final FLOAT cast, the exact tree the engine's compiled AST evaluates
    (functions/expressions.py)."""
    ctes = [base_ctes(relation)]
    ctes += [term_leaf_ctes(t) for t in sorted(set(terms))]
    ctes += [disjunction_scored_cte("e", terms)]
    expr = (
        "0.3*CAST(s.score AS DOUBLE)"
        " + ln(1 + dl.dl)"
        "   * (CASE WHEN CAST(s.score AS DOUBLE) > 1 THEN 1.5 ELSE 1.0 END)"
        " + sqrt(least(dl.dl, 64))/8"
    )
    return (
        "WITH " + ",".join(ctes) + f"""
SELECT CAST(row_number() OVER (ORDER BY fscore DESC, doc_id) AS BIGINT) AS rank,
       doc_id, ROUND(CAST(fscore AS DOUBLE), 4) AS score_r
FROM (SELECT s.doc_id, CAST({expr} AS FLOAT) AS fscore
      FROM scored_e s JOIN dl USING (doc_id))
ORDER BY fscore DESC, doc_id LIMIT {k}"""
    )


def mlt_topk_sql(
    src_doc_id: int, k: int, min_tf: int = 2, min_df: int = 5,
    max_terms: int = 25, relation: str = "documents",
) -> str:
    """MoreLikeThis oracle, fully in SQL: interesting-term selection
    (tf x (1 + ln(n/(df+1))), filters, top max_terms by score then term)
    followed by GENERIC float32 BM25 leaf scoring of the selected terms
    and the disjunction double-sum — no per-term CTEs, so the selection
    stays dynamic like the engine's."""
    ninv = (
        f"({ONE_F} / ({K1_F} * (({ONE_F} - {B_F})"
        f" + ({B_F} * CAST(nl.nlen AS FLOAT)) / (SELECT avgdl FROM cs))))"
    )
    return f"""WITH {base_ctes(relation)},
qtf AS (SELECT x AS term, count(*) AS tf
        FROM (SELECT unnest(string_split(
                 (SELECT text FROM {relation} WHERE doc_id = {src_doc_id}), ' ')) AS x)
        GROUP BY x HAVING count(*) >= {min_tf}),
qdf AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
        WHERE term IN (SELECT term FROM qtf) GROUP BY term),
sel AS (SELECT q.term, d.df,
               q.tf * (1 + ln((SELECT n_docs FROM cs) / (d.df + 1.0))) AS mscore
        FROM qtf q JOIN qdf d USING (term)
        WHERE d.df >= {min_df}
        ORDER BY mscore DESC, q.term LIMIT {max_terms}),
w AS (SELECT term,
             CAST(ln(1 + ((SELECT n_docs FROM cs) - df + 0.5) / (df + 0.5)) AS FLOAT) AS w
      FROM sel),
leaf AS (SELECT tk.doc_id,
                w.w - w.w / ({ONE_F} + CAST(tk.freq AS FLOAT) * {ninv}) AS s
         FROM (SELECT doc_id, term, count(*) AS freq FROM tok
               WHERE term IN (SELECT term FROM sel) GROUP BY doc_id, term) tk
         JOIN w USING (term) JOIN normlen nl USING (doc_id)),
scored AS (SELECT doc_id, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
           FROM leaf GROUP BY doc_id)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
       doc_id, ROUND(CAST(score AS DOUBLE), 4) AS score_r
FROM scored ORDER BY score DESC, doc_id LIMIT {k}"""


def term_stats_sql(relation: str = "documents") -> str:
    """Full term dictionary: (term, doc_freq, total_term_freq)."""
    return f"""WITH {base_ctes(relation)}
SELECT term, count(DISTINCT doc_id) AS doc_freq, count(*) AS total_term_freq
FROM tok GROUP BY term"""


def postings_sql(terms: list[str], relation: str = "documents") -> str:
    """Posting lists for chosen terms: (term, doc_id, freq)."""
    lits = ",".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""WITH {base_ctes(relation)}
SELECT term, doc_id, count(*) AS freq
FROM tok WHERE term IN ({lits}) GROUP BY term, doc_id"""


def doc_lengths_sql(relation: str = "documents") -> str:
    """(doc_id, dl, norm_len): doc length + SmallFloat-quantized length."""
    return f"""WITH {base_ctes(relation)}
SELECT dl.doc_id, dl.dl AS dl, normlen.nlen AS norm_len
FROM dl JOIN normlen ON dl.doc_id = normlen.doc_id"""


def boolean_counts_sql(
    specs: list[tuple[str, list[str], list[str], list[str], int]],
    relation: str = "documents",
) -> str:
    """Boolean match counts: specs = (query_id, musts, shoulds, must_nots, msm).

    Scoring-free BooleanQuery semantics (scorers.py _eval_boolean): all
    musts present, >= msm shoulds present (>=max(1,msm) when no musts),
    no must_nots present.
    """
    blocks = []
    for qid, musts, shoulds, must_nots, msm in specs:
        conds = []
        for t in musts:
            conds.append(
                f"EXISTS (SELECT 1 FROM tok t WHERE t.doc_id = d.doc_id AND t.term = '{t}')"
            )
        if shoulds:
            need = msm if musts else max(1, msm)
            in_list = ",".join(f"'{t}'" for t in shoulds)
            conds.append(
                f"(SELECT count(DISTINCT t.term) FROM tok t WHERE t.doc_id = d.doc_id "
                f"AND t.term IN ({in_list})) >= {need}"
            )
        for t in must_nots:
            conds.append(
                f"NOT EXISTS (SELECT 1 FROM tok t WHERE t.doc_id = d.doc_id AND t.term = '{t}')"
            )
        where = " AND ".join(conds) if conds else "FALSE"
        blocks.append(
            f"(SELECT '{qid}' AS query_id, count(*) AS n FROM {relation} d WHERE {where})"
        )
    return f"WITH {base_ctes(relation)}\n" + "\nUNION ALL\n".join(blocks)


def multiterm_match_sql(
    specs: list[tuple[str, str]], relation: str = "documents"
) -> str:
    """Multi-term (prefix/wildcard/fuzzy) matches: (kind, doc_id).

    specs = (kind, condition-SQL over alias ``t.term``); a doc matches when
    any of its tokens satisfies the condition (MultiTermQuery rewrite to a
    constant-score disjunction — queries.py rewrite()).
    """
    blocks = [
        f"""(SELECT '{kind}' AS kind, d.doc_id
 FROM {relation} d
 WHERE EXISTS (SELECT 1 FROM tok t WHERE t.doc_id = d.doc_id AND {cond}))"""
        for kind, cond in specs
    ]
    return f"WITH {base_ctes(relation)}\n" + "\nUNION ALL\n".join(blocks)


# --- multi-field BM25 oracles ----------------------------------------------
# Token-stream SQL per indexed field. The synthetic title field is the first
# TITLE_TOKENS body tokens (sources/pages.py), so its stream is a pure SQL
# expression over the same relation. Field "" = primary (body text).
def _field_token_expr(field: str) -> str:
    from ..sources.pages import TITLE_TOKENS

    if field == "":
        return "string_split(text, ' ')"
    if field == "title":
        return f"list_slice(string_split(text, ' '), 1, {TITLE_TOKENS})"
    raise ValueError(f"no oracle token expression for field {field!r}")


def _fp(field: str) -> str:
    return "b" if field == "" else "f" + _ident(field)


def field_stream_ctes(field: str, relation: str = "documents") -> str:
    """Per-field token stream + collection stats + norm lengths.

    Field docCount = docs WITH >= 1 token of the field (docsWithField — what
    the engine stores in manifest field_stats and BM25Similarity uses for a
    field's CollectionStatistics); the primary field keeps count(*) over the
    relation, matching the engine's manifest doc_count."""
    p = _fp(field)
    expr = _field_token_expr(field)
    n_docs = (
        f"(SELECT count(*) FROM {relation})"
        if field == ""
        else f"(SELECT count(DISTINCT doc_id) FROM {p}tok)"
    )
    return f"""
{p}tok AS (SELECT doc_id, unnest({expr}) AS term FROM {relation}),
{p}cs AS (SELECT {n_docs} AS n_docs,
              (SELECT count(*) FROM {p}tok) AS sttf,
              CAST(CAST((SELECT count(*) FROM {p}tok) AS DOUBLE)
                   / {n_docs} AS FLOAT) AS avgdl),
{p}dl AS (SELECT doc_id, count(*) AS dl FROM {p}tok GROUP BY doc_id),
{p}normlen AS (SELECT {p}dl.doc_id, max(lt.v) AS nlen
               FROM {p}dl JOIN lt ON lt.v <= {p}dl.dl GROUP BY {p}dl.doc_id)"""


def _boost_tag(boost: float) -> str:
    return str(boost).replace(".", "_").replace("-", "m")


def field_leaf_cte(field: str, term: str, boost: float = 1.0) -> str:
    """Float32 BM25 leaf for (field, term, boost) over the field's streams;
    weight = float32(boost) * float32 idf (BM25 weight creation)."""
    p = _fp(field)
    t = _ident(term)
    bt = _boost_tag(boost)
    lit = term.replace("'", "''")
    w_expr = f"CAST(ln(1 + (({p}cs.n_docs) - df + 0.5) / (df + 0.5)) AS FLOAT)"
    if boost != 1.0:
        w_expr = f"CAST({boost} AS FLOAT) * {w_expr}"
    return f"""
w_{p}_{t}_{bt} AS (SELECT {w_expr} AS w
          FROM (SELECT count(DISTINCT doc_id) AS df FROM {p}tok WHERE term = '{lit}'), {p}cs),
s_{p}_{t}_{bt} AS (SELECT tf.doc_id,
                 (SELECT w FROM w_{p}_{t}_{bt})
                 - (SELECT w FROM w_{p}_{t}_{bt})
                   / ({ONE_F} + CAST(tf.freq AS FLOAT)
                      * ({ONE_F} / ({K1_F} * (({ONE_F} - {B_F})
                         + ({B_F} * CAST(nl.nlen AS FLOAT)) / (SELECT avgdl FROM {p}cs))))) AS s
          FROM (SELECT doc_id, count(*) AS freq FROM {p}tok WHERE term = '{lit}' GROUP BY doc_id) tf
          JOIN {p}normlen nl USING (doc_id))"""


def field_topk_sql(
    specs: list[tuple[str, str, list[tuple[str, str, float]], int]],
    relation: str = "documents",
) -> str:
    """Multi-field top-k oracle: (query_id, rank, doc_id, score_r).

    specs = (query_id, kind, clauses, k) with clauses = [(field, term,
    boost)]; kind "sum" = SHOULD-sum across fields (DOUBLE accumulate, one
    float32 cast — scorers.py discipline), kind "dismax" = float64 max +
    0.3*(sum-max) cast to float32 (DisjunctionMaxQuery semantics), kind
    "must" = conjunction (all clauses required, score = sum), kind "not" =
    first clause scored SHOULD, remaining clauses are MUST_NOT."""
    fields = sorted({f for _, _, cls, _ in specs for f, _, _ in cls})
    leaves = sorted({(f, t, b) for _, _, cls, _ in specs for f, t, b in cls})
    ctes = ["lt AS (SELECT unnest(" + LENGTH_TABLE_SQL + ") AS v)"]
    ctes += [field_stream_ctes(f, relation) for f in fields]
    ctes += [field_leaf_cte(f, t, b) for f, t, b in leaves]
    selects = []
    for qid, kind, cls, k in specs:
        names = [f"s_{_fp(f)}_{_ident(t)}_{_boost_tag(b)}" for f, t, b in cls]
        if kind == "sum":
            union = "\n      UNION ALL ".join(
                f"SELECT doc_id, s FROM {nm}" for nm in names
            )
            scored = f"""(SELECT doc_id, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
                 FROM ({union}) GROUP BY doc_id)"""
        elif kind == "dismax":
            assert len(names) == 2, "dismax oracle supports 2 clauses"
            a, b2 = names
            scored = f"""(SELECT COALESCE(x.doc_id, y.doc_id) AS doc_id,
                  CAST(CAST(greatest(COALESCE(x.s, CAST('-inf' AS FLOAT)),
                                     COALESCE(y.s, CAST('-inf' AS FLOAT))) AS DOUBLE)
                       + 0.3 * ((COALESCE(CAST(x.s AS DOUBLE), 0) + COALESCE(CAST(y.s AS DOUBLE), 0))
                                - CAST(greatest(COALESCE(x.s, CAST('-inf' AS FLOAT)),
                                                COALESCE(y.s, CAST('-inf' AS FLOAT))) AS DOUBLE))
                       AS FLOAT) AS score
           FROM {a} x FULL OUTER JOIN {b2} y ON x.doc_id = y.doc_id)"""
        elif kind == "must":
            joins = f"{names[0]} x0"
            for i in range(1, len(names)):
                joins += f" JOIN {names[i]} x{i} USING (doc_id)"
            total = " + ".join(f"CAST(x{i}.s AS DOUBLE)" for i in range(len(names)))
            scored = f"""(SELECT doc_id, CAST({total} AS FLOAT) AS score FROM {joins})"""
        elif kind == "not":
            anti = " AND ".join(
                f"NOT EXISTS (SELECT 1 FROM {nm} n{i} WHERE n{i}.doc_id = x.doc_id)"
                for i, nm in enumerate(names[1:])
            )
            scored = f"""(SELECT doc_id, CAST(CAST(s AS DOUBLE) AS FLOAT) AS score
                FROM {names[0]} x WHERE {anti})"""
        elif kind == "or_and":
            # (c1 OR c2) AND c3 — the group is a nested BooleanQuery clause:
            # inner SHOULD-sum accumulates DOUBLE and casts to float32 ONCE
            # (scorers.py boolean discipline), then the outer conjunction
            # re-accumulates double(inner) + double(c3) -> float32.
            assert len(names) == 3, "or_and oracle takes exactly 3 clauses"
            a, b2, c = names
            scored = f"""(SELECT doc_id,
          CAST(CAST(g.s AS DOUBLE) + CAST(z.s AS DOUBLE) AS FLOAT) AS score
        FROM (SELECT doc_id, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS s
              FROM (SELECT doc_id, s FROM {a}
                    UNION ALL SELECT doc_id, s FROM {b2})
              GROUP BY doc_id) g
        JOIN {c} z USING (doc_id))"""
        elif kind == "and_notgroup":
            # c1 AND (c2 NOT c3) — group score is c2's score passed through
            # the inner float32 cast (identity), group requires c2 and
            # rejects c3; outer conjunction sums with c1.
            assert len(names) == 3, "and_notgroup oracle takes exactly 3 clauses"
            a, b2, c = names
            scored = f"""(SELECT doc_id,
          CAST(CAST(x.s AS DOUBLE) + CAST(y.s AS DOUBLE) AS FLOAT) AS score
        FROM {a} x JOIN {b2} y USING (doc_id)
        WHERE NOT EXISTS (SELECT 1 FROM {c} n WHERE n.doc_id = x.doc_id))"""
        elif kind == "group_sum":
            # (c1 c2) c3 — a SHOULD group beside a SHOULD leaf: the group
            # is a nested BooleanQuery (inner double-sum -> one float32
            # cast), then an outer SHOULD-sum with c3 (either side may be
            # absent).
            assert len(names) == 3, "group_sum oracle takes exactly 3 clauses"
            a, b2, c = names
            scored = f"""(SELECT COALESCE(g.doc_id, z.doc_id) AS doc_id,
          CAST(COALESCE(CAST(g.s AS DOUBLE), 0)
               + COALESCE(CAST(z.s AS DOUBLE), 0) AS FLOAT) AS score
        FROM (SELECT doc_id, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS s
              FROM (SELECT doc_id, s FROM {a}
                    UNION ALL SELECT doc_id, s FROM {b2})
              GROUP BY doc_id) g
        FULL OUTER JOIN {c} z ON g.doc_id = z.doc_id)"""
        elif kind == "sum_negmatchall":
            # c1 -c2 under SimpleQueryParser semantics: the negated term
            # wraps as BQ(MUST_NOT c2, SHOULD MatchAll), so the outer
            # disjunction matches docs with c1 OR docs WITHOUT c2; the
            # wrapped branch contributes the MatchAll score 1.0f through
            # the inner float32 cast (identity), outer double-sum -> f32.
            assert len(names) == 2, "sum_negmatchall oracle takes 2 clauses"
            a, b2 = names
            scored = f"""(SELECT COALESCE(x.doc_id, y.doc_id) AS doc_id,
          CAST(COALESCE(CAST(x.s AS DOUBLE), 0)
               + COALESCE(y.one, 0) AS FLOAT) AS score
        FROM {a} x FULL OUTER JOIN
          (SELECT doc_id, CAST(1.0 AS DOUBLE) AS one FROM {relation} d
           WHERE NOT EXISTS (SELECT 1 FROM {b2} n WHERE n.doc_id = d.doc_id)) y
        ON x.doc_id = y.doc_id)"""
        elif kind == "sum_notgroup":
            # c1 -(c2 c3) — a MUST_NOT group: c1's docs minus docs matching
            # c2 OR c3; score = c1's score alone.
            assert len(names) == 3, "sum_notgroup oracle takes exactly 3 clauses"
            a, b2, c = names
            scored = f"""(SELECT doc_id, CAST(CAST(s AS DOUBLE) AS FLOAT) AS score
        FROM {a} x
        WHERE NOT EXISTS (SELECT 1 FROM {b2} n1 WHERE n1.doc_id = x.doc_id)
          AND NOT EXISTS (SELECT 1 FROM {c} n2 WHERE n2.doc_id = x.doc_id))"""
        else:
            raise ValueError(f"unknown kind {kind!r}")
        selects.append(
            f"""(SELECT '{qid}' AS query_id,
        CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
        doc_id, ROUND(CAST(score AS DOUBLE), 4) AS score_r
 FROM {scored} ORDER BY score DESC, doc_id LIMIT {k})"""
        )
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def facet_lang_sql(term: str, relation: str = "documents") -> str:
    """Facet counts of ``lang`` over docs matching ``term``."""
    return f"""WITH {base_ctes(relation)}
SELECT d.lang AS lang, count(*) AS n
FROM {relation} d
WHERE EXISTS (SELECT 1 FROM tok t WHERE t.doc_id = d.doc_id AND t.term = '{term}')
GROUP BY d.lang"""


def facet_taxonomy_sql(term: str, relation: str = "documents") -> str:
    """Hierarchical taxonomy facet counts over docs matching ``term``:
    one row per prefix level of the "source/lang" path (level-1 rollup +
    leaf counts — FastTaxonomyFacetCounts semantics)."""
    return f"""WITH {base_ctes(relation)},
m AS (SELECT d.source, d.lang FROM {relation} d
      WHERE EXISTS (SELECT 1 FROM tok t WHERE t.doc_id = d.doc_id AND t.term = '{term}'))
SELECT path, n FROM (
  SELECT source AS path, count(*) AS n FROM m GROUP BY source
  UNION ALL
  SELECT source || '/' || lang AS path, count(*) AS n FROM m GROUP BY source, lang
)"""


def facet_drillsideways_sql(
    term: str, drill: str, relation: str = "documents"
) -> str:
    """DrillSideways oracle: level-1 path (= source) counts over ALL docs
    matching ``term`` (the drilled dim's filter excluded), plus lang
    counts over the drilled-down subset (source = drill)."""
    lit = drill.replace("'", "''")
    return f"""WITH {base_ctes(relation)},
m AS (SELECT d.source, d.lang FROM {relation} d
      WHERE EXISTS (SELECT 1 FROM tok t WHERE t.doc_id = d.doc_id AND t.term = '{term}'))
SELECT 'path' AS dim, source AS value, count(*) AS n FROM m GROUP BY source
UNION ALL
SELECT 'lang' AS dim, lang AS value, count(*) AS n
FROM m WHERE source = '{lit}' GROUP BY lang"""


def facet_tags_sql(term: str, relation: str = "documents") -> str:
    """SORTED_SET facet counts over docs matching ``term``: each doc
    counts once per distinct value of its tag set {lang, source,
    length-bucket} (buckets mirror sources.pages.TAG_LEN_EDGES/LABELS)."""
    return f"""WITH {base_ctes(relation)},
m AS (SELECT d.lang, d.source, len(string_split(d.text, ' ')) AS dl
      FROM {relation} d
      WHERE EXISTS (SELECT 1 FROM tok t WHERE t.doc_id = d.doc_id AND t.term = '{term}'))
SELECT tag, count(*) AS n FROM (
  SELECT lang AS tag FROM m
  UNION ALL SELECT source AS tag FROM m
  UNION ALL SELECT CASE WHEN dl < 30 THEN 'len_00_29'
                        WHEN dl < 60 THEN 'len_30_59'
                        ELSE 'len_60_up' END AS tag FROM m
) GROUP BY tag"""


def tags_where_sql(value: str) -> str:
    """WHERE clause matching docs whose tag set contains ``value`` —
    the SQL twin of SortedSetDocValuesQuery over the derived tag set."""
    lit = value.replace("'", "''")
    return f"""(lang = '{lit}' OR source = '{lit}'
  OR CASE WHEN len(string_split(text, ' ')) < 30 THEN 'len_00_29'
          WHEN len(string_split(text, ' ')) < 60 THEN 'len_30_59'
          ELSE 'len_60_up' END = '{lit}')"""


def join_topk_sql(term: str, k: int, relation: str = "documents") -> str:
    """Scored query-time join oracle (JoinUtil.java:90,131;
    TermsWithScoreCollector.java): from-side = docs matching ``term``,
    join key = source; Total = sequential float32 fold of from-side leaf
    scores in doc order (list_reduce, as in the blockjoin/span oracles),
    Max = float32 max, Avg = float32 total / float32 count, None = 1.
    To-side = every doc of a collected key, top-k per mode."""
    t = _ident(term)
    return f"""WITH {base_ctes(relation)},{term_leaf_ctes(term)},
fm AS (SELECT x.doc_id, x.s, d.source FROM s_{t} x JOIN {relation} d USING (doc_id)),
agg AS (SELECT source,
  list_reduce(list_prepend(CAST(0 AS FLOAT), list(CAST(s AS FLOAT) ORDER BY doc_id)),
              (acc, x) -> CAST(acc + x AS FLOAT)) AS total,
  max(s) AS mx, count(*) AS cnt
  FROM fm GROUP BY source),
agg2 AS (SELECT source, total, mx,
                CAST(total / CAST(cnt AS FLOAT) AS FLOAT) AS avg FROM agg),
tos AS (SELECT d.doc_id, a.total, a.mx, a.avg
        FROM {relation} d JOIN agg2 a USING (source))
(SELECT 'join_total' AS query_id,
        CAST(row_number() OVER (ORDER BY total DESC, doc_id) AS BIGINT) AS rank,
        doc_id, ROUND(CAST(total AS DOUBLE), 4) AS score_r
 FROM tos ORDER BY total DESC, doc_id LIMIT {k})
UNION ALL
(SELECT 'join_max' AS query_id,
        CAST(row_number() OVER (ORDER BY mx DESC, doc_id) AS BIGINT) AS rank,
        doc_id, ROUND(CAST(mx AS DOUBLE), 4) AS score_r
 FROM tos ORDER BY mx DESC, doc_id LIMIT {k})
UNION ALL
(SELECT 'join_avg' AS query_id,
        CAST(row_number() OVER (ORDER BY avg DESC, doc_id) AS BIGINT) AS rank,
        doc_id, ROUND(CAST(avg AS DOUBLE), 4) AS score_r
 FROM tos ORDER BY avg DESC, doc_id LIMIT {k})
UNION ALL
(SELECT 'join_none' AS query_id,
        CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rank,
        doc_id, 1.0 AS score_r
 FROM tos ORDER BY doc_id LIMIT {k})"""


def facet_range_sql(
    term: str,
    edges: list[int],
    labels: list[str],
    relation: str = "documents",
) -> str:
    """Numeric range-facet counts of doc length over docs matching
    ``term``: bucket i = [edges[i-1], edges[i]) with open ends."""
    conds = []
    for i, lab in enumerate(labels):
        lo = None if i == 0 else edges[i - 1]
        hi = None if i == len(labels) - 1 else edges[i]
        cond = []
        if lo is not None:
            cond.append(f"dl.dl >= {lo}")
        if hi is not None:
            cond.append(f"dl.dl < {hi}")
        conds.append(f"WHEN {' AND '.join(cond) or 'TRUE'} THEN '{lab}'")
    case = "CASE " + " ".join(conds) + " END"
    return f"""WITH {base_ctes(relation)}
SELECT {case} AS bucket, count(*) AS n
FROM dl
WHERE EXISTS (SELECT 1 FROM tok t WHERE t.doc_id = dl.doc_id AND t.term = '{term}')
GROUP BY bucket"""


def grouped_topk_sql(terms: list[str], per_group: int, relation: str = "documents") -> str:
    """Per-lang top-k by BM25 for a disjunction: (lang, rank, doc_id, score_r)."""
    ctes = [base_ctes(relation)]
    ctes += [term_leaf_ctes(t) for t in sorted(set(terms))]
    ctes += [disjunction_scored_cte("g", terms)]
    return (
        "WITH " + ",".join(ctes) + f"""
SELECT lang, rank, doc_id, score_r FROM (
  SELECT d.lang AS lang,
         CAST(row_number() OVER (PARTITION BY d.lang ORDER BY s.score DESC, s.doc_id) AS BIGINT) AS rank,
         s.doc_id, ROUND(CAST(s.score AS DOUBLE), 4) AS score_r
  FROM scored_g s JOIN {relation} d USING (doc_id)
) WHERE rank <= {per_group}"""
    )


def field_exists_sql(relation: str = "documents") -> str:
    """FieldExists oracle: the score_hint doc-values column is derived in
    pages_from_documents as NULL iff doc_id % 3 == 0 (else n_chars), so
    existence is literally an IS NOT NULL predicate; lang is never null;
    the title field always has >= 1 token (first body tokens), so its
    norms-exists set is every doc."""
    return f"""WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN NULL ELSE n_chars END AS score_hint
  FROM {relation})
SELECT 'dv_exists_score_hint' AS kind, doc_id FROM d WHERE score_hint IS NOT NULL
UNION ALL
SELECT 'dv_exists_lang' AS kind, doc_id FROM {relation} WHERE lang IS NOT NULL
UNION ALL
SELECT 'norms_exists_title' AS kind, doc_id FROM {relation}
WHERE len(string_split(text, ' ')) >= 1
ORDER BY kind, doc_id"""


def completion_sql(
    specs: list[tuple[str, str, int]], relation: str = "documents"
) -> str:
    """Prefix-completion oracle: specs = (prefix_id, prefix, n). Weight is
    the corpus total_term_freq (suggest.CompletionSuggester's
    LuceneDictionary-style weight); rank by weight desc, term asc."""
    vals = ",".join(
        f"('{pid}', '{pfx}', {n})" for pid, pfx, n in specs
    )
    return f"""WITH {base_ctes(relation)},
td AS (SELECT term, count(*) AS weight FROM tok GROUP BY term),
p(prefix_id, prefix, n) AS (VALUES {vals}),
ranked AS (
  SELECT p.prefix_id, t.term, t.weight, p.n,
         row_number() OVER (PARTITION BY p.prefix_id
                            ORDER BY t.weight DESC, t.term) AS rank
  FROM p JOIN td t ON starts_with(t.term, p.prefix))
SELECT prefix_id, CAST(rank AS BIGINT) AS rank, term,
       CAST(weight AS BIGINT) AS weight
FROM ranked WHERE rank <= n"""


def commonterms_topk_sql(
    specs: list[tuple[str, list[str], str, str, float, float, float, int]],
    relation: str = "documents",
) -> str:
    """CommonTermsQuery oracle: (query_id, rank, doc_id, score_r).

    The df-threshold classification is done IN SQL (CommonTermsQuery.java
    buildQuery): a term is high-frequency when df > mtf (absolute, mtf>=1)
    or df > ceil(float32(mtf) * float32(maxDoc)). Per doc the low/high
    groups aggregate their matched leaves in DOUBLE and cast FLOAT once
    (the engine's nested-boolean discipline); the outer query requires the
    low group (MUST) and adds the high group when it matches (SHOULD),
    with the empty-low conjunction upgrade and Math.round fractional
    minShouldMatch mirrored as CASE expressions over the SQL-side counts.
    All boosts are 1 (float32 identity)."""
    all_terms = sorted({t for _, ts, *_ in specs for t in ts})
    ctes = [base_ctes(relation)]
    ctes += [term_leaf_ctes(t) for t in all_terms]
    for t in all_terms:
        ti = _ident(t)
        lit = t.replace("'", "''")
        ctes.append(f"""
ctdf_{ti} AS (SELECT count(DISTINCT doc_id) AS df FROM tok WHERE term = '{lit}')""")
    selects = []
    for qid, terms, ho, lo, mtf, lmns, hmns, k in specs:
        # per-term is_high flag with THIS spec's threshold
        for t in terms:
            ti = _ident(t)
            ctes.append(f"""
hf_{qid}_{ti} AS (SELECT (CASE WHEN {mtf} >= 1.0 THEN df > {mtf}
                               ELSE FALSE END)
                         OR df > ceil(CAST(CAST({mtf} AS FLOAT)
                                           * CAST((SELECT n_docs FROM cs) AS FLOAT) AS DOUBLE))
                         AS is_high
                  FROM ctdf_{_ident(t)})""")
        low_union = "\n      UNION ALL ".join(
            f"SELECT doc_id, s FROM s_{_ident(t)} WHERE NOT (SELECT is_high FROM hf_{qid}_{_ident(t)})"
            for t in terms
        )
        high_union = "\n      UNION ALL ".join(
            f"SELECT doc_id, s FROM s_{_ident(t)} WHERE (SELECT is_high FROM hf_{qid}_{_ident(t)})"
            for t in terms
        )
        n_low = " + ".join(
            f"(SELECT CASE WHEN is_high THEN 0 ELSE 1 END FROM hf_{qid}_{_ident(t)})"
            for t in terms
        )
        # group sizes + Math.round fractional minShouldMatch as scalar CTEs
        ctes.append(f"""
ctn_{qid} AS (SELECT {n_low} AS n_low, {len(terms)} - ({n_low}) AS n_high),
ctmns_{qid} AS (SELECT
    CASE WHEN {lmns} >= 1.0 OR {lmns} = 0.0 THEN CAST({lmns} AS BIGINT)
         ELSE CAST(floor({lmns} * (SELECT n_low FROM ctn_{qid}) + 0.5) AS BIGINT) END AS low_mns,
    CASE WHEN {hmns} >= 1.0 OR {hmns} = 0.0 THEN CAST({hmns} AS BIGINT)
         ELSE CAST(floor({hmns} * (SELECT n_high FROM ctn_{qid}) + 0.5) AS BIGINT) END AS high_mns),
ctl_{qid} AS (SELECT doc_id, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS ls, count(*) AS lc
              FROM ({low_union}) GROUP BY doc_id),
cth_{qid} AS (SELECT doc_id, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS hs, count(*) AS hc
              FROM ({high_union}) GROUP BY doc_id),
ctj_{qid} AS (SELECT COALESCE(l.doc_id, h.doc_id) AS doc_id,
                     COALESCE(l.ls, CAST(0 AS FLOAT)) AS ls, COALESCE(l.lc, 0) AS lc,
                     COALESCE(h.hs, CAST(0 AS FLOAT)) AS hs, COALESCE(h.hc, 0) AS hc
              FROM ctl_{qid} l FULL OUTER JOIN cth_{qid} h ON l.doc_id = h.doc_id),
ctm_{qid} AS (SELECT doc_id, ls, hs,
                     lc >= (CASE WHEN '{lo}' = 'MUST' THEN (SELECT n_low FROM ctn_{qid})
                                 ELSE greatest(1, (SELECT low_mns FROM ctmns_{qid})) END) AS low_ok,
                     hc >= (CASE WHEN '{ho}' = 'MUST'
                                      OR ((SELECT n_low FROM ctn_{qid}) = 0
                                          AND (SELECT high_mns FROM ctmns_{qid}) = 0)
                                 THEN (SELECT n_high FROM ctn_{qid})
                                 ELSE greatest(1, (SELECT high_mns FROM ctmns_{qid})) END) AS high_ok
              FROM ctj_{qid}),
cts_{qid} AS (SELECT doc_id,
                     CAST(CASE WHEN (SELECT n_low FROM ctn_{qid}) > 0 AND low_ok
                               THEN CAST(ls AS DOUBLE) ELSE 0 END
                          + CASE WHEN high_ok THEN CAST(hs AS DOUBLE) ELSE 0 END AS FLOAT) AS score
              FROM ctm_{qid}
              WHERE CASE WHEN (SELECT n_low FROM ctn_{qid}) > 0 THEN low_ok ELSE high_ok END)""")
        selects.append(
            f"""(SELECT '{qid}' AS query_id,
        CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
        doc_id, ROUND(CAST(score AS DOUBLE), 4) AS score_r
 FROM cts_{qid} ORDER BY score DESC, doc_id LIMIT {k})"""
        )
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def blended_topk_sql(
    specs: list[tuple[str, list[tuple[str, str]], tuple[float, ...], str, float, int]],
    relation: str = "documents",
) -> str:
    """BlendedTermQuery oracle: (query_id, rank, doc_id, score_r).

    specs = (query_id, members [(field, term)], boosts, rewrite_method,
    tie_breaker, k). Per query ONE artificial docFreq — greatest over each
    member's own-field df (BlendedTermQuery.java rewrite: df = max,
    adjustFrequencies) — feeds every member's float32 idf; each member leaf
    then scores over its OWN field's token stream / avgdl / norm length
    (per-field CollectionStatistics are NOT blended). Member boost folds
    into the weight (float32(boost) * idf, the BoostQuery weight-creation
    fold). Combination: "dismax" = float64(max float32 leaf) + tie *
    (double-sum - max), one float32 cast (DisjunctionMaxQuery.java:30);
    "boolean" = SHOULD-sum (double accumulate, one float32 cast)."""
    fields = sorted({f for _, mem, *_ in specs for f, _ in mem})
    ctes = ["lt AS (SELECT unnest(" + LENGTH_TABLE_SQL + ") AS v)"]
    ctes += [field_stream_ctes(f, relation) for f in fields]
    selects = []
    for qid, members, boosts, method, tie, k in specs:
        bs = boosts or tuple(1.0 for _ in members)
        df_subs = ", ".join(
            f"(SELECT count(DISTINCT doc_id) FROM {_fp(f)}tok"
            f" WHERE term = '{t.replace(chr(39), chr(39) * 2)}')"
            for f, t in members
        )
        df_expr = f"greatest({df_subs})" if len(members) > 1 else df_subs
        ctes.append(f"""
df_{qid} AS (SELECT {df_expr} AS df)""")
        leaf_names = []
        for i, ((f, t), b) in enumerate(zip(members, bs)):
            p = _fp(f)
            lit = t.replace("'", "''")
            w_expr = f"CAST(ln(1 + (({p}cs.n_docs) - df + 0.5) / (df + 0.5)) AS FLOAT)"
            if b != 1.0:
                w_expr = f"CAST({b} AS FLOAT) * {w_expr}"
            nm = f"bl_{qid}_{i}"
            ctes.append(f"""
w_{nm} AS (SELECT {w_expr} AS w FROM df_{qid}, {p}cs),
s_{nm} AS (SELECT tf.doc_id,
                 (SELECT w FROM w_{nm})
                 - (SELECT w FROM w_{nm})
                   / ({ONE_F} + CAST(tf.freq AS FLOAT)
                      * ({ONE_F} / ({K1_F} * (({ONE_F} - {B_F})
                         + ({B_F} * CAST(nl.nlen AS FLOAT)) / (SELECT avgdl FROM {p}cs))))) AS s
          FROM (SELECT doc_id, count(*) AS freq FROM {p}tok WHERE term = '{lit}' GROUP BY doc_id) tf
          JOIN {p}normlen nl USING (doc_id))""")
            leaf_names.append(f"s_{nm}")
        union = "\n      UNION ALL ".join(
            f"SELECT doc_id, s FROM {nm}" for nm in leaf_names
        )
        if method == "boolean":
            ctes.append(f"""
scored_{qid} AS (SELECT doc_id, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
                 FROM ({union}) GROUP BY doc_id)""")
        else:
            ctes.append(f"""
scored_{qid} AS (SELECT doc_id,
                        CAST(CAST(max(s) AS DOUBLE)
                             + {tie!r} * (SUM(CAST(s AS DOUBLE)) - CAST(max(s) AS DOUBLE))
                             AS FLOAT) AS score
                 FROM ({union}) GROUP BY doc_id)""")
        selects.append(
            f"""(SELECT '{qid}' AS query_id,
        CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
        doc_id, ROUND(CAST(score AS DOUBLE), 4) AS score_r
 FROM scored_{qid} ORDER BY score DESC, doc_id LIMIT {k})"""
        )
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def fuzzy_suggest_sql(
    specs: list[tuple[str, str, int]],
    max_edits: int = 1,
    non_fuzzy_prefix: int = 1,
    min_fuzzy_length: int = 3,
    relation: str = "documents",
) -> str:
    """FuzzySuggester oracle: (query_id, rank, term, weight).

    A dictionary term matches when its first non_fuzzy_prefix chars equal
    the key's and SOME prefix of it is within max_edits (Damerau) of the
    key past that shared prefix; keys shorter than min_fuzzy_length allow
    zero edits (FuzzySuggester.toLevenshteinAutomata). Since distance >=
    length difference, only prefix lengths within max_edits of len(key)
    are enumerated. Rank: exact key first, weight (ttf) desc, term asc."""
    rows = []
    for qid, key, n in specs:
        me = (
            0
            if (len(key) <= non_fuzzy_prefix or len(key) < min_fuzzy_length)
            else max_edits
        )
        lit = key.replace("'", "''")
        rows.append(f"('{qid}', '{lit}', {n}, {me}, {non_fuzzy_prefix})")
    vals = ",".join(rows)
    return f"""WITH {base_ctes(relation)},
td AS (SELECT term, count(*) AS weight FROM tok GROUP BY term),
p(query_id, key, n, me, nfp) AS (VALUES {vals}),
pl AS (SELECT p.query_id, p.key, p.n, p.me, p.nfp, t.term, t.weight,
              unnest(generate_series(greatest(p.nfp, length(p.key) - p.me),
                                     least(length(t.term), length(p.key) + p.me))) AS plen
       FROM p JOIN td t ON substr(t.term, 1, p.nfp) = substr(p.key, 1, p.nfp)),
m AS (SELECT query_id, key, n, term, weight,
             min(damerau_levenshtein(substr(term, nfp + 1, plen - nfp),
                                     substr(key, nfp + 1, length(key)))) AS pd,
             max(me) AS me
      FROM pl GROUP BY query_id, key, n, nfp, term, weight),
r AS (SELECT query_id, term, weight, n,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY (term = key) DESC, weight DESC, term) AS rank
      FROM m WHERE pd <= me)
SELECT query_id, CAST(rank AS BIGINT) AS rank, term, CAST(weight AS BIGINT) AS weight
FROM r WHERE rank <= n"""


def freetext_suggest_sql(
    specs: list[tuple[str, str, int]], relation: str = "documents"
) -> str:
    """FreeTextSuggester oracle (bigram stupid backoff, ALPHA = 0.4):
    (query_id, rank, suggestion, score_r).

    Python precomputes each key's analyzed shape (FreeTextSuggester.lookup
    token bookkeeping): context token (NULL when the key has a single
    unfinished token), last-token fragment, whether the unigram model is
    skipped (trailing separator upgrade), and the unigram-stage backoff
    (1.0 when the bigram stage was skipped for lack of input, else ALPHA —
    the reference multiplies after BOTH a processed order and a
    prefix-miss). Per order the top-n candidates rank count desc / gram
    asc; the unigram stage excludes last tokens the bigram stage accepted
    (the seen set) BEFORE ranking. score = (backoff * count) /
    contextCount in DOUBLE, contextCount = the context's unigram count or
    total token count."""
    rows = []
    for qid, key, n in specs:
        toks = key.split()
        trailing = key != key.rstrip()
        if not toks:
            continue
        if trailing:
            ctx, frag, skip_uni = toks[-1], "", True
        elif len(toks) >= 2:
            ctx, frag, skip_uni = toks[-2], toks[-1], False
        else:
            ctx, frag, skip_uni = None, toks[-1], False
        ub = 1.0 if ctx is None else 0.4
        ctx_sql = "NULL" if ctx is None else f"'{ctx}'"
        rows.append(
            f"('{qid}', {ctx_sql}, '{frag}', {n}, {str(skip_uni).lower()}, {ub!r})"
        )
    vals = ",".join(rows)
    return f"""WITH
tokp AS (SELECT doc_id,
                unnest(string_split(text, ' ')) AS term,
                unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
         FROM {relation}),
uni AS (SELECT term, count(*) AS cnt FROM tokp GROUP BY term),
tot AS (SELECT count(*) AS c FROM tokp),
big AS (SELECT w1, w2, count(*) AS cnt
        FROM (SELECT term AS w1,
                     lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
              FROM tokp)
        WHERE w2 IS NOT NULL GROUP BY w1, w2),
p(query_id, ctx, frag, n, skip_uni, ub) AS (VALUES {vals}),
bcand AS (SELECT p.query_id, p.n, b.w1 || ' ' || b.w2 AS gram, b.w2 AS last_tok,
                 (CAST(1.0 AS DOUBLE) * CAST(b.cnt AS DOUBLE))
                   / CAST(uc.cnt AS DOUBLE) AS score,
                 row_number() OVER (PARTITION BY p.query_id
                                    ORDER BY b.cnt DESC, b.w2) AS rk
          FROM p
          JOIN big b ON b.w1 = p.ctx AND starts_with(b.w2, p.frag)
          JOIN uni uc ON uc.term = p.ctx),
btop AS (SELECT * FROM bcand WHERE rk <= n),
ucand AS (SELECT p.query_id, p.n, u.term AS gram,
                 (CAST(p.ub AS DOUBLE) * CAST(u.cnt AS DOUBLE))
                   / CAST((SELECT c FROM tot) AS DOUBLE) AS score,
                 row_number() OVER (PARTITION BY p.query_id
                                    ORDER BY u.cnt DESC, u.term) AS rk
          FROM p
          JOIN uni u ON NOT p.skip_uni AND starts_with(u.term, p.frag)
          WHERE NOT EXISTS (SELECT 1 FROM btop bt
                            WHERE bt.query_id = p.query_id
                              AND bt.last_tok = u.term)),
utop AS (SELECT query_id, n, gram, score FROM ucand WHERE rk <= n),
allr AS (SELECT query_id, n, gram, score FROM btop
         UNION ALL SELECT query_id, n, gram, score FROM utop),
r AS (SELECT query_id, gram, score, n,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, gram) AS rank
      FROM allr)
SELECT query_id, CAST(rank AS BIGINT) AS rank, gram AS suggestion,
       ROUND(score, 9) AS score_r
FROM r WHERE rank <= n"""


def suggest_infix_sql(
    specs: list[tuple[str, str, int]], title_tokens: int,
    relation: str = "documents",
) -> str:
    """AnalyzingInfixSuggester oracle: (query_id, rank, doc_id, suggestion,
    weight). A suggestion (the title_tokens-token title, weight = n_chars)
    matches when every query token but the last occurs EXACTLY among its
    tokens and the last occurs as a token PREFIX (LIKE 'q%' at a token
    start); ranked weight desc, doc_id asc (suggest.py InfixSuggester)."""
    ctes = [f"""
sugg AS (SELECT doc_id,
                array_to_string(list_slice(string_split(text, ' '), 1, {title_tokens}), ' ') AS s,
                n_chars AS w
         FROM {relation})"""]
    selects = []
    for qid, q, n in specs:
        toks = q.split()
        conds = [
            "list_contains(string_split(s, ' '), '{}')".format(t.replace("'", "''"))
            for t in toks[:-1]
        ]
        last = toks[-1].replace("'", "''")
        conds.append(f"(s LIKE '{last}%' OR s LIKE '% {last}%')")
        selects.append(
            f"""(SELECT '{qid}' AS query_id,
        CAST(row_number() OVER (ORDER BY w DESC, doc_id) AS BIGINT) AS rank,
        doc_id, s AS suggestion, CAST(w AS BIGINT) AS weight
 FROM sugg WHERE {" AND ".join(conds)}
 ORDER BY w DESC, doc_id LIMIT {n})"""
        )
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def spellcheck_sql(
    specs: list[tuple[str, str, int]], relation: str = "documents"
) -> str:
    """DirectSpellChecker oracle (defaults: maxEdits=2 Damerau, minPrefix=1,
    accuracy=0.5, SUGGEST_WHEN_NOT_IN_INDEX): specs = (query_id, text, n).

    Mirrors search/suggest.py bit-for-bit: candidates share the first
    character, unrestricted damerau_levenshtein <= 2, score =
    FLOAT(1.0) - FLOAT(ed)/FLOAT(min(len(term), len(query))) (the
    FuzzyTermsEnum.java:266-270 internal similarity), kept at
    score >= 0.5, ranked score desc / df desc / term asc
    (SuggestWordScoreComparator.java)."""
    vals = ",".join(f"('{qid}', '{q}', {n})" for qid, q, n in specs)
    return f"""WITH {base_ctes(relation)},
td AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
q(query_id, qt, n) AS (VALUES {vals}),
qdf AS (SELECT q.query_id, q.qt, q.n,
               coalesce((SELECT df FROM td WHERE td.term = q.qt), 0) AS qdf
        FROM q),
cand AS (
  SELECT query_id, qt, n, t.term, t.df,
         damerau_levenshtein(qt, t.term) AS ed
  FROM qdf q JOIN td t
    ON substr(t.term, 1, 1) = substr(q.qt, 1, 1) AND t.term <> q.qt
  WHERE q.qdf = 0
    AND abs(length(t.term) - length(q.qt)) <= 2
    AND damerau_levenshtein(q.qt, t.term) <= 2),
scored AS (
  SELECT query_id, n, term, df,
         CAST(1.0 AS FLOAT)
           - CAST(ed AS FLOAT)
             / CAST(least(length(term), length(qt)) AS FLOAT) AS score
  FROM cand),
ranked AS (
  SELECT query_id, n, term, df, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, df DESC, term) AS rank
  FROM scored WHERE score >= CAST(0.5 AS FLOAT))
SELECT query_id, CAST(rank AS BIGINT) AS rank, term,
       ROUND(CAST(score AS DOUBLE), 4) AS score_r, CAST(df AS BIGINT) AS freq
FROM ranked WHERE rank <= n"""


def blockjoin_topk_sql(
    specs: list[tuple[str, str, str, int]],
    chunk_w: int,
    parent_text: str = "pdoc",
    relation: str = "documents",
) -> str:
    """ToParentBlockJoinQuery oracle: rebuild the block corpus (chunk
    children + one parent marker row per doc) in SQL, score children with
    the standard BM25 CTEs over THAT corpus (collection stats include the
    parent rows, as the variant index's manifest does), then aggregate per
    parent. Total/Avg replicate the engine's SEQUENTIAL double
    accumulation in child-doc order via list_reduce (a plain SUM's
    ordering is nondeterministic and can differ by an ulp); Min/Max are
    order-free. Final cast to FLOAT mirrors the (float) narrowing in
    ToParentBlockJoinQuery.setScoreAndFreq."""
    w = chunk_w
    terms = sorted({t for _, t, _, _ in specs})
    bj = f"""
bj AS (
  SELECT doc_id AS orig_doc, chunk_id,
         doc_id * 1000000 + chunk_id AS doc_id,
         array_to_string(arr[chunk_id * {w} + 1 : chunk_id * {w} + {w}], ' ') AS text
  FROM (SELECT doc_id, arr,
               unnest(generate_series(0, greatest((len(arr) + {w} - 1) // {w}, 1) - 1)) AS chunk_id
        FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM {relation}))
  UNION ALL
  SELECT doc_id, 999999, doc_id * 1000000 + 999999,
         '{parent_text} pl_' || lang FROM {relation})"""
    ctes = [bj, base_ctes("bj")]
    ctes += [term_leaf_ctes(t) for t in terms]
    selects = []
    for qid, t, mode, k in specs:
        ti = _ident(t)
        if mode in ("total", "avg"):
            agg = (
                f"list_reduce(list(CAST(s.s AS DOUBLE) ORDER BY b.chunk_id), "
                f"(acc, x) -> acc + x)"
            )
            if mode == "avg":
                agg = f"({agg}) / count(*)"
        elif mode == "max":
            agg = "max(CAST(s.s AS DOUBLE))"
        elif mode == "min":
            agg = "min(CAST(s.s AS DOUBLE))"
        else:
            raise ValueError(mode)
        ctes.append(f"""
agg_{qid} AS (SELECT b.orig_doc, CAST({agg} AS FLOAT) AS score
              FROM s_{ti} s JOIN bj b USING (doc_id)
              GROUP BY b.orig_doc)""")
        selects.append(f"""(SELECT '{qid}' AS query_id,
        CAST(row_number() OVER (ORDER BY score DESC, orig_doc) AS BIGINT) AS rank,
        orig_doc AS doc_id, ROUND(CAST(score AS DOUBLE), 4) AS score_r
 FROM agg_{qid} ORDER BY score DESC, orig_doc LIMIT {k})""")
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def tochild_topk_sql(
    specs: list[tuple[str, tuple, int]],
    chunk_w: int,
    parent_text: str = "pdoc",
    relation: str = "documents",
) -> str:
    """ToChildBlockJoinQuery oracle: children carry their parent row's
    BM25 disjunction score verbatim (ToChildBlockJoinScorer.score returns
    parentScore). Parent rows are the '<parent_text> pl_<lang>' markers of
    the block corpus; the score CTEs run over that corpus so collection
    stats match the variant index. Rank ties break by child docID, i.e.
    (orig_doc, chunk_id)."""
    w = chunk_w
    terms = sorted({t for _, ts, _ in specs for t in ts})
    bj = f"""
bj AS (
  SELECT doc_id AS orig_doc, chunk_id,
         doc_id * 1000000 + chunk_id AS doc_id,
         array_to_string(arr[chunk_id * {w} + 1 : chunk_id * {w} + {w}], ' ') AS text
  FROM (SELECT doc_id, arr,
               unnest(generate_series(0, greatest((len(arr) + {w} - 1) // {w}, 1) - 1)) AS chunk_id
        FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM {relation}))
  UNION ALL
  SELECT doc_id, 999999, doc_id * 1000000 + 999999,
         '{parent_text} pl_' || lang FROM {relation})"""
    ctes = [bj, base_ctes("bj")]
    ctes += [term_leaf_ctes(t) for t in terms]
    selects = []
    for qid, ts, k in specs:
        ctes.append(disjunction_scored_cte(qid, list(ts)))
        selects.append(f"""(SELECT '{qid}' AS query_id,
        CAST(row_number() OVER (ORDER BY s.score DESC, c.orig_doc, c.chunk_id) AS BIGINT) AS rank,
        c.orig_doc AS doc_id, c.chunk_id, ROUND(CAST(s.score AS DOUBLE), 4) AS score_r
 FROM bj c
 JOIN bj p ON p.orig_doc = c.orig_doc AND p.chunk_id = 999999
 JOIN scored_{qid} s ON s.doc_id = p.doc_id
 WHERE c.chunk_id <> 999999
 ORDER BY s.score DESC, c.orig_doc, c.chunk_id LIMIT {k})""")
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def payload_topk_sql(
    specs: list[tuple[str, str, str, bool, int]],
    relation: str = "documents",
) -> str:
    """PayloadScoreQuery oracle over the payload fixture (flagship.
    decorate_payload_texts): token at position pos carries payload
    ((3*len + pos) % 8) * 0.25 unless pos % 3 == 2 (no payload -> factor
    1.0, counted — s84 PayloadScoreQuery.collectLeaf counts every matching
    position). Per-doc combine per PayloadFunction; all factors are
    multiples of 0.25 so DOUBLE aggregation + one FLOAT cast equals the
    engine's float32 arithmetic. include_span_score multiplies the BM25
    term leaf (term_leaf_ctes — float32-exact)."""
    terms = sorted({t for _, t, _, _, _ in specs})
    ctes = [base_ctes(relation)]
    ctes.append(f"""
ptok AS (
  SELECT doc_id, i - 1 AS pos, arr[i] AS term
  FROM (SELECT doc_id, arr, unnest(generate_series(1, len(arr))) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM {relation}))),
pfac AS (
  SELECT doc_id, term,
         CASE WHEN pos % 3 <> 2
              THEN CAST(((3 * length(term) + pos) % 8) * 0.25 AS FLOAT)
              ELSE CAST(1.0 AS FLOAT) END AS factor
  FROM ptok)""")
    ctes += [term_leaf_ctes(t) for t in terms]
    for t in terms:
        ti = _ident(t)
        lit = t.replace("'", "''")
        ctes.append(f"""
pagg_{ti} AS (SELECT doc_id,
                     CAST(min(factor) AS FLOAT) AS f_min,
                     CAST(max(factor) AS FLOAT) AS f_max,
                     CAST(SUM(CAST(factor AS DOUBLE)) AS FLOAT) AS f_sum,
                     CAST(SUM(CAST(factor AS DOUBLE)) / count(*) AS FLOAT) AS f_average
              FROM pfac WHERE term = '{lit}' GROUP BY doc_id)""")
    selects = []
    for qid, t, func, inc, k in specs:
        ti = _ident(t)
        base = f"p.f_{func}"
        score = f"CAST(s.s * {base} AS FLOAT)" if inc else f"{base}"
        join = f"JOIN s_{ti} s USING (doc_id)" if inc else ""
        selects.append(f"""(SELECT '{qid}' AS query_id,
        CAST(row_number() OVER (ORDER BY {score} DESC, doc_id) AS BIGINT) AS rank,
        doc_id, ROUND(CAST({score} AS DOUBLE), 4) AS score_r
 FROM pagg_{ti} p {join} ORDER BY {score} DESC, doc_id LIMIT {k})""")
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def interval_topk_sql(
    specs: list[tuple[str, str, tuple, int | None, int]],
    relation: str = "documents",
) -> str:
    """IntervalQuery oracle. Minimal intervals = the containment antichain
    of all ordered/unordered matches (what the lazy Vigna iterators
    enumerate — duel-pinned against the engine's iterators by
    tests/test_intervals.py); an OR leaf over terms is exactly the union
    of their position sets (width-0 singletons form their own antichain);
    maxgaps filters the antichain (2-term ordered: gaps = e - s - 1);
    containing / not_containing filter the big side's antichain by an
    EXISTS over the small side; contained_by keeps small positions covered
    by a big interval. Per-doc freq = sum 1/max(span - minExtent + 1, 1);
    score = saturation pivot=1 (IntervalScoreFunction.java:66-75)."""
    ctes = [f"""iv_tpos AS (
  SELECT doc_id, i - 1 AS pos, arr[i] AS term
  FROM (SELECT doc_id, arr, unnest(generate_series(1, len(arr))) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM {relation})))"""]
    selects = []

    def leaf_cte(qid: str, i: int, leaf_terms: tuple) -> str:
        lits = ", ".join("'" + t.replace("'", "''") + "'" for t in leaf_terms)
        return (f"p_{qid}_{i} AS (SELECT doc_id, pos FROM iv_tpos "
                f"WHERE term IN ({lits}))")

    def antichain_ctes(qid: str, leaves: list[tuple], ordered: bool) -> None:
        """Emit p_/mm_/min_ CTEs for the ordered/unordered antichain over
        the given leaves (each leaf = a term set = unioned positions)."""
        kk = len(leaves)
        for i, lt in enumerate(leaves):
            ctes.append(leaf_cte(qid, i, lt))
        joins = [f"p_{qid}_0 t0"]
        conds = []
        for i in range(1, kk):
            joins.append(f"p_{qid}_{i} t{i}")
            if ordered:
                conds.append(f"t{i}.doc_id = t0.doc_id AND t{i}.pos > t{i-1}.pos")
            else:
                conds.append(f"t{i}.doc_id = t0.doc_id")
        cond = " AND ".join(conds) if conds else "TRUE"
        if ordered:
            m = (f"SELECT t0.doc_id, t0.pos AS s, t{kk-1}.pos AS e "
                 f"FROM {', '.join(joins)} WHERE {cond}")
        else:
            least = "least(" + ", ".join(f"t{i}.pos" for i in range(kk)) + ")"
            great = "greatest(" + ", ".join(f"t{i}.pos" for i in range(kk)) + ")"
            m = (f"SELECT t0.doc_id, {least} AS s, {great} AS e "
                 f"FROM {', '.join(joins)} WHERE {cond}")
        ctes.append(f"""
mm_{qid} AS (SELECT DISTINCT doc_id, s, e FROM ({m})),
min_{qid} AS (SELECT * FROM mm_{qid} m WHERE NOT EXISTS (
   SELECT 1 FROM mm_{qid} m2 WHERE m2.doc_id = m.doc_id
     AND m2.s >= m.s AND m2.e <= m.e AND (m2.s > m.s OR m2.e < m.e)))""")

    for qid, kind, terms, gaps, k in specs:
        if kind in ("ordered", "unordered", "maxgaps"):
            kk = len(terms)
            antichain_ctes(qid, [(t,) for t in terms], kind != "unordered")
            gap_filter = f" WHERE e - s - 1 <= {gaps}" if kind == "maxgaps" else ""
            src_cte = f"min_{qid}{gap_filter}"
        elif kind == "or_ordered":
            kk = 2
            antichain_ctes(qid, [(terms[0],), tuple(terms[1:])], ordered=True)
            src_cte = f"min_{qid}"
        elif kind in ("containing", "not_containing"):
            kk = 2
            antichain_ctes(qid, [(terms[0],), (terms[1],)], ordered=False)
            ctes.append(leaf_cte(qid, "f", (terms[2],)))
            neg = "NOT " if kind == "not_containing" else ""
            src_cte = (f"min_{qid} m WHERE {neg}EXISTS (SELECT 1 FROM p_{qid}_f c "
                       f"WHERE c.doc_id = m.doc_id AND c.pos BETWEEN m.s AND m.e)")
        elif kind == "contained_by":
            kk = 1
            antichain_ctes(qid, [(terms[1],), (terms[2],)], ordered=False)
            ctes.append(leaf_cte(qid, "s", (terms[0],)))
            src_cte = (f"(SELECT doc_id, pos AS s, pos AS e FROM p_{qid}_s p "
                       f"WHERE EXISTS (SELECT 1 FROM min_{qid} m "
                       f"WHERE m.doc_id = p.doc_id AND m.s <= p.pos AND m.e >= p.pos)) q")
        else:
            raise ValueError(kind)
        # freq replicates IntervalScorer's SEQUENTIAL float32 accumulation
        # (interval_freq): per-interval term = f32(1)/f32(d), folded left
        # in start order with a float32 round at every step — a DOUBLE sum
        # cast once can differ by an ulp and flip a 4-dp rounding/rank
        ctes.append(f"""
f_{qid} AS (SELECT doc_id,
                   list_reduce(
                     list(CAST(1.0 AS FLOAT)
                          / CAST(greatest(e - s + 1 - {kk} + 1, 1) AS FLOAT)
                          ORDER BY s),
                     (acc, x) -> CAST(acc + x AS FLOAT)) AS freq
            FROM {src_cte} GROUP BY doc_id),
sc_{qid} AS (SELECT doc_id,
                    CAST(1.0 AS FLOAT)
                    - CAST(1.0 AS FLOAT) / (CAST(1.0 AS FLOAT) + freq) AS score
             FROM f_{qid})""")
        selects.append(f"""(SELECT '{qid}' AS query_id,
        CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
        doc_id, ROUND(CAST(score AS DOUBLE), 4) AS score_r
 FROM sc_{qid} ORDER BY score DESC, doc_id LIMIT {k})""")
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def classify_nb_sql(input_docs: tuple[int, ...],
                    relation: str = "documents") -> str:
    """SimpleNaiveBayesClassifier oracle (SimpleNaiveBayesClassifier.java:
    136-309): per class clVal = ln(dfc) - ln(docsWithClass) + ordered sum
    over the input tokens of ln((hits+1) / (avgUnique*dfc +
    docsWithClass)), then the log-sum-exp softmax folded in clVal-DESC
    order. Double math with the engine's operation order throughout."""
    ids = ",".join(str(d) for d in input_docs)
    return f"""WITH
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM {relation}),
dt AS (SELECT DISTINCT doc_id, term FROM tok),
gs AS (SELECT CAST((SELECT count(*) FROM dt) AS DOUBLE)
            / (SELECT count(*) FROM {relation}
               WHERE len(string_split(text, ' ')) > 0) AS avg_unique,
            (SELECT count(*) FROM {relation}
             WHERE lang IS NOT NULL AND lang <> '') AS dwc),
cls AS (SELECT lang, count(*) AS dfc FROM {relation}
        WHERE lang IS NOT NULL AND lang <> '' GROUP BY lang),
itok AS (SELECT d.doc_id AS input_doc,
                unnest(string_split(d.text, ' ')) AS term,
                unnest(generate_series(1, len(string_split(d.text, ' ')))) AS pos
         FROM {relation} d WHERE d.doc_id IN ({ids})),
hits AS (SELECT d.lang, dt.term, count(*) AS h
         FROM dt JOIN {relation} d USING (doc_id)
         WHERE dt.term IN (SELECT DISTINCT term FROM itok)
           AND d.lang IS NOT NULL AND d.lang <> ''
         GROUP BY d.lang, dt.term),
raw AS (SELECT i.input_doc, c.lang,
               ln(CAST(c.dfc AS DOUBLE))
                 - ln(CAST((SELECT dwc FROM gs) AS DOUBLE))
                 + sum(ln((COALESCE(h.h, 0) + 1.0)
                          / ((SELECT avg_unique FROM gs) * c.dfc
                             + (SELECT dwc FROM gs)))
                       ORDER BY i.pos) AS clval
        FROM itok i CROSS JOIN cls c
        LEFT JOIN hits h ON h.lang = c.lang AND h.term = i.term
        GROUP BY i.input_doc, c.lang, c.dfc),
sm AS (SELECT input_doc, max(clval) AS smax FROM raw GROUP BY input_doc),
lg AS (SELECT r.input_doc,
              s.smax + ln(sum(exp(r.clval - s.smax)
                              ORDER BY r.clval DESC, r.lang)) AS loga
       FROM raw r JOIN sm s USING (input_doc)
       GROUP BY r.input_doc, s.smax)
SELECT r.input_doc,
       CAST(row_number() OVER (PARTITION BY r.input_doc
                               ORDER BY r.clval DESC, r.lang) AS BIGINT) AS rank,
       r.lang, ROUND(exp(r.clval - l.loga), 6) AS prob_r
FROM raw r JOIN lg l USING (input_doc)
ORDER BY r.input_doc, rank"""


def classify_knn_sql(input_docs: tuple[int, ...], k: int,
                     min_tf: int = 2, min_df: int = 5, max_terms: int = 25,
                     relation: str = "documents") -> str:
    """KNearestNeighborClassifier oracle (KNearestNeighborClassifier.java:
    192-238): the MLT interesting-term selection + float32 BM25 top-k of
    mlt_topk_sql per input doc, then the class vote — per class count and
    sum(score/maxScore) folded in rank order, score = (count *
    (boostSum/count)) / k, scaled (score*k)/sumdoc when sumdoc < k."""
    ninv = (
        f"({ONE_F} / ({K1_F} * (({ONE_F} - {B_F})"
        f" + ({B_F} * CAST(nl.nlen AS FLOAT)) / (SELECT avgdl FROM cs))))"
    )
    ctes = [base_ctes(relation)]
    selects = []
    for d in input_docs:
        ctes.append(f"""
qtf_{d} AS (SELECT x AS term, count(*) AS tf
        FROM (SELECT unnest(string_split(
                 (SELECT text FROM {relation} WHERE doc_id = {d}), ' ')) AS x)
        GROUP BY x HAVING count(*) >= {min_tf}),
qdf_{d} AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
        WHERE term IN (SELECT term FROM qtf_{d}) GROUP BY term),
sel_{d} AS (SELECT q.term, dd.df,
               q.tf * (1 + ln((SELECT n_docs FROM cs) / (dd.df + 1.0))) AS mscore
        FROM qtf_{d} q JOIN qdf_{d} dd USING (term)
        WHERE dd.df >= {min_df}
        ORDER BY mscore DESC, q.term LIMIT {max_terms}),
w_{d} AS (SELECT term,
             CAST(ln(1 + ((SELECT n_docs FROM cs) - df + 0.5) / (df + 0.5)) AS FLOAT) AS w
      FROM sel_{d}),
leaf_{d} AS (SELECT tk.doc_id,
                w.w - w.w / ({ONE_F} + CAST(tk.freq AS FLOAT) * {ninv}) AS s
         FROM (SELECT doc_id, term, count(*) AS freq FROM tok
               WHERE term IN (SELECT term FROM sel_{d}) GROUP BY doc_id, term) tk
         JOIN w_{d} w USING (term) JOIN normlen nl USING (doc_id)),
topk_{d} AS (SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
                    doc_id, CAST(score AS DOUBLE) AS s
             FROM (SELECT doc_id, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
                   FROM leaf_{d} GROUP BY doc_id)
             ORDER BY score DESC, doc_id LIMIT {k}),
mx_{d} AS (SELECT max(s) AS maxs FROM topk_{d}),
cl_{d} AS (SELECT t.rank, t.s, dd.lang
           FROM topk_{d} t JOIN {relation} dd USING (doc_id)),
v_{d} AS (SELECT lang, count(*) AS cnt,
                 sum(s / (SELECT maxs FROM mx_{d}) ORDER BY rank) AS bsum
          FROM cl_{d} GROUP BY lang),
tot_{d} AS (SELECT sum(cnt) AS sumdoc FROM v_{d})""")
        selects.append(f"""(SELECT CAST({d} AS BIGINT) AS input_doc, lang, cnt,
        ROUND(CASE WHEN (SELECT sumdoc FROM tot_{d}) < {k}
              THEN (((cnt * (bsum / cnt)) / CAST({k} AS DOUBLE)) * {k})
                   / (SELECT sumdoc FROM tot_{d})
              ELSE (cnt * (bsum / cnt)) / CAST({k} AS DOUBLE) END, 6) AS score_r
 FROM v_{d})""")
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def classify_bm25nb_sql(input_docs: tuple[int, ...],
                        relation: str = "documents") -> str:
    """BM25NBClassifier oracle (BM25NBClassifier.java:128-232): prior =
    ln(top-1 BM25 score of the class term on the single-token lang field:
    dl=1, tf=1, avgdl=1, df=class doc count, N=docs with lang) and
    P(w|c) = top-1 score of `MUST lang:c SHOULD text:w` = float32(cls_leaf
    + max body leaf over docs of the class), cls_leaf alone when no class
    doc contains w. Leaf kernels are the engine's float32 BM25 op-for-op;
    the boolean fold is the double-sum-cast-once convention."""
    ids = ",".join(str(d) for d in input_docs)
    # lang-field leaf: nlen=1, avgdl=1.0, tf=1 -> w - w/(1f + 1f * 1f/(k1*((1f-b) + (b*1f)/1f)))
    cls_ninv = (
        f"({ONE_F} / ({K1_F} * (({ONE_F} - {B_F})"
        f" + ({B_F} * {ONE_F}) / {ONE_F})))"
    )
    ninv = (
        f"({ONE_F} / ({K1_F} * (({ONE_F} - {B_F})"
        f" + ({B_F} * CAST(nl.nlen AS FLOAT)) / (SELECT avgdl FROM cs))))"
    )
    return f"""WITH {base_ctes(relation)},
nlang AS (SELECT count(*) AS n FROM {relation}
          WHERE lang IS NOT NULL AND lang <> ''),
cls AS (SELECT lang, count(*) AS dfc FROM {relation}
        WHERE lang IS NOT NULL AND lang <> '' GROUP BY lang),
clsleaf AS (SELECT lang, dfc,
                   w - w / ({ONE_F} + CAST(1 AS FLOAT) * {cls_ninv}) AS s
            FROM (SELECT lang, dfc,
                         CAST(ln(1 + ((SELECT n FROM nlang) - dfc + 0.5)
                                 / (dfc + 0.5)) AS FLOAT) AS w
                  FROM cls)),
itok AS (SELECT d.doc_id AS input_doc,
                unnest(string_split(d.text, ' ')) AS term,
                unnest(generate_series(1, len(string_split(d.text, ' ')))) AS pos
         FROM {relation} d WHERE d.doc_id IN ({ids})),
vterms AS (SELECT DISTINCT term FROM itok),
vw AS (SELECT term,
              CAST(ln(1 + ((SELECT n_docs FROM cs) - df + 0.5)
                      / (df + 0.5)) AS FLOAT) AS w
       FROM (SELECT term, count(DISTINCT doc_id) AS df FROM tok
             WHERE term IN (SELECT term FROM vterms) GROUP BY term)),
vleaf AS (SELECT tk.doc_id, tk.term,
                 w.w - w.w / ({ONE_F} + CAST(tk.freq AS FLOAT) * {ninv}) AS s
          FROM (SELECT doc_id, term, count(*) AS freq FROM tok
                WHERE term IN (SELECT term FROM vterms)
                GROUP BY doc_id, term) tk
          JOIN vw w USING (term) JOIN normlen nl USING (doc_id)),
wmax AS (SELECT d.lang, l.term, max(CAST(l.s AS DOUBLE)) AS m
         FROM vleaf l JOIN {relation} d USING (doc_id)
         WHERE d.lang IS NOT NULL AND d.lang <> ''
         GROUP BY d.lang, l.term),
tp AS (SELECT c.lang, v.term,
              CASE WHEN m.m IS NULL THEN c.s
                   ELSE CAST(CAST(c.s AS DOUBLE) + m.m AS FLOAT) END AS p
       FROM clsleaf c CROSS JOIN vterms v
       LEFT JOIN wmax m ON m.lang = c.lang AND m.term = v.term),
raw AS (SELECT i.input_doc, c.lang,
               ln(CAST(c.s AS DOUBLE))
                 + sum(ln(CAST(t.p AS DOUBLE)) ORDER BY i.pos) AS clval
        FROM itok i CROSS JOIN clsleaf c
        JOIN tp t ON t.lang = c.lang AND t.term = i.term
        GROUP BY i.input_doc, c.lang, c.s),
sm AS (SELECT input_doc, max(clval) AS smax FROM raw GROUP BY input_doc),
lg AS (SELECT r.input_doc,
              s.smax + ln(sum(exp(r.clval - s.smax)
                              ORDER BY r.clval DESC, r.lang)) AS loga
       FROM raw r JOIN sm s USING (input_doc)
       GROUP BY r.input_doc, s.smax)
SELECT r.input_doc,
       CAST(row_number() OVER (PARTITION BY r.input_doc
                               ORDER BY r.clval DESC, r.lang) AS BIGINT) AS rank,
       r.lang, ROUND(exp(r.clval - l.loga), 6) AS prob_r
FROM raw r JOIN lg l USING (input_doc)
ORDER BY r.input_doc, rank"""


def percolate_sql(relation: str = "documents") -> str:
    """Monitor-module percolation oracle: the exact match set of each
    registered query in pipelines/monitor.py MONITOR_QUERIES, written as
    containment/position predicates (the presearcher is pruning-only and
    must not change results). title = the first TITLE_TOKENS body tokens
    (sources/pages.py convention)."""
    from ..sources.pages import TITLE_TOKENS

    has = (
        "SELECT DISTINCT doc_id FROM tok WHERE term = '{}'"
    )
    blocks = [
        f"(SELECT doc_id, 'q_term' AS query_id FROM ({has.format('hash')}))",
        f"""(SELECT doc_id, 'q_and' AS query_id FROM ({has.format('key')})
  WHERE doc_id IN ({has.format('table')}))""",
        f"""(SELECT DISTINCT doc_id, 'q_or' AS query_id FROM tok
  WHERE term IN ('window', 'stream'))""",
        f"""(SELECT doc_id, 'q_not' AS query_id FROM ({has.format('scan')})
  WHERE doc_id NOT IN ({has.format('merge')}))""",
        """(SELECT DISTINCT t1.doc_id, 'q_phrase' AS query_id
  FROM tok t1 JOIN tok t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
  WHERE t1.term = 'batch' AND t2.term = 'batch')""",
        f"""(SELECT DISTINCT doc_id, 'q_title' AS query_id FROM tok
  WHERE term = 'key' AND pos <= {TITLE_TOKENS})""",
        """(SELECT DISTINCT doc_id, 'q_prefix' AS query_id FROM tok
  WHERE term LIKE 'wind%')""",
        f"(SELECT doc_id, 'q_mix' AS query_id FROM ({has.format('key')}))",
    ]
    return f"""WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
  FROM {relation})
""" + "\nUNION ALL\n".join(blocks)


def facet_assoc_sql(term: str, relation: str = "documents") -> str:
    """Association-facet oracle: per "source/lang" taxonomy path, the sum
    of doc lengths (the int association value) over docs matching
    ``term``."""
    return f"""WITH {base_ctes(relation)}
SELECT d.source || '/' || d.lang AS path,
       CAST(SUM(dl.dl) AS BIGINT) AS total
FROM {relation} d JOIN dl ON dl.doc_id = d.doc_id
WHERE EXISTS (SELECT 1 FROM tok t WHERE t.doc_id = d.doc_id AND t.term = '{term}')
GROUP BY d.source, d.lang"""


def feature_topk_sql(
    specs: list[tuple[str, str, float, float, float]], k: int,
    relation: str = "documents",
) -> str:
    """FeatureField oracle (FeatureField.java:229-400): score_hint is the
    feature; the freq-encoding round-trip keeps 9 significant bits, which
    for integer features v (1 <= v < 2^52) is exact double arithmetic:
    f = floor(v / 2^e * 256) / 256 * 2^e with e = floor(log2(v)). Each
    function mirrors the engine's float32/double op order."""
    import math

    blocks = []
    # score_hint is derived (pages_from_documents: NULL iff doc_id % 3 == 0,
    # else n_chars) — the same CASE mirror field_exists_sql uses
    feat = """sh AS (SELECT doc_id,
            CASE WHEN doc_id % 3 = 0 THEN NULL ELSE n_chars END AS score_hint
      FROM {rel}),
q AS (SELECT doc_id, CAST(score_hint AS DOUBLE) AS v,
             floor(log2(CAST(score_hint AS DOUBLE))) AS e
      FROM sh WHERE score_hint IS NOT NULL),
feat AS (SELECT doc_id,
                floor(v / pow(2, e) * 256) / 256 * pow(2, e) AS f
         FROM q)""".format(rel=relation)
    for qid, fn, pivot, a, boost in specs:
        if fn == "log":
            expr = (
                f"CAST(CAST({boost!r} AS DOUBLE)"
                f" * ln(CAST(CAST(CAST({a!r} AS FLOAT)"
                f" + CAST(f AS FLOAT) AS FLOAT) AS DOUBLE)) AS FLOAT)"
            )
        elif fn == "saturation":
            expr = (
                f"CAST(CAST({boost!r} AS FLOAT)"
                f" * CAST(CAST(1 AS FLOAT)"
                f" - CAST(CAST({pivot!r} AS FLOAT)"
                f" / CAST(CAST(f AS FLOAT) + CAST({pivot!r} AS FLOAT)"
                f" AS FLOAT) AS FLOAT) AS FLOAT) AS FLOAT)"
            )
        elif fn == "sigmoid":
            pp = math.pow(pivot, a)
            expr = (
                f"CAST(CAST({boost!r} AS DOUBLE)"
                f" * (1 - {pp!r} / (pow(CAST(f AS DOUBLE), {a!r})"
                f" + {pp!r})) AS FLOAT)"
            )
        else:
            raise ValueError(fn)
        blocks.append(f"""(SELECT '{qid}' AS query_id,
        CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
        doc_id, ROUND(CAST(score AS DOUBLE), 4) AS score_r
 FROM (SELECT doc_id, {expr} AS score FROM feat)
 ORDER BY score DESC, doc_id LIMIT {k})""")
    return "WITH " + feat + "\n" + "\nUNION ALL\n".join(blocks)


def covering_topk_sql(terms: tuple[str, ...], k: int,
                      relation: str = "documents") -> str:
    """CoveringQuery oracle (CoveringQuery.java:42): per doc, the count
    and double sum of matching float32 term leaves; keep docs whose count
    >= max(1, 1 + dl % 3) (the engine's min_expr over the length
    doc-values column); score = one float32 cast of the sum."""
    leaf_ctes = ",".join(term_leaf_ctes(t) for t in terms)
    union = "\nUNION ALL ".join(
        f"SELECT doc_id, s FROM s_{_ident(t)}" for t in terms
    )
    return f"""WITH {base_ctes(relation)},{leaf_ctes},
m AS (SELECT doc_id, count(*) AS cnt,
             CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
      FROM ({union}) GROUP BY doc_id),
kept AS (SELECT m.doc_id, m.score FROM m JOIN dl USING (doc_id)
         WHERE m.cnt >= greatest(1, 1 + dl.dl % 3))
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
       doc_id, ROUND(CAST(score AS DOUBLE), 4) AS score_r
FROM kept ORDER BY score DESC, doc_id LIMIT {k}"""


def rescored_topk_sql(first_terms: tuple[str, ...], rescore_term: str,
                      weight: float, first_k: int, top_n: int,
                      relation: str = "documents") -> str:
    """QueryRescorer oracle (QueryRescorer.java:175-186): first-pass BM25
    disjunction top first_k (score DESC, doc ASC), then combined =
    f32(double(first) + weight * double(second-term leaf)) when the
    rescore term matches, first unchanged otherwise; re-sorted, top_n."""
    leaf_ctes = ",".join(term_leaf_ctes(t)
                         for t in (*first_terms, rescore_term))
    union = "\nUNION ALL ".join(
        f"SELECT doc_id, s FROM s_{_ident(t)}" for t in first_terms
    )
    rt = _ident(rescore_term)
    return f"""WITH {base_ctes(relation)},{leaf_ctes},
first AS (SELECT doc_id, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
          FROM ({union}) GROUP BY doc_id
          ORDER BY score DESC, doc_id LIMIT {first_k}),
comb AS (SELECT f.doc_id,
                CASE WHEN r.s IS NULL THEN f.score
                     ELSE CAST(CAST(f.score AS DOUBLE)
                               + {weight!r} * CAST(r.s AS DOUBLE) AS FLOAT)
                END AS score
         FROM first f LEFT JOIN s_{rt} r USING (doc_id))
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
       doc_id, ROUND(CAST(score AS DOUBLE), 4) AS score_r
FROM comb ORDER BY score DESC, doc_id LIMIT {top_n}"""


def classify_nb_corpus_sql(relation: str = "documents") -> str:
    """Corpus-wide NB classification oracle: classify_nb_sql's math over
    EVERY doc's own text, argmax class only (rank = 1)."""
    return f"""WITH
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM {relation}),
dt AS (SELECT DISTINCT doc_id, term FROM tok),
gs AS (SELECT CAST((SELECT count(*) FROM dt) AS DOUBLE)
            / (SELECT count(*) FROM {relation}
               WHERE len(string_split(text, ' ')) > 0) AS avg_unique,
            (SELECT count(*) FROM {relation}
             WHERE lang IS NOT NULL AND lang <> '') AS dwc),
cls AS (SELECT lang, count(*) AS dfc FROM {relation}
        WHERE lang IS NOT NULL AND lang <> '' GROUP BY lang),
itok AS (SELECT d.doc_id AS input_doc,
                unnest(string_split(d.text, ' ')) AS term,
                unnest(generate_series(1, len(string_split(d.text, ' ')))) AS pos
         FROM {relation} d),
hits AS (SELECT d.lang, dt.term, count(*) AS h
         FROM dt JOIN {relation} d USING (doc_id)
         WHERE d.lang IS NOT NULL AND d.lang <> ''
         GROUP BY d.lang, dt.term),
raw AS (SELECT i.input_doc, c.lang,
               ln(CAST(c.dfc AS DOUBLE))
                 - ln(CAST((SELECT dwc FROM gs) AS DOUBLE))
                 + sum(ln((COALESCE(h.h, 0) + 1.0)
                          / ((SELECT avg_unique FROM gs) * c.dfc
                             + (SELECT dwc FROM gs)))
                       ORDER BY i.pos) AS clval
        FROM itok i CROSS JOIN cls c
        LEFT JOIN hits h ON h.lang = c.lang AND h.term = i.term
        GROUP BY i.input_doc, c.lang, c.dfc),
sm AS (SELECT input_doc, max(clval) AS smax FROM raw GROUP BY input_doc),
lg AS (SELECT r.input_doc,
              s.smax + ln(sum(exp(r.clval - s.smax)
                              ORDER BY r.clval DESC, r.lang)) AS loga
       FROM raw r JOIN sm s USING (input_doc)
       GROUP BY r.input_doc, s.smax)
SELECT input_doc AS doc_id, lang, prob_r FROM (
  SELECT r.input_doc, r.lang,
         ROUND(exp(r.clval - l.loga), 6) AS prob_r,
         row_number() OVER (PARTITION BY r.input_doc
                            ORDER BY r.clval DESC, r.lang) AS rk
  FROM raw r JOIN lg l USING (input_doc))
WHERE rk = 1 ORDER BY doc_id"""


def sort_rescored_topk_sql(first_terms: tuple[str, ...], first_k: int,
                           top_n: int, relation: str = "documents") -> str:
    """SortRescorer oracle: first-pass BM25 disjunction top first_k, then
    re-sorted by doc length DESC (tie: doc_id), first-pass score kept."""
    leaf_ctes = ",".join(term_leaf_ctes(t) for t in first_terms)
    union = "\nUNION ALL ".join(
        f"SELECT doc_id, s FROM s_{_ident(t)}" for t in first_terms
    )
    return f"""WITH {base_ctes(relation)},{leaf_ctes},
first AS (SELECT doc_id, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
          FROM ({union}) GROUP BY doc_id
          ORDER BY score DESC, doc_id LIMIT {first_k})
SELECT CAST(row_number() OVER (ORDER BY d.dl DESC, f.doc_id) AS BIGINT) AS rank,
       f.doc_id, d.dl AS dl, ROUND(CAST(f.score AS DOUBLE), 4) AS score_r
FROM first f JOIN dl d USING (doc_id)
ORDER BY d.dl DESC, f.doc_id LIMIT {top_n}"""


def diversified_topk_sql(terms: list[str], k: int, max_per_key: int,
                         relation: str = "documents") -> str:
    """DiversifiedTopDocsCollector oracle: keep each lang key's top
    max_per_key by (score desc, doc_id), then the global top-k — provably
    equal to the engine's greedy acceptance in global score order."""
    ctes = [base_ctes(relation)]
    ctes += [term_leaf_ctes(t) for t in sorted(set(terms))]
    ctes += [disjunction_scored_cte("dv", terms)]
    return (
        "WITH " + ",".join(ctes) + f""",
ranked AS (
  SELECT s.doc_id, d.lang, s.score,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY s.score DESC, s.doc_id) AS kr
  FROM scored_dv s JOIN {relation} d USING (doc_id))
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
       doc_id, lang, ROUND(CAST(score AS DOUBLE), 4) AS score_r
FROM ranked WHERE kr <= {max_per_key}
ORDER BY score DESC, doc_id LIMIT {k}"""
    )


def wordbreak_sql(
    break_specs: list[tuple[str, str, int]],
    combine_specs: list[tuple[str, str, int]],
    relation: str = "documents",
) -> str:
    """WordBreakSpellChecker oracle. Breaks: all 1-split (changes=1) and
    2-split (changes=2) decompositions of an out-of-dictionary input whose
    parts are all dictionary terms, ranked changes asc / summed df desc /
    suggestion asc. Combines: two adjacent words whose concatenation is a
    dictionary term, ranked df desc."""
    bvals = ",".join(f"('{q}', '{t}', {n})" for q, t, n in break_specs)
    cvals = ",".join(f"('{q}', '{t}', {n})" for q, t, n in combine_specs)
    return f"""WITH {base_ctes(relation)},
td AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
bq(query_id, qt, n) AS (VALUES {bvals}),
bq_oov AS (SELECT * FROM bq
           WHERE qt NOT IN (SELECT term FROM td)),
pos AS (SELECT CAST(i AS INTEGER) AS i FROM generate_series(1, 40) g(i)),
one AS (
  SELECT b.query_id, b.n,
         l.term || ' ' || r.term AS suggestion,
         1 AS changes, l.df + r.df AS freq_sum
  FROM bq_oov b
  JOIN pos p ON p.i <= length(b.qt) - 1
  JOIN td l ON l.term = substr(b.qt, 1, p.i)
  JOIN td r ON r.term = substr(b.qt, p.i + 1)),
two AS (
  SELECT b.query_id, b.n,
         l.term || ' ' || m.term || ' ' || r.term AS suggestion,
         2 AS changes, l.df + m.df + r.df AS freq_sum
  FROM bq_oov b
  JOIN pos pi ON pi.i <= length(b.qt) - 2
  JOIN pos pj ON pj.i > pi.i AND pj.i <= length(b.qt) - 1
  JOIN td l ON l.term = substr(b.qt, 1, pi.i)
  JOIN td m ON m.term = substr(b.qt, pi.i + 1, pj.i - pi.i)
  JOIN td r ON r.term = substr(b.qt, pj.i + 1)),
breaks AS (
  SELECT query_id, 'break' AS kind,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY changes, freq_sum DESC, suggestion) AS BIGINT) AS rank,
         suggestion, CAST(changes AS BIGINT) AS changes,
         CAST(freq_sum AS BIGINT) AS freq_sum, n
  FROM (SELECT * FROM one UNION ALL SELECT * FROM two)),
cq(query_id, qt, n) AS (VALUES {cvals}),
combines AS (
  SELECT c.query_id, 'combine' AS kind,
         CAST(1 AS BIGINT) AS rank,
         t.term AS suggestion, CAST(1 AS BIGINT) AS changes,
         CAST(t.df AS BIGINT) AS freq_sum, c.n
  FROM cq c JOIN td t ON t.term = replace(c.qt, ' ', ''))
SELECT query_id, kind, rank, suggestion, changes, freq_sum
FROM (SELECT * FROM breaks UNION ALL SELECT * FROM combines)
WHERE rank <= n"""


def _cp_slot_condition(tok: str) -> str:
    """SQL dictionary-membership condition for one complex-phrase token,
    mirroring queries.parse_complex_phrase token classification."""
    import re as _re

    tok = tok.lower()
    m = _re.fullmatch(r"(.+?)~(\d)?", tok)
    if "*" in tok or "?" in tok:
        like = tok.replace("*", "%").replace("?", "_").replace("'", "''")
        return f"term LIKE '{like}'"
    if m:
        base = m.group(1).replace("'", "''")
        edits = int(m.group(2)) if m.group(2) is not None else 2
        return f"levenshtein(term, '{base}') <= {edits}"
    lit = tok.replace("'", "''")
    return f"term = '{lit}'"


def complexphrase_topk_sql(
    specs: list[tuple[str, str, int]], relation: str = "documents"
) -> str:
    """ComplexPhraseQueryParser oracle: each slot's term set is expanded
    IN SQL from the corpus dictionary (LIKE for wildcards, levenshtein
    for fuzzies — the same plain-Levenshtein the engine's fuzzy expansion
    uses), then scored exactly like the MultiPhraseQuery oracle: phrase
    freq = alignment positions whose every slot matches, weight = float32
    of the double sum of per-term float32 idfs over the expanded union."""
    ctes = [base_ctes(relation)]
    ctes.append("""
td2 AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
wall AS (SELECT term,
                CAST(ln(1 + ((SELECT n_docs FROM cs) - df + 0.5) / (df + 0.5))
                     AS FLOAT) AS w
         FROM td2)""")
    selects = []
    for qid, phrase, k in specs:
        body = phrase.strip().strip('"')
        toks = body.split()
        for j, tok in enumerate(toks):
            ctes.append(
                f"""
slot_{qid}_{j} AS (SELECT term FROM td2 WHERE {_cp_slot_condition(tok)})"""
            )
        wsum = " + ".join(
            f"""COALESCE((SELECT SUM(CAST(w AS DOUBLE)) FROM wall
              WHERE term IN (SELECT term FROM slot_{qid}_{j})), 0)"""
            for j in range(len(toks))
        )
        conds = " AND ".join(
            f"arr[i+{j}] IN (SELECT term FROM slot_{qid}_{j})"
            for j in range(len(toks))
        )
        ctes.append(f"""
wsum_{qid} AS (SELECT CAST({wsum} AS FLOAT) AS w),
cpf_{qid} AS (SELECT doc_id, count(*) AS freq
  FROM (SELECT doc_id, arr,
               unnest(generate_series(1, greatest(len(arr) - {len(toks) - 1}, 0))) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM {relation}))
  WHERE {conds} GROUP BY doc_id),
cps_{qid} AS (SELECT pf.doc_id,
       (SELECT w FROM wsum_{qid})
       - (SELECT w FROM wsum_{qid})
         / ({ONE_F} + CAST(pf.freq AS FLOAT)
            * ({ONE_F} / ({K1_F} * (({ONE_F} - {B_F})
               + ({B_F} * CAST(nl.nlen AS FLOAT)) / (SELECT avgdl FROM cs))))) AS score
  FROM cpf_{qid} pf JOIN normlen nl USING (doc_id))""")
        selects.append(
            f"""(SELECT '{qid}' AS query_id,
        CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
        doc_id, ROUND(CAST(score AS DOUBLE), 4) AS score_r
 FROM cps_{qid} ORDER BY score DESC, doc_id LIMIT {k})"""
        )
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def dv_update_sql(term: str, rng: tuple[int, int], filter_lo: int, k: int,
                  relation: str = "documents") -> str:
    """Numeric DV-update oracle: score_hint is derived in
    pages_from_documents as NULL iff doc_id %% 3 == 0 else n_chars; the
    gate then patches every doc_id %% 5 == 0 to (doc_id*3+7) %% 250 (the
    patch CASE arm comes first — updates override, including fills of
    previously-missing values). Three read paths over the patched column:
    inclusive range count, exists count, BM25 top-k with a >= filter."""
    t = _ident(term)
    lo, hi = rng
    return f"""WITH {base_ctes(relation)},{term_leaf_ctes(term)},
patched AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN (doc_id * 3 + 7) % 250
              WHEN doc_id % 3 = 0 THEN NULL
              ELSE n_chars END AS sh
  FROM {relation})
SELECT 'range_count' AS kind, CAST(0 AS BIGINT) AS rank,
       CAST(0 AS BIGINT) AS doc_id,
       CAST((SELECT count(*) FROM patched
             WHERE sh >= {lo} AND sh <= {hi}) AS DOUBLE) AS val_r
UNION ALL
SELECT 'exists_count', CAST(0 AS BIGINT), CAST(0 AS BIGINT),
       CAST((SELECT count(*) FROM patched WHERE sh IS NOT NULL) AS DOUBLE)
UNION ALL
(SELECT 'topk',
        CAST(row_number() OVER (ORDER BY s.s DESC, s.doc_id) AS BIGINT),
        s.doc_id, ROUND(CAST(s.s AS DOUBLE), 4)
 FROM s_{t} s JOIN patched p USING (doc_id)
 WHERE p.sh >= {filter_lo}
 ORDER BY s.s DESC, s.doc_id LIMIT {k})"""


# --- geo gates (flagship.geo_lat_lon lattice + haversine) ------------------


def geo_ctes(relation: str = "documents") -> str:
    """Synthetic-coordinate CTE: the exact integer-lattice formula of
    flagship.geo_lat_lon (integer multiply/mod, one exact double divide) —
    bit-identical to the numpy side by IEEE determinism."""
    return f"""geo AS (
  SELECT doc_id,
         ((doc_id * 7919) % 18000) / 100.0 - 90.0 AS lat,
         ((doc_id * 104729) % 36000) / 100.0 - 180.0 AS lon
  FROM {relation})"""


def geo_dist_expr(lat0: float, lon0: float) -> str:
    """Haversine distance (meters) from (lat0, lon0) to (lat, lon), the
    same double formula as search.geo.haversine_m. libm sin/cos/asin may
    differ from numpy by ~1 ulp (~1e-9 m at earth scale) — callers round
    to 0.1 m / compare against radii chosen off the lattice boundary."""
    return (
        f"2 * 6371008.8 * asin(sqrt(least(1.0, "
        f"pow(sin((radians(lat) - radians({lat0!r})) / 2), 2) + "
        f"cos(radians({lat0!r})) * cos(radians(lat)) * "
        f"pow(sin((radians(lon) - radians({lon0!r})) / 2), 2))))"
    )


def geo_match_sql(
    center: tuple[float, float],
    radius_m: float,
    box: tuple[float, float, float, float],
    polygon: tuple[tuple[float, float], ...] = (),
    relation: str = "documents",
) -> str:
    """(kind, doc_id) mirror of flagship.q_geo_match: kind='radius' =
    haversine <= radius_m; kind='box' = lat/lon inside the box;
    kind='polygon' = even-odd crossing parity over the polygon's edges —
    the SAME double formula as search.geo.point_in_polygon ((b_lon -
    a_lon) * (lat - a_lat) / (b_lat - a_lat) + a_lon), so edge-boundary
    behavior is bit-identical. Lattice values are bit-identical on both
    sides, so box boundary equality is exact."""
    min_lat, max_lat, min_lon, max_lon = box
    dist = geo_dist_expr(*center)
    sql = f"""WITH {geo_ctes(relation)}
(SELECT 'radius' AS kind, doc_id FROM geo WHERE {dist} <= {radius_m!r} ORDER BY doc_id)
UNION ALL
(SELECT 'box' AS kind, doc_id FROM geo
 WHERE lat >= {min_lat!r} AND lat <= {max_lat!r}
   AND lon >= {min_lon!r} AND lon <= {max_lon!r} ORDER BY doc_id)"""
    if polygon:
        m = len(polygon)
        crossings = []
        for i in range(m):
            a_lat, a_lon = polygon[i]
            b_lat, b_lon = polygon[(i + 1) % m]
            crossings.append(
                f"CASE WHEN (({a_lat!r} > lat) <> ({b_lat!r} > lat)) AND "
                f"lon < ({b_lon!r} - {a_lon!r}) * (lat - {a_lat!r}) "
                f"/ ({b_lat!r} - {a_lat!r}) + {a_lon!r} THEN 1 ELSE 0 END"
            )
        parity = " + ".join(crossings)
        sql += f"""
UNION ALL
(SELECT 'polygon' AS kind, doc_id FROM geo
 WHERE ({parity}) % 2 = 1 ORDER BY doc_id)"""
    return sql


def geo_nearest_sql(
    center: tuple[float, float], k: int, relation: str = "documents"
) -> str:
    """(rank, doc_id, dist_r) mirror of flagship.q_geo_nearest: ORDER BY
    distance then docID (the Lucene implicit tie-break), distance rounded
    to 0.1 m."""
    dist = geo_dist_expr(*center)
    return f"""WITH {geo_ctes(relation)},
d AS (SELECT doc_id, {dist} AS dist FROM geo)
SELECT CAST(row_number() OVER (ORDER BY dist, doc_id) AS BIGINT) AS rank,
       doc_id, ROUND(CAST(dist AS DOUBLE), 1) AS dist_r
FROM d ORDER BY dist, doc_id LIMIT {k}"""


def high_freq_terms_sql(n: int, relation: str = "documents") -> str:
    """(order_by, rank, term, doc_freq, total_term_freq) mirror of
    flagship.q_high_freq_terms: top-n by df then by ttf, ties broken by
    ascending term (the DocFreqComparator orderings)."""
    return f"""WITH {base_ctes(relation)},
ts AS (SELECT term, count(DISTINCT doc_id) AS doc_freq, count(*) AS total_term_freq
       FROM tok GROUP BY term)
(SELECT 'df' AS order_by,
        CAST(row_number() OVER (ORDER BY doc_freq DESC, term) AS BIGINT) AS rank,
        term, doc_freq, total_term_freq
 FROM ts ORDER BY doc_freq DESC, term LIMIT {n})
UNION ALL
(SELECT 'ttf' AS order_by,
        CAST(row_number() OVER (ORDER BY total_term_freq DESC, term) AS BIGINT) AS rank,
        term, doc_freq, total_term_freq
 FROM ts ORDER BY total_term_freq DESC, term LIMIT {n})"""


def dv_stats_sql(relation: str = "documents") -> str:
    """(stat, val_r) mirror of flagship.q_dv_stats over the score_hint
    derivation (NULL iff doc_id % 3 == 0, else n_chars): population
    variance/stdev, rounded to 4 decimals (fp-noise-proof: the moments of
    small integers land far from the rounding grid — verified at both
    driver scales)."""
    return f"""WITH d AS (
  SELECT CASE WHEN doc_id % 3 = 0 THEN NULL ELSE n_chars END AS v
  FROM {relation}),
m AS (SELECT count(v) AS cnt, count(*) - count(v) AS miss,
             min(v) AS mn, max(v) AS mx, avg(v) AS mean,
             var_pop(v) AS var FROM d)
SELECT 'count' AS stat, ROUND(CAST(cnt AS DOUBLE), 4) AS val_r FROM m
UNION ALL SELECT 'missing', ROUND(CAST(miss AS DOUBLE), 4) FROM m
UNION ALL SELECT 'min', ROUND(CAST(mn AS DOUBLE), 4) FROM m
UNION ALL SELECT 'max', ROUND(CAST(mx AS DOUBLE), 4) FROM m
UNION ALL SELECT 'mean', ROUND(CAST(mean AS DOUBLE), 4) FROM m
UNION ALL SELECT 'variance', ROUND(CAST(var AS DOUBLE), 4) FROM m
UNION ALL SELECT 'stdev', ROUND(CAST(sqrt(var) AS DOUBLE), 4) FROM m"""


def synonym_topk_sql(
    specs: list[tuple[str, list[tuple[str, ...]], str, int]],
    relation: str = "documents",
) -> str:
    """QueryBuilder synonym-expansion oracle: (query_id, rank, doc_id,
    score_r). specs: (qid, position stacks, kind, k) with kind "bool" or
    "phrase" (stacks from flagship.synonym_positions).

    bool: single-term positions reuse the term leaf CTEs; stacked
    positions score as one SynonymQuery pseudo-term — df = greatest of the
    members' dfs, freq = summed member freqs (SynonymQuery.java
    TermStatistics aggregation, same kernel as scoring_variants_sql's syn
    branch) — then a SHOULD-sum in DOUBLE with one float32 cast.

    phrase: the MultiPhraseQuery closed form (multiphrase_topk_sql): an
    alignment position matches when each slot's term set contains the
    aligned token; weight = f32 of the DOUBLE sum of all flattened member
    idfs (plain phrases are the all-single-slot special case).
    """
    single_terms = sorted(
        {
            t
            for _, stacks, kind, _ in specs
            for stack in stacks
            for t in ([stack[0]] if (kind == "bool" and len(stack) == 1) else stack)
        }
    )
    ctes = [base_ctes(relation)]
    ctes += [term_leaf_ctes(t) for t in single_terms]
    selects = []
    for qid, stacks, kind, k in specs:
        if kind == "bool":
            leaves = []
            for i, stack in enumerate(stacks):
                if len(stack) == 1:
                    leaves.append(f"SELECT doc_id, s FROM s_{_ident(stack[0])}")
                    continue
                lits = ",".join("'" + t.replace("'", "''") + "'" for t in stack)
                df_parts = ",".join(
                    f"(SELECT count(DISTINCT doc_id) FROM tok WHERE term = "
                    f"'{t.replace(chr(39), chr(39) * 2)}')"
                    for t in stack
                )
                ctes.append(f"""
wsyn_{qid}_{i} AS (SELECT CAST(ln(1 + ((SELECT n_docs FROM cs) - df + 0.5) / (df + 0.5)) AS FLOAT) AS w
                   FROM (SELECT greatest({df_parts}) AS df)),
gsyn_{qid}_{i} AS (SELECT tf.doc_id,
                          (SELECT w FROM wsyn_{qid}_{i})
                          - (SELECT w FROM wsyn_{qid}_{i})
                            / ({ONE_F} + CAST(tf.freq AS FLOAT)
                               * ({ONE_F} / ({K1_F} * (({ONE_F} - {B_F})
                                  + ({B_F} * CAST(nl.nlen AS FLOAT)) / (SELECT avgdl FROM cs))))) AS s
                   FROM (SELECT doc_id, count(*) AS freq FROM tok
                         WHERE term IN ({lits}) GROUP BY doc_id) tf
                   JOIN normlen nl USING (doc_id))""")
                leaves.append(f"SELECT doc_id, s FROM gsyn_{qid}_{i}")
            union = "\n      UNION ALL ".join(leaves)
            ctes.append(f"""
scored_{qid} AS (SELECT doc_id, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
                 FROM ({union}) GROUP BY doc_id)""")
        else:  # phrase: the multiphrase closed form over the stacks
            conds = " AND ".join(
                "arr[i+{}] IN ({})".format(
                    j, ",".join("'" + t.replace("'", "''") + "'" for t in stack)
                )
                for j, stack in enumerate(stacks)
            )
            flat = [t for stack in stacks for t in stack]
            idf_sum = " + ".join(
                f"CAST((SELECT w FROM w_{_ident(t)}) AS DOUBLE)" for t in flat
            )
            ctes.append(f"""
mpf_{qid} AS (SELECT doc_id, count(*) AS freq
             FROM (SELECT doc_id, arr,
                          unnest(generate_series(1, greatest(len(arr) - {len(stacks) - 1}, 0))) AS i
                   FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM {relation}))
             WHERE {conds} GROUP BY doc_id),
scored_{qid} AS (SELECT pf.doc_id,
                    CAST({idf_sum} AS FLOAT)
                    - CAST({idf_sum} AS FLOAT)
                      / ({ONE_F} + CAST(pf.freq AS FLOAT)
                         * ({ONE_F} / ({K1_F} * (({ONE_F} - {B_F})
                            + ({B_F} * CAST(nl.nlen AS FLOAT)) / (SELECT avgdl FROM cs))))) AS score
             FROM mpf_{qid} pf JOIN normlen nl USING (doc_id))""")
        selects.append(
            f"""(SELECT '{qid}' AS query_id,
        CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
        doc_id, ROUND(CAST(score AS DOUBLE), 4) AS score_r
 FROM scored_{qid} ORDER BY score DESC, doc_id LIMIT {k})"""
        )
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def termautomaton_topk_sql(
    specs: list[tuple[str, list[list[str]], list[str]]],
    k: int,
    relation: str = "documents",
) -> str:
    """TermAutomatonQuery oracle: (query_id, rank, doc_id, score_r).

    specs: (qid, accepted paths, terms in termID order). freq = the sum
    over accepted paths of their (overlapping) occurrence counts — each
    occurrence steps some run into an accept state exactly once
    (TermAutomatonScorer accept-event counting; in-flight multiplicities
    are exactly the distinct run starts). Weight = float32 of the DOUBLE
    sum of per-term f32 idfs in termID order, df == 0 terms excluded
    (TermAutomatonQuery.java:384), scored with the shared BM25 closed
    form. The df > 0 exclusion is enforced by construction here: gate
    specs only use corpus terms."""
    all_terms = sorted({t for _, _, terms in specs for t in terms})
    ctes = [base_ctes(relation)]
    ctes += [term_leaf_ctes(t) for t in all_terms]
    selects = []
    for qid, paths, terms in specs:
        path_cnts = []
        for pi, path in enumerate(paths):
            conds = " AND ".join(
                f"arr[i+{j}] = '{t.replace(chr(39), chr(39) * 2)}'"
                for j, t in enumerate(path)
            )
            ctes.append(f"""
tap_{qid}_{pi} AS (SELECT doc_id, count(*) AS cnt
             FROM (SELECT doc_id, arr,
                          unnest(generate_series(1, greatest(len(arr) - {len(path) - 1}, 0))) AS i
                   FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM {relation}))
             WHERE {conds} GROUP BY doc_id)""")
            path_cnts.append(f"SELECT doc_id, cnt FROM tap_{qid}_{pi}")
        union = "\n      UNION ALL ".join(path_cnts)
        idf_sum = " + ".join(
            f"CAST((SELECT w FROM w_{_ident(t)}) AS DOUBLE)" for t in terms
        )
        ctes.append(f"""
taf_{qid} AS (SELECT doc_id, SUM(cnt) AS freq FROM ({union}) GROUP BY doc_id),
tas_{qid} AS (SELECT f.doc_id,
                    CAST({idf_sum} AS FLOAT)
                    - CAST({idf_sum} AS FLOAT)
                      / ({ONE_F} + CAST(f.freq AS FLOAT)
                         * ({ONE_F} / ({K1_F} * (({ONE_F} - {B_F})
                            + ({B_F} * CAST(nl.nlen AS FLOAT)) / (SELECT avgdl FROM cs))))) AS score
             FROM taf_{qid} f JOIN normlen nl USING (doc_id))""")
        selects.append(
            f"""(SELECT '{qid}' AS query_id,
        CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
        doc_id, ROUND(CAST(score AS DOUBLE), 4) AS score_r
 FROM tas_{qid} ORDER BY score DESC, doc_id LIMIT {k})"""
        )
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def expr_sort_topn_sql(k: int, relation: str = "documents") -> str:
    """(rank, doc_id, val_r) mirror of flagship.q_expr_sort_topn:
    score_hint (NULL iff doc_id % 3 == 0, else n_chars; missing binds 0)
    + token count * 2, descending, docID tie-break. Integer-valued doubles
    — no fp sensitivity."""
    return f"""WITH dl AS (SELECT doc_id, count(*) AS dl
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM {relation})
          GROUP BY doc_id),
v AS (SELECT d.doc_id,
             COALESCE(CASE WHEN d.doc_id % 3 = 0 THEN NULL ELSE d.n_chars END, 0)
             + dl.dl * 2.0 AS v
      FROM {relation} d JOIN dl USING (doc_id))
SELECT CAST(row_number() OVER (ORDER BY v DESC, doc_id) AS BIGINT) AS rank,
       doc_id, ROUND(CAST(v AS DOUBLE), 4) AS val_r
FROM v ORDER BY v DESC, doc_id LIMIT {k}"""


def payload_check_sql(
    specs: list[tuple[str, str, float, int]], relation: str = "documents"
) -> str:
    """SpanPayloadCheckQuery oracle over the payload fixture:
    (query_id, rank, doc_id, score_r). A position of ``term`` matches when
    it CARRIES a payload (pos % 3 != 2) equal to the spec value
    (((3*len + pos) % 8) * 0.25 — exact multiples of 0.25, so the DOUBLE
    compare is float32-faithful); freq = matching positions; score = the
    BM25 term closed form at that freq with the term's FULL df/avgdl
    statistics (term_leaf_ctes' w)."""
    terms = sorted({t for _, t, _, _ in specs})
    ctes = [base_ctes(relation)]
    ctes.append(f"""
pctok AS (
  SELECT doc_id, i - 1 AS pos, arr[i] AS term
  FROM (SELECT doc_id, arr, unnest(generate_series(1, len(arr))) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM {relation})))""")
    ctes += [term_leaf_ctes(t) for t in terms]
    selects = []
    for qid, t, value, k in specs:
        ti = _ident(t)
        lit = t.replace("'", "''")
        ctes.append(f"""
pcf_{qid} AS (SELECT doc_id, count(*) AS freq
              FROM pctok
              WHERE term = '{lit}' AND pos % 3 <> 2
                AND ((3 * length(term) + pos) % 8) * 0.25 = {value!r}
              GROUP BY doc_id),
pcs_{qid} AS (SELECT f.doc_id,
                 (SELECT w FROM w_{ti})
                 - (SELECT w FROM w_{ti})
                   / ({ONE_F} + CAST(f.freq AS FLOAT)
                      * ({ONE_F} / ({K1_F} * (({ONE_F} - {B_F})
                         + ({B_F} * CAST(nl.nlen AS FLOAT)) / (SELECT avgdl FROM cs))))) AS score
              FROM pcf_{qid} f JOIN normlen nl USING (doc_id))""")
        selects.append(
            f"""(SELECT '{qid}' AS query_id,
        CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
        doc_id, ROUND(CAST(score AS DOUBLE), 4) AS score_r
 FROM pcs_{qid} ORDER BY score DESC, doc_id LIMIT {k})"""
        )
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def multifield_topk_sql(
    specs: list[tuple[str, str, list[tuple[str, float]], int]],
    relation: str = "documents",
) -> str:
    """MultiFieldQueryParser oracle: (query_id, rank, doc_id, score_r).

    specs = (qid, query text, [(field, boost)], k); text splits on
    whitespace (the gate analyzes with the standard analyzer over
    already-clean tokens). Scoring mirrors the NESTED boolean tree: each
    token's per-field disjunction DOUBLE-sums its float32 leaves and casts
    to float32 ONCE, then the outer SHOULD-sum re-accumulates those
    float32 group scores in DOUBLE with one final cast — two cast levels,
    exactly the engine's BooleanQuery-of-BooleanQuery discipline. A
    single-token query collapses to its inner group (the single-clause
    rewrite), which the two-level cast reproduces bit-identically (the
    outer cast of one widened float32 is the identity)."""
    fields = sorted({f for _, _, fl, _ in specs for f, _ in fl})
    leaves = sorted(
        {
            (f, t, b)
            for _, text, fl, _ in specs
            for t in text.split()
            for f, b in fl
        }
    )
    ctes = ["lt AS (SELECT unnest(" + LENGTH_TABLE_SQL + ") AS v)"]
    ctes += [field_stream_ctes(f, relation) for f in fields]
    ctes += [field_leaf_cte(f, t, b) for f, t, b in leaves]
    selects = []
    for qid, text, fl, k in specs:
        groups = []
        for i, t in enumerate(text.split()):
            names = [f"s_{_fp(f)}_{_ident(t)}_{_boost_tag(b)}" for f, b in fl]
            union = "\n          UNION ALL ".join(
                f"SELECT doc_id, s FROM {nm}" for nm in names
            )
            ctes.append(f"""
mfg_{qid}_{i} AS (SELECT doc_id, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS s
                  FROM ({union}) GROUP BY doc_id)""")
            groups.append(f"SELECT doc_id, s FROM mfg_{qid}_{i}")
        outer = "\n      UNION ALL ".join(groups)
        ctes.append(f"""
mfs_{qid} AS (SELECT doc_id, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
              FROM ({outer}) GROUP BY doc_id)""")
        selects.append(
            f"""(SELECT '{qid}' AS query_id,
        CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
        doc_id, ROUND(CAST(score AS DOUBLE), 4) AS score_r
 FROM mfs_{qid} ORDER BY score DESC, doc_id LIMIT {k})"""
        )
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def facet_value_counts_sql(
    term: str, k: int, relation: str = "documents"
) -> str:
    """(val, n) mirror of flagship.q_facet_value_counts: doc-length value
    counts among docs containing the facet term, top-k by (count desc,
    value asc)."""
    lit = term.replace("'", "''")
    return f"""WITH {base_ctes(relation)},
m AS (SELECT DISTINCT doc_id FROM tok WHERE term = '{lit}')
SELECT dl.dl AS val, count(*) AS n
FROM m JOIN dl USING (doc_id)
GROUP BY dl.dl ORDER BY n DESC, val LIMIT {k}"""


def numeric_set_topk_sql(
    term: str, values: tuple, k: int, relation: str = "documents"
) -> str:
    """(rank, doc_id, score_r) mirror of flagship.q_numeric_set_topk: BM25
    term score among docs whose token count is in the value set."""
    lits = ",".join(str(int(v)) for v in values)
    ctes = [base_ctes(relation), term_leaf_ctes(term)]
    t = _ident(term)
    return f"""WITH {",".join(ctes)}
SELECT CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS BIGINT) AS rank,
       doc_id, ROUND(CAST(s AS DOUBLE), 4) AS score_r
FROM s_{t} JOIN dl USING (doc_id)
WHERE dl.dl IN ({lits})
ORDER BY s DESC, doc_id LIMIT {k}"""


def xml_topk_sql(k: int, relation: str = "documents") -> str:
    """(query_id, rank, doc_id, score_r) mirror of flagship.q_xml_topk —
    the XML parser maps onto existing query semantics, so the oracle is a
    UNION of the matching closed forms (DuckDB allows parenthesized WITH
    subqueries in set operations): boolean sum, dismax, classic-parsed
    disjunction, ordered span, and a term + dl-range FILTER."""
    parts = [
        bm25_topk_sql([("xml_bool", ["key", "hash"], k, 0),
                       ("xml_user", ["window", "batch", "spark"], k, 0)],
                      relation),
        field_topk_sql([("xml_dismax", "dismax",
                         [("", "key", 1.0), ("", "hash", 1.0)], k)], relation),
        span_topk_sql([("xml_span", "ord", (("key",), ("hash",)), 3, k)], relation),
        f"""WITH {base_ctes(relation)},{term_leaf_ctes("table")}
SELECT 'xml_filtered' AS query_id,
       CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS BIGINT) AS rank,
       doc_id, ROUND(CAST(s AS DOUBLE), 4) AS score_r
FROM s_{_ident("table")} JOIN dl USING (doc_id)
WHERE dl.dl BETWEEN 30 AND 60
ORDER BY s DESC, doc_id LIMIT {k}""",
    ]
    return "\nUNION ALL\n".join(f"({p})" for p in parts)


def suggest_context_sql(
    specs: list[tuple[str, str, str, int]], relation: str = "documents"
) -> str:
    """(prefix_id, rank, term, weight) mirror of flagship.q_suggest_context:
    term weight = total occurrences within the context language's docs;
    zero-weight terms drop; order by (weight desc, term)."""
    selects = []
    for pid, pfx, ctx, n in specs:
        p = pfx.replace("'", "''")
        c = ctx.replace("'", "''")
        selects.append(f"""(WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS term
  FROM {relation} WHERE lang = '{c}'),
w AS (SELECT term, count(*) AS weight FROM tok
      WHERE starts_with(term, '{p}') GROUP BY term)
SELECT '{pid}' AS prefix_id,
       CAST(row_number() OVER (ORDER BY weight DESC, term) AS BIGINT) AS rank,
       term, weight
FROM w ORDER BY weight DESC, term LIMIT {n})""")
    return "\nUNION ALL\n".join(selects)


def function_range_topk_sql(
    term: str, lo: float, hi: float, k: int, relation: str = "documents"
) -> str:
    """(rank, doc_id, score_r) mirror of flagship.q_function_range_topk:
    the expression is score_hint (NULL -> 0) + token count * 2, integer-
    valued doubles — no fp sensitivity at the range bounds."""
    t = _ident(term)
    return f"""WITH {base_ctes(relation)},{term_leaf_ctes(term)},
v AS (SELECT d.doc_id,
             COALESCE(CASE WHEN d.doc_id % 3 = 0 THEN NULL ELSE d.n_chars END, 0)
             + dl.dl * 2.0 AS v
      FROM {relation} d JOIN dl USING (doc_id))
SELECT CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS BIGINT) AS rank,
       doc_id, ROUND(CAST(s AS DOUBLE), 4) AS score_r
FROM s_{t} JOIN v USING (doc_id)
WHERE v.v >= {lo!r} AND v.v <= {hi!r}
ORDER BY s DESC, doc_id LIMIT {k}"""


def classify_confusion_sql(relation: str = "documents") -> str:
    """(actual, predicted, n) mirror of classify.q_classify_confusion:
    cross-tabulate the corpus NB argmax predictions against the actual
    class labels."""
    return f"""WITH pred AS ({classify_nb_corpus_sql(relation)})
SELECT d.lang AS actual, p.lang AS predicted, count(*) AS n
FROM pred p JOIN {relation} d USING (doc_id)
GROUP BY 1, 2 ORDER BY 1, 2"""


def dataset_split_sql(relation: str = "documents") -> str:
    """(lang, split, n) mirror of classify.q_dataset_split: the same md5
    bucket over 'split:{doc_id}'."""
    from ..pipelines.classify import SPLIT_CV_LT, SPLIT_TEST_LT, SPLIT_TEST_MOD

    return f"""SELECT lang,
       CASE WHEN md5_number_lower('split:' || CAST(doc_id AS VARCHAR)) % {SPLIT_TEST_MOD} < {SPLIT_TEST_LT} THEN 'test'
            WHEN md5_number_lower('split:' || CAST(doc_id AS VARCHAR)) % {SPLIT_TEST_MOD} < {SPLIT_CV_LT} THEN 'cv'
            ELSE 'train' END AS split,
       count(*) AS n
FROM {relation} GROUP BY 1, 2 ORDER BY 1, 2"""


def suggest_blended_sql(
    specs: list[tuple[str, str, int]], title_tokens: int,
    relation: str = "documents",
) -> str:
    """(query_id, rank, doc_id, score_r) mirror of flagship.
    q_suggest_blended: candidates = titles (first title_tokens body
    tokens) containing a token starting with the prefix; score = n_chars
    / (first matching token position + 1); rank score desc, doc asc."""
    selects = []
    for qid, pfx, n in specs:
        p = pfx.replace("'", "''")
        selects.append(f"""(WITH ttok AS (
  SELECT doc_id, n_chars, i - 1 AS pos, arr[i] AS tok
  FROM (SELECT doc_id, n_chars,
               list_slice(string_split(text, ' '), 1, {title_tokens}) AS arr
        FROM {relation}),
       unnest(generate_series(1, len(arr))) AS u(i)),
m AS (SELECT doc_id, any_value(n_chars) AS n_chars, min(pos) AS fpos
      FROM ttok WHERE starts_with(tok, '{p}') GROUP BY doc_id)
SELECT '{qid}' AS query_id,
       CAST(row_number() OVER (
            ORDER BY CAST(n_chars AS DOUBLE) / (fpos + 1.0) DESC, doc_id)
            AS BIGINT) AS rank,
       doc_id,
       ROUND(CAST(n_chars AS DOUBLE) / (fpos + 1.0), 4) AS score_r
FROM m ORDER BY CAST(n_chars AS DOUBLE) / (fpos + 1.0) DESC, doc_id LIMIT {n})""")
    return "\nUNION ALL\n".join(selects)
