"""QueryRescorer: two-phase ranking (s84 core/src/java/org/apache/
lucene/search/QueryRescorer.java:57-186) — re-score the first pass's top
docs with a SECOND query and combine. The static-combine contract
(java:175-186): combined = first + weight * second when the second query
matches, first unchanged otherwise; Java's `float += double` narrows
once, so combined = f32(double(first) + weight * double(second)).
Re-sorted by combined score DESC then docID ASC, truncated to topN.

The reference advances the second-pass scorer doc-by-doc across the
first-pass hits; this engine's scorers are bulk-vectorized, so the
second pass evaluates once per reader and the first-pass docs look up
their scores with one searchsorted — same semantics, the engine's idiom.
"""

from __future__ import annotations

import numpy as np

from . import queries as Q
from .scorers import eval_query
from .topk import TopDocs


def query_rescore(searcher, first_td: TopDocs, query, weight: float,
                  top_n: int) -> TopDocs:
    docs = np.asarray(first_td.doc_ids, dtype=np.int64)
    first = np.asarray(first_td.scores, dtype=np.float32)
    if len(docs) == 0:
        return first_td
    if isinstance(query, str):
        query = searcher.parse(query)
    # resolve merged-index routing (stale-merged fallback serving)
    route = getattr(searcher, "_route", None)
    if route is not None:
        q2, delegate = route(query)
        query = q2
        if delegate is not None:
            searcher = delegate
    if Q.needs_rewrite(query):
        query = Q.rewrite(query, searcher.term_dict_union())
    stats = searcher.collection_stats(Q.collect_field_terms(query))
    gd_parts, s_parts = [], []
    for r in searcher.readers:
        d, s = eval_query(r, query, stats, searcher.bm25)
        gd_parts.append(d + r.doc_base)
        s_parts.append(s)
    gd = np.concatenate(gd_parts) if gd_parts else np.array([], np.int64)
    s2 = np.concatenate(s_parts).astype(np.float32) if s_parts else \
        np.array([], np.float32)
    order = np.argsort(gd, kind="stable")
    gd, s2 = gd[order], s2[order]
    idx = np.searchsorted(gd, docs)
    idx_c = np.minimum(idx, max(len(gd) - 1, 0))
    matched = (len(gd) > 0) & (gd[idx_c] == docs) if len(gd) else \
        np.zeros(len(docs), dtype=bool)
    combined = first.copy()
    if np.any(matched):
        combined[matched] = (
            first[matched].astype(np.float64)
            + float(weight) * s2[idx_c[matched]].astype(np.float64)
        ).astype(np.float32)
    sel = np.lexsort((docs, -combined.astype(np.float64)))[:top_n]
    return TopDocs(
        doc_ids=docs[sel],
        scores=combined[sel],
        total_hits=first_td.total_hits,
        total_hits_is_lower_bound=first_td.total_hits_is_lower_bound,
    )


def sort_rescore(searcher, first_td: TopDocs, sort_col: str,
                 reverse: bool, top_n: int):
    """SortRescorer (s84 core/.../search/SortRescorer.java:42): re-sort
    the first pass's hits by a doc-values field through a field collector
    (tie: docID ascending), truncate to topN; the first-pass scores ride
    along unchanged (the ScoreAndDoc passthrough). Returns (TopDocs,
    sort values)."""
    docs = np.asarray(first_td.doc_ids, dtype=np.int64)
    first = np.asarray(first_td.scores, dtype=np.float32)
    if len(docs) == 0:
        return first_td, np.array([], dtype=np.float64)
    route = getattr(searcher, "_route", None)
    if route is not None:
        _, delegate = route(Q.MatchAllDocsQuery())
        if delegate is not None:
            searcher = delegate
    bases = np.asarray([r.doc_base for r in searcher.readers], dtype=np.int64)
    si = np.searchsorted(bases, docs, side="right") - 1
    vals = np.empty(len(docs), dtype=np.float64)
    for i, r in enumerate(searcher.readers):
        m = si == i
        if m.any():
            dv = np.asarray(r.doc_values(sort_col), dtype=np.float64)
            vals[m] = dv[docs[m] - r.doc_base]
    key = -vals if reverse else vals
    order = np.lexsort((docs, key))[:top_n]
    return (
        TopDocs(
            doc_ids=docs[order], scores=first[order],
            total_hits=first_td.total_hits,
            total_hits_is_lower_bound=first_td.total_hits_is_lower_bound,
        ),
        vals[order],
    )
