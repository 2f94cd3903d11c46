"""MoreLikeThis: query-by-document (s84 queries/src/java/org/apache/
lucene/queries/mlt/MoreLikeThis.java — the like(text) path, re-created).

Selects the most informative terms of the liked text by tf x idf with
idf = 1 + ln(numDocs / (docFreq + 1)) (the classic TF-IDF idf MLT ranks
with), filtered by minTermFreq / minDocFreq, capped at maxQueryTerms,
and returns a SHOULD BooleanQuery over them (optionally boosted by
score / bestScore, MLT's boost=true mode).
"""

from __future__ import annotations

import math
from collections import Counter

from . import queries as Q

MLT_MIN_TERM_FREQ = 2   # MoreLikeThis.DEFAULT_MIN_TERM_FREQ
MLT_MIN_DOC_FREQ = 5    # MoreLikeThis.DEFAULT_MIN_DOC_FREQ
MLT_MAX_QUERY_TERMS = 25  # MoreLikeThis.DEFAULT_MAX_QUERY_TERMS


def _mlt_from_tf(
    searcher, tf: Counter, min_term_freq: int, min_doc_freq: int,
    max_query_terms: int, boost: bool,
) -> Q.Query:
    cand = sorted(t for t, c in tf.items() if c >= min_term_freq)
    if not cand:
        return Q.MatchNoDocsQuery()
    stats = searcher.collection_stats(set(cand))
    n_docs = stats.doc_count
    scored = []
    for t in cand:
        df = stats.df(t)
        if df < min_doc_freq or df == 0:
            continue
        idf = 1.0 + math.log(n_docs / (df + 1.0))
        scored.append((tf[t] * idf, t))
    if not scored:
        return Q.MatchNoDocsQuery()
    scored.sort(key=lambda x: (-x[0], x[1]))
    top = scored[:max_query_terms]
    best = top[0][0]
    clauses = [
        (Q.SHOULD, Q.TermQuery(t, boost=(s / best) if boost else 1.0))
        for s, t in top
    ]
    return Q.BooleanQuery.build(clauses)


def mlt_query(
    searcher,
    like_text: str,
    min_term_freq: int = MLT_MIN_TERM_FREQ,
    min_doc_freq: int = MLT_MIN_DOC_FREQ,
    max_query_terms: int = MLT_MAX_QUERY_TERMS,
    boost: bool = False,
) -> Q.Query:
    """Build the MLT query for ``like_text`` against ``searcher``'s corpus
    statistics (the like(String) path). Ties in the interestingness
    ranking break on term order (deterministic across engine and SQL
    oracle)."""
    tf = Counter(searcher.analyzer.tokens(like_text))
    return _mlt_from_tf(searcher, tf, min_term_freq, min_doc_freq,
                        max_query_terms, boost)


def mlt_query_from_doc(
    searcher,
    global_doc_id: int,
    min_term_freq: int = MLT_MIN_TERM_FREQ,
    min_doc_freq: int = MLT_MIN_DOC_FREQ,
    max_query_terms: int = MLT_MAX_QUERY_TERMS,
    boost: bool = False,
) -> Q.Query:
    """MLT's like(docID) path: the liked doc's term frequencies come from
    its stored TERM VECTOR (BuildConfig.term_vectors=True), so no stored
    text is needed — the MoreLikeThis.retrieveTerms(int) role.

    Term vectors live on the per-SEGMENT readers; a MergedIndexSearcher
    routes through its segment searcher (the same delegation lookup_docs
    uses) so like(docID) works on merged indexes too."""
    import numpy as np

    seg_searcher = getattr(searcher, "_seg", None)
    resolver = seg_searcher() if callable(seg_searcher) else searcher
    bases = [r.doc_base for r in resolver.readers]
    si = int(np.searchsorted(bases, global_doc_id, side="right")) - 1
    r = resolver.readers[si]
    if not getattr(r, "has_term_vectors", False):
        raise ValueError(
            "mlt_query_from_doc needs an index built with "
            "BuildConfig.term_vectors=True"
        )
    terms, freqs = r.term_vector(int(global_doc_id) - r.doc_base)
    tf = Counter(dict(zip((str(t) for t in terms), (int(f) for f in freqs))))
    return _mlt_from_tf(searcher, tf, min_term_freq, min_doc_freq,
                        max_query_terms, boost)
