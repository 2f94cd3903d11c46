"""Span queries over the positions index — the search/spans module.

Reference semantics (s84 core search/spans/*):

- ``SpanTermQuery``: each occurrence is the span [p, p+1) of width 0
  (TermSpans.java:110 ``width() { return 0; }``).
- ``SpanNearQuery`` ordered = NearSpansOrdered.java: for every successive
  start position of clause 0, ``stretchToOrder`` advances each later
  clause's iterator to the first start >= the previous clause's end
  (non-overlapping, in order); matchWidth = sum of the gaps; a match
  emits when matchWidth <= slop; any clause exhausting ends the doc.
  The sub-iterators only ever move forward and their thresholds are
  monotone in clause 0's start, so the stateful Java loop is equivalent
  to an independent first->= lookup per start — which is what the
  vectorized ``_ordered_widths`` computes (pinned by the literal-
  transcription duel in tests/test_spans.py).
- ``SpanNearQuery`` unordered = NearSpansUnordered.java: a priority
  queue by (start, end) over the clause iterators; at each state a match
  emits iff maxEnd - top.start - totalSpanLength <= slop, then the top
  iterator advances. width() = maxEnd - top.start (NOT minus the span
  lengths). maxEndPosition is a RUNNING max, but for width-1 term spans
  it always equals the max of the current ends. Transcribed literally in
  ``_unordered_widths``.
- ``SpanFirstQuery`` (SpanFirstQuery.java:40): keep spans with
  end <= ``end``; ``SpanPositionRangeQuery`` (SpanPositionRangeQuery
  .java:41) additionally requires start >= ``start``.
- ``SpanNotQuery`` (SpanNotQuery.java:193-204): keep include spans with
  no exclude span overlapping [start - pre, end + post); scoring stats
  come from the include side only (SpanNotWeight.extractTermStates).

Scoring = SpanScorer.setFreqCurrentDoc (SpanScorer.java): per match, the
FLOAT freq accumulates the DOUBLE contribution 1.0/(1.0 + width()) —
``freq = float32(freq + 1.0/(1.0+width))`` at every step, in emission
order. The SimScorer weight is boost * float32(sum of per-term float32
idfs over the DISTINCT terms of the scoring side) (SpanWeight.java:101
buildSimWeight over the deduped Map<Term, TermStates>); we sum in sorted
term order to make the double-sum order deterministic (Java's map order
is unspecified; the difference is at most an ulp of the float result and
our oracle uses the same order).
"""

from __future__ import annotations

import numpy as np

from . import queries as Q


def _span_terms(query) -> list[str]:
    """Term leaves of a span tree, in clause order."""
    if isinstance(query, Q.SpanTermQuery):
        return [query.term]
    if isinstance(query, (Q.SpanNearQuery, Q.SpanOrQuery)):
        out = []
        for c in query.clauses:
            out += _span_terms(c)
        return out
    if isinstance(query, (Q.SpanFirstQuery, Q.SpanPositionRangeQuery)):
        return _span_terms(query.match)
    if isinstance(query, Q.SpanNotQuery):
        return _span_terms(query.include) + _span_terms(query.exclude)
    raise TypeError(f"not a span query: {type(query).__name__}")


def _leaf_terms(clause) -> list[str]:
    """Terms of ONE clause: a SpanTermQuery or a SpanOrQuery of terms
    (an or-of-terms still yields width-1 spans whose position list is the
    merge of its terms' lists — SpanOrQuery's position queue)."""
    if isinstance(clause, Q.SpanTermQuery):
        return [clause.term]
    if isinstance(clause, Q.SpanOrQuery):
        out = []
        for c in clause.clauses:
            if not isinstance(c, Q.SpanTermQuery):
                raise ValueError("SpanOrQuery clauses are restricted to SpanTermQuery")
            out.append(c.term)
        return out
    raise ValueError(
        "span clauses are restricted to SpanTermQuery / SpanOrQuery-of-terms "
        "(documented scope)"
    )


def _clause_term_lists(query) -> list[list[str]]:
    """The query as a list of clauses, each a list of leaf terms whose
    merged positions are that clause's spans."""
    if isinstance(query, (Q.SpanTermQuery, Q.SpanOrQuery)):
        return [_leaf_terms(query)]
    if isinstance(query, Q.SpanNearQuery):
        return [_leaf_terms(c) for c in query.clauses]
    if isinstance(query, (Q.SpanFirstQuery, Q.SpanPositionRangeQuery)):
        return [_leaf_terms(query.match)]
    if isinstance(query, Q.SpanNotQuery):
        return [_leaf_terms(query.include), _leaf_terms(query.exclude)]
    raise TypeError(f"not a span query: {type(query).__name__}")


def span_field(query) -> str:
    if isinstance(query, Q.SpanTermQuery):
        return query.field
    if isinstance(query, (Q.SpanNearQuery, Q.SpanOrQuery)):
        fields = {span_field(c) for c in query.clauses}
        if len(fields) != 1:
            raise ValueError("Clauses must have same field.")
        return fields.pop()
    if isinstance(query, (Q.SpanFirstQuery, Q.SpanPositionRangeQuery)):
        return span_field(query.match)
    if isinstance(query, Q.SpanNotQuery):
        fi, fe = span_field(query.include), span_field(query.exclude)
        if fi != fe:
            raise ValueError("Clauses must have same field.")
        return fi
    raise TypeError(f"not a span query: {type(query).__name__}")


def _scoring_terms(query) -> list[str]:
    """Distinct terms feeding the SimScorer, sorted (SpanNotWeight uses
    the include side only)."""
    if isinstance(query, Q.SpanNotQuery):
        return sorted(set(_span_terms(query.include)))
    return sorted(set(_span_terms(query)))


def _ordered_widths(pos_lists: list[np.ndarray], slop: int) -> np.ndarray:
    """NearSpansOrdered match widths in emission (clause-0 start) order.

    Vectorized equivalence of the stateful loop: clause i's iterator
    lands on the first start >= previous clause's end, and because those
    thresholds are monotone in clause 0's start the per-start lookups are
    independent (`np.searchsorted`). Exhaustion of any clause ends the
    doc — a suffix of clause-0 starts, masked the same way."""
    a = pos_lists[0]
    if len(a) == 0:
        return np.empty(0, dtype=np.int64)
    prev_end = a + 1
    width = np.zeros(len(a), dtype=np.int64)
    alive = np.ones(len(a), dtype=bool)
    for pl in pos_lists[1:]:
        idx = np.searchsorted(pl, prev_end)
        alive &= idx < len(pl)
        safe = np.minimum(idx, max(len(pl) - 1, 0))
        start = pl[safe] if len(pl) else np.zeros(len(a), dtype=np.int64)
        width = width + np.where(alive, start - prev_end, 0)
        prev_end = start + 1
    return width[alive & (width <= slop)]


def _unordered_widths(pos_lists: list[np.ndarray], slop: int) -> list[int]:
    """NearSpansUnordered match widths in emission order — a literal
    transcription of SpanTotalLengthEndPositionWindow over width-1 term
    spans. Ties between equal start positions follow lowest clause index
    (Lucene's heap order at equal (start, end) is arbitrary; the gate
    corpus has one token per position so cross-clause ties cannot occur)."""
    n = len(pos_lists)
    ptr = [0] * n
    if any(len(pl) == 0 for pl in pos_lists):
        return []
    total_len = n  # every term span has length 1
    max_end = max(int(pl[0]) for pl in pos_lists) + 1
    widths: list[int] = []
    while True:
        top = min(range(n), key=lambda i: int(pos_lists[i][ptr[i]]))
        min_start = int(pos_lists[top][ptr[top]])
        if max_end - min_start - total_len <= slop:
            widths.append(max_end - min_start)
        ptr[top] += 1
        if ptr[top] >= len(pos_lists[top]):
            return widths
        max_end = max(max_end, int(pos_lists[top][ptr[top]]) + 1)


def _span_doc_widths(query, pos_lists: list[np.ndarray]):
    """Match widths for one doc given the per-CLAUSE merged position
    lists. Returns a sequence of integer widths in emission order."""
    if isinstance(query, (Q.SpanTermQuery, Q.SpanOrQuery)):
        return np.zeros(len(pos_lists[0]), dtype=np.int64)
    if isinstance(query, Q.SpanNearQuery):
        if query.in_order:
            return _ordered_widths(pos_lists, query.slop)
        return _unordered_widths(pos_lists, query.slop)
    if isinstance(query, Q.SpanFirstQuery):
        p = pos_lists[0]
        return np.zeros(int(np.count_nonzero(p + 1 <= query.end)), dtype=np.int64)
    if isinstance(query, Q.SpanPositionRangeQuery):
        # SpanPositionRangeQuery.acceptPosition: start >= start AND end <= end
        p = pos_lists[0]
        keep = (p >= query.start) & (p + 1 <= query.end)
        return np.zeros(int(np.count_nonzero(keep)), dtype=np.int64)
    if isinstance(query, Q.SpanNotQuery):
        inc = pos_lists[0]
        exc = pos_lists[1] if len(pos_lists) > 1 else np.empty(0, dtype=np.int64)
        if len(exc) == 0:
            return np.zeros(len(inc), dtype=np.int64)
        # reject p iff some exclude q overlaps [p - pre, p + 1 + post):
        # q >= p - pre and q <= p + post (term spans are width 1)
        idx = np.searchsorted(exc, inc - query.pre)
        has = idx < len(exc)
        q = exc[np.minimum(idx, len(exc) - 1)]
        reject = has & (q <= inc + query.post)
        return np.zeros(int(np.count_nonzero(~reject)), dtype=np.int64)
    raise TypeError(f"not a span query: {type(query).__name__}")


def _sloppy_fold(widths) -> np.float32:
    """SpanScorer.setFreqCurrentDoc: float freq += double 1/(1+width)."""
    acc = np.float32(0.0)
    for w in widths:
        acc = np.float32(np.float64(acc) + 1.0 / (1.0 + float(w)))
    return acc


def eval_span(reader, query, stats, bm25):
    """Evaluate a span query on one segment: (docs ascending, f32 scores)."""
    from .scorers import _empty, _view

    field = span_field(query)
    fr = _view(reader, field)
    if not getattr(fr, "has_positions", False):
        raise ValueError("span queries require an index built with index_positions=True")

    clauses = _clause_term_lists(query)  # validates clause scope
    # per-LEAF postings; absent leaves keep an empty placeholder (an
    # or-clause matches if ANY of its terms does; an absent SpanNot
    # exclude lets includes pass through)
    leaf_post: dict[str, tuple] = {}
    for terms in clauses:
        for t in terms:
            if t not in leaf_post:
                tpp = fr.term_positions(t)
                leaf_post[t] = tpp if tpp is not None else (
                    np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64)
                )

    # per-clause doc set = union of its leaves' docs (SpanOrQuery);
    # candidates = conjunction of clause docs (ConjunctionSpans) — except
    # SpanNot, whose candidates are the include clause's docs alone
    clause_docs = [
        np.unique(np.concatenate([leaf_post[t][0] for t in terms]))
        for terms in clauses
    ]
    cand = clause_docs[0]
    if not isinstance(query, Q.SpanNotQuery):
        for cd in clause_docs[1:]:
            cand = np.intersect1d(cand, cd, assume_unique=True)
    if len(cand) == 0:
        return _empty()

    from .scorers import _positions_cursor, sum_idf_weight

    leaves = sorted(leaf_post)
    per_leaf = [leaf_post[t] for t in leaves]
    leaf_idx = {t: i for i, t in enumerate(leaves)}
    locs, offs = _positions_cursor(per_leaf, cand)
    freqs = np.zeros(len(cand), dtype=np.float64)
    for ci in range(len(cand)):
        pos_lists = []
        for terms in clauses:
            parts = []
            for t in terms:
                ti = leaf_idx[t]
                d, _f, p = per_leaf[ti]
                li = locs[ti][ci]
                if li < len(d) and d[li] == cand[ci]:
                    parts.append(p[offs[ti][li] : offs[ti][li + 1]])
            if len(parts) == 1:
                pos_lists.append(np.asarray(parts[0], dtype=np.int64))
            elif parts:
                pos_lists.append(np.unique(np.concatenate(parts)).astype(np.int64))
            else:
                pos_lists.append(np.empty(0, dtype=np.int64))
        if len(pos_lists[0]) == 0 or (
            not isinstance(query, Q.SpanNotQuery)
            and any(len(pl) == 0 for pl in pos_lists)
        ):
            continue
        freqs[ci] = float(_sloppy_fold(_span_doc_widths(query, pos_lists)))

    keep = freqs > 0
    cand, freqs = cand[keep], freqs[keep]
    if len(cand) == 0:
        return _empty()

    tw = sum_idf_weight(_scoring_terms(query), field, stats, bm25, query.boost)
    scores = tw.score(freqs, fr.norms[cand]).astype(np.float32, copy=False)
    return cand, scores
