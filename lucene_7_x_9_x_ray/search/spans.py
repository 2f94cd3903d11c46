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
- ``SpanContainingQuery`` / ``SpanWithinQuery`` (SpanContainingQuery
  .java:58, SpanWithinQuery.java:58): ContainSpans forward-cursor
  conjunction of big and little; containing emits big spans holding a
  little span, within emits little spans enclosed by a big span; both
  score with BOTH sides' terms (SpanContainQuery.java:100).

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
    if isinstance(query, (Q.SpanContainingQuery, Q.SpanWithinQuery)):
        return _span_terms(query.big) + _span_terms(query.little)
    raise TypeError(f"not a span query: {type(query).__name__}")


def _leaf_terms(clause) -> list[str]:
    """Terms of a LEAF clause (a SpanTermQuery or a SpanOrQuery of terms
    — the width-1 fast path whose merged position list is the clause's
    span stream). General SpanOrQuery clauses take the stream-merge path
    in _span_stream instead of this helper."""
    if isinstance(clause, Q.SpanTermQuery):
        return [clause.term]
    if isinstance(clause, Q.SpanOrQuery):
        out = []
        for c in clause.clauses:
            if not isinstance(c, Q.SpanTermQuery):
                raise ValueError("_leaf_terms is only for or-of-terms leaves")
            out.append(c.term)
        return out
    raise ValueError("not a term/or-of-terms leaf")


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
    if isinstance(query, (Q.SpanContainingQuery, Q.SpanWithinQuery)):
        fb, fl = span_field(query.big), span_field(query.little)
        if fb != fl:
            raise ValueError("Clauses must have same field.")
        return fb
    raise TypeError(f"not a span query: {type(query).__name__}")


def _scoring_terms(query) -> list[str]:
    """Distinct terms feeding the SimScorer, sorted (SpanNotWeight uses
    the include side only)."""
    if isinstance(query, Q.SpanNotQuery):
        return sorted(set(_span_terms(query.include)))
    return sorted(set(_span_terms(query)))


# --- span streams -----------------------------------------------------------
#
# A clause evaluates per doc to a SPAN STREAM: parallel arrays
# (starts, ends, widths) in emission order. Every stream this module
# produces is sorted by start with NON-DECREASING ends — true for term /
# or-of-term leaves (ends = p+1), preserved inductively by ordered near
# (the chain's final end is monotone in the clause-0 index), unordered
# near (min-start advances; maxEnd is a running max), and the
# first/range/not filters (subsequences). That invariant is what lets the
# ordered chain stay a vectorized independent searchsorted per clause-0
# match even when clauses are NESTED span queries (width > 1).

_EMPTY_STREAM = (
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=np.int64),
)


def _ordered_spans(streams, slop: int):
    """NearSpansOrdered matches over sub-span streams, emission =
    clause-0 start order: for each clause-0 span, every later clause
    advances to its first span with start >= previous end; matchWidth =
    sum of the gaps (start_i - prevEnd) only — inner widths count solely
    against the inner query's own slop (NearSpansOrdered.java:46-100).
    Returns (starts = clause-0 starts, ends = final clause ends,
    widths).

    The vectorized independent-lookup form requires every stream's ends
    to be non-decreasing (true for term/or-of-term leaves and nested
    nears — see the stream invariant above). A SpanOr over sub-spans of
    DIFFERENT widths can emit decreasing ends; those streams take the
    literal stateful loop (_ordered_spans_literal), which is the Java
    iterator's actual forward-only behavior."""
    s0, e0, _w0 = streams[0]
    if len(s0) == 0:
        return _EMPTY_STREAM
    if any(len(ei) and np.any(np.diff(ei) < 0) for _si, ei, _wi in streams):
        return _ordered_spans_literal(streams, slop)
    prev_end = e0.copy()
    width = np.zeros(len(s0), dtype=np.int64)
    alive = np.ones(len(s0), dtype=bool)
    for si, ei, _wi in streams[1:]:
        idx = np.searchsorted(si, prev_end)
        alive &= idx < len(si)
        safe = np.minimum(idx, max(len(si) - 1, 0))
        start = si[safe] if len(si) else np.zeros(len(s0), dtype=np.int64)
        width = width + np.where(alive, start - prev_end, 0)
        prev_end = np.where(alive, ei[safe] if len(ei) else 0, prev_end)
    keep = alive & (width <= slop)
    return s0[keep], prev_end[keep], width[keep]


def _ordered_spans_literal(streams, slop: int):
    """Literal stateful NearSpansOrdered (forward-only sub-iterators,
    NearSpansOrdered.java:46-100) — the general-streams path used when a
    clause's ends are non-monotone (or-of-different-width sub-spans)."""
    n = len(streams)
    ptr = [0] * n
    out_s, out_e, out_w = [], [], []
    starts0, ends0, _ = streams[0]
    for i0 in range(len(starts0)):
        prev_end = int(ends0[i0])
        width = 0
        for i in range(1, n):
            si, ei, _wi = streams[i]
            while ptr[i] < len(si) and si[ptr[i]] < prev_end:
                ptr[i] += 1
            if ptr[i] >= len(si):  # oneExhaustedInCurrentDoc
                return (
                    np.asarray(out_s, dtype=np.int64),
                    np.asarray(out_e, dtype=np.int64),
                    np.asarray(out_w, dtype=np.int64),
                )
            width += int(si[ptr[i]]) - prev_end
            prev_end = int(ei[ptr[i]])
        if width <= slop:
            out_s.append(int(starts0[i0]))
            out_e.append(prev_end)
            out_w.append(width)
    return (
        np.asarray(out_s, dtype=np.int64),
        np.asarray(out_e, dtype=np.int64),
        np.asarray(out_w, dtype=np.int64),
    )


def _unordered_spans(streams, slop: int):
    """NearSpansUnordered matches over sub-span streams — a literal
    transcription of SpanTotalLengthEndPositionWindow generalized to
    width > 1 sub-spans: totalSpanLength = Σ current (end - start),
    maxEnd = running max of ends; a state matches iff
    maxEnd - minStart - totalSpanLength <= slop, then the min (start,
    end) iterator advances; its exhaustion ends the doc. Ties at equal
    (start, end) follow lowest clause index."""
    n = len(streams)
    if any(len(s[0]) == 0 for s in streams):
        return _EMPTY_STREAM
    ptr = [0] * n
    lens = [int(s[1][0] - s[0][0]) for s in streams]
    total_len = sum(lens)
    max_end = max(int(s[1][0]) for s in streams)
    out_s, out_e, out_w = [], [], []
    while True:
        top = min(
            range(n),
            key=lambda i: (int(streams[i][0][ptr[i]]), int(streams[i][1][ptr[i]])),
        )
        min_start = int(streams[top][0][ptr[top]])
        if max_end - min_start - total_len <= slop:
            out_s.append(min_start)
            out_e.append(max_end)
            out_w.append(max_end - min_start)
        ptr[top] += 1
        if ptr[top] >= len(streams[top][0]):
            return (
                np.asarray(out_s, dtype=np.int64),
                np.asarray(out_e, dtype=np.int64),
                np.asarray(out_w, dtype=np.int64),
            )
        total_len += int(
            streams[top][1][ptr[top]] - streams[top][0][ptr[top]]
        ) - lens[top]
        lens[top] = int(streams[top][1][ptr[top]] - streams[top][0][ptr[top]])
        max_end = max(max_end, int(streams[top][1][ptr[top]]))


def _ordered_widths(pos_lists: list[np.ndarray], slop: int) -> np.ndarray:
    """NearSpansOrdered match widths for width-1 term clauses (the
    original flat path; thin wrapper over _ordered_spans)."""
    streams = [
        (np.asarray(pl, dtype=np.int64), np.asarray(pl, dtype=np.int64) + 1,
         np.zeros(len(pl), dtype=np.int64))
        for pl in pos_lists
    ]
    return _ordered_spans(streams, slop)[2]


def _unordered_widths(pos_lists: list[np.ndarray], slop: int) -> list[int]:
    """NearSpansUnordered match widths for width-1 term clauses (wrapper
    over _unordered_spans; for term spans maxEnd always = max current
    end, so the generalized window reduces to the original loop)."""
    streams = [
        (np.asarray(pl, dtype=np.int64), np.asarray(pl, dtype=np.int64) + 1,
         np.zeros(len(pl), dtype=np.int64))
        for pl in pos_lists
    ]
    return list(_unordered_spans(streams, slop)[2])


def _leaf_stream(clause, pos_of):
    """Stream of a term / or-of-terms clause: merged positions as width-0
    spans. Like SpanOrQuery's SpanQueue merge, equal positions across
    different terms are NOT deduped (one span per term occurrence,
    SpanOrQuery.java) — keeping this path consistent with the general
    nested-SpanOr path below on corpora where positions can collide."""
    parts = [p for t in _leaf_terms(clause) for p in (pos_of(t),) if len(p)]
    if not parts:
        return _EMPTY_STREAM
    p = parts[0] if len(parts) == 1 else np.sort(np.concatenate(parts), kind="stable")
    p = np.asarray(p, dtype=np.int64)
    return p, p + 1, np.zeros(len(p), dtype=np.int64)


def _span_stream(query, pos_of):
    """Evaluate a span tree for ONE doc to its match stream (starts,
    ends, widths) in emission order. ``pos_of(term)`` returns the doc's
    sorted positions of a term (possibly empty). Nested SpanNearQuery
    clauses are supported: an inner near's (slop-filtered) matches are
    the spans the outer near consumes."""
    if isinstance(query, Q.SpanTermQuery):
        return _leaf_stream(query, pos_of)
    if isinstance(query, Q.SpanOrQuery):
        if all(isinstance(c, Q.SpanTermQuery) for c in query.clauses):
            return _leaf_stream(query, pos_of)  # merged positions, no dedup
        # general SpanOrQuery: the queue's merged emission in (start, end)
        # order across sub-spans (SpanOrQuery.java SpanQueue), no dedup.
        # Different-width sub-spans can make ends non-monotone — consumers
        # (ordered near) detect that and take the literal stateful path.
        subs = [_span_stream(c, pos_of) for c in query.clauses]
        s = np.concatenate([x[0] for x in subs])
        e = np.concatenate([x[1] for x in subs])
        w = np.concatenate([x[2] for x in subs])
        order = np.lexsort((e, s))
        return s[order], e[order], w[order]
    if isinstance(query, Q.SpanNearQuery):
        streams = [_span_stream(c, pos_of) for c in query.clauses]
        if any(len(s[0]) == 0 for s in streams):
            return _EMPTY_STREAM  # ConjunctionSpans: every clause required
        if query.in_order:
            return _ordered_spans(streams, query.slop)
        return _unordered_spans(streams, query.slop)
    if isinstance(query, Q.SpanFirstQuery):
        s, e, w = _span_stream(query.match, pos_of)
        keep = e <= query.end
        return s[keep], e[keep], w[keep]
    if isinstance(query, Q.SpanPositionRangeQuery):
        # SpanPositionRangeQuery.acceptPosition: start >= start AND end <= end
        s, e, w = _span_stream(query.match, pos_of)
        keep = (s >= query.start) & (e <= query.end)
        return s[keep], e[keep], w[keep]
    if isinstance(query, Q.SpanNotQuery):
        s, e, w = _span_stream(query.include, pos_of)
        es, ee, _ = _span_stream(query.exclude, pos_of)
        if len(es) == 0 or len(s) == 0:
            return s, e, w
        # reject include span [s, e) iff some exclude span overlaps the
        # window [s - pre, e + post): es < e + post AND ee > s - pre.
        # exclude ends are non-decreasing (stream invariant), so the
        # candidates with es < e+post form a prefix and max(ee) over a
        # prefix is a running maximum.
        run_max_ee = np.maximum.accumulate(ee)
        idx = np.searchsorted(es, e + query.post)  # first es >= e+post
        has = idx > 0
        reject = has & (run_max_ee[np.maximum(idx - 1, 0)] > s - query.pre)
        keep = ~reject
        return s[keep], e[keep], w[keep]
    if isinstance(query, Q.SpanContainingQuery):
        bs, be, bw = _span_stream(query.big, pos_of)
        ls, le, _lw = _span_stream(query.little, pos_of)
        if len(bs) == 0 or len(ls) == 0:
            return _EMPTY_STREAM  # prepareConjunction: both sides required
        # ContainSpans (SpanContainingQuery.java:58): per big span, the
        # forward-only little cursor stops at the first little.start >=
        # big.start; match iff big.end >= that little's end. Big starts
        # ascending makes the cursor = searchsorted; with non-decreasing
        # little ends the checked little has the minimal end of the
        # suffix, so the lookup equals the declarative "exists contained
        # little". Non-monotone little ends take the literal cursor loop.
        if len(le) and np.any(np.diff(le) < 0):
            return _contain_spans_literal(bs, be, bw, ls, le, source="big")
        idx = np.searchsorted(ls, bs)
        ok = idx < len(ls)
        safe = np.minimum(idx, len(ls) - 1)
        keep = ok & (be >= le[safe])
        return bs[keep], be[keep], bw[keep]
    if isinstance(query, Q.SpanWithinQuery):
        bs, be, _bw = _span_stream(query.big, pos_of)
        ls, le, lw = _span_stream(query.little, pos_of)
        if len(bs) == 0 or len(ls) == 0:
            return _EMPTY_STREAM
        # SpanWithinQuery.java:58: per little span, the forward-only big
        # cursor stops at the first big.end >= little.end; match iff that
        # big's start <= little.start. Non-decreasing big ends make the
        # cursor a searchsorted over ends (the suffix's minimal start is
        # its first element, so the single check equals "exists
        # enclosing big").
        if len(be) and np.any(np.diff(be) < 0):
            return _contain_spans_literal(bs, be, lw, ls, le, source="little")
        idx = np.searchsorted(be, le)
        ok = idx < len(bs)
        safe = np.minimum(idx, len(bs) - 1)
        keep = ok & (bs[safe] <= ls)
        return ls[keep], le[keep], lw[keep]
    raise TypeError(f"not a span query: {type(query).__name__}")


def _contain_spans_literal(bs, be, sw, ls, le, *, source: str):
    """Literal forward-cursor ContainSpans for non-monotone-end streams
    (ContainSpans.java iterators transcribed; ``source`` picks which side
    is emitted, 'big' = SpanContaining, 'little' = SpanWithin). ``sw`` is
    the emitted side's width array."""
    out_s, out_e, out_w = [], [], []
    if source == "big":
        j = 0
        for i in range(len(bs)):
            while j < len(ls) and ls[j] < bs[i]:
                j += 1
            if j >= len(ls):
                break  # oneExhaustedInCurrentDoc
            if be[i] >= le[j]:
                out_s.append(int(bs[i]))
                out_e.append(int(be[i]))
                out_w.append(int(sw[i]))
    else:
        j = 0
        for i in range(len(ls)):
            while j < len(bs) and be[j] < le[i]:
                j += 1
            if j >= len(bs):
                break
            if bs[j] <= ls[i]:
                out_s.append(int(ls[i]))
                out_e.append(int(le[i]))
                out_w.append(int(sw[i]))
    return (
        np.asarray(out_s, dtype=np.int64),
        np.asarray(out_e, dtype=np.int64),
        np.asarray(out_w, dtype=np.int64),
    )


def _validate_span_scope(query):
    """Supported span tree shapes (raises on anything wider): leaves are
    SpanTermQuery / SpanOrQuery-of-terms; SpanNearQuery clauses may be
    leaves or nested SpanNearQuery (near-of-near); first/range/not wrap
    any supported tree (SpanNot's exclude included)."""
    if isinstance(query, Q.SpanTermQuery):
        return
    if isinstance(query, (Q.SpanNearQuery, Q.SpanOrQuery)):
        for c in query.clauses:
            _validate_span_scope(c)
        return
    if isinstance(query, (Q.SpanFirstQuery, Q.SpanPositionRangeQuery)):
        _validate_span_scope(query.match)
        return
    if isinstance(query, Q.SpanNotQuery):
        _validate_span_scope(query.include)
        _validate_span_scope(query.exclude)
        return
    if isinstance(query, (Q.SpanContainingQuery, Q.SpanWithinQuery)):
        _validate_span_scope(query.big)
        _validate_span_scope(query.little)
        return
    raise TypeError(f"not a span query: {type(query).__name__}")


def _required_leaves(query) -> list[list[str]]:
    """Conjunction structure for the candidate-doc prefilter: a list of
    term groups where a doc must contain >= 1 term of EVERY group (a
    SpanNot contributes only its include side; an or-group is its term
    set; nears require all their clauses)."""
    if isinstance(query, Q.SpanTermQuery):
        return [[query.term]]
    if isinstance(query, Q.SpanOrQuery):
        # a doc matches the or iff ANY clause matches: the safe prefilter
        # is one group of ALL leaf terms (a superset; per-doc evaluation
        # rejects non-matches)
        return [_span_terms(query)]
    if isinstance(query, Q.SpanNearQuery):
        out = []
        for c in query.clauses:
            out += _required_leaves(c)
        return out
    if isinstance(query, (Q.SpanFirstQuery, Q.SpanPositionRangeQuery)):
        return _required_leaves(query.match)
    if isinstance(query, Q.SpanNotQuery):
        return _required_leaves(query.include)
    if isinstance(query, (Q.SpanContainingQuery, Q.SpanWithinQuery)):
        # prepareConjunction: a doc must produce spans on BOTH sides
        return _required_leaves(query.big) + _required_leaves(query.little)
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

    _validate_span_scope(query)
    groups = _required_leaves(query)  # conjunction of or-groups
    # per-LEAF postings; absent leaves keep an empty placeholder (an
    # or-clause matches if ANY of its terms does; an absent SpanNot
    # exclude lets includes pass through)
    leaf_post: dict[str, tuple] = {}
    for t in set(_span_terms(query)):
        tpp = fr.term_positions(t)
        leaf_post[t] = tpp if tpp is not None else (
            np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64)
        )

    # candidates = docs containing >= 1 term of EVERY required group
    # (ConjunctionSpans prefilter; SpanNot excludes don't gate candidacy)
    cand = None
    for terms in groups:
        gd = np.unique(np.concatenate([leaf_post[t][0] for t in terms]))
        cand = gd if cand is None else np.intersect1d(cand, gd, assume_unique=True)
    if cand is None or len(cand) == 0:
        return _empty()

    from .scorers import _positions_cursor, sum_idf_weight

    leaves = sorted(leaf_post)
    per_leaf = [leaf_post[t] for t in leaves]
    leaf_idx = {t: i for i, t in enumerate(leaves)}
    locs, offs = _positions_cursor(per_leaf, cand)
    freqs = np.zeros(len(cand), dtype=np.float64)
    empty_pos = np.empty(0, dtype=np.int64)
    for ci in range(len(cand)):
        def pos_of(t: str, _ci=ci) -> np.ndarray:
            ti = leaf_idx[t]
            d, _f, p = per_leaf[ti]
            li = locs[ti][_ci]
            if li < len(d) and d[li] == cand[_ci]:
                return np.asarray(p[offs[ti][li] : offs[ti][li + 1]], dtype=np.int64)
            return empty_pos

        _s, _e, widths = _span_stream(query, pos_of)
        if len(widths):
            freqs[ci] = float(_sloppy_fold(widths))

    keep = freqs > 0
    cand, freqs = cand[keep], freqs[keep]
    if len(cand) == 0:
        return _empty()

    tw = sum_idf_weight(_scoring_terms(query), field, stats, bm25, query.boost)
    scores = tw.score(freqs, fr.norms[cand]).astype(np.float32, copy=False)
    return cand, scores
