"""Sorted-index top-N with early termination (SURVEY.md §2.6).

When segments were built with ``BuildConfig.sort_by=<col>`` their rows are
ascending in that column, so a top-N-by-that-field query examines only
each segment's head (or tail) — the IndexSortTest / TestEarlyTerminal
behavior (per-segment early termination + cross-segment merge) without
scoring a single posting.
"""

from __future__ import annotations

import heapq

import numpy as np

from ..search.searcher import IndexSearcher


def _first_idx_ge(col, hi: int, v) -> int:
    """First index i in the value-ascending column with col[i] >= v —
    O(log n) POINT reads (col[i].as_py()), never a full column load."""
    lo = 0
    while lo < hi:
        mid = (lo + hi) // 2
        if col[mid].as_py() < v:
            lo = mid + 1
        else:
            hi = mid
    return lo


def _first_idx_gt(col, hi: int, v) -> int:
    lo = 0
    while lo < hi:
        mid = (lo + hi) // 2
        if col[mid].as_py() <= v:
            lo = mid + 1
        else:
            hi = mid
    return lo


def sorted_field_topn(
    index_dir: str, field: str, k: int, descending: bool = False,
    after: tuple[object, int] | None = None,
) -> list[tuple[object, int]]:
    """[(field value, global docID)] of the top-k LIVE rows by the
    index-sort field. Reads O(k + deletes + boundary-tie run) docmap rows
    per segment, not the corpus. Raises if the index was not built with
    ``sort_by=field`` — early termination is only valid over segments that
    are actually ascending in that column (the manifest records the build's
    sort column, like Lucene's per-segment indexSort in SegmentInfo).

    Ties break by ASCENDING global docID (the implicit Lucene secondary
    sort). The stable index sort keeps equal values in docID order, so an
    ascending head already holds a tie run's lowest docIDs; a DESCENDING
    tail holds its highest — the window widens to the tie run's first row
    (binary point reads) so the right tie members survive the cut.

    ``after=(value, docID)`` pages: only rows strictly after that sort key
    qualify (TopFieldCollector searchAfter FieldDoc semantics); the
    window additionally covers the skipped prefix, located by the same
    O(log n) point-read bisection."""
    searcher = IndexSearcher(index_dir)
    recorded = getattr(searcher.manifest, "sort_by", "")
    if recorded != field:
        raise ValueError(
            f"index at {index_dir} was built with sort_by={recorded!r}; "
            f"sorted_field_topn({field!r}) would return wrong results on "
            "an unsorted docmap"
        )
    tombs = searcher.tombstones
    candidates: list[tuple[object, int]] = []
    for r in searcher.readers:
        n = r.doc_count
        lo, hi = r.doc_base, r.doc_base + n
        # early termination stays valid under deletes by widening the head
        # by this segment's tombstone count: the top-k live rows are always
        # within the first k + deleted rows of a sorted segment
        n_deleted = int(np.searchsorted(tombs, hi) - np.searchsorted(tombs, lo))
        col = r.docmap()[field]
        n_skip = 0
        if after is not None:
            # rows at-or-before the page: strictly-better values PLUS the
            # whole anchor-value tie run (the anchor may sit anywhere in it)
            if descending:
                n_skip = n - _first_idx_ge(col, n, after[0])
            else:
                n_skip = _first_idx_gt(col, n, after[0])
        take = min(k + n_deleted + n_skip, n)
        if descending:
            start = n - take
            if start > 0:
                # widen to the boundary value's FIRST row: the tail holds a
                # tie run's highest docIDs, but ties keep the lowest
                start = _first_idx_ge(col, start, col[start].as_py())
            take = n - start
        else:
            start = 0
        vals = col.slice(start, take).to_pylist()
        gdocs = np.arange(start, start + take, dtype=np.int64) + r.doc_base
        live = searcher._live(gdocs)
        for v, gd, ok in zip(vals, gdocs, live):
            if not ok:
                continue
            if after is not None:
                key_after = (_neg(after[0]), after[1]) if descending else (after[0], after[1])
                key_row = (_neg(v), int(gd)) if descending else (v, int(gd))
                if not (key_after < key_row):
                    continue  # at or before the anchor
            candidates.append((v, int(gd)))
    # cross-segment reduce; ties broken by ascending global docID
    if descending:
        return heapq.nsmallest(k, candidates, key=lambda t: (_neg(t[0]), t[1]))
    return heapq.nsmallest(k, candidates, key=lambda t: (t[0], t[1]))


class _neg:
    """Reverse-order wrapper for arbitrary comparable values."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        return other.v < self.v

    def __eq__(self, other):
        return self.v == other.v


def expression_sort_topn(
    searcher, source: str, k: int, descending: bool = True
) -> list[tuple[float, int]]:
    """Top-k LIVE docs by a compiled expression over doc-values columns —
    the expressions-module sort binding (s84 expressions/src/java/org/
    apache/lucene/expressions/ExpressionValueSource.java via
    Expression.getSortField): compile once, per segment bind each variable
    column (missing numeric doc values evaluate as 0, the
    ExpressionValueSource missing-sub-value contract), evaluate
    vectorized, keep an argpartition top-k partial, heap-merge across
    segments with ascending-docID tie-break. Returns [(value, docID)]."""
    from ..functions.expressions import compile_expression

    expr = compile_expression(source)
    if "_score" in expr.variables:
        raise ValueError("_score is not bindable in an index sort")
    partials: list[tuple[float, float, int]] = []  # (sort key, value, doc)
    tombs = searcher.tombstones
    for r in searcher.readers:
        bind = {}
        n = r.doc_count
        for var in expr.variables:
            col = np.asarray(r.doc_values(var), dtype=np.float64)
            bind[var] = np.nan_to_num(col, nan=0.0)
        vals = expr.evaluate(bind)
        if np.isscalar(vals) or getattr(vals, "ndim", 1) == 0:
            vals = np.full(n, float(vals), dtype=np.float64)
        gdocs = np.arange(n, dtype=np.int64) + r.doc_base
        if len(tombs):
            live = searcher._live(gdocs)
            vals, gdocs = vals[live], gdocs[live]
        key = -vals if descending else vals
        if len(key) > k:
            # deterministic partial: ties must keep the LOWEST docIDs, so
            # the cut is by (key, docID) — argpartition alone would drop
            # an arbitrary member of a tie straddling the k boundary
            idx = np.lexsort((gdocs, key))[:k]
            key, vals, gdocs = key[idx], vals[idx], gdocs[idx]
        partials.extend(
            zip(key.tolist(), vals.tolist(), (int(g) for g in gdocs))
        )
    top = heapq.nsmallest(k, partials, key=lambda t: (t[0], t[2]))
    return [(v, d) for _key, v, d in top]
