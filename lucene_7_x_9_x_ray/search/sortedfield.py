"""Sorted-index top-N with early termination (SURVEY.md §2.6).

When segments were built with ``BuildConfig.sort_by=<col>`` their rows are
ascending in that column, so a top-N-by-that-field query examines only
each segment's head (or tail) — the IndexSortTest / TestEarlyTerminal
behavior (per-segment early termination + cross-segment merge) without
scoring a single posting.
"""

from __future__ import annotations

import heapq

from ..search.searcher import IndexSearcher


def sorted_field_topn(
    index_dir: str, field: str, k: int, descending: bool = False
) -> list[tuple[object, int]]:
    """[(field value, global docID)] of the top-k rows by the index-sort
    field. Reads k docmap rows per segment, not the corpus."""
    searcher = IndexSearcher(index_dir)
    candidates: list[tuple[object, int]] = []
    for r in searcher.readers:
        dm = r.docmap()
        vals = dm[field].to_pylist()
        n = len(vals)
        take = min(k, n)
        if descending:
            rows = range(n - take, n)
        else:
            rows = range(take)
        for local in rows:
            candidates.append((vals[local], r.doc_base + local))
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
