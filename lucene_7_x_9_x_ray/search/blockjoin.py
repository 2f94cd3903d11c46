"""Nested-document (block) join — the join module's ToParentBlockJoinQuery.

Behavioral reference: ``join/src/java/org/apache/lucene/search/join/
ToParentBlockJoinQuery.java`` (s84 :352-389 setScoreAndFreq) and
``ScoreMode.java``: documents index as contiguous blocks (children first,
their parent last — IndexWriter.addDocuments); a parent hit's score
aggregates its matching children's scores per ScoreMode, accumulating in
DOUBLE and casting once to float (Avg divides by the match count in
double). A child query that matches a parent doc is an illegal index /
query combination and raises, mirroring the reference's
IllegalStateException.

Engine shape: the parent bitset is a doc-values column (the
QueryBitSetProducer role — here a stored ``is_parent`` flag, decoded once
per reader and cached); child scores come from the ordinary eval_query
over the same segment, so the join is a segmented reduction
(searchsorted to the next parent + reduceat per parent run) with no
per-child Python. Blocks never span partitions by construction (the
block writer aligns parquet row groups to block boundaries), so
per-segment evaluation is exact — the same leaf-locality contract the
reference's index enforces.
"""

from __future__ import annotations

import numpy as np

SCORE_MODES = ("avg", "max", "total", "min", "none")


def eval_tochild_blockjoin(reader, query, stats, bm25):
    """ToChildBlockJoinQuery (s84 join/.../ToChildBlockJoinQuery.java:136):
    every child of a matching parent matches, carrying the PARENT's score
    verbatim. Returns (child local docIDs ascending, float32 scores). A
    parent query hitting a non-parent doc raises, mirroring the
    reference's validation in ToChildBlockJoinScorer.nextDoc."""
    from .scorers import _empty, eval_query

    parent_docs, parent_scores = eval_query(reader, query.parent, stats, bm25)
    if len(parent_docs) == 0:
        return _empty()
    parent_flags = np.asarray(reader.doc_values(query.parent_col))
    parents = np.flatnonzero(parent_flags != 0)
    if np.any(parent_flags[parent_docs] == 0):
        raise ValueError(
            "Parent query yields a doc which is not matched by parents filter "
            "(ToChildBlockJoinQuery.java:183 IllegalStateException)"
        )
    idx = np.searchsorted(parents, parent_docs)
    starts = np.where(idx > 0, parents[idx - 1] + 1, 0)
    counts = parent_docs - starts  # children per matched block
    keep = counts > 0  # childless parents emit nothing (reference skips them)
    starts, counts = starts[keep], counts[keep]
    scores = parent_scores[keep]
    if len(starts) == 0:
        return _empty()
    total = int(counts.sum())
    offs = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=offs[1:])
    out_docs = np.repeat(starts, counts) + (np.arange(total) - np.repeat(offs, counts))
    out_scores = np.repeat(scores, counts).astype(np.float32)
    if query.boost != 1.0:
        out_scores = (np.float32(query.boost) * out_scores).astype(np.float32)
    return out_docs, out_scores


def eval_blockjoin(reader, query, stats, bm25):
    """Returns (parent local docIDs ascending, float32 aggregated scores)."""
    from .scorers import _empty, eval_query

    if query.score_mode not in SCORE_MODES:
        raise ValueError(
            f"unknown score_mode {query.score_mode!r} (want {SCORE_MODES})"
        )
    child_docs, child_scores = eval_query(reader, query.child, stats, bm25)
    if len(child_docs) == 0:
        return _empty()
    parent_flags = np.asarray(reader.doc_values(query.parent_col))
    parents = np.flatnonzero(parent_flags != 0)
    if len(parents) == 0:
        raise ValueError(f"no parent docs ({query.parent_col} never set)")
    if np.any(parent_flags[child_docs] != 0):
        raise ValueError(
            "Child query must not match same docs with parent filter "
            "(ToParentBlockJoinQuery.java:380 IllegalStateException)"
        )
    pidx = np.searchsorted(parents, child_docs, side="right")
    if pidx[-1] >= len(parents):
        raise ValueError("malformed block: child doc after the last parent")
    # child_docs ascending => pidx nondecreasing: one reduceat per parent run
    starts = np.flatnonzero(np.r_[True, pidx[1:] != pidx[:-1]])
    counts = np.diff(np.r_[starts, len(pidx)])
    s64 = child_scores.astype(np.float64)
    mode = query.score_mode
    if mode in ("total", "avg"):
        agg = np.add.reduceat(s64, starts)
        if mode == "avg":
            agg = agg / counts
    elif mode == "max":
        agg = np.maximum.reduceat(s64, starts)
    elif mode == "min":
        agg = np.minimum.reduceat(s64, starts)
    else:  # none
        agg = np.zeros(len(starts), dtype=np.float64)
    out_scores = agg.astype(np.float32)
    if query.boost != 1.0:
        out_scores = (np.float32(query.boost) * out_scores).astype(np.float32)
    return parents[pidx[starts]], out_scores
