"""Span-query tests: the reference demo corpus by hand, literal-Java-loop
duels for the ordered and unordered iterators, SpanFirst/SpanNot window
checks, and gate-vs-oracle parity."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_7_x_9_x_ray.search import queries as Q
from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
from lucene_7_x_9_x_ray.search.spans import _ordered_widths, _unordered_widths
from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index_local


def _index(tmp_path, texts: list[str]) -> IndexSearcher:
    n = len(texts)
    t = pa.table(
        {
            "url": pa.array([f"d/{i}" for i in range(n)], pa.string()),
            "warc_ts": pa.array(np.zeros(n, dtype="datetime64[us]")),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
        }
    )
    path = str(tmp_path / "pages.parquet")
    pq.write_table(t, path)
    idx = str(tmp_path / "idx")
    build_index_local([path], idx, BuildConfig(analyzer="whitespace"))
    return IndexSearcher(idx)


def test_spannear_unordered_demo_corpus(tmp_path):
    # LuceneDemo8.7.0 SpanNearQueryTest.java: four docs, q = near(you, boy),
    # slop=1, unordered. Hand trace of NearSpansUnordered:
    #   doc0 "you are good boy": maxEnd-minStart-2 = 4-0-2 = 2 > 1 -> no
    #   doc1 "you good boy":     3-0-2 = 1 <= 1 -> match, width 3
    #   doc2 "you are really good boy": 5-0-2 = 3 -> no
    #   doc3 "boy good you":     3-0-2 = 1 -> match, width 3
    s = _index(
        tmp_path,
        ["you are good boy", "you good boy", "you are really good boy", "boy good you"],
    )
    q = Q.SpanNearQuery(
        (Q.SpanTermQuery("you"), Q.SpanTermQuery("boy")), slop=1, in_order=False
    )
    td = s.search(q, k=10)
    assert sorted(int(d) for d in td.doc_ids) == [1, 3]
    # ordered with the same slop gives the same two docs (you precedes boy
    # in doc1; doc3 "boy good you" has you AFTER boy -> ordered rejects it)
    q_ord = Q.SpanNearQuery(
        (Q.SpanTermQuery("you"), Q.SpanTermQuery("boy")), slop=1, in_order=True
    )
    td2 = s.search(q_ord, k=10)
    assert sorted(int(d) for d in td2.doc_ids) == [1]


def _ordered_literal(pos_lists, slop):
    """Literal transcription of NearSpansOrdered.twoPhaseCurrentDocMatches
    + nextStartPosition + stretchToOrder (NearSpansOrdered.java:46-100):
    stateful sub-iterators that only move forward, doc over on exhaustion."""
    n = len(pos_lists)
    ptr = [0] * n
    widths = []
    i0 = 0
    while i0 < len(pos_lists[0]):
        prev_end = pos_lists[0][i0] + 1
        width = 0
        for i in range(1, n):
            while ptr[i] < len(pos_lists[i]) and pos_lists[i][ptr[i]] < prev_end:
                ptr[i] += 1
            if ptr[i] >= len(pos_lists[i]):
                return widths  # oneExhaustedInCurrentDoc
            width += pos_lists[i][ptr[i]] - prev_end
            prev_end = pos_lists[i][ptr[i]] + 1
        if width <= slop:
            widths.append(width)
        i0 += 1
    return widths


def test_ordered_vectorized_duels_literal():
    rng = np.random.default_rng(42)
    for _ in range(600):
        n = int(rng.integers(2, 5))
        pool = rng.permutation(40)
        lists, at = [], 0
        for _i in range(n):
            ln = int(rng.integers(1, 7))
            lists.append(np.sort(pool[at : at + ln]).astype(np.int64))
            at += ln
        slop = int(rng.integers(0, 8))
        got = list(_ordered_widths(lists, slop))
        want = _ordered_literal([list(map(int, pl)) for pl in lists], slop)
        assert got == want, (lists, slop, got, want)


def _unordered_rule(A, B, slop):
    """The declarative visited-state characterization used by the SQL
    oracle: (a, b) visited iff no a' in [b, a) and no b' in [a, b)."""
    out = []
    for a in A:
        for b in B:
            if any(b <= a2 < a for a2 in A):
                continue
            if any(a <= b2 < b for b2 in B):
                continue
            if max(a, b) - min(a, b) - 1 <= slop:
                out.append((min(a, b), max(a, b) - min(a, b) + 1))
    out.sort()
    return [w for _, w in out]


def test_unordered_literal_duels_declarative_rule():
    rng = np.random.default_rng(7)
    for _ in range(600):
        pool = rng.permutation(30)
        la = int(rng.integers(1, 8))
        lb = int(rng.integers(1, 8))
        A = np.sort(pool[:la]).astype(np.int64)
        B = np.sort(pool[la : la + lb]).astype(np.int64)
        slop = int(rng.integers(0, 8))
        got = _unordered_widths([A, B], slop)
        want = _unordered_rule(list(map(int, A)), list(map(int, B)), slop)
        assert got == want, (A, B, slop, got, want)


def _lit_ordered_streams(streams, slop):
    """Literal stateful NearSpansOrdered over (start, end) sub-span
    streams: sub-iterators only move forward; matchWidth = sum of gaps;
    any clause exhausting ends the doc."""
    n = len(streams)
    ptr = [0] * n
    out = []
    starts0, ends0 = streams[0]
    for i0 in range(len(starts0)):
        prev_end = int(ends0[i0])
        width = 0
        for i in range(1, n):
            si, ei = streams[i]
            while ptr[i] < len(si) and si[ptr[i]] < prev_end:
                ptr[i] += 1
            if ptr[i] >= len(si):
                return out
            width += int(si[ptr[i]]) - prev_end
            prev_end = int(ei[ptr[i]])
        if width <= slop:
            out.append((int(starts0[i0]), prev_end, width))
    return out


def test_nested_ordered_vectorized_duels_literal():
    """near(near(a, b, islop), c, oslop): the vectorized two-level chain
    (inner matches become the outer's sub-spans) duels a fully stateful
    literal evaluation — inner matches enumerated by the literal flat
    loop, outer by the literal sub-span loop."""
    from lucene_7_x_9_x_ray.search.spans import _ordered_spans, _span_stream

    rng = np.random.default_rng(13)
    for _ in range(600):
        pool = rng.permutation(50)
        la, lb, lc = (int(rng.integers(1, 8)) for _ in range(3))
        A = np.sort(pool[:la]).astype(np.int64)
        B = np.sort(pool[la : la + lb]).astype(np.int64)
        C = np.sort(pool[la + lb : la + lb + lc]).astype(np.int64)
        islop = int(rng.integers(0, 8))
        oslop = int(rng.integers(0, 10))

        # literal: inner matches via the flat literal loop -> spans
        inner = _lit_ordered_streams(
            [(A, A + 1), (B, B + 1)], islop
        )
        want = _lit_ordered_streams(
            [(np.array([s for s, _, _ in inner], dtype=np.int64),
              np.array([e for _, e, _ in inner], dtype=np.int64)),
             (C, C + 1)],
            oslop,
        )

        q = Q.SpanNearQuery(
            (Q.SpanNearQuery((Q.SpanTermQuery("a"), Q.SpanTermQuery("b")),
                             slop=islop, in_order=True),
             Q.SpanTermQuery("c")),
            slop=oslop, in_order=True,
        )
        pos = {"a": A, "b": B, "c": C}
        s, e, w = _span_stream(q, lambda t: pos[t])
        got = list(zip(map(int, s), map(int, e), map(int, w)))
        assert got == want, (A, B, C, islop, oslop, got, want)


def test_or_of_nears_takes_literal_path():
    """SpanOr over different-width sub-spans emits non-monotone ends, so
    an outer ordered near must use the literal stateful iterator. Trace:
    doc tokens: a@0 b@3 c@4 d@5 x@9.
      or(near(a,b,slop3,ord), near(c,d,0,ord)) -> spans (0,4,w2), (4,6,w0)
      sorted by start: ends 4 then 6 — monotone here, so craft harder:
      a@0 b@5 (span (0,6,w4)), c@1 d@2 (span (1,3,w0)) -> ends 6, 3
      non-monotone. near(or, x@8, slop) stateful: clause-1 iterator only
      moves forward."""
    from lucene_7_x_9_x_ray.search.spans import _span_stream

    pos = {"a": np.array([0]), "b": np.array([5]),
           "c": np.array([1]), "d": np.array([2]), "x": np.array([8])}
    pf = lambda t: np.asarray(pos[t], dtype=np.int64)
    inner = Q.SpanOrQuery((
        Q.SpanNearQuery((Q.SpanTermQuery("a"), Q.SpanTermQuery("b")),
                        slop=4, in_order=True),
        Q.SpanNearQuery((Q.SpanTermQuery("c"), Q.SpanTermQuery("d")),
                        slop=0, in_order=True),
    ))
    s, e, w = _span_stream(inner, pf)
    assert list(s) == [0, 1] and list(e) == [6, 3]  # non-monotone ends

    q = Q.SpanNearQuery((inner, Q.SpanTermQuery("x")), slop=10, in_order=True)
    s, e, w = _span_stream(q, pf)
    # literal stateful semantics: or-span (0,6) stretches x to 8 (gap 2,
    # match); or-span (1,3) stretches x — iterator already AT 8 (forward
    # only), gap 8-3=5, match. Ordered by clause-0 starts.
    assert list(s) == [0, 1] and list(e) == [9, 9] and list(w) == [2, 5]

    # tight slop keeps only the first
    q1 = Q.SpanNearQuery((inner, Q.SpanTermQuery("x")), slop=2, in_order=True)
    s, e, w = _span_stream(q1, pf)
    assert list(s) == [0] and list(w) == [2]


def test_nested_unordered_end_to_end(tmp_path):
    """unordered near with a nested ordered-near clause, hand-traced:
    doc 'x a b y y c' — inner ord(a,b,0) matches [1,3); unordered
    (inner, c) with slop 2: maxEnd 6, minStart 1, totalLen 2+1 ->
    6-1-3 = 2 <= 2 matches, width 5."""
    from lucene_7_x_9_x_ray.search.spans import _span_stream

    inner = Q.SpanNearQuery(
        (Q.SpanTermQuery("a"), Q.SpanTermQuery("b")), slop=0, in_order=True
    )
    q = Q.SpanNearQuery((inner, Q.SpanTermQuery("c")), slop=2, in_order=False)
    pos = {"a": np.array([1]), "b": np.array([2]), "c": np.array([5])}
    s, e, w = _span_stream(q, lambda t: np.asarray(pos[t], dtype=np.int64))
    assert list(s) == [1] and list(e) == [6] and list(w) == [5]
    # slop 1: 6-1-3 = 2 > 1 -> no match
    q1 = Q.SpanNearQuery((inner, Q.SpanTermQuery("c")), slop=1, in_order=False)
    s, e, w = _span_stream(q1, lambda t: np.asarray(pos[t], dtype=np.int64))
    assert len(s) == 0


def test_spanfirst_and_spannot_windows(tmp_path):
    s = _index(
        tmp_path,
        [
            "cat dog bird cat",      # cat@0,3 dog@1
            "bird bird cat dog",     # cat@2 dog@3
            "dog cat cat dog fish",  # cat@1,2 dog@0,3
        ],
    )
    # SpanFirst(cat, end=2): spans ending at or before 2 -> p <= 1
    td = s.search(Q.SpanFirstQuery(Q.SpanTermQuery("cat"), end=2), k=10)
    assert sorted(int(d) for d in td.doc_ids) == [0, 2]
    # SpanNot(cat, dog, pre=0, post=1): reject cat@p with dog in [p, p+1]
    # doc0: cat@0 (dog@1 rejects), cat@3 (no dog in [3,4]) -> kept
    # doc1: cat@2 (dog@3 rejects) -> dropped
    # doc2: cat@1 (no dog in [1,2]), cat@2 (dog@3 rejects) -> kept via cat@1
    td = s.search(
        Q.SpanNotQuery(Q.SpanTermQuery("cat"), Q.SpanTermQuery("dog"), pre=0, post=1),
        k=10,
    )
    assert sorted(int(d) for d in td.doc_ids) == [0, 2]
    # absent exclude term: include passes through untouched
    td = s.search(
        Q.SpanNotQuery(Q.SpanTermQuery("cat"), Q.SpanTermQuery("zzz")), k=10
    )
    assert sorted(int(d) for d in td.doc_ids) == [0, 1, 2]


def test_span_gate_oracle_parity(ray_session):
    import duckdb as _dd

    from lucene_7_x_9_x_ray.pipelines import flagship, oracles

    sf = "/root/testdata/sf0.001"
    got = flagship.q_span_topk(sf)
    con = _dd.connect()
    con.sql(f"create view documents as select * from '{sf}/documents.parquet'")
    want = con.sql(oracles.span_topk_sql(flagship.SPAN_TOPK_SPECS)).arrow()
    key = [("query_id", "ascending"), ("rank", "ascending")]
    assert got.sort_by(key).equals(want.cast(got.schema).sort_by(key))
    # every spec returns a full page
    assert got.num_rows == sum(k for *_, k in flagship.SPAN_TOPK_SPECS)


def test_spanor_standalone_and_as_near_clause(tmp_path):
    s = _index(
        tmp_path,
        [
            "cat fish dog",   # or(cat,dog) positions 0,2
            "bird fish cat",  # or positions: 2
            "fish bird wolf",
        ],
    )
    # standalone or: freq = total occurrences across clause terms (width 0)
    q_or = Q.SpanOrQuery((Q.SpanTermQuery("cat"), Q.SpanTermQuery("dog")))
    td = s.search(q_or, k=10)
    assert sorted(int(d) for d in td.doc_ids) == [0, 1]

    # or-of-terms as a near clause: near([or(cat,dog), fish], slop=0,
    # ordered) — doc0 matches via dog? no: ordered needs or-span BEFORE
    # fish. doc0 "cat fish dog": cat@0 then fish@1 adjacent -> match.
    # doc1 "bird fish cat": cat@2 after fish -> no ordered match.
    q = Q.SpanNearQuery((q_or, Q.SpanTermQuery("fish")), slop=0, in_order=True)
    td = s.search(q, k=10)
    assert sorted(int(d) for d in td.doc_ids) == [0]
    # unordered picks doc1 up too (fish@1, cat@2 within slop 0)
    q = Q.SpanNearQuery((q_or, Q.SpanTermQuery("fish")), slop=0, in_order=False)
    td = s.search(q, k=10)
    assert sorted(int(d) for d in td.doc_ids) == [0, 1]


def test_span_position_range(tmp_path):
    s = _index(tmp_path, ["cat a cat b cat", "a b cat"])
    # start >= 1 and end <= 5: doc0 keeps cat@2,4; cat@0 fails start.
    # doc1 keeps cat@2.
    td = s.search(
        Q.SpanPositionRangeQuery(Q.SpanTermQuery("cat"), start=1, end=5), k=10
    )
    assert sorted(int(d) for d in td.doc_ids) == [0, 1]
    # start >= 3: only doc0's cat@4 survives
    td = s.search(
        Q.SpanPositionRangeQuery(Q.SpanTermQuery("cat"), start=3, end=5), k=10
    )
    assert sorted(int(d) for d in td.doc_ids) == [0]


def _unordered_independent(pos_lists, slop):
    """Independent reimplementation of NearSpansUnordered for the duel:
    explicit heapq over (start, end, clause) with Lucene's
    positionsOrdered tie rule, recomputing totalSpanLength/maxEnd from
    scratch each step (the production code maintains them incrementally)."""
    import heapq

    n = len(pos_lists)
    ptr = [0] * n
    if any(len(pl) == 0 for pl in pos_lists):
        return []
    widths = []
    while True:
        heap = [(int(pos_lists[i][ptr[i]]), int(pos_lists[i][ptr[i]]) + 1, i)
                for i in range(n)]
        heapq.heapify(heap)
        start, _end, top = heap[0]
        max_end = max(int(pos_lists[i][ptr[i]]) + 1 for i in range(n))
        total_len = n
        if max_end - start - total_len <= slop:
            widths.append(max_end - start)
        ptr[top] += 1
        if ptr[top] >= len(pos_lists[top]):
            return widths


def test_unordered_nary_duels_independent_impl():
    rng = np.random.default_rng(99)
    for _ in range(400):
        n = int(rng.integers(2, 5))
        pool = rng.permutation(36)
        lists, at = [], 0
        for _i in range(n):
            ln = int(rng.integers(1, 6))
            lists.append(np.sort(pool[at : at + ln]).astype(np.int64))
            at += ln
        slop = int(rng.integers(0, 10))
        got = _unordered_widths(lists, slop)
        want = _unordered_independent(lists, slop)
        assert got == want, (lists, slop, got, want)
    # hand-traced 3-clause case: a@{0,9} b@{3} c@{5}
    # states: (0,3,5): maxEnd 6, top a@0 -> 6-0-3=3; advance a ->
    # (9,3,5): top b@3 -> maxEnd 10, 10-3-3=4; advance b -> exhausted
    lists = [np.array([0, 9]), np.array([3]), np.array([5])]
    assert _unordered_widths(lists, 3) == [6]
    assert _unordered_widths(lists, 4) == [6, 7]


def test_spanor_leaf_matches_general_on_colliding_positions():
    """The or-of-terms fast path and the general SpanOr queue must emit
    the SAME stream even when two terms share a position (SpanOrQuery
    emits one span per term occurrence — no dedup on either path)."""
    from lucene_7_x_9_x_ray.search.spans import _leaf_stream, _span_stream

    pos = {
        "a": np.array([1, 4, 7], dtype=np.int64),
        "b": np.array([4, 9], dtype=np.int64),   # collides with a@4
        "c": np.array([], dtype=np.int64),
    }
    q = Q.SpanOrQuery((Q.SpanTermQuery("a"), Q.SpanTermQuery("b"),
                       Q.SpanTermQuery("c")))
    leaf = _leaf_stream(q, lambda t: pos[t])
    # force the general path by nesting a non-term clause shape: build the
    # equivalent stream via per-clause concatenation + (start, end) sort
    subs = [_span_stream(Q.SpanTermQuery(t), lambda t=t: pos[t]) for t in "abc"]
    s = np.concatenate([x[0] for x in subs])
    order = np.argsort(s, kind="stable")
    assert np.array_equal(leaf[0], np.sort(s))
    assert len(leaf[0]) == 5  # a@4 and b@4 both emitted
    assert np.array_equal(leaf[1], leaf[0] + 1)


def test_spancontaining_and_within_hand_corpus(tmp_path):
    # doc0: big = near(x, y, slop 2) matches [0, 4) (width 2); 'z'@2 is
    # inside -> containing emits the big span, within emits z@2.
    # doc1: big matches [0, 2) (width 0) but z@5 is outside both sides.
    # doc2: z present, no big match (y missing) -> conjunction drops it.
    s = _index(tmp_path, [
        "x a z y q z",   # x@0 .. y@3, z@2 inside; z@5 outside
        "x y q q q z",   # big [0,2), z@5 not contained
        "x z q q q q",   # no y -> no big span
    ])
    big = Q.SpanNearQuery((Q.SpanTermQuery("x"), Q.SpanTermQuery("y")),
                          slop=2, in_order=True)
    little = Q.SpanTermQuery("z")
    contain = s.search(Q.SpanContainingQuery(big=big, little=little), k=10)
    within = s.search(Q.SpanWithinQuery(big=big, little=little), k=10)
    assert list(contain.doc_ids) == [0]
    assert list(within.doc_ids) == [0]
    # containing scores with the BIG span's width (2), within with the
    # little's width (0): freq 1/(1+2) vs 1/(1+0) -> within scores higher
    assert within.scores[0] > contain.scores[0]


def test_contain_spans_vectorized_duels_literal():
    """_span_stream's searchsorted contain/within lookups must equal the
    literal forward-cursor ContainSpans iterators (the literal loop IS
    the Java transcription and the non-monotone-end fallback). Bigs are
    real nested nears so the vectorized branch is exercised end to end."""
    from lucene_7_x_9_x_ray.search.spans import (
        _contain_spans_literal, _span_stream,
    )

    rng = np.random.default_rng(7)
    big_q = Q.SpanNearQuery((Q.SpanTermQuery("a"), Q.SpanTermQuery("b")),
                            slop=4, in_order=True)
    for _ in range(400):
        pool = rng.permutation(60)
        na, nb_, nc = (int(rng.integers(1, 8)) for _ in range(3))
        pos = {
            "a": np.sort(pool[:na]).astype(np.int64),
            "b": np.sort(pool[na : na + nb_]).astype(np.int64),
            "c": np.sort(pool[na + nb_ : na + nb_ + nc]).astype(np.int64),
        }
        pos_of = lambda t: pos[t]  # noqa: E731
        bs, be, bw = _span_stream(big_q, pos_of)
        ls, le, lw = _span_stream(Q.SpanTermQuery("c"), pos_of)
        for cls, src, sw in (
            (Q.SpanContainingQuery, "big", bw),
            (Q.SpanWithinQuery, "little", lw),
        ):
            got = _span_stream(cls(big=big_q, little=Q.SpanTermQuery("c")),
                               pos_of)
            if len(bs) == 0 or len(ls) == 0:
                assert len(got[0]) == 0
                continue
            want = _contain_spans_literal(bs, be, sw, ls, le, source=src)
            assert all(np.array_equal(g, w) for g, w in zip(got, want)), (
                pos, got, want, src)
