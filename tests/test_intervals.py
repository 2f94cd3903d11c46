"""Interval-query tests: the transcribed lazy iterators duel a brute-force
containment-antichain enumeration on random position lists (the equivalence
the SQL oracle relies on), plus maxgaps filtering, freq/score arithmetic,
and an end-to-end searcher smoke test."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from lucene_7_x_9_x_ray.search.intervals import (
    NO_MORE,
    ContainedByIntervals,
    ContainingIntervals,
    DisjunctionIntervals,
    MaxGapsIntervals,
    NotContainedByIntervals,
    NotContainingIntervals,
    OrderedIntervals,
    TermInterval,
    UnorderedIntervals,
    interval_freq,
)


def _enumerate(source, positions):
    it = source.iterator(positions)
    out = []
    while it.next_interval() != NO_MORE:
        out.append((it.start(), it.end()))
    return out


def _brute_antichain(lists, ordered: bool):
    """All (one position per sub-source) matches reduced to their
    containment antichain — the minimal-interval set."""
    matches = set()
    for tup in itertools.product(*lists):
        if ordered and any(tup[i] <= tup[i - 1] for i in range(1, len(tup))):
            continue
        matches.add((min(tup), max(tup)))
    return sorted(
        m
        for m in matches
        if not any(
            m2 != m and m2[0] >= m[0] and m2[1] <= m[1] for m2 in matches
        )
    )


@pytest.mark.parametrize("ordered", [True, False])
@pytest.mark.parametrize("k", [2, 3])
def test_minimal_intervals_duel_brute_antichain(ordered, k):
    rng = np.random.default_rng(5 + k + ordered)
    for trial in range(400):
        lists = []
        for _ in range(k):
            n = int(rng.integers(0, 7))
            lists.append(np.unique(rng.integers(0, 20, size=n)).astype(np.int64))
        if any(len(p) == 0 for p in lists):
            # conjunction empty: the engine never builds an iterator here
            continue
        pos = {f"t{i}": lists[i] for i in range(k)}
        leaves = tuple(TermInterval(f"t{i}") for i in range(k))
        src = OrderedIntervals(leaves) if ordered else UnorderedIntervals(leaves)
        got = sorted(_enumerate(src, pos))
        want = _brute_antichain(lists, ordered)
        assert got == want, (trial, lists, got, want)


def _antichain(matches):
    matches = set(matches)
    return sorted(
        m
        for m in matches
        if not any(m2 != m and m2[0] >= m[0] and m2[1] <= m[1] for m2 in matches)
    )


def _brute_source(source, positions):
    """Recursive brute-force minimal-interval set for any source tree
    (each combinator applied over its children's antichains, then
    re-antichained — the algebra the lazy iterators implement)."""
    if isinstance(source, TermInterval):
        return sorted((int(p), int(p)) for p in positions[source.term])
    if isinstance(source, (OrderedIntervals, UnorderedIntervals)):
        subsets = [_brute_source(s, positions) for s in source.sources]
        if any(not s for s in subsets):
            return []
        out = set()
        for combo in itertools.product(*subsets):
            if isinstance(source, OrderedIntervals):
                if any(combo[i][0] <= combo[i - 1][1] for i in range(1, len(combo))):
                    continue
            s = min(c[0] for c in combo)
            e = max(c[1] for c in combo)
            out.add((s, e))
        return _antichain(out)
    if isinstance(source, DisjunctionIntervals):
        out = set()
        for s in source.sources:
            out.update(_brute_source(s, positions))
        return _antichain(out)
    if isinstance(source, ContainingIntervals):
        big = _brute_source(source.big, positions)
        small = _brute_source(source.small, positions)
        return [a for a in big if any(b[0] >= a[0] and b[1] <= a[1] for b in small)]
    if isinstance(source, NotContainingIntervals):
        big = _brute_source(source.minuend, positions)
        small = _brute_source(source.subtrahend, positions)
        return [a for a in big if not any(b[0] >= a[0] and b[1] <= a[1] for b in small)]
    if isinstance(source, ContainedByIntervals):
        small = _brute_source(source.small, positions)
        big = _brute_source(source.big, positions)
        return [a for a in small if any(b[0] <= a[0] and b[1] >= a[1] for b in big)]
    if isinstance(source, NotContainedByIntervals):
        small = _brute_source(source.minuend, positions)
        big = _brute_source(source.subtrahend, positions)
        return [a for a in small if not any(b[0] <= a[0] and b[1] >= a[1] for b in big)]
    raise TypeError(type(source))


def _rand_positions(rng, terms, max_pos=24, max_n=6):
    return {
        t: np.unique(rng.integers(0, max_pos, size=int(rng.integers(0, max_n)))).astype(
            np.int64
        )
        for t in terms
    }


def test_disjunction_duel_brute_antichain():
    rng = np.random.default_rng(42)
    a, b, c = TermInterval("a"), TermInterval("b"), TermInterval("c")
    shapes = [
        DisjunctionIntervals((a, b)),
        DisjunctionIntervals((a, b, c)),
        DisjunctionIntervals((OrderedIntervals((a, b)), c)),
        DisjunctionIntervals((OrderedIntervals((a, b)), UnorderedIntervals((b, c)))),
        OrderedIntervals((a, DisjunctionIntervals((b, c)))),
        UnorderedIntervals((DisjunctionIntervals((a, b)), c)),
    ]
    for trial in range(300):
        pos = _rand_positions(rng, ["a", "b", "c"])
        for src in shapes:
            got = sorted(_enumerate(src, pos))
            want = sorted(_brute_source(src, pos))
            assert got == want, (trial, src, {k: list(v) for k, v in pos.items()}, got, want)


def test_containment_filters_duel_brute():
    rng = np.random.default_rng(99)
    a, b, c = TermInterval("a"), TermInterval("b"), TermInterval("c")
    big = UnorderedIntervals((a, b))
    shapes = [
        ContainingIntervals(big, c),
        NotContainingIntervals(big, c),
        ContainedByIntervals(c, big),
        NotContainedByIntervals(c, big),
        ContainingIntervals(OrderedIntervals((a, b)), DisjunctionIntervals((b, c))),
        NotContainedByIntervals(UnorderedIntervals((a, c)), UnorderedIntervals((a, b))),
    ]
    for trial in range(300):
        pos = _rand_positions(rng, ["a", "b", "c"])
        for src in shapes:
            got = sorted(_enumerate(src, pos))
            want = sorted(_brute_source(src, pos))
            assert got == want, (trial, src, {k: list(v) for k, v in pos.items()}, got, want)


def test_disjunction_order_and_dedup():
    # Lucene contract: disjunction emits in end-ascending order and
    # collapses duplicates across subs
    pos = {"x": np.array([2, 8], dtype=np.int64), "y": np.array([2, 5], dtype=np.int64)}
    src = DisjunctionIntervals((TermInterval("x"), TermInterval("y")))
    it = src.iterator(pos)
    got = []
    while it.next_interval() != NO_MORE:
        got.append((it.start(), it.end()))
    assert got == [(2, 2), (5, 5), (8, 8)]  # (2,2) emitted once


def test_ordered_duplicate_terms_smoke():
    # ordered("a", "a"): consecutive-occurrence pairs, minimal
    pos = {"a": np.array([1, 4, 9], dtype=np.int64)}
    src = OrderedIntervals((TermInterval("a"), TermInterval("a")))
    assert _enumerate(src, pos) == [(1, 4), (4, 9)]


def test_maxgaps_filters_after_minimizing():
    pos = {
        "x": np.array([0, 10], dtype=np.int64),
        "y": np.array([3, 11], dtype=np.int64),
    }
    base = OrderedIntervals((TermInterval("x"), TermInterval("y")))
    assert _enumerate(base, pos) == [(0, 3), (10, 11)]
    gapped = MaxGapsIntervals(1, base)
    assert _enumerate(gapped, pos) == [(10, 11)]
    # freq: only the surviving interval contributes 1/max(2-2+1,1) = 1
    assert interval_freq(gapped, pos) == pytest.approx(1.0)
    # unfiltered: 1/max(4-2+1,1) + 1 = 1/3 + 1
    assert interval_freq(base, pos) == pytest.approx(float(np.float32(1 / 3) + 1))


def test_interval_gate_oracle_parity(ray_session):
    """interval_topk gate == its DuckDB oracle on the driver corpus (the
    CORRECTNESS gate invariant, both value and column-name identical)."""
    import duckdb as _dd

    from lucene_7_x_9_x_ray.pipelines import flagship, oracles

    sf = "/root/testdata/sf0.001"
    got = flagship.q_interval_topk(sf)
    con = _dd.connect()
    con.sql(f"create view documents as select * from '{sf}/documents.parquet'")
    want = con.sql(oracles.interval_topk_sql(flagship.INTERVAL_TOPK_SPECS)).arrow()
    key = [("query_id", "ascending"), ("rank", "ascending")]
    assert got.sort_by(key).equals(want.cast(got.schema).sort_by(key))
    assert got.num_rows > 0


def test_interval_oracle_freq_is_sequential_float32():
    """The oracle must fold per-interval terms in float32 start order like
    IntervalScorer, not sum in DOUBLE and cast once: widths (2, 3) give
    f32(f32(1/2) + f32(1/3)) = 0.83333337 vs f32(1/2 + 1/3) = 0.8333333 —
    one ulp apart, enough to flip a 4-dp rounding or a rank."""
    import duckdb as _dd

    from lucene_7_x_9_x_ray.pipelines.oracles import interval_topk_sql

    # ordered(a, b) minimal intervals: (0,2) span 3 -> d=2; (4,7) span 4 -> d=3
    text = "a x b w a x x b"
    pos = {
        "a": np.array([0, 4], dtype=np.int64),
        "b": np.array([2, 7], dtype=np.int64),
    }
    src = OrderedIntervals((TermInterval("a"), TermInterval("b")))
    freq = np.float32(interval_freq(src, pos))
    want_score = float(np.float32(1.0) - np.float32(1.0) / (np.float32(1.0) + freq))
    con = _dd.connect()
    con.sql(f"CREATE VIEW documents AS SELECT 0 AS doc_id, '{text}' AS text")
    sql = interval_topk_sql([("q", "ordered", ("a", "b"), None, 5)])
    got = con.sql(sql).fetchall()
    assert len(got) == 1
    assert got[0][3] == round(
        float(np.float64(want_score)), 4
    ) or abs(got[0][3] - want_score) < 5e-5
    # exact check on the freq itself
    fsql = sql[: sql.index("sc_q AS")] + (
        "probe AS (SELECT 1) SELECT freq FROM f_q"
    )
    oracle_freq = con.sql(fsql).fetchone()[0]
    assert np.float32(oracle_freq) == freq, (oracle_freq, float(freq))


def test_interval_query_end_to_end(ray_session, tmp_path):
    """IntervalQuery through the searcher: score = freq/(1+freq) with the
    minimal-interval freq, verified against a hand computation."""
    import pyarrow.parquet as pq

    from lucene_7_x_9_x_ray.search import queries as Q
    from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
    from lucene_7_x_9_x_ray.sources.pages import generate_pages, write_pages_parquet
    from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index

    pages = generate_pages(60, seed=3, vocab_size=40, mean_tokens=25)
    path = str(tmp_path / "pages.parquet")
    write_pages_parquet(pages, path)
    idx = str(tmp_path / "idx")
    build_index([path], idx, BuildConfig(target_docs_per_segment=25))
    searcher = IndexSearcher(idx)

    texts = pages["text"].to_pylist()
    t1, t2 = "t00000", "t00001"
    src = OrderedIntervals((TermInterval(t1), TermInterval(t2)))
    td = searcher.search(Q.IntervalQuery(source=src), k=10)

    want = []
    for d, text in enumerate(texts):
        toks = text.split(" ")
        lists = [
            np.array([i for i, t in enumerate(toks) if t == q], dtype=np.int64)
            for q in (t1, t2)
        ]
        if any(len(p) == 0 for p in lists):
            continue
        freq = np.float32(0.0)
        for s, e in _brute_antichain(lists, ordered=True):
            freq = np.float32(
                freq + np.float32(1.0) / np.float32(max(e - s + 1 - 2 + 1, 1))
            )
        if freq > 0:
            score = np.float32(1.0) - np.float32(1.0) / (np.float32(1.0) + freq)
            want.append((d, float(score)))
    want.sort(key=lambda x: (-x[1], x[0]))
    got = [(int(d), float(s)) for d, s in zip(td.doc_ids, td.scores)]
    assert got == want[:10]
