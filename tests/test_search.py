"""Query-engine correctness: pinned micro-corpus + independent scalar oracle.

- Pinned corpus shaped like TestWANDScorer.testBasics (solr-8.4.0 core test
  TestWANDScorer.java:65-170): 6 docs over values {A},{A,B},{},{A,B,C},{B},
  {B,C}; boolean combos MUST/SHOULD/MUST_NOT/FILTER with boosts.
- The oracle here re-computes BM25 *independently* (explicit float32
  formula over raw token counts, no engine code) — the CheckHits duel
  pattern (CheckHits.java:595-603).
"""

import numpy as np
import pytest

from lucene_7_x_9_x_ray.functions.analysis import get_analyzer
from lucene_7_x_9_x_ray.functions.smallfloat import int_to_byte4, byte4_to_int
from lucene_7_x_9_x_ray.search import queries as Q
from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
from lucene_7_x_9_x_ray.sources.pages import generate_pages, write_pages_parquet
from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index_local

DOCS = ["a", "a b", "", "a b c", "b", "b c"]


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    import pyarrow as pa

    tmp = tmp_path_factory.mktemp("pinned")
    t = pa.table(
        {
            "url": [f"u{i}" for i in range(len(DOCS))],
            "warc_ts": pa.array(np.arange(len(DOCS)), type=pa.timestamp("us")),
            "text": DOCS,
            "lang": ["en"] * len(DOCS),
        }
    )
    p = str(tmp / "pages.parquet")
    write_pages_parquet(t, p)
    build_index_local([p], str(tmp / "idx"), BuildConfig())
    return IndexSearcher(str(tmp / "idx"))


def oracle_scores(term: str, boost: float = 1.0) -> dict[int, np.float32]:
    """Independent float32 BM25 over the raw pinned corpus."""
    an = get_analyzer("standard")
    toks = [an.tokens(d) for d in DOCS]
    n_docs = len(DOCS)
    sttf = sum(len(t) for t in toks)
    df = sum(1 for t in toks if term in t)
    if df == 0:
        return {}
    idf = np.float32(np.log(1.0 + (np.float64(n_docs) - df + 0.5) / (df + 0.5)))
    weight = np.float32(boost) * idf
    avgdl = np.float32(np.float64(sttf) / np.float64(n_docs))
    one, k1, b = np.float32(1), np.float32(1.2), np.float32(0.75)
    out = {}
    for d, t in enumerate(toks):
        freq = t.count(term)
        if freq:
            dl = np.float32(byte4_to_int(int_to_byte4(np.array([len(t)]))[0]))
            ninv = one / (k1 * ((one - b) + b * dl / avgdl))
            out[d] = weight - weight / (one + np.float32(freq) * ninv)
    return out


def combine(*term_maps) -> dict[int, np.float32]:
    """Sum clause scores in float64, cast float32 (disjunction-sum rule)."""
    out: dict[int, float] = {}
    for m in term_maps:
        for d, s in m.items():
            out[d] = out.get(d, 0.0) + float(np.float64(s))
    return {d: np.float32(v) for d, v in out.items()}


def ranked(m: dict[int, np.float32]) -> list[tuple[int, float]]:
    return sorted(((d, float(s)) for d, s in m.items()), key=lambda x: (-x[1], x[0]))


def assert_matches(td, expect_map, k=10):
    exp = ranked(expect_map)[:k]
    got = list(zip(*td.to_lists())) if len(td.doc_ids) else []
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (gd, gs), (ed, es) in zip(got, exp):
        assert np.float32(gs) == np.float32(es), (gd, gs, es)


def test_term_query_pinned(idx):
    assert_matches(idx.search(Q.TermQuery("a")), oracle_scores("a"))
    assert_matches(idx.search(Q.TermQuery("c")), oracle_scores("c"))
    assert idx.search(Q.TermQuery("absent")).to_lists() == ([], [])


def test_should_disjunction(idx):
    exp = combine(oracle_scores("a"), oracle_scores("b"))
    q = Q.BooleanQuery.build([(Q.SHOULD, Q.TermQuery("a")), (Q.SHOULD, Q.TermQuery("b"))])
    assert_matches(idx.search(q), exp)
    assert_matches(idx.search(q, mode="wand"), exp)


def test_boosted_clause(idx):
    exp = combine(oracle_scores("a", 2.0), oracle_scores("b"))
    q = Q.BooleanQuery.build(
        [(Q.SHOULD, Q.TermQuery("a", boost=2.0)), (Q.SHOULD, Q.TermQuery("b"))]
    )
    assert_matches(idx.search(q), exp)
    assert_matches(idx.search(q, mode="wand"), exp)


def test_must_conjunction(idx):
    both = combine(oracle_scores("a"), oracle_scores("b"))
    exp = {d: s for d, s in both.items() if d in oracle_scores("a") and d in oracle_scores("b")}
    q = Q.BooleanQuery.build([(Q.MUST, Q.TermQuery("a")), (Q.MUST, Q.TermQuery("b"))])
    assert_matches(idx.search(q), exp)
    assert sorted(exp) == [1, 3]


def test_must_not(idx):
    a = oracle_scores("a")
    c = oracle_scores("c")
    exp = {d: s for d, s in a.items() if d not in c}
    q = Q.BooleanQuery.build([(Q.MUST, Q.TermQuery("a")), (Q.MUST_NOT, Q.TermQuery("c"))])
    assert_matches(idx.search(q), exp)
    assert sorted(exp) == [0, 1]


def test_filter_scores_zero_contribution(idx):
    # FILTER restricts matches but contributes no score
    a = oracle_scores("a")
    b = oracle_scores("b")
    exp = {d: s for d, s in a.items() if d in b}
    q = Q.BooleanQuery.build([(Q.MUST, Q.TermQuery("a")), (Q.FILTER, Q.TermQuery("b"))])
    assert_matches(idx.search(q), exp)


def test_filter_only_constant_zero(idx):
    q = Q.BooleanQuery.build([(Q.FILTER, Q.TermQuery("b"))])
    td = idx.search(q, k=10)
    assert sorted(td.doc_ids.tolist()) == [1, 3, 4, 5]
    assert all(s == 0.0 for s in td.scores)


def test_min_should_match(idx):
    a, b, c = oracle_scores("a"), oracle_scores("b"), oracle_scores("c")
    allm = combine(a, b, c)
    exp = {d: s for d, s in allm.items() if sum(d in m for m in (a, b, c)) >= 2}
    q = Q.BooleanQuery.build(
        [(Q.SHOULD, Q.TermQuery("a")), (Q.SHOULD, Q.TermQuery("b")), (Q.SHOULD, Q.TermQuery("c"))],
        min_should_match=2,
    )
    assert_matches(idx.search(q), exp)
    assert sorted(exp) == [1, 3, 5]


def test_match_all_and_constant_score(idx):
    td = idx.search(Q.MatchAllDocsQuery(), k=10)
    assert list(td.doc_ids) == [0, 1, 2, 3, 4, 5]
    assert all(s == 1.0 for s in td.scores)
    td2 = idx.search(Q.ConstantScoreQuery(Q.TermQuery("b"), boost=3.5), k=10)
    assert sorted(td2.doc_ids.tolist()) == [1, 3, 4, 5]
    assert all(s == np.float32(3.5) for s in td2.scores)


def test_synonym_query(idx):
    # b and c scored as one pseudo-term: doc 5 {b,c} gets freq 2
    td = idx.search(Q.SynonymQuery(terms=("b", "c")), k=10)
    assert td.doc_ids[0] == 5  # highest combined freq, shortish doc
    assert idx.count(Q.SynonymQuery(terms=("b", "c"))) == 4


def test_dismax(idx):
    a, b = oracle_scores("a"), oracle_scores("b")
    docs = set(a) | set(b)
    exp = {}
    for d in docs:
        sa, sb = float(a.get(d, -np.inf)), float(b.get(d, -np.inf))
        mx = max(sa, sb)
        others = (0.0 if sa == -np.inf else sa) + (0.0 if sb == -np.inf else sb) - mx
        exp[d] = np.float32(mx + 0.5 * others)
    q = Q.DisjunctionMaxQuery(queries=(Q.TermQuery("a"), Q.TermQuery("b")), tie_breaker=0.5)
    assert_matches(idx.search(q), exp)


def test_search_after_pagination(idx):
    q = Q.BooleanQuery.build([(Q.SHOULD, Q.TermQuery("a")), (Q.SHOULD, Q.TermQuery("b"))])
    full = idx.search(q, k=10)
    page1 = idx.search(q, k=2)
    after = (float(page1.scores[-1]), int(page1.doc_ids[-1]))
    page2 = idx.search_after(q, k=2, after=after)
    got = page1.doc_ids.tolist() + page2.doc_ids.tolist()
    assert got == full.doc_ids.tolist()[:4]


def test_count_and_tie_break_doc_order(idx):
    # docs 1 and 3 tie only if scores equal; regardless, ordering must be
    # (score desc, doc asc) — verify explicitly on equal-score results
    td = idx.search(Q.ConstantScoreQuery(Q.TermQuery("b")), k=10)
    assert list(td.doc_ids) == sorted(td.doc_ids.tolist())


def test_multi_segment_matches_single(tmp_path):
    """Same corpus, 1 segment vs 4 segments -> identical results."""
    t = generate_pages(400, seed=3, vocab_size=80, mean_tokens=20, dup_url_frac=0)
    p = str(tmp_path / "pages.parquet")
    write_pages_parquet(t, p, rows_per_row_group=50)
    build_index_local([p], str(tmp_path / "one"), BuildConfig(target_docs_per_segment=10**6))
    build_index_local([p], str(tmp_path / "many"), BuildConfig(target_docs_per_segment=100))
    s1 = IndexSearcher(str(tmp_path / "one"))
    s4 = IndexSearcher(str(tmp_path / "many"))
    assert len(s4.readers) == 4
    for qt in ["t00001 t00004", "t00000", "t00010 t00002 t00030"]:
        a = s1.search(qt, k=15).to_lists()
        b = s4.search(qt, k=15).to_lists()
        assert a == b
        c = s4.search(qt, k=15, mode="wand").to_lists()
        assert a == c


def test_filter_lru_cache(idx):
    """FILTER doc sets are cached per reader (LRUQueryCache analogue):
    repeated queries with the same filter hit the cache and results are
    unchanged."""
    import lucene_7_x_9_x_ray.search.queries as Q

    s = idx
    f = Q.TermQuery("b")
    q = Q.BooleanQuery.build([(Q.MUST, Q.TermQuery("a")), (Q.FILTER, f)])
    td1 = s.search(q, k=10)
    td2 = s.search(q, k=10)
    assert list(td1.doc_ids) == list(td2.doc_ids)
    r = s.readers[0]
    assert r.filter_cache.hits >= 1 and r.filter_cache.misses >= 1


def test_single_term_phrase_rewrites_to_term(idx):
    """A 1-term PhraseQuery (any slop) scores exactly like TermQuery —
    PhraseQuery.rewrite semantics; previously crashed for slop>0."""
    from lucene_7_x_9_x_ray.search import queries as Q

    base = idx.search(Q.TermQuery("t00000"), k=50, total_hits_threshold=1 << 30)
    for slop in (0, 2):
        td = idx.search(Q.PhraseQuery(terms=("t00000",), slop=slop), k=50,
                        total_hits_threshold=1 << 30)
        assert list(td.doc_ids) == list(base.doc_ids)
        assert np.array_equal(td.scores, base.scores)


def test_parse_classic_surface():
    """Classic parser: field:term, phrases+slop, AND/OR/NOT, +/-, ^boost,
    wildcard/prefix/fuzzy/range tokens (QueryParserBase.java:117 surface)."""
    from lucene_7_x_9_x_ray.functions.analysis import get_analyzer
    from lucene_7_x_9_x_ray.search import queries as Q

    an = get_analyzer("standard")
    P = lambda s: Q.parse_classic(s, an)

    assert P("table") == Q.TermQuery("table")
    assert P("Key Hash") == Q.BooleanQuery.build(
        [(Q.SHOULD, Q.TermQuery("key")), (Q.SHOULD, Q.TermQuery("hash"))]
    )
    assert P("key AND hash") == Q.BooleanQuery.build(
        [(Q.MUST, Q.TermQuery("key")), (Q.MUST, Q.TermQuery("hash"))]
    )
    assert P("table NOT the") == Q.BooleanQuery.build(
        [(Q.SHOULD, Q.TermQuery("table")), (Q.MUST_NOT, Q.TermQuery("the"))]
    )
    assert P("+key -hash") == Q.BooleanQuery.build(
        [(Q.MUST, Q.TermQuery("key")), (Q.MUST_NOT, Q.TermQuery("hash"))]
    )
    assert P("title:table^2 value") == Q.BooleanQuery.build(
        [(Q.SHOULD, Q.TermQuery("table", boost=2.0, field="title")),
         (Q.SHOULD, Q.TermQuery("value"))]
    )
    assert P('"key hash"~2') == Q.PhraseQuery(terms=("key", "hash"), slop=2)
    assert P('title:"key hash"') == Q.PhraseQuery(terms=("key", "hash"), field="title")
    assert P("ta*") == Q.PrefixQuery("ta")
    assert P("s*w") == Q.WildcardQuery("s*w")
    assert P("tabel~1") == Q.FuzzyQuery("tabel", max_edits=1)
    assert P("[q TO t]") == Q.TermRangeQuery("q", "t")
    assert P("{q TO t}") == Q.TermRangeQuery("q", "t", include_lower=False, include_upper=False)
    assert P("") == Q.MatchNoDocsQuery()
    # AND upgrades BOTH neighbours; trailing term stays SHOULD
    assert P("a AND b c") == Q.BooleanQuery.build(
        [(Q.MUST, Q.TermQuery("a")), (Q.MUST, Q.TermQuery("b")), (Q.SHOULD, Q.TermQuery("c"))]
    )
    # parenthesized grouping (QueryParserBase.java:117 clause recursion)
    inner_ab = Q.BooleanQuery.build(
        [(Q.SHOULD, Q.TermQuery("a")), (Q.SHOULD, Q.TermQuery("b"))]
    )
    assert P("(a OR b) AND c") == Q.BooleanQuery.build(
        [(Q.MUST, inner_ab), (Q.MUST, Q.TermQuery("c"))]
    )
    assert P("c AND (a NOT b)") == Q.BooleanQuery.build(
        [(Q.MUST, Q.TermQuery("c")),
         (Q.MUST, Q.BooleanQuery.build(
             [(Q.SHOULD, Q.TermQuery("a")), (Q.MUST_NOT, Q.TermQuery("b"))]))]
    )
    assert P("-(a b) c") == Q.BooleanQuery.build(
        [(Q.MUST_NOT, inner_ab), (Q.SHOULD, Q.TermQuery("c"))]
    )
    assert P("(a OR b)^2 c") == Q.BooleanQuery.build(
        [(Q.SHOULD, Q.BoostQuery(inner_ab, 2.0)), (Q.SHOULD, Q.TermQuery("c"))]
    )
    assert P("(a)") == Q.TermQuery("a")  # single-SHOULD group collapses
    # field-scoped group: the scoped field is the group default; inner
    # field: specs override
    assert P("title:(a b)") == Q.BooleanQuery.build(
        [(Q.SHOULD, Q.TermQuery("a", field="title")),
         (Q.SHOULD, Q.TermQuery("b", field="title"))]
    )
    assert P("title:(a other:b)") == Q.BooleanQuery.build(
        [(Q.SHOULD, Q.TermQuery("a", field="title")),
         (Q.SHOULD, Q.TermQuery("b", field="other"))]
    )
    assert P("()") == Q.MatchNoDocsQuery()
    with pytest.raises(Q.QueryParseError):
        P("(a OR b")
    with pytest.raises(Q.QueryParseError):
        P("a b) c")


def test_sloppy_two_term_chain_closed_form():
    """The zigzag-chain closed form used by the phrase_sloppy2_topk SQL
    oracle equals the SloppyPhraseMatcher heap transcription for two
    no-repeat phrase positions — exhaustively over all position-set pairs
    (sizes 1-3 in a 7-token window, slops 0-3) plus randomized larger
    lists."""
    import itertools as it

    from lucene_7_x_9_x_ray.search.scorers import _sloppy_freq

    def chain_freq(A, B, slop):
        if A[0] > B[0]:
            q, tag = A[0], 0
        else:
            q, tag = B[0], 1  # ties pop ord 0 first -> anchor tagged B
        t = np.float32(0.0)
        while True:
            other = B if tag == 0 else A
            us = [x for x in other if x <= q]
            gap = q - us[-1]
            if gap <= slop:
                t = np.float32(t + np.float32(1.0) / np.float32(1 + gap))
            nxt = [x for x in other if x > q]
            if not nxt:
                return float(t)
            q, tag = nxt[0], 1 - tag

    R = range(7)
    for nA, nB in it.product((1, 2, 3), repeat=2):
        for A in it.combinations(R, nA):
            for B in it.combinations(R, nB):
                for slop in (0, 1, 2, 3):
                    got = _sloppy_freq(
                        [np.array(A, dtype=np.int64), np.array(B, dtype=np.int64)], slop
                    )
                    assert chain_freq(A, B, slop) == got, (A, B, slop)

    rng = np.random.default_rng(5)
    for _ in range(2000):
        A = np.sort(rng.choice(30, size=int(rng.integers(1, 8)), replace=False))
        B = np.sort(rng.choice(30, size=int(rng.integers(1, 8)), replace=False))
        slop = int(rng.integers(0, 6))
        got = _sloppy_freq([A.astype(np.int64), B.astype(np.int64)], slop)
        assert chain_freq(A.tolist(), B.tolist(), slop) == got, (A, B, slop)


def test_sloppy_repeat_flat_state_machine():
    """The flattened three-cursor state machine used by the
    phrase_sloppy_topk SQL oracle (oracles.sloppy_phrase_rpt_topk_sql)
    equals the rptGroups heap transcription for the [A, B, A] repeated
    shape — exhaustively over position-set pairs plus randomized larger
    lists. Key reductions the machine relies on (see the oracle
    docstring): stagger pins i0 < i2 so the only collision is cursor 0
    advancing onto i2 (the staggered member is always the LESSER, so the
    resolution is one bump), and end == max of current adjusted
    positions at every step."""
    import itertools as it

    from lucene_7_x_9_x_ray.search.scorers import _sloppy_freq_repeats

    def flat_aba(posA, posB, slop):
        nA, nB = len(posA), len(posB)
        if nA < 2 or nB < 1:
            return 0.0
        one = np.float32(1.0)
        i0, i1, i2 = 0, 0, 1

        def pos(h):
            return (posA[i0], posB[i1] - 1, posA[i2] - 2)[h]

        hand = min((0, 1, 2), key=lambda h: (pos(h), h))
        end = max(pos(h) for h in (0, 1, 2))
        ml = end - pos(hand)
        np_ = min(pos(h) for h in (0, 1, 2) if h != hand)
        freq = np.float32(0.0)
        while True:
            if hand == 0:
                i0 += 1
                if i0 >= nA:
                    break
                if i0 == i2:
                    i2 += 1
                    if i2 >= nA:
                        break
            elif hand == 1:
                i1 += 1
                if i1 >= nB:
                    break
            else:
                i2 += 1
                if i2 >= nA:
                    break
            end = max(pos(h) for h in (0, 1, 2))
            p = pos(hand)
            if p > np_:
                if ml <= slop:
                    freq = np.float32(freq + one / np.float32(1 + ml))
                hand = min((0, 1, 2), key=lambda h: (pos(h), h))
                ml = end - pos(hand)
                np_ = min(pos(h) for h in (0, 1, 2) if h != hand)
            else:
                ml = min(ml, end - p)
        if ml <= slop:
            freq = np.float32(freq + one / np.float32(1 + ml))
        return float(freq)

    def ref_aba(posA, posB, slop):
        A = np.asarray(posA, dtype=np.int64)
        B = np.asarray(posB, dtype=np.int64)
        return _sloppy_freq_repeats([A, B - 1, A - 2], ["a", "b", "a"], slop)

    R = range(7)
    for ka, kb in it.product((2, 3), (1, 2)):
        for A in it.combinations(R, ka):
            for B in it.combinations(R, kb):
                for slop in (0, 1, 2, 3):
                    assert flat_aba(list(A), list(B), slop) == ref_aba(
                        list(A), list(B), slop
                    ), (A, B, slop)

    rng = np.random.default_rng(7)
    for _ in range(1500):
        A = np.sort(rng.choice(40, size=int(rng.integers(2, 9)), replace=False))
        B = np.sort(rng.choice(40, size=int(rng.integers(1, 9)), replace=False))
        slop = int(rng.integers(0, 7))
        assert flat_aba(A.tolist(), B.tolist(), slop) == ref_aba(
            A.tolist(), B.tolist(), slop
        ), (A, B, slop)


def test_sloppy_rpt_sql_oracle_freq_duel():
    """The recursive-CTE walk in sloppy_phrase_rpt_topk_sql reproduces
    _sloppy_freq_repeats per-doc frequencies on randomized corpora (the
    BM25 shell around it is shared with the proven phrase oracles)."""
    import random

    import duckdb
    import pyarrow as pa

    from lucene_7_x_9_x_ray.pipelines.oracles import sloppy_phrase_rpt_topk_sql
    from lucene_7_x_9_x_ray.search.scorers import _sloppy_freq_repeats

    rng = random.Random(11)
    for trial in range(4):
        docs = [
            " ".join(
                rng.choices(["the", "key", "x", "y"], weights=[3, 2, 3, 2],
                            k=rng.randint(3, 40))
            )
            for _ in range(50)
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        )
        for slop in (0, 2):
            sql = sloppy_phrase_rpt_topk_sql(
                [("q", ["the", "key", "the"], slop, 10)], relation="documents"
            )
            head = sql[: sql.rindex("(SELECT 'q'")]
            con = duckdb.connect()
            con.register("documents", tbl)
            got = dict(
                con.execute(head + "SELECT doc_id, freq FROM pf_q").fetchall()
            )
            con.close()
            exp = {}
            for did, text in enumerate(docs):
                toks = text.split(" ")
                A = np.array([i for i, t in enumerate(toks) if t == "the"],
                             dtype=np.int64)
                B = np.array([i for i, t in enumerate(toks) if t == "key"],
                             dtype=np.int64)
                if len(A) == 0 or len(B) == 0:
                    continue
                f = _sloppy_freq_repeats([A, B - 1, A - 2],
                                         ["the", "key", "the"], slop)
                if f > 0:
                    exp[did] = np.float32(f)
            assert {k: np.float32(v) for k, v in got.items()} == exp, (trial, slop)


def test_sloppy_repeats_hand_traced():
    """Repeated-term sloppy freq pinned to hand-traces of the
    SloppyPhraseMatcher rptGroups algorithm (group staggering at init,
    lesser-pp collision advance)."""
    from lucene_7_x_9_x_ray.search.scorers import _sloppy_freq_repeats

    # phrase "the cat the"~2 over doc "the cat the cat the"
    # (the@0,2,4; cat@1,3): exact match at 0 (w=1) + final ml=0 match (w=1)
    adj = [np.array([0, 2, 4]), np.array([0, 2]), np.array([-2, 0, 2])]
    assert _sloppy_freq_repeats(adj, ("the", "cat", "the"), 2) == 2.0

    # phrase "the the"~1 over doc "the cat the" (the@0,2): one ml=1 match
    adj = [np.array([0, 2]), np.array([-1, 1])]
    assert _sloppy_freq_repeats(adj, ("the", "the"), 1) == 0.5

    # adjacent repeat that does exist: "the the"~0 over "x the the"
    adj = [np.array([1, 2]), np.array([0, 1])]
    assert _sloppy_freq_repeats(adj, ("the", "the"), 0) == 1.0


def test_sloppy_repeats_reduces_to_norepeats():
    """With all-distinct terms the rptGroups path must equal the pinned
    no-repeats matcher on random position lists."""
    import numpy.random as npr

    from lucene_7_x_9_x_ray.search.scorers import _sloppy_freq, _sloppy_freq_repeats

    rng = npr.default_rng(9)
    for trial in range(200):
        n_terms = int(rng.integers(2, 5))
        adj = []
        for t in range(n_terms):
            k = int(rng.integers(1, 6))
            pos = np.unique(rng.integers(0, 25, size=k)).astype(np.int64)
            adj.append(pos - t)
        slop = int(rng.integers(0, 6))
        terms = tuple(f"t{t}" for t in range(n_terms))
        a = _sloppy_freq(adj, slop)
        b = _sloppy_freq_repeats(adj, terms, slop)
        assert abs(a - b) < 1e-6, (trial, adj, slop, a, b)


def test_sloppy_repeats_end_to_end(tmp_path):
    """PhraseQuery with a repeated term no longer raises; the doc with the
    exact repeated pattern ranks."""
    from lucene_7_x_9_x_ray.search import queries as Q
    from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
    from lucene_7_x_9_x_ray.sources.pages import wrap_html
    from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index_local
    import pyarrow as pa_
    import pyarrow.parquet as pq_

    texts = [
        "the cat the cat the",
        "cat the dog",
        "the dog cat sat the",
        "nothing here at all",
    ]
    t = pa_.table(
        {
            "url": pa_.array([f"u{i}" for i in range(len(texts))]),
            "warc_ts": pa_.array([0] * len(texts), pa_.timestamp("us")),
            "text": pa_.array(texts),
            "lang": pa_.array(["en"] * len(texts)),
        }
    )
    path = str(tmp_path / "p.parquet")
    pq_.write_table(t, path)
    idx = str(tmp_path / "i")
    build_index_local([path], idx, BuildConfig(target_docs_per_segment=10))
    s = IndexSearcher(idx)
    td = s.search(Q.PhraseQuery(terms=("the", "cat", "the"), slop=2), k=10,
                  total_hits_threshold=1 << 30)
    # doc 0 = exact repeated pattern (best); doc 2 = "the . cat . the"
    # (distance-2 sloppy match); docs 1/3 lack a valid alignment
    assert list(td.doc_ids) == [0, 2]
    assert td.scores[0] > td.scores[1]


def test_numeric_range_query_clause(tmp_path):
    """NumericRangeQuery composes as a FILTER clause over doc-values
    (PointRangeQuery / IndexOrDocValuesQuery numeric plan) on both the
    segment and merged searchers; bounds and exclusivity honored."""
    from lucene_7_x_9_x_ray.search import queries as Q
    from lucene_7_x_9_x_ray.search.merged import open_searcher
    from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
    from lucene_7_x_9_x_ray.sources.pages import EPOCH_2025, generate_pages, write_pages_parquet
    from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index_local
    from lucene_7_x_9_x_ray.stages.merge import MergeConfig, merge_index_local

    pages = generate_pages(400, vocab_size=50, mean_tokens=20, seed=33, dup_url_frac=0)
    path = str(tmp_path / "p.parquet")
    write_pages_parquet(pages, path, rows_per_row_group=100)
    idx = str(tmp_path / "i")
    build_index_local([path], idx, BuildConfig(target_docs_per_segment=100))
    merge_index_local(idx, MergeConfig(n_shards=2, hot_df_threshold=10**9))

    lo = EPOCH_2025 + 50 * 1_000_000   # docs 50..149 (ts = EPOCH + i*1e6)
    hi = EPOCH_2025 + 149 * 1_000_000
    rng_q = Q.NumericRangeQuery("warc_ts", lo, hi)
    for s in (IndexSearcher(idx), open_searcher(idx)):
        n = s.count(Q.BooleanQuery.build([(Q.FILTER, rng_q)]))
        assert n == 100
        # exclusive bounds
        excl = Q.NumericRangeQuery("warc_ts", lo, hi, include_lower=False,
                                   include_upper=False)
        assert s.count(Q.BooleanQuery.build([(Q.FILTER, excl)])) == 98
        # composed with scoring clauses: results == lang-filter-style brute
        q = Q.BooleanQuery.build(
            [(Q.SHOULD, Q.TermQuery("t00000")), (Q.FILTER, rng_q)]
        )
        td = s.search(q, k=400, total_hits_threshold=1 << 30)
        assert all(50 <= int(d) <= 149 for d in td.doc_ids)
        assert len(td.doc_ids) == 100  # FILTER-only docs match at score 0+term
        # open-ended range
        ge = Q.NumericRangeQuery("warc_ts", lower=hi)
        assert s.count(Q.BooleanQuery.build([(Q.FILTER, ge)])) == 400 - 149


def test_function_score_query(tmp_path):
    """FunctionScoreQuery: replace/multiply combines over a doc-values
    source, float64-then-float32 discipline."""
    import pyarrow as pa_
    import pyarrow.parquet as pq_

    from lucene_7_x_9_x_ray.search import queries as Q
    from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
    from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index_local

    texts = ["a a a", "a b", "a b c d e f", "b c"]
    t = pa_.table(
        {
            "url": [f"u{i}" for i in range(4)],
            "warc_ts": pa_.array(range(4), pa_.timestamp("us")),
            "text": texts,
            "lang": ["en"] * 4,
        }
    )
    path = str(tmp_path / "p.parquet")
    pq_.write_table(t, path)
    idx = str(tmp_path / "i")
    build_index_local([path], idx, BuildConfig())
    s = IndexSearcher(idx)

    # replace: score == log1p(length) for every match of "a"
    q = Q.FunctionScoreQuery(Q.TermQuery("a"), source_col="length",
                             function="log1p", combine="replace")
    td = s.search(q, k=10, total_hits_threshold=1 << 30)
    lens = {0: 3, 1: 2, 2: 6}
    for d, sc in zip(td.doc_ids, td.scores):
        assert sc == np.float32(np.log1p(np.float64(lens[int(d)])))
    # multiply: base * identity(value)
    base = s.search(Q.TermQuery("a"), k=10, total_hits_threshold=1 << 30)
    base_map = {int(d): float(sc) for d, sc in zip(base.doc_ids, base.scores)}
    q2 = Q.FunctionScoreQuery(Q.TermQuery("a"), source_col="length",
                              function="identity", combine="multiply")
    td2 = s.search(q2, k=10, total_hits_threshold=1 << 30)
    for d, sc in zip(td2.doc_ids, td2.scores):
        assert sc == np.float32(np.float64(base_map[int(d)]) * lens[int(d)])


def test_more_like_this_selection(tmp_path):
    """MLT term selection: minTermFreq/minDocFreq filters, tf*idf ranking,
    maxQueryTerms cap, boost=score/best mode."""
    import pyarrow as pa_
    import pyarrow.parquet as pq_

    from lucene_7_x_9_x_ray.search.mlt import mlt_query
    from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
    from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index_local

    # corpus: "rare" df=5 (passes minDocFreq), "common" everywhere,
    # "single" df=1 (filtered), "once" tf=1 in the like text (filtered)
    texts = (["rare common x"] * 5) + (["common y"] * 15)
    t = pa_.table(
        {
            "url": [f"u{i}" for i in range(len(texts))],
            "warc_ts": pa_.array(range(len(texts)), pa_.timestamp("us")),
            "text": texts,
            "lang": ["en"] * len(texts),
        }
    )
    path = str(tmp_path / "p.parquet")
    pq_.write_table(t, path)
    idx = str(tmp_path / "i")
    build_index_local([path], idx, BuildConfig())
    s = IndexSearcher(idx)

    like = "rare rare common common once"
    q = mlt_query(s, like)
    terms = [c.query.term for c in q.clauses]
    assert set(terms) == {"rare", "common"}  # "once" tf=1 filtered
    # rare has higher tf*idf -> first; boost mode normalizes by best
    qb = mlt_query(s, like, boost=True)
    boosts = {c.query.term: c.query.boost for c in qb.clauses}
    assert boosts["rare"] == 1.0 and 0 < boosts["common"] < 1.0
    # minDocFreq filters singletons
    q2 = mlt_query(s, "single single common common")
    assert [c.query.term for c in q2.clauses] == ["common"]
    # maxQueryTerms caps
    q3 = mlt_query(s, like, max_query_terms=1)
    assert len(q3.clauses) == 1 and q3.clauses[0].query.term == "rare"


def test_memory_index_percolation():
    """MemoryIndex: one in-RAM doc, every query type runs against it —
    the percolator primitive (MemoryIndex.java:177 role)."""
    from lucene_7_x_9_x_ray.state.memindex import MemoryIndex

    mi = MemoryIndex("the quick brown fox jumps over the lazy dog")
    assert mi.match(Q.TermQuery("fox")) is not None
    assert mi.match(Q.TermQuery("cat")) is None
    assert mi.match(Q.PhraseQuery(terms=("quick", "brown", "fox"))) is not None
    assert mi.match(Q.PhraseQuery(terms=("brown", "quick"))) is None
    assert mi.match(Q.PhraseQuery(terms=("quick", "fox"), slop=1)) is not None
    assert mi.match('"lazy dog" AND quick') is not None
    assert mi.match("+fox -dog") is None
    assert mi.match(Q.PrefixQuery("jum")) is not None
    # score sanity: tf=2 term scores higher than tf=1 at same df
    s_the = mi.match(Q.TermQuery("the"))
    s_fox = mi.match(Q.TermQuery("fox"))
    assert s_the > s_fox > 0
    # extra fields
    mi2 = MemoryIndex("body words here").add_field("title", "breaking news")
    assert mi2.match(Q.TermQuery("breaking", field="title")) is not None
    assert mi2.match(Q.TermQuery("words", field="title")) is None
    assert mi2.match(Q.PhraseQuery(terms=("breaking", "news"), field="title")) is not None


def test_total_hits_contract_under_pruning(tmp_path):
    """Raising total_hits_threshold demands accurate counts: auto mode
    must fall back to exhaustive; pruned modes flag lower-bound counts."""
    from lucene_7_x_9_x_ray.search import queries as Q
    from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
    from lucene_7_x_9_x_ray.sources.pages import generate_pages, write_pages_parquet
    from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index_local

    pages = generate_pages(3000, vocab_size=50, mean_tokens=60, seed=13)
    path = str(tmp_path / "p.parquet")
    write_pages_parquet(pages, path, rows_per_row_group=1000)
    idx = str(tmp_path / "i")
    build_index_local([path], idx, BuildConfig(target_docs_per_segment=3000,
                                               index_positions=False))
    s = IndexSearcher(idx)
    q = Q.TermQuery("t00000")
    true_count = s.count(q)
    assert true_count >= (1 << 16) * 0  # df below impact threshold here; use disjunction
    qd = Q.BooleanQuery.build(
        [(Q.SHOULD, Q.TermQuery("t00000")), (Q.SHOULD, Q.TermQuery("t00049"))]
    )
    true_d = s.count(qd)
    # high threshold -> exhaustive -> exact count, not a lower bound
    td = s.search(qd, k=5, total_hits_threshold=1 << 30)
    assert td.total_hits == true_d and not td.total_hits_is_lower_bound
    # default threshold with forced pruning -> count flagged as lower bound
    tm = s.search(qd, k=5, mode="maxscore")
    assert tm.total_hits <= true_d
    if tm.total_hits < true_d:
        assert tm.total_hits_is_lower_bound


def test_term_vectors_and_mlt_by_doc(tmp_path):
    """BuildConfig.term_vectors stores per-doc vectors (.tvx/.tvd role);
    term_vector(doc) matches the analyzer counts and MLT-by-docID equals
    MLT-by-text of the same document."""
    from collections import Counter

    from lucene_7_x_9_x_ray.search.mlt import mlt_query, mlt_query_from_doc
    from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
    from lucene_7_x_9_x_ray.sources.pages import generate_pages, write_pages_parquet
    from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index_local

    pages = generate_pages(300, vocab_size=40, mean_tokens=30, seed=3, dup_url_frac=0)
    path = str(tmp_path / "p.parquet")
    write_pages_parquet(pages, path, rows_per_row_group=100)
    idx = str(tmp_path / "i")
    build_index_local([path], idx,
                      BuildConfig(target_docs_per_segment=100, term_vectors=True))
    s = IndexSearcher(idx)
    texts = pages["text"].to_pylist()
    for gid in (0, 150, 299):
        r = s.readers[gid // 100]
        terms, freqs = r.term_vector(gid % 100)
        assert dict(zip(map(str, terms), map(int, freqs))) == Counter(texts[gid].split())
    q_doc = mlt_query_from_doc(s, 42)
    q_txt = mlt_query(s, texts[42])
    assert q_doc == q_txt
    td = s.search(q_doc, k=10)
    assert 42 in set(int(d) for d in td.doc_ids)  # the liked doc ranks

    # term vectors survive compaction (docs rebase, ords remap)
    from lucene_7_x_9_x_ray.stages.compact import (
        CompactionPolicy,
        compact_index,
        reclaim_deletes,
    )

    compact_index(idx, CompactionPolicy(max_merge_at_once=3), use_ray=False)
    s2 = IndexSearcher(idx)
    for gid in (0, 150, 299):
        r2 = s2.readers[int(np.searchsorted([x.doc_base for x in s2.readers], gid, side="right")) - 1]
        terms, freqs = r2.term_vector(gid - r2.doc_base)
        assert dict(zip(map(str, terms), map(int, freqs))) == Counter(texts[gid].split())
    assert mlt_query_from_doc(s2, 42) == q_txt

    # ...and survive a reclaiming merge (renumbered ids, filtered rows)
    from lucene_7_x_9_x_ray.state.livedocs import delete_docs

    dead = list(range(0, 300, 2))
    delete_docs(idx, dead)
    m = reclaim_deletes(idx, use_ray=False, force=True)
    s3 = IndexSearcher(idx)
    keep = [i for i in range(300) if i % 2 == 1]
    for new_id, old_id in [(0, keep[0]), (75, keep[75]), (149, keep[149])]:
        r3 = s3.readers[int(np.searchsorted([x.doc_base for x in s3.readers], new_id, side="right")) - 1]
        terms, freqs = r3.term_vector(new_id - r3.doc_base)
        assert dict(zip(map(str, terms), map(int, freqs))) == Counter(texts[old_id].split())


def test_geo_distance_query_over_stored_cols(tmp_path):
    """BuildConfig.store_cols carries user columns into docmap;
    GeoDistanceQuery (LatLonPoint.newDistanceQuery role) filters by
    haversine radius over them and composes as a FILTER clause."""
    import math

    import pyarrow as pa_
    import pyarrow.parquet as pq_

    from lucene_7_x_9_x_ray.search import queries as Q
    from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
    from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index_local

    rng = np.random.default_rng(5)
    n = 500
    lats = 48.0 + rng.uniform(-2, 2, n)      # around Paris-ish latitudes
    lons = 2.0 + rng.uniform(-3, 3, n)
    t = pa_.table(
        {
            "url": [f"u{i}" for i in range(n)],
            "warc_ts": pa_.array(range(n), pa_.timestamp("us")),
            "text": ["cafe paris" if i % 3 else "cafe lyon" for i in range(n)],
            "lang": ["fr"] * n,
            "lat": pa_.array(lats),
            "lon": pa_.array(lons),
        }
    )
    path = str(tmp_path / "p.parquet")
    pq_.write_table(t, path)
    idx = str(tmp_path / "i")
    build_index_local([path], idx,
                      BuildConfig(target_docs_per_segment=200,
                                  store_cols=("lat", "lon")))
    s = IndexSearcher(idx)

    center, radius = (48.8566, 2.3522), 60_000.0  # 60 km around Paris
    geo = Q.GeoDistanceQuery("lat", "lon", *center, radius)
    td = s.search(Q.BooleanQuery.build([(Q.FILTER, geo)]), k=n,
                  total_hits_threshold=1 << 30)
    got = set(int(d) for d in td.doc_ids)

    def haversine(la1, lo1, la2, lo2):
        R = 6_371_008.8
        p1, p2 = math.radians(la1), math.radians(la2)
        a = (math.sin((p2 - p1) / 2) ** 2
             + math.cos(p1) * math.cos(p2) * math.sin(math.radians(lo2 - lo1) / 2) ** 2)
        return 2 * R * math.asin(math.sqrt(a))

    want = {i for i in range(n)
            if haversine(center[0], center[1], lats[i], lons[i]) <= radius}
    assert got == want and 0 < len(want) < n

    # composes with scoring clauses
    q = Q.BooleanQuery.build([(Q.MUST, Q.TermQuery("lyon")), (Q.FILTER, geo)])
    td2 = s.search(q, k=n, total_hits_threshold=1 << 30)
    assert set(int(d) for d in td2.doc_ids) == {i for i in want if i % 3 == 0}


def _mini_index(tmp_path, texts, name="mpi"):
    import pyarrow as pa_
    import pyarrow.parquet as pq_
    from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index_local

    t = pa_.table(
        {
            "url": pa_.array([f"u{i}" for i in range(len(texts))]),
            "warc_ts": pa_.array([0] * len(texts), pa_.timestamp("us")),
            "text": pa_.array(texts),
            "lang": pa_.array(["en"] * len(texts)),
        }
    )
    path = str(tmp_path / f"{name}.parquet")
    pq_.write_table(t, path)
    idx = str(tmp_path / f"{name}_idx")
    build_index_local([path], idx, BuildConfig(target_docs_per_segment=100))
    return IndexSearcher(idx)


def test_multiphrase_single_slots_equal_phrase(tmp_path):
    """All-single-term slots: MultiPhraseQuery is PhraseQuery — identical
    docs AND float-identical scores for exact and sloppy matching
    (MultiPhraseQuery degenerates to PhraseQuery when every termArray has
    one entry)."""
    s = _mini_index(tmp_path, [
        "key hash join sort",
        "key value hash",
        "hash key",
        "key a b hash",
        "nothing here",
    ])
    for slop in (0, 2):
        ph = s.search(Q.PhraseQuery(terms=("key", "hash"), slop=slop), k=10,
                      total_hits_threshold=1 << 30)
        mp = s.search(Q.MultiPhraseQuery(positions=(("key",), ("hash",)), slop=slop),
                      k=10, total_hits_threshold=1 << 30)
        assert list(ph.doc_ids) == list(mp.doc_ids)
        assert np.array_equal(ph.scores, mp.scores)


def test_multiphrase_union_slot_semantics(tmp_path):
    """A multi-term slot matches the union of its terms' positions
    (UnionPostingsEnum): "key (hash|value)" hits docs where key is
    directly followed by EITHER term; freq counts every alignment."""
    s = _mini_index(tmp_path, [
        "key hash join",         # 0: key->hash
        "key value store",       # 1: key->value
        "hash key value end",    # 2: key->value (not key->hash)
        "key join hash",         # 3: gap -> exact miss
        "key hash key value",    # 4: TWO alignments -> freq 2
        "value key nothing",     # 5: no alignment
    ])
    mp = Q.MultiPhraseQuery(positions=(("key",), ("hash", "value")))
    td = s.search(mp, k=10, total_hits_threshold=1 << 30)
    assert set(int(d) for d in td.doc_ids) == {0, 1, 2, 4}
    # doc 4 has freq 2 -> strictly larger score than the freq-1 docs of
    # comparable length (doc 0 has 3 tokens vs doc 4's 4; both freq-1 docs
    # 1/2 rank below 4)
    by_doc = dict(zip([int(d) for d in td.doc_ids], td.scores))
    assert by_doc[4] > by_doc[1] and by_doc[4] > by_doc[2]

    # sloppy: slop=1 admits doc 3's key _ hash alignment
    mp1 = Q.MultiPhraseQuery(positions=(("key",), ("hash", "value")), slop=1)
    td1 = s.search(mp1, k=10, total_hits_threshold=1 << 30)
    assert set(int(d) for d in td1.doc_ids) == {0, 1, 2, 3, 4}

    # single-slot union: freq = total occurrences of either term
    mpu = Q.MultiPhraseQuery(positions=(("hash", "value"),))
    tdu = s.search(mpu, k=10, total_hits_threshold=1 << 30)
    assert set(int(d) for d in tdu.doc_ids) == {0, 1, 2, 3, 4, 5}

    # repeated term across slots + slop>0: the unsupported rptGroups path
    # is rejected, not silently wrong
    with pytest.raises(ValueError):
        s.search(Q.MultiPhraseQuery(positions=(("key",), ("key", "hash")), slop=1),
                 k=10, total_hits_threshold=1 << 30)


def test_multiphrase_parser_syntax():
    """Classic-parser multi-phrase hook: '"a (b|c) d"' builds the slot
    tree; all-single-slot groups collapse back to PhraseQuery."""
    an = get_analyzer("standard")
    q = Q.parse_classic('"key (hash|value) join"', an)
    assert q == Q.MultiPhraseQuery(positions=(("key",), ("hash", "value"), ("join",)))
    q2 = Q.parse_classic('"key (hash|value)"~2', an)
    assert q2 == Q.MultiPhraseQuery(positions=(("key",), ("hash", "value")), slop=2)
    # degenerate group -> plain phrase
    q3 = Q.parse_classic('"key (hash) join"', an)
    assert q3 == Q.PhraseQuery(terms=("key", "hash", "join"))


def test_commonterms_rewrite_shapes():
    """CommonTermsQuery.rewrite_with_stats: df classification (fraction
    and absolute thresholds), empty-low conjunction upgrade, fractional
    minShouldMatch rounding, MUST_NOT rejection."""
    df = {"the": 400, "table": 390, "dup": 25}.get
    mk = lambda **kw: Q.CommonTermsQuery(**kw)

    q = mk(terms=("the", "table", "dup"), max_term_frequency=0.5)
    r = q.rewrite_with_stats(df, 500)
    assert isinstance(r, Q.BooleanQuery) and len(r.clauses) == 2
    (lo_occ, lo_q), (hi_occ, hi_q) = [(c.occur, c.query) for c in r.clauses]
    assert lo_occ == Q.MUST and hi_occ == Q.SHOULD
    assert {c.query.term for c in lo_q.query.clauses} == {"dup"}
    assert {c.query.term for c in hi_q.query.clauses} == {"the", "table"}

    # all high -> SHOULD group upgraded to a MUST conjunction
    r2 = mk(terms=("the", "table"), max_term_frequency=0.5).rewrite_with_stats(df, 500)
    assert len(r2.clauses) == 1
    inner = r2.clauses[0].query.query
    assert all(c.occur == Q.MUST for c in inner.clauses)

    # absolute threshold: df > 30 is high
    r3 = mk(terms=("table", "dup"), max_term_frequency=30.0).rewrite_with_stats(df, 500)
    assert len(r3.clauses) == 2

    # fractional high msm: round(0.5 * 3) = 2
    r4 = mk(terms=("the", "table", "dup", "key"), max_term_frequency=0.5,
            high_freq_min_should_match=0.5).rewrite_with_stats(
        lambda t: {"the": 400, "table": 390, "key": 380, "dup": 25}[t], 500)
    hi = [c.query.query for c in r4.clauses if c.occur == Q.SHOULD][0]
    assert hi.min_should_match == 2

    # unknown term (df 0) joins the low group; single term collapses
    r5 = mk(terms=("zzz",), max_term_frequency=0.5).rewrite_with_stats(
        lambda t: 0, 500)
    assert r5 == Q.TermQuery("zzz")

    with pytest.raises(ValueError):
        mk(terms=("a", "b"), low_freq_occur=Q.MUST_NOT)


def _oracle_scores_blended(term: str, df_forced: int, boost: float = 1.0):
    """oracle_scores with an artificial docFreq (BlendedTermQuery's
    adjustFrequencies): idf from df_forced, freq/norms the term's own."""
    an = get_analyzer("standard")
    toks = [an.tokens(d) for d in DOCS]
    n_docs = len(DOCS)
    sttf = sum(len(t) for t in toks)
    idf = np.float32(
        np.log(1.0 + (np.float64(n_docs) - df_forced + 0.5) / (df_forced + 0.5))
    )
    weight = np.float32(boost) * idf
    avgdl = np.float32(np.float64(sttf) / np.float64(n_docs))
    one, k1, b = np.float32(1), np.float32(1.2), np.float32(0.75)
    out = {}
    for d, t in enumerate(toks):
        freq = t.count(term)
        if freq:
            dl = np.float32(byte4_to_int(int_to_byte4(np.array([len(t)]))[0]))
            ninv = one / (k1 * ((one - b) + b * dl / avgdl))
            out[d] = weight - weight / (one + np.float32(freq) * ninv)
    return out


def test_blended_rewrite_shapes():
    """BlendedTermQuery.rewrite_with_stats: df = max over members, ttf =
    sum, per-member boost folds into TermQuery.boost, dismax vs boolean
    rewrite methods, empty -> MatchNoDocs."""
    df = {("", "a"): 3, ("", "b"): 4, ("title", "a"): 2}
    ttf = {("", "a"): 5, ("", "b"): 6, ("title", "a"): 2}
    df_of = lambda f, t: df[(f, t)]
    ttf_of = lambda f, t: ttf[(f, t)]

    q = Q.BlendedTermQuery(terms=(("", "a"), ("title", "a")), tie_breaker=0.2)
    r = q.rewrite_with_stats(df_of, ttf_of)
    assert isinstance(r, Q.DisjunctionMaxQuery) and r.tie_breaker == 0.2
    assert r.queries == (
        Q.TermQuery("a", field="", df_override=3, ttf_override=7),
        Q.TermQuery("a", field="title", df_override=3, ttf_override=7),
    )

    r2 = Q.BlendedTermQuery(
        terms=(("", "a"), ("", "b")), boosts=(2.0, 1.0), rewrite_method="boolean"
    ).rewrite_with_stats(df_of, ttf_of)
    assert isinstance(r2, Q.BooleanQuery)
    assert [c.occur for c in r2.clauses] == [Q.SHOULD, Q.SHOULD]
    assert r2.clauses[0].query == Q.TermQuery(
        "a", boost=2.0, field="", df_override=4, ttf_override=11
    )

    assert Q.BlendedTermQuery(terms=()).rewrite_with_stats(
        df_of, ttf_of
    ) == Q.MatchNoDocsQuery()


def test_blended_scoring_literal(idx):
    """BlendedTermQuery scoring against a literal float32 oracle over the
    pinned corpus: both members share df = max(df_a, df_b); dismax = f64
    max + tie*(sum-max) cast f32; boolean = SHOULD-sum."""
    df_a = sum(1 for d in DOCS if "a" in d.split())
    df_b = sum(1 for d in DOCS if "b" in d.split())
    df_bl = max(df_a, df_b)
    sa = _oracle_scores_blended("a", df_bl)
    sb = _oracle_scores_blended("b", df_bl)

    # dismax, tie 0.3
    exp = {}
    for d in set(sa) | set(sb):
        vals = [np.float64(m[d]) for m in (sa, sb) if d in m]
        mx = max(vals)
        exp[d] = np.float32(mx + np.float64(0.3) * (sum(vals) - mx))
    td = idx.search(
        Q.BlendedTermQuery(terms=(("", "a"), ("", "b")), tie_breaker=0.3), k=10
    )
    assert_matches(td, exp)

    # boolean rewrite with a member boost
    sa2 = _oracle_scores_blended("a", df_bl, boost=2.0)
    td2 = idx.search(
        Q.BlendedTermQuery(
            terms=(("", "a"), ("", "b")), boosts=(2.0, 1.0),
            rewrite_method="boolean",
        ),
        k=10,
    )
    assert_matches(td2, combine(sa2, sb))


def test_feature_query_functions(ray_session):
    """FeatureField (FeatureField.java:229-400): the freq-encoding
    round-trip (top 8 mantissa bits) and the three scoring functions —
    engine float32 chain vs a direct numpy mirror, plus the SQL
    quantization identity for integer features."""
    import math

    import numpy as np

    from lucene_7_x_9_x_ray.pipelines.flagship import get_searchers
    from lucene_7_x_9_x_ray.search import queries as Q

    merged, _ = get_searchers("/root/testdata/sf0.001")
    valid = merged.doc_values_valid("score_hint") \
        if hasattr(merged, "doc_values_valid") else None
    # engine scores via the searcher
    td = merged.search(Q.FeatureQuery("score_hint", function="saturation",
                                      pivot=100.0, boost=2.0), k=5)
    assert len(td.doc_ids) == 5
    # decode(encode(v)) == SQL's floor-based quantization for ints
    for v in [1, 7, 100, 128, 129, 511, 999, 1000, 2047]:
        f32 = np.float32(v)
        eng = (np.array([f32]).view(np.uint32)
               & np.uint32(0xFFFF8000)).view(np.float32)[0]
        e = math.floor(math.log2(v))
        sql = math.floor(v / 2 ** e * 256) / 256 * 2 ** e
        assert float(eng) == sql, v
    # saturation monotonicity and range
    tdq = merged.search(Q.FeatureQuery("score_hint", function="sigmoid",
                                       pivot=100.0, a=2.0), k=100)
    s = np.asarray(tdq.scores)
    assert np.all(s > 0) and np.all(s < 1)


def test_covering_query_dynamic_minimum(ray_session):
    """CoveringQuery (CoveringQuery.java:42): per-doc minimum from the
    expression source; raising the minimum shrinks the match set
    monotonically, and a doc matches iff its clause count clears its own
    minimum."""
    import numpy as np

    from lucene_7_x_9_x_ray.pipelines.flagship import get_searchers
    from lucene_7_x_9_x_ray.search import queries as Q

    merged, _ = get_searchers("/root/testdata/sf0.001")
    clauses = tuple(Q.TermQuery(t) for t in ("key", "hash", "table", "window"))
    n = {}
    for expr in ("1", "2", "3", "4"):
        q = Q.CoveringQuery(queries=clauses, min_expr=expr)
        td = merged.search(q, k=10_000, total_hits_threshold=1 << 30)
        n[expr] = len(td.doc_ids)
    assert n["1"] >= n["2"] >= n["3"] >= n["4"]
    # constant minimum k == boolean msm=k over the same clauses
    bq = Q.BooleanQuery.build([(Q.SHOULD, c) for c in clauses],
                              min_should_match=3)
    td_b = merged.search(bq, k=10_000, total_hits_threshold=1 << 30)
    q3 = Q.CoveringQuery(queries=clauses, min_expr="3")
    td_c = merged.search(q3, k=10_000, total_hits_threshold=1 << 30)
    assert sorted(map(int, td_b.doc_ids)) == sorted(map(int, td_c.doc_ids))
    assert np.allclose(sorted(map(float, td_b.scores)),
                       sorted(map(float, td_c.scores)))


def test_query_rescorer_semantics(ray_session):
    """QueryRescorer (QueryRescorer.java:57-186): docs the second query
    misses keep their first-pass score bit-for-bit; matched docs gain
    exactly f32(first + weight * second); the result re-sorts and
    truncates."""
    import numpy as np

    from lucene_7_x_9_x_ray.pipelines.flagship import get_searchers
    from lucene_7_x_9_x_ray.search import queries as Q
    from lucene_7_x_9_x_ray.search.rescorer import query_rescore

    merged, _ = get_searchers("/root/testdata/sf0.001")
    first = merged.search(
        Q.BooleanQuery.build([(Q.SHOULD, Q.TermQuery("key"))]), k=30
    )
    second = Q.TermQuery("window")
    td = query_rescore(merged, first, second, 3.0, 30)
    first_map = dict(zip(map(int, first.doc_ids), map(float, first.scores)))
    win = merged.search(
        Q.BooleanQuery.build([(Q.SHOULD, Q.TermQuery("window"))]),
        k=10_000, total_hits_threshold=1 << 30
    )
    win_map = dict(zip(map(int, win.doc_ids), map(float, win.scores)))
    for d, s in zip(map(int, td.doc_ids), map(float, td.scores)):
        if d in win_map:
            want = np.float32(np.float64(first_map[d]) + 3.0 * np.float64(win_map[d]))
            assert np.float32(s) == want
        else:
            assert s == first_map[d]
    # sorted desc, doc asc on ties
    ss = [float(s) for s in td.scores]
    assert ss == sorted(ss, reverse=True)
    # weight 0 == identity re-sort of the first pass
    td0 = query_rescore(merged, first, second, 0.0, 30)
    assert sorted(map(int, td0.doc_ids)) == sorted(map(int, first.doc_ids))


def test_sort_rescorer_semantics(ray_session):
    """SortRescorer (SortRescorer.java:42-75): the rescored set is exactly
    the first-pass top-N re-ordered by the sort field (desc, docID tie),
    first-pass scores preserved unchanged."""
    import numpy as np

    from lucene_7_x_9_x_ray.pipelines.flagship import get_searchers
    from lucene_7_x_9_x_ray.search import queries as Q
    from lucene_7_x_9_x_ray.search.rescorer import sort_rescore

    merged, _ = get_searchers("/root/testdata/sf0.001")
    first = merged.search(
        Q.BooleanQuery.build([(Q.SHOULD, Q.TermQuery("key")),
                              (Q.SHOULD, Q.TermQuery("hash"))]), k=25
    )
    td, vals = sort_rescore(merged, first, "length", True, 10)
    assert len(td.doc_ids) == 10
    # subset of the first pass, scores carried through untouched
    first_map = dict(zip(map(int, first.doc_ids), map(float, first.scores)))
    for d, s in zip(map(int, td.doc_ids), map(float, td.scores)):
        assert float(s) == first_map[d]
    # ordered by the sort value desc, docID asc on ties
    pairs = list(zip([-float(v) for v in vals], map(int, td.doc_ids)))
    assert pairs == sorted(pairs)
    # top_n >= len(first) == a pure permutation of the first pass
    td_all, _ = sort_rescore(merged, first, "length", True, 1000)
    assert sorted(map(int, td_all.doc_ids)) == sorted(map(int, first.doc_ids))


def test_diversified_topk_kernel_and_gate(ray_session):
    """diversified_top_k: 300 random duels vs the naive greedy scan, plus
    the gate-level per-key cap / rank-order invariants at sf0.001."""
    import numpy as np

    from lucene_7_x_9_x_ray.search.topk import diversified_top_k

    rng = np.random.default_rng(7)
    for _ in range(300):
        n = int(rng.integers(1, 80))
        docs = rng.permutation(n).astype(np.int64)
        keys = rng.integers(0, 6, n)
        scores = rng.random(n).astype(np.float32)
        k = int(rng.integers(1, 25))
        m = int(rng.integers(1, 5))
        sel = diversified_top_k(docs, keys, scores, k, m)
        order = np.lexsort((docs, -scores.astype(np.float64)))
        cnt: dict = {}
        want = []
        for i in order:
            if cnt.get(keys[i], 0) < m:
                cnt[keys[i]] = cnt.get(keys[i], 0) + 1
                want.append(i)
                if len(want) == k:
                    break
        assert list(sel) == want

    from lucene_7_x_9_x_ray.pipelines import flagship as F

    tbl = F.q_diversified_topk("/root/testdata/sf0.001")
    langs = tbl["lang"].to_pylist()
    scores = tbl["score_r"].to_pylist()
    assert len(tbl) <= F.DIVERSIFIED_K
    for lang in set(langs):
        assert langs.count(lang) <= F.DIVERSIFIED_MAX_PER_KEY
    assert scores == sorted(scores, reverse=True) or len(set(scores)) < len(scores)


def test_complex_phrase_parser(ray_session):
    """parse_complex_phrase: wildcard/fuzzy slots expand against the
    dictionary into MultiPhraseQuery positions; empty expansions collapse
    to MatchNoDocsQuery; plain phrases equal the literal PhraseQuery
    result through the search path."""
    from lucene_7_x_9_x_ray.pipelines.flagship import get_searchers
    from lucene_7_x_9_x_ray.search import queries as Q

    merged, _ = get_searchers("/root/testdata/sf0.001")
    tdict = merged.term_dict_union()

    q = Q.parse_complex_phrase('"key ha*"', tdict)
    assert isinstance(q, Q.MultiPhraseQuery)
    assert q.positions[0] == ("key",)
    assert "hash" in q.positions[1]
    assert all(t.startswith("ha") for t in q.positions[1])

    qf = Q.parse_complex_phrase('"kei~1 hash"', tdict)
    assert "key" in qf.positions[0]

    assert isinstance(
        Q.parse_complex_phrase('"zz* hash"', tdict), Q.MatchNoDocsQuery
    )

    # a phrase with single-term slots scores identically to PhraseQuery
    qp = Q.parse_complex_phrase('"key hash"', tdict)
    td_mp = merged.search(qp, k=10)
    td_ph = merged.search(Q.PhraseQuery(terms=("key", "hash")), k=10)
    assert list(map(int, td_mp.doc_ids)) == list(map(int, td_ph.doc_ids))
    assert [float(s) for s in td_mp.scores] == [float(s) for s in td_ph.scores]


def test_geo_box_query_and_distance_sort(tmp_path):
    """GeoBoxQuery (LatLonPoint.newBoxQuery role) masks by lat/lon box —
    including the antimeridian-crossing two-range rewrite — and
    distance_sort_topk (LatLonDocValuesField.newDistanceSort role) returns
    ascending haversine order with docID tie-break."""
    import math

    import pyarrow as pa_
    import pyarrow.parquet as pq_

    from lucene_7_x_9_x_ray.search import queries as Q
    from lucene_7_x_9_x_ray.search.geo import distance_sort_topk, haversine_m
    from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
    from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index_local

    rng = np.random.default_rng(11)
    n = 400
    lats = rng.uniform(-60, 60, n)
    lons = rng.uniform(-180, 180, n)
    t = pa_.table(
        {
            "url": [f"u{i}" for i in range(n)],
            "warc_ts": pa_.array(range(n), pa_.timestamp("us")),
            "text": ["geo doc"] * n,
            "lang": ["en"] * n,
            "lat": pa_.array(lats),
            "lon": pa_.array(lons),
        }
    )
    path = str(tmp_path / "p.parquet")
    pq_.write_table(t, path)
    idx = str(tmp_path / "i")
    build_index_local([path], idx,
                      BuildConfig(target_docs_per_segment=150,
                                  store_cols=("lat", "lon")))
    s = IndexSearcher(idx)

    box = Q.GeoBoxQuery("lat", "lon", -10.0, 30.0, 20.0, 90.0)
    td = s.search(Q.BooleanQuery.build([(Q.FILTER, box)]), k=n,
                  total_hits_threshold=1 << 30)
    want = {i for i in range(n)
            if -10.0 <= lats[i] <= 30.0 and 20.0 <= lons[i] <= 90.0}
    assert set(int(d) for d in td.doc_ids) == want and 0 < len(want) < n

    # antimeridian crossing: min_lon > max_lon matches the wrapped OR
    wrap = Q.GeoBoxQuery("lat", "lon", -60.0, 60.0, 150.0, -150.0)
    td2 = s.search(Q.BooleanQuery.build([(Q.FILTER, wrap)]), k=n,
                   total_hits_threshold=1 << 30)
    want2 = {i for i in range(n) if lons[i] >= 150.0 or lons[i] <= -150.0}
    assert set(int(d) for d in td2.doc_ids) == want2 and len(want2) > 0

    # distance sort: matches brute-force haversine ordering over all docs
    center = (10.0, 40.0)
    top = distance_sort_topk(s, "lat", "lon", *center, 20)
    dist = haversine_m(center[0], center[1], lats, lons)
    want_order = sorted(range(n), key=lambda i: (dist[i], i))[:20]
    assert [d for _, d in top] == want_order
    for got_d, i in zip((d for d, _ in top), want_order):
        assert math.isclose(got_d, dist[i], rel_tol=0, abs_tol=1e-9)


def test_geo_polygon_query(tmp_path):
    """GeoPolygonQuery (LatLonPoint.newPolygonQuery role): even-odd
    crossing containment over stored lat/lon, including a concave ring."""
    import pyarrow as pa_
    import pyarrow.parquet as pq_

    from lucene_7_x_9_x_ray.search import queries as Q
    from lucene_7_x_9_x_ray.search.geo import point_in_polygon
    from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
    from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index_local

    rng = np.random.default_rng(7)
    n = 300
    lats = rng.uniform(-50, 50, n)
    lons = rng.uniform(-50, 50, n)
    t = pa_.table(
        {
            "url": [f"u{i}" for i in range(n)],
            "warc_ts": pa_.array(range(n), pa_.timestamp("us")),
            "text": ["geo doc"] * n,
            "lang": ["en"] * n,
            "lat": pa_.array(lats),
            "lon": pa_.array(lons),
        }
    )
    path = str(tmp_path / "p.parquet")
    pq_.write_table(t, path)
    idx = str(tmp_path / "i")
    build_index_local([path], idx,
                      BuildConfig(target_docs_per_segment=120,
                                  store_cols=("lat", "lon")))
    s = IndexSearcher(idx)

    # concave "arrowhead": the notch at (0, 0) excludes points near origin
    ring = ((40.0, -40.0), (40.0, 40.0), (-40.0, 40.0), (0.0, 0.0), (-40.0, -40.0))
    q = Q.GeoPolygonQuery("lat", "lon", ring)
    td = s.search(Q.BooleanQuery.build([(Q.FILTER, q)]), k=n,
                  total_hits_threshold=1 << 30)
    got = set(int(d) for d in td.doc_ids)
    want = set(np.flatnonzero(point_in_polygon(lats, lons, list(ring))))
    assert got == want and 0 < len(want) < n
    # the notch works: a point just above the origin inside the hull but
    # in the notch is excluded
    assert not point_in_polygon(np.array([-5.0]), np.array([0.0]), list(ring))[0]
    assert point_in_polygon(np.array([20.0]), np.array([0.0]), list(ring))[0]
