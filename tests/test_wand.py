"""WAND duels: pruned top-k == exhaustive top-k, exactly (FIXTURES.md F5).

Pattern of TestWANDScorer.testRandom (solr-8.4.0 core test
TestWANDScorer.java:209-247) + CheckHits.checkTopScores: random corpora
with heavy posting overlap, disjunctions of 2-8 terms, k in {1, 10, 100},
total-hits threshold forced to k so pruning actually engages.
"""

import numpy as np
import pyarrow as pa
import pytest

from lucene_7_x_9_x_ray.search import queries as Q
from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
from lucene_7_x_9_x_ray.search.topk import TopKCollector
from lucene_7_x_9_x_ray.search.wand import wand_topk
from lucene_7_x_9_x_ray.sources.pages import generate_pages, write_pages_parquet
from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index_local


def _random_overlap_corpus(n_docs: int, seed: int) -> list[str]:
    """TestWANDScorer.testRandom shape: tokens from a 10-token sliding
    window over a small vocabulary — guarantees heavy overlap."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i:03d}" for i in range(30)]
    docs = []
    for _ in range(n_docs):
        n_tok = int(rng.integers(0, 1 << int(rng.integers(0, 5))))
        lo = int(rng.integers(0, 20))
        toks = rng.choice(vocab[lo : lo + 10], size=n_tok) if n_tok else []
        docs.append(" ".join(toks))
    return docs


@pytest.fixture(scope="module", params=[11, 29])
def duel_idx(request, tmp_path_factory):
    tmp = tmp_path_factory.mktemp(f"duel{request.param}")
    docs = _random_overlap_corpus(1200, seed=request.param)
    t = pa.table(
        {
            "url": [f"u{i}" for i in range(len(docs))],
            "warc_ts": pa.array(np.arange(len(docs)), type=pa.timestamp("us")),
            "text": docs,
            "lang": ["en"] * len(docs),
        }
    )
    p = str(tmp / "pages.parquet")
    write_pages_parquet(t, p, rows_per_row_group=200)
    build_index_local([p], str(tmp / "idx"), BuildConfig(target_docs_per_segment=400))
    return IndexSearcher(str(tmp / "idx"))


def duel(searcher, terms, k, msm=0):
    q = Q.BooleanQuery.build([(Q.SHOULD, Q.TermQuery(t)) for t in terms], min_should_match=msm)
    exh = searcher.search(q, k=k, mode="exhaustive")
    # force pruning: threshold == k
    wnd = searcher.search(q, k=k, mode="wand", total_hits_threshold=k)
    assert exh.to_lists() == wnd.to_lists(), (terms, k, exh.to_lists(), wnd.to_lists())
    return exh


def test_duel_random_disjunctions(duel_idx):
    rng = np.random.default_rng(7)
    vocab = [f"w{i:03d}" for i in range(30)]
    for trial in range(20):
        n_terms = int(rng.integers(2, 9))
        terms = list(rng.choice(vocab, size=n_terms, replace=False))
        for k in (1, 10, 100):
            duel(duel_idx, terms, k)


def test_duel_head_plus_tail_terms(duel_idx):
    # head terms (dense postings) + rare/absent terms
    duel(duel_idx, ["w010", "w011", "zzz_absent"], 10)
    duel(duel_idx, ["w000", "w029"], 5)


def test_duel_single_term(duel_idx):
    duel(duel_idx, ["w015"], 10)


def test_duel_boosts(duel_idx):
    q = Q.BooleanQuery.build(
        [
            (Q.SHOULD, Q.TermQuery("w010", boost=3.0)),
            (Q.SHOULD, Q.TermQuery("w012", boost=0.25)),
            (Q.SHOULD, Q.TermQuery("w014")),
        ]
    )
    exh = duel_idx.search(q, k=10, mode="exhaustive")
    wnd = duel_idx.search(q, k=10, mode="wand", total_hits_threshold=10)
    assert exh.to_lists() == wnd.to_lists()


def test_duel_zipf_corpus(tmp_path):
    """Zipf web corpus (FIXTURES F2): realistic skew, multi-segment."""
    t = generate_pages(3000, seed=13, vocab_size=1000, mean_tokens=80, dup_url_frac=0)
    p = str(tmp_path / "pages.parquet")
    write_pages_parquet(t, p, rows_per_row_group=512)
    build_index_local([p], str(tmp_path / "idx"), BuildConfig(target_docs_per_segment=1000))
    s = IndexSearcher(str(tmp_path / "idx"))
    for terms in [
        ["t00000", "t00001"],  # the two heaviest heads
        ["t00000", "t00500", "t00900"],  # head + torso + tail
        ["t00100", "t00101", "t00102", "t00103"],
    ]:
        for k in (1, 10, 100):
            duel(s, terms, k)


def test_wand_threshold_semantics(duel_idx):
    """With the default 1000-doc threshold the collector reports exact
    total hits below it and a lower bound above."""
    q = Q.BooleanQuery.build([(Q.SHOULD, Q.TermQuery("w010")), (Q.SHOULD, Q.TermQuery("w011"))])
    exact = duel_idx.search(q, k=5, mode="exhaustive")
    wnd = duel_idx.search(q, k=5, mode="wand")  # default threshold 1000
    if exact.total_hits < 1000:
        assert wnd.total_hits == exact.total_hits
    pruned = duel_idx.search(q, k=5, mode="wand", total_hits_threshold=5)
    # pruned hit count is a lower bound <= true count
    assert pruned.total_hits <= exact.total_hits


def test_shared_collector_cross_segment_pruning(duel_idx):
    """Per-segment WAND with a shared collector equals the merged result."""
    from lucene_7_x_9_x_ray.functions.bm25 import BM25

    terms = [("w008", 1.0), ("w018", 1.0)]
    q = Q.BooleanQuery.build([(Q.SHOULD, Q.TermQuery(t)) for t, _ in terms])
    stats = duel_idx.collection_stats({t for t, _ in terms})
    coll = TopKCollector(10, 10)
    for r in duel_idx.readers:
        wand_topk(r, terms, 10, stats, BM25(), collector=coll, doc_base=r.doc_base)
    exh = duel_idx.search(q, k=10, mode="exhaustive")
    assert coll.result().to_lists() == exh.to_lists()


def test_conjunction_blockmax_duel(tmp_path):
    """BlockMaxConjunction top-k is rank-identical to the exhaustive MUST
    path, on segments and on the merged index (chained hot fragments)."""
    import numpy as np

    from lucene_7_x_9_x_ray.search import queries as Q
    from lucene_7_x_9_x_ray.search.merged import open_searcher
    from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
    from lucene_7_x_9_x_ray.sources.pages import generate_pages, write_pages_parquet
    from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index_local
    from lucene_7_x_9_x_ray.stages.merge import MergeConfig, merge_index_local

    pages = generate_pages(900, vocab_size=120, mean_tokens=30, seed=91)
    path = str(tmp_path / "p.parquet")
    write_pages_parquet(pages, path, rows_per_row_group=150)
    idx = str(tmp_path / "i")
    build_index_local([path], idx, BuildConfig(target_docs_per_segment=150))
    merged = merge_index_local(idx, MergeConfig(n_shards=4, hot_df_threshold=100, hot_buckets=3))
    assert merged["hot_terms"]

    hot = merged["hot_terms"][0]
    cases = [
        ["t00000", "t00001"],
        [hot, "t00010"],
        ["t00002", "t00005", hot],
        ["t00050", "t00080"],
    ]
    for searcher in (IndexSearcher(idx), open_searcher(idx)):
        for terms in cases:
            q = Q.BooleanQuery.build([(Q.MUST, Q.TermQuery(t)) for t in terms])
            for k in (1, 10, 50):
                a = searcher.search(q, k=k, mode="exhaustive")
                b = searcher.search(q, k=k, mode="wand")
                assert list(a.doc_ids) == list(b.doc_ids), (terms, k)
                assert np.array_equal(a.scores, b.scores), (terms, k)
                # aggressive pruning regime: tiny threshold
                c = searcher.search(q, k=k, mode="wand", total_hits_threshold=1)
                assert list(a.doc_ids) == list(c.doc_ids), (terms, k)
                assert np.array_equal(a.scores, c.scores), (terms, k)


def test_maxscore_duels_exhaustive(tmp_path):
    """Vectorized MaxScore == exhaustive, rank- and score-identical, across
    corpus shapes, k values, segment counts, and the merged (salted) index."""
    from lucene_7_x_9_x_ray.search import queries as Q
    from lucene_7_x_9_x_ray.search.merged import open_searcher
    from lucene_7_x_9_x_ray.search.searcher import IndexSearcher, _as_term_disjunction
    from lucene_7_x_9_x_ray.search.topk import TopKCollector
    from lucene_7_x_9_x_ray.search.wand import maxscore_topk
    from lucene_7_x_9_x_ray.sources.pages import generate_pages, write_pages_parquet
    from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index_local
    from lucene_7_x_9_x_ray.stages.merge import MergeConfig, merge_index_local

    pages = generate_pages(1500, vocab_size=400, mean_tokens=60, seed=17)
    path = str(tmp_path / "p.parquet")
    write_pages_parquet(pages, path, rows_per_row_group=300)
    idx = str(tmp_path / "i")
    build_index_local([path], idx, BuildConfig(target_docs_per_segment=300,
                                               index_positions=False))
    merge_index_local(idx, MergeConfig(n_shards=4, hot_df_threshold=400))

    seg = IndexSearcher(idx)
    mrg = open_searcher(idx)
    rng = np.random.default_rng(23)
    shapes = [
        ["t00000", "t00300"],               # head + rare
        ["t00000", "t00001", "t00350"],     # 2 head + rare
        ["t00005", "t00050", "t00200"],     # mixed
        ["t00399", "t00398"],               # two rare
        ["t00000", "t00001"],               # dense pair (worst case)
    ]
    for _ in range(10):
        ts = sorted(rng.choice([f"t{i:05d}" for i in range(400)], size=3, replace=False))
        shapes.append(list(ts))
    for terms in shapes:
        for k in (3, 10, 40):
            q = Q.BooleanQuery.build([(Q.SHOULD, Q.TermQuery(t)) for t in terms])
            disj = _as_term_disjunction(q)
            for searcher in (seg, mrg):
                stats = searcher.collection_stats(Q.collect_field_terms(q))
                te = searcher.search(q, k=k, mode="exhaustive",
                                     total_hits_threshold=1 << 30)
                coll = TopKCollector(k, 1000)
                for r in searcher.readers:
                    maxscore_topk(r, disj, k, stats, searcher.bm25,
                                  collector=coll, doc_base=r.doc_base)
                tm = coll.result()
                assert list(te.doc_ids) == list(tm.doc_ids), (terms, k)
                assert np.array_equal(te.scores, tm.scores), (terms, k)
                # the auto path must agree too, whichever scorer it picks
                ta = searcher.search(q, k=k, total_hits_threshold=1 << 30)
                assert list(te.doc_ids) == list(ta.doc_ids), (terms, k)
                assert np.array_equal(te.scores, ta.scores), (terms, k)


def test_term_impact_pruning_and_floor(tmp_path):
    """Impact-level block skipping with a probed kth-score floor is
    rank-identical to exhaustive for single-term queries; the probe floor
    is a valid lower bound of the kth-best score."""
    from lucene_7_x_9_x_ray.search import queries as Q
    from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
    from lucene_7_x_9_x_ray.search.topk import TopKCollector
    from lucene_7_x_9_x_ray.search.wand import probe_score_floor, term_impact_topk
    from lucene_7_x_9_x_ray.sources.pages import generate_pages, write_pages_parquet
    from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index_local

    pages = generate_pages(3000, vocab_size=200, mean_tokens=80, seed=29)
    path = str(tmp_path / "p.parquet")
    write_pages_parquet(pages, path, rows_per_row_group=600)
    idx = str(tmp_path / "i")
    build_index_local([path], idx, BuildConfig(target_docs_per_segment=600,
                                               index_positions=False))
    s = IndexSearcher(idx)
    for term in ["t00000", "t00010", "t00100", "t00199"]:
        for k in (5, 10, 50):
            q = Q.TermQuery(term)
            stats = s.collection_stats(Q.collect_field_terms(q))
            te = s.search(q, k=k, mode="exhaustive", total_hits_threshold=1 << 30)
            floor = probe_score_floor(s.readers[0], [(term, 1.0)], k, stats, s.bm25)
            if len(te.scores) >= k:
                assert floor <= float(te.scores[k - 1]) + 1e-7
            coll = TopKCollector(k, 1)
            for r in s.readers:
                term_impact_topk(r, term, 1.0, k, stats, s.bm25, floor=floor,
                                 collector=coll, doc_base=r.doc_base)
            ti = coll.result()
            assert list(te.doc_ids) == list(ti.doc_ids), (term, k)
            assert np.array_equal(te.scores, ti.scores), (term, k)


def test_exact_count_opt_in_under_pruning(duel_idx):
    """count_mode="exact": the pruned path returns the TRUE total_hits
    (equal to exhaustive enumeration) while keeping the pruned top-k."""
    rng = np.random.default_rng(5)
    vocab = [f"w{i:03d}" for i in range(30)]
    for trial in range(20):
        terms = list(rng.choice(vocab, size=int(rng.integers(2, 6)), replace=False))
        k = int(rng.choice([1, 5, 10]))
        q = Q.BooleanQuery.build([(Q.SHOULD, Q.TermQuery(t)) for t in terms])
        exh = duel_idx.search(q, k=1 << 20, mode="exhaustive",
                              total_hits_threshold=1 << 30)
        for mode in ("wand", "maxscore"):
            pruned = duel_idx.search(q, k=k, mode=mode, total_hits_threshold=k)
            exact = duel_idx.search(q, k=k, mode=mode, total_hits_threshold=k,
                                    count_mode="exact")
            # same pruned top-k either way
            assert pruned.to_lists() == exact.to_lists(), (terms, k, mode)
            assert not exact.total_hits_is_lower_bound
            assert exact.total_hits == exh.total_hits, (terms, k, mode)
            # and the default really is a lower bound of the true count
            assert pruned.total_hits <= exh.total_hits

    import pytest as _pt

    with _pt.raises(ValueError, match="count_mode"):
        duel_idx.search(Q.TermQuery("w000"), count_mode="bogus")
