"""IndexSearcher.explain: explanation values equal hit scores exactly
(the CheckHits.verifyExplanation invariant)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_7_x_9_x_ray.search import queries as Q
from lucene_7_x_9_x_ray.search.explain import explain
from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index_local
from lucene_7_x_9_x_ray.state.livedocs import delete_docs


def _searcher(tmp_path, texts):
    t = pa.table(
        {
            "url": [f"u{i}" for i in range(len(texts))],
            "warc_ts": pa.array(range(len(texts)), pa.timestamp("us")),
            "text": texts,
            "lang": ["en"] * len(texts),
        }
    )
    path = str(tmp_path / "p.parquet")
    pq.write_table(t, path)
    idx = str(tmp_path / "i")
    build_index_local([path], idx, BuildConfig(target_docs_per_segment=3))
    return idx, IndexSearcher(idx)


TEXTS = [
    "key hash key table",
    "key value window",
    "hash hash table scan",
    "window batch spark key",
    "the quick table",
    "key key key hash",
]


def _assert_explains_hits(s, query, k=10):
    td = s.search(query, k=k, total_hits_threshold=1 << 30)
    assert len(td.doc_ids) > 0
    for d, score in zip(td.doc_ids, td.scores):
        ex = explain(s, query, int(d))
        assert ex["match"] is True
        assert np.float32(ex["value"]) == np.float32(score), (d, ex["value"], score)
    return td


def test_explain_matches_search_scores(tmp_path):
    _, s = _searcher(tmp_path, TEXTS)
    _assert_explains_hits(s, Q.TermQuery("key"))
    _assert_explains_hits(
        s,
        Q.BooleanQuery.build(
            [(Q.SHOULD, Q.TermQuery("key")), (Q.SHOULD, Q.TermQuery("hash")),
             (Q.MUST_NOT, Q.TermQuery("spark"))]
        ),
    )
    _assert_explains_hits(
        s,
        Q.BooleanQuery.build(
            [(Q.MUST, Q.TermQuery("table")),
             (Q.FILTER, Q.NumericRangeQuery("warc_ts", 0, None))]
        ),
    )
    _assert_explains_hits(s, Q.BoostQuery(Q.TermQuery("hash"), 2.5))
    # generic fallback shapes stay value-exact
    _assert_explains_hits(s, Q.PhraseQuery(("key", "hash")))
    _assert_explains_hits(
        s, Q.DisjunctionMaxQuery((Q.TermQuery("key"), Q.TermQuery("table")), 0.3)
    )
    # multi-term rewrite path
    _assert_explains_hits(s, Q.PrefixQuery("ke"))


def test_explain_non_matches_and_structure(tmp_path):
    idx, s = _searcher(tmp_path, TEXTS)
    # doc 4 has no "key"
    ex = explain(s, Q.TermQuery("key"), 4)
    assert ex["match"] is False and ex["value"] == 0.0
    # MUST_NOT exclusion explains as non-match
    q = Q.BooleanQuery.build(
        [(Q.SHOULD, Q.TermQuery("key")), (Q.MUST_NOT, Q.TermQuery("hash"))]
    )
    assert explain(s, q, 0)["match"] is False
    # minShouldMatch failure
    q2 = Q.BooleanQuery.build(
        [(Q.SHOULD, Q.TermQuery("key")), (Q.SHOULD, Q.TermQuery("batch")),
         (Q.SHOULD, Q.TermQuery("scan"))],
        min_should_match=2,
    )
    assert explain(s, q2, 1)["match"] is False  # doc1 matches only "key"
    # term leaf carries the BM25 inputs as details
    ex3 = explain(s, Q.TermQuery("key"), 0)
    names = [d["description"].split(",")[0] for d in ex3["details"]]
    assert names == ["freq", "n", "N", "norm byte (SmallFloat-encoded field length)"]
    # deleted docs explain as non-matches
    delete_docs(idx, [0])
    s2 = IndexSearcher(idx)
    assert explain(s2, Q.TermQuery("key"), 0)["match"] is False
