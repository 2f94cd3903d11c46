"""Block-join tests: score-mode arithmetic vs hand computation, the
parent-match illegal-state guard, segment-vs-merged equality, and
gate-vs-oracle parity on the driver corpus."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_7_x_9_x_ray.search import queries as Q
from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index_local


def _block_index(tmp_path, blocks: list[list[str]]):
    """blocks: list of child-text lists; each block gets a 'pdoc' parent."""
    urls, texts, is_parent, orig = [], [], [], []
    for b, children in enumerate(blocks):
        for k, t in enumerate(children):
            urls.append(f"c/{b}/{k}")
            texts.append(t)
            is_parent.append(0)
            orig.append(b)
        urls.append(f"p/{b}")
        texts.append("pdoc")
        is_parent.append(1)
        orig.append(b)
    n = len(urls)
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(np.zeros(n, dtype="datetime64[us]")),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "is_parent": pa.array(is_parent, pa.int64()),
            "orig_doc": pa.array(orig, pa.int64()),
        }
    )
    path = str(tmp_path / "pages.parquet")
    pq.write_table(t, path)
    idx = str(tmp_path / "idx")
    build_index_local(
        [path], idx,
        BuildConfig(analyzer="whitespace", store_cols=("is_parent", "orig_doc")),
    )
    return IndexSearcher(idx)


def test_blockjoin_score_modes_vs_hand(tmp_path):
    s = _block_index(
        tmp_path,
        [
            ["cat dog", "cat cat bird", "fish"],  # block 0: 2 matching children
            ["cat", "bird"],                      # block 1: 1 matching child
            ["dog bird"],                         # block 2: none
        ],
    )
    child_scores = {}
    td = s.search(Q.TermQuery("cat"), k=10)
    for d, sc in zip(td.doc_ids, td.scores):
        child_scores[int(d)] = np.float64(np.float32(sc))
    # block 0 children are docs 0..2, parent 3; block 1 children 4..5, parent 6
    b0 = [child_scores[0], child_scores[1]]
    b1 = [child_scores[4]]
    expect = {
        "avg": {3: np.float32(sum(b0) / 2), 6: np.float32(sum(b1) / 1)},
        "total": {3: np.float32(b0[0] + b0[1]), 6: np.float32(b1[0])},
        "max": {3: np.float32(max(b0)), 6: np.float32(max(b1))},
        "min": {3: np.float32(min(b0)), 6: np.float32(min(b1))},
        "none": {3: np.float32(0.0), 6: np.float32(0.0)},
    }
    for mode, want in expect.items():
        td = s.search(Q.ToParentBlockJoinQuery(Q.TermQuery("cat"), score_mode=mode), k=10)
        got = {int(d): np.float32(x) for d, x in zip(td.doc_ids, td.scores)}
        assert got == want, (mode, got, want)


def test_blockjoin_boolean_child_and_parent_guard(tmp_path):
    s = _block_index(tmp_path, [["cat dog", "bird"], ["dog"]])
    q = Q.ToParentBlockJoinQuery(
        Q.BooleanQuery.build([(Q.SHOULD, Q.TermQuery("cat")), (Q.SHOULD, Q.TermQuery("dog"))]),
        score_mode="total",
    )
    td = s.search(q, k=10)
    assert set(int(d) for d in td.doc_ids) == {2, 4}  # both parents
    # a child query matching parent docs is an illegal combination
    with pytest.raises(ValueError, match="must not match same docs"):
        s.search(Q.ToParentBlockJoinQuery(Q.TermQuery("pdoc")), k=10)


def test_tochild_blockjoin_inherits_parent_score(tmp_path):
    s = _block_index(tmp_path, [["cat dog", "bird"], ["dog"], ["fish cat"]])
    # parents: docs 2, 4, 6; children: 0, 1 | 3 | 5
    td = s.search(Q.ToChildBlockJoinQuery(Q.TermQuery("pdoc")), k=20)
    got = {int(d): np.float32(x) for d, x in zip(td.doc_ids, td.scores)}
    p = s.search(Q.TermQuery("pdoc"), k=10)
    pscore = {int(d): np.float32(x) for d, x in zip(p.doc_ids, p.scores)}
    assert set(got) == {0, 1, 3, 5}
    assert got[0] == got[1] == pscore[2]
    assert got[3] == pscore[4]
    assert got[5] == pscore[6]
    # a parent query hitting a non-parent doc is illegal
    with pytest.raises(ValueError, match="not matched by parents filter"):
        s.search(Q.ToChildBlockJoinQuery(Q.TermQuery("cat")), k=10)


def test_tochild_gate_oracle_parity(ray_session):
    import duckdb as _dd

    from lucene_7_x_9_x_ray.pipelines import flagship, oracles

    sf = "/root/testdata/sf0.001"
    got = flagship.q_tochild_topk(sf)
    con = _dd.connect()
    con.sql(f"create view documents as select * from '{sf}/documents.parquet'")
    want = con.sql(
        oracles.tochild_topk_sql(
            flagship.TOCHILD_TOPK_SPECS,
            flagship.BLOCKJOIN_CHUNK_W,
            flagship.BLOCKJOIN_PARENT_TEXT,
        )
    ).arrow()
    key = [("query_id", "ascending"), ("rank", "ascending")]
    assert got.sort_by(key).equals(want.cast(got.schema).sort_by(key))
    assert got.num_rows > 0


def test_blockjoin_gate_segment_vs_merged_and_oracle(ray_session):
    import duckdb as _dd

    from lucene_7_x_9_x_ray.pipelines import flagship, oracles

    sf = "/root/testdata/sf0.001"
    got = flagship.q_blockjoin_topk(sf)
    con = _dd.connect()
    con.sql(f"create view documents as select * from '{sf}/documents.parquet'")
    want = con.sql(
        oracles.blockjoin_topk_sql(
            flagship.BLOCKJOIN_TOPK_SPECS,
            flagship.BLOCKJOIN_CHUNK_W,
            flagship.BLOCKJOIN_PARENT_TEXT,
        )
    ).arrow()
    key = [("query_id", "ascending"), ("rank", "ascending")]
    assert got.sort_by(key).equals(want.cast(got.schema).sort_by(key))
    # per-segment evaluation must agree with the merged index
    index_dir = flagship.build_blockjoin_index(sf)
    seg = IndexSearcher(index_dir)
    orig = np.concatenate([np.asarray(r.doc_values("orig_doc")) for r in seg.readers])
    for qid, term, mode, k in flagship.BLOCKJOIN_TOPK_SPECS[:2]:
        td = seg.search(Q.ToParentBlockJoinQuery(Q.TermQuery(term), score_mode=mode), k=k)
        sub = got.filter(pa.compute.equal(got["query_id"], qid)).sort_by([("rank", "ascending")])
        assert [int(orig[int(d)]) for d in td.doc_ids] == sub["doc_id"].to_pylist()


def test_tochild_boost_and_segment_vs_merged(ray_session, tmp_path):
    s = _block_index(tmp_path, [["cat dog", "bird"], ["dog"], ["fish cat"]])
    td = s.search(Q.ToChildBlockJoinQuery(Q.TermQuery("pdoc")), k=20)
    td2 = s.search(Q.ToChildBlockJoinQuery(Q.TermQuery("pdoc"), boost=2.0), k=20)
    assert list(td.doc_ids) == list(td2.doc_ids)
    for a, b in zip(td.scores, td2.scores):
        assert np.float32(b) == np.float32(2.0) * np.float32(a)
    # ToParent boost too
    tp = s.search(Q.ToParentBlockJoinQuery(Q.TermQuery("cat")), k=20)
    tp2 = s.search(Q.ToParentBlockJoinQuery(Q.TermQuery("cat"), boost=3.0), k=20)
    assert list(tp.doc_ids) == list(tp2.doc_ids)
    for a, b in zip(tp.scores, tp2.scores):
        assert np.float32(b) == np.float32(3.0) * np.float32(a)

    # per-segment evaluation must agree with the merged index on the gate
    from lucene_7_x_9_x_ray.pipelines import flagship

    sf = "/root/testdata/sf0.001"
    got = flagship.q_tochild_topk(sf)
    index_dir = flagship.build_blockjoin_index(sf)
    seg = IndexSearcher(index_dir)
    orig = np.concatenate([np.asarray(r.doc_values("orig_doc")) for r in seg.readers])
    chunk = np.concatenate([np.asarray(r.doc_values("chunk_id")) for r in seg.readers])
    for qid, terms, k in flagship.TOCHILD_TOPK_SPECS:
        pq_ = Q.BooleanQuery.build([(Q.SHOULD, Q.TermQuery(t)) for t in terms])
        td = seg.search(Q.ToChildBlockJoinQuery(pq_), k=k)
        sub = got.filter(pa.compute.equal(got["query_id"], qid)).sort_by(
            [("rank", "ascending")]
        )
        assert [(int(orig[int(d)]), int(chunk[int(d)])) for d in td.doc_ids] == list(
            zip(sub["doc_id"].to_pylist(), sub["chunk_id"].to_pylist())
        )
