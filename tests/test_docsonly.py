"""IndexOptions.DOCS tests (index_freqs=False): stored freqs are 1,
ttf == df, avgdl degrades to distinct-terms-per-doc, positions refused,
append mismatch refused, gate-vs-oracle parity."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_7_x_9_x_ray.search import queries as Q
from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
from lucene_7_x_9_x_ray.stages.build import BuildConfig, append_index, build_index_local
from lucene_7_x_9_x_ray.state.manifest import IndexManifest


def _pages(tmp_path, texts):
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
    return path


def test_docsonly_freqs_are_one_and_stats_degrade(tmp_path):
    path = _pages(tmp_path, ["cat cat cat dog", "cat fish"])
    idx = str(tmp_path / "idx")
    cfg = BuildConfig(analyzer="whitespace", index_positions=False, index_freqs=False)
    build_index_local([path], idx, cfg)
    s = IndexSearcher(idx)
    r = s.readers[0]
    docs, freqs = r.term_postings("cat").decode()
    assert list(docs) == [0, 1] and list(freqs) == [1, 1]
    # ttf == df for every term; sumTotalTermFreq == distinct (doc, term) pairs
    m = IndexManifest.load(idx)
    assert m.index_options == "docs"
    assert m.sum_total_term_freq == 4  # doc0 {cat,dog} + doc1 {cat,fish}
    # norms still hold TRUE token counts (4 and 2)
    from lucene_7_x_9_x_ray.functions.smallfloat import BYTE4_DECODE_TABLE

    assert list(BYTE4_DECODE_TABLE[r.norms]) == [4, 2]
    # scoring: freq=1 -> "cat cat cat dog" scores like a single occurrence
    td = s.search(Q.TermQuery("cat"), k=10)
    assert set(int(d) for d in td.doc_ids) == {0, 1}
    # positions were not indexed
    with pytest.raises(ValueError, match="index_positions=True"):
        s.search(Q.PhraseQuery(terms=("cat", "dog")), k=5)
    # appending with default (positions) config is refused
    with pytest.raises(ValueError, match="index_options"):
        append_index([path], idx, BuildConfig(analyzer="whitespace"))


def test_docsonly_requires_no_positions(tmp_path):
    path = _pages(tmp_path, ["a b"])
    with pytest.raises(ValueError, match="index_freqs"):
        build_index_local(
            [path], str(tmp_path / "idx"),
            BuildConfig(index_positions=True, index_freqs=False),
        )


def test_docsonly_gate_oracle_parity(ray_session):
    import duckdb as _dd

    from lucene_7_x_9_x_ray.pipelines import flagship, oracles

    sf = "/root/testdata/sf0.001"
    got = flagship.q_bm25_topk_docsonly(sf)
    con = _dd.connect()
    con.sql(f"create view documents as select * from '{sf}/documents.parquet'")
    want = con.sql(oracles.bm25_docsonly_topk_sql(flagship.BM25_QUERY_SPECS)).arrow()
    key = [("query_id", "ascending"), ("rank", "ascending")]
    assert got.sort_by(key).equals(want.cast(got.schema).sort_by(key))
    # per-segment serving must agree with the merged index (the clamped
    # freqs and degraded stats survive the term-shuffle merge)
    import numpy as np

    from lucene_7_x_9_x_ray.search import queries as Q

    index_dir = flagship.build_docsonly_index(sf)
    seg = IndexSearcher(index_dir)
    for qid, terms, k, offset in flagship.BM25_QUERY_SPECS:
        if offset:
            continue
        q = Q.BooleanQuery.build([(Q.SHOULD, Q.TermQuery(t)) for t in terms])
        td = seg.search(q, k=k)
        sub = got.filter(
            __import__("pyarrow").compute.equal(got["query_id"], qid)
        ).sort_by([("rank", "ascending")])
        assert [int(d) for d in td.doc_ids] == sub["doc_id"].to_pylist(), qid
        for s, r in zip(td.scores, sub["score_r"].to_pylist()):
            assert abs(float(np.float32(s)) - r) < 5e-5, qid


def test_docsonly_term_vectors_keep_true_freqs(tmp_path):
    # regression: term vectors are a per-doc stored structure independent
    # of the field's IndexOptions — freqs must NOT clamp to 1
    path = _pages(tmp_path, ["cat cat cat dog"])
    idx = str(tmp_path / "idx")
    build_index_local(
        [path], idx,
        BuildConfig(analyzer="whitespace", index_positions=False,
                    index_freqs=False, term_vectors=True),
    )
    s = IndexSearcher(idx)
    terms, freqs = s.readers[0].term_vector(0)
    assert dict(zip(list(terms), list(map(int, freqs)))) == {"cat": 3, "dog": 1}
    # postings still clamped
    _d, f = s.readers[0].term_postings("cat").decode()
    assert list(f) == [1]


def test_legacy_manifest_index_options_inference(tmp_path):
    # regression: a manifest written before index_options existed must
    # resolve from segment artifacts — a same-config append is accepted,
    # a positions append onto a freq-only index is refused
    import json
    import os

    from lucene_7_x_9_x_ray.stages.build import resolve_index_options

    path = _pages(tmp_path, ["cat dog", "dog fish"])
    idx = str(tmp_path / "idx")
    cfg = BuildConfig(analyzer="whitespace", index_positions=False)
    build_index_local([path], idx, cfg)
    mpath = os.path.join(idx, "manifest.json")
    with open(mpath) as f:
        d = json.load(f)
    del d["index_options"]  # simulate the legacy layout
    with open(mpath, "w") as f:
        json.dump(d, f)
    m = IndexManifest.load(idx)
    assert m.index_options == ""
    assert resolve_index_options(m) == "docs_freqs"  # no positions.bin
    # same-config append accepted (would previously refuse)
    append_index([path], idx, cfg)
    # positions append refused (would previously pass)
    with pytest.raises(ValueError, match="index_options"):
        append_index([path], idx, BuildConfig(analyzer="whitespace"))
