"""Payload tests: DelimitedPayload token splitting, the .pay stream
round-trip, PayloadFunction arithmetic vs hand computation, payload carry
through the pull merge / compaction / reclaim, NRT-append config guard,
and gate-vs-oracle parity on the driver corpus."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_7_x_9_x_ray.search import queries as Q
from lucene_7_x_9_x_ray.search.payloads import payload_doc_scores
from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index_local
from lucene_7_x_9_x_ray.state.segment import split_payload_tokens


def _pages_table(docs: list[str]) -> pa.Table:
    n = len(docs)
    return pa.table(
        {
            "url": [f"u{i}" for i in range(n)],
            "warc_ts": pa.array([0] * n, pa.timestamp("us")),
            "text": docs,
            "lang": ["en"] * n,
        }
    )


def _build(tmp_path, docs, **cfg_kw):
    path = str(tmp_path / "pages.parquet")
    pq.write_table(_pages_table(docs), path, row_group_size=cfg_kw.pop("rg", 10**9))
    idx = str(tmp_path / "idx")
    build_index_local([path], idx, BuildConfig(
        analyzer="whitespace", payload_delimiter="|", **cfg_kw))
    return idx


def test_split_payload_tokens_first_delimiter_and_missing():
    toks = ["cat|2.5", "dog", "x|0.0"]
    terms, pays = split_payload_tokens(toks, "|")
    assert list(terms) == ["cat", "dog", "x"]
    assert pays[0] == np.float32(2.5)
    assert np.isnan(pays[1])
    assert pays[2] == np.float32(0.0)


def test_split_payload_tokens_bad_suffix_raises():
    # the split is at the FIRST delimiter (DelimitedPayloadTokenFilter
    # scans forward), so "a|1|9" has suffix "1|9" — non-numeric, raising
    # like FloatEncoder's NumberFormatException
    with pytest.raises(ValueError, match="non-numeric payload"):
        split_payload_tokens(["ok|1.5", "a|1|9"], "|")
    with pytest.raises(ValueError, match="non-numeric payload"):
        split_payload_tokens(["bad|x2"], "|")


def test_payload_requires_positions(tmp_path):
    path = str(tmp_path / "p.parquet")
    pq.write_table(_pages_table(["a b"]), path)
    with pytest.raises(ValueError, match="payloads require index_positions"):
        build_index_local([path], str(tmp_path / "i"), BuildConfig(
            analyzer="whitespace", payload_delimiter="|", index_positions=False))


def test_payload_stream_roundtrip(tmp_path):
    docs = ["cat|2.0 dog cat|0.5 bird|1.5", "dog|3.0 dog cat", "bird fish"]
    idx = _build(tmp_path, docs)
    r = IndexSearcher(idx).readers[0]
    assert r.has_payloads
    d, f, pos, pays = r.term_positions_payloads("cat")
    assert list(d) == [0, 1] and list(f) == [2, 1]
    assert list(pos) == [0, 2, 2]
    assert pays[0] == np.float32(2.0) and pays[1] == np.float32(0.5)
    assert np.isnan(pays[2])
    # term with no payloads at all
    _, _, _, pb = r.term_positions_payloads("fish")
    assert np.isnan(pb).all()


def test_payload_functions_vs_hand():
    pays = np.array([2.0, 0.5, np.nan, 3.0], dtype=np.float32)
    freqs = np.array([3, 1], dtype=np.int64)  # doc0: [2.0, 0.5, nan->1], doc1: [3.0]
    assert list(payload_doc_scores(pays, freqs, "min")) == [0.5, 3.0]
    assert list(payload_doc_scores(pays, freqs, "max")) == [2.0, 3.0]
    assert list(payload_doc_scores(pays, freqs, "sum")) == [3.5, 3.0]
    avg = payload_doc_scores(pays, freqs, "average")
    assert avg[0] == np.float32(np.float32(3.5) / np.float32(3.0)) and avg[1] == 3.0
    with pytest.raises(ValueError, match="unknown payload function"):
        payload_doc_scores(pays, freqs, "median")


def test_payload_query_span_score_multiplies(tmp_path):
    docs = ["cat|2.0 dog cat|0.5", "dog|3.0 cat", "bird"]
    idx = _build(tmp_path, docs)
    s = IndexSearcher(idx)
    bm = dict(zip(
        (int(d) for d in s.search(Q.TermQuery("cat"), k=10).doc_ids),
        s.search(Q.TermQuery("cat"), k=10).scores,
    ))
    td = s.search(Q.PayloadScoreQuery("cat", func="max"), k=10)
    want_pay = {0: np.float32(2.0), 1: np.float32(1.0)}
    for d, sc in zip(td.doc_ids, td.scores):
        assert np.float32(sc) == np.float32(bm[int(d)]) * want_pay[int(d)]
    # payload-only: exactly the payload factor
    td2 = s.search(Q.PayloadScoreQuery("cat", func="max", include_span_score=False), k=10)
    got = {int(d): np.float32(x) for d, x in zip(td2.doc_ids, td2.scores)}
    assert got == want_pay


def test_payload_survives_merge_and_compaction(ray_session, tmp_path):
    from lucene_7_x_9_x_ray.search.merged import open_searcher
    from lucene_7_x_9_x_ray.stages.build import build_index
    from lucene_7_x_9_x_ray.stages.compact import CompactionPolicy, compact_index
    from lucene_7_x_9_x_ray.stages.merge import MergeConfig, merge_index

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(20)]
    docs = []
    for _ in range(120):
        toks = []
        for pos, t in enumerate(rng.choice(vocab, size=int(rng.integers(4, 15)))):
            toks.append(f"{t}|{((3 * len(t) + pos) % 8) * 0.25}" if pos % 3 != 2 else str(t))
        docs.append(" ".join(toks))
    path = str(tmp_path / "pages.parquet")
    pq.write_table(_pages_table(docs), path, row_group_size=20)  # 6 segments
    idx = str(tmp_path / "idx")
    cfg = BuildConfig(analyzer="whitespace", payload_delimiter="|",
                      target_docs_per_segment=20)
    build_index([path], idx, cfg)
    seg = IndexSearcher(idx)

    def run(searcher):
        out = {}
        for func in ("min", "max", "sum", "average"):
            for inc in (False, True):
                td = searcher.search(
                    Q.PayloadScoreQuery("w3", func=func, include_span_score=inc), k=30)
                out[(func, inc)] = (list(map(int, td.doc_ids)),
                                    [float(x) for x in td.scores])
        return out

    want = run(seg)

    merge_index(idx, MergeConfig(n_shards=4))
    assert run(open_searcher(idx, prefer_merged=True)) == want

    # compaction (k-way segment merge) must carry the .pay stream too
    compact_index(idx, CompactionPolicy(min_segments_to_merge=2))
    assert run(IndexSearcher(idx)) == want


def test_payload_reclaim_filters_stream(tmp_path):
    from lucene_7_x_9_x_ray.stages.compact import reclaim_deletes
    from lucene_7_x_9_x_ray.state.livedocs import delete_docs

    docs = ["cat|2.0 cat|0.5", "cat|7.0", "cat|0.25 dog"]
    idx = _build(tmp_path, docs)
    delete_docs(idx, [1])  # drop the 7.0 payload doc
    reclaim_deletes(idx, force=True)
    s = IndexSearcher(idx)
    d, f, pos, pays = s.readers[0].term_positions_payloads("cat")
    assert list(d) == [0, 1] and list(f) == [2, 1]
    assert [float(x) for x in pays] == [2.0, 0.5, 0.25]
    td = s.search(Q.PayloadScoreQuery("cat", func="max", include_span_score=False), k=10)
    assert {int(d): float(x) for d, x in zip(td.doc_ids, td.scores)} == {0: 2.0, 1: 0.25}


def test_payload_append_config_guard(tmp_path):
    from lucene_7_x_9_x_ray.stages.build import append_index

    docs = ["cat|2.0 dog"]
    idx = _build(tmp_path, docs)
    path2 = str(tmp_path / "more.parquet")
    pq.write_table(_pages_table(["cat dog"]), path2)
    with pytest.raises(ValueError, match="payload_delimiter"):
        append_index([path2], idx, BuildConfig(analyzer="whitespace"))
    # matching config appends fine and payloads stay queryable
    append_index([path2], idx, BuildConfig(analyzer="whitespace", payload_delimiter="|"))
    s = IndexSearcher(idx)
    td = s.search(Q.PayloadScoreQuery("cat", func="max", include_span_score=False), k=10)
    assert {int(d): float(x) for d, x in zip(td.doc_ids, td.scores)} == {0: 2.0, 1: 1.0}


def test_payload_build_with_empty_texts(tmp_path):
    """A chunk of empty/whitespace-only docs must not crash the payload
    splitter (pandas str.partition on an empty Series has no columns)."""
    docs = ["", "cat|1.5 dog", ""]
    idx = _build(tmp_path, docs)
    s = IndexSearcher(idx)
    td = s.search(Q.PayloadScoreQuery("cat", func="max", include_span_score=False), k=5)
    assert {int(d): float(x) for d, x in zip(td.doc_ids, td.scores)} == {1: 1.5}


def test_payload_flags_survive_empty_merged_shards(ray_session, tmp_path):
    """An empty merge group writes a shard without pos/pay columns; the
    merged searcher's has_payloads/has_positions must probe past it (any
    shard, not the first)."""
    from lucene_7_x_9_x_ray.search.merged import open_searcher
    from lucene_7_x_9_x_ray.stages.build import build_index
    from lucene_7_x_9_x_ray.stages.merge import MergeConfig, merge_index

    # 2-term vocab + 8 shards -> most term-range shards are empty
    docs = ["cat|2.0 dog", "dog|3.0 cat", "cat|0.5 dog cat"] * 10
    path = str(tmp_path / "pages.parquet")
    pq.write_table(_pages_table(docs), path, row_group_size=10)
    idx = str(tmp_path / "idx")
    build_index([path], idx, BuildConfig(
        analyzer="whitespace", payload_delimiter="|", target_docs_per_segment=10))
    merge_index(idx, MergeConfig(n_shards=8))
    mer = open_searcher(idx, prefer_merged=True)
    assert mer.readers[0].has_payloads and mer.readers[0].has_positions
    td = mer.search(Q.PayloadScoreQuery("cat", func="max", include_span_score=False), k=40)
    assert len(td.doc_ids) == 30


def test_payload_gate_oracle_parity(ray_session):
    """payload_topk gate == its DuckDB oracle on the driver corpus."""
    import duckdb as _dd

    from lucene_7_x_9_x_ray.pipelines import flagship, oracles

    sf = "/root/testdata/sf0.001"
    got = flagship.q_payload_topk(sf)
    con = _dd.connect()
    con.sql(f"create view documents as select * from '{sf}/documents.parquet'")
    want = con.sql(oracles.payload_topk_sql(flagship.PAYLOAD_TOPK_SPECS)).arrow()
    key = [("query_id", "ascending"), ("rank", "ascending")]
    assert got.sort_by(key).equals(want.cast(got.schema).sort_by(key))
    assert got.num_rows > 0
