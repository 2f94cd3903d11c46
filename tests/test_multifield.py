"""Multi-field indexing: per-field postings/norms/stats (FieldInfos-style
schema — s84 index/FieldInfos.java, document/FieldType.java:32) with
field-scoped BM25, duelled against DuckDB float32 oracles."""

import duckdb
import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_7_x_9_x_ray.search import queries as Q
from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
from lucene_7_x_9_x_ray.sources.pages import TITLE_TOKENS, generate_pages, write_pages_parquet
from lucene_7_x_9_x_ray.stages.build import BuildConfig, FieldSpec, build_index


@pytest.fixture(scope="module")
def mf_index(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mf")
    pages = generate_pages(400, vocab_size=60, mean_tokens=25, seed=52, dup_url_frac=0)
    path = str(tmp / "pages.parquet")
    write_pages_parquet(pages, path, rows_per_row_group=100)
    idx = str(tmp / "idx")
    build_index(
        [path], idx,
        BuildConfig(
            target_docs_per_segment=100,
            extra_fields=(FieldSpec("title", "title", index_positions=True),),
        ),
    )
    return idx, path


def _oracle(path: str, sql: str):
    con = duckdb.connect()
    df = pq.read_table(path, columns=["text"]).to_pandas()
    df["doc_id"] = np.arange(len(df))
    con.register("documents", df)
    return con.sql(sql).df()


def test_field_stats_recorded(mf_index):
    idx, path = mf_index
    s = IndexSearcher(idx)
    fs = s.manifest.field_stats
    assert "title" in fs
    texts = pq.read_table(path, columns=["text"])["text"].to_pylist()
    exp_sttf = sum(min(TITLE_TOKENS, len(t.split())) for t in texts)
    assert fs["title"]["sum_total_term_freq"] == exp_sttf
    assert fs["title"]["doc_count"] == 400
    # per-segment field artifacts exist
    for r in s.readers:
        assert "title" in r.stats.field_stats
        fv = r.field_view("title")
        assert fv.norms.shape == (r.doc_count,)
        assert fv.has_positions


def test_field_query_matches_duckdb_oracle(mf_index):
    """Title/body/cross-field/dismax BM25 — bit-identical to the float32
    DuckDB oracle with per-field df/docCount/avgdl."""
    from lucene_7_x_9_x_ray.pipelines.oracles import field_topk_sql

    idx, path = mf_index
    s = IndexSearcher(idx)
    specs = [
        ("a_title_only", "sum", [("title", "t00001", 1.0)], 15),
        ("b_cross", "sum", [("title", "t00003", 2.0), ("", "t00003", 1.0)], 15),
        ("c_dismax", "dismax", [("title", "t00000", 1.0), ("", "t00002", 1.0)], 15),
    ]
    want = _oracle(path, field_topk_sql(specs))
    from lucene_7_x_9_x_ray.functions.rounding import round_half_away

    for qid, kind, clauses, k in specs:
        leaves = [Q.TermQuery(t, boost=b, field=f) for f, t, b in clauses]
        if kind == "sum":
            query = Q.BooleanQuery.build([(Q.SHOULD, q) for q in leaves])
        else:
            query = Q.DisjunctionMaxQuery(queries=tuple(leaves), tie_breaker=0.3)
        td = s.search(query, k=k, total_hits_threshold=1 << 30)
        w = want[want.query_id == qid].sort_values("rank")
        assert list(w.doc_id) == [int(d) for d in td.doc_ids], qid
        got_r = [round_half_away(float(x), 4) for x in td.scores]
        assert list(w.score_r) == got_r, qid


def test_title_field_scoped_postings(mf_index):
    """A term's title-field postings only cover docs where it appears in the
    first TITLE_TOKENS tokens; count() agrees with a brute-force scan."""
    idx, path = mf_index
    s = IndexSearcher(idx)
    texts = pq.read_table(path, columns=["text"])["text"].to_pylist()
    term = "t00000"
    exp = sum(1 for t in texts if term in t.split()[:TITLE_TOKENS])
    assert s.count(Q.TermQuery(term, field="title")) == exp
    assert s.count(Q.TermQuery(term)) == sum(1 for t in texts if term in t.split())


def test_title_phrase_positions(mf_index):
    """PhraseQuery on the title field uses the field's own positions."""
    idx, path = mf_index
    s = IndexSearcher(idx)
    texts = pq.read_table(path, columns=["text"])["text"].to_pylist()
    toks0 = texts[0].split()[:2]
    td = s.search(
        Q.PhraseQuery(terms=tuple(toks0), field="title"), k=400,
        total_hits_threshold=1 << 30,
    )
    exp = {
        i
        for i, t in enumerate(texts)
        if any(
            t.split()[: TITLE_TOKENS][j : j + 2] == toks0
            for j in range(TITLE_TOKENS)
        )
    }
    assert set(int(d) for d in td.doc_ids) == exp and 0 in exp


def test_unknown_field_raises(mf_index):
    idx, _ = mf_index
    s = IndexSearcher(idx)
    with pytest.raises(ValueError, match="no indexed field"):
        s.search(Q.TermQuery("t00000", field="nope"), k=5)


def test_compaction_carries_fields(mf_index, tmp_path):
    """Tiered compaction merges every field's artifacts; field queries are
    unchanged after segments collapse."""
    import shutil

    from lucene_7_x_9_x_ray.stages.compact import CompactionPolicy, compact_index

    idx, path = mf_index
    idx2 = str(tmp_path / "idx2")
    shutil.copytree(idx, idx2)
    s0 = IndexSearcher(idx2)
    probes = [
        Q.TermQuery("t00001", field="title"),
        Q.BooleanQuery.build(
            [(Q.SHOULD, Q.TermQuery("t00003", boost=2.0, field="title")),
             (Q.SHOULD, Q.TermQuery("t00003"))]
        ),
        Q.PhraseQuery(terms=("t00000", "t00001"), field="title"),
    ]
    before = [s0.search(q, k=50, total_hits_threshold=1 << 30) for q in probes]

    m = compact_index(idx2, CompactionPolicy(max_merge_at_once=4))
    assert len(m.segments) == 1
    assert m.segments[0]["field_stats"]["title"]["doc_count"] == 400
    s1 = IndexSearcher(idx2)
    for q, td0 in zip(probes, before):
        td1 = s1.search(q, k=50, total_hits_threshold=1 << 30)
        assert list(td0.doc_ids) == list(td1.doc_ids)
        assert np.array_equal(td0.scores, td1.scores)


def test_merged_index_serves_field_queries(mf_index, tmp_path):
    """The term-sharded merge now carries every field: field queries on the
    merged searcher score via the per-field shard sets and match the
    per-segment searcher exactly (incl. salted-hot and phrase paths)."""
    import shutil

    from lucene_7_x_9_x_ray.search.merged import MergedIndexSearcher, _MergedFieldView
    from lucene_7_x_9_x_ray.stages.merge import MergeConfig, merge_index

    idx, path = mf_index
    idx2 = str(tmp_path / "m")
    shutil.copytree(idx, idx2)
    merge_index(idx2, MergeConfig(n_shards=3, hot_df_threshold=150))

    seg = IndexSearcher(idx2)
    mrg = MergedIndexSearcher(idx2)
    # field queries must NOT be routed away: the merged reader owns them
    q_probe, delegate = mrg._route(Q.TermQuery("t00001", field="title"))
    assert delegate is None
    assert isinstance(mrg._merged.field_view("title"), _MergedFieldView)

    probes = [
        Q.TermQuery("t00001", field="title"),
        Q.BooleanQuery.build(
            [(Q.SHOULD, Q.TermQuery("t00003", boost=2.0, field="title")),
             (Q.SHOULD, Q.TermQuery("t00003"))]
        ),
        Q.PhraseQuery(terms=("t00000", "t00001"), field="title"),
        Q.SynonymQuery(terms=("t00000", "t00002"), field="title"),
    ]
    for q in probes:
        ts = seg.search(q, k=60, total_hits_threshold=1 << 30)
        tm = mrg.search(q, k=60, total_hits_threshold=1 << 30)
        assert list(ts.doc_ids) == list(tm.doc_ids), q
        assert np.array_equal(ts.scores, tm.scores), q
        assert seg.count(q) == mrg.count(q)

    # checkindex validates field artifacts + merged field shard stats
    from lucene_7_x_9_x_ray.state.checkindex import check_index

    out = check_index(idx2, sample_every=7)
    assert out["merged"]["f_title_terms"] > 0
