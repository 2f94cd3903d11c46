"""IndexWriter.addIndexes(Directory...) analogue: segment grafting."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_7_x_9_x_ray.search import queries as Q
from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
from lucene_7_x_9_x_ray.stages.build import (
    BuildConfig,
    add_indexes,
    build_index_local,
)
from lucene_7_x_9_x_ray.state.livedocs import delete_docs


def _build(tmp_path, name, texts, cfg=None):
    t = pa.table(
        {
            "url": [f"{name}-{i}" for i in range(len(texts))],
            "warc_ts": pa.array(range(len(texts)), pa.timestamp("us")),
            "text": texts,
            "lang": ["en"] * len(texts),
        }
    )
    path = str(tmp_path / f"{name}.parquet")
    pq.write_table(t, path)
    idx = str(tmp_path / f"idx_{name}")
    build_index_local([path], idx, cfg or BuildConfig(target_docs_per_segment=3))
    return idx


def _matches(idx, term):
    s = IndexSearcher(idx)
    td = s.search(Q.TermQuery(term), k=100, total_hits_threshold=1 << 30)
    return sorted(int(d) for d in td.doc_ids)


def test_add_indexes_grafts_segments_and_rebases(tmp_path):
    a = _build(tmp_path, "a", ["alpha one", "alpha two", "beta", "alpha three"])
    b = _build(tmp_path, "b", ["alpha b0", "gamma", "alpha b2"])
    c = _build(tmp_path, "c", ["alpha c0"])

    m = add_indexes(a, [b, c])
    assert m.doc_count == 8
    # docIDs: a keeps 0..3; b rebases to 4..6; c to 7
    assert _matches(a, "alpha") == [0, 1, 3, 4, 6, 7]
    assert _matches(a, "gamma") == [5]
    # scores equal a from-scratch build of the union (global stats
    # re-aggregated): verify avgdl inputs
    s = IndexSearcher(a)
    texts = ["alpha one", "alpha two", "beta", "alpha three",
             "alpha b0", "gamma", "alpha b2", "alpha c0"]
    assert s.manifest.sum_total_term_freq == sum(len(t.split()) for t in texts)


def test_add_indexes_carries_deletes_rebased(tmp_path):
    a = _build(tmp_path, "a", ["alpha one", "beta"])
    b = _build(tmp_path, "b", ["alpha b0", "alpha b1", "alpha b2"])
    delete_docs(b, [0, 2])  # kill b's first and third docs
    add_indexes(a, [b])
    # only b's middle doc (now id 3) survives among the grafted alphas
    assert _matches(a, "alpha") == [0, 3]


def test_add_indexes_refuses_config_mismatch(tmp_path):
    a = _build(tmp_path, "a", ["alpha"])
    w = _build(tmp_path, "w", ["Alpha"], cfg=BuildConfig(analyzer="whitespace"))
    with pytest.raises(ValueError, match="analyzer"):
        add_indexes(a, [w])
