"""misc-module analogues: HighFreqTerms and DocValuesStats
(s84 misc/src/java/org/apache/lucene/misc/)."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_7_x_9_x_ray.search.misc import doc_values_stats, high_freq_terms
from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index_local
from lucene_7_x_9_x_ray.state.livedocs import delete_docs


def _build(tmp_path, texts, hints=None, segment_size=None):
    n = len(texts)
    cols = {
        "url": [f"u{i}" for i in range(n)],
        "warc_ts": pa.array(range(n), pa.timestamp("us")),
        "text": texts,
        "lang": ["en"] * n,
    }
    store = ()
    if hints is not None:
        cols["hint"] = pa.array(hints, pa.float64())
        store = ("hint",)
    path = str(tmp_path / "p.parquet")
    pq.write_table(pa.table(cols), path)
    idx = str(tmp_path / "i")
    build_index_local(
        [path], idx,
        BuildConfig(target_docs_per_segment=segment_size or max(2, n // 3),
                    store_cols=store),
    )
    return idx


def test_high_freq_terms_orders_and_folds_segments(tmp_path):
    """Top-N by df and by ttf match brute-force counts; per-segment
    dictionary entries fold into one stat per term; ties break by term."""
    rng = np.random.default_rng(3)
    vocab = [f"w{i:02d}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 40)))
        for _ in range(120)
    ]
    idx = _build(tmp_path, texts)  # multiple segments
    s = IndexSearcher(idx)

    df = Counter()
    ttf = Counter()
    for t in texts:
        toks = t.split()
        ttf.update(toks)
        df.update(set(toks))

    got_df = high_freq_terms(s, 8, "df")
    want_df = sorted(df, key=lambda t: (-df[t], t))[:8]
    assert [t for t, _, _ in got_df] == want_df
    assert all(d == df[t] and f == ttf[t] for t, d, f in got_df)

    got_ttf = high_freq_terms(s, 8, "ttf")
    want_ttf = sorted(ttf, key=lambda t: (-ttf[t], t))[:8]
    assert [t for t, _, _ in got_ttf] == want_ttf


def test_doc_values_stats_missing_and_deletes(tmp_path):
    """count/missing/min/max/mean/variance over present values of LIVE
    docs; population moments; deletes drop rows from the stats."""
    n = 60
    hints = [None if i % 4 == 0 else float(i * 3 % 17) for i in range(n)]
    idx = _build(tmp_path, ["doc text here"] * n, hints=hints)
    s = IndexSearcher(idx)

    present = np.array([h for h in hints if h is not None])
    st = doc_values_stats(s, "hint")
    assert st["count"] == len(present)
    assert st["missing"] == n - len(present)
    assert st["min"] == present.min() and st["max"] == present.max()
    assert abs(st["mean"] - present.mean()) < 1e-12
    assert abs(st["variance"] - present.var()) < 1e-12
    assert abs(st["stdev"] - np.sqrt(present.var())) < 1e-12

    # delete the first 10 docs: stats recompute over live rows only
    delete_docs(idx, list(range(10)))
    s2 = IndexSearcher(idx)
    live = [h for i, h in enumerate(hints) if i >= 10]
    present2 = np.array([h for h in live if h is not None])
    st2 = doc_values_stats(s2, "hint")
    assert st2["count"] == len(present2)
    assert st2["missing"] == len(live) - len(present2)
    assert abs(st2["mean"] - present2.mean()) < 1e-12


def test_sweetspot_similarity_plateau_and_baseline_tf():
    """SweetSpotSimilarity (misc/SweetSpotSimilarity.java): lengthNorm is
    flat 1.0 inside [min,max] and decays outside; baselineTf floors small
    freqs at tf_base; registry spec round-trips parameters."""
    from lucene_7_x_9_x_ray.functions.bm25 import get_similarity
    from lucene_7_x_9_x_ray.functions.smallfloat import BYTE4_DECODE_TABLE

    sim = get_similarity("sweetspot(min=30,max=60,steepness=0.5,tf_base=1.5,tf_min=2)")
    nt = sim._norm_table
    # norm byte for a length inside the plateau scores exactly 1.0
    inside = np.flatnonzero((BYTE4_DECODE_TABLE >= 30) & (BYTE4_DECODE_TABLE <= 60))
    assert np.all(nt[inside] == np.float32(1.0))
    # outside the plateau the norm strictly decays with distance
    l20 = int(np.flatnonzero(BYTE4_DECODE_TABLE == 20)[0])
    l10 = int(np.flatnonzero(BYTE4_DECODE_TABLE == 10)[0])
    assert nt[l10] < nt[l20] < 1.0
    # lengthNorm closed form at len=20: 1/sqrt(0.5*((10+40)-30)+1)
    assert nt[l20] == np.float32(1.0 / np.sqrt(0.5 * 20 + 1.0))

    w = sim.term_weight(doc_freq=10, doc_count=100, sum_total_term_freq=1000)
    b = int(np.flatnonzero(BYTE4_DECODE_TABLE == 40)[0])  # plateau norm = 1
    # freq <= tf_min -> tf_base * idf
    assert w.score_scalar(2, b) == float(np.float32(1.5) * w.query_weight)
    # freq > tf_min -> sqrt(freq + base^2 - min) * idf
    import math
    assert w.score_scalar(9, b) == float(
        np.float32(np.float32(math.sqrt(9 + 2.25 - 2)) * w.query_weight)
    )
    # zero freq scores zero
    assert w.score_scalar(0, b) == 0.0


def test_expression_sort_topn_ties_and_missing(tmp_path):
    """ExpressionSortField analogue: missing doc values bind 0; equal
    expression values tie-break by ascending docID even across the
    per-segment partial cut."""
    from lucene_7_x_9_x_ray.search.sortedfield import expression_sort_topn

    n = 40
    # hint: same value for many docs -> heavy ties; every 5th missing
    hints = [None if i % 5 == 0 else float((i % 3) * 10) for i in range(n)]
    idx = _build(tmp_path, ["x y z"] * n, hints=hints, segment_size=7)
    s = IndexSearcher(idx)
    got = expression_sort_topn(s, "hint + 1.0", 10, descending=True)
    vals = [(0.0 if h is None else h) + 1.0 for h in hints]
    want = sorted(range(n), key=lambda i: (-vals[i], i))[:10]
    assert [d for _, d in got] == want
    assert [v for v, _ in got] == [vals[i] for i in want]
