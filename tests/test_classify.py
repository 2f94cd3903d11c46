"""Classification module tests: SimpleNaiveBayes + KNearestNeighbor
(s84 classification/src/java/org/apache/lucene/classification/) —
model-statistics parity vs DuckDB, vote-fold semantics, and the two
gates against their SQL oracles at sf0.001.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from lucene_7_x_9_x_ray.pipelines import classify
from lucene_7_x_9_x_ray.pipelines import oracles as O

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def nb_model(ray_session):
    texts = classify._input_texts(SF, classify.NB_INPUT_DOCS)
    vocab = set()
    for t in texts.values():
        vocab.update(t.split(" "))
    return classify.nb_model(SF, vocab), texts, vocab


def test_nb_model_statistics_match_sql(nb_model):
    """The one-pass distributed stats equal direct DuckDB aggregation:
    class doc counts, docsWithClass, sumDocFreq-derived avgUnique, and a
    spot-checked (class, word) hit count."""
    model, texts, vocab = nb_model
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    cls = dict(
        con.execute(
            "SELECT lang, count(*) FROM documents GROUP BY lang"
        ).fetchall()
    )
    assert model["cls"] == cls
    assert sum(model["cls"].values()) == con.execute(
        "SELECT count(*) FROM documents WHERE lang IS NOT NULL AND lang <> ''"
    ).fetchone()[0]
    sdf, docs = con.execute(
        """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS term
                        FROM documents)
           SELECT (SELECT count(*) FROM (SELECT DISTINCT doc_id, term FROM tok)),
                  (SELECT count(DISTINCT doc_id) FROM tok)"""
    ).fetchone()
    assert (model["sdf"], model["docs"]) == (sdf, docs)
    word = sorted(vocab)[len(vocab) // 2]
    for lang in cls:
        want = con.execute(
            """SELECT count(DISTINCT doc_id) FROM (
                 SELECT doc_id, unnest(string_split(text,' ')) AS term, lang
                 FROM documents) WHERE lang = ? AND term = ?""",
            [lang, word],
        ).fetchone()[0]
        assert model["hit"].get((lang, word), 0) == want


def test_nb_scores_are_a_distribution(nb_model):
    """normClassificationResults output: probabilities in (0,1], summing
    to 1, sorted descending (java:283-309)."""
    model, texts, _ = nb_model
    for d, t in texts.items():
        scored = classify.nb_scores(t.split(" "), model)
        probs = [p for _, p in scored]
        assert all(0.0 < p <= 1.0 for p in probs)
        assert math.isclose(sum(probs), 1.0, rel_tol=1e-9)
        assert probs == sorted(probs, reverse=True)
        assert len(scored) == len(model["cls"])


def test_knn_vote_fold_semantics():
    """buildListFromTopDocs: per-class (count * (boostSum/count)) / k and
    the sumdoc<k correction (java:192-238)."""
    # 10 hits, k=10: no correction
    scores = [10.0, 8.0, 8.0, 6.0, 4.0, 4.0, 3.0, 2.0, 2.0, 1.0]
    classes = ["en", "en", "de", "en", "fr", "de", "en", "fr", "en", "en"]
    out = dict((c, (n, s)) for c, n, s in classify.knn_vote(scores, classes, 10))
    b_en = (10 + 8 + 6 + 3 + 2 + 1) / 10.0
    assert out["en"][0] == 6
    assert math.isclose(out["en"][1], (6 * (b_en / 6)) / 10.0, rel_tol=1e-12)
    # 4 hits, k=10: every class score scales by k/sumdoc
    out4 = dict(
        (c, s) for c, _, s in classify.knn_vote([5.0, 4.0, 3.0, 2.0],
                                                ["en", "de", "en", "de"], 10)
    )
    b_en4 = 5.0 / 5.0 + 3.0 / 5.0
    expect = ((2 * (b_en4 / 2)) / 10.0) * 10 / 4.0
    assert math.isclose(out4["en"], expect, rel_tol=1e-12)
    # ordering: score desc, then class asc
    order = [c for c, _, _ in classify.knn_vote(scores, classes, 10)]
    assert order == ["en", "de", "fr"]


def _oracle(sql: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con.execute(sql).df()


def test_classify_nb_gate_matches_oracle(ray_session):
    mine = classify.q_classify_nb(SF).to_pandas()
    want = _oracle(O.classify_nb_sql(classify.NB_INPUT_DOCS))
    key = ["input_doc", "rank"]
    mine = mine.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert mine[["input_doc", "rank", "lang", "prob_r"]].equals(
        want[["input_doc", "rank", "lang", "prob_r"]]
    )


def test_classify_knn_gate_matches_oracle(ray_session):
    mine = classify.q_classify_knn(SF).to_pandas()
    want = _oracle(O.classify_knn_sql(classify.KNN_INPUT_DOCS, classify.KNN_K))
    key = ["input_doc", "lang"]
    mine = mine.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert mine[["input_doc", "lang", "cnt", "score_r"]].equals(
        want[["input_doc", "lang", "cnt", "score_r"]]
    )


def test_classify_bm25nb_gate_matches_oracle(ray_session):
    mine = classify.q_classify_bm25nb(SF).to_pandas()
    want = _oracle(O.classify_bm25nb_sql(classify.NB_INPUT_DOCS))
    key = ["input_doc", "rank"]
    mine = mine.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert mine[["input_doc", "rank", "lang", "prob_r"]].equals(
        want[["input_doc", "rank", "lang", "prob_r"]]
    )


def test_bm25nb_prior_is_class_term_score(ray_session):
    """The lang field scores like any indexed field: top-1 TermQuery(lang:c)
    score = the float32 single-token-field BM25 leaf (dl=1, tf=1,
    avgdl=1)."""
    import numpy as np

    from lucene_7_x_9_x_ray.pipelines.flagship import get_searchers
    from lucene_7_x_9_x_ray.search import queries as Q

    merged, _ = get_searchers(SF)
    con = duckdb.connect()
    n, dfc = con.execute(
        f"""SELECT (SELECT count(*) FROM read_parquet('{SF}/documents.parquet')
                    WHERE lang IS NOT NULL AND lang <> ''),
                   (SELECT count(*) FROM read_parquet('{SF}/documents.parquet')
                    WHERE lang = 'en')"""
    ).fetchone()
    td = merged.search(Q.TermQuery("en", field="lang"), k=1)
    w = np.float32(np.log(np.float64(1 + (n - dfc + 0.5) / (dfc + 0.5))))
    ninv = np.float32(1.0) / (
        np.float32(1.2) * ((np.float32(1.0) - np.float32(0.75))
                           + (np.float32(0.75) * np.float32(1.0)) / np.float32(1.0))
    )
    leaf = w - w / (np.float32(1.0) + np.float32(1.0) * ninv)
    assert np.float32(td.scores[0]) == leaf


def test_perceptron_learns_separable_corpus(ray_session, tmp_path):
    """BooleanPerceptronClassifier (java:82-217): on a linearly separable
    toy corpus (positive docs 'aaa', negative docs 'bbb') one online pass
    drives the negative term's weight to 0, flipping its class below the
    bias."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_7_x_9_x_ray.pipelines.classify import (
        perceptron_assign, perceptron_train)

    rows = []
    for i in range(10):
        rows.append((i, "bbb bbb bbb", "de"))
    for i in range(10, 20):
        rows.append((i, "aaa aaa aaa", "en"))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    weights, bias = perceptron_train(str(tmp_path), positive_lang="en")
    # bias = avg doc length = 3; ttf init aaa=bbb=30; ten -3 updates
    # zero out bbb (java:176 max(0, w + modifier*tf))
    assert bias == 3.0
    assert weights["bbb"] == 0.0
    assert weights["aaa"] == 30.0
    assert perceptron_assign("aaa aaa aaa", weights, bias)[0] is True
    assert perceptron_assign("bbb bbb bbb", weights, bias)[0] is False
    # score formula: 1 - exp(-|bias - output| / bias)
    import math

    _, s = perceptron_assign("bbb", weights, bias)
    assert s == 1.0 - math.exp(-abs(3.0 - 0.0) / 3.0)


def test_perceptron_gate_shape(ray_session):
    from lucene_7_x_9_x_ray.pipelines.classify import q_classify_perceptron

    t = q_classify_perceptron(SF)
    assert t.num_rows == len(classify.NB_INPUT_DOCS)
    assert t.column_names == ["input_doc", "assigned", "score_r"]


def test_classify_nb_corpus_matches_pointwise(ray_session):
    """Corpus-wide broadcast classification equals the pointwise
    nb_scores fold on sampled docs (the vectorized reduceat kernel must
    reproduce the sequential sum bit-for-bit)."""
    from lucene_7_x_9_x_ray.pipelines.classify import (
        nb_model, nb_scores, q_classify_nb_corpus)

    t = q_classify_nb_corpus(SF).to_pandas().set_index("doc_id")
    model = nb_model(SF, vocab=None)
    texts = classify._input_texts(SF, (0, 11, 99, 250, 499))
    for d, text in texts.items():
        lang, prob = nb_scores(text.split(" "), model)[0]
        assert t.loc[d, "lang"] == lang
        assert t.loc[d, "prob_r"] == round(prob, 6) or \
            abs(t.loc[d, "prob_r"] - prob) < 1e-6
