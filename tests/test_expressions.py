"""Expression compiler conformance (the Lucene expressions-module surface).

Parser/evaluator vectors follow the JavascriptCompiler javadoc semantics
(s84 expressions/js/JavascriptCompiler.java): double-only arithmetic,
1.0/0.0 booleans with nonzero-is-true operands, ternary selection, the
DEFAULT_FUNCTIONS math table, and C-style precedence.
"""

import math

import numpy as np
import pytest

from lucene_7_x_9_x_ray.functions.expressions import (
    ExpressionError,
    compile_expression,
)


def ev(src, **bind):
    out = compile_expression(src).evaluate(bind)
    return float(out) if np.ndim(out) == 0 else out


def test_literals_and_precedence():
    assert ev("2 + 3 * 4") == 14.0
    assert ev("(2 + 3) * 4") == 20.0
    assert ev("2 - 3 - 4") == -5.0  # left assoc
    assert ev("12 / 4 / 3") == 1.0
    assert ev("7 % 3") == 1.0
    assert ev("-2 * 3") == -6.0
    assert ev("--2") == 2.0
    assert ev("1.5e2") == 150.0
    assert ev(".5 + 0.25") == 0.75


def test_boolean_semantics():
    # comparisons yield 1.0/0.0; operands true iff nonzero
    assert ev("3 > 2") == 1.0
    assert ev("2 > 3") == 0.0
    assert ev("2 >= 2 && 1 < 3") == 1.0
    assert ev("0 || 0.001") == 1.0
    assert ev("!0") == 1.0
    assert ev("!42") == 0.0
    assert ev("2 == 2") == 1.0
    assert ev("2 != 2") == 0.0
    # boolean results feed arithmetic as 1/0 doubles
    assert ev("(5 > 1) * 10 + (1 > 5)") == 10.0


def test_ternary():
    assert ev("1 ? 10 : 20") == 10.0
    assert ev("0 ? 10 : 20") == 20.0
    # right-associative nesting: a ? b : c ? d : e == a ? b : (c ? d : e)
    assert ev("0 ? 1 : 0 ? 2 : 3") == 3.0
    assert ev("x > 2 ? x : -x", x=5.0) == 5.0


def test_function_table():
    assert ev("ln(exp(1))") == pytest.approx(1.0)
    assert ev("log10(1000)") == pytest.approx(3.0)
    assert ev("logn(2, 8)") == pytest.approx(3.0)
    assert ev("sqrt(pow(3, 2))") == pytest.approx(3.0)
    assert ev("max(2, min(9, 5))") == 5.0
    assert ev("abs(-4.5)") == 4.5
    assert ev("floor(2.7) + ceil(2.2)") == 5.0
    assert ev("atan2(0, 1)") == 0.0
    assert ev("cos(0) + sin(0) + tan(0)") == 1.0
    # haversin: same point -> 0; 1 deg of latitude ~ 111.2 km
    assert ev("haversin(48.0, 2.0, 48.0, 2.0)") == 0.0
    assert ev("haversin(48.0, 2.0, 49.0, 2.0)") == pytest.approx(111_195, rel=0.01)


def test_vectorized_over_arrays():
    score = np.array([0.5, 1.5, 3.0])
    length = np.array([10.0, 64.0, 200.0])
    out = compile_expression(
        "0.3*_score + ln(1 + length)*(_score > 1 ? 1.5 : 1.0)"
        " + sqrt(min(length, 64))/8"
    ).evaluate({"_score": score, "length": length})
    exp = 0.3 * score + np.log1p(length) * np.where(score > 1, 1.5, 1.0) + np.sqrt(
        np.minimum(length, 64)
    ) / 8
    assert out.dtype == np.float64
    np.testing.assert_allclose(out, exp, rtol=0, atol=0)


def test_variables_and_errors():
    e = compile_expression("a * b + ln(c)")
    assert e.variables == {"a", "b", "c"}
    with pytest.raises(ExpressionError):
        ev("a + 1")  # unbound
    with pytest.raises(ExpressionError):
        compile_expression("2 +")
    with pytest.raises(ExpressionError):
        compile_expression("nosuchfn(1)")
    with pytest.raises(ExpressionError):
        compile_expression("min(1)")  # arity
    with pytest.raises(ExpressionError):
        compile_expression("2 @ 3")
    with pytest.raises(ExpressionError):
        compile_expression("(1 + 2")


def test_expression_score_query_matches_manual(ray_session, tmp_path):
    """ExpressionScoreQuery end-to-end: identity expression == inner query;
    a length-based expression matches a hand-computed rescoring of the
    exhaustive results; the serving pool returns the identical ranking."""
    from lucene_7_x_9_x_ray.search import queries as Q
    from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
    from lucene_7_x_9_x_ray.sources.pages import generate_pages, write_pages_parquet
    from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index
    from lucene_7_x_9_x_ray.stages.serve import ServingPool

    pages = generate_pages(300, vocab_size=80, mean_tokens=30, seed=7)
    path = str(tmp_path / "pages.parquet")
    write_pages_parquet(pages, path, rows_per_row_group=100)
    idx = str(tmp_path / "idx")
    build_index([path], idx, BuildConfig(target_docs_per_segment=100))
    s = IndexSearcher(idx)

    inner = Q.BooleanQuery.build(
        [(Q.SHOULD, Q.TermQuery("t00000")), (Q.SHOULD, Q.TermQuery("t00003"))]
    )
    base = s.search(inner, k=300, total_hits_threshold=1 << 30)

    ident = s.search(Q.ExpressionScoreQuery(inner, "_score"), k=300,
                     total_hits_threshold=1 << 30)
    assert list(ident.doc_ids) == list(base.doc_ids)
    assert np.array_equal(ident.scores, base.scores)

    expr = "_score * ln(2 + length) + (length > 25 ? 0.5 : 0)"
    got = s.search(Q.ExpressionScoreQuery(inner, expr), k=20)
    # manual rescoring of the SAME candidate set
    lengths = np.concatenate(
        [r.doc_values("length") for r in s.readers]
    ).astype(np.float64)[np.asarray(base.doc_ids)]
    manual = (
        base.scores.astype(np.float64) * np.log(2 + lengths)
        + np.where(lengths > 25, 0.5, 0.0)
    ).astype(np.float32)
    order = np.lexsort((np.asarray(base.doc_ids), -manual))[:20]
    assert list(got.doc_ids) == [int(base.doc_ids[i]) for i in order]
    np.testing.assert_array_equal(got.scores, manual[order])

    pool = ServingPool(idx, n_shards=2)
    td = pool.search_query(Q.ExpressionScoreQuery(inner, expr), k=20)
    assert list(td.doc_ids) == list(got.doc_ids)
    assert np.array_equal(td.scores, got.scores)
    pool.shutdown()
