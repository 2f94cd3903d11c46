"""Monitor-module tests: presearcher term extraction (QueryAnalyzer /
TermFilteredPresearcher roles), the candidate-superset invariant, pruning
effectiveness, and the percolate gate vs its SQL oracle at sf0.001.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa

from lucene_7_x_9_x_ray.functions.analysis import get_analyzer
from lucene_7_x_9_x_ray.pipelines import monitor
from lucene_7_x_9_x_ray.pipelines import oracles as O
from lucene_7_x_9_x_ray.search import queries as Q

SF = "/root/testdata/sf0.001"
AN = get_analyzer("standard")


def _extract(qs: str):
    return monitor.extract_presearch_terms(Q.parse_classic(qs, AN))


def test_presearcher_extraction_shapes():
    # plain term
    assert _extract("hash") == [("", "hash")]
    # conjunction: ONE most-selective child indexed (longest term wins)
    assert _extract("key AND stream") == [("", "stream")]
    # disjunction: every branch indexed
    assert sorted(_extract("window OR key")) == [("", "key"), ("", "window")]
    # phrase: conjunction of its terms -> best single term
    assert _extract('"key window"') == [("", "window")]
    # field scoping flows through
    assert _extract("title:key") == [("title", "key")]
    # multi-term queries cannot extract -> ANYTOKEN
    assert _extract("wind*") is None
    # a disjunction with an unextractable branch degrades to ANYTOKEN
    assert _extract("key OR wind*") is None
    # MUST gates; SHOULD-only score clauses don't affect extraction
    assert _extract("+key stream window") == [("", "key")]
    # conjunction with an ANYTOKEN child picks the extractable one
    assert _extract("wind* AND key") == [("", "key")]


def test_candidates_are_a_superset_of_matches(ray_session):
    """The presearcher must never prune a true match: every (doc, query)
    in the final result has the doc in the candidate set."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    batch = pq.read_table(f"{SF}/documents.parquet",
                          columns=["doc_id", "text"]).slice(0, 200)
    perc = monitor.Percolator()
    toks = pc.split_pattern(batch["text"], pattern=" ")
    cands = [set(perc.anytoken) for _ in range(batch.num_rows)]
    perc._accumulate(cands, "", toks)
    perc._accumulate(cands, "title",
                     pc.list_slice(toks, 0, monitor.TITLE_TOKENS))
    matches = perc(batch)
    by_doc = dict(zip(batch["doc_id"].to_pylist(), cands))
    for d, q in zip(matches["doc_id"].to_pylist(),
                    matches["query_id"].to_pylist()):
        assert q in by_doc[d], (d, q)


def test_presearcher_prunes_rare_queries():
    """On a corpus where the registered terms are rare, candidate volume
    (and therefore MemoryIndex work) collapses — the TermFilteredPresearcher
    point. Queries on 'zebra'/'yak' over docs that mostly lack them."""
    specs = (("q_z", "zebra"), ("q_y", "yak AND zebra"))
    perc = monitor.Percolator(specs=specs)
    texts = ["common words only"] * 98 + ["zebra here", "yak and zebra"]
    batch = pa.table(
        {"doc_id": pa.array(range(100), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    import pyarrow.compute as pc

    toks = pc.split_pattern(batch["text"], pattern=" ")
    cands = [set(perc.anytoken) for _ in range(100)]
    perc._accumulate(cands, "", toks)
    n_cand = sum(len(c) for c in cands)
    # q_y's conjunction indexes its most selective term 'zebra', so both
    # zebra docs are its candidates: 4 total, not 100 docs x 2 queries
    assert n_cand <= 4
    out = perc(batch)
    assert sorted(zip(out["doc_id"].to_pylist(),
                      out["query_id"].to_pylist())) == [
        (98, "q_z"), (99, "q_y"), (99, "q_z")
    ]


def test_percolate_gate_matches_oracle(ray_session):
    mine = monitor.q_percolate(SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = con.execute(O.percolate_sql()).df()
    key = ["doc_id", "query_id"]
    mine = mine.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert mine[key].equals(want[key])
