"""Common-Crawl-style page tables: deterministic synthesis + html->text.

Input shape (BASELINE.json input_hint / FIXTURES.md F1):
    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

Two deterministic sources, no external data:
- ``generate_pages``: seeded Zipf-vocabulary corpus (FIXTURES.md F2 "Zipf web
  corpus": 30k-word vocab, frequency ∝ 1/rank, log-normal doc lengths) —
  the benchmark-content-source equivalent of the reference's Reuters/enwiki
  feeds (s84 benchmark/.../feeds/ReutersContentSource.java).
- ``pages_from_documents``: wrap the driver's documents.parquet rows into
  the page shape (url/warc_ts/html derived from doc_id; text verbatim).

``extract_text`` is the deterministic HTML->text UDF (DemoHTMLParser.java:42-96
equivalent): body inner text, tags stripped. The per-row north-rule invariant
is that extraction reproduces the ``text`` column byte-identically — both
generators construct html so this holds, and the build stage can verify it.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

EPOCH_2025 = 1735689600_000000  # 2025-01-01T00:00:00Z in microseconds

_BODY_RE = re.compile(rb"<body(?:\s[^>]*)?>(.*)</body>", re.DOTALL | re.IGNORECASE)
_TITLE_RE = re.compile(rb"<title(?:\s[^>]*)?>(.*?)</title>", re.DOTALL | re.IGNORECASE)
_TAG_RE = re.compile(rb"<[^>]+>")

# tokens per synthesized title: both page generators emit title = the first
# TITLE_TOKENS tokens of the body text, making the title field's BM25 oracle
# SQL-expressible (list_slice(string_split(text,' '), 1, TITLE_TOKENS))
TITLE_TOKENS = 8


def extract_title(html: bytes) -> str:
    """Deterministic html -> title (the DemoHTMLParser.java:42-96 title
    extraction half); '' when no <title> element."""
    m = _TITLE_RE.search(html)
    return m.group(1).decode("utf-8", errors="replace") if m else ""


def extract_text(html: bytes) -> str:
    """Deterministic html -> text: body inner text with tags stripped.

    Byte-stable per input (north-rule invariant): same html bytes always
    produce the same text bytes.
    """
    m = _BODY_RE.search(html)
    content = m.group(1) if m else _TAG_RE.sub(b" ", html)
    content = _TAG_RE.sub(b" ", content)
    return content.decode("utf-8", errors="replace")


def wrap_html(text: str, title: str) -> bytes:
    """Inverse-friendly wrapper: extract_text(wrap_html(t, _)) == t."""
    return (
        b"<html><head><title>"
        + title.encode()
        + b"</title></head><body>"
        + text.encode()
        + b"</body></html>"
    )


def _zipf_probs(vocab_size: int) -> np.ndarray:
    p = 1.0 / np.arange(1, vocab_size + 1, dtype=np.float64)
    return p / p.sum()


def generate_pages(
    n_rows: int,
    seed: int = 42,
    vocab_size: int = 30_000,
    mean_tokens: float = 400.0,
    dup_url_frac: float = 0.01,
    with_html: bool = True,
) -> pa.Table:
    """Deterministic Zipf web-page corpus (FIXTURES.md F1/F2)."""
    rng = np.random.default_rng(seed)
    vocab = np.array([f"t{i:05d}" for i in range(vocab_size)], dtype=object)
    probs = _zipf_probs(vocab_size)

    # log-normal doc lengths centered near mean_tokens (web-page-like)
    sigma = 0.6
    mu = np.log(mean_tokens) - sigma * sigma / 2
    lengths = np.maximum(1, rng.lognormal(mu, sigma, size=n_rows).astype(np.int64))
    total = int(lengths.sum())
    all_tokens = rng.choice(vocab, size=total, p=probs)
    bounds = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lengths, out=bounds[1:])
    texts = [" ".join(all_tokens[bounds[i] : bounds[i + 1]]) for i in range(n_rows)]

    titles = [
        " ".join(all_tokens[bounds[i] : min(bounds[i] + TITLE_TOKENS, bounds[i + 1])])
        for i in range(n_rows)
    ]
    idx = np.arange(n_rows)
    urls = np.array([f"https://site{i % 211}.example/p/{i}" for i in idx], dtype=object)
    # a dup_url_frac slice of rows reuses the previous row's url with a later
    # warc_ts (exact-dedup-by-url fixtures)
    if dup_url_frac > 0 and n_rows > 1:
        n_dup = int(n_rows * dup_url_frac)
        dup_rows = rng.choice(np.arange(1, n_rows), size=n_dup, replace=False)
        for r in dup_rows:
            urls[r] = urls[r - 1]
    ts = EPOCH_2025 + idx * 1_000_000
    langs = np.where(idx % 20 == 19, "de", np.where(idx % 20 == 18, "zh", "en"))

    cols: dict = {
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array(ts, type=pa.timestamp("us")),
    }
    if with_html:
        cols["html"] = pa.array(
            [wrap_html(t, ti) for ti, t in zip(titles, texts)], type=pa.binary()
        )
    cols["text"] = pa.array(texts, type=pa.string())
    cols["lang"] = pa.array(langs, type=pa.string())
    cols["title"] = pa.array(titles, type=pa.string())
    return pa.table(cols)


# length buckets for the multi-valued tags column (must mirror the SQL
# CASE in oracles.facet_tags_sql / the bm25_tags_filtered WHERE clause)
TAG_LEN_EDGES = (30, 60)
TAG_LEN_LABELS = ("len_00_29", "len_30_59", "len_60_up")


def _tags_column(docs: pa.Table) -> pa.ListArray:
    """Multi-valued SORTED_SET doc-values fixture (s84
    Lucene80DocValuesFormat.java:133 SORTED_SET; SortedSetDocValuesField):
    per doc the sorted distinct set {lang, source, length-bucket label}
    as a list<string> column. The three namespaces are disjoint, so the
    set always has 3 values; per-row sorting matches the SORTED_SET
    ord-sorted storage order."""
    import pyarrow.compute as pc

    n = docs.num_rows
    lang = np.asarray(docs["lang"].to_pylist(), dtype=object)
    source = np.asarray(docs["source"].to_pylist(), dtype=object)
    dl = pc.list_value_length(pc.split_pattern(docs["text"], " ")).to_numpy()
    bucket = np.asarray(TAG_LEN_LABELS, dtype=object)[
        np.searchsorted(np.asarray(TAG_LEN_EDGES), dl, side="right")
    ]
    mat = np.sort(np.stack([lang, source, bucket], axis=1), axis=1)
    return pa.ListArray.from_arrays(
        pa.array(np.arange(0, 3 * n + 1, 3, dtype=np.int32)),
        pa.array(mat.reshape(-1), pa.string()),
    )


def pages_from_documents(sf_dir: str, with_html: bool = True, repeat: int = 1) -> pa.Table:
    """Deterministically wrap the driver's documents table into page shape.

    ``repeat`` > 1 tiles the corpus with distinct urls/doc ids (used to grow
    bench inputs without synthesizing new text). Vectorized with Arrow
    string kernels — no Python loop over rows.
    """
    import pyarrow.compute as pc

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "n_chars", "source"],
    )
    doc_ids = docs["doc_id"].to_numpy()
    n = len(doc_ids)

    # score_hint: a deliberately SPARSE per-doc value (NULL for every
    # doc_id divisible by 3) — the nullable doc-values fixture behind the
    # DocValuesFieldExistsQuery gate; its SQL mirror is an IS NOT NULL
    # predicate over the same CASE expression (oracles.field_exists_sql)
    score_hint = pa.array(
        np.where(doc_ids % 3 == 0, None, docs["n_chars"].to_numpy()), type=pa.int64()
    )

    # title = first TITLE_TOKENS body tokens (vectorized split/slice/join),
    # the SQL-expressible per-field fixture for multi-field BM25 oracles
    text_col = docs["text"].combine_chunks()
    titles = pc.binary_join(
        pc.list_slice(pc.split_pattern(text_col, " "), 0, TITLE_TOKENS), " "
    )

    parts = []
    for r in range(repeat):
        gids = doc_ids + r * n
        gid_str = pa.array(gids.astype("U"), type=pa.string())
        urls = pc.binary_join_element_wise("https://docs.example/d/", gid_str, "")
        ts = pa.array(EPOCH_2025 + gids * 1_000_000, type=pa.timestamp("us"))
        cols: dict = {"url": urls, "warc_ts": ts}
        if with_html:
            html_str = pc.binary_join_element_wise(
                "<html><head><title>",
                titles,
                "</title></head><body>",
                text_col,
                "</body></html>",
                "",
            )
            cols["html"] = html_str.cast(pa.binary())
        cols["text"] = docs["text"]
        cols["lang"] = docs["lang"]
        cols["title"] = titles
        cols["score_hint"] = score_hint
        # taxonomy facet path "source/lang" — the FacetField(dim, path...)
        # fixture behind FastTaxonomyFacetCounts rollup + DrillDownQuery
        cols["facet_path"] = pc.binary_join_element_wise(
            docs["source"], docs["lang"], "/"
        )
        cols["tags"] = _tags_column(docs)
        parts.append(pa.table(cols))
    return pa.concat_tables(parts)


def write_pages_parquet(
    table: pa.Table, path: str, rows_per_row_group: int = 4096
) -> str:
    pq.write_table(table, path, row_group_size=rows_per_row_group)
    return path
