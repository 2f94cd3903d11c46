"""Analyzers: text -> token stream, vectorized over Arrow batches.

Behavioral reference (re-implemented from scratch, not ported):
- StandardTokenizer: UAX#29 word-break tokenization with token types
  ALPHANUM/NUM/IDEOGRAPHIC/HIRAGANA/KATAKANA/HANGUL and
  maxTokenLength=255 (longer runs are split), solr-8.4.0/lucene/core/src/
  java/org/apache/lucene/analysis/standard/StandardTokenizer.java:57-179.
- StandardAnalyzer chain = tokenizer -> LowerCaseFilter -> StopFilter with a
  default EMPTY stop set (StandardAnalyzer.java:56-58,91-100).
- Classic 33-word English stop list from
  analysis/common/.../en/EnglishAnalyzer.java:48-56.

Our tokenizer approximates UAX#29 with a compiled regex:
- Han ideographs and Hiragana emit ONE token per character; Katakana and
  Hangul emit runs (matches StandardTokenizer's emitted token texts).
- Word tokens are runs of Unicode word characters (letters, digits, marks,
  underscore=ExtendNumLet) joined by single mid-token connectors:
  apostrophe/'/:/middle-dot between letters (MidLetter), '.' between
  alphanumerics (MidNumLet), ',' between digits (MidNum).
Documented deviations from full UAX#29: regional-indicator/emoji sequences
are not tokenized (dropped), and connector rules check only the right-hand
neighbor. Conformance vectors live in tests/test_analysis.py.

Batch API: tokenize a whole Arrow batch in one regex pass over a
sentinel-joined string; per-token doc assignment via searchsorted — no
Python loop over tokens in the hot path.
"""

from __future__ import annotations

import re
from typing import Iterable, Sequence

import numpy as np

__all__ = [
    "Analyzer",
    "StandardAnalyzer",
    "SimpleAnalyzer",
    "get_analyzer",
    "ENGLISH_STOP_WORDS",
    "MAX_TOKEN_LENGTH",
]

MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.DEFAULT_MAX_TOKEN_LENGTH

# Classic English stop set (EnglishAnalyzer.java:48-56). StandardAnalyzer's
# default stop set is EMPTY — this list is opt-in, as in the reference.
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

# --- script ranges (Han / Hiragana / Katakana / Hangul) --------------------
_HAN = (
    "⺀-⻿々〇〡-〩〸-〻"
    "㐀-䶿一-鿿豈-﫿"
)
_HIRA = "ぁ-ゖゝ-ゟ"
_KATA = "ァ-ヺー-ヿㇰ-ㇿｦ-ﾝ"
_HANGUL = "ᄀ-ᇿ㄰-㆏ꥠ-꥿가-퟿"
_CJK_ALL = _HAN + _HIRA + _KATA + _HANGUL

# Combining marks (UAX#29 Extend) — Python's \w excludes category Mn, so
# tokens like "i̇stanbul" (lowercased İstanbul) would otherwise split.
_MARKS = "̀-ͯ᪰-᫿᷀-᷿⃐-⃿︠-︯"
# Word char = unicode \w (plus combining marks) minus the CJK ranges.
_W = rf"(?:(?![{_CJK_ALL}])[\w{_MARKS}])"
_WL = rf"(?:(?![{_CJK_ALL}])[^\W\d_])"  # letter-ish (no digit/underscore)
_D = r"\d"
# Mid-token connectors (right-neighbor checked): MidLetter ' ’ : · before a
# letter, MidNumLet . before alnum, MidNum , before a digit.
_CONN = rf"(?:['’:·״](?={_WL})|\.(?={_W})|,(?={_D}))"
_WORD_RUN = rf"{_W}+(?:{_CONN}{_W}+)*"

_STANDARD_PATTERN = re.compile(
    rf"[{_HAN}]|[{_HIRA}]|[{_KATA}]+|[{_HANGUL}]+|{_WORD_RUN}",
    re.UNICODE,
)

# Pure-ASCII fast path. MUST tokenize identically to _STANDARD_PATTERN on
# ASCII input (same connector lookaheads, ASCII classes) — tokenization may
# not depend on which documents share a batch; equivalence is property-
# tested in tests/test_analysis.py::test_ascii_fast_path_equivalence.
_ASCII_WORD = re.compile(
    r"[A-Za-z0-9_]+(?:(?:[':](?=[A-Za-z])|\.(?=[A-Za-z0-9_])|,(?=[0-9]))[A-Za-z0-9_]+)*"
)

# SimpleAnalyzer: lowercase alnum runs — exactly replicable in DuckDB SQL as
# unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) for oracle parity.
_SIMPLE_PATTERN = re.compile(r"[a-z0-9]+")

_SENTINEL = "\x1f"  # unit separator: not a word char, survives lower()


class Analyzer:
    """text column -> (tokens, doc_idx) arrays. Subclasses set pattern/stop."""

    name = "base"

    def __init__(self, stopwords: Iterable[str] | None = None):
        self.stopwords = frozenset(stopwords) if stopwords else frozenset()
        self._stop_arr = (
            np.array(sorted(self.stopwords), dtype=object) if self.stopwords else None
        )

    # -- single string (query side / tests) --------------------------------
    def tokens(self, text: str) -> list[str]:
        toks, _ = self.tokenize_batch([text])
        return list(toks)

    # -- batch (index side) -------------------------------------------------
    def _findall(self, text: str) -> list[str]:
        raise NotImplementedError

    def tokenize_batch(
        self, texts: Sequence[str]
    ) -> tuple[np.ndarray, np.ndarray]:
        """Tokenize a batch of strings.

        Returns (tokens: object ndarray, doc_idx: int64 ndarray) where
        doc_idx[i] is the row of texts that produced tokens[i]. Tokens are
        emitted in document order then position order (deterministic; the
        ASCII fast path is chosen PER DOCUMENT, so a doc's tokens never
        depend on its batch neighbors). The Python loop is per document —
        token extraction is one C-level findall per doc.
        """
        n = len(texts)
        if n == 0:
            return np.empty(0, dtype=object), np.empty(0, dtype=np.int64)
        per_doc = [
            self._findall(("" if t is None else str(t)).lower()) for t in texts
        ]
        counts = np.fromiter(map(len, per_doc), dtype=np.int64, count=n)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        flat: list[str] = []
        for toks in per_doc:
            flat.extend(toks)
        tokens = np.array(flat, dtype=object)

        # maxTokenLength=255: overlong runs are split (rare; vectorized scan)
        if len(tokens):
            import pyarrow.compute as _pc
            import pyarrow as _pa

            lens = _pc.utf8_length(_pa.array(tokens, type=_pa.string())).to_numpy()
            if int(lens.max(initial=0)) > MAX_TOKEN_LENGTH:
                out_t: list[str] = []
                out_d: list[int] = []
                for tok, d in zip(tokens, doc_idx):
                    if len(tok) <= MAX_TOKEN_LENGTH:
                        out_t.append(tok)
                        out_d.append(int(d))
                    else:
                        for off in range(0, len(tok), MAX_TOKEN_LENGTH):
                            out_t.append(tok[off : off + MAX_TOKEN_LENGTH])
                            out_d.append(int(d))
                tokens = np.array(out_t, dtype=object)
                doc_idx = np.array(out_d, dtype=np.int64)

        tokens = self._map_pre_stop(tokens)
        if self._stop_arr is not None and len(tokens):
            # vectorized membership: binary-search the sorted stop array
            loc = np.searchsorted(self._stop_arr, tokens)
            loc = np.minimum(loc, len(self._stop_arr) - 1)
            is_stop = self._stop_arr[loc] == tokens
            keep = ~is_stop
            tokens, doc_idx = tokens[keep], doc_idx[keep]
        tokens = self._map_post_stop(tokens)
        return tokens, doc_idx

    # chain hooks: token-to-token maps applied before/after the stop filter
    # (the TokenFilter slots of the reference's analyzer chains)
    def _map_pre_stop(self, tokens: np.ndarray) -> np.ndarray:
        return tokens

    def _map_post_stop(self, tokens: np.ndarray) -> np.ndarray:
        return tokens

    def doc_token_counts(self, texts: Sequence[str]) -> np.ndarray:
        """Per-row token count (the BM25 doc-length statistic input)."""
        _, doc_idx = self.tokenize_batch(texts)
        return np.bincount(doc_idx, minlength=len(texts)).astype(np.int64)


class StandardAnalyzer(Analyzer):
    """StandardAnalyzer-equivalent: UAX#29-ish tokenize + lowercase + stop.

    Default stop set is EMPTY, matching the reference
    (StandardAnalyzer.java:56-58). Pass ``stopwords=ENGLISH_STOP_WORDS`` for
    the classic English list.
    """

    name = "standard"

    def _findall(self, text: str) -> list[str]:
        if text.isascii():
            return _ASCII_WORD.findall(text)
        return _STANDARD_PATTERN.findall(text)


class SimpleAnalyzer(Analyzer):
    """Lowercase [a-z0-9]+ runs — SQL-oracle-replicable tokenization."""

    name = "simple"

    def _findall(self, text: str) -> list[str]:
        return _SIMPLE_PATTERN.findall(text)


class EnglishAnalyzer(StandardAnalyzer):
    """EnglishAnalyzer-equivalent chain (s84 analysis/common/.../en/
    EnglishAnalyzer.java:108-117): StandardTokenizer -> possessive strip
    ('s removal, EnglishPossessiveFilter) -> LowerCase -> classic-33 stop
    set -> Porter stemmer. Stemming runs at VOCAB level: unique tokens are
    stemmed once and mapped back (vocab << token stream)."""

    name = "english"

    def __init__(self, stopwords: Iterable[str] | None = None):
        super().__init__(
            stopwords=ENGLISH_STOP_WORDS if stopwords is None else stopwords
        )

    def _map_pre_stop(self, tokens: np.ndarray) -> np.ndarray:
        if len(tokens) == 0:
            return tokens
        # EnglishPossessiveFilter: trailing 's (tokenizer keeps "john's"
        # as one token via the MidLetter apostrophe rule)
        out = tokens
        mask = np.array(
            [t.endswith("'s") or t.endswith("’s") for t in tokens], dtype=bool
        )
        if mask.any():
            out = tokens.copy()
            out[mask] = [t[:-2] for t in out[mask]]
        return out

    def _map_post_stop(self, tokens: np.ndarray) -> np.ndarray:
        if len(tokens) == 0:
            return tokens
        from .porter import porter_stem

        vocab, inv = np.unique(tokens, return_inverse=True)
        stemmed = np.array([porter_stem(v) for v in vocab], dtype=object)
        return stemmed[inv]


_REGISTRY = {
    "standard": StandardAnalyzer,
    "simple": SimpleAnalyzer,
    "english": EnglishAnalyzer,
}


def get_analyzer(name: str, stopwords: Iterable[str] | None = None) -> Analyzer:
    """Analyzer factory — the pluggable-analyzer hook (SURVEY.md §2.10)."""
    if name == "standard_en":
        return StandardAnalyzer(stopwords=ENGLISH_STOP_WORDS)
    try:
        cls = _REGISTRY[name]
    except KeyError:
        raise ValueError(f"unknown analyzer {name!r}; have {sorted(_REGISTRY)} + standard_en")
    return cls(stopwords=stopwords)
