"""Analyzer conformance vectors (FIXTURES.md F3, shape of
TestStandardAnalyzer — solr-8.4.0/lucene/core/src/test/.../standard/
TestStandardAnalyzer.java:41-330)."""

import numpy as np

from lucene_7_x_9_x_ray.functions.analysis import (
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    SimpleAnalyzer,
    StandardAnalyzer,
    get_analyzer,
)


STD = StandardAnalyzer()


def toks(text, an=STD):
    return an.tokens(text)


def test_ascii_words_and_lowercase():
    assert toks("Hello World FOO") == ["hello", "world", "foo"]


def test_numbers_kept():
    assert toks("B2B 2B sales 2000") == ["b2b", "2b", "sales", "2000"]


def test_apostrophe_midletter():
    assert toks("can't O'Neil's") == ["can't", "o'neil's"]


def test_decimal_number_one_token():
    assert toks("pi is 3.14 and 1,000 units") == ["pi", "is", "3.14", "and", "1,000", "units"]


def test_dotted_compound_stays_joined():
    # UAX#29 MidNumLet: letter.letter does not break
    assert toks("john.doe@example.com") == ["john.doe", "example.com"]


def test_punctuation_splits():
    assert toks("foo-bar, baz; (qux)!") == ["foo", "bar", "baz", "qux"]


def test_underscore_extendnumlet():
    assert toks("snake_case a_1") == ["snake_case", "a_1"]


def test_cjk_ideographs_one_token_each():
    assert toks("我是中国人") == ["我", "是", "中", "国", "人"]


def test_cjk_mixed_with_ascii():
    assert toks("Lucene是搜索engine") == ["lucene", "是", "搜", "索", "engine"]


def test_katakana_run_single_token():
    assert toks("トヨタ") == ["トヨタ"]


def test_hiragana_one_per_char():
    assert toks("これは") == ["こ", "れ", "は"]


def test_hangul_run():
    assert toks("안녕하세요 world") == ["안녕하세요", "world"]


def test_default_stopset_empty():
    # StandardAnalyzer default keeps "the" (StandardAnalyzer.java:56-58)
    assert toks("the quick brown") == ["the", "quick", "brown"]


def test_english_stop_filter():
    an = get_analyzer("standard_en")
    assert an.tokens("the quick brown fox is fast") == ["quick", "brown", "fox", "fast"]
    assert len(ENGLISH_STOP_WORDS) == 33


def test_max_token_length_split():
    long = "a" * 600
    out = toks(f"x {long} y")
    assert out == ["x", "a" * MAX_TOKEN_LENGTH, "a" * MAX_TOKEN_LENGTH, "a" * 90, "y"]


def test_empty_and_none_rows():
    tokens, doc_idx = STD.tokenize_batch(["", "one two", None, "three"])
    assert list(tokens) == ["one", "two", "three"]
    assert list(doc_idx) == [1, 1, 3]


def test_batch_doc_assignment():
    texts = ["alpha beta", "", "gamma", "delta epsilon zeta"]
    tokens, doc_idx = STD.tokenize_batch(texts)
    assert list(tokens) == ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    assert list(doc_idx) == [0, 0, 2, 3, 3, 3]
    counts = STD.doc_token_counts(texts)
    assert list(counts) == [2, 0, 1, 3]


def test_batch_matches_single_doc_tokenization():
    texts = ["Hello can't 3.14", "我是 engineer", "", "B2B-sales!"]
    tokens, doc_idx = STD.tokenize_batch(texts)
    for i, t in enumerate(texts):
        expect = STD.tokens(t)
        got = list(tokens[doc_idx == i])
        assert got == expect, (i, got, expect)


def test_non_ascii_lowercase_boundaries():
    # lowercasing can change string length (e.g. İ -> i̇) — doc assignment
    # must still be correct because boundaries are computed post-lower.
    texts = ["İstanbul CITY", "Ärger GROSS"]
    tokens, doc_idx = STD.tokenize_batch(texts)
    assert list(doc_idx) == [0, 0, 1, 1]
    assert list(tokens)[2] == "ärger"


def test_simple_analyzer_sql_parity():
    an = SimpleAnalyzer()
    assert an.tokens("Foo-BAR_baz 12x") == ["foo", "bar", "baz", "12x"]
    # cross-check with duckdb's regexp_extract_all on a sample
    import duckdb

    text = "The QUICK-brown fox_2 jumps 3.14 times!"
    sql = duckdb.sql(
        "select unnest(regexp_extract_all(lower($1), '[a-z0-9]+')) t", params=[text]
    ).fetchall()
    assert [r[0] for r in sql] == an.tokens(text)


def test_deterministic_token_order():
    tokens, doc_idx = STD.tokenize_batch(["b a c", "z y"])
    # order = document order then position order, not sorted
    assert list(tokens) == ["b", "a", "c", "z", "y"]
    assert np.all(np.diff(doc_idx) >= 0)


def test_ascii_fast_path_equivalence():
    """Tokenization must not depend on co-batched documents: the ASCII
    fast-path regex must tokenize identically to the Unicode pattern on
    any ASCII input (property-tested), and a doc's tokens must be the
    same whether or not a non-ASCII doc shares its batch."""
    import random
    import string

    from lucene_7_x_9_x_ray.functions.analysis import (
        _ASCII_WORD,
        _STANDARD_PATTERN,
        get_analyzer,
    )

    rng = random.Random(1234)
    alphabet = string.ascii_letters + string.digits + "_'.,:; -\t\"()"
    for _ in range(5000):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40))).lower()
        a = [m.group() for m in _ASCII_WORD.finditer(s)]
        b = [m.group() for m in _STANDARD_PATTERN.finditer(s)]
        assert a == b, s

    an = get_analyzer("standard")
    doc = "a._b x4.y don't 1,5 v1.2"
    alone, _ = an.tokenize_batch([doc])
    mixed, idx = an.tokenize_batch([doc, "café"])
    assert alone.tolist() == mixed[idx == 0].tolist()


def test_porter_stemmer_paper_vectors():
    """Porter (1980) algorithm: full-pipeline outputs for the paper's
    example words (per-step table entries composed through all steps)."""
    from lucene_7_x_9_x_ray.functions.porter import porter_stem

    pairs = {
        "caresses": "caress", "ponies": "poni", "ties": "ti",
        "caress": "caress", "cats": "cat", "feed": "feed", "agreed": "agre",
        "plastered": "plaster", "bled": "bled", "motoring": "motor",
        "sing": "sing", "conflated": "conflat", "troubled": "troubl",
        "sized": "size", "hopping": "hop", "tanned": "tan",
        "falling": "fall", "hissing": "hiss", "fizzed": "fizz",
        "failing": "fail", "filing": "file", "happy": "happi", "sky": "sky",
        "relational": "relat", "conditional": "condit", "rational": "ration",
        "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
        "conformabli": "conform", "radicalli": "radic",
        "differentli": "differ",  # full algorithm: step 2 then step 4 (-ent)
        "vileli": "vile", "analogousli": "analog",
        "vietnamization": "vietnam", "predication": "predic",
        "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
        "hopefulness": "hope", "callousness": "callous",
        "formaliti": "formal", "sensitiviti": "sensit",
        "sensibiliti": "sensibl", "triplicate": "triplic",
        "formative": "form", "formalize": "formal", "electriciti": "electr",
        "electrical": "electr", "hopeful": "hope", "goodness": "good",
        "revival": "reviv", "allowance": "allow", "inference": "infer",
        "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
        "replacement": "replac", "adjustment": "adjust",
        "dependent": "depend", "adoption": "adopt", "homologou": "homolog",
        "communism": "commun", "activate": "activ",
        "angulariti": "angular", "homologous": "homolog",
        "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
        "rate": "rate", "cease": "ceas", "controll": "control",
        "roll": "roll",
        # distributed-implementation departures (PorterStemFilter variant):
        # bli->ble (paper: abli->able only) and ogi->og
        "possibli": "possibl", "geologi": "geolog", "archaeologi": "archaeolog",
    }
    bad = {w: (porter_stem(w), e) for w, e in pairs.items() if porter_stem(w) != e}
    assert not bad, bad


def test_english_analyzer_chain():
    """EnglishAnalyzer chain: tokenize -> possessive strip -> stop (classic
    list) -> Porter stem; vocab-level stemming equals per-token stemming."""
    from lucene_7_x_9_x_ray.functions.analysis import get_analyzer
    from lucene_7_x_9_x_ray.functions.porter import porter_stem

    an = get_analyzer("english")
    # ("were" is not in the classic-33 stop list)
    assert an.tokens("The runner's shoes were running quickly") == [
        "runner", "shoe", "were", "run", "quickli",
    ]
    # "it's" -> possessive strip -> "it" -> stopped
    assert an.tokens("It's a test of the system") == ["test", "system"]
    toks, idx = an.tokenize_batch(["connecting connected connection", ""])
    assert list(toks) == ["connect", "connect", "connect"]
    assert list(idx) == [0, 0, 0]
    std = get_analyzer("standard")
    for t in std.tokens("relational engineering of analogously sized systems"):
        assert porter_stem(t) in an.tokens(t) or t in ("of",)


def test_english_analyzer_end_to_end(tmp_path):
    """Index built with analyzer='english' matches stemmed variants: a
    query for 'connect' finds docs containing 'connecting'/'connection',
    and parse() stems the query text with the same chain."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_7_x_9_x_ray.search import queries as Q
    from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
    from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index_local

    texts = [
        "connecting the cables",
        "a connection was made",
        "disconnected entirely",
        "nothing relevant here",
    ]
    t = pa.table(
        {
            "url": [f"u{i}" for i in range(len(texts))],
            "warc_ts": pa.array(range(len(texts)), pa.timestamp("us")),
            "text": texts,
            "lang": ["en"] * len(texts),
        }
    )
    path = str(tmp_path / "p.parquet")
    pq.write_table(t, path)
    idx = str(tmp_path / "i")
    build_index_local([path], idx, BuildConfig(analyzer="english"))
    s = IndexSearcher(idx)
    td = s.search(Q.TermQuery("connect"), k=10, total_hits_threshold=1 << 30)
    assert sorted(int(d) for d in td.doc_ids) == [0, 1]
    # query-side analysis uses the index's analyzer (manifest round-trip)
    td2 = s.search("connections", k=10, total_hits_threshold=1 << 30)
    assert sorted(int(d) for d in td2.doc_ids) == [0, 1]


# --- round-3 analyzer surface: core analyzers + CustomAnalyzer chains -------


def test_whitespace_analyzer_preserves_case():
    from lucene_7_x_9_x_ray.functions.analysis import WhitespaceAnalyzer

    a = WhitespaceAnalyzer()
    assert a.tokens("Foo Bar\tbaz  QUX\n") == ["Foo", "Bar", "baz", "QUX"]
    assert a.tokens("") == []


def test_keyword_analyzer_single_token():
    from lucene_7_x_9_x_ray.functions.analysis import KeywordAnalyzer

    a = KeywordAnalyzer()
    assert a.tokens("New York City") == ["New York City"]
    assert a.tokens("") == []


def test_letter_and_stop_analyzers():
    from lucene_7_x_9_x_ray.functions.analysis import LetterAnalyzer, StopAnalyzer

    # LowerCaseTokenizer semantics: letter runs, digits split (unlike \w)
    assert LetterAnalyzer().tokens("The Quick2Brown FOXES") == [
        "the", "quick", "brown", "foxes",
    ]
    # StopAnalyzer = letter runs + classic-33 stop set
    assert StopAnalyzer().tokens("The Quick2Brown Foxes") == [
        "quick", "brown", "foxes",
    ]
    assert StopAnalyzer(stopwords={"quick"}).tokens("the quick fox") == [
        "the", "fox",
    ]


def test_custom_analyzer_fold_chain():
    from lucene_7_x_9_x_ray.functions.analysis import CustomAnalyzer

    a = CustomAnalyzer("standard", ["lowercase", "ascii_folding"])
    assert a.tokens("Élan Café naïve œuvre Straße") == [
        "elan", "cafe", "naive", "oeuvre", "strasse",
    ]


def test_custom_analyzer_shingles_doc_bounded():
    import numpy as np

    from lucene_7_x_9_x_ray.functions.analysis import CustomAnalyzer

    a = CustomAnalyzer("whitespace", [("shingle", {"min_size": 2, "max_size": 2})])
    # ShingleFilter order: at each position the unigram then the shingle
    assert a.tokens("please divide this") == [
        "please", "please divide", "divide", "divide this", "this",
    ]
    # shingles never cross document boundaries
    toks, idx = a.tokenize_batch(["a b", "c d"])
    assert list(toks) == ["a", "a b", "b", "c", "c d", "d"]
    assert list(idx) == [0, 0, 0, 1, 1, 1]
    assert isinstance(idx, np.ndarray)


def test_custom_analyzer_ngrams():
    from lucene_7_x_9_x_ray.functions.analysis import CustomAnalyzer

    ng = CustomAnalyzer("whitespace", [("ngram", {"min_gram": 1, "max_gram": 2})])
    # NGramTokenFilter order: start offset, then gram length
    assert ng.tokens("abc") == ["a", "ab", "b", "bc", "c"]
    eg = CustomAnalyzer("whitespace", [("edge_ngram", {"min_gram": 1, "max_gram": 3})])
    assert eg.tokens("hello") == ["h", "he", "hel"]


def test_custom_analyzer_length_reverse_porter():
    from lucene_7_x_9_x_ray.functions.analysis import CustomAnalyzer

    ln = CustomAnalyzer("letter", [("length", {"min_len": 3, "max_len": 5})])
    assert ln.tokens("an ant eats elephants") == ["ant", "eats"]
    rv = CustomAnalyzer("whitespace", ["lowercase", "reverse"])
    assert rv.tokens("AbC xyz") == ["cba", "zyx"]
    pt = CustomAnalyzer("standard", ["possessive", "lowercase", "porter"])
    assert pt.tokens("John's connections") == ["john", "connect"]


def test_custom_analyzer_registry_errors():
    import pytest

    from lucene_7_x_9_x_ray.functions.analysis import CustomAnalyzer, get_analyzer

    with pytest.raises(ValueError):
        CustomAnalyzer("nosuchtok")
    with pytest.raises(ValueError):
        CustomAnalyzer("standard", ["nosuchfilter"])
    # new core analyzers resolve through the factory hook
    for name in ("whitespace", "keyword", "letter", "stop"):
        assert get_analyzer(name).name == name


def test_custom_analyzer_index_roundtrip(tmp_path):
    """A custom chain builds an index via its spec_name and the searcher
    reopens the SAME chain from the manifest (query-side analysis)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_7_x_9_x_ray.functions.analysis import CustomAnalyzer, get_analyzer
    from lucene_7_x_9_x_ray.search import queries as Q
    from lucene_7_x_9_x_ray.search.searcher import IndexSearcher
    from lucene_7_x_9_x_ray.stages.build import BuildConfig, build_index_local

    a = CustomAnalyzer("standard", ["lowercase", "ascii_folding",
                                    ("stop", {"stopwords": ["the"]})])
    b = get_analyzer(a.spec_name)
    assert b.tokens("The Café") == a.tokens("The Café") == ["cafe"]

    texts = ["the café opens", "a cafe closed", "nothing else"]
    t = pa.table(
        {
            "url": [f"u{i}" for i in range(len(texts))],
            "warc_ts": pa.array(range(len(texts)), pa.timestamp("us")),
            "text": texts,
            "lang": ["en"] * len(texts),
        }
    )
    path = str(tmp_path / "p.parquet")
    pq.write_table(t, path)
    idx = str(tmp_path / "i")
    build_index_local([path], idx, BuildConfig(analyzer=a.spec_name))
    s = IndexSearcher(idx)
    td = s.search(Q.TermQuery("cafe"), k=10, total_hits_threshold=1 << 30)
    assert sorted(int(d) for d in td.doc_ids) == [0, 1]
    td2 = s.search("Café", k=10, total_hits_threshold=1 << 30)
    assert sorted(int(d) for d in td2.doc_ids) == [0, 1]


def test_light_stemmers_conformance():
    """Savoy light stemmers (functions/lightstem.py) — vectors hand-traced
    through the published rule tables (FrenchLightStemmer / GermanLight
    Stemmer / SpanishLightStemmer behavior)."""
    from lucene_7_x_9_x_ray.functions.lightstem import (
        french_light_stem, german_light_stem, spanish_light_stem,
    )

    fr_vectors = {
        "chevaux": "cheval",     # -aux -> -al, then norm
        "peaux": "peau",         # len 5: only the bare -x strip applies
        "hiboux": "hibou",
        "chantés": "chant",      # -s strip + norm é->e + trailing e strips
        "chanter": "chant",
        "chante": "chant",
        "chanté": "chant",
        "championnes": "champion",  # -s, norm: e strip + doubled-n strip
        "confirmation": "confirm",  # -ation rule
        "confirmement": "confirm",  # -ement rule
        "organisation": "organ",    # -isation rule
        "préférence": "preferenc",  # norm accent fold + one trailing e strip
        "baux": "bau",
        "x": "x",
    }
    for w, want in fr_vectors.items():
        assert french_light_stem(w) == want, (w, french_light_stem(w))

    de_vectors = {
        "häuser": "haus",     # umlaut fold + -er
        "bücher": "buch",
        "katzen": "katz",     # -en (step1)
        "kinder": "kind",
        "kindern": "kind",    # -ern (step1)
        "schönste": "schon",    # -e (step1) then -st (step2, n passes the guard)
        "abends": "abend",    # -s after st-ending 'd'
        "abend": "abend",
        "haus": "haus",
    }
    for w, want in de_vectors.items():
        assert german_light_stem(w) == want, (w, german_light_stem(w))

    es_vectors = {
        "casas": "cas",      # -as
        "casa": "casa",      # len < 5 passthrough
        "peces": "pez",      # -ces -> z
        "meses": "mes",      # -eses
        "corto": "cort",
        "cortos": "cort",
        "chicas": "chic",
        "mes": "mes",        # len < 5 passthrough
        "río": "río",        # len < 5 passthrough (accents untouched)
    }
    for w, want in es_vectors.items():
        assert spanish_light_stem(w) == want, (w, spanish_light_stem(w))


def test_language_analyzers_and_elision():
    """get_analyzer('french'/'german'/'spanish') chains + ElisionFilter
    article strip + custom:{json} manifest round-trip."""
    from lucene_7_x_9_x_ray.functions.analysis import get_analyzer

    fr = get_analyzer("french")
    assert fr.tokens("L'avion des chevaux") == ["avion", "des", "cheval"]
    # non-article apostrophe prefixes survive elision untouched
    assert fr.tokens("aujourd'hui") == ["aujourd'hui"]

    de = get_analyzer("german")
    assert de.tokens("Häuser und Bücher") == ["haus", "und", "buch"]

    es = get_analyzer("spanish")
    assert es.tokens("casas y peces") == ["cas", "y", "pez"]

    # stopword-parameterized variant + manifest round-trip
    es_stop = get_analyzer("spanish", stopwords=["y"])
    assert es_stop.tokens("casas y peces") == ["cas", "pez"]
    again = get_analyzer(es_stop.spec_name)
    assert again.tokens("casas y peces") == ["cas", "pez"]


def test_soundex_filter_and_vectors():
    """PhoneticFilter(Soundex) conformance: commons-codec American Soundex
    vectors; non-letter tokens pass through; chains compose."""
    from lucene_7_x_9_x_ray.functions.analysis import CustomAnalyzer, _soundex_token

    vectors = {
        "Robert": "R163", "Rupert": "R163", "Ashcraft": "A261",
        "Ashcroft": "A261", "Tymczak": "T522", "Pfister": "P236",
        "Honeyman": "H555", "Smith": "S530", "Smythe": "S530",
    }
    for word, code in vectors.items():
        assert _soundex_token(word) == code, word
    assert _soundex_token("1234") == "1234"  # no letters: pass-through

    a = CustomAnalyzer("standard", ["lowercase", "soundex"])
    assert a.tokens("Smith vs Smythe") == ["S530", "V200", "S530"]
    # spec_name round-trips through the registry
    from lucene_7_x_9_x_ray.functions.analysis import get_analyzer

    assert get_analyzer(a.spec_name).tokens("Robert") == ["R163"]


def test_keyword_marker_and_stemmer_override():
    """KeywordMarkerFilter protects terms from the wrapped stemmer;
    StemmerOverrideFilter replaces rule hits and stems the rest."""
    from lucene_7_x_9_x_ray.functions.analysis import CustomAnalyzer, get_analyzer

    km = CustomAnalyzer(
        "standard",
        ["lowercase", ("keyword_marker", {"keywords": ["running"], "filter": "porter"})],
    )
    assert km.tokens("running runner jumps") == ["running", "runner", "jump"]

    so = CustomAnalyzer(
        "standard",
        ["lowercase", ("stemmer_override", {"rules": {"mice": "mouse"}, "filter": "porter"})],
    )
    assert so.tokens("mice houses running") == ["mouse", "hous", "run"]
    # manifest round-trip (build-config spec string)
    assert get_analyzer(so.spec_name).tokens("mice") == ["mouse"]


def test_cjk_bigram_filter():
    """CJKBigramFilter: ideograph runs -> overlapping bigrams; lone
    ideographs stay unigrams; non-CJK passes through; runs never cross
    documents; output_unigrams keeps the singles too."""
    from lucene_7_x_9_x_ray.functions.analysis import CustomAnalyzer, get_analyzer

    a = CustomAnalyzer("standard", ["lowercase", "cjk_bigram"])
    assert a.tokens("我爱北京 hello 天") == ["我爱", "爱北", "北京", "hello", "天"]
    assert a.tokens("天") == ["天"]
    assert a.tokens("plain text") == ["plain", "text"]

    b = CustomAnalyzer("standard", ["lowercase", ("cjk_bigram", {"output_unigrams": True})])
    assert b.tokens("我爱 test") == ["我", "我爱", "爱", "test"]

    # batch form: runs never cross document boundaries
    toks, didx = a.tokenize_batch(["我爱", "北京"])
    assert list(toks) == ["我爱", "北京"] and list(didx) == [0, 1]
    # manifest round-trip
    assert get_analyzer(a.spec_name).tokens("我爱北京") == ["我爱", "爱北", "北京"]
