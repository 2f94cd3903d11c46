"""Porter stemmer — the published Porter (1980) suffix-stripping algorithm
with the author's two distributed-implementation departures (step 2:
bli->ble instead of abli->able, and ogi->og), i.e. the exact variant
Lucene's PorterStemFilter/EnglishAnalyzer applies after
tokenize/lowercase/stop (s84 analysis/common/.../en/EnglishAnalyzer
.java:108-117, analysis/common/.../en/PorterStemFilter.java).
Re-implemented from the public specification, not ported.

Definitions (per the paper): a consonant is a letter other than a, e, i,
o, u, and other than y preceded by a consonant. A word has the form
[C](VC){m}[V]; m is the "measure". Conditions: *v* = stem contains a
vowel; *d = stem ends in a double consonant; *o = stem ends cvc where the
final c is not w, x or y.
"""

from __future__ import annotations

__all__ = ["porter_stem"]

_VOWELS = "aeiou"


def _cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m = number of VC sequences in [C](VC){m}[V]."""
    m = 0
    i = 0
    n = len(stem)
    while i < n and _cons(stem, i):
        i += 1
    while i < n:
        while i < n and not _cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _cons(w, len(w) - 1)


def _ends_cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    return (
        _cons(w, len(w) - 3)
        and not _cons(w, len(w) - 2)
        and _cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


def porter_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w

    # --- step 1a --------------------------------------------------------
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # --- step 1b --------------------------------------------------------
    did_1b_fix = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            did_1b_fix = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            did_1b_fix = True
    if did_1b_fix:
        if w.endswith(("at", "bl", "iz")):
            w = w + "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w = w + "e"

    # --- step 1c --------------------------------------------------------
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # --- step 2 (m > 0) -------------------------------------------------
    # Departures from the 1980 paper, matching the author's distributed
    # implementation (and therefore Lucene's PorterStemFilter token
    # output): "bli"->"ble" replaces the paper's "abli"->"able" (same
    # result for -abli words, additionally stems e.g. possibli), and the
    # logi->log departure is coded as the implementation codes it — suffix
    # "ogi"->"og" with the measure taken on the stem excluding only "ogi"
    # (geologi: m("geol")=1 -> geolog, whereas m("geo")=0 would refuse).
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("bli", "ble"),
        ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
        ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
        ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
        ("biliti", "ble"), ("ogi", "og"),
    ):
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # --- step 3 (m > 0) -------------------------------------------------
    for suf, rep in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # --- step 4 (m > 1) -------------------------------------------------
    for suf in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ):
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if suf == "ion" and not (stem and stem[-1] in "st"):
                break  # (m>1 and (*S or *T)) required for -ion
            if _measure(stem) > 1:
                w = stem
            break

    # --- step 5a --------------------------------------------------------
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem

    # --- step 5b --------------------------------------------------------
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w
