"""Light stemmers for French / German / Spanish (the Savoy light-stemmer
family: Jacques Savoy, "Light stemming approaches for the French, Portuguese,
German and Hungarian languages", SAC 2006, and "Report on CLEF-2001
experiments"). Behavior matches the reference's transcriptions of the same
published rule tables:

- analysis/common/src/java/org/apache/lucene/analysis/fr/FrenchLightStemmer.java
- analysis/common/src/java/org/apache/lucene/analysis/de/GermanLightStemmer.java
- analysis/common/src/java/org/apache/lucene/analysis/es/SpanishLightStemmer.java

re-derived here as Python string kernels (rule order and length guards are
part of the published algorithms). Each stemmer is applied per DISTINCT
token via analysis._vocab_map, so per-corpus cost is O(vocabulary), not
O(tokens). Conformance vectors: tests/test_analysis.py."""

from __future__ import annotations

_FR_ACCENTS = str.maketrans("àáâôèéêùûî ç".replace(" ", ""), "aaaoeeeuuic")
_DE_ACCENTS = str.maketrans("äàáâöòóôïìíîüùúû", "aaaaooooiiiiuuuu")
_ES_ACCENTS = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii")


def _fr_norm(s: list) -> str:
    """FrenchLightStemmer.norm: accent folding, adjacent-duplicate-letter
    collapse, trailing ie / r / e / e / doubled-letter strips — each step
    gated on length > 4."""
    if len(s) > 4:
        s = list("".join(s).translate(_FR_ACCENTS))
        # collapse runs of the same letter to one occurrence
        out = [s[0]]
        for c in s[1:]:
            if not (c == out[-1] and c.isalpha()):
                out.append(c)
        s = out
    if len(s) > 4 and s[-2:] == ["i", "e"]:
        s = s[:-2]
    if len(s) > 4:
        if s[-1] == "r":
            s = s[:-1]
        if s[-1] == "e":
            s = s[:-1]
        if s[-1] == "e":
            s = s[:-1]
        if s[-1] == s[-2] and s[-1].isalpha():
            s = s[:-1]
    return "".join(s)


def french_light_stem(word: str) -> str:
    """French light stemmer: plural/x strips, then the first matching
    derivational-suffix rule (rule order is significant), then norm()."""
    s = list(word)

    def ends(suf: str) -> bool:
        return len(s) >= len(suf) and "".join(s[-len(suf):]) == suf

    if len(s) > 5 and s[-1] == "x":
        if s[-3] == "a" and s[-2] == "u" and s[-4] != "e":
            s[-2] = "l"
        s = s[:-1]
    if len(s) > 3 and s[-1] == "x":
        s = s[:-1]
    if len(s) > 3 and s[-1] == "s":
        s = s[:-1]

    if len(s) > 9 and ends("issement"):
        s = s[:-6]
        s[-1] = "r"
        return _fr_norm(s)
    if len(s) > 8 and ends("issant"):
        s = s[:-4]
        s[-1] = "r"
        return _fr_norm(s)
    if len(s) > 6 and ends("ement"):
        s = s[:-4]
        if len(s) > 3 and ends("ive"):
            s = s[:-1]
            s[-1] = "f"
        return _fr_norm(s)
    if len(s) > 11 and ends("ficatrice"):
        s = s[:-5]
        s[-2] = "e"
        s[-1] = "r"
        return _fr_norm(s)
    if len(s) > 10 and ends("ficateur"):
        s = s[:-4]
        s[-2] = "e"
        s[-1] = "r"
        return _fr_norm(s)
    if len(s) > 9 and ends("catrice"):
        s = s[:-3]
        s[-4] = "q"
        s[-3] = "u"
        s[-2] = "e"  # s[-1] is already 'r'
        return _fr_norm(s)
    if len(s) > 8 and ends("cateur"):
        s = s[:-2]
        s[-4] = "q"
        s[-3] = "u"
        s[-2] = "e"
        s[-1] = "r"
        return _fr_norm(s)
    if len(s) > 8 and ends("atrice"):
        s = s[:-4]
        s[-2] = "e"
        s[-1] = "r"
        return _fr_norm(s)
    if len(s) > 7 and ends("ateur"):
        s = s[:-3]
        s[-2] = "e"
        s[-1] = "r"
        return _fr_norm(s)
    if len(s) > 6 and ends("trice"):
        s = s[:-1]
        s[-3] = "e"
        s[-2] = "u"
        s[-1] = "r"
        # falls through (no return) like the reference rule table
    if len(s) > 5 and ends("ième"):
        return _fr_norm(s[:-4])
    if len(s) > 7 and ends("teuse"):
        s = s[:-2]
        s[-1] = "r"
        return _fr_norm(s)
    if len(s) > 6 and ends("teur"):
        s = s[:-1]
        s[-1] = "r"
        return _fr_norm(s)
    if len(s) > 5 and ends("euse"):
        return _fr_norm(s[:-2])
    if len(s) > 8 and ends("ère"):
        s = s[:-1]
        s[-2] = "e"
        return _fr_norm(s)
    if len(s) > 7 and ends("ive"):
        s = s[:-1]
        s[-1] = "f"
        return _fr_norm(s)
    if len(s) > 4 and (ends("folle") or ends("molle")):
        s = s[:-2]
        s[-1] = "u"
        return _fr_norm(s)
    if len(s) > 9 and ends("nnelle"):
        return _fr_norm(s[:-5])
    if len(s) > 9 and ends("nnel"):
        return _fr_norm(s[:-3])
    if len(s) > 4 and ends("ète"):
        s = s[:-1]
        s[-2] = "e"
        # falls through
    if len(s) > 8 and ends("ique"):
        s = s[:-4]
        # falls through
    if len(s) > 8 and ends("esse"):
        return _fr_norm(s[:-3])
    if len(s) > 7 and ends("inage"):
        return _fr_norm(s[:-3])
    if len(s) > 9 and ends("isation"):
        s = s[:-7]
        if len(s) > 5 and ends("ual"):
            s[-2] = "e"
        return _fr_norm(s)
    if len(s) > 9 and ends("isateur"):
        return _fr_norm(s[:-7])
    if len(s) > 8 and ends("ation"):
        return _fr_norm(s[:-5])
    if len(s) > 8 and ends("ition"):
        return _fr_norm(s[:-5])
    return _fr_norm(s)


_DE_ST_ENDING = frozenset("bdfghklmnt")


def german_light_stem(word: str) -> str:
    """German light stemmer: umlaut/accent folding, then two suffix
    steps (plural/case endings, then comparative/superlative -st/-er/-en),
    with the st-ending consonant guard."""
    s = word.translate(_DE_ACCENTS)

    # step 1
    if len(s) > 5 and s.endswith("ern"):
        s = s[:-3]
    elif len(s) > 4 and len(s) >= 2 and s[-2] == "e" and s[-1] in "mnrs":
        s = s[:-2]
    elif len(s) > 3 and s[-1] == "e":
        s = s[:-1]
    elif len(s) > 3 and s[-1] == "s" and s[-2] in _DE_ST_ENDING:
        s = s[:-1]

    # step 2
    if len(s) > 5 and s.endswith("est"):
        s = s[:-3]
    elif len(s) > 4 and (s.endswith("er") or s.endswith("en")):
        s = s[:-2]
    elif len(s) > 4 and s.endswith("st") and s[-3] in _DE_ST_ENDING:
        s = s[:-2]
    return s


def spanish_light_stem(word: str) -> str:
    """Spanish light stemmer: accent folding then one plural/gender
    suffix rule — words shorter than 5 characters are left intact."""
    if len(word) < 5:
        return word
    s = word.translate(_ES_ACCENTS)
    last = s[-1]
    if last in "oae":
        return s[:-1]
    if last == "s":
        if s[-4:-1] == "ese":
            return s[:-2]
        if s[-3:-1] == "ce":
            return s[:-3] + "z"
        if s[-2] in "oae":
            return s[:-2]
    return s
