"""SimpleQueryParser: the tolerant end-user query syntax (s84
queryparser/src/java/org/apache/lucene/queryparser/simple/
SimpleQueryParser.java:99) — ``+`` AND, ``|`` OR, ``-`` NOT, quoted
phrases with ``~N`` slop, trailing ``*`` prefix, ``~N`` term fuzziness,
``( )`` precedence, ``\\`` escape, whitespace = the default operator
(SHOULD). Any malformed input degrades to terms — the parser NEVER
raises (the class's design contract).

Tree building mirrors the reference exactly (buildQueryTree /
addClause): clauses left-fold into one BooleanQuery while the operator
stays the same; an operator CHANGE nests the current tree as the first
clause of a new BooleanQuery (the precedence model); a negated branch
wraps as ``BQ(MUST_NOT branch, SHOULD MatchAll)`` so it can stand in a
disjunction (java:341-347).

Multi-field weights follow newDefaultQuery (java:574-583): each text
term expands to a SHOULD disjunction of per-field TermQueries with the
configured boosts.
"""

from __future__ import annotations

from . import queries as Q

_OPCHARS = set('+|-"(\\)*~')
_WS = set(" \n\r\t")


def _new_default(token: str, weights: dict[str, float]) -> Q.Query:
    if len(weights) == 1:
        ((f, b),) = weights.items()
        return Q.TermQuery(token, boost=b, field=f)
    return Q.BooleanQuery.build(
        [(Q.SHOULD, Q.TermQuery(token, boost=b, field=f))
         for f, b in sorted(weights.items())]
    )


class _State:
    __slots__ = ("data", "i", "top", "prev_op", "cur_op", "neg")

    def __init__(self, data: str):
        self.data = data
        self.i = 0
        self.top: Q.Query | None = None
        self.prev_op: str | None = None
        self.cur_op: str | None = None
        self.neg = 0


def parse_simple(
    text: str,
    analyzer,
    weights: dict[str, float] | None = None,
    default_operator: str = Q.SHOULD,
) -> Q.Query:
    """Parse ``text``; ``weights`` maps field -> boost ("" = primary)."""
    weights = weights or {"": 1.0}
    st = _State(text)
    _parse_sub(st, len(text), analyzer, weights, default_operator)
    return st.top if st.top is not None else Q.MatchNoDocsQuery()


def _parse_sub(st: _State, end: int, analyzer, weights, default_op) -> None:
    while st.i < end:
        ch = st.data[st.i]
        if ch == "(":
            _consume_group(st, analyzer, weights, default_op)
        elif ch == ")":
            st.i += 1  # extraneous — ignored (tolerance)
        elif ch == '"':
            _consume_phrase(st, analyzer, weights, default_op)
        elif ch == "+":
            if st.cur_op is None and st.top is not None:
                st.cur_op = Q.MUST
            st.i += 1
        elif ch == "|":
            if st.cur_op is None and st.top is not None:
                st.cur_op = Q.SHOULD
            st.i += 1
        elif ch == "-":
            st.neg += 1
            st.i += 1
            continue  # keep the negation for the upcoming branch
        elif ch in _WS:
            st.i += 1
        else:
            _consume_token(st, analyzer, weights, default_op)


def _consume_group(st: _State, analyzer, weights, default_op) -> None:
    depth = 0
    j = st.i
    while j < len(st.data):
        if st.data[j] == "\\":
            j += 2
            continue
        if st.data[j] == "(":
            depth += 1
        elif st.data[j] == ")":
            depth -= 1
            if depth == 0:
                break
        j += 1
    if depth != 0:  # unbalanced: treat '(' as text start (tolerance)
        st.i += 1
        return
    sub = _State(st.data[st.i + 1: j])
    _parse_sub(sub, len(sub.data), analyzer, weights, default_op)
    st.i = j + 1
    _build(st, sub.top, default_op)


def _consume_phrase(st: _State, analyzer, weights, default_op) -> None:
    j = st.i + 1
    buf = []
    while j < len(st.data):
        if st.data[j] == "\\" and j + 1 < len(st.data):
            buf.append(st.data[j + 1])
            j += 2
            continue
        if st.data[j] == '"':
            break
        buf.append(st.data[j])
        j += 1
    if j >= len(st.data):  # unterminated: the quote is dropped as text
        st.i += 1
        return
    st.i = j + 1
    slop = 0
    if st.i < len(st.data) and st.data[st.i] == "~":
        k = st.i + 1
        while k < len(st.data) and st.data[k].isdigit():
            k += 1
        if k > st.i + 1:
            slop = int(st.data[st.i + 1: k])
            st.i = k
    terms = tuple(analyzer.tokens("".join(buf)))
    branch: Q.Query | None = None
    if terms:
        f = sorted(weights)[0] if "" not in weights else ""
        branch = Q.PhraseQuery(terms=terms, slop=slop, field=f)
    _build(st, branch, default_op)


def _consume_token(st: _State, analyzer, weights, default_op) -> None:
    buf = []
    while st.i < len(st.data):
        ch = st.data[st.i]
        if ch == "\\" and st.i + 1 < len(st.data):
            buf.append(st.data[st.i + 1])
            st.i += 2
            continue
        if ch in _WS or ch in '+|"()-':
            break
        if ch == "~" or ch == "*":
            break
        buf.append(ch)
        st.i += 1
    token = "".join(buf)
    branch: Q.Query | None = None
    if st.i < len(st.data) and st.data[st.i] == "~":
        k = st.i + 1
        while k < len(st.data) and st.data[k].isdigit():
            k += 1
        if k > st.i + 1:  # fuzzy term (FUZZY_OPERATOR)
            fuzz = int(st.data[st.i + 1: k])
            st.i = k
            toks = analyzer.tokens(token)
            if toks:
                branch = Q.FuzzyQuery(toks[0], max_edits=min(fuzz, 2))
            _build(st, branch, default_op)
            return
        st.i += 1  # lone '~': dropped (tolerance)
    if st.i < len(st.data) and st.data[st.i] == "*":
        st.i += 1  # prefix term (PREFIX_OPERATOR)
        toks = analyzer.tokens(token)
        if toks:
            branch = Q.PrefixQuery(toks[0])
        _build(st, branch, default_op)
        return
    toks = analyzer.tokens(token)
    if toks:
        branch = _new_default(toks[0], weights)
    _build(st, branch, default_op)


def _add_clause(bq: Q.BooleanQuery, query: Q.Query, occur: str) -> Q.Query:
    return Q.BooleanQuery(
        clauses=bq.clauses + (Q.BooleanClause(occur, query),),
        min_should_match=bq.min_should_match,
    )


def _build(st: _State, branch: Q.Query | None, default_op: str) -> None:
    """buildQueryTree (java:320-365): negation wrap, left-fold with
    operator-change nesting."""
    if branch is not None:
        if st.neg % 2 == 1:
            branch = Q.BooleanQuery.build(
                [(Q.MUST_NOT, branch), (Q.SHOULD, Q.MatchAllDocsQuery())]
            )
        if st.top is None:
            st.top = branch
        else:
            if st.cur_op is None:
                st.cur_op = default_op
            if st.prev_op != st.cur_op:
                st.top = Q.BooleanQuery.build([(st.cur_op, st.top)])
            st.top = _add_clause(st.top, branch, st.cur_op)
            st.prev_op = st.cur_op
    st.cur_op = None
    st.neg = 0
