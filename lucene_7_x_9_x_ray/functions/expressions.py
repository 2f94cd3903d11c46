"""Expression compiler — the Lucene ``expressions`` module analogue.

Lucene compiles a JavaScript-like arithmetic expression to a
``DoubleValuesSource`` bound to per-document variables (s84
``expressions/src/java/org/apache/lucene/expressions/js/JavascriptCompiler
.java:1`` — grammar in ``Javascript.g4``; binding model in
``expressions/Expression.java:36`` + ``SimpleBindings.java:38``).  The
engine's variables are ``_score`` and doc-values columns, exactly like
``FunctionScoreQuery``'s value sources.

This re-expression keeps Lucene's VALUE semantics and redesigns the
execution for the Ray-Data engine:

- every value is a float64 (Lucene: "all operations ... are performed
  using double precision" — JavascriptCompiler javadoc);
- comparison / equality / logical operators yield 1.0 or 0.0, and an
  operand is "true" iff it is nonzero (JavascriptCompiler javadoc,
  "boolean operations ... translate to 1 and 0");
- the ternary ``c ? a : b`` selects per element on ``c != 0``;
- the function table is Lucene's DEFAULT_FUNCTIONS (JavascriptCompiler
  .java:560-600): abs acos acosh asin asinh atan atan2 atanh ceil cos
  cosh exp floor haversin ln log10 logn max min pow sin sinh sqrt tan
  tanh.

Instead of ASM bytecode, compilation produces a tiny AST evaluated with
vectorized numpy kernels over whole candidate arrays — one evaluation
per segment per query, no per-document Python.  Bitwise/shift operators
from the Lucene grammar are intentionally out of scope (documented
deviation; they act on long casts and are unused by the reference's own
demos and tests).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from functools import lru_cache
from typing import Callable

import numpy as np

__all__ = ["Expression", "compile_expression", "ExpressionError"]


class ExpressionError(ValueError):
    """Lexer/parser/binding failure (ParseException analogue)."""


# --- lexer -------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<num>(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)"
    r"|(?P<ident>[A-Za-z_][A-Za-z0-9_.]*)"
    r"|(?P<op><=|>=|==|!=|&&|\|\||[-+*/%()<>!?:,])"
    r")"
)


def _tokenize(src: str) -> list[str | float]:
    out: list[str | float] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip() == "":
                break
            raise ExpressionError(f"unexpected character {src[pos]!r} at {pos} in {src!r}")
        if m.group("num") is not None:
            out.append(float(m.group("num")))
        else:
            out.append(m.group("ident") or m.group("op"))
        pos = m.end()
    return out


# --- function table (JavascriptCompiler.java:560-600) -------------------


def _haversin_m(lat1, lon1, lat2, lon2):
    # SloppyMath.haversinMeters semantics: great-circle meters
    R = 6_371_008.7714  # mean earth radius used by SloppyMath (meters)
    la1, la2 = np.radians(lat1), np.radians(lat2)
    dla = la2 - la1
    dlo = np.radians(lon2) - np.radians(lon1)
    a = np.sin(dla / 2) ** 2 + np.cos(la1) * np.cos(la2) * np.sin(dlo / 2) ** 2
    return 2 * R * np.arcsin(np.sqrt(np.minimum(a, 1.0)))


_FUNCTIONS: dict[str, tuple[int, Callable]] = {
    "abs": (1, np.abs),
    "acos": (1, np.arccos),
    "acosh": (1, np.arccosh),
    "asin": (1, np.arcsin),
    "asinh": (1, np.arcsinh),
    "atan": (1, np.arctan),
    "atan2": (2, np.arctan2),
    "atanh": (1, np.arctanh),
    "ceil": (1, np.ceil),
    "cos": (1, np.cos),
    "cosh": (1, np.cosh),
    "exp": (1, np.exp),
    "floor": (1, np.floor),
    "haversin": (4, _haversin_m),
    "ln": (1, np.log),
    "log10": (1, np.log10),
    "logn": (2, lambda base, x: np.log(x) / np.log(base)),
    "max": (2, np.maximum),
    "min": (2, np.minimum),
    "pow": (2, np.power),
    "sin": (1, np.sin),
    "sinh": (1, np.sinh),
    "sqrt": (1, np.sqrt),
    "tan": (1, np.tan),
    "tanh": (1, np.tanh),
}


# --- parser (precedence per Javascript.g4) ------------------------------
# AST: ("num", v) ("var", name) ("call", fn, [args])
#      ("un", op, x) ("bin", op, l, r) ("ternary", c, a, b)


class _Parser:
    def __init__(self, tokens: list[str | float], src: str):
        self.toks = tokens
        self.i = 0
        self.src = src

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, tok: str):
        t = self.take()
        if t != tok:
            raise ExpressionError(f"expected {tok!r}, got {t!r} in {self.src!r}")

    def parse(self):
        node = self.ternary()
        if self.peek() is not None:
            raise ExpressionError(f"trailing input {self.peek()!r} in {self.src!r}")
        return node

    def ternary(self):
        cond = self.logical_or()
        if self.peek() == "?":
            self.take()
            a = self.ternary()
            self.expect(":")
            b = self.ternary()
            return ("ternary", cond, a, b)
        return cond

    def _binchain(self, sub, ops):
        node = sub()
        while self.peek() in ops:
            op = self.take()
            node = ("bin", op, node, sub())
        return node

    def logical_or(self):
        return self._binchain(self.logical_and, ("||",))

    def logical_and(self):
        return self._binchain(self.equality, ("&&",))

    def equality(self):
        return self._binchain(self.relational, ("==", "!="))

    def relational(self):
        return self._binchain(self.additive, ("<", "<=", ">", ">="))

    def additive(self):
        return self._binchain(self.multiplicative, ("+", "-"))

    def multiplicative(self):
        return self._binchain(self.unary, ("*", "/", "%"))

    def unary(self):
        t = self.peek()
        if t in ("-", "+", "!"):
            self.take()
            return ("un", t, self.unary())
        return self.primary()

    def primary(self):
        t = self.take()
        if isinstance(t, float):
            return ("num", t)
        if t == "(":
            node = self.ternary()
            self.expect(")")
            return node
        if isinstance(t, str) and (t[0].isalpha() or t[0] == "_"):
            if self.peek() == "(":
                self.take()
                args = []
                if self.peek() != ")":
                    args.append(self.ternary())
                    while self.peek() == ",":
                        self.take()
                        args.append(self.ternary())
                self.expect(")")
                if t not in _FUNCTIONS:
                    raise ExpressionError(f"unknown function {t!r} in {self.src!r}")
                arity, _ = _FUNCTIONS[t]
                if len(args) != arity:
                    raise ExpressionError(
                        f"{t}() takes {arity} args, got {len(args)} in {self.src!r}"
                    )
                return ("call", t, args)
            return ("var", t)
        raise ExpressionError(f"unexpected token {t!r} in {self.src!r}")


def _variables(node, out: set[str]) -> set[str]:
    kind = node[0]
    if kind == "var":
        out.add(node[1])
    elif kind == "call":
        for a in node[2]:
            _variables(a, out)
    elif kind == "un":
        _variables(node[2], out)
    elif kind == "bin":
        _variables(node[2], out)
        _variables(node[3], out)
    elif kind == "ternary":
        for sub in node[1:]:
            _variables(sub, out)
    return out


_BIN_OPS: dict[str, Callable] = {
    "+": np.add,
    "-": np.subtract,
    "*": np.multiply,
    "/": np.divide,
    "%": np.fmod,  # Java % on doubles == C fmod (ieee remainder differs)
    "<": lambda a, b: np.less(a, b).astype(np.float64),
    "<=": lambda a, b: np.less_equal(a, b).astype(np.float64),
    ">": lambda a, b: np.greater(a, b).astype(np.float64),
    ">=": lambda a, b: np.greater_equal(a, b).astype(np.float64),
    "==": lambda a, b: np.equal(a, b).astype(np.float64),
    "!=": lambda a, b: np.not_equal(a, b).astype(np.float64),
    "&&": lambda a, b: (np.not_equal(a, 0) & np.not_equal(b, 0)).astype(np.float64),
    "||": lambda a, b: (np.not_equal(a, 0) | np.not_equal(b, 0)).astype(np.float64),
}


def _eval(node, bind: dict[str, np.ndarray]):
    kind = node[0]
    if kind == "num":
        return node[1]
    if kind == "var":
        try:
            return bind[node[1]]
        except KeyError:
            raise ExpressionError(f"unbound variable {node[1]!r}") from None
    if kind == "call":
        _, fn = _FUNCTIONS[node[1]]
        return fn(*(_eval(a, bind) for a in node[2]))
    if kind == "un":
        x = _eval(node[2], bind)
        if node[1] == "-":
            return np.negative(x)
        if node[1] == "+":
            return x
        return np.equal(x, 0).astype(np.float64)  # "!"
    if kind == "bin":
        return _BIN_OPS[node[1]](_eval(node[2], bind), _eval(node[3], bind))
    # ternary: numpy where evaluates both branches — fine, they are pure
    c = _eval(node[1], bind)
    return np.where(np.asarray(c) != 0, _eval(node[2], bind), _eval(node[3], bind))


@dataclass(frozen=True)
class Expression:
    """Compiled expression (expressions/Expression.java:36 role): the
    source text, its free variables, and a vectorized evaluator."""

    source: str
    variables: frozenset[str]
    _ast: tuple

    def evaluate(self, bindings: dict[str, np.ndarray]) -> np.ndarray:
        """Evaluate over float64 arrays (or scalars); returns float64.

        Missing variables raise ExpressionError (SimpleBindings.validate
        behavior)."""
        bind = {
            k: np.asarray(v, dtype=np.float64) if not np.isscalar(v) else float(v)
            for k, v in bindings.items()
        }
        out = _eval(self._ast, bind)
        return np.asarray(out, dtype=np.float64)


@lru_cache(maxsize=256)
def compile_expression(source: str) -> Expression:
    """Parse + compile (JavascriptCompiler.compile analogue), cached by
    source text — searchers re-run the same expression per segment."""
    ast = _Parser(_tokenize(source), source).parse()
    if ast[0] == "num" and math.isnan(ast[1]):
        raise ExpressionError("NaN literal")
    return Expression(source=source, variables=frozenset(_variables(ast, set())), _ast=ast)
