"""Expression compiler — the lucene/expressions module analog.

Reference surface being re-expressed (SURVEY.md §2.H functions):
  lucene/expressions/.../js/JavascriptCompiler.java — compiles a
    javascript-like arithmetic expression over named DoubleValuesSource
    bindings into bytecode evaluated per doc (used for sort fields,
    boosts and aggregations: ``expr=sqrt(popularity) + 2*boost``)
  expressions/Bindings.java / SimpleBindings.java — name -> value source
  solr/core/.../search/FunctionQParser.java — the Solr surface that
    accepts such expressions as sort= / boost= functions

Spark restatement: the compiler targets a Catalyst Column instead of JVM
bytecode — same grammar, same double semantics, and the result stays
inside whole-stage codegen (no UDF). A second backend emits the
equivalent ANSI-SQL string so the DuckDB oracle runs the SAME compiled
artifact — the driver row pins the compiler, not hand-copied arithmetic.

Pinned grammar (precedence low->high):
  ternary   cond ? a : b          (right-assoc)
  compare   < <= > >= == !=      -> 1.0 / 0.0 (JS-double discipline)
  additive  + -
  multiplicative * / %
  unary     - expr
  primary   literal | name | func(args...) | ( expr )
  funcs     sqrt ln log10 abs min max pow floor ceil
All arithmetic is double; names resolve through the bindings map.
Domain edges are pinned NULL on BOTH backends (ln/log10 of x <= 0,
sqrt of x < 0) — a documented deviation from JavascriptCompiler's
-Infinity/NaN so the Column and SQL artifacts stay value-identical.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN = re.compile(
    r"\s*(\d+\.\d+|\d+|[A-Za-z_][A-Za-z0-9_]*|<=|>=|==|!=|[-+*/%()<>?:,])"
)

_FUNCS_1 = {"sqrt", "ln", "log10", "abs", "floor", "ceil"}
_FUNCS_N = {"min", "max", "pow"}


class ExpressionError(ValueError):
    pass


def _lex(src: str) -> list[str]:
    out, i = [], 0
    src = src or ""
    while i < len(src):
        m = _TOKEN.match(src, i)
        if not m:
            raise ExpressionError(f"bad expression at {src[i:]!r}")
        out.append(m.group(1))
        i = m.end()
    if not out:
        raise ExpressionError("empty expression")
    return out


class _Parser:
    """Recursive descent -> tiny AST of tuples:
    ('num', v) ('var', name) ('call', fn, [args]) ('un-', a)
    ('bin', op, a, b) ('cmp', op, a, b) ('tern', c, a, b)."""

    def __init__(self, toks: list[str]):
        self.toks = toks
        self.pos = 0

    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def take(self, expected=None):
        t = self.peek()
        if t is None or (expected is not None and t != expected):
            raise ExpressionError(f"expected {expected!r}, got {t!r}")
        self.pos += 1
        return t

    def parse(self):
        node = self.ternary()
        if self.pos != len(self.toks):
            raise ExpressionError(f"trailing input {self.toks[self.pos:]!r}")
        return node

    def ternary(self):
        cond = self.compare()
        if self.peek() == "?":
            self.take("?")
            a = self.ternary()
            self.take(":")
            b = self.ternary()
            return ("tern", cond, a, b)
        return cond

    def compare(self):
        a = self.additive()
        if self.peek() in ("<", "<=", ">", ">=", "==", "!="):
            op = self.take()
            b = self.additive()
            return ("cmp", op, a, b)
        return a

    def additive(self):
        a = self.multiplicative()
        while self.peek() in ("+", "-"):
            op = self.take()
            a = ("bin", op, a, self.multiplicative())
        return a

    def multiplicative(self):
        a = self.unary()
        while self.peek() in ("*", "/", "%"):
            op = self.take()
            a = ("bin", op, a, self.unary())
        return a

    def unary(self):
        if self.peek() == "-":
            self.take("-")
            return ("un-", self.unary())
        return self.primary()

    def primary(self):
        t = self.take()
        if re.fullmatch(r"\d+(\.\d+)?", t):
            return ("num", float(t))
        if t == "(":
            node = self.ternary()
            self.take(")")
            return node
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", t):
            raise ExpressionError(f"unexpected {t!r}")
        if self.peek() == "(":
            self.take("(")
            args = [self.ternary()]
            while self.peek() == ",":
                self.take(",")
                args.append(self.ternary())
            self.take(")")
            fn = t.lower()
            if fn in _FUNCS_1:
                if len(args) != 1:
                    raise ExpressionError(f"{fn} takes 1 arg")
            elif fn in _FUNCS_N:
                if len(args) != 2:
                    raise ExpressionError(f"{fn} takes 2 args")
            else:
                raise ExpressionError(f"unknown function {t!r}")
            return ("call", fn, args)
        return ("var", t)


def parse_expression(src: str):
    return _Parser(_lex(src)).parse()


def compile_column(src: str, bindings: dict[str, Column]) -> Column:
    """Expression -> Catalyst Column (the JavascriptCompiler#compile
    analog; bindings = SimpleBindings). All-double arithmetic."""

    def go(n) -> Column:
        kind = n[0]
        if kind == "num":
            return F.lit(n[1]).cast("double")
        if kind == "var":
            if n[1] not in bindings:
                raise ExpressionError(f"unbound variable {n[1]!r}")
            return bindings[n[1]].cast("double")
        if kind == "un-":
            return -go(n[1])
        if kind == "bin":
            a, b = go(n[2]), go(n[3])
            return {
                "+": a + b, "-": a - b, "*": a * b, "/": a / b, "%": a % b
            }[n[1]]
        if kind == "cmp":
            a, b = go(n[2]), go(n[3])
            c = {
                "<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b,
                "==": a == b, "!=": a != b,
            }[n[1]]
            return F.when(c, 1.0).otherwise(0.0).cast("double")
        if kind == "tern":
            return F.when(go(n[1]) != 0.0, go(n[2])).otherwise(go(n[3]))
        assert kind == "call"
        fn, args = n[1], [go(a) for a in n[2]]
        # pinned domain-edge semantics, identical on BOTH backends:
        # ln/log10 of x <= 0 and sqrt of x < 0 yield NULL (a documented
        # deviation from JavascriptCompiler's -Inf/NaN — DuckDB would
        # otherwise abort and Spark would mix NULL with NaN)
        if fn == "sqrt":
            return F.when(args[0] >= 0.0, F.sqrt(args[0]))
        if fn == "ln":
            return F.when(args[0] > 0.0, F.log(args[0]))
        if fn == "log10":
            return F.when(args[0] > 0.0, F.log10(args[0]))
        if fn == "abs":
            return F.abs(args[0])
        if fn == "floor":
            return F.floor(args[0]).cast("double")
        if fn == "ceil":
            return F.ceil(args[0]).cast("double")
        if fn == "min":
            return F.least(*args)
        if fn == "max":
            return F.greatest(*args)
        assert fn == "pow"
        return F.pow(args[0], args[1])

    return go(parse_expression(src))


def compile_sql(src: str, bindings: dict[str, str]) -> str:
    """The SAME compiled artifact as ANSI SQL (DuckDB oracle backend);
    bindings map names to SQL expressions."""

    def go(n) -> str:
        kind = n[0]
        if kind == "num":
            return f"({n[1]!r}::DOUBLE)"
        if kind == "var":
            if n[1] not in bindings:
                raise ExpressionError(f"unbound variable {n[1]!r}")
            return f"(({bindings[n[1]]})::DOUBLE)"
        if kind == "un-":
            return f"(- {go(n[1])})"
        if kind == "bin":
            return f"({go(n[2])} {n[1]} {go(n[3])})"
        if kind == "cmp":
            return (
                f"(CASE WHEN {go(n[2])} {'=' if n[1] == '==' else n[1]} "
                f"{go(n[3])} THEN 1.0 ELSE 0.0 END)"
            )
        if kind == "tern":
            return (
                f"(CASE WHEN {go(n[1])} <> 0.0 THEN {go(n[2])} "
                f"ELSE {go(n[3])} END)"
            )
        assert kind == "call"
        fn, args = n[1], [go(a) for a in n[2]]
        if fn == "min":
            return f"least({args[0]}, {args[1]})"
        if fn == "max":
            return f"greatest({args[0]}, {args[1]})"
        if fn == "pow":
            return f"pow({args[0]}, {args[1]})"
        if fn == "floor":
            return f"(floor({args[0]})::DOUBLE)"
        if fn == "ceil":
            return f"(ceil({args[0]})::DOUBLE)"
        if fn == "sqrt":  # domain edges -> NULL, same as the Column backend
            return f"(CASE WHEN {args[0]} >= 0.0 THEN sqrt({args[0]}) END)"
        if fn in ("ln", "log10"):
            return f"(CASE WHEN {args[0]} > 0.0 THEN {fn}({args[0]}) END)"
        return f"{fn}({args[0]})"  # abs

    return go(parse_expression(src))
