"""Expression compiler (functions/expressions.py) — grammar, precedence,
error handling, and Column-vs-SQL backend parity evaluated through
DuckDB on concrete rows (the JavascriptCompiler analog must produce the
same doubles from both backends)."""

from __future__ import annotations

import duckdb
import pytest

from lucene_solr_spark.functions.expressions import (
    ExpressionError,
    compile_sql,
    parse_expression,
)

SQL_BIND = {"x": "t.x", "y": "t.y"}


def _eval_sql(src: str, x: float, y: float) -> float:
    e = compile_sql(src, SQL_BIND)
    return duckdb.sql(
        f"SELECT {e} AS v FROM (SELECT {x}::DOUBLE AS x, {y}::DOUBLE AS y) t"
    ).fetchone()[0]


@pytest.mark.parametrize(
    "src,x,y,want",
    [
        ("1 + 2 * 3", 0, 0, 7.0),                 # precedence
        ("(1 + 2) * 3", 0, 0, 9.0),
        ("2 * x + y", 3, 4, 10.0),
        ("-x + 1", 5, 0, -4.0),
        ("10 - 4 - 3", 0, 0, 3.0),                # left assoc
        ("16 / 4 / 2", 0, 0, 2.0),
        ("7 % 4", 0, 0, 3.0),
        ("sqrt(x)", 16, 0, 4.0),
        ("ln(1)", 0, 0, 0.0),
        ("log10(1000)", 0, 0, 3.0),
        ("abs(x - y)", 2, 9, 7.0),
        ("min(x, y) + max(x, y)", 3, 8, 11.0),
        ("pow(x, 3)", 2, 0, 8.0),
        ("floor(2.7) + ceil(2.2)", 0, 0, 5.0),
        ("x > 3 ? 10 : 20", 5, 0, 10.0),          # ternary + compare
        ("x > 3 ? 10 : 20", 2, 0, 20.0),
        ("x == y", 4, 4, 1.0),                    # compare -> 1.0/0.0
        ("x != y", 4, 4, 0.0),
        ("x >= 2 ? x <= 8 ? 1 : 2 : 3", 5, 0, 1.0),  # nested ternary
    ],
)
def test_sql_backend_semantics(src, x, y, want):
    assert _eval_sql(src, x, y) == pytest.approx(want, abs=0)


@pytest.mark.parametrize(
    "bad",
    [
        "", "1 +", "foo(1)", "sqrt(1, 2)", "min(1)", "pow(1)",
        "x ? 1", "(1 + 2", "1 2", "@x", "unbound_name_is_parse_ok_only",
    ],
)
def test_errors(bad):
    with pytest.raises(ExpressionError):
        if bad == "unbound_name_is_parse_ok_only":
            compile_sql("zz + 1", SQL_BIND)  # unbound variable
        else:
            compile_sql(bad, SQL_BIND)


def test_parse_is_pure_ast():
    assert parse_expression("1 + x") == ("bin", "+", ("num", 1.0), ("var", "x"))


def test_backend_parity_via_spark(spark):
    """The SAME source compiled by both backends agrees on concrete rows
    (driver row expression_sort_topk pins this over the corpus; this is
    the randomized-ish local pin over awkward values)."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.functions.expressions import compile_column

    rows = [(float(i), float(j)) for i in range(0, 20, 3) for j in (1.0, 2.5, 7.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    src = "sqrt(x + 1) * 2 + (x > y ? ln(y + 1) : -y) + pow(y, 2) % 5"
    col = compile_column(src, {"x": F.col("x"), "y": F.col("y")})
    got = [
        r["v"]
        for r in df.select(F.round(col, 9).alias("v")).orderBy("x", "y").collect()
    ]
    e = compile_sql(src, SQL_BIND)
    vals = ", ".join(f"({x}::DOUBLE, {y}::DOUBLE)" for x, y in sorted(rows))
    want = [
        r[0]
        for r in duckdb.sql(
            f"SELECT round({e}, 9) FROM (VALUES {vals}) t(x, y) ORDER BY t.x, t.y"
        ).fetchall()
    ]
    assert got == want


@pytest.mark.parametrize(
    "src,x", [("ln(x)", 0.0), ("ln(x)", -1.0), ("log10(x)", 0.0), ("sqrt(x)", -4.0)],
)
def test_domain_edges_are_null_on_both_backends(spark, src, x):
    """ln/log10 of x<=0 and sqrt of x<0 pin to NULL on BOTH backends —
    DuckDB must not abort and Spark must not emit NaN."""
    assert _eval_sql(src, x, 0.0) is None
    from pyspark.sql import functions as F

    from lucene_solr_spark.functions.expressions import compile_column

    df = spark.createDataFrame([(float(x),)], "x double")
    col = compile_column(src, {"x": F.col("x")})
    assert df.select(col.alias("v")).collect()[0]["v"] is None
