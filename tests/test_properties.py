"""Property-based invariants (hypothesis) over the pure kernels: packing
round-trips, OSA distance metric laws, the edismax mm-spec grammar, the
additive-trees compiler, and the polygon crossing test — plus a plan guard
for the edismax kernel (pushed filters, one Exchange, TakeOrdered)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_spark.functions.packing import (
    delta_decode,
    delta_encode,
    pack_ints,
    unpack_ints,
)
from lucene_solr_spark.operators.edismax import calculate_mm
from lucene_solr_spark.operators.search import osa_distance

# ---------------------------------------------------------------------------
# FOR packing round-trip: any sorted uint sequence survives
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=0, max_size=300)
)
def test_pack_roundtrip_sorted(xs):
    arr = np.sort(np.asarray(xs, dtype=np.uint64))
    assert np.array_equal(unpack_ints(pack_ints(arr)), arr)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**31), min_size=1, max_size=200)
)
def test_delta_roundtrip_sorted(xs):
    arr = np.sort(np.asarray(xs, dtype=np.uint64))
    assert np.array_equal(
        delta_decode(unpack_ints(pack_ints(delta_encode(arr)))).astype(np.uint64),
        arr,
    )


# ---------------------------------------------------------------------------
# OSA distance: metric-ish laws + agreement with plain Levenshtein bound
# ---------------------------------------------------------------------------

_words = st.text(alphabet="abcdef", min_size=0, max_size=8)


@settings(max_examples=300, deadline=None)
@given(_words, _words)
def test_osa_symmetry_and_identity(a, b):
    assert osa_distance(a, a) == 0
    assert osa_distance(a, b) == osa_distance(b, a)
    assert osa_distance(a, b) >= abs(len(a) - len(b))


@settings(max_examples=200, deadline=None)
@given(_words)
def test_osa_single_edit_is_one(w):
    if w:
        assert osa_distance(w, w[:-1]) == 1  # deletion
        assert osa_distance(w, w + "z") == 1  # insertion
    if len(w) >= 2 and w[0] != w[1]:
        swapped = w[1] + w[0] + w[2:]
        assert osa_distance(w, swapped) == 1  # adjacent transposition


# ---------------------------------------------------------------------------
# mm spec grammar: result always in [0, n]; negative/percent identities
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=40), st.integers(min_value=-10, max_value=10))
def test_mm_int_clamped(n, v):
    got = calculate_mm(str(v), n)
    assert 0 <= got <= n
    if 0 <= v <= n:
        assert got == v
    if v < 0:
        assert got == max(0, n + v)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=40), st.integers(min_value=0, max_value=100))
def test_mm_percent_truncates(n, pct):
    assert calculate_mm(f"{pct}%", n) == (n * pct) // 100
    assert calculate_mm(f"-{pct}%", n) == n - (n * pct) // 100


# ---------------------------------------------------------------------------
# additive-trees compiler: Column and SQL agree with a scalar walk on
# random models and feature vectors (duckdb evaluates the SQL)
# ---------------------------------------------------------------------------


@st.composite
def _tree(draw, depth=0):
    if depth >= 2 or draw(st.booleans()):
        return {"value": draw(st.integers(-20, 20)) / 4.0}
    return {
        "feature": draw(st.sampled_from(["a", "b"])),
        "threshold": draw(st.integers(-5, 15)) * 1.0,
        "left": draw(_tree(depth + 1)),
        "right": draw(_tree(depth + 1)),
    }


def _walk(node, feats):
    if "value" in node:
        return node["value"]
    branch = "left" if feats[node["feature"]] <= node["threshold"] else "right"
    return _walk(node[branch], feats)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(_tree(), min_size=1, max_size=3),
    st.integers(-10, 20),
    st.integers(-10, 20),
)
def test_trees_sql_matches_scalar(roots, a, b):
    import duckdb

    from lucene_solr_spark.operators.ltr import trees_score_sql

    trees = [{"weight": 1.0 + i * 0.5, "root": r} for i, r in enumerate(roots)]
    sql = trees_score_sql(trees, {"a": "a", "b": "b"})
    got = duckdb.sql(
        f"SELECT {sql} AS s FROM (SELECT {a} AS a, {b} AS b)"
    ).fetchone()[0]
    want = sum(
        (1.0 + i * 0.5) * _walk(r, {"a": a, "b": b}) for i, r in enumerate(roots)
    )
    assert abs(got - want) < 1e-9


# ---------------------------------------------------------------------------
# edismax plan guard: pushed term filters on every scan, exactly one
# bucket Exchange, TakeOrderedAndProject on top — the shape that holds
# at 1000 executors
# ---------------------------------------------------------------------------


def test_edismax_plan_shape(spark, tmp_path):
    from lucene_solr_spark.corpus import synth_corpus
    from lucene_solr_spark.operators.edismax import edismax_topk
    from lucene_solr_spark.operators.indexer import assign_doc_ids, build_index

    c = assign_doc_ids(synth_corpus(spark, 60, partitions=2), ["repo", "path", "commit"])
    # on-disk segment: the guard checks PARQUET scan pushdown
    seg = build_index(
        spark, c, out_dir=str(tmp_path), bucket_docs=32, with_positions=True
    )
    df = edismax_topk(
        spark, {"body": seg},
        {"q": "import return", "qf": "body", "mm": "2", "pf": "body"},
        k=5,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange") == 1, plan  # the single bucket shuffle
    assert "PushedFilters: [In(term" in plan, plan

# ---------------------------------------------------------------------------
# Surround grammar round-trip: random span trees rendered to surround
# syntax must parse back to the IDENTICAL tree (QueryParser.jj inverse).
# ---------------------------------------------------------------------------

_TERMS = ["alpha", "beta", "gamma", "delta", "eps"]


@st.composite
def _span_tree(draw, depth=0):
    from lucene_solr_spark.operators.spans import (
        SpanNear,
        SpanNot,
        SpanOr,
        SpanTerm,
    )

    if depth >= 3 or draw(st.booleans()):
        return SpanTerm(draw(st.sampled_from(_TERMS)))
    kind = draw(st.sampled_from(["w", "n", "or", "not"]))
    if kind == "not":
        return SpanNot(
            draw(_span_tree(depth=depth + 1)), draw(_span_tree(depth=depth + 1))
        )
    n = draw(st.integers(2, 3))
    clauses = tuple(draw(_span_tree(depth=depth + 1)) for _ in range(n))
    if kind == "or":
        return SpanOr(clauses)
    dist = draw(st.integers(1, 9))
    return SpanNear(clauses, slop=dist - 1, in_order=(kind == "w"))


def _render(node) -> str:
    from lucene_solr_spark.operators.spans import (
        SpanNear,
        SpanNot,
        SpanOr,
        SpanTerm,
    )

    if isinstance(node, SpanTerm):
        return node.term
    if isinstance(node, SpanOr):
        return "OR(" + ", ".join(_render(c) for c in node.clauses) + ")"
    if isinstance(node, SpanNot):
        return f"NOT({_render(node.include)}, {_render(node.exclude)})"
    assert isinstance(node, SpanNear)
    op = "W" if node.in_order else "N"
    return (
        f"{node.slop + 1}{op}("
        + ", ".join(_render(c) for c in node.clauses)
        + ")"
    )


@given(_span_tree())
@settings(max_examples=200, deadline=None)
def test_surround_render_parse_roundtrip(tree):
    from lucene_solr_spark.operators.surround import parse_surround

    assert parse_surround(_render(tree)) == tree
