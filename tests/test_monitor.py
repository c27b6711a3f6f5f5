"""Monitor / percolator (operators/monitor.py) — lucene/monitor analog:
reverse search with trigger-term pruning, one-pass mapInPandas."""

from __future__ import annotations

import pytest

from lucene_solr_spark.operators.monitor import Monitor, _matches, _triggers

DOCS = [
    (1, "the big data merge pipeline"),
    (2, "spark merge order"),
    (3, "batch order processing"),
    (4, "nothing relevant here"),
    (5, "data big merge"),          # phrase 'big data' must NOT match
    (6, "big data big data spark"),
]


def _percolate(spark, queries):
    docs = spark.createDataFrame(DOCS, "doc_id long, content string")
    out = Monitor(queries).match(docs).collect()
    res: dict[str, set[int]] = {}
    for r in out:
        res.setdefault(r["query_id"], set()).add(int(r["doc_id"]))
    return res


def test_query_shapes(spark):
    res = _percolate(spark, [
        ("term", "merge"),
        ("conj", "+merge +spark"),
        ("phrase", '"big data"'),
        ("disj", "order batch"),
        ("neg", "merge -spark"),
    ])
    assert res["term"] == {1, 2, 5}
    assert res["conj"] == {2}
    assert res["phrase"] == {1, 6}
    assert res["disj"] == {2, 3}
    assert res["neg"] == {1, 5}


def test_sloppy_phrase_and_msm(spark):
    res = _percolate(spark, [
        ("sloppy", '"big merge"~2'),       # doc 5: big . merge (1 gap)
        ("msm", "(merge order spark)~2"),  # >=2 of 3
    ])
    assert 5 in res.get("sloppy", set())
    assert res["msm"] == {2}


def test_trigger_pruning_is_lossless(spark):
    # a MUST-gated query triggers on one clause only, yet matching is exact
    mon = Monitor([("q", "+merge +spark")])
    trig = set(mon.trigger_index)
    assert trig in ({"merge"}, {"spark"}) and not mon.always
    # pure negation has no positive trigger -> always-candidate
    mon2 = Monitor([("q2", "-merge")])
    assert "q2" in mon2.always


def test_multi_term_leaves_percolate(spark):
    # MultiTermQuery leaves match per-doc (CONSTANT_SCORE-over-doc-tokens
    # rewrite): wildcard / fuzzy (OSA, FuzzyQuery's default) / term range
    res = _percolate(spark, [
        ("w", "mer*"),                 # prefix wildcard
        ("wq", "b?tch"),               # single-char wildcard
        ("fz", "merge~1"),             # 'merge' within 1 edit
        ("rg", "[bata TO bigg]"),      # range: 'batch'/'big' inside
        ("gated", "+spark mer*"),      # wildcard under a MUST gate
        ("conj", "+spark +mer*"),      # wildcard REQUIRED
    ])
    assert res["w"] == {1, 2, 5}
    assert res["wq"] == {3}
    assert res["fz"] == {1, 2, 5}      # 'merge' itself (d=0)
    assert res["rg"] == {1, 3, 5, 6}   # batch(3), big(1,5,6)
    # SHOULD beside a MUST is optional (pure booster) -> spark docs match
    assert res["gated"] == {2, 6}
    assert res["conj"] == {2}
    # pattern leaves contribute no trigger: pure-pattern queries are
    # always-candidates, gated ones still prune on the exact term
    mon = Monitor([("w", "mer*"), ("gated", "+spark mer*")])
    assert "w" in mon.always and "gated" not in mon.always
    assert set(mon.trigger_index) == {"spark"}


def test_required_pattern_with_should_terms_is_always_candidate(spark):
    # code-review regression: '+mer* spark' must NOT be gated on the
    # optional 'spark' — the required pattern can match docs without it
    res = _percolate(spark, [("q", "+mer* order")])
    assert res["q"] == {1, 2, 5}  # every mer* doc, with or without 'order'
    mon = Monitor([("q", "+mer* order")])
    assert "q" in mon.always  # ungateable, not gated on the SHOULD term


def test_field_scoped_multi_term_raises(spark):
    with pytest.raises(ValueError, match="field-scoped"):
        Monitor([("w", "title:mer*")])


def test_pure_negative_query_matches_nothing(spark):
    # Lucene Monitor semantics: a BooleanQuery whose only clauses are
    # must_not matches NO document, at any nesting depth (ADVICE r03 —
    # previously '-merge' percolated as matching every doc lacking it)
    res = _percolate(spark, [("neg", "-merge"), ("pos", "batch")])
    assert "neg" not in res
    assert res["pos"] == {3}


def test_nested_pure_negative_clause():
    # the nested pure-negative never matches -> the conjunction fails
    from lucene_solr_spark.operators.monitor import Bool, Term

    node = Bool(
        must=(Term("spark"), Bool(must_not=(Term("merge"),))),
    )
    toks = ["spark", "rocks"]
    assert _matches(node, toks, set(toks)) is False
