"""Round-4 operators: topic stream (crash/resume exactly-once), query-time
synonym expansion (IR shape + match-set parity with the index-time graph),
additive-trees LTR compiler, point-in-polygon crossing test."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions.analysis import tokenize_text
from lucene_solr_spark.functions.synonyms import (
    expand_query_synonyms,
    parse_synonym_rules,
)
from lucene_solr_spark.operators.indexer import build_index
from lucene_solr_spark.operators.query import Bool, Phrase, Synonym, Term

# ---------------------------------------------------------------------------
# topic stream
# ---------------------------------------------------------------------------


def _mk_docs(spark, ids):
    rows = [("r", f"t{i}.txt", "c0", "text", f"doc number {i} spark", i) for i in ids]
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, content string, doc_id long",
    )


def test_topic_stream_exactly_once_across_restart(spark, tmp_path):
    from lucene_solr_spark.sources.catalog import Catalog
    from lucene_solr_spark.streaming.topic import TopicStream

    root = str(tmp_path / "cat")
    cat = Catalog(root)
    build_index(spark, _mk_docs(spark, range(10)), out_dir=root, segment_id="s0")
    cat.commit_swap(add=["s0"])
    ckpt = str(tmp_path / "ckpt.json")

    got1 = TopicStream(cat, ckpt).drain(spark)
    ids1 = {int(r["doc_id"]) for r in got1.collect()}
    assert ids1 == set(range(10))

    # "crash": the consumer object is gone; a NEW instance resumes from
    # the checkpoint file. Nothing new committed -> empty drain.
    assert TopicStream(cat, ckpt).drain(spark).count() == 0

    build_index(
        spark, _mk_docs(spark, range(100, 105)), out_dir=root, segment_id="s1"
    )
    cat.commit_swap(add=["s1"])
    got2 = TopicStream(cat, ckpt).drain(spark)
    ids2 = {int(r["doc_id"]) for r in got2.collect()}
    assert ids2 == set(range(100, 105))
    # exactly once across the restart: the union covers each doc once
    assert ids1 & ids2 == set()


def test_topic_stream_midcrash_redelivers(spark, tmp_path):
    """A consumer that dies BEFORE its checkpoint write (simulated by
    never calling drain to completion — we peek pending_segments only)
    loses nothing: the next consumer delivers the full batch."""
    from lucene_solr_spark.sources.catalog import Catalog
    from lucene_solr_spark.streaming.topic import TopicStream

    root = str(tmp_path / "cat2")
    cat = Catalog(root)
    build_index(spark, _mk_docs(spark, range(7)), out_dir=root, segment_id="s0")
    cat.commit_swap(add=["s0"])
    ckpt = str(tmp_path / "ckpt2.json")
    # reader crashed mid-batch: it saw the pending set but never committed
    assert len(TopicStream(cat, ckpt).pending_segments()) == 1
    assert not os.path.exists(ckpt)
    assert TopicStream(cat, ckpt).drain(spark).count() == 7


def test_topic_stream_excludes_tombstones(spark, tmp_path):
    from lucene_solr_spark.sources.catalog import Catalog
    from lucene_solr_spark.streaming.topic import TopicStream

    root = str(tmp_path / "cat3")
    cat = Catalog(root)
    seg = build_index(
        spark, _mk_docs(spark, range(6)), out_dir=root, segment_id="s0"
    )
    cat.commit_swap(add=["s0"])
    cat.add_deletes(
        spark.createDataFrame(
            [(seg.segment_id, 2), (seg.segment_id, 4)],
            "segment_id string, doc_id long",
        )
    )
    got = TopicStream(cat, str(tmp_path / "c.json")).drain(spark)
    assert {int(r["doc_id"]) for r in got.collect()} == {0, 1, 3, 5}


# ---------------------------------------------------------------------------
# query-time synonym expansion
# ---------------------------------------------------------------------------

QT_RULES = parse_synonym_rules(["spark, big data", "new york, ny", "fast => quick"])


def test_expand_ir_shapes():
    # single token with a multi-token alternative
    node = expand_query_synonyms(["spark"], QT_RULES)
    assert isinstance(node, Bool) and len(node.should) == 2
    kinds = {type(c) for c in node.should}
    assert kinds == {Term, Phrase}
    # multi-token input contracts to a Synonym-free OR of term+phrase
    node = expand_query_synonyms(["new", "york"], QT_RULES)
    assert isinstance(node, Bool)
    assert {type(c) for c in node.should} == {Term, Phrase}
    assert Term("ny") in node.should
    # replacement rule: single-single -> plain Term swap
    assert expand_query_synonyms(["fast"], QT_RULES) == Term("quick")
    # unmatched tokens stay terms; multi-site query ORs the sites
    node = expand_query_synonyms(["fast", "merge"], QT_RULES)
    assert isinstance(node, Bool) and Term("merge") in node.should


def test_single_token_equivalents_become_synonym_leaf():
    r = parse_synonym_rules(["usa, united"])  # two single-token members
    node = expand_query_synonyms(["usa"], r)
    assert node == Synonym(("united", "usa"))


def test_query_time_matches_index_time_set(spark):
    """Match-set parity: query-time expansion on a PLAIN index finds the
    same docs as the index-time graph does for the equivalent phrase
    query (scores differ by collection stats — that's expected)."""
    from lucene_solr_spark.operators.phrase import phrase_topk
    from lucene_solr_spark.operators.search import Searcher

    docs = [
        ("spark pipelines are neat", 0),
        ("big data pipelines", 1),
        ("big spark data", 2),          # no bigram, has spark
        ("nothing relevant", 3),
        ("big data and spark", 4),
    ]
    rows = [("r", f"q{i}.txt", "c0", "text", c, i) for c, i in docs]
    df = spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, content string, doc_id long",
    )
    rules = parse_synonym_rules(["spark, big data"])
    plain = build_index(spark, df, out_dir=None, with_positions=True)
    graph = build_index(
        spark, df, out_dir=None, with_positions=True, synonyms=rules
    )
    qt = Searcher(spark, plain).search_synonyms("spark", rules, k=10)
    it = phrase_topk(spark, graph, "big data", k=10)
    qt_ids = {int(r["doc_id"]) for r in qt.collect()}
    it_ids = {int(r["doc_id"]) for r in it.collect()}
    assert qt_ids == it_ids == {0, 1, 2, 4}


# ---------------------------------------------------------------------------
# additive-trees LTR compiler
# ---------------------------------------------------------------------------

_MODEL = [
    {"weight": 1.0, "root": {
        "feature": "a", "threshold": 5.0,
        "left": {"value": 1.0},
        "right": {"feature": "b", "threshold": 0.0,
                  "left": {"value": 2.0}, "right": {"value": 4.0}}}},
    {"weight": 0.5, "root": {"value": 10.0}},
]


def _scalar_trees(a, b):
    t1 = 1.0 if a <= 5.0 else (2.0 if b <= 0.0 else 4.0)
    return 1.0 * t1 + 0.5 * 10.0


@pytest.mark.parametrize("a,b", [(3, -1), (3, 1), (7, 0), (7, 2), (5, 9)])
def test_trees_column_and_sql_agree(spark, a, b):
    from lucene_solr_spark.operators.ltr import trees_score_col, trees_score_sql

    df = spark.createDataFrame([(a, b)], "a int, b int")
    got = df.select(
        trees_score_col(
            _MODEL, {"a": F.col("a"), "b": F.col("b")}
        ).alias("s")
    ).collect()[0]["s"]
    sql = trees_score_sql(_MODEL, {"a": "a", "b": "b"})
    want_sql = duckdb.sql(
        f"SELECT {sql} AS s FROM (SELECT {a} AS a, {b} AS b)"
    ).fetchone()[0]
    assert got == want_sql == _scalar_trees(a, b)


# ---------------------------------------------------------------------------
# point-in-polygon (crossing number, non-convex)
# ---------------------------------------------------------------------------


def _scalar_inside(lat, lon, poly):
    inside = False
    n = len(poly)
    for i in range(n):
        (y1, x1), (y2, x2) = poly[i], poly[(i + 1) % n]
        if (y1 > lat) != (y2 > lat):
            xint = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
            if lon < xint:
                inside = not inside
    return inside


def test_polygon_crossing_matches_reference(spark):
    from lucene_solr_spark.plans.coverage5_queries import (
        _POLY,
        _poly_inside_col,
        _poly_inside_sql,
    )

    pts = [
        (10.0, 10.0, True),    # deep inside the corner block
        (30.0, 10.0, True),    # inside the vertical arm
        (10.0, 30.0, True),    # inside the horizontal arm
        (30.0, 30.0, False),   # the reflex notch — non-convexity probe
        (50.0, 10.0, False),
        (-5.0, 5.0, False),
        (16.0, 15.0, True),    # just past the notch corner, still in arm
    ]
    for lat, lon, want in pts:
        assert _scalar_inside(lat, lon, _POLY) is want, (lat, lon)
    df = spark.createDataFrame(
        [(la, lo) for la, lo, _ in pts], "lat double, lon double"
    )
    got = [
        bool(r["i"])
        for r in df.select(
            _poly_inside_col(F.col("lat"), F.col("lon")).alias("i")
        ).collect()
    ]
    assert got == [w for _, _, w in pts]
    sql = _poly_inside_sql()
    duck = [
        bool(
            duckdb.sql(
                f"SELECT ({sql}) AS i FROM (SELECT {la} AS lat, {lo} AS lon)"
            ).fetchone()[0]
        )
        for la, lo, _ in pts
    ]
    assert duck == [w for _, _, w in pts]


def test_polygon_random_points_vs_scalar(spark):
    from lucene_solr_spark.plans.coverage5_queries import (
        _POLY,
        _poly_inside_col,
    )

    rng = np.random.RandomState(7)
    pts = [(float(a), float(b)) for a, b in rng.uniform(-10, 50, size=(200, 2))]
    df = spark.createDataFrame(pts, "lat double, lon double")
    got = {
        (r["lat"], r["lon"]): bool(r["i"])
        for r in df.select(
            "lat", "lon",
            _poly_inside_col(F.col("lat"), F.col("lon")).alias("i"),
        ).collect()
    }
    for la, lo in pts:
        assert got[(la, lo)] == _scalar_inside(la, lo, _POLY), (la, lo)


def test_topic_stream_absorbs_merged_segments(spark, tmp_path):
    """Code-review regression: a compaction product of fully-delivered
    segments must NOT redeliver (checkpoint advances over the merge)."""
    from lucene_solr_spark.operators.merge import merge_segments
    from lucene_solr_spark.sources.catalog import Catalog
    from lucene_solr_spark.streaming.topic import TopicStream

    root = str(tmp_path / "cat4")
    cat = Catalog(root)
    build_index(spark, _mk_docs(spark, range(5)), out_dir=root, segment_id="s0")
    cat.commit_swap(add=["s0"])
    build_index(spark, _mk_docs(spark, range(10, 14)), out_dir=root, segment_id="s1")
    cat.commit_swap(add=["s1"])
    ckpt = str(tmp_path / "c4.json")
    assert TopicStream(cat, ckpt).drain(spark).count() == 9

    merge_segments(spark, cat.segments(), catalog=cat)
    # the merged segment's lineage is fully delivered -> absorbed, 0 docs
    got = TopicStream(cat, ckpt).drain(spark)
    assert got.count() == 0
    # and the empty result keeps the full drain schema (columns honored)
    got2 = TopicStream(cat, ckpt).drain(spark, columns=["content"])
    assert got2.columns[:2] == ["doc_id", "segment_id"]
    assert "content" in got2.columns and got2.count() == 0
    # genuinely new docs after the merge still arrive exactly once
    build_index(spark, _mk_docs(spark, range(20, 23)), out_dir=root, segment_id="s2")
    cat.commit_swap(add=["s2"])
    ids = {int(r["doc_id"]) for r in TopicStream(cat, ckpt).drain(spark).collect()}
    assert ids == {20, 21, 22}
