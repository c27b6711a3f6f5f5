"""Index-time SynonymGraphFilter — graph injection, lossless phrase match.

Reference semantics (SURVEY.md §2.H "SynonymGraphFilter"):
  analysis/synonym/SynonymGraphFilter.java, SolrSynonymParser.java.
Where Lucene flattens (FlattenGraphFilter) and loses multi-token synonym
phrases, this engine stores token-graph edges (pos_bin starts + end_bin
ends) and matches phrases by path-chaining — see functions/synonyms.py and
phrase.py#_exact_freqs_graph."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions.synonyms import (
    SynonymRules,
    apply_synonym_graph,
    parse_synonym_rules,
)
from lucene_solr_spark.functions.smallfloat import int_to_byte4
from lucene_solr_spark.operators.indexer import build_index
from lucene_solr_spark.operators.phrase import phrase_topk

DOCS = [
    ("the new york subway is fast and the new york subway is crowded", 1),
    ("ny subway map of the ny region", 2),
    ("new jersey subway line", 3),
    ("a york subway new line", 4),
    ("united states metro systems", 5),
    ("usa metro report", 6),
]

RULES = parse_synonym_rules(["new york, ny", "usa, united states"])


def _mk_corpus(spark):
    rows = [
        ("r", f"d{i}.txt", "c0", "text", content, i)
        for content, i in DOCS
    ]
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string, doc_id long"
    )


@pytest.fixture(scope="module")
def seg_syn(spark):
    return build_index(
        spark,
        _mk_corpus(spark),
        out_dir=None,
        bucket_docs=4,  # force multiple buckets
        with_positions=True,
        synonyms=RULES,
    )


# ---------- pure-unit: parser + graph construction ----------

def test_parser_explicit_and_equivalence():
    r = parse_synonym_rules(["a b => c", "x, y z", "# comment", ""])
    assert ("a", "b") in {inp for inp, _ in r.by_first["a"]}
    # equivalence: every member maps to all members
    outs_x = dict(r.by_first["x"])[("x",)]
    assert set(outs_x) == {("x",), ("y", "z")}
    outs_y = dict(r.by_first["y"])[("y", "z")]
    assert set(outs_y) == {("x",), ("y", "z")}


def test_graph_contraction_edges():
    t, s, e = apply_synonym_graph("the new york subway".split(), RULES)
    edges = dict(zip(t, zip(s.tolist(), e.tolist())))
    assert edges["ny"] == (1, 3)       # spans the input region
    assert edges["subway"] == (3, 4)   # chains off the contraction's end
    assert edges["new"] == (1, 2) and edges["york"] == (2, 3)  # originals kept


def test_graph_expansion_fresh_nodes():
    t, s, e = apply_synonym_graph("ny here".split(), RULES)
    trip = list(zip(t, s.tolist(), e.tolist()))
    new_edge = next(x for x in trip if x[0] == "new")
    york_edge = next(x for x in trip if x[0] == "york")
    assert new_edge[1] == 0 and york_edge[2] == 1      # spans input token
    assert new_edge[2] == york_edge[1] > 2              # fresh internal node
    assert ("ny", 0, 1) in trip                          # original path kept


def test_replacement_rule_drops_original():
    r = parse_synonym_rules(["new york => ny"])
    t, _, _ = apply_synonym_graph("new york subway".split(), r)
    assert "new" not in t and "york" not in t and "ny" in t


# ---------- engine end-to-end ----------

def _hits(df):
    return {int(r["doc_id"]): float(r["score"]) for r in df.collect()}


def test_phrase_across_contraction(spark, seg_syn):
    # the verdict's headline case: "ny subway" finds the "new york subway" doc
    hits = _hits(phrase_topk(spark, seg_syn, "ny subway", k=10))
    assert set(hits) == {1, 2}


def test_phrase_across_expansion(spark, seg_syn):
    # reverse direction: literal phrase finds the contracted doc
    hits = _hits(phrase_topk(spark, seg_syn, "new york subway", k=10))
    assert set(hits) == {1, 2}


def test_phrase_single_token_equivalence(spark, seg_syn):
    hits = _hits(phrase_topk(spark, seg_syn, "usa metro", k=10))
    assert set(hits) == {5, 6}


def test_unrelated_phrase_unaffected(spark, seg_syn):
    hits = _hits(phrase_topk(spark, seg_syn, "york subway", k=10))
    assert set(hits) == {1, 2, 4}


def test_phrase_freq_counts_paths(spark, seg_syn):
    # doc 1 has TWO "new york subway" occurrences -> freq 2 -> higher score
    # than doc 2's single graph path at equal idf (norms differ; just check
    # doc 1 scores strictly higher than it would with freq 1 by comparing
    # against doc 2 ordering)
    df = phrase_topk(spark, seg_syn, "ny subway", k=10)
    rows = df.collect()
    assert rows[0]["doc_id"] == 1  # two occurrences dominate


def test_norms_discount_overlaps(spark, seg_syn):
    # byte4 norm must count ORIGINAL tokens only (discountOverlaps):
    # doc 6 "usa metro report" -> 3 tokens even though 'united states' was
    # injected alongside 'usa'
    norms = seg_syn.table(spark, "norms")
    row = norms.filter(F.col("doc_id") == 6).collect()[0]
    assert int(row["norm_byte"]) == int_to_byte4(3)


def test_postings_include_injected_terms(spark, seg_syn):
    terms = seg_syn.table(spark, "terms")
    dfs = {
        r["term"]: int(r["df"])
        for r in terms.filter(F.col("term").isin("ny", "united", "states")).collect()
    }
    assert dfs["ny"] == 2      # doc 1 (injected, x2 occurrences -> df 1) + doc 2
    assert dfs["united"] == 2  # doc 5 literal + doc 6 injected
    assert dfs["states"] == 2


def test_qparser_phrase_on_graph_index(spark, seg_syn):
    # classic-syntax phrase through the real tree scorer (Searcher.search)
    from lucene_solr_spark.operators.search import Searcher

    s = Searcher(spark, seg_syn)
    hits = _hits(s.search('"ny subway"', k=10))
    assert set(hits) == {1, 2}
    # Boolean tree mixing a graph phrase with a term clause
    hits = _hits(s.search('"ny subway" AND crowded', k=10))
    assert set(hits) == {1}


def test_qparser_phrase_with_fq_on_graph_index(spark, seg_syn):
    # fq rides the positions cogroup slot; the marker rows must match the
    # graph schema (end_bin column) — exercises search.py#_markers
    from lucene_solr_spark.operators.search import Searcher

    s = Searcher(spark, seg_syn)
    hits = _hits(s.search('"ny subway"', k=10, fq="path = 'd2.txt'"))
    assert set(hits) == {2}


def test_merge_preserves_graph(spark, seg_syn):
    # two synonym segments merged -> phrase still matches across the graph
    from lucene_solr_spark.operators.merge import merge_segments

    rows2 = [("r", "e1.txt", "c0", "text", "riding the ny subway daily", 100)]
    extra = spark.createDataFrame(
        rows2,
        "repo string, path string, commit string, lang string, content string, doc_id long",
    )
    seg2 = build_index(
        spark, extra, out_dir=None, bucket_docs=4, with_positions=True,
        synonyms=RULES,
    )
    merged = merge_segments(spark, [seg_syn, seg2], out_dir=None)
    assert "end_bin" in merged.table(spark, "positions").columns
    res = phrase_topk(spark, merged, "new york subway", k=10)
    # doc ids are remapped; just assert 3 hits survive (docs 1, 2, new one)
    assert res.count() == 3


def test_multisearcher_graph_phrase(spark, seg_syn):
    # two synonym segments under scatter-gather: graph phrases match with
    # global stats, same doc set as the merged view
    from lucene_solr_spark.operators.search import MultiSearcher

    rows2 = [("r", "e1.txt", "c0", "text", "riding the ny subway daily", 100)]
    extra = spark.createDataFrame(
        rows2,
        "repo string, path string, commit string, lang string, content string, doc_id long",
    )
    seg2 = build_index(
        spark, extra, out_dir=None, bucket_docs=4, with_positions=True,
        synonyms=RULES,
    )
    ms = MultiSearcher(spark, [seg_syn, seg2])
    res = ms.search('"new york subway"', k=10).collect()
    assert len(res) == 3  # docs 1, 2 and the extra segment's doc


def test_plain_index_unchanged(spark, seg_syn):
    # a no-synonym build of the same corpus has no end_bin column
    plain = build_index(
        spark, _mk_corpus(spark), out_dir=None, bucket_docs=4, with_positions=True
    )
    assert "end_bin" not in plain.table(spark, "positions").columns
    assert "end_bin" in seg_syn.table(spark, "positions").columns
    # and the no-graph phrase result still works through the same kernel
    hits = _hits(phrase_topk(spark, plain, "ny subway", k=10))
    assert set(hits) == {2}
