"""Field-scoped search (FieldedSearcher) — per-field segments, classic
``field:clause`` syntax, tagged-term kernel.

Parity contracts:
- a single fielded leaf is bit-identical to that field's single-field path
- cross-field Boolean combos accumulate float32 in clause order, checked
  against sums of the per-field full rankings
- guards: unknown field, fielded query on a plain Searcher
"""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_spark.corpus import synth_corpus
from lucene_solr_spark.operators.fields import FieldedSearcher
from lucene_solr_spark.operators.indexer import assign_doc_ids, build_index
from lucene_solr_spark.operators.phrase import phrase_topk
from lucene_solr_spark.operators.query import Bool, Phrase, Term
from lucene_solr_spark.operators.search import Searcher

from .oracle import tokenize

N_DOCS = 150
TITLE_TOKENS = 8


@pytest.fixture(scope="module")
def corpus(spark):
    c = synth_corpus(spark, N_DOCS, partitions=4)
    return assign_doc_ids(c, ["repo", "path", "commit"]).persist()


@pytest.fixture(scope="module")
def built(spark, corpus):
    body = build_index(
        spark, corpus, out_dir=None, bucket_docs=64, with_positions=True
    )
    rows = corpus.select(
        "doc_id", "repo", "path", "commit", "lang", "content"
    ).collect()
    tdf = spark.createDataFrame(
        [
            (r["doc_id"], r["repo"], r["path"], r["commit"], r["lang"],
             " ".join(tokenize(r["content"])[:TITLE_TOKENS]))
            for r in rows
        ],
        "doc_id long, repo string, path string, commit string, lang string, content string",
    )
    title = build_index(
        spark, tdf, out_dir=None, bucket_docs=64, with_positions=True
    )
    fs = FieldedSearcher(
        spark, {"body": body, "title": title}, default_field="body"
    )
    return fs, {"body": Searcher(spark, body), "title": Searcher(spark, title)}


def _hits(df):
    return [(int(r["doc_id"]), np.float32(r["score"])) for r in df.collect()]


@pytest.mark.parametrize("field", ["body", "title"])
def test_single_fielded_term_equals_field_searcher(built, field):
    fs, per = built
    got = _hits(fs.topk_query(Term("import", field=field), k=10))
    want = _hits(per[field].topk_query(Term("import"), k=10))
    assert got == want and got


def test_fielded_phrase_equals_field_phrase_topk(spark, built):
    fs, per = built
    got = _hits(fs.topk_query(Phrase(("import", "return"), field="body"), k=10))
    want = _hits(phrase_topk(spark, per["body"].segment, "import return", k=10))
    assert got == want and got


def test_default_field_is_body(built):
    fs, per = built
    got = _hits(fs.topk_query(Term("return"), k=10))
    want = _hits(per["body"].topk_query(Term("return"), k=10))
    assert got == want and got


def _full_scores(searcher, term):
    return {
        d: s for d, s in _hits(searcher.topk_query(Term(term), k=N_DOCS))
    }


def test_cross_field_should_sums_float32(built):
    fs, per = built
    q = Bool(should=(Term("import", field="body"), Term("import", field="title")))
    got = dict(_hits(fs.topk_query(q, k=N_DOCS)))
    sb, st = _full_scores(per["body"], "import"), _full_scores(per["title"], "import")
    want = {}
    for d in set(sb) | set(st):
        acc = np.float32(0.0)
        for src in (sb, st):  # clause order
            if d in src:
                acc = np.float32(acc + src[d])
        want[d] = acc
    assert got == want and got


def test_cross_field_must_intersects(built):
    fs, per = built
    q = Bool(must=(Term("import", field="body"), Term("import", field="title")))
    got = dict(_hits(fs.topk_query(q, k=N_DOCS)))
    sb, st = _full_scores(per["body"], "import"), _full_scores(per["title"], "import")
    want = {
        d: np.float32(np.float32(sb[d]) + st[d]) for d in set(sb) & set(st)
    }
    assert got == want and got


def test_query_string_field_scoping(built):
    fs, _ = built
    got = _hits(fs.search("title:import body:return", k=10))
    want = _hits(
        fs.topk_query(
            Bool(should=(Term("import", field="title"), Term("return", field="body"))),
            k=10,
        )
    )
    assert got == want and got


def test_query_string_fielded_phrase(built):
    fs, _ = built
    got = _hits(fs.search('+body:"import return" title:import', k=10))
    want = _hits(
        fs.topk_query(
            Bool(
                must=(Phrase(("import", "return"), field="body"),),
                should=(Term("import", field="title"),),
            ),
            k=10,
        )
    )
    assert got == want and got


def test_unknown_field_raises(built):
    fs, _ = built
    with pytest.raises(KeyError):
        fs.topk_query(Term("import", field="nope"), k=5)


def test_fielded_query_on_plain_searcher_raises(built):
    _, per = built
    with pytest.raises(ValueError):
        per["body"].topk_query(Term("import", field="title"), k=5)


def test_fielded_wildcard_raises(built):
    from lucene_solr_spark.plans.qparser import QueryParseError

    fs, _ = built
    with pytest.raises(QueryParseError):
        fs.search("title:imp*", k=5)


def test_combined_field_topk_scalar_parity(spark, built, corpus):
    """CombinedFieldQuery (BM25F simple weighting): engine result equals a
    scalar recomputation from raw tokens — weighted tf/dl sums, byte4
    re-encoded combined norm, union df, f32 op order."""
    from lucene_solr_spark.functions.smallfloat import (
        BYTE4_DECODE_TABLE,
        int_to_byte4,
    )
    from lucene_solr_spark.operators import bm25
    from lucene_solr_spark.operators.fields import combined_field_topk

    _, per = built
    W = {"body": 1, "title": 3}
    terms = ["import", "return"]
    rows = corpus.select("doc_id", "content").collect()
    toks = {int(r["doc_id"]): tokenize(r["content"]) for r in rows}
    fields = {
        "body": toks,
        "title": {d: t[:TITLE_TOKENS] for d, t in toks.items()},
    }
    n_docs = len(toks)
    sum_ttf = sum(
        W[f] * sum(len(t) for t in fl.values()) for f, fl in fields.items()
    )
    cache = bm25.norm_cache(sum_ttf / n_docs)
    scores = {}
    for t in sorted(terms):
        df = len({
            d for fl in fields.values() for d, tl in fl.items() if t in tl
        })
        idf = np.float32(bm25.idf(n_docs, df))
        for d in toks:
            wf = sum(W[f] * fields[f][d].count(t) for f in fields)
            if wf == 0:
                continue
            wdl = sum(W[f] * len(fields[f][d]) for f in fields)
            f32 = np.float32
            sc = f32(idf * f32(f32(wf) / f32(f32(wf) + cache[int_to_byte4(wdl)])))
            scores[d] = f32(scores.get(d, f32(0.0)) + sc)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = combined_field_topk(
        spark,
        {"body": (per["body"].segment, 1), "title": (per["title"].segment, 3)},
        terms,
        k=10,
    )
    got_rows = [(int(r["doc_id"]), np.float32(r["score"])) for r in got.collect()]
    assert got_rows == [(d, np.float32(s)) for d, s in want]


def test_combined_field_absent_term_is_disjunction(spark, built):
    from lucene_solr_spark.operators.fields import combined_field_topk

    _, per = built
    segs = {"body": (per["body"].segment, 1), "title": (per["title"].segment, 2)}
    with_absent = combined_field_topk(spark, segs, ["import", "zzzqqq"], k=10)
    alone = combined_field_topk(spark, segs, ["import"], k=10)
    assert [tuple(r) for r in with_absent.collect()] == [
        tuple(r) for r in alone.collect()
    ]
    none = combined_field_topk(spark, segs, ["zzzqqq"], k=10)
    assert none.count() == 0


def test_fielded_matchall(spark):
    """`*:*` on a FieldedSearcher: every doc, constant score = boost."""
    from lucene_solr_spark.corpus import stamp_sha256
    from lucene_solr_spark.operators.fields import FieldedSearcher
    from lucene_solr_spark.operators.indexer import build_index

    schema = (
        "doc_id long, repo string, path string, commit string, "
        "lang string, content string"
    )
    df = spark.createDataFrame(
        [(0, "r", "a", "c", "en", "order"), (1, "r", "b", "c", "en", "batch")],
        schema,
    )
    seg = build_index(spark, stamp_sha256(df), out_dir=None)
    fs = FieldedSearcher(spark, {"content": seg}, default_field="content")
    rows = fs.search("*:*", k=5).collect()
    assert [(r.doc_id, r.score) for r in rows] == [(0, 1.0), (1, 1.0)]
    assert fs.search("*:*^2", k=1).collect()[0].score == 2.0
