"""Phrase clauses inside Boolean query trees — PhraseQuery as a
BooleanClause (search/BooleanQuery.java holding PhraseQuery.java clauses),
engine cogrouped scorer vs the scalar oracle.

Trees are built from REAL adjacent token pairs of the synth corpus so the
phrase legs actually match documents; misses/absent terms are covered too.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest

from lucene_solr_spark.corpus import synth_corpus
from lucene_solr_spark.operators.indexer import assign_doc_ids, build_index
from lucene_solr_spark.operators.query import Bool, Phrase, Term, rewrite
from lucene_solr_spark.operators.search import Searcher

from .oracle import OracleIndex

N_DOCS = 150


@pytest.fixture(scope="module")
def corpus(spark):
    c = synth_corpus(spark, N_DOCS, partitions=4)
    return assign_doc_ids(c, ["repo", "path", "commit"]).persist()


@pytest.fixture(scope="module")
def searcher(spark, corpus):
    seg = build_index(
        spark, corpus, out_dir=None, bucket_docs=64, with_positions=True
    )
    return Searcher(spark, seg)


@pytest.fixture(scope="module")
def oracle(corpus):
    rows = corpus.select("doc_id", "content").collect()
    return OracleIndex([(int(r["doc_id"]), r["content"]) for r in rows])


@pytest.fixture(scope="module")
def vocab(oracle):
    """(two real adjacent pairs, a wide pair for slop, two common terms)."""
    counts = Counter(t for toks in oracle.tokens.values() for t in toks)
    common = [t for t, _ in counts.most_common(6)]
    pairs = Counter()
    wides = Counter()
    for toks in oracle.tokens.values():
        for a, b in zip(toks, toks[1:]):
            if a != b:
                pairs[(a, b)] += 1
        for a, b in zip(toks, toks[3:]):  # distance 3 -> needs slop >= 2
            if a != b:
                wides[(a, b)] += 1
    pair1, pair2 = [p for p, _ in pairs.most_common(2)]
    wide = next(
        (p for p, n in wides.most_common(20) if pairs[p] < n),
        wides.most_common(1)[0][0],
    )
    return pair1, pair2, wide, common[0], common[1]


def _trees(vocab):
    pair1, pair2, wide, c1, c2 = vocab
    return {
        "phrase_should": Bool(should=(Phrase(pair1), Term(c1))),
        "phrase_must": Bool(must=(Phrase(pair1),), should=(Term(c1), Term(c2))),
        "phrase_must_not": Bool(must=(Term(c1),), must_not=(Phrase(pair1),)),
        "phrase_filter": Bool(must=(Term(c2),), filter=(Phrase(pair1),)),
        "phrase_boost": Bool(should=(Phrase(pair1, boost=2.5), Term(c2))),
        "phrase_only": Bool(should=(Phrase(pair1), Phrase(pair2))),
        "phrase_sloppy": Bool(must=(Phrase(wide, slop=2),), should=(Term(c1),)),
        "phrase_absent": Bool(should=(Term(c1), Phrase(("zzzz", "qqqq")))),
        "phrase_nested": Bool(
            must=(Bool(should=(Phrase(pair1), Phrase(pair2))),),
            should=(Term(c1),),
        ),
        "phrase_msm": Bool(
            should=(Phrase(pair1), Term(c1), Term(c2)), min_should_match=2
        ),
        "phrase_bare": Phrase(pair1),
    }


NAMES = sorted(_trees((("a", "b"), ("c", "d"), ("e", "f"), "g", "h")))


@pytest.mark.parametrize("name", NAMES)
def test_phrase_tree_matches_oracle(searcher, oracle, vocab, name):
    q = _trees(vocab)[name]
    got = [
        (r["doc_id"], np.float32(r["score"]))
        for r in searcher.topk_query(q, k=10).collect()
    ]
    want = [(d, np.float32(s)) for d, s in oracle.topk_bool(q, k=10)]
    assert got == want, f"{name}: {got[:3]} vs {want[:3]}"
    if name not in ("phrase_absent", "phrase_must_not"):
        assert got, f"{name}: vacuous (no hits) — vocab fixture broken"


@pytest.mark.parametrize("name", NAMES)
def test_rewrite_preserves_phrase_trees(oracle, vocab, name):
    q = _trees(vocab)[name]
    assert oracle.topk_bool(rewrite(q), k=20) == oracle.topk_bool(q, k=20)


def test_bare_phrase_tree_equals_phrase_topk(spark, searcher, vocab):
    """The tree path's Phrase scoring must be bit-identical to phrase_topk."""
    from lucene_solr_spark.operators.phrase import phrase_topk

    pair1 = vocab[0]
    tree = [
        (r["doc_id"], np.float32(r["score"]))
        for r in searcher.topk_query(Phrase(pair1), k=10).collect()
    ]
    flat = [
        (r["doc_id"], np.float32(r["score"]))
        for r in phrase_topk(
            spark, searcher.segment, " ".join(pair1), k=10
        ).collect()
    ]
    assert tree == flat and tree


def test_query_string_phrase_in_bool(searcher, oracle, vocab):
    """End-to-end: classic syntax '+\"a b\" c' through parse -> tree."""
    pair1, _, _, c1, _ = vocab
    qs = f'+"{pair1[0]} {pair1[1]}" {c1}'
    got = [
        (r["doc_id"], np.float32(r["score"]))
        for r in searcher.search(qs, k=10).collect()
    ]
    want = [
        (d, np.float32(s))
        for d, s in oracle.topk_bool(
            Bool(must=(Phrase(pair1),), should=(Term(c1),)), k=10
        )
    ]
    assert got == want and got


def test_sloppy_repeats_in_tree(searcher, oracle, vocab):
    """A sloppy phrase with a repeated term inside a Boolean tree runs the
    repeat-group walk and matches the scalar oracle."""
    (a, b), *_ = vocab
    q = Bool(must=(Phrase((a, b, a), slop=4),), should=(Term(b),))
    got = [
        (r["doc_id"], np.float32(r["score"]))
        for r in searcher.topk_query(q, k=10).collect()
    ]
    want = [(d, np.float32(s)) for d, s in oracle.topk_bool(q, k=10)]
    assert got == want


def test_tree_fq_equals_post_filter(searcher, vocab):
    """fq on Boolean trees (with and without phrase clauses): identical to
    post-filtering the unfiltered full ranking — scores untouched."""
    (a, b), _, _, c1, _ = vocab
    fq = "lang = 'python'"
    allowed = {
        int(r["doc_id"])
        for r in searcher.docmap.filter(fq).select("doc_id").collect()
    }
    assert allowed
    trees = [
        Bool(should=(Term(a), Term(c1))),
        Bool(must=(Phrase((a, b)),), should=(Term(c1),)),
        Phrase((a, b)),
    ]
    for q in trees:
        full = [
            (r["doc_id"], np.float32(r["score"]))
            for r in searcher.topk_query(q, k=100000).collect()
        ]
        want = [(d, s) for d, s in full if d in allowed][:10]
        got = [
            (r["doc_id"], np.float32(r["score"]))
            for r in searcher.topk_query(q, k=10, fq=fq).collect()
        ]
        assert got == want, f"{q}: {got[:3]} vs {want[:3]}"
    assert want is not None


def test_search_string_with_fq(searcher, vocab):
    (a, b), _, _, c1, _ = vocab
    fq = "lang = 'java'"
    qs = f'+"{a} {b}" {c1}'
    got = [
        (r["doc_id"], np.float32(r["score"]))
        for r in searcher.search(qs, k=10, fq=fq).collect()
    ]
    allowed = {
        int(r["doc_id"])
        for r in searcher.docmap.filter(fq).select("doc_id").collect()
    }
    unfiltered = [
        (r["doc_id"], np.float32(r["score"]))
        for r in searcher.search(qs, k=100000).collect()
    ]
    assert got == [(d, s) for d, s in unfiltered if d in allowed][:10]
    # pure-phrase string with fq routes through the tree scorer
    ph = [
        (r["doc_id"], np.float32(r["score"]))
        for r in searcher.search(f'"{a} {b}"', k=10, fq=fq).collect()
    ]
    ph_full = [
        (r["doc_id"], np.float32(r["score"]))
        for r in searcher.search(f'"{a} {b}"', k=100000).collect()
    ]
    assert ph == [(d, s) for d, s in ph_full if d in allowed][:10]


def test_phrase_kernel_mixed_graph_plain_bucket():
    """A bucket mixing graph rows (end_bin set) with plain rows (null
    end_bin — the edismax multi-segment union shape) must not crash:
    plain tokens get the trivial start+1 edge, as segment merge does."""
    import numpy as np
    import pandas as pd

    from lucene_solr_spark.functions.packing import delta_encode, pack_ints
    from lucene_solr_spark.operators.phrase import bucket_phrase_freqs

    def posbin(positions):
        return pack_ints(delta_encode(np.array(positions, dtype=np.uint64)))

    def endbin(ends):
        return pack_ints(np.array(ends, dtype=np.uint64))

    pdf = pd.DataFrame(
        {
            "term": ["key", "order", "key", "order"],
            "doc_id": [0, 0, 1, 1],
            "pos_bin": [posbin([0]), posbin([1]), posbin([5]), posbin([6])],
            "end_bin": [endbin([1]), endbin([2]), None, None],
            "norm_byte": [10, 10, 12, 12],
        }
    )
    for slop in (0, 1):
        ids, freqs, _ = bucket_phrase_freqs(
            pdf, {"key": [0], "order": [1]}, slop=slop
        )
        assert list(ids) == [0, 1]
        assert [float(f) for f in freqs] == [1.0, 1.0]
