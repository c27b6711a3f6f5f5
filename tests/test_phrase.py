"""Positional postings + exact-phrase queries — PhraseQuery analog vs the
scalar oracle, plus positional survival through a segment merge."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.corpus import synth_corpus
from lucene_solr_spark.functions.packing import delta_decode, unpack_ints
from lucene_solr_spark.operators.indexer import assign_doc_ids, build_index
from lucene_solr_spark.operators.merge import merge_segments
from lucene_solr_spark.operators.phrase import phrase_topk
from lucene_solr_spark.operators.search import Searcher

from .oracle import OracleIndex, tokenize

N_DOCS = 150


@pytest.fixture(scope="module")
def corpus(spark):
    c = synth_corpus(spark, N_DOCS, partitions=4)
    return assign_doc_ids(c, ["repo", "path", "commit"]).persist()


@pytest.fixture(scope="module")
def seg_pos(spark, corpus):
    return build_index(
        spark, corpus, out_dir=None, bucket_docs=64, with_positions=True
    )


@pytest.fixture(scope="module")
def oracle(corpus):
    rows = corpus.select("doc_id", "content").collect()
    return OracleIndex([(int(r["doc_id"]), r["content"]) for r in rows])


@pytest.fixture(scope="module")
def phrases(oracle):
    """Real 2- and 3-token phrases drawn from the corpus (plus misses)."""
    out = []
    for doc_id in sorted(oracle.tokens)[:6]:
        toks = oracle.tokens[doc_id]
        if len(toks) > 12:
            out.append(" ".join(toks[5:7]))
            out.append(" ".join(toks[8:11]))
    out += ["import return", "zzz qqq never", "import"]
    return out


def test_positions_roundtrip(spark, seg_pos, oracle):
    """Stored positions must reproduce each doc's token stream exactly."""
    rows = seg_pos.table(spark, "positions").collect()
    seen = {}
    for r in rows:
        pos = delta_decode(unpack_ints(r["pos_bin"])).astype(int)
        assert (np.diff(pos) > 0).all() or len(pos) <= 1
        for p in pos:
            seen.setdefault(int(r["doc_id"]), {})[int(p)] = r["term"]
    for doc_id, toks in oracle.tokens.items():
        got = seen.get(doc_id, {})
        assert len(got) == len(toks)
        for i, t in enumerate(toks):
            assert got[i] == t, f"doc {doc_id} pos {i}: {got[i]} != {t}"


def test_phrase_matches_oracle(spark, seg_pos, oracle, phrases):
    for ph in phrases:
        got = [
            (int(r["doc_id"]), float(r["score"]))
            for r in phrase_topk(spark, seg_pos, ph, k=10).collect()
        ]
        want = oracle.topk_phrase(ph, k=10)
        assert got == want, f"phrase {ph!r}: {got} != {want}"


def test_phrase_freq_gt_term_freq_impossible(spark, seg_pos):
    """Phrase hits are a subset of conjunction hits."""
    s = Searcher(spark, seg_pos)
    ph = "import return"
    phrase_docs = {
        int(r["doc_id"]) for r in phrase_topk(spark, seg_pos, ph, k=1000).collect()
    }
    conj_docs = {
        int(r["doc_id"]) for r in s.topk(ph, k=1000, op="and", mode="exhaustive").collect()
    }
    assert phrase_docs <= conj_docs


def test_phrase_survives_merge(spark, corpus, tmp_path, oracle, phrases):
    half = N_DOCS // 2
    segs = []
    for i, pred in enumerate([F.col("doc_id") < half, F.col("doc_id") >= half]):
        segs.append(
            build_index(
                spark,
                corpus.filter(pred).drop("doc_id"),
                out_dir=str(tmp_path),
                bucket_docs=64,
                segment_id=f"p{i}",
                with_positions=True,
            )
        )
    merged = merge_segments(
        spark, segs, out_dir=str(tmp_path), bucket_docs=64, drop_sources=False
    )
    assert merged.has_table("positions")
    for ph in phrases[:4] + ["import return"]:
        got = [
            (int(r["doc_id"]), float(r["score"]))
            for r in phrase_topk(spark, merged, ph, k=10).collect()
        ]
        want = oracle.topk_phrase(ph, k=10)
        assert got == want, f"post-merge phrase {ph!r} mismatch"


SLOPPY = [
    ("import return", 1),
    ("import return", 2),
    ("return import", 2),   # reordering costs 2 — nonempty iff slop allows
    ("import def", 3),
    ("public self import", 2),
    ("def return", 1),
]


@pytest.mark.parametrize("ph,slop", SLOPPY)
def test_sloppy_phrase_matches_oracle(spark, seg_pos, oracle, ph, slop):
    """SloppyPhraseMatcher no-repeats semantics: engine == scalar oracle
    (fractional sloppy freq, float32 scores, tie doc_id asc)."""
    got = [
        (int(r["doc_id"]), np.float32(r["score"]))
        for r in phrase_topk(spark, seg_pos, ph, k=10, slop=slop).collect()
    ]
    want = [(d, np.float32(s)) for d, s in oracle.topk_phrase(ph, k=10, slop=slop)]
    assert got == want, f"phrase {ph!r} slop={slop}: {got[:3]} != {want[:3]}"


def test_sloppy_superset_of_exact(spark, seg_pos):
    """Every exact match also matches at any slop (with freq >= exact via
    extra sloppy matches never decreasing)."""
    exact = {
        int(r["doc_id"])
        for r in phrase_topk(spark, seg_pos, "import return", k=1000).collect()
    }
    sloppy = {
        int(r["doc_id"])
        for r in phrase_topk(spark, seg_pos, "import return", k=1000, slop=2).collect()
    }
    assert exact <= sloppy


REPEAT_SLOPPY = [  # all non-vacuous on the 150-doc synth corpus
    ("import return import", 2),
    ("import import", 1),
    ("return import return", 4),
    ("self self", 2),
]


@pytest.mark.parametrize("ph,slop", REPEAT_SLOPPY)
def test_sloppy_phrase_with_repeats_matches_oracle(spark, seg_pos, oracle, ph, slop):
    """SloppyPhraseMatcher repeat groups: legs of a repeated term must
    occupy distinct raw positions; engine == scalar oracle."""
    got = [
        (int(r["doc_id"]), np.float32(r["score"]))
        for r in phrase_topk(spark, seg_pos, ph, k=10, slop=slop).collect()
    ]
    want = [(d, np.float32(s)) for d, s in oracle.topk_phrase(ph, k=10, slop=slop)]
    assert got == want, f"phrase {ph!r} slop={slop}: {got[:3]} != {want[:3]}"


def test_repeat_walk_hand_case():
    """Pinned hand-derived case: 'a b a' over 'x a b a y' is one perfect
    match (the two a-legs claim distinct raw positions 1 and 3)."""
    from lucene_solr_spark.operators.phrase import sloppy_phrase_freq_general

    toks = ["x", "a", "b", "a", "y"]
    raw_a = [i for i, t in enumerate(toks) if t == "a"]
    raw_b = [i for i, t in enumerate(toks) if t == "b"]
    freq = sloppy_phrase_freq_general(
        [raw_a, raw_b, raw_a], [0, 1, 2], [[0, 2]], 2
    )
    assert freq == 1.0
    # same doc, no slop budget needed; but a single 'a' cannot serve both legs
    freq2 = sloppy_phrase_freq_general(
        [[1], [2]], [0, 2], [], 1
    )
    assert freq2 > 0  # sanity: non-repeat walk unaffected


def test_highlight_from_positions(spark, seg_pos, oracle):
    """Index-only highlighting: snippets reconstructed from positional
    postings must match a scalar re-derivation from the raw token stream."""
    from lucene_solr_spark.operators.highlight import highlight

    q = "import return"
    q_terms = {"import", "return"}
    doc_ids = [d for d, toks in sorted(oracle.tokens.items()) if q_terms & set(toks)][:8]
    got = {
        r["doc_id"]: (r["n_hits"], r["snippet"])
        for r in highlight(spark, seg_pos, q, doc_ids, window=7, max_snippets=2).collect()
    }
    for d in doc_ids:
        toks = oracle.tokens[d]
        hits = sorted(i for i, t in enumerate(toks) if t in q_terms)
        assert got[d][0] == len(hits), f"doc {d} hit count"
        # every marked word in the snippet is a query term; first hit shown
        snippet = got[d][1]
        assert "<em>" in snippet
        first = toks[hits[0]]
        assert f"<em>{first}</em>" in snippet


def test_highlight_topk_shape(spark, seg_pos):
    from lucene_solr_spark.operators.highlight import highlight_topk

    s = Searcher(spark, seg_pos)
    rows = highlight_topk(spark, seg_pos, s, "import return", k=5).collect()
    assert len(rows) == 5
    assert all("snippet" in r.asDict() for r in rows)
    # order preserved: score desc, doc_id asc
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


# ---------------------------------------------------------------------------
# MultiPhraseQuery (per-slot alternatives) vs scalar oracle
# ---------------------------------------------------------------------------


def _mp_slot_cases(oracle):
    """Slot lists drawn from real corpus bigrams so matches exist."""
    cases = []
    for doc_id in sorted(oracle.tokens)[:8]:
        toks = oracle.tokens[doc_id]
        if len(toks) > 10:
            # (exact bigram as 1-member slots) and (second slot widened)
            cases.append([(toks[3],), (toks[4],)])
            cases.append([(toks[3],), (toks[4], "zzzmiss")])
            cases.append([(toks[3], toks[6]), (toks[4], toks[7])])
    cases.append([("import",), ("zzz", "qqq")])   # dead slot
    cases.append([("zzzx",), ("qqqx",)])          # all absent
    return cases


def test_multi_phrase_matches_oracle(spark, seg_pos, oracle):
    from lucene_solr_spark.operators.phrase import multi_phrase_topk

    for slots in _mp_slot_cases(oracle):
        got = [
            (r["doc_id"], np.float32(r["score"]))
            for r in multi_phrase_topk(spark, seg_pos, slots, k=20).collect()
        ]
        want = [(d, np.float32(s)) for d, s in oracle.topk_multi_phrase(slots, k=20)]
        assert got == want, f"{slots}: {got[:3]} vs {want[:3]}"


def test_multi_phrase_single_member_equals_phrase(spark, seg_pos, oracle):
    """1-member slots must reduce exactly to the plain exact PhraseQuery
    EXCEPT for idf (same here: identical term sets), so scores match."""
    for doc_id in sorted(oracle.tokens)[:4]:
        toks = oracle.tokens[doc_id]
        if len(toks) <= 8:
            continue
        text = f"{toks[5]} {toks[6]}"
        a = [
            (r["doc_id"], np.float32(r["score"]))
            for r in phrase_topk(spark, seg_pos, text, k=15).collect()
        ]
        from lucene_solr_spark.operators.phrase import multi_phrase_topk

        b = [
            (r["doc_id"], np.float32(r["score"]))
            for r in multi_phrase_topk(
                spark, seg_pos, [(toks[5],), (toks[6],)], k=15
            ).collect()
        ]
        assert a == b


def test_multi_phrase_widening_is_superset(spark, seg_pos, oracle):
    """Adding an alternative to a slot can only add matching docs."""
    from lucene_solr_spark.operators.phrase import multi_phrase_topk

    toks = None
    for doc_id in sorted(oracle.tokens):
        if len(oracle.tokens[doc_id]) > 10:
            toks = oracle.tokens[doc_id]
            break
    assert toks
    narrow = {r["doc_id"] for r in multi_phrase_topk(
        spark, seg_pos, [(toks[3],), (toks[4],)], k=10**6).collect()}
    wide = {r["doc_id"] for r in multi_phrase_topk(
        spark, seg_pos, [(toks[3],), (toks[4], toks[7])], k=10**6).collect()}
    assert narrow <= wide


def test_multi_phrase_sloppy_singleton_equals_sloppy_phrase(spark, seg_pos, oracle):
    """slop>0 with 1-member slots must equal the plain sloppy PhraseQuery
    (same legs, same matcher, same idf)."""
    from lucene_solr_spark.operators.phrase import multi_phrase_topk

    checked = 0
    for doc_id in sorted(oracle.tokens)[:6]:
        toks = oracle.tokens[doc_id]
        if len(toks) <= 9:
            continue
        text = f"{toks[4]} {toks[8]}"
        for slop in (1, 3):
            a = [
                (r["doc_id"], np.float32(r["score"]))
                for r in phrase_topk(spark, seg_pos, text, k=15, slop=slop).collect()
            ]
            b = [
                (r["doc_id"], np.float32(r["score"]))
                for r in multi_phrase_topk(
                    spark, seg_pos, [(toks[4],), (toks[8],)], k=15, slop=slop
                ).collect()
            ]
            assert a == b, f"slop={slop} {text!r}"
            checked += 1
    assert checked >= 2


def test_multi_phrase_sloppy_union_kernel_pinned():
    """Hand-derived slot-union walk: doc 'a x b c b' (a@0, b@[2,4], c@3),
    slots [(a,c),(b,)], slop=1: greedy matches (0,2)->0.5 and (3,4)->1.0."""
    from lucene_solr_spark.operators.phrase import _multi_sloppy_freqs

    per_term = {
        "a": (np.array([7]), np.array([0]), np.array([1])),
        "b": (np.array([7]), np.array([2, 4]), np.array([2])),
        "c": (np.array([7]), np.array([3]), np.array([1])),
    }
    ids, freqs = _multi_sloppy_freqs(per_term, [("a", "c"), ("b",)], slop=1)
    assert ids.tolist() == [7] and freqs.tolist() == [1.5]
    # overlapping slots form a repeat group: legs take distinct positions
    ids2, freqs2 = _multi_sloppy_freqs(per_term, [("a", "b"), ("b",)], slop=2)
    assert ids2.tolist() == [7] and freqs2.tolist() == [0.5]


def test_multi_phrase_sloppy_widening_is_superset(spark, seg_pos, oracle):
    """More slop can only add matches (for the same slots)."""
    from lucene_solr_spark.operators.phrase import multi_phrase_topk

    toks = None
    for doc_id in sorted(oracle.tokens):
        if len(oracle.tokens[doc_id]) > 10:
            toks = oracle.tokens[doc_id]
            break
    assert toks
    slots = [(toks[3],), (toks[6], toks[8])]
    tight = {r["doc_id"] for r in multi_phrase_topk(
        spark, seg_pos, slots, k=10**6, slop=1).collect()}
    loose = {r["doc_id"] for r in multi_phrase_topk(
        spark, seg_pos, slots, k=10**6, slop=4).collect()}
    assert tight <= loose
