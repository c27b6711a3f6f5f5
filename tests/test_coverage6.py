"""Semantics pins for the coverage6 rows on a tiny hand-computed corpus.

The driver-contract mirror already proves Spark==DuckDB on the testdata;
these tests pin the SEMANTICS against hand-derived expectations — in
particular the FreeTextSuggester backoff branch, which the testdata's
dense vocabulary never surfaces into the top-k (every vocab word follows
the context at sf>=0.001), and the word-break ranking keys.
"""

from __future__ import annotations

import pytest

import lucene_solr_spark.plans.coverage6_queries as c6
from lucene_solr_spark.plans.driver_queries import _TOK_CACHE


@pytest.fixture()
def tiny_sf(spark, tmp_path):
    """A 3-doc documents.parquet with a vocabulary engineered so that
    'sort' is followed only by {merge, merge, slow} while 'window' and
    'fast' never follow it (backoff candidates)."""
    rows = [
        (0, "sort merge sort merge window", "en", "s0", 28),
        (1, "sort slow fast window fast", "en", "s0", 26),
        (2, "slowfast sortmerge window", "en", "s0", 25),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path)
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")
    yield d
    _TOK_CACHE.pop(d, None)


def test_freetext_backoff_branch(spark, tiny_sf):
    out = c6.suggest_freetext(spark, tiny_sf).collect()
    by_term = {r["term"]: r for r in out}
    # bigram candidates after 'sort': merge x2, slow x1 -> 3 ctx bigrams
    assert by_term["merge"]["src"] == "bigram"
    assert by_term["merge"]["score"] == pytest.approx(2 / 3, abs=0)
    assert by_term["slow"]["src"] == "bigram"
    assert by_term["slow"]["score"] == pytest.approx(1 / 3, abs=0)
    # every other vocab word arrives via stupid backoff at 0.4 * share
    assert by_term["window"]["src"] == "backoff"
    n_tokens = 5 + 5 + 3  # engine tokens per doc
    assert by_term["window"]["score"] == 0.4 * (3 / n_tokens)
    # backoff never outranks a seen bigram here
    order = [r["term"] for r in out]
    assert order.index("merge") < order.index("window")


def test_word_break_splits_and_freqs(spark, tiny_sf):
    out = [tuple(r) for r in c6.word_break_spell(spark, tiny_sf).collect()]
    # 'slowfast' -> slow+fast (slow x1, fast x2); 'sortmerge' -> sort+merge
    assert ("slowfast", "slow", "fast", 1, 2) in out
    assert ("sortmerge", "sort", "merge", 3, 2) in out
    # no other split point has both sides in the dictionary
    assert len(out) == 2
    # ordered by input then left part
    assert out == sorted(out)


def test_fuzzy_suggest_prefix_edits(spark, tiny_sf):
    # q='pat': no term within 1 edit of any length-3 prefix in this corpus
    assert c6.suggest_fuzzy(spark, tiny_sf).count() == 0


def test_lm_perplexity_matches_reference_model(spark, tiny_sf):
    """Pin nll against an independently-coded bigram stupid-backoff model."""
    import math
    from collections import Counter

    docs = {
        0: "sort merge sort merge window".split(),
        1: "sort slow fast window fast".split(),
        2: "slowfast sortmerge window".split(),
    }
    uni = Counter(t for ts in docs.values() for t in ts)
    ut = sum(uni.values())
    bic = Counter(
        (ts[i], ts[i + 1]) for ts in docs.values() for i in range(len(ts) - 1)
    )
    ctx = Counter()
    for (p, _), c in bic.items():
        ctx[p] += c
    expected = {}
    for did, ts in docs.items():
        lps = [math.log(uni[ts[0]] / ut)]
        for i in range(1, len(ts)):
            p, c = ts[i - 1], ts[i]
            if (p, c) in bic:
                lps.append(math.log(bic[(p, c)] / ctx[p]))
            else:
                lps.append(math.log(0.4 * (uni[c] / ut)))
        expected[did] = round(-sum(lps) / len(lps), 6)
    out = {r["doc_id"]: r["nll"] for r in c6.lm_doc_perplexity(spark, tiny_sf).collect()}
    assert out == pytest.approx(expected, abs=1e-6)
    # the doc with only unseen-or-rare transitions is the most surprising
    assert max(out, key=out.get) == 2


def test_boolean_similarity_is_match_count(spark, tiny_sf):
    out = {r["doc_id"]: r["score"] for r in c6.sim_boolean_topk(spark, tiny_sf).collect()}
    # _SIM_TERMS = [join, order, spark]: none present in the tiny corpus
    assert out == {}
