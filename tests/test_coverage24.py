"""Semantic pins for the coverage24 batch: analyze() chain parity,
distributed spellcheck merge equals global ranking, language routing."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod  # noqa: F401  (registers the catalog)
from lucene_solr_spark.plans import coverage24_queries as c24

from .conftest import SF_DIR


def test_analyze_matches_index_tokens(spark):
    """The analyze() evaluator emits EXACTLY the token stream the index
    build would produce for the same docs (same pinned chain)."""
    got = c24.analyze_evaluator_tokens(spark, SF_DIR).collect()
    from lucene_solr_spark.plans.driver_queries import _tokens

    toks = {
        r.doc_id: r.tokens
        for r in _tokens(spark, SF_DIR)
        .where(F.col("doc_id").isin(*c24._AE_DOCS))
        .collect()
    }
    for r in got:
        assert toks[r.doc_id][r.pos] == r.term


def test_spellcheck_merge_equals_global(spark):
    """Summed shard dfs reproduce the single-searcher DirectSpellChecker
    ranking (same candidates, same frequencies)."""
    got = c24.spellcheck_distributed_merge(spark, SF_DIR).collect()
    from lucene_solr_spark.plans.driver_queries import _tokens

    toks = (
        _tokens(spark, SF_DIR)
        .select("doc_id", F.explode("tokens").alias("term"))
        .distinct()
    )
    glob = (
        toks.groupBy("term")
        .agg(F.count("*").alias("df"))
        .withColumn(
            "distance", F.levenshtein(F.col("term"), F.lit(c24._SP_Q)).cast("long")
        )
        .where((F.col("distance") <= 2) & (F.col("term") != c24._SP_Q))
        .orderBy(F.asc("distance"), F.desc("df"), F.asc("term"))
        .limit(5)
        .select("term", "distance", "df")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in glob]
    assert got, "the misspelling has at least one in-vocabulary correction"


def test_lang_routing_stems_only_en(spark):
    rows = c24.lang_field_routing(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r.lang != "en":
            # non-en routes never emit a stemmer-only form: every term
            # must exist verbatim in that language's token stream
            assert not r.term.endswith("-")  # sanity on shape
    # the en route maps plural surface forms onto their stems: 'values'
    # class tokens count under 'value' for en but stay split elsewhere
    import duckdb

    con = duckdb.connect()
    stem = con.execute(
        f"SELECT {c24._KR_STEM_SQL.format(t=chr(39) + 'values' + chr(39))}"
    ).fetchone()[0]
    assert stem == "value"
