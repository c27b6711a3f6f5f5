"""Round-5 widening batch #17: MatchAllDocsQuery through the classic
parser syntax.

Each entry re-expresses a reference component (public lucene-solr
path#symbol cited per entry; the reference mount is empty) over the driver
testdata with a DuckDB oracle using identical column aliases.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .driver_queries import register

# ---------------------------------------------------------------------------
# MatchAllDocsQuery via the classic `*:*` syntax —
# lucene/core/.../search/MatchAllDocsQuery.java reached through
# queryparser/classic/QueryParser.jj's field-'*'/term-'*' production (the
# canonical "everything" query every Solr admin UI issues): every doc,
# constant score 1.0, docID tie-break. ENGINE-PATH: Searcher.search("*:*")
# — a pruned docmap scan, zero postings touched (distinct from the
# `match_all_count` aggregate row: this pins the PARSER route and the
# constant-score/doc-order result shape).
# ---------------------------------------------------------------------------


@register(
    "matchall_engine_constant",
    """SELECT doc_id, 1.0::DOUBLE AS score
FROM documents ORDER BY doc_id ASC LIMIT 20""",
)
def matchall_engine_constant(spark, sf_dir):
    """q='*:*' through the classic parser: first 20 docs, score 1.0."""
    from .solr_queries import _engine_searcher

    s = _engine_searcher(spark, sf_dir)
    return s.search("*:*", k=20).select(
        "doc_id", F.col("score").cast("double").alias("score")
    )
