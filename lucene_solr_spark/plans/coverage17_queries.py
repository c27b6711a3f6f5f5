"""Round-5 widening batch #8: the JSON Query DSL, FuzzyLikeThisQuery, and
facet.exists.

Each entry re-expresses a reference component (public lucene-solr
path#symbol cited per entry; the reference mount is empty) over the driver
testdata with a DuckDB oracle using identical column aliases.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .driver_queries import _read, _tokens, register

# ---------------------------------------------------------------------------
# JSON Query DSL — solr/core/.../request/json/JsonQueryConverter.java +
# RequestUtil.java (the JSON Request API): structured JSON query bodies
# routed through the SAME QParser plugin registry as local-params
# strings (plans/jsondsl.py; the converter literally emits {!type k=v}
# strings, and `bool` recurses natively). The pinned request nests four
# parser types under a bool with mm=1 plus a top-level filter list; the
# row counts matches for the query alone and with the filter applied —
# both from ONE scan (two conditional sums, unpivoted).
# ---------------------------------------------------------------------------

_JQ_REQUEST = {
    "query": {
        "bool": {
            "must": ["spark AND merge"],  # classic string -> lucene parser
            "should": [
                {"field": {"f": "text", "query": "order batch"}},
                {"prefix": {"f": "text", "query": "sca"}},
            ],
            "must_not": [{"term": {"f": "text", "query": "dup"}}],
            "mm": 1,
        }
    },
    "filter": [{"prefix": {"f": "text", "query": "wind"}}],
}


@register(
    "json_query_dsl",
    """WITH tokarr AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
pos AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM tokarr),
flags AS (
  SELECT doc_id,
         max(CASE WHEN term = 'spark' THEN 1 ELSE 0 END) AS f_spark,
         max(CASE WHEN term = 'merge' THEN 1 ELSE 0 END) AS f_merge,
         max(CASE WHEN term LIKE 'sca%' THEN 1 ELSE 0 END) AS f_sca,
         max(CASE WHEN term LIKE 'wind%' THEN 1 ELSE 0 END) AS f_wind,
         max(CASE WHEN term = 'dup' THEN 1 ELSE 0 END) AS f_dup
  FROM pos GROUP BY doc_id),
ph AS (SELECT DISTINCT a.doc_id FROM pos a
       JOIN pos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       WHERE a.term = 'order' AND b.term = 'batch'),
j AS (SELECT f.*, CASE WHEN ph.doc_id IS NOT NULL THEN 1 ELSE 0 END AS f_phrase
      FROM flags f LEFT JOIN ph ON ph.doc_id = f.doc_id),
m AS (SELECT doc_id,
      CASE WHEN f_spark = 1 AND f_merge = 1 AND f_dup = 0
            AND (f_phrase + f_sca) >= 1 THEN 1 ELSE 0 END AS q,
      f_wind FROM j)
SELECT 'filtered' AS part, sum(CASE WHEN q = 1 AND f_wind = 1 THEN 1 ELSE 0 END)::BIGINT AS n_docs FROM m
UNION ALL SELECT 'query', sum(q)::BIGINT FROM m
ORDER BY part ASC""",
)
def json_query_dsl(spark, sf_dir):
    """Match counts for the pinned JSON request, with and without its
    top-level filter."""
    from .coverage12_queries import _sq_match_col
    from .jsondsl import compile_json_request

    node, filters = compile_json_request(_JQ_REQUEST)
    toks = _tokens(spark, sf_dir)
    q = _sq_match_col(node)
    f = q
    for fl in filters:
        f = f & _sq_match_col(fl)
    wide = toks.agg(
        F.sum(f.cast("long")).alias("filtered"),
        F.sum(q.cast("long")).alias("query"),
    )
    return wide.selectExpr(
        "stack(2, 'filtered', filtered, 'query', query) AS (part, n_docs)"
    ).orderBy("part")


# ---------------------------------------------------------------------------
# FuzzyLikeThisQuery — lucene/sandbox/src/java/org/apache/lucene/sandbox/
# queries/FuzzyLikeThisQuery.java (solr once exposed it as {!flt}): each
# seed token expands FUZZILY against the terms dict (edit distance <= 1
# here, the maxEdits=1 configuration), and documents rank by how many of
# the expanded variants they contain — MoreLikeThis's shape with fuzzy
# leaves. The expansion runs over the tiny vocabulary and broadcasts;
# the doc scan never computes an edit distance (the at-scale property of
# expanding against the terms dict instead of the corpus).
# ---------------------------------------------------------------------------

_FLT_SEEDS = ["spar", "windo"]  # 1-edit typos of spark / window


@register(
    "fuzzy_like_this_topk",
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
vocab AS (SELECT DISTINCT term FROM toks),
exp AS (SELECT term FROM vocab
        WHERE levenshtein(term, 'spar') <= 1 OR levenshtein(term, 'windo') <= 1),
pairs AS (SELECT DISTINCT doc_id, term FROM toks)
SELECT p.doc_id, count(*)::BIGINT AS n_variants
FROM pairs p JOIN exp ON exp.term = p.term
GROUP BY p.doc_id ORDER BY n_variants DESC, doc_id ASC LIMIT 10""",
)
def fuzzy_like_this_topk(spark, sf_dir):
    """Docs ranked by how many fuzzy-expanded seed variants they contain."""
    toks = _tokens(spark, sf_dir)
    pairs = toks.select("doc_id", F.explode("tokens").alias("term")).distinct()
    vocab = pairs.select("term").distinct()
    cond = None
    for s in _FLT_SEEDS:
        c = F.levenshtein("term", F.lit(s)) <= 1
        cond = c if cond is None else (cond | c)
    exp = vocab.filter(cond)
    return (
        pairs.join(F.broadcast(exp), "term")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_variants"))
        .orderBy(F.desc("n_variants"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# facet.exists=true — solr/core/.../request/SimpleFacets.java (the
# facet.exists param): per-bucket counting short-circuits at the first
# match — the returned "count" is capped at 1, an existence flag. The
# engine shape: DISTINCT bucket over the filtered scan (no count
# aggregation state at all), which is the short-circuit made declarative;
# at scale the partial-aggregate dedups per partition before the
# exchange, exactly the early-out the parameter buys.
# ---------------------------------------------------------------------------

_FE_TERM = "vector"


# ---------------------------------------------------------------------------
# shards.tolerant=true — solr/core/.../handler/component/SearchHandler.java
# + HttpShardHandler.java: with shards.tolerant a failed shard is skipped
# and the response carries partialResults=true; without it the shard error
# propagates. ENGINE-PATH row: two real segments are built from the
# even/odd doc halves, the odd segment's terms table is then destroyed,
# and MultiSearcher.from_catalog(tolerant=True) serves the survivor —
# n_hits comes from a real top-k over the served half, and the
# skipped/partial flags are the row's payload. The oracle derives the
# same numbers from the even half arithmetically.
# ---------------------------------------------------------------------------

_ST_CACHE: dict = {}


@register(
    "shards_tolerant_search",
    """SELECT sum(CASE WHEN doc_id % 2 = 0
             AND list_contains(string_split(text, ' '), 'spark')
             THEN 1 ELSE 0 END)::BIGINT AS n_hits,
       sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_docs_served,
       1::BIGINT AS n_skipped, 1::BIGINT AS partial_results
FROM documents""",
)
def shards_tolerant_search(spark, sf_dir):
    """Tolerant multi-shard search over a catalog with one broken segment."""
    import hashlib as _h
    import shutil

    from ..corpus import documents_as_corpus
    from ..operators.indexer import build_index
    from ..operators.search import MultiSearcher
    from ..sources.catalog import Catalog

    key = sf_dir
    if key not in _ST_CACHE:
        root = "/tmp/spark_graft_tol/" + _h.md5(sf_dir.encode()).hexdigest()[:8]
        shutil.rmtree(root, ignore_errors=True)
        docs = documents_as_corpus(spark, sf_dir)
        cat = Catalog(root)
        build_index(
            spark, docs.filter(F.col("doc_id") % 2 == 0),
            out_dir=root, segment_id="even",
        )
        build_index(
            spark, docs.filter(F.col("doc_id") % 2 == 1),
            out_dir=root, segment_id="odd",
        )
        for s in Catalog(root).segments():
            if s.segment_id == "odd":  # destroy the shard
                shutil.rmtree(f"{s.path}/terms", ignore_errors=True)
        _ST_CACHE[key] = root
    cat = Catalog(_ST_CACHE[key])
    ms = MultiSearcher.from_catalog(spark, cat, tolerant=True)
    n_hits = ms.topk("spark", k=ms.n_docs + 1).count()
    return spark.createDataFrame(
        [(
            int(n_hits),
            int(ms.n_docs),
            int(len(ms.skipped)),
            int(ms.partial_results),
        )],
        "n_hits bigint, n_docs_served bigint, n_skipped bigint, "
        "partial_results bigint",
    )


@register(
    "facet_exists_cap",
    f"""SELECT DISTINCT source AS bucket, 1 AS n
FROM documents
WHERE list_contains(string_split(text, ' '), '{_FE_TERM}')
ORDER BY bucket ASC""",
)
def facet_exists_cap(spark, sf_dir):
    """facet.field=source facet.exists=true over q=text:vector."""
    d = _read(spark, sf_dir, "documents")
    return (
        d.filter(F.array_contains(F.split("text", " "), _FE_TERM))
        .select(F.col("source").alias("bucket"))
        .distinct()
        .withColumn("n", F.lit(1))
        .orderBy(F.asc("bucket"))
    )


# ---------------------------------------------------------------------------
# In-place numeric docvalues update — lucene IndexWriter#updateNumericDocValue
# (LUCENE-5189 docvalues generations) / solr in-place atomic updates
# (AtomicUpdateDocumentMerger#computeInPlaceUpdatableFields). ENGINE-PATH:
# a real segment takes TWO update generations on `_version_` (the one
# field Solr always allows in-place) — gen1 bumps every 10th doc to 2,
# gen2 bumps every 20th to 3, so the newest generation provably overrides
# the older one — and the row reads version counts through the reader's
# overlay view. Postings are untouched (pinned by test: identical top-k
# before/after); the oracle derives the same counts arithmetically.
# ---------------------------------------------------------------------------

_DV_CACHE: dict = {}


@register(
    "dv_inplace_update",
    """SELECT CASE WHEN doc_id % 20 = 0 THEN 3
            WHEN doc_id % 10 = 0 THEN 2 ELSE 1 END::BIGINT AS version,
       count(*)::BIGINT AS n_docs
FROM documents GROUP BY version ORDER BY version ASC""",
)
def dv_inplace_update(spark, sf_dir):
    """Per-version doc counts after two stacked in-place DV generations."""
    import hashlib as _h
    import shutil

    from ..corpus import documents_as_corpus
    from ..operators.indexer import build_index
    from ..operators.updates import update_numeric_docvalue
    from ..sources.catalog import Catalog

    key = sf_dir
    if key not in _DV_CACHE:
        root = "/tmp/spark_graft_dv/" + _h.md5(sf_dir.encode()).hexdigest()[:8]
        shutil.rmtree(root, ignore_errors=True)
        docs = documents_as_corpus(spark, sf_dir)
        build_index(spark, docs, out_dir=root, segment_id="base")
        seg = Catalog(root).segments()[0]
        ids = docs.select(F.col("doc_id"))
        update_numeric_docvalue(
            spark, seg, "_version_",
            ids.filter(F.col("doc_id") % 10 == 0).withColumn("value", F.lit(2)),
        )
        update_numeric_docvalue(
            spark, seg, "_version_",
            ids.filter(F.col("doc_id") % 20 == 0).withColumn("value", F.lit(3)),
        )
        _DV_CACHE[key] = root
    seg = Catalog(_DV_CACHE[key]).segments()[0]
    return (
        seg.stored_fields(spark)
        .groupBy(F.col("_version_").alias("version"))
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.asc("version"))
    )
