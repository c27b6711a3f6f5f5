"""Round-5 widening batch #2: intervals before/overlapping combinators,
multi-select faceting with tag exclusion, and early-terminated top-k over
an index-sorted segment.

Each entry re-expresses a reference operator (public lucene-solr
path#symbol cited per entry; the reference mount is empty) over the driver
testdata with a DuckDB oracle using identical column aliases.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .coverage10_queries import (
    _IV_BASE,
    _IVU_A,
    _IVU_B,
    _IVU_C,
    _interval_count_udf,
    _pairs_cte,
)
from .driver_queries import _read, _tokens, register

# ---------------------------------------------------------------------------
# Intervals before / overlapping — queries/intervals/Intervals.java#before
# / #overlapping (IntervalFunction.BEFORE, OverlappingIntervalsSource).
# Kernel + pinned semantics in operators/intervals.py; random-case parity
# vs the brute-force spec in tests/test_intervals.py. The SQL oracles use
# the proven consecutive-differing-pairs characterization of minimal
# unordered(a, b) intervals (coverage10's shared _pairs_cte); position
# base (DuckDB 1-based vs engine 0-based) cancels in every comparison
# used.
# ---------------------------------------------------------------------------


@register(
    "interval_before_count",
    f"""WITH {_IV_BASE},
{_pairs_cte("mins", _IVU_A, _IVU_B)}
SELECT m.doc_id, count(*)::BIGINT AS n_intervals
FROM mins m
WHERE EXISTS (SELECT 1 FROM pos p WHERE p.doc_id = m.doc_id
              AND p.term = '{_IVU_C}' AND p.pos > m.e)
GROUP BY m.doc_id
ORDER BY n_intervals DESC, doc_id ASC LIMIT 10""",
)
def interval_before_count(spark, sf_dir):
    """Intervals.before(unordered(key, order), hash): source intervals
    that end before some 'hash' occurrence."""
    from ..operators.intervals import IBefore, ITerm, IUnordered

    node = IBefore(IUnordered(ITerm(_IVU_A), ITerm(_IVU_B)), ITerm(_IVU_C))
    toks = _tokens(spark, sf_dir)
    return (
        toks.select("doc_id", _interval_count_udf(node)("tokens").alias("n_intervals"))
        .filter(F.col("n_intervals") > 0)
        .orderBy(F.desc("n_intervals"), F.asc("doc_id"))
        .limit(10)
    )


@register(
    "interval_overlapping_count",
    f"""WITH {_IV_BASE},
{_pairs_cte("src", _IVU_A, _IVU_B)},
{_pairs_cte("ref", _IVU_A, _IVU_C)}
SELECT m.doc_id, count(*)::BIGINT AS n_intervals
FROM src m
WHERE EXISTS (SELECT 1 FROM ref r WHERE r.doc_id = m.doc_id
              AND m.s <= r.e AND r.s <= m.e)
GROUP BY m.doc_id
ORDER BY n_intervals DESC, doc_id ASC LIMIT 10""",
)
def interval_overlapping_count(spark, sf_dir):
    """Intervals.overlapping(unordered(key, order), unordered(key, hash)):
    source intervals sharing at least one position with a reference
    interval."""
    from ..operators.intervals import IOverlapping, ITerm, IUnordered

    node = IOverlapping(
        IUnordered(ITerm(_IVU_A), ITerm(_IVU_B)),
        IUnordered(ITerm(_IVU_A), ITerm(_IVU_C)),
    )
    toks = _tokens(spark, sf_dir)
    return (
        toks.select("doc_id", _interval_count_udf(node)("tokens").alias("n_intervals"))
        .filter(F.col("n_intervals") > 0)
        .orderBy(F.desc("n_intervals"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Multi-select faceting (tagged filter exclusion) —
# search/facet/FacetRequest.java domain 'excludeTags' +
# request/SimpleFacets.java '{!ex=tag}' over fq '{!tag=tag}'. Two applied
# filters (lang:en tagged L, source:src1 tagged S); each facet recomputes
# counts with ITS OWN field's filter excluded — the standard faceted-nav
# UI contract. Operator: operators/facets.py#multiselect_facets (one
# grouped agg per facet over the shared pushed-filter scan; top-k via
# TakeOrderedAndProject, no windows, no driver loop).
# ---------------------------------------------------------------------------


@register(
    "facet_multiselect_exclude",
    """WITH l AS (
  SELECT lang AS bucket, count(*)::BIGINT AS n_docs FROM documents
  WHERE source = 'src1' GROUP BY lang
  ORDER BY n_docs DESC, bucket ASC LIMIT 5
), s AS (
  SELECT source AS bucket, count(*)::BIGINT AS n_docs FROM documents
  WHERE lang = 'en' GROUP BY source
  ORDER BY n_docs DESC, bucket ASC LIMIT 5
)
SELECT * FROM (
  SELECT 'lang' AS facet, bucket, n_docs FROM l
  UNION ALL SELECT 'source' AS facet, bucket, n_docs FROM s
) ORDER BY facet ASC, n_docs DESC, bucket ASC""",
)
def facet_multiselect_exclude(spark, sf_dir):
    """fq={!tag=L}lang:en & fq={!tag=S}source:src1;
    facet.field={!ex=L}lang + facet.field={!ex=S}source."""
    from ..operators.facets import multiselect_facets

    d = _read(spark, sf_dir, "documents")
    out = multiselect_facets(
        d,
        {"L": F.col("lang") == "en", "S": F.col("source") == "src1"},
        [("lang", "lang", {"L"}), ("source", "source", {"S"})],
        limit=5,
    )
    return out.orderBy(F.asc("facet"), F.desc("n_docs"), F.asc("bucket"))


# ---------------------------------------------------------------------------
# Early-terminated top-k over an index-sorted segment —
# index/IndexWriterConfig.java#setIndexSort (LUCENE-6766) +
# search/TopFieldCollector.java early termination / solr
# 'segmentTerminateEarly'. The segment is built with doc ids RANKED BY the
# sort key (length(content), then path) — the index sort — so top-k by
# that sort is the first k doc ids: ONE doc-space bucket scanned
# (operators/search.py#sorted_index_topk), never a corpus sort. The
# oracle performs the full ORDER BY the engine skipped.
# ---------------------------------------------------------------------------

_SORTED_SEG_CACHE: dict = {}
_ET_BUCKET_DOCS = 64


def _sorted_segment(spark, sf_dir):
    """One length-sorted segment per sf_dir (bucket_docs=64 so sf0.01's
    500 docs span 8 buckets and bucket pruning is non-degenerate)."""
    if sf_dir not in _SORTED_SEG_CACHE:
        from ..corpus import documents_as_corpus
        from ..operators.indexer import build_index

        c = documents_as_corpus(spark, sf_dir).drop("doc_id")
        # _len rides into the docmap as a stored column — the sort field's
        # doc values, which Lucene's index sorting requires too
        c = c.withColumn("_len", F.length("content"))
        _SORTED_SEG_CACHE[sf_dir] = build_index(
            spark, c, out_dir=None, bucket_docs=_ET_BUCKET_DOCS,
            index_sort=["_len", "path"],
        )
    return _SORTED_SEG_CACHE[sf_dir]


@register(
    "sorted_early_terminate",
    """SELECT row_number() OVER (ORDER BY length(text), CAST(doc_id AS VARCHAR)) AS rk,
       doc_id AS orig_doc_id, length(text)::BIGINT AS n_chars
FROM documents ORDER BY rk LIMIT 10""",
)
def sorted_early_terminate(spark, sf_dir):
    """Top-10 shortest docs via index-sort early termination: scan bucket
    0 of the length-sorted docmap, never sort the corpus."""
    from ..operators.search import sorted_index_topk

    seg = _sorted_segment(spark, sf_dir)
    top = sorted_index_topk(spark, seg, 10, sort=["_len", "path"])
    return top.select(
        (F.col("doc_id") + 1).alias("rk"),
        F.col("path").cast("long").alias("orig_doc_id"),
        F.length("content").alias("n_chars"),
    ).orderBy("rk")


# ---------------------------------------------------------------------------
# Intervals.prefix — queries/intervals/Intervals.java#prefix (multi-term
# interval source): the prefix expands against the segment TERMS DICT (the
# reference walks the terms enum and ORs the matches, failing past 128
# expansions) and the expansion feeds the same minimal-interval kernel as
# any other disjunction. ordered(prefix("s"), join): an s* term followed
# by 'join', minimal semantics. The expansion collect is a driver-side
# constant bounded by the 128 cap (and by vocabulary, never corpus).
# ---------------------------------------------------------------------------

_IV_PREFIX, _IV_PREFIX_CAP = "s", 128


@register(
    "interval_prefix_count",
    f"""WITH {_IV_BASE},
lead AS (SELECT a.doc_id, a.pos AS s, min(b.pos) AS e
         FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.pos > a.pos
                               AND b.term = 'join'
         WHERE a.term LIKE '{_IV_PREFIX}%' GROUP BY a.doc_id, a.pos),
mins AS (SELECT l.doc_id, l.s, l.e FROM lead l
         WHERE NOT EXISTS (SELECT 1 FROM pos p
                           WHERE p.doc_id = l.doc_id
                             AND p.term LIKE '{_IV_PREFIX}%'
                             AND p.pos > l.s AND p.pos < l.e))
SELECT doc_id, count(*)::BIGINT AS n_intervals
FROM mins GROUP BY doc_id
ORDER BY n_intervals DESC, doc_id ASC LIMIT 10""",
)
def interval_prefix_count(spark, sf_dir):
    """Intervals.ordered(Intervals.prefix('s'), join): terms-dict prefix
    expansion into the ordered minimal-interval kernel."""
    from ..operators.intervals import IOr, IOrdered, ITerm
    from .solr_queries import _engine_searcher

    s = _engine_searcher(spark, sf_dir)
    # shared terms-dict walk; cap+1 so over-broad prefixes REFUSE rather
    # than silently truncate
    expanded = s.expand_terms(prefix=_IV_PREFIX, max_expansions=_IV_PREFIX_CAP + 1)
    if len(expanded) > _IV_PREFIX_CAP:
        raise ValueError(
            f"prefix '{_IV_PREFIX}' expanded to {len(expanded)} terms "
            f"(> {_IV_PREFIX_CAP}) — Intervals.prefix refuses"
        )
    node = IOrdered(IOr(*[ITerm(t) for t in sorted(expanded)]), ITerm("join"))
    toks = _tokens(spark, sf_dir)
    return (
        toks.select("doc_id", _interval_count_udf(node)("tokens").alias("n_intervals"))
        .filter(F.col("n_intervals") > 0)
        .orderBy(F.desc("n_intervals"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# facet2D stream — solrj/io/stream/Facet2DStream.java: two-dimensional
# facet with independent per-dimension limits (top-x outer buckets by
# total count, top-y inner buckets within each). Spark shape: ONE grouped
# agg over (x, y); the top-x outer set is a TakeOrderedAndProject
# broadcast-joined back (x-limit bounded), inner top-y a window over the
# bounded outer partitions — no driver loop, one shuffle on the pair key.
# ---------------------------------------------------------------------------


@register(
    "facet2d_stream",
    """WITH xy AS (
  SELECT lang, source, count(*)::BIGINT AS n_docs FROM documents
  GROUP BY lang, source
), x AS (
  SELECT lang, sum(n_docs) AS nx FROM xy GROUP BY lang
  ORDER BY nx DESC, lang ASC LIMIT 3
), r AS (
  SELECT xy.lang, xy.source, xy.n_docs,
         row_number() OVER (PARTITION BY xy.lang
                            ORDER BY xy.n_docs DESC, xy.source ASC) AS rn
  FROM xy JOIN x USING (lang)
)
SELECT lang, source, n_docs FROM r WHERE rn <= 2
ORDER BY lang ASC, n_docs DESC, source ASC""",
)
def facet2d_stream(spark, sf_dir):
    """facet2D(documents, x=lang, y=source, dimensions='3,2', count(*))."""
    from pyspark.sql import Window

    d = _read(spark, sf_dir, "documents")
    xy = d.groupBy("lang", "source").agg(F.count("*").alias("n_docs"))
    top_x = (
        xy.groupBy("lang")
        .agg(F.sum("n_docs").alias("nx"))
        .orderBy(F.desc("nx"), F.asc("lang"))
        .limit(3)
        .select("lang")
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n_docs"), F.asc("source"))
    return (
        xy.join(F.broadcast(top_x), "lang")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("lang", "source", "n_docs")
        .orderBy(F.asc("lang"), F.desc("n_docs"), F.asc("source"))
    )


# ---------------------------------------------------------------------------
# Stats over a function query — handler/component/StatsComponent.java with
# stats.field={!func}product(l_extendedprice, sub(1, l_discount)): the
# stats bundle computed over a ValueSource instead of a stored field.
# Money sums via DECIMAL cast for exact cross-engine equality
# (stats_component's pinned discipline).
# ---------------------------------------------------------------------------


@register(
    "stats_function_query",
    """SELECT l_returnflag,
  count(*) AS cnt,
  round(min(l_extendedprice * (1 - l_discount)), 2) AS min_v,
  round(max(l_extendedprice * (1 - l_discount)), 2) AS max_v,
  sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS sum_v,
  round(avg(l_quantity * l_discount), 6) AS avg_qd
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
)
def stats_function_query(spark, sf_dir):
    """stats.field={!func}product(l_extendedprice, sub(1, l_discount)),
    grouped by return flag."""
    li = _read(spark, sf_dir, "lineitem")
    v = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.min(v), 2).alias("min_v"),
            F.round(F.max(v), 2).alias("max_v"),
            F.sum(v.cast("decimal(18,4)")).alias("sum_v"),
            F.round(F.avg(F.col("l_quantity") * F.col("l_discount")), 6).alias(
                "avg_qd"
            ),
        )
        .orderBy("l_returnflag")
    )


@register(
    "interval_after_count",
    f"""WITH {_IV_BASE},
{_pairs_cte("mins", _IVU_A, _IVU_B)}
SELECT m.doc_id, count(*)::BIGINT AS n_intervals
FROM mins m
WHERE EXISTS (SELECT 1 FROM pos p WHERE p.doc_id = m.doc_id
              AND p.term = '{_IVU_C}' AND p.pos < m.s)
GROUP BY m.doc_id
ORDER BY n_intervals DESC, doc_id ASC LIMIT 10""",
)
def interval_after_count(spark, sf_dir):
    """Intervals.after(unordered(key, order), hash): source intervals
    that start after some 'hash' occurrence (Intervals.java#after,
    the mirror of #before — same kernel, same pairs oracle)."""
    from ..operators.intervals import IAfter, ITerm, IUnordered

    node = IAfter(IUnordered(ITerm(_IVU_A), ITerm(_IVU_B)), ITerm(_IVU_C))
    toks = _tokens(spark, sf_dir)
    return (
        toks.select("doc_id", _interval_count_udf(node)("tokens").alias("n_intervals"))
        .filter(F.col("n_intervals") > 0)
        .orderBy(F.desc("n_intervals"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# group.main=true — search/grouping (solr GroupingSpecification#setMain):
# the grouped result flattened back into one main doc list (format=simple),
# i.e. the per-group top docs merged under the global sort. One bounded
# window per group + a TakeOrderedAndProject — identical plan shape to
# group_topk_per_key, but the OUTPUT contract is the flat list.
# ---------------------------------------------------------------------------


@register(
    "group_main_flat",
    """WITH r AS (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents
)
SELECT doc_id, lang, n_chars FROM r WHERE rn <= 2
ORDER BY n_chars DESC, doc_id ASC LIMIT 10""",
)
def group_main_flat(spark, sf_dir):
    """group.field=lang group.limit=2 group.main=true: per-group top-2 by
    n_chars flattened into one main list under the global sort."""
    from pyspark.sql import Window

    d = _read(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("doc_id", "lang", "n_chars")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Query elevation with markExcludes —
# handler/component/QueryElevationComponent.java exclude=true entries:
# excluded ids are REMOVED from the organic results entirely (vs elevated
# ids pinned on top). Complements the forceElevation row
# (solr_queries.query_elevation).
# ---------------------------------------------------------------------------

_ELEV_TOP, _ELEV_EXCLUDED = 7, 3


def _elev_excl_sql() -> str:
    from .driver_queries import _TOKS_CTE

    return f"""WITH {_TOKS_CTE},
tf AS (SELECT doc_id, count(*)::BIGINT AS score FROM toks
       WHERE term = 'order' GROUP BY doc_id),
organic AS (SELECT doc_id, score,
                   row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
            FROM tf WHERE doc_id NOT IN ({_ELEV_TOP}, {_ELEV_EXCLUDED}))
SELECT doc_id, score FROM (
  SELECT {_ELEV_TOP}::BIGINT AS doc_id,
         coalesce((SELECT score FROM tf WHERE doc_id = {_ELEV_TOP}), 0) AS score,
         0 AS grp, 1 AS rnk
  UNION ALL SELECT doc_id, score, 1, rn FROM organic
) ORDER BY grp ASC, rnk ASC LIMIT 10"""


@register("elevation_mark_excludes", _elev_excl_sql())
def elevation_mark_excludes(spark, sf_dir):
    """q=order: doc 7 elevated, doc 3 mark-excluded (dropped from the
    organic list), organic tf ranking follows."""
    from pyspark.sql import Window

    toks = _tokens(spark, sf_dir)
    tf = (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        .filter(F.col("term") == "order")
        .groupBy("doc_id")
        .agg(F.count("*").alias("score"))
    )
    elev = spark.createDataFrame([(_ELEV_TOP, 1)], "doc_id long, rnk int")
    pinned = (
        elev.join(tf, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("score", F.lit(0)).cast("long").alias("score"),
            F.lit(0).alias("grp"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )
    organic = (
        tf.filter(~F.col("doc_id").isin(_ELEV_TOP, _ELEV_EXCLUDED))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .select(
            "doc_id",
            "score",
            F.lit(1).alias("grp"),
            # bounded window: input is the limit(10) organic head
            F.row_number()
            .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
            .cast("long")
            .alias("rnk"),
        )
    )
    return (
        pinned.unionByName(organic)
        .orderBy(F.asc("grp"), F.asc("rnk"))
        .limit(10)
        .select("doc_id", "score")
    )


@register(
    "interval_contained_by_count",
    f"""WITH {_IV_BASE},
{_pairs_cte("big", _IVU_A, _IVU_B)}
SELECT p.doc_id, count(*)::BIGINT AS n_intervals
FROM pos p
WHERE p.term = '{_IVU_C}'
  AND EXISTS (SELECT 1 FROM big b WHERE b.doc_id = p.doc_id
              AND b.s <= p.pos AND p.pos <= b.e)
GROUP BY p.doc_id
ORDER BY n_intervals DESC, doc_id ASC LIMIT 10""",
)
def interval_contained_by_count(spark, sf_dir):
    """Intervals.containedBy(hash, unordered(key, order)): 'hash'
    occurrences lying inside some source interval
    (queries/intervals/Intervals.java#containedBy,
    FilteringIntervalsSource — the little-side filter, complementing the
    big-side containing/notContaining rows)."""
    from ..operators.intervals import IContainedBy, ITerm, IUnordered

    node = IContainedBy(
        ITerm(_IVU_C), IUnordered(ITerm(_IVU_A), ITerm(_IVU_B))
    )
    toks = _tokens(spark, sf_dir)
    return (
        toks.select("doc_id", _interval_count_udf(node)("tokens").alias("n_intervals"))
        .filter(F.col("n_intervals") > 0)
        .orderBy(F.desc("n_intervals"), F.asc("doc_id"))
        .limit(10)
    )
