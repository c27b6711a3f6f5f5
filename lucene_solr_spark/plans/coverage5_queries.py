"""Round-4 coverage: the five VERDICT r03 "What's missing" asks — eDisMax,
query-time synonym expansion, topic stream, tree-ensemble LTR, and
point-in-polygon spatial filtering.

Each entry re-expresses a reference operator (public lucene-solr path cited
per entry; reference mount is empty, so citations are path#symbol only) over
the driver testdata with a DuckDB oracle using identical column aliases and
matched float32/float64 formulas. Registered into the same REGISTRY/ORACLES
as driver_queries (imported by __spark_entry__).
"""

from __future__ import annotations

import hashlib as _h

from pyspark.sql import functions as F

from ..functions.analysis import duckdb_tokenize_sql
from ..functions.smallfloat import duckdb_byte4_roundtrip_sql
from .driver_queries import _read, _tokens, register


# ---------------------------------------------------------------------------
# ENGINE-PATH eDisMax — search/ExtendedDismaxQParser.java through the real
# multi-field kernel (operators/edismax.py): q='key order', qf='b t^2'
# (b = the shared full-text segment, t = the first-5-token title segment),
# tie=0.3, mm=2 (both clauses must hit in SOME field), pf='b^1.5' (exact
# "key order" adjacency on the body field boosts passing docs). The oracle
# extends the dismax_engine_topk binary32 mirror with the mm gate and the
# phrase-boost clause: p = f32(f32(idf_key+idf_order over the BODY field)
# · f32(fr / (fr + body byte4 denom))) · 1.5f, added to the f32 clause
# fold; docs failing mm never score. Field reduction order, per-op casts
# and tie arithmetic are byte-for-byte the dismax row's.
# ---------------------------------------------------------------------------


@register(
    "edismax_topk",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS toks FROM documents),
stats AS (SELECT count(*)::BIGINT AS n FROM tokarr),
u AS (SELECT 0 AS fidx, doc_id, toks FROM tokarr
      UNION ALL SELECT 1, doc_id, list_slice(toks, 1, 5) FROM tokarr),
fdl AS (SELECT fidx, doc_id, len(toks) AS dl FROM u),
favg AS (SELECT fidx, (sum(dl)::DOUBLE / count(*)::DOUBLE) AS avgdl
         FROM fdl GROUP BY fidx),
pos AS (SELECT fidx, doc_id, unnest(toks) AS term FROM u),
qt AS (SELECT unnest(['key', 'order']) AS term),
tf AS (SELECT fidx, doc_id, p.term, count(*)::BIGINT AS freq
       FROM pos p JOIN qt USING (term) GROUP BY 1, 2, 3),
fdf AS (SELECT fidx, p.term, count(DISTINCT doc_id)::DOUBLE AS df
        FROM pos p JOIN qt USING (term) GROUP BY 1, 2),
contrib AS (SELECT tf.fidx, tf.doc_id, tf.term,
       (((((ln(1 + ((s.n::DOUBLE) - f.df + 0.5) / (f.df + 0.5)))::FLOAT
           * ((tf.freq::FLOAT)
              / ((tf.freq::FLOAT)
                 + ((1.2::FLOAT)
                    * ((0.25::FLOAT)
                       + (((0.75::FLOAT)
                           * (({duckdb_byte4_roundtrip_sql('d.dl')})::FLOAT))
                          / ((a.avgdl)::FLOAT)))))))::FLOAT)
        * ((CASE tf.fidx WHEN 0 THEN 1.0 ELSE 2.0 END)::FLOAT))::FLOAT) AS s_t
    FROM tf JOIN fdl d ON d.fidx = tf.fidx AND d.doc_id = tf.doc_id
    JOIN fdf f ON f.fidx = tf.fidx AND f.term = tf.term
    JOIN favg a ON a.fidx = tf.fidx CROSS JOIN stats s),
dm AS (SELECT doc_id, term,
              ((list_max(l)
                + (((0.3::FLOAT)
                    * ((list_reduce(l, (x, y) -> (x + y)::FLOAT)
                        - list_max(l))::FLOAT))::FLOAT))::FLOAT) AS dmx
       FROM (SELECT doc_id, term, list(s_t ORDER BY fidx) AS l
             FROM contrib GROUP BY 1, 2)),
mmdocs AS (SELECT doc_id FROM dm GROUP BY doc_id
           HAVING count(DISTINCT term) = 2),
dmscored AS (SELECT doc_id,
                    list_reduce(list(dmx ORDER BY term),
                                (x, y) -> (x + y)::FLOAT) AS score_f
             FROM dm GROUP BY doc_id),
bstat AS (SELECT
       (SELECT df FROM fdf WHERE fidx = 0 AND term = 'key') AS df_key,
       (SELECT df FROM fdf WHERE fidx = 0 AND term = 'order') AS df_order,
       (SELECT avgdl FROM favg WHERE fidx = 0) AS avgdl,
       (SELECT n FROM stats) AS n),
ph AS (SELECT t.doc_id,
         len(list_filter(range(1, len(t.toks)),
                         i -> t.toks[i] = 'key' AND t.toks[i+1] = 'order'))
           AS fr,
         len(t.toks) AS dl
       FROM tokarr t),
psc AS (SELECT ph.doc_id,
       (((((ln(1 + ((b.n::DOUBLE) - b.df_key + 0.5) / (b.df_key + 0.5))
            + ln(1 + ((b.n::DOUBLE) - b.df_order + 0.5) / (b.df_order + 0.5)))::FLOAT
           * ((ph.fr::FLOAT)
              / ((ph.fr::FLOAT)
                 + ((1.2::FLOAT)
                    * ((0.25::FLOAT)
                       + (((0.75::FLOAT)
                           * (({duckdb_byte4_roundtrip_sql('ph.dl')})::FLOAT))
                          / ((b.avgdl)::FLOAT)))))))::FLOAT)
        * (1.5::FLOAT))::FLOAT) AS p
    FROM ph CROSS JOIN bstat b WHERE ph.fr > 0)
SELECT d.doc_id,
       round(((d.score_f + coalesce(p.p, (0.0)::FLOAT))::FLOAT)::DOUBLE, 4)
         AS score
FROM dmscored d JOIN mmdocs USING (doc_id)
LEFT JOIN psc p USING (doc_id)
ORDER BY ((d.score_f + coalesce(p.p, (0.0)::FLOAT))::FLOAT) DESC, d.doc_id ASC
LIMIT 10""",
)
def edismax_topk(spark, sf_dir):
    """Real-engine eDisMax top-10: q='key order', qf='b t^2', tie=0.3,
    mm=2, pf='b^1.5' — float32-exact cross-engine."""
    from ..operators.edismax import edismax_topk as _edx
    from .coverage3_queries import _title_segment
    from .solr_queries import _engine_searcher

    s = _engine_searcher(spark, sf_dir)
    res = _edx(
        spark,
        {"b": s.segment, "t": _title_segment(spark, sf_dir)},
        {"q": "key order", "qf": "b t^2", "tie": 0.3, "mm": "2",
         "pf": "b^1.5"},
        k=10,
    )
    return res.select(
        "doc_id", F.round(F.col("score").cast("double"), 4).alias("score")
    )


# ---------------------------------------------------------------------------
# ENGINE-PATH eDisMax bq/bf/boost — DisMaxQParser#getBoostQueries /
# getBoostFunctions and BoostQParserPlugin through the same kernel: the
# base edismax_topk request (q='key order', qf='b t^2', tie=0.3, mm=2,
# pf='b^1.5') plus bq='t:window^0.5' (additive title-field BM25, never
# gates), bf='recip(dl,1,100,100)' (additive 100/(dl+100) over the BODY
# dl — EXACT dl from the norms table, f64 eval, one f32 cast) and
# boost='sqrt(dl)' (multiplicative, applied last). The oracle extends the
# edismax_topk mirror with the same pinned order: f32 clause fold + bq +
# pf + bf, then × boost.
# ---------------------------------------------------------------------------


@register(
    "edismax_boost_topk",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS toks FROM documents),
stats AS (SELECT count(*)::BIGINT AS n FROM tokarr),
u AS (SELECT 0 AS fidx, doc_id, toks FROM tokarr
      UNION ALL SELECT 1, doc_id, list_slice(toks, 1, 5) FROM tokarr),
fdl AS (SELECT fidx, doc_id, len(toks) AS dl FROM u),
favg AS (SELECT fidx, (sum(dl)::DOUBLE / count(*)::DOUBLE) AS avgdl
         FROM fdl GROUP BY fidx),
pos AS (SELECT fidx, doc_id, unnest(toks) AS term FROM u),
qt AS (SELECT unnest(['key', 'order']) AS term),
tf AS (SELECT fidx, doc_id, p.term, count(*)::BIGINT AS freq
       FROM pos p JOIN qt USING (term) GROUP BY 1, 2, 3),
fdf AS (SELECT fidx, p.term, count(DISTINCT doc_id)::DOUBLE AS df
        FROM pos p JOIN qt USING (term) GROUP BY 1, 2),
contrib AS (SELECT tf.fidx, tf.doc_id, tf.term,
       (((((ln(1 + ((s.n::DOUBLE) - f.df + 0.5) / (f.df + 0.5)))::FLOAT
           * ((tf.freq::FLOAT)
              / ((tf.freq::FLOAT)
                 + ((1.2::FLOAT)
                    * ((0.25::FLOAT)
                       + (((0.75::FLOAT)
                           * (({duckdb_byte4_roundtrip_sql('d.dl')})::FLOAT))
                          / ((a.avgdl)::FLOAT)))))))::FLOAT)
        * ((CASE tf.fidx WHEN 0 THEN 1.0 ELSE 2.0 END)::FLOAT))::FLOAT) AS s_t
    FROM tf JOIN fdl d ON d.fidx = tf.fidx AND d.doc_id = tf.doc_id
    JOIN fdf f ON f.fidx = tf.fidx AND f.term = tf.term
    JOIN favg a ON a.fidx = tf.fidx CROSS JOIN stats s),
dm AS (SELECT doc_id, term,
              ((list_max(l)
                + (((0.3::FLOAT)
                    * ((list_reduce(l, (x, y) -> (x + y)::FLOAT)
                        - list_max(l))::FLOAT))::FLOAT))::FLOAT) AS dmx
       FROM (SELECT doc_id, term, list(s_t ORDER BY fidx) AS l
             FROM contrib GROUP BY 1, 2)),
mmdocs AS (SELECT doc_id FROM dm GROUP BY doc_id
           HAVING count(DISTINCT term) = 2),
dmscored AS (SELECT doc_id,
                    list_reduce(list(dmx ORDER BY term),
                                (x, y) -> (x + y)::FLOAT) AS score_f
             FROM dm GROUP BY doc_id),
wtf AS (SELECT doc_id, count(*)::BIGINT AS freq
        FROM pos WHERE fidx = 1 AND term = 'window' GROUP BY 1),
wdf AS (SELECT count(DISTINCT doc_id)::DOUBLE AS df
        FROM pos WHERE fidx = 1 AND term = 'window'),
bqs AS (SELECT w.doc_id,
       (((((ln(1 + ((s.n::DOUBLE) - wd.df + 0.5) / (wd.df + 0.5)))::FLOAT
           * ((w.freq::FLOAT)
              / ((w.freq::FLOAT)
                 + ((1.2::FLOAT)
                    * ((0.25::FLOAT)
                       + (((0.75::FLOAT)
                           * (({duckdb_byte4_roundtrip_sql('d.dl')})::FLOAT))
                          / ((a.avgdl)::FLOAT)))))))::FLOAT)
        * (0.5::FLOAT))::FLOAT) AS bqv
    FROM wtf w JOIN fdl d ON d.fidx = 1 AND d.doc_id = w.doc_id
    JOIN favg a ON a.fidx = 1 CROSS JOIN wdf wd CROSS JOIN stats s
    WHERE wd.df > 0),
bstat AS (SELECT
       (SELECT df FROM fdf WHERE fidx = 0 AND term = 'key') AS df_key,
       (SELECT df FROM fdf WHERE fidx = 0 AND term = 'order') AS df_order,
       (SELECT avgdl FROM favg WHERE fidx = 0) AS avgdl,
       (SELECT n FROM stats) AS n),
ph AS (SELECT t.doc_id,
         len(list_filter(range(1, len(t.toks)),
                         i -> t.toks[i] = 'key' AND t.toks[i+1] = 'order'))
           AS fr,
         len(t.toks) AS dl
       FROM tokarr t),
psc AS (SELECT ph.doc_id,
       (((((ln(1 + ((b.n::DOUBLE) - b.df_key + 0.5) / (b.df_key + 0.5))
            + ln(1 + ((b.n::DOUBLE) - b.df_order + 0.5) / (b.df_order + 0.5)))::FLOAT
           * ((ph.fr::FLOAT)
              / ((ph.fr::FLOAT)
                 + ((1.2::FLOAT)
                    * ((0.25::FLOAT)
                       + (((0.75::FLOAT)
                           * (({duckdb_byte4_roundtrip_sql('ph.dl')})::FLOAT))
                          / ((b.avgdl)::FLOAT)))))))::FLOAT)
        * (1.5::FLOAT))::FLOAT) AS p
    FROM ph CROSS JOIN bstat b WHERE ph.fr > 0),
dlb AS (SELECT doc_id, dl FROM fdl WHERE fidx = 0),
fin AS (SELECT d.doc_id,
       ((((d.score_f + coalesce(bq.bqv, (0.0)::FLOAT))::FLOAT
            + coalesce(p.p, (0.0)::FLOAT))::FLOAT
            + ((100.0 / ((b.dl::DOUBLE) + 100.0))::FLOAT))::FLOAT
          * ((sqrt(b.dl::DOUBLE))::FLOAT))::FLOAT AS score_f
    FROM dmscored d JOIN mmdocs USING (doc_id)
    LEFT JOIN bqs bq USING (doc_id)
    LEFT JOIN psc p USING (doc_id)
    JOIN dlb b USING (doc_id))
SELECT doc_id, round(score_f::DOUBLE, 4) AS score
FROM fin ORDER BY score_f DESC, doc_id ASC LIMIT 10""",
)
def edismax_boost_topk(spark, sf_dir):
    """eDisMax with bq/bf/boost: the base edismax_topk request plus
    bq='t:window^0.5', bf='recip(dl,1,100,100)', boost='sqrt(dl)' over
    the body dl — float32-exact cross-engine."""
    from ..operators.edismax import edismax_topk as _edx
    from .coverage3_queries import _title_segment
    from .solr_queries import _engine_searcher

    s = _engine_searcher(spark, sf_dir)
    res = _edx(
        spark,
        {"b": s.segment, "t": _title_segment(spark, sf_dir)},
        {"q": "key order", "qf": "b t^2", "tie": 0.3, "mm": "2",
         "pf": "b^1.5", "bq": "t:window^0.5",
         "bf": "recip(dl,1,100,100)", "boost": "sqrt(dl)", "dv": "b"},
        k=10,
    )
    return res.select(
        "doc_id", F.round(F.col("score").cast("double"), 4).alias("score")
    )


# ---------------------------------------------------------------------------
# ENGINE-PATH query-time synonym expansion — SynonymGraphFilter applied in
# the QUERY analyzer (the common deployment: synonyms change without
# reindexing). Query 'spark' under the rule 'spark, big data' rewrites to
# Bool(should = (Term('spark'), Phrase('big','data'))) against the PLAIN
# index (functions/synonyms.py#expand_query_synonyms; QueryBuilder's
# graph-query branch), scored by the ordinary tree scorer: f32 clause fold
# in clause order — term BM25 + literal-bigram phrase BM25 (idf summed
# over the phrase terms' PLAIN dfs). A doc matching either clause matches
# (default-OR, msm 1).
# ---------------------------------------------------------------------------


@register(
    "synonym_query_time",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS t FROM documents),
per_doc AS (SELECT doc_id, len(t) AS dl,
       len(list_filter(t, x -> x = 'spark'))::BIGINT AS tf_spark,
       len(list_filter(range(1, len(t)), i -> t[i] = 'big' AND t[i+1] = 'data'))
         ::BIGINT AS bigr,
       list_contains(t, 'big') AS has_big,
       list_contains(t, 'data') AS has_data
    FROM tokarr),
stats AS (SELECT count(*)::BIGINT AS n_docs,
       (sum(dl)::DOUBLE / count(*)::DOUBLE) AS avgdl,
       count(*) FILTER (tf_spark > 0)::DOUBLE AS df_spark,
       count(*) FILTER (has_big)::DOUBLE AS df_big,
       count(*) FILTER (has_data)::DOUBLE AS df_data
    FROM per_doc),
scored AS (SELECT d.doc_id,
    ((CASE WHEN d.tf_spark > 0 THEN
        (((ln(1 + ((s.n_docs::DOUBLE) - s.df_spark + 0.5) / (s.df_spark + 0.5)))::FLOAT
          * ((d.tf_spark::FLOAT)
             / ((d.tf_spark::FLOAT)
                + ((1.2::FLOAT)
                   * ((0.25::FLOAT)
                      + (((0.75::FLOAT)
                          * (({duckdb_byte4_roundtrip_sql('d.dl')})::FLOAT))
                         / ((s.avgdl)::FLOAT)))))))::FLOAT)
      ELSE (0.0)::FLOAT END
      +
      CASE WHEN d.bigr > 0 THEN
        (((ln(1 + ((s.n_docs::DOUBLE) - s.df_big + 0.5) / (s.df_big + 0.5))
           + ln(1 + ((s.n_docs::DOUBLE) - s.df_data + 0.5) / (s.df_data + 0.5)))::FLOAT
          * ((d.bigr::FLOAT)
             / ((d.bigr::FLOAT)
                + ((1.2::FLOAT)
                   * ((0.25::FLOAT)
                      + (((0.75::FLOAT)
                          * (({duckdb_byte4_roundtrip_sql('d.dl')})::FLOAT))
                         / ((s.avgdl)::FLOAT)))))))::FLOAT)
      ELSE (0.0)::FLOAT END)::FLOAT) AS score_f
    FROM per_doc d CROSS JOIN stats s
    WHERE d.tf_spark > 0 OR d.bigr > 0)
SELECT doc_id, round(score_f::DOUBLE, 4) AS score
FROM scored ORDER BY score_f DESC, doc_id ASC LIMIT 10""",
)
def synonym_query_time(spark, sf_dir):
    """Query-time synonyms over the PLAIN index: 'spark' expands to
    Term(spark) OR Phrase(big data), float32-exact cross-engine."""
    from ..functions.synonyms import parse_synonym_rules
    from .solr_queries import _engine_searcher

    s = _engine_searcher(spark, sf_dir)
    rules = parse_synonym_rules(["spark, big data"])
    res = s.search_synonyms("spark", rules, k=10)
    return res.select(
        "doc_id", F.round(F.col("score").cast("double"), 4).alias("score")
    )


# ---------------------------------------------------------------------------
# LTR tree-ensemble re-rank — solr/contrib/ltr/.../model/
# MultipleAdditiveTreesModel.java (operators/ltr.py): the same first-pass
# window and named features as ltr_rerank (tf from postings, dl from
# norms, n_chars from doc values), scored by a 3-tree literal ensemble.
# BOTH engines' scoring expressions are generated from the ONE model
# literal below (trees_score_col / trees_score_sql), so the comparison
# pins the compiler, not hand-copied arithmetic.
# ---------------------------------------------------------------------------

_LTR_TREES = [
    {"weight": 1.0, "root": {
        "feature": "tf_stream", "threshold": 1.0,
        "left": {"feature": "dl", "threshold": 40.0,
                 "left": {"value": 0.2}, "right": {"value": 0.1}},
        "right": {"feature": "tf_data", "threshold": 0.0,
                  "left": {"value": 0.5}, "right": {"value": 0.9}}}},
    {"weight": 0.5, "root": {
        "feature": "n_chars", "threshold": 200.0,
        "left": {"value": -0.1},
        "right": {"feature": "tf_stream", "threshold": 2.0,
                  "left": {"value": 0.3}, "right": {"value": 0.6}}}},
    {"weight": 2.0, "root": {
        "feature": "tf_data", "threshold": 1.0,
        "left": {"value": 0.05}, "right": {"value": 0.25}}},
]

_LTR_T_N = 50  # re-rank window


def _ltr_trees_sql() -> str:
    from ..operators.ltr import trees_score_sql

    return trees_score_sql(
        _LTR_TREES,
        {"tf_stream": "fp.tf_stream", "tf_data": "fp.tf_data",
         "dl": "fp.dl", "n_chars": "fp.n_chars"},
    )


_LTR_TOKS_CTE = (
    f"toks AS (SELECT doc_id, unnest({duckdb_tokenize_sql('text')}) AS term "
    "FROM documents)"
)


@register(
    "ltr_trees_rerank",
    f"""WITH {_LTR_TOKS_CTE},
feat AS (SELECT t.doc_id,
                sum(CASE WHEN t.term = 'stream' THEN 1 ELSE 0 END)::BIGINT AS tf_stream,
                sum(CASE WHEN t.term = 'data' THEN 1 ELSE 0 END)::BIGINT AS tf_data,
                count(*)::BIGINT AS dl
         FROM toks t GROUP BY t.doc_id),
fp AS (SELECT f.doc_id, f.tf_stream, f.tf_data, f.dl, d.n_chars,
              row_number() OVER (ORDER BY f.tf_stream DESC, f.doc_id ASC) AS rnk
       FROM feat f JOIN documents d ON d.doc_id = f.doc_id
       WHERE f.tf_stream > 0)
SELECT doc_id, round({_ltr_trees_sql()}, 6) AS score
FROM fp WHERE rnk <= {_LTR_T_N}
ORDER BY score DESC, doc_id ASC LIMIT 10""",
)
def ltr_trees_rerank(spark, sf_dir):
    """MultipleAdditiveTreesModel re-rank of the top-{_LTR_T_N} window:
    the ensemble compiles to one nested CASE Column (whole-stage codegen,
    no UDF) — re-ranking at 100 TB is a projection over the window."""
    from ..operators.ltr import trees_score_col

    toks = _toks_flat_c5(spark, sf_dir)
    feat = toks.groupBy("doc_id").agg(
        F.sum(F.when(F.col("term") == "stream", 1).otherwise(0)).alias("tf_stream"),
        F.sum(F.when(F.col("term") == "data", 1).otherwise(0)).alias("tf_data"),
        F.count("*").alias("dl"),
    )
    docs = _read(spark, sf_dir, "documents").select("doc_id", "n_chars")
    # first-pass window selection as TakeOrderedAndProject (distributed),
    # not a global row_number window (single-partition at scale); the
    # selected set and order are identical to the oracle's rnk <= N
    fp = (
        feat.join(docs, "doc_id")
        .filter(F.col("tf_stream") > 0)
        .orderBy(F.desc("tf_stream"), F.asc("doc_id"))
        .limit(_LTR_T_N)
    )
    score = trees_score_col(
        _LTR_TREES,
        {"tf_stream": F.col("tf_stream"), "tf_data": F.col("tf_data"),
         "dl": F.col("dl"), "n_chars": F.col("n_chars")},
    )
    return (
        fp.select("doc_id", F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


def _toks_flat_c5(spark, sf_dir):
    return _tokens(spark, sf_dir).select(
        "doc_id", F.explode("tokens").alias("term")
    )


# ---------------------------------------------------------------------------
# Point-in-polygon spatial filter — lucene/core/.../document/LatLonShape
# .java + LatLonPoint#newPolygonQuery (Polygon2D's crossing test; Solr RPT
# polygon filtering): crossing-number (ray cast) against a NON-CONVEX
# polygon, division-free (each upward edge contributes iff the point is
# strictly left of it — the classic robust formulation), compiled to ONE
# boolean Column of literal multiplications (codegen; at scale the filter
# rides the scan like any predicate). Coordinates synthesized from
# c_custkey exactly like the other spatial rows; vertices sit on .5
# offsets so no synthesized point ever lies on an edge.
# ---------------------------------------------------------------------------

# an L-shaped (reflex corner at (15.5, 15.5)) polygon in (lat, lon)
_POLY = [
    (0.5, 0.5), (40.5, 0.5), (40.5, 15.5),
    (15.5, 15.5), (15.5, 40.5), (0.5, 40.5),
]


def _poly_edges():
    n = len(_POLY)
    for i in range(n):
        (y1, x1), (y2, x2) = _POLY[i], _POLY[(i + 1) % n]
        if y1 == y2:
            continue  # horizontal edges never cross the upward ray test
        if y1 < y2:
            yield (y1, x1, y2, x2)
        else:
            yield (y2, x2, y1, x1)


def _poly_inside_col(lat, lon):
    crossings = None
    for ylo, xlo, yhi, xhi in _poly_edges():
        c = (
            (lat >= F.lit(ylo)) & (lat < F.lit(yhi))
            & (
                (F.lit(xhi - xlo) * (lat - F.lit(ylo))
                 - (lon - F.lit(xlo)) * F.lit(yhi - ylo)) > F.lit(0.0)
            )
        ).cast("int")
        crossings = c if crossings is None else crossings + c
    return (crossings % 2) == 1


def _poly_inside_sql() -> str:
    parts = []
    for ylo, xlo, yhi, xhi in _poly_edges():
        parts.append(
            f"(CASE WHEN lat >= {ylo!r} AND lat < {yhi!r} "
            f"AND (({xhi - xlo!r} * (lat - {ylo!r})) "
            f"- ((lon - {xlo!r}) * {yhi - ylo!r})) > 0.0 "
            "THEN 1 ELSE 0 END)"
        )
    return "((" + " + ".join(parts) + ") % 2) = 1"


_PTS_CTE_C5 = """pts AS (
  SELECT c_custkey, c_mktsegment, ((c_custkey % 179) - 89)::DOUBLE AS lat,
         (((c_custkey * 7) % 360) - 180)::DOUBLE AS lon
  FROM customer)"""


@register(
    "geo_polygon_filter",
    f"""WITH {_PTS_CTE_C5}
SELECT c_mktsegment AS segment, count(*) AS n_inside
FROM pts WHERE {_poly_inside_sql()}
GROUP BY 1 ORDER BY 1""",
)
def geo_polygon_filter(spark, sf_dir):
    """Non-convex point-in-polygon filter, counts per market segment.
    Both engines evaluate the SAME division-free crossing expression
    generated from the one vertex literal."""
    c = _read(spark, sf_dir, "customer")
    pts = c.select(
        "c_mktsegment",
        ((F.col("c_custkey") % 179) - 89).cast("double").alias("lat"),
        (((F.col("c_custkey") * 7) % 360) - 180).cast("double").alias("lon"),
    )
    return (
        pts.filter(_poly_inside_col(F.col("lat"), F.col("lon")))
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("n_inside"))
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# Topic stream — solr/solrj/.../io/stream/TopicStream.java
# (streaming/topic.py): a checkpointed subscriber over the catalog. The
# row builds a 2-segment catalog, drains it with a FRESH checkpoint (all
# docs), commits a third segment, then drains again with a NEW consumer
# instance reading the SAME checkpoint file (the restart path) — only the
# new segment's docs arrive. Counts are pinned against plain SQL over the
# source table; exactly-once across the simulated restart is what makes
# the second count 100 and not n+100.
# ---------------------------------------------------------------------------

_TOPIC_CACHE: dict = {}


@register(
    "topic_stream_drain",
    """SELECT 1 AS drain, (SELECT count(*) FROM documents)::BIGINT AS n_docs
UNION ALL
SELECT 2, (SELECT count(*) FROM documents WHERE doc_id < 100)::BIGINT
ORDER BY drain""",
)
def topic_stream_drain(spark, sf_dir):
    """Two checkpointed topic drains around a new-segment commit."""
    if sf_dir not in _TOPIC_CACHE:
        import os
        import shutil

        from ..corpus import documents_as_corpus
        from ..operators.indexer import build_index
        from ..sources.catalog import Catalog
        from ..streaming.topic import TopicStream

        root = "/tmp/spark_graft_topic/" + _h.md5(sf_dir.encode()).hexdigest()[:8]
        shutil.rmtree(root, ignore_errors=True)
        docs = documents_as_corpus(spark, sf_dir)
        half = docs.count() // 2
        cat = Catalog(root)
        for i, pred in enumerate(
            [F.col("doc_id") < half, F.col("doc_id") >= half]
        ):
            build_index(spark, docs.filter(pred), out_dir=root, segment_id=f"t{i}")
            cat.commit_swap(add=[f"t{i}"])
        ckpt = os.path.join(root, "topic_ckpt.json")
        n1 = TopicStream(cat, ckpt).drain(spark).count()
        # new docs arrive as a third committed segment
        extra = docs.filter(F.col("doc_id") < 100).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000
        )
        build_index(spark, extra, out_dir=root, segment_id="t2")
        cat.commit_swap(add=["t2"])
        # a NEW consumer instance (restart) resumes from the checkpoint
        n2 = TopicStream(cat, ckpt).drain(spark).count()
        _TOPIC_CACHE[sf_dir] = (int(n1), int(n2))
    n1, n2 = _TOPIC_CACHE[sf_dir]
    return spark.createDataFrame(
        [(1, n1), (2, n2)], "drain int, n_docs long"
    )


# ---------------------------------------------------------------------------
# Tokenizer variants — analysis/core/{Whitespace,Letter,Keyword}Tokenizer
# .java alongside the pinned standard spec (functions/analysis.py): one
# whole-stage-codegen pass computes each tokenizer's per-doc counts, then
# F.stack unpivots to (tokenizer, n_tokens, n_docs_nonempty) rows. Closes
# the §2.H "tokenizer variants" partial with oracled conformance counts.
# ---------------------------------------------------------------------------


def _tokvar_oracle_sql() -> str:
    from ..functions.analysis import (
        keyword_tokens_sql,
        letter_tokens_sql,
        whitespace_tokens_sql,
    )

    return f"""WITH per_doc AS (SELECT
       len({duckdb_tokenize_sql('text')}) AS n_std,
       len({whitespace_tokens_sql('text')}) AS n_ws,
       len({letter_tokens_sql('text')}) AS n_lt,
       len({keyword_tokens_sql('text')}) AS n_kw
    FROM documents)
SELECT * FROM (
  SELECT 'keyword' AS tokenizer, sum(n_kw)::BIGINT AS n_tokens,
         count(*) FILTER (n_kw > 0)::BIGINT AS n_docs_nonempty FROM per_doc
  UNION ALL
  SELECT 'letter', sum(n_lt)::BIGINT, count(*) FILTER (n_lt > 0)::BIGINT FROM per_doc
  UNION ALL
  SELECT 'standard', sum(n_std)::BIGINT, count(*) FILTER (n_std > 0)::BIGINT FROM per_doc
  UNION ALL
  SELECT 'whitespace', sum(n_ws)::BIGINT, count(*) FILTER (n_ws > 0)::BIGINT FROM per_doc
) ORDER BY tokenizer"""


@register("tokenizer_variants", _tokvar_oracle_sql())
def tokenizer_variants(spark, sf_dir):
    """Per-tokenizer corpus totals: one codegen pass + stack unpivot."""
    from ..functions.analysis import (
        keyword_tokens_col,
        letter_tokens_col,
        tokens_col,
        whitespace_tokens_col,
    )

    d = _read(spark, sf_dir, "documents").select(F.col("text").alias("content"))
    sizes = d.select(
        F.size(tokens_col("content")).alias("n_std"),
        F.size(whitespace_tokens_col("content")).alias("n_ws"),
        F.size(letter_tokens_col("content")).alias("n_lt"),
        F.size(keyword_tokens_col("content")).alias("n_kw"),
    )
    agg = sizes.agg(
        F.sum("n_std").alias("s_std"),
        F.sum("n_ws").alias("s_ws"),
        F.sum("n_lt").alias("s_lt"),
        F.sum("n_kw").alias("s_kw"),
        F.sum((F.col("n_std") > 0).cast("long")).alias("d_std"),
        F.sum((F.col("n_ws") > 0).cast("long")).alias("d_ws"),
        F.sum((F.col("n_lt") > 0).cast("long")).alias("d_lt"),
        F.sum((F.col("n_kw") > 0).cast("long")).alias("d_kw"),
    )
    return agg.select(
        F.expr(
            "stack(4, 'keyword', s_kw, d_kw, 'letter', s_lt, d_lt, "
            "'standard', s_std, d_std, 'whitespace', s_ws, d_ws) "
            "AS (tokenizer, n_tokens, n_docs_nonempty)"
        )
    ).orderBy("tokenizer")
