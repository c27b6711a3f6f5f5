"""Round-2 session-4 coverage: spatial filters ({!geofilt}/{!bbox}/heatmap
facet), interval facets, recency boosting, grouping headers, ToChildBlockJoin,
and near-dup connected-components clustering.

Each entry re-expresses a reference operator (public lucene-solr path cited
per entry; reference mount is empty, so citations are path#symbol only) over
the driver testdata with a DuckDB oracle using identical column aliases and
matched double-precision formulas. Registered into the same REGISTRY/ORACLES
as driver_queries (imported by __spark_entry__).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ..operators import dedup
from .dataops_queries import _MINHASH_SQL
from .driver_queries import _read, _tokens, register

# ---------------------------------------------------------------------------
# Spatial: coordinates synthesized deterministically from c_custkey with
# IDENTICAL expressions in both engines (testdata carries no geo columns) —
# same convention as geodist_nearest in solr_queries.py.
# ---------------------------------------------------------------------------

_R_KM = 6371.0087714  # Lucene GeoUtils.EARTH_MEAN_RADIUS (km)

_PTS_CTE = """pts AS (
  SELECT c_custkey, c_mktsegment, ((c_custkey % 179) - 89)::DOUBLE AS lat,
         (((c_custkey * 7) % 360) - 180)::DOUBLE AS lon
  FROM customer)"""


def _pts(spark, sf_dir):
    c = _read(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        ((F.col("c_custkey") % 179) - 89).cast("double").alias("lat"),
        (((F.col("c_custkey") * 7) % 360) - 180).cast("double").alias("lon"),
    )


def _haversine_km(lat, lon, clat: float, clon: float):
    """Haversine on the mean-radius sphere (Lucene SloppyMath.haversinMeters
    analog), same operation shape as the SQL mirror."""
    dlat = F.radians(lat - F.lit(clat))
    dlon = F.radians(lon - F.lit(clon))
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(lat)) * F.cos(F.radians(F.lit(clat))) * F.pow(F.sin(dlon / 2), 2)
    )
    return 2 * _R_KM * F.asin(F.sqrt(a))


def _haversine_sql(clat: float, clon: float) -> str:
    return f"""2 * {_R_KM} * asin(sqrt(
      pow(sin(radians(lat - ({clat})) / 2), 2)
      + cos(radians(lat)) * cos(radians({clat}))
        * pow(sin(radians(lon - ({clon})) / 2), 2)))"""


_GF_LAT, _GF_LON, _GF_D = 20.0, 30.0, 3000.0


@register(
    "geofilt_radius",
    f"""WITH {_PTS_CTE},
d AS (SELECT c_mktsegment, {_haversine_sql(_GF_LAT, _GF_LON)} AS dist FROM pts)
SELECT c_mktsegment AS seg, count(*)::BIGINT AS n_within,
       round(min(dist), 3) AS min_km, round(max(dist), 3) AS max_km
FROM d WHERE dist <= {_GF_D} GROUP BY seg ORDER BY seg""",
)
def geofilt_radius(spark, sf_dir):
    """{{!geofilt sfield=loc pt=20,30 d=3000}}: radius filter, counts per
    segment. Reference: solr/core/.../search/SpatialFilterQParserPlugin.java,
    lucene/sandbox LatLonPoint.newDistanceQuery."""
    p = _pts(spark, sf_dir).withColumn(
        "dist", _haversine_km(F.col("lat"), F.col("lon"), _GF_LAT, _GF_LON)
    )
    return (
        p.filter(F.col("dist") <= _GF_D)
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count("*").alias("n_within"),
            F.round(F.min("dist"), 3).alias("min_km"),
            F.round(F.max("dist"), 3).alias("max_km"),
        )
        .orderBy("seg")
    )


# {!bbox}: the approximating lat/lon box around the same circle — box
# half-height = d/R in degrees, half-width widened by 1/cos(lat) at the
# center latitude (solr/core/.../search/SpatialFilterQParserPlugin.java,
# spatial4j DistanceUtils.calcBoxByDistFromPt). The row returns the box
# count AND the circle count so the superset relation is part of the
# checked result.
_BB_DLAT = math.degrees(_GF_D / _R_KM)
_BB_DLON = math.degrees(_GF_D / (_R_KM * math.cos(math.radians(_GF_LAT))))


@register(
    "bbox_filter_count",
    f"""WITH {_PTS_CTE},
d AS (SELECT lat, lon, {_haversine_sql(_GF_LAT, _GF_LON)} AS dist FROM pts)
SELECT count(*) FILTER (WHERE lat BETWEEN {_GF_LAT - _BB_DLAT} AND {_GF_LAT + _BB_DLAT}
                          AND lon BETWEEN {_GF_LON - _BB_DLON} AND {_GF_LON + _BB_DLON})::BIGINT AS n_bbox,
       count(*) FILTER (WHERE dist <= {_GF_D})::BIGINT AS n_circle
FROM d""",
)
def bbox_filter_count(spark, sf_dir):
    """{{!bbox}}: bounding-box approximation of the geofilt circle; returns
    box count and circle count (box ⊇ circle)."""
    p = _pts(spark, sf_dir).withColumn(
        "dist", _haversine_km(F.col("lat"), F.col("lon"), _GF_LAT, _GF_LON)
    )
    in_box = (
        F.col("lat").between(_GF_LAT - _BB_DLAT, _GF_LAT + _BB_DLAT)
        & F.col("lon").between(_GF_LON - _BB_DLON, _GF_LON + _BB_DLON)
    )
    return p.agg(
        F.count(F.when(in_box, 1)).alias("n_bbox"),
        F.count(F.when(F.col("dist") <= _GF_D, 1)).alias("n_circle"),
    )


@register(
    "heatmap_facet_grid",
    f"""WITH {_PTS_CTE}
SELECT CAST(floor(lat / 30.0) AS BIGINT) AS cell_lat,
       CAST(floor(lon / 30.0) AS BIGINT) AS cell_lon,
       count(*)::BIGINT AS n_points
FROM pts GROUP BY 1, 2 ORDER BY cell_lat, cell_lon""",
)
def heatmap_facet_grid(spark, sf_dir):
    """facet.heatmap analog: counts per 30°×30° grid cell (solr/core/...
    /handler/component/SpatialHeatmapFacets.java; lucene spatial-extras
    HeatmapFacetCounter). Grid-cell key is the shuffle key — bounded
    cardinality, no skew."""
    return (
        _pts(spark, sf_dir)
        .groupBy(
            F.floor(F.col("lat") / 30.0).alias("cell_lat"),
            F.floor(F.col("lon") / 30.0).alias("cell_lon"),
        )
        .agg(F.count("*").alias("n_points"))
        .orderBy("cell_lat", "cell_lon")
    )


# ---------------------------------------------------------------------------
# Interval facets (solr/core/.../request/IntervalFacets.java): counts per
# explicitly-listed interval; intervals may overlap (each is an independent
# count, unlike facet.range buckets).
# ---------------------------------------------------------------------------


@register(
    "interval_facet",
    """SELECT count(*) FILTER (WHERE c_acctbal <= 0)::BIGINT AS n_nonpos,
       count(*) FILTER (WHERE c_acctbal > 0 AND c_acctbal < 4500)::BIGINT AS n_low,
       count(*) FILTER (WHERE c_acctbal >= 4500)::BIGINT AS n_high,
       count(*) FILTER (WHERE c_acctbal > 0)::BIGINT AS n_pos
FROM customer""",
)
def interval_facet(spark, sf_dir):
    """facet.interval with overlapping intervals (*,0], (0,4500), [4500,*),
    (0,*) — one independent count per interval in a single pass."""
    c = _read(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.agg(
        F.count(F.when(bal <= 0, 1)).alias("n_nonpos"),
        F.count(F.when((bal > 0) & (bal < 4500), 1)).alias("n_low"),
        F.count(F.when(bal >= 4500, 1)).alias("n_high"),
        F.count(F.when(bal > 0, 1)).alias("n_pos"),
    )


# ---------------------------------------------------------------------------
# Recency boosting (lucene/queries/.../function/valuesource/
# ReciprocalFloatFunction.java; classic Solr boost=recip(ms(NOW,ts),...)).
# NOW pinned (same convention as date_math_range); m chosen so day-scale
# ages map to well-separated scores.
# ---------------------------------------------------------------------------

_NOW_MS = 1705754096000  # 2024-01-20T12:34:56Z


@register(
    "recency_boost_topk",
    f"""SELECT event_id,
       round(value * (1.0 / (1e-9 * ({_NOW_MS} - epoch_ms(ts)) + 1.0)), 6) AS score
FROM events WHERE ts <= TIMESTAMP '2024-01-20 12:34:56'
ORDER BY score DESC, event_id ASC LIMIT 10""",
)
def recency_boost_topk(spark, sf_dir):
    """boost=recip(ms(NOW,ts),1e-9,1,1): base value damped by age; top 10."""
    # ts is TIMESTAMP_NTZ; session timezone is pinned UTC, so the cast
    # interprets it as UTC — same instant DuckDB's epoch_ms(ts) reads.
    ts_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    e = _read(spark, sf_dir, "events").filter(ts_ms <= F.lit(_NOW_MS))
    age = F.lit(_NOW_MS) - ts_ms
    score = F.round(F.col("value") * (F.lit(1.0) / (F.lit(1e-9) * age + F.lit(1.0))), 6)
    return (
        e.select("event_id", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("event_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Grouping result headers (solr/core/.../search/Grouping.java:
# group.ngroups=true / matches): total hit count + distinct group count
# for a grouped query, computed in one aggregation pass.
# ---------------------------------------------------------------------------


@register(
    "group_ngroups",
    """SELECT count(*)::BIGINT AS matches,
       count(DISTINCT l_suppkey)::BIGINT AS ngroups
FROM lineitem WHERE l_quantity > 45""",
)
def group_ngroups(spark, sf_dir):
    """group.ngroups: matches + ngroups header for q=l_quantity>45
    grouped by l_suppkey."""
    li = _read(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return li.agg(
        F.count("*").alias("matches"),
        F.countDistinct("l_suppkey").alias("ngroups"),
    )


# ---------------------------------------------------------------------------
# ToChildBlockJoinQuery (lucene/join/.../ToChildBlockJoinQuery.java): the
# inverse of the parent join — a query on parents selects their children.
# ---------------------------------------------------------------------------


@register(
    "child_block_join",
    """SELECT l.l_returnflag AS flag, count(*)::BIGINT AS n_children,
       round(sum(l.l_quantity), 2) AS sum_qty
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE o.o_totalprice > 300000
GROUP BY flag ORDER BY flag""",
)
def child_block_join(spark, sf_dir):
    """ToChildBlockJoin: parents matching o_totalprice>300000 project to
    their child lineitems (semi-join shaped: only parent keys shuffle)."""
    o = (
        _read(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.join(o, "l_orderkey", "left_semi")
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.count("*").alias("n_children"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy("flag")
    )


# ---------------------------------------------------------------------------
# Near-dup connected components: collapse verified MinHash+LSH pairs into
# duplicate clusters (the "group then keep one" step of corpus dedup).
# Oracle computes the same components via a recursive transitive-closure
# CTE over the identical pair set (fine at sf0.01; the Spark side is the
# scale path — see dedup.connected_components).
# ---------------------------------------------------------------------------


@register(
    "dedup_connected_components",
    f"""WITH RECURSIVE pairs AS ({_MINHASH_SQL}),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
reach(node, r) AS (
    SELECT src, src FROM edges
  UNION
    SELECT e.src, r.r FROM edges e JOIN reach r ON r.node = e.dst
),
comp AS (SELECT node AS doc_id, min(r) AS component FROM reach GROUP BY node)
SELECT component, count(*)::BIGINT AS n_members,
       (count(*) - 1)::BIGINT AS n_removable
FROM comp GROUP BY component ORDER BY component""",
)
def dedup_connected_components(spark, sf_dir):
    """Duplicate clusters from verified near-dup pairs: min-label
    propagation over the pair graph; per-cluster size and number of
    removable docs (keep-one policy)."""
    toks = _tokens(spark, sf_dir)
    pairs = dedup.minhash_lsh_dedup(
        toks, tokens_col="tokens", k=3, n_hashes=12, bands=4, threshold=0.8
    )
    comp = dedup.connected_components(pairs)
    return (
        comp.groupBy("component")
        .agg(
            F.count("*").alias("n_members"),
            (F.count("*") - F.lit(1)).alias("n_removable"),
        )
        .orderBy("component")
    )
