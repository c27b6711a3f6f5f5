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

from ..functions.analysis import duckdb_tokenize_sql
from ..operators import dedup
from .dataops_queries import _MINHASH_SQL
from .driver_queries import _read, _tokens, register

_TOKS_CTE = (
    f"toks AS (SELECT doc_id, unnest({duckdb_tokenize_sql('text')}) AS term "
    "FROM documents)"
)

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


# ---------------------------------------------------------------------------
# Atomic updates + optimistic concurrency as a driver-visible row
# (update/processor/AtomicUpdateDocumentMerger.java 'set' op,
# DistributedUpdateProcessor.java#versionAdd conflict semantics — the
# engine path in operators/updates.py, previously pytest-only). Exact
# counts make the row oracle-able: the oracle derives the same numbers
# arithmetically from the base table.
# ---------------------------------------------------------------------------

_AU_CACHE: dict = {}


@register(
    "atomic_update_conflicts",
    """SELECT count(*) FILTER (WHERE doc_id % 7 = 0)::BIGINT AS n_updated,
       count(*) FILTER (WHERE doc_id % 7 = 1)::BIGINT AS n_rejected,
       count(*) FILTER (WHERE doc_id % 7 = 0)::BIGINT AS n_lang_xx,
       count(*)::BIGINT AS n_live
FROM documents""",
)
def atomic_update_conflicts(spark, sf_dir):
    """Atomic 'set lang' batch: doc_id%7==0 sends the correct
    _expected_version_ (1, accepted; version bumps, old doc tombstoned,
    merged doc lands in a fresh segment); doc_id%7==1 sends a stale
    version (99, rejected). Live stored-field counts prove replace-not-add
    semantics."""
    import hashlib as _h
    import shutil

    from ..corpus import documents_as_corpus
    from ..operators.indexer import build_index
    from ..operators.updates import _live_docs, atomic_update
    from ..sources.catalog import Catalog

    key = sf_dir
    if key not in _AU_CACHE:
        root = "/tmp/spark_graft_au/" + _h.md5(sf_dir.encode()).hexdigest()[:8]
        shutil.rmtree(root, ignore_errors=True)
        docs = documents_as_corpus(spark, sf_dir)
        cat = Catalog(root)
        build_index(spark, docs, out_dir=root, segment_id="base")
        cat.commit_swap(add=["base"])
        upd_ok = docs.filter(F.col("doc_id") % 7 == 0).select(
            "repo", "path", "commit",
            F.lit("xx").alias("lang"),
            F.lit(1).cast("long").alias("_expected_version_"),
        )
        upd_stale = docs.filter(F.col("doc_id") % 7 == 1).select(
            "repo", "path", "commit",
            F.lit("xx").alias("lang"),
            F.lit(99).cast("long").alias("_expected_version_"),
        )
        res = atomic_update(
            spark, cat, upd_ok.unionByName(upd_stale), set_fields=["lang"]
        )
        live = _live_docs(spark, cat)
        n_xx = live.filter(F.col("lang") == "xx").count()
        n_live = live.count()
        _AU_CACHE[key] = (res.n_updated, res.n_rejected, n_xx, n_live)
    nu, nr, nx, nl = _AU_CACHE[key]
    return spark.createDataFrame(
        [(nu, nr, nx, nl)],
        "n_updated long, n_rejected long, n_lang_xx long, n_live long",
    )


# ---------------------------------------------------------------------------
# Watermarked tumbling-window streaming aggregation, driver-visible
# (streaming/windowed.py). Three availableNow drains: events before
# Jan 15 -> the rest -> one LATE duplicate of the oldest event. The
# parquet sink then holds exactly the windows the final watermark
# (max ts - 1h) closed, and the late row was dropped — both facts are
# what the oracle checks (a leaked late row would bump a count; an
# unemitted/duplicated window would change the row set).
# ---------------------------------------------------------------------------

_WIN_US = 21_600_000_000  # 6 hours
_WM_US = 3_600_000_000  # 1 hour watermark delay

_SW_CACHE: dict = {}


@register(
    "stream_tumbling_watermark",
    f"""WITH wm AS (SELECT max(epoch_us(ts)) - {_WM_US} AS wm_us FROM events),
agg AS (SELECT (epoch_us(ts) // {_WIN_US}) * {_WIN_US} AS win_us, event_type,
               count(*)::BIGINT AS n_events
        FROM events GROUP BY 1, 2)
SELECT win_us::BIGINT AS window_start_us, event_type, n_events
FROM agg, wm WHERE win_us + {_WIN_US} <= wm.wm_us
ORDER BY window_start_us, event_type""",
)
def stream_tumbling_watermark(spark, sf_dir):
    """Incremental (window, event_type) counts: append-mode emission of
    watermark-closed windows across resumed drains, late input dropped."""
    import hashlib as _h
    import shutil

    from ..streaming.windowed import tumbling_counts_available

    key = sf_dir
    if key not in _SW_CACHE:
        root = "/tmp/spark_graft_sw/" + _h.md5(sf_dir.encode()).hexdigest()[:8]
        shutil.rmtree(root, ignore_errors=True)
        ev = _read(spark, sf_dir, "events")
        batches = [
            ev.filter(F.col("ts") < "2024-01-15"),
            ev.filter(F.col("ts") >= "2024-01-15"),
            ev.orderBy("ts").limit(1),  # late: below the restored watermark
        ]
        for b in batches:
            b.coalesce(1).write.mode("append").parquet(root + "/in")
            tumbling_counts_available(
                spark, root + "/in", root + "/out", root + "/ckpt"
            )
        _SW_CACHE[key] = root
    out = spark.read.parquet(_SW_CACHE[key] + "/out")
    return (
        out.select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "event_type",
            F.col("count").alias("n_events"),
        )
        .orderBy("window_start_us", "event_type")
    )


# ---------------------------------------------------------------------------
# Terms component (solr/core/.../handler/component/TermsComponent.java:
# terms.prefix + terms.limit enumeration with docFreq/totalTermFreq) —
# ENGINE-PATH row: reads the built segment's terms dictionary, so the
# index's per-term stats are checked directly against raw-text SQL.
# ---------------------------------------------------------------------------


@register(
    "terms_component_enum",
    f"""WITH {_TOKS_CTE}
SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS ttf
FROM toks WHERE term LIKE 'sp%'
GROUP BY term ORDER BY df DESC, term ASC LIMIT 10""",
)
def terms_component_enum(spark, sf_dir):
    """terms.prefix=sp: enumerate matching terms from the terms dict with
    docFreq and totalTermFreq (no postings decode — dictionary-only)."""
    from .solr_queries import _engine_searcher

    s = _engine_searcher(spark, sf_dir)
    terms = s.segment.table(spark, "terms")
    return (
        terms.filter(F.col("term").startswith("sp"))
        .select("term", "df", "ttf")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Index metadata / Luke handler (solr/core/.../handler/admin/LukeRequestHandler
# .java; lucene CheckIndex stats): corpus-level invariants read from the
# segment manifest + terms dict, checked against raw-text SQL. ENGINE-PATH.
# ---------------------------------------------------------------------------


@register(
    "index_metadata_stats",
    f"""WITH {_TOKS_CTE}
SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
       count(DISTINCT term)::BIGINT AS n_terms,
       count(*)::BIGINT AS sum_ttf,
       (SELECT max(df) FROM (SELECT count(DISTINCT doc_id) AS df FROM toks GROUP BY term) t)::BIGINT AS max_df
FROM toks""",
)
def index_metadata_stats(spark, sf_dir):
    """Luke-style index overview: numDocs, numTerms, sumTotalTermFreq,
    max docFreq — manifest stats + one terms-dict aggregation."""
    from .solr_queries import _engine_searcher

    s = _engine_searcher(spark, sf_dir)
    terms = s.segment.table(spark, "terms")
    return terms.agg(
        F.lit(s.stats.n_docs).cast("long").alias("n_docs"),
        F.count("*").alias("n_terms"),
        F.sum("ttf").cast("long").alias("sum_ttf"),
        F.max("df").cast("long").alias("max_df"),
    )


# ---------------------------------------------------------------------------
# Deterministic train/test split (training-data pipeline op): hash-based
# stratification — split membership is a pure function of the doc key, so
# any partitioning / cluster size yields the same split (no sampling RNG).
# ---------------------------------------------------------------------------


@register(
    "train_test_split_stats",
    """WITH tagged AS (
  SELECT source,
         CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 90
              THEN 'train' ELSE 'test' END AS split
  FROM documents)
SELECT source, split, count(*)::BIGINT AS n_docs
FROM tagged GROUP BY source, split ORDER BY source, split""",
)
def train_test_split_stats(spark, sf_dir):
    """90/10 train/test split by md5(doc_id) bucket, counts per source —
    deterministic, shuffle-free tagging (the split survives any repartition)."""
    d = _read(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast("long") % 100
    return (
        d.select(
            "source",
            F.when(bucket < 90, "train").otherwise("test").alias("split"),
        )
        .groupBy("source", "split")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("source", "split")
    )


# ---------------------------------------------------------------------------
# Reverse search / percolation (lucene/monitor/.../Monitor.java,
# TermFilteredPresearcher): a REGISTERED SET OF QUERIES is matched against
# a stream of documents. The presearcher trick is re-expressed Spark-first:
# a (query, term) table inner-joins the exploded doc tokens to produce
# candidates (docs sharing >=1 query term — never all (doc, query) pairs),
# then the full predicate (AND / OR / adjacency phrase) verifies candidates
# only, from the token array.
# ---------------------------------------------------------------------------

_MONITOR_QUERIES = [
    ("q_and", ["spark", "join"], "and", None),
    ("q_or", ["merge", "stream"], "or", None),
    ("q_phrase", ["order", "batch"], "phrase", ("order", "batch")),
]


def _monitor_oracle_sql() -> str:
    parts = []
    for qid, terms, op, phrase in _MONITOR_QUERIES:
        if op == "and":
            pred = " AND ".join(f"list_contains(t, '{t_}')" for t_ in terms)
        elif op == "or":
            pred = " OR ".join(f"list_contains(t, '{t_}')" for t_ in terms)
        else:
            a, b = phrase
            pred = (
                f"EXISTS (SELECT 1 FROM unnest(range(1, len(t))) ix(i) "
                f"WHERE t[i] = '{a}' AND t[i+1] = '{b}')"
            )
        parts.append(
            f"SELECT '{qid}' AS qid, count(*)::BIGINT AS n_docs FROM tokarr WHERE {pred}"
        )
    return " UNION ALL ".join(parts)


@register(
    "monitor_reverse_search",
    f"""WITH tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS t FROM documents),
per_q AS ({_monitor_oracle_sql()})
SELECT qid, n_docs FROM per_q ORDER BY qid""",
)
def monitor_reverse_search(spark, sf_dir):
    """Monitor/percolator: per registered query, how many incoming docs
    match. Candidate pruning by shared term, then array-predicate verify."""
    toks = _tokens(spark, sf_dir).select("doc_id", "tokens")
    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms, _, _ in _MONITOR_QUERIES for t in terms],
        "qid string, term string",
    )
    cand = (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        .join(F.broadcast(qterms), "term")
        .select("doc_id", "qid")
        .distinct()
        .join(toks, "doc_id")
    )
    verified = []
    for qid, terms, op, phrase in _MONITOR_QUERIES:
        c = cand.filter(F.col("qid") == qid)
        if op == "and":
            pred = None
            for t_ in terms:
                p = F.array_contains("tokens", t_)
                pred = p if pred is None else (pred & p)
        elif op == "or":
            pred = None
            for t_ in terms:
                p = F.array_contains("tokens", t_)
                pred = p if pred is None else (pred | p)
        else:
            a, b = phrase
            pred = F.exists(
                F.zip_with(
                    F.slice(F.col("tokens"), 1, F.greatest(F.size("tokens") - 1, F.lit(0))),
                    F.slice(F.col("tokens"), 2, F.greatest(F.size("tokens") - 1, F.lit(0))),
                    lambda x, y: (x == F.lit(a)) & (y == F.lit(b)),
                ),
                lambda m: m,
            )
        verified.append(
            c.filter(pred).agg(
                F.lit(qid).alias("qid"), F.count("*").alias("n_docs")
            )
        )
    out = verified[0]
    for v in verified[1:]:
        out = out.unionByName(v)
    return out.orderBy("qid")


# ---------------------------------------------------------------------------
# Scored query-time join (lucene/join/.../JoinUtil.java#createJoinQuery,
# ScoreMode.Max / Avg): the to-side doc takes the max (and avg) of its
# matching from-side scores. From-side score is a function query
# (o_totalprice / 1000) over orders with priority '1-URGENT'.
# ---------------------------------------------------------------------------


@register(
    "join_score_max",
    """SELECT c.c_custkey,
       round(max(o.o_totalprice / 1000.0), 6) AS score_max,
       round(avg(o.o_totalprice / 1000.0), 6) AS score_avg
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY c.c_custkey ORDER BY score_max DESC, c_custkey ASC LIMIT 10""",
)
def join_score_max(spark, sf_dir):
    """{!join score=max}: to-side score = max/avg of from-side function
    scores (only the (key, score) pair shuffles — never the from rows)."""
    o = (
        _read(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(
            F.col("o_custkey").alias("c_custkey"),
            (F.col("o_totalprice") / 1000.0).alias("s"),
        )
    )
    c = _read(spark, sf_dir, "customer").select("c_custkey")
    return (
        c.join(o, "c_custkey")
        .groupBy("c_custkey")
        .agg(
            F.round(F.max("s"), 6).alias("score_max"),
            F.round(F.avg("s"), 6).alias("score_avg"),
        )
        .orderBy(F.desc("score_max"), F.asc("c_custkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# facet.prefix (solr/core/.../request/SimpleFacets.java#getFacetTermEnumCounts
# prefix filtering) and JSON-facet bucket sort by a nested stat
# (solr/core/.../search/facet/FacetField.java 'sort':'stat desc').
# ---------------------------------------------------------------------------


@register(
    "facet_prefix_top",
    """SELECT source AS bucket, count(*)::BIGINT AS n_docs
FROM documents WHERE source LIKE 'src1%'
GROUP BY source ORDER BY n_docs DESC, bucket ASC LIMIT 10""",
)
def facet_prefix_top(spark, sf_dir):
    """facet.field=source facet.prefix=src1: only buckets with the prefix."""
    d = _read(spark, sf_dir, "documents")
    return (
        d.filter(F.col("source").startswith("src1"))
        .groupBy(F.col("source").alias("bucket"))
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("bucket"))
        .limit(10)
    )


@register(
    "facet_sort_by_stat",
    """SELECT c_mktsegment AS bucket,
       round(sum(c_acctbal), 2) AS sum_bal, count(*)::BIGINT AS n
FROM customer GROUP BY c_mktsegment
ORDER BY sum_bal DESC, bucket ASC""",
)
def facet_sort_by_stat(spark, sf_dir):
    """JSON facet with 'sort': 'sum_bal desc' — buckets ordered by a
    nested aggregate, not by count."""
    c = _read(spark, sf_dir, "customer")
    return (
        c.groupBy(F.col("c_mktsegment").alias("bucket"))
        .agg(
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
            F.count("*").alias("n"),
        )
        .orderBy(F.desc("sum_bal"), F.asc("bucket"))
    )
