"""Round-5 widening batch #9: the update() stream (search-to-collection
reindex pipe).

Each entry re-expresses a reference component (public lucene-solr
path#symbol cited per entry; the reference mount is empty) over the driver
testdata with a DuckDB oracle using identical column aliases.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .driver_queries import _read, register

# ---------------------------------------------------------------------------
# update stream — solrj/io/stream/UpdateStream.java (with CommitStream as
# the epilogue): drain an inner tuple stream into a DESTINATION collection
# — the streaming-expression reindex/ETL pipe
# (`commit(dest, update(dest, search(src, ...)))`). ENGINE-PATH: the inner
# stream is a real unscored DocSet search (Searcher.match_docs) joined
# back to stored fields; the drain is ingest_batch into a second catalog
# (same tlog-idempotent segment build as any micro-batch — the
# CommitStream's commit is the manifest swap); the row reads its answer
# from the DESTINATION's own stored fields. At scale nothing passes
# through the driver: search -> semi-join -> build is one lazy plan.
# ---------------------------------------------------------------------------

_US_TERM = "vector"
_US_CACHE: dict = {}


@register(
    "update_stream_reindex",
    f"""SELECT lang, count(*)::BIGINT AS n_docs
FROM documents
WHERE list_contains(string_split(text, ' '), '{_US_TERM}')
GROUP BY lang ORDER BY lang ASC""",
)
def update_stream_reindex(spark, sf_dir):
    """update(dest, search(src, q=text:vector)): per-lang counts read from
    the destination collection after the pipe runs."""
    import hashlib as _h
    import shutil

    from ..corpus import documents_as_corpus
    from ..operators.indexer import build_index
    from ..operators.search import Searcher
    from ..sources.catalog import Catalog
    from ..streaming.ingest import ingest_batch

    key = sf_dir
    if key not in _US_CACHE:
        root = "/tmp/spark_graft_us/" + _h.md5(sf_dir.encode()).hexdigest()[:8]
        shutil.rmtree(root, ignore_errors=True)
        src_seg = build_index(
            spark,
            documents_as_corpus(spark, sf_dir),
            out_dir=f"{root}/src",
            segment_id="src",
        )
        searcher = Searcher(spark, src_seg)
        # inner stream: matching DocSet -> stored tuples (corpus shape)
        tuples = (
            src_seg.stored_fields(spark)
            .join(searcher.match_docs(_US_TERM), "doc_id", "left_semi")
            .drop("_version_")
        )
        dest = Catalog(f"{root}/dest")
        ingest_batch(dest, tuples, batch_id=0, stream_id="upd-")
        _US_CACHE[key] = root
    dest = Catalog(f"{_US_CACHE[key]}/dest")
    segs = dest.segments()
    assert len(segs) == 1
    return (
        segs[0]
        .stored_fields(spark)
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.asc("lang"))
    )


# ---------------------------------------------------------------------------
# Dynamic range facets — lucene/facet/src/java/org/apache/lucene/facet/
# range/DynamicRangeUtil.java (computeDynamicRanges): split a numeric
# field into N ranges holding ~equal WEIGHT (doc count here, weight 1
# per doc) and report each range's bounds + count — the "let the data
# pick the buckets" sibling of the fixed-bounds `facet_range`. Both
# engines compute the same equal-frequency split via ntile(N) over the
# sorted values (ties broken by the value order itself, deterministic on
# this data), then min/max/count per tile — one window + one agg, no
# driver-side quantile pass. Scale note: a global ntile is a
# single-partition sort, the same full value sort the reference's
# computeDynamicRanges performs on its collected array; the 100 TB
# variant swaps it for repartitionByRange + per-partition offsets (or
# approx_percentile bounds), trading exact equal weights for
# distribution — this row pins the exact-bounds semantics.
# ---------------------------------------------------------------------------

_DR_N = 4


@register(
    "dynamic_range_facet",
    f"""WITH t AS (SELECT o_totalprice AS v,
            ntile({_DR_N}) OVER (ORDER BY o_totalprice ASC) AS tile
     FROM orders)
SELECT tile, min(v) AS lo, max(v) AS hi, count(*)::BIGINT AS n_docs
FROM t GROUP BY tile ORDER BY tile ASC""",
)
def dynamic_range_facet(spark, sf_dir):
    """DynamicRangeUtil: 4 equal-weight ranges over o_totalprice."""
    from pyspark.sql import Window

    o = _read(spark, sf_dir, "orders")
    w = Window.orderBy(F.asc("o_totalprice"))
    t = o.select(
        F.col("o_totalprice").alias("v"), F.ntile(_DR_N).over(w).alias("tile")
    )
    return (
        t.groupBy("tile")
        .agg(
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.count("*").alias("n_docs"),
        )
        .orderBy(F.asc("tile"))
    )
