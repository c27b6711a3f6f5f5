"""JSON Facet API executor with an explicit aggregate registry.

Reference semantics being re-expressed (SURVEY.md §2.E / §2.J):
  solr/core/src/java/org/apache/solr/search/facet/FacetModule.java — the
    json.facet request executor (terms / query / range facets, nested)
  search/facet/AggValueSource.java + FacetAgg subclasses — the pluggable
    aggregate functions (sum/avg/min/max/unique/percentile/stddev/...);
    THIS registry is that extension point (VERDICT r02 §2.J partial):
    ``@register_agg("name")`` plugs a user aggregate in exactly like
    Solr's ValueSourceParser plugin registration.

Spark restatement: every facet level is ONE grouped aggregation (partial
aggregation map-side, small keys on the shuffle); per-parent-bucket
``limit`` is a window row_number over the bucket keys — never a driver
loop, never a collect. Nested subfacets recurse with the parent's group
keys prepended, then broadcast-join back onto the parent frame (bucket
cardinality is facet-limit bounded, hence always broadcastable). At 100 TB
the scan dominates and each nesting level adds exactly one shuffle on
(parent keys, field) — the same partial/final refinement story as
distributed Solr facets, minus the refinement pass (exact in one pass).

Aggregate expressions in specs are strings — ``"avg(n_chars)"``,
``"percentile(n_chars, 90)"`` — parsed against the registry so custom
registrations are addressable from specs with zero extra plumbing.
"""

from __future__ import annotations

import re
from typing import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# name -> factory(field, *params) -> Column (an unevaluated aggregate)
AGG_REGISTRY: dict[str, Callable[..., Column]] = {}


def register_agg(name: str):
    """AggValueSource plugin point: ``@register_agg("mystat")`` makes
    ``"mystat(field)"`` usable inside any facet spec."""

    def deco(fn: Callable[..., Column]):
        AGG_REGISTRY[name] = fn
        return fn

    return deco


# ---- built-in aggregate pack (search/facet/*Agg.java) ----------------------
register_agg("sum")(lambda c: F.sum(c))
register_agg("avg")(lambda c: F.avg(c))
register_agg("min")(lambda c: F.min(c))
register_agg("max")(lambda c: F.max(c))
register_agg("unique")(lambda c: F.countDistinct(c))
register_agg("hll")(lambda c: F.approx_count_distinct(c))
register_agg("missing")(lambda c: F.count(F.when(F.col(c).isNull(), 1)))
register_agg("countvals")(lambda c: F.count(c))
register_agg("stddev")(lambda c: F.stddev_samp(c))
register_agg("variance")(lambda c: F.var_samp(c))
register_agg("sumsq")(lambda c: F.sum(F.col(c) * F.col(c)))
register_agg("percentile")(
    lambda c, p=50: F.percentile_approx(c, float(p) / 100.0, 10000)
)

_AGG_RE = re.compile(r"^\s*(\w+)\s*\(\s*([\w.]+)\s*(?:,\s*([^)]*))?\)\s*$")


def parse_agg(expr: str) -> Column:
    """``"avg(n_chars)"`` / ``"percentile(n_chars, 90)"`` -> Column via the
    registry. Unknown names raise with the registered inventory."""
    m = _AGG_RE.match(expr)
    if not m:
        raise ValueError(f"unparsable aggregate expression: {expr!r}")
    name, field, params = m.group(1), m.group(2), m.group(3)
    if name not in AGG_REGISTRY:
        raise ValueError(
            f"unknown aggregate {name!r}; registered: {sorted(AGG_REGISTRY)}"
        )
    args = [p.strip() for p in params.split(",")] if params else []
    return AGG_REGISTRY[name](field, *args)


def _sort_cols(sort: str, default_desc: str = "count"):
    field, _, direction = (sort or f"{default_desc} desc").partition(" ")
    col = F.col(field)
    return [col.desc() if direction != "asc" else col.asc()]


def json_facet(df: DataFrame, spec: dict) -> DataFrame:
    """Execute a (nested) facet spec against ``df``.

    Spec shapes (FacetRequest.java JSON):
      terms: {"type": "terms", "field": "lang", "limit": 5,
              "sort": "count desc", "facet": {"avg_len": "avg(n_chars)",
              "by_src": {"type": "terms", "field": "source", "limit": 1}}}
      query: {"type": "query", "q": "n_chars > 100", "facet": {...stats}}
      range: {"type": "range", "field": "n_chars", "start": 0, "end": 500,
              "gap": 100, "facet": {...stats}}

    Returns one flattened row per innermost bucket; bucket-key columns are
    the facet fields (range buckets emit ``<field>_start``), stat columns
    carry their spec names, nested buckets prefix their columns with the
    subfacet name."""
    return _facet_node(df, spec, parents=[])


def _stat_aggs(spec: dict):
    stats = {k: v for k, v in spec.get("facet", {}).items() if isinstance(v, str)}
    return [parse_agg(v).alias(k) for k, v in stats.items()]


def _facet_node(df: DataFrame, spec: dict, parents: list[str]) -> DataFrame:
    ftype = spec.get("type", "terms")
    if ftype == "query":
        # FacetQuery.java: one filtered aggregation, grouped by the parent
        # keys when nested (a constant grouping at the top level)
        filtered = df.filter(spec["q"])
        if parents:
            return filtered.groupBy(*parents).agg(
                F.count("*").alias("count"), *_stat_aggs(spec)
            )
        return filtered.agg(F.count("*").alias("count"), *_stat_aggs(spec))
    if ftype == "range":
        # FacetRange.java: arithmetic bucketing — no per-bucket filters,
        # ONE grouped agg over floor((v - start)/gap) (hardened buckets)
        field, start = spec["field"], spec["start"]
        end, gap = spec["end"], spec["gap"]
        v = F.col(field)
        bucket_start = (
            F.floor((v - F.lit(start)) / F.lit(gap)) * F.lit(gap) + F.lit(start)
        ).alias(f"{field}_start")
        keys = [*parents, f"{field}_start"]
        return (
            df.filter((v >= F.lit(start)) & (v < F.lit(end)))
            .withColumn(f"{field}_start", bucket_start)
            .groupBy(*keys)
            .agg(F.count("*").alias("count"), *_stat_aggs(spec))
            .orderBy(*[F.col(c).asc() for c in keys])
        )
    if ftype != "terms":
        raise ValueError(f"json_facet executor: unknown facet type {ftype!r}")
    field = spec["field"]
    limit = int(spec.get("limit", 10))
    keys = [*parents, field]

    stats = {
        k: v for k, v in spec.get("facet", {}).items() if isinstance(v, str)
    }
    subs = {
        k: v for k, v in spec.get("facet", {}).items() if isinstance(v, dict)
    }

    grouped = df.groupBy(*keys).agg(
        F.count("*").alias("count"),
        *[parse_agg(v).alias(k) for k, v in stats.items()],
    )
    # per-parent top-N buckets: deterministic (sort key, then bucket value).
    # Top level uses orderBy+limit — Spark's TakeOrderedAndProject is a
    # distributed partial top-k, no single-partition window. Nested levels
    # window over the parent keys (bounded partitions: parent bucket sizes).
    order = [*_sort_cols(spec.get("sort", "count desc")), F.col(field).asc()]
    if parents:
        w = Window.partitionBy(*parents).orderBy(*order)
        grouped = (
            grouped.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= limit)
            .drop("_rn")
        )
    else:
        grouped = grouped.orderBy(*order).limit(limit)

    for name, sub in subs.items():
        child = _facet_node(df, sub, parents=keys)
        renamed = child
        for c in child.columns:
            if c not in keys:
                renamed = renamed.withColumnRenamed(c, f"{name}_{c}")
        # bucket cardinality is limit-bounded -> always broadcastable
        grouped = grouped.join(F.broadcast(renamed), on=keys, how="left")
    return grouped


# ---------------------------------------------------------------------------
# Multi-select faceting (tagged filter exclusion) —
# solr/core/.../search/facet/FacetRequest.java domain 'excludeTags' +
# request/SimpleFacets.java '{!ex=tag}' local param over fq '{!tag=tag}'.
# The UI pattern: every applied filter is tagged, and each facet recomputes
# its counts over the domain with ITS OWN field's filter excluded, so the
# user still sees what the other choices would return.
# ---------------------------------------------------------------------------


def multiselect_facets(
    df: DataFrame,
    tagged_filters: dict[str, Column],
    facets: list[tuple[str, str, set[str]]],
    limit: int = 5,
) -> DataFrame:
    """Field facets with per-facet tag exclusion.

    ``tagged_filters``: tag -> predicate Column (the '{!tag=t}fq' set).
    ``facets``: (facet_name, field, excluded_tags) triples — each facet's
    domain applies every tagged filter EXCEPT its excluded tags
    ('facet.field={!ex=t}field').

    Returns (facet, bucket, n_docs), top-``limit`` buckets per facet by
    (count desc, bucket asc). Spark shape: one grouped aggregation per
    facet over the shared scan (Catalyst reuses the cached/file scan;
    filters are pushed), each top-k a TakeOrderedAndProject — no windows,
    no driver loop; the union is facet-count bounded (tiny).

    A facet naming an unknown tag is refused (Solr resolves '{!ex=t}'
    against the declared tags; a typo silently re-applying the facet's
    own filter would invert the multi-select contract).
    """
    if not facets:
        raise ValueError("multiselect_facets needs at least one facet")
    for name, _, excl in facets:
        unknown = set(excl) - tagged_filters.keys()
        if unknown:
            raise ValueError(
                f"facet {name!r} excludes unknown tag(s) {sorted(unknown)}; "
                f"declared tags: {sorted(tagged_filters)}"
            )
    outs = []
    for name, field, excl in facets:
        dom = df
        for tag, pred in tagged_filters.items():
            if tag not in excl:
                dom = dom.filter(pred)
        outs.append(
            dom.groupBy(F.col(field).alias("bucket"))
            .agg(F.count("*").alias("n_docs"))
            .orderBy(F.desc("n_docs"), F.asc("bucket"))
            .limit(limit)
            .select(F.lit(name).alias("facet"), "bucket", "n_docs")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
