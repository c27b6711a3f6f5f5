"""Field-scoped search across per-field segments — the multi-field
IndexSearcher analog (Lucene documents have fields; every segment here
indexes ONE field of the same doc-id space).

Reference surface being re-expressed (SURVEY.md §2.J):
  queryparser/classic syntax ``field:term`` / ``field:"a b"`` /
  ``field:[a TO b]`` (QueryParser.jj field scoping)
  index/IndexableField.java — per-field postings, norms, stats
  search/TermQuery.java — a fielded term scores with ITS field's
  df/avgdl/norms (per-field Similarity stats)

Spark restatement: fielded Term/Phrase leaves are rewritten to TAGGED
term keys (``field \\x1f term``) and every field's postings (filtered to
its own terms first, so parquet row-group pruning still applies) are
unioned with the tag applied — one per-bucket leaf then scores the whole
tree exactly like the single-field kernel, with per-tagged-term norm
caches (each field has its own avgdl). All field segments must share the
doc-id space and bucket_docs (asserted), which a multi-field build from
one doc-id-assigned corpus guarantees.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import Segment
from . import bm25
from .query import Bool, Phrase, Term, collect_phrases, rewrite
from .search import Searcher, _TOPK_SCHEMA, score_query_postings

SEP = "\x1f"  # tag separator: cannot appear in analyzed terms


class FieldedSearcher:
    def __init__(
        self,
        spark: SparkSession,
        segments: dict[str, Segment],
        default_field: str,
    ):
        assert default_field in segments, f"unknown default field {default_field!r}"
        bd = {s.stats.bucket_docs for s in segments.values()}
        nd = {s.stats.n_docs for s in segments.values()}
        assert len(bd) == 1, f"segments disagree on bucket_docs: {bd}"
        assert len(nd) == 1, f"segments disagree on doc count: {nd}"
        self.spark = spark
        self.segments = segments
        self.default_field = default_field
        self.searchers = {f: Searcher(spark, s) for f, s in segments.items()}
        self.caches = {
            f: bm25.norm_cache(s.stats.avgdl) for f, s in segments.items()
        }

    def _field(self, f: str | None) -> str:
        f = f or self.default_field
        if f not in self.segments:
            raise KeyError(f"unknown field {f!r} (have {sorted(self.segments)})")
        return f

    # -- tree rewrite: fielded leaves -> tagged plain leaves ----------------
    def _tag(self, node):
        if isinstance(node, Term):
            f = self._field(node.field)
            return Term(f + SEP + node.term, node.boost)
        if isinstance(node, Phrase):
            f = self._field(node.field)
            return Phrase(
                tuple(f + SEP + t for t in node.terms), node.slop, node.boost
            )
        assert isinstance(node, Bool)
        def tg(part):
            return tuple(self._tag(c) for c in part)
        return Bool(
            must=tg(node.must),
            should=tg(node.should),
            must_not=tg(node.must_not),
            filter=tg(node.filter),
            min_should_match=node.min_should_match,
            boost=node.boost,
        )

    def topk_query(self, q, k: int = 10) -> DataFrame:
        """Boolean-tree search where every Term/Phrase leaf may carry a
        field. Scores are bit-identical to running each leaf against its
        own field's single-field Searcher (same idf/avgdl/norm inputs,
        same float32 kernel)."""
        q = self._tag(rewrite(q))
        # per-field raw terms (for pruned postings filters) + tagged stats
        by_field: dict[str, set] = {}
        from .query import collect_term_leaves, collect_terms

        for tagged in collect_terms(q):
            f, raw = tagged.split(SEP, 1)
            by_field.setdefault(f, set()).add(raw)
        idfs: dict[str, np.float32] = {}
        caches: dict[str, np.ndarray] = {}
        stats_by_tag: dict[str, float] = {}
        for f, raws in by_field.items():
            st = self.searchers[f].term_stats(sorted(raws))
            for raw, ts in st.items():
                tag = f + SEP + raw
                stats_by_tag[tag] = ts.idf
                caches[tag] = self.caches[f]
        if not stats_by_tag:
            return self.spark.createDataFrame([], _TOPK_SCHEMA)
        leaf_tags = collect_term_leaves(q)
        idfs = {
            t: np.float32(stats_by_tag[t])
            for t in sorted(stats_by_tag)
            if t in leaf_tags
        }

        phrases = collect_phrases(q)
        phrase_idfs: dict = {}
        phrase_caches: dict = {}
        pos_fields: set = set()
        for p in set(phrases):
            f = p.terms[0].split(SEP, 1)[0]
            if all(t in stats_by_tag for t in p.terms):
                phrase_idfs[p] = np.float32(
                    sum(stats_by_tag[t] for t in p.terms)
                )
                phrase_caches[p] = self.caches[f]
                pos_fields.add(f)
                assert self.segments[f].has_table("positions"), (
                    f"field {f!r} was built without positions"
                )

        def tagged_table(f: str, table: str, raws) -> DataFrame:
            # filter on the RAW sorted term column first (row-group
            # pruning), then apply the field tag
            return (
                self.segments[f]
                .table(self.spark, table)
                .filter(F.col("term").isin(sorted(raws)))
                .withColumn("term", F.concat(F.lit(f + SEP), F.col("term")))
            )

        parts = [tagged_table(f, "postings", raws) for f, raws in by_field.items()]
        postings = parts[0]
        for p in parts[1:]:
            postings = postings.unionByName(p)
        positions = None
        if phrase_idfs:
            pparts = []
            for f in sorted(pos_fields):
                raws = {
                    t.split(SEP, 1)[1]
                    for p in phrase_idfs
                    for t in p.terms
                    if t.startswith(f + SEP)
                }
                pparts.append(tagged_table(f, "positions", raws))
            positions = pparts[0]
            for p in pparts[1:]:
                positions = positions.unionByName(p)

        default_cache = self.caches[self.default_field]
        per_bucket = score_query_postings(
            postings, q, idfs, default_cache, k,
            positions=positions, phrase_idfs=phrase_idfs,
            caches=caches, phrase_caches=phrase_caches,
        )
        return per_bucket.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def search(self, query_string: str, k: int = 10) -> DataFrame:
        """Classic syntax with field scoping: ``title:key body:"a b"
        bare``. Bare leaves hit the default field; multi-term leaves
        (wildcard/fuzzy/range) rewrite against the DEFAULT field's terms
        dict (fielded multi-term raises in the parser seam)."""
        from ..plans.qparser import _contains_tuple, parse, resolve_multi_terms

        node = parse(query_string)
        if isinstance(node, tuple) and node[0] == "matchall":
            # MatchAllDocsQuery over the fielded index: every doc of the
            # shared docmap, constant score = boost, docID order (the
            # same contract as Searcher.search's matchall fast path)
            dm = self.searchers[self.default_field].segment.stored_fields(
                self.spark
            )
            return (
                dm.select(
                    "doc_id",
                    F.lit(float(node[1])).cast("float").alias("score"),
                )
                .orderBy(F.asc("doc_id"))
                .limit(k)
            )
        if isinstance(node, tuple) and node[0] == "phrase":
            _, terms, slop, boost, field = node
            node = Phrase(tuple(terms), slop, boost, field)
        else:
            node = resolve_multi_terms(
                node, self.searchers[self.default_field]
            )
            assert not _contains_tuple(node), "unresolved leaf after rewrite"
        return self.topk_query(node, k=k)


# ---------------------------------------------------------------------------
# CombinedFieldQuery — BM25F-style term-centric scoring across fields.
#
# Reference semantics being re-expressed (SURVEY.md §2.F):
#   lucene/sandbox/src/java/org/apache/lucene/sandbox/search/
#     CombinedFieldQuery.java — query terms score against a VIRTUAL field
#     that merges the member fields:
#       freq(t, d)   = sum_f  w_f * tf_f(t, d)
#       dl(d)        = byte4( sum_f  w_f * dl_f(d) )   (MultiNormsLeafSimScorer:
#                      decoded per-field norms, weighted sum, re-encoded)
#       df(t)        = |{d : t in ANY member field}|
#       sumTtf       = sum_f  w_f * sumTtf_f
#   (the BM25F "simple weighting" of Robertson/Zaragoza, which is what the
#   Lucene implementation computes). Integer weights keep freq/dl exact.
#
# Spark restatement: per field, posting blocks for the query terms are
# decoded (narrow rows after the term filter -> row-group pruning), tagged
# with the field weight and unioned; ONE groupBy (term, doc_id) sums the
# weighted freqs; combined norms are one groupBy over the member norms
# tables. Scoring runs per doc-space bucket in applyInPandas with the same
# float32 op order as the single-field kernel (bm25.py), idf from the
# union df, cache from the combined avgdl.
# ---------------------------------------------------------------------------


def combined_field_topk(
    spark: SparkSession,
    fields: dict[str, tuple[Segment, int]],
    terms: list[str],
    k: int = 10,
) -> DataFrame:
    """Top-k docs for ``terms`` scored against the combined field.
    ``fields``: field name -> (segment, integer weight). All segments must
    share the doc-id space and bucket size (multi-field build contract)."""
    import pandas as pd

    from ..functions.smallfloat import int_to_byte4_np

    segs = list(fields.values())
    assert segs, "no fields"
    assert len({s.stats.bucket_docs for s, _ in segs}) == 1, "bucket_docs mismatch"
    bucket_docs = segs[0][0].stats.bucket_docs
    n_docs = max(s.stats.n_docs for s, _ in segs)
    uniq = sorted(set(terms))

    from .merge import decode_postings

    # weighted per-(term, doc) freqs, one union + one keyed shuffle
    parts = []
    for seg, w in segs:
        dec = decode_postings(
            seg.table(spark, "postings").filter(F.col("term").isin(uniq))
        )
        parts.append(
            dec.select(
                "term", "doc_id", (F.col("freq") * F.lit(int(w))).alias("wf")
            )
        )
    tf = parts[0]
    for p in parts[1:]:
        tf = tf.unionByName(p)
    tf = tf.groupBy("term", "doc_id").agg(F.sum("wf").alias("wfreq"))

    # union df per term (Weight analog pre-pass, bounded by query size)
    df_rows = (
        tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df")).collect()
    )
    df_by_term = {r["term"]: int(r["df"]) for r in df_rows}
    if len(df_by_term) < len(uniq):
        # a term absent from every member field scores nothing anywhere;
        # Lucene still scores present terms (pure disjunction semantics)
        uniq = sorted(df_by_term)
        if not uniq:
            return spark.createDataFrame([], _TOPK_SCHEMA)

    # combined norms: weighted dl sum, byte4 re-encoded
    nparts = []
    for seg, w in segs:
        nparts.append(
            seg.table(spark, "norms").select(
                "doc_id", (F.col("dl") * F.lit(int(w))).alias("wdl")
            )
        )
    norms = nparts[0]
    for p in nparts[1:]:
        norms = norms.unionByName(p)
    norms = norms.groupBy("doc_id").agg(F.sum("wdl").alias("wdl"))

    sum_ttf = sum(w * s.stats.sum_ttf for s, w in segs)
    avgdl = sum_ttf / n_docs
    cache = bm25.norm_cache(avgdl)
    idfs = {
        t: np.float32(bm25.idf(n_docs, df_by_term[t])) for t in uniq
    }
    order_terms = sorted(uniq)  # fixed float32 fold order

    rows = (
        tf.join(norms, "doc_id")
        .withColumn(
            "bucket", (F.col("doc_id") / F.lit(bucket_docs)).cast("long")
        )
    )

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        docs = pdf["doc_id"].to_numpy(dtype=np.int64)
        u_docs = np.unique(docs)
        pos = {d: i for i, d in enumerate(u_docs)}
        idx = np.array([pos[d] for d in docs], dtype=np.int64)
        nb = np.zeros(len(u_docs), dtype=np.uint8)
        nb[idx] = int_to_byte4_np(pdf["wdl"].to_numpy(dtype=np.int64))
        total = np.zeros(len(u_docs), dtype=np.float32)
        terms_arr = pdf["term"].to_numpy()
        wf = pdf["wfreq"].to_numpy(dtype=np.int64)
        for t in order_terms:  # lexicographic f32 summation order
            m = terms_arr == t
            if not m.any():
                continue
            f = wf[m].astype(np.float32)
            sc = (idfs[t] * (f / (f + cache[nb[idx[m]]]))).astype(np.float32)
            total[idx[m]] = (total[idx[m]] + sc).astype(np.float32)
        order = np.lexsort((u_docs, -total))[: min(k, len(u_docs))]
        return pd.DataFrame({"doc_id": u_docs[order], "score": total[order]})

    per_bucket = rows.groupBy("bucket").applyInPandas(
        score_bucket, _TOPK_SCHEMA
    )
    return per_bucket.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
