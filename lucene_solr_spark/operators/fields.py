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
        if isinstance(node, tuple) and node[0] == "phrase":
            _, terms, slop, boost, field = node
            node = Phrase(tuple(terms), slop, boost, field)
        else:
            node = resolve_multi_terms(
                node, self.searchers[self.default_field]
            )
            assert not _contains_tuple(node), "unresolved leaf after rewrite"
        return self.topk_query(node, k=k)
