"""Mergeable frequency sketches for corpus-scale token statistics.

Misra–Gries heavy hitters (the mergeable summary of Agarwal, Cormode,
Huang, Phillips, Wei, Yi — "Mergeable Summaries", PODS'12): each partition
keeps at most ``k`` counters; merging two summaries adds counts, subtracts
the (k+1)-th largest value from every counter, and drops non-positive
ones. Guarantees, for stream length N:

- every counter is a LOWER bound on the true frequency, off by at most
  N/(k+1);
- every term with true frequency > N/(k+1) is present in the summary.

Spark shape: one ``mapInPandas`` pass produces <= k (term, lower-bound)
rows per input partition — the only shuffle is those candidate rows (k x
partitions, independent of corpus size), then a hash agg sums per-term
bounds. The exact pass that verifies the guarantee in the driver row is
a plain groupBy count — the sketch is the 100 TB path, the exact count
the small-scale oracle.

Reference basis: heavy-hitter reporting in Solr lives in faceting
(search/facet/FacetFieldProcessor.java top-N terms) which is exact; this
operator is the bounded-memory analog a 10^12-file corpus needs when the
term cardinality itself cannot be shuffled.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_merge(counters: dict, batch_counts: "pd.Series", k: int) -> dict:
    """Merge a batch's exact counts into an MG summary, pruning to k."""
    for term, c in batch_counts.items():
        counters[term] = counters.get(term, 0) + int(c)
    if len(counters) > k:
        # subtract the (k+1)-th largest count from everything, drop <= 0
        vals = sorted(counters.values(), reverse=True)
        m = vals[k]  # 0-indexed: the (k+1)-th largest
        counters = {t: v - m for t, v in counters.items() if v - m > 0}
    return counters


def misra_gries_candidates(tokens: DataFrame, term_col: str, k: int) -> DataFrame:
    """<= k (term, bound) rows per partition; summing ``bound`` per term
    across partitions keeps both MG guarantees (merged error budgets add)."""
    out_schema = f"{term_col} string, bound long"

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            counters = _mg_merge(counters, pdf[term_col].value_counts(), k)
        if counters:
            yield pd.DataFrame(
                {term_col: list(counters.keys()), "bound": list(counters.values())}
            )

    return (
        tokens.select(term_col)
        .mapInPandas(per_partition, schema=out_schema)
        .groupBy(term_col)
        .agg(F.sum("bound").alias("bound"))
    )
