"""LTR tree-ensemble re-ranking — MultipleAdditiveTreesModel analog.

Reference surface being re-expressed (SURVEY.md §2.F "Re-rank / LTR"):
  solr/contrib/ltr/.../model/MultipleAdditiveTreesModel.java — gradient-
    boosted / additive regression trees over named features: each tree is
    a binary split tree (feature <= threshold ? left : right), the model
    score is sum(weight_i * tree_i(features)); LambdaMART ensembles are
    deployed in exactly this JSON shape.
  solr/contrib/ltr/.../model/LinearModel.java — the linear sibling
    (plans/extra_queries.py#ltr_rerank).

Spark restatement: a trained ensemble is a LITERAL — thresholds and leaf
values are constants — so each tree compiles to a nested CASE WHEN Column
expression evaluated entirely JVM-side inside whole-stage codegen (no UDF,
no Python in the hot path; a million-doc re-rank window is a projection).
The same literal model also compiles to an ANSI-SQL CASE expression so an
external engine can verify the scores bit-for-bit (both engines evaluate
the identical double-precision expression tree).

Model shape (MultipleAdditiveTreesModel's params JSON, trimmed):
  trees = [{"weight": w, "root": node}, ...]
  node  = {"feature": name, "threshold": t, "left": node, "right": node}
        | {"value": v}
Split rule pinned to the reference: feature value <= threshold -> left.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _tree_col(node: dict, feats: dict[str, Column]) -> Column:
    if "value" in node:
        return F.lit(float(node["value"]))
    f = feats[node["feature"]]
    return F.when(
        f <= F.lit(float(node["threshold"])), _tree_col(node["left"], feats)
    ).otherwise(_tree_col(node["right"], feats))


def trees_score_col(trees: list[dict], feats: dict[str, Column]) -> Column:
    """Ensemble score as ONE Column expression: sum of weight * tree.
    ``feats`` maps feature names to Column expressions (typically plain
    columns of the feature frame built for the re-rank window)."""
    acc = None
    for t in trees:
        c = F.lit(float(t.get("weight", 1.0))) * _tree_col(t["root"], feats)
        acc = c if acc is None else acc + c
    return acc.cast("double")


def _dlit(v: float) -> str:
    # bare decimal literals parse as DECIMAL in some engines (DuckDB) —
    # force DOUBLE so the result column is a double, not a decimal
    return f"CAST({float(v)!r} AS DOUBLE)"


def _tree_sql(node: dict, feats: dict[str, str]) -> str:
    if "value" in node:
        return _dlit(node["value"])
    f = feats[node["feature"]]
    return (
        f"CASE WHEN {f} <= {_dlit(node['threshold'])} "
        f"THEN {_tree_sql(node['left'], feats)} "
        f"ELSE {_tree_sql(node['right'], feats)} END"
    )


def trees_score_sql(trees: list[dict], feats: dict[str, str]) -> str:
    """The SAME ensemble as an ANSI-SQL expression (oracle mirror).
    ``feats`` maps feature names to SQL expressions."""
    parts = [
        f"({_dlit(t.get('weight', 1.0))} * ({_tree_sql(t['root'], feats)}))"
        for t in trees
    ]
    return "(" + " + ".join(parts) + ")"
