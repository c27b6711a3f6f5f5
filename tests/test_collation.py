"""Locale collation sort: pinned German (DIN 5007 / ICU de) relations."""

from __future__ import annotations

from lucene_solr_spark.plans.coverage10_queries import collation_sort_locale

from .conftest import SF_DIR


def test_pinned_de_relations(spark):
    rows = collation_sort_locale(spark, SF_DIR).collect()
    order = {r.s: r.rk for r in rows}
    # ranks are a permutation of 1..n
    assert sorted(order.values()) == list(range(1, len(rows) + 1))
    # umlaut sorts immediately after its base letter (secondary difference)
    assert order["apfel"] < order["äpfel"]
    assert order["ol"] < order["öl"]
    assert order["ubel"] < order["übel"]
    # ß == ss at primary, tertiary-greater
    assert order["masse"] < order["maße"]
    assert order["strasse"] < order["straße"]
    # and primary order still dominates: äpfel (a...) long before öl/übel
    assert order["äpfel"] < order["öl"] < order["übel"]
