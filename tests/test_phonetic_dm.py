"""Double Metaphone chain: published vectors + three-way engine parity.

Vector list: words whose TRUE Double Metaphone primary code (commons-codec
DoubleMetaphone / Philips 2000) is reproduced by the pinned core chain —
the documented deviations (origin heuristics, alternate channel, the
laugh/enough GH class) never fire for these. Subset-regression pins
(sign, war, account, ...) additionally freeze the chain's own behavior.
"""

from __future__ import annotations

import random
import string

import duckdb
import pytest

from lucene_solr_spark.functions.phonetic import (
    double_metaphone_col,
    double_metaphone_py,
    double_metaphone_sql,
)

PUBLISHED_VECTORS = {
    "smith": "SM0",
    "schmidt": "XMT",
    "schneider": "XNTR",
    "school": "SKL",
    "fisher": "FXR",
    "phillip": "FLP",
    "thomas": "TMS",
    "katherine": "K0RN",
    "catherine": "K0RN",
    "wright": "RT",
    "knight": "NT",
    "ghost": "KST",
    "edge": "AJ",
    "edgar": "ATKR",
    "cigar": "SKR",
    "church": "XRX",
    "christ": "KRST",
    "maximum": "MKSM",
    "apple": "APL",
    "house": "HS",
    "john": "JN",
    "jones": "JNS",
    "white": "AT",
    "dumb": "TM",
    "psalm": "SLM",
    "taxi": "TKS",
}

SUBSET_PINS = {
    # chain-frozen behavior (core-rule composites; not asserted as
    # published codes, asserted as THIS chain's pinned output)
    "lexicon": "LKSK",
    "sign": "SN",
    "snow": "SN",
    "accident": "AKST",
    "science": "SNS",
    "war": "AR",
    "account": "AKNT",
    "xavier": "SFR",
    "afghan": "AFKN",
    "fathom": "FTM",
    "a": "A",
    "q": "K",
}


@pytest.mark.parametrize("word,code", sorted(PUBLISHED_VECTORS.items()))
def test_published_vectors(word, code):
    assert double_metaphone_py(word) == code


@pytest.mark.parametrize("word,code", sorted(SUBSET_PINS.items()))
def test_subset_pins(word, code):
    assert double_metaphone_py(word) == code


def test_code_alphabet():
    rng = random.Random(11)
    allowed = set("AFHJKLMNPRSTWX0")
    for _ in range(500):
        w = "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randrange(1, 14)))
        c = double_metaphone_py(w)
        assert len(c) <= 4 and set(c) <= allowed, (w, c)
        # no adjacent duplicate output chars (run collapse)
        assert all(a != b for a, b in zip(c, c[1:])), (w, c)


def test_three_way_parity(spark):
    """Spark chain == DuckDB chain == Python rendering on random words +
    every vector (regex-dialect drift would show here)."""
    rng = random.Random(29)
    words = [
        "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randrange(1, 13)))
        for _ in range(300)
    ]
    words += list(PUBLISHED_VECTORS) + list(SUBSET_PINS)
    df = spark.createDataFrame([(w,) for w in words], "term string")
    got_spark = [
        r.code for r in df.select(double_metaphone_col("term").alias("code")).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(term VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(w,) for w in words])
    got_duck = [
        r[0] for r in con.execute(f"SELECT {double_metaphone_sql('term')} FROM t").fetchall()
    ]
    got_py = [double_metaphone_py(w) for w in words]
    assert got_spark == got_py
    assert got_duck == got_py
