"""Unit tests: pinned tokenizer, SmallFloat, FOR packing.

Modeled on the reference's codec round-trip suites
(lucene/test-framework/.../index/BasePostingsFormatTestCase.java) and
TestSmallFloat: random inputs with fixed seeds, exact round-trip equality,
vectorized == scalar equivalence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from lucene_solr_spark.functions import packing, smallfloat
from lucene_solr_spark.functions.analysis import tokenize_pandas, tokenize_text

from . import oracle


# ---------------------------------------------------------------- tokenizer

CASES = [
    ("", []),
    ("hello world", ["hello", "world"]),
    ("camelCase snake_case HTTPServer utf8 8bit",
     ["camel", "case", "snake", "case", "http", "server", "utf", "8", "8", "bit"]),
    ("def foo(x): return x+1", ["def", "foo", "x", "return", "x", "1"]),
    ("a..b--c__d", ["a", "b", "c", "d"]),
    ("X", ["x"]),
    ("getHTTPResponseCode", ["get", "http", "response", "code"]),
    ("  spaced\t\nout  ", ["spaced", "out"]),
]


@pytest.mark.parametrize("text,expected", CASES)
def test_tokenizer_pinned_cases(text, expected):
    assert tokenize_text(text) == expected
    assert oracle.tokenize(text) == expected


def test_tokenizer_engine_equals_oracle_on_random():
    rng = np.random.default_rng(42)
    pieces = ["fooBar", "a_b", "x1", "HTTPServer", "the", "import", "ça",
              "naïve", "東京", "return;", "{}", "a.b.c", "Q9z"]
    texts = [
        " ".join(rng.choice(pieces, size=rng.integers(0, 30)))
        for _ in range(300)
    ]
    eng = tokenize_pandas(pd.Series(texts)).tolist()
    ora = [oracle.tokenize(t) for t in texts]
    assert eng == ora


def test_testdata_is_ascii_and_tokens_match():
    # pinned-spec caveat: \w (Python) == [\p{L}\p{N}_] (RE2) on ASCII only;
    # assert the driver corpus is ASCII so the DuckDB oracle is exact.
    import duckdb

    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01"):
        n = con.execute(
            f"select count(*) from read_parquet('/root/testdata/{sf}/documents.parquet') "
            "where regexp_matches(text, '[^\\x00-\\x7F]')"
        ).fetchone()[0]
        assert n == 0


def test_tokenizer_matches_duckdb_sql():
    import duckdb

    from lucene_solr_spark.functions.analysis import duckdb_tokenize_sql

    con = duckdb.connect()
    sql = duckdb_tokenize_sql("text")
    rows = con.execute(
        f"select doc_id, {sql} as toks from "
        "read_parquet('/root/testdata/sf0.001/documents.parquet') order by doc_id"
    ).fetchall()
    import pandas as pd

    texts = con.execute(
        "select doc_id, text from read_parquet('/root/testdata/sf0.001/documents.parquet') order by doc_id"
    ).fetchall()
    eng = tokenize_pandas(pd.Series([t for _, t in texts])).tolist()
    assert [list(t) for _, t in rows] == eng


# ---------------------------------------------------------------- smallfloat

def test_smallfloat_scalar_properties():
    prev = -1
    for i in list(range(0, 4096)) + [2**k for k in range(12, 31)]:
        b = smallfloat.int_to_byte4(i)
        assert 0 <= b <= 255
        back = smallfloat.byte4_to_int(b)
        assert back <= i  # round-down bucketing
        assert b >= prev  # monotonic
        prev = b
        if i < 40:
            assert back == i  # exact below 40
    # oracle impl agrees
    for i in range(0, 100_000, 7):
        assert smallfloat.int_to_byte4(i) == oracle.int_to_byte4(i)
        assert smallfloat.byte4_to_int(i % 256) == oracle.byte4_to_int(i % 256)


def test_smallfloat_vectorized_equals_scalar():
    rng = np.random.default_rng(42)
    arr = np.concatenate(
        [np.arange(0, 5000), rng.integers(0, 2**30, size=5000)]
    )
    vec = smallfloat.int_to_byte4_np(arr)
    sca = np.array([smallfloat.int_to_byte4(int(x)) for x in arr], dtype=np.uint8)
    np.testing.assert_array_equal(vec, sca)
    np.testing.assert_array_equal(
        smallfloat.byte4_to_int_np(vec),
        np.array([smallfloat.byte4_to_int(int(b)) for b in vec]),
    )


def test_smallfloat_duckdb_sql_mirror():
    import duckdb

    con = duckdb.connect()
    expr = smallfloat.duckdb_byte4_roundtrip_sql("dl")
    got = con.execute(
        f"select dl, {expr} from (select unnest(range(0, 20000)) as dl) order by dl"
    ).fetchall()
    for dl, q in got:
        assert q == smallfloat.byte4_to_int(smallfloat.int_to_byte4(dl)), dl


# ---------------------------------------------------------------- packing

def test_pack_roundtrip_random():
    rng = np.random.default_rng(42)
    for _ in range(200):
        n = int(rng.integers(0, packing.BLOCK_SIZE + 1))
        w = int(rng.integers(0, 63))
        vals = rng.integers(0, max(2**w, 1) + 1, size=n, dtype=np.uint64)
        out = packing.unpack_ints(packing.pack_ints(vals))
        np.testing.assert_array_equal(out, vals)


def test_pack_compression_ratio():
    vals = np.arange(1, 129, dtype=np.uint64)  # deltas of a dense list: ~1..128
    packed = packing.pack_ints(vals)
    assert len(packed) <= 3 + 128  # 8-bit width max for values<=128 -> 128 bytes


def test_delta_roundtrip():
    rng = np.random.default_rng(7)
    ids = np.unique(rng.integers(0, 10**9, size=500)).astype(np.uint64)
    np.testing.assert_array_equal(
        packing.delta_decode(packing.delta_encode(ids)), ids
    )


# ---------------------------------------------------------------------------
# Analysis-chain breadth (round 2): Porter, ASCII folding, HTML strip,
# edge n-grams.
# ---------------------------------------------------------------------------

def test_porter_stem_vectors():
    """End-to-end classic Porter (1980) on the published examples."""
    from lucene_solr_spark.functions.analysis import porter_stem

    vecs = {
        "caresses": "caress", "ponies": "poni", "ties": "ti",
        "caress": "caress", "cats": "cat", "feed": "feed", "agreed": "agre",
        "plastered": "plaster", "motoring": "motor", "sing": "sing",
        "conflated": "conflat", "troubled": "troubl", "sized": "size",
        "hopping": "hop", "tanned": "tan", "falling": "fall",
        "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
        "filing": "file", "happy": "happi", "sky": "sky",
        "relational": "relat", "conditional": "condit", "rational": "ration",
        "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
        "conformabli": "conform", "radicalli": "radic",
        "differentli": "differ", "vileli": "vile", "analogousli": "analog",
        "vietnamization": "vietnam", "predication": "predic",
        "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
        "hopefulness": "hope", "callousness": "callous",
        "formaliti": "formal", "sensitiviti": "sensit",
        "sensibiliti": "sensibl", "triplicate": "triplic",
        "formative": "form", "formalize": "formal", "electriciti": "electr",
        "electrical": "electr", "hopeful": "hope", "goodness": "good",
        "revival": "reviv", "allowance": "allow", "inference": "infer",
        "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
        "replacement": "replac", "adjustment": "adjust",
        "dependent": "depend", "adoption": "adopt", "communism": "commun",
        "activate": "activ", "angulariti": "angular",
        "homologous": "homolog", "effective": "effect",
        "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
        "cease": "ceas", "controll": "control", "roll": "roll",
    }
    bad = {w: (porter_stem(w), want) for w, want in vecs.items() if porter_stem(w) != want}
    assert not bad, bad


def test_porter_stem_udf(spark):
    from lucene_solr_spark.functions.analysis import porter_stem_udf

    df = spark.createDataFrame(
        [(["motoring", "ponies", "sky"],)], "toks array<string>"
    ).select(porter_stem_udf("toks").alias("s"))
    assert df.collect()[0]["s"] == ["motor", "poni", "sky"]


def test_ascii_fold(spark):
    from lucene_solr_spark.functions.analysis import ascii_fold_col

    df = spark.createDataFrame(
        [("Café àéîõü Æon straße",)], "t string"
    ).select(ascii_fold_col("t").alias("f"))
    assert df.collect()[0]["f"] == "Cafe aeiou AEon strasse"


def test_html_strip(spark):
    from lucene_solr_spark.functions.analysis import html_strip_col

    raw = '<p>Hello <b>world</b></p><script>var x=1;</script>&amp; more &lt;3'
    df = spark.createDataFrame([(raw,)], "t string").select(
        html_strip_col("t").alias("s")
    )
    out = df.collect()[0]["s"]
    assert "script" not in out and "<" not in out.replace("<3", "") and "Hello" in out
    assert "& more" in out and "<3" in out


def test_edge_ngrams(spark):
    from lucene_solr_spark.functions.analysis import edge_ngrams
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("spark",), ("ab",), ("a",)], "t string").select(
        "t", edge_ngrams(F.col("t"), 2, 4).alias("g")
    )
    got = {r["t"]: r["g"] for r in df.collect()}
    assert got["spark"] == ["sp", "spa", "spar"]
    assert got["ab"] == ["ab"]
    assert got["a"] == []


def test_date_math():
    from datetime import datetime, timezone

    import pytest as _pt

    from lucene_solr_spark.functions.datemath import DateMathError, parse_date_math

    now = datetime(2024, 1, 20, 12, 34, 56, tzinfo=timezone.utc)
    utc = timezone.utc
    assert parse_date_math("NOW/DAY", now=now) == datetime(2024, 1, 20, tzinfo=utc)
    assert parse_date_math("NOW/DAY-5DAYS+6HOURS", now=now) == datetime(
        2024, 1, 15, 6, tzinfo=utc
    )
    assert parse_date_math("NOW/HOUR", now=now) == datetime(2024, 1, 20, 12, tzinfo=utc)
    assert parse_date_math("NOW+6MONTHS", now=now) == datetime(
        2024, 7, 20, 12, 34, 56, tzinfo=utc
    )
    # month-end clamping (Calendar.add semantics)
    jan31 = datetime(2024, 1, 31, tzinfo=utc)
    assert parse_date_math("NOW+1MONTH", now=jan31) == datetime(2024, 2, 29, tzinfo=utc)
    # explicit anchor
    assert parse_date_math("2024-03-05T10:30:00Z/MONTH-1DAY") == datetime(
        2024, 2, 29, tzinfo=utc
    )
    assert parse_date_math("NOW/YEAR+1YEAR", now=now) == datetime(2025, 1, 1, tzinfo=utc)
    with _pt.raises(DateMathError):
        parse_date_math("NOW")  # no clock supplied
    with _pt.raises(DateMathError):
        parse_date_math("NOW/FORTNIGHT", now=now)


def test_snowball_stem_vectors():
    """Snowball English (Porter2) on hand-derived vectors: 1a plural rules,
    eed/R1, 1b fixups (at/bl/iz +e, undoubling, short-word +e), 1c y->i,
    exceptional forms, gener- R1 prefix, step-2/3/4 region gating."""
    from lucene_solr_spark.functions.analysis import snowball_stem as s

    vecs = {
        "caresses": "caress", "ponies": "poni", "ties": "tie",
        "cries": "cri", "gas": "gas", "gaps": "gap", "kiwis": "kiwi",
        "agreed": "agre", "feed": "feed", "plastered": "plaster",
        "bled": "bled", "motoring": "motor", "sing": "sing",
        "conflated": "conflat", "troubled": "troubl", "sized": "size",
        "hopping": "hop", "tanned": "tan", "falling": "fall",
        "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
        "filing": "file", "happy": "happi", "sky": "sky", "crying": "cri",
        "say": "say", "by": "by", "generating": "generat",
        "generate": "generat", "dying": "die", "skies": "sky",
        "inning": "inning", "proceed": "proceed", "beautiful": "beauti",
        "nationality": "nation", "hoping": "hope", "news": "news",
        "early": "earli", "rational": "ration", "ugly": "ugli",
        "luxuriated": "luxuri", "owing": "owe", "controlling": "control",
        "this": "this", "hiss": "hiss", "dry": "dri",
        "generously": "generous", "lying": "lie", "singly": "singl",
        "gently": "gentl", "exceed": "exceed", "herring": "herring",
        "possibly": "possibl",
    }
    bad = {w: (s(w), want) for w, want in vecs.items() if s(w) != want}
    assert not bad, bad


def test_snowball_differs_from_porter_where_expected(spark):
    """The headline Porter1 vs Porter2 divergences: ties/cries plurals,
    exceptional forms, and the y-consonant prelude."""
    from lucene_solr_spark.functions.analysis import porter_stem, snowball_stem

    assert porter_stem("ties") == "ti" and snowball_stem("ties") == "tie"
    assert porter_stem("dying") == "dy" and snowball_stem("dying") == "die"
    assert porter_stem("early") == "earli" and snowball_stem("early") == "earli"
    assert snowball_stem("sky") == "sky"


def test_snowball_stem_udf(spark):
    from lucene_solr_spark.functions.analysis import snowball_stem_udf

    df = spark.createDataFrame(
        [(["cries", "hopping", "generously"],)], "tokens: array<string>"
    )
    out = df.select(snowball_stem_udf("tokens").alias("s")).collect()[0]["s"]
    assert out == ["cri", "hop", "generous"]
