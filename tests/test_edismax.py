"""eDisMax parser + scorer (operators/edismax.py) — hand-pinned mm/tie/pf
cases against a scalar float32 oracle, plus the mm-spec grammar and the
graceful bad-syntax fallback (ExtendedDismaxQParser analogs)."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_spark.corpus import synth_corpus
from lucene_solr_spark.operators.edismax import (
    calculate_mm,
    edismax_topk,
    parse_boost_func,
    parse_boost_queries,
    parse_field_boosts,
    parse_user_query,
)
from lucene_solr_spark.operators.indexer import assign_doc_ids, build_index

from .oracle import OracleIndex, tokenize

N_DOCS = 150
TITLE_TOKENS = 8


@pytest.fixture(scope="module")
def corpus(spark):
    c = synth_corpus(spark, N_DOCS, partitions=4)
    return assign_doc_ids(c, ["repo", "path", "commit"]).persist()


def _title_content(content: str) -> str:
    return " ".join(tokenize(content)[:TITLE_TOKENS])


@pytest.fixture(scope="module")
def segments(spark, corpus):
    body = build_index(
        spark, corpus, out_dir=None, bucket_docs=64, with_positions=True
    )
    rows = corpus.select(
        "doc_id", "repo", "path", "commit", "lang", "content"
    ).collect()
    tdf = spark.createDataFrame(
        [
            (r["doc_id"], r["repo"], r["path"], r["commit"], r["lang"],
             _title_content(r["content"]))
            for r in rows
        ],
        "doc_id long, repo string, path string, commit string, lang string, content string",
    )
    title = build_index(
        spark, tdf, out_dir=None, bucket_docs=64, with_positions=True
    )
    return {"body": body, "title": title}


@pytest.fixture(scope="module")
def oracles(corpus):
    rows = corpus.select("doc_id", "content").collect()
    body = OracleIndex([(int(r["doc_id"]), r["content"]) for r in rows])
    title = OracleIndex(
        [(int(r["doc_id"]), _title_content(r["content"])) for r in rows]
    )
    return {"body": body, "title": title}


# ---------------------------------------------------------------------------
# param-parsing units
# ---------------------------------------------------------------------------


def test_parse_field_boosts():
    assert parse_field_boosts("title^2 body") == {"title": 2.0, "body": 1.0}
    assert parse_field_boosts("a^0.5") == {"a": 0.5}
    assert parse_field_boosts("") == {}


@pytest.mark.parametrize(
    "spec,n,want",
    [
        ("3", 5, 3),
        ("3", 2, 2),          # clamped to clause count
        ("-2", 5, 3),         # all but 2
        ("-2", 1, 0),
        ("75%", 4, 3),
        ("50%", 5, 2),        # Solr truncates the percentage
        ("-25%", 4, 3),
        (None, 7, 0),
        # conditional: n<=2 -> all; 3..9 -> all but 25%; >9 -> 3
        ("2<-25% 9<3", 2, 2),
        ("2<-25% 9<3", 8, 6),
        ("2<-25% 9<3", 12, 3),
    ],
)
def test_calculate_mm_spec(spec, n, want):
    assert calculate_mm(spec, n) == want


def test_parse_boost_queries():
    got = parse_boost_queries("title:Self^2 body:def")
    assert got == [("title", "self", np.float32(2.0)), ("body", "def", np.float32(1.0))]
    assert parse_boost_queries(["a:x^0.5", "b:y"]) == [
        ("a", "x", np.float32(0.5)), ("b", "y", np.float32(1.0))
    ]
    assert parse_boost_queries(None) == []
    with pytest.raises(AssertionError):
        parse_boost_queries("noField^2")


def test_parse_boost_func():
    dl = np.array([0.0, 4.0, 100.0])
    assert np.allclose(parse_boost_func("recip(dl,1,100,100)")(dl),
                       np.float32([1.0, 100 / 104, 0.5]))
    assert np.allclose(parse_boost_func("sqrt(dl)")(dl),
                       np.float32([0.0, 2.0, 10.0]))
    assert np.allclose(parse_boost_func("linear(dl,2,1)")(dl),
                       np.float32([1.0, 9.0, 201.0]))
    assert np.allclose(parse_boost_func("0.75")(dl), np.float32(0.75))
    assert parse_boost_func("sqrt(dl)")(dl).dtype == np.float32
    with pytest.raises(ValueError):
        parse_boost_func("pow(dl,2)")


def test_parse_user_query_modifiers():
    req, opt, neg, seq = parse_user_query("+import return -private NOT static")
    assert req == ["import"] and neg == ["private", "static"]
    assert opt == ["return"]
    assert seq == ["import", "return"]  # scoring terms, query order
    # classic AND translation marks both neighbors required
    req, opt, neg, seq = parse_user_query("import AND return self")
    assert req == ["import", "return"] and opt == ["self"]
    assert seq == ["import", "return", "self"]
    # '+' after a bare term: the SEQUENCE keeps user order (pf phrases
    # must follow the typed order, not req-then-opt)
    _, _, _, seq = parse_user_query("return +import")
    assert seq == ["return", "import"]


def test_parse_user_query_graceful_fallback():
    # stray syntax is escaped, never an exception (edismax's contract)
    req, opt, neg, seq = parse_user_query('imp"ort (return]~2 se^lf:')
    assert req == [] and neg == []
    assert opt == seq == ["imp", "ort", "return", "2", "se", "lf"]


# ---------------------------------------------------------------------------
# scalar oracle (mirrors the kernel's pinned f32 discipline)
# ---------------------------------------------------------------------------


def _phrase_freq(toks: list[str], seq: list[str], slop: int = 0) -> float:
    if slop > 0:
        return OracleIndex._sloppy_freq_doc(toks, list(seq), slop)
    n, m = len(toks), len(seq)
    return float(sum(1 for i in range(n - m + 1) if toks[i : i + m] == seq))


def _shingles(seq, size):
    if size >= len(seq):
        return [list(seq)] if len(seq) >= 2 else []
    return [list(seq[i : i + size]) for i in range(len(seq) - size + 1)]


def oracle_edismax(oras, params, k=10):
    qf = parse_field_boosts(params.get("qf", ""))
    fields = sorted(qf)
    tie32 = np.float32(float(params.get("tie", 0.0)))
    req, opt, neg, clause_seq = parse_user_query(params.get("q", ""))
    mm_eff = calculate_mm(params.get("mm"), len(opt))
    if not req and opt:
        mm_eff = max(mm_eff, 1)

    pclauses = []
    for key, size, ps_key in (("pf", 0, "ps"), ("pf2", 2, "ps2"), ("pf3", 3, "ps3")):
        spec = params.get(key)
        if not spec:
            continue
        slop = int(params.get(ps_key, params.get("ps", 0)) or 0)
        seqs = [clause_seq] if size == 0 else _shingles(clause_seq, size)
        seqs = [s for s in seqs if len(s) >= 2]
        for f, b in sorted(parse_field_boosts(spec).items()):
            for seq in seqs:
                pclauses.append((f, seq, np.float32(b), slop))

    bq = parse_boost_queries(params.get("bq"))
    bf_specs = params.get("bf")
    bf_specs = [bf_specs] if isinstance(bf_specs, str) else list(bf_specs or [])
    bf_funcs = [parse_boost_func(s) for s in bf_specs]
    boost_func = (
        parse_boost_func(params["boost"]) if params.get("boost") else None
    )
    dv_field = params.get("dv", fields[0]) if (bf_funcs or boost_func) else None

    all_terms = sorted(set(clause_seq) | set(neg) | {t for _f, t, _b in bq})
    per = {
        f: {t: oras[f]._term_scores(t, 1.0)[1] for t in all_terms}
        for f in sorted(set(fields) | {f for f, _t, _b in bq})
    }
    docs = set()
    for f in fields:
        for t in clause_seq:
            docs |= set(per[f][t])
    out = []
    for d in sorted(docs):
        dmx, hit = {}, {}
        for t in all_terms:
            vals, present = [], False
            for f in fields:
                s = per[f][t].get(d)
                if s is not None:
                    present = True
                vals.append(
                    np.float32(np.float32(s or 0.0) * np.float32(qf[f]))
                )
            hit[t] = present
            if not present:
                continue
            if len(vals) == 1:
                dmx[t] = vals[0]
            else:
                mx = max(vals)
                sm = np.float32(0.0)
                for v in vals:
                    sm = np.float32(sm + v)
                dmx[t] = np.float32(mx + np.float32(tie32 * np.float32(sm - mx)))
        if not all(hit.get(t) for t in req):
            continue
        if any(hit.get(t) for t in neg):
            continue
        if opt and sum(1 for t in opt if hit.get(t)) < mm_eff:
            continue
        acc = np.float32(0.0)
        for t in clause_seq:
            if hit.get(t):
                acc = np.float32(acc + dmx[t])
        for f, t, b in bq:
            s = per[f][t].get(d)
            if s is not None:
                acc = np.float32(acc + np.float32(np.float32(s) * b))
        for f, seq, b, slop in pclauses:
            ora = oras[f]
            if any(not ora.tf.get(t) for t in seq):
                continue
            fr = _phrase_freq(ora.tokens[d], seq, slop)
            if not fr:
                continue
            idf_sum = np.float32(sum(ora.idf(t) for t in seq))
            fr32 = np.float32(fr)
            p = np.float32(idf_sum * np.float32(fr32 / np.float32(fr32 + ora.cache[ora.norm_byte[d]])))
            acc = np.float32(acc + np.float32(p * b))
        if dv_field is not None:
            dl = np.array([float(len(oras[dv_field].tokens[d]))])
            for fn in bf_funcs:
                acc = np.float32(acc + fn(dl)[0])
            if boost_func is not None:
                acc = np.float32(acc * boost_func(dl)[0])
        out.append((d, float(acc)))
    out.sort(key=lambda kv: (-kv[1], kv[0]))
    return out[:k]


CASES = [
    # (q, extra params) — qf always two fields to exercise dismax combine
    ("import return", {"mm": "2", "tie": 0.3}),
    ("import return self public", {"mm": "50%", "tie": 0.0}),
    ("import return self", {"mm": "-1", "tie": 1.0}),
    ("import return self public def", {"mm": "2<-25% 4<2", "tie": 0.5}),
    ("+import return -private", {"tie": 0.3}),
    ("import AND return", {}),
    ("import return", {"mm": "2", "tie": 0.1, "pf": "body^1.5"}),
    ("import return self", {"tie": 0.2, "pf": "body", "pf2": "body^0.5"}),
    ("import return self public", {"mm": "1", "pf3": "body^2"}),
    ("import return", {"mm": "2", "pf": "body^1.5", "ps": "2"}),
    ("import return self", {"pf": "body", "ps": "3", "pf2": "body^0.5", "ps2": "1"}),
    ("return +import", {"pf": "body"}),   # pf phrase follows TYPED order
    ("self AND import return", {"pf2": "body^2"}),
    ('"import return]', {"mm": "2"}),  # fallback still scores
    # bq / bf / boost (DisMaxQParser#getBoostQueries/getBoostFunctions,
    # BoostQParserPlugin) — additive term boosts, additive dl functions,
    # multiplicative function, and all three together with dv=title
    ("import return", {"mm": "2", "tie": 0.3, "bq": "title:self^2"}),
    ("import return", {"mm": "2", "bq": ["body:public^0.5", "title:def"]}),
    ("import return", {"mm": "2", "bf": "recip(dl,1,100,100)"}),
    ("import return", {"mm": "2", "boost": "sqrt(dl)"}),
    ("import return self", {
        "tie": 0.2, "pf": "body", "bq": "body:public^0.5 title:def",
        "bf": ["linear(dl,0.01,0)", "0.5"], "boost": "recip(dl,1,50,50)",
        "dv": "title",
    }),
]


@pytest.mark.parametrize("q,extra", CASES)
def test_edismax_matches_oracle(spark, segments, oracles, q, extra):
    params = {"q": q, "qf": "body title^2", **extra}
    got = [
        (int(r["doc_id"]), np.float32(r["score"]))
        for r in edismax_topk(spark, segments, params, k=10).collect()
    ]
    want = [(d, np.float32(s)) for d, s in oracle_edismax(oracles, params, 10)]
    assert got == want, f"{params}: {got[:3]} vs {want[:3]}"
    assert got, f"vacuous edismax case {params}"


def test_mm_gates_the_match_set(spark, segments):
    loose = edismax_topk(
        spark, segments, {"q": "import return self", "qf": "body", "mm": "1"},
        k=500,
    ).count()
    strict = edismax_topk(
        spark, segments, {"q": "import return self", "qf": "body", "mm": "3"},
        k=500,
    ).count()
    assert strict < loose


def test_pf_boost_reorders_not_filters(spark, segments):
    base = edismax_topk(
        spark, segments, {"q": "import return", "qf": "body", "mm": "2"},
        k=500,
    )
    boosted = edismax_topk(
        spark, segments,
        {"q": "import return", "qf": "body", "mm": "2", "pf": "body^5"},
        k=500,
    )
    a = {int(r["doc_id"]): float(r["score"]) for r in base.collect()}
    b = {int(r["doc_id"]): float(r["score"]) for r in boosted.collect()}
    assert set(a) == set(b) and a  # pf never changes the match set
    assert any(b[d] > a[d] for d in a)  # but boosts adjacent pairs


def test_required_term_absent_everywhere(spark, segments):
    res = edismax_topk(
        spark, segments, {"q": "+zzzmissing import", "qf": "body title"}, k=10
    )
    assert res.count() == 0


# ---------------------------------------------------------------------------
# Multi-segment fields (MultiReader shape): a field served by a 2-way
# doc-range SPLIT of the corpus must rank float32-identically to the
# single-segment field — global df/N/sum_ttf combine exactly
# (ExactStatsCache), including bq/bf/boost and pf clauses.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def split_segments(spark, corpus):
    mid = N_DOCS // 2
    halves = [
        corpus.filter(f"doc_id < {mid}"),
        corpus.filter(f"doc_id >= {mid}"),
    ]
    return [
        build_index(spark, h, out_dir=None, bucket_docs=64, with_positions=True)
        for h in halves
    ]


@pytest.mark.parametrize(
    "params",
    [
        {"q": "import return", "qf": "body", "mm": "2", "tie": 0.3},
        {"q": "import return", "qf": "body", "mm": "2", "pf": "body^1.5"},
        {"q": "import return", "qf": "body", "mm": "2",
         "bq": "body:public^0.5", "bf": "recip(dl,1,100,100)",
         "boost": "sqrt(dl)"},
    ],
)
def test_split_field_ranks_like_merged(spark, segments, split_segments, params):
    single = [
        (int(r["doc_id"]), np.float32(r["score"]))
        for r in edismax_topk(
            spark, {"body": segments["body"]}, params, k=10
        ).collect()
    ]
    split = [
        (int(r["doc_id"]), np.float32(r["score"]))
        for r in edismax_topk(
            spark, {"body": split_segments}, params, k=10
        ).collect()
    ]
    assert split == single and split


def test_split_and_whole_fields_mix(spark, segments, split_segments):
    """qf can mix a split field with a whole one."""
    params = {"q": "import return", "qf": "body title^2", "mm": "2",
              "tie": 0.3}
    single = [
        (int(r["doc_id"]), np.float32(r["score"]))
        for r in edismax_topk(spark, segments, params, k=10).collect()
    ]
    mixed = [
        (int(r["doc_id"]), np.float32(r["score"]))
        for r in edismax_topk(
            spark,
            {"body": split_segments, "title": segments["title"]},
            params,
            k=10,
        ).collect()
    ]
    assert mixed == single and mixed
