"""Local-params syntax + QParser plugin dispatch.

Reference surface (SURVEY.md §2.J "Query parser / DSL" — the plugin
REGISTRY seam itself, plus the small parsers that only exist as local
params):
  solr/core/.../search/QueryParsing.java#parseLocalParams ({!...} syntax)
  solr/core/.../search/QParser.java#getParser (dispatch + $ref resolution)
  solr/core/.../search/TermQParserPlugin.java      ({!term})
  solr/core/.../search/RawQParserPlugin.java       ({!raw})
  solr/core/.../search/FieldQParserPlugin.java     ({!field})
  solr/core/.../search/PrefixQParserPlugin.java    ({!prefix})
  solr/core/.../search/BoolQParserPlugin.java      ({!bool})
  solr/core/.../search/SwitchQParserPlugin.java    ({!switch})
  solr/core/.../search/LuceneQParserPlugin.java    ({!lucene}, the default)
  solr/core/.../search/SimpleQParserPlugin.java    ({!simple})
  solr/core/.../search/MaxScoreQParserPlugin.java  ({!maxscore})

Syntax: ``{!type k=v k2='quoted v' v=$ref}body``. The first bare token
names the parser (``type=`` works too); values are bare words,
single/double-quoted strings with backslash escapes, or ``$name``
request-parameter references resolved at parse time; a ``v`` local param
REPLACES the trailing body. A query string that does not start with
``{!`` is dispatched to the default ``lucene`` parser — exactly
QParser.getParser's behavior.

Semantics pinned here (and in tests/test_localparams.py):
  * {!term}/{!raw} take the value VERBATIM — no analysis — so
    ``{!term f=text}Spark`` matches nothing against a lowercased index
    while ``{!field f=text}Spark`` (which analyzes) matches. This is the
    documented Solr difference between the three single-term parsers.
  * {!field} runs the field analyzer; multi-token output becomes a
    PhraseQuery (FieldQParserPlugin delegates to the field type's
    getFieldQuery).
  * {!bool} composes sub-queries from must/should/must_not/filter
    params, each itself a full local-params query string (recursion
    through THIS dispatcher), plus optional mm.
  * {!switch} selects a case.<val> param by the (trimmed) input value,
    ``case`` for empty input, ``default`` otherwise; a missing branch is
    an error (Solr returns 400).
  * unknown parser type -> QueryParseError (SolrException in the
    reference).

Output IR: operators.query.Term / Bool plus the classic multi-term
tuples, so resolve_multi_terms + Searcher.topk_query serve every
dispatched type unchanged.
"""

from __future__ import annotations

from ..functions.analysis import tokenize_text
from ..operators.query import Bool, DisMax, Term
from .qparser import QueryParseError, parse as lucene_parse
from .simpleqparser import simple_parse

_WS = " \t\r\n"


def _resolve_ref(val: str, params: dict | None) -> str:
    """``$name`` request-parameter dereference (QParser.getParser)."""
    if val.startswith("$"):
        name = val[1:]
        if not params or name not in params:
            raise QueryParseError(f"missing request parameter: ${name}")
        return str(params[name])
    return val


def parse_local_params(qstr: str, params: dict | None = None):
    """``{!type k=v ...}body`` -> (type, local_params, body).

    ``local_params`` maps key -> list of values (Solr local params may
    repeat a key); ``$ref`` values are resolved against ``params``.
    Non-local-params input returns ("lucene", {}, qstr)."""
    qstr = qstr if qstr is not None else ""
    if not qstr.startswith("{!"):
        return "lucene", {}, qstr

    i, n = 2, len(qstr)
    qtype: str | None = None
    local: dict[str, list[str]] = {}

    def read_value() -> str:
        nonlocal i
        if i < n and qstr[i] in "'\"":
            quote = qstr[i]
            i += 1
            buf = []
            while i < n and qstr[i] != quote:
                if qstr[i] == "\\" and i + 1 < n:
                    buf.append(qstr[i + 1])
                    i += 2
                else:
                    buf.append(qstr[i])
                    i += 1
            if i >= n:
                raise QueryParseError(f"unterminated quoted value in {qstr!r}")
            i += 1  # closing quote
            return "".join(buf)
        buf = []
        while i < n and qstr[i] not in _WS and qstr[i] != "}":
            buf.append(qstr[i])
            i += 1
        return "".join(buf)

    while True:
        while i < n and qstr[i] in _WS:
            i += 1
        if i >= n:
            raise QueryParseError(f"unterminated local params in {qstr!r}")
        if qstr[i] == "}":
            i += 1
            break
        # key or bare type token
        j = i
        while j < n and qstr[j] not in _WS and qstr[j] not in "}=":
            j += 1
        key = qstr[i:j]
        i = j
        if i < n and qstr[i] == "=":
            i += 1
            val = _resolve_ref(read_value(), params)
            if key == "type":
                qtype = val
            else:
                local.setdefault(key, []).append(val)
        else:
            if not key:
                raise QueryParseError(f"bad local params syntax in {qstr!r}")
            if qtype is None:
                qtype = _resolve_ref(key, params)
            else:
                # a bare word after the type is a flag-style param (true)
                local.setdefault(key, []).append("true")

    body = qstr[i:]
    if "v" in local:
        body = local["v"][-1]
    return (qtype or "lucene"), local, body


def _one(local: dict, key: str, default: str | None = None) -> str | None:
    vals = local.get(key)
    return vals[-1] if vals else default


def _num(local: dict, key: str, default: str, conv):
    """Numeric local param; a malformed value is a parse error (the CLI
    contract: every bad local-params input surfaces as QueryParseError,
    never a bare ValueError traceback)."""
    raw = _one(local, key, default) or default
    try:
        return conv(raw)
    except ValueError as exc:
        raise QueryParseError(f"bad numeric local param {key}={raw!r}") from exc


def _field_of(local: dict) -> str | None:
    f = _one(local, "f")
    # the engine's default field is the document text column; leave
    # leaves untagged for it so eval_node sees plain term keys
    return None if f in (None, "text") else f


def dispatch(qstr: str, params: dict | None = None):
    """QParser.getParser analog: parse ``qstr`` (local-params or plain
    classic syntax) into query IR via the registered plugin."""
    qtype, local, body = parse_local_params(qstr, params)
    plugin = _REGISTRY.get(qtype)
    if plugin is None:
        raise QueryParseError(f"unknown query parser: {qtype!r}")
    return plugin(local, body, params)


# ---------------------------------------------------------------------------
# plugins
# ---------------------------------------------------------------------------

def _p_lucene(local, body, params):
    return lucene_parse(body)


def _p_simple(local, body, params):
    default_and = (_one(local, "q.op", "OR") or "OR").upper() == "AND"
    return simple_parse(body, default_and=default_and)


def _p_term(local, body, params):
    # verbatim (readableToIndexed for a string field is identity):
    # NO analysis — "Spark" stays "Spark"
    return Term(body, field=_field_of(local))


def _p_raw(local, body, params):
    # RawQParser skips even readableToIndexed; for string-typed fields
    # it is indistinguishable from {!term}
    return Term(body, field=_field_of(local))


def _p_field(local, body, params):
    toks = tokenize_text(body)
    field = _field_of(local)
    if not toks:
        return Bool()  # analyzer ate everything: match nothing
    if len(toks) == 1:
        return Term(toks[0], field=field)
    return ("phrase", tuple(toks), 0, 1.0, field)


def _p_prefix(local, body, params):
    return ("wildcard", body + "*", 1.0, _field_of(local))


def _p_bool(local, body, params):
    def sub(key):
        return tuple(dispatch(v, params) for v in local.get(key, ()))

    node = Bool(
        must=sub("must"),
        should=sub("should"),
        must_not=sub("must_not"),
        filter=sub("filter"),
        min_should_match=_num(local, "mm", "0", int),
    )
    if not (node.must or node.should or node.must_not or node.filter):
        raise QueryParseError("{!bool} needs at least one clause param")
    return node


def _p_maxscore(local, body, params):
    """MaxScoreQParserPlugin: classic syntax, but the SHOULD clauses of
    each Boolean node combine as max (+ tie * the rest) instead of sum —
    the parser wraps them in one DisjunctionMaxQuery. MUST / MUST_NOT /
    FILTER clauses are untouched. The reference rebuilds the query with
    a single SHOULD clause, so the original minimumNumberShouldMatch is
    dropped (mirrored here)."""
    tie = _num(local, "tie", "0.0", float)

    def wrap(node):
        if isinstance(node, Bool) and node.should:
            return Bool(
                must=tuple(wrap(c) for c in node.must),
                should=(DisMax(
                    clauses=tuple(wrap(c) for c in node.should), tie=tie
                ),),
                must_not=node.must_not,
                filter=node.filter,
                boost=node.boost,
            )
        if isinstance(node, Bool):
            return Bool(
                must=tuple(wrap(c) for c in node.must),
                must_not=node.must_not,
                filter=node.filter,
                min_should_match=node.min_should_match,
                boost=node.boost,
            )
        return node

    return wrap(lucene_parse(body))


def _p_switch(local, body, params):
    val = (body or "").strip()
    if not val:
        chosen = _one(local, "case")
    else:
        chosen = _one(local, f"case.{val}")
    if chosen is None:
        chosen = _one(local, "default")
    if chosen is None:
        raise QueryParseError(
            f"{{!switch}} has no matching case for input {val!r} and no default"
        )
    return dispatch(chosen, params)


_REGISTRY = {
    "lucene": _p_lucene,
    "simple": _p_simple,
    "term": _p_term,
    "raw": _p_raw,
    "field": _p_field,
    "prefix": _p_prefix,
    "bool": _p_bool,
    "switch": _p_switch,
    "maxscore": _p_maxscore,
}


def register_qparser(name: str, plugin) -> None:
    """The QParserPlugin extension point: plugin(local, body, params) ->
    IR node. Same seam the reference exposes via solrconfig.xml."""
    _REGISTRY[name] = plugin
