"""JSON Query DSL — the Solr JSON Request API's structured query bodies
(solr/core/src/java/org/apache/solr/request/json/RequestUtil.java +
JsonQueryConverter.java; documented as the "JSON Query DSL"):

  {"query": "...classic..."}                      -> default lucene parser
  {"query": {"lucene": "spark AND merge"}}        -> named parser, string arg
  {"query": {"field": {"f": "text",
                       "query": "order batch"}}}  -> named parser, params+query
  {"query": {"bool": {"must": [...], "should": [...],
                      "must_not": [...], "filter": [...],
                      "mm": 1}}}                  -> nested boolean tree
  {"filter": [ ...query-shaped entries... ]}      -> top-level filters

The reference converts each JSON object into the equivalent local-params
string and routes it through QParser.getParser — JsonQueryConverter
literally emits ``{!type k=v}body``. This module does the same: non-bool
nodes are rendered to local-params strings and dispatched through
plans/localparams.py (ONE parser registry for both syntaxes, exactly the
reference seam); ``bool`` recurses natively so nested structures never
round-trip through string quoting. Output is the same IR
(operators.query.Term/Bool/tuples), so every downstream path — match
columns, resolve_multi_terms, Searcher.topk_query — serves JSON-DSL
queries unchanged.
"""

from __future__ import annotations

from ..operators.query import Bool
from .localparams import QueryParseError, dispatch


def _quote(v) -> str:
    s = str(v)
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def compile_json_query(q, params: dict | None = None):
    """One JSON query node -> query IR."""
    if isinstance(q, str):
        return dispatch(q, params)  # classic string, default parser
    if not isinstance(q, dict) or len(q) != 1:
        raise QueryParseError(
            f"JSON query must be a string or a single-key object, got {q!r}"
        )
    ((qtype, args),) = q.items()
    if qtype == "bool":
        if not isinstance(args, dict):
            raise QueryParseError("bool query body must be an object")
        known = {"must", "should", "must_not", "filter", "mm"}
        bad = set(args) - known
        if bad:
            raise QueryParseError(f"unknown bool keys: {sorted(bad)}")

        def clauses(key):
            v = args.get(key, [])
            v = v if isinstance(v, list) else [v]
            return tuple(compile_json_query(c, params) for c in v)

        node = Bool(
            must=clauses("must"),
            should=clauses("should"),
            must_not=clauses("must_not"),
            filter=clauses("filter"),
            min_should_match=int(args.get("mm", 0)),
        )
        if not (node.must or node.should or node.must_not or node.filter):
            raise QueryParseError("bool query needs at least one clause")
        return node
    # named parser: render the local-params string JsonQueryConverter emits
    if isinstance(args, str):
        return dispatch(f"{{!{qtype}}}{args}", params)
    if isinstance(args, dict):
        body = args.get("query", "")
        if not isinstance(body, str):
            raise QueryParseError(
                f"{qtype}.query must be a string (nest bools via 'bool')"
            )
        locals_ = " ".join(
            f"{k}={_quote(v)}" for k, v in sorted(args.items()) if k != "query"
        )
        prefix = f"{{!{qtype} {locals_}}}" if locals_ else f"{{!{qtype}}}"
        return dispatch(prefix + body, params)
    raise QueryParseError(f"bad args for JSON query type {qtype!r}: {args!r}")


def compile_json_request(request: dict, params: dict | None = None):
    """Full JSON request body -> (query IR, tuple of filter IRs).

    Supports the request keys the query DSL defines: ``query`` (required)
    and ``filter`` (list or single entry). Other JSON Request API keys
    (fields, facet, params...) belong to their own components.
    """
    if "query" not in request:
        raise QueryParseError("JSON request needs a 'query'")
    unknown = set(request) - {"query", "filter"}
    if unknown:
        raise QueryParseError(f"unsupported JSON request keys: {sorted(unknown)}")
    node = compile_json_query(request["query"], params)
    flt = request.get("filter", [])
    flt = flt if isinstance(flt, list) else [flt]
    return node, tuple(compile_json_query(f, params) for f in flt)
