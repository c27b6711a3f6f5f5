"""XML query parser — the lucene/queryparser/xml CoreParser analog.

Reference surface being re-expressed (SURVEY.md §2.J query parsers):
  lucene/queryparser/.../xml/CoreParser.java + builders/
    TermQueryBuilder.java, BooleanQueryBuilder.java,
    UserInputQueryBuilder.java, MatchAllDocsQueryBuilder.java — an XML
    query DSL where element names select QueryBuilder plugins and
    <Clause occurs="..."> nests arbitrary sub-queries
  solr's XmlQParserPlugin.java — the {!xmlparser} hook

Pinned subset (element -> engine node, operators/query.py):
  <TermQuery fieldName? boost?>text</TermQuery>      -> Term
  <PhraseQuery fieldName? boost? slop?>...</...>     -> Phrase
  <BooleanQuery boost? minimumNumberShouldMatch?>
      <Clause occurs="must|should|mustNot|filter"> sub </Clause>...
  </BooleanQuery>                                    -> Bool
  <UserQuery>classic syntax</UserQuery>              -> plans/qparser.parse
  <MatchAllDocsQuery/>                               -> Bool() (empty tree;
                                                        match-all handled
                                                        by callers)
Unknown elements raise (CoreParser's "Unknown query element" behavior);
term/phrase text runs through the standard analyzer like every other
query surface.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from ..functions.analysis import tokenize_text
from .query import Bool, Phrase, Term


class XmlQueryError(ValueError):
    pass


_OCCURS = {"must": "must", "should": "should", "mustNot": "must_not",
           "filter": "filter"}


def parse_xml_query(src: str):
    """XML source -> engine query tree (CoreParser#parse analog)."""
    try:
        root = ET.fromstring(src)
    except ET.ParseError as exc:
        raise XmlQueryError(f"malformed XML: {exc}") from exc
    return _build(root)


def _build(el):
    tag = el.tag
    if tag == "TermQuery":
        terms = tokenize_text(el.text or "")
        if len(terms) != 1:
            raise XmlQueryError(
                f"TermQuery text {el.text!r} must analyze to one token"
            )
        return Term(
            terms[0],
            boost=float(el.get("boost", 1.0)),
            field=el.get("fieldName"),
        )
    if tag == "PhraseQuery":
        terms = tokenize_text(el.text or "")
        if len(terms) < 2:
            raise XmlQueryError("PhraseQuery needs >= 2 analyzed tokens")
        return Phrase(
            tuple(terms),
            slop=int(el.get("slop", 0)),
            boost=float(el.get("boost", 1.0)),
            field=el.get("fieldName"),
        )
    if tag == "BooleanQuery":
        buckets = {"must": [], "should": [], "must_not": [], "filter": []}
        for child in el:
            if child.tag != "Clause":
                raise XmlQueryError(
                    f"BooleanQuery child must be <Clause>, got <{child.tag}>"
                )
            occ = child.get("occurs", "should")
            if occ not in _OCCURS:
                raise XmlQueryError(f"unknown occurs={occ!r}")
            subs = list(child)
            if len(subs) != 1:
                raise XmlQueryError("<Clause> must hold exactly one query")
            if subs[0].tag == "MatchAllDocsQuery":
                raise XmlQueryError(
                    "MatchAllDocsQuery is only supported at top level"
                )
            buckets[_OCCURS[occ]].append(_build(subs[0]))
        return Bool(
            must=tuple(buckets["must"]),
            should=tuple(buckets["should"]),
            must_not=tuple(buckets["must_not"]),
            filter=tuple(buckets["filter"]),
            min_should_match=int(el.get("minimumNumberShouldMatch", 0)),
            boost=float(el.get("boost", 1.0)),
        )
    if tag == "UserQuery":
        from ..plans.qparser import parse as classic_parse

        return classic_parse(el.text or "")
    if tag == "MatchAllDocsQuery":
        return Bool()
    raise XmlQueryError(f"unknown query element <{tag}>")
