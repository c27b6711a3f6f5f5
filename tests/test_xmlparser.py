"""XML query parser (operators/xmlparser.py) — element -> engine-node
structural pinning (CoreParser / QueryBuilder-plugin analogs). The tree
scorer is pinned elsewhere; the oracled driver row xml_query_topk pins
the end-to-end float32 path against the classic-parser mirror."""

from __future__ import annotations

import pytest

from lucene_solr_spark.operators.query import Bool, Phrase, Term
from lucene_solr_spark.operators.xmlparser import (
    XmlQueryError,
    parse_xml_query,
)


def test_term_query():
    assert parse_xml_query("<TermQuery>Spark</TermQuery>") == Term("spark")
    got = parse_xml_query('<TermQuery fieldName="title" boost="2">x</TermQuery>')
    assert got == Term("x", boost=2.0, field="title")


def test_phrase_query():
    got = parse_xml_query('<PhraseQuery slop="1">big Data</PhraseQuery>')
    assert got == Phrase(("big", "data"), slop=1)


def test_boolean_query_clauses():
    xml = (
        '<BooleanQuery minimumNumberShouldMatch="1" boost="1.5">'
        '<Clause occurs="must"><TermQuery>a</TermQuery></Clause>'
        '<Clause occurs="should"><TermQuery>b</TermQuery></Clause>'
        '<Clause occurs="mustNot"><TermQuery>c</TermQuery></Clause>'
        '<Clause occurs="filter"><TermQuery>d</TermQuery></Clause>'
        "</BooleanQuery>"
    )
    got = parse_xml_query(xml)
    assert got == Bool(
        must=(Term("a"),),
        should=(Term("b"),),
        must_not=(Term("c"),),
        filter=(Term("d"),),
        min_should_match=1,
        boost=1.5,
    )


def test_nested_boolean():
    xml = (
        "<BooleanQuery>"
        '<Clause occurs="must"><BooleanQuery>'
        '<Clause occurs="should"><TermQuery>x</TermQuery></Clause>'
        '<Clause occurs="should"><TermQuery>y</TermQuery></Clause>'
        "</BooleanQuery></Clause>"
        "</BooleanQuery>"
    )
    got = parse_xml_query(xml)
    assert got.must[0] == Bool(should=(Term("x"), Term("y")))


def test_user_query_delegates_to_classic_parser():
    from lucene_solr_spark.plans.qparser import parse as classic

    assert parse_xml_query(
        "<UserQuery>+order batch^2 -table</UserQuery>"
    ) == classic("+order batch^2 -table")


def test_match_all():
    assert parse_xml_query("<MatchAllDocsQuery/>") == Bool()


@pytest.mark.parametrize(
    "bad",
    [
        "<WhatQuery>x</WhatQuery>",                      # unknown element
        "<TermQuery>two words</TermQuery>",              # not one token
        "<PhraseQuery>solo</PhraseQuery>",               # < 2 tokens
        '<BooleanQuery><TermQuery>x</TermQuery></BooleanQuery>',  # no Clause
        '<BooleanQuery><Clause occurs="nope"><TermQuery>x</TermQuery></Clause></BooleanQuery>',
        '<BooleanQuery><Clause occurs="must"></Clause></BooleanQuery>',
        "<BooleanQuery",                                 # malformed XML
    ],
)
def test_errors(bad):
    with pytest.raises(XmlQueryError):
        parse_xml_query(bad)


def test_nested_match_all_rejected():
    xml = (
        '<BooleanQuery><Clause occurs="should">'
        "<MatchAllDocsQuery/></Clause></BooleanQuery>"
    )
    with pytest.raises(XmlQueryError):
        parse_xml_query(xml)
