"""SimpleQueryParser -> Boolean query IR.

Reference surface (SURVEY.md §2.J "Query parser / DSL" breadth):
  lucene/queryparser/.../simple/SimpleQueryParser.java
  solr/core/.../search/SimpleQParserPlugin.java ({!simple})

The simple parser is the END-USER grammar: a small operator set and the
hard contract that it NEVER throws — every malformed input degrades to
the nearest sensible query instead of erroring (the reference parses
char-by-char and treats broken syntax as text). Supported here, matching
the reference's default-enabled feature flags:

  term                 TermQuery (analyzed)
  a b                  default operator joins (OR by default, AND option)
  a + b                AND (binds TIGHTER than |, per the reference docs)
  a | b                OR
  -a                   negation (MUST_NOT at its boolean level)
  "a b"                phrase; "a b"~N sloppy phrase
  term*                PrefixQuery   (-> classic ("wildcard", ...) tuple)
  term~N               FuzzyQuery    (-> classic ("fuzzy", ...) tuple)
  (grouping)           sub-query
  \\x                  escape

Graceful-degradation cases pinned in tests/test_simpleqparser.py:
unterminated quote (rest of input is the phrase), unmatched '(' (group
closes at end of input), stray ')' (ignored), dangling +/|/- (ignored),
empty input (match-nothing Bool()).

Output IR: operators.query.Term / Bool plus the classic parser's
multi-term tuples, so plans/qparser.resolve_multi_terms and the
Boolean-tree scorer run unchanged downstream.
"""

from __future__ import annotations

from ..functions.analysis import tokenize_text
from ..operators.query import Bool, Term

_WS = set(" \t\r\n")
_SPECIAL = set('+|-"()\\')


def _lex(q: str) -> list[tuple[str, object]]:
    """Char-walking lexer; never raises."""
    out: list[tuple[str, object]] = []
    i, n = 0, len(q)
    buf: list[str] = []

    def flush():
        if buf:
            out.append(("TEXT", "".join(buf)))
            buf.clear()

    while i < n:
        c = q[i]
        if c == "\\" and i + 1 < n:
            buf.append(q[i + 1])
            i += 2
            continue
        if c in _WS:
            flush()
            out.append(("WS", None))
            i += 1
            continue
        if c == '"':
            flush()
            j = i + 1
            ph: list[str] = []
            while j < n and q[j] != '"':
                if q[j] == "\\" and j + 1 < n:
                    ph.append(q[j + 1])
                    j += 2
                else:
                    ph.append(q[j])
                    j += 1
            # unterminated quote: rest of input IS the phrase (reference
            # behavior — consume to end, no error)
            i = j + 1 if j < n else n
            slop = 0
            if i < n and q[i] == "~":
                k = i + 1
                digs = []
                while k < n and q[k].isdigit():
                    digs.append(q[k])
                    k += 1
                if digs:
                    slop = int("".join(digs))
                    i = k
            out.append(("PHRASE", (" ".join("".join(ph).split()), slop)))
            continue
        if c == "(":
            flush()
            out.append(("LP", None))
            i += 1
            continue
        if c == ")":
            flush()
            out.append(("RP", None))
            i += 1
            continue
        if c == "+":
            flush()
            out.append(("AND", None))
            i += 1
            continue
        if c == "|":
            flush()
            out.append(("OR", None))
            i += 1
            continue
        if c == "-" and not buf:
            # negation only at clause start (mid-word '-' is text)
            out.append(("NOT", None))
            i += 1
            continue
        buf.append(c)
        i += 1
    flush()
    return out


def _term_leaf(text: str):
    """One bare token -> Term / prefix / fuzzy leaf (classic tuple
    shapes, so resolve_multi_terms runs unchanged). Returns None when the
    analyzer eats everything."""
    import re

    m = re.match(r"^(.+?)~(\d*)$", text)
    if m and "*" not in m.group(1):
        toks = tokenize_text(m.group(1))
        if not toks:
            return None
        edits = int(m.group(2)) if m.group(2) else 2
        return ("fuzzy", toks[0], edits, 1.0, None)
    if text.endswith("*") and len(text) > 1 and "*" not in text[:-1]:
        base = tokenize_text(text[:-1])
        if not base:
            return None
        return ("wildcard", base[0] + "*", 1.0, None)
    toks = tokenize_text(text)
    if not toks:
        return None
    if len(toks) == 1:
        return Term(toks[0])
    return ("phrase", tuple(toks), 0, 1.0, None)


def _group_node(pos: list, neg: list, default_and: bool, had_and: bool):
    """One |-level group -> node. AND-chained positives become MUST."""
    if not pos and not neg:
        return None
    if not pos:
        return Bool(must_not=tuple(neg))  # matches nothing (pure negative)
    if len(pos) == 1 and not neg and not had_and:
        return pos[0]
    if had_and or default_and or neg:
        return Bool(must=tuple(pos), must_not=tuple(neg))
    return Bool(should=tuple(pos))


def _parse_level(toks: list, i: int, default_and: bool, depth: int):
    """Parse until RP (consumed) or end. Returns (node, next_i).

    Structure: groups joined by OR (| or the default operator when it is
    OR); '+' (or default AND) chains atoms INTO a group — '+' binds
    tighter than '|', per the reference.
    """
    groups: list = []  # each: (pos_atoms, neg_atoms, had_and)
    or_negs: list = []
    cur_pos: list = []
    cur_neg: list = []
    cur_had_and = False
    pending_and = False
    pending_or = False  # explicit '|' overrides a default AND operator
    pending_not = False

    def close_group():
        nonlocal cur_pos, cur_neg, cur_had_and
        if cur_pos or cur_neg:
            groups.append((list(cur_pos), list(cur_neg), cur_had_and))
        cur_pos, cur_neg, cur_had_and = [], [], False

    def add_atom(a):
        nonlocal pending_and, pending_or, pending_not, cur_had_and
        if a is None:
            pending_and = pending_or = pending_not = False
            return
        joined_by_and = pending_and or (
            default_and and not pending_or and (cur_pos or cur_neg)
        )
        if not joined_by_and and (cur_pos or cur_neg):
            close_group()
        if joined_by_and:
            cur_had_and = True
        (cur_neg if pending_not else cur_pos).append(a)
        pending_and = pending_or = pending_not = False

    while i < len(toks):
        kind, val = toks[i]
        i += 1
        if kind == "WS":
            continue
        if kind == "AND":
            if cur_pos or cur_neg:
                pending_and = True
            continue
        if kind == "OR":
            pending_and = False
            pending_or = True  # an explicit '|' is honored under q.op=AND
            continue
        if kind == "NOT":
            pending_not = True
            continue
        if kind == "TEXT":
            add_atom(_term_leaf(val))
            continue
        if kind == "PHRASE":
            text, slop = val
            terms = tuple(tokenize_text(text))
            if terms:
                add_atom(
                    Term(terms[0])
                    if len(terms) == 1 and slop == 0
                    else ("phrase", terms, slop, 1.0, None)
                )
            else:
                pending_and = pending_not = False
            continue
        if kind == "LP":
            sub, i = _parse_level(toks, i, default_and, depth + 1)
            add_atom(sub)
            continue
        if kind == "RP":
            if depth > 0:
                break
            continue  # stray ')' at top level: ignored
    close_group()

    # single-member all-positive groups with pure negation lift to this
    # level's MUST_NOT (reference: negation applies at its boolean level)
    nodes = []
    for pos, neg, had_and in groups:
        if not pos:
            or_negs.extend(neg)
            continue
        nodes.append(_group_node(pos, neg, default_and, had_and))
    nodes = [x for x in nodes if x is not None]
    if not nodes and not or_negs:
        return Bool(), i
    if len(nodes) == 1 and not or_negs:
        return nodes[0], i
    # under q.op=AND, whitespace joins INTO a group, so multiple groups
    # can only have been split by an explicit '|' — the groups are
    # OR-combined under either default operator
    return Bool(should=tuple(nodes), must_not=tuple(or_negs)), i


def simple_parse(query: str, default_and: bool = False):
    """Parse a simple-grammar query string. NEVER raises; empty or
    all-noise input returns a match-nothing ``Bool()``."""
    try:
        node, _ = _parse_level(_lex(query or ""), 0, default_and, 0)
        return node
    except RecursionError:  # pathological nesting: degrade, don't throw
        terms = tokenize_text(query)
        return Bool(should=tuple(Term(t) for t in terms))
