"""Brute-force minimal-interval oracle.

Mirrors EXACTLY the pinned semantics in operators/intervals.py's module
docstring, but by exhaustive enumeration: every node materializes the
full cartesian product of its sub-results (no greedy chains, no
smallest-range walk), computes covering interval + gaps from first
principles, dedupes (start, end) to the min gaps, and applies an O(n^2)
minimality filter. Used only by tests/test_intervals.py for random-case
parity against the production kernel.

Gaps caveat (pinned): for composite sub-sources the production kernel's
gaps value is the one of its deterministic greedy chain, while this
oracle takes the min over all chains with the same covering interval.
With term leaves (every sub-interval width 1, gaps 0) the two coincide
exactly — parity on gaps is asserted for term-leaf trees, and on
(start, end) sets for arbitrary trees.
"""

from __future__ import annotations

from itertools import product

from lucene_solr_spark.operators.intervals import (
    IAfter,
    IBefore,
    IContainedBy,
    IContaining,
    IExtend,
    IMaxgaps,
    INotContainedBy,
    INotContaining,
    INotOverlapping,
    IOr,
    IOrdered,
    IOverlapping,
    IPhrase,
    ITerm,
    IUnordered,
)


def _minimal_brute(ivs):
    best = {}
    for s, e, g in ivs:
        k = (s, e)
        if k not in best or g < best[k]:
            best[k] = g
    keys = list(best)
    out = []
    for s, e in keys:
        contained = any(
            (s2, e2) != (s, e) and s <= s2 and e2 <= e for s2, e2 in keys
        )
        if not contained:
            out.append((s, e, best[(s, e)]))
    return sorted(out)


def _w(iv):
    return iv[1] - iv[0] + 1


def brute_intervals(node, positions):
    if isinstance(node, ITerm):
        pos = positions.get(node.term)
        if pos is None or len(pos) == 0:
            return []
        return [(int(p), int(p), 0) for p in pos]
    if isinstance(node, IOr):
        out = []
        for s in node.sources:
            out.extend(brute_intervals(s, positions))
        return _minimal_brute(out)
    if isinstance(node, (IOrdered, IPhrase)):
        subs = [brute_intervals(s, positions) for s in node.sources]
        if any(not lst for lst in subs):
            return []
        out = []
        for combo in product(*subs):
            ok = True
            for a, b in zip(combo, combo[1:]):
                if isinstance(node, IPhrase):
                    if b[0] != a[1] + 1:
                        ok = False
                        break
                elif b[0] <= a[1]:
                    ok = False
                    break
            if not ok:
                continue
            s, e = combo[0][0], combo[-1][1]
            g = (e - s + 1) - sum(_w(iv) for iv in combo) + sum(iv[2] for iv in combo)
            out.append((s, e, g))
        return _minimal_brute(out)
    if isinstance(node, IUnordered):
        subs = [brute_intervals(s, positions) for s in node.sources]
        if any(not lst for lst in subs):
            return []
        out = []
        for combo in product(*subs):
            s = min(iv[0] for iv in combo)
            e = max(iv[1] for iv in combo)
            g = max(0, (e - s + 1) - sum(_w(iv) for iv in combo)) + sum(
                iv[2] for iv in combo
            )
            out.append((s, e, g))
        return _minimal_brute(out)
    if isinstance(node, IMaxgaps):
        return [
            iv for iv in brute_intervals(node.source, positions) if iv[2] <= node.maxgaps
        ]
    if isinstance(node, (IContaining, INotContaining)):
        big = brute_intervals(node.big, positions)
        little = brute_intervals(node.little, positions)
        keep = isinstance(node, IContaining)
        return [
            iv
            for iv in big
            if any(iv[0] <= ls and le <= iv[1] for ls, le, _ in little) == keep
        ]
    if isinstance(node, (IContainedBy, INotContainedBy)):
        little = brute_intervals(node.little, positions)
        big = brute_intervals(node.big, positions)
        keep = isinstance(node, IContainedBy)
        return [
            iv
            for iv in little
            if any(s <= iv[0] and iv[1] <= e for s, e, _ in big) == keep
        ]
    if isinstance(node, (IBefore, IAfter)):
        src = brute_intervals(node.source, positions)
        ref = brute_intervals(node.reference, positions)
        if not ref:
            return []
        if isinstance(node, IBefore):
            return [iv for iv in src if any(iv[1] < s for s, _, _ in ref)]
        return [iv for iv in src if any(iv[0] > e for _, e, _ in ref)]
    if isinstance(node, (IOverlapping, INotOverlapping)):
        src = brute_intervals(node.source, positions)
        ref = brute_intervals(node.reference, positions)
        keep = isinstance(node, IOverlapping)
        return [
            iv
            for iv in src
            if any(iv[0] <= e and s <= iv[1] for s, e, _ in ref) == keep
        ]
    if isinstance(node, IExtend):
        return _minimal_brute(
            [
                (max(0, s - node.before), e + node.after, g)
                for s, e, g in brute_intervals(node.source, positions)
            ]
        )
    raise TypeError(f"unknown interval node: {node!r}")
