"""Boolean query-string parser for the index searcher — the engine's
analog of the reference's search-time query surface.

The reference delegates query parsing to Xapian with exactly these
flags (swish_xapian.cpp:1022-1027): ``FLAG_WILDCARD | FLAG_BOOLEAN |
FLAG_BOOLEAN_ANY_CASE | FLAG_PHRASE``, plus one ``add_prefix`` per
configured MetaName (swish_xapian.cpp:384-400) so ``title:foo``
scopes ``foo`` to that metaname.  This module re-implements that
grammar standalone:

  * ``AND`` / ``OR`` / ``NOT`` in any case (BOOLEAN_ANY_CASE);
    ``a NOT b`` == ``a AND NOT b`` (Xapian's AND_NOT)
  * parenthesised groups
  * ``"quoted phrase"`` (FLAG_PHRASE) — exact adjacency over
    positional postings
  * trailing-``*`` wildcard (FLAG_WILDCARD) — lexicon prefix
    expansion, OR-combined
  * ``meta:term`` and ``meta:"a phrase"`` prefixes
  * two bare atoms side by side combine with the DEFAULT operator —
    OR, Xapian's QueryParser default (the reference never calls
    ``set_default_op``)

A query with no positive side (``NOT x``, ``()``) raises ValueError,
matching Xapian's "pure NOT" rejection.

AST node shapes (plain tuples, no classes — the evaluator lives in
``index.IndexSearcher.search_query``):

  ("term",   meta|None, term)
  ("wild",   meta|None, prefix)          # trailing * stripped
  ("phrase", meta|None, [term, ...])     # len >= 2; 1-word phrases
                                         # collapse to ("term", ...)
  ("range",  prop, low, high)            # prop:low..high — Xapian
                                         # OP_VALUE_RANGE (inclusive,
                                         # weight-0 filter)
  ("and", l, r) | ("or", l, r) | ("not", l, r)   # not = AND_NOT
"""
from __future__ import annotations

import re

_TOKEN = re.compile(
    r'[A-Za-z_][\w.\-]*:"[^"]*"'   # meta:"quoted phrase"
    r'|"[^"]*"'                    # "quoted phrase"
    r'|\('
    r'|\)'
    r'|[^\s()]+'                   # bare atom (may carry meta: / *)
)
_META = re.compile(r'^([A-Za-z_][\w.\-]*):(.+)$', re.S)


_RANGE = re.compile(r'^(.+?)\.\.(.+)$', re.S)


def _leaf(tok: str):
    meta = None
    m = _META.match(tok)
    if m and not tok.startswith('"'):
        meta, tok = m.group(1), m.group(2)
        # prop:low..high — Xapian OP_VALUE_RANGE via the reference's
        # PropertyValueRangeProcessor (swish_xapian.cpp:860-952);
        # prefix-less ranges fall through to terms, as BAD_VALUENO
        # does there
        r = _RANGE.match(tok)
        if r and not tok.startswith('"'):
            return ("range", meta, r.group(1), r.group(2))
    if tok.startswith('"'):
        words = tok[1:-1].split()
        if not words:
            return None
        if len(words) == 1:
            return ("term", meta, words[0])
        return ("phrase", meta, words)
    if tok.endswith("*") and len(tok) > 1 and "*" not in tok[:-1]:
        return ("wild", meta, tok[:-1])
    return ("term", meta, tok)


def parse_query(q: str):
    """Query string -> AST (module doc).  Raises ValueError on
    malformed input: unbalanced parens, dangling operator, pure-NOT
    query, empty query."""
    toks = _TOKEN.findall(q)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def is_kw(tok, kw):
        return (tok is not None and not tok.startswith('"')
                and tok.upper() == kw)

    def atom():
        nonlocal pos
        tok = peek()
        if tok is None:
            raise ValueError("query ended where a term was expected")
        if tok == "(":
            pos += 1
            node = or_expr()
            if peek() != ")":
                raise ValueError("unbalanced parenthesis")
            pos += 1
            return node
        if tok == ")":
            raise ValueError("unbalanced parenthesis")
        if any(is_kw(tok, k) for k in ("AND", "OR", "NOT")):
            raise ValueError(f"operator {tok!r} where a term was "
                             "expected (pure-NOT queries are "
                             "rejected, as in Xapian)")
        pos += 1
        leaf = _leaf(tok)
        if leaf is None:
            raise ValueError("empty phrase")
        return leaf

    def and_expr():
        # AND binds tighter than OR; "x NOT y" == "x AND NOT y"
        nonlocal pos
        node = atom()
        while True:
            tok = peek()
            if is_kw(tok, "AND"):
                pos += 1
                if is_kw(peek(), "NOT"):
                    pos += 1
                    node = ("not", node, atom())
                else:
                    node = ("and", node, atom())
            elif is_kw(tok, "NOT"):
                pos += 1
                node = ("not", node, atom())
            else:
                return node

    def or_expr():
        # explicit OR and bare adjacency (the default op) both land
        # here, so "a b AND c" parses as a OR (b AND c) — Xapian's
        # grouping for a default-OR parser
        nonlocal pos
        node = and_expr()
        while True:
            tok = peek()
            if is_kw(tok, "OR"):
                pos += 1
                node = ("or", node, and_expr())
            elif tok is not None and tok != ")":
                node = ("or", node, and_expr())
            else:
                return node

    if not toks:
        raise ValueError("empty query")
    tree = or_expr()
    if pos != len(toks):
        raise ValueError("unbalanced parenthesis")
    return tree


def query_terms(node) -> list:
    """Positive (non-NOT-side) leaf nodes, left-to-right — what a
    ranker should weight."""
    kind = node[0]
    if kind in ("term", "wild", "phrase"):
        return [node]
    if kind == "range":
        return []       # weight-0 filter, not a rankable term
    if kind == "not":
        return query_terms(node[1])
    return query_terms(node[1]) + query_terms(node[2])
