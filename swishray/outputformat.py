"""Search-result output-format templates — the reference's ``-x``
surface (``build_output_format`` / ``init_outputFormat``,
swish_xapian.cpp:758-858): ``<propname>`` placeholders, C escape
sequences (``swish_get_C_escaped_char``, string.c:992-1051: \\a \\b
\\f \\n \\r \\t \\v, \\xHH hex, \\0NN octal, any other escaped char
verbatim), everything else literal.

The default template mirrors the reference's
``"%rank %docpath \"%title\" \"%size\"\\n"`` shape with the engine's
column names: rank is the hit's score (the reference prints Xapian's
get_percent()*10 — a different scale, same slot), docpath is the doc
key, remaining names resolve against the stored properties
(build_index ``prop_cols``); a missing property renders empty, like
``doc.get_value`` on an unset slot.  ``swishlastmodified`` is
rendered through ``text.time_format`` exactly as the reference does
(swish_xapian.cpp:1073-1077).
"""
from __future__ import annotations

DEFAULT_TEMPLATE = '<swishrank> <swishdocpath> "<swishtitle>"\n'

_SIMPLE = {"a": "\a", "b": "\b", "f": "\f", "n": "\n",
           "r": "\r", "t": "\t", "v": "\v"}


def parse_output_format(tmpl: str) -> list:
    """-> list of ("lit", text) / ("prop", name) pieces.

    ``<  propname >`` tolerates leading whitespace (the reference
    skips it, swish_xapian.cpp:805-812) and ends at ``>`` or any
    whitespace."""
    out: list = []
    lit: list[str] = []
    i, n = 0, len(tmpl)
    while i < n:
        ch = tmpl[i]
        if ch == "<":
            j = i + 1
            while j < n and tmpl[j].isspace():
                j += 1
            k = j
            while k < n and tmpl[k] != ">" and not tmpl[k].isspace():
                k += 1
            if k >= n:
                raise ValueError("error parsing output_format string")
            if lit:
                out.append(("lit", "".join(lit)))
                lit = []
            out.append(("prop", tmpl[j:k]))
            i = k + 1
        elif ch == "\\":
            if i + 1 >= n:
                lit.append("\\")    # trailing backslash is literal
                i += 1
                continue
            c = tmpl[i + 1]
            if c in _SIMPLE:
                lit.append(_SIMPLE[c])
                i += 2
            elif c == "x":
                j = i + 2
                while j < n and tmpl[j] in "0123456789abcdefABCDEF":
                    j += 1
                lit.append(chr(int(tmpl[i + 2:j], 16) & 0xFF)
                           if j > i + 2 else "x")
                i = j if j > i + 2 else i + 2
            elif c == "0":
                j = i + 1
                while j < n and tmpl[j] in "01234567":
                    j += 1
                lit.append(chr(int(tmpl[i + 1:j], 8) & 0xFF))
                i = j
            else:
                lit.append(c)       # escaped char verbatim
                i += 2
        else:
            lit.append(ch)
            i += 1
    if lit:
        out.append(("lit", "".join(lit)))
    return out


def render_output_format(rows: list[dict], tmpl: str | None = None) -> str:
    """Render hit rows (each a dict with ``key``, ``score`` and any
    stored properties) through a template.  Builtin names:
    ``swishrank`` -> score, ``swishdocpath`` -> key,
    ``swishlastmodified`` -> time_format(value); anything else reads
    the row's property of that name (missing -> empty string)."""
    pieces = parse_output_format(tmpl or DEFAULT_TEMPLATE)
    out: list[str] = []
    for row in rows:
        for kind, val in pieces:
            if kind == "lit":
                out.append(val)
                continue
            if val == "swishrank":
                v = row.get("score")
            elif val == "swishdocpath":
                v = row.get("key")
            elif val == "swishlastmodified":
                ts = row.get(val)
                if ts is None:
                    out.append("")
                    continue
                from .text import time_format
                out.append(time_format(int(ts)))
                continue
            else:
                v = row.get(val)
            out.append("" if v is None else str(v))
    return "".join(out)
