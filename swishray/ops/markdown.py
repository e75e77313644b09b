"""Markdown -> text extraction tier.

Web crawls of code forges and documentation sites are full of
Markdown; a training-data pipeline strips its markup the same way
the HTML tier strips tags (north-star "main-content extraction":
boilerplate OFF, prose kept).  This is a CommonMark-subset stripper
built from ordered RE2 passes — every pass is a vectorized
``pc.replace_substring_regex`` over the whole batch column, no
per-row Python — chosen so the identical regex sequence can run in
DuckDB ``regexp_replace(..., 'g')`` for the oracle (both engines are
RE2).

Handled: fenced-code fence lines (content kept — code is training
signal), images (alt text kept), inline/reference links (anchor text
kept; reference-definition lines dropped), ATX headings, blockquote
markers, bold/italic (``**``/``*``/``__``/``_``), inline code spans,
horizontal rules, bullet / ordered-list markers, 3+ blank-line
squeeze, edge trim.

Scale shape: pure map-side; compose upstream of the quality /
dedup stages exactly like ``extract_main_content``.
"""
from __future__ import annotations

from typing import Any

import pyarrow as pa

# (pattern, replacement) in application order — RE2-safe (no
# backtracking, no lookaround), shared verbatim with the SQL oracle.
MD_PASSES: tuple[tuple[str, str], ...] = (
    (r"(?m)^```.*$", ""),                      # code-fence lines
    (r"!\[([^\]]*)\]\([^)]*\)", r"\1"),        # images -> alt
    (r"\[([^\]]*)\]\([^)]*\)", r"\1"),         # inline links -> text
    (r"(?m)^\[[^\]]+\]:[ \t].*$", ""),         # reference link defs
    (r"\[([^\]]*)\]\[[^\]]*\]", r"\1"),        # reference links
    (r"(?m)^#{1,6}[ \t]+", ""),                # ATX headings
    (r"(?m)^>[ \t]?", ""),                     # blockquotes
    (r"\*\*([^*]+)\*\*", r"\1"),               # bold
    (r"__([^_]+)__", r"\1"),
    (r"\*([^*]+)\*", r"\1"),                   # italics
    (r"_([^_]+)_", r"\1"),
    (r"`([^`]+)`", r"\1"),                     # inline code
    (r"(?m)^[ \t]*(-{3,}|\*{3,})[ \t]*$", ""),  # hrules
    (r"(?m)^[ \t]*[-*+][ \t]+", ""),           # bullets
    (r"(?m)^[ \t]*[0-9]+\.[ \t]+", ""),        # ordered lists
    (r"\n{3,}", "\n\n"),                       # blank-line squeeze
)


def strip_markdown(ds: Any, col: str = "text", key: str = "doc_id",
                   out: str | None = None) -> Any:
    """Strip Markdown markup from ``col`` (see module doc).  Output:
    input columns with ``out`` (default in-place) stripped + trimmed."""
    import pyarrow.compute as pc

    o = out or col

    def f(batch: pa.Table) -> pa.Table:
        t = pc.cast(pc.coalesce(batch.column(col), ""),
                    pa.large_string())
        for pat, rep in MD_PASSES:
            t = pc.replace_substring_regex(t, pat, rep)
        t = pc.utf8_trim_whitespace(t)
        if o in batch.column_names:
            return batch.set_column(batch.column_names.index(o), o, t)
        return batch.append_column(o, t)

    return ds.map_batches(f, batch_format="pyarrow")
