"""Corpus cleaning filters from the public webtext-pipeline
literature: the C4 line/page rules (Raffel et al. 2020, §2.2) and the
Gopher document-quality rules (Rae et al. 2021, Appendix A).

All kernels are Arrow/RE2 vectorized over the batch — line-level
statistics run over the FLATTENED split-line array and reduce back
per document with the cumsum-gather pattern (textstats.
_word_stat_arrays); no per-row Python in either stage.  Both are
map-side only (no shuffle) and oracle-paired via queries()
``c4_clean`` / ``gopher_quality``.

These complement, not duplicate, the neighbouring ops: boilerplate.py
removes lines duplicated ACROSS documents (corpus-wide state);
these filters are per-document policy rules.
"""
from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

# C4 defaults (the paper's values)
C4_MIN_WORDS_PER_LINE = 5
C4_MIN_LINES = 3
C4_BAN_SUBSTRINGS = ("lorem ipsum", "{")
C4_LINE_BAN = "javascript"
_TERMINAL = r'[.!?"]$'


def _per_doc_sums(flat_vals: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    c = np.concatenate(([0], np.cumsum(flat_vals, dtype=np.int64)))
    return c[offsets[1:] - offsets[0]] - c[offsets[:-1] - offsets[0]]


def _text_col(batch: pa.Table, col: str):
    import pyarrow.compute as pc
    c = batch.column(col)
    if pa.types.is_null(c.type):  # an all-None block is null-typed
        c = c.cast(pa.large_string())
    return pc.coalesce(c, "").combine_chunks()


def c4_clean(ds: Any, col: str = "text", key: str = "doc_id",
             min_words_per_line: int = C4_MIN_WORDS_PER_LINE,
             min_lines: int = C4_MIN_LINES,
             sep: str = "\n") -> Any:
    """C4 §2.2 cleaning: keep only lines that end in terminal
    punctuation, have >= ``min_words_per_line`` words and don't
    mention javascript; then drop whole documents with fewer than
    ``min_lines`` surviving lines or containing a banned substring
    ("lorem ipsum", "{").  Returns ``(key, clean_text, n_lines_kept,
    n_lines_dropped, doc_kept)`` — dropped docs stay as rows with
    ``doc_kept=false`` so the filter is auditable (filter with
    ``.filter`` downstream for the destructive form)."""
    import pandas as pd
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        txt = _text_col(batch, col)
        n = len(txt)
        low = pc.utf8_lower(txt)
        banned = np.zeros(n, dtype=bool)
        for s in C4_BAN_SUBSTRINGS:
            banned |= pc.match_substring(low, s) \
                .to_numpy(zero_copy_only=False)

        lines = pc.split_pattern(txt, sep)
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        flat = lines.flatten()
        offs = lines.offsets.to_numpy(zero_copy_only=False)
        ends_term = pc.match_substring_regex(
            pc.utf8_rtrim_whitespace(flat), _TERMINAL) \
            .to_numpy(zero_copy_only=False)
        enough_words = (pc.count_substring_regex(flat, r"\S+")
                        .to_numpy(zero_copy_only=False)
                        >= min_words_per_line)
        no_js = np.invert(pc.match_substring(
            pc.utf8_lower(flat), C4_LINE_BAN)
            .to_numpy(zero_copy_only=False))
        keep_line = ends_term & enough_words & no_js

        kept_per_doc = _per_doc_sums(keep_line.astype(np.int64), offs)
        total_per_doc = (offs[1:] - offs[:-1]).astype(np.int64)
        doc_kept = (kept_per_doc >= min_lines) & ~banned

        # reassemble kept lines per doc (one vectorized pandas pass,
        # the boilerplate.strip pattern)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64),
                            total_per_doc)
        df = pd.DataFrame({
            "d": doc_idx[keep_line],
            "l": pd.Series(
                flat.filter(pa.array(keep_line)).to_pandas())})
        joined = df.groupby("d", sort=False)["l"].agg(sep.join)
        clean = joined.reindex(np.arange(n)).fillna("")
        clean[~doc_kept] = ""
        return pa.table({
            key: batch.column(key),
            "clean_text": pa.array(clean.values, pa.large_string()),
            "n_lines_kept": pa.array(kept_per_doc),
            "n_lines_dropped": pa.array(total_per_doc - kept_per_doc),
            "doc_kept": pa.array(doc_kept),
        })

    return ds.map_batches(f, batch_format="pyarrow")


# Gopher defaults (Rae et al. 2021 Appendix A)
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1       # '#' or '...' per word
GOPHER_MAX_BULLET_FRAC = 0.9        # lines starting with a bullet
GOPHER_MAX_ELLIPSIS_FRAC = 0.3      # lines ending with '...'
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8    # words containing a letter


def gopher_quality(ds: Any, col: str = "text", key: str = "doc_id",
                   sep: str = "\n") -> Any:
    """Gopher quality rules as per-doc flags + an overall ``keep``:
    word count bounds, mean word length bounds, symbol-to-word ratio,
    bullet-start / ellipsis-end line fractions, alpha-word fraction.
    (The paper's stopword rule is quality_scores' stopword_ratio —
    compose as needed.)"""
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        txt = _text_col(batch, col)
        n_words = pc.count_substring_regex(txt, r"\S+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n_chars = pc.utf8_length(txt).to_numpy(zero_copy_only=False)
        n_ws = pc.count_substring_regex(txt, r"\s") \
            .to_numpy(zero_copy_only=False)
        nw = np.maximum(n_words, 1)
        mean_wl = (n_chars - n_ws) / nw

        n_hash = pc.count_substring(txt, "#") \
            .to_numpy(zero_copy_only=False)
        n_ell = pc.count_substring(txt, "...") \
            .to_numpy(zero_copy_only=False)
        symbol_ratio = (n_hash + n_ell) / nw

        n_alpha_words = pc.count_substring_regex(
            txt, r"\S*\pL\S*").to_numpy(zero_copy_only=False)
        alpha_frac = n_alpha_words / nw

        lines = pc.split_pattern(txt, sep)
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        flat = lines.flatten()
        offs = lines.offsets.to_numpy(zero_copy_only=False)
        n_lines = np.maximum(offs[1:] - offs[:-1], 1)
        bullet = pc.match_substring_regex(
            pc.utf8_ltrim_whitespace(flat), r"^([-*•]|\d+\.)\s") \
            .to_numpy(zero_copy_only=False)
        ell_end = pc.match_substring_regex(
            pc.utf8_rtrim_whitespace(flat), r"\.\.\.$") \
            .to_numpy(zero_copy_only=False)
        bullet_frac = _per_doc_sums(bullet.astype(np.int64),
                                    offs) / n_lines
        ell_frac = _per_doc_sums(ell_end.astype(np.int64),
                                 offs) / n_lines

        ok_words = ((n_words >= GOPHER_MIN_WORDS)
                    & (n_words <= GOPHER_MAX_WORDS))
        ok_mwl = ((mean_wl >= GOPHER_MIN_MEAN_WORD_LEN)
                  & (mean_wl <= GOPHER_MAX_MEAN_WORD_LEN))
        ok_sym = symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO
        ok_bullet = bullet_frac <= GOPHER_MAX_BULLET_FRAC
        ok_ell = ell_frac <= GOPHER_MAX_ELLIPSIS_FRAC
        ok_alpha = alpha_frac >= GOPHER_MIN_ALPHA_WORD_FRAC
        keep = (ok_words & ok_mwl & ok_sym & ok_bullet & ok_ell
                & ok_alpha)
        return pa.table({
            key: batch.column(key),
            "n_words": pa.array(n_words),
            "mean_word_len": pa.array(mean_wl, pa.float64()),
            "symbol_ratio": pa.array(symbol_ratio, pa.float64()),
            "bullet_frac": pa.array(bullet_frac, pa.float64()),
            "ellipsis_frac": pa.array(ell_frac, pa.float64()),
            "alpha_word_frac": pa.array(alpha_frac, pa.float64()),
            "keep": pa.array(keep),
        })

    return ds.map_batches(f, batch_format="pyarrow")
