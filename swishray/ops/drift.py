"""Corpus drift monitoring: per-token distribution divergence between
two slices of a corpus (a language vs the rest, this crawl vs the
last, a source vs the mixture target).

A training-data pipeline needs to SEE distribution shift before it
trains on it; the classic summary statistics (KL, chi-square) are
sums of per-token contributions, and the sum's float value depends on
accumulation order — so the oracle-checkable unit here is the
PER-TOKEN contribution row (one fixed IEEE expression per row, no
accumulation), with the scalar statistic left to the consumer as a
trivial reduce. Same bit-parity discipline as
textstats.collocations_pmi / stats.group_linreg.

Scale shape: one map-side-combined (slice, token, count) census
shuffle — documents never move; two tiny follow-up aggregates (per-
slice totals, vocabulary size); one slim word-keyed outer join of the
two census halves; vectorized contribution math; distributed
sort+limit for the top-k cut.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def drift_census(ds: Any, is_a: Callable[[pa.Table], pa.Array],
                 col: str = "text", top: int | None = None) -> Any:
    """Chi-square drift census between slice A (rows where ``is_a``
    returns true) and slice B (the rest).

    Tokens are whitespace words (the corpus-census convention shared
    with ngram_counts / top_words oracles). Probabilities are
    Laplace-smoothed over the JOINT vocabulary V:
    ``p = (n + 1) / (total + V)``, so a token absent from one slice
    still has mass and the per-token contribution
    ``chi2 = (p_a - p_b)^2 / p_b`` is always finite. Output columns:
    token, n_a, n_b, chi2 — sorted (chi2 desc, token asc) and cut to
    ``top`` when given.
    """
    from collections import Counter

    from ray.data.aggregate import Count, Sum

    def census(batch: pa.Table) -> pa.Table:
        a_mask = np.asarray(is_a(batch), dtype=bool)
        texts = batch.column(col).to_pylist()
        ca: Counter = Counter()
        cb: Counter = Counter()
        for t, a in zip(texts, a_mask):
            (ca if a else cb).update((t or "").split())
        toks = list(ca.keys()) + list(cb.keys())
        sides = np.concatenate([np.ones(len(ca), dtype=np.int8),
                                np.zeros(len(cb), dtype=np.int8)])
        ns = list(ca.values()) + list(cb.values())
        return pa.table({
            "token": pa.array(toks, type=pa.string()),
            "__a": pa.array(sides),
            "__n": pa.array(ns, type=pa.int64())})

    cens = ds.map_batches(census, batch_format="pyarrow") \
        .groupby(["token", "__a"]).aggregate(Sum("__n", alias_name="n")) \
        .materialize()

    tot = {int(r["__a"]): int(r["n"])
           for r in cens.groupby("__a")
           .aggregate(Sum("n", alias_name="n")).take_all()}
    tot_a, tot_b = tot.get(1, 0), tot.get(0, 0)
    vocab = cens.groupby("token").aggregate(Count(alias_name="c")) \
        .count()

    # word-keyed merge of the two census halves. The census is
    # already one row per (token, side) — pivot it side-by-side with
    # a bucketed pandas merge (hash_join shape) instead of a per-key
    # map_groups. The halves carry DISTINCT count column names so an
    # all-one-slice corpus (the join's degenerate pass-through shape)
    # stays unambiguous.
    from .joins import hash_join

    def half(side_val: int, out_col: str):
        def f(t: pa.Table) -> pa.Table:
            s = t.filter(pc.equal(t.column("__a"), side_val))
            return pa.table({
                "token": s.column("token"),
                out_col: pc.cast(s.column("n"), pa.int64())})
        return f

    a_half = cens.map_batches(half(1, "na"), batch_format="pyarrow")
    b_half = cens.map_batches(half(0, "nb"), batch_format="pyarrow")

    joined = hash_join(a_half, b_half, "token", how="outer")

    def contrib(batch: pa.Table) -> pa.Table:
        names = batch.column_names

        def counts(*cands) -> np.ndarray:
            for c in cands:
                if c in names:
                    return np.nan_to_num(
                        batch.column(c).to_numpy(zero_copy_only=False)
                        .astype(np.float64), nan=0.0)
            return np.zeros(batch.num_rows)

        na = counts("na", "na_r").astype(np.int64)
        nb = counts("nb_r", "nb").astype(np.int64)
        # one fixed IEEE expression per row — DuckDB replays it
        p_a = (na + 1.0) / float(tot_a + vocab)
        p_b = (nb + 1.0) / float(tot_b + vocab)
        d = p_a - p_b
        chi2 = d * d / p_b
        return pa.table({
            "token": batch.column("token"),
            "n_a": pa.array(na, type=pa.int64()),
            "n_b": pa.array(nb, type=pa.int64()),
            "chi2": pa.array(chi2, type=pa.float64())})

    out = joined.map_batches(contrib, batch_format="pyarrow")
    if top is not None:
        out = out.sort(["chi2", "token"],
                       descending=[True, False]).limit(top)
    return out
