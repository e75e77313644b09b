"""Analytic (SQL OVER-clause) window functions for Ray Data.

Ray Data has no ``PARTITION BY ... ORDER BY`` operator; this module
supplies the family the reference's result-sorting surface implies
(libswish3 sorts results by property and pages them —
``src/libswish3/`` result sort + the swish_xapian ``--limit``
paging) generalised to the analytic functions a training-data
pipeline actually reaches for: row_number / rank / dense_rank,
lag / lead, running (prefix) sums, rolling row-window sums, and
ntile bucketing.

Two execution shapes, both streaming-safe:

* :func:`analytic` — ``groupby(partition).map_groups`` with a fully
  vectorized pandas/numpy kernel. Partitioning assumption: one
  partition key's rows fit in one group (the same contract as
  ``sessionize``). This is the right default: analytic partitions
  (a user, a domain, a day) are orders of magnitude smaller than
  the corpus.
* :func:`running_sum_salted` — the skew-proof escape hatch for the
  one function whose math permits it (prefix sums are associative):
  salt the partition by an order-contiguous period, prefix-sum
  within each salt, then prefix-sum the *per-salt totals* (a table
  orders of magnitude smaller) and add the offsets back with a
  hash join. A pathological key never concentrates in one task.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa


# ---------------------------------------------------------------------------
# spec helpers — tiny dataclass-free dicts so specs stay picklable


def row_number(out: str = "rn") -> dict:
    return {"kind": "row_number", "out": out}


def rank(out: str = "rnk") -> dict:
    return {"kind": "rank", "out": out}


def dense_rank(out: str = "drnk") -> dict:
    return {"kind": "dense_rank", "out": out}


def lag(col: str, n: int = 1, out: str | None = None) -> dict:
    return {"kind": "lag", "col": col, "n": n, "out": out or f"{col}_lag{n}"}


def lead(col: str, n: int = 1, out: str | None = None) -> dict:
    return {"kind": "lead", "col": col, "n": n,
            "out": out or f"{col}_lead{n}"}


def running_sum(col: str, out: str | None = None) -> dict:
    return {"kind": "running_sum", "col": col,
            "out": out or f"{col}_rsum"}


def rolling_sum(col: str, window: int, out: str | None = None) -> dict:
    """Row-based window: current row + ``window - 1`` preceding
    (SQL ``ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW``)."""
    return {"kind": "rolling_sum", "col": col, "n": window,
            "out": out or f"{col}_roll{window}"}


def ntile(k: int, out: str = "tile") -> dict:
    return {"kind": "ntile", "n": k, "out": out}


def running_max(col: str, out: str | None = None) -> dict:
    return {"kind": "running_max", "col": col,
            "out": out or f"{col}_rmax"}


def range_sum(col: str, ts: str, seconds: float,
              out: str | None = None) -> dict:
    """Time-RANGE window frame (SQL ``RANGE BETWEEN INTERVAL s
    PRECEDING AND CURRENT ROW``): sum of ``col`` over rows whose
    ``ts`` lies in ``[cur - seconds, cur]`` — including the current
    row's ts-peers, per the SQL RANGE peer rule."""
    return {"kind": "range_sum", "col": col, "ts": ts,
            "n": float(seconds), "out": out or f"{col}_range"}


# ---------------------------------------------------------------------------


def ewma(col: str, alpha: float, out: str | None = None) -> dict:
    """Exponentially-weighted moving average (adjust=False
    recurrence: s_i = α·x_i + (1−α)·s_{i−1}, s_0 = x_0) — the
    standard smoothing signal. Sequential by definition, so there is
    no SQL-window replay; covered by pytest vs the closed form."""
    return {"kind": "ewma", "col": col, "alpha": float(alpha),
            "out": out or f"{col}_ewma"}


def percent_rank(out: str = "prnk") -> dict:
    """(rank − 1) / (n − 1) as IEEE double; 0.0 for a 1-row
    partition — the SQL PERCENT_RANK contract, bit-replayable."""
    return {"kind": "percent_rank", "out": out}


def cume_dist(out: str = "cdist") -> dict:
    """#rows ≤ the current row's last ORDER-BY peer, over n — the
    SQL CUME_DIST peer rule (ties share the group-end count)."""
    return {"kind": "cume_dist", "out": out}


def first_value(col: str, out: str | None = None) -> dict:
    return {"kind": "first_value", "col": col,
            "out": out or f"{col}_first"}


def last_value(col: str, out: str | None = None) -> dict:
    """Whole-partition last value (SQL LAST_VALUE with ROWS BETWEEN
    UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING — the useful frame,
    not the default running one)."""
    return {"kind": "last_value", "col": col,
            "out": out or f"{col}_last"}


def _order_key_frame(order_by: Sequence) -> tuple:
    """Normalise order_by into (cols, ascending) lists."""
    cols, asc = [], []
    for o in order_by:
        if isinstance(o, str):
            cols.append(o)
            asc.append(True)
        else:
            cols.append(o[0])
            asc.append(bool(o[1]))
    return cols, asc


def _apply_specs(g: pd.DataFrame, order_cols: list, specs: list,
                 rank_cols: list | None = None) -> pd.DataFrame:
    n = len(g)
    arange1 = None

    def rn1() -> np.ndarray:
        nonlocal arange1
        if arange1 is None:
            arange1 = np.arange(1, n + 1, dtype=np.int64)
        return arange1

    # change flags over the RANK key (ties share rank), computed once;
    # rank_cols defaults to the full order key, but SQL commonly ranks
    # on a prefix of it while row_number consumes a unique suffix
    change = None

    def change_flags() -> np.ndarray:
        nonlocal change
        if change is None:
            if n == 0:
                change = np.zeros(0, dtype=bool)
            else:
                keys = g[rank_cols or order_cols]
                neq = keys.ne(keys.shift())
                # NaN != NaN in pandas .ne — treat equal-null as tie
                bothna = keys.isna() & keys.isna().shift(fill_value=False)
                change = (neq & ~bothna).any(axis=1).to_numpy()
                change[0] = True
        return change

    for s in specs:
        kind, out = s["kind"], s["out"]
        if kind == "row_number":
            g[out] = rn1()
        elif kind == "rank":
            r = np.where(change_flags(), rn1(), 0)
            g[out] = np.maximum.accumulate(r) if n else r
        elif kind == "dense_rank":
            g[out] = change_flags().cumsum().astype(np.int64)
        elif kind == "ewma":
            g[out] = g[s["col"]].ewm(alpha=s["alpha"],
                                     adjust=False).mean()
        elif kind == "percent_rank":
            if n <= 1:
                g[out] = np.zeros(n, dtype=np.float64)
            else:
                r = np.where(change_flags(), rn1(), 0)
                r = np.maximum.accumulate(r)
                g[out] = (r - 1).astype(np.float64) / np.float64(n - 1)
        elif kind == "cume_dist":
            grp = change_flags().cumsum()
            ends = pd.Series(rn1()).groupby(grp).transform("max") \
                .to_numpy()
            g[out] = ends.astype(np.float64) / np.float64(n)
        elif kind == "first_value":
            g[out] = g[s["col"]].iloc[0] if n else g[s["col"]]
        elif kind == "last_value":
            g[out] = g[s["col"]].iloc[-1] if n else g[s["col"]]
        elif kind in ("lag", "lead"):
            src = g[s["col"]]
            if pd.api.types.is_integer_dtype(src.dtype):
                # keep ints null-able instead of NaN-floating
                src = src.astype("Int64")
            g[out] = src.shift(s["n"] if kind == "lag" else -s["n"])
        elif kind == "running_sum":
            g[out] = g[s["col"]].cumsum()
        elif kind == "running_max":
            g[out] = g[s["col"]].cummax()
        elif kind == "range_sum":
            # requires the sort to lead with the ts column
            ts = g[s["ts"]].to_numpy()
            tsi = ts.astype("datetime64[us]").astype(np.int64) \
                if ts.dtype.kind == "M" else ts.astype(np.int64)
            span = int(round(s["n"] * 1_000_000)) \
                if ts.dtype.kind == "M" else int(s["n"])
            v = g[s["col"]].to_numpy()
            cum = np.concatenate(([0], np.cumsum(v)))
            # RANGE frame: [cur - span, cur] INCLUDING ts-peers of
            # the current row (the SQL peer rule)
            hi = np.searchsorted(tsi, tsi, "right")
            lo = np.searchsorted(tsi, tsi - span, "left")
            res = cum[hi] - cum[lo]
            if pd.api.types.is_integer_dtype(g[s["col"]].dtype):
                res = res.astype(np.int64)
            g[out] = res
        elif kind == "rolling_sum":
            v = g[s["col"]].rolling(s["n"], min_periods=1).sum()
            if pd.api.types.is_integer_dtype(g[s["col"]].dtype):
                v = v.astype(np.int64)
            g[out] = v
        elif kind == "ntile":
            # SQL NTILE(k): first (n % k) tiles get ceil(n/k) rows
            k = s["n"]
            base, extra = divmod(n, k)
            sizes = np.full(min(k, n) if base == 0 else k, base,
                            dtype=np.int64)
            sizes[:extra] += 1
            g[out] = np.repeat(
                np.arange(1, len(sizes) + 1, dtype=np.int64), sizes)[:n]
        else:  # pragma: no cover
            raise ValueError(f"unknown analytic spec kind: {kind}")
    return g


def analytic(ds: Any, partition_by: str | list, order_by: Sequence,
             specs: list, rank_cols: list | None = None) -> Any:
    """Evaluate analytic window functions per partition.

    ``order_by``: list of column names or ``(col, ascending)`` pairs.
    ``specs``: list built from the helpers above. Output = input
    columns + one column per spec, rows unordered across partitions
    (order within a partition is not materialised — downstream sorts
    decide presentation order, as everywhere else in the engine).

    Ties in the order key get equal rank / dense_rank; row_number
    breaks them arbitrarily unless the order key is unique — pass a
    unique tie-breaker column for deterministic output (the SQL
    contract is identical).
    """
    order_cols, asc = _order_key_frame(order_by)

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, ascending=asc, kind="mergesort"
                          ).reset_index(drop=True)
        return _apply_specs(g, order_cols, specs, rank_cols)

    return ds.groupby(partition_by).map_groups(fn, batch_format="pandas")


# ---------------------------------------------------------------------------
# skew-proof rank


def rank_salted(ds: Any, partition_by: str, col: str,
                descending: bool = True,
                out: str = "rnk", dense_out: str | None = None) -> Any:
    """RANK (and optionally DENSE_RANK) per partition WITHOUT the
    one-partition-per-task assumption: rank = 1 + count of better
    values, which falls out of the (partition, value, count)
    histogram — the same skew-proof census shape as
    ``mode_per_group``/``discrete_quantiles_per_group``. A partition
    with a billion rows ships its distinct-value census through the
    rank computation, never its rows; the rows themselves ride one
    (partition, value)-keyed hash join to pick up their rank.

    ROW_NUMBER has no such form (it is order-dependent within ties);
    use :func:`analytic` with a unique tie-break for that.

    Key/value contract: ``partition_by`` and ``col`` ride a string
    composite key, exact for integer and string columns (floats
    would round-trip through repr — rank floats by a fixed-point
    integer projection instead)."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .joins import _schema_or_materialize, hash_join

    # one schema probe that never pays an all-to-all lineage twice
    # (the joins.py _schema_or_materialize contract)
    ds, in_schema = _schema_or_materialize(ds)
    if in_schema is None:  # all-empty input: nothing to rank
        return ds

    def ks(batch: pa.Table) -> pa.Array:
        return pc.binary_join_element_wise(
            pc.cast(batch.column(partition_by), pa.string()),
            pc.cast(batch.column(col), pa.string()), "\x00")

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"__ks": ks(batch).to_pandas()})
        vc = df["__ks"].value_counts()
        return pa.table({"__ks": pa.array(vc.index, pa.string()),
                         "__n": pa.array(vc.to_numpy(), pa.int64())})

    hist = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("__ks").aggregate(Sum("__n", alias_name="n"))

    coltype = dict(zip(in_schema.names, in_schema.types))[col]

    def split_ks(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"__g": pa.array([], pa.string()),
                             "__v": pa.array([], coltype),
                             "__ks": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        parts = pc.split_pattern(t.column("__ks"), "\x00")
        return pa.table({
            "__g": pc.list_element(parts, 0),
            "__v": pc.cast(pc.list_element(parts, 1), coltype),
            "__ks": t.column("__ks"),
            "n": pc.cast(t.column("n"), pa.int64())})

    hist = hist.map_batches(split_ks, batch_format="pyarrow")

    def ranks(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("__v", ascending=not descending,
                          kind="mergesort").reset_index(drop=True)
        cum = g["n"].cumsum()
        g[out] = (cum - g["n"] + 1).astype("int64")
        cols = ["__ks", out]
        if dense_out:
            g[dense_out] = pd.RangeIndex(1, len(g) + 1).astype("int64")
            cols.append(dense_out)
        return g[cols]

    # per-partition group over the CENSUS (rows = distinct values)
    rk = hist.groupby("__g").map_groups(ranks, batch_format="pandas")

    def add_ks(batch: pa.Table) -> pa.Table:
        return batch.append_column("__ks", ks(batch))

    rows = ds.map_batches(add_ks, batch_format="pyarrow")

    # an all-empty input loses its schema through map_batches (the
    # Ray 2.49 empty-side trap) and hash_join needs one; the guard's
    # null-key sentinel row never matches the inner join
    from .joins import schema_guard
    rows_schema = pa.schema(
        list(zip(in_schema.names, in_schema.types))
        + [("__ks", pa.string())])
    rk_fields = [("__ks", pa.string()), (out, pa.int64())]
    if dense_out:
        rk_fields.append((dense_out, pa.int64()))
    rows = schema_guard(rows, rows_schema)
    rk = schema_guard(rk, pa.schema(rk_fields))
    joined = hash_join(rows, rk, key="__ks", how="inner")

    def finish(t: pa.Table) -> pa.Table:
        names = {out: f"{out}_r"}
        if dense_out:
            names[dense_out] = f"{dense_out}_r"
        cols = {c: t.column(c) for c in t.column_names
                if c not in ("__ks", *names.values())}
        for want, got in names.items():
            cols[want] = pc.cast(t.column(got), pa.int64())
        return pa.table(cols)

    return joined.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# skew-proof prefix sum


def running_sum_salted(ds: Any, key: str, ts_col: str, val_col: str,
                       out: str = "rsum",
                       salt_unit: str = "day",
                       tiebreak: str | None = None) -> Any:
    """Prefix sum per ``key`` ordered by ``(ts_col, tiebreak)``,
    skew-proof: a key with a pathological row count never lands in
    one task.

    Phase 1 groups by ``(key, salt)`` where salt =
    ``floor_temporal(ts, salt_unit)`` — order-contiguous, so the
    within-salt prefix sums are exact segments of the global one.
    Phase 2 groups the per-salt TOTALS by key (rows = salts per key,
    not events per key) and exclusive-prefix-sums them into offsets.
    Phase 3 joins the offsets back on ``(key, salt)`` and adds.
    Result is identical to the unsalted ``analytic(...,
    running_sum(...))`` (t:test_running_sum_salted_equal)."""
    import pyarrow.compute as pc
    from swishray.ops.joins import _schema_or_materialize, hash_join

    # one schema probe that never pays an all-to-all lineage twice
    ds, in_schema = _schema_or_materialize(ds)
    if in_schema is None:  # all-empty input: nothing to sum
        return ds

    def add_salt(batch: pa.Table) -> pa.Table:
        salt = pc.cast(pc.floor_temporal(batch.column(ts_col),
                                         unit=salt_unit), pa.int64())
        ks = pc.binary_join_element_wise(
            pc.cast(batch.column(key), pa.string()),
            pc.cast(salt, pa.string()), "\x00")
        return batch.append_column("__salt", salt) \
                    .append_column("__ks", ks)

    order_cols = [ts_col] + ([tiebreak] if tiebreak else [])

    def within(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort"
                          ).reset_index(drop=True)
        g[out] = g[val_col].cumsum()
        g["__salt_total"] = g[val_col].sum()
        return g

    pieces = ds.map_batches(add_salt, batch_format="pyarrow") \
        .groupby("__ks").map_groups(within, batch_format="pandas")
    # pieces is a DIAMOND dependency (feeds both the totals exchange
    # and the join's left side); without a materialize the phase-1
    # all-to-all executes TWICE — Ray Data has no common-subexpression
    # reuse across consumers. Blocks are object-store-resident and
    # spillable, so this holds at corpus scale.
    pieces = pieces.materialize()

    # per-(key, salt) totals ride a second, far smaller exchange
    # (rows = distinct (key, salt) pairs, not events)
    totals = pieces.groupby("__ks").max("__salt_total")

    def tot_shape(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"__key": pa.array([], pa.string()),
                             "__salt": pa.array([], pa.int64()),
                             "__ks": pa.array([], pa.string()),
                             "__tot": pa.array([], pa.float64())})
        parts = pc.split_pattern(t.column("__ks"), "\x00")
        return pa.table({
            "__key": pc.list_element(parts, 0),
            "__salt": pc.cast(pc.list_element(parts, 1), pa.int64()),
            "__ks": t.column("__ks"),
            "__tot": pc.cast(t.column("max(__salt_total)"),
                             pa.float64())})

    totals = totals.map_batches(tot_shape, batch_format="pyarrow")

    def offsets(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("__salt", kind="mergesort"
                          ).reset_index(drop=True)
        g["__off"] = g["__tot"].cumsum() - g["__tot"]
        return g[["__ks", "__off"]]

    off = totals.groupby("__key").map_groups(offsets,
                                             batch_format="pandas")

    # empty-input schema loss guard (same contract as rank_salted)
    from .joins import schema_guard
    in_fields = list(zip(in_schema.names, in_schema.types))
    left_schema = pa.schema(
        in_fields + [("__ks", pa.string()),
                     (out, dict(in_fields)[val_col])])
    off_schema = pa.schema([("__ks", pa.string()),
                            ("__off", pa.float64())])
    left = schema_guard(pieces.drop_columns(["__salt_total", "__salt"]),
                        left_schema)
    joined = hash_join(left, schema_guard(off, off_schema),
                       key="__ks", how="inner")

    def finish(t: pa.Table) -> pa.Table:
        rsum = pc.add(t.column(out), pc.cast(t.column("__off_r"),
                                             t.column(out).type))
        t = t.set_column(t.schema.get_field_index(out), out, rsum)
        return t.drop_columns(["__ks", "__off_r"])

    return joined.map_batches(finish, batch_format="pyarrow")
