"""mad_outliers and semi_join_large (ops/robust.py)."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data
    return ray.data


def test_mad_outliers_matches_numpy(rd):
    from swishray.ops.robust import mad_outliers

    rng = np.random.default_rng(7)
    x = np.concatenate([rng.normal(100.0, 5.0, 4000),
                        rng.normal(100.0, 5.0, 50) + 400.0])
    ds = rd.from_arrow(pa.table({"i": np.arange(len(x)), "x": x}))

    # exact quantile_disc median/MAD (index ceil(q*n)-1 of the sorted
    # multiset), same rule continuous_quantiles implements
    def qdisc(v):
        v = np.sort(v)
        import math
        return v[max(0, math.ceil(0.5 * len(v)) - 1)]

    med = qdisc(x)
    mad = qdisc(np.abs(x - med))
    exp_in = np.sort(np.where(np.abs(x - med) <= 3.0 * mad)[0])
    exp_out = np.sort(np.where(np.abs(x - med) > 3.0 * mad)[0])

    got_in = np.sort(mad_outliers(ds, "x", k=3.0).to_pandas()["i"]
                     .to_numpy())
    got_out = np.sort(
        mad_outliers(ds, "x", k=3.0, keep="outliers").to_pandas()["i"]
        .to_numpy())
    assert np.array_equal(got_in, exp_in)
    assert np.array_equal(got_out, exp_out)
    assert len(exp_out) >= 50  # the planted tail is actually trimmed


def test_mad_outliers_point_mass(rd):
    # a constant column has MAD 0: everything is an inlier at any k
    from swishray.ops.robust import mad_outliers
    ds = rd.from_arrow(pa.table({"x": [5.0] * 100}))
    assert mad_outliers(ds, "x", k=1.0).count() == 100


def test_semi_join_large_no_duplication(rd):
    from swishray.ops.robust import semi_join_large

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "v": ["a", "b", "c", "d", "e"]}))
    # right has duplicate keys — left rows must still appear once
    right = rd.from_arrow(pa.table({
        "k": pa.array([2, 2, 2, 4, 9], pa.int64()),
        "w": [10, 11, 12, 13, 14]}))

    out = semi_join_large(left, right, "k").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert list(out.columns) == ["k", "v"]
    assert out["k"].tolist() == [2, 4]
    assert out["v"].tolist() == ["b", "d"]


def test_semi_join_large_right_key_rename(rd):
    from swishray.ops.robust import semi_join_large

    left = rd.from_arrow(pa.table({"k": [1, 2, 3], "v": [1, 2, 3]}))
    right = rd.from_arrow(pa.table({"rk": [3, 1, 3]}))
    out = semi_join_large(left, right, "k", right_key="rk") \
        .to_pandas().sort_values("k")
    assert out["k"].tolist() == [1, 3]


def test_mad_outliers_empty_and_allnull(rd):
    from swishray.ops.robust import mad_outliers
    empty = rd.from_arrow(pa.table({"x": pa.array([], pa.float64())}))
    assert mad_outliers(empty, "x").count() == 0
    assert mad_outliers(empty, "x", keep="outliers").count() == 0
    nulls = rd.from_arrow(pa.table(
        {"x": pa.array([None, None], pa.float64())}))
    assert mad_outliers(nulls, "x").count() == 2
    assert mad_outliers(nulls, "x", keep="outliers").count() == 0


def test_semi_join_large_empty_right(rd):
    from swishray.ops.robust import semi_join_large
    left = rd.from_arrow(pa.table({"k": [1, 2], "v": [1, 2]}))
    right = rd.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    assert semi_join_large(left, right, "k").count() == 0


def test_semi_join_large_string_keys(rd):
    # key-type agnosticism (the r2 ADVICE int64-hardcode class)
    from swishray.ops.robust import semi_join_large
    left = rd.from_arrow(pa.table({"k": ["a", "b", "c"],
                                   "v": [1, 2, 3]}))
    right = rd.from_arrow(pa.table({"k": ["c", "a", "c"]}))
    out = semi_join_large(left, right, "k").to_pandas().sort_values("k")
    assert out["k"].tolist() == ["a", "c"]


def test_mad_outliers_mixed_nulls_one_contract(rd):
    """Null rows are never outliers: kept by keep='inliers', dropped
    by keep='outliers' — and the two modes partition the non-null
    rows exactly (ADVICE r3 asymmetric-null fix)."""
    from swishray.ops.robust import mad_outliers
    x = [10.0, 10.0, 10.0, 10.0, None, 500.0, None]
    ds = rd.from_arrow(pa.table(
        {"i": list(range(len(x))), "x": pa.array(x, pa.float64())}))
    inl = mad_outliers(ds, "x").to_pandas()
    out = mad_outliers(ds, "x", keep="outliers").to_pandas()
    assert sorted(inl["i"]) == [0, 1, 2, 3, 4, 6]  # nulls kept
    assert sorted(out["i"]) == [5]                 # nulls excluded
    assert len(inl) + len(out) == len(x)
