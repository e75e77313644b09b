"""Distributed second-moment stats (ops/stats.py): exact integer
partial sums must make the float outputs bit-identical to a local
single-pass evaluation of the same IEEE-double expression."""

import numpy as np
import pyarrow as pa
import pytest


def _expect_moments(groups, xs):
    import pandas as pd
    df = pd.DataFrame({"g": groups, "x": xs})
    rows = []
    for g, s in df.groupby("g"):
        v = s["x"].to_numpy(np.int64)
        n = float(len(v))
        sx = float(v.sum())
        sx2 = float((v * v).sum())
        mean = sx / n
        var = (n * sx2 - sx * sx) / (n * (n - 1.0)) if n > 1 else np.nan
        rows.append((g, len(v), int(v.sum()), mean, var,
                     np.sqrt(var)))
    return sorted(rows)


def test_group_moments_bit_exact(ray_session):
    import ray.data as rd
    from swishray.ops.stats import group_moments

    rng = np.random.default_rng(7)
    g = rng.integers(0, 5, 4000)
    x = rng.integers(0, 10000, 4000)
    t = pa.table({"g": pa.array([f"g{i}" for i in g]),
                  "x": pa.array(x, type=pa.int64())})
    out = group_moments(rd.from_arrow(t).repartition(7), "g", "x") \
        .to_pandas().sort_values("g").reset_index(drop=True)
    want = _expect_moments([f"g{i}" for i in g], x)
    got = list(out.itertuples(index=False, name=None))
    assert len(got) == len(want)
    for (gg, n, sx, mean, var, std), (wg, wn, wsx, wm, wv, ws) in zip(
            sorted(got), want):
        assert (gg, n, sx) == (wg, wn, wsx)
        # bit-identical, not just close
        assert np.float64(mean).view(np.uint64) == \
            np.float64(wm).view(np.uint64)
        assert np.float64(var).view(np.uint64) == \
            np.float64(wv).view(np.uint64)
        assert np.float64(std).view(np.uint64) == \
            np.float64(ws).view(np.uint64)


def test_group_moments_single_row_group(ray_session):
    import ray.data as rd
    from swishray.ops.stats import group_moments

    t = pa.table({"g": ["a"], "x": pa.array([42], type=pa.int64())})
    out = group_moments(rd.from_arrow(t), "g", "x").to_pandas()
    assert out.n.iloc[0] == 1 and out.sum_x.iloc[0] == 42
    assert np.isnan(out.var_x.iloc[0])


def test_group_corr_matches_numpy(ray_session):
    import ray.data as rd
    from swishray.ops.stats import group_corr

    rng = np.random.default_rng(11)
    g = np.repeat(["a", "b"], 500)
    x = rng.integers(0, 100, 1000)
    y = x + rng.integers(-10, 10, 1000)  # strongly correlated
    t = pa.table({"g": pa.array(g), "x": pa.array(x, type=pa.int64()),
                  "y": pa.array(y, type=pa.int64())})
    out = group_corr(rd.from_arrow(t).repartition(5), "g", "x", "y") \
        .to_pandas().sort_values("g").reset_index(drop=True)
    for i, gg in enumerate(["a", "b"]):
        m = g == gg
        want = np.corrcoef(x[m].astype(float), y[m].astype(float))[0, 1]
        assert out.g.iloc[i] == gg
        assert abs(out.corr_xy.iloc[i] - want) < 1e-12
        assert out.corr_xy.iloc[i] > 0.9
