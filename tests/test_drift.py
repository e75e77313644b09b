"""drift_census (ops/drift.py) vs a hand-computed reference."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data
    return ray.data


def _expected(texts, flags):
    ca, cb = Counter(), Counter()
    for t, a in zip(texts, flags):
        (ca if a else cb).update(t.split())
    vocab = len(set(ca) | set(cb))
    ta, tb = sum(ca.values()), sum(cb.values())
    rows = {}
    for tok in set(ca) | set(cb):
        na, nb = ca.get(tok, 0), cb.get(tok, 0)
        p_a = (na + 1.0) / float(ta + vocab)
        p_b = (nb + 1.0) / float(tb + vocab)
        d = p_a - p_b
        rows[tok] = (na, nb, d * d / p_b)
    return rows


def test_drift_census_exact(rd):
    from swishray.ops.drift import drift_census

    texts = ["the cat sat", "the dog ran", "cat cat cat",
             "the the the", "dog dog", "bird flew home",
             "cat and dog", "home sweet home"]
    flags = [True, True, True, True, False, False, False, False]
    ds = rd.from_arrow(pa.table({
        "text": texts, "grp": pa.array(flags)}))

    out = drift_census(
        ds, lambda b: b.column("grp").to_numpy(zero_copy_only=False)
    ).to_pandas()
    exp = _expected(texts, flags)
    assert len(out) == len(exp)
    for _, r in out.iterrows():
        na, nb, chi2 = exp[r["token"]]
        assert (r["n_a"], r["n_b"]) == (na, nb)
        assert r["chi2"] == chi2  # bit-exact, same IEEE expression


def test_drift_census_top_cut_deterministic(rd):
    from swishray.ops.drift import drift_census

    texts = ["aa bb cc dd", "aa aa aa zz"] * 3 + ["bb cc", "dd zz"]
    flags = [i % 2 == 0 for i in range(len(texts))]
    ds = rd.from_arrow(pa.table({"text": texts,
                                 "grp": pa.array(flags)}))
    out = drift_census(
        ds, lambda b: b.column("grp").to_numpy(zero_copy_only=False),
        top=3).to_pandas()
    assert len(out) == 3
    # sorted chi2 desc, token asc
    chis = out["chi2"].tolist()
    assert chis == sorted(chis, reverse=True)


def test_drift_census_one_empty_slice(rd):
    from swishray.ops.drift import drift_census
    ds = rd.from_arrow(pa.table({"text": ["x y", "y z"],
                                 "grp": [True, True]}))
    out = drift_census(
        ds, lambda b: b.column("grp").to_numpy(zero_copy_only=False)
    ).to_pandas()
    # slice B is empty: every token still gets a finite contribution
    assert len(out) == 3
    assert np.isfinite(out["chi2"]).all()
    assert (out["n_b"] == 0).all()
