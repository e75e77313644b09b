"""Persisted IVF index (ops/annstore.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from swishray.ops.annstore import search_ivf_index, write_ivf_index


def _emb(n, dim=8, seed=0):
    rng = np.random.RandomState(seed)
    v = rng.randn(n, dim)
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in v])}))


def test_full_probe_equals_brute_force(ray_session, tmp_path):
    from swishray.ops.similarity import brute_force_topk
    ds = _emb(200).materialize()
    idx = str(tmp_path / "annidx")
    write_ivf_index(ds, idx, n_centroids=4)
    rows = sorted(ds.take_all(), key=lambda r: r["vec_id"])[:3]
    qids = [r["vec_id"] for r in rows]
    qv = np.asarray([r["embedding"] for r in rows])
    got = search_ivf_index(idx, qids, qv, k=5, n_probe=None) \
        .to_pandas().sort_values(["query_id", "score"],
                                 ascending=[True, False])
    want = brute_force_topk(ds, qids, qv, k=5).to_pandas() \
        .sort_values(["query_id", "score"], ascending=[True, False])
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    assert np.allclose(got["score"], want["score"])


def test_pruned_probe_subset_of_probed_buckets(ray_session, tmp_path):
    ds = _emb(300, seed=1).materialize()
    idx = str(tmp_path / "annidx")
    write_ivf_index(ds, idx, n_centroids=6)
    rows = ds.take_all()[:2]
    qids = [r["vec_id"] for r in rows]
    qv = np.asarray([r["embedding"] for r in rows])
    got = search_ivf_index(idx, qids, qv, k=5, n_probe=2).to_pandas()
    # a query's own vector lands in its nearest bucket -> always found
    for qid in qids:
        assert qid in got[got["query_id"] == qid]["vec_id"].tolist()


def test_append_against_frozen_centroids(ray_session, tmp_path):
    idx = str(tmp_path / "annidx")
    a = _emb(100, seed=2).materialize()
    write_ivf_index(a, idx, n_centroids=4)
    rng = np.random.RandomState(3)
    nv = rng.randn(1, 8)
    b = rd.from_arrow(pa.table({
        "vec_id": pa.array([999], pa.int64()),
        "embedding": pa.array([list(map(float, nv[0]))])}))
    write_ivf_index(b, idx)
    got = search_ivf_index(idx, [0], nv, k=1, n_probe=None) \
        .to_pandas()
    assert got["vec_id"].tolist() == [999]   # exact self-match
    with pytest.raises(ValueError, match="append"):
        write_ivf_index(b, idx, key="other")
