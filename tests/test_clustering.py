"""Distributed k-means + SemDeDup: exactness on integer vectors
(float sums exact -> bit-identical to a local Lloyd replay),
empty-cluster survival, and the deterministic keep rule."""

import numpy as np
import pyarrow as pa


def _local_lloyd(m, cent, iters, normalize=True):
    cent = cent.copy()
    for _ in range(iters):
        if normalize:
            mm = m / np.clip(np.linalg.norm(m, axis=1, keepdims=True),
                             1e-300, None)
            a = np.argmax(mm @ cent.T, axis=1)
        else:
            mm = m
            d = (mm * mm).sum(1)[:, None] - 2.0 * (mm @ cent.T) \
                + (cent * cent).sum(1)[None, :]
            a = np.argmin(d, axis=1)
        new = cent.copy()
        for c in range(cent.shape[0]):
            mask = a == c
            if mask.any():
                v = mm[mask].sum(axis=0) / mask.sum()
                if normalize:
                    nv = np.linalg.norm(v)
                    v = v / nv if nv > 0 else v
                new[c] = v
        cent = new
    return cent


def _vec_table(m, ids=None):
    ids = np.arange(len(m), dtype=np.int64) if ids is None else ids
    return pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([row.tolist() for row in m],
                              pa.list_(pa.float64()))})


def test_kmeans_matches_local_lloyd_exactly(ray_session):
    """Euclidean mode on integer-valued vectors: every partial sum
    is exact, so the distributed fold equals the local replay
    bit-for-bit at ANY partitioning."""
    import ray.data as rd
    from swishray.ops.clustering import kmeans, _bootstrap

    rng = np.random.default_rng(2)
    m = rng.integers(-4, 5, size=(300, 8)).astype(np.float64)
    for parts in (3, 11):
        ds = rd.from_arrow(_vec_table(m)).repartition(parts)
        got = kmeans(ds, k=5, iters=6, seed=3, sample_limit=300,
                     normalize=False)
        boot = _bootstrap(ds, 5, 3, "embedding", 300, False)
        want = _local_lloyd(m, boot, 6, normalize=False)
        np.testing.assert_array_equal(got, want)


def test_kmeans_spherical_close_and_deterministic(ray_session):
    """Cosine mode: unit vectors make sums inexact, so the local
    replay matches to float tolerance; back-to-back distributed runs
    on the same layout are bit-identical."""
    import ray.data as rd
    from swishray.ops.clustering import kmeans, _bootstrap

    rng = np.random.default_rng(9)
    m = rng.normal(size=(200, 8))
    ds = rd.from_arrow(_vec_table(m)).repartition(5)
    a = kmeans(ds, k=4, iters=5, seed=1, sample_limit=200)
    b = kmeans(ds, k=4, iters=5, seed=1, sample_limit=200)
    np.testing.assert_array_equal(a, b)
    boot = _bootstrap(ds, 4, 1, "embedding", 200, True)
    want = _local_lloyd(m, boot, 5, normalize=True)
    np.testing.assert_allclose(a, want, rtol=1e-9, atol=1e-12)


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    import ray.data as rd
    from swishray.ops.clustering import kmeans

    # two tight groups, k=3: one centroid never wins a point and
    # must survive untouched (no NaNs)
    m = np.vstack([np.tile([10.0, 0.0], (20, 1)),
                   np.tile([0.0, 10.0], (20, 1))])
    ds = rd.from_arrow(_vec_table(m)).repartition(3)
    cent = kmeans(ds, k=3, iters=4, seed=0)
    assert not np.isnan(cent).any()
    assert cent.shape == (3, 2)


def test_assign_clusters_roundtrip(ray_session):
    import ray.data as rd
    from swishray.ops.clustering import kmeans, assign_clusters

    rng = np.random.default_rng(4)
    m = rng.integers(-3, 4, size=(120, 6)).astype(np.float64)
    ds = rd.from_arrow(_vec_table(m)).repartition(4)
    cent = kmeans(ds, k=4, iters=3, seed=1)
    out = assign_clusters(ds, cent).to_pandas() \
        .sort_values("vec_id")
    mm = m / np.clip(np.linalg.norm(m, axis=1, keepdims=True),
                     1e-300, None)
    want = np.argmax(mm @ cent.T, axis=1)
    assert list(out.cluster) == list(want)


def test_semdedup_keeps_lowest_key_per_dup_set(ray_session):
    import ray.data as rd
    from swishray.ops.clustering import semdedup

    rng = np.random.default_rng(6)
    base = rng.normal(size=(10, 16))
    # 3 near-identical copies of each base vector (tiny jitter keeps
    # cosine > 0.999), ids interleaved so key order != row order
    rows, ids = [], []
    vid = 0
    for copy in range(3):
        for b in base:
            rows.append(b + rng.normal(scale=1e-4, size=16))
            ids.append(vid)
            vid += 1
    m = np.asarray(rows)
    ds = rd.from_arrow(_vec_table(
        m, np.asarray(ids, dtype=np.int64))).repartition(5)

    out = semdedup(ds, k=4, threshold=0.99, iters=3, seed=0) \
        .to_pandas()
    assert len(out) == 30
    kept = set(out[out.kept].vec_id)
    # every base vector's dup set survives as exactly one member,
    # and it is the lowest vec_id of its set *within its cluster*
    assert len(kept) == 10
    assert kept == set(range(10))  # first copies have ids 0..9


def test_semdedup_max_cluster_guard(ray_session):
    import pytest
    import ray.data as rd
    from swishray.ops.clustering import semdedup

    m = np.tile([1.0, 0.0], (50, 1))
    ds = rd.from_arrow(_vec_table(m))
    with pytest.raises(Exception, match="max_cluster"):
        semdedup(ds, k=1, iters=1, max_cluster=10).to_pandas()
