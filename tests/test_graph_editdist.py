"""Triangle counting (ops/components.py triangle_count) and the exact
Levenshtein self-join (ops/editdist.py) vs independent brute-force
references."""

import numpy as np
import pyarrow as pa


def _full_lev(a: str, b: str) -> int:
    """Textbook full-matrix Levenshtein — the independent reference
    for the banded lev_within."""
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            c = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + c)
        prev = cur
    return prev[lb]


def test_lev_within_matches_full_dp():
    from swishray.ops.editdist import lev_within

    rng = np.random.default_rng(11)
    alphabet = "abcd"
    words = ["".join(alphabet[i] for i in rng.integers(0, 4, n))
             for n in rng.integers(0, 9, 400)]
    for k in (1, 2, 3):
        for i in range(0, 400, 2):
            a, b = words[i], words[i + 1]
            d = _full_lev(a, b)
            got = lev_within(a, b, k)
            assert got == (d if d <= k else None), (a, b, k, d, got)


def test_deletion_variants():
    from swishray.ops.editdist import deletion_variants

    assert deletion_variants("ab", 1) == ["a", "ab", "b"]
    assert deletion_variants("aab", 1) == ["aab", "ab", "aa"][::-1] \
        or set(deletion_variants("aab", 1)) == {"aab", "ab", "aa"}
    assert "" in deletion_variants("ab", 2)
    assert deletion_variants("", 2) == [""]


def test_editdist_join_complete_vs_bruteforce(ray_session):
    import ray.data as rd
    from swishray.ops.editdist import editdist_join

    rng = np.random.default_rng(5)
    alphabet = "xyz"
    words = list({"".join(alphabet[i]
                          for i in rng.integers(0, 3, n))
                  for n in rng.integers(1, 7, 300)})
    # duplicate rows on purpose: the op must dedupe values first
    rows = words + words[:10]
    ds = rd.from_arrow(pa.table({"s": pa.array(rows)})).repartition(4)
    for k in (1, 2):
        got = editdist_join(ds, "s", k=k).to_pandas()
        got_set = {(r.a, r.b, r.dist)
                   for r in got.itertuples(index=False)}
        want = set()
        for i in range(len(words)):
            for j in range(i + 1, len(words)):
                a, b = sorted((words[i], words[j]))
                d = _full_lev(a, b)
                if d <= k:
                    want.add((a, b, d))
        assert got_set == want, (k, len(got_set), len(want))


def test_triangle_count_known_graph(ray_session):
    import ray.data as rd
    from swishray.ops.components import triangle_count

    # K4 (4 triangles) plus a pendant edge, duplicate edges,
    # a self-loop, and reversed duplicates
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
             (3, 4), (1, 0), (2, 2), (0, 1)]
    t = pa.table({"a": pa.array([e[0] for e in edges],
                                type=pa.int64()),
                  "b": pa.array([e[1] for e in edges],
                                type=pa.int64())})
    out = triangle_count(rd.from_arrow(t).repartition(3)).to_pandas()
    assert list(out.columns) == ["triangles"]
    assert out.iloc[0, 0] == 4


def test_triangle_count_random_vs_trace(ray_session):
    import ray.data as rd
    from swishray.ops.components import triangle_count

    rng = np.random.default_rng(9)
    n = 60
    a = rng.integers(0, n, 500)
    b = rng.integers(0, n, 500)
    adj = np.zeros((n, n), dtype=np.int64)
    keep = a != b
    adj[a[keep], b[keep]] = 1
    adj = np.maximum(adj, adj.T)
    want = int(np.trace(adj @ adj @ adj) // 6)
    t = pa.table({"a": pa.array(a, type=pa.int64()),
                  "b": pa.array(b, type=pa.int64())})
    out = triangle_count(rd.from_arrow(t).repartition(5)).to_pandas()
    assert out.iloc[0, 0] == want
    # force the distributed wedge path past the dense gate
    out2 = triangle_count(rd.from_arrow(t).repartition(5),
                          dense_max_edges=0).to_pandas()
    assert out2.iloc[0, 0] == want


def test_triangle_count_no_triangles(ray_session):
    import ray.data as rd
    from swishray.ops.components import triangle_count

    # path graph: zero triangles
    t = pa.table({"a": pa.array([0, 1, 2], type=pa.int64()),
                  "b": pa.array([1, 2, 3], type=pa.int64())})
    out = triangle_count(rd.from_arrow(t)).to_pandas()
    assert out.iloc[0, 0] == 0
