"""Driver-coordinated dense fast path for the iterative graph ops
(PageRank power iteration, connected components by min-label
propagation).

Both ops are fixpoint loops.  The fully-distributed join formulation
(links.pagerank / components.connected_components) pays 2-3
bucketed-shuffle joins per round — the right shape only when the
VERTEX VECTOR itself is too big for any one process.  A web graph's
vertex set is orders of magnitude smaller than its edge set (and than
the corpus the edges were mined from): 4M nodes is a 32 MB float64
vector.  In that regime the classic Pregel-lite layout wins:

  * edge shards live PINNED in actors as numpy index arrays, built
    once from the object-store Arrow blocks (``to_arrow_refs`` —
    no driver copy of the edges, ever);
  * per-round state (the rank / label vector) is broadcast via
    ``ray.put`` and combined on the driver (sum for pagerank,
    elementwise min for components);
  * a round is one actor method call per shard — no shuffle, no
    actor-pool churn, no per-round Dataset lineage.

Node keys are collected ONCE, sorted, and index-encoded, so all loop
arithmetic is int64/float64 vector ops; sorting makes index order ==
key order, so "min reachable node id" is preserved for components.

Gates (both callers): ``n_edges <= dense_max_edges`` (bounds
per-shard pinned memory, ~16 B/edge) checked before any pull, then
``n_nodes <= dense_max_nodes`` (bounds the O(n) driver/broadcast
vectors, 8 B/node) checked after a distributed-unique of the
endpoints.  Past either gate the callers run their join formulation,
which has no such ceiling.

Reference anchor: the reference engine has no graph ops (its dedup
story stops at upsert-by-url, swish_xapian.cpp:563-601); these exist
for the training-data mission (near-dup clustering, crawl-frontier
prioritisation).
"""
from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DENSE_MAX_NODES = 4_000_000
DENSE_MAX_EDGES = 100_000_000


class _EdgeShard:
    """Pinned edge shard: endpoint columns index-encoded against the
    broadcast sorted key array.  Methods are one vectorized pass each;
    partial vectors returned to the driver are O(n_nodes)."""

    def __init__(self, tables: list, a: str, b: str, w: str | None):
        import ray
        tabs = [t for t in ray.get(list(tables)) if t.num_rows]
        if tabs:
            t = pa.concat_tables(tabs)
            self._a = t.column(a).combine_chunks()
            self._b = t.column(b).combine_chunks()
            self._w = (t.column(w).combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.float64)
                if w is not None else None)
        else:
            self._a = self._b = None
            self._w = None
        self.ai = self.bi = None

    def endpoints(self) -> pa.Array:
        if self._a is None:
            return pa.array([], pa.int64())
        # a/b share one type by the callers' contract
        return pc.unique(pa.chunked_array([self._a, self._b]))

    def index(self, keys: pa.Array) -> None:
        if self._a is None:
            self.ai = self.bi = np.empty(0, np.int64)
            return
        self.ai = pc.index_in(self._a, value_set=keys).to_numpy(
            zero_copy_only=False).astype(np.int64)
        self.bi = pc.index_in(self._b, value_set=keys).to_numpy(
            zero_copy_only=False).astype(np.int64)
        self._a = self._b = None  # drop the key-typed columns

    # ---- pagerank ----
    def outdeg(self, n: int) -> np.ndarray:
        return np.bincount(self.ai, weights=self._w, minlength=n)

    def set_share(self, outdeg: np.ndarray) -> None:
        od = outdeg[self.ai]
        w = self._w if self._w is not None else 1.0
        with np.errstate(divide="ignore", invalid="ignore"):
            self.share = np.where(od > 0, w / np.where(od > 0, od, 1.0),
                                  0.0)

    def contrib(self, rank: np.ndarray) -> np.ndarray:
        return np.bincount(self.bi, weights=rank[self.ai] * self.share,
                           minlength=rank.shape[0])

    # ---- components ----
    def min_label(self, label: np.ndarray) -> np.ndarray:
        out = np.full(label.shape[0], np.iinfo(np.int64).max, np.int64)
        np.minimum.at(out, self.ai, label[self.bi])
        np.minimum.at(out, self.bi, label[self.ai])
        return out


def _spawn_shards(edges: Any, a: str, b: str, w: str | None):
    """Edge Dataset (materialized) -> list of shard actor handles.
    Block refs are handed to actors unresolved; the blocks never
    visit the driver."""
    import ray

    from ..util import _session_cpus
    refs = edges.to_arrow_refs()
    if not refs:
        return []
    nsh = max(1, min(len(refs), _session_cpus()))
    Actor = ray.remote(num_cpus=1)(_EdgeShard)
    return [Actor.remote(refs[i::nsh], a, b, w) for i in range(nsh)]


def _sorted_keys(shards, dense_max_nodes: int) -> pa.Array | None:
    """Distributed-unique the endpoints, sort on the driver; None if
    the node set exceeds the gate (caller falls back to joins)."""
    import ray
    parts = ray.get([s.endpoints.remote() for s in shards])
    keys = pc.unique(pa.chunked_array([p for p in parts if len(p)]))
    if len(keys) > dense_max_nodes:
        return None
    return keys.take(pc.sort_indices(keys))


def _kill(shards) -> None:
    import ray
    for s in shards:
        ray.kill(s)


def dense_pagerank(edges: Any, *, weighted: bool, iters: int, d: float,
                   dense_max_nodes: int = DENSE_MAX_NODES):
    """``edges``: materialized slim Dataset ``(s, t[, wt])``.  Returns
    an Arrow table ``(node, rank)`` or None if the node gate trips."""
    import ray
    shards = _spawn_shards(edges, "s", "t", "wt" if weighted else None)
    if not shards:
        return None
    keys = _sorted_keys(shards, dense_max_nodes)
    if keys is None:
        _kill(shards)
        return None
    n = len(keys)
    kref = ray.put(keys)
    ray.get([s.index.remote(kref) for s in shards])

    outdeg = sum(ray.get([s.outdeg.remote(n) for s in shards]))
    oref = ray.put(outdeg)
    ray.get([s.set_share.remote(oref) for s in shards])
    dangling_mask = outdeg == 0.0

    rank = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = float(rank[dangling_mask].sum())
        rref = ray.put(rank)
        contrib = sum(ray.get([s.contrib.remote(rref) for s in shards]))
        rank = (1.0 - d) / n + d * dangling / n + d * contrib
    _kill(shards)
    return pa.table({"node": keys, "rank": pa.array(rank)})


SMALL_MAX_EDGES = 1_000_000


def dense_components_small(edges: Any, *, a: str = "a", b: str = "b",
                           max_edges: int = SMALL_MAX_EDGES):
    """SINGLE-TASK fast path below ``max_edges`` distinct rows (the
    dense_triangles precedent): a tiny near-dup pair graph doesn't
    even justify the Pregel-lite actors — their spawn alone costs
    seconds when a previous stage's pool is still tearing down. One
    task pulls the edge blocks (object-store locality; never via the
    driver), labels with min-propagation + full path compression,
    and returns the (node, component) table. None past the gate."""
    import ray

    if edges.count() > max_edges:
        return None

    @ray.remote
    def label(a_col: str, b_col: str, *blocks):
        import pyarrow as pa_mod
        tabs = [t for t in blocks if t.num_rows]
        if not tabs:
            return None
        t = pa_mod.concat_tables(tabs)
        typ = t.column(a_col).type
        u = t.column(a_col).to_numpy(zero_copy_only=False)
        v = t.column(b_col).to_numpy(zero_copy_only=False)
        nodes, inv = np.unique(np.concatenate([u, v]),
                               return_inverse=True)
        n = len(nodes)
        ui, vi = inv[:len(u)], inv[len(u):]
        lab = np.arange(n, dtype=np.int64)
        while True:
            m = np.minimum(lab[ui], lab[vi])
            new = lab.copy()
            # ufunc.at, NOT fancy assignment: several edges can
            # target one node and buffered writes keep only one
            np.minimum.at(new, ui, m)
            np.minimum.at(new, vi, m)
            while True:  # full path compression per round
                nn = new[new]
                if np.array_equal(nn, new):
                    break
                new = nn
            if np.array_equal(new, lab):
                break
            lab = new
        return pa_mod.table({
            "node": pa_mod.array(nodes).cast(typ),
            "component": pa_mod.array(nodes[lab]).cast(typ)})

    refs = edges.to_arrow_refs()
    return ray.get(label.remote(a, b, *refs))


def dense_pagerank_small(edges: Any, *, weighted: bool, iters: int,
                         d: float,
                         max_edges: int = SMALL_MAX_EDGES):
    """SINGLE-TASK PageRank below ``max_edges`` rows — identical math
    to dense_pagerank (sorted-key index encoding, dangling mass
    redistributed uniformly) without the shard actors. None past the
    gate."""
    import ray

    if edges.count() > max_edges:
        return None

    @ray.remote
    def rank_task(_weighted: bool, _iters: int, _d: float, *blocks):
        import pyarrow as pa_mod
        tabs = [t for t in blocks if t.num_rows]
        if not tabs:
            return None
        t = pa_mod.concat_tables(tabs)
        typ = t.column("s").type
        s = t.column("s").to_numpy(zero_copy_only=False)
        tt = t.column("t").to_numpy(zero_copy_only=False)
        wt = (t.column("wt").to_numpy(zero_copy_only=False)
              if _weighted else np.ones(len(s)))
        nodes, inv = np.unique(np.concatenate([s, tt]),
                               return_inverse=True)
        n = len(nodes)
        si, ti = inv[:len(s)], inv[len(s):]
        outdeg = np.zeros(n)
        np.add.at(outdeg, si, wt)
        dangling_mask = outdeg == 0.0
        rank = np.full(n, 1.0 / n)
        for _ in range(_iters):
            dangling = float(rank[dangling_mask].sum())
            share = np.where(outdeg > 0.0, rank / np.where(
                outdeg > 0.0, outdeg, 1.0), 0.0)
            contrib = np.zeros(n)
            np.add.at(contrib, ti, share[si] * wt)
            rank = (1.0 - _d) / n + _d * dangling / n + _d * contrib
        return pa_mod.table({
            "node": pa_mod.array(nodes).cast(typ),
            "rank": pa_mod.array(rank)})

    refs = edges.to_arrow_refs()
    return ray.get(rank_task.remote(weighted, iters, d, *refs))


def dense_components(edges: Any, *, a: str = "a", b: str = "b",
                     max_rounds: int = 20,
                     dense_max_nodes: int = DENSE_MAX_NODES):
    """``edges``: materialized slim Dataset ``(a, b)``.  Returns an
    Arrow table ``(node, component)`` (component = min reachable node
    id) or None if the node gate trips."""
    import ray
    shards = _spawn_shards(edges, a, b, None)
    if not shards:
        return None
    keys = _sorted_keys(shards, dense_max_nodes)
    if keys is None:
        _kill(shards)
        return None
    n = len(keys)
    kref = ray.put(keys)
    ray.get([s.index.remote(kref) for s in shards])

    label = np.arange(n, dtype=np.int64)
    for _ in range(max_rounds):
        lref = ray.put(label)
        parts = ray.get([s.min_label.remote(lref) for s in shards])
        new = label
        for p in parts:
            new = np.minimum(new, p)
        # full driver-side path compression (free at O(n)): chains
        # collapse immediately instead of over log-diameter rounds
        while True:
            nn = new[new]
            if np.array_equal(nn, new):
                break
            new = nn
        if np.array_equal(new, label):
            break
        label = new
    _kill(shards)
    return pa.table({"node": keys,
                     "component": keys.take(pa.array(label))})


TRI_MAX_EDGES = 2_000_000
TRI_MAX_NODES = 16_384


def dense_triangles(dedup_edges: Any,
                    max_edges: int = TRI_MAX_EDGES,
                    max_nodes: int = TRI_MAX_NODES):
    """Single-task bitset fast path for triangle counting — the
    module-doc regime argument applies doubly here: candidate/dedup
    graphs are output-sized, and a <=16k-node graph's full adjacency
    BITSET is <=32 MB, so one worker counts every triangle with
    chunked AND+popcount instead of the wedge shuffle.  Gates:
    distinct-edge count (Dataset metadata) then node count (checked
    inside the task); returns the count, or None past either gate —
    the caller falls back to the distributed wedge formulation.

    Input must already be the canonical DISTINCT (u < v) edge list
    produced by components.triangle_count."""
    import numpy as np
    import ray

    if dedup_edges.count() > max_edges:
        return None

    @ray.remote
    def count(_max_nodes: int, *blocks):
        import pyarrow as pa_mod
        tabs = [b for b in blocks if b.num_rows]
        if not tabs:
            return 0
        t = pa_mod.concat_tables(tabs)
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        nodes, inv = np.unique(np.concatenate([u, v]),
                               return_inverse=True)
        n = len(nodes)
        if n > _max_nodes:
            return None
        ui, vi = inv[:len(u)], inv[len(u):]
        deg = np.bincount(ui, minlength=n) + np.bincount(
            vi, minlength=n)
        # orient low (deg, id) -> high; id order via the index
        u_first = (deg[ui] < deg[vi]) | ((deg[ui] == deg[vi])
                                         & (ui < vi))
        src = np.where(u_first, ui, vi)
        dst = np.where(u_first, vi, ui)
        w = (n + 7) // 8
        bits = np.zeros((n, w), dtype=np.uint8)
        # ufunc.at, NOT fancy |=: several edges of one src can land
        # in the same byte and buffered fancy assignment keeps only
        # one of the duplicate writes
        np.bitwise_or.at(bits, (src, dst >> 3),
                         (1 << (dst & 7)).astype(np.uint8))
        pop = np.unpackbits(
            np.arange(256, dtype=np.uint8)[:, None],
            axis=1).sum(axis=1).astype(np.int64)
        total = 0
        CH = 65536
        for s in range(0, len(src), CH):
            a = bits[src[s:s + CH]]
            b = bits[dst[s:s + CH]]
            total += int(pop[a & b].sum())
        return total

    # refs resolve IN the task (object-store locality) — the edge
    # blocks never pass through the driver
    refs = dedup_edges.to_arrow_refs()
    return ray.get(count.remote(max_nodes, *refs))
