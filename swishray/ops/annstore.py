"""Persisted IVF index for embedding similarity search — the
incremental/scale path of the ANN family (similarity.py's
``ivf_topk`` trains + assigns per CALL, which is right for one-shot
jobs but re-reads the whole corpus per query batch; a nightly
pipeline wants the inverted file on disk).

Layout::

    annidx/_meta.json        # n_centroids, dim, seed, key/col names
    annidx/centroids.npy     # (C, dim) float64, L2-normalized
    annidx/vectors/bucket=N/*.parquet   # (key, embedding) hive rows

* Centroids are trained ONCE on the first ``write_ivf_index`` call
  (bounded deterministic sample, similarity._train_centroids) and
  frozen; appends assign against the frozen centroids so old and new
  vectors share one bucket geometry.
* ``search_ivf_index`` is a driver-side point lookup (the
  IndexSearcher shape): per query it reads ONLY its ``n_probe``
  nearest buckets' parquet partitions and runs one numpy matmul —
  probe-proportional I/O, corpus-size independent.  ``n_probe=None``
  probes every bucket, which makes the result EXACT brute-force
  cosine top-k (the oracle contract) while still exercising the
  store layout.

Reference anchor: none in the reference (no vector search there);
this is part of the training-data-pipeline mandate (ANN over an
embedding column), sharing its sizing rules with ops/similarity.py.
"""
from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
import pyarrow as pa


def write_ivf_index(ds: Any, index_dir: str, *,
                    n_centroids: int = 8, seed: int = 42,
                    key: str = "vec_id", col: str = "embedding",
                    sample_limit: int = 2048) -> dict:
    """Bucket ``ds``'s vectors under ``index_dir`` (append-safe:
    later calls assign against the frozen centroids)."""
    import ray

    from .similarity import _mat, _norm, _train_centroids
    meta_path = os.path.join(index_dir, "_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta["key"] != key or meta["col"] != col:
            raise ValueError(f"index built over ({meta['key']}, "
                             f"{meta['col']}), append asked for "
                             f"({key}, {col})")
        cent = np.load(os.path.join(index_dir, "centroids.npy"))
    else:
        cent = _train_centroids(ds, n_centroids, seed, col,
                                sample_limit)
        os.makedirs(index_dir, exist_ok=True)
        np.save(os.path.join(index_dir, "centroids.npy"), cent)
        with open(meta_path, "w") as f:
            json.dump({"n_centroids": int(cent.shape[0]),
                       "dim": int(cent.shape[1]), "seed": seed,
                       "key": key, "col": col}, f)

    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _norm(_mat(batch.column(col)))
        b = np.argmax(m @ c.T, axis=1).astype(np.int32)
        return pa.table({
            "key": batch.column(key),
            "embedding": batch.column(col),
            "bucket": pa.array(b)})

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "vectors"), partition_cols=["bucket"])
    return {"n_centroids": int(cent.shape[0]),
            "dim": int(cent.shape[1])}


def search_ivf_index(index_dir: str, query_ids: list,
                     query_vecs: "np.ndarray", k: int = 10,
                     n_probe: int | None = 2) -> pa.Table:
    """Top-k cosine neighbours per query from the persisted buckets
    -> ``(query_id, vec_id, score)``, deterministic (score desc, key
    asc).  ``n_probe=None`` probes all buckets (exact)."""
    import pyarrow.dataset as pads

    from .similarity import _mat, _norm
    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    nc = cent.shape[0]
    if nc == 0 or len(query_ids) == 0:
        # empty index (built from an empty corpus) or no queries
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    qm = _norm(np.asarray(query_vecs, dtype=np.float64))
    if n_probe is None or n_probe >= nc:
        probes = [list(range(nc)) for _ in query_ids]
    else:
        qsim = qm @ cent.T
        probes = [list(np.argsort(-qsim[i])[:n_probe])
                  for i in range(len(query_ids))]
    union = sorted({b for bs in probes for b in bs})

    vecs = pads.dataset(os.path.join(index_dir, "vectors"),
                        partitioning="hive").to_table(
        filter=pads.field("bucket").isin(union),
        columns=["key", "embedding", "bucket"])
    if vecs.num_rows == 0:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    m = _norm(_mat(vecs.column("embedding")))
    keys = vecs.column("key").to_pandas().to_numpy()
    buckets = vecs.column("bucket").to_numpy(zero_copy_only=False)
    sims = qm @ m.T                       # (nq, nvec)

    out_q, out_k, out_s = [], [], []
    for qi, qid in enumerate(query_ids):
        mask = np.isin(buckets, probes[qi])
        idx = np.flatnonzero(mask)
        s = sims[qi, idx]
        # score desc, key asc — lexsort on (-score, key)
        order = np.lexsort((keys[idx], -s))[:k]
        pick = idx[order]
        out_q += [qid] * len(pick)
        out_k += list(keys[pick])
        out_s += list(sims[qi, pick])
    return pa.table({
        "query_id": pa.array(out_q),
        "vec_id": pa.array(out_k),
        "score": pa.array(out_s, pa.float64())})
