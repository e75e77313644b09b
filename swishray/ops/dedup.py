"""Deduplication operators.

Scale design: every variant is a map_batches sketch/signature stage
(vectorized, stateless or actor-held tables) followed by ONE keyed
shuffle on a small signature table — never an all-pairs comparison on
the full corpus. The only all-to-all exchanges move (signature, id)
rows, orders of magnitude smaller than the documents.

  * exact_dedup      — content hash -> groupby(hash) -> keep min id
  * minhash_lsh      — word shingles -> k minhashes -> b bands ->
                       groupby(band, band_hash) -> candidate pairs ->
                       exact Jaccard verify
  * simhash          — 64-bit weighted word-hash signature; near-dup
                       candidates via band buckets + Hamming verify
  * embedding_dups   — cosine > threshold pairs against a broadcast
                       matrix (exact at small scale; the documented
                       scale path is LSH/IVF bucketing first)
"""

from __future__ import annotations

import hashlib
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE = (1 << 61) - 1


def _text_col(batch: pa.Table, col: str) -> list[str]:
    return [x or "" for x in batch.column(col).to_pylist()]


# ---- exact ------------------------------------------------------------

def add_content_hash(ds: Any, col: str = "text",
                     out: str = "content_hash") -> Any:
    def h(batch: pa.Table) -> pa.Table:
        hashes = [hashlib.md5((t or "").encode()).hexdigest()
                  for t in batch.column(col).to_pylist()]
        return batch.append_column(out, pa.array(hashes, type=pa.string()))
    return ds.map_batches(h, batch_format="pyarrow")


def exact_dedup(ds: Any, col: str = "text", key: str = "doc_id") -> Any:
    """Hash-partition on content hash, keep the smallest key per group
    (deterministic keep-first)."""
    import pandas as pd

    hashed = add_content_hash(ds, col)

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(key).head(1)

    return hashed.groupby("content_hash").map_groups(
        keep_first, batch_format="pandas")


# ---- minhash + LSH ----------------------------------------------------

class MinHasher:
    """Stateful batch signer: permutation parameters generated once per
    actor (seeded — deterministic across the cluster)."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3,
                 seed: int = 42, col: str = "text", key: str = "doc_id"):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.col = col
        self.key = key

    def shingles(self, text: str) -> np.ndarray:
        """Vectorized word-k-gram hashing: crc32 per word (C speed),
        then a polynomial combination of k consecutive word hashes —
        no per-gram string building or digest objects."""
        from zlib import crc32
        words = text.split()
        wh = np.fromiter((crc32(w.encode()) for w in words),
                         dtype=np.uint64, count=len(words))
        if len(words) < self.k:
            return np.array([wh.sum() if len(words) else 0],
                            dtype=np.uint64)
        B = np.uint64(1000003)
        g = wh[:len(wh) - self.k + 1].copy()
        for j in range(1, self.k):
            g = g * B + wh[j:len(wh) - self.k + 1 + j]
        return g

    def signature(self, text: str) -> np.ndarray:
        sh = np.unique(self.shingles(text))
        # (a*x + b) mod p for each permutation, vectorized
        vals = (sh[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key).to_pylist()
        sigs = [self.signature(t) for t in _text_col(batch, self.col)]
        return pa.table({
            self.key: pa.array(keys),
            "minhash": pa.array([s.tolist() for s in sigs],
                                type=pa.list_(pa.uint64())),
        })


def minhash_signatures(ds: Any, num_perm: int = 64, shingle_k: int = 3,
                       seed: int = 42, col: str = "text",
                       key: str = "doc_id", concurrency=None) -> Any:
    from ..util import map_batches_stateful
    return map_batches_stateful(
        ds, MinHasher, fn_constructor_kwargs=dict(
            num_perm=num_perm, shingle_k=shingle_k, seed=seed,
            col=col, key=key),
        batch_format="pyarrow", concurrency=concurrency)


def lsh_candidate_pairs(sigs: Any, bands: int = 16,
                        key: str = "doc_id") -> Any:
    """Explode signatures to (band_id, band_hash, key) rows, shuffle on
    the band bucket, pair up within buckets. Returns candidate pairs
    (a < b), deduped per block — a pair matching in several bands can
    appear once per band; consumers dedup the (small) final set."""
    import pandas as pd

    def explode(batch: pa.Table) -> pa.Table:
        keys = batch.column(key).to_pylist()
        sig_list = batch.column("minhash").to_pylist()
        bids, bhashes, ks = [], [], []
        for k_, sig in zip(keys, sig_list):
            rows = len(sig) // bands
            for b in range(bands):
                chunk = tuple(sig[b * rows:(b + 1) * rows])
                bids.append(b)
                bhashes.append(hash(chunk) & 0x7FFFFFFFFFFFFFFF)
                ks.append(k_)
        return pa.table({
            "band_id": pa.array(bids, type=pa.int32()),
            "band_hash": pa.array(bhashes, type=pa.int64()),
            key: pa.array(ks),
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ks = sorted(g[key].tolist())
        if len(ks) < 2:
            return pd.DataFrame({"a": [], "b": []})
        a, b = [], []
        for i in range(len(ks)):
            for j in range(i + 1, len(ks)):
                a.append(ks[i])
                b.append(ks[j])
        return pd.DataFrame({"a": a, "b": b})

    exploded = sigs.map_batches(explode, batch_format="pyarrow")
    cand = exploded.groupby(["band_id", "band_hash"]).map_groups(
        pairs, batch_format="pandas")
    # distinct pairs: a lightweight per-block dedup (duplicates only
    # recur across bands; a full extra shuffle isn't worth it — the
    # caller dedups the final small set)
    import pandas as pd

    def drop_dupes(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates()

    return cand.map_batches(drop_dupes, batch_format="pandas")


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard (the LSH verify step)."""
    def grams(t: str) -> set:
        w = t.split()
        if len(w) < k:
            return {" ".join(w)} if w else set()
        return {" ".join(w[i:i + k]) for i in range(len(w) - k + 1)}
    ga, gb = grams(text_a), grams(text_b)
    if not ga and not gb:
        return 1.0
    return len(ga & gb) / max(1, len(ga | gb))


def minhash_dedup(ds: Any, threshold: float = 0.8, num_perm: int = 64,
                  bands: int = 16, shingle_k: int = 3, seed: int = 42,
                  col: str = "text", key: str = "doc_id") -> Any:
    """Full near-dup pipeline: sign -> LSH buckets -> candidate pairs
    -> exact Jaccard verify (broadcast text lookup for the verified
    pairs — the candidate set is tiny relative to the corpus).
    Returns (a, b, jaccard) pairs >= threshold."""
    import ray

    import ray.data as rd

    sigs = minhash_signatures(ds, num_perm, shingle_k, seed, col, key)
    cand = lsh_candidate_pairs(sigs, bands, key)
    # the candidate set is tiny relative to the corpus: dedup it once
    # on the driver and broadcast the texts it references
    pair_set = sorted({(row["a"], row["b"]) for row in cand.take_all()})
    cand_ids = {x for p in pair_set for x in p}
    texts = {}
    if cand_ids:
        def pick(batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch.column(key),
                            value_set=pa.array(list(cand_ids)))
            return batch.filter(mask)
        small = ds.map_batches(pick, batch_format="pyarrow")
        for row in small.select_columns([key, col]).take_all():
            texts[row[key]] = row[col]
    texts_ref = ray.put(texts)

    if pair_set:
        pairs_tbl = pa.table({"a": pa.array([p[0] for p in pair_set]),
                              "b": pa.array([p[1] for p in pair_set])})
    else:
        pairs_tbl = pa.table({"a": pa.array([], type=pa.int64()),
                              "b": pa.array([], type=pa.int64())})
    pairs_ds = rd.from_arrow(pairs_tbl)

    def verify(batch: pa.Table) -> pa.Table:
        t = ray.get(texts_ref)
        out_a, out_b, out_j = [], [], []
        for a, b in zip(batch.column("a").to_pylist(),
                        batch.column("b").to_pylist()):
            j = ngram_jaccard(t.get(a, ""), t.get(b, ""), shingle_k)
            if j >= threshold:
                out_a.append(a)
                out_b.append(b)
                out_j.append(j)
        return pa.table({"a": pa.array(out_a), "b": pa.array(out_b),
                         "jaccard": pa.array(out_j, type=pa.float64())})

    return pairs_ds.map_batches(verify, batch_format="pyarrow")


# ---- simhash ----------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace words (deterministic blake2b
    word hashes)."""
    acc = np.zeros(64, dtype=np.int64)
    for w in text.split():
        h = int.from_bytes(
            hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
        bits = np.unpackbits(
            np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8))
        acc += bits.astype(np.int64) * 2 - 1
    out = 0
    for i, v in enumerate(acc):
        if v > 0:
            out |= 1 << (63 - i)
    return out


def add_simhash(ds: Any, col: str = "text", out: str = "simhash") -> Any:
    def f(batch: pa.Table) -> pa.Table:
        vals = [simhash64(t) for t in _text_col(batch, col)]
        # store as int64 (wrap) for parquet friendliness
        arr = pa.array([v - (1 << 64) if v >= (1 << 63) else v
                        for v in vals], type=pa.int64())
        return batch.append_column(out, arr)
    return ds.map_batches(f, batch_format="pyarrow")


def simhash_near_dups(ds: Any, max_hamming: int = 3, col: str = "text",
                      key: str = "doc_id") -> Any:
    """Band the 64-bit simhash into 4 x 16-bit keys (any pair within
    Hamming distance 3 shares at least one band), bucket-shuffle, then
    Hamming-verify within buckets."""
    import pandas as pd

    signed = add_simhash(ds, col).select_columns([key, "simhash"])

    def explode(batch: pa.Table) -> pa.Table:
        ks, bids, bvals, full = [], [], [], []
        for k_, s in zip(batch.column(key).to_pylist(),
                         batch.column("simhash").to_pylist()):
            u = s & 0xFFFFFFFFFFFFFFFF
            for b in range(4):
                ks.append(k_)
                bids.append(b)
                bvals.append((u >> (16 * b)) & 0xFFFF)
                full.append(s)
        return pa.table({key: pa.array(ks), "band_id": pa.array(bids, type=pa.int32()),
                         "band_val": pa.array(bvals, type=pa.int32()),
                         "simhash": pa.array(full, type=pa.int64())})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(g[[key, "simhash"]].drop_duplicates().itertuples(index=False),
                      key=lambda r: r[0])
        a, b, d = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                x = (rows[i][1] ^ rows[j][1]) & 0xFFFFFFFFFFFFFFFF
                ham = bin(x).count("1")
                if ham <= max_hamming:
                    a.append(rows[i][0])
                    b.append(rows[j][0])
                    d.append(ham)
        return pd.DataFrame({"a": a, "b": b, "hamming": d})

    import pandas as pd

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    cand = signed.map_batches(explode, batch_format="pyarrow") \
        .groupby(["band_id", "band_val"]).map_groups(pairs,
                                                     batch_format="pandas")
    return cand.groupby(["a", "b"]).map_groups(first, batch_format="pandas")
