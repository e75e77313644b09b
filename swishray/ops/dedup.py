"""Deduplication operators.

Scale design: every variant is a map_batches sketch/signature stage
(vectorized, stateless or actor-held tables) followed by ONE keyed
shuffle on a small signature table — never an all-pairs comparison on
the full corpus and never a driver-side materialization. The only
all-to-all exchanges move (signature, id) rows, orders of magnitude
smaller than the documents; full rows move at most once, partitioned
by the (uniform) document key, never by the (dup-skewed) content hash.

  * exact_dedup      — map-side combiner -> slim (key, hash) shuffle
                       -> winner keys -> join winners back by key
  * minhash_lsh      — word shingles -> k minhashes -> b bands ->
                       groupby(band, band_hash) -> candidate pairs ->
                       exact Jaccard verify via two distributed joins
  * simhash          — 64-bit weighted word-hash signature; near-dup
                       candidates via band buckets + Hamming verify
  * embedding near-dups live in similarity.cosine_dup_pairs

Hot-bucket guard: LSH/simhash buckets above ``bucket_cap`` rows (a
boilerplate page shared by millions of urls lands every copy in one
band bucket) switch from all-pairs to star pairing — every member
paired with the bucket minimum. That keeps the near-dup connectivity
certificate (all members remain transitively linked through the hub)
while emitting O(n) instead of O(n^2) pairs per bucket.
"""

from __future__ import annotations

import hashlib
from typing import Any

import numpy as np
import pyarrow as pa

_MERSENNE = (1 << 61) - 1
_LOW31 = np.uint64(0x7FFFFFFF)
_LOW30 = np.uint64(0x3FFFFFFF)
_P = np.uint64(_MERSENNE)

# all-pairs emission allowed up to this bucket size; larger buckets
# degrade to star pairing (see module docstring)
DEFAULT_BUCKET_CAP = 256


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


def exact_dedup_keys(ds: Any, col: str = "text", key: str = "doc_id",
                     hash_col: str | None = None) -> Any:
    """Winner keys of an exact dedup: for every distinct content hash,
    the minimum ``key``. Only (key, hash) pairs ever ride the shuffle —
    payloads stay put. A map-side combiner (min key per hash within
    each batch) bounds every group to <= #blocks rows regardless of how
    many duplicates a hot page has, so dup skew cannot concentrate in
    one reduce task.

    If ``hash_col`` is given the input already carries the content
    hash; otherwise it is computed from ``col``.

    Returns a Dataset with a single ``key`` column.
    """
    import pandas as pd
    from ray.data.aggregate import Min

    if hash_col is None:
        hash_col = "content_hash"
        hashed = add_content_hash(ds, col, out=hash_col)
    else:
        hashed = ds
    slim = hashed.select_columns([key, hash_col])

    def combine(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = df.groupby(hash_col, as_index=False, sort=False)[key].min()
        return pa.Table.from_pandas(out[[key, hash_col]],
                                    preserve_index=False)

    combined = slim.map_batches(combine, batch_format="pyarrow")
    winners = combined.groupby(hash_col).aggregate(
        Min(key, alias_name="__winner"))

    def keys_only(batch: pa.Table) -> pa.Table:
        return pa.table({key: batch.column("__winner")})

    return winners.map_batches(keys_only, batch_format="pyarrow")


def exact_dedup(ds: Any, col: str = "text", key: str = "doc_id",
                unique_keys: bool = True) -> Any:
    """Exact dedup keeping the minimum-``key`` row per content hash.

    Two-phase scale shape (reference upsert semantics,
    swish_xapian.cpp:563-601): (1) slim (key, hash) shuffle picks
    winner keys — moves ~key-sized bytes, combiner-bounded skew;
    (2) the winners (a keys-only table) inner-join back to the corpus
    partitioned by the uniform ``key``, so full rows move exactly once
    and never pile onto a hot content-hash partition.

    Set ``unique_keys=False`` when the input can contain repeated keys
    (e.g. a union of snapshots): a final keep-one-per-key pass (again
    map-side combined) collapses them.
    """
    import pandas as pd
    from .joins import default_join_partitions, native_join

    hashed = add_content_hash(ds, col)
    winners = exact_dedup_keys(hashed, col, key, hash_col="content_hash")
    # Ray 2.49's sort-based Aggregate emits zero-row blocks with an
    # EMPTY schema for reduce partitions that got no groups; the
    # built-in hash join rejects such blocks ("no match for key field
    # on right side"). repartition() is a metadata-level block
    # coalesce (not a shuffle) that folds them into schema-bearing
    # blocks — cheap even though winners is corpus-cardinality,
    # because it only carries keys.
    winners = winners.repartition(default_join_partitions())
    kept = native_join(hashed, winners, key)
    if unique_keys:
        return kept

    def combine_first(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pandas(
            df.drop_duplicates(subset=[key], keep="first"),
            preserve_index=False)

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return kept.map_batches(combine_first, batch_format="pyarrow") \
        .groupby(key).map_groups(first, batch_format="pandas")


# ---- minhash + LSH ----------------------------------------------------

def _mod_p(x: np.ndarray) -> np.ndarray:
    """Reduce arbitrary uint64 values mod p = 2^61 - 1."""
    r = (x >> np.uint64(61)) + (x & _P)
    return np.where(r >= _P, r - _P, r)


def _mulmod_p(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """(a * x) mod p for p = 2^61 - 1, fully in uint64 (no overflow):
    split both operands into 31/30-bit halves; fold 2^61 == 1 (mod p).
    Shapes broadcast (used as a[:, None] * x[None, :])."""
    a_hi = a >> np.uint64(31)          # < 2^30
    a_lo = a & _LOW31                  # < 2^31
    x_hi = x >> np.uint64(31)          # < 2^30
    x_lo = x & _LOW31                  # < 2^31
    # a*x = a_hi*x_hi*2^62 + (a_hi*x_lo + a_lo*x_hi)*2^31 + a_lo*x_lo
    t1 = _mod_p(a_hi * x_hi * np.uint64(2))          # 2^62 == 2 (mod p)
    mid = a_hi * x_lo + a_lo * x_hi                  # < 2^62, fits
    m_hi = mid >> np.uint64(30)                      # < 2^32
    m_lo = mid & _LOW30                              # < 2^30
    # mid*2^31 = m_hi*2^61 + m_lo*2^31 == m_hi + m_lo*2^31 (mod p)
    t2 = _mod_p(m_hi + (m_lo << np.uint64(31)))
    t3 = _mod_p(a_lo * x_lo)
    return _mod_p(t1 + t2 + t3)


class MinHasher:
    """Stateful batch signer: permutation parameters generated once per
    actor (seeded — deterministic across the cluster). The permutation
    family is the standard universal hash h(x) = (a*x + b) mod p with
    p = 2^61 - 1, computed with an exact vectorized Mersenne modmul
    (no silent wrap mod 2^64)."""

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
        sh = _mod_p(np.unique(self.shingles(text)))
        # (a*x + b) mod p per permutation, exact in uint64
        vals = _mod_p(_mulmod_p(self.a[:, None], sh[None, :])
                      + self.b[:, None])
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
    # cached-task mode: signer state is tiny and the downstream dedup
    # pipeline runs join aggregator actors — a pinned actor pool plus
    # those aggregators can exceed the session's CPUs and deadlock
    return map_batches_stateful(
        ds, MinHasher, fn_constructor_kwargs=dict(
            num_perm=num_perm, shingle_k=shingle_k, seed=seed,
            col=col, key=key),
        batch_format="pyarrow", concurrency=concurrency,
        force_tasks=concurrency is None)


def _bucket_pairs(ks: list, cap: int) -> tuple[list, list]:
    """Pairs for one bucket: all-pairs up to ``cap`` members, star
    pairing (min vs rest) above it — O(n) pairs, connectivity kept."""
    ks = sorted(ks)
    a, b = [], []
    if len(ks) <= cap:
        for i in range(len(ks)):
            for j in range(i + 1, len(ks)):
                a.append(ks[i])
                b.append(ks[j])
    else:
        hub = ks[0]
        for k_ in ks[1:]:
            a.append(hub)
            b.append(k_)
    return a, b


def lsh_candidate_pairs(sigs: Any, bands: int = 16,
                        key: str = "doc_id",
                        bucket_cap: int = DEFAULT_BUCKET_CAP) -> Any:
    """Explode signatures to (band_id, band_hash, key) rows, shuffle on
    the band bucket, pair up within buckets. Returns candidate pairs
    (a < b), deduped per block — a pair matching in several bands can
    appear once per band; consumers dedup the (small) final set.

    Buckets larger than ``bucket_cap`` emit star pairs only (see
    module docstring) so one boilerplate-heavy bucket cannot explode
    into O(n^2) pairs."""
    import pandas as pd

    def explode(batch: pa.Table) -> pa.Table:
        """Vectorized banding: the (n, num_perm) signature matrix
        reshapes to (n, bands, r); each band folds its r minhashes
        through splitmix64 mixing into one 63-bit bucket hash — no
        per-row Python loop, no per-band tuple hashing."""
        n = batch.num_rows
        if n == 0:
            return pa.table({
                "band_id": pa.array([], type=pa.int32()),
                "band_hash": pa.array([], type=pa.int64()),
                key: pa.array([], type=batch.schema.field(key).type),
            })
        sigs = np.asarray(batch.column("minhash").to_pylist(),
                          dtype=np.uint64)
        mat = sigs.reshape(n, bands, -1)
        h = np.zeros((n, bands), dtype=np.uint64)
        for j in range(mat.shape[2]):
            h = _mix64(h ^ mat[:, :, j])
        bh = (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        keys_np = np.repeat(
            np.asarray(batch.column(key).to_pylist()), bands)
        return pa.table({
            "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32),
                                        n)),
            "band_hash": pa.array(bh.ravel()),
            key: pa.array(keys_np,
                          type=batch.schema.field(key).type),
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        a, b = _bucket_pairs(g[key].tolist(), bucket_cap)
        return pd.DataFrame({"a": a, "b": b})

    exploded = sigs.map_batches(explode, batch_format="pyarrow")
    cand = exploded.groupby(["band_id", "band_hash"]).map_groups(
        pairs, batch_format="pandas")

    # lightweight per-block dedup (duplicates only recur across bands;
    # the distributed pair-level dedup happens in minhash_dedup)
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
                  col: str = "text", key: str = "doc_id",
                  bucket_cap: int = DEFAULT_BUCKET_CAP,
                  candidate_broadcast_limit: int = 0) -> Any:
    """Full near-dup pipeline: sign -> LSH buckets -> candidate pairs
    -> exact Jaccard verify. Returns (a, b, jaccard) pairs >= threshold.

    The verify stage is fully distributed: candidate pairs are deduped
    with a keyed shuffle, each side's text is attached with a
    hash-partitioned join (pairs ⋈ texts on a, then on b), and the
    exact Jaccard runs inside map_batches. No driver-side take_all, no
    broadcast text dict — candidate volume can exceed driver memory."""
    import pandas as pd

    sigs = minhash_signatures(ds, num_perm, shingle_k, seed, col, key)
    cand = lsh_candidate_pairs(sigs, bands, key, bucket_cap)

    # Optional candidate-key text pruning (candidate_broadcast_limit >
    # 0): when candidates are known to be ≪ corpus (a mostly-unique
    # corpus at 100 TB), materialize the slim pair table, broadcast
    # its bounded key set, and semi-join the text table down to
    # candidate members before the attach shuffle — the exchange then
    # carries candidate texts instead of the corpus. Disabled by
    # default: the materialize barrier breaks stage overlap, which
    # costs more than the pruning saves when candidates ~ corpus (the
    # test corpora are dup-heavy). The driver never holds more than
    # the cap in pairs; above it the fully distributed path runs.
    texts_src = ds.select_columns([key, col])
    if candidate_broadcast_limit > 0:
        cand = cand.materialize()  # ids-only; enables the cheap count
        if cand.count() <= candidate_broadcast_limit:
            pair_rows = cand.take_all()
            cand_keys = ({r["a"] for r in pair_rows}
                         | {r["b"] for r in pair_rows})
            if cand_keys:
                from .joins import semi_join_keys
                texts_src = semi_join_keys(texts_src, cand_keys, col=key)

    # Attach texts without the built-in join (its aggregator actors
    # add a barrier + spin-up per use, and it rejects the schema-less
    # empty blocks sort-based shuffles emit): each pair explodes to
    # two (member-key, pair, side) EDGE rows; edges union with the
    # (key, text) table under one padded schema; ONE groupby on the
    # member key hands every edge its text; a second groupby on the
    # pair brings both sides together for the exact-Jaccard verify.
    # Pairs duplicated across LSH bands need no pre-dedup pass — the
    # verify group collapses them. Bytes moved: the text table rides
    # the attach shuffle once (same as a join would move), edges and
    # per-edge texts are candidate-volume.
    def explode_edges(batch: pa.Table) -> pa.Table:
        a = batch.column("a").combine_chunks()
        b = batch.column("b").combine_chunks()
        n = batch.num_rows
        return pa.table({
            "__k": pa.concat_arrays([a, b]),
            "a": pa.concat_arrays([a, a]),
            "b": pa.concat_arrays([b, b]),
            "__side": pa.array([0] * n + [1] * n, type=pa.int8()),
            "__t": pa.nulls(2 * n, type=pa.large_string()),
        })

    def texts_tagged(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n = batch.num_rows
        kcol = batch.column(key)
        return pa.table({
            "__k": kcol,
            "a": pa.nulls(n, type=kcol.type),
            "b": pa.nulls(n, type=kcol.type),
            "__side": pa.nulls(n, type=pa.int8()),
            "__t": pc.cast(batch.column(col), pa.large_string()),
        })

    edges = cand.map_batches(explode_edges, batch_format="pyarrow")
    texts = texts_src.map_batches(texts_tagged, batch_format="pyarrow")

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        is_text = g["__side"].isna()
        tvals = g.loc[is_text, "__t"]
        t = tvals.iloc[0] if len(tvals) else ""
        e = g.loc[~is_text, ["a", "b", "__side"]]
        if not len(e):
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "__side": pd.Series([], dtype="int8"),
                                 "__t": pd.Series([], dtype="object")})
        e = e.drop_duplicates()
        e = e.assign(__t=t if t is not None else "")
        return e

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        ta = tb = ""
        for side, t in zip(g["__side"], g["__t"]):
            if side == 0:
                ta = t or ""
            else:
                tb = t or ""
        j = ngram_jaccard(ta, tb, shingle_k)
        if j < threshold:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "jaccard": pd.Series([], dtype="float64")})
        return pd.DataFrame({"a": [g["a"].iloc[0]], "b": [g["b"].iloc[0]],
                             "jaccard": [j]})

    out = edges.union(texts).groupby("__k") \
        .map_groups(attach, batch_format="pandas") \
        .groupby(["a", "b"]).map_groups(verify, batch_format="pandas")

    def shape(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "a": pc.cast(batch.column("a"), pa.int64()),
            "b": pc.cast(batch.column("b"), pa.int64()),
            "jaccard": pc.cast(batch.column("jaccard"), pa.float64()),
        })

    return out.map_batches(shape, batch_format="pyarrow")


# ---- simhash ----------------------------------------------------------

def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public-domain constants): spreads the
    32-bit crc32 word hashes over all 64 bits, vectorized."""
    x = x.copy()
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace words — fully vectorized: one
    crc32 per word (C speed, same primitive the minhash signer uses),
    splitmix64 bit-mixing and a single batched unpackbits/sum for the
    ±1 bit accumulation (the old per-word blake2b + Python loop was
    ~30x slower, a real cost at corpus scale)."""
    from zlib import crc32
    words = text.split()
    if not words:
        return 0
    wh = _mix64(np.fromiter((crc32(w.encode()) for w in words),
                            dtype=np.uint64, count=len(words)))
    # big-endian byte view so bit 0 of the unpacked array is the hash's
    # MSB; acc[i] > 0 sets output bit (63 - i), matching the old layout
    bits = np.unpackbits(wh.astype(">u8").view(np.uint8)
                         .reshape(len(words), 8), axis=1)
    acc = (bits.astype(np.int32) * 2 - 1).sum(axis=0)
    return int.from_bytes(np.packbits(acc > 0).tobytes(), "big")


def add_simhash(ds: Any, col: str = "text", out: str = "simhash") -> Any:
    def f(batch: pa.Table) -> pa.Table:
        vals = [simhash64(t) for t in _text_col(batch, col)]
        # store as int64 (wrap) for parquet friendliness
        arr = pa.array([v - (1 << 64) if v >= (1 << 63) else v
                        for v in vals], type=pa.int64())
        return batch.append_column(out, arr)
    return ds.map_batches(f, batch_format="pyarrow")


def simhash_near_dups(ds: Any, max_hamming: int = 3, col: str = "text",
                      key: str = "doc_id",
                      bucket_cap: int = DEFAULT_BUCKET_CAP) -> Any:
    """Band the 64-bit simhash into 4 x 16-bit keys (any pair within
    Hamming distance 3 shares at least one band), bucket-shuffle, then
    Hamming-verify within buckets. Buckets above ``bucket_cap``
    members emit star pairs against the bucket minimum (Hamming still
    verified) instead of all-pairs — see module docstring."""
    import pandas as pd

    signed = add_simhash(ds, col).select_columns([key, "simhash"])

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sh = np.asarray(batch.column("simhash").to_pylist(),
                        dtype=np.int64)
        u = sh.view(np.uint64)
        bvals = np.empty((n, 4), dtype=np.int32)
        for b in range(4):
            bvals[:, b] = ((u >> np.uint64(16 * b))
                           & np.uint64(0xFFFF)).astype(np.int32)
        ks = np.repeat(np.asarray(batch.column(key).to_pylist()), 4)
        return pa.table({
            key: pa.array(ks, type=batch.schema.field(key).type),
            "band_id": pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
            "band_val": pa.array(bvals.ravel()),
            "simhash": pa.array(np.repeat(sh, 4)),
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(g[[key, "simhash"]].drop_duplicates()
                       .itertuples(index=False), key=lambda r: r[0])
        a, b, d = [], [], []

        def emit(ri, rj):
            x = (ri[1] ^ rj[1]) & 0xFFFFFFFFFFFFFFFF
            ham = bin(x).count("1")
            if ham <= max_hamming:
                a.append(ri[0])
                b.append(rj[0])
                d.append(ham)

        if len(rows) <= bucket_cap:
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    emit(rows[i], rows[j])
        else:
            hub = rows[0]
            for r in rows[1:]:
                emit(hub, r)
        return pd.DataFrame({"a": a, "b": b, "hamming": d})

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    cand = signed.map_batches(explode, batch_format="pyarrow") \
        .groupby(["band_id", "band_val"]).map_groups(pairs,
                                                     batch_format="pandas")
    return cand.groupby(["a", "b"]).map_groups(first, batch_format="pandas")
