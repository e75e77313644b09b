"""BPE trainer + encoder: classic-algorithm equivalence, determinism,
and the distributed word-count path."""

import numpy as np
import pyarrow as pa


def _naive_train(word_counts: dict, num_merges: int):
    """Independent reference: textbook O(V*merges) Sennrich loop,
    recounting pairs from scratch every round."""
    words = {w: tuple(w) + ("\x00",) for w in word_counts}
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + word_counts[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new = best[0] + best[1]
        for w, syms in list(words.items()):
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(new)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = tuple(out)
    return merges


def _naive_encode(word: str, merges: list):
    """Lowest-rank-first greedy, same contract as the engine."""
    syms = list(word) + ["\x00"]
    ranks = {m: i for i, m in enumerate(merges)}
    while len(syms) > 1:
        cand = [(ranks[(syms[i], syms[i + 1])], i)
                for i in range(len(syms) - 1)
                if (syms[i], syms[i + 1]) in ranks]
        if not cand:
            break
        _, i = min(cand)
        syms[i:i + 2] = [syms[i] + syms[i + 1]]
    return syms


def test_train_matches_naive(ray_session):
    import ray.data as rd
    from swishray.ops.bpe import train_bpe

    texts = ["low low low lower lower newest newest newest newest",
             "widest widest widest new new newer"] * 3
    ds = rd.from_arrow(pa.table({"text": pa.array(texts)})) \
        .repartition(4)
    got = train_bpe(ds, num_merges=12, min_count=1)
    got_merges = list(zip(got.column("left").to_pylist(),
                          got.column("right").to_pylist()))

    wc = {}
    for t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    want = _naive_train(wc, 12)
    assert got_merges == want


def test_encode_counts_match_naive(ray_session):
    import ray.data as rd
    from swishray.ops.bpe import train_bpe, bpe_token_counts

    texts = ["the cat sat on the mat", "the cats sat",
             "a catastrophe on the mat", ""]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)}))
    merges_tbl = train_bpe(ds, num_merges=10, min_count=1)
    merges = list(zip(merges_tbl.column("left").to_pylist(),
                      merges_tbl.column("right").to_pylist()))

    out = bpe_token_counts(ds, merges_tbl).to_pandas() \
        .set_index("doc_id").n_bpe_tokens
    for i, t in enumerate(texts):
        want = sum(len(_naive_encode(w, merges))
                   for w in t.lower().split() if w)
        assert out[i] == want, (i, t)


def test_train_deterministic_across_partitionings(ray_session):
    import ray.data as rd
    from swishray.ops.bpe import train_bpe

    rng = np.random.default_rng(5)
    texts = [" ".join(rng.choice(
        ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"],
        size=rng.integers(3, 12))) for _ in range(50)]
    t = pa.table({"text": pa.array(texts)})
    a = train_bpe(rd.from_arrow(t).repartition(2), num_merges=15)
    b = train_bpe(rd.from_arrow(t).repartition(9), num_merges=15)
    assert a.equals(b)


def test_merges_cover_frequent_word(ray_session):
    """A dominant word collapses to a single symbol within
    len(word) merges."""
    import ray.data as rd
    from swishray.ops.bpe import train_bpe, _encode_word

    ds = rd.from_arrow(pa.table({
        "text": pa.array(["banana " * 50, "apple pear"])}))
    m = train_bpe(ds, num_merges=8, min_count=1)
    ranks = {(l, r): i for i, (l, r) in enumerate(
        zip(m.column("left").to_pylist(),
            m.column("right").to_pylist()))}
    assert _encode_word("banana", ranks) == ["banana\x00"]
