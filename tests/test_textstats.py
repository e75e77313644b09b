

def test_split_sentences(ray_session):
    import ray.data as rd
    from swishray.ops.textstats import split_sentences
    ds = rd.from_items([
        {"doc_id": 1, "text": "Hello world. How are you? Fine thanks"},
        {"doc_id": 2, "text": "One sentence only"},
        {"doc_id": 3, "text": ""},
        {"doc_id": 4, "text": "Wow! Really!  Yes."},
    ]).repartition(2)
    out = split_sentences(ds).to_pandas() \
        .sort_values(["doc_id", "sent_idx"]).reset_index(drop=True)
    got = [tuple(r) for r in out.itertuples(index=False)]
    assert got == [
        (1, 0, "Hello world."), (1, 1, "How are you?"),
        (1, 2, "Fine thanks"),
        (2, 0, "One sentence only"),
        (4, 0, "Wow!"), (4, 1, "Really!"), (4, 2, "Yes."),
    ]


def test_readability_counts(ray_session):
    """Hand-computed Flesch inputs, incl. vowelless words, trailing
    terminal-less runs, mid-word punctuation, and empty/null text."""
    import ray.data as rd
    import pyarrow as pa
    from swishray.ops.textstats import readability_counts

    texts = [
        "The cat sat. It purred!",      # 5 words, 2 sent
        "Hmm... brr pfft",              # 3 words, 2 sent (Hmm... + open run)
        "no terminal here",             # 3 words, 1 sent
        "",                             # empty
        None,                           # null
        "a.b ends mid.word",            # no terminal-final words -> 1
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = readability_counts(rd.from_arrow(t)).to_pandas() \
        .set_index("doc_id").sort_index()

    assert list(out.n_words) == [5, 3, 3, 0, 0, 3]
    assert list(out.n_sentences) == [2, 2, 1, 0, 0, 1]
    # syllables: vowel groups + vowelless words
    #  t0: the(1) cat(1) sat.(1) it(1) purred!(2: u, e) -> 6 groups... check:
    #  lowercase "the cat sat. it purred!": e,a,a,i,u,e = 6 groups; vowelless 0
    #  t1: "hmm... brr pfft" -> 0 groups, 3 vowelless -> 3
    #  t5: "a.b ends mid.word": groups a,e,i,o = 4; vowelless 0
    assert list(out.n_syllables) == [6, 3, 6, 0, 0, 4]
