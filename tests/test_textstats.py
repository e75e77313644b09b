

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
