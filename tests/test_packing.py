"""GPT-style sequence packing (swishray/ops/packing.py)."""

import pyarrow as pa


def test_pack_documents_exact_chunks(ray_session):
    import ray.data as rd
    from swishray.ops.packing import pack_documents
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "grp": pa.array([0, 0, 1, 1], pa.int64()),
        "text": pa.array(["a b c", "d e", "x", ""], pa.string())})
    out = pack_documents(rd.from_arrow(t), max_tokens=4,
                         group_col="grp").take_all()
    got = {(r["grp"], r["chunk_id"]): (r["n_tokens"], r["text"])
           for r in out}
    # grp0 stream: a b c <|eod|> d e <|eod|>  -> [4, 3]
    assert got[(0, 0)] == (4, "a b c <|eod|>")
    assert got[(0, 1)] == (3, "d e <|eod|>")
    # grp1 stream: x <|eod|> <|eod|> (empty doc still emits its eod)
    assert got[(1, 0)] == (3, "x <|eod|> <|eod|>")
    assert len(got) == 3


def test_pack_documents_parallelism_invariant(ray_session):
    """Same output at 1 block and many blocks (packing is group-
    defined, not block-defined)."""
    import ray.data as rd
    from swishray.ops.packing import pack_documents
    t = pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "grp": pa.array([i % 4 for i in range(40)], pa.int64()),
        "text": pa.array([f"w{i} w{i} w{i}" for i in range(40)],
                         pa.string())})
    a = sorted((r["grp"], r["chunk_id"], r["n_tokens"], r["text"])
               for r in pack_documents(rd.from_arrow(t), 7,
                                       "grp").take_all())
    many = rd.from_arrow(t).repartition(13)
    b = sorted((r["grp"], r["chunk_id"], r["n_tokens"], r["text"])
               for r in pack_documents(many, 7, "grp").take_all())
    assert a == b
    # every non-final chunk is exactly full
    per_grp_max = {}
    for grp, ci, n, _ in a:
        per_grp_max[grp] = max(per_grp_max.get(grp, -1), ci)
    for grp, ci, n, _ in a:
        if ci < per_grp_max[grp]:
            assert n == 7
