"""Crawl-snapshot delta (ops/crawl.py): added / removed / changed /
unchanged classification via slim fingerprints + full-outer join."""
import pyarrow as pa
import ray.data as rd

from swishray.ops.crawl import snapshot_delta


def _snap(rows):
    return rd.from_arrow(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "content": pa.array([r[1] for r in rows], pa.binary())})) \
        .repartition(2)


def test_snapshot_delta_statuses(ray_session):
    old = _snap([("u1", b"same"), ("u2", b"before"), ("u3", b"gone")])
    new = _snap([("u1", b"same"), ("u2", b"after"), ("u4", b"fresh")])
    out = snapshot_delta(old, new).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert out["url"].tolist() == ["u1", "u2", "u3", "u4"]
    assert out["status"].tolist() == [
        "unchanged", "changed", "removed", "added"]


def test_snapshot_delta_null_body_is_empty(ray_session):
    # null bodies fingerprint as empty — present-with-null is a real
    # row (status derives from presence), not a phantom "added"
    old = _snap([("u1", None), ("u2", b"x")])
    new = _snap([("u1", b""), ("u2", None)])
    out = snapshot_delta(old, new).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert out["status"].tolist() == ["unchanged", "changed"]


def test_snapshot_delta_empty_sides(ray_session):
    empty = _snap([]).filter(lambda r: True)
    new = _snap([("u1", b"a")])
    out = snapshot_delta(empty, new).to_pandas()
    assert out["status"].tolist() == ["added"]
    out2 = snapshot_delta(new, empty).to_pandas()
    assert out2["status"].tolist() == ["removed"]


def test_parse_cdxj(ray_session):
    import ray.data as rd
    from swishray.ops.crawl import parse_cdxj
    lines = [
        'com,example)/p 20240101120000 {"url": "https://example.com/p",'
        ' "status": "200", "mime": "text/html", "digest": "AAA",'
        ' "length": "1234", "offset": "5678",'
        ' "filename": "crawl-00.warc.gz"}',
        # revisit record: status "-" -> null int
        'com,example)/q 20240102000000 {"url": "https://example.com/q",'
        ' "status": "-", "mime": "warc/revisit", "digest": "BBB"}',
        'garbage-no-json-here',
        'com,example)/r 20240103000000 {not json',
    ]
    out = parse_cdxj(rd.from_items([{"text": ln} for ln in lines])
                     .repartition(2)).to_pandas()
    out = out.sort_values("urlkey", na_position="last") \
        .reset_index(drop=True)
    good = out[out["urlkey"] == "com,example)/p"].iloc[0]
    assert good["status"] == 200 and good["length"] == 1234
    assert good["filename"] == "crawl-00.warc.gz"
    rev = out[out["urlkey"] == "com,example)/q"].iloc[0]
    assert rev["mime"] == "warc/revisit"
    import pandas as pd
    assert pd.isna(rev["status"])
    bad = out[out["urlkey"] == "com,example)/r"].iloc[0]
    assert pd.isna(bad["url"])   # bad JSON -> null payload fields
    assert len(out) == 4         # garbage line still yields a row
