"""End-to-end crawl-frontier assembly (ops/frontier.py): harvest ->
canonicalize -> robots -> blocklist -> dedup/count -> per-site cap."""
import pyarrow as pa
import ray.data as rd

from swishray.ops.frontier import build_frontier


def _pages():
    def page(url, *hrefs):
        body = "".join(h if h.startswith("<") else f'<a href="{h}">x</a>'
                       for h in hrefs)
        return {"url": url, "html": f"<body>{body}</body>".encode()}
    return [
        page("https://a.example/p1",
             "https://T.example:443/keep#frag",       # canonicalizes
             "https://t.example/keep",                # dup after canon
             '<a href="https://t.example/nf" rel="nofollow">n</a>',
             '<img src="https://t.example/img.png">',  # not an <a>
             "https://blocked.example/x",              # blocklisted
             "https://t.example/private/secret"),      # robots-denied
        page("https://b.example/p2",
             "https://t.example/keep",                 # 3rd ref
             "https://cap.example/c1",
             "https://cap.example/c2",
             "https://cap.example/c3"),
    ]


ROBOTS = pa.table({"host": ["t.example"],
                   "body": [b"User-agent: *\nDisallow: /private\n"]})


def test_build_frontier_end_to_end(ray_session):
    ds = rd.from_items(_pages()).repartition(2)
    out = build_frontier(ds, robots=ROBOTS,
                         blocklist=["blocked.example"],
                         per_site_cap=2).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert out["url"].tolist() == [
        "https://cap.example/c1",   # c3 lost to the per-site cap of 2
        "https://cap.example/c2",
        "https://t.example/keep",
    ]
    got = dict(zip(out["url"], out["n_refs"]))
    # fragment-stripped dup + second page's ref collapse to one row
    assert got["https://t.example/keep"] == 3
    assert out["site"].tolist() == ["cap.example", "cap.example",
                                    "t.example"]


def test_build_frontier_minimal(ray_session):
    # no robots/blocklist/cap: plain harvest + dedup; nofollow kept
    # when asked
    ds = rd.from_items(_pages()).repartition(2)
    out = build_frontier(ds, include_nofollow=True).to_pandas()
    urls = set(out["url"])
    assert "https://t.example/nf" in urls
    assert "https://t.example/private/secret" in urls  # no robots
    assert "https://blocked.example/x" in urls          # no blocklist
    assert "https://t.example/img.png" not in urls      # <img> never
