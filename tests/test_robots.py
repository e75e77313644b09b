"""robots.txt REP semantics (ops/robots.py): RFC 9309 group
selection, longest-match precedence, wildcards, and the Ray filter
stage; also oracle-checked by the queries() robots_filter entry."""
import pyarrow as pa
import ray.data as rd

from swishray.ops.robots import (compile_robots, robots_allowed,
                                 robots_filter)

BODY = b"""
# comment
User-agent: googlebot
Disallow: /g

User-agent: *
Allow: /page
Disallow: /p
Disallow: /*.php$
Disallow: /q*?
Allow:
"""


def _ok(body, path, agent="testbot"):
    return robots_allowed(compile_robots(body, agent), path)


def test_longest_match_and_tie():
    # /page (Allow, len 5) beats /p (Disallow, len 2)
    assert _ok(BODY, "/page")
    assert _ok(BODY, "/pagex/y")
    assert not _ok(BODY, "/pz")
    # tie: allow wins
    tie = b"User-agent: *\nAllow: /f\nDisallow: /f\n"
    assert _ok(tie, "/f/x")
    # default allow; empty Allow ignored
    assert _ok(BODY, "/other")


def test_wildcards_and_anchors():
    assert not _ok(BODY, "/a.php")          # /*.php$ anchors end
    assert _ok(BODY, "/a.php?x=1")          # query defeats $ anchor
    assert not _ok(BODY, "/q1?x=1")         # /q*? needs a query
    assert _ok(BODY, "/q1")


def test_agent_group_selection():
    assert not _ok(BODY, "/g", agent="Googlebot/2.1")
    assert _ok(BODY, "/p", agent="Googlebot/2.1")  # other group's rule
    # star fallback for unknown agents
    assert not _ok(BODY, "/p", agent="unknown")
    # missing/None body: allow-all
    assert _ok(None, "/anything")
    assert _ok(b"", "/anything")


def test_robots_filter_stage(ray_session):
    robots = pa.table({
        "host": ["a.example", "b.example"],
        "body": [b"User-agent: *\nDisallow: /private\n",
                 b"User-agent: *\nDisallow: /\nAllow: /ok\n"]})
    urls = [
        "https://a.example/private/x",    # blocked
        "https://A.EXAMPLE:8080/public",  # allowed (case/port)
        "https://b.example/ok/page",      # allow carve-out
        "https://b.example/no",           # blocked
        "https://c.example/anything",     # no robots: allowed
        None,
    ]
    ds = rd.from_items([{"url": u} for u in urls]).repartition(2)
    df = robots_filter(ds, robots).to_pandas()
    got = dict(zip(df["url"], df["robots_allowed"]))
    assert got["https://a.example/private/x"] == False  # noqa: E712
    assert got["https://A.EXAMPLE:8080/public"] == True  # noqa: E712
    assert got["https://b.example/ok/page"] == True  # noqa: E712
    assert got["https://b.example/no"] == False  # noqa: E712
    assert got["https://c.example/anything"] == True  # noqa: E712
    # keep_only drops the blocked rows
    kept = robots_filter(ds, robots, keep_only=True).to_pandas()
    assert len(kept) == 4  # 3 allowed + the null url row


def _mk_urls_ds(urls):
    return rd.from_items([{"rid": i, "url": u}
                          for i, u in enumerate(urls)]).repartition(2)


def test_robots_filter_join_mode_matches_broadcast(ray_session):
    robots = pa.table({
        "host": ["a.example", "b.example", "c.example"],
        "body": [b"User-agent: *\nDisallow: /private\n",
                 b"User-agent: *\nDisallow: /\nAllow: /ok\n",
                 b"User-agent: *\nDisallow:\n"]})  # allow-all body
    urls = [
        "https://a.example/private/x",
        "https://A.EXAMPLE:8080/public",
        "https://b.example/ok/page",
        "https://b.example/no",
        "https://c.example/anything",
        "https://d.example/unlisted",
        None,
    ]
    want = robots_filter(_mk_urls_ds(urls), robots).to_pandas() \
        .sort_values("rid").reset_index(drop=True)
    got = robots_filter(_mk_urls_ds(urls), robots, key="rid",
                        mode="join").to_pandas() \
        .sort_values("rid").reset_index(drop=True)
    assert want[["rid", "robots_allowed"]].equals(
        got[["rid", "robots_allowed"]])
    # keep_only parity too
    kb = robots_filter(_mk_urls_ds(urls), robots,
                       keep_only=True).to_pandas()
    kj = robots_filter(_mk_urls_ds(urls), robots, key="rid",
                       mode="join", keep_only=True).to_pandas()
    assert sorted(kb["rid"]) == sorted(kj["rid"])


def test_robots_filter_auto_switches_past_broadcast_cap(ray_session):
    """A host universe larger than broadcast_max_hosts must route to
    the join path (and produce the same verdicts) — the 10^8-host
    crawl contract: the driver never materializes the robots table."""
    n_hosts = 50
    robots = pa.table({
        "host": [f"h{i}.example" for i in range(n_hosts)],
        "body": [(b"User-agent: *\nDisallow: /secret\n" if i % 2
                  else b"") for i in range(n_hosts)]})
    urls = [f"https://h{i % n_hosts}.example/"
            f"{'secret/x' if i % 3 == 0 else 'open/y'}"
            for i in range(200)]
    # cap of 10 forces the join path in auto mode
    out = robots_filter(_mk_urls_ds(urls), rd.from_arrow(robots),
                        key="rid", mode="auto",
                        broadcast_max_hosts=10).to_pandas()
    out = out.sort_values("rid").reset_index(drop=True)
    for i, u in enumerate(urls):
        host_i = i % n_hosts
        blocked = (host_i % 2 == 1) and (i % 3 == 0)
        assert bool(out.loc[i, "robots_allowed"]) == (not blocked), u


def test_robots_filter_join_all_allowed_empty_blocked(ray_session):
    # zero disallowed rows -> blocked side all-empty (the Ray 2.49
    # schema-less trap) — must still return every row as allowed
    robots = pa.table({"host": ["a.example"],
                       "body": [b"User-agent: *\nDisallow: /none\n"]})
    urls = ["https://a.example/fine", "https://b.example/x"]
    out = robots_filter(_mk_urls_ds(urls), robots, key="rid",
                        mode="join").to_pandas()
    assert out["robots_allowed"].all() and len(out) == 2


def test_robots_filter_join_string_keys(ray_session):
    # key-type agnosticism (the r2 ADVICE int64-hardcode class)
    robots = pa.table({"host": ["a.example"],
                       "body": [b"User-agent: *\nDisallow: /no\n"]})
    ds = rd.from_items([
        {"rid": "k1", "url": "https://a.example/no/x"},
        {"rid": "k2", "url": "https://a.example/yes"}]).repartition(2)
    out = robots_filter(ds, robots, key="rid", mode="join").to_pandas()
    got = dict(zip(out["rid"], out["robots_allowed"]))
    assert got == {"k1": False, "k2": True}
