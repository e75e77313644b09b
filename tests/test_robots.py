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
