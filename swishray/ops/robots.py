"""robots.txt parsing and crawl-permission filtering.

The last frontier component next to sitemaps/canonicalize/blocklist:
given fetched ``robots.txt`` bodies per host, decide which candidate
URLs a polite crawler may fetch.  Semantics follow the public REP
spec (RFC 9309 + the original robotstxt.org conventions):

* directives grouped under ``User-agent`` lines; the group whose
  agent token is the LONGEST substring match of our agent wins,
  ``*`` is the fallback group (RFC 9309 §2.2.1);
* ``Allow`` / ``Disallow`` with path patterns; ``*`` matches any
  char run, a trailing ``$`` anchors the end (§2.2.2-2.2.3);
* the MOST SPECIFIC (longest-pattern) matching rule decides; on an
  allow/disallow tie, allow wins (§2.2.2);
* an empty ``Disallow:`` means allow-all; a missing robots.txt means
  allow-all.

Scale shape: robots bodies are tiny (parse cap 500 KiB per RFC 9309
§2.4) and one-per-host, so the rule table is bounded by the crawl's
host universe — it broadcasts once via ``ray.put`` per run.  Per
batch the filter extracts host+path with one vectorized RE2 pass,
groups rows by host, and walks each host's ordered rule list with
``pc.match_substring_regex`` over that host's path subarray (rules
per host are tens, not thousands) — no per-URL Python regex loop.
URLs never ride a shuffle.
"""
from __future__ import annotations

import re
from typing import Any

import numpy as np
import pyarrow as pa

MAX_ROBOTS_BYTES = 512 * 1024  # RFC 9309 §2.4 parse cap


def _pattern_re2(pattern: str) -> str:
    """REP path pattern -> anchored RE2 string: ``*`` -> ``.*``,
    trailing ``$`` -> end anchor, everything else literal.
    (re.escape output is RE2-compatible: it only escapes
    punctuation.)"""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    return "^" + ".*".join(parts) + ("$" if anchored else "")


def compile_robots(body: bytes | str | None,
                   agent: str = "*") -> list[tuple[bool, int, str]]:
    """Parse one robots.txt into an ordered decision list
    ``[(allow, pattern_len, re2_pattern)]``, most specific first,
    for ``agent`` (longest-substring-match group selection, ``*``
    fallback).  Empty/missing body -> [] (allow-all)."""
    if body is None:
        return []
    if isinstance(body, bytes):
        body = body[:MAX_ROBOTS_BYTES].decode("utf-8", "replace")
    agent_l = agent.lower()

    groups: list[tuple[str, list[tuple[bool, str]]]] = []
    cur_rules: list[tuple[bool, str]] | None = None
    in_agent_run = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            # consecutive User-agent lines share one rule group
            if not in_agent_run:
                cur_rules = []
            in_agent_run = True
            groups.append((value.lower(), cur_rules))
        elif field in ("allow", "disallow"):
            in_agent_run = False
            if cur_rules is None:
                continue  # rules before any user-agent line: ignored
            if value == "":
                continue  # empty pattern matches nothing
            cur_rules.append((field == "allow", value))
        else:
            in_agent_run = False  # crawl-delay / sitemap / unknown

    # longest-substring-match group selection; '*' fallback
    best: list[tuple[bool, str]] | None = None
    best_len = -1
    for a, rules in groups:
        if a == "*":
            if best_len < 0 and best is None:
                best = rules
        elif a in agent_l and len(a) > best_len:
            best, best_len = rules, len(a)
    if best is None:
        return []
    out = [(allow, len(pat), _pattern_re2(pat))
           for allow, pat in best]
    # most specific first; allow wins ties (sort is stable)
    out.sort(key=lambda r: (-r[1], not r[0]))
    return out


def robots_allowed(rules: list, path: str) -> bool:
    """Longest-match REP decision for one path; default allow.
    (Scalar convenience; the batch stage matches vectorized.)"""
    for allow, _, pat in rules:
        if re.match(pat, path):
            return allow
    return True


# path capture includes the query string: REP patterns match against
# path+query (e.g. Google's documented "Disallow: /*?" idiom)
_HOSTPATH_RE = (r"^[A-Za-z][A-Za-z0-9+.-]*://"
                r"(?P<h>[^/?#]*)(?P<p>[^#]*)")


class RobotsFilter:
    """Actor stage: annotate/filter URL rows by REP permission.

    ``ref`` is a ray.put of {host: robots_body}; rules are parsed
    once per actor here, not per batch."""

    def __init__(self, ref, url_col: str, agent: str,
                 keep_only: bool) -> None:
        import ray
        self.url_col = url_col
        self.keep_only = keep_only
        bodies = ray.get(ref)
        self.rules = {h.lower(): compile_robots(b, agent)
                      for h, b in bodies.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        c = batch.column(self.url_col)
        if pa.types.is_null(c.type):
            c = c.cast(pa.large_string())
        u = pc.coalesce(pc.cast(c, pa.large_string()), "")
        ext = pc.extract_regex(u, _HOSTPATH_RE)
        host = pc.utf8_lower(pc.coalesce(
            pc.struct_field(ext, "h"), ""))
        host = pc.replace_substring_regex(host, r"^[^@]*@", "")
        host = pc.replace_substring_regex(host, r":[0-9]*$", "")
        path = pc.coalesce(pc.struct_field(ext, "p"), "")
        path = pc.if_else(pc.equal(path, ""), "/", path) \
            .combine_chunks()
        hosts_np = host.to_numpy(zero_copy_only=False)
        allowed = np.ones(len(batch), dtype=bool)
        for h in np.unique(hosts_np):
            rules = self.rules.get(h)
            if not rules:
                continue
            idx = np.flatnonzero(hosts_np == h)
            sub = path.take(pa.array(idx))
            undecided = np.ones(len(idx), dtype=bool)
            verdict = np.ones(len(idx), dtype=bool)
            for allow, _, pat in rules:
                if not undecided.any():
                    break
                m = pc.match_substring_regex(sub, pat) \
                    .to_numpy(zero_copy_only=False)
                hit = m & undecided
                verdict[hit] = allow
                undecided &= ~m
            allowed[idx] = verdict
        if self.keep_only:
            return batch.filter(pa.array(allowed))
        return batch.append_column("robots_allowed",
                                   pa.array(allowed))


def robots_filter(ds: Any, robots: Any, url_col: str = "url",
                  host_col: str = "host", body_col: str = "body",
                  agent: str = "*", keep_only: bool = False,
                  concurrency=None, batch_size: int = 4096) -> Any:
    """Filter/annotate a URL Dataset by robots.txt permission.

    ``robots``: a pyarrow Table — or a small Dataset, materialized
    here — of (host, body): one robots.txt per host, bounded by the
    crawl's host universe; broadcast once (``ray.put``), never
    joined.  With ``keep_only=True`` disallowed rows are dropped;
    otherwise a boolean ``robots_allowed`` column is appended."""
    import ray

    from ..util import map_batches_stateful

    if not isinstance(robots, pa.Table):
        robots = pa.Table.from_pylist(robots.take_all())
    hosts = robots.column(host_col).to_pylist()
    bodies = robots.column(body_col).to_pylist()
    ref = ray.put(dict(zip(hosts, bodies)))
    return map_batches_stateful(
        ds, RobotsFilter,
        fn_constructor_kwargs=dict(ref=ref, url_col=url_col,
                                   agent=agent, keep_only=keep_only),
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size, force_tasks=concurrency is None)
