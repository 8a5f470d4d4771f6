"""robots.txt (RFC 9309 Robots Exclusion Protocol) parsing and
URL filtering — the crawl-politeness gate between
:func:`logray.functions.urlops.extract_links` and the frontier.

Semantics implemented (RFC 9309 §2):

- ``User-agent`` groups; a group matches our agent token
  case-insensitively, ``*`` is the fallback group; consecutive
  user-agent lines share one rule group.
- ``Allow`` / ``Disallow`` path rules with ``*`` wildcards and the
  ``$`` end anchor; empty ``Disallow:`` means allow-all.
- Longest-match wins (by rule PATTERN length, the RFC's octet count);
  on a tie ``Allow`` wins.  No matching rule = allowed.

Scale shape: the robots corpus is per-HOST and small relative to the
URL stream (one file per host); rules compile ONCE on the driver into
per-host regex lists, broadcast via ``ray.put``, and the filter runs
as a task map that buckets each batch's URLs by host and applies that
host's few compiled patterns vectorized over the host's slice.
Unknown hosts pass (no robots.txt = allowed).

Reference anchor: the same role the reference's filter DSL plays for
log lines (`/root/reference/src/file_parsing/line_filter.hpp` predicates
gating the viewer stream) — a per-record admission rule compiled once
and applied to a stream.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

__all__ = ["parse_robots", "robots_allowed", "compile_robots_map",
           "robots_filter"]


def parse_robots(text: str, agent: str = "*") -> list[tuple[bool, str]]:
    """Extract the (allow, pattern) rules of the group governing
    ``agent``: the UNION of every group whose most-specific matching
    token governs us (RFC 9309 §2.2.1 — repeated ``User-agent`` blocks
    for the same token combine), falling back to the union of the
    ``*`` groups, else no rules.  Patterns are returned raw (with
    ``*`` / ``$`` intact), precedence-sorted by the caller."""
    agent = agent.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    in_agents = True
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agents:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
            in_agents = True
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_agents = False
            if key == "disallow" and val == "":
                continue  # empty Disallow = no rule (allow all)
            if val:
                cur_rules.append((key == "allow", val))
        else:
            in_agents = False  # crawl-delay / sitemap etc. end the UA run
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    def governs(a: str) -> bool:
        # RFC 9309 §2.2.1 product-token matching, implemented as the
        # reference (Google) parser does: the group's value must be a
        # case-insensitive PREFIX of the crawler's product token
        # ("googlebot" governs "googlebot-images"), NEVER raw substring
        # containment (a group named "bot" must not capture "turbotax",
        # nor "a" capture every agent containing an 'a').
        return a != "*" and bool(a) and agent.startswith(a)

    best_len = max((len(a) for agents, _ in groups for a in agents
                    if governs(a)), default=-1)
    if best_len >= 0:
        return [r for agents, rules in groups for r in rules
                if any(governs(a) and len(a) == best_len
                       for a in agents)]
    return [r for agents, rules in groups for r in rules
            if "*" in agents]


def _rule_regex(pattern: str) -> re.Pattern:
    """RFC 9309 pattern -> anchored regex: ``*`` = any run, trailing
    ``$`` = end-of-path, everything else literal."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    return re.compile("^" + ".*".join(parts) + ("$" if anchored else ""))


def compile_robots_map(robots: dict[str, str],
                       agent: str = "*") -> dict[str, list]:
    """{host: robots.txt text} -> {host: [(allow, pattern_len, regex)]
    sorted by precedence (pattern length DESC, allow first on ties)} —
    evaluation then takes the FIRST matching rule."""
    out = {}
    for host, text in robots.items():
        rules = [(allow, len(pat), _rule_regex(pat))
                 for allow, pat in parse_robots(text, agent)]
        rules.sort(key=lambda r: (-r[1], not r[0]))
        out[host.lower()] = rules
    return out


def robots_allowed(compiled: dict[str, list], host: str,
                   path: str) -> bool:
    rules = compiled.get(host.lower())
    if not rules:
        return True
    if not path:
        path = "/"
    for allow, _, rx in rules:
        if rx.match(path):
            return allow
    return True


# RFC 9309 matches over path + query (everything after the authority,
# fragment excluded) — NOT the bare path
_PATHQ_PAT = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^#]*)"


def robots_filter(ds, robots: dict[str, str], url_col: str = "url",
                  agent: str = "*", keep_blocked: bool = False):
    """Drop (or keep, with ``keep_blocked``) URLs a host's robots.txt
    disallows for ``agent``.  Rules compile once on the driver and
    broadcast; each batch buckets its URLs by host and evaluates each
    rule ONCE over that host's undecided slice (one compiled-regex pass
    per (host-in-batch, rule) — the rule count per host is tiny next
    to the URL stream).  Matching is over path+query per RFC 9309."""
    from logray.functions.urlops import _extract_str, host_array

    compiled = compile_robots_map(robots, agent)
    comp_ref = ray.put(compiled)

    def fil(t: pa.Table) -> pa.Table:
        comp = ray.get(comp_ref)
        arr = t[url_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        hosts = host_array(arr).to_numpy(zero_copy_only=False)
        paths = _extract_str(arr, _PATHQ_PAT).to_numpy(
            zero_copy_only=False)
        allowed = np.ones(len(hosts), np.bool_)
        order = np.argsort(hosts, kind="stable")
        sh = hosts[order]
        starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]]) \
            if len(sh) else np.zeros(0, np.int64)
        bounds = np.r_[starts, len(sh)]
        for i in range(len(starts)):
            lo, hi = bounds[i], bounds[i + 1]
            rules = comp.get(sh[lo])
            if not rules:
                continue
            idx = order[lo:hi]
            hp = [paths[j] or "/" for j in idx]
            undecided = np.ones(hi - lo, np.bool_)
            verdict = np.ones(hi - lo, np.bool_)
            for allow, _, rx in rules:
                live = np.flatnonzero(undecided)
                if not len(live):
                    break
                m = rx.match
                hit = np.fromiter((m(hp[j]) is not None for j in live),
                                  np.bool_, len(live))
                won = live[hit]
                verdict[won] = allow
                undecided[won] = False
            allowed[idx] = verdict
        mask = pa.array(~allowed if keep_blocked else allowed)
        return t.filter(mask)

    return ds.map_batches(fil, batch_format="pyarrow",
                          zero_copy_batch=True)
