"""robots.txt parsing + filtering (logray/functions/robots.py):
RFC 9309 semantics, conformance vs the stdlib parser on the
wildcard-free subset, and the vectorized Dataset filter."""

from __future__ import annotations

import urllib.robotparser

import numpy as np
import pyarrow as pa
import pytest

from logray.functions.robots import (compile_robots_map, parse_robots,
                                     robots_allowed)

SIMPLE = """
# comment
User-agent: *
Disallow: /private/
Disallow: /tmp
Allow: /private/ok
"""

GROUPED = """
User-agent: googlebot
User-agent: bingbot
Disallow: /no-search/

User-agent: *
Disallow: /no-anyone/
"""

WILD = """
User-agent: *
Disallow: /*.pdf$
Disallow: /a/*/secret
Allow: /a/public/secret
"""


def _stdlib_allows(txt: str, agent: str, url: str) -> bool:
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(txt.splitlines())
    return rp.can_fetch(agent, url)


@pytest.mark.parametrize("path,want,stdlib_agrees", [
    ("/", True, True),
    ("/private/", False, True),
    ("/private/x", False, True),
    # RFC 9309 longest-match: the longer Allow /private/ok wins over
    # Disallow /private/ — urllib.robotparser implements the legacy
    # 1994 first-match rule and (non-conformantly) says False here
    ("/private/ok", True, False),
    ("/tmp", False, True),
    ("/tmpfoo", False, True),     # prefix rule
    ("/temp", True, True),
])
def test_simple_matches_stdlib(path, want, stdlib_agrees):
    comp = compile_robots_map({"h": SIMPLE})
    got = robots_allowed(comp, "h", path)
    assert got == want
    if stdlib_agrees:
        assert got == _stdlib_allows(SIMPLE, "mybot", f"https://h{path}")


def test_group_selection():
    comp_g = compile_robots_map({"h": GROUPED}, agent="googlebot")
    comp_o = compile_robots_map({"h": GROUPED}, agent="otherbot")
    assert not robots_allowed(comp_g, "h", "/no-search/x")
    assert robots_allowed(comp_g, "h", "/no-anyone/x")  # specific group wins
    assert robots_allowed(comp_o, "h", "/no-search/x")
    assert not robots_allowed(comp_o, "h", "/no-anyone/x")


def test_wildcards_and_anchor():
    comp = compile_robots_map({"h": WILD})
    assert not robots_allowed(comp, "h", "/docs/file.pdf")
    assert robots_allowed(comp, "h", "/docs/file.pdfx")  # $ anchored
    assert not robots_allowed(comp, "h", "/a/x/secret")
    assert not robots_allowed(comp, "h", "/a/x/y/secrets")
    assert robots_allowed(comp, "h", "/a/public/secret")  # longer Allow


def test_empty_disallow_and_unknown_host():
    comp = compile_robots_map({"h": "User-agent: *\nDisallow:\n"})
    assert robots_allowed(comp, "h", "/anything")
    assert robots_allowed(comp, "unknown.example", "/x")


def test_allow_wins_tie():
    txt = "User-agent: *\nDisallow: /dir/\nAllow: /dir2/\n"
    comp = compile_robots_map({"h": txt})
    # equal-length tie is synthetic here; check deterministic allow-first
    tie = "User-agent: *\nDisallow: /x\nAllow: /x\n"
    comp2 = compile_robots_map({"h": tie})
    assert robots_allowed(comp2, "h", "/x")


def test_parse_robots_agent_substring():
    txt = "User-agent: foo\nDisallow: /f/\n\nUser-agent: *\nDisallow: /g/\n"
    assert parse_robots(txt, "foobot") == [(False, "/f/")]
    assert parse_robots(txt, "barbot") == [(False, "/g/")]


def test_robots_filter_dataset(ray_session):
    import ray.data as rd

    from logray.functions.robots import robots_filter

    urls = [
        "https://a.com/keep",
        "https://a.com/private/x",
        "https://a.com/private/ok",
        "https://b.com/private/x",      # no robots for b.com -> pass
        "https://A.COM:8080/private/y",  # case/port-insensitive host
    ]
    ds = rd.from_arrow(pa.table({
        "url": pa.array(urls),
        "doc_id": pa.array(np.arange(5, dtype=np.int64))}))
    out = robots_filter(ds, {"a.com": SIMPLE}).to_pandas()
    assert sorted(out["doc_id"]) == [0, 2, 3]
    blocked = robots_filter(ds, {"a.com": SIMPLE},
                            keep_blocked=True).to_pandas()
    assert sorted(blocked["doc_id"]) == [1, 4]


def test_robots_filter_fuzz_vs_stdlib(ray_session):
    """Random wildcard-free rule sets: the Dataset filter agrees with
    urllib.robotparser URL-for-URL."""
    import ray.data as rd

    from logray.functions.robots import robots_filter

    rng = np.random.default_rng(7)
    segs = ["a", "b", "c", "dd", "e/f"]
    rules = []
    for s in rng.choice(segs, 4, replace=False):
        rules.append(("Allow" if rng.random() < 0.4 else "Disallow",
                      f"/{s}"))
    txt = "User-agent: *\n" + "\n".join(f"{k}: {v}" for k, v in rules)
    paths = [f"/{a}/{b}" for a in segs for b in segs] + \
        [f"/{s}" for s in segs] + ["/", "/zz"]
    urls = [f"https://h.example{p}" for p in paths]
    ds = rd.from_arrow(pa.table({"url": pa.array(urls)}))
    got = set(robots_filter(ds, {"h.example": txt})
              .to_pandas()["url"])
    for u in urls:
        assert (u in got) == _stdlib_allows(txt, "x", u), (u, txt)


def test_query_string_rules(ray_session):
    """RFC 9309 matching is over path+query — a 'Disallow: /search?q='
    rule must block matching URLs (stdlib parser agrees here)."""
    import ray.data as rd

    from logray.functions.robots import robots_filter

    txt = "User-agent: *\nDisallow: /search?q=\nDisallow: /*?sessionid=\n"
    urls = ["https://h/search?q=x", "https://h/search", "https://h/ok",
            "https://h/page?sessionid=5", "https://h/page?id=5"]
    ds = rd.from_arrow(pa.table({"url": pa.array(urls)}))
    got = sorted(robots_filter(ds, {"h": txt}).to_pandas()["url"])
    assert got == ["https://h/ok", "https://h/page?id=5",
                   "https://h/search"]
    # stdlib parser has no * wildcard support — cross-check only the
    # literal query rule
    for u in urls[:3]:
        assert (u in got) == _stdlib_allows(txt, "x", u)


def test_repeated_groups_union():
    """Repeated User-agent blocks for the same token combine
    (RFC 9309 §2.2.1) — rules after the first block are not dropped."""
    txt = ("User-agent: *\nDisallow: /a\n\n"
           "User-agent: *\nDisallow: /b\n")
    comp = compile_robots_map({"h": txt})
    assert not robots_allowed(comp, "h", "/a")
    assert not robots_allowed(comp, "h", "/b")
    assert robots_allowed(comp, "h", "/c")
    # same for a named token
    txt2 = ("User-agent: foo\nDisallow: /f1\n\n"
            "User-agent: foo\nDisallow: /f2\n\n"
            "User-agent: *\nDisallow: /g\n")
    assert sorted(parse_robots(txt2, "foobot")) == [(False, "/f1"),
                                                    (False, "/f2")]


def test_agent_matching_is_prefix_not_substring():
    """RFC 9309 product-token matching (reference-parser prefix
    semantics): a short group token buried INSIDE an agent name must
    not govern it."""
    txt = ("User-agent: bot\nDisallow: /b/\n\n"
           "User-agent: a\nDisallow: /a/\n\n"
           "User-agent: *\nDisallow: /star/\n")
    # 'turbotax' contains 'bot' and 'a' but is prefixed by neither
    assert parse_robots(txt, "turbotax") == [(False, "/star/")]
    # prefix DOES govern, most-specific (longest) wins
    assert parse_robots(txt, "botify") == [(False, "/b/")]
    assert parse_robots(txt, "a") == [(False, "/a/")]
