"""URL operator tests: parse/normalize kernels vs the DuckDB twin on
adversarial URLs, domain quota vs a brute-force oracle, blocklist filter."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from logray.functions.urlops import (
    blocklist_filter,
    domain_quota,
    normalize_url_array,
    normalize_url_sql,
    parse_url_sql,
    parse_url_table,
    parse_urls,
    registered_domain_array,
)

EDGE_URLS = [
    "https://www.Example.COM:443/a/b/?utm=1#frag",
    "http://user:pw@news.bbc.CO.uk:80/story/123/",
    "https://sub.deep.host.org/path",
    "ftp://files.example.net/x.txt",
    "https://example.com",
    "http://single",
    "https://a.b.co.jp/q?x=1&y=2",
    "https://x.ac.uk:8080/p?a=#z",
    "https://WWW.ONLY.www/www/",
    "not a url at all",
    "",
    "https:///odd//path/",
    "https://x.com/p#sec?a=1",    # '?' inside fragment is NOT a query
    "http://h.com:443/x",          # 443 is not http's default port
    "https://h.com:80/x",          # 80 is not https's default port
    "https://a.com/p?first=1?second=2#f",  # query starts at FIRST '?'
]


def test_fragment_question_mark_is_not_query():
    t = pa.table({"url": pa.array(["https://x.com/p#sec?a=1",
                                   "https://a.com/p?first=1?second=2#f"])})
    got = parse_url_table(t).to_pandas()
    assert got["query"][0] == ""
    assert got["query"][1] == "first=1?second=2"


def test_default_port_strip_is_scheme_specific():
    norm = normalize_url_array(pa.array([
        "http://h.com:443/x", "https://h.com:80/x",
        "http://h.com:80/x", "https://h.com:443/x",
    ])).to_pylist()
    assert norm == ["http://h.com:443/x", "https://h.com:80/x",
                    "http://h.com/x", "https://h.com/x"]


def _oracle(urls):
    t = pa.table({"url": pa.array(urls, type=pa.string())})
    con = duckdb.connect()
    con.register("u", t)
    exprs = parse_url_sql("url")
    sql = (
        "SELECT "
        + ", ".join(f"{e} AS {k}" for k, e in exprs.items())
        + f", {normalize_url_sql('url')} AS url_norm FROM u"
    )
    return con.execute(sql).fetchdf()


def test_parse_and_normalize_match_duckdb_twin():
    t = pa.table({"url": pa.array(EDGE_URLS, type=pa.string())})
    got = parse_url_table(t).to_pandas()
    got["url_norm"] = normalize_url_array(t["url"]).to_pandas()
    want = _oracle(EDGE_URLS)
    for col in ["scheme", "host", "path", "query", "registered_domain", "url_norm"]:
        assert list(got[col]) == list(want[col]), col


def test_parse_semantics_pinned():
    t = pa.table({"url": pa.array(EDGE_URLS[:3], type=pa.string())})
    got = parse_url_table(t).to_pandas()
    # userinfo and port stripped, host lowercased
    assert got["host"][1] == "news.bbc.co.uk"
    # multi-part public suffix keeps three labels
    assert got["registered_domain"][1] == "bbc.co.uk"
    # plain suffix keeps two
    assert got["registered_domain"][2] == "host.org"
    # query excludes the fragment
    assert got["query"][0] == "utm=1"
    assert got["path"][0] == "/a/b/"


def test_normalize_semantics_pinned():
    norm = normalize_url_array(
        pa.array(["https://www.Example.COM:443/a/b/?utm=1#frag",
                  "https://example.com"])
    ).to_pylist()
    assert norm == ["https://example.com/a/b", "https://example.com"]


def test_registered_domain_fallback_short_host():
    doms = registered_domain_array(pa.array(["single", "a.b", "x.co.uk"]))
    assert doms.to_pylist() == ["single", "a.b", "x.co.uk"]


def test_parse_normalize_fuzz_vs_duckdb():
    """2000 randomized component-composed URLs (plus junk): every parsed
    field and the normalized form must match the DuckDB twin exactly."""
    import numpy as np

    rng = np.random.default_rng(17)
    schemes = ["http", "https", "ftp", "HTTPS", "s3+x"]
    users = ["", "u@", "a:b@", "%40@"]
    hosts = ["example.com", "WWW.Site.ORG", "a.b.co.uk", "single", "x.y.z.ac.jp",
             "127.0.0.1", "host-", ".lead", "trail."]
    ports = ["", ":80", ":443", ":8080", ":"]
    paths = ["", "/", "/a", "/a/b/", "//", "/%20x", "/?."]
    queries = ["", "?a=1", "?a=1&b=2", "??", "?#", "?a=1?b=2"]
    frags = ["", "#f", "#a?b", "##"]
    urls = []
    for _ in range(2000):
        urls.append(
            str(rng.choice(schemes)) + "://" + str(rng.choice(users))
            + str(rng.choice(hosts)) + str(rng.choice(ports))
            + str(rng.choice(paths)) + str(rng.choice(queries))
            + str(rng.choice(frags)))
    urls += ["", "no scheme", "://", "http:/one-slash", "a://", "http://"]
    t = pa.table({"url": pa.array(urls, type=pa.string())})
    got = parse_url_table(t).to_pandas()
    got["url_norm"] = normalize_url_array(t["url"]).to_pandas()
    want = _oracle(urls)
    for col in ["scheme", "host", "path", "query", "registered_domain",
                "url_norm"]:
        mism = [i for i in range(len(urls))
                if got[col][i] != want[col][i]]
        assert not mism, (col, [(urls[i], got[col][i], want[col][i])
                                for i in mism[:3]])


@pytest.fixture()
def url_docs(ray_session):
    import ray.data as rd

    rows = []
    for i in range(200):
        dom = f"site{i % 7}.{'co.uk' if i % 2 else 'com'}"
        rows.append({"doc_id": i, "url": f"https://www.{dom}/p/{i}"})
    return rd.from_items(rows)


def test_domain_quota_keeps_smallest_ids(url_docs):
    out = domain_quota(url_docs, id_col="doc_id", url_col="url",
                       max_per_domain=3, num_buckets=4).to_pandas()
    assert len(out) == 14 * 3  # 14 distinct domains x cap
    by_dom = out.groupby("registered_domain")["doc_id"].apply(list).to_dict()
    # brute-force oracle: 3 smallest ids per domain
    want: dict[str, list[int]] = {}
    for i in range(200):
        dom = f"site{i % 7}.{'co.uk' if i % 2 else 'com'}"
        want.setdefault(dom, []).append(i)
    for dom, ids in want.items():
        assert sorted(by_dom[dom]) == sorted(ids)[:3], dom


def test_domain_quota_narrow_equals_full(url_docs):
    full = domain_quota(url_docs, id_col="doc_id", url_col="url",
                        max_per_domain=3, num_buckets=4).to_pandas()
    narrow = domain_quota(url_docs, id_col="doc_id", url_col="url",
                          max_per_domain=3, num_buckets=4,
                          mode="narrow").to_pandas()
    cols = ["doc_id", "registered_domain"]
    assert full[cols].sort_values("doc_id", ignore_index=True).equals(
        narrow[cols].sort_values("doc_id", ignore_index=True))


def test_domain_quota_narrow_all_under_quota(ray_session):
    import ray.data as rd

    rows = [{"doc_id": i, "url": f"https://d{i}.com/x"} for i in range(20)]
    out = domain_quota(rd.from_items(rows), max_per_domain=5,
                       mode="narrow").to_pandas()
    assert sorted(out["doc_id"]) == list(range(20))  # nothing dropped


def test_domain_quota_narrow_exact_boundary(ray_session):
    """Domains with exactly cap rows keep everything; cap+1 loses one."""
    import ray.data as rd

    rows = [{"doc_id": i, "url": "https://a.com/x"} for i in range(3)]
    rows += [{"doc_id": 100 + i, "url": "https://b.com/x"} for i in range(4)]
    out = domain_quota(rd.from_items(rows), max_per_domain=3,
                       mode="narrow").to_pandas()
    assert sorted(out["doc_id"]) == [0, 1, 2, 100, 101, 102]


def test_domain_quota_max_domains_guard(url_docs):
    with pytest.raises(ValueError, match="max_domains"):
        domain_quota(url_docs, max_per_domain=1, mode="narrow",
                     max_domains=2).to_pandas()


def test_blocklist_filter_drops_only_blocked(url_docs):
    out = blocklist_filter(url_docs, ["site0.com", "site3.co.uk"]).to_pandas()
    doms = parse_urls(blocklist_filter(url_docs, ["site0.com", "site3.co.uk"]))
    assert "site0.com" not in set(doms.to_pandas()["registered_domain"])
    # site0.com appears for even i%7==0 -> i in {0,14,28,...}: i%2==0 path
    blocked_ids = {i for i in range(200)
                   if (i % 7 == 0 and i % 2 == 0) or (i % 7 == 3 and i % 2 == 1)}
    assert set(out["doc_id"]) == set(range(200)) - blocked_ids


def test_wordlist_filter_word_boundaries(ray_session):
    """Whole-word hits only: 'badly' is not 'bad'; CI matching; both
    modes vs the DuckDB twin."""
    import ray.data as rd

    from logray.functions.quality import wordlist_filter, wordlist_filter_sql

    texts = ["the Bad word", "clean text", "BAD, bad and badly",
             "embedded badword", "bad", ""]
    rows = [{"i": i, "text": s} for i, s in enumerate(texts)]
    ds = rd.from_items(rows)
    flag = wordlist_filter(ds, ["bad", "evil"], mode="flag").to_pandas() \
        .sort_values("i", ignore_index=True)
    assert list(flag["n_banned"]) == [1, 0, 2, 0, 1, 0]
    drop = wordlist_filter(ds, ["bad", "evil"], mode="drop").to_pandas()
    assert sorted(drop["i"]) == [1, 3, 5]
    con = duckdb.connect()
    con.register("d", pd.DataFrame(rows))
    want = con.execute(wordlist_filter_sql("d", ["bad", "evil"], mode="flag",
                                           cols="i")).fetchdf()
    assert list(flag["n_banned"]) == list(
        want.sort_values("i")["n_banned"])
    with pytest.raises(ValueError, match="empty word list"):
        wordlist_filter(ds, ["  "], mode="drop")


def test_blocklist_audit_mode(url_docs):
    kept = blocklist_filter(url_docs, ["site0.com"], keep_blocked=True).to_pandas()
    assert set(kept["doc_id"]) == {i for i in range(200)
                                   if i % 7 == 0 and i % 2 == 0}


def test_extract_links_matches_duckdb(ray_session):
    """Link harvesting: byte-exact vs the SQL twin running the SAME
    split algebra, including the nested-quote case where
    regexp_extract_all would answer differently, unclosed attrs,
    empty urls, src attributes, nulls and link-free docs."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from logray.functions.urlops import extract_links, extract_links_sql

    texts = [
        '<a href="http://a.com/x">x</a> <a HREF="https://b.org">b</a>',
        "no links", None,
        '<a href = "spaced">s</a> href="notattr',
        '<img src="i.png"> <a href="">e</a> <a href="q?a=1&b=2#f">q</a>',
        'href="unclosed',
        'href="x src="y"',   # split algebra picks the LAST-started attr
        "",
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = (extract_links(rd.from_arrow(t).repartition(3))
           .to_pandas().sort_values(["doc_id", "link_idx"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(extract_links_sql("documents")).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got[got["doc_id"] == 6]["url"].tolist() == ["y"]
    assert got[got["doc_id"] == 4]["url"].tolist() == ["i.png", "", "q?a=1&b=2#f"]
