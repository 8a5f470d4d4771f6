"""URL operators for web-scale corpus curation: parse, normalize,
registered-domain extraction, per-domain quotas and blocklist filtering.

Web-crawl pipelines (C4, RefinedWeb, Gopher) treat the document URL as a
first-class curation key: normalize it, extract the registered domain,
cap documents per domain ("domain balancing") and drop blocklisted
hosts.  Every kernel here is pure Arrow compute (RE2 extraction + string
algebra) — zero Python per row, fuses into the upstream read — and each
has an exact DuckDB string-function twin (``*_sql`` helpers) so the
driver gate verifies values bit-for-bit.

Semantics (shared by the Arrow and SQL paths, applied in this order):

* ``normalize_url``: lowercase scheme+host, strip a ``www.`` prefix,
  strip default ports (``:80`` for http, ``:443`` for https), drop the
  fragment, drop the query string entirely (tracking-safe superset of
  utm-stripping), strip one trailing ``/`` from a non-root path.
* ``host_of``: the authority between ``://`` and the first ``/ ? #``,
  ports removed, lowercased.
* ``registered_domain``: last two host labels, or last three when the
  penultimate label is a known multi-part public suffix (``co``, ``com``,
  ``net``, ``org``, ``gov``, ``ac``, ``edu`` — the heuristic core of the
  public-suffix list; swap in the full PSL as a broadcast table when the
  real list ships with the job).

The reference engine's closest surface is typed field extraction from a
formatted line (``src/line_parsing/parsing_basics.cpp`` STR stop-mode
slicing); a URL is one more line format whose fields are scheme, host,
path, query.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Heuristic multi-part public-suffix middles: host `a.b.SUF.tld` has
# registered domain `b.SUF.tld` when SUF is one of these.
MULTIPART_SUFFIX_MIDDLES = ("co", "com", "net", "org", "gov", "ac", "edu")

# RE2 pieces (no lookaround; identical in Arrow and DuckDB).
_HOST_PAT = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]+)"
_SCHEME_PAT = r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://"
_PATH_PAT = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)"
# query starts at the FIRST '?' before any '#' (RFC 3986); the prefix
# class excludes both so no '?' inside a fragment can match
_QUERY_PAT = r"^[^#?]*\?([^#]*)"


def _extract_str(arr, pat: str):
    """RE2 first-group extraction; non-matches -> empty string (DuckDB
    ``regexp_extract`` returns '' on miss, so the twin matches)."""
    st = pc.extract_regex(arr, pattern=pat.replace("(", "(?P<g>", 1))
    vals = pc.struct_field(st, "g")
    return pc.fill_null(vals, "")


def host_array(arr):
    """Lowercased authority host: between ``://`` and the first
    ``/ ? #``, userinfo and port stripped (Arrow twin of ``_host_sql``)."""
    host = pc.ascii_lower(_extract_str(arr, _HOST_PAT))
    host = pc.replace_substring_regex(host, pattern=r"^[^@]*@", replacement="")
    return pc.replace_substring_regex(host, pattern=r":[0-9]*$", replacement="")


def parse_url_table(t: pa.Table, col: str = "url") -> pa.Table:
    """Append scheme / host / path / query / registered_domain columns."""
    arr = t[col]
    scheme = pc.ascii_lower(_extract_str(arr, _SCHEME_PAT))
    host = host_array(arr)
    path = _extract_str(arr, _PATH_PAT)
    query = _extract_str(arr, _QUERY_PAT)
    dom = registered_domain_array(host)
    for name, a in [("scheme", scheme), ("host", host), ("path", path),
                    ("query", query), ("registered_domain", dom)]:
        if name in t.column_names:
            t = t.drop_columns([name])
        t = t.append_column(name, a)
    return t


def registered_domain_array(host):
    """Last-2-labels registered domain, last-3 for multi-part suffixes."""
    two = _extract_str(host, r"([^.]+\.[^.]+)$")
    three = _extract_str(host, r"([^.]+\.[^.]+\.[^.]+)$")
    mids = "|".join(MULTIPART_SUFFIX_MIDDLES)
    is_multi = pc.match_substring_regex(host, rf"[^.]+\.({mids})\.[^.]+$")
    # hosts with <2 labels fall back to the host itself
    dom = pc.if_else(is_multi, three, two)
    return pc.if_else(pc.equal(dom, ""), host, dom)


def normalize_url_array(arr):
    """Canonical URL form (see module docstring for the exact rules).
    Default ports are scheme-specific: ``:80`` only under http, ``:443``
    only under https — ``http://h:443`` is a distinct origin and stays."""
    scheme = pc.ascii_lower(_extract_str(arr, _SCHEME_PAT))
    host_raw = pc.ascii_lower(_extract_str(arr, _HOST_PAT))
    host = pc.replace_substring_regex(host_raw, pattern=r"^[^@]*@", replacement="")
    host = pc.replace_substring_regex(host, pattern=r"^www\.", replacement="")
    host = pc.if_else(
        pc.equal(scheme, "http"),
        pc.replace_substring_regex(host, pattern=":80$", replacement=""), host)
    host = pc.if_else(
        pc.equal(scheme, "https"),
        pc.replace_substring_regex(host, pattern=":443$", replacement=""), host)
    path = _extract_str(arr, _PATH_PAT)
    # strip one trailing slash from a non-root path
    path = pc.replace_substring_regex(path, pattern="^(.+?)/$", replacement=r"\1")
    return pc.binary_join_element_wise(scheme, "://", host, path, "")


def normalize_url_table(t: pa.Table, col: str = "url",
                        out_col: str = "url_norm") -> pa.Table:
    out = normalize_url_array(t[col])
    if out_col in t.column_names:
        t = t.drop_columns([out_col])
    return t.append_column(out_col, out)


def parse_urls(ds, col: str = "url"):
    """Dataset stage: append parsed URL component columns."""
    return ds.map_batches(lambda t: parse_url_table(t, col),
                          batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=None)


def normalize_urls(ds, col: str = "url", out_col: str = "url_norm"):
    return ds.map_batches(lambda t: normalize_url_table(t, col, out_col),
                          batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=None)


def blocklist_filter(ds, blocked_domains, col: str = "url", keep_blocked=False):
    """Drop rows whose registered domain is in ``blocked_domains``.

    The domain set is broadcast once per worker via the closure (tiny —
    blocklists are O(10^5) entries, single MBs); membership is one
    vectorized ``pc.is_in`` per batch.  ``keep_blocked=True`` inverts the
    mask (audit mode: what WOULD be dropped).
    """
    blocked = pa.array(sorted(set(blocked_domains)), type=pa.string())

    def _f(t: pa.Table) -> pa.Table:
        dom = registered_domain_array(host_array(t[col]))
        mask = pc.is_in(dom, value_set=blocked)
        if not keep_blocked:
            mask = pc.invert(mask)
        return t.filter(mask)

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=None)


def domain_quota(ds, id_col: str = "doc_id", url_col: str = "url",
                 max_per_domain: int = 10, num_buckets: int = 64,
                 mode: str = "full", max_domains: int = 50_000_000):
    """Cap documents per registered domain (RefinedWeb domain balancing).

    Deterministic keep rule: the ``max_per_domain`` smallest ``id_col``
    values per domain survive (ties impossible — ids are unique), so the
    output is reproducible run-to-run and has an exact SQL twin
    (``row_number() OVER (PARTITION BY domain ORDER BY id)``).

    Two plans:

    * ``mode="full"`` — ONE hash(domain)%B bucket shuffle of the FULL
      rows (the shared join/window pattern), then a vectorized
      per-bucket sort + segmented cumcount.  Right when rows are thin
      (ids + URLs); measured 132 s / 52.2M rows on the 16x smoke.
    * ``mode="narrow"`` — the 100 TB plan for fat documents: only the
      ``(domain, id)`` projection goes through the bucket shuffle; each
      bucket folds to one ``(domain, threshold)`` row where threshold =
      the ``max_per_domain``-th smallest id (ids unique, so
      ``id <= threshold`` IS the smallest-k rule); the tiny threshold
      table broadcasts and a second streaming pass filters row-locally
      — document bytes NEVER enter a shuffle.  Only domains holding
      more than ``max_per_domain`` rows need a threshold entry, so the
      broadcast is bounded by the number of OVER-QUOTA domains;
      ``max_domains`` guards the driver fold (raises past it — shard
      the threshold map via a bucketed join instead at that point).

    Both plans return identical rows (asserted in tests), with
    ``registered_domain`` appended.
    """
    from logray.stages.bucketing import grouped_apply
    import numpy as np

    def _with_domain(t: pa.Table) -> pa.Table:
        return t.append_column(
            "registered_domain",
            registered_domain_array(host_array(t[url_col])))

    tagged = ds.map_batches(_with_domain, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None)

    if mode == "narrow":
        sch = ds.schema()  # ray.data Schema: parallel names/types lists
        id_type = dict(zip(sch.names, sch.types)).get(id_col)
        if id_type is None or not pa.types.is_integer(id_type):
            raise ValueError(
                f"domain_quota narrow plan requires an integer id column "
                f"(got {id_col}: {id_type}); use mode='full' or map "
                "string ids to int64 first (functions.dedup string-id chain)")
        narrow = tagged.map_batches(
            lambda t: t.select([id_col, "registered_domain"]),
            batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

        def _thresholds(t: pa.Table) -> pa.Table:
            # per-domain (count > cap ? k-th smallest id : nothing)
            if t.num_rows == 0:
                return pa.table({"registered_domain": pa.array([], pa.string()),
                                 "__thr": pa.array([], pa.int64())})
            dom = t["registered_domain"].to_numpy(zero_copy_only=False)
            ids = t[id_col].to_numpy(zero_copy_only=False)
            order = np.lexsort((ids, dom))
            sdom, sids = dom[order], ids[order]
            new_seg = np.empty(len(sdom), dtype=bool)
            new_seg[0] = True
            new_seg[1:] = sdom[1:] != sdom[:-1]
            seg_start = np.maximum.accumulate(
                np.where(new_seg, np.arange(len(sdom)), 0))
            rank = np.arange(len(sdom)) - seg_start
            # the row at rank == cap-1 is the threshold; a domain with a
            # row at rank == cap is over quota and needs the entry
            at_thr = rank == max_per_domain - 1
            over = np.zeros(len(sdom), dtype=bool)
            over[seg_start[rank >= max_per_domain]] = True
            keep = at_thr & over[seg_start]
            return pa.table({
                "registered_domain": pa.array(sdom[keep].tolist(), pa.string()),
                "__thr": pa.array(sids[keep].tolist(), pa.int64()),
            })

        thr_ds = grouped_apply(narrow, "registered_domain", _thresholds,
                               num_buckets=num_buckets,
                               batch_format="pyarrow")
        # stream the threshold fold so the cap bounds driver memory —
        # stop pulling as soon as max_domains is exceeded, never
        # materialize an unbounded table first
        pieces, total = [], 0
        for chunk in thr_ds.iter_batches(batch_size=None,
                                         batch_format="pyarrow"):
            total += chunk.num_rows
            if total > max_domains:
                raise ValueError(
                    f"domain_quota narrow plan: over-quota domains exceed "
                    f"max_domains={max_domains}; raise the cap or shard "
                    "the threshold map via a bucketed join")
            pieces.append(chunk)
        if total == 0:          # no over-quota domain anywhere
            return tagged
        thr_tbl = pa.concat_tables(pieces)
        thr_doms = pa.array(thr_tbl["registered_domain"].to_pylist(),
                            pa.string())
        thr_vals = thr_tbl["__thr"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)

        def _filter(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            # vectorized broadcast lookup: absent domain -> keep all
            idx = pc.fill_null(
                pc.index_in(t["registered_domain"], value_set=thr_doms), -1
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            limits = np.where(
                idx >= 0, thr_vals[np.maximum(idx, 0)],
                np.iinfo(np.int64).max)
            ids = t[id_col].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids <= limits))

        return tagged.map_batches(_filter, batch_format="pyarrow",
                                  zero_copy_batch=True, batch_size=None)

    if mode != "full":
        raise ValueError(f"unknown domain_quota mode {mode!r}")

    def _cap(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        dom = t["registered_domain"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, dom))
        sdom = dom[order]
        # segmented cumcount over the domain-sorted rows
        new_seg = np.empty(len(sdom), dtype=bool)
        new_seg[0] = True
        new_seg[1:] = sdom[1:] != sdom[:-1]
        seg_start = np.maximum.accumulate(np.where(new_seg, np.arange(len(sdom)), 0))
        rank = np.arange(len(sdom)) - seg_start
        keep_sorted = order[rank < max_per_domain]
        keep_sorted.sort()
        return t.take(pa.array(keep_sorted))

    return grouped_apply(tagged, "registered_domain", _cap,
                         num_buckets=num_buckets, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------

def _host_sql(url: str) -> str:
    h = f"lower(regexp_extract({url}, '{_HOST_PAT}', 1))"
    h = f"regexp_replace({h}, '^[^@]*@', '')"
    return f"regexp_replace({h}, ':[0-9]*$', '')"


def registered_domain_sql(url: str) -> str:
    """DuckDB expression for the identical registered domain."""
    mids = "|".join(MULTIPART_SUFFIX_MIDDLES)
    h = _host_sql(url)
    return (
        "CASE WHEN regexp_matches(host_t, '[^.]+\\.(" + mids + ")\\.[^.]+$') "
        "THEN regexp_extract(host_t, '([^.]+\\.[^.]+\\.[^.]+)$', 1) "
        "WHEN regexp_extract(host_t, '([^.]+\\.[^.]+)$', 1) = '' THEN host_t "
        "ELSE regexp_extract(host_t, '([^.]+\\.[^.]+)$', 1) END"
    ).replace("host_t", f"({h})")


def parse_url_sql(url: str) -> dict[str, str]:
    """Column-name -> DuckDB expression matching ``parse_url_table``."""
    return {
        "scheme": f"lower(regexp_extract({url}, '{_SCHEME_PAT}', 1))",
        "host": _host_sql(url),
        "path": f"regexp_extract({url}, '{_PATH_PAT}', 1)",
        "query": f"regexp_extract({url}, '{_QUERY_PAT}', 1)",
        "registered_domain": registered_domain_sql(url),
    }


def normalize_url_sql(url: str) -> str:
    scheme = f"lower(regexp_extract({url}, '{_SCHEME_PAT}', 1))"
    h = f"lower(regexp_extract({url}, '{_HOST_PAT}', 1))"
    h = f"regexp_replace({h}, '^[^@]*@', '')"
    h = f"regexp_replace({h}, '^www\\.', '')"
    # scheme-specific default ports (http://h:443 is a distinct origin)
    h = (f"CASE WHEN {scheme} = 'http' THEN regexp_replace({h}, ':80$', '') "
         f"WHEN {scheme} = 'https' THEN regexp_replace({h}, ':443$', '') "
         f"ELSE {h} END")
    p = f"regexp_extract({url}, '{_PATH_PAT}', 1)"
    p = f"regexp_replace({p}, '^(.+?)/$', '\\1')"
    return f"({scheme} || '://' || {h} || {p})"


# --- link harvesting (crawl-frontier extraction) ------------------------

LINK_ATTR_RE = r'(?i)(?:href|src)\s*=\s*"'


def extract_links(ds, text_col: str = "text", id_col: str = "doc_id",
                  pattern: str = LINK_ATTR_RE):
    """Explode documents into ``(id, link_idx, url)`` rows — the
    crawl-frontier pass that feeds :func:`normalize_urls` /
    :func:`domain_quota`.  The algebra is DEFINITIONAL and shared
    byte-for-byte with the SQL twin (same RE2 pattern on both sides,
    sentence_split-style): split on the attribute prefix, keep the
    pieces that still contain a closing quote, take the prefix before
    it.  On pathological nested-quote soup (``href="x src="y"``) this
    picks the LAST-started attribute — regexp_extract_all would pick
    the first; the split algebra is what both sides compute.

    Row-local: split -> flatten -> mask -> segmented cumcount per
    batch; no shuffle; null text emits no rows."""
    import numpy as np

    def explode(t: pa.Table) -> pa.Table:
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lists = pc.split_pattern_regex(col, pattern=pattern)
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        off = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        not_prefix = (np.arange(len(flat), dtype=np.int64)
                      - off[parent]) > 0
        ex = pc.extract_regex(flat, pattern=r'^(?P<u>[^"]*)"')
        urls = pc.struct_field(ex, "u")
        closed = ~np.asarray(
            pc.is_null(urls).to_numpy(zero_copy_only=False), np.bool_)
        keep = not_prefix & closed
        kp = parent[keep]
        # 1-based rank among KEPT links of the same doc (parents are
        # block-sorted, so a segmented cumcount is one subtract)
        if len(kp):
            starts = np.flatnonzero(np.r_[True, kp[1:] != kp[:-1]])
            idx = np.arange(len(kp), dtype=np.int64)
            link_idx = idx - np.repeat(idx[starts], np.diff(
                np.r_[starts, len(kp)])) + 1
        else:
            link_idx = np.zeros(0, np.int64)
        m = pa.array(keep)
        return pa.table({
            id_col: pc.take(t[id_col], pa.array(kp)),
            "link_idx": pa.array(link_idx),
            "url": urls.filter(m),
        })

    return ds.map_batches(explode, batch_format="pyarrow",
                          zero_copy_batch=True)


def extract_links_sql(table: str, text_col: str = "text",
                      id_col: str = "doc_id",
                      pattern: str = LINK_ATTR_RE) -> str:
    """DuckDB oracle for :func:`extract_links` — the SAME split algebra
    (pieces 2.. of regexp_split_to_array, closing-quote filter, prefix
    capture, rank among kept)."""
    pat = pattern.replace("'", "''")
    return f"""
        SELECT {id_col},
               CAST(row_number() OVER (PARTITION BY {id_col} ORDER BY g)
                    AS BIGINT) AS link_idx,
               regexp_extract(piece, '^([^"]*)"', 1) AS url
        FROM (
            SELECT {id_col}, g, ss[g] AS piece
            FROM (
                SELECT {id_col}, ss,
                       unnest(generate_series(2, len(ss))) AS g
                FROM (SELECT {id_col},
                             regexp_split_to_array({text_col}, '{pat}') AS ss
                      FROM {table}))
            WHERE regexp_matches(ss[g], '^[^"]*"'))
        ORDER BY {id_col}, link_idx
    """
