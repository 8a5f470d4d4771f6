"""Text normalization / cleaning stages for training-data pipelines.

All kernels are Arrow compute (RE2) — zero Python per row — and each has
an exact DuckDB twin (DuckDB's regexp functions are also RE2, so the
semantics align bit-for-bit; see __ray_entry__ ``clean_text``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def clean_text_table(t: pa.Table, col: str = "text", out_col: str | None = None,
                     lower: bool = False, collapse_ws: bool = True,
                     strip: bool = True, drop_control: bool = True) -> pa.Table:
    """One batch of text cleaning: optional control-char removal,
    whitespace collapse, trim, lowercase — in that fixed order."""
    arr = t[col]
    if drop_control:
        arr = pc.replace_substring_regex(arr, pattern=r"[\x00-\x08\x0b-\x1f\x7f]",
                                         replacement="")
    if collapse_ws:
        arr = pc.replace_substring_regex(arr, pattern=r"\s+", replacement=" ")
    if strip:
        arr = pc.utf8_trim_whitespace(arr)
    if lower:
        arr = pc.utf8_lower(arr)
    name = out_col or col
    if name in t.column_names:
        t = t.drop_columns([name])
    return t.append_column(name, arr)


def clean_text(ds, col: str = "text", out_col: str | None = None, **kw):
    """Dataset-level cleaning stage (fuses into the upstream read)."""
    return ds.map_batches(
        lambda t: clean_text_table(t, col, out_col, **kw),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )


def clean_text_sql(col: str, lower: bool = False, collapse_ws: bool = True,
                   strip: bool = True, drop_control: bool = True) -> str:
    """The DuckDB expression computing the identical cleaned value."""
    e = col
    if drop_control:
        e = f"regexp_replace({e}, '[\\x00-\\x08\\x0b-\\x1f\\x7f]', '', 'g')"
    if collapse_ws:
        e = f"regexp_replace({e}, '\\s+', ' ', 'g')"
    if strip:
        e = f"trim({e})"
    if lower:
        e = f"lower({e})"
    return e


def regexp_extract_table(t: pa.Table, col: str, pattern: str) -> pa.Table:
    """Append one column per NAMED capture group of ``pattern``
    (RE2 via Arrow ``extract_regex``); all groups null when the pattern
    doesn't match.  Mirrors the reference's per-field extraction contract
    (src/line_parsing/parsing_basics.cpp:41-69) for free-form regexes."""
    st = pc.extract_regex(t[col], pattern=pattern)
    if isinstance(st, pa.ChunkedArray):
        st = st.combine_chunks()
    # a non-match is a null STRUCT whose children still read '' — push
    # the struct validity down into each extracted column
    valid = st.is_valid()
    for field in st.type:
        child = pc.if_else(valid, st.field(field.name),
                           pa.scalar(None, field.type))
        t = t.append_column(field.name, child)
    return t


def regexp_extract(ds, col: str, pattern: str):
    """Dataset-level named-group extraction (fuses into the read)."""
    return ds.map_batches(
        lambda t: regexp_extract_table(t, col, pattern),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )


def regexp_extract_sql(col: str, pattern: str, group_idx: int,
                       name: str) -> str:
    """DuckDB expression for ONE group of :func:`regexp_extract`: null
    (not DuckDB's default '') when the row doesn't match, matching
    Arrow's null-struct semantics."""
    p = pattern.replace("'", "''")
    return (
        f"CASE WHEN regexp_matches({col}, '{p}') "
        f"THEN regexp_extract({col}, '{p}', {group_idx}) END AS {name}"
    )


def normalize_nfc(ds, col: str = "text", out_col: str | None = None):
    """Unicode NFC normalization (composed form) — the canonicalization
    step run before hashing/dedup so visually-identical strings (combining
    marks vs precomposed codepoints) hash identically.

    Arrow 16's ``utf8_normalize(form='NFC')`` performs decomposition but
    NOT canonical composition (its NFC output equals NFD), so it cannot
    match DuckDB's ``nfc_normalize``; instead the kernel is a vectorized
    ``string_is_ascii`` fast path (ASCII is NFC-invariant, the common
    case costs one Arrow scan) with ``unicodedata.normalize`` only over
    the non-ASCII minority.  Appends ``changed`` (did normalization alter
    the string) for cheap monitoring."""
    out = out_col or f"{col}_nfc"

    def norm(t):
        import unicodedata

        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        v = t[col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        na = pc.string_is_ascii(v)
        todo = pc.and_kleene(pc.invert(na), pc.is_valid(v))
        idx = np.flatnonzero(todo.to_numpy(zero_copy_only=False) == True)  # noqa: E712
        if len(idx):
            vals = v.take(pa.array(idx)).to_pylist()
            fixed = pa.array([unicodedata.normalize("NFC", x) for x in vals],
                             pa.string())
            mask = np.zeros(len(v), np.bool_)
            mask[idx] = True
            nv = pc.replace_with_mask(v, pa.array(mask), fixed)
        else:
            nv = v
        ch = pc.fill_null(pc.not_equal(nv, v), False)
        return t.append_column(out, nv).append_column(
            "changed", pc.cast(ch, pa.bool_()))

    return ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=None)


def normalize_nfc_sql(table: str, col: str = "text",
                      out_col: str | None = None, cols: str = "*") -> str:
    """DuckDB twin of :func:`normalize_nfc`."""
    out = out_col or f"{col}_nfc"
    return (
        f"SELECT {cols}, nfc_normalize({col}) AS {out}, "
        f"COALESCE(nfc_normalize({col}) <> {col}, FALSE) AS changed "
        f"FROM {table}"
    )



def _duckdb_double_text(f: float) -> str:
    """DuckDB's JSON double->text rendering (JS Number.toString rules):
    shortest-roundtrip digits, positional for 1e-6 <= |v| < 1e21 (with a
    trailing .0 on integral doubles), scientific otherwise with no '+'
    in the exponent."""
    from decimal import Decimal

    if f == 0:
        return "0.0"
    d = Decimal(repr(f))
    adj = d.adjusted()
    if -7 < adj < 21:
        out = format(d, "f")
        return out if "." in out else out + ".0"
    mant = format(d.scaleb(-adj).normalize(), "f")
    return f"{mant}e{adj}"


def json_extract_field(ds, col: str, key: str, out_col: str | None = None,
                       value_type: str = "string"):
    """Extract one top-level field from a JSON string column (the
    ubiquitous structured-log payload step; DuckDB ``->>'key'``
    semantics: missing key / null / invalid JSON -> null, scalar values
    as their JSON text).  ``value_type`` in {'string','int64','float64'}
    converts the extracted text like a SQL ``TRY_CAST``.

    The per-row ``json.loads`` is CPython's C parser — the irreducible
    per-payload codec cost (same shape as the zlib / image stages); rows
    failing to parse yield null rather than raising, matching the twin's
    TRY semantics."""
    import json
    import math

    import pyarrow as pa

    out = out_col or key
    if value_type not in ("string", "int64", "float64"):
        raise ValueError(f"bad value_type {value_type!r}")
    if key.startswith("$"):
        raise ValueError(
            "keys starting with '$' are JSON *path* expressions in the "
            "DuckDB twin but literal dict keys here — rename the field")

    def part(t: pa.Table) -> pa.Table:
        c = t[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        res = []
        for s in c.to_pylist():
            v = None
            if s is not None:
                try:
                    # DuckDB ->> takes the FIRST duplicate key; dict()
                    # keeps the last, so build first-wins explicitly
                    d = json.loads(
                        s, object_pairs_hook=lambda ps:
                        {k: val for k, val in reversed(ps)})
                    if isinstance(d, dict):
                        v = d.get(key)
                except ValueError:
                    v = None
            if v is None:
                res.append(None)
                continue
            # ->> renders scalars as JSON text (bools lowercase,
            # strings unquoted); numeric modes then TRY_CAST that text
            if isinstance(v, str):
                text = v
            elif isinstance(v, float):
                text = _duckdb_double_text(v)
            elif isinstance(v, int) and not isinstance(v, bool):
                # DuckDB JSON keeps ints in [-2^63, 2^64-1] exact and
                # demotes anything wider to a double before rendering
                text = str(v) if -(1 << 63) <= v < (1 << 64) \
                    else _duckdb_double_text(float(v))
            else:
                text = json.dumps(v, separators=(",", ":"))
            if value_type == "string":
                res.append(text)
            elif value_type == "int64":
                ts = text.strip()
                try:
                    iv = int(ts)
                    # out-of-range BIGINT is NULL under TRY_CAST, not a
                    # pyarrow OverflowError that kills the job
                    res.append(iv if -(1 << 63) <= iv < (1 << 63) else None)
                except ValueError:
                    # DuckDB casts decimal/exponent strings to BIGINT by
                    # rounding half away from zero ('2.5' -> 3)
                    try:
                        f = float(ts)
                    except ValueError:
                        f = None
                    if f is None or not math.isfinite(f):
                        res.append(None)
                    else:
                        iv = int(math.floor(f + 0.5)) if f >= 0 \
                            else int(math.ceil(f - 0.5))
                        res.append(iv if -(1 << 63) <= iv < (1 << 63)
                                   else None)
            else:
                try:
                    res.append(float(text.strip()))
                except ValueError:
                    res.append(None)
        typ = {"string": pa.string(), "int64": pa.int64(),
               "float64": pa.float64()}[value_type]
        return t.append_column(out, pa.array(res, typ))

    return ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=None)


def json_extract_field_sql(table: str, col: str, key: str,
                           out_col: str | None = None,
                           value_type: str = "string",
                           cols: str = "*") -> str:
    """DuckDB twin of :func:`json_extract_field`."""
    out = out_col or key
    if key.startswith("$"):
        raise ValueError("'$'-prefixed keys are path expressions; see "
                         "json_extract_field")
    k = key.replace("'", "''")
    expr = (f"CASE WHEN json_valid({col}) THEN {col}->>'{k}' END")
    if value_type == "int64":
        expr = f"TRY_CAST({expr} AS BIGINT)"
    elif value_type == "float64":
        expr = f"TRY_CAST({expr} AS DOUBLE)"
    return f"SELECT {cols}, {expr} AS {out} FROM {table}"


DEFAULT_SENTENCE_RE = r"[.!?]+\s+"


def sentence_split(ds, text_col: str = "text", id_col: str = "doc_id",
                   pattern: str = DEFAULT_SENTENCE_RE):
    """Explode documents into (id, sent_idx, sentence) rows by an RE2
    boundary pattern — the segmentation pass before sentence-level dedup
    or per-sentence sampling.

    Both sides of the oracle run the SAME RE2 pattern (Arrow
    ``split_pattern_regex`` here, DuckDB ``regexp_split_to_array`` in
    :func:`sentence_split_sql`), so splits agree byte-for-byte; RE2 has
    no lookbehind, so the boundary match is CONSUMED (sentences carry no
    terminal punctuation except at document end — document this to
    downstream users).  ``sent_idx`` is 1-based, matching the SQL twin's
    ``generate_series``.

    Row-local: split -> flatten -> parent-index take per batch, no
    shuffle; null text emits no rows (SQL unnest-of-null semantics)."""
    import numpy as np

    def explode(t: pa.Table) -> pa.Table:
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lists = pc.split_pattern_regex(col, pattern=pattern)
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        # freshly-built list array: offsets start at 0, so position
        # within the doc = global position - the doc's start offset
        off = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        pr = parent.to_numpy(zero_copy_only=False)
        idx = np.arange(len(flat), dtype=np.int64) - off[pr] + 1
        return pa.table({
            id_col: pc.take(t[id_col], parent),
            "sent_idx": pa.array(idx),
            "sentence": flat,
        })

    return ds.map_batches(explode, batch_format="pyarrow",
                          zero_copy_batch=True)


def sentence_split_sql(table: str, text_col: str = "text",
                       id_col: str = "doc_id",
                       pattern: str = DEFAULT_SENTENCE_RE) -> str:
    """DuckDB oracle for :func:`sentence_split` (1-indexed list algebra)."""
    return f"""
        SELECT {id_col}, g AS sent_idx, ss[g] AS sentence
        FROM (
            SELECT {id_col}, ss, unnest(generate_series(1, len(ss))) AS g
            FROM (SELECT {id_col},
                         regexp_split_to_array({text_col}, '{pattern}') AS ss
                  FROM {table})
        )
        ORDER BY {id_col}, sent_idx
    """


# --- HTML -> text extraction (web-crawl ingestion, C4/CCNet stage 0) ----
#
# The transform IS this step table: both the Arrow kernel chain and the
# DuckDB oracle are generated from the SAME list, so the twin agrees
# byte-for-byte by construction (both engines are RE2).  Reference
# analog: the viewer consumes pre-extracted text lines
# (/root/reference/src/file_parsing/filtered_file_reader.hpp raw-line contract);
# a web-scale corpus needs the HTML->text stage in the engine itself.
#
# Semantics (definitional, in order): drop comments, drop script/style
# blocks whole, turn block-closing / break tags into newlines, strip
# every remaining tag, decode the 6 ubiquitous entities (&amp; LAST so
# "&amp;lt;" -> "&lt;", not "<"), collapse horizontal whitespace, then
# newline runs, then trim.  A <br> carrying attributes falls through to
# the strip step (no newline) — documented, matched by the twin.
_HTML_STEPS: list[tuple[str, str, str]] = [
    ("re", r"(?s)<!--.*?-->", ""),
    ("re", r"(?is)<script\b[^>]*>.*?</script\s*>", ""),
    ("re", r"(?is)<style\b[^>]*>.*?</style\s*>", ""),
    ("re", r"(?i)(?:<(?:br|hr)\s*/?>"
           r"|</(?:p|div|li|tr|h[1-6]|ul|ol|table|blockquote)\s*>)", "\n"),
    ("re", r"(?s)<[^>]*>", ""),
    ("lit", "&nbsp;", " "),
    ("lit", "&lt;", "<"),
    ("lit", "&gt;", ">"),
    ("lit", "&quot;", "\""),
    ("lit", "&#39;", "'"),
    ("lit", "&apos;", "'"),
    ("lit", "&amp;", "&"),
    ("re", r"[ \t\r\f\v]+", " "),
    ("re", r"\s*\n\s*", "\n"),
    ("re", r"^\s+|\s+$", ""),
]

_TAG_RE = r"(?s)<[^>]*>"


def html_to_text_table(t: pa.Table, col: str = "text",
                       out_col: str = "clean_text",
                       count_tags: bool = True) -> pa.Table:
    """One batch of HTML extraction: the `_HTML_STEPS` chain, RE2 all
    the way down, zero Python per row.  ``n_tags`` (markup density — a
    standard crawl-quality signal) is counted on the RAW input before
    any removal."""
    arr = t[col]
    if count_tags:
        n_tags = pc.cast(pc.count_substring_regex(arr, pattern=_TAG_RE),
                         pa.int64())
    for kind, pat, rep in _HTML_STEPS:
        if kind == "re":
            arr = pc.replace_substring_regex(arr, pattern=pat,
                                             replacement=rep)
        else:
            arr = pc.replace_substring(arr, pattern=pat, replacement=rep)
    for name in ([out_col, "n_tags"] if count_tags else [out_col]):
        if name in t.column_names:
            t = t.drop_columns([name])
    if count_tags:
        t = t.append_column("n_tags", n_tags)
    return t.append_column(out_col, arr)


def html_to_text(ds, col: str = "text", out_col: str = "clean_text",
                 count_tags: bool = True):
    """HTML -> text extraction stage (row-local, fuses into the read)."""
    return ds.map_batches(
        lambda t: html_to_text_table(t, col, out_col, count_tags),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )


def html_to_text_expr(col: str) -> str:
    """The DuckDB expression computing EXACTLY `_HTML_STEPS` over
    ``col`` — generated from the same step table as the Arrow kernel."""
    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    expr = col
    for kind, pat, rep in _HTML_STEPS:
        if kind == "re":
            rep_sql = "chr(10)" if rep == "\n" else q(rep)
            expr = f"regexp_replace({expr}, {q(pat)}, {rep_sql}, 'g')"
        else:
            expr = f"replace({expr}, {q(pat)}, {q(rep)})"
    return expr


def html_tag_count_expr(col: str) -> str:
    """DuckDB twin of the ``n_tags`` column (raw-input tag count)."""
    pat = _TAG_RE.replace("'", "''")
    return f"len(regexp_extract_all({col}, '{pat}'))::BIGINT"
