"""PII redaction for training-data pipelines: scrub emails, IPs, phone
numbers, card-like digit runs and SSN-like patterns from a text column.

All kernels are Arrow ``replace_substring_regex`` (RE2) — zero Python per
row, fused into the upstream read — and the pattern list is shared with a
DuckDB ``regexp_replace(..., 'g')`` twin (DuckDB is also RE2, so the
redacted text matches bit-for-bit; see __ray_entry__ ``pii_redact``).

Pattern order is part of the contract (applied top to bottom; an earlier
rule can consume text a later rule would have matched):

1. email -> ``<EMAIL>``
2. SSN-like ``ddd-dd-dddd`` -> ``<SSN>``
3. 13-16 digit card-like runs -> ``<CC>``
4. IPv4 -> ``<IP>``
5. international-ish phone (+ optional leading ``+``, 7+ digits with
   separators) -> ``<PHONE>``

The reference engine's closest surface is field-level rewrite during
parsing (``src/line_parsing/parsing_basics.cpp`` consumes and re-emits
field bytes); redaction is the same rewrite shape applied by content
class rather than by position.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement) — RE2-only constructs (no lookaround),
# identical semantics in Arrow and DuckDB.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("card", r"\b[0-9]{13,16}\b", "<CC>"),
    ("ipv4", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9]([0-9()\-\. ]{5,13})[0-9]\b", "<PHONE>"),
]


def redact_pii_array(arr, categories=None):
    """Apply the (ordered) redaction rules to one Arrow string array."""
    for name, pat, repl in PII_PATTERNS:
        if categories is not None and name not in categories:
            continue
        arr = pc.replace_substring_regex(arr, pattern=pat, replacement=repl)
    return arr


def redact_pii_table(t: pa.Table, col: str = "text", out_col: str | None = None,
                     categories=None) -> pa.Table:
    out = out_col or col
    arr = redact_pii_array(t[col], categories)
    if out in t.column_names:
        t = t.drop_columns([out])
    return t.append_column(out, arr)


def redact_pii(ds, col: str = "text", out_col: str | None = None,
               categories=None):
    """Dataset-level redaction stage (fuses into the upstream read)."""
    return ds.map_batches(
        lambda t: redact_pii_table(t, col, out_col, categories),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )


def count_pii_table(t: pa.Table, col: str = "text", categories=None) -> pa.Table:
    """Per-row match counts per category (``n_<name>`` int64 columns) —
    the audit side of redaction (how much PII a corpus slice carries)."""
    for name, pat, _ in PII_PATTERNS:
        if categories is not None and name not in categories:
            continue
        t = t.append_column(
            f"n_{name}", pc.cast(pc.count_substring_regex(t[col], pat), pa.int64())
        )
    return t


def redact_pii_sql(col: str, categories=None) -> str:
    """The DuckDB expression computing the identical redacted value."""
    e = col
    for name, pat, repl in PII_PATTERNS:
        if categories is not None and name not in categories:
            continue
        # DuckDB single-quoted literals pass backslashes through verbatim;
        # only quotes need escaping.
        p = pat.replace("'", "''")
        e = f"regexp_replace({e}, '{p}', '{repl}', 'g')"
    return e
