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
