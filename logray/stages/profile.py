"""Table profiling: per-column row / null / distinct counts — the
data-audit pass a pipeline runs before and after every ingestion or
transformation stage to catch schema drift, null explosions and key
cardinality changes.

Scale shape:
- row/non-null counts for ALL columns come from ONE streaming
  ``map_batches`` pass emitting a single partial row per batch (exact
  integer folds).
- distinct counts are per column: ``distinct="exact"`` runs one
  single-column ``groupby`` shuffle per profiled column (column-pruned,
  so each shuffle moves one column's bytes — right for audits of
  moderate tables and for the correctness gate); ``distinct="approx"``
  uses the mergeable HLL sketch (:func:`logray.functions.sketch
  .approx_distinct`) — one streaming pass per column, no shuffle, the
  100 TB path.

SQL parity notes: ``n_distinct`` matches ``count(DISTINCT col)`` —
nulls excluded (the engine subtracts the pooled null group that the
sort-based groupby forms).  Float NaN is a VALUE, not a null, on both
sides.

Reference parity: generalizes the reference's per-field min/max/count
bookkeeping pass (``src/log_management/log_parser_interface.cpp``
min/max tracking during the full-file scan) to every column at once.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["table_profile", "table_profile_sql"]


def table_profile(ds, columns: list[str] | None = None,
                  distinct: str = "exact") -> pd.DataFrame:
    """DataFrame ``(column, n_rows, n_nonnull, n_null, n_distinct)``,
    one row per profiled column, sorted by column name."""
    if distinct not in ("exact", "approx"):
        raise ValueError(f"unknown distinct mode {distinct!r}")
    cols = list(columns) if columns else list(ds.schema().names)
    narrow = ds.select_columns(cols)
    sentinel = "__n"
    while sentinel in cols:  # a profiled column may itself be named __n
        sentinel += "_"

    def part(t: pa.Table) -> pd.DataFrame:
        row = {sentinel: [t.num_rows]}
        for c in cols:
            row[c] = [int(pc.count(t[c]).as_py())]  # non-null count
        return pd.DataFrame(row)

    parts = narrow.map_batches(part, batch_format="pyarrow",
                               zero_copy_batch=True,
                               batch_size=None).to_pandas()
    n_rows = int(parts[sentinel].sum())
    out = []
    for c in sorted(cols):
        nn = int(parts[c].sum())
        if distinct == "exact":
            def drop_null(t: pa.Table, c=c) -> pa.Table:
                return t.filter(pc.is_valid(t[c]))

            # nulls are filtered BEFORE the groupby: count(DISTINCT)
            # excludes them, and Ray's sort-based groupby cannot order
            # None against real keys anyway
            nd = int(ds.select_columns([c])
                     .map_batches(drop_null, batch_format="pyarrow",
                                  zero_copy_batch=True, batch_size=None)
                     .groupby(c).count().count())
        else:
            from logray.functions.sketch import approx_distinct

            nd = int(approx_distinct(ds.select_columns([c]), c))
        out.append({"column": c, "n_rows": n_rows, "n_nonnull": nn,
                    "n_null": n_rows - nn, "n_distinct": nd})
    return pd.DataFrame(out, columns=["column", "n_rows", "n_nonnull",
                                      "n_null", "n_distinct"])


def table_profile_sql(table: str, columns: list[str]) -> str:
    """DuckDB oracle for :func:`table_profile` (exact mode)."""
    parts = [
        f"SELECT '{c}' AS \"column\", count(*) AS n_rows, "
        f"count({c}) AS n_nonnull, count(*) - count({c}) AS n_null, "
        f"count(DISTINCT {c}) AS n_distinct FROM {table}"
        for c in sorted(columns)
    ]
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'
