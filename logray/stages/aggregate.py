"""Aggregation stage: exact counts/histograms with partial pre-aggregation.

The reference's observable aggregates are exact per-view counts
(filtered_file_reader.cpp:263-264) and first/last line bookkeeping; the
north rule adds rows-per-route, per-role/per-tool histograms and
turns-per-conversation — all exact, no sketches.

Scale pattern: a bare ``groupby(key).count()`` shuffles every row.  Every
aggregate here **pre-aggregates inside map_batches** (one partial row per
distinct key per batch) and then runs the wide ``groupby`` over the tiny
partials — this is also the skew ("hot conversation") mitigation: a conv
with 30% of all rows still contributes only one partial row per batch, so no
single reducer receives the raw hot-key rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _partial_counts(cols: list[str]):
    def fn(t: pa.Table) -> pa.Table:
        g = t.group_by(cols).aggregate([([], "count_all")])
        g = g.rename_columns(cols + ["partial_count"])
        if t.num_rows == 0:
            # keep a typed (empty) schema so Ray's schema unification
            # doesn't warn on empty batches
            g = g.cast(pa.schema([t.schema.field(c) for c in cols] + [pa.field("partial_count", pa.int64())]))
        return g

    return fn


def histogram(ds, cols, as_pandas: bool = True):
    """Exact row counts per distinct value combination of ``cols``.
    Two-phase: per-batch Arrow group_by partials -> small groupby sum.
    Output columns: cols + ['n'] (sorted by cols)."""
    if isinstance(cols, str):
        cols = [cols]
    from ray.data.aggregate import Sum

    partial = ds.map_batches(_partial_counts(cols), batch_format="pyarrow", zero_copy_batch=True)
    out = partial.groupby(cols).aggregate(Sum("partial_count", alias_name="n"))
    if not as_pandas:
        return out
    df = out.to_pandas().sort_values(cols).reset_index(drop=True)
    return df


def route_counts(ds_tagged, as_pandas: bool = True):
    """Rows per route for a route-tagged Dataset (see route_exclusive)."""
    return histogram(ds_tagged, "route", as_pandas=as_pandas)


def turns_per_conversation(ds, conv_col: str = "conv_id", as_pandas: bool = True):
    """Exact turns per conversation.  The partial pre-aggregation IS the
    hot-conversation skew mitigation (see module docstring)."""
    return histogram(ds, conv_col, as_pandas=as_pandas)


def min_max(ds, col: str):
    """(min, max) of a column — the reference's known_first/last analog
    (log_parser_interface.cpp:37-44)."""
    from ray.data.aggregate import Max, Min

    row = ds.aggregate(Min(col, alias_name="min"), Max(col, alias_name="max"))
    return row["min"], row["max"]
