"""Corpus snapshot diff: added / removed / changed documents between two
snapshots of the same table (continuous-crawl corpus management — "what
did this month's crawl change?").

Scale plan (the whole point at 100 TB): each side projects to the NARROW
``(id, h1, h2, side)`` table — 128-bit collision-guarded content
fingerprints (functions/fingerprint.py::content_hash128, the same guard
the persistent dedup index uses) — so the one bucket shuffle moves ~25
bytes/doc and the text itself NEVER leaves its source blocks.  The
per-bucket fold is one vectorized groupby (min/max over two hashes plus
side counts decide the verdict); no driver materialization anywhere.

Contract: ids are unique WITHIN each snapshot (the fold raises loudly on
violations — a silent pick-one would fabricate verdicts).  ``changed``
relies on 128-bit hash inequality; a collision would report a changed
doc as unchanged with probability ~2^-128 per pair.

Reference analog: the viewer re-opens a grown log file and re-derives
its line index (/root/reference/src/file_parsing/log_parser_interface.cpp
reload path); a corpus engine needs the delta itself as a first-class
result.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from logray.functions.fingerprint import content_hash128

# folded into the fingerprint where text IS NULL so null != "" (the
# empty string hashes to the bare FNV offsets)
_NULL_SALT1 = np.uint64(0xD6E8FEB86659FD93)
_NULL_SALT2 = np.uint64(0xA5A3564E1F8C7B29)


def _fingerprints(ds, id_col: str, text_col: str, side: int):
    """Narrow (id, h1, h2, side) projection of one snapshot."""

    def fp(t: pa.Table) -> pa.Table:
        h1, h2 = content_hash128(t[text_col])
        isnull = ~np.asarray(
            pc.is_valid(t[text_col]).to_numpy(zero_copy_only=False),
            np.bool_)
        h1 = np.where(isnull, h1 ^ _NULL_SALT1, h1)
        h2 = np.where(isnull, h2 ^ _NULL_SALT2, h2)
        return pa.table({
            id_col: t[id_col],
            "h1": pa.array(h1),
            "h2": pa.array(h2),
            "side": pa.array(np.full(t.num_rows, side, np.int8)),
        })

    return ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)


def snapshot_diff(ds_old, ds_new, id_col: str = "doc_id",
                  text_col: str = "text", num_buckets: int = 32,
                  include_unchanged: bool = False):
    """``(id, status)`` with status in {'added','removed','changed'}
    (plus 'unchanged' when ``include_unchanged``).  Exact SQL twin:
    :func:`snapshot_diff_sql` (FULL OUTER JOIN + IS DISTINCT FROM)."""
    from logray.stages.bucketing import grouped_apply

    both = _fingerprints(ds_old, id_col, text_col, 0).union(
        _fingerprints(ds_new, id_col, text_col, 1))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(id_col, dropna=False, sort=False)
        agg = g.agg(cnt=("side", "size"), smin=("side", "min"),
                    smax=("side", "max"),
                    h1min=("h1", "min"), h1max=("h1", "max"),
                    h2min=("h2", "min"), h2max=("h2", "max"))
        bad = (agg["cnt"] > 2) | ((agg["cnt"] == 2)
                                  & (agg["smin"] == agg["smax"]))
        if bool(bad.any()):
            raise ValueError(
                f"snapshot_diff: duplicate {id_col} within one snapshot "
                f"(e.g. {agg.index[bad][:3].tolist()}); run exact_dedup "
                "first — ids must be snapshot-unique")
        same = ((agg["h1min"] == agg["h1max"])
                & (agg["h2min"] == agg["h2max"]))
        status = np.where(
            agg["cnt"].to_numpy() == 1,
            np.where(agg["smin"].to_numpy() == 0, "removed", "added"),
            np.where(same.to_numpy(), "unchanged", "changed"))
        out = pd.DataFrame({id_col: agg.index.to_numpy(),
                            "status": status})
        if not include_unchanged:
            out = out[out["status"] != "unchanged"]
        return out.reset_index(drop=True)

    return grouped_apply(both, id_col, fold, num_buckets=num_buckets)


def snapshot_diff_sql(old_table: str, new_table: str,
                      id_col: str = "doc_id", text_col: str = "text",
                      include_unchanged: bool = False) -> str:
    """DuckDB oracle for :func:`snapshot_diff` — compares the TEXT
    itself (IS DISTINCT FROM), so it also proves the fingerprint path
    collision-free on the test corpus."""
    where = "" if include_unchanged else """
        WHERE o.{i} IS NULL OR n.{i} IS NULL
              OR o.{t} IS DISTINCT FROM n.{t}""".format(i=id_col, t=text_col)
    return f"""
        SELECT COALESCE(o.{id_col}, n.{id_col}) AS {id_col},
               CASE WHEN o.{id_col} IS NULL THEN 'added'
                    WHEN n.{id_col} IS NULL THEN 'removed'
                    WHEN o.{text_col} IS DISTINCT FROM n.{text_col}
                         THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM {old_table} o FULL OUTER JOIN {new_table} n
             ON o.{id_col} = n.{id_col}
        {where}
        ORDER BY {id_col}
    """
