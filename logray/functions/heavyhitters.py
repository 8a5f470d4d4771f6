"""EXACT frequent-item mining in two streaming passes (no shuffle).

``SELECT col, count(*) FROM t GROUP BY col HAVING count(*) > theta * n``
without a groupby shuffle: at 100 TB a full distinct-key exchange moves
every block for an answer of at most ``1/theta`` rows.

- Pass 1 — Misra-Gries candidate mining: each batch folds to an exact
  ``value_counts`` compressed to ``k`` counters (subtract the (k+1)-th
  largest count, keep positives).  Summaries merge on the driver by
  count-sum + the same compression; by the mergeable-summaries bound
  (Agarwal et al., PODS 2012) the total undercount of any item after
  arbitrary merging is <= n/(k+1), so with ``k >= margin/theta``
  (margin>=2) every item with true frequency > theta*n survives with a
  positive merged counter.  The candidate set is every retained item
  whose merged count + n/(k+1) clears the threshold — <= k rows.
- Pass 2 — exact recount of candidates only: broadcast the candidate
  list, per-batch ``is_in``-filtered value counts, driver sum.  Exact
  counts, exact membership.

NULLs are excluded (mirror with ``WHERE col IS NOT NULL`` in SQL).
Deterministic by construction — the final counts are exact regardless of
partitioning, batch order or retries.

Reference anchor: the reference's per-value histogram surface
(`src/analysis` stats over parsed fields) computes full GROUP BY counts;
this is the scale path for the "only the frequent tail matters" ask.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from logray.stages.bucketing import stream_fold

__all__ = ["heavy_hitters", "heavy_hitters_sql"]


def _mg_compress(items: np.ndarray, counts: np.ndarray, k: int):
    """Misra-Gries compression to <= k counters: subtract the (k+1)-th
    largest count from the top k, drop non-positive."""
    if len(items) <= k:
        return items, counts
    order = np.argsort(counts, kind="stable")[::-1]
    thr = counts[order[k]]
    keep = order[:k]
    newc = counts[keep] - thr
    m = newc > 0
    return items[keep][m], newc[m]


def _batch_summary(col: pa.ChunkedArray | pa.Array, k: int):
    """Exact value counts of one batch, MG-compressed to k, plus the
    non-null row count."""
    vc = pc.value_counts(pc.drop_null(col))
    items = np.asarray(vc.field("values").to_pandas())
    counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(counts.sum())
    items, counts = _mg_compress(items, counts, k)
    return items, counts, n


def heavy_hitters(ds, col: str, threshold: float, k: int | None = None,
                  as_pandas: bool = True):
    """All values of ``col`` with exact count > ``threshold`` * n(non-null),
    with their exact counts (columns: col, ``cnt``)."""
    if not (0.0 < threshold < 1.0):
        raise ValueError(f"threshold must be in (0,1), got {threshold}")
    if k is None:
        k = max(int(np.ceil(2.0 / threshold)), 8)
    elif k < int(np.ceil(1.0 / threshold)):
        raise ValueError(f"k={k} < 1/threshold loses the superset guarantee")

    def partial(t: pa.Table) -> pa.Table:
        items, counts, n = _batch_summary(t[col], k)
        # Sentinel null-item row carries the batch's non-null n through
        # the fold (summed like any other counter, never compressed).
        return pa.table({
            col: pa.array(list(items) + [None]),
            "cnt": pa.array(list(counts) + [n], pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def fold(tables: list[pa.Table]) -> pa.Table:
        df = pa.concat_tables(tables, promote_options="permissive").to_pandas()
        isnull = df[col].isna()
        n = int(df.loc[isnull, "cnt"].sum())
        g = df[~isnull].groupby(col, sort=False)["cnt"].sum()
        items, counts = _mg_compress(np.asarray(g.index), g.to_numpy(), k)
        out = pd.DataFrame({col: list(items) + [None],
                            "cnt": list(counts) + [n]})
        return pa.Table.from_pandas(out, preserve_index=False)

    folded = stream_fold(parts, fold)
    fdf = folded.to_pandas()
    isnull = fdf[col].isna()
    n = int(fdf.loc[isnull, "cnt"].sum())
    min_count = int(np.floor(threshold * n)) + 1
    maxerr = n // (k + 1)
    cand = fdf.loc[~isnull & (fdf["cnt"] + maxerr >= min_count), col]
    empty = pd.DataFrame({col: pd.Series([], dtype=fdf[col].dtype),
                          "cnt": pd.Series([], dtype=np.int64)})
    if cand.empty:
        return empty if as_pandas else pa.Table.from_pandas(empty, preserve_index=False)

    cand_set = pa.array(cand.to_numpy())

    def recount(t: pa.Table) -> pa.Table:
        vals = t[col]
        kept = pc.drop_null(vals).filter(
            pc.is_in(pc.drop_null(vals), value_set=cand_set))
        vc = pc.value_counts(kept)
        return pa.table({col: vc.field("values"),
                         "cnt": vc.field("counts").cast(pa.int64())})

    exact_parts = ds.map_batches(recount, batch_format="pyarrow", batch_size=None)

    def fold2(tables: list[pa.Table]) -> pa.Table:
        df = pa.concat_tables(tables, promote_options="permissive").to_pandas()
        g = df.groupby(col, sort=False)["cnt"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    exact = stream_fold(exact_parts, fold2)
    if exact is None:
        return empty if as_pandas else pa.Table.from_pandas(empty, preserve_index=False)
    edf = exact.to_pandas()
    edf = edf[edf["cnt"] >= min_count].sort_values(
        ["cnt", col], ascending=[False, True]).reset_index(drop=True)
    edf["cnt"] = edf["cnt"].astype(np.int64)
    return edf if as_pandas else pa.Table.from_pandas(edf, preserve_index=False)


def heavy_hitters_sql(table: str, col: str, threshold: float) -> str:
    return f"""
        SELECT {col}, CAST(count(*) AS BIGINT) AS cnt FROM {table}
        WHERE {col} IS NOT NULL
        GROUP BY {col}
        HAVING count(*) > (SELECT count({col}) FROM {table}) * {threshold}
    """
