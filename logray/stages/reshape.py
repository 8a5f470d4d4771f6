"""Row-shape transforms: explode (SQL UNNEST ... WITH ORDINALITY).

The reference parses one log line into one row of fields
(`src/line_parsing/line_format.cpp`); list-typed columns (embeddings,
token ids, chunk offsets) need the inverse — one row per element, with
the element's 1-based position.  Pure per-batch Arrow-kernel work
(list_flatten + list_parent_indices + one arange for ordinality), so the
stage fuses into the read and never shuffles.

NULL and empty lists emit no rows (SQL UNNEST semantics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["explode_list"]


def explode_list(ds, list_col: str, id_cols=None, val_col: str | None = None,
                 pos_col: str | None = "pos"):
    """One output row per list element: ``id_cols + [pos_col, val_col]``.

    ``val_col`` defaults to the list column's name; ``pos_col=None`` omits
    the ordinality column.
    """
    id_cols = [id_cols] if isinstance(id_cols, str) else list(id_cols or [])
    out_val = val_col or list_col

    def fn(t: pa.Table) -> pa.Table:
        col = t[list_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col)
        parent = pc.list_parent_indices(col)
        cols = {c: t[c].take(parent) for c in id_cols}
        if pos_col is not None:
            lengths = pc.list_value_length(col).to_numpy(zero_copy_only=False)
            lengths = np.nan_to_num(lengths, nan=0).astype(np.int64)
            starts = np.repeat(np.cumsum(lengths) - lengths, lengths)
            cols[pos_col] = pa.array(
                np.arange(len(flat), dtype=np.int64) - starts + 1)
        cols[out_val] = flat
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
