"""Distributed PCA over an embedding column: one streaming pass of
moment partials, an eigendecomposition of the tiny d x d covariance on
the driver, then a row-local projection (and optional whitening).

The standard pre-step for embedding-space curation — decorrelate /
compress vectors before SemDeDup-style clustering or ANN indexing
(reduces IVF centroid drift and matmul cost at 100 TB).

Scale shape:

- **fit** is ONE ``map_batches`` pass emitting ``(n, sum_x, sum_xxT)``
  per block — d + d^2 float64s each (d = embedding width, ~10^2..10^3,
  so a partial is KBs..MBs); the driver folds partials in canonical
  sorted order (deterministic for a given input layout) and runs
  ``numpy.linalg.eigh`` on the d x d covariance — O(d^3) once, never on
  workers;
- **project** broadcasts the (d x k) component matrix in the task
  closure and is one matmul per batch — row-local, fuses into the read.

Sign convention: each component's largest-|coefficient| entry is made
positive (the deterministic tiebreak scikit-learn uses), so components
are reproducible across runs and shard layouts.

Reference parity: the fit/apply split mirrors the reference's
compile-once-apply-per-line shape (`src/line_parsing/line_parser.cpp`
builds the instruction vector once; every line replays it) — here the
"compiled" object is the component matrix.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["PCAModel", "fit_pca", "project_pca"]


@dataclass
class PCAModel:
    mean: np.ndarray                      # float64[d]
    components: np.ndarray                # float64[d, k] (orthonormal cols)
    explained_variance: np.ndarray        # float64[k] (descending)
    explained_variance_ratio: np.ndarray  # float64[k]
    n_rows: int


def _embedding_matrix(t: pa.Table, col: str) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix (one flat copy)."""
    arr = t[col].combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        raise ValueError(f"fit_pca: null embeddings in column {col!r}")
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    if n == 0:
        return flat.reshape(0, 0)
    if isinstance(arr, pa.FixedSizeListArray):
        return flat.reshape(n, arr.type.list_size)
    # flatten() already applies any slice offset: flat is exactly the
    # concatenation of the n lists
    offs = arr.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offs)
    if not (widths == widths[0]).all():
        raise ValueError("fit_pca: ragged embedding widths")
    return flat.reshape(n, int(widths[0]))


def fit_pca(ds, col: str = "embedding", k: int = 8,
            id_col: str | None = None) -> PCAModel:
    """One streaming moments pass + driver-side eigh (see module doc)."""

    def part(t: pa.Table) -> pd.DataFrame:
        x = _embedding_matrix(t, col)
        key_col = id_col or t.column_names[0]
        key = str(t[key_col][0].as_py()) if t.num_rows else ""
        if x.size == 0:
            return pd.DataFrame({"key": [key], "n": [0], "d": [0],
                                 "s": [b""], "ss": [b""]})
        return pd.DataFrame({
            "key": [key], "n": [x.shape[0]], "d": [x.shape[1]],
            "s": [x.sum(axis=0).tobytes()],
            "ss": [(x.T @ x).tobytes()],
        })

    parts = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=None).to_pandas()
    parts = parts[parts["n"] > 0].sort_values("key", kind="mergesort")
    if parts.empty:
        raise ValueError("fit_pca: no rows")
    dims = set(parts["d"])
    if len(dims) != 1:
        raise ValueError(f"fit_pca: inconsistent embedding widths {dims}")
    d = int(dims.pop())
    if not (1 <= k <= d):
        raise ValueError(f"fit_pca: k={k} out of range for width {d}")
    n = int(parts["n"].sum())
    s = np.zeros(d)
    ss = np.zeros((d, d))
    for _, row in parts.iterrows():
        s += np.frombuffer(row["s"], dtype=np.float64)
        ss += np.frombuffer(row["ss"], dtype=np.float64).reshape(d, d)
    mean = s / n
    cov = (ss - n * np.outer(mean, mean)) / max(n - 1, 1)
    evals, evecs = np.linalg.eigh(cov)      # ascending
    order = np.argsort(evals)[::-1][:k]
    comp = evecs[:, order]
    evals = np.maximum(evals[order], 0.0)
    # deterministic sign: largest-|coef| entry of each component positive
    flip = np.sign(comp[np.abs(comp).argmax(axis=0), np.arange(comp.shape[1])])
    flip[flip == 0] = 1.0
    comp = comp * flip
    total_var = float(np.trace(cov))
    ratio = evals / total_var if total_var > 0 else np.zeros_like(evals)
    return PCAModel(mean=mean, components=comp, explained_variance=evals,
                    explained_variance_ratio=ratio, n_rows=n)


def project_pca(ds, model: PCAModel, col: str = "embedding",
                out_col: str = "pca", whiten: bool = False,
                keep_input: bool = False, eps: float = 1e-12):
    """Append the k-dim projection as a list<double> column (row-local).

    ``whiten=True`` scales each axis to unit variance (the SemDeDup /
    ANN-friendly form).  ``keep_input=False`` drops the wide input
    column — at 100 TB the projection is the point, don't ship both.
    """
    mean, comp = model.mean, model.components
    scale = 1.0 / np.sqrt(model.explained_variance + eps) if whiten else None

    def proj(t: pa.Table) -> pa.Table:
        x = _embedding_matrix(t, col)
        if x.size == 0:
            y = np.zeros((t.num_rows, comp.shape[1]))
        else:
            y = (x - mean) @ comp
        if scale is not None:
            y = y * scale
        out = pa.FixedSizeListArray.from_arrays(
            pa.array(y.reshape(-1), type=pa.float64()), comp.shape[1])
        if out_col in t.column_names:
            t = t.drop_columns([out_col])
        t = t.append_column(out_col, out)
        if not keep_input and col in t.column_names and col != out_col:
            t = t.drop_columns([col])
        return t

    return ds.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=None)
