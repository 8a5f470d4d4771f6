"""Distributed k-means over an embedding column (Lloyd's algorithm).

Scale shape: every iteration is ONE streaming ``map_batches`` pass — each
batch assigns its rows to the nearest centroid (one matmul) and emits one
tiny partial row per touched centroid; the driver folds partials and
updates centroids.  No shuffle ever; per-iteration driver state is
O(k * dim).  The input Dataset re-executes per iteration (for repeated
passes over cold storage, materialize or checkpoint the input first).

Determinism: float sums depend on addition order, and Ray's batch order
is nondeterministic — so per-batch partial sums are accumulated in EXACT
int64 fixed point (components scaled by 2^20 and rounded) and the driver
reconstructs means from exact integer sums.  Assignments are batch-local
matmuls of the shared centroids, so the whole fit is bit-identical under
any partitioning, batch order, retry or cluster size.  Initial centroids
are the rows with the k smallest deterministic id hashes (the bottom-k
sketch from :mod:`logray.functions.sample`) — partition-independent too.

Reference parity: the iterative refinement shape generalizes the
reference's multi-pass analysis loop (``src/analysis/analysis.cpp`` full
re-scan per requested statistic); centroids play the role of the shared
lookup the reference rebuilds between passes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from logray.functions.ann import _as_matrix
from logray.functions.sample import _det_hash

_FP = 20  # fixed-point fractional bits for exact partial sums
_FP_SCALE = float(1 << _FP)

__all__ = ["kmeans_fit", "kmeans_assign"]


def _init_centroids(ds, k: int, emb_col: str, id_col: str, seed: int):
    """The k rows with the smallest (hash(id), id): one pass of small
    per-batch bottom-k partials, merged on the driver."""

    def bottomk(t: pa.Table) -> pd.DataFrame:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        h = _det_hash(ids, seed)
        order = np.lexsort((ids, h))[:k]
        m = _as_matrix(t[emb_col], np.float64)
        return pd.DataFrame({
            "h": h[order], "id": ids[order],
            "vec": [m[i].tobytes() for i in order],
        })

    parts = ds.map_batches(bottomk, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    parts = parts.sort_values(["h", "id"], kind="mergesort").head(k)
    if len(parts) < k:
        raise ValueError(f"k={k} exceeds the dataset's row count")
    return np.stack([np.frombuffer(b, np.float64) for b in parts["vec"]])


def _partial_fn(cent: np.ndarray, emb_col: str):
    """One batch -> exact int64 fixed-point per-centroid partials."""
    k, dim = cent.shape
    c_sq = (cent * cent).sum(axis=1)  # ||c||^2, (k,)

    def part(t: pa.Table) -> pd.DataFrame:
        m = _as_matrix(t[emb_col], np.float64)
        if not len(m):
            return pd.DataFrame({
                "c": pd.array([], dtype="int64"),
                "n": pd.array([], dtype="int64"),
                "inert": pd.array([], dtype="int64"),
                "sums": pd.array([], dtype="object"),
            })
        # nearest centroid by L2: argmin ||x||^2 - 2 x.c + ||c||^2
        d = c_sq[None, :] - 2.0 * (m @ cent.T)
        assign = np.argmin(d, axis=1)
        fixed = np.rint(m * _FP_SCALE).astype(np.int64)
        sums = np.zeros((k, dim), np.int64)
        np.add.at(sums, assign, fixed)
        counts = np.bincount(assign, minlength=k).astype(np.int64)
        # exact fixed-point inertia: per-row squared distance, rounded
        # once per row then summed in int64 (order-independent)
        x_sq = (m * m).sum(axis=1)
        row_inertia = x_sq + d[np.arange(len(m)), assign]
        inert = np.zeros(k, np.int64)
        np.add.at(inert, assign,
                  np.rint(row_inertia * _FP_SCALE).astype(np.int64))
        touched = np.flatnonzero(counts)
        return pd.DataFrame({
            "c": touched.astype(np.int64),
            "n": counts[touched],
            "inert": inert[touched],
            "sums": [sums[i].tobytes() for i in touched],
        })

    return part


def kmeans_fit(ds, k: int, emb_col: str = "embedding", id_col: str = "doc_id",
               iters: int = 10, seed: int = 17):
    """Fit k-means; returns ``(centroids, info)`` where ``centroids`` is a
    float64 ``(k, dim)`` array and ``info`` a DataFrame with per-cluster
    ``cluster / n_rows / inertia`` from the final pass (inertia = summed
    squared L2 distance, fixed-point exact).  Empty clusters keep their
    previous centroid.  Bit-deterministic for a given (k, iters, seed)
    under any partitioning."""
    cent = _init_centroids(ds, k, emb_col, id_col, seed)
    dim = cent.shape[1]
    counts = inert = None
    for _ in range(iters):
        parts = ds.map_batches(
            _partial_fn(cent, emb_col), batch_format="pyarrow",
            zero_copy_batch=True,
        ).to_pandas()
        sums = np.zeros((k, dim), object)  # Python ints: unbounded exact
        counts = np.zeros(k, np.int64)
        inert = np.zeros(k, object)
        # tiny fold: one row per (batch, touched centroid)
        agg = parts.groupby("c", sort=False)
        for c, g in agg:
            counts[c] = g["n"].sum()
            inert[c] = int(g["inert"].astype(object).sum())
            vec = np.zeros(dim, np.int64)
            for b in g["sums"]:
                vec += np.frombuffer(b, np.int64)
            sums[c] = vec
        new = cent.copy()
        for c in range(k):
            if counts[c]:
                new[c] = (sums[c].astype(np.float64) / _FP_SCALE) / counts[c]
        cent = new
    info = pd.DataFrame({
        "cluster": np.arange(k, dtype=np.int64),
        "n_rows": counts if counts is not None else np.zeros(k, np.int64),
        "inertia": np.array(
            [float(v) / _FP_SCALE for v in inert], np.float64
        ) if inert is not None else np.zeros(k),
    })
    return cent, info


def kmeans_assign(ds, centroids: np.ndarray, emb_col: str = "embedding",
                  cluster_col: str = "cluster"):
    """Append the nearest-centroid id — pure per-batch matmul, fuses into
    the read; centroids ride in as a small closure array (ray.put once
    per fit, a few KB)."""
    cent = np.asarray(centroids, np.float64)
    c_sq = (cent * cent).sum(axis=1)

    def tag(t: pa.Table) -> pa.Table:
        m = _as_matrix(t[emb_col], np.float64)
        d = c_sq[None, :] - 2.0 * (m @ cent.T)
        return t.append_column(
            cluster_col, pa.array(np.argmin(d, axis=1).astype(np.int64)))

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
