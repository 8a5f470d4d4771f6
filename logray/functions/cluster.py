"""Distributed k-means over an embedding column (quantized Lloyd's
algorithm).

Scale shape: every iteration is ONE streaming ``map_batches`` pass — each
batch assigns its rows to the nearest centroid and emits one tiny partial
row per touched centroid; the driver folds partials and updates
centroids.  No shuffle ever; per-iteration driver state is O(k * dim).
The input Dataset re-executes per iteration (for repeated passes over
cold storage, materialize or checkpoint the input first).

Determinism: floating-point matmuls are NOT partition-stable (BLAS picks
different blockings for different batch shapes, shifting results by ulps
and flipping near-tie argmins), and float sums depend on addition order.
So the whole fit is EXACT integer arithmetic: vectors and centroids are
quantized to 2^20 fixed point, assignment uses an int64 matmul (numpy's
integer matmul is a plain C loop — shape-independent), per-cluster sums
and split-limb inertia partials are exact int64, and the driver
accumulates in unbounded Python ints.  The fit is therefore bit-identical
under any partitioning, batch order, retry or cluster size.  Initial
centroids are the rows with the k smallest deterministic id hashes (the
bottom-k sketch from :mod:`logray.functions.sample`) —
partition-independent too.

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

_FP = 20  # fixed-point fractional bits
_FP_SCALE = float(1 << _FP)
_INERTIA_SCALE = float(1 << (2 * _FP))  # squared distances carry 2^40
_LIMB = 30  # inertia partials split at 2^30 so int64 batch sums stay exact
_LIMB_MASK = (1 << _LIMB) - 1

__all__ = ["kmeans_fit", "kmeans_assign"]


def _quant(m: np.ndarray) -> np.ndarray:
    return np.rint(np.asarray(m, np.float64) * _FP_SCALE).astype(np.int64)


def _guard(xmax: int, cmax: int, dim: int):
    """Exactness guard: every |xf - cq| dot stays inside int64."""
    if dim * (int(xmax) + int(cmax)) ** 2 >= (1 << 62):
        raise OverflowError(
            "k-means fixed-point bound exceeded: embedding magnitude too "
            "large for exact int64 distances (scale values below "
            f"~{int(np.sqrt((1 << 62) / dim)) >> _FP} in absolute value)"
        )


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
                           zero_copy_batch=True, batch_size=None).to_pandas()
    parts = parts.sort_values(["h", "id"], kind="mergesort").head(k)
    if len(parts) < k:
        raise ValueError(f"k={k} exceeds the dataset's row count")
    return np.stack([np.frombuffer(b, np.float64) for b in parts["vec"]])


def _assign_exact(xf: np.ndarray, cq: np.ndarray) -> np.ndarray:
    """argmin_c ||xf - cq||^2 in exact int64 (ties -> lowest cluster id)."""
    _guard(np.abs(xf).max(initial=0), np.abs(cq).max(initial=0), cq.shape[1])
    cq_sq = (cq * cq).sum(axis=1)  # (k,)
    d = cq_sq[None, :] - 2 * (xf @ cq.T)  # int64 matmul: shape-independent
    return np.argmin(d, axis=1)


def _partial_fn(cq: np.ndarray, emb_col: str):
    """One batch -> exact per-centroid partials (int64; inertia in two
    2^30 limbs so a million-row batch cannot overflow the batch sum)."""
    k, dim = cq.shape

    def part(t: pa.Table) -> pd.DataFrame:
        m = _as_matrix(t[emb_col], np.float64)
        if not len(m):
            return pd.DataFrame({
                "c": pd.array([], dtype="int64"),
                "n": pd.array([], dtype="int64"),
                "in_hi": pd.array([], dtype="int64"),
                "in_lo": pd.array([], dtype="int64"),
                "sums": pd.array([], dtype="object"),
            })
        xf = _quant(m)
        assign = _assign_exact(xf, cq)
        sums = np.zeros((k, dim), np.int64)
        np.add.at(sums, assign, xf)
        counts = np.bincount(assign, minlength=k).astype(np.int64)
        # exact inertia: integer squared distance per row, accumulated as
        # two int64 limbs (hi = >>30, lo = &mask) per cluster
        diff = xf - cq[assign]
        row_in = (diff * diff).sum(axis=1)
        in_hi = np.zeros(k, np.int64)
        in_lo = np.zeros(k, np.int64)
        np.add.at(in_hi, assign, row_in >> _LIMB)
        np.add.at(in_lo, assign, row_in & _LIMB_MASK)
        touched = np.flatnonzero(counts)
        return pd.DataFrame({
            "c": touched.astype(np.int64),
            "n": counts[touched],
            "in_hi": in_hi[touched],
            "in_lo": in_lo[touched],
            "sums": [sums[i].tobytes() for i in touched],
        })

    return part


def kmeans_fit(ds, k: int, emb_col: str = "embedding", id_col: str = "doc_id",
               iters: int = 10, seed: int = 17):
    """Fit quantized k-means; returns ``(centroids, info)`` where
    ``centroids`` is a float64 ``(k, dim)`` array and ``info`` a DataFrame
    with per-cluster ``cluster / n_rows / inertia`` from the final pass
    (inertia = summed squared L2 distance in the 2^20 fixed-point space,
    exact).  Empty clusters keep their previous centroid.
    Bit-deterministic for a given (k, iters, seed) under any
    partitioning — see the module docstring for why that requires
    integer arithmetic."""
    cent = _init_centroids(ds, k, emb_col, id_col, seed)
    dim = cent.shape[1]
    counts = None
    inert = [0] * k
    for _ in range(iters):
        cq = _quant(cent)
        parts = ds.map_batches(
            _partial_fn(cq, emb_col), batch_format="pyarrow",
            zero_copy_batch=True, batch_size=None,
        ).to_pandas()
        sums = [np.zeros(dim, object) for _ in range(k)]  # unbounded ints
        counts = [0] * k
        inert = [0] * k
        # tiny fold: one row per (batch, touched centroid); all exact
        for c, n, hi, lo, b in zip(parts["c"], parts["n"], parts["in_hi"],
                                   parts["in_lo"], parts["sums"]):
            counts[c] += int(n)
            inert[c] += (int(hi) << _LIMB) + int(lo)
            sums[c] += np.frombuffer(b, np.int64)
        new = cent.copy()
        for c in range(k):
            if counts[c]:
                new[c] = (sums[c].astype(np.float64) / _FP_SCALE) / counts[c]
        cent = new
    info = pd.DataFrame({
        "cluster": np.arange(k, dtype=np.int64),
        "n_rows": np.array(counts if counts is not None else [0] * k,
                           np.int64),
        "inertia": np.array([float(v) / _INERTIA_SCALE for v in inert],
                            np.float64),
    })
    return cent, info


def kmeans_assign(ds, centroids: np.ndarray, emb_col: str = "embedding",
                  cluster_col: str = "cluster"):
    """Append the nearest-centroid id with the SAME exact quantized
    distance as the fit (so assignments reproduce bit-for-bit); pure
    per-batch integer matmul, fuses into the read."""
    cq = _quant(centroids)

    def tag(t: pa.Table) -> pa.Table:
        m = _as_matrix(t[emb_col], np.float64)
        assign = (_assign_exact(_quant(m), cq) if len(m)
                  else np.zeros(0, np.int64))
        return t.append_column(cluster_col, pa.array(assign.astype(np.int64)))

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=None)
