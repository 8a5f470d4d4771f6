"""Mergeable sketches: HyperLogLog approximate distinct count.

The canonical combiner-shaped aggregate for 100-TB pipelines: each batch
folds into a fixed 2^p-byte register array (vectorized numpy), register
arrays merge by elementwise max (commutative + idempotent, so retries and
repartitioning cannot change the answer — the hash is deterministic), and
the driver folds one tiny array per block.  Standard HLL estimator with
the small-range linear-counting correction (Flajolet et al., 2007).

Relative error ~ 1.04/sqrt(2^p): p=14 (16 KiB) gives ~0.8%.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from logray.functions.fingerprint import content_hash

_GOLD = np.uint64(0x9E3779B97F4A7C15)
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _finalize(v: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: spreads entropy into the HIGH bits (FNV's high
    bits are weak for short similar strings, and HLL reads the top p bits)."""
    v = (v + _GOLD) & _MASK
    v ^= v >> np.uint64(30)
    v = (v * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    v ^= v >> np.uint64(27)
    v = (v * np.uint64(0x94D049BB133111EB)) & _MASK
    v ^= v >> np.uint64(31)
    return v


def _hash_column(col) -> np.ndarray:
    """Deterministic, well-mixed 64-bit hashes of an Arrow column.
    Nulls are dropped first (COUNT DISTINCT semantics ignore them).
    Floats hash by their bit pattern (an int64 cast would collapse every
    value sharing an integer part), with -0.0 and NaN canonicalized so
    equal-comparing values hash equally."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = col.drop_null()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type) \
            or pa.types.is_binary(col.type):
        return _finalize(content_hash(col))
    if pa.types.is_floating(col.type):
        f = col.to_numpy(zero_copy_only=False).astype(np.float64)
        f = f + 0.0  # -0.0 -> 0.0
        f[np.isnan(f)] = np.nan  # canonical NaN bit pattern
        return _finalize(f.view(np.uint64))
    v = col.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    return _finalize(v)


def hll_registers(col, p: int = 14) -> np.ndarray:
    """Fold one column batch into a fresh 2^p uint8 register array."""
    m = 1 << p
    regs = np.zeros(m, np.uint8)
    h = _hash_column(col)
    if not len(h):
        return regs
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = (h << np.uint64(p)) & _MASK
    # rank = leading zeros of w within (64-p) bits, + 1; w fits float64
    # exactly only below 2^53, so split the bit-length computation
    hi = (w >> np.uint64(32)).astype(np.float64)
    lo = (w & np.uint64(0xFFFFFFFF)).astype(np.float64)
    bitlen = np.where(
        hi > 0,
        np.floor(np.log2(np.maximum(hi, 1))) + 33,
        np.where(lo > 0, np.floor(np.log2(np.maximum(lo, 1))) + 1, 0),
    ).astype(np.int64)
    # w is the remaining bits left-aligned in 64: rank = 64 - bitlen(w) + 1,
    # capped at 64-p+1 for w == 0 (all remaining bits zero)
    rank = np.minimum(64 - bitlen + 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> int:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if e <= 2.5 * m and zeros > 0:
        e = m * np.log(m / zeros)  # linear counting, small range
    return int(round(e))


def approx_distinct(ds, col: str, p: int = 14) -> int:
    """Approximate COUNT(DISTINCT col) over a Dataset: per-batch register
    partials (one 2^p-byte row each) stream to the driver and merge by max.
    Deterministic: independent of partitioning, batch order and retries."""

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({"regs": pa.array([hll_registers(t[col], p).tobytes()],
                                          pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=None)
    regs = np.zeros(1 << p, np.uint8)
    for chunk in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        for buf in chunk["regs"]:
            regs = hll_merge(regs, np.frombuffer(buf.as_py(), np.uint8))
    return hll_estimate(regs)
