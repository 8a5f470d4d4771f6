"""Broadcast Bloom-filter prefilter: the scale-path companion of the
exact semi-join.  When the key set is too large to ship as an exact
``is_in`` value set but a shuffle join is overkill, a Bloom filter of the
keys (m bits, k probes) broadcasts once and prunes rows per batch with NO
false negatives — every true member survives; a small false-positive
fraction rides along and is removed by whatever exact operator follows
(semi join, groupby).  ``bloom_prefilter`` + exact verify == exact
semi-join with the shuffle confined to the survivors.

Build shape: per-batch partials emit the deduplicated BIT-INDEX sets (a
few ints per distinct key), never bitmap pages; the driver ORs them into
one packed uint64 bitmap (m/8 bytes) and ``ray.put``s it once.  Probe is
a per-batch vectorized k-probe AND.

Double hashing (Kirsch–Mitzenmacher): index_i = h1 + i*h2 (mod m) from
one 64-bit splitmix-finalized hash — same column hashing rules as the
HLL sketch, so floats/-0.0/NaN canonicalize identically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from logray.functions.sketch import _hash_column

__all__ = ["build_bloom", "bloom_prefilter"]


def _bit_indices(col, m_bits: int, k: int) -> np.ndarray:
    h = _hash_column(col)
    h1 = h % np.uint64(m_bits)
    h2 = (h >> np.uint64(33)) | np.uint64(1)  # odd -> full-period stride
    steps = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + steps[None, :] * h2[:, None])
            % np.uint64(m_bits)).astype(np.int64)


def build_bloom(keys_ds, on: str, m_bits: int = 1 << 22, k: int = 4):
    """One streaming pass over the key dataset -> packed uint64 bitmap
    (m_bits/64 words).  Partials carry deduplicated bit indices, so a
    batch with d distinct keys ships k*d ints, not bitmap pages."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")

    def part(t: pa.Table) -> pd.DataFrame:
        col = t[on]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.drop_null().unique()
        idx = np.unique(_bit_indices(col, m_bits, k).ravel())
        return pd.DataFrame({"idx": [idx.tobytes()]})

    parts = keys_ds.map_batches(part, batch_format="pyarrow",
                                zero_copy_batch=True, batch_size=None)
    bitmap = np.zeros(m_bits // 64, np.uint64)
    for chunk in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        for buf in chunk["idx"].to_pylist():
            idx = np.frombuffer(buf, np.int64)
            np.bitwise_or.at(bitmap, idx >> 6,
                             np.uint64(1) << (idx & 63).astype(np.uint64))
    return bitmap


def bloom_prefilter(ds, bloom, on: str, m_bits: int | None = None,
                    k: int = 4):
    """Keep rows whose key MIGHT be in the filter (no false negatives).
    ``bloom`` is the packed bitmap from :func:`build_bloom` (or an
    ObjectRef to it); it broadcasts via ray.put once, not per batch."""
    ref = bloom if isinstance(bloom, ray.ObjectRef) else ray.put(bloom)
    cache: dict = {}  # resolved once per worker process, not per batch

    def probe(t: pa.Table) -> pa.Table:
        bm = cache.get("bm")
        if bm is None:
            bm = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            cache["bm"] = bm
        mb = m_bits or len(bm) * 64
        col = t[on]
        if t.num_rows == 0:
            return t
        idx = _bit_indices(col, mb, k)
        word = bm[idx >> 6]
        bit = (word >> (idx & 63).astype(np.uint64)) & np.uint64(1)
        hit = bit.astype(bool).all(axis=1)
        # null keys are never members (SQL IN semantics)
        valid = np.asarray(pc.is_valid(col))
        return t.filter(pa.array(hit & valid))

    return ds.map_batches(probe, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
