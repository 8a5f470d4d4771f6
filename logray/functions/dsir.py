"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

Select raw-corpus documents that look like a (small) target corpus:
fit hashed n-gram bag-of-words models over both, score every raw
document with the log-likelihood ratio of its features under the two
models, and resample the top-``n`` after adding per-document Gumbel
noise (Gumbel-top-k == sampling without replacement proportional to
``exp(weight)``; the paper's recipe).

Scale shape — nothing here shuffles:
- each bag-model fit is ONE streaming ``map_batches`` pass emitting a
  fixed ``dim``-length int64 count vector per batch; the driver folds
  the tiny partials with exact integer sums (bit-identical under any
  partitioning);
- scoring is a per-batch hash + scatter-add against the broadcast
  ``dim``-length log-ratio vector — row-local, fuses into the read;
- the global top-``n`` is a per-batch local prune (at most ``n`` rows
  leave each block) folded on the driver, the repo's standard bounded
  top-k shape.

Features are hashed word unigrams + bigrams (the paper's
``n in {1,2}``, 10k buckets): tokens and their hashes come from the
shared Arrow tokenizer :func:`logray.functions.tfidf._token_hashes`
(``lower`` + split on non-alphanumerics + vectorized FNV), and bigram
hashes from a uint64 mix of adjacent token hashes — all vectorized, no
per-row Python.

Determinism: integer count folds, a fixed hash family, and Gumbel noise
derived from the shared deterministic id hash
(:func:`logray.functions.sample._det_hash`) make the selected set
reproducible for a given (dim, seed) under any partitioning or retry.

Reference parity: the two-pass fit/score shape mirrors the reference's
analysis loop (``src/analysis/analysis.cpp`` full re-scan per
statistic); the broadcast log-ratio vector plays the role of the shared
lookup rebuilt between passes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from logray.functions.sample import _det_hash
from logray.functions.tfidf import _token_hashes

__all__ = ["fit_hashed_bag", "dsir_weights", "dsir_sample"]

_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def _feature_buckets(t: pa.Table, text_col: str, dim: int):
    """(parent_row, bucket) per unigram AND bigram feature occurrence."""
    parent, h = _token_hashes(t, text_col)
    uni = (h % np.uint64(dim)).astype(np.int64)
    # bigram where adjacent tokens share a document: mix(h[i], h[i+1])
    adj = parent[1:] == parent[:-1]
    bi_h = (h[:-1] * _MIX) ^ h[1:]
    bi = (bi_h[adj] % np.uint64(dim)).astype(np.int64)
    return (np.concatenate([parent, parent[:-1][adj]]),
            np.concatenate([uni, bi]))


def fit_hashed_bag(ds, text_col: str = "text", dim: int = 4096):
    """One streaming pass -> ``(counts, total)``: per-bucket feature
    occurrence counts (int64, exact) and their sum."""

    def part(t: pa.Table) -> pd.DataFrame:
        t = t.filter(pc.is_valid(t[text_col]))
        _, bucket = _feature_buckets(t, text_col, dim)
        vec = np.bincount(bucket, minlength=dim).astype(np.int64)
        return pd.DataFrame({"c": [vec.tobytes()]})

    parts = ds.map_batches(part, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None).to_pandas()
    counts = np.zeros(dim, np.int64)
    for b in parts["c"]:
        counts += np.frombuffer(b, np.int64)
    return counts, int(counts.sum())


def _log_ratio(target_bag, raw_bag, smooth: float = 0.5) -> np.ndarray:
    """log p_target(bucket) - log p_raw(bucket), Laplace-smoothed."""
    (tc, tn), (rc, rn) = target_bag, raw_bag
    dim = len(tc)
    lt = np.log(tc + smooth) - np.log(tn + smooth * dim)
    lr = np.log(rc + smooth) - np.log(rn + smooth * dim)
    return lt - lr


def dsir_weights(ds, target_ds, text_col: str = "text",
                 id_col: str = "doc_id", dim: int = 4096,
                 smooth: float = 0.5, fitted=None):
    """Per-document importance weight (summed feature log-likelihood
    ratio target vs raw).  Returns a Dataset ``(id_col, dsir_weight)``.
    ``fitted`` is an optional precomputed ``(target_bag, raw_bag)`` pair
    from :func:`fit_hashed_bag` to reuse across selections.

    Note the paper's formulation is a product over feature occurrences,
    so the log weight scales with document LENGTH: a long document sums
    many per-feature ratios (mostly negative when the raw corpus is much
    larger than the target).  Weights rank like-for-like documents;
    pre-chunking to comparable lengths (the paper operates on fixed-size
    chunks) removes the length confound."""
    if fitted is None:
        fitted = (fit_hashed_bag(target_ds, text_col, dim),
                  fit_hashed_bag(ds, text_col, dim))
    lam = _log_ratio(*fitted, smooth=smooth)

    def score(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[text_col]))
        parent, bucket = _feature_buckets(t, text_col, dim)
        w = np.zeros(t.num_rows, np.float64)
        np.add.at(w, parent, lam[bucket])
        return pa.table({id_col: t[id_col], "dsir_weight": pa.array(w)})

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)


def dsir_sample(ds, target_ds, n: int, text_col: str = "text",
                id_col: str = "doc_id", dim: int = 4096,
                smooth: float = 0.5, seed: int = 11, temperature: float = 1.0,
                fitted=None) -> pd.DataFrame:
    """The ``n`` documents selected by Gumbel-top-k over the DSIR
    weights; returns a DataFrame ``(id_col, dsir_weight, dsir_key)``
    sorted by key descending (``dsir_key = weight / temperature +
    Gumbel(id, seed)``; ``temperature -> 0`` approaches deterministic
    top-n by weight).  The key column makes the draw auditable and the
    result order-stable."""
    if temperature <= 0:
        raise ValueError(
            f"temperature must be > 0 (got {temperature}); for a "
            "deterministic top-n by weight sort dsir_weights directly")
    scored = dsir_weights(ds, target_ds, text_col, id_col, dim, smooth,
                          fitted)

    def local_top(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        w = t["dsir_weight"].to_numpy(zero_copy_only=False)
        u = (_det_hash(ids, seed).astype(np.float64) + 0.5) / 2.0**32
        key = w / temperature - np.log(-np.log(u))
        if len(key) > n:
            # full (key desc, id asc) order, NOT argpartition: an exact
            # key tie at the n-boundary must resolve the same way in
            # every partitioning for the selection to be reproducible
            o1 = np.argsort(ids, kind="stable")
            sel = o1[np.argsort(-key[o1], kind="stable")][:n]
            ids, w, key = ids[sel], w[sel], key[sel]
        return pa.table({id_col: pa.array(ids), "dsir_weight": pa.array(w),
                         "dsir_key": pa.array(key)})

    parts = scored.map_batches(local_top, batch_format="pyarrow",
                               zero_copy_batch=True,
                               batch_size=None).to_pandas()
    out = parts.sort_values(["dsir_key", id_col],
                            ascending=[False, True]).head(n)
    return out.reset_index(drop=True)
