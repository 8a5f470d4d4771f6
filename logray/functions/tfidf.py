"""Hashed TF-IDF document vectors: turn raw text into a fixed-dimension
``list<float32>`` embedding column with no vocabulary object at all — each
token hashes straight into one of ``dim`` buckets (the hashing trick), so
the only fitted state is a ``dim``-length document-frequency vector plus a
document count.  The output column feeds every downstream embedding
operator in this engine (``ann_topk``, ``embedding_cosine_dedup``,
``kmeans_fit``) without a model dependency.

Scale shape: two streaming passes.

1. **fit (df)**: per batch, tokenize (Arrow split + flatten), hash tokens
   (vectorized FNV, :func:`logray.functions.fingerprint.content_hash`),
   count each bucket once per document, and emit ONE partial row holding a
   ``dim``-length int64 df vector + the batch's doc count.  The driver
   folds the tiny partials — exact integer sums, so the fitted idf is
   bit-identical under any partitioning.
2. **transform**: per batch, the same tokenize+hash, per-doc bucket counts
   via one ``np.add.at`` scatter, multiply by the broadcast idf, L2
   normalize.  Row-local arithmetic only — deterministic, no shuffle,
   fuses into the read.

idf uses the smoothed convention ``ln((N+1)/(df+1)) + 1`` so unseen
buckets stay finite.

Reference parity: extends the per-field extraction surface
(``src/line_parsing/parsing_basics.cpp``) with a numeric featurization of
the extracted text, the missing input for the similarity operators.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from logray.functions.fingerprint import content_hash

__all__ = ["fit_df", "tfidf_vectors"]


def _token_hashes(t: pa.Table, text_col: str):
    """(parent_row_index, token_hash) per non-empty token of the batch —
    the ONE shared tokenizer every hashed-text operator (tf-idf, DSIR)
    derives features from; change the convention here only."""
    col = t[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # utf8_lower, NOT ascii_lower: DuckDB's lower() is Unicode, and a
    # character whose lowercase is ASCII (e.g. KELVIN SIGN -> 'k') must
    # merge into the surrounding token on both sides identically
    col = pc.utf8_lower(col)
    lists = pc.split_pattern_regex(col, pattern=r"[^0-9a-z]+")
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    keep = np.asarray(pc.not_equal(flat, ""))
    flat, parent = flat.filter(pa.array(keep)), parent[keep]
    return parent.astype(np.int64), content_hash(flat)


def _doc_buckets(t: pa.Table, text_col: str, dim: int):
    """(parent_row_index, bucket_id) per non-empty token of the batch."""
    parent, h = _token_hashes(t, text_col)
    return parent, (h % np.uint64(dim)).astype(np.int64)


def fit_df(ds, text_col: str = "text", dim: int = 256):
    """One streaming pass -> ``(df, n_docs)``: per-bucket document
    frequencies (int64, exact) and the total non-null document count."""

    def part(t: pa.Table) -> pd.DataFrame:
        t = t.filter(pc.is_valid(t[text_col]))
        parent, bucket = _doc_buckets(t, text_col, dim)
        # count a bucket once per doc: unique (parent, bucket) pairs
        pairs = np.unique(parent * dim + bucket)
        df_vec = np.bincount((pairs % dim).astype(np.int64), minlength=dim)
        return pd.DataFrame({
            "df": [df_vec.astype(np.int64).tobytes()],
            "n": [t.num_rows],
        })

    parts = ds.map_batches(part, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None).to_pandas()
    df = np.zeros(dim, np.int64)
    for b in parts["df"]:
        df += np.frombuffer(b, np.int64)
    return df, int(parts["n"].sum())


def tfidf_vectors(ds, text_col: str = "text", id_col: str = "doc_id",
                  dim: int = 256, fitted=None, emb_col: str = "embedding"):
    """Append L2-normalized hashed TF-IDF vectors.  ``fitted`` is the
    ``(df, n_docs)`` pair from :func:`fit_df` (computed here when None —
    pass it explicitly to reuse one fit across several transforms).
    Output: ``(id_col, n_terms, emb_col list<float32>)``; null-text rows
    drop; all-empty documents get a zero vector."""
    if fitted is None:
        fitted = fit_df(ds, text_col=text_col, dim=dim)
    df, n_docs = fitted
    idf = (np.log((n_docs + 1.0) / (df.astype(np.float64) + 1.0)) + 1.0)

    def transform(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[text_col]))
        n = t.num_rows
        parent, bucket = _doc_buckets(t, text_col, dim)
        tf = np.zeros((n, dim), np.float64)
        np.add.at(tf, (parent, bucket), 1.0)
        w = tf * idf[None, :]
        norms = np.sqrt((w * w).sum(axis=1))
        w = np.where(norms[:, None] > 0, w / np.where(norms == 0, 1.0, norms)[:, None], 0.0)
        flat = pa.array(w.astype(np.float32).ravel())
        offs = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32))
        emb = pa.ListArray.from_arrays(offs, flat)
        n_terms = np.bincount(parent, minlength=n).astype(np.int64)
        return pa.table({
            id_col: t[id_col],
            "n_terms": pa.array(n_terms),
            emb_col: emb,
        })

    return ds.map_batches(transform, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
