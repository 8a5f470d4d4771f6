"""Hashed n-gram language-model perplexity — the CCNet-style quality
signal (Wenzek et al. 2020 score Common Crawl with a KenLM model trained
on Wikipedia; documents are kept/bucketed by perplexity).

This is the same two-stage shape as :mod:`logray.functions.dsir`, with a
Stupid Backoff n-gram model (Brants et al. 2007, "Large Language Models
in Machine Translation") instead of a bag model — Stupid Backoff is the
published web-scale choice precisely because its scores need only raw
counts (no discount fitting), so the fitted state stays a handful of
mergeable int64 count vectors:

- **fit** (:func:`fit_ngram_lm`): ONE streaming ``map_batches`` pass over
  the reference corpus; each batch emits one partial row holding a
  ``dim``-length int64 count vector per order (hashed 1..n-grams) plus
  the token total.  The driver folds the tiny partials with exact
  integer sums — bit-identical under any partitioning, and two fits
  merge by adding vectors (shard the reference corpus freely).
- **score** (:func:`lm_perplexity`): per-batch vectorized lookup of every
  token's highest-order observed gram against the broadcast count
  vectors, Stupid Backoff cascade (``alpha`` per backed-off order),
  segment-mean per document -> ``logprob`` (natural log per token) and
  ``ppl = exp(-logprob)``.  Row-local, fuses into the read, no shuffle.

Tokens and their hashes come from the shared Arrow tokenizer
(:func:`logray.functions.tfidf._token_hashes`); order-k gram hashes
chain adjacent token hashes with the same golden-ratio mix the DSIR
bigrams use, so a k-gram is one uint64 regardless of k.

Hashing caveat (by design, same trade as DSIR/tf-idf): distinct grams
can share a bucket, which inflates their counts slightly; ``dim`` sizes
the collision rate.  Because a gram's bucket count can then exceed its
context's bucket count, the backoff ratio is clamped to 1 (a probability
can't exceed 1; the clamp keeps logprob <= 0 and ppl >= 1).

Reference parity: the fit/score split mirrors the reference's analysis
pass shape (``src/analysis/analysis.cpp`` re-scans the file per
statistic with state built up front); the broadcast count vectors play
the role of its shared lookup tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from logray.functions.tfidf import _token_hashes

__all__ = ["fit_ngram_lm", "lm_perplexity", "perplexity_buckets"]

_MIX = np.uint64(0x9E3779B97F4A7C15)  # shared chaining constant (dsir)


def _gram_hashes(parent: np.ndarray, h: np.ndarray, n: int):
    """Per-order end-aligned gram hashes + per-token usable run length.

    ``grams[k-1][i]`` hashes tokens ``i-k+1 .. i``; it is meaningful iff
    ``run[i] >= k`` (all k tokens share ``parent``).  ``run[i]`` counts
    the token's same-document predecessors + 1, so ``min(run[i], n)`` is
    the highest usable order at position ``i``."""
    m = len(h)
    idx = np.arange(m, dtype=np.int64)
    newdoc = np.ones(m, bool)
    if m > 1:
        newdoc[1:] = parent[1:] != parent[:-1]
    start = np.maximum.accumulate(np.where(newdoc, idx, 0))
    run = idx - start + 1
    grams = [h]
    for k in range(2, n + 1):
        g = np.zeros(m, np.uint64)
        if m >= k:
            g[k - 1:] = (grams[-1][k - 2:-1] * _MIX) ^ h[k - 1:]
        grams.append(g)
    return grams, run


def fit_ngram_lm(ds, text_col: str = "text", n: int = 3, dim: int = 1 << 16):
    """One streaming pass over the reference corpus ->
    ``(counts, total)``: ``counts[k-1]`` is the ``dim``-length int64
    bucket-count vector of hashed k-grams, ``total`` the token count.
    Exact integer folds — bit-identical under any partitioning; two
    fits over corpus shards merge by elementwise addition."""
    if n < 1:
        raise ValueError(f"n must be >= 1 (got {n})")

    def part(t: pa.Table) -> pd.DataFrame:
        t = t.filter(pc.is_valid(t[text_col]))
        parent, h = _token_hashes(t, text_col)
        grams, run = _gram_hashes(parent, h, n)
        row = {}
        for k in range(1, n + 1):
            g = grams[k - 1][run >= k]
            vec = np.bincount((g % np.uint64(dim)).astype(np.int64),
                              minlength=dim).astype(np.int64)
            row[f"c{k}"] = [vec.tobytes()]
        row["total"] = [len(h)]
        return pd.DataFrame(row)

    parts = ds.map_batches(part, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None).to_pandas()
    counts = [np.zeros(dim, np.int64) for _ in range(n)]
    for k in range(1, n + 1):
        for b in parts[f"c{k}"]:
            counts[k - 1] += np.frombuffer(b, np.int64)
    return counts, int(parts["total"].sum())


def lm_perplexity(ds, fitted, text_col: str = "text",
                  id_col: str = "doc_id", dim: int | None = None,
                  alpha: float = 0.4, smooth: float = 0.5,
                  keep_cols: tuple = ()):
    """Score every document under the fitted model: a Dataset
    ``(id_col, n_tokens, logprob, ppl)`` where ``logprob`` is the mean
    natural-log Stupid Backoff score per token and ``ppl`` is
    ``exp(-logprob)`` (null for token-free documents).

    Per token, the score is the highest-order observed gram's
    ``count(gram) / count(context)`` ratio, backing off one order (and
    multiplying by ``alpha``) while the gram bucket is empty; a token
    near its document start simply uses the orders its context supports,
    with no penalty.  The order-1 base is the Laplace-smoothed unigram
    ``(c1 + smooth) / (total + smooth * dim)``.  Null-text rows are
    dropped (the DSIR convention).  ``fitted`` is :func:`fit_ngram_lm`'s return value —
    broadcast once into the scoring tasks, never refit per batch.
    ``dim`` is derived from the fitted vectors; passing it explicitly
    only validates (a fit/score dim mismatch would silently score every
    gram against the wrong bucket)."""
    counts, total = fitted
    n = len(counts)
    if dim is None:
        dim = len(counts[0])
    elif dim != len(counts[0]):
        raise ValueError(
            f"dim={dim} does not match the fitted model "
            f"(len(counts[0]) == {len(counts[0])})")
    base_den = float(total) + smooth * dim

    def score(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[text_col]))
        parent, h = _token_hashes(t, text_col)
        grams, run = _gram_hashes(parent, h, n)
        bkt = [(g % np.uint64(dim)).astype(np.int64) for g in grams]
        s = (counts[0][bkt[0]] + smooth) / base_den
        for k in range(2, n + 1):
            num = counts[k - 1][bkt[k - 1]]
            # context of the k-gram ending at i = (k-1)-gram ending at i-1
            ctx = np.zeros(len(h), np.int64)
            if len(h):
                ctx[1:] = counts[k - 2][bkt[k - 2][:-1]]
            exists = run >= k
            # clamp: hashed num can exceed hashed ctx (collisions land in
            # different buckets per order); a conditional prob is <= 1
            # the extra max(.., 1) only guards the num == 0 rows the mask
            # below discards anyway (0/0 would warn); num > 0 rows divide
            # by max(ctx, num) unchanged
            ratio = num / np.maximum(np.maximum(ctx, num), 1)
            # alpha penalizes an UNSEEN gram; a token without k tokens of
            # context (document start) keeps its lower-order score as-is
            s = np.where(exists & (num > 0), ratio,
                         np.where(exists, alpha * s, s))
        lp_tok = np.log(s)
        n_tok = np.bincount(parent, minlength=t.num_rows).astype(np.int64)
        lp_doc = np.bincount(parent, weights=lp_tok, minlength=t.num_rows)
        has = n_tok > 0
        lp = np.where(has, lp_doc / np.maximum(n_tok, 1), np.nan)
        cols = {id_col: t[id_col]}
        for c in keep_cols:
            cols[c] = t[c]
        cols["n_tokens"] = pa.array(n_tok)
        cols["logprob"] = pa.array(lp, mask=~has)
        cols["ppl"] = pa.array(np.where(has, np.exp(-lp), np.nan), mask=~has)
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)


def perplexity_buckets(ds, fitted, text_col: str = "text",
                       id_col: str = "doc_id", key_col: str = "lang",
                       dim: int | None = None, alpha: float = 0.4,
                       smooth: float = 0.5, qs=(1 / 3, 2 / 3)):
    """CCNet's head/middle/tail split: score every document
    (:func:`lm_perplexity`), take per-``key_col`` exact ``qs`` ppl
    thresholds (Wenzek et al. 2020 cut each language at the terciles of
    its perplexity distribution), and tag each document ``head`` (lowest
    ppl <= q1), ``middle`` (<= q2) or ``tail``.  Returns a Dataset
    ``(id_col, key_col, n_tokens, logprob, ppl, ppl_bucket)``.

    Scale shape: scoring is row-local; the thresholds come from the
    existing bucketed exact-quantile operator over the narrow scored
    projection (one hash(key) shuffle of (key, ppl) rows); the per-key
    threshold table is tiny (|keys| x |qs|) and joins back into a
    per-batch pandas merge — no corpus-wide join."""
    from logray.stages.aggregate import grouped_quantiles

    scored = lm_perplexity(ds, fitted, text_col, id_col, dim, alpha,
                           smooth, keep_cols=(key_col,))
    # the narrow scored projection is consumed twice (threshold pass +
    # tag pass); pin it or the whole scoring pipeline re-runs
    scored = scored.materialize()
    qs = sorted(qs)
    if len(qs) != 2:
        raise ValueError(f"qs must be two quantiles (got {qs})")
    tp = grouped_quantiles(scored.select_columns([key_col, "ppl"]),
                           key_col, "ppl", qs).to_pandas()
    if len(tp):
        thr = tp.pivot_table(index=key_col, columns="q", values="value",
                             dropna=False).reset_index()
        thr.columns = [key_col, "__q1", "__q2"]
    else:  # every document token-free: no thresholds, all buckets null
        thr = pd.DataFrame({key_col: pd.Series([], dtype=object),
                            "__q1": pd.Series([], dtype=np.float64),
                            "__q2": pd.Series([], dtype=np.float64)})

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        m = df[[key_col]].merge(thr, on=key_col, how="left")  # keeps order
        ppl = df["ppl"].to_numpy(np.float64, na_value=np.nan)
        q1 = m["__q1"].to_numpy(np.float64, na_value=np.nan)
        q2 = m["__q2"].to_numpy(np.float64, na_value=np.nan)
        bucket = np.where(ppl <= q1, "head",
                          np.where(ppl <= q2, "middle", "tail"))
        # null ppl (token-free doc) or key with no thresholds -> null
        valid = ~(np.isnan(ppl) | np.isnan(q1) | np.isnan(q2))
        out = df.copy()
        out["ppl_bucket"] = np.where(valid, bucket, None)
        return out

    return scored.map_batches(tag, batch_format="pandas", batch_size=None)
