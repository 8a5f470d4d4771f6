"""BM25 full-text search over a document corpus (Robertson/Sparck-Jones
Okapi BM25), Ray-Data-first.

The key scale observation: only the QUERY terms' document frequencies
matter, never the full vocabulary.  So the engine does two streaming
passes over the corpus and never builds a global inverted index:

1. :func:`corpus_stats` — one partial pass collecting N (docs), total
   token count (-> avgdl) and df per query term.  The per-batch partial
   is a handful of longs; the fold is a driver stream-fold.
2. :func:`bm25_topk` — a scoring pass: each batch computes its docs'
   term-frequency matrix for the tiny query vocabulary (Arrow tokenize +
   one bincount), scores all queries with one matmul against the query
   mask, emits its per-query top-k, and a distributed tree-reduce layer
   collapses per-batch winners before the driver merge (same shape as
   functions/ann.py:_reduced_topk).

Tokenization contract (shared with any SQL twin): lowercase, terms =
maximal ``[a-z0-9]+`` runs.  Scores are float64; ranking ties break by
ascending doc id.  idf = ln((N - df + 0.5)/(df + 0.5) + 1) (the
Lucene-style always-positive variant).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_SPLIT = r"[^a-z0-9]+"


def tokenize_terms(text: str) -> list[str]:
    """The shared query/document tokenizer (driver-side, for queries)."""
    import re

    return [w for w in re.split(TOKEN_SPLIT, text.lower()) if w]


def _doc_tokens(t: pa.Table, col: str):
    """(parent_indices, flat lowercase alnum tokens) for one batch."""
    toks = pc.split_pattern_regex(pc.utf8_lower(t[col]), TOKEN_SPLIT)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    keep = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
    return parent[keep], flat.filter(pa.array(keep))


def corpus_stats(ds, terms: list[str], col: str = "text") -> dict:
    """One streaming pass -> {"n_docs", "avgdl", "df": np.ndarray aligned
    with ``terms``}."""
    term_arr = pa.array(sorted(set(terms)))
    order = {t: i for i, t in enumerate(term_arr.to_pylist())}
    nt = len(term_arr)

    def partial(t: pa.Table) -> pa.Table:
        parent, flat = _doc_tokens(t, col)
        idx = pc.index_in(flat, value_set=term_arr).to_numpy(zero_copy_only=False)
        hit = ~pd.isna(idx)
        df = np.zeros(nt, np.int64)
        if hit.any():
            pairs = np.unique(parent[hit] * nt + idx[hit].astype(np.int64))
            df = np.bincount(pairs % nt, minlength=nt).astype(np.int64)
        return pa.table({
            "term_idx": pa.array(np.arange(-1, nt, dtype=np.int64)),
            "v": pa.array(np.concatenate([[t.num_rows], df])),
            "v2": pa.array(np.concatenate([[len(parent)], np.zeros(nt, np.int64)])),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=None)
    from logray.stages.bucketing import stream_fold

    def fold(tables: list[pa.Table]) -> pa.Table:
        g = pa.concat_tables(tables).group_by(["term_idx"]).aggregate(
            [("v", "sum"), ("v2", "sum")])
        return g.rename_columns(["term_idx", "v", "v2"])

    f = stream_fold(parts, fold)
    if f is None:
        return {"n_docs": 0, "avgdl": 0.0, "df": np.zeros(nt, np.int64),
                "order": order}
    fd = f.to_pandas().set_index("term_idx")
    n_docs = int(fd.loc[-1, "v"])
    n_tokens = int(fd.loc[-1, "v2"])
    df = np.zeros(nt, np.int64)
    present = fd.index[fd.index >= 0].to_numpy()
    df[present] = fd.loc[present, "v"].to_numpy()
    return {"n_docs": n_docs,
            "avgdl": (n_tokens / n_docs) if n_docs else 0.0,
            "df": df, "order": order}


class _BM25Score:
    """Actor: query-term table + idf weights fetched once per actor."""

    def __init__(self, state_ref, k: int, col: str, id_col: str,
                 k1: float, b: float):
        import ray

        s = ray.get(state_ref) if isinstance(state_ref, ray.ObjectRef) else state_ref
        self.terms = pa.array(s["terms"])
        self.idf = s["idf"]            # (T,)
        self.qmask = s["qmask"]        # (nq, T) 0/1
        self.qids = s["qids"]
        self.avgdl = s["avgdl"]
        self.k, self.col, self.id_col, self.k1, self.b = k, col, id_col, k1, b

    def __call__(self, t: pa.Table) -> pd.DataFrame:
        nd = t.num_rows
        ntq = len(self.terms)
        parent, flat = _doc_tokens(t, self.col)
        dl = np.bincount(parent, minlength=nd).astype(np.float64)
        idx = pc.index_in(flat, value_set=self.terms).to_numpy(zero_copy_only=False)
        hit = ~pd.isna(idx)
        tf = np.zeros((nd, ntq), np.float64)
        if hit.any():
            flatk = parent[hit] * ntq + idx[hit].astype(np.int64)
            counts = np.bincount(flatk, minlength=nd * ntq)
            tf = counts.reshape(nd, ntq).astype(np.float64)
        kk = self.k1 * (1.0 - self.b + self.b * dl / self.avgdl) if self.avgdl else \
            np.full(nd, self.k1)
        with np.errstate(invalid="ignore", divide="ignore"):
            contrib = self.idf * (tf * (self.k1 + 1.0)) / (tf + kk[:, None])
        contrib = np.nan_to_num(contrib)
        scores = contrib @ self.qmask.T            # (nd, nq)
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        k = min(self.k, nd)
        rows = {"query_id": [], "doc_id": [], "score": []}
        for qi in range(scores.shape[1]):
            s = scores[:, qi]
            sel = np.argpartition(-s, k - 1)[:k] if k < nd else np.arange(nd)
            rows["query_id"].extend([self.qids[qi]] * len(sel))
            rows["doc_id"].extend(ids[sel].tolist())
            rows["score"].extend(s[sel].tolist())
        return pd.DataFrame({
            "query_id": pd.Series(rows["query_id"], dtype="int64"),
            "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
            "score": pd.Series(rows["score"], dtype="float64"),
        })


def _merge(parts: list[pd.DataFrame], k: int) -> pd.DataFrame:
    parts = [p for p in parts if not p.empty and "query_id" in p.columns]
    if not parts:
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "doc_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64"),
                             "rank": pd.Series([], dtype="int64")})
    df = pd.concat(parts, ignore_index=True)
    df = df.sort_values(["query_id", "score", "doc_id"],
                        ascending=[True, False, True], kind="mergesort")
    df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount().astype("int64")
    return df


def bm25_topk(ds, queries, k: int = 10, col: str = "text",
              id_col: str = "doc_id", k1: float = 1.5, b: float = 0.75,
              stats: dict | None = None, coalesce_rows: int = 1 << 20):
    """Top-k documents per query by BM25.  ``queries`` = list of
    (query_id, query_text).  Two streaming passes (stats + scoring) with
    a tree-reduce winner merge; pass a precomputed ``stats`` (from
    :func:`corpus_stats` over the same corpus/terms) to reuse pass 1
    across query batches."""
    import ray

    q_terms = [tokenize_terms(q) for _, q in queries]
    vocab = sorted({t for ts in q_terms for t in ts})
    if stats is None:
        stats = corpus_stats(ds, vocab, col)
    order = stats["order"]
    nt = len(order)
    n, df = stats["n_docs"], stats["df"]
    idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
    qmask = np.zeros((len(queries), nt), np.float64)
    for qi, ts in enumerate(q_terms):
        for t in set(ts):
            if t in order:
                qmask[qi, order[t]] = 1.0
    state = ray.put({
        "terms": sorted(order, key=order.get),
        "idf": idf, "qmask": qmask,
        "qids": [int(qid) for qid, _ in queries],
        "avgdl": stats["avgdl"],
    })
    scored = ds.map_batches(
        _BM25Score, fn_constructor_args=(state, k, col, id_col, k1, b),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
        concurrency=(1, 8),
    )

    def reduce_partial(d: pd.DataFrame) -> pd.DataFrame:
        if d.empty or "query_id" not in d.columns:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "doc_id": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
        d = d.sort_values(["query_id", "score", "doc_id"],
                          ascending=[True, False, True], kind="mergesort")
        return d.groupby("query_id", sort=True).head(k)

    reduced = scored.map_batches(reduce_partial, batch_format="pandas",
                                 batch_size=coalesce_rows)
    parts = [pd.DataFrame(b) for b in reduced.iter_batches(batch_format="pandas")]
    return _merge(parts, k)
