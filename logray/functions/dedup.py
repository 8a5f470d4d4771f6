"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine.

Scale shapes (documented per operator):

- **exact**: content-hash each row in ``map_batches`` (vectorized FNV), then
  hash-partition ``groupby(content_hash)`` keeping the min-id row per group.
  One shuffle of (hash, id, payload); collision-checked against text equality
  within the group.
- **MinHash-LSH**: shingle -> minhash signature per batch (numpy reduceat),
  explode to (band, band_hash, doc_id, signature) rows, ``groupby`` the band
  key, emit candidate pairs per bucket, verify by signature agreement — the
  classic Broder/LSH pipeline where the only wide op is the band groupby.
  Band rows carry the signature (num_perm*8 bytes) so verification needs no
  second join; at extreme scale swap to a bucketed signature join.
- **SimHash**: 64-bit fingerprint; bucket by 16-bit chunks (any pair within
  hamming distance <= 3 shares at least one of 4 chunks), verify popcount.
- **n-gram Jaccard**: exact char-n-gram set Jaccard for candidate pairs
  inside co-partitioned groups.
- **embedding**: random-hyperplane LSH buckets then exact cosine within
  buckets (numpy matmul per group).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from logray.functions.fingerprint import (
    band_hashes,
    content_hash,
    hamming64,
    minhash_signatures,
    simhash,
)

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the min-``id_col`` row of each distinct ``text_col`` value.
    Hash-partitioned: the shuffle key is the 64-bit content hash."""

    def add_hash(t: pa.Table) -> pa.Table:
        return t.append_column("__h", pa.array(content_hash(t[text_col]).astype(np.int64)))

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        # within a hash group, exact text equality guards collisions
        return g.sort_values(id_col, kind="mergesort").drop_duplicates(text_col, keep="first")

    out = (
        ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__h")
        .map_groups(keep_first, batch_format="pandas")
    )
    return out.drop_columns(["__h"])


# ---------------------------------------------------------------------------
# MinHash + LSH near-dedup
# ---------------------------------------------------------------------------


def _pairs_from_bucket(ids: np.ndarray, sigs: np.ndarray, threshold: float, num_perm: int):
    """Candidate pairs within one bucket verified by signature agreement."""
    order = np.argsort(ids, kind="stable")
    ids, sigs = ids[order], sigs[order]
    out_a, out_b, out_sim = [], [], []
    n = len(ids)
    for i in range(n - 1):
        agree = (sigs[i + 1 :] == sigs[i]).sum(axis=1) / num_perm
        hit = agree >= threshold
        if hit.any():
            js = np.flatnonzero(hit) + i + 1
            for j, s in zip(js, agree[hit]):
                if ids[j] != ids[i]:
                    out_a.append(ids[i]); out_b.append(ids[j]); out_sim.append(float(s))
    return out_a, out_b, out_sim


def minhash_lsh_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    threshold: float = 0.7,
    seed: int = 1,
    distinct: bool = True,
):
    """Near-duplicate PAIRS dataset: (id_a, id_b, est_jaccard), id_a < id_b,
    est_jaccard = fraction of agreeing minhash slots >= threshold.

    ``distinct=False`` skips the second (pair-dedup) shuffle: a pair that
    collides in several bands appears once per colliding band.  Downstream
    consumers that are idempotent over repeats (connected components /
    keep-min dedup) should pass False and save a full shuffle."""

    def explode_bands(t: pa.Table) -> pa.Table:
        sig = minhash_signatures(t[text_col], num_perm=num_perm, k=k, seed=seed)
        bh = band_hashes(sig, bands)
        n = len(sig)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        band_id = np.tile(np.arange(bands, dtype=np.int32), n)
        return pa.table(
            {
                "band_id": pa.array(band_id),
                "band_hash": pa.array(bh.reshape(-1).astype(np.int64)),
                id_col: pa.array(np.repeat(ids, bands)),
                "sig": pa.array(list(np.repeat(sig, bands, axis=0).astype(np.int64))),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "est_jaccard": []})
        ids = g[id_col].to_numpy()
        sigs = np.stack(g["sig"].to_numpy())
        a, b, s = _pairs_from_bucket(ids, sigs, threshold, num_perm)
        return pd.DataFrame({"id_a": a, "id_b": b, "est_jaccard": s})

    pairs = (
        ds.map_batches(explode_bands, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    if not distinct:
        return pairs

    # a pair can surface from several bands: keep one copy
    def drop_dup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"])

    return pairs.groupby(["id_a", "id_b"]).map_groups(drop_dup_pairs, batch_format="pandas")


def connected_components(pairs, id_a: str = "id_a", id_b: str = "id_b") -> pd.DataFrame:
    """Cluster near-duplicate PAIRS into components.

    The pair set is the output of an LSH miner and is orders of magnitude
    smaller than the corpus (only near-duplicates appear), so union-find on
    the driver is the right tool; the distributed alternative for a
    pathological pair volume is iterated min-label propagation with one
    groupby per round.  Returns DataFrame (doc_id, component) where
    component is the minimum id of the cluster; singletons are absent."""
    df = pairs.to_pandas() if not isinstance(pairs, pd.DataFrame) else pairs
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for a, b in zip(df[id_a].astype("int64"), df[id_b].astype("int64")):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    rows = sorted((x, find(x)) for x in parent)
    return pd.DataFrame(
        {"doc_id": pd.array([r[0] for r in rows], dtype="int64"),
         "component": pd.array([r[1] for r in rows], dtype="int64")}
    )


def dedup_keep_min(ds, pairs, id_col: str = "doc_id"):
    """Full near-dedup: keep one representative (the min id) per duplicate
    cluster.  ``pairs`` is a (id_a, id_b) Dataset/DataFrame from any of the
    pair miners; the drop-set (non-minimum cluster members) is broadcast
    once and applied as a vectorized filter inside map_batches."""
    import ray
    import pyarrow.compute as _pc

    comp = connected_components(pairs)
    drop = comp.loc[comp["doc_id"] != comp["component"], "doc_id"].astype("int64").tolist()
    drop_ref = ray.put(drop)

    class DropDups:
        def __init__(self, ref):
            vals = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            self.drop_set = pa.array(vals, pa.int64())

        def __call__(self, t: pa.Table) -> pa.Table:
            keep = _pc.invert(
                _pc.is_in(t[id_col].cast(pa.int64()), value_set=self.drop_set)
            )
            return t.filter(_pc.fill_null(keep, True))

    return ds.map_batches(DropDups, fn_constructor_kwargs=dict(ref=drop_ref),
                          batch_format="pyarrow", concurrency=(1, 8))


# ---------------------------------------------------------------------------
# SimHash near-dedup
# ---------------------------------------------------------------------------


def simhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, k: int = 4):
    """Near-duplicate pairs by SimHash: bucket on each of the four 16-bit
    chunks (pigeonhole: hamming<=3 pairs share a chunk), verify popcount."""

    def explode_chunks(t: pa.Table) -> pa.Table:
        sh = simhash(t[text_col], k=k)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        n = len(sh)
        chunk_id = np.tile(np.arange(4, dtype=np.int32), n)
        rep = np.repeat(sh, 4)
        shifts = (np.tile(np.arange(4, dtype=np.uint64), n) * np.uint64(16))
        chunk = ((rep >> shifts) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table(
            {
                "chunk_id": pa.array(chunk_id),
                "chunk": pa.array(chunk),
                id_col: pa.array(np.repeat(ids, 4)),
                "simhash": pa.array(rep.astype(np.int64)),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        g = g.sort_values(id_col, kind="mergesort")
        ids = g[id_col].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        out_a, out_b, out_h = [], [], []
        for i in range(len(ids) - 1):
            d = hamming64(np.full(len(ids) - i - 1, hs[i], np.uint64), hs[i + 1 :])
            hit = d <= max_hamming
            for j, dv in zip(np.flatnonzero(hit) + i + 1, d[hit]):
                if ids[j] != ids[i]:
                    out_a.append(ids[i]); out_b.append(ids[j]); out_h.append(int(dv))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": out_h})

    pairs = (
        ds.map_batches(explode_chunks, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["chunk_id", "chunk"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    def drop_dup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"])

    return pairs.groupby(["id_a", "id_b"]).map_groups(drop_dup_pairs, batch_format="pandas")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (verification / small candidate sets)
# ---------------------------------------------------------------------------


def _char_ngrams(s: str, n: int) -> set:
    if len(s) < n:
        return {s}
    return {s[i : i + n] for i in range(len(s) - n + 1)}


def ngram_jaccard_pairs(ds, group_cols, text_col: str = "text", id_col: str = "doc_id",
                        n: int = 1, threshold: float = 0.0):
    """Exact char-n-gram Jaccard for all pairs WITHIN each group_cols
    partition (co-partitioned candidate generation; n=1 matches DuckDB's
    ``jaccard`` character-set semantics for the SQL oracle)."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        ids = g[id_col].to_numpy()
        grams = [_char_ngrams(s, n) for s in g[text_col]]
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids) - 1):
            for j in range(i + 1, len(ids)):
                inter = len(grams[i] & grams[j])
                union = len(grams[i] | grams[j])
                jac = inter / union if union else 1.0
                if jac >= threshold:
                    out_a.append(ids[i]); out_b.append(ids[j]); out_j.append(jac)
        res = pd.DataFrame({"id_a": out_a, "id_b": out_b, "jaccard": out_j})
        for c in group_cols:
            res[c] = g[c].iloc[0] if len(g) else None
        return res

    return ds.groupby(group_cols).map_groups(pairs, batch_format="pandas")


# ---------------------------------------------------------------------------
# embedding cosine near-dedup
# ---------------------------------------------------------------------------


def embedding_dedup(ds, emb_col: str = "embedding", id_col: str = "vec_id",
                    threshold: float = 0.95, n_planes: int = 8, seed: int = 2,
                    dtype=np.float32):
    """Near-duplicate pairs by embedding cosine >= threshold.

    Random-hyperplane LSH: bucket = sign pattern of n_planes projections
    (similar vectors collide with high probability), exact cosine verify via
    one matmul per bucket.  Raise n_planes for bigger corpora; recall can be
    traded with multiple plane sets."""

    state = {}

    def planes(d):
        if "p" not in state:
            rng = np.random.default_rng(seed)
            state["p"] = rng.standard_normal((d, n_planes))
        return state["p"]

    def bucketize(t: pa.Table) -> pa.Table:
        emb = np.stack(t[emb_col].to_numpy(zero_copy_only=False)).astype(dtype)
        d = emb.shape[1]
        proj = emb @ planes(d)
        bits = (proj > 0).astype(np.uint64)
        bucket = np.zeros(len(emb), np.uint64)
        for j in range(n_planes):
            bucket = (bucket << np.uint64(1)) | bits[:, j]
        norm = np.linalg.norm(emb, axis=1)
        norm[norm == 0] = 1.0
        unit = (emb / norm[:, None]).astype(dtype)
        return pa.table(
            {
                "bucket": pa.array(bucket.astype(np.int64)),
                id_col: t[id_col],
                "unit": pa.array(list(unit)),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        g = g.sort_values(id_col, kind="mergesort")
        ids = g[id_col].to_numpy()
        u = np.stack(g["unit"].to_numpy())
        sim = u @ u.T
        iu = np.triu_indices(len(ids), k=1)
        hit = sim[iu] >= threshold
        return pd.DataFrame(
            {
                "id_a": ids[iu[0][hit]],
                "id_b": ids[iu[1][hit]],
                "cosine": sim[iu][hit].astype(float),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )


_LABEL_SCHEMA = pa.schema([("doc_id", pa.int64()), ("label", pa.int64())])


def _typed_labels(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return _LABEL_SCHEMA.empty_table()
    return t.select(["doc_id", "label"]).cast(_LABEL_SCHEMA)


def connected_components_distributed(pairs, id_a: str = "id_a", id_b: str = "id_b",
                                     max_rounds: int = 16):
    """Distributed connected components by iterated min-label propagation —
    the scale path for pathological duplicate graphs whose pair set does
    not fit one process (cf. :func:`connected_components`).

    Each round: labels propagate across edges via a bucketed hash join
    (the explicit-partition variant — Ray's native join rejects empty key
    partitions in this version), then a groupby folds each vertex to the
    minimum of its own and received labels.  A component of diameter d converges in O(log d) rounds;
    convergence is detected by an exact label-sum fixpoint.  Returns a
    Dataset (doc_id, component)."""
    from logray.stages.join import _bucketed_join

    def explode(t: pa.Table) -> pa.Table:
        a = t[id_a].cast(pa.int64()).combine_chunks()
        b = t[id_b].cast(pa.int64()).combine_chunks()
        return pa.table(
            {"src": pa.concat_arrays([a, b]), "dst": pa.concat_arrays([b, a])}
        )

    edges = pairs.map_batches(explode, batch_format="pyarrow").materialize()

    def fold_min(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": [g["doc_id"].iloc[0]],
             "label": pd.array([int(g["label"].min())], dtype="int64")}
        )

    # label(v) = min(v, neighbors)
    labels = (
        edges.map_batches(
            lambda t: pa.table(
                {"doc_id": t["src"],
                 "label": pc.min_element_wise(t["src"], t["dst"])}
            ),
            batch_format="pyarrow",
        )
        .groupby("doc_id")
        .map_groups(fold_min, batch_format="pandas")
        # normalize to Arrow blocks with a typed schema: unions must not mix
        # block types, and empty map_groups blocks otherwise lose their
        # schema (which breaks downstream join key resolution)
        .map_batches(_typed_labels, batch_format="pyarrow")
        .materialize()
    )
    prev_sum = labels.sum("label")

    for _ in range(max_rounds):
        # push label(src) to dst via a hash join on src
        pushed = _bucketed_join(
            edges, labels, ("src",), ("doc_id",), "inner", 8
        ).map_batches(
            lambda t: pa.table({"doc_id": t["dst"], "label": t["label"]}),
            batch_format="pyarrow",
        )
        labels = (
            pushed.union(labels)
            .groupby("doc_id")
            .map_groups(fold_min, batch_format="pandas")
            .map_batches(_typed_labels, batch_format="pyarrow")
            .materialize()
        )
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    return labels.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "component": t["label"]}),
        batch_format="pyarrow",
    )
