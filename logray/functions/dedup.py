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

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

logger = logging.getLogger("logray.dedup")

#: Hot-bucket guard: an LSH band bucket larger than this is truncated to its
#: ``max_bucket`` smallest ids before pair emission (boilerplate-heavy web
#: corpora routinely produce degenerate buckets of 1e5+ near-identical docs;
#: unguarded that is O(k^2) comparisons on ONE reducer).  Truncation only
#: degrades recall for the affected bucket — the dropped rows still collide
#: in their other bands — and every truncation is logged (no silent caps).
DEFAULT_MAX_BUCKET = 4096

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


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                num_buckets: int = 64):
    """Keep the min-``id_col`` row of each distinct ``text_col`` value.

    Scale shape: (1) per-batch LOCAL pre-dedup before the shuffle (the
    combiner pattern — duplicate-heavy corpora then ship one candidate row
    per distinct text per batch); (2) shuffle on ``hash(content) %
    num_buckets`` and dedup each BUCKET with one vectorized
    ``drop_duplicates`` — co-located texts share a bucket, and the group
    count is ``num_buckets``, not the number of distinct texts (a
    per-distinct-text ``map_groups`` builds one pandas group per document
    at 1e8+ scale).  Exact text equality inside the bucket guards hash
    collisions.  Size ``num_buckets`` so corpus/num_buckets candidate rows
    fit one worker."""

    def add_hash_and_local_dedup(t: pa.Table) -> pa.Table:
        h = content_hash(t[text_col])
        t = t.append_column("__h", pa.array(h.astype(np.int64)))
        t = t.append_column("__b", pa.array((h % np.uint64(num_buckets)).astype(np.int64)))
        # Arrow-native local pre-dedup: min id per (hash, text), then keep
        # those rows via is_in on the (unique) id — no pandas conversion of
        # the full-corpus text column in this hot map
        mins = t.group_by(["__h", text_col]).aggregate([(id_col, "min")])
        return t.filter(pc.is_in(t[id_col], value_set=mins[f"{id_col}_min"].combine_chunks()))

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        # one whole bucket: vectorized global min-id per (hash, text)
        return g.sort_values(id_col, kind="mergesort").drop_duplicates(
            ["__h", text_col], keep="first"
        )

    out = (
        ds.map_batches(add_hash_and_local_dedup, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(keep_first, batch_format="pandas")
    )
    return out.drop_columns(["__h", "__b"])


# ---------------------------------------------------------------------------
# MinHash + LSH near-dedup
# ---------------------------------------------------------------------------


def _cap_bucket(ids: np.ndarray, max_bucket: int, what: str):
    """Hot-bucket guard: truncate a sorted bucket to its ``max_bucket``
    smallest ids, logging the dropped-pair count (no silent caps)."""
    n = len(ids)
    if n <= max_bucket:
        return slice(None)
    dropped_pairs = n * (n - 1) // 2 - max_bucket * (max_bucket - 1) // 2
    logger.warning(
        "%s: hot bucket of %d rows capped to %d (up to %d candidate pairs "
        "skipped in this bucket; recall for its rows relies on other bands)",
        what, n, max_bucket, dropped_pairs,
    )
    return slice(0, max_bucket)


def _pairs_from_bucket(ids: np.ndarray, sigs: np.ndarray, threshold: float,
                       num_perm: int, max_bucket: int = DEFAULT_MAX_BUCKET,
                       chunk: int = 128):
    """Candidate pairs within one bucket verified by signature agreement.

    Block-wise vectorized: rows are compared a ``chunk`` at a time against
    the rest of the (capped) bucket with one numpy equality reduction —
    no per-row Python loop (a capped 4096-row bucket is ~130 chunk steps)."""
    order = np.argsort(ids, kind="stable")
    ids, sigs = ids[order], sigs[order]
    sel = _cap_bucket(ids, max_bucket, "minhash_lsh")
    ids, sigs = ids[sel], sigs[sel]
    n = len(ids)
    out_a, out_b, out_sim = [], [], []
    col_idx = np.arange(n)
    for s in range(0, n - 1, chunk):
        e = min(s + chunk, n - 1)
        # (c, n-s) fraction of agreeing slots between rows [s:e) and [s:)
        agree = (sigs[s:e, None, :] == sigs[None, s:, :]).sum(axis=2) / num_perm
        upper = col_idx[None, s:] > col_idx[s:e, None]  # strict j > i
        ii, jj = np.nonzero((agree >= threshold) & upper)
        if len(ii):
            gi, gj = ii + s, jj + s
            neq = ids[gi] != ids[gj]
            out_a.append(ids[gi][neq])
            out_b.append(ids[gj][neq])
            out_sim.append(agree[ii, jj][neq].astype(float))
    if not out_a:
        return [], [], []
    return (np.concatenate(out_a), np.concatenate(out_b), np.concatenate(out_sim))


def _explode_bands_fn(text_col: str, id_col: str, num_perm: int, bands: int,
                      k: int, seed: int):
    """map_batches fn: rows -> (band_id, band_hash, id, signature) band rows."""

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

    return explode_bands


def _bucket_pairs_fn(id_col: str, threshold: float, num_perm: int, max_bucket: int):
    """map_groups fn: one (band_id, band_hash) bucket -> verified pairs."""

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "est_jaccard": []})
        ids = g[id_col].to_numpy()
        sigs = np.stack(g["sig"].to_numpy())
        a, b, s = _pairs_from_bucket(ids, sigs, threshold, num_perm, max_bucket)
        return pd.DataFrame({"id_a": a, "id_b": b, "est_jaccard": s})

    return bucket_pairs


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
    max_bucket: int = DEFAULT_MAX_BUCKET,
):
    """Near-duplicate PAIRS dataset: (id_a, id_b, est_jaccard), id_a < id_b,
    est_jaccard = fraction of agreeing minhash slots >= threshold.

    ``distinct=False`` skips the second (pair-dedup) shuffle: a pair that
    collides in several bands appears once per colliding band.  Downstream
    consumers that are idempotent over repeats (connected components /
    keep-min dedup) should pass False and save a full shuffle."""
    pairs = (
        ds.map_batches(
            _explode_bands_fn(text_col, id_col, num_perm, bands, k, seed),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .groupby(["band_id", "band_hash"])
        .map_groups(
            _bucket_pairs_fn(id_col, threshold, num_perm, max_bucket),
            batch_format="pandas",
        )
    )
    if not distinct:
        return pairs
    # a pair can surface from several bands: keep one copy
    return _distinct_pairs(pairs)


def _distinct_pairs(pairs, num_buckets: int = 64):
    """Drop duplicate (id_a, id_b) pairs with a BUCKETED shuffle: group
    count is ``num_buckets``, not the pair count (a groupby on the pair
    itself builds one pandas group per pair)."""

    def tag(t: pa.Table) -> pa.Table:
        # pd.util.hash_array is id-type-generic (int AND string doc ids)
        a = pd.util.hash_array(np.asarray(t["id_a"].to_numpy(zero_copy_only=False))).astype(np.uint64)
        b = pd.util.hash_array(np.asarray(t["id_b"].to_numpy(zero_copy_only=False))).astype(np.uint64)
        h = (a * np.uint64(1000003) + b * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_buckets)
        return t.append_column("__pb", pa.array(h.astype(np.int64)))

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"]).drop(columns="__pb")

    return (
        pairs.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__pb")
        .map_groups(dedup_bucket, batch_format="pandas")
    )


def connected_components(pairs, id_a: str = "id_a", id_b: str = "id_b") -> pd.DataFrame:
    """Cluster near-duplicate PAIRS into components.

    The pair set is the output of an LSH miner and is orders of magnitude
    smaller than the corpus (only near-duplicates appear), so union-find on
    the driver is the right tool; the distributed alternative for a
    pathological pair volume is iterated min-label propagation with one
    groupby per round.  Returns DataFrame (doc_id, component) where
    component is the minimum id of the cluster (the id type's own
    ordering — numeric for ints, lexicographic for string doc ids);
    singletons are absent.  Ids of any orderable type are supported
    directly — real corpora key on string doc ids as often as ints."""
    df = pairs.to_pandas() if not isinstance(pairs, pd.DataFrame) else pairs
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    int_ids = pd.api.types.is_integer_dtype(df[id_a])
    for a, b in zip(df[id_a], df[id_b]):
        if int_ids:
            a, b = int(a), int(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    rows = sorted((x, find(x)) for x in parent)
    dtype = "int64" if int_ids else None
    return pd.DataFrame(
        {"doc_id": pd.array([r[0] for r in rows], dtype=dtype),
         "component": pd.array([r[1] for r in rows], dtype=dtype)}
    )


def hash_pairs_to_int64(pairs, id_a: str = "id_a", id_b: str = "id_b",
                        check_collisions: bool = True):
    """Map a STRING-id pair Dataset to int64-id pairs via content_hash —
    the bridge that lets string-keyed corpora use the int64 CC machinery
    (:func:`connected_components_distributed`).

    The optional collision check is exact and distributed: the hash is a
    function of the id, so collisions can only REDUCE the distinct count —
    ``#distinct(hash) == #distinct(id)`` over the pair vertex set proves
    injectivity on this run's ids (two small shuffles over the pair set)."""

    def hash_fn(t: pa.Table) -> pa.Table:
        return pa.table({
            id_a: pa.array(content_hash(t[id_a]).astype(np.int64)),
            id_b: pa.array(content_hash(t[id_b]).astype(np.int64)),
        })

    hashed = pairs.map_batches(hash_fn, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=None)
    if check_collisions:
        def explode(cols):
            def fn(t: pa.Table) -> pa.Table:
                return pa.table({"v": pa.concat_arrays(
                    [t[c].combine_chunks().cast(pa.string()) if cols == "str"
                     else pa.array(content_hash(t[c]).astype(np.int64))
                     for c in (id_a, id_b)])})
            return fn

        n_ids = (pairs.map_batches(explode("str"), batch_format="pyarrow")
                 .groupby("v").count().count())
        n_hashes = (pairs.map_batches(explode("hash"), batch_format="pyarrow")
                    .groupby("v").count().count())
        if n_ids != n_hashes:
            raise RuntimeError(
                f"id hash collision detected: {n_ids} distinct ids -> "
                f"{n_hashes} distinct hashes; use the driver "
                f"connected_components (type-generic) or re-key the corpus")
    return hashed


def _broadcast_id_filter(ds, ids_ref, id_col: str, keep_members: bool,
                         select_cols=None):
    """Shared broadcast id-set filter behind the dedup keep policies:
    ``keep_members=False`` DROPS the listed ids (keep-min / keep-best
    output), ``True`` KEEPS only them (the pruned score-fetch pass).
    The set ships once via ``ray.put``; each actor casts it to the id
    column's type once and applies one vectorized ``is_in`` per batch."""

    class IdFilter:
        def __init__(self, ref):
            vals = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            self.id_set = vals if isinstance(vals, pa.Array) else pa.array(vals)
            self._cast_set = None

        def __call__(self, t: pa.Table) -> pa.Table:
            if self._cast_set is None:
                self._cast_set = (self.id_set.cast(t[id_col].type)
                                  if len(self.id_set) else
                                  pa.array([], t[id_col].type))
            hit = pc.is_in(t[id_col], value_set=self._cast_set)
            if keep_members:
                t = t.filter(pc.fill_null(hit, False))
                return t.select(select_cols) if select_cols else t
            return t.filter(pc.fill_null(pc.invert(hit), True))

    return ds.map_batches(IdFilter, fn_constructor_kwargs=dict(ref=ids_ref),
                          batch_format="pyarrow", concurrency=(1, 8))


def dedup_keep_min(ds, pairs, id_col: str = "doc_id", distributed: bool = False,
                   num_shards: int = 8):
    """Full near-dedup: keep one representative per duplicate cluster.
    ``pairs`` is a (id_a, id_b) Dataset/DataFrame from any of the pair
    miners; the drop-set (non-representative cluster members) is broadcast
    once and applied as a vectorized filter inside map_batches.

    Ids may be ints OR strings.  Driver path (default): type-generic
    union-find, representative = minimum id.  ``distributed=True`` routes
    through the sharded-actor CC for pathological pair volumes; string ids
    are hashed to int64 first (exact collision check, see
    :func:`hash_pairs_to_int64`) and the representative becomes the
    min-HASH member — deterministic, but not the lexicographic minimum."""
    import ray
    import pyarrow.compute as _pc

    if distributed:
        sch = pairs.schema()
        atype = dict(zip(sch.names, sch.types))["id_a"]
        string_ids = not pa.types.is_integer(atype)
        hp = hash_pairs_to_int64(pairs) if string_ids else pairs
        comp_ds = connected_components_distributed(hp, num_shards=num_shards)
        drop_df = comp_ds.map_batches(
            lambda t: t.filter(pc.not_equal(t["doc_id"], t["component"])),
            batch_format="pyarrow", batch_size=None,
        ).to_pandas()
        drop = drop_df["doc_id"].tolist()
        drop_ref = ray.put(drop)

        class DropHashed:
            def __init__(self, ref):
                vals = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
                self.drop_set = pa.array(vals, pa.int64())

            def __call__(self, t: pa.Table) -> pa.Table:
                probe = (pa.array(content_hash(t[id_col]).astype(np.int64))
                         if string_ids else t[id_col].cast(pa.int64()))
                keep = _pc.invert(_pc.is_in(probe, value_set=self.drop_set))
                return t.filter(_pc.fill_null(keep, True))

        return ds.map_batches(DropHashed, fn_constructor_kwargs=dict(ref=drop_ref),
                              batch_format="pyarrow", concurrency=(1, 8))

    comp = connected_components(pairs)
    drop = comp.loc[comp["doc_id"] != comp["component"], "doc_id"].tolist()
    return _broadcast_id_filter(ds, ray.put(drop), id_col,
                                keep_members=False)


# ---------------------------------------------------------------------------
# SimHash near-dedup
# ---------------------------------------------------------------------------


def simhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, k: int = 4,
                  max_bucket: int = DEFAULT_MAX_BUCKET,
                  distinct: bool = True):
    """Near-duplicate pairs by SimHash: bucket on each of the four 16-bit
    chunks (pigeonhole: hamming<=3 pairs share a chunk), verify popcount.

    ``distinct=False`` skips the pair-dedup shuffle (a pair surfacing from
    several chunks repeats); idempotent consumers (components/keep-min)
    should pass False — same contract as :func:`minhash_lsh_dedup`."""

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
        sel = _cap_bucket(ids, max_bucket, "simhash")
        ids, hs = ids[sel], hs[sel]
        n = len(ids)
        out_a, out_b, out_h = [], [], []
        col_idx = np.arange(n)
        chunk = 512
        for s in range(0, n - 1, chunk):
            e = min(s + chunk, n - 1)
            # (c, n-s) pairwise hamming distances, block-vectorized
            d = hamming64(hs[s:e, None], hs[None, s:])
            upper = col_idx[None, s:] > col_idx[s:e, None]
            ii, jj = np.nonzero((d <= max_hamming) & upper)
            if len(ii):
                gi, gj = ii + s, jj + s
                neq = ids[gi] != ids[gj]
                out_a.append(ids[gi][neq])
                out_b.append(ids[gj][neq])
                out_h.append(d[ii, jj][neq].astype(np.int64))
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "hamming": np.concatenate(out_h)})

    pairs = (
        ds.map_batches(explode_chunks, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["chunk_id", "chunk"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    if not distinct:
        return pairs
    return _distinct_pairs(pairs)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (verification / small candidate sets)
# ---------------------------------------------------------------------------


def _char_ngrams(s: str, n: int) -> set:
    if len(s) < n:
        return {s}
    return {s[i : i + n] for i in range(len(s) - n + 1)}


def ngram_jaccard_pairs(ds, group_cols, text_col: str = "text", id_col: str = "doc_id",
                        n: int = 1, threshold: float = 0.0,
                        max_bucket: int = DEFAULT_MAX_BUCKET, chunk: int = 128):
    """Exact char-n-gram Jaccard for all pairs WITHIN each group_cols
    partition (co-partitioned candidate generation; n=1 matches DuckDB's
    ``jaccard`` character-set semantics for the SQL oracle).

    Block-vectorized: each group builds a docs x distinct-grams presence
    matrix (gram vocabulary factorized per group), pairwise intersections
    come from CHUNKED matmuls (|A ∩ B| = a·b, |A ∪ B| = |a|+|b|-a·b) — no
    Python set ops per pair.  Groups larger than ``max_bucket`` are capped
    to their smallest ids with the dropped-pair count logged (the same
    guard as the LSH miners): this is a verification op for co-partitioned
    candidate groups, not a corpus-scale miner."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        ids = g[id_col].to_numpy()
        sel = _cap_bucket(ids, max_bucket, "ngram_jaccard")
        g = g.iloc[sel]
        ids = ids[sel]
        d = len(ids)
        empty = pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
        if d < 2:
            res = empty
        else:
            vocab: dict = {}
            ri, ci = [], []
            for i, s in enumerate(g[text_col]):
                for gram in _char_ngrams(s, n):
                    ci.append(vocab.setdefault(gram, len(vocab)))
                    ri.append(i)
            A = np.zeros((d, max(len(vocab), 1)), np.uint8)
            if ri:
                A[ri, ci] = 1
            sizes = A.sum(axis=1).astype(np.int64)
            At = A.astype(np.uint32)
            out_a, out_b, out_j = [], [], []
            col_idx = np.arange(d)
            for s0 in range(0, d - 1, chunk):
                e0 = min(s0 + chunk, d - 1)
                inter = (At[s0:e0] @ At.T).astype(np.int64)  # (c, d)
                union = sizes[s0:e0, None] + sizes[None, :] - inter
                jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
                upper = col_idx[None, :] > col_idx[s0:e0, None]
                ii, jj = np.nonzero((jac >= threshold) & upper)
                if len(ii):
                    out_a.append(ids[ii + s0])
                    out_b.append(ids[jj])
                    out_j.append(jac[ii, jj])
            res = (pd.DataFrame({
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "jaccard": np.concatenate(out_j),
            }) if out_a else empty)
        for c in group_cols:
            res[c] = g[c].iloc[0] if len(g) else None
        return res

    return ds.groupby(group_cols).map_groups(pairs, batch_format="pandas")


def containment_pairs(ds, group_cols, text_col: str = "text",
                      id_col: str = "doc_id", threshold: float = 0.8,
                      max_bucket: int = DEFAULT_MAX_BUCKET, chunk: int = 128):
    """Exact word-set CONTAINMENT for all pairs within each group_cols
    partition: cont_a = |words(A) ∩ words(B)| / |words(A)| (how much of A
    lives inside B) and symmetrically cont_b.  Jaccard misses the
    doc-in-doc case — a short doc fully quoted inside a long one has low
    Jaccard but containment 1.0; this is the miner for quote/subset
    duplication (drop the contained side, keep the superset).

    A pair is emitted when max(cont_a, cont_b) >= threshold, ordered
    id_a < id_b.  Tokens are ``text.split(" ")`` distinct sets (DuckDB
    ``string_split`` semantics, empty tokens included) so the SQL twin is
    bit-exact: identical integer operands divide to identical float64 on
    both sides.

    Scale shape: same as :func:`ngram_jaccard_pairs` — co-partitioned
    candidate groups, per-group docs x distinct-words presence matrix,
    chunked matmul intersections, the hot-group cap with logged drops;
    a verification op for co-partitioned groups, not a corpus miner."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        ids = g[id_col].to_numpy()
        sel = _cap_bucket(ids, max_bucket, "containment")
        g = g.iloc[sel]
        ids = ids[sel]
        d = len(ids)
        empty = pd.DataFrame({"id_a": [], "id_b": [],
                              "cont_a": [], "cont_b": []})
        if d < 2:
            res = empty
        else:
            vocab: dict = {}
            ri, ci = [], []
            for i, s in enumerate(g[text_col]):
                for w in set(s.split(" ")):
                    ci.append(vocab.setdefault(w, len(vocab)))
                    ri.append(i)
            A = np.zeros((d, max(len(vocab), 1)), np.uint8)
            if ri:
                A[ri, ci] = 1
            sizes = A.sum(axis=1).astype(np.int64)
            At = A.astype(np.uint32)
            out_a, out_b, out_ca, out_cb = [], [], [], []
            col_idx = np.arange(d)
            for s0 in range(0, d - 1, chunk):
                e0 = min(s0 + chunk, d - 1)
                inter = (At[s0:e0] @ At.T).astype(np.int64)  # (c, d)
                ca = inter / np.maximum(sizes[s0:e0, None], 1)
                cb = inter / np.maximum(sizes[None, :], 1)
                upper = col_idx[None, :] > col_idx[s0:e0, None]
                keep = (np.maximum(ca, cb) >= threshold) & upper
                ii, jj = np.nonzero(keep)
                if len(ii):
                    out_a.append(ids[ii + s0])
                    out_b.append(ids[jj])
                    out_ca.append(ca[ii, jj])
                    out_cb.append(cb[ii, jj])
            res = (pd.DataFrame({
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cont_a": np.concatenate(out_ca),
                "cont_b": np.concatenate(out_cb),
            }) if out_a else empty)
        for c in group_cols:
            res[c] = g[c].iloc[0] if len(g) else None
        return res

    return ds.groupby(group_cols).map_groups(pairs, batch_format="pandas")


def containment_pairs_sql(table: str, group_col: str, text_col: str = "text",
                          id_col: str = "doc_id",
                          threshold: float = 0.8) -> str:
    """DuckDB twin of :func:`containment_pairs` (single group column)."""
    return (
        f"WITH d AS (SELECT DISTINCT {id_col}, {group_col}, "
        f"unnest(string_split({text_col}, ' ')) AS w FROM {table}), "
        f"s AS (SELECT {id_col}, count(*) AS n FROM d GROUP BY {id_col}), "
        f"i AS (SELECT a.{id_col} AS ia, b.{id_col} AS ib, "
        f"a.{group_col} AS g, count(*) AS inter "
        f"FROM d a JOIN d b ON a.w = b.w AND a.{group_col} = b.{group_col} "
        f"AND a.{id_col} < b.{id_col} GROUP BY 1, 2, 3) "
        f"SELECT ia AS id_a, ib AS id_b, "
        f"inter * 1.0 / sa.n AS cont_a, inter * 1.0 / sb.n AS cont_b, "
        f"g AS {group_col} FROM i "
        f"JOIN s sa ON sa.{id_col} = ia JOIN s sb ON sb.{id_col} = ib "
        f"WHERE greatest(inter * 1.0 / sa.n, inter * 1.0 / sb.n) "
        f">= {threshold}"
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dedup
# ---------------------------------------------------------------------------


def embedding_dedup(ds, emb_col: str = "embedding", id_col: str = "vec_id",
                    threshold: float = 0.95, n_planes: int = 8, seed: int = 2,
                    dtype=np.float32, max_bucket: int = DEFAULT_MAX_BUCKET,
                    n_tables: int = 1):
    """Near-duplicate pairs by embedding cosine >= threshold.

    Random-hyperplane LSH: bucket = sign pattern of n_planes projections
    (similar vectors collide with high probability), exact cosine verify
    via CHUNKED matmuls per bucket (bounded memory even for a degenerate
    bucket) with the hot-bucket cap applied (all-identical embeddings land
    in one bucket; uncapped that is an O(k^2) similarity matrix on one
    reducer).  Raise n_planes for bigger corpora; ``n_tables`` > 1 trades
    work for RECALL: each table is an independent plane set (seeded
    seed+t), rows explode to one bucket row per table, and a pair
    survives if it collides in ANY table (duplicate emissions removed
    with the bucketed distinct shuffle)."""

    state = {}

    def planes(d):
        if "p" not in state:
            state["p"] = [
                np.random.default_rng(seed + ti).standard_normal((d, n_planes))
                for ti in range(n_tables)
            ]
        return state["p"]

    def bucketize(t: pa.Table) -> pa.Table:
        emb = np.stack(t[emb_col].to_numpy(zero_copy_only=False)).astype(dtype)
        n = len(emb)
        d = emb.shape[1]
        norm = np.linalg.norm(emb, axis=1)
        norm[norm == 0] = 1.0
        unit = (emb / norm[:, None]).astype(dtype)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        buckets = np.empty((n_tables, n), np.uint64)
        for ti, p in enumerate(planes(d)):
            bits = (emb @ p > 0).astype(np.uint64)
            b = np.zeros(n, np.uint64)
            for j in range(n_planes):
                b = (b << np.uint64(1)) | bits[:, j]
            buckets[ti] = b
        return pa.table(
            {
                "table_id": pa.array(np.repeat(np.arange(n_tables, dtype=np.int32), n)),
                "bucket": pa.array(buckets.reshape(-1).astype(np.int64)),
                id_col: pa.array(np.tile(ids, n_tables)),
                "unit": pa.array(list(np.tile(unit, (n_tables, 1)))),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        g = g.sort_values(id_col, kind="mergesort")
        ids = g[id_col].to_numpy()
        u = np.stack(g["unit"].to_numpy())
        sel = _cap_bucket(ids, max_bucket, "embedding_lsh")
        ids, u = ids[sel], u[sel]
        n = len(ids)
        out_a, out_b, out_c = [], [], []
        col_idx = np.arange(n)
        chunk = 1024
        for s in range(0, n - 1, chunk):
            e = min(s + chunk, n - 1)
            sim = u[s:e] @ u.T  # (c, n) bounded by chunk * max_bucket
            upper = col_idx[None, :] > col_idx[s:e, None]
            ii, jj = np.nonzero((sim >= threshold) & upper)
            if len(ii):
                out_a.append(ids[ii + s])
                out_b.append(ids[jj])
                out_c.append(sim[ii, jj].astype(float))
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cosine": np.concatenate(out_c),
            }
        )

    pairs = (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["table_id", "bucket"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    if n_tables == 1:
        return pairs
    return _distinct_pairs(pairs)


_LABEL_SCHEMA = pa.schema([("doc_id", pa.int64()), ("label", pa.int64())])


def _typed_labels(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return _LABEL_SCHEMA.empty_table()
    return t.select(["doc_id", "label"]).cast(_LABEL_SCHEMA)


def _cc_owner(v: np.ndarray, num_shards: int) -> np.ndarray:
    """Shard owner of a vertex id: multiplicative hash partition."""
    return (((v.astype(np.uint64) * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF))
            % np.uint64(num_shards)).astype(np.int64)


@ray.remote(num_cpus=0)
class _CCShard:
    """One hash partition of the connected-components label index.

    ``num_cpus=0``: the shard is an index holder that reacts to short
    vectorized message bursts; reserving whole CPUs for B idle actors would
    starve the Dataset tasks that feed them (and deadlocks a small cluster).

    The vertex->label map LIVES on this actor across rounds (the shared
    mutable index the Dataset API cannot express without re-shuffling the
    whole label table every round); only small message arrays move between
    shards.  All per-shard work is vectorized numpy (searchsorted lookups,
    ``np.minimum.at`` scatter-min) — no per-vertex Python objects."""

    def __init__(self, shard_id: int, num_shards: int):
        self.id = shard_id
        self.B = num_shards
        self._src_parts: list[np.ndarray] = []
        self._dst_parts: list[np.ndarray] = []
        self.verts = np.zeros(0, np.int64)
        self.labels = np.zeros(0, np.int64)
        self._pending_req: tuple[np.ndarray, np.ndarray] | None = None

    def add_edges(self, src: np.ndarray, dst: np.ndarray) -> int:
        self._src_parts.append(np.asarray(src, np.int64))
        self._dst_parts.append(np.asarray(dst, np.int64))
        return len(src)

    def build(self) -> int:
        """Freeze edges (DEDUPED — relaxation is min-scatter, so parallel
        edges are pure message traffic, and the distinct count is what
        the checkpoint meta validates: per-batch dedup upstream makes a
        raw count depend on block boundaries, which would refuse a
        legitimate resume under different read parallelism), init
        label(v) = min(v, local out-neighbors)."""
        src = np.concatenate(self._src_parts) if self._src_parts else np.zeros(0, np.int64)
        dst = np.concatenate(self._dst_parts) if self._dst_parts else np.zeros(0, np.int64)
        self._src_parts, self._dst_parts = [], []
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        if len(src):
            first = np.r_[True, (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])]
            src, dst = src[first], dst[first]
        self.src, self.dst = src, dst
        self.verts, starts = np.unique(self.src, return_index=True)
        self.labels = self.verts.copy()
        if len(self.src):
            np.minimum.at(self.labels,
                          np.searchsorted(self.verts, self.src),
                          self.dst)
        return len(self.verts)

    def _lookup(self, v: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self.verts, v)
        return self.labels[idx]

    def _apply_min(self, v: np.ndarray, lab: np.ndarray) -> None:
        if len(v):
            np.minimum.at(self.labels, np.searchsorted(self.verts, v), lab)

    def emit_a(self):
        """Per-dest-shard messages: relax (dst, label[src]) + pointer-
        doubling requests (l=label[v], v)."""
        relax_v = self.dst
        relax_lab = self._lookup(self.src) if len(self.src) else np.zeros(0, np.int64)
        req_l = self.labels
        req_v = self.verts
        own_r = _cc_owner(relax_v, self.B)
        own_q = _cc_owner(req_l, self.B)
        out = []
        for j in range(self.B):
            mr, mq = own_r == j, own_q == j
            out.append((relax_v[mr], relax_lab[mr], req_l[mq], req_v[mq]))
        return out if self.B > 1 else out[0]

    def apply_a(self, *msgs) -> int:
        rv = [m[0] for m in msgs]; rl = [m[1] for m in msgs]
        self._apply_min(np.concatenate(rv), np.concatenate(rl))
        self._pending_req = (np.concatenate([m[2] for m in msgs]),
                             np.concatenate([m[3] for m in msgs]))
        return 0

    def emit_b(self):
        """Answer pointer requests: for each (l, v) deliver (v, label[l])."""
        l, v = self._pending_req
        self._pending_req = None
        lab = self._lookup(l) if len(l) else np.zeros(0, np.int64)
        own = _cc_owner(v, self.B)
        out = []
        for j in range(self.B):
            m = own == j
            out.append((v[m], lab[m]))
        return out if self.B > 1 else out[0]

    def apply_b(self, *msgs) -> int:
        self._apply_min(np.concatenate([m[0] for m in msgs]),
                        np.concatenate([m[1] for m in msgs]))
        return int(len(self.verts))

    def label_sum(self) -> int:
        return int(self.labels.sum())

    def edge_count(self) -> int:
        return len(self.src)

    def dump_state(self, path: str) -> int:
        from logray.functions.graph import _dump_shard_state

        return _dump_shard_state(
            path, {"node": self.verts, "label": self.labels})

    def load_state(self, path: str) -> int:
        from logray.functions.graph import _load_shard_state

        t = _load_shard_state(path, self.verts)
        self.labels = t["label"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        return len(self.verts)

    def labels_table(self) -> pa.Table:
        if not len(self.verts):
            return pa.schema([("doc_id", pa.int64()),
                              ("component", pa.int64())]).empty_table()
        return pa.table({"doc_id": pa.array(self.verts),
                         "component": pa.array(self.labels)})


def connected_components_distributed(pairs, id_a: str = "id_a", id_b: str = "id_b",
                                     max_rounds: int = 16, num_shards: int = 8,
                                     checkpoint: str | None = None,
                                     checkpoint_every: int = 1,
                                     _fault=None):
    """Distributed connected components — the scale path for pathological
    duplicate graphs whose pair set does not fit one process
    (cf. :func:`connected_components`).

    Shape: ``num_shards`` actors each own one hash partition of the
    vertex->label index, held in actor memory ACROSS rounds (a shared
    mutable index — the documented case for raw Ray actors; a pure Dataset
    loop re-shuffles the full label table 2-3 times per round, paying the
    all-to-all fixed cost O(rounds) times).  Each round exchanges two
    vectorized message waves: (1) edge relaxation ``label[dst] <-
    min(label[dst], label[src])`` and (2) pointer doubling ``label[v] <-
    label[label[v]]``, which makes convergence O(log diameter) rounds
    (plain relaxation alone is O(diameter)).  Labels only decrease, so the
    exact fixpoint is detected by an unchanged global label sum; exhausting
    ``max_rounds`` without the fixpoint raises instead of silently
    returning split components.  Returns a Dataset (doc_id, component)
    where component is the minimum id of the cluster.

    ``checkpoint`` / ``checkpoint_every`` / ``_fault``: same
    per-round snapshot-and-resume protocol as the PageRank family
    (graph._ckpt_*): labels snapshot post-round, a resumed run reloads
    the newest committed round and continues toward the fixpoint
    (labels only decrease, so resuming AT the fixpoint just re-detects
    it one round later — bit-equal output either way)."""
    from logray.functions.graph import _ckpt_commit, _ckpt_load, _ckpt_open

    B = num_shards
    man = None
    start = 0
    if checkpoint is not None:
        man, start = _ckpt_open(checkpoint, {
            "algo": "connected_components", "id_a": id_a, "id_b": id_b,
            "num_shards": B,
        }, max_rounds, checkpoint_every)
    shards = [_CCShard.remote(i, B) for i in range(B)]  # type: ignore[attr-defined]

    def push(t: pa.Table) -> pa.Table:
        a = t[id_a].cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = t[id_b].cast(pa.int64()).to_numpy(zero_copy_only=False)
        src = np.concatenate([a, b]); dst = np.concatenate([b, a])
        own = _cc_owner(src, B)
        acks = []
        for j in range(B):
            m = own == j
            if m.any():
                acks.append(shards[j].add_edges.remote(src[m], dst[m]))
        ray.get(acks)
        return pa.table({"n": pa.array([len(a)], pa.int64())})

    pairs.map_batches(push, batch_format="pyarrow").materialize()
    counts = ray.get([s.build.remote() for s in shards])

    meta = None
    if man is not None:
        meta = {"n_total": int(sum(counts)), "edges": int(sum(ray.get(
            [s.edge_count.remote() for s in shards])))}
        if start:
            _ckpt_load(man, start, shards, meta)
    prev_sum = sum(ray.get([s.label_sum.remote() for s in shards]))
    converged = False
    for it in range(start, max_rounds):
        if _fault is not None:
            _fault("round", it)
        outs = [s.emit_a.options(num_returns=B).remote() if B > 1
                else [s.emit_a.remote()] for s in shards]
        ray.get([shards[j].apply_a.remote(*[outs[i][j] for i in range(B)])
                 for j in range(B)])
        outs = [s.emit_b.options(num_returns=B).remote() if B > 1
                else [s.emit_b.remote()] for s in shards]
        ray.get([shards[j].apply_b.remote(*[outs[i][j] for i in range(B)])
                 for j in range(B)])
        cur_sum = sum(ray.get([s.label_sum.remote() for s in shards]))
        done = it + 1
        if man is not None and (done % checkpoint_every == 0
                                or cur_sum == prev_sum):
            _ckpt_commit(man, done, shards, meta)
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum

    if not converged:
        for s in shards:
            ray.kill(s)
        raise RuntimeError(
            f"connected_components_distributed did not reach a fixpoint in "
            f"{max_rounds} rounds; raise max_rounds (each round doubles the "
            f"propagation horizon, so this indicates an extreme graph)"
        )

    import ray.data as rd

    out = rd.from_arrow_refs([s.labels_table.remote() for s in shards])
    return out.materialize()


# ---------------------------------------------------------------------------
# edit-distance (Levenshtein) verification
# ---------------------------------------------------------------------------


def _char_codes(strings, max_len: int):
    """Pad each string's ``max_len``-CODEPOINT prefix, as UTF-8 BYTES,
    into an int32 matrix — DuckDB's ``levenshtein`` edits bytes while its
    ``substring`` slices codepoints, so parity needs exactly this mix."""
    bufs = [s[:max_len].encode("utf-8") for s in strings]
    k = len(bufs)
    width = max((len(b) for b in bufs), default=1) or 1
    arr = np.zeros((k, width), np.int32)
    lens = np.zeros(k, np.int64)
    for i, b in enumerate(bufs):
        lens[i] = len(b)
        if b:
            arr[i, : len(b)] = np.frombuffer(b, np.uint8)
    return arr, lens


def _lev_block(a: np.ndarray, len_a: np.ndarray,
               b: np.ndarray, len_b: np.ndarray) -> np.ndarray:
    """Levenshtein distance for K (a, b) pairs at once: one
    Wagner-Fischer sweep whose cells are K-vectors, so the Python loop is
    O(la * lb) regardless of pair count.  Each pair's answer is captured
    on the row where its `a` ends (dp[len_a][len_b])."""
    k, la = a.shape
    lb = b.shape[1]
    prev = np.tile(np.arange(lb + 1, dtype=np.int32), (k, 1))
    ans = np.where(len_a == 0, len_b, 0).astype(np.int64)
    for i in range(1, int(len_a.max(initial=0)) + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = a[:, i - 1]
        for j in range(1, lb + 1):
            sub = prev[:, j - 1] + (ai != b[:, j - 1])
            cur[:, j] = np.minimum(np.minimum(prev[:, j], cur[:, j - 1]) + 1,
                                   sub)
        done = len_a == i
        if done.any():
            ans[done] = cur[done, len_b[done]]
        prev = cur
    return ans


def edit_distance_pairs(ds, group_cols, text_col: str = "text",
                        id_col: str = "doc_id", max_dist: int | None = None,
                        max_len: int = 64,
                        max_bucket: int = DEFAULT_MAX_BUCKET,
                        chunk: int = 4096):
    """Exact Levenshtein distance between the ``max_len``-codepoint
    prefixes of all pairs WITHIN each group_cols partition
    (co-partitioned candidate verification, the edit-distance sibling of
    :func:`ngram_jaccard_pairs`).  Distances are BYTE-level over the
    codepoint-sliced prefix — exactly DuckDB's ``levenshtein`` over
    ``substring(...)``, which is what the twin computes.  ``max_dist`` keeps only pairs at or under the
    threshold; None emits every pair with its distance.

    The DP is pair-vectorized (:func:`_lev_block`): cost is
    O(la * lb) numpy sweeps over ``chunk`` pairs at a time, never a
    Python loop per pair.  Groups larger than ``max_bucket`` are capped
    to their smallest ids with the dropped-pair count logged — this is a
    verification op for candidate groups, not a corpus-scale miner."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g[text_col].notna()].sort_values(id_col, kind="mergesort")
        ids = g[id_col].to_numpy()
        sel = _cap_bucket(ids, max_bucket, "edit_distance")
        g = g.iloc[sel]
        ids = ids[sel]
        k = len(ids)
        empty = pd.DataFrame({"id_a": pd.Series([], dtype=ids.dtype),
                              "id_b": pd.Series([], dtype=ids.dtype),
                              "dist": pd.Series([], dtype="int64")})
        if k < 2:
            res = empty
        else:
            codes, lens = _char_codes(list(g[text_col]), max_len)
            ii, jj = np.triu_indices(k, 1)
            out_a, out_b, out_d = [], [], []
            for s0 in range(0, len(ii), chunk):
                ic, jc = ii[s0:s0 + chunk], jj[s0:s0 + chunk]
                d = _lev_block(codes[ic], lens[ic], codes[jc], lens[jc])
                keep = d <= max_dist if max_dist is not None \
                    else np.ones(len(d), np.bool_)
                # the SQL twin's id_a < id_b join emits nothing for rows
                # sharing an id — mirror that for non-unique id columns
                keep &= ids[ic] != ids[jc]
                if keep.any():
                    out_a.append(ids[ic[keep]])
                    out_b.append(ids[jc[keep]])
                    out_d.append(d[keep])
            res = (pd.DataFrame({
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "dist": np.concatenate(out_d),
            }) if out_a else empty)
        for c in group_cols:
            res[c] = g[c].iloc[0] if len(g) else None
        return res

    return ds.groupby(group_cols).map_groups(pairs, batch_format="pandas")


def edit_distance_pairs_sql(table: str, group_cols, text_col: str = "text",
                            id_col: str = "doc_id",
                            max_dist: int | None = None,
                            max_len: int = 64) -> str:
    """DuckDB twin of :func:`edit_distance_pairs` (same prefixes, same
    within-group pairing)."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    on = " AND ".join(f"a.{c} = b.{c}" for c in group_cols)
    gcols = ", ".join(f"a.{c} AS {c}" for c in group_cols)
    having = f" AND dist <= {max_dist}" if max_dist is not None else ""
    return (
        f"SELECT id_a, id_b, dist, {', '.join(group_cols)} FROM ("
        f"SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, "
        f"CAST(levenshtein(substring(a.{text_col}, 1, {max_len}), "
        f"substring(b.{text_col}, 1, {max_len})) AS BIGINT) AS dist, "
        f"{gcols} "
        f"FROM {table} a JOIN {table} b ON {on} AND a.{id_col} < b.{id_col} "
        f"WHERE a.{text_col} IS NOT NULL AND b.{text_col} IS NOT NULL"
        f") WHERE TRUE{having}"
    )


def dedup_keep_best(ds, pairs, id_col: str = "doc_id",
                    score_col: str = "quality"):
    """Near-dedup keeping the BEST-scoring member of each duplicate
    cluster (the production policy: keep the highest-quality copy, not
    the smallest id).  ``pairs`` is a (id_a, id_b) Dataset/DataFrame from
    any pair miner; representative = max ``score_col``, ties to the
    smallest id; null/missing scores rank last.

    Driver path like :func:`dedup_keep_min`: cluster membership is
    bounded by the DUPLICATED id set, so the component labels, the ONE
    pruned score-fetch pass, and the winner selection are all
    O(duplicates); the drop-set broadcasts once.  For pathological pair
    volumes run :func:`connected_components_distributed` and a
    distributed per-component arg-max instead."""
    import ray

    comp = connected_components(pairs)
    if not len(comp):
        return ds
    mem_ref = ray.put(pa.array(comp["doc_id"].to_numpy()))
    scores = _broadcast_id_filter(
        ds, mem_ref, id_col, keep_members=True,
        select_cols=[id_col, score_col]).to_pandas()
    m = comp.merge(scores, left_on="doc_id", right_on=id_col, how="inner")
    m = m.sort_values(["component", score_col, "doc_id"],
                      ascending=[True, False, True], kind="mergesort",
                      na_position="last")
    winners = set(m.drop_duplicates("component")["doc_id"])
    drop = [d for d in comp["doc_id"] if d not in winners]
    return _broadcast_id_filter(ds, ray.put(drop), id_col,
                                keep_members=False)
