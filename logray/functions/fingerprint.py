"""Document fingerprinting: vectorized rolling hashes + MinHash signatures.

Everything operates on the raw UTF-8 buffer of an Arrow string column the
same way the parser does (zero-copy numpy views), so a batch of documents is
fingerprinted with O(bytes) numpy work and **no Python per-row loop**:

- k-byte rolling polynomial hashes over the whole concatenated buffer
  (k multiply-add passes);
- per-row aggregation via ``np.minimum.reduceat`` on row boundaries — this
  turns "min over each document's shingle hashes" (the MinHash primitive)
  into one vectorized call per permutation;
- 64-bit content hash and SimHash from the same machinery.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from logray.vparse import _string_buffer_views

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)
_PRIME = np.uint64(1099511628211)  # FNV prime
_OFFSET = np.uint64(14695981039346656037)


def _rolling_hashes(data: np.ndarray, k: int) -> np.ndarray:
    """hash[i] = polynomial hash of data[i:i+k] (valid for i <= len-k)."""
    n = len(data)
    if n < k:
        return np.zeros(0, np.uint64)
    h = np.zeros(n - k + 1, np.uint64)
    B = np.uint64(1000003)
    for j in range(k):
        h = (h * B + data[j : n - k + 1 + j].astype(np.uint64)) & _MASK
    return h


def shingle_hashes(texts, k: int = 5):
    """(hashes, row_starts, row_counts): all k-byte shingle hashes of each
    row, concatenated; rows shorter than k get ONE sentinel shingle (the
    row's own content hash) so empty/short docs still dedup exactly."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    data, starts, ends = _string_buffer_views(texts)
    lens = ends - starts
    n = len(starts)
    base = _rolling_hashes(data, k)  # indexed by absolute buffer offset
    counts = np.maximum(lens - k + 1, 1).astype(np.int64)
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=offs[1:])
    total = int(offs[-1])
    out = np.empty(total, np.uint64)
    # gather each row's shingle-hash run (vectorized index construction)
    idx = np.repeat(starts, counts) + (np.arange(total) - np.repeat(offs[:-1], counts))
    short = lens < k
    if len(base):
        src = np.minimum(idx, len(base) - 1)
        out = base[src]
    else:
        out = np.zeros(total, np.uint64)
    if short.any():
        # short rows: single sentinel = content hash of the row bytes
        ch = content_hash(texts)
        sent_pos = offs[:-1][short]
        out[sent_pos] = ch[short]
    return out, offs[:-1], counts


def content_hash(texts) -> np.ndarray:
    """64-bit FNV-1a content hash per row (vectorized by byte position)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    data, starts, ends = _string_buffer_views(texts)
    n = len(starts)
    h = np.full(n, _OFFSET, np.uint64)
    maxlen = int((ends - starts).max()) if n else 0
    for j in range(maxlen):
        m = starts + j < ends
        if not m.any():
            break
        b = data[starts[m] + j].astype(np.uint64)
        h[m] = ((h[m] ^ b) * _PRIME) & _MASK
    return h


_PRIME2 = np.uint64(0x9E3779B97F4A7C15)   # golden-ratio odd multiplier
_OFFSET2 = np.uint64(0x243F6A8885A308D3)  # pi fractional bits


def content_hash128(texts) -> tuple[np.ndarray, np.ndarray]:
    """``(h1, h2)`` per row: the standard FNV-1a hash plus a second
    FNV-style hash with independent constants, computed in the SAME byte
    pass — a 128-bit fingerprint for collision-guarded membership tests
    where the text itself is not kept around to verify equality (e.g.
    the persistent dedup index).  ``h1`` equals :func:`content_hash`.

    A finalizer of ``h1`` would NOT do here: any bijection of h1 has
    exactly h1's collisions; the guard needs a second hash of the
    bytes."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    data, starts, ends = _string_buffer_views(texts)
    n = len(starts)
    h1 = np.full(n, _OFFSET, np.uint64)
    h2 = np.full(n, _OFFSET2, np.uint64)
    maxlen = int((ends - starts).max()) if n else 0
    for j in range(maxlen):
        m = starts + j < ends
        if not m.any():
            break
        b = data[starts[m] + j].astype(np.uint64)
        h1[m] = ((h1[m] ^ b) * _PRIME) & _MASK
        h2[m] = ((h2[m] ^ b) * _PRIME2) & _MASK
    return h1, h2


# --- MinHash ---------------------------------------------------------------


def _perm_params(num_perm: int, seed: int = 1):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 61, num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 61, num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(texts, num_perm: int = 64, k: int = 5, seed: int = 1) -> np.ndarray:
    """(n_rows, num_perm) uint64 MinHash signature matrix."""
    hashes, row_starts, counts = shingle_hashes(texts, k)
    n = len(row_starts)
    a, b = _perm_params(num_perm, seed)
    sig = np.empty((n, num_perm), np.uint64)
    if len(hashes) == 0:
        sig[:] = 0
        return sig
    for p in range(num_perm):
        hp = (hashes * a[p] + b[p]) & _MASK
        sig[:, p] = np.minimum.reduceat(hp, row_starts) if n else hp[:0]
    return sig


def band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n_rows, bands) uint64: one hash per LSH band (rows = num_perm/bands
    consecutive signature slots folded together)."""
    n, num_perm = sig.shape
    r = num_perm // bands
    out = np.empty((n, bands), np.uint64)
    B = np.uint64(1000003)
    for b in range(bands):
        h = np.full(n, _OFFSET, np.uint64)
        for j in range(b * r, (b + 1) * r):
            h = ((h ^ sig[:, j]) * B) & _MASK
        out[:, b] = h
    return out


def simhash(texts, k: int = 4) -> np.ndarray:
    """64-bit SimHash per row from k-byte shingle hashes (bit-majority)."""
    hashes, row_starts, counts = shingle_hashes(texts, k)
    n = len(row_starts)
    out = np.zeros(n, np.uint64)
    if len(hashes) == 0:
        return out
    ends = row_starts + counts
    for bit in range(64):
        bits = ((hashes >> np.uint64(bit)) & np.uint64(1)).astype(np.int64)
        per_row = np.add.reduceat(bits, row_starts)
        # majority vote: bit set iff set in more than half the shingles
        vote = per_row * 2 > counts
        out |= vote.astype(np.uint64) << np.uint64(bit)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = a ^ b
    # vectorized popcount via bit tricks
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) & _MASK) >> np.uint64(56)


def content_hash_sql(table: str, col: str = "text",
                     id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`content_hash` (FNV-1a over the UTF-8
    bytes), replayed bit-for-bit as a recursive CTE stepping one byte
    per iteration: bytes come from ``hex(encode(text))`` (no byte
    accessor in this DuckDB), the xor runs on UBIGINT, the wrap-around
    multiply fits HUGEINT un-split (PRIME < 2^41 so h*PRIME < 2^105),
    and the final value wraps to the signed int64 the
    :class:`FingerprintBatch` stage emits.  Iteration count = the
    longest document's byte length — bounded and cheap at gate scale
    (<= 600 bytes on the test corpora); this is a CORRECTNESS twin,
    not a scale path."""
    M = 1 << 64
    byte_expr = (
        "(16 * (strpos('0123456789ABCDEF',"
        " substring(b.hx, 2*r.i + 1, 1)) - 1)"
        " + (strpos('0123456789ABCDEF',"
        " substring(b.hx, 2*r.i + 2, 1)) - 1))")
    return f"""
        WITH RECURSIVE
        b AS (SELECT {id_col}, hex(encode({col})) AS hx,
                     octet_length(encode({col})) AS len
              FROM {table} WHERE {col} IS NOT NULL),
        r AS (
            SELECT {id_col}, 0 AS i, CAST({_OFFSET} AS HUGEINT) AS h
            FROM b
            UNION ALL
            SELECT r.{id_col}, r.i + 1,
                   (CAST(xor(CAST(r.h AS UBIGINT),
                             CAST({byte_expr} AS UBIGINT)) AS HUGEINT)
                    * {_PRIME}) % {M}
            FROM r JOIN b USING({id_col}) WHERE r.i < b.len
        )
        SELECT b.{id_col},
               CAST(CASE WHEN r.h >= {1 << 63} THEN r.h - {M}
                         ELSE r.h END AS BIGINT) AS content_hash
        FROM b JOIN r USING({id_col}) WHERE r.i = b.len
    """


def simhash_sql(table: str, k: int = 4, col: str = "text",
                id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`simhash` — bit-for-bit.  The k-byte
    shingle hash has a CLOSED FORM (sum of byte * B^(k-1-j) mod 2^64,
    each term < 2^70 so a plain HUGEINT sum suffices); rows shorter
    than k bytes take the FNV-1a sentinel via the same byte recursion
    as :func:`content_hash_sql`; the 64 bit-majority votes are 64
    aggregates over the shingle rows.  The final value wraps to the
    signed int64 :class:`FingerprintBatch` emits — load-bearing twice:
    it matches the stage's dtype AND keeps the result out of the
    HUGEINT->float64 conversion that silently rounds away low bits in
    pandas.  Like the content-hash twin this is a CORRECTNESS replica
    (shingle rows = total bytes), not a scale path."""
    M = 1 << 64

    def byte_at(p: str) -> str:
        return (f"(16 * (strpos('0123456789ABCDEF',"
                f" substring(hx, 2*({p}) + 1, 1)) - 1)"
                f" + (strpos('0123456789ABCDEF',"
                f" substring(hx, 2*({p}) + 2, 1)) - 1))")

    terms = " + ".join(
        f"CAST({byte_at(f'i + {j}')} AS HUGEINT)"
        f" * {pow(1000003, k - 1 - j, M)}" for j in range(k))
    fnv_byte = (
        "(16 * (strpos('0123456789ABCDEF',"
        " substring(b.hx, 2*r.i + 1, 1)) - 1)"
        " + (strpos('0123456789ABCDEF',"
        " substring(b.hx, 2*r.i + 2, 1)) - 1))")
    votes = ",\n               ".join(
        f"CASE WHEN 2 * SUM(CAST((CAST(h AS UBIGINT) >> {b_}) & 1"
        f" AS BIGINT)) > COUNT(*)"
        f" THEN CAST({1 << b_} AS HUGEINT) ELSE 0 END AS v{b_}"
        for b_ in range(64))
    total = " + ".join(f"v{b_}" for b_ in range(64))
    return f"""
        WITH RECURSIVE
        b AS (SELECT {id_col}, hex(encode({col})) AS hx,
                     octet_length(encode({col})) AS len
              FROM {table} WHERE {col} IS NOT NULL),
        r AS (
            SELECT {id_col}, 0 AS i, CAST({_OFFSET} AS HUGEINT) AS h
            FROM b WHERE len < {k}
            UNION ALL
            SELECT r.{id_col}, r.i + 1,
                   (CAST(xor(CAST(r.h AS UBIGINT),
                             CAST({fnv_byte} AS UBIGINT)) AS HUGEINT)
                    * {_PRIME}) % {M}
            FROM r JOIN b USING({id_col}) WHERE r.i < b.len
        ),
        sent AS (SELECT b.{id_col}, r.h FROM b JOIN r USING({id_col})
                 WHERE b.len < {k} AND r.i = b.len),
        pos AS (SELECT {id_col}, hx,
                       unnest(generate_series(0, len - {k})) AS i
                FROM b WHERE len >= {k}),
        sh AS (
            SELECT {id_col}, ({terms}) % {M} AS h FROM pos
            UNION ALL
            SELECT {id_col}, h FROM sent
        ),
        sv AS (SELECT {id_col},
               {votes}
               FROM sh GROUP BY {id_col})
        SELECT {id_col},
               CAST(CASE WHEN ({total}) >= {1 << 63}
                         THEN ({total}) - {M}
                         ELSE ({total}) END AS BIGINT) AS simhash
        FROM sv
    """


def _minhash_ctes(table: str, num_perm: int, bands: int, k: int,
                  seed: int, col: str, id_col: str) -> str:
    """The shared CTE chain behind :func:`minhash_pairs_sql` and
    :func:`band_rows_sql` (one copy — these twins must never drift):
    hex byte stream, FNV sentinel recursion for rows shorter than k
    bytes, closed-form k-byte shingle hashes, the ``num_perm``
    multiply-add permutations as MIN aggregates (hi/lo HUGEINT mulmod),
    and the per-band FNV folds.  Ends with the ``bandrows`` CTE
    (``(id, band_id, bh)``, bh UBIGINT); callers append their own
    final stages."""
    M = 1 << 64
    H = 1 << 32
    a, b = _perm_params(num_perm, seed)
    r = num_perm // bands

    def byte_at(p: str) -> str:
        return (f"(16 * (strpos('0123456789ABCDEF',"
                f" substring(hx, 2*({p}) + 1, 1)) - 1)"
                f" + (strpos('0123456789ABCDEF',"
                f" substring(hx, 2*({p}) + 2, 1)) - 1))")

    terms = " + ".join(
        f"CAST({byte_at(f'i + {j}')} AS HUGEINT)"
        f" * {pow(1000003, k - 1 - j, M)}" for j in range(k))
    fnv_byte = (
        "(16 * (strpos('0123456789ABCDEF',"
        " substring(b.hx, 2*r.i + 1, 1)) - 1)"
        " + (strpos('0123456789ABCDEF',"
        " substring(b.hx, 2*r.i + 2, 1)) - 1))")
    # sig slot p: MIN over shingles of (h * a_p + b_p) mod 2^64
    sig_cols = ",\n               ".join(
        f"CAST(MIN((((h // {H}) * {int(a[p])} % {H}) * {H}"
        f" + (h % {H}) * {int(a[p])} + {int(b[p])}) % {M}) AS UBIGINT)"
        f" AS s{p}" for p in range(num_perm))
    # band fold: h = ((h xor s_j) * 1000003) mod 2^64, r slots per band
    band_rows = []
    for bid in range(bands):
        expr = str(int(_OFFSET))
        for j in range(bid * r, (bid + 1) * r):
            expr = (f"(CAST(xor(CAST({expr} AS UBIGINT), s{j})"
                    f" AS HUGEINT) * 1000003) % {M}")
        band_rows.append(
            f"SELECT {id_col}, {bid} AS band_id,"
            f" CAST({expr} AS UBIGINT) AS bh FROM sig")
    bandrows = "\n            UNION ALL ".join(band_rows)
    return f"""b AS (SELECT {id_col}, hex(encode({col})) AS hx,
                     octet_length(encode({col})) AS len
              FROM {table} WHERE {col} IS NOT NULL),
        r AS (
            SELECT {id_col}, 0 AS i, CAST({_OFFSET} AS HUGEINT) AS h
            FROM b WHERE len < {k}
            UNION ALL
            SELECT r.{id_col}, r.i + 1,
                   (CAST(xor(CAST(r.h AS UBIGINT),
                             CAST({fnv_byte} AS UBIGINT)) AS HUGEINT)
                    * {_PRIME}) % {M}
            FROM r JOIN b USING({id_col}) WHERE r.i < b.len
        ),
        sent AS (SELECT b.{id_col}, r.h FROM b JOIN r USING({id_col})
                 WHERE b.len < {k} AND r.i = b.len),
        pos AS (SELECT {id_col}, hx,
                       unnest(generate_series(0, len - {k})) AS i
                FROM b WHERE len >= {k}),
        sh AS (
            SELECT {id_col}, ({terms}) % {M} AS h FROM pos
            UNION ALL
            SELECT {id_col}, h FROM sent
        ),
        sig AS (SELECT {id_col},
               {sig_cols}
               FROM sh GROUP BY {id_col}),
        bandrows AS (
            {bandrows}
        )"""


def minhash_pairs_sql(table: str, num_perm: int = 64, bands: int = 16,
                      k: int = 5, threshold: float = 0.7, seed: int = 1,
                      col: str = "text", id_col: str = "doc_id",
                      max_bucket: int = 4096) -> str:
    """DuckDB twin of the :func:`logray.functions.dedup.minhash_lsh_dedup`
    PAIR SET (distinct ``(id_a, id_b)``, ``id_a < id_b``) — bit-for-bit:
    the :func:`_minhash_ctes` chain (shingles, permutation MINs, band
    folds), bucket collision via one self-join, and the agreement
    verify as ``num_perm`` equality terms with the identical
    ``count/num_perm >= threshold`` float compare.

    The operator's hot-bucket cap (keep the ``max_bucket`` smallest ids)
    never binds at gate scale; rather than replicate it, the twin fails
    LOUDLY if it would: any bucket past ``max_bucket`` makes the final
    SELECT return zero rows (impossible for a non-empty pair set),
    never a silently-divergent superset."""
    agree = " + ".join(
        f"CASE WHEN sa.s{p} = sb.s{p} THEN 1 ELSE 0 END"
        for p in range(num_perm))
    return f"""
        WITH RECURSIVE
        {_minhash_ctes(table, num_perm, bands, k, seed, col, id_col)},
        hot AS (SELECT COUNT(*) AS n FROM (
                SELECT band_id, bh FROM bandrows
                GROUP BY band_id, bh HAVING COUNT(*) > {max_bucket})),
        cand AS (SELECT DISTINCT x.{id_col} AS id_a, y.{id_col} AS id_b
                 FROM bandrows x JOIN bandrows y
                 ON x.band_id = y.band_id AND x.bh = y.bh
                 AND y.{id_col} > x.{id_col})
        SELECT c.id_a, c.id_b
        FROM cand c
        JOIN sig sa ON sa.{id_col} = c.id_a
        JOIN sig sb ON sb.{id_col} = c.id_b
        WHERE CAST(({agree}) AS DOUBLE) / {num_perm} >= {threshold!r}
          AND (SELECT n FROM hot) = 0
    """


def band_rows_sql(table: str, num_perm: int = 64, bands: int = 16,
                  k: int = 5, seed: int = 1, col: str = "text",
                  id_col: str = "doc_id") -> str:
    """``(id, band_id, bh)`` LSH band rows as SQL — the shared prefix of
    :func:`minhash_pairs_sql` exposed standalone so incremental-index
    oracles (collide-new-against-old) can compose two instances over
    different row subsets.  Same :func:`_minhash_ctes` chain; band
    hashes come out as UBIGINT."""
    return f"""
        WITH RECURSIVE
        {_minhash_ctes(table, num_perm, bands, k, seed, col, id_col)}
        SELECT {id_col}, band_id, bh FROM bandrows
    """


def simhash_pairs_sql(table: str, max_hamming: int = 3, k: int = 4,
                      col: str = "text", id_col: str = "doc_id",
                      max_bucket: int = 4096) -> str:
    """DuckDB twin of the :func:`logray.functions.dedup.simhash_dedup`
    PAIR SET (distinct ``(id_a, id_b)``, ``id_a < id_b``): SimHash via
    :func:`simhash_sql`, the four 16-bit pigeonhole chunks and the
    popcount verify (``bit_count`` on UBIGINT) replayed exactly.  Same
    loud hot-bucket guard contract as :func:`minhash_pairs_sql`."""
    M = 1 << 64
    chunks = "\n            UNION ALL ".join(
        f"SELECT {id_col}, u, {c} AS chunk_id,"
        f" (u >> {16 * c}) & 65535 AS chunk FROM su"
        for c in range(4))
    return f"""
        WITH sp0 AS ({simhash_sql(table, k=k, col=col, id_col=id_col)}),
        su AS (SELECT {id_col},
                      CAST(CASE WHEN simhash < 0
                                THEN CAST(simhash AS HUGEINT) + {M}
                                ELSE CAST(simhash AS HUGEINT) END
                           AS UBIGINT) AS u
               FROM sp0),
        chunks AS (
            {chunks}
        ),
        hot AS (SELECT COUNT(*) AS n FROM (
                SELECT chunk_id, chunk FROM chunks
                GROUP BY chunk_id, chunk HAVING COUNT(*) > {max_bucket})),
        cand AS (SELECT DISTINCT x.{id_col} AS id_a, x.u AS ua,
                        y.{id_col} AS id_b, y.u AS ub
                 FROM chunks x JOIN chunks y
                 ON x.chunk_id = y.chunk_id AND x.chunk = y.chunk
                 AND y.{id_col} > x.{id_col})
        SELECT id_a, id_b FROM cand
        WHERE bit_count(xor(ua, ub)) <= {max_hamming}
          AND (SELECT n FROM hot) = 0
    """


class FingerprintBatch:
    """map_batches stage appending content_hash (+ optional simhash)."""

    def __init__(self, text_col: str = "text", with_simhash: bool = False, k: int = 4):
        self.text_col = text_col
        self.with_simhash = with_simhash
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        ch = content_hash(t[self.text_col])
        t = t.append_column("content_hash", pa.array(ch.astype(np.int64)))
        if self.with_simhash:
            sh = simhash(t[self.text_col], self.k)
            t = t.append_column("simhash", pa.array(sh.astype(np.int64)))
        return t
