"""Byte-balanced, resumable Parquet shard output.

A 100 TB curation run must never end in one giant file (or in shards sized
by row count, which a fat-document corpus skews 100x by bytes).  This sink
targets ``target_bytes`` of *payload* per output shard:

1. ONE streaming pass sums the exact UTF-8/binary payload bytes of the
   byte-bearing columns (plus a fixed per-row overhead for the scalar
   columns) — tiny int64 partials, no shuffle;
2. ``n_shards = ceil(total / target_bytes)``; each row lands in shard
   ``knuth_hash(id) % n_shards`` — the same deterministic id hash the
   sampling family uses (string / negative ids go through the FNV-1a
   content hash first, like :func:`~logray.functions.sample.group_split`),
   so shard membership is a pure function of (id, seed, n_shards):
   balanced in expectation with O(1/sqrt(rows/shard)) relative deviation
   (at the design point every shard holds millions of rows, so byte
   balance is tight), stable under any input partitioning, and replayable;
3. ``write_parquet(partition_cols=["shard"])`` — a hive layout
   (``shard=K/``) so downstream readers path-prune and consume/resume
   per shard.  The write itself is all-or-nothing: ``out_dir`` must not
   already hold data (a rerun into a half-written directory would
   DUPLICATE rows, so it is refused loudly — delete and rerun, the
   deterministic assignment replays identically).

No sort, no shuffle: the write is the only wide-ish step and Ray fans it
out per block into each partition directory.  NOTE the input executes
TWICE (byte census, then write) — hand this a re-readable source (a
parquet read) or a materialized dataset, not an expensive lazy pipeline.

Reference anchor: the reference viewer's single-file mmap model
(`/root/reference/src/file_parsing/file_parser.cpp` open/parse of one log
file) is exactly what this replaces at scale.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from logray.functions.sample import _M31, _det_hash

# conservative fixed per-row cost of the non-payload scalar columns
ROW_OVERHEAD_BYTES = 16


def payload_bytes(ds, byte_cols: list[str],
                  row_overhead: int = ROW_OVERHEAD_BYTES) -> int:
    """Exact total payload bytes: sum of the UTF-8/binary lengths of
    ``byte_cols`` plus ``row_overhead`` per row.  One streaming pass,
    int64 partials only."""

    def part(t: pa.Table) -> pa.Table:
        total = t.num_rows * row_overhead
        for c in byte_cols:
            s = pc.sum(pc.binary_length(t[c])).as_py()
            total += int(s or 0)
        return pa.table({"b": pa.array([total], pa.int64())})

    got = ds.map_batches(part, batch_format="pyarrow",
                         zero_copy_batch=True).sum("b")
    return int(got or 0)


def rebalance_shards(ds, out_dir: str, target_bytes: int,
                     id_col: str = "doc_id",
                     byte_cols: list[str] | None = None,
                     seed: int = 0, min_shards: int = 1) -> int:
    """Write ``ds`` as a hive-partitioned Parquet tree with ~``target_bytes``
    of payload per shard.  Returns the shard count.

    ``byte_cols`` defaults to every string/binary column in the schema.
    """
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        raise FileExistsError(
            f"{out_dir} is not empty: rerunning into a half-written shard "
            "tree would duplicate rows; delete it and rerun")
    schema = ds.schema()
    if byte_cols is None:
        byte_cols = [
            n for n, t in zip(schema.names, schema.types)
            if pa.types.is_string(t) or pa.types.is_large_string(t)
            or pa.types.is_binary(t) or pa.types.is_large_binary(t)
        ]
    total = payload_bytes(ds, byte_cols)
    n_shards = max(min_shards, math.ceil(total / target_bytes))

    def tag(t: pa.Table) -> pa.Table:
        col = t[id_col]
        if pa.types.is_integer(col.type):
            # numpy % is non-negative, so negative ids stay in range
            ids = col.to_numpy(zero_copy_only=False).astype(np.int64) % _M31
        else:
            from logray.functions.fingerprint import content_hash

            # string/binary ids: content hash to a non-negative int64
            # (the group_split path)
            ids = (content_hash(col) >> np.uint64(1)).astype(np.int64)
        shard = (_det_hash(ids, seed) % n_shards).astype("int64")
        if "shard" in t.column_names:
            t = t.drop_columns(["shard"])
        return t.append_column("shard", pa.array(shard))

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    tagged.write_parquet(out_dir, partition_cols=["shard"])
    return n_shards
