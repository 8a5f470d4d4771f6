"""Checkpoint-resumable duplicate-substring removal (word- or byte-level
ExactSubstr).  ``dedup_spans`` / ``dedup_spans_bytes`` are the most
expensive passes in the repo; a 100-TB run that dies at 90% must not
restart from zero, so every phase runs through the manifest protocol
(``logray.state.manifest``): completed partitions are skipped on restart
and a crash costs only the in-flight partition.  Three phases:

1. **census** — per INPUT FILE: per-batch gram-census partials
   ``(h1, cnt, h2min, h2max)`` tagged with ``hash(h1) % B``, written as
   Parquet.  Embarrassingly parallel; the bulk of the CPU time.
2. **dups** — per BUCKET: census partials for one bucket (read with a
   ``__b == b`` row-group predicate pushdown) folded; grams with total
   count > 1 survive (with the h2 collision guard).  Buckets are
   independent, so each is a resumable partition of the only wide
   exchange.
3. **cut** — per INPUT FILE: the duplicated-gram set (bounded by the
   DUPLICATED gram count, not the corpus) is broadcast once
   (``ray.put``); mark & cut each file, write the deduplicated output.

The phase-1/2 Parquet hop replaces ``dedup_spans``'s in-flight bucket
shuffle — same data volume, but every partition of it is now a
checkpoint.  Output is exactly equal to the single-shot operators
(pinned by the crash-injection tests).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from logray.functions.spandedup import (
    _census_bytes_fn,
    _census_fn,
    _cut_bytes_fn,
    _cut_words_fn,
    _dup_bucket,
)
from logray.stages.bucketing import bucket_tagger
from logray.state.manifest import (check_run_config, default_partitions,
                                   part_files, part_files_hive,
                                   run_resumable)

__all__ = ["dedup_spans_resumable"]


def dedup_spans_resumable(
    input_path: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 5,
    level: str = "word",
    num_buckets: int = 32,
    max_broadcast: int = 50_000_000,
    _fault=None,
) -> dict:
    """Run the full resumable span-dedup pass (``level`` = "word" for
    :func:`~logray.functions.spandedup.dedup_spans` semantics, "byte"
    for :func:`~logray.functions.spandedup.dedup_spans_bytes`); returns
    merged metrics (rows written, duplicated-gram count, per-phase
    partition counts).  Safe to re-invoke after a crash: finished
    partitions of every phase are skipped.

    ``_fault(phase, part_id)`` is a test-only fault-injection hook
    called before each partition executes."""
    import ray
    import ray.data as rd

    if window < 2:
        raise ValueError("window must be >= 2")
    if level not in ("word", "byte"):
        raise ValueError(f"level must be 'word' or 'byte', got {level!r}")

    def fault(phase, part_id):
        if _fault is not None:
            _fault(phase, part_id)

    check_run_config(out_dir, {
        "op": "dedup_spans", "id_col": id_col, "text_col": text_col,
        "window": window, "level": level, "num_buckets": num_buckets,
        "layout": "hive_bucket_v2",
    })
    input_parts = default_partitions(input_path)
    census_fn = (_census_fn if level == "word" else _census_bytes_fn)(
        id_col, text_col, window)
    tag = bucket_tagger("h1", num_buckets)

    # --- phase 1: census partials per input file ---------------------------
    census_dir = os.path.join(out_dir, "census")

    def run_census(files, pdir, *, part_id=None):
        fault("census", part_id)
        ds = rd.read_parquet(files, columns=[id_col, text_col])
        (ds.map_batches(census_fn, batch_format="pyarrow",
                        zero_copy_batch=True, batch_size=None)
           .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True,
                        batch_size=None)
           # hive-partition by bucket so phase 2 prunes at the PATH level
           # (a row filter on the hash-random __b cannot prune row groups
           # and would rescan the full census once per bucket)
           .write_parquet(pdir, partition_cols=["__b"]))
        return {}

    run_resumable(input_path, census_dir, run_census, partitions=input_parts)

    # --- phase 2: duplicated grams per bucket -------------------------------
    dups_dir = os.path.join(out_dir, "dups")

    def run_dups(bucket_ids, pdir):
        b = bucket_ids[0]
        fault("dups", f"b{b:03d}")
        files_b = part_files_hive(census_dir, "__b", b)
        if files_b:
            df = rd.read_parquet(files_b).to_pandas()
        else:
            df = pd.DataFrame()
        dup = _dup_bucket(df) if len(df) else \
            pd.DataFrame({"h1": np.zeros(0, np.int64)})
        pq.write_table(
            pa.table({"h1": pa.array(dup["h1"].to_numpy().astype(np.int64))}),
            os.path.join(pdir, "dups.parquet"),
        )
        return {"dups": int(len(dup))}

    run_resumable(
        input_path, dups_dir, run_dups,
        partitions=[(f"b{b:03d}", [b]) for b in range(num_buckets)],
    )

    # --- phase 3: mark & cut per input file ---------------------------------
    cut_dir = os.path.join(out_dir, "cut")
    dup_tables = [pq.read_table(f, columns=["h1"])
                  for f in part_files(dups_dir)]
    dup = (pa.concat_tables(dup_tables)["h1"].to_numpy().astype(np.int64)
           if dup_tables else np.zeros(0, np.int64))
    if len(dup) > max_broadcast:
        raise RuntimeError(
            f"dedup_spans_resumable: {len(dup)} duplicated grams exceeds "
            f"max_broadcast={max_broadcast}; run the mark phase as a "
            f"bucketed join on h1 instead of a broadcast")
    dup_ref = ray.put(np.sort(dup.view(np.uint64)))
    cut = (_cut_words_fn if level == "word" else _cut_bytes_fn)(
        id_col, text_col, window, dup_ref)

    def run_cut(files, pdir, *, part_id=None):
        fault("cut", part_id)
        out = rd.read_parquet(files, columns=[id_col, text_col]).map_batches(
            cut, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None).materialize()
        out.write_parquet(pdir)
        return {"rows": out.count()}

    metrics = run_resumable(input_path, cut_dir, run_cut,
                            partitions=input_parts)
    metrics["dup_grams"] = int(len(dup))
    metrics["output_dir"] = cut_dir
    return metrics
