"""Checkpoint-resumable corpus-global line dedup (the C4 "remove
repeated lines" pass, same semantics as
:func:`logray.functions.linededup.dedup_lines`).  Line dedup is the
single most expensive operator at bench scale (two sort shuffles in the
dense plan), so the resumable plan both checkpoints every partition
through the manifest protocol AND eliminates the reassembly shuffle
entirely — documents are rebuilt by RE-READING their input file, which
is already the partition axis:

1. **cand** — per INPUT FILE: explode to lines; long lines (length >=
   ``min_len``) get the batch-local keep-first combine; batch winners
   carry their exact text tagged ``hash(line) % B``, batch losers ship
   as text-free ``(doc_id, line_idx)`` tombstones.  Written as Parquet.
2. **losers** — per BUCKET: the bucket's batch winners (``__b == b``
   predicate pushdown) are resolved by EXACT line text — min
   ``(doc_id, line_idx)`` wins, every other occurrence emits a
   tombstone.  Correctness never rests on a hash.
3. **rebuild** — per INPUT FILE: the file's own tombstones (phases 1+2,
   ``__part == pid`` pushdown — bounded by the file's DUPLICATED
   volume) are broadcast; each batch explodes its documents, drops
   tombstoned lines, and reassembles LOCALLY (a document's lines never
   leave the batch that exploded them), writing ``(id, text, n_lines)``.

Compared to ``dedup_lines``'s dense plan the full-width line shuffle is
replaced by the phase-1 Parquet hop (combined winners + 16-byte
tombstones, every partition a checkpoint) and the reassembly shuffle by
a local rebuild.  Output is exactly equal to ``dedup_lines`` (pinned by
the crash-injection test): docs whose every line was removed, and docs
with null text, are absent on both sides.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from logray.functions.linededup import _explode_lines_fn, _rejoin_fn
from logray.stages.bucketing import bucket_of, run_starts
from logray.state.manifest import (check_run_config, default_partitions,
                                   part_files, part_files_hive,
                                   run_resumable)

__all__ = ["dedup_lines_resumable"]


def _cand_fn(id_col: str, text_col: str, min_len: int, sep: str,
             num_buckets: int, part_id: str):
    """Explode + batch-local combine for one input-file partition: one
    winner row (with text) per distinct long line per batch, one
    text-free tombstone per batch-local loser."""
    explode = _explode_lines_fn(id_col, text_col, sep)

    def part(t: pa.Table) -> pa.Table:
        lines = explode(t)
        long = pc.greater_equal(pc.utf8_length(lines["line"]), min_len)
        cand = lines.filter(long)
        n = cand.num_rows
        if n:
            cand = cand.sort_by([("line", "ascending"), (id_col, "ascending"),
                                 ("line_idx", "ascending")])
            win = run_starts(cand["line"].to_numpy(zero_copy_only=False))
        else:
            win = np.zeros(0, np.bool_)
        winners = cand.filter(pa.array(win))
        losers = cand.filter(pa.array(~win))
        wb = bucket_of(winners["line"].to_numpy(zero_copy_only=False),
                       num_buckets)
        return pa.table({
            "__part": pa.array([part_id] * (winners.num_rows + losers.num_rows)),
            id_col: pa.concat_arrays([
                winners[id_col].combine_chunks(),
                losers[id_col].combine_chunks()]),
            "line_idx": pa.concat_arrays([
                winners["line_idx"].combine_chunks(),
                losers["line_idx"].combine_chunks()]),
            "line": pa.concat_arrays([
                winners["line"].combine_chunks(),
                pa.nulls(losers.num_rows, pa.string())]),
            "__b": pa.array(np.concatenate(
                [wb, np.zeros(losers.num_rows, np.int64)])),
            "__loser": pa.array(np.concatenate(
                [np.zeros(winners.num_rows, np.bool_),
                 np.ones(losers.num_rows, np.bool_)])),
        })

    return part


def dedup_lines_resumable(
    input_path: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 1,
    sep: str = "\n",
    num_buckets: int = 64,
    partitions: list[tuple[str, list[str]]] | None = None,
    max_concurrent: int = 1,
    _fault=None,
) -> dict:
    """Run the full resumable line-dedup pass; returns merged metrics
    (rows written, tombstone count, per-phase partition counts).  Safe
    to re-invoke after a crash: finished partitions of every phase are
    skipped.  ``_fault(phase, part_id)`` is a test-only fault-injection
    hook called before each partition executes.  ``partitions``
    overrides the one-per-input-file default — phase chaining
    (:func:`logray.state.manifest.partitions_from_parts`) feeds a prior
    resumable phase's published files in directly."""
    import ray
    import ray.data as rd

    def fault(phase, part_id):
        if _fault is not None:
            _fault(phase, part_id)

    check_run_config(out_dir, {
        "op": "dedup_lines", "id_col": id_col, "text_col": text_col,
        "min_len": min_len, "sep": sep, "num_buckets": num_buckets,
        "layout": "hive_bucket_v2",
    })
    input_parts = partitions if partitions is not None \
        else default_partitions(input_path)

    # --- phase 1: winners + local tombstones per input file -----------------
    cand_dir = os.path.join(out_dir, "cand")

    def run_cand(files, pdir, *, part_id=None):
        fault("cand", part_id)
        fn = _cand_fn(id_col, text_col, min_len, sep, num_buckets, part_id)
        (rd.read_parquet(files, columns=[id_col, text_col])
           .map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                        batch_size=None)
           # hive-partition by bucket: phase 2 prunes at the PATH level
           .write_parquet(pdir, partition_cols=["__b"]))
        return {}

    run_resumable(input_path, cand_dir, run_cand, partitions=input_parts,
                  max_concurrent=max_concurrent)

    # --- phase 2: global tombstones per bucket -------------------------------
    losers_dir = os.path.join(out_dir, "losers")

    def run_losers(bucket_ids, pdir):
        b = bucket_ids[0]
        fault("losers", f"b{b:03d}")
        files_b = part_files_hive(cand_dir, "__b", b)
        if files_b:
            df = rd.read_parquet(
                files_b, filter=~pc.field("__loser")).to_pandas()
        else:
            df = pd.DataFrame()
        lose = pd.DataFrame()
        if len(df):
            df = df.sort_values(["line", id_col, "line_idx"],
                                kind="mergesort")
            lose = df[df.duplicated("line", keep="first")]
        if len(lose):  # an empty frame would write a null-typed schema
            pq.write_table(
                pa.Table.from_pandas(
                    lose[["__part", id_col, "line_idx"]].reset_index(drop=True),
                    preserve_index=False),
                os.path.join(pdir, "losers.parquet"),
            )
        return {"tombstones": int(len(lose))}

    run_resumable(
        input_path, losers_dir, run_losers,
        partitions=[(f"b{b:03d}", [b]) for b in range(num_buckets)],
        max_concurrent=max_concurrent,
    )

    # --- phase 3: local rebuild per input file -------------------------------
    out_phase_dir = os.path.join(out_dir, "deduped")
    loser_files = part_files(losers_dir)
    # the __part row filter prunes fine here: each cand file holds ONE
    # __part value (constant min==max row-group stats), unlike the
    # hash-random __b that phase 2 prunes by path instead
    cand_files = part_files(cand_dir)
    rejoin = _rejoin_fn(id_col, text_col, sep)
    explode = _explode_lines_fn(id_col, text_col, sep)

    def run_rebuild(files, pdir, *, part_id=None):
        fault("rebuild", part_id)
        tomb = []
        if cand_files:
            tomb.append(rd.read_parquet(
                cand_files,
                columns=[id_col, "line_idx"],
                filter=(pc.field("__part") == part_id) & pc.field("__loser"),
            ).to_pandas())
        if loser_files:
            tomb.append(rd.read_parquet(
                loser_files,
                columns=[id_col, "line_idx"],
                filter=pc.field("__part") == part_id,
            ).to_pandas())
        # an empty filtered read comes back column-less: keep only
        # non-empty frames, fall back to a typed empty tombstone set
        tomb = [f for f in tomb if len(f)]
        tdf = pd.concat(tomb, ignore_index=True) if tomb else \
            pd.DataFrame({id_col: np.zeros(0, np.int64),
                          "line_idx": np.zeros(0, np.int64)})
        tomb_ref = ray.put(pd.MultiIndex.from_arrays(
            [tdf[id_col].to_numpy(), tdf["line_idx"].to_numpy()]))

        def rebuild(t: pa.Table) -> pa.Table:
            mi = ray.get(tomb_ref)
            lines = explode(t).to_pandas()
            if len(mi) and len(lines):
                here = pd.MultiIndex.from_arrays(
                    [lines[id_col].to_numpy(), lines["line_idx"].to_numpy()])
                lines = lines[~here.isin(mi)]
            return rejoin(lines)

        out = rd.read_parquet(files, columns=[id_col, text_col]).map_batches(
            rebuild, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None).materialize()
        out.write_parquet(pdir)
        return {"rows": out.count(), "tombstones_applied": int(len(tdf))}

    metrics = run_resumable(input_path, out_phase_dir, run_rebuild,
                            partitions=input_parts,
                            max_concurrent=max_concurrent)
    metrics["output_dir"] = out_phase_dir
    return metrics
