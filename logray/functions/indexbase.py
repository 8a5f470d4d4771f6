"""Shared scaffolding for persistent on-disk indexes
(:mod:`logray.functions.dedup_incremental`'s fingerprint index and
:mod:`logray.functions.neardup_incremental`'s MinHash band index): the
metadata sidecar, hive-shard file listing, and the broadcast-size cap.
One copy — the refusal semantics (a missing/mismatched index must RAISE,
never probe as empty) are load-bearing for both."""

from __future__ import annotations

import glob
import json
import os

__all__ = ["write_meta", "read_meta", "shard_files", "total_index_rows"]

META_NAME = "index.json"


def write_meta(out_dir: str, meta: dict) -> None:
    with open(os.path.join(out_dir, META_NAME), "w") as f:
        json.dump(meta, f)


def read_meta(index_dir: str, kind: str) -> dict:
    """The index's persisted parameters.  A directory without a
    metadata sidecar RAISES — silently treating it as an empty index
    would score every duplicate as new."""
    path = os.path.join(index_dir, META_NAME)
    if not os.path.exists(path):
        raise ValueError(
            f"{index_dir!r} is not a {kind} (no {META_NAME}); refusing "
            "to treat it as empty — every duplicate would pass")
    with open(path) as f:
        return json.load(f)


def shard_files(index_dir: str, key: str, value=None) -> list[str]:
    """Parquet files of one hive shard (``key=value``), or of the whole
    index when ``value`` is None — path-level pruning, never a row
    filter on the hash-random shard column.  Covers both the flat
    append layout (``<dir>/<key>=v/*.parquet``) and the resumable
    manifest layout (``<dir>/parts/<pid>/<key>=v/*.parquet``)."""
    pat = f"{key}={value}" if value is not None else f"{key}=*"
    return sorted(
        glob.glob(os.path.join(index_dir, pat, "*.parquet"))
        + glob.glob(os.path.join(index_dir, "parts", "*", pat,
                                 "*.parquet")))


def total_index_rows(files: list[str]) -> int:
    import pyarrow.parquet as pq

    return sum(pq.read_metadata(f).num_rows for f in files)
