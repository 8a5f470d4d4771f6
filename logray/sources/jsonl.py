"""JSONL transcript ingestion — the other wire format transcripts
arrive in besides Parquet (one JSON object per line: conv_id, turn_idx,
role, text, tool, ts as ISO-8601).  The reader is ``ray.data.read_json``
(streaming, block-per-file) followed by one normalization map that casts
every column to the canonical transcript schema from
:mod:`logray.sources.transcripts` — so everything downstream (parse,
enrich, route, dedup) is format-agnostic.

Reference parity: the reference ingests raw text files
(``src/file_parsing/log_parser_interface.hpp``); :mod:`rawlog` covers
that shape, this module covers the structured-line shape.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["read_transcripts_jsonl", "write_transcripts_jsonl"]

_CANON = {
    "conv_id": pa.string(),
    "turn_idx": pa.int32(),
    "role": pa.string(),
    "text": pa.string(),
    "tool": pa.string(),
    "ts": pa.timestamp("us"),
}


def _stringify_ts(t: pa.Table) -> pa.Table:
    """ISO-8601 ts serialization shared by the JSONL and CSV sinks —
    ONE definition so the wire formats can never diverge."""
    if "ts" in t.column_names and pa.types.is_timestamp(t["ts"].type):
        # Arrow strftime prints subseconds INSIDE %S (and has no %f)
        iso = pc.strftime(t["ts"], format="%Y-%m-%dT%H:%M:%S")
        t = t.drop_columns(["ts"]).append_column("ts", iso)
    return t


def _normalize(t: pa.Table) -> pa.Table:
    cols = {}
    for name, typ in _CANON.items():
        if name not in t.column_names:
            raise ValueError(f"transcript input missing column {name!r} "
                             f"(have {t.column_names})")
        c = t[name]
        # one generic cast covers everything, including ISO-8601 string
        # -> timestamp; bad rows raise (corrupt input fails loudly)
        cols[name] = pc.cast(c, typ) if c.type != typ else c
    return pa.table(cols)


def read_transcripts_jsonl(paths, **read_kwargs):
    """Read JSONL transcript files into the canonical schema.  Accepts a
    path, directory, or list (anything ``ray.data.read_json`` takes)."""
    import ray.data as rd

    ds = rd.read_json(paths, **read_kwargs)
    return ds.map_batches(_normalize, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)


def write_transcripts_jsonl(ds, path: str, **write_kwargs):
    """Write a transcript Dataset as JSONL (one dir of part files —
    the resumable-partition layout, never one giant file).  Timestamps
    serialize as ISO-8601 strings so the files round-trip through
    :func:`read_transcripts_jsonl`."""

    ds.map_batches(_stringify_ts, batch_format="pyarrow",
                   zero_copy_batch=True, batch_size=None
                   ).write_json(path, **write_kwargs)
