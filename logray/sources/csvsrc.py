"""CSV transcript ingestion — the third wire format transcripts arrive
in besides Parquet and JSONL (crawl exports and spreadsheet-born corpora
ship as CSV).  The reader is ``ray.data.read_csv`` (streaming,
block-per-file) with embedded-newline parsing enabled, followed by the
same canonical-schema normalization the JSONL source uses, so everything
downstream (parse, enrich, route, dedup) stays format-agnostic.

Lossless for the transcript schema with ONE documented conflation: CSV
cannot distinguish an empty string from NULL, so a null field writes as
empty and reads back as ``""`` — which IS the canonical transcripts'
no-tool encoding, so the flagship schema round-trips exactly; corpora
that rely on the null/empty distinction should use the Parquet or JSONL
wire formats.  Timestamps serialize as ISO-8601 and round-trip through
the generic canonical cast.  Text with commas, quotes or newlines round-trips via
standard CSV quoting (the Arrow writer quotes as needed; the reader
parses quoted newlines because ``newlines_in_values=True``).

Reference parity: the reference ingests raw text lines
(`/root/reference/src/file_parsing/log_parser_interface.hpp`);
:mod:`rawlog` covers that shape, :mod:`jsonl` and this module cover the
structured-line shapes.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from pyarrow import csv as pacsv

from logray.sources.jsonl import _normalize

__all__ = ["read_transcripts_csv", "write_transcripts_csv"]


def read_transcripts_csv(paths, **read_kwargs):
    """Read CSV transcript files into the canonical schema.  Accepts a
    path, directory, or list (anything ``ray.data.read_csv`` takes)."""
    import ray.data as rd

    read_kwargs.setdefault(
        "parse_options", pacsv.ParseOptions(newlines_in_values=True))
    # default ConvertOptions: empty fields stay "" (the canonical
    # transcripts' no-tool encoding), never silently nulled
    ds = rd.read_csv(paths, **read_kwargs)
    return ds.map_batches(_normalize, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)


def write_transcripts_csv(ds, path: str, **write_kwargs):
    """Write a transcript Dataset as CSV part files (one dir of part
    files — the resumable-partition layout, never one giant file).
    Timestamps serialize as ISO-8601 so the files round-trip through
    :func:`read_transcripts_csv`."""

    def stringify_ts(t: pa.Table) -> pa.Table:
        if "ts" in t.column_names and pa.types.is_timestamp(t["ts"].type):
            # Arrow strftime prints subseconds INSIDE %S (it has no %f)
            iso = pc.strftime(t["ts"], format="%Y-%m-%dT%H:%M:%S")
            t = t.drop_columns(["ts"]).append_column("ts", iso)
        return t

    ds.map_batches(stringify_ts, batch_format="pyarrow",
                   zero_copy_batch=True, batch_size=None
                   ).write_csv(path, **write_kwargs)
