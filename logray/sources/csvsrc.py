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
from pyarrow import csv as pacsv

from logray.sources.jsonl import _CANON, _normalize, _stringify_ts

__all__ = ["read_transcripts_csv", "write_transcripts_csv"]

# pin string columns (and ts as string, cast later by _normalize): CSV
# type INFERENCE is per-file and value-dependent — an all-empty tool
# block infers null type (reads back NULL, not ""), conv_id "0012"
# infers int64 (leading zeros destroyed) — pinning makes the round-trip
# value-independent
_PINNED_TYPES = {
    name: pa.string() for name, typ in _CANON.items()
    if pa.types.is_string(typ) or pa.types.is_timestamp(typ)
}


def read_transcripts_csv(paths, **read_kwargs):
    """Read CSV transcript files into the canonical schema.  Accepts a
    path, directory, or list (anything ``ray.data.read_csv`` takes)."""
    import ray.data as rd

    read_kwargs.setdefault(
        "parse_options", pacsv.ParseOptions(newlines_in_values=True))
    read_kwargs.setdefault(
        "convert_options", pacsv.ConvertOptions(column_types=_PINNED_TYPES))
    ds = rd.read_csv(paths, **read_kwargs)
    return ds.map_batches(_normalize, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)


def write_transcripts_csv(ds, path: str, **write_kwargs):
    """Write a transcript Dataset as CSV part files (one dir of part
    files — the resumable-partition layout, never one giant file).
    Timestamps serialize as ISO-8601 so the files round-trip through
    :func:`read_transcripts_csv`."""

    ds.map_batches(_stringify_ts, batch_format="pyarrow",
                   zero_copy_batch=True, batch_size=None
                   ).write_csv(path, **write_kwargs)
