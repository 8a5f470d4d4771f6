"""Raw log-file source: the reference's actual input format.

The reference mmaps one log file and addresses lines by global line number
(/root/reference/src/file_parsing/filtered_file_reader.cpp).  Here a raw
``.log`` file (or a directory of them) becomes a Dataset with schema::

    path: string, line_num: int64, text: string

- one read task per file (``read_binary_files``), so per-file line numbers
  are assigned locally with no cross-task coordination — the distributed
  analog of the reference's global line index (which is also per-file);
- CRLF and trailing-LF handling matches the reference reader
  (filtered_file_reader.cpp:155-165): lines split on '\\n', one trailing
  '\\r' stripped, a final empty fragment after the last newline ignored;
- the split is a vectorized numpy scan over the file bytes, not a Python
  loop over lines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _split_file(path: str, data: bytes) -> pa.Table:
    buf = np.frombuffer(data, np.uint8)
    if len(buf) == 0:
        return pa.table(
            {"path": pa.array([], pa.string()), "line_num": pa.array([], pa.int64()),
             "text": pa.array([], pa.string())}
        )
    nl = np.flatnonzero(buf == 0x0A)
    starts = np.concatenate([[0], nl + 1]).astype(np.int64)
    ends = np.concatenate([nl, [len(buf)]]).astype(np.int64)
    # drop the empty tail fragment when the file ends with a newline
    if len(starts) > 1 and starts[-1] == ends[-1]:
        starts, ends = starts[:-1], ends[:-1]
    # strip one trailing CR per line (CRLF corpora)
    has_cr = np.zeros(len(ends), bool)
    inner = ends > starts
    has_cr[inner] = buf[np.maximum(ends[inner] - 1, 0)] == 0x0D
    ends = ends - has_cr
    n = len(starts)
    lens = ends - starts
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    gather = np.repeat(starts, lens) + (
        np.arange(int(offs[-1]), dtype=np.int64) - np.repeat(offs[:-1], lens)
    )
    text = pa.LargeStringArray.from_buffers(
        n, pa.py_buffer(offs.tobytes()), pa.py_buffer(buf[gather].tobytes())
    ).cast(pa.string())
    return pa.table(
        {
            "path": pa.array([path] * n, pa.string()),
            "line_num": pa.array(np.arange(n, dtype=np.int64)),
            "text": text,
        }
    )


def _maybe_decompress(path: str, data: bytes) -> bytes:
    """Safety net for compressed logs: Ray's ``read_binary_files`` already
    auto-decompresses by extension through Arrow's filesystem layer, so
    this only acts when the payload still carries a compression magic
    (e.g. a source that bypassed the auto path)."""
    if path.endswith(".gz") and data[:2] == b"\x1f\x8b":
        import gzip

        return gzip.decompress(data)
    if path.endswith(".zst") and data[:4] == b"\x28\xb5\x2f\xfd":
        # Codec.decompress needs the decompressed size up front; the
        # streaming reader does not
        return pa.input_stream(pa.BufferReader(data), compression="zstd").read()
    return data


def read_log_lines(path: str):
    """Dataset of (path, line_num, text) for a raw log file / directory.
    ``.gz`` / ``.zst`` files are decompressed in the read task."""
    import ray.data as rd

    ds = rd.read_binary_files(path, include_paths=True)

    def split(batch: pa.Table) -> pa.Table:
        tables = []
        for p, b in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
            tables.append(_split_file(p, _maybe_decompress(p, b)))
        if not tables:
            return _split_file("", b"")
        return pa.concat_tables(tables)

    return ds.map_batches(split, batch_format="pyarrow")


def log_file_to_transcripts(path: str, conv_from_path: bool = True):
    """Adapt a raw log file to the transcript schema: each file is one
    conversation, line_num becomes turn_idx, roles unknown."""
    import pyarrow.compute as pc

    ds = read_log_lines(path)

    def adapt(t: pa.Table) -> pa.Table:
        conv = t["path"] if conv_from_path else pa.array(["log"] * t.num_rows)
        return pa.table(
            {
                "conv_id": conv,
                "turn_idx": t["line_num"].cast(pa.int32()),
                "role": pa.array(["log"] * t.num_rows, pa.string()),
                "text": t["text"],
                "tool": pa.array([""] * t.num_rows, pa.string()),
                "ts": pa.nulls(t.num_rows, pa.timestamp("us")),
            }
        )

    return ds.map_batches(adapt, batch_format="pyarrow")
