"""Document chunking: split long texts into overlapping context windows.

The standard pre-tokenization transform for context-window training data:
``chunk_documents`` explodes each document into character windows of
``chunk_chars`` advancing by ``chunk_chars - overlap_chars``.  The whole
batch is chunked with ONE numpy gather over the Arrow string buffer
(UTF-8 codepoint boundaries respected via the same char-starts machinery
the parser's NCHAR field uses) — no Python per row, no per-chunk slicing
calls.

Windowing contract (mirrored exactly by the DuckDB twin):
``step = chunk_chars - overlap_chars``; a document of L characters yields
``max(ceil((L - overlap) / step), 1)`` chunks; chunk ``i`` covers
characters ``[i*step, min(i*step + chunk_chars, L))`` (the final chunk is
short rather than padded; an empty document yields one empty chunk; a
null-text document yields NO chunks, like the SQL twin's
``generate_series(0, NULL)``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from logray.vparse import _string_buffer_views


def chunk_table(t: pa.Table, text_col: str = "text", id_col: str = "doc_id",
                chunk_chars: int = 512, overlap_chars: int = 64) -> pa.Table:
    """One batch -> (id_col, chunk_idx, chunk_text) rows."""
    if overlap_chars >= chunk_chars:
        raise ValueError("overlap_chars must be < chunk_chars")
    step = chunk_chars - overlap_chars

    # null-text documents are DROPPED (not emitted as one empty chunk) —
    # matches the SQL twin, where generate_series(0, NULL) yields no rows
    if t[text_col].null_count:
        t = t.filter(pa.compute.is_valid(t[text_col]))

    col = t[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    data, starts, ends = _string_buffer_views(col)
    n = len(starts)
    if n == 0:
        return pa.table({id_col: t[id_col],
                         "chunk_idx": pa.array([], pa.int64()),
                         "chunk_text": pa.array([], pa.string())})

    # absolute byte positions of codepoint starts, shared across the batch
    cs = np.flatnonzero((data & 0xC0) != 0x80).astype(np.int64)
    row_char0 = np.searchsorted(cs, starts)          # chars before each row
    chars_in_row = np.searchsorted(cs, ends) - row_char0

    L = chars_in_row.astype(np.int64)
    n_chunks = np.maximum((L - overlap_chars + step - 1) // step, 1)
    total = int(n_chunks.sum())
    parent = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(n_chunks, out=offs[1:])
    chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], n_chunks)

    start_char = chunk_idx * step
    end_char = np.minimum(start_char + chunk_chars, L[parent])
    # char -> byte: index into cs, clamped (start==L only for empty docs)
    cs_padded = np.concatenate([cs, [len(data)]])
    b_start = np.where(
        start_char < L[parent],
        cs_padded[np.minimum(row_char0[parent] + start_char, len(cs))],
        ends[parent],
    )
    b_end = np.where(
        end_char < L[parent],
        cs_padded[np.minimum(row_char0[parent] + end_char, len(cs))],
        ends[parent],
    )

    lens = (b_end - b_start).astype(np.int64)
    o = np.zeros(total + 1, np.int64)
    np.cumsum(lens, out=o[1:])
    nbytes = int(o[-1])
    if nbytes:
        gather = np.repeat(b_start, lens) + (
            np.arange(nbytes, dtype=np.int64) - np.repeat(o[:-1], lens)
        )
        buf = data[gather]
    else:
        buf = np.zeros(0, np.uint8)
    chunk_text = pa.LargeStringArray.from_buffers(
        total, pa.py_buffer(o.tobytes()), pa.py_buffer(buf.tobytes())
    ).cast(pa.string())

    ids = pa.compute.take(t[id_col], pa.array(parent))
    return pa.table({id_col: ids,
                     "chunk_idx": pa.array(chunk_idx),
                     "chunk_text": chunk_text})


def chunk_documents(ds, text_col: str = "text", id_col: str = "doc_id",
                    chunk_chars: int = 512, overlap_chars: int = 64):
    """Dataset-level chunk explode (fuses into the upstream read)."""
    return ds.map_batches(
        lambda t: chunk_table(t, text_col, id_col, chunk_chars, overlap_chars),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )


def chunk_documents_sql(table: str, text_col: str = "text",
                        id_col: str = "doc_id", chunk_chars: int = 512,
                        overlap_chars: int = 64) -> str:
    """DuckDB oracle for :func:`chunk_documents` (identical windows)."""
    step = chunk_chars - overlap_chars
    return f"""
        SELECT {id_col}, chunk_idx,
               substring({text_col}, CAST(chunk_idx * {step} + 1 AS BIGINT),
                         {chunk_chars}) AS chunk_text
        FROM (
            SELECT {id_col}, {text_col},
                   unnest(generate_series(
                       0,
                       GREATEST(CAST(ceil((length({text_col}) - {overlap_chars})
                                          / {step}.0) AS BIGINT) - 1, 0)
                   )) AS chunk_idx
            FROM {table}
            WHERE {text_col} IS NOT NULL
        )
    """
