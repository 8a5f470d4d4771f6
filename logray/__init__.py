"""logray — a Ray-Data-native log/transcript parse → enrich → route → aggregate engine.

A from-scratch reimplementation of the query/data-processing capabilities of
the reference viewer (tGautot/LogParser, "Logram": a single-threaded C++17
terminal log viewer) re-expressed as streaming ``ray.data.Dataset`` pipelines:

- schema-driven line parsing (format strings -> typed field extraction) runs
  as a vectorized numpy interpreter over zero-copy Arrow string buffers inside
  ``map_batches`` (reference: src/line_parsing/line_parser.cpp:58-98);
- the filter algebra (comparators, AND/OR/XOR/NOR, invert, case-insensitive,
  raw-substring, line-range) compiles to pyarrow.compute boolean masks
  (reference: src/file_parsing/line_filter.cpp);
- filtered views become fan-out routed Parquet sinks with the reference's
  malformed-line bypass policy
  (reference: src/file_parsing/filtered_file_reader.cpp:258-262);
- ordering/search semantics map to explicit (conv_id, turn_idx) sort keys.

No code is ported from the reference; the C++ sources are cited in docstrings
only as the specification of the semantics being matched.
"""

from logray.formats import FieldType, LineFormat, StrStop
from logray.filters import parse_filter_decl

__all__ = ["FieldType", "LineFormat", "StrStop", "parse_filter_decl"]

__version__ = "0.1.0"
