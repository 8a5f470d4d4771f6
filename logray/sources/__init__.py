from logray.sources.csvsrc import read_transcripts_csv, write_transcripts_csv
from logray.sources.jsonl import read_transcripts_jsonl, write_transcripts_jsonl
from logray.sources.warc import (
    WARC_SCHEMA,
    fetch_warc_record,
    read_warc,
    read_warc_cdx,
    read_warc_select,
    write_warc,
)
from logray.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    read_transcripts,
    synth_transcripts_table,
    transcripts_from_events,
    write_synth_transcripts,
)

__all__ = [
    "TRANSCRIPT_SCHEMA",
    "read_transcripts_csv",
    "write_transcripts_csv",
    "read_transcripts_jsonl",
    "write_transcripts_jsonl",
    "read_transcripts",
    "synth_transcripts_table",
    "transcripts_from_events",
    "write_synth_transcripts",
    "WARC_SCHEMA",
    "read_warc",
    "read_warc_cdx",
    "read_warc_select",
    "fetch_warc_record",
    "write_warc",
]
