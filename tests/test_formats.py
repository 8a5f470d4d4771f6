"""Format-string grammar tests (mirrors /root/reference/tests/test_line_format.cpp)."""

import pytest

from logray.formats import FieldType, FormatError, LineFormat, StrStop, GOLDEN_FORMAT


def kinds(fmt):
    return [f.ftype for f in fmt.fields]


def test_literal_space_is_ws():
    fmt = LineFormat.from_format_string("   ")
    assert kinds(fmt) == [FieldType.WS] * 3


def test_literal_chars_are_anonymous_chr():
    fmt = LineFormat.from_format_string("a:b")
    assert kinds(fmt) == [FieldType.CHR] * 3
    assert [f.target for f in fmt.fields] == ["a", ":", "b"]
    assert all(not f.repeat for f in fmt.fields)
    assert all(f.name == "" for f in fmt.fields)


def test_int_dbl_named():
    fmt = LineFormat.from_format_string("{INT:A} {DBL:B}")
    assert kinds(fmt) == [FieldType.INT, FieldType.WS, FieldType.DBL]
    assert fmt.fields[0].name == "A"
    assert fmt.fields[2].name == "B"
    assert fmt.counts[FieldType.INT] == 1
    assert fmt.counts[FieldType.DBL] == 1
    assert fmt.counts[FieldType.WS] == 1


def test_chr_with_params():
    fmt = LineFormat.from_format_string("{CHR:Dot,.,1}{CHR:Colon,:,0}")
    a, b = fmt.fields
    assert a.name == "Dot" and a.target == "." and a.repeat is True
    assert b.name == "Colon" and b.target == ":" and b.repeat is False


def test_chr_empty_name():
    fmt = LineFormat.from_format_string("{CHR:,.,1}")
    (f,) = fmt.fields
    assert f.name == "" and f.target == "." and f.repeat is True


def test_str_nchar():
    fmt = LineFormat.from_format_string("{STR:Code,5}")
    (f,) = fmt.fields
    assert f.stop == StrStop.NCHAR and f.nchar == 5 and f.name == "Code"


def test_str_stop_inference_space():
    # a space after } => ANY_WS stop; the space ALSO becomes a WS field
    fmt = LineFormat.from_format_string("{STR:A} {INT:B}")
    assert kinds(fmt) == [FieldType.STR, FieldType.WS, FieldType.INT]
    assert fmt.fields[0].stop == StrStop.ANY_WS


def test_str_stop_inference_delim():
    # char c after } => DELIM c; c is re-processed as a literal CHR field
    fmt = LineFormat.from_format_string("{STR:A}:{INT:B}")
    assert kinds(fmt) == [FieldType.STR, FieldType.CHR, FieldType.INT]
    assert fmt.fields[0].stop == StrStop.DELIM and fmt.fields[0].delim == ":"
    assert fmt.fields[1].target == ":"


def test_str_stop_inference_eol():
    # end-of-format after } => DELIM '\0' (read to end of line)
    fmt = LineFormat.from_format_string("{STR:A}")
    (f,) = fmt.fields
    assert f.stop == StrStop.DELIM and f.delim == "\0"


def test_golden_format_structure():
    # test_helpers.hpp:43-61: 2 INT, 3 CHR, 3 STR, 4 WS
    fmt = LineFormat.from_format_string(GOLDEN_FORMAT)
    assert fmt.counts[FieldType.INT] == 2
    assert fmt.counts[FieldType.CHR] == 3
    assert fmt.counts[FieldType.STR] == 3
    assert fmt.counts[FieldType.WS] == 4
    assert fmt.field_by_name("Level").stop == StrStop.ANY_WS
    assert fmt.field_by_name("Source").delim == ":"
    assert fmt.field_by_name("Mesg").delim == "\0"


def test_name_lookup_and_ordinals():
    fmt = LineFormat.from_format_string("{INT:A} {STR:S1} {INT:B} {STR:S2}")
    assert fmt.name_ordinal("A") == (FieldType.INT, 0)
    assert fmt.name_ordinal("B") == (FieldType.INT, 1)
    assert fmt.name_ordinal("S1") == (FieldType.STR, 0)
    assert fmt.name_ordinal("S2") == (FieldType.STR, 1)
    assert fmt.field_by_name("nope") is None


def test_duplicate_name_last_wins():
    fmt = LineFormat.from_format_string("{INT:X} {STR:X}")
    assert fmt.field_by_name("X").ftype == FieldType.STR


def test_colonless_tag_quirk():
    # {INT} (no colon) adds the INT field but does not advance past the tag,
    # so 'I','N','T','}' leak back in as literal CHR fields
    # (line_format.hpp:207 gate; names are effectively mandatory).
    fmt = LineFormat.from_format_string("{INT}")
    assert kinds(fmt) == [FieldType.INT] + [FieldType.CHR] * 4
    assert [f.target for f in fmt.fields[1:]] == ["I", "N", "T", "}"]


def test_chr_without_params_matches_nul():
    fmt = LineFormat.from_format_string("{CHR:Name}")
    (f,) = fmt.fields
    assert f.target == "\0" and f.name == "Name"


def test_bad_param_tag_raises():
    with pytest.raises(FormatError):
        LineFormat.from_format_string("{INT:A,5}")


def test_bad_nchar_raises():
    with pytest.raises(FormatError):
        LineFormat.from_format_string("{STR:A,5x}")


def test_arrow_schema():
    import pyarrow as pa

    fmt = LineFormat.from_format_string(GOLDEN_FORMAT)
    schema = fmt.arrow_schema()
    assert schema.field("Date").type == pa.int64()
    assert schema.field("Level").type == pa.string()
    assert schema.field("well_formatted").type == pa.bool_()


def test_format_string_roundtrip():
    for s in [
        GOLDEN_FORMAT,
        "{INT:A} {DBL:B}",
        "{STR:A}:{INT:B}",
        "{STR:A,7}x{CHR:C,.,1}",
        "{STR:A}",
        "[{STR:Tag}] {STR:Rest}",
    ]:
        fmt = LineFormat.from_format_string(s)
        s2 = fmt.to_format_string()
        fmt2 = LineFormat.from_format_string(s2)
        assert [(f.ftype, f.name, f.target, f.repeat, f.stop, f.delim, f.nchar) for f in fmt.fields] == [
            (f.ftype, f.name, f.target, f.repeat, f.stop, f.delim, f.nchar) for f in fmt2.fields
        ]
