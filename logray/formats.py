"""Format-string schema compiler.

A *format string* declares the schema of a log/transcript line, e.g.::

    {INT:Date} {INT:Time} {STR:Level} :{CHR:,.,1}{STR:Source}: {STR:Mesg}

This module compiles such a string into a :class:`LineFormat` — an ordered
list of typed fields — and emits the corresponding ``pyarrow.Schema`` for the
extracted columns.

The grammar is semantically identical to the reference's
``LineFormat::fromFormatString`` (/root/reference/src/line_parsing/
line_format.hpp:176-284), including its quirks:

- a literal space -> whitespace field; any other literal char -> anonymous
  CHR field (no repeat);
- ``{INT:Name}`` / ``{DBL:Name}`` -> typed numeric field;
- ``{STR:Name,N}`` -> string field that always takes exactly N chars;
- ``{CHR:Name,c,r}`` -> char field matching ``c``; consumes the whole run of
  ``c`` when ``r != '0'``;
- ``{STR:Name}`` infers its stop mode from the character that follows ``}``
  in the format string: a space => stop at any whitespace, end-of-format =>
  read to end of line, any other char ``c`` => stop at ``c`` — and ``c`` is
  then *also* re-processed as the next literal field (line_format.hpp:241-248,
  the delimiter is consumed by the following CHR/WS field);
- a tag without ``:`` (e.g. ``{INT}``) does not advance the scan past the tag,
  so the tag letters leak back in as literal CHR fields — names are
  effectively mandatory (line_format.hpp:207 gate);
- ``{CHR:Name}`` (no params) produces a CHR field with target ``'\\0'``,
  which can never match inside a line;
- duplicate field names: the *last* field with a given name wins for
  name-based lookup (line_format.hpp:118-122, std::map assignment).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

import pyarrow as pa


class FieldType(enum.Enum):
    INT = "INT"
    DBL = "DBL"
    CHR = "CHR"
    STR = "STR"
    WS = "WS"


class StrStop(enum.Enum):
    NCHAR = "NCHAR"    # take exactly nchar characters
    DELIM = "DELIM"    # scan until delim char or end-of-line
    ANY_WS = "ANY_WS"  # scan until any whitespace or end-of-line


@dataclass
class Field:
    name: str
    ftype: FieldType
    # CHR options
    target: str = "\0"
    repeat: bool = False
    # STR options
    stop: StrStop = StrStop.NCHAR
    delim: str = "\0"
    nchar: int = 0


def _ch(s: str, i: int) -> str:
    """Character at i, or NUL past the end (C-string semantics)."""
    return s[i] if 0 <= i < len(s) else "\0"


def _atoi(s: str, i: int) -> int:
    """C atoi starting at offset i: skip whitespace, optional sign, digits."""
    n = len(s)
    while i < n and s[i] in " \t\n\r\v\f":
        i += 1
    sign = 1
    if i < n and s[i] in "+-":
        sign = -1 if s[i] == "-" else 1
        i += 1
    v = 0
    while i < n and s[i].isdigit():
        v = v * 10 + ord(s[i]) - 48
        i += 1
    return sign * v


class FormatError(ValueError):
    pass


class LineFormat:
    """Ordered, typed field list — the compiled schema of one line format."""

    def __init__(self) -> None:
        self.fields: list[Field] = []
        self.counts: dict[FieldType, int] = {t: 0 for t in FieldType}
        self._name_to_index: dict[str, int] = {}
        self._ordinals: list[int] = []  # per-field ordinal among same-type fields

    # -- construction -----------------------------------------------------

    def add_field(self, f: Field) -> "LineFormat":
        self._ordinals.append(self.counts[f.ftype])
        self.counts[f.ftype] += 1
        self.fields.append(f)
        if f.name:
            # last field with a given name wins (reference map-assign behavior)
            self._name_to_index[f.name] = len(self.fields) - 1
        return self

    def int_field(self, name: str) -> "LineFormat":
        return self.add_field(Field(name, FieldType.INT))

    def dbl_field(self, name: str) -> "LineFormat":
        return self.add_field(Field(name, FieldType.DBL))

    def chr_field(self, name: str, target: str, repeat: bool = False) -> "LineFormat":
        return self.add_field(Field(name, FieldType.CHR, target=target, repeat=repeat))

    def str_field(self, name: str, stop: StrStop, delim: str = "\0", nchar: int = 0) -> "LineFormat":
        return self.add_field(Field(name, FieldType.STR, stop=stop, delim=delim, nchar=nchar))

    def ws_field(self) -> "LineFormat":
        return self.add_field(Field("", FieldType.WS))

    # -- lookup -----------------------------------------------------------

    def field_by_name(self, name: str) -> Field | None:
        i = self._name_to_index.get(name)
        return self.fields[i] if i is not None else None

    def ordinal_of(self, index: int) -> int:
        """Ordinal of fields[index] among fields of the same type (the
        reference addresses parsed values by this ordinal,
        line_filter.cpp:80-84)."""
        return self._ordinals[index]

    def name_ordinal(self, name: str) -> tuple[FieldType, int]:
        i = self._name_to_index.get(name)
        if i is None:
            raise KeyError(f"no field named {name!r}")
        return self.fields[i].ftype, self._ordinals[i]

    def named_fields(self) -> list[tuple[str, Field, int]]:
        """(name, field, same-type ordinal) for each *named* field, in the
        order used for output columns; duplicate names keep only the last."""
        out = []
        for name, i in self._name_to_index.items():
            out.append((name, self.fields[i], self._ordinals[i]))
        return out

    # -- schema -----------------------------------------------------------

    _ARROW = {
        FieldType.INT: pa.int64(),
        FieldType.DBL: pa.float64(),
        FieldType.CHR: pa.string(),  # single-character string
        FieldType.STR: pa.string(),
    }

    def arrow_schema(self, include_well_formatted: bool = True) -> pa.Schema:
        cols = [pa.field(n, self._ARROW[f.ftype]) for n, f, _ in self.named_fields()]
        if include_well_formatted:
            cols.append(pa.field("well_formatted", pa.bool_()))
        return pa.schema(cols)

    # -- serialization ----------------------------------------------------

    def to_format_string(self) -> str:
        """Canonical format string (round-trips through from_format_string
        for formats built from the documented grammar)."""
        parts: list[str] = []
        skip_next_literal: str | None = None
        for f in self.fields:
            if skip_next_literal is not None:
                # this literal was auto-emitted by a preceding {STR:Name}
                # stop-mode inference; the delimiter char in the format string
                # produces it, so do not emit it twice
                if (f.ftype == FieldType.WS and skip_next_literal == " ") or (
                    f.ftype == FieldType.CHR and not f.name and f.target == skip_next_literal
                ):
                    skip_next_literal = None
                    continue
                skip_next_literal = None
            if f.ftype == FieldType.WS:
                parts.append(" ")
            elif f.ftype == FieldType.INT:
                parts.append("{INT:%s}" % f.name)
            elif f.ftype == FieldType.DBL:
                parts.append("{DBL:%s}" % f.name)
            elif f.ftype == FieldType.CHR:
                if f.name or f.repeat:
                    parts.append("{CHR:%s,%s,%d}" % (f.name, f.target, 1 if f.repeat else 0))
                else:
                    parts.append(f.target)
            elif f.ftype == FieldType.STR:
                if f.stop == StrStop.NCHAR:
                    parts.append("{STR:%s,%d}" % (f.name, f.nchar))
                elif f.stop == StrStop.ANY_WS:
                    parts.append("{STR:%s}" % f.name)
                    skip_next_literal = None  # next field is WS from the space
                    parts.append(" ")
                    skip_next_literal = " "
                else:  # DELIM
                    parts.append("{STR:%s}" % f.name)
                    if f.delim != "\0":
                        parts.append(f.delim)
                        skip_next_literal = f.delim
        return "".join(parts)

    def __repr__(self) -> str:
        return f"LineFormat({self.to_format_string()!r})"

    # -- the grammar ------------------------------------------------------

    @classmethod
    def from_format_string(cls, fmt: str) -> "LineFormat":
        """Compile a format string; grammar per line_format.hpp:176-284."""
        lf = cls()
        idx = 0
        n = len(fmt)
        while idx < n:
            c = fmt[idx]
            if c != "{":
                if c == " ":
                    lf.ws_field()
                else:
                    lf.chr_field("", c, repeat=False)
                idx += 1
                continue

            idx += 1
            c = _ch(fmt, idx)  # tag letter: I/D/S/C
            field_name = ""
            str_stop = StrStop.NCHAR
            str_nchar = 0
            str_delim = "\0"
            chr_target = "\0"
            chr_repeat = False

            if _ch(fmt, idx + 3) == ":":
                name_begin = idx + 4
                name_end = name_begin
                while True:
                    cc = _ch(fmt, name_end)
                    if cc in ("\0", ",", "}"):
                        break
                    name_end += 1
                field_name = fmt[name_begin:name_end]

                if _ch(fmt, name_end) == ",":
                    if c == "S":
                        str_nchar = _atoi(fmt, name_end + 1)
                        idx = name_end + 1
                        while _ch(fmt, idx).isdigit() and _ch(fmt, idx) in "0123456789":
                            idx += 1
                        if _ch(fmt, idx) != "}":
                            raise FormatError(f"bad {{STR:...,N}} at {idx} in {fmt!r}")
                        str_stop = StrStop.NCHAR
                        idx += 1
                    elif c == "C":
                        idx = name_end + 1
                        chr_target = _ch(fmt, idx)
                        if _ch(fmt, idx + 1) != ",":
                            raise FormatError(f"bad {{CHR:...}} at {idx} in {fmt!r}")
                        idx += 2
                        chr_repeat = _ch(fmt, idx) != "0"
                        if _ch(fmt, idx + 1) != "}":
                            raise FormatError(f"bad {{CHR:...}} at {idx} in {fmt!r}")
                        idx += 2
                    else:
                        raise FormatError(
                            f"only STR and CHR take params (tag {c!r} in {fmt!r})"
                        )
                elif _ch(fmt, name_end) == "}" and c == "S":
                    after = _ch(fmt, name_end + 1)
                    if after == " ":
                        str_stop = StrStop.ANY_WS
                    else:
                        str_stop = StrStop.DELIM
                        str_delim = after  # '\0' at end-of-format => read to EOL
                    # the char after '}' is deliberately re-processed as the
                    # next literal field (line_format.hpp:241-248)
                    idx = name_end + 1
                else:
                    idx = name_end + 1

            if c == "I":
                lf.int_field(field_name)
            elif c == "D":
                lf.dbl_field(field_name)
            elif c == "S":
                lf.str_field(field_name, str_stop, str_delim, str_nchar)
            elif c == "C":
                lf.chr_field(field_name, chr_target, chr_repeat)
            else:
                raise FormatError(f"unknown field tag {c!r} in {fmt!r}")
            # NOTE: when fmt[idx+3] != ':' the scan did not advance past the
            # tag (reference quirk): the tag letters are re-read as literals
            # on subsequent iterations.

        return lf


# The default format used by the reference's integration tests
# (/root/reference/tests/test_helpers.hpp:43-61); `{STR:Level}` is followed by
# a space so it compiles to an ANY_WS stop + whitespace field, which accepts
# the same corpus as the hand-built DELIM-space variant in the C++ helper.
GOLDEN_FORMAT = "{INT:Date} {INT:Time} {STR:Level} :{CHR:,.,1}{STR:Source}: {STR:Mesg}"
