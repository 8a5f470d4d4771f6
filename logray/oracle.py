"""Pure-Python reference oracle: exact single-line parse + filter semantics.

This module is the executable *specification* the vectorized engine is tested
against.  It reimplements, scalar and readable, the semantics of the
reference parser (/root/reference/src/line_parsing/parsing_basics.cpp,
line_parser.cpp:58-98) and the routing policy
(/root/reference/src/file_parsing/filtered_file_reader.cpp:258-262).

Semantics notes (all pinned by tests):

- ``parse_int`` mirrors C ``atol``: the *value* comes from atol (skip
  whitespace, optional sign, digit run, saturating at int64 bounds) but the
  *cursor* only advances over the digit run starting exactly at the current
  position.  Success requires ``value != 0 or line[pos] == '0'``.  Hence
  ``"-5"`` parses to -5 consuming zero characters, while ``"abc"`` fails.
- ``parse_dbl`` mirrors ``atof`` for the value (simplified: decimal syntax
  with optional exponent; hex floats / inf / nan are not recognized — they do
  not occur in log corpora) and advances over digits plus at most one ``'.'``.
- ``parse_chr`` must match its target char; with ``repeat`` it consumes the
  whole run.
- ``parse_str`` stops per its mode; NCHAR may step past end-of-line, which
  makes the line malformed via the final cursor==EOL check.
- whitespace fields skip ``isspace`` chars except ``'\\n'`` and never fail.
- A line is well-formatted iff every executed step succeeds AND the cursor
  lands exactly at end-of-line; if the line is exhausted before all fields
  ran, the remaining fields stay unset and the line is still well-formatted
  (line_parser.cpp:65,96).
- Standalone-line contract: each row's text is parsed as an independent
  NUL-terminated string (like the reference's own unit tests which use
  ``std::getline``); the mmap quirk where atol could read past the line's
  ``'\\n'`` into the next line is deliberately not reproduced.

The oracle is used by the pytest suite and by the sidecar-expectation
generator; the production path is the vectorized interpreter in
``logray.vparse`` which must agree bit-for-bit on these semantics.
"""

from __future__ import annotations

from logray.formats import Field, FieldType, LineFormat, StrStop

INT64_MAX = (1 << 63) - 1
INT64_MIN = -(1 << 63)

_C_WHITESPACE = " \t\n\v\f\r"


def _c_isspace(ch: str) -> bool:
    return ch in _C_WHITESPACE


def _atol(s: str, pos: int) -> int:
    """C atol on the suffix s[pos:], saturating at int64 bounds."""
    i, n = pos, len(s)
    while i < n and _c_isspace(s[i]):
        i += 1
    sign = 1
    if i < n and s[i] in "+-":
        sign = -1 if s[i] == "-" else 1
        i += 1
    v = 0
    while i < n and "0" <= s[i] <= "9":
        v = v * 10 + (ord(s[i]) - 48)
        i += 1
    v *= sign
    return max(INT64_MIN, min(INT64_MAX, v))


def _atof(s: str, pos: int) -> float:
    """Simplified C atof on the suffix s[pos:] (decimal + optional exponent)."""
    i, n = pos, len(s)
    while i < n and _c_isspace(s[i]):
        i += 1
    start = i
    if i < n and s[i] in "+-":
        i += 1
    digits = 0
    while i < n and "0" <= s[i] <= "9":
        i += 1
        digits += 1
    if i < n and s[i] == ".":
        i += 1
        while i < n and "0" <= s[i] <= "9":
            i += 1
            digits += 1
    if digits == 0:
        return 0.0
    # optional exponent, only if well-formed
    j = i
    if j < n and s[j] in "eE":
        j += 1
        if j < n and s[j] in "+-":
            j += 1
        edigits = 0
        while j < n and "0" <= s[j] <= "9":
            j += 1
            edigits += 1
        if edigits > 0:
            i = j
    try:
        return float(s[start:i])
    except ValueError:
        return 0.0


def _is_eol(s: str, i: int) -> bool:
    """End-of-line at offset i: end of string, NUL, LF, or CR+LF."""
    n = len(s)
    if i >= n:
        return True
    if s[i] == "\0" or s[i] == "\n":
        return True
    if s[i] == "\r" and i + 1 < n and s[i + 1] == "\n":
        return True
    return False


def parse_line(text: str, fmt: LineFormat) -> tuple[bool, list]:
    """Parse one line.

    Returns ``(well_formatted, values)`` where ``values[i]`` corresponds to
    ``fmt.fields[i]``: an int/float/str value when field i executed, else
    ``None`` (unset).  WS fields always get ``None``.  Values of executed
    fields are reported even when the line ends up malformed (callers that
    emulate the engine's output should null them when not well_formatted).
    """
    values: list = [None] * len(fmt.fields)
    pos = 0
    end = len(text)
    failed = False

    for i, f in enumerate(fmt.fields):
        if pos >= end:
            break
        if f.ftype == FieldType.INT:
            v = _atol(text, pos)
            values[i] = v
            if v == 0 and text[pos] != "0":
                failed = True
                break
            while pos < end and "0" <= text[pos] <= "9":
                pos += 1
        elif f.ftype == FieldType.DBL:
            v = _atof(text, pos)
            values[i] = v
            if v == 0.0 and text[pos] != "0":
                failed = True
                break
            dot_ok = True
            while pos < end and (
                "0" <= text[pos] <= "9" or (text[pos] == "." and dot_ok)
            ):
                if text[pos] == ".":
                    dot_ok = False
                pos += 1
        elif f.ftype == FieldType.CHR:
            if text[pos] == f.target:
                values[i] = f.target
                pos += 1
            else:
                values[i] = None  # reference writes '\0' on failure
                failed = True
                break
            if f.repeat:
                while pos < end and text[pos] == f.target:
                    pos += 1
        elif f.ftype == FieldType.STR:
            if f.stop == StrStop.NCHAR:
                # NCHAR counts characters (documented deviation: the
                # reference counts raw bytes; identical for ASCII)
                nchar = f.nchar
                values[i] = text[pos : pos + nchar]  # clamped; overshoot => malformed below
            elif f.stop == StrStop.DELIM:
                nchar = 0
                while pos + nchar < end and text[pos + nchar] != f.delim and not _is_eol(text, pos + nchar):
                    nchar += 1
                values[i] = text[pos : pos + nchar]
            else:  # ANY_WS
                nchar = 0
                while (
                    pos + nchar < end
                    and not _c_isspace(text[pos + nchar])
                    and text[pos + nchar] != "\0"
                    and not _is_eol(text, pos + nchar)
                ):
                    nchar += 1
                values[i] = text[pos : pos + nchar]
            pos += nchar  # may overshoot end for NCHAR
        elif f.ftype == FieldType.WS:
            while pos < end and text[pos] != "\0" and text[pos] != "\n" and _c_isspace(text[pos]):
                pos += 1

    well = (not failed) and pos == end
    return well, values


def parse_named(text: str, fmt: LineFormat) -> tuple[bool, dict]:
    """Parse and project to the engine's output contract: a dict of
    {column_name: value} over named fields (None when unset or malformed),
    plus the well_formatted flag."""
    well, values = parse_line(text, fmt)
    out: dict = {}
    for name, f, _ord in fmt.named_fields():
        idx = fmt._name_to_index[name]
        out[name] = values[idx] if well else None
    return well, out


def route_passes(well_formatted: bool, filter_passes: bool | None, accept_bad_format: bool) -> bool:
    """The reference's routing policy (filtered_file_reader.cpp:258-262):
    malformed rows bypass the filter entirely and pass iff
    ``accept_bad_format``; well-formed rows pass iff the filter is absent
    (``filter_passes is None``) or true."""
    if not well_formatted:
        return accept_bad_format
    return filter_passes is None or filter_passes
