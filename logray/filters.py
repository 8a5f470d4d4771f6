"""Filter algebra: DSL parse → AST → pyarrow.compute boolean masks.

Reimplements the reference's filter engine
(/root/reference/src/file_parsing/line_filter.cpp, filter_parsing.cpp) with
identical semantics:

- ``FieldFilter``: ``<field> <cmp> <value>`` with cmp in {EQ, ST, SE, GT, GE}
  for every type plus {CT, BW, EW} for STR fields; optional byte-wise ASCII
  case-insensitive variants (``_CI``) that lowercase both sides with C
  ``tolower`` (so ``ascii_lower``, *not* Unicode lower).
- ``CombinedFilter``: binary tree over {AND, OR, XOR, NOR}.
- any node can be inverted (``passes ^ inverted``); inversion is *not*
  serialized by ``to_string`` (matching line_filter.cpp:393-410 which omits
  it) and is preserved only in-memory.
- ``RawLineFilter``: substring test against the raw line text.
- ``LineNumberFilter``: inclusive global-line-number range.
- DSL grammar (filter_parsing.cpp:91-163): **no operator precedence** — the
  earliest ``" AND "``/``" OR "``/``" XOR "``/``" NOR "`` splits the string
  into a left term and the *rest* (parsed recursively => right-leaning tree);
  parentheses group; a fully parenthesized expression is unwrapped; the
  comparator is the earliest occurrence of any recognized spaced tag, with
  ``_CI`` variants checked only when the plain tag is absent-or-later
  (replicating the reference's else-if scan).

Null semantics (ours, documented): the reference compares uninitialized
memory for fields that never executed; we define a comparison against an
unset (null) field to be **false before inversion**.

Vectorized evaluation (:meth:`LineFilter.mask`) runs on Arrow tables inside
``map_batches``; scalar evaluation (:meth:`LineFilter.passes`) backs the
pure-Python oracle used in tests.
"""

from __future__ import annotations

import enum

import pyarrow as pa
import pyarrow.compute as pc

from logray.formats import FieldType, LineFormat



class Comparison(enum.Enum):
    EQUAL = "EQ"
    SMALLER = "ST"
    GREATER = "GT"
    GREATER_EQ = "GE"
    SMALLER_EQ = "SE"
    CONTAINS = "CT"
    BEGINS_WITH = "BW"
    ENDS_WITH = "EW"


class BitwiseOp(enum.Enum):
    AND = "AND"
    OR = "OR"
    XOR = "XOR"
    NOR = "NOR"


class FilterError(ValueError):
    pass


def _c_tolower(s: str) -> str:
    """Byte-wise ASCII tolower (C locale ::tolower), not Unicode lower."""
    return "".join(chr(ord(c) + 32) if "A" <= c <= "Z" else c for c in s)


def _stol(s: str) -> int:
    """std::stol: skip ws, optional sign, decimal digits; throws without
    digits."""
    i, n = 0, len(s)
    while i < n and s[i] in " \t\n\v\f\r":
        i += 1
    sign = 1
    if i < n and s[i] in "+-":
        sign = -1 if s[i] == "-" else 1
        i += 1
    j = i
    while j < n and "0" <= s[j] <= "9":
        j += 1
    if j == i:
        raise FilterError(f"stol: no digits in {s!r}")
    return sign * int(s[i:j])


def _stod(s: str) -> float:
    """std::stod on the longest valid prefix; throws without any conversion."""
    i, n = 0, len(s)
    while i < n and s[i] in " \t\n\v\f\r":
        i += 1
    j = i
    if j < n and s[j] in "+-":
        j += 1
    d0 = j
    while j < n and "0" <= s[j] <= "9":
        j += 1
    if j < n and s[j] == ".":
        j += 1
        while j < n and "0" <= s[j] <= "9":
            j += 1
    if j == d0 or (j == d0 + 1 and s[d0] == "."):
        raise FilterError(f"stod: no digits in {s!r}")
    k = j
    if k < n and s[k] in "eE":
        k += 1
        if k < n and s[k] in "+-":
            k += 1
        e0 = k
        while k < n and "0" <= s[k] <= "9":
            k += 1
        if k > e0:
            j = k
    return float(s[i:j])


def _as_bool_array(mask, length: int) -> pa.Array:
    if isinstance(mask, pa.ChunkedArray):
        mask = mask.combine_chunks()
    if isinstance(mask, pa.Scalar):
        mask = pa.array([mask.as_py()] * length, pa.bool_())
    return mask


class EvalContext:
    """Names the non-field columns filters may reference."""

    def __init__(self, text_col: str = "text", line_col: str = "line_num") -> None:
        self.text_col = text_col
        self.line_col = line_col


DEFAULT_CTX = EvalContext()


class LineFilter:
    def __init__(self) -> None:
        self.inverted = False

    def invert(self) -> "LineFilter":
        self.inverted = not self.inverted
        return self

    # scalar ---------------------------------------------------------------
    def passes(self, row: dict, ctx: EvalContext = DEFAULT_CTX) -> bool:
        return self._passes(row, ctx) ^ self.inverted

    def _passes(self, row: dict, ctx: EvalContext) -> bool:
        raise NotImplementedError

    # vectorized -----------------------------------------------------------
    def mask(self, table: pa.Table, ctx: EvalContext = DEFAULT_CTX) -> pa.Array:
        m = _as_bool_array(self._mask(table, ctx), table.num_rows)
        m = pc.fill_null(m, False)  # null field => false before inversion
        if self.inverted:
            m = pc.invert(m)
        return m

    def _mask(self, table: pa.Table, ctx: EvalContext):
        raise NotImplementedError

    # identity -------------------------------------------------------------
    def to_string(self) -> str:
        raise NotImplementedError

    def equals(self, other: "LineFilter") -> bool:
        """Structural equality ignoring inversion (reference ``equals``)."""
        raise NotImplementedError

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, LineFilter)
            and self.inverted == other.inverted
            and self.equals(other)
        )

    def __repr__(self) -> str:
        inv = "!" if self.inverted else ""
        return f"<{inv}{self.to_string()}>"


class FieldFilter(LineFilter):
    """Typed comparison against one named field (line_filter.cpp:72-265)."""

    _STR_ONLY = {Comparison.CONTAINS, Comparison.BEGINS_WITH, Comparison.ENDS_WITH}

    def __init__(
        self,
        fmt: LineFormat,
        field_name: str,
        comp: Comparison,
        value: str,
        case_insensitive: bool = False,
    ) -> None:
        super().__init__()
        f = fmt.field_by_name(field_name)
        if f is None:
            raise FilterError(f"FieldFilter error: Couldn't find field named {field_name}")
        self.field_name = field_name
        self.ftype = f.ftype
        self.comp = comp
        self.case_insensitive = case_insensitive
        if f.ftype == FieldType.INT:
            self.value = _stol(value)
        elif f.ftype == FieldType.DBL:
            self.value = _stod(value)
        elif f.ftype == FieldType.CHR:
            # std::string operator[] at size() yields '\0'
            self.value = value[0] if value else "\0"
        elif f.ftype == FieldType.STR:
            self.value = _c_tolower(value) if case_insensitive else value
        else:
            raise FilterError(f"cannot filter on field type {f.ftype}")
        if f.ftype != FieldType.STR and comp in self._STR_ONLY:
            raise FilterError(
                f"Filter on field {field_name} has unsupported operation for type {f.ftype.name}"
            )

    def _passes(self, row: dict, ctx: EvalContext) -> bool:
        v = row.get(self.field_name)
        if v is None:
            return False
        if self.ftype == FieldType.STR and self.case_insensitive:
            v = _c_tolower(v)
        c, val = self.comp, self.value
        if c == Comparison.EQUAL:
            return v == val
        if c == Comparison.SMALLER:
            return v < val
        if c == Comparison.SMALLER_EQ:
            return v <= val
        if c == Comparison.GREATER:
            return v > val
        if c == Comparison.GREATER_EQ:
            return v >= val
        if c == Comparison.CONTAINS:
            return val in v
        if c == Comparison.BEGINS_WITH:
            return v.startswith(val)
        if c == Comparison.ENDS_WITH:
            return v.endswith(val)
        raise FilterError(f"unsupported comparison {c}")

    def _mask(self, table: pa.Table, ctx: EvalContext):
        if self.field_name not in table.column_names:
            raise FilterError(f"column {self.field_name!r} missing from batch")
        col = table[self.field_name]
        val = self.value
        if self.ftype == FieldType.STR and self.case_insensitive:
            col = pc.ascii_lower(col)
        c = self.comp
        if c == Comparison.EQUAL:
            return pc.equal(col, val)
        if c == Comparison.SMALLER:
            return pc.less(col, val)
        if c == Comparison.SMALLER_EQ:
            return pc.less_equal(col, val)
        if c == Comparison.GREATER:
            return pc.greater(col, val)
        if c == Comparison.GREATER_EQ:
            return pc.greater_equal(col, val)
        if c == Comparison.CONTAINS:
            return pc.match_substring(col, val)
        if c == Comparison.BEGINS_WITH:
            return pc.starts_with(col, val)
        if c == Comparison.ENDS_WITH:
            return pc.ends_with(col, val)
        raise FilterError(f"unsupported comparison {c}")

    def to_string(self) -> str:
        tag = self.comp.value + ("_CI" if self.case_insensitive else "")
        if self.ftype == FieldType.DBL:
            value = "%.6f" % self.value  # std::to_string(double)
        elif self.ftype == FieldType.INT:
            value = str(self.value)
        else:
            value = str(self.value)
        return f"{self.field_name} {tag} {value}"

    def equals(self, other: LineFilter) -> bool:
        return (
            isinstance(other, FieldFilter)
            and self.field_name == other.field_name
            and self.ftype == other.ftype
            and self.comp == other.comp
            and self.case_insensitive == other.case_insensitive
            and self.value == other.value
        )


class CombinedFilter(LineFilter):
    """Binary combinator over two filters (line_filter.cpp:16-69)."""

    def __init__(self, left: LineFilter, right: LineFilter, op: BitwiseOp) -> None:
        super().__init__()
        self.left = left
        self.right = right
        self.op = op

    def _passes(self, row: dict, ctx: EvalContext) -> bool:
        l = self.left.passes(row, ctx)
        r = self.right.passes(row, ctx)
        if self.op == BitwiseOp.AND:
            return l and r
        if self.op == BitwiseOp.OR:
            return l or r
        if self.op == BitwiseOp.XOR:
            return l ^ r
        if self.op == BitwiseOp.NOR:
            return not (l or r)
        raise FilterError(f"unknown op {self.op}")

    def _mask(self, table: pa.Table, ctx: EvalContext):
        l = self.left.mask(table, ctx)
        r = self.right.mask(table, ctx)
        if self.op == BitwiseOp.AND:
            return pc.and_(l, r)
        if self.op == BitwiseOp.OR:
            return pc.or_(l, r)
        if self.op == BitwiseOp.XOR:
            return pc.xor(l, r)
        if self.op == BitwiseOp.NOR:
            return pc.invert(pc.or_(l, r))
        raise FilterError(f"unknown op {self.op}")

    def to_string(self) -> str:
        return f"({self.left.to_string()}) {self.op.value} ({self.right.to_string()})"

    def equals(self, other: LineFilter) -> bool:
        return (
            isinstance(other, CombinedFilter)
            and self.op == other.op
            and self.left.equals(other.left)
            and self.right.equals(other.right)
        )


class RawLineFilter(LineFilter):
    """Substring test on the raw line (line_filter.cpp:278-287)."""

    def __init__(self, must_contain: str) -> None:
        super().__init__()
        self.must_contain = must_contain

    def _passes(self, row: dict, ctx: EvalContext) -> bool:
        raw = row.get(ctx.text_col)
        return raw is not None and self.must_contain in raw

    def _mask(self, table: pa.Table, ctx: EvalContext):
        return pc.match_substring(table[ctx.text_col], self.must_contain)

    def to_string(self) -> str:
        return f"raw_contains:{self.must_contain}"

    def equals(self, other: LineFilter) -> bool:
        return isinstance(other, RawLineFilter) and self.must_contain == other.must_contain


class LineNumberFilter(LineFilter):
    """Inclusive global line-number range (line_filter.cpp:267-276)."""

    def __init__(self, line_from: int, line_to: int) -> None:
        super().__init__()
        self.line_from = line_from
        self.line_to = line_to

    def _passes(self, row: dict, ctx: EvalContext) -> bool:
        n = row.get(ctx.line_col)
        return n is not None and self.line_from <= n <= self.line_to

    def _mask(self, table: pa.Table, ctx: EvalContext):
        col = table[ctx.line_col]
        return pc.and_(
            pc.greater_equal(col, self.line_from), pc.less_equal(col, self.line_to)
        )

    def to_string(self) -> str:
        return f"line_num CT {self.line_from},{self.line_to}"

    def equals(self, other: LineFilter) -> bool:
        return (
            isinstance(other, LineNumberFilter)
            and self.line_from == other.line_from
            and self.line_to == other.line_to
        )


# ---------------------------------------------------------------------------
# DSL parsing (filter_parsing.cpp)
# ---------------------------------------------------------------------------

_BITWISE_TAGS = [("AND", BitwiseOp.AND), ("OR", BitwiseOp.OR), ("XOR", BitwiseOp.XOR), ("NOR", BitwiseOp.NOR)]

# search order matters: earliest occurrence wins, ties broken by scan order
# (filter_parsing.cpp:54-88), including the typo'd GREATER_OR_EQUAl alias.
_COMPARATOR_TAGS = [
    ("EQ", Comparison.EQUAL),
    ("EQUAL", Comparison.EQUAL),
    ("ST", Comparison.SMALLER),
    ("SMALLER", Comparison.SMALLER),
    ("SMALLER_THAN", Comparison.SMALLER),
    ("SE", Comparison.SMALLER_EQ),
    ("SMALLER_EQ", Comparison.SMALLER_EQ),
    ("SMALLER_EQUAL", Comparison.SMALLER_EQ),
    ("SMALLER_OR_EQUAL", Comparison.SMALLER_EQ),
    ("GT", Comparison.GREATER),
    ("GREATER", Comparison.GREATER),
    ("GREATER_THAN", Comparison.GREATER),
    ("GE", Comparison.GREATER_EQ),
    ("GREATER_EQ", Comparison.GREATER_EQ),
    ("GREATER_EQUAL", Comparison.GREATER_EQ),
    ("GREATER_OR_EQUAl", Comparison.GREATER_EQ),
    ("CT", Comparison.CONTAINS),
    ("CONTAINS", Comparison.CONTAINS),
    ("BW", Comparison.BEGINS_WITH),
    ("BEGINS_WITH", Comparison.BEGINS_WITH),
    ("SW", Comparison.BEGINS_WITH),
    ("STARTS_WITH", Comparison.BEGINS_WITH),
    ("EW", Comparison.ENDS_WITH),
    ("ENDS_WITH", Comparison.ENDS_WITH),
]

_INF = float("inf")


def find_next_bitwise_op(s: str, start_pos: int = 0):
    """Earliest spaced combinator tag at/after start_pos; returns
    (pos_of_tag_first_letter | None, op)."""
    best = _INF
    op = BitwiseOp.AND
    for tag, o in _BITWISE_TAGS:
        v = s.find(f" {tag} ", start_pos)
        if v != -1 and v < best:
            best = v + 1
            op = o
    return (None if best == _INF else int(best)), op


def find_next_comparator(s: str, start_pos: int = 0):
    """Earliest spaced comparator tag; the _CI variant of a tag is only
    considered when the plain tag was not found earlier (else-if scan,
    filter_parsing.cpp:19-31).  Returns (pos | None, tag_size, comp, ci)."""
    best = _INF
    tag_size = 0
    comp = Comparison.EQUAL
    ci = False
    for tag, o in _COMPARATOR_TAGS:
        v = s.find(f" {tag} ", start_pos)
        if v != -1 and v < best:
            best, tag_size, comp, ci = v + 1, len(tag), o, False
        else:
            v = s.find(f" {tag}_CI ", start_pos)
            if v != -1 and v < best:
                best, tag_size, comp, ci = v + 1, len(tag) + 3, o, True
    return (None if best == _INF else int(best)), tag_size, comp, ci


def _trim(s: str) -> str:
    return s.strip(" \t\n\v\f\r")


def parse_filter_decl(fdecl: str, fmt: LineFormat) -> LineFilter | None:
    """Parse a filter declaration string (filter_parsing.cpp:91-163).

    Leftmost-combinator split with NO precedence: ``A OR B AND C`` parses as
    ``A OR (B AND C)`` (right-leaning), while ``(A OR B) AND C`` needs
    explicit parentheses.  Empty input yields ``None`` (no filter).
    """
    while True:
        if fdecl == "":
            return None
        fdecl = _trim(fdecl)
        if not fdecl:
            raise FilterError("Could not find any of the recognized comparison operator")
        if fdecl[0] == "(":
            depth = 0
            expr_end = 0
            n = len(fdecl)
            while True:
                if fdecl[expr_end] == "(":
                    depth += 1
                elif fdecl[expr_end] == ")":
                    depth -= 1
                if depth > 0:
                    expr_end += 1
                    if expr_end >= n:
                        break
                else:
                    break
            if expr_end == n:
                raise FilterError("Found '(' but no matching ')'")
            if expr_end + 1 == n:
                fdecl = fdecl[1 : n - 1]
                continue  # fully wrapped: unwrap and restart
            left = parse_filter_decl(fdecl[1:expr_end], fmt)
            pos, op = find_next_bitwise_op(fdecl, expr_end)
            if pos is None:
                raise FilterError(f"expected combinator after ')' in {fdecl!r}")
            offset = 2 if op == BitwiseOp.OR else 3
            right = parse_filter_decl(fdecl[pos + offset :], fmt)
            return CombinedFilter(left, right, op)

        pos, op = find_next_bitwise_op(fdecl)
        if pos is not None:
            left = parse_filter_decl(fdecl[:pos], fmt)
            offset = 2 if op == BitwiseOp.OR else 3
            right = parse_filter_decl(fdecl[pos + offset :], fmt)
            return CombinedFilter(left, right, op)

        tag_pos, tag_size, comp, ci = find_next_comparator(fdecl)
        if tag_pos is None:
            raise FilterError("Could not find any of the recognized comparison operator")
        field_name = _trim(fdecl[:tag_pos])
        value_str = _trim(fdecl[tag_pos + tag_size :])
        if field_name == "line_num":
            if comp != Comparison.CONTAINS:
                raise FilterError(
                    "Special filter linenum must have tag CT or CONTAINS before value"
                )
            comma = value_str.find(",")
            from_str = _trim(value_str[:comma]) if comma != -1 else _trim(value_str)
            to_str = _trim(value_str[comma + 1 :])
            if not (from_str and from_str[0].isdigit()) or not (to_str and to_str[0].isdigit()):
                raise FilterError("from/to value of line_num filter is not a valid number")
            return LineNumberFilter(int(_stol(from_str)), int(_stol(to_str)))
        return FieldFilter(fmt, field_name, comp, value_str, ci)
