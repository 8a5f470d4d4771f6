"""Filter algebra tests (mirrors /root/reference/tests/test_filters.cpp and
test_filter_roundtrip.cpp): every comparator x type, CI variants, invert,
combinator truth tables, DSL parse/serialize round-trip, precedence pins,
and vectorized-mask vs scalar-oracle equivalence."""

import numpy as np
import pyarrow as pa
import pytest

from logray.filters import (
    BitwiseOp,
    CombinedFilter,
    Comparison,
    EvalContext,
    FieldFilter,
    FilterError,
    LineNumberFilter,
    RawLineFilter,
    parse_filter_decl,
)
from logray.formats import LineFormat

FMT = LineFormat.from_format_string("{INT:Val} {DBL:Score} {CHR:Mark,#,0} {STR:Name}")
ROW = {"Val": 42, "Score": 2.5, "Mark": "#", "Name": "Hello"}


def f(decl: str):
    return parse_filter_decl(decl, FMT)


# ---------------------------------------------------------------------------
# FieldFilter comparators
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "decl,expect",
    [
        ("Val EQ 42", True),
        ("Val EQ 41", False),
        ("Val ST 43", True),
        ("Val ST 42", False),
        ("Val SE 42", True),
        ("Val SE 41", False),
        ("Val GT 41", True),
        ("Val GT 42", False),
        ("Val GE 42", True),
        ("Val GE 43", False),
        ("Score EQ 2.5", True),
        ("Score GT 2.4", True),
        ("Score ST 2.4", False),
        ("Mark EQ #", True),
        ("Mark EQ $", False),
        ("Mark GT !", True),
        ("Name EQ Hello", True),
        ("Name EQ hello", False),
        ("Name EQ_CI hello", True),
        ("Name EQ_CI HELLO", True),
        ("Name CT ell", True),
        ("Name CT xyz", False),
        ("Name CT_CI ELL", True),
        ("Name BW He", True),
        ("Name BW he", False),
        ("Name BW_CI he", True),
        ("Name SW He", True),
        ("Name STARTS_WITH He", True),
        ("Name EW lo", True),
        ("Name EW Lo", False),
        ("Name EW_CI LO", True),
        ("Name ENDS_WITH lo", True),
        # string ordering comparisons are byte-wise lexicographic
        ("Name ST Hf", True),
        ("Name GT Ha", True),
        # longer-than-field needle
        ("Name EW HelloWorld", False),
        # alias tags
        ("Val EQUAL 42", True),
        ("Val SMALLER 43", True),
        ("Val SMALLER_THAN 43", True),
        ("Val SMALLER_EQ 42", True),
        ("Val SMALLER_EQUAL 42", True),
        ("Val SMALLER_OR_EQUAL 42", True),
        ("Val GREATER 41", True),
        ("Val GREATER_THAN 41", True),
        ("Val GREATER_EQ 42", True),
        ("Val GREATER_EQUAL 42", True),
        ("Val GREATER_OR_EQUAl 42", True),
        ("Name CONTAINS ell", True),
        ("Name BEGINS_WITH He", True),
    ],
)
def test_field_filter_scalar_and_mask(decl, expect):
    flt = f(decl)
    assert flt.passes(ROW) == expect
    table = pa.table({k: [v] for k, v in ROW.items()})
    assert flt.mask(table).to_pylist() == [expect]


def test_unknown_field_raises():
    with pytest.raises(FilterError):
        f("Nope EQ 3")


def test_str_only_comparator_on_int_raises():
    with pytest.raises(FilterError):
        f("Val CT 3")


def test_invert():
    flt = f("Val EQ 42")
    assert flt.passes(ROW) is True
    flt.invert()
    assert flt.passes(ROW) is False
    table = pa.table({k: [v] for k, v in ROW.items()})
    assert flt.mask(table).to_pylist() == [False]
    flt.invert()
    assert flt.passes(ROW) is True


def test_null_field_fails_before_inversion():
    flt = f("Val EQ 42")
    assert flt.passes({"Val": None}) is False
    inv = f("Val EQ 42").invert()
    assert inv.passes({"Val": None}) is True
    table = pa.table({"Val": pa.array([None], pa.int64())})
    assert flt.mask(table).to_pylist() == [False]
    assert inv.mask(table).to_pylist() == [True]


# ---------------------------------------------------------------------------
# Combinators (truth tables, line_filter.cpp:22-69)
# ---------------------------------------------------------------------------

TT = [(True, True), (True, False), (False, True), (False, False)]


@pytest.mark.parametrize(
    "op,results",
    [
        (BitwiseOp.AND, [True, False, False, False]),
        (BitwiseOp.OR, [True, True, True, False]),
        (BitwiseOp.XOR, [False, True, True, False]),
        (BitwiseOp.NOR, [False, False, False, True]),
    ],
)
def test_combinator_truth_table(op, results):
    for (l, r), want in zip(TT, results):
        left = f("Val EQ 42") if l else f("Val EQ 0")
        right = f("Name EQ Hello") if r else f("Name EQ nope")
        c = CombinedFilter(left, right, op)
        assert c.passes(ROW) == want, (op, l, r)
        table = pa.table({k: [v] for k, v in ROW.items()})
        assert c.mask(table).to_pylist() == [want]


def test_combined_inverted():
    c = CombinedFilter(f("Val EQ 42"), f("Name EQ Hello"), BitwiseOp.AND)
    c.invert()
    assert c.passes(ROW) is False


# ---------------------------------------------------------------------------
# Raw / line-number filters
# ---------------------------------------------------------------------------


def test_raw_line_filter():
    flt = RawLineFilter("needle")
    assert flt.passes({"text": "hay needle stack"}) is True
    assert flt.passes({"text": "hay stack"}) is False
    t = pa.table({"text": ["a needle", "nope"]})
    assert flt.mask(t).to_pylist() == [True, False]


def test_line_number_filter():
    flt = LineNumberFilter(5, 10)
    assert [flt.passes({"line_num": n}) for n in (4, 5, 10, 11)] == [False, True, True, False]
    t = pa.table({"line_num": [4, 5, 10, 11]})
    assert flt.mask(t).to_pylist() == [False, True, True, False]


def test_line_number_custom_column():
    ctx = EvalContext(line_col="turn_idx")
    flt = LineNumberFilter(1, 2)
    t = pa.table({"turn_idx": [0, 1, 2, 3]})
    assert flt.mask(t, ctx).to_pylist() == [False, True, True, False]


# ---------------------------------------------------------------------------
# DSL parse + round-trip (test_filter_roundtrip.cpp)
# ---------------------------------------------------------------------------


def test_dsl_empty_is_none():
    assert parse_filter_decl("", FMT) is None


@pytest.mark.parametrize(
    "decl,canon",
    [
        ("Val EQ 42", "Val EQ 42"),
        ("  Val   EQ   42  ", "Val EQ 42"),
        ("Val EQUAL 42", "Val EQ 42"),
        ("Val SMALLER_THAN 7", "Val ST 7"),
        ("Val GREATER_OR_EQUAl 7", "Val GE 7"),
        ("Name EQ_CI hello", "Name EQ_CI hello"),
        ("Name CONTAINS abc", "Name CT abc"),
        ("Name STARTS_WITH ab", "Name BW ab"),
        ("Name ENDS_WITH ab", "Name EW ab"),
        ("Score GT 1.5", "Score GT 1.500000"),
        ("Val EQ 42 AND Name EQ hello", "(Val EQ 42) AND (Name EQ hello)"),
        ("Val EQ 1 OR Val EQ 2", "(Val EQ 1) OR (Val EQ 2)"),
        ("Val EQ 1 XOR Val EQ 2", "(Val EQ 1) XOR (Val EQ 2)"),
        ("Val EQ 1 NOR Val EQ 2", "(Val EQ 1) NOR (Val EQ 2)"),
        # no precedence: leftmost op splits; right side re-parsed => right-leaning
        (
            "Val EQ 1 OR Val EQ 2 AND Name EQ x",
            "(Val EQ 1) OR ((Val EQ 2) AND (Name EQ x))",
        ),
        (
            "(Val EQ 1 OR Val EQ 2) AND Name EQ x",
            "((Val EQ 1) OR (Val EQ 2)) AND (Name EQ x)",
        ),
        ("((Val EQ 1))", "Val EQ 1"),
        (
            "(Val EQ 1) AND (Val EQ 2) AND (Val EQ 3)",
            "(Val EQ 1) AND ((Val EQ 2) AND (Val EQ 3))",
        ),
        ("line_num CT 3,9", "line_num CT 3,9"),
        ("line_num CONTAINS 3 , 9", "line_num CT 3,9"),
    ],
)
def test_dsl_canonical_serialization(decl, canon):
    assert f(decl).to_string() == canon


@pytest.mark.parametrize(
    "decl",
    [
        "Val EQ 42",
        "Name EQ_CI hello",
        "Score GE 1.500000",
        "(Val EQ 42) AND (Name EQ hello)",
        "(Val EQ 1) OR ((Val EQ 2) AND (Name EQ x))",
        "((Val EQ 1) NOR (Val EQ 2)) XOR (Name CT z)",
        "line_num CT 3,9",
    ],
)
def test_dsl_roundtrip_idempotent(decl):
    once = f(decl)
    twice = parse_filter_decl(once.to_string(), FMT)
    assert once.to_string() == twice.to_string()
    assert once.equals(twice)
    assert once == twice


def test_equals_distinguishes_inversion():
    a, b = f("Val EQ 42"), f("Val EQ 42")
    assert a == b
    b.invert()
    assert a.equals(b)  # structural equality ignores inversion
    assert a != b  # operator== does not


def test_line_num_requires_ct():
    with pytest.raises(FilterError):
        f("line_num EQ 3,9")


def test_line_num_bad_value():
    with pytest.raises(FilterError):
        f("line_num CT x,9")


def test_unbalanced_paren():
    with pytest.raises(FilterError):
        f("(Val EQ 1 AND Name EQ x")


def test_fout_semantics():
    # :fout = invert the new filter then AND with the current one
    # (filter_management_module.cpp:97-101)
    cur = f("Val GT 10")
    new = f("Name CT bad")
    new.invert()
    combined = CombinedFilter(cur, new, BitwiseOp.AND)
    assert combined.passes({"Val": 42, "Name": "good stuff"}) is True
    assert combined.passes({"Val": 42, "Name": "bad stuff"}) is False


# ---------------------------------------------------------------------------
# Fuzz: vectorized mask == scalar passes on random rows
# ---------------------------------------------------------------------------

FUZZ_DECLS = [
    "Val EQ 5",
    "Val GE 3 AND Score ST 2.0",
    "Name CT_CI ab OR Val GT 7",
    "(Name BW x) XOR (Val SE 4)",
    "(Val EQ 1 OR Val EQ 2) NOR Name EW z",
    "Mark EQ # AND Name EQ_CI ABC",
]


@pytest.mark.parametrize("decl", FUZZ_DECLS)
def test_fuzz_mask_equals_scalar(decl):
    rng = np.random.default_rng(7)
    flt = f(decl)
    n = 400
    names = ["", "ab", "AB", "xyz", "aBc", "zz", "Hello", None]
    rows = {
        "Val": [int(v) if rng.random() > 0.1 else None for v in rng.integers(0, 9, n)],
        "Score": [float(v) if rng.random() > 0.1 else None for v in rng.uniform(0, 4, n)],
        "Mark": [rng.choice(["#", "$", None]) for _ in range(n)],
        "Name": [rng.choice(names) for _ in range(n)],
    }
    table = pa.table(
        {
            "Val": pa.array(rows["Val"], pa.int64()),
            "Score": pa.array(rows["Score"], pa.float64()),
            "Mark": pa.array(rows["Mark"], pa.string()),
            "Name": pa.array(rows["Name"], pa.string()),
        }
    )
    mask = flt.mask(table).to_pylist()
    for i in range(n):
        row = {k: rows[k][i] for k in rows}
        assert mask[i] == flt.passes(row), (decl, row)


# ---------------------------------------------------------------------------
# Remaining reference pins (test_line_filter.cpp, test_filter_roundtrip.cpp)
# ---------------------------------------------------------------------------


def test_int_filter_over_golden_corpus(golden_lines):
    """Time GE 85409 passes exactly from 0-based line 34 on
    (test_line_filter.cpp:21-33, which counts 1-based from 35)."""
    from logray.formats import GOLDEN_FORMAT
    from logray.oracle import parse_named

    gf = LineFormat.from_format_string(GOLDEN_FORMAT)
    flt = parse_filter_decl("Time GE 85409", gf)
    for i, line in enumerate(golden_lines):
        well, vals = parse_named(line, gf)
        got = flt.passes(vals)
        assert got == (i >= 34 and well), i


def test_string_filter_over_golden_corpus(golden_lines):
    from logray.formats import GOLDEN_FORMAT
    from logray.oracle import parse_named

    gf = LineFormat.from_format_string(GOLDEN_FORMAT)
    flt = parse_filter_decl("Level EQ INFO", gf)
    matches = sum(
        flt.passes(parse_named(l, gf)[1]) for l in golden_lines
    )
    assert matches == 10


@pytest.mark.parametrize(
    "decl",
    [
        # deeply nested / chained shapes (test_filter_roundtrip.cpp:430-460)
        "((Val EQ 1) AND ((Val EQ 2) OR (Val EQ 3)))",
        "(Val EQ 1) AND ((Val EQ 2) OR ((Val EQ 3) AND (Name EQ x)))",
        "((Val EQ 1) OR (Val EQ 2)) AND ((Val EQ 3) OR (Name EQ x))",
        "Val EQ 1 AND Val EQ 2 AND Val EQ 3 AND Name EQ x",
        "(line_num CT 0,9) AND (Name CT z)",
        "(((Val EQ 7)))",
    ],
)
def test_roundtrip_nested_shapes(decl):
    once = f(decl)
    twice = parse_filter_decl(once.to_string(), FMT)
    assert once.equals(twice)
    assert once.to_string() == twice.to_string()


def test_parens_override_natural_order():
    # (A OR B) AND C differs structurally from A OR B AND C
    # (test_filter_roundtrip.cpp:455-470)
    no_parens = f("Val EQ 1 OR Val EQ 2 AND Name EQ x")
    with_parens = f("(Val EQ 1 OR Val EQ 2) AND Name EQ x")
    assert not no_parens.equals(with_parens)
    assert no_parens.equals(parse_filter_decl(no_parens.to_string(), FMT))
    assert with_parens.equals(parse_filter_decl(with_parens.to_string(), FMT))


def test_equals_cross_type_false():
    a = f("Val EQ 5")
    b = LineNumberFilter(5, 5)
    c = RawLineFilter("5")
    assert not a.equals(b) and not b.equals(a)
    assert not b.equals(c) and not c.equals(b)
