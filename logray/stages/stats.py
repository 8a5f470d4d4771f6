"""Per-key statistical aggregates (variance / stddev / covariance /
correlation) with EXACT integer moments.

The scale problem: sum(x^2) over integer cents overflows int64 (a 5e7-cent
order squared is 2.5e15; a few thousand rows per key overflow), and summing
squares in float64 loses the low bits that the variance's catastrophic
cancellation (E[x^2] - E[x]^2) then amplifies.  The fix is limb
decomposition: split x = a*2^18 + b (arithmetic shift, so negatives work),
then x^2 = a^2*2^36 + 2ab*2^18 + b^2 and x*y = a_x a_y*2^36 +
(a_x b_y + a_y b_x)*2^18 + b_x b_y — each limb product is < 2^36, so
per-batch per-key partial sums stay comfortably inside int64, and the
driver reconstructs the exact unbounded moments in Python ints.  Only the
tiny per-(batch, key) partial rows leave the workers; there is no shuffle
at all.

Final statistics are computed from the exact integer moments with the SAME
floating-point operation sequence the SQL twin uses, so the doubles are
bit-identical to DuckDB's HUGEINT-moment expression — see
:func:`stats_agg_sql`.  One subtlety: DuckDB's HUGEINT->DOUBLE cast is NOT
correctly rounded once |v| >= 2^64 (it reassembles from 64-bit limbs in
double arithmetic, double-rounding the low bits), while Python's
``float(int)`` is correctly rounded — the two diverge by an ulp on large
moments.  Both sides therefore convert big integers through the same
EXPLICIT two-limb expression ``float(|v| >> 62) * 2^62 + float(|v| & mask)``
(the 2^62 scale is exact, so the sequence has one defined rounding per limb
plus one for the sum, identical under IEEE-754 in both engines).

Reference parity: generalizes the reference's exact aggregate surface
(``src/file_parsing/log_parser_interface.cpp:37-44`` known-first/last
min/max bookkeeping) to second-moment statistics.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SHIFT = 18
_MASK = (1 << _SHIFT) - 1
_LIMIT = 1 << 36  # |x| must stay below this for the limb bounds to hold
_SCALE_HI = 1 << (2 * _SHIFT)
_SCALE_MID = 1 << _SHIFT


def _limbs(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """x = a*2^18 + b with 0 <= b < 2^18 (arithmetic shift handles
    negatives: floor semantics keep the identity exact)."""
    return x >> _SHIFT, x & _MASK


def _moment_partial_fn(key_cols: list[str], x_col: str, y_col: str | None):
    """map_batches fn -> per-(batch, key) int64 limb-product sums."""

    def part(t: pa.Table) -> pa.Table:
        # listwise deletion: drop rows where any moment input is null
        # (mirrored by the SQL twin's WHERE; SQL covar/corr likewise
        # ignore rows with a null on either side)
        valid = pc.is_valid(t[x_col])
        if y_col is not None:
            valid = pc.and_(valid, pc.is_valid(t[y_col]))
        t = t.filter(valid)
        x = np.asarray(t[x_col].to_numpy(zero_copy_only=False))
        if not np.issubdtype(x.dtype, np.integer):
            raise TypeError(f"stats_agg needs integer columns; {x_col} is {x.dtype}")
        x = x.astype(np.int64)
        if len(x) and int(np.abs(x).max()) >= _LIMIT:
            raise ValueError(f"{x_col} exceeds the 2^36 limb bound")
        ax, bx = _limbs(x)
        cols = {k: t[k] for k in key_cols}
        cols["sx"] = pa.array(x)
        cols["xaa"] = pa.array(ax * ax)
        cols["xab"] = pa.array(ax * bx)
        cols["xbb"] = pa.array(bx * bx)
        aggs = [("sx", "sum"), ("xaa", "sum"), ("xab", "sum"), ("xbb", "sum")]
        if y_col is not None:
            y = np.asarray(t[y_col].to_numpy(zero_copy_only=False))
            if not np.issubdtype(y.dtype, np.integer):
                raise TypeError(f"stats_agg needs integer columns; {y_col} is {y.dtype}")
            y = y.astype(np.int64)
            if len(y) and int(np.abs(y).max()) >= _LIMIT:
                raise ValueError(f"{y_col} exceeds the 2^36 limb bound")
            ay, by = _limbs(y)
            cols["sy"] = pa.array(y)
            cols["yaa"] = pa.array(ay * ay)
            cols["yab"] = pa.array(ay * by)
            cols["ybb"] = pa.array(by * by)
            cols["caa"] = pa.array(ax * ay)
            cols["cab"] = pa.array(ax * by + ay * bx)
            cols["cbb"] = pa.array(bx * by)
            aggs += [("sy", "sum"), ("yaa", "sum"), ("yab", "sum"), ("ybb", "sum"),
                     ("caa", "sum"), ("cab", "sum"), ("cbb", "sum")]
        g = pa.table(cols).group_by(key_cols).aggregate(aggs + [([], "count_all")])
        names = key_cols + [c for c, _ in aggs] + ["n"]
        return g.rename_columns(names)

    return part


def _sq_moment(saa: int, sab: int, sbb: int) -> int:
    """Reassemble the exact sum of products from its limb sums."""
    return saa * _SCALE_HI + 2 * sab * _SCALE_MID + sbb


def _cross_moment(saa: int, sab: int, sbb: int) -> int:
    return saa * _SCALE_HI + sab * _SCALE_MID + sbb


_D_SHIFT = 62
_D_SCALE = float(1 << _D_SHIFT)
_D_MASK = (1 << _D_SHIFT) - 1


def _d(v: int) -> float:
    """Exact-int -> double via the shared two-limb expression (see module
    docstring); bit-identical to the SQL twin's ``// 2^62`` form for any
    |v| < 2^126."""
    a = abs(v)
    m = float(a >> _D_SHIFT) * _D_SCALE + float(a & _D_MASK)
    return -m if v < 0 else m


def stats_agg(ds, key_cols: list[str] | str, x_col: str, y_col: str | None = None,
              as_pandas: bool = True):
    """Per-key n / mean / var_samp / stddev_samp (+ covar_samp / corr when
    ``y_col`` given) over INTEGER columns (|value| < 2^36 — use cents).
    Rows with a null x (or y) are ignored — listwise deletion, mirrored by
    the twin's WHERE; null KEYS pool into one group (SQL GROUP BY).

    Output doubles are bit-identical to the DuckDB twin from
    :func:`stats_agg_sql`; n==1 keys yield null variance and zero-variance
    keys yield null correlation, matching SQL.  Driver memory is
    O(distinct keys); accumulation uses unbounded Python ints, so no
    moment ever overflows regardless of row count."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    partials = ds.map_batches(
        _moment_partial_fn(key_cols, x_col, y_col),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )
    width = 12 if y_col is not None else 5
    acc: dict[tuple, list[int]] = {}
    part_cols = ["n", "sx", "xaa", "xab", "xbb"] + (
        ["sy", "yaa", "yab", "ybb", "caa", "cab", "cbb"] if y_col is not None else []
    )
    for chunk in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        keys = list(zip(*(chunk[k].to_pylist() for k in key_cols)))
        vals = [chunk[c].to_pylist() for c in part_cols]
        for i, key in enumerate(keys):
            slot = acc.setdefault(key, [0] * width)
            for j in range(width):
                slot[j] += vals[j][i]

    rows = []
    # null-safe key order (None is not comparable to str/int; SQL GROUP BY
    # emits one pooled null group, sorted last here)
    def _key_order(key):
        return tuple((v is None, v) for v in key)

    for key in sorted(acc, key=_key_order):
        n, sx, xaa, xab, xbb = acc[key][:5]
        sxx = _sq_moment(xaa, xab, xbb)
        # two-limb int->double per moment operand (see _d), then the same
        # op sequence as the SQL expression — equality is bitwise
        mean_x = _d(sx) / float(n)
        var_num = n * sxx - sx * sx
        if n > 1:
            var_x = _d(var_num) / float(n * (n - 1))
            stddev_x = math.sqrt(var_x)
        else:
            var_x = stddev_x = None
        row = dict(zip(key_cols, key))
        row.update(n_rows=n, mean_x=mean_x, var_x=var_x, stddev_x=stddev_x)
        if y_col is not None:
            sy, yaa, yab, ybb, caa, cab, cbb = acc[key][5:]
            syy = _sq_moment(yaa, yab, ybb)
            sxy = _cross_moment(caa, cab, cbb)
            cov_num = n * sxy - sx * sy
            row["covar_xy"] = (
                _d(cov_num) / float(n * (n - 1)) if n > 1 else None
            )
            y_num = n * syy - sy * sy
            if var_num > 0 and y_num > 0:
                row["corr_xy"] = _d(cov_num) / (
                    math.sqrt(_d(var_num)) * math.sqrt(_d(y_num))
                )
            else:
                row["corr_xy"] = None
        rows.append(row)

    out = pa.Table.from_pylist(rows) if rows else pa.table({})
    for c, typ in (("n_rows", pa.int64()), ("mean_x", pa.float64()),
                   ("var_x", pa.float64()), ("stddev_x", pa.float64()),
                   ("covar_xy", pa.float64()), ("corr_xy", pa.float64())):
        if c in out.column_names:
            out = out.set_column(out.column_names.index(c), c,
                                 out[c].cast(typ))
    return out.to_pandas() if as_pandas else out


def standardize(ds, key_col: str, x_col: str, z_col: str = "z"):
    """Per-key z-score normalization: append ``z = (x - mean_key) /
    stddev_key`` using the EXACT per-key moments from :func:`stats_agg`
    (sample stddev).  Keys with one row or zero variance yield null z,
    matching the SQL twin's NULLIF.

    Scale shape: one partial-moments pass (no shuffle) -> tiny per-key
    (mean, std) table broadcast into a second per-batch map — the
    classic fit/transform split; doubles are bit-identical to the twin
    because both sides share the :func:`stats_agg` conversion rules."""
    stats = stats_agg(ds, key_col, x_col, as_pandas=True)
    mean_map = dict(zip(stats[key_col], stats["mean_x"]))
    std_map = {
        k: (s if s and s > 0 else np.nan)
        for k, s in zip(stats[key_col], stats["stddev_x"].fillna(np.nan))
    }

    def apply(t: pa.Table) -> pa.Table:
        import pandas as pd

        keys = pd.Series(t[key_col].to_numpy(zero_copy_only=False))
        mean = keys.map(mean_map).to_numpy(np.float64)
        std = keys.map(std_map).to_numpy(np.float64)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(invalid="ignore"):
            z = (x - mean) / std
        return t.append_column(z_col, pa.array(z))

    return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=None)


def winsorize(ds, key_col: str, x_col: str, lo_q: float = 0.01,
              hi_q: float = 0.99, out_col: str | None = None,
              num_buckets: int = 32):
    """Per-key outlier clipping: clamp ``x`` into its key's exact discrete
    [lo_q, hi_q] quantile bounds (DuckDB ``quantile_disc`` semantics, so
    bounds are actual data values and integer columns clamp exactly).

    Scale shape: one :func:`grouped_quantiles` pass (bucketed, exact) ->
    tiny per-key bounds table broadcast into a per-batch ``np.clip`` —
    fit/transform, same as :func:`standardize`."""
    from logray.stages.aggregate import grouped_quantiles

    out_col = out_col or f"{x_col}_wins"
    b = grouped_quantiles(ds, key_col, x_col, [lo_q, hi_q],
                          num_buckets=num_buckets).to_pandas()
    lo_map = dict(zip(b.loc[b.q == float(lo_q), key_col],
                      b.loc[b.q == float(lo_q), "value"]))
    hi_map = dict(zip(b.loc[b.q == float(hi_q), key_col],
                      b.loc[b.q == float(hi_q), "value"]))

    def apply(t: pa.Table) -> pa.Table:
        import pandas as pd

        keys = pd.Series(t[key_col].to_numpy(zero_copy_only=False))
        x = t[x_col].to_numpy(zero_copy_only=False)
        lo = keys.map(lo_map).to_numpy()
        hi = keys.map(hi_map).to_numpy()
        clamped = np.clip(x, lo, hi)
        if np.issubdtype(x.dtype, np.integer):
            clamped = clamped.astype(np.int64)
        return t.append_column(out_col, pa.array(clamped))

    return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=None)


def winsorize_sql(table_expr: str, key_col: str, x_col: str,
                  lo_q: float = 0.01, hi_q: float = 0.99,
                  cols: str = "*", out_col: str | None = None) -> str:
    """DuckDB twin of :func:`winsorize` (identical clamp bounds).
    ``table_expr`` must carry its own alias when it is a subquery."""
    out_col = out_col or f"{x_col}_wins"
    return (
        f"SELECT {cols}, GREATEST(LEAST({x_col}, b.hi), b.lo) AS {out_col} "
        f"FROM {table_expr} JOIN ("
        f"SELECT {key_col}, quantile_disc({x_col}, {lo_q}) AS lo, "
        f"quantile_disc({x_col}, {hi_q}) AS hi "
        f"FROM {table_expr} GROUP BY {key_col}) b USING ({key_col})"
    )


def standardize_sql(table_expr: str, key_col: str, x_col: str,
                    cols: str = "*", z_col: str = "z") -> str:
    """DuckDB twin of :func:`standardize` — joins the :func:`stats_agg_sql`
    moments back so both sides run the identical float expression.
    ``table_expr`` must carry its own alias when it is a subquery."""
    m = stats_agg_sql(table_expr, key_col, x_col)
    return (
        f"SELECT {cols}, "
        f"(CAST({x_col} AS DOUBLE) - m.mean_x) / NULLIF(m.stddev_x, 0) AS {z_col} "
        f"FROM {table_expr} LEFT JOIN ({m}) m USING ({key_col})"
    )


def stats_agg_sql(table_expr: str, key_cols: list[str] | str, x_col: str,
                  y_col: str | None = None) -> str:
    """DuckDB twin of :func:`stats_agg`: exact HUGEINT moments, then the
    identical double expression (so equality is bitwise, not approximate).
    ``table_expr`` may be a subquery aliased expression."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    k = ", ".join(key_cols)

    def d(expr: str) -> str:
        # the shared two-limb HUGEINT->DOUBLE (module docstring): DuckDB's
        # native cast double-rounds above 2^64, so spell the rounding out
        q = str(1 << _D_SHIFT)
        return (
            f"(CASE WHEN ({expr}) < 0 THEN -1.0 ELSE 1.0 END)"
            f" * (CAST(abs({expr}) // {q} AS DOUBLE) * {q}.0"
            f" + CAST(abs({expr}) % {q} AS DOUBLE))"
        )

    den = "CAST(CAST(n AS HUGEINT)*(n-1) AS DOUBLE)"
    vnum, ynum, cnum = "n*sxx - sx*sx", "n*syy - sy*sy", "n*sxy - sx*sy"
    y_moments = (
        f", sum(CAST({y_col} AS HUGEINT)) AS sy, "
        f"sum(CAST({y_col} AS HUGEINT) * {y_col}) AS syy, "
        f"sum(CAST({x_col} AS HUGEINT) * {y_col}) AS sxy"
        if y_col is not None else ""
    )
    y_stats = (
        f", CASE WHEN n > 1 THEN {d(cnum)} / {den} END AS covar_xy"
        f", CASE WHEN {vnum} > 0 AND {ynum} > 0 THEN {d(cnum)}"
        f"       / (sqrt({d(vnum)}) * sqrt({d(ynum)})) END AS corr_xy"
        if y_col is not None else ""
    )
    where = f"WHERE {x_col} IS NOT NULL" + (
        f" AND {y_col} IS NOT NULL" if y_col is not None else ""
    )
    return (
        f"WITH m AS (SELECT {k}, count(*) AS n, "
        f"sum(CAST({x_col} AS HUGEINT)) AS sx, "
        f"sum(CAST({x_col} AS HUGEINT) * {x_col}) AS sxx{y_moments} "
        f"FROM {table_expr} {where} GROUP BY {k}) "
        f"SELECT {k}, CAST(n AS BIGINT) AS n_rows, "
        f"{d('sx')} / CAST(n AS DOUBLE) AS mean_x, "
        f"CASE WHEN n > 1 THEN {d(vnum)} / {den} END AS var_x, "
        f"CASE WHEN n > 1 THEN sqrt({d(vnum)} / {den}) END AS stddev_x"
        f"{y_stats} FROM m"
    )
