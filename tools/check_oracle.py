"""Local replica of the driver's correctness gate: run every queries() entry
and compare with oracle_sql() via DuckDB (row count + sorted-column
order-insensitive value comparison).

Usage: python tools/check_oracle.py [sf_dir] [--only name1,name2,...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> str:
    if len(got) != len(want):
        return f"ROWS {len(got)} vs {len(want)}"
    if sorted(map(str.lower, got.columns)) != sorted(map(str.lower, want.columns)):
        return f"COLS {sorted(got.columns)} vs {sorted(want.columns)}"
    want = want.rename(columns={w: g for g in got.columns for w in want.columns if g.lower() == w.lower()})
    g, w = _canon(got), _canon(want)
    if list(map(str, g.dtypes)) != list(map(str, w.dtypes)):
        mism = [(c, str(g[c].dtype), str(w[c].dtype)) for c in g.columns if str(g[c].dtype) != str(w[c].dtype)]
        return f"DTYPES {mism}"
    if not g.equals(w):
        neq = (g != w) & ~(g.isna() & w.isna())
        bad = neq.any(axis=1)
        return f"VALUES ({int(bad.sum())} rows differ; first: {g[bad].head(2).to_dict('records')} vs {w[bad].head(2).to_dict('records')})"
    return "OK"


def main() -> int:
    argv = sys.argv[1:]
    only: set[str] | None = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = _to_df(fn(sf_dir))
        except Exception as e:
            print(f"{name:26s} ERROR running query: {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"{name:26s} rows-only: {len(got)} rows  ({dt:.1f}s)")
            if len(got) == 0 and name not in ("search_miss",):
                print(f"{name:26s}   WARNING: 0 rows")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"{name:26s} ERROR in oracle SQL: {e}")
            failures += 1
            continue
        verdict = compare(name, got, want)
        status = "ok" if verdict == "OK" else "FAIL"
        print(f"{name:26s} {status}  {len(got)} rows  ({dt:.1f}s)" + ("" if verdict == "OK" else f"  -> {verdict}"))
        if verdict != "OK":
            failures += 1
    ray.shutdown()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
