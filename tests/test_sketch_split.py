"""group_split (leakage-free grouped train/test split) and Count-Min
sketch tests."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from logray.functions.sample import group_split, group_split_sql
from logray.functions.sketch import cm_counts, cm_estimate, cm_table


@pytest.fixture()
def grouped_rows(ray_session):
    import ray.data as rd

    rows = [{"row_id": i, "user_id": i % 37, "conv": f"conv{i % 23}"}
            for i in range(600)]
    return rd.from_items(rows, override_num_blocks=4), rows


def test_group_split_no_leakage_int_key(grouped_rows):
    ds, _ = grouped_rows
    out = group_split(ds, {"train": 0.7, "test": 0.3}, "user_id",
                      seed=5).to_pandas()
    per_group = out.groupby("user_id")["split"].nunique()
    assert (per_group == 1).all()          # whole group in one split
    assert set(out["split"]) == {"train", "test"}


def test_group_split_matches_sql_twin(grouped_rows):
    ds, rows = grouped_rows
    out = group_split(ds, {"train": 0.7, "test": 0.3}, "user_id",
                      seed=5).to_pandas().sort_values("row_id",
                                                      ignore_index=True)
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows))
    sql = group_split_sql("t", {"train": 0.7, "test": 0.3}, "user_id",
                          seed=5) + " ORDER BY row_id"
    want = con.execute(sql).fetchdf()
    assert list(out["split"]) == list(want["split"])


def test_group_split_string_key_no_leakage(grouped_rows):
    ds, _ = grouped_rows
    out = group_split(ds, {"a": 0.5, "b": 0.5}, "conv", seed=1).to_pandas()
    per_group = out.groupby("conv")["split"].nunique()
    assert (per_group == 1).all()
    # both splits populated with 23 groups at 50/50 (deterministic draw)
    assert set(out["split"]) == {"a", "b"}


def test_group_split_stable_under_partitioning(ray_session):
    import ray.data as rd

    rows = [{"row_id": i, "user_id": i % 11} for i in range(200)]
    a = group_split(rd.from_items(rows, override_num_blocks=1),
                    {"x": 0.4, "y": 0.6}, "user_id").to_pandas()
    b = group_split(rd.from_items(rows, override_num_blocks=7),
                    {"x": 0.4, "y": 0.6}, "user_id").to_pandas()
    assert list(a.sort_values("row_id")["split"]) == \
        list(b.sort_values("row_id")["split"])


def test_temperature_mixture_alpha1_is_identity(ray_session):
    import ray.data as rd

    from logray.functions.sample import temperature_mixture

    rows = [{"doc_id": i, "source": f"s{i % 4}"} for i in range(100)]
    out = temperature_mixture(rd.from_items(rows), "source", "doc_id",
                              alpha=1.0).to_pandas()
    assert len(out) == 100
    assert (out["copy_idx"] == 1).all()


def test_temperature_mixture_flattens(ray_session):
    """alpha=0 targets uniform effective counts across sources."""
    import ray.data as rd

    from logray.functions.sample import temperature_mixture

    rows = ([{"doc_id": i, "source": "big"} for i in range(900)]
            + [{"doc_id": 1000 + i, "source": "small"} for i in range(100)])
    out = temperature_mixture(rd.from_items(rows), "source", "doc_id",
                              alpha=0.0, seed=3).to_pandas()
    got = out["source"].value_counts().to_dict()
    # target: 500 each (N * c^0 / sum(c^0) = 1000/2); Bernoulli noise on
    # the fractional part only
    assert abs(got["big"] - 500) < 60
    assert abs(got["small"] - 500) < 60
    assert got["small"] > 400  # genuinely upsampled (rate 5.0)


def test_temperature_mixture_matches_sql_twin(ray_session):
    import ray.data as rd

    from logray.functions.sample import (temperature_mixture,
                                         temperature_mixture_sql)

    rows = [{"doc_id": i, "source": f"s{i % 5}"} for i in range(211)]
    got = temperature_mixture(rd.from_items(rows), "source", "doc_id",
                              alpha=0.4, seed=7).to_pandas()
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows))
    want = con.execute(temperature_mixture_sql(
        "t", "source", "doc_id", alpha=0.4, seed=7,
        cols="doc_id, source")).fetchdf()
    key = ["doc_id", "source", "copy_idx"]
    g = got[key].sort_values(key, ignore_index=True)
    w = want[key].sort_values(key, ignore_index=True).astype(g.dtypes)
    assert g.equals(w)


def test_cm_exact_when_collision_free():
    vals = pa.array(["a"] * 10 + ["b"] * 7 + ["c"] * 3 + [None] * 2)
    tab = cm_table(vals, width=1024, depth=4)
    est = cm_estimate(tab, ["a", "b", "c", "zzz"], key_type=pa.string())
    assert list(est[:3]) == [10, 7, 3]
    assert est[3] == 0  # absent key, no collisions at this width


def test_cm_overestimates_under_collisions():
    rng = np.random.default_rng(5)
    keys = [f"k{i}" for i in range(500)]
    counts = rng.integers(1, 50, size=500)
    vals = pa.array([k for k, c in zip(keys, counts) for _ in range(int(c))])
    tab = cm_table(vals, width=16, depth=3)  # forced collisions
    est = cm_estimate(tab, keys, key_type=pa.string())
    assert (est >= counts).all()            # CM never underestimates
    assert int(tab[0].sum()) == int(counts.sum())  # mass preserved per row


def test_cm_merge_is_sum():
    a = pa.array(["x"] * 5 + ["y"] * 2)
    b = pa.array(["x"] * 3 + ["z"] * 4)
    merged = cm_table(a, 256, 4) + cm_table(b, 256, 4)
    both = cm_table(pa.array(["x"] * 8 + ["y"] * 2 + ["z"] * 4), 256, 4)
    assert (merged == both).all()


def test_cm_counts_dataset(ray_session):
    import ray.data as rd

    rows = [{"v": ["alpha", "beta", "gamma"][i % 3]} for i in range(90)]
    ds = rd.from_items(rows, override_num_blocks=5)
    out = cm_counts(ds, "v", ["alpha", "beta", "gamma", "nope"],
                    key_type=pa.string())
    got = dict(zip(out["v"], out["approx_count"]))
    assert got == {"alpha": 30, "beta": 30, "gamma": 30, "nope": 0}
