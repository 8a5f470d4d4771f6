import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from logray.functions.curriculum import _ntile, curriculum_order, curriculum_order_sql


def test_ntile_formula_matches_duckdb():
    import duckdb

    for total, k in [(10, 3), (7, 7), (3, 7), (1, 4), (12, 4), (100, 9)]:
        rn = np.arange(1, total + 1, dtype=np.int64)
        got = _ntile(rn, total, k)
        want = duckdb.sql(
            f"SELECT NTILE({k}) OVER (ORDER BY i) AS b "
            f"FROM range(1, {total + 1}) t(i) ORDER BY i"
        ).df()["b"].to_numpy()
        assert (got == want).all(), (total, k)


def test_curriculum_order_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    rng = np.random.default_rng(3)
    n = 3000
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "score": pa.array(rng.integers(0, 40, n).astype("int64")),  # heavy ties
    })
    con = duckdb.connect()
    con.register("t", t)
    want = (con.sql(curriculum_order_sql("t", "score", "doc_id",
                                         n_bins=6, seed=9))
            .df().sort_values("doc_id").reset_index(drop=True))
    for parts in (1, 7):
        got = (curriculum_order(rd.from_arrow(t).repartition(parts),
                                "score", "doc_id", n_bins=6, seed=9,
                                as_pandas=True)
               .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[want.columns.tolist()], want, check_dtype=False)


def test_curriculum_order_properties(ray_session):
    import ray.data as rd

    n = 200
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "score": pa.array((np.arange(n) % 50).astype("int64")),
    })
    out = curriculum_order(rd.from_arrow(t), "score", "doc_id",
                           n_bins=4, seed=1, as_pandas=True)
    # every row ranked exactly once, ranks are the full 1..N permutation
    assert sorted(out["curriculum_rank"]) == list(range(1, n + 1))
    # bins are contiguous in curriculum order and near-equal sized
    by_rank = out.sort_values("curriculum_rank")
    assert (np.diff(by_rank["bin"].to_numpy()) >= 0).all()
    sizes = out["bin"].value_counts()
    assert sizes.max() - sizes.min() <= 1
    # deterministic: same seed == same order, new seed == new in-bin order
    out2 = curriculum_order(rd.from_arrow(t).repartition(3), "score",
                            "doc_id", n_bins=4, seed=1, as_pandas=True)
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        out2.sort_values("doc_id").reset_index(drop=True))
    out3 = curriculum_order(rd.from_arrow(t), "score", "doc_id",
                            n_bins=4, seed=2, as_pandas=True)
    merged = out.merge(out3, on="doc_id", suffixes=("_a", "_b"))
    assert (merged["bin_a"] == merged["bin_b"]).all()  # bins ignore seed
    assert (merged["curriculum_rank_a"] != merged["curriculum_rank_b"]).any()

    with pytest.raises(ValueError, match="n_bins"):
        curriculum_order(rd.from_arrow(t), "score", "doc_id", n_bins=0)
