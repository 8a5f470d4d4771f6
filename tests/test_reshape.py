"""explode_list (UNNEST WITH ORDINALITY) over list-typed columns.

The reference turns one line into one row of fields
(src/line_parsing/line_format.cpp); this is the inverse for list columns.
Semantics pinned against SQL UNNEST: null/empty lists emit no rows,
ordinality is 1-based within each parent row.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from logray.stages import explode_list
from logray.stages.reshape import collect_list


def _table():
    return pa.table(
        {
            "doc_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
            "tag": ["a", "b", "c", "d", "e"],
            "vals": pa.array(
                [[1.5, 2.5], [], None, [7.0], [8.0, 9.0, 10.0]],
                pa.list_(pa.float64()),
            ),
        }
    )


def test_explode_basic(ray_session):
    ds = rd.from_arrow(_table())
    out = explode_list(ds, "vals", id_cols=["doc_id", "tag"]).to_pandas()
    out = out.sort_values(["doc_id", "pos"]).reset_index(drop=True)
    assert list(out.columns) == ["doc_id", "tag", "pos", "vals"]
    assert out["doc_id"].tolist() == [10, 10, 13, 14, 14, 14]
    assert out["pos"].tolist() == [1, 2, 1, 1, 2, 3]
    assert out["vals"].tolist() == [1.5, 2.5, 7.0, 8.0, 9.0, 10.0]
    assert out["tag"].tolist() == ["a", "a", "d", "e", "e", "e"]


def test_explode_rename_and_no_pos(ray_session):
    ds = rd.from_arrow(_table())
    out = explode_list(
        ds, "vals", id_cols="doc_id", val_col="v", pos_col=None
    ).to_pandas()
    assert list(out.columns) == ["doc_id", "v"]
    assert len(out) == 6


def test_explode_multiblock_ordinality(ray_session):
    # ordinality restarts per parent row even across many blocks
    n = 200
    rng = np.random.default_rng(7)
    lens = rng.integers(0, 5, size=n)
    tab = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "vals": pa.array(
                [list(range(int(k))) for k in lens], pa.list_(pa.int64())
            ),
        }
    )
    ds = rd.from_arrow(tab).repartition(8)
    out = explode_list(ds, "vals", id_cols="doc_id").to_pandas()
    out = out.sort_values(["doc_id", "pos"])
    assert len(out) == int(lens.sum())
    for doc, grp in out.groupby("doc_id"):
        assert grp["pos"].tolist() == list(range(1, len(grp) + 1))
        assert grp["vals"].tolist() == list(range(len(grp)))


def test_explode_empty_batch(ray_session):
    # the per-batch kernel keeps a full schema on 0-row input (downstream
    # reduces must never see a column-less frame; cf. ADVICE ann reduce bug)
    tab = _table().slice(0, 0)
    captured = {}

    class _Probe:
        def map_batches(self, f, **kw):
            captured["fn"] = f
            return self

    explode_list(_Probe(), "vals", id_cols="doc_id")
    out = captured["fn"](tab)
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "pos", "vals"]


def test_collect_list_matches_duckdb(ray_session):
    import duckdb

    from logray.stages.reshape import collect_list

    rng = np.random.default_rng(3)
    n = 1500
    tab = pa.table(
        {
            "k": pa.array(rng.integers(0, 30, n).astype("int64")),
            "ord": pa.array(rng.permutation(n).astype("int64")),
            "v": pa.array(rng.integers(-5, 5, n).astype("int64")),
        }
    )
    out = (
        collect_list(rd.from_arrow(tab).repartition(6), "k", "v", "ord",
                     num_buckets=8)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", tab.to_pandas())
    want = con.sql(
        "SELECT k, list(v ORDER BY ord) AS v_list FROM t GROUP BY k ORDER BY k"
    ).df()
    assert out["k"].tolist() == want["k"].tolist()
    for a, b in zip(out["v_list"], want["v_list"]):
        assert list(a) == list(b)


def test_collect_list_roundtrip_with_explode(ray_session):
    # explode(collect(x)) == x
    tab = pa.table(
        {
            "k": pa.array([1, 1, 2, 2, 2], pa.int64()),
            "ord": pa.array([2, 1, 30, 10, 20], pa.int64()),
            "v": pa.array([20, 10, 300, 100, 200], pa.int64()),
        }
    )
    coll = collect_list(rd.from_arrow(tab), "k", "v", "ord")
    back = explode_list(coll, "v_list", id_cols="k", val_col="v").to_pandas()
    back = back.sort_values(["k", "pos"]).reset_index(drop=True)
    assert back["v"].tolist() == [10, 20, 100, 200, 300]
    assert back["pos"].tolist() == [1, 2, 1, 2, 3]


def test_unpivot_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from logray.stages.reshape import unpivot, unpivot_sql

    rng = np.random.default_rng(6)
    df = pd.DataFrame(
        {
            "k": np.arange(400, dtype=np.int64),
            "a": rng.normal(size=400),
            "b": rng.integers(0, 100, 400).astype("float64"),
            "c": rng.normal(size=400),
        }
    )
    df.loc[3, "a"] = None  # dropped on both sides
    got = (
        unpivot(rd.from_pandas(df).repartition(5), "k", ["a", "b", "c"])
        .to_pandas().sort_values(["k", "name"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.sql(
        unpivot_sql("t", "k", ["a", "b", "c"]) + " ORDER BY k, name"
    ).df()
    pd.testing.assert_frame_equal(got, want)
    assert len(got) == 3 * 400 - 1


def test_union_by_name_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd
    import ray.data as rd

    from logray.stages.reshape import union_by_name, union_by_name_sql

    a = pd.DataFrame({"id": [1, 2], "x": ["p", "q"]})
    b = pd.DataFrame({"y": [1.5], "id": [3]})  # different cols AND order
    got = (
        union_by_name([rd.from_pandas(a), rd.from_pandas(b)])
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("ta", a)
    con.register("tb", b)
    want = con.sql(union_by_name_sql(["ta", "tb"]) + " ORDER BY id").df()
    pd.testing.assert_frame_equal(got, want)
    assert list(got.columns) == ["id", "x", "y"]  # first-seen order


def test_union_by_name_strict_type_conflict(ray_session):
    import pandas as pd
    import pytest
    import ray.data as rd

    from logray.stages.reshape import union_by_name

    a = rd.from_pandas(pd.DataFrame({"id": [1]}))
    b = rd.from_pandas(pd.DataFrame({"id": ["s"]}))
    with pytest.raises(TypeError):
        union_by_name([a, b], strict=True)
    with pytest.raises(ValueError):
        union_by_name([])
