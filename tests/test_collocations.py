"""Tests for collocation mining, lexical diversity and byte-balanced
shard output."""

import math
import os
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from logray.functions.collocations import (
    collocation_counts,
    lexical_diversity,
    pmi_collocations,
)
from logray.functions.shards import payload_bytes, rebalance_shards


def _brute_counts(texts, min_count, n_top):
    uni, bi = Counter(), Counter()
    n_bigrams = 0
    for txt in texts:
        toks = txt.split(" ")
        uni.update(toks)
        pairs = list(zip(toks[:-1], toks[1:]))
        bi.update(pairs)
        n_bigrams += len(pairs)
    top = sorted(
        ((a, b, c) for (a, b), c in bi.items() if c >= min_count),
        key=lambda r: (-r[2], r[0], r[1]),
    )[:n_top]
    return uni, top, n_bigrams


CORPUS = [
    "new york is a big city",
    "i love new york in the fall",
    "new york new york",
    "machine learning needs big data",
    "big data and machine learning",
    "the fall of rome",
    "",
    "one",
]


def test_collocation_counts_matches_bruteforce(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"text": pa.array(CORPUS)})).repartition(3)
    got = collocation_counts(ds, "text", min_count=2, n_top=10)
    uni, top, n_bigrams = _brute_counts(CORPUS, 2, 10)

    assert got.num_rows == len(top)
    for i, (a, b, c) in enumerate(top):
        assert got["a"][i].as_py() == a
        assert got["b"][i].as_py() == b
        assert got["c_ab"][i].as_py() == c
        assert got["c_a"][i].as_py() == uni[a]
        assert got["c_b"][i].as_py() == uni[b]
        assert got["n_bigrams"][i].as_py() == n_bigrams
    # the planted phrase dominates
    assert (got["a"][0].as_py(), got["b"][0].as_py()) == ("new", "york")


def test_pmi_collocations_values_and_partition_invariance(ray_session):
    import ray.data as rd

    tbl = pa.table({"text": pa.array(CORPUS)})
    out1 = pmi_collocations(rd.from_arrow(tbl), min_count=2, n_top=10)
    out2 = pmi_collocations(rd.from_arrow(tbl).repartition(7), min_count=2, n_top=10)
    assert out1.equals(out2)
    for row in out1.to_pylist():
        want = math.log(row["c_ab"] * row["n_bigrams"] / (row["c_a"] * row["c_b"]))
        assert row["pmi"] == want


def test_lexical_diversity_counts(ray_session):
    import ray.data as rd

    tbl = pa.table({
        "source": pa.array(["w", "w", "x"]),
        "text": pa.array(["a b a", "b c", "z z z"]),
    })
    out = lexical_diversity(rd.from_arrow(tbl).repartition(2), "text", "source")
    # source w: tokens a b a b c -> 5 tokens, 3 types, hapax {c}
    w = out[out["source"] == "w"].iloc[0]
    assert (w["n_tokens"], w["n_types"], w["n_hapax"]) == (5, 3, 1)
    assert w["ttr"] == 3 / 5
    x = out[out["source"] == "x"].iloc[0]
    assert (x["n_tokens"], x["n_types"], x["n_hapax"]) == (3, 1, 0)
    assert list(out["source"]) == ["w", "x"]


def test_rebalance_shards_roundtrip_and_balance(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 400
    texts = ["x" * int(rng.integers(10, 400)) for _ in range(n)]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts),
    })
    ds = rd.from_arrow(tbl).repartition(4)
    total = payload_bytes(ds, ["text"])
    assert total == sum(len(t) for t in texts) + 16 * n

    out_dir = str(tmp_path / "shards")
    target = total // 6
    n_shards = rebalance_shards(ds, out_dir, target_bytes=target, id_col="doc_id")
    assert n_shards == math.ceil(total / target)

    # hive layout: one shard=K directory per shard
    dirs = sorted(d for d in os.listdir(out_dir) if d.startswith("shard="))
    assert len(dirs) == n_shards

    back = rd.read_parquet(out_dir).select_columns(["doc_id", "text"]).to_pandas()
    back = back.sort_values("doc_id").reset_index(drop=True)
    assert list(back["doc_id"]) == list(range(n))
    assert list(back["text"]) == texts

    # byte balance: no shard more than 3x the mean at this tiny scale
    sizes = []
    for d in dirs:
        import pyarrow.parquet as pq

        sub = pq.read_table(os.path.join(out_dir, d), columns=["text"])
        sizes.append(sum(len(t) for t in sub["text"].to_pylist()))
    assert max(sizes) <= 3 * (sum(sizes) / len(sizes))


def test_rebalance_shards_rejects_bad_target(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64()),
                                 "text": pa.array(["a"])}))
    with pytest.raises(ValueError):
        rebalance_shards(ds, "/tmp/unused", target_bytes=0)


@pytest.mark.parametrize("seed", [3, 11])
def test_collocations_fuzz_vs_duckdb(ray_session, seed):
    """Random corpora (tiny vocab => heavy collisions, empty docs,
    multi-space runs => empty tokens): both operators must match their
    DuckDB twins exactly, including the ttr float."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from logray.functions.collocations import (
        collocation_counts_sql,
        lexical_diversity_sql,
    )

    rng = np.random.default_rng(seed)
    vocab = ["a", "b", "cc", "dd", "", "zz"]
    docs = []
    for _ in range(300):
        n = int(rng.integers(0, 12))
        docs.append(" ".join(str(rng.choice(vocab)) for _ in range(n)))
    docs += [None, None]  # null text: no tokens on either side
    tbl = pa.table({
        "source": pa.array(
            [None if i % 41 == 0 else f"s{i % 3}" for i in range(len(docs))]),
        "text": pa.array(docs, pa.string()),
    })
    con = duckdb.connect()
    con.register("documents", tbl)

    ds = rd.from_arrow(tbl).repartition(5)
    got = collocation_counts(ds, "text", min_count=4, n_top=25).to_pandas()
    want = con.execute(
        collocation_counts_sql("documents", "text", min_count=4, n_top=25)
    ).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False)

    got_ld = lexical_diversity(rd.from_arrow(tbl).repartition(5),
                               "text", "source").reset_index(drop=True)
    want_ld = con.execute(
        lexical_diversity_sql("documents", "text", "source")).df()
    pd.testing.assert_frame_equal(got_ld, want_ld, check_dtype=False)
    assert (got_ld["ttr"].to_numpy() == want_ld["ttr"].to_numpy()).all()


def test_collocation_tiebreak_compares_tokens_not_joined_key(ray_session):
    """A tab inside a token sorts BEFORE the joining space in the
    concatenated key but AFTER in per-column ORDER BY a, b — the cut at
    n_top must use the per-column order (the SQL twin's)."""
    import ray.data as rd

    texts = ["x zz"] * 3 + ["x\ty q"] * 3
    ds = rd.from_arrow(pa.table({"text": pa.array(texts)}))
    got = collocation_counts(ds, "text", min_count=2, n_top=1)
    assert got.num_rows == 1
    assert (got["a"][0].as_py(), got["b"][0].as_py()) == ("x", "zz")


def test_collocation_counts_empty_input(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"text": pa.array([], pa.string())}))
    got = collocation_counts(ds, "text", min_count=1, n_top=5)
    assert got.num_rows == 0
    assert got.column_names == ["a", "b", "c_ab", "c_a", "c_b", "n_bigrams"]


def test_lexical_diversity_null_key_group(ray_session):
    """A null source is a real GROUP BY group, not droppable."""
    import ray.data as rd

    tbl = pa.table({
        "source": pa.array(["w", None, None]),
        "text": pa.array(["a b", "c c", "d"]),
    })
    out = lexical_diversity(rd.from_arrow(tbl), "text", "source")
    assert len(out) == 2
    null_row = out[out["source"].isna()].iloc[0]
    assert (null_row["n_tokens"], null_row["n_types"], null_row["n_hapax"]) == (3, 2, 1)


def test_rebalance_shards_string_and_negative_ids(ray_session, tmp_path):
    import ray.data as rd

    tbl = pa.table({
        "doc_id": pa.array(["u-1", "u-2", "u-3", "u-4"]),
        "text": pa.array(["aa", "bb", "cc", "dd"]),
    })
    # string ids count as payload too: 8 text + 12 id bytes + 4*16 overhead
    total = payload_bytes(rd.from_arrow(tbl), ["doc_id", "text"])
    n = rebalance_shards(rd.from_arrow(tbl), str(tmp_path / "s1"),
                         target_bytes=4, id_col="doc_id")
    back = rd.read_parquet(str(tmp_path / "s1")).to_pandas()
    assert sorted(back["doc_id"]) == ["u-1", "u-2", "u-3", "u-4"]
    assert n == math.ceil(total / 4) and total == 8 + 12 + 4 * 16

    tbl2 = pa.table({
        "doc_id": pa.array([-5, -1, 0, 7], pa.int64()),
        "text": pa.array(["aa", "bb", "cc", "dd"]),
    })
    rebalance_shards(rd.from_arrow(tbl2), str(tmp_path / "s2"),
                     target_bytes=4, id_col="doc_id")
    back2 = rd.read_parquet(str(tmp_path / "s2")).to_pandas()
    assert sorted(back2["doc_id"]) == [-5, -1, 0, 7]


def test_rebalance_shards_refuses_nonempty_out_dir(ray_session, tmp_path):
    import ray.data as rd

    out = tmp_path / "shards"
    out.mkdir()
    (out / "stale.parquet").write_text("x")
    ds = rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64()),
                                 "text": pa.array(["a"])}))
    with pytest.raises(FileExistsError):
        rebalance_shards(ds, str(out), target_bytes=10)


def _write_doc_files(dirpath, n=120, files=3):
    import pyarrow.parquet as pq

    os.makedirs(dirpath, exist_ok=True)
    per = n // files
    for f in range(files):
        ids = np.arange(f * per, (f + 1) * per, dtype=np.int64)
        pq.write_table(
            pa.table({
                "doc_id": pa.array(ids),
                "text": pa.array([f"doc {i} " + "x" * (i % 37) for i in ids]),
            }),
            os.path.join(dirpath, f"part-{f}.parquet"),
        )
    return n


def test_rebalance_resumable_crash_and_resume(ray_session, tmp_path):
    """Crash in EVERY phase, resume, and the union of per-file outputs is
    row-identical (including shard assignment) to the single-shot sink."""
    import ray.data as rd

    from logray.functions.shards import (
        read_rebalanced,
        rebalance_shards,
        rebalance_shards_resumable,
    )

    src = str(tmp_path / "input")
    _write_doc_files(src)
    target = 600

    # single-shot ground truth (same target/seed): hive read restores shard
    single_dir = str(tmp_path / "single")
    rebalance_shards(rd.read_parquet(src), single_dir, target_bytes=target)
    want = (rd.read_parquet(single_dir).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    want["shard"] = want["shard"].astype("int64")

    out = str(tmp_path / "resumable")
    for crash_phase in ("census", "shards"):
        crashed = {"hit": False}

        def fault(phase, part_id, cp=crash_phase):
            # crash once, on the SECOND input file of the target phase
            # (ids are name-stable: p-part-1.parquet-<sha8>)
            if phase == cp and "part-1" in part_id and not crashed["hit"]:
                crashed["hit"] = True
                raise RuntimeError("injected crash")

        with pytest.raises(RuntimeError, match="injected crash"):
            rebalance_shards_resumable(src, out, target_bytes=target,
                                       _fault=fault)
        assert crashed["hit"]

    # clean resume finishes the remaining partitions
    m = rebalance_shards_resumable(src, out, target_bytes=target)
    got = (read_rebalanced(out).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    got["shard"] = got["shard"].astype("int64")
    import pandas as pd

    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
    total = payload_bytes(rd.read_parquet(src), ["text"])
    assert m["n_shards"] == math.ceil(total / target)

    # single-shard read is path-pruned and correct
    one = read_rebalanced(out, shard=int(want["shard"].iloc[0])).to_pandas()
    sub = want[want["shard"] == want["shard"].iloc[0]]
    assert sorted(one["doc_id"]) == sorted(sub["doc_id"])

    # a different plan refuses to reuse the checkpoints
    with pytest.raises(ValueError, match="different parameters"):
        rebalance_shards_resumable(src, out, target_bytes=target * 2)
