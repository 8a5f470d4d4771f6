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
