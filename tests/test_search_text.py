"""BM25 full-text search tests (functions/search_text.py)."""

import math

import numpy as np
import pandas as pd
import pytest


DOCS = [
    "the cat sat on the mat",
    "the dog chased the cat around the yard",
    "quantum computing with superconducting qubits",
    "a cat and a dog and another cat",
    "mat weaving techniques of the old world",
    "dogs are loyal animals, cats are independent",
]


def _naive_bm25(docs, query, k1=1.5, b=0.75):
    import re

    def toks(s):
        return [w for w in re.split(r"[^a-z0-9]+", s.lower()) if w]

    corpus = [toks(d) for d in docs]
    n = len(corpus)
    avgdl = sum(len(c) for c in corpus) / n
    qts = sorted(set(toks(query)))
    scores = []
    for c in corpus:
        s = 0.0
        for t in qts:
            df = sum(1 for cc in corpus if t in cc)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            f = c.count(t)
            s += idf * (f * (k1 + 1)) / (f + k1 * (1 - b + b * len(c) / avgdl))
        scores.append(s)
    return scores


def test_bm25_topk_matches_naive(ray_session):
    import ray.data as rd

    from logray.functions.search_text import bm25_topk

    df = pd.DataFrame({"doc_id": np.arange(len(DOCS), dtype=np.int64),
                       "text": DOCS})
    out = bm25_topk(rd.from_pandas(df).repartition(3),
                    [(0, "cat mat"), (1, "dog"), (2, "quantum qubits")], k=3)
    for qid, qtext in [(0, "cat mat"), (1, "dog"), (2, "quantum qubits")]:
        naive = _naive_bm25(DOCS, qtext)
        want_order = sorted(range(len(DOCS)), key=lambda i: (-naive[i], i))[:3]
        got = out[out["query_id"] == qid].sort_values("rank")
        assert got["doc_id"].tolist() == want_order, (qid, naive)
        for d, s in zip(got["doc_id"], got["score"]):
            assert s == pytest.approx(naive[d], rel=1e-12), (qid, d)


def test_bm25_stats_reuse_and_zero_hit_query(ray_session):
    import ray.data as rd

    from logray.functions.search_text import bm25_topk, corpus_stats, tokenize_terms

    df = pd.DataFrame({"doc_id": np.arange(len(DOCS), dtype=np.int64),
                       "text": DOCS})
    ds = rd.from_pandas(df).repartition(2)
    queries = [(7, "cat"), (8, "zzz nothing matches")]
    vocab = sorted({t for _, q in queries for t in tokenize_terms(q)})
    stats = corpus_stats(ds, vocab)
    assert stats["n_docs"] == len(DOCS)
    out = bm25_topk(ds, queries, k=2, stats=stats)
    z = out[out["query_id"] == 8]
    # no matching term -> all scores 0; rows still returned (rank by doc id)
    assert (z["score"] == 0).all()
    c = out[out["query_id"] == 7].sort_values("rank")
    assert c["score"].iloc[0] > 0


def test_bm25_corpus_stats_df_counts(ray_session):
    import ray.data as rd

    from logray.functions.search_text import corpus_stats

    df = pd.DataFrame({"doc_id": np.arange(len(DOCS), dtype=np.int64),
                       "text": DOCS})
    stats = corpus_stats(rd.from_pandas(df).repartition(3), ["cat", "dog", "zzz"])
    order = stats["order"]
    assert stats["df"][order["cat"]] == 3   # docs 0, 1, 3 ('cats' != 'cat')
    assert stats["df"][order["dog"]] == 2   # docs 1, 3 ('dogs' != 'dog')
    assert stats["df"][order["zzz"]] == 0


def test_bm25_index_build_and_search(ray_session, tmp_path):
    """Persistent inverted index: scores match the scan-based bm25_topk
    (and the naive twin) exactly up to float summation order; shard
    pruning, append additivity, param-mismatch refusal, empty/missing
    index refusal all pinned."""
    import ray.data as rd

    from logray.functions.search_text import (
        bm25_search_index,
        bm25_topk,
        build_text_index,
    )

    df = pd.DataFrame({"doc_id": np.arange(len(DOCS), dtype=np.int64),
                       "text": DOCS})
    idx = str(tmp_path / "bm25_idx")
    build_text_index(rd.from_pandas(df).repartition(3), idx, num_shards=4)

    queries = [(0, "cat mat"), (1, "dog"), (2, "quantum qubits")]
    got = bm25_search_index(idx, queries, k=3)
    scan = bm25_topk(rd.from_pandas(df).repartition(3), queries, k=3)
    for qid, qtext in queries:
        g = got[got["query_id"] == qid].sort_values("rank")
        s = scan[scan["query_id"] == qid].sort_values("rank")
        naive = _naive_bm25(DOCS, qtext)
        # index search never fabricates zero-score docs; compare the
        # matching-doc prefix
        n_match = sum(1 for x in naive if x > 0)
        kk = min(3, n_match)
        assert g["doc_id"].tolist()[:kk] == s["doc_id"].tolist()[:kk]
        for d, sc in zip(g["doc_id"], g["score"]):
            assert sc == pytest.approx(naive[d], rel=1e-12)

    # query for a term absent from the corpus -> empty, no crash
    miss = bm25_search_index(idx, [(9, "zzznope")], k=3)
    assert miss.empty

    # append a new doc: its postings land additively, stats update
    extra = pd.DataFrame({"doc_id": np.array([100], dtype=np.int64),
                          "text": ["cat cat cat mat"]})
    build_text_index(rd.from_pandas(extra), idx, num_shards=4)
    all_docs = DOCS + ["cat cat cat mat"]
    got2 = bm25_search_index(idx, [(0, "cat mat")], k=4)
    naive2 = _naive_bm25(all_docs, "cat mat")
    ids = list(range(len(DOCS))) + [100]
    want = sorted(range(len(all_docs)),
                  key=lambda i: (-naive2[i], ids[i]))[:4]
    assert got2.sort_values("rank")["doc_id"].tolist() == [ids[i] for i in want]

    # param mismatch refuses; a bare directory refuses as an index
    with pytest.raises(ValueError, match="built with"):
        build_text_index(rd.from_pandas(extra), idx, num_shards=8)
    with pytest.raises(ValueError, match="refusing"):
        bm25_search_index(str(tmp_path), [(0, "cat")], k=1)


def test_bm25_build_resumable_crash_resume(ray_session, tmp_path):
    """Kill the index build mid-run: finished partitions survive, the
    metadata sidecar is absent (search refuses the incomplete index),
    and a re-invocation finishes the build with search results
    IDENTICAL to a single-shot build."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from logray.functions.search_text import (
        bm25_search_index,
        build_text_index,
        build_text_index_resumable,
    )

    src = tmp_path / "corpus"
    src.mkdir()
    ids = np.arange(len(DOCS), dtype=np.int64)
    for i in range(3):  # 3 input files -> 3 partitions
        sel = slice(i * 2, i * 2 + 2)
        pq.write_table(pa.table({"doc_id": ids[sel],
                                 "text": DOCS[sel.start:sel.stop]}),
                       src / f"f{i}.parquet")

    one = str(tmp_path / "oneshot")
    build_text_index(rd.read_parquet(str(src)), one, num_shards=4)

    res = str(tmp_path / "resumable")
    crashed = []

    def fault(phase, part_id):
        if len(crashed) >= 2:
            raise RuntimeError("injected crash")
        crashed.append(part_id)

    with pytest.raises(RuntimeError, match="injected crash"):
        build_text_index_resumable(str(src), res, num_shards=4,
                                   _fault=fault)
    # incomplete: no sidecar, search refuses
    with pytest.raises(ValueError, match="refusing"):
        bm25_search_index(res, [(0, "cat")], k=1)

    build_text_index_resumable(str(src), res, num_shards=4)
    queries = [(0, "cat mat"), (1, "dog"), (2, "quantum qubits")]
    a = bm25_search_index(one, queries, k=4)
    b = bm25_search_index(res, queries, k=4)
    for c in ("query_id", "doc_id", "rank"):
        assert a[c].tolist() == b[c].tolist()
    assert (a["score"].to_numpy() == b["score"].to_numpy()).all()

    # plan mismatch refuses
    with pytest.raises(ValueError, match="different parameters"):
        build_text_index_resumable(str(src), res, num_shards=8)


def test_compact_index_bm25_and_band(ray_session, tmp_path):
    """compact_index rewrites an append-accumulated index as one file
    per shard into a fresh dir: search results identical, file count
    collapses, meta preserved, and the refusal contracts hold (probe
    of a half-published dst refuses; non-empty dst refuses; bare dir
    refuses as source)."""
    import os

    import ray.data as rd

    from logray.functions.indexbase import compact_index, shard_files
    from logray.functions.neardup_incremental import (
        build_band_index, dedup_near_against_index)
    from logray.functions.search_text import (bm25_search_index,
                                              build_text_index)

    df = pd.DataFrame({"doc_id": np.arange(len(DOCS), dtype=np.int64),
                       "text": DOCS})
    idx = str(tmp_path / "bm25_src")
    # two appends + repartition -> several small files per shard
    build_text_index(rd.from_pandas(df).repartition(3), idx, num_shards=4)
    extra = pd.DataFrame({"doc_id": np.array([100], dtype=np.int64),
                          "text": ["cat cat cat mat"]})
    build_text_index(rd.from_pandas(extra), idx, num_shards=4)
    queries = [(0, "cat mat"), (1, "dog")]
    before = bm25_search_index(idx, queries, k=4)

    dst = str(tmp_path / "bm25_compact")
    stats = compact_index(idx, dst)
    assert stats["files_in"] > stats["files_out"] == stats["shards"]
    after = bm25_search_index(dst, queries, k=4)
    assert before.values.tolist() == after.values.tolist()
    assert len(shard_files(dst, "__s")) == stats["shards"]

    # band index: probe results identical across compaction
    bidx = str(tmp_path / "band_src")
    build_band_index(rd.from_pandas(df).repartition(3), bidx, num_shards=4)
    probe = pd.DataFrame({"doc_id": np.array([7, 8], dtype=np.int64),
                          "text": [DOCS[0], "nothing like the corpus"]})
    kept_before = dedup_near_against_index(
        rd.from_pandas(probe), bidx).to_pandas()
    bdst = str(tmp_path / "band_compact")
    compact_index(bidx, bdst)
    kept_after = dedup_near_against_index(
        rd.from_pandas(probe), bdst).to_pandas()
    assert kept_before["doc_id"].tolist() == kept_after["doc_id"].tolist()

    # refusal contracts
    with pytest.raises(ValueError, match="non-empty"):
        compact_index(idx, dst)
    with pytest.raises(ValueError, match="refusing"):
        compact_index(str(tmp_path), str(tmp_path / "x"))
    # half-published dst (no meta yet) is not an index to probes
    half = str(tmp_path / "half")
    os.makedirs(os.path.join(half, "__s=0"))
    with pytest.raises(ValueError, match="refusing"):
        bm25_search_index(half, queries, k=2)


def test_compact_index_resumable_layout(ray_session, tmp_path):
    """compact_index also flattens the resumable parts/<pid>/ layout
    (shard_files covers both); searches against the compacted flat
    index match the resumable source exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from logray.functions.indexbase import compact_index
    from logray.functions.search_text import (bm25_search_index,
                                              build_text_index_resumable)

    src = tmp_path / "corpus"
    src.mkdir()
    ids = np.arange(len(DOCS), dtype=np.int64)
    for i in range(3):
        sel = slice(i * 2, i * 2 + 2)
        pq.write_table(pa.table({"doc_id": ids[sel],
                                 "text": DOCS[sel.start:sel.stop]}),
                       src / f"f{i}.parquet")
    idx = str(tmp_path / "resumable_idx")
    build_text_index_resumable(str(src), idx, num_shards=4)
    queries = [(0, "cat mat"), (1, "dog")]
    before = bm25_search_index(idx, queries, k=4)
    dst = str(tmp_path / "flat")
    stats = compact_index(idx, dst)
    assert stats["files_out"] <= stats["files_in"]
    after = bm25_search_index(dst, queries, k=4)
    assert before.values.tolist() == after.values.tolist()
