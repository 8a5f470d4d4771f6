"""Tests for PII redaction (functions/pii.py) and Gopher quality metrics
(functions/quality.py)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


ADVERSARIAL_DOCS = [
    # repeated lines + bullets + ellipsis
    "intro line\n- bullet one\n- bullet one\n- bullet two\nmore text...\nintro line",
    # single line, clean prose
    "the quick brown fox jumps over the lazy dog near the river bank today",
    # symbol heavy
    "### section ### more #tags and ... ellipsis ... inline …",
    # numeric words (low alpha fraction)
    "123 456 789 000 111 alpha 222 333",
    # empty text
    "",
    # whitespace only
    "   \n \t ",
]


def test_pii_redaction_matches_duckdb_bit_for_bit():
    from logray.functions.pii import redact_pii_array, redact_pii_sql

    samples = [
        "mail john.doe+x@ex-ample.co.uk now",
        "ssn 123-45-6789 card 4111111111111111",
        "host 192.168.0.1 and 255.255.255.255.",
        "call +1 (415) 555-0199 or 0171-222 3344",
        "clean text, nothing to scrub 3.14",
        "",
    ]
    got = redact_pii_array(pa.array(samples)).to_pylist()
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": samples}))
    want = con.sql(f"SELECT {redact_pii_sql('x')} AS r FROM t").df()["r"].tolist()
    assert got == want
    assert got[0] == "mail <EMAIL> now"
    assert got[1] == "ssn <SSN> card <CC>"
    assert "<IP>" in got[2] and "192" not in got[2]


def test_pii_count_columns():
    from logray.functions.pii import count_pii_table

    t = pa.table({"text": ["a@b.co and c@d.io", "ip 1.2.3.4", "none"]})
    out = count_pii_table(t)
    assert out["n_email"].to_pylist() == [2, 0, 0]
    assert out["n_ipv4"].to_pylist() == [0, 1, 0]


def test_pii_redact_dataset_stage(ray_session):
    import ray.data as rd

    from logray.functions.pii import redact_pii

    ds = rd.from_items([{"text": "reach me: a@b.co / 10.0.0.1"}] * 10)
    out = redact_pii(ds).to_pandas()
    assert (out["text"] == "reach me: <EMAIL> / <IP>").all()


def test_gopher_quality_matches_duckdb_adversarial(ray_session):
    import ray.data as rd

    from logray.functions.quality import gopher_quality, gopher_quality_sql

    df = pd.DataFrame({
        "doc_id": np.arange(len(ADVERSARIAL_DOCS), dtype=np.int64),
        "text": ADVERSARIAL_DOCS,
    })
    got = (
        gopher_quality(rd.from_pandas(df).repartition(3))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs", df)
    want = con.sql(
        gopher_quality_sql("docs") + " ORDER BY doc_id"
    ).df().reset_index(drop=True)
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_gopher_metrics_values(ray_session):
    import ray.data as rd

    from logray.functions.quality import gopher_quality

    df = pd.DataFrame({"doc_id": [0], "text": [ADVERSARIAL_DOCS[0]]})
    m = gopher_quality(rd.from_pandas(df)).to_pandas().iloc[0]
    # 6 lines, 'intro line' x2 and '- bullet one' x2 -> 2 repeat lines
    assert m["n_lines"] == 6
    assert m["dup_line_frac"] == pytest.approx(2 / 6)
    assert m["bullet_line_frac"] == pytest.approx(3 / 6)
    assert m["ellipsis_line_frac"] == pytest.approx(1 / 6)
    assert not m["gopher_pass"]  # too few words


def test_top_ngram_char_fraction_naive(ray_session):
    import ray.data as rd

    from logray.functions.quality import top_ngram_char_fraction

    docs = [
        "a b a b a b c",          # top 2-gram 'a b' x3 (chars 2 per occ + nothing)
        "x y z w",                # all 2-grams unique
        "solo",                   # fewer than 2 words
    ]
    df = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64), "text": docs})
    out = (
        top_ngram_char_fraction(rd.from_pandas(df), n=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )

    def naive(text, n=2):
        words = [w for w in text.split() if w]
        total = sum(len(w) for w in words)
        if len(words) < n or total == 0:
            return 0.0
        from collections import Counter
        grams = [tuple(words[i:i + n]) for i in range(len(words) - n + 1)]
        cnt = Counter(grams)
        best = max(cnt.items(), key=lambda kv: (kv[1], sum(map(len, kv[0]))))
        return best[1] * sum(map(len, best[0])) / total

    for i, text in enumerate(docs):
        assert out["top_2gram_char_frac"].iloc[i] == pytest.approx(naive(text)), i


def test_top_ngram_no_cross_document_grams(ray_session):
    import ray.data as rd

    from logray.functions.quality import top_ngram_char_fraction

    # 'b a' spans the doc boundary if parents are ignored
    df = pd.DataFrame({"doc_id": [0, 1], "text": ["a b", "a b"]})
    out = top_ngram_char_fraction(rd.from_pandas(df), n=2).to_pandas()
    assert (out["top_2gram_char_frac"] == 1.0).all()


# ---------------------------------------------------------------------------
# decontamination (functions/decontam.py)
# ---------------------------------------------------------------------------


def test_decontaminate_flags_overlap_and_matches_duckdb(ray_session):
    import ray.data as rd

    from logray.functions.decontam import (
        build_contamination_index,
        decontaminate_sql,
        flag_contaminated,
    )

    evdf = pd.DataFrame({
        "doc_id": np.array([100, 101], dtype=np.int64),
        "text": [
            "the secret benchmark answer is forty two exactly",
            "unrelated evaluation prompt about data pipelines",
        ],
    })
    trdf = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [
            # contains a full 5-gram from eval doc 100 (case-insensitive)
            "we think The Secret Benchmark Answer Is something else",
            "completely novel content with no overlap at all here",
            "benchmark answer is forty", # only a 4-gram -> clean at n=5
            "data pipelines are fun",
        ],
    })
    idx = build_contamination_index(rd.from_pandas(evdf), n=5)
    got = (
        flag_contaminated(rd.from_pandas(trdf).repartition(2), idx, n=5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got["contaminated"].tolist() == [True, False, False, False]
    assert got["n_contaminated"].tolist()[0] == 1  # 'the secret benchmark answer is'

    con = duckdb.connect()
    con.register("tr", trdf)
    con.register("ev", evdf)
    want = con.sql(
        decontaminate_sql("tr", "ev", n=5) + " ORDER BY doc_id"
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "n_contaminated", "contaminated"]],
        want[["doc_id", "n_contaminated", "contaminated"]],
        check_dtype=False,
    )


def test_decontaminate_gram_windows_stay_in_document(ray_session):
    import ray.data as rd

    from logray.functions.decontam import build_contamination_index, flag_contaminated

    # eval gram "c d e f g" would only arise by concatenating the two
    # training docs; neither alone contains it
    ev = rd.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["c d e f g"]}))
    tr = rd.from_pandas(pd.DataFrame({
        "doc_id": np.array([1, 2], dtype=np.int64),
        "text": ["a b c d", "e f g h"],
    }))
    idx = build_contamination_index(ev, n=5)
    got = flag_contaminated(tr, idx, n=5).to_pandas()
    assert not got["contaminated"].any()


def test_decontaminate_empty_index(ray_session):
    import ray.data as rd

    from logray.functions.decontam import flag_contaminated

    tr = rd.from_pandas(pd.DataFrame({"doc_id": [0], "text": ["a b c"]}))
    got = flag_contaminated(tr, np.zeros(0, np.uint64), n=3).to_pandas()
    assert got["n_contaminated"].tolist() == [0]


def test_compression_ratio_matches_zlib(ray_session):
    import zlib

    import pandas as pd
    import ray.data as rd

    from logray.functions.quality import compression_ratio

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["spam " * 200,            # repetitive -> low ratio
                 "The quick brown fox jumps over the lazy dog.",
                 None,
                 ""],
    })
    got = (
        compression_ratio(rd.from_pandas(df).repartition(3))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    for i, s in enumerate(df["text"]):
        if s is None:
            assert pd.isna(got.loc[i, "zlib_ratio"])
            continue
        b = s.encode("utf-8")
        assert got.loc[i, "raw_bytes"] == len(b)
        assert got.loc[i, "zlib_bytes"] == len(zlib.compress(b, 6))
    assert got.loc[0, "zlib_ratio"] < 0.05      # boilerplate compresses
    assert got.loc[1, "zlib_ratio"] > 0.5       # prose does not
    assert pd.isna(got.loc[3, "zlib_ratio"])    # empty text -> NaN ratio


def test_top_ngram_char_fraction_sql_twin(ray_session):
    """The DuckDB twin matches the operator bit-for-bit, including the
    tie cases where the WINNING gram differs but the fraction cannot
    (equal count -> compared by mass; equal mass -> equal fraction),
    and for n=3."""
    import duckdb
    import ray.data as rd

    from logray.functions.quality import (top_ngram_char_fraction,
                                          top_ngram_char_fraction_sql)

    docs = [
        "a b a b a b c",
        "x y z w",
        "solo",
        "",                       # no words
        "aa bb cc aa bb cc dd",   # two tied grams, equal mass
        "ab cd ab cd xyz xyz xyz xyz",  # tie on count, mass differs
        "  spaced   out\ttokens \n newlines  ",
        None,
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64),
                       "text": docs})
    con = duckdb.connect()
    con.register("docs_t", df)
    for n in (2, 3):
        got = (
            top_ngram_char_fraction(rd.from_pandas(df), n=n)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        want = con.execute(
            top_ngram_char_fraction_sql("docs_t", n=n)
            + " ORDER BY doc_id").fetchdf()
        assert got["doc_id"].tolist() == want["doc_id"].tolist()
        assert (got[f"top_{n}gram_char_frac"].to_numpy()
                == want[f"top_{n}gram_char_frac"].to_numpy()).all(), n


def test_lang_quality_sql_twin_bit_exact(ray_session):
    """lang_quality_sql matches (lang_id, quality_score) bit-for-bit:
    RE2 counts agree across engines and the quality score is a fixed
    float64 expression tree — including argmax ties (earlier language
    wins) and zero-hit unknowns."""
    import duckdb
    import ray.data as rd

    from logray.functions.textstats import lang_quality_sql, text_stats

    docs = [
        "the cat and the dog is in that house with a hat",
        "der hund und die katze ist nicht mit",
        "le chat et la maison est dans les",
        "el perro de la casa que los",
        "的 是 了 在 我",
        "zzz qqq 12345 !!!",                # no stopword hits anywhere
        "the der le el",                    # 1 hit each: tie -> en
        "",
        "x" * 300,
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64),
                       "text": docs})
    got = (text_stats(rd.from_pandas(df))
           .select_columns(["doc_id", "lang_id", "quality_score"])
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("docs_t", df)
    want = con.execute(lang_quality_sql("docs_t")
                       + " ORDER BY doc_id").fetchdf()
    assert got["lang_id"].tolist() == want["lang_id"].tolist()
    assert (got["quality_score"].to_numpy()
            == want["quality_score"].to_numpy()).all()
    # note zh: RE2 \b is ASCII-only, so CJK stopwords never match word
    # boundaries — IDENTICALLY in both engines (the operator's own
    # documented heuristic limitation, not a twin divergence)
    assert got["lang_id"].tolist()[:7] == ["en", "de", "fr", "es",
                                           "unknown", "unknown", "en"]
