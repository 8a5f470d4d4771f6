"""WARC source/sink (logray/sources/warc.py): round-trips, the
per-record-gzip-member convention, adversarial payloads, hand-written
fixture bytes, and loud failure on truncation."""

from __future__ import annotations

import datetime
import gzip

import pyarrow as pa
import pytest


def _docs_ds(payloads, urls=None):
    import ray.data as rd

    n = len(payloads)
    urls = urls or [f"https://ex.com/{i}" for i in range(n)]
    return rd.from_arrow(pa.table({
        "url": pa.array(urls, pa.string()),
        "ts": pa.array([datetime.datetime(2026, 8, 19, 1, 2, i % 60)
                        for i in range(n)], pa.timestamp("us")),
        "mime": pa.array(["text/html"] * n, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
    }))


@pytest.mark.parametrize("compress", [True, False])
def test_warc_roundtrip(ray_session, tmp_path, compress):
    from logray.sources.warc import read_warc, write_warc

    payloads = [
        b"<html>hi</html>",
        b"",                                   # empty body
        b"bytes\r\n\r\nWARC/1.0\r\nfake",      # separator + header INSIDE body
        bytes(range(256)),                     # full byte range
    ]
    stats = write_warc(_docs_ds(payloads), str(tmp_path / "w"),
                       compress=compress)
    assert stats["records"] == 4
    back = read_warc(str(tmp_path / "w")).to_pandas()
    back = back.sort_values("url").reset_index(drop=True)
    assert len(back) == 4
    got = {u: bytes(p) for u, p in zip(back["url"], back["payload"])}
    for i, p in enumerate(payloads):
        assert got[f"https://ex.com/{i}"] == p
    assert (back["mime"] == "text/html").all()
    assert (back["warc_type"] == "response").all()
    assert back["ts"].iloc[0] == datetime.datetime(2026, 8, 19, 1, 2, 0)


def test_warc_gzip_members_are_standard(ray_session, tmp_path):
    """compress=True writes per-record gzip MEMBERS: stdlib gzip must
    decompress the file, and the stream must contain one member per
    record (CommonCrawl splittability convention)."""
    import glob

    from logray.sources.warc import write_warc

    write_warc(_docs_ds([b"a", b"b", b"c"]), str(tmp_path / "w"))
    [fn] = glob.glob(str(tmp_path / "w" / "*.warc.gz"))
    raw = open(fn, "rb").read()
    assert raw.count(b"\x1f\x8b\x08") >= 3  # one member header per record
    blob = gzip.decompress(raw)
    assert blob.count(b"WARC/1.0\r\n") == 3


def test_warc_reads_foreign_fixture(ray_session, tmp_path):
    """A hand-written (non-logray) WARC parses: proves the reader
    follows the spec, not just our own sink."""
    from logray.sources.warc import read_warc

    rec = (b"WARC/1.0\r\n"
           b"WARC-Type: request\r\n"
           b"WARC-Record-ID: <urn:uuid:x>\r\n"
           b"WARC-Date: 2020-01-02T03:04:05Z\r\n"
           b"WARC-Target-URI: https://foreign.example/\r\n"
           b"Content-Type: application/http\r\n"
           b"Content-Length: 5\r\n"
           b"\r\n"
           b"hello\r\n\r\n")
    (tmp_path / "f.warc").write_bytes(rec * 2)
    got = read_warc(str(tmp_path / "f.warc")).to_pandas()
    assert len(got) == 2
    assert got["warc_type"].tolist() == ["request", "request"]
    assert bytes(got["payload"][0]) == b"hello"
    assert got["rec_idx"].tolist() == [0, 1]
    assert got["ts"][0] == datetime.datetime(2020, 1, 2, 3, 4, 5)


def test_warc_truncated_header_raises(ray_session, tmp_path):
    from logray.sources.warc import read_warc

    (tmp_path / "bad.warc").write_bytes(b"WARC/1.0\r\nWARC-Type: resp")
    with pytest.raises(Exception, match="truncated WARC header"):
        read_warc(str(tmp_path / "bad.warc")).take_all()


def test_warc_rerun_writes_identical_files(ray_session, tmp_path):
    """The sink is deterministic: same input -> byte-identical part
    files (the resumability contract)."""
    import glob

    from logray.sources.warc import write_warc

    for d in ("w1", "w2"):
        write_warc(_docs_ds([b"x", b"y"]), str(tmp_path / d))
    [f1] = glob.glob(str(tmp_path / "w1" / "*"))
    [f2] = glob.glob(str(tmp_path / "w2" / "*"))
    assert open(f1, "rb").read() == open(f2, "rb").read()


def test_warc_cdx_point_lookup(ray_session, tmp_path):
    """cdx=True writes the (url -> file/offset/length) sidecar; a
    byte-range fetch returns exactly one record without scanning."""
    from logray.sources.warc import (fetch_warc_record, read_warc_cdx,
                                     write_warc)

    payloads = [f"body {i}".encode() for i in range(10)]
    write_warc(_docs_ds(payloads), str(tmp_path / "w"), cdx=True)
    idx = read_warc_cdx(str(tmp_path / "w")).to_pandas()
    assert len(idx) == 10
    assert set(idx.columns) == {"url", "mime", "warc_file", "offset",
                                "length"}
    row = idx[idx["url"] == "https://ex.com/7"].iloc[0]
    rec = fetch_warc_record(row["warc_file"], int(row["offset"]),
                            int(row["length"]))
    assert rec["url"] == "https://ex.com/7"
    assert bytes(rec["payload"]) == b"body 7"
    assert rec["mime"] == "text/html"
    # every entry fetches its own payload (full index validity)
    for _, r in idx.iterrows():
        got = fetch_warc_record(r["warc_file"], int(r["offset"]),
                                int(r["length"]))
        i = int(r["url"].rsplit("/", 1)[1])
        assert bytes(got["payload"]) == payloads[i]


def test_warc_cdx_uncompressed(ray_session, tmp_path):
    from logray.sources.warc import fetch_warc_record, read_warc_cdx, write_warc

    write_warc(_docs_ds([b"aa", b"bb"]), str(tmp_path / "w"),
               compress=False, cdx=True)
    idx = read_warc_cdx(str(tmp_path / "w")).to_pandas()
    r = idx[idx["url"] == "https://ex.com/1"].iloc[0]
    rec = fetch_warc_record(r["warc_file"], int(r["offset"]),
                            int(r["length"]))
    assert bytes(rec["payload"]) == b"bb"


def test_warc_same_urls_different_payloads_no_collision(ray_session,
                                                        tmp_path):
    """Two blocks with IDENTICAL url sequences but different payloads
    (two crawl snapshots of the same pages) must write two distinct
    part files — the part name hashes the serialized CONTENT, not the
    urls."""
    import ray.data as rd

    from logray.sources.warc import read_warc, write_warc

    t1 = pa.table({"url": ["https://x/1", "https://x/2"],
                   "payload": pa.array([b"v1a", b"v1b"], pa.binary())})
    t2 = pa.table({"url": ["https://x/1", "https://x/2"],
                   "payload": pa.array([b"v2a", b"v2b"], pa.binary())})
    stats = write_warc(rd.from_arrow([t1, t2]), str(tmp_path / "w"))
    assert stats["files"] == 2 and stats["records"] == 4
    back = read_warc(str(tmp_path / "w")).to_pandas()
    assert sorted(bytes(p) for p in back["payload"]) == \
        [b"v1a", b"v1b", b"v2a", b"v2b"]


def test_warc_fractional_second_date(ray_session, tmp_path):
    from logray.sources.warc import read_warc

    (tmp_path / "f.warc").write_bytes(
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <i>\r\n"
        b"WARC-Date: 2020-01-02T03:04:05.123456Z\r\n"
        b"WARC-Target-URI: https://f/\r\nContent-Type: t\r\n"
        b"Content-Length: 2\r\n\r\nok\r\n\r\n")
    got = read_warc(str(tmp_path / "f.warc")).to_pandas()
    assert got["ts"][0] == datetime.datetime(2020, 1, 2, 3, 4, 5)


def test_read_warc_skips_cdx_sidecar(ray_session, tmp_path):
    """read_warc on a cdx=True archive directory must skip the parquet
    sidecars (regression: they were parsed as WARC and raised)."""
    from logray.sources.warc import read_warc, write_warc

    write_warc(_docs_ds([b"a", b"b"]), str(tmp_path / "w"), cdx=True)
    got = read_warc(str(tmp_path / "w")).to_pandas()
    assert len(got) == 2


def test_read_warc_select_point_reads(ray_session, tmp_path):
    """CDX-driven selective read: only the requested urls come back,
    payloads exact, and it works for both compressions."""
    from logray.sources.warc import read_warc_select, write_warc

    payloads = [f"payload {i}".encode() for i in range(30)]
    write_warc(_docs_ds(payloads), str(tmp_path / "w"), cdx=True)
    want = ["https://ex.com/3", "https://ex.com/17", "https://ex.com/29"]
    got = read_warc_select(str(tmp_path / "w"), urls=want).to_pandas()
    assert sorted(got["url"]) == sorted(want)
    for _, r in got.iterrows():
        i = int(r["url"].rsplit("/", 1)[1])
        assert bytes(r["payload"]) == payloads[i]
    # urls=None -> everything
    allr = read_warc_select(str(tmp_path / "w")).to_pandas()
    assert len(allr) == 30


def test_read_warc_select_nulls_rec_idx(ray_session, tmp_path):
    """Selective fetch cannot know the file-scoped positional index —
    it must be null, not a misleading 0 (same contract as
    fetch_warc_record)."""
    from logray.sources.warc import read_warc_select, write_warc

    write_warc(_docs_ds([b"a", b"b", b"c"]), str(tmp_path / "w"),
               cdx=True)
    got = read_warc_select(str(tmp_path / "w")).to_pandas()
    assert got["rec_idx"].isna().all()


def test_warc_duplicate_blocks_take_occurrence_slots(ray_session,
                                                     tmp_path):
    """Two DISTINCT input blocks holding byte-identical records must
    both land on disk (occurrence slots), not silently overwrite each
    other — the stats and the archive agree."""
    import ray.data as rd

    from logray.sources.warc import read_warc, write_warc

    t = pa.table({
        "url": pa.array(["https://ex.com/dup"], pa.string()),
        "ts": pa.array([datetime.datetime(2026, 8, 19)],
                       pa.timestamp("us")),
        "mime": pa.array(["text/html"], pa.string()),
        "payload": pa.array([b"same"], pa.binary()),
    })
    ds = rd.from_arrow([t, t, t])  # three identical blocks
    stats = write_warc(ds, str(tmp_path / "dup"))
    assert stats["records"] == 3 and stats["files"] == 3
    back = read_warc(str(tmp_path / "dup")).take_all()
    assert len(back) == 3
    assert all(r["payload"] == b"same" for r in back)


def test_warc_truncated_record_raises(ray_session, tmp_path):
    """A Content-Length that promises more bytes than the file holds is
    a hard error, not a silently shortened payload."""
    from logray.sources.warc import read_warc

    good = (b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Record-ID: <urn:x:1>\r\n"
            b"WARC-Target-URI: https://ex.com/\r\n"
            b"WARC-Date: 2026-08-19T00:00:00Z\r\n"
            b"Content-Type: text/html\r\n"
            b"Content-Length: 100\r\n\r\n" + b"only-ten\r\n\r\n")
    (tmp_path / "trunc.warc").write_bytes(good)
    with pytest.raises(Exception, match="truncated WARC record"):
        read_warc(str(tmp_path / "trunc.warc")).take_all()


def test_read_warc_skips_stray_gz(ray_session, tmp_path):
    """Under the default extension filter a non-WARC gzip in the
    archive directory is skipped like the cdx/ sidecars, not parsed."""
    from logray.sources.warc import read_warc, write_warc

    write_warc(_docs_ds([b"x", b"y"]), str(tmp_path / "arch"))
    (tmp_path / "arch" / "logs.csv.gz").write_bytes(
        gzip.compress(b"a,b\n1,2\n"))
    rows = read_warc(str(tmp_path / "arch")).take_all()
    assert sorted(r["payload"] for r in rows) == [b"x", b"y"]
