"""WARC ingestion source — Common-Crawl-style archives → pages table."""

from __future__ import annotations

import datetime as dt

from pdf_context_extractor_agent_spark.corpus import make_doc
from pdf_context_extractor_agent_spark.kernels import extract_pages
from pdf_context_extractor_agent_spark.sources.warc import (
    build_warc_bytes,
    iter_warc_records,
    read_warc,
    warc_to_pages,
)

TS = "2017-03-22T17:00:23Z"


def _records():
    return [
        ("http://example.com/a", TS, b"<html><body>alpha</body></html>"),
        ("http://example.com/b", TS, b"<html><body>beta</body></html>"),
    ]


def test_iter_warc_records_plain():
    data = build_warc_bytes(_records())
    got = list(iter_warc_records(data))
    assert [(u, b) for u, _, b in got] == [(u, b) for u, _, b in _records()]
    assert got[0][1] == dt.datetime(2017, 3, 22, 17, 0, 23)


def test_iter_warc_skips_non_page_records():
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: http://x/\r\n"
        b"WARC-Date: " + TS.encode() + b"\r\nContent-Length: 4\r\n\r\nGET \r\n\r\n"
    )
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n"
    )
    data = info + req + build_warc_bytes(_records()[:1])
    got = list(iter_warc_records(data))
    assert len(got) == 1 and got[0][0] == "http://example.com/a"


def test_iter_warc_truncated_tail_stops_cleanly():
    data = build_warc_bytes(_records())
    assert len(list(iter_warc_records(data[: len(data) - 20]))) == 1


def test_resource_records_body_is_block():
    data = build_warc_bytes(_records()[:1], with_http_headers=False)
    (url, _, body), = iter_warc_records(data)
    assert body == _records()[0][2]


def test_read_warc_gzip_members_roundtrip(spark, tmp_path):
    plain = tmp_path / "a.warc"
    gz = tmp_path / "b.warc.gz"
    plain.write_bytes(build_warc_bytes(_records()[:1]))
    gz.write_bytes(build_warc_bytes(_records()[1:], member_gzip=True))
    df = read_warc(spark, str(tmp_path) + "/*")
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {"http://example.com/a", "http://example.com/b"}
    assert bytes(rows["http://example.com/a"]["html"]) == _records()[0][2]
    assert bytes(rows["http://example.com/b"]["html"]) == _records()[1][2]
    assert rows["http://example.com/a"]["warc_ts"] is not None
    assert rows["http://example.com/b"]["warc_file"].endswith("b.warc.gz")


def test_warc_ingest_feeds_extraction_kernel(spark, tmp_path):
    """End-to-end: corpus doc → WARC archive → read_warc →
    warc_to_pages → layout kernel, byte-identical to the direct path."""
    url, ts, html, text, lang = make_doc(0)
    iso = "2020-01-02T03:04:05Z"
    (tmp_path / "c.warc.gz").write_bytes(
        build_warc_bytes([(url, iso, html)], member_gzip=True)
    )
    pages = warc_to_pages(read_warc(spark, str(tmp_path / "c.warc.gz")))
    via_warc = (
        extract_pages(pages).orderBy("page").select("page", "page_text").collect()
    )
    direct = (
        extract_pages(
            spark.createDataFrame(
                [(url, ts, html, text, lang)],
                "url string, warc_ts timestamp, html binary, text string, lang string",
            )
        )
        .orderBy("page")
        .select("page", "page_text")
        .collect()
    )
    assert [tuple(r) for r in via_warc] == [tuple(r) for r in direct]


def test_warc_fuzz_roundtrip_and_garbage_tolerance():
    """Property: build_warc_bytes(records) → iter_warc_records recovers
    exactly the response/resource records, for arbitrary binary bodies
    (including bodies that embed WARC/CRLF markers); garbage prefixes
    between records are skipped."""
    import random

    rng = random.Random(99)
    for trial in range(50):
        n = rng.randrange(1, 6)
        recs = []
        for i in range(n):
            body = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 400)))
            if rng.random() < 0.3:
                body += b"\r\n\r\nWARC/1.0\r\n"  # adversarial: marker inside body
            recs.append((f"http://f{trial}.test/{i}", TS, body))
        http = rng.random() < 0.5
        data = build_warc_bytes(recs, member_gzip=False, with_http_headers=http)
        got = list(iter_warc_records(data))
        assert [(u, b) for u, _, b in got] == [(u, b) for u, _, b in recs]


# --------------------------------------------------------------------------
# WET conversion sink
# --------------------------------------------------------------------------

def test_wet_records_roundtrip_through_parser(spark):
    """A WET record IS a WARC conversion record: build records from a
    pages frame, concatenate, and re-parse with iter_warc_records —
    url, timestamp, and byte-exact body must all survive."""
    from pdf_context_extractor_agent_spark.sources.warc import wet_records

    pages = spark.createDataFrame(
        [
            ("http://e.com/a", dt.datetime(2024, 1, 2, 3, 4, 5), "héllo wörld"),
            ("http://e.com/b", dt.datetime(2024, 6, 7, 8, 9, 10), ""),
        ],
        "url string, warc_ts timestamp, text string",
    )
    recs = {r["url"]: r["wet_record"] for r in wet_records(pages).collect()}
    blob = "".join(recs[u] for u in sorted(recs)).encode("utf-8")
    got = list(iter_warc_records(blob))
    assert [(u, ts, b.decode("utf-8")) for u, ts, b in got] == [
        ("http://e.com/a", dt.datetime(2024, 1, 2, 3, 4, 5), "héllo wörld"),
        ("http://e.com/b", dt.datetime(2024, 6, 7, 8, 9, 10), ""),
    ]


def test_wet_content_length_is_bytes_not_chars(spark):
    from pdf_context_extractor_agent_spark.sources.warc import wet_records

    pages = spark.createDataFrame(
        [("http://e.com/x", dt.datetime(2024, 1, 1), "é")],
        "url string, warc_ts timestamp, text string",
    )
    rec = wet_records(pages).collect()[0]["wet_record"]
    assert "Content-Length: 2" in rec  # 'é' is 2 UTF-8 bytes, 1 char


def test_write_wet_files_reparse(spark, tmp_path):
    from pdf_context_extractor_agent_spark.sources.warc import read_warc, write_wet

    pages = spark.createDataFrame(
        [(f"http://e.com/{i}", dt.datetime(2024, 1, 1, i), f"body {i}")
         for i in range(8)],
        "url string, warc_ts timestamp, text string",
    )
    out = str(tmp_path / "wet")
    write_wet(pages.repartition(3), out)
    back = read_warc(spark, out + "/part-*")
    got = sorted((r["url"], bytes(r["html"]).decode()) for r in back.collect())
    assert got == [(f"http://e.com/{i}", f"body {i}") for i in range(8)]


def test_write_wet_gzip_roundtrip(spark, tmp_path):
    from pdf_context_extractor_agent_spark.sources.warc import read_warc, write_wet

    pages = spark.createDataFrame(
        [(f"http://e.com/{i}", dt.datetime(2024, 2, 1, i), f"gz body {i}")
         for i in range(5)],
        "url string, warc_ts timestamp, text string",
    )
    out = str(tmp_path / "wetgz")
    write_wet(pages.repartition(2), out, compress=True)
    import glob

    files = glob.glob(out + "/part-*")
    assert files and all(f.endswith(".gz") for f in files)
    back = read_warc(spark, out + "/part-*")
    got = sorted((r["url"], bytes(r["html"]).decode()) for r in back.collect())
    assert got == [(f"http://e.com/{i}", f"gz body {i}") for i in range(5)]
