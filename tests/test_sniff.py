"""Magic-byte content-type sniffing (crawl-record dispatch)."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from pdf_context_extractor_agent_spark.sources.pages import sniff_content_type


def _sniff(spark, payloads: list[bytes | None]) -> list[str]:
    df = spark.createDataFrame([(p,) for p in payloads], "payload binary")
    return [
        r["ct"]
        for r in df.select(sniff_content_type(F.col("payload")).alias("ct")).collect()
    ]


def test_sniff_magic_bytes(spark):
    real_gzip = gzip.compress(b"hello")  # a REAL gzip stream, not a fixture
    got = _sniff(
        spark,
        [
            b"%PDF-1.4\n%\xe2\xe3\xcf\xd3",
            real_gzip,
            b"PK\x03\x04rest-of-zip",
            b"WARC/1.0\r\nWARC-Type: response\r\n",
        ],
    )
    assert got == [
        "application/pdf",
        "application/gzip",
        "application/zip",
        "application/warc",
    ]


def test_sniff_html_markers_case_and_whitespace(spark):
    got = _sniff(
        spark,
        [
            b"<!DOCTYPE html><html></html>",
            b"\n\t  <HTML lang='en'>",
            b"\xef\xbb\xbf<html>bom then html</html>",
            b"<head><title>t</title></head>",
            b"<body>direct body</body>",
        ],
    )
    assert got == ["text/html"] * 5


def test_sniff_xml_json_plain_empty(spark):
    got = _sniff(
        spark,
        [
            b'<?xml version="1.0"?><urlset/>',
            b'  {"k": 1}',
            b"[1, 2, 3]",
            b"Just ordinary prose with <html> buried later " + b"x" * 2048
            + b"<html>",
            b"",
            None,
        ],
    )
    assert got == [
        "application/xml",
        "application/json",
        "application/json",
        "text/plain",
        "application/octet-stream",
        "application/octet-stream",
    ]


def test_sniff_never_throws_on_arbitrary_bytes(spark):
    # worst case: invalid-UTF8 garbage, lone continuation bytes, huge doc
    payloads = [bytes(range(256)), b"\xff\xfe\x00\x01", b"\x80\x80\x80"]
    got = _sniff(spark, payloads)
    assert all(isinstance(x, str) for x in got)


def test_sniff_is_pure_projection(spark):
    """No shuffle, no UDF: the sniff must ride the scan."""
    df = spark.createDataFrame([(b"<html>",)], "payload binary")
    plan = (
        df.select(sniff_content_type(F.col("payload")).alias("ct"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
