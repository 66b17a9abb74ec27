"""WARC ingestion: Common-Crawl archive files → the (url, warc_ts,
html) pages table.

The north-rule input is an Iceberg table of Common-Crawl-style pages;
this source is the ingest step that BUILDS that table from the crawl's
native container. Scale model (how Common Crawl is actually processed):

* One WARC file ≈ 1 GB, ~100 k per crawl — the unit of parallelism is
  the FILE. ``binaryFile`` never splits a file, so each task owns whole
  archives and the record parser runs as a narrow ``mapInPandas`` —
  Arrow-batched, zero shuffle, no per-row Python round-trips.
* Records in Common Crawl WARCs are independent gzip MEMBERS
  concatenated into one file; ``zlib.decompressobj`` is looped over
  ``unused_data`` so both member-gzipped and plain archives decode.
* Output rows carry (url, warc_ts, html, warc_file); ``warc_to_pages``
  conforms them to the pages-table schema for the extraction pipeline
  (text/lang null until extraction fills them).

Format notes (ISO 28500): records are ``WARC/1.0`` header blocks
terminated by CRLFCRLF with a ``Content-Length``-delimited body, then a
CRLFCRLF separator. ``response`` records wrap an HTTP response — the
page body starts after the HTTP header block; ``resource`` records
carry the body directly. Chunked transfer-encoding is not reassembled
(Common Crawl stores identity bodies).
"""

from __future__ import annotations

import gzip
import io
import zlib
from datetime import datetime, timezone
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = "url string, warc_ts timestamp, html binary, warc_file string"

_CRLF2 = b"\r\n\r\n"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the Common Crawl
    layout: one member per record)."""
    out = []
    while data:
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(data))
        out.append(d.flush())
        if not d.eof:  # truncated trailing member — keep what decoded
            break
        data = d.unused_data
    return b"".join(out)


def _parse_warc_ts(value: str) -> datetime | None:
    try:
        dt = datetime.strptime(value.strip(), "%Y-%m-%dT%H:%M:%SZ")
        return dt.replace(tzinfo=timezone.utc).astimezone(timezone.utc).replace(tzinfo=None)
    except ValueError:
        return None


def iter_warc_records(data: bytes) -> Iterator[tuple[str, datetime | None, bytes]]:
    """Yield (target_uri, warc_date, page_body) for every response /
    resource / conversion record (the last makes WET derived-text
    archives ingestible too). Malformed tails stop the scan instead of
    raising —
    a poison archive must never kill the task (same contract as the
    layout kernel's poison-doc guard)."""
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        hdr_end = data.find(_CRLF2, start)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for line in data[start:hdr_end].split(b"\r\n")[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                    "latin-1", "replace"
                )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            return
        block_start = hdr_end + len(_CRLF2)
        block_end = block_start + clen
        if block_end > n:
            return  # truncated record
        rtype = headers.get("warc-type", "").lower()
        if rtype in ("response", "resource", "conversion"):
            block = data[block_start:block_end]
            if rtype == "response" and "msgtype=response" in headers.get(
                "content-type", ""
            ):
                http_end = block.find(_CRLF2)
                body = block[http_end + len(_CRLF2):] if http_end >= 0 else block
            else:
                body = block
            url = headers.get("warc-target-uri", "")
            if url:
                yield url, _parse_warc_ts(headers.get("warc-date", "")), body
        pos = block_end


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """WARC archive files (plain or gzip-member) → (url, warc_ts, html,
    warc_file) rows. File-per-task parallelism; the parser is a narrow
    Arrow-batched map."""
    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if data[:2] == b"\x1f\x8b":
                    data = _gunzip_members(data)
                for url, ts, body in iter_warc_records(data):
                    rows.append((url, ts, body, path))
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "warc_file"])

    return files.mapInPandas(gen, WARC_SCHEMA)


def warc_to_pages(warc_df: DataFrame) -> DataFrame:
    """Conform WARC rows to the pages-table schema (url, warc_ts, html,
    text, lang) — the extraction pipeline's input contract."""
    return warc_df.select(
        "url",
        "warc_ts",
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


_CRLF = "\r\n"


def wet_records(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """Extracted text → WET ``conversion`` records (the Common Crawl
    derived-text format, ISO 28500): the natural SINK of this pipeline,
    since a WET file *is* "the extracted text of every page of a WARC".
    Each record is a WARC/1.0 header block (Type: conversion,
    Target-URI, Date, Content-Type: text/plain, Content-Length in
    BYTES of the UTF-8 body — ``octet_length``, not ``length``: a char
    count would corrupt the length-delimited framing on any non-ASCII
    body) + CRLFCRLF + body + CRLFCRLF.

    Pure string projection — no UDF, no shuffle; returns (url,
    wet_record). ``write_wet`` streams the records file-per-partition,
    so a 1000-executor run emits WET shards exactly as Common Crawl
    does (one file per input partition, records concatenated)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    date = F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    record = F.concat(
        F.lit("WARC/1.0" + _CRLF + "WARC-Type: conversion" + _CRLF
              + "WARC-Target-URI: "),
        F.col(url_col),
        F.lit(_CRLF + "WARC-Date: "),
        date,
        F.lit(_CRLF + "Content-Type: text/plain" + _CRLF + "Content-Length: "),
        F.octet_length(text).cast("string"),
        F.lit(_CRLF + _CRLF),
        text,
        F.lit(_CRLF + _CRLF),
    )
    return pages.select(F.col(url_col).alias("url"), record.alias("wet_record"))


def write_wet(
    pages: DataFrame, path: str, compress: bool = False, **cols: str
) -> None:
    """Write WET shards: one text file per partition, records
    concatenated in partition order (the text sink appends one ``\\n``
    per row after the record's own trailing CRLFCRLF separator, which
    the record parser skips as inter-record slack). ``compress=True``
    writes gzip files — one member per shard, which
    :func:`read_warc`'s member-looping gunzip reads back directly
    (Common Crawl distributes WET as ``.warc.wet.gz``)."""
    w = wet_records(pages, **cols).select("wet_record").write.mode("overwrite")
    if compress:
        w = w.option("compression", "gzip")
    w.text(path)


# --------------------------------------------------------------------------
# fixture builder (also the smallest possible WARC sink, used by tests)
# --------------------------------------------------------------------------

def build_warc_bytes(
    records: list[tuple[str, str, bytes]],
    member_gzip: bool = False,
    with_http_headers: bool = True,
) -> bytes:
    """Serialize (url, iso_ts, body) triples as a WARC file, optionally
    as concatenated per-record gzip members (the Common Crawl layout)."""
    out = []
    for url, ts, body in records:
        if with_http_headers:
            http = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                b"Content-Length: " + str(len(body)).encode() + _CRLF2
            )
            block = http + body
            ctype = "application/http; msgtype=response"
            rtype = "response"
        else:
            block = body
            ctype = "text/html"
            rtype = "resource"
        rec = (
            f"WARC/1.0\r\nWARC-Type: {rtype}\r\nWARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts}\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(block)}\r\n\r\n"
        ).encode() + block + _CRLF2
        if member_gzip:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(rec)
            rec = buf.getvalue()
        out.append(rec)
    return b"".join(out)
