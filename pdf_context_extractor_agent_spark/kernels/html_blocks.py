"""HTML → DOM block kernel for generic-web main-content extraction.

Unlike the page-layout kernel (html_layout.py), which targets the
corpus's known page structure with a fixed tag/class skip list, this
kernel makes NO assumptions about which markup is boilerplate: it
emits every text block with the features the density classifier
(functions/webtext.py) needs — character count, word count, and the
number of characters inside anchor tags. Only true non-content
containers (script/style/head/noscript/iframe/template) are skipped,
because their text is code, not renderable content.

Runs as ``mapInPandas`` over (url, html); reuses the fast regex event
tokenizer from html_layout with the stdlib html.parser as fallback.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .html_layout import _fast_feed, _norm

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("block_no", T.IntegerType(), False),
        T.StructField("tag", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("n_chars", T.IntegerType(), True),
        T.StructField("n_words", T.IntegerType(), True),
        T.StructField("n_link_chars", T.IntegerType(), True),
    ]
)

_RAW_SKIP = {"script", "style", "head", "noscript", "iframe", "template"}
_BLOCK_TAGS = {
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "blockquote", "pre",
    "div", "td", "th", "tr", "table", "ul", "ol", "section", "article",
    "nav", "footer", "header", "aside", "main", "figure", "figcaption",
}


class _BlockParser(HTMLParser):
    """Flush a block at every block-level boundary; count link chars."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, str, int]] = []
        self._buf: list[str] = []
        self._link_chars = 0
        self._a_depth = 0
        self._skip_depth = 0
        self._tag = "body"

    def _flush(self) -> None:
        text = _norm("".join(self._buf))
        if text:
            # link chars are counted pre-normalization per data event;
            # cap at the block length so density stays in [0, 1]
            self.blocks.append((self._tag, text, min(self._link_chars, len(text))))
        self._buf = []
        self._link_chars = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _RAW_SKIP:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._a_depth += 1
        elif tag in _BLOCK_TAGS:
            self._flush()
            self._tag = tag
        elif tag == "br":
            self._buf.append(" ")

    def handle_endtag(self, tag: str) -> None:
        if tag in _RAW_SKIP:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        elif tag in _BLOCK_TAGS:
            self._flush()
            self._tag = "body"

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        self._buf.append(data)
        if self._a_depth:
            self._link_chars += len(_norm(data))

    def result(self) -> list[tuple[str, str, int]]:
        self._flush()
        return self.blocks


def parse_blocks(html_bytes: bytes) -> list[tuple[str, str, int]]:
    """binary → [(tag, text, link_chars)] (pure; unit-testable off-Spark).

    PDF-format blobs (no DOM, no links) route through the layout kernel
    and emit one block per text line — main-content classification then
    degrades gracefully to line-length heuristics. Never raises: a
    malformed document degrades to zero blocks (the classifier then
    yields no content rows for the url — visible, not fatal, matching
    the layout kernel's poison-doc contract).
    """
    from .minipdf_layout import is_minipdf
    from .pdfish_layout import is_pdfish

    if is_pdfish(html_bytes) or is_minipdf(html_bytes):
        from .html_layout import parse_doc

        try:
            return [
                ("p", ln["text"] if isinstance(ln, dict) else ln[1], 0)
                for page in parse_doc(html_bytes)
                for ln in page["lines"]
            ]
        except Exception:
            return []
    text = html_bytes.decode("utf-8", errors="replace")
    parser = _BlockParser()
    try:
        _fast_feed(parser, text)
    except Exception:
        try:
            parser = _BlockParser()
            parser.feed(text)
        except Exception:
            return []
    return parser.result()


def html_blocks(pages_tbl: DataFrame) -> DataFrame:
    """(url, …, html, …) → one row per DOM block with density features.

    Only (url, html) ship into Python; everything else is pruned at the
    scan. Word count = whitespace-token count of the normalized text.
    """
    src = pages_tbl.select("url", "html")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for url, blob in zip(b["url"], b["html"]):
                for i, (tag, text, link_chars) in enumerate(parse_blocks(bytes(blob))):
                    rows.append(
                        (url, i, tag, text, len(text), len(text.split()), link_chars)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "block_no", "tag", "text",
                    "n_chars", "n_words", "n_link_chars",
                ],
            )

    return src.mapInPandas(kernel, schema=BLOCK_SCHEMA)
