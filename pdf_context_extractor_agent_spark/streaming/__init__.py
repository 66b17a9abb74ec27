"""Structured Streaming surface of the engine."""

from .pipeline import (  # noqa: F401
    stream_pages,
    streaming_exact_dedup,
    streaming_extract_statements,
    streaming_lang_counts,
    streaming_minhash_neardup,
    streaming_sessionize,
    streaming_wet,
    streaming_page_text,
    streaming_quality,
)
