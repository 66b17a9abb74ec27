"""Structured Streaming pipelines over the pages table.

The reference is batch-only (streaming listed as "planned",
docs/ARCHITECTURE.md:498-511); the crawl-ingest shape of the north rule
makes these first-class here:

* stateless extraction (the layout kernel is a pure map → runs
  unchanged on a stream, micro-batch or continuous);
* watermarked windowed aggregation for ingest monitoring with late
  data;
* a custom stateful operator (``applyInPandasWithState``): cross-batch
  exact dedup — first occurrence of a content hash passes, later
  arrivals are dropped, state carries the winner url per hash.

All sinks are append-compatible; checkpointing uses the standard
streaming checkpoint dir (exactly-once with a replayable source).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..corpus import PAGES_SCHEMA
from ..functions.quality import quality_features
from ..kernels import extract_pages


def stream_pages(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of the pages table (schema pinned — streaming
    sources never infer). In production this is the Iceberg/Kafka
    ingest of crawl batches."""
    return spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)


def streaming_page_text(pages_stream: DataFrame) -> DataFrame:
    """Layout kernel on a stream: identical code path as batch —
    mapInPandas is stateless, so the plan is streaming-safe as-is."""
    return extract_pages(pages_stream)


def streaming_quality(pages_stream: DataFrame) -> DataFrame:
    """Stateless per-doc text-quality scoring on the ingest stream."""
    return quality_features(pages_stream.select("url", "warc_ts", "text")).drop("text")


def streaming_lang_counts(
    pages_stream: DataFrame, window: str = "10 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Watermarked windowed ingest monitoring: docs + bytes per lang per
    event-time window; late rows beyond the watermark are dropped."""
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), "lang")
        .agg(F.count("*").alias("n_docs"), F.sum(F.length("html")).alias("n_bytes"))
    )


_DEDUP_OUT = T.StructType(
    [
        T.StructField("content_hash", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("is_first", T.BooleanType()),
    ]
)
_DEDUP_STATE = T.StructType([T.StructField("first_url", T.StringType())])


def _dedup_fn(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (content_hash,) = key
    first_url = state.get[0] if state.exists else None
    out = []
    for pdf in pdfs:
        for url in sorted(pdf["url"]):
            if first_url is None:
                first_url = url
                out.append((content_hash, url, True))
            else:
                out.append((content_hash, url, False))
    state.update((first_url,))
    yield pd.DataFrame(out, columns=["content_hash", "url", "is_first"])


def streaming_extract_statements(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    statements: tuple[str, ...] = ("balance_sheet", "income_statement", "cash_flow"),
):
    """Full statement extraction on the ingest stream via foreachBatch.

    The extraction plan is window- and join-heavy (cross-page merge,
    structure anchors, first-occurrence dedup), which Structured
    Streaming cannot compose incrementally — so each micro-batch runs
    the IDENTICAL batch plan and appends, the standard pattern for
    complex batch logic on streams. Per-document extraction is
    batch-local by construction (no cross-document state), so
    micro-batch boundaries cannot change results. Exactly-once comes
    from the streaming checkpoint: a replayed batch id rewrites the
    same rows (tagged ``batch_id``), and downstream readers dedup on
    (url, statement_type, row_order) if a retry raced a crash.

    Returns the started StreamingQuery (caller awaits/stops)."""
    from ..plans import parse_statements

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        parsed = parse_statements(extract_pages(batch_df), spark, statements)["parsed"]
        parsed.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            output_dir
        )

    return (
        stream_pages(spark, input_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_exact_dedup(pages_stream: DataFrame) -> DataFrame:
    """Custom stateful operator: cross-micro-batch exact dedup.

    Key = md5 of normalized text; state = first-seen url. Emits every
    arrival tagged ``is_first`` so a downstream filter keeps the corpus
    unique no matter how documents straddle micro-batches.
    """
    hashed = pages_stream.select(
        F.md5(F.lower(F.regexp_replace(F.trim("text"), r"\s+", " "))).alias("content_hash"),
        "url",
    )
    return hashed.groupBy("content_hash").applyInPandasWithState(
        _dedup_fn,
        outputStructType=_DEDUP_OUT,
        stateStructType=_DEDUP_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
