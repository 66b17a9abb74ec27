"""Checkpoint / lineage / resumable runs (north-rule scale machinery;
absent in the reference beyond per-batch error bookkeeping,
batch_notes_extractor.py:89-99 and parsing_info, balance_sheet.py:152-156).

Model: an extraction run writes its results partitioned by run, plus a
METRICS table with one row per (run_id, partition) — url count, bytes,
kernel wall-clock, status — matching the FIXTURES.md §2 ``metrics``
schema. Resuming a run anti-joins the input against urls already
present in the output, so a crashed job reprocesses only the missing
partitions. On Iceberg the append is an atomic snapshot commit; on the
parquet fallback used here, per-run subdirectories give the same
idempotence.

The per-partition timing rides INSIDE the layout kernel (the kernel
emits a duration column aggregated per partition afterwards) — no extra
pass, no RDD API.
"""

from __future__ import annotations

import time
import uuid
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .kernels.html_layout import PAGE_SCHEMA, parse_doc

METRICS_SCHEMA = (
    "run_id string, partition_id int, url_count long, bytes long, "
    "duration_ms long, status string, error string"
)

_INSTRUMENTED_SCHEMA = T.StructType(
    PAGE_SCHEMA.fields
    + [
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("kernel_ms", T.LongType()),
        T.StructField("doc_bytes", T.LongType()),
    ]
)


def instrumented_extract_pages(pages_tbl: DataFrame) -> DataFrame:
    """Layout kernel variant that carries partition id + per-doc timing
    so lineage metrics fall out of a cheap aggregation afterwards."""
    src = pages_tbl.select("url", "html").withColumn(
        "partition_id", F.spark_partition_id()
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for url, blob, pid in zip(b["url"], b["html"], b["partition_id"]):
                t0 = time.monotonic()
                pages = parse_doc(bytes(blob))
                ms = int((time.monotonic() - t0) * 1000)
                for p in pages:
                    rows.append(
                        (url, p["page"], p["width"], p["height"],
                         p.get("rotation", 0), p["page_text"], p["lines"], p["tables"],
                         int(pid), ms, len(blob))
                    )
            yield pd.DataFrame(
                rows,
                columns=["url", "page", "width", "height", "rotation",
                         "page_text", "lines", "tables",
                         "partition_id", "kernel_ms", "doc_bytes"],
            )

    return src.mapInPandas(kernel, schema=_INSTRUMENTED_SCHEMA)


def partition_metrics(instrumented: DataFrame, run_id: str) -> DataFrame:
    """One lineage row per partition (FIXTURES.md §2 metrics schema)."""
    per_doc = instrumented.groupBy("partition_id", "url").agg(
        F.first("kernel_ms").alias("kernel_ms"), F.first("doc_bytes").alias("doc_bytes")
    )
    return per_doc.groupBy("partition_id").agg(
        F.lit(run_id).alias("run_id"),
        F.count("*").alias("url_count"),
        F.sum("doc_bytes").alias("bytes"),
        F.sum("kernel_ms").alias("duration_ms"),
        F.lit("ok").alias("status"),
        F.lit(None).cast("string").alias("error"),
    ).select("run_id", "partition_id", "url_count", "bytes", "duration_ms", "status", "error")


def completed_urls(spark: SparkSession, output_path: str) -> DataFrame | None:
    """urls already extracted by prior runs (None when no output yet)."""
    try:
        return spark.read.parquet(output_path).select("url").distinct()
    except Exception:
        return None


def run_with_checkpoint(
    spark: SparkSession,
    pages_tbl: DataFrame,
    output_path: str,
    metrics_path: str,
    run_id: str | None = None,
) -> dict:
    """Resumable extraction: skip done urls, extract the rest, append
    page text + lineage metrics. Returns {run_id, processed, skipped}.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    total = pages_tbl.select("url").distinct().count()
    done = completed_urls(spark, output_path)
    todo = pages_tbl if done is None else pages_tbl.join(done, "url", "left_anti")

    inst = instrumented_extract_pages(todo).persist()
    n_urls = inst.select("url").distinct().count()
    if n_urls:
        # metrics BEFORE results: appending to output_path makes Spark
        # re-materialize any cached plan that reads it — and ``inst``'s
        # lineage contains the anti-join against output_path, so a
        # post-append recompute would see its own output and go empty.
        # Resume keys on the OUTPUT urls (not metrics), so a crash
        # between the two writes only leaves an advisory metrics row.
        partition_metrics(inst, run_id).write.mode("append").parquet(metrics_path)
        (
            inst.select("url", "page", "page_text")
            .withColumn("run_id", F.lit(run_id))
            .write.mode("append")
            .parquet(output_path)
        )
    inst.unpersist()
    return {"run_id": run_id, "processed": n_urls, "skipped": total - n_urls}
