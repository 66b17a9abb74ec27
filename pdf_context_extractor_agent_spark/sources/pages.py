"""Pages-table source: Iceberg-or-parquet scan + skew-salted repartition.

The production table is Iceberg (north_rule); this sandbox has no
Iceberg catalog jar, so the reader falls back to parquet transparently —
the DataFrame shape and every downstream plan are identical. Column
pruning at this scan is the single most important scale property: a
stage that needs only ``text`` must never read the ``html`` binary
(SURVEY.md §4), which both formats guarantee for columnar reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_pages(spark: SparkSession, path_or_table: str) -> DataFrame:
    """Read the (url, warc_ts, html, text, lang) table."""
    if "/" not in path_or_table:
        return spark.read.table(path_or_table)
    try:
        return spark.read.format("iceberg").load(path_or_table)
    except Exception:
        return spark.read.parquet(path_or_table)


DEFAULT_JUMBO_BYTES = 8 * 1024 * 1024


def split_by_size(
    df: DataFrame, threshold_bytes: int = DEFAULT_JUMBO_BYTES
) -> tuple[DataFrame, DataFrame]:
    """Skew lane for oversized documents (SCALE.md).

    A 500 MB report in a partition of 7 KB pages makes that task the
    straggler of the whole stage. Split the corpus at a size threshold:
    the normal lane keeps dense salted partitions, the jumbo lane gets
    one document per partition (repartition on url puts each key alone
    when partitions ≥ docs) so a monster doc can only delay itself.
    Both lanes run the identical plan; union the outputs.
    """
    size = F.length("html")
    normal = df.filter(size <= threshold_bytes)
    jumbo = df.filter(size > threshold_bytes).repartition(F.col("url"))
    return normal, jumbo


def skew_partitioned(
    df: DataFrame,
    num_partitions: int | None = None,
    jumbo_threshold: int = DEFAULT_JUMBO_BYTES,
) -> DataFrame:
    """The production partitioning for the layout kernel: dense salted
    partitions for normal documents + one-document partitions for
    jumbos, unioned. Union concatenates the two lanes' partition lists,
    so the kernel (a narrow per-partition map) sees both layouts without
    an extra shuffle; the first wide op downstream re-shuffles anyway.

    Both lanes filter the same input, so the source is scanned twice in
    the job that materializes the kernel — cheap next to the kernel
    itself, and irrelevant when the input is a persisted/columnar scan.
    """
    normal, jumbo = split_by_size(df, jumbo_threshold)
    return salted_repartition(normal, num_partitions).unionByName(jumbo)


def salted_repartition(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Skew guard for the layout kernel (SURVEY.md §4 item 1).

    Documents are uneven (a 500-page annual report vs a 1-page note);
    hashing on raw url would put hot keys wherever the table's file
    layout left them. ``xxhash64(url)`` gives a uniform shuffle key; at
    10^12 rows you'd add a per-doc page-split before the kernel and
    reassemble with a window — page-level decomposition is semantics
    preserving (the reference loops per page: table_extractor.py:46-63).
    """
    if num_partitions:
        return df.repartition(num_partitions, F.xxhash64("url"))
    return df.repartition(F.xxhash64("url"))
