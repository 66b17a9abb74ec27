"""P1-P5: balance-sheet content-range identification and page pruning.

Reference: src/table_extractor.py:18-273. The reference scans pages
sequentially for start/end/next-statement markers and then skips pages
outside the range — the analog of partition pruning. Here the boundary
is a tiny per-url aggregate joined back; the row filter is a plain
predicate Catalyst can push wherever it likes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import joined_row_text, rlike_any
from ..patterns import BALANCE_END_PATTERNS, BALANCE_START_PATTERNS, NEXT_TABLE_PATTERNS


def balance_boundaries(page_df: DataFrame) -> DataFrame:
    """P2: per-url (start_pg, end_pg) from page text.

    Reference loop semantics (table_extractor.py:85-115): start = FIRST
    page matching a start pattern; end is overwritten on every match so
    it resolves to the LAST matching page; a next-statement marker sets
    end only if no end marker was ever seen.
    """
    pt = page_df.select("url", "page", "page_text")
    return pt.groupBy("url").agg(
        F.min(F.when(rlike_any(F.col("page_text"), BALANCE_START_PATTERNS), F.col("page"))).alias("start_pg"),
        F.max(F.when(rlike_any(F.col("page_text"), BALANCE_END_PATTERNS), F.col("page"))).alias("end_pg_raw"),
        F.min(F.when(rlike_any(F.col("page_text"), NEXT_TABLE_PATTERNS), F.col("page"))).alias("next_pg"),
    ).select(
        "url",
        "start_pg",
        F.coalesce("end_pg_raw", "next_pg").alias("end_pg"),
    )


def prune_rows_to_boundary(raw_rows: DataFrame, boundaries: DataFrame) -> DataFrame:
    """P3 page pruning + P4 end-page table filtering/splitting.

    P4 (table_extractor.py:194-273) on the end page only:
      * table without the next-statement marker → kept whole;
      * table with next marker but no end marker → dropped;
      * table with both → rows kept while ``row < first_next_row`` and
        ``row <= first_end_row`` (the reference's append-then-break loop).
    """
    j = raw_rows.join(boundaries, "url", "inner").filter(
        F.col("start_pg").isNotNull()
        & (F.col("page") >= F.col("start_pg"))
        & (F.col("end_pg").isNull() | (F.col("page") <= F.col("end_pg")))
    )

    row_txt = joined_row_text(F.col("cells"))
    j = j.withColumn("_is_end_row", rlike_any(row_txt, BALANCE_END_PATTERNS))
    j = j.withColumn("_is_next_row", rlike_any(row_txt, NEXT_TABLE_PATTERNS))

    w_tab = Window.partitionBy("url", "page", "table_idx")
    j = (
        j.withColumn("_first_end", F.min(F.when(F.col("_is_end_row"), F.col("row_in_table"))).over(w_tab))
        .withColumn("_first_next", F.min(F.when(F.col("_is_next_row"), F.col("row_in_table"))).over(w_tab))
    )
    on_end_page = F.col("end_pg").isNotNull() & (F.col("page") == F.col("end_pg"))
    keep = F.when(~on_end_page, F.lit(True)).otherwise(
        F.when(F.col("_first_next").isNull(), F.lit(True)).otherwise(
            F.col("_first_end").isNotNull()
            & (F.col("row_in_table") < F.col("_first_next"))
            & (F.col("row_in_table") <= F.col("_first_end"))
        )
    )
    return j.filter(keep).select(raw_rows.columns)
