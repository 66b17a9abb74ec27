"""M1-M3: cross-page table merge, duplicate-header drop, cell cleaning.

Reference: src/table_extractor.py:275-354. The reference concatenates
table lists in page order and drops a repeated header row on non-first
tables; here the "merge" is simply a deterministic global row ordering
window — the data never moves, only gains an index. One shuffle by url
(which every later per-document stage reuses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import clean_cells, is_header_row


def tables_long(page_df: DataFrame) -> DataFrame:
    """pages → one row per table: (url, page, table_idx, y_top, y_bottom, rows)."""
    return page_df.select(
        "url", "page", F.explode("tables").alias("t")
    ).select(
        "url",
        "page",
        F.col("t.table_idx").alias("table_idx"),
        F.col("t.y_top").alias("y_top"),
        F.col("t.y_bottom").alias("y_bottom"),
        F.col("t.rows").alias("rows"),
    )


def rows_long(tables_df: DataFrame) -> DataFrame:
    """tables → one row per table row: (…, row_in_table, cells)."""
    return tables_df.select(
        "url",
        "page",
        "table_idx",
        F.posexplode("rows").alias("row_in_table", "cells"),
    )


def merged_clean_rows(raw_rows: DataFrame) -> DataFrame:
    """M1 ordered merge + M2 header dedup + M3 clean → the parser's table.

    Output: (url, row_idx, cells, page, table_idx, row_in_table) where
    row_idx is the reference's merged-table row index (0-based, computed
    AFTER empty-row removal, exactly like clean_table_data which drops
    empty rows before the parser ever sees indices).
    """
    # Both windows share ONE spec so the plan sorts each url partition
    # exactly once (a dense_rank over the shorter (page, table_idx)
    # order would force a second full sort of every row; "non-first
    # table" only needs the doc's FIRST (page, table_idx), which the
    # running first_value yields under the full row order).
    w_rows = Window.partitionBy("url").orderBy("page", "table_idx", "row_in_table")

    tbl = F.struct("page", "table_idx")
    df = raw_rows.withColumn("_is_cont_tbl", tbl != F.first(tbl).over(w_rows))
    # M2: drop row 0 of non-first tables iff it is a repeated header
    df = df.filter(
        ~(F.col("_is_cont_tbl") & (F.col("row_in_table") == 0) & is_header_row(F.col("cells")))
    ).drop("_is_cont_tbl")
    # M3: clean cells, drop all-empty rows
    df = df.withColumn("cells", clean_cells(F.col("cells")))
    df = df.filter(F.exists(F.col("cells"), lambda c: c != ""))
    return df.withColumn("row_idx", F.row_number().over(w_rows) - 1)
