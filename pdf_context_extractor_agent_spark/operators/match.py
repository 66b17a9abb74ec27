"""J1-J4: item matching, first-occurrence dedup, ordered assembly.

Reference: the per-row pattern-dictionary walk in
src/parsers/balance_sheet.py:217-318 (+ totals :320-427) and the clones
in income_statement.py:235-271 / cash_flow.py:202-238. There the winner
is determined by dict iteration order; here it is an explicit
``row_number()`` over ``(cat_ord, std_ord, pat_ord)`` after a broadcast
join of item rows against the unified pattern bank — the load-bearing
ordering (SURVEY.md §7 risk 2: 其中：优先股 lives in both non-current
liabilities and equity) is data, not code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..patterns import item_pattern_df


def match_items(items: DataFrame, spark: SparkSession) -> dict[str, DataFrame]:
    """items (url, statement_type, row_idx, item_name, values…) →

    * ``parsed``  — the ordered_items relation: every first-wins category
      match plus every totals match, with ``row_order`` preserving the
      document order (balance_sheet.py:311-315).
    * ``slots``   — one row per (url, stmt, section, standard_name) used
      by validation: first occurrence for category items (J2,
      balance_sheet.py:299-301), last for totals (dict-slot overwrite,
      :339 etc.).
    * ``matched`` — all rows that matched anything (parsing_info counts).
    * ``unmatched`` — anti-join remainder with row indices
      (balance_sheet.py:268-272).
    """
    pat = F.broadcast(item_pattern_df(spark)).withColumnRenamed(
        "statement_type", "p_stmt"
    )

    j = items.join(
        pat,
        (items["statement_type"] == pat["p_stmt"]) & F.expr("item_name rlike pattern"),
        "inner",
    ).drop("p_stmt")

    # J1 winner: first (category, standard, pattern) in reference order
    w_row = Window.partitionBy("url", "statement_type", "row_idx").orderBy(
        "cat_ord", "std_ord", "pat_ord"
    )
    winners = j.withColumn("_rn", F.row_number().over(w_row)).filter(F.col("_rn") == 1).drop("_rn")

    # J2 first-occurrence dedup per storage slot (totals overwrite instead)
    w_slot = Window.partitionBy("url", "statement_type", "section_path", "standard_name").orderBy(
        "row_idx"
    )
    winners = winners.withColumn("_occ", F.row_number().over(w_slot))

    parsed = (
        winners.filter(F.col("is_total") | (F.col("_occ") == 1))
        .select(
            "url",
            "statement_type",
            "section_path",
            "standard_name",
            F.col("item_name").alias("original_name"),
            "current_period",
            "previous_period",
            "note",
            F.col("row_idx").alias("row_order"),
            "is_total",
        )
    )

    w_slot_last = Window.partitionBy(
        "url", "statement_type", "section_path", "standard_name"
    ).orderBy(F.when(F.col("is_total"), -F.col("row_idx")).otherwise(F.col("row_idx")))
    slots = (
        winners.withColumn("_pick", F.row_number().over(w_slot_last))
        .filter(F.col("_pick") == 1)
        .select(
            "url",
            "statement_type",
            "section_path",
            "standard_name",
            F.col("item_name").alias("original_name"),
            "current_period",
            "previous_period",
            "note",
            "is_total",
        )
    )

    matched = winners.select("url", "statement_type", "row_idx")
    unmatched = items.join(
        matched, ["url", "statement_type", "row_idx"], "left_anti"
    ).select("url", "statement_type", "row_idx", "item_name",
             "current_period", "previous_period", "note")

    return {"parsed": parsed, "slots": slots, "matched": matched, "unmatched": unmatched}
