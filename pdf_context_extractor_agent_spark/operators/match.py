"""J1-J4: item matching, first-occurrence dedup, ordered assembly.

Reference: the per-row pattern-dictionary walk in
src/parsers/balance_sheet.py:217-318 (+ totals :320-427) and the clones
in income_statement.py:235-271 / cash_flow.py:202-238. There the winner
is determined by dict iteration order; here the ordering is encoded in
the pattern ids themselves (patterns.item_pid_ranges) so the winner is
an ``array_min`` over literal-regex matches — the load-bearing ordering
(SURVEY.md §7 risk 2: 其中：优先股 lives in both non-current
liabilities and equity) is data, not code.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import matched_pattern_ids
from ..patterns import item_pattern_df, item_pattern_list, item_pid_ranges


@lru_cache(maxsize=1)
def _pid_array_expr() -> Column:
    """The per-statement literal-regex bank as ONE reusable unresolved
    expression. Building it costs ~1 s of serial py4j traffic (hundreds
    of rlike literals); Column expressions are immutable by-name
    references, so the same object is reused across every plan in the
    process — the driver pays the construction once."""
    stmts = sorted(item_pid_ranges())
    arr = F.array().cast("array<int>")
    for stmt in stmts:
        arr = F.when(
            F.col("statement_type") == stmt,
            matched_pattern_ids(F.col("item_name"), item_pattern_list(stmt)),
        ).otherwise(arr)
    return arr


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
    pat = F.broadcast(item_pattern_df(spark).drop("statement_type"))

    # J1 winner with ZERO shuffle: every bank regex is evaluated as a
    # literal (compiled once per task by codegen); pids are assigned in
    # (statement, cat_ord, std_ord, pat_ord) order, so the minimum
    # matching pid inside the row's statement bank IS the reference's
    # first-match winner. Each row evaluates only ITS statement's
    # sub-bank (a when-chain of per-statement arrays — 3× fewer regex
    # evaluations than one global bank). One narrow projection + one
    # broadcast equi-join on pid — no explode, no window, no anti-join.
    with_pid = items.withColumn("pid", F.array_min(_pid_array_expr()))
    winners = with_pid.filter(F.col("pid").isNotNull()).join(pat, "pid")
    unmatched_rows = with_pid.filter(F.col("pid").isNull()).select(
        "url", "statement_type", "row_idx", "item_name",
        "current_period", "previous_period", "note",
    )

    # J2 first-occurrence dedup per storage slot (totals overwrite instead)
    w_slot = Window.partitionBy("url", "statement_type", "section_path", "standard_name").orderBy(
        "row_idx"
    )
    # four consumers (parsed/slots/matched/unmatched) read the winner
    # set; persist so the broadcast join + windows run once
    winners = winners.withColumn("_occ", F.row_number().over(w_slot)).persist()

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

    return {"parsed": parsed, "slots": slots, "matched": matched, "unmatched": unmatched_rows}
