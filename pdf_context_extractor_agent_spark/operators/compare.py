"""Result comparison + deterministic choice resolution.

Reference surface: ``src/parsers/result_comparator.py:19-121`` compares
two column-map results per table (strict dict equality, per-role
differences with the header cell attached, a count summary) and
``src/parsers/user_choice_handler.py:33-118`` resolves mismatches by a
recorded choice ('rules' / 'llm' / 'skip'), appending every decision to
a choices log (``_save_choice``, ``:133-176``; aggregate statistics
``:178-219``).

Here both sides are DETERMINISTIC analyzers (the LLM-free mandate —
e.g. the Arrow-kernel vs JVM-expression column paths, or two keyword
banks), so the interactive prompt becomes a policy: matched tables
auto-accept, mismatches resolve from a prior choices relation when one
exists ("history", the batch analog of the saved user_choices.json),
otherwise from a fixed default ('left' / 'right' / 'skip').

Everything is column algebra over the per-table key — at 10^12 docs
the comparison is one co-partitioned full-outer join (both sides are
tiny per-table maps, already keyed by the same url hash as the rest of
the pipeline) plus a roles-long explode; no per-row Python anywhere.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# role → index-column, the shape header_maps() emits (C1-C3 output)
DEFAULT_ROLES = {
    "item_name": "item_col",
    "current_period": "cur_col",
    "previous_period": "prev_col",
    "note": "note_col",
}


def _described(cell: Column, idx: Column) -> Column:
    """``col 3 ('期末余额')`` / ``unmatched`` — the difference wording of
    result_comparator._describe_difference (:123-145), one uniform shape."""
    return F.when(
        idx.isNull(), F.lit("unmatched")
    ).otherwise(
        F.concat(
            F.lit("col "), idx.cast("string"),
            F.lit(" ('"), F.coalesce(cell, F.lit("")), F.lit("')"),
        )
    )


def compare_column_maps(
    left: DataFrame,
    right: DataFrame,
    headers: DataFrame | None = None,
    keys: Iterable[str] = ("url", "statement_type"),
    roles: dict[str, str] | None = None,
) -> dict[str, DataFrame]:
    """Diff two column-map relations (one row per table, one int column
    per role). Returns

    * ``differences`` — one row per (key…, column_type) whose indices
      disagree (null-safe: absent-on-one-side counts, absent-on-both
      matches — dict-equality semantics of result_comparator.py:48):
      ``left_index right_index left_cell right_cell description``
    * ``summary`` — one row per table:
      ``n_left n_right n_diff is_match summary``

    ``headers`` (key… + ``cells`` array<string>) attaches the header
    cell text each index points at, exactly as the reference shows the
    conflicting cells to the user (result_comparator.py:104-118).
    """
    kl = list(keys)
    roles = roles or DEFAULT_ROLES

    lsel = left.select(*kl, *[F.col(c).cast("int").alias(f"l_{c}") for c in roles.values()])
    rsel = right.select(*kl, *[F.col(c).cast("int").alias(f"r_{c}") for c in roles.values()])
    long = (
        lsel.join(rsel, kl, "full")
        .select(
            *kl,
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(role).alias("column_type"),
                        F.col(f"l_{c}").alias("left_index"),
                        F.col(f"r_{c}").alias("right_index"),
                    )
                    for role, c in roles.items()
                ])
            ).alias("p"),
        )
        .select(*kl, "p.*")
    )

    mismatch = ~F.col("left_index").eqNullSafe(F.col("right_index"))
    diffs = long.filter(mismatch)
    if headers is not None:
        diffs = diffs.join(headers.select(*kl, "cells"), kl, "left")
        # try_element_at: indices are 0-based and may point past ragged
        # header rows (ANSI mode would raise on plain element_at)
        cell = lambda c: F.try_element_at("cells", F.col(c) + F.lit(1))  # noqa: E731
        diffs = diffs.withColumns(
            {"left_cell": cell("left_index"), "right_cell": cell("right_index")}
        ).drop("cells")
    else:
        null_s = F.lit(None).cast("string")
        diffs = diffs.withColumns({"left_cell": null_s, "right_cell": null_s})

    diffs = diffs.withColumn(
        "description",
        F.concat(
            F.col("column_type"), F.lit(": left "),
            _described(F.col("left_cell"), F.col("left_index")),
            F.lit(", right "),
            _described(F.col("right_cell"), F.col("right_index")),
        ),
    )

    summary = (
        long.groupBy(*kl)
        .agg(
            F.count("left_index").alias("n_left"),
            F.count("right_index").alias("n_right"),
            F.sum(mismatch.cast("int")).alias("n_diff"),
        )
        .withColumn("is_match", F.col("n_diff") == 0)
        .withColumn(
            "summary",
            F.when(
                F.col("is_match"),
                F.concat(F.lit("match: "), F.col("n_left").cast("string"), F.lit(" columns")),
            ).otherwise(
                F.concat(
                    F.lit("mismatch: left "), F.col("n_left").cast("string"),
                    F.lit(", right "), F.col("n_right").cast("string"),
                    F.lit(", "), F.col("n_diff").cast("string"), F.lit(" differences"),
                )
            ),
        )
    )
    return {"differences": diffs, "summary": summary}


def resolve_choices(
    left: DataFrame,
    right: DataFrame,
    summary: DataFrame,
    policy: str = "left",
    choices: DataFrame | None = None,
    keys: Iterable[str] = ("url", "statement_type"),
) -> dict[str, DataFrame]:
    """Pick, per table, which column map wins (user_choice_handler's
    decision, made deterministic). Precedence per table:

    1. ``is_match`` → 'left' (identical anyway; the reference's
       "严格一致，自动进入下一步" auto-accept, result_comparator.py:71-72)
    2. a row in ``choices`` (key… + ``choice`` ∈ left/right/skip) —
       replayed history, the batch analog of user_choices.json
    3. ``policy`` — the fixed default for unattended runs

    Returns ``chosen`` (the winning map rows; 'skip' tables dropped,
    like the reference's skip branch) and ``choices_log`` (one row per
    table: ``choice choice_source n_diff`` — append it via the lineage
    storage to persist decision history across runs, mirroring
    ``_save_choice``).
    """
    if policy not in ("left", "right", "skip"):
        raise ValueError(f"policy must be left/right/skip, got {policy!r}")
    kl = list(keys)

    base = summary.select(*kl, "is_match", "n_diff")
    if choices is not None:
        base = base.join(choices.select(*kl, "choice"), kl, "left")
    else:
        base = base.withColumn("choice", F.lit(None).cast("string"))

    log = base.select(
        *kl,
        "n_diff",
        F.when(F.col("is_match"), F.lit("left"))
        .otherwise(F.coalesce("choice", F.lit(policy)))
        .alias("choice"),
        F.when(F.col("is_match"), F.lit("auto"))
        .when(F.col("choice").isNotNull(), F.lit("history"))
        .otherwise(F.lit("policy"))
        .alias("choice_source"),
    )

    # winner keys are tiny (one row per table) → semi joins stay local
    # to the existing key partitioning; no map bodies move
    chosen = (
        left.join(log.filter(F.col("choice") == "left").select(*kl), kl, "semi")
        .withColumn("chosen_from", F.lit("left"))
        .unionByName(
            right.join(
                log.filter(F.col("choice") == "right").select(*kl), kl, "semi"
            ).withColumn("chosen_from", F.lit("right"))
        )
    )
    return {"chosen": chosen, "choices_log": log}


def choice_statistics(choices_log: DataFrame) -> DataFrame:
    """Aggregate decision mix (user_choice_handler.get_choice_statistics,
    :178-219): one row — total + count and share per choice."""
    total = F.count("*")
    out = [F.count("*").alias("total")]
    for c in ("left", "right", "skip"):
        n = F.sum((F.col("choice") == c).cast("int"))
        out.append(n.alias(f"{c}_count"))
        out.append(
            F.round(n * 100.0 / total, 2).alias(f"{c}_percentage")
        )
    return choices_log.agg(*out)
