"""Result comparator + choice resolution (reference
result_comparator.py / user_choice_handler.py semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_context_extractor_agent_spark.operators.columns import header_maps
from pdf_context_extractor_agent_spark.operators.compare import (
    choice_statistics,
    compare_column_maps,
    resolve_choices,
)

MAP_SCHEMA = (
    "url string, statement_type string, "
    "item_col int, cur_col int, prev_col int, note_col int"
)


def _maps(spark, rows):
    return spark.createDataFrame(rows, MAP_SCHEMA)


def _headers(spark, rows):
    return spark.createDataFrame(
        rows, "url string, statement_type string, cells array<string>"
    )


def test_strict_match_no_differences(spark):
    left = _maps(spark, [("d1", "balance_sheet", 0, 2, 3, 1)])
    right = _maps(spark, [("d1", "balance_sheet", 0, 2, 3, 1)])
    out = compare_column_maps(left, right)
    assert out["differences"].count() == 0
    s = out["summary"].first()
    assert s.is_match and s.n_diff == 0 and s.n_left == 4
    assert s.summary == "match: 4 columns"


def test_both_absent_is_a_match(spark):
    # dict-equality: a role unmatched on BOTH sides is not a difference
    left = _maps(spark, [("d1", "balance_sheet", 0, 2, None, None)])
    right = _maps(spark, [("d1", "balance_sheet", 0, 2, None, None)])
    out = compare_column_maps(left, right)
    assert out["differences"].count() == 0
    assert out["summary"].first().n_left == 2


def test_differences_attach_header_cells(spark):
    left = _maps(spark, [("d1", "balance_sheet", 0, 2, 3, None)])
    right = _maps(spark, [("d1", "balance_sheet", 0, 1, 3, 9)])
    headers = _headers(
        spark, [("d1", "balance_sheet", ["项目", "附注", "期末余额", "期初余额"])]
    )
    diffs = {
        r.column_type: r
        for r in compare_column_maps(left, right, headers)["differences"].collect()
    }
    assert set(diffs) == {"current_period", "note"}
    cur = diffs["current_period"]
    assert (cur.left_index, cur.right_index) == (2, 1)
    assert (cur.left_cell, cur.right_cell) == ("期末余额", "附注")
    assert cur.description == "current_period: left col 2 ('期末余额'), right col 1 ('附注')"
    note = diffs["note"]
    # left unmatched; right index points past the ragged header row
    assert note.left_index is None and note.right_cell is None
    assert note.description == "note: left unmatched, right col 9 ('')"
    s = compare_column_maps(left, right, headers)["summary"].first()
    assert not s.is_match
    assert s.summary == "mismatch: left 3, right 4, 2 differences"


def test_table_on_one_side_only(spark):
    left = _maps(spark, [("d1", "balance_sheet", 0, 2, 3, 1)])
    right = _maps(
        spark,
        [("d1", "balance_sheet", 0, 2, 3, 1), ("d2", "cash_flow", 0, 1, 2, None)],
    )
    out = compare_column_maps(left, right)
    d2 = out["summary"].filter("url = 'd2'").first()
    assert not d2.is_match and d2.n_left == 0 and d2.n_right == 3 and d2.n_diff == 3


def test_resolution_precedence_and_skip(spark):
    left = _maps(
        spark,
        [
            ("match", "bs", 0, 2, 3, 1),   # identical → auto-left
            ("hist", "bs", 0, 2, 3, 1),    # differs, history says right
            ("pol", "bs", 0, 2, 3, 1),     # differs, falls to policy
            ("skipme", "bs", 0, 2, 3, 1),  # differs, history says skip
        ],
    )
    right = _maps(
        spark,
        [
            ("match", "bs", 0, 2, 3, 1),
            ("hist", "bs", 1, 2, 3, 1),
            ("pol", "bs", 1, 2, 3, 1),
            ("skipme", "bs", 1, 2, 3, 1),
        ],
    )
    # history even claims the MATCHED table — auto-accept must win there
    choices = spark.createDataFrame(
        [("match", "bs", "right"), ("hist", "bs", "right"), ("skipme", "bs", "skip")],
        "url string, statement_type string, choice string",
    )
    summary = compare_column_maps(left, right)["summary"]
    res = resolve_choices(left, right, summary, policy="left", choices=choices)

    log = {r.url: r for r in res["choices_log"].collect()}
    assert (log["match"].choice, log["match"].choice_source) == ("left", "auto")
    assert (log["hist"].choice, log["hist"].choice_source) == ("right", "history")
    assert (log["pol"].choice, log["pol"].choice_source) == ("left", "policy")
    assert (log["skipme"].choice, log["skipme"].choice_source) == ("skip", "history")

    chosen = {r.url: r for r in res["chosen"].collect()}
    assert set(chosen) == {"match", "hist", "pol"}  # skip dropped
    assert chosen["hist"].chosen_from == "right" and chosen["hist"].item_col == 1
    assert chosen["pol"].chosen_from == "left" and chosen["pol"].item_col == 0

    stats = choice_statistics(res["choices_log"]).first()
    assert stats.total == 4 and stats.left_count == 2
    assert stats.right_count == 1 and stats.skip_count == 1
    assert stats.skip_percentage == 25.0


def test_header_maps_differential_integration(spark):
    """Two real analyzer runs: header_maps over a header bank vs the
    same bank with one header cell renamed to something unrecognized —
    the comparator must localize the divergence to that one role."""
    rows = [
        ("d1", "balance_sheet", ["项目", "附注", "期末余额", "期初余额"]),
        ("d2", "balance_sheet", ["项目", "期末余额", "期初余额"]),
    ]
    base = _headers(spark, rows)
    # second analyzer sees d1's note header destroyed
    perturbed = base.withColumn(
        "cells",
        F.when(
            F.col("url") == "d1",
            F.transform("cells", lambda c: F.replace(c, F.lit("附注"), F.lit("xx"))),
        ).otherwise(F.col("cells")),
    )
    out = compare_column_maps(
        header_maps(base), header_maps(perturbed), headers=base
    )
    diffs = out["differences"].collect()
    assert len(diffs) == 1
    d = diffs[0]
    assert (d.url, d.column_type) == ("d1", "note")
    assert d.left_index == 1 and d.right_index is None
    assert out["summary"].filter("url = 'd2'").first().is_match
