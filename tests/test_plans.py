"""Physical-plan property tests: pushdown, pruning, join strategy.

A correct-but-badly-planned operator is not done (the 100 TB contract):
these tests pin the plan shapes the engine depends on.
"""

import tempfile

import pyspark.sql.functions as F
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.01"


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_column_pushdown(spark):
    """The shipdate filter and the 3-column projection must reach the
    parquet scan — a scan reading all 11 lineitem columns is wrong."""
    plan = _physical(entry_mod.queries()["q_scan_pushdown"](spark, SF))
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "PushedFilters" in plan
    assert "IsNotNull(l_shipdate)" in plan or "isnotnull(l_shipdate" in plan
    # projection pruned to exactly the needed columns
    for col in ("l_quantity", "l_orderkey", "l_discount"):
        assert col not in scan


def test_small_dims_broadcast(spark):
    """customer/nation sides of the revenue join go broadcast-hash, not
    sort-merge — no shuffle of the big fact table."""
    plan = _physical(entry_mod.queries()["q_join_revenue"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_pattern_bank_is_not_nested_loop(spark):
    """J1 matching must never plan a nested-loop join: the bank is
    evaluated as literal regexes + an array_min, then a broadcast
    equi-join on pid."""
    items = spark.createDataFrame(
        [("u", "balance_sheet", 1, "货币资金", "1.0", "0.9", None)],
        "url string, statement_type string, row_idx int, item_name string, "
        "current_period string, previous_period string, note string",
    )
    from pdf_context_extractor_agent_spark.operators.match import match_items

    plan = _physical(match_items(items, spark)["parsed"])
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_kernel_input_pruned_to_url_html(spark):
    """The layout kernel ships only (url, html) into Python — never the
    text/lang columns (at 100 TB, `text` alone is tens of TB)."""
    from pdf_context_extractor_agent_spark.kernels import extract_pages

    with tempfile.TemporaryDirectory() as d:
        from pdf_context_extractor_agent_spark.corpus import pages_df

        pages_df(spark, 5).write.mode("overwrite").parquet(d)
        pg = spark.read.parquet(d)
        plan = _physical(extract_pages(pg))
        scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
        assert "text" not in scan.split("ReadSchema")[0] or "ReadSchema: struct<url:string,html:binary>" in plan


def test_quality_never_reads_html(spark):
    from pdf_context_extractor_agent_spark.functions.quality import quality_features

    with tempfile.TemporaryDirectory() as d:
        from pdf_context_extractor_agent_spark.corpus import pages_df

        pages_df(spark, 5).write.mode("overwrite").parquet(d)
        pg = spark.read.parquet(d)
        plan = _physical(quality_features(pg.select("url", "text")))
        assert "ReadSchema: struct<url:string,text:string>" in plan
