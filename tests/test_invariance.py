"""Distributed-execution invariance: results must not depend on Arrow
batch size or partition layout — the properties that make 'works on
local[8]' transfer to 'works on 1000 executors'."""

import pyspark.sql.functions as F

from pdf_context_extractor_agent_spark.corpus import pages_df
from pdf_context_extractor_agent_spark.kernels import extract_pages
from pdf_context_extractor_agent_spark.plans import parse_statements


def _parsed_set(spark, pg):
    res = parse_statements(extract_pages(pg), spark)
    return {
        (r.url, r.statement_type, r.standard_name, r.row_order,
         r.current_period, r.previous_period)
        for r in res["parsed"].collect()
    }


def test_arrow_batch_size_invariance(spark):
    """The kernel is vectorized per batch; batch boundaries must be
    invisible (reference analog: batch=5 vs batch=10 runs,
    tests/test_batch_extractor.py — there the LLM made size matter)."""
    pg = pages_df(spark, 8)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
        small = _parsed_set(spark, pg)
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        big = _parsed_set(spark, pg)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert small == big and small


def test_partition_layout_invariance(spark):
    """Every window/aggregate keys on url — repartitioning must never
    change any extracted value or row order."""
    pg = pages_df(spark, 10)
    one = _parsed_set(spark, pg.coalesce(1))
    many = _parsed_set(spark, pg.repartition(16, F.xxhash64("url")))
    assert one == many and one
