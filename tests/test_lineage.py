"""Checkpoint / lineage / resume tests."""

import pyspark.sql.functions as F

from pdf_context_extractor_agent_spark.corpus import pages_df
from pdf_context_extractor_agent_spark.lineage import run_with_checkpoint
from pdf_context_extractor_agent_spark.sources import salted_repartition


def test_checkpoint_and_resume(spark, tmp_path):
    out = str(tmp_path / "out")
    metrics = str(tmp_path / "metrics")

    first = salted_repartition(pages_df(spark, 6), 4)
    r1 = run_with_checkpoint(spark, first, out, metrics, run_id="run1")
    assert r1 == {"run_id": "run1", "processed": 6, "skipped": 0}

    # grown input (simulates a crawl increment / crashed-run retry):
    # only the 4 new urls are processed
    second = salted_repartition(pages_df(spark, 10), 4)
    r2 = run_with_checkpoint(spark, second, out, metrics, run_id="run2")
    assert r2 == {"run_id": "run2", "processed": 4, "skipped": 6}

    res = spark.read.parquet(out)
    assert res.select("url").distinct().count() == 10
    # no url extracted twice across runs
    assert res.select("url", "page").distinct().count() == res.count()

    m = spark.read.parquet(metrics)
    rows = m.collect()
    assert {r.run_id for r in rows} == {"run1", "run2"}
    assert all(r.status == "ok" for r in rows)
    assert sum(r.url_count for r in rows if r.run_id == "run1") == 6
    assert sum(r.url_count for r in rows if r.run_id == "run2") == 4
    assert all(r.bytes > 0 for r in rows)
    assert m.filter(F.col("duration_ms").isNull()).count() == 0


def test_rerun_is_noop(spark, tmp_path):
    out = str(tmp_path / "out")
    metrics = str(tmp_path / "metrics")
    pg = pages_df(spark, 4)
    run_with_checkpoint(spark, pg, out, metrics, run_id="a")
    r = run_with_checkpoint(spark, pg, out, metrics, run_id="b")
    assert r["processed"] == 0 and r["skipped"] == 4
    assert spark.read.parquet(out).select("url").distinct().count() == 4
