"""Per-stage wall-clock attribution of the bench extraction window.

The bench timed window (bench.run_extraction) covers: kernel
materialization (extract_pages, lazily persisted) + the parsed/checks
statement pipeline. This script times each consumer separately against
the same persisted relations so SCALE.md can attribute the r4
throughput regression stage by stage. Usage:

    python scripts/profile_extraction.py [n_docs] [cores]
"""
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pdf_context_extractor_agent_spark.corpus import pages_df
    from pdf_context_extractor_agent_spark.kernels import extract_pages, extracted_text
    from pdf_context_extractor_agent_spark.plans import parse_statements
    from pdf_context_extractor_agent_spark.session import get_spark
    from pdf_context_extractor_agent_spark.sources import salted_repartition

    spark = get_spark(app_name="profile", cores=cores, shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup (same as bench legs)
    pg_w = salted_repartition(pages_df(spark, 200), cores * 2).persist()
    noop(extract_pages(pg_w))
    spark.catalog.clearCache()

    pg = salted_repartition(pages_df(spark, n_docs), cores * 4).persist()
    pg.count()

    stages: dict[str, float] = {}

    t = time.monotonic()
    page_df = extract_pages(pg).persist()
    noop(page_df)
    stages["kernel"] = time.monotonic() - t

    t = time.monotonic()
    res = parse_statements(page_df, spark)
    stages["plan_build"] = time.monotonic() - t

    for k in ("parsed", "checks"):
        t = time.monotonic()
        noop(res[k])
        stages[k] = time.monotonic() - t

    t = time.monotonic()
    ident = extracted_text(page_df).join(pg.select("url", "text"), "url")
    n_ok = ident.filter(F.col("extracted_text") == F.col("text")).count()
    stages["identity"] = time.monotonic() - t

    total = stages["kernel"] + stages["parsed"] + stages["checks"]
    print(f"docs={n_docs} cores={cores} identity_ok={n_ok}")
    for k, v in stages.items():
        print(f"  {k:12s} {v:8.2f}s")
    print(f"  window_total {total:8.2f}s -> {n_docs / total:.0f} docs/sec "
          "(serialized stages; bench overlaps parsed+checks)")


if __name__ == "__main__":
    main()
