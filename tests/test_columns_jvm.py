"""JVM fast-path vs Arrow-kernel parity: both extraction routes must
produce identical items for the same input."""

import pyspark.sql.functions as F

from pdf_context_extractor_agent_spark.corpus import pages_df
from pdf_context_extractor_agent_spark.kernels import extract_pages
from pdf_context_extractor_agent_spark.operators.columns import extract_items
from pdf_context_extractor_agent_spark.operators.merge import merged_clean_rows
from pdf_context_extractor_agent_spark.operators.structure import identify_structures
from pdf_context_extractor_agent_spark.plans.extract import statement_rows


def _ranged(spark, page_df):
    rows = statement_rows(page_df).persist()
    structure = identify_structures(rows, spark)
    from pdf_context_extractor_agent_spark.operators.columns import header_maps

    hdr = (
        structure.filter(F.col("header_row").isNotNull())
        .select("url", "statement_type", F.col("header_row").alias("row_idx"))
        .join(rows.select("url", "row_idx", "cells"), ["url", "row_idx"])
        .select("url", "statement_type", "cells")
    )
    hmaps = header_maps(hdr)
    return (
        rows.select("url", "row_idx", "cells")
        .join(structure.select("url", "statement_type", "parse_start", "parse_end"), "url")
        .filter(F.col("row_idx").between(F.col("parse_start"), F.col("parse_end")))
        .join(hmaps, ["url", "statement_type"], "left")
        .select("url", "statement_type", "row_idx", "cells",
                "item_col", "cur_col", "prev_col", "note_col")
    )


def test_jvm_and_kernel_paths_identical(spark, page_df):
    """All three routes — Arrow kernel, split plan, and the default
    single-branch codegen plan — must produce identical items."""
    ranged = _ranged(spark, page_df).persist()

    def key(df):
        return {
            (r.url, r.statement_type, r.row_idx, r.item_name,
             r.current_period, r.previous_period, r.note)
            for r in df.collect()
        }

    a = key(extract_items(ranged, mode="arrow"))
    b = key(extract_items(ranged, mode="split"))
    c = key(extract_items(ranged, mode="jvm"))
    assert a == b and a
    assert a == c


def test_jvm_single_branch_fuzz_parity(spark):
    """Fuzzed ranged rows (arity drift, missing headers, note/money
    mixes, whitespace and placeholder cells): the single-branch codegen
    plan must match the Arrow kernel cell-for-cell. The kernel itself is
    differential-tested against the reference (test_differential), so
    transitively this pins the JVM dynamic path to reference semantics."""
    import random

    from pyspark.sql import types as T

    rng = random.Random(20260817)
    vocab = [
        "项目", "科目", "本期末", "上期末", "期末余额", "年初余额", "附注", "备注",
        "货币资金", "应收账款", "流动资产合计", "资产总计", "减：库存股",
        "1000000.00", "1,234,567.89", "-500.00", "0.00", "123456", "-", "--",
        "", "  ", "n/a", "七、1", "三(2)", "6", "123", "1.23", "约1.5万", None,
    ]
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("statement_type", T.StringType()),
        T.StructField("row_idx", T.IntegerType()),
        T.StructField("cells", T.ArrayType(T.StringType())),
        T.StructField("item_col", T.IntegerType()),
        T.StructField("cur_col", T.IntegerType()),
        T.StructField("prev_col", T.IntegerType()),
        T.StructField("note_col", T.IntegerType()),
    ])
    def hdr():
        return rng.choice([None, None, 0, 1, 2, 3, 4, 5])
    data = [
        (
            f"u{i % 40}", "balance_sheet", i,
            [rng.choice(vocab) for _ in range(rng.randint(1, 10))],
            hdr(), hdr(), hdr(), hdr(),
        )
        for i in range(600)
    ]
    ranged = spark.createDataFrame(data, schema).persist()

    def key(df):
        return {
            (r.url, r.statement_type, r.row_idx, r.item_name,
             r.current_period, r.previous_period, r.note)
            for r in df.collect()
        }

    assert key(extract_items(ranged, mode="arrow")) == key(extract_items(ranged, mode="jvm"))
