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
    ranged = _ranged(spark, page_df).persist()

    def key(df):
        return {
            (r.url, r.statement_type, r.row_idx, r.item_name,
             r.current_period, r.previous_period, r.note)
            for r in df.collect()
        }

    a = key(extract_items(ranged, jvm_fast_path=False))
    b = key(extract_items(ranged, jvm_fast_path=True))
    assert a == b and a
