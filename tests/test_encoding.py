"""Mojibake repair (functions/encoding.py): the ftfy-core subset."""

from __future__ import annotations

import pyspark.sql.functions as F

from pdf_context_extractor_agent_spark.functions.encoding import (
    MOJIBAKE_PAIRS,
    _sloppy_cp1252,
    fix_mojibake,
    mojibake_score,
    mojibake_stats,
)


def _fix_one(spark, s: str) -> str:
    df = spark.createDataFrame([(s,)], "t string")
    return df.select(fix_mojibake(F.col("t")).alias("f")).first()["f"]


def test_common_sequences_repaired(spark):
    assert _fix_one(spark, "cafÃ©") == "café"
    assert _fix_one(spark, "donâ€™t â€œquoteâ€\x9d meâ€¦") == "don’t “quote” me…"
    assert _fix_one(spark, "naÃ¯ve rÃ©sumÃ© â‚¬9") == "naïve résumé €9"


def test_clean_text_untouched(spark):
    clean = "plain ASCII text, already fine. 100% clean!"
    assert _fix_one(spark, clean) == clean


def test_roundtrip_every_target(spark):
    # corrupt each repair target exactly the way the table was built
    # (UTF-8 bytes mis-decoded as sloppy cp1252) and verify repair
    # inverts it — in one batch through the real Spark expression
    originals = [f"x{t}y" for _, t in MOJIBAKE_PAIRS]
    corrupted = [
        "".join(_sloppy_cp1252(b) for b in o.encode("utf-8")) for o in originals
    ]
    df = spark.createDataFrame([(c,) for c in corrupted], "t string")
    fixed = [r["f"] for r in df.select(fix_mojibake(F.col("t")).alias("f")).collect()]
    assert fixed == originals


def test_score_zero_iff_clean(spark):
    df = spark.createDataFrame(
        [("doc one is clean.",), ("cafÃ© crÃ¨me â€” yes",)], "t string"
    )
    s = [r["s"] for r in df.select(mojibake_score(F.col("t")).alias("s")).collect()]
    assert s[0] == 0.0
    assert s[1] > 0.0


def test_stats_schema_and_values(spark):
    df = spark.createDataFrame([(1, "Ã©Ã©"), (2, None)], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in mojibake_stats(df).collect()}
    assert rows[1]["fixed_len"] == 2 and rows[1]["repaired_chars"] == 2
    assert rows[1]["moji_score_ppm"] == 500000
    assert rows[2]["fixed_len"] == 0 and rows[2]["moji_score_ppm"] == 0
    assert dict(mojibake_stats(df).dtypes) == {
        "doc_id": "bigint",
        "fixed_len": "bigint",
        "repaired_chars": "bigint",
        "moji_score_ppm": "bigint",
        "fixed_md5": "string",
    }
