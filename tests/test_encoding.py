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


# --------------------------------------------------------------------------
# charset-aware byte → text decode
# --------------------------------------------------------------------------

def test_detect_and_decode_fallback_paths():
    from pdf_context_extractor_agent_spark.functions.encoding import (
        detect_and_decode,
    )

    # clean utf-8 with no label → utf-8 strict lane
    assert detect_and_decode("héllo".encode("utf-8")) == ("utf-8", "héllo")
    # invalid utf-8, no label → sloppy cp1252 (0x92 → ’, hole 0x81 → \x81)
    assert detect_and_decode(b"caf\xe9 \x92 \x81") == (
        "windows-1252", "café ’ \x81"
    )
    # meta label beyond the 1024-byte sniff window is ignored
    far = b"x" * 1100 + b'<meta charset="windows-1252">\x92'
    cs, txt = detect_and_decode(far)
    assert cs == "windows-1252"  # via invalid-utf8 fallback, not the meta
    assert txt.endswith("’")
    # unknown alias → fallback lane, not a crash
    assert detect_and_decode(b'<meta charset="klingon">ok')[1].endswith("ok")


def test_decode_pages_spark_roundtrip(spark):
    from pdf_context_extractor_agent_spark.functions.encoding import decode_pages

    rows = [
        ("u0", '<meta charset="utf-8"><body>héllo</body>'.encode("utf-8")),
        ("u1", b"\xef\xbb\xbf" + "bom héllo".encode("utf-8")),
        ("u2", '<meta charset="windows-1252">café ’'.encode("cp1252")),
        ("u3", b"\xff\xfe" + "utf16 héllo".encode("utf-16-le")),
        ("u4", None),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: (r["charset"], r["text"])
           for r in decode_pages(df).collect()}
    assert got["u0"] == ("utf-8", '<meta charset="utf-8"><body>héllo</body>')
    assert got["u1"] == ("utf-8", "bom héllo")
    assert got["u2"] == ("windows-1252", '<meta charset="windows-1252">café ’')
    assert got["u3"] == ("utf-16le", "utf16 héllo")
    assert got["u4"] == ("utf-8", "")


def test_decode_pages_no_shuffle(spark):
    from pdf_context_extractor_agent_spark.functions.encoding import decode_pages

    df = spark.createDataFrame([("u", b"x")], "url string, html binary")
    plan = (
        decode_pages(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan  # vectorized, not BatchEvalPython
