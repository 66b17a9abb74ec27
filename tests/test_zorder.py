"""Z-order layout keys (functions/zorder.py): differential vs a pure
Python bit-interleave, locality property, and the one-exchange plan
shape; cross-engine parity lives in test_entry_oracle (q_zorder_layout)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_context_extractor_agent_spark.functions.zorder import (
    zorder_key,
    zorder_layout,
)


def _morton_py(vals: list[int], bits: int) -> int:
    out = 0
    for bit in range(bits):
        for d, v in enumerate(vals):
            out |= ((v >> bit) & 1) << (bit * len(vals) + (len(vals) - 1 - d))
    return out


@pytest.fixture(scope="module")
def grid(spark):
    rows = [(i, i % 53, (i * 7) % 61) for i in range(600)]
    return spark.createDataFrame(rows, "rid long, x long, y long")


def test_key_matches_reference_interleave_2d(grid):
    got = grid.select("x", "y", zorder_key("x", "y").alias("z")).collect()
    for r in got:
        assert r["z"] == _morton_py([r["x"], r["y"]], 16)


def test_key_matches_reference_interleave_3d(spark):
    rows = [(i % 19, (i * 3) % 23, (i * 5) % 29) for i in range(300)]
    df = spark.createDataFrame(rows, "x long, y long, z long")
    got = df.select("x", "y", "z", zorder_key("x", "y", "z").alias("k")).collect()
    for r in got:
        assert r["k"] == _morton_py([r["x"], r["y"], r["z"]], 10)


def test_key_arity_checked(grid):
    with pytest.raises(ValueError):
        zorder_key("x")


def test_zcurve_segments_are_rectangles(grid):
    """The property that makes min/max stats prune: rows sharing a key
    PREFIX (a Z-curve segment) span a bounded rectangle in EVERY
    dimension — 2^(prefix bits/2) per axis — never the full range."""
    seg = (
        grid.select("x", "y", F.shiftright(zorder_key("x", "y"), 4).alias("seg"))
        .groupBy("seg")
        .agg(
            (F.max("x") - F.min("x")).alias("xr"),
            (F.max("y") - F.min("y")).alias("yr"),
        )
        .collect()
    )
    assert len(seg) > 10
    for r in seg:
        assert r["xr"] <= 3 and r["yr"] <= 3  # 4 prefix bits → ≤ 2^2-1 span


def test_layout_single_exchange_and_sorted(grid):
    out = zorder_layout(grid, ["x", "y"], n_files=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # the range partition only
    # within every partition the key is non-decreasing
    def check(it):
        prev = None
        for row in it:
            assert prev is None or row["zkey"] >= prev
            prev = row["zkey"]
        return iter(())

    out.select("zkey").rdd.mapPartitions(
        lambda it: check(it)
    ).count()


def test_pruning_stats_zorder_beats_linear(grid, spark):
    from pdf_context_extractor_agent_spark.functions.zorder import pruning_stats

    zfiles = grid.select(
        "x", "y", F.shiftright(zorder_key("x", "y"), 4).alias("file_id")
    )
    # 1-D layout: files sorted by x only — full y range in every file
    lfiles = grid.select("x", "y", F.shiftright(F.col("y"), 2).alias("file_id"))
    ranges = [(8, 15), (16, 31)]
    z = pruning_stats(zfiles, "file_id", ["x", "y"], ranges).collect()[0]
    l = pruning_stats(lfiles, "file_id", ["x", "y"], ranges).collect()[0]
    assert z["files_scanned"] < z["n_files"]
    # the 2-D layout scans a smaller fraction than the 1-D one
    assert z["scan_frac"] < l["scan_frac"]


def test_pruning_stats_never_misses_rows(grid):
    """Files counted as prunable really contain no matching rows."""
    from pdf_context_extractor_agent_spark.functions.zorder import pruning_stats

    keyed = grid.select(
        "x", "y", F.shiftright(zorder_key("x", "y"), 4).alias("file_id")
    )
    lo_x, hi_x, lo_y, hi_y = 8, 15, 16, 31
    stats = pruning_stats(
        keyed, "file_id", ["x", "y"], [(lo_x, hi_x), (lo_y, hi_y)]
    ).collect()[0]
    matching_files = (
        keyed.filter(
            (F.col("x").between(lo_x, hi_x)) & (F.col("y").between(lo_y, hi_y))
        )
        .select("file_id")
        .distinct()
        .count()
    )
    assert matching_files <= stats["files_scanned"]
