"""HyperLogLog + count-min sketches: Python-differential hashing,
estimator invariants, and the over-count-only guarantee."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from pdf_context_extractor_agent_spark.functions.sketch import (
    cm_build,
    cm_heavy_hitters,
    cm_query,
    hll_estimate_keys,
    hll_registers,
    md5_hash60,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def _py_hash60(key: str, seed: int) -> int:
    return int(hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:15], 16)


def test_md5_hash60_matches_python(spark):
    keys = ["alpha", "beta", "a b", "café", ""]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r["k"]: r["h"]
        for r in df.select("k", md5_hash60(F.col("k"), 3).alias("h")).collect()
    }
    for k in keys:
        assert got[k] == _py_hash60(k, 3)


def test_hll_registers_match_python(spark):
    keys = [f"key{i}" for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], "token string")
    regs = {r["bucket"]: r["rho_max"] for r in hll_registers(df, p=8).collect()}
    want: dict[int, int] = {}
    for k in keys:
        h = _py_hash60(k, 0)
        b, w = h % 256, h // 256
        rho = 53 if w == 0 else 53 - w.bit_length()
        want[b] = max(want.get(b, 0), rho)
    assert regs == want


def test_hll_estimate_within_tolerance(spark):
    # 3000 distinct keys, p=8 → expected std error ~1.04/sqrt(256) ≈ 6.5%
    df = spark.range(3000).select(F.concat(F.lit("k"), "id").alias("token"))
    row = hll_estimate_keys(df, "token", p=8).first()
    assert row["exact_distinct"] == 3000
    assert abs(row["rel_error"]) < 0.25
    assert row["nonzero_registers"] <= 256


def test_hll_duplicates_do_not_move_estimate(spark):
    base = spark.range(500).select(F.concat(F.lit("k"), "id").alias("token"))
    dup = base.union(base).union(base)
    assert (
        hll_estimate_keys(base, "token").first()["hll_estimate"]
        == hll_estimate_keys(dup, "token").first()["hll_estimate"]
    )


def test_cm_never_undercounts(spark, docs):
    out = cm_heavy_hitters(docs, width=16, depth=4, k=50).collect()
    assert out, "no tokens"
    assert all(r["est"] >= r["exact"] for r in out)


def test_cm_exact_at_generous_width(spark, docs):
    # width ≫ vocabulary → no collisions → est == exact everywhere
    out = cm_heavy_hitters(docs, width=1 << 14, depth=4, k=50).collect()
    assert all(r["est"] == r["exact"] for r in out)


def test_cm_query_matches_python(spark):
    rows = [("a",), ("a",), ("a",), ("b",), ("b",), ("c",)]
    df = spark.createDataFrame(rows, "token string")
    sketch = cm_build(df, width=8, depth=2)
    est = {
        r["token"]: r["est"]
        for r in cm_query(sketch, df.distinct(), width=8, depth=2).collect()
    }
    # python replica
    cells: dict[tuple[int, int], int] = {}
    for (t,) in rows:
        for j in range(2):
            rc = (j, _py_hash60(t, j) % 8)
            cells[rc] = cells.get(rc, 0) + 1
    for t in {"a", "b", "c"}:
        want = min(cells[(j, _py_hash60(t, j) % 8)] for j in range(2))
        assert est[t] == want


def test_sketch_relations_are_model_sized(spark, docs):
    from pdf_context_extractor_agent_spark.functions.sketch import _tokens

    toks = _tokens(docs, "text")
    assert cm_build(toks, width=16, depth=4).count() <= 16 * 4
    assert hll_registers(toks, p=8).count() <= 256


def test_hll_union_estimate_merge(spark):
    from pdf_context_extractor_agent_spark.functions.sketch import hll_union_estimate

    a = spark.createDataFrame([(f"k{i}",) for i in range(300)], "token string")
    b = spark.createDataFrame([(f"k{i}",) for i in range(200, 500)], "token string")
    rows = {r["side"]: r for r in hll_union_estimate(a, b).collect()}
    assert rows["a"]["exact_distinct"] == 300
    assert rows["union"]["exact_distinct"] == 500
    # merged-register estimate must track the union, not the sum of
    # sides (overlap 100 keys) — generous sketch-error envelope
    est = rows["union"]["hll_estimate"]
    assert 350 <= est <= 650
    # merge can only grow registers: union register_sum <= each side's
    # (smaller sum == larger rho values == more mass seen)
    assert rows["union"]["register_sum"] <= rows["a"]["register_sum"]
    assert rows["union"]["register_sum"] <= rows["b"]["register_sum"]
