"""Lloyd's k-means over the embeddings table: invariants + a
differential check against a plain-Python implementation of the same
deterministic recipe (strided init, cosine floor-truncated to 4 dp,
exact integer-quantized centroid means — see cluster.py docstring)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pdf_context_extractor_agent_spark.functions.cluster import (
    kmeans,
    kmeans_assign,
    kmeans_init,
    kmeans_update,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


_Q = 1 << 20


def _trunc4(x: float) -> float:
    # floor-truncation, the engine's cross-engine-safe discipline
    # (F.round is HALF_UP BigDecimal; floor of a double is exact)
    return math.floor(x * 10000.0) / 10000.0


def _py_kmeans(rows, stride, iters):
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
    cents = {i: list(v) for i, v in vecs.items() if i % stride == 0}

    def cos(a, b):
        d = 0.0
        for x, y in zip(a, b):
            d += x * y
        na = 0.0
        nb = 0.0
        for x in a:
            na += x * x
        for y in b:
            nb += y * y
        return d / (math.sqrt(na) * math.sqrt(nb))

    def assign():
        out = {}
        for i, v in vecs.items():
            best = max(
                ((_trunc4(cos(v, c)), -cid) for cid, c in cents.items())
            )
            out[i] = -best[1]
        return out

    for _ in range(iters):
        a = assign()
        by_cell: dict[int, list[int]] = {}
        for i, c in a.items():
            by_cell.setdefault(c, []).append(i)
        # exact integer mean: quantize to the 2^-20 grid, sum as ints
        # (order-independent), floor-divide by the cell size — Python's
        # // is floor division, matching Spark's (s - pmod(s,n)) div n
        cents = {
            c: [
                (sum(math.floor(vecs[i][p] * _Q) for i in members) // len(members))
                / _Q
                for p in range(len(next(iter(vecs.values()))))
            ]
            for c, members in by_cell.items()
        }
    return assign()


def test_kmeans_matches_python(spark, emb):
    got = {
        r["vec_id"]: r["cell"]
        for r in kmeans(emb, stride=13, iters=2).collect()
    }
    want = _py_kmeans(emb.collect(), stride=13, iters=2)
    assert got == want


def test_kmeans_covers_every_vector_once(spark, emb):
    n = emb.count()
    out = kmeans(emb, stride=13, iters=2)
    assert out.count() == n
    assert out.select("vec_id").distinct().count() == n


def test_cell_sizes_sum_to_corpus(spark, emb):
    out = kmeans(emb, stride=13, iters=2)
    sizes = out.select("cell", "cell_size").distinct()
    total = sizes.agg(F.sum("cell_size")).first()[0]
    assert total == emb.count()


def test_cells_shrink_or_hold_never_grow_labels(spark, emb):
    """Cell labels always come from the initial strided centroid ids
    (Lloyd never invents a label, it can only empty one out)."""
    init_cells = {
        r["cell"] for r in kmeans_init(emb, stride=13).select("cell").collect()
    }
    final_cells = {
        r["cell"] for r in kmeans(emb, stride=13, iters=2).select("cell").distinct().collect()
    }
    assert final_cells <= init_cells


def test_update_emits_model_sized_relation(spark, emb):
    """The update's output is k×1 rows of dim-length arrays — the
    shuffle carries the MODEL, not the corpus."""
    a = kmeans_assign(emb, kmeans_init(emb, stride=13))
    cents = kmeans_update(emb, a)
    rows = cents.collect()
    assert 0 < len(rows) <= emb.filter(F.col("vec_id") % 13 == 0).count()
    dim = len(emb.select("embedding").first()[0])
    assert all(len(r["cvec"]) == dim for r in rows)


def test_assign_plan_has_no_corpus_shuffle(spark, emb):
    """Assignment must stay a broadcast map pass: no Exchange on the
    corpus side of the plan (the only exchange allowed is the tiny
    centroid fold / broadcast)."""
    plan = kmeans_assign(emb, kmeans_init(emb, stride=13))._jdf.queryExecution().executedPlan().toString()
    # the embeddings scan feeds straight into project/broadcast-join —
    # a SortMergeJoin or corpus-side Exchange hash-partitioning on
    # vec_id would mean the fold-into-one-row trick regressed
    assert "SortMergeJoin" not in plan


def test_connected_components_string_ids(spark):
    """String doc ids (urls, hash keys) must cluster correctly — the
    old cast('long') nulled them, dropped every edge, and reported
    every doc canonical (silent duplicate retention)."""
    from pdf_context_extractor_agent_spark.functions.dedup import (
        connected_components,
        dedup_clusters,
    )

    pairs = spark.createDataFrame(
        [("doc_b", "doc_a"), ("doc_b", "doc_c"), ("doc_x", "doc_y")],
        "doc_a string, doc_b string",
    )
    comp = {r.node: r.component for r in connected_components(pairs).collect()}
    assert comp == {"doc_a": "doc_a", "doc_b": "doc_a", "doc_c": "doc_a",
                    "doc_x": "doc_x", "doc_y": "doc_x"}
    docs = spark.createDataFrame(
        [(d,) for d in ("doc_a", "doc_b", "doc_c", "doc_x", "doc_y", "solo")],
        "doc_id string",
    )
    out = {r.doc_id: (r.component, r.cluster_size, r.is_canonical)
           for r in dedup_clusters(docs, pairs).collect()}
    assert out["doc_b"] == ("doc_a", 3, False)
    assert out["doc_a"] == ("doc_a", 3, True)
    assert out["solo"] == ("solo", 1, True)
