"""Connected-components duplicate clustering (large-star/small-star).

Differential-tested against a plain Python union-find on seeded random
graphs, plus the adversarial shapes: long chains (worst case for label
propagation), stars (worst case for skew), disjoint cliques.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from pdf_context_extractor_agent_spark.functions.dedup import (
    connected_components,
    dedup_clusters,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node of the component
    comp = {}
    for x in list(parent):
        root = find(x)
        comp.setdefault(root, root)
        comp[x] = root
    # second pass: min id per root (roots here are already minima by
    # the max->min union rule, but re-derive to be safe)
    members = {}
    for x in comp:
        members.setdefault(find(x), []).append(x)
    return {x: min(members[find(x)]) for x in comp}


def _spark_cc(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = connected_components(df)
    return {r["node"]: r["component"] for r in out.collect()}


def test_cc_chain(spark):
    """A 40-node path: O(diameter) propagation would need 40 rounds;
    star contraction must land it well inside max_iter."""
    edges = [(i, i + 1) for i in range(40)]
    got = _spark_cc(spark, edges)
    assert got == {i: 0 for i in range(41)}


def test_cc_star_and_cliques(spark):
    edges = [(100, v) for v in range(101, 120)]          # star, hub=100
    edges += [(a, b) for a in range(5) for b in range(a + 1, 5)]  # clique 0-4
    edges += [(200, 201), (201, 202), (200, 202)]        # triangle
    got = _spark_cc(spark, edges)
    assert got == _union_find(edges)


def test_cc_random_differential(spark):
    rng = random.Random(1234)
    nodes = [rng.randrange(10_000) for _ in range(400)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes))
        for _ in range(300)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    got = _spark_cc(spark, edges)
    assert got == _union_find(edges)


def test_cc_duplicate_and_reversed_edges(spark):
    edges = [(1, 2), (2, 1), (1, 2), (3, 2)]
    got = _spark_cc(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1}


def test_cc_empty(spark):
    df = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(df).count() == 0


def test_cc_idempotent_on_star_output(spark):
    """Feeding the resolved (node, component) pairs back in returns the
    same labeling — the fixpoint really is a star forest."""
    edges = [(i, i + 1) for i in range(10)] + [(50, 51), (52, 51)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    first = connected_components(df)
    again = connected_components(
        first.filter("node <> component"), src="node", dst="component"
    )
    assert {(r["node"], r["component"]) for r in again.collect()} == {
        (r["node"], r["component"]) for r in first.collect() if r["node"] != r["component"]
    } | {(r["component"], r["component"]) for r in first.collect() if r["node"] != r["component"]}


def test_dedup_clusters_full_coverage(spark):
    docs = spark.range(10).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "doc_a long, doc_b long"
    )
    out = dedup_clusters(docs, pairs)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 10
    assert [rows[i]["component"] for i in (1, 2, 3)] == [1, 1, 1]
    assert [rows[i]["cluster_size"] for i in (1, 2, 3)] == [3, 3, 3]
    assert rows[7]["component"] == 7 and rows[8]["cluster_size"] == 2
    for i in (0, 4, 5, 6, 9):
        assert rows[i]["component"] == i and rows[i]["cluster_size"] == 1
    canon = {i for i, r in rows.items() if r["is_canonical"]}
    assert canon == {0, 1, 4, 5, 6, 7, 9}


def test_dedup_clusters_keep_one_per_cluster(spark):
    """The training-pipeline contract: filtering is_canonical keeps
    exactly one doc per component."""
    docs = spark.range(30).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 28, 2)], "doc_a long, doc_b long"
    )
    kept = dedup_clusters(docs, pairs).filter("is_canonical")
    per_comp = kept.groupBy("component").count().collect()
    assert all(r["count"] == 1 for r in per_comp)
    assert kept.count() == 15 + 1  # 14 pairs collapse + 2 leftovers (28,29)


@pytest.mark.parametrize("n,rounds_budget", [(64, 30)])
def test_cc_pathological_chain_converges(spark, n, rounds_budget):
    """Star contraction converges in O(log^2 n) rounds — a 64-node
    chain must finish inside the default budget (label propagation
    would need 64)."""
    edges = [(i, i + 1) for i in range(n)]
    got = _spark_cc(spark, edges)
    assert set(got.values()) == {0}


def test_semdedup_cluster_invariants(spark):
    """SemDeDup composition: every vector labeled, exactly one
    canonical per component, canonical = min id."""
    from pdf_context_extractor_agent_spark.functions.similarity import semdedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = semdedup(emb, threshold=0.2).collect()
    assert len(out) == emb.count()
    by_comp: dict[int, list] = {}
    for r in out:
        by_comp.setdefault(r["component"], []).append(r)
    for comp, rows in by_comp.items():
        canon = [r for r in rows if r["is_canonical"]]
        assert len(canon) == 1
        assert canon[0]["doc_id"] == min(r["doc_id"] for r in rows) == comp
        assert all(r["cluster_size"] == len(rows) for r in rows)
