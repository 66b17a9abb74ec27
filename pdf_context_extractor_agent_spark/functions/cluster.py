"""Embedding clustering: Lloyd's k-means over an ``array<float>``
column, built so every iteration is cheap at 10^12 vectors and the
whole computation has an exact ANSI-SQL twin (the DuckDB oracle).

Scale shape (the part that matters at 100 TB):

* **Assignment is a zero-shuffle map pass.** The centroid relation is
  k rows (k ≪ corpus); it is folded into ONE row holding an
  ``array<struct<cell, cvec>>`` and broadcast-cross-joined, so each
  vector picks its argmax-cosine cell with ``transform`` +
  ``array_max`` — no corpus shuffle, no per-vector groupBy. (A naive
  ``emb × cents`` join followed by ``groupBy(vec_id)`` re-shuffles the
  whole corpus once per iteration.)
* **The update shuffles only (cell, pos) partial sums.** posexplode →
  ``groupBy(cell, pos).avg`` emits k·dim rows out of the map-side
  partial aggregation — bytes proportional to the MODEL, not the data.
* **Determinism without RNG:** initial centroids are every
  ``stride``-th vector (the same seedless convention as
  ``similarity.ivf_index``). Centroid means are computed in EXACT
  integer space — coordinates quantized to ``floor(x·2^20)`` longs,
  summed (integer addition is order-independent, so partitioning can't
  move the result), then floor-divided by the cell size — and
  assignment cosines are floor-truncated to 4 dp. No ``round()``
  anywhere: Spark's ``F.round`` is HALF_UP on the shortest-decimal
  BigDecimal while DuckDB rounds the raw double, so values landing on a
  .xxx5 boundary would diverge; ``floor`` of the same double is the
  same double on any IEEE engine, and the integer mean removes the
  float-sum association-order hazard entirely.

This is the clustering primitive SemDeDup (Abbas et al., 2023) and
cluster-balanced data selection pipelines assume; the LSH-bucketed
variant lives in ``dedup.semantic_dedup``. The reference has no
embedding operators — this is beyond-reference web-curation surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import cosine

__all__ = ["kmeans_init", "kmeans_assign", "kmeans_update", "kmeans"]

# centroid quantum: coordinates live on a 2^-20 grid during the mean
# update, so cell means are exact integers / 2^20 — bit-identical on
# Spark, DuckDB, and plain Python regardless of summation order
_Q = 1 << 20


def kmeans_init(
    emb: DataFrame, stride: int = 97, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Seedless deterministic init: every ``stride``-th vector is a
    centroid, labelled by its own id → ``(cell, cvec)``."""
    return emb.filter(F.col(id_col) % stride == 0).select(
        F.col(id_col).alias("cell"), F.col(vec_col).cast("array<double>").alias("cvec")
    )


def kmeans_assign(
    emb: DataFrame, cents: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """One Lloyd assignment step as a ZERO-SHUFFLE map pass: fold the
    tiny centroid relation into a single array row, broadcast it, and
    let each vector argmax over the array (ties → lower cell id).
    Returns ``(id_col, cell)``."""
    cent_row = cents.agg(F.collect_list(F.struct("cell", "cvec")).alias("cents"))
    scored = emb.crossJoin(F.broadcast(cent_row)).select(
        id_col,
        F.array_max(
            F.transform(
                "cents",
                lambda c: F.struct(
                    # floor-truncate, never round: same double on every
                    # IEEE engine (module docstring, determinism note)
                    (
                        F.floor(
                            cosine(F.col(vec_col).cast("array<double>"), c["cvec"])
                            * 10000.0
                        )
                        / 10000.0
                    ).alias("ccos"),
                    (-c["cell"]).alias("nid"),
                ),
            )
        ).alias("best"),
    )
    return scored.select(id_col, (-F.col("best.nid")).alias("cell"))


def kmeans_update(
    emb: DataFrame,
    assign: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One Lloyd update step: elementwise mean per cell. The shuffle
    carries only (cell, pos) partial sums — k·dim rows, model-sized.

    The mean is EXACT integer arithmetic: quantize each coordinate to
    ``floor(x·2^20)``, sum as bigint (order-independent, so the result
    cannot depend on partitioning), floor-divide by the cell count
    (``(s - pmod(s, n)) div n`` — exact for negative sums too, where
    Spark's ``div`` truncates but Python/DuckDB floor), then scale back
    by 2^-20 (an exact double for any |v| < 2^53). ``F.avg`` + round
    would be latently flaky: partial-sum association order varies with
    partitioning, and a mean near a rounding boundary could flip."""
    ex = emb.join(assign, id_col).select(
        "cell", F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "x")
    )
    percell = (
        ex.groupBy("cell", "pos")
        .agg(
            F.sum(F.floor(F.col("x") * _Q).cast("long")).alias("s"),
            F.count("*").alias("n"),
        )
        .select(
            "cell",
            "pos",
            (F.expr("(s - pmod(s, n)) div n").cast("double") / float(_Q)).alias("v"),
        )
    )
    return percell.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "v"))), lambda s: s["v"]
        ).alias("cvec")
    )


def kmeans(
    emb: DataFrame,
    stride: int = 97,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fixed-iteration Lloyd's k-means. Returns the final assignment
    ``(id_col, cell, cell_size)``; ``iters`` assignment/update rounds
    then one closing assignment. Fixed iteration count (not a
    convergence test) keeps the plan static and the oracle unrollable —
    at 10^12 rows each extra iteration costs one corpus map pass plus a
    model-sized shuffle, so the caller budgets iterations explicitly."""
    cents = kmeans_init(emb, stride, id_col, vec_col)
    for _ in range(iters):
        assign = kmeans_assign(emb, cents, id_col, vec_col)
        cents = kmeans_update(emb, assign, id_col, vec_col)
    final = kmeans_assign(emb, cents, id_col, vec_col)
    return final.select(
        id_col,
        "cell",
        F.count("*").over(Window.partitionBy("cell")).alias("cell_size"),
    )
