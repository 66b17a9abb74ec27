"""Z-order (Morton) write-layout keys for multidimensional data skipping.

At 100 TB the dominant cost of every later read is how much of the
corpus a scan can SKIP. Sorting the written files by one column
clusters one dimension only; interleaving the bits of two or three
dimensions into a single sort key (Morton / Z-order — the layout
Iceberg's and Delta's ``OPTIMIZE ZORDER`` produce) gives every
interleaved dimension locality at once, so per-file min/max statistics
prune on ALL of them (e.g. crawl queries filtering by domain-hash AND
capture-time both skip ~√F of F files instead of one of them scanning
everything).

The bit spread is the classic magic-mask dilation — a fixed chain of
``(x | x << s) & mask`` steps, pure 64-bit integer ops evaluated
JVM-side inside whole-stage codegen, bit-identical in any engine (the
DuckDB oracle restates the same chain), no UDFs.

Scale shape: ``zorder_key`` is a narrow per-row projection (zero
shuffle); ``zorder_layout`` adds the one range-partitioning exchange
any global sort needs — the same single shuffle a 1-D sort-before-write
already pays, so Z-ordering is free at write time relative to that.

Reference parity note: the reference writes per-document JSON/Excel
(no columnar layout concept); this module is part of the
beyond-reference 100 TB-scale surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["pruning_stats", "zorder_key", "zorder_layout"]

# dilate 16 bits to the even positions of 32 (2-D interleave)
_MASKS_2D = ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555))
# dilate 10 bits to every third position of 30 (3-D interleave)
_MASKS_3D = ((16, 0x030000FF), (8, 0x0300F00F), (4, 0x030C30C3), (2, 0x09249249))

_BITS_2D = 16
_BITS_3D = 10


def _spread(col: Column, masks, in_bits: int) -> Column:
    c = col.cast("bigint").bitwiseAND(F.lit((1 << in_bits) - 1))
    for shift, mask in masks:
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def zorder_key(*cols: Column | str) -> Column:
    """Morton key of 2 or 3 non-negative integer dimension columns.

    The first column's bits land in the highest interleaved positions.
    2-D keeps the low 16 bits of each dimension (32-bit key), 3-D the
    low 10 (30-bit key) — callers bucket real values into that range
    first (hash-mod for ids, epoch-minute mod for time, …); Z-order
    locality only needs the BUCKET to be monotone-ish in the value.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    if len(cols) == 2:
        a, b = (_spread(c, _MASKS_2D, _BITS_2D) for c in cols)
        return F.shiftleft(a, 1).bitwiseOR(b)
    if len(cols) == 3:
        a, b, c = (_spread(x, _MASKS_3D, _BITS_3D) for x in cols)
        return F.shiftleft(a, 2).bitwiseOR(F.shiftleft(b, 1)).bitwiseOR(c)
    raise ValueError("zorder_key interleaves 2 or 3 columns")


def zorder_layout(
    df: DataFrame,
    dims: list[Column | str],
    n_files: int,
    key_col: str = "zkey",
) -> DataFrame:
    """Cluster ``df`` for writing: Morton key → range partition → sort
    within partitions. One exchange total (the same one any
    sort-before-write pays); each output file then covers a compact
    Z-curve segment, i.e. a small rectangle in every dimension, which
    is exactly what makes per-file min/max stats selective."""
    keyed = df.withColumn(key_col, zorder_key(*dims))
    return keyed.repartitionByRange(n_files, key_col).sortWithinPartitions(key_col)


def pruning_stats(
    keyed: DataFrame,
    file_col: str,
    dims: list[Column | str],
    ranges: list[tuple[int, int]],
) -> DataFrame:
    """How many files a conjunctive range predicate must scan under a
    given file assignment — the measurable payoff of a write layout.

    ``keyed`` carries the dimension columns plus ``file_col`` (the file
    each row would land in). Per-file min/max of every dimension are
    exactly the footer statistics Parquet/Iceberg keep; a file must be
    scanned iff its [min, max] box intersects the predicate box on ALL
    dimensions. Output is one row: ``(n_files, files_scanned,
    scan_frac)``. One shuffle on ``file_col`` (map-side combined
    min/max), then a single-row aggregate.
    """
    aggs = []
    for i, d in enumerate(dims):
        d = F.col(d) if isinstance(d, str) else d
        aggs += [F.min(d).alias(f"min_{i}"), F.max(d).alias(f"max_{i}")]
    files = keyed.groupBy(file_col).agg(*aggs)
    must_scan = F.lit(True)
    for i, (lo, hi) in enumerate(ranges):
        must_scan = (
            must_scan
            & (F.col(f"max_{i}") >= F.lit(lo))
            & (F.col(f"min_{i}") <= F.lit(hi))
        )
    return files.agg(
        F.count("*").alias("n_files"),
        F.sum(must_scan.cast("bigint")).alias("files_scanned"),
        F.round(
            F.sum(must_scan.cast("bigint")) / F.count("*"), 4
        ).alias("scan_frac"),
    )
