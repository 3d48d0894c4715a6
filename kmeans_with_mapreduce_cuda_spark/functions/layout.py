"""Data-layout keys: Z-order (Morton) interleaving as a pure Column
expression.

Range-clustering one column (sources.writers.write_range_clustered)
gives perfect pruning on THAT column and none on any other.  A Z-order
key interleaves the bits of n normalized columns round-robin, so
sorting by it tiles the n-dimensional space into locality cells: every
output file then has a NARROW min/max range on ALL clustered columns,
and parquet footer statistics prune scans filtered on any of them.
This is how
lakehouse engines implement multi-dimensional clustering; here it is
~20 JVM bit-ops per row at WRITE time only, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalize_to_bits(
    col: Column, lo: float, hi: float, bits: int
) -> Column:
    """Scale [lo, hi] -> integer [0, 2^bits - 1] (clamped)."""
    top = (1 << bits) - 1
    scaled = (col.cast("double") - F.lit(float(lo))) * (
        float(top) / max(float(hi) - float(lo), 1e-300)
    )
    return F.least(
        F.lit(top).cast("long"),
        F.greatest(F.lit(0).cast("long"), scaled.cast("long")),
    )


def zorder_key(
    cols: list[Column | str],
    ranges: list[tuple[float, float]],
    bits: int = 8,
) -> Column:
    """Morton key for n columns: normalize each to ``bits`` bits, then
    interleave round-robin (column j's bit i lands at position
    i * n + j), so consecutive key values stay local in ALL n
    dimensions at once.

    ``ranges[j]`` is the (min, max) of ``cols[j]`` -- pass known domain
    bounds or a one-time ``agg(min, max)`` result; stale bounds only
    degrade clustering quality, never correctness (values clamp).
    n * bits must fit a signed long; bits=8 with n=3 tiles space into
    256^3 cells, far more than any realistic file count needs.  Adding
    dimensions at fixed ``bits`` widens each file's per-column min/max
    span (the curse of dimensionality is real for layout too) -- 2-4
    columns is the useful range, as in lakehouse engines.
    """
    n = len(cols)
    assert n >= 1 and len(ranges) == n
    assert n * bits <= 63, f"{n} cols x {bits} bits overflows a long key"
    normed = [
        _normalize_to_bits(
            F.col(c) if isinstance(c, str) else c, *rng, bits
        )
        for c, rng in zip(cols, ranges)
    ]
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, col in enumerate(normed):
            # bit i of column j -> key bit i*n + j: shift left by the
            # difference (i*n + j) - i
            key = key.bitwiseOR(
                F.shiftleft(col.bitwiseAND(F.lit(1 << i)), i * (n - 1) + j)
            )
    return key


def zorder_key_2d(
    col_a: Column | str,
    col_b: Column | str,
    a_range: tuple[float, float],
    b_range: tuple[float, float],
    bits: int = 8,
) -> Column:
    """Morton key for two columns (a's bit i lands at 2i, b's at 2i+1):
    the n=2 case of :func:`zorder_key`."""
    return zorder_key([col_a, col_b], [a_range, b_range], bits)


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    *cols: str,
    num_files: int = 16,
    bits: int = 8,
    ranges: list[tuple[float, float]] | None = None,
) -> None:
    """Write parquet tiled by the Z-order key of ``cols`` (2+ columns):
    every output file covers one locality cell, so footer min/max stats
    prune scans filtered on ANY of the clustered columns (asserted
    against the actual footers in tests/test_layout.py).  Bounds are
    computed with one tiny min/max aggregation unless the caller
    already has them (pass ``ranges``, one (lo, hi) per column, to
    skip the extra source scan); the key column is dropped from the
    output."""
    assert len(cols) >= 2, "z-ordering needs at least two columns"
    if ranges is None:
        bounds = df.agg(
            *[f for c in cols for f in (F.min(c), F.max(c))]
        ).collect()[0]
        if any(v is None for v in bounds):
            # empty source or an all-NULL cluster column: there is no
            # locality to encode, so write the rows (if any) unclustered
            # rather than crash on float(None) -- the operator-level
            # twin of the gate caller's guard (code-review r10)
            df.write.mode("overwrite").parquet(path)
            return
        ranges = [
            (float(bounds[2 * j]), float(bounds[2 * j + 1]))
            for j in range(len(cols))
        ]
    assert len(ranges) == len(cols)
    key = zorder_key(list(cols), ranges, bits)
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
