"""Data-layout keys: Z-order (Morton) interleaving as a pure Column
expression.

Range-clustering one column (sources.writers.write_range_clustered)
gives perfect pruning on THAT column and none on any other.  A Z-order
key interleaves the bits of two normalized columns, so sorting by it
tiles the (a, b) plane into locality squares: every output file then
has a NARROW min/max range on BOTH columns, and parquet footer
statistics prune scans filtered on either one.  This is how
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


def zorder_key_2d(
    col_a: Column | str,
    col_b: Column | str,
    a_range: tuple[float, float],
    b_range: tuple[float, float],
    bits: int = 8,
) -> Column:
    """Morton key for two columns: normalize each to ``bits`` bits, then
    interleave (a's bit i lands at 2i, b's at 2i+1).

    ``a_range`` / ``b_range`` are the (min, max) of each column --
    pass known domain bounds or a one-time ``agg(min, max)`` result;
    stale bounds only degrade clustering quality, never correctness
    (values clamp).  bits=8 tiles the plane into 256x256 cells, far
    more than any realistic file count needs.
    """
    a = _normalize_to_bits(
        F.col(col_a) if isinstance(col_a, str) else col_a, *a_range, bits
    )
    b = _normalize_to_bits(
        F.col(col_b) if isinstance(col_b, str) else col_b, *b_range, bits
    )
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(a.bitwiseAND(F.lit(1 << i)), i)
        ).bitwiseOR(F.shiftleft(b.bitwiseAND(F.lit(1 << i)), i + 1))
    return key


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    num_files: int = 16,
    bits: int = 8,
) -> None:
    """Write parquet tiled by the Z-order key of (col_a, col_b): every
    output file covers one locality square, so footer min/max stats
    prune scans filtered on EITHER column (asserted against the actual
    footers in tests/test_layout.py).  Bounds are computed with one
    tiny min/max aggregation; the key column is dropped from the
    output."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).collect()[0]
    key = zorder_key_2d(
        col_a,
        col_b,
        (float(lo_a), float(hi_a)),
        (float(lo_b), float(hi_b)),
        bits,
    )
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
