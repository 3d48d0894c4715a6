"""Sinks.  The reference prints centroids as ``Point: (x,y)`` and appends
the same lines to ``<input>.output`` (kmeans_with_mapreduce-cuda.cu:105-121,
operator<< config.cuh:21-25).  Spark-first: a format_string projection +
``df.write.text`` -- formatting stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def format_centroids(df: DataFrame, x: str = "x", y: str = "y") -> DataFrame:
    """Project to the reference's sink format: one string column ``line``
    per centroid, ``Point: (x,y)`` with integer-truncated coords (the
    reference stores uint64 coords; we truncate the float mean the same
    way a cast would).
    """
    return df.select(
        F.format_string(
            "Point: (%d,%d)",
            F.col(x).cast("bigint"),
            F.col(y).cast("bigint"),
        ).alias("line")
    )


def write_centroids_text(df: DataFrame, path: str, x: str = "x", y: str = "y") -> None:
    """Write k centroid lines as text (k is tiny -> single partition)."""
    format_centroids(df, x, y).coalesce(1).write.mode("overwrite").text(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Hive-style partitioned parquet sink (e.g. the IVF index persisted
    BY cell_id, or assignments BY cluster_id): readers filtering on the
    partition column prune whole directories -- the scan never opens
    non-matching files.  Partition pruning is asserted in
    tests/test_sources.py."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
