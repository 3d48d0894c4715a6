"""Skew handling: the reference sizes one reduction grid per cluster
(its "Loading Balancing", kmeans_mapreduce_core.cu:195-207 /
README.md:55-58).  Spark's analog is AQE skew-join splitting --
oversized shuffle partitions split into parallel subtasks at runtime --
asserted here end-to-end (salted_groupby, the explicit two-stage
aggregation for hot keys, is equality-tested in test_map_reduce.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kmeans_with_mapreduce_cuda_spark.sources.readers import load_table

from conftest import SF_DIR_MED


def test_aqe_splits_skewed_join_partition(spark):
    """90% of the fact side lands on one join key; AQE must mark the
    sort-merge join skew-handled (``skew=true``) in the final plan.

    Two scale-down knobs make the fixture trigger what a 100 TB run
    triggers naturally: thresholds shrunk to fixture size, and the
    input repartitioned to several map tasks FIRST -- AQE splits a
    skewed reduce partition by mapper ranges, so a single-mapper
    shuffle (one small parquet scan task) can never be split.
    forceOptimizeSkewedJoin because the downstream agg means the split
    introduces an extra shuffle, which AQE otherwise declines.
    """
    li = load_table(spark, SF_DIR_MED, "lineitem")
    skewed = li.repartition(8).select(
        F.when(F.rand(7) < 0.9, F.lit(1))
        .otherwise(F.col("l_orderkey"))
        .alias("k"),
        "l_extendedprice",
    )
    right = li.select(F.col("l_orderkey").alias("k"), "l_quantity").limit(5000)
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        j = skewed.join(right, "k").agg(F.sum("l_extendedprice"))
        j.collect()  # AQE decides at runtime -> inspect the FINAL plan
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
