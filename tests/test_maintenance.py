"""Table-maintenance sinks: dynamic partition overwrite (incremental
backfill) and small-file compaction -- the operational levers a
long-running 100 TB pipeline actually needs."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from kmeans_with_mapreduce_cuda_spark.sources import load_table
from kmeans_with_mapreduce_cuda_spark.sources.writers import (
    compact_small_files,
    overwrite_partitions_dynamic,
)

from conftest import SF_DIR


def test_dynamic_partition_overwrite_touches_only_written_partitions(
    spark, tmp_path
):
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    dest = str(tmp_path / "by_priority")
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(dest)
    before = {
        r["o_orderpriority"]: r["n"]
        for r in spark.read.parquet(dest)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    # backfill ONE priority with a filtered recompute (half the rows)
    target = sorted(before)[0]
    patch = o.where(
        (F.col("o_orderpriority") == target) & (F.col("o_orderkey") % 2 == 0)
    )
    n_patch = patch.count()
    overwrite_partitions_dynamic(patch, dest, ["o_orderpriority"])

    after = {
        r["o_orderpriority"]: r["n"]
        for r in spark.read.parquet(dest)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert after[target] == n_patch  # rewritten partition shrank
    for k in before:  # every OTHER partition is byte-for-byte intact
        if k != target:
            assert after[k] == before[k], k


def test_compact_small_files_reduces_file_count(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    dest = str(tmp_path / "shattered")
    # simulate the incremental-write shatter: 64 tiny files
    li.repartition(64).write.mode("overwrite").parquet(dest)
    shattered = len(glob.glob(os.path.join(dest, "part-*.parquet")))
    assert shattered >= 64

    before_rows = spark.read.parquet(dest).count()
    before_sum = (
        spark.read.parquet(dest).agg(F.sum("l_quantity")).collect()[0][0]
    )
    n = compact_small_files(spark, dest, target_file_bytes=1024 * 1024)
    compacted = len(glob.glob(os.path.join(dest, "part-*.parquet")))
    assert compacted == n
    assert compacted < shattered / 4  # real consolidation
    assert not os.path.exists(dest + ".compact.tmp")
    assert not os.path.exists(dest + ".compact.old")

    back = spark.read.parquet(dest)
    assert back.count() == before_rows
    assert back.agg(F.sum("l_quantity")).collect()[0][0] == before_sum


def test_compact_small_files_recovers_interrupted_swap(spark, tmp_path):
    """Crash-window recovery (round-3 advice): a compaction that died
    between its two renames leaves the data in .compact.old and nothing
    at path; the next call must restore it and complete normally."""
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    dest = str(tmp_path / "interrupted")
    li.repartition(16).write.mode("overwrite").parquet(dest)
    before_rows = spark.read.parquet(dest).count()

    # simulate the crash: first rename done, second never happened,
    # plus a stale tmp dir from the dead run
    os.rename(dest, dest + ".compact.old")
    os.makedirs(dest + ".compact.tmp", exist_ok=True)
    assert not os.path.exists(dest)

    n = compact_small_files(spark, dest, target_file_bytes=1024 * 1024)
    assert n >= 1
    assert not os.path.exists(dest + ".compact.old")
    assert spark.read.parquet(dest).count() == before_rows


def test_compact_small_files_cleans_leftover_old_copy(spark, tmp_path):
    """The other crash window: compaction died AFTER swapping in the
    compacted data but before removing .compact.old.  The next call
    must discard the stale copy and proceed normally."""
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    dest = str(tmp_path / "post_swap")
    li.repartition(16).write.mode("overwrite").parquet(dest)
    before_rows = spark.read.parquet(dest).count()

    # simulate: both renames done, cleanup never ran
    li.limit(10).write.mode("overwrite").parquet(dest + ".compact.old")

    n = compact_small_files(spark, dest, target_file_bytes=1024 * 1024)
    assert n >= 1
    assert not os.path.exists(dest + ".compact.old")
    assert spark.read.parquet(dest).count() == before_rows


def test_schema_evolution_merge_read(spark, tmp_path):
    """Long-running pipelines add columns over time; readers must merge
    footer schemas across file generations (old files yield NULL for
    columns they predate) and pushdown must still reach both
    generations.  This is the mergeSchema contract our maintenance
    surface relies on -- pinned here so an engine upgrade can't drop it
    silently."""
    dest = str(tmp_path / "evolving")
    o = load_table(spark, SF_DIR, "orders")
    gen1 = o.select("o_orderkey", "o_totalprice").where(
        F.col("o_orderkey") % 2 == 0
    )
    gen1.write.mode("append").parquet(dest)
    gen2 = o.select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    ).where(F.col("o_orderkey") % 2 == 1)
    gen2.write.mode("append").parquet(dest)

    merged = spark.read.option("mergeSchema", "true").parquet(dest)
    assert set(merged.columns) == {
        "o_orderkey", "o_totalprice", "o_orderpriority"
    }
    n_total = o.count()
    assert merged.count() == n_total
    # old-generation rows surface the new column as NULL
    nulls = merged.where(F.col("o_orderpriority").isNull()).count()
    assert nulls == gen1.count()
    # predicate over the evolved column still prunes correctly
    urgent = merged.where(F.col("o_orderpriority") == "1-URGENT").count()
    exp = gen2.where(F.col("o_orderpriority") == "1-URGENT").count()
    assert urgent == exp
