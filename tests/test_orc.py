"""ORC source/sink: type-exact round-trip, codec selection, and the
scan-side pushdown/pruning guarantees rel_orc_roundtrip's doc claims."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F


def _plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_orc_roundtrip_preserves_types_and_values(spark, tmp_path):
    dest = str(tmp_path / "orc_rt")
    src = spark.createDataFrame(
        [(1, "a", 1.5, True), (2, "b", -0.25, False)],
        "k long, s string, v double, b boolean",
    ).withColumn("ts", F.to_timestamp(F.lit("2024-02-29 12:34:56")))
    src.write.mode("overwrite").option("compression", "zlib").orc(dest)
    back = spark.read.orc(dest)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.collect())
    )


def test_orc_writes_zlib_files(spark, tmp_path):
    dest = str(tmp_path / "orc_codec")
    spark.range(10).write.option("compression", "zlib").orc(dest)
    files = glob.glob(os.path.join(dest, "part-*.orc"))
    assert files and all(".zlib." in os.path.basename(f) for f in files)


def test_orc_scan_pushes_filter_and_prunes_columns(spark, tmp_path):
    dest = str(tmp_path / "orc_scan")
    spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        F.lit("pad").alias("unused"),
    ).write.orc(dest)
    df = spark.read.orc(dest).where(F.col("k") > 90).select("k", "v")
    plan = _plan_of(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "k" in pushed[0], plan
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and "unused" not in read[0], plan
