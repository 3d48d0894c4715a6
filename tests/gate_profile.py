#!/usr/bin/env python
"""Profile the driver's t2 gate: time each query (Spark exec + collect,
then the DuckDB oracle) in REGISTRY order at sf0.01 on a plain local[8]
session, printing per-query and cumulative seconds.  This is the tool
for keeping all queries under the driver's wall-clock budget.

Usage: python tests/gate_profile.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod  # noqa: E402
from kmeans_with_mapreduce_cuda_spark.sources.readers import TABLES  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    spark = (
        SparkSession.builder.appName("gate-profile")
        .master("local[8]")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    cum = 0.0
    slow = []
    for i, name in enumerate(qs, 1):
        t0 = time.perf_counter()
        n = len(qs[name](spark, SF_DIR).collect())
        t_spark = time.perf_counter() - t0
        t1 = time.perf_counter()
        if name in osql:
            con.execute(osql[name]).fetchall()
        t_duck = time.perf_counter() - t1
        cum += t_spark + t_duck
        slow.append((t_spark + t_duck, name))
        print(
            f"{i:3d} {name:32s} spark={t_spark:6.2f}s duck={t_duck:5.2f}s "
            f"cum={cum:7.2f}s rows={n}"
        )
    print("\nslowest 15:")
    for t, name in sorted(slow, reverse=True)[:15]:
        print(f"  {t:6.2f}s {name}")
    spark.stop()


if __name__ == "__main__":
    main()
