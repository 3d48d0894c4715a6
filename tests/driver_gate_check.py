#!/usr/bin/env python
"""Dry-run of the driver's t2 correctness gate at sf0.01 with a PLAIN
default SparkSession (no engine-tuned confs) -- catches conf-dependence
and sf-dependence the sf0.001 pytest gate can't.

Usage: python tests/driver_gate_check.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import __spark_entry__ as entrymod  # noqa: E402
from canon_util import canon  # noqa: E402
from kmeans_with_mapreduce_cuda_spark.sources.readers import TABLES  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    spark = (
        SparkSession.builder.appName("driver-gate-dryrun")
        .master("local[8]")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    for name in sorted(qs):
        try:
            df = qs[name](spark, SF_DIR)
            cols = df.columns
            rows = df.collect()
            if name not in osql:
                print(f"  rows-only {name}: {len(rows)} rows")
                continue
            cur = con.execute(osql[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            if sorted(cols) != sorted(ocols):
                failed.append((name, f"columns {sorted(cols)} != {sorted(ocols)}"))
                continue
            if len(rows) != len(orows):
                failed.append((name, f"rowcount {len(rows)} != {len(orows)}"))
                continue
            g = canon(cols, [tuple(r) for r in rows])
            e = canon(ocols, orows)
            if g != e:
                bad = next(i for i, (a, b) in enumerate(zip(g, e)) if a != b)
                failed.append((name, f"values differ at sorted row {bad}:\n"
                                     f"    spark : {g[bad]}\n    duckdb: {e[bad]}"))
            else:
                print(f"  OK {name}: {len(rows)} rows")
        except Exception as exc:  # noqa: BLE001
            failed.append((name, f"EXCEPTION {type(exc).__name__}: {exc}"))

    print()
    if failed:
        for name, why in failed:
            print(f"FAIL {name}: {why}")
        sys.exit(1)
    print(f"all {len(qs)} queries pass at {SF_DIR}")
    spark.stop()


if __name__ == "__main__":
    main()
