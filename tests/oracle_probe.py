#!/usr/bin/env python
"""Targeted oracle probe: run NAMED registry queries against DuckDB on
an arbitrary fixture directory (the same canon comparison as
driver_gate_check, without sweeping all of them).

Usage:
    python tests/oracle_probe.py SF_DIR query1 [query2 ...]

SF_DIR needs only the parquet tables the chosen queries actually read
(missing tables are skipped at view registration).  This is the tool
for scale-fixture probes -- pair it with tests/make_scale_fixture.py.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import __spark_entry__ as entrymod  # noqa: E402
from canon_util import canon  # noqa: E402
from kmeans_with_mapreduce_cuda_spark.sources.readers import TABLES  # noqa: E402


def main() -> None:
    import os

    from pyspark.sql import SparkSession

    sf_dir, names = sys.argv[1], sys.argv[2:]
    assert names, "usage: oracle_probe.py SF_DIR query1 [query2 ...]"
    spark = (
        SparkSession.builder.appName("oracle-probe")
        .master("local[8]")
        .config("spark.ui.showConsoleProgress", "false")
        # beyond-sf0.1 fixtures: a plain 1g driver heap dies on the
        # heavier probes (JVM OOM-kill -> ConnectionRefused); opt into
        # a bigger heap with PROBE_DRIVER_MEM=8g etc.
        .config(
            "spark.driver.memory", os.environ.get("PROBE_DRIVER_MEM", "4g")
        )
        .getOrCreate()
    )
    con = duckdb.connect()
    # Beyond-sf0.1 fixtures can push DuckDB's window/string_agg stages
    # past RAM (observed: dedup_cdc_chunks at 100x) -- allow spilling
    # so oracle OOM doesn't masquerade as a query failure.
    con.execute("SET temp_directory='/tmp/duckdb_probe_spill'")
    con.execute("SET preserve_insertion_order=false")
    # DuckDB's default memory_limit is 80% of RAM, and its accounting
    # undercounts large list payloads: the 100x dedup_minhash_lsh
    # oracle ballooned to 115 GB RSS and drew the KERNEL oom-killer
    # (which takes out the whole probe, Spark included) before DuckDB
    # ever started spilling.  A hard cap well under physical RAM turns
    # that into disk spill instead.  Override per-run when a heavier
    # oracle genuinely needs more: PROBE_DUCKDB_MEM=64g.
    con.execute(
        f"SET memory_limit='{os.environ.get('PROBE_DUCKDB_MEM', '32g')}'"
    )
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    for name in names:
        if name not in qs:
            failed.append((name, "unknown query"))
            continue
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            cols, rows = df.columns, df.collect()
            cur = con.execute(osql[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            g = canon(cols, [tuple(r) for r in rows])
            e = canon(ocols, orows)
            if sorted(cols) != sorted(ocols):
                failed.append((name, f"columns {sorted(cols)} != {sorted(ocols)}"))
            elif g != e:
                bad = next(
                    (i for i, (a, b) in enumerate(zip(g, e)) if a != b), None
                )
                detail = f"rows {len(rows)} vs {len(orows)}, first diff {bad}"
                if bad is not None:
                    detail += f"\n    spark : {g[bad]}\n    duckdb: {e[bad]}"
                failed.append((name, detail))
            else:
                print(f"OK {name}: {len(rows)} rows, {time.time() - t0:.1f} s")
        except Exception as exc:  # noqa: BLE001
            failed.append((name, f"EXC {type(exc).__name__}: {exc}"))

    spark.stop()
    if failed:
        for name, why in failed:
            print(f"FAIL {name}: {why}")
        sys.exit(1)


if __name__ == "__main__":
    main()
