#!/usr/bin/env python
"""Build an N-times-replicated scale fixture from sf0.1 (the probe
recipe recorded in NOTES.md): verbatim text/vectors with per-replica
key offsets, event timestamps shifted +replica microseconds to break
ties, and orders+lineitem sharing one orderkey offset so join pairs
replicate cleanly.  Verbatim replication is a deliberately ADVERSARIAL
dedup stress -- every document becomes an N-way exact duplicate.

Usage:
    python tests/make_scale_fixture.py OUT_DIR N [table ...]

Default tables: documents embeddings events.  Also supported: orders,
lineitem (offset), customer/nation/region/supplier/part (verbatim
copies -- dimensions stay dimension-sized at any corpus scale).
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

REPLICATED = {
    "documents": """
        SELECT doc_id + r * 1000000 AS doc_id, text, lang, source, n_chars
        FROM read_parquet('{src}/documents.parquet')
        CROSS JOIN (SELECT unnest(range({n})) AS r) ORDER BY doc_id
    """,
    "embeddings": """
        SELECT vec_id + r * 1000000 AS vec_id, embedding, label
        FROM read_parquet('{src}/embeddings.parquet')
        CROSS JOIN (SELECT unnest(range({n})) AS r) ORDER BY vec_id
    """,
    "events": """
        SELECT event_id + r * 10000000 AS event_id,
               ts + to_microseconds(CAST(r AS BIGINT)) AS ts,
               user_id, event_type, value, props
        FROM read_parquet('{src}/events.parquet')
        CROSS JOIN (SELECT unnest(range({n})) AS r) ORDER BY event_id
    """,
    "orders": """
        SELECT o_orderkey + r * 10000000 AS o_orderkey,
               o.* EXCLUDE (o_orderkey)
        FROM read_parquet('{src}/orders.parquet') o
        CROSS JOIN (SELECT unnest(range({n})) AS r) ORDER BY o_orderkey
    """,
    "lineitem": """
        SELECT l_orderkey + r * 10000000 AS l_orderkey, l.* EXCLUDE (l_orderkey)
        FROM read_parquet('{src}/lineitem.parquet') l
        CROSS JOIN (SELECT unnest(range({n})) AS r) ORDER BY l_orderkey
    """,
}

VERBATIM = {"customer", "nation", "region", "supplier", "part"}


def main() -> None:
    out, n = sys.argv[1], int(sys.argv[2])
    tables = sys.argv[3:] or ["documents", "embeddings", "events"]
    os.makedirs(out, exist_ok=True)
    for t in tables:
        dest = os.path.join(out, f"{t}.parquet")
        if t in REPLICATED:
            sql = REPLICATED[t].format(src=SRC, n=n)
            duckdb.sql(f"COPY ({sql}) TO '{dest}' (FORMAT PARQUET)")
        elif t in VERBATIM:
            shutil.copy(os.path.join(SRC, f"{t}.parquet"), dest)
        else:
            raise SystemExit(f"unknown table {t}")
        cnt = duckdb.sql(f"SELECT count(*) FROM '{dest}'").fetchone()[0]
        print(f"{t}: {cnt} rows -> {dest}")


if __name__ == "__main__":
    main()
