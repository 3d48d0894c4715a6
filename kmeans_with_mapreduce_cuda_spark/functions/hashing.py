"""Deterministic, engine-portable hashing Column expressions.

Everything is built on md5 so the exact same value is computable in
ANSI SQL (DuckDB oracle): Spark ``conv(substr(md5(s),1,8),16,10)`` ==
DuckDB ``('0x' || substr(md5(s),1,8))::BIGINT``.  Spark's native
``hash()``/``xxhash64`` are faster but engine-specific; they are fine for
internal bucketing (used by dedup LSH banding at scale) but never inside
an oracle-checked value column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def md5_long(col: Column | str, salt: str = "") -> Column:
    """First 8 hex digits of md5(salt || value) as a non-negative bigint
    in [0, 2^32).  Portable to any SQL engine with md5.
    """
    s = _c(col).cast("string")
    if salt:
        s = F.concat(F.lit(salt), s)
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")


def md5_long_sql(expr: str, salt: str = "") -> str:
    """DuckDB twin of :func:`md5_long` as a SQL fragment."""
    inner = f"'{salt}' || CAST({expr} AS VARCHAR)" if salt else f"CAST({expr} AS VARCHAR)"
    return f"CAST(('0x' || substr(md5({inner}), 1, 8)) AS BIGINT)"


def stable_sample_key(col: Column | str, seed: int = 42) -> Column:
    """Deterministic pseudo-random ordering key for a column: replaces the
    reference's wall-clock-seeded sampler (random_num_generator.hpp:17-28,
    with its inclusive-bound off-by-one) with a seeded, reproducible,
    engine-portable order.  ``ORDER BY stable_sample_key(id) LIMIT k`` is a
    uniform-without-replacement k-sample.
    """
    return md5_long(col, salt=f"seed{seed}:")


def minhash_signature(
    shingles: Column | str, num_hashes: int = 16, seed: int = 42
) -> Column:
    """MinHash signature of an array<string> shingle column.

    One md5-derived hash family per row of the signature:
    ``h_i(s) = md5_long(s, salt=i)``; the signature element is
    ``min_{s in shingles} h_i(s)``.  Pure higher-order expressions
    (TRANSFORM + ARRAY_MIN), no UDF, fully codegen'd.
    """
    arr = _c(shingles)

    def hash_fn(i: int):
        # NB: a factory, not a default-arg lambda -- PySpark calls 2-param
        # lambdas as (element, index), which would clobber the salt.
        salt = f"mh{seed}_{i}:"
        return lambda s: F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), s)), 1, 8), 16, 10
        ).cast("bigint")

    sig = [
        F.array_min(F.transform(arr, hash_fn(i))) for i in range(num_hashes)
    ]
    return F.array(*sig)
