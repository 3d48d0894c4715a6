"""The generic (mapper, reducer) UDF surface must reproduce the native
Column-expression K-Means step exactly."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from kmeans_with_mapreduce_cuda_spark.operators.kmeans import assign_2d, update_2d
from kmeans_with_mapreduce_cuda_spark.operators.map_reduce import (
    kmeans_step_mapreduce,
    map_reduce,
)
from kmeans_with_mapreduce_cuda_spark.sources.readers import points_xy

from conftest import SF_DIR

INIT4 = [(10.0, 20000.0), (25.0, 50000.0), (40.0, 80000.0), (15.0, 95000.0)]


def test_mapreduce_step_equals_native(spark):
    pts = points_xy(spark, SF_DIR).cache()
    native = {
        int(r["cluster_id"]): (r["cx"], r["cy"], r["n"])
        for r in update_2d(assign_2d(pts, INIT4)).collect()
    }
    hook = {
        int(r["cluster_id"]): (r["cx"], r["cy"], r["n"])
        for r in kmeans_step_mapreduce(pts, INIT4).collect()
    }
    assert native.keys() == hook.keys()
    for cid in native:
        nx, ny, nn = native[cid]
        hx, hy, hn = hook[cid]
        assert nn == hn
        assert np.isclose(nx, hx, rtol=1e-12)
        assert np.isclose(ny, hy, rtol=1e-12)


def test_mapper_multi_emit(spark):
    """Mapper may emit several pairs per row (NUM_PAIRS>1 fan-out)."""
    import pandas as pd

    df = spark.range(10).select(F.col("id").cast("long"))

    def mapper(pdf):
        return pd.DataFrame(
            {
                "key": list(pdf["id"] % 2) * 2,
                "v": list(pdf["id"]) + list(pdf["id"] * 10),
            }
        )

    def reducer(g):
        return pd.DataFrame(
            {"key": [int(g["key"].iloc[0])], "total": [int(g["v"].sum())]}
        )

    out = {
        r["key"]: r["total"]
        for r in map_reduce(
            df, mapper, reducer, "key int, v long", "key int, total long"
        ).collect()
    }
    evens = sum(i for i in range(10) if i % 2 == 0)
    odds = sum(i for i in range(10) if i % 2 == 1)
    assert out == {0: evens + evens * 10, 1: odds + odds * 10}
