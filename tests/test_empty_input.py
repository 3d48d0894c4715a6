"""Empty-input robustness: every representative query family must
return an empty result with the right schema on zero-row tables --
not throw.  A 100 TB pipeline routinely hits empty partitions, empty
date slices, and freshly-created tables.
"""

from __future__ import annotations

import pytest

from kmeans_with_mapreduce_cuda_spark.plans import REGISTRY
from kmeans_with_mapreduce_cuda_spark.sources.readers import TABLES, load_table

from conftest import SF_DIR

#: one query per family; all should tolerate empty input
QUERIES = [
    "rel_filter_agg",
    "rel_join_shuffle",
    "rel_window_topk",
    "rel_grouping_sets",
    "dedup_exact_keep",
    "dedup_minhash_lsh",
    "text_token_stats",
    "text_repetition_ratio",
    "pipe_train_val_test",
    "pipe_token_packing",
    "udtf_shingles",
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        schema = load_table(spark, SF_DIR, t).schema
        spark.createDataFrame([], schema).write.mode("overwrite").parquet(
            str(root / f"{t}.parquet")
        )
    return str(root)


@pytest.mark.parametrize("name", QUERIES)
def test_query_on_empty_tables(spark, empty_sf_dir, name):
    df = REGISTRY[name].fn(spark, empty_sf_dir)
    assert df.count() == 0
    assert df.schema == REGISTRY[name].fn(spark, SF_DIR).schema
