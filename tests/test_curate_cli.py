"""The corpus-curation CLI: dedup -> quality filter -> partitioned
write as one invocation over a documents parquet table."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from conftest import SF_DIR


def test_curate_cli_end_to_end(spark, tmp_path):
    from kmeans_with_mapreduce_cuda_spark.curate import main

    out = str(tmp_path / "curated")
    stats = main(
        [os.path.join(SF_DIR, "documents.parquet"), out,
         "--min-score", "0.0", "--partition-by", "lang", "--files", "4"],
        spark=spark,
    )
    assert stats["input_docs"] >= stats["after_dedup"] >= stats["written"]
    assert stats["written"] > 0

    back = spark.read.parquet(out)
    # survivors carry the scoring columns and respect the threshold
    assert {"doc_id", "text", "n_tokens", "score", "lang"} <= set(back.columns)
    assert back.where(F.col("score") < 0.0).count() == 0
    # partitioned layout: one subdirectory per language
    langs = {r["lang"] for r in back.select("lang").distinct().collect()}
    for lang in langs:
        assert os.path.isdir(os.path.join(out, f"lang={lang}"))
    # dedup kept the lowest doc_id per exact text: no duplicate texts
    dup = back.groupBy("text").count().where(F.col("count") > 1).count()
    assert dup == 0


def test_curate_matches_classifier_query(spark, tmp_path):
    """The CLI's scoring columns are the same expressions as the
    pipe_quality_classifier gate query -- scores must agree per doc."""
    from kmeans_with_mapreduce_cuda_spark.curate import curate
    from kmeans_with_mapreduce_cuda_spark.plans import REGISTRY
    from kmeans_with_mapreduce_cuda_spark.sources.readers import load_table

    docs = load_table(spark, SF_DIR, "documents")
    survivors, _ = curate(docs, min_score=float("-inf"))
    want = {
        r["doc_id"]: r["score"]
        for r in REGISTRY["pipe_quality_classifier"].fn(spark, SF_DIR).collect()
    }
    got = {r["doc_id"]: r["score"] for r in survivors.collect()}
    assert set(got) <= set(want)
    for did, s in got.items():
        assert s == want[did], did
