"""The corpus-curation CLI: null-text gate -> dedup -> quality filter
-> partitioned write as one invocation over a documents parquet table,
with stage accounting observed during the write job itself."""

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
    assert stats["null_text_dropped"] == 0  # fixture has no null text

    back = spark.read.parquet(out)
    # exact output schema: the input columns plus the two scoring
    # columns -- no classifier `keep` boolean that could contradict
    # the --min-score gate (review regression)
    assert set(back.columns) == {
        "doc_id", "text", "lang", "source", "n_chars", "n_tokens", "score"
    }
    assert back.count() == stats["written"]
    assert back.where(F.col("score") < 0.0).count() == 0
    # partitioned layout: one subdirectory per language
    langs = {r["lang"] for r in back.select("lang").distinct().collect()}
    for lang in langs:
        assert os.path.isdir(os.path.join(out, f"lang={lang}"))
    # dedup kept the lowest doc_id per exact text: no duplicate texts
    dup = back.groupBy("text").count().where(F.col("count") > 1).count()
    assert dup == 0


def test_curate_zero_survivors_and_null_text(spark, tmp_path):
    """A threshold that filters out everything must still succeed with
    written=0 (review regression: the old read-back of a _SUCCESS-only
    partitioned dir crashed on schema inference), and NULL-text rows
    are dropped WITH accounting, never silently."""
    from kmeans_with_mapreduce_cuda_spark.curate import main

    src = str(tmp_path / "in")
    spark.createDataFrame(
        [
            (1, "alpha beta", "en"),
            (2, None, "en"),
            (3, "alpha beta", "de"),
            # whitespace-only text would score a spurious fixed positive
            # 0.153 (the '' token's hash bucket) -- the blank gate must
            # drop it WITH accounting (code-review r10)
            (4, "   ", "en"),
        ],
        "doc_id bigint, text string, lang string",
    ).write.parquet(src)

    out = str(tmp_path / "none")
    stats = main(
        [src, out, "--min-score", "1e18", "--partition-by", "lang"],
        spark=spark,
    )
    assert stats == {
        "input_docs": 4,
        "null_text_dropped": 2,  # one NULL + one blank
        "near_dup_dropped": 0,
        "lsh_capped_bands": 0,
        "after_dedup": 1,  # docs 1 and 3 share text -> one survivor
        "written": 0,
    }

    out2 = str(tmp_path / "all")
    stats2 = main([src, out2, "--min-score=-1e18"], spark=spark)
    assert stats2["written"] == 1
    assert [r["doc_id"] for r in spark.read.parquet(out2).collect()] == [1]


def test_curate_matches_classifier_query(spark, tmp_path):
    """The CLI's scoring columns are the same expressions as the
    pipe_quality_classifier gate query -- scores must agree per doc."""
    from kmeans_with_mapreduce_cuda_spark.curate import curate
    from kmeans_with_mapreduce_cuda_spark.plans import REGISTRY
    from kmeans_with_mapreduce_cuda_spark.sources.readers import load_table

    docs = load_table(spark, SF_DIR, "documents")
    plan = curate(docs, min_score=float("-inf"))
    want = {
        r["doc_id"]: r["score"]
        for r in REGISTRY["pipe_quality_classifier"].fn(spark, SF_DIR).collect()
    }
    got = {r["doc_id"]: r["score"] for r in plan.survivors.collect()}
    assert set(got) <= set(want)
    for did, s in got.items():
        assert s == want[did], did


def test_curate_near_dup_stage(spark, tmp_path):
    """--near-dup-threshold drops non-canonical members of near-dup
    CLUSTERS (A~B and B~C collapse to one survivor, the min doc_id),
    exact duplicates having already been removed by the exact stage;
    unrelated docs pass through.  Off by default (second run keeps all
    distinct texts)."""
    from kmeans_with_mapreduce_cuda_spark.curate import main

    base = ("spark shuffles keyed rows across executors during wide "
            "transformations and joins of large tables")
    near1 = base.replace("executors", "workers")        # ~0.8 jaccard to base
    near2 = base.replace("large", "huge")               # ~0.8 to base, chain
    other = ("completely unrelated text about parquet row groups and "
             "column statistics pruning for selective scans today ok")
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, base, "en"), (2, base, "en"),        # exact dup of 1
         (3, near1, "en"), (4, near2, "en"),      # near-dup chain with 1
         (5, other, "en")],
        "doc_id bigint, text string, lang string",
    ).write.parquet(src)

    out = str(tmp_path / "near")
    stats = main(
        [src, out, "--near-dup-threshold", "0.5"], spark=spark
    )
    assert stats["after_dedup"] == 2  # {1, 5}
    assert stats["near_dup_dropped"] == 2  # 3 and 4 fold into 1's cluster
    kept = sorted(
        r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()
    )
    assert kept == [1, 5]

    out2 = str(tmp_path / "off")
    stats2 = main([src, out2], spark=spark)
    assert stats2["after_dedup"] == 4  # only the exact dup removed
    assert stats2["near_dup_dropped"] == 0


def test_curate_refuses_reserved_columns(spark):
    """The scoring stage appends n_tokens/score/keep; a pre-existing
    column of those names would be ambiguous (score) or silently
    deleted (keep) -- the contract is a READABLE refusal up front
    (code-review r10)."""
    import pytest

    from kmeans_with_mapreduce_cuda_spark.curate import curate

    docs = spark.createDataFrame(
        [(1, "alpha beta", 0.9)], "doc_id bigint, text string, score double"
    )
    with pytest.raises(ValueError, match="score"):
        curate(docs)


def test_curate_files_flag_bounds_partitioned_output(spark, tmp_path):
    """--files with --partition-by must hash-partition BY the partition
    column: round-robin would emit up to files x n_values small files
    (code-review r10).  With one file per lang value, each lang dir
    holds exactly one data file."""
    import glob
    import os

    from kmeans_with_mapreduce_cuda_spark.curate import main

    src = str(tmp_path / "in")
    rows = [(i, f"doc number {i} unique tokens", f"l{i % 5}") for i in range(50)]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string"
    ).write.parquet(src)

    out = str(tmp_path / "out")
    stats = main(
        [src, out, "--min-score=-1e18", "--partition-by", "lang", "--files", "16"],
        spark=spark,
    )
    assert stats["written"] == 50
    for lang_dir in glob.glob(os.path.join(out, "lang=*")):
        files = glob.glob(os.path.join(lang_dir, "*.parquet"))
        assert len(files) == 1, lang_dir
