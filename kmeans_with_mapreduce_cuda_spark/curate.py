"""Corpus-curation CLI: the batch entry point a training-data team
actually runs, chaining the pipeline operators end-to-end over a
documents parquet table:

    python -m kmeans_with_mapreduce_cuda_spark.curate \
        /data/documents.parquet /out/curated \
        [--min-score 0.0] [--partition-by lang] [--files 16]

Stages (one declarative plan, executed by a single write job):
  1. exact dedup, keep lowest doc_id per content hash
     (operators.dedup.exact_dedup_keep_first);
  2. hashed-linear quality score >= --min-score
     (the pipe_quality_classifier expression);
  3. partitioned parquet write of the survivors plus a printed
     per-stage accounting summary.

Everything is a JVM expression or digest-keyed shuffle -- no Python
UDFs, no collect of data-scale results -- so the same invocation
shape runs unchanged on a 1000-executor cluster.  This surface has no
reference twin (the reference binary is K-Means only); it exists
because the north-star extensions make the engine a corpus tool.
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def quality_score_cols(text_col: str = "text") -> list:
    """The pipe_quality_classifier scoring expressions as reusable
    columns: (n_tokens bigint, score double)."""
    from .functions.text import hashed_linear_margin, tokens

    m = hashed_linear_margin(text_col)
    n_tok = F.size(tokens(text_col))
    return [
        n_tok.cast("bigint").alias("n_tokens"),
        (m / (1000.0 * n_tok)).alias("score"),
    ]


def curate(
    docs: DataFrame, min_score: float = 0.0
) -> tuple[DataFrame, DataFrame]:
    """(survivors, deduped) -- survivors carry n_tokens + score."""
    from .operators.dedup import exact_dedup_keep_first

    deduped = exact_dedup_keep_first(docs)
    scored = deduped.select("*", *quality_score_cols("text"))
    return scored.where(F.col("score") >= min_score), deduped


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="kmeans_with_mapreduce_cuda_spark.curate"
    )
    p.add_argument("input", help="documents parquet path (doc_id, text, ...)")
    p.add_argument("output", help="output directory for curated parquet")
    p.add_argument("--min-score", type=float, default=0.0)
    p.add_argument(
        "--partition-by",
        default=None,
        help="optional column to partition the output by (e.g. lang)",
    )
    p.add_argument("--files", type=int, default=16)
    return p


def main(
    argv: list[str] | None = None, spark: SparkSession | None = None
) -> dict[str, int]:
    """Run the curation chain; returns the stage counts (for tests)."""
    args = build_parser().parse_args(argv)
    own_session = spark is None
    if own_session:
        from .session import get_spark

        spark = get_spark(app_name="curate-cli")

    docs = spark.read.parquet(args.input)
    survivors, deduped = curate(docs, min_score=args.min_score)

    writer = survivors.repartition(args.files).write.mode("overwrite")
    if args.partition_by:
        writer = writer.partitionBy(args.partition_by)
    writer.parquet(args.output)

    # counts read back from the written result -- one extra metadata-cheap
    # job, and the numbers describe what actually landed on disk
    stats = {
        "input_docs": docs.count(),
        "after_dedup": deduped.count(),
        "written": spark.read.parquet(args.output).count(),
    }
    print(
        f"curate: {stats['input_docs']} docs in, "
        f"{stats['after_dedup']} after exact dedup, "
        f"{stats['written']} written to {args.output} "
        f"(min_score={args.min_score})"
    )
    if own_session:
        spark.stop()
    return stats


if __name__ == "__main__":
    main()
