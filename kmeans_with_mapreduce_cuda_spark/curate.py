"""Corpus-curation CLI: the batch entry point a training-data team
actually runs, chaining the pipeline operators end-to-end over a
documents parquet table:

    python -m kmeans_with_mapreduce_cuda_spark.curate \
        /data/documents.parquet /out/curated \
        [--min-score 0.0] [--partition-by lang] [--files 16]

Stages, all one declarative plan executed by a single write job:
  1. drop NULL-text rows (counted -- a curation tool must never lose
     documents silently);
  2. exact dedup, keep lowest doc_id per content hash
     (operators.dedup.exact_dedup_keep_first);
  3. hashed-linear quality score >= --min-score
     (the pipe_quality_classifier expressions, shared via
     functions.text.quality_score_cols);
  4. partitioned parquet write of the survivors.

Stage accounting rides the write job itself via ``Observation``
metrics -- zero re-executed shuffles -- plus one parquet metadata count
for the input.  Everything is a JVM expression or digest-keyed shuffle,
no Python UDFs, no collect of data-scale results, so the same
invocation shape runs unchanged on a 1000-executor cluster.  This
surface has no reference twin (the reference binary is K-Means only);
it exists because the north-star extensions make the engine a corpus
tool.
"""

from __future__ import annotations

import argparse
from typing import NamedTuple

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


class CuratePlan(NamedTuple):
    """The assembled curation chain plus its ride-along metrics.

    survivors     the frame to write (deduped, scored, filtered)
    deduped       post-dedup frame (pre-filter), for library callers
    obs_valid     Observation -> {"n": rows after the NULL-text gate}
    obs_scored    Observation -> {"after_dedup": ..., "written": ...}

    Observations only materialize when ``survivors`` is used in an
    action; library callers that never run one can ignore them.
    """

    survivors: DataFrame
    deduped: DataFrame
    obs_valid: Observation
    obs_scored: Observation


def curate(docs: DataFrame, min_score: float = 0.0) -> CuratePlan:
    """Assemble the curation chain (lazy; see CuratePlan)."""
    from .functions.text import quality_score_cols
    from .operators.dedup import exact_dedup_keep_first

    obs_valid = Observation()
    obs_scored = Observation()
    valid = docs.where(F.col("text").isNotNull()).observe(
        obs_valid, F.count(F.lit(1)).alias("n")
    )
    deduped = exact_dedup_keep_first(valid)
    keep = F.col("score") >= min_score
    # n_tokens + score only: quality_score_cols also carries the
    # classifier's own `keep` (margin > 0) boolean, which would
    # contradict an explicit --min-score gate in the written output.
    scored = (
        deduped.select("*", *quality_score_cols("text"))
        .drop("keep")
        .observe(
            obs_scored,
            F.count(F.lit(1)).alias("after_dedup"),
            F.sum(keep.cast("int")).alias("written"),
        )
    )
    return CuratePlan(scored.where(keep), deduped, obs_valid, obs_scored)


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

    try:
        docs = spark.read.parquet(args.input)
        plan = curate(docs, min_score=args.min_score)

        writer = plan.survivors.repartition(args.files).write.mode("overwrite")
        if args.partition_by:
            writer = writer.partitionBy(args.partition_by)
        writer.parquet(args.output)

        # input count is parquet-footer metadata; everything else was
        # observed DURING the write -- no stage shuffle runs twice.
        n_input = docs.count()
        try:
            n_valid = plan.obs_valid.get.get("n", 0) or 0
            scored_metrics = dict(plan.obs_scored.get)
        except Exception:
            # Spark quirk (verified on 4.1): when repartition +
            # partitionBy combine with ZERO surviving rows, AQE
            # propagates the empty relation over the CollectMetrics
            # nodes and the observations never materialize -- .get then
            # fails JVM-side.  Recompute with explicit jobs; this only
            # triggers in the degenerate near-empty case.
            n_valid = docs.where(F.col("text").isNotNull()).count()
            from .functions.text import quality_score_cols

            row = (
                plan.deduped.select(*quality_score_cols("text"))
                .agg(
                    F.count(F.lit(1)).alias("after_dedup"),
                    F.sum(
                        (F.col("score") >= args.min_score).cast("int")
                    ).alias("written"),
                )
                .collect()[0]
            )
            scored_metrics = row.asDict()
        stats = {
            "input_docs": n_input,
            "null_text_dropped": n_input - n_valid,
            "after_dedup": scored_metrics.get("after_dedup", 0) or 0,
            "written": scored_metrics.get("written", 0) or 0,
        }
        print(
            f"curate: {stats['input_docs']} docs in, "
            f"{stats['null_text_dropped']} null-text dropped, "
            f"{stats['after_dedup']} after exact dedup, "
            f"{stats['written']} written to {args.output} "
            f"(min_score={args.min_score})"
        )
        return stats
    finally:
        if own_session:
            spark.stop()


if __name__ == "__main__":
    main()
