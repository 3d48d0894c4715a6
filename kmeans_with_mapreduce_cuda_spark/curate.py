"""Corpus-curation CLI: the batch entry point a training-data team
actually runs, chaining the pipeline operators end-to-end over a
documents parquet table:

    python -m kmeans_with_mapreduce_cuda_spark.curate \
        /data/documents.parquet /out/curated \
        [--min-score 0.0] [--partition-by lang] [--files 16]

Stages, all one declarative plan executed by a single write job:
  1. drop NULL- and blank-text rows (counted -- a curation tool must
     never lose documents silently, and a whitespace-only doc would
     otherwise take a spurious fixed positive quality score);
  2. exact dedup, keep lowest doc_id per content hash
     (operators.dedup.exact_dedup_keep_first);
  2b. optional near-dedup (--near-dup-threshold): MinHash/LSH candidate
     pairs at est_jaccard >= threshold, resolved into duplicate
     clusters by connected components, non-canonical members dropped
     (the dedup_survivors chain).  This stage is inherently ITERATIVE
     (label propagation), so enabling it runs its jobs at assembly
     time; the final filter is still a broadcast anti-join riding the
     write;
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
    near_dup_dropped  docs removed by the optional near-dup stage
                  (0 when the stage is off)
    lsh_capped_bands  band buckets the LSH skew guard excluded from
                  pair generation (LshPairs.capped_buckets contract:
                  surfaced, never silent; 0 when nothing was capped
                  or the stage is off)
    deps          persisted frames the caller must unpersist AFTER the
                  final action (the near-dup drop list rides the write
                  as a broadcast; empty when the stage is off)

    Observations only materialize when ``survivors`` is used in an
    action; library callers that never run one can ignore them.
    """

    survivors: DataFrame
    deduped: DataFrame
    obs_valid: Observation
    obs_scored: Observation
    near_dup_dropped: int = 0
    lsh_capped_bands: int = 0
    # tuple, not list: a mutable NamedTuple default is one shared object
    # across every default-constructed instance (code-review r10)
    deps: tuple = ()


def _near_dup_drop_list(deduped: DataFrame, threshold: float):
    """Non-canonical near-dup cluster members of ``deduped``.

    minhash_lsh_pairs -> est_jaccard >= threshold -> connected
    components -> every node that is not its cluster's min-id label.
    Returns (persisted drop-list DataFrame, n_dropped, n_capped_bands);
    the caller unpersists after its final action.  n_capped_bands
    honors LshPairs.capped_buckets' surface-to-caller contract (a
    capped band means near-dups in it may go undetected -- the CLI
    must say so, never stay silent; code-review r10).  Candidate pairs
    and the CC labels are bounded by the duplicate population, not the
    corpus, so persisting them (and broadcasting the drop list
    downstream) is the dedup_survivors scale contract.
    """
    from .operators.dedup import connected_components, minhash_lsh_pairs

    res = minhash_lsh_pairs(deduped)
    n_capped = res.capped_buckets.count()
    pairs = (
        res.pairs.where(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b")
        .persist()
    )
    try:
        n_pairs = pairs.count()
        if n_pairs == 0:
            pairs.unpersist()
            return None, 0, n_capped
        comp = connected_components(pairs)
        dupes = comp.labels.where(F.col("node") != F.col("comp")).select(
            "node"
        ).persist()
        n_dropped = dupes.count()
        for d in comp.deps:
            d.unpersist()
        return dupes, n_dropped, n_capped
    finally:
        for d in res.deps:
            d.unpersist()
        pairs.unpersist()


def curate(
    docs: DataFrame,
    min_score: float = 0.0,
    near_dup_threshold: float | None = None,
) -> CuratePlan:
    """Assemble the curation chain (lazy except the optional near-dup
    stage, which is iterative by nature; see CuratePlan)."""
    from .functions.text import quality_score_cols
    from .operators.dedup import exact_dedup_keep_first

    # The scoring stage appends these columns; a pre-existing column of
    # the same name would make every downstream F.col("score") reference
    # ambiguous (AnalysisException at write time) -- or, for "keep",
    # silently DELETE the user's column via the drop below.  Refuse
    # loudly up front (code-review r10).
    reserved = {"n_tokens", "score", "keep"} & set(docs.columns)
    if reserved:
        raise ValueError(
            f"input already has column(s) {sorted(reserved)}, which the "
            "quality-scoring stage reserves; rename them before curating"
        )

    obs_valid = Observation()
    obs_scored = Observation()
    # Gate blank text along with NULL: an empty/whitespace-only doc
    # tokenizes to [''] whose single hashed bucket gives every such doc
    # the same spurious positive score (0.153), passing the default
    # quality gate into the training corpus (code-review r10; the
    # tokens() docstring mandates a length gate first).
    valid = docs.where(
        F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
    ).observe(obs_valid, F.count(F.lit(1)).alias("n"))
    deduped = exact_dedup_keep_first(valid)
    near_dropped, n_capped, deps = 0, 0, []
    if near_dup_threshold is not None:
        dupes, near_dropped, n_capped = _near_dup_drop_list(
            deduped, near_dup_threshold
        )
        if dupes is not None:
            deps.append(dupes)
            deduped = deduped.join(
                F.broadcast(dupes),
                deduped["doc_id"] == dupes["node"],
                "left_anti",
            )
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
    return CuratePlan(
        scored.where(keep),
        deduped,
        obs_valid,
        obs_scored,
        near_dup_dropped=near_dropped,
        lsh_capped_bands=n_capped,
        deps=tuple(deps),
    )


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="kmeans_with_mapreduce_cuda_spark.curate"
    )
    p.add_argument("input", help="documents parquet path (doc_id, text, ...)")
    p.add_argument("output", help="output directory for curated parquet")
    p.add_argument("--min-score", type=float, default=0.0)
    p.add_argument(
        "--near-dup-threshold",
        type=float,
        default=None,
        help="enable MinHash/LSH near-dedup: drop non-canonical members "
        "of duplicate clusters at est_jaccard >= this value",
    )
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

    plan = None
    try:
        docs = spark.read.parquet(args.input)
        plan = curate(
            docs,
            min_score=args.min_score,
            near_dup_threshold=args.near_dup_threshold,
        )

        if args.partition_by:
            # hash-partition BY the partition column: round-robin
            # repartition(n) would spread every partition value across
            # all n tasks and the partitioned writer then emits one
            # file per (task, value) -- up to n * n_values small files,
            # defeating --files (code-review r10).  Hashing by the
            # column keeps it to one file per value.
            out_df = plan.survivors.repartition(
                args.files, F.col(args.partition_by)
            )
            writer = out_df.write.mode("overwrite").partitionBy(
                args.partition_by
            )
        else:
            writer = plan.survivors.repartition(args.files).write.mode(
                "overwrite"
            )
        writer.parquet(args.output)

        # input count is parquet-footer metadata; everything else was
        # observed DURING the write -- no stage shuffle runs twice.
        n_input = docs.count()
        try:
            n_valid = plan.obs_valid.get.get("n", 0) or 0
            scored_metrics = dict(plan.obs_scored.get)
        except Exception as e:  # noqa: BLE001 -- see message below
            # Spark quirk (verified on 4.1): when repartition +
            # partitionBy combine with ZERO surviving rows, AQE
            # propagates the empty relation over the CollectMetrics
            # nodes and the observations never materialize -- .get then
            # fails JVM-side.  Recompute with explicit jobs; this only
            # triggers in the degenerate near-empty case.  The broad
            # catch is deliberate (the quirk's exception type varies by
            # JVM path) but NEVER silent: the swallowed error and the
            # broken zero-re-executed-shuffles promise are both
            # narrated so an unrelated failure on a large corpus is
            # visible in the run log (code-review r10).
            print(
                "curate: observation read failed "
                f"({type(e).__name__}: {str(e)[:200]}); recomputing "
                "stage counts with explicit jobs (stage shuffles rerun)"
            )
            n_valid = docs.where(
                F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
            ).count()
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
            "near_dup_dropped": plan.near_dup_dropped,
            "lsh_capped_bands": plan.lsh_capped_bands,
            "after_dedup": scored_metrics.get("after_dedup", 0) or 0,
            "written": scored_metrics.get("written", 0) or 0,
        }
        near = (
            f"{stats['near_dup_dropped']} near-dups dropped "
            f"(threshold={args.near_dup_threshold}), "
            if args.near_dup_threshold is not None
            else ""
        )
        if stats["lsh_capped_bands"]:
            print(
                f"curate: WARNING {stats['lsh_capped_bands']} LSH band "
                "bucket(s) exceeded the skew cap and were excluded from "
                "near-dup pair generation -- near-dups in them may "
                "survive; follow up with more bands or exact dedup"
            )
        print(
            f"curate: {stats['input_docs']} docs in, "
            f"{stats['null_text_dropped']} null/blank-text dropped, "
            f"{near}"
            f"{stats['after_dedup']} after dedup, "
            f"{stats['written']} written to {args.output} "
            f"(min_score={args.min_score})"
        )
        return stats
    finally:
        for dep in plan.deps if plan is not None else []:
            dep.unpersist()
        if own_session:
            spark.stop()


if __name__ == "__main__":
    main()
