#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship operators at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Headline queries:
- kmeans_df      : pure-DataFrame Lloyd's, k=15, 10 iterations, ~600k 2-D
                   points (the reference's whole pipeline at 60x its N;
                   BASELINE.md bench point).
- kmeans_mllib   : MLlib KMeans over the 64-dim embeddings table.
- tpch_q1        : filter + grouped multi-aggregate (scan-bound).
- join_agg       : orders x lineitem shuffle join + agg.
- join_chain_q5  : six-table star join (broadcast dims + fact shuffles).
- window_topk    : partitioned window top-k.
- dedup_exact    : content-hash dedup over documents.
- ngram_jaccard  : shingle-overlap near-dup pairs (exact, doc_id<300).
- minhash_lsh    : MinHash+LSH banding near-dup candidates (full table).
- sim_topk       : brute-force cosine top-10 over embeddings.
- json_variant   : VARIANT parse + typed extraction + agg over events.
- token_packing  : running-sum sequence packing over documents.
"""

from __future__ import annotations

import json
import os
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from kmeans_with_mapreduce_cuda_spark import get_spark
    from kmeans_with_mapreduce_cuda_spark.operators.kmeans import lloyd_2d
    from kmeans_with_mapreduce_cuda_spark.operators.kmeans_mllib import fit_kmeans
    from kmeans_with_mapreduce_cuda_spark.plans import REGISTRY
    from kmeans_with_mapreduce_cuda_spark.sources import load_table, points_xy

    spark = get_spark(app_name="bench")
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    timings: dict[str, float] = {}

    def timed(name: str, fn, runs: int = 2) -> None:
        # best of N: each run is a full re-execution (nothing is cached
        # between them), so the min is honest steady-state cost with the
        # first-compile/GC/host-noise tail trimmed -- single-shot numbers
        # on this box swing up to 2x run-to-run.  The iterative kmeans
        # entries get a third run: their 10-20 dependent jobs integrate
        # host noise instead of averaging it out.
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # Warm the JVM/file cache with a trivial count (not reported).
    # 8 cache partitions: measured sweet spot for the iteration loop on
    # local[32] (3 file partitions underuse cores; 32 is task-overhead).
    points = points_xy(spark, SF_DIR).repartition(8).cache()
    n_points = points.count()

    init15 = [
        (float(2 + 3 * i), float(4000 + 6500 * i)) for i in range(15)
    ]  # fixed spread across the (quantity, extendedprice) plane
    # one throwaway step first: JIT/codegen warm-up so the measurement is
    # steady-state iteration cost, not first-compile latency
    lloyd_2d(points, init15, max_iter=1, tol=0.0)
    timed("kmeans_df", lambda: lloyd_2d(points, init15, max_iter=10, tol=0.0), runs=3)

    emb = load_table(spark, SF_DIR, "embeddings").cache()
    emb.count()
    timed(
        "kmeans_mllib",
        lambda: fit_kmeans(emb, k=15, max_iter=10, tol=0.0, seed=42),
    )

    # BASELINE.md parity point: the reference's own workload shape
    # (birch1, first 10k rows, k=15).  20 iterations timed; the reference
    # does 999 at 1.33 ms/iter on a GPU -- Spark's fixed per-job overhead
    # dominates at N=10^4, which is why the headline is sf0.1 above.
    from kmeans_with_mapreduce_cuda_spark.sources import read_points_text

    birch_path = "/root/reference/data/birch1.txt"
    if os.path.exists(birch_path):
        birch = read_points_text(spark, birch_path, limit=10_000).cache()
        birch.count()
        init_b = [
            (float(100_000 + 60_000 * i), float(100_000 + 55_000 * (i % 4)))
            for i in range(15)
        ]
        lloyd_2d(birch, init_b, max_iter=1, tol=0.0)  # warm
        timed(
            "kmeans_birch10k_20iter",
            lambda: lloyd_2d(birch, init_b, max_iter=20, tol=0.0),
            runs=3,
        )

    def run_registry(name: str):
        # exhaust the result without collecting rows to the driver
        REGISTRY[name].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    timed("tpch_q1", lambda: run_registry("rel_filter_agg"))
    timed("join_agg", lambda: run_registry("rel_join_shuffle"))
    timed("join_chain_q5", lambda: run_registry("rel_join_chain_q5"))
    timed("window_topk", lambda: run_registry("rel_window_topk"))
    timed("dedup_exact", lambda: run_registry("dedup_exact_keep"))
    timed("ngram_jaccard", lambda: run_registry("dedup_ngram_jaccard"))
    timed("minhash_lsh", lambda: run_registry("dedup_minhash_lsh"))
    timed("sim_topk", lambda: run_registry("sim_topk_bruteforce"))
    timed("json_variant", lambda: run_registry("rel_json_variant"))
    timed("token_packing", lambda: run_registry("pipe_token_packing"))

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_points": n_points,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
