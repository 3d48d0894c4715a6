"""Skew-resilient aggregation: salted two-stage groupBy.

AQE's skew-join handling covers joins; a groupBy whose key distribution
is pathological (one key = 50% of 100 TB) still funnels one reducer.
Salting splits each key into ``n_salts`` sub-keys, partially aggregates,
then combines -- two small shuffles instead of one hot one.  This is the
Spark-native generalization of the reference's per-cluster grid sizing
("Loading Balancing", kmeans_mapreduce_core.cu:195-207 + README.md:55-58):
give heavy keys proportionally more reducers.

Only algebraic aggregates (sum/count/min/max, avg via sum+count) can be
re-combined; the API takes them by name to keep misuse impossible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (partial expr builder, final combine builder) per supported aggregate.
_ALGEBRAIC = {
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "count": (lambda c: F.count(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
}


def salted_groupby(
    df: DataFrame,
    key: str | list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """``aggs``: out_name -> (fn, col) with fn in sum/count/min/max/avg.

    Salt is derived from a hash of the whole row (deterministic given the
    row, uniform across salts), so heavy keys spread over ``n_salts``
    partial groups.  avg decomposes into sum+count and recombines
    exactly.
    """
    keys = [key] if isinstance(key, str) else list(key)
    # expand avg into algebraic parts
    plan: dict[str, tuple[str, str]] = {}
    finals: dict[str, str] = {}  # out -> expression over partials
    for out, (fn, col) in aggs.items():
        if fn == "avg":
            plan[f"_{out}_sum"] = ("sum", col)
            plan[f"_{out}_cnt"] = ("count", col)
            finals[out] = f"avg:{out}"
        elif fn in _ALGEBRAIC:
            plan[f"_{out}"] = (fn, col)
            finals[out] = f"plain:{out}"
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")

    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    salted = df.withColumn("_salt", salt)

    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            _ALGEBRAIC[fn][0](F.col(col)).alias(name)
            for name, (fn, col) in plan.items()
        ]
    )

    combine_exprs = []
    for out, kind in finals.items():
        if kind.startswith("avg:"):
            combine_exprs.append(
                (F.sum(f"_{out}_sum") / F.sum(f"_{out}_cnt")).alias(out)
            )
        else:
            fn = plan[f"_{out}"][0]
            combine_exprs.append(_ALGEBRAIC[fn][1](F.col(f"_{out}")).alias(out))
    return partial.groupBy(*keys).agg(*combine_exprs)


def salted_topk(
    df: DataFrame,
    part_col: str,
    order_cols: list,
    k: int,
    salt_on: str,
    n_salt: int = 16,
    rank_col: str = "rank",
) -> DataFrame:
    """Skew-safe two-phase top-k per ``part_col``: top-k is MERGEABLE
    (unlike general window functions), so stage 1 takes a local top-k
    within (key, salt) -- spreading a hot key over ``n_salt`` tasks --
    and stage 2 re-ranks only the <= k*n_salt survivors per key.  The
    second window's input is bounded regardless of input skew, where a
    plain one-window formulation sorts the hottest key's entire
    partition on one task.

    ``order_cols`` must be a TOTAL order (include a unique tiebreaker)
    or the result is ambiguous; with a total order the output is
    provably identical to the unsalted window.  ``salt_on`` names the
    column hashed into the salt -- REQUIRED (a Column in order_cols
    carries sort direction and is not a resolvable name to hash); any
    per-row-varying column works, correctness never depends on it.
    """
    from pyspark.sql.window import Window

    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(salt_on), F.lit(n_salt)).cast("int")
    )
    w1 = Window.partitionBy(part_col, "_salt").orderBy(*order_cols)
    local = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )
    w2 = Window.partitionBy(part_col).orderBy(*order_cols)
    return local.withColumn(
        rank_col, F.row_number().over(w2).cast("bigint")
    ).where(F.col(rank_col) <= k)


def skyline_2d(
    df: DataFrame,
    x: str,
    y: str,
    salt_on: str,
    n_salt: int = 16,
) -> DataFrame:
    """Pareto frontier (skyline) maximizing ``x`` AND ``y``: keep rows
    no other row strictly dominates (>= on both axes, > on at least
    one).  Same two-phase shape as :func:`salted_topk`, because the
    skyline is MERGEABLE too: skyline(S) == skyline(union of local
    skylines) -- every globally dominated point has a MAXIMAL
    dominator, which is itself undominated, hence survives its own
    bucket's local pass and eliminates the point in the global pass;
    conversely a global-frontier point is undominated in any subset
    containing it.  Stage 1 prunes within xxhash64 salt buckets (any
    per-row column works; correctness never depends on the split),
    stage 2 runs the same filter over the survivors only, so the
    single-partition global window touches |local frontiers| rows, not
    the corpus.  (Frontier size is data-dependent -- anticorrelated
    axes inflate it -- but local pruning already removed everything a
    bucket-mate dominates.)

    Per-bucket filter, all window arithmetic: a row survives iff
    ``y`` exceeds the best ``y`` among STRICTLY larger ``x`` and ties
    the best ``y`` within its own ``x`` -- O(n log n) against the
    textbook NOT EXISTS quadratic (which the oracle states as the
    independent semantic spec).  "Strictly larger x" is expressed as a
    RANGE frame ``1 FOLLOWING .. UNBOUNDED`` over ``dense_rank() ORDER
    BY x`` rather than over ``x`` itself: a numeric +1 offset on the
    raw axis only means "strictly larger" for integer values (a
    fractional x' in (x, x+1) would escape the frame and let dominated
    rows survive), while the rank axis is consecutive integers by
    construction, so rank+1 IS the next distinct ``x`` for any numeric
    type.  Exact duplicates of a frontier (x, y) all survive, both
    here and under strict dominance.
    """
    from pyspark.sql.window import Window

    def frontier(d: DataFrame, part_cols: list[str]) -> DataFrame:
        wrk = Window.partitionBy(*part_cols).orderBy(F.col(x).asc())
        wx = (
            Window.partitionBy(*part_cols)
            .orderBy(F.col("_xrk").asc())
            .rangeBetween(1, Window.unboundedFollowing)
        )
        weq = Window.partitionBy(*(part_cols + [x]))
        return (
            d.withColumn("_xrk", F.dense_rank().over(wrk))
            .withColumn("_best_gt", F.max(y).over(wx))
            .withColumn("_best_eq", F.max(y).over(weq))
            .where(
                (
                    F.col("_best_gt").isNull()
                    | (F.col(y) > F.col("_best_gt"))
                )
                & (F.col(y) == F.col("_best_eq"))
            )
            .drop("_xrk", "_best_gt", "_best_eq")
        )

    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(salt_on), F.lit(n_salt)).cast("int")
    )
    local = frontier(salted, ["_salt"]).drop("_salt")
    return frontier(local, [])
