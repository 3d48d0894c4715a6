"""pagerank_int: exact-integer PageRank vs an independent pure-Python
twin, plus the release contract and a ranking sanity property."""

from __future__ import annotations

import pytest

from kmeans_with_mapreduce_cuda_spark.operators.graph import (
    SCALE,
    pagerank_int,
)


def _py_pagerank(edges, iters=3, scale=SCALE, damping_pct=85):
    """Independent twin: same integer contract, plain dicts."""
    from collections import defaultdict

    outdeg = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    nodes = sorted(outdeg)
    n = len(nodes)
    spn = scale // n
    base = (100 - damping_pct) * spn // 100
    r = {v: spn for v in nodes}
    for _ in range(iters):
        s = defaultdict(int)
        for a, b in edges:
            s[b] += r[a] // outdeg[a]
        r = {v: base + damping_pct * s.get(v, 0) // 100 for v in nodes}
    return r


def _sym(pairs):
    out = []
    for a, b in pairs:
        out.append((a, b))
        out.append((b, a))
    return out


@pytest.fixture()
def star_chain():
    # hub 0 connected to 1..4, plus a chain 4-5-6: hub must outrank all.
    return _sym([(0, 1), (0, 2), (0, 3), (0, 4), (4, 5), (5, 6)])


def test_pagerank_matches_python_twin_exactly(spark, star_chain):
    edges = spark.createDataFrame(star_chain, ["src", "dst"])
    res = pagerank_int(edges, iters=4)
    got = {r["node"]: r["rank_scaled"] for r in res.ranks.collect()}
    for dep in res.deps:
        dep.unpersist()
    want = _py_pagerank(star_chain, iters=4)
    assert got == want  # bit-exact, not approximately equal


def test_pagerank_hub_outranks_leaves_and_mass_is_conserved(
    spark, star_chain
):
    edges = spark.createDataFrame(star_chain, ["src", "dst"])
    res = pagerank_int(edges, iters=3)
    rows = {r["node"]: r["rank_scaled"] for r in res.ranks.collect()}
    for dep in res.deps:
        dep.unpersist()
    assert rows[0] == max(rows.values())  # the hub wins
    # integer truncation only ever LOSES mass, and less than 1 part
    # per 1e6 of it at these sizes
    total = sum(rows.values())
    assert SCALE * 0.999 <= total <= SCALE


def test_pagerank_releases_checkpoint_blocks(spark, star_chain):
    sc = spark.sparkContext
    before = len(sc._jsc.sc().getRDDStorageInfo())
    edges = spark.createDataFrame(star_chain, ["src", "dst"])
    res = pagerank_int(edges, iters=2)
    res.ranks.collect()
    for dep in res.deps:
        dep.unpersist()
    after = len(sc._jsc.sc().getRDDStorageInfo())
    assert after <= before  # no persisted/checkpointed blocks leak


def test_pagerank_empty_edges_raises_cleanly(spark):
    import pytest as _pytest

    empty = spark.createDataFrame([], "src long, dst long")
    with _pytest.raises(ValueError, match="empty"):
        pagerank_int(empty)
