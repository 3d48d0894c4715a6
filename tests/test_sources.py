"""Source/sink tests: the reference-format text scanner (O1) and
'Point: (x,y)' sink (O13) through real files, plus format breadth
(CSV/JSON round-trips -- free via spark.read/write, asserted anyway)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from kmeans_with_mapreduce_cuda_spark.sources import (
    format_centroids,
    load_table,
    read_points_text,
    write_centroids_text,
)

from conftest import SF_DIR


def _write_birchlike(path: str, n: int = 100) -> None:
    with open(path, "w") as f:
        for i in range(n):
            # mixed whitespace, like the reference's istringstream >> scan
            f.write(f"  {i * 37 % 1000}\t{i * 91 % 1000}\n")
        f.write("garbage line\n")
        f.write("\n")


def test_read_points_text_parity(spark, tmp_path):
    """First-N semantics + malformed-line tolerance (the reference reads
    NUM_INPUT lines and would parse garbage; we drop bad lines)."""
    p = str(tmp_path / "birch.txt")
    _write_birchlike(p)
    pts = read_points_text(spark, p, limit=50)
    assert pts.count() == 50
    rows = {r["id"]: (r["x"], r["y"]) for r in pts.collect()}
    assert rows[0] == (0, 0)
    assert rows[2] == (74, 182)
    # no limit: 100 good rows survive, 2 bad lines dropped
    assert read_points_text(spark, p).count() == 100


def test_centroid_sink_format(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, 10.9, 20.1), (1, 5.0, 7.0)], ["cluster_id", "x", "y"]
    )
    lines = {r["line"] for r in format_centroids(df).collect()}
    # reference truncates (uint64 store): 10.9 -> 10
    assert lines == {"Point: (10,20)", "Point: (5,7)"}

    # parity_ints floors; differs from truncation only below zero
    neg = spark.createDataFrame([(0, -1.5, 2.5)], ["cluster_id", "x", "y"])
    assert [r["line"] for r in format_centroids(neg).collect()] == [
        "Point: (-1,2)"
    ]
    assert [
        r["line"] for r in format_centroids(neg, parity_ints=True).collect()
    ] == ["Point: (-2,2)"]

    out = str(tmp_path / "out")
    write_centroids_text(df, out)
    txt = open(glob.glob(os.path.join(out, "part-*"))[0]).read()
    assert sorted(txt.strip().splitlines()) == sorted(lines)


def test_csv_json_roundtrip(spark, tmp_path):
    """Format breadth: the same relation written and re-read as CSV and
    JSON survives with values intact."""
    src = load_table(spark, SF_DIR, "nation")
    csv_dir, json_dir = str(tmp_path / "csv"), str(tmp_path / "json")
    src.write.mode("overwrite").option("header", True).csv(csv_dir)
    src.write.mode("overwrite").json(json_dir)

    csv_back = (
        spark.read.option("header", True).option("inferSchema", True).csv(csv_dir)
    )
    json_back = spark.read.json(json_dir)
    orc_dir = str(tmp_path / "orc")
    src.write.mode("overwrite").orc(orc_dir)
    orc_back = spark.read.orc(orc_dir)
    want = {(r["n_nationkey"], r["n_name"]) for r in src.collect()}
    assert {(r["n_nationkey"], r["n_name"]) for r in csv_back.collect()} == want
    assert {(r["n_nationkey"], r["n_name"]) for r in json_back.collect()} == want
    assert {(r["n_nationkey"], r["n_name"]) for r in orc_back.collect()} == want


def test_xml_roundtrip(spark, tmp_path):
    """Format breadth: Spark 4's built-in XML source round-trips the
    same relation (rowTag framing on both write and read; numeric
    columns come back via schema inference)."""
    src = load_table(spark, SF_DIR, "nation").select("n_nationkey", "n_name")
    xml_dir = str(tmp_path / "xml")
    (
        src.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "nations")
        .option("rowTag", "nation")
        .save(xml_dir)
    )
    back = spark.read.format("xml").option("rowTag", "nation").load(xml_dir)
    want = {(r["n_nationkey"], r["n_name"]) for r in src.collect()}
    assert {(int(r["n_nationkey"]), r["n_name"]) for r in back.collect()} == want


def test_partitioned_sink_prunes(spark, tmp_path):
    """Partitioned parquet written BY cluster_id must (a) round-trip and
    (b) prune partitions when filtered on the partition column."""
    from kmeans_with_mapreduce_cuda_spark.operators.kmeans import assign_2d
    from kmeans_with_mapreduce_cuda_spark.sources.readers import points_xy
    from kmeans_with_mapreduce_cuda_spark.sources.writers import (
        write_partitioned_parquet,
    )

    cents = [(10.0, 20000.0), (25.0, 50000.0), (40.0, 80000.0)]
    a = assign_2d(points_xy(spark, SF_DIR), cents)
    out = str(tmp_path / "by_cluster")
    write_partitioned_parquet(a, out, ["cluster_id"])

    back = spark.read.parquet(out)
    assert back.count() == a.count()

    one = back.where(F.col("cluster_id") == 1)
    want = a.where(F.col("cluster_id") == 1).count()
    assert one.count() == want
    plan = one._sc._jvm.PythonSQLUtils.explainString(
        one._jdf.queryExecution(), "formatted"
    )
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "cluster_id" in pf[0], plan


def test_pandas_udfs_match_expressions(spark):
    """The vectorized UDF escape hatch must agree with the expression twins."""
    from kmeans_with_mapreduce_cuda_spark.functions.text import (
        punct_ratio,
        token_count,
    )
    from kmeans_with_mapreduce_cuda_spark.functions.udfs import (
        punct_ratio_udf,
        token_count_udf,
    )

    d = load_table(spark, SF_DIR, "documents").limit(200)
    rows = d.select(
        "doc_id",
        F.round(punct_ratio("text"), 9).alias("pr_expr"),
        F.round(punct_ratio_udf(F.col("text")), 9).alias("pr_udf"),
        token_count("text").alias("tc_expr"),
        token_count_udf(F.col("text")).alias("tc_udf"),
    ).collect()
    for r in rows:
        assert r["tc_expr"] == r["tc_udf"], r
        assert abs(r["pr_expr"] - r["pr_udf"]) < 1e-9, r


def test_pandas_udfs_match_expressions_on_edge_inputs(spark):
    """The equivalence contract on the inputs the corpus fixture never
    exercises (code-review r10): NULL text (the old UDF raised
    IntCastingNaNError and killed the job), empty text (scored 1.0 vs
    the twin's 0.0), tab-edged text (Python strip() ate the tab SQL
    trim keeps), and non-ASCII letters (Unicode \\w kept the accent the
    Java regex strips)."""
    from kmeans_with_mapreduce_cuda_spark.functions.text import (
        punct_ratio,
        token_count,
    )
    from kmeans_with_mapreduce_cuda_spark.functions.udfs import (
        punct_ratio_udf,
        token_count_udf,
    )

    d = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "a\tb\t"), (5, "café!?"),
         (6, "plain ascii text."), (7, "\t\n")],
        "doc_id bigint, text string",
    )
    rows = d.select(
        "doc_id",
        F.round(punct_ratio("text"), 9).alias("pr_expr"),
        F.round(punct_ratio_udf(F.col("text")), 9).alias("pr_udf"),
        token_count("text").alias("tc_expr"),
        token_count_udf(F.col("text")).alias("tc_udf"),
    ).collect()
    for r in rows:
        assert r["tc_expr"] == r["tc_udf"], r
        if r["pr_expr"] is None or r["pr_udf"] is None:
            assert r["pr_expr"] is None and r["pr_udf"] is None, r
        else:
            assert abs(r["pr_expr"] - r["pr_udf"]) < 1e-9, r


def test_read_points_text_drops_malformed_lines(spark, tmp_path):
    """ANSI-mode robustness: junk lines are dropped (try_cast), clean
    lines keep their file-order ids -- the reference scanner would read
    garbage coords instead (kmeans_with_mapreduce-cuda.cu:52-70)."""
    p = tmp_path / "dirty.txt"
    p.write_text("1 2\nnot numbers\n3\n4 5\n  6\t7  \nx 9\n")
    got = read_points_text(spark, str(p)).select("x", "y").collect()
    assert sorted((r["x"], r["y"]) for r in got) == [(1, 2), (4, 5), (6, 7)]


def test_points_text_python_datasource(spark):
    """Custom Python Data Source (Spark 4 API): byte-range-split scan of
    the reference's whitespace point format, results invariant to the
    partition count and equal to the text+split reader."""
    import os

    from kmeans_with_mapreduce_cuda_spark.sources import (
        read_points_text,
        register_points_source,
    )

    path = "/root/reference/data/birch1.txt"
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference data not present")
    register_points_source(spark)

    def pts(n_parts):
        return (
            spark.read.format("points_text")
            .option("path", path)
            .option("n_partitions", str(n_parts))
            .load()
        )

    a = sorted((r["x"], r["y"]) for r in pts(1).collect())
    b = sorted((r["x"], r["y"]) for r in pts(7).collect())
    assert a == b, "scan must be invariant to byte-range splitting"
    exp = sorted(
        (r["x"], r["y"]) for r in read_points_text(spark, path).collect()
    )
    assert a == exp
    # line_no surrogate is monotone in file order within a partition and
    # globally unique
    rows = pts(5).collect()
    assert len({r["line_no"] for r in rows}) == len(rows)


def test_points_text_split_boundary_on_line_start(spark, tmp_path):
    """Regression: fixed-width lines whose starts align EXACTLY with the
    byte-range boundaries.  A line whose first byte is a split boundary
    belongs to the right range (Hadoop LineRecordReader contract); the
    old unconditional first-line skip read it in neither range, silently
    dropping rows whenever line starts aligned with splits."""
    from kmeans_with_mapreduce_cuda_spark.sources import register_points_source

    p = tmp_path / "fixed.txt"
    # ten 4-byte lines ("d d\n") -> 40-byte file; every divisor-of-40
    # partitioning puts some boundary exactly on a line start
    p.write_text("".join(f"{i} {i}\n" for i in range(10)))
    assert p.stat().st_size == 40
    register_points_source(spark)

    def pts(n_parts):
        return (
            spark.read.format("points_text")
            .option("path", str(p))
            .option("n_partitions", str(n_parts))
            .load()
        )

    want = [(i, i) for i in range(10)]
    for n in (1, 2, 4, 5, 8, 10):
        got = sorted((r["x"], r["y"]) for r in pts(n).collect())
        assert got == want, f"n_partitions={n} dropped rows: {got}"


def test_load_table_memo_invalidates_on_mtime(spark, tmp_path):
    """The per-(session, mtime) base-scan memo must return the SAME
    DataFrame object while the file is unchanged (the gate's ~90
    queries stop re-paying listing + schema resolution) and a FRESH
    scan when the file is rewritten (fixture regeneration)."""
    import os
    import shutil

    from kmeans_with_mapreduce_cuda_spark.sources.readers import load_table

    d = str(tmp_path)
    shutil.copyfile(
        os.path.join(SF_DIR, "nation.parquet"),
        os.path.join(d, "nation.parquet"),
    )
    a = load_table(spark, d, "nation")
    b = load_table(spark, d, "nation")
    assert a is b
    # rewrite -> new mtime -> new scan object
    os.utime(os.path.join(d, "nation.parquet"), ns=(1, 1))
    c = load_table(spark, d, "nation")
    assert c is not a
    assert c.count() == a.count()


def test_compressed_formats_roundtrip(spark, tmp_path):
    """Codec breadth: zstd/snappy parquet and gzip text all round-trip.
    At 100 TB the codec choice is a real knob (zstd ~30% smaller than
    snappy at similar scan cost); gzip text is the classic
    non-splittable trap -- fine as a sink, never as a scan source for
    big files (one partition per .gz)."""
    src = load_table(spark, SF_DIR, "nation")
    want = {(r["n_nationkey"], r["n_name"]) for r in src.collect()}

    for codec in ("zstd", "snappy"):
        d = str(tmp_path / codec)
        src.write.mode("overwrite").option("compression", codec).parquet(d)
        back = spark.read.parquet(d)
        assert {
            (r["n_nationkey"], r["n_name"]) for r in back.collect()
        } == want, codec

    gz = str(tmp_path / "gz")
    src.select(
        F.concat_ws("|", "n_nationkey", "n_name").alias("value")
    ).write.mode("overwrite").option("compression", "gzip").text(gz)
    back = spark.read.text(gz).select(
        F.split("value", r"\|").alias("p")
    ).select(
        F.col("p")[0].cast("int").alias("k"), F.col("p")[1].alias("n")
    )
    assert {(r["k"], r["n"]) for r in back.collect()} == want


def test_points_text_datasource_write_roundtrip(spark, tmp_path):
    """Write side of the custom connector: DataFrame -> reference text
    format via task-temp + driver-rename commit, then read back through
    the SAME connector's byte-range reader."""
    from kmeans_with_mapreduce_cuda_spark.sources import register_points_source

    register_points_source(spark)
    df = spark.range(0, 1000).select(
        (F.col("id") * 37 % 4096).alias("x"),
        (F.col("id") * 91 % 4096).alias("y"),
    )
    dest = str(tmp_path / "pts_out")
    df.repartition(4).write.format("points_text").option(
        "path", dest
    ).mode("append").save()

    import glob
    import os

    parts = glob.glob(os.path.join(dest, "part-*.txt"))
    assert len(parts) == 4
    assert not glob.glob(os.path.join(dest, "_tmp_points_*"))  # committed

    # the reader takes one concrete file path (os.path.getsize); read
    # the committed parts individually
    got = set()
    for p in sorted(parts):
        rows = (
            spark.read.format("points_text").option("path", p).load()
            .select("x", "y")
            .collect()
        )
        got.update((r["x"], r["y"]) for r in rows)
    want = {(r["x"], r["y"]) for r in df.collect()}
    assert got == want


def test_points_text_datasource_overwrite_removes_stale_parts(spark, tmp_path):
    """mode("overwrite") must not leave stale part files from a prior
    write with MORE partitions mixed into the new output (round-3
    advice: commit() previously ignored the overwrite flag)."""
    from kmeans_with_mapreduce_cuda_spark.sources import register_points_source

    register_points_source(spark)
    dest = str(tmp_path / "pts_ovw")
    big = spark.range(0, 400).select(
        F.col("id").alias("x"), F.col("id").alias("y")
    )
    big.repartition(8).write.format("points_text").option("path", dest).mode(
        "append"
    ).save()

    import glob
    import os

    assert len(glob.glob(os.path.join(dest, "part-*.txt"))) == 8

    small = spark.range(1000, 1100).select(
        F.col("id").alias("x"), F.col("id").alias("y")
    )
    small.repartition(2).write.format("points_text").option(
        "path", dest
    ).mode("overwrite").save()

    parts = glob.glob(os.path.join(dest, "part-*.txt"))
    assert len(parts) == 2  # stale part-00002..07 from the 8-way write gone
    got = set()
    for p in sorted(parts):
        rows = (
            spark.read.format("points_text").option("path", p).load()
            .select("x", "y")
            .collect()
        )
        got.update((r["x"], r["y"]) for r in rows)
    assert got == {(i, i) for i in range(1000, 1100)}


def test_points_text_datasource_append_does_not_clobber(spark, tmp_path):
    """Append mode must extend the part numbering past existing files,
    never rename onto them (a second append previously overwrote
    part-00000/00001 of the first write)."""
    from kmeans_with_mapreduce_cuda_spark.sources import register_points_source

    register_points_source(spark)
    dest = str(tmp_path / "pts_app")
    first = spark.range(0, 100).select(
        F.col("id").alias("x"), F.col("id").alias("y")
    )
    first.repartition(4).write.format("points_text").option(
        "path", dest
    ).mode("append").save()
    second = spark.range(100, 150).select(
        F.col("id").alias("x"), F.col("id").alias("y")
    )
    second.repartition(2).write.format("points_text").option(
        "path", dest
    ).mode("append").save()

    import glob
    import os

    parts = glob.glob(os.path.join(dest, "part-*.txt"))
    assert len(parts) == 6  # 4 + 2, nothing replaced
    got = set()
    for p in sorted(parts):
        rows = (
            spark.read.format("points_text").option("path", p).load()
            .select("x", "y")
            .collect()
        )
        got.update((r["x"], r["y"]) for r in rows)
    assert got == {(i, i) for i in range(150)}


def test_load_table_events_handles_both_ts_physical_types(spark, tmp_path):
    """The driver regenerates fixtures between rounds and the events.ts
    parquet physical type has ALREADY flipped once (TIMESTAMP(NANOS)
    through round 2, plain timestamp[us] from round 3).  load_table must
    yield identical instants for both encodings of the same data."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = [1_700_000_000_000_000 + i * 37_000_000 for i in range(200)]  # us
    # instants whose nanos exceed double's 53-bit mantissa by JUST enough
    # that the old (ts / 1000).cast("long") double path truncated them one
    # microsecond low -- the exact `div` rebuild must keep them intact
    ts += [1527181348791376, 1788192812650256, 1543695572267472]
    base = {
        "event_id": list(range(len(ts))),
        "user_id": [i % 7 for i in range(len(ts))],
    }

    us_dir, ns_dir = str(tmp_path / "us"), str(tmp_path / "ns")
    for d in (us_dir, ns_dir):
        os.makedirs(d)
    pq.write_table(
        pa.table({**base, "ts": pa.array(ts, pa.timestamp("us"))}),
        os.path.join(us_dir, "events.parquet"),
    )
    pq.write_table(
        pa.table({**base, "ts": pa.array([t * 1000 for t in ts], pa.timestamp("ns"))}),
        os.path.join(ns_dir, "events.parquet"),
    )

    got_us = {
        (r["event_id"], r["ts"])
        for r in load_table(spark, us_dir, "events").collect()
    }
    got_ns = {
        (r["event_id"], r["ts"])
        for r in load_table(spark, ns_dir, "events").collect()
    }
    assert got_us == got_ns
    assert len(got_us) == len(ts)


def test_points_text_stream_reader_tails_file_exactly_once(spark, tmp_path):
    """Streaming side of the connector: availableNow drains against one
    checkpoint must (1) ship each line exactly once across restarts,
    (2) hold back a partial trailing line until its newline lands, and
    (3) split each catch-up range into executor-side byte-range tasks
    (same ownership rule as the batch reader)."""
    import os

    from kmeans_with_mapreduce_cuda_spark.sources import register_points_source

    register_points_source(spark)
    src = str(tmp_path / "feed.txt")
    ckpt = str(tmp_path / "ckpt")

    out = str(tmp_path / "out")

    def drain():
        # parquet sink: checkpoint-recoverable (the memory sink is not),
        # so each availableNow drain resumes from the committed offset
        q = (
            spark.readStream.format("points_text")
            .option("path", src)
            .option("n_partitions", "3")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        q.stop()
        return {
            (r["x"], r["y"]) for r in spark.read.parquet(out).collect()
        }

    with open(src, "w") as f:
        for i in range(100):
            f.write(f"{i} {i * 2}\n")
    assert drain() == {(i, 2 * i) for i in range(100)}

    # append 50 complete lines + one PARTIAL line (no newline): the
    # partial "999 9" must NOT ship as a truncated-but-parseable point
    with open(src, "a") as f:
        for i in range(100, 150):
            f.write(f"{i} {i * 2}\n")
        f.write("999 9")
    assert drain() == {(i, 2 * i) for i in range(150)}  # exactly once, no (999, 9)

    # complete the partial line: exactly the finished point arrives
    with open(src, "a") as f:
        f.write("99\n")
    assert drain() == {(i, 2 * i) for i in range(150)} | {(999, 999)}


def test_points_text_stream_writer_roundtrip(spark, tmp_path):
    """Full streaming round-trip THROUGH the connector: readStream
    points_text -> writeStream points_text.  Batch-id-deterministic
    part names make microbatch replay idempotent; content must equal
    the source file and no temp files may survive the commit."""
    import glob
    import os

    from kmeans_with_mapreduce_cuda_spark.sources import register_points_source

    register_points_source(spark)
    src = str(tmp_path / "in.txt")
    with open(src, "w") as f:
        for i in range(300):
            f.write(f"{i} {i * 7 % 500}\n")
    out = str(tmp_path / "out_txt")

    q = (
        spark.readStream.format("points_text")
        .option("path", src)
        .load()
        .select("x", "y")
        .writeStream.format("points_text")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    q.stop()

    parts = glob.glob(os.path.join(out, "part-*.txt"))
    assert parts and not glob.glob(os.path.join(out, "_tmp_stream_*"))
    got = set()
    for p in parts:
        rows = (
            spark.read.format("points_text").option("path", p).load()
            .select("x", "y").collect()
        )
        got.update((r["x"], r["y"]) for r in rows)
    assert got == {(i, i * 7 % 500) for i in range(300)}


def test_register_views_drops_stale_view_for_missing_table(spark, tmp_path):
    """register_views against a fixture dir MISSING a table must drop any
    same-named temp view left by an earlier call with a different sf_dir
    -- otherwise spark.sql silently reads the previous fixture's rows
    inside the correctness gate (round-7 advisor finding)."""
    import shutil

    import pytest
    from pyspark.errors import AnalysisException

    from kmeans_with_mapreduce_cuda_spark.sources.readers import (
        register_views,
    )

    partial = tmp_path / "partial_sf"
    partial.mkdir()
    # Keep only region in the partial fixture; nation is absent.
    shutil.copy(
        os.path.join(SF_DIR, "region.parquet"),
        str(partial / "region.parquet"),
    )

    try:
        register_views(spark, SF_DIR)  # full fixture: nation view exists
        assert spark.sql("SELECT count(*) AS n FROM nation").first()["n"] > 0

        register_views(spark, str(partial))
        assert spark.sql("SELECT count(*) AS n FROM region").first()["n"] > 0
        with pytest.raises(AnalysisException, match="TABLE_OR_VIEW_NOT_FOUND"):
            spark.sql("SELECT count(*) FROM nation").collect()
    finally:
        # Restore the full fixture even on failure -- later spark.sql
        # tests in this session-scoped fixture depend on the views.
        register_views(spark, SF_DIR)


def test_points_sink_refuses_null_coordinates(spark, tmp_path):
    """The 'x y' line format cannot represent NULL: the old writer
    stringified None into a line the reader silently DROPPED on
    round-trip -- the contract is a loud ValueError at write time
    (code-review r10)."""
    import pytest

    df = spark.createDataFrame([(1, 2), (None, 5)], "x bigint, y bigint")
    dest = str(tmp_path / "pts")
    with pytest.raises(Exception, match="NULL coordinate"):
        df.write.format("points_text").option("path", dest).mode(
            "append"
        ).save()
