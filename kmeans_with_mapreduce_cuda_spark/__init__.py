"""PySpark-native analytics engine with the capabilities of
hhd-shuai/Kmeans_with_mapreduce-cuda, re-expressed Spark-first.

The reference (/root/reference) is a CUDA MapReduce K-Means engine:
scan -> map (nearest-centroid) -> sort-shuffle -> segment -> reduce (mean)
-> sink, iterated.  Here every stage is a declarative DataFrame
transformation so Catalyst/Tungsten pick the physical strategy, and the
surface is widened to the relational + LLM-data-pipeline operators a
100 TB training-data pipeline needs (dedup, similarity search, text
analysis, multimodal columns, streaming).

Layers
------
- ``sources``   : readers/writers (text points parity with the reference
  scanner, parquet catalog for the test fixtures).
- ``functions`` : pure Column-expression helpers (distance, hashing,
  text metrics) -- JVM-side, codegen-friendly; no Python UDFs in hot paths.
- ``operators`` : K-Means primitive + library layer, dedup, similarity,
  multimodal plumbing.
- ``plans``     : named relational queries used by the harness and bench.
- ``streaming`` : Structured Streaming equivalents over the events table.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
