"""Python UDTFs (table functions): the multi-row-emit extensibility
surface.  The reference's mapper hook reserves ``NUM_PAIRS`` output
slots per input row (config.cuh:13, kmeans_mapreduce_core.cu:41-43) --
a compile-time multi-emit; a UDTF is the dynamic version: one input row
-> any number of output rows, usable from SQL's FROM clause via LATERAL.

Prefer JVM-side explode/transform for anything expressible there (see
functions.text.word_shingles); a UDTF is for genuinely imperative
row-expansion logic.  Worker-side Python, Arrow-batched when
``spark.sql.execution.pythonUDTF.arrow.enabled`` is set.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf
from pyspark.sql.udtf import AnalyzeResult

_WS = re.compile(r"\s+")


@udtf(returnType="pos: int, shingle: string")
class ShingleUDTF:
    """Emit (position, n-gram shingle) rows for one document's text.

    Tokenization matches functions.text.tokens (trim -> lower -> split
    on whitespace runs) so results agree with the JVM-side shingle
    expression and the DuckDB oracle.
    """

    def eval(self, text: str, n: int = 3):  # noqa: D102 (driver contract)
        if text is None:
            return
        toks = _WS.split(text.strip().lower())
        for i in range(max(len(toks) - n + 1, 0)):
            yield i, " ".join(toks[i : i + n])


@udtf
class TopTermsUDTF:
    """POLYMORPHIC UDTF: output schema computed by ``analyze`` from the
    constant ``n`` argument -- term_1..term_n plus n_distinct_terms --
    the dynamic-schema half of the UDTF surface that a fixed
    ``returnType`` (ShingleUDTF) cannot express.

    One row in -> one row out: the n most frequent whitespace tokens of
    the text (ties broken alphabetically), NULL-padded when the doc has
    fewer distinct terms.  NULL text yields NO row (the LATERAL drops
    the outer row), matching the SQL formulation where unnest of a NULL
    token array produces nothing.
    """

    @staticmethod
    def analyze(text, n):
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        if not n.isConstantExpression or n.value is None:
            raise ValueError("top_terms: n must be a constant integer")
        k = int(n.value)
        if k < 1:
            raise ValueError("top_terms: n must be >= 1")
        return AnalyzeResult(
            schema=StructType(
                [StructField(f"term_{i + 1}", StringType()) for i in range(k)]
                + [StructField("n_distinct_terms", LongType())]
            )
        )

    def eval(self, text: str, n: int):  # noqa: D102 (driver contract)
        if text is None:
            return
        from collections import Counter

        counts = Counter(_WS.split(text.strip().lower()))
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:n]
        terms = [t for t, _ in top] + [None] * (n - len(top))
        yield (*terms, len(counts))


def register_udtfs(spark) -> None:
    """Register all table functions on the session (idempotent)."""
    spark.udtf.register("shingles", ShingleUDTF)
    spark.udtf.register("top_terms", TopTermsUDTF)
