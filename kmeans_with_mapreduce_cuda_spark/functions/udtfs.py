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


def register_udtfs(spark) -> None:
    """Register all table functions on the session (idempotent)."""
    spark.udtf.register("shingles", ShingleUDTF)
