"""Python user-defined table functions (Spark 4 UDTF API).

UDTFs are the row→rows escape hatch that is still SQL-composable:
registered once, they join the catalog as table functions usable from
``spark.sql`` with LATERAL, so a Python-only transformation slots into
otherwise declarative pipelines. They run in the standard Python
worker (Arrow-batched arguments), not per-row pickling — but they are
still Python: keep them off hot paths that a JVM expression can cover
(`operators/text.py:chunk_tokens` is the JVM chunker; the UDTF here
exists for what expressions can't produce at all).

``PiiSpans`` emits match OFFSETS — `regexp_extract_all` and friends
return matched strings only, so span-level output (needed for
redaction audits, labeling, and span-aligned NER training data) has no
expression-tier equivalent.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

from orx_surgical_spark.operators.text import PII_PATTERNS


@udtf(returnType="pii_type string, start int, end int, matched string")
class PiiSpans:
    """One row per PII match in ``text``: type, [start, end) character
    offsets, and the matched substring — the span-level view of
    :func:`orx_surgical_spark.operators.text.pii_redact` (same
    patterns, so a span report and a scrub can never disagree)."""

    def eval(self, text: str):
        if text is None:
            return
        for pii_type, (pat, _) in PII_PATTERNS.items():
            for m in re.finditer(pat, text):
                yield pii_type, m.start(), m.end(), m.group()


def register_udtfs(spark: SparkSession) -> None:
    """Register all table functions on the session catalog (idempotent:
    re-registration replaces)."""
    spark.udtf.register("pii_spans", PiiSpans)
