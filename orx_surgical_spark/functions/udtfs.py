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
    patterns, and the same precedence: ``pii_redact`` chains
    ``regexp_replace`` in ``PII_PATTERNS`` order, so text consumed by
    an earlier pattern is gone before a later one runs.  Spans
    replicate that by dropping any match overlapping a span already
    claimed by an earlier pattern — e.g. the IPv4 lookalike inside an
    email-shaped match like ``a@1.2.3.4.com`` yields ONE email span,
    matching how the scrub redacts it once.

    Parity caveat: this containment-overlap rule matches the scrub
    exactly when a later-pattern match is contained in (or disjoint
    from) an earlier span.  For a PARTIAL overlap, the scrub's
    substitution leaves a residual fragment that a later pattern could
    re-match against the substituted text, while the span view drops
    the overlapping match outright — so parity is guaranteed for
    containment overlaps only (the case the tests pin; the current
    pattern set does not produce partial cross-pattern overlaps on
    real-shaped inputs)."""

    def eval(self, text: str):
        if text is None:
            return
        claimed: list[tuple[int, int]] = []
        for pii_type, (pat, _) in PII_PATTERNS.items():
            for m in re.finditer(pat, text):
                s, e = m.start(), m.end()
                if any(s < ce and cs < e for cs, ce in claimed):
                    continue  # inside an earlier pattern's territory
                claimed.append((s, e))
                yield pii_type, s, e, m.group()


def register_udtfs(spark: SparkSession) -> None:
    """Register all table functions on the session catalog (idempotent:
    re-registration replaces)."""
    spark.udtf.register("pii_spans", PiiSpans)
