"""Mergeable frequency sketches (beyond-reference tier).

Completes the sketch family alongside the HLL distinct-count shard
union (`queries/relational_queries.py:hll_shard_union`) and the KLL
rank bands (`sketch_aggregates`): a Misra–Gries heavy-hitters summary
— the deterministic, mergeable answer to "which keys are hot?" when
the key stream is too large for an exact count (hot-join-key
detection at 100 TB, stopword/vocab trimming over a token stream).

Shape at scale: one pass over the keys with ``mapInPandas`` (the MG
eviction loop has no Catalyst-expression equivalent; Arrow batches
keep it off the per-row pickling path). Each partition emits AT MOST
``k`` counter rows plus one slack row, so the merge stage aggregates
``<= (k+1) * n_partitions`` rows — the reduction the sketch exists
for. Merging is counter addition (Agarwal et al. 2012, "Mergeable
summaries"): per-partition guarantees sum, so the global bound holds
for ANY partitioning of the input.

Guarantee (the gate `heavy_hitters_mg` asserts it): for every key,
``0 <= exact_count - est <= total_slack`` where ``est`` is the summed
counter (0 if absent) and ``total_slack`` the summed per-partition
eviction debt. Both inequalities are partitioning-invariant, so the
gate booleans are deterministic even though the sketch contents are
not.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame


def mg_heavy_hitters(df: DataFrame, key_col: str, k: int = 8) -> DataFrame:
    """Per-partition Misra–Gries summaries of ``df[key_col]``.

    Returns ``[key_col string, est long, slack long]``: up to ``k``
    counter rows per partition (``slack = 0``) plus one NULL-key row
    per partition carrying its accumulated eviction debt. Callers sum
    ``est`` per key and ``slack`` globally; see the module docstring
    for the resulting error bound.

    The prune step is the weighted-update form of MG: after folding a
    batch's value_counts into the counter dict, subtract the
    (k+1)-th largest counter value ``d`` from every counter and drop
    the non-positives — at most ``k`` survive, every key's estimate
    fell by at most ``d``, and no estimate ever exceeds the key's true
    occurrence count (counters only ever add true occurrences and
    subtract). ``slack += d`` therefore upper-bounds the undercount.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        slack = 0
        for pdf in batches:
            for key, c in pdf[key_col].value_counts().items():
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > k:
                d = sorted(counters.values(), reverse=True)[k]
                counters = {
                    key: v - d for key, v in counters.items() if v - d > 0
                }
                slack += d
        yield pd.DataFrame(
            {
                key_col: list(counters) + [None],
                "est": list(counters.values()) + [0],
                "slack": [0] * len(counters) + [slack],
            }
        )

    return df.mapInPandas(run, schema=f"{key_col} string, est long, slack long")
