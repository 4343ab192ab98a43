"""Lineage-truncation policy for iterative operators.

Unrolled iterative plans (min-label propagation, star contraction,
k-core peeling, Lloyd rounds) must materialize each round or the plan
tree grows exponentially and stalls Catalyst (measured in
graph.kcore_peel_trajectory: round 5 never finishes planning;
persist() alone does NOT help — the cache substitution still
canonicalizes the exponential tree).

Two materialization modes, chosen per call site via ``checkpoint_dir``:

- ``localCheckpoint`` (default): executor-local block storage — fast,
  no durable I/O, right for local[k] and for clusters that accept a
  job retry on executor loss. NON-REPLAYABLE: losing an executor loses
  blocks with no lineage to recompute them, failing the query.
- reliable ``checkpoint`` (``checkpoint_dir`` set): rounds are written
  to the fault-tolerant FS under ``checkpoint_dir`` so an executor
  loss recomputes from durable storage instead of failing — the shape
  a 1000-executor run wants, at the cost of one write+read of the
  round relation per round (ADVICE r7 / VERDICT r7 #6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(
    df: DataFrame, checkpoint_dir: str | None = None, eager: bool = True
) -> DataFrame:
    """Truncate ``df``'s lineage: ``localCheckpoint(eager)`` when
    ``checkpoint_dir`` is None (the default, unchanged behavior), else
    reliable ``checkpoint(eager)`` into ``checkpoint_dir`` (set on the
    SparkContext idempotently — last setting wins, the standard Spark
    contract for a shared context)."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    df.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=eager)
