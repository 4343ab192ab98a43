"""Execution profiling: per-node metrics from the EXECUTED plan.

Plan-shape tests (inspect.py) check what Catalyst *intends*; this module
reads what actually happened — rows and bytes through every node, most
usefully the Exchange nodes, because shuffle volume is THE quantity that
decides whether a plan survives a 1000x scale-up. A query whose exchange
carries the input row count has no map-side combine; one whose exchange
carries the group count is doing partial aggregation correctly.

Works through AQE: AdaptiveSparkPlanExec and query-stage wrappers are
unwrapped to the live executed plan, so metrics reflect the runtime
re-planned tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _children(node):
    name = node.nodeName()
    if name.startswith("AdaptiveSparkPlan"):
        return [node.executedPlan()]
    if "QueryStage" in name:
        return [node.plan()]
    if name.startswith("ReusedExchange"):
        # the referenced exchange's subtree already appears elsewhere in
        # the walk — descending again would double-count its shuffles
        return []
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def _metrics(node) -> dict:
    out = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        out[kv._1()] = kv._2().value()
    return out


def execution_profile(df: DataFrame) -> list[dict]:
    """Execute the plan and return one entry per physical node:
    {node, depth, metrics}; pre-order walk of the executed tree.

    Executes via ``df.collect()`` — a sink write (even noop) builds a
    SEPARATE query execution and leaves this DataFrame's own metric
    registry at zero. This is a diagnostics tool: call it on queries
    whose OUTPUT is small (aggregates, top-k); the interesting metrics
    are about the big intermediate stages, not the result."""
    df.collect()
    root = df._jdf.queryExecution().executedPlan()
    rows: list[dict] = []

    def walk(node, depth=0):
        rows.append(
            {"node": node.nodeName(), "depth": depth, "metrics": _metrics(node)}
        )
        for c in _children(node):
            walk(c, depth + 1)

    walk(root)
    return rows


def shuffle_profile(df: DataFrame) -> list[dict]:
    """Just the Exchange nodes: shuffle bytes (dataSize) and the row
    count feeding each one (its child's numOutputRows when exposed).
    The headline scale question — "how much actually moves" — in one
    call."""
    prof = execution_profile(df)
    out = []
    for i, entry in enumerate(prof):
        if not entry["node"].startswith("Exchange"):
            continue
        feed = None
        # first descendant exposing numOutputRows (codegen wrappers in
        # between carry no row metric of their own)
        for nxt in prof[i + 1 :]:
            if nxt["depth"] <= entry["depth"]:
                break
            if "numOutputRows" in nxt["metrics"]:
                feed = nxt["metrics"]["numOutputRows"]
                break
        out.append(
            {
                "node": entry["node"],
                "data_size_bytes": entry["metrics"].get("dataSize"),
                "input_rows": feed,
            }
        )
    return out
