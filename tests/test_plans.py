"""Plan-shape regression tests: the 100 TB properties, pinned.

These don't check answers (the oracle suite does); they check that the
physical plans keep the shapes that survive a 1000x scale-up.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import goeventstream_spark.queries_llm  # noqa: F401
import goeventstream_spark.queries_ext  # noqa: F401
import goeventstream_spark.queries_r2  # noqa: F401
import goeventstream_spark.queries_r3  # noqa: F401
import goeventstream_spark.queries_r3b  # noqa: F401
import goeventstream_spark.queries_r3c  # noqa: F401  (registers into q.QUERIES)
import goeventstream_spark.queries_r3d  # noqa: F401  (registers into q.QUERIES)
import goeventstream_spark.queries_r3e  # noqa: F401  (registers into q.QUERIES)
import goeventstream_spark.queries_r3f  # noqa: F401  (registers into q.QUERIES)
import goeventstream_spark.queries_r3g  # noqa: F401  (registers into q.QUERIES)
import goeventstream_spark.queries_r3h  # noqa: F401  (registers into q.QUERIES)
import goeventstream_spark.queries_r3i  # noqa: F401  (registers into q.QUERIES)
import goeventstream_spark.queries_r3j  # noqa: F401  (registers into q.QUERIES)
import goeventstream_spark.queries_r3k  # noqa: F401  (registers into q.QUERIES)
import goeventstream_spark.queries_r3l  # noqa: F401  (registers into q.QUERIES)
import goeventstream_spark.queries_r3m  # noqa: F401  (registers into q.QUERIES)
from goeventstream_spark import plans
from goeventstream_spark import queries as q
from goeventstream_spark.sources import load_table


def test_q1_filter_pushdown_and_pruning(spark, sf_dir):
    df = q.QUERIES["tpch_q1_pricing_summary"](spark, sf_dir)
    pushed = plans.pushed_filters(df)
    assert any("l_shipdate" in p for p in pushed), f"shipdate filter not pushed: {pushed}"
    schemas = plans.scan_read_schema(df)
    # only the 7 referenced columns are read, not all 11
    assert schemas and all("l_orderkey" not in s and "l_partkey" not in s for s in schemas), schemas


def test_delta_scan_predicate_reaches_scan(spark, sf_dir):
    # tick range on the derived column can't push below the nanos->ts
    # conversion, but the scan must still prune to referenced columns.
    df = q.QUERIES["delta_scan"](spark, sf_dir)
    assert plans.scan_read_schema(df), "no parquet scan found"


def test_revenue_by_region_broadcasts_dims(spark, sf_dir):
    df = q.QUERIES["revenue_by_region"](spark, sf_dir)
    assert plans.has_broadcast_join(df)
    plan = plans.physical_plan(df)
    assert "SortMergeJoin" not in plan, "dim join fell back to sort-merge"


def test_window_suite_single_exchange(spark, sf_dir):
    # all five window functions share one partitioning: exactly one
    # shuffle exchange in the whole plan
    df = q.QUERIES["order_window_funcs"](spark, sf_dir)
    assert plans.count_exchanges(df) == 1, plans.physical_plan(df)


def test_sessionize_single_exchange(spark, sf_dir):
    df = q.QUERIES["sessionize"](spark, sf_dir)
    assert plans.count_exchanges(df) == 1, plans.physical_plan(df)


def test_projection_pruning_on_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    schemas = plans.scan_read_schema(ev)
    assert schemas and all("props" not in s and "value" not in s for s in schemas), schemas


def test_semi_join_stays_semi(spark, sf_dir):
    df = q.QUERIES["semi_join_customers_with_orders"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "LeftSemi" in plan


def test_range_join_is_equi_not_nested_loop(spark, sf_dir):
    df = q.QUERIES["range_join_order_lineitem_7d"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, "band join degenerated to nested loop"
    assert "CartesianProduct" not in plan


def test_delta_scan_pushes_nanos_range_to_scan(spark, sf_dir):
    """The tick-range predicate must reach the parquet scan as a raw
    INT64 comparison (load_events_delta's monotone translation)."""
    df = q.QUERIES["delta_scan"](spark, sf_dir)
    pushed = plans.pushed_filters(df)
    assert any("ts" in p and ("GreaterThan" in p or "LessThan" in p) for p in pushed), pushed


def test_multigrain_rollup_reuses_hourly_exchange(spark, sf_dir):
    """Day/month grains must re-aggregate the hourly exchange, not
    rescan events — the property that makes the rollup one-shuffle at
    100 TB. ReuseExchange only fires on the *executed* plan."""
    df = q.QUERIES["multigrain_rollup"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ReusedExchange") >= 2, plan


def test_tpch_q17_broadcast_and_single_data_exchange(spark, sf_dir):
    # The brand-filtered part dim must broadcast (no sort-merge join),
    # and the decorrelated per-part threshold must co-compute in ONE
    # data shuffle (the window on l_partkey); the only other exchange
    # is the single-row final aggregate.
    df = q.QUERIES["tpch_q17_small_qty_revenue"](spark, sf_dir)
    assert plans.has_broadcast_join(df)
    plan = plans.physical_plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert plans.count_exchanges(df) <= 2, plan


def test_unpivot_is_narrow_no_exchange(spark, sf_dir):
    # unpivot must stay a narrow Generate over the scan — any exchange
    # here would turn a free transform into a 3x-fact shuffle at scale.
    df = q.QUERIES["unpivot_lineitem_measures"](spark, sf_dir)
    assert plans.count_exchanges(df) == 0, plans.physical_plan(df)


def test_headline_queries_compile_without_codegen_fallback(spark, sf_dir):
    """Every bench headline query must *compile* under whole-stage
    codegen — no silent Janino fallback to interpreted evaluation.

    Round 1's bench tail showed `InternalCompilerException: Code grows
    beyond 64 KB` (embedding_near_dup's 192-term inline cosine inside a
    BroadcastHashJoin consume method). With
    ``spark.sql.codegen.fallback=false`` the fallback becomes a hard
    failure, so this test pins "clean bench stderr" for the whole
    headline set.
    """
    import bench

    prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        # Round 10 (VERDICT r9 #6, guide §2.6 "overlap independent
        # jobs"): the 194 executions are independent; running them from
        # a small thread pool back-fills the stage tails and cut this
        # test ~3x. Job-level conf (codegen.fallback) is session-wide,
        # so every thread still runs under the hard-failure setting.
        from concurrent.futures import ThreadPoolExecutor

        def _run(name: str) -> None:
            q.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()

        names = list(dict.fromkeys(bench.HEADLINE))
        with ThreadPoolExecutor(max_workers=4) as pool:
            list(pool.map(_run, names))
    finally:
        spark.conf.set("spark.sql.codegen.fallback", prev)


def test_tpch_q3_topk_is_take_ordered(spark, sf_dir):
    """Global top-10 must plan as TakeOrderedAndProject (per-partition
    top-k + driver merge), never an unpartitioned row_number window
    funneling billions of groups through one task. The only Window
    allowed is the rk derivation AFTER the 10-row take."""
    df = q.QUERIES["tpch_q3_shipping_priority"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    before_take = plan.split("TakeOrderedAndProject")[-1]
    assert "Window" not in before_take, plan


def test_decontaminate_broadcasts_benchmark_shingles(spark, sf_dir):
    # The benchmark shingle set must broadcast (it is tiny vs the
    # corpus at scale); the corpus-side shingle stream joins map-side
    # with no sort-merge on the shingle key.
    df = q.QUERIES["decontaminate"](spark, sf_dir)
    assert plans.has_broadcast_join(df)
    assert "SortMergeJoin" not in plans.physical_plan(df)


def test_q19_disjunction_pushes_to_both_scans(spark, sf_dir):
    """The OR-of-ANDs predicate spanning both join sides must CNF-split
    so each scan gets its own side's disjunction (l_quantity bounds on
    the lineitem scan, p_brand/p_size on the part scan) — losing this
    means a full-fact scan at 100 TB."""
    df = q.QUERIES["tpch_q19_disjunctive_revenue"](spark, sf_dir)
    plan = plans.physical_plan(df)
    scans = [seg for seg in plan.split("FileScan parquet") if "DataFilters" in seg]
    li_scan = next(s for s in scans if "l_quantity" in s.split("DataFilters")[0])
    part_scan = next(s for s in scans if "p_brand" in s.split("DataFilters")[0])
    assert "l_quantity" in li_scan.split("DataFilters")[1].split("]")[0]
    assert "p_brand" in part_scan.split("DataFilters")[1].split("]")[0]


def test_weighted_sample_topk_is_take_ordered(spark, sf_dir):
    """The weighted-sample global top-100 must plan as
    TakeOrderedAndProject, not a global sort or single-partition
    window — at 100 TB the priority relation has one row per item."""
    import goeventstream_spark.queries_r2  # noqa: F401

    df = q.QUERIES["weighted_sample_lineitems"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan


def test_concurrency_sweep_windows_are_day_partitioned(spark, sf_dir):
    """The sweep-line prefix sum over the boundary relation must be
    partitioned by day; the only unpartitioned window runs over the
    one-row-per-day aggregate (bounded by calendar length)."""
    import goeventstream_spark.queries_r2  # noqa: F401

    df = q.QUERIES["max_concurrent_sessions"](spark, sf_dir)
    plan = plans.physical_plan(df)
    wins = [seg.split("\n")[0] for seg in plan.split("Window [")[1:]]
    # sessionize (lag + cumsum) + in-day prefix sum + day carry; the
    # explode-based boundary fan-out must NOT have duplicated the
    # sessionize subtree (a union formulation doubles these).
    assert len(wins) == 4, plan
    # Exactly one window may be unpartitioned — the carry over the
    # one-row-per-day aggregate. Physical text shows partitioned
    # windows as "...], [partCols], [ord ASC...]", unpartitioned as
    # "...], [ord ASC...]" — count nodes whose first bracket group
    # after the exprs is already the sort spec.
    unpart = [
        w
        for w in wins
        if "ASC" in w.split("], [")[1] or "DESC" in w.split("], [")[1]
    ]
    assert len(unpart) == 1, wins
    assert "day" in unpart[0].split("], [")[1], wins


def test_pagerank_iterations_broadcast_no_cartesian(spark, sf_dir):
    """After the one heavy edge aggregation, every power-iteration join
    runs over the tiny aggregated graph: broadcast joins only, no
    CartesianProduct, no windows, no sort-merge join on the rank
    relation."""
    import goeventstream_spark.queries_r2  # noqa: F401

    df = q.QUERIES["nation_pagerank"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "Window" not in plan, plan
    assert plans.has_broadcast_join(df)


def test_basket_pairs_self_join_is_hash_not_nested_loop(spark, sf_dir):
    """Pair generation must plan as a hash join ON THE ORDER KEY with
    the part inequality as a join filter — an all-pairs nested loop
    over parts would be n^2 at 100 TB. The only NL join allowed is the
    one-row grand-total scalar cross."""
    import goeventstream_spark.queries_r2  # noqa: F401

    df = q.QUERIES["basket_pair_lift"](spark, sf_dir)
    plan = plans.physical_plan(df)
    join_lines = [ln for ln in plan.split("\n") if "Join" in ln]
    hash_on_orderkey = [
        ln for ln in join_lines if "HashJoin" in ln and "l_orderkey" in ln
    ]
    assert hash_on_orderkey, join_lines
    nl = [ln for ln in join_lines if "NestedLoop" in ln]
    assert all("Cross" in ln for ln in nl), join_lines
    assert len(nl) <= 1, join_lines


def test_triangle_count_no_cartesian_no_global_window(spark, sf_dir):
    import goeventstream_spark.queries_r2  # noqa: F401

    df = q.QUERIES["part_triangles_topk"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_unigram_fluency_broadcasts_vocab(spark, sf_dir):
    # The unigram table is vocab-bounded: it must come back as a
    # broadcast, and the top-15 must be TakeOrderedAndProject.
    import goeventstream_spark.queries_r2  # noqa: F401

    df = q.QUERIES["unigram_fluency_topk"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert plans.has_broadcast_join(df), plan
    assert "TakeOrderedAndProject" in plan, plan


def test_attribution_single_window_exchange(spark, sf_dir):
    # Both attribution models share one user-keyed window pass: the
    # events relation is shuffled exactly once before the final
    # (tiny) channel aggregates.
    import goeventstream_spark.queries_r2  # noqa: F401

    df = q.QUERIES["attribution_by_channel"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert plan.count("Window") <= 2, plan  # one logical window (maybe reused)


def test_incremental_sessionize_matches_full_recompute_any_cutoff(spark, sf_dir):
    # The incremental fold must equal from-scratch sessionization for
    # ANY history/delta split, not just the declared query's cutoff —
    # including cutoffs that slice through the middle of sessions.
    import goeventstream_spark.queries_r2  # noqa: F401
    from goeventstream_spark.operators import stream_ops as so
    from goeventstream_spark.operators import temporal as tp

    # NULL cents injected (fixtures have none): sum() must skip NULLs
    # and only an all-NULL session yields NULL — including sessions the
    # incremental fold merges across the cutoff boundary.
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.when(F.col("event_id") % 7 != 0, F.round(F.col("value") * 100))
        .cast("long").alias("cents"),
    )

    def stats(df):
        return (
            so.sessionize(df, gap_s=3600)
            .groupBy("user_id", "session_id")
            .agg(
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
                F.count("*").alias("n_events"),
                F.sum("cents").alias("cents"),
            )
            .drop("session_id")
        )

    full = {tuple(r) for r in stats(ev).collect()}
    for cutoff in ["2024-01-03 07:00:00", "2024-01-15 12:34:56", "2024-01-29 23:00:00"]:
        c = F.lit(cutoff).cast("timestamp")
        inc = tp.incremental_sessionize(
            stats(ev.where(F.col("ts") < c)), ev.where(F.col("ts") >= c), gap_s=3600
        )
        got = {tuple(r) for r in inc.collect()}
        assert got == full, f"cutoff {cutoff}: {len(got ^ full)} differing sessions"


def test_column_profile_pruned_branches_no_expand(spark, sf_dir):
    # Per-column branches: no multi-distinct Expand (x7 row blowup),
    # and every branch's parquet scan is pruned to at most one source
    # column (columnar re-scan costs ~the same bytes as one wide scan).
    import goeventstream_spark.queries_r2  # noqa: F401

    df = q.QUERIES["column_profile_orders"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "Expand" not in plan, plan
    schemas = plans.scan_read_schema(df)
    assert schemas, "no parquet scans found"
    for sch in schemas:
        n_cols = 0 if sch in ("struct<>", "") else sch.count(":")
        assert n_cols <= 1, f"branch scan reads {sch}"


def test_pareto_has_no_per_user_window(spark, sf_dir):
    # The concentration report must rank count-BUCKETS, not users: no
    # row_number in the plan; the only window runs over the bucket
    # relation after two aggregations.
    import goeventstream_spark.queries_r2  # noqa: F401

    df = q.QUERIES["pareto_user_concentration"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "row_number" not in plan, plan


def test_connects_window_is_game_partitioned(spark, sf_dir):
    """The R5 proxy counter is per game (model/game.go:49-53): the
    declared connects query must contain NO unpartitioned Window — the
    row_number runs inside a per-game partition."""
    df = q.QUERIES["connects"](spark, sf_dir)
    plan = plans.physical_plan(df)
    wins = [seg.split("\n")[0] for seg in plan.split("Window [")[1:]]
    assert wins, plan  # the counter window must exist
    for w in wins:
        spec = w.split("], [")[1]
        assert "ASC" not in spec and "DESC" not in spec, f"unpartitioned window: {w}"
        assert "game" in spec, f"window not keyed by game: {w}"


def test_bm25_partial_topk_and_single_word_explode(spark, sf_dir):
    """BM25 term ranking must push the per-doc top-k below the final
    window shuffle (WindowGroupLimit partial+final) and generate the
    words explode once per aggregate consumer — never a cartesian
    between full word relations; the corpus/avgdl one-row aggregates
    ride broadcast nested-loop joins."""
    import goeventstream_spark.queries_r3  # noqa: F401

    df = q.QUERIES["bm25_term_topk"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert plan.count("WindowGroupLimit") >= 2, plan  # partial + final
    assert "CartesianProduct" not in plan, plan
    scans = plans.scan_read_schema(df)
    assert scans and all(
        "lang" not in s and "source" not in s and "n_chars" not in s for s in scans
    ), scans


def test_bpe_merge_candidates_is_take_ordered(spark, sf_dir):
    """The global top-20 pair take must plan as TakeOrderedAndProject
    over the bounded pair aggregate; the only Window allowed is the rk
    derivation AFTER the 20-row take (same contract as Q3/top-k)."""
    import goeventstream_spark.queries_r3  # noqa: F401

    df = q.QUERIES["bpe_merge_candidates"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    before_take = plan.split("TakeOrderedAndProject")[-1]
    assert "Window" not in before_take, plan


def test_bloom_report_joins_are_broadcast_not_sortmerge(spark, sf_dir):
    """Every join in the bloom confusion report touches a bounded
    relation (<= m positions / distinct probe keys), so the plan must
    stay broadcast — a sort-merge exchange here would shuffle the
    probe side at 100 TB for no reason."""
    import goeventstream_spark.queries_r3  # noqa: F401

    df = q.QUERIES["bloom_membership_report"](spark, sf_dir)
    assert plans.has_broadcast_join(df)


def test_semdedup_prune_single_block_shuffle(spark, sf_dir):
    """SemDeDup pruning must shuffle the corpus ONCE (on the block
    key for pair generation); the dominated-id anti-join is against a
    collision-bounded pair relation, never a second full-corpus
    sort-merge on a non-key column."""
    import goeventstream_spark.queries_r3  # noqa: F401

    df = q.QUERIES["semdedup_prune"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "NestedLoop" not in plan, plan


def test_label_centroid_join_is_broadcast(spark, sf_dir):
    """The label->centroid dimension is one row per cluster; joining
    it back to the corpus must broadcast, never shuffle the embedding
    table on label."""
    import goeventstream_spark.queries_r3  # noqa: F401

    df = q.QUERIES["label_centroid_outliers"](spark, sf_dir)
    assert plans.has_broadcast_join(df)
    assert "SortMergeJoin" not in plans.physical_plan(df)


def test_temperature_mix_corpus_never_shuffles(spark, sf_dir):
    """The mixture rates derive from a bounded group-count aggregate
    and broadcast back — the corpus side of temperature_mix must join
    by broadcast, never sort-merge on the group key."""
    import goeventstream_spark.queries_r3  # noqa: F401

    from goeventstream_spark.operators.sampling import temperature_mix

    df = temperature_mix(load_table(spark, sf_dir, "documents"), "lang")
    assert plans.has_broadcast_join(df)
    assert "SortMergeJoin" not in plans.physical_plan(df)


def test_knn_graph_single_block_shuffle(spark, sf_dir):
    """kNN-graph pair generation must shuffle on the block key only;
    no cartesian/nested-loop anywhere (the label equi-join bounds the
    candidates)."""
    import goeventstream_spark.queries_r3  # noqa: F401

    df = q.QUERIES["knn_graph_within_label"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "NestedLoop" not in plan, plan


def test_interval_align_is_single_key_join(spark, sf_dir):
    """The temporal alignment join must be ONE equi-join on the key
    with the overlap predicate as residual — a theta-only join would
    go nested-loop and die at scale."""
    import goeventstream_spark.queries_r3  # noqa: F401

    df = q.QUERIES["interval_align_activity_band"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "NestedLoop" not in plan, plan


def test_lsh_pair_relation_stays_narrow(spark, sf_dir):
    """The LSH candidate-pair relation must expose ONLY
    (doc_a, doc_b, est_jaccard): carrying the per-component _eq alias
    columns through the distinct sent Catalyst's constraint
    propagation combinatorial as soon as a consumer joined the pairs
    onward (the optimizer never returned). Pin the narrow shape and
    that the dim joins of the cross-source matrix broadcast."""
    from goeventstream_spark.operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_near_dedup(docs)
    assert pairs.columns == ["doc_a", "doc_b", "est_jaccard"], pairs.columns
    assert "_eq0" not in plans.physical_plan(pairs)

    # materializing this plan at all is the regression signal: with the
    # wide shape, optimization of pairs ⋈ dim ⋈ dim never terminated
    df = q.QUERIES["cross_source_dup_matrix"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "SortMergeJoin" not in plan, "source dim join fell back to sort-merge"


def test_heavy_hitters_verify_join_is_broadcast(spark, sf_dir):
    # propose = shuffle-free mapInPandas; verify = corpus semi-joined to
    # the BROADCAST candidate set, then one bounded-key aggregation.
    df = q.QUERIES["heavy_hitter_words"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    assert "SortMergeJoin" not in plan, "candidate semi-join fell back to sort-merge"


def test_kmeans_assignment_is_map_only(spark, sf_dir):
    # the per-iteration assignment must be a pure map pass: centroids
    # are driver-held literals, so NO join may appear in the plan.
    from goeventstream_spark.operators import clustering

    emb = load_table(spark, sf_dir, "embeddings")
    vectors = clustering.quantize_vectors(emb)
    centroids = [list(r.v) for r in vectors.orderBy("vec_id").limit(4).collect()]
    assigned = clustering.assign(vectors, centroids)
    plan = plans.physical_plan(assigned)
    assert "Join" not in plan, f"assignment not a map pass:\n{plan}"
    assert plans.count_exchanges(assigned) == 0, "assignment shuffled"


def test_hybrid_rrf_query_side_is_broadcast(spark, sf_dir):
    # both retrievers keep the query batch on the broadcast side; no
    # sort-merge join anywhere in the fused plan.
    df = q.QUERIES["hybrid_rrf_search"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastExchange") >= 2, "query sides not broadcast"


def test_er_golden_pair_join_blocked_not_cartesian(spark, sf_dir):
    # the fuzzy pair step must be an equi-join keyed on the q-gram
    # (data-scalable posting lists — candidates track gram collisions,
    # not block-size²) plus the query's exact p_size block; never a
    # cartesian/theta-only product. The gram must be IN the hash-join
    # key list: a p_size-only key would silently degrade to the
    # O(n²/50) within-block shape the round-4 verdict flagged.
    from goeventstream_spark.queries_r3b import er_part_fuzzy_pairs
    from goeventstream_spark.sources.tables import load_table

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_size", "p_brand", "p_retailprice"
    )
    plan = plans.physical_plan(er_part_fuzzy_pairs(part))
    assert "CartesianProduct" not in plan, plan
    import re

    joins = re.findall(
        r"(?:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[([^\]]*)\], \[([^\]]*)\]",
        plan,
    )
    assert any(
        "gram_a" in left and "p_size_a" in left
        and "gram_b" in right and "p_size_b" in right
        for left, right in joins
    ), plan


def test_ivf_fixed_probe_join_shapes(spark, sf_dir):
    # assignment/probing are literal-broadcast map work; the only join
    # is the probe's cluster_id equi-join — no sort-merge, no cartesian.
    df = q.QUERIES["ivf_fixed_topk"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_pq_fixed_encode_is_map_only_and_adc_broadcasts(spark, sf_dir):
    # encoding must be a pure map pass (codebooks are literals): zero
    # exchanges, zero joins in the codes relation; the ADC scan joins
    # only against the broadcast query batch.
    from goeventstream_spark.operators import clustering

    emb = load_table(spark, sf_dir, "embeddings")
    vectors = clustering.quantize_vectors(emb)
    cents = []
    for s in range(4):
        vs = vectors.select(
            "vec_id", F.slice(F.col("v"), s * 16 + 1, 16).alias("v")
        )
        _, c = clustering.kmeans_fit(vs, k=4, iters=1)
        cents.append(c)
    code_cols = []
    for s in range(4):
        best = F.least(
            *[
                F.struct(
                    clustering._sqdist(
                        F.slice(F.col("v"), s * 16 + 1, 16), c
                    ).alias("d"),
                    F.lit(cid).cast("long").alias("cid"),
                )
                for cid, c in enumerate(cents[s])
            ]
        )
        code_cols.append(best.getField("cid").alias(f"code_{s}"))
    codes = vectors.select("vec_id", *code_cols)
    cplan = plans.physical_plan(codes)
    assert "Join" not in cplan and plans.count_exchanges(codes) == 0, cplan

    full = q.QUERIES["pq_fixed_adc_topk"](spark, sf_dir)
    plan = plans.physical_plan(full)
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastExchange" in plan, plan


def test_basket_rules_topk_is_take_ordered(spark, sf_dir):
    # the global top-20 must plan as TakeOrderedAndProject; the only
    # Window allowed is the rk derivation AFTER the 20-row take.
    df = q.QUERIES["basket_pair_rules"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan.split("TakeOrderedAndProject")[-1], plan


def test_bigram_lm_broadcast_and_take_ordered(spark, sf_dir):
    # vocabulary-bounded count tables must broadcast back onto the
    # bigram stream (no sort-merge on the corpus side) and the global
    # top-15 must plan as TakeOrderedAndProject; the only Window is
    # the per-doc lead(), partitioned by doc_id — never global.
    df = q.QUERIES["bigram_lm_fluency_topk"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_bootstrap_ci_single_agg_shuffle(spark, sf_dir):
    # the 64x replicate fan-out must be map-side (explode of a literal
    # sequence — no join introducing it) and the draw itself pure
    # expressions: no Python eval in the plan, partial aggregation
    # before the (priority, b) exchange.
    df = q.QUERIES["bootstrap_revenue_ci"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "partial" in plan.lower(), plan


def test_edge_strength_triangle_probe_broadcasts(spark, sf_dir):
    # the wedge stream (the big side) must probe the closing-edge set
    # via a broadcast hash join — shuffling sum(outdeg^2) wedge rows
    # is the quadratic blowup this query exists to avoid.
    df = q.QUERIES["edge_strength_ra_topk"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_rfm_ntile_windows_never_span_data_rows(spark, sf_dir):
    """exact_global_ntile must keep every data-row window partitioned
    (by partition id); the only unpartitioned windows run over the
    partition-count-sized offset relation — one row per partition,
    bounded by cluster width, never by data volume. (The full RFM plan
    truncates at each score's materialization, so the shape is pinned
    on a single operator application plus an ntile-free check on the
    full query.)"""
    from goeventstream_spark.operators.relational import exact_global_ntile

    cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("frequency"))
    )
    one = exact_global_ntile(
        cust, [F.desc("frequency"), F.asc("o_custkey")], 5, "f"
    )
    plan = plans.physical_plan(one)
    wins = [seg.split("\n")[0] for seg in plan.split("Window [")[1:]]
    assert wins, plan
    unpart = [
        w
        for w in wins
        if "ASC" in w.split("], [")[1] or "DESC" in w.split("], [")[1]
    ]
    part = [w for w in wins if w not in unpart]
    assert len(part) == 1, wins  # the rank window, keyed by _pid
    assert "_pid" in part[0].split("], [")[1], part
    for w in unpart:
        assert "_pid" in w, w  # offset prefix over per-partition counts
    assert "ntile" not in plan, plan
    # the declared query must never fall back to a raw global ntile
    full = plans.physical_plan(q.QUERIES["rfm_segments"](spark, sf_dir))
    assert "ntile" not in full, full


def test_frequent_triples_keyed_joins_and_take_ordered(spark, sf_dir):
    # triple enumeration must join on the basket key (never a
    # cartesian over parts — work is sum C(basket,3), not |parts|^3);
    # the only nested-loop join allowed is the 1-row totals dim; the
    # global top-15 plans as TakeOrderedAndProject.
    df = q.QUERIES["frequent_triples"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_rolling_actives_fanout_is_generator_not_range_join(spark, sf_dir):
    # the trailing-7-day fan-out must be a map-side explode of a
    # 7-element sequence (Generate), never a theta/range join; the
    # only nested-loop join is the 1-row bounds broadcast.
    df = q.QUERIES["rolling_active_users_7d"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "Generate" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan


def test_key_skew_report_take_ordered_window_after_limit(spark, sf_dir):
    # heavy-hitter selection is TakeOrderedAndProject; the cumulative
    # window runs AFTER the 10-row take (appears later in the plan
    # text), never over all keys.
    df = q.QUERIES["key_skew_report"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" in plan, plan
    assert "TakeOrderedAndProject" in plan.split("Window")[-1], plan


def test_bloom_probe_join_is_broadcast(spark, sf_dir):
    # the probe-cells -> bit-set membership join must be a broadcast
    # hash join (the bit set is bounded by m = 16384 positions); lane
    # and scalar fan-ins are bounded-row nested-loop broadcasts only.
    df = q.QUERIES["bloom_filter_fp_audit"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_knn_vote_label_joins_broadcast(spark, sf_dir):
    # neighbor-label and truth-label dims must broadcast onto the
    # k x |queries| top-k rows; every window is query_id-partitioned.
    df = q.QUERIES["knn_label_vote"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_daily_checksums_single_exchange(spark, sf_dir):
    # one map-side hash projection + one day-keyed agg: exactly one
    # shuffle in the whole plan, with map-side partial aggregation.
    df = q.QUERIES["daily_table_checksums"](spark, sf_dir)
    assert plans.count_exchanges(df) == 1, plans.physical_plan(df)
    assert "partial" in plans.physical_plan(df).lower()


def test_cep_single_window_single_exchange(spark, sf_dir):
    # the whole negation-pattern match is ONE user-keyed window pass
    # (two conditional running maxes share the frame) + the per-user
    # agg on the same partitioning: exactly one shuffle.
    df = q.QUERIES["cep_clean_conversions"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert plans.count_exchanges(df) == 1, plan
    assert plan.count("Window") == 1, plan


def test_similar_day_pairs_hod_keyed_take_ordered(spark, sf_dir):
    # the pair join must key on hour-of-day (hash join), never a
    # cartesian over days; top-10 is TakeOrderedAndProject; the only
    # nested-loop joins are the bounded 24-row hour spine fan-ins.
    df = q.QUERIES["similar_day_pairs"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_fd_audit_is_pure_aggregation(spark, sf_dir):
    # FD discovery is agg-only: no join of any kind anywhere in the
    # plan — each candidate is an independent two-level hash agg.
    df = q.QUERIES["fd_violation_audit"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "Join" not in plan, plan


def test_revenue_hierarchy_single_fact_scan(spark, sf_dir):
    # the fact (orders) must be scanned/joined ONCE — the region and
    # global totals re-aggregate the checkpointed (region, nation)
    # rollup instead of re-running the star join per consumer.
    df = q.QUERIES["revenue_share_hierarchy"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastHashJoin") <= 4, plan


# Queries whose ORDERED UNPARTITIONED windows run over a provably
# bounded domain — the ONLY class allowed by the repo-wide gate below.
# A global ordered window's input sorts into a single task, so every
# entry must justify why its window input cannot scale with the corpus.
_BOUNDED_GLOBAL_WINDOWS = {
    # limit-fed: the window input is a TakeOrderedAndProject result
    "basket_pair_rules": "top-20 pair rows via limit before the window",
    "bpe_merge_candidates": "top-20 merge candidates via limit",
    "collocations_topk": "top-20 bigrams via limit",
    "key_skew_report": "top-10 keys via limit + 1-row broadcast total",
    "tpch_q3_shipping_priority": "top-10 orders via limit (Q3 rank page)",
    "tpch_q10_returned_items": "top-20 customers via limit (Q10 rank page)",
    "vocab_coverage": "top-100 tokens via limit + 1-row broadcast total",
    # fixed/bucketed domains
    "decile_lift_table": "10 deciles (+ _pid partial-merge windows)",
    "lorenz_curve_percentiles": "100 centiles (+ _pid partial merges)",
    "histogram_quantiles": "fixed histogram bucket count",
    "hourly_peaks": "24 hour-of-day rows",
    "seasonal_decompose_hourly": "24 hour-of-day rows",
    "skyline_parts": "p_size domain (TPC-H: 50 values)",
    "rfm_segments": "_pid partial-merge window (#partitions rows)",
    "equi_depth_boundaries": "_pid partial-merge window",
    "er_sorted_neighborhood_pairs": "_pid partial-merge window",
    "global_value_percentiles": "_pid partial-merge window",
    "quantile_normalize_orders": "_pid partial-merge window",
    # calendar-bounded domains (one row per day/month)
    "daily_user_accounting": "one row per calendar day",
    "max_concurrent_sessions": "one row per calendar day",
    "revenue_mom_growth": "one row per calendar month",
    "survival_table": "one row per churn day",
    # distinct-VALUE blocks (the gini_by_segment hardening): the window
    # scans distinct measure values, never raw rows
    "ab_test_mann_whitney": "distinct per-unit activity counts",
    "pareto_user_concentration": "distinct per-user activity counts",
    "kaplan_meier_sessions": "distinct session durations (seconds)",
    "source_drift_ks": "distinct document lengths",
    # reference-protocol replay: the poll log of ONE game generation is
    # sequential by protocol semantics (T = LastSentT+1 is a chain)
    "protocol_deliveries": "single-game poll chain (reference semantics)",
    "sync_backlog_stats": "single-game poll chain (reference semantics)",
}


def _top_level_bracket_groups(s: str) -> list[str]:
    groups, depth, cur = [], 0, None
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = ""
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(cur)
                cur = None
                continue
        if cur is not None:
            cur += ch
    return groups


def _ordered_unpartitioned_windows(plan: str) -> bool:
    """True if any Window node orders WITHOUT partitioning (node shape
    `Window [exprs], [orderSpec]` — two bracket groups with ASC/DESC in
    the last; partitioned nodes have three, partition-only windows have
    an order-free second group)."""
    for line in plan.splitlines():
        ls = line.strip()
        idx = ls.find("- Window ")
        if idx < 0:
            continue
        groups = _top_level_bracket_groups(ls[idx + 2 :])
        if len(groups) == 2 and (" ASC" in groups[1] or " DESC" in groups[1]):
            return True
    return False


def test_repo_wide_plan_gates(spark, sf_dir):
    """Repo-wide anti-pattern gates, one plan pass over EVERY
    registered query:

    (a) NO row-at-a-time Python UDF (BatchEvalPython). Python is
        allowed only through Arrow (ArrowEvalPython / mapInPandas /
        applyInPandas); a row-wise UDF in any declared query is a
        10-100x hot-path regression at 100 TB.
    (b) NO ordered unpartitioned window outside the audited
        bounded-domain whitelist. A global ordered window sorts its
        whole input into a single task — over a data-scaling relation
        (raw rows, users, a web corpus's vocabulary) that is the
        classic 100 TB scale-killer. Every whitelisted query documents
        why its window domain is bounded; new queries must either
        partition their windows, pre-limit (TakeOrderedAndProject),
        reduce to a bounded value-block relation first, or join the
        whitelist with a justification."""
    # Round 10 (VERDICT r9 #6): planning the 312 queries is driver-side
    # JVM work behind py4j (the GIL is released on the socket wait), so
    # a thread pool cuts the pass ~4x without touching what is checked.
    from concurrent.futures import ThreadPoolExecutor

    def _census(name: str) -> tuple[str, bool, bool]:
        try:
            plan = plans.physical_plan(q.QUERIES[name](spark, sf_dir))
        except Exception as exc:  # pragma: no cover - surface the name
            raise AssertionError(f"{name}: plan generation failed: {exc}")
        return (
            name,
            "BatchEvalPython" in plan,
            _ordered_unpartitioned_windows(plan)
            and name not in _BOUNDED_GLOBAL_WINDOWS,
        )

    rowwise, unlisted = [], []
    with ThreadPoolExecutor(max_workers=8) as pool:
        for name, is_rowwise, is_unlisted in pool.map(
            _census, sorted(q.QUERIES)
        ):
            if is_rowwise:
                rowwise.append(name)
            if is_unlisted:
                unlisted.append(name)
    assert not rowwise, f"row-wise Python UDFs in: {rowwise}"
    assert not unlisted, (
        f"ordered unpartitioned windows outside the bounded-domain "
        f"whitelist: {unlisted}"
    )


def test_round5_curation_queries_are_map_plus_agg_only(spark, sf_dir):
    # url_canonical_dedup, hashed_linear_quality and
    # quality_filter_with_exploration are pure map passes feeding hash
    # aggregations — at 100 TB their only shuffles are the (map-side
    # combinable) aggregation exchanges. No join of any kind may
    # appear: the classifier's weights are computed inline from the
    # token (the hashing trick's whole point — no vocabulary relation)
    # and canonicalization is per-row string algebra.
    for name in (
        "url_canonical_dedup",
        "hashed_linear_quality",
        "quality_filter_with_exploration",
    ):
        plan = plans.physical_plan(q.QUERIES[name](spark, sf_dir))
        assert "Join" not in plan, (name, plan)
        assert "CartesianProduct" not in plan, (name, plan)


def test_approx_stats_no_expand_no_value_buffering(spark, sf_dir):
    # The r6 restructure's plan contract: no Expand (countDistinct runs
    # in its own narrow agg), no window, exact percentiles over the
    # compressed value-count relation, and the two 3-row join inputs
    # broadcast — a sort-merge join or Expand here means the per-group
    # value-buffering OOM shape crept back.
    plan = plans.physical_plan(q.QUERIES["approx_stats"](spark, sf_dir))
    assert "Expand" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 2, plan


def test_capped_near_dup_data_path_joinless(spark, sf_dir):
    # ivf_cell_assign_capped's whole assignment (base cells, hot-cell
    # rewrite) must stay literal-broadcast map passes: the declared
    # query's ONLY join-free exception is the pair generator's single
    # block-key exchange. Any Join/Cartesian in this plan means the
    # guard started shuffling the corpus to train.
    plan = plans.physical_plan(
        q.QUERIES["embedding_near_dup_capped"](spark, sf_dir)
    )
    assert "Join" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("Exchange") <= 2, plan


def test_kmv_report_sketch_joins_broadcast_no_sort_merge(spark, sf_dir):
    # The KMV pair machinery operates on k-row-per-type relations: the
    # type-pair theta join and every sketch-side equi-join must ride
    # broadcasts. A SortMergeJoin would mean a full shuffle of what is
    # by construction a bounded (<= k * |types|) relation. The exact
    # intersection audit joins on the 48-bit hash (equi, any strategy);
    # what is pinned is that no cartesian product appears.
    plan = plans.physical_plan(q.QUERIES["kmv_setops_report"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_bpe_trainer_winner_is_take_ordered_broadcast(spark, sf_dir):
    # Each BPE step's winning pair is a TakeOrderedAndProject(1) over
    # the bounded pair alphabet, broadcast back over the vocabulary —
    # never a sort-merge join, never a cartesian of data-sized inputs.
    plan = plans.physical_plan(q.QUERIES["bpe_train_steps"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_jl_projection_sign_matrix_broadcast_map_agg_only(spark, sf_dir):
    # The 1024-row sign matrix must broadcast; the rest of the audit is
    # explode + two map-side-combinable aggregations + the final
    # vec-keyed join. No sort-merge path for the sign matrix.
    plan = plans.physical_plan(q.QUERIES["jl_projection_audit"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_aqp_estimates_single_scan_single_agg(spark, sf_dir):
    # Both the exact and the weighted-sample estimates fold into ONE
    # aggregation over ONE scan of orders — the audit adds no extra
    # shuffle beyond the group-by exchange.
    plan = plans.physical_plan(q.QUERIES["aqp_sample_estimates"](spark, sf_dir))
    assert "Join" not in plan, plan
    assert plan.count("Exchange") <= 1, plan
    assert plan.count("Scan parquet") == 1, plan


def test_hot_cell_guard_two_phase_detection(spark):
    """The capped-assign guard's own detection passes must never window
    over the raw rows of a hot cell (a corpus-fraction partition by
    definition — VERDICT r6 finding #2): populations are a plain
    partial-aggregating groupBy, and the per-cell seed rank follows the
    kmv_bottom_k two-phase discipline — the only Window partitioned by
    bare `cell` sits ABOVE the `_rn <= k` survivor filter, so it ranks
    at most k * n_partitions rows per cell."""
    import re

    from goeventstream_spark.operators.clustering import hot_cell_detection_plans

    base = spark.range(0, 1000).select(
        (F.col("id") % 3).alias("cell"),
        F.col("id").alias("vec_id"),
        F.array(F.col("id"), F.col("id") * 2).alias("v"),
    )
    counts, seeds = hot_cell_detection_plans(base, k=4)

    cplan = plans.physical_plan(counts)
    assert "Window" not in cplan, cplan
    assert "HashAggregate" in cplan, cplan

    splan = plans.physical_plan(seeds)
    wins = [m.start() for m in re.finditer(r"\bWindow\b", splan)]
    assert len(wins) == 2, splan
    # the partition-local phase exists (its spec carries _pid)...
    assert "_pid" in splan, splan
    # ...and the bare-cell outer window (printed first, top-down) is fed
    # by the phase-1 survivor filter: a Filter on _rn sits between the
    # two Window nodes in the plan text.
    between = splan[wins[0] : wins[1]]
    assert "_rn" in between and "Filter" in between, splan


def test_link_prediction_hub_cap_below_wedge_join(spark, sf_dir):
    """The deg<=64 hub cap must filter wedge CENTERS before the wedge
    self-join (hub wedges never enumerate — the deg² blowup is cut at
    the source), and the O(|V|) degree relation must NOT carry a forced
    broadcast hint (AQE may still choose broadcast from actual size;
    either join strategy is acceptable, the hint is not)."""
    import re

    import goeventstream_spark.queries_r6  # noqa: F401

    df = q.QUERIES["link_prediction_ra_topk"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    i_cap = plan.index("<= 64")
    joins_before = re.findall(
        r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin",
        plan[:i_cap],
    )
    # top-down print order: anti-join, wedge self-join, and the capped
    # center join all sit ABOVE the hub-cap filter — with the old
    # post-join filter only the anti-join printed before it
    assert len(joins_before) >= 3, plan


def test_substring_dedup_runs_plan_shape(spark, sf_dir):
    """Substring dedup's 100 TB contract: the top-200 is a bounded
    TakeOrderedAndProject (never a global sort), pair generation is
    equi-joins on the gram hash (no cartesian/nested-loop), and the
    islands window partitions by (pair, diagonal) — never unpartitioned."""
    import goeventstream_spark.queries_r7  # noqa: F401
    from goeventstream_spark.operators import dedup as _d

    # this test pins the DETECTION pipeline's plan; a warm
    # shared_substring_runs memo (populated by any earlier test that
    # ran the queries) would replace it with an InMemoryTableScan
    _d.clear_shared_runs_cache()
    df = q.QUERIES["substring_dedup_runs"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "NestedLoop" not in plan, plan
    assert "windowspecdefinition(doc_a" in plan, plan
    # NOTHING in this pipeline may broadcast: the gram table, the
    # stop-list, and the match sides are all corpus-sized, and
    # Catalyst's static estimate through Generate once planned a
    # 67 MB broadcast of the whole gram relation here (r7 regression;
    # merge hints pin the spill-safe shape)
    assert "BroadcastHashJoin" not in plan, plan
    for name in ("substring_dedup_coverage", "substring_dedup_strip_report"):
        _d.clear_shared_runs_cache()  # pin the full pipeline, not the cache
        p2 = plans.physical_plan(q.QUERIES[name](spark, sf_dir))
        assert "BroadcastHashJoin" not in p2, (name, p2)


def test_substring_apply_and_self_runs_plan_shape(spark, sf_dir):
    """Round-8 substring consumers keep the family's 100 TB plan
    contract: no cartesian/nested-loop anywhere; the apply's
    text-bearing joins are sort-merge (corpus-sized both sides —
    Catalyst's static estimate through Generate must not broadcast
    them); every window partitions by a document key; self-runs'
    islands window partitions per doc (doc_a == doc_b)."""
    from goeventstream_spark.operators import dedup as _d

    _d.clear_shared_runs_cache()
    df = q.QUERIES["substring_dedup_apply"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    # interval merge + island grouping windows all partition by doc
    assert "windowspecdefinition(doc_id" in plan, plan

    df2 = q.QUERIES["substring_self_runs"](spark, sf_dir)
    p2 = plans.physical_plan(df2)
    assert "TakeOrderedAndProject" in p2, p2
    assert "CartesianProduct" not in p2 and "NestedLoop" not in p2, p2
    assert "BroadcastHashJoin" not in p2, p2
    # the islands window partitions per (doc pair, diagonal) with
    # doc_a == doc_b — never unpartitioned
    assert "windowspecdefinition(doc_a" in p2, p2


def test_bpe_encode_merge_table_broadcast_only(spark, sf_dir):
    """bpe_encode_corpus's scale contract: the trained merge table is
    the ONLY broadcast (a 1-row aggregate onto the corpus word
    relation); the encode itself is a map-side rewrite — no join on a
    data-sized key, no cartesian of data relations, every aggregation
    keyed (word census / pair census / per-doc rollup)."""
    df = q.QUERIES["bpe_encode_report"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    # broadcasts: the 1-row merge table (BroadcastNestedLoopJoin over
    # a single-row relation is the crossJoin-of-aggregate idiom) and
    # the per-step 1-row winners; never a corpus relation
    for seg in plan.split("BroadcastExchange")[1:]:
        # every broadcast side must be rooted in an aggregate (1-row
        # winners / merge table), not a scan of a data table
        head = seg[:400]
        assert (
            "HashAggregate" in head
            or "SortAggregate" in head
            or "TakeOrderedAndProject" in head
        ), head
