"""Property-based checks (SURVEY.md §5.2): the batch stream operators
must agree with straightforward pure-Python models on arbitrary small
event sets, not just the fixtures."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from goeventstream_spark.operators import stream_ops as so

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("props", StringType()),
    ]
)

EPOCH = dt.datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user_id
        st.integers(min_value=0, max_value=600),  # seconds offset
    ),
    min_size=1,
    max_size=40,
)


def _mk_rows(pairs):
    return [
        (i, EPOCH + dt.timedelta(seconds=sec), u, "e", f'{{"i": {i}}}')
        for i, (u, sec) in enumerate(pairs)
    ]


@settings(max_examples=8, deadline=None)
@given(events_strategy)
def test_sessionize_matches_python_model(pairs):
    spark = _spark()
    rows = _mk_rows(pairs)
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        r.event_id: (r.user_id, r.session_id)
        for r in so.sessionize(df, gap_s=30).collect()
    }
    # python model: per user, sorted by (ts, event_id); new session when
    # gap > 30s
    by_user: dict = {}
    for i, ts, u, _t, _p in rows:
        by_user.setdefault(u, []).append((ts, i))
    want = {}
    for u, evs in by_user.items():
        evs.sort()
        sid = 0
        prev = None
        for ts, i in evs:
            if prev is None or (ts - prev).total_seconds() > 30:
                sid += 1
            want[i] = (u, sid)
            prev = ts
    assert got == want


@settings(max_examples=8, deadline=None)
@given(events_strategy)
def test_latest_state_matches_python_model(pairs):
    spark = _spark()
    rows = _mk_rows(pairs)
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.user_id: r.data for r in so.latest_state(df.withColumn("value", df.event_id * 1.0)).collect()}
    want: dict = {}
    best: dict = {}
    for i, ts, u, _t, p in rows:
        if u not in best or (ts, i) > best[u]:
            best[u] = (ts, i)
            want[u] = p
    assert got == want


_session = None


def _spark():
    global _session
    if _session is None:
        from goeventstream_spark import get_spark

        _session = get_spark(app_name="prop-tests", shuffle_partitions=4)
    return _session


edges_strategy = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda p: p[0] != p[1]),
    min_size=0,
    max_size=40,
)


@settings(max_examples=8, deadline=None)
@given(edges_strategy)
def test_dedup_clusters_matches_union_find(edge_list):
    """dedup_clusters (distributed min-label propagation) must agree
    with a plain sequential union-find on arbitrary random graphs —
    including multi-edges, long chains, and cycles."""
    from goeventstream_spark.operators import dedup

    spark = _spark()
    nodes = sorted({v for e in edge_list for v in e} | {99})
    docs = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    if edge_list:
        pairs = spark.createDataFrame(
            [(a, b) for a, b in edge_list], "doc_a long, doc_b long"
        )
    else:
        pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.dedup_clusters(pairs, all_docs=docs).collect()
    }

    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for n in nodes:
        root = find(n)
        comp_min = min(m for m in nodes if find(m) == root)
        want[n] = comp_min
    assert got == want


funnel_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),                        # user
        st.integers(0, 3600),                     # seconds offset
        st.sampled_from(["view", "click", "purchase", "error"]),
    ),
    min_size=0,
    max_size=60,
)


@settings(max_examples=8, deadline=None)
@given(funnel_strategy)
def test_funnel_matches_python_model(rows):
    """analytics.funnel must equal the sequential per-user model: first
    view, then first click strictly after it, then first purchase
    strictly after that."""
    from goeventstream_spark.operators import analytics

    spark = _spark()
    data = [
        (i, EPOCH + dt.timedelta(seconds=sec), u, etype, "{}")
        for i, (u, sec, etype) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, SCHEMA)
    got = {
        r.user_id: (r.t_view, r.t_click, r.t_purchase)
        for r in analytics.funnel(df).collect()
    }

    want = {}
    by_user = {}
    for i, (u, sec, etype) in enumerate(rows):
        by_user.setdefault(u, []).append((EPOCH + dt.timedelta(seconds=sec), etype))
    for u, evs in by_user.items():
        evs.sort()
        tv = min((t for t, e in evs if e == "view"), default=None)
        if tv is None:
            continue
        tc = min((t for t, e in evs if e == "click" and t > tv), default=None)
        tp = (
            min((t for t, e in evs if e == "purchase" and t > tc), default=None)
            if tc is not None
            else None
        )
        want[u] = (tv, tc, tp)
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),   # group key
            st.integers(min_value=-100, max_value=100),  # value
            st.integers(min_value=0, max_value=2),   # slice id
        ),
        min_size=1,
        max_size=50,
    )
)
def test_merge_partial_aggs_matches_direct(rows):
    """Slicing the input ARBITRARILY and merging per-slice partials
    must equal the from-scratch aggregate for every decomposable
    aggregate (count / sum / min / max) — the incremental-view-
    maintenance invariant, independent of where slice boundaries
    fall."""
    from pyspark.sql import functions as F

    from goeventstream_spark.operators.relational import merge_partial_aggs

    spark = _spark()
    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("v", LongType()),
            StructField("slice", LongType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    exprs = lambda: [
        F.count("*").alias("n"),
        F.sum("v").alias("sum_v"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    ]
    parts = [
        df.where(F.col("slice") == i).groupBy("k").agg(*exprs()) for i in range(3)
    ]
    merged = {
        r.k: (r.n, r.sum_v, r.min_v, r.max_v)
        for r in merge_partial_aggs(parts, ["k"]).collect()
    }
    direct = {
        r.k: (r.n, r.sum_v, r.min_v, r.max_v)
        for r in df.groupBy("k").agg(*exprs()).collect()
    }
    assert merged == direct


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=12
        ),
        min_size=1,
        max_size=8,
    )
)
def test_duplicated_spans_matches_python_model(docs):
    """duplicated_spans (window=3, stride=2) must agree with a direct
    python model of the same windowing on arbitrary token lists."""
    from goeventstream_spark.operators.dedup import duplicated_spans

    spark = _spark()
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    df = spark.createDataFrame(rows, schema)
    got = {
        r.doc_id: (r.n_spans, r.dup_spans)
        for r in duplicated_spans(df, window=3, stride=2).collect()
    }

    def spans_of(toks):
        out = []
        stop = max(len(toks) - 2, 1)
        for start in range(1, stop + 1, 2):
            out.append(" ".join(toks[start - 1 : start + 2]))
        return out

    all_spans = {i: spans_of(t) for i, t in enumerate(docs)}
    owners = {}
    for i, sp in all_spans.items():
        for s_ in set(sp):
            owners.setdefault(s_, set()).add(i)
    want = {}
    for i, sp in all_spans.items():
        dup = sum(1 for s_ in sp if len(owners[s_]) >= 2)
        want[i] = (len(sp), dup)
    assert got == want


intervals_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # user
        st.integers(min_value=0, max_value=200_000),  # start offset s
        st.integers(min_value=0, max_value=100_000),  # duration s
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=8, deadline=None)
@given(intervals_strategy)
def test_max_concurrency_matches_bruteforce(triples):
    """Two-phase sweep-line == brute-force overlap counting at every
    boundary instant (closed intervals), grouped to per-day maxima —
    including multi-day spans and day-boundary carries."""
    from goeventstream_spark.operators.temporal import max_concurrency_by_day

    spark = _spark()
    rows = [
        (u, sid, EPOCH + dt.timedelta(seconds=s), EPOCH + dt.timedelta(seconds=s + d))
        for sid, (u, s, d) in enumerate(triples)
    ]
    df = spark.createDataFrame(
        rows,
        StructType(
            [
                StructField("user_id", LongType()),
                StructField("session_id", LongType()),
                StructField("session_start", TimestampType()),
                StructField("session_end", TimestampType()),
            ]
        ),
    )
    got = {
        r["day"].date(): r["max_concurrent"]
        for r in max_concurrency_by_day(df).collect()
    }
    # brute force: concurrency at each boundary instant; max per the
    # instant's day (only days containing boundaries are emitted)
    bounds = sorted({r[2] for r in rows} | {r[3] for r in rows})
    want: dict = {}
    for t in bounds:
        n = sum(1 for r in rows if r[2] <= t <= r[3])
        d = t.date()
        want[d] = max(want.get(d, 0), n)
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # user
            st.sampled_from(["U", "D"]),
            st.integers(min_value=0, max_value=500),  # seconds
            st.integers(min_value=0, max_value=99),  # value
        ),
        min_size=0,
        max_size=30,
    )
)
def test_cdc_apply_matches_dict_model(ops):
    """cdc_apply == a sequential dict replay of the changelog over the
    base snapshot (ties broken by event_id, matching the declared
    (ts, event_id) order)."""
    from goeventstream_spark.operators.temporal import cdc_apply

    spark = _spark()
    base_rows = [(u, float(u * 10), EPOCH) for u in range(3)]
    chg_rows = [
        (u, op, float(v), EPOCH + dt.timedelta(seconds=s), i)
        for i, (u, op, s, v) in enumerate(ops)
    ]
    base = spark.createDataFrame(
        base_rows,
        StructType(
            [
                StructField("user_id", LongType()),
                StructField("value", DoubleType()),
                StructField("ts", TimestampType()),
            ]
        ),
    )
    chg = spark.createDataFrame(
        chg_rows,
        StructType(
            [
                StructField("user_id", LongType()),
                StructField("op", StringType()),
                StructField("value", DoubleType()),
                StructField("ts", TimestampType()),
                StructField("event_id", LongType()),
            ]
        ),
    )
    got = {r["user_id"]: r["value"] for r in cdc_apply(base, chg).collect()}
    snap = {u: v for u, v, _ in base_rows}
    for u, op, v, ts, i in sorted(chg_rows, key=lambda r: (r[3], r[4])):
        if op == "D":
            snap.pop(u, None)
        else:
            snap[u] = v
    assert got == snap


# ---------------------------------------------------------------------------
# asof_join directions vs a brute-force pure-Python model
# ---------------------------------------------------------------------------

ASOF_L_SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("ts", TimestampType()),
        StructField("lid", LongType()),
    ]
)
ASOF_R_SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("ts", TimestampType()),
        StructField("v", LongType()),
    ]
)

asof_strategy = st.tuples(
    st.lists(  # left rows: (key, ms)
        st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=1, max_size=12
    ),
    st.lists(  # right rows: (key, ms, value) — values may be None
        st.tuples(
            st.integers(0, 2),
            st.integers(0, 50),
            st.one_of(st.none(), st.integers(0, 9)),
        ),
        min_size=0,
        max_size=12,
    ),
)


def _asof_model(left, right, direction, tol_ms):
    """Brute force over the declared contract: backward = latest right
    ts <= l_ts (equal-ts tie -> greatest value tuple), forward =
    earliest right ts >= l_ts (tie -> smallest), nearest = closer side
    wins (tie -> backward), tolerance gating each side. None values
    order before any integer (mirrors Spark's nulls-first asc)."""
    out = {}
    vkey = lambda r: (r[1], (r[2] is not None, r[2]))  # noqa: E731
    for lid, (k, lms) in left.items():
        back = [r for r in right if r[0] == k and r[1] <= lms]
        fwd = [r for r in right if r[0] == k and r[1] >= lms]
        b = max(back, key=vkey) if back else None
        f = min(fwd, key=vkey) if fwd else None
        if tol_ms is not None:
            if b is not None and lms - b[1] > tol_ms:
                b = None
            if f is not None and f[1] - lms > tol_ms:
                f = None
        if direction == "backward":
            m = b
        elif direction == "forward":
            m = f
        else:
            if b is None:
                m = f
            elif f is None:
                m = b
            else:
                m = b if (lms - b[1]) <= (f[1] - lms) else f
        out[lid] = (m[1], m[2]) if m is not None else (None, None)
    return out


@given(asof_strategy, st.sampled_from(["backward", "forward", "nearest"]))
@settings(max_examples=12, deadline=None)
def test_asof_directions_match_brute_force(data, direction):
    from goeventstream_spark.operators import relational as rel

    spark = _spark()
    left_rows, right_rows = data
    left = {i: (k, ms) for i, (k, ms) in enumerate(left_rows)}
    ldf = spark.createDataFrame(
        [(k, EPOCH + dt.timedelta(milliseconds=ms), i) for i, (k, ms) in left.items()],
        ASOF_L_SCHEMA,
    )
    rdf = spark.createDataFrame(
        [(k, EPOCH + dt.timedelta(milliseconds=ms), v) for k, ms, v in right_rows],
        ASOF_R_SCHEMA,
    )
    got = {
        r.lid: (
            None if r.asof_ts is None else int((r.asof_ts - EPOCH).total_seconds() * 1000),
            r.asof_v,
        )
        for r in rel.asof_join(
            ldf, rdf, keys=["k"], left_ts="ts", right_ts="ts",
            value_cols=["v"], tolerance_ms=20, direction=direction,
        ).collect()
    }
    want = _asof_model(
        left, [(k, ms, v) for k, ms, v in right_rows], direction, tol_ms=20
    )
    assert got == want, f"{direction}: {got} != {want}"


@settings(max_examples=6, deadline=None)
@given(edges_strategy)
def test_contraction_matches_propagation(edge_list):
    """Large-star/small-star contraction (Kiveris SoCC'14) must produce
    the identical clustering as min-label propagation on arbitrary
    random graphs — multi-edges, cycles, isolated extra doc included."""
    from goeventstream_spark.operators import dedup

    spark = _spark()
    nodes = sorted({v for e in edge_list for v in e} | {99})
    docs = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    if edge_list:
        pairs = spark.createDataFrame(
            [(a, b) for a, b in edge_list], "doc_a long, doc_b long"
        )
    else:
        pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    prop = {
        r.doc_id: r.cluster_id
        for r in dedup.dedup_clusters(pairs, all_docs=docs).collect()
    }
    contr = {
        r.doc_id: r.cluster_id
        for r in dedup.dedup_clusters_contraction(pairs, all_docs=docs).collect()
    }
    assert contr == prop


def test_contraction_logarithmic_rounds_on_chain():
    """Adversarial 301-node path: min-label propagation needs O(n)=300
    rounds (it moves labels one hop per round); the contraction must
    collapse it within the O(log n) bound — and get the answer right."""
    from goeventstream_spark.operators import dedup

    spark = _spark()
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], "doc_a long, doc_b long"
    )
    rounds: list[int] = []
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.dedup_clusters_contraction(pairs, rounds_out=rounds).collect()
    }
    assert len(got) == 301 and set(got.values()) == {0}
    assert rounds[0] <= 12, f"contraction took {rounds[0]} rounds on a 301-chain"


words_strategy = st.lists(
    st.lists(
        st.sampled_from(["ab", "abc", "ba", "cab", "a", "bcbc", "the", "of"]),
        min_size=1,
        max_size=12,
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=8, deadline=None)
@given(words_strategy)
def test_bpe_merge_candidates_matches_python_model(docs):
    """Freq-weighted adjacent-pair counts == brute-force Python BPE
    pass 1 on arbitrary word-soup corpora (incl. 1-char words, which
    must contribute no pairs)."""
    from collections import Counter

    from goeventstream_spark.operators import text as text_ops

    spark = _spark()
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r.pair: r.pair_count
        for r in text_ops.bpe_merge_candidates(df, top_k=1000).collect()
    }
    want = Counter()
    for ws in docs:
        for w in ws:
            for i in range(len(w) - 1):
                want[w[i : i + 2]] += 1
    assert got == dict(want)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=40),
    st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=40),
)
def test_bloom_never_false_negative(build, probe):
    """Bloom membership has NO false negatives by construction: every
    true member must be predicted, and the confusion counts must obey
    predicted = true + false_positives on any key sets."""
    from goeventstream_spark.operators import sketches

    spark = _spark()
    b = spark.createDataFrame([(k,) for k in build], "key long")
    p = spark.createDataFrame([(k,) for k in probe], "key long")
    [r] = sketches.bloom_probe_report(b, p, "key", "key", k=4, m=1024).collect()
    n_true = len(set(build) & set(probe))
    assert r.n_probe == len(set(probe))
    assert r.true_members == n_true
    assert r.predicted_members >= r.true_members
    assert r.false_positives == r.predicted_members - r.true_members


@settings(max_examples=8, deadline=None)
@given(words_strategy)
def test_gopher_flags_match_python_model(docs):
    """Gopher quality flags == a direct Python model of the rules on
    arbitrary word-soup corpora (exact integer thresholds)."""
    from goeventstream_spark.operators import text as text_ops

    spark = _spark()
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in text_ops.gopher_quality_flags(df).collect()}
    for i, ws in enumerate(docs):
        n = len(ws)
        n_chars = sum(len(w) for w in ws)
        maxc = max(ws.count(w) for w in set(ws))
        stopc = sum(1 for w in ws if w in text_ops.STOPWORDS)
        alphac = sum(1 for w in ws if any(c.isalpha() for c in w))
        r = got[i]
        assert r.n_words == n and r.stopword_cnt == stopc
        assert r.word_count_ok == (1 if 10 <= n <= 100000 else 0)
        assert r.mean_len_ok == (1 if 3 * n <= n_chars <= 10 * n else 0)
        assert r.stopword_ok == (1 if stopc >= 2 else 0)
        assert r.alpha_ok == (1 if 5 * alphac >= 4 * n else 0)
        assert r.repetition_ok == (1 if 5 * maxc <= n else 0)
        assert r.gopher_pass == (
            r.word_count_ok * r.mean_len_ok * r.stopword_ok * r.alpha_ok * r.repetition_ok
        )


@given(
    st.lists(
        st.integers(min_value=0, max_value=30).map(lambda i: f"w{i}"),
        min_size=1,
        max_size=300,
    )
)
@settings(max_examples=20, deadline=None)
def test_misra_gries_superset_and_exact_heavy_hitters(words):
    """MG candidates must contain EVERY key with count > n/(k+1)
    (the sketch guarantee), and the verified heavy_hitters output must
    equal brute force — on arbitrary skew and partition layouts."""
    from collections import Counter

    from goeventstream_spark.operators import sketches

    spark = _spark()
    k, denom = 7, 6
    df = spark.createDataFrame(
        [(w,) for w in words], "word string"
    ).repartition(4)
    cand = {
        r.word
        for r in sketches.misra_gries_candidates(df, "word", k=k).collect()
    }
    n = len(words)
    counts = Counter(words)
    must_have = {w for w, c in counts.items() if c * (k + 1) > n}
    assert must_have <= cand
    got = {
        (r.word, r.cnt, r.n_total)
        for r in sketches.heavy_hitters(df, "word", k=k, denom=denom).collect()
    }
    want = {(w, c, n) for w, c in counts.items() if c * denom > n}
    assert got == want


@given(
    st.lists(
        st.lists(
            st.integers(min_value=-300, max_value=300), min_size=3, max_size=3
        ),
        min_size=4,
        max_size=25,
    )
)
@settings(max_examples=15, deadline=None)
def test_kmeans_fixed_point_matches_python_model(grid_vectors):
    """The fixed-point Lloyd trajectory (argmin ties to lowest cid,
    floored-mean update, empty cluster keeps centroid) must match a
    direct Python model on arbitrary integer-grid vectors."""
    from goeventstream_spark.operators import clustering

    spark = _spark()
    k, iters = 3, 2
    # feed pre-scaled values through the embedding column: the operator
    # floors x*1000, so pass v/1000 floats whose product is exact enough
    # that floor(x*1000) == v for |v| <= 300 (verified by the model
    # comparing against the SAME quantized grid the operator computes).
    rows = [(i, [v / 1000.0 for v in vec]) for i, vec in enumerate(grid_vectors)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r.cluster_id, r.n_members, r.sum_vec_id, r.centroid_dim0)
        for r in clustering.kmeans_fixed_point(emb, k=k, iters=iters).collect()
    }

    # python model on the operator's own quantized grid
    import math

    quant = {
        r.vec_id: list(r.v)
        for r in clustering.quantize_vectors(emb).collect()
    }
    cents = [list(quant[i]) for i in sorted(quant)[:k]]
    assigned = {}
    for _ in range(iters):
        assigned = {}
        for vid in sorted(quant):
            dists = [
                (sum((a - b) ** 2 for a, b in zip(quant[vid], c)), cid)
                for cid, c in enumerate(cents)
            ]
            assigned[vid] = min(dists)[1]
        for cid in range(k):
            members = [quant[v] for v, c in assigned.items() if c == cid]
            if members:
                cents[cid] = [
                    math.floor(sum(col) / len(col))
                    for col in zip(*members)
                ]
    want = set()
    for cid in range(k):
        vids = [v for v, c in assigned.items() if c == cid]
        if vids:
            want.add((cid, len(vids), sum(vids), cents[cid][0]))
    assert got == want


@given(
    st.lists(
        st.integers(min_value=0, max_value=12).map(lambda i: f"t{i}"),
        min_size=8,
        max_size=30,
    ),
    st.lists(
        st.integers(min_value=0, max_value=12).map(lambda i: f"t{i}"),
        min_size=8,
        max_size=30,
    ),
    st.lists(
        st.integers(min_value=0, max_value=12).map(lambda i: f"u{i}"),
        min_size=6,
        max_size=6,
    ),
)
@settings(max_examples=10, deadline=None)
def test_winnowing_shared_run_guarantee(words_a, words_b, shared_run):
    """The MOSS guarantee: two docs sharing a run of >= w + k - 1 words
    (k=3, w=4 -> 6) must share at least one selected fingerprint."""
    from goeventstream_spark.operators import dedup

    spark = _spark()
    text_a = " ".join(words_a + shared_run)
    text_b = " ".join(shared_run + words_b)
    docs = spark.createDataFrame(
        [(0, text_a), (1, text_b)], "doc_id long, text string"
    )
    fps = dedup.winnowing_fingerprints(docs, k=3, w=4).collect()
    h_a = {r.h for r in fps if r.doc_id == 0}
    h_b = {r.h for r in fps if r.doc_id == 1}
    assert h_a & h_b, (text_a, text_b)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=50),   # cents
            st.integers(min_value=1, max_value=9),    # weight
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=15, deadline=None)
def test_weighted_median_matches_python_model(rows):
    """The running-weight window form must pick exactly the first value
    (in (cents, orderkey, linenumber) order) whose cumulative weight
    reaches half the total — checked against a direct fold."""
    from goeventstream_spark import queries as q

    spark = _spark()
    data = [
        ("A", float(c), float(wt), i, i) for i, (c, wt) in enumerate(rows)
    ]
    li = spark.createDataFrame(
        data,
        "l_returnflag string, l_extendedprice double, l_quantity double,"
        " l_orderkey long, l_linenumber long",
    )
    # call through the registered query's shape via a local rebuild
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("wt"),
        "l_orderkey",
        "l_linenumber",
    )
    run = (
        Window.partitionBy("l_returnflag")
        .orderBy("cents", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    got = (
        w.select(
            "l_returnflag",
            "cents",
            F.sum("wt").over(run).alias("cum"),
            F.sum("wt").over(Window.partitionBy("l_returnflag")).alias("tot"),
        )
        .where(2 * F.col("cum") >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(F.min("cents").alias("median_cents"))
        .collect()[0]
        .median_cents
    )
    # model: first value (in (cents, key) order) whose cumulative
    # weight reaches half the total
    tot = sum(wt for _, wt in rows)
    cum = 0
    want = None
    for cents, wt, _i in sorted(
        [(int(round(c * 100)), wt, i) for i, (c, wt) in enumerate(rows)],
        key=lambda t: (t[0], t[2]),
    ):
        cum += wt
        if 2 * cum >= tot:
            want = cents
            break
    assert got == want


@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=30)
)
@settings(max_examples=15, deadline=None)
def test_ewma_series_matches_python_fold(counts):
    """analytics.ewma_series must reproduce the plain sequential fold
    e_t = (x_t*1e6 + 3*e_{t-1}) // 4 over a dense hourly series, and a
    constant series must be a fixed point (e_t == x*1e6 for all t)."""
    from goeventstream_spark.operators.analytics import ewma_series

    spark = _spark()
    rows = []
    for i, c in enumerate(counts):
        t = EPOCH + dt.timedelta(hours=i)
        rows.extend((j, t, 7, "k", None) for j in range(c))
    if not any(counts):
        counts = counts + [1]
        rows = [(0, EPOCH + dt.timedelta(hours=len(counts) - 1), 7, "k", None)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = ewma_series(df, key_col="event_type", ts_col="ts").collect()
    got = {r.h: r.e for r in out}
    # the spine spans observed hours only: first to last nonzero count
    lo = next(i for i, c in enumerate(counts) if c)
    hi = max(i for i, c in enumerate(counts) if c)
    assert len(got) == hi - lo + 1
    e = None
    for i in range(lo, hi + 1):
        x = counts[i]
        e = x * 1000000 if e is None else (x * 1000000 + 3 * e) // 4
        assert got[EPOCH + dt.timedelta(hours=i)] == e


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),   # join key
            st.booleans(),                           # left delta flag
        ),
        min_size=0,
        max_size=25,
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.booleans(),
        ),
        min_size=0,
        max_size=25,
    ),
)
@settings(max_examples=15, deadline=None)
def test_delta_join_equals_full_recompute(left, right):
    """The quadrant identity: delta_join_maintain over ANY base/delta
    split of both sides must produce exactly the rows of the full
    inner join (as a multiset)."""
    from collections import Counter

    from goeventstream_spark.operators.relational import delta_join_maintain

    spark = _spark()
    ldf = spark.createDataFrame(
        [(k, i, d) for i, (k, d) in enumerate(left)] or [(None, None, None)],
        "k long, lid long, ld boolean",
    ).where("k IS NOT NULL")
    rdf = spark.createDataFrame(
        [(k, i, d) for i, (k, d) in enumerate(right)] or [(None, None, None)],
        "k long, rid long, rd boolean",
    ).where("k IS NOT NULL")
    view = delta_join_maintain(
        ldf.where("NOT ld"),
        ldf.where("ld"),
        rdf.where("NOT rd").withColumnRenamed("lid", "rid"),
        rdf.where("rd"),
        ["k"],
    )
    got = Counter((r.k, r.lid, r.rid) for r in view.collect())
    want = Counter(
        (r.k, r.lid, r.rid) for r in ldf.join(rdf, ["k"]).collect()
    )
    assert got == want


def test_cell_blocked_pairs_subset_of_label_blocked(spark, sf_dir):
    """The declared (IVF cell x label) blocking for embedding_near_dup
    and knn_graph_within_label is an ANN approximation of label-only
    blocking: every emitted pair/edge must also exist under the exact
    label-blocked computation, with the identical cosine."""
    from goeventstream_spark.operators import clustering, similarity
    from goeventstream_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    emb_cell = clustering.ivf_cell_assign(emb, k=4, iters=2, scale=1000)

    # label-blocked exact pair scores (threshold -1.0 keeps every pair)
    label_pairs = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in similarity.embedding_near_dup(
            emb, threshold=-1.0, block_col="label"
        ).collect()
    }

    composed = similarity.embedding_near_dup(
        emb_cell, threshold=0.35, block_col=["cell", "label"]
    ).collect()
    assert composed, "fixture should produce at least one near-dup pair"
    for r in composed:
        assert label_pairs[(r.vec_a, r.vec_b)] == r.cos_sim

    edges = similarity.knn_graph_within_label(
        emb_cell, k=3, block_cols=["cell", "label"]
    ).collect()
    assert edges, "fixture should produce kNN edges"
    for r in edges:
        key = (min(r.query_id, r.vec_id), max(r.query_id, r.vec_id))
        assert label_pairs[key] == r.cos_sim
