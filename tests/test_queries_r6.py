"""Property tests for the round-6 query families: KMV set-op sketches,
k-core peeling, cluster-balanced sampling, semantic decontamination,
and the multi-step BPE trainer — each pinned against an independent
pure-Python model (not the DuckDB oracle, which the driver already
replays), so a bug shared by both SQL dialects still gets caught.
"""

from __future__ import annotations

import collections
import hashlib

import pytest

from goeventstream_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _md5int(s: str, hexdigits: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:hexdigits], 16)


# ---------------------------------------------------------------------------
# KMV bottom-k sketch
# ---------------------------------------------------------------------------


def test_kmv_report_matches_python_model(spark):
    rows = QUERIES["kmv_setops_report"](spark, SF).collect()
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_type", "user_id")
        .distinct()
        .collect()
    )
    K, H = 32, 1 << 48
    sets: dict[str, set[int]] = collections.defaultdict(set)
    for r in ev:
        sets[r.event_type].add(_md5int(str(r.user_id), 12))

    def est(vals: set[int]) -> tuple[int, list[int]]:
        bk = sorted(vals)[:K]
        if len(bk) < K:
            return len(bk), bk
        return (K - 1) * H // bk[-1], bk

    by_pair = {(r.type_a, r.type_b): r for r in rows}
    types = sorted(sets)
    assert set(by_pair) == {
        (a, b) for i, a in enumerate(types) for b in types[i + 1 :]
    }
    for (ta, tb), r in by_pair.items():
        sa, sb = sets[ta], sets[tb]
        merged = sorted(sa | sb)[:K]
        k_common = sum(1 for h in merged if h in sa and h in sb)
        eu, _ = est(sa | sb)
        exact_inter = len(sa & sb)
        exact_union = len(sa | sb)
        assert r.k_common == k_common
        assert r.est_union == eu
        assert r.exact_union == exact_union
        assert r.exact_intersect == exact_inter
        assert r.est_intersect == (k_common * eu) // min(K, len(merged))
        assert r.union_err_ppm == (1_000_000 * abs(eu - exact_union)) // exact_union


def test_kmv_bottom_k_is_exact_global_bottom_k(spark):
    """The two-phase partition-local rank must equal the global
    bottom-k regardless of row placement — force a skewed layout."""
    from pyspark.sql import functions as F

    from goeventstream_spark.operators.sketches import kmv_bottom_k

    df = (
        spark.range(0, 5000)
        .select(
            (F.col("id") % 3).cast("string").alias("key"),
            (F.col("id") * 2654435761 % 104729).alias("h"),
        )
        .distinct()
        .repartition(13)  # arbitrary placement
    )
    got = {
        (r.key, r.h, r.rn) for r in kmv_bottom_k(df, "key", k=16).collect()
    }
    rows = df.collect()
    by_key = collections.defaultdict(set)
    for r in rows:
        by_key[r.key].add(r.h)
    want = {
        (k, h, i + 1)
        for k, vals in by_key.items()
        for i, h in enumerate(sorted(vals)[:16])
    }
    assert got == want


# ---------------------------------------------------------------------------
# k-core peel
# ---------------------------------------------------------------------------


def test_kcore_trajectory_matches_python_peel(spark):
    rows = {
        r.peel_round: (r.nodes_remaining, r.edges_remaining)
        for r in QUERIES["kcore_peel_trajectory"](spark, SF).collect()
    }
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    op = {(r.l_orderkey, r.l_partkey) for r in li}
    pair_orders = collections.Counter()
    by_order = collections.defaultdict(list)
    for o, p in op:
        by_order[o].append(p)
    for o, parts in by_order.items():
        parts.sort()
        for i, a in enumerate(parts):
            for b in parts[i + 1 :]:
                pair_orders[(a, b)] += 1
    E = {e for e, c in pair_orders.items() if c >= 2}
    for r in range(1, 6):
        deg = collections.Counter()
        for a, b in E:
            deg[a] += 1
            deg[b] += 1
        keep = {n for n, d in deg.items() if d >= 3}
        E = {(a, b) for a, b in E if a in keep and b in keep}
        assert rows[r] == (len(keep), len(E)), f"round {r}"
    assert set(rows) == {1, 2, 3, 4, 5}


def test_kcore_operator_certifies_convergence_on_fixed_graph(spark):
    """A 4-clique plus a dangling chain: the chain peels away in two
    rounds and the trajectory then repeats the 2-core fixed point."""
    from goeventstream_spark.operators.graph import kcore_peel_trajectory

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    df = spark.createDataFrame(edges, ["a", "b"])
    rows = {
        r.peel_round: (r.nodes_remaining, r.edges_remaining)
        for r in kcore_peel_trajectory(df, k=2, rounds=4).collect()
    }
    # round 1: node 6 (deg 1) drops -> edge (5,6) gone
    assert rows[1] == (5, 7)
    # round 2: node 5 (deg 1 now) drops -> edge (4,5) gone
    assert rows[2] == (4, 6)
    # rounds 3 and 4: the 4-clique is the stable 2-core
    assert rows[3] == (4, 6) and rows[4] == (4, 6)


# ---------------------------------------------------------------------------
# Cluster-balanced sampling
# ---------------------------------------------------------------------------


def test_cluster_balanced_sample_quota_and_checksum(spark):
    from goeventstream_spark.kq_sql import KQ_CAPPED_FRAC
    from goeventstream_spark.operators.clustering import ivf_cell_assign_capped

    rows = QUERIES["cluster_balanced_sample"](spark, SF).collect()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cells = {
        r.vec_id: r.cell
        for r in ivf_cell_assign_capped(
            emb, k=4, iters=2, scale=1000, cap_frac=KQ_CAPPED_FRAC, max_levels=1
        ).collect()
    }
    by_cell = collections.defaultdict(list)
    for vid, c in cells.items():
        by_cell[c].append(vid)
    total, nc = len(cells), len(by_cell)
    quota = max(1, total // nc)
    got = {r.block: r for r in rows}
    assert set(got) == set(by_cell)
    for c, ids in by_cell.items():
        kept = sorted(ids, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v))[
            :quota
        ]
        r = got[c]
        assert r.n_total == len(ids)
        assert r.quota == quota
        assert r.n_kept == min(quota, len(ids))
        assert r.kept_id_sum == sum(kept)


# ---------------------------------------------------------------------------
# Semantic decontamination
# ---------------------------------------------------------------------------


def test_semantic_decontaminate_matches_numpy_bruteforce(spark):
    import numpy as np

    from goeventstream_spark.kq_sql import KQ_CAPPED_FRAC
    from goeventstream_spark.operators.clustering import ivf_cell_assign_capped

    rows = {r.label: r for r in QUERIES["semantic_decontaminate"](spark, SF).collect()}
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cells = {
        r.vec_id: r.cell
        for r in ivf_cell_assign_capped(
            emb, k=4, iters=2, scale=1000, cap_frac=KQ_CAPPED_FRAC, max_levels=1
        ).collect()
    }
    data = {
        r.vec_id: (r.label, np.asarray(r.embedding, dtype=np.float64))
        for r in emb.collect()
    }
    bench = {v for v in data if v % 16 == 7}
    corp = {v for v in data if v % 16 != 7}
    flagged = set()
    for cv in corp:
        lc, vc = data[cv]
        for bv in bench:
            if cells[cv] != cells[bv]:
                continue
            lb, vb = data[bv]
            cos = float(vc @ vb) / (np.sqrt(vc @ vc) * np.sqrt(vb @ vb))
            if cos >= 0.35:
                flagged.add(cv)
                break
    n_corpus = collections.Counter(data[v][0] for v in corp)
    n_flagged = collections.Counter(data[v][0] for v in flagged)
    assert set(rows) == set(n_corpus)
    any_flagged = False
    for lab, r in rows.items():
        assert r.n_corpus == n_corpus[lab]
        assert r.n_flagged == n_flagged.get(lab, 0)
        assert r.flagged_ppm == (1_000_000 * n_flagged.get(lab, 0)) // n_corpus[lab]
        any_flagged = any_flagged or r.n_flagged > 0
    assert any_flagged, "fixture should exhibit at least one contamination hit"


# ---------------------------------------------------------------------------
# BPE trainer
# ---------------------------------------------------------------------------


def _python_bpe(word_freq: dict[str, int], steps: int):
    """Reference BPE mirroring the DECLARED engine semantics: tokens
    are single chars with merge i written as the sentinel chr(i), pair
    counts are position-based, merges apply via leftmost-non-overlap
    str.replace, and — the subtle part a hypothesis counterexample
    caught — count ties break by byte order IN THE SENTINEL ALPHABET:
    a merged token ranks by its merge index (chr(i) sorts below every
    letter), not by its expanded surface form. Spark and DuckDB agree
    on this by construction; the model must too."""
    vocab = dict(word_freq)
    expanded: dict[str, str] = {}
    out = []
    for i in range(1, steps + 1):
        counts: collections.Counter = collections.Counter()
        for w, f in vocab.items():
            for j in range(len(w) - 1):
                counts[w[j : j + 2]] += f
        pair, c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        before = sum(len(w) * f for w, f in vocab.items())
        sent = chr(i)
        new_vocab: dict[str, int] = {}
        for w, f in vocab.items():
            nw = w.replace(pair, sent)
            new_vocab[nw] = new_vocab.get(nw, 0) + f
        vocab = new_vocab
        after = sum(len(w) * f for w, f in vocab.items())
        disp = pair
        for j in range(i - 1, 0, -1):
            disp = disp.replace(chr(j), expanded[chr(j)])
        expanded[sent] = disp
        out.append((disp, c, before, after))
    return out


def test_bpe_train_steps_matches_python_reference(spark):
    rows = sorted(
        QUERIES["bpe_train_steps"](spark, SF).collect(), key=lambda r: r.step
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    wf: collections.Counter = collections.Counter()
    for d in docs:
        for w in d.text.split(" "):
            if w:
                wf[w] += 1
    want = _python_bpe(dict(wf), 3)
    assert len(rows) == 3
    for r, (pair, c, before, after) in zip(rows, want):
        assert r.pair == pair, f"step {r.step}"
        assert r.pair_count == c
        assert r.tokens_before == before
        assert r.tokens_after == after
    # the trainer must actually compress the corpus
    assert rows[-1].tokens_after < rows[0].tokens_before


def test_bpe_steps_chain_merge_aware_counts(spark):
    """Synthetic corpus where step 2's winner only exists AFTER step
    1's merge is applied: pass-1 censuses cannot produce this."""
    from goeventstream_spark.operators.text import bpe_train_steps

    docs = spark.createDataFrame(
        [(1, "abab abab abab abq"), (2, "ab zq zq")], ["doc_id", "text"]
    )
    rows = sorted(bpe_train_steps(docs, steps=2).collect(), key=lambda r: r.step)
    # step 1: 'ab' (count 3+3+1+1=8 positions: abab has ab at 1 and 3)
    assert rows[0].pair == "ab"
    assert rows[0].pair_count == 8
    # after merging 'ab'->X: words are XX (x3), Xq, X, zq zq.
    # step 2 pairs: XX (3), Xq (1), zq (2) -> winner XX, display 'abab'
    assert rows[1].pair == "abab"
    assert rows[1].pair_count == 3


# ---------------------------------------------------------------------------
# Registry hygiene: the new queries are declared with oracles
# ---------------------------------------------------------------------------


def test_r6_queries_registered_with_oracles():
    from goeventstream_spark.queries import ORACLES

    for name in [
        "kmv_setops_report",
        "cluster_balanced_sample",
        "kcore_peel_trajectory",
        "semantic_decontaminate",
        "bpe_train_steps",
    ]:
        assert name in QUERIES and name in ORACLES


# ---------------------------------------------------------------------------
# Streaming KMV twin
# ---------------------------------------------------------------------------


def test_streaming_kmv_partials_merge_equals_batch(spark, sf_dir, tmp_path):
    """Continuous-ingest bottom-k sketches: events arrive in 3
    micro-batches, each writing only its own per-key bottom-k partial;
    the merged index must equal the batch sketch over the full corpus
    EXACTLY (bottom-k summaries are mergeable) — including ids that
    recur across batches, which must count once."""
    from pyspark.sql import functions as F

    from goeventstream_spark.operators.sketches import kmv_bottom_k, kmv_hash48
    from goeventstream_spark.sources import load_table
    from goeventstream_spark.streaming.sketches import (
        read_kmv_index,
        streaming_kmv_index,
    )

    events = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    src = str(tmp_path / "src")
    for i in range(3):
        events.where(F.col("user_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_kmv_index(
        stream,
        cells_dir=str(tmp_path / "cells"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        k=16,
    )
    q.awaitTermination(180)

    cells = spark.read.parquet(str(tmp_path / "cells"))
    assert cells.select("batch_id").distinct().count() == 3
    merged = {
        (r.event_type, r.h, r.rn)
        for r in read_kmv_index(spark, str(tmp_path / "cells"), k=16).collect()
    }
    full = {
        (r.event_type, r.h, r.rn)
        for r in kmv_bottom_k(
            events.select("event_type", kmv_hash48("user_id")).distinct(),
            "event_type",
            k=16,
        ).collect()
    }
    assert merged == full


# ---------------------------------------------------------------------------
# JL projection + matryoshka eval
# ---------------------------------------------------------------------------


def test_jl_projection_matches_numpy(spark):
    import numpy as np

    rows = {r.vec_id: r for r in QUERIES["jl_projection_audit"](spark, SF).collect()}
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    for r in emb:
        q = np.floor(np.asarray(r.embedding, dtype=np.float64) * 1000).astype(np.int64)
        signs = np.array(
            [
                [
                    1 - 2 * (int(hashlib.md5(f"{d}_{j}".encode()).hexdigest()[0], 16) % 2)
                    for j in range(16)
                ]
                for d in range(64)
            ],
            dtype=np.int64,
        )
        y = q @ signs
        n2o = int(q @ q)
        n2p = int(y @ y)
        got = rows[r.vec_id]
        assert got.norm2_orig == n2o
        assert got.norm2_proj == n2p
        if n2o:
            assert got.distortion_ppm == (1_000_000 * n2p) // (16 * n2o)


def test_jl_distortion_concentrates(spark):
    """The JL lemma's point, empirically: median distortion within
    ±60% of 1e6 on the fixture corpus (k=16 is a coarse sketch)."""
    rows = QUERIES["jl_projection_audit"](spark, SF).collect()
    ds = sorted(r.distortion_ppm for r in rows)
    med = ds[len(ds) // 2]
    assert 400_000 < med < 1_600_000


def test_matryoshka_recall_matches_numpy(spark):
    import math

    import numpy as np

    from goeventstream_spark.queries_r6 import MATRYOSHKA_QUERY_CAP

    rows = {r.label: r for r in QUERIES["matryoshka_recall_report"](spark, SF).collect()}
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb}
    labels = {r.vec_id: r.label for r in emb}

    def dot(a, b):
        # strict left-to-right accumulation, the _arrow_pair_scores /
        # SQL sum-chain semantics — NOT np.dot (BLAS pairwise
        # summation), whose last-ulp drift can flip near-tie rankings
        acc = float(a[0]) * float(b[0])
        for i in range(1, len(a)):
            acc += float(a[i]) * float(b[i])
        return acc

    def topk(qid, dims):
        qv = vecs[qid][:dims]
        scored = []
        for vid, v in vecs.items():
            if vid == qid:
                continue
            c = v[:dims]
            scored.append(
                (-dot(qv, c) / (math.sqrt(dot(qv, qv)) * math.sqrt(dot(c, c))), vid)
            )
        scored.sort()
        return {vid for _, vid in scored[:5]}

    # the bounded query stratum: the cap lowest (md5(vec_id), vec_id)
    # of the every-20th vectors — a no-op at this fixture scale
    # (stratum 25 < 64) but applied anyway so the model IS the contract
    qids = sorted(
        (v for v in vecs if v % 20 == 0),
        key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v),
    )[:MATRYOSHKA_QUERY_CAP]
    per_label_hits = collections.Counter()
    per_label_n = collections.Counter()
    for qid in qids:
        per_label_n[labels[qid]] += 1
        per_label_hits[labels[qid]] += len(topk(qid, 64) & topk(qid, 16))
    assert set(rows) == set(per_label_n)
    for lab, r in rows.items():
        assert r.n_queries == per_label_n[lab]
        assert r.hits == per_label_hits[lab]
        assert r.recall_ppm == (1_000_000 * per_label_hits[lab]) // (
            5 * per_label_n[lab]
        )


def test_bpe_fertility_matches_python(spark):
    rows = {r.tokens_per_word: r for r in QUERIES["bpe_fertility_report"](spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    wf: collections.Counter = collections.Counter()
    for d in docs:
        for w in d.text.split(" "):
            if w:
                wf[w] += 1
    merged = _python_bpe_vocab(dict(wf), 3)
    hist = collections.defaultdict(lambda: [0, 0, 0])
    for (mw, w0), f in merged.items():
        h = hist[len(mw)]
        h[0] += 1
        h[1] += f
        h[2] += f * len(w0)
    assert set(rows) == set(hist)
    for tpw, (nd, cw, cc) in hist.items():
        r = rows[tpw]
        assert (r.n_distinct_words, r.corpus_words, r.corpus_chars) == (nd, cw, cc)


def _python_bpe_vocab(word_freq: dict[str, int], steps: int):
    """Reference merge application returning {(merged_string, word):
    freq} in the same sentinel representation as _python_bpe (merge i
    = chr(i)), so tie-breaks match the declared engine semantics."""
    vocab = {(w, w): f for w, f in word_freq.items()}
    for i in range(1, steps + 1):
        counts: collections.Counter = collections.Counter()
        for (mw, _w), f in vocab.items():
            for j in range(len(mw) - 1):
                counts[mw[j : j + 2]] += f
        pair, _c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        sent = chr(i)
        vocab = {(mw.replace(pair, sent), w): f for (mw, w), f in vocab.items()}
    return vocab


def test_classifier_calibration_matches_python(spark):
    import math

    rows = {r.bucket: r for r in QUERIES["classifier_calibration_report"](spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    STOP = ("the", "of", "and", "is", "to", "in", "that", "it", "for", "on")
    buckets = collections.defaultdict(lambda: [0, 0])
    for d in docs:
        words = [w for w in d.text.split(" ") if w]
        if not words:
            continue
        sw = sum(_md5int(w, 6) % 2001 - 1000 for w in words)
        n = len(words)
        cnt = collections.Counter(words)
        n_chars = sum(len(w) * c for w, c in cnt.items())
        stop = sum(c for w, c in cnt.items() if w in STOP)
        alpha = sum(c for w, c in cnt.items() if any(ch.isascii() and ch.isalpha() for ch in w))
        gopher = (
            10 <= n <= 100000
            and 3 * n <= n_chars <= 10 * n
            and stop >= 2
            and 5 * alpha >= 4 * n
            and 5 * max(cnt.values()) <= n
        )
        b = math.floor((sw * 5) / (1000.0 * n))
        buckets[b][0] += 1
        buckets[b][1] += 1 if gopher else 0
    assert set(rows) == set(buckets)
    for b, (nd, npass) in buckets.items():
        r = rows[b]
        assert r.n_docs == nd
        assert r.n_gopher_pass == npass
        assert r.pass_ppm == (1_000_000 * npass) // nd


def _support2_edges(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    op = {(r.l_orderkey, r.l_partkey) for r in li}
    by_order = collections.defaultdict(list)
    for o, p in op:
        by_order[o].append(p)
    pair_orders = collections.Counter()
    for parts in by_order.values():
        parts.sort()
        for i, a in enumerate(parts):
            for b in parts[i + 1 :]:
                pair_orders[(a, b)] += 1
    return {e for e, c in pair_orders.items() if c >= 2}


def test_link_prediction_matches_python(spark):
    rows = [
        (r.part_u, r.part_v, r.common_neighbors, r.ra_ppb)
        for r in QUERIES["link_prediction_ra_topk"](spark, SF).collect()
    ]
    E = _support2_edges(spark)
    deg = collections.Counter()
    nbrs = collections.defaultdict(set)
    for a, b in E:
        deg[a] += 1
        deg[b] += 1
        nbrs[a].add(b)
        nbrs[b].add(a)
    cand = collections.defaultdict(lambda: [0, 0])
    for z in nbrs:
        if deg[z] > 64:
            continue
        ns = sorted(nbrs[z])
        for i, u in enumerate(ns):
            for v in ns[i + 1 :]:
                cand[(u, v)][0] += 1
                cand[(u, v)][1] += 1_000_000_000 // deg[z]
    scored = sorted(
        ((u, v, cn, ra) for (u, v), (cn, ra) in cand.items() if (u, v) not in E),
        key=lambda t: (-t[3], t[0], t[1]),
    )[:20]
    assert rows == scored and len(rows) == 20


def test_deterministic_walk_matches_python(spark):
    rows = QUERIES["deterministic_walk_paths"](spark, SF).collect()
    got = {(r.start, r.step): r.node for r in rows}
    E = _support2_edges(spark)
    nbrs = collections.defaultdict(set)
    for a, b in E:
        nbrs[a].add(b)
        nbrs[b].add(a)
    for start in nbrs:
        cur = start
        for step in (1, 2, 3):
            cur = min(
                nbrs[cur],
                key=lambda n: (
                    hashlib.md5(f"{cur}_{step}_{n}".encode()).hexdigest(),
                    n,
                ),
            )
            assert got[(start, step)] == cur, (start, step)
    assert len(rows) == 3 * len(nbrs)


def test_aqp_estimates_match_python(spark):
    rows = {r.o_orderpriority: r for r in QUERIES["aqp_sample_estimates"](spark, SF).collect()}
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    agg = collections.defaultdict(lambda: [0, 0, 0, 0])
    for o in orders:
        cents = int(round(o.o_totalprice * 100))
        ins = 1 if hashlib.md5(str(o.o_orderkey).encode()).hexdigest()[0] == "0" else 0
        a = agg[o.o_orderpriority]
        a[0] += 1
        a[1] += ins
        a[2] += cents
        a[3] += ins * cents
    assert set(rows) == set(agg)
    for k, (n, sn, c, sc) in agg.items():
        r = rows[k]
        assert (r.exact_count, r.est_count) == (n, 16 * sn)
        assert r.count_err_ppm == (1_000_000 * abs(16 * sn - n)) // n
        assert (r.exact_cents, r.est_cents) == (c, 16 * sc)
        assert r.cents_err_ppm == (1_000_000 * abs(16 * sc - c)) // c


# ---------------------------------------------------------------------------
# Randomized property tests (hypothesis) for the two most novel paths
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_word_st = st.text(alphabet="abcdz", min_size=1, max_size=6)
_corpus_st = st.lists(_word_st, min_size=3, max_size=30)


@settings(max_examples=6, deadline=None)
@given(_corpus_st)
def test_bpe_trainer_matches_python_on_random_corpora(spark, words):
    """The trainer must equal the reference BPE on arbitrary tiny
    corpora — including self-overlapping runs ('aaaa'), ties broken by
    pair byte order, and vocabularies that exhaust mergeable pairs in
    fewer than 2 steps (skipped: degenerate by construction)."""
    from goeventstream_spark.operators.text import bpe_train_steps

    wf = collections.Counter(words)
    # need at least one mergeable pair per step for 2 steps: the
    # reference model and the SQL both assume a non-empty pair census
    def censuses_nonempty(word_freq, steps):
        try:
            _python_bpe(dict(word_freq), steps)
            return True
        except ValueError:
            return False

    if not censuses_nonempty(wf, 2):
        return
    docs = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    rows = sorted(bpe_train_steps(docs, steps=2).collect(), key=lambda r: r.step)
    want = _python_bpe(dict(wf), 2)
    got = [(r.pair, r.pair_count, r.tokens_before, r.tokens_after) for r in rows]
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["k1", "k2"]), st.integers(0, 40)),
        min_size=1,
        max_size=60,
    )
)
def test_kmv_bottom_k_matches_python_on_random_sets(spark, pairs):
    """Exact bottom-k per key on arbitrary (key, hash) multisets —
    duplicates must collapse, k larger than the set must return the
    whole set, ranks must be 1..min(k, n)."""
    from goeventstream_spark.operators.sketches import kmv_bottom_k

    distinct = sorted(set(pairs))
    df = spark.createDataFrame(distinct, ["key", "h"]).repartition(5)
    got = {(r.key, r.h, r.rn) for r in kmv_bottom_k(df, "key", k=7).collect()}
    by_key = collections.defaultdict(set)
    for k_, h in distinct:
        by_key[k_].add(h)
    want = {
        (k_, h, i + 1)
        for k_, vals in by_key.items()
        for i, h in enumerate(sorted(vals)[:7])
    }
    assert got == want


# ---------------------------------------------------------------------------
# Capped blocking refines uncapped blocking (r7: eval-twin contract)
# ---------------------------------------------------------------------------


def test_capped_near_dup_refines_uncapped_eval_twin(spark):
    """embedding_near_dup is the documented UNCAPPED EVAL TWIN of
    embedding_near_dup_capped (the production path). The hot-cell split
    only ever REFINES base cells, so the capped pair set must be a
    subset of the uncapped one with identical cosines — and on the
    fixture the split actually fires, so the subset is STRICT (the
    guard measurably drops straddling pairs rather than being a no-op
    rename)."""
    capped = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in QUERIES["embedding_near_dup_capped"](spark, SF).collect()
    }
    uncapped = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in QUERIES["embedding_near_dup"](spark, SF).collect()
    }
    assert set(capped) < set(uncapped), (len(capped), len(uncapped))
    for pair, cos in capped.items():
        assert uncapped[pair] == cos, pair


def test_bpe_trainer_depth8_matches_python(spark):
    """8-step trajectory on a fixed corpus built to stay mergeable for
    all 8 steps (r7 scale proof). The failure classes that grow with
    merge-table depth — sentinel collisions among chr(1..8),
    replace-order drift on merges-of-merges (step 5 merges
    chr(3)chr(3) = 'abcdabcd'), and surface re-expansion through up to
    7 sentinel levels — are exactly what the declared 3-step query
    cannot exercise."""
    from goeventstream_spark.operators.text import bpe_train_steps

    words = [
        "abcdabcd", "abcdabcd", "abcd", "dcba", "aabb", "bbaa",
        "abab", "baba", "cdcd", "zzzz", "azbzcz",
    ]
    docs = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    rows = sorted(bpe_train_steps(docs, steps=8).collect(), key=lambda r: r.step)
    want = _python_bpe(dict(collections.Counter(words)), 8)
    got = [(r.pair, r.pair_count, r.tokens_before, r.tokens_after) for r in rows]
    assert got == want
    # the fixture genuinely reaches merges-of-merges: some winning
    # pair's expanded surface form is longer than 2 chars
    assert any(len(p) > 2 for p, _, _, _ in want)


@settings(max_examples=4, deadline=None)
@given(st.lists(st.text(alphabet="abcdz", min_size=1, max_size=8), min_size=3, max_size=40))
def test_bpe_trainer_depth_adaptive_random_corpora(spark, words):
    """Randomized depth proof: each corpus trains to the DEEPEST
    feasible merge table up to 8 steps (whatever depth its pair
    censuses support), and the full trajectory must equal the python
    reference at that depth — so sentinel/tie-break semantics are
    pinned at every reachable depth, not just the declared 3."""
    from goeventstream_spark.operators.text import bpe_train_steps

    wf = collections.Counter(words)

    def max_depth(word_freq, cap=8):
        for s in range(cap, 1, -1):
            try:
                _python_bpe(dict(word_freq), s)
                return s
            except ValueError:
                continue
        return 0

    s = max_depth(wf)
    if s < 2:
        return
    docs = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    rows = sorted(bpe_train_steps(docs, steps=s).collect(), key=lambda r: r.step)
    want = _python_bpe(dict(wf), s)
    got = [(r.pair, r.pair_count, r.tokens_before, r.tokens_after) for r in rows]
    assert got == want


def test_bpe_encode_report_matches_python(spark):
    """The r8 ENCODE pass, declared at the trainer's proven depth 8
    (VERDICT r8 #3): per-language rollup of the corpus tokenized with
    the full learned merge table must equal the python model — all 8
    merges learned with the same sentinel tiebreak (_python_bpe_vocab),
    then each document's words mapped to their merged forms and rolled
    up by language. Also pins that the fixture genuinely trains PAST
    depth 3: the depth-8 tokenization is strictly smaller than the
    depth-3 one, so the deeper table is exercised, not vacuous."""
    rows = {r.lang: r for r in QUERIES["bpe_encode_report"](spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    wf: collections.Counter = collections.Counter()
    for d in docs:
        for w in d.text.split(" "):
            if w:
                wf[w] += 1
    word2merged = {w: mw for (mw, w), _f in _python_bpe_vocab(dict(wf), 8).items()}
    word2merged3 = {w: mw for (mw, w), _f in _python_bpe_vocab(dict(wf), 3).items()}
    toks8 = sum(len(word2merged[w]) * f for w, f in wf.items())
    toks3 = sum(len(word2merged3[w]) * f for w, f in wf.items())
    assert toks8 < toks3  # merges 4..8 genuinely fire on the fixture
    agg = collections.defaultdict(lambda: [0, 0, 0, 0])  # docs, words, chars, toks
    for d in docs:
        a = agg[d.lang]
        a[0] += 1
        for w in d.text.split(" "):
            if w:
                a[1] += 1
                a[2] += len(w)
                a[3] += len(word2merged[w])
    assert set(rows) == set(agg)
    for lang, (nd, nw, nc, nt) in agg.items():
        r = rows[lang]
        assert (r.n_docs, r.n_words, r.chars_before, r.tokens_after) == (
            nd, nw, nc, nt,
        ), lang
        assert r.merges_applied == nc - nt
        assert r.tokens_per_doc_milli == (1000 * nt) // nd
        # encoding strictly compresses on every fixture language
        assert r.tokens_after < r.chars_before, lang
