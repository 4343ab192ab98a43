"""Round-9 queries: the post-apply residual audit and the
substring-stage curation funnel. The DuckDB oracle pins both declared
queries; these pin the semantics against independent python models
(the audit census recomputed in pure python over the operator's
stripped text; the funnel's stage relationships) plus the fixture
regressions the round brief calls out (the known single seam shows as
a nonzero residual)."""

from __future__ import annotations

import collections

from goeventstream_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_DIR as SF


def test_r9_queries_registered_with_oracles():
    for name in [
        "substring_apply_audit",
        "curate_corpus_substring",
        "substring_apply_round2",
    ]:
        assert name in QUERIES and name in ORACLES


def test_substring_apply_audit_matches_python_census(spark, sf_dir):
    """The audit's residual census recomputed in pure python over the
    (independently python-model-pinned) stripped corpus: per language,
    band-gram occurrences / distinct grams / docs-with-residual and
    the integer ppm must match row for row. Also pins the round
    brief's fixture regression: the known excision seam (see
    test_substring_apply_consistency_and_no_surviving_dup) makes the
    residual NONZERO — one apply pass does not reach a fixed point on
    this corpus, which is exactly what the audit exists to measure."""
    from goeventstream_spark.operators.dedup import substring_dedup_apply
    from goeventstream_spark.sources import load_table

    k, max_df = 20, 4
    docs = load_table(spark, sf_dir, "documents")
    stripped = {
        r.doc_id: r.text_after
        for r in substring_dedup_apply(
            docs.select("doc_id", "text"), min_len=k, max_df=max_df
        ).collect()
    }
    lang = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}

    gram_docs: dict[str, set] = collections.defaultdict(set)
    occs: list[tuple[int, str]] = []
    for d, t in stripped.items():
        for i in range(len(t) - k + 1):
            g = t[i : i + k]
            gram_docs[g].add(d)
            occs.append((d, g))
    band = {g for g, ds in gram_docs.items() if 2 <= len(ds) <= max_df}
    per_lang = collections.defaultdict(lambda: [0, set(), set()])  # occ, grams, docs
    for d, g in occs:
        if g in band:
            a = per_lang[lang[d]]
            a[0] += 1
            a[1].add(g)
            a[2].add(d)
    chars_after = collections.Counter()
    n_docs = collections.Counter()
    for d, t in stripped.items():
        chars_after[lang[d]] += len(t)
        n_docs[lang[d]] += 1

    rows = {r.lang: r for r in QUERIES["substring_apply_audit"](spark, sf_dir).collect()}
    assert set(rows) == set(n_docs)
    for lg, r in rows.items():
        occ, grams, dws = per_lang.get(lg, [0, set(), set()])
        assert r.n_docs == n_docs[lg]
        assert r.chars_after == chars_after[lg]
        assert r.residual_occurrences == occ, lg
        assert r.residual_grams == len(grams), lg
        assert r.docs_with_residual == len(dws), lg
        assert r.residual_ppm == (1_000_000 * occ) // chars_after[lg], lg
    # the fixture's seam class is real: the corpus-wide residual is
    # nonzero after one pass (fixture regression guard)
    assert sum(r.residual_occurrences for r in rows.values()) > 0


def test_curate_corpus_substring_funnel_stages(spark, sf_dir):
    """Stage algebra of the funnel readout: the Gopher gate and the
    two dedup stages only ever DROP documents; the strip stage keeps
    every document (it deletes characters, not rows) and only shrinks
    chars; every stage is non-vacuous on the fixture (the gate drops
    docs, the strip removes chars, SemDeDup prunes). Cross-checks
    stage 2 against the gopher_quality_flags operator directly."""
    from pyspark.sql import functions as F

    from goeventstream_spark.operators.text import gopher_quality_flags
    from goeventstream_spark.sources import load_table

    rows = {
        r.stage: r
        for r in QUERIES["curate_corpus_substring"](spark, sf_dir).collect()
    }
    assert list(
        sorted((r.stage_id, s) for s, r in rows.items())
    ) == [
        (1, "input"), (2, "gopher"), (3, "substring_strip"),
        (4, "near_dedup"), (5, "semdedup"),
    ]
    inp, gop, strip = rows["input"], rows["gopher"], rows["substring_strip"]
    near, sem = rows["near_dedup"], rows["semdedup"]
    # docs: gate drops, strip preserves, dedup stages drop
    assert inp.n_docs > gop.n_docs > 0  # gate non-vacuous
    assert strip.n_docs == gop.n_docs  # strip deletes chars, not docs
    assert gop.n_docs >= near.n_docs >= sem.n_docs > 0
    # chars: monotone non-increasing down the funnel, strip non-vacuous
    assert strip.n_chars < gop.n_chars
    assert near.n_chars <= strip.n_chars
    assert sem.n_chars < near.n_chars  # SemDeDup prunes on the fixture
    # stage 2 equals the operator's own gate
    docs = load_table(spark, sf_dir, "documents")
    gate = gopher_quality_flags(docs).where(F.col("gopher_pass") == 1)
    n_gated = gate.count()
    assert gop.n_docs == n_gated


def test_substring_apply_round2_matches_python_double_strip(spark, sf_dir):
    """The second-pass strip recomputed in pure python (detect+strip
    applied twice, the same brute-force model that pins pass 1): per
    language, chars after each pass, second-pass removal, and the
    second-pass run count must match exactly. Convergence evidence
    pinned: pass 2 removes strictly less than pass 1 corpus-wide, and
    — since any residual band gram IS a length->=20 run — the audit's
    nonzero residual implies residual_runs > 0 here."""
    from goeventstream_spark.sources import load_table
    from tests.test_substring_dedup import _py_runs, _py_strip

    k, max_df = 20, 4
    docs = load_table(spark, sf_dir, "documents")
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    lang = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    strip1 = _py_strip(texts, k, max_df)
    runs2 = _py_runs(strip1, k, max_df)
    strip2 = _py_strip(strip1, k, max_df)

    agg = collections.defaultdict(lambda: [0, 0, 0, 0])  # docs, l1, l2, runs
    for d in texts:
        a = agg[lang[d]]
        a[0] += 1
        a[1] += len(strip1[d])
        a[2] += len(strip2[d])
    for _da, db, _sa, _sb, _ln in runs2:
        agg[lang[db]][3] += 1

    rows = {
        r.lang: r for r in QUERIES["substring_apply_round2"](spark, sf_dir).collect()
    }
    assert set(rows) == set(agg)
    for lg, (nd, l1, l2, nr) in agg.items():
        r = rows[lg]
        assert (r.n_docs, r.chars_after_pass1, r.chars_after_pass2) == (nd, l1, l2), lg
        assert r.chars_removed_pass2 == l1 - l2, lg
        assert r.residual_runs == nr, lg
        assert r.removed2_ppm == (1_000_000 * (l1 - l2)) // l1, lg
    # convergence: the iteration shrinks — pass 2 removes strictly less
    removed1 = sum(len(texts[d]) - len(strip1[d]) for d in texts)
    removed2 = sum(len(strip1[d]) - len(strip2[d]) for d in texts)
    assert 0 < removed2 < removed1
    assert sum(a[3] for a in agg.values()) > 0
