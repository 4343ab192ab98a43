"""Text-analysis operators for LLM training-data pipelines
(SURVEY.md §2b group 3): language ID, quality scoring, token counting,
fingerprinting, term scoring. All built-in expressions — fully
codegen'd, no UDFs, one agg shuffle max per operator.

Determinism: ratios are integer-count divisions (exact inputs ->
IEEE-identical doubles cross-engine). Term scoring deliberately uses a
rational idf (N/df) instead of log(N/df): Java's Math.log intrinsic and
C libm can differ in the last ulp, which would break exact oracle
parity; the rational form ranks identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from goeventstream_spark.sources.tables import scan_fanout_for

# Tiny function-word lists per language for the n-gram/stopword
# heuristic language classifier. Deliberately small and hardcoded:
# the operator demonstrates the scalable shape (explode + CASE-sum +
# argmax), not lexicon quality.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "is", "to", "in", "that", "it", "for", "on"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "los"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "un", "du", "est"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "den", "im", "ein"),
    "zh": ("的", "了", "是", "我", "不", "在", "有", "人", "这", "他"),
}

STOPWORDS = LANG_MARKERS["en"]


def _words(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).where(F.col("word") != "")


def text_stats(docs: DataFrame) -> DataFrame:
    """Per-document quality statistics: word/char counts, vocabulary
    diversity, mean word length, stopword ratio.

    Round 10: per-operator scan fan-out on doc_id. Unlike the other
    light consumers (which got faster when the load-time documents
    fan-out was removed), this one got slower: the countDistinct
    forces a two-level (doc_id, word) aggregation whose BOTH exchanges
    disappear when the input is already doc_id-partitioned — one
    up-front exchange of the raw docs replaces two of the exploded
    word rows (0.31 s vs 0.44 s at sf0.1, the r9/r10 A/B)."""
    w = _words(scan_fanout_for(docs, "doc_id"))
    stop = F.when(F.col("word").isin(*STOPWORDS), 1).otherwise(0)
    return w.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.countDistinct("word").alias("n_distinct_words"),
        (F.sum(F.length("word")).cast("double") / F.count("*")).alias("avg_word_len"),
        (F.sum(stop).cast("double") / F.count("*")).alias("stopword_ratio"),
        (F.countDistinct("word").cast("double") / F.count("*")).alias("distinct_ratio"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Composite heuristic quality score in [0, ~3]: length band +
    vocabulary diversity + stopword presence. The shape of a model-free
    pre-filter pass over a 100 TB corpus."""
    s = text_stats(docs)
    length_ok = F.when((F.col("n_words") >= 20) & (F.col("n_words") <= 100000), 1.0).otherwise(0.0)
    return s.select(
        "doc_id",
        "n_words",
        (length_ok + F.col("distinct_ratio") + F.col("stopword_ratio")).alias("quality_score"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-marker language classifier: per language, the fraction
    of words that are that language's function words; predict the
    argmax (ties -> lexicographically first language code, so the
    result is total-order deterministic)."""
    w = _words(docs)
    scores = w.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        *[
            (
                F.sum(F.when(F.col("word").isin(*marks), 1).otherwise(0)).cast("double")
                / F.count("*")
            ).alias(f"score_{lang}")
            for lang, marks in sorted(LANG_MARKERS.items())
        ],
    )
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.coalesce(
        *[F.when(F.col(f"score_{lang}") == best, F.lit(lang)) for lang in langs]
    )
    return scores.select(
        "doc_id",
        *[f"score_{lang}" for lang in langs],
        F.when(best > 0, pred).otherwise(F.lit("und")).alias("pred_lang"),
    )


def token_count(docs: DataFrame) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    pass (letter runs / digit runs / single other chars) — the standard
    cheap proxy for LLM token budgets."""
    return docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda x: x != F.lit(""))).cast("long").alias("ws_tokens"),
        F.size(F.expr(r"regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)"))
        .cast("long")
        .alias("re_tokens"),
        F.length("text").cast("long").alias("n_bytes"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Deterministic document fingerprints: full md5 of the normalized
    text plus a 64-bit-prefix hex for compact join keys."""
    from goeventstream_spark.operators.dedup import normalized_text

    # the SAME normalization exact_dedup hashes — documented hash
    # equivalence, one definition
    full = F.md5(normalized_text("text"))
    return docs.select(
        "doc_id",
        full.alias("fp_md5"),
        F.substring(full, 1, 16).alias("fp_prefix64"),
    )


def term_scores(docs: DataFrame, top_k: int = 5) -> DataFrame:
    """TF-IDF-style salient terms per document: tf * (N/df) with the
    rational idf (exact cross-engine; see module docstring), top-k terms
    per doc by score with deterministic tiebreak."""
    from pyspark.sql import Window

    w = _words(docs)
    n_docs = docs.select(F.countDistinct("doc_id").alias("n_docs"))
    tf = w.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df_ = w.distinct().groupBy("word").agg(F.count("*").alias("df"))
    scored = (
        tf.join(df_, "word")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "word",
            (F.col("tf").cast("double") * (F.col("n_docs").cast("double") / F.col("df").cast("double"))).alias(
                "score"
            ),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("word"))
    return (
        scored.withColumn("rk", F.row_number().over(win).cast("long"))
        .where(F.col("rk") <= top_k)
    )


def bm25_term_scores(
    docs: DataFrame, top_k: int = 5, k1: float = 1.2, b: float = 0.75
) -> DataFrame:
    """BM25-weighted salient terms per document (Robertson/Spärck
    Jones): tf saturation ``tf·(k1+1)/(tf + k1·(1−b + b·dl/avgdl))``
    times the idf ODDS ``(N − df + 0.5)/(df + 0.5)`` — the rational
    form of BM25's ln-idf argument, kept log-free so every arithmetic
    step is an IEEE-exact division/multiply reproducible bit-identically
    in the DuckDB oracle (the module-wide no-transcendentals contract;
    ln is monotone, so per-term rankings are unchanged — only
    cross-term magnitude mixing differs from textbook BM25, which a
    single-term-ranked top-k never does).

    Anatomy: one words explode feeds tf, df, and doc-length aggregates;
    N and avgdl are broadcast one-row relations; the only wide shuffle
    is the tf groupBy on (doc, word). Top-k per doc via rank window on
    the doc-partitioned scored relation.
    """
    from pyspark.sql import Window

    w = _words(docs)
    corpus = docs.select(F.countDistinct("doc_id").alias("n_docs"))
    dl = w.groupBy("doc_id").agg(F.count("*").alias("dl"))
    # avgdl as an exact rational (int64 sum / count, ONE final divide):
    # a float avg() would sum doubles in partition order and drift ULPs
    # vs the oracle's order, flipping boundary ranks.
    avgdl = dl.agg(
        (F.sum("dl").cast("double") / F.count("*").cast("double")).alias("avgdl")
    )
    tf = w.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df_ = w.distinct().groupBy("word").agg(F.count("*").alias("df"))
    tfd = F.col("tf").cast("double")
    idf_odds = (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5)) / (
        F.col("df").cast("double") + F.lit(0.5)
    )
    sat = (tfd * F.lit(k1 + 1.0)) / (
        tfd
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / F.col("avgdl")))
    )
    scored = (
        tf.join(df_, "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .crossJoin(F.broadcast(avgdl))
        .select("doc_id", "word", (idf_odds * sat).alias("bm25"))
    )
    win = Window.partitionBy("doc_id").orderBy(F.col("bm25").desc(), F.col("word"))
    return scored.withColumn("rk", F.row_number().over(win).cast("long")).where(
        F.col("rk") <= top_k
    )


def chunk_documents(docs: DataFrame, chunk_size: int = 200, stride: int = 160) -> DataFrame:
    """Overlapping fixed-width character chunks (the pre-tokenization
    split step of a training pipeline). Chunk c starts at 1 + c*stride
    (1-based, ``substr`` semantics identical in Spark and DuckDB) and
    carries ``chunk_size - stride`` chars of overlap; the final chunk is
    naturally shorter, and a start whose chunk would be wholly
    contained in the previous one is not emitted.

    Scale shape: one ``explode`` over a generated start-position array —
    pure map-side row amplification, no shuffle, no UDF; at 100 TB this
    pipelines inside the scan stage.
    """
    # Upper bound L - (chunk_size - stride): a start past it yields a
    # chunk wholly contained in its predecessor (pure-duplicate output
    # whenever L mod stride lands in (0, chunk_size - stride]).
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.length("text") - F.lit(chunk_size - stride), F.lit(1)),
        F.lit(stride),
    )
    return (
        docs.select("doc_id", "text", F.explode(starts).alias("chunk_start"))
        .select(
            "doc_id",
            (F.col("chunk_start") - 1).cast("long").alias("chunk_offset"),
            ((F.col("chunk_start") - 1) / stride).cast("long").alias("chunk_idx"),
            F.substring(F.col("text"), F.col("chunk_start"), F.lit(chunk_size)).alias("chunk_text"),
        )
        .withColumn("chunk_len", F.length("chunk_text").cast("long"))
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Dominant-term concentration per document (the Gopher-style
    repetition quality signal): the most frequent word, its count, and
    its share of all words. Two exchanges, but both carry only the
    compact (doc_id, word, tf) relation: map-side partial aggregation
    shrinks the exploded words before the first shuffle, and the per-doc
    window re-shuffles the already-aggregated counts — cheaper at scale
    than one shuffle of the raw exploded words."""
    from pyspark.sql import Window

    tf = _words(docs).groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    w = Window.partitionBy("doc_id")
    wrk = w.orderBy(F.col("tf").desc(), F.col("word"))
    return (
        tf.select(
            "doc_id",
            "word",
            "tf",
            F.sum("tf").over(w).alias("n_words"),
            F.row_number().over(wrk).alias("_rk"),
        )
        .where(F.col("_rk") == 1)
        .select(
            "doc_id",
            F.col("word").alias("top_word"),
            F.col("tf").cast("long").alias("top_tf"),
            F.col("n_words").cast("long").alias("n_words"),
            (F.col("tf").cast("double") / F.col("n_words")).alias("top_share"),
        )
    )


PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\+?[0-9]{1,3}[- .]?\(?[0-9]{3}\)?[- .]?[0-9]{3}[- .]?[0-9]{4}"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"),
)


def pii_redact(
    docs: DataFrame,
    patterns: tuple[tuple[str, str], ...] = PII_PATTERNS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """PII scrubbing for training corpora: replace email / phone / IPv4
    matches with ``[<KIND>]`` tokens and count the redactions per kind.

    Pure map-side regexp_replace chain (JVM regex, whole-stage
    codegen) — no shuffle at all, so it streams through a 100 TB scan
    at IO speed. Counts come from length deltas of a marker pass, not
    a second scan. Patterns are deliberately RE2-compatible (no
    backrefs/lookahead) so the operator ports to RE2-based engines.
    """
    out = docs
    redacted = F.col(text_col)
    for kind, pat in patterns:
        token = f"[{kind.upper()}]"
        out = out.withColumn(
            f"n_{kind}",
            (
                F.size(F.split(redacted, pat, -1)) - F.lit(1)
            ).cast("long"),
        )
        redacted = F.regexp_replace(redacted, pat, token)
    return out.withColumn("redacted_text", redacted).select(
        id_col,
        "redacted_text",
        *[f"n_{kind}" for kind, _ in patterns],
    )


def _bigram_rows(docs: DataFrame, key_col: str, text_col: str) -> DataFrame:
    """Shuffle-free bigram generation shared by bigram_topk and
    ngram_novelty: zip_with over two slices of the whitespace-split
    word array pairs adjacent words map-side; one exploded row per
    bigram occurrence, keyed by ``key_col``. Tokenization is the
    repo-wide space-split + empty-filter (NOT a \\s+ regex): identical
    to every text oracle, so tabs/newlines neither split nor vanish
    differently across engines."""
    words = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    bigrams = F.expr(
        "zip_with(slice(_w, 1, size(_w) - 1), slice(_w, 2, size(_w) - 1),"
        " (a, b) -> concat(a, ' ', b))"
    )
    return (
        docs.withColumn("_w", words)
        .where(F.size("_w") >= 2)
        .select(key_col, F.explode(bigrams).alias("bigram"))
    )


def bigram_topk(
    docs: DataFrame,
    top_k: int = 5,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level top-k bigrams per group (language): the building
    block for n-gram LM stats and boilerplate detection.

    Bigram generation is SHUFFLE-FREE: zip_with over two slices of the
    word array pairs adjacent words map-side; the only exchange is the
    (group, bigram) count, then a tiny per-group top-k window over the
    aggregated counts (group cardinality = languages, so the window
    partition count is small but never single-partition-global).
    """
    from pyspark.sql import Window

    counts = (
        _bigram_rows(docs, group_col, text_col)
        .groupBy(group_col, "bigram")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy(group_col).orderBy(F.col("n").desc(), F.col("bigram"))
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= top_k)
        .select(group_col, "bigram", "n", "rk")
    )


def sequence_packing(
    docs: DataFrame,
    budget_tokens: int = 512,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy sequence packing: assign documents to fixed-token-budget
    packs (training-sequence bins) per group, in deterministic doc-id
    order — the step that turns a curated corpus into model-ready
    concatenated sequences.

    pack_id = floor(cumulative_tokens_before_this_doc / budget): a pure
    running-sum window per group (one shuffle on the group key), no
    sequential driver loop. This is the streaming-greedy discipline
    (docs may straddle a boundary and spill into the next pack) rather
    than best-fit bin packing — identical to how packed pretraining
    datasets are actually laid out, and fully order-deterministic.
    """
    from pyspark.sql import Window

    tokens = F.size(F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit("")))
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        docs.withColumn("n_tokens", tokens.cast("long"))
        .withColumn("_cum", F.sum("n_tokens").over(w))
        # integer DIV, not double division: past 2^53 cumulative tokens
        # a float quotient can round across a bin boundary
        .withColumn(
            "pack_id",
            F.expr(f"coalesce(_cum, CAST(0 AS BIGINT)) DIV {budget_tokens}").cast("long"),
        )
        .select(id_col, group_col, "n_tokens", "pack_id")
    )


def token_diversity(docs: DataFrame) -> DataFrame:
    """Lexical-diversity quality signals per document: type-token ratio
    and the Gini-Simpson index 1 - sum(tf_i^2)/n^2 (the probability two
    random tokens differ). Simpson is the RATIONAL stand-in for Shannon
    entropy — same ordering, but built from integer counts and a single
    double division, so it is bit-exact across engines where entropy's
    transcendental log is not (cf. the rational idf in term_scores).

    Scale shape: explode -> map-side partial agg on (doc, word) -> one
    shuffle -> per-doc sum. The squared-count sum aggregates the compact
    tf relation, never raw tokens.
    """
    tf = _words(docs).groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    per_doc = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("n_words"),
        F.count("*").alias("n_types"),
        F.sum(F.col("tf") * F.col("tf")).alias("sum_sq"),
    )
    n = F.col("n_words").cast("double")
    return per_doc.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_types").cast("long").alias("n_types"),
        (F.col("n_types").cast("double") / n).alias("type_token_ratio"),
        (F.lit(1.0) - F.col("sum_sq").cast("double") / (n * n)).alias("simpson_diversity"),
    )


def ngram_novelty(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document n-gram novelty: the share of a doc's DISTINCT
    bigrams that appear in NO other document — high novelty marks
    original content, low novelty marks boilerplate/duplication (the
    memorization-risk signal a training-data pipeline tracks alongside
    dedup).

    Plan: shuffle-free zip_with bigram generation, distinct on
    (doc, bigram), one bigram-keyed aggregation for document frequency,
    join back on bigram, one doc-keyed aggregation. All counts are
    integers; the final ratio is a single IEEE division (exact and
    engine-identical given identical operands).

    Round 10: per-operator scan fan-out on the id (VERDICT r9 #2 —
    replaces the load-time documents fan-out): the bigram zip_with +
    explode + distinct is the heavy map side here; _bigram_rows itself
    stays un-fanned because its other consumer (bigram_topk) is a
    light consumer that measured a net tax.
    """
    db = _bigram_rows(scan_fanout_for(docs, id_col), id_col, text_col).distinct()
    bf = db.groupBy("bigram").agg(F.count("*").alias("_ndocs"))
    return (
        db.join(bf, "bigram")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum((F.col("_ndocs") == 1).cast("long")).alias("n_unique"),
        )
        .select(
            id_col,
            "n_bigrams",
            "n_unique",
            (F.col("n_unique").cast("double") / F.col("n_bigrams")).alias("novelty"),
        )
    )


def gopher_quality_flags(docs: DataFrame) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021,
    arXiv:2112.11446 §A1.1), adapted to the fixture corpus: word-count
    band, mean-word-length band, minimum stopword evidence, alphabetic
    ratio, and a repetition rule (share of the single most frequent
    word — the word-soup analogue of the paper's top-2-gram share).

    Every threshold comparison is EXACT integer cross-multiplication
    (n_chars >= 3*n_words, not mean >= 3.0), so flag boundaries cannot
    drift on float rounding between engines; the reported ratios are
    single integer/integer divisions (IEEE-identical). Two narrowing
    shuffles: (doc, word) counts, then per-doc sums — the same shape as
    text_stats, O(corpus tokens) map-side.

    Round 10: per-operator scan fan-out on doc_id (VERDICT r9 #2) —
    the word explode feeding the (doc, word) aggregation is the heavy
    map side of the Gopher gate.
    """
    w = _words(scan_fanout_for(docs, "doc_id"))
    per_word = w.groupBy("doc_id", "word").agg(F.count("*").alias("cnt"))
    stop_cnt = F.sum(
        F.when(F.col("word").isin(*STOPWORDS), F.col("cnt")).otherwise(F.lit(0))
    )
    alpha_cnt = F.sum(
        F.when(F.col("word").rlike("[A-Za-z]"), F.col("cnt")).otherwise(F.lit(0))
    )
    pd = per_word.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_words"),
        F.sum(F.col("cnt") * F.length("word")).cast("long").alias("n_chars"),
        F.max("cnt").cast("long").alias("max_word_cnt"),
        stop_cnt.cast("long").alias("stopword_cnt"),
        alpha_cnt.cast("long").alias("alpha_cnt"),
    )
    nw = F.col("n_words")
    flag = lambda c: F.when(c, F.lit(1)).otherwise(F.lit(0)).cast("long")  # noqa: E731
    word_count_ok = flag((nw >= 10) & (nw <= 100000))
    mean_len_ok = flag(
        (F.col("n_chars") >= 3 * nw) & (F.col("n_chars") <= 10 * nw)
    )
    stopword_ok = flag(F.col("stopword_cnt") >= 2)
    alpha_ok = flag(5 * F.col("alpha_cnt") >= 4 * nw)
    repetition_ok = flag(5 * F.col("max_word_cnt") <= nw)
    return pd.select(
        "doc_id",
        "n_words",
        (F.col("n_chars").cast("double") / nw.cast("double")).alias("mean_word_len"),
        "stopword_cnt",
        (F.col("alpha_cnt").cast("double") / nw.cast("double")).alias("alpha_ratio"),
        (F.col("max_word_cnt").cast("double") / nw.cast("double")).alias(
            "max_word_share"
        ),
        word_count_ok.alias("word_count_ok"),
        mean_len_ok.alias("mean_len_ok"),
        stopword_ok.alias("stopword_ok"),
        alpha_ok.alias("alpha_ok"),
        repetition_ok.alias("repetition_ok"),
        (
            word_count_ok * mean_len_ok * stopword_ok * alpha_ok * repetition_ok
        ).cast("long").alias("gopher_pass"),
    )


def bpe_merge_candidates(docs: DataFrame, top_k: int = 20) -> DataFrame:
    """First iteration of BPE tokenizer training (Sennrich et al.
    2016, arXiv:1508.07909): count every adjacent character pair
    across the corpus, weighted by word frequency — the pair with the
    highest count is the first merge the tokenizer would learn.

    The scalable shape: corpus tokens aggregate to a (word, freq)
    vocabulary FIRST (the classic BPE trick — pair generation runs per
    DISTINCT word, not per token), then each word explodes into its
    length-1 adjacent pairs map-side, and one bounded aggregation sums
    freq-weighted pair counts. Top-k ties break lexicographically, so
    the result is total-order deterministic.
    """
    vocab = _words(docs).groupBy("word").agg(F.count("*").alias("freq"))
    # length >= 2 BEFORE the sequence: sequence(1, 0) would run
    # descending in Spark and fabricate pairs for single-char words
    pairs = vocab.where(F.length("word") >= 2).select(
        "freq",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    counts = pairs.groupBy("pair").agg(F.sum("freq").cast("long").alias("pair_count"))
    # global top-k as sort+limit (TakeOrderedAndProject over the
    # bounded pair-cardinality aggregate), then rank the tiny result
    top = counts.orderBy(F.col("pair_count").desc(), F.col("pair")).limit(top_k)
    w = Window.orderBy(F.col("pair_count").desc(), F.col("pair"))
    return top.withColumn("rk", F.row_number().over(w).cast("long"))


def collocations_topk(
    docs: DataFrame, top_k: int = 20, min_count: int = 5, text_col: str = "text"
) -> DataFrame:
    """Collocation / phrase mining: corpus bigrams ranked by lift —
    count(xy) * total_words / (count(x) * count(y)) — the pointwise
    association score whose high scorers are multi-word expressions
    ("machine learning") rather than merely frequent pairs ("of the").
    min_count suppresses the unstable one-off tail, standard practice.

    All counts are exact integers from two bounded aggregations (the
    shuffle-free bigram explode plus the word count); the score is one
    double division of exact-in-double integer products, so ranking is
    IEEE-deterministic cross-engine. The unigram relation joins twice
    (left word, right word); both joins are against the bounded
    vocabulary, broadcast at any corpus scale. Global top-k is
    sort+limit (TakeOrderedAndProject).
    """
    w = _words(docs, text_col=text_col)
    uni = w.groupBy("word").agg(F.count("*").cast("long").alias("w_cnt"))
    total = w.agg(F.count("*").cast("long").alias("total_w"))
    big = (
        _bigram_rows(docs.select(F.lit(1).alias("_k"), text_col), "_k", text_col)
        .groupBy("bigram")
        .agg(F.count("*").cast("long").alias("xy_cnt"))
        .where(F.col("xy_cnt") >= min_count)
    )
    split = F.split(F.col("bigram"), " ")
    scored = (
        big.select("bigram", "xy_cnt", split[0].alias("_w1"), split[1].alias("_w2"))
        .join(F.broadcast(uni.select(F.col("word").alias("_w1"), F.col("w_cnt").alias("c1"))), "_w1")
        .join(F.broadcast(uni.select(F.col("word").alias("_w2"), F.col("w_cnt").alias("c2"))), "_w2")
        .crossJoin(F.broadcast(total))
        .select(
            "bigram",
            "xy_cnt",
            (
                (F.col("xy_cnt").cast("double") * F.col("total_w").cast("double"))
                / (F.col("c1").cast("double") * F.col("c2").cast("double"))
            ).alias("lift"),
        )
    )
    top = scored.orderBy(F.col("lift").desc(), F.col("bigram")).limit(top_k)
    win = Window.orderBy(F.col("lift").desc(), F.col("bigram"))
    return top.withColumn("rk", F.row_number().over(win).cast("long"))


def canonicalize_urls(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    """RFC 3986 §6-style URL normalization — the crawl pipeline's
    canonical-URL key: strip the fragment, lowercase scheme+authority
    (path/query case preserved — paths are case-sensitive), drop
    default ports (:443 for https, :80 for http), drop the www.
    prefix, collapse trailing path slashes (root stays '/'), drop
    utm_* tracking params, and sort the surviving query params for an
    order-independent key. Returns ``df`` with ``out_col`` appended.

    Shape note (measured, sf0.1, 150k URLs): this is a STAGED
    DataFrame transform, not one big Column expression, on purpose.
    A single Column tree re-executes every shared subexpression per
    reference (the authority regex alone is referenced ~5x), which
    measured 7.9 s; with each expensive intermediate aliased once per
    select, Catalyst's CollapseProject declines to inline non-cheap
    expressions consumed more than once, so each regex runs once per
    row — 1.1 s warm, 7x faster. Everything is regexp/string builtins
    except the param filter+sort, an array HOF over the handful of
    '&'-separated tokens one URL carries. DuckDB replays the identical
    algebra (list_filter/list_sort; replacement syntax $1 vs \\1
    differs, outputs do not), so canonical URLs are hash-exact
    cross-engine."""
    passthrough = [c for c in df.columns]
    # The stages alias intermediates under these names while
    # re-selecting every input column — an input that already carries
    # one (or whose out_col shadows an existing column) would produce
    # ambiguous/clobbered columns, so refuse loudly instead.
    reserved = {
        "_u1", "_auth", "_rest", "_path", "_qs",
        "_stripped", "_cauth", "_cpath", "_params",
    }
    clashes = reserved.intersection(passthrough)
    if clashes:
        raise ValueError(
            f"canonicalize_urls: input columns {sorted(clashes)} collide "
            "with staged intermediate names — rename them first"
        )
    if out_col in passthrough:
        raise ValueError(
            f"canonicalize_urls: out_col {out_col!r} already exists in the "
            "input — pick another name or drop it first"
        )
    s1 = df.select(
        *passthrough, F.regexp_replace(url_col, r"#.*$", "").alias("_u1")
    )
    s2 = s1.select(
        *passthrough,
        "_u1",
        F.regexp_extract(
            "_u1", r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)", 1
        ).alias("_auth"),
    )
    s3 = s2.select(
        *passthrough,
        F.col("_u1").substr(F.length("_auth") + 1, F.length("_u1")).alias(
            "_rest"
        ),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.lower("_auth"), r"^(https://[^:]*):443$", "$1"
                ),
                r"^(http://[^:]*):80$",
                "$1",
            ),
            r"://www\.",
            "://",
        ).alias("_cauth"),
    )
    s4 = s3.select(
        *passthrough,
        "_cauth",
        "_rest",
        F.regexp_extract("_rest", r"^([^?]*)", 1).alias("_path"),
    )
    s5 = s4.select(
        *passthrough,
        "_cauth",
        "_path",
        F.when(
            F.instr("_rest", "?") > 0,
            F.col("_rest").substr(F.length("_path") + 2, F.length("_rest")),
        )
        .otherwise(F.lit(""))
        .alias("_qs"),
    )
    s6 = s5.select(
        *passthrough,
        "_cauth",
        "_qs",
        F.regexp_replace("_path", r"/+$", "").alias("_stripped"),
    )
    s7 = s6.select(
        *passthrough,
        "_cauth",
        F.when(F.col("_stripped") == "", F.lit("/"))
        .otherwise(F.col("_stripped"))
        .alias("_cpath"),
        F.array_join(
            F.array_sort(
                F.filter(
                    F.split("_qs", "&"),
                    lambda x: (x != "") & ~x.startswith("utm_"),
                )
            ),
            "&",
        ).alias("_params"),
    )
    return s7.select(
        *passthrough,
        F.concat(
            "_cauth",
            "_cpath",
            F.when(F.col("_params") == "", F.lit("")).otherwise(
                F.concat(F.lit("?"), F.col("_params"))
            ),
        ).alias(out_col),
    )


def hashed_linear_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_tokenless: bool = False,
) -> DataFrame:
    """Per-document hashed linear classifier sums: token weight =
    (first 6 hex digits of md5(token) as int) % 2001 - 1000, an
    integer in [-1000, 1000] standing in for a trained fastText-style
    weight vector via the hashing trick — identical plumbing, plan
    shape, and scale anatomy, deterministic cross-engine.

    Returns one row per document: all passthrough columns of ``docs``
    except ``text_col``, plus ``sw`` (BIGINT weight sum) and ``n``
    (BIGINT token count). Scores stay in integer space so every
    downstream ratio can be ONE double division; mean weight sw/n is
    the model logit and sw >= 0 the keep decision (sigmoid monotone).

    One explode + one map-side-combinable integer aggregation keyed by
    document — the weight is computed inline from the token, so there
    is no vocabulary relation and no join, which is why hashed
    features are the scale path in the first place.

    By default a token-less document (empty or whitespace-only text)
    emits NO row, matching the declared queries' explode+filter oracle
    SQL. ``keep_tokenless=True`` keeps every input document — empty
    tokens become score-neutral sentinel rows (wt 0, uncounted), so a
    token-less doc scores sw=0, n=0 without a join. Gating sinks need
    this totality: dropping a doc from BOTH the kept and rejects lakes
    would silently lose it at ingest.

    Round 10: per-operator scan fan-out on the id (VERDICT r9 #2) —
    the explode + md5 weight hash per token is the heavy map side."""
    docs = scan_fanout_for(docs, id_col)
    passthrough = [c for c in docs.columns if c != text_col]
    # keep_tokenless must also survive NULL text: split(NULL) is NULL
    # and explode(NULL) emits no row, so without the coalesce a
    # NULL-text doc would still vanish — the exact bug totality exists
    # to prevent. (Default mode keeps the raw column: the declared
    # queries' oracles transcribe unnest(string_split(text)), which
    # drops NULL-text docs the same way.)
    text_expr = (
        F.coalesce(F.col(text_col), F.lit("")) if keep_tokenless else F.col(text_col)
    )
    words = docs.select(
        *passthrough,
        F.explode(F.split(text_expr, " ")).alias("word"),
    )
    if not keep_tokenless:
        words = words.where(F.col("word") != "")
    wt = (
        F.conv(F.substring(F.md5("word"), 1, 6), 16, 10).cast("long") % 2001
        - 1000
    )
    if keep_tokenless:
        # split("", " ") still yields one '' row per doc — make empty
        # tokens weightless and uncounted instead of filtering the doc
        # away (real '' tokens from runs of spaces are identical no-ops)
        wt = F.when(F.col("word") == "", F.lit(0).cast("long")).otherwise(wt)
        n_expr = F.sum((F.col("word") != "").cast("long")).alias("n")
    else:
        n_expr = F.count("*").cast("long").alias("n")
    other = [c for c in passthrough if c != id_col]
    return words.select(*passthrough, "word", wt.alias("wt")).groupBy(
        id_col
    ).agg(
        *[F.min(c).alias(c) for c in other],
        F.sum("wt").alias("sw"),
        n_expr,
    )


def bpe_merged_vocab(
    docs: DataFrame,
    steps: int = 3,
    text_col: str = "text",
    materialize_steps: bool = False,
) -> DataFrame:
    """The BPE trainer's working relation: the (word, freq) distinct
    vocabulary with one column per merge step — w0 is the raw word,
    w{i} is the tokenization after merge i (merged tokens written as
    the sentinel char(i)), plus the winning pair p{i} and its count
    c{i} replicated on every row (1-row broadcasts). Shared by
    bpe_train_steps (the per-step trajectory), the fertility report
    (tokens-per-word distribution of the final tokenization), and the
    depth-8 encode pass. See bpe_train_steps for the full semantics
    contract.

    ``materialize_steps``: truncate lineage after each merge
    (lineage.materialize, the iterative-operator discipline). Without
    it each step's top-1 census subplan re-executes the ENTIRE prior
    chain — O(steps^2) recompute, fine at the trainer's declared
    depth 3 (one Catalyst plan, zero construction-time jobs) but a
    measured 10-20x slowdown at the encode's depth 8. With it, each
    step's census reads the previous step's materialized vocabulary
    once; the vocabulary is DISTINCT-word-sized (corpus-sublinear),
    so the per-step materialization is cheap at any corpus scale."""
    from goeventstream_spark.operators.lineage import materialize

    vocab = _words(docs, text_col=text_col)
    for i in range(1, steps + 1):
        vocab = vocab.where(~F.col("word").contains(chr(i)))
    v = (
        vocab.groupBy("word")
        .agg(F.count("*").alias("freq"))
        .withColumnRenamed("word", "w0")
    )
    for i in range(1, steps + 1):
        prev = f"w{i - 1}"
        pairs = v.where(F.length(prev) >= 2).select(
            "freq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length(prev) - 1),
                    lambda j: F.col(prev).substr(j, F.lit(2)),
                )
            ).alias("pair"),
        )
        cnt = pairs.groupBy("pair").agg(F.sum("freq").cast("long").alias("c"))
        top = (
            cnt.orderBy(F.col("c").desc(), "pair")
            .limit(1)
            .select(F.col("pair").alias(f"p{i}"), F.col("c").alias(f"c{i}"))
        )
        v = v.crossJoin(F.broadcast(top)).withColumn(
            f"w{i}", F.expr(f"replace(w{i - 1}, p{i}, char({i}))")
        )
        if materialize_steps:
            v = materialize(v)
    return v


def bpe_train_steps(docs: DataFrame, steps: int = 3, text_col: str = "text") -> DataFrame:
    """TRUE multi-step BPE tokenizer training (Sennrich et al. 2016,
    arXiv:1508.07909) as one declarative plan — not just the pass-1
    pair census of ``bpe_merge_candidates`` above: each step counts
    adjacent token pairs over the CURRENT tokenization, merges the top
    pair corpus-wide, and the next step's counts reflect that merge.

    Token representation: the classic distinct-word trick — the corpus
    folds to a (word, freq) vocabulary first, every word starts as a
    char sequence, and a learned merge i rewrites its pair to the
    single sentinel char(i) (ASCII control codes, provably absent from
    the vocabulary — defensively filtered), so a token is always
    exactly one char and adjacent-pair enumeration stays a length-1
    substring explode. ``replace`` rewrites non-overlapping
    occurrences left-to-right in both engines, which is precisely the
    reference BPE merge order; pair COUNTS are position-based (count
    overlaps), so tokens_after can shrink by less than pair_count on
    self-overlapping runs — faithful to the reference trainer, where
    merge application is also greedy left-to-right.

    Merge selection is corpus-global: highest freq-weighted count,
    ties to the lexicographically smallest pair in the SENTINEL
    alphabet (byte order in both engines) — a merged token ranks by
    its merge index, since chr(i) sorts below every letter, NOT by its
    expanded surface form; a randomized property test pins this exact
    tiebreak against an independent model. The winning pair is a 1-row relation broadcast back over
    the vocabulary — no collect, the whole multi-step trainer is one
    Catalyst plan.

    Output: one row per step — (step, pair, pair_count, tokens_before,
    tokens_after), with ``pair`` displayed in fully-expanded surface
    chars (sentinels substituted back through earlier merges).

    100 TB shape: per step, one map-side explode over the DISTINCT
    vocabulary (sublinear in corpus size), one aggregation over the
    bounded pair alphabet (chars + earlier sentinels, squared), one
    TakeOrdered(1), one broadcast rewrite. The vocabulary relation
    never sorts globally and never collects.
    """
    v = bpe_merged_vocab(docs, steps=steps, text_col=text_col)
    aggs = [
        F.sum(F.col("freq") * F.length(f"w{i}")).cast("long").alias(f"t{i}")
        for i in range(0, steps + 1)
    ] + [
        c
        for i in range(1, steps + 1)
        for c in (F.max(f"p{i}").alias(f"p{i}"), F.max(f"c{i}").alias(f"c{i}"))
    ]
    one = v.agg(*aggs)

    def display(i: int) -> str:
        e = f"p{i}"
        for j in range(i - 1, 0, -1):
            e = f"replace({e}, char({j}), p{j})"
        return e

    rows = ", ".join(
        f"CAST({i} AS BIGINT), {display(i)}, c{i}, t{i - 1}, t{i}"
        for i in range(1, steps + 1)
    )
    return one.select(
        F.expr(
            f"stack({steps}, {rows}) AS"
            " (step, pair, pair_count, tokens_before, tokens_after)"
        )
    )


def bpe_encode_corpus(
    docs: DataFrame,
    steps: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ENCODE with the trained BPE table — the consumer of
    bpe_train_steps' learned merges, applied back over the corpus at
    document granularity (the trainer proves training; this is the
    tokenize-the-corpus pass a data pipeline actually runs). Each
    word is rewritten through the same sentinel-replace chain the
    trainer pins (merge i = replace(p_i -> char(i)), greedy
    left-to-right, identical in both engines), so a word's token
    count is exactly length(w_steps). Words containing a sentinel
    control char are excluded from encoding precisely as the trainer
    excludes them from the vocabulary (defensive; provably absent
    from real text).

    Output: one row per document with at least one word —
    (id_col, n_words, chars_before, tokens_after). tokens_after <=
    chars_before always; the difference is the number of merge
    applications in that document.

    100 TB shape: the merge table is a 1-row aggregate broadcast onto
    the corpus word relation (map-side rewrite, no join on data keys);
    the only shuffle is the per-document rollup. The vocabulary
    trainer it embeds stays sublinear (distinct-word relation) and is
    trained with per-step lineage truncation (materialize_steps) so
    the step-k census never re-executes the chain below it — the
    O(steps^2) recompute that made the depth-8 table 10-20x slower
    than depth 3 before r9."""
    v = bpe_merged_vocab(
        docs, steps=steps, text_col=text_col, materialize_steps=True
    )
    merges = v.agg(
        *[F.max(f"p{i}").alias(f"p{i}") for i in range(1, steps + 1)]
    )
    w = _words(docs, id_col=id_col, text_col=text_col)
    for i in range(1, steps + 1):
        w = w.where(~F.col("word").contains(chr(i)))
    enc = "word"
    for i in range(1, steps + 1):
        enc = f"replace({enc}, p{i}, char({i}))"
    return (
        w.crossJoin(F.broadcast(merges))
        .select(
            id_col,
            F.length("word").alias("_nc"),
            F.length(F.expr(enc)).alias("_nt"),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("_nc").cast("long").alias("chars_before"),
            F.sum("_nt").cast("long").alias("tokens_after"),
        )
    )
