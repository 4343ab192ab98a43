"""Similarity search over embedding columns (SURVEY.md §2b group 3).

Embeddings are ``array<float>`` columns; all arithmetic casts to double
element-wise first, then multiplies pairwise and sums left-to-right via
``aggregate`` — the same order DuckDB's list_dot_product uses on
DOUBLE[], so cosine scores are bit-identical cross-engine (and sqrt is
IEEE-correctly-rounded everywhere).

Scale shape:
- ``cosine_topk``: broadcast the (small) query set against the corpus —
  a map-side cross product, no shuffle until the final per-query top-k
  window. This is the brute-force baseline.
- ``embedding_near_dup``: blocked self-join — pairs are only generated
  within a block (here ``label``; at 100 TB an IVF/k-means centroid id
  or LSH hyperplane bucket). The block key is the shuffle key; n² only
  within blocks.
- ``lsh_bucket``: sign-of-projection bucketing against deterministic
  hyperplanes for the sub-brute-force path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column, dims: int | None = None) -> Column:
    """Left-to-right double-precision dot product of two float arrays.

    With ``dims`` known (our embeddings are fixed 64-dim), the product
    expands to a flat sum of element products — a plain codegen'd
    expression, ~5x faster than the higher-order-function form, whose
    lambdas Spark interprets per element. The fold order (and therefore
    the exact double result) is identical: ((0+p0)+p1)+... with
    0.0+p0 == p0.
    """
    if dims is not None:
        return sum(
            F.element_at(a, i + 1).cast("double") * F.element_at(b, i + 1).cast("double")
            for i in range(dims)
        )
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column, dims: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dims))


def cosine(a: Column, b: Column, dims: int | None = None) -> Column:
    return dot(a, b, dims) / (norm(a, dims) * norm(b, dims))


def cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Brute-force top-k cosine neighbors for each query vector.

    ``queries`` is a small DataFrame (query_id, q_embedding); it is
    broadcast, so the corpus scan is embarrassingly parallel. Exact
    baseline for ANN variants. Self-matches excluded by id. Scoring is
    the Arrow pair scorer (full vector width — a dims parameter here
    would be dead weight, the flat-expression path does not apply).
    """
    joined = emb.crossJoin(F.broadcast(queries)).where(
        F.col("vec_id") != F.col("query_id")
    )
    scored = _arrow_pair_scores(joined)
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
    )


def _arrow_pair_scores(joined: DataFrame) -> DataFrame:
    """Arrow-batched cosine over (query_id, vec_id, q_embedding,
    embedding) pair rows: the join stays a pure JVM plan; only the
    per-pair arithmetic moves to numpy, with the reduction as an
    explicit left-to-right column fold so the doubles are bit-identical
    to the SQL sum chain (see embedding_near_dup for the exactness
    contract). Per-pair JVM expression cosines evaluate 3 chained
    64-term folds row-at-a-time — measured 3x slower."""

    def batch_cosine(it):  # self-contained for foreign-cwd executors
        import numpy as np
        import pandas as pd

        def fold(mat):
            acc = mat[:, 0].copy()
            for i in range(1, mat.shape[1]):
                acc += mat[:, i]
            return acc

        for pdf in it:
            if len(pdf) == 0:
                continue
            qm = np.stack(pdf["q_embedding"].to_numpy()).astype(np.float64)
            cm = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            cos = fold(qm * cm) / (np.sqrt(fold(qm * qm)) * np.sqrt(fold(cm * cm)))
            yield pd.DataFrame(
                {"query_id": pdf["query_id"], "vec_id": pdf["vec_id"], "cos_sim": cos}
            )

    return joined.select("query_id", "vec_id", "q_embedding", "embedding").mapInPandas(
        batch_cosine, "query_id long, vec_id long, cos_sim double"
    )


def embedding_near_dup(
    emb: DataFrame,
    threshold: float = 0.95,
    block_col: str | list[str] = "label",
    dims: int | None = 64,
) -> DataFrame:
    """Near-duplicate vector pairs above a cosine threshold, blocked by
    ``block_col`` (a column name or a list — e.g. ``["cell", "label"]``
    for IVF-cell x label compound blocking) so pair generation is
    per-block instead of global n².

    Execution (third measured shape, fastest): one shuffle on the block
    key, then an Arrow-batched ``applyInPandas`` computes every
    in-block pair's cosine with vectorized numpy. Per-pair JVM
    expression dots were tried twice and lose badly at 64 dims: the
    inline form overflows Janino's 64 KB method limit (whole-stage
    falls back to interpreted, BENCH_r01 tail), and the split form
    (norms scan-side + an ``observe`` fusion barrier) compiles but
    still evaluates 64 ``element_at`` products row-at-a-time — 5.2 s
    at sf0.1 vs 0.7 s for this Arrow path on the same 200k candidate
    pairs. The threshold filter runs inside the UDF, so only hits
    cross Arrow back.

    Bit-exactness contract (the driver hash-compares against DuckDB):
    numpy reproduces the SQL result EXACTLY, not approximately —
    float32 inputs widen to float64 (exact), element products multiply
    in float64 (identical IEEE ops), and the reduction is an explicit
    left-to-right column fold ((p0+p1)+p2)... in the same order as the
    SQL sum chain — NOT numpy's pairwise ``sum``/BLAS ``matmul``,
    whose different association would drift ULPs and break the hash
    gate. sqrt and divide are correctly-rounded singletons everywhere.

    At 100 TB the block key becomes an IVF centroid / LSH bucket id
    (``clustering.ivf_cell_assign`` / ``lsh_bucket`` below — the
    declared embedding_near_dup query composes cell x label); block
    sizes are bounded by construction, so per-task memory is
    O(block² · dims) with a known cap.
    """

    def block_pairs(pdf):  # self-contained: executors may lack repo sys.path
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "vec_a": pd.Series(dtype="int64"),
                "vec_b": pd.Series(dtype="int64"),
                "cos_sim": pd.Series(dtype="float64"),
            }
        )
        if len(pdf) < 2:
            return empty
        pdf = pdf.sort_values("vec_id")
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        ids = pdf["vec_id"].to_numpy()
        sq = mat * mat
        acc = sq[:, 0].copy()
        for i in range(1, sq.shape[1]):
            acc += sq[:, i]
        norms = np.sqrt(acc)
        ii, jj = np.triu_indices(len(pdf), k=1)
        prod = mat[ii] * mat[jj]
        dots = prod[:, 0].copy()
        for i in range(1, prod.shape[1]):
            dots += prod[:, i]
        cos = dots / (norms[ii] * norms[jj])
        keep = cos >= threshold
        if not keep.any():
            return empty
        return pd.DataFrame(
            {"vec_a": ids[ii][keep], "vec_b": ids[jj][keep], "cos_sim": cos[keep]}
        )

    block_cols = [block_col] if isinstance(block_col, str) else list(block_col)
    return (
        emb.select("vec_id", *block_cols, "embedding")
        .groupBy(*block_cols)
        .applyInPandas(block_pairs, "vec_a long, vec_b long, cos_sim double")
    )


def lsh_bucket(emb: DataFrame, n_planes: int = 8, seed_dims: int = 64) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector: hyperplane p's
    component j is ±1 from the parity of md5(p|j) — deterministic,
    reproducible on any engine, no stored model. Bucket = bit-packed
    signs of the projections.

    This is the ANN scale path: equality on bucket id prunes candidate
    pairs before exact cosine verification.
    """
    import hashlib

    planes = [
        [
            1.0 if int(hashlib.md5(f"{p}|{j}".encode()).hexdigest(), 16) % 2 == 0 else -1.0
            for j in range(seed_dims)
        ]
        for p in range(n_planes)
    ]
    proj_bits = []
    for p, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                _as_double(F.col("embedding")),
                F.array(*[F.lit(v) for v in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        proj_bits.append(F.when(proj >= 0, F.lit(2**p)).otherwise(F.lit(0)))
    bucket = sum(proj_bits).cast("long")
    return emb.select("vec_id", "label", "embedding", bucket.alias("lsh_bucket"))

def _md5_planes(n_planes: int, dims: int) -> list[list[float]]:
    """The md5-parity ±1 hyperplane family shared by lsh_bucket,
    band_signatures, and lsh_banded_near_dup — deterministic,
    reproducible on any engine, no stored model."""
    import hashlib as _hashlib

    return [
        [
            1.0
            if int(_hashlib.md5(f"{p}|{j}".encode()).hexdigest(), 16) % 2 == 0
            else -1.0
            for j in range(dims)
        ]
        for p in range(n_planes)
    ]


def _band_sig_udf(planes: list[list[float]], bands: int, planes_per_band: int):
    """Arrow-batched band signatures with the EXACT left-fold: each
    projection accumulates dim-by-dim in index order — bit-identical to
    a SQL ``list_dot_product`` chain (same contract as
    _arrow_pair_scores), unlike a BLAS matmul whose summation order is
    unspecified and can flip a sign that lands exactly on 0. Vectorized
    across rows, so it is also ~the matmul's speed at these dims."""
    from pyspark.sql.functions import pandas_udf

    _planes, _bands, _ppb = planes, bands, planes_per_band

    @pandas_udf("array<string>")
    def band_sigs(embs):
        import numpy as np
        import pandas as pd

        P = np.array(_planes, dtype=np.float64)  # (n_planes, dims)
        X = np.stack([np.asarray(e, dtype=np.float64) for e in embs])
        signs = np.empty((len(X), len(P)), dtype=np.uint8)
        for p in range(len(P)):
            prod = X * P[p]  # exact: ±1 scaling
            acc = prod[:, 0].copy()
            for j in range(1, prod.shape[1]):
                acc += prod[:, j]
            signs[:, p] = acc >= 0
        return pd.Series(
            [
                [
                    "".join(map(str, row[b * _ppb : (b + 1) * _ppb]))
                    for b in range(_bands)
                ]
                for row in signs
            ]
        )

    return band_sigs


def band_signatures(
    emb: DataFrame,
    bands: int = 8,
    planes_per_band: int = 4,
    dims: int = 64,
) -> DataFrame:
    """The deterministic signature TABLE underneath
    :func:`lsh_banded_near_dup`: one row per (vec_id, band_id) with the
    band's sign-of-projection bit string, computed with the exact fold
    (see _band_sig_udf) so the table — and therefore the banded
    near-dup's candidate generation — is DuckDB-hash-oracle-able.

    Pure map-side: no shuffle; one Arrow pass + posexplode per vector.
    """
    udf = _band_sig_udf(_md5_planes(bands * planes_per_band, dims), bands, planes_per_band)
    return emb.select(
        "vec_id", F.posexplode(udf(F.col("embedding"))).alias("band_id", "band_sig")
    )


def lsh_banded_near_dup(
    emb: DataFrame,
    threshold: float = 0.35,
    bands: int = 8,
    planes_per_band: int = 4,
    dims: int = 64,
) -> DataFrame:
    """ANN near-dup via banded hyperplane LSH: candidates collide on ANY
    band of sign-of-projection bits, then exact cosine verifies.

    The scale path for similarity search: pair generation happens only
    inside a (band_id, signature) bucket, so the quadratic cost is
    bounded by bucket collision rates, never global n². Recall/pruning
    measured on the fixtures at threshold 0.35 (weak similarity — the
    hard case for hyperplane LSH): 8 bands x 4 planes => ~81% recall
    while scoring ~40% of all pairs; at high thresholds (0.9+) the same
    scheme approaches 100% recall with far stronger pruning. Parameters
    trade recall for cost explicitly.

    Execution (fourth measured shape, fastest — 3.9 s -> ~1 s at
    sf0.1): one shuffle keys every (vector, band) row by its bucket,
    then an Arrow-batched ``applyInPandas`` generates in-bucket pairs,
    deduplicates multi-band collisions, and verifies exact cosines in
    vectorized numpy with the left-to-right fold order (bit-identical
    to the SQL chain — see embedding_near_dup's exactness contract, and
    the subset-of-exact recall test which depends on boundary-exact
    threshold decisions). The three JVM shapes all lost: a
    shuffle-hash self-join with flat-OR band dedup knocks the join out
    of codegen (23.6 s), the HOF-filter variant keeps codegen but
    interprets lambdas on ~1M collision rows (5.7 s there, 3.9 s
    tuned), and any post-join groupBy dedup shuffles two embeddings
    per candidate row (2x the query). Here a pair colliding in k bands
    is emitted only from its LOWEST colliding band — the dedup is a
    numpy prefix-equality mask, and candidate embeddings never cross a
    second shuffle at all.
    """
    # All 32 projections in one Arrow pass with the EXACT left-fold
    # (_band_sig_udf): the per-plane JVM forms are both bad here — 32
    # flat 64-term sums make Janino's codegen OOM a default-sized
    # driver, and the HOF aggregate/zip_with form evaluates interpreted
    # — and a BLAS matmul's unspecified summation order would make the
    # emitted pair set irreproducible cross-engine; with the exact fold
    # the WHOLE result (signatures -> collisions -> verified cosines)
    # is DuckDB-hash-oracle-able.
    band_sig_udf = _band_sig_udf(
        _md5_planes(bands * planes_per_band, dims), bands, planes_per_band
    )

    banded = emb.select(
        "vec_id",
        "embedding",
        band_sig_udf(F.col("embedding")).alias("_sigs"),
    ).select(
        "vec_id",
        "embedding",
        "_sigs",
        F.posexplode("_sigs").alias("band_id", "band_sig"),
    )

    _threshold = float(threshold)

    def bucket_pairs(pdf):  # self-contained: executors may lack repo sys.path
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "vec_a": pd.Series(dtype="int64"),
                "vec_b": pd.Series(dtype="int64"),
                "cos_sim": pd.Series(dtype="float64"),
            }
        )
        if len(pdf) < 2:
            return empty
        pdf = pdf.sort_values("vec_id")
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        ids = pdf["vec_id"].to_numpy()
        sq = mat * mat
        acc = sq[:, 0].copy()
        for i in range(1, sq.shape[1]):
            acc += sq[:, i]
        norms = np.sqrt(acc)
        ii, jj = np.triu_indices(len(pdf), k=1)
        # lowest-colliding-band dedup: drop pairs whose signatures also
        # match in any EARLIER band (they are emitted there instead)
        band_id = int(pdf["band_id"].iloc[0])
        if band_id > 0:
            sigs = np.stack(pdf["_sigs"].to_numpy())[:, :band_id]
            dup = (sigs[ii] == sigs[jj]).any(axis=1)
            ii, jj = ii[~dup], jj[~dup]
            if len(ii) == 0:
                return empty
        prod = mat[ii] * mat[jj]
        dots = prod[:, 0].copy()
        for i in range(1, prod.shape[1]):
            dots += prod[:, i]
        cos = dots / (norms[ii] * norms[jj])
        keep = cos >= _threshold
        if not keep.any():
            return empty
        return pd.DataFrame(
            {"vec_a": ids[ii][keep], "vec_b": ids[jj][keep], "cos_sim": cos[keep]}
        )

    return banded.groupBy("band_id", "band_sig").applyInPandas(
        bucket_pairs, "vec_a long, vec_b long, cos_sim double"
    )


def _nearest_centroids_udf(centers: list[list[float]], n: int):
    """Arrow-batched pandas UDF: the ``n`` nearest centroid ids per
    embedding, nearest first (ties by cid). A flat codegen'd argmin
    over 16 centroids x 64 dims builds a ~10k-node expression tree —
    measured SLOWER end-to-end (23 s at sf0.01) from Catalyst/Janino
    cost alone; one numpy matmul per Arrow batch is the right tool.
    Closure is self-contained (imports inside) per the driver-contract
    pickling rule."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def nearest(embs):
        import numpy as np
        import pandas as pd

        C = np.array(centers, dtype=np.float64)
        X = np.stack([np.asarray(e, dtype=np.float64) for e in embs])
        d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
        idx = np.argsort(d2, axis=1, kind="stable")[:, :n]
        return pd.Series([row.astype("int32").tolist() for row in idx])

    return nearest


def ivf_index(
    emb: DataFrame,
    n_centroids: int = 16,
    seed: int = 42,
    max_iter: int = 8,
    sample_cap: int = 4096,
    dims: int = 64,
):
    """IVF (inverted-file) index: partition the corpus by its nearest
    Lloyd's-KMeans centroid. Returns (assigned_df with centroid_id,
    centers list).

    The 100 TB shape, exactly as published ANN libraries build IVF
    indexes: train centroids on a BOUNDED sample (faiss trains on
    ~256*k vectors regardless of corpus size), then assign the corpus
    in one map pass — the argmin over centers is a flat codegen'd
    expression, so assignment costs one scan with no shuffle and no
    join, and centroid_id can feed a partition/cluster column. The
    driver-side collect here is capped at ``sample_cap`` rows by
    construction (independent of corpus size) and ordered by a hash of
    vec_id, so training is deterministic and safe at any scale.
    MLlib's distributed KMeans fit was measured 16 s of fixed job
    overhead at sf0.01 for the same cell quality.
    """
    import hashlib

    import numpy as np

    sample_rows = (
        emb.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(sample_cap)
        .collect()
    )
    X = np.array([r.embedding for r in sample_rows], dtype=np.float64)
    k = min(n_centroids, len(X))
    # deterministic init: k distinct sample points picked by the same
    # hash order the sample used (seed folded in for variant indexes)
    order = sorted(
        range(len(X)),
        key=lambda i: hashlib.md5(f"{seed}|{sample_rows[i].vec_id}".encode()).hexdigest(),
    )
    centers = X[order[:k]].copy()
    for _ in range(max_iter):
        # ||x-c||^2 = ||x||^2 - 2xc + ||c||^2 via matmul — one BLAS GEMM
        # instead of materializing the (n, k, d) diff tensor.
        d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ centers.T) + (centers * centers).sum(1)[None, :]
        assign = d2.argmin(axis=1)
        new_centers = centers.copy()
        for ci in range(k):
            members = X[assign == ci]
            if len(members):
                new_centers[ci] = members.mean(axis=0)
        if np.allclose(new_centers, centers):
            break
        centers = new_centers
    centers_list = [list(map(float, c)) for c in centers]
    nearest1 = _nearest_centroids_udf(centers_list, 1)
    assigned = emb.withColumn("centroid_id", F.element_at(nearest1("embedding"), 1))
    return assigned, centers_list


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    dims: int = 64,
) -> DataFrame:
    """ANN top-k via IVF: search only the ``n_probe`` clusters whose
    centroids are nearest each query — candidate work drops to
    ~n_probe/n_centroids of brute force at the cost of recall bounded
    by how often true neighbors fall in unprobed cells (pinned by
    test_scale_patterns on the fixtures).
    """
    assigned, centers = ivf_index(emb, n_centroids, dims=dims)

    nearest_n = _nearest_centroids_udf(centers, n_probe)
    probes = queries.select(
        "query_id",
        "q_embedding",
        F.explode(nearest_n("q_embedding")).alias("centroid_id"),
    )

    cand = assigned.join(F.broadcast(probes), "centroid_id").where(
        F.col("vec_id") != F.col("query_id")
    )
    scored = _arrow_pair_scores(cand)
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return scored.withColumn("rk", F.row_number().over(w).cast("long")).where(F.col("rk") <= k)


def quantize_embeddings(emb: DataFrame, bits_max: int = 127) -> DataFrame:
    """Scalar int8 quantization per vector: scale = 127/max|x_i|, then
    q_i = floor(x_i * scale) — the storage-compression step a 100 TB
    embedding lake applies before ANN indexing (4x smaller than
    float32, distance ranking approximately preserved).

    Pure map-side higher-order functions — no shuffle, no UDF; the
    quantized vector is emitted as a comma-joined string so the result
    is hash-comparable across engines (both render int64 identically).
    Every double op (abs, max, divide, multiply, floor) is a
    correctly-rounded IEEE singleton, so the oracle matches exactly;
    zero vectors would yield inf scales and are the caller's contract
    to exclude (the fixture corpus has none).
    """
    maxabs = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    scale = F.lit(float(bits_max)) / maxabs
    quant = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * scale).cast("long")
    )
    return emb.select(
        "vec_id",
        scale.alias("scale"),
        F.array_join(F.transform(quant, lambda v: v.cast("string")), ",").alias("qvec"),
    )


def pq_index(
    emb: DataFrame,
    n_subspaces: int = 8,
    n_codes: int = 16,
    dims: int = 64,
    seed: int = 42,
    max_iter: int = 8,
    sample_cap: int = 4096,
):
    """Product quantization (Jégou et al., "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011): split each L2-normalized
    vector into ``n_subspaces`` subvectors and quantize each against
    its own ``n_codes``-entry codebook — 64-dim float32 compresses to
    8 bytes (32x) while preserving approximate distances.

    Same scale anatomy as ivf_index: codebooks train on a BOUNDED
    hash-ordered sample (driver collect capped at sample_cap,
    corpus-size-independent, deterministic), then the corpus encodes
    in ONE Arrow map pass — no shuffle, no join; the codes column can
    be written back as the ANN index. Returns (codes_df, codebooks)
    where codebooks is [n_subspaces][n_codes][sub_dims] floats.
    """
    import hashlib

    import numpy as np

    if dims % n_subspaces != 0:
        raise ValueError(
            f"pq_index: dims={dims} not divisible by n_subspaces="
            f"{n_subspaces} — trailing dimensions would be silently "
            "dropped from codes and ADC distances"
        )
    sub = dims // n_subspaces
    sample_rows = (
        emb.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(sample_cap)
        .collect()
    )
    X = np.array([r.embedding for r in sample_rows], dtype=np.float64)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    books = []
    for s in range(n_subspaces):
        Xs = X[:, s * sub : (s + 1) * sub]
        k = min(n_codes, len(Xs))
        order = sorted(
            range(len(Xs)),
            key=lambda i: hashlib.md5(
                f"{seed}|{s}|{sample_rows[i].vec_id}".encode()
            ).hexdigest(),
        )
        centers = Xs[order[:k]].copy()
        for _ in range(max_iter):
            # GEMM distance expansion (see ivf comment) — ~10x over the
            # (n, k, sub) broadcasted diff tensor at n_codes=256.
            d2 = (
                (Xs * Xs).sum(1)[:, None]
                - 2.0 * (Xs @ centers.T)
                + (centers * centers).sum(1)[None, :]
            )
            assign = d2.argmin(axis=1)
            new_centers = centers.copy()
            for ci in range(k):
                members = Xs[assign == ci]
                if len(members):
                    new_centers[ci] = members.mean(axis=0)
            if np.allclose(new_centers, centers):
                break
            centers = new_centers
        books.append([list(map(float, c)) for c in centers])

    _books, _sub, _ns = books, sub, n_subspaces

    def encode(it):  # self-contained closure (driver-contract pickling rule)
        import numpy as np
        import pandas as pd

        B = [np.array(b, dtype=np.float64) for b in _books]
        for pdf in it:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            M /= np.linalg.norm(M, axis=1, keepdims=True)
            codes = np.empty((len(M), _ns), dtype=np.int64)
            for s in range(_ns):
                Ms = M[:, s * _sub : (s + 1) * _sub]
                Bs = B[s]
                d2 = (
                    (Ms * Ms).sum(1)[:, None]
                    - 2.0 * (Ms @ Bs.T)
                    + (Bs * Bs).sum(1)[None, :]
                )
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "codes": list(codes)}
            )

    codes_df = emb.select("vec_id", "embedding").mapInPandas(
        encode, "vec_id long, codes array<long>"
    )
    return codes_df, books


def pq_adc_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_subspaces: int = 8,
    n_codes: int = 256,
    dims: int = 64,
    rerank: int = 50,
    index: tuple | None = None,
) -> DataFrame:
    """Asymmetric-distance PQ search with exact re-ranking: each query
    builds per-subspace lookup tables of exact distances to every
    codebook entry; a candidate's approximate distance is
    ``n_subspaces`` table lookups summed — no float vector math per
    candidate. The ADC pass shortlists ``rerank`` candidates per query
    over the 8-byte codes (a 100 TB scan reads 32x less data than raw
    embeddings, O(S) per candidate), then ONLY the shortlist joins
    back to raw embeddings for an exact cosine re-rank — the published
    two-stage shape (Jégou et al., TPAMI 2011 §IV; every production
    PQ deployment re-ranks). Queries broadcast (tiny by contract).
    Approximate by construction — recall floor pinned in
    test_scale_patterns; on these unstructured synthetic embeddings
    the ADC-only shortlist is the recall bottleneck (real embeddings
    on low-dimensional manifolds quantize far better).
    """
    if index is not None:
        # A persisted index (codes table written back as parquet +
        # codebooks as a small JSON artifact) — search never retrains:
        # the index IS a table, reload and join (pinned in
        # test_scale_patterns.test_pq_index_persistence_roundtrip).
        codes_df, books = index
    else:
        codes_df, books = pq_index(emb, n_subspaces, n_codes, dims)

    # The index is self-describing: subspace count comes from the
    # codebooks themselves, so a persisted index built with a different
    # geometry than this call's n_subspaces still scores correctly.
    _books, _ns = books, len(books)

    def score(it):  # self-contained
        import numpy as np
        import pandas as pd

        B = [np.array(b, dtype=np.float64) for b in _books]
        sub = B[0].shape[1]
        for pdf in it:
            if len(pdf) == 0:
                continue
            # True ADC: build one (n_queries x n_codes) distance table
            # per subspace, then each candidate costs _ns table lookups
            # — O(S) per row instead of O(S*sub) float math. Tables are
            # per-batch; queries are few by contract so this is tiny.
            _qid, first, q_idx = np.unique(
                pdf["query_id"].to_numpy(), return_index=True, return_inverse=True
            )
            Q = np.stack(pdf["q_embedding"].to_numpy()[first]).astype(np.float64)
            Q /= np.linalg.norm(Q, axis=1, keepdims=True)
            C = np.stack(pdf["codes"].to_numpy())
            d = np.zeros(len(pdf))
            for s in range(_ns):
                qs = Q[:, s * sub : (s + 1) * sub]
                Bs = B[s]
                table = (
                    (qs * qs).sum(1)[:, None]
                    - 2.0 * (qs @ Bs.T)
                    + (Bs * Bs).sum(1)[None, :]
                )
                d += table[q_idx, C[:, s]]
            yield pd.DataFrame(
                {"query_id": pdf["query_id"], "vec_id": pdf["vec_id"], "adc_dist": d}
            )

    cand = codes_df.crossJoin(
        F.broadcast(queries.select("query_id", "q_embedding"))
    ).where(F.col("vec_id") != F.col("query_id"))
    scored = cand.mapInPandas(score, "query_id long, vec_id long, adc_dist double")
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id")
    )
    shortlist = (
        scored.withColumn("_ark", F.row_number().over(w_adc))
        .where(F.col("_ark") <= rerank)
        .select("query_id", "vec_id")
    )
    # exact re-rank: only |queries| x rerank rows rejoin raw embeddings
    pairs = (
        shortlist.join(emb.select("vec_id", "embedding"), "vec_id")
        .join(
            F.broadcast(queries.select("query_id", "q_embedding")), "query_id"
        )
    )
    exact = _arrow_pair_scores(pairs)
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return exact.withColumn("rk", F.row_number().over(w).cast("long")).where(
        F.col("rk") <= k
    )


def hard_negatives(emb: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Contrastive hard-negative mining: for each query vector, the
    top-k most-similar corpus vectors with a DIFFERENT label — the
    standard negative-sampling pass for embedding/reranker training
    (in-batch negatives are easy; the valuable negatives are the
    near-misses across class boundaries).

    ``queries`` carries (query_id, q_label, q_embedding) and is
    broadcast; the corpus scan stays embarrassingly parallel and the
    label-mismatch filter runs JVM-side before any scoring work, so
    only cross-label pairs reach the Arrow cosine. Same bit-exactness
    contract as cosine_topk (left-to-right fold). At 100 TB the
    crossJoin-with-broadcast becomes the per-query-shard map pass; the
    per-query top-k is a bounded-heap window.
    """
    joined = emb.crossJoin(F.broadcast(queries)).where(
        F.col("label") != F.col("q_label")
    )
    scored = _arrow_pair_scores(joined)
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return scored.withColumn("rk", F.row_number().over(w).cast("long")).where(
        F.col("rk") <= k
    )


def semdedup_keep(
    emb: DataFrame, threshold: float = 0.3, block_col: str = "label"
) -> DataFrame:
    """SemDeDup-style semantic pruning (Abbas et al. 2023,
    arXiv:2303.09540): within each cluster (block), drop every vector
    that has a LOWER-id neighbor at cosine >= threshold; survivors are
    the semantic representatives. The monotone keep-lowest-id rule
    (rather than the paper's greedy sweep) makes the result
    order-independent and exactly SQL-expressible, so the oracle gate
    applies; greedy and monotone agree whenever similarity is
    transitive within a dup group, and monotone is strictly more
    aggressive otherwise (documented contract).

    Plan: the blocked pair generator (embedding_near_dup — one shuffle
    on the block key, numpy in-block pairs) emits only above-threshold
    pairs; pruning is then a broadcast-size anti-join on the dominated
    side. At 100 TB the block key is an IVF cell id, exactly as the
    paper clusters with k-means first.
    """
    dominated = (
        embedding_near_dup(emb, threshold=threshold, block_col=block_col)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )
    return emb.join(dominated, "vec_id", "left_anti").select("vec_id", block_col)


def label_centroid_scores(emb: DataFrame, dims: int = 64, scale: int = 1_000_000) -> DataFrame:
    """Cluster-coherence scoring: cosine of each vector to its label's
    centroid — the ranking signal SemDeDup/SSL-prototypes pipelines use
    to keep prototypical examples and flag outliers (low cosine = far
    from its cluster's center).

    Exactness at scale: a float centroid would need a row-order-
    dependent float sum (non-deterministic under shuffle merge order),
    so the centroid is accumulated in EXACT integer space — each
    component is floor(v * 1e6) summed as int64 (mergeable, fold-order
    free), giving a fixed quantized centroid. Cosine is scale-
    invariant, so the un-normalized integer sum vector IS the centroid
    direction. The final dot/norm folds are left-to-right chained
    doubles, bit-identical to the SQL oracle's sum chain. One agg
    shuffle (10s of rows out) + one broadcast join back.
    """
    qcomp = [
        F.floor(F.col("embedding")[i].cast("double") * F.lit(float(scale))).alias(f"q{i}")
        for i in range(dims)
    ]
    cent = (
        emb.select("label", *qcomp)
        .groupBy("label")
        .agg(
            F.array(*[F.sum(f"q{i}").cast("double") for i in range(dims)]).alias(
                "q_embedding"
            )
        )
    )
    # Scoring rides the Arrow pair scorer (a 3x64-term inline JVM
    # expression would re-create the Janino 64 KB overflow documented
    # on embedding_near_dup); query_id doubles as the label key.
    joined = (
        emb.select("vec_id", "label", "embedding")
        .join(F.broadcast(cent), "label")
        .select(
            F.col("label").cast("long").alias("query_id"),
            "vec_id",
            "q_embedding",
            "embedding",
        )
    )
    return _arrow_pair_scores(joined).select(
        "vec_id",
        F.col("query_id").alias("label"),
        F.col("cos_sim").alias("centroid_cos"),
    )


def knn_graph_within_label(
    emb: DataFrame, k: int = 3, block_cols: list[str] | None = None
) -> DataFrame:
    """k-nearest-neighbor graph construction, blocked by
    ``block_cols`` (default ``["label"]``): for EVERY vector, its
    top-k most-similar neighbors sharing the block key — the backbone
    relation for graph clustering, connected-component semantic dedup,
    and kNN-classification passes.

    Block-bounded all-pairs (never global n²): the block equi-join
    bounds per-vector candidates to its block, pairs score through
    the Arrow cosine (exact fold contract), and the per-vector top-k
    is a bounded-heap window inside the block partition. A raw
    metadata label alone has fixed cardinality, so label blocks grow
    linearly with the corpus; the declared query composes it with the
    deterministic IVF cell (``clustering.ivf_cell_assign``), whose
    cardinality grows with the corpus and bounds block size by
    construction.
    """
    cols = list(block_cols) if block_cols else ["label"]
    a = emb.select(
        *cols, F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    b = emb.select(*cols, F.col("vec_id"), F.col("embedding"))
    joined = a.join(b, cols).where(F.col("query_id") != F.col("vec_id"))
    scored = _arrow_pair_scores(joined)
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return scored.withColumn("rk", F.row_number().over(w).cast("long")).where(
        F.col("rk") <= k
    )


def contrastive_triplets(emb: DataFrame, n_anchors: int = 10) -> DataFrame:
    """Triplet mining for contrastive training: for each anchor, the
    hardest POSITIVE (most-similar same-label vector) and the hardest
    NEGATIVE (most-similar cross-label vector) — the (a, p, n) rows a
    triplet-loss fine-tune consumes. Reuses the broadcast Arrow scorer
    twice with opposite label predicates; each side is a bounded-heap
    top-1 window, joined back on the anchor id.
    """
    anchors = emb.where(F.col("vec_id") < n_anchors).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_embedding"),
    )
    joined = emb.crossJoin(F.broadcast(anchors)).where(
        F.col("vec_id") != F.col("query_id")
    )
    same = joined.where(F.col("label") == F.col("q_label"))
    diff = joined.where(F.col("label") != F.col("q_label"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))

    def top1(scored, id_alias, cos_alias):
        return (
            scored.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .select(
                F.col("query_id").alias("anchor_id"),
                F.col("vec_id").alias(id_alias),
                F.col("cos_sim").alias(cos_alias),
            )
        )

    pos = top1(_arrow_pair_scores(same), "pos_id", "pos_cos")
    neg = top1(_arrow_pair_scores(diff), "neg_id", "neg_cos")
    return pos.join(neg, "anchor_id")
