"""Non-parquet sources and sinks.

The reference's only wire format is JSON over HTTP (main.go:90-91);
JSON-lines is its batch analogue. CSV rounds out ingest coverage.
Sinks write parquet partitioned by the engine's canonical keys — at
100 TB the events table partitions by (game, date) so delta scans
become partition pruning (SURVEY.md §4).

All readers take explicit schemas: schema inference is a full extra
pass over the data — never acceptable at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


# Micro-second timestamp fidelity: the default JSON/CSV timestampFormat
# truncates to milliseconds, silently corrupting event times on a
# round-trip. One format constant, used by every reader and writer.
TS_FORMAT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.schema(schema).option("timestampFormat", TS_FORMAT).json(path)


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", TS_FORMAT)
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("timestampFormat", TS_FORMAT).json(path)


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", "true").option("timestampFormat", TS_FORMAT).csv(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: Sequence[str]
) -> None:
    """Partition-pruned layout: the scan side of delta_scan/time-range
    queries prunes whole directories when filters hit these columns."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_clustered_parquet(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    target_files: int | None = None,
) -> None:
    """Layout-optimized parquet write: repartition to a bounded file
    count (small-file compaction) and sort WITHIN each partition on
    the cluster columns, so every row group's min/max statistics span
    a narrow range of the cluster key — the property that lets later
    scans with predicates on those columns skip whole row groups
    (and, with one file per partition range, whole files).

    This is the batch-side of the 100 TB layout discipline: the event
    lake partitions by (game, date) directories and clusters by ts
    within files; a delta scan then prunes directories AND row groups.
    repartitionByRange samples the cluster key to build range bounds
    (one exchange, skew absorbed by sampling — NOT a single-partition
    global sort), so each output file owns a contiguous, disjoint key
    range; the local sort then orders rows inside every row group.
    A plain hash repartition would spread the full key range into
    every file and leave row-group stats useless (measured: widest
    row-group span == global span).
    """
    out = df
    if target_files is not None:
        out = out.repartitionByRange(target_files, *cluster_cols)
    out.sortWithinPartitions(*cluster_cols).write.mode("overwrite").parquet(path)


def read_orc(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """ORC ingest (the other columnar lake format Spark reads natively;
    same predicate-pushdown / column-pruning path as parquet)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def zorder_value(cols: Sequence[str], bits: int = 10) -> "object":
    """Morton (z-order) interleave expression over pre-binned integer
    columns in [0, 2^bits): bit i of each column lands at position
    i*len(cols) + col_index. Pure shift/or arithmetic — whole-stage
    codegen, no UDF. With bits=10 and 2 columns this is 20 terms; keep
    bits*len(cols) <= ~24 so the expression stays well under the
    Janino 64 KB method limit (cf. the simhash split lesson)."""
    from pyspark.sql import functions as F  # local: keep module import light

    terms = []
    for ci, c in enumerate(cols):
        for b in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(F.col(c).cast("long"), b).bitwiseAND(F.lit(1)),
                    b * len(cols) + ci,
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    bits: int = 10,
    target_files: int | None = None,
) -> None:
    """Multi-dimensional clustered layout: bin each cluster column to
    [0, 2^bits) by min/max scaling (one tiny agg pass), Morton-
    interleave the bins, then range-partition + locally sort on the
    z-value. Row groups then hold rows that are close in EVERY cluster
    dimension, so scans filtering on ANY of the columns skip row
    groups on min/max stats — the property single-column range
    clustering (write_clustered_parquet) only gives the leading
    column. This is the same layout discipline as Delta/Iceberg
    Z-ORDER compaction, expressed as plain Spark.

    Min/max scaling is the simple binning choice; under heavy skew the
    bins degenerate and quantile boundaries (approxQuantile, still a
    driver-side scalar pass) are the drop-in upgrade.
    """
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{i}") for i, c in enumerate(cluster_cols)],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{i}") for i, c in enumerate(cluster_cols)],
    ).collect()[0]
    if any(stats[f"mn_{i}"] is None for i in range(len(cluster_cols))):
        # empty input or an all-NULL cluster column: nothing to
        # cluster on — write as-is rather than crash mid-compaction
        df.write.mode("overwrite").parquet(path)
        return
    binned = df
    bin_cols = []
    for i, c in enumerate(cluster_cols):
        mn, mx = stats[f"mn_{i}"], stats[f"mx_{i}"]
        span = (mx - mn) or 1.0
        bc = f"__zbin_{i}"
        # NULL cluster values bin to bucket 0 explicitly — the coalesce
        # must sit INSIDE least(): Spark's least() SKIPS nulls, so
        # least(max, NULL) = max and an outer coalesce would never fire,
        # silently placing NULL rows in the TOP bucket and polluting
        # that row group's stats for this dimension.
        binned = binned.withColumn(
            bc,
            F.least(
                F.lit((1 << bits) - 1),
                F.coalesce(
                    ((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * F.lit(1 << bits)).cast("long"),
                    F.lit(0),
                ),
            ),
        )
        bin_cols.append(bc)
    z = binned.withColumn("__zval", zorder_value(bin_cols, bits))
    out = z
    if target_files is not None:
        out = out.repartitionByRange(target_files, "__zval")
    (
        out.sortWithinPartitions("__zval")
        .drop("__zval", *bin_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 512,
    cluster_cols: Sequence[str] | None = None,
) -> int:
    """Small-file compaction (the lake-maintenance job every streaming
    sink needs eventually): rewrite a directory of many small parquet
    files into ceil(total_bytes / target_file_mb) files, optionally
    re-clustered on ``cluster_cols`` so the rewrite also restores
    row-group-stat pruning (write_clustered_parquet's property).

    File count is sized from the SOURCE's actual on-disk bytes (the
    input_file metadata column — no driver-side directory walk of data
    contents), so compaction is idempotent: re-running on an
    already-compacted directory is a near-no-op rewrite into the same
    file count. Returns the target file count. dst must differ from
    src (write-then-swap is the caller's atomic-publish step —
    overwriting a directory while reading it is undefined).
    """
    import os.path

    from pyspark.sql import functions as F

    if os.path.realpath(src_path) == os.path.realpath(dst_path):
        raise ValueError(
            "compact_parquet: dst_path must differ from src_path — "
            "overwriting a directory while lazily reading it loses data"
        )
    df = spark.read.parquet(src_path)
    total_bytes = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(src_path)
        .agg(F.sum("length"))
        .collect()[0][0]
        or 0
    )
    n = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))
    if cluster_cols:
        write_clustered_parquet(df, dst_path, list(cluster_cols), target_files=int(n))
    else:
        df.repartition(int(n)).write.mode("overwrite").parquet(dst_path)
    return int(n)


def write_idempotent(
    df: DataFrame, base_path: str, batch_id: str
) -> dict:
    """Idempotent batch publish — the exactly-once pattern a
    ``foreachBatch`` streaming sink (or a retried batch job) needs on
    a plain-file lake: the batch lands under
    ``base_path/batch_id=<id>/`` via write-to-temp + atomic directory
    rename, and a ``_manifest.json`` (row count + order-independent
    content checksum over every column) marks the commit. A re-run
    with the same batch_id sees the manifest and returns it WITHOUT
    rewriting — duplicate delivery becomes a no-op, which is what
    turns at-least-once retries into exactly-once output.

    The checksum is the BIGINT sum of a 48-bit md5 slice of each row's
    concatenated columns — commutative, so it is independent of
    partitioning and task order (the same primitive as
    ``daily_table_checksums``). Returns the manifest dict.

    Scope: LOCAL-FILESYSTEM publish only — the commit relies on POSIX
    atomic directory rename, which object stores (S3/GCS) and HDFS do
    not provide with these semantics; there, use the store's
    conditional-put / a table format's commit protocol instead.
    Concurrent publishers of the same batch_id race safely: the loser's
    rename fails and it adopts the winner's manifest.
    """
    import json
    import os
    import shutil
    import time

    from pyspark.sql import functions as F

    final_dir = os.path.join(base_path, f"batch_id={batch_id}")
    manifest_path = os.path.join(final_dir, "_manifest.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            return json.load(fh)

    row_h = F.conv(
        F.substring(
            F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in df.columns])),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    stats = df.agg(
        F.count("*").alias("n_rows"), F.sum(row_h).alias("checksum")
    ).collect()[0]

    # attempt-private staging dir (mkdtemp): concurrent publishers of
    # the same batch_id must never share a tmp path — a shared
    # _tmp_batch_<id> lets one attempt rmtree/rename the other's
    # half-written files. Underscore prefix keeps Spark readers from
    # globbing abandoned staging dirs.
    import tempfile

    os.makedirs(base_path, exist_ok=True)
    # Sweep staging dirs leaked by attempts of THIS batch_id that
    # crashed before rename (never another batch's — its publisher may
    # be mid-write). A LIVE concurrent attempt of the same batch_id is
    # also possible (neither has renamed yet), and rmtree-ing its
    # mkdtemp dir mid-write would fail that publisher spuriously — so
    # only dirs whose newest mtime ANYWHERE in their tree is stale
    # (default 1 h) are swept: a live Spark write keeps touching files,
    # a crashed attempt's tree goes quiet forever.
    stale_s = 3600.0
    now = time.time()
    for name in os.listdir(base_path):
        if not name.startswith(f"_tmp_batch_{batch_id}_"):
            continue
        leaked = os.path.join(base_path, name)
        try:
            newest = os.path.getmtime(leaked)
        except OSError:
            continue  # renamed/removed by a concurrent attempt = live race
        for root, _dirs, files in os.walk(leaked):
            for ent in files:
                try:
                    newest = max(newest, os.path.getmtime(os.path.join(root, ent)))
                except OSError:
                    newest = now  # vanishing entries = live writer
        if now - newest > stale_s:
            shutil.rmtree(leaked, ignore_errors=True)
    tmp_dir = tempfile.mkdtemp(prefix=f"_tmp_batch_{batch_id}_", dir=base_path)
    df.write.mode("overwrite").parquet(tmp_dir)
    manifest = {
        "batch_id": batch_id,
        "n_rows": int(stats["n_rows"]),
        "checksum": int(stats["checksum"] or 0),
        "columns": list(df.columns),
    }
    with open(os.path.join(tmp_dir, "_manifest.json"), "w") as fh:
        json.dump(manifest, fh)
    if os.path.exists(final_dir):
        # a concurrent/previous attempt published first — keep it
        shutil.rmtree(tmp_dir)
        with open(manifest_path) as fh:
            return json.load(fh)
    try:
        os.rename(tmp_dir, final_dir)
    except OSError:
        # Adopt-the-winner ONLY if a concurrent publisher actually
        # created final_dir between the existence check and the rename;
        # any other rename failure (EACCES, ENOSPC, EXDEV, ...) is a
        # real error and must surface as itself, not as a confusing
        # FileNotFoundError from the manifest open.
        if not os.path.exists(final_dir):
            shutil.rmtree(tmp_dir, ignore_errors=True)
            raise
        shutil.rmtree(tmp_dir, ignore_errors=True)
        with open(manifest_path) as fh:
            return json.load(fh)
    return manifest


def read_binary_media(
    spark: SparkSession,
    path: str,
    glob: str = "*",
    recursive: bool = True,
) -> DataFrame:
    """Ingest a directory tree of raw media files as binary columns —
    the lake-side entry point for the multimodal operators: one row per
    file with (path, modificationTime, length, content BINARY), via
    Spark's built-in binaryFile source. Listing and reads are
    distributed; nothing touches the driver. Feed ``content`` straight
    into operators/multimodal's Arrow decode passes (schema there is
    (doc_id, media BINARY) — select/alias accordingly).

    At 100 TB the same call works unchanged on an object-store URI;
    pair with ``spark.sql.files.maxPartitionBytes`` to keep whole files
    per task (binaryFile never splits a file)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", str(recursive).lower())
        .load(path)
    )


def _is_missing_avro_source(exc: Exception) -> bool:
    """ONLY the missing-data-source failure may be rewritten into the
    classpath hint — a substring test on 'avro' would also match any
    real error whose message embeds an avro output path (ENOSPC,
    permissions, schema errors) and mask it."""
    msg = str(exc)
    return "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find data source" in msg


def write_avro(df: DataFrame, path: str) -> None:
    """Avro sink — GATED: the spark-avro module is external since
    Spark 2.4 and its jar is not bundled in this environment; the
    clear error beats Spark's 'Failed to find data source'. Runs
    as-is on any cluster with org.apache.spark:spark-avro on the
    classpath."""
    try:
        df.write.format("avro").mode("overwrite").save(path)
    except Exception as exc:  # AnalysisException: missing data source
        if _is_missing_avro_source(exc):
            raise RuntimeError(
                "Avro support needs the external spark-avro package "
                "(org.apache.spark:spark-avro_2.13) on the classpath; "
                "it is not bundled in this environment"
            ) from exc
        raise


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro source — gated exactly like :func:`write_avro`."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as exc:
        if _is_missing_avro_source(exc):
            raise RuntimeError(
                "Avro support needs the external spark-avro package "
                "(org.apache.spark:spark-avro_2.13) on the classpath; "
                "it is not bundled in this environment"
            ) from exc
        raise
