"""Table maintenance: small-file compaction for partitioned stores,
and drift-gated index refits for the incremental ANN indexes.

Streaming/incremental ingest appends a file per micro-batch per
partition; after a few thousand batches a partition is thousands of
tiny files and every scan pays open/footer costs per file.  The fix is
periodic compaction — rewrite ONLY the partitions whose file count
exceeds a threshold, as one atomic dynamic-partition overwrite (the
same janitor-tick shape as the reference's stuck-page reset, M4).

The refit ops close the maintenance loop the append paths opened:
``append_ivf_index`` / ``append_pq_index`` absorb deltas with FROZEN
codebooks, which age as the data distribution drifts.  The drift
metrics (``ivf_assignment_drift``, ``pq_quantization_error``) existed
as signals; ``maybe_refit_ivf`` / ``maybe_refit_pq`` are their
consumers — each compares the NEW batch's error against the fit-time
baseline persisted alongside the index and either appends (cheap,
incremental, old files untouched) or refits offline (rebuild codebook
on old + new, re-encode, new baseline).  At 100 TB the refit is the
rare, deliberately-scheduled operation; the gate is what makes
"append forever" safe to run unattended.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F

from qurio_spark.functions.checkpointing import checkpoint_df


def small_file_partitions(
    path: str, partition_col: str, max_files: int
) -> list[str]:
    """Partition values whose directory holds more than ``max_files``
    parquet files.  Local-filesystem walk — in cloud deployments swap
    for a listing against the object-store catalog; the compaction
    logic is unchanged."""
    from urllib.parse import unquote

    out = []
    prefix = f"{partition_col}="
    if not os.path.isdir(path):
        return out
    for d in sorted(os.listdir(path)):
        full = os.path.join(path, d)
        if d.startswith(prefix) and os.path.isdir(full):
            n = sum(1 for f in os.listdir(full) if f.endswith(".parquet"))
            if n > max_files:
                # Spark URL-encodes partition values in directory names
                # (e.g. "a b" -> "a%20b"); the filter compares against
                # the DECODED column value
                out.append(unquote(d[len(prefix):]))
    return out


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str = "source_id",
    max_files: int = 1,
) -> int:
    """Rewrite fragmented partitions into one file each.  Returns the
    number of partitions compacted.

    Only fragmented partitions are read (the isin filter prunes
    directories) and only they are overwritten (dynamic partition
    overwrite); healthy partitions' files are untouched on disk.  The
    read is materialized (localCheckpoint) BEFORE the overwrite so the
    rewrite never races its own input."""
    values = small_file_partitions(path, partition_col, max_files)
    if not values:
        return 0
    fragmented = (
        spark.read.parquet(path)
        .filter(F.col(partition_col).isin(values))
        .repartition(partition_col)
        .transform(lambda d: checkpoint_df(d, eager=True))
    )
    (
        fragmented.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
    return len(values)


# ---------------------------------------------------------------------------
# Drift-gated ANN index refits
# ---------------------------------------------------------------------------


def _write_stats(spark: SparkSession, path: str, mean_err: float, n: int) -> None:
    spark.createDataFrame(
        [(float(mean_err), int(n))], "mean_err double, n bigint"
    ).repartition(1).write.mode("overwrite").parquet(f"{path}/stats")


def _read_stats(spark: SparkSession, path: str):
    try:
        r = spark.read.parquet(f"{path}/stats").collect()[0]
        return float(r["mean_err"]), int(r["n"])
    except Exception:
        return None


def write_ivf_stats(spark: SparkSession, path: str) -> float:
    """Persist the fit-time drift baseline for an IVF index: the mean
    squared distance of the CURRENTLY-INDEXED corpus to its nearest
    centroids.  Call once after ``write_ivf_index`` (refits rewrite it
    automatically).  One assignment pass over the labeled table."""
    from qurio_spark.operators.similarity import (
        ivf_assignment_drift,
        read_ivf_index,
    )

    labeled, cdf = read_ivf_index(spark, path)
    cents = [
        [float(x) for x in r["centroid"]]
        for r in sorted(cdf.collect(), key=lambda r: r["label"])
    ]
    agg = (
        ivf_assignment_drift(labeled.drop("label"), cents)
        .agg(
            F.sum(F.col("mean_sq_dist") * F.col("n")).alias("s"),
            F.sum("n").alias("n"),
        )
        .first()
    )
    mean_err = float(agg["s"]) / float(agg["n"])
    _write_stats(spark, path, mean_err, int(agg["n"]))
    return mean_err


def maybe_refit_ivf(
    spark: SparkSession,
    path: str,
    new_embeddings,
    drift_ratio: float = 2.0,
    k: int | None = None,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Drift-gated incremental IVF maintenance: measure the NEW batch's
    mean squared distance to the persisted centroids; if it is within
    ``drift_ratio`` x the fit-time baseline, APPEND with the frozen
    codebook (cheap — old partition files untouched); otherwise REFIT
    offline — rebuild the codebook over old + new vectors, re-label,
    rewrite, and refresh the baseline.  Returns a report dict
    ``{action, batch_err, baseline, ratio}``.

    Requires the baseline (``write_ivf_stats``) — refusing to guess is
    the point: an unanchored gate would silently never fire."""
    from qurio_spark.operators.similarity import (
        append_ivf_index,
        ivf_assignment_drift,
        ivf_build,
        read_ivf_index,
        write_ivf_index,
    )

    stats = _read_stats(spark, path)
    if stats is None:
        raise ValueError(
            f"no drift baseline at {path}/stats — run write_ivf_stats(spark,"
            " path) once after building the index"
        )
    baseline, _ = stats
    labeled, cdf = read_ivf_index(spark, path)
    cent_rows = sorted(cdf.collect(), key=lambda r: r["label"])
    cents = [[float(x) for x in r["centroid"]] for r in cent_rows]
    batch = new_embeddings.select(id_col, vec_col)
    agg = (
        ivf_assignment_drift(batch, cents, id_col, vec_col)
        .agg(
            F.sum(F.col("mean_sq_dist") * F.col("n")).alias("s"),
            F.sum("n").alias("n"),
        )
        .first()
    )
    batch_err = float(agg["s"]) / float(agg["n"])
    ratio = batch_err / baseline if baseline > 0 else float("inf")
    if ratio <= drift_ratio:
        append_ivf_index(spark, path, batch, id_col, vec_col)
        return {
            "action": "append", "batch_err": batch_err,
            "baseline": baseline, "ratio": ratio,
        }
    # refit: old + new vectors, deterministic rebuild (hash-seeded
    # k-means), atomic-enough overwrite of the labeled layout + stats.
    # Materialize the union FIRST — the rewrite must not race its own
    # read of {path}/labeled.
    union = checkpoint_df(
        labeled.select(id_col, vec_col).unionByName(batch), eager=True
    )
    k_eff = k if k is not None else len(cents)
    new_labeled, new_cdf = ivf_build(
        union, k=k_eff, iters=iters, id_col=id_col, vec_col=vec_col
    )
    write_ivf_index(new_labeled, new_cdf, path)
    write_ivf_stats(spark, path)
    return {
        "action": "refit", "batch_err": batch_err,
        "baseline": baseline, "ratio": ratio,
    }


def write_pq_stats(spark: SparkSession, path: str, embeddings, vec_col: str = "embedding") -> float:
    """Persist the fit-time quantization-error baseline for a PQ index.
    Needs the raw fit-time corpus (codes alone can't reproduce the
    reconstruction error) — call right after ``write_pq_index`` while
    the encode input is at hand; refits refresh it automatically."""
    from qurio_spark.operators.pq import pq_quantization_error, read_pq_index

    _, books = read_pq_index(spark, path)
    r = pq_quantization_error(embeddings, books, vec_col).first()
    _write_stats(spark, path, float(r["mean_sq_err"]), int(r["n"]))
    return float(r["mean_sq_err"])


def maybe_refit_pq(
    spark: SparkSession,
    path: str,
    new_embeddings,
    full_corpus=None,
    err_ratio: float = 2.0,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Drift-gated incremental PQ maintenance (the quantization-error
    twin of ``maybe_refit_ivf``): gate on the new batch's mean squared
    reconstruction error vs the fit-time baseline
    (``write_pq_stats``).  Within ``err_ratio`` x baseline -> APPEND
    with the frozen codebooks (old code files untouched).  Beyond it
    -> REFIT: re-fit codebooks (same m, k) and re-encode — which
    requires RAW vectors, and PQ codes are lossy, so the caller must
    pass ``full_corpus`` (the embedding source table, old + new; in a
    real pipeline the raw table is the system of record and the PQ
    index is derived data).  Refusing to reconstruct from codes is
    deliberate — a dequantized refit would launder the very error the
    gate just flagged.  Returns ``{action, batch_err, baseline,
    ratio}``; raises if a refit is needed but ``full_corpus`` wasn't
    given (the gate's answer still reaches the caller in the error)."""
    from qurio_spark.operators.pq import (
        append_pq_index,
        pq_encode,
        pq_fit,
        pq_quantization_error,
        read_pq_index,
        write_pq_index,
    )

    stats = _read_stats(spark, path)
    if stats is None:
        raise ValueError(
            f"no quantization-error baseline at {path}/stats — run"
            " write_pq_stats(spark, path, fit_corpus) after building"
        )
    baseline, _ = stats
    existing, books = read_pq_index(spark, path)
    batch = new_embeddings.select(id_col, vec_col)
    r = pq_quantization_error(batch, books, vec_col).first()
    batch_err = float(r["mean_sq_err"])
    ratio = batch_err / baseline if baseline > 0 else float("inf")
    if ratio <= err_ratio:
        append_pq_index(spark, path, batch, id_col, vec_col)
        return {
            "action": "append", "batch_err": batch_err,
            "baseline": baseline, "ratio": ratio,
        }
    if full_corpus is None:
        raise ValueError(
            f"PQ drift {ratio:.2f}x exceeds gate {err_ratio}x — refit needed,"
            " which re-encodes from raw vectors: pass full_corpus (the"
            " embedding source table including the new batch)"
        )
    m = len(books)
    k = len(books[0])
    # packed-ness of the rebuilt index follows the existing one
    from qurio_spark.operators.pq import _codes_packed

    corpus = checkpoint_df(full_corpus.select(id_col, vec_col), eager=True)
    new_books = pq_fit(corpus, m=m, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    codes = pq_encode(
        corpus, new_books, id_col, vec_col, packed=_codes_packed(existing)
    )
    write_pq_index(codes, new_books, path)
    write_pq_stats(spark, path, corpus, vec_col)
    return {
        "action": "refit", "batch_err": batch_err,
        "baseline": baseline, "ratio": ratio,
    }
