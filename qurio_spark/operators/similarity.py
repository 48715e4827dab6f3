"""Vector similarity search (the other half of Q2, plus ANN extensions).

The reference delegates ANN to Weaviate's HNSW (SURVEY §4).  A Spark
rebuild has two regimes:

  - ``brute_force_topk`` — exact cosine top-k.  One map-only columnar
    pass + TakeOrderedAndProject: the correctness oracle, and genuinely
    fine up to ~10^7 vectors per query batch.
  - ``ivf_topk`` — IVF-style coarse quantization: vectors carry a
    partition/cluster label (here: the k-means-ish ``label`` column;
    in production the assignment job is a k-means fit + nearest-centroid
    map).  Queries probe only ``nprobe`` clusters, so the scan is
    partition-pruned — the 100 TB path, since the label is the physical
    partition key of the embeddings table.
  - ``lsh_topk`` — random-hyperplane LSH bucketing; probe only the
    query's bucket (+ optional multi-probe).  Deterministic planes
    derived from md5 so results are reproducible and testable.

All distance math is JVM-side (functions/vector.py) — no UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from qurio_spark.functions.hashing import hash64_py
from qurio_spark.functions.numeric import stable_round
from qurio_spark.functions.vector import cosine, dot, literal_vector, norm


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k by cosine (or dot).  -> (id_col, score) ordered.

    Physical plan: scan -> project(score) -> TakeOrderedAndProject
    (per-partition heaps + single driver merge; no full sort, no
    shuffle of the corpus).
    """
    q = literal_vector(query_vec)
    score = cosine(F.col(vec_col), q) if metric == "cosine" else dot(F.col(vec_col), q)
    return (
        embeddings.select(F.col(id_col), score.alias("score"))
        .orderBy(F.desc(stable_round(F.col("score"), 6)), F.asc(id_col))
        .limit(k)
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    centroids: DataFrame | None = None,
    probe_labels: list[int] | None = None,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """IVF search: restrict the exact scan to the ``nprobe`` clusters
    nearest the query (or explicit ``probe_labels``).

    ``centroids``: small (label, centroid array<float>) frame; when
    given, probe labels are chosen by cosine(query, centroid) — a
    driver-side top-nprobe over a tiny collect.  The big-side filter
    ``label IN (...)`` prunes partitions when the table is written
    partitioned by label.
    """
    if probe_labels is None:
        if centroids is None:
            raise ValueError("need centroids or probe_labels")
        q = literal_vector(query_vec)
        ranked = (
            centroids.select(
                F.col(label_col), cosine(F.col("centroid"), q).alias("sim")
            )
            .orderBy(F.desc("sim"))
            .limit(nprobe)
            .collect()
        )
        probe_labels = [r[label_col] for r in ranked]
    pruned = embeddings.filter(F.col(label_col).isin(probe_labels))
    return brute_force_topk(pruned, query_vec, k, id_col, vec_col)


def compute_centroids(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Mean vector per label — the IVF codebook build.  Aggregates
    component-wise via posexplode + groupBy(label, pos): two partial-agg
    shuffles over (n_labels * dim) keys, independent of row width."""
    exploded = embeddings.select(
        F.col(label_col), F.posexplode(F.col(vec_col)).alias("pos", "v")
    )
    means = exploded.groupBy(label_col, "pos").agg(F.avg("v").alias("m"))
    return (
        means.groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(
            label_col,
            F.transform("pm", lambda s: s["m"].cast("float")).alias("centroid"),
        )
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 11) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes from md5 bits —
    reproducible across engines/runs without an RNG."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hash64_py(f"plane:{seed}:{p}:{d}")
            row.append(1.0 if h % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def lsh_bucket_expr(vec_col, planes: list[list[float]]):
    """Sign-pattern bucket id (int) for a vector column under the given
    hyperplanes: bit p set iff dot(v, plane_p) >= 0."""
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        d = dot(vec_col, literal_vector(plane))
        bucket = bucket + F.when(d >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_query_bucket(query_vec: list[float], planes: list[list[float]]) -> int:
    """Driver-side sign-pattern bucket for a query vector — must agree
    bit-for-bit with ``lsh_bucket_expr`` so a persisted bucket
    partition can be pruned with a literal."""
    qb = 0
    for p, plane in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, plane)) >= 0:
            qb |= 1 << p
    return qb


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    n_planes: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> DataFrame:
    """Hyperplane-LSH ANN: score only vectors whose sign-pattern bucket
    matches the query's.  Computes the bucket over the corpus at query
    time — the oracle/ad-hoc form; repeated queries should use
    ``write_lsh_index`` + ``lsh_topk_prebuilt`` (bucket as a write-time
    partition column, zero corpus scans per query)."""
    dim = len(query_vec)
    planes = random_hyperplanes(dim, n_planes, seed)
    qb = lsh_query_bucket(query_vec, planes)
    bucketed = embeddings.withColumn("_bucket", lsh_bucket_expr(F.col(vec_col), planes))
    return brute_force_topk(bucketed.filter(F.col("_bucket") == qb), query_vec, k, id_col, vec_col)


def write_lsh_index(
    embeddings: DataFrame,
    path: str,
    dim: int,
    n_planes: int = 4,
    seed: int = 11,
    vec_col: str = "embedding",
) -> None:
    """Persist the LSH index — 'build once per corpus version', the
    same write-time layout BM25 (term_bucket) and IVF (label) earned:
    the corpus is written PARTITIONED BY its sign-pattern ``bucket``,
    so a query probes exactly one of 2^n_planes directories instead of
    recomputing buckets over the full corpus per query (reference keeps
    its second ANN index always-on: Weaviate HNSW,
    internal/vector/schema.go:18-102).

    The hyperplanes are md5-derived from (seed, n_planes, dim) — no
    plane matrix needs persisting, but the parameters do: ``meta/``
    records them so a reader can rebuild identical planes and reject a
    mismatched probe."""
    planes = random_hyperplanes(dim, n_planes, seed)
    bucketed = embeddings.withColumn("bucket", lsh_bucket_expr(F.col(vec_col), planes))
    bucketed.write.mode("overwrite").partitionBy("bucket").parquet(f"{path}/bucketed")
    meta = embeddings.sparkSession.createDataFrame(
        [(n_planes, seed, dim)], "n_planes int, seed int, dim int"
    )
    meta.write.mode("overwrite").parquet(f"{path}/meta")


@dataclass
class LSHIndex:
    bucketed: DataFrame
    n_planes: int
    seed: int
    dim: int


def read_lsh_index(spark, path: str) -> LSHIndex:
    m = spark.read.parquet(f"{path}/meta").collect()[0]
    return LSHIndex(
        bucketed=spark.read.parquet(f"{path}/bucketed"),
        n_planes=int(m["n_planes"]),
        seed=int(m["seed"]),
        dim=int(m["dim"]),
    )


def lsh_probe_buckets(
    query_vec: list[float], planes: list[list[float]], n_probe_buckets: int = 1
) -> list[int]:
    """Multi-probe bucket set (Lv et al.): rank ALL flip masks by the
    total |margin| of their flipped planes — a near-zero dot product
    means near neighbors plausibly landed on the other side of that
    plane, so cheap masks probe the likeliest neighbor buckets first —
    and take the ``n_probe_buckets`` cheapest (the query's own bucket
    is mask 0, cost 0).  Probing all 2^n_planes buckets degenerates to
    exact search.  Deterministic: ties break on mask value.  The
    2^n_planes enumeration is fine by construction — n_planes IS the
    log of the bucket count, so it's small."""
    qb = lsh_query_bucket(query_vec, planes)
    margin = [
        abs(sum(a * b for a, b in zip(query_vec, pl))) for pl in planes
    ]
    masks = sorted(
        range(1 << len(planes)),
        key=lambda m: (
            sum(margin[i] for i in range(len(planes)) if m >> i & 1),
            m,
        ),
    )
    return sorted(qb ^ m for m in masks[: max(1, n_probe_buckets)])


def lsh_topk_prebuilt(
    index: LSHIndex,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe_buckets: int = 1,
) -> DataFrame:
    """``lsh_topk`` against a persisted index: the driver rebuilds the
    (deterministic) planes from the stored parameters, hashes the query
    to its bucket(s), and the literal bucket filter reaches the scan as
    a PartitionFilter — ``n_probe_buckets`` directory reads, the rest
    of the corpus untouched.  With the default single probe the result
    is identical to the in-DAG ``lsh_topk`` with the same
    (n_planes, seed); multi-probe widens recall by also reading the
    lowest-margin neighbor buckets (see ``lsh_probe_buckets``)."""
    if len(query_vec) != index.dim:
        raise ValueError(
            f"query dim {len(query_vec)} != index dim {index.dim}"
        )
    planes = random_hyperplanes(index.dim, index.n_planes, index.seed)
    buckets = lsh_probe_buckets(query_vec, planes, n_probe_buckets)
    pruned = index.bucketed.filter(F.col("bucket").isin(buckets))
    return brute_force_topk(pruned, query_vec, k, id_col, vec_col)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    block_col: str | None = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "pandas",
    max_block: int | None = 4096,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine (dedup extension).

    Blocking: pairs are only formed inside a block (cluster/LSH
    bucket), turning the O(n^2) global problem into sum-of-squares over
    blocks — the standard scalable shape.  ``block_col=None`` degrades
    to one global block (oracle / small corpora only).

    ``impl='pandas'`` (default): one ``applyInPandas`` task per block
    doing a numpy float64 gram matrix — Arrow-batched, BLAS-grade, ~10x
    the throughput of per-pair JVM expression evaluation (a 64-term
    unrolled dot falls out of whole-stage codegen and evaluates
    interpreted).

    Block-size guard: a block with more than ``max_block`` rows would
    otherwise build an unbounded gram matrix on one executor (skewed
    cluster = OOM at 100 TB).  Such blocks are hash-split into
    ``s = ceil(n / max_block)`` sub-buckets and EVERY sub-bucket pair
    (i <= j) becomes its own task — still exact (each row pair meets in
    exactly one task, pairwise dots are unchanged), with per-task input
    bounded by 2*max_block rows.  The s-way row replication only
    happens for oversized blocks.  ``max_block=None`` disables the
    guard.

    ``impl='sql'``: pure-DataFrame self-join form (no Arrow, exact
    sequential-sum float semantics) for environments without pandas.
    """
    if impl == "pandas":
        import numpy as np
        import pandas as pd

        from qurio_spark.functions.hashing import hash64

        id_field = embeddings.schema[id_col].dataType.simpleString()
        out_schema = f"id_a {id_field}, id_b {id_field}, sim double"

        blk = F.col(block_col) if block_col else F.lit(0)
        base = embeddings.select(
            blk.alias("_blk"), F.col(id_col), F.col(vec_col)
        )
        if max_block is None:
            sized = base.withColumn("_s", F.lit(1))
        else:
            counts = base.groupBy("_blk").agg(F.count("*").alias("_bn"))
            sized = base.join(F.broadcast(counts), "_blk").withColumn(
                "_s", F.ceil(F.col("_bn") / F.lit(max_block)).cast("int")
            ).drop("_bn")
        tasks = (
            sized.withColumn(
                "_sub",
                F.pmod(hash64(F.col(id_col).cast("string")), F.col("_s")).cast("int"),
            )
            .withColumn("_other", F.explode(F.sequence(F.lit(0), F.col("_s") - 1)))
            .select(
                "_blk",
                F.least("_sub", "_other").alias("_ti"),
                F.greatest("_sub", "_other").alias("_tj"),
                "_sub",
                id_col,
                vec_col,
            )
        )

        def _pairs(A: "pd.DataFrame", B: "pd.DataFrame") -> "pd.DataFrame":
            """Cross-sub-bucket pairs (exact same per-pair dot as the
            single-matrix path)."""
            ids_a = A[id_col].to_numpy()
            ids_b = B[id_col].to_numpy()
            VA = np.stack(A[vec_col].to_numpy()).astype(np.float64)
            VB = np.stack(B[vec_col].to_numpy()).astype(np.float64)
            na = np.sqrt((VA * VA).sum(axis=1))
            nb = np.sqrt((VB * VB).sum(axis=1))
            gram = VA @ VB.T
            denom = np.outer(na, nb)
            with np.errstate(divide="ignore", invalid="ignore"):
                sim = np.where(denom > 0, gram / denom, 0.0)
            ia, ib = np.where(sim > threshold)
            lo = np.minimum(ids_a[ia], ids_b[ib])
            hi = np.maximum(ids_a[ia], ids_b[ib])
            return pd.DataFrame({"id_a": lo, "id_b": hi, "sim": sim[ia, ib]})

        def block_pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
            empty = pd.DataFrame(
                {"id_a": pdf[id_col].iloc[:0], "id_b": pdf[id_col].iloc[:0], "sim": []}
            )
            ti = int(pdf["_ti"].iloc[0])
            tj = int(pdf["_tj"].iloc[0])
            if ti == tj:
                sub = pdf[pdf["_sub"] == ti].sort_values(id_col)
                ids = sub[id_col].to_numpy()
                if len(ids) < 2:
                    return empty
                V = np.stack(sub[vec_col].to_numpy()).astype(np.float64)
                norms = np.sqrt((V * V).sum(axis=1))
                gram = V @ V.T
                denom = np.outer(norms, norms)
                with np.errstate(divide="ignore", invalid="ignore"):
                    sim = np.where(denom > 0, gram / denom, 0.0)
                ia, ib = np.triu_indices(len(ids), k=1)
                keep = sim[ia, ib] > threshold
                return pd.DataFrame(
                    {
                        "id_a": ids[ia][keep],
                        "id_b": ids[ib][keep],
                        "sim": sim[ia, ib][keep],
                    }
                )
            A = pdf[pdf["_sub"] == ti].sort_values(id_col)
            B = pdf[pdf["_sub"] == tj].sort_values(id_col)
            if len(A) == 0 or len(B) == 0:
                return empty
            return _pairs(A, B)

        return tasks.groupBy("_blk", "_ti", "_tj").applyInPandas(
            block_pairs, out_schema
        )

    base = embeddings.select(
        *([F.col(block_col)] if block_col else []),
        F.col(id_col),
        F.col(vec_col),
        norm(F.col(vec_col)).alias("_n"),
    )
    a = base.select(
        *([F.col(block_col)] if block_col else []),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        F.col("_n").alias("n_a"),
    )
    b = base.select(
        *([F.col(block_col)] if block_col else []),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        F.col("_n").alias("n_b"),
    )
    joined = a.join(b, on=block_col, how="inner") if block_col else a.crossJoin(b)
    sim = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        dot(F.col("vec_a"), F.col("vec_b")) / (F.col("n_a") * F.col("n_b")),
    ).otherwise(F.lit(0.0))
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", sim)
        .filter(F.col("sim") > threshold)
        .select("id_a", "id_b", "sim")
    )


def assign_labels(
    embeddings: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment (squared L2) via an Arrow-batched
    pandas UDF: one numpy matmul per batch against the broadcast
    centroid matrix — the map side of Lloyd's iteration and the
    write-time labeling step of the IVF index."""
    import numpy as np
    import pandas
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)  # (k, dim)
    c_sq = (C * C).sum(axis=1)

    # NB: real (non-string) annotations — the module-wide `from
    # __future__ import annotations` would stringify them and break
    # pandas_udf type-hint inference for locally-imported names.
    def _nearest(vecs):
        V = np.stack(vecs.to_numpy()).astype(np.float64)  # (n, dim)
        # argmin over ||v||^2 - 2 v.C^T + ||c||^2; ||v||^2 constant per row
        d = -2.0 * (V @ C.T) + c_sq
        return pandas.Series(d.argmin(axis=1).astype("int32"))

    _nearest.__annotations__ = {"vecs": pandas.Series, "return": pandas.Series}
    nearest = pandas_udf("int")(_nearest)

    return embeddings.withColumn("label", nearest(F.col(vec_col)))


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 10,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Distributed Lloyd's k-means — the IVF codebook build.

    Deterministic init: the k vectors with the smallest md5-based
    ``hash64(id)`` (uniform pseudo-random but reproducible across runs
    and engines — no RNG).  Each iteration is one distributed job:
    pandas-UDF assignment (numpy matmul) + component-wise mean via the
    posexplode groupBy in ``compute_centroids``; only the (k x dim)
    codebook ever reaches the driver.  Empty clusters keep their
    previous centroid.  At 100 TB: sample the corpus for the fit, then
    one full assignment pass labels the table for partition-by-label
    writes (the IVF scale path in ``ivf_topk``).
    """
    from qurio_spark.functions.hashing import hash64

    seed_rows = (
        embeddings.select(F.col(vec_col), hash64(F.col(id_col).cast("string")).alias("_h"))
        .orderBy("_h")
        .limit(k)
        .collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in seed_rows]
    if not centroids:
        return []  # empty corpus: no codebook (callers guard on [])
    import struct as _struct

    dim = len(centroids[0])
    for _ in range(iters):
        assigned = assign_labels(embeddings, centroids, id_col, vec_col)
        # per-iteration reduction: collect the (label, pos, mean) cells
        # straight off the FIRST groupBy (k x dim rows — the same F.avg
        # values compute_centroids would re-pack into arrays) and
        # assemble the codebook driver-side; the second groupBy shuffle
        # existed only to build array rows this loop immediately
        # unpacked (r15, guide §2.4: one exchange per Lloyd's
        # iteration, not two).  The float32 round-trip below reproduces
        # compute_centroids' `cast("float")` bit-for-bit, so codebooks
        # (and every downstream label/survivor golden) are unchanged.
        rows = (
            assigned.select(
                F.col("label"), F.posexplode(F.col(vec_col)).alias("pos", "v")
            )
            .groupBy("label", "pos")
            .agg(F.avg("v").alias("m"))
            .collect()
        )
        new = list(centroids)  # empty clusters keep previous centroid
        for lb in {r["label"] for r in rows}:
            new[lb] = [0.0] * dim
        for r in rows:
            new[r["label"]][r["pos"]] = _struct.unpack(
                "f", _struct.pack("f", r["m"])
            )[0]
        centroids = new
    return centroids


def semantic_dedup(
    embeddings: DataFrame,
    k: int = 16,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 5,
    max_block: int | None = 4096,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): SEMANTIC
    deduplication for training corpora — k-means cluster the embedding
    space, find cosine near-duplicates only WITHIN clusters, resolve
    the pair graph into duplicate groups, and keep ONE representative
    per group: the member with the LOWEST cosine to its cluster
    centroid (the paper's keep rule — prefer the example farthest
    from the cluster's dense core; ties break on id).  Returns the
    SURVIVOR rows of ``embeddings`` (original columns).

    This is the cluster-scoped sibling of the flat
    :func:`embedding_near_dup_pairs` rung on the dedup ladder: the
    O(n^2) pair problem becomes sum-of-squares over clusters (the
    same blocked gram-matrix kernel, with the oversized-cluster
    hash-split guard), the duplicate graph is tiny relative to the
    corpus, and groups resolve through the same O(log n)
    alternating-star connected components the MinHash ladder uses.
    At 100 TB: fit the codebook on a sample (``kmeans_fit`` collects
    only the k x dim matrix), one labeling pass over the corpus, and
    every pairwise computation stays cluster-bounded.

    Determinism: md5-seeded k-means init and an id tiebreak on the
    keep rule, so reruns keep identical survivors (no RNG anywhere).
    """
    from qurio_spark.operators.dedup import connected_components

    centroids = kmeans_fit(
        embeddings, k=k, iters=iters, id_col=id_col, vec_col=vec_col
    )
    if not centroids:
        return embeddings  # empty corpus dedups to empty, not a crash
    labeled, cdf = _label_with(embeddings, centroids, id_col, vec_col)
    pairs = embedding_near_dup_pairs(
        labeled,
        threshold=threshold,
        block_col="label",
        id_col=id_col,
        vec_col=vec_col,
        max_block=max_block,
    )
    # r16 (guide §1.2 — don't compute what you throw away): every id
    # OUTSIDE the pair graph survives by definition (its component is
    # itself, and the per-cluster argmin of a singleton is the id), so
    # components, csim scoring and the keep rule only need the ids
    # that appear in SOME pair.  ``nodes=None`` asks CC for exactly
    # those labels (no singleton pass, no vertex-set scan), csim is
    # evaluated after the comps join so only pair-touched rows pay the
    # cosine, and the final pass subtracts the per-cluster LOSERS from
    # the corpus — one anti-join instead of re-scoring every row.
    # Survivor set is identical: all ids − (pair ids − per-cluster
    # argmin); the survivor goldens at 3 SFs pin it.
    comps = connected_components(pairs, None, id_col=id_col)
    scored = (
        labeled.join(F.broadcast(cdf), "label")
        .join(comps, id_col)
        .select(
            id_col,
            "cluster_id",
            cosine(F.col(vec_col), F.col("centroid")).alias("__csim"),
        )
    )
    # argmin per near-dup group as a min_by AGGREGATION (r14): the keep
    # rule is unchanged (lowest centroid cosine, id tie-break — the
    # struct ordering key), but partial aggregation collapses a giant
    # cluster inside each map partition instead of funneling its rows
    # through one window reducer; deterministic because ids are unique
    keep = scored.groupBy("cluster_id").agg(
        F.min_by(
            F.col(id_col), F.struct(F.col("__csim"), F.col(id_col))
        ).alias(id_col)
    ).select(id_col)
    losers = comps.select(id_col).join(keep, id_col, "left_anti")
    return embeddings.join(losers, id_col, "left_anti")


def ivf_build(
    embeddings: DataFrame,
    k: int = 10,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_sample_mod: int | None = None,
):
    """Fit the codebook and label the corpus.  Returns (labeled_df,
    centroids_df) — write ``labeled_df`` partitioned by ``label`` and
    probe with ``ivf_topk(..., centroids=centroids_df)``.

    ``fit_sample_mod=m`` fits the codebook on the deterministic 1/m
    hash-sample of the corpus (``hash64(id) % m == 0``) — the 100 TB
    shape: Lloyd's iterations touch only the sample, then ONE full
    assignment pass labels everything.  Labels stay deterministic
    because both the sample and the seeding are md5-derived."""
    from qurio_spark.functions.hashing import hash64

    fit_on = embeddings
    if fit_sample_mod is not None and fit_sample_mod > 1:
        fit_on = embeddings.filter(
            F.pmod(hash64(F.col(id_col).cast("string")), F.lit(fit_sample_mod)) == 0
        )
    centroids = kmeans_fit(fit_on, k, iters, id_col, vec_col)
    return _label_with(embeddings, centroids, id_col, vec_col)


def _label_with(embeddings, centroids, id_col, vec_col):
    from qurio_spark.functions.frames import local_frame

    labeled = assign_labels(embeddings, centroids, id_col, vec_col)
    cdf = local_frame(
        embeddings.sparkSession,
        [(i, c) for i, c in enumerate(centroids)],
        "label int, centroid array<float>",
    )
    return labeled, cdf


def write_ivf_index(labeled: DataFrame, centroids: DataFrame, path: str) -> None:
    """Persist the IVF index — 'build once per corpus version'.  The
    labeled corpus is written PARTITIONED BY label, so a probe's
    ``label IN (...)`` (or a probe-table broadcast join after a label
    filter) prunes to nprobe directories instead of scanning the
    corpus; the codebook is a k-row table alongside."""
    labeled.write.mode("overwrite").partitionBy("label").parquet(f"{path}/labeled")
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")


def read_ivf_index(spark, path: str):
    """-> (labeled_df, centroids_df) as persisted by write_ivf_index."""
    return (
        spark.read.parquet(f"{path}/labeled"),
        spark.read.parquet(f"{path}/centroids"),
    )


def append_ivf_index(
    spark,
    path: str,
    new_embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental IVF maintenance (the vector twin of the segmented
    BM25 append): label the new batch with the PERSISTED codebook (one
    Arrow-batched assignment pass) and append into the existing label
    partition directories — no refit, no rewrite of old files (append
    mode adds files inside ``label=`` dirs; existing files untouched,
    mtime-asserted in tests).  Probes see old + new vectors in the
    same pruned directories immediately.

    The codebook ages as the distribution drifts — gate refits with
    :func:`ivf_assignment_drift` rather than refitting per batch."""
    _, cdf = read_ivf_index(spark, path)
    rows = sorted(cdf.collect(), key=lambda r: r["label"])
    centroids = [[float(x) for x in r["centroid"]] for r in rows]
    labeled = assign_labels(
        new_embeddings.select(id_col, vec_col), centroids, id_col, vec_col
    )
    labeled.write.mode("append").partitionBy("label").parquet(f"{path}/labeled")


def ivf_assignment_drift(
    embeddings: DataFrame,
    centroids: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Refit signal for the incremental path: per-label count and mean
    squared distance of ``embeddings`` to their NEAREST persisted
    centroid.  A new batch whose mean distance is far above the
    fit-time corpus's says the codebook no longer fits the
    distribution (time to refit + rewrite — offline, like BM25
    compaction).  One map pass + a k-row aggregate."""
    import numpy as np
    import pandas
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    c_sq = (C * C).sum(axis=1)

    def _mind2(vecs):
        V = np.stack(vecs.to_numpy()).astype(np.float64)
        d = (V * V).sum(axis=1)[:, None] - 2.0 * (V @ C.T) + c_sq
        return pandas.Series(d.min(axis=1))

    _mind2.__annotations__ = {"vecs": pandas.Series, "return": pandas.Series}
    mind2 = pandas_udf("double")(_mind2)

    labeled = assign_labels(embeddings, centroids, id_col, vec_col)
    return (
        labeled.withColumn("_d2", mind2(F.col(vec_col)))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.avg("_d2").alias("mean_sq_dist"),
        )
    )


def append_lsh_index(
    spark,
    path: str,
    new_embeddings: DataFrame,
    vec_col: str = "embedding",
) -> None:
    """Incremental LSH maintenance: bucket the new batch with the
    PERSISTED plane parameters (md5-derived planes are pure functions
    of (seed, n_planes, dim), so old and new rows hash identically by
    construction — there is no drift concept here, unlike IVF) and
    append inside the existing ``bucket=`` partition directories.
    Old files untouched; probes see old + new immediately."""
    m = spark.read.parquet(f"{path}/meta").collect()[0]
    planes = random_hyperplanes(int(m["dim"]), int(m["n_planes"]), int(m["seed"]))
    bucketed = new_embeddings.withColumn(
        "bucket", lsh_bucket_expr(F.col(vec_col), planes)
    )
    bucketed.write.mode("append").partitionBy("bucket").parquet(
        f"{path}/bucketed"
    )
