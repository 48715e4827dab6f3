"""Product quantization (PQ) for compressed ANN — the memory/IO scale
path next to IVF (`similarity.py`).

A 100 TB embedding corpus is mostly vector bytes: 1B x 64-dim float32
is 256 GB of raw vectors, but PQ codes at m=16 subspaces x k=16
centroids are 16 4-bit codes — with ``packed=True`` one 64-bit long
per vector, a ~32x scan-size cut vs the raw floats (``packed=False``
keeps the debuggable ``array<int>`` form).  Search never touches raw
vectors: the query builds an m x k lookup table of partial dot
products (driver-side, tiny), and each row's approximate score is m
array lookups + adds — pure column expressions inside codegen (bit
shift/mask extracts for the packed form), no Python in the scan.

Honesty note on packing: parquet's dictionary/RLE encoding already
bit-packs 0..15 ints to ~4 bits, so ON DISK the packed long and the
array<int> forms are nearly the same size (pinned in
tests/test_pq.py); the packed form's wins are the decoded columnar
width (8 B/row vs 16 unpacked 4-byte ints + offsets), no
per-element array traversal in the ADC expression, and a fixed-width
column.  The headline disk cut is vs the RAW VECTORS the codes
replace as the scan surface: measured ~46x on the test corpus.

Decomposition is exact for inner product: dot(q, dequant(codes)) =
sum_j dot(q_j, C_j[codes_j]) — the classic ADC (asymmetric distance
computation) of Jegou et al., "Product Quantization for Nearest
Neighbor Search" (TPAMI 2011).

Determinism: codebooks are fit with numpy Lloyd's on a bounded
hash-ordered sample (the same md5-`hash64` device as `kmeans_fit` /
`ivf_build`) — no RNG, reproducible across runs and cluster sizes.
At 100 TB the fit sample stays O(sample_n x dim) on the driver while
encoding is one distributed map pass; this mirrors how FAISS trains
PQ on a sample then encodes the corpus.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from qurio_spark.functions.hashing import hash64


def shortlist_for(n_candidates: int, frac: float = 0.2, min_n: int = 100) -> int:
    """ADC shortlist depth for a candidate set of ``n_candidates``.

    A constant shortlist is a recall cliff: at fixed quantization
    distortion (fixed m, k) the number of vectors whose ADC score is
    confusable with the true top-k grows with the corpus, so the depth
    must scale WITH the candidate count, not sit at a constant.  A
    constant FRACTION keeps recall stable as n grows (measured on the
    test corpus: the minimal depth for recall@10 = 1.0 was 89/500 =
    17.8% at n=500 and 252/2000 = 12.6% at n=2000 — the needed
    fraction shrinks slowly, so frac=0.2 holds with margin at every
    scale factor; gated at the bench SF by the ``ann_pq_recall``
    extra).  ``min_n`` floors tiny candidate sets where the fraction
    would undercut the refine stage's working margin.

    The fraction is the recall/cost dial; if 20% refine traffic is too
    much at the target scale, the right move is a finer quantizer
    (larger m) or coarse pruning first (IVF x PQ, ``ivfpq_topk``) —
    not a deeper constant."""
    import math

    return max(min_n, int(math.ceil(frac * n_candidates)))


def _code_expr(codes_col, j: int, k: int, packed: bool):
    """Subspace-j code as an int column from either representation."""
    if packed:
        return (
            F.shiftrightunsigned(codes_col.cast("long"), 4 * j)
            .bitwiseAND(F.lit(15))
            .cast("int")
        )
    return F.element_at(codes_col, j + 1)


def pq_pack_expr(codes_col, m: int):
    """``array<int>`` codes -> one packed 64-bit long (code_j in bits
    [4j, 4j+4)).  Requires k <= 16 and m <= 16; fields don't overlap so
    a sum is a bitwise-or.  Pure column expression — packing happens
    inside the encode projection, never a second pass."""
    if m > 16:
        raise ValueError(f"packed codes need m <= 16, got {m}")
    packed = F.lit(0).cast("long")
    for j in range(m):
        packed = packed + F.shiftleft(
            F.element_at(codes_col, j + 1).cast("long"), 4 * j
        )
    return packed


def pq_unpack_expr(packed_col, m: int):
    """Packed long -> ``array<int>`` codes (round-trip/debug surface)."""
    return F.array(*[_code_expr(packed_col, j, 0, True) for j in range(m)])


def pq_fit(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 2048,
) -> list:
    """Fit per-subspace codebooks -> nested list (m, k, dim//m).

    The fit runs driver-side numpy Lloyd's over a deterministic
    hash-ordered sample of ``sample_n`` vectors (seeded by the first
    ``k`` sample rows; empty clusters keep their previous centroid) —
    the corpus itself is only ever touched by the distributed encode
    pass (:func:`pq_encode`)."""
    rows = (
        embeddings.select(
            F.col(vec_col), hash64(F.col(id_col).cast("string")).alias("_h")
        )
        .orderBy("_h")
        .limit(sample_n)
        .collect()
    )
    X = np.asarray([list(r[vec_col]) for r in rows], dtype=np.float64)
    n, dim = X.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    ds = dim // m
    codebooks = []
    for j in range(m):
        Xj = X[:, j * ds : (j + 1) * ds]
        C = Xj[: min(k, n)].copy()
        if C.shape[0] < k:  # degenerate tiny corpus: pad by repetition
            C = np.vstack([C] * (k // C.shape[0] + 1))[:k]
        for _ in range(iters):
            d2 = ((Xj[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for c in range(k):
                mask = a == c
                if mask.any():
                    C[c] = Xj[mask].mean(axis=0)
        codebooks.append(C.tolist())
    return codebooks


def pq_encode(
    embeddings: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: list[str] | None = None,
    packed: bool = False,
) -> DataFrame:
    """Distributed encode: each vector -> ``codes`` (nearest centroid
    per subspace; Arrow-batched numpy argmin against the broadcast
    codebook tensor).  One map pass, no shuffle — the output table is
    the compact search surface.  ``packed=True`` emits one 64-bit long
    (4 bits per code, requires m <= 16 and k <= 16) instead of
    ``array<int>`` — ~32x smaller than the raw vectors on disk."""
    import pandas

    CB = np.asarray(codebooks, dtype=np.float64)  # (m, k, ds)
    m, k, ds = CB.shape
    if packed and k > 16:
        raise ValueError(f"packed codes need k <= 16, got {k}")
    cb_sq = (CB * CB).sum(axis=2)  # (m, k)

    def _encode(vecs):
        V = np.stack(vecs.to_numpy()).astype(np.float64)  # (n, m*ds)
        n = V.shape[0]
        codes = np.empty((n, m), dtype=np.int32)
        for j in range(m):
            Vj = V[:, j * ds : (j + 1) * ds]
            d = -2.0 * (Vj @ CB[j].T) + cb_sq[j]
            codes[:, j] = d.argmin(axis=1)
        return pandas.Series(list(codes))

    _encode.__annotations__ = {"vecs": pandas.Series, "return": pandas.Series}
    encode = F.pandas_udf("array<int>")(_encode)
    cols = [F.col(id_col)] + [F.col(c) for c in (keep_cols or [])]
    out = embeddings.select(*cols, encode(F.col(vec_col)).alias("codes"))
    if packed:
        out = out.withColumn("codes", pq_pack_expr(F.col("codes"), m))
    return out


def _codes_packed(codes_df: DataFrame) -> bool:
    """True when the ``codes`` column is the packed-long representation
    (the dtype IS the format marker — survives parquet round-trips)."""
    return not codes_df.schema["codes"].dataType.typeName().startswith("array")


def pq_adc_score(codebooks: list, query_vec: list[float], packed: bool = False):
    """ADC score as a pure column expression over a ``codes`` column:
    the driver computes the m x k partial-dot lookup table once, then
    score = sum_j LUT[j, codes_j] via array element_at inside codegen —
    zero Python in the distributed scan.  For packed codes each
    codes_j is a shift+mask extract of the 64-bit word (still pure
    codegen; m fixed terms, fully unrolled)."""
    CB = np.asarray(codebooks, dtype=np.float64)  # (m, k, ds)
    m, k, ds = CB.shape
    q = np.asarray(query_vec, dtype=np.float64)
    if q.size != m * ds:
        raise ValueError(f"query dim {q.size} != {m * ds}")
    lut = np.einsum("jkd,jd->jk", CB, q.reshape(m, ds)).ravel()  # (m*k,)
    lut_col = F.array(*[F.lit(float(v)) for v in lut])
    score = F.lit(0.0)
    for j in range(m):
        c = _code_expr(F.col("codes"), j, k, packed)
        score = score + F.element_at(lut_col, c + F.lit(j * k + 1))
    return score


def pq_topk(
    codes_df: DataFrame,
    codebooks: list,
    query_vec: list[float],
    topk: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate inner-product top-k over PQ codes -> (id, score)
    ordered.  Plan shape: map-only scan of the codes table +
    TakeOrderedAndProject — same as ``brute_force_topk`` but reading
    ~32x fewer bytes and doing m adds per row instead of dim FMAs.
    Accepts either codes representation (dtype-detected)."""
    from qurio_spark.functions.numeric import stable_round

    score = pq_adc_score(codebooks, query_vec, packed=_codes_packed(codes_df))
    return (
        codes_df.select(F.col(id_col), score.alias("score"))
        .orderBy(F.desc(stable_round(F.col("score"), 6)), F.asc(id_col))
        .limit(topk)
    )


def pq_topk_refined(
    codes_df: DataFrame,
    embeddings: DataFrame,
    codebooks: list,
    query_vec: list[float],
    topk: int = 10,
    shortlist: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_candidates: int | None = None,
) -> DataFrame:
    """Two-stage retrieve+refine (the production PQ pipeline): ADC over
    the compressed codes picks a shortlist of candidates, then ONLY
    those rows' raw vectors are fetched and exactly re-scored (dot).

    ``shortlist=None`` (default) sizes the shortlist ADAPTIVELY as a
    fraction of the candidate-set size (:func:`shortlist_for`) — a
    constant depth is a recall cliff one scale factor up (measured:
    recall@10 dropped 1.0 -> 0.8 from n=500 to n=2000 at a fixed 100).
    Pass ``n_candidates`` when the caller already knows the corpus
    count (e.g. from the source table's parquet stats) to avoid the
    count job over the codes lineage.

    Scale shape: stage 1 scans codes (~32x fewer bytes than vectors,
    map-only + TakeOrdered); stage 2 is a broadcast semi-join of the
    shortlist id set against the vector table — the corpus's raw
    vectors are read only where the join pushes the id filter, never
    scanned for scoring.  Final quality is exact-top-k restricted to
    the shortlist; recall 1.0 is gated at the bench SF by the
    ``ann_pq_recall`` extra and pinned in tests/test_pq.py."""
    from qurio_spark.functions.numeric import stable_round
    from qurio_spark.functions.vector import dot, literal_vector

    if shortlist is None:
        n = n_candidates if n_candidates is not None else codes_df.count()
        shortlist = shortlist_for(n)
    cand = pq_topk(codes_df, codebooks, query_vec, shortlist, id_col)
    ids = F.broadcast(cand.select(id_col))
    refined = embeddings.join(ids, id_col)
    score = dot(F.col(vec_col), literal_vector(query_vec))
    return (
        refined.select(F.col(id_col), score.alias("score"))
        .orderBy(F.desc(stable_round(F.col("score"), 6)), F.asc(id_col))
        .limit(topk)
    )


def write_pq_index(
    codes_df: DataFrame, codebooks: list, path: str
) -> None:
    """Persist codes + codebooks — 'encode once per corpus version'.
    The codebook table is (subspace, code, centroid) rows, m*k of
    them; the codes table is the compact scan surface."""
    spark = codes_df.sparkSession
    codes_df.write.mode("overwrite").parquet(f"{path}/codes")
    rows = [
        (j, c, [float(x) for x in cent])
        for j, book in enumerate(codebooks)
        for c, cent in enumerate(book)
    ]
    spark.createDataFrame(
        rows, "subspace int, code int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")


def read_pq_index(spark, path: str):
    """-> (codes_df, codebooks nested list) as written above."""
    codes = spark.read.parquet(f"{path}/codes")
    rows = spark.read.parquet(f"{path}/codebooks").collect()
    m = max(r["subspace"] for r in rows) + 1
    k = max(r["code"] for r in rows) + 1
    books: list = [[None] * k for _ in range(m)]
    for r in rows:
        books[r["subspace"]][r["code"]] = [float(x) for x in r["centroid"]]
    return codes, books


def append_pq_index(
    spark,
    path: str,
    new_embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: list[str] | None = None,
) -> None:
    """Incremental PQ maintenance: encode the new batch with the
    PERSISTED codebooks (one Arrow-batched map pass) and append to the
    codes table, in the SAME representation the index already uses
    (packed-long or array<int>, dtype-detected).  Old files untouched.
    Like IVF, the codebooks age under distribution drift —
    :func:`pq_quantization_error` of new batches (vs the fit-time
    corpus) is the refit signal (consumed by
    ``plans.maintenance.maybe_refit_pq``); unlike IVF there is no
    partition layout to preserve, so a refit is a plain re-encode."""
    existing, books = read_pq_index(spark, path)
    codes = pq_encode(
        new_embeddings, books, id_col, vec_col, keep_cols,
        packed=_codes_packed(existing),
    )
    codes.write.mode("append").parquet(f"{path}/codes")


def pq_quantization_error(
    embeddings: DataFrame,
    codebooks: list,
    vec_col: str = "embedding",
) -> DataFrame:
    """Refit signal for the incremental path (the PQ twin of
    ``similarity.ivf_assignment_drift``): 1-row frame of (n,
    mean_sq_err, max_sq_err) — the squared reconstruction error of
    each vector against its NEAREST per-subspace centroids.  A new
    batch whose mean error is far above the fit-time corpus's says the
    codebooks no longer fit the distribution (ADC scores degrade ->
    shortlist recall degrades) — time for an offline re-encode.  One
    Arrow-batched map pass + a 1-row aggregate."""
    import pandas

    CB = np.asarray(codebooks, dtype=np.float64)  # (m, k, ds)
    m, k, ds = CB.shape
    cb_sq = (CB * CB).sum(axis=2)

    def _sqerr(vecs):
        V = np.stack(vecs.to_numpy()).astype(np.float64)
        err = np.zeros(V.shape[0])
        for j in range(m):
            Vj = V[:, j * ds : (j + 1) * ds]
            d = (Vj * Vj).sum(axis=1)[:, None] - 2.0 * (Vj @ CB[j].T) + cb_sq[j]
            err += d.min(axis=1)
        return pandas.Series(err)

    _sqerr.__annotations__ = {"vecs": pandas.Series, "return": pandas.Series}
    sqerr = F.pandas_udf("double")(_sqerr)
    return embeddings.select(sqerr(F.col(vec_col)).alias("_e")).agg(
        F.count("*").alias("n"),
        F.avg("_e").alias("mean_sq_err"),
        F.max("_e").alias("max_sq_err"),
    )


# ---------------------------------------------------------------------------
# IVF x PQ (IVF-ADC): coarse partition pruning x compressed scan — the
# two ANN axes composed, which is the actual 100 TB serving plan
# (FAISS's IndexIVFPQ shape): probe prunes to nprobe label directories,
# the ADC scan reads only those partitions' packed codes, and the exact
# refine touches raw vectors for the shortlist alone.
# ---------------------------------------------------------------------------


def write_ivfpq_index(
    embeddings: DataFrame,
    codebooks: list,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    packed: bool = True,
) -> None:
    """Persist the composed index: packed PQ codes written PARTITIONED
    BY the coarse IVF label (``embeddings`` must already carry
    ``label_col`` — from the table's own assignment or
    ``similarity.assign_labels``), plus the fine codebooks.  A probe's
    ``label IN (...)`` literal prunes to nprobe directories of
    ~32x-compressed codes — both axes multiply."""
    codes = pq_encode(
        embeddings, codebooks, id_col, vec_col, keep_cols=[label_col],
        packed=packed,
    )
    codes.write.mode("overwrite").partitionBy(label_col).parquet(f"{path}/codes")
    spark = embeddings.sparkSession
    rows = [
        (j, c, [float(x) for x in cent])
        for j, book in enumerate(codebooks)
        for c, cent in enumerate(book)
    ]
    spark.createDataFrame(
        rows, "subspace int, code int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")


def ivfpq_topk(
    codes_df: DataFrame,
    embeddings: DataFrame,
    codebooks: list,
    query_vec: list[float],
    probe_labels: list[int],
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    shortlist: int | None = None,
    n_candidates: int | None = None,
) -> DataFrame:
    """IVF-ADC probe: restrict BOTH stages to ``probe_labels`` — the
    ADC scan reads only the probed label partitions of the codes table
    (literal IN -> PartitionFilters on a label-partitioned index), and
    the exact refine's raw-vector fetch carries the same label filter
    so an embeddings table laid out by label prunes identically.

    The shortlist is sized adaptively against the PROBED candidate
    count (``shortlist_for(n, frac=0.3, min_n=50)`` — within a
    partition the fraction runs higher than the global scan's 0.2
    because the exact top-k is a larger share of a pruned set; recall
    1.0 verified at every test SF and gated at the bench SF by the
    ``ann_ivfpq_recall`` extra)."""
    from qurio_spark.functions.numeric import stable_round
    from qurio_spark.functions.vector import dot, literal_vector

    pruned = codes_df.filter(F.col(label_col).isin(probe_labels))
    if shortlist is None:
        n = n_candidates if n_candidates is not None else pruned.count()
        shortlist = shortlist_for(n, frac=0.3, min_n=50)
    cand = pq_topk(pruned, codebooks, query_vec, shortlist, id_col)
    ids = F.broadcast(cand.select(id_col))
    refined = embeddings.filter(F.col(label_col).isin(probe_labels)).join(
        ids, id_col
    )
    score = dot(F.col(vec_col), literal_vector(query_vec))
    return (
        refined.select(F.col(id_col), score.alias("score"))
        .orderBy(F.desc(stable_round(F.col("score"), 6)), F.asc(id_col))
        .limit(topk)
    )
