"""Hybrid search — operator Q2 plus its satellites (F1/F2 filters, Q3
parameter resolution, Q6 title backfill).

Semantics (owned by the rebuild; the reference delegated fusion to
Weaviate's relative-score fusion, store.go:107-110 / SURVEY §4):

  1. optional metadata equality filters (F1) pre-score — only string
     equality, matching store.go:133-150;
  2. BM25 score and cosine score computed for every surviving doc
     (missing keyword evidence -> 0);
  3. each score min-max normalized over the candidate set:
     (x - min) / (max - min), constant column -> 0;
  4. fused = alpha * vec_norm + (1 - alpha) * bm25_norm,
     alpha in [0,1]: 0 = pure keyword, 1 = pure vector
     (mcp/handler.go:131-153);
  5. top-k by fused score desc, id asc (deterministic tiebreak).

Scale: the filter runs before any scoring (partition pruning on
source_id-partitioned chunks); both scorers are single-shuffle aggs;
the min/max normalization constants are a 1-row agg broadcast via
crossJoin; top-k is TakeOrderedAndProject.  Nothing here grows with
corpus size except the pruned candidate scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from qurio_spark.functions.numeric import stable_round
from qurio_spark.functions.vector import cosine, literal_vector
from qurio_spark.operators import bm25 as bm25_op
from qurio_spark.schemas import DEFAULT_SETTINGS


def apply_metadata_filters(df: DataFrame, filters: dict[str, str] | None) -> DataFrame:
    """F1: AND of string-equality predicates; non-string values are
    silently dropped, matching store.go:133-150."""
    for k, v in (filters or {}).items():
        if isinstance(v, str):
            df = df.filter(F.col(k) == v)
    return df


def minmax_norm(df: DataFrame, col: str, out: str) -> DataFrame:
    """Min-max normalize ``col`` over the whole frame.  The 1-row
    stats agg joins back via broadcast crossJoin — no window over the
    full data, so no single-partition sort at scale."""
    stats = df.agg(
        F.min(col).alias("_mn"), F.max(col).alias("_mx")
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            out,
            F.when(
                F.col("_mx") > F.col("_mn"),
                (F.col(col) - F.col("_mn")) / (F.col("_mx") - F.col("_mn")),
            ).otherwise(F.lit(0.0)),
        )
        .drop("_mn", "_mx")
    )


def resolve_params(
    alpha: float | None = None,
    limit: int | None = None,
    settings: dict | None = None,
) -> tuple[float, int]:
    """Q3: per-request overrides > settings row > hard fallbacks
    (alpha 0.5 / top_k 10 — retrieval/service.go:71-91).  MCP bounds:
    alpha in [0,1], limit 1..50 (mcp/handler.go:260-268)."""
    s = {**DEFAULT_SETTINGS, **(settings or {})}
    a = float(s["search_alpha"] if alpha is None else alpha)
    k = int(s["search_top_k"] if limit is None else limit)
    if not 0.0 <= a <= 1.0:
        raise ValueError(f"alpha must be in [0,1], got {a}")
    if not 1 <= k <= 50:
        raise ValueError(f"limit must be in 1..50, got {k}")
    return a, k


def hybrid_search(
    docs: DataFrame,
    query_text: str,
    query_vec: list[float],
    alpha: float | None = None,
    limit: int | None = None,
    filters: dict[str, str] | None = None,
    settings: dict | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_col: str = "embedding",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """-> top-k (id, bm25_norm, vec_norm, score [, extra_cols]) rows.

    ``docs`` must carry text + embedding columns (join chunks with their
    vectors upstream if stored separately).
    """
    a, k = resolve_params(alpha, limit, settings)
    cand = apply_metadata_filters(docs, filters)

    kw = bm25_op.score_query_inline(cand, query_text, id_col, text_col)
    scored = (
        cand.join(kw, id_col)
        .withColumn("cos", cosine(F.col(vec_col), literal_vector(query_vec)))
    )
    scored = minmax_norm(scored, "bm25", "bm25_norm")
    scored = minmax_norm(scored, "cos", "vec_norm")
    fused = scored.withColumn(
        "score", F.lit(a) * F.col("vec_norm") + F.lit(1.0 - a) * F.col("bm25_norm")
    )
    cols = [id_col, "bm25_norm", "vec_norm", "score"] + (extra_cols or [])
    # rank on the 6-digit stable-rounded score: BM25 partial-sum order is
    # nondeterministic at 1e-16, so ranking raw doubles would make the
    # top-k set run-dependent at score ties
    return (
        fused.select(*cols)
        .orderBy(F.desc(stable_round(F.col("score"), 6)), F.asc(id_col))
        .limit(k)
    )
