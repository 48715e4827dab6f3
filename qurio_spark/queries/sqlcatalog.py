"""The full SQL-callable operator catalog (qurio_spark.sqlfront).

``register_search_sql`` (queries/search.py, r15) exposed hybrid/BM25
search to SQL text; this module widens the surface to the rest of the
engine's non-SQL-native operators, so a SQL-only user can compose
searches, near-dup analysis, curation, shard packing and data-quality
profiling inside ordinary queries:

    fns = register_engine_sql(spark, sf_dir)
    fns.sql('''
        SELECT c.source, count(*) AS kept
        FROM curate(budget => 800) c
        JOIN near_dup_pairs(method => 'minhash') p
          ON c.doc_id = p.id_a
        GROUP BY c.source
    ''')

Every function hands Catalyst the operator's own DataFrame plan (the
rewrite is syntactic; the plan is the Python API's — see sqlfront
module doc), so the scale posture of each operator is unchanged and
the existing oracles pin the SQL route wherever a query entry runs
through it.

Reference parity note: the Go backend's query surface is typed RPC
only (apps/backend/internal/handlers/search.go); a SQL catalog is
beyond-parity ergonomics whose scope — literals in, one relation
out — is ours to define.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from qurio_spark.functions.numeric import stable_round
from qurio_spark.queries.common import _t
from qurio_spark.sqlfront import SqlFunctionError, SqlFunctions

#: the tables a SQL-callable profiler may name (the sf_dir corpus);
#: validated so a string literal can never become a filesystem path
_TABLES = frozenset(
    {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
)


def _named_table(spark, sf_dir, table):
    if table not in _TABLES:
        raise SqlFunctionError(
            f"unknown table {table!r} (expected one of {sorted(_TABLES)})"
        )
    return _t(spark, sf_dir, table)


def register_engine_sql(spark, sf_dir) -> SqlFunctions:
    """One registry with the whole catalog bound over ``sf_dir``:

    - ``hybrid_search(query, k => 10, alpha => 0.5)`` and
      ``bm25_search(query, k => 10)`` (from register_search_sql);
    - ``ann_search(vec_id, k => 10)`` — exact cosine top-k around the
      named embedding (the brute-force oracle path; the IVF/PQ serving
      indexes are deployment artifacts, not per-query builds);
    - ``near_dup_pairs(method => 'minhash'|'simhash'|'ngram', ...)`` —
      candidate near-duplicate pairs over ``documents``;
    - ``curate(budget => 800)`` — the dedup -> quality -> per-source
      token-budget pipeline (operators/curate);
    - ``pack_shards(budget => 2000)`` — training-shard assignment via
      the distributed prefix sum (operators/sharding);
    - ``dq_profile(table)`` — a one-scan Deequ-style metric profile of
      any corpus table: completeness for every column, exact distinct
      counts for strings, min/max bounds for numerics.
    """
    from qurio_spark.queries.search import register_search_sql

    fns = register_search_sql(spark, sf_dir)

    def _ann(spark, vec_id, k=10):
        from qurio_spark.operators.similarity import brute_force_topk

        emb = _t(spark, sf_dir, "embeddings")
        row = emb.filter(F.col("vec_id") == int(vec_id)).select("embedding").first()
        if row is None:
            raise SqlFunctionError(f"ann_search: no embedding with vec_id {vec_id}")
        q = [float(x) for x in row["embedding"]]
        top = brute_force_topk(emb, q, k=int(k))
        return top.select("vec_id", stable_round("score", 4).alias("score"))

    def _near_dup(spark, method="minhash", threshold=0.5, max_hamming=30):
        from qurio_spark.operators.dedup import (
            minhash_lsh_pairs,
            ngram_jaccard_pairs,
            simhash_near_pairs,
        )

        docs = _t(spark, sf_dir, "documents")
        if method == "minhash":
            return minhash_lsh_pairs(
                docs, num_perm=4, bands=2, threshold=float(threshold)
            )
        if method == "simhash":
            return simhash_near_pairs(docs, max_hamming=int(max_hamming))
        if method == "ngram":
            return ngram_jaccard_pairs(docs, threshold=float(threshold))
        raise SqlFunctionError(
            f"near_dup_pairs: unknown method {method!r} "
            "(expected 'minhash', 'simhash' or 'ngram')"
        )

    def _curate(spark, budget=800):
        from qurio_spark.operators.curate import curate_corpus

        return curate_corpus(
            _t(spark, sf_dir, "documents"),
            per_source_token_budget=int(budget),
        )

    def _pack(spark, budget=2000):
        from qurio_spark.operators.sharding import pack_shards

        return pack_shards(_t(spark, sf_dir, "documents"), token_budget=int(budget))

    def _dq(spark, table):
        from pyspark.sql.types import NumericType, StringType

        from qurio_spark.operators.quality import dq_profile

        df = _named_table(spark, sf_dir, table)
        strings = [
            f.name for f in df.schema.fields
            if isinstance(f.dataType, StringType)
        ]
        numerics = [
            f.name for f in df.schema.fields
            if isinstance(f.dataType, NumericType)
        ]
        return dq_profile(
            df,
            completeness=[f.name for f in df.schema.fields],
            distinctness=strings,
            bounds=numerics,
        )

    fns.register("ann_search", _ann)
    fns.register("near_dup_pairs", _near_dup)
    fns.register("curate", _curate)
    fns.register("pack_shards", _pack)
    fns.register("dq_profile", _dq)
    return fns
