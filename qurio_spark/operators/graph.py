"""Iterative graph analytics over derived document graphs.

The reference has no graph operators (SURVEY §2.7); this is §2.8
extension surface for training-data curation: the near-duplicate pair
graph (operators/dedup.py, operators/similarity.py) is a GRAPH, and
centrality over it answers "which copy is the canonical one?" better
than min-id — the most-connected member of a duplicate cluster is the
version every other copy drifted from.

``pagerank`` is the classic power-method iteration expressed as
DataFrame joins, with a FIXED iteration count so results are
deterministic and SQL-expressible (the DuckDB oracle unrolls the same
iterations as chained CTEs — unlike the converge-until-stable form,
fixed-k is hash-comparable across engines).

Scale shape per iteration: one hash join of the per-vertex rank frame
(narrow: id + double) against the edge table on ``src`` and one
``groupBy(dst)`` partial-agg shuffle — the standard distributed
PageRank plan.  The edge table and out-degrees are computed ONCE and
checkpointed (every iteration reuses them; without the cut each
iteration would re-run the similarity self-join that produced the
edges).  Rank frames stay |V|-sized no matter how wide the graph.

Connected components (the other graph op) lives in
``operators/dedup.connected_components``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from qurio_spark.functions.checkpointing import checkpoint_df


def pagerank(
    edges: DataFrame,
    vertices: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "id",
    n_vertices: int | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank -> (id_col, pr) for every vertex.

    ``edges`` is DIRECTED (pass both directions for an undirected
    graph); ``vertices`` must contain every vertex id exactly once
    (isolated vertices keep the teleport mass).  Dangling vertices (no
    out-edges) contribute nothing — the simplified variant where their
    mass leaves the system; stated explicitly because the SQL oracle
    must mirror the same choice.  pr_0 = 1/N and
    pr_{t+1}(v) = (1-d)/N + d * sum_{u->v} pr_t(u)/outdeg(u).

    ``n_vertices`` skips the count job when the caller already knows
    |V| (e.g. from parquet stats).  The edge/out-degree frames are
    materialized once (checkpoint) so the per-iteration joins never
    re-run the upstream pair generation.
    """
    n = n_vertices if n_vertices is not None else vertices.count()
    if n == 0:
        return vertices.select(F.col(id_col), F.lit(0.0).alias("pr"))
    e = checkpoint_df(
        edges.select(F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")),
        eager=True,
    )
    outdeg = e.groupBy("__src").agg(F.count("*").alias("__deg"))
    # degree rides along with the edge so each iteration is ONE join
    # (rank attach) instead of two
    ed = checkpoint_df(e.join(outdeg, "__src"), eager=True)
    teleport = F.lit((1.0 - damping) / n)
    ranks = vertices.select(F.col(id_col), F.lit(1.0 / n).alias("pr"))
    for _ in range(iters):
        contribs = (
            ed.join(ranks.withColumnRenamed(id_col, "__src"), "__src")
            .select("__dst", (F.col("pr") / F.col("__deg")).alias("__c"))
            .groupBy("__dst")
            .agg(F.sum("__c").alias("__m"))
        )
        ranks = (
            vertices.select(id_col)
            .join(contribs.withColumnRenamed("__dst", id_col), id_col, "left")
            .select(
                F.col(id_col),
                (teleport + F.lit(damping) * F.coalesce("__m", F.lit(0.0))).alias(
                    "pr"
                ),
            )
        )
    return ranks


def canonical_pick(
    clusters: DataFrame,
    ranks: DataFrame,
    id_col: str = "id",
    cluster_col: str = "cluster_id",
    rank_col: str = "pr",
) -> DataFrame:
    """Cluster labels x centrality -> ONE survivor per cluster: the
    member with the highest rank, ties broken to the LOWEST id (the
    min-id rule demoted to tie-breaker).  This is the keep-decision of
    dedup: on a star-shaped duplicate cluster the center — the version
    every copy drifted from — has the highest centrality even when a
    spoke holds the smaller id, so the pr-pick keeps the source where
    min-id would keep a drifted copy (pinned in tests/test_graph.py).

    -> (cluster_col, canonical_id, rank_col, n_members), one row per
    cluster (singletons included — a cluster of one is its own
    canonical).  Scale shape (r14/r15): the argmax goes through
    ``operators/topn.grouped_top_n``, whose plan carries Spark's
    map-side ``WindowGroupLimit(Partial)`` pre-filter — one
    mega-cluster (the boilerplate near-dup shape) sends at most one
    candidate row per map partition to its window reducer, not its
    membership (see operators/topn for why this replaced the r14
    hand-rolled two-phase argmax); member counts come from a
    map-side-partial groupBy, never a whole-cluster window frame.
    Callers should pass PRE-ROUNDED ranks when the pick must be
    reproducible across engines (float summation-order noise
    near-ties otherwise flips the argmax)."""
    joined = clusters.join(ranks, id_col)
    from qurio_spark.operators.topn import grouped_top_n

    counts = joined.groupBy(cluster_col).agg(F.count("*").alias("n_members"))
    picked = grouped_top_n(
        joined,
        [cluster_col],
        [F.desc(rank_col), F.asc(id_col)],
        1,
    ).select(
        F.col(cluster_col),
        F.col(id_col).alias("canonical_id"),
        F.col(rank_col),
    )
    return picked.join(counts, cluster_col).select(
        cluster_col, "canonical_id", rank_col, "n_members"
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Global triangle count + clustering coefficient via
    DEGREE-ORDERED ORIENTATION (the Cohen / "node-iterator++" MapReduce
    scheme, Suri & Vassilvitskii 2011): rank every vertex by
    (degree, id), orient each undirected edge toward the higher rank,
    and enumerate wedges only at their lowest-ranked apex — join
    fan-out per vertex is then bounded by its ORIENTED out-degree
    (<= O(sqrt(m)) on any graph, the arboricity bound), so the
    hub-vertex wedge explosion a naive wedge join suffers never
    happens.  Each triangle is counted exactly once (its
    minimum-ranked vertex owns it).

    Input: undirected edge list (one row per edge, any orientation,
    self-loops/dups tolerated — canonicalized + distinct'ed here).
    Output: one row (n_nodes, n_edges, n_wedges, n_triangles,
    global_clustering) where n_wedges = sum_v C(deg_v, 2) and
    global_clustering = 3 * triangles / wedges (both engines divide
    the same two longs — identical doubles, no rounding).

    Scale shape: degree agg (1 shuffle) + rank attach (2 broadcast-or-
    shuffle joins) + the oriented wedge self-join on the apex + the
    closing-edge semi-join — every join keyed on vertex ids, partial
    aggs absorb skew, no cross join anywhere.
    """
    und = checkpoint_df(
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct(),
        eager=True,
    )  # lineage cut: 6 downstream branches (degrees, orientation,
    # wedge sides, closing set, counts) must not re-derive the edges
    deg = (
        und.select(F.col("u").alias("x"))
        .unionAll(und.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count("*").alias("d"))
    )
    n_nodes = deg.select(F.count("*").alias("n")).withColumnRenamed("n", "n_nodes")
    # Long arithmetic end to end: d*(d-1) is always even, so sum the
    # long products and integer-divide once — a double accumulation
    # (`/ 2` before the sum) is exact only below 2^53 and its final
    # cast truncates rather than rounds.
    wedges = deg.select(
        F.sum(F.col("d") * (F.col("d") - 1)).alias("_s2")
    ).select(F.expr("_s2 DIV 2").alias("n_wedges"))
    # orient toward the higher (degree, id) rank
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    ranked = (
        und.join(deg.withColumnRenamed("x", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("x", "v").withColumnRenamed("d", "dv"), "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
            # rank key (degree) of the head endpoint, for canonical
            # wedge ordering below
            F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("db"),
        )
    )
    ranked = checkpoint_df(ranked, eager=True)  # reused by both wedge
    # sides and the closing set
    # wedge at apex a: (a->b1, a->b2); canonicalize (b1, b2) by the
    # SAME (degree, id) order the orientation used, so the closing
    # edge - if present - is oriented exactly b_lo -> b_hi
    e1 = ranked.select(
        F.col("a"), F.col("b").alias("b1"), F.col("db").alias("db1")
    )
    e2 = ranked.select(
        F.col("a"), F.col("b").alias("b2"), F.col("db").alias("db2")
    )
    wedge = e1.join(e2, "a").filter(
        (F.col("db1") < F.col("db2"))
        | ((F.col("db1") == F.col("db2")) & (F.col("b1") < F.col("b2")))
    )
    closing = ranked.select(
        F.col("a").alias("b1"), F.col("b").alias("b2")
    )
    tri = wedge.join(closing, ["b1", "b2"], "left_semi").select(
        F.count("*").alias("n_triangles")
    )
    n_edges = und.select(F.count("*").alias("n_edges"))
    out = (
        n_nodes.crossJoin(n_edges)
        .crossJoin(wedges)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            (
                F.lit(3).cast("double")
                * F.col("n_triangles").cast("double")
                / F.when(F.col("n_wedges") > 0, F.col("n_wedges").cast("double"))
            ).alias("global_clustering"),
        )
    )
    return out
