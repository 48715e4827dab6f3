"""operators/graph.pagerank: fixed-iteration power method vs a pure-
Python reference, dangling/isolated-vertex semantics, determinism,
and the one-checkpoint-per-build plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qurio_spark.operators.graph import pagerank


def _py_pagerank(edges, vertices, iters=3, d=0.85):
    """Reference implementation: same simplified variant (dangling
    mass dropped, teleport to every vertex)."""
    from collections import defaultdict

    out = defaultdict(list)
    for s, t in edges:
        out[s].append(t)
    n = len(vertices)
    pr = {v: 1.0 / n for v in vertices}
    for _ in range(iters):
        m = defaultdict(float)
        for u, nbrs in out.items():
            c = pr[u] / len(nbrs)
            for v in nbrs:
                m[v] += c
        pr = {v: (1.0 - d) / n + d * m.get(v, 0.0) for v in vertices}
    return pr


@pytest.fixture(scope="module")
def toy(spark):
    # star (1 hub, 3 spokes) + a 2-cycle + an isolated vertex
    edges = [
        (1, 2), (2, 1), (1, 3), (3, 1), (1, 4), (4, 1),
        (5, 6), (6, 5),
    ]
    vertices = list(range(1, 8))  # 7 is isolated
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(x,) for x in vertices], "id long")
    return e, v, edges, vertices


def test_matches_python_reference(spark, toy):
    e, v, edges, vertices = toy
    got = {r["id"]: r["pr"] for r in pagerank(e, v, iters=3).collect()}
    want = _py_pagerank(edges, vertices, iters=3)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12), k
    # the hub out-centralities: 1 most central, spokes equal, isolated
    # vertex at pure teleport mass
    assert got[1] > got[2] == got[3] == got[4] > got[7]
    assert got[7] == pytest.approx(0.15 / 7, rel=1e-12)


def test_dangling_mass_dropped(spark):
    """A vertex with in-edges but NO out-edges absorbs rank and leaks
    it (the documented simplified variant): total mass < 1 after one
    iteration, and the dangling vertex still holds teleport + inflow."""
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    v = spark.createDataFrame([(1,), (2,)], "id long")
    got = {r["id"]: r["pr"] for r in pagerank(e, v, iters=1).collect()}
    n, d = 2, 0.85
    assert got[2] == pytest.approx((1 - d) / n + d * 0.5, rel=1e-12)
    assert got[1] == pytest.approx((1 - d) / n, rel=1e-12)
    assert sum(got.values()) < 1.0


def test_zero_iters_and_empty(spark, toy):
    e, v, *_ = toy
    got = {r["id"]: r["pr"] for r in pagerank(e, v, iters=0).collect()}
    assert all(p == pytest.approx(1.0 / 7) for p in got.values())
    empty_v = v.filter("id < 0")
    assert pagerank(e, empty_v, iters=2).count() == 0


def test_deterministic_across_runs(spark, toy):
    e, v, *_ = toy
    a = sorted(map(tuple, pagerank(e, v, iters=3).collect()))
    b = sorted(map(tuple, pagerank(e, v, iters=3).collect()))
    assert a == b


def test_n_vertices_shortcut_matches_count(spark, toy):
    e, v, *_ = toy
    a = {r["id"]: r["pr"] for r in pagerank(e, v, iters=2).collect()}
    b = {r["id"]: r["pr"] for r in pagerank(e, v, iters=2, n_vertices=7).collect()}
    assert a == b


def test_hot_vertex_star_bounded(spark):
    """Skew shape: a 20k-spoke star — the hub's in-contributions are a
    partial-agg (groupBy dst), never a single-reducer row explosion,
    and the math stays exact (hub rank == the closed form for one
    iteration: (1-d)/n + d * sum(spoke_pr / 1))."""
    n_spokes = 20_000
    e = spark.range(1, n_spokes + 1).selectExpr(
        "id AS src", "CAST(0 AS long) AS dst"
    ).unionByName(
        spark.range(1, n_spokes + 1).selectExpr(
            "CAST(0 AS long) AS src", "id AS dst"
        )
    )
    v = spark.range(0, n_spokes + 1).withColumnRenamed("id", "id")
    got = {r["id"]: r["pr"] for r in pagerank(e, v, iters=1).collect()}
    n = n_spokes + 1
    d = 0.85
    # hub: every spoke has outdeg 1 and pr0 = 1/n
    want_hub = (1 - d) / n + d * (n_spokes * ((1.0 / n) / 1))
    assert got[0] == pytest.approx(want_hub, rel=1e-9)
    # each spoke gets 1/n_spokes of the hub's mass
    want_spoke = (1 - d) / n + d * ((1.0 / n) / n_spokes)
    assert got[1] == pytest.approx(want_spoke, rel=1e-9)


class TestCanonicalPick:
    def test_star_center_beats_min_id(self, spark):
        """The motivating case: a star-shaped duplicate cluster whose
        CENTER (the version every copy drifted from) does NOT hold the
        minimum id — the pr-pick keeps the center, min-id would keep a
        drifted spoke."""
        from qurio_spark.operators.dedup import connected_components
        from qurio_spark.operators.graph import canonical_pick

        # center 7 linked to spokes 1, 2, 3; separate pair (10, 11);
        # singleton 20
        pairs = spark.createDataFrame(
            [(1, 7), (2, 7), (3, 7), (10, 11)], "id_a long, id_b long"
        )
        nodes = spark.createDataFrame(
            [(x,) for x in (1, 2, 3, 7, 10, 11, 20)], "id long"
        )
        edges = pairs.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        ).unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        cc = connected_components(pairs, nodes, id_col="id")
        pr = pagerank(edges, nodes, iters=3, n_vertices=7)
        got = {
            r["cluster_id"]: (r["canonical_id"], r["n_members"])
            for r in canonical_pick(cc, pr, id_col="id").collect()
        }
        # min-id labels the star cluster 1, but the PICK is center 7
        assert got[1] == (7, 4)
        assert got[1][0] != 1  # differs from the min-id rule
        # symmetric 2-cycle: equal pr, tie broken to the LOWER id
        assert got[10] == (10, 2)
        # a singleton is its own canonical
        assert got[20] == (20, 1)

    def test_one_row_per_cluster_covers_all_nodes(self, spark):
        from qurio_spark.operators.dedup import connected_components
        from qurio_spark.operators.graph import canonical_pick

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
        )
        nodes = spark.createDataFrame([(x,) for x in range(1, 8)], "id long")
        edges = pairs.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        ).unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        cc = connected_components(pairs, nodes, id_col="id")
        pr = pagerank(edges, nodes, iters=3, n_vertices=7)
        out = canonical_pick(cc, pr, id_col="id").collect()
        assert len(out) == 4  # {1,2,3}, {5,6}, {4}, {7}
        assert sum(r["n_members"] for r in out) == 7


class TestTriangleCount:
    def _tc(self, spark, edges):
        from qurio_spark.operators.graph import triangle_count

        df = spark.createDataFrame(edges, "src int, dst int")
        return triangle_count(df).collect()[0]

    def test_k4_complete(self, spark):
        import itertools

        r = self._tc(spark, list(itertools.combinations(range(4), 2)))
        assert (r["n_nodes"], r["n_edges"], r["n_wedges"], r["n_triangles"]) == (
            4, 6, 12, 4,
        )
        assert r["global_clustering"] == 1.0

    def test_path_has_no_triangles(self, spark):
        r = self._tc(spark, [(0, 1), (1, 2), (2, 3)])
        assert r["n_triangles"] == 0
        assert r["n_wedges"] == 2
        assert r["global_clustering"] == 0.0

    def test_dups_selfloops_and_orientation_tolerated(self, spark):
        # triangle given with mixed orientations, a duplicate edge and
        # a self-loop: still exactly one triangle
        r = self._tc(spark, [(0, 1), (2, 1), (0, 2), (1, 0), (2, 2)])
        assert (r["n_edges"], r["n_triangles"]) == (3, 1)

    def test_random_graph_vs_bruteforce(self, spark):
        import itertools
        import random

        rng = random.Random(41)
        edges = {
            (a, b)
            for a in range(25)
            for b in range(a + 1, 25)
            if rng.random() < 0.25
        }
        adj = {i: set() for i in range(25)}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        want = sum(
            1
            for a, b, c in itertools.combinations(range(25), 3)
            if b in adj[a] and c in adj[a] and c in adj[b]
        )
        mixed = [
            (b, a) if rng.random() < 0.5 else (a, b) for a, b in edges
        ]
        r = self._tc(spark, mixed)
        assert r["n_triangles"] == want
        assert r["n_edges"] == len(edges)
