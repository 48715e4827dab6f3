#!/usr/bin/env python
"""Scale-validate the degree-ordered-orientation triangle census
(operators/graph.triangle_count) with PLANTED ground truth a decade-
plus above the oracle SF: the claim is "wedges enumerated only at the
lowest-(degree, id) apex — hub vertices cannot explode the join", so
the test graph gets both an EXACT known census and an adversarial
HUB.

Construction (n gadgets, deterministic, no RNG):
  - n disjoint triangles (vertices 3i, 3i+1, 3i+2)  -> exactly n
    triangles, 3n wedge-paths inside gadgets;
  - a chain over the triangle corners (3i -> 3(i+1))  -> 0 new
    triangles (chain edges connect DIFFERENT gadgets);
  - one HUB vertex h connected to every chain corner -> 0 new
    triangles from hub-corner-corner unless two connected corners
    share the hub: corners 3i, 3(i+1) are chain-adjacent AND both
    hub-adjacent -> that IS a triangle per chain edge: n-1 more.
  Total expected: n + (n - 1) triangles exactly.

The hub has degree n — a naive wedge join would enumerate C(n, 2)
wedges at the hub (5e9 at n=100k); orientation points every
hub-adjacent edge TOWARD the hub (highest degree), so the hub is
never an apex and contributes ZERO wedge-join rows.  Finishing in
seconds IS the structural claim.

Usage:  python tools/triangle_scale_check.py [n_triangles]

Prints one JSON line; committed evidence lives in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    from pyspark.sql import functions as F

    from qurio_spark.operators.graph import triangle_count
    from qurio_spark.session import get_spark

    spark = get_spark(app_name="triangle-scale-check")
    hub = 3 * n + 7  # beyond every gadget vertex id

    t0 = time.time()
    g = spark.range(n)
    tri_edges = g.selectExpr(
        "stack(3, 3*id, 3*id+1, 3*id+1, 3*id+2, 3*id, 3*id+2) AS (src, dst)"
    )
    chain = g.filter(F.col("id") < n - 1).select(
        (3 * F.col("id")).alias("src"), (3 * (F.col("id") + 1)).alias("dst")
    )
    hub_edges = g.select(
        (3 * F.col("id")).alias("src"), F.lit(hub).alias("dst")
    )
    edges = tri_edges.unionByName(chain).unionByName(hub_edges).persist()
    n_in = edges.count()
    gen_s = time.time() - t0

    t0 = time.time()
    r = triangle_count(edges).collect()[0]
    census_s = time.time() - t0

    expected = n + (n - 1)
    print(
        json.dumps(
            {
                "metric": "triangle_scale_check",
                "ok": bool(r["n_triangles"] == expected),
                "n_gadgets": n,
                "hub_degree": n,
                "input_edges": n_in,
                "n_nodes": r["n_nodes"],
                "n_edges": r["n_edges"],
                "n_wedges": r["n_wedges"],
                "n_triangles": r["n_triangles"],
                "expected_triangles": expected,
                "naive_hub_wedges": n * (n - 1) // 2,
                "gen_s": round(gen_s, 2),
                "census_s": round(census_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
