"""Validate the c*sqrt(n) PQ shortlist law one decade above the test
SFs: build a deterministic synthetic corpus of >= 200k vectors, fit +
encode with the committed pq_fit/pq_encode (m=16, k=256 — the shipped
ann_pq config), and measure the MINIMAL ADC depth at which
worst-case-over-Q-queries recall@10 == 1.0, vs the sized
``shortlist_for(n)``.

Usage:  python tools/pq_scale_check.py [n] [n_queries]

Prints one JSON line: measured minimal depth, sized depth, margin.
The committed evidence lives in SCALE.md; tests/test_pq.py pins the
same law at the real SFs (33@500, 65@2000, ~110@8000-augmented).

Corpus: a seeded Gaussian mixture (512 centers, 64 dims — the
embeddings table's dim) with enough cluster overlap that ADC
confusion is non-trivial; queries are corpus members, the adversarial
case (their exact top-10 are intra-cluster near-ties)."""

from __future__ import annotations

import json
import sys

import numpy as np


def build_corpus(n: int, dim: int = 64, centers: int = 512, seed: int = 7):
    rng = np.random.default_rng(seed)
    C = rng.normal(0.0, 1.0, size=(centers, dim))
    assign = rng.integers(0, centers, size=n)
    # sigma 0.35 ~ cluster radius / center spacing that keeps top-10
    # neighbors mostly intra-cluster but ADC-confusable
    X = C[assign] + rng.normal(0.0, 0.35, size=(n, dim))
    return X


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from pyspark.sql import SparkSession

    from qurio_spark.operators.pq import pq_encode, pq_fit, shortlist_for

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    X = build_corpus(n)
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    ).repartition(32)
    books = pq_fit(df, m=16, k=256, iters=10)
    codes_rows = pq_encode(df, books).collect()
    by_id = {r["vec_id"]: r["codes"] for r in codes_rows}
    C = np.stack([by_id[i] for i in range(n)])
    CB = np.asarray(books)
    m, k, ds = CB.shape

    worst = 0
    per_q = []
    for qi in range(n_queries):
        q = X[qi * (n // n_queries)]
        exact = set(np.argsort(-(X @ q), kind="stable")[:10])
        lut = np.einsum("jkd,jd->jk", CB, q.reshape(m, ds))
        s = lut[np.arange(m)[None, :], C].sum(axis=1)
        pos = {v: i for i, v in enumerate(np.argsort(-s, kind="stable"))}
        need = max(pos[x] for x in exact) + 1
        per_q.append(need)
        worst = max(worst, need)

    sized = shortlist_for(n)
    print(json.dumps({
        "n": n,
        "n_queries": n_queries,
        "measured_min_depth": worst,
        "median_depth": int(np.median(per_q)),
        "sized_shortlist": sized,
        "margin": round(sized / worst, 2),
        "margin_ok": worst * 3 <= sized,
    }))


if __name__ == "__main__":
    main()
