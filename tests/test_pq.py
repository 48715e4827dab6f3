"""Product quantization (operators/pq.py): codebook determinism,
encode/index round-trip, ADC correctness against a numpy reference,
and the shortlist-recall pin that justifies ann_pq's exact-dot oracle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from qurio_spark.operators.pq import (
    pq_adc_score,
    pq_encode,
    pq_fit,
    pq_topk,
    pq_topk_refined,
    read_pq_index,
    write_pq_index,
)
from qurio_spark.operators.similarity import brute_force_topk


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def fitted(emb):
    books = pq_fit(emb, m=16, k=16, iters=10)
    codes = pq_encode(emb, books)
    return books, codes


def test_fit_shape_and_determinism(emb):
    b1 = pq_fit(emb, m=8, k=16, iters=3)
    b2 = pq_fit(emb, m=8, k=16, iters=3)
    assert len(b1) == 8 and all(len(book) == 16 for book in b1)
    assert all(len(c) == 8 for book in b1 for c in book)  # 64 dim / 8
    assert b1 == b2  # hash-sample seeding, no RNG anywhere


def test_dim_not_divisible_raises(emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq_fit(emb, m=7, k=4, iters=1)


def test_adc_matches_numpy_reference(emb, fitted):
    """The column-expression ADC score must equal LUT-gather numpy."""
    books, codes = fitted
    q = [float(x) for x in emb.filter("vec_id = 1").first()["embedding"]]
    CB = np.asarray(books)
    m, k, ds = CB.shape
    lut = np.einsum("jkd,jd->jk", CB, np.asarray(q).reshape(m, ds))
    got = {
        r["vec_id"]: r["s"]
        for r in codes.select(
            "vec_id", pq_adc_score(books, q).alias("s")
        ).collect()
    }
    for r in codes.collect():
        want = float(sum(lut[j, c] for j, c in enumerate(r["codes"])))
        assert got[r["vec_id"]] == pytest.approx(want, rel=1e-12)


def test_shortlist_recall_pin(emb, fitted):
    """The committed ann_pq config (m=16, k=16, shortlist=100) must
    keep the exact top-10 inside the ADC shortlist — this is the fact
    that makes the exact-dot oracle valid for the approximate query."""
    books, codes = fitted
    q = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    shortlist = {r["vec_id"] for r in pq_topk(codes, books, q, 100).collect()}
    exact = [r["vec_id"] for r in brute_force_topk(emb, q, 10, metric="dot").collect()]
    assert set(exact) <= shortlist  # recall@10 == 1.0
    refined = [
        r["vec_id"]
        for r in pq_topk_refined(codes, emb, books, q, 10, 100).collect()
    ]
    assert refined == exact


def test_index_roundtrip(spark, emb, fitted, tmp_path):
    books, codes = fitted
    path = str(tmp_path / "pq_index")
    write_pq_index(codes, books, path)
    codes2, books2 = read_pq_index(spark, path)
    assert books2 == [[list(map(float, c)) for c in book] for book in books]
    assert codes2.count() == codes.count()
    q = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    got = [r["vec_id"] for r in pq_topk(codes2, books2, q, 10).collect()]
    want = [r["vec_id"] for r in pq_topk(codes, books, q, 10).collect()]
    assert got == want


def test_adc_scan_stays_jvm_side(spark, emb, fitted, tmp_path):
    """Searching a persisted codes table is map-only JVM work: no
    Python stage, no join, no shuffle before TakeOrdered."""
    from tools.plan_audit import audit

    books, codes = fitted
    path = str(tmp_path / "pq_plan")
    write_pq_index(codes, books, path)
    codes2, books2 = read_pq_index(spark, path)
    q = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    a = audit(pq_topk(codes2, books2, q, 10))
    assert a["python_stages"] == 0, a["plan"]
    assert a["shuffles"] == 0, a["plan"]
    assert a["smj"] == a["bhj"] == a["bnlj"] == 0, a["plan"]


def test_append_pq_index(spark, emb, fitted, tmp_path):
    """Incremental encode-append: new batch coded with the persisted
    codebooks; merged codes == single-shot encode of the union."""
    import os

    from pyspark.sql import functions as F

    from qurio_spark.operators.pq import append_pq_index

    books, _ = fitted
    base = emb.filter(F.col("vec_id") % 4 != 0)
    delta = emb.filter(F.col("vec_id") % 4 == 0)
    path = str(tmp_path / "pq_inc")
    write_pq_index(pq_encode(base, books), books, path)
    before = {
        os.path.join(r, f): os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(f"{path}/codes")
        for f in fs
        if f.endswith(".parquet")
    }
    append_pq_index(spark, path, delta)
    after = {p: os.path.getmtime(p) for p in before if os.path.exists(p)}
    assert after == before

    merged, books2 = read_pq_index(spark, path)
    want = {
        (r["vec_id"], tuple(r["codes"]))
        for r in pq_encode(emb, books).collect()
    }
    got = {(r["vec_id"], tuple(r["codes"])) for r in merged.collect()}
    assert got == want
