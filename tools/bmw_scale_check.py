"""Validate Block-Max MaxScore one decade above the test SFs: build a
deterministic ~100k-doc corpus with a Zipf-ish vocabulary (stopwords
on every doc, mid/rare tails), persist the index (blockmax sidecar +
sorted doc_block column), and measure the pruning a rare+stopword
query gets from block bounds ON TOP of plain MaxScore — plus the
losslessness check (identical top-k vs the unpruned scorer).

Usage:  python tools/bmw_scale_check.py [n_docs]

Prints one JSON line: alive-block count, postings matched / scored
under plain MaxScore vs Block-Max, per-path wall seconds, topk_equal.
The committed evidence lives in SCALE.md; tests/test_bm25_segments.py
::TestBlockMax pins the same contract on a geometry-controlled corpus.

Why Block-Max prunes where plain MaxScore cannot: the query term
'zq3' matches ~1000 docs, but only ~20 (2%) carry it with high tf in
a short doc — the rest are low-impact mentions.  theta (from the
strong docs) exceeds every weak mention's impact, so plain MaxScore
still scores ALL ~1000 candidates (they sit on the essential list),
while the per-block bounds discard every block holding only weak
mentions — the candidate set and the scored postings shrink to the
strong docs' blocks (strong docs per term must exceed topk, else
theta itself comes from a weak mention and no block can fail it)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(spark, n_docs: int):
    """Deterministic corpus, built distributed: every doc carries the
    stopwords; ~8% carry one of 8 'zq' terms — 2% of those mentions
    are HIGH-impact (tf=8, short doc), the rest weak (tf=1, padded
    long doc).  md5-derived pseudo-randomness: engine-deterministic,
    no RNG, so reruns are byte-identical."""
    from pyspark.sql import functions as F

    def h(salt: str):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))),
                1, 15,
            ), 16, 10,
        ).cast("bigint")

    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    rare_id = F.pmod(h("r"), F.lit(100))  # 8 zq terms, each df ~ n/100
    strong = F.pmod(h("s"), F.lit(50)) == 0  # 2% of mentions
    mid_id = F.pmod(h("m"), F.lit(37))
    zq = F.concat(F.lit("zq"), rare_id.cast("string"))
    text = F.concat_ws(
        " ",
        F.lit("the and of data common words fill this doc body"),
        F.concat(F.lit("mid"), mid_id.cast("string")),
        F.when(
            (rare_id < 8) & strong, F.concat_ws(" ", *[zq] * 8)
        ).when(
            rare_id < 8,
            F.concat(zq, F.lit(" pad0 pad1 pad2 pad3 pad4 pad5 pad6"
                                " pad7 pad8 pad9 pada padb padc padd"
                                " pade padf padg padh padi padj")),
        ).otherwise(F.lit("")),
    )
    return base.select("doc_id", text.alias("text"))


def main() -> None:
    import tempfile

    from pyspark.sql import SparkSession, functions as F

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from qurio_spark.operators import bm25 as B

    corpus = build_corpus(spark, n_docs)
    t0 = time.time()
    path = tempfile.mkdtemp(prefix="qurio-bmw-scale-") + "/idx"
    B.write_index(B.build_index(corpus), path)
    build_s = time.time() - t0

    query = "zq3 the data"  # rare + two stopword-class terms
    topk = 10

    def run(use_blocks: bool):
        idx = B.read_index(spark, path)
        if not use_blocks:
            idx.blockmax = None
        stats: dict = {}
        t = time.time()
        rows = (
            B.score_query_maxscore(idx, query, topk, prune_stats=stats)
            .orderBy(F.desc("bm25"), F.asc("doc_id"))
            .limit(topk)
            .collect()
        )
        secs = time.time() - t
        top = [(r["doc_id"], round(r["bm25"], 9)) for r in rows]
        return top, stats, secs

    plain_top, plain_stats, plain_s = run(False)
    bmw_top, bmw_stats, bmw_s = run(True)

    # unpruned ground truth
    idx = B.read_index(spark, path)
    full = (
        B.score_query(idx, query)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(topk)
        .collect()
    )
    full_top = [(r["doc_id"], round(r["bm25"], 9)) for r in full]

    alive = bmw_stats.get("alive_blocks")
    out = {
        "n_docs": n_docs,
        "build_s": round(build_s, 2),
        "postings_matched": plain_stats["postings_matched"],
        "plain_postings_scored": plain_stats["postings_scored"],
        "bmw_postings_scored": bmw_stats["postings_scored"],
        "alive_blocks": None if alive is None else len(alive),
        "n_blocks": B.N_DOC_BLOCKS,
        "plain_s": round(plain_s, 2),
        "bmw_s": round(bmw_s, 2),
        "topk_equal": plain_top == full_top and bmw_top == full_top,
        "ok": (
            plain_top == full_top
            and bmw_top == full_top
            and bmw_stats["postings_scored"]
            <= plain_stats["postings_scored"]
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
