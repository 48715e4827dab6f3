"""Committed golden row-hashes for the rows-only ``queries()`` entries.

The five entries without an ``oracle_sql()`` twin (non-SQL-expressible:
the chunker cascade, the e2e ingest pipeline, iterative k-means, the
SemDeDup pipeline, BPE tokenization) get REAL checks instead of bare
row counts (VERDICT r13 #4): a sha256 over the order-normalized result
rows, pinned per scale factor, shared by tests/test_queries_full.py
and tools/oracle_check.py — so the committed ORACLE_CHECK sweeps show
them as golden-verified, not merely "ran".

All five pipelines are deterministic end to end (md5-seeded k-means,
hash embedder, greedy BPE with lexicographic tie-breaks), so any drift
is a real behavior change — or a driver testdata regen, in which case
re-pin from the mismatch message.
"""

from __future__ import annotations

import hashlib

from qurio_spark.oracle import norm_rows

#: entry -> {sf dirname -> sha256 of the order-normalized rows}
GOLDEN_ROW_HASHES: dict[str, dict[str, str]] = {
    "chunk_corpus": {
        "sf0.001": "577c8a253202e4e4ad3ea6b5c6465e1024b46ba9ebc7afd48285fa5f12f2ec63",
        "sf0.01": "8d29a2100a169c5dc4e1e9c1c6ca06ae27e6300409614ca191ad55ab18038356",
        "sf0.1": "12ab8ab661e30641949877059b45e6deedf99ce972c6eb4756c9e0aa07891332",
    },
    # sf0.001 == sf0.01 is real: the pipeline fixture subset coincides
    "ingest_pipeline": {
        "sf0.001": "47756741bab79de93020c7bd28d843c620307b77fdeb958adfce4cd598353dba",
        "sf0.01": "47756741bab79de93020c7bd28d843c620307b77fdeb958adfce4cd598353dba",
        "sf0.1": "5fc2ff3be62ebf4c107179634ecc10e6da02b618221dacc4675fd2d40f5febca",
    },
    "kmeans_ivf": {
        "sf0.001": "8fd01679646ebfc3f2dd28b1355e6908244704541235665aefeda1840e1e1fb9",
        "sf0.01": "4d19067ea0180a520f06ce97d2d795cd4c9f2f3e1b9c813ef2f51063e77935b6",
        "sf0.1": "2fe282edb29ca5fdf27318ca499fc576cc61476a8d268e10c1d93838897ada42",
    },
    "semantic_dedup": {
        "sf0.001": "6e0cc88f7eae1574faadf530e7ceac96e03e836e7db811d8c87f878cece941f4",
        "sf0.01": "755cf8929a214efa8f35cff211c849cfc34a376dffe08b89d214a3e330bf90c0",
        "sf0.1": "ab265625fd4ec488fed7f7dfa6084da9b58a8b893c899d6f3dea2a89a2b3a4b4",
    },
    "bpe_tokenize": {
        "sf0.001": "a33378c1b3c4b7034422423871c69695185bf3ec175ca4df87bd639007127ff6",
        "sf0.01": "214c2202e50ccc78f9826de6d4dd072f0b2ea6a8c417231481f03081d486181a",
        "sf0.1": "d58ac2c744ca924b0fec1e553acec6d0cfbde4e8d499354476d3d38a79de415c",
    },
}


def rows_hash(cols, rows) -> str:
    """sha256 over the order-normalized rows (the same normalization
    the oracle comparator uses, so column order and row order never
    matter)."""
    normed = norm_rows(cols, [tuple(r) for r in rows])
    h = hashlib.sha256()
    for r in normed:
        h.update(repr(r).encode())
    return h.hexdigest()


def row_hash(df) -> str:
    return rows_hash(df.columns, df.collect())


def golden_for(name: str, sf_dir: str) -> str | None:
    """The pinned hash for this entry at this sf directory, or None."""
    import os

    sf = os.path.basename(sf_dir.rstrip("/"))
    return GOLDEN_ROW_HASHES.get(name, {}).get(sf)
