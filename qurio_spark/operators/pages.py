"""Page reconstruction (operator Q5, ``qurio_read_page``).

The reference fetches all chunks ``where url == X`` ordered by
``chunkIndex`` (limit 1000) and stitches them back into one document,
giving code chunks a ``--- Code (lang) ---`` header
(retrieval/service.go:139-151, store.go:311-405, mcp/handler.go:490-545).

Spark shape: groupBy(page) + collect_list(struct(order, content)) +
array_sort + concat — one shuffle keyed by the page, each group small
(<= 1000 chunks by the reference's own limit), so no skew concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: store.go:334 — page reconstruction reads at most 1000 chunks.
READ_PAGE_CHUNK_LIMIT = 1000


def reconstruct_pages(
    chunks: DataFrame,
    page_col: str = "url",
    order_col: str = "chunk_index",
    content_col: str = "content",
    separator: str = "\n\n",
) -> DataFrame:
    """-> (page, n_chunks, full_text): every page stitched from its
    chunks in ``order_col`` order.  Oracle-checkable twin of read_page
    (plain separator join)."""
    return (
        chunks.groupBy(F.col(page_col).alias("page"))
        .agg(
            F.count("*").alias("n_chunks"),
            F.array_sort(
                F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(content_col).alias("c")))
            ).alias("parts"),
        )
        .select(
            "page",
            "n_chunks",
            F.array_join(F.transform("parts", lambda s: s["c"]), separator).alias(
                "full_text"
            ),
        )
    )


def read_page(
    chunks: DataFrame,
    url: str,
    url_col: str = "url",
    order_col: str = "chunk_index",
    content_col: str = "content",
    type_col: str = "type",
    lang_col: str = "language",
) -> str:
    """Single-page reconstruction with the reference's code-chunk
    formatting (mcp/handler.go:490-545): code/config/cmd/api chunks are
    introduced by ``--- Code (lang) ---`` headers.

    Returns the stitched text (driver-side; the per-URL filter is
    partition-prunable when chunks are partitioned by source).
    """
    rows = (
        chunks.filter(F.col(url_col) == url)
        .orderBy(F.asc(order_col))
        .limit(READ_PAGE_CHUNK_LIMIT)
        .select(content_col, type_col, lang_col)
        .collect()
    )
    parts = []
    for r in rows:
        if r[type_col] in ("code", "config", "cmd", "api"):
            lang = r[lang_col] or r[type_col]
            parts.append(f"--- Code ({lang}) ---\n{r[content_col]}")
        else:
            parts.append(r[content_col])
    return "\n\n".join(parts)
