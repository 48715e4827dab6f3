"""Text-analysis operators (training-data-pipeline extensions).

Beyond reference parity (the brief's §extensions): language ID, quality
scoring, token counting, document fingerprinting.  All pure column
expressions — whole-stage codegen, zero Python — and each has an exact
DuckDB-SQL twin in ``__spark_entry__.py`` for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from qurio_spark.functions.hashing import sha256_hex
from qurio_spark.functions.numeric import stable_round
from qurio_spark.functions.text import (
    bpeish_token_count,
    pii_count,
    punct_ratio,
    redact_pii,
    stopword_ratio,
    token_count,
    tokenize,
)

#: Frozen per-language stopword marker lists for the n-gram-free
#: heuristic language identifier.  Deliberately tiny: the point is a
#: deterministic, oracle-checkable heuristic, not fasttext parity.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "las", "es", "y"],
}


def marker_hits(col: Column, lang: str) -> Column:
    toks = tokenize(col)
    return F.size(F.filter(toks, lambda t: t.isin(LANG_MARKERS[lang])))


def lang_id_expr(col: Column) -> Column:
    """Argmax over marker-hit counts; ties broken by language-code order
    (greatest-first scan below keeps the FIRST max); no hits -> 'und'."""
    hit_cols = [(lang, marker_hits(col, lang)) for lang in sorted(LANG_MARKERS)]
    best = F.greatest(*[h for _, h in hit_cols])
    expr = F.lit("und")
    # build when-chain in reverse so earlier languages win ties
    for lang, h in reversed(hit_cols):
        expr = F.when((h == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def quality_score_expr(col: Column) -> Column:
    """[0,1] doc-quality heuristic from length / punctuation / stopword
    signals (the classic C4/Gopher-style cheap filters):
      0.4 * length_ok (120 <= chars <= 20000)
    + 0.3 * (1 - min(1, punct_ratio * 4))
    + 0.3 * min(1, stopword_ratio * 5)
    """
    n = F.length(col)
    length_ok = F.when((n >= 120) & (n <= 20000), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_term = F.lit(1.0) - F.least(F.lit(1.0), punct_ratio(col) * 4.0)
    sw_term = F.least(F.lit(1.0), stopword_ratio(col) * 5.0)
    return stable_round(0.4 * length_ok + 0.3 * punct_term + 0.3 * sw_term, 4)


def fingerprint_expr(col: Column) -> Column:
    """Document fingerprint: sha256 over whitespace-normalized lowercase
    text (T8-style content hashing applied to near-canonical form)."""
    normalized = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
    return sha256_hex(normalized)


def text_profile(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One pass over the corpus -> per-doc analysis row."""
    c = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.length(c).alias("n_chars"),
        token_count(c).alias("n_tokens"),
        bpeish_token_count(c).alias("n_bpeish_tokens"),
        F.size(F.array_distinct(tokenize(c))).alias("n_distinct_tokens"),
        F.round(punct_ratio(c), 4).alias("punct_ratio"),
        F.round(stopword_ratio(c), 4).alias("stopword_ratio"),
        lang_id_expr(c).alias("lang_guess"),
        quality_score_expr(c).alias("quality"),
        fingerprint_expr(c).alias("fingerprint"),
    )


def repetition_profile(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition metrics, map-only (zero shuffle):
    distinct-word ratio and duplicate-bigram fraction per document —
    the standard cheap filters for boilerplate/looped text in
    training-data curation.  Pure array expressions; at 100 TB this is
    a single codegen'd scan."""
    c = F.col(text_col)
    # ONE bound token array (the word_ngrams lambda-binding trick, so
    # the regex split runs once per row) feeding all four counts;
    # bigrams are (tok_i, tok_{i+1}) STRUCTS, not concatenated strings
    # — tokens cannot contain the separator, so distinct-pair counts
    # are identical, without building n string objects per row
    # (measured ~2x on the dbf side).  Counting contract matches
    # word_ngrams(c, 2): greatest(n-2, 0)+1 positions, so a 0/1-token
    # doc contributes one degenerate all-distinct bigram (dbf 0).
    stats = F.get(
        F.transform(
            F.array(tokenize(c)),
            lambda toks: F.struct(
                F.size(toks).alias("nt"),
                F.size(F.array_distinct(toks)).alias("ndt"),
                (F.greatest(F.size(toks) - 2, F.lit(0)) + F.lit(1)).alias(
                    "nb"
                ),
                F.size(
                    F.array_distinct(
                        F.transform(
                            F.sequence(
                                F.lit(0),
                                F.greatest(F.size(toks) - 2, F.lit(0)),
                            ),
                            lambda i: F.struct(
                                F.get(toks, i), F.get(toks, i + 1)
                            ),
                        )
                    )
                ).alias("ndb"),
            ),
        ),
        F.lit(0),
    )
    dwr = F.when(
        stats["nt"] > 0, stats["ndt"] / stats["nt"]
    ).otherwise(F.lit(0.0))
    dbf = F.when(
        stats["nb"] > 0, F.lit(1.0) - stats["ndb"] / stats["nb"]
    ).otherwise(F.lit(0.0))
    return docs.select(
        F.col(id_col),
        stable_round(dwr, 4).alias("distinct_word_ratio"),
        stable_round(dbf, 4).alias("dup_2gram_frac"),
    )


def word_concentration(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document top-word fraction (the Gopher 'most common word'
    rule): explode -> partial-aggregated (doc, word) counts -> per-doc
    argmax window.  One shuffle on (doc, word) with map-side combine;
    the window then runs on the already-reduced rows (vocab-sized, not
    corpus-sized).  Ties break to the lexicographically first word so
    both engines agree."""
    words = docs.select(F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("word"))
    counts = words.groupBy(id_col, "word").agg(F.count("*").alias("n"))
    w = Window.partitionBy(id_col)
    return (
        counts.withColumn("total", F.sum("n").over(w))
        .withColumn(
            "rn", F.row_number().over(w.orderBy(F.desc("n"), F.asc("word")))
        )
        .filter(F.col("rn") == 1)
        .select(
            F.col(id_col),
            F.col("word").alias("top_word"),
            stable_round(F.col("n") / F.col("total"), 4).alias("top_word_frac"),
        )
    )


def pii_profile(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII scrub pass: per-doc match count + fingerprint of the
    redacted text (functions/text.redact_pii) — map-only regexp chain,
    codegen, no Python."""
    c = F.col(text_col)
    return docs.select(
        F.col(id_col),
        pii_count(c).cast("bigint").alias("n_pii"),
        sha256_hex(redact_pii(c)).alias("redacted_fp"),
    )


def keyword_extract(
    docs: DataFrame,
    topk: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k TF-IDF keywords per document (training-data tagging /
    weak labeling): tf(t,d) * ln(N / df(t)), ranked per doc with
    deterministic ties (rounded score desc, term asc).

    Scale shape: one (doc, term) partial-agg shuffle for tf; the
    per-term df table is |vocab|-sized and broadcast; the per-doc
    window ranks only that doc's distinct terms.  At 100 TB this is
    exactly the BM25 index-build shape with a window instead of a
    query-side probe."""
    from qurio_spark.functions.checkpointing import checkpoint_df

    toks = docs.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("term")
    )
    # df derives FROM tf, so without a lineage cut the (doc, term)
    # aggregation shuffle runs twice (the fusion-diamond problem the
    # hybrid scorer hit) — checkpoint once, both consumers read blocks
    tf = checkpoint_df(toks.groupBy(id_col, "term").agg(F.count("*").alias("tf")))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.count("*").cast("double").alias("n"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * F.log(F.col("n") / F.col("df").cast("double")),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc(stable_round(F.col("score"), 6)), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            F.col(id_col),
            F.col("rank"),
            F.col("term"),
            stable_round("score", 4).alias("tfidf"),
        )
    )


#: The Gopher rule-set stop words (Rae et al. 2021, MassiveText A1.1):
#: a document must contain at least 2 of these to pass the stop-word
#: rule — the cheapest "is this prose at all" signal in the ladder.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """The GOPHER quality-filter rule set (Rae et al. 2021, MassiveText
    appendix A1.1) as per-document boolean gates — the canonical
    pretraining-corpus document filter, complementing the soft
    ``quality_score_expr`` with the published hard thresholds:

      1. word count in [50, 100k]          (``r_word_count``)
      2. mean word length in [3, 10]       (``r_mean_word_len``)
      3. (#-symbols + ellipses)/words <= 0.1  (``r_symbol_ratio``)
      4. <= 90% of lines start with a bullet  (``r_bullet_lines``)
      5. <= 30% of lines end with an ellipsis (``r_ellipsis_lines``)
      6. >= 80% of words contain an alphabetic char (``r_alpha_words``)
      7. >= 2 of the 8 Gopher stop words present   (``r_stopwords``)

    "Words" are whitespace-split non-empty strings (punctuation kept —
    the paper's definition, distinct from ``tokenize``'s alnum terms,
    which rule 7 uses).  Flags are INTs (0/1) so the DuckDB oracle
    hashes identically; ``gopher_pass`` is the conjunction.  Pure
    column expressions — whole-stage codegen end to end, no shuffle,
    no Python: at 100 TB this is a single map-stage scan."""
    c = F.col(text_col)
    words = F.filter(F.split(c, r"\s+"), lambda w: w != F.lit(""))
    n_words = F.size(words)
    sum_len = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    ).cast("double")
    mean_len = F.when(n_words > 0, sum_len / n_words).otherwise(F.lit(0.0))
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    n_sym = F.regexp_count(c, F.lit("#")) + F.regexp_count(
        c, F.lit(r"\.\.\.")
    )
    lines = F.filter(
        F.split(c, "\n"), lambda ln: F.trim(ln) != F.lit("")
    )
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(lines, lambda ln: F.trim(ln).rlike(r"^[•\-\*]"))
    )
    n_ell_end = F.size(
        F.filter(lines, lambda ln: F.trim(ln).rlike(r"(\.\.\.|…)$"))
    )
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(tokenize(c)),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    flags = {
        "r_word_count": (n_words >= min_words) & (n_words <= max_words),
        "r_mean_word_len": (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len),
        "r_symbol_ratio": F.when(
            n_words > 0, n_sym / n_words <= max_symbol_ratio
        ).otherwise(F.lit(False)),
        "r_bullet_lines": F.when(
            n_lines > 0, n_bullet / n_lines <= max_bullet_ratio
        ).otherwise(F.lit(True)),
        "r_ellipsis_lines": F.when(
            n_lines > 0, n_ell_end / n_lines <= max_ellipsis_ratio
        ).otherwise(F.lit(True)),
        "r_alpha_words": F.when(
            n_words > 0, n_alpha / n_words >= min_alpha_ratio
        ).otherwise(F.lit(False)),
        "r_stopwords": n_stop >= min_stopwords,
    }
    out = docs.select(
        F.col(id_col),
        *[v.cast("int").alias(k) for k, v in flags.items()],
    )
    pass_expr = F.lit(1)
    for k in flags:
        pass_expr = pass_expr * F.col(k)
    return out.withColumn("gopher_pass", pass_expr.cast("int"))
