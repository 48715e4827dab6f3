"""Fuzzy (edit-distance) join via symmetric-delete blocking.

Training-data-pipeline extension (record linkage / typo
canonicalization): find all string pairs within Levenshtein distance
``k`` WITHOUT a cross join.  The blocking is SymSpell's symmetric
delete (Garbe 2012, public algorithm): every string emits its
deletion neighborhood — itself plus each string obtainable by
deleting up to ``k`` characters — and two strings within edit
distance ``k`` are guaranteed to share at least one neighborhood key:

  equal strings          share the identity key
  one insertion/deletion the shorter string IS a delete of the longer
  one substitution       deleting the substituted position from both
                         sides yields the same key

so an equality join on the key is a LOSSLESS candidate generator for
``k`` = 1 (the proof above), after which an exact ``levenshtein``
verify keeps only true pairs.  Everything is JVM-side column
expressions (``transform`` + ``sequence`` + ``substring``) — no UDF,
whole-stage codegen end to end.

Scale shape (100 TB posture):
  - neighborhood size is O(len) per string (k=1), so the exploded key
    table is a constant small factor of the input — vs O(n^2) for a
    naive cross join;
  - the equality join shuffles on short string keys; AQE handles
    residual key skew, and a df-cap on pathological keys (a key shared
    by thousands of strings means the strings are near-identical
    boilerplate) can be layered exactly like ngram_jaccard's
    stop-shingle cap if a corpus needs it;
  - candidate pairs are ``distinct``-ed BEFORE the verify so each pair
    pays one levenshtein call.

The reference has no fuzzy matching at all (SURVEY §2.7 — retrieval is
BM25/vector only); this is a beyond-reference extension in the dedup
family (SURVEY §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def symdelete_keys(col: F.Column) -> F.Column:
    """Deletion neighborhood for k=1: array(s, del(s,1), ..., del(s,len)).

    ``del(s,i)`` drops the i-th (1-based) character — pure substring
    arithmetic so the whole expression stays in codegen.
    """
    # sequence(1, 0) steps BACKWARDS in Spark, so the empty string must
    # short-circuit to its identity key alone.
    return F.when(F.length(col) == 0, F.array(col)).otherwise(
        F.concat(
            F.array(col),
            F.transform(
                F.sequence(F.lit(1), F.length(col)),
                lambda i: F.concat(
                    F.substring(col, F.lit(1), i - 1),
                    col.substr(i + 1, F.length(col)),
                ),
            ),
        )
    )


def _keyed(df: DataFrame, id_col: str, s_col: str) -> DataFrame:
    # array_distinct dedups within-string keys (deleting either of two
    # equal adjacent chars yields the same key) MAP-SIDE — no shuffle;
    # cross-string candidate dups fall to the final pair-distinct.
    return df.select(
        F.col(id_col),
        F.col(s_col),
        F.explode(F.array_distinct(symdelete_keys(F.col(s_col)))).alias("_k"),
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_str: str,
    right_id: str,
    right_str: str,
    max_dist: int = 1,
) -> DataFrame:
    """All (left, right) pairs with levenshtein(left_str, right_str)
    <= max_dist.  Only ``max_dist=1`` is supported (the k=1
    neighborhood is what :func:`symdelete_keys` generates; k=2 would
    emit the O(len^2) double-delete set the same way).
    """
    if max_dist != 1:
        raise ValueError("symdelete blocking implemented for max_dist=1")
    lk = _keyed(left, left_id, left_str)
    rk = _keyed(right, right_id, right_str)
    cand = (
        lk.join(rk, "_k")
        .select(left_id, left_str, right_id, right_str)
        .dropDuplicates([left_id, right_id])
    )
    return cand.filter(
        F.levenshtein(F.col(left_str), F.col(right_str)) <= max_dist
    ).withColumn("dist", F.levenshtein(F.col(left_str), F.col(right_str)))
