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
    pays one levenshtein call;
  - SymSpell is a SHORT-KEY algorithm (names, titles, codes): the
    neighborhood is O(len) keys at k=1 and O(len^2 / 2) at k=2, so one
    dirty 5,000-char field would materialize ~12.5M keys in a single
    row's array before the explode and wedge an executor.
    ``fuzzy_join`` therefore enforces ``max_len`` (default 128 chars —
    ~8k keys worst case at k=2) BEFORE key generation: the default
    ``long_strings="error"`` fails fast with a clear message
    (executor-side ``raise_error``, still codegen), and
    ``long_strings="drop"`` excludes overlong rows for pipelines that
    prefer to skip dirty fields.

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


def symdelete_keys2(col: F.Column) -> F.Column:
    """Deletion neighborhood for k=2: the k=1 set plus every
    double-delete del(s, i, j) with i < j (O(len^2 / 2) keys).

    For an optimal alignment with <= 2 edits, deleting from each side
    the characters its edits touch reaches the alignment's common
    subsequence with <= 2 deletions per side, so two strings within
    Levenshtein distance 2 always share a key — the candidate join
    stays LOSSLESS (executable proof: the dense-random brute-force
    equivalence test in tests/test_quality.py).
    """
    # del(s, i, j), 1-based i < j: s[1..i-1] + s[i+1..j-1] + s[j+1..]
    del2 = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(col) - 1),
            lambda i: F.transform(
                F.sequence(i + 1, F.length(col)),
                lambda j: F.concat(
                    F.substring(col, F.lit(1), i - 1),
                    col.substr(i + 1, j - i - 1),
                    col.substr(j + 1, F.length(col)),
                ),
            ),
        )
    )
    return F.when(
        F.length(col) < 2, symdelete_keys(col)
    ).otherwise(F.concat(symdelete_keys(col), del2))


def _keyed(
    df: DataFrame,
    id_col: str,
    s_col: str,
    k: int,
    max_len: int,
    long_strings: str,
) -> DataFrame:
    # Length guard FIRST: the k=2 neighborhood is O(len^2 / 2) keys in
    # one row's array pre-explode, so an unguarded long field is an
    # executor-wedging hazard (module doc).  "error" fails fast inside
    # codegen via raise_error; "drop" filters the row out.  NULL
    # strings pass the guard (coalesce-true): they generate NULL key
    # arrays that explode to nothing — the pre-guard behavior — and
    # must not trip the overlong error.
    guard = F.coalesce(F.length(F.col(s_col)) <= max_len, F.lit(True))
    if long_strings == "drop":
        df = df.filter(guard)
    else:
        df = df.withColumn(
            s_col,
            F.when(guard, F.col(s_col)).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"fuzzy_join: '{s_col}' exceeds max_len="
                            f"{max_len} chars (symdelete neighborhood "
                            "is O(len^k)); pass long_strings='drop' or "
                            "raise max_len. Prefix: "
                        ),
                        F.substring(F.col(s_col), 1, 64),
                    )
                )
            ),
        )
    # array_distinct dedups within-string keys (deleting either of two
    # equal adjacent chars yields the same key) MAP-SIDE — no shuffle.
    # At k=2 its quadratic compare is a real cost (~2s on 15k 18-char
    # strings) but measured CHEAPER than shipping the ~1.6x duplicate
    # keys into the candidate join (dup x dup key groups multiply the
    # join output); cross-string dups fall to the final pair-distinct.
    #
    # Keys are xxhash64-FOLDED to longs before the dedup/explode (r15,
    # guide §2.3 narrower shuffle keys): array_distinct compares 8-byte
    # longs instead of quadratic string compares, and the candidate
    # join's exchange carries a long per key instead of a ~len-char
    # string.  Provably lossless for the OUTPUT (not just w.h.p.): the
    # blocking is already lossless on string keys, every candidate
    # passes the exact levenshtein verify, and a hash collision can
    # only ADD candidates the verify rejects (or duplicate pairs the
    # pair-distinct removes) — identical hashes join at least
    # everything identical strings would.
    keys = symdelete_keys if k == 1 else symdelete_keys2
    return df.select(
        F.col(id_col),
        F.col(s_col),
        F.explode(
            F.array_distinct(
                F.transform(keys(F.col(s_col)), lambda s: F.xxhash64(s))
            )
        ).alias("_k"),
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_str: str,
    right_id: str,
    right_str: str,
    max_dist: int = 1,
    max_len: int = 128,
    long_strings: str = "error",
) -> DataFrame:
    """All (left, right) pairs with levenshtein(left_str, right_str)
    <= max_dist, for ``max_dist`` in {1, 2}.  k=1 uses the O(len)
    deletion neighborhood; k=2 the O(len^2 / 2) double-delete set —
    still a constant-factor explode, never a cross join, but expect
    a larger candidate set on near-identical corpora (the standard
    SymSpell k tradeoff).

    Strings longer than ``max_len`` (default 128 — SymSpell is a
    short-key algorithm; see the module doc's scale note) either fail
    fast (``long_strings="error"``, the default) or are excluded
    (``long_strings="drop"``).  ``dist`` is a RESERVED output name
    (left inputs named ``dist`` are rejected); when a right-side name
    collides with any other output column — a self-join, a cross
    collision like ``right_id == left_str``, or ``dist`` itself — it
    comes back suffixed with as many ``_r`` as uniqueness needs.
    """
    if max_dist not in (1, 2):
        raise ValueError("symdelete blocking implemented for max_dist in {1, 2}")
    if long_strings not in ("error", "drop"):
        raise ValueError("long_strings must be 'error' or 'drop'")
    if "dist" in (left_id, left_str):
        raise ValueError(
            "'dist' is a reserved fuzzy_join output name; rename the "
            "left column"
        )
    # Alias the keyed frames internally so self-joins (same column
    # names on both sides) never hit Spark's ambiguous-reference
    # resolution, and compute levenshtein ONCE (filter on the column).
    lk = _keyed(left, left_id, left_str, max_dist, max_len, long_strings).select(
        F.col(left_id).alias("_lid"), F.col(left_str).alias("_ls"), "_k"
    )
    rk = _keyed(right, right_id, right_str, max_dist, max_len, long_strings).select(
        F.col(right_id).alias("_rid"), F.col(right_str).alias("_rs"), "_k"
    )
    cand = (
        lk.join(rk, "_k")
        .select("_lid", "_ls", "_rid", "_rs")
        .dropDuplicates(["_lid", "_rid"])
    )
    # When a right-side name collides with ANY other output column
    # (self-join, cross collisions like right_id == left_str, or the
    # reserved "dist"), keep the left names and suffix the right
    # side's with "_r" until unique, so the output never carries
    # duplicate column names.
    taken = {left_id, left_str, "dist"}

    def _uniq(name: str) -> str:
        while name in taken:
            name += "_r"
        taken.add(name)
        return name

    out_rid = _uniq(right_id)
    out_rs = _uniq(right_str)
    return (
        cand.withColumn("dist", F.levenshtein(F.col("_ls"), F.col("_rs")))
        .filter(F.col("dist") <= max_dist)
        .select(
            F.col("_lid").alias(left_id),
            F.col("_ls").alias(left_str),
            F.col("_rid").alias(out_rid),
            F.col("_rs").alias(out_rs),
            "dist",
        )
    )
