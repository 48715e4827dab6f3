"""Deduplication operators (training-data-pipeline extensions).

The reference's only dedup is exact-hash (F6 content_hash / F8 page
conflict-ignore).  At 100 TB a training pipeline needs the full ladder,
each implemented as declarative DataFrame ops:

  exact_dedup          sha256 groupBy — one shuffle on the hash
  ngram_jaccard_pairs  shingle inverted-index join (docs sharing a
                       shingle become candidates; Jaccard on candidate
                       pairs only) — never a blind cross join
  minhash_signatures / minhash_lsh_pairs
                       portable universal-hash MinHash; LSH banding
                       turns near-dup detection into an equality join
                       on (band, band_hash) — the linear-ish scale path
  simhash64            64-bit sign-aggregated fingerprint; near-dups =
                       low Hamming distance, prefilterable by band
                       equality on 16-bit quarters

Hashes are the engine-portable md5-based ``hash64`` (functions/hashing)
so every sketch is reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from qurio_spark.functions.checkpointing import checkpoint_df
from qurio_spark.functions.hashing import MERSENNE_61, hash64, minhash_coeffs
from qurio_spark.functions.numeric import stable_round
from qurio_spark.functions.text import word_ngrams


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep the lowest-id representative per exact content hash, as a
    ``min``/``min_by`` AGGREGATION rather than a per-hash window (r14):
    partial aggregation collapses each hash to one row per map
    partition BEFORE the exchange, so even a single document
    duplicated millions of times (the boilerplate shape — hash keys
    are uniform across reducers, but one hot VALUE still lands on one
    reducer) contributes one row per task to the shuffle, text bytes
    included.  ``min_by`` is deterministic here because ids are unique
    (no ordering ties).  One shuffle, map-side combined.

    The group key is the RAW 32-byte digest (``unhex`` of the sha2
    hex, r16 guide §2.3 — narrower shuffle keys): hex->bytes is a
    bijection, so the grouping is bit-identical to grouping on the
    hex string at half the key bytes; the hash never leaves the
    operator, so the declared content-hash contract (exposed as hex
    elsewhere) is untouched."""
    return (
        docs.select(
            F.col(id_col),
            F.col(text_col),
            F.unhex(F.sha2(F.col(text_col), 256)).alias("_h"),
        )
        .groupBy("_h")
        .agg(
            F.min(id_col).alias(id_col),
            F.min_by(text_col, F.col(id_col)).alias(text_col),
        )
        .select(id_col, text_col)
    )


def shingle_docs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """-> (id, shingle) distinct word-n-gram rows."""
    return (
        docs.select(
            F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("shingle")
        )
        .filter(F.col("shingle") != "")
        .distinct()
    )


def contamination_flags(
    train: DataFrame,
    bench: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination (the Lee/Brown-style n-gram overlap
    check every training pipeline runs before a data release): flag
    training documents sharing >= 1 word-n-gram shingle with the
    held-out benchmark set.  -> (id, n_shared_shingles) for
    contaminated docs only.

    Scale shape: the benchmark shingle set is the SMALL side (eval
    suites are thousands of prompts, not terabytes) — distinct'd and
    broadcast, so the check is one map-side semi-ish join over the
    training shingle explode, no shuffle of the corpus; the per-doc
    rollup shuffles only the surviving (contaminated) rows."""
    t_sh = shingle_docs(train, id_col, text_col, n)
    b_sh = (
        bench.select(F.explode(word_ngrams(F.col(text_col), n)).alias("shingle"))
        .filter(F.col("shingle") != "")
        .distinct()
    )
    return (
        t_sh.join(F.broadcast(b_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared_shingles"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingles: DataFrame | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """Jaccard similarity over word-n-gram shingle sets, computed only
    for candidate pairs that share >= 1 shingle (inverted-index
    self-join on the shingle key).  -> (id_a, id_b, jaccard).

    ``max_df``: the stop-shingle cap.  Hot shingles are join-skew bombs
    a splitter can't fully absorb — one boilerplate shingle shared by
    10^6 docs is a 10^12-pair join key.  With ``max_df=c`` every
    shingle whose document frequency exceeds ``c`` is dropped BEFORE
    the self-join, bounding any single join key's fan-out to c^2;
    Jaccard is then the Jaccard of the capped shingle sets (sizes and
    intersections both exclude stop-shingles — the deterministic,
    oracle-mirrorable semantics).  Pairs sharing at least one sub-cap
    shingle are still found; only pairs whose ENTIRE overlap is
    boilerplate disappear — which is the point of the cap.
    ``max_df=None`` (default) keeps exact full-set Jaccard.

    Residual skew below the cap is AQE skew-split territory.

    ``shingles``: a prebuilt (persisted) distinct ``(id, shingle)``
    table — the inverted index, built once per corpus version.
    """
    # Shingle identity is xxhash64-folded to a long (r15, guide §2.3):
    # the distinct, the max_df count, and the inverted-index SELF-JOIN
    # all shuffle 8-byte keys instead of n-word strings.  Equal strings
    # hash equal, so pairs/sizes/intersections are unchanged up to hash
    # collisions (deterministic, and surfaced by the string-based
    # DuckDB oracles at every test SF if one existed in the data).
    # Persisted shingle indexes stay string-typed on disk (shared with
    # the portable-hash minhash family); the fold happens at load.
    if shingles is not None:
        sh = shingles
        if dict(sh.dtypes).get("shingle") == "string":
            sh = sh.select(
                F.col(id_col), F.xxhash64("shingle").alias("shingle")
            )
    else:
        sh = (
            docs.select(
                F.col(id_col),
                F.explode(word_ngrams(F.col(text_col), n)).alias("_sstr"),
            )
            .filter(F.col("_sstr") != "")
            .select(F.col(id_col), F.xxhash64("_sstr").alias("shingle"))
            .distinct()
        )
    if max_df is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("shingle")
        )
        # semi join on the same key the pair join shuffles on — the df
        # computation is one extra partial agg over the index, and the
        # capped index is what both sizes and intersections see
        sh = sh.join(keep, "shingle", "left_semi")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", stable_round(F.col("jaccard"), 4).alias("jaccard"))
    )


def minhash_signatures(
    docs: DataFrame,
    num_perm: int = 16,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 7,
) -> DataFrame:
    """-> (id, array<bigint> signature of length num_perm).

    One explode + one groupBy(id): each permutation is a min-aggregate
    of an affine rehash of the portable shingle hash.  No per-row
    Python, no UDF."""
    sh = shingle_docs(docs, id_col, text_col, n).withColumn(
        "h", hash64(F.col("shingle"))
    )
    aggs = []
    for i, (a, b) in enumerate(minhash_coeffs(num_perm, seed)):
        rehashed = (
            (F.col("h").cast("decimal(38,0)") * F.lit(a) + F.lit(b))
            % F.lit(MERSENNE_61)
        ).cast("bigint")
        aggs.append(F.min(rehashed).alias(f"mh{i}"))
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(
        F.col(id_col),
        F.array(*[F.col(f"mh{i}") for i in range(num_perm)]).alias("signature"),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    num_perm: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 7,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH near-dup candidates verified by signature similarity.

    Banding: signature split into ``bands`` rows-per-band groups; docs
    colliding on any (band_index, band_slice) become candidates — an
    equality join, linear-ish in collisions rather than quadratic in
    docs.  Estimated Jaccard = fraction of matching signature slots.
    -> (id_a, id_b, est_jaccard).

    ``signatures``: prebuilt ``(id, signature array<bigint>)`` table
    (see simhash_near_pairs — same build-once index economics)."""
    assert num_perm % bands == 0
    sig = (
        signatures
        if signatures is not None
        else minhash_signatures(docs, num_perm, n, id_col, text_col, seed)
    )
    banded = _lsh_banded(sig, num_perm, bands, id_col)
    a = banded.select(F.col(id_col).alias("id_a"), F.col("signature").alias("sig_a"), "band", "key")
    b = banded.select(F.col(id_col).alias("id_b"), F.col("signature").alias("sig_b"), "band", "key")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    return (
        cand.withColumn(
            "est_jaccard", _est_jaccard(num_perm, "sig_a", "sig_b")
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def _lsh_banded(
    sig: DataFrame, num_perm: int, bands: int, id_col: str
) -> DataFrame:
    """(id, signature) -> exploded (id, signature, band, key) rows, one
    per band, with ``key`` the band's signature slice as a string."""
    rows_per_band = num_perm // bands
    return sig.select(
        F.col(id_col),
        F.col("signature"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bi).alias("band"),
                    F.concat_ws(
                        ",",
                        *[
                            F.col("signature")[bi * rows_per_band + r].cast("string")
                            for r in range(rows_per_band)
                        ],
                    ).alias("key"),
                )
                for bi in range(bands)
            ])
        ).alias("bk"),
    ).select(id_col, "signature", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def _est_jaccard(num_perm: int, a: str, b: str):
    matches = F.size(
        F.filter(
            F.zip_with(F.col(a), F.col(b), lambda x, y: (x == y).cast("int")),
            lambda m: m == 1,
        )
    )
    return stable_round(matches / F.lit(float(num_perm)), 4)


def minhash_lsh_match(
    new_sigs: DataFrame,
    store_sigs: DataFrame,
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Asymmetric MinHash-LSH: which NEW docs near-duplicate an
    already-accepted doc in a signature store.  Both inputs are
    ``(id, signature array<bigint>)`` tables (``minhash_signatures``
    output with the SAME num_perm/n/seed).  -> (id_col, store_id,
    est_jaccard), one row per (new, store) hit above ``threshold``.

    Scale shape: the store is the large append-only side and the new
    side is one micro-batch, so the (band, key) equality join is a
    broadcast of the new side's banded rows against the store scan —
    persisting the store bucketed by (band, key) turns repeated probes
    into a pruned scan (same economics as the persisted LSH vector
    index in operators/similarity)."""
    assert num_perm % bands == 0
    a = _lsh_banded(new_sigs, num_perm, bands, id_col).select(
        F.col(id_col).alias("_new_id"), F.col("signature").alias("sig_a"), "band", "key"
    )
    b = _lsh_banded(store_sigs, num_perm, bands, id_col).select(
        F.col(id_col).alias("store_id"), F.col("signature").alias("sig_b"), "band", "key"
    )
    cand = (
        a.join(b, ["band", "key"])
        .select("_new_id", "store_id", "sig_a", "sig_b")
        .distinct()
    )
    return (
        cand.withColumn(
            "est_jaccard", _est_jaccard(num_perm, "sig_a", "sig_b")
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select(F.col("_new_id").alias(id_col), "store_id", "est_jaccard")
    )


def simhash64(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """SimHash over unigram tokens (60 effective bits, matching the
    portable 60-bit ``hash64``): bit j of the fingerprint is
    the sign of sum over tokens of (+1 if hash-bit j else -1), weighted
    by term frequency.  -> (id, simhash bigint).

    Implemented bit-parallel as ONE groupBy(id) carrying 60 per-bit sum
    aggregates over the (doc, token) frequency rows — no row
    amplification (an earlier form exploded every token row 60x into a
    (doc, bit)-keyed shuffle; same integer sums, ~2x slower).  At scale
    prefer the 16-bit-quarter banding in ``simhash_near_pairs`` for
    candidate generation."""
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), lambda x: x != F.lit("")
            )
        ).alias("tok"),
    )
    tf = toks.groupBy(id_col, "tok").agg(F.count("*").alias("w"))
    tf = tf.withColumn("h", hash64(F.col("tok")))
    bit_aggs = [
        F.sum(
            F.when(F.expr(f"(h >> {j}) & 1") == 1, F.col("w")).otherwise(-F.col("w"))
        ).alias(f"_s{j}")
        for j in range(60)
    ]
    per_doc = tf.groupBy(id_col).agg(*bit_aggs)
    simhash = None
    for j in range(60):
        bitval = F.when(
            F.col(f"_s{j}") > 0, F.lit(1 << j).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
        simhash = bitval if simhash is None else simhash + bitval
    return per_doc.select(F.col(id_col), simhash.alias("simhash"))


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame | None,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iters: int = 25,
    algorithm: str = "star",
    driver_max_edges: int = 500_000,
) -> DataFrame:
    """Near-dup pairs -> duplicate CLUSTERS: the step that makes pair
    detection actionable (keep one canonical doc per component).
    -> (id_col, cluster_id) with ``cluster_id = min(node id in the
    component)`` — a deterministic canonical id, independent of
    iteration order and of ``algorithm``.

    ``nodes=None`` (r16): return labels for EDGE-TOUCHED nodes only —
    no singleton rows.  Callers that only need the pair-connected
    ids' labels (everything else trivially forms its own cluster)
    skip the vertex-set scan and the singleton anti-join entirely;
    edge-node labels are identical to the full form's (singletons
    never influence a component).

    ``algorithm='star'`` (default): alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    rounds are O(log n) even on chain-shaped graphs, the web-scale
    shape.  ``algorithm='label_prop'``: min-label propagation with one
    pointer jump per round — rounds = component diameter in label-hops;
    fine for near-dup cliques, kept as the equivalence baseline.

    ``driver_max_edges``: the near-dup edge set is orders of magnitude
    smaller than the corpus (it only contains the duplicates), and its
    size is known for free once the deduped edges materialize — when it
    fits comfortably on the driver (default 500k edges, ~tens of MB),
    finishing with local union-find replaces O(log n) shuffle rounds
    with one collect.  0 disables the escape hatch (always iterate
    distributed; the graph-scale path stays tested).  Both finishes
    produce identical labels (pinned in tests/test_dedup.py).

    Raises ``RuntimeError`` when ``max_iters`` rounds pass without
    convergence — a silently split component would make canonical-doc
    selection keep extra duplicates downstream.
    """
    if algorithm == "star":
        return _connected_components_star(
            pairs, nodes, id_col, a_col, b_col, max_iters, driver_max_edges
        )
    if algorithm != "label_prop":
        raise ValueError(f"unknown algorithm {algorithm!r}")
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .transform(lambda d: checkpoint_df(d, eager=True))
    )
    # only nodes that appear in an edge can ever change label; isolated
    # nodes are their own (singleton) cluster and skip the loop entirely
    edge_nodes = edges.select(F.col("src").alias("node")).distinct()
    labels = checkpoint_df(edge_nodes.withColumn("label", F.col("node")), eager=True)
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        cur = labels.join(
            neighbor_min, labels["node"] == neighbor_min["src"], "left"
        ).select(
            "node",
            F.col("label").alias("_old"),
            F.least(F.col("label"), F.coalesce("nlabel", F.col("label"))).alias(
                "_l"
            ),
        )
        # ONE pointer jump per round (label <- label(label)): compresses
        # paths ~3x faster than pure propagation.  Exactly one —
        # stacking jumps before the checkpoint doubles the logical plan
        # per jump (a self-join tower) and the cumulative size-estimate
        # arithmetic OOMed the driver's stats visitor when we tried 3.
        lookup = cur.select(F.col("node").alias("_pn"), F.col("_l").alias("_pl"))
        cur = cur.join(lookup, cur["_l"] == lookup["_pn"], "left").select(
            "node",
            "_old",
            F.least(F.col("_l"), F.coalesce("_pl", F.col("_l"))).alias("_l"),
        )
        new_labels = cur.select(
            "node",
            F.col("_l").alias("label"),
            (F.col("_l") != F.col("_old")).alias("_chg"),
        ).transform(lambda d: checkpoint_df(d, eager=True))
        changed = new_labels.filter(F.col("_chg")).limit(1).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components(label_prop) did not converge in "
            f"{max_iters} rounds — components would be silently split; "
            f"raise max_iters or use algorithm='star'"
        )
    out = labels.select(
        F.col("node").alias(id_col), F.col("label").alias("cluster_id")
    )
    if nodes is None:
        return out
    singletons = nodes.join(
        edge_nodes, nodes[id_col] == edge_nodes["node"], "left_anti"
    ).select(F.col(id_col), F.col(id_col).alias("cluster_id"))
    return out.unionByName(singletons)


def _finish_union_find(
    edges: DataFrame, nodes: DataFrame, id_col: str
) -> DataFrame:
    """Driver-side finish over a small, already-deduped edge set:
    classic union-find with path halving, attaching the larger root
    beneath the smaller so every root IS its component's minimum id —
    the same ``cluster_id = min(member)`` contract as the distributed
    star iteration (equivalence pinned in tests/test_dedup.py)."""
    from pyspark.sql import types as T

    from qurio_spark.functions.frames import local_frame

    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    rows = edges.collect()
    for row in rows:
        ru, rv = find(row["u"]), find(row["v"])
        if ru != rv:
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    members = sorted({row["u"] for row in rows} | {row["v"] for row in rows})
    id_type = edges.schema["u"].dataType
    labels = local_frame(
        edges.sparkSession,
        [(x, find(x)) for x in members],
        T.StructType(
            [
                T.StructField(id_col, id_type),
                T.StructField("cluster_id", id_type),
            ]
        ),
    )
    if nodes is None:
        return labels
    singletons = nodes.join(
        labels.select(F.col(id_col).alias("_edge_node")),
        nodes[id_col] == F.col("_edge_node"),
        "left_anti",
    ).select(F.col(id_col), F.col(id_col).alias("cluster_id"))
    return labels.unionByName(singletons)


def _connected_components_star(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str,
    a_col: str,
    b_col: str,
    max_iters: int,
    driver_max_edges: int = 500_000,
) -> DataFrame:
    """Alternating large-star/small-star min-id connected components.

    Each round is two map-reduce steps over the current edge set E
    (edges always oriented big -> small after the first half-round):

      large-star: per node u over its SYMMETRIZED neighborhood G(u),
        m = min(G(u) + {u}); emit (v, m) for v in G(u), v > u — every
        strictly-larger neighbor links to u's local minimum.
      small-star: per node u over its smaller neighbors N(u),
        m = min(N(u)); emit (v, m) for v in N(u)+{u}, v != m — u and
        its smaller neighbors all link to the local minimum.

    Both steps preserve connectivity and strictly shrink tree height;
    the fixed point is a star per component centered on its min id
    (Kiveris et al. 2014 prove O(log^2 n) rounds worst-case, ~log n in
    practice — on chains this crushes the O(diameter) of label
    propagation).  Per round: two groupBy shuffles on node id (uniform
    key), edge set checkpointed via ``checkpoint_df`` (durable on real
    clusters, see functions/checkpointing).

    Convergence check = symmetric edge-set difference is empty; raises
    on ``max_iters`` exhaustion rather than returning split components.
    """
    from qurio_spark.functions.checkpointing import checkpoint_df

    edges = checkpoint_df(
        pairs.select(
            F.greatest(F.col(a_col), F.col(b_col)).alias("u"),
            F.least(F.col(a_col), F.col(b_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct(),
        eager=True,
    )
    # The deduped edge set is now materialized, so its size is one
    # cheap count over checkpoint blocks: small graphs (the common
    # post-LSH shape — edges only exist BETWEEN duplicates) finish with
    # driver union-find instead of paying per-round scheduling for
    # O(log n) shuffle iterations.
    if driver_max_edges and edges.count() <= driver_max_edges:
        return _finish_union_find(edges, nodes, id_col)
    edge_nodes = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .distinct()
        .transform(lambda d: checkpoint_df(d, eager=True))
    )
    for _ in range(max_iters):
        # --- large-star over the symmetrized neighborhood
        nbrs = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = nbrs.groupBy("u").agg(F.min("v").alias("_mv")).select(
            "u", F.least(F.col("_mv"), F.col("u")).alias("m")
        )
        large = (
            nbrs.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # --- small-star (edges now all point big -> small)
        smins = large.groupBy("u").agg(F.min("v").alias("m"))
        small = checkpoint_df(
            large.join(smins, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(smins.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct(),
            eager=True,
        )
        # Converged iff the edge set is a forest of stars — every src
        # has exactly one dst and no dst is itself a src.  (Each round
        # preserves connectivity, and a star forest is the iteration's
        # fixed point, so the star test IS the convergence test — and it
        # fires one round earlier than an edge-set-equality check.)
        # Both conditions fold into one indicator query so the round
        # costs a single job.
        not_star = (
            small.groupBy("u")
            .agg(F.count("*").alias("_c"))
            .filter(F.col("_c") > 1)
            .select(F.lit(1).alias("_x"))
            .unionAll(
                small.join(
                    small.select(F.col("u").alias("_v2")),
                    small["v"] == F.col("_v2"),
                    "left_semi",
                ).select(F.lit(1).alias("_x"))
            )
            .limit(1)
            .count()
        )
        edges = small
        if not_star == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components(star) did not converge in {max_iters} "
            f"rounds — components would be silently split"
        )
    # fixed point: one (node, root) edge per non-root node
    labels = edges.groupBy("u").agg(F.min("v").alias("cluster_id")).select(
        F.col("u").alias(id_col), "cluster_id"
    )
    roots = (
        edge_nodes.join(edges.select(F.col("u").alias("node")), "node", "left_anti")
        .select(F.col("node").alias(id_col), F.col("node").alias("cluster_id"))
    )
    out = labels.unionByName(roots)
    if nodes is None:
        return out
    singletons = nodes.join(
        edge_nodes, nodes[id_col] == edge_nodes["node"], "left_anti"
    ).select(F.col(id_col), F.col(id_col).alias("cluster_id"))
    return out.unionByName(singletons)


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    signatures: DataFrame | None = None,
) -> DataFrame:
    """SimHash near-dup pairs: candidates collide on ANY 15-bit quarter
    of the 60-bit fingerprint (pigeonhole: hamming <= 3 guarantees a
    matching quarter; wider radii trade recall), then exact Hamming
    verification via bit_count(xor).  -> (id_a, id_b, hamming).

    Scale shape: 4 equality joins on (band, quarter-value) — same
    banding economics as MinHash-LSH; never a cross join.  The verify
    step is two integer ops per candidate pair.

    ``signatures``: a prebuilt (persisted) ``(id, simhash)`` table —
    signatures are an index, built once per corpus version
    (deterministic, so prebuilt == in-DAG); when given, the query never
    touches the text corpus.
    """
    sig = signatures if signatures is not None else simhash64(docs, id_col, text_col)
    banded = sig.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(f"(simhash >> {b * 15}) & 32767").alias("q"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bq"),
    ).select(id_col, "simhash", F.col("bq.band").alias("band"), F.col("bq.q").alias("q"))
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("h_a"), "band", "q"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("h_b"), "band", "q"
    )
    cand = (
        a.join(b, ["band", "q"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def remove_duplicate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_count: int = 1,
) -> DataFrame:
    """Corpus-level duplicate-LINE removal — the CCNet / RefinedWeb
    cleanup step (boilerplate lines repeat across pages: nav bars,
    cookie banners, footers): any line whose TRIMMED text appears more
    than ``max_count`` times in the whole corpus is dropped from every
    document, and each document is rebuilt with its surviving lines in
    original order.

    Scale shape: posexplode -> ONE global count shuffle keyed on the
    trimmed line (partial-agg absorbs the hot-line skew: a nav line
    appearing a billion times arrives at the reducer once per map
    partition), an anti-join of lines against the hot set (small —
    only lines over the threshold; AQE broadcasts it when it fits),
    and one groupBy-doc rebuild via array_sort on (pos, line) — no
    window, no global sort.  Documents whose every line was dropped
    disappear from the result (nothing left to keep).

    Returns ``(id_col, text_clean, n_kept, n_removed)``."""
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("tl", F.trim("line"))
    hot = (
        lines.groupBy("tl")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > max_count)
        .select("tl")
    )
    kept = lines.join(hot, "tl", "left_anti")
    n_lines = lines.groupBy(id_col).agg(F.count("*").alias("n_lines"))
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
        ).alias("text_clean"),
        F.count("*").alias("n_kept"),
    )
    return rebuilt.join(n_lines, id_col).select(
        id_col,
        "text_clean",
        "n_kept",
        (F.col("n_lines") - F.col("n_kept")).alias("n_removed"),
    )


def _gram_key(slice_col):
    """Gram identity for :func:`remove_duplicate_spans`: xxhash64 over
    the k-token array slice (r15, guide §2.3).  Split out as a seam so
    tests can PLANT a colliding key (e.g. ``pmod(xxhash64(c), 4)``)
    and pin the documented degradation mode: two distinct grams that
    share a key merge their occurrence counts, which can only flag
    MORE positions (over-removal — kept tokens under collision are a
    subset of the true kept tokens), never resurrect a duplicate or
    crash (tests/test_jobs_overlap.py::TestPlantedGramCollision)."""
    return F.xxhash64(slice_col)


def remove_duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    min_count: int = 2,
) -> DataFrame:
    """Corpus-level exact duplicate-SUBSTRING removal (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    ExactSubstr) on the shared token contract: every token position
    covered by a k-token gram that occurs >= min_count times in the
    WHOLE corpus is dropped, and each document is rebuilt from its
    surviving tokens in order.  Complements remove_duplicate_lines
    (line granularity) with span granularity — the step that removes
    licence boilerplate / quoted passages that cross line boundaries.

    Scale shape (the line_dedup pattern one level down): tokenize ->
    per-doc k-gram windows as a single array expression (transform +
    slice, no UDF) -> posexplode -> ONE global gram-count shuffle
    (partial agg absorbs hot-gram skew) -> semi-join flagged starts
    (only duplicated grams travel) -> per-doc coverage test as a
    higher-order filter (exists over the doc's flagged starts — spans
    per doc are small; an interval-merge fold is the drop-in if a
    pathological doc collects thousands).  Never a cross join; the
    suffix-array of the original is replaced by the gram-equality
    join, trading the paper's single-node suffix automaton for a
    shuffle that partitions by gram hash.

    Returns ``(id_col, text_clean, n_kept, n_removed)`` for every
    input document (unchanged docs pass through with n_removed = 0).
    """
    toks = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
            lambda x: x != "",
        ).alias("_toks"),
    )
    # sequence(0, size-k) steps BACKWARDS when size < k -> guard.
    # Gram identity is xxhash64 OVER THE TOKEN SLICE (r15, guide §2.3
    # "shuffle keys and metadata instead of payloads"): the count
    # exchange and the hot-gram semi-join move an 8-byte long per
    # position instead of a ~k-token concatenated string, and the
    # concat itself (O(k) bytes built per position) disappears from
    # the map side.  xxhash64 hashes the array structurally, so equal
    # slices collide iff equal — up to hash collisions, whose
    # probability at ~2^64 is negligible and which the span_dedup
    # oracle (exact string grams in DuckDB) would surface
    # deterministically at every test SF if one existed in the data.
    grams = toks.select(
        F.col(id_col),
        F.posexplode(
            F.when(
                F.size("_toks") >= k,
                F.transform(
                    F.sequence(F.lit(0), F.size("_toks") - k),
                    lambda i: _gram_key(F.slice(F.col("_toks"), i + 1, F.lit(k))),
                ),
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("start", "gram"),
    )
    hot = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("gram")
    )
    flagged = (
        grams.join(hot, "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.collect_list("start").alias("_starts"))
    )
    base = toks.join(flagged, id_col, "left").withColumn(
        "_starts", F.coalesce("_starts", F.array().cast("array<int>"))
    )
    kept = base.select(
        F.col(id_col),
        F.filter(
            F.col("_toks"),
            lambda x, p: ~F.exists(
                F.col("_starts"), lambda s: (s <= p) & (p < s + F.lit(k))
            ),
        ).alias("_kept"),
        F.size("_toks").alias("_n"),
    )
    return kept.select(
        F.col(id_col),
        F.concat_ws(" ", "_kept").alias("text_clean"),
        F.size("_kept").alias("n_kept"),
        (F.col("_n") - F.size("_kept")).alias("n_removed"),
    )
