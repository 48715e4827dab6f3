"""Relational breadth over the TPC-H-ish tables: semi/anti joins,
conditional aggregation, HAVING — the operator classes a 100 TB
pipeline leans on."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from qurio_spark.functions.frames import local_frame
from qurio_spark.functions.jobs import run_concurrent
from qurio_spark.functions.numeric import stable_round

from .common import (
    QUERY_TEXT,
    QUERY_VEC_ID,
    _docs_with_vecs,
    _epoch_secs,
    _events,
    _normalize_events_ts,
    _qvec,
    _t,
)



def q_tpch_q4(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS semi-join orders->lineitem + group count.
    At scale the semi-join shuffles only orderkeys (no payload)."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-07-01"))
            & (F.col("o_orderdate") < F.lit("1996-10-01"))
        )
        .join(
            l.filter(F.col("l_discount") > 0.05).select("l_orderkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q_tpch_q14(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue share — broadcast the part dim
    into the lineitem scan, conditional agg, one ratio row."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .join(F.broadcast(p.select("p_partkey", "p_type")),
              F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            stable_round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18 shape: large-volume orders — HAVING on a grouped
    lineitem sum, then join back to orders+customer (the big-side agg
    runs first so the join input is already tiny)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 180)
    )
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            stable_round("o_totalprice", 2).alias("o_totalprice"),
            stable_round("total_qty", 2).alias("total_qty"),
        )
    )


def q_parts_never_shipped(spark, sf_dir):
    """TPC-H Q16-flavor anti-join: parts with no lineitem shipped since
    2000-06-01, counted per brand (NOT EXISTS -> left_anti; the filter
    on the probe side prunes the shuffle input before the anti-join)."""
    p = _t(spark, sf_dir, "part")
    l = _t(spark, sf_dir, "lineitem")
    return (
        p.join(
            l.filter(F.col("l_shipdate") >= F.lit("2000-06-01")).select("l_partkey"),
            F.col("p_partkey") == F.col("l_partkey"),
            "left_anti",
        )
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"))
    )


def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10 shape: top returned-revenue customers in a quarter —
    filter both sides before the join, broadcast nation, deterministic
    top-20."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-10-01"))
                & (F.col("o_orderdate") < F.lit("1997-01-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(stable_round(F.sum(rev), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q_tpch_q13(spark, sf_dir):
    """TPC-H Q13 shape: customer order-count distribution — LEFT OUTER
    join so zero-order customers count, then a histogram over the
    per-customer counts (two partial-agg shuffles)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


def q_tpch_q12(spark, sf_dir):
    """TPC-H Q12 shape: late-shipment priority counts — join + two
    conditional aggregates, everything pushed to the scans."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


def q_tpch_q19(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs disjunctive predicate over the
    part join — the pushdown stress case (each disjunct pairs a part
    attribute with a lineitem quantity band)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cond = (
        ((F.col("p_type") == "PROMO") & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 20))
        | ((F.col("p_type") == "STANDARD") & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 30))
        | ((F.col("p_size") >= 40) & (F.col("l_quantity") >= 20))
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(stable_round(F.sum(rev), 2).alias("revenue"))
    )




def q_bloom_semi_join(spark, sf_dir):
    """Runtime-filter pattern (operators/bloom.py): lineitems of the
    top-priced ~1% of orders via a bloom-pre-filtered semi-join — the
    8k-bit filter over the selective build side's keys is built
    distributed (slot-wise bit_or, keys never collected), shipped as a
    LITERAL into the probe scan, and drops ~99% of lineitem rows
    BEFORE the join exchange; the surviving sliver joins normally so
    the result is exactly the plain semi-join (the oracle).  Rolled up
    per returnflag for a compact checkable output."""
    from qurio_spark.operators.bloom import bloom_semi_join

    li = _t(spark, sf_dir, "lineitem")
    expensive = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 494000.0)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    hits = bloom_semi_join(li, expensive, on="l_orderkey")
    return hits.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"),
        stable_round(F.sum("l_extendedprice"), 2).alias("revenue"),
    )


def q_snap_compact(spark, sf_dir):
    """Small-file compaction e2e (plans/snapshots.snap_compact):
    orders commit as four single-file micro-batches (the streaming-
    sink accumulation shape), compaction bin-packs them into one
    version, and the query aggregates the compacted table — the
    oracle is the plain full-table aggregation, which is exactly the
    rows-byte-equal contract.  File-count reduction and manifest-list
    collapse are pinned in tests/test_snapshots.py."""
    import tempfile

    from qurio_spark.plans.snapshots import snap_append, snap_compact, snap_read

    path = f"{tempfile.mkdtemp(prefix='qurio-snapcompact-')}/orders"
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    mn, mx = o.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    bounds = [mn - 1, mx // 4, mx // 2, 3 * mx // 4, mx]
    # §2.6 job overlap: the four micro-batch appends are order-free
    # (compaction and the final aggregate read only the latest
    # version's union) — OCC assigns version numbers race-safely
    run_concurrent([
        (
            lambda lo=lo, hi=hi: snap_append(
                o.filter(
                    (F.col("o_orderkey") > lo) & (F.col("o_orderkey") <= hi)
                ).coalesce(1),
                path,
            )
        )
        for lo, hi in zip(bounds, bounds[1:])
    ])
    v = snap_compact(spark, path, small_bytes=64 << 20)
    assert v is not None  # four small files always compact
    return snap_read(spark, path).groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        stable_round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


def q_snap_quarantine(spark, sf_dir):
    """Dead-letter quality gates e2e
    (plans/snapshots.snap_append_quarantined): the events batch passes
    two expectations — value under 400 and not an error event — with
    violating rows routed to the quarantine table tagged by every
    gate they failed, and the clean remainder committed.  The query
    returns the QUARANTINED rows with their tags; the oracle is the
    complement-predicate SELECT with the same tag concatenation, so
    both the split and the per-row tagging are value-checked (counts
    and the all-clean/all-bad edge cases are pinned in
    tests/test_snapshots.py)."""
    import tempfile

    from qurio_spark.plans.snapshots import snap_append_quarantined, snap_read

    base = tempfile.mkdtemp(prefix="qurio-snapdlq-")
    path, dlq = f"{base}/events", f"{base}/events_dlq"
    ev = _events(spark, sf_dir).select("event_id", "event_type", "value")
    out = snap_append_quarantined(
        ev, path,
        {
            "value_small": F.col("value") < 400,
            "not_error": F.col("event_type") != "error",
        },
        dlq,
    )
    assert out["n_quarantined"] > 0  # the fixture always has errors
    return snap_read(spark, dlq).select(
        "event_id",
        "event_type",
        stable_round("value", 2).alias("value_r"),
        F.array_join("_violated", ",").alias("violated"),
    )


def q_time_travel(spark, sf_dir):
    """Snapshot table format e2e (plans/snapshots.py): orders commit
    as two appends into a manifest-versioned table; the query reads
    BOTH version 0 (time travel — files pinned by the v0 manifest,
    invisible to later commits) and latest, returning one row of
    paired aggregates.  Oracle: v0 == the first batch's aggregation,
    latest == the full table's — which is exactly what manifest
    pinning must guarantee."""
    import tempfile

    from qurio_spark.plans.snapshots import snap_append, snap_read

    path = f"{tempfile.mkdtemp(prefix='qurio-snap-')}/orders"
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    mid = o.agg(F.max("o_orderkey")).first()[0] // 2
    snap_append(o.filter(F.col("o_orderkey") <= mid), path)
    snap_append(o.filter(F.col("o_orderkey") > mid), path)

    v0 = snap_read(spark, path, 0).agg(
        F.count("*").alias("v0_n"),
        stable_round(F.sum("o_totalprice"), 2).alias("v0_revenue"),
    )
    cur = snap_read(spark, path).agg(
        F.count("*").alias("n"),
        stable_round(F.sum("o_totalprice"), 2).alias("revenue"),
    )
    return v0.crossJoin(cur)


def q_snap_scan(spark, sf_dir):
    """Manifest-level data skipping e2e (plans/snapshots.snap_scan):
    orders commit as three snapshots with disjoint o_orderkey ranges
    (one file each); scanning the middle range prunes the other two
    files from the manifest stats BEFORE Spark sees any path, and the
    residual filter keeps the result exact — so the oracle is the
    plain BETWEEN aggregation.  File-count pruning itself is pinned in
    tests/test_snapshots.py (inputFiles)."""
    import tempfile

    from qurio_spark.plans.snapshots import snap_append, snap_scan

    path = f"{tempfile.mkdtemp(prefix='qurio-snapscan-')}/orders"
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    mx = o.agg(F.max("o_orderkey")).first()[0]
    b1, b2 = mx // 3, 2 * mx // 3
    # §2.6 job overlap: three order-free appends (the scan below reads
    # the final version only; per-file stats depend on content, not on
    # which commit claimed which version number)
    run_concurrent([
        lambda: snap_append(
            o.filter(F.col("o_orderkey") <= b1).coalesce(1), path
        ),
        lambda: snap_append(
            o.filter(
                (F.col("o_orderkey") > b1) & (F.col("o_orderkey") <= b2)
            ).coalesce(1),
            path,
        ),
        lambda: snap_append(
            o.filter(F.col("o_orderkey") > b2).coalesce(1), path
        ),
    ])

    mid = snap_scan(spark, path, "o_orderkey", lo=b1 + 1, hi=b2)
    return mid.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        stable_round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


def q_snap_widen(spark, sf_dir):
    """Type-widening schema evolution e2e (plans/snapshots.py,
    Delta's type-widening feature): the first orders batch commits
    with NARROW types (o_orderkey int, o_totalprice float), the second
    with the natural wide ones (bigint, double) — the append widens
    the manifest schema instead of refusing, the narrow files read
    up-converted under the wider pinned schema, and time travel shows
    v0 with its own narrow types.  The oracle reproduces BOTH phases,
    including the float truncation the narrow batch's prices went
    through (CAST to REAL and back), so the value compare proves the
    narrow files' bytes survive the widening exactly.  Integer sums
    keep the compare order-proof (no double-summation hazard)."""
    import tempfile

    from qurio_spark.plans.snapshots import snap_append, snap_read

    path = f"{tempfile.mkdtemp(prefix='qurio-snapwiden-')}/orders"
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    mid = o.agg(F.max("o_orderkey")).first()[0] // 2
    snap_append(
        o.filter(F.col("o_orderkey") <= mid).select(
            F.col("o_orderkey").cast("int").alias("o_orderkey"),
            "o_orderstatus",
            F.col("o_totalprice").cast("float").alias("o_totalprice"),
        ),
        path,
    )
    snap_append(o.filter(F.col("o_orderkey") > mid), path)

    def phase_agg(df: DataFrame, phase: str) -> DataFrame:
        return (
            df.groupBy("o_orderstatus")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum(F.col("o_orderkey").cast("long")).alias("key_sum"),
                stable_round(
                    F.max(F.col("o_totalprice").cast("double")), 2
                ).alias("price_max"),
            )
            .withColumn("phase", F.lit(phase))
        )

    v0 = phase_agg(snap_read(spark, path, 0), "v0_narrow")
    cur = phase_agg(snap_read(spark, path), "widened")
    return v0.unionByName(cur).select(
        "phase", "o_orderstatus", "n_orders", "key_sum", "price_max"
    )


def q_snap_dropcol(spark, sf_dir):
    """Metadata-only DROP COLUMN e2e (plans/snapshots.snap_drop_column,
    Delta's ``ALTER TABLE DROP COLUMN``): orders commit as two
    snapshots carrying o_orderpriority; the drop is an O(1) manifest
    commit (zero data bytes move — pinned in tests/test_snapshots.py),
    after which the pinned-schema read no longer surfaces the column
    while TIME TRAVEL to the pre-drop version still groups by it.
    ``sees_col`` is computed from the live read's actual schema, so a
    read that leaked the dropped field would fail the value compare,
    not just a pytest."""
    import tempfile

    from qurio_spark.plans.snapshots import (
        snap_append,
        snap_drop_column,
        snap_read,
    )

    path = f"{tempfile.mkdtemp(prefix='qurio-snapdrop-')}/orders"
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    mid = o.agg(F.max("o_orderkey")).first()[0] // 2
    # §2.6 job overlap: order-free appends — the pinned read below is
    # version 1, which contains BOTH batches whichever commit won v0
    # (append carries its parent's files), so the pre-drop aggregate is
    # interleaving-invariant
    run_concurrent([
        lambda: snap_append(o.filter(F.col("o_orderkey") <= mid), path),
        lambda: snap_append(o.filter(F.col("o_orderkey") > mid), path),
    ])
    snap_drop_column(path, "o_orderpriority")

    pre = snap_read(spark, path, 1)
    cur = snap_read(spark, path)

    def phase_agg(df: DataFrame, phase: str, grp) -> DataFrame:
        return (
            df.groupBy(grp.alias("grp"))
            .agg(
                F.count("*").alias("n_orders"),
                stable_round(F.sum("o_totalprice"), 2).alias("revenue"),
            )
            .select(
                F.lit(phase).alias("phase"),
                "grp",
                F.lit(
                    int("o_orderpriority" in df.columns)
                ).alias("sees_col"),
                "n_orders",
                "revenue",
            )
        )

    return phase_agg(pre, "pre_drop", F.col("o_orderpriority")).unionByName(
        phase_agg(
            cur,
            "post_drop",
            F.concat(F.lit("status:"), F.col("o_orderstatus")),
        )
    )


def q_snap_renamecol(spark, sf_dir):
    """Metadata-only RENAME COLUMN via column mapping e2e
    (plans/snapshots.snap_rename_column, Delta's ``ALTER TABLE RENAME
    COLUMN`` under column-mapping mode): the first orders batch
    commits under the ORIGINAL name, the rename is an O(1) manifest
    commit (zero data bytes move — pinned in tests/test_snapshots.py),
    and the second batch appends under the NEW name — so the live
    aggregation SPANS both physical eras through the union-schema
    coalescing read, while time travel shows the pre-rename version
    under the old name.  ``sees`` is computed from the live read's
    actual schema (new name present AND old name absent), so a leaked
    or missing column fails the value compare."""
    import tempfile

    from qurio_spark.plans.snapshots import (
        snap_append,
        snap_read,
        snap_rename_column,
    )

    path = f"{tempfile.mkdtemp(prefix='qurio-snaprename-')}/orders"
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    mid = o.agg(F.max("o_orderkey")).first()[0] // 2
    snap_append(o.filter(F.col("o_orderkey") <= mid), path)
    snap_rename_column(path, "o_totalprice", "price")
    snap_append(
        o.filter(F.col("o_orderkey") > mid).withColumnRenamed(
            "o_totalprice", "price"
        ),
        path,
    )

    pre = snap_read(spark, path, 0)
    cur = snap_read(spark, path)
    live = cur.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        stable_round(F.sum("price"), 2).alias("revenue"),
    ).select(
        F.lit("renamed_live").alias("phase"),
        "o_orderstatus",
        F.lit(
            int("price" in cur.columns and "o_totalprice" not in cur.columns)
        ).alias("sees"),
        "n_orders",
        "revenue",
    )
    tt = pre.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        stable_round(F.sum("o_totalprice"), 2).alias("revenue"),
    ).select(
        F.lit("pre_rename_v0").alias("phase"),
        "o_orderstatus",
        F.lit(int("o_totalprice" in pre.columns)).alias("sees"),
        "n_orders",
        "revenue",
    )
    return live.unionByName(tt)


def q_snap_dv(spark, sf_dir):
    """Merge-on-read DELETE via deletion vectors e2e
    (plans/snapshots.snap_delete_where_mor): orders commit as two
    snapshots; two stacked MOR deletes — an o_orderkey range and an
    o_totalprice threshold (different columns, so the second vector
    stacks on the first) — commit POSITIONS only (zero data bytes
    move, pinned in tests/test_dv.py); the 'mor' read applies the
    vectors as an anti-join.  ``snap_materialize_dvs`` then folds the
    vectors into rewritten files and the 'materialized' read takes the
    join-free path — both phases must equal the oracle's complement-
    predicate aggregation (the reference bar: Delta deletion vectors /
    Iceberg positional deletes)."""
    import tempfile

    from qurio_spark.plans.snapshots import (
        snap_append,
        snap_delete_where_mor,
        snap_materialize_dvs,
        snap_read,
    )

    path = f"{tempfile.mkdtemp(prefix='qurio-snapdv-')}/orders"
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    mx = o.agg(F.max("o_orderkey")).first()[0]
    # §2.6 job overlap: the two seed appends are order-free (the table
    # after both is the same union either way, no reader pins an
    # intermediate version) — OCC makes the racing commits safe, and
    # the deletes below still see both.  The MOR deletes themselves
    # stay sequential: the second stacks on the first's vectors.
    run_concurrent([
        lambda: snap_append(o.filter(F.col("o_orderkey") <= mx // 2), path),
        lambda: snap_append(o.filter(F.col("o_orderkey") > mx // 2), path),
    ])
    snap_delete_where_mor(spark, path, "o_orderkey", lo=mx // 4 + 1, hi=mx // 2)
    snap_delete_where_mor(spark, path, "o_totalprice", lo=150000.0)

    def phase_agg(df: DataFrame, phase: str) -> DataFrame:
        return (
            df.groupBy("o_orderstatus")
            .agg(
                F.count("*").alias("n_orders"),
                stable_round(F.sum("o_totalprice"), 2).alias("revenue"),
            )
            .withColumn("phase", F.lit(phase))
        )

    mor = phase_agg(snap_read(spark, path), "mor")
    snap_materialize_dvs(spark, path)
    materialized = phase_agg(snap_read(spark, path), "materialized")
    return mor.unionByName(materialized).select(
        "phase", "o_orderstatus", "n_orders", "revenue"
    )


def q_snap_zorder(spark, sf_dir):
    """Z-order clustered snapshot + multi-column manifest skipping e2e
    (plans/zorder + plans/snapshots.snap_scan_multi): orders commit
    laid out along the Morton curve of (o_custkey, o_totalprice), so
    every file's footer range is tight on BOTH columns and the
    two-dimensional box predicate prunes files at the manifest level
    before Spark sees a path (pruning effectiveness pinned in
    tests/test_zorder.py; Delta's OPTIMIZE ZORDER BY).  The residual
    filter keeps the result exact, so the oracle is the plain
    conjunctive-range aggregation."""
    import tempfile

    from qurio_spark.plans.snapshots import snap_overwrite, snap_scan_multi

    path = f"{tempfile.mkdtemp(prefix='qurio-snapz-')}/orders"
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_totalprice"
    )
    mxc = o.agg(F.max("o_custkey")).first()[0]
    snap_overwrite(o, path, zorder_by=["o_custkey", "o_totalprice"])
    box = snap_scan_multi(
        spark, path,
        {
            "o_custkey": (mxc // 4, mxc // 2),
            "o_totalprice": (50000.0, 150000.0),
        },
    )
    return box.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        stable_round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


def q_snap_bloom(spark, sf_dir):
    """Manifest-level BLOOM skipping e2e
    (plans/snapshots._attach_blooms + snap_scan_multi(eq=)):
    documents commit in two bloomed snapshots keyed by a sha2 content
    hash — a high-cardinality UNSORTED column where every file's
    [min, max] spans the whole key space, so range stats prune
    nothing and the per-file bloom probe is what keeps a point lookup
    from scanning the table (pruning counts pinned in
    tests/test_manifest_bloom.py).  The probe key is the max-doc_id
    document's hash; the result is every document sharing that text
    (duplicate texts in the corpus make this legitimately multi-row),
    so the oracle is the plain hash-equality SELECT."""
    import tempfile

    from qurio_spark.plans.snapshots import snap_append, snap_scan_multi

    path = f"{tempfile.mkdtemp(prefix='qurio-snapbloom-')}/documents"
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars",
        F.sha2(F.col("text"), 256).alias("content_hash"),
    )
    # ONE driver round trip for the split point AND the probe key: the
    # probe is the max-doc_id document's hash, i.e. a column of the
    # same row that defines mx — a TakeOrdered top-1 fetches both
    # (r15; the separate max() + equality-filter first() paid the
    # per-action floor twice and re-scanned documents for one row)
    top = d.orderBy(F.desc("doc_id")).select("doc_id", "content_hash").first()
    mx, probe = top["doc_id"], top["content_hash"]
    # §2.6 job overlap: order-free bloomed appends — each commit's
    # bloom sidecar is built over its OWN files (uuid-named) and the
    # probe reads the final manifest only
    run_concurrent([
        lambda: snap_append(
            d.filter(F.col("doc_id") <= mx // 2).repartition(4), path,
            bloom_cols=["content_hash"],
        ),
        lambda: snap_append(
            d.filter(F.col("doc_id") > mx // 2).repartition(4), path,
            bloom_cols=["content_hash"],
        ),
    ])
    hit = snap_scan_multi(spark, path, {}, eq={"content_hash": probe})
    return hit.select("doc_id", "lang", "n_chars").orderBy("doc_id")


def q_snap_merge(spark, sf_dir):
    """Snapshot-table DML e2e (plans/snapshots.snap_merge +
    snap_update_where — the Delta MERGE INTO / UPDATE shape): orders
    commit as two snapshots; a MERGE source rewrites the low-decile
    keys (status 'U', doubled price) and inserts 100 synthetic 'N'
    orders past the key space — file pruning + the discovery join
    rewrite only matched files (pinned in tests/test_snap_merge.py);
    then an UPDATE bumps a mid-range band's price by 10.  The final
    per-status aggregate must equal the oracle's CASE-reconstruction
    of the same two mutations over plain orders."""
    import tempfile

    from qurio_spark.plans.snapshots import (
        snap_append,
        snap_merge,
        snap_read,
        snap_update_where,
    )

    path = f"{tempfile.mkdtemp(prefix='qurio-snapmerge-')}/orders"
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    mx = o.agg(F.max("o_orderkey")).first()[0]
    # §2.6 job overlap: order-free seed appends (merge + update below
    # run against the final union either way)
    run_concurrent([
        lambda: snap_append(o.filter(F.col("o_orderkey") <= mx // 2), path),
        lambda: snap_append(o.filter(F.col("o_orderkey") > mx // 2), path),
    ])
    updates = o.filter(F.col("o_orderkey") <= mx // 10).withColumns(
        {
            "o_orderstatus": F.lit("U"),
            "o_totalprice": F.col("o_totalprice") * 2,
        }
    )
    inserts = spark.range(1, 101).select(
        (F.lit(mx) + F.col("id")).cast("long").alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        F.lit(1000.0).alias("o_totalprice"),
    )
    snap_merge(spark, path, updates.unionByName(inserts), ["o_orderkey"])
    snap_update_where(
        spark, path,
        {"o_totalprice": F.col("o_totalprice") + 10},
        "o_orderkey", lo=mx // 2 + 1, hi=(3 * mx) // 4,
    )
    return (
        snap_read(spark, path)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            stable_round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("o_orderstatus")
    )
