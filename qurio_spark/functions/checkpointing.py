"""Lineage-truncation seam: local vs durable checkpointing.

Iterative operators (connected components, hybrid fusion diamonds)
must cut lineage each round or the logical plan grows without bound
(see operators/dedup.connected_components).  On local[*] the cheap cut
is ``localCheckpoint`` — executor-memory blocks, no HDFS round-trip —
but its blocks die with an executor, which on a REAL cluster means a
lost-node recomputation storm with no lineage left to replay.

``checkpoint_df`` routes every such site through one switch:

    spark.conf.set("spark.qurio.durableCheckpoint", "true")
    spark.sparkContext.setCheckpointDir("hdfs://.../checkpoints")

Durable mode uses ``DataFrame.checkpoint`` (reliable checkpoint to the
configured checkpoint dir, surviving executor loss) — the cluster-scale
configuration; the default stays local for single-node runs and tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DURABLE_CONF = "spark.qurio.durableCheckpoint"


def durable_enabled(spark) -> bool:
    return str(spark.conf.get(DURABLE_CONF, "false")).lower() == "true"


def checkpoint_df(df: DataFrame, eager: bool = False) -> DataFrame:
    """Truncate ``df``'s lineage: ``localCheckpoint`` by default,
    durable ``checkpoint`` when ``spark.qurio.durableCheckpoint=true``
    (requires ``sparkContext.setCheckpointDir``)."""
    if durable_enabled(df.sparkSession):
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
