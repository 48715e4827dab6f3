"""The durable-checkpoint switch (functions/checkpointing).

Closes the SCALE.md open risk: every iterative/diamond lineage cut in
the engine routes through ``checkpoint_df``, which defaults to
``localCheckpoint`` (single-node) and upgrades to reliable
``DataFrame.checkpoint`` — surviving executor loss — when
``spark.qurio.durableCheckpoint=true`` and a checkpoint dir is set.
"""

import os

import pytest
from pyspark.sql import functions as F

from qurio_spark.functions.checkpointing import (
    DURABLE_CONF,
    checkpoint_df,
    durable_enabled,
)


@pytest.fixture
def durable(spark, tmp_path):
    """Flip the session into durable-checkpoint mode for one test."""
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    spark.conf.set(DURABLE_CONF, "true")
    yield str(tmp_path / "ckpt")
    spark.conf.unset(DURABLE_CONF)


def _ckpt_files(root):
    return [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(root)
        for f in fs
        if not f.startswith(".")
    ]


class TestCheckpointDf:
    def test_default_is_local(self, spark, tmp_path):
        assert not durable_enabled(spark)
        df = checkpoint_df(spark.range(100).withColumn("x", F.col("id") * 2))
        assert df.count() == 100
        # nothing written anywhere on disk for a local checkpoint
        assert _ckpt_files(str(tmp_path)) == []

    def test_flag_routes_to_reliable_checkpoint(self, spark, durable):
        assert durable_enabled(spark)
        df = checkpoint_df(
            spark.range(1000).withColumn("x", F.col("id") % 7), eager=True
        )
        assert df.count() == 1000
        # reliable checkpoint materializes RDD blocks under the dir
        assert len(_ckpt_files(durable)) > 0

    def test_connected_components_runs_durably(self, spark, durable):
        """An iterative operator survives a full run in durable mode —
        the per-round cuts all route through the seam."""
        from qurio_spark.operators.dedup import connected_components

        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(30)], "id_a long, id_b long"
        )
        nodes = spark.createDataFrame([(i,) for i in range(31)], "doc_id long")
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components(pairs, nodes).collect()
        }
        assert set(got.values()) == {0}
        assert len(_ckpt_files(durable)) > 0

    def test_hybrid_search_runs_durably(self, spark, durable):
        from qurio_spark.operators.hybrid import hybrid_search

        docs = spark.createDataFrame(
            [
                (i, f"spark join doc {i}", [float(i + 1), 1.0])
                for i in range(8)
            ],
            "doc_id long, text string, embedding array<float>",
        )
        res = hybrid_search(docs, "spark join", [1.0, 0.5], alpha=0.5, limit=3)
        assert res.count() == 3
