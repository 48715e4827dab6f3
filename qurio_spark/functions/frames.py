"""Small literal DataFrames, built cheaply.

``spark.createDataFrame(list)`` in PySpark materializes as a pickled
Python RDD split into ``defaultParallelism`` slices; every evaluation —
and a broadcast join evaluates the subtree once per broadcast — runs
one Python worker round-trip PER SLICE (~0.5 s per broadcast build on
local[32], measured).  Query/probe/dimension lookup tables are built
per query, so that overhead lands on the serving path.

``local_frame`` routes the same rows through the Arrow pandas
converter (no per-slice Python evaluation; one Arrow batch) with a
1-slice ``parallelize`` fallback when the rows don't fit the pandas
conversion (exotic nesting, Nones in typed arrays).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, types as T


def local_frame(spark: SparkSession, rows: list, schema) -> DataFrame:
    """A small literal DataFrame from driver-side ``rows`` (tuples in
    schema field order).  ``schema``: DDL string or StructType."""
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    try:
        import pandas as pd

        names = [f.name for f in schema.fields]
        pdf = pd.DataFrame(list(rows), columns=names)
        return spark.createDataFrame(pdf, schema)
    except Exception:
        return spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1), schema
        )
