"""Query catalog for the driver contract, split by family.

``__spark_entry__`` at the repo root aggregates these into the
``queries()`` / ``oracle_sql()`` dicts the driver consumes; each module
here is importable on its own for library consumers."""

from . import (  # noqa: F401
    breadth,
    catalog,
    common,
    dedup,
    events_tpch,
    ingest,
    media,
    oracles,
    pipelines,
    relational,
    search,
    temporal,
    textstats,
)
