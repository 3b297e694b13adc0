"""Operator catalog packages.

Importing this package pulls in every operator module so that all
queries self-register into :mod:`ceneton_database_tools_spark.operators.registry`.
"""

from ceneton_database_tools_spark.operators import (  # noqa: F401
    advanced,
    dedup,
    events,
    multimodal,
    pipeline,
    quality,
    refine,
    relational,
    scalar,
    scale,
    similarity,
    text,
    tpch_extra,
)
from ceneton_database_tools_spark.streaming import events as streaming_events  # noqa: F401
from ceneton_database_tools_spark.operators.registry import (  # noqa: F401
    QUERIES,
    QuerySpec,
    all_queries,
    oracle_catalog,
    render_oracle,
)
