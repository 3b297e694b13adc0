"""ceneton_database_tools_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the capabilities of
``kws/ceneton-database-tools`` (reference surveyed in SURVEY.md):

* the reference's FMP-XML ingest pipeline as a Spark 4 Python
  ``DataSource`` plus DataFrame transforms and sinks
  (``sources/``, ``sinks/``, ``cli.py``);
* a general relational query surface (``operators/relational.py``),
  which the reference lacks but the driver's correctness gate tests;
* large-scale training-data-pipeline operators: deduplication,
  similarity search, text analysis, multimodal columns
  (``operators/dedup.py`` etc.);
* Structured Streaming operators over the events table
  (``streaming/``).

Everything is declarative DataFrame/SQL so Catalyst + Tungsten pick the
physical strategy; Python UDFs appear only where built-ins genuinely
cannot express the semantics (and then always Arrow-vectorized).
"""

__version__ = "0.1.0"

from ceneton_database_tools_spark.session import get_spark  # noqa: F401
