"""ceneton_database_tools_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the capabilities of
``kws/ceneton-database-tools`` (reference surveyed in SURVEY.md):

* the reference's FMP-XML ingest pipeline: ``sources/fmp_xml.py``
  (Spark 4 Python ``DataSource`` + schema layer ``schema.py``),
  ``sinks/jsonl.py`` and ``sinks/sqldb.py`` writers, and the
  ``ct-db``-compatible ``cli.py``;
* a general relational query surface (``operators/relational.py``,
  ``operators/scalar.py``, ``operators/events.py``), which the
  reference lacks but the driver's correctness gate tests;
* large-scale training-data-pipeline operators: ``operators/dedup.py``
  (exact / MinHash-LSH / SimHash / embedding-cosine),
  ``operators/similarity.py`` (exact + LSH top-k),
  ``operators/text.py`` (stats / quality / langid / fingerprints),
  ``operators/multimodal.py`` (binary columns + Arrow decode path).

Everything is declarative DataFrame/SQL so Catalyst + Tungsten pick the
physical strategy; Python UDFs appear only where built-ins genuinely
cannot express the semantics (and then always Arrow-vectorized).
"""

__version__ = "0.1.0"

from ceneton_database_tools_spark.session import get_spark  # noqa: F401
