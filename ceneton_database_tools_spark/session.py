"""SparkSession factory with scale-appropriate defaults.

Local testing runs ``local[N]`` in one JVM; the configuration is chosen
so the same logical plans hold on a real multi-executor cluster:

* AQE on (runtime coalescing, skew-join splitting, dynamic join
  strategy switches) — the single most important knob at 100 TB.
* ``spark.sql.shuffle.partitions`` sized to the local core count; on a
  real cluster AQE's coalescing makes the initial number mostly a
  ceiling, so a high static value + AQE is the scalable setting.
* Session timezone pinned to UTC so timestamp semantics match the
  DuckDB oracle (naive/UTC wall-clock).
* Arrow enabled for all Pandas interchange (Pandas UDFs, toPandas).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "ceneton-database-tools-spark",
    cpus: str | int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``cpus`` controls local parallelism only; cluster deployments pass
    their own master via ``spark-submit`` and this builder defers to it
    (``master`` is only set when no master is configured yet).
    """
    cpus = str(cpus or DEFAULT_CPUS)
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Some rounds' events.parquet carries TIMESTAMP(NANOS); read as
        # long + truncate (catalog._load_events normalizes this AND the
        # MICROS-NTZ variant) instead of failing PARQUET_TYPE_ILLEGAL.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if "SPARK_GRAFT_MASTER" in os.environ:
        builder = builder.master(os.environ["SPARK_GRAFT_MASTER"])
    else:
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
