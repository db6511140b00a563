"""SparkSession factory with scale-appropriate defaults.

Local-mode defaults mirror what we would set on a real cluster where the
cluster manager owns memory/cores: AQE on (runtime coalesce + skew-join
handling), UTC session timezone (all reference timestamps are Unix ms, UTC),
Arrow enabled for the Pandas-UDF path.

At 100 TB the same session settings hold; only `spark.sql.shuffle.partitions`
is sized differently (we leave AQE's coalescePartitions to shrink it at
runtime, so a high static value is safe on a big cluster).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "mempool-dumpster-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    In tests and bench this runs ``local[N]``; on a cluster, pass
    ``master=None`` with an external conf and everything here still applies.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "gzip")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
