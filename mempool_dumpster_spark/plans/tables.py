"""Testdata table loader.

Reads the driver-generated parquet tables (TESTDATA.md) with schema-on-read
from the parquet footer (the schemas are fixed; no inference pass) and
registers each as a temp view so both the DataFrame and SQL surfaces work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects outright (PARQUET_TYPE_ILLEGAL). Detected from the footer
    so the workaround is generic; empty on any inspection failure."""
    try:
        import pyarrow.parquet as pq
        import pyarrow as pa

        schema = pq.read_schema(path)
        return [
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    except Exception:
        return []


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    out: dict[str, DataFrame] = {}
    for name in names or TABLES:
        path = f"{sf_dir}/{name}.parquet"
        ns_cols = _nanos_timestamp_cols(path)
        if ns_cols:
            # Read nanos as raw INT64 then truncate to micros — same floor
            # semantics as engines that narrow ns→µs natively.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        for c in ns_cols:
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
