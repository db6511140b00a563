"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual query registry lives in ``mempool_dumpster_spark.plans.registry``;
each entry implements operators from SURVEY.md §2 (docstrings there carry the
operator IDs and reference file:line citations).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: Q1-style pricing summary
    (scan → filter → partial+final hash aggregate)."""
    from mempool_dumpster_spark.plans.registry import all_queries

    return all_queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from mempool_dumpster_spark.plans.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (pre-registered
    views: region nation customer supplier part orders lineitem events
    documents embeddings). Queries without an entry here get the driver's
    weaker rows-only check."""
    from mempool_dumpster_spark.plans.registry import all_oracles

    return all_oracles()
