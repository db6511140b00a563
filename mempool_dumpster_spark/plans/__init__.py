from mempool_dumpster_spark.plans.tables import TABLES, load_tables

__all__ = ["TABLES", "load_tables"]
