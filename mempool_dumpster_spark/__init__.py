"""PySpark-native analytics engine with the query and data-processing
capabilities of flashbots/mempool-dumpster.

Built Spark-first: DataFrame/SQL plans on Catalyst, one Pandas UDF for RLP
decoding, Structured Streaming for the collector equivalent. See SURVEY.md
for the operator inventory this package implements.
"""

__version__ = "0.1.0"
