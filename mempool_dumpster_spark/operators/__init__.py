from mempool_dumpster_spark.operators.asof import asof_join
from mempool_dumpster_spark.operators.dedup import (
    dedup_keep_earliest,
    dedup_keep_earliest_row,
    dedup_min_timestamp,
)
from mempool_dumpster_spark.operators.inclusion_rpc import (
    MockRPCClient,
    PartitionBlockCache,
    rpc_inclusion_enrich,
)
from mempool_dumpster_spark.operators.joins import (
    anti_join_blacklist,
    attach_sources,
    inclusion_enrich,
)
from mempool_dumpster_spark.operators.sessions import (
    session_stats,
    session_stats_window,
    sessionize,
)
from mempool_dumpster_spark.operators.skew import salted_topk

__all__ = [
    "asof_join",
    "dedup_keep_earliest",
    "dedup_keep_earliest_row",
    "dedup_min_timestamp",
    "anti_join_blacklist",
    "attach_sources",
    "inclusion_enrich",
    "rpc_inclusion_enrich",
    "MockRPCClient",
    "PartitionBlockCache",
    "salted_topk",
    "session_stats",
    "session_stats_window",
    "sessionize",
]
