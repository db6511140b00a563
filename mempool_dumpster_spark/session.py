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


#: Spark's scale-safe streaming state backend. The default in-memory
#: (HDFSBackedStateStoreProvider) keeps every state row on the executor
#: heap — fine for the measured 45k-row dedup working set, but the
#: stream-stream inclusion join peaked at 314.8 MB of heap state for a
#: 1 M-receipt day (STREAM_STRESS_r13), which extrapolates to ~31 GB at
#: a 100× day. RocksDB keeps state off-heap/on-disk with the same
#: exactly-once checkpoint contract (reference behavior: the collector's
#: 30-min TTL map at collector/tx_processor.go:501-508 is heap-bounded
#: only because Go's map IS the store — Spark's scale answer is this
#: provider). Select per session via state_store="rocksdb" below or
#: SPARK_GRAFT_STATE_STORE=rocksdb; parity evidence (rate + state rows)
#: lives in STREAM_STRESS_r14.json's state_store sections.
ROCKSDB_STATE_STORE_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def get_spark(
    app_name: str = "mempool-dumpster-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    state_store: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    In tests and bench this runs ``local[N]``; on a cluster, pass
    ``master=None`` with an external conf and everything here still applies.
    ``state_store`` selects the streaming state backend: "rocksdb" (or
    env SPARK_GRAFT_STATE_STORE=rocksdb) configures the RocksDB
    provider; None/"memory" keeps Spark's default in-memory provider.
    NOTE the provider is fixed per checkpoint — restarting an existing
    query under a different provider is a user error Spark rejects.
    """
    cpus = default_parallelism()
    state_store = state_store or os.environ.get("SPARK_GRAFT_STATE_STORE")
    if state_store and state_store not in ("memory", "rocksdb"):
        raise ValueError(f"unknown state_store {state_store!r}")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        # Scan-split sizing (r16, guide §6): the 4 MB default
        # openCostInBytes is calibrated for high-seek-latency storage; on
        # the NVMe/object-store targets this engine runs on, opening a
        # file costs ~1 ms (≈512 KB at 500 MB/s), and the 4 MB charge was
        # flooring small-file scans at 2-3 tasks regardless of core count
        # (q1's 600 k-row decode ran 3-wide on 32 cores; measured
        # 0.53 → 0.39 s with these two). minPartitionNum is the documented
        # floor on scan parallelism, sized to the session's cores. At
        # 100 TB both are no-ops: split size is governed by
        # maxPartitionBytes once files exceed it. Parameterized via env so
        # a deployment on slow disks can restore the defaults.
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_GRAFT_OPEN_COST_BYTES", "524288"),
        )
        .config("spark.sql.files.minPartitionNum", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "gzip")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if state_store == "rocksdb":
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            ROCKSDB_STATE_STORE_PROVIDER,
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
