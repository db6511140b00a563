"""Testdata table loader.

Reads the driver-generated parquet tables (TESTDATA.md) with schema-on-read
from the parquet footer (the schemas are fixed; no inference pass) and
registers each as a temp view so both the DataFrame and SQL surfaces work.
"""

from __future__ import annotations

import weakref

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

#: Per-session DataFrame handles — METADATA memoization only (r16, guide
#: §5: the driver should do almost no work). Re-creating a scan frame
#: costs two footer reads (pyarrow ns-col probe + the JVM schema read in
#: spark.read.parquet) plus a py4j round-trip per table, ~0.1 s each on
#: this box; a 6-table query paid ~0.6 s of its ~1.2 s total re-deriving
#: metadata that cannot change within a session. The memoized object is
#: the LOGICAL scan plan, not data: nothing is persisted, no .cache() is
#: involved, and every action on a returned frame re-reads the parquet
#: inputs (bench.py's clearCache() between timed runs is unaffected —
#: there is no cache entry to clear). This is exactly what registering a
#: catalog table once at session start does on a long-running deployment.
#:
#: Keyed by the SESSION OBJECT in a WeakValueDictionary-style nested map
#: (r17, r16 advice): the old (applicationId, path) key collided across
#: `spark.newSession()` siblings — same appId, separate temp-view
#: catalogs and separate DataFrame bindings — so a sibling session got a
#: false "view already bound" hit and its spark.sql failed with
#: view-not-found. A WeakKeyDictionary also bounds the memo's lifetime to
#: the sessions that exist (the old dict grew per (appId, path) forever).
_SCAN_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)

#: Which path each view name is currently bound to IN THAT SESSION, so a
#: cache hit skips the ~10 ms py4j createOrReplaceTempView round-trip when
#: the binding is already correct, and re-points it when a session
#: alternates sf dirs (stale views are never observable).
_VIEW_BOUND: "weakref.WeakKeyDictionary[SparkSession, dict[str, str]]" = (
    weakref.WeakKeyDictionary()
)


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


def _size_bytes(path: str) -> int:
    """On-disk bytes of a table path (file, or sum of a directory's files)."""
    import os

    if os.path.isdir(path):
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
        return total
    try:
        return os.path.getsize(path)
    except OSError:
        return 0


def _parse_size_bytes(value: str, default: int = 134217728) -> int:
    """Spark byte-size conf parser (the subset Spark's JavaUtils
    accepts): a bare number is bytes; `k/m/g/t` suffixes (optionally
    followed by `b`), case-insensitive, scale by 1024-powers. The old
    `int(value.rstrip('b'))` hard-crashed on a legitimate unit-suffixed
    setting like '128MB' or '64m' (r16 advice); unparseable values fall
    back to `default` (Spark's own 128 MB) rather than raising — the
    hint is an optimization, never worth failing a query over."""
    try:
        s = value.strip().lower()
        if s.endswith("b"):
            s = s[:-1]
        mult = 1
        if s and s[-1] in "kmgt":
            mult = 1024 ** (1 + "kmgt".index(s[-1]))
            s = s[:-1]
        return int(s) * mult
    except (ValueError, AttributeError):
        return default


def scan_spread_hint(df_or_spark, sf_dir: str, name: str, *keys: str) -> str:
    """REPARTITION hint for a scan whose INPUT LAYOUT caps parallelism
    below the session's cores — and ONLY then (r16, guide §2.5 "input
    skew: one huge unsplittable file … repartition immediately after the
    read").

    The driver testdata tables are one parquet file with ONE row group, so
    every scan stage is a single task no matter how many cores the session
    has: a query whose heavy per-row work (decimal aggregation, HOF dot
    products) sits between the scan and its first exchange runs that work
    single-threaded. When the estimated split count
    (bytes / spark.sql.files.maxPartitionBytes) is below the core count,
    return ``/*+ REPARTITION(par, keys) */`` to fan the compute out.
    Hash, NOT round-robin: a keyless repartition pays
    sortBeforeRepartition on every input row (SPARK-23207), measured
    +0.15 s on a 600 k-row spread — ``keys`` should be a high-cardinality
    column (any column; correctness is unaffected by placement).

    At production scale the condition is false — a table bigger than
    cores × maxPartitionBytes already scans wide — so the empty string is
    returned and the extra exchange NEVER appears in a plan at 100 TB; it
    is strictly the small-input/local-mode fix, and it scales with the
    session's actual core count (SPARK_GRAFT_CPUS), not a constant.
    (This replaced the r16 DataFrame-side `spread_scan` when the callers
    moved to spark.sql-constructed plans.)

    Decode parallelism is ROW-GROUP-bounded, not byte-split-bounded
    (r17): a parquet file is decodable only at row-group granularity,
    so a multi-group file parallelizes its decode even when the
    byte-split estimate reads 1 (the 10× stress corpus is exactly this
    after GENVER 3 — 75 groups in an 84 MB lineitem), and there the
    REPARTITION hint would shuffle millions of rows to fix a problem
    the layout no longer has (measured +0.5 s on sf1 q1). The estimate
    is therefore max(byte splits, footer row-group count), falling back
    to bytes alone if the footer probe fails."""
    spark = getattr(df_or_spark, "sparkSession", df_or_spark)
    par = spark.sparkContext.defaultParallelism
    max_split = _parse_size_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    )
    path = f"{sf_dir}/{name}.parquet"
    est_splits = max(1, _size_bytes(path) // max_split)
    try:
        import pyarrow.parquet as pq

        est_splits = max(est_splits, pq.ParquetFile(path).num_row_groups)
    except Exception:
        pass
    if est_splits >= par:
        return ""
    return f"/*+ REPARTITION({par}, {', '.join(keys)}) */"


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    out: dict[str, DataFrame] = {}
    scans = _SCAN_CACHE.setdefault(spark, {})
    views = _VIEW_BOUND.setdefault(spark, {})
    for name in names or TABLES:
        path = f"{sf_dir}/{name}.parquet"
        cached = scans.get(path)
        if cached is not None:
            if views.get(name) != path:
                cached.createOrReplaceTempView(name)
                views[name] = path
            out[name] = cached
            continue
        ns_cols = _nanos_timestamp_cols(path)
        if ns_cols:
            # Read nanos as raw INT64 then truncate to micros — same floor
            # semantics as engines that narrow ns→µs natively.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        for c in ns_cols:
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        df.createOrReplaceTempView(name)
        scans[path] = df
        views[name] = path
        out[name] = df
    return out
