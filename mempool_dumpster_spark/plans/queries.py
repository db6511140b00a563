"""Core query surface: the mempool-dumpster operator inventory (SURVEY.md §2)
re-expressed over the driver's testdata tables, plus the TPC-H-style
analytical queries that exercise the same join/agg machinery at scale.

Mapping of the reference's data model onto `events` (TESTDATA.md):
    events.user_id    ≈ tx hash        (the dedup / join key)
    events.event_type ≈ source         (who saw the tx)
    events.ts         ≈ timestamp_ms   (receive time)
so e.g. `dedup_earliest` is A1 (reference common/txsfile.go:121-129),
`sources_attach` is J1+O2 (reference cmd/merge/transactions.go:111-136), etc.

Each query notes the SURVEY §2 operator IDs it implements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mempool_dumpster_spark.operators.dedup import (
    dedup_keep_earliest_row,
    dedup_min_timestamp,
)
from mempool_dumpster_spark.plans.registry import register
from mempool_dumpster_spark.plans.tables import load_tables, scan_spread_hint

# ---------------------------------------------------------------------------
# Mempool-core operator analogs on `events`
# ---------------------------------------------------------------------------


@register(
    "dedup_earliest",
    overflow=True,  # r9 slot rotation: redundant with a retained sibling; still oracle-checked via selfcheck
    oracle="""
    SELECT user_id,
           event_id   AS first_event_id,
           ts         AS first_ts,
           event_type AS first_event_type,
           value      AS first_value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="A1: dedup by key keeping the earliest row (ref common/txsfile.go:121-129). "
    "One shuffle on the key; window variant keeps the whole earliest row.",
)
def dedup_earliest(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ["events"])
    # SQL form of dedup_keep_earliest_row(events, user_id, [ts, event_id])
    # (r16 construction cut; same WindowGroupLimit-pruned window plan —
    # the operator module keeps the canonical DataFrame implementation
    # for the merge pipeline).
    return spark.sql("""
      SELECT user_id, event_id AS first_event_id, ts AS first_ts,
             event_type AS first_event_type, value AS first_value
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id ORDER BY ts, event_id) AS __rn
        FROM events
      ) WHERE __rn = 1
    """)


@register(
    "sourcelog_dedup",
    oracle="""
    SELECT user_id, event_type, min(ts) AS first_ts
    FROM events GROUP BY user_id, event_type
    """,
    doc="A2: sourcelog dedup — per (hash, source) keep min timestamp "
    "(ref common/sourcelog.go:52-62). Pure hash agg, map-side combined.",
)
def sourcelog_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir, ["events"])["events"]
    deduped = dedup_min_timestamp(
        events.select("user_id", "event_type", "ts"),
        keys=("user_id", "event_type"),
        ts_col="ts",
    )
    return deduped.select("user_id", "event_type", F.col("ts").alias("first_ts"))


@register(
    "trash_dedup",
    overflow=True,  # r9 slot rotation: redundant with a retained sibling; still oracle-checked via selfcheck
    oracle="""
    WITH t AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN value < 1 THEN 'signature-error'
                  WHEN value > 90 THEN 'extremely large gasFeeCap'
                  ELSE 'chainId not set' END AS reason,
             props AS notes
      FROM events
    )
    SELECT user_id, event_type, ts AS first_ts, reason, notes
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id, event_type ORDER BY ts, event_id
      ) AS rn FROM t
    ) WHERE rn = 1
    """,
    doc="A3+F4: trash-pipeline dedup — keep the EARLIEST whole row per "
    "(hash, source) including its validation-reason and notes columns "
    "(ref common/trashfile.go:90-99; reason strings from "
    "collector/tx_processor.go:327-353). The events analog routes rows to "
    "the reference's exact reason strings, then applies the window-variant "
    "dedup (the whole-row form A1's agg variant can't express when payload "
    "columns are not functionally dependent on the key).",
)
def trash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.functions.ethtx import (
        REASON_CHAINID_NOT_SET,
        REASON_GASFEE_TOO_BIG,
        REASON_SIGNATURE_ERROR,
    )

    events = load_tables(spark, sf_dir, ["events"])["events"]
    trash = events.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(F.col("value") < 1, REASON_SIGNATURE_ERROR)
        .when(F.col("value") > 90, REASON_GASFEE_TOO_BIG)
        .otherwise(REASON_CHAINID_NOT_SET)
        .alias("reason"),
        F.col("props").alias("notes"),
    )
    first = dedup_keep_earliest_row(
        trash, key=["user_id", "event_type"], order=["ts", "event_id"]
    )
    return first.select(
        "user_id", "event_type", F.col("ts").alias("first_ts"), "reason", "notes"
    )


@register(
    "sources_attach",
    oracle="""
    WITH fs AS (
      SELECT user_id, event_type, min(ts) AS first_ts
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sources,
           string_agg(event_type, ' ' ORDER BY first_ts, event_type) AS sources_str
    FROM fs GROUP BY user_id
    """,
    doc="J1+O2: per-key source array ordered by first-seen timestamp, "
    "space-joined like the reference CSV (ref cmd/merge/transactions.go:111-136, "
    "common/txsummary.go:104). Two-level agg; shuffle ∝ distinct keys.",
)
def sources_attach(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ["events"])
    # pre_partition (r16): one exchange of raw events instead of two
    # aggregated exchanges — events carry ~66 rows per key here but only
    # ~13 distinct (key, source) pairs fewer, and the removed Exchange's
    # fixed stage cost dominates at bench SF while raw-row bytes stay
    # within ~1 shuffle of the two-exchange form at any SF. SQL form of
    # sources_by_first_seen(pre_partition=cores) (r16 construction cut;
    # the operator module keeps the canonical DataFrame implementation
    # for the merge pipeline).
    par = spark.sparkContext.defaultParallelism
    return spark.sql(f"""
      SELECT user_id,
             CAST(size(sources) AS BIGINT) AS n_sources,
             array_join(sources, ' ') AS sources_str
      FROM (
        SELECT user_id,
               transform(sort_array(collect_list(struct(__first_ts, event_type))),
                         s -> s.event_type) AS sources
        FROM (
          SELECT user_id, event_type, min(ts) AS __first_ts
          FROM (SELECT /*+ REPARTITION({par}, user_id) */
                       user_id, event_type, ts FROM events)
          GROUP BY user_id, event_type
        )
        GROUP BY user_id
      )
    """)


@register(
    "first_source_counts",
    oracle="""
    SELECT event_type AS source, CAST(count(*) AS BIGINT) AS n_first
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    GROUP BY event_type
    """,
    doc="ST4/A15 (batch form): which source delivered each key first, counted "
    "per source (ref collector/tx_processor.go:240-247, sourcemetrics.go:29-55).",
)
def first_source_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ["events"])
    # SQL form of dedup_keep_earliest_row + count per source (r16
    # construction cut; same WindowGroupLimit-pruned window plan).
    return spark.sql("""
      SELECT event_type AS source, count(*) AS n_first
      FROM (
        SELECT event_type, row_number() OVER (
          PARTITION BY user_id ORDER BY ts, event_id) AS __rn
        FROM events
      ) WHERE __rn = 1
      GROUP BY event_type
    """)


@register(
    "exclusive_orderflow",
    oracle="""
    WITH ud AS (
      SELECT user_id, date_trunc('day', ts) AS d,
             min(event_type) AS et, count(DISTINCT event_type) AS nt
      FROM events GROUP BY user_id, date_trunc('day', ts)
    )
    SELECT et AS source, CAST(count(*) AS BIGINT) AS n_exclusive
    FROM ud WHERE nt = 1 GROUP BY et
    """,
    doc="A12: exclusive orderflow — keys seen by exactly one source within a "
    "day, counted per source (ref common/analyzer.go:109-122; README.md:125).",
)
def exclusive_orderflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir, ["events"])["events"]
    ud = events.groupBy("user_id", F.date_trunc("day", "ts").alias("d")).agg(
        F.min("event_type").alias("et"),
        F.countDistinct("event_type").alias("nt"),
    )
    return (
        ud.filter(F.col("nt") == 1)
        .groupBy(F.col("et").alias("source"))
        .agg(F.count("*").alias("n_exclusive"))
    )


@register(
    "included_split",
    oracle="""
    SELECT (value > 250.0) AS included,
           CAST(count(*) AS BIGINT) AS n,
           floor(count(*) * 1000.0 / sum(count(*)) OVER ()) / 10 AS pct_floor1
    FROM events GROUP BY (value > 250.0)
    """,
    doc="A7+A17+P10: split on a derived boolean flag with floor-rounded "
    "percentage — never rounds up, 99.97→99.9 (ref common/analyzer.go:87-91, "
    "common/utils.go:97-122).",
)
def included_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir, ["events"])["events"]
    grouped = events.groupBy((F.col("value") > 250.0).alias("included")).agg(
        F.count("*").alias("n")
    )
    total = Window.partitionBy()
    return grouped.select(
        "included",
        "n",
        (F.floor(F.col("n") * 1000.0 / F.sum("n").over(total)) / 10).alias(
            "pct_floor1"
        ),
    )


@register(
    "per_source_counts",
    oracle="""
    SELECT event_type AS source,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           min(ts) AS first_ts,
           max(ts) AS last_ts,
           CAST(count(*) FILTER (WHERE value > 250.0) AS BIGINT) AS n_high
    FROM events GROUP BY event_type
    """,
    doc="A10+A11+A13: per-source totals, distinct keys, first/last seen, and "
    "flag-split counts (ref common/analyzer.go:98-137).",
)
def per_source_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir, ["events"])["events"]
    return events.groupBy(F.col("event_type").alias("source")).agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.count(F.when(F.col("value") > 250.0, 1)).alias("n_high"),
    )


@register(
    "hourly_stats",
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket,
           event_type AS source,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
    doc="ST2+ST3 (batch form): tumbling time-bucketed per-source stats "
    "(ref collector/tx_processor.go:419-489, 492-552). Batch equivalent of "
    "the streaming windowed agg; bucket column prunes at 100 TB when the "
    "table is date-partitioned.",
)
def hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ["events"])
    # r16 (guide §2.4, same trade as sources_attach's pre_partition): the
    # countDistinct otherwise plans TWO exchanges — (bucket, source,
    # user_id) partials, then (bucket, source) finals. Hash-partitioning
    # the raw rows on (bucket, source) up front satisfies BOTH aggregates'
    # clustered distributions, so the plan carries exactly one Exchange of
    # raw (bucket, source, user_id) rows. That is fewer bytes than the
    # two-exchange form whenever the per-(bucket, source, user) duplicate
    # factor is below ~2 — true for receipt-shaped streams where a source
    # delivers a tx to a user-hour once or twice; revisit if duplication
    # dominates (the map-side combine of the two-exchange form wins then).
    par = spark.sparkContext.defaultParallelism
    return spark.sql(f"""
      SELECT bucket, source, count(*) AS n, count(DISTINCT user_id) AS n_users
      FROM (
        SELECT /*+ REPARTITION({par}, bucket, source) */ bucket, source, user_id
        FROM (SELECT date_trunc('hour', ts) AS bucket,
                     event_type AS source, user_id FROM events)
      )
      GROUP BY bucket, source
    """)


@register(
    "blacklist_anti",
    oracle="""
    SELECT event_type AS source,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events e
    WHERE NOT EXISTS (
      SELECT 1 FROM customer c WHERE c.c_acctbal < 0 AND c.c_custkey = e.user_id
    )
    GROUP BY event_type
    """,
    doc="F2+J2+U2: blacklist exclusion as a broadcast left-anti join "
    "(ref common/txsfile.go:115-119). The blacklist side is aggregated+distinct "
    "before broadcast, so the big side never shuffles.",
)
def blacklist_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events", "customer"])
    blacklist = (
        t["customer"]
        .filter(F.col("c_acctbal") < 0)
        .select(F.col("c_custkey").alias("user_id"))
        .distinct()
    )
    kept = t["events"].join(F.broadcast(blacklist), on="user_id", how="left_anti")
    return kept.groupBy(F.col("event_type").alias("source")).agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "point_lookup",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events WHERE user_id = 42 AND event_type = 'click'
    """,
    doc="F7: point-lookup WHERE clause of the documented query surface "
    "(README.md:110-117 `WHERE hash=...`). Predicate pushes down to the "
    "parquet scan (PushedFilters).",
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir, ["events"])["events"]
    return events.filter(
        (F.col("user_id") == 42) & (F.col("event_type") == "click")
    ).select("event_id", "ts", "user_id", "event_type", "value")


@register(
    "json_props_stats",
    oracle="""
    SELECT event_type AS source,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
    doc="§2.9 JSON surface: extract a typed field from a JSON payload column "
    "(the reference parses feed JSON at the ingestion edge, common/types.go:16-30).",
)
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir, ["events"])["events"]
    k = F.get_json_object("props", "$.k").cast("bigint")
    return events.groupBy(F.col("event_type").alias("source")).agg(
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.count("*").alias("n"),
    )


@register(
    "value_quantiles",
    oracle="""
    WITH o AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS cnt
      FROM events
    )
    SELECT event_type AS source,
           max(CASE WHEN rn = 1 + floor(0.5  * (cnt - 1)) THEN value END) AS p50,
           max(CASE WHEN rn = 1 + floor(0.9  * (cnt - 1)) THEN value END) AS p90,
           max(CASE WHEN rn = 1 + floor(0.99 * (cnt - 1)) THEN value END) AS p99,
           CAST(count(*) AS BIGINT) AS n
    FROM o GROUP BY event_type
    """,
    doc="A16: quantiles of a numeric column per group (README.md:134). "
    "Nearest-rank (discrete) selection of actual data values — deterministic "
    "across engines, unlike interpolated quantile_cont. At 100 TB switch to "
    "percentile_approx (one pass, mergeable sketches).",
)
def value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ["events"])
    # r16, two byte-level cuts with identical output (guide §2.3):
    # - the window orders by value ONLY — the oracle's event_id tiebreak
    #   permutes row numbers among EQUAL values, and the query emits the
    #   VALUE at fixed ranks, which is invariant under that permutation
    #   (the k-th smallest of a multiset does not depend on tie order).
    #   Dropping it narrows the sort key and prunes the event_id column
    #   from the scan entirely.
    # - the explicit repartition pins the window's exchange to the core
    #   count: same bytes, same hash partitioning the window itself would
    #   demand, but AQE can no longer coalesce the small post-shuffle
    #   stage down to 1-2 tasks and serialize the 5 per-group sorts
    #   (measured 0.39 → 0.28 s).
    # Built as one spark.sql call (r16): ~0.12 s of py4j Column
    # construction per invocation gone; same optimized plan. The D-suffixed
    # percentile literals keep Spark's DOUBLE arithmetic for the rank
    # position bit-identical to the F.lit() form this replaced.
    par = spark.sparkContext.defaultParallelism
    picks = ", ".join(
        f"max(CASE WHEN rn = 1 + floor({p}D * (cnt - 1)) THEN value END)"
        f" AS p{lbl}"
        for p, lbl in ((0.5, "50"), (0.9, "90"), (0.99, "99"))
    )
    return spark.sql(f"""
      SELECT event_type AS source, {picks}, count(*) AS n
      FROM (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY value)
                 AS rn,
               count(*) OVER (PARTITION BY event_type) AS cnt
        FROM (SELECT /*+ REPARTITION({par}, event_type) */ event_type, value
              FROM events)
      )
      GROUP BY event_type
    """)


@register(
    "value_quantiles_approx",
    oracle=None,  # sketch output has no SQL ground truth; tolerance-checked
    # against the exact nearest-rank entry in
    # tests/test_operators.py::test_value_quantiles_approx_tolerance
    doc="A16 at scale: the same per-group quantiles via percentile_approx — "
    "a one-pass mergeable sketch (Greenwald-Khanna style): map-side partial "
    "sketches merge in the shuffle, so NO per-group global sort and no "
    "5-reducer funnel (value_quantiles' two exact windows partition all "
    "rows by a ~5-value key — right for oracle parity, wrong at 100 TB). "
    "accuracy=10000 bounds rank error at n/10000 per group.",
)
def value_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir, ["events"])["events"]
    q = F.percentile_approx("value", [0.5, 0.9, 0.99], 10000)
    return (
        events.groupBy(F.col("event_type").alias("source"))
        .agg(q.alias("qs"), F.count("*").alias("n"))
        .select(
            "source",
            F.col("qs")[0].alias("p50"),
            F.col("qs")[1].alias("p90"),
            F.col("qs")[2].alias("p99"),
            "n",
        )
    )


# ---------------------------------------------------------------------------
# TPC-H-style analytical surface (the "12 README queries" machinery at scale:
# wide aggregation, multi-way joins, top-k with skewed keys)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Flagship: TPC-H Q1-style pricing summary — scan-heavy partial+final "
    "hash aggregate on low-cardinality keys; the shape of the reference "
    "analyzer (A6-A9). DECIMAL-exact arithmetic, final cast to DOUBLE.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ["lineitem"])
    # spread hint (r16): the 3 decimal sums are ~0.5 s of single-threaded
    # work over the one-split testdata scan (measured: scan+filter 0.21 s,
    # +decimal agg 0.72 s); hash-spreading on the high-cardinality orderkey
    # fans the partial aggregate over the cores (0.66 → 0.48 s) and is
    # EMPTY whenever the input already scans wide (scan_spread_hint doc).
    # Built as one spark.sql call (r16): ~0.1 s of py4j Column
    # construction per invocation gone; same optimized plan.
    spread = scan_spread_hint(spark, sf_dir, "lineitem", "l_orderkey")
    return spark.sql(f"""
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_base_price,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS sum_disc_price,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)
               AS avg_qty,
             count(*) AS count_order
      FROM (SELECT {spread} * FROM lineitem)
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
    """)


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-style: selective dim filter → 3-way join → top-k. The "
    "customer side is broadcast (filtered dim); ordering carries l_orderkey "
    "as tiebreaker so the top-10 set is deterministic.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    # Built as one spark.sql call (r16): ~0.15 s of py4j Column
    # construction per invocation gone; same optimized plan (broadcast
    # hint only on the filtered customer dim; the l⋈o strategy stays
    # planner-chosen, so it adapts at scale).
    return spark.sql("""
      SELECT l_orderkey, revenue, o_orderdate
      FROM (
        SELECT l.l_orderkey, o.o_orderdate,
               CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                 AS revenue
        FROM (SELECT l_orderkey, l_extendedprice, l_discount FROM lineitem
              WHERE l_shipdate > TIMESTAMP '1998-03-15 00:00:00') l
        JOIN (
          SELECT /*+ BROADCAST(c) */ o_orderkey, o_orderdate
          FROM (SELECT o_orderkey, o_custkey, o_orderdate FROM orders
                WHERE o_orderdate < TIMESTAMP '1998-03-15 00:00:00') o
          JOIN (SELECT c_custkey FROM customer
                WHERE c_mktsegment = 'BUILDING') c
            ON o.o_custkey = c.c_custkey
        ) o ON l.l_orderkey = o.o_orderkey
        GROUP BY l.l_orderkey, o.o_orderdate
      )
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10
    """)


@register(
    "q5_regional_revenue",
    oracle="""
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5-style: 6-way star join, small dims broadcast, fact-side "
    "shuffle only on the orders⋈lineitem equi-join; AQE handles skew.",
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(
        spark, sf_dir, ["region", "nation", "customer", "supplier", "orders", "lineitem"]
    )
    # Built as one spark.sql call (r16): ~0.2 s of py4j Column
    # construction per invocation gone. The join tree is FLAT on the
    # lineitem spine (r16): the old form nested the broadcasts four deep
    # (region → nation → customer → orders⋈customer), so AQE built them in
    # four SERIAL rounds before the probe could start — each round a
    # driver-coordinated job over a tiny frame. Here the orders slice and
    # the customer chain feed the spine independently: the only serial
    # chain left is region → nation → customer, and the orders-side scan
    # overlaps it (measured 0.70 → ~0.45 s; results identical — inner-join
    # reorder). Broadcast hints still sit only on the DIM sides (the same
    # set as before: customer-chain + supplier); the lineitem⋈orders
    # fact-fact join stays planner-chosen so it adapts to SMJ at scale.
    # Scale tradeoff, documented: the ASIA restriction now lands on the
    # spine AFTER the orders join instead of pre-filtering orders, so the
    # orders side of that join carries ~5× more rows at scale — it is the
    # SMALL side of the join (the lineitem side, which dominates shuffle
    # bytes, is unchanged), bounded at ~15% of the orders table.
    return spark.sql("""
      WITH np AS (
        SELECT /*+ BROADCAST(r) */ n_nationkey, n_name
        FROM nation JOIN (SELECT r_regionkey FROM region
                          WHERE r_name = 'ASIA') r
          ON n_regionkey = r_regionkey
      ),
      cp AS (
        SELECT /*+ BROADCAST(np) */ c_custkey, c_nationkey, n_name
        FROM customer JOIN np ON c_nationkey = n_nationkey
      ),
      sp AS (SELECT s_suppkey, s_nationkey FROM supplier)
      SELECT /*+ BROADCAST(cp, sp) */ n_name,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue
      FROM lineitem l
      JOIN (SELECT o_orderkey, o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00') od
        ON l.l_orderkey = od.o_orderkey
      JOIN cp ON od.o_custkey = cp.c_custkey
      JOIN sp ON sp.s_suppkey = l.l_suppkey
             AND sp.s_nationkey = cp.c_nationkey
      GROUP BY n_name
    """)


@register(
    "q4_late_orders",
    overflow=True,  # r9 slot rotation: redundant with a retained sibling; still oracle-checked via selfcheck
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4-style: EXISTS decorrelated to a left-semi join — orders "
    "with any line shipped >60 days after order date, counted per priority. "
    "The semi-join is an equi-join on l_orderkey with the date predicate as "
    "a join residual: one fact-side shuffle, no row amplification (semi "
    "output ≤ left input), and lineitem is pruned to two columns at scan. "
    "(The reference's WasIncludedBeforeReceived P12 is this same "
    "exists-with-inequality shape.)",
)
def q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("n_late"))


@register(
    "q6_forecast_revenue",
    # r10 late rotation: ceded its driver slot to docs_nb_classify — the
    # filtered-sum / pushed-filter surface stays driver-covered by
    # q1_pricing_summary, q12_shipping_priority_split and included_split,
    # and q6 stays oracle-checked every round via the selfcheck sweep.
    overflow=True,
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
    doc="TPC-H Q6-style: highly selective conjunctive filter + single global "
    "aggregate — THE predicate-pushdown showcase. All three predicates reach "
    "the parquet reader (PushedFilters) and only 4 columns are read; the "
    "aggregate is a one-row partial+final with no groupBy shuffle at all.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(18,2)")
            ).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q14_promo_revenue",
    overflow=True,  # r9 slot rotation: redundant with a retained sibling; still oracle-checked via selfcheck
    oracle="""
    SELECT CAST(sum(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
    doc="TPC-H Q14-style: conditional aggregation over a fact⋈dim join — "
    "promo share of one month's revenue. part is broadcast (dim never "
    "shuffles), the month filter prunes the fact scan, and the CASE rides "
    "the same DECIMAL-exact sum as the unconditional total (one pass, two "
    "aggregates).",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    p = t["part"].select("p_partkey", "p_type")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
            .cast("double").alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
    )


@register(
    "q13_order_distribution",
    oracle="""
    SELECT n_orders, CAST(count(*) AS BIGINT) AS n_custs
    FROM (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
      FROM customer c LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    ) t GROUP BY n_orders
    """,
    doc="TPC-H Q13-style: customer order-count distribution through a LEFT "
    "OUTER join whose predicate lives in the ON clause (filtering the "
    "orders side without dropping order-less customers — the semantic that "
    "separates outer-join-with-residual from join-then-filter). Two-level "
    "aggregate: per-customer count shuffles on c_custkey, then the tiny "
    "histogram re-aggregates on n_orders. count(o_orderkey) counts "
    "non-null matches only, so unmatched customers land in the 0 bucket.",
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    c = t["customer"].select("c_custkey")
    o = t["orders"].filter(F.col("o_orderpriority") != "5-LOW").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_custs"))


@register(
    "shipments_in_order_window",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders_hit
    FROM orders o JOIN lineitem l
      ON CAST(l.l_shipdate AS DATE)
         BETWEEN CAST(o.o_orderdate AS DATE)
             AND CAST(o.o_orderdate AS DATE) + 7
    GROUP BY o.o_orderpriority
    """,
    doc="Range join (operators.range_join): every lineitem shipped inside "
    "any order's first week, keyless point-in-interval matching — the "
    "θ-join shape Spark would otherwise execute as a nested-loop cartesian. "
    "The operator buckets ship-days at the interval width (8 days → ≤2 "
    "bucket replicas per order), equi-joins on the bucket, and applies the "
    "containment as a residual. Because the query only COUNTS pairs and "
    "the point side carries no payload beyond its day, the count is "
    "factorized: points collapse to a (day, multiplicity) histogram "
    "BEFORE the range join — ~2.4k distinct days regardless of corpus "
    "size — so the join touches |days| × orders instead of |lineitem| × "
    "orders, n_pairs = Σ multiplicity, and the ~2.9M matched pairs at "
    "sf0.01 (~290M at sf0.1) are never materialized. At 100 TB the "
    "histogram is still a few KB: the pre-aggregation is the difference "
    "between a bounded shuffle and a pair explosion. The DuckDB oracle "
    "runs the raw pairwise predicate natively (IEJoin), pinning the "
    "factorized plan to the unfactorized semantics.",
)
def shipments_in_order_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.operators.range_join import range_join

    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    epoch = F.lit("1970-01-01").cast("date")

    def days(col: str) -> F.Column:
        return F.datediff(F.col(col).cast("date"), epoch)

    day_hist = (
        t["lineitem"]
        .select(days("l_shipdate").alias("ship_day"))
        .groupBy("ship_day")
        .agg(F.count("*").alias("__mult"))
    )
    iv = t["orders"].select(
        "o_orderkey",
        "o_orderpriority",
        days("o_orderdate").alias("start_day"),
        (days("o_orderdate") + 7).alias("end_day"),
    )
    joined = range_join(day_hist, iv, "ship_day", "start_day", "end_day",
                        bucket_width=8)
    # inner join ⇒ every surviving o_orderkey matched ≥1 day, and an order
    # matches each day at most once ⇒ countDistinct degrades to count(*).
    per_order = joined.groupBy("o_orderkey", "o_orderpriority").agg(
        F.sum("__mult").alias("__n")
    )
    return per_order.groupBy("o_orderpriority").agg(
        F.sum("__n").cast("bigint").alias("n_pairs"),
        F.count("*").alias("n_orders_hit"),
    )


@register(
    "top_partkeys",
    oracle="""
    SELECT l_partkey, CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_partkey
    ORDER BY n DESC, l_partkey LIMIT 10
    """,
    doc="Top-k over a skewed key — the README.md:128 'top to-addresses' query "
    "shape. Partial agg shrinks the shuffle; deterministic tiebreak on the key.",
)
def top_partkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    return (
        li.groupBy("l_partkey")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("l_partkey"))
        .limit(10)
    )


@register(
    "events_type_topk",
    overflow=True,  # r9 slot rotation: redundant with a retained sibling; still oracle-checked via selfcheck
    oracle="""
    SELECT event_type, event_id, value, CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT event_type, event_id, value,
             row_number() OVER (
               PARTITION BY event_type ORDER BY value DESC, event_id) AS rank
      FROM events
    ) WHERE rank <= 5
    """,
    doc="Hot-key-safe top-k per key (operators.skew.salted_topk): two-phase "
    "ranking — partial top-k within (key, crc32-salt), final top-k over the "
    "≤ k×n_salt survivors. A plain window funnels every row of a hot key "
    "through one reducer; this is the form that survives a key holding 1% "
    "of a 100 TB table. Result is identical to the single-window oracle.",
)
def events_type_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.operators.skew import salted_topk

    events = load_tables(spark, sf_dir, ["events"])["events"]
    return salted_topk(
        events.select("event_type", "event_id", "value"),
        key_cols=["event_type"],
        order_col="value",
        k=5,
        tiebreak="event_id",
    ).select(
        "event_type", "event_id", "value", F.col("rank").cast("bigint").alias("rank")
    )


@register(
    "events_asof_click",
    oracle="""
    SELECT e.event_id, e.user_id,
           c.ts AS click_ts,
           c.event_id AS click_event_id,
           c.value AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON e.user_id = c.user_id AND e.ts >= c.ts
    """,
    doc="As-of join (operators.asof.asof_join): for every error event, the "
    "latest click by the same user at or before it — the nearest-earlier "
    "enrichment the reference's inclusion check is a special case of "
    "(cmd/merge/inclusioncheck.go:88-191). Spark has no ASOF JOIN; the "
    "union+window form used here is one shuffle on the key with zero row "
    "amplification (vs the |L|x|R|-per-key range-join naive plan). The "
    "oracle is DuckDB's native ASOF LEFT JOIN.",
)
def events_asof_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.operators.asof import asof_join

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    errors = ev.filter(F.col("event_type") == "error")
    clicks = ev.filter(F.col("event_type") == "click")
    out = asof_join(
        errors,
        clicks,
        on=["user_id"],
        right_cols=["event_id", "value"],
        suffix="_click",
        right_tiebreak="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_ts_click").alias("click_ts"),
        F.col("event_id_click").alias("click_event_id"),
        F.col("value_click").alias("click_value"),
    )


@register(
    "events_sessions",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS boundary
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessioned AS (
      SELECT user_id, ts,
             sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end,
           (epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0 AS duration_s
    FROM sessioned GROUP BY user_id, session_seq
    """,
    doc="Gap-based sessionization (operators.sessions.session_stats): a new "
    "session per user after 30 minutes of silence; one row per session with "
    "count/start/end/duration. lag-flag + running-sum over a single "
    "key-shuffle — the batch form of Structured Streaming's "
    "session_window(), and the data-dependent sibling of the reference's "
    "fixed hourly buckets (collector/output.go date=/hour= partitions). "
    "Integer-microsecond gap and duration math is bit-exact across engines.",
)
def events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.operators.sessions import session_stats

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return session_stats(
        ev, key_cols=["user_id"], ts_col="ts", gap_seconds=1800,
        tiebreak="event_id",
    ).select(
        "user_id",
        F.col("session_seq").cast("bigint").alias("session_seq"),
        "n_events",
        "session_start",
        "session_end",
        "duration_s",
    )


@register(
    "events_cohort_retention",
    overflow=True,
    oracle="""
    WITH acts AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    firsts AS (
      SELECT user_id, min(day) AS cohort_day FROM acts GROUP BY user_id
    ),
    sizes AS (
      SELECT cohort_day, count(*) AS cohort_size FROM firsts GROUP BY cohort_day
    )
    SELECT f.cohort_day,
           CAST(datediff('day', f.cohort_day, a.day) AS BIGINT) AS day_offset,
           CAST(count(*) AS BIGINT) AS n_active,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           CAST(count(*) AS DOUBLE) / s.cohort_size AS retention
    FROM acts a
    JOIN firsts f USING (user_id)
    JOIN sizes s ON s.cohort_day = f.cohort_day
    GROUP BY f.cohort_day, day_offset, s.cohort_size
    """,
    doc="Cohort retention matrix: users are cohorted by first-active date "
    "and each (cohort_day, day_offset) cell counts how many came back, "
    "with retention as a fraction of cohort size — the canonical product-"
    "analytics rollup (the reference has no cohort surface; this extends "
    "its daily stats family, common/analyzer.go, to a self-derived "
    "dimension). Scale shape: the (user, day) distinct and the per-user "
    "min() both shuffle on user_id — AQE-coalesced, and the cohort join "
    "is a user_id equi-join against the already-clustered activity set; "
    "cohort sizes are a tiny broadcast (≤ |days| rows). Since activity is "
    "pre-deduped per (user, day), the cell count is count(*), not "
    "count(DISTINCT) — no second distinct shuffle. retention divides two "
    "exact BIGINTs, so the DOUBLE is deterministic across engines.",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    acts = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    firsts = acts.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    sizes = firsts.groupBy("cohort_day").agg(
        F.count("*").cast("bigint").alias("cohort_size")
    )
    return (
        acts.join(firsts, "user_id")
        .join(F.broadcast(sizes), "cohort_day")
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("bigint").alias("day_offset"),
            "cohort_size",
        )
        .agg(F.count("*").cast("bigint").alias("n_active"))
        .select(
            "cohort_day",
            "day_offset",
            "n_active",
            "cohort_size",
            (F.col("n_active").cast("double") / F.col("cohort_size")).alias(
                "retention"
            ),
        )
    )


@register(
    "events_transition_matrix",
    overflow=True,
    oracle="""
    WITH nxt AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events
    ),
    c AS (
      SELECT from_type, to_type, count(*) AS n
      FROM nxt WHERE to_type IS NOT NULL GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_type)
                                    AS BIGINT) AS prob
    FROM c
    """,
    doc="Markov transition matrix over per-user event sequences: lead() "
    "pairs each event with the user's next event, and each (from_type, "
    "to_type) cell carries the count plus the row-normalized transition "
    "probability — the behavioral next-step model behind funnel and "
    "session analysis (extends the reference's per-source counters, "
    "common/analyzer.go, to sequence structure). Scale shape: ONE shuffle "
    "on user_id for the lead window (users are independent, so the window "
    "never sees cross-partition state), then the pair aggregate collapses "
    "to ≤ |types|² rows before the row-normalizing window runs on a "
    "trivially small frame. prob divides exact BIGINTs into a DOUBLE — "
    "deterministic across engines.",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    row_total = F.sum("n").over(Window.partitionBy("from_type"))
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / row_total).alias("prob"),
    )


@register(
    "events_ohlc",
    overflow=True,
    oracle="""
    SELECT event_type,
           CAST(epoch_us(ts) // 21600000000 AS BIGINT) AS bucket,
           arg_min(value, epoch_us(ts)) AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, epoch_us(ts)) AS close,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume
    FROM events
    GROUP BY event_type, bucket
    """,
    doc="OHLC bar resample: per (event_type, 6-hour bucket) the opening "
    "value (earliest event), high, low, closing value (latest event), "
    "count, and total volume — the canonical timeseries downsample, and "
    "the registry's only use of the argmin/argmax aggregate family "
    "(min_by/max_by). Unlike the window-function first/last pattern "
    "(first_source_counts), min_by carries one (value, key) pair of "
    "state per group through a map-side partial aggregate — ONE shuffle "
    "of |groups| rows and no sort, the 100 TB shape for 'first/last "
    "per bucket' when the full row order isn't needed. Determinism: ts "
    "is globally unique in the events table (checked at sf0.001/0.01/"
    "0.1), so the argmin is tie-free; the 6-hour bucket is exact "
    "integer division over epoch-µs (epoch_us handles TIMESTAMP_NTZ "
    "identically in both engines); volume sums DECIMAL(18,2) before the "
    "DOUBLE cast per the cross-engine float rule.",
)
def events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.functions.scalars import epoch_us

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    us = epoch_us(F.col("ts"))
    return (
        ev.groupBy(
            "event_type",
            # (us - us % d) / d, not us / d: the numerator is an exact
            # multiple of d, so the double division is exactly the integer
            # quotient — plain us / d could truncate to bucket-1 at an
            # exact boundary if the double quotient rounds just below it.
            ((us - us % F.lit(21_600_000_000)) / F.lit(21_600_000_000))
            .cast("bigint")
            .alias("bucket"),
        )
        .agg(
            F.min_by("value", us).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", us).alias("close"),
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("volume"),
        )
    )


@register(
    "events_distinct_users",
    overflow=True,  # r9 slot rotation: redundant with a retained sibling; still oracle-checked via selfcheck
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type
    """,
    doc="Exact per-type distinct-user cardinality (A14-family): "
    "count(DISTINCT) expands to a two-phase partial-distinct aggregate — "
    "the shuffle carries distinct (type, user) pairs, not events. The "
    "sketch twin below is the 100 TB path when exactness isn't required.",
)
def events_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


@register(
    "events_distinct_users_approx",
    oracle=None,  # HLL++ estimate — no SQL ground truth; tolerance-gated:
    # tests/test_operators.py::test_distinct_users_approx_tolerance
    doc="HyperLogLog++ sketch of per-type distinct users "
    "(approx_count_distinct, rsd=0.02): constant state per group instead "
    "of a distinct-pair shuffle — at 100 TB the exact form shuffles "
    "|distinct pairs| rows while this ships one ~kB sketch per partition "
    "per group and merges. Estimates asserted within 3×rsd of the exact "
    "twin on the driver corpus.",
)
def events_distinct_users_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("n_users_approx"),
        F.count("*").alias("n_events"),
    )


@register(
    "events_daily_rollup",
    overflow=True,  # r9 slot rotation: redundant with a retained sibling; still oracle-checked via selfcheck
    oracle="""
    SELECT event_type,
           CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           max(value) AS max_value,
           CAST(GROUPING(event_type) * 2
                + GROUPING(CAST(CAST(ts AS DATE) AS VARCHAR)) AS BIGINT) AS lvl
    FROM events
    GROUP BY ROLLUP(event_type, CAST(CAST(ts AS DATE) AS VARCHAR))
    """,
    doc="Hierarchical rollup (the hypertable-rollup shape): per "
    "(type, day) cells plus per-type subtotals plus a grand total in one "
    "pass — GROUP BY ROLLUP, with grouping_id exposed as `lvl` so subtotal "
    "rows are unambiguous even if a group key were genuinely NULL. Spark "
    "expands the rollup (Expand ×3) BELOW a partial hash aggregate, so the "
    "shuffle carries pre-combined cells, not ×3 input rows; aggregates are "
    "all exact integers / max (no fp accumulation) for cross-engine "
    "hashing.",
)
def events_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    base = ev.select(
        "event_type",
        F.to_date("ts").cast("string").alias("day"),
        "user_id",
        "value",
    )
    return base.rollup("event_type", "day").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.max("value").alias("max_value"),
        (F.grouping("event_type") * 2 + F.grouping("day"))
        .cast("bigint")
        .alias("lvl"),
    )


@register(
    "events_type_day_cube",
    oracle="""
    SELECT event_type,
           CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           CAST(count(*) AS BIGINT) AS n,
           max(value) AS max_value,
           CAST(GROUPING(event_type) * 2
                + GROUPING(CAST(CAST(ts AS DATE) AS VARCHAR)) AS BIGINT) AS lvl
    FROM events
    GROUP BY CUBE(event_type, CAST(CAST(ts AS DATE) AS VARCHAR))
    """,
    doc="Full-cube marginals (§2.8 companion to events_daily_rollup): the "
    "CUBE adds the day-only marginal (lvl=2) the rollup hierarchy lacks — "
    "the shape OLAP dashboards ask for when either dimension can be the "
    "drill axis. Spark expands ×4 BELOW a partial hash aggregate, so the "
    "shuffle carries pre-combined cells; grouping_id disambiguates "
    "subtotal rows from genuinely-NULL keys. All aggregates are exact "
    "(count / max) for cross-engine hashing.",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
)
def events_type_day_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    base = ev.select(
        "event_type", F.to_date("ts").cast("string").alias("day"), "value"
    )
    return base.cube("event_type", "day").agg(
        F.count("*").alias("n"),
        F.max("value").alias("max_value"),
        (F.grouping("event_type") * 2 + F.grouping("day"))
        .cast("bigint")
        .alias("lvl"),
    )


@register(
    "q17_small_qty_revenue",
    oracle="""
    SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM (
      SELECT l.l_extendedprice,
             5 * l.l_quantity * count(*) OVER (PARTITION BY l.l_partkey) AS lhs,
             sum(l.l_quantity)  OVER (PARTITION BY l.l_partkey)          AS rhs
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#13'
    ) WHERE lhs < rhs
    """,
    doc="TPC-H Q17-style: revenue lost to small-quantity orders of one "
    "brand's parts. The canonical form is a correlated scalar subquery "
    "(avg qty per part); re-planned here as ONE window pass over the "
    "brand-filtered fact — no self-join, single shuffle on l_partkey. The "
    "threshold test `qty < 0.2*avg(qty)` is algebraically rewritten to "
    "`5*qty*count < sum(qty)` so both engines compare exact integers "
    "instead of a float division whose last bit could flip borderline "
    "rows. part is broadcast into the fact scan; at 100 TB the window "
    "shuffle carries only the brand's share of the fact.",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    p = t["part"].filter(F.col("p_brand") == "Brand#13").select("p_partkey")
    li = t["lineitem"].select("l_partkey", "l_quantity", "l_extendedprice")
    w = Window.partitionBy("l_partkey")
    flagged = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("__lhs", F.lit(5) * F.col("l_quantity") * F.count("*").over(w))
        .withColumn("__rhs", F.sum("l_quantity").over(w))
        .filter(F.col("__lhs") < F.col("__rhs"))
    )
    return flagged.agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            / F.lit(7.0)
        )
        .cast("double")
        .alias("avg_yearly"),
        F.count("*").alias("n_lines"),
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(t.total_qty AS DOUBLE) AS total_qty
    FROM (
      SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    ) t
    JOIN orders o   ON o.o_orderkey = t.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18-style: large-volume orders (the IN-subquery-with-HAVING "
    "shape). The qualifying set is computed ONCE as a per-orderkey "
    "aggregate (map-side partial combine; >300 keeps a handful of keys), "
    "then joined to orders/customer — after the filter the qualifying "
    "side is tiny, so AQE converts both probe joins to broadcasts at "
    "runtime. Sort keys include o_orderkey so the LIMIT cut is total and "
    "engine-independent. l_quantity is integer-valued: sums are exact in "
    "fp on both engines.",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "customer"])
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "q16_brand_suppliers",
    oracle="""
    SELECT p.p_brand,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand NOT IN ('Brand#45', 'Brand#13')
      AND p.p_size >= 10
    GROUP BY p.p_brand
    """,
    doc="TPC-H Q16-style: supplier diversity per brand — distinct-count "
    "aggregation behind a broadcast dim join with a NOT IN exclusion list "
    "(the reference analog is the per-source distinct-hash counting in "
    "common/analyzer.go). The exclusion + size predicates prune the dim "
    "BEFORE broadcast; count(DISTINCT) expands to a two-level aggregate "
    "(dedup on (brand, suppkey), then count) — both levels partial-agg, "
    "shuffle bounded by brand x supplier cardinality, not fact rows.",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
)
def q16_brand_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    p = (
        t["part"]
        .filter(
            ~F.col("p_brand").isin("Brand#45", "Brand#13")
            & (F.col("p_size") >= 10)
        )
        .select("p_partkey", "p_brand")
    )
    li = t["lineitem"].select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "events_asof_next_error",
    oracle="""
    SELECT c.event_id, c.user_id,
           e.ts AS err_ts,
           e.event_id AS err_event_id
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON c.user_id = e.user_id AND c.ts <= e.ts
    """,
    doc="FORWARD as-of join (operators.asof.asof_join direction='forward'): "
    "for every click, the NEXT error by the same user at or after it — "
    "time-to-failure enrichment, the mirror of events_asof_click. Same "
    "union+window single-shuffle plan with the frame flipped to "
    "(current, unbounded following) and first() instead of last(). The "
    "oracle is DuckDB's native ASOF LEFT JOIN with the inequality "
    "reversed.",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
)
def events_asof_next_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.operators.asof import asof_join

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    clicks = ev.filter(F.col("event_type") == "click")
    errors = ev.filter(F.col("event_type") == "error")
    out = asof_join(
        clicks,
        errors,
        on=["user_id"],
        right_cols=["event_id"],
        suffix="_err",
        right_tiebreak="event_id",
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_ts_err").alias("err_ts"),
        F.col("event_id_err").alias("err_event_id"),
    )


@register(
    "events_value_ranks",
    oracle="""
    SELECT event_id, event_type,
           percent_rank() OVER w                      AS pct_rank,
           CAST(ntile(4) OVER w AS BIGINT)            AS quartile,
           cume_dist() OVER w                         AS cume,
           CAST(rank() OVER w AS BIGINT)              AS rnk,
           CAST(dense_rank() OVER w AS BIGINT)        AS drnk
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
    doc="Ranking-window surface (SURVEY §2.8): percent_rank / ntile / "
    "cume_dist / rank / dense_rank in one window pass per event type. The "
    "ordering carries an event_id tiebreak so every rank function is a "
    "total deterministic function of the data (percent_rank/cume_dist "
    "round to 6dp for cross-engine float text parity). One shuffle on the "
    "partition key; all five functions share a single sort.",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
)
def events_value_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        F.percent_rank().over(w).alias("pct_rank"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.cume_dist().over(w).alias("cume"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
    )


@register(
    "events_daily_pivot",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           CAST(count(*) FILTER (WHERE event_type = 'click')    AS BIGINT) AS click,
           CAST(count(*) FILTER (WHERE event_type = 'view')     AS BIGINT) AS view,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(count(*) FILTER (WHERE event_type = 'error')    AS BIGINT) AS error
    FROM events GROUP BY 1
    """,
    doc="Pivot surface: day x event_type count matrix via groupBy().pivot() "
    "with an EXPLICIT value list — the explicit list matters at scale "
    "(implicit pivot runs a distinct-values job over the fact before "
    "planning, an extra full scan). Compiles to one hash aggregate with a "
    "conditional-count expression per pivot value; the oracle is the "
    "equivalent FILTER aggregation.",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
)
def events_daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    kinds = ["click", "view", "purchase", "error"]
    return (
        ev.select(F.to_date("ts").cast("string").alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", kinds)
        .count()
        .na.fill(0, kinds)
    )


@register(
    "events_user_topk_heavy",
    oracle="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY user_id
    ORDER BY n DESC, user_id LIMIT 10
    """,
    doc="Heavy-hitters top-k (operators.skew.two_pass_topk): the 10 most "
    "frequent users WITHOUT shuffling full key cardinality — each "
    "partition emits its local top-`capacity` candidates from a "
    "bounded-memory lossy counter (shuffle ≤ partitions x capacity rows "
    "at ANY cardinality), then only candidate rows are recounted exactly "
    "under a broadcast semi-join. Counts are exact; the top-k set is "
    "exact whenever per-partition distinct keys ≤ capacity (true at "
    "every test SF: 1,500 users vs capacity 4,096), hence the exact "
    "oracle. At 10^9+ cardinality this is the plan that still runs; the "
    "plain groupBy twin is events_distinct_users/top_partkeys.",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
)
def events_user_topk_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mempool_dumpster_spark.operators.skew import two_pass_topk

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return two_pass_topk(ev, "user_id", k=10)


@register(
    "events_sliding_counts",
    oracle="""
    WITH w AS (
      SELECT event_type,
             unnest([CAST(to_timestamp(floor(epoch(ts) / 300) * 300 - 300)
                          AS TIMESTAMP),
                     CAST(to_timestamp(floor(epoch(ts) / 300) * 300)
                          AS TIMESTAMP)]) AS win_start
      FROM events
    )
    SELECT win_start, event_type, CAST(count(*) AS BIGINT) AS n
    FROM w
    WHERE win_start >= TIMESTAMP '2024-01-02 00:00:00'
      AND win_start <  TIMESTAMP '2024-01-02 06:00:00'
    GROUP BY 1, 2
    """,
    doc="HOPPING event-time windows in batch (§2.8/ST3's sliding form): "
    "10-minute windows sliding every 5 — each event lands in exactly two "
    "windows, so trend dashboards get half-overlapped smoothing. Spark's "
    "F.window(slide=...) expands the row per window BELOW a partial hash "
    "aggregate (shuffle carries pre-combined (window, type) cells, not "
    "x2 input rows). The oracle derives the same two window starts "
    "arithmetically (floor(epoch/slide)*slide and its predecessor — "
    "every event is within 600 s of both starts by construction). A "
    "6-hour start-time band keeps the registered result compact; the "
    "window filter prunes BEFORE the aggregate in both engines.",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
)
def events_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    win = F.window("ts", "10 minutes", "5 minutes")
    lo = F.lit("2024-01-02 00:00:00").cast("timestamp")
    hi = F.lit("2024-01-02 06:00:00").cast("timestamp")
    return (
        ev.select("event_type", win.alias("w"))
        .select("event_type", F.col("w.start").alias("win_start"))
        .filter((F.col("win_start") >= lo) & (F.col("win_start") < hi))
        .groupBy("win_start", "event_type")
        .agg(F.count("*").alias("n"))
        .select("win_start", "event_type", "n")
    )


@register(
    "events_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT * FROM (
      SELECT 1 AS stage_no, 'view' AS stage,
             CAST((SELECT count(*) FROM v) AS BIGINT) AS n_users
      UNION ALL SELECT 2, 'click', CAST((SELECT count(*) FROM c) AS BIGINT)
      UNION ALL SELECT 3, 'purchase', CAST((SELECT count(*) FROM p) AS BIGINT)
    ) ORDER BY stage_no
    """,
    doc="Ordered conversion funnel (view → click → purchase, strictly "
    "increasing timestamps): how many users reach each stage — the "
    "sequential-pattern shape (MATCH_RECOGNIZE-lite) every product "
    "analytics stack needs. Plan: one shuffle on user_id, then each stage "
    "is a conditional min over the SAME partitioning (per-stage aggregate "
    "+ self-join on user_id reuses the exchange; AQE coalesces); stage "
    "frontiers never amplify rows. At 100 TB the funnel is bounded by "
    "distinct users, not events.",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    rows = [
        v.agg(F.lit(1).alias("stage_no"), F.lit("view").alias("stage"),
              F.count("*").alias("n_users")),
        c.agg(F.lit(2).alias("stage_no"), F.lit("click").alias("stage"),
              F.count("*").alias("n_users")),
        p.agg(F.lit(3).alias("stage_no"), F.lit("purchase").alias("stage"),
              F.count("*").alias("n_users")),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("stage_no")


@register(
    "events_click_and_purchase",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    ORDER BY user_id
    """,
    doc="INTERSECT surface (§2 set ops, complement of the EXCEPT/anti-join "
    "in blacklist_anti): users who both clicked and purchased. Spark "
    "compiles intersect() to a left-semi join over distincts — one "
    "shuffle on user_id, no row amplification.",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
)
def events_click_and_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(buys).orderBy("user_id")


@register(
    "events_views_minus_clicks_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'click'
    ORDER BY user_id
    """,
    doc="EXCEPT ALL surface — MULTISET difference, the form the reference's "
    "set ops never need but real attribution queries do: each user_id "
    "survives (views - clicks) times, so a user with 7 views and 4 clicks "
    "appears 3 times (DISTINCT except would say zero). Spark's exceptAll "
    "compiles to a count-balancing aggregate + generate, one shuffle on "
    "the key, no row amplification beyond the surviving multiplicity.",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
)
def events_views_minus_clicks_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    return views.exceptAll(clicks).orderBy("user_id")


@register(
    "events_moving_sum",
    oracle="""
    SELECT event_id, user_id,
           CAST(sum(event_id) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS moving_sum
    FROM events
    """,
    doc="Explicit ROWS-frame window (§2.8's sliding-frame form, distinct "
    "from the default RANGE frame every other window query uses): per "
    "user, the sum over the current and two preceding events in (ts, "
    "event_id) order. Integer measure → exact cross-engine; one shuffle "
    "on user_id, frame evaluated in a single sorted pass.",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
)
def events_moving_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum("event_id").over(w).cast("bigint").alias("moving_sum"),
    )


@register(
    "events_user_day_outer",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
    oracle="""
    WITH v AS (
      SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_views
      FROM events WHERE event_type = 'view' GROUP BY 1, 2
    ),
    p AS (
      SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_purchases
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT coalesce(v.user_id, p.user_id) AS user_id,
           coalesce(v.day, p.day) AS day,
           CAST(coalesce(v.n_views, 0) AS BIGINT) AS n_views,
           CAST(coalesce(p.n_purchases, 0) AS BIGINT) AS n_purchases,
           CASE WHEN v.user_id IS NULL THEN 'purchase_only'
                WHEN p.user_id IS NULL THEN 'view_only'
                ELSE 'both' END AS side
    FROM v FULL OUTER JOIN p
      ON v.user_id = p.user_id AND v.day = p.day
    """,
    doc="FULL OUTER join — the one join type the rest of the registry "
    "doesn't exercise (inner/left/left_semi/left_anti/cross all have "
    "entries): per (user, day), view counts against purchase counts with "
    "both unmatched sides kept and labeled. At scale this is one "
    "shuffle-on-key full-outer SMJ over two pre-aggregated sides — each "
    "side is already collapsed to (user, day) before the join, so the "
    "join input is bounded by active user-days, not events.",
)
def events_user_day_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    day = F.col("ts").cast("date").alias("day")
    v = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id", day)
        .groupBy("user_id", "day")
        .agg(F.count("*").alias("n_views"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", day)
        .groupBy("user_id", "day")
        .agg(F.count("*").alias("n_purchases"))
    )
    joined = v.alias("v").join(
        p.alias("p"),
        (F.col("v.user_id") == F.col("p.user_id"))
        & (F.col("v.day") == F.col("p.day")),
        "full_outer",
    )
    return joined.select(
        F.coalesce("v.user_id", "p.user_id").alias("user_id"),
        F.coalesce("v.day", "p.day").alias("day"),
        F.coalesce("n_views", F.lit(0)).cast("bigint").alias("n_views"),
        F.coalesce("n_purchases", F.lit(0)).cast("bigint")
        .alias("n_purchases"),
        F.when(F.col("v.user_id").isNull(), "purchase_only")
        .when(F.col("p.user_id").isNull(), "view_only")
        .otherwise("both")
        .alias("side"),
    )
