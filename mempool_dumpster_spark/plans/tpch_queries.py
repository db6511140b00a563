"""Extended TPC-H-style query shapes over the driver testdata.

The testdata schema is a TPC-H subset (no partsupp, no
commit/receipt dates, no shipmode/container columns — TESTDATA.md), so
the classic queries whose predicates live on missing columns are ADAPTED:
the join/subquery/aggregation SHAPE is preserved exactly (that is what
exercises the engine), while the filter columns are remapped onto the
columns that exist. Each docstring states the original query and the
adaptation.

Shapes covered here beyond plans/queries.py (Q1/3/4/5/6/13/14/16/17/18):

- Q2:  correlated-min subquery  → per-group window rank (no self-join)
- Q7:  dual-role dimension (nation joined twice under different roles)
- Q8:  conditional market-share ratio (CASE inside sum / total sum)
- Q9:  LIKE-filtered multi-way join, group by dim attr x year
- Q10: fact-filtered top-k customers with wide output row
- Q15: scalar-subquery max over an aggregated view (ties kept)
- Q19: OR-of-ANDs pushdown (disjunctive mixed dim+fact predicates)
- Q20: two-level semi-join chain (agg HAVING → semi → semi)
- Q21: EXISTS + NOT EXISTS on the same fact under different predicates
- Q22: anti-join + scalar-subquery average gate
- Q11: per-group sum gated by a scalar fraction of the grand total

All are registered `overflow=True`: oracle-checked by tools/selfcheck.py
at sf0.01 and sf0.1 every round, deliberately after the 50 driver-recorded
artifact slots (which stay pinned to the round-5 stable set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mempool_dumpster_spark.plans.registry import register
from mempool_dumpster_spark.plans.tables import load_tables


def _rev() -> F.Column:
    """The cross-engine-exact revenue term: inputs have <=2 decimal places,
    so DECIMAL(18,2) casts are exact; the decimal product/sum is exact; one
    final double cast on the aggregate is bit-identical in both engines."""
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"
)


@register(
    "q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey  = l.l_orderkey
    JOIN customer c ON c.c_custkey   = o.o_custkey
    JOIN supplier s ON s.s_suppkey   = l.l_suppkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7: volume shipping between two nations by year. The shape "
    "under test is the DUAL-ROLE dimension — nation joins the plan twice, "
    "once through supplier and once through customer, with a symmetric "
    "pair predicate across the two roles. Both nation⋈{supplier,customer} "
    "sides broadcast; the only shuffle is lineitem⋈orders on orderkey. "
    "The pair filter lands on the joined dims BEFORE the fact join, so at "
    "100 TB the fact rows for other nation pairs never reach the join.",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, ["lineitem", "orders", "customer", "supplier", "nation"]
    )
    # push the pair predicate's per-side residue (nation ∈ {1,2}) INTO each
    # dim before broadcast — only the two nations' customers/suppliers ship
    # to the executors, not the whole dimension
    n = t["nation"].filter(F.col("n_name").isin("NATION_1", "NATION_2")).select(
        "n_nationkey", "n_name"
    )
    s = t["supplier"].join(
        F.broadcast(n.withColumnRenamed("n_name", "supp_nation")),
        F.col("n_nationkey") == F.col("s_nationkey"),
    ).select("s_suppkey", "supp_nation")
    c = t["customer"].join(
        F.broadcast(n.withColumnRenamed("n_name", "cust_nation")),
        F.col("n_nationkey") == F.col("c_nationkey"),
    ).select("c_custkey", "cust_nation")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    oc = t["orders"].join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
    return (
        li.join(oc, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .select("supp_nation", "cust_nation", "l_year", "revenue")
    )


@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(nation_rev AS DOUBLE) / CAST(total_rev AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             sum(CASE WHEN n2.n_name = 'NATION_3' THEN {_REV_SQL}
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS nation_rev,
             sum({_REV_SQL}) AS total_rev
      FROM lineitem l
      JOIN part p     ON p.p_partkey    = l.l_partkey
      JOIN orders o   ON o.o_orderkey   = l.l_orderkey
      JOIN customer c ON c.c_custkey    = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey  = n1.n_regionkey
      JOIN supplier s ON s.s_suppkey    = l.l_suppkey
      JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA'
        AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1
    )
    """,
    doc="TPC-H Q8: market share of one supplier nation within a region's "
    "PROMO-part revenue, by order year. Shape: conditional aggregation "
    "ratio — sum(CASE supplier-nation)/sum(all) in ONE aggregate pass (no "
    "second scan for the denominator). Both sums stay DECIMAL through the "
    "aggregate and cast to double only for the final division, so the "
    "ratio is a quotient of two bit-exact doubles in both engines. All "
    "five dims broadcast; single fact shuffle on orderkey.",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark,
        sf_dir,
        ["lineitem", "part", "orders", "customer", "supplier", "nation", "region"],
    )
    asia = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    c = t["customer"].join(
        F.broadcast(asia), F.col("n_nationkey") == F.col("c_nationkey")
    ).select("c_custkey")
    p = t["part"].filter(F.col("p_type") == "PROMO").select("p_partkey")
    s = t["supplier"].join(
        F.broadcast(t["nation"].select("n_nationkey", "n_name")),
        F.col("n_nationkey") == F.col("s_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    oc = o.join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
    joined = (
        t["lineitem"]
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(oc, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
    )
    zero = F.lit(0).cast("decimal(18,2)")
    nation_rev = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", _rev()).otherwise(zero)
    )
    agg = joined.groupBy(
        F.year("o_orderdate").cast("bigint").alias("o_year")
    ).agg(
        nation_rev.alias("nation_rev"), F.sum(_rev()).alias("total_rev")
    )
    return agg.select(
        "o_year",
        (F.col("nation_rev").cast("double") / F.col("total_rev").cast("double")).alias(
            "mkt_share"
        ),
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(sum({_REV_SQL}) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey    = l.l_partkey
    JOIN supplier s ON s.s_suppkey    = l.l_suppkey
    JOIN orders o   ON o.o_orderkey   = l.l_orderkey
    JOIN nation n   ON n.n_nationkey  = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 (adapted: profit = discounted revenue — the testdata has "
    "no partsupp/ps_supplycost, so the cost term is dropped; the SHAPE "
    "under test — LIKE-filtered part dim pruning a 4-way fact join grouped "
    "by supplier-nation x order-year — is unchanged). The LIKE filter "
    "prunes part before broadcast; at 100 TB only matching parts' lineitem "
    "rows survive the first join, so the orderkey shuffle carries a "
    "fraction of the fact.",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, ["lineitem", "part", "supplier", "orders", "nation"]
    )
    p = t["part"].filter(F.col("p_name").like("%widget%")).select("p_partkey")
    s = t["supplier"].join(
        F.broadcast(t["nation"].select("n_nationkey", "n_name")),
        F.col("n_nationkey") == F.col("s_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    return (
        t["lineitem"]
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("nation", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(F.sum(_rev()).cast("double").alias("profit"))
        .select("nation", "o_year", "profit")
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name, c.c_mktsegment
    FROM customer c
    JOIN orders o   ON o.o_custkey   = c.c_custkey
    JOIN lineitem l ON l.l_orderkey  = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 4, 5, 6
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10: customers who returned the most revenue in a quarter "
    "(wide output row: the group-by carries the customer's descriptive "
    "columns through the aggregate instead of re-joining them after — one "
    "shuffle, no post-agg dim lookup). returnflag + date filters reach the "
    "fact scans as pushed predicates; top-20 cut is tiebroken on custkey.",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem", "nation"])
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = t["lineitem"].filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    cn = t["customer"].join(
        F.broadcast(t["nation"].select("n_nationkey", "n_name")),
        F.col("n_nationkey") == F.col("c_nationkey"),
    ).select("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cn, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "c_mktsegment")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum({_REV_SQL}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN rev r ON r.supplier_no = s.s_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q15: top supplier by quarterly revenue — the "
    "scalar-subquery-max-over-a-view shape. The revenue view is computed "
    "ONCE (per-suppkey partial agg, map-side combined); the max is a "
    "single-row aggregate of that tiny result, broadcast back as a join "
    "filter (no second fact scan, no window over the whole view). Ties "
    "are kept, per the spec; revenue doubles are bit-exact via the "
    "decimal-sum idiom so the equality join cannot flip across engines.",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "supplier"])
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).cast("double").alias("total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        rev.join(F.broadcast(top), F.col("total_revenue") == F.col("__max_rev"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
    doc="TPC-H Q19 (adapted: the container/shipmode legs of each branch "
    "are remapped onto p_size/l_quantity ranges — the testdata lacks those "
    "columns; the OR-of-ANDs SHAPE is unchanged). What matters at scale: "
    "the disjunction mixes dim-side and fact-side predicates, so neither "
    "side's branch filter can be applied alone — but the dim-only residue "
    "(brand ∈ {12,23,34}, size ≤ 15) IS derivable and prunes part before "
    "broadcast, and the fact-only residue (l_quantity ≤ 30) prunes "
    "lineitem at the scan. The full disjunction evaluates as the join "
    "residual.",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    # dim-only residue of the disjunction: prune part before the broadcast
    p = t["part"].filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= 15)
    ).select("p_partkey", "p_brand", "p_size")
    # fact-only residue: no branch admits quantity > 30
    li = t["lineitem"].filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    ).select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    branch = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(branch)
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q20_supplier_semijoin",
    oracle="""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name IN ('NATION_4', 'NATION_5')
      AND s.s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
        )
        GROUP BY l_suppkey, l_partkey
        HAVING sum(l_quantity) > 80
      )
    ORDER BY s_name, s_acctbal
    """,
    doc="TPC-H Q20 (adapted: no partsupp/availqty — 'has excess stock' "
    "becomes 'shipped > 80 units of some small% part', keeping the "
    "two-level nested-IN SHAPE: part-name semi-filter → per-(supplier, "
    "part) HAVING aggregate → supplier semi-join → nation filter). In "
    "Spark the inner INs compile to broadcast semi-joins (left_semi), so "
    "no dedup-materialize step; the HAVING aggregate is partial-agg'd "
    "map-side and its distinct suppkeys are a tiny broadcast against "
    "supplier.",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
)
def q20_supplier_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["supplier", "nation", "lineitem", "part"])
    small = t["part"].filter(F.col("p_name").like("small%")).select("p_partkey")
    heavy = (
        t["lineitem"]
        .join(F.broadcast(small), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 80)
        .select("l_suppkey")
        .distinct()
    )
    nat = t["nation"].filter(F.col("n_name").isin("NATION_4", "NATION_5")).select(
        "n_nationkey"
    )
    return (
        t["supplier"]
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(
            F.broadcast(heavy),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name", "s_acctbal")
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM late) l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 25
    """,
    doc="TPC-H Q21 (adapted: with no commit/receipt dates, 'late' is "
    "l_shipdate > o_orderdate + 90 days; the EXISTS + NOT-EXISTS SHAPE on "
    "the same fact under different predicates is unchanged): suppliers "
    "who were the SOLE late supplier on a multi-supplier finished order. "
    "Spark plan: the late set is computed once and reused for both the "
    "probe and the NOT-EXISTS side; EXISTS(other supplier) is a left-semi "
    "join of order-level distinct-supplier counts (>1), NOT EXISTS(other "
    "late supplier) a left-anti join — both on the orderkey shuffle "
    "already paid by the late-set build, so AQE coalesces one pipeline.",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "supplier"])
    fo = t["orders"].filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    late = (
        t["lineitem"]
        .join(fo, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    # EXISTS (another supplier on the order): orders with >= 2 distinct
    # suppliers, from the full fact. distinct-count >= 2 on a non-null key
    # is exactly min != max — a plain map-side-combinable aggregate, so no
    # per-group distinct expansion and only two longs per order shuffle.
    multi = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(
            F.min("l_suppkey").alias("__lo"),
            F.max("l_suppkey").alias("__hi"),
        )
        .filter(F.col("__lo") != F.col("__hi"))
        .select(F.col("l_orderkey").alias("__mk"))
    )
    # NOT EXISTS (another LATE supplier on the order): orders with exactly
    # one distinct late supplier — min == max under the same identity.
    solo_late = (
        late.groupBy("l_orderkey")
        .agg(
            F.min("l_suppkey").alias("__lo"),
            F.max("l_suppkey").alias("__hi"),
        )
        .filter(F.col("__lo") == F.col("__hi"))
        .select(F.col("l_orderkey").alias("__sk"))
    )
    kept = (
        late.join(multi, F.col("__mk") == F.col("l_orderkey"), "left_semi")
        .join(solo_late, F.col("__sk") == F.col("l_orderkey"), "left_semi")
    )
    return (
        kept.join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(25)
    )


@register(
    "q22_idle_customers",
    oracle="""
    WITH pool AS (
      SELECT c_custkey, c_mktsegment, c_acctbal
      FROM customer
      WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'HOUSEHOLD')
    ),
    thresh AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(count(*) AS BIGINT) AS avg_bal
      FROM pool WHERE c_acctbal > 0.0
    )
    SELECT p.c_mktsegment,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(p.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM pool p, thresh
    WHERE p.c_acctbal > thresh.avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = p.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY 1
    ORDER BY 1
    """,
    doc="TPC-H Q22 (adapted: the phone-country-code prefix list becomes a "
    "c_mktsegment list, and 'never ordered' becomes 'no order since "
    "2000-01-01' — every testdata customer has at least one lifetime "
    "order; the SHAPE — scalar-subquery average gate + NOT-EXISTS "
    "anti-join against a filtered orders scan — is unchanged): wealthy "
    "customers in chosen segments who have gone dormant. Spark plan: the average is a one-row aggregate broadcast as "
    "a cross-filter (decimal-sum/count division, bit-exact both engines); "
    "the NOT EXISTS is a left-anti join on custkey — the only shuffle, "
    "and the anti side is just orders' custkey column.",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    pool = t["customer"].filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY", "HOUSEHOLD")
    ).select("c_custkey", "c_mktsegment", "c_acctbal")
    thresh = pool.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("avg_bal")
    )
    return (
        pool.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            t["orders"]
            .filter(
                F.col("o_orderdate")
                >= F.lit("2000-01-01 00:00:00").cast("timestamp")
            )
            .select(F.col("o_custkey")),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH bridge AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    cand AS (
      SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal,
             n.n_name,
             row_number() OVER (
               PARTITION BY p.p_partkey
               ORDER BY s.s_acctbal ASC, s.s_suppkey ASC
             ) AS rn
      FROM part p
      JOIN bridge b   ON b.l_partkey   = p.p_partkey
      JOIN supplier s ON s.s_suppkey   = b.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE p.p_size = 15 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM cand WHERE rn = 1
    ORDER BY s_acctbal DESC, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 (adapted: no partsupp — the part↔supplier relation is "
    "the DISTINCT (l_partkey, l_suppkey) pairs actually shipped, and "
    "'minimum supplycost' becomes minimum s_acctbal; the correlated-min "
    "subquery SHAPE is what's under test). Planned WITHOUT the classic "
    "re-join-on-min: a row_number window over p_partkey picks each part's "
    "min-cost supplier in one pass — no second aggregate, no "
    "min-equality join whose float compare could tie-break differently "
    "across engines (the window order carries s_suppkey as tiebreaker). "
    "At 100 TB the bridge dedup and the window shuffle share the partkey "
    "hash; dims broadcast.",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, ["lineitem", "part", "supplier", "nation", "region"]
    )
    p = t["part"].filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_name")
    eur = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    s = t["supplier"].join(
        F.broadcast(eur), F.col("n_nationkey") == F.col("s_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    bridge = (
        t["lineitem"]
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .select("p_partkey", "p_name", "l_suppkey")
        .distinct()
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.col("s_acctbal").asc(), F.col("s_suppkey").asc()
    )
    return (
        bridge.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.col("s_acctbal").desc(), "p_partkey")
        .limit(100)
    )


@register(
    "q11_important_parts",
    oracle=f"""
    WITH pv AS (
      SELECT l.l_partkey AS p_key,
             sum({_REV_SQL}) AS val
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name IN ('NATION_6', 'NATION_7')
      GROUP BY 1
    )
    SELECT p_key AS l_partkey, CAST(val AS DOUBLE) AS value
    FROM pv, (SELECT sum(val) AS total FROM pv)
    WHERE val > total * 0.002
    ORDER BY value DESC, l_partkey
    """,
    doc="TPC-H Q11 (adapted: no partsupp — 'stock value' becomes shipped "
    "revenue from two nations' suppliers; the SHAPE — per-group sum "
    "gated by a SCALAR FRACTION of the grand total, the "
    "HAVING sum(...) > (SELECT sum(...)*f) form — is unchanged): parts "
    "that concentrate the value. The per-part aggregate is computed ONCE "
    "and reused for both the groups and the grand total (self-aggregate "
    "of the small result, broadcast back as a one-row gate) — no second "
    "fact scan. Comparisons stay in DECIMAL (exact) until the final "
    "output cast, so the threshold cannot flip between engines.",
    overflow=True,  # oracle-checked via selfcheck; beyond the 50-slot cap
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "supplier", "nation"])
    nat = t["nation"].filter(F.col("n_name").isin("NATION_6", "NATION_7")).select(
        "n_nationkey"
    )
    s = t["supplier"].join(
        F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey")
    ).select("s_suppkey")
    pv = (
        t["lineitem"]
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.col("l_partkey"))
        .agg(F.sum(_rev()).alias("val"))
    )
    total = pv.agg(F.sum("val").alias("total"))
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("val") > F.col("total") * F.lit(0.002).cast("decimal(6,4)"))
        .select("l_partkey", F.col("val").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), "l_partkey")
    )


@register(
    "q12_shipping_priority_split",
    oracle="""
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag IN ('A', 'R')
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    ORDER BY 1
    """,
    doc="TPC-H Q12 (adapted: no shipmode/commit/receipt columns — "
    "shipmode IN ('MAIL','SHIP') becomes returnflag IN ('A','R') and the "
    "commit<receipt late-shipping chain becomes shipped >30 days after "
    "the order date; the SHAPE — one fact-fact orderkey join feeding a "
    "CONDITIONAL TWO-WAY COUNT split on an order attribute, grouped by a "
    "line attribute — is unchanged; cf. dss.tpc Q12). Neither side "
    "broadcasts at scale: one sort-merge shuffle on orderkey, with the "
    "returnflag + shipdate-window predicates pushed into the lineitem "
    "scan so only the window's candidate lines shuffle; the residual "
    "shipdate>orderdate+30d lands in the join condition. The CASE counts "
    "partial-aggregate map-side; the final exchange carries 2 rows.",
)
def q12_shipping_priority_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["lineitem", "orders"])
    li = t["lineitem"].filter(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag", "l_shipdate")
    o = t["orders"].select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
            ),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0))
            .cast("bigint")
            .alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )
