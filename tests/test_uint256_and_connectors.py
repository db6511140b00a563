"""uint256 decimal-string arithmetic (exact past Decimal(38,0)), ClickHouse
query construction, receiver allowlist + foreachBatch delivery."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from mempool_dumpster_spark.functions.uint256 import (
    uint256_gt,
    uint256_max,
    uint256_min,
    uint256_sum_exact,
    uint256_to_double,
)
from mempool_dumpster_spark.sources.clickhouse import (
    DEDUP_META_COLS,
    dedup_pushdown_query,
)
from mempool_dumpster_spark.streaming.fanout import allowlist_filter, receiver_sink

U256_MAX = 2**256 - 1
BIG = 2**200 + 12345  # far past Decimal(38,0)


def test_uint256_sum_exact_past_decimal38(spark):
    vals = [U256_MAX, BIG, 1, 0, 10**77]
    df = spark.createDataFrame([(str(v),) for v in vals], "value string")
    assert uint256_sum_exact(df, "value") == sum(vals)


def test_uint256_sum_grouped(spark):
    df = spark.createDataFrame(
        [("a", str(BIG)), ("a", "5"), ("b", str(U256_MAX))],
        "g string, value string",
    )
    out = {r["g"]: r["sum"] for r in uint256_sum_exact(df, "value", group_by=["g"])}
    assert out == {"a": BIG + 5, "b": U256_MAX}


def test_uint256_ordering(spark):
    df = spark.createDataFrame(
        [(str(v),) for v in [9, 100, BIG, U256_MAX, 99]], "value string"
    )
    row = df.agg(
        uint256_max("value").alias("mx"), uint256_min("value").alias("mn")
    ).collect()[0]
    assert int(row["mx"]) == U256_MAX
    assert int(row["mn"]) == 9
    # 100 > 99 despite '100' < '99' lexicographically
    pair = spark.createDataFrame([("100", "99")], "a string, b string")
    assert pair.select(uint256_gt("a", "b").alias("gt")).collect()[0]["gt"]


def test_uint256_double_view(spark):
    df = spark.createDataFrame([(str(10**18),)], "value string")
    assert df.select(uint256_to_double("value").alias("d")).collect()[0][
        "d"
    ] == 1e18


def test_clickhouse_pushdown_query():
    q = dedup_pushdown_query("transactions", "2023-09-04", "2023-09-05")
    assert "min(received_at)" in q and "any(raw_tx)" in q
    assert "group_by_two_level_threshold=100000" in q
    for c in DEDUP_META_COLS:
        assert f"`{c}`" in q


def test_allowlist_filter(spark):
    df = spark.createDataFrame(
        [("h1", "alchemy"), ("h2", "eden")], "hash string, source string"
    )
    assert allowlist_filter(df, ["alchemy"]).count() == 1
    assert allowlist_filter(df, ["all"]).count() == 2


def test_receiver_sink_foreachbatch(spark, tmp_path):
    indir = tmp_path / "in"
    indir.mkdir()
    (indir / "a.csv").write_text("h1,0xdead,alchemy\nh2,0xbeef,eden\n")
    stream = spark.readStream.schema("hash string, raw_tx string, source string").csv(
        str(indir)
    )
    got: list[list[dict]] = []
    q = receiver_sink(
        stream,
        send=got.append,
        allowed_sources=["alchemy"],
        checkpoint=str(tmp_path / "ck"),
    )
    deadline = time.time() + 30
    while not got and time.time() < deadline:
        time.sleep(0.5)
    q.stop()
    assert got and [r["hash"] for r in got[0]] == ["h1"]  # eden filtered out


def test_uint256_sum_exact_df_distributed(spark):
    """The DataFrame-returning exact sum: no driver collect, carry
    propagation JVM-side, correct past 2^256 totals."""
    from mempool_dumpster_spark.functions.uint256 import uint256_sum_exact_df

    big = 2**256 - 1
    vals = [big, big, 12345678901234567890, 7]
    df = spark.createDataFrame([(str(v), "g1") for v in vals], "value string, g string")
    row = uint256_sum_exact_df(df, "value").collect()[0]
    assert row["sum"] == str(sum(vals))
    grouped = uint256_sum_exact_df(df, "value", group_by=["g"]).collect()
    assert grouped[0]["sum"] == str(sum(vals))
    # zero case normalizes to "0"
    z = spark.createDataFrame([("0",), ("0",)], "value string")
    assert uint256_sum_exact_df(z, "value").collect()[0]["sum"] == "0"
