"""The 12 README queries (reference README.md:104-137) over a merged-output
DataFrame, checked against hand-computed expectations on a crafted table."""

from __future__ import annotations

import pytest

from mempool_dumpster_spark.plans import mempool_queries as Q


@pytest.fixture(scope="module")
def txs(spark):
    rows = [
        # timestamp, hash, txType, from, to, data4Bytes, sources,
        # includedBlockTimestamp, inclusionDelayMs, rawTx
        (100, "0xh1", 2, "0xa", Q.UNISWAP_V2, "0x38ed1739", ["bloxroute"], 1_000, 900, b"\x01"),
        (200, "0xh2", 2, "0xb", Q.UNISWAP_V2, "0x38ed1739", ["bloxroute", "eden"], 0, 0, b"\x02"),
        (300, "0xh3", 0, "0xc", "0xother", "", ["eden"], 2_000, 1_700, b"\x03"),
        (400, "0xh4", 3, "0xd", Q.UNISWAP_V2, "0x7ff36ab5", ["local"], 3_000, 2_600, b"\x04"),
    ]
    return spark.createDataFrame(
        rows,
        "timestamp long, hash string, txType long, from string, to string, "
        "data4Bytes string, sources array<string>, includedBlockTimestamp long, "
        "inclusionDelayMs long, rawTx binary",
    )


def test_q1_q2(txs):
    assert Q.q1_count_rows(txs).collect()[0]["n"] == 4
    by_type = {r["txType"]: r["n"] for r in Q.q2_count_by_txtype(txs).collect()}
    assert by_type == {0: 1, 2: 2, 3: 1}


def test_q3_first_raw(txs):
    row = Q.q3_first_raw(txs).collect()[0]
    assert row["hash"] == "0xh1"
    assert row["rawTx_hex"] == "01"


def test_q4_point_lookup(txs):
    rows = Q.q4_details_of_hash(txs, "0xH2").collect()
    assert len(rows) == 1 and rows[0]["from"] == "0xb"


def test_q5_q6_source_membership(txs):
    assert Q.q5_seen_by_source(txs, "bloxroute").collect()[0]["n"] == 2
    assert Q.q6_seen_by_all_sources(txs, ["bloxroute", "eden"]).collect()[0]["n"] == 1
    assert Q.q6_seen_by_all_sources(txs, ["bloxroute", "local"]).collect()[0]["n"] == 0


def test_q7_q8_exclusive(txs):
    assert Q.q7_exclusive_from(txs, "bloxroute").collect()[0]["n"] == 1
    split = {
        (r["source"], r["included"]): r["n"]
        for r in Q.q8_exclusive_landed_by_source(txs).collect()
    }
    assert split == {("bloxroute", True): 1, ("eden", True): 1, ("local", True): 1}


def test_q9_q10_to_address(txs):
    assert Q.q9_to_address(txs).collect()[0]["n"] == 3
    split = {r["included"]: r["n"] for r in Q.q10_to_address_included_split(txs).collect()}
    assert split == {True: 2, False: 1}


def test_q11_quantiles(txs):
    row = Q.q11_inclusion_delay_quantiles(txs).collect()[0]
    # uniswap + included: delays 0.9s and 2.6s
    assert row["quantiles"][0] == pytest.approx(1.75)  # median interpolated
    assert row["avg"] == pytest.approx((0.9 + 2.6) / 2)


def test_q12_methods(txs):
    methods = {r["data4Bytes"]: r["n"] for r in Q.q12_contract_methods(txs).collect()}
    assert methods == {"0x38ed1739": 2, "0x7ff36ab5": 1}
