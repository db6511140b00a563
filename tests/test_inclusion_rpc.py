"""F5/J3-live tests: mapInPandas RPC inclusion check with a dict-backed mock
client — asserts the per-partition block cache prevents repeat lookups
(reference cmd/merge/inclusioncheck.go BlockCache), enrichment values match,
and the streaming collector routes already-on-chain txs to trash with
'tx-already-onchain' (reference collector/tx_processor.go:259-276)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mempool_dumpster_spark.operators.inclusion_rpc import (
    MockRPCClient as StrictMockRPC,
)
from mempool_dumpster_spark.operators.inclusion_rpc import (
    PartitionBlockCache,
    rpc_inclusion_enrich,
)


BLOCK_100 = {
    "number": 100,
    "timestamp_ms": 1_693_785_600_000,
    "tx_hashes": ["0x" + "aa" * 32, "0x" + "ab" * 32],
}


def test_block_cache_lru():
    c = PartitionBlockCache(max_blocks=2)
    c.add_block(1, 1000, ["h1"])
    c.add_block(2, 2000, ["h2"])
    assert c.get("h1") == (1, 1000)
    c.add_block(3, 3000, ["h3"])  # evicts block 1 (LRU by insertion)
    assert c.get("h1") is None
    assert c.get("h2") == (2, 2000)
    assert c.get("h3") == (3, 3000)
    assert c.hits == 3 and c.misses == 1


def test_rpc_inclusion_enrich_values_and_cache(spark):
    rows = [
        ("0x" + "aa" * 32, 1_693_785_000_000),  # in block 100
        ("0x" + "ab" * 32, 1_693_785_700_000),  # in block 100 → cache hit
        ("0x" + "cc" * 32, 1_693_785_000_000),  # not included
    ]
    df = spark.createDataFrame(rows, "hash string, timestamp long").coalesce(1)

    # a local closure is pickled by value — the worker needs no test module
    def factory(block=BLOCK_100):
        return StrictMockRPC([block])

    out = {r["hash"]: r for r in rpc_inclusion_enrich(df, factory).collect()}
    a = out["0x" + "aa" * 32]
    assert a["includedAtBlockHeight"] == 100
    assert a["includedBlockTimestamp"] == BLOCK_100["timestamp_ms"]
    assert a["inclusionDelayMs"] == 600_000
    b = out["0x" + "ab" * 32]  # served from the block cache (strict mock)
    assert b["includedAtBlockHeight"] == 100
    assert b["inclusionDelayMs"] == -100_000  # negative delay is legal
    c = out["0x" + "cc" * 32]
    assert (
        c["includedAtBlockHeight"],
        c["includedBlockTimestamp"],
        c["inclusionDelayMs"],
    ) == (0, 0, 0)


def test_collector_onchain_trash_routing(spark, tmp_path):
    from mempool_dumpster_spark.streaming.collector import (
        file_stream_source,
        start_collector,
    )
    from txgen import make_tx, tx_hash_of

    tx_new = make_tx(priv=0xD1, tx_type=2, nonce=1)
    tx_onchain = make_tx(priv=0xD2, tx_type=2, nonce=2)
    h_onchain = tx_hash_of(tx_onchain)

    indir = tmp_path / "in"
    indir.mkdir()
    (indir / "f.csv").write_text(
        f"2023-09-04 00:00:00,{tx_new},alchemy\n"
        f"2023-09-04 00:00:01,{tx_onchain},infura\n"
    )

    block = {"number": 777, "timestamp_ms": 1_693_785_600_000,
             "tx_hashes": [h_onchain]}

    def factory(block=block):
        return StrictMockRPC([block])

    qs = start_collector(
        file_stream_source(spark, str(indir)),
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_available_now=True,
        rpc_client_factory=factory,
    )
    qs.await_all()

    txs = spark.read.schema("timestamp_ms long, hash string, raw_tx string").csv(
        str(tmp_path / "out/transactions")
    )
    assert [r["hash"] for r in txs.collect()] != [h_onchain]
    assert txs.count() == 1

    trash = spark.read.schema(
        "timestamp_ms long, hash string, source string, reason string, notes string"
    ).csv(str(tmp_path / "out/trash"))
    trow = trash.collect()
    assert len(trow) == 1
    assert trow[0]["hash"] == h_onchain
    assert trow[0]["reason"] == "tx-already-onchain"
    assert trow[0]["notes"] == "777"  # block number, like writeTrash's notes

    m = spark.read.schema(
        "minute timestamp, source string, family string, n long"
    ).csv(str(tmp_path / "out/metrics"))
    fam = {(r["family"], r["source"]): r["n"] for r in m.collect()}
    assert fam[("first", "alchemy")] == 1
    assert fam[("tx-onchain", "infura")] == 1
    assert fam[("tx-trash", "infura")] == 1


def test_merge_with_rpc_inclusion_path(spark, tmp_path):
    """J3-live in the batch merge: rpc_client_factory replaces the blocks
    join; F3 (included ≥12s before receipt → drop) still applies."""
    from mempool_dumpster_spark.plans.merge import merge_transactions
    from txgen import make_tx, tx_hash_of

    ts = 1_693_785_600_000
    tx_kept = make_tx(priv=0xE1, tx_type=2, nonce=1)  # included 12s after
    tx_old = make_tx(priv=0xE2, tx_type=2, nonce=2)  # included 100s BEFORE
    tx_mem = make_tx(priv=0xE3, tx_type=0, nonce=3)  # never included
    h_kept, h_old, h_mem = map(tx_hash_of, (tx_kept, tx_old, tx_mem))

    f = tmp_path / "txs.csv"
    f.write_text(
        f"{ts},{h_kept},{tx_kept}\n{ts},{h_old},{tx_old}\n{ts},{h_mem},{tx_mem}\n"
    )
    blocks = [
        {"number": 100, "timestamp_ms": ts + 12_000, "tx_hashes": [h_kept]},
        {"number": 90, "timestamp_ms": ts - 100_000, "tx_hashes": [h_old]},
    ]

    def factory(blocks=blocks):
        return StrictMockRPC(blocks, strict=False)

    result = merge_transactions(spark, [str(f)], rpc_client_factory=factory)
    rows = {r["hash"]: r for r in result.transactions.collect()}
    result.unpersist()
    assert set(rows) == {h_kept, h_mem}  # h_old dropped by F3
    assert rows[h_kept]["includedAtBlockHeight"] == 100
    assert rows[h_kept]["inclusionDelayMs"] == 12_000
    assert rows[h_mem]["includedAtBlockHeight"] == 0
