"""Merge-pipeline stress at a multiple of the reference's operational day.

BASELINE.md's published envelope is the merge window: 1-2 M txs/day
processed in <=30 min (>= ~1,100 tx/s at the 2 M day). This tool generates
a deterministic day at N unique txs (default 7.5 M unique / 15 M receipts
= 10x the 1.5 M-receipt reference day shape the bench uses), runs the FULL
merge -- dedup -> blacklist-free parse (RLP + ECDSA recovery UDF) ->
sourcelog join -> inclusion enrichment (blocks join) -> already-included
filter -> global sort -> the three real sinks (parquet + metadata CSV +
raw CSV) -- and records wall-clock, throughput, and shuffle volumes into
MERGE_STRESS_r{N}.json, which bench.py embeds by reference.

Generation is seedless-deterministic (everything derived from the tx
index): tx i is signed with priv 0x100000+i, carries 1 + i%3 receipts
across three sources (avg 2 -> receipts = 2x unique), every 5th tx pays to
one hot address (a real `to`-skew for AQE to look at), and every 5th+1 tx
appears in the blocks table (included 3 s after first receipt, so the
already-included filter keeps it -- the enrichment join is exercised, the
drop path is pinned by tests instead).

Usage:
    python tools/merge_stress.py [n_unique] [out_json]
    SPARK_GRAFT_DRIVER_MEM=32g python tools/merge_stress.py 7500000

Generation parallelizes across processes and caches shards under
/tmp/spark_graft_merge_stress_<n>; re-runs reuse them.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

T0_MS = 1_693_785_600_000
SOURCES = ["alchemy", "infura", "bloxroute"]
HOT_TO = "0x" + "aa" * 20


def _gen_shard(args: tuple[int, int, int, str]) -> int:
    """Generate txs [lo, hi) into shard files. Fully index-derived."""
    shard, lo, hi, base = args
    from txgen import make_tx, tx_hash_of

    tx_f = open(os.path.join(base, f"txs_{shard}.csv"), "w")
    sl_f = open(os.path.join(base, f"sourcelog_{shard}.csv"), "w")
    bl_f = open(os.path.join(base, f"blocks_{shard}.csv"), "w")
    n_receipts = 0
    for i in range(lo, hi):
        to = HOT_TO if i % 5 == 0 else "0x" + (i % 997).to_bytes(20, "big").hex()
        raw = make_tx(priv=0x100000 + i, nonce=i % 1000, tx_type=i % 3, to=to)
        h = tx_hash_of(raw)
        ts = T0_MS + (i * 37) % 86_400_000
        for j in range(1 + (i % 3)):
            tx_f.write(f"{ts + 211 * j},{h},{raw}\n")
            sl_f.write(f"{ts + 211 * j},{h},{SOURCES[(i + j) % 3]}\n")
            n_receipts += 1
        if i % 5 == 1:  # included AFTER first receipt: enrich, don't drop
            bl_f.write(f"{h},{18_000_000 + i // 1000},{ts + 3000}\n")
    for f in (tx_f, sl_f, bl_f):
        f.close()
    return n_receipts


def generate(n_unique: int, base: str, procs: int) -> int:
    marker = os.path.join(base, "_DONE")
    if os.path.exists(marker):
        with open(marker) as f:
            return int(f.read())
    os.makedirs(base, exist_ok=True)
    step = (n_unique + procs - 1) // procs
    jobs = [
        (w, w * step, min((w + 1) * step, n_unique), base)
        for w in range(procs)
        if w * step < n_unique
    ]
    with mp.Pool(procs) as pool:
        counts = pool.map(_gen_shard, jobs)
    n_receipts = sum(counts)
    with open(marker, "w") as f:
        f.write(str(n_receipts))
    return n_receipts


def _shuffle_stats(ui_port: int) -> dict:
    """Total + peak per-stage shuffle write via the UI REST API."""
    try:
        root = f"http://localhost:{ui_port}/api/v1"
        apps = json.load(urllib.request.urlopen(f"{root}/applications", timeout=10))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(f"{root}/applications/{app_id}/stages", timeout=30)
        )
        writes = [s.get("shuffleWriteBytes", 0) for s in stages]
        reads = [s.get("shuffleReadBytes", 0) for s in stages]
        return {
            "total_shuffle_write_bytes": sum(writes),
            "peak_stage_shuffle_write_bytes": max(writes, default=0),
            "total_shuffle_read_bytes": sum(reads),
            "n_stages": len(stages),
        }
    except Exception as exc:  # UI scrape is best-effort telemetry
        return {"error": str(exc)}


def _plan_ops(df) -> dict[str, int]:
    """Operator histogram of the executed plan — the cross-scale
    'no plan change' check (AQE may legitimately flip join strategies;
    the histogram records whether it did)."""
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # Count ONLY the formatted-details headers "(<n>) OpName" — exactly one
    # per physical node — and match the op NAME token, not a substring:
    # the old per-line contains() counted each node twice (tree line +
    # details header) and counted every SortMergeJoin as a Sort too.
    import re

    wanted = {
        "SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
        "Exchange", "BroadcastExchange", "ReusedExchange",
        "HashAggregate", "Sort", "Window",
        "CartesianProduct", "BroadcastNestedLoopJoin",
    }
    ops: dict[str, int] = {}
    for ln in plan.splitlines():
        m = re.match(r"\(\d+\)\s+(\w+)", ln.strip())
        if m and m.group(1) in wanted:
            ops[m.group(1)] = ops.get(m.group(1), 0) + 1
    return ops


def main() -> None:
    n_unique = int(sys.argv[1]) if len(sys.argv) > 1 else 7_500_000
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    procs = int(os.environ.get("SPARK_GRAFT_GEN_PROCS", os.cpu_count() or 8))
    base = f"/tmp/spark_graft_merge_stress_{n_unique}"

    t0 = time.time()
    n_receipts = generate(n_unique, base, procs)
    gen_sec = round(time.time() - t0, 1)
    print(f"generated {n_receipts} receipts / {n_unique} unique in {gen_sec}s",
          flush=True)

    from mempool_dumpster_spark.plans.merge import merge_transactions
    from mempool_dumpster_spark.session import get_spark
    from mempool_dumpster_spark.sources.sinks import (
        write_metadata_csv,
        write_raw_csv,
        write_transactions_parquet,
    )

    spark = get_spark(
        "merge-stress", extra_conf={"spark.ui.enabled": "true"}
    )
    shards = sorted(
        f for f in os.listdir(base) if f.startswith("txs_")
    )
    tx_paths = [os.path.join(base, f) for f in shards]
    sl_paths = [os.path.join(base, f.replace("txs_", "sourcelog_")) for f in shards]
    bl_paths = [os.path.join(base, f.replace("txs_", "blocks_")) for f in shards]
    blocks = spark.read.schema(
        "hash string, block_number long, block_timestamp_ms long"
    ).csv(bl_paths)

    out_dir = os.path.join(base, "out")
    t1 = time.time()
    result = merge_transactions(
        spark, tx_paths=tx_paths, sourcelog_paths=sl_paths, blocks=blocks
    )
    write_transactions_parquet(
        result.transactions, os.path.join(out_dir, "transactions.parquet")
    )
    write_metadata_csv(
        result.transactions, os.path.join(out_dir, "metadata.csv")
    )
    write_raw_csv(result.transactions, os.path.join(out_dir, "raw.csv"))
    merge_sec = round(time.time() - t1, 1)

    n_out = spark.read.parquet(
        os.path.join(out_dir, "transactions.parquet")
    ).count()
    plan_ops = _plan_ops(result.transactions)
    shuffle = _shuffle_stats(int(spark.conf.get("spark.ui.port", "4040")))
    aqe = {
        "adaptive_enabled": spark.conf.get("spark.sql.adaptive.enabled"),
        "skew_join_enabled": spark.conf.get(
            "spark.sql.adaptive.skewJoin.enabled"
        ),
    }
    sink_bytes = 0
    for root, _dirs, files in os.walk(out_dir):
        sink_bytes += sum(os.path.getsize(os.path.join(root, f)) for f in files)

    report = {
        "n_unique": n_unique,
        "n_receipts": n_receipts,
        "gen_sec": gen_sec,
        "merge_wall_sec": merge_sec,
        "receipts_per_sec": round(n_receipts / merge_sec, 1),
        "unique_tx_per_sec": round(n_unique / merge_sec, 1),
        "rows_out": n_out,
        "sink_bytes": sink_bytes,
        "plan_ops": plan_ops,
        "shuffle": shuffle,
        "aqe": aqe,
        "gen_procs": procs,
        "cpus": spark.sparkContext.defaultParallelism,
    }
    print(json.dumps(report))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(report, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
