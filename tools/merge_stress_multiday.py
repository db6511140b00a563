"""Multi-day incremental merge stress — the reference's actual operating
mode (r13 verdict #6).

The reference merges ONE day at a time, passing every PRIOR day's output
hashes as the blacklist so a tx that landed in an earlier archive file is
never re-admitted (reference common/txsfile.go:115-119 — the blacklist is
loaded from prior metadata CSVs; cmd/merge/transactions.go wires it in
front of dedup). The repo's merge has always supported blacklist_paths,
and the manifest/incremental-dedup paths are oracle-checked per batch,
but until r14 no harness ran N consecutive daily merges with cross-day
duplicate pressure and asserted the archive-append invariants.

Day structure (index-derived, seedless like tools/merge_stress.py):
- day d, index i in [0, n_day): FRESH tx signed with
  priv 0x500000 + d*n_day + i, 1 + i%3 receipts (avg 2/unique);
- for d > 0, every 20th index (i % 20 == 3, ~5% of receipts) is a
  CROSS-DAY DUPLICATE: day d re-emits DAY 0's tx at index i with day-d
  timestamps — the rebroadcast-a-week-later shape. Day 0 admitted that
  hash, so every later day's blacklist must reject it;
- every 5th+1 index is included on-chain 3 s AFTER its first receipt
  (inclusion enrichment keeps it — same as merge_stress).

Per day the FULL merge runs (dedup → RLP/ECDSA parse → sourcelog join →
inclusion enrich → already-included filter → global sort → parquet +
metadata CSV sinks), with blacklist_paths = the accumulated hash CSVs of
days < d (extracted from each day's output, the reference's metadata-CSV
blacklist semantics). Asserted per day:
- rows_out == the day's FRESH unique count (dup receipts all rejected);
- zero day<d hashes in day d's output (direct inner-join probe, not
  inferred from counts);
- the incremental artifact (accumulated blacklist CSVs) stays ~100
  bytes/hash — the promise that the cross-day gate reads a hash list,
  never prior days' full output.

Usage:
    python tools/merge_stress_multiday.py [n_day] [days] [out_json]
    python tools/merge_stress_multiday.py 1000000 7 MERGE_STRESS_MULTIDAY_r14.json
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

T0_MS = 1_693_785_600_000  # 2023-09-04 00:00:00 UTC (day 0)
DAY_MS = 86_400_000
SOURCES = ["alchemy", "infura", "bloxroute"]
DUP_MOD = 20  # i % 20 == 3 on day > 0 → re-emit day 0's tx i (~5%)
#: max artifact bytes per blacklisted hash — 66 hash chars + timestamp
#: column + separators lands ~80-90; 128 flags a format regression that
#: would bloat the artifact toward shipping full outputs around
ARTIFACT_MAX_BYTES_PER_HASH = 128


def _gen_shard(args: tuple[int, int, int, str, int, int]) -> dict:
    shard, lo, hi, day_dir, day, n_day = args
    from txgen import make_tx, tx_hash_of

    tx_f = open(os.path.join(day_dir, f"txs_{shard}.csv"), "w")
    sl_f = open(os.path.join(day_dir, f"sourcelog_{shard}.csv"), "w")
    bl_f = open(os.path.join(day_dir, f"blocks_{shard}.csv"), "w")
    c = {"receipts": 0, "fresh_unique": 0, "dup_receipts": 0}
    day_t0 = T0_MS + day * DAY_MS
    for i in range(lo, hi):
        dup = day > 0 and i % DUP_MOD == 3
        # dup rows re-sign DAY 0's identity — same priv/nonce/type ⇒ the
        # exact raw bytes and hash day 0 admitted
        src_day = 0 if dup else day
        raw = make_tx(
            priv=0x500000 + src_day * n_day + i, nonce=i % 1000, tx_type=i % 3
        )
        h = tx_hash_of(raw)
        ts = day_t0 + (i * 37) % DAY_MS
        n_rx = 1 + (i % 3)
        for j in range(n_rx):
            tx_f.write(f"{ts + 211 * j},{h},{raw}\n")
            sl_f.write(f"{ts + 211 * j},{h},{SOURCES[(i + j) % 3]}\n")
        c["receipts"] += n_rx
        if dup:
            c["dup_receipts"] += n_rx
        else:
            c["fresh_unique"] += 1
            if i % 5 == 1:  # included after first receipt — enrich path
                bl_f.write(f"{h},{18_000_000 + i // 1000},{ts + 3000}\n")
    for f in (tx_f, sl_f, bl_f):
        f.close()
    return c


def generate_day(day: int, n_day: int, base: str, procs: int) -> dict:
    day_dir = os.path.join(base, f"day{day}")
    marker = os.path.join(day_dir, "_DONE")
    if os.path.exists(marker):
        with open(marker) as f:
            return json.load(f)
    os.makedirs(day_dir, exist_ok=True)
    step = (n_day + procs - 1) // procs
    jobs = [
        (w, w * step, min((w + 1) * step, n_day), day_dir, day, n_day)
        for w in range(procs)
        if w * step < n_day
    ]
    with mp.Pool(procs) as pool:
        counts = pool.map(_gen_shard, jobs)
    totals = {k: sum(c[k] for c in counts) for k in counts[0]}
    with open(marker, "w") as f:
        json.dump(totals, f)
    return totals


def run_days(spark, base: str, n_day: int, days: int, procs: int) -> dict:
    from pyspark.sql import functions as F

    from mempool_dumpster_spark.plans.merge import merge_transactions
    from mempool_dumpster_spark.sources.sinks import (
        write_metadata_csv,
        write_transactions_parquet,
    )

    bl_dir = os.path.join(base, "blacklist")
    shutil.rmtree(bl_dir, ignore_errors=True)
    os.makedirs(bl_dir)
    blacklist_paths: list[str] = []
    total_prior_hashes = 0
    day_reports = []
    ok = True

    for day in range(days):
        t0 = time.time()
        counts = generate_day(day, n_day, base, procs)
        gen_sec = round(time.time() - t0, 1)
        day_dir = os.path.join(base, f"day{day}")
        shards = sorted(
            f for f in os.listdir(day_dir) if f.startswith("txs_")
        )
        tx_paths = [os.path.join(day_dir, f) for f in shards]
        sl_paths = [
            os.path.join(day_dir, f.replace("txs_", "sourcelog_"))
            for f in shards
        ]
        bl_csv_paths = [
            os.path.join(day_dir, f.replace("txs_", "blocks_"))
            for f in shards
        ]
        blocks = spark.read.schema(
            "hash string, block_number long, block_timestamp_ms long"
        ).csv(bl_csv_paths)

        out_dir = os.path.join(day_dir, "out")
        shutil.rmtree(out_dir, ignore_errors=True)
        t1 = time.time()
        result = merge_transactions(
            spark,
            tx_paths=tx_paths,
            sourcelog_paths=sl_paths,
            blacklist_paths=list(blacklist_paths) or None,
            blocks=blocks,
        )
        out_parquet = os.path.join(out_dir, "transactions.parquet")
        write_transactions_parquet(result.transactions, out_parquet)
        write_metadata_csv(
            result.transactions, os.path.join(out_dir, "metadata.csv")
        )
        merge_sec = round(time.time() - t1, 1)

        out = spark.read.parquet(out_parquet)
        n_out = out.count()
        # direct re-admission probe: day-d output ∩ prior blacklist
        readmitted = 0
        if blacklist_paths:
            from mempool_dumpster_spark.sources.readers import (
                read_blacklist_csv,
            )

            prior = read_blacklist_csv(spark, blacklist_paths)
            readmitted = out.select(F.lower("hash").alias("hash")).join(
                prior, "hash", "inner"
            ).count()

        # append this day's output hashes to the artifact (reference
        # blacklist format: hash in the SECOND column, like metadata CSV)
        day_bl = os.path.join(bl_dir, f"day{day}_hashes")
        out.select(
            F.col("timestamp").cast("string").alias("c0"), F.col("hash")
        ).write.mode("overwrite").option("header", "false").csv(day_bl)
        new_paths = [
            os.path.join(day_bl, f)
            for f in os.listdir(day_bl)
            if f.endswith(".csv")
        ]
        blacklist_paths.extend(new_paths)
        total_prior_hashes += n_out

        day_ok = n_out == counts["fresh_unique"] and readmitted == 0
        ok = ok and day_ok
        day_reports.append({
            "day": day,
            "gen_sec": gen_sec,
            "merge_wall_sec": merge_sec,
            "receipts": counts["receipts"],
            "receipts_per_sec": round(counts["receipts"] / merge_sec, 1),
            "dup_receipts_injected": counts["dup_receipts"],
            "expected_fresh_unique": counts["fresh_unique"],
            "rows_out": n_out,
            "readmitted_prior_hashes": readmitted,
            "blacklist_hashes_in": total_prior_hashes - n_out,
            "pass": day_ok,
        })
        print(json.dumps(day_reports[-1]), flush=True)
        result.unpersist()

    artifact_bytes = sum(
        os.path.getsize(p) for p in blacklist_paths if os.path.exists(p)
    )
    bytes_per_hash = round(artifact_bytes / max(total_prior_hashes, 1), 1)
    return {
        "n_day": n_day,
        "days": days,
        "total_receipts": sum(d["receipts"] for d in day_reports),
        "total_rows_out": sum(d["rows_out"] for d in day_reports),
        "artifact_bytes": artifact_bytes,
        "artifact_hashes": total_prior_hashes,
        "artifact_bytes_per_hash": bytes_per_hash,
        "artifact_bytes_per_hash_max": ARTIFACT_MAX_BYTES_PER_HASH,
        "days_detail": day_reports,
        "pass": ok and bytes_per_hash <= ARTIFACT_MAX_BYTES_PER_HASH,
    }


def main() -> None:
    n_day = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    days = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    out_json = sys.argv[3] if len(sys.argv) > 3 else None
    procs = int(os.environ.get("SPARK_GRAFT_GEN_PROCS", os.cpu_count() or 8))
    base = f"/tmp/spark_graft_merge_multiday_{n_day}_{days}"

    from mempool_dumpster_spark.session import get_spark

    spark = get_spark("merge-stress-multiday")
    report = run_days(spark, base, n_day, days, procs)
    report["cpus"] = spark.sparkContext.defaultParallelism
    print(json.dumps(report))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(report, f, indent=1)
    spark.stop()
    sys.exit(0 if report["pass"] else 1)


if __name__ == "__main__":
    main()
