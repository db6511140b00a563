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

r16 adds the BUCKETED operating mode (`--bucketed`, closes r15 verdict #1
and #5): instead of accumulating hash CSVs, each day's output hashes are
appended to the persistent hash-bucketed blacklist TABLE
(plans.merge.append_blacklist_table), and J2 reads it bucket-aligned —
zero Exchange on the blacklist side, only the day's receipts shuffle.
`--seed-weeks W` pre-loads the table with W weeks × n_day synthetic
hashes (day indices 0..7W-1; real days follow) so the J2 plan and rates
are measured against a QUARTER-scale accumulated list without generating
a quarter of signed txs. `--kill-rerun-day D` runs real day D twice: the
control run completes fully (output + blacklist append), then the crash
is simulated at the WORST point (outputs destroyed + garbage partials
left behind, the blacklist append already landed) and the whole day is
re-run — asserting rows_out, the output content hash, and the day's
blacklist partition are identical to the control. That is the
crash-recovery contract a daily 04:00-deadline pipeline needs: recover
by re-running the day, nothing else.

Usage:
    python tools/merge_stress_multiday.py [n_day] [days] [out_json]
    python tools/merge_stress_multiday.py 1000000 7 MERGE_STRESS_MULTIDAY_r14.json
    python tools/merge_stress_multiday.py 2000000 4 MERGE_STRESS_MULTIDAY_r16.json \
        --bucketed --seed-weeks 12 --kill-rerun-day 2
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


def _content_hash(df) -> str:
    """Order-independent content fingerprint: sum of per-row xxhash64
    over every column (cast to string, nulls sentinel'd), column order
    fixed by name, accumulated in DECIMAL(38,0) — a LONG sum overflows
    ANSI mode after ~2 rows of adversarial hashes and ~millions of
    average ones. Two outputs with the same row multiset hash equal —
    the kill/rerun idempotence assertion."""
    from pyspark.sql import functions as F

    cols = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00<null>"))
        for c in sorted(df.columns)
    ]
    return str(
        df.select(
            F.xxhash64(*cols).cast("decimal(38,0)").alias("h")
        )
        .agg(F.sum("h").alias("s"))
        .collect()[0]["s"]
    )


def seed_blacklist_table(
    spark, table: str, path: str, n_day: int, seed_days: int
) -> int:
    """Pre-load the bucketed blacklist table with seed_days × n_day
    synthetic hashes (0x + sha2 hex — the right shape and entropy,
    collision-free against real secp256k1 tx hashes for any practical
    purpose) across day indices [0, seed_days). One write: repartition
    by day puts each day in one task, which then writes one file per
    bucket — seed_days × n_buckets files total, the same layout the
    daily appends maintain."""
    from pyspark.sql import functions as F

    from mempool_dumpster_spark.plans.merge import BLACKLIST_TABLE_BUCKETS

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    shutil.rmtree(path, ignore_errors=True)
    n = seed_days * n_day
    seed = (
        spark.range(n)
        .select(
            F.concat(
                F.lit("0x"),
                F.sha2(F.concat(F.lit("seed:"), F.col("id").cast("string")), 256),
            ).alias("hash"),
            (F.col("id") % seed_days).cast("int").alias("day"),
        )
        .repartition(seed_days, "day")
    )
    (
        seed.write.mode("overwrite")
        .partitionBy("day")
        .bucketBy(BLACKLIST_TABLE_BUCKETS, "hash")
        .sortBy("hash")
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )
    return n


def _j2_plan_probe(spark, tx_paths: list[str], table: str, before_day: int) -> dict:
    """Build the day's J2 join standalone and read its executed plan:
    the blacklist side must contribute ZERO Exchange (bucketed scan),
    leaving exactly one Exchange — the day's receipts. Recorded per day
    so the committed artifact carries the plan evidence, and pinned in
    tests/test_sweep.py::test_blacklist_table_bucket_aligned_antijoin."""
    from pyspark.sql import functions as F

    from mempool_dumpster_spark.plans.merge import read_blacklist_table
    from mempool_dumpster_spark.sources.readers import read_tx_csv

    raw = read_tx_csv(spark, tx_paths).valid.withColumnRenamed(
        "hash", "csv_hash"
    )
    bl = read_blacklist_table(spark, table, before_day=before_day).select(
        F.col("hash").alias("csv_hash")
    )
    # broadcast disabled for the probe: at smoke scale the accumulated
    # list is small enough that Spark (correctly) broadcasts it, which
    # hides the layout property this probe exists to pin — that the
    # bucketed table plans an exchange-free sort-merge anti the moment
    # broadcast stops being an option (the real operating regime: the
    # full tier's seeded table is past any broadcast threshold, so
    # there the unforced plan is the same one probed here).
    keys = ("spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold")
    saved = {}
    for key in keys:
        try:
            saved[key] = spark.conf.get(key)
        except Exception:
            saved[key] = None
        spark.conf.set(key, "-1")
    try:
        plan = (
            raw.join(bl, on="csv_hash", how="left_anti")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        for key in keys:
            if saved[key] is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, saved[key])
    return {
        "exchanges": plan.count("Exchange"),
        "bucketed_scan": "Bucketed: true" in plan,
        "sort_merge_anti": "SortMergeJoin" in plan and "LeftAnti" in plan,
        "blacklist_side_exchange_free": (
            plan.count("Exchange") == 1 and "Bucketed: true" in plan
        ),
    }


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


def run_days_bucketed(
    spark,
    base: str,
    n_day: int,
    days: int,
    procs: int,
    seed_weeks: int = 0,
    kill_rerun_day: int | None = None,
) -> dict:
    """The bucketed-table operating mode (r15 verdict #1 + #5): daily
    merges against the persistent hash-bucketed blacklist table, with
    optional quarter-scale seeding and a crash/re-run idempotence day.
    Day indices in the table are ABSOLUTE (seed days first, real days
    after), matching the deployment's monotone day counter."""
    from pyspark.sql import functions as F

    from mempool_dumpster_spark.plans.merge import (
        append_blacklist_table,
        merge_transactions,
        read_blacklist_table,
    )
    from mempool_dumpster_spark.sources.sinks import (
        write_metadata_csv,
        write_transactions_parquet,
    )

    table = f"bl_multiday_{n_day}"
    tbl_path = os.path.join(base, "bl_table")
    seed_days = seed_weeks * 7
    t0 = time.time()
    if seed_days:
        seeded = seed_blacklist_table(spark, table, tbl_path, n_day, seed_days)
    else:
        seeded = 0
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(tbl_path, ignore_errors=True)
    seed_sec = round(time.time() - t0, 1)

    day_reports: list[dict] = []
    kill_report: dict | None = None
    total_out = 0
    ok = True

    def day_inputs(day: int):
        day_dir = os.path.join(base, f"day{day}")
        shards = sorted(
            f for f in os.listdir(day_dir) if f.startswith("txs_")
        )
        tx = [os.path.join(day_dir, f) for f in shards]
        sl = [
            os.path.join(day_dir, f.replace("txs_", "sourcelog_"))
            for f in shards
        ]
        bl = [
            os.path.join(day_dir, f.replace("txs_", "blocks_"))
            for f in shards
        ]
        return day_dir, tx, sl, bl

    def run_one(day: int, abs_day: int, have_table: bool) -> dict:
        """One full daily run: merge → outputs → blacklist append.
        Returns rows_out / content hash / timing — called once per
        normal day, twice for the kill/re-run day."""
        day_dir, tx_paths, sl_paths, bl_csv = day_inputs(day)
        blocks = spark.read.schema(
            "hash string, block_number long, block_timestamp_ms long"
        ).csv(bl_csv)
        out_dir = os.path.join(day_dir, "out")
        t1 = time.time()
        result = merge_transactions(
            spark,
            tx_paths=tx_paths,
            sourcelog_paths=sl_paths,
            blacklist_table=table if have_table else None,
            blacklist_before_day=abs_day,
            blocks=blocks,
        )
        out_parquet = os.path.join(out_dir, "transactions.parquet")
        write_transactions_parquet(result.transactions, out_parquet)
        write_metadata_csv(
            result.transactions, os.path.join(out_dir, "metadata.csv")
        )
        result.unpersist()
        out = spark.read.parquet(out_parquet)
        n_out = out.count()
        chash = _content_hash(out)
        readmitted = 0
        if have_table:
            prior = read_blacklist_table(spark, table, before_day=abs_day)
            readmitted = (
                out.select(F.lower("hash").alias("hash"))
                .join(prior, "hash", "inner")
                .count()
            )
        append_blacklist_table(
            spark, out, table, day=abs_day, path=tbl_path
        )
        return {
            "merge_wall_sec": round(time.time() - t1, 1),
            "rows_out": n_out,
            "content_hash": chash,
            "readmitted_prior_hashes": readmitted,
            "out_dir": out_dir,
            "out_parquet": out_parquet,
        }

    for day in range(days):
        t0 = time.time()
        counts = generate_day(day, n_day, base, procs)
        gen_sec = round(time.time() - t0, 1)
        abs_day = seed_days + day
        have_table = seed_days > 0 or day > 0
        _, tx_paths, _, _ = day_inputs(day)
        plan_probe = (
            _j2_plan_probe(spark, tx_paths, table, abs_day)
            if have_table
            else None
        )
        r = run_one(day, abs_day, have_table)

        if kill_rerun_day is not None and day == kill_rerun_day:
            # Crash simulation at the WORST recovery point: outputs
            # destroyed mid-write (garbage partials + _temporary left
            # behind) while the day's blacklist append ALREADY landed.
            # The recovery contract is "re-run the whole day": J2 reads
            # strictly day < abs_day so the day's own append is
            # invisible, the overwrite sinks clear the garbage, and the
            # append replaces the day partition. Everything must come
            # out identical to the control run.
            shutil.rmtree(r["out_dir"], ignore_errors=True)
            os.makedirs(os.path.join(r["out_parquet"], "_temporary"))
            with open(
                os.path.join(
                    r["out_parquet"], "part-00000-dead.snappy.parquet"
                ),
                "wb",
            ) as f:
                f.write(b"\x00garbage-from-killed-writer\x00" * 64)
            rerun = run_one(day, abs_day, have_table)
            day_part_rows = (
                spark.table(table)
                .filter(F.col("day") == abs_day)
                .count()
            )
            out_now = spark.read.parquet(r["out_parquet"])
            day_part_match = (
                spark.table(table)
                .filter(F.col("day") == abs_day)
                .select("hash")
                .join(
                    out_now.select(F.lower("hash").alias("hash")),
                    "hash",
                    "inner",
                )
                .count()
                == rerun["rows_out"]
            )
            kill_report = {
                "day": day,
                "abs_day": abs_day,
                "control_rows": r["rows_out"],
                "rerun_rows": rerun["rows_out"],
                "content_hash_control": r["content_hash"],
                "content_hash_rerun": rerun["content_hash"],
                "content_hash_match": (
                    r["content_hash"] == rerun["content_hash"]
                ),
                "rerun_readmitted": rerun["readmitted_prior_hashes"],
                "blacklist_day_partition_rows": day_part_rows,
                "blacklist_day_partition_matches_output": day_part_match,
                "pass": (
                    r["rows_out"] == rerun["rows_out"]
                    and r["content_hash"] == rerun["content_hash"]
                    and rerun["readmitted_prior_hashes"] == 0
                    and day_part_rows == rerun["rows_out"]
                    and day_part_match
                ),
            }
            ok = ok and kill_report["pass"]
            r = rerun

        total_out += r["rows_out"]
        day_ok = (
            r["rows_out"] == counts["fresh_unique"]
            and r["readmitted_prior_hashes"] == 0
            and (
                plan_probe is None
                or plan_probe["blacklist_side_exchange_free"]
            )
        )
        ok = ok and day_ok
        day_reports.append({
            "day": day,
            "abs_day": abs_day,
            "gen_sec": gen_sec,
            "merge_wall_sec": r["merge_wall_sec"],
            "receipts": counts["receipts"],
            "receipts_per_sec": round(
                counts["receipts"] / r["merge_wall_sec"], 1
            ),
            "dup_receipts_injected": counts["dup_receipts"],
            "expected_fresh_unique": counts["fresh_unique"],
            "rows_out": r["rows_out"],
            "readmitted_prior_hashes": r["readmitted_prior_hashes"],
            "blacklist_hashes_in": seeded + total_out - r["rows_out"],
            "j2_plan": plan_probe,
            "pass": day_ok,
        })
        print(json.dumps(day_reports[-1]), flush=True)

    artifact_bytes = 0
    for root, _dirs, files in os.walk(tbl_path):
        artifact_bytes += sum(
            os.path.getsize(os.path.join(root, f)) for f in files
        )
    total_hashes = seeded + total_out
    bytes_per_hash = round(artifact_bytes / max(total_hashes, 1), 1)
    return {
        "mode": "bucketed_table",
        "n_day": n_day,
        "days": days,
        "seed_weeks": seed_weeks,
        "seeded_hashes": seeded,
        "seed_write_sec": seed_sec,
        "total_receipts": sum(d["receipts"] for d in day_reports),
        "total_rows_out": total_out,
        "artifact_bytes": artifact_bytes,
        "artifact_hashes": total_hashes,
        "artifact_bytes_per_hash": bytes_per_hash,
        "artifact_bytes_per_hash_max": ARTIFACT_MAX_BYTES_PER_HASH,
        "kill_rerun": kill_report,
        "days_detail": day_reports,
        "pass": ok and bytes_per_hash <= ARTIFACT_MAX_BYTES_PER_HASH,
    }


def main() -> None:
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_day = int(args[0]) if args else 1_000_000
    days = int(args[1]) if len(args) > 1 else 7
    out_json = args[2] if len(args) > 2 else None
    procs = int(os.environ.get("SPARK_GRAFT_GEN_PROCS", os.cpu_count() or 8))

    def flag_val(name: str) -> str | None:
        for fl in flags:
            if fl.startswith(f"--{name}="):
                return fl.split("=", 1)[1]
        return None

    bucketed = "--bucketed" in flags
    seed_weeks = int(flag_val("seed-weeks") or 0)
    kr = flag_val("kill-rerun-day")
    kill_rerun_day = int(kr) if kr is not None else None
    base = f"/tmp/spark_graft_merge_multiday_{n_day}_{days}"

    from mempool_dumpster_spark.session import get_spark

    spark = get_spark("merge-stress-multiday")
    if bucketed:
        report = run_days_bucketed(
            spark, base, n_day, days, procs,
            seed_weeks=seed_weeks, kill_rerun_day=kill_rerun_day,
        )
    else:
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
