"""Streaming-collector stress: replay a synthetic day through the LIVE
fork-before-dedup topology with a mid-run kill + checkpoint restart.

The reference's 24/7 component is the collector (SURVEY.md §3.3;
reference collector/tx_processor.go:201-313): every receipt lands in the
sourcelog, first arrivals survive a 30-min-TTL dedup, get the full
RLP+ECDSA parse, and route to transactions or trash. The batch merge has
three committed stress tiers up to 40 M receipts (MERGE_STRESS_r12), but
until r13 the streaming topology only had correctness e2e tests — no
committed rate artifact. This tool closes that gap:

1. Generates a deterministic ≥1 M-receipt day (index-derived like
   tools/merge_stress.py — tx i signed with priv 0x300000+i, 1+i%3
   receipts across three sources, every 50th index an undecodable
   payload to exercise trash routing) in EVENT-TIME ORDER, because
   `dropDuplicatesWithinWatermark` only guarantees dedup for rows
   arriving within the watermark delay — a replay that scatters event
   times across the day would let the watermark evict state mid-day
   and re-admit duplicates the real collector (which sees wall-clock
   order) never would. File mtimes are set ascending so the file
   source's oldest-first listing replays the day in order.

2. Replays through the REAL `start_collector` topology (both queries:
   pre-dedup sourcelog sink + dedup→parse→foreachBatch), KILLS the
   queries mid-run (after ~45% of receipts, without waiting for a batch
   boundary), then restarts from the same checkpoint with
   `trigger(availableNow=True)` to drain the rest.

3. Verifies the exactly-once story post-restart, honestly split by sink
   semantics:
   - sourcelog is a true streaming file sink (transactional
     _spark_metadata commit log) → read back EXACTLY n_valid_receipts;
   - transactions/trash are foreachBatch CSV appends → at-least-once by
     design (collector.py docstring; the daily merge re-dedups): the
     DISTINCT hash count must be exactly n_valid_unique, and any
     duplicate rows (≤ one replayed micro-batch) are counted and
     reported, never hidden.

4. Records steady receipts/s (Σ inputRows / Σ triggerExecution over the
   dedup query's micro-batches, both legs), wall-clock rate, and the
   dedup state store's peak rows/bytes from the progress events.

5. `--inclusion` additionally replays the watermarked stream-stream
   inclusion join (streaming/inclusion.py) over the same day plus a
   block stream (60% of valid txs included at +3 s): left-outer rows
   must emit EXACTLY once each after the watermark closes their
   [received_at - 30 s, received_at + 10 min] window — two sentinel
   drain waves push the min-of-both-streams watermark past the last
   real window — and the join state peak is recorded. This is the one
   streaming operator whose state growth at scale was previously only
   unit-tested.

Usage:
    python tools/stream_stress.py [n_unique] [out_json] [--inclusion]
    python tools/stream_stress.py 500000 STREAM_STRESS_r13.json --inclusion

Generation parallelizes across processes and caches shards under
/tmp/spark_graft_stream_stress_<n>; re-runs reuse them. Sinks and
checkpoints are recreated fresh per run.
"""

from __future__ import annotations

import datetime as dt
import json
import multiprocessing as mp
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

T0_MS = 1_693_785_600_000  # 2023-09-04 00:00:00 UTC
DAY_MS = 86_400_000
SOURCES = ["alchemy", "infura", "bloxroute"]
GARBAGE_EVERY = 50  # i % 50 == 7 → undecodable payload (trash routing)
INCLUDED_MOD = 5  # i % 5 in (0,1,2) → 60% of valid txs land on chain


def _ts_str(ms: int) -> str:
    t = dt.datetime.fromtimestamp(ms / 1000.0, tz=dt.timezone.utc)
    return t.strftime("%Y-%m-%d %H:%M:%S.") + f"{ms % 1000:03d}"


def _gen_shard(args: tuple[int, int, int, str, int, int]) -> dict:
    """Generate txs [lo, hi) — a CONTIGUOUS event-time slice — into
    several small receipt files (so the stream replays in many
    micro-batches) plus one blocks file for the inclusion phase."""
    shard, lo, hi, base, step_ms, parts = args
    from txgen import make_tx, tx_hash_of

    span = hi - lo
    bounds = [lo + (span * p) // parts for p in range(parts + 1)]
    counts = {"receipts": 0, "valid_receipts": 0, "valid_unique": 0,
              "garbage": 0, "included_unique": 0, "included_receipts": 0}
    bl_f = open(os.path.join(base, "blocks", f"blocks_{shard:03d}.csv"), "w")
    for p in range(parts):
        f = open(
            os.path.join(base, "in", f"rx_{shard:03d}_{p:03d}.csv"), "w"
        )
        for i in range(bounds[p], bounds[p + 1]):
            ts = T0_MS + i * step_ms
            if i % GARBAGE_EVERY == 7:
                # undecodable payload, unique per index → trashes once
                f.write(f"{_ts_str(ts)},0xdead{i:010x},{SOURCES[i % 3]}\n")
                counts["garbage"] += 1
                counts["receipts"] += 1
                continue
            raw = make_tx(priv=0x300000 + i, nonce=i % 1000, tx_type=i % 3)
            counts["valid_unique"] += 1
            n_rx = 1 + (i % 3)
            for j in range(n_rx):
                f.write(f"{_ts_str(ts + 211 * j)},{raw},{SOURCES[(i + j) % 3]}\n")
            counts["receipts"] += n_rx
            counts["valid_receipts"] += n_rx
            if i % INCLUDED_MOD < 3:
                h = tx_hash_of(raw)
                bl_f.write(
                    f"{_ts_str(ts + 3000)},{18_000_000 + i // 1000},{h}\n"
                )
                counts["included_unique"] += 1
                counts["included_receipts"] += n_rx
        f.close()
    bl_f.close()
    return counts


def generate(
    n_unique: int, base: str, procs: int, parts: int = 8,
    span_days: int = 1,
) -> dict:
    """span_days stretches the EVENT-TIME span while keeping the
    arrival RATE fixed (step_ms depends only on n_unique/span_days):
    a 3-day replay at the same rate has the same 30-min dedup working
    set but 3× the total receipts — the shape the TTL-plateau check
    needs (a state leak grows with total, a healthy TTL with the
    window)."""
    marker = os.path.join(base, "_DONE")
    if os.path.exists(marker):
        with open(marker) as f:
            totals = json.load(f)
        _apply_replay_order(base)
        return totals
    for sub in ("in", "blocks"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    step_ms = max(1, span_days * DAY_MS // max(n_unique, 1))
    step = (n_unique + procs - 1) // procs
    jobs = [
        (w, w * step, min((w + 1) * step, n_unique), base, step_ms, parts)
        for w in range(procs)
        if w * step < n_unique
    ]
    with mp.Pool(procs) as pool:
        shard_counts = pool.map(_gen_shard, jobs)
    totals: dict = {k: sum(c[k] for c in shard_counts) for k in shard_counts[0]}
    totals["n_unique"] = n_unique
    totals["step_ms"] = step_ms
    _apply_replay_order(base)
    with open(marker, "w") as f:
        json.dump(totals, f)
    return totals


def _apply_replay_order(base: str) -> None:
    """Ascending mtimes = the file source's oldest-first listing replays
    the day in event-time order (see module docstring). Applied to the
    blocks dir too (r14 fix): the pool workers write blocks shards with
    effectively simultaneous mtimes, so the block stream could list a
    DAY-END shard before a mid-day one — its watermark then advances
    past the earlier shard and drops those block rows as late, flipping
    their txs' inclusion rows to not-included (caught by the 12k smoke
    leg; the committed r13 500k pass was mtime luck). Filenames sort by
    shard = ascending event time, so name order IS event-time order.
    Reapplied on every cache hit — mtimes are not durable corpus state."""
    now = time.time() - 86_400
    for sub in ("in", "blocks"):
        d = os.path.join(base, sub)
        if not os.path.isdir(d):
            continue
        for k, name in enumerate(sorted(os.listdir(d))):
            os.utime(os.path.join(d, name), (now + k, now + k))


class _ProgressTap:
    """Dedup-query progress accumulator: batchId → (inputRows, durMs,
    stateRows, stateBytes), deduped so poll-loop lastProgress reads and
    post-run recentProgress sweeps never double-count a batch."""

    def __init__(self) -> None:
        self.batches: dict[int, tuple[int, int, int, int]] = {}

    def record(self, p: dict | None) -> None:
        if not p:
            return
        ops = p.get("stateOperators") or []
        srows = max((o.get("numRowsTotal", 0) for o in ops), default=0)
        sbytes = max((o.get("memoryUsedBytes", 0) for o in ops), default=0)
        self.batches[p["batchId"]] = (
            int(p.get("numInputRows", 0)),
            int((p.get("durationMs") or {}).get("triggerExecution", 0)),
            srows,
            sbytes,
        )

    def sweep(self, query) -> None:
        for p in query.recentProgress:
            self.record(p)

    @property
    def input_rows(self) -> int:
        return sum(v[0] for v in self.batches.values())

    def summary(self) -> dict:
        rows = self.input_rows
        busy_ms = sum(v[1] for v in self.batches.values() if v[0] > 0)
        return {
            "n_batches": len(self.batches),
            "input_rows_seen": rows,
            "busy_sec": round(busy_ms / 1000.0, 1),
            "steady_rows_per_sec": (
                round(rows / (busy_ms / 1000.0), 1) if busy_ms else None
            ),
            "state_rows_peak": max(
                (v[2] for v in self.batches.values()), default=0
            ),
            "state_bytes_peak": max(
                (v[3] for v in self.batches.values()), default=0
            ),
        }


class _StateStoreConf:
    """Context manager flipping the session's state-store provider for
    one leg's FRESH checkpoint (the provider is fixed per checkpoint,
    so distinct tags keep legs separate), restoring the prior value on
    exit. Factored out in r15 so the collector-dedup, TTL-plateau and
    ST4 legs get the same RocksDB parametrization the inclusion join
    got in r14 (r14 verdict next-round #5)."""

    CONF_KEY = "spark.sql.streaming.stateStore.providerClass"

    def __init__(self, spark, state_store: str | None):
        self.spark = spark
        self.state_store = state_store
        self.prev = None

    def __enter__(self):
        from mempool_dumpster_spark.session import (
            ROCKSDB_STATE_STORE_PROVIDER,
        )

        self.prev = self.spark.conf.get(self.CONF_KEY, None)
        if self.state_store == "rocksdb":
            self.spark.conf.set(self.CONF_KEY, ROCKSDB_STATE_STORE_PROVIDER)
        return self

    def __exit__(self, *exc):
        if self.state_store == "rocksdb":
            if self.prev:
                self.spark.conf.set(self.CONF_KEY, self.prev)
            else:
                self.spark.conf.unset(self.CONF_KEY)
        return False


def drain_collector(
    spark, base: str, counts: dict, max_files_per_trigger: int | None = None,
    tag: str = "", state_store: str | None = None,
) -> dict:
    """Single availableNow drain through the live topology, no kill —
    the bench's streaming-throughput measurement (mirrors _bench_merge's
    n=15000 tier; the kill/restart semantics live in replay_collector
    and the committed STREAM_STRESS artifact). Sinks and checkpoint are
    recreated fresh so every call measures a full cold replay.

    max_files_per_trigger defaults to 64 (r17, was 16; env override
    SPARK_GRAFT_STREAM_MFPT): the r16 verdict's state-store-vs-overhead
    measurement showed per-batch FIXED cost — 32 state-store delta-file
    commits (~1.2 s/batch wall) plus trigger/offset machinery — was the
    dominant term at 16 files/batch (~3.7k receipts), i.e. the gate was
    measuring micro-batch bookkeeping, not the pipeline. 64 files/batch
    amortizes it (interleaved A/B: steady ~800 → ~2,000-2,600 r/s,
    identical ledgers); this is ordinary trigger sizing — the production
    collector picks its trigger interval the same way — and the
    exactly-once kill/replay proof (replay_collector, mfpt=12, several
    batches + mid-batch kill) is deliberately unchanged. State-partition
    count stays at the session's cores: it also fixes the post-dedup
    ECDSA parse parallelism, which must keep scaling with cores at
    production rates. The stream floor gate is re-calibrated to the new
    batch size (bench.py STREAM_15K_STEADY_FLOOR, r17 note)."""
    if max_files_per_trigger is None:
        max_files_per_trigger = int(
            os.environ.get("SPARK_GRAFT_STREAM_MFPT", "64")
        )
    from mempool_dumpster_spark.streaming.collector import (
        file_stream_source,
        start_collector,
    )

    out_dir = os.path.join(base, f"bench_out{tag}")
    ckpt = os.path.join(base, f"bench_ckpt{tag}")
    for d in (out_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    tap = _ProgressTap()
    t0 = time.time()
    with _StateStoreConf(spark, state_store):
        qs = start_collector(
            file_stream_source(spark, os.path.join(base, "in"),
                               max_files_per_trigger),
            out_dir=out_dir,
            checkpoint_dir=ckpt,
            trigger_available_now=True,
        )
        qs.await_all()
    wall = round(time.time() - t0, 2)
    tap.sweep(qs.transactions)
    tx_distinct = (
        spark.read.schema("timestamp_ms long, hash string, raw_tx string")
        .csv(f"{out_dir}/transactions")
        .select("hash")
        .distinct()
        .count()
    )
    s = tap.summary()
    return {
        "state_store": state_store or "memory",
        "n_receipts": counts["receipts"],
        "wall_sec": wall,
        "receipts_per_sec_wall": round(counts["receipts"] / wall, 1),
        "receipts_per_sec_steady": s["steady_rows_per_sec"],
        "n_batches": s["n_batches"],
        "state_rows_peak": s["state_rows_peak"],
        "unique_exact": tx_distinct == counts["valid_unique"],
    }


def replay_collector(
    spark, base: str, counts: dict, kill_frac: float = 0.45,
    max_files_per_trigger: int = 12,
    tag: str = "", state_store: str | None = None,
) -> dict:
    from mempool_dumpster_spark.streaming.collector import (
        file_stream_source,
        start_collector,
    )

    out_dir = os.path.join(base, f"out{tag}")
    ckpt = os.path.join(base, f"ckpt{tag}")
    for d in (out_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    in_dir = os.path.join(base, "in")
    tap = _ProgressTap()
    n_receipts = counts["receipts"]

    with _StateStoreConf(spark, state_store):
        # Leg 1 — continuous trigger; kill mid-run, not at a batch
        # boundary.
        t0 = time.time()
        qs = start_collector(
            file_stream_source(spark, in_dir, max_files_per_trigger),
            out_dir=out_dir,
            checkpoint_dir=ckpt,
            trigger_available_now=False,
        )
        deadline = time.time() + 3600
        while tap.input_rows < kill_frac * n_receipts:
            if time.time() > deadline:
                qs.stop_all()
                raise RuntimeError("leg 1 made no progress within 1 h")
            time.sleep(0.5)
            tap.record(qs.transactions.lastProgress)
        tap.sweep(qs.transactions)
        qs.stop_all()  # interrupts any in-flight micro-batch
        leg1_sec = round(time.time() - t0, 1)
        rows_at_kill = tap.input_rows

        # Leg 2 — restart from the SAME checkpoint, drain to completion.
        t1 = time.time()
        qs2 = start_collector(
            file_stream_source(spark, in_dir, max_files_per_trigger),
            out_dir=out_dir,
            checkpoint_dir=ckpt,
            trigger_available_now=True,
        )
        qs2.await_all()
        leg2_sec = round(time.time() - t1, 1)
        tap.sweep(qs2.transactions)

    # --- exactly-once verification, split by sink semantics ---
    sl = spark.read.schema(
        "timestamp_ms long, hash string, source string"
    ).csv(f"{out_dir}/sourcelog")
    sourcelog_rows = sl.count()

    txs = spark.read.schema(
        "timestamp_ms long, hash string, raw_tx string"
    ).csv(f"{out_dir}/transactions")
    tx_rows = txs.count()
    tx_distinct = txs.select("hash").distinct().count()

    trash = spark.read.schema(
        "timestamp_ms long, hash string, source string, reason string,"
        " notes string"
    ).csv(f"{out_dir}/trash")
    trash_rows = trash.count()
    trash_distinct = trash.select("timestamp_ms").distinct().count()

    wall = leg1_sec + leg2_sec
    report = {
        "state_store": state_store or "memory",
        "n_receipts": n_receipts,
        "n_valid_receipts": counts["valid_receipts"],
        "n_valid_unique": counts["valid_unique"],
        "n_garbage": counts["garbage"],
        "leg1_wall_sec": leg1_sec,
        "leg2_wall_sec": leg2_sec,
        "rows_seen_at_kill": rows_at_kill,
        "receipts_per_sec_wall": round(n_receipts / wall, 1),
        "dedup_query": tap.summary(),
        "sourcelog_rows": sourcelog_rows,
        "sourcelog_exact": sourcelog_rows == counts["valid_receipts"],
        "transactions_rows": tx_rows,
        "transactions_distinct": tx_distinct,
        "transactions_distinct_exact": tx_distinct == counts["valid_unique"],
        "transactions_duplicate_rows": tx_rows - tx_distinct,
        "trash_rows": trash_rows,
        "trash_distinct": trash_distinct,
        "trash_distinct_exact": trash_distinct == counts["garbage"],
        "max_files_per_trigger": max_files_per_trigger,
    }
    failures = [
        k for k in
        ("sourcelog_exact", "transactions_distinct_exact",
         "trash_distinct_exact")
        if not report[k]
    ]
    report["pass"] = not failures
    if failures:
        report["failed_checks"] = failures
    return report


def _link_tree(src: str, dst: str) -> None:
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for name in sorted(os.listdir(src)):
        os.link(os.path.join(src, name), os.path.join(dst, name))


def replay_inclusion(
    spark, base: str, counts: dict, max_files_per_trigger: int = 12,
    tag: str = "", state_store: str | None = None,
) -> dict:
    """Watermarked stream-stream inclusion join at replay scale
    (verdict r12 #7): every receipt of an included tx joins its block
    row exactly once; every receipt of a not-included tx emits its
    left-outer row exactly once AFTER the watermark closes its window.
    The parquet sink's _spark_metadata commit log makes the read-back
    exactly-once, so row counts are hard assertions, not estimates.

    state_store="rocksdb" (r13 verdict #3) runs the same leg under the
    RocksDB provider — the scale-safe backend for this operator's
    314.8 MB/1M-day heap state — set via session conf for THIS leg's
    fresh checkpoint only (the provider is fixed per checkpoint, so
    the tag keeps the two legs' checkpoints separate)."""
    from pyspark.sql import functions as F

    from mempool_dumpster_spark.functions.rlp_udf import tx_hash_udf
    from mempool_dumpster_spark.streaming.collector import file_stream_source
    from mempool_dumpster_spark.streaming.inclusion import stream_inclusion_join

    tx_dir = os.path.join(base, f"incl_tx{tag}")
    bl_dir = os.path.join(base, f"incl_blocks{tag}")
    _link_tree(os.path.join(base, "in"), tx_dir)
    _link_tree(os.path.join(base, "blocks"), bl_dir)
    out = os.path.join(base, f"incl_out{tag}")
    ckpt = os.path.join(base, f"incl_ckpt{tag}")
    for d in (out, ckpt):
        shutil.rmtree(d, ignore_errors=True)

    n_unique = counts["n_unique"]
    last_ms = T0_MS + (n_unique - 1) * counts["step_ms"]
    # sentinel event times: far past the last real window
    # (received_at + 10 min + 5 min watermark), so the min-of-both
    # watermark closes every real left-outer row
    sent_ms = last_ms + 2 * 3_600_000
    from txgen import make_tx

    sent_raw = make_tx(priv=0x7FFFFF, nonce=1)

    tap = _ProgressTap()

    def drain() -> None:
        txs = (
            file_stream_source(spark, tx_dir, max_files_per_trigger)
            .withColumn("hash", tx_hash_udf(F.col("raw_tx")))
            .filter(F.col("hash").isNotNull())
            .drop("raw_tx")
        )
        blocks = (
            spark.readStream.schema(
                "block_ts timestamp, block_number long, hash string"
            )
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .csv(bl_dir)
        )
        joined = stream_inclusion_join(
            txs, blocks, max_delay="10 minutes", before_slack="30 seconds",
            watermark_delay="5 minutes", how="leftOuter",
        )
        q = (
            joined.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        while q.isActive:
            time.sleep(0.5)
            tap.record(q.lastProgress)
        q.awaitTermination()
        tap.sweep(q)

    t0 = time.time()
    with _StateStoreConf(spark, state_store):
        drain()
        # Two sentinel waves: wave 1's rows advance the watermark that wave
        # 2's batch USES for eviction (Spark applies the watermark computed
        # from batch k-1 in batch k), so every real window is closed by the
        # end of wave 2. Sentinel rows themselves stay in state, never
        # emitted.
        for wave in (1, 2):
            with open(os.path.join(tx_dir, f"zz_sentinel_{wave}.csv"), "w") as f:
                f.write(f"{_ts_str(sent_ms + wave)},{sent_raw},alchemy\n")
            with open(os.path.join(bl_dir, f"zz_sentinel_{wave}.csv"), "w") as f:
                f.write(f"{_ts_str(sent_ms + wave)},0,0xsentinel\n")
            drain()
    wall = round(time.time() - t0, 1)

    res = spark.read.parquet(out)
    total = res.count()
    included = res.filter("included = 1").count()
    not_included = total - included
    distinct = res.select("received_at", "source", "hash").distinct().count()

    exp_included = counts["included_receipts"]
    exp_not = counts["valid_receipts"] - exp_included
    report = {
        "state_store": state_store or "memory",
        "wall_sec": wall,
        "receipts_per_sec_wall": round(counts["valid_receipts"] / wall, 1),
        "rows_out": total,
        "included_rows": included,
        "not_included_rows": not_included,
        "expected_included": exp_included,
        "expected_not_included": exp_not,
        "exactly_once": (
            total == distinct
            and included == exp_included
            and not_included == exp_not
        ),
        "join_query": tap.summary(),
    }
    report["pass"] = report["exactly_once"]
    return report


#: max allowed growth of the dedup state peak when total receipts
#: triple at FIXED arrival rate — a healthy 30-min TTL holds state at
#: the window's working set; a leak tracks total volume and reads ~3×.
PLATEAU_MAX_RATIO = 1.2


def ttl_plateau(
    spark, n_unique_per_day: int, procs: int,
    state_store: str | None = None,
) -> dict:
    """Watermark-eviction plateau assertion (r13 verdict #5): r13's
    state_rows_peak 45,207 at 1 M receipts SHOWED eviction working but
    never asserted it — a state leak would only read as a bigger peak.
    Replay the same arrival rate over 1 day and over a 3×-longer day
    (3× uniques, identical step_ms → identical 30-min working set) and
    assert the dedup state peak stays within PLATEAU_MAX_RATIO instead
    of growing with total receipts."""
    legs: dict = {}
    peaks: dict[int, int] = {}
    warm = None
    if state_store == "rocksdb":
        # The FIRST stateful query a JVM runs against a fresh RocksDB
        # provider pays one-off native-library load + store setup that
        # r15 recorded as a 2.5× slower 1-day leg (949.6 r/s vs
        # 2,401.9 on the 3-day leg, identical code/data shape) — pure
        # ordering artifact, not a throughput property. Warm the
        # provider with a small unrecorded drain so BOTH measured legs
        # run against a warm native store and their rates compare;
        # the warm leg is annotated in the artifact, not hidden.
        wbase = f"/tmp/spark_graft_stream_plateau_warm_{n_unique_per_day}"
        wcounts = generate(
            max(2_000, n_unique_per_day // 20), wbase, procs,
            parts=4, span_days=1,
        )
        wr = drain_collector(
            spark, wbase, wcounts,
            tag=f"_warm_{state_store}", state_store=state_store,
        )
        warm = {
            "n_receipts": wr["n_receipts"],
            "wall_sec": wr["wall_sec"],
        }
    for span in (1, 3):
        base = (
            f"/tmp/spark_graft_stream_plateau_{n_unique_per_day}_{span}d"
        )
        # parts scales with span so EVENT-TIME-PER-FILE is constant:
        # the drain ingests a fixed number of files per micro-batch,
        # and state holds roughly one batch's event-time width (the
        # watermark used for eviction lags one batch) — with a fixed
        # file count the 3-day leg would see 3×-wider batches and its
        # state peak would triple for batch-granularity reasons that
        # have nothing to do with TTL health (measured: ratio 2.2 on
        # the 12k smoke before this fix). Equal-width files make the
        # peaks comparable, so the ratio isolates leak-vs-TTL.
        counts = generate(
            n_unique_per_day * span, base, procs, parts=8 * span,
            span_days=span,
        )
        r = drain_collector(
            spark, base, counts,
            tag=f"_{state_store}" if state_store else "",
            state_store=state_store,
        )
        legs[f"span_{span}d"] = r
        peaks[span] = r["state_rows_peak"]
    ratio = round(peaks[3] / max(peaks[1], 1), 3)
    # context: uniques arriving inside one 30-min watermark window —
    # the working set a healthy TTL holds, independent of span
    window_uniques = int(n_unique_per_day * 30 / 1440)
    return {
        "state_store": state_store or "memory",
        "n_unique_per_day": n_unique_per_day,
        "window_30min_uniques": window_uniques,
        "state_rows_peak_1d": peaks[1],
        "state_rows_peak_3d": peaks[3],
        "peak_ratio_3d_over_1d": ratio,
        "max_ratio": PLATEAU_MAX_RATIO,
        "warm_drain": warm,
        "legs": legs,
        "pass": ratio <= PLATEAU_MAX_RATIO
        and all(r["unique_exact"] for r in legs.values()),
    }


def replay_stateful(
    spark, base: str, counts: dict, kill_frac: float = 0.45,
    max_files_per_trigger: int = 12,
    tag: str = "", state_store: str | None = None,
) -> dict:
    """ST4 stress (r14 verdict next-round #7): the one custom stateful
    operator family (streaming/stateful.sources_attach_stream —
    applyInPandasWithState first-source-wins with event-time TTL)
    replayed at full receipt scale with a mid-run kill/restart.

    Assertions:
    - EXACT semantics at scale: every key's final emitted (sources
      array, first_seen_ms) equals the batch J1 fold over the same
      input — ordered dedup by (ts, source), min timestamp. The stream
      and batch answers agree because each hash's receipts land within
      ~1 s of each other (far inside the 30-min TTL) and in one input
      file, so no key's state is evicted mid-life.
    - EXACTLY-ONCE OUTPUT: update-mode emissions flow through an
      idempotent foreachBatch (one overwrite-dir per batch id), so a
      replayed post-kill batch lands byte-identically instead of
      duplicating; (key, batch) pairs are asserted unique and the kill
      is asserted mid-run.
    - TTL EVICTION: the state peak stays a small fraction of total
      keys — a 30-min working set over a day-long replay — recorded as
      peak/keys and bounded, the same leak-vs-TTL signal the plateau
      section measures for ST1.
    """
    from pyspark.sql import functions as F

    from mempool_dumpster_spark.functions.rlp_udf import tx_hash_udf
    from mempool_dumpster_spark.functions.scalars import epoch_ms
    from mempool_dumpster_spark.streaming.collector import file_stream_source
    from mempool_dumpster_spark.streaming.stateful import (
        sources_attach_stream,
    )

    in_dir = os.path.join(base, "in")
    out = os.path.join(base, f"st4_out{tag}")
    ckpt = os.path.join(base, f"st4_ckpt{tag}")
    for d in (out, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(out)
    tap = _ProgressTap()
    n_receipts = counts["receipts"]

    def start(available_now: bool):
        stream = (
            file_stream_source(spark, in_dir, max_files_per_trigger)
            .withColumn("hash", tx_hash_udf(F.col("raw_tx")))
            .filter(F.col("hash").isNotNull())
            .select("hash", "source", "received_at")
        )
        attached = sources_attach_stream(stream)

        def write_batch(bdf, bid: int) -> None:
            # idempotent per-batch dir: a post-restart replay of batch
            # `bid` overwrites with identical content (exactly-once)
            bdf.withColumn("bid", F.lit(bid)).write.mode(
                "overwrite"
            ).parquet(os.path.join(out, f"b{bid:06d}"))

        w = (
            attached.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
        )
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start()

    with _StateStoreConf(spark, state_store):
        # leg 1: continuous trigger, kill mid-run
        t0 = time.time()
        q = start(available_now=False)
        deadline = time.time() + 3600
        while tap.input_rows < kill_frac * n_receipts:
            if time.time() > deadline:
                q.stop()
                raise RuntimeError("ST4 leg 1 made no progress within 1 h")
            time.sleep(0.5)
            tap.record(q.lastProgress)
        tap.sweep(q)
        q.stop()
        leg1_sec = round(time.time() - t0, 1)
        rows_at_kill = tap.input_rows

        # leg 2: restart from the same checkpoint, drain
        t1 = time.time()
        q2 = start(available_now=True)
        while q2.isActive:
            time.sleep(0.5)
            tap.record(q2.lastProgress)
        q2.awaitTermination()
        tap.sweep(q2)
        leg2_sec = round(time.time() - t1, 1)

    emitted = spark.read.option("recursiveFileLookup", "true").parquet(out)
    emitted.cache()
    rows_out = emitted.count()
    kb_distinct = emitted.select("key", "bid").distinct().count()

    from pyspark.sql import Window

    final = (
        emitted.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("key").orderBy(F.col("bid").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .select("key", "sources", "first_seen_ms")
    )
    receipts_src = (
        spark.read.schema("received_at timestamp, raw_tx string, source string")
        .csv(in_dir)
        .withColumn("hash", tx_hash_udf(F.col("raw_tx")))
        .filter(F.col("hash").isNotNull())
    )
    # Generator invariant the fold-order oracle below depends on (r15
    # advice): the oracle sorts each hash's receipts GLOBALLY by
    # (ts, source) while the operator folds them in per-micro-batch
    # arrival order — the two agree only when every hash's receipts sit
    # inside ONE input file (and therefore one trigger: file streams
    # never split a file across triggers). Assert it instead of assuming
    # it, so a future generator change that scatters a hash across files
    # fails HERE as a harness bug rather than flaking
    # final_fold_mismatches in a way that reads as an operator bug.
    spread = (
        receipts_src.select("hash", F.input_file_name().alias("f"))
        .groupBy("hash")
        .agg(F.count_distinct("f").alias("nf"))
        .filter(F.col("nf") > 1)
        .count()
    )
    if spread:
        raise RuntimeError(
            f"stress-generator invariant violated: {spread} hashes span "
            "multiple input files, so the fold-order oracle is undefined "
            "— fix the generator, do not loosen the mismatch assertion"
        )
    expected = (
        receipts_src
        .select(
            "hash", "source", epoch_ms("received_at").alias("ts_ms")
        )
        .groupBy("hash")
        .agg(
            F.array_distinct(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts_ms", "source"))
                    ),
                    lambda s: s.getField("source"),
                )
            ).alias("exp_sources"),
            F.min("ts_ms").alias("exp_first_ms"),
        )
    )
    joined = final.join(expected, final.key == expected.hash, "full_outer")
    mismatches = joined.filter(
        F.col("key").isNull()
        | F.col("hash").isNull()
        | (F.col("sources") != F.col("exp_sources"))
        | (F.col("first_seen_ms") != F.col("exp_first_ms"))
    ).count()
    n_keys = final.count()
    emitted.unpersist()

    s = tap.summary()
    peak_frac = round(s["state_rows_peak"] / max(counts["valid_unique"], 1), 4)
    report = {
        "state_store": state_store or "memory",
        "n_receipts": n_receipts,
        "leg1_wall_sec": leg1_sec,
        "leg2_wall_sec": leg2_sec,
        "rows_seen_at_kill": rows_at_kill,
        "receipts_per_sec_wall": round(
            n_receipts / (leg1_sec + leg2_sec), 1
        ),
        "rows_emitted": rows_out,
        "keys_final": n_keys,
        "keys_exact": n_keys == counts["valid_unique"],
        "final_fold_mismatches": mismatches,
        "key_batch_unique": kb_distinct == rows_out,
        "kill_mid_run": 0 < rows_at_kill < n_receipts,
        "stateful_query": s,
        "state_peak_frac_of_keys": peak_frac,
        # TTL eviction evidence: a leak would hold ~every key (frac→1);
        # a healthy event-time TTL holds roughly the watermark-lagged
        # batch window (a few % of a day at 12 files/trigger)
        "state_peak_frac_max": 0.6,
    }
    report["pass"] = (
        report["keys_exact"]
        and mismatches == 0
        and report["key_batch_unique"]
        and report["kill_mid_run"]
        and peak_frac <= report["state_peak_frac_max"]
    )
    return report


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_unique = int(args[0]) if args else 500_000
    out_json = args[1] if len(args) > 1 else None
    with_inclusion = "--inclusion" in sys.argv
    with_plateau = "--plateau" in sys.argv
    procs = int(os.environ.get("SPARK_GRAFT_GEN_PROCS", os.cpu_count() or 8))
    base = f"/tmp/spark_graft_stream_stress_{n_unique}"

    t0 = time.time()
    counts = generate(n_unique, base, procs)
    gen_sec = round(time.time() - t0, 1)
    print(
        f"generated {counts['receipts']} receipts / {n_unique} unique "
        f"in {gen_sec}s",
        flush=True,
    )

    from mempool_dumpster_spark.session import get_spark

    spark = get_spark("stream-stress")
    report = {
        "n_unique": n_unique,
        "gen_sec": gen_sec,
        "collector": replay_collector(spark, base, counts),
        "cpus": spark.sparkContext.defaultParallelism,
    }
    checks = [report["collector"]["pass"]]
    # r15 (r14 verdict #5): the collector's dedup working set
    # (dropDuplicatesWithinWatermark state) gets its own RocksDB leg —
    # r14 ran RocksDB only on the inclusion join
    report["collector_rocksdb"] = replay_collector(
        spark, base, counts, tag="_rocks", state_store="rocksdb"
    )
    checks.append(report["collector_rocksdb"]["pass"])
    # r15 (r14 verdict #7): the ST4 custom stateful operator
    # (applyInPandasWithState first-source-wins) at replay scale with
    # kill/restart, both state backends
    report["stateful_attach"] = replay_stateful(spark, base, counts)
    report["stateful_attach_rocksdb"] = replay_stateful(
        spark, base, counts, tag="_rocks", state_store="rocksdb"
    )
    checks += [
        report["stateful_attach"]["pass"],
        report["stateful_attach_rocksdb"]["pass"],
    ]
    if with_inclusion:
        # side-by-side state-store legs (r13 verdict #3): same day, same
        # join, fresh checkpoints — in-memory vs RocksDB at parity rates
        report["inclusion_join"] = replay_inclusion(spark, base, counts)
        report["inclusion_join_rocksdb"] = replay_inclusion(
            spark, base, counts, tag="_rocks", state_store="rocksdb"
        )
        checks += [
            report["inclusion_join"]["pass"],
            report["inclusion_join_rocksdb"]["pass"],
        ]
    if with_plateau:
        report["ttl_plateau"] = ttl_plateau(
            spark, int(os.environ.get("SPARK_GRAFT_PLATEAU_UNIQUES",
                                      "60000")), procs
        )
        # r15 (r14 verdict #5): the plateau replay under RocksDB too —
        # eviction behavior is provider-implemented, so the ≤1.2 ratio
        # must hold on the scale backend, not just in-memory
        report["ttl_plateau_rocksdb"] = ttl_plateau(
            spark, int(os.environ.get("SPARK_GRAFT_PLATEAU_UNIQUES",
                                      "60000")), procs,
            state_store="rocksdb",
        )
        checks += [
            report["ttl_plateau"]["pass"],
            report["ttl_plateau_rocksdb"]["pass"],
        ]
    report["pass"] = all(checks)
    print(json.dumps(report))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(report, f, indent=1)
    spark.stop()
    sys.exit(0 if report["pass"] else 1)


if __name__ == "__main__":
    main()
