"""Streaming collector tests (SURVEY.md §5.2 #4): file source → fork-before-
dedup topology → bucketed sinks, with availableNow draining. Asserts the
reference's core streaming semantics: sourcelog gets every receipt, the
transactions sink only first arrivals, invalid txs route to trash."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mempool_dumpster_spark.streaming.collector import (
    file_stream_source,
    source_metrics,
    start_collector,
    union_sources,
)
from txgen import make_tx, tx_hash_of

T0 = "2023-09-04 00:00:00"
T1 = "2023-09-04 00:00:01"
T2 = "2023-09-04 01:30:00"  # different hour bucket


@pytest.fixture(scope="module")
def stream_day(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    indir = root / "in"
    indir.mkdir()
    tx_a = make_tx(priv=0xAA, tx_type=2, nonce=1)
    tx_bad = make_tx(priv=0xBB, tx_type=2, nonce=2, tip=10, fee=1)  # invalid
    tx_c = make_tx(priv=0xCC, tx_type=0, nonce=3)
    (indir / "f1.csv").write_text(
        f"{T0},{tx_a},alchemy\n"
        f"{T1},{tx_a},infura\n"  # duplicate hash, second source
        f"{T0},{tx_bad},alchemy\n"
    )
    (indir / "f2.csv").write_text(
        f"{T2},{tx_c},bloxroute\n"
        f"{T2},{tx_a},bloxroute\n"  # third receipt of a
    )
    return {
        "in": str(indir),
        "out": str(root / "out"),
        "ckpt": str(root / "ckpt"),
        "h_a": tx_hash_of(tx_a),
        "h_bad": tx_hash_of(tx_bad),
        "h_c": tx_hash_of(tx_c),
    }


@pytest.fixture(scope="module")
def drained(spark, stream_day):
    stream = file_stream_source(spark, stream_day["in"], max_files_per_trigger=1)
    queries = start_collector(
        stream,
        out_dir=stream_day["out"],
        checkpoint_dir=stream_day["ckpt"],
        trigger_available_now=True,
    )
    queries.await_all()
    return stream_day


def test_sourcelog_gets_every_receipt(spark, drained):
    sl = spark.read.schema(
        "timestamp_ms long, hash string, source string"
    ).csv(f"{drained['out']}/sourcelog")
    rows = sl.collect()
    assert len(rows) == 5  # every receipt, including dups and the invalid tx
    per_hash = {}
    for r in rows:
        per_hash.setdefault(r["hash"], set()).add(r["source"])
    assert per_hash[drained["h_a"]] == {"alchemy", "infura", "bloxroute"}


def test_transactions_first_arrival_only(spark, drained):
    # 3-column reference collector format (tx_processor.go:302) — no source
    txs = spark.read.schema(
        "timestamp_ms long, hash string, raw_tx string"
    ).csv(f"{drained['out']}/transactions")
    rows = {r["hash"]: r for r in txs.collect()}
    assert set(rows) == {drained["h_a"], drained["h_c"]}
    # first arrival wins: a was first received at T0 (alchemy), not T1/T2
    import datetime as dt

    t0_ms = int(
        dt.datetime.fromisoformat(T0).replace(tzinfo=dt.timezone.utc).timestamp()
        * 1000
    )
    assert rows[drained["h_a"]]["timestamp_ms"] == t0_ms


def test_first_arrival_metrics(spark, drained):
    """A15: per-minute counter increments for first/tx-trash families
    (reference sourcemetrics.go:10-16, tx_processor.go:252,290)."""
    m = spark.read.schema(
        "minute timestamp, source string, family string, n long"
    ).csv(f"{drained['out']}/metrics")
    per_family = {}
    for r in m.collect():
        per_family[r["family"]] = per_family.get(r["family"], 0) + r["n"]
    assert per_family["first"] == 2  # a + c
    assert per_family["tx-trash"] == 1  # the fee-inverted tx
    assert "tx-onchain" not in per_family  # no RPC wired in this fixture


def test_trash_routing(spark, drained):
    trash = spark.read.schema(
        "timestamp_ms long, hash string, source string, reason string, notes string"
    ).csv(f"{drained['out']}/trash")
    rows = trash.collect()
    assert len(rows) == 1
    assert rows[0]["hash"] == drained["h_bad"]
    assert rows[0]["reason"] == "gasFeeCap lower than gasTipCap"


def test_hour_bucketing(spark, drained):
    import glob

    parts = glob.glob(f"{drained['out']}/sourcelog/date=*/hour=*")
    hours = {p.rsplit("hour=", 1)[-1] for p in parts}
    assert hours == {"00", "01"}  # T0/T1 → 00, T2 → 01


def test_union_and_metrics(spark, stream_day):
    s1 = file_stream_source(spark, stream_day["in"])
    s2 = file_stream_source(spark, stream_day["in"])
    u = union_sources([s1, s2])
    metrics = source_metrics(u)
    q = (
        metrics.writeStream.format("memory")
        .queryName("metrics_tbl")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from metrics_tbl").collect()
    got = {(r["minute"].start.strftime("%H:%M"), r["source"]): r["n_all"] for r in rows}
    # both unioned copies contribute: alchemy saw 2 receipts in minute 00:00 ×2
    assert got[("00:00", "alchemy")] == 4
    assert got[("01:30", "bloxroute")] == 4


def test_collector_checkpoint_restart(spark, tmp_path):
    """ST6: a drained collector restarted on the same checkpoint processes
    ONLY newly-arrived files — no reprocessing (duplicate outputs), no loss.
    This is the crash/redeploy story the reference handles with file-offset
    bookkeeping; Spark's checkpoint + file-source commit log replaces it."""
    from txgen import make_tx, tx_hash_of

    indir = tmp_path / "in"
    indir.mkdir()
    tx1 = make_tx(priv=0x71, nonce=1)
    tx2 = make_tx(priv=0x72, nonce=2)
    (indir / "f1.csv").write_text(f"{T0},{tx1},alchemy\n")

    def drain():
        qs = start_collector(
            file_stream_source(spark, str(indir)),
            out_dir=str(tmp_path / "out"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            trigger_available_now=True,
        )
        qs.await_all()

    drain()
    (indir / "f2.csv").write_text(f"{T1},{tx2},infura\n")
    drain()

    sl = spark.read.schema("timestamp_ms long, hash string, source string").csv(
        str(tmp_path / "out/sourcelog")
    )
    rows = sorted((r["hash"], r["source"]) for r in sl.collect())
    assert rows == sorted(
        [(tx_hash_of(tx1), "alchemy"), (tx_hash_of(tx2), "infura")]
    )
    txs = spark.read.schema("timestamp_ms long, hash string, raw_tx string").csv(
        str(tmp_path / "out/transactions")
    )
    assert txs.count() == 2  # each tx exactly once across the two drains


def test_sources_attach_stream_stateful(spark, tmp_path):
    """applyInPandasWithState arrival-order accumulation: three micro-batches
    (maxFilesPerTrigger=1) deliver the same hash from different sources; the
    emitted array must GROW across batches in arrival order, keep the
    earliest first_seen_ms, and dedupe repeat sources. Batch parity: the
    final array per key equals J1 attach_sources' first-seen ordering on the
    union of all receipts."""
    import os as _os

    from mempool_dumpster_spark.streaming.stateful import sources_attach_stream

    indir = tmp_path / "in"
    indir.mkdir()
    batches = [
        "2023-09-04 00:00:01,0xaa,alchemy\n2023-09-04 00:00:02,0xbb,eden\n",
        "2023-09-04 00:00:03,0xaa,bloxroute\n2023-09-04 00:00:04,0xaa,alchemy\n",
        "2023-09-04 00:00:05,0xaa,local\n",
    ]
    for i, content in enumerate(batches):
        p = indir / f"b{i}.csv"
        p.write_text(content)
        t = 1_700_000_000 + i  # strictly increasing mtimes → batch order
        _os.utime(p, (t, t))

    stream = spark.readStream.schema(
        "received_at timestamp, hash string, source string"
    ).option("maxFilesPerTrigger", 1).csv(str(indir))
    q = (
        sources_attach_stream(stream, key_col="hash")
        .writeStream.format("memory")
        .queryName("attach_state_tbl")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = spark.sql("select * from attach_state_tbl").collect()
    aa = [r for r in rows if r["key"] == "0xaa"]
    # one emission per batch containing 0xaa, array growing in arrival order
    assert [r["sources"] for r in aa] == [
        ["alchemy"],
        ["alchemy", "bloxroute"],
        ["alchemy", "bloxroute", "local"],
    ]
    assert all(r["first_seen_ms"] == 1693785601000 for r in aa)
    assert aa[-1]["n_sources"] == 3
    bb = [r for r in rows if r["key"] == "0xbb"]
    assert [r["sources"] for r in bb] == [["eden"]]


def test_sources_attach_stream_ttl_eviction(spark, tmp_path):
    """Event-time TTL: once the watermark passes a key's last receipt + TTL,
    its state is silently removed (no emission — the reference's knownTxs
    eviction), so a later re-arrival starts a FRESH array instead of
    extending the dead one."""
    import os as _os

    from mempool_dumpster_spark.streaming.stateful import sources_attach_stream

    indir = tmp_path / "in"
    indir.mkdir()
    batches = [
        "2023-09-04 00:00:00,0xaa,alchemy\n",
        "2023-09-04 01:01:00,0xbb,eden\n",    # watermark -> 00:31 > 00:30 TTL
        "2023-09-04 01:02:00,0xcc,local\n",   # this batch fires 0xaa's timeout
        "2023-09-04 01:03:00,0xaa,bloxroute\n",  # re-arrival after eviction
    ]
    for i, content in enumerate(batches):
        p = indir / f"b{i}.csv"
        p.write_text(content)
        t = 1_700_000_000 + i
        _os.utime(p, (t, t))

    stream = spark.readStream.schema(
        "received_at timestamp, hash string, source string"
    ).option("maxFilesPerTrigger", 1).csv(str(indir))
    q = (
        sources_attach_stream(stream, key_col="hash", ttl_minutes=30)
        .writeStream.format("memory")
        .queryName("attach_evict_tbl")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    aa = [
        r
        for r in spark.sql("select * from attach_evict_tbl").collect()
        if r["key"] == "0xaa"
    ]
    # exactly two emissions: the original, and the post-eviction fresh start
    # (no emission for the eviction itself); the fresh one does NOT contain
    # alchemy and carries the NEW first_seen
    assert [r["sources"] for r in aa] == [["alchemy"], ["bloxroute"]]
    assert aa[1]["first_seen_ms"] == 1693789380000  # 01:03:00 UTC


def test_collector_sse_publish_hook(spark, tmp_path):
    """The collector's sse_publish hook receives exactly the valid first
    arrivals of each micro-batch (the rows the reference pushes to its SSE
    API, tx_processor.go SendTx) — duplicates and invalid txs excluded."""
    from mempool_dumpster_spark.streaming.collector import (
        file_stream_source,
        start_collector,
    )
    from txgen import make_tx, tx_hash_of

    indir = tmp_path / "in"
    indir.mkdir()
    tx1 = make_tx(priv=0x81, nonce=1)
    tx2 = make_tx(priv=0x82, nonce=2)
    # tx1 delivered twice (dup must publish once); malformed line dropped
    (indir / "f1.csv").write_text(
        f"{T0},{tx1},alchemy\n{T1},{tx1},infura\n{T1},{tx2},eden\n"
        f"{T1},nothex,eden\n"
    )
    published: list[dict] = []
    qs = start_collector(
        file_stream_source(spark, str(indir)),
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_available_now=True,
        sse_publish=published.extend,
    )
    qs.await_all()
    assert {r["hash"] for r in published} == {tx_hash_of(tx1), tx_hash_of(tx2)}
    assert all(r["raw_tx"].startswith("0x") for r in published)


def test_collector_sse_drop_metrics(spark, tmp_path):
    """Dropped SSE frames are counted, not silent: the cap overflow
    (sse-drop-cap) and the subscriber-queue drops reported by the publish
    callable (sse-drop-queue) land in the per-minute metrics stream under
    source `_sse` (reference sourcemetrics.go counter discipline)."""
    from mempool_dumpster_spark.streaming.collector import (
        file_stream_source,
        start_collector,
    )
    from txgen import make_tx

    indir = tmp_path / "in"
    indir.mkdir()
    tx1 = make_tx(priv=0x83, nonce=1)
    tx2 = make_tx(priv=0x84, nonce=2)
    (indir / "f1.csv").write_text(f"{T0},{tx1},alchemy\n{T1},{tx2},eden\n")

    received: list[dict] = []

    def slow_subscriber(rows):
        received.extend(rows)
        return 2  # pretend two frames hit full subscriber queues

    qs = start_collector(
        file_stream_source(spark, str(indir)),
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_available_now=True,
        sse_publish=slow_subscriber,
        sse_batch_cap=1,  # 2 valid first arrivals → 1 published, 1 capped
    )
    qs.await_all()
    assert len(received) == 1
    m = spark.read.schema(
        "minute timestamp, source string, family string, n long"
    ).csv(str(tmp_path / "out" / "metrics"))
    got = {(r["source"], r["family"]): r["n"] for r in m.collect()
           if r["family"].startswith("sse-")}
    assert got == {("_sse", "sse-drop-cap"): 1, ("_sse", "sse-drop-queue"): 2}


def test_sse_close_unblocks_handler_threads():
    """close() must terminate subscriber handler threads that sit blocked
    on empty queues and tear down their sockets — a long-lived driver that
    restarts collectors must not leak either (the old design's q.get()
    had no timeout and server_close() only closed the listener)."""
    import http.client
    import time as _t

    from mempool_dumpster_spark.streaming.sse import SSEBroadcaster

    b = SSEBroadcaster()
    conn = http.client.HTTPConnection("127.0.0.1", b.port, timeout=10)
    conn.request("GET", "/sse/transactions")
    resp = conn.getresponse()
    for _ in range(50):
        if b.n_subscribers:
            break
        _t.sleep(0.05)
    assert b.n_subscribers == 1
    b.close()  # subscriber is idle-blocked; close must still unblock it
    assert resp.fp.read() == b""  # EOF: server side torn down
    for _ in range(50):
        if b.n_subscribers == 0:
            break
        _t.sleep(0.05)
    assert b.n_subscribers == 0
    conn.close()


def test_sse_publish_reports_drops():
    """publish() returns the frames dropped on full queues and accumulates
    dropped_frames — the counter surfaced by the collector metrics."""
    from mempool_dumpster_spark.streaming.sse import SSEBroadcaster

    b = SSEBroadcaster(queue_size=2)
    try:
        q = b._subscribe()  # unread internal subscriber
        assert b.publish([f"0x{i:02x}" for i in range(5)]) == 3
        assert b.dropped_frames == 3
        assert b.publish(["0xff"]) == 1  # still full
        assert b.dropped_frames == 4
        b._unsubscribe(q)
        assert b.publish(["0xff"]) == 0  # no subscribers, nothing to drop
    finally:
        b.close()


def test_sse_broadcaster_delivery_and_health():
    """S21 service semantics vs the reference API server: SSE frames are
    `data: <tx>\\n\\n` with event-stream headers (api/handler.go:19-47),
    health endpoints answer ok (api/server.go:50-58), and a full subscriber
    queue drops frames silently instead of blocking the publisher or peers
    (api/server.go:122-126)."""
    import http.client

    from mempool_dumpster_spark.streaming.sse import SSEBroadcaster

    b = SSEBroadcaster(queue_size=2)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", b.port, timeout=10)
        conn.request("GET", "/livez")
        assert conn.getresponse().read() == b"ok"

        conn.request("GET", "/sse/transactions")
        resp = conn.getresponse()
        assert resp.headers["Content-Type"] == "text/event-stream"
        assert resp.headers["Cache-Control"] == "no-cache"
        for _ in range(50):
            if b.n_subscribers:
                break
            import time as _t

            _t.sleep(0.05)
        assert b.n_subscribers == 1

        b.publish(["0xaa01", "0xbb02"])
        assert resp.fp.readline() == b"data: 0xaa01\n"
        assert resp.fp.readline() == b"\n"
        assert resp.fp.readline() == b"data: 0xbb02\n"
        assert resp.fp.readline() == b"\n"

        # drop-when-full: an unread internal subscriber with queue_size=2
        # keeps only the first 2 of 5 frames; the publisher never blocks
        q = b._subscribe()
        b.publish([f"0x{i:02x}" for i in range(5)])
        assert q.qsize() == 2 and q.get_nowait() == "0x00"
        b._unsubscribe(q)
        conn.close()
    finally:
        b.close()
    assert b.n_subscribers == 0


def test_sse_sink_streams_first_arrivals(spark, tmp_path):
    """S21 e2e: file stream → allowlist filter → foreachBatch → SSE — a
    live subscriber receives exactly the allowed sources' raw txs as SSE
    frames, in batch order."""
    import http.client
    import os as _os

    from mempool_dumpster_spark.streaming.sse import SSEBroadcaster, sse_sink

    b = SSEBroadcaster()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", b.port, timeout=10)
        conn.request("GET", "/sse/transactions")
        resp = conn.getresponse()
        for _ in range(50):
            if b.n_subscribers:
                break
            import time as _t

            _t.sleep(0.05)

        indir = tmp_path / "in"
        indir.mkdir()
        (indir / "b0.csv").write_text(
            "0xaaa1,0xf86b01,alchemy\n0xaaa2,0xf86b02,private\n0xaaa3,0xf86b03,infura\n"
        )
        stream = spark.readStream.schema(
            "hash string, raw_tx string, source string"
        ).csv(str(indir))
        q = sse_sink(
            stream,
            b,
            allowed_sources=["alchemy", "infura"],
            checkpoint=str(tmp_path / "ckpt"),
        )
        q.processAllAvailable()
        q.stop()

        lines = [resp.fp.readline() for _ in range(4)]
        data = [ln for ln in lines if ln != b"\n"]
        # 'private' is filtered by F6; the allowed two arrive in batch order
        assert data == [b"data: 0xf86b01\n", b"data: 0xf86b03\n"]
        conn.close()
    finally:
        b.close()


def test_session_window_append_mode_with_watermark(spark, tmp_path):
    """session_stats_window as a WATERMARKED APPEND-mode streaming query —
    the production form (the parity test uses complete mode + memory sink,
    which needs no watermark). A session is emitted exactly once, when the
    watermark passes its close (end + gap); sessions still open at the end
    of a batch emit nothing. Two users' interleaved events across three
    micro-batches, watermark delay 0 for determinism."""
    import os as _os

    from mempool_dumpster_spark.operators.sessions import session_stats_window
    from pyspark.sql import functions as F

    indir = tmp_path / "in"
    indir.mkdir()
    batches = [
        # u1 session A: 10:00, 10:10; u2 session: 10:05
        "1,2024-01-01 10:00:00\n1,2024-01-01 10:10:00\n2,2024-01-01 10:05:00\n",
        # u1 session B starts 11:30 (80-min gap) -> watermark 11:30 closes
        # session A (ended 10:10 + 30 min = 10:40) and u2's (10:35)
        "1,2024-01-01 11:30:00\n",
        # advance watermark far enough to close session B too
        "2,2024-01-01 13:00:00\n",
    ]
    for i, content in enumerate(batches):
        p = indir / f"b{i}.csv"
        p.write_text(content)
        t = 1_700_000_000 + i
        _os.utime(p, (t, t))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .csv(str(indir))
        .withWatermark("ts", "0 seconds")
    )
    q = (
        session_stats_window(stream, ["user_id"], gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sess_append_tbl")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = sorted(
        (r["user_id"], r["n_events"], str(r["session_start"]), r["duration_s"])
        for r in spark.sql("select * from sess_append_tbl").collect()
    )
    # closed sessions only: u1's 2-event morning session, u1's 11:30
    # singleton, u2's 10:05 singleton; u2's 13:00 session is still open at
    # drain end and must NOT have been emitted.
    assert rows == [
        (1, 1, "2024-01-01 11:30:00", 0.0),
        (1, 2, "2024-01-01 10:00:00", 600.0),
        (2, 1, "2024-01-01 10:05:00", 0.0),
    ]


def test_sources_attach_stream_late_redelivery_keeps_deadline(spark, tmp_path):
    """Regression for the persisted `last_seen_ms` (3rd state field): a
    late-but-in-watermark re-delivery whose timestamp is OLDER than a prior
    batch's receipt must not pull the eviction deadline earlier than
    "latest receipt ever + TTL". Sequence (TTL = 30 min, watermark delay =
    TTL):

      b0  0xaa @ 00:10 alchemy    -> deadline 00:40
      b1  0xaa @ 00:05 eden       -> older re-delivery; deadline STAYS 00:40
                                     (a buggy per-batch anchor gives 00:35)
      b2  0xbb @ 01:07            -> watermark 00:37: past the buggy 00:35,
                                     NOT past the correct 00:40
      b3  0xaa @ 00:39 bloxroute  -> state must still be alive: the array
                                     EXTENDS instead of starting fresh
    """
    import os as _os

    from mempool_dumpster_spark.streaming.stateful import sources_attach_stream

    indir = tmp_path / "in"
    indir.mkdir()
    batches = [
        "2023-09-04 00:10:00,0xaa,alchemy\n",
        "2023-09-04 00:05:00,0xaa,eden\n",
        "2023-09-04 01:07:00,0xbb,local\n",
        "2023-09-04 00:39:00,0xaa,bloxroute\n",
    ]
    for i, content in enumerate(batches):
        p = indir / f"b{i}.csv"
        p.write_text(content)
        t = 1_700_000_000 + i
        _os.utime(p, (t, t))

    stream = spark.readStream.schema(
        "received_at timestamp, hash string, source string"
    ).option("maxFilesPerTrigger", 1).csv(str(indir))
    q = (
        sources_attach_stream(stream, key_col="hash", ttl_minutes=30)
        .writeStream.format("memory")
        .queryName("attach_late_tbl")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    aa = [
        r
        for r in spark.sql("select * from attach_late_tbl").collect()
        if r["key"] == "0xaa"
    ]
    assert [r["sources"] for r in aa] == [
        ["alchemy"],
        ["alchemy", "eden"],
        ["alchemy", "eden", "bloxroute"],  # NOT a fresh ["bloxroute"] start
    ]
    # first_seen tracks the true minimum across batches (the 00:05 re-delivery)
    assert aa[-1]["first_seen_ms"] == 1693785900000  # 00:05:00 UTC


def test_compact_hourly_partitions(spark, tmp_path):
    """compact_partitions: many tiny micro-batch files collapse to one per
    hour, row set and partition pruning are preserved, already-compact
    partitions are left untouched (incremental contract)."""
    import os

    from pyspark.sql import functions as F

    from mempool_dumpster_spark.streaming.compact import compact_partitions

    root = str(tmp_path / "archive")
    df = spark.range(0, 600).select(
        F.col("id"),
        F.lit("2023-09-01").alias("date"),
        F.format_string("%02d", (F.col("id") % 2).cast("int")).alias("hour"),
    )
    # 6 appends x 8 partitions -> many small files per hour bucket
    for _ in range(6):
        df.repartition(8).write.mode("append").partitionBy("date", "hour").parquet(root)

    h0 = f"{root}/date=2023-09-01/hour=00"
    n_before = len([f for f in os.listdir(h0) if f.endswith(".parquet")])
    assert n_before >= 6

    before = spark.read.parquet(root)
    rows_before = sorted(r["id"] for r in before.collect())

    stats = compact_partitions(spark, root, target_file_bytes=1 << 30, quiesce_seconds=0.0)
    assert stats["partitions_compacted"] == 2
    assert stats["files_after"] == 2  # one file per hour at a 1GB target

    n_after = len([f for f in os.listdir(h0) if f.endswith(".parquet")])
    assert n_after == 1

    after = spark.read.parquet(root)
    assert sorted(r["id"] for r in after.collect()) == rows_before
    # partition columns still prune (layout unchanged)
    pruned = after.filter(F.col("hour") == "00")
    assert pruned.count() == 1800  # 6 appends x 300 rows/hour

    # second run: nothing left to do
    stats2 = compact_partitions(spark, root, target_file_bytes=1 << 30, quiesce_seconds=0.0)
    assert stats2["partitions_compacted"] == 0


def test_compact_unpartitioned_root(spark, tmp_path):
    """An UNPARTITIONED dataset (parquet files directly under root) must
    compact too: root cannot be renamed into its own _compaction subtree,
    so the swap goes file-by-file under the same crash markers. The old
    code raised OSError here after the rewrite work was already spent."""
    import os

    from mempool_dumpster_spark.streaming.compact import compact_partitions

    root = str(tmp_path / "flat")
    for _ in range(5):
        spark.range(0, 100).write.mode("append").parquet(root)
    rows_before = sorted(
        r["id"] for r in spark.read.parquet(root).collect()
    )
    n_before = len([f for f in os.listdir(root) if f.endswith(".parquet")])
    assert n_before >= 5

    stats = compact_partitions(
        spark, root, target_file_bytes=1 << 30, quiesce_seconds=0.0
    )
    assert stats["partitions_compacted"] == 1

    n_after = len([f for f in os.listdir(root) if f.endswith(".parquet")])
    assert n_after == 1
    assert sorted(r["id"] for r in spark.read.parquet(root).collect()) == rows_before
    # work dirs fully drained — no stranded retired originals or markers
    comp = os.path.join(root, "_compaction")
    leftovers = [
        os.path.join(dp, f)
        for dp, _dn, fn in os.walk(comp)
        for f in fn
    ] if os.path.isdir(comp) else []
    assert leftovers == []
    # second run over the flat root: nothing left to do
    stats2 = compact_partitions(
        spark, root, target_file_bytes=1 << 30, quiesce_seconds=0.0
    )
    assert stats2["partitions_compacted"] == 0


def test_compact_skips_live_partition(spark, tmp_path):
    """A partition written within the quiesce window is never compacted —
    the hour the collector is still writing stays untouched."""
    from pyspark.sql import functions as F

    from mempool_dumpster_spark.streaming.compact import compact_partitions

    root = str(tmp_path / "live")
    df = spark.range(0, 100).select(F.col("id"), F.lit("00").alias("hour"))
    for _ in range(3):
        df.repartition(4).write.mode("append").partitionBy("hour").parquet(root)
    stats = compact_partitions(
        spark, root, target_file_bytes=1 << 30, quiesce_seconds=3600
    )
    assert stats["partitions_compacted"] == 0
    assert stats["partitions_skipped_live"] == 1


def test_compact_crash_recovery_restores_retired(spark, tmp_path):
    """A run killed between the two swap renames leaves the partition only
    under _compaction/retired; the next run restores it before compacting."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from mempool_dumpster_spark.streaming.compact import compact_partitions

    root = str(tmp_path / "crash")
    df = spark.range(0, 100).select(F.col("id"), F.lit("00").alias("hour"))
    for _ in range(3):
        df.repartition(2).write.mode("append").partitionBy("hour").parquet(root)
    part = f"{root}/hour=00"
    rows = sorted(r["id"] for r in spark.read.parquet(root).collect())

    # simulate the crash: partition moved to retired, live dir gone
    retired = f"{root}/_compaction/retired/hour=00"
    os.makedirs(os.path.dirname(retired), exist_ok=True)
    os.rename(part, retired)
    assert not os.path.exists(part)

    stats = compact_partitions(
        spark, root, target_file_bytes=1 << 30, quiesce_seconds=0.0
    )
    assert stats["partitions_recovered"] == 1
    assert stats["partitions_compacted"] == 1  # then compacted normally
    assert sorted(r["id"] for r in spark.read.parquet(root).collect()) == rows
    assert not os.path.exists(f"{root}/_compaction")
    shutil.rmtree(root)


def test_stream_stream_inclusion_join(spark, tmp_path):
    """Watermarked STREAM-STREAM join (streaming/inclusion.py): pending txs
    joined to block receipts on hash within [received_at - slack,
    received_at + max_delay]. Matched rows carry block fields and a delay;
    a tx whose receipt falls outside the window, or never arrives, emits
    exactly once with NULLs after the watermark closes its window. A tx
    included BEFORE it was received (P12) matches with negative delay."""
    import os as _os

    from mempool_dumpster_spark.streaming.inclusion import stream_inclusion_join

    txdir = tmp_path / "tx"
    rcdir = tmp_path / "rc"
    txdir.mkdir()
    rcdir.mkdir()
    # txs: h1 included 2 min later; h2 never included; h3 receipt too late
    # (15 min > max_delay 10m); h4 included 10 s BEFORE received (P12)
    (txdir / "b0.csv").write_text(
        "2024-01-01 10:00:00,h1,srcA\n"
        "2024-01-01 10:00:30,h2,srcA\n"
        "2024-01-01 10:01:00,h3,srcB\n"
        "2024-01-01 10:02:10,h4,srcB\n"
    )
    (rcdir / "b0.csv").write_text(
        "2024-01-01 10:02:00,100,h1\n"
        "2024-01-01 10:16:00,101,h3\n"
        "2024-01-01 10:02:00,100,h4\n"
    )
    # sentinel rows far in the future push BOTH watermarks past every
    # window close so the left-outer NULL rows flush in the final batch
    (txdir / "b1.csv").write_text("2024-01-01 12:00:00,hzz,srcA\n")
    (rcdir / "b1.csv").write_text("2024-01-01 12:00:00,999,hzz\n")
    for d in (txdir, rcdir):
        for i, f in enumerate(sorted(d.iterdir())):
            t = 1_700_000_000 + i
            _os.utime(f, (t, t))

    txs = (
        spark.readStream.schema("received_at timestamp, hash string, source string")
        .option("maxFilesPerTrigger", 1)
        .csv(str(txdir))
    )
    rcs = (
        spark.readStream.schema("block_ts timestamp, block_number long, hash string")
        .option("maxFilesPerTrigger", 1)
        .csv(str(rcdir))
    )
    out = stream_inclusion_join(
        txs, rcs, max_delay="10 minutes", before_slack="30 seconds",
        watermark_delay="0 seconds",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("incl_tbl")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        r["hash"]: r
        for r in spark.sql("select * from incl_tbl").collect()
    }
    assert rows["h1"]["included"] == 1
    assert rows["h1"]["block_number"] == 100
    assert rows["h1"]["inclusion_delay_ms"] == 120_000
    assert rows["h2"]["included"] == 0
    assert rows["h2"]["block_number"] is None
    assert rows["h3"]["included"] == 0  # receipt exists but outside window
    assert rows["h4"]["included"] == 1
    assert rows["h4"]["inclusion_delay_ms"] == -10_000
    # exactly one output row per tx — no duplicate emission of outer rows
    from collections import Counter

    c = Counter(r["hash"] for r in spark.sql("select * from incl_tbl").collect())
    assert all(v == 1 for v in c.values()), c


def test_inclusion_join_batch_parity(spark):
    """The same operator over BATCH inputs compiles to an ordinary interval
    join and returns the same answer — the parity check that lets the
    oracle-style assertions above trust the semantics."""
    from mempool_dumpster_spark.streaming.inclusion import stream_inclusion_join

    txs = spark.createDataFrame(
        [("2024-01-01 10:00:00", "h1", "s"), ("2024-01-01 10:00:30", "h2", "s")],
        ["received_at", "hash", "source"],
    ).withColumn("received_at", F.col("received_at").cast("timestamp"))
    rcs = spark.createDataFrame(
        [("2024-01-01 10:02:00", 100, "h1")],
        ["block_ts", "block_number", "hash"],
    ).withColumn("block_ts", F.col("block_ts").cast("timestamp"))
    rows = {r["hash"]: r for r in stream_inclusion_join(txs, rcs).collect()}
    assert rows["h1"]["included"] == 1 and rows["h2"]["included"] == 0


def test_incremental_rollup_only_touches_changed_partitions(spark, tmp_path):
    """incremental_rollup: first run aggregates every partition; appending
    to ONE hour recomputes exactly that hour; deleting a partition drops
    its rollup rows; the maintained rollup always equals a from-scratch
    aggregate of the archive."""
    from pyspark.sql import functions as F

    from mempool_dumpster_spark.streaming.rollup import incremental_rollup

    root = tmp_path / "archive"
    roll = tmp_path / "rollup"

    def write_hour(date, hour, vals, mode="overwrite"):
        spark.createDataFrame([(v,) for v in vals], "v long").write.mode(
            mode
        ).parquet(str(root / f"date={date}" / f"hour={hour:02d}"))

    write_hour("2024-01-01", 0, [1, 2, 3])
    write_hour("2024-01-01", 1, [10])
    write_hour("2024-01-02", 0, [5, 5])

    def agg(df):
        return df.agg(
            F.count("*").alias("n"), F.sum("v").cast("long").alias("sum_v")
        )

    stats = incremental_rollup(spark, str(root), str(roll), agg)
    assert stats == {"changed": 3, "removed": 0, "unchanged": 0}

    def rollup_rows():
        # partition-path inference types date=… as DateType, hour=… as int
        return {
            (str(r["date"]), r["hour"], r["n"], r["sum_v"])
            for r in spark.read.parquet(str(roll)).collect()
        }

    assert rollup_rows() == {
        ("2024-01-01", 0, 3, 6),
        ("2024-01-01", 1, 1, 10),
        ("2024-01-02", 0, 2, 10),
    }

    # steady state: nothing changed -> nothing recomputed
    assert incremental_rollup(spark, str(root), str(roll), agg)["changed"] == 0

    # late data lands in ONE hour -> exactly one partition recomputed
    write_hour("2024-01-01", 1, [20], mode="append")
    stats = incremental_rollup(spark, str(root), str(roll), agg)
    assert stats["changed"] == 1 and stats["unchanged"] == 2
    assert ("2024-01-01", 1, 2, 30) in rollup_rows()

    # retention deletes a day -> its rollup rows disappear
    import shutil as _sh

    _sh.rmtree(root / "date=2024-01-02")
    stats = incremental_rollup(spark, str(root), str(roll), agg)
    assert stats["removed"] == 1
    assert rollup_rows() == {
        ("2024-01-01", 0, 3, 6),
        ("2024-01-01", 1, 2, 30),
    }


def test_incremental_rollup_mergeable_hll_sketches(spark, tmp_path):
    """The non-decomposable-aggregate path the rollup contract names:
    per-partition HLL sketches (hll_sketch_agg) stored IN the rollup,
    merged at query time (hll_union_agg) for a global distinct count —
    incremental updates refresh one partition's sketch, never rescanning
    the archive. Estimate asserted within 5% of the exact distinct."""
    from pyspark.sql import functions as F

    from mempool_dumpster_spark.streaming.rollup import incremental_rollup

    root = tmp_path / "arch"
    roll = tmp_path / "roll"

    def write_hour(hour, users, mode="overwrite"):
        spark.createDataFrame([(u,) for u in users], "user_id long").write.mode(
            mode
        ).parquet(str(root / f"hour={hour:02d}"))

    # overlapping user sets across hours: naive per-partition count sums
    # would overcount; only a mergeable sketch (or full rescan) is right
    write_hour(0, range(0, 600))
    write_hour(1, range(300, 900))

    def agg(df):
        return df.agg(
            F.hll_sketch_agg("user_id").alias("sk"),
            F.count("*").alias("n"),
        )

    incremental_rollup(spark, str(root), str(roll), agg)

    def global_distinct():
        return (
            spark.read.parquet(str(roll))
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("d"))
            .collect()[0]["d"]
        )

    assert abs(global_distinct() - 900) / 900 < 0.05

    # late data in hour 1 only: one partition's sketch refreshes
    write_hour(1, range(900, 1200), mode="append")
    stats = incremental_rollup(spark, str(root), str(roll), agg)
    assert stats["changed"] == 1
    assert abs(global_distinct() - 1200) / 1200 < 0.05


def test_compact_post_swap_crash_does_not_duplicate_rows(spark, tmp_path):
    """Regression: a crash AFTER the staging swap but BEFORE the retired dir
    is deleted must not make recovery merge the old snapshot back in — that
    would silently double every row. The snapshot marker written before the
    swap tells recovery which files the compacted output already
    represents; only genuinely-new (raced-append) files are rescued."""
    import json as _json
    import os
    import shutil as _sh

    from pyspark.sql import functions as F

    from mempool_dumpster_spark.streaming.compact import compact_partitions

    root = str(tmp_path / "crash2")
    df = spark.range(0, 100).select(F.col("id"), F.lit("00").alias("hour"))
    for _ in range(3):
        df.repartition(2).write.mode("append").partitionBy("hour").parquet(root)
    part = f"{root}/hour=00"
    old_files = sorted(os.listdir(part))
    old_parquet = [f for f in old_files if f.endswith(".parquet")]

    # simulate the post-swap crash state: live dir holds the COMPACTED
    # output (distinct names), retired holds the full old snapshot + one
    # raced append, and the snapshot marker lists the snapshot basenames
    retired = f"{root}/_compaction/retired/hour=00"
    os.makedirs(os.path.dirname(retired), exist_ok=True)
    os.rename(part, retired)
    spark.read.parquet(retired).coalesce(1).write.parquet(part)
    for m in ("_SUCCESS",):
        p = os.path.join(part, m)
        if os.path.exists(p):
            os.remove(p)
    with open(retired + ".snapshot.json", "w") as f:
        _json.dump(old_parquet, f)
    raced = spark.range(1000, 1010).select(
        F.col("id"), F.lit("00").alias("hour")
    )
    raced_dir = f"{root}/_raced"
    raced.coalesce(1).select("id").write.parquet(raced_dir)
    raced_file = [
        f for f in os.listdir(raced_dir) if f.endswith(".parquet")
    ][0]
    os.rename(
        os.path.join(raced_dir, raced_file),
        os.path.join(retired, "raced-append.parquet"),
    )
    _sh.rmtree(raced_dir)

    stats = compact_partitions(spark, root, quiesce_seconds=0)
    assert stats["partitions_recovered"] == 1
    got = sorted(r["id"] for r in spark.read.parquet(root).collect())
    # 300 snapshot rows exactly once + the 10 raced rows — no duplication
    assert got == sorted(list(range(0, 100)) * 3 + list(range(1000, 1010)))


def test_compact_mid_merge_crash_loses_nothing(spark, tmp_path):
    """Regression: a crash HALF-WAY through the fallback merge (concurrent
    writer re-created the live dir, so compacted files are moved in one by
    one) leaves some compacted files in staging. Recovery must NOT treat
    'live dir exists' as 'swap completed' — that discards the snapshot
    originals while the compacted copy is incomplete, silently losing the
    rows in the unmoved files. The staging manifest lets recovery drop the
    partially-moved compacted files and roll back to the originals."""
    import json as _json
    import os
    import shutil as _sh

    from pyspark.sql import functions as F

    from mempool_dumpster_spark.streaming.compact import compact_partitions

    root = str(tmp_path / "crash3")
    df = spark.range(0, 100).select(F.col("id"), F.lit("00").alias("hour"))
    for _ in range(3):
        df.repartition(2).write.mode("append").partitionBy("hour").parquet(root)
    part = f"{root}/hour=00"
    old_parquet = sorted(
        f for f in os.listdir(part) if f.endswith(".parquet")
    )

    # compacted output in staging: TWO files, so the merge can crash between
    # moving the first and the second
    staging = f"{root}/_compaction/staging/hour=00"
    retired = f"{root}/_compaction/retired/hour=00"
    spark.read.parquet(part).repartition(2).write.parquet(staging)
    for m in ("_SUCCESS",):
        p = os.path.join(staging, m)
        if os.path.exists(p):
            os.remove(p)
    staged = sorted(f for f in os.listdir(staging) if f.endswith(".parquet"))
    assert len(staged) == 2
    with open(staging + ".files.json", "w") as f:
        _json.dump(staged, f)

    # swap started: originals retired (marker written), then the concurrent
    # writer re-created the live dir with a fresh append...
    os.makedirs(os.path.dirname(retired), exist_ok=True)
    os.rename(part, retired)
    with open(retired + ".snapshot.json", "w") as f:
        _json.dump(old_parquet, f)
    concurrent_dir = f"{root}/_concurrent"
    spark.range(1000, 1010).select(
        F.col("id"), F.lit("00").alias("hour")
    ).coalesce(1).select("id").write.parquet(concurrent_dir)
    os.makedirs(part, exist_ok=True)
    cfile = [f for f in os.listdir(concurrent_dir) if f.endswith(".parquet")][0]
    os.rename(
        os.path.join(concurrent_dir, cfile),
        os.path.join(part, "concurrent-append.parquet"),
    )
    _sh.rmtree(concurrent_dir)
    # ...and the fallback merge crashed after moving only the FIRST
    # compacted file
    os.rename(
        os.path.join(staging, staged[0]), os.path.join(part, staged[0])
    )

    stats = compact_partitions(spark, root, quiesce_seconds=0)
    assert stats["partitions_recovered"] == 1
    got = sorted(r["id"] for r in spark.read.parquet(root).collect())
    # every original row exactly once + the concurrent append — nothing
    # lost from the unmoved compacted file, nothing duplicated from the
    # moved one
    assert got == sorted(list(range(0, 100)) * 3 + list(range(1000, 1010)))
    assert not os.path.exists(f"{root}/_compaction")


def test_streaming_corpus_append_gate(spark, tmp_path):
    """Streaming corpus growth (streaming/append.py): a live JSONL
    document stream appends through the SAME gate as `prep --append` —
    per micro-batch, duplicates of the committed corpus are dropped via
    the signature artifact, fresh docs upsert the corpus AND the
    artifact, and the next batch gates against the STREAM-GROWN
    artifact. Batch ≡ streaming parity: one append_batch over the union
    of both landed files against a fresh base corpus keeps the same doc
    set."""
    import json

    from mempool_dumpster_spark.__main__ import main
    from mempool_dumpster_spark.ml.prep import PrepConfig, append_batch
    from mempool_dumpster_spark.sources.manifest import read_committed
    from mempool_dumpster_spark.streaming.append import (
        doc_file_stream,
        start_corpus_append,
    )

    def text(salt):
        return " ".join(f"{salt}w{j}" for j in range(30))

    # base corpus + signature artifact, the prep --atomic --signatures way
    base_docs = tmp_path / "base.parquet"
    spark.createDataFrame(
        [(f"base{i}", text(f"b{i}")) for i in range(4)],
        "doc_id string, text string",
    ).write.parquet(str(base_docs))
    out = str(tmp_path / "corpus")
    assert main(
        ["prep", str(base_docs), "--out", out, "--no-gopher",
         "--atomic", "--signatures"],
        spark=spark,
    ) == 0

    cfg = PrepConfig(gopher=False, decontaminate=False)
    landing = tmp_path / "landing"
    landing.mkdir()
    checkpoint = str(tmp_path / "ckpt")

    def drain():
        q = start_corpus_append(
            spark,
            doc_file_stream(spark, str(landing)),
            out,
            config=cfg,
            checkpoint=checkpoint,
            available_now=True,
        )
        q.awaitTermination()

    # batch 1: an exact dup of base2 (gated) + a fresh doc (appended)
    with open(landing / "f1.jsonl", "w") as f:
        f.write(json.dumps({"doc_id": "n1", "text": text("b2")}) + "\n")
        f.write(json.dumps({"doc_id": "n2", "text": text("fresh1")}) + "\n")
    drain()
    ids = {r["doc_id"] for r in read_committed(spark, out).collect()}
    assert ids == {"base0", "base1", "base2", "base3", "n2"}
    sig_ids = {
        r["doc_id"]
        for r in read_committed(spark, out + "_signatures").collect()
    }
    assert sig_ids == ids  # artifact grew with the corpus

    # batch 2: a dup of batch 1's FRESH doc (must gate against the
    # stream-grown artifact, not just the base) + another fresh doc
    with open(landing / "f2.jsonl", "w") as f:
        f.write(json.dumps({"doc_id": "n3", "text": text("fresh1")}) + "\n")
        f.write(json.dumps({"doc_id": "n4", "text": text("fresh2")}) + "\n")
    drain()
    ids2 = {r["doc_id"] for r in read_committed(spark, out).collect()}
    assert ids2 == ids | {"n4"}

    # the append journal recorded both non-empty batches
    import glob

    logs = sorted(glob.glob(out + "_append_log/batch-*.json"))
    appended = [json.load(open(p))["appended"] for p in logs]
    assert len(appended) == 2
    assert sum(sum(c.values()) for c in appended) == 2  # n2 + n4

    # batch/streaming parity: the SAME docs as ONE append_batch against a
    # fresh copy of the base corpus keep the same doc set (n1 exact-dups
    # base2; n3 exact-dups n2's text and loses within-batch to the
    # earlier doc_id)
    out2 = str(tmp_path / "corpus2")
    assert main(
        ["prep", str(base_docs), "--out", out2, "--no-gopher",
         "--atomic", "--signatures"],
        spark=spark,
    ) == 0
    union = spark.createDataFrame(
        [("n1", text("b2")), ("n2", text("fresh1")),
         ("n3", text("fresh1")), ("n4", text("fresh2"))],
        "doc_id string, text string",
    )
    append_batch(spark, out2, union, config=cfg)
    ids_batch = {
        r["doc_id"]
        for r in read_committed(spark, out2).collect()
        if r["doc_id"].startswith("n")
    }
    assert ids_batch == {"n2", "n4"} == {
        i for i in ids2 if i.startswith("n")
    }

    # a missing base corpus fails fast, before any query starts
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        start_corpus_append(
            spark,
            doc_file_stream(spark, str(landing)),
            str(tmp_path / "nope"),
            config=cfg,
            available_now=True,
        )


def test_streaming_corpus_append_checkpoint_restart(
    spark, tmp_path, monkeypatch
):
    """Crash-window restart e2e (r8 verdict #5): kill the streaming query
    BETWEEN the corpus upsert and the signature upsert (the two-commit
    window), restart from the same checkpoint, and assert

      - the failed micro-batch was NOT checkpointed, so foreachBatch
        replays it (at-least-once delivery),
      - the self-heal path recomputes the committed-but-unsigned doc's
        signature BEFORE the gates run (artifact heals),
      - the replayed rows exact-dup the now-committed text hashes and
        drop out (exactly-once KEPT SET: each doc appended once),
      - the stream keeps accepting fresh docs afterwards.
    """
    import glob
    import json

    from mempool_dumpster_spark.__main__ import main
    import mempool_dumpster_spark.sources.manifest as manifest
    from mempool_dumpster_spark.ml.prep import PrepConfig
    from mempool_dumpster_spark.sources.manifest import read_committed
    from mempool_dumpster_spark.streaming.append import (
        doc_file_stream,
        start_corpus_append,
    )

    def text(salt):
        return " ".join(f"{salt}w{j}" for j in range(30))

    base_docs = tmp_path / "base.parquet"
    spark.createDataFrame(
        [(f"base{i}", text(f"b{i}")) for i in range(3)],
        "doc_id string, text string",
    ).write.parquet(str(base_docs))
    out = str(tmp_path / "corpus")
    assert main(
        ["prep", str(base_docs), "--out", out, "--no-gopher",
         "--atomic", "--signatures"],
        spark=spark,
    ) == 0

    cfg = PrepConfig(gopher=False, decontaminate=False)
    landing = tmp_path / "landing"
    landing.mkdir()
    checkpoint = str(tmp_path / "ckpt")

    def drain():
        q = start_corpus_append(
            spark,
            doc_file_stream(spark, str(landing)),
            out,
            config=cfg,
            checkpoint=checkpoint,
            available_now=True,
        )
        q.awaitTermination()

    # arm the injected crash: the FIRST signature-artifact upsert dies
    # after the corpus upsert already committed
    real_upsert = manifest.upsert
    armed = {"on": True}

    def flaky_upsert(spark_, path, df, keys):
        if armed["on"] and path.endswith("_signatures"):
            armed["on"] = False
            raise RuntimeError("injected crash in the two-commit window")
        return real_upsert(spark_, path, df, keys)

    monkeypatch.setattr(manifest, "upsert", flaky_upsert)

    with open(landing / "f1.jsonl", "w") as f:
        f.write(json.dumps({"doc_id": "n1", "text": text("fresh1")}) + "\n")
    from pyspark.errors import StreamingQueryException

    with pytest.raises(StreamingQueryException):
        drain()

    # crash-window state: corpus committed n1, artifact did NOT
    ids = {r["doc_id"] for r in read_committed(spark, out).collect()}
    assert "n1" in ids
    sig_ids = {
        r["doc_id"]
        for r in read_committed(spark, out + "_signatures").collect()
    }
    assert "n1" not in sig_ids

    # restart from the same checkpoint: the batch replays, self-heal signs
    # n1, the replayed row drops as an exact dup, both artifacts agree
    drain()
    ids2 = {r["doc_id"] for r in read_committed(spark, out).collect()}
    assert ids2 == {"base0", "base1", "base2", "n1"}
    corpus = read_committed(spark, out)
    assert corpus.count() == 4  # exactly-once kept set, no duplicate rows
    sig2 = {
        r["doc_id"]
        for r in read_committed(spark, out + "_signatures").collect()
    }
    assert sig2 == ids2  # artifact healed to exactly the corpus ids

    # journal: the replayed batch appended nothing (counts empty -> no
    # entry beyond any earlier ones); a fresh doc still flows end-to-end
    with open(landing / "f2.jsonl", "w") as f:
        f.write(json.dumps({"doc_id": "n2", "text": text("fresh2")}) + "\n")
    drain()
    ids3 = {r["doc_id"] for r in read_committed(spark, out).collect()}
    assert ids3 == ids2 | {"n2"}
    logs = sorted(glob.glob(out + "_append_log/batch-*.json"))
    appended = [json.load(open(p))["appended"] for p in logs]
    assert sum(sum(c.values()) for c in appended) == 1  # n2 only
    assert not glob.glob(out + "_append_log/*.tmp")  # atomic journal


def test_streaming_index_append(spark, tmp_path):
    """start_index_append: an embedding stream grows the IVFPQ index
    table through the idempotence gate — duplicate/replayed vectors
    never double-insert, encoding uses the persisted artifacts, and the
    grown index serves identically to a from-scratch index over the
    union (same artifacts)."""
    import json as _json
    import os as _os

    from pyspark.sql import functions as F

    from mempool_dumpster_spark.ml.similarity import (
        ivfpq_topk_pretrained,
        write_ivfpq_index,
    )
    from mempool_dumpster_spark.streaming.append import (
        start_index_append,
        vector_file_stream,
    )

    def vec(i):
        v = [0.05 * ((i * 7 + d) % 5) for d in range(8)]
        v[i % 3] += 10.0
        return v

    base = spark.createDataFrame(
        [(i, vec(i)) for i in range(30)], "vec_id long, embedding array<float>"
    )
    cents, books = write_ivfpq_index(
        base, "stream_ann_idx", dim=8, n_cells=4, n_assign=2, m=4,
        k_codes=8, n_iters=2, path=str(tmp_path / "idx"),
    )
    base_rows = spark.table("stream_ann_idx").count()

    landing = tmp_path / "landing"
    _os.makedirs(landing)
    # file 1: new vectors 30-39; file 2: REPLAYS 35-39 plus new 40-44 —
    # the overlap must be gated out
    with open(landing / "a.jsonl", "w") as f:
        for i in range(30, 40):
            f.write(_json.dumps({"vec_id": i, "embedding": vec(i)}) + "\n")
    with open(landing / "b.jsonl", "w") as f:
        for i in range(35, 45):
            f.write(_json.dumps({"vec_id": i, "embedding": vec(i)}) + "\n")

    log_dir = str(tmp_path / "log")
    q = start_index_append(
        spark,
        vector_file_stream(spark, str(landing)),
        "stream_ann_idx",
        cents,
        books,
        dim=8,
        n_assign=2,
        log_dir=log_dir,
        checkpoint=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)
    # the stream's clone refreshed ITS relation cache, not this
    # session's — raw table readers refresh explicitly (serving via
    # ivfpq_topk_pretrained refreshes on entry; pinned below)
    spark.catalog.refreshTable("stream_ann_idx")
    grown = spark.table("stream_ann_idx")
    # 15 unique new vectors x n_assign 2, duplicates gated out
    assert grown.count() == base_rows + 15 * 2
    assert grown.select("neighbor_id").distinct().count() == 45
    appended = sum(
        _json.load(open(_os.path.join(log_dir, p)))["appended_vectors"]
        for p in sorted(_os.listdir(log_dir))
    )
    assert appended == 15

    # replay the whole landing dir with a FRESH checkpoint: fully gated
    q2 = start_index_append(
        spark,
        vector_file_stream(spark, str(landing)),
        "stream_ann_idx",
        cents,
        books,
        dim=8,
        n_assign=2,
        checkpoint=str(tmp_path / "ckpt2"),
        available_now=True,
    )
    q2.awaitTermination(120)
    spark.catalog.refreshTable("stream_ann_idx")
    assert spark.table("stream_ann_idx").count() == base_rows + 30

    # serve parity vs a from-scratch index over the union
    union = base.union(
        spark.createDataFrame(
            [(i, vec(i)) for i in range(30, 45)],
            "vec_id long, embedding array<float>",
        )
    )
    queries = union.filter(F.col("vec_id") < 3)
    grown_served = ivfpq_topk_pretrained(
        spark, "stream_ann_idx", union, queries, cents, books,
        k=3, dim=8, nprobe=2, refine=4,
    )
    write_ivfpq_index(
        union, "stream_ann_scratch", dim=8, n_cells=4, n_assign=2,
        centroids=cents, codebooks=books, path=str(tmp_path / "scratch"),
    )
    scratch_served = ivfpq_topk_pretrained(
        spark, "stream_ann_scratch", union, queries, cents, books,
        k=3, dim=8, nprobe=2, refine=4,
    )
    got = sorted(map(tuple, grown_served.collect()))
    want = sorted(map(tuple, scratch_served.collect()))
    assert got == want and got
