"""S10-S12 connector tests: frame codecs against the reference's message
shapes, the reconnect loop's backoff discipline, and the landing-dir bridge
into the streaming collector's file source."""

from __future__ import annotations

import json
from datetime import datetime, timezone

from mempool_dumpster_spark.sources.feeds import (
    BLOXROUTE,
    BLOXROUTE_SUB_REQUEST,
    CHAINBOUND,
    EDEN,
    csv_landing_sink,
    parse_bloxroute_frame,
    parse_chainbound_tx,
    parse_eden_frame,
    run_feed,
)
from txgen import make_tx


def test_frame_codecs():
    raw = make_tx(priv=0xF0, nonce=1)
    blx = json.dumps({"params": {"result": {"rawTx": raw}}})
    assert parse_bloxroute_frame(blx) == raw
    # Go unmarshal is case-insensitive on field names
    assert parse_bloxroute_frame(
        json.dumps({"params": {"result": {"raw_tx": raw[2:]}}})
    ) == raw
    eden = json.dumps({"params": {"result": {"rlp": raw}}})
    assert parse_eden_frame(eden) == raw
    assert parse_chainbound_tx(bytes.fromhex(raw[2:])) == raw
    # malformed / empty frames are skipped, not fatal
    for bad in ("{", "{}", json.dumps({"params": {"result": {}}}),
                json.dumps({"params": {"result": {"rawTx": ""}}})):
        assert parse_bloxroute_frame(bad) is None
        assert parse_eden_frame(bad) is None
    assert parse_chainbound_tx(b"") is None


def test_run_feed_reconnect_backoff():
    """Reference semantics: 5s backoff doubling to 120s on failure, reset on
    a successful dial (consts.go:14-15, node_conn_bloxroute.go:61-76)."""
    raw = make_tx(priv=0xF1, nonce=2)
    good = json.dumps({"params": {"result": {"rawTx": raw}}})
    attempts = []

    def connect():
        attempts.append(1)
        n = len(attempts)
        if n in (1, 2):  # two failed dials → 5s, 10s
            raise ConnectionError("dial failed")
        if n == 3:  # success (resets backoff), two frames then disconnect
            return iter([good, "junk"])
        raise ConnectionError("post-success failure")  # → 5s again

    sent, sunk, sleeps = [], [], []
    run_feed(
        BLOXROUTE,
        connect,
        sink=lambda ts, r, src: sunk.append((r, src)),
        send=sent.append,
        sleep=sleeps.append,
        max_connects=5,
        clock=lambda: datetime(2023, 9, 4, tzinfo=timezone.utc),
    )
    assert sent == [BLOXROUTE_SUB_REQUEST]  # sent once, on the good dial
    assert sunk == [(raw, "bloxroute")]  # junk frame skipped
    assert sleeps == [5, 10, 5, 10]  # double, double, reset-after-success


def test_chainbound_no_subscribe_frame():
    sent, sunk = [], []
    raw = make_tx(priv=0xF2, nonce=3)
    run_feed(
        CHAINBOUND,
        lambda: iter([bytes.fromhex(raw[2:])]),
        sink=lambda ts, r, src: sunk.append((r, src)),
        send=sent.append,
        sleep=lambda s: None,
        max_connects=1,
    )
    assert sent == []  # gRPC stream pushes on connect; no subscribe frame
    assert sunk == [(raw, "chainbound")]


def test_landing_sink_feeds_file_stream(spark, tmp_path):
    """End-to-end S10→S9: connector frames land as CSV, the streaming
    collector drains them, sourcelog sees the receipt."""
    from mempool_dumpster_spark.streaming.collector import (
        file_stream_source,
        start_collector,
    )

    raw = make_tx(priv=0xF3, nonce=4)
    frame = json.dumps({"params": {"result": {"rlp": raw}}})
    landing = tmp_path / "landing"
    sink = csv_landing_sink(str(landing))
    run_feed(
        EDEN,
        lambda: iter([frame]),
        sink=sink,
        sleep=lambda s: None,
        max_connects=1,
        clock=lambda: datetime(2023, 9, 4, 1, 2, 3, tzinfo=timezone.utc),
    )
    sink.close()
    qs = start_collector(
        file_stream_source(spark, str(landing)),
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    qs.await_all()
    sl = spark.read.schema("timestamp_ms long, hash string, source string").csv(
        str(tmp_path / "out/sourcelog")
    )
    rows = sl.collect()
    assert len(rows) == 1
    assert rows[0]["source"] == "eden"
