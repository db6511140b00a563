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


def test_websocket_transport_import_guard():
    """Without the optional websocket-client package, the live transport
    raises a clear ImportError naming the package — the feed gap in this
    container is purely environmental, not missing code."""
    import pytest

    import importlib.util

    from mempool_dumpster_spark.sources.transports import websocket_transport

    if importlib.util.find_spec("websocket") is not None:
        pytest.skip("websocket-client installed — guard path not reachable")
    with pytest.raises(ImportError, match="websocket-client"):
        websocket_transport("wss://example.invalid/ws")


def test_websocket_transport_scripted_frames(monkeypatch):
    """Drive the REAL websocket adapter end-to-end against a scripted fake
    `websocket` module: subscribe frame sent on the live socket, frames
    delivered to the sink, orderly close ends the iterator, socket closed,
    and a reconnect re-dials + re-subscribes on the NEW socket."""
    import sys
    import types
    from datetime import datetime, timezone

    from mempool_dumpster_spark.sources.feeds import BLOXROUTE, run_feed

    raw = "0x02f870018203e8"
    frame = json.dumps({"params": {"result": {"rawTx": raw}}})

    class FakeWS:
        def __init__(self, script):
            self.script = list(script)
            self.sent: list[str] = []
            self.closed = False

        def recv(self):
            return self.script.pop(0) if self.script else ""  # "" = close

        def send(self, text):
            self.sent.append(text)

        def close(self):
            self.closed = True

    sockets: list[FakeWS] = []

    def create_connection(url, header=None, timeout=None):
        assert url == "wss://api.blxrbdn.com/ws"
        assert header == ["Authorization: k3y"]
        ws = FakeWS([frame, frame] if not sockets else [frame])
        sockets.append(ws)
        return ws

    fake_mod = types.ModuleType("websocket")
    fake_mod.create_connection = create_connection
    monkeypatch.setitem(sys.modules, "websocket", fake_mod)

    from mempool_dumpster_spark.sources.transports import bloxroute_transport

    connect, send = bloxroute_transport("wss://api.blxrbdn.com/ws", "k3y")
    got: list[tuple] = []
    run_feed(
        BLOXROUTE,
        connect,
        sink=lambda ts, tx, src: got.append((tx, src)),
        send=send,
        sleep=lambda s: None,
        max_connects=2,
        clock=lambda: datetime(2023, 9, 4, tzinfo=timezone.utc),
    )
    assert got == [(raw, "bloxroute")] * 3  # 2 frames conn 1 + 1 frame conn 2
    assert len(sockets) == 2  # reconnected
    assert all(ws.sent == [BLOXROUTE.sub_request] for ws in sockets)
    assert all(ws.closed for ws in sockets)  # finally-close ran per socket


def test_eden_transport_token_url_split(monkeypatch):
    """token@url auth splits into an Authorization header + bare URL; a bare
    URL dials unauthenticated (reference common/utils.go:191-198)."""
    import sys
    import types

    seen: list[tuple] = []

    def create_connection(url, header=None, timeout=None):
        seen.append((url, header))
        raise OSError("dial stopped by test")

    fake_mod = types.ModuleType("websocket")
    fake_mod.create_connection = create_connection
    monkeypatch.setitem(sys.modules, "websocket", fake_mod)

    from mempool_dumpster_spark.sources.transports import eden_transport

    connect, _ = eden_transport("sekrit@wss://eden.example/ws")
    try:
        connect()
    except OSError:
        pass
    connect2, _ = eden_transport("wss://eden.example/ws")
    try:
        connect2()
    except OSError:
        pass
    assert seen == [
        ("wss://eden.example/ws", ["Authorization: sekrit"]),
        ("wss://eden.example/ws", []),
    ]


def test_fiber_grpc_transport_requires_stub():
    """The Fiber adapter needs grpcio AND the generated stub: in this
    container the grpcio import guard fires first; with grpcio present but
    no stub_factory it must raise ValueError."""
    import importlib.util

    import pytest

    from mempool_dumpster_spark.sources.transports import fiber_grpc_transport

    if importlib.util.find_spec("grpc") is None:
        with pytest.raises(ImportError, match="grpcio"):
            fiber_grpc_transport("fiber.example:8080", "key", stub_factory=object)
    else:
        with pytest.raises(ValueError, match="stub_factory"):
            fiber_grpc_transport("fiber.example:8080", "key")


def test_landing_sink_atomic_visibility_and_unique_names(tmp_path):
    """Two invariants of the landing contract: (1) a file in progress is
    invisible to the file stream (dot-prefixed) and appears atomically,
    COMPLETE, on rotation/close — Spark's file source reads each path
    exactly once at discovery, so append-after-discovery rows are lost;
    (2) two sinks in one process must never share a file."""
    from datetime import datetime, timezone

    landing = tmp_path / "landing"
    t = datetime(2023, 9, 4, 1, 2, 3, tzinfo=timezone.utc)
    a = csv_landing_sink(str(landing), rotate_every=2)
    b = csv_landing_sink(str(landing), rotate_every=2)

    a(t, "0xaa", "eden")
    visible = [p.name for p in landing.iterdir() if not p.name.startswith(".")]
    assert visible == []  # in-progress file is hidden from the stream

    a(t, "0xab", "eden")
    a(t, "0xac", "eden")  # third row rotates: first file promoted, complete
    visible = [p.name for p in landing.iterdir() if not p.name.startswith(".")]
    assert len(visible) == 1
    assert len((landing / visible[0]).read_text().splitlines()) == 2

    b(t, "0xba", "blx")
    a.close()
    b.close()
    visible = sorted(p.name for p in landing.iterdir() if not p.name.startswith("."))
    assert len(visible) == 3 and len(set(visible)) == 3  # no shared names
    all_rows = [
        ln for p in visible for ln in (landing / p).read_text().splitlines()
    ]
    assert len(all_rows) == 4  # every row visible exactly once after close
