"""S10-S12: live pending-tx feed connectors — bloXroute / Eden / Chainbound
(SURVEY.md §2.1; reference collector/node_conn_bloxroute.go:94-165,
node_conn_eden.go:91-163, node_conn_chainbound.go:53-112).

Everything protocol-level is implemented and unit-tested from the public
message formats: subscription requests, frame decoding, the reconnect loop
with the reference's exponential backoff (5 s doubling to 120 s, reset on a
successful connect — collector/consts.go:14-15). The one thing NOT here is
the wire transport itself (websocket/gRPC client) — this container has no
network stack, so the transport is a small injected protocol; production
plugs in `websocket-client`/`grpc` in ~10 lines, tests drive scripted
frames.

Topology note (why this is not a Spark executor concern): feed ingestion is
a driver-external, low-volume (~tens/s) side process, exactly like the
reference's goroutines. Connectors append TxIn rows to a landing directory
via `csv_landing_sink`, and the Structured Streaming collector
(streaming/collector.py `file_stream_source`) picks them up — the same
files-as-queue decoupling Kafka would provide on a real deployment, with
the same `received_at,raw_tx,source` projection either way.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass
from datetime import datetime, timezone

#: reference node_conn_bloxroute.go:106
BLOXROUTE_SUB_REQUEST = (
    '{"id": 1, "method": "subscribe", "params": ["newTxs", {"include": ["raw_tx"]}]}'
)
#: reference node_conn_eden.go:104
EDEN_SUB_REQUEST = '{"jsonrpc": "2.0", "id": 1, "method": "subscribe", "params": ["rawTxs"]}'

INITIAL_BACKOFF_SEC = 5  # reference collector/consts.go:14
MAX_BACKOFF_SEC = 120  # reference collector/consts.go:15


def parse_bloxroute_frame(frame: bytes | str) -> str | None:
    """bloXroute newTxs notification → 0x-hex raw tx, or None for anything
    malformed/empty (reference common/types.go:16-22 BlxRawTxMsg +
    node_conn_bloxroute.go:133-147: unmarshal errors and empty rawTx are
    skipped, not fatal)."""
    # Go's json.Unmarshal matches struct fields case-insensitively, so the
    # wire key may be rawTx / raw_tx / rawtx — accept all.
    return _result_field(frame, ("rawTx", "raw_tx", "rawtx"))


def parse_eden_frame(frame: bytes | str) -> str | None:
    """Eden rawTxs notification → 0x-hex raw tx (reference
    common/types.go:24-30 EdenRawTxMsg: the payload field is named `rlp`)."""
    return _result_field(frame, ("rlp", "RLP", "Rlp"))


def _result_field(frame: bytes | str, keys: tuple[str, ...]) -> str | None:
    try:
        msg = json.loads(frame)
        res = msg["params"]["result"]
    except (ValueError, TypeError, KeyError):
        return None
    raw = None
    for k in keys:
        if isinstance(res, dict) and isinstance(res.get(k), str):
            raw = res[k]
            break
    if not raw:
        return None
    return raw if raw.startswith("0x") else "0x" + raw


def parse_chainbound_tx(raw_tx_bytes: bytes) -> str | None:
    """Chainbound Fiber delivers already-decoded txs over gRPC (reference
    node_conn_chainbound.go:63-69 receives TransactionWithSender); our
    transport contract normalizes each message to the raw tx BYTES, and this
    codec renders the engine's canonical 0x-hex TxIn payload."""
    if not raw_tx_bytes:
        return None
    return "0x" + raw_tx_bytes.hex()


@dataclass(frozen=True)
class FeedSpec:
    """One feed's protocol surface. `sub_request` is None for push-on-connect
    feeds (Chainbound's gRPC stream needs no subscribe frame)."""

    source: str  # source tag on emitted TxIn rows
    sub_request: str | None
    parse_frame: Callable[[bytes | str], str | None]


BLOXROUTE = FeedSpec("bloxroute", BLOXROUTE_SUB_REQUEST, parse_bloxroute_frame)
EDEN = FeedSpec("eden", EDEN_SUB_REQUEST, parse_eden_frame)
CHAINBOUND = FeedSpec(
    "chainbound", None, lambda b: parse_chainbound_tx(b if isinstance(b, bytes) else bytes(b))
)


def run_feed(
    spec: FeedSpec,
    connect: Callable[[], Iterator[bytes | str]],
    sink: Callable[[datetime, str, str], None],
    send: Callable[[str], None] | None = None,
    sleep: Callable[[float], None] = time.sleep,
    max_connects: int | None = None,
    clock: Callable[[], datetime] | None = None,
) -> None:
    """The reference's connect/read/reconnect loop, transport-free.

    - `connect()` returns an iterator of frames (raises to signal a failed
      dial; iterator exhaustion/raise = disconnect);
    - `send(text)` transmits the subscription request when the spec has one;
    - every good frame becomes `sink(received_at_utc, raw_tx_hex, source)`;
    - failures back off 5 s → ×2 → cap 120 s, reset after a successful
      connect (reference node_conn_bloxroute.go:61-76 reconnect +
      consts.go:14-15). `max_connects` bounds the loop for tests/drains
      (None = run forever, the production mode).
    """
    now = clock or (lambda: datetime.now(timezone.utc))
    backoff = INITIAL_BACKOFF_SEC
    connects = 0
    while max_connects is None or connects < max_connects:
        connects += 1
        try:
            frames = connect()
            if spec.sub_request is not None and send is not None:
                send(spec.sub_request)
            backoff = INITIAL_BACKOFF_SEC  # successful dial resets backoff
            for frame in frames:
                raw = spec.parse_frame(frame)
                if raw is None:
                    continue  # malformed frames are skipped, not fatal
                sink(now(), raw, spec.source)
        except Exception:  # noqa: BLE001 — any transport error → reconnect
            pass
        if max_connects is not None and connects >= max_connects:
            return
        sleep(backoff)
        backoff = min(backoff * 2, MAX_BACKOFF_SEC)


def csv_landing_sink(landing_dir: str, rotate_every: int = 1000):
    """TxIn sink writing `received_at,raw_tx,source` CSV rows to a landing
    directory consumed by streaming.collector.file_stream_source (a
    file-based stand-in for a Kafka topic).

    Two invariants the naive append-in-place version violated:

    - **Files become visible ATOMICALLY and only when complete.** Spark's
      file stream source reads each path exactly once at discovery — rows
      appended to an already-discovered file are silently lost. Rows are
      therefore written to a dot-prefixed temp file (which the file
      source ignores) and renamed into the visible name on rotation/close,
      so the stream only ever sees closed, complete files.
    - **Names are unique per sink, not per process.** Multiple feeds run
      as threads in one process (run_feed blocks); a PID-only name made
      two sinks append to the same file with interleaved rows and
      double-closed handles. A per-sink random token disambiguates.
    """
    import os
    import uuid

    os.makedirs(landing_dir, exist_ok=True)
    token = uuid.uuid4().hex[:8]
    state: dict = {"n": 0, "file": None, "seq": 0, "tmp": None, "final": None}

    def _promote() -> None:
        if state["file"] is not None:
            state["file"].close()
            os.rename(state["tmp"], state["final"])
            state["file"] = None

    def sink(received_at: datetime, raw_tx: str, source: str) -> None:
        if state["file"] is None or state["n"] >= rotate_every:
            _promote()
            name = f"feed_{os.getpid()}_{token}_{state['seq']:06d}.csv"
            state["final"] = f"{landing_dir}/{name}"
            state["tmp"] = f"{landing_dir}/.{name}.tmp"
            state["file"] = open(state["tmp"], "w")  # noqa: SIM115 — rotating handle
            state["seq"] += 1
            state["n"] = 0
        # millisecond precision: the reference records ms receive timestamps
        # (UnixMilli throughout collector/*); whole-second truncation would
        # degrade first-source-wins ordering and inclusionDelayMs to 1 s
        # granularity. Spark's CSV timestamp parser accepts fractional secs.
        ts = received_at.strftime("%Y-%m-%d %H:%M:%S.%f")[:-3]
        state["file"].write(f"{ts},{raw_tx},{source}\n")
        state["file"].flush()
        state["n"] += 1

    sink.close = _promote  # type: ignore[attr-defined]
    return sink
