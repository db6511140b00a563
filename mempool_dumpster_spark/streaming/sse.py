"""S21: live SSE fan-out service — the engine-side twin of the reference's
API server (api/server.go, api/handler.go).

Reference behavior reproduced:
- `GET /sse/transactions` holds the connection open and streams one
  `data: <raw tx hex>\\n\\n` frame per transaction (api/handler.go:45-47),
  with `Content-Type: text/event-stream`, `Cache-Control: no-cache` and
  permissive CORS headers (api/handler.go:19-25);
- each subscriber owns a bounded queue (chan buffer 100,
  api/handler.go:28-31) and a publish to a FULL queue silently drops the
  frame for that subscriber only (the `select/default` at
  api/server.go:122-126) — one slow dashboard can't back-pressure the
  collector or its peers;
- `/livez` and `/readyz` health endpoints return 200 "ok"
  (api/server.go:50-58).

Engine integration: `publish_rows` is shaped as the `send` callable of
`fanout.receiver_sink`, so the SSE layer attaches to any stream with one
`foreachBatch` — the collector stays a pure Spark topology and this service
rides micro-batch hand-off (at-least-once, like the reference's in-process
channel hand-off from the tx processor).

Scale note: SSE fan-out is per-node I/O, not a distributed operator — on a
cluster this runs next to the driver (or as its own service consuming the
landing bucket), never on executors. The Spark-side cost stays the S22
foreachBatch collect, bounded by `batch_cap`.
"""

from __future__ import annotations

import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_SENTINEL = object()


class SSEBroadcaster:
    """Threaded localhost SSE server with drop-when-full per-subscriber
    queues. `port=0` binds an ephemeral port (tests); `queue_size` mirrors
    the reference's 100-deep subscriber channel."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0, queue_size: int = 100):
        self._queue_size = queue_size
        self._subs: dict[int, queue.Queue] = {}
        self._subs_lock = threading.Lock()
        self._next_uid = 0
        self._dropped = 0  # frames dropped on full subscriber queues
        self._closing = threading.Event()
        self._conns: set = set()  # live handler sockets, torn down in close()
        broadcaster = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *_a) -> None:  # quiet server
                pass

            def do_GET(self) -> None:
                if self.path in ("/livez", "/readyz"):
                    body = b"ok"
                    self.send_response(200)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                if self.path != "/sse/transactions":
                    self.send_response(404)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                # an SSE connection is never reused: without this the
                # keep-alive loop in handle() would block on readline() for
                # a next request after the stream ends, holding the socket
                # open past close()
                self.close_connection = True
                self.send_response(200)
                self.send_header("Access-Control-Allow-Origin", "*")
                self.send_header("Access-Control-Expose-Headers", "Content-Type")
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.end_headers()
                q = broadcaster._subscribe()
                with broadcaster._subs_lock:
                    broadcaster._conns.add(self.connection)
                try:
                    # get() with a timeout, re-checking the shutdown flag:
                    # a sentinel can be lost to a concurrent publish refilling
                    # the queue, and a subscriber that connects after close()
                    # snapshots the subs never gets one — the flag bounds
                    # every handler thread's exit to one timeout period.
                    while not broadcaster._closing.is_set():
                        try:
                            item = q.get(timeout=0.5)
                        except queue.Empty:
                            continue
                        if item is _SENTINEL:
                            return
                        self.wfile.write(f"data: {item}\n\n".encode())
                        self.wfile.flush()
                except (BrokenPipeError, ConnectionResetError, OSError):
                    pass  # client went away; reference logs + removes too
                finally:
                    broadcaster._unsubscribe(q)
                    with broadcaster._subs_lock:
                        broadcaster._conns.discard(self.connection)

        class _QuietServer(ThreadingHTTPServer):
            def handle_error(self, request, client_address):  # noqa: ARG002
                # client disconnects surface as broken pipes in the handler
                # thread during shutdown — expected, not worth a traceback
                import sys

                exc = sys.exception()
                if isinstance(exc, (BrokenPipeError, ConnectionResetError)):
                    return
                super().handle_error(request, client_address)

        self._httpd = _QuietServer((host, port), Handler)
        self._httpd.daemon_threads = True
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    @property
    def n_subscribers(self) -> int:
        with self._subs_lock:
            return len(self._subs)

    def _subscribe(self) -> queue.Queue:
        q: queue.Queue = queue.Queue(maxsize=self._queue_size)
        with self._subs_lock:
            uid = self._next_uid
            self._next_uid += 1
            self._subs[uid] = q
            q._sse_uid = uid  # type: ignore[attr-defined]
        return q

    def _unsubscribe(self, q: queue.Queue) -> None:
        with self._subs_lock:
            self._subs.pop(getattr(q, "_sse_uid", -1), None)

    @property
    def dropped_frames(self) -> int:
        """Total frames dropped on full subscriber queues since start —
        the per-subscriber drop counter the reference tracks in its
        source metrics (api/server.go select/default drops)."""
        with self._subs_lock:
            return self._dropped

    def publish(self, txs: list[str]) -> int:
        """Fan one batch of raw-tx hex strings out to every subscriber,
        dropping frames for any subscriber whose queue is full (reference
        api/server.go:122-126 select/default). Returns the number of
        frames dropped this call (also accumulated in `dropped_frames`)."""
        with self._subs_lock:
            subs = list(self._subs.values())
        dropped = 0
        for tx in txs:
            for q in subs:
                try:
                    q.put_nowait(tx)
                except queue.Full:
                    dropped += 1
        if dropped:
            with self._subs_lock:
                self._dropped += dropped
        return dropped

    def publish_rows(self, rows: list[dict]) -> int:
        """`fanout.receiver_sink`-shaped adapter: extract `raw_tx` from the
        micro-batch row dicts and broadcast. Returns frames dropped (the
        collector records it as the `sse-drop-queue` metric family)."""
        return self.publish([r["raw_tx"] for r in rows if r.get("raw_tx")])

    def close(self) -> None:
        # Order matters: flag first (every handler loop re-checks it within
        # its get() timeout, so no thread can block forever even if its
        # sentinel is lost), then best-effort sentinels for a fast wake,
        # then the listener, then any still-open accepted sockets — so a
        # driver that restarts collectors leaks neither threads nor client
        # connections.
        self._closing.set()
        with self._subs_lock:
            subs = list(self._subs.values())
        for q in subs:
            try:
                q.put_nowait(_SENTINEL)
            except queue.Full:  # drain one slot so the sentinel likely fits
                try:
                    q.get_nowait()
                except queue.Empty:
                    pass
                try:
                    q.put_nowait(_SENTINEL)
                except queue.Full:
                    pass  # flag + socket teardown below still unblock it
        self._httpd.shutdown()
        self._httpd.server_close()
        with self._subs_lock:
            conns = list(self._conns)
        for conn in conns:
            try:
                import socket

                conn.shutdown(socket.SHUT_RDWR)
            except OSError:
                pass


def sse_sink(
    df,
    broadcaster: SSEBroadcaster,
    allowed_sources: list[str],
    checkpoint: str,
    batch_cap: int = 10_000,
):
    """S21 wiring: stream → allowlist filter → SSE broadcast, as one
    foreachBatch receiver (df needs hash/raw_tx/source columns, like S22)."""
    from mempool_dumpster_spark.streaming.fanout import receiver_sink

    return receiver_sink(
        df,
        send=broadcaster.publish_rows,
        allowed_sources=allowed_sources,
        checkpoint=checkpoint,
        batch_cap=batch_cap,
    )
