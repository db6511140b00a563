"""Optional LIVE wire transports for the S10-S12 feed connectors.

`sources.feeds.run_feed` is transport-free: it takes `connect()` (returns an
iterator of frames) and `send(text)`. This module supplies real transports —
a websocket adapter for bloXroute/Eden (reference
collector/node_conn_bloxroute.go:94-131 dials a websocket and writes the
subscribe frame; node_conn_eden.go:91-118 likewise) and a gRPC stream
adapter for Chainbound Fiber (node_conn_chainbound.go:53-69) — each behind
an optional import, so the engine itself never requires network packages.
In this build container neither `websocket-client` nor `grpcio` is
installed; every entry point raises a clear ImportError naming the package
to install, and the adapter logic is covered by scripted-frame tests that
inject a fake module (tests/test_feeds.py).

Usage (production):

    connect, send = websocket_transport("wss://api.blxrbdn.com/ws",
                                        headers=["Authorization: <key>"])
    run_feed(BLOXROUTE, connect, sink, send=send)
"""

from __future__ import annotations

from collections.abc import Callable, Iterator


def _require(module: str, package: str):
    try:
        return __import__(module)
    except ImportError as e:  # pragma: no cover - exercised via message test
        raise ImportError(
            f"the live transport needs the optional '{package}' package "
            f"(pip install {package}); in environments without it, inject a "
            "transport into run_feed directly"
        ) from e


def websocket_transport(
    url: str,
    headers: list[str] | None = None,
    recv_timeout: float | None = 30.0,
) -> tuple[Callable[[], Iterator[bytes | str]], Callable[[str], None]]:
    """(connect, send) pair for `run_feed`, backed by `websocket-client`.

    `connect()` dials and returns a frame iterator; any socket error inside
    the iterator propagates to run_feed's reconnect/backoff loop (the
    reference treats read errors exactly this way —
    node_conn_bloxroute.go:137-141). `send` writes on the CURRENT
    connection, so re-subscription after a reconnect hits the new socket.
    """
    websocket = _require("websocket", "websocket-client")
    state: dict = {"ws": None}

    def connect() -> Iterator[bytes | str]:
        ws = websocket.create_connection(
            url, header=headers or [], timeout=recv_timeout
        )
        state["ws"] = ws

        def frames() -> Iterator[bytes | str]:
            try:
                while True:
                    msg = ws.recv()
                    if msg is None or msg == "":
                        return  # orderly close → reconnect
                    yield msg
            finally:
                try:
                    ws.close()
                except Exception:  # noqa: BLE001 — best-effort close
                    pass

        return frames()

    def send(text: str) -> None:
        state["ws"].send(text)

    return connect, send


def bloxroute_transport(url: str, auth_token: str, **kw):
    """bloXroute websocket with its Authorization header
    (reference node_conn_bloxroute.go:99-104)."""
    return websocket_transport(url, headers=[f"Authorization: {auth_token}"], **kw)


def eden_transport(url_with_token: str, **kw):
    """Eden websocket — auth travels as token@url (reference
    node_conn_eden.go:94-100 splits it the same way)."""
    from mempool_dumpster_spark.functions.scalars import auth_token_and_url

    token, url = auth_token_and_url(url_with_token)
    if not url:  # no '@' → the whole string is the URL, unauthenticated
        token, url = "", token
    headers = [f"Authorization: {token}"] if token else []
    return websocket_transport(url, headers=headers, **kw)


def fiber_grpc_transport(
    target: str,
    api_key: str,
    stub_factory: Callable | None = None,
    method: str = "SubscribeNewTxsV2",
) -> tuple[Callable[[], Iterator[bytes]], None]:
    """connect() for Chainbound Fiber's gRPC stream (no send — the stream is
    push-on-connect, reference node_conn_chainbound.go:53-62).

    Fiber's generated protobuf stubs ship in the `fiber-py` package and are
    not vendored here; pass the generated stub class as `stub_factory`
    (e.g. `fiber_py.API_pb2_grpc.APIStub`). Each streamed message is
    normalized to raw tx BYTES for feeds.parse_chainbound_tx.
    """
    grpc = _require("grpc", "grpcio")
    if stub_factory is None:
        raise ValueError(
            "fiber_grpc_transport needs the generated Fiber stub class "
            "(install fiber-py and pass stub_factory=APIStub)"
        )

    def connect() -> Iterator[bytes]:
        channel = grpc.secure_channel(target, grpc.ssl_channel_credentials())
        stub = stub_factory(channel)
        stream = getattr(stub, method)(
            (), metadata=(("x-api-key", api_key),)
        )

        def frames() -> Iterator[bytes]:
            try:
                for msg in stream:
                    # TransactionWithSender carries the sender + rlp payload;
                    # normalize to the raw tx bytes the codec expects
                    yield bytes(getattr(msg, "rlp", b"") or b"")
            finally:
                channel.close()

        return frames()

    return connect, None
