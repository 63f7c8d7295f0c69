"""WebSocket transport for the remote executor (executor/ws.py):
RFC 6455 handshake/framing from the stdlib, the reference's X-API-Key
upgrade gate (auth.rs:14-33) and public HTTP /api/health route
(api/mod.rs:27,44-49), with the SAME queue/progress/cancel semantics
as the JSON-lines transport."""

import asyncio
import threading

import pytest

from aqueducts_spark.executor.ws import (
    OP_PING,
    OP_PONG,
    OP_TEXT,
    WebSocketExecutorServer,
    accept_key,
    make_frame,
    ws_connect,
    ws_recv_json,
    ws_send_json,
    _read_frame,
)

KEY = "ws-test-key"

PIPELINE = """
sources:
  - type: file
    name: ws_nation
    format: {type: parquet}
    location: /root/testdata/sf0.001/nation.parquet
stages:
  - name: ws_counts
    query: SELECT n_regionkey, count(*) AS n FROM ws_nation GROUP BY n_regionkey
    show: 2
"""


def test_accept_key_rfc_vector():
    # the RFC 6455 §1.3 worked example — pins the GUID + digest path
    assert (
        accept_key("dGhlIHNhbXBsZSBub25jZQ==")
        == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="
    )


@pytest.fixture()
def server(spark):
    holder = {}
    started = threading.Event()

    def run():
        loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)
        srv = WebSocketExecutorServer(spark, api_key=KEY)
        holder["loop"] = loop
        holder["srv"] = srv
        loop.run_until_complete(srv.start())
        holder["port"] = srv.port
        started.set()
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert started.wait(10)
    yield holder
    loop = holder["loop"]
    asyncio.run_coroutine_threadsafe(holder["srv"].stop(), loop).result(timeout=15)
    loop.call_soon_threadsafe(loop.stop)


def _run(coro):
    return asyncio.run(coro)


def test_ws_execute_pipeline_streams_and_succeeds(server):
    async def go():
        reader, writer = await ws_connect(
            "127.0.0.1", server["port"], api_key_header=KEY
        )
        # header pre-auth: no api_key field needed on the request
        await ws_send_json(
            writer,
            {
                "type": "execution_request",
                "pipeline": PIPELINE,
                "format": "yaml",
                "pre_substituted": True,
            },
        )
        kinds, outputs = [], []
        while True:
            msg = await asyncio.wait_for(ws_recv_json(reader, writer), 120)
            assert msg is not None, "server closed before terminal message"
            kinds.append(msg["type"])
            if msg["type"] == "output_chunk":
                outputs.append(msg["data"])
            if msg["type"] in ("succeeded", "error", "cancelled"):
                writer.close()
                return kinds, msg, "".join(outputs)

    kinds, final, output = _run(go())
    assert final["type"] == "succeeded"
    assert kinds[0] == "queued" and "started" in kinds
    assert "progress_update" in kinds
    assert "n_regionkey" in output  # the show: output came through


def test_ws_wrong_header_key_never_upgrades(server):
    async def go():
        with pytest.raises(ConnectionError, match="401"):
            await ws_connect("127.0.0.1", server["port"], api_key_header="nope")

    _run(go())


def test_ws_per_message_auth_without_header(server):
    async def go():
        reader, writer = await ws_connect("127.0.0.1", server["port"])
        # wrong per-message key: error + server-side close
        await ws_send_json(
            writer,
            {
                "type": "execution_request",
                "pipeline": PIPELINE,
                "format": "yaml",
                "api_key": "wrong",
            },
        )
        msg = await asyncio.wait_for(ws_recv_json(reader, writer), 30)
        assert msg == {"type": "error", "message": "authentication failed"}
        nxt = await asyncio.wait_for(ws_recv_json(reader, writer), 30)
        assert nxt is None  # connection closed after auth failure
        writer.close()

    _run(go())


def test_ws_health_request_is_public(server):
    async def go():
        reader, writer = await ws_connect("127.0.0.1", server["port"])
        await ws_send_json(writer, {"type": "health_request"})
        msg = await asyncio.wait_for(ws_recv_json(reader, writer), 30)
        assert msg == {"type": "health", "status": "OK"}
        writer.close()

    _run(go())


def test_http_health_route_without_upgrade(server):
    async def go():
        reader, writer = await asyncio.open_connection("127.0.0.1", server["port"])
        writer.write(
            b"GET /api/health HTTP/1.1\r\nhost: x\r\n\r\n"
        )
        await writer.drain()
        head = await reader.readuntil(b"\r\n\r\n")
        body = await reader.read(15)
        writer.close()
        return head.decode(), body

    head, body = _run(go())
    assert head.startswith("HTTP/1.1 200 OK")
    assert body == b'{"status":"OK"}'


def test_ws_ping_pong_and_fragmentation(server):
    async def go():
        reader, writer = await ws_connect("127.0.0.1", server["port"])
        # ping -> pong with the same payload
        writer.write(make_frame(OP_PING, b"hello", mask=True))
        await writer.drain()
        fin, opcode, data = await _read_frame(reader)
        assert (fin, opcode, data) == (True, OP_PONG, b"hello")
        # a health_request split across two frames (text + continuation)
        import json as _json

        payload = _json.dumps({"type": "health_request"}).encode()
        half = len(payload) // 2
        import os as _os

        def _masked(opcode, chunk, fin):
            key = _os.urandom(4)
            head = bytearray([(0x80 if fin else 0) | opcode])
            head.append(0x80 | len(chunk))
            head += key
            return bytes(head) + bytes(
                b ^ key[i % 4] for i, b in enumerate(chunk)
            )

        writer.write(_masked(OP_TEXT, payload[:half], fin=False))
        writer.write(_masked(0, payload[half:], fin=True))
        await writer.drain()
        msg = await asyncio.wait_for(ws_recv_json(reader, writer), 30)
        assert msg == {"type": "health", "status": "OK"}
        writer.close()

    _run(go())
