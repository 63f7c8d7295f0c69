"""WebSocket transport for the remote executor (RFC 6455, stdlib-only).

The reference executor's protocol is websocket-framed (its
aqueducts-executor serves ``/api/ws`` behind an ``X-API-Key``-checked
upgrade, api/mod.rs:78-179 + auth.rs:14-33); this engine's primary
transport is JSON-lines/TCP (executor/server.py — the queue/progress/
cancel SEMANTICS are the parity surface).  This module closes the last
transport delta for clients that expect a real websocket: the same
:class:`~.server.ExecutorServer` queue/worker/dispatch machinery behind
an RFC 6455 endpoint, one protocol JSON object per TEXT message.

Because the environment ships no websocket library, the framing is
implemented here directly from the RFC: the HTTP/1.1 upgrade handshake
(``Sec-WebSocket-Accept`` = base64(sha1(key + GUID))), client-masked
frames, 7/16/64-bit payload lengths, fragmentation (continuation
frames), and ping/pong/close control frames.

Authentication matches the reference's middleware placement: a VALID
``X-API-Key`` header on the upgrade request pre-authenticates the
connection (its messages need no ``api_key`` field); a WRONG header is
refused with ``401`` and the websocket is never established
(auth.rs:14-33); NO header falls back to per-message ``api_key``
checking, same as the JSON-lines transport.  ``GET /api/health``
without an upgrade answers plain HTTP 200 — the reference's public
unauthenticated health route (api/mod.rs:27,44-49).
"""

from __future__ import annotations

import asyncio
import base64
import hashlib
import json
import os
from typing import Any, Optional

from .protocol import STREAM_LIMIT
from .server import ExecutorServer

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_CONT, OP_TEXT, OP_BIN, OP_CLOSE, OP_PING, OP_PONG = 0, 1, 2, 8, 9, 10


def accept_key(sec_websocket_key: str) -> str:
    """``Sec-WebSocket-Accept`` for a client's ``Sec-WebSocket-Key``."""
    digest = hashlib.sha1(
        (sec_websocket_key.strip() + _WS_GUID).encode("ascii")
    ).digest()
    return base64.b64encode(digest).decode("ascii")


def make_frame(opcode: int, payload: bytes, mask: bool = False) -> bytes:
    """One FIN frame.  Clients MUST mask (RFC 6455 §5.3); servers must
    not."""
    head = bytearray([0x80 | (opcode & 0x0F)])
    mask_bit = 0x80 if mask else 0
    n = len(payload)
    if n < 126:
        head.append(mask_bit | n)
    elif n < 1 << 16:
        head.append(mask_bit | 126)
        head += n.to_bytes(2, "big")
    else:
        head.append(mask_bit | 127)
        head += n.to_bytes(8, "big")
    if mask:
        key = os.urandom(4)
        head += key
        payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return bytes(head) + payload


async def _read_frame(reader: asyncio.StreamReader):
    b1b2 = await reader.readexactly(2)
    fin = bool(b1b2[0] & 0x80)
    opcode = b1b2[0] & 0x0F
    masked = bool(b1b2[1] & 0x80)
    n = b1b2[1] & 0x7F
    if n == 126:
        n = int.from_bytes(await reader.readexactly(2), "big")
    elif n == 127:
        n = int.from_bytes(await reader.readexactly(8), "big")
    if n > STREAM_LIMIT:
        raise ValueError(f"websocket frame of {n} bytes exceeds limit")
    key = await reader.readexactly(4) if masked else None
    data = await reader.readexactly(n)
    if key:
        data = bytes(b ^ key[i % 4] for i, b in enumerate(data))
    return fin, opcode, data


async def read_message(
    reader: asyncio.StreamReader, writer: asyncio.StreamWriter
) -> Optional[bytes]:
    """Next complete DATA message (reassembling fragmentation), replying
    to pings inline; ``None`` on a close frame or EOF."""
    buf = bytearray()
    started = False
    while True:
        try:
            fin, opcode, data = await _read_frame(reader)
        except (asyncio.IncompleteReadError, ConnectionResetError):
            return None
        if opcode == OP_CLOSE:
            try:
                writer.write(make_frame(OP_CLOSE, data[:2]))
                await writer.drain()
            except Exception:  # noqa: BLE001 — already closing
                pass
            return None
        if opcode == OP_PING:
            writer.write(make_frame(OP_PONG, data))
            await writer.drain()
            continue
        if opcode == OP_PONG:
            continue
        if opcode in (OP_TEXT, OP_BIN):
            started = True
            buf += data
        elif opcode == OP_CONT and started:
            buf += data
        else:
            raise ValueError(f"unexpected websocket opcode {opcode}")
        # cap BEFORE returning: checking only between fragments let a
        # final fin fragment push the reassembled message to ~2x the
        # limit (each frame is individually under the per-frame cap)
        if len(buf) > STREAM_LIMIT:
            raise ValueError("fragmented websocket message exceeds limit")
        if fin:
            return bytes(buf)


async def _read_http_head(reader: asyncio.StreamReader) -> tuple[str, dict]:
    """Request line + headers of an HTTP/1.1 request (8 KiB cap)."""
    raw = await reader.readuntil(b"\r\n\r\n")
    lines = raw.decode("latin-1").split("\r\n")
    headers = {}
    for line in lines[1:]:
        if ":" in line:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
    return lines[0], headers


class WebSocketExecutorServer(ExecutorServer):
    """The executor behind an RFC 6455 endpoint: same queue, worker,
    dispatch, cancellation and auth semantics as
    :class:`~.server.ExecutorServer`; only the framing differs (one
    protocol JSON object per text message instead of per line)."""

    async def _handle(
        self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter
    ) -> None:
        try:
            request_line, headers = await _read_http_head(reader)
        except (asyncio.IncompleteReadError, asyncio.LimitOverrunError):
            writer.close()
            return
        parts = request_line.split()
        path = parts[1] if len(parts) >= 2 else "/"
        upgrade = headers.get("upgrade", "").lower() == "websocket"
        if not upgrade:
            # the PUBLIC health route answers plain HTTP (reference
            # api/mod.rs:27,44-49); anything else without an upgrade is
            # not this protocol
            if path.rstrip("/") == "/api/health":
                body = b'{"status":"OK"}'
                writer.write(
                    b"HTTP/1.1 200 OK\r\ncontent-type: application/json\r\n"
                    + f"content-length: {len(body)}\r\n\r\n".encode()
                    + body
                )
            else:
                writer.write(
                    b"HTTP/1.1 400 Bad Request\r\ncontent-length: 0\r\n\r\n"
                )
            await writer.drain()
            writer.close()
            return
        ws_key = headers.get("sec-websocket-key")
        if not ws_key:
            writer.write(
                b"HTTP/1.1 400 Bad Request\r\ncontent-length: 0\r\n\r\n"
            )
            await writer.drain()
            writer.close()
            return
        # reference auth middleware placement (auth.rs:14-33): a wrong
        # X-API-Key never gets an established websocket; a valid one
        # pre-authenticates the connection; absence falls back to
        # per-message api_key fields
        header_key = headers.get("x-api-key")
        pre_authed = False
        if header_key is not None:
            if not self._authenticated({"api_key": header_key}):
                writer.write(
                    b"HTTP/1.1 401 Unauthorized\r\ncontent-length: 0\r\n\r\n"
                )
                await writer.drain()
                writer.close()
                return
            pre_authed = True
        writer.write(
            b"HTTP/1.1 101 Switching Protocols\r\n"
            b"upgrade: websocket\r\nconnection: Upgrade\r\n"
            + f"sec-websocket-accept: {accept_key(ws_key)}\r\n\r\n".encode()
        )
        await writer.drain()

        out_queue: asyncio.Queue = asyncio.Queue()

        async def pump() -> None:
            while True:
                msg = await out_queue.get()
                if msg is None:
                    break
                writer.write(
                    make_frame(
                        OP_TEXT,
                        json.dumps(msg, separators=(",", ":")).encode(),
                    )
                )
                await writer.drain()

        pump_task = asyncio.create_task(pump())
        self._writers.add(writer)
        try:
            while True:
                payload = await read_message(reader, writer)
                if payload is None:
                    break
                try:
                    msg = json.loads(payload.decode())
                except ValueError:
                    out_queue.put_nowait(
                        {"type": "error", "message": "malformed message"}
                    )
                    continue
                if not isinstance(msg, dict):
                    out_queue.put_nowait(
                        {"type": "error", "message": "malformed message"}
                    )
                    continue
                if pre_authed:
                    # connection-level auth WINS (the reference checks
                    # X-API-Key once at upgrade, auth.rs:14-33, and never
                    # re-checks per message): overwrite, don't setdefault
                    # — a stale/empty api_key field on a message from a
                    # validly-upgraded client must not kill the socket
                    msg["api_key"] = self.api_key
                if await self._dispatch(msg, out_queue):
                    break
        except ValueError:
            out_queue.put_nowait(
                {"type": "error", "message": "malformed websocket frame"}
            )
        finally:
            self._release_connection(out_queue)
            out_queue.put_nowait(None)
            try:
                await pump_task
            except Exception:  # noqa: BLE001 — pump died with the socket
                pass
            self._writers.discard(writer)
            writer.close()


# ---------------------------------------------------------------------------
# minimal client-side framing (tests + parity probes)
# ---------------------------------------------------------------------------


async def ws_connect(
    host: str,
    port: int,
    api_key_header: Optional[str] = None,
    path: str = "/api/ws",
) -> tuple[asyncio.StreamReader, asyncio.StreamWriter]:
    """Open + upgrade; raises ``ConnectionError`` on a non-101 reply
    (e.g. the 401 an invalid X-API-Key earns)."""
    reader, writer = await asyncio.open_connection(
        host, port, limit=STREAM_LIMIT
    )
    key = base64.b64encode(os.urandom(16)).decode("ascii")
    head = (
        f"GET {path} HTTP/1.1\r\nhost: {host}:{port}\r\n"
        "upgrade: websocket\r\nconnection: Upgrade\r\n"
        f"sec-websocket-key: {key}\r\nsec-websocket-version: 13\r\n"
    )
    if api_key_header is not None:
        head += f"x-api-key: {api_key_header}\r\n"
    writer.write((head + "\r\n").encode())
    await writer.drain()
    status_line, headers = await _read_http_head(reader)
    if " 101 " not in f"{status_line} ":
        writer.close()
        raise ConnectionError(f"websocket upgrade refused: {status_line}")
    if headers.get("sec-websocket-accept") != accept_key(key):
        writer.close()
        raise ConnectionError("bad sec-websocket-accept from server")
    return reader, writer


async def ws_send_json(writer: asyncio.StreamWriter, msg: dict[str, Any]) -> None:
    writer.write(
        make_frame(
            OP_TEXT, json.dumps(msg, separators=(",", ":")).encode(), mask=True
        )
    )
    await writer.drain()


async def ws_recv_json(
    reader: asyncio.StreamReader, writer: asyncio.StreamWriter
) -> Optional[dict[str, Any]]:
    payload = await read_message(reader, writer)
    return None if payload is None else json.loads(payload.decode())
