"""Remote pipeline executor: FIFO queue, one pipeline at a time,
streamed progress, cancellation.

Semantics ported from the reference executor
(aqueducts-executor/src/executor/manager.rs:13-136 queue + semaphore(1)
+ cancellation tokens; api/mod.rs:78-179 message flow; queue position
broadcast queue.rs:22-45). Transport is JSON-lines over TCP (stdlib
asyncio) instead of websockets — the queueing/progress/cancel semantics
are the parity surface.

Cancellation maps to ``sparkContext.cancelJobGroup``: each execution
runs its Spark actions under a job group named by its execution id, so
an in-flight pipeline stops at the next job boundary
(SURVEY §2.A A33).

Authentication mirrors the reference executor's API-key middleware
(aqueducts-executor/src/api/auth.rs:14-33 — constant-time compare of
the X-API-Key header, reject on missing/wrong; config.rs:29-31 — the
executor REFUSES to start with an empty key; api/mod.rs:27 — a public
unauthenticated ``/api/health`` route).  On this JSON-lines transport
the header becomes an ``api_key`` field on every protected request
(``execution_request`` / ``cancel_request``), checked with
``hmac.compare_digest``; a failed check replies
``{type: error, message: authentication failed}`` and CLOSES the
connection (the reference's websocket upgrade is likewise never
established without a valid key).  ``{type: health_request}`` is the
public health route: it answers ``{type: health, status: OK}`` with
no key, so load balancers and probes work unauthenticated.
"""

from __future__ import annotations

import asyncio
import hmac
import threading
import uuid
from typing import Any, Optional

from pyspark.sql import SparkSession

from ..config.loader import load_pipeline_str
from ..pipeline import run_pipeline
from ..progress import ProgressEvent, ProgressTracker
from .protocol import STREAM_LIMIT, chunk_output, decode, encode


class _StreamingTracker(ProgressTracker):
    """Bridges pipeline callbacks (worker thread) to the client's
    asyncio writer via a loop-safe queue."""

    def __init__(self, loop: asyncio.AbstractEventLoop, queue: asyncio.Queue):
        self.loop = loop
        self.queue = queue

    def _put(self, msg: dict[str, Any]) -> None:
        self.loop.call_soon_threadsafe(self.queue.put_nowait, msg)

    def on_progress(self, event: ProgressEvent) -> None:
        msg = {
            "type": "progress_update",
            "event": event.kind,
            "name": event.name,
            "duration_ms": event.duration_ms,
        }
        if event.extra:
            # forward so the remote tracker contract matches the local
            # one — otherwise any future use silently vanishes here
            msg["extra"] = event.extra
        self._put(msg)

    def on_output(self, stage_name: str, output_type: str, payload: str) -> None:
        for msg in chunk_output(stage_name, output_type, payload):
            self._put(msg)


class _Execution:
    def __init__(self, request: dict[str, Any], queue: asyncio.Queue):
        self.id = uuid.uuid4().hex[:12]
        self.request = request
        self.queue = queue  # messages back to the owning client
        self.cancelled = threading.Event()


class ExecutorServer:
    def __init__(
        self,
        spark: SparkSession,
        host: str = "127.0.0.1",
        port: int = 0,
        api_key: str = "",
    ):
        if not api_key or not api_key.strip():
            # reference config.rs:29-31 (ConfigError::EmptyApiKey): an
            # executor with no key is an open RCE endpoint — refuse to
            # construct, not just to authenticate
            raise ValueError(
                "ExecutorServer: api_key cannot be empty — every remote "
                "client must present it on execution/cancel requests"
            )
        self.api_key = api_key
        self.spark = spark
        self.host = host
        self.port = port
        self._pending: list[_Execution] = []
        self._wakeup: Optional[asyncio.Event] = None
        self._server: Optional[asyncio.AbstractServer] = None
        self._executions: dict[str, _Execution] = {}
        self._worker_task: Optional[asyncio.Task] = None
        self._writers: set[asyncio.StreamWriter] = set()

    # ----- lifecycle ----------------------------------------------------
    async def start(self) -> int:
        self._wakeup = asyncio.Event()
        self._server = await asyncio.start_server(
            self._handle, self.host, self.port, limit=STREAM_LIMIT
        )
        self.port = self._server.sockets[0].getsockname()[1]
        self._worker_task = asyncio.create_task(self._worker())
        return self.port

    async def stop(self) -> None:
        if self._worker_task:
            self._worker_task.cancel()
            try:
                await self._worker_task  # reap it; unawaited cancel fires
            except (asyncio.CancelledError, Exception):  # noqa: BLE001
                pass  # at teardown the cancel itself is the outcome
        if self._server:
            self._server.close()
            await self._server.wait_closed()
        # closing the listening socket does NOT drop established
        # connections — clients would hang on readline until process
        # exit; close them so they observe EOF promptly
        for w in list(self._writers):
            try:
                w.close()
            except Exception:  # noqa: BLE001
                pass

    # ----- connection handler -------------------------------------------
    async def _handle(
        self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter
    ) -> None:
        out_queue: asyncio.Queue = asyncio.Queue()

        async def pump() -> None:
            while True:
                msg = await out_queue.get()
                if msg is None:
                    break
                writer.write(encode(msg))
                await writer.drain()

        pump_task = asyncio.create_task(pump())
        self._writers.add(writer)
        try:
            while True:
                line = await reader.readline()
                if not line:
                    break
                try:
                    msg = decode(line)
                except ValueError:
                    out_queue.put_nowait(
                        {"type": "error", "message": "malformed message"}
                    )
                    continue
                if not isinstance(msg, dict):
                    # valid JSON but not an object ('[1]', '123'):
                    # without this, msg.get raises AttributeError out of
                    # the loop and the finally block cancels ALL of the
                    # client's executions over one stray line
                    out_queue.put_nowait(
                        {"type": "error", "message": "malformed message"}
                    )
                    continue
                if await self._dispatch(msg, out_queue):
                    # auth failure: flush the error reply, then close —
                    # the reference never establishes the connection
                    # without a valid key (api/auth.rs:14-33)
                    break
        finally:
            self._release_connection(out_queue)
            out_queue.put_nowait(None)
            try:
                await pump_task
            except Exception:  # noqa: BLE001
                # pump died with the connection (ConnectionResetError on
                # drain): re-raising would skip writer.close and log an
                # unhandled exception per abrupt disconnect
                pass
            self._writers.discard(writer)
            writer.close()

    def _release_connection(self, out_queue: asyncio.Queue) -> None:
        # the connection owns its executions (reference ties
        # cancellation to the connection): a disconnect cancels its
        # queued work and interrupts its running jobs instead of
        # orphaning compute that nobody will ever observe.  Shared by
        # the JSON-lines handler above and the websocket transport
        # (executor/ws.py).
        for ex in list(self._executions.values()):
            if ex.queue is out_queue and not ex.cancelled.is_set():
                ex.cancelled.set()
                if ex in self._pending:
                    self._pending.remove(ex)
                    self._executions.pop(ex.id, None)
                else:
                    self.spark.sparkContext._jsc.sc().cancelJobGroup(ex.id)
        self._broadcast_positions()

    def _authenticated(self, msg: dict[str, Any]) -> bool:
        provided = msg.get("api_key")
        return isinstance(provided, str) and hmac.compare_digest(
            provided.encode("utf-8"), self.api_key.encode("utf-8")
        )

    async def _dispatch(self, msg: dict[str, Any], out_queue: asyncio.Queue) -> bool:
        """Handle one message; returns True when the connection must
        close (failed authentication)."""
        mtype = msg.get("type")
        if mtype == "health_request":
            # the PUBLIC route (reference api/mod.rs:27,44-49): probes
            # and load balancers health-check without credentials
            out_queue.put_nowait({"type": "health", "status": "OK"})
            return False
        if mtype in ("execution_request", "cancel_request") and not self._authenticated(msg):
            out_queue.put_nowait(
                {"type": "error", "message": "authentication failed"}
            )
            return True
        if mtype == "execution_request":
            ex = _Execution(msg, out_queue)
            self._executions[ex.id] = ex
            self._pending.append(ex)
            out_queue.put_nowait(
                {
                    "type": "queued",
                    "execution_id": ex.id,
                    "position": len(self._pending),
                }
            )
            self._broadcast_positions()
            assert self._wakeup is not None
            self._wakeup.set()
        elif mtype == "cancel_request":
            # deliberately NOT scoped to the submitting connection: the
            # CLI 'cancel' command opens a fresh connection to cancel by
            # id (client.cancel_execution), and ids are 96-bit random
            # uuid4 prefixes — unguessable, capability-style
            ex = self._executions.get(msg.get("execution_id", ""))
            if ex is None:
                out_queue.put_nowait(
                    {"type": "error", "message": "unknown execution id"}
                )
                return
            ex.cancelled.set()
            if ex in self._pending:
                self._pending.remove(ex)
                # a cancelled-while-queued execution never reaches the
                # worker (whose finally would pop it) — pop here or the
                # entry leaks for the server's lifetime
                self._executions.pop(ex.id, None)
                ex.queue.put_nowait(
                    {"type": "cancelled", "execution_id": ex.id}
                )
                self._broadcast_positions()
            else:
                # running: interrupt Spark jobs in this execution's group
                self.spark.sparkContext._jsc.sc().cancelJobGroup(ex.id)
        else:
            out_queue.put_nowait(
                {"type": "error", "message": f"unknown message type: {mtype}"}
            )
        return False

    def _broadcast_positions(self) -> None:
        for pos, ex in enumerate(self._pending, start=1):
            ex.queue.put_nowait(
                {"type": "queue_position", "execution_id": ex.id, "position": pos}
            )

    # ----- single-concurrency worker ------------------------------------
    async def _worker(self) -> None:
        loop = asyncio.get_running_loop()
        while True:
            while not self._pending:
                assert self._wakeup is not None
                self._wakeup.clear()
                await self._wakeup.wait()
            ex = self._pending.pop(0)
            self._broadcast_positions()
            if ex.cancelled.is_set():
                continue
            ex.queue.put_nowait({"type": "started", "execution_id": ex.id})
            tracker = _StreamingTracker(loop, ex.queue)
            try:
                await loop.run_in_executor(None, self._run_one, ex, tracker)
                # a clean completion is SUCCEEDED even when a cancel
                # raced it: the destination write committed, and
                # reporting "cancelled" would tell the client nothing
                # was written when everything was
                done_msg = {"type": "succeeded", "execution_id": ex.id}
                if ex.cancelled.is_set():
                    # cancelJobGroup only interrupts ACTIVE Spark jobs;
                    # a cancel landing between jobs (driver-side work,
                    # planning) lets the pipeline run to completion —
                    # say so honestly instead of claiming the cancel
                    # came after the run finished
                    done_msg["note"] = (
                        "cancellation requested but the execution "
                        "completed anyway (cancel takes effect only at "
                        "Spark job boundaries); the destination write "
                        "committed"
                    )
                ex.queue.put_nowait(done_msg)
            except Exception as exc:  # noqa: BLE001 - reported to client
                if ex.cancelled.is_set():
                    # cancelJobGroup interrupts the running Spark action,
                    # which surfaces here as an exception — report the
                    # clean protocol outcome, not a stack trace
                    ex.queue.put_nowait(
                        {"type": "cancelled", "execution_id": ex.id}
                    )
                else:
                    ex.queue.put_nowait(
                        {
                            "type": "error",
                            "execution_id": ex.id,
                            "message": str(exc)[:2000],
                        }
                    )
            finally:
                self._executions.pop(ex.id, None)

    def _run_one(self, ex: _Execution, tracker: ProgressTracker) -> None:
        req = ex.request
        pipeline = load_pipeline_str(
            req["pipeline"],
            fmt=req.get("format", "yaml"),
            params=req.get("params") or {},
            # the client substitutes templates before submitting
            # (reference remote CLI semantics); re-substituting here
            # would reject any PARAM VALUE that itself contains ${...}
            substitute=not req.get("pre_substituted", False),
        )
        sc = self.spark.sparkContext
        sc.setJobGroup(ex.id, f"aqueducts execution {ex.id}", interruptOnCancel=True)
        try:
            run_pipeline(self.spark, pipeline, tracker)
        finally:
            sc.setJobGroup("", "")


def run_server(
    spark: SparkSession,
    host: str = "127.0.0.1",
    port: int = 8765,
    api_key: str = "",
) -> None:
    """Blocking entry point: serve until interrupted.  ``api_key`` is
    REQUIRED non-empty (reference config.rs:29-31)."""

    async def main() -> None:
        server = ExecutorServer(spark, host, port, api_key=api_key)
        await server.start()
        await asyncio.Event().wait()  # serve forever

    asyncio.run(main())
