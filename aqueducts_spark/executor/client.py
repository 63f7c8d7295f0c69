"""Client helpers for the remote executor (reference: remote CLI path,
aqueducts-cli/src/remote_exec.rs — templating happens CLIENT-side, the
executor receives the already-substituted pipeline)."""

from __future__ import annotations

import asyncio
from typing import Any, Callable, Optional

from ..config.templating import substitute_params
from .protocol import STREAM_LIMIT, decode, encode


async def _drain_for_terminal(
    reader,
    grace: float,
    on_msg: Optional[Callable[[dict[str, Any]], None]] = None,
) -> Optional[dict[str, Any]]:
    """After an inactivity cancel, read for up to ``grace`` seconds
    hoping for the server's terminal succeeded/cancelled/error message;
    returns it, or None if the server stays silent / disconnects.

    Non-terminal messages received during the drain (the server may
    flush buffered output chunks before its terminal) are forwarded to
    ``on_msg`` so progress callbacks fire and chunk reassembly stays
    complete — dropping them would silently truncate ``outputs`` on a
    run that ultimately reports success."""
    deadline = asyncio.get_event_loop().time() + grace
    while True:
        remaining = deadline - asyncio.get_event_loop().time()
        if remaining <= 0:
            return None
        try:
            line = await asyncio.wait_for(reader.readline(), remaining)
        except asyncio.TimeoutError:
            return None
        if not line:
            return None
        msg = decode(line)
        if msg.get("type") in ("succeeded", "error", "cancelled"):
            return msg
        if on_msg:
            on_msg(msg)


async def _submit(
    host: str,
    port: int,
    pipeline_text: str,
    fmt: str,
    on_message: Optional[Callable[[dict[str, Any]], None]],
    timeout: float,
    api_key: str,
) -> dict[str, Any]:
    reader, writer = await asyncio.open_connection(host, port, limit=STREAM_LIMIT)
    writer.write(
        encode(
            {
                "type": "execution_request",
                "pipeline": pipeline_text,
                "format": fmt,
                "pre_substituted": True,
                # the X-API-Key header of the reference protocol
                # (aqueducts-executor/src/api/auth.rs:11), carried as a
                # request field on this JSON-lines transport
                "api_key": api_key,
            }
        )
    )
    await writer.drain()
    # reassemble per (stage, output_type): a stage can emit several
    # output kinds (show + explain) and their chunks interleave
    outputs: dict[tuple[str, str], list[str]] = {}
    final: dict[str, Any] = {}
    execution_id: Optional[str] = None
    started = False
    queued_waits = 0

    def handle(msg: dict[str, Any]) -> None:
        """ONE handler for both the main loop and the post-cancel drain
        — two copies drifted before (the drain path missed output_start
        seeding)."""
        if on_message:
            on_message(msg)
        mtype = msg.get("type")
        if mtype in ("output_start", "output_chunk"):
            # output_start seeds the key so an EMPTY payload (zero
            # chunks) still appears in outputs and keeps the
            # stage-vs-stage::type naming stable
            key = (msg["stage"], msg.get("output_type", ""))
            parts = outputs.setdefault(key, [])
            if mtype == "output_chunk":
                parts.append(msg["data"])

    try:
        while True:
            try:
                line = await asyncio.wait_for(reader.readline(), timeout)
            except asyncio.TimeoutError:
                if not started and queued_waits < 3:
                    # still QUEUED behind another execution: the server
                    # is silent by design (positions broadcast only on
                    # queue changes), so an immediate inactivity cancel
                    # would kill a perfectly healthy queued run — extend
                    # the patience (bounded: a wedged server must still
                    # surface as an error, not an infinite wait).
                    queued_waits += 1
                    if on_message:
                        on_message(
                            {
                                "type": "client_note",
                                "message": (
                                    f"no server traffic for {timeout}s but "
                                    "the execution has not started (queued) "
                                    f"— waiting ({queued_waits}/3 extensions)"
                                ),
                            }
                        )
                    continue
                # inactivity horizon exceeded MID-RUN: cancel the remote
                # execution instead of orphaning it, and surface a
                # clean protocol error rather than a raw TimeoutError.
                if execution_id is not None:
                    try:
                        writer.write(
                            encode(
                                {
                                    "type": "cancel_request",
                                    "execution_id": execution_id,
                                }
                            )
                        )
                        await writer.drain()
                    except Exception:
                        # half-dead connection: the cancel cannot be
                        # delivered — fall through to the clean error
                        # dict instead of leaking ConnectionResetError
                        # (and losing the reassembled outputs)
                        pass
                    else:
                        # Cancellation can race completion: the server
                        # then reports 'succeeded' (write committed!)
                        # rather than 'cancelled'.  Briefly drain for
                        # that terminal message so the user is not told
                        # the run failed after its write landed.
                        final = await _drain_for_terminal(
                            reader, grace=min(10.0, timeout), on_msg=handle
                        )
                        if final:
                            final["after_inactivity_cancel"] = True
                            if on_message:
                                on_message(final)
                            break
                final = {
                    "type": "error",
                    "message": (
                        f"no message from executor for {timeout}s — "
                        "cancel requested; raise timeout for long-running "
                        "stages. NOTE: if the execution was already past "
                        "the point of cancellation its destination write "
                        "may still have committed — check the sink before "
                        "re-running"
                    ),
                }
                break
            if not line:
                final = {"type": "error", "message": "connection closed"}
                break
            msg = decode(line)
            if msg.get("execution_id"):
                execution_id = msg["execution_id"]
            if msg.get("type") == "started":
                started = True
            handle(msg)
            if msg.get("type") in ("succeeded", "error", "cancelled"):
                final = msg
                break
    finally:
        writer.close()
    # expose by stage name alone when unambiguous; 'stage::type' when a
    # stage produced several output kinds
    per_stage: dict[str, int] = {}
    for stage, _ in outputs:
        per_stage[stage] = per_stage.get(stage, 0) + 1
    final["outputs"] = {
        (stage if per_stage[stage] == 1 else f"{stage}::{otype}"): "".join(parts)
        for (stage, otype), parts in outputs.items()
    }
    return final


def submit_pipeline(
    host: str,
    port: int,
    pipeline_text: str,
    params: Optional[dict[str, str]] = None,
    fmt: str = "yaml",
    on_message: Optional[Callable[[dict[str, Any]], None]] = None,
    timeout: float = 300.0,
    api_key: str = "",
) -> dict[str, Any]:
    """Template client-side, submit, stream messages until terminal.

    Returns the terminal message with an ``outputs`` dict of
    re-assembled chunked stage outputs.  ``timeout`` is an INACTIVITY
    horizon on a RUNNING execution; while the execution is still queued
    behind others the client keeps waiting (the server is silent by
    design there, and a dead server surfaces as connection-closed).
    ``api_key`` must match the executor's key (the reference CLI's
    ``--api-key``, aqueducts-cli/src/main.rs:38-56) — a missing/wrong
    key comes back as ``{type: error, message: authentication failed}``.
    """
    substituted = substitute_params(pipeline_text, params)
    return asyncio.run(
        _submit(host, port, substituted, fmt, on_message, timeout, api_key)
    )


def check_health(host: str, port: int, timeout: float = 5.0) -> dict[str, Any]:
    """The PUBLIC health probe (reference ``GET /api/health``,
    aqueducts-executor/src/api/mod.rs:27,44-49): no API key needed;
    returns ``{type: health, status: OK}`` from a live executor."""

    async def go() -> dict[str, Any]:
        # the CONNECT is inside the timeout too: a firewalled host that
        # silently drops SYNs would otherwise hang the probe for the
        # OS TCP timeout (minutes) — a health check must answer fast
        try:
            reader, writer = await asyncio.wait_for(
                asyncio.open_connection(host, port), timeout
            )
        except TimeoutError:
            return {
                "type": "error",
                "message": f"connect timed out after {timeout}s",
            }
        try:
            writer.write(encode({"type": "health_request"}))
            await writer.drain()
            line = await asyncio.wait_for(reader.readline(), timeout)
            if not line:
                return {"type": "error", "message": "connection closed"}
            try:
                return decode(line)
            except ValueError:
                # something answered, but not this protocol (an HTTP
                # server on the port?) — that's unhealthy, not a crash
                return {
                    "type": "error",
                    "message": "non-protocol reply (wrong service on "
                    "this port?)",
                }
        except TimeoutError:
            return {"type": "error", "message": f"no reply in {timeout}s"}
        finally:
            writer.close()

    return asyncio.run(go())


def cancel_execution(
    host: str,
    port: int,
    execution_id: str,
    timeout: float = 2.0,
    api_key: str = "",
) -> dict[str, Any]:
    """Cancel by id over a fresh connection.  Returns the server's
    reply — an unknown id comes back as ``{type: error, ...}``, which
    the old fire-and-forget version silently swallowed (the CLI then
    claimed a cancel happened when nothing did).  ``api_key`` is
    required by the server (reference cancel carries it too,
    aqueducts-cli/src/main.rs:148-157)."""

    async def go() -> dict[str, Any]:
        reader, writer = await asyncio.open_connection(host, port)
        try:
            writer.write(
                encode(
                    {
                        "type": "cancel_request",
                        "execution_id": execution_id,
                        "api_key": api_key,
                    }
                )
            )
            await writer.drain()
            try:
                line = await asyncio.wait_for(reader.readline(), timeout)
            except asyncio.TimeoutError:
                # a SUCCESSFUL cancel produces no reply on this
                # connection (the cancelled/succeeded notification goes
                # to the owning client); only errors reply here, and
                # they reply immediately — silence after the short wait
                # means accepted
                return {"type": "accepted"}
            if not line:
                # a running execution's cancel produces no reply on THIS
                # connection (the cancelled/succeeded goes to the owning
                # client); connection close after a successful write is
                # the expected quiet outcome
                return {"type": "accepted"}
            return decode(line)
        finally:
            writer.close()

    return asyncio.run(go())
