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
) -> dict[str, Any]:
    reader, writer = await asyncio.open_connection(host, port, limit=STREAM_LIMIT)
    writer.write(
        encode(
            {
                "type": "execution_request",
                "pipeline": pipeline_text,
                "format": fmt,
                "pre_substituted": True,
            }
        )
    )
    await writer.drain()
    # reassemble per (stage, output_type): a stage can emit several
    # output kinds (show + explain) and their chunks interleave
    outputs: dict[tuple[str, str], list[str]] = {}
    final: dict[str, Any] = {}
    execution_id: Optional[str] = None
    try:
        while True:
            try:
                line = await asyncio.wait_for(reader.readline(), timeout)
            except asyncio.TimeoutError:
                # inactivity horizon exceeded: cancel the remote
                # execution instead of orphaning it, and surface a
                # clean protocol error rather than a raw TimeoutError.
                if execution_id is not None:
                    writer.write(
                        encode(
                            {
                                "type": "cancel_request",
                                "execution_id": execution_id,
                            }
                        )
                    )
                    await writer.drain()
                    # Cancellation can race completion: the server then
                    # reports 'succeeded' (write committed!) rather than
                    # 'cancelled'.  Briefly drain for that terminal
                    # message so the user is not told the run failed
                    # after its destination write landed.
                    def _drain_msg(msg: dict[str, Any]) -> None:
                        if on_message:
                            on_message(msg)
                        if msg.get("type") == "output_chunk":
                            key = (msg["stage"], msg.get("output_type", ""))
                            outputs.setdefault(key, []).append(msg["data"])

                    final = await _drain_for_terminal(
                        reader, grace=min(10.0, timeout), on_msg=_drain_msg
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
            if on_message:
                on_message(msg)
            if msg.get("type") == "output_chunk":
                key = (msg["stage"], msg.get("output_type", ""))
                outputs.setdefault(key, []).append(msg["data"])
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
) -> dict[str, Any]:
    """Template client-side, submit, stream messages until terminal.

    Returns the terminal message with an ``outputs`` dict of
    re-assembled chunked stage outputs.
    """
    substituted = substitute_params(pipeline_text, params)
    return asyncio.run(_submit(host, port, substituted, fmt, on_message, timeout))


def cancel_execution(host: str, port: int, execution_id: str) -> None:
    async def go() -> None:
        _, writer = await asyncio.open_connection(host, port)
        writer.write(encode({"type": "cancel_request", "execution_id": execution_id}))
        await writer.drain()
        writer.close()

    asyncio.run(go())
