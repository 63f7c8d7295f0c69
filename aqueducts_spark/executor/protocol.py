"""Remote-execution protocol messages.

Mirrors the reference's websocket protocol shapes
(aqueducts/schemas/src/protocol.rs:29-95) over a JSON-lines transport
(one JSON object per line; stdlib-only — this environment has no
websocket library, and the message semantics, not the framing, are the
parity surface):

client -> executor: ``execution_request {pipeline, params}``,
``cancel_request {execution_id}``
executor -> client: ``queued {execution_id, position}``,
``queue_position {position}``, ``progress_update {event, name,
duration_ms}``, ``output_start/output_chunk/output_end`` (chunked at
32,000 chars, reference executor/progress_tracker.rs:9),
``succeeded {execution_id}``, ``error {message}``
"""

from __future__ import annotations

import json
from typing import Any

OUTPUT_CHUNK_CHARS = 32_000  # reference executor/progress_tracker.rs:9

# asyncio StreamReader's default readline limit is 64 KiB; a pipeline
# submission or an escaped output chunk (32k chars can JSON-encode to
# ~192 KB with non-ASCII escapes) easily exceeds it, and overflow kills
# the connection with a bare ValueError.  Both server and client create
# their streams with this limit instead.
STREAM_LIMIT = 8 * 1024 * 1024


def encode(msg: dict[str, Any]) -> bytes:
    return (json.dumps(msg, separators=(",", ":")) + "\n").encode()


def decode(line: bytes) -> dict[str, Any]:
    return json.loads(line.decode())


def chunk_output(stage: str, output_type: str, payload: str):
    """Yield output_start / output_chunk* / output_end messages.
    Chunks carry ``output_type`` too, so a stage emitting several
    output kinds (show + explain) reassembles into separate streams."""
    yield {"type": "output_start", "stage": stage, "output_type": output_type}
    for i in range(0, len(payload), OUTPUT_CHUNK_CHARS):
        yield {
            "type": "output_chunk",
            "stage": stage,
            "output_type": output_type,
            "data": payload[i : i + OUTPUT_CHUNK_CHARS],
        }
    yield {"type": "output_end", "stage": stage, "output_type": output_type}
