"""Progress tracking (reference: aqueducts/core/src/progress_tracker.rs:69-104,
event shapes aqueducts/schemas/src/progress.rs:8-43).

A tracker receives lifecycle events and stage output. The default
implementation logs; a custom tracker can stream to a UI or service.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from typing import Any, Optional

logger = logging.getLogger("aqueducts_spark")


@dataclass
class ProgressEvent:
    kind: str  # started | source_registered | stage_started | stage_completed
    #          | destination_completed | completed
    name: Optional[str] = None
    duration_ms: Optional[int] = None
    extra: dict[str, Any] = field(default_factory=dict)


class ProgressTracker:
    """Base tracker: override :meth:`on_progress` / :meth:`on_output`."""

    def on_progress(self, event: ProgressEvent) -> None:  # pragma: no cover
        pass

    def on_output(
        self, stage_name: str, output_type: str, payload: str
    ) -> None:  # pragma: no cover
        """output_type: show | explain | explain_analyze | schema |
        plan_lint (scale-hazard warnings emitted alongside explain)."""
        pass


class LoggingTracker(ProgressTracker):
    def on_progress(self, event: ProgressEvent) -> None:
        detail = f" {event.name}" if event.name else ""
        timing = f" ({event.duration_ms} ms)" if event.duration_ms is not None else ""
        logger.info("%s%s%s", event.kind, detail, timing)

    def on_output(self, stage_name: str, output_type: str, payload: str) -> None:
        logger.info("[%s:%s]\n%s", stage_name, output_type, payload)


class CollectingTracker(ProgressTracker):
    """Test-friendly tracker that accumulates everything."""

    def __init__(self) -> None:
        self.events: list[ProgressEvent] = []
        self.outputs: list[tuple[str, str, str]] = []

    def on_progress(self, event: ProgressEvent) -> None:
        self.events.append(event)

    def on_output(self, stage_name: str, output_type: str, payload: str) -> None:
        self.outputs.append((stage_name, output_type, payload))


class _Timer:
    def __enter__(self) -> "_Timer":
        self._t0 = time.monotonic()
        return self

    def __exit__(self, *exc: Any) -> None:
        self.elapsed_ms = int((time.monotonic() - self._t0) * 1000)


def timer() -> _Timer:
    return _Timer()


class JsonLinesTracker(ProgressTracker):
    """Structured progress: one JSON object per line on ``stream``
    (stdout by default) — the reference executor streams structured
    progress events over its protocol (aqueducts-cli/src/main.rs
    renders them; aqueducts/schemas/src/progress.rs:8-43 shapes them);
    this is the local-run equivalent so drivers/CI can consume
    ``aqueducts-spark run --output-format json`` without scraping logs.

    Event lines: ``{"event": <kind>, "name": ..., "duration_ms": ...,
    ...extra}``; stage output lines: ``{"event": "output", "stage": ...,
    "output_type": ..., "payload": ...}``.  Only JSON-representable
    extras are emitted (anything else is stringified) so a line never
    fails to serialize mid-pipeline.
    """

    def __init__(self, stream: Any = None) -> None:
        import sys

        self._stream = stream if stream is not None else sys.stdout

    def _emit(self, obj: dict[str, Any]) -> None:
        import json

        self._stream.write(
            json.dumps(obj, default=str, ensure_ascii=False) + "\n"
        )
        self._stream.flush()

    def on_progress(self, event: ProgressEvent) -> None:
        obj: dict[str, Any] = {"event": event.kind}
        if event.name is not None:
            obj["name"] = event.name
        if event.duration_ms is not None:
            obj["duration_ms"] = event.duration_ms
        for k, v in event.extra.items():
            obj.setdefault(k, v)
        self._emit(obj)

    def on_output(self, stage_name: str, output_type: str, payload: str) -> None:
        self._emit(
            {
                "event": "output",
                "stage": stage_name,
                "output_type": output_type,
                "payload": payload,
            }
        )
