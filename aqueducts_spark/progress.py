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
