"""Per-stream metrics, shaped like the reference's Metrics struct
(entity/common.go:36-62) and aggregated across executors by the
supervisor (supervisor.go:105-131). Streaming queries additionally
surface `StreamingQuery.lastProgress` through the same shape."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Metrics:
    events_processed: int = 0
    events_stored_in_sink: int = 0
    microbatches: int = 0
    bytes_processed: int = 0
    bytes_ingested: int = 0
    sink_operations: int = 0
    sink_processing_time_micros: int = 0
    event_processing_time_micros: int = 0
    events_excluded: int = 0
    events_failed: int = 0
    stream_restarts: int = 0

    def add(self, other: "Metrics") -> "Metrics":
        return Metrics(
            **{
                k: getattr(self, k) + getattr(other, k)
                for k in self.__dataclass_fields__
            }
        )


@dataclass
class NotifyEvent:
    """Engine notification event (reference entity.NotificationEvent,
    entity/notify.go:5-32: Level/Sender/Stream/Message; Timestamp and
    stack info omitted — tests assert on the deterministic fields)."""

    level: str
    sender: str
    message: str
    stream: str = ""


class Notifier:
    """Operational-event channel (reference pkg/notify): every
    lifecycle action lands here, and external consumers subscribe —
    the geist.NotificationChannel() surface (geist.go)."""

    def __init__(self):
        self.events: list[NotifyEvent] = []
        self._subscribers: list = []

    def notify(
        self, level: str, sender: str, message: str, stream: str = ""
    ) -> None:
        ev = NotifyEvent(level, sender, message, stream)
        self.events.append(ev)
        for cb in self._subscribers:
            try:
                cb(ev)
            except Exception:  # a broken consumer must not stall the engine
                pass

    def subscribe(self, callback) -> None:
        """callback(NotifyEvent) on every future event."""
        self._subscribers.append(callback)
