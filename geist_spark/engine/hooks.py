"""Enrichment hooks: client callables around the transform.

Mirrors entity/hook.go:5-30 and the executor's action handling
(internal/pkg/engine/executor.go:202-280). Hooks run:
- publish (single-event batch) path: per event, driver-side;
- streaming path: per micro-batch inside foreachBatch, via
  `apply_hook_to_pandas` (Arrow batches, not per-row Python).
"""

from __future__ import annotations

import json
from enum import IntEnum
from typing import Any, Callable


class HookAction(IntEnum):
    PROCEED = 0
    SKIP = 1
    RETRYABLE_ERROR = 2
    UNRETRYABLE_ERROR = 3
    SHUTDOWN = 4


# PreTransformHookFunc(ctx, event: bytearray-like holder) -> HookAction
PreTransformHook = Callable[[dict[str, Any], "EventHolder"], HookAction]
# PostTransformHookFunc(ctx, transformed: list[dict]) -> HookAction
PostTransformHook = Callable[[dict[str, Any], list[dict[str, Any]]], HookAction]


class EventHolder:
    """Mutable raw-event wrapper so hooks can enrich in place
    (geist.go EnrichEvent ≈ sjson set; geist.go:212-214)."""

    def __init__(self, data: str):
        self.data = data

    def enrich(self, **fields: Any) -> None:
        doc = json.loads(self.data) if self.data else {}
        doc.update(fields)
        self.data = json.dumps(doc, separators=(",", ":"))


class HookError(Exception):
    def __init__(self, action: HookAction):
        super().__init__(f"hook returned {action.name}")
        self.action = action
