"""Stream-spec registry: versioned catalog with upgrade gating.

Mirrors internal/pkg/registry/registry.go:
- `put` version-gates: reject same-or-lower version for an existing id
  (registry.go:167-186)
- storage is pluggable behind persist/load_all: `FileStorage` (one
  JSON file per spec) or the engine's stream-backed storage
  (engine/api.py RegistryStreamStorage), which restores the
  reference's "the registry is itself a stream" bootstrap property
  (regspec.go:15-100, registry.go:110-145)
- `fetch` loads all persisted specs (registry.go:110-145)
- registry-modified notifications fan out to listeners (the
  supervisor redeploys affected streams; registry.go:257-279).
"""

from __future__ import annotations

import json
import os
from typing import Callable

from geist_spark.spec.model import Spec, SpecError, parse_spec, resolve_ops_per_env


class RegistryError(ValueError):
    pass


class FileStorage:
    """One JSON file per spec id under a directory."""

    def __init__(self, path: str):
        self.path = path

    def persist(self, spec: Spec) -> None:
        os.makedirs(self.path, exist_ok=True)
        with open(os.path.join(self.path, f"{spec.id}.json"), "w") as f:
            f.write(spec.json())

    def load_all(self) -> list[str]:
        if not os.path.isdir(self.path):
            return []
        out = []
        for fn in sorted(os.listdir(self.path)):
            if fn.endswith(".json"):
                with open(os.path.join(self.path, fn)) as f:
                    out.append(f.read())
        return out


class SpecRegistry:
    def __init__(
        self,
        env: str = "",
        storage_path: str | None = None,
        storage=None,
    ):
        self.env = env
        self.storage = storage or (FileStorage(storage_path) if storage_path else None)
        self._specs: dict[str, Spec] = {}
        self._listeners: list[Callable[[str], None]] = []
        if self.storage is not None:
            self.fetch()

    # -- reference Registry API -------------------------------------

    def put(self, spec_json: str | bytes | dict) -> str:
        spec = parse_spec(spec_json)
        existing = self._specs.get(spec.id)
        if existing is not None and spec.version <= existing.version:
            raise RegistryError(
                f"spec {spec.id} v{spec.version} rejected: version must exceed "
                f"registered v{existing.version}"
            )
        if self.env:
            spec = resolve_ops_per_env(spec, self.env)
        self._specs[spec.id] = spec
        self._persist(spec)
        for listener in self._listeners:
            listener(spec.id)
        return spec.id

    def get(self, stream_id: str) -> Spec | None:
        return self._specs.get(stream_id)

    def exists(self, stream_id: str) -> bool:
        return stream_id in self._specs

    def all(self) -> list[Spec]:
        return list(self._specs.values())

    def delete(self, stream_id: str) -> None:
        self._specs.pop(stream_id, None)

    def on_modified(self, listener: Callable[[str], None]) -> None:
        self._listeners.append(listener)

    # -- persistence ------------------------------------------------

    def _persist(self, spec: Spec) -> None:
        if self.storage is not None:
            self.storage.persist(spec)

    def fetch(self) -> None:
        """Load all persisted specs (reference registry.go:110-145)."""
        if self.storage is None:
            return
        for raw in self.storage.load_all():
            try:
                spec = parse_spec(raw)
            except SpecError:
                continue
            if self.env:
                spec = resolve_ops_per_env(spec, self.env)
            self._specs[spec.id] = spec

    def sync(self) -> list[str]:
        """Cross-engine convergence (the reference's cross-POD admin
        sync, supervisor.go:288-317 + adminspec.go:25-42, with the
        shared registry storage playing the Pub/Sub admin stream's
        role): re-read storage, adopt specs that are NEW or have a
        HIGHER version than the cached one, and fire the modified
        listeners for each — so a second engine on the same registry
        redeploys streams registered by the first. Returns the adopted
        stream ids."""
        if self.storage is None:
            return []
        changed: list[str] = []
        for raw in self.storage.load_all():
            try:
                spec = parse_spec(raw)
            except SpecError:
                continue
            if self.env:
                spec = resolve_ops_per_env(spec, self.env)
            cached = self._specs.get(spec.id)
            if cached is not None and spec.version <= cached.version:
                continue
            self._specs[spec.id] = spec
            changed.append(spec.id)
        for sid in changed:
            for listener in self._listeners:
                listener(sid)
        return changed
