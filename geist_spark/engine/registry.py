"""Stream-spec registry: versioned catalog with upgrade gating.

Mirrors internal/pkg/registry/registry.go:
- `put` version-gates: reject same-or-lower version for an existing id
  (registry.go:167-186)
- specs persist through a sink loader (the reference stores specs *via
  a stream*; here the storage backend is pluggable: in-memory dict or
  a parquet table via KeyedTableLoader)
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


class SpecRegistry:
    def __init__(self, env: str = "", storage_path: str | None = None):
        self.env = env
        self.storage_path = storage_path
        self._specs: dict[str, Spec] = {}
        self._listeners: list[Callable[[str], None]] = []
        if storage_path:
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
        if not self.storage_path:
            return
        os.makedirs(self.storage_path, exist_ok=True)
        fn = os.path.join(self.storage_path, f"{spec.id}.json")
        with open(fn, "w") as f:
            f.write(spec.json())

    def fetch(self) -> None:
        """Load all persisted specs (reference registry.go:110-145)."""
        if not self.storage_path or not os.path.isdir(self.storage_path):
            return
        for fn in sorted(os.listdir(self.storage_path)):
            if not fn.endswith(".json"):
                continue
            with open(os.path.join(self.storage_path, fn)) as f:
                try:
                    spec = parse_spec(f.read())
                except SpecError:
                    continue
                if self.env:
                    spec = resolve_ops_per_env(spec, self.env)
                self._specs[spec.id] = spec
