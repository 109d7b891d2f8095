"""Callback handle registry — "function handles as data".

The reference stores user callbacks in rows as string function handles and
dispatches them dynamically at flush/iterate time (schema.ts:18 stores
``processBatchHandle``; dispatch at lib.ts:576-578 and lib.ts:986-1008;
handles created client-side at src/client/index.ts:221-223,277-285).

Spark equivalent: config rows/state tables store a NAME; the driver resolves
the name through this registry to a Python callable. Executors never see the
callable — dispatch happens driver-side (foreachBatch / iterator chunk), so
nothing here is pickled into tasks.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


class HandleRegistry:
    """Name → callable registry with decorator registration."""

    def __init__(self) -> None:
        self._handles: dict[str, Callable[..., Any]] = {}

    def register(self, name: str | None = None):
        def deco(fn: Callable[..., Any]):
            key = name or fn.__name__
            self._handles[key] = fn
            return fn

        return deco

    def add(self, name: str, fn: Callable[..., Any]) -> None:
        self._handles[name] = fn

    def resolve(self, name: str) -> Callable[..., Any]:
        if name not in self._handles:
            raise KeyError(f"no handle registered under {name!r}")
        return self._handles[name]

    def __contains__(self, name: str) -> bool:
        return name in self._handles


# process-global default registry (mirrors the component's single handle
# namespace); accumulator/iterator accept a custom one for tests.
default_registry = HandleRegistry()
