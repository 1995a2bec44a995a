"""Completion protocol (parity: reference src/finish.rs).

``Finish`` carries the inner sink out of ``finish()`` even when the
final write failed, so callers can always recover their writer.
``AutoFinish`` / ``AutoFinishUnchecked`` are context-manager analogs of
the reference's RAII wrappers (src/finish.rs:126-194).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Generic, Optional, TypeVar

T = TypeVar("T")
E = TypeVar("E")


@dataclass
class Finish(Generic[T, E]):
    """Result-with-value: (inner, maybe-error). Parity: src/finish.rs:11-89."""
    inner: T
    error: Optional[E] = None

    def into_result(self) -> T:
        if self.error is not None:
            raise self.error            # type: ignore[misc]
        return self.inner

    def unwrap(self) -> tuple[T, Optional[E]]:
        return self.inner, self.error

    def as_inner(self) -> T:
        return self.inner

    def map(self, fn) -> "Finish":
        return Finish(fn(self.inner), self.error)


class AutoFinish:
    """Context manager that finishes on exit; raises if finish fails."""

    def __init__(self, encoder: Any) -> None:
        self.inner = encoder

    def __enter__(self) -> Any:
        return self.inner

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is None:
            self.inner.finish()


class AutoFinishUnchecked(AutoFinish):
    """Like AutoFinish but swallows finish-time errors."""

    def __exit__(self, exc_type, exc, tb) -> None:
        try:
            self.inner.finish()
        except Exception:
            pass
