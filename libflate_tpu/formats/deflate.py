"""Public raw-DEFLATE API (parity: reference src/deflate/mod.rs:22-25).

Re-exports the engine-dispatching one-shot functions plus streaming
Encoder/Decoder façades matching the reference's surface.
"""
from __future__ import annotations

import io

from .. import backend as _backend
from ..serial.deflate import DeflateError, EncodeOptions, InflateResult
from ..spec.constants import DEFAULT_BLOCK_SIZE

__all__ = ["DeflateError", "EncodeOptions", "InflateResult",
           "DEFAULT_BLOCK_SIZE", "compress", "decompress",
           "Encoder", "Decoder"]


def compress(data: bytes, options: EncodeOptions | None = None,
             engine: str | None = None) -> bytes:
    """One-shot raw DEFLATE compression."""
    return bytes(_backend.get(engine).deflate(data, options))


def decompress(data: bytes, engine: str | None = None) -> bytes:
    """One-shot raw DEFLATE decompression."""
    return bytes(_backend.get(engine).inflate(data).data)


class Encoder:
    """Streaming façade (parity: deflate::Encoder src/deflate/encode.rs)."""

    def __init__(self, sink=None, options: EncodeOptions | None = None,
                 engine: str | None = None) -> None:
        self._sink = sink if sink is not None else io.BytesIO()
        self._buf = bytearray()
        self._options = options
        self._engine = engine
        self._finished = False

    def write(self, data: bytes) -> int:
        if self._finished:
            raise ValueError("write after finish")
        self._buf += data
        return len(data)

    def finish(self):
        if not self._finished:
            self._finished = True
            self._sink.write(compress(bytes(self._buf), self._options,
                                      self._engine))
        return self._sink

    def getvalue(self) -> bytes:
        self.finish()
        return self._sink.getvalue()


class Decoder:
    """Streaming façade with partial-output salvage.

    ``unread_decoded_data`` exposes whatever decoded cleanly before a
    mid-stream error (parity: src/deflate/decode.rs:71-73, issue #71).
    """

    def __init__(self, data: bytes, engine: str | None = None) -> None:
        self._error: Exception | None = None
        try:
            self._result = _backend.get(engine).inflate(bytes(data))
            self._data = bytes(self._result.data)
        except (DeflateError, EOFError) as e:
            # salvage whatever decoded cleanly before the error; the
            # serial engine attaches .partial — fall back to it when a
            # faster engine errored without one
            self._error = e
            partial = getattr(e, "partial", None)
            if partial is None:
                from ..serial.deflate import inflate as _serial_inflate
                try:
                    _serial_inflate(bytes(data))
                    partial = b""
                except Exception as se:
                    partial = getattr(se, "partial", b"")
            self._data = bytes(partial)
        self._pos = 0

    def read(self, n: int = -1) -> bytes:
        if self._error is not None:
            raise self._error
        if n < 0:
            n = len(self._data) - self._pos
        out = self._data[self._pos:self._pos + n]
        self._pos += len(out)
        return out

    def unread_decoded_data(self) -> bytes:
        return self._data[self._pos:]
