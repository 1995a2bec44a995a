"""Public raw-DEFLATE API (parity: reference src/deflate/mod.rs:22-25).

Re-exports the engine-dispatching one-shot functions plus streaming
Encoder/Decoder façades matching the reference's surface.
"""
from __future__ import annotations

import io

from .. import backend as _backend
from ..serial.deflate import DeflateError, EncodeOptions, InflateResult
from ..spec.constants import DEFAULT_BLOCK_SIZE, MAX_STORED_BLOCK

__all__ = ["DeflateError", "EncodeOptions", "InflateResult",
           "DEFAULT_BLOCK_SIZE", "compress", "decompress",
           "Encoder", "Decoder"]


def compress(data: bytes, options: EncodeOptions | None = None,
             engine: str | None = None) -> bytes:
    """One-shot raw DEFLATE compression.

        >>> import zlib
        >>> zlib.decompress(compress(b"raw deflate"), wbits=-15)
        b'raw deflate'
    """
    return bytes(_backend.get(engine).deflate(data, options))


def decompress(data: bytes, engine: str | None = None) -> bytes:
    """One-shot raw DEFLATE decompression.

        >>> import zlib
        >>> co = zlib.compressobj(9, zlib.DEFLATED, -15)
        >>> decompress(co.compress(b"foreign") + co.flush())
        b'foreign'
    """
    return bytes(_backend.get(engine).inflate(data).data)


class BlockStreamer:
    """Incremental DEFLATE block emitter with O(block_size) memory.

    Buffers at most one block of input; once more than ``block_size``
    bytes are pending, completed blocks are entropy-coded and their
    finished bytes drained immediately (parity: Block::write flushing
    complete blocks while data streams in —
    src/deflate/encode.rs:277-295).  Output is byte-identical to the
    one-shot serial ``deflate()`` for any write chunking, because both
    split input at the same block boundaries and reset LZ77 state per
    block.
    """

    def __init__(self, options: EncodeOptions | None = None) -> None:
        from ..serial.bitio import BitWriter
        self._opts = options or EncodeOptions()
        self._w = BitWriter()
        self._pending = bytearray()

    def feed(self, data: bytes) -> bytes:
        """Absorb input; return whatever compressed bytes completed."""
        from ..serial.deflate import _write_compressed, _write_stored
        self._pending += data
        bs = (MAX_STORED_BLOCK if self._opts.block_type == "stored"
              else self._opts.block_size)
        while len(self._pending) > bs:
            chunk = bytes(self._pending[:bs])
            del self._pending[:bs]
            if self._opts.block_type == "stored":
                _write_stored(self._w, chunk, final=False)
            else:
                _write_compressed(self._w, self._opts.tokenize(chunk),
                                  self._opts.block_type == "dynamic",
                                  final=False)
        return self._w.take_bytes()

    def sync_flush(self) -> bytes:
        """Emit pending input as non-final blocks + the sync marker."""
        from ..serial.deflate import (_write_compressed, _write_stored,
                                      sync_flush_marker)
        chunk = bytes(self._pending)
        self._pending.clear()
        if chunk:
            if self._opts.block_type == "stored":
                _write_stored(self._w, chunk, final=False)
            else:
                _write_compressed(self._w, self._opts.tokenize(chunk),
                                  self._opts.block_type == "dynamic",
                                  final=False)
        sync_flush_marker(self._w)
        return self._w.take_bytes()

    def finish(self) -> bytes:
        """Emit the remainder as the final block; byte-aligns the tail."""
        from ..serial.deflate import _write_compressed, _write_stored
        chunk = bytes(self._pending)
        self._pending.clear()
        if self._opts.block_type == "stored":
            _write_stored(self._w, chunk, final=True)
        else:
            _write_compressed(self._w, self._opts.tokenize(chunk),
                              self._opts.block_type == "dynamic",
                              final=True)
        self._w.align_byte()
        return self._w.take_bytes()


class Encoder:
    """Streaming encoder (parity: deflate::Encoder src/deflate/encode.rs).

    With the default engine, writes stream through
    :class:`BlockStreamer`: a 1 GiB input is encoded in O(block_size)
    memory and the output byte-matches the one-shot serial
    ``compress()``.  An explicit ``engine`` keeps the buffer-all
    behaviour (whole input handed to that engine at ``finish()``) —
    the fast native/device paths produce complete streams, not
    incremental blocks.
    """

    def __init__(self, sink=None, options: EncodeOptions | None = None,
                 engine: str | None = None) -> None:
        self._sink = sink if sink is not None else io.BytesIO()
        self._engine = engine
        self._options = options
        if engine is None:
            self._streamer = BlockStreamer(options)
        else:
            self._streamer = None
            self._buf = bytearray()
        self._finished = False

    def write(self, data: bytes) -> int:
        if self._finished:
            raise ValueError("write after finish")
        if self._streamer is None:
            self._buf += data
        else:
            out = self._streamer.feed(bytes(data))
            if out:
                self._sink.write(out)
        return len(data)

    def finish(self):
        if not self._finished:
            self._finished = True
            if self._streamer is None:
                self._sink.write(compress(bytes(self._buf), self._options,
                                          self._engine))
            else:
                self._sink.write(self._streamer.finish())
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
