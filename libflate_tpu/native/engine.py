"""Backend registration for the native C++ host engine."""
from __future__ import annotations

from .. import backend
from ..serial.deflate import EncodeOptions, InflateResult
from . import (adler32, available, crc32, deflate_greedy, inflate)


def _deflate(data, opts=None):
    opts = opts or EncodeOptions()
    if opts.block_type == "dynamic" and opts.matcher in ("greedy", "chain"):
        # native path: greedy/lazy matcher + dynamic blocks + RLE headers
        return deflate_greedy(
            bytes(data), block_size=opts.block_size,
            lazy=opts.matcher == "chain" or bool(opts.lazy),
            max_chain=opts.max_chain if opts.matcher == "chain" else 1)
    from ..serial.deflate import deflate as serial_deflate
    return serial_deflate(bytes(data), opts)


def _inflate(data):
    out, end_bit = inflate(bytes(data))
    return InflateResult(bytearray(out), end_bit)


def register() -> None:
    backend.register(backend.Engine(
        name="native",
        deflate=_deflate,
        inflate=_inflate,
        crc32=lambda data, crc=0: crc32(bytes(data), crc),
        adler32=lambda data, adler=1: adler32(bytes(data), adler),
        available=available,
    ))


register()
