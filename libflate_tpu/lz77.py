"""Public LZ77 surface (parity: reference libflate_lz77/src/lib.rs, re-exported
at src/lz77.rs:4).

The framework's native token representation is array-shaped (see
libflate_tpu.serial.lz77); this module provides the enum-style ``Code``
view plus the compression-level and encoder-selection API.
"""
from __future__ import annotations

import enum
from dataclasses import dataclass

from .serial.lz77 import (chain_tokens, expand_tokens, greedy_tokens,
                          literal_tokens)
from .spec.constants import (MAX_DISTANCE, MAX_MATCH, MIN_MATCH,
                             WINDOW_SIZE as MAX_WINDOW_SIZE)

MAX_LENGTH = MAX_MATCH


class CompressionLevel(enum.Enum):
    """Parity: libflate_lz77/src/lib.rs:46-58."""
    NONE = "none"
    FAST = "fast"
    BALANCE = "balance"
    BEST = "best"

    def matcher(self) -> str:
        return {"none": "none", "fast": "greedy",
                "balance": "greedy", "best": "chain"}[self.value]


@dataclass(frozen=True)
class Code:
    """Literal or back-pointer (parity: lib.rs:28-42 Code enum)."""
    length: int
    backward_distance: int = 0

    @classmethod
    def literal(cls, byte: int) -> "Code":
        return cls(byte, 0)

    @classmethod
    def pointer(cls, length: int, distance: int) -> "Code":
        if not (MIN_MATCH <= length <= MAX_LENGTH):
            raise ValueError(f"pointer length {length} out of range")
        if not (1 <= distance <= MAX_DISTANCE):
            raise ValueError(f"pointer distance {distance} out of range")
        return cls(length, distance)

    @property
    def is_literal(self) -> bool:
        return self.backward_distance == 0


def encode(data: bytes, level: CompressionLevel = CompressionLevel.BALANCE,
           window_size: int = MAX_DISTANCE) -> list[Code]:
    """Tokenize ``data`` at the given level."""
    matcher = level.matcher()
    if matcher == "none":
        toks = literal_tokens(data)
    elif matcher == "greedy":
        toks = greedy_tokens(data, window_size)
    else:
        toks = chain_tokens(data, window_size)
    return [Code(a, b) for a, b in toks]


def decode(codes: list[Code]) -> bytes:
    """Expand tokens back to bytes (parity: Lz77Decoder)."""
    return bytes(expand_tokens([(c.length, c.backward_distance)
                                for c in codes]))
