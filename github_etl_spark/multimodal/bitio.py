"""MSB-first bit-level I/O shared by the compressed-bitstream codecs.

JPEG's entropy-coded segments and FLAC's frame payloads are both
big-endian bit streams (most-significant bit first within each byte),
so one reader/writer pair serves both.  Pure stdlib + ints: the
accumulator never holds more than ``nbits + 7`` bits, so reads are
O(1) regardless of payload size (a single big-int over the whole
payload would make every read O(len)).

The reader raises ``ValueError`` (never IndexError) on exhaustion so
codec decoders can uphold the quarantine contract — any malformed or
truncated payload must surface as ValueError, never a batch-killing
exception type (see tests/test_multimodal.py fuzz gate).
"""

from __future__ import annotations


class BitWriter:
    """Accumulates MSB-first bits; ``getvalue`` pads the tail byte."""

    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits < 0 or (nbits and value >> nbits):
            raise ValueError(f"value {value} does not fit in {nbits} bits")
        self._acc = (self._acc << nbits) | value
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            self._out.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def write_unary(self, q: int) -> None:
        """FLAC-style unary: q zero bits then a terminating one bit."""
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self, fill_bit: int = 0) -> None:
        """Pad to a byte boundary with ``fill_bit`` (JPEG pads with 1s)."""
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1 if fill_bit else 0, pad)

    @property
    def bit_length(self) -> int:
        return len(self._out) * 8 + self._n

    def getvalue(self, fill_bit: int = 0) -> bytes:
        self.align(fill_bit)
        return bytes(self._out)


class BitReader:
    """MSB-first reader over ``bytes`` or ``memoryview``; ValueError on
    exhaustion.  Callers that re-anchor a reader per frame (FLAC) pass a
    memoryview slice so setup stays O(1) instead of copying the whole
    remaining stream each frame (O(n_frames x remaining) on real
    multi-frame files)."""

    def __init__(self, data: bytes | memoryview) -> None:
        self._d = data
        self._i = 0
        self._acc = 0
        self._n = 0

    def read(self, nbits: int) -> int:
        while self._n < nbits:
            if self._i >= len(self._d):
                raise ValueError("truncated bitstream")
            self._acc = (self._acc << 8) | self._d[self._i]
            self._i += 1
            self._n += 8
        self._n -= nbits
        v = (self._acc >> self._n) & ((1 << nbits) - 1)
        self._acc &= (1 << self._n) - 1
        return v

    def read_unary(self) -> int:
        """Count zero bits up to the terminating one bit (FLAC rice)."""
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:  # corrupt-stream guard: bounded, not hung
                raise ValueError("unary run exceeds sanity bound")
        return q

    def align(self) -> None:
        self._n = 0
        self._acc = 0

    @property
    def bits_consumed(self) -> int:
        return self._i * 8 - self._n

    @property
    def byte_pos(self) -> int:
        """Position of the next unread byte when byte-aligned."""
        if self._n:
            raise ValueError("byte_pos requires byte alignment")
        return self._i
