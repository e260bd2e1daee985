"""Big-endian binary reading over an in-memory font blob.

Equivalent of the reference's buffered seekable reader + bulk big-endian
integer readers (``src/font/Font.zig:16-23``, ``src/helpers.zig:136-147``),
but host-idiomatic: the whole font file is mapped once and parsed with
``struct``/NumPy vectorized decodes instead of a streaming reader —
faster in Python and trivially seekable.
"""

from __future__ import annotations

import struct

import numpy as np


class BigEndianReader:
    """Cursor-based big-endian reader over ``bytes``."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def seek(self, pos: int) -> None:
        self.pos = pos

    def skip(self, n: int) -> None:
        self.pos += n

    def u8(self) -> int:
        try:
            v = self.data[self.pos]
        except IndexError:
            raise CorruptedFont("read past end of table data") from None
        self.pos += 1
        return v

    def u16(self) -> int:
        try:
            v = struct.unpack_from(">H", self.data, self.pos)[0]
        except struct.error:
            raise CorruptedFont("read past end of table data") from None
        self.pos += 2
        return v

    def i16(self) -> int:
        try:
            v = struct.unpack_from(">h", self.data, self.pos)[0]
        except struct.error:
            raise CorruptedFont("read past end of table data") from None
        self.pos += 2
        return v

    def u32(self) -> int:
        try:
            v = struct.unpack_from(">I", self.data, self.pos)[0]
        except struct.error:
            raise CorruptedFont("read past end of table data") from None
        self.pos += 4
        return v

    def i32(self) -> int:
        try:
            v = struct.unpack_from(">i", self.data, self.pos)[0]
        except struct.error:
            raise CorruptedFont("read past end of table data") from None
        self.pos += 4
        return v

    def i64(self) -> int:
        try:
            v = struct.unpack_from(">q", self.data, self.pos)[0]
        except struct.error:
            raise CorruptedFont("read past end of table data") from None
        self.pos += 8
        return v

    def tag(self) -> bytes:
        v = self.data[self.pos : self.pos + 4]
        self.pos += 4
        return v

    def bytes(self, n: int) -> bytes:
        v = self.data[self.pos : self.pos + n]
        self.pos += n
        return v

    def unpack(self, fmt: str) -> tuple:
        """Unpack a big-endian struct format (without the leading '>')."""
        size = struct.calcsize(">" + fmt)
        try:
            v = struct.unpack_from(">" + fmt, self.data, self.pos)
        except struct.error:
            raise CorruptedFont("read past end of table data") from None
        self.pos += size
        return v

    def u16_array(self, count: int) -> np.ndarray:
        """Bulk big-endian u16 decode (reference ``readInts``)."""
        arr = np.frombuffer(self.data, dtype=">u2", count=count, offset=self.pos)
        self.pos += 2 * count
        return arr.astype(np.uint16)

    def u32_array(self, count: int) -> np.ndarray:
        arr = np.frombuffer(self.data, dtype=">u4", count=count, offset=self.pos)
        self.pos += 4 * count
        return arr.astype(np.uint32)

    def i16_array(self, count: int) -> np.ndarray:
        arr = np.frombuffer(self.data, dtype=">i2", count=count, offset=self.pos)
        self.pos += 2 * count
        return arr.astype(np.int16)


def ensure_mono_increase(arr: np.ndarray, what: str = "array") -> None:
    """Validate monotone non-decreasing order (reference
    ``ensureMonoIncrease``, ``src/helpers.zig:56-63``); raises on corruption
    instead of a debug-only assert."""
    a = np.asarray(arr)
    if a.size > 1 and np.any(a[1:] < a[:-1]):
        raise CorruptedFont(f"{what} is not monotonically increasing")


class CorruptedFont(ValueError):
    """Typed structural-failure error (reference ``error.CorruptedTTF``,
    ``src/font/Font.zig:141-145``)."""
