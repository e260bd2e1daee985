"""Fixed-point numbers for TrueType wire values.

Behavioral equivalent of the reference's comptime
``FixedPointNumber(T, bias_bits)`` (``src/helpers.zig:66-133``), used for
TrueType 2.14 component transforms (``src/font/ttf.zig:8``) and 16.16
table versions (``src/font/Font.zig:12-13``).

Rounding convention for ``round_to_int`` is round-half-away-from-zero,
matching the reference's ``roundToInt``.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True, slots=True)
class FixedPoint:
    """An integer-backed fixed-point value: ``value = data / 2**bias_bits``."""

    data: int
    bias_bits: int

    @classmethod
    def from_int(cls, value: int, bias_bits: int) -> "FixedPoint":
        return cls(value << bias_bits, bias_bits)

    @classmethod
    def from_float(cls, value: float, bias_bits: int) -> "FixedPoint":
        return cls(int(round(value * (1 << bias_bits))), bias_bits)

    def to_float(self) -> float:
        return self.data / float(1 << self.bias_bits)

    def to_int(self) -> int:
        """Truncate toward zero (reference ``toInt``)."""
        d, b = self.data, self.bias_bits
        if d >= 0:
            return d >> b
        return -((-d) >> b)

    def round_to_int(self) -> int:
        """Round half away from zero (reference ``roundToInt``)."""
        d, b = self.data, self.bias_bits
        half = 1 << (b - 1)
        if d >= 0:
            return (d + half) >> b
        return -(((-d) + half) >> b)

    def is_integral(self) -> bool:
        return self.data & ((1 << self.bias_bits) - 1) == 0


def F2D14(raw: int) -> FixedPoint:
    """TrueType F2Dot14 (signed 2.14) from its raw 16-bit pattern."""
    if raw >= 0x8000:
        raw -= 0x10000
    return FixedPoint(raw, 14)


def F16D16(raw: int) -> FixedPoint:
    """TrueType Fixed (signed 16.16) from its raw 32-bit pattern."""
    if raw >= 0x80000000:
        raw -= 0x100000000
    return FixedPoint(raw, 16)


def div_trunc(a: int, b: int) -> int:
    """Integer division truncating toward zero (Zig ``@divTrunc``).

    Python's ``//`` floors; TrueType midpoint insertion in the reference
    truncates (``src/tools/geometry.zig:12-17``), which differs for
    negative sums.
    """
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q
