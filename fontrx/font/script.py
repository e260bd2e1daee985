"""Codepoint -> OpenType script tag classification and run
itemization, for script/language-system-aware shaping.

The interpreter's UCD (``unicodedata``) does not expose the Script
property, so classification is by Unicode block range, transcribed
from the block allocations (Blocks.txt) for every script with an
OpenType shaping relevance; this is exact for those blocks — blocks
are single-script apart from Common/Inherited characters, which the
itemizer resolves by context exactly as a Scripts.txt-based itemizer
would.

OpenType script tags follow the OT script-tag registry (e.g. Unicode
"Latin" -> ``latn``; note ``DFLT`` handling lives in the shaper's
fallback chain, ``shape.py::langsys_features``).

Capability extension: the reference maps codepoints 1:1 with no text
processing (``/root/reference/src/main.zig:53-58``).
"""

from __future__ import annotations

# (start, end, OT script tag); ordered, non-overlapping.  Blocks whose
# script has no OT tag worth distinguishing fall through to None
# (-> Common handling).
_RANGES: tuple[tuple[int, int, bytes], ...] = (
    (0x0041, 0x005A, b"latn"), (0x0061, 0x007A, b"latn"),
    (0x00AA, 0x00AA, b"latn"), (0x00BA, 0x00BA, b"latn"),
    (0x00C0, 0x024F, b"latn"),   # Latin-1 letters + Extended-A/B
    (0x0250, 0x02AF, b"latn"),   # IPA extensions
    # Coptic letters live inside the Greek block (ICU-differential
    # finding): split the range around U+03E2..03EF
    (0x0370, 0x03E1, b"grek"), (0x03E2, 0x03EF, b"copt"),
    (0x03F0, 0x03FF, b"grek"), (0x1F00, 0x1FFF, b"grek"),
    (0x0400, 0x052F, b"cyrl"), (0x1C80, 0x1C8F, b"cyrl"),
    (0x2DE0, 0x2DFF, b"cyrl"), (0xA640, 0xA69F, b"cyrl"),
    (0x0530, 0x058F, b"armn"),
    (0x0590, 0x05FF, b"hebr"), (0xFB1D, 0xFB4F, b"hebr"),
    (0x0600, 0x06FF, b"arab"), (0x0750, 0x077F, b"arab"),
    (0x08A0, 0x08FF, b"arab"), (0xFB50, 0xFDFF, b"arab"),
    (0xFE70, 0xFEFF, b"arab"),
    (0x0700, 0x074F, b"syrc"),
    (0x0780, 0x07BF, b"thaa"),
    (0x07C0, 0x07FF, b"nko "),
    (0x0900, 0x097F, b"deva"), (0xA8E0, 0xA8FF, b"deva"),
    (0x0980, 0x09FF, b"beng"),
    (0x0A00, 0x0A7F, b"guru"),
    (0x0A80, 0x0AFF, b"gujr"),
    (0x0B00, 0x0B7F, b"orya"),
    (0x0B80, 0x0BFF, b"taml"),
    (0x0C00, 0x0C7F, b"telu"),
    (0x0C80, 0x0CFF, b"knda"),
    (0x0D00, 0x0D7F, b"mlym"),
    (0x0D80, 0x0DFF, b"sinh"),
    (0x0E00, 0x0E7F, b"thai"),
    (0x0E80, 0x0EFF, b"lao "),
    (0x0F00, 0x0FFF, b"tibt"),
    (0x1000, 0x109F, b"mymr"),
    (0x10A0, 0x10FF, b"geor"),
    (0x1100, 0x11FF, b"hang"), (0xA960, 0xA97F, b"hang"),
    (0xAC00, 0xD7FF, b"hang"),
    (0x1200, 0x139F, b"ethi"),
    (0x13A0, 0x13FF, b"cher"),
    (0x1400, 0x167F, b"cans"),
    (0x1680, 0x169F, b"ogam"),
    (0x16A0, 0x16FF, b"runr"),
    (0x1780, 0x17FF, b"khmr"),
    (0x1800, 0x18AF, b"mong"),
    # USE-routed scripts (fontrx.font.use.USE_SCRIPTS)
    (0x1900, 0x194F, b"limb"),
    (0x1A00, 0x1A1F, b"bugi"),
    (0x1A20, 0x1AAF, b"lana"),
    (0x1B00, 0x1B7F, b"bali"),
    (0x1B80, 0x1BBF, b"sund"), (0x1CC0, 0x1CCF, b"sund"),
    (0x1BC0, 0x1BFF, b"batk"),
    (0x1C00, 0x1C4F, b"lepc"),
    (0xA880, 0xA8DF, b"saur"),
    (0xA980, 0xA9DF, b"java"),
    (0xAA00, 0xAA5F, b"cham"),
    (0x1E00, 0x1EFF, b"latn"),   # Latin Extended Additional
    (0x2C60, 0x2C7F, b"latn"), (0xA720, 0xA7FF, b"latn"),
    (0x3040, 0x309F, b"kana"),   # hiragana (OT: kana covers both)
    (0x30A0, 0x30FF, b"kana"),
    (0x31F0, 0x31FF, b"kana"), (0xFF66, 0xFF9F, b"kana"),
    (0x3100, 0x312F, b"bopo"),
    (0x3400, 0x4DBF, b"hani"), (0x4E00, 0x9FFF, b"hani"),
    (0xF900, 0xFAFF, b"hani"), (0x20000, 0x3FFFF, b"hani"),
    (0x10800, 0x1083F, b"cprt"),  # Cypriot (was misfiled as xpeo)
    (0x103A0, 0x103DF, b"xpeo"),
    (0x10840, 0x1085F, b"armi"),
)


def script_of(cp: int) -> bytes | None:
    """OT script tag of one codepoint, ``None`` for Common/Inherited/
    unclassified (resolved by run context in :func:`itemize`)."""
    for lo, hi, tag in _RANGES:
        if lo <= cp <= hi:
            return tag
    return None


def itemize(cps: list[int]) -> list[tuple[int, int, bytes | None]]:
    """Split a codepoint stream into maximal same-script runs
    ``[(start, end, tag)]``.  Common/Inherited characters extend the
    preceding script run; a leading Common stretch joins the first
    real script (or stays ``None`` for an all-Common stream)."""
    n = len(cps)
    if n == 0:
        return []
    tags: list[bytes | None] = [script_of(cp) for cp in cps]
    # forward fill, then backward fill the leading Nones
    for i in range(1, n):
        if tags[i] is None:
            tags[i] = tags[i - 1]
    for i in range(n - 2, -1, -1):
        if tags[i] is None:
            tags[i] = tags[i + 1]
    runs: list[tuple[int, int, bytes | None]] = []
    start = 0
    for i in range(1, n + 1):
        if i == n or tags[i] != tags[start]:
            runs.append((start, i, tags[start]))
            start = i
    return runs
