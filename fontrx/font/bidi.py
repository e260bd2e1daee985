"""Bidi-lite: mixed-direction run itemization (a strong-types subset
of UAX#9).

A capability extension.  Full UAX#9 needs the Unicode bidi-class
table plus embedding/isolate machinery; this module implements the
subset that covers ordinary mixed LTR/RTL text (the overwhelmingly
common case): characters are classified STRONG-RTL by script range
(Hebrew, Arabic + presentation forms), NEUTRAL (spaces and common
punctuation), or STRONG-LTR (everything else); neutrals join the
surrounding run when both neighbors agree and fall back to the
paragraph direction otherwise (UAX#9 rules N1/N2 for the
no-embeddings case).  Explicit directional marks U+200E/U+200F act as
invisible strong characters.

Out of scope (documented): embedding/override/isolate controls
(U+202A..U+2069), bracket pair resolution (N0), and the weak-type
rules for numbers (digits classify LTR, matching their appearance in
LTR context; in RTL context UAX#9 would keep digit runs LTR too,
which this subset also produces).
"""

from __future__ import annotations

from fontrx.font.arabic import is_arabic

_RTL_RANGES = (
    (0x0590, 0x05FF),   # Hebrew
    (0xFB1D, 0xFB4F),   # Hebrew presentation forms
    (0xFB50, 0xFDFF),   # Arabic presentation forms A
    (0xFE70, 0xFEFF),   # Arabic presentation forms B
)

_NEUTRAL_RANGES = (
    (0x0009, 0x000D),
    (0x0020, 0x002F),
    (0x003A, 0x0040),
    (0x005B, 0x0060),
    (0x007B, 0x007E),
    (0x00A0, 0x00BF),
    (0x2000, 0x200D),   # spaces + ZWJ/ZWNJ (200E/200F are strong)
    (0x2010, 0x2027),
)


def char_direction(cp: int) -> str:
    """'R' / 'L' / 'N' for one codepoint (module-doc subset)."""
    if cp == 0x200F:
        return "R"
    if cp == 0x200E:
        return "L"
    if is_arabic(cp) or any(lo <= cp <= hi for lo, hi in _RTL_RANGES):
        return "R"
    if any(lo <= cp <= hi for lo, hi in _NEUTRAL_RANGES):
        return "N"
    return "L"


def split_runs(
    cps: list[int], base_rtl: bool
) -> list[tuple[int, int, bool]]:
    """Itemize one line into direction runs: ``[(start, end, rtl)]``
    covering ``range(len(cps))`` contiguously.

    Neutral resolution (UAX#9 N1/N2, no embeddings): a neutral span
    between two strong characters of the SAME direction takes it;
    otherwise the paragraph direction.  Leading/trailing neutrals take
    the paragraph direction.
    """
    n = len(cps)
    if n == 0:
        return []
    cls = [char_direction(cp) for cp in cps]
    base = "R" if base_rtl else "L"

    # resolve neutrals
    resolved = list(cls)
    i = 0
    while i < n:
        if resolved[i] != "N":
            i += 1
            continue
        j = i
        while j < n and resolved[j] == "N":
            j += 1
        before = resolved[i - 1] if i > 0 else base
        after = resolved[j] if j < n else base
        fill = before if before == after else base
        for k in range(i, j):
            resolved[k] = fill
        i = j

    runs: list[tuple[int, int, bool]] = []
    start = 0
    for i in range(1, n + 1):
        if i == n or resolved[i] != resolved[start]:
            runs.append((start, i, resolved[start] == "R"))
            start = i
    return runs


# UAX#9 rule L4: characters with the Bidi_Mirrored property render as
# their mirrored pair inside RTL runs.  The full table is
# BidiMirroring.txt; this covers the common pairs (ASCII brackets,
# guillemets, and the frequent mathematical angles).
_MIRROR_PAIRS = {
    0x0028: 0x0029, 0x0029: 0x0028,   # ( )
    0x005B: 0x005D, 0x005D: 0x005B,   # [ ]
    0x007B: 0x007D, 0x007D: 0x007B,   # { }
    0x003C: 0x003E, 0x003E: 0x003C,   # < >
    0x00AB: 0x00BB, 0x00BB: 0x00AB,   # « »
    0x2039: 0x203A, 0x203A: 0x2039,   # ‹ ›
    0x2045: 0x2046, 0x2046: 0x2045,
    0x2329: 0x232A, 0x232A: 0x2329,
    0x27E8: 0x27E9, 0x27E9: 0x27E8,
}


def mirror_cp(cp: int) -> int:
    """The L4 mirrored counterpart of ``cp`` (itself when unpaired)."""
    return _MIRROR_PAIRS.get(cp, cp)
