"""Bidi public helpers, backed by the full UAX#9 implementation
(:mod:`fontrx.font.uax9` — X/W/N/I/L rule set, UCD 15.0 classes,
BidiBrackets/BidiMirroring-derived tables).

Round 2 shipped a strong-types subset here ("bidi-lite"); round 3
replaced the engine while keeping this module's helper surface:

- :func:`char_direction` — legacy tri-state ('L'/'R'/'N') classifier;
- :func:`split_runs` — line itemization into direction runs (now the
  parity grouping of resolved UAX#9 levels);
- :func:`mirror_cp` — L4 mirrored counterpart (full BidiMirroring
  table, 300 entries, vs the 9 hand-picked pairs of round 2).

The reference has no text handling (``src/main.zig:53-58`` maps
codepoints 1:1); this is a capability extension.
"""

from __future__ import annotations

from fontrx.font.uax9 import (  # noqa: F401  (re-exports)
    BidiLine,
    bidi_class,
    mirror_cp,
    paragraph_level,
    resolve,
)

_NEUTRALISH = ("WS", "ON", "S", "B", "CS", "ES", "ET")


def char_direction(cp: int) -> str:
    """Legacy tri-state direction: 'R' for strong RTL (R/AL), 'N' for
    neutrals and separators/terminators, 'L' otherwise (digits render
    LTR, matching their appearance in LTR context)."""
    c = bidi_class(cp)
    if c in ("R", "AL"):
        return "R"
    if c in _NEUTRALISH:
        return "N"
    return "L"


def split_runs(
    cps: list[int], base_rtl: bool
) -> list[tuple[int, int, bool]]:
    """Itemize one line into direction runs ``[(start, end, rtl)]``
    covering ``range(len(cps))`` contiguously: full UAX#9 resolution,
    then maximal spans of equal level parity (the two-level view;
    :func:`fontrx.font.uax9.resolve` exposes the exact levels)."""
    n = len(cps)
    if n == 0:
        return []
    levels = resolve(list(cps), base_rtl).levels
    runs: list[tuple[int, int, bool]] = []
    start = 0
    for i in range(1, n + 1):
        if i == n or (levels[i] % 2) != (levels[start] % 2):
            runs.append((start, i, levels[start] % 2 == 1))
            start = i
    return runs
