"""Thai / Lao shaping (the reference shapers' dedicated Thai model).

Two behaviors, both validated by exact HarfBuzz differentials
(``tests/test_thai.py``):

1. **SARA AM decomposition** (always, both scripts, even when the
   font maps the composed character): U+0E33 -> NIKHAHIT U+0E4D +
   SARA AA U+0E32 (Lao U+0EB3 -> U+0ECD + U+0EB2), and the nikhahit
   then moves backwards over any preceding tone marks
   (U+0E48..0E4B / U+0EC8..0ECB) so it renders under them.

2. **Legacy PUA shaping** (Thai only, and only for old-style fonts
   whose GSUB carries no ``thai`` script): above marks take
   left-shifted private-use variants after ascender consonants, tone
   marks drop when nothing sits between them and a plain consonant,
   below vowels lower after joined-descender consonants, and the two
   removable-descender consonants swap to descenderless forms before
   below vowels.  The class sets and variant tables are vendored
   hb-probe-exact (``_thai_data.py``); each substitution falls back
   Windows-PUA -> Mac-PUA -> unchanged by the font's actual coverage.

A capability extension beyond the reference renderer (1:1 codepoint
mapping, ``src/main.zig:53-58``).
"""

from __future__ import annotations

from fontrx.font._thai_data import THAI_AC, THAI_DC, THAI_PUA, THAI_RC

_SARA_AM = {0x0E33: (0x0E4D, 0x0E32), 0x0EB3: (0x0ECD, 0x0EB2)}
# the nikhahit floats back over EVERY above mark, not just tones
# (hb-pinned: KA+MAI-HAN+AM puts the nikhahit first)
_FLOAT_THAI = frozenset({0x0E31, *range(0x0E34, 0x0E38),
                         *range(0x0E47, 0x0E4F)})
_FLOAT_LAO = frozenset({0x0EB1, *range(0x0EB4, 0x0EB8), 0x0EBB,
                        *range(0x0EC8, 0x0ECE)})

# above-state marks: the SL-shiftable set plus YAMAKKAN (no
# preshaped variant, but it still tops the cluster state)
_ABOVE_V = frozenset(THAI_PUA["win"]["SL"]) | {0x0E4E}
_TONES = frozenset(THAI_PUA["win"]["SD"])       # tones + thanthakhat
_BELOW_V = frozenset(THAI_PUA["win"]["SD_BELOW"])


def preprocess_sara_am(cps: list[int]) -> list[int]:
    """Decompose SARA AM and float the nikhahit back over tone
    marks; identity when no SARA AM is present."""
    if not any(cp in _SARA_AM for cp in cps):
        return cps
    out: list[int] = []
    for cp in cps:
        parts = _SARA_AM.get(cp)
        if parts is None:
            out.append(cp)
            continue
        nik, aa = parts
        floats = _FLOAT_THAI if cp == 0x0E33 else _FLOAT_LAO
        at = len(out)
        while at > 0 and out[at - 1] in floats:
            at -= 1
        out.insert(at, nik)
        out.append(aa)
    return out


def is_thai_lao(cp: int) -> bool:
    return 0x0E00 <= cp <= 0x0EFF


def _has_thai_gsub(font) -> bool:
    """True when the font's GSUB ScriptList carries a ``thai``
    entry (new-style font: the PUA fallback must stay off)."""
    if b"GSUB" not in getattr(font, "tables", {}):
        return False
    try:
        from fontrx.utils.reader import BigEndianReader

        r = font._at(b"GSUB")
        base = r.pos
        r.skip(4)
        script_off = r.u16()
        sr = BigEndianReader(r.data, base + script_off)
        n = sr.u16()
        for _ in range(n):
            tag = sr.tag()
            sr.skip(2)
            if tag == b"thai":
                return True
    except Exception:
        return False
    return False


class ThaiShaper:
    """Per-font Thai/Lao preprocessing engine."""

    def __init__(self, font):
        self.font = font
        self.pua_active = not _has_thai_gsub(font)
        self._variant_cache: dict[tuple[str, int], int] = {}

    def _variant(self, action: str, cp: int) -> int:
        """PUA variant of ``cp`` under ``action``, by the font's
        coverage: Windows PUA first, then Mac, else unchanged."""
        key = (action, cp)
        hit = self._variant_cache.get(key)
        if hit is not None:
            return hit
        out = cp
        for kind in ("win", "mac"):
            cand = THAI_PUA[kind][action].get(cp)
            if cand and int(self.font.charmap.glyph_index(cand)):
                out = cand
                break
        self._variant_cache[key] = out
        return out

    def shape(self, cps: list[int], script: bytes) -> list[int]:
        """Return the transformed codepoint stream for one run (the
        caller re-resolves glyph ids)."""
        cps = preprocess_sara_am(cps)
        if script != b"thai" or not self.pua_active:
            return _canonical_reorder(cps, cps)
        # the above-plane state machine: a tone directly above the
        # consonant plane drops (down-left after ascenders), a tone
        # above an above-vowel left-shifts after ascenders only;
        # below vowels lower after joined descenders and strip the
        # removable descenders (all hb-probe-pinned transforms)
        out = list(cps)
        cons = 0
        cons_i = -1
        level = 0
        below = "none"
        for i, cp in enumerate(out):
            if cp in _TONES:
                # a tone on the consonant plane drops (down-left on
                # ascenders); on the first above level it left-shifts
                # on ascenders; beyond that it stays put
                if level == 1:
                    if cons in THAI_AC:
                        out[i] = self._variant("SL_TOP", cp)
                elif level == 0:
                    if cons in THAI_AC:
                        out[i] = self._variant("SDL", cp)
                    elif cons:
                        out[i] = self._variant("SD", cp)
                level += 1
            elif cp in _ABOVE_V:
                # only the FIRST above mark left-shifts; stacked ones
                # stay put (hb-pinned: PO+MAI-HAN+SARA-I shifts the
                # mai-han only)
                if level == 0 and cons in THAI_AC:
                    out[i] = self._variant("SL", cp)
                level += 1
            elif cp in _BELOW_V:
                # a below vowel sits normally only directly on a
                # fresh consonant: removable descenders strip, joined
                # descenders lower the vowel, and a below slot that's
                # already taken (second below vowel, or a non-
                # consonant base like the SARA AM's AA) lowers it too
                if below == "fresh":
                    if cons in THAI_RC:
                        out[cons_i] = self._variant("RD", cons)
                    elif cons in THAI_DC:
                        out[i] = self._variant("SD_BELOW", cp)
                else:
                    out[i] = self._variant("SD_BELOW", cp)
                below = "low"
            else:
                # only true consonants start a shapable cluster;
                # spacing vowels/digits/etc. reset the machine
                if 0x0E01 <= cp <= 0x0E2E:
                    cons, cons_i, below = cp, i, "fresh"
                else:
                    cons, below = 0, "none"
                level = 0
        # the canonical mark sort happens AFTER the PUA machine, by
        # the ORIGINAL characters' modified combining classes (the
        # preshaped variants inherit their source's class) — exactly
        # the reference-shaper pipeline order, hb-pinned on
        # KA+PHINTHU+SARA-U (machine first, then the swap)
        return _canonical_reorder(out, cps)


def _canonical_reorder(cps: list[int],
                       key_cps: list[int]) -> list[int]:
    """Canonical mark reordering by the MODIFIED combining classes
    (:mod:`fontrx.font.normalize`) of ``key_cps`` — e.g. Thai sara u
    sorts before the tone marks.  ``key_cps`` carries the
    pre-substitution characters so preshaped PUA variants keep their
    source's class."""
    from fontrx.font.normalize import modified_combining_class

    ccc = [modified_combining_class(cp) for cp in key_cps]
    if not any(c > 1 for c in ccc):
        return cps
    cps = list(cps)
    n = len(cps)
    changed = True
    while changed:
        changed = False
        for i in range(n - 1):
            if ccc[i] > ccc[i + 1] > 0:
                cps[i], cps[i + 1] = cps[i + 1], cps[i]
                ccc[i], ccc[i + 1] = ccc[i + 1], ccc[i]
                changed = True
    return cps
