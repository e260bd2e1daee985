"""Hangul shaping (the reference shapers' dedicated engine).

Behavior (hb-pinned by ``tests/test_hangul.py``):

- conjoining jamo COMPOSE into precomposed syllables the font maps
  (``L+V -> LV``, then ``LV+T -> LVT``, incrementally — a following T
  extends an already-precomposed LV syllable too);
- precomposed syllables the font does NOT map DECOMPOSE to their
  jamo when the font maps those;
- the Middle-Korean tone marks U+302E/302F move to the START of
  their syllable (a lone tone mark gets a dotted-circle carrier
  after it);
- leftover jamo runs get the ``ljmo``/``vjmo``/``tjmo`` features.

A capability extension beyond the reference renderer
(``src/main.zig:53-58``).
"""

from __future__ import annotations

_L_BASE, _V_BASE, _T_BASE = 0x1100, 0x1161, 0x11A7
_S_BASE = 0xAC00
_L_COUNT, _V_COUNT, _T_COUNT = 19, 21, 28
_S_COUNT = _L_COUNT * _V_COUNT * _T_COUNT


def _is_l(cp):
    return 0x1100 <= cp <= 0x115F or 0xA960 <= cp <= 0xA97C


def _is_v(cp):
    return 0x1160 <= cp <= 0x11A7 or 0xD7B0 <= cp <= 0xD7C6


def _is_t(cp):
    return 0x11A8 <= cp <= 0x11FF or 0xD7CB <= cp <= 0xD7FB


def _is_s(cp):
    return _S_BASE <= cp < _S_BASE + _S_COUNT


def is_hangul(cp: int) -> bool:
    return (_is_l(cp) or _is_v(cp) or _is_t(cp) or _is_s(cp)
            or cp in (0x302E, 0x302F))


class HangulShaper:
    """Per-font Hangul preprocessing engine (always available)."""

    def __init__(self, font):
        self.font = font

    def _has(self, cp: int) -> bool:
        return bool(int(self.font.charmap.glyph_index(cp)))

    def shape_cps(self, cps: list[int]) -> list[int]:
        """Return the composed/decomposed codepoint stream (the
        caller re-resolves glyph ids and applies jmo features)."""
        out: list[int] = []
        syl_start = 0  # index in out of the current syllable
        composed = None  # (index, L, V) when WE composed out[index]
        sealed = False   # a tone mark closed the current syllable
        arrival_decomp = False  # last emission decomposed on arrival
        for cp in cps:
            if cp in (0x302E, 0x302F):
                sealed = True
                # tone mark: to the start of its syllable; a lone one
                # gets a dotted-circle carrier after it.  An UNMAPPED
                # tone only moves when the syllable is one
                # precomposed glyph — after a decomposed jamo run it
                # stays put with a carrier (hb-pinned)
                if syl_start == len(out):
                    out.append(cp)
                    out.append(0x25CC)
                else:
                    out.insert(syl_start, cp)
                syl_start = len(out)
                continue
            was_sealed, sealed = sealed, False
            if (_is_v(cp) and not was_sealed and out
                    and _is_l(out[-1])):
                lv = self._compose_lv(out[-1], cp)
                if lv is not None and self._has(lv):
                    syl_start = len(out) - 1
                    composed = (len(out) - 1, out[-1], cp)
                    out[-1] = lv
                    continue
                syl_start = len(out) - 1
                out.append(cp)
                continue
            if (_is_t(cp) and not was_sealed and out
                    and _is_s(out[-1])
                    and (out[-1] - _S_BASE) % _T_COUNT == 0):
                lvt = out[-1] + (cp - _T_BASE)
                arrival_decomp = False
                if self._has(lvt):
                    out[-1] = lvt
                    composed = None
                    continue
                # failed extension: the LV decomposes (original or
                # composed alike) so the run stays all-jamo
                parts = self._decompose(out[-1])
                if parts is not None:
                    out[-1:] = parts
                composed = None
                out.append(cp)
                continue
            if (_is_t(cp) and not was_sealed and len(out) >= 2
                    and _is_v(out[-1]) and _is_l(out[-2])):
                # L+V stayed decomposed (LV unmapped); try the full
                # LVT composition directly
                arrived = arrival_decomp
                arrival_decomp = False
                lv = self._compose_lv(out[-2], out[-1])
                if lv is not None:
                    lvt = lv + (cp - _T_BASE)
                    if self._has(lvt):
                        del out[-2:]
                        syl_start = len(out)
                        out.append(lvt)
                        continue
                out.append(cp)
                if arrived:
                    # a T after an arrival-decomposed syllable closes
                    # it against tone attachment (hb-pinned; a
                    # compose-backtrack keeps it open)
                    syl_start = len(out)
                continue
            arrival_decomp = False
            if _is_s(cp) and not self._has(cp):
                parts = self._decompose(cp)
                if parts is not None:
                    syl_start = len(out)
                    out.extend(parts)
                    arrival_decomp = True
                    continue
            composed = None
            out.append(cp)
            # only a real syllable carries a following tone mark:
            # a precomposed syllable here, or an L..V(..T) run /
            # decomposition handled above (hb-pinned: lone jamo and
            # L+T non-syllables give the tone its own carrier)
            syl_start = len(out) - 1 if _is_s(cp) else len(out)
        return out

    @staticmethod
    def _compose_lv(l_cp: int, v_cp: int) -> int | None:
        li = l_cp - _L_BASE
        vi = v_cp - _V_BASE
        if 0 <= li < _L_COUNT and 0 <= vi < _V_COUNT:
            return _S_BASE + (li * _V_COUNT + vi) * _T_COUNT
        return None

    def _decompose(self, s: int) -> list[int] | None:
        idx = s - _S_BASE
        l_cp = _L_BASE + idx // (_V_COUNT * _T_COUNT)
        v_cp = _V_BASE + (idx % (_V_COUNT * _T_COUNT)) // _T_COUNT
        t = idx % _T_COUNT
        parts = [l_cp, v_cp] + ([_T_BASE + t] if t else [])
        if all(self._has(p) for p in parts):
            return parts
        return None

    def shape(self, cps: list[int], gids: list[int],
              script: bytes = b"hang") -> list[int]:
        """Shape one logical run: composed stream + jmo features."""
        ncps = self.shape_cps(cps)
        out = [int(self.font.charmap.glyph_index(c)) for c in ncps]
        sh = self.font.shaper((b"ljmo", b"vjmo", b"tjmo"))
        if sh is not None:
            out = sh.apply(out, script=b"hang") \
                if getattr(sh, "scripts", None) else sh.apply(out)
        return out
