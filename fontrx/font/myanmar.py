"""Myanmar shaping (the OpenType ``mym2`` model — the reference
shapers' dedicated engine).

Pipeline (hb-pinned by ``tests/test_myanmar.py``):

1. syllabification with the Myanmar machine (kinzi prefix, stacked
   consonants via the invisible stacker U+1039, medial group in
   canonical ya-ra-wa-ha order, vowel groups, dot-below/asat tails);
2. per-syllable POSITION assignment — the reference shapers'
   "ugly loop that implements all of Myanmar reordering": the kinzi
   triple goes after-main, medial RA and pre-vowels go pre-base, the
   below-vowel opens the below slot, the anusvara before a below
   vowel sorts before-sub — followed by a stable sort;
3. GSUB, all global with per-syllable matching: the basic features
   ``rphf pref blwf pstf`` (the kinzi triple ligates after the sort
   put it post-base) then ``pres abvs blws psts``.

Shares the masked lookup application with the Indic engine.
"""

from __future__ import annotations

import re

from fontrx.font.indic import IndicShaper, _Glyph
from fontrx.utils.log import get_logger

log = get_logger("Myanmar")

_BASIC_FEATURES = (b"rphf", b"pref", b"blwf", b"pstf")
_PRES_FEATURES = (b"pres", b"abvs", b"blws", b"psts")

# positions (shared slot model with the Indic engine)
_PRE_M = 2
_PRE_C = 3
_BASE = 4
_AFTER_MAIN = 5
_BEFORE_SUB = 7
_BELOW = 8
_AFTER_SUB = 9


def myanmar_category(cp: int) -> str:
    """The Myanmar machine category letter of one codepoint."""
    if cp in (0x1004, 0x101B, 0x105A):
        return "r"          # kinzi-forming consonants
    if 0x1000 <= cp <= 0x1020 or cp == 0x103F or \
            0x105B <= cp <= 0x105D or cp in (0x1061, 0x1065, 0x1066):
        return "C"
    if 0x1021 <= cp <= 0x102A or cp in (0x103F,):
        return "V"          # independent vowels
    if cp in (0x1031, 0x1084):
        return "M"          # pre-base vowel (VPre)
    if cp in (0x102D, 0x102E, 0x1032, 0x1033, 0x1034, 0x1035,
              0x1071, 0x1072, 0x1073, 0x1074, 0x1085):
        return "A"          # above vowel (VAbv)
    if cp in (0x102F, 0x1030, 0x1058, 0x1059):
        return "B"          # below vowel (VBlw)
    if cp in (0x102B, 0x102C, 0x1056, 0x1057, 0x1062, 0x1063,
              0x1067, 0x1068, 0x1083):
        return "P"          # post vowel (VPst)
    if cp == 0x1036:
        return "a"          # anusvara
    if cp == 0x1037:
        return "D"          # dot below
    if cp == 0x103A:
        return "s"          # asat
    if cp == 0x1039:
        return "H"          # invisible stacker
    if cp == 0x103B:
        return "Y"          # medial ya
    if cp == 0x103C:
        return "R"          # medial ra (pre-base reordering)
    if cp == 0x103D:
        return "W"          # medial wa
    if cp == 0x103E:
        return "h"          # medial ha
    if cp in (0x1038, 0x1087, 0x1088, 0x1089, 0x108A, 0x108B,
              0x108C, 0x108D, 0x108F, 0x109A, 0x109B, 0x109C):
        return "S"          # syllable modifiers / tones
    if cp in (0x1064, 0x1069, 0x106A, 0x106B, 0x106C, 0x106D):
        return "p"          # pwo tones
    if 0x1040 <= cp <= 0x1049 or cp in (0x104E,):
        return "d"          # digits / placeholder-like
    if cp == 0x200C:
        return "z"
    if cp == 0x200D:
        return "J"
    if cp == 0x25CC or cp == 0x00A0:
        return "G"
    if 0xFE00 <= cp <= 0xFE0F:
        return "v"          # variation selector
    return "O"


# -- the Myanmar syllable machine ---------------------------------------
_k = "(?:rsH)"
_cn = "(?:[CrV]v?)"
_j = "[Jz]"
# medial sequences split at joiners everywhere; a SINGLE leading
# joiner may open a mark-led broken cluster (the dedicated arm below)
_med = "(?:Y?s?R?(?:(?:Wh?|h)s?)?)"
_main_v = "(?:(?:Mv?)*A*B*a*(?:Ds?)?)"
# the asat SLOT sits between the post vowel and its
# above-marks (hb-pinned: P+As+VAbv merges, P+VAbv+As
# splits)
_post_v = "(?:Ph?s*A*a*(?:Ds?)?)"
_pt = "(?:pa*D?s?)"
_tail = f"(?:s*{_med}{_main_v}{_post_v}*{_pt}*S*)"
_stack = f"(?:H{_cn})"
_PRODUCTIONS = (
    ("consonant", re.compile(
        f"{_k}?(?:{_cn}|[dG])v?{_stack}*(?:H|{_tail})")),
    # a single leading joiner rides a mark-led broken cluster
    ("broken", re.compile(
        f"{_j}(?=[YRWhsMABPaDSpH]){_k}?v?{_stack}*(?:H|{_tail})|"
        f"{_k}?v?{_stack}*(?:H|{_tail})")),
)


def _syllabify(cats: str) -> list[tuple[int, int, str]]:
    out: list[tuple[int, int, str]] = []
    i, n = 0, len(cats)
    while i < n:
        best_len, best_kind = 0, "other"
        for kind, rx in _PRODUCTIONS:
            m = rx.match(cats, i)
            if m and m.end() - i > best_len:
                best_len, best_kind = m.end() - i, kind
        if best_len == 0:
            out.append((i, i + 1, "other"))
            i += 1
        else:
            out.append((i, i + best_len, best_kind))
            i += best_len
    return out


class MyanmarShaper:
    """Per-font Myanmar shaping engine."""

    ALL_TAGS = (_BASIC_FEATURES + _PRES_FEATURES
                + (b"locl", b"ccmp"))

    _apply_feature = IndicShaper._apply_feature
    _match_forward = IndicShaper._match_forward
    _apply_at = IndicShaper._apply_at
    _apply_context = IndicShaper._apply_context

    def __init__(self, font):
        self.font = font
        self.shaper = font.shaper(self.ALL_TAGS)
        self._lookup_cache: dict = {}
        self.script = None
        if self.shaper is not None:
            for t in (b"mym2", b"mymr"):
                if t in getattr(self.shaper, "scripts", {}):
                    self.script = t
                    break

    @property
    def available(self) -> bool:
        if self.shaper is None:
            return False
        return any(self._feature_lookups(t, None)
                   for t in _BASIC_FEATURES)

    def _feature_lookups(self, tag: bytes, st=None) -> list[int]:
        s = self.shaper
        if s is None:
            return []
        hit = self._lookup_cache.get(tag)
        if hit is not None:
            return hit
        if self.script is not None:
            out = s.lookup_indices_for((tag,), self.script)
        else:
            out = sorted(s.features.get(tag, ()))
        self._lookup_cache[tag] = out
        return out

    def shape(self, cps: list[int], gids: list[int],
              script: bytes = b"mym2") -> list[int]:
        """Shape one logical run: substituted + reordered glyphs."""
        from fontrx.font.indic import _canonical_reorder

        cps, gids = _canonical_reorder(cps, gids)
        buf = [_Glyph(g, c, myanmar_category(c), 0, 0)
               for c, g in zip(cps, gids)]
        cats = "".join(g.cat for g in buf)
        syllables = _syllabify(cats)

        dc_gid = int(self.font.charmap.glyph_index(0x25CC))
        if dc_gid and any(k == "broken" for _, _, k in syllables):
            nb: list[_Glyph] = []
            ns: list[tuple[int, int, str]] = []
            for s_, e_, kind in syllables:
                at = len(nb)
                if kind == "broken":
                    nb.append(_Glyph(dc_gid, 0x25CC, "G", 0, 0))
                nb.extend(buf[s_:e_])
                ns.append((at, len(nb),
                           "consonant" if kind == "broken" else kind))
            buf, syllables = nb, ns

        for si, (s_, e_, kind) in enumerate(syllables):
            for k in range(s_, e_):
                buf[k].syl = si
            if kind == "consonant":
                self._reorder(buf, s_, e_)

        for tag in _BASIC_FEATURES:
            self._apply_feature(buf, tag, True, None)
        for tag in _PRES_FEATURES:
            self._apply_feature(buf, tag, True, None)
        return [g.gid for g in buf]

    def _reorder(self, info: list[_Glyph], start: int,
                 end: int) -> None:
        """Position assignment + stable sort — the reference
        shapers' Myanmar loop, hb-pinned."""
        base = end
        has_kinzi = False
        limit = start
        if (start + 3 <= end and info[start].cat == "r"
                and info[start + 1].cat == "s"
                and info[start + 2].cat == "H"):
            limit += 3
            base = start
            has_kinzi = True
        if not has_kinzi:
            base = limit
        for i in range(limit, end):
            if info[i].cat in ("C", "r", "V", "d", "G"):
                base = i
                break

        i = start
        while i < start + (3 if has_kinzi else 0):
            info[i].pos = _AFTER_MAIN
            i += 1
        while i < base:
            info[i].pos = _PRE_C
            i += 1
        if i < end:
            info[i].pos = _BASE
            i += 1
        pos = _AFTER_MAIN
        while i < end:
            g = info[i]
            if g.cat == "R":            # medial ra: pre-base
                g.pos = _PRE_C
            elif g.cat == "M":          # pre vowel
                g.pos = _PRE_M
            elif g.cat == "v":          # variation selector rides
                g.pos = info[i - 1].pos
            elif pos == _AFTER_MAIN and g.cat == "B":
                pos = _BELOW
                g.pos = pos
            elif pos == _BELOW and g.cat == "a":
                g.pos = _BEFORE_SUB
            elif pos == _BELOW and g.cat == "B":
                g.pos = pos
            elif pos == _BELOW:
                pos = _AFTER_SUB
                g.pos = pos
            else:
                g.pos = pos
            i += 1

        info[start:end] = sorted(info[start:end],
                                 key=lambda g: g.pos)
