"""Khmer shaping (the OpenType Khmer model — the reference shapers'
dedicated engine, simpler than Indic: no reph, no base search).

Pipeline (hb-pinned by ``tests/test_khmer.py``):

1. split-vowel decomposition: U+17BE/17BF/17C0/17C4/17C5 decompose to
   ``U+17C1 + <self>`` (no Unicode decompositions — the Khmer-shaper
   convention), when the font maps U+17C1;
2. syllabification with the Khmer machine (consonant syllables,
   coeng-led broken clusters with dotted-circle insertion);
3. per-syllable reordering: the first ``Coeng + Ro`` pair moves to
   the syllable start (masked ``pref``; everything after it masked
   ``cfar``), pre-base vowels (U+17C1..17C3) move to the start; at
   most two coeng subscripts participate;
4. GSUB: ``pref``/``cfar`` mask-gated plus global
   ``blwf abvf pstf``, then the presentation features
   ``pres abvs blws psts`` — all matching per-syllable.

The masked lookup application is shared with the Indic engine
(:mod:`fontrx.font.indic`).
"""

from __future__ import annotations

import re

from fontrx.font.indic import IndicShaper, _Glyph
from fontrx.utils.log import get_logger

log = get_logger("Khmer")

_COENG = 0x17D2
_RA = 0x179A
_E = 0x17C1  # the split vowels' pre-base piece

#: split vowels decompose to (U+17C1, self) — a shaper convention,
#: not a Unicode decomposition
_SPLIT = frozenset({0x17BE, 0x17BF, 0x17C0, 0x17C4, 0x17C5})

_BASIC_FEATURES = (b"pref", b"blwf", b"abvf", b"pstf", b"cfar")
_PRES_FEATURES = (b"pres", b"abvs", b"blws", b"psts")


def khmer_category(cp: int) -> str:
    """The Khmer machine category letter of one codepoint."""
    if cp == _COENG:
        return "H"          # coeng
    if cp == _RA:
        return "r"
    if 0x1780 <= cp <= 0x17A2:
        return "C"
    if 0x17A3 <= cp <= 0x17B3:
        return "V"          # independent vowels
    if cp in (0x17B6,):
        return "S"          # post vowel (VPst)
    if 0x17B7 <= cp <= 0x17BA:
        return "A"          # above vowel (VAbv)
    if 0x17BB <= cp <= 0x17BD:
        return "B"          # below vowel (VBlw)
    if 0x17C1 <= cp <= 0x17C3:
        return "M"          # pre vowel (VPre)
    if cp in _SPLIT:
        return "S" if cp in (0x17BF, 0x17C0, 0x17C4, 0x17C5) else "A"
    if cp in (0x17C9, 0x17CA, 0x17CC):
        return "R"          # robatic / register shifters (consonant-
                            # attached, hb-pinned: merge before
                            # matras only)
    if cp in (0x17C6, 0x17CB, 0x17CD, 0x17CE, 0x17CF, 0x17D0,
              0x17D1, 0x17DD):
        return "X"          # xgroup signs
    if cp in (0x17C7, 0x17C8, 0x17D3):
        return "Y"          # ygroup signs (trailing-only)
    if cp == 0x200C:
        return "z"
    if cp == 0x200D:
        return "J"
    if cp == 0x25CC:
        return "P"          # placeholder/dotted circle base
    if 0x17E0 <= cp <= 0x17E9:
        return "P"
    return "O"


# -- the Khmer syllable machine ----------------------------------------
_j = "[Jz]"
# robatic/shifter signs attach per-consonant with hb-probe-pinned
# budgets (round 4, killing the 20k-sweep residual): the BASE takes up
# to TWO signs (joiner allowed before the first only — KA+ZWJ+17CC+
# 17C9 joins, KA+17CC+ZWJ+17C9 dc-splits), each SUBSCRIPT consonant at
# most ONE (KA+coeng+TA+17CC+17C9 dc-splits before the second), the
# tail's trailing coeng consonant NONE (KA+AA+coeng+TA+17C9 splits),
# and a dotted-circle carrier exactly one (17CC+17C9 is two dc
# clusters).  No sign attaches after a matra/xgroup/ygroup slot
# (KA+17C6+17C9 splits; KA+17C9+17C6 joins).
_cn = f"(?:[CrV](?:{_j}?RR?)?)"
_cns = f"(?:[CrV](?:{_j}?R)?)"
_xg = f"(?:{_j}*X)*"
_yg = "Y*"
# the vowel slots are SEPARATE (above and post may stack), with
# xgroup signs interleaved anywhere and ygroup signs trailing — all
# hb-pinned (KA+VAbv+VPst one cluster, Y+VAbv splits, ...)
# joiners may lead the ABOVE slot only (hb-pinned: KA+ZWNJ+VAbv is
# one cluster, KA+ZWNJ+VBlw/VPst/VPre split at the joiner)
_matra = f"(?:M?{_xg}B?{_xg}(?:{_j}?A)?{_xg}S?{_xg})"
_tail = f"(?:{_xg}{_matra}(?:H[CrV])?{_yg})"
# a syllable's subscript run may END on a bare coeng (hb-pinned:
# KA+COENG keeps one cluster, no dotted circle); a lone robatic is
# its own dotted-circle-carrying cluster
_PRODUCTIONS = (
    ("consonant", re.compile(f"(?:{_cn}|P)(?:H{_cns})*(?:H|{_tail})")),
    ("broken", re.compile(
        f"{_j}(?=[RHMBASXY])R?(?:H{_cns})*(?:H|{_tail})|"
        f"R?(?:H{_cns})*(?:H|{_tail})")),
)


def _syllabify(cats: str) -> list[tuple[int, int, str]]:
    out: list[tuple[int, int, str]] = []
    i, n = 0, len(cats)
    while i < n:
        best_len, best_kind = 0, "other"
        for kind, rx in _PRODUCTIONS:
            m = rx.match(cats, i)
            if m and m.end() - i > best_len:
                best_len = m.end() - i
                best_kind = "broken" if kind == "broken2" else kind
        if best_len == 0:
            out.append((i, i + 1, "other"))
            i += 1
        else:
            out.append((i, i + best_len, best_kind))
            i += best_len
    return out


class KhmerShaper:
    """Per-font Khmer shaping engine.  Borrows the masked GSUB
    application machinery from the Indic engine (identical lookup
    semantics: per-syllable matching, mask gating)."""

    ALL_TAGS = _BASIC_FEATURES + _PRES_FEATURES + (b"locl", b"ccmp")

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
            for t in (b"khmr",):
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
              script: bytes = b"khmr") -> list[int]:
        """Shape one logical run: substituted + reordered glyphs."""
        # split-vowel decomposition (when the font maps the e-piece)
        if any(cp in _SPLIT for cp in cps):
            e_gid = int(self.font.charmap.glyph_index(_E))
            if e_gid:
                nc: list[int] = []
                ng: list[int] = []
                for cp, gid in zip(cps, gids):
                    if cp in _SPLIT:
                        nc.append(_E)
                        ng.append(e_gid)
                    nc.append(cp)
                    ng.append(gid)
                cps, gids = nc, ng

        buf = [_Glyph(g, c, khmer_category(c), 0, 0)
               for c, g in zip(cps, gids)]
        cats = "".join(g.cat for g in buf)
        syllables = _syllabify(cats)

        # dotted-circle insertion for broken clusters
        dc_gid = int(self.font.charmap.glyph_index(0x25CC))
        if dc_gid and any(k == "broken" for _, _, k in syllables):
            nb: list[_Glyph] = []
            ns: list[tuple[int, int, str]] = []
            for s_, e_, kind in syllables:
                at = len(nb)
                if kind == "broken":
                    nb.append(_Glyph(dc_gid, 0x25CC, "P", 0, 0))
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
            self._apply_feature(buf, tag, tag not in (b"pref", b"cfar"),
                                None)
        for tag in _PRES_FEATURES:
            self._apply_feature(buf, tag, True, None)
        return [g.gid for g in buf]

    def _reorder(self, info: list[_Glyph], start: int,
                 end: int) -> None:
        """The Khmer per-syllable reorder: first Coeng+Ro to the
        front (pref/cfar masks), pre-base vowels to the front, at
        most two participating coengs — the reference-shaper loop
        verbatim in shape, hb-pinned."""
        num_coengs = 0
        i = start + 1
        while i < end:
            g = info[i]
            if (num_coengs <= 2 and i + 1 < end and g.cat == "H"):
                num_coengs += 1
                if info[i + 1].cat == "r":
                    info[i].mask = frozenset({b"pref"})
                    info[i + 1].mask = frozenset({b"pref"})
                    pair = info[i:i + 2]
                    del info[i:i + 2]
                    info[start:start] = pair
                    for j in range(i + 2, end):
                        info[j].mask = info[j].mask | {b"cfar"}
                    num_coengs = 2
            elif g.cat == "M":
                del info[i]
                info.insert(start, g)
            i += 1
