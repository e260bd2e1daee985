"""GSUB standard-ligature substitution — a capability extension.

The reference does no shaping at all (each codepoint maps straight to
one glyph, ``src/Appli.zig:318-341``).  This module reads GSUB lookup
type 4 (LigatureSubst) reached through features tagged ``liga`` and
exposes a greedy longest-ish matcher over glyph streams: at each
position, the first matching ligature of the first glyph's ligature
set wins (OpenType set order encodes preference, so ``ffi`` is tried
before ``fi`` when the font orders it that way).

Shares the ``Coverage`` reader with :mod:`fontrx.font.gpos` — GSUB and
GPOS use the same ScriptList/FeatureList/LookupList framing.
Extension lookups (GSUB type 7) wrapping type 4 are followed.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from fontrx.font.gpos import Coverage
from fontrx.utils.reader import BigEndianReader


@dataclass(frozen=True, slots=True)
class Ligature:
    glyph: int                 # substituted glyph
    components: tuple[int, ...]  # required following glyphs (first excluded)


@dataclass(frozen=True, slots=True)
class LigatureTable:
    """All LigatureSubst subtables of ``liga``-tagged GSUB lookups."""

    # first glyph -> list of (components, lig_glyph) in preference order
    sets: dict

    @classmethod
    def parse(
        cls, r: BigEndianReader,
        tags: tuple[bytes, ...] = (b"liga", b"rlig"),
    ) -> "LigatureTable | None":
        """``tags``: feature tags to collect.  Defaults to standard
        (``liga``) plus required (``rlig``) ligatures — shaping always
        applies ``rlig`` when it applies ``liga``."""
        gsub_base = r.pos
        major, _minor = r.unpack("HH")
        if major != 1:
            return None
        _script_off, feature_off, lookup_off = r.unpack("HHH")

        fr = BigEndianReader(r.data, gsub_base + feature_off)
        f_base = fr.pos
        n_feat = fr.u16()
        lookup_indices: list[int] = []
        for _ in range(n_feat):
            tag = fr.tag()
            off = fr.u16()
            if tag in tags:
                tr = BigEndianReader(r.data, f_base + off)
                tr.skip(2)  # featureParamsOffset
                n_lk = tr.u16()
                lookup_indices.extend(tr.u16_array(n_lk).tolist())
        if not lookup_indices:
            return None

        lr = BigEndianReader(r.data, gsub_base + lookup_off)
        l_base = lr.pos
        n_lookups = lr.u16()
        lookup_offsets = lr.u16_array(n_lookups)

        sets: dict[int, list[Ligature]] = {}
        for li in sorted(set(lookup_indices)):
            if li >= n_lookups:
                continue
            tb = BigEndianReader(r.data, l_base + int(lookup_offsets[li]))
            t_base = tb.pos
            lookup_type, _flags, n_sub = tb.unpack("HHH")
            for so in tb.u16_array(n_sub):
                s_pos, s_type = t_base + int(so), lookup_type
                if s_type == 7:  # extension substitution
                    er = BigEndianReader(r.data, s_pos)
                    _fmt, ext_type = er.unpack("HH")
                    s_pos, s_type = s_pos + er.u32(), ext_type
                if s_type != 4:
                    continue
                cls._parse_ligsubst(BigEndianReader(r.data, s_pos), sets)
        return cls(sets) if sets else None

    @staticmethod
    def _parse_ligsubst(r: BigEndianReader, sets: dict) -> None:
        base = r.pos
        fmt, cov_off, n_sets = r.unpack("HHH")
        if fmt != 1:
            return
        set_offsets = r.u16_array(n_sets)
        coverage = Coverage.parse(BigEndianReader(r.data, base + cov_off))
        # first glyph per coverage index
        firsts: list[int] = []
        for s, e in zip(coverage.start, coverage.end):
            firsts.extend(range(int(s), int(e) + 1))
        order = np.argsort(np.concatenate([
            np.arange(cb, cb + (e - s + 1), dtype=np.int64)
            for s, e, cb in zip(coverage.start, coverage.end,
                                coverage.cov_base)
        ])) if len(coverage.start) else []
        firsts = [firsts[i] for i in order]
        for ci in range(min(n_sets, len(firsts))):
            sr = BigEndianReader(r.data, base + int(set_offsets[ci]))
            set_base = sr.pos
            n_ligs = sr.u16()
            lig_offsets = sr.u16_array(n_ligs)
            bucket = sets.setdefault(firsts[ci], [])
            for lo in lig_offsets:
                gr = BigEndianReader(r.data, set_base + int(lo))
                lig_glyph, comp_count = gr.unpack("HH")
                comps = tuple(
                    int(x) for x in gr.u16_array(max(comp_count - 1, 0))
                )
                bucket.append(Ligature(lig_glyph, comps))

    def apply(self, glyphs: list[int]) -> list[int]:
        """Substitute ligatures in a glyph-index stream (first matching
        ligature per set, in set order)."""
        out: list[int] = []
        i = 0
        n = len(glyphs)
        while i < n:
            g = glyphs[i]
            for lig in self.sets.get(g, ()):
                k = len(lig.components)
                if i + k < n and all(
                    glyphs[i + 1 + j] == c
                    for j, c in enumerate(lig.components)
                ):
                    out.append(lig.glyph)
                    i += 1 + k
                    break
            else:
                out.append(g)
                i += 1
        return out
