"""Font fallback stacks: ordered font lists with per-character glyph
resolution.

A capability extension (the reference loads exactly one font,
``src/Appli.zig:101-115``): characters missing from the primary font
(glyph index 0) resolve through the fallbacks in order, the way
CSS ``font-family`` lists or platform font stacks behave.  The stack
duck-types the ``Font`` surface :func:`fontrx.scene.layout.layout_text`
consumes, so ``layout_text(FontStack([sans, symbols]), ...)`` just
works — including word wrap, multi-line, and the composite/direct
render paths.

Coordinate model: the **primary** font defines the em (units_per_em,
ascent/descent/line gap).  Fallback glyphs from fonts with a different
``units_per_em`` are rescaled into the primary em at load time
(outline points and advances, rounded to integer font units — the same
quantization any one font's own grid imposes).

Glyph identity: a stack glyph id is ``(font_idx << 16) | gid`` (gids
are u16 in TrueType, so the packing is lossless).  Synthetic ids from
fallback fonts never collide with the primary's OpenType tables:
coverage/classdef/ligature lookups hold u16 values, so shaping applied
by the primary simply skips fallback glyphs.  The one table whose
packed-key lookup could alias (the flattened kern table packs
``left<<16|right`` into 32 bits) is wrapped to zero out any pair
touching a fallback glyph.

Deliberate limits: shaping (GSUB/GPOS) comes from the primary font
only — cross-font ligatures/kerning do not exist in OpenType anyway;
vertical metrics are disabled (``vhea``/``vmtx`` indices are per-font).
"""

from __future__ import annotations

import numpy as np

from fontrx.font.font import Font
from fontrx.font.glyph import Box, Contour, Glyph
from fontrx.utils.log import get_logger

log = get_logger("Stack")

GID_SHIFT = 16
_GID_MASK = (1 << GID_SHIFT) - 1


def _scale_glyph(g: Glyph, factor: float) -> Glyph:
    """Rescale a glyph's outline into another em (rounded to integer
    font units, matching the quantization of a native glyph)."""
    if factor == 1.0:
        return g
    contours = tuple(
        Contour(np.round(c.points * factor).astype(np.int32))
        for c in g.contours
    )
    box = Box(
        int(np.floor(g.box.x_min * factor)),
        int(np.floor(g.box.y_min * factor)),
        int(np.ceil(g.box.x_max * factor)),
        int(np.ceil(g.box.y_max * factor)),
    )
    return Glyph(box, contours)


class _StackCharmap:
    """Charmap view: first font that maps the codepoint wins."""

    def __init__(self, stack: "FontStack"):
        self._stack = stack

    def glyph_index(self, cp: int) -> int:
        for fi, font in enumerate(self._stack.fonts):
            gid = int(font.charmap.glyph_index(cp))
            if gid != 0:
                return (fi << GID_SHIFT) | gid
        return 0  # primary .notdef

    def char_for_glyph(self, sgid: int):
        fi, gid = sgid >> GID_SHIFT, sgid & _GID_MASK
        if fi >= len(self._stack.fonts):
            return None
        return self._stack.fonts[fi].charmap.char_for_glyph(gid)


class _StackWidths:
    """``advance_widths[sgid]`` with fallback advances rescaled into
    the primary em."""

    def __init__(self, stack: "FontStack"):
        self._stack = stack

    def __getitem__(self, sgid: int) -> int:
        fi, gid = int(sgid) >> GID_SHIFT, int(sgid) & _GID_MASK
        fonts = self._stack.fonts
        if fi >= len(fonts):
            return 0
        w = int(fonts[fi].advance_widths[gid])
        return int(round(w * self._stack._factors[fi]))


class _SafeKern:
    """Kern wrapper returning 0 for any pair touching a fallback
    glyph: the flattened table packs ``left<<16|right`` into u32, which
    synthetic ids would alias onto unrelated primary pairs."""

    def __init__(self, inner):
        self._inner = inner

    def lookup(self, left, right):
        l = np.asarray(left)
        r = np.asarray(right)
        prim = (l < (1 << GID_SHIFT)) & (r < (1 << GID_SHIFT))
        safe_l = np.where(prim, l, 0)
        safe_r = np.where(prim, r, 0)
        return np.where(prim, self._inner.lookup(safe_l, safe_r), 0)


class _StackRunShaper:
    """A complex-script shaping engine over STACK glyph ids: a script
    run's nonzero gids name the owning font (``fi << GID_SHIFT``);
    shape in the owner's own gid space, then remap back into stack
    space.  Mixed-owner runs pass through unshaped — each font's
    tables cannot see another font's glyphs, the same natural-skip
    rule as the stack's primary-font GSUB surface."""

    def __init__(self, stack: "FontStack", attr: str,
                 method: str = "shape"):
        self._stack = stack
        self._attr = attr
        self._method = method

    def _owner(self, gids) -> int | None:
        fis = {int(g) >> GID_SHIFT for g in gids if g}
        return fis.pop() if len(fis) == 1 else None

    def _run(self, cps, gids, **kw):
        fi = self._owner(gids)
        if fi is None or fi >= len(self._stack.fonts):
            return list(gids)
        sh = getattr(self._stack.fonts[fi], self._attr, None)
        if sh is None:
            return list(gids)
        out = getattr(sh, self._method)(
            cps, [int(g) & _GID_MASK for g in gids], **kw)
        return [(fi << GID_SHIFT) | int(g) if g else 0 for g in out]

    def shape(self, cps, gids, **kw):
        return self._run(cps, gids, **kw)

    def apply(self, cps, gids, **kw):
        return self._run(cps, gids, **kw)

    def connection_sides(self) -> dict[int, str]:
        # kashida junction classes: merge every member font's map,
        # earlier fonts (stack charmap precedence) winning
        out: dict[int, str] = {}
        for f in reversed(self._stack.fonts):
            sh = getattr(f, self._attr, None)
            if sh is not None:
                out.update(sh.connection_sides())
        return out


class _StackGdef:
    """GDEF glyph-class view over stack glyph ids: each glyph asks the
    font that owns it; owners without a GDEF get hb's synthesized
    class from the Unicode general category (Mn/Me -> mark)."""

    def __init__(self, stack: "FontStack"):
        self._stack = stack

    def is_mark(self, sgid: int) -> bool:
        import unicodedata

        fi = int(sgid) >> GID_SHIFT
        gid = int(sgid) & _GID_MASK
        if fi >= len(self._stack.fonts):
            return False
        g = self._stack.fonts[fi].gdef
        if g is not None:
            return g.is_mark(gid)
        c = self._stack.charmap.char_for_glyph(int(sgid))
        return c is not None and unicodedata.category(
            chr(int(c))) in ("Mn", "Me")


class _StackThaiShaper:
    """Thai/Lao shaping is codepoint-level: resolve the run's owner
    through the stack charmap and shape with that font's engine (its
    PUA outputs re-resolve to the same owner downstream)."""

    def __init__(self, stack: "FontStack"):
        self._stack = stack

    def shape(self, cps, script: bytes = b"thai"):
        for c in cps:
            sg = int(self._stack.charmap.glyph_index(c))
            if sg:
                fi = sg >> GID_SHIFT
                return self._stack.fonts[fi].thai_shaper.shape(
                    list(cps), script=script)
        return list(cps)


class FontStack:
    """An ordered font list exposing the layout-facing ``Font``
    surface.  ``fonts[0]`` is the primary (metrics + shaping)."""

    def __init__(self, fonts: list[Font]):
        if not fonts:
            raise ValueError("FontStack needs at least one font")
        if len(fonts) > (1 << 8):
            raise ValueError("FontStack supports at most 256 fonts")
        self.fonts = list(fonts)
        self.primary = self.fonts[0]
        self.info = self.primary.info
        upem = self.info.units_per_em
        self._factors = [
            1.0 if f.info.units_per_em == upem
            else upem / f.info.units_per_em
            for f in self.fonts
        ]
        self.charmap = _StackCharmap(self)
        self.advance_widths = _StackWidths(self)

    @classmethod
    def open(cls, paths: list[str]) -> "FontStack":
        return cls([Font.open(p) for p in paths])

    # -- glyph access ------------------------------------------------------

    def load_glyph(self, sgid: int) -> Glyph:
        fi, gid = sgid >> GID_SHIFT, sgid & _GID_MASK
        if fi >= len(self.fonts):
            raise IndexError(f"stack glyph id {sgid} out of range")
        return _scale_glyph(
            self.fonts[fi].load_glyph(gid), self._factors[fi]
        )

    def glyph_index(self, char: int | str) -> int:
        if isinstance(char, str):
            char = ord(char)
        return self.charmap.glyph_index(char)

    def glyph_index_variant(self, char: int | str, selector: int) -> int:
        if isinstance(char, str):
            char = ord(char)
        for fi, font in enumerate(self.fonts):
            gid = int(font.glyph_index_variant(char, selector))
            if gid != 0:
                return (fi << GID_SHIFT) | gid
        return 0

    # -- layout-facing table surface (primary font; synthetic fallback
    # ids never match its u16 coverage/ligature tables, so shaping
    # skips them naturally) ------------------------------------------------

    # -- color surface (per-owner resolution: each stack glyph's
    # COLR/CPAL/bitmap lookups go to the font that owns it, with
    # layer gids remapped back into stack space and bitmap strikes
    # scaled through the owner's em factor) ---------------------------

    @property
    def colr(self):
        return self.primary.colr

    @property
    def cpal(self):
        return self.primary.cpal

    def _owner(self, sgid: int):
        fi, gid = sgid >> GID_SHIFT, sgid & _GID_MASK
        if fi >= len(self.fonts):
            return None, 0, 1.0
        return self.fonts[fi], gid, self._factors[fi]

    def color_paint_tree(self, sgid: int, palette: int = 0,
                         foreground=(0, 0, 0, 255)):
        font, gid, _f = self._owner(sgid)
        if font is None:
            return None
        tree = font.color_paint_tree(gid, palette, foreground)
        if tree is None:
            return None
        fi = sgid >> GID_SHIFT

        def remap(node):
            if node[0] == "glyph":
                return ("glyph", (fi << GID_SHIFT) | node[1],
                        node[2], node[3])
            if node[0] == "outline":
                # OT-SVG leaves carry the Glyph object directly —
                # nothing to remap
                return node
            if node[0] == "layers":
                return ("layers", [remap(k) for k in node[1]])
            if node[0] == "alpha":
                return ("alpha", node[1], remap(node[2]))
            if node[0] == "mask":
                return ("mask", remap(node[1]), remap(node[2]))
            if node[0] == "filter":
                return ("filter", node[1], node[2], remap(node[3]))
            return ("composite", node[1], remap(node[2]),
                    remap(node[3]))

        return remap(tree)

    def color_layers(self, sgid: int, palette: int = 0,
                     foreground=(0, 0, 0, 255)):
        font, gid, _f = self._owner(sgid)
        if font is None:
            return None
        layers = font.color_layers(gid, palette, foreground)
        if layers is None:
            return None
        fi = sgid >> GID_SHIFT
        return [((fi << GID_SHIFT) | lg, c) for lg, c in layers]

    def color_bitmap(self, sgid: int, ppem: float):
        font, gid, f = self._owner(sgid)
        if font is None:
            return None
        # ppem is in primary-em pixels; the owner's strike is chosen
        # for the equivalent size in ITS em (factor rescales outlines,
        # and bitmap strikes are already absolute-pixel art)
        return font.color_bitmap(gid, ppem)

    def load_glyph_safe(self, sgid: int) -> Glyph:
        fi, gid = sgid >> GID_SHIFT, sgid & _GID_MASK
        if fi >= len(self.fonts):
            fi, gid = 0, 0
        return _scale_glyph(
            self.fonts[fi].load_glyph_safe(gid), self._factors[fi]
        )

    def shaper(self, tags):
        return self.primary.shaper(tags)

    def positioner(self, tags):
        return self.primary.positioner(tags)

    @property
    def ligatures(self):
        return self.primary.ligatures

    @property
    def kerning(self):
        k = self.primary.kerning
        return _SafeKern(k) if k is not None else None

    @property
    def mark_positioning(self):
        return self.primary.mark_positioning

    @property
    def mark_to_mark(self):
        return self.primary.mark_to_mark

    @property
    def vertical_metrics(self):
        # vhea/vmtx indices are per-font; vertical stacks would need
        # per-font metric resolution — out of scope, degrade to the
        # one-em fallback path
        return None

    # -- complex-script shaping (per-run owner resolution: the run's
    # stack gids name the font whose tables shape it; see
    # _StackRunShaper) -------------------------------------------------

    def _any_shaper(self, attr: str) -> bool:
        return any(
            getattr(f, attr, None) is not None for f in self.fonts
        )

    @property
    def arabic_shaper(self):
        if not self._any_shaper("arabic_shaper"):
            return None
        return _StackRunShaper(self, "arabic_shaper", method="apply")

    @property
    def indic_shaper(self):
        if not self._any_shaper("indic_shaper"):
            return None
        return _StackRunShaper(self, "indic_shaper")

    @property
    def khmer_shaper(self):
        if not self._any_shaper("khmer_shaper"):
            return None
        return _StackRunShaper(self, "khmer_shaper")

    @property
    def myanmar_shaper(self):
        if not self._any_shaper("myanmar_shaper"):
            return None
        return _StackRunShaper(self, "myanmar_shaper")

    @property
    def use_shaper(self):
        if not self._any_shaper("use_shaper"):
            return None
        return _StackRunShaper(self, "use_shaper")

    @property
    def hangul_shaper(self):
        return _StackRunShaper(self, "hangul_shaper")

    @property
    def thai_shaper(self):
        return _StackThaiShaper(self)

    @property
    def gdef(self):
        return _StackGdef(self)
