"""GDEF glyph definitions — glyph classes and mark filtering.

A capability extension: the reference has no OpenType layout at all
(each codepoint maps straight to one glyph, ``src/Appli.zig:318-341``).
GDEF is the side table GSUB/GPOS lookups consult to *skip* glyphs while
matching: the GlyphClassDef assigns every glyph one of four classes
(base / ligature / mark / component), the MarkAttachClassDef groups
marks for the ``markAttachmentType`` lookup-flag filter, and (GDEF
1.2+) MarkGlyphSets back the ``useMarkFilteringSet`` flag.

Only the pieces lookup matching needs are parsed; AttachList/LigCaret
(hinting and caret placement) are out of scope throughout fontrx.
"""

from __future__ import annotations

from dataclasses import dataclass

from fontrx.font.gpos import ClassDef, Coverage
from fontrx.utils.reader import BigEndianReader

# GlyphClassDef classes (OpenType GDEF)
CLASS_BASE = 1
CLASS_LIGATURE = 2
CLASS_MARK = 3
CLASS_COMPONENT = 4

# LookupFlag bits (shared by GSUB and GPOS LookupTables)
FLAG_RIGHT_TO_LEFT = 0x0001       # cursive attachment only; no-op here
FLAG_IGNORE_BASE = 0x0002
FLAG_IGNORE_LIGATURES = 0x0004
FLAG_IGNORE_MARKS = 0x0008
FLAG_USE_MARK_FILTERING_SET = 0x0010
FLAG_MARK_ATTACH_TYPE = 0xFF00    # high byte: mark-attachment class filter


@dataclass(frozen=True, slots=True)
class GdefTable:
    """Parsed GDEF: just the class/mark-set data lookup skipping needs."""

    glyph_classes: ClassDef | None
    mark_attach: ClassDef | None
    mark_sets: tuple[Coverage, ...]
    # GDEF v1.3 ItemVariationStore: the delta source for GPOS
    # VariationIndex device tables (variable kerning/placement)
    item_var_store: "object | None" = None

    @classmethod
    def parse(cls, r: BigEndianReader) -> "GdefTable":
        base = r.pos
        major, minor = r.unpack("HH")
        if major != 1:
            return cls(None, None, ())
        glyph_class_off, _attach_off, _lig_caret_off, mark_attach_off = (
            r.unpack("HHHH")
        )
        mark_sets_off = 0
        ivs_off = 0
        if minor >= 2:
            mark_sets_off = r.u16()
        if minor >= 3:
            ivs_off = r.u32()

        glyph_classes = None
        if glyph_class_off:
            glyph_classes = ClassDef.parse(
                BigEndianReader(r.data, base + glyph_class_off)
            )
        mark_attach = None
        if mark_attach_off:
            mark_attach = ClassDef.parse(
                BigEndianReader(r.data, base + mark_attach_off)
            )
        mark_sets: list[Coverage] = []
        if mark_sets_off:
            mr = BigEndianReader(r.data, base + mark_sets_off)
            ms_base = mr.pos
            fmt, n = mr.unpack("HH")
            if fmt == 1:
                offs = mr.u32_array(n)
                mark_sets = [
                    Coverage.parse(BigEndianReader(r.data, ms_base + int(o)))
                    for o in offs
                ]
        ivs = None
        if ivs_off:
            try:
                from fontrx.font.variations import ItemVariationStore

                ivs = ItemVariationStore.parse(r.data, base + ivs_off)
            except Exception:
                ivs = None   # malformed IVS degrades to static values
        return cls(glyph_classes, mark_attach, tuple(mark_sets), ivs)

    def glyph_class(self, gid: int) -> int:
        """GDEF class of a glyph (0 = unclassified)."""
        if self.glyph_classes is None:
            return 0
        return int(self.glyph_classes.class_of([gid])[0])

    def is_mark(self, gid: int) -> bool:
        return self.glyph_class(gid) == CLASS_MARK

    def skips(self, gid: int, flags: int, mark_filter_set: int | None) -> bool:
        """Whether a lookup with ``flags`` (and, when the
        ``useMarkFilteringSet`` bit is on, ``mark_filter_set``) ignores
        ``gid`` while matching.  Without a GlyphClassDef nothing is
        skipped — classes are unknowable, matching degrades to exact."""
        gc = self.glyph_class(gid)
        if gc == CLASS_BASE and flags & FLAG_IGNORE_BASE:
            return True
        if gc == CLASS_LIGATURE and flags & FLAG_IGNORE_LIGATURES:
            return True
        if gc == CLASS_MARK:
            if flags & FLAG_IGNORE_MARKS:
                return True
            if flags & FLAG_USE_MARK_FILTERING_SET:
                if mark_filter_set is None or not (
                    0 <= mark_filter_set < len(self.mark_sets)
                ):
                    return False
                cov = self.mark_sets[mark_filter_set]
                return int(cov.rank([gid])[0]) < 0
            attach = (flags & FLAG_MARK_ATTACH_TYPE) >> 8
            if attach and self.mark_attach is not None:
                return int(self.mark_attach.class_of([gid])[0]) != attach
        return False
