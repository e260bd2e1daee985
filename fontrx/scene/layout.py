"""Text layout: codepoints -> per-instance glyph placements.

Semantics of the reference's ``addChar`` pipeline (``Appli.zig:318-351``):
glyphs dedup by codepoint (cost is O(unique glyphs), not O(text)), each
instance records a pen-position transform, and the pen advances by the
glyph's ``advance_width`` in font units.  Extended with multi-line
layout using hhea metrics (ascent/descent/line gap), which the reference
TODO-lists as "user text input" (``README.md:73``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from fontrx.font.font import Font
from fontrx.pack.segments import PackedBatch, pack_glyphs
from fontrx.scene.transform import Transform


@dataclass(frozen=True, slots=True)
class Instance:
    """One placed glyph: index into the layout's unique-glyph batch +
    pen offset in font units."""

    glyph_slot: int
    x: float
    y: float

    def local_transform(self) -> Transform:
        return Transform(offset=(self.x, self.y))


@dataclass(slots=True)
class TextLayout:
    """A laid-out text run over a deduplicated glyph batch."""

    batch: PackedBatch
    slot_chars: list[int]  # codepoint per unique-glyph slot
    instances: list[Instance]
    width: float  # pen extent in font units
    height: float

    def instance_arrays(self) -> tuple[np.ndarray, np.ndarray]:
        """(slots int32 [N], offsets float32 [N, 2]) for batched compositing."""
        slots = np.array([i.glyph_slot for i in self.instances], np.int32)
        offs = np.array([[i.x, i.y] for i in self.instances], np.float32)
        return slots, offs.reshape(-1, 2)


def layout_text(
    font: Font,
    text: str,
    pad_batch_to: int | None = None,
    kern: bool = False,
) -> TextLayout:
    """Lay out ``text`` (supports ``\\n``) at the em scale: glyph slots
    dedup by codepoint (``Appli.zig:319`` getOrPut) and instances carry
    pen offsets (``Appli.zig:343-351``).

    ``kern=True`` applies format-0 pair kerning — an extension over the
    reference, whose pen only uses advance widths; off by default so
    default layout matches the reference exactly."""
    # dedup pass
    slot_of: dict[int, int] = {}
    glyphs = []
    widths = []
    for ch in text:
        if ch == "\n":
            continue
        code = ord(ch)
        if code not in slot_of:
            idx = font.charmap.glyph_index(code)
            slot_of[code] = len(glyphs)
            glyphs.append(font.load_glyph(idx))
            widths.append(int(font.advance_widths[idx]))

    line_height = font.info.ascent - font.info.descent + font.info.line_gap

    kern_table = font.kerning if kern else None
    glyph_ids = {c: int(font.charmap.glyph_index(c)) for c in slot_of}

    instances: list[Instance] = []
    pen_x = 0.0
    pen_y = 0.0
    max_x = 0.0
    prev_gid: int | None = None
    for ch in text:
        if ch == "\n":
            pen_x = 0.0
            pen_y -= line_height
            prev_gid = None
            continue
        code = ord(ch)
        slot = slot_of[code]
        gid = glyph_ids[code]
        if kern_table is not None and prev_gid is not None:
            pen_x += float(kern_table.lookup(prev_gid, gid))
        instances.append(Instance(slot, pen_x, pen_y))
        pen_x += widths[slot]
        max_x = max(max_x, pen_x)
        prev_gid = gid

    batch = pack_glyphs(glyphs, widths, pad_batch_to=pad_batch_to)
    n_lines = text.count("\n") + 1
    return TextLayout(
        batch=batch,
        slot_chars=list(slot_of.keys()),
        instances=instances,
        width=max_x,
        height=n_lines * line_height,
    )
