"""Regenerate the Indic vowel-constraint table in
fontrx/font/_indic_data.py by probing the system HarfBuzz
(all ten Indic shaping-model blocks, Devanagari..Sinhala).

Reference shapers insert a dotted circle between an independent vowel
and a following dependent sign when the pair would be visually
indistinguishable from another character (the Unicode "defective
combinations" — USE/Indic tailored constraints).  The authoritative
list lives in hb's generated vowel-constraints code; this tool
recovers it exactly by differential probing: shape every
(independent vowel, Devanagari sign) pair with and without
HB_BUFFER_FLAG_DO_NOT_INSERT_DOTTED_CIRCLE against an in-memory
probe font that maps the whole block — pairs whose outputs differ
are the constrained ones.

Dev-time tool (needs fontTools + libharfbuzz); appends/refreshes the
INDIC_VOWEL_CONSTRAINTS table in the vendored data module.
"""

import ctypes
import io
import sys

sys.path.insert(0, ".")

from fontTools.fontBuilder import FontBuilder  # noqa: E402
from fontTools.pens.ttGlyphPen import TTGlyphPen  # noqa: E402

from fontrx.native import hb as hbmod  # noqa: E402

BLOCKS = [(s, s + 0x80) for s in range(0x0900, 0x0E00, 0x80)]


def build_probe_font(block: tuple[int, int]) -> bytes:
    cps = list(range(*block)) + [0x25CC, 0x200C, 0x200D]
    fb = FontBuilder(1000, isTTF=True)
    names = [".notdef"] + [f"u{cp:04X}" for cp in cps]
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({cp: f"u{cp:04X}" for cp in cps})
    glyphs = {}
    for n in names:
        pen = TTGlyphPen(glyphSet={})
        pen.moveTo((50, 0))
        pen.lineTo((450, 0))
        pen.lineTo((450, 600))
        pen.lineTo((50, 600))
        pen.closePath()
        glyphs[n] = pen.glyph()
    fb.setupGlyf(glyphs)
    fb.setupHorizontalMetrics({n: (500, 50) for n in names})
    fb.setupHorizontalHeader(ascent=800, descent=-200)
    fb.setupNameTable({"familyName": "Probe", "styleName": "R"})
    fb.setupOS2()
    fb.setupPost()
    buf = io.BytesIO()
    fb.save(buf)
    return buf.getvalue()


# shape with explicit buffer flags (the module binding doesn't expose
# flags; replicate its call sequence with hb_buffer_set_flags)
def shape_flags(data: bytes, text: str, flags: int) -> list[int]:
    hb = hbmod._lib()
    hb.hb_buffer_set_flags.argtypes = [ctypes.c_void_p, ctypes.c_uint]
    blob = hb.hb_blob_create(data, len(data), 1, None, None)
    face = hb.hb_face_create(blob, 0)
    font = hb.hb_font_create(face)
    buf = hb.hb_buffer_create()
    try:
        hb.hb_buffer_set_flags(buf, flags)
        hb.hb_buffer_add_utf8(buf, text.encode(), -1, 0, -1)
        hb.hb_buffer_guess_segment_properties(buf)
        hb.hb_shape(font, buf, None, 0)
        n = ctypes.c_uint()
        infos = hb.hb_buffer_get_glyph_infos(buf, ctypes.byref(n))
        return [int(infos[i].codepoint) for i in range(n.value)]
    finally:
        hb.hb_buffer_destroy(buf)
        hb.hb_font_destroy(font)
        hb.hb_face_destroy(face)
        hb.hb_blob_destroy(blob)


DO_NOT_INSERT = 0x10  # HB_BUFFER_FLAG_DO_NOT_INSERT_DOTTED_CIRCLE

import ctypes as _c  # noqa: E402

from fontrx.native.icu import symbol  # noqa: E402

_get = symbol("u_getIntPropertyValue")
_get.restype = _c.c_int32
_get.argtypes = [_c.c_int32, _c.c_int]
UCHAR_INDIC_SYLLABIC_CATEGORY = 0x1017
U_INSC_VOWEL_INDEPENDENT = 35

U_INSC_VOWEL_DEPENDENT = 34

table: dict[int, list[int]] = {}
for block in BLOCKS:
    data = build_probe_font(block)
    vowels = [cp for cp in range(*block)
              if _get(cp, UCHAR_INDIC_SYLLABIC_CATEGORY)
              == U_INSC_VOWEL_INDEPENDENT]
    for v in vowels:
        for second in range(*block):
            # only dependent vowels are constraint targets: anything
            # that cannot CONTINUE a vowel cluster (repha, another
            # independent vowel, ...) shows the same flag-differential
            # from its own broken-cluster dotted circle, which is not
            # a defective combination
            if (_get(second, UCHAR_INDIC_SYLLABIC_CATEGORY)
                    != U_INSC_VOWEL_DEPENDENT):
                continue
            t = chr(v) + chr(second)
            if shape_flags(data, t, 0) != shape_flags(data, t,
                                                      DO_NOT_INSERT):
                table.setdefault(v, []).append(second)

lines = [
    "",
    "# Independent-vowel + following-character pairs where reference",
    "# shapers insert a dotted circle (visually-deceptive 'defective",
    "# combinations'), all ten Indic blocks; recovered EXACTLY from",
    "# the system HarfBuzz by tools/gen_vowel_constraints.py",
    "# differential probing.",
    "INDIC_VOWEL_CONSTRAINTS = {",
]
for v in sorted(table):
    seconds = ", ".join(f"0x{s:04X}" for s in sorted(table[v]))
    lines.append(f"    0x{v:04X}: frozenset({{{seconds}}}),")
lines.append("}")

path = "fontrx/font/_indic_data.py"
src = open(path).read()
marker = "\n\n# Independent-vowel"
if marker in src:
    src = src[: src.index(marker)]
open(path, "w").write(src.rstrip("\n") + "\n" + "\n".join(lines) + "\n")
print(f"wrote {sum(len(v) for v in table.values())} constrained pairs "
      f"over {len(table)} vowels")
