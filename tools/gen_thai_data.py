"""Probe the legacy Thai PUA shaping tables from the system HarfBuzz
and vendor them into fontrx/font/_thai_data.py.

Old-style Thai fonts (no OpenType 'thai' GSUB script) carry preshaped
mark variants in the Windows private-use area (U+F700..F71A) or the
Mac one (U+F885..F899): above marks shift left after ascender
consonants, tones drop when nothing sits between them and the
consonant, below marks lower after descender consonants, and two
descender consonants swap to descenderless forms before below marks.
This tool recovers the classes and transform tables EXACTLY by
differential probing: shape every consonant+mark / consonant+vowel+
tone sequence against in-memory probe fonts that map the block plus
one PUA set, and read the substituted codepoints back.

Usage: PYTHONPATH=. python tools/gen_thai_data.py
"""

import io
import sys

sys.path.insert(0, ".")

from fontTools.fontBuilder import FontBuilder  # noqa: E402
from fontTools.pens.ttGlyphPen import TTGlyphPen  # noqa: E402

from fontrx.native import hb  # noqa: E402

THAI = list(range(0x0E01, 0x0E5C))
WIN_PUA = list(range(0xF700, 0xF71B))
MAC_PUA = list(range(0xF885, 0xF89A))
CONS = list(range(0x0E01, 0x0E2F))
ABOVE = [0x0E31, 0x0E34, 0x0E35, 0x0E36, 0x0E37, 0x0E47, 0x0E4D]
TONES = [0x0E48, 0x0E49, 0x0E4A, 0x0E4B, 0x0E4C]
BELOW = [0x0E38, 0x0E39, 0x0E3A]


def build(pua):
    cps = THAI + pua
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
        pen.closePath()
        glyphs[n] = pen.glyph()
    fb.setupGlyf(glyphs)
    fb.setupHorizontalMetrics({n: (500, 50) for n in names})
    fb.setupHorizontalHeader(ascent=800, descent=-200)
    fb.setupNameTable({"familyName": "T", "styleName": "R"})
    fb.setupOS2()
    fb.setupPost()
    buf = io.BytesIO()
    fb.save(buf)
    return buf.getvalue(), cps


def shaper(pua):
    data, cps = build(pua)
    rev = {i + 1: cp for i, cp in enumerate(cps)}

    def s(text):
        return [rev.get(g.gid, 0) for g in hb.shape(data, text)]

    return s


out = {"win": {}, "mac": {}}
classes = {}
for kind, pua in (("win", WIN_PUA), ("mac", MAC_PUA)):
    s = shaper(pua)
    sl = {}       # above mark shifted left (after ascender)
    sdl = {}      # tone shifted down-left (straight after ascender)
    sl_top = {}   # tone shifted left at top (after above vowel, asc)
    sd = {}       # tone dropped (straight after plain consonant)
    sd_below = {}  # below vowel lowered (after joined descender)
    rd = {}       # descenderless consonant forms
    ac, rc, dc = [], [], []
    for c in CONS:
        a = s(chr(c) + chr(0x0E34))
        b = s(chr(c) + chr(0x0E38))
        if a[1] != 0x0E34:
            ac.append(c)
        if b[0] != c:
            rc.append(c)
            rd[c] = b[0]
        elif b[1] != 0x0E38:
            dc.append(c)
    if not ac:
        ac = classes.get("AC", [])
    if not dc:
        dc = classes.get("DC", [])
    a0 = ac[0]
    for m in ABOVE:
        got = s(chr(a0) + chr(m))
        if got[1] != m:
            sl[m] = got[1]
    for t in TONES:
        got = s(chr(a0) + chr(t))
        if got[1] != t:
            sdl[t] = got[1]
        got = s(chr(a0) + chr(0x0E34) + chr(t))
        if got[2] != t:
            sl_top[t] = got[2]
        got = s(chr(0x0E01) + chr(t))
        if got[1] != t:
            sd[t] = got[1]
    if dc:
        d0 = dc[0]
        for v in BELOW:
            got = s(chr(d0) + chr(v))
            if got[1] != v:
                sd_below[v] = got[1]
    out[kind] = dict(SL=sl, SDL=sdl, SL_TOP=sl_top, SD=sd,
                     SD_BELOW=sd_below, RD=rd)
    if kind == "win":
        classes = dict(AC=ac, RC=rc, DC=dc)

lines = [
    '"""Legacy Thai PUA shaping data, GENERATED from the system',
    "HarfBuzz by tools/gen_thai_data.py differential probing (the",
    'preshaped-variant conventions old Thai fonts carry)."""',
    "",
    f"THAI_AC = frozenset({sorted(classes['AC'])})",
    f"THAI_RC = frozenset({sorted(classes['RC'])})",
    f"THAI_DC = frozenset({sorted(classes['DC'])})",
    "",
    "# action -> {codepoint: preshaped variant}, per PUA convention",
    "THAI_PUA = {",
]
for kind in ("win", "mac"):
    lines.append(f'    "{kind}": {{')
    for action, table in out[kind].items():
        body = ", ".join(f"0x{k:04X}: 0x{v:04X}"
                         for k, v in sorted(table.items()))
        lines.append(f'        "{action}": {{{body}}},')
    lines.append("    },")
lines.append("}")

with open("fontrx/font/_thai_data.py", "w") as f:
    f.write("\n".join(lines) + "\n")
print("classes:", {k: [hex(c) for c in v] for k, v in classes.items()})
print("wrote fontrx/font/_thai_data.py")
