"""Regenerate the committed test fixtures (requires fontTools).

- vartest.ttf       variable TTF, wght axis, IUP-exercising gvar
- vartest2.ttf      + avar axis map + a composite glyph
- vartest3.ttf      + HVAR (advances vary 400->720)
- vartest4.ttf      + MVAR (hhea ascent/descent vary)
- vartest_cff2.otf  CFF2 variable font (blend charstrings)
- cidtest.otf       CID-keyed CFF converted from pygame's PyGameMono

Run: python tests/data/make_fixtures.py
"""

import io
import os

import numpy as np  # noqa: F401  (environment sanity)
from fontTools import cffLib
from fontTools.designspaceLib import (
    AxisDescriptor,
    DesignSpaceDocument,
    SourceDescriptor,
)
from fontTools.fontBuilder import FontBuilder
from fontTools.pens.t2CharStringPen import T2CharStringPen
from fontTools.pens.ttGlyphPen import TTGlyphPen
from fontTools.ttLib import TTFont
from fontTools.varLib import build

HERE = os.path.dirname(os.path.abspath(__file__))
PYGAME_MONO = (
    "/opt/venv/lib/python3.12/site-packages/pygame/tests/fixtures/fonts/"
    "PyGameMono.otf"
)


def _vf(doc_axes, masters, out):
    doc = DesignSpaceDocument()
    for ax_args in doc_axes:
        ax = AxisDescriptor()
        (ax.minimum, ax.default, ax.maximum, ax.name, ax.tag,
         ax.map) = ax_args
        doc.addAxis(ax)
    for i, (loc, font) in enumerate(masters):
        p = f"/tmp/_fixture_master_{i}.ttf"
        font.save(p)
        s = SourceDescriptor()
        s.path = p
        s.location = loc
        doc.addSource(s)
    vf, _, _ = build(doc)
    vf.save(os.path.join(HERE, out))
    print("wrote", out)


def make_vartest():
    def master(w):
        fb = FontBuilder(1000, isTTF=True)
        order = [".notdef", "A", "B", "O"]
        fb.setupGlyphOrder(order)
        fb.setupCharacterMap({ord("A"): "A", ord("B"): "B", ord("O"): "O"})
        glyphs = {}
        pen = TTGlyphPen(glyphSet={})
        glyphs[".notdef"] = pen.glyph()
        pen = TTGlyphPen(glyphSet={})
        pen.moveTo((100, 0)); pen.lineTo((100 + w, 0))
        pen.lineTo((300 + w, 700)); pen.lineTo((300, 700)); pen.closePath()
        glyphs["A"] = pen.glyph()
        pen = TTGlyphPen(glyphSet={})
        pen.moveTo((80, 0)); pen.lineTo((80, 600))
        pen.qCurveTo((300 + w, 600), (300 + w, 300))
        pen.qCurveTo((300 + w, 0), (80, 0)); pen.closePath()
        glyphs["B"] = pen.glyph()
        pen = TTGlyphPen(glyphSet={})
        pen.moveTo((100, 300)); pen.qCurveTo((100, 650), (300, 650))
        pen.qCurveTo((500, 650), (500, 300)); pen.qCurveTo((500, -50), (300, -50))
        pen.qCurveTo((100, -50), (100, 300)); pen.closePath()
        i = w // 4
        pen.moveTo((180 + i, 300)); pen.qCurveTo((180 + i, 550 - i), (300, 550 - i))
        pen.qCurveTo((420 - i, 550 - i), (420 - i, 300))
        pen.qCurveTo((420 - i, 50 + i), (300, 50 + i))
        pen.qCurveTo((180 + i, 50 + i), (180 + i, 300)); pen.closePath()
        glyphs["O"] = pen.glyph()
        fb.setupGlyf(glyphs)
        fb.setupHorizontalMetrics(
            {n: (600, getattr(fb.font["glyf"][n], "xMin", 0)) for n in order}
        )
        fb.setupHorizontalHeader(ascent=800, descent=-200)
        fb.setupNameTable({"familyName": "VarTest", "styleName": "Regular"})
        fb.setupOS2(); fb.setupPost()
        return fb.font

    _vf([(100, 100, 900, "Weight", "wght", None)],
        [({"Weight": 100}, master(40)), ({"Weight": 900}, master(200))],
        "vartest.ttf")


def make_vartest2():
    def master(w, acc_dy):
        fb = FontBuilder(1000, isTTF=True)
        order = [".notdef", "A", "acute", "Aacute"]
        fb.setupGlyphOrder(order)
        fb.setupCharacterMap(
            {ord("A"): "A", 0xB4: "acute", 0xC1: "Aacute"}
        )
        glyphs = {}
        pen = TTGlyphPen(glyphSet={}); glyphs[".notdef"] = pen.glyph()
        pen = TTGlyphPen(glyphSet={})
        pen.moveTo((100, 0)); pen.lineTo((100 + w, 0))
        pen.lineTo((300 + w, 700)); pen.lineTo((300, 700)); pen.closePath()
        glyphs["A"] = pen.glyph()
        pen = TTGlyphPen(glyphSet={})
        pen.moveTo((0, 0)); pen.lineTo((80, 120)); pen.lineTo((40, 130))
        pen.closePath()
        glyphs["acute"] = pen.glyph()
        pen = TTGlyphPen(glyphSet={"A": glyphs["A"], "acute": glyphs["acute"]})
        pen.addComponent("A", (1, 0, 0, 1, 0, 0))
        pen.addComponent("acute", (1, 0, 0, 1, 200, 720 + acc_dy))
        glyphs["Aacute"] = pen.glyph()
        fb.setupGlyf(glyphs)
        fb.setupHorizontalMetrics(
            {n: (600, getattr(fb.font["glyf"][n], "xMin", 0)) for n in order}
        )
        fb.setupHorizontalHeader(ascent=900, descent=-200)
        fb.setupNameTable({"familyName": "VarTest2", "styleName": "Regular"})
        fb.setupOS2(); fb.setupPost()
        return fb.font

    _vf([(100, 100, 900, "Weight", "wght",
          [(100, 100), (400, 700), (900, 900)])],
        [({"Weight": 100}, master(40, 0)), ({"Weight": 900}, master(200, 120))],
        "vartest2.ttf")


def make_vartest3():
    def master(w, adv):
        fb = FontBuilder(1000, isTTF=True)
        order = [".notdef", "A", "B"]
        fb.setupGlyphOrder(order)
        fb.setupCharacterMap({ord("A"): "A", ord("B"): "B"})
        glyphs = {}
        pen = TTGlyphPen(glyphSet={}); glyphs[".notdef"] = pen.glyph()
        pen = TTGlyphPen(glyphSet={})
        pen.moveTo((100, 0)); pen.lineTo((100 + w, 0))
        pen.lineTo((100 + w, 700)); pen.lineTo((100, 700)); pen.closePath()
        glyphs["A"] = pen.glyph()
        pen = TTGlyphPen(glyphSet={})
        pen.moveTo((50, 0)); pen.lineTo((50 + w, 0)); pen.lineTo((50, 500))
        pen.closePath()
        glyphs["B"] = pen.glyph()
        fb.setupGlyf(glyphs)
        fb.setupHorizontalMetrics(
            {".notdef": (500, 0), "A": (adv, 100), "B": (adv - 60, 50)}
        )
        fb.setupHorizontalHeader(ascent=800, descent=-200)
        fb.setupNameTable({"familyName": "VarTest3", "styleName": "Regular"})
        fb.setupOS2(); fb.setupPost()
        return fb.font

    _vf([(100, 100, 900, "Weight", "wght", None)],
        [({"Weight": 100}, master(60, 400)), ({"Weight": 900}, master(240, 720))],
        "vartest3.ttf")


def make_vartest4():
    def master(w, asc, dsc):
        fb = FontBuilder(1000, isTTF=True)
        order = [".notdef", "A"]
        fb.setupGlyphOrder(order)
        fb.setupCharacterMap({ord("A"): "A"})
        glyphs = {}
        pen = TTGlyphPen(glyphSet={}); glyphs[".notdef"] = pen.glyph()
        pen = TTGlyphPen(glyphSet={})
        pen.moveTo((100, 0)); pen.lineTo((100 + w, 0))
        pen.lineTo((100 + w, 700)); pen.lineTo((100, 700)); pen.closePath()
        glyphs["A"] = pen.glyph()
        fb.setupGlyf(glyphs)
        fb.setupHorizontalMetrics({".notdef": (500, 0), "A": (500, 100)})
        fb.setupHorizontalHeader(ascent=asc, descent=dsc)
        fb.setupNameTable({"familyName": "VarTest4", "styleName": "Regular"})
        fb.setupOS2(sTypoAscender=asc, sTypoDescender=dsc)
        fb.setupPost()
        return fb.font

    _vf([(100, 100, 900, "Weight", "wght", None)],
        [({"Weight": 100}, master(60, 760, -240)),
         ({"Weight": 900}, master(240, 920, -320))],
        "vartest4.ttf")


def make_vartest_cff2():
    def master(w):
        fb = FontBuilder(1000, isTTF=False)
        order = [".notdef", "A", "B"]
        fb.setupGlyphOrder(order)
        fb.setupCharacterMap({ord("A"): "A", ord("B"): "B"})
        cs = {}
        pen = T2CharStringPen(500, None)
        cs[".notdef"] = pen.getCharString()
        pen = T2CharStringPen(600, None)
        pen.moveTo((100, 0)); pen.lineTo((100 + w, 0))
        pen.lineTo((100 + w, 700)); pen.lineTo((100, 700)); pen.closePath()
        cs["A"] = pen.getCharString()
        pen = T2CharStringPen(600, None)
        pen.moveTo((80, 0))
        pen.curveTo((80, 400), (200 + w, 500), (300 + w, 300))
        pen.curveTo((350 + w, 150), (200, -50), (80, 0))
        pen.closePath()
        cs["B"] = pen.getCharString()
        fb.setupCFF("VarTestCFF", {}, cs, {})
        fb.setupHorizontalMetrics(
            {".notdef": (500, 0), "A": (600, 100), "B": (600, 80)}
        )
        fb.setupHorizontalHeader(ascent=800, descent=-200)
        fb.setupNameTable({"familyName": "VarTestCFF", "styleName": "Regular"})
        fb.setupOS2(); fb.setupPost()
        return fb.font

    doc = DesignSpaceDocument()
    ax = AxisDescriptor()
    ax.minimum, ax.default, ax.maximum = 100, 100, 900
    ax.name, ax.tag = "Weight", "wght"
    doc.addAxis(ax)
    for wght, stem in ((100, 60), (900, 240)):
        p = f"/tmp/_fixture_cff_{wght}.otf"
        master(stem).save(p)
        s = SourceDescriptor()
        s.path = p
        s.location = {"Weight": wght}
        doc.addSource(s)
    vf, _, _ = build(doc)
    vf.save(os.path.join(HERE, "vartest_cff2.otf"))
    print("wrote vartest_cff2.otf")


def make_cidtest():
    """Convert pygame's PyGameMono to a CID-keyed CFF."""
    f = TTFont(PYGAME_MONO)
    cff = f["CFF "].cff
    td = cff[cff.fontNames[0]]
    cs = td.CharStrings
    n = len(cs)
    old_names = f.getGlyphOrder()
    new_names = [".notdef"] + ["cid%05d" % i for i in range(1, n)]
    mapping = dict(zip(old_names, new_names))
    cs.charStrings = {mapping[k]: v for k, v in cs.charStrings.items()}
    f.setGlyphOrder(new_names)
    if hasattr(f, "_reverseGlyphOrderDict"):
        del f._reverseGlyphOrderDict
    td.charset = new_names
    td.rawDict["ROS"] = ("Adobe", "Identity", 0)
    td.ROS = ("Adobe", "Identity", 0)
    td.rawDict["CIDCount"] = n
    td.CIDCount = n
    # TWO FDs sharing the Private, glyphs alternating between them —
    # exercises per-FD subr routing (fd >= 1) and format-3 ranges
    fda = cffLib.FDArrayIndex()
    for _ in range(2):
        fd = cffLib.FontDict()
        fd.rawDict = {}
        fd.Private = td.Private
        fda.append(fd)
    td.FDArray = fda
    sel = cffLib.FDSelect()
    sel.format = 3
    sel.gidArray = [gid % 2 for gid in range(n)]
    td.FDSelect = sel
    if "Private" in td.rawDict:
        del td.rawDict["Private"]
    for table in f["cmap"].tables:
        table.cmap = {
            cp: mapping.get(name, ".notdef")
            for cp, name in table.cmap.items()
        }
    f["post"].formatType = 3.0
    buf = io.BytesIO()
    f.save(buf)
    open(os.path.join(HERE, "cidtest.otf"), "wb").write(buf.getvalue())
    print("wrote cidtest.otf")


if __name__ == "__main__":
    make_vartest()
    make_vartest2()
    make_vartest3()
    make_vartest4()
    make_vartest_cff2()
    if os.path.exists(PYGAME_MONO):
        make_cidtest()
