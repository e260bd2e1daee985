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
import sys

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


def make_vartest5():
    """Variable font WITH vertical metrics: varLib emits a VVAR
    (advance heights 800->1100, tsb varies) and MVAR carries the
    vertical tags — the variation x vertical matrix fixture."""
    def master(w, ah, tsb, asc):
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
            {".notdef": (500, 0), "A": (600, 100), "B": (540, 50)}
        )
        fb.setupHorizontalHeader(ascent=800, descent=-200)
        fb.setupVerticalMetrics({
            ".notdef": (1000, 100),
            "A": (ah, tsb), "B": (ah - 100, tsb + 40),
        })
        fb.setupVerticalHeader(ascent=asc, descent=-asc)
        fb.setupNameTable({"familyName": "VarTest5", "styleName": "Regular"})
        fb.setupOS2(); fb.setupPost()
        return fb.font

    _vf([(100, 100, 900, "Weight", "wght", None)],
        [({"Weight": 100}, master(60, 800, 60, 500)),
         ({"Weight": 900}, master(240, 1100, 140, 620))],
        "vartest5.ttf")


def make_vartest6():
    """Variable font with VARYING GPOS kerning: the masters carry
    different feaLib kern values, so varLib merges them into a GPOS
    PairPos with VariationIndex device records over a GDEF v1.3
    ItemVariationStore (A-V kern -40 -> -160)."""
    from fontTools.feaLib.builder import addOpenTypeFeaturesFromString

    def master(w, kern, anchor_y=500):
        fb = FontBuilder(1000, isTTF=True)
        order = [".notdef", "A", "V", "acutecomb"]
        fb.setupGlyphOrder(order)
        fb.setupCharacterMap({ord("A"): "A", ord("V"): "V",
                              0x301: "acutecomb"})
        glyphs = {}
        pen = TTGlyphPen(glyphSet={}); glyphs[".notdef"] = pen.glyph()
        pen = TTGlyphPen(glyphSet={})
        pen.moveTo((100, 0)); pen.lineTo((100 + w, 0))
        pen.lineTo((100 + w // 2, 700)); pen.closePath()
        glyphs["A"] = pen.glyph()
        pen = TTGlyphPen(glyphSet={})
        pen.moveTo((100, 700)); pen.lineTo((100 + w, 700))
        pen.lineTo((100 + w // 2, 0)); pen.closePath()
        glyphs["V"] = pen.glyph()
        fb.setupGlyf(glyphs)
        pen = TTGlyphPen(glyphSet={})
        pen.moveTo((0, 0)); pen.lineTo((80, 0)); pen.lineTo((40, 120))
        pen.closePath()
        glyphs["acutecomb"] = pen.glyph()
        fb.setupGlyf(glyphs)
        fb.setupHorizontalMetrics(
            {".notdef": (500, 0), "A": (600, 100), "V": (600, 100),
             "acutecomb": (0, 0)})
        fb.setupHorizontalHeader(ascent=800, descent=-200)
        fb.setupNameTable({"familyName": "VarTest6",
                           "styleName": "Regular"})
        fb.setupOS2(); fb.setupPost()
        addOpenTypeFeaturesFromString(fb.font, f"""
languagesystem DFLT dflt;
markClass [acutecomb] <anchor 0 0> @TOP;
feature kern {{
    pos A V {kern};
}} kern;
feature mark {{
    pos base [A] <anchor 300 {anchor_y}> mark @TOP;
}} mark;
""")
        return fb.font

    _vf([(100, 100, 900, "Weight", "wght", None)],
        [({"Weight": 100}, master(400, -40, anchor_y=500)),
         ({"Weight": 900}, master(480, -160, anchor_y=740))],
        "vartest6.ttf")


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


def make_cjktest(n_glyphs=1024):
    """A realistic dense-regime corpus font: ``n_glyphs`` han-style
    glyphs of 24-40 closed stroke contours (200-330 quadratic segments
    each, the published CJK density range), format-12 cmap from
    U+4E00.  Deterministic (seed 0): stroke grids of horizontal/
    vertical bars plus curved hooks, quantized to font units."""
    import numpy as np

    rng = np.random.default_rng(0)
    upem = 1024
    fb = FontBuilder(upem, isTTF=True)
    names = [".notdef"] + [f"uni{0x4E00 + i:04X}" for i in range(n_glyphs)]
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap(
        {0x4E00 + i: names[i + 1] for i in range(n_glyphs)}
    )

    def stroke(pen, x, y, w, h, bulge):
        # a closed quadratic "bar" with slightly curved long sides
        pen.moveTo((x, y))
        pen.qCurveTo((x + w // 2, y - bulge), (x + w, y))
        pen.lineTo((x + w, y + h))
        pen.qCurveTo((x + w // 2, y + h + bulge), (x, y + h))
        pen.closePath()

    glyphs = {}
    pen = TTGlyphPen(glyphSet={})
    glyphs[".notdef"] = pen.glyph()
    margin = 80
    for i in range(n_glyphs):
        pen = TTGlyphPen(glyphSet={})
        n_strokes = int(rng.integers(50, 81))
        for _ in range(n_strokes):
            horiz = rng.random() < 0.55
            if horiz:
                w = int(rng.integers(200, upem - 2 * margin))
                h = int(rng.integers(28, 60))
            else:
                w = int(rng.integers(28, 60))
                h = int(rng.integers(200, upem - 2 * margin))
            x = int(rng.integers(margin, upem - margin - w))
            y = int(rng.integers(margin, upem - margin - h))
            stroke(pen, x, y, w, h, int(rng.integers(6, 24)))
        glyphs[names[i + 1]] = pen.glyph()
    fb.setupGlyf(glyphs)
    # lsb == xMin so fontTools' pen offset (lsb - xMin) is zero and
    # pen-based differentials compare raw outline coordinates
    fb.setupHorizontalMetrics({
        n: (upem, getattr(fb.font["glyf"][n], "xMin", 0)) for n in names
    })
    fb.setupHorizontalHeader(ascent=880, descent=-144)
    fb.setupNameTable({"familyName": "CJKTest", "styleName": "Regular"})
    fb.setupOS2()
    fb.setupPost()
    fb.save(os.path.join(HERE, "cjktest.ttf"))
    print("wrote cjktest.ttf")


def make_arabictest():
    """An Arabic shaping corpus font with GENUINE OpenType structure:
    init/medi/fina single substitutions, an rlig lam-alef ligature and
    mark anchors, compiled from feature syntax by fontTools feaLib —
    registered under the ``arab`` script with a DFLT entry, exercising
    script/language-system selection the way real Arabic fonts do."""
    upem = 1000
    fb = FontBuilder(upem, isTTF=True)
    # base letters + positional variants + lam-alef + one mark
    names = [
        ".notdef", "space",
        "alef-ar", "alef-ar.fina",
        "beh-ar", "beh-ar.init", "beh-ar.medi", "beh-ar.fina",
        "lam-ar", "lam-ar.init", "lam-ar.medi", "lam-ar.fina",
        "meem-ar", "meem-ar.init", "meem-ar.medi", "meem-ar.fina",
        "lam_alef-ar", "lam_alef-ar.fina",
        "fatha-ar",
    ]
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({
        0x20: "space", 0x627: "alef-ar", 0x628: "beh-ar",
        0x644: "lam-ar", 0x645: "meem-ar", 0x64E: "fatha-ar",
    })

    def boxglyph(x0, y0, x1, y1, notch=0):
        pen = TTGlyphPen(glyphSet={})
        pen.moveTo((x0, y0))
        pen.lineTo((x1, y0))
        pen.lineTo((x1, y1))
        pen.qCurveTo(((x0 + x1) // 2, y1 + 60 + notch), (x0, y1))
        pen.closePath()
        return pen.glyph()

    glyphs = {".notdef": boxglyph(50, 0, 450, 700)}
    pen = TTGlyphPen(glyphSet={})
    glyphs["space"] = pen.glyph()
    # distinct shapes per positional form (distinct rasters matter for
    # the differential tests; exact art does not)
    dims = {
        "alef-ar": (40, 0, 120, 700), "alef-ar.fina": (40, 0, 160, 680),
        "beh-ar": (30, -60, 530, 220), "beh-ar.init": (30, -40, 420, 240),
        "beh-ar.medi": (30, -20, 330, 260), "beh-ar.fina": (30, -80, 470, 230),
        "lam-ar": (40, -60, 340, 640), "lam-ar.init": (40, -40, 300, 620),
        "lam-ar.medi": (40, -20, 260, 600), "lam-ar.fina": (40, -80, 380, 630),
        "meem-ar": (30, -180, 330, 200), "meem-ar.init": (30, -40, 300, 220),
        "meem-ar.medi": (30, -20, 280, 240), "meem-ar.fina": (30, -200, 350, 210),
        "lam_alef-ar": (40, -40, 520, 700), "lam_alef-ar.fina": (40, -60, 560, 690),
        "fatha-ar": (0, 0, 160, 90),
    }
    for i, (n, (x0, y0, x1, y1)) in enumerate(dims.items()):
        glyphs[n] = boxglyph(x0, y0, x1, y1, notch=i * 7)
    fb.setupGlyf(glyphs)
    adv = {n: (600, getattr(fb.font["glyf"][n], "xMin", 0))
           for n in names}
    adv["space"] = (260, 0)
    adv["fatha-ar"] = (0, getattr(fb.font["glyf"]["fatha-ar"], "xMin", 0))
    fb.setupHorizontalMetrics(adv)
    fb.setupHorizontalHeader(ascent=800, descent=-300)
    fb.setupNameTable({"familyName": "ArabicTest", "styleName": "Regular"})
    fb.setupOS2()
    fb.setupPost()

    fea = """
languagesystem DFLT dflt;
languagesystem arab dflt;

feature init {
    script arab;
    sub beh-ar by beh-ar.init;
    sub lam-ar by lam-ar.init;
    sub meem-ar by meem-ar.init;
} init;

feature medi {
    script arab;
    sub beh-ar by beh-ar.medi;
    sub lam-ar by lam-ar.medi;
    sub meem-ar by meem-ar.medi;
} medi;

feature fina {
    script arab;
    sub alef-ar by alef-ar.fina;
    sub beh-ar by beh-ar.fina;
    sub lam-ar by lam-ar.fina;
    sub meem-ar by meem-ar.fina;
} fina;

feature rlig {
    script arab;
    sub lam-ar alef-ar by lam_alef-ar;
    sub lam-ar alef-ar.fina by lam_alef-ar.fina;
    sub lam-ar.init alef-ar.fina by lam_alef-ar.fina;
} rlig;

markClass [fatha-ar] <anchor 80 45> @TOP_MARKS;

feature mark {
    script arab;
    pos base [beh-ar beh-ar.init beh-ar.medi beh-ar.fina]
        <anchor 250 300> mark @TOP_MARKS;
    pos base [lam-ar lam-ar.init lam-ar.medi lam-ar.fina]
        <anchor 180 700> mark @TOP_MARKS;
} mark;
"""
    from fontTools.feaLib.builder import addOpenTypeFeaturesFromString

    addOpenTypeFeaturesFromString(fb.font, fea)
    fb.save(os.path.join(HERE, "arabictest.ttf"))
    print("wrote arabictest.ttf")


def make_devatest():
    """A Devanagari shaping corpus font with GENUINE OpenType Indic
    structure, compiled from feature syntax by fontTools feaLib and
    registered under ``dev2``/``deva``: nukta forms (nukt), an akhand
    ligature (akhn: k.ssa), reph formation (rphf), rakar conjuncts
    both as a full ligature (rkrf: kra) and a below-base form (blwf),
    half forms (half), a pre-base conjunct (pres: s_ta), a reph+
    anusvara presentation form (abvs), a base+matra ligature (psts)
    and an explicit-halant form (haln) — the feature set the OpenType
    Indic shaping model routes through syllable analysis and
    reordering.  The shaping differential pins fontrx's Indic shaper
    against HarfBuzz on this font.  U+25CC maps to a real dotted
    circle so broken clusters exercise dotted-circle insertion in
    both engines."""
    upem = 1000
    fb = FontBuilder(upem, isTTF=True)
    names = [
        ".notdef", "space",
        "a-deva", "ka-deva", "ga-deva", "ta-deva", "ma-deva",
        "ya-deva", "ra-deva", "ssa-deva", "sa-deva",
        "nukta-deva", "halant-deva",
        "aasign-deva", "isign-deva", "iisign-deva", "usign-deva",
        "esign-deva", "anusvara-deva", "danda-deva",
        "ka-deva.half", "ga-deva.half", "ta-deva.half", "ma-deva.half",
        "sa-deva.half", "ssa-deva.half",
        "reph-deva", "rakar-deva", "kra-deva", "kssa-deva", "qa-deva",
        "ka_aa-deva", "s_ta-deva", "reph_anusvara-deva", "ka-deva.haln",
        "dottedcircle",
    ]
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({
        0x20: "space", 0x905: "a-deva", 0x915: "ka-deva",
        0x917: "ga-deva", 0x924: "ta-deva", 0x92E: "ma-deva",
        0x92F: "ya-deva", 0x930: "ra-deva", 0x937: "ssa-deva",
        0x938: "sa-deva", 0x93C: "nukta-deva", 0x94D: "halant-deva",
        0x93E: "aasign-deva", 0x93F: "isign-deva", 0x940: "iisign-deva",
        0x941: "usign-deva", 0x947: "esign-deva", 0x902: "anusvara-deva",
        0x964: "danda-deva", 0x25CC: "dottedcircle",
    })

    def boxglyph(x0, y0, x1, y1, notch=0):
        pen = TTGlyphPen(glyphSet={})
        pen.moveTo((x0, y0))
        pen.lineTo((x1, y0))
        pen.lineTo((x1, y1))
        pen.qCurveTo(((x0 + x1) // 2, y1 + 60 + notch), (x0, y1))
        pen.closePath()
        return pen.glyph()

    glyphs = {".notdef": boxglyph(50, 0, 450, 700)}
    pen = TTGlyphPen(glyphSet={})
    glyphs["space"] = pen.glyph()
    # distinct rasters per form (the differential compares streams and
    # pen positions; exact letterforms are irrelevant)
    dims = {
        "a-deva": (40, 0, 520, 700), "ka-deva": (40, 0, 540, 700),
        "ga-deva": (40, 0, 500, 700), "ta-deva": (40, 0, 480, 700),
        "ma-deva": (40, 0, 530, 700), "ya-deva": (40, 0, 510, 700),
        "ra-deva": (40, 0, 380, 700), "ssa-deva": (40, 0, 490, 700),
        "sa-deva": (40, 0, 550, 700),
        "nukta-deva": (-160, -180, -60, -100),
        "halant-deva": (-200, -220, -80, -120),
        "aasign-deva": (30, 0, 150, 700), "isign-deva": (30, 0, 190, 740),
        "iisign-deva": (30, 0, 170, 740), "usign-deva": (-300, -260, -120, -140),
        "esign-deva": (-320, 720, -100, 840),
        "anusvara-deva": (-260, 760, -160, 860),
        "danda-deva": (60, -100, 140, 700),
        "ka-deva.half": (40, 0, 330, 700), "ga-deva.half": (40, 0, 310, 700),
        "ta-deva.half": (40, 0, 290, 700), "ma-deva.half": (40, 0, 320, 700),
        "sa-deva.half": (40, 0, 340, 700), "ssa-deva.half": (40, 0, 300, 700),
        "reph-deva": (-240, 700, -60, 880),
        "rakar-deva": (-340, -300, -140, -160),
        "kra-deva": (40, -300, 560, 700), "kssa-deva": (40, 0, 760, 700),
        "qa-deva": (40, -180, 540, 700), "ka_aa-deva": (40, 0, 700, 700),
        "s_ta-deva": (40, 0, 720, 700),
        "reph_anusvara-deva": (-280, 700, -40, 900),
        "ka-deva.haln": (40, -220, 540, 700),
        "dottedcircle": (80, 80, 480, 560),
    }
    for i, (n, (x0, y0, x1, y1)) in enumerate(dims.items()):
        glyphs[n] = boxglyph(x0, y0, x1, y1, notch=i * 5)
    fb.setupGlyf(glyphs)
    widths = {
        "space": 260, "nukta-deva": 0, "halant-deva": 0, "usign-deva": 0,
        "esign-deva": 0, "anusvara-deva": 0, "reph-deva": 0,
        "rakar-deva": 0, "reph_anusvara-deva": 0,
        "aasign-deva": 210, "isign-deva": 240, "iisign-deva": 220,
        "danda-deva": 200,
        "ka-deva.half": 380, "ga-deva.half": 360, "ta-deva.half": 340,
        "ma-deva.half": 370, "sa-deva.half": 390, "ssa-deva.half": 350,
        "kra-deva": 620, "kssa-deva": 820, "qa-deva": 600,
        "ka_aa-deva": 780, "s_ta-deva": 790, "ka-deva.haln": 600,
        "dottedcircle": 560,
    }
    adv = {n: (widths.get(n, 600),
               getattr(fb.font["glyf"][n], "xMin", 0)) for n in names}
    fb.setupHorizontalMetrics(adv)
    fb.setupHorizontalHeader(ascent=900, descent=-350)
    fb.setupNameTable({"familyName": "DevaTest", "styleName": "Regular"})
    fb.setupOS2()
    fb.setupPost()

    fea = """
languagesystem DFLT dflt;
languagesystem dev2 dflt;
languagesystem deva dflt;

feature nukt {
    sub ka-deva nukta-deva by qa-deva;
} nukt;

feature akhn {
    sub ka-deva halant-deva ssa-deva by kssa-deva;
} akhn;

feature rphf {
    sub ra-deva halant-deva by reph-deva;
} rphf;

feature rkrf {
    sub ka-deva halant-deva ra-deva by kra-deva;
} rkrf;

feature blwf {
    sub halant-deva ra-deva by rakar-deva;
} blwf;

feature half {
    sub ka-deva halant-deva by ka-deva.half;
    sub ga-deva halant-deva by ga-deva.half;
    sub ta-deva halant-deva by ta-deva.half;
    sub ma-deva halant-deva by ma-deva.half;
    sub sa-deva halant-deva by sa-deva.half;
    sub ssa-deva halant-deva by ssa-deva.half;
} half;

feature pres {
    sub sa-deva.half ta-deva by s_ta-deva;
} pres;

feature abvs {
    sub reph-deva anusvara-deva by reph_anusvara-deva;
} abvs;

feature psts {
    sub ka-deva aasign-deva by ka_aa-deva;
} psts;

feature haln {
    sub ka-deva halant-deva by ka-deva.haln;
} haln;
"""
    from fontTools.feaLib.builder import addOpenTypeFeaturesFromString

    addOpenTypeFeaturesFromString(fb.font, fea)
    fb.save(os.path.join(HERE, "devatest.ttf"))
    print("wrote devatest.ttf")


# Per-script corpus specs for the remaining nine Indic scripts; each
# builds a feaLib-compiled font with that script's GENUINE feature
# structure (reph formation per the script's mode, rakar/subjoined/
# post-base/pre-base consonant forms, half forms where the script has
# them), so the hb differential exercises the per-script reordering
# rules.  Roles: consonants a..sa; signs; matras named by their
# Unicode identity (aa right, i/e per-script side, u bottom, ...).
_INDIC_SPECS = {
    "beng": dict(
        langsys=("bng2", "beng"),
        cps={"a": 0x0985, "ka": 0x0995, "ga": 0x0997, "ta": 0x09A4,
             "ma": 0x09AE, "ya": 0x09AF, "ra": 0x09B0, "ssa": 0x09B7,
             "sa": 0x09B8, "nukta": 0x09BC, "halant": 0x09CD,
             "aa": 0x09BE, "i": 0x09BF, "ii": 0x09C0, "u": 0x09C1,
             "e": 0x09C7, "anusvara": 0x0982},
        half=True, reph="implicit", rakar=True, pstf_ya=True,
        init=True),
    "guru": dict(
        langsys=("gur2", "guru"),
        cps={"a": 0x0A05, "ka": 0x0A15, "ga": 0x0A17, "ta": 0x0A24,
             "ma": 0x0A2E, "ya": 0x0A2F, "ra": 0x0A30, "sa": 0x0A38,
             "ssa": 0x0A36, "nukta": 0x0A3C, "halant": 0x0A4D,
             "aa": 0x0A3E, "i": 0x0A3F, "ii": 0x0A40, "u": 0x0A41,
             "e": 0x0A47, "anusvara": 0x0A02},
        half=True, reph="implicit", rakar=True, pstf_ya=True),
    "gujr": dict(
        langsys=("gjr2", "gujr"),
        cps={"a": 0x0A85, "ka": 0x0A95, "ga": 0x0A97, "ta": 0x0AA4,
             "ma": 0x0AAE, "ya": 0x0AAF, "ra": 0x0AB0, "ssa": 0x0AB7,
             "sa": 0x0AB8, "nukta": 0x0ABC, "halant": 0x0ACD,
             "aa": 0x0ABE, "i": 0x0ABF, "ii": 0x0AC0, "u": 0x0AC1,
             "e": 0x0AC7, "anusvara": 0x0A82},
        half=True, reph="implicit", rakar=True),
    "orya": dict(
        langsys=("ory2", "orya"),
        cps={"a": 0x0B05, "ka": 0x0B15, "ga": 0x0B17, "ta": 0x0B24,
             "ma": 0x0B2E, "ya": 0x0B2F, "ra": 0x0B30, "ssa": 0x0B37,
             "sa": 0x0B38, "nukta": 0x0B3C, "halant": 0x0B4D,
             "aa": 0x0B3E, "i": 0x0B3F, "ii": 0x0B40, "u": 0x0B41,
             "e": 0x0B47, "anusvara": 0x0B02},
        half=False, reph="implicit", rakar=True, pstf_ya=True),
    "taml": dict(
        langsys=("tml2", "taml"),
        cps={"a": 0x0B85, "ka": 0x0B95, "ta": 0x0BA4, "ma": 0x0BAE,
             "ya": 0x0BAF, "ra": 0x0BB0, "ssa": 0x0BB7, "sa": 0x0BB8,
             "halant": 0x0BCD,
             "aa": 0x0BBE, "i": 0x0BBF, "ii": 0x0BC0, "u": 0x0BC1,
             "e": 0x0BC6, "anusvara": 0x0B82},
        half=False, reph="implicit", rakar=False),
    "telu": dict(
        langsys=("tel2", "telu"),
        cps={"a": 0x0C05, "ka": 0x0C15, "ga": 0x0C17, "ta": 0x0C24,
             "ma": 0x0C2E, "ya": 0x0C2F, "ra": 0x0C30, "ssa": 0x0C37,
             "sa": 0x0C38, "halant": 0x0C4D,
             "aa": 0x0C3E, "i": 0x0C3F, "ii": 0x0C40, "u": 0x0C41,
             "e": 0x0C46, "anusvara": 0x0C02},
        half=False, reph="explicit", rakar=True, subjoin=True),
    "knda": dict(
        langsys=("knd2", "knda"),
        cps={"a": 0x0C85, "ka": 0x0C95, "ga": 0x0C97, "ta": 0x0CA4,
             "ma": 0x0CAE, "ya": 0x0CAF, "ra": 0x0CB0, "ssa": 0x0CB7,
             "sa": 0x0CB8, "nukta": 0x0CBC, "halant": 0x0CCD,
             "aa": 0x0CBE, "i": 0x0CBF, "ii": 0x0CC0, "u": 0x0CC1,
             "e": 0x0CC6, "anusvara": 0x0C82},
        half=False, reph="implicit", rakar=True, subjoin=True),
    "mlym": dict(
        langsys=("mlm2", "mlym"),
        cps={"a": 0x0D05, "ka": 0x0D15, "ta": 0x0D24, "ma": 0x0D2E,
             "ya": 0x0D2F, "ra": 0x0D30, "ssa": 0x0D37, "sa": 0x0D38,
             "halant": 0x0D4D, "repha": 0x0D4E,
             "aa": 0x0D3E, "i": 0x0D3F, "ii": 0x0D40, "u": 0x0D41,
             "e": 0x0D46, "anusvara": 0x0D02},
        half=False, reph="logical", rakar=False, pstf_ya=True,
        pref_ra=True),
    "sinh": dict(
        langsys=("sinh",),
        cps={"a": 0x0D85, "ka": 0x0D9A, "ta": 0x0DAD, "ma": 0x0DB8,
             "ya": 0x0DBA, "ra": 0x0DBB, "sa": 0x0DC3,
             "halant": 0x0DCA,
             "aa": 0x0DCF, "i": 0x0DD2, "ii": 0x0DD3, "u": 0x0DD4,
             "e": 0x0DD9, "anusvara": 0x0D82},
        half=False, reph="explicit", rakar=False, sinhala=True),
}


def make_indic_corpus(script=None):
    """Build the nine non-Devanagari Indic corpus fonts (or one, when
    ``script`` names it): genuine per-script OpenType Indic feature
    structure compiled by feaLib; the per-script hb differentials
    (tools/indic_sweep.py, tests/test_indic_scripts.py) pin fontrx's
    shaper against HarfBuzz on these."""
    from fontTools.feaLib.builder import addOpenTypeFeaturesFromString

    for sc, spec in _INDIC_SPECS.items():
        if script is not None and sc != script:
            continue
        cps = spec["cps"]
        names = [".notdef", "space", "zwnj", "zwj", "dottedcircle"]
        names += list(cps)
        forms = ["reph", "ka_aa", "ka.haln", "k_ssa"]
        if "nukta" in cps:
            forms.append("qa")
        if spec.get("rakar"):
            forms.append("rakar")
        if spec.get("subjoin"):
            forms += ["ka.blwf", "ma.blwf"]
        if spec.get("pstf_ya"):
            forms.append("ya.pstf")
        if spec.get("pref_ra"):
            forms.append("ra.pref")
        if spec.get("sinhala"):
            forms += ["ya.pstf", "rakar", "k_sa"]
            forms.remove("k_ssa")
        if spec.get("half"):
            forms += ["ka.half", "ga.half", "ta.half", "ma.half",
                      "sa.half", "ssa.half", "s_ta"]
        if spec.get("reph") == "logical":
            forms.remove("reph")
            forms.append("repha.abv")
        forms.append("reph_anusvara")
        if spec.get("reph") == "logical":
            forms.remove("reph_anusvara")
        if spec.get("init"):
            forms.append("e.init")
        names += forms

        upem = 1000
        fb = FontBuilder(upem, isTTF=True)
        fb.setupGlyphOrder(names)
        cmap = {0x20: "space", 0x200C: "zwnj", 0x200D: "zwj",
                0x25CC: "dottedcircle"}
        cmap.update({cp: role for role, cp in cps.items()})
        fb.setupCharacterMap(cmap)

        def boxglyph(x0, y0, x1, y1, notch=0):
            pen = TTGlyphPen(glyphSet={})
            pen.moveTo((x0, y0))
            pen.lineTo((x1, y0))
            pen.lineTo((x1, y1))
            pen.qCurveTo(((x0 + x1) // 2, y1 + 60 + notch), (x0, y1))
            pen.closePath()
            return pen.glyph()

        glyphs = {".notdef": boxglyph(50, 0, 450, 700)}
        for n in ("space", "zwnj", "zwj"):
            glyphs[n] = TTGlyphPen(glyphSet={}).glyph()
        # distinct box per glyph; letterforms are irrelevant to the
        # stream/pen differential
        zero_w = {"nukta", "halant", "u", "anusvara", "repha", "reph",
                  "rakar", "reph_anusvara", "ka.blwf", "ma.blwf",
                  "repha.abv"}
        widths = {"space": 260, "zwnj": 0, "zwj": 0,
                  "dottedcircle": 560}
        for i, n in enumerate(names):
            if n in glyphs:
                continue
            if n in zero_w:
                glyphs[n] = boxglyph(-300, -260, -120, -140, notch=i * 3)
                widths[n] = 0
            elif n in ("aa", "i", "ii", "e", "e.init"):
                glyphs[n] = boxglyph(30, 0, 170, 720, notch=i * 3)
                widths[n] = 200 + 2 * i
            else:
                glyphs[n] = boxglyph(40, 0, 480 + (i % 7) * 12, 700,
                                     notch=i * 3)
                widths[n] = 600 if "." not in n and "_" not in n \
                    else 420 + 4 * i
        glyphs["dottedcircle"] = boxglyph(80, 80, 480, 560)
        fb.setupGlyf(glyphs)
        adv = {n: (widths.get(n, 600),
                   getattr(fb.font["glyf"][n], "xMin", 0))
               for n in names}
        fb.setupHorizontalMetrics(adv)
        fb.setupHorizontalHeader(ascent=900, descent=-350)
        fb.setupNameTable({"familyName": f"IndicTest-{sc}",
                           "styleName": "Regular"})
        fb.setupOS2()
        fb.setupPost()

        ls = "\n".join(f"languagesystem {t:<4} dflt;"
                       for t in ("DFLT",) + tuple(spec["langsys"]))
        fea = [ls]

        def feat(tag, *rules):
            body = "\n    ".join(rules)
            fea.append(f"feature {tag} {{\n    {body}\n}} {tag};")

        if "nukta" in cps:
            feat("nukt", "sub ka nukta by qa;")
        if spec.get("sinhala"):
            feat("akhn", "sub ka halant zwj sa by k_sa;")
        else:
            feat("akhn", "sub ka halant ssa by k_ssa;")
        reph = spec.get("reph")
        if reph == "implicit":
            feat("rphf", "sub ra halant by reph;")
        elif reph == "explicit":
            feat("rphf", "sub ra halant zwj by reph;")
        elif reph == "logical":
            feat("rphf", "sub repha by repha.abv;")
        if spec.get("pref_ra"):
            feat("pref", "sub halant ra by ra.pref;")
        blwf_rules = []
        if spec.get("rakar") and not spec.get("sinhala"):
            blwf_rules.append("sub halant ra by rakar;")
        if spec.get("subjoin"):
            blwf_rules += ["sub halant ka by ka.blwf;",
                           "sub halant ma by ma.blwf;"]
        if blwf_rules:
            feat("blwf", *blwf_rules)
        if spec.get("half"):
            feat("half", *[f"sub {c} halant by {c}.half;"
                           for c in ("ka", "ga", "ta", "ma", "sa",
                                     "ssa")])
        pstf_rules = []
        if spec.get("sinhala"):
            pstf_rules = ["sub halant zwj ya by ya.pstf;",
                          "sub halant zwj ra by rakar;"]
        elif spec.get("pstf_ya"):
            pstf_rules = ["sub halant ya by ya.pstf;"]
        if pstf_rules:
            feat("pstf", *pstf_rules)
        if spec.get("init"):
            feat("init", "sub e by e.init;")
        if spec.get("half"):
            feat("pres", "sub sa.half ta by s_ta;")
        if reph in ("implicit", "explicit"):
            feat("abvs", "sub reph anusvara by reph_anusvara;")
        feat("psts", "sub ka aa by ka_aa;")
        feat("haln", "sub ka halant by ka.haln;")

        addOpenTypeFeaturesFromString(fb.font, "\n\n".join(fea))
        out = f"{sc}test.ttf"
        fb.save(os.path.join(HERE, out))
        print("wrote", out)


def make_thaitest():
    """Thai + Lao corpus font, old-style: no GSUB, full Thai block,
    a Lao subset, and the Windows-PUA preshaped variants
    (U+F700..F71A) — the configuration that activates the legacy PUA
    shaping path.  The hb differential pins fontrx's Thai shaper
    (SARA AM decomposition + PUA mark shaping) against HarfBuzz."""
    cps = (list(range(0x0E01, 0x0E3B)) + list(range(0x0E3F, 0x0E5C))
           + list(range(0x0E81, 0x0E85)) + [0x0EAB, 0x0EB2, 0x0EB3,
              0x0EB4, 0x0EB8, 0x0EC8, 0x0EC9, 0x0ECD]
           + [0x25CC, 0x20] + list(range(0xF700, 0xF71B)))
    fb = FontBuilder(1000, isTTF=True)
    names = [".notdef"] + [f"u{cp:04X}" for cp in cps]
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({cp: f"u{cp:04X}" for cp in cps})
    glyphs = {}
    for i, n in enumerate(names):
        pen = TTGlyphPen(glyphSet={})
        pen.moveTo((50, 0))
        pen.lineTo((450, 0))
        pen.lineTo((450, 600))
        pen.qCurveTo((250, 660 + i * 3), (50, 600))
        pen.closePath()
        glyphs[n] = pen.glyph()
    fb.setupGlyf(glyphs)
    fb.setupHorizontalMetrics({n: (500, 50) for n in names})
    fb.setupHorizontalHeader(ascent=900, descent=-300)
    fb.setupNameTable({"familyName": "ThaiTest", "styleName": "R"})
    fb.setupOS2()
    fb.setupPost()
    fb.save(os.path.join(HERE, "thaitest.ttf"))
    print("wrote thaitest.ttf")


def make_khmrtest():
    """Khmer corpus font: genuine coeng-subscript GSUB structure
    (blwf below forms, the pref pre-base RO, a cfar variant, abvs/
    pres/psts presentation rules) registered under ``khmr``; the hb
    differential pins fontrx's Khmer engine against HarfBuzz."""
    cps = (list(range(0x1780, 0x17D4)) + [0x17DD]
           + list(range(0x17E0, 0x17EA)) + [0x25CC, 0x20, 0x200C,
                                            0x200D])
    forms = ["ka.blw", "ta.blw", "mo.blw", "ro.pre", "ka.cfar",
             "k_aa", "nyo.pres"]
    fb = FontBuilder(1000, isTTF=True)
    names = [".notdef"] + [f"u{cp:04X}" for cp in cps] + forms
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({cp: f"u{cp:04X}" for cp in cps})
    glyphs = {}
    for i, n in enumerate(names):
        pen = TTGlyphPen(glyphSet={})
        pen.moveTo((50, 0))
        pen.lineTo((450, 0))
        pen.lineTo((450, 600))
        pen.qCurveTo((250, 650 + i * 3), (50, 600))
        pen.closePath()
        glyphs[n] = pen.glyph()
    fb.setupGlyf(glyphs)
    fb.setupHorizontalMetrics({n: (500, 50) for n in names})
    fb.setupHorizontalHeader(ascent=900, descent=-300)
    fb.setupNameTable({"familyName": "KhmerTest", "styleName": "R"})
    fb.setupOS2()
    fb.setupPost()
    fea = """
languagesystem DFLT dflt;
languagesystem khmr dflt;

feature blwf {
    sub u17D2 u1780 by ka.blw;
    sub u17D2 u178F by ta.blw;
    sub u17D2 u1798 by mo.blw;
} blwf;

feature pref {
    sub u17D2 u179A by ro.pre;
} pref;

feature cfar {
    sub ka.blw by ka.cfar;
} cfar;

feature pres {
    sub u1789 u17B6 by nyo.pres;
} pres;

feature psts {
    sub u1780 u17B6 by k_aa;
} psts;
"""
    from fontTools.feaLib.builder import addOpenTypeFeaturesFromString

    addOpenTypeFeaturesFromString(fb.font, fea)
    fb.save(os.path.join(HERE, "khmrtest.ttf"))
    print("wrote khmrtest.ttf")


def make_mymrtest():
    """Myanmar corpus font: kinzi (rphf-style Ra+asat+halant), below
    stacks (blwf), medial consonants (pre-base medial Ra via pref,
    ya/wa/ha medials via blwf-family rules), asat + presentation
    rules, registered under ``mym2``; the hb differential pins
    fontrx's Myanmar engine."""
    cps = (list(range(0x1000, 0x1050)) + list(range(0x105A, 0x1060))
           + [0x25CC, 0x20, 0x200C, 0x200D])
    forms = ["ka.blw", "ta.blw", "ya.med", "ra.med", "wa.med",
             "ha.med", "kinzi"]
    fb = FontBuilder(1000, isTTF=True)
    names = [".notdef"] + [f"u{cp:04X}" for cp in cps] + forms
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({cp: f"u{cp:04X}" for cp in cps})
    glyphs = {}
    for i, n in enumerate(names):
        pen = TTGlyphPen(glyphSet={})
        pen.moveTo((50, 0))
        pen.lineTo((450, 0))
        pen.lineTo((450, 600))
        pen.qCurveTo((250, 650 + i * 3), (50, 600))
        pen.closePath()
        glyphs[n] = pen.glyph()
    fb.setupGlyf(glyphs)
    fb.setupHorizontalMetrics({n: (500, 50) for n in names})
    fb.setupHorizontalHeader(ascent=900, descent=-300)
    fb.setupNameTable({"familyName": "MymrTest", "styleName": "R"})
    fb.setupOS2()
    fb.setupPost()
    fea = """
languagesystem DFLT dflt;
languagesystem mym2 dflt;

feature rphf {
    sub u101B u103A u1039 by kinzi;
} rphf;

feature blwf {
    sub u1039 u1000 by ka.blw;
    sub u1039 u1010 by ta.blw;
} blwf;

feature pref {
    sub u103C by ra.med;
} pref;

feature blws {
    sub u103D by wa.med;
    sub u103E by ha.med;
} blws;

feature pres {
    sub u103B by ya.med;
} pres;
"""
    from fontTools.feaLib.builder import addOpenTypeFeaturesFromString

    addOpenTypeFeaturesFromString(fb.font, fea)
    fb.save(os.path.join(HERE, "mymrtest.ttf"))
    print("wrote mymrtest.ttf")


def make_javatest():
    """Javanese corpus font (a USE-routed script): pangkon-conjunct
    below forms (blwf), a pasangan ligature, medial/vowel structure
    under the ``java`` script; extends the USE differential beyond
    Sinhala."""
    cps = (list(range(0xA980, 0xA9CE)) + list(range(0xA9D0, 0xA9DA))
           + [0x25CC, 0x20, 0x200C, 0x200D])
    forms = ["ka.blw", "ta.blw", "na.blw", "k_a"]
    fb = FontBuilder(1000, isTTF=True)
    names = [".notdef"] + [f"u{cp:04X}" for cp in cps] + forms
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({cp: f"u{cp:04X}" for cp in cps})
    glyphs = {}
    for i, n in enumerate(names):
        pen = TTGlyphPen(glyphSet={})
        pen.moveTo((50, 0))
        pen.lineTo((450, 0))
        pen.lineTo((450, 600))
        pen.qCurveTo((250, 650 + i * 3), (50, 600))
        pen.closePath()
        glyphs[n] = pen.glyph()
    fb.setupGlyf(glyphs)
    fb.setupHorizontalMetrics({n: (500, 50) for n in names})
    fb.setupHorizontalHeader(ascent=900, descent=-300)
    fb.setupNameTable({"familyName": "JavaTest", "styleName": "R"})
    fb.setupOS2()
    fb.setupPost()
    fea = """
languagesystem DFLT dflt;
languagesystem java dflt;

feature blwf {
    sub uA9C0 uA98F by ka.blw;
    sub uA9C0 uA9A0 by ta.blw;
    sub uA9C0 uA9A4 by na.blw;
} blwf;

feature psts {
    sub uA98F uA9B4 by k_a;
} psts;
"""
    from fontTools.feaLib.builder import addOpenTypeFeaturesFromString

    addOpenTypeFeaturesFromString(fb.font, fea)
    fb.save(os.path.join(HERE, "javatest.ttf"))
    print("wrote javatest.ttf")


def make_balitest():
    """Balinese corpus font (USE-routed): adeg-adeg conjunct below
    forms, surang final, pre-base taling; extends the USE
    differential."""
    cps = (list(range(0x1B00, 0x1B50)) + list(range(0x1B50, 0x1B5A))
           + [0x25CC, 0x20, 0x200C, 0x200D])
    forms = ["ka.blw", "ta.blw", "k_a"]
    fb = FontBuilder(1000, isTTF=True)
    names = [".notdef"] + [f"u{cp:04X}" for cp in cps] + forms
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({cp: f"u{cp:04X}" for cp in cps})
    glyphs = {}
    for i, n in enumerate(names):
        pen = TTGlyphPen(glyphSet={})
        pen.moveTo((50, 0))
        pen.lineTo((450, 0))
        pen.lineTo((450, 600))
        pen.qCurveTo((250, 650 + i * 3), (50, 600))
        pen.closePath()
        glyphs[n] = pen.glyph()
    fb.setupGlyf(glyphs)
    fb.setupHorizontalMetrics({n: (500, 50) for n in names})
    fb.setupHorizontalHeader(ascent=900, descent=-300)
    fb.setupNameTable({"familyName": "BaliTest", "styleName": "R"})
    fb.setupOS2()
    fb.setupPost()
    fea = """
languagesystem DFLT dflt;
languagesystem bali dflt;

feature blwf {
    sub u1B44 u1B13 by ka.blw;
    sub u1B44 u1B22 by ta.blw;
} blwf;

feature psts {
    sub u1B13 u1B35 by k_a;
} psts;
"""
    from fontTools.feaLib.builder import addOpenTypeFeaturesFromString

    addOpenTypeFeaturesFromString(fb.font, fea)
    fb.save(os.path.join(HERE, "balitest.ttf"))
    print("wrote balitest.ttf")


def make_chamtest():
    """Cham corpus font (USE-routed): medials (pre and post), final
    consonants, vowel structure; extends the USE differential."""
    cps = (list(range(0xAA00, 0xAA37)) + list(range(0xAA40, 0xAA5A))
           + [0x25CC, 0x20, 0x200C, 0x200D])
    forms = ["k_a"]
    fb = FontBuilder(1000, isTTF=True)
    names = [".notdef"] + [f"u{cp:04X}" for cp in cps] + forms
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({cp: f"u{cp:04X}" for cp in cps})
    glyphs = {}
    for i, n in enumerate(names):
        pen = TTGlyphPen(glyphSet={})
        pen.moveTo((50, 0))
        pen.lineTo((450, 0))
        pen.lineTo((450, 600))
        pen.qCurveTo((250, 650 + i * 3), (50, 600))
        pen.closePath()
        glyphs[n] = pen.glyph()
    fb.setupGlyf(glyphs)
    fb.setupHorizontalMetrics({n: (500, 50) for n in names})
    fb.setupHorizontalHeader(ascent=900, descent=-300)
    fb.setupNameTable({"familyName": "ChamTest", "styleName": "R"})
    fb.setupOS2()
    fb.setupPost()
    fea = """
languagesystem DFLT dflt;
languagesystem cham dflt;

feature psts {
    sub uAA06 uAA33 by k_a;
} psts;
"""
    from fontTools.feaLib.builder import addOpenTypeFeaturesFromString

    addOpenTypeFeaturesFromString(fb.font, fea)
    fb.save(os.path.join(HERE, "chamtest.ttf"))
    print("wrote chamtest.ttf")


def make_tibttest():
    """Tibetan corpus font (USE-routed): subjoined stacks (blws
    ligature forms), above/below vowels, a-chung, tsa -phru,
    halanta; the script that pinned hb's modified-ccc mark reorder
    (sign u before sign i, tsa -phru before the vowels)."""
    cps = (list(range(0x0F00, 0x0F48)) + list(range(0x0F49, 0x0F6D))
           + list(range(0x0F71, 0x0F98)) + list(range(0x0F99, 0x0FBD))
           + [0x0FC6, 0x25CC, 0x20, 0x200C, 0x200D])
    forms = ["k_r", "s_g", "k_i"]
    fb = FontBuilder(1000, isTTF=True)
    names = [".notdef"] + [f"u{cp:04X}" for cp in cps] + forms
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({cp: f"u{cp:04X}" for cp in cps})
    glyphs = {}
    for i, n in enumerate(names):
        pen = TTGlyphPen(glyphSet={})
        pen.moveTo((50, 0))
        pen.lineTo((450, 0))
        pen.lineTo((450, 600))
        pen.qCurveTo((250, 650 + i * 3), (50, 600))
        pen.closePath()
        glyphs[n] = pen.glyph()
    fb.setupGlyf(glyphs)
    fb.setupHorizontalMetrics({n: (500, 50) for n in names})
    fb.setupHorizontalHeader(ascent=900, descent=-300)
    fb.setupNameTable({"familyName": "TibtTest", "styleName": "R"})
    fb.setupOS2()
    fb.setupPost()
    fea = """
languagesystem DFLT dflt;
languagesystem tibt dflt;

feature blws {
    sub u0F40 u0FB2 by k_r;
    sub u0F66 u0F92 by s_g;
} blws;

feature abvs {
    sub u0F40 u0F72 by k_i;
} abvs;
"""
    from fontTools.feaLib.builder import addOpenTypeFeaturesFromString

    addOpenTypeFeaturesFromString(fb.font, fea)
    fb.save(os.path.join(HERE, "tibttest.ttf"))
    print("wrote tibttest.ttf")


def make_lanatest():
    """Tai Tham corpus font (USE-routed): sakot conjunct below forms
    (blwf), a psts ligature, medials, the full mark inventory; the
    script that pinned the sakot's dual stacker/terminator role and
    the mai sam [QM]* slot."""
    cps = (list(range(0x1A20, 0x1A4D)) + [0x1A55, 0x1A56, 0x1A57]
           + list(range(0x1A58, 0x1A5F)) + list(range(0x1A60, 0x1A7D))
           + [0x1A7F] + list(range(0x1A80, 0x1A8A))
           + list(range(0x1A90, 0x1A9A))
           + [0x25CC, 0x20, 0x200C, 0x200D])
    forms = ["ka.blw", "ta.blw", "k_aa"]
    fb = FontBuilder(1000, isTTF=True)
    names = [".notdef"] + [f"u{cp:04X}" for cp in cps] + forms
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({cp: f"u{cp:04X}" for cp in cps})
    glyphs = {}
    for i, n in enumerate(names):
        pen = TTGlyphPen(glyphSet={})
        pen.moveTo((50, 0))
        pen.lineTo((450, 0))
        pen.lineTo((450, 600))
        pen.qCurveTo((250, 650 + i * 3), (50, 600))
        pen.closePath()
        glyphs[n] = pen.glyph()
    fb.setupGlyf(glyphs)
    fb.setupHorizontalMetrics({n: (500, 50) for n in names})
    fb.setupHorizontalHeader(ascent=900, descent=-300)
    fb.setupNameTable({"familyName": "LanaTest", "styleName": "R"})
    fb.setupOS2()
    fb.setupPost()
    fea = """
languagesystem DFLT dflt;
languagesystem lana dflt;

feature blwf {
    sub u1A60 u1A20 by ka.blw;
    sub u1A60 u1A32 by ta.blw;
} blwf;

feature psts {
    sub u1A20 u1A63 by k_aa;
} psts;
"""
    from fontTools.feaLib.builder import addOpenTypeFeaturesFromString

    addOpenTypeFeaturesFromString(fb.font, fea)
    fb.save(os.path.join(HERE, "lanatest.ttf"))
    print("wrote lanatest.ttf")


def make_sundtest():
    """Sundanese corpus font (USE-routed): pasangan conjuncts via
    the invisible virama (blwf), medials, the final-sign ordering
    (panyecek < pangwisad < panglayar), supplement punctuation."""
    cps = (list(range(0x1B80, 0x1BC0)) + list(range(0x1CC0, 0x1CC8))
           + [0x25CC, 0x20, 0x200C, 0x200D])
    forms = ["ka.blw", "ta.blw", "k_u"]
    fb = FontBuilder(1000, isTTF=True)
    names = [".notdef"] + [f"u{cp:04X}" for cp in cps] + forms
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({cp: f"u{cp:04X}" for cp in cps})
    glyphs = {}
    for i, n in enumerate(names):
        pen = TTGlyphPen(glyphSet={})
        pen.moveTo((50, 0))
        pen.lineTo((450, 0))
        pen.lineTo((450, 600))
        pen.qCurveTo((250, 650 + i * 3), (50, 600))
        pen.closePath()
        glyphs[n] = pen.glyph()
    fb.setupGlyf(glyphs)
    fb.setupHorizontalMetrics({n: (500, 50) for n in names})
    fb.setupHorizontalHeader(ascent=900, descent=-300)
    fb.setupNameTable({"familyName": "SundTest", "styleName": "R"})
    fb.setupOS2()
    fb.setupPost()
    fea = """
languagesystem DFLT dflt;
languagesystem sund dflt;

feature blwf {
    sub u1BAB u1B8A by ka.blw;
    sub u1BAB u1B98 by ta.blw;
} blwf;

feature psts {
    sub u1B8A u1BA5 by k_u;
} psts;
"""
    from fontTools.feaLib.builder import addOpenTypeFeaturesFromString

    addOpenTypeFeaturesFromString(fb.font, fea)
    fb.save(os.path.join(HERE, "sundtest.ttf"))
    print("wrote sundtest.ttf")


def _make_use_tail_font(tag, family, cps, forms, fea_body, out):
    """Shared builder for the USE long-tail corpus fonts (Batak,
    Lepcha, Buginese, Saurashtra, Limbu) — same synthetic-outline
    convention as the other USE fixtures."""
    cps = list(cps) + [0x25CC, 0x20, 0x200C, 0x200D]
    fb = FontBuilder(1000, isTTF=True)
    names = [".notdef"] + [f"u{cp:04X}" for cp in cps] + list(forms)
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({cp: f"u{cp:04X}" for cp in cps})
    glyphs = {}
    for i, n in enumerate(names):
        pen = TTGlyphPen(glyphSet={})
        pen.moveTo((50, 0))
        pen.lineTo((450, 0))
        pen.lineTo((450, 600))
        pen.qCurveTo((250, 650 + i * 3), (50, 600))
        pen.closePath()
        glyphs[n] = pen.glyph()
    fb.setupGlyf(glyphs)
    fb.setupHorizontalMetrics({n: (500, 50) for n in names})
    fb.setupHorizontalHeader(ascent=900, descent=-300)
    fb.setupNameTable({"familyName": family, "styleName": "R"})
    fb.setupOS2()
    fb.setupPost()
    fea = (f"languagesystem DFLT dflt;\nlanguagesystem {tag} dflt;\n"
           + fea_body)
    from fontTools.feaLib.builder import addOpenTypeFeaturesFromString

    addOpenTypeFeaturesFromString(fb.font, fea)
    fb.save(os.path.join(HERE, out))
    print("wrote", out)


def make_batktest():
    """Batak corpus font (USE-routed): pangolat/panongonan vowel
    killers, above/post vowels, final mark ordering."""
    _make_use_tail_font(
        "batk", "BatkTest",
        list(range(0x1BC0, 0x1BF4)) + list(range(0x1BFC, 0x1C00)),
        ["k_aa", "ka.haln"],
        """
feature psts {
    sub u1BC0 u1BE7 by k_aa;
} psts;

feature haln {
    sub u1BC0 u1BF2 by ka.haln;
} haln;
""", "batktest.ttf")


def make_lepctest():
    """Lepcha corpus font (USE-routed): directly-encoded subjoined
    medials (ya/ra), pre-base vowel signs, consonant-sign finals,
    ran and nukta."""
    _make_use_tail_font(
        "lepc", "LepcTest",
        list(range(0x1C00, 0x1C38)) + list(range(0x1C3B, 0x1C4A))
        + list(range(0x1C4D, 0x1C50)),
        ["k_ya", "k_aa"],
        """
feature blws {
    sub u1C00 u1C24 by k_ya;
} blws;

feature psts {
    sub u1C00 u1C26 by k_aa;
} psts;
""", "lepctest.ttf")


def make_bugitest():
    """Buginese corpus font (USE-routed): the minimal USE script —
    pre-base vowel e, above/below i/u, post o."""
    _make_use_tail_font(
        "bugi", "BugiTest",
        list(range(0x1A00, 0x1A1C)) + [0x1A1E, 0x1A1F],
        ["k_o"],
        """
feature psts {
    sub u1A00 u1A1A by k_o;
} psts;
""", "bugitest.ttf")


def make_saurtest():
    """Saurashtra corpus font (USE-routed): a true halant (virama)
    script — conjunct below forms via the virama, post vowels,
    final consonant marks."""
    _make_use_tail_font(
        "saur", "SaurTest",
        list(range(0xA880, 0xA8C6)) + list(range(0xA8CE, 0xA8DA)),
        ["ka.blw", "ta.blw", "k_aa"],
        """
feature blwf {
    sub uA8C4 uA892 by ka.blw;
    sub uA8C4 uA8A4 by ta.blw;
} blwf;

feature psts {
    sub uA892 uA8B5 by k_aa;
} psts;
""", "saurtest.ttf")


def make_limbtest():
    """Limbu corpus font (USE-routed): directly-encoded subjoined
    consonants, small-letter finals, kemphreng and mukphreng."""
    _make_use_tail_font(
        "limb", "LimbTest",
        list(range(0x1900, 0x191F)) + list(range(0x1920, 0x192C))
        + list(range(0x1930, 0x193C)) + [0x1940]
        + list(range(0x1944, 0x1950)),
        ["k_ya", "k_aa"],
        """
feature blws {
    sub u1901 u1929 by k_ya;
} blws;

feature psts {
    sub u1901 u1923 by k_aa;
} psts;
""", "limbtest.ttf")


def make_colrtest():
    """COLR v0 + CPAL color-layer font: three base color glyphs
    (square-on-square, overlapping discs, a glyph using the 0xFFFF
    foreground sentinel) over geometric layer glyphs; two palettes so
    palette selection is testable."""
    upem = 1000
    fb = FontBuilder(upem, isTTF=True)
    names = [".notdef", "sq", "disc", "fg", "l_bigsq", "l_smallsq",
             "l_disc1", "l_disc2", "l_bar"]
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({ord("A"): "sq", ord("B"): "disc",
                          ord("C"): "fg"})

    def rect(pen, x0, y0, x1, y1):
        pen.moveTo((x0, y0))
        pen.lineTo((x1, y0))
        pen.lineTo((x1, y1))
        pen.lineTo((x0, y1))
        pen.closePath()

    def disc(pen, cx, cy, r):
        # quadratic approximation of a circle (8 arcs)
        import math
        k = r * math.tan(math.pi / 8)
        pts = []
        for i in range(8):
            a = math.pi * i / 4
            pts.append((cx + r * math.cos(a), cy + r * math.sin(a)))
        pen.moveTo(tuple(map(round, pts[0])))
        for i in range(8):
            a_mid = math.pi * (2 * i + 1) / 8
            nxt = pts[(i + 1) % 8]
            ctrl = (cx + math.hypot(r, k) * math.cos(a_mid),
                    cy + math.hypot(r, k) * math.sin(a_mid))
            pen.qCurveTo(tuple(map(round, ctrl)), tuple(map(round, nxt)))
        pen.closePath()

    glyphs = {}
    for n in (".notdef", "sq", "disc", "fg"):
        pen = TTGlyphPen(glyphSet={})
        if n != ".notdef":
            rect(pen, 0, 0, 10, 10)  # tiny monochrome fallback outline
        glyphs[n] = pen.glyph()
    pen = TTGlyphPen(glyphSet={}); rect(pen, 100, 100, 900, 900)
    glyphs["l_bigsq"] = pen.glyph()
    pen = TTGlyphPen(glyphSet={}); rect(pen, 300, 300, 700, 700)
    glyphs["l_smallsq"] = pen.glyph()
    pen = TTGlyphPen(glyphSet={}); disc(pen, 400, 500, 300)
    glyphs["l_disc1"] = pen.glyph()
    pen = TTGlyphPen(glyphSet={}); disc(pen, 600, 500, 300)
    glyphs["l_disc2"] = pen.glyph()
    pen = TTGlyphPen(glyphSet={}); rect(pen, 200, 450, 800, 550)
    glyphs["l_bar"] = pen.glyph()
    fb.setupGlyf(glyphs)
    fb.setupHorizontalMetrics({
        n: (upem, getattr(fb.font["glyf"][n], "xMin", 0)) for n in names
    })
    fb.setupHorizontalHeader(ascent=900, descent=-100)
    fb.setupNameTable({"familyName": "ColrTest", "styleName": "Regular"})
    fb.setupOS2()
    fb.setupPost()

    from fontTools.colorLib.builder import (
        ColorPaletteType,
        buildCOLR,
        buildCPAL,
    )
    fb.font["COLR"] = buildCOLR({
        "sq": [("l_bigsq", 0), ("l_smallsq", 1)],
        "disc": [("l_disc1", 0), ("l_disc2", 2)],
        "fg": [("l_bigsq", 3), ("l_bar", 0xFFFF)],
    })
    # palette 0: red, blue, semi-transparent green, yellow
    # palette 1: the same slots re-colored (palette switch test)
    fb.font["CPAL"] = buildCPAL([
        [(1.0, 0.0, 0.0, 1.0), (0.0, 0.0, 1.0, 1.0),
         (0.0, 0.8, 0.0, 0.5), (1.0, 0.9, 0.0, 1.0)],
        [(0.0, 0.0, 0.0, 1.0), (1.0, 1.0, 1.0, 1.0),
         (1.0, 0.0, 1.0, 0.75), (0.0, 0.5, 0.5, 1.0)],
    ], paletteTypes=[
        ColorPaletteType.USABLE_WITH_LIGHT_BACKGROUND,
        ColorPaletteType.USABLE_WITH_DARK_BACKGROUND,
    ])
    fb.save(os.path.join(HERE, "colrtest.ttf"))
    print("wrote colrtest.ttf")


def make_colrv1test():
    """COLR v1 font: 'A' = two PaintGlyph/PaintSolid layers (one
    half-alpha), 'B' = PaintColrGlyph referencing A, 'C' = a linear
    gradient, 'D' = a radial gradient, 'E' = a repeat-extend linear
    gradient, 'F' = a PaintTranslate-wrapped solid layer, 'G' = a
    sweep gradient, 'H' = PaintComposite src-over, 'I' =
    PaintComposite src-in (gradient masked to a square, the
    Noto-emoji clipping idiom), 'J' = a separable blend-mode
    composite (outside the supported subset -> monochrome
    fallback)."""
    upem = 1000
    fb = FontBuilder(upem, isTTF=True)
    names = [".notdef", "sq", "refsq", "grad", "radial", "rept",
             "xform", "sweep", "compo", "mask", "blend", "l_bigsq",
             "l_smallsq"]
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({ord("A"): "sq", ord("B"): "refsq",
                          ord("C"): "grad", ord("D"): "radial",
                          ord("E"): "rept", ord("F"): "xform",
                          ord("G"): "sweep", ord("H"): "compo",
                          ord("I"): "mask", ord("J"): "blend"})

    def rect(pen, x0, y0, x1, y1):
        pen.moveTo((x0, y0))
        pen.lineTo((x1, y0))
        pen.lineTo((x1, y1))
        pen.lineTo((x0, y1))
        pen.closePath()

    glyphs = {}
    for n in (".notdef", "sq", "refsq", "grad", "radial", "rept",
              "xform", "sweep", "compo", "mask", "blend"):
        pen = TTGlyphPen(glyphSet={})
        if n != ".notdef":
            rect(pen, 0, 0, 10, 10)
        glyphs[n] = pen.glyph()
    pen = TTGlyphPen(glyphSet={}); rect(pen, 100, 100, 900, 900)
    glyphs["l_bigsq"] = pen.glyph()
    pen = TTGlyphPen(glyphSet={}); rect(pen, 300, 300, 700, 700)
    glyphs["l_smallsq"] = pen.glyph()
    fb.setupGlyf(glyphs)
    fb.setupHorizontalMetrics({
        n: (upem, getattr(fb.font["glyf"][n], "xMin", 0)) for n in names
    })
    fb.setupHorizontalHeader(ascent=900, descent=-100)
    fb.setupNameTable({"familyName": "ColrV1Test", "styleName": "Regular"})
    fb.setupOS2()
    fb.setupPost()

    from fontTools.colorLib.builder import buildCOLR, buildCPAL
    solid = lambda idx, a: {"Format": 2, "PaletteIndex": idx, "Alpha": a}
    glyph_paint = lambda g, p: {"Format": 10, "Glyph": g, "Paint": p}
    stops2 = {"ColorStop": [(0.0, 0), (1.0, 1)]}
    fb.font["COLR"] = buildCOLR({
        "sq": {"Format": 1, "Layers": [
            glyph_paint("l_bigsq", solid(0, 1.0)),
            glyph_paint("l_smallsq", solid(1, 0.5)),
        ]},
        "refsq": {"Format": 11, "Glyph": "sq"},
        "grad": glyph_paint("l_bigsq", {
            "Format": 4,  # PaintLinearGradient
            "ColorLine": stops2,
            "x0": 100, "y0": 100, "x1": 900, "y1": 100,
            "x2": 100, "y2": 900,
        }),
        "radial": glyph_paint("l_bigsq", {
            "Format": 6,  # PaintRadialGradient
            "ColorLine": stops2,
            "x0": 500, "y0": 500, "r0": 0,
            "x1": 500, "y1": 500, "r1": 400,
        }),
        "rept": glyph_paint("l_bigsq", {
            "Format": 4,
            "ColorLine": {"ColorStop": [(0.0, 0), (0.25, 1)],
                          "Extend": "repeat"},
            "x0": 100, "y0": 100, "x1": 900, "y1": 100,
            "x2": 100, "y2": 900,
        }),
        "xform": {
            "Format": 14,  # PaintTranslate
            "Paint": glyph_paint("l_smallsq", solid(0, 1.0)),
            "dx": 200, "dy": 0,
        },
        "sweep": glyph_paint("l_bigsq", {
            "Format": 8,  # PaintSweepGradient
            "ColorLine": stops2,
            "centerX": 500, "centerY": 500,
            "startAngle": 0.0, "endAngle": 179.0,
        }),
        "compo": {
            "Format": 32,  # PaintComposite, src-over
            "CompositeMode": "src_over",
            "SourcePaint": glyph_paint("l_smallsq", solid(1, 1.0)),
            "BackdropPaint": glyph_paint("l_bigsq", solid(0, 1.0)),
        },
        "blend": {
            "Format": 32,  # separable blend mode: outside the subset
            "CompositeMode": "screen",
            "SourcePaint": glyph_paint("l_bigsq", solid(0, 1.0)),
            "BackdropPaint": glyph_paint("l_smallsq", solid(1, 1.0)),
        },
        "mask": {
            "Format": 32,  # PaintComposite, src-in: gradient masked
            # to the small square (the Noto-emoji clipping idiom)
            "CompositeMode": "src_in",
            "SourcePaint": glyph_paint("l_bigsq", {
                "Format": 4, "ColorLine": stops2,
                "x0": 100, "y0": 100, "x1": 900, "y1": 100,
                "x2": 100, "y2": 900,
            }),
            "BackdropPaint": glyph_paint("l_smallsq", solid(0, 1.0)),
        },
    }, version=1, clipBoxes={
        # authoritative render bounds: crops the 100..900 big square
        # to the right half (clipping conformance test)
        "grad": (500, 100, 900, 900),
    })
    fb.font["CPAL"] = buildCPAL([
        [(1.0, 0.0, 0.0, 1.0), (0.0, 0.0, 1.0, 1.0)],
    ])
    fb.save(os.path.join(HERE, "colrv1test.ttf"))
    print("wrote colrv1test.ttf")


def make_varcolrtest():
    """Variable COLR v1 font (varLib-merged VarStore + VarIndexMap):
    one color glyph whose PaintVarTranslate dx runs 0 -> 300 and
    PaintVarSolid alpha 1.0 -> 0.25 across wght 100 -> 900."""
    def master(alpha, dx):
        upem = 1000
        fb = FontBuilder(upem, isTTF=True)
        names = [".notdef", "c", "l_sq"]
        fb.setupGlyphOrder(names)
        fb.setupCharacterMap({ord("A"): "c"})

        def rect(pen, x0, y0, x1, y1):
            pen.moveTo((x0, y0))
            pen.lineTo((x1, y0))
            pen.lineTo((x1, y1))
            pen.lineTo((x0, y1))
            pen.closePath()

        glyphs = {}
        pen = TTGlyphPen(glyphSet={})
        glyphs[".notdef"] = pen.glyph()
        pen = TTGlyphPen(glyphSet={})
        rect(pen, 0, 0, 10, 10)
        glyphs["c"] = pen.glyph()
        pen = TTGlyphPen(glyphSet={})
        rect(pen, 100, 100, 500, 500)
        glyphs["l_sq"] = pen.glyph()
        fb.setupGlyf(glyphs)
        fb.setupHorizontalMetrics({n: (upem, 0) for n in names})
        fb.setupHorizontalHeader(ascent=900, descent=-100)
        fb.setupNameTable({"familyName": "VarColr",
                           "styleName": "Regular"})
        fb.setupOS2()
        fb.setupPost()
        from fontTools.colorLib.builder import buildCOLR, buildCPAL
        fb.font["COLR"] = buildCOLR({
            "c": {"Format": 14, "dx": dx, "dy": 0,
                  "Paint": {"Format": 10, "Glyph": "l_sq",
                            "Paint": {"Format": 2, "PaletteIndex": 0,
                                      "Alpha": alpha}}},
        }, version=1)
        fb.font["CPAL"] = buildCPAL([[(1.0, 0.0, 0.0, 1.0)]])
        return fb.font

    _vf([(100, 100, 900, "Weight", "wght", [])],
        [({"Weight": 100}, master(1.0, 0)),
         ({"Weight": 900}, master(0.25, 300))],
        "varcolrtest.ttf")


def make_sbixtest():
    """sbix bitmap-strike font: two strikes (32, 64 ppem) of PNG
    glyphs (encoded with fontrx's own encoder), plus a 'dupe'
    redirect and a non-PNG graphic for the documented fallbacks."""
    import numpy as np
    from fontTools.ttLib import newTable
    from fontTools.ttLib.tables.sbixGlyph import Glyph as SbixGlyph
    from fontTools.ttLib.tables.sbixStrike import Strike

    sys_path = os.path.join(os.path.dirname(HERE), "..")
    if sys_path not in sys.path:
        sys.path.insert(0, sys_path)
    from fontrx.io.png import encode as png_encode

    upem = 1000
    fb = FontBuilder(upem, isTTF=True)
    names = [".notdef", "em", "dup", "jpg"]
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({ord("A"): "em", ord("B"): "dup",
                          ord("C"): "jpg"})
    glyphs = {}
    for n in names:
        pen = TTGlyphPen(glyphSet={})
        if n != ".notdef":
            pen.moveTo((0, 0))
            pen.lineTo((10, 0))
            pen.lineTo((10, 10))
            pen.lineTo((0, 10))
            pen.closePath()
        glyphs[n] = pen.glyph()
    fb.setupGlyf(glyphs)
    fb.setupHorizontalMetrics({n: (upem, 0) for n in names})
    fb.setupHorizontalHeader(ascent=900, descent=-100)
    fb.setupNameTable({"familyName": "SbixTest", "styleName": "Regular"})
    fb.setupOS2()
    fb.setupPost()

    def strike(ppem):
        st = Strike(ppem=ppem, resolution=72)
        st.glyphs = {}
        # quadrant test image: TL red, TR green, BL blue, BR white
        img = np.zeros((ppem, ppem, 4), np.uint8)
        img[: ppem // 2, : ppem // 2] = (255, 0, 0, 255)
        img[: ppem // 2, ppem // 2 :] = (0, 255, 0, 255)
        img[ppem // 2 :, : ppem // 2] = (0, 0, 255, 255)
        img[ppem // 2 :, ppem // 2 :] = (255, 255, 255, 255)
        st.glyphs["em"] = SbixGlyph(
            glyphName="em", graphicType="png ",
            originOffsetX=2, originOffsetY=-3,
            imageData=png_encode(img))
        st.glyphs["dup"] = SbixGlyph(
            glyphName="dup", graphicType="dupe",
            referenceGlyphName="em")
        st.glyphs["jpg"] = SbixGlyph(
            glyphName="jpg", graphicType="jpg ",
            imageData=b"\xff\xd8 not really a jpeg")
        return st

    sbix = newTable("sbix")
    sbix.version = 1
    sbix.flags = 1
    sbix.strikes = {32: strike(32), 64: strike(64)}
    fb.font["sbix"] = sbix
    fb.save(os.path.join(HERE, "sbixtest.ttf"))
    print("wrote sbixtest.ttf")


def make_cbdttest():
    """CBDT/CBLC bitmap font (handcrafted wire tables, raw-injected):
    one 64-ppem strike, index format 1, image format 17 (small
    metrics + PNG) for glyphs 'em'/'half', and a deliberately empty
    range entry for the fallback."""
    import struct as st

    import numpy as np
    from fontTools.ttLib.tables.DefaultTable import DefaultTable

    sys_path = os.path.join(os.path.dirname(HERE), "..")
    if sys_path not in sys.path:
        sys.path.insert(0, sys_path)
    from fontrx.io.png import encode as png_encode

    upem = 1000
    fb = FontBuilder(upem, isTTF=True)
    names = [".notdef", "em", "half", "none"]
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({ord("A"): "em", ord("B"): "half",
                          ord("C"): "none"})
    glyphs = {}
    for n in names:
        pen = TTGlyphPen(glyphSet={})
        if n != ".notdef":
            pen.moveTo((0, 0))
            pen.lineTo((10, 0))
            pen.lineTo((10, 10))
            pen.lineTo((0, 10))
            pen.closePath()
        glyphs[n] = pen.glyph()
    fb.setupGlyf(glyphs)
    fb.setupHorizontalMetrics({n: (upem, 0) for n in names})
    fb.setupHorizontalHeader(ascent=900, descent=-100)
    fb.setupNameTable({"familyName": "CbdtTest", "styleName": "Regular"})
    fb.setupOS2()
    fb.setupPost()

    img1 = np.zeros((64, 64, 4), np.uint8)
    img1[:32, :32] = (255, 0, 0, 255)
    img1[:32, 32:] = (0, 255, 0, 255)
    img1[32:, :32] = (0, 0, 255, 255)
    img1[32:, 32:] = (255, 255, 255, 255)
    img2 = np.zeros((32, 32, 4), np.uint8)
    img2[:] = (255, 0, 255, 255)
    png1, png2 = png_encode(img1), png_encode(img2)

    def fmt17(h, w, bx, by, adv, png):
        return st.pack(">BBbbB", h, w, bx, by, adv) + st.pack(
            ">I", len(png)) + png

    g1 = fmt17(64, 64, 1, 60, 64, png1)      # bottom = 60-64 = -4
    g2 = fmt17(32, 32, 0, 32, 32, png2)      # bottom = 0
    cbdt = st.pack(">HH", 3, 0) + g1 + g2 + b""
    # glyphs 1..3; gid 3 ('none') gets an empty slice (no bitmap)
    offs = [0, len(g1), len(g1) + len(g2), len(g1) + len(g2)]
    subtable = st.pack(">HHI", 1, 17, 4) + st.pack(
        ">4I", *offs)
    ista = st.pack(">HHI", 1, 3, 8) + subtable
    size_rec = st.pack(
        ">IIII", 56, len(ista), 1, 0) + b"\x00" * 24 + st.pack(
        ">HHBBBb", 1, 3, 64, 64, 32, 1)
    cblc = st.pack(">HHI", 3, 0, 1) + size_rec + ista
    assert len(st.pack(">HHI", 3, 0, 1) + size_rec) == 56

    for tag, raw in ((b"CBLC", cblc), (b"CBDT", cbdt)):
        tbl = DefaultTable(tag=tag.decode())
        tbl.data = raw
        fb.font[tag.decode()] = tbl
    fb.save(os.path.join(HERE, "cbdttest.ttf"))
    print("wrote cbdttest.ttf")


def make_svgtest():
    """OT-SVG color font: glyphs 'A'/'B' share one multi-shape
    document (two glyph elements), 'C' is a gzip-compressed gradient
    document (linear userSpaceOnUse + radial objectBoundingBox with
    gradientTransform + reflect spread), 'D' exercises structure
    (defs/use, nested transforms, evenodd donut, named colors,
    currentColor, group opacity), and 'E'/'F' + 'G'/'H' are
    SVG-vs-COLR equivalence twins: the SAME geometry and gradient
    expressed as an SVG document (E, G) and as glyf+COLR v1 (F, H) —
    the renders must be pixel-identical, which pins the whole SVG
    lowering (viewBox/y-flip mapping, path parse, gradient spaces)
    against the independently-tested COLR path."""
    upem = 1000
    fb = FontBuilder(upem, isTTF=True)
    names = [".notdef", "svg1", "svg2", "svggrad", "svgstruct",
             "svglin", "colrlin", "svgrad", "colrrad", "l_eqsq",
             "svgstroke", "strokefill", "svgclip", "svggrpop",
             "svgoff", "offfill", "svgsat", "satplain", "svgfloodin",
             "floodfill", "svgshadow", "svgerode", "erodefill",
             "svgtile", "tilefill"]
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({ord("A"): "svg1", ord("B"): "svg2",
                          ord("C"): "svggrad", ord("D"): "svgstruct",
                          ord("E"): "svglin", ord("F"): "colrlin",
                          ord("G"): "svgrad", ord("H"): "colrrad",
                          ord("I"): "svgstroke", ord("J"): "strokefill",
                          ord("K"): "svgclip", ord("L"): "svggrpop",
                          ord("M"): "svgoff", ord("N"): "offfill",
                          ord("O"): "svgsat", ord("P"): "satplain",
                          ord("Q"): "svgfloodin", ord("R"): "floodfill",
                          ord("S"): "svgshadow", ord("T"): "svgerode",
                          ord("U"): "erodefill", ord("V"): "svgtile",
                          ord("W"): "tilefill"})

    def rect(pen, x0, y0, x1, y1):
        pen.moveTo((x0, y0))
        pen.lineTo((x1, y0))
        pen.lineTo((x1, y1))
        pen.lineTo((x0, y1))
        pen.closePath()

    glyphs = {}
    for n in names:
        pen = TTGlyphPen(glyphSet={})
        if n == "l_eqsq":
            rect(pen, 100, 100, 900, 700)
        elif n != ".notdef":
            rect(pen, 0, 0, 10, 10)
        glyphs[n] = pen.glyph()
    fb.setupGlyf(glyphs)
    fb.setupHorizontalMetrics({
        n: (upem, getattr(fb.font["glyf"][n], "xMin", 0)) for n in names
    })
    fb.setupHorizontalHeader(ascent=900, descent=-100)
    fb.setupNameTable({"familyName": "SvgTest", "styleName": "Regular"})
    fb.setupOS2()
    fb.setupPost()

    # COLR twins for the equivalence glyphs
    from fontTools.colorLib.builder import buildCOLR, buildCPAL
    stops2 = {"ColorStop": [(0.0, 0), (1.0, 1)]}
    fb.font["COLR"] = buildCOLR({
        "colrlin": {"Format": 10, "Glyph": "l_eqsq", "Paint": {
            "Format": 4, "ColorLine": stops2,
            "x0": 100, "y0": 100, "x1": 900, "y1": 100,
            "x2": 100, "y2": 900,
        }},
        "colrrad": {"Format": 10, "Glyph": "l_eqsq", "Paint": {
            "Format": 6, "ColorLine": stops2,
            "x0": 500, "y0": 400, "r0": 0,
            "x1": 500, "y1": 400, "r1": 300,
        }},
    })
    fb.font["CPAL"] = buildCPAL([[(1.0, 0.0, 0.0, 1.0),
                                  (0.0, 0.0, 1.0, 1.0)]])

    # documents: doc coords = glyph coords with y negated (the OT-SVG
    # y-down convention; identity viewBox 0 0 1000 1000)
    doc_shared = """<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 1000 1000">
  <g id="glyph1">
    <rect x="100" y="-700" width="500" height="300" fill="#00aa44"/>
    <circle cx="700" cy="-300" r="150" fill="rgb(255,0,255)"/>
    <path d="M100 -250 L300 -250 Q400 -350 500 -250 C600 -150 700 -350 800 -250 Z" fill="#0000ffcc"/>
  </g>
  <g id="glyph2" transform="translate(100,0) scale(0.8)">
    <polygon points="100,-100 900,-100 500,-800" fill="tomato"/>
  </g>
</svg>"""
    doc_grad = """<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 1000 1000">
  <defs>
    <linearGradient id="L" x1="100" y1="-800" x2="900" y2="-800" gradientUnits="userSpaceOnUse" spreadMethod="reflect">
      <stop offset="0" stop-color="red"/>
      <stop offset="0.5" stop-color="#00ff00" stop-opacity="0.8"/>
    </linearGradient>
    <radialGradient id="R" cx="0.5" cy="0.5" r="0.5" gradientTransform="scale(1,0.75)">
      <stop offset="0" stop-color="white"/>
      <stop offset="1" stop-color="navy"/>
    </radialGradient>
  </defs>
  <g id="glyph3">
    <rect x="100" y="-900" width="800" height="300" fill="url(#L)"/>
    <rect x="100" y="-500" width="800" height="400" fill="url(#R)"/>
  </g>
</svg>"""
    doc_struct = """<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 1000 1000">
  <defs>
    <path id="chip" d="M0 0 H120 V-120 H0 Z"/>
  </defs>
  <g id="glyph4" color="#663300">
    <path d="M100 -100 H900 V-900 H100 Z M300 -300 H700 V-700 H300 Z" fill-rule="evenodd" fill="steelblue"/>
    <g transform="translate(420,-420) rotate(45)" opacity="0.5">
      <rect x="-60" y="-60" width="120" height="120" fill="currentColor"/>
    </g>
    <use href="#chip" x="120" y="-120" fill="gold"/>
    <rect x="100" y="-100" width="10" height="10" fill="none"/>
    <rect x="0" y="0" width="50" height="50" fill="black" display="none"/>
  </g>
</svg>"""
    # equivalence twins: identical geometry/gradient as the COLR
    # versions above (square (100,100)-(900,700) in glyph space)
    doc_eq_lin = """<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 1000 1000">
  <defs>
    <linearGradient id="L" x1="100" y1="-100" x2="900" y2="-100" gradientUnits="userSpaceOnUse">
      <stop offset="0" stop-color="#ff0000"/>
      <stop offset="1" stop-color="#0000ff"/>
    </linearGradient>
  </defs>
  <path id="glyph5" d="M100 -100 H900 V-700 H100 Z" fill="url(#L)"/>
</svg>"""
    doc_eq_rad = """<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 1000 1000">
  <defs>
    <radialGradient id="R" cx="500" cy="-400" r="300" fx="500" fy="-400" fr="0" gradientUnits="userSpaceOnUse">
      <stop offset="0" stop-color="#ff0000"/>
      <stop offset="1" stop-color="#0000ff"/>
    </radialGradient>
  </defs>
  <path id="glyph7" d="M100 -100 H900 V-700 H100 Z" fill="url(#R)"/>
</svg>"""

    # stroke-vs-fill equivalence twins ('I' strokes, 'J' is the same
    # geometry as explicit fill paths — straight-segment strokes are
    # EXACT hand constructions, so the renders must be pixel-identical):
    # butt line -> rect, square-cap line -> extended rect, stroked
    # rect -> evenodd annulus
    doc_stroke = """<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 1000 1000">
  <g id="glyph10" stroke="#cc2200" stroke-width="100">
    <line x1="200" y1="-500" x2="800" y2="-500"/>
    <line x1="200" y1="-200" x2="800" y2="-200" stroke-linecap="square"/>
    <rect x="300" y="-860" width="400" height="200" fill="none" stroke-width="60"/>
  </g>
</svg>"""
    doc_strokefill = """<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 1000 1000">
  <g id="glyph11" fill="#cc2200">
    <path d="M200 -450 H800 V-550 H200 Z"/>
    <path d="M150 -150 H850 V-250 H150 Z"/>
    <path d="M270 -630 H730 V-890 H270 Z M330 -690 H670 V-830 H330 Z" fill-rule="evenodd"/>
  </g>
</svg>"""
    # clip-path: a circle clipped to a rect window (SrcIn lowering)
    doc_clip = """<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 1000 1000">
  <defs>
    <clipPath id="cpwin"><rect x="300" y="-700" width="400" height="400"/></clipPath>
  </defs>
  <g id="glyph12">
    <circle cx="500" cy="-500" r="300" fill="#0044aa" clip-path="url(#cpwin)"/>
  </g>
</svg>"""
    # exact group opacity: two overlapping opaque circles at group
    # opacity 0.5 — the overlap must read 0.5, not 0.75
    doc_grpop = """<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 1000 1000">
  <g id="glyph13" opacity="0.5">
    <circle cx="400" cy="-500" r="200" fill="#ff0000"/>
    <circle cx="600" cy="-500" r="200" fill="#ff0000"/>
  </g>
</svg>"""

    # filter twins (the same exactness idiom as stroke-vs-fill):
    # M feOffset == N plain rect at the offset position;
    # O saturate(1) identity == P unfiltered; Q feFlood composited
    # 'in' SourceAlpha == R plain solid fill.  S is a drop shadow
    # (pixel checks, not a twin).  Regions widened where the effect
    # spills past the default -10%/+120% bbox region.
    doc_off = """<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 1000 1000">
  <defs>
    <filter id="fo" x="-50%" y="-50%" width="200%" height="200%">
      <feOffset dx="100" dy="-100"/>
    </filter>
  </defs>
  <rect id="glyph14" x="200" y="-600" width="300" height="200" fill="#336699" filter="url(#fo)"/>
  <rect id="glyph15" x="300" y="-700" width="300" height="200" fill="#336699"/>
</svg>"""
    doc_sat = """<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 1000 1000">
  <defs>
    <linearGradient id="SL" x1="100" y1="-500" x2="900" y2="-500" gradientUnits="userSpaceOnUse">
      <stop offset="0" stop-color="#ff2200"/>
      <stop offset="1" stop-color="#0022ff"/>
    </linearGradient>
    <filter id="fs"><feColorMatrix type="saturate" values="1"/></filter>
  </defs>
  <rect id="glyph16" x="100" y="-700" width="800" height="400" fill="url(#SL)" filter="url(#fs)"/>
  <rect id="glyph17" x="100" y="-700" width="800" height="400" fill="url(#SL)"/>
</svg>"""
    doc_floodin = """<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 1000 1000">
  <defs>
    <filter id="ff">
      <feFlood flood-color="#aa0000" flood-opacity="0.75"/>
      <feComposite in2="SourceAlpha" operator="in"/>
    </filter>
  </defs>
  <circle id="glyph18" cx="500" cy="-450" r="250" fill="black" filter="url(#ff)"/>
  <circle id="glyph19" cx="500" cy="-450" r="250" fill="#aa0000" fill-opacity="0.75"/>
</svg>"""
    # round-5 long-tail twins: T erode(40) on a rect == U the rect
    # inset by 40 user units on every side (rect coverage is separable,
    # so the windowed min IS the inset rect's coverage — exact).
    # V/W crop to the SAME hard userSpaceOnUse region strictly inside
    # the rect, so the tiled cell (interior-solid) and the
    # identity-filtered rect agree on every region pixel — feTile
    # replicates interior values onto the region boundary per spec,
    # which an UNfiltered rect's AA edge would not match.
    doc_erode = """<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 1000 1000">
  <defs>
    <filter id="fm" x="-50%" y="-50%" width="200%" height="200%">
      <feMorphology operator="erode" radius="40"/>
    </filter>
  </defs>
  <rect id="glyph21" x="200" y="-600" width="400" height="300" fill="#227744" filter="url(#fm)"/>
  <rect id="glyph22" x="240" y="-560" width="320" height="220" fill="#227744"/>
</svg>"""
    doc_tile = """<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 1000 1000">
  <defs>
    <filter id="ft" x="200" y="-600" width="300" height="300" filterUnits="userSpaceOnUse">
      <feFlood flood-color="#884422" x="200" y="-600" width="100" height="100" result="sq"/>
      <feComposite in="sq" in2="SourceAlpha" operator="in" x="200" y="-600" width="100" height="100" result="cell"/>
      <feTile in="cell"/>
    </filter>
    <filter id="fi" x="200" y="-600" width="300" height="300" filterUnits="userSpaceOnUse">
      <feColorMatrix type="saturate" values="1"/>
    </filter>
  </defs>
  <rect id="glyph23" x="100" y="-700" width="500" height="500" fill="black" filter="url(#ft)"/>
  <rect id="glyph24" x="100" y="-700" width="500" height="500" fill="#884422" filter="url(#fi)"/>
</svg>"""
    doc_shadow = """<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 1000 1000">
  <defs>
    <filter id="fd" x="-50%" y="-50%" width="200%" height="200%">
      <feDropShadow dx="120" dy="120" stdDeviation="8" flood-color="#004400"/>
    </filter>
  </defs>
  <rect id="glyph20" x="200" y="-800" width="400" height="400" fill="#ddaa00" filter="url(#fd)"/>
</svg>"""

    from fontTools.ttLib import newTable
    from fontTools.ttLib.tables.S_V_G_ import SVGDocument

    svg = newTable("SVG ")
    svg.docList = [
        SVGDocument(doc_shared, 1, 2),
        SVGDocument(doc_grad, 3, 3, compressed=True),
        SVGDocument(doc_struct, 4, 4),
        SVGDocument(doc_eq_lin, 5, 5),
        SVGDocument(doc_eq_rad, 7, 7),
        SVGDocument(doc_stroke, 10, 10),
        SVGDocument(doc_strokefill, 11, 11),
        SVGDocument(doc_clip, 12, 12),
        SVGDocument(doc_grpop, 13, 13),
        SVGDocument(doc_off, 14, 15),
        SVGDocument(doc_sat, 16, 17),
        SVGDocument(doc_floodin, 18, 19),
        SVGDocument(doc_shadow, 20, 20),
        SVGDocument(doc_erode, 21, 22),
        SVGDocument(doc_tile, 23, 24),
    ]
    fb.font["SVG "] = svg
    fb.save(os.path.join(HERE, "svgtest.ttf"))
    print("wrote svgtest.ttf")


def make_ebdttest():
    """EBDT/EBLC monochrome/grayscale strike font (handcrafted wire
    tables, raw-injected): four strikes covering bit depths 1/2/4/8,
    index formats 1/3/4/5, and image formats 1/2/5/6/8/9 (byte- and
    bit-aligned rows, metrics-in-index, and both composite forms).

    Glyphs: 'A'->box, 'B'->tri, 'C'->comp (composite of box + tri),
    'D'->none (no strike at any size).  The bitmap content is a
    deterministic per-(glyph, ppem, depth) pattern, so the fontTools
    EBDT decompiler can re-read every pixel as the differential
    oracle.
    """
    import struct as st

    import numpy as np
    from fontTools.ttLib.tables.DefaultTable import DefaultTable

    upem = 1000
    fb = FontBuilder(upem, isTTF=True)
    names = [".notdef", "box", "tri", "comp", "none"]
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({ord("A"): "box", ord("B"): "tri",
                          ord("C"): "comp", ord("D"): "none"})
    glyphs = {}
    for n in names:
        pen = TTGlyphPen(glyphSet={})
        if n != ".notdef":
            # full-size outline so the no-strike fallback is visible
            pen.moveTo((50, 0))
            pen.lineTo((650, 0))
            pen.lineTo((650, 600))
            pen.lineTo((50, 600))
            pen.closePath()
        glyphs[n] = pen.glyph()
    fb.setupGlyf(glyphs)
    fb.setupHorizontalMetrics({n: (upem, 0) for n in names})
    fb.setupHorizontalHeader(ascent=900, descent=-100)
    fb.setupNameTable({"familyName": "EbdtTest", "styleName": "Regular"})
    fb.setupOS2()
    fb.setupPost()

    def pattern(kind, h, w, depth):
        top = (1 << depth) - 1
        v = np.zeros((h, w), np.uint8)
        if kind == "box":
            v[0, :] = v[-1, :] = v[:, 0] = v[:, -1] = top
            yy, xx = np.mgrid[0:h, 0:w]
            v = np.maximum(v, ((yy * 3 + xx * 5) % (top + 1))
                           .astype(np.uint8) * ((yy % 2) == 0))
        else:  # tri: lower-left ramp
            yy, xx = np.mgrid[0:h, 0:w]
            v = np.where(xx <= yy, (xx + yy) % (top + 1), 0
                         ).astype(np.uint8)
        return v

    def bit_rows(vals, depth, byte_aligned):
        h, w = vals.shape
        out = bytearray()
        acc = nbits = 0
        for r in range(h):
            for c in range(w):
                acc = (acc << depth) | int(vals[r, c])
                nbits += depth
                while nbits >= 8:
                    out.append((acc >> (nbits - 8)) & 0xFF)
                    nbits -= 8
            if byte_aligned and nbits:
                out.append((acc << (8 - nbits)) & 0xFF)
                acc = nbits = 0
        if nbits:
            out.append((acc << (8 - nbits)) & 0xFF)
        return bytes(out)

    def small(h, w):
        return st.pack(">BBbbB", h, w, 1, h - 2, w + 2)

    def big(h, w):
        return st.pack(">BBbbBbbB", h, w, 1, h - 2, w + 2, 0, h, h)

    ebdt = bytearray(st.pack(">HH", 2, 0))

    def emit(blob):
        off = len(ebdt)
        ebdt.extend(blob)
        return off

    strikes = []  # (ppem, depth, [(first, last, idx_blob_builder)])

    # ---- strike 1: ppem 16, depth 1 ----------------------------------
    d1_box = pattern("box", 16, 16, 1)
    d1_tri = pattern("tri", 16, 16, 1)
    o_box1 = emit(small(16, 16) + bit_rows(d1_box, 1, True))
    o_tri1 = emit(small(16, 16) + bit_rows(d1_tri, 1, True))
    end1 = len(ebdt)
    # composite: box at (0,0), tri at (2,2); format 8 = small
    # metrics + pad + count + (gid, dx, dy) components
    o_comp1 = emit(small(18, 18) + st.pack(">xH", 2)
                   + st.pack(">Hbb", 1, 0, 0) + st.pack(">Hbb", 2, 2, 2))
    end1c = len(ebdt)

    def idx1(pairs, img_fmt, base):
        """index format 1: u32 offsets relative to imageDataOffset."""
        offs = [p - base for p in pairs]
        return st.pack(">HHI", 1, img_fmt, base) + st.pack(
            f">{len(offs)}I", *offs)

    sub_a = idx1([o_box1, o_tri1, end1], 1, o_box1)
    sub_b = idx1([o_comp1, end1c], 8, o_comp1)
    strikes.append((16, 1, [(1, 2, sub_a), (3, 3, sub_b)]))

    # ---- strike 2: ppem 20, depth 2, sparse idx 4, bit-aligned -------
    d2_box = pattern("box", 20, 20, 2)
    d2_tri = pattern("tri", 20, 20, 2)
    o_box2 = emit(small(20, 20) + bit_rows(d2_box, 2, False))
    o_tri2 = emit(small(20, 20) + bit_rows(d2_tri, 2, False))
    end2 = len(ebdt)
    sub_c = (st.pack(">HHI", 4, 2, o_box2) + st.pack(">I", 2)
             + st.pack(">HH", 1, 0)
             + st.pack(">HH", 2, o_tri2 - o_box2)
             + st.pack(">HH", 0xFFFF, end2 - o_box2))
    strikes.append((20, 2, [(1, 2, sub_c)]))

    # ---- strike 3: ppem 24, depth 4, const-size sparse idx 5,
    # data-only bit-aligned (metrics in the index) --------------------
    d3_box = pattern("box", 10, 10, 4)
    d3_tri = pattern("tri", 10, 10, 4)
    img3_box = bit_rows(d3_box, 4, False)
    img3_tri = bit_rows(d3_tri, 4, False)
    assert len(img3_box) == len(img3_tri)
    o_box3 = emit(img3_box)
    emit(img3_tri)
    sub_d = (st.pack(">HHI", 5, 5, o_box3)
             + st.pack(">I", len(img3_box)) + big(10, 10)
             + st.pack(">I", 2) + st.pack(">HH", 1, 2))
    strikes.append((24, 4, [(1, 2, sub_d)]))

    # ---- strike 4: ppem 32, depth 8, idx 3 + big metrics ------------
    d4_box = pattern("box", 12, 12, 8)
    d4_tri = pattern("tri", 12, 12, 8)
    o_box4 = emit(big(12, 12) + bit_rows(d4_box, 8, True))
    o_tri4 = emit(big(12, 12) + bit_rows(d4_tri, 8, True))
    end4 = len(ebdt)
    # format 9 composite: big metrics + count + components
    o_comp4 = emit(big(14, 14) + st.pack(">H", 2)
                   + st.pack(">Hbb", 1, 0, 0) + st.pack(">Hbb", 2, 2, 2))
    end4c = len(ebdt)
    sub_e = st.pack(">HHI", 3, 6, o_box4) + st.pack(
        ">3H", 0, o_tri4 - o_box4, end4 - o_box4) + b"\x00\x00"
    sub_f = idx1([o_comp4, end4c], 9, o_comp4)
    strikes.append((32, 8, [(1, 2, sub_e), (3, 3, sub_f)]))

    # ---- EBLC assembly ----------------------------------------------
    n_sizes = len(strikes)
    header = st.pack(">HHI", 2, 0, n_sizes)
    size_recs = b""
    blocks = b""
    block_base = len(header) + 48 * n_sizes
    for ppem, depth, subs in strikes:
        array_off = block_base + len(blocks)
        arr = b""
        sub_blob = b""
        arr_len = 8 * len(subs)
        for first, last, sub in subs:
            arr += st.pack(">HHI", first, last, arr_len + len(sub_blob))
            sub_blob += sub
        blocks += arr + sub_blob
        first_g = min(s[0] for s in subs)
        last_g = max(s[1] for s in subs)
        size_recs += st.pack(">IIII", array_off, arr_len + len(sub_blob),
                             len(subs), 0)
        size_recs += b"\x00" * 24  # two sbitLineMetrics
        size_recs += st.pack(">HHBBBb", first_g, last_g, ppem, ppem,
                             depth, 1)
    eblc = header + size_recs + blocks

    for tag, raw in ((b"EBLC", eblc), (b"EBDT", bytes(ebdt))):
        tbl = DefaultTable(tag=tag.decode())
        tbl.data = raw
        fb.font[tag.decode()] = tbl
    fb.save(os.path.join(HERE, "ebdttest.ttf"))
    print("wrote ebdttest.ttf")




def make_morxtest():
    """AAT morx fixtures — one font per subtable type, each exercising
    one extended-state-table machine.  The shaping oracle is HarfBuzz
    (tests/test_hb_differential.py binding): fontrx\'s morx engine must
    match hb_shape glyph-for-glyph on every fixture
    (tests/test_morx.py)."""
    import io

    import fontTools.ttLib.tables.otTables as ot
    from fontTools.ttLib import newTable

    def base_font(names, cmap):
        fb = FontBuilder(1000, isTTF=True)
        fb.setupGlyphOrder(names)
        fb.setupCharacterMap(cmap)
        gl = {}
        for n in names:
            pen = TTGlyphPen(glyphSet={})
            pen.moveTo((0, 0)); pen.lineTo((100, 0))
            pen.lineTo((50, 100)); pen.closePath()
            gl[n] = pen.glyph()
        fb.setupGlyf(gl)
        fb.setupHorizontalMetrics({n: (600, 0) for n in names})
        fb.setupHorizontalHeader(ascent=800, descent=-200)
        fb.setupNameTable({"familyName": "MorxT", "styleName": "R"})
        fb.setupOS2(); fb.setupPost()
        return fb

    def wrap(subs):
        t = ot.morx(); t.Version = 2; t.Reserved = 0
        chain = ot.MorxChain(); chain.DefaultFlags = 1
        feat = ot.MorphFeature()
        feat.FeatureType = 0; feat.FeatureSetting = 0
        feat.EnableFlags = 1; feat.DisableFlags = 0xFFFFFFFF
        chain.MorphFeature = [feat]
        chain.MorphSubtable = subs
        chain.SubtableCount = len(subs); chain.MorphFeatureCount = 1
        t.MorphChain = [chain]; t.ChainCount = 1
        return t

    def subtable(kind, struct_):
        sub = ot.MorxSubtable()
        sub.Reserved = 0
        sub.ProcessingOrder = "LayoutOrder"
        sub.TextDirection = "Horizontal"
        sub.CoverageFlags = 0
        sub.SubFeatureFlags = 1
        sub.MorphType = kind
        sub.SubStruct = struct_
        return sub

    def state(n_classes, trans, default):
        s = ot.AATState()
        s.Transitions = {
            c: trans.get(c, default()) for c in range(n_classes)}
        return s

    def save(fb, t, name):
        tab = newTable("morx"); tab.table = t
        fb.font["morx"] = tab
        fb.save(os.path.join(HERE, name))
        print("wrote", name)

    names = [".notdef", "A", "B", "C", "D"]
    cmap = {ord(c): c for c in "ABCD"}

    # type 4 noncontextual: A -> B
    fb = base_font(names, cmap)
    nm = ot.NoncontextualMorph()
    nm.Substitution = {"A": "B"}
    save(fb, wrap([subtable(4, nm)]), "morx_nonctx.ttf")

    # type 1 contextual: A BEFORE B becomes C (marked substitution)
    fb = base_font(names, cmap)
    st = ot.AATStateTable()
    st.GlyphClasses = {"A": 4, "B": 5}

    def ca(new_state=0, set_mark=False, mark_index=0xFFFF,
           cur_index=0xFFFF):
        a = ot.ContextualMorphAction()
        a.NewState = new_state; a.SetMark = set_mark
        a.MarkIndex = mark_index; a.CurrentIndex = cur_index
        return a

    st.States = [
        state(6, {4: ca(2, set_mark=True)}, ca),
        state(6, {4: ca(2, set_mark=True)}, ca),
        state(6, {4: ca(2, set_mark=True), 5: ca(0, mark_index=0)},
              ca),
    ]
    st.PerGlyphLookups = [{"A": "C"}]
    cm = ot.ContextualMorph(); cm.StateTable = st
    save(fb, wrap([subtable(1, cm)]), "morx_ctx.ttf")

    # type 0 rearrangement: A x D -> D x A (verb 3, adjacent only)
    fb = base_font(names, cmap)
    st = ot.AATStateTable()
    st.GlyphClasses = {"A": 4, "D": 5}

    def ra(new_state=0, mark_first=False, mark_last=False, verb=0):
        a = ot.RearrangementMorphAction()
        a.NewState = new_state
        a.MarkFirst = mark_first; a.MarkLast = mark_last
        a.DontAdvance = False; a.Verb = verb
        return a

    st.States = [
        state(6, {4: ra(2, mark_first=True)}, ra),
        state(6, {4: ra(2, mark_first=True)}, ra),
        state(6, {4: ra(2, mark_first=True),
                  5: ra(0, mark_last=True, verb=3)}, ra),
    ]
    rm = ot.RearrangementMorph(); rm.StateTable = st
    save(fb, wrap([subtable(0, rm)]), "morx_rearr.ttf")

    # type 5 insertion: C inserted after every A
    fb = base_font(names, cmap)
    st = ot.AATStateTable()
    st.GlyphClasses = {"A": 4}

    def ia(new_state=0, current=(), before=False):
        a = ot.InsertionMorphAction()
        a.NewState = new_state
        a.CurrentInsertionAction = list(current)
        a.CurrentInsertBefore = before
        return a

    st.States = [
        state(5, {4: ia(0, current=["C"])}, ia),
        state(5, {4: ia(0, current=["C"])}, ia),
    ]
    im = ot.InsertionMorph(); im.StateTable = st
    save(fb, wrap([subtable(5, im)]), "morx_ins.ttf")

    # type 2 ligature: f i -> fi, f l -> fl (component stack)
    lig_names = [".notdef", "f", "i", "l", "fi", "fl", "A"]
    fb = base_font(lig_names,
                   {ord(c): c for c in "filA"})
    st = ot.AATStateTable()
    st.GlyphClasses = {"f": 4, "i": 5, "l": 5}

    def la_act(new_state=0, set_comp=False, actions=()):
        a = ot.LigatureMorphAction()
        a.NewState = new_state
        a.SetComponent = set_comp
        a.Actions = list(actions)
        return a

    def la(store, delta):
        x = ot.LigAction(); x.Store = store; x.GlyphIndexDelta = delta
        return x

    st.States = [
        state(6, {4: la_act(2, set_comp=True)}, la_act),
        state(6, {4: la_act(2, set_comp=True)}, la_act),
        state(6, {4: la_act(2, set_comp=True),
                  5: la_act(0, set_comp=True,
                            actions=[la(False, -1), la(True, -1)])},
              la_act),
    ]
    st.LigComponents = [0, 0, 1]
    st.Ligatures = ["fi", "fl"]
    lm = ot.LigatureMorph(); lm.StateTable = st
    save(fb, wrap([subtable(2, lm)]), "morx_lig.ttf")




def make_kerxtest():
    """AAT kerx fixtures (hand-assembled wire bytes; fontTools has no
    kerx writer): format 0 pair list, format 2 class matrix (ARRAY
    INDEX class values, the hb-pinned convention), format 6
    row/column index form, and a two-subtable accumulation font.
    Shaping oracle: hb_shape pen positions (tests/test_kerx.py)."""
    import struct as _s

    from fontTools.ttLib.tables.DefaultTable import DefaultTable

    def base_font():
        names = [".notdef", "A", "V", "W", "o"]
        fb = FontBuilder(1000, isTTF=True)
        fb.setupGlyphOrder(names)
        fb.setupCharacterMap({ord(c): c for c in "AVWo"})
        gl = {}
        for n in names:
            pen = TTGlyphPen(glyphSet={})
            pen.moveTo((0, 0)); pen.lineTo((100, 0))
            pen.lineTo((50, 100)); pen.closePath()
            gl[n] = pen.glyph()
        fb.setupGlyf(gl)
        fb.setupHorizontalMetrics({n: (600, 0) for n in names})
        fb.setupHorizontalHeader(ascent=800, descent=-200)
        fb.setupNameTable({"familyName": "KerxT", "styleName": "R"})
        fb.setupOS2(); fb.setupPost()
        return fb

    def lookup8(first, values):
        b = _s.pack(">HHH", 8, first, len(values)) + b"".join(
            _s.pack(">H", v) for v in values)
        if len(b) % 4:
            b += b"\x00" * (4 - len(b) % 4)
        return b

    def pad4(b):
        return b + b"\x00" * (-len(b) % 4)

    def sub0(pairs, coverage=0x0000):
        body = _s.pack(">IIII", len(pairs), 0, 0, 0)
        for left, right, v in sorted(pairs):
            body += _s.pack(">HHh", left, right, v)
        body = pad4(body)
        return _s.pack(">III", 12 + len(body), coverage, 0) + body

    def sub2(matrix, left_rows, right_cols, coverage=0x0002):
        # matrix: list of rows (incl class-0 row/col); class values
        # are ARRAY INDICES: left = row * n_cols, right = col
        n_cols = len(matrix[0])
        arr = b"".join(_s.pack(">h", v) for row in matrix for v in row)
        left = lookup8(min(left_rows), [
            left_rows[g] * n_cols for g in sorted(left_rows)])
        right = lookup8(min(right_cols), [
            right_cols[g] for g in sorted(right_cols)])
        left_off = 12 + 16
        right_off = left_off + len(left)
        arr_off = right_off + len(right)
        body = _s.pack(">IIII", n_cols * 2, left_off, right_off,
                       arr_off) + left + right + arr
        body = pad4(body)
        return _s.pack(">III", 12 + len(body), coverage, 0) + body

    def sub6(vector, rows, cols, n_cols):
        # rows: gid -> row index (premultiplied by n_cols here)
        rl = lookup8(min(rows), [rows[g] * n_cols
                                 for g in sorted(rows)])
        cl = lookup8(min(cols), [cols[g] for g in sorted(cols)])
        row_off = 12 + 20
        col_off = row_off + len(rl)
        arr_off = col_off + len(cl)
        vec = b"".join(_s.pack(">h", v) for v in vector)
        body = _s.pack(">IHHIII", 0, len(vector) // n_cols, n_cols,
                       row_off, col_off, arr_off) + rl + cl + vec
        body = pad4(body)
        return _s.pack(">III", 12 + len(body), 0x0006, 0) + body

    def save(subs, name):
        fb = base_font()
        tbl = DefaultTable(tag="kerx")
        tbl.data = _s.pack(">HHI", 2, 0, len(subs)) + b"".join(subs)
        fb.font["kerx"] = tbl
        fb.save(os.path.join(HERE, name))
        print("wrote", name)

    # A=1 V=2 W=3 o=4
    save([sub0([(1, 2, -150), (2, 1, -80)])], "kerx_pairs.ttf")
    save([sub2([[0, 0, 0], [0, -150, 25], [0, -60, 0]],
               {1: 1, 2: 2, 3: 2}, {2: 1, 3: 0, 4: 2})],
         "kerx_class.ttf")
    save([sub6([0, 0, 0, -150], {1: 1}, {2: 1}, 2)], "kerx_index.ttf")
    # accumulation: pair list + class matrix both hit (A, V)
    save([sub0([(1, 2, -50)]),
          sub2([[0, 0], [0, -100]], {1: 1}, {2: 1})],
         "kerx_accum.ttf")
    # vertical-coverage subtable must be ignored in horizontal layout
    save([sub0([(1, 2, -150)], coverage=0x80000000)],
         "kerx_vertical.ttf")

    # format 1: contextual state-machine kerning — push A, apply -150
    # (odd-terminated value list) when V follows; offsets relative to
    # the STATE-TABLE start (the hb-pinned convention)
    def sub1():
        n_classes = 6
        classes = lookup8(1, [4, 5])  # A=4, V=5
        PUSH = 0x8000
        entries = [(0, 0, 0xFFFF), (2, PUSH, 0xFFFF), (0, 0, 0)]
        state_rows = [
            [0, 0, 0, 0, 1, 0],
            [0, 0, 0, 0, 1, 0],
            [0, 0, 0, 0, 1, 2],
        ]
        class_off = 20
        state_off = class_off + len(classes)
        states = pad4(b"".join(
            _s.pack(">H", e) for row in state_rows for e in row))
        entry_off = state_off + len(states)
        ents = pad4(b"".join(_s.pack(">HHH", *e) for e in entries))
        value_off = entry_off + len(ents)
        vals = _s.pack(">h", (-150) | 1)
        body = _s.pack(">IIIII", n_classes, class_off, state_off,
                       entry_off, value_off) + classes + states + \
            ents + vals
        body = pad4(body)
        return _s.pack(">III", 12 + len(body), 0x0001, 0) + body

    save([sub1()], "kerx_state.ttf")

    # format 4 + ankr: V's anchor 0 aligns to a preceding A's anchor 0
    # (A anchor at (500, 700), V anchor at (100, 100)) — a pure
    # position offset, the hb-pinned semantics
    def ankr_bytes():
        lut = lookup8(1, [0, 8])
        lookup_off = 12
        glyph_data_off = lookup_off + len(lut)
        gd = _s.pack(">Ihh", 1, 500, 700) + _s.pack(">Ihh", 1, 100, 100)
        return _s.pack(">HHII", 0, 0, lookup_off,
                       glyph_data_off) + lut + gd

    def sub4():
        n_classes = 6
        classes = lookup8(1, [4, 5])
        MARK = 0x8000
        entries = [(0, 0, 0xFFFF), (2, MARK, 0xFFFF), (0, 0, 0)]
        state_rows = [
            [0, 0, 0, 0, 1, 0],
            [0, 0, 0, 0, 1, 0],
            [0, 0, 0, 0, 1, 2],
        ]
        class_off = 20
        st = pad4(b"".join(
            _s.pack(">H", e) for row in state_rows for e in row))
        ents = pad4(b"".join(_s.pack(">HHH", *e) for e in entries))
        state_off = class_off + len(classes)
        entry_off = state_off + len(st)
        cp_off = entry_off + len(ents)
        actions = _s.pack(">HH", 0, 0)  # anchor pair (0, 0)
        flags_word = (1 << 30) | cp_off  # anchor-point action type
        body = _s.pack(">IIIII", n_classes, class_off, state_off,
                       entry_off, flags_word) + classes + st + \
            ents + actions
        body = pad4(body)
        return _s.pack(">III", 12 + len(body), 0x0004, 0) + body

    fb = base_font()
    tbl = DefaultTable(tag="kerx")
    tbl.data = _s.pack(">HHI", 2, 0, 1) + sub4()
    fb.font["kerx"] = tbl
    tbl2 = DefaultTable(tag="ankr")
    tbl2.data = ankr_bytes()
    fb.font["ankr"] = tbl2
    fb.save(os.path.join(HERE, "kerx_anchor.ttf"))
    print("wrote kerx_anchor.ttf")

    # pairs + anchor in ONE table: attachment must compute against
    # the KERNED pens (kern -100 makes V's pen 500; the anchor target
    # is 400, so the offset is -100 — an advances-only pen model
    # would read 600 and misplace by the kern)
    fb = base_font()
    tbl = DefaultTable(tag="kerx")
    tbl.data = _s.pack(">HHI", 2, 0, 2) + \
        sub0([(1, 2, -100)]) + sub4()
    fb.font["kerx"] = tbl
    tbl2 = DefaultTable(tag="ankr")
    tbl2.data = ankr_bytes()
    fb.font["ankr"] = tbl2
    fb.save(os.path.join(HERE, "kerx_mixed.ttf"))
    print("wrote kerx_mixed.ttf")




def make_traktest():
    """AAT trak fixture: default track with two sizes (12pt -> -50,
    24pt -> -100); hb interpolates between and EXTRAPOLATES beyond —
    pinned in tests/test_trak.py."""
    import struct as _s

    from fontTools.ttLib.tables.DefaultTable import DefaultTable

    names = [".notdef", "A", "V"]
    fb = FontBuilder(1000, isTTF=True)
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({ord(c): c for c in "AV"})
    gl = {}
    for n in names:
        pen = TTGlyphPen(glyphSet={})
        pen.moveTo((0, 0)); pen.lineTo((100, 0))
        pen.lineTo((50, 100)); pen.closePath()
        gl[n] = pen.glyph()
    fb.setupGlyf(gl)
    fb.setupHorizontalMetrics({n: (600, 0) for n in names})
    fb.setupHorizontalHeader(ascent=800, descent=-200)
    fb.setupNameTable({"familyName": "TrakT", "styleName": "R"})
    fb.setupOS2(); fb.setupPost()
    n_tracks, n_sizes = 1, 2
    track_data_off = 12
    size_table_off = track_data_off + 8 + n_tracks * 8
    values_off = size_table_off + 4 * n_sizes
    header = _s.pack(">IHHHH", 0x10000, 0, track_data_off, 0, 0)
    td = _s.pack(">HHI", n_tracks, n_sizes, size_table_off)
    tt = _s.pack(">iHH", 0, 0, values_off)
    sizes = _s.pack(">ii", 12 << 16, 24 << 16)
    vals = _s.pack(">hh", -50, -100)
    tbl = DefaultTable(tag="trak")
    tbl.data = header + td + tt + sizes + vals
    fb.font["trak"] = tbl
    fb.save(os.path.join(HERE, "traktest.ttf"))
    print("wrote traktest.ttf")


if __name__ == "__main__":
    make_vartest()
    make_vartest2()
    make_vartest3()
    make_vartest4()
    make_vartest5()
    make_vartest6()
    make_cjktest()
    make_arabictest()
    make_devatest()
    make_indic_corpus()
    make_thaitest()
    make_khmrtest()
    make_mymrtest()
    make_javatest()
    make_balitest()
    make_chamtest()
    make_tibttest()
    make_lanatest()
    make_sundtest()
    make_batktest()
    make_lepctest()
    make_bugitest()
    make_saurtest()
    make_limbtest()
    make_colrtest()
    make_colrv1test()
    make_varcolrtest()
    make_sbixtest()
    make_cbdttest()
    make_svgtest()
    make_ebdttest()
    make_vartest_cff2()
    make_morxtest()
    make_kerxtest()
    make_traktest()
    if os.path.exists(PYGAME_MONO):
        make_cidtest()
