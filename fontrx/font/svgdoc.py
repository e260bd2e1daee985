"""OT-SVG document interpretation: SVG glyph documents lowered onto
the COLR render machinery.

Capability extension (the reference renders monochrome outlines only).
Rather than bolting on a second rasterizer, an SVG glyph document is
*lowered* to the same render-tree form the COLR v1 pipeline consumes
(``fontrx.engine.colorglyphs``): geometry becomes normalized quadratic
outlines (cubics via fontTools' cu2qu, arcs via the endpoint->center
parameterization and 90-degree cubic splitting), and paint becomes the
existing ``("solid", rgba)`` / ``("linear"|"radial", geom, extend,
stops)`` nodes evaluated by the shared gradient-field code — so SVG
gradients and COLR gradients are pixel-identical by construction.
Leaves are ``("outline", Glyph, paint, gradient_affine)``: outlines
pre-transformed into font units, gradients inverse-mapped through
their own accumulated affine (document -> glyph space), exactly like
transformed COLR paints.

Coordinate model (OT-SVG spec): the initial viewport is the em square
(upem x upem), the origin is the glyph origin, and the y-axis points
DOWN — so the document-to-glyph map is y-negation composed with the
root ``viewBox`` mapping (preserveAspectRatio xMidYMid meet).

Supported subset (the shapes OT-SVG fonts actually use): path data
(M/L/H/V/C/S/Q/T/A/Z, absolute + relative), rect (incl. rounded),
circle, ellipse, line, polyline, polygon, g/svg/defs/use structure,
the full transform grammar, solid fills (#hex, rgb()/rgba(), the SVG
named colors, currentColor = text foreground), fill-opacity,
linear/radial gradients (userSpaceOnUse + objectBoundingBox,
gradientTransform, spreadMethod, href chains), fill-rule evenodd
(lowered to nonzero by nesting-depth reorientation — exact for
non-self-intersecting paths), display/visibility, **group opacity**
(exact: the subtree composites offscreen through the engine's
``("alpha", a, node)`` wrapper, so overlapping siblings dim as one
surface), **clip-path** (lowered to Porter-Duff SrcIn against the
clip geometry's coverage — ``("composite", 5, content, clip)``;
userSpaceOnUse + objectBoundingBox units, clipPath/child transforms,
use references; the clip union is exact for non-self-intersecting
children), and **stroke** (stroke-to-outline via
:mod:`fontrx.font.stroke`: butt/round/square caps, miter/round/bevel
joins with miterlimit, dasharray/dashoffset, solid + gradient stroke
paints), and **mask** (luminance x alpha of the mask render scales
the content — the engine's ``("mask", content, mask)`` node with CSS
masking / Rec.709 coefficients; maskContentUnits=userSpaceOnUse, the
region clip unapplied), and **filter** (raster-space primitive
pipeline on the composited tile — feGaussianBlur per the spec's
three-box approximation, feOffset, feFlood, feMerge, feComposite
(all operators incl. arithmetic), feBlend (SVG 1.1 modes),
feColorMatrix (matrix/saturate/hueRotate/luminanceToAlpha),
feDropShadow, feMorphology (erode/dilate, separable rect windows),
feConvolveMatrix (all edgeModes, preserveAlpha, spec 180-degree
kernel orientation; kernelUnitLength rejected), feTile (the input
primitive's explicit subregion replicated) — with
SourceGraphic/SourceAlpha/named results and the filter-region hard
clip; a filter using any other primitive or input
(feTurbulence/feDisplacementMap/feImage and the BackgroundImage
family are documented out) warns once and renders UNFILTERED;
per-primitive subregions are not applied except as feTile inputs).
Documented remaining gaps: self-intersecting evenodd paths and
self-intersecting clip children keep the nesting-depth
approximation.
"""

from __future__ import annotations

import math
import re
import xml.etree.ElementTree as ET

import numpy as np

from fontrx.font.glyph import Box, Contour, Glyph, _normalize_contour
from fontrx.utils.log import get_logger

log = get_logger("SvgDoc")

# affine = (xx, yx, xy, yy, dx, dy):  X = xx*x + xy*y + dx,
#                                     Y = yx*x + yy*y + dy
IDENTITY = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def affine_mul(a, b):
    """a ∘ b (apply b first)."""
    axx, ayx, axy, ayy, adx, ady = a
    bxx, byx, bxy, byy, bdx, bdy = b
    return (
        axx * bxx + axy * byx,
        ayx * bxx + ayy * byx,
        axx * bxy + axy * byy,
        ayx * bxy + ayy * byy,
        axx * bdx + axy * bdy + adx,
        ayx * bdx + ayy * bdy + ady,
    )


def affine_apply(t, x, y):
    xx, yx, xy, yy, dx, dy = t
    return xx * x + xy * y + dx, yx * x + yy * y + dy


_NUM = re.compile(
    r"[-+]?(?:\d*\.\d+|\d+\.?)(?:[eE][-+]?\d+)?")


def _floats(s: str) -> list[float]:
    return [float(m) for m in _NUM.findall(s or "")]


def _safe_float(v, default=1.0) -> float:
    try:
        return float(v)
    except (TypeError, ValueError):
        return default


def parse_transform(s: str):
    """Parse an SVG transform list into one affine."""
    t = IDENTITY
    for m in re.finditer(r"(\w+)\s*\(([^)]*)\)", s or ""):
        op, args = m.group(1), _floats(m.group(2))
        if op == "matrix" and len(args) == 6:
            a, b, c, d, e, f = args
            g = (a, b, c, d, e, f)
        elif op == "translate" and args:
            tx = args[0]
            ty = args[1] if len(args) > 1 else 0.0
            g = (1.0, 0.0, 0.0, 1.0, tx, ty)
        elif op == "scale" and args:
            sx = args[0]
            sy = args[1] if len(args) > 1 else sx
            g = (sx, 0.0, 0.0, sy, 0.0, 0.0)
        elif op == "rotate" and args:
            a = math.radians(args[0])
            ca, sa = math.cos(a), math.sin(a)
            g = (ca, sa, -sa, ca, 0.0, 0.0)
            if len(args) > 2:
                cx, cy = args[1], args[2]
                g = affine_mul(
                    affine_mul((1, 0, 0, 1, cx, cy), g),
                    (1, 0, 0, 1, -cx, -cy))
        elif op == "skewX" and args:
            g = (1.0, 0.0, math.tan(math.radians(args[0])), 1.0, 0, 0)
        elif op == "skewY" and args:
            g = (1.0, math.tan(math.radians(args[0])), 0.0, 1.0, 0, 0)
        else:
            continue
        t = affine_mul(t, g)
    return t


# ---------------------------------------------------------------------------
# colors

_NAMED = {
    # CSS/SVG 1.1 color keywords (W3C recommendation, public mapping)
    "aliceblue": 0xF0F8FF, "antiquewhite": 0xFAEBD7, "aqua": 0x00FFFF,
    "aquamarine": 0x7FFFD4, "azure": 0xF0FFFF, "beige": 0xF5F5DC,
    "bisque": 0xFFE4C4, "black": 0x000000, "blanchedalmond": 0xFFEBCD,
    "blue": 0x0000FF, "blueviolet": 0x8A2BE2, "brown": 0xA52A2A,
    "burlywood": 0xDEB887, "cadetblue": 0x5F9EA0, "chartreuse": 0x7FFF00,
    "chocolate": 0xD2691E, "coral": 0xFF7F50,
    "cornflowerblue": 0x6495ED, "cornsilk": 0xFFF8DC,
    "crimson": 0xDC143C, "cyan": 0x00FFFF, "darkblue": 0x00008B,
    "darkcyan": 0x008B8B, "darkgoldenrod": 0xB8860B,
    "darkgray": 0xA9A9A9, "darkgreen": 0x006400, "darkgrey": 0xA9A9A9,
    "darkkhaki": 0xBDB76B, "darkmagenta": 0x8B008B,
    "darkolivegreen": 0x556B2F, "darkorange": 0xFF8C00,
    "darkorchid": 0x9932CC, "darkred": 0x8B0000, "darksalmon": 0xE9967A,
    "darkseagreen": 0x8FBC8F, "darkslateblue": 0x483D8B,
    "darkslategray": 0x2F4F4F, "darkslategrey": 0x2F4F4F,
    "darkturquoise": 0x00CED1, "darkviolet": 0x9400D3,
    "deeppink": 0xFF1493, "deepskyblue": 0x00BFFF, "dimgray": 0x696969,
    "dimgrey": 0x696969, "dodgerblue": 0x1E90FF, "firebrick": 0xB22222,
    "floralwhite": 0xFFFAF0, "forestgreen": 0x228B22,
    "fuchsia": 0xFF00FF, "gainsboro": 0xDCDCDC, "ghostwhite": 0xF8F8FF,
    "gold": 0xFFD700, "goldenrod": 0xDAA520, "gray": 0x808080,
    "green": 0x008000, "greenyellow": 0xADFF2F, "grey": 0x808080,
    "honeydew": 0xF0FFF0, "hotpink": 0xFF69B4, "indianred": 0xCD5C5C,
    "indigo": 0x4B0082, "ivory": 0xFFFFF0, "khaki": 0xF0E68C,
    "lavender": 0xE6E6FA, "lavenderblush": 0xFFF0F5,
    "lawngreen": 0x7CFC00, "lemonchiffon": 0xFFFACD,
    "lightblue": 0xADD8E6, "lightcoral": 0xF08080,
    "lightcyan": 0xE0FFFF, "lightgoldenrodyellow": 0xFAFAD2,
    "lightgray": 0xD3D3D3, "lightgreen": 0x90EE90,
    "lightgrey": 0xD3D3D3, "lightpink": 0xFFB6C1,
    "lightsalmon": 0xFFA07A, "lightseagreen": 0x20B2AA,
    "lightskyblue": 0x87CEFA, "lightslategray": 0x778899,
    "lightslategrey": 0x778899, "lightsteelblue": 0xB0C4DE,
    "lightyellow": 0xFFFFE0, "lime": 0x00FF00, "limegreen": 0x32CD32,
    "linen": 0xFAF0E6, "magenta": 0xFF00FF, "maroon": 0x800000,
    "mediumaquamarine": 0x66CDAA, "mediumblue": 0x0000CD,
    "mediumorchid": 0xBA55D3, "mediumpurple": 0x9370DB,
    "mediumseagreen": 0x3CB371, "mediumslateblue": 0x7B68EE,
    "mediumspringgreen": 0x00FA9A, "mediumturquoise": 0x48D1CC,
    "mediumvioletred": 0xC71585, "midnightblue": 0x191970,
    "mintcream": 0xF5FFFA, "mistyrose": 0xFFE4E1, "moccasin": 0xFFE4B5,
    "navajowhite": 0xFFDEAD, "navy": 0x000080, "oldlace": 0xFDF5E6,
    "olive": 0x808000, "olivedrab": 0x6B8E23, "orange": 0xFFA500,
    "orangered": 0xFF4500, "orchid": 0xDA70D6,
    "palegoldenrod": 0xEEE8AA, "palegreen": 0x98FB98,
    "paleturquoise": 0xAFEEEE, "palevioletred": 0xDB7093,
    "papayawhip": 0xFFEFD5, "peachpuff": 0xFFDAB9, "peru": 0xCD853F,
    "pink": 0xFFC0CB, "plum": 0xDDA0DD, "powderblue": 0xB0E0E6,
    "purple": 0x800080, "red": 0xFF0000, "rosybrown": 0xBC8F8F,
    "royalblue": 0x4169E1, "saddlebrown": 0x8B4513, "salmon": 0xFA8072,
    "sandybrown": 0xF4A460, "seagreen": 0x2E8B57, "seashell": 0xFFF5EE,
    "sienna": 0xA0522D, "silver": 0xC0C0C0, "skyblue": 0x87CEEB,
    "slateblue": 0x6A5ACD, "slategray": 0x708090,
    "slategrey": 0x708090, "snow": 0xFFFAFA, "springgreen": 0x00FF7F,
    "steelblue": 0x4682B4, "tan": 0xD2B48C, "teal": 0x008080,
    "thistle": 0xD8BFD8, "tomato": 0xFF6347, "turquoise": 0x40E0D0,
    "violet": 0xEE82EE, "wheat": 0xF5DEB3, "white": 0xFFFFFF,
    "whitesmoke": 0xF5F5F5, "yellow": 0xFFFF00,
    "yellowgreen": 0x9ACD32,
}


def parse_color(s: str, foreground):
    """CSS color -> (r, g, b, a) or None for 'none'."""
    s = (s or "").strip()
    low = s.lower()
    if low in ("none", ""):
        return None
    if low == "currentcolor":
        return tuple(foreground)
    if s.startswith("#"):
        h = s[1:]
        if len(h) == 3:
            h = "".join(c * 2 for c in h)
        if len(h) == 4:
            h = "".join(c * 2 for c in h)
        if len(h) == 6:
            h += "FF"
        if len(h) == 8:
            try:
                v = int(h, 16)
            except ValueError:
                return (0, 0, 0, 255)
            return (v >> 24 & 255, v >> 16 & 255, v >> 8 & 255, v & 255)
        return (0, 0, 0, 255)
    m = re.match(r"rgba?\(([^)]*)\)", low)
    if m:
        parts = [p.strip() for p in m.group(1).split(",")]
        vals = []
        for i, p in enumerate(parts[:3]):
            if p.endswith("%"):
                vals.append(round(float(p[:-1]) * 255.0 / 100.0))
            else:
                vals.append(round(float(p)))
        a = 255
        if len(parts) > 3:
            a = round(float(parts[3]) * 255.0)
        v = [max(0, min(255, int(x))) for x in vals + [a]]
        return tuple(v)
    if low in _NAMED:
        v = _NAMED[low]
        return (v >> 16 & 255, v >> 8 & 255, v & 255, 255)
    return (0, 0, 0, 255)


# ---------------------------------------------------------------------------
# path geometry -> quadratic point chains

def _arc_to_cubics(p0, rx, ry, rot_deg, large, sweep, p1):
    """SVG elliptical arc -> cubic segments (endpoint -> center
    parameterization, spec appendix F.6.5, split at <= 90 degrees)."""
    x0, y0 = p0
    x1, y1 = p1
    if (x0, y0) == (x1, y1):
        return []
    rx, ry = abs(rx), abs(ry)
    if rx == 0 or ry == 0:
        return [(p0, p0, p1, p1)]  # degenerate: straight line
    phi = math.radians(rot_deg)
    cp, sp = math.cos(phi), math.sin(phi)
    hx, hy = (x0 - x1) / 2.0, (y0 - y1) / 2.0
    xp = cp * hx + sp * hy
    yp = -sp * hx + cp * hy
    lam = xp * xp / (rx * rx) + yp * yp / (ry * ry)
    if lam > 1.0:
        s = math.sqrt(lam)
        rx *= s
        ry *= s
    num = (rx * rx * ry * ry - rx * rx * yp * yp - ry * ry * xp * xp)
    den = rx * rx * yp * yp + ry * ry * xp * xp
    co = math.sqrt(max(num / den, 0.0)) if den else 0.0
    if large == sweep:
        co = -co
    cxp = co * rx * yp / ry
    cyp = -co * ry * xp / rx
    cx = cp * cxp - sp * cyp + (x0 + x1) / 2.0
    cy = sp * cxp + cp * cyp + (y0 + y1) / 2.0

    def angle(ux, uy, vx, vy):
        d = math.hypot(ux, uy) * math.hypot(vx, vy)
        if d == 0:
            return 0.0
        c = max(-1.0, min(1.0, (ux * vx + uy * vy) / d))
        a = math.acos(c)
        return -a if ux * vy - uy * vx < 0 else a

    th1 = angle(1.0, 0.0, (xp - cxp) / rx, (yp - cyp) / ry)
    dth = angle((xp - cxp) / rx, (yp - cyp) / ry,
                (-xp - cxp) / rx, (-yp - cyp) / ry)
    if not sweep and dth > 0:
        dth -= 2.0 * math.pi
    elif sweep and dth < 0:
        dth += 2.0 * math.pi
    n = max(int(math.ceil(abs(dth) / (math.pi / 2.0))), 1)
    delta = dth / n
    # cubic approximation constant for one arc slice
    k = 4.0 / 3.0 * math.tan(delta / 4.0)
    out = []
    t = th1
    for _ in range(n):
        c1_, s1_ = math.cos(t), math.sin(t)
        c2_, s2_ = math.cos(t + delta), math.sin(t + delta)

        def pt(cq, sq):
            x = cx + rx * cq * cp - ry * sq * sp
            y = cy + rx * cq * sp + ry * sq * cp
            return (x, y)

        def dpt(cq, sq):
            dx = -rx * sq * cp - ry * cq * sp
            dy = -rx * sq * sp + ry * cq * cp
            return (dx, dy)

        a0 = pt(c1_, s1_)
        a1 = pt(c2_, s2_)
        d0 = dpt(c1_, s1_)
        d1 = dpt(c2_, s2_)
        out.append((
            a0,
            (a0[0] + k * d0[0], a0[1] + k * d0[1]),
            (a1[0] - k * d1[0], a1[1] - k * d1[1]),
            a1,
        ))
        t += delta
    # snap the chain ends to the exact given endpoints (trig eps)
    out[0] = (p0, out[0][1], out[0][2], out[0][3])
    out[-1] = (out[-1][0], out[-1][1], out[-1][2], p1)
    return out


class _PathBuilder:
    """Accumulates subpaths as (on, off, on, ...) quadratic chains in
    local coordinates.  Cubics are converted with cu2qu at emit time
    (after the full transform), so the error tolerance is in font
    units regardless of the document's scale."""

    def __init__(self):
        self.subpaths = []   # list of list[("pt"|"cub", ...)]
        self._cur = None
        self._start = None

    def move_to(self, p):
        self.close_implicit()
        self._cur = [("pt", p, True)]
        self._start = p

    def line_to(self, p):
        if self._cur is None:
            self.move_to(p)
            return
        self._cur.append(("pt", p, True))

    def quad_to(self, c, p):
        if self._cur is None:
            self.move_to(p)
            return
        self._cur.append(("pt", c, False))
        self._cur.append(("pt", p, True))

    def cubic_to(self, c1, c2, p):
        if self._cur is None:
            self.move_to(p)
            return
        self._cur.append(("cub", c1, c2, p))

    def arc_to(self, p0, rx, ry, rot, large, sweep, p1):
        for (a0, c1, c2, a1) in _arc_to_cubics(
                p0, rx, ry, rot, large, sweep, p1):
            self.cubic_to(c1, c2, a1)

    def close(self):
        # Z: the closing line is implicit in the contour wrap for
        # FILLS; a trailing sentinel records the explicit close for
        # the stroker (closed subpaths stroke without caps)
        if self._cur is not None and len(self._cur) > 1:
            self._cur.append(("close",))
        self.close_implicit()

    def close_implicit(self):
        if self._cur is not None and len(self._cur) > 1:
            self.subpaths.append(self._cur)
        self._cur = None

    def finish(self):
        self.close_implicit()
        return self.subpaths


def parse_path_data(d: str) -> "list[list]":
    """SVG path data -> subpath chains (a fresh _PathBuilder's
    output).  Unknown/garbled trailing data stops the parse (the
    SVG error-handling rule: render what precedes the error)."""
    b = _PathBuilder()
    tokens = re.findall(r"[MmLlHhVvCcSsQqTtAaZz]|" + _NUM.pattern, d or "")
    i = 0
    cmd = None
    cur = (0.0, 0.0)
    last_ctrl = None  # (kind, point) for S/T reflection
    start = (0.0, 0.0)

    def take(n):
        nonlocal i
        if i + n > len(tokens):
            raise StopIteration
        vals = [float(t) for t in tokens[i : i + n]]
        i += n
        return vals

    try:
        while i < len(tokens):
            t = tokens[i]
            if t.isalpha():
                cmd = t
                i += 1
                if cmd in "Zz":
                    b.close()
                    cur = start
                    last_ctrl = None
                    continue
            if cmd is None:
                break
            rel = cmd.islower()
            c = cmd.upper()
            ox, oy = cur if rel else (0.0, 0.0)
            if c == "M":
                x, y = take(2)
                cur = (x + ox, y + oy)
                b.move_to(cur)
                start = cur
                cmd = "l" if rel else "L"
                last_ctrl = None
            elif c == "L":
                x, y = take(2)
                cur = (x + ox, y + oy)
                b.line_to(cur)
                last_ctrl = None
            elif c == "H":
                (x,) = take(1)
                cur = (x + ox, cur[1])
                b.line_to(cur)
                last_ctrl = None
            elif c == "V":
                (y,) = take(1)
                cur = (cur[0], y + oy)
                b.line_to(cur)
                last_ctrl = None
            elif c == "C":
                x1, y1, x2, y2, x, y = take(6)
                c1 = (x1 + ox, y1 + oy)
                c2 = (x2 + ox, y2 + oy)
                cur2 = (x + ox, y + oy)
                b.cubic_to(c1, c2, cur2)
                last_ctrl = ("C", c2)
                cur = cur2
            elif c == "S":
                x2, y2, x, y = take(4)
                if last_ctrl and last_ctrl[0] == "C":
                    px, py = last_ctrl[1]
                    c1 = (2 * cur[0] - px, 2 * cur[1] - py)
                else:
                    c1 = cur
                c2 = (x2 + ox, y2 + oy)
                cur2 = (x + ox, y + oy)
                b.cubic_to(c1, c2, cur2)
                last_ctrl = ("C", c2)
                cur = cur2
            elif c == "Q":
                x1, y1, x, y = take(4)
                cq = (x1 + ox, y1 + oy)
                cur2 = (x + ox, y + oy)
                b.quad_to(cq, cur2)
                last_ctrl = ("Q", cq)
                cur = cur2
            elif c == "T":
                x, y = take(2)
                if last_ctrl and last_ctrl[0] == "Q":
                    px, py = last_ctrl[1]
                    cq = (2 * cur[0] - px, 2 * cur[1] - py)
                else:
                    cq = cur
                cur2 = (x + ox, y + oy)
                b.quad_to(cq, cur2)
                last_ctrl = ("Q", cq)
                cur = cur2
            elif c == "A":
                rx, ry, rot, large, sweep, x, y = take(7)
                cur2 = (x + ox, y + oy)
                b.arc_to(cur, rx, ry, rot, bool(large), bool(sweep),
                         cur2)
                last_ctrl = None
                cur = cur2
            else:
                break
    except (StopIteration, ValueError):
        pass
    return b.finish()


def _shape_subpaths(el) -> "list[list]":
    """rect/circle/ellipse/line/polyline/polygon -> subpath chains."""
    tag = el.tag.split("}")[-1]
    b = _PathBuilder()

    def attr(name, default=0.0):
        try:
            return float(el.get(name, default))
        except (TypeError, ValueError):
            return default

    if tag == "rect":
        x, y = attr("x"), attr("y")
        w, h = attr("width"), attr("height")
        if w <= 0 or h <= 0:
            return []
        rx = el.get("rx")
        ry = el.get("ry")
        rx = float(rx) if rx is not None else (
            float(ry) if ry is not None else 0.0)
        ry = float(ry) if ry is not None else rx
        rx = min(max(rx, 0.0), w / 2.0)
        ry = min(max(ry, 0.0), h / 2.0)
        if rx == 0 or ry == 0:
            b.move_to((x, y))
            b.line_to((x + w, y))
            b.line_to((x + w, y + h))
            b.line_to((x, y + h))
            b.close()
        else:
            b.move_to((x + rx, y))
            b.line_to((x + w - rx, y))
            b.arc_to((x + w - rx, y), rx, ry, 0, False, True,
                     (x + w, y + ry))
            b.line_to((x + w, y + h - ry))
            b.arc_to((x + w, y + h - ry), rx, ry, 0, False, True,
                     (x + w - rx, y + h))
            b.line_to((x + rx, y + h))
            b.arc_to((x + rx, y + h), rx, ry, 0, False, True,
                     (x, y + h - ry))
            b.line_to((x, y + ry))
            b.arc_to((x, y + ry), rx, ry, 0, False, True, (x + rx, y))
            b.close()
    elif tag in ("circle", "ellipse"):
        cx, cy = attr("cx"), attr("cy")
        if tag == "circle":
            rx = ry = attr("r")
        else:
            rx, ry = attr("rx"), attr("ry")
        if rx <= 0 or ry <= 0:
            return []
        b.move_to((cx + rx, cy))
        b.arc_to((cx + rx, cy), rx, ry, 0, False, True, (cx - rx, cy))
        b.arc_to((cx - rx, cy), rx, ry, 0, False, True, (cx + rx, cy))
        b.close()
    elif tag == "line":
        b.move_to((attr("x1"), attr("y1")))
        b.line_to((attr("x2"), attr("y2")))
    elif tag in ("polyline", "polygon"):
        pts = _floats(el.get("points", ""))
        if len(pts) >= 4:
            b.move_to((pts[0], pts[1]))
            for k in range(2, len(pts) - 1, 2):
                b.line_to((pts[k], pts[k + 1]))
            if tag == "polygon":
                b.close()
    return b.finish()


# ---------------------------------------------------------------------------
# chains -> normalized quadratic contours (font units)

def _chain_to_points(chain, xf, tol: float):
    """One subpath chain -> (points float [n,2], on_curve bool [n]) in
    glyph space (the final y-flip lives inside ``xf``)."""
    from fontTools.cu2qu import curve_to_quadratic

    pts: list[tuple[float, float]] = []
    on: list[bool] = []

    def push(p, is_on):
        pts.append(affine_apply(xf, p[0], p[1]))
        on.append(is_on)

    for item in chain:
        if item[0] == "close":
            continue
        if item[0] == "pt":
            _, p, is_on = item
            push(p, is_on)
        else:
            _, c1, c2, p1 = item
            # chains always open with a move-to point, so pts[-1] is
            # the transformed current point; transforming BEFORE cu2qu
            # keeps the tolerance in font units at any document scale
            q = curve_to_quadratic(
                [pts[-1],
                 affine_apply(xf, *c1), affine_apply(xf, *c2),
                 affine_apply(xf, *p1)], tol)
            # quadratic spline: q[0]=start, q[1:-1]=controls,
            # q[-1]=end; implied on-points at control midpoints
            ctrls = q[1:-1]
            for k, cpt in enumerate(ctrls):
                pts.append(cpt)
                on.append(False)
                if k < len(ctrls) - 1:
                    nxt = ctrls[k + 1]
                    pts.append(((cpt[0] + nxt[0]) / 2.0,
                                (cpt[1] + nxt[1]) / 2.0))
                    on.append(True)
            pts.append(q[-1])
            on.append(True)
    # drop an explicit closing point that duplicates the start
    if len(pts) > 1 and abs(pts[0][0] - pts[-1][0]) < 1e-3 \
            and abs(pts[0][1] - pts[-1][1]) < 1e-3:
        pts.pop()
        on.pop()
    return np.asarray(pts, np.float64), np.asarray(on, bool)


def _signed_area(points: np.ndarray) -> float:
    x, y = points[:, 0], points[:, 1]
    return 0.5 * float(
        np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def _point_in_poly(px, py, poly: np.ndarray) -> bool:
    """Even-odd point-in-polygon on the flattened point chain."""
    x, y = poly[:, 0], poly[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    cond = (y > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xs = x + (py - y) / (y2 - y) * (x2 - x)
    return bool(np.count_nonzero(cond & (px < xs)) % 2)


def _orient_for_evenodd(chains):
    """Reorient contours so nonzero fill == evenodd fill: nesting
    depth even -> keep CCW, odd -> CW.  Exact for non-self-
    intersecting paths (the practical SVG corpus); self-intersecting
    evenodd paths are out of scope, documented."""
    polys = [c[0] for c in chains]
    out = []
    for i, (pts, on) in enumerate(chains):
        # nesting depth of a VERTEX of this contour in the others (a
        # centroid can fall inside a child hole and over-count)
        sx, sy = float(pts[0, 0]), float(pts[0, 1])
        depth = sum(
            1 for j, p in enumerate(polys)
            if j != i and _point_in_poly(sx, sy, p))
        area = _signed_area(pts)
        want_ccw = depth % 2 == 0
        if (area > 0) != want_ccw:
            pts = pts[::-1].copy()
            on = on[::-1].copy()
        out.append((pts, on))
    return out


def _resolve_chains(chains, xf, fill_rule="nonzero", tol: float = 0.5):
    """Subpath chains -> oriented ``(points, on)`` contour pairs in
    glyph space (evenodd chains reoriented by nesting depth)."""
    resolved = []
    for chain in chains:
        pts, on = _chain_to_points(chain, xf, tol)
        if len(pts) < 3:
            continue
        resolved.append((pts, on))
    if resolved and fill_rule == "evenodd":
        resolved = _orient_for_evenodd(resolved)
    return resolved


def _contours_to_glyph(resolved) -> Glyph | None:
    """Oriented contour pairs -> a normalized quadratic
    :class:`Glyph` (integer font units)."""
    if not resolved:
        return None
    contours = []
    for pts, on in resolved:
        ipts = np.round(pts).astype(np.int32)
        # rounding can collapse tiny contours; normalize handles them
        contours.append(Contour(_normalize_contour(ipts, on)))
    allpts = np.concatenate([c.points for c in contours])
    box = Box(int(allpts[:, 0].min()), int(allpts[:, 1].min()),
              int(allpts[:, 0].max()), int(allpts[:, 1].max()))
    return Glyph(box, tuple(contours))


def chains_to_glyph(chains, xf, *, fill_rule="nonzero",
                    tol: float = 0.5) -> Glyph | None:
    """Subpath chains (local coords) -> a normalized quadratic
    :class:`Glyph` in font units (``xf`` = local -> glyph affine)."""
    return _contours_to_glyph(_resolve_chains(chains, xf, fill_rule, tol))


def _chains_bbox(chains):
    """Control-point bounds of subpath chains in LOCAL coordinates
    (the SVG object bounding box, conservatively including off-curve
    controls), or None when empty."""
    xs: list[float] = []
    ys: list[float] = []
    for ch in chains:
        for it in ch:
            if it[0] == "pt":
                pts = (it[1],)
            elif it[0] == "cub":
                pts = (it[1], it[2], it[3])
            else:
                continue
            for p in pts:
                xs.append(p[0])
                ys.append(p[1])
    if not xs:
        return None
    return (min(xs), min(ys), max(xs), max(ys))


# ---------------------------------------------------------------------------
# document walk

def _local(tag: str) -> str:
    return tag.split("}")[-1]


def _style_of(el) -> dict:
    st = {}
    for k, v in el.attrib.items():
        st[_local(k)] = v
    for decl in (el.get("style") or "").split(";"):
        if ":" in decl:
            k, v = decl.split(":", 1)
            st[k.strip()] = v.strip()
    return st


# CSS properties that inherit through the document tree (paint +
# stroke geometry properties; `opacity` and `clip-path` do NOT
# inherit — they are per-element effects handled by _finish)
_INHERITED = (
    "fill", "fill-opacity", "fill-rule", "color",
    "stroke", "stroke-width", "stroke-opacity", "stroke-linecap",
    "stroke-linejoin", "stroke-miterlimit", "stroke-dasharray",
    "stroke-dashoffset", "paint-order",
)


def _href(el) -> str | None:
    for k in ("{http://www.w3.org/1999/xlink}href", "href"):
        v = el.get(k)
        if v:
            return v.lstrip()
    return None


class SvgDocument:
    """One parsed OT-SVG document; renders glyph elements to COLR-
    style layer trees."""

    def __init__(self, data: bytes, upem: int):
        self.upem = upem
        try:
            self.root = ET.fromstring(data)
        except ET.ParseError as e:
            raise ValueError(f"SVG parse error: {e}") from e
        self.ids: dict[str, ET.Element] = {}
        self.parents: dict[ET.Element, ET.Element] = {}
        for parent in self.root.iter():
            for child in parent:
                self.parents[child] = parent
        for el in self.root.iter():
            i = el.get("id")
            if i and i not in self.ids:
                self.ids[i] = el
        self._warned: set[str] = set()

    # -- root viewport ------------------------------------------------

    def root_transform(self):
        """document -> glyph space: viewBox (xMidYMid meet) onto the
        upem viewport, then the OT-SVG y-flip."""
        upem = float(self.upem)
        t = (1.0, 0.0, 0.0, -1.0, 0.0, 0.0)  # y-down doc -> y-up glyph
        vb = _floats(self.root.get("viewBox", ""))
        if len(vb) == 4 and vb[2] > 0 and vb[3] > 0:
            minx, miny, w, h = vb
            s = min(upem / w, upem / h)
            dx = (upem - w * s) / 2.0 - minx * s
            dy = (upem - h * s) / 2.0 - miny * s
            t = affine_mul(t, (s, 0.0, 0.0, s, dx, dy))
        return t

    def _warn_once(self, what: str):
        if what not in self._warned:
            self._warned.add(what)
            log.info("SVG %s is not supported; ignoring", what)

    # -- gradients ----------------------------------------------------

    def _gradient_chain(self, el):
        """Resolve href inheritance: returns (attrs, stops_parent)."""
        attrs: dict = {}
        stops_el = None
        seen = set()
        cur = el
        while cur is not None and id(cur) not in seen:
            seen.add(id(cur))
            for k, v in cur.attrib.items():
                attrs.setdefault(_local(k), v)
            if stops_el is None and any(
                    _local(c.tag) == "stop" for c in cur):
                stops_el = cur
            ref = _href(cur)
            cur = self.ids.get(ref[1:]) if ref and \
                ref.startswith("#") else None
        return attrs, stops_el

    def _gradient_paint(self, el, bbox, foreground, opacity):
        """linearGradient/radialGradient -> (paint, xf) in the COLR
        node forms, or None (no stops)."""
        attrs, stops_el = self._gradient_chain(el)
        stops = []
        if stops_el is not None:
            for c in stops_el:
                if _local(c.tag) != "stop":
                    continue
                st = _style_of(c)
                off = (st.get("offset") or "0").strip()
                off = (_safe_float(off[:-1], 0.0) / 100.0 if off.endswith("%")
                       else _safe_float(off, 0.0))
                col = parse_color(st.get("stop-color", "black"),
                                  foreground)
                if col is None:
                    col = (0, 0, 0, 255)
                a = _safe_float(st.get("stop-opacity", 1.0))
                col = col[:3] + (
                    max(0, min(255, round(col[3] * a * opacity))),)
                stops.append((max(0.0, min(1.0, off)), col))
        if not stops:
            return None
        stops.sort(key=lambda s: s[0])
        units = attrs.get("gradientUnits", "objectBoundingBox")
        gt = parse_transform(attrs.get("gradientTransform", ""))
        if units == "objectBoundingBox":
            x0, y0, x1, y1 = bbox
            bmap = (x1 - x0, 0.0, 0.0, y1 - y0, x0, y0)
            gt = affine_mul(bmap, gt)
        spread = {"repeat": 1, "reflect": 2}.get(
            attrs.get("spreadMethod", "pad"), 0)  # COLR 0 = pad
        # percentage lengths resolve against the unit square under
        # objectBoundingBox and against the viewport under
        # userSpaceOnUse (width for x, height for y, the normalized
        # diagonal for r — SVG 1.1 7.10)
        if units == "objectBoundingBox":
            vw = vh = vd = 1.0
        else:
            vb = _floats(self.root.get("viewBox", ""))
            vw = vb[2] if len(vb) == 4 and vb[2] > 0 else float(self.upem)
            vh = vb[3] if len(vb) == 4 and vb[3] > 0 else float(self.upem)
            vd = math.hypot(vw, vh) / math.sqrt(2.0)

        def cv(name, default, ref):
            v = (attrs.get(name) or default).strip()
            if v.endswith("%"):
                return float(v[:-1]) / 100.0 * ref
            return float(v)

        if _local(el.tag) == "linearGradient":
            p0 = (cv("x1", "0%", vw), cv("y1", "0%", vh))
            p1 = (cv("x2", "100%", vw), cv("y2", "0%", vh))
            dx, dy = p1[0] - p0[0], p1[1] - p0[1]
            # COLR p2 = rotation point; perpendicular keeps the color
            # line orthogonal to p0->p1 (plain SVG semantics)
            p2 = (p0[0] - dy, p0[1] + dx)
            geom = (p0[0], p0[1], p1[0], p1[1], p2[0], p2[1])
            return ("linear", geom, spread, stops), gt
        # radial: the SVG focal form IS the COLR two-circle form
        cx = cv("cx", "50%", vw)
        cy = cv("cy", "50%", vh)
        r = cv("r", "50%", vd)
        fx = cv("fx", str(cx), vw)
        fy = cv("fy", str(cy), vh)
        fr = cv("fr", "0", vd)
        geom = (fx, fy, fr, cx, cy, r)
        return ("radial", geom, spread, stops), gt

    # -- walk ---------------------------------------------------------

    def glyph_tree(self, gid: int, foreground=(0, 0, 0, 255)):
        """Render tree for glyph ``gid``: ``("layers", [node, ...])``
        or None (no such element / no visible geometry / clipped
        away).  Nodes are the COLR render-tree forms plus the
        engine's ``("alpha", a, node)`` wrapper (exact group opacity)
        and ``("composite", 5, node, clip_node)`` (clip-path lowered
        to Porter-Duff SrcIn)."""
        el = self.ids.get(f"glyph{gid}")
        if el is None:
            return None
        # inherited context from ancestors (transforms compose;
        # paint properties inherit; each ancestor's opacity and
        # clip-path wrap the whole subtree — both are exact here
        # because the glyph element is a single node)
        chain = [el]
        cur = el
        while cur in self.parents:
            cur = self.parents[cur]
            chain.append(cur)
        xf = self.root_transform()
        style: dict = {"fill": "black", "fill-opacity": "1",
                       "fill-rule": "nonzero"}
        opacity = 1.0
        clip_nodes: list = []
        mask_nodes: list = []
        filter_nodes: list = []
        for anc in reversed(chain[1:]):
            st = _style_of(anc)
            xf = affine_mul(xf, parse_transform(st.get("transform", "")))
            for k in _INHERITED:
                if k in st:
                    style[k] = st[k]
            opacity *= _safe_float(st.get("opacity", 1.0))
            fn = self._resolve_filter(st.get("filter"), xf, anc,
                                      foreground)
            if fn is not None:
                filter_nodes.append(fn)
            cn = self._resolve_clip(st.get("clip-path"), xf, anc)
            if cn == "empty":
                return None
            if cn is not None:
                clip_nodes.append(cn)
            mn = self._resolve_mask(st.get("mask"), xf, style,
                                    foreground, 0)
            if mn == "empty":
                return None
            if mn is not None:
                mask_nodes.append(mn)
        nodes: list = []
        self._emit(el, xf, style, foreground, nodes)
        if not nodes:
            return None
        node = nodes[0] if len(nodes) == 1 else ("layers", nodes)
        for fn in filter_nodes:
            node = ("filter", fn[1], fn[2], node)
        for cn in clip_nodes:
            node = ("composite", 5, node, cn)
        for mn in mask_nodes:
            node = ("mask", node, mn)
        if opacity < 1.0:
            node = ("alpha", opacity, node)
        if node[0] == "layers":
            return node
        return ("layers", [node])

    @staticmethod
    def _finish(out, nodes, opacity, clip, mask=None, filt=None):
        """Wrap an element's rendered nodes with its filter, clip-path
        (SrcIn against the clip geometry's coverage), mask (luminance
        x alpha of the mask render) and group opacity (exact:
        offscreen-composited via the ``alpha`` node) — the spec's
        group-effect order: filter first, opacity last (opacity
        commutes with clip/mask but NOT with filter primitives like
        feFlood/feColorMatrix)."""
        if not nodes or clip == "empty" or mask == "empty":
            return
        node = nodes[0] if len(nodes) == 1 else ("layers", nodes)
        if filt is not None:
            node = ("filter", filt[1], filt[2], node)
        if clip is not None:
            node = ("composite", 5, node, clip)
        if mask is not None:
            node = ("mask", node, mask)
        if opacity < 1.0:
            node = ("alpha", opacity, node)
        out.append(node)

    def _emit(self, el, xf, style, foreground, out, depth=0):
        if depth > 32:
            return
        tag = _local(el.tag)
        st = dict(style)
        own = _style_of(el)
        for k in _INHERITED:
            if k in own:
                st[k] = own[k]
        if own.get("display", "").strip() == "none" or \
                own.get("visibility") in ("hidden", "collapse"):
            return
        own_op = _safe_float(own.get("opacity", 1.0) or 1.0)
        xf = affine_mul(xf, parse_transform(own.get("transform", "")))
        filt = self._resolve_filter(own.get("filter"), xf, el,
                                    foreground)
        clip = self._resolve_clip(own.get("clip-path"), xf, el)
        mask = self._resolve_mask(own.get("mask"), xf, style,
                                  foreground, depth)

        if tag in ("g", "svg", "a"):
            sub: list = []
            for child in el:
                self._emit(child, xf, st, foreground, sub, depth + 1)
            self._finish(out, sub, own_op, clip, mask, filt)
            return
        if tag == "use":
            ref = _href(el)
            target = self.ids.get(ref[1:]) if ref and \
                ref.startswith("#") else None
            if target is not None:
                shift = (1.0, 0.0, 0.0, 1.0,
                         _safe_float(el.get("x", 0) or 0, 0.0),
                         _safe_float(el.get("y", 0) or 0, 0.0))
                sub = []
                self._emit(target, affine_mul(xf, shift), st,
                           foreground, sub, depth + 1)
                self._finish(out, sub, own_op, clip, mask, filt)
            return
        if tag in ("defs", "linearGradient", "radialGradient",
                   "clipPath", "mask", "symbol", "style", "title",
                   "desc", "metadata"):
            return

        if tag == "path":
            chains = parse_path_data(el.get("d", ""))
        else:
            chains = _shape_subpaths(el)
        if not chains:
            return

        leaves: list = []
        fill_leaf = self._paint_leaf(chains, xf, st, foreground,
                                     "fill")
        stroke_leaf = self._stroke_leaf(chains, xf, st, foreground)
        # paint-order: fill first by default; a leading "stroke"
        # token paints the stroke under the fill (markers don't apply)
        po = (st.get("paint-order") or "normal").split()
        pair = ([stroke_leaf, fill_leaf]
                if po and po[0] == "stroke" else
                [fill_leaf, stroke_leaf])
        leaves.extend(leaf for leaf in pair if leaf is not None)
        self._finish(out, leaves, own_op, clip, mask, filt)

    def _paint_leaf(self, chains, xf, st, foreground, prop,
                    bbox_chains=None, fill_rule=None):
        """One painted-geometry leaf: ``("outline", Glyph, paint,
        gradient_xf)`` for the ``fill`` or ``stroke`` paint of an
        element, or None (paint 'none' / fully transparent / no
        geometry).  ``bbox_chains`` supplies the objectBoundingBox
        geometry when it differs from the painted chains (stroke
        gradients resolve against the path's FILL bbox per spec)."""
        paint_str = st.get(prop) or ("black" if prop == "fill"
                                     else "none")
        if fill_rule is None:
            fill_rule = (st.get("fill-rule", "nonzero")
                         if prop == "fill" else "nonzero")
        # CSS currentColor resolves through the inherited `color`
        # property, falling back to the text foreground
        cur = foreground
        if "color" in st:
            c = parse_color(st["color"], foreground)
            if c is not None:
                cur = c
        pa = _safe_float(st.get(f"{prop}-opacity", 1.0) or 1.0)
        if paint_str.strip().startswith("url("):
            m = re.match(r"url\(\s*#([^)\s]+)\s*\)", paint_str.strip())
            grad_el = self.ids.get(m.group(1)) if m else None
            if grad_el is None or _local(grad_el.tag) not in (
                    "linearGradient", "radialGradient"):
                return None
            glyph = chains_to_glyph(chains, xf, fill_rule=fill_rule)
            if glyph is None:
                return None
            bbox = _chains_bbox(bbox_chains
                                if bbox_chains is not None else chains)
            if bbox is None:
                return None
            gp = self._gradient_paint(grad_el, bbox, cur, pa)
            if gp is None:
                return None
            paint, gt = gp
            return ("outline", glyph, paint, affine_mul(xf, gt))
        rgba = parse_color(paint_str, cur)
        if rgba is None:
            return None
        alpha = max(0, min(255, round(rgba[3] * pa)))
        if alpha == 0:
            return None
        glyph = chains_to_glyph(chains, xf, fill_rule=fill_rule)
        if glyph is None:
            return None
        return ("outline", glyph,
                ("solid", (rgba[0], rgba[1], rgba[2], alpha)), None)

    def _stroke_leaf(self, chains, xf, st, foreground):
        """Stroke paint as a nonzero-filled outline leaf (see
        :mod:`fontrx.font.stroke`), or None (no stroke)."""
        paint_str = (st.get("stroke") or "none").strip()
        if paint_str in ("", "none"):
            return None
        width = _safe_float(st.get("stroke-width", 1.0))
        if width <= 0:
            return None
        from fontrx.font.stroke import stroke_chains

        dash = None
        da = (st.get("stroke-dasharray") or "none").strip()
        if da and da != "none":
            dash = _floats(da)
            if not dash or any(d < 0 for d in dash) or sum(dash) <= 0:
                dash = None
        # flatten/arc tolerance in LOCAL units: 0.5 font units mapped
        # back through the transform's scale
        det = abs(xf[0] * xf[3] - xf[1] * xf[2])
        scale = math.sqrt(det) if det > 1e-12 else 1.0
        sk = stroke_chains(
            chains, width,
            cap=st.get("stroke-linecap", "butt").strip(),
            join=st.get("stroke-linejoin", "miter").strip(),
            miterlimit=_safe_float(st.get("stroke-miterlimit", 4.0),
                                   4.0),
            dash=dash,
            dashoffset=_safe_float(st.get("stroke-dashoffset", 0.0),
                                   0.0),
            tol=0.5 / scale,
        )
        if not sk:
            return None
        return self._paint_leaf(sk, xf, st, foreground, "stroke",
                                bbox_chains=chains,
                                fill_rule="nonzero")

    def _resolve_mask(self, value, xf, style, foreground, depth):
        """``mask`` property -> a render-tree node whose luminance x
        alpha scales the masked content, None (no mask), or
        ``"empty"`` (an empty mask hides the element).  The mask's
        children render with full paint capability
        (maskContentUnits=userSpaceOnUse, the default; the mask
        REGION x/y/width/height clip is not applied — content-bounded
        masks, the practical corpus, are unaffected)."""
        v = (value or "").strip()
        if not v or v == "none":
            return None
        m = re.match(r"url\(\s*#([^)\s]+)\s*\)", v)
        mel = self.ids.get(m.group(1)) if m else None
        if mel is None or _local(mel.tag) != "mask":
            self._warn_once("mask (unresolved reference)")
            return None
        if depth > 16:
            return None
        sub: list = []
        for child in mel:
            self._emit(child, xf, dict(style), foreground, sub,
                       depth + 8)
        if not sub:
            return "empty"
        return sub[0] if len(sub) == 1 else ("layers", sub)

    # -- filters ----------------------------------------------------------

    _FE_IN_SPECIAL = {"SourceGraphic", "SourceAlpha"}

    def _subtree_user_bbox(self, el, xf=(1.0, 0.0, 0.0, 1.0, 0.0, 0.0),
                           depth=0):
        """Control-hull bounding box of the element's geometry in the
        element's OWN user space (descendant transforms folded in) —
        the objectBoundingBox reference for filter regions.  None when
        the subtree carries no geometry."""
        if depth > 16:
            return None
        tag = _local(el.tag)
        box = None

        def fold(b, pts):
            for x, y in pts:
                tx, ty = affine_apply(xf, x, y)
                if b is None:
                    b = [tx, ty, tx, ty]
                else:
                    b[0] = min(b[0], tx)
                    b[1] = min(b[1], ty)
                    b[2] = max(b[2], tx)
                    b[3] = max(b[3], ty)
            return b

        if tag in ("g", "svg", "a", "symbol"):
            for child in el:
                cxf = affine_mul(xf, parse_transform(
                    _style_of(child).get("transform", "")))
                cb = self._subtree_user_bbox(child, cxf, depth + 1)
                if cb is not None:
                    box = fold(box, [(cb[0], cb[1]), (cb[2], cb[3])])
            return tuple(box) if box else None
        if tag == "use":
            ref = _href(el)
            target = self.ids.get(ref[1:]) if ref and \
                ref.startswith("#") else None
            if target is None:
                return None
            shift = (1.0, 0.0, 0.0, 1.0,
                     _safe_float(el.get("x", 0) or 0, 0.0),
                     _safe_float(el.get("y", 0) or 0, 0.0))
            txf = affine_mul(xf, affine_mul(shift, parse_transform(
                _style_of(target).get("transform", ""))))
            return self._subtree_user_bbox(target, txf, depth + 1)
        chains = (parse_path_data(el.get("d", "")) if tag == "path"
                  else _shape_subpaths(el))
        for chain in chains:
            for item in chain:
                box = fold(box, [p for p in item[1:]
                                 if isinstance(p, tuple)])
        return tuple(box) if box else None

    def _filter_region(self, fel, bb, xf):
        """Filter region in EM space: x/y/width/height in filterUnits
        (default objectBoundingBox, -10%/-10%/120%/120%), mapped
        through the element transform (corner hull)."""
        units = (fel.get("filterUnits") or "objectBoundingBox").strip()

        def frac(name, default):
            v = fel.get(name)
            if v is None:
                return default
            v = v.strip()
            if v.endswith("%"):
                return _safe_float(v[:-1], default * 100.0) / 100.0
            return _safe_float(v, default)

        if units == "userSpaceOnUse":
            x = frac("x", 0.0)
            y = frac("y", 0.0)
            w = frac("width", 0.0)
            h = frac("height", 0.0)
            if w <= 0 or h <= 0:
                return None
        else:
            if bb is None:
                return None
            bx, by, bx1, by1 = bb
            bw, bh = bx1 - bx, by1 - by
            x = bx + frac("x", -0.1) * bw
            y = by + frac("y", -0.1) * bh
            w = frac("width", 1.2) * bw
            h = frac("height", 1.2) * bh
            if w <= 0 or h <= 0:
                return None
        corners = [affine_apply(xf, px, py)
                   for px in (x, x + w) for py in (y, y + h)]
        xs = [c[0] for c in corners]
        ys = [c[1] for c in corners]
        return (min(xs), min(ys), max(xs), max(ys))

    def _lower_primitive(self, child, tag, xf, foreground, idx):
        """One filter-element child -> a list of engine prims, or None
        (unsupported — the caller drops the whole filter)."""
        sx_k = math.hypot(xf[0], xf[1])   # user->em length scales
        sy_k = math.hypot(xf[2], xf[3])

        def inref(name="in"):
            v = (child.get(name) or "").strip()
            if not v:
                return ""
            if v in self._FE_IN_SPECIAL or not v[0].isupper():
                return v
            return None  # BackgroundImage/FillPaint/...: unsupported

        res = (child.get("result") or "").strip()
        i1 = inref()
        if i1 is None:
            return None
        if tag == "feGaussianBlur":
            sd = _floats(child.get("stdDeviation", "0"))
            sx = sd[0] if sd else 0.0
            sy = sd[1] if len(sd) > 1 else sx
            if sx < 0 or sy < 0:
                return None
            return [("blur", i1, sx * sx_k, sy * sy_k, res)]
        if tag == "feOffset":
            dx = _safe_float(child.get("dx", 0), 0.0)
            dy = _safe_float(child.get("dy", 0), 0.0)
            dex = xf[0] * dx + xf[2] * dy
            dey = xf[1] * dx + xf[3] * dy
            return [("offset", i1, dex, dey, res)]
        if tag == "feFlood":
            col = parse_color(child.get("flood-color", "black"),
                              foreground)
            if col is None:
                col = (0, 0, 0, 255)
            fo = _safe_float(child.get("flood-opacity", 1.0), 1.0)
            r, g, b, a = col
            return [("flood", (r / 255.0, g / 255.0, b / 255.0,
                               a / 255.0 * max(0.0, min(fo, 1.0))),
                     res)]
        if tag == "feMerge":
            refs = []
            for mn in child:
                if _local(mn.tag) != "feMergeNode":
                    return None
                v = (mn.get("in") or "").strip()
                if v and v not in self._FE_IN_SPECIAL \
                        and v[0].isupper():
                    return None
                refs.append(v)
            return [("merge", refs, res)]
        if tag == "feComposite":
            i2 = inref("in2")
            if i2 is None:
                return None
            op = (child.get("operator") or "over").strip()
            if op not in ("over", "in", "out", "atop", "xor",
                          "arithmetic"):
                return None
            k = tuple(_safe_float(child.get(f"k{j}", 0), 0.0)
                      for j in (1, 2, 3, 4))
            return [("composite", i1, i2, op, k, res)]
        if tag == "feBlend":
            i2 = inref("in2")
            if i2 is None:
                return None
            mode = (child.get("mode") or "normal").strip()
            if mode not in ("normal", "multiply", "screen", "darken",
                            "lighten"):
                return None
            return [("blend", i1, i2, mode, res)]
        if tag == "feColorMatrix":
            kind = (child.get("type") or "matrix").strip()
            values = tuple(_floats(child.get("values", "")))
            if kind == "matrix" and len(values) not in (0, 20):
                return None
            if kind == "matrix" and not values:
                values = tuple(
                    1.0 if j % 6 == 0 else 0.0 for j in range(20))
            if kind not in ("matrix", "saturate", "hueRotate",
                            "luminanceToAlpha"):
                return None
            return [("colormatrix", i1, kind, values, res)]
        if tag == "feDropShadow":
            sd = _floats(child.get("stdDeviation", "2"))
            sx = sd[0] if sd else 2.0
            sy = sd[1] if len(sd) > 1 else sx
            dx = _safe_float(child.get("dx", 2), 2.0)
            dy = _safe_float(child.get("dy", 2), 2.0)
            col = parse_color(child.get("flood-color", "black"),
                              foreground) or (0, 0, 0, 255)
            fo = _safe_float(child.get("flood-opacity", 1.0), 1.0)
            r, g, b, a = col
            dex = xf[0] * dx + xf[2] * dy
            dey = xf[1] * dx + xf[3] * dy
            if i1 not in ("", "SourceGraphic", "SourceAlpha"):
                return None  # alpha of a named result: unsupported
            src = i1 or "SourceGraphic"
            t = f"__ds{idx}"
            return [
                ("blur", "SourceAlpha", sx * sx_k, sy * sy_k, t + "b"),
                ("offset", t + "b", dex, dey, t + "o"),
                ("flood", (r / 255.0, g / 255.0, b / 255.0,
                           a / 255.0 * max(0.0, min(fo, 1.0))),
                 t + "f"),
                ("composite", t + "f", t + "o", "in", (0, 0, 0, 0),
                 t + "s"),
                ("merge", [t + "s", src], res),
            ]
        if tag == "feMorphology":
            op = (child.get("operator") or "erode").strip()
            if op not in ("erode", "dilate"):
                return None
            rad = _floats(child.get("radius", "0"))
            rx = rad[0] if rad else 0.0
            ry = rad[1] if len(rad) > 1 else rx
            if rx < 0 or ry < 0:
                return None  # negative radius is an error, per spec
            return [("morph", i1, op, rx * sx_k, ry * sy_k, res)]
        if tag == "feConvolveMatrix":
            if child.get("kernelUnitLength") is not None:
                return None  # deprecated attr; no renderer agrees
            order = _floats(child.get("order", "3"))
            ox = int(order[0]) if order else 3
            oy = int(order[1]) if len(order) > 1 else ox
            if ox <= 0 or oy <= 0 or ox * oy > 1024:
                return None
            kern = _floats(child.get("kernelMatrix", ""))
            if len(kern) != ox * oy:
                return None
            div = child.get("divisor")
            if div is None:
                d = sum(kern)
                divisor = d if d != 0 else 1.0
            else:
                divisor = _safe_float(div, 1.0)
                if divisor == 0:
                    return None  # zero divisor is an error, per spec
            bias = _safe_float(child.get("bias", 0), 0.0)
            tx = child.get("targetX")
            ty = child.get("targetY")
            tx = int(_safe_float(tx, ox // 2)) if tx is not None \
                else ox // 2
            ty = int(_safe_float(ty, oy // 2)) if ty is not None \
                else oy // 2
            if not (0 <= tx < ox and 0 <= ty < oy):
                return None
            edge = (child.get("edgeMode") or "duplicate").strip()
            if edge not in ("duplicate", "wrap", "none"):
                return None
            pa = (child.get("preserveAlpha") or "false").strip() \
                == "true"
            return [("convolve", i1, (ox, oy), tuple(kern), divisor,
                     bias, (tx, ty), edge, pa, res)]
        if tag == "feTile":
            # the input's explicit subregion is resolved by
            # _resolve_filter (it belongs to the producing primitive's
            # element, not this one); None until patched
            return [("tile", i1, None, res)]
        if tag in ("title", "desc", "metadata"):
            return []
        return None

    def _prim_subregion(self, child, xf):
        """A primitive's explicit x/y/width/height subregion in EM
        space (corner hull, same convention as the filter region), or
        None when unspecified.  Only feTile consumes these — the
        engine documents per-primitive subregions as not applied
        elsewhere."""
        vals = [child.get(k) for k in ("x", "y", "width", "height")]
        if all(v is None for v in vals):
            return None
        x = _safe_float(vals[0], 0.0) if vals[0] is not None else 0.0
        y = _safe_float(vals[1], 0.0) if vals[1] is not None else 0.0
        w = _safe_float(vals[2], 0.0) if vals[2] is not None else 0.0
        h = _safe_float(vals[3], 0.0) if vals[3] is not None else 0.0
        if w <= 0 or h <= 0:
            return None
        corners = [affine_apply(xf, px, py)
                   for px in (x, x + w) for py in (y, y + h)]
        xs = [c[0] for c in corners]
        ys = [c[1] for c in corners]
        return (min(xs), min(ys), max(xs), max(ys))

    def _resolve_filter(self, value, xf, el, foreground):
        """``filter`` property -> ("filter", region_em, prims) for the
        engine's filter node, or None.  Restriction, documented: the
        supported primitive set is feGaussianBlur (the spec's
        three-box approximation), feOffset, feFlood, feMerge,
        feComposite, feBlend, feColorMatrix, feDropShadow,
        feMorphology, feConvolveMatrix, feTile with
        SourceGraphic/SourceAlpha/named results; a filter using
        anything else (feTurbulence/feDisplacementMap/feImage, an
        unresolved reference) warns once and renders UNFILTERED;
        per-primitive subregions are not applied (the filter region
        is), EXCEPT as the input subregion feTile replicates."""
        v = (value or "").strip()
        if not v or v == "none":
            return None
        m = re.match(r"url\(\s*#([^)\s]+)\s*\)", v)
        fel = self.ids.get(m.group(1)) if m else None
        if fel is None or _local(fel.tag) != "filter":
            self._warn_once("filter (unresolved reference)")
            return None
        prims: list = []
        sub_of: dict[str, tuple | None] = {}
        last_sub = None
        for i, child in enumerate(fel):
            lowered = self._lower_primitive(
                child, _local(child.tag), xf, foreground, i)
            if lowered is None:
                self._warn_once(
                    f"filter primitive {_local(child.tag)}")
                return None
            if lowered and lowered[-1][0] == "tile":
                # resolve the INPUT's subregion: named result, else
                # the previous primitive's (the implicit 'in' chain)
                t = lowered[-1]
                src = t[1]
                if src in self._FE_IN_SPECIAL:
                    sub = None  # the source spans the filter region
                elif src:
                    sub = sub_of.get(src)
                else:
                    sub = last_sub
                lowered = lowered[:-1] + [("tile", t[1], sub, t[3])]
            if lowered:
                sub = self._prim_subregion(child, xf)
                r = lowered[-1][-1]
                if r:
                    sub_of[r] = sub
                last_sub = sub
            prims.extend(lowered)
        if not prims:
            return None
        bb = self._subtree_user_bbox(el)
        region = self._filter_region(fel, bb, xf)
        return ("filter", region, tuple(prims))

    # -- clip paths -----------------------------------------------------

    def _resolve_clip(self, value, xf, el):
        """``clip-path`` property -> a clip node (an opaque
        ``outline`` leaf whose coverage masks the clipped subtree via
        SrcIn), None (no clip), or ``"empty"`` (an empty clipPath
        clips everything away, per spec).

        The clip region is the UNION of the clipPath's child shapes:
        each child's contours are reoriented by their own nesting
        depth (so every child fills with winding +1 and overlapping
        children add instead of cancel) — exact for
        non-self-intersecting children under both clip-rules, the
        same caveat as the evenodd fill lowering."""
        v = (value or "").strip()
        if not v or v == "none":
            return None
        m = re.match(r"url\(\s*#([^)\s]+)\s*\)", v)
        cp = self.ids.get(m.group(1)) if m else None
        if cp is None or _local(cp.tag) != "clipPath":
            self._warn_once("clip-path (unresolved reference)")
            return None
        cxf = xf
        if cp.get("clipPathUnits") == "objectBoundingBox":
            bbox = self._local_bbox(el)
            if bbox is None:
                return "empty"
            x0, y0, x1, y1 = bbox
            cxf = affine_mul(cxf, (x1 - x0, 0.0, 0.0, y1 - y0, x0, y0))
        cxf = affine_mul(cxf, parse_transform(cp.get("transform", "")))
        resolved: list = []
        for child in cp:
            self._collect_clip_child(child, cxf, resolved, 0)
        glyph = _contours_to_glyph(resolved)
        if glyph is None:
            return "empty"
        return ("outline", glyph, ("solid", (0, 0, 0, 255)), None)

    def _collect_clip_child(self, child, cxf, resolved, depth):
        if depth > 32:
            return
        tag = _local(child.tag)
        st = _style_of(child)
        if st.get("display", "").strip() == "none":
            return
        child_xf = affine_mul(cxf,
                              parse_transform(st.get("transform", "")))
        if tag == "use":
            ref = _href(child)
            target = self.ids.get(ref[1:]) if ref and \
                ref.startswith("#") else None
            if target is not None:
                shift = (1.0, 0.0, 0.0, 1.0,
                         _safe_float(child.get("x", 0) or 0, 0.0),
                         _safe_float(child.get("y", 0) or 0, 0.0))
                self._collect_clip_child(
                    target, affine_mul(child_xf, shift), resolved,
                    depth + 1)
            return
        if tag == "path":
            chains = parse_path_data(child.get("d", ""))
        else:
            chains = _shape_subpaths(child)
        if not chains:
            if tag == "text":
                self._warn_once("clipPath text children")
            return
        resolved.extend(
            _resolve_chains(chains, child_xf, fill_rule="evenodd"))

    def _local_bbox(self, el, depth=0):
        """Geometry bounds of ``el`` in its own user space (the SVG
        objectBoundingBox): a shape's chain bounds, a group's union of
        children mapped through their relative transforms (transformed
        children contribute their transformed-bbox corners —
        conservative, like most implementations)."""
        if depth > 32:
            return None
        tag = _local(el.tag)
        if tag == "path":
            return _chains_bbox(parse_path_data(el.get("d", "")))
        if tag in ("rect", "circle", "ellipse", "line", "polyline",
                   "polygon"):
            return _chains_bbox(_shape_subpaths(el))
        if tag == "use":
            ref = _href(el)
            target = self.ids.get(ref[1:]) if ref and \
                ref.startswith("#") else None
            if target is None:
                return None
            b = self._local_bbox(target, depth + 1)
            if b is None:
                return None
            dx = _safe_float(el.get("x", 0) or 0, 0.0)
            dy = _safe_float(el.get("y", 0) or 0, 0.0)
            return (b[0] + dx, b[1] + dy, b[2] + dx, b[3] + dy)
        if tag in ("g", "svg", "a"):
            box = None
            for child in el:
                b = self._local_bbox(child, depth + 1)
                if b is None:
                    continue
                t = parse_transform(child.get("transform", ""))
                corners = [affine_apply(t, x, y)
                           for x in (b[0], b[2]) for y in (b[1], b[3])]
                xs = [c[0] for c in corners]
                ys = [c[1] for c in corners]
                b = (min(xs), min(ys), max(xs), max(ys))
                box = b if box is None else (
                    min(box[0], b[0]), min(box[1], b[1]),
                    max(box[2], b[2]), max(box[3], b[3]))
            return box
        return None
