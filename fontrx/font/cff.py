"""CFF (Compact Font Format) outline frontend — OpenType-CFF support.

A capability extension: the reference is TrueType-glyf only (its scaler
check rejects ``OTTO`` files outright, ``src/font/ttf.zig:24-31``).
fontrx accepts ``OTTO`` fonts by sourcing outlines from the ``CFF ``
table instead of ``glyf``/``loca``; everything else (cmap, hmtx, head,
maxp, GSUB/GPOS/GDEF, kern) is the same OpenType plumbing and flows
through the existing :class:`~fontrx.font.font.Font` paths unchanged.

Scope: Type 2 charstrings, plain AND CID-keyed (FDArray/FDSelect
route per-glyph private subrs; the gid->CID charset naming is
irrelevant to rendering).  Hinting operators are counted and skipped
(fontrx never grid-fits; same policy as the glyf path).

Cubic outlines are converted to the quadratic segment form the raster
kernels consume by adaptive midpoint subdivision: each cubic splits
until a single quadratic (control = the intersection implied by the
cubic's inner handles) approximates it within ``QUAD_TOLERANCE`` font
units, then points round to integer units — the same quantization a
native TrueType outline carries.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from fontrx.font.glyph import Box, Contour, Glyph
from fontrx.utils.log import get_logger
from fontrx.utils.reader import BigEndianReader, CorruptedFont

log = get_logger("CFF")

QUAD_TOLERANCE = 0.5   # font units; upem is typically 1000 for CFF
_MAX_SPLIT_DEPTH = 5   # ≤ 32 quadratics per cubic
_MAX_CALL_DEPTH = 10   # Type 2 spec nesting limit
_T2_MAX_OPS = 65536    # runaway-charstring bound (corrupt fonts)


# -- INDEX / DICT primitives ----------------------------------------------


def _read_index(
    data: bytes, pos: int, count32: bool = False
) -> tuple[list[bytes], int]:
    """CFF INDEX at ``pos`` -> (items, position past the INDEX).
    ``count32``: CFF2 INDEXes carry a 32-bit count (the only wire
    difference)."""
    cw = 4 if count32 else 2
    if pos + cw > len(data):
        raise CorruptedFont("CFF: INDEX header past end")
    (count,) = struct.unpack_from(">I" if count32 else ">H", data, pos)
    pos += cw
    if count == 0:
        return [], pos
    off_size = data[pos]
    pos += 1
    if not 1 <= off_size <= 4:
        raise CorruptedFont(f"CFF: bad INDEX offSize {off_size}")
    n_off = count + 1
    raw = data[pos : pos + n_off * off_size]
    if len(raw) < n_off * off_size:
        raise CorruptedFont("CFF: INDEX offsets past end")
    offs = [
        int.from_bytes(raw[i * off_size : (i + 1) * off_size], "big")
        for i in range(n_off)
    ]
    pos += n_off * off_size
    base = pos - 1  # offsets are 1-based from here
    end = base + offs[-1]
    if end > len(data):
        raise CorruptedFont("CFF: INDEX data past end")
    items = [data[base + offs[i] : base + offs[i + 1]] for i in range(count)]
    return items, end


def _parse_dict(blob: bytes) -> dict[int, list[float]]:
    """CFF DICT -> {op: operands}.  Two-byte ops key as 0x0c00|op2."""
    out: dict[int, list[float]] = {}
    operands: list[float] = []
    i = 0
    n = len(blob)
    while i < n:
        b0 = blob[i]
        if b0 <= 24:  # operator (22 vsindex / 23 blend / 24 vstore are CFF2)
            if b0 == 12:
                i += 1
                if i >= n:
                    raise CorruptedFont("CFF: dangling escape in DICT")
                out[0x0C00 | blob[i]] = operands
            else:
                out[b0] = operands
            operands = []
            i += 1
        elif b0 == 28:
            operands.append(struct.unpack_from(">h", blob, i + 1)[0])
            i += 3
        elif b0 == 29:
            operands.append(struct.unpack_from(">i", blob, i + 1)[0])
            i += 5
        elif b0 == 30:  # real number (BCD)
            i += 1
            s = ""
            done = False
            while i < n and not done:
                byte = blob[i]
                i += 1
                for nib in (byte >> 4, byte & 0xF):
                    if nib <= 9:
                        s += str(nib)
                    elif nib == 0xA:
                        s += "."
                    elif nib == 0xB:
                        s += "E"
                    elif nib == 0xC:
                        s += "E-"
                    elif nib == 0xE:
                        s += "-"
                    elif nib == 0xF:
                        done = True
                        break
            try:
                operands.append(float(s) if s else 0.0)
            except ValueError:
                operands.append(0.0)
        elif 32 <= b0 <= 246:
            operands.append(b0 - 139)
            i += 1
        elif 247 <= b0 <= 250:
            operands.append((b0 - 247) * 256 + blob[i + 1] + 108)
            i += 2
        elif 251 <= b0 <= 254:
            operands.append(-(b0 - 251) * 256 - blob[i + 1] - 108)
            i += 2
        else:
            raise CorruptedFont(f"CFF: bad DICT byte {b0}")
    return out


def _bias(subrs: list[bytes]) -> int:
    n = len(subrs)
    if n < 1240:
        return 107
    if n < 33900:
        return 1131
    return 32768


# -- cubic -> quadratic ----------------------------------------------------


def _cubic_to_quads(p0, c1, c2, p3, tol: float, depth: int = 0):
    """Adaptive midpoint conversion: yield quadratic (control, end)
    pairs approximating the cubic from ``p0``.

    A single quadratic with control ``(3(c1+c2) - p0 - p3) / 4``
    matches the cubic exactly when the cubic is degree-elevated from a
    quadratic; the max deviation is ``sqrt(3)/36 * |p3 - 3c2 + 3c1 -
    p0|`` — split until under tolerance.
    """
    err = (np.hypot(*(p3 - 3 * c2 + 3 * c1 - p0))) * (3**0.5) / 36.0
    if err <= tol or depth >= _MAX_SPLIT_DEPTH:
        ctrl = (3.0 * (c1 + c2) - p0 - p3) / 4.0
        return [(ctrl, p3)]
    # de Casteljau split at t = 1/2
    ab = (p0 + c1) / 2.0
    bc = (c1 + c2) / 2.0
    cd = (c2 + p3) / 2.0
    abbc = (ab + bc) / 2.0
    bccd = (bc + cd) / 2.0
    mid = (abbc + bccd) / 2.0
    return (
        _cubic_to_quads(p0, ab, abbc, mid, tol, depth + 1)
        + _cubic_to_quads(mid, bccd, cd, p3, tol, depth + 1)
    )


# -- charstring interpreter ------------------------------------------------


class _PathBuilder:
    """Accumulates Type-2 path ops as quadratic contours."""

    def __init__(self):
        self.contours: list[list[np.ndarray]] = []  # odd-length pt lists
        self._cur: list[np.ndarray] | None = None
        self._pos = np.zeros(2)

    def move_to(self, p):
        self.close()
        self._cur = [np.asarray(p, float)]
        self._pos = np.asarray(p, float)

    def line_to(self, p):
        if self._cur is None:
            self.move_to(self._pos)
        p = np.asarray(p, float)
        # lines ride the quadratic pipeline with the control at the
        # midpoint (the same representation TTF implied points produce)
        self._cur.append((self._pos + p) / 2.0)
        self._cur.append(p)
        self._pos = p

    def curve_to(self, c1, c2, p3):
        if self._cur is None:
            self.move_to(self._pos)
        p0 = self._pos
        for ctrl, end in _cubic_to_quads(
            p0, np.asarray(c1, float), np.asarray(c2, float),
            np.asarray(p3, float), QUAD_TOLERANCE,
        ):
            self._cur.append(ctrl)
            self._cur.append(end)
        self._pos = np.asarray(p3, float)

    def close(self):
        if self._cur is None:
            return
        if len(self._cur) >= 3:
            start = self._cur[0]
            if not np.allclose(self._pos, start):
                self.line_to(start)
            self.contours.append(self._cur)
        self._cur = None


def _run_charstring(
    code: bytes,
    gsubrs: list[bytes],
    lsubrs: list[bytes],
    builder: _PathBuilder,
    state: dict,
    depth: int = 0,
) -> bool:
    """Execute one Type-2 charstring; returns True at ``endchar``."""
    if depth > _MAX_CALL_DEPTH:
        raise CorruptedFont("CFF: subr nesting too deep")
    st = state["stack"]
    i = 0
    n = len(code)
    while i < n:
        state["ops"] += 1
        if state["ops"] > _T2_MAX_OPS:
            raise CorruptedFont("CFF: runaway charstring")
        b0 = code[i]
        if b0 >= 32 or b0 == 28:
            # operand
            if b0 == 28:
                st.append(struct.unpack_from(">h", code, i + 1)[0])
                i += 3
            elif b0 <= 246:
                st.append(b0 - 139)
                i += 1
            elif b0 <= 250:
                st.append((b0 - 247) * 256 + code[i + 1] + 108)
                i += 2
            elif b0 <= 254:
                st.append(-(b0 - 251) * 256 - code[i + 1] - 108)
                i += 2
            else:  # 255: 16.16 fixed
                (v,) = struct.unpack_from(">i", code, i + 1)
                st.append(v / 65536.0)
                i += 5
            continue
        i += 1
        pos = builder._pos

        def take_width(n_args_even: bool):
            """Type 2 width oddity: the first stack-clearing operator
            may carry one extra leading operand = width delta."""
            if not state["width_done"]:
                state["width_done"] = True
                if (len(st) % 2 == 1) if n_args_even else (len(st) > state["expect"]):
                    st.pop(0)

        if b0 in (1, 3, 18, 23):  # h/vstem(hm)
            take_width(True)
            state["hints"] += len(st) // 2
            st.clear()
        elif b0 in (19, 20):  # hintmask / cntrmask
            # implicit vstem from pending operands
            if not state["width_done"]:
                state["width_done"] = True
                if len(st) % 2 == 1:
                    st.pop(0)
            state["hints"] += len(st) // 2
            st.clear()
            i += (state["hints"] + 7) // 8
        elif b0 == 21:  # rmoveto
            state["expect"] = 2
            take_width(False)
            builder.move_to(pos + np.array(st[-2:]) if len(st) >= 2 else pos)
            st.clear()
        elif b0 == 22:  # hmoveto
            state["expect"] = 1
            take_width(False)
            dx = st[-1] if st else 0.0
            builder.move_to(pos + np.array([dx, 0.0]))
            st.clear()
        elif b0 == 4:  # vmoveto
            state["expect"] = 1
            take_width(False)
            dy = st[-1] if st else 0.0
            builder.move_to(pos + np.array([0.0, dy]))
            st.clear()
        elif b0 == 5:  # rlineto
            for k in range(0, len(st) - 1, 2):
                builder.line_to(builder._pos + np.array(st[k : k + 2]))
            st.clear()
        elif b0 in (6, 7):  # hlineto / vlineto (alternating)
            horiz = b0 == 6
            for v in st:
                d = np.array([v, 0.0]) if horiz else np.array([0.0, v])
                builder.line_to(builder._pos + d)
                horiz = not horiz
            st.clear()
        elif b0 == 8:  # rrcurveto
            for k in range(0, len(st) - 5, 6):
                p = builder._pos
                c1 = p + np.array(st[k : k + 2])
                c2 = c1 + np.array(st[k + 2 : k + 4])
                p3 = c2 + np.array(st[k + 4 : k + 6])
                builder.curve_to(c1, c2, p3)
            st.clear()
        elif b0 == 24:  # rcurveline
            k = 0
            while len(st) - k >= 8:
                p = builder._pos
                c1 = p + np.array(st[k : k + 2])
                c2 = c1 + np.array(st[k + 2 : k + 4])
                p3 = c2 + np.array(st[k + 4 : k + 6])
                builder.curve_to(c1, c2, p3)
                k += 6
            if len(st) - k >= 2:
                builder.line_to(builder._pos + np.array(st[k : k + 2]))
            st.clear()
        elif b0 == 25:  # rlinecurve
            k = 0
            while len(st) - k > 6:
                builder.line_to(builder._pos + np.array(st[k : k + 2]))
                k += 2
            if len(st) - k >= 6:
                p = builder._pos
                c1 = p + np.array(st[k : k + 2])
                c2 = c1 + np.array(st[k + 2 : k + 4])
                p3 = c2 + np.array(st[k + 4 : k + 6])
                builder.curve_to(c1, c2, p3)
            st.clear()
        elif b0 in (26, 27):  # vvcurveto / hhcurveto
            k = 0
            d1 = 0.0
            if len(st) % 4 == 1:
                d1 = st[0]
                k = 1
            while len(st) - k >= 4:
                p = builder._pos
                if b0 == 26:  # vv
                    c1 = p + np.array([d1, st[k]])
                    c2 = c1 + np.array(st[k + 1 : k + 3])
                    p3 = c2 + np.array([0.0, st[k + 3]])
                else:  # hh
                    c1 = p + np.array([st[k], d1])
                    c2 = c1 + np.array(st[k + 1 : k + 3])
                    p3 = c2 + np.array([st[k + 3], 0.0])
                builder.curve_to(c1, c2, p3)
                d1 = 0.0
                k += 4
            st.clear()
        elif b0 in (30, 31):  # vhcurveto / hvcurveto (alternating)
            horiz = b0 == 31
            k = 0
            while len(st) - k >= 4:
                last = len(st) - k < 8
                p = builder._pos
                d_last = st[k + 4] if (last and len(st) - k == 5) else 0.0
                if horiz:
                    c1 = p + np.array([st[k], 0.0])
                    c2 = c1 + np.array(st[k + 1 : k + 3])
                    p3 = c2 + np.array([d_last, st[k + 3]])
                else:
                    c1 = p + np.array([0.0, st[k]])
                    c2 = c1 + np.array(st[k + 1 : k + 3])
                    p3 = c2 + np.array([st[k + 3], d_last])
                builder.curve_to(c1, c2, p3)
                horiz = not horiz
                k += 4
            st.clear()
        elif b0 == 10:  # callsubr
            if not st:
                raise CorruptedFont("CFF: callsubr with empty stack")
            idx = int(st.pop()) + _bias(lsubrs)
            if not 0 <= idx < len(lsubrs):
                raise CorruptedFont(f"CFF: bad local subr {idx}")
            if _run_charstring(
                lsubrs[idx], gsubrs, lsubrs, builder, state, depth + 1
            ):
                return True
        elif b0 == 29:  # callgsubr
            if not st:
                raise CorruptedFont("CFF: callgsubr with empty stack")
            idx = int(st.pop()) + _bias(gsubrs)
            if not 0 <= idx < len(gsubrs):
                raise CorruptedFont(f"CFF: bad global subr {idx}")
            if _run_charstring(
                gsubrs[idx], gsubrs, lsubrs, builder, state, depth + 1
            ):
                return True
        elif b0 == 15 and state.get("cff2"):  # vsindex
            if st:
                state["vsindex"] = int(st.pop())
                state["scalars"] = None
        elif b0 == 16 and state.get("cff2"):  # blend
            if state["scalars"] is None:
                ivs = state.get("ivs")
                coords = state.get("coords")
                if ivs is not None:
                    if coords is None:
                        # default instance: zero scalars, but the REAL
                        # region count — the deltas still occupy the
                        # stack and must be consumed
                        n_ax = len(ivs.regions[0]) if ivs.regions else 0
                        coords = np.zeros(n_ax)
                    state["scalars"] = ivs.region_scalars(
                        state["vsindex"], coords
                    )
                else:
                    state["scalars"] = []
            scalars = state["scalars"]
            k = len(scalars)
            if not st:
                raise CorruptedFont("CFF2: blend with empty stack")
            n_vals = int(st.pop())
            need = n_vals * (k + 1)
            if n_vals < 0 or len(st) < need:
                raise CorruptedFont("CFF2: blend stack underflow")
            args = st[len(st) - need:]
            del st[len(st) - need:]
            bases = args[:n_vals]
            for vi in range(n_vals):  # NB: never shadow the cursor `i`
                v = bases[vi]
                for j in range(k):
                    v += args[n_vals + vi * k + j] * scalars[j]
                st.append(v)
        elif b0 == 11:  # return
            return False
        elif b0 == 14:  # endchar
            if not state["width_done"]:
                state["width_done"] = True
                if len(st) in (1, 5):
                    st.pop(0)
            # seac-style accent composition (4 remaining args) is
            # deprecated and rare; ignore the accent
            builder.close()
            return True
        elif b0 == 12:  # escape
            if i >= len(code):
                raise CorruptedFont("CFF: truncated escape opcode")
            b1 = code[i]
            i += 1
            if b1 == 35:  # flex (reads 12 args; the 13th, fd, is unused)
                if len(st) < 12:  # malformed: clear and continue (native parity)
                    st.clear()
                    continue
                a = st
                p = builder._pos
                c1 = p + np.array(a[0:2])
                c2 = c1 + np.array(a[2:4])
                j1 = c2 + np.array(a[4:6])
                builder.curve_to(c1, c2, j1)
                c3 = j1 + np.array(a[6:8])
                c4 = c3 + np.array(a[8:10])
                e = c4 + np.array(a[10:12])
                builder.curve_to(c3, c4, e)
                st.clear()
            elif b1 == 34:  # hflex
                if len(st) < 7:
                    st.clear()
                    continue
                a = st
                p = builder._pos
                y0 = p[1]
                c1 = p + np.array([a[0], 0.0])
                c2 = c1 + np.array([a[1], a[2]])
                j1 = c2 + np.array([a[3], 0.0])
                builder.curve_to(c1, c2, j1)
                c3 = j1 + np.array([a[4], 0.0])
                c4 = np.array([c3[0] + a[5], y0])
                e = c4 + np.array([a[6], 0.0])
                builder.curve_to(c3, c4, e)
                st.clear()
            elif b1 == 36:  # hflex1
                if len(st) < 9:
                    st.clear()
                    continue
                a = st
                p = builder._pos
                y0 = p[1]
                c1 = p + np.array(a[0:2])
                c2 = c1 + np.array([a[2], a[3]])
                j1 = c2 + np.array([a[4], 0.0])
                builder.curve_to(c1, c2, j1)
                c3 = j1 + np.array([a[5], 0.0])
                c4 = c3 + np.array(a[6:8])
                e = np.array([c4[0] + a[8], y0])
                builder.curve_to(c3, c4, e)
                st.clear()
            elif b1 == 37:  # flex1
                if len(st) < 11:
                    st.clear()
                    continue
                a = st
                p = builder._pos
                dsum = np.array(a[0:2]) + np.array(a[2:4]) + \
                    np.array(a[4:6]) + np.array(a[6:8]) + np.array(a[8:10])
                c1 = p + np.array(a[0:2])
                c2 = c1 + np.array(a[2:4])
                j1 = c2 + np.array(a[4:6])
                builder.curve_to(c1, c2, j1)
                c3 = j1 + np.array(a[6:8])
                c4 = c3 + np.array(a[8:10])
                # the endpoint returns to the start plus the larger
                # delta axis (spec: d6 is whichever axis moved more)
                if abs(dsum[0]) > abs(dsum[1]):
                    e = np.array([c4[0] + a[10], p[1]])
                else:
                    e = np.array([p[0], c4[1] + a[10]])
                builder.curve_to(c3, c4, e)
                st.clear()
            elif b1 == 12:  # div
                if len(st) >= 2:
                    b = st.pop()
                    a_ = st.pop()
                    st.append(a_ / b if b else 0.0)
            elif b1 == 10:  # add
                if len(st) >= 2:
                    b = st.pop()
                    st.append(st.pop() + b)
            elif b1 == 11:  # sub
                if len(st) >= 2:
                    b = st.pop()
                    st.append(st.pop() - b)
            elif b1 == 9:  # abs
                if st:
                    st.append(abs(st.pop()))
            elif b1 == 14:  # neg
                if st:
                    st.append(-st.pop())
            else:
                log.debug("CFF: ignoring charstring op 12 %d", b1)
                st.clear()
        else:
            log.debug("CFF: ignoring charstring op %d", b0)
            st.clear()
    return False


def _finalize_flat(points: np.ndarray, ends: np.ndarray) -> Glyph:
    """Native-interpreter output (flat f64 points + contour ends) ->
    rounded, re-closed Glyph — the same quantization as
    :func:`_finalize_contours`."""
    if len(ends) == 0:
        return Glyph.empty()
    arr_all = np.round(points).astype(np.int32)
    contours = []
    start = 0
    for e in ends:
        c = arr_all[start:int(e)].copy()
        c[-1] = c[0]
        contours.append(Contour(c))
        start = int(e)
    allp = np.concatenate([c.points for c in contours])
    box = Box(int(allp[:, 0].min()), int(allp[:, 1].min()),
              int(allp[:, 0].max()), int(allp[:, 1].max()))
    return Glyph(box, tuple(contours))


def _finalize_contours(builder: _PathBuilder) -> Glyph:
    """Round a builder's contours to integer font units, re-close
    exactly, and compute the outline box (shared by CFF and CFF2)."""
    if not builder.contours:
        return Glyph.empty()
    contours = []
    xs, ys = [], []
    for pts in builder.contours:
        arr = np.round(np.asarray(pts)).astype(np.int32)
        arr[-1] = arr[0]
        contours.append(Contour(arr))
        xs.append(arr[:, 0])
        ys.append(arr[:, 1])
    ax = np.concatenate(xs)
    ay = np.concatenate(ys)
    box = Box(int(ax.min()), int(ay.min()), int(ax.max()), int(ay.max()))
    return Glyph(box, tuple(contours))


# -- font-level object -----------------------------------------------------


@dataclass
class CffFont:
    """Parsed CFF table: charstrings + subrs.  Plain AND CID-keyed
    fonts (CID: FDArray of Font DICTs with per-FD Private/Subrs,
    routed per glyph by FDSelect — the charset's gid->CID naming is
    irrelevant to rendering and skipped)."""

    charstrings: list[bytes]
    gsubrs: list[bytes]
    fd_subrs: list[list[bytes]]          # local subrs per FD
    fd_select: list[int] | None = None   # gid -> FD (None: all FD 0)

    @property
    def lsubrs(self) -> list[bytes]:
        """FD-0 local subrs (the whole font's for non-CID fonts)."""
        return self.fd_subrs[0]

    @staticmethod
    def _private_subrs(data: bytes, base: int, d: dict) -> list[bytes]:
        """Local subrs reachable from a DICT's Private entry."""
        if 18 not in d or len(d[18]) < 2:
            return []
        priv_size, priv_off = int(d[18][0]), int(d[18][1])
        priv = _parse_dict(
            data[base + priv_off : base + priv_off + priv_size]
        )
        if 19 in priv:  # Subrs, offset relative to Private DICT
            subrs, _ = _read_index(
                data, base + priv_off + int(priv[19][0])
            )
            return subrs
        return []

    @classmethod
    def parse(cls, r: BigEndianReader) -> "CffFont":
        data = r.data
        base = r.pos
        if base + 4 > len(data):
            raise CorruptedFont("CFF: header past end")
        major = data[base]
        hdr_size = data[base + 2]
        if major != 1:
            raise NotImplementedError(f"CFF major version {major}")
        pos = base + hdr_size
        _names, pos = _read_index(data, pos)
        top_dicts, pos = _read_index(data, pos)
        _strings, pos = _read_index(data, pos)
        gsubrs, pos = _read_index(data, pos)
        if not top_dicts:
            raise CorruptedFont("CFF: no Top DICT")
        top = _parse_dict(top_dicts[0])
        if 17 not in top:
            raise CorruptedFont("CFF: Top DICT missing CharStrings")
        cs_off = int(top[17][0])
        charstrings, _ = _read_index(data, base + cs_off)

        fd_select = None
        if 0x0C24 in top:  # CID-keyed: FDArray (+ FDSelect)
            fd_dicts, _ = _read_index(data, base + int(top[0x0C24][0]))
            if not fd_dicts:
                raise CorruptedFont("CFF: empty FDArray")
            fd_subrs = [
                cls._private_subrs(data, base, _parse_dict(fd))
                for fd in fd_dicts
            ]
            if 0x0C25 in top:
                fd_select = Cff2Font._parse_fdselect(
                    data, base + int(top[0x0C25][0]), len(charstrings)
                )
        else:
            fd_subrs = [cls._private_subrs(data, base, top)]
        return cls(charstrings, gsubrs, fd_subrs, fd_select)

    @property
    def num_glyphs(self) -> int:
        return len(self.charstrings)

    def _native_blobs(self, fd: int = 0):
        cache = getattr(self, "_nb", None)
        if cache is None:
            cache = self._nb = {}
        if fd not in cache:
            from fontrx import native

            gb, go = native._subr_blob(self.gsubrs)
            lb, lo = native._subr_blob(self.fd_subrs[fd])
            cache[fd] = (gb, go, lb, lo)
        return cache[fd]

    def glyph(self, gid: int, coords=None) -> Glyph:
        """Interpret the charstring and build a normalized quadratic
        :class:`Glyph` (integer font units).  ``coords`` is accepted
        for interface parity with :class:`Cff2Font` and ignored (plain
        CFF is static).

        The native interpreter (``native/src/cff_interp.cc``,
        bit-identical double math) runs when built; Python otherwise.
        """
        if not 0 <= gid < len(self.charstrings):
            raise CorruptedFont(f"CFF: glyph {gid} out of range")
        fd = self.fd_select[gid] if self.fd_select else 0
        fd = min(fd, len(self.fd_subrs) - 1)
        lsubrs = self.fd_subrs[fd]
        from fontrx import native

        if native.available():
            gb, go, lb, lo = self._native_blobs(fd)
            out = native.cff_outline_native(
                self.charstrings[gid], gb, go, len(self.gsubrs),
                lb, lo, len(lsubrs), False, None, None, 0,
            )
            if out is not None:
                return _finalize_flat(*out)
        builder = _PathBuilder()
        state = {
            "stack": [], "hints": 0, "width_done": False, "ops": 0,
            "expect": 0,
        }
        _run_charstring(
            self.charstrings[gid], self.gsubrs, lsubrs, builder, state
        )
        builder.close()
        return _finalize_contours(builder)


# -- CFF2 (variable CFF) ---------------------------------------------------


def _read_index2(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """CFF2 INDEX (32-bit count)."""
    return _read_index(data, pos, count32=True)


@dataclass
class Cff2Font:
    """Parsed ``CFF2`` table: charstrings + subrs + the variation
    store driving ``blend``.  Outlines interpolate at the normalized
    design coordinates passed to :meth:`glyph` — the CFF flavor of the
    glyf path's gvar support (``fontrx/font/variations.py``)."""

    charstrings: list[bytes]
    gsubrs: list[bytes]
    fd_select: list[int] | None          # gid -> FD index (None: all 0)
    fd_subrs: list[list[bytes]]          # local subrs per FD
    fd_vsindex: list[int]                # default vsindex per FD
    ivs: object | None                   # ItemVariationStore

    @classmethod
    def parse(cls, r: BigEndianReader) -> "Cff2Font":
        data = r.data
        base = r.pos
        if base + 5 > len(data):
            raise CorruptedFont("CFF2: header past end")
        major = data[base]
        hdr_size = data[base + 2]
        (top_len,) = struct.unpack_from(">H", data, base + 3)
        if major != 2:
            raise NotImplementedError(f"CFF2 major version {major}")
        top = _parse_dict(data[base + hdr_size : base + hdr_size + top_len])
        gsubrs, _ = _read_index2(data, base + hdr_size + top_len)
        if 17 not in top:
            raise CorruptedFont("CFF2: Top DICT missing CharStrings")
        charstrings, _ = _read_index2(data, base + int(top[17][0]))

        ivs = None
        if 24 in top:  # vstore: u16 length + ItemVariationStore
            from fontrx.font.variations import ItemVariationStore

            ivs = ItemVariationStore.parse(data, base + int(top[24][0]) + 2)

        fd_subrs: list[list[bytes]] = []
        fd_vsindex: list[int] = []
        if 0x0C24 in top:
            fd_dicts, _ = _read_index2(data, base + int(top[0x0C24][0]))
        else:
            fd_dicts = [b""]
        for fd_blob in fd_dicts:
            fd = _parse_dict(fd_blob)
            subrs: list[bytes] = []
            vsidx = 0
            if 18 in fd and len(fd[18]) >= 2:
                p_size, p_off = int(fd[18][0]), int(fd[18][1])
                priv = _parse_dict(data[base + p_off : base + p_off + p_size])
                if 19 in priv:
                    subrs, _ = _read_index2(
                        data, base + p_off + int(priv[19][0])
                    )
                if 22 in priv:  # vsindex
                    vsidx = int(priv[22][0])
            fd_subrs.append(subrs)
            fd_vsindex.append(vsidx)

        fd_select = None
        if 0x0C25 in top:
            fd_select = cls._parse_fdselect(
                data, base + int(top[0x0C25][0]), len(charstrings)
            )
        return cls(charstrings, gsubrs, fd_select, fd_subrs, fd_vsindex, ivs)

    @staticmethod
    def _parse_fdselect(data: bytes, pos: int, n_glyphs: int) -> list[int]:
        fmt = data[pos]
        if fmt == 0:
            return [data[pos + 1 + i] for i in range(n_glyphs)]
        if fmt == 3:
            (n_ranges,) = struct.unpack_from(">H", data, pos + 1)
            out = [0] * n_glyphs
            rp = pos + 3
            for _ in range(n_ranges):
                first, fd = struct.unpack_from(">HB", data, rp)
                (nxt,) = struct.unpack_from(">H", data, rp + 3)
                for g in range(first, min(nxt, n_glyphs)):
                    out[g] = fd
                rp += 3
            return out
        if fmt == 4:  # CFF2: u32 glyph ranges (large fonts)
            (n_ranges,) = struct.unpack_from(">I", data, pos + 1)
            out = [0] * n_glyphs
            rp = pos + 5
            for _ in range(n_ranges):
                first, fd = struct.unpack_from(">IH", data, rp)
                (nxt,) = struct.unpack_from(">I", data, rp + 6)
                for g in range(first, min(nxt, n_glyphs)):
                    out[g] = fd
                rp += 6
            return out
        raise CorruptedFont(f"CFF2: FDSelect format {fmt}")

    @property
    def num_glyphs(self) -> int:
        return len(self.charstrings)

    def _native_blobs(self, fd: int):
        cache = getattr(self, "_nb", None)
        if cache is None:
            cache = self._nb = {}
        if fd not in cache:
            from fontrx import native

            gb, go = native._subr_blob(self.gsubrs)
            lb, lo = native._subr_blob(self.fd_subrs[fd])
            cache[fd] = (gb, go, lb, lo)
        return cache[fd]

    def _scalar_arrays(self, coords):
        """Per-VarData region scalars at ``coords`` (flat + offsets),
        for the native blend.  Cached per location (they depend only on
        coords; recomputing per glyph would erode the native win)."""
        if self.ivs is None:
            return None, None
        key = None if coords is None else bytes(
            np.asarray(coords, np.float64).tobytes()
        )
        cache = getattr(self, "_scalar_cache", None)
        if cache is None:
            cache = self._scalar_cache = {}
        if key in cache:
            return cache[key]
        if coords is None:
            n_ax = len(self.ivs.regions[0]) if self.ivs.regions else 0
            coords = np.zeros(n_ax)
        flat: list[float] = []
        offs = [0]
        for outer in range(len(self.ivs.var_data)):
            flat.extend(self.ivs.region_scalars(outer, coords))
            offs.append(len(flat))
        out = (np.asarray(flat, np.float64), np.asarray(offs, np.int64))
        cache[key] = out
        return out

    def glyph(self, gid: int, coords=None) -> Glyph:
        """Interpret the CFF2 charstring at normalized design
        ``coords`` (None = the default instance: all blends collapse to
        their base values).  Native interpreter when built."""
        if not 0 <= gid < len(self.charstrings):
            raise CorruptedFont(f"CFF2: glyph {gid} out of range")
        fd = self.fd_select[gid] if self.fd_select else 0
        fd = min(fd, len(self.fd_subrs) - 1)
        from fontrx import native

        if native.available():
            gb, go, lb, lo = self._native_blobs(fd)
            scalars, soffs = self._scalar_arrays(coords)
            out = native.cff_outline_native(
                self.charstrings[gid], gb, go, len(self.gsubrs),
                lb, lo, len(self.fd_subrs[fd]), True,
                scalars, soffs, self.fd_vsindex[fd],
            )
            if out is not None:
                return _finalize_flat(*out)
        builder = _PathBuilder()
        state = {
            "stack": [], "hints": 0, "width_done": True, "ops": 0,
            "expect": 0, "cff2": True, "ivs": self.ivs,
            "coords": coords, "vsindex": self.fd_vsindex[fd],
            "scalars": None,
        }
        _run_charstring(
            self.charstrings[gid], self.gsubrs, self.fd_subrs[fd],
            builder, state,
        )
        builder.close()
        return _finalize_contours(builder)
