"""TrueType hinting: a complete bytecode interpreter.

The reference PANICS on glyphs that carry instructions
(``/root/reference/src/font/Glyph.zig:85`` — "not supporting glyph
instructions"); fontrx until now skipped them (the analytic winding
fill is resolution-independent, so unhinted rendering is well-defined
at every size).  This module closes the gap the honest way: a full
TrueType instruction-set interpreter (fpgm / prep / glyph programs,
graphics state, twilight zone, CVT, storage, functions, deltas, IUP),
so small-size rasters can use grid-fitted outlines.

Execution model (per the OpenType/TrueType instruction-set spec):

- all point coordinates are F26Dot6 (1/64 px) integers; projection /
  freedom vectors are F2Dot14;
- ``fpgm`` runs once per font (function/instruction definitions);
- ``prep`` runs once per (font, ppem): it may reshape the CVT and set
  default graphics state.  Per spec, graphics state set by prep
  persists into glyph programs EXCEPT the zone pointers, reference
  points, loop counter and the three vectors, which reset per glyph;
- each glyph program runs on the glyph's scaled points plus the four
  phantom points; composites run their own program on the combined,
  already-hinted component outline.

The bit-level oracle is the system ``libfreetype.so.6``, bound via
ctypes in ``fontrx/native/ft.py`` (test-only, like the hb/ICU
bindings): ``tests/test_ft_differential.py`` pins grid-fitted 26.6
outline points, contour structure and hinted advances against
``FT_Load_Glyph`` with ``interpreter-version = 35`` (the full
bidirectional interpreter matching this execution model; v40 is the
ClearType-era subset that ignores x-axis moves).  Per-opcode unit
tests (fontTools ``ttProgram``-assembled) cover the instruction set
itself.  FreeType-exact choices worth naming:

- fixed-point primitives (``mulfix``/``divfix``/``muldiv``,
  ``FT_Vector_NormLen``'s Newton iteration with intentional 32-bit
  wraparound) are bit-exact ports of FreeType semantics;
- CVT/storage writes from glyph programs are copy-on-write per
  top-level load (``GlyfSession``); the twilight zone persists per
  (font, ppem) across loads;
- engine compensation ("engine characteristics") is 0 for all
  distance colors, like every modern rasterizer;
- ``GETINFO`` reports engine version 35 and the grayscale bit (we
  render grayscale anti-aliased);
- errors (stack underflow, out-of-range indices, bad opcodes) raise
  :class:`HintingError`; callers fall back to the unhinted outline —
  graceful degradation per SURVEY §5.3.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

import numpy as np

from fontrx.utils.log import get_logger

log = get_logger("Hinting")

MAX_INSTRUCTIONS = 10_000_000   # runaway-loop guard (whole program run)
MAX_CALL_DEPTH = 64

ONE_PIXEL = 64                  # F26Dot6 one pixel
AXIS_X = (0x4000, 0)            # unit F2Dot14 vectors
AXIS_Y = (0, 0x4000)


class HintingError(Exception):
    """Any malformed-program condition; callers degrade to unhinted."""


def muldiv(a: int, b: int, c: int) -> int:
    """``a * b / c`` rounded half away from zero (FT_MulDiv
    semantics); ``c`` must be nonzero."""
    if c == 0:
        raise HintingError("muldiv by zero")
    prod = a * b
    s = 1
    if prod < 0:
        s, prod = -s, -prod
    if c < 0:
        s, c = -s, -c
    return s * ((prod + c // 2) // c)


def mulfix(a: int, b: int) -> int:
    """16.16 multiply, FT_MulFix semantics (round to nearest, ties
    away from zero; validated bit-exact against libfreetype)."""
    ab = a * b
    return (ab + 0x8000 - (1 if ab < 0 else 0)) >> 16


def divfix(a: int, b: int) -> int:
    """``(a << 16) / b`` rounded to nearest (FT_DivFix semantics,
    validated bit-exact against libfreetype)."""
    s = 1
    if a < 0:
        a, s = -a, -s
    if b < 0:
        b, s = -b, -s
    if b == 0:
        return 0x7FFFFFFF if s > 0 else -0x7FFFFFFF
    return s * (((a << 16) + (b >> 1)) // b)


def _c_div(a: int, b: int) -> int:
    """C integer division (truncation toward zero)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _i32(v: int) -> int:
    """Wrap to signed 32-bit (the interpreter's register width)."""
    v &= 0xFFFFFFFF
    return v - 0x100000000 if v >= 0x80000000 else v


def _normlen(x: int, y: int) -> tuple[int, int]:
    """FT_Vector_NormLen: normalize a 16.16 vector to (approximately)
    unit length, bit-exact to FreeType 2.12's fixed-point algorithm
    (reconstructed from the library binary; Newton iteration on the
    squared length with intentional 32-bit wraparound)."""
    sx = 1 if x >= 0 else -1
    sy = 1 if y >= 0 else -1
    x, y = abs(x), abs(y)
    if x == 0:
        return 0, (sy * 0x10000 if y > 0 else 0)
    if y == 0:
        return sx * 0x10000, 0
    l = x + (y >> 1) if x > y else y + (x >> 1)
    shift0 = 31 - (l.bit_length() - 1)
    shift = shift0 - 15 - (1 if l >= (0xAAAAAAAA >> shift0) else 0)
    if shift > 0:
        x = (x << shift) & 0xFFFFFFFF
        y = (y << shift) & 0xFFFFFFFF
        l = x + (y >> 1) if x > y else y + (x >> 1)
    else:
        x >>= -shift
        y >>= -shift
        l >>= -shift
    b = _i32(0x10000 - l)
    while True:
        x1 = _i32(x + (_i32(b * x) >> 16))
        y1 = _i32(y + (_i32(b * y) >> 16))
        z = _c_div(_i32(x1 * x1 + y1 * y1), 512)
        t = _i32(-z * ((0x10000 + b) >> 8))
        b = _i32(b + _c_div(t, 65536))
        if t <= 0xFFFF:
            break
    return sx * x1, sy * y1


def _ft_normalize(vx: int, vy: int) -> tuple[int, int] | None:
    """ttinterp's ``Normalize``: 26.6 direction -> F2Dot14 unit
    vector.  Returns None for the (0, 0) vector (FreeType leaves the
    graphics state unchanged in that case)."""
    if abs(vx) < 0x4000 and abs(vy) < 0x4000:
        if vx == 0 and vy == 0:
            return None
        vx *= 0x4000
        vy *= 0x4000
    x, y = _normlen(vx, vy)
    return _c_div(x, 4), _c_div(y, 4)


def _normalize_f2dot14(dx: int, dy: int) -> tuple[int, int]:
    """Unit F2Dot14 vector in the direction (dx, dy)."""
    n = float(np.hypot(float(dx), float(dy)))
    if n == 0.0:
        raise HintingError("zero-length vector")
    vx = int(np.floor(dx * 16384.0 / n + 0.5))
    vy = int(np.floor(dy * 16384.0 / n + 0.5))
    # clamp the rare 1.0000x overflow from rounding both components up
    vx = max(-16384, min(16384, vx))
    vy = max(-16384, min(16384, vy))
    return vx, vy


@dataclass
class GraphicsState:
    """The TrueType graphics state (spec "Graphics state" table)."""

    freedom: tuple[int, int] = AXIS_X
    projection: tuple[int, int] = AXIS_X
    dual: tuple[int, int] = AXIS_X
    rp0: int = 0
    rp1: int = 0
    rp2: int = 0
    zp0: int = 1
    zp1: int = 1
    zp2: int = 1
    loop: int = 1
    # round state: mode selects the FreeType-exact round function;
    # period/phase/threshold are the SROUND/S45ROUND parameters
    # (kept in 26.6 like FreeType's post-``>> 8`` values)
    round_mode: str = "grid"
    round_period: int = 64
    round_phase: int = 0
    round_threshold: int = 32
    min_dist: int = ONE_PIXEL
    cvt_cut_in: int = 68            # 17/16 px
    single_width_cut_in: int = 0
    single_width: int = 0
    delta_base: int = 9
    delta_shift: int = 3
    auto_flip: bool = True
    instruct_control: int = 0
    scan_control: int = 0
    scan_type: int = 0


class Zone:
    """A point zone: current/original F26Dot6 positions plus per-axis
    touch flags and on-curve flags.  Zone 1 additionally knows its
    contour end indices (phantom points live past the last contour)."""

    def __init__(self, n: int, ends: tuple[int, ...] = ()):
        self.n = n
        self.cur_x = np.zeros(n, np.int64)
        self.cur_y = np.zeros(n, np.int64)
        self.org_x = np.zeros(n, np.int64)
        self.org_y = np.zeros(n, np.int64)
        # original UNSCALED (font-unit) coordinates: FreeType's `orus`
        # array, used by IP/IUP/MDRP/MD to measure original distances
        # without the per-coordinate scaling rounding error
        self.orus_x = np.zeros(n, np.int64)
        self.orus_y = np.zeros(n, np.int64)
        self.touch_x = np.zeros(n, bool)
        self.touch_y = np.zeros(n, bool)
        self.on_curve = np.zeros(n, bool)
        self.ends = ends

    def check(self, p: int) -> int:
        if not 0 <= p < self.n:
            raise HintingError(f"point {p} out of zone (n={self.n})")
        return p

    def inb(self, p: int) -> bool:
        """Bounds test for FreeType's NON-PEDANTIC out-of-range
        handling: most point ops skip (or take a per-opcode Fail
        path) instead of erroring — real fonts rely on it
        (DejaVuSans-Bold gid 1327 SHPIXes point 33 of 28)."""
        return 0 <= p < self.n


class GlyfSession:
    """FreeType's glyfCvt/glyfStorage copy-on-write: CVT and storage
    writes made by GLYPH programs land in a per-load copy — visible to
    the rest of the same top-level glyph load (a composite's
    components share one session) and discarded afterwards, so the
    per-size post-prep CVT/storage are never contaminated (ttinterp
    Modify_CVT_Check / Modify_Storage_Check; pinned empirically: a
    glyph-program WCVTP/WS does not survive into the next
    FT_Load_Glyph, while twilight-zone positions do)."""

    __slots__ = ("cvt", "storage")

    def __init__(self):
        self.cvt: list[int] | None = None
        self.storage: list[int] | None = None


@dataclass
class _Function:
    code: bytes
    start: int
    end: int


class Engine:
    """Per-(font, ppem) hinting engine: scaled CVT + storage + the
    graphics-state defaults established by fpgm/prep."""

    def __init__(self, font, ppem: int):
        self.font = font
        self.ppem = int(ppem)
        maxp = font.maxp
        upem = font.info.units_per_em
        # F26Dot6 pixels per font unit: FreeType's two-step fixed-point
        # scale (16.16 x_scale, points scaled with one FT_MulFix) —
        # this is the de-facto grid-fitting standard every hinted font
        # was authored against, and the FreeType differential
        # (tests/test_ft_differential.py) pins it bit-exactly
        self.x_scale = divfix(self.ppem * 64, upem)
        self.functions: dict[int, _Function] = {}
        self.idefs: dict[int, _Function] = {}
        self.storage = [0] * max(getattr(maxp, "max_storage", 0), 1)
        cvt_fu = font._cvt_values()
        self.cvt = [self.scale(int(v)) for v in cvt_fu]
        # FreeType sizes the twilight zone maxTwilightPoints + 4 and
        # keeps it PER SIZE: twilight state persists from fpgm/prep
        # into and ACROSS glyph programs (glyph N can read points a
        # previous glyph's program positioned)
        self.twilight_n = max(getattr(maxp, "max_twilight", 0), 0) + 4
        self.twilight = Zone(self.twilight_n)
        self.ok = True
        self.base_gs = GraphicsState()
        try:
            fpgm = font._table_bytes(b"fpgm")
            if fpgm:
                ex = Exec(self, Zone(0), GraphicsState())
                ex.run(fpgm)
            prep = font._table_bytes(b"prep")
            if prep:
                ex = Exec(self, Zone(0), GraphicsState())
                ex.run(prep)
                gs = ex.gs
                # per spec, prep's GS persists minus vectors / rps /
                # zps / loop, which reset per glyph program
                self.base_gs = replace(
                    gs,
                    freedom=AXIS_X, projection=AXIS_X, dual=AXIS_X,
                    rp0=0, rp1=0, rp2=0, zp0=1, zp1=1, zp2=1, loop=1,
                )
                if gs.instruct_control & 2:
                    # INSTCTRL selector 2: discard prep GS changes
                    self.base_gs = replace(
                        GraphicsState(),
                        instruct_control=gs.instruct_control)
        except HintingError as e:
            log.warning("fpgm/prep failed at ppem %d: %s", ppem, e)
            self.ok = False

    def scale(self, v: int) -> int:
        """Font units -> F26Dot6 pixels (FT_MulFix by the 16.16
        x_scale, rounded to nearest with ties away from zero)."""
        return mulfix(v, self.x_scale)

    @property
    def skip_glyph_programs(self) -> bool:
        # INSTCTRL selector 1 set in prep inhibits grid fitting
        return bool(self.base_gs.instruct_control & 1)


class Exec:
    """One program execution over an engine + glyph zone."""

    def __init__(self, engine: Engine, zone1: Zone, gs: GraphicsState):
        self.e = engine
        self.gs = gs
        self.stack: list[int] = []
        self.zone0 = engine.twilight     # persistent per (font, ppem)
        self.zone1 = zone1
        self.budget = MAX_INSTRUCTIONS
        self.depth = 0
        self.sloppy = 0
        self.opcode = 0
        # the font-unit -> 26.6 scale for original-distance
        # measurements; composite glyph programs run with orus := cur
        # and scale 1.0 (FreeType TT_Hint_Glyph is_composite quirk)
        self.metrics_scale = engine.x_scale
        # glyph programs write CVT/storage through a per-load
        # copy-on-write session; fpgm/prep (session None) write the
        # engine's persistent arrays directly
        self.session: GlyfSession | None = None

    # --- CVT / storage views (copy-on-write for glyph programs) ----

    def cvt_get(self, i: int) -> int:
        s = self.session
        if s is not None and s.cvt is not None:
            return s.cvt[i]
        return self.e.cvt[i]

    def cvt_set(self, i: int, v: int) -> None:
        s = self.session
        if s is not None:
            if s.cvt is None:
                s.cvt = list(self.e.cvt)
            s.cvt[i] = v
        else:
            self.e.cvt[i] = v

    def sto_get(self, i: int) -> int:
        s = self.session
        if s is not None and s.storage is not None:
            return s.storage[i]
        return self.e.storage[i]

    def sto_set(self, i: int, v: int) -> None:
        s = self.session
        if s is not None:
            if s.storage is None:
                s.storage = list(self.e.storage)
            s.storage[i] = v
        else:
            self.e.storage[i] = v

    # --- plumbing -------------------------------------------------

    def pop(self) -> int:
        if not self.stack:
            # non-pedantic mode, like every production rasterizer:
            # real fonts (DejaVu among them) underflow the stack and
            # rely on the engine clamping — a missing argument reads
            # as 0.  Tracked in ``sloppy`` for diagnostics.
            self.sloppy += 1
            if self.sloppy > 4096:
                raise HintingError("persistent stack underflow")
            return 0
        return self.stack.pop()

    def _loop_count(self) -> int:
        """Iteration count for a looped pop instruction; on underflow
        the instruction consumes what is there and skips the rest
        (FreeType's non-pedantic semantics), never going negative."""
        n = self.gs.loop
        if len(self.stack) < n:
            self.sloppy += 1
            n = len(self.stack)
        return n

    def push(self, v: int) -> None:
        self.stack.append(int(v))

    def zone(self, which: int) -> Zone:
        if which == 0:
            return self.zone0
        if which == 1:
            return self.zone1
        raise HintingError(f"bad zone {which}")

    # --- fixed-point geometry ------------------------------------

    @staticmethod
    def _dot14(dx: int, dy: int, vec: tuple[int, int]) -> int:
        """Project a 26.6 delta on a F2Dot14 vector -> 26.6
        (TT_DotFix14: round to nearest, ties away from zero)."""
        s = dx * vec[0] + dy * vec[1]
        return (s + 0x2000 - (1 if s < 0 else 0)) >> 14

    def project(self, dx: int, dy: int) -> int:
        return self._dot14(dx, dy, self.gs.projection)

    def dual_project(self, dx: int, dy: int) -> int:
        return self._dot14(dx, dy, self.gs.dual)

    def _f_dot_p(self) -> int:
        fv, pv = self.gs.freedom, self.gs.projection
        d = (fv[0] * pv[0] + fv[1] * pv[1]) >> 14
        # degenerate (near-perpendicular) vectors: treat as unity like
        # FreeType to avoid huge move blowups
        if abs(d) < 0x400:
            d = 0x4000
        return d

    def move_point(self, zone: Zone, p: int, dist: int) -> None:
        """Move point ``p`` along the freedom vector so its projected
        position changes by ``dist`` (26.6)."""
        fv = self.gs.freedom
        fdp = self._f_dot_p()
        if fv[0] != 0:
            zone.cur_x[p] += muldiv(dist, fv[0], fdp)
            zone.touch_x[p] = True
        if fv[1] != 0:
            zone.cur_y[p] += muldiv(dist, fv[1], fdp)
            zone.touch_y[p] = True

    def shift_point(self, zone: Zone, p: int, dx: int, dy: int,
                    touch: bool = True) -> None:
        fv = self.gs.freedom
        if fv[0] != 0:
            zone.cur_x[p] += dx
            if touch:
                zone.touch_x[p] = True
        if fv[1] != 0:
            zone.cur_y[p] += dy
            if touch:
                zone.touch_y[p] = True

    def cur_project(self, za: Zone, a: int, zb: Zone, b: int) -> int:
        return self.project(int(za.cur_x[a] - zb.cur_x[b]),
                            int(za.cur_y[a] - zb.cur_y[b]))

    def org_project(self, za: Zone, a: int, zb: Zone, b: int) -> int:
        return self.dual_project(int(za.org_x[a] - zb.org_x[b]),
                                 int(za.org_y[a] - zb.org_y[b]))

    def orus_dist(self, za: Zone, a: int, zb: Zone, b: int,
                  twilight: bool) -> int:
        """FreeType's original-distance measurement: in the twilight
        zone the scaled originals are used; otherwise the UNSCALED
        originals are dual-projected in font units and scaled once
        (one rounding instead of two per-coordinate roundings)."""
        if twilight:
            return self.dual_project(int(za.org_x[a] - zb.org_x[b]),
                                     int(za.org_y[a] - zb.org_y[b]))
        d = self.dual_project(int(za.orus_x[a] - zb.orus_x[b]),
                              int(za.orus_y[a] - zb.orus_y[b]))
        return mulfix(d, self.metrics_scale)

    def move_org(self, zone: Zone, p: int, dist: int) -> None:
        """FreeType's Direct_Move_Orig: displace the scaled-original
        position along the freedom vector, no touch flags."""
        fv = self.gs.freedom
        fdp = self._f_dot_p()
        if fv[0] != 0:
            zone.org_x[p] += muldiv(dist, fv[0], fdp)
        if fv[1] != 0:
            zone.org_y[p] += muldiv(dist, fv[1], fdp)

    # --- rounding -------------------------------------------------

    def round_value(self, d: int) -> int:
        """Round a 26.6 distance per the current round state — each
        mode is FreeType's exact function (ttinterp ``Round_*``, with
        engine compensation 0 for every distance color, like every
        modern rasterizer)."""
        gs = self.gs
        mode = gs.round_mode
        if mode == "off":
            return d
        if mode == "grid":
            if d >= 0:
                v = (d + 32) & -64
                return 0 if v < 0 else v
            v = -((32 - d) & -64)
            return 0 if v > 0 else v
        if mode == "half":
            if d >= 0:
                v = (d & -64) + 32
                return 32 if v < 0 else v
            v = -(((-d) & -64) + 32)
            return -32 if v > 0 else v
        if mode == "double":
            if d >= 0:
                v = (d + 16) & -32
                return 0 if v < 0 else v
            v = -((16 - d) & -32)
            return 0 if v > 0 else v
        if mode == "down":
            if d >= 0:
                return d & -64
            v = -((-d) & -64)
            return 0 if v > 0 else v
        if mode == "up":
            if d >= 0:
                v = (d + 63) & -64
                return 0 if v < 0 else v
            v = -((63 - d) & -64)
            return 0 if v > 0 else v
        period = gs.round_period
        phase = gs.round_phase
        threshold = gs.round_threshold
        if mode == "super":
            # SROUND periods are powers of two: FreeType masks
            if d >= 0:
                v = ((d + threshold - phase) & -period) + phase
                return phase if v < 0 else v
            v = -(((threshold - phase - d) & -period) + phase)
            return -phase if v > 0 else v
        # super45: the period is not a power of two; FreeType divides
        # (C truncation toward zero)
        if d >= 0:
            v = _c_div(d + threshold - phase, period) * period + phase
            return phase if v < 0 else v
        v = -(_c_div(threshold - phase - d, period) * period + phase)
        return -phase if v > 0 else v

    def _set_round(self, mode: str, period: int = 64, phase: int = 0,
                   threshold: int = 32) -> None:
        self.gs.round_mode = mode
        self.gs.round_period = period
        self.gs.round_phase = phase
        self.gs.round_threshold = threshold

    # --- program scanning ----------------------------------------

    @staticmethod
    def _skip_ins(code: bytes, pc: int) -> int:
        """pc advanced past the instruction at pc (push-data aware)."""
        op = code[pc]
        pc += 1
        if op == 0x40:      # NPUSHB
            if pc >= len(code):
                raise HintingError("truncated NPUSHB")
            pc += 1 + code[pc]
        elif op == 0x41:    # NPUSHW
            if pc >= len(code):
                raise HintingError("truncated NPUSHW")
            pc += 1 + 2 * code[pc]
        elif 0xB0 <= op <= 0xB7:
            pc += op - 0xB0 + 1
        elif 0xB8 <= op <= 0xBF:
            pc += 2 * (op - 0xB8 + 1)
        return pc

    # --- execution ------------------------------------------------

    def run(self, code: bytes, start: int = 0, end: int | None = None):
        if self.depth > MAX_CALL_DEPTH:
            raise HintingError("call depth exceeded")
        pc = start
        stop = len(code) if end is None else end
        while pc < stop:
            self.budget -= 1
            if self.budget <= 0:
                raise HintingError("instruction budget exhausted")
            op = code[pc]
            self.opcode = op
            op_pc = pc
            pc = self._skip_ins(code, pc)
            if pc > len(code):
                raise HintingError("truncated push")

            # pushes (decode inline: they carry immediate data)
            if op == 0x40 or 0xB0 <= op <= 0xB7:        # NPUSHB/PUSHB
                if op == 0x40:
                    n, dpc = code[op_pc + 1], op_pc + 2
                else:
                    n, dpc = op - 0xB0 + 1, op_pc + 1
                for i in range(n):
                    self.push(code[dpc + i])
                continue
            if op == 0x41 or 0xB8 <= op <= 0xBF:        # NPUSHW/PUSHW
                if op == 0x41:
                    n, dpc = code[op_pc + 1], op_pc + 2
                else:
                    n, dpc = op - 0xB8 + 1, op_pc + 1
                for i in range(n):
                    w = (code[dpc + 2 * i] << 8) | code[dpc + 2 * i + 1]
                    if w >= 0x8000:
                        w -= 0x10000
                    self.push(w)
                continue

            if op == 0x2C:                               # FDEF
                fid = self.pop()
                body_start = pc
                while pc < stop and code[pc] != 0x2D:    # ENDF
                    pc = self._skip_ins(code, pc)
                if pc >= stop:
                    raise HintingError("FDEF without ENDF")
                self.e.functions[fid] = _Function(code, body_start, pc)
                pc += 1                                  # past ENDF
                continue
            if op == 0x89:                               # IDEF
                opc = self.pop()
                body_start = pc
                while pc < stop and code[pc] != 0x2D:
                    pc = self._skip_ins(code, pc)
                if pc >= stop:
                    raise HintingError("IDEF without ENDF")
                self.e.idefs[opc] = _Function(code, body_start, pc)
                pc += 1
                continue
            if op == 0x2D:                               # stray ENDF
                raise HintingError("ENDF outside FDEF")

            if op == 0x58:                               # IF
                if self.pop() == 0:
                    pc = self._skip_to_else_or_eif(code, pc, stop)
                continue
            if op == 0x1B:                               # ELSE (taken IF done)
                pc = self._skip_to_eif(code, pc, stop)
                continue
            if op == 0x59:                               # EIF
                continue
            if op == 0x1C:                               # JMPR
                pc = op_pc + self.pop()
                if not 0 <= pc <= stop:
                    raise HintingError("jump out of program")
                continue
            if op == 0x78:                               # JROT
                cond = self.pop()
                off = self.pop()
                if cond != 0:
                    pc = op_pc + off
                    if not 0 <= pc <= stop:
                        raise HintingError("jump out of program")
                continue
            if op == 0x79:                               # JROF
                cond = self.pop()
                off = self.pop()
                if cond == 0:
                    pc = op_pc + off
                    if not 0 <= pc <= stop:
                        raise HintingError("jump out of program")
                continue

            handler = _DISPATCH.get(op)
            if handler is None:
                idef = self.e.idefs.get(op)
                if idef is None:
                    raise HintingError(f"bad opcode 0x{op:02X}")
                self.depth += 1
                try:
                    self.run(idef.code, idef.start, idef.end)
                finally:
                    self.depth -= 1
                continue
            handler(self)

    def _skip_to_else_or_eif(self, code, pc, stop):
        depth = 0
        while pc < stop:
            op = code[pc]
            if op == 0x58:
                depth += 1
            elif op == 0x1B and depth == 0:
                return self._skip_ins(code, pc)
            elif op == 0x59:
                if depth == 0:
                    return self._skip_ins(code, pc)
                depth -= 1
            pc = self._skip_ins(code, pc)
        raise HintingError("IF without EIF")

    def _skip_to_eif(self, code, pc, stop):
        depth = 0
        while pc < stop:
            op = code[pc]
            if op == 0x58:
                depth += 1
            elif op == 0x59:
                if depth == 0:
                    return self._skip_ins(code, pc)
                depth -= 1
            pc = self._skip_ins(code, pc)
        raise HintingError("ELSE without EIF")

    # --- vector setting ------------------------------------------

    def _svtca(self):
        v = AXIS_X if (self.opcode & 1) else AXIS_Y
        base = self.opcode & ~1
        if base == 0x00:            # SVTCA: both
            self.gs.freedom = self.gs.projection = self.gs.dual = v
        elif base == 0x02:          # SPVTCA
            self.gs.projection = self.gs.dual = v
        else:                       # SFVTCA (0x04)
            self.gs.freedom = v

    @staticmethod
    def _vec_from_line(dx: int, dy: int,
                       opcode: int) -> tuple[int, int]:
        """FreeType's Ins_SxVTL core: a zero delta degrades to the
        x-axis WITHOUT the perpendicular rotation; the perpendicular
        case rotates counter-clockwise before normalizing."""
        if dx == 0 and dy == 0:
            dx, opcode = 0x4000, 0
        if opcode & 1:
            dx, dy = -dy, dx
        v = _ft_normalize(dx, dy)
        return v if v is not None else AXIS_X

    def _line_vector(self, cur: bool) -> tuple[int, int]:
        b = self.pop()              # point in zp2 (popped first = top)
        a = self.pop()              # point in zp1
        z1 = self.zone(self.gs.zp1)
        z2 = self.zone(self.gs.zp2)
        z1.check(a)
        z2.check(b)
        if cur:
            dx = int(z1.cur_x[a] - z2.cur_x[b])
            dy = int(z1.cur_y[a] - z2.cur_y[b])
        else:
            dx = int(z1.org_x[a] - z2.org_x[b])
            dy = int(z1.org_y[a] - z2.org_y[b])
        return self._vec_from_line(dx, dy, self.opcode)

    def _spvtl(self):
        self.gs.projection = self.gs.dual = self._line_vector(cur=True)

    def _sfvtl(self):
        self.gs.freedom = self._line_vector(cur=True)

    def _sdpvtl(self):
        # dual vector from the ORIGINAL positions, projection from the
        # current ones (spec: SDPVTL)
        b = self.pop()
        a = self.pop()
        z1 = self.zone(self.gs.zp1)
        z2 = self.zone(self.gs.zp2)
        z1.check(a)
        z2.check(b)
        # FreeType quirk: a zero ORIGINAL delta clears the rotation
        # flag for the CURRENT-vector normalization too (the local
        # opcode copy is shared across both blocks in Ins_SDPVTL)
        opcode = self.opcode
        dx = int(z1.org_x[a] - z2.org_x[b])
        dy = int(z1.org_y[a] - z2.org_y[b])
        if dx == 0 and dy == 0:
            opcode = 0
        self.gs.dual = self._vec_from_line(dx, dy, opcode)
        dx = int(z1.cur_x[a] - z2.cur_x[b])
        dy = int(z1.cur_y[a] - z2.cur_y[b])
        if dx == 0 and dy == 0:
            opcode = 0
        self.gs.projection = self._vec_from_line(dx, dy, opcode)

    @staticmethod
    def _int16(v: int) -> int:
        v &= 0xFFFF
        return v - 0x10000 if v >= 0x8000 else v

    def _spvfs(self):
        y = self._int16(self.pop())
        x = self._int16(self.pop())
        v = _ft_normalize(x, y)
        if v is not None:           # (0,0): GS unchanged, like FT
            self.gs.projection = self.gs.dual = v

    def _sfvfs(self):
        y = self._int16(self.pop())
        x = self._int16(self.pop())
        v = _ft_normalize(x, y)
        if v is not None:
            self.gs.freedom = v

    def _gpv(self):
        self.push(self.gs.projection[0])
        self.push(self.gs.projection[1])

    def _gfv(self):
        self.push(self.gs.freedom[0])
        self.push(self.gs.freedom[1])

    def _sfvtpv(self):
        self.gs.freedom = self.gs.projection

    # --- simple state setters ------------------------------------

    def _srp0(self):
        self.gs.rp0 = self.pop()

    def _srp1(self):
        self.gs.rp1 = self.pop()

    def _srp2(self):
        self.gs.rp2 = self.pop()

    def _szp0(self):
        z = self.pop()
        if z not in (0, 1):
            raise HintingError(f"SZP0 bad zone {z}")
        self.gs.zp0 = z

    def _szp1(self):
        z = self.pop()
        if z not in (0, 1):
            raise HintingError(f"SZP1 bad zone {z}")
        self.gs.zp1 = z

    def _szp2(self):
        z = self.pop()
        if z not in (0, 1):
            raise HintingError(f"SZP2 bad zone {z}")
        self.gs.zp2 = z

    def _szps(self):
        z = self.pop()
        if z not in (0, 1):
            raise HintingError(f"SZPS bad zone {z}")
        self.gs.zp0 = self.gs.zp1 = self.gs.zp2 = z

    def _sloop(self):
        n = self.pop()
        if n < 0:
            raise HintingError("SLOOP negative")
        # zero is legal (DejaVu uses SLOOP 0 to void the next looped
        # instruction); the loops below run zero iterations
        self.gs.loop = n

    def _smd(self):
        self.gs.min_dist = self.pop()

    def _scvtci(self):
        self.gs.cvt_cut_in = self.pop()

    def _sswci(self):
        self.gs.single_width_cut_in = self.pop()

    def _ssw(self):
        # value is in FUnits, scaled to 26.6
        self.gs.single_width = self.e.scale(self.pop())

    def _sdb(self):
        self.gs.delta_base = self.pop()

    def _sds(self):
        s = self.pop()
        if not 0 <= s <= 6:
            raise HintingError("SDS out of range")
        self.gs.delta_shift = s

    def _flipon(self):
        self.gs.auto_flip = True

    def _flipoff(self):
        self.gs.auto_flip = False

    def _scanctrl(self):
        self.gs.scan_control = self.pop()

    def _scantype(self):
        self.gs.scan_type = self.pop()

    def _instctrl(self):
        selector = self.pop()
        value = self.pop()
        if not 1 <= selector <= 3:
            return
        bit = 1 << (selector - 1)
        if value not in (0, bit):
            raise HintingError("INSTCTRL bad value")
        self.gs.instruct_control &= ~bit
        self.gs.instruct_control |= value

    # --- rounding state ------------------------------------------

    def _rtg(self):
        self._set_round("grid")

    def _rthg(self):
        self._set_round("half", 64, 32)

    def _rtdg(self):
        self._set_round("double", 32, 0, 16)

    def _rdtg(self):
        self._set_round("down", 64, 0, 0)

    def _rutg(self):
        self._set_round("up", 64, 0, 63)

    def _roff(self):
        self._set_round("off")

    def _sround(self):
        self._super_round(0x4000, "super")

    def _s45round(self):
        # 2.14 grid period 0x2D41 = 64/sqrt(2) px (the diagonal grid)
        self._super_round(0x2D41, "super45")

    def _super_round(self, grid_period: int, mode: str):
        """FreeType's SetSuperRound: selector math in 2.14, then the
        period/phase/threshold convert to 26.6 with ``>> 8``."""
        sel = self.pop()
        pf = sel & 0xC0
        if pf == 0x00:
            period = grid_period // 2
        elif pf == 0x40:
            period = grid_period
        elif pf == 0x80:
            period = grid_period * 2
        else:                       # 0xC0 reserved: grid period
            period = grid_period
        psel = sel & 0x30
        if psel == 0x00:
            phase = 0
        elif psel == 0x10:
            phase = period // 4
        elif psel == 0x20:
            phase = period // 2
        else:
            phase = period * 3 // 4
        tsel = sel & 0x0F
        if tsel == 0:
            threshold = period - 1
        else:
            threshold = _c_div((tsel - 4) * period, 8)
        period >>= 8
        phase >>= 8
        threshold >>= 8
        if period == 0:
            raise HintingError("SROUND zero period")
        self._set_round(mode, period, phase, threshold)

    # --- stack ops ------------------------------------------------

    def _dup(self):
        v = self.pop()
        self.push(v)
        self.push(v)

    def _pop(self):
        self.pop()

    def _clear(self):
        self.stack.clear()

    def _swap(self):
        a = self.pop()
        b = self.pop()
        self.push(a)
        self.push(b)

    def _depth(self):
        self.push(len(self.stack))

    def _cindex(self):
        k = self.pop()
        if k <= 0 or k > len(self.stack):
            self.push(0)            # OOB index reads 0 (FT)
        else:
            self.push(self.stack[-k])

    def _mindex(self):
        k = self.pop()
        if k <= 0 or k > len(self.stack):
            return                  # OOB move is a no-op (FT)
        self.push(self.stack.pop(-k))

    def _roll(self):
        a = self.pop()
        b = self.pop()
        c = self.pop()
        self.push(b)
        self.push(a)
        self.push(c)

    # --- arithmetic / logic --------------------------------------

    def _add(self):
        b = self.pop()
        self.push(self.pop() + b)

    def _sub(self):
        b = self.pop()
        self.push(self.pop() - b)

    def _div(self):
        b = self.pop()
        a = self.pop()
        if b == 0:
            raise HintingError("DIV by zero")
        # FT_MulDiv_No_Round: truncation toward zero
        self.push(_c_div(a * 64, b))

    def _mul(self):
        b = self.pop()
        self.push(muldiv(self.pop(), b, 64))

    def _abs(self):
        self.push(abs(self.pop()))

    def _neg(self):
        self.push(-self.pop())

    def _floor(self):
        v = self.pop()
        self.push((v // 64) * 64)

    def _ceiling(self):
        v = self.pop()
        self.push(-((-v // 64) * 64))

    def _max(self):
        b = self.pop()
        self.push(max(self.pop(), b))

    def _min(self):
        b = self.pop()
        self.push(min(self.pop(), b))

    def _lt(self):
        b = self.pop()
        self.push(1 if self.pop() < b else 0)

    def _lteq(self):
        b = self.pop()
        self.push(1 if self.pop() <= b else 0)

    def _gt(self):
        b = self.pop()
        self.push(1 if self.pop() > b else 0)

    def _gteq(self):
        b = self.pop()
        self.push(1 if self.pop() >= b else 0)

    def _eq(self):
        b = self.pop()
        self.push(1 if self.pop() == b else 0)

    def _neq(self):
        b = self.pop()
        self.push(1 if self.pop() != b else 0)

    def _odd(self):
        v = self.round_value(self.pop())
        self.push(1 if (v & 127) == 64 else 0)

    def _even(self):
        v = self.round_value(self.pop())
        self.push(1 if (v & 127) == 0 else 0)

    def _and(self):
        b = self.pop()
        a = self.pop()
        self.push(1 if (a != 0 and b != 0) else 0)

    def _or(self):
        b = self.pop()
        a = self.pop()
        self.push(1 if (a != 0 or b != 0) else 0)

    def _not(self):
        self.push(1 if self.pop() == 0 else 0)

    def _round(self):
        # ROUND[ab]: engine compensation 0 for every color
        self.push(self.round_value(self.pop()))

    def _nround(self):
        pass                        # compensation 0: identity

    # --- storage / cvt -------------------------------------------

    def _ws(self):
        v = self.pop()
        loc = self.pop()
        if not 0 <= loc < len(self.e.storage):
            return                  # OOB writes are ignored (FT)
        self.sto_set(loc, v)

    def _rs(self):
        loc = self.pop()
        if not 0 <= loc < len(self.e.storage):
            self.push(0)            # OOB reads are 0 (FT)
        else:
            self.push(self.sto_get(loc))

    def _wcvtp(self):
        v = self.pop()
        loc = self.pop()
        if not 0 <= loc < len(self.e.cvt):
            return                  # OOB cvt writes are ignored
        self.cvt_set(loc, v)

    def _wcvtf(self):
        v = self.pop()
        loc = self.pop()
        if not 0 <= loc < len(self.e.cvt):
            return
        self.cvt_set(loc, self.e.scale(v))

    def _rcvt(self):
        loc = self.pop()
        if not 0 <= loc < len(self.e.cvt):
            self.push(0)
        else:
            self.push(self.cvt_get(loc))

    # --- measurement ---------------------------------------------

    def _mppem(self):
        self.push(self.e.ppem)

    def _mps(self):
        self.push(self.e.ppem)      # point size: ppem (per FreeType)

    def _gc(self):
        p = self.pop()
        z = self.zone(self.gs.zp2)
        if not z.inb(p):
            self.push(0)            # FT: non-pedantic reads 0
            return
        if self.opcode & 1:         # GC[1]: original, dual vector
            self.push(self.dual_project(int(z.org_x[p]), int(z.org_y[p])))
        else:
            self.push(self.project(int(z.cur_x[p]), int(z.cur_y[p])))

    def _scfs(self):
        v = self.pop()
        p = self.pop()
        z = self.zone(self.gs.zp2)
        if not z.inb(p):
            return                  # FT: non-pedantic no-op
        cur = self.project(int(z.cur_x[p]), int(z.cur_y[p]))
        self.move_point(z, p, v - cur)
        if self.gs.zp2 == 0:        # twilight: original tracks current
            z.org_x[p] = z.cur_x[p]
            z.org_y[p] = z.cur_y[p]

    def _md(self):
        b = self.pop()              # point in zp1
        a = self.pop()              # point in zp0
        z0 = self.zone(self.gs.zp0)
        z1 = self.zone(self.gs.zp1)
        if not z0.inb(a) or not z1.inb(b):
            self.push(0)            # FT: non-pedantic measures 0
            return
        if self.opcode & 1:         # MD[0]=0x49: grid-fitted (current)
            self.push(self.cur_project(z0, a, z1, b))
        else:                       # MD[1]=0x4A: original, dual vector
            twilight = self.gs.zp0 == 0 or self.gs.zp1 == 0
            self.push(self.orus_dist(z0, a, z1, b, twilight))

    def _getinfo(self):
        sel = self.pop()
        r = 0
        if sel & 1:
            # engine version 35: the full bidirectional interpreter
            # (MS rasterizer v1.7 lineage; FreeType's v35 mode — v40
            # is the ClearType subset that ignores x moves, which is
            # NOT what this interpreter executes)
            r |= 35
        if sel & 32:
            r |= 1 << 12            # grayscale rendering
        self.push(r)

    def _debug(self):
        self.pop()

    def _aa(self):
        self.pop()                  # deprecated, pops its argument

    def _sangw(self):
        self.pop()                  # deprecated

    # --- calls ----------------------------------------------------

    def _call(self):
        fid = self.pop()
        fn = self.e.functions.get(fid)
        if fn is None:
            raise HintingError(f"CALL of undefined function {fid}")
        self.depth += 1
        try:
            self.run(fn.code, fn.start, fn.end)
        finally:
            self.depth -= 1

    def _loopcall(self):
        fid = self.pop()
        count = self.pop()
        fn = self.e.functions.get(fid)
        if fn is None:
            raise HintingError(f"LOOPCALL of undefined function {fid}")
        self.depth += 1
        try:
            for _ in range(count):
                self.run(fn.code, fn.start, fn.end)
        finally:
            self.depth -= 1

    # --- point movement ------------------------------------------

    def _mdap(self):
        p = self.pop()
        z = self.zone(self.gs.zp0)
        if not z.inb(p):            # FT Fail: rp updates only
            self.gs.rp0 = self.gs.rp1 = p
            return
        if self.opcode & 1:         # MDAP[1]: round the position
            cur = self.project(int(z.cur_x[p]), int(z.cur_y[p]))
            self.move_point(z, p, self.round_value(cur) - cur)
        else:                       # MDAP[0]: touch only
            fv = self.gs.freedom
            if fv[0] != 0:
                z.touch_x[p] = True
            if fv[1] != 0:
                z.touch_y[p] = True
        self.gs.rp0 = self.gs.rp1 = p

    def _miap(self):
        n = self.pop()
        p = self.pop()
        z = self.zone(self.gs.zp0)
        if not z.inb(p) or not 0 <= n < len(self.e.cvt):
            self.gs.rp0 = self.gs.rp1 = p   # FT Fail path
            return
        dist = self.cvt_get(n)
        if self.gs.zp0 == 0:
            # twilight: establish the original position from the cvt
            # value along the FREEDOM vector (FreeType Ins_MIAP — an
            # MS-rasterizer quirk), then move there
            z.org_x[p] = muldiv(dist, self.gs.freedom[0], 0x4000)
            z.org_y[p] = muldiv(dist, self.gs.freedom[1], 0x4000)
            z.cur_x[p] = z.org_x[p]
            z.cur_y[p] = z.org_y[p]
        cur = self.project(int(z.cur_x[p]), int(z.cur_y[p]))
        if self.opcode & 1:         # MIAP[1]: cut-in + round
            if abs(dist - cur) > self.gs.cvt_cut_in:
                dist = cur
            dist = self.round_value(dist)
        self.move_point(z, p, dist - cur)
        self.gs.rp0 = self.gs.rp1 = p

    def _mdrp(self):
        p = self.pop()
        z0 = self.zone(self.gs.zp0)
        z1 = self.zone(self.gs.zp1)
        if not z1.inb(p) or not z0.inb(self.gs.rp0):
            self.gs.rp1 = self.gs.rp0      # FT Fail path
            self.gs.rp2 = p
            if self.opcode & 0x10:
                self.gs.rp0 = p
            return
        # original distance: twilight uses scaled org, the glyph zone
        # measures in font units and scales once (FreeType Ins_MDRP)
        twilight = self.gs.zp0 == 0 or self.gs.zp1 == 0
        org_dist = self.orus_dist(z1, p, z0, self.gs.rp0, twilight)
        # single-width cut-in
        swci = self.gs.single_width_cut_in
        if abs(org_dist - self.gs.single_width) < swci:
            org_dist = (self.gs.single_width if org_dist >= 0
                        else -self.gs.single_width)
        if self.opcode & 0x04:      # round flag
            dist = self.round_value(org_dist)
        else:
            dist = org_dist
        if self.opcode & 0x08:      # minimum-distance flag
            if org_dist >= 0:
                dist = max(dist, self.gs.min_dist)
            else:
                dist = min(dist, -self.gs.min_dist)
        cur = self.cur_project(z1, p, z0, self.gs.rp0)
        self.move_point(z1, p, dist - cur)
        self.gs.rp1 = self.gs.rp0
        self.gs.rp2 = p
        if self.opcode & 0x10:      # set-rp0 flag
            self.gs.rp0 = p

    def _mirp(self):
        n = self.pop()
        p = self.pop()
        z0 = self.zone(self.gs.zp0)
        z1 = self.zone(self.gs.zp1)
        if not z1.inb(p) or not z0.inb(self.gs.rp0):
            self.gs.rp1 = self.gs.rp0      # FT Fail path
            if self.opcode & 0x10:
                self.gs.rp0 = p
            self.gs.rp2 = p
            return
        # FT Ins_MIRP bounds-checks cvtEntry+1 against cvtSize+1:
        # index -1 is LEGAL and reads distance 0; other OOB too
        cvt_dist = self.cvt_get(n) if 0 <= n < len(self.e.cvt) else 0
        swci = self.gs.single_width_cut_in
        if abs(cvt_dist - self.gs.single_width) < swci:
            cvt_dist = (self.gs.single_width if cvt_dist >= 0
                        else -self.gs.single_width)
        if self.gs.zp1 == 0:
            # twilight: original = rp0's original displaced by the cvt
            # distance along the freedom vector
            z1.org_x[p] = z0.org_x[self.gs.rp0] + muldiv(
                cvt_dist, self.gs.freedom[0], 0x4000)
            z1.org_y[p] = z0.org_y[self.gs.rp0] + muldiv(
                cvt_dist, self.gs.freedom[1], 0x4000)
            z1.cur_x[p] = z1.org_x[p]
            z1.cur_y[p] = z1.org_y[p]
        org_dist = self.org_project(z1, p, z0, self.gs.rp0)
        if self.gs.auto_flip and (org_dist ^ cvt_dist) < 0:
            cvt_dist = -cvt_dist
        if self.opcode & 0x04:      # round + cut-in flag
            # cut-in applies only when both points live in the SAME
            # zone (FreeType Ins_MIRP, an undocumented MS behavior)
            if self.gs.zp0 == self.gs.zp1 and \
                    abs(cvt_dist - org_dist) > self.gs.cvt_cut_in:
                cvt_dist = org_dist
            dist = self.round_value(cvt_dist)
        else:
            dist = cvt_dist
        if self.opcode & 0x08:      # minimum distance
            if org_dist >= 0:
                dist = max(dist, self.gs.min_dist)
            else:
                dist = min(dist, -self.gs.min_dist)
        cur = self.cur_project(z1, p, z0, self.gs.rp0)
        self.move_point(z1, p, dist - cur)
        self.gs.rp1 = self.gs.rp0
        self.gs.rp2 = p
        if self.opcode & 0x10:
            self.gs.rp0 = p

    def _msirp(self):
        d = self.pop()
        p = self.pop()
        z0 = self.zone(self.gs.zp0)
        z1 = self.zone(self.gs.zp1)
        if not z1.inb(p) or not z0.inb(self.gs.rp0):
            self.gs.rp1 = self.gs.rp0      # FT Fail path
            self.gs.rp2 = p
            if self.opcode & 1:
                self.gs.rp0 = p
            return
        if self.gs.zp1 == 0:
            # twilight: original = rp0's original, then displaced by
            # the full distance along the freedom vector (FreeType's
            # Direct_Move_Orig), current tracks the original
            z1.org_x[p] = z0.org_x[self.gs.rp0]
            z1.org_y[p] = z0.org_y[self.gs.rp0]
            self.move_org(z1, p, d)
            z1.cur_x[p] = z1.org_x[p]
            z1.cur_y[p] = z1.org_y[p]
        cur = self.cur_project(z1, p, z0, self.gs.rp0)
        self.move_point(z1, p, d - cur)
        self.gs.rp1 = self.gs.rp0
        self.gs.rp2 = p
        if self.opcode & 1:         # MSIRP[1]
            self.gs.rp0 = p

    def _alignrp(self):
        z0 = self.zone(self.gs.zp0)
        z1 = self.zone(self.gs.zp1)
        if not z0.inb(self.gs.rp0):    # FT Fail: consume, no moves
            for _ in range(self._loop_count()):
                self.pop()
            self.gs.loop = 1
            return
        for _ in range(self._loop_count()):
            p = self.pop()
            if not z1.inb(p):
                continue               # FT: skip OOB points
            d = self.cur_project(z1, p, z0, self.gs.rp0)
            self.move_point(z1, p, -d)
        self.gs.loop = 1

    def _alignpts(self):
        p2 = self.pop()
        p1 = self.pop()
        z0 = self.zone(self.gs.zp0)
        z1 = self.zone(self.gs.zp1)
        if not z1.inb(p1) or not z0.inb(p2):
            return                     # FT: non-pedantic no-op
        d = self.cur_project(z0, p2, z1, p1) // 2
        self.move_point(z1, p1, d)
        self.move_point(z0, p2, -d)

    def _isect(self):
        b1 = self.pop()
        b0 = self.pop()
        a1 = self.pop()
        a0 = self.pop()
        p = self.pop()
        z2 = self.zone(self.gs.zp2)
        z1 = self.zone(self.gs.zp1)
        z0 = self.zone(self.gs.zp0)
        if not (z2.inb(p) and z1.inb(a0) and z1.inb(a1)
                and z0.inb(b0) and z0.inb(b1)):
            return                     # FT: non-pedantic no-op
        ax0, ay0 = int(z1.cur_x[a0]), int(z1.cur_y[a0])
        ax1, ay1 = int(z1.cur_x[a1]), int(z1.cur_y[a1])
        bx0, by0 = int(z0.cur_x[b0]), int(z0.cur_y[b0])
        bx1, by1 = int(z0.cur_x[b1]), int(z0.cur_y[b1])
        dax, day = ax1 - ax0, ay1 - ay0
        dbx, dby = bx1 - bx0, by1 - by0
        dx, dy = bx0 - ax0, by0 - ay0
        # FreeType Ins_ISECT: Cramer's rule with each product
        # pre-divided by 64 (rounded), grazing intersections (<~3
        # degrees, |tan| < 1/19) take the middle of the middles
        disc = muldiv(dax, -dby, 0x40) + muldiv(day, dbx, 0x40)
        dot = muldiv(dax, dbx, 0x40) + muldiv(day, dby, 0x40)
        if 19 * abs(disc) > abs(dot):
            val = muldiv(dx, -dby, 0x40) + muldiv(dy, dbx, 0x40)
            rx = muldiv(val, dax, disc)
            ry = muldiv(val, day, disc)
            z2.cur_x[p] = ax0 + rx
            z2.cur_y[p] = ay0 + ry
        else:
            z2.cur_x[p] = _c_div(ax0 + ax1 + bx0 + bx1, 4)
            z2.cur_y[p] = _c_div(ay0 + ay1 + by0 + by1, 4)
        z2.touch_x[p] = True
        z2.touch_y[p] = True

    def _shift_delta(self, zone_sel: int):
        """(ref zone, ref point, dx, dy) for SHP/SHC/SHZ per flag a:
        a=1 -> rp1 in zp0; a=0 -> rp2 in zp1.  None when the
        reference point is out of bounds (FT's
        Compute_Point_Displacement FAILURE: instruction no-ops)."""
        if self.opcode & 1:
            zr = self.zone(self.gs.zp0)
            rp = self.gs.rp1
        else:
            zr = self.zone(self.gs.zp1)
            rp = self.gs.rp2
        if not zr.inb(rp):
            return None
        d = self.project(int(zr.cur_x[rp] - zr.org_x[rp]),
                         int(zr.cur_y[rp] - zr.org_y[rp]))
        fv = self.gs.freedom
        fdp = self._f_dot_p()
        dx = muldiv(d, fv[0], fdp) if fv[0] else 0
        dy = muldiv(d, fv[1], fdp) if fv[1] else 0
        return zr, rp, dx, dy

    def _shp(self):
        sd = self._shift_delta(0)
        if sd is None:                 # FT: consume points, no moves
            for _ in range(self._loop_count()):
                self.pop()
            self.gs.loop = 1
            return
        zr, _rp, dx, dy = sd
        z2 = self.zone(self.gs.zp2)
        for _ in range(self._loop_count()):
            p = self.pop()
            if not z2.inb(p):
                continue               # FT: skip OOB points
            self.shift_point(z2, p, dx, dy)
        self.gs.loop = 1

    def _shc(self):
        sd = self._shift_delta(0)
        if sd is None:
            self.pop()
            return
        zr, rp, dx, dy = sd
        c = self.pop()
        z2 = self.zone(self.gs.zp2)
        if self.gs.zp2 == 0:
            lo, hi = 0, z2.n
        else:
            ends = z2.ends
            if not 0 <= c < len(ends):
                return                 # FT: non-pedantic no-op
            lo = 0 if c == 0 else ends[c - 1] + 1
            hi = ends[c] + 1
        for p in range(lo, hi):
            if zr is z2 and p == rp:
                continue            # the reference point never shifts
            self.shift_point(z2, p, dx, dy)

    def _shz(self):
        sd = self._shift_delta(0)
        if sd is None:
            self.pop()
            return
        zr, rp, dx, dy = sd
        e = self.pop()
        if e not in (0, 1):
            raise HintingError(f"SHZ bad zone {e}")
        # FreeType quirk (Ins_SHZ): the popped zone number is only
        # bounds-checked — the shift applies to zp2.  Phantom points
        # never move (twilight has no contours, so all points there).
        z = self.zone(self.gs.zp2)
        if self.gs.zp2 == 0 or not z.ends:
            limit = z.n
        else:
            limit = z.ends[-1] + 1
        for p in range(limit):
            if zr is z and p == rp:
                continue
            # SHZ moves without touching (spec: does not touch)
            self.shift_point(z, p, dx, dy, touch=False)

    def _shpix(self):
        amt = self.pop()
        fv = self.gs.freedom
        dx = muldiv(amt, fv[0], 0x4000)
        dy = muldiv(amt, fv[1], 0x4000)
        z2 = self.zone(self.gs.zp2)
        for _ in range(self._loop_count()):
            p = self.pop()
            if not z2.inb(p):
                continue               # FT: skip OOB points
            self.shift_point(z2, p, dx, dy)
        self.gs.loop = 1

    def _ip(self):
        """FreeType Ins_IP: original distances measure on the
        UNSCALED originals (orus, font units) unless any active zone
        pointer is twilight; the ratio then cancels the units, so no
        late scaling is needed."""
        z0 = self.zone(self.gs.zp0)
        z1 = self.zone(self.gs.zp1)
        z2 = self.zone(self.gs.zp2)
        rp1, rp2 = self.gs.rp1, self.gs.rp2
        if not z0.inb(rp1):            # FT Fail: consume, loop reset
            for _ in range(self._loop_count()):
                self.pop()
            self.gs.loop = 1
            return
        twilight = (self.gs.zp0 == 0 or self.gs.zp1 == 0
                    or self.gs.zp2 == 0)

        def odist(z, p, zb, pb):
            if twilight:
                return self.dual_project(int(z.org_x[p] - zb.org_x[pb]),
                                         int(z.org_y[p] - zb.org_y[pb]))
            return self.dual_project(int(z.orus_x[p] - zb.orus_x[pb]),
                                     int(z.orus_y[p] - zb.orus_y[pb]))

        if 0 <= rp2 < z1.n:
            old_range = odist(z1, rp2, z0, rp1)
            cur_range = self.cur_project(z1, rp2, z0, rp1)
        else:
            old_range = cur_range = 0
        for _ in range(self._loop_count()):
            p = self.pop()
            if not z2.inb(p):
                continue               # FT: skip OOB points
            org_d = odist(z2, p, z0, rp1)
            cur_d = self.cur_project(z2, p, z0, rp1)
            if org_d:
                if old_range:
                    new_d = muldiv(org_d, cur_range, old_range)
                else:
                    new_d = org_d
            else:
                new_d = 0
            self.move_point(z2, p, new_d - cur_d)
        self.gs.loop = 1

    def _utp(self):
        p = self.pop()
        z = self.zone(self.gs.zp0)
        if not z.inb(p):
            return                     # FT: non-pedantic no-op
        fv = self.gs.freedom
        if fv[0] != 0:
            z.touch_x[p] = False
        if fv[1] != 0:
            z.touch_y[p] = False

    def _flippt(self):
        z = self.zone(self.gs.zp0)
        for _ in range(self._loop_count()):
            p = self.pop()
            if not z.inb(p):
                continue               # FT: skip OOB points
            z.on_curve[p] = not z.on_curve[p]
        self.gs.loop = 1

    def _fliprgon(self):
        hi = self.pop()
        lo = self.pop()
        z = self.zone(self.gs.zp0)
        if not z.inb(lo) or not z.inb(hi):
            return                     # FT: non-pedantic no-op
        z.on_curve[lo:hi + 1] = True

    def _fliprgoff(self):
        hi = self.pop()
        lo = self.pop()
        z = self.zone(self.gs.zp0)
        if not z.inb(lo) or not z.inb(hi):
            return                     # FT: non-pedantic no-op
        z.on_curve[lo:hi + 1] = False

    # --- IUP / DELTA ---------------------------------------------

    def _iup_interp(self, cur, org, orus, p1: int, p2: int,
                    ref1: int, ref2: int) -> None:
        """FreeType's _iup_worker_interpolate: span [p1, p2] between
        touched refs.  Ordering and the in-span test use the SCALED
        originals; the interpolation ratio uses the UNSCALED orus with
        a cached 16.16 scale (FT_DivFix then FT_MulFix per point)."""
        if p1 > p2:
            return
        orus1, orus2 = int(orus[ref1]), int(orus[ref2])
        if orus1 > orus2:
            ref1, ref2 = ref2, ref1
            orus1, orus2 = orus2, orus1
        org1, org2 = int(org[ref1]), int(org[ref2])
        cur1, cur2 = int(cur[ref1]), int(cur[ref2])
        delta1 = cur1 - org1
        delta2 = cur2 - org2
        if cur1 == cur2 or orus1 == orus2:
            for i in range(p1, p2 + 1):
                x = int(org[i])
                if x <= org1:
                    x += delta1
                elif x >= org2:
                    x += delta2
                else:
                    x = cur1
                cur[i] = x
            return
        scale = None
        for i in range(p1, p2 + 1):
            x = int(org[i])
            if x <= org1:
                x += delta1
            elif x >= org2:
                x += delta2
            else:
                if scale is None:
                    scale = divfix(cur2 - cur1, orus2 - orus1)
                x = cur1 + mulfix(int(orus[i]) - orus1, scale)
            cur[i] = x

    def _iup_shift(self, cur, org, p1: int, p2: int, ref: int) -> None:
        """Single touched point in the contour: rigid shift."""
        d = int(cur[ref]) - int(org[ref])
        if d == 0:
            return
        for i in range(p1, p2 + 1):
            if i != ref:
                cur[i] += d

    def _iup(self):
        """Interpolate untouched points, per contour, along one axis
        (IUP[1]=x, IUP[0]=y) — FreeType Ins_IUP span algorithm."""
        z = self.zone1
        axis_x = bool(self.opcode & 1)
        cur = z.cur_x if axis_x else z.cur_y
        org = z.org_x if axis_x else z.org_y
        orus = z.orus_x if axis_x else z.orus_y
        touched = z.touch_x if axis_x else z.touch_y
        first = 0
        for end in z.ends:
            if end < first:
                first = end + 1
                continue
            point = first
            while point <= end and not touched[point]:
                point += 1
            if point <= end:
                first_touched = point
                cur_touched = point
                point += 1
                while point <= end:
                    if touched[point]:
                        self._iup_interp(cur, org, orus,
                                         cur_touched + 1, point - 1,
                                         cur_touched, point)
                        cur_touched = point
                    point += 1
                if cur_touched == first_touched:
                    self._iup_shift(cur, org, first, end, cur_touched)
                else:
                    self._iup_interp(cur, org, orus, cur_touched + 1,
                                     end, cur_touched, first_touched)
                    if first_touched > 0:
                        self._iup_interp(cur, org, orus, first,
                                         first_touched - 1,
                                         cur_touched, first_touched)
            first = end + 1

    def _delta_args(self):
        n = self.pop()
        pairs = []
        for _ in range(n):
            if len(self.stack) < 2:
                # FT Ins_DELTAP/DELTAC underflow: stop consuming and
                # TRUNCATE the stack (exec->args = 0; new_top = args)
                # — it does NOT synthesize (0, 0) pairs, which would
                # move point 0 at ppem == delta_base (DejaVu uni0250
                # pushes 18 pairs but a count of 21)
                self.sloppy += 1
                self.stack.clear()
                break
            pn = self.pop()
            arg = self.pop()
            pairs.append((arg, pn))
        return pairs

    def _deltap(self, base_add: int):
        z = self.zone(self.gs.zp0)
        for arg, pn in self._delta_args():
            if not z.inb(pn):
                continue               # FT: skip OOB points
            ppem_sel = self.gs.delta_base + base_add + ((arg >> 4) & 0xF)
            if ppem_sel != self.e.ppem:
                continue
            mag = (arg & 0xF) - 8
            if mag >= 0:
                mag += 1
            dist = mag * (64 >> self.gs.delta_shift)
            self.move_point(z, pn, dist)

    def _deltap1(self):
        self._deltap(0)

    def _deltap2(self):
        self._deltap(16)

    def _deltap3(self):
        self._deltap(32)

    def _deltac(self, base_add: int):
        for arg, cn in self._delta_args():
            if not 0 <= cn < len(self.e.cvt):
                continue               # FT: skip OOB entries
            ppem_sel = self.gs.delta_base + base_add + ((arg >> 4) & 0xF)
            if ppem_sel != self.e.ppem:
                continue
            mag = (arg & 0xF) - 8
            if mag >= 0:
                mag += 1
            self.cvt_set(cn, self.cvt_get(cn)
                         + mag * (64 >> self.gs.delta_shift))

    def _deltac1(self):
        self._deltac(0)

    def _deltac2(self):
        self._deltac(16)

    def _deltac3(self):
        self._deltac(32)


def _build_dispatch():
    d = {}
    E = Exec
    for op in range(0x00, 0x06):
        d[op] = E._svtca
    d[0x06] = d[0x07] = E._spvtl
    d[0x08] = d[0x09] = E._sfvtl
    d[0x0A] = E._spvfs
    d[0x0B] = E._sfvfs
    d[0x0C] = E._gpv
    d[0x0D] = E._gfv
    d[0x0E] = E._sfvtpv
    d[0x0F] = E._isect
    d[0x10] = E._srp0
    d[0x11] = E._srp1
    d[0x12] = E._srp2
    d[0x13] = E._szp0
    d[0x14] = E._szp1
    d[0x15] = E._szp2
    d[0x16] = E._szps
    d[0x17] = E._sloop
    d[0x18] = E._rtg
    d[0x19] = E._rthg
    d[0x1A] = E._smd
    d[0x1D] = E._scvtci
    d[0x1E] = E._sswci
    d[0x1F] = E._ssw
    d[0x20] = E._dup
    d[0x21] = E._pop
    d[0x22] = E._clear
    d[0x23] = E._swap
    d[0x24] = E._depth
    d[0x25] = E._cindex
    d[0x26] = E._mindex
    d[0x27] = E._alignpts
    d[0x29] = E._utp
    d[0x2A] = E._loopcall
    d[0x2B] = E._call
    d[0x2E] = d[0x2F] = E._mdap
    d[0x30] = d[0x31] = E._iup
    d[0x32] = d[0x33] = E._shp
    d[0x34] = d[0x35] = E._shc
    d[0x36] = d[0x37] = E._shz
    d[0x38] = E._shpix
    d[0x39] = E._ip
    d[0x3A] = d[0x3B] = E._msirp
    d[0x3C] = E._alignrp
    d[0x3D] = E._rtdg
    d[0x3E] = d[0x3F] = E._miap
    d[0x42] = E._ws
    d[0x43] = E._rs
    d[0x44] = E._wcvtp
    d[0x45] = E._rcvt
    d[0x46] = d[0x47] = E._gc
    d[0x48] = E._scfs
    d[0x49] = d[0x4A] = E._md
    d[0x4B] = E._mppem
    d[0x4C] = E._mps
    d[0x4D] = E._flipon
    d[0x4E] = E._flipoff
    d[0x4F] = E._debug
    d[0x50] = E._lt
    d[0x51] = E._lteq
    d[0x52] = E._gt
    d[0x53] = E._gteq
    d[0x54] = E._eq
    d[0x55] = E._neq
    d[0x56] = E._odd
    d[0x57] = E._even
    d[0x5A] = E._and
    d[0x5B] = E._or
    d[0x5C] = E._not
    d[0x5D] = E._deltap1
    d[0x5E] = E._sdb
    d[0x5F] = E._sds
    d[0x60] = E._add
    d[0x61] = E._sub
    d[0x62] = E._div
    d[0x63] = E._mul
    d[0x64] = E._abs
    d[0x65] = E._neg
    d[0x66] = E._floor
    d[0x67] = E._ceiling
    for op in range(0x68, 0x6C):
        d[op] = E._round
    for op in range(0x6C, 0x70):
        d[op] = E._nround
    d[0x70] = E._wcvtf
    d[0x71] = E._deltap2
    d[0x72] = E._deltap3
    d[0x73] = E._deltac1
    d[0x74] = E._deltac2
    d[0x75] = E._deltac3
    d[0x76] = E._sround
    d[0x77] = E._s45round
    d[0x7A] = E._roff
    d[0x7C] = E._rutg
    d[0x7D] = E._rdtg
    d[0x7E] = E._sangw
    d[0x7F] = E._aa
    d[0x80] = E._flippt
    d[0x81] = E._fliprgon
    d[0x82] = E._fliprgoff
    d[0x85] = E._scanctrl
    d[0x86] = d[0x87] = E._sdpvtl
    d[0x88] = E._getinfo
    d[0x8A] = E._roll
    d[0x8B] = E._max
    d[0x8C] = E._min
    d[0x8D] = E._scantype
    d[0x8E] = E._instctrl
    for op in range(0xC0, 0xE0):
        d[op] = E._mdrp
    for op in range(0xE0, 0x100):
        d[op] = E._mirp
    return d


_DISPATCH = _build_dispatch()


# ----------------------------------------------------------------
# Glyph-level driver
# ----------------------------------------------------------------

@dataclass
class HintedOutline:
    """A grid-fitted outline in F26Dot6 pixel coordinates."""

    points: np.ndarray            # int64 [n, 2], 26.6
    on_curve: np.ndarray          # bool [n]
    ends: tuple[int, ...]         # contour end indices
    phantoms: np.ndarray          # int64 [4, 2], 26.6 (pp1..pp4)
    orus: np.ndarray              # int64 [n, 2], UNSCALED font units
    phantoms_fu: np.ndarray       # int64 [4, 2], font units

    @property
    def advance(self) -> int:
        """Hinted advance in 26.6: pp2.x - pp1.x grid-rounded, like
        FreeType's hinted ``slot->advance`` (FT_PIX_ROUND)."""
        return (int(self.phantoms[1, 0] - self.phantoms[0, 0])
                + 32) & -64


def _os2_typo(font) -> tuple[int, int] | None:
    """(sTypoAscender, sTypoDescender) from OS/2, like FreeType's
    vertical-phantom synthesis when no vmtx exists."""
    try:
        data = font._table_bytes(b"OS/2")
    except Exception:
        return None
    if not data or len(data) < 72:
        return None
    asc = int.from_bytes(data[68:70], "big", signed=True)
    desc = int.from_bytes(data[70:72], "big", signed=True)
    return asc, desc


def _phantoms_fu(font, index: int, x_min: int,
                 y_max: int) -> np.ndarray:
    """The four phantom points in FONT UNITS (FreeType builds them in
    font units and scales them with the rest of the outline, so pp2
    is scaled as pp1+advance in one rounding, not two)."""
    adv = int(font.advance_widths[index])
    lsb = int(font._lsb(index))
    vm = font.vertical_metrics
    if vm is not None:
        _vhea, heights, tsbs = vm
        vadv, tsb = int(heights[index]), int(tsbs[index])
    else:
        typo = _os2_typo(font)
        if typo is not None:
            asc, desc = typo
        else:
            asc, desc = font.info.ascent, font.info.descent
        vadv = abs(asc - desc)
        tsb = asc - y_max
    pp = np.zeros((4, 2), np.int64)
    pp[0, 0] = x_min - lsb
    pp[1, 0] = pp[0, 0] + adv
    pp[2, 1] = y_max + tsb
    pp[3, 1] = pp[2, 1] - vadv
    return pp


def _scaled_phantoms(engine: Engine, font, index: int,
                     x_min: int, y_max: int) -> np.ndarray:
    pp = _phantoms_fu(font, index, x_min, y_max)
    out = np.zeros((4, 2), np.int64)
    for i in range(4):
        out[i, 0] = engine.scale(int(pp[i, 0]))
        out[i, 1] = engine.scale(int(pp[i, 1]))
    return out


def _run_glyph_program(engine: Engine, outline: HintedOutline,
                       instructions: bytes,
                       is_composite: bool = False,
                       session: GlyfSession | None = None) -> None:
    n = len(outline.points)
    zone = Zone(n + 4, outline.ends)
    zone.cur_x[:n] = outline.points[:, 0]
    zone.cur_y[:n] = outline.points[:, 1]
    zone.cur_x[n:] = outline.phantoms[:, 0]
    zone.cur_y[n:] = outline.phantoms[:, 1]
    zone.org_x[:] = zone.cur_x
    zone.org_y[:] = zone.cur_y
    if is_composite:
        # UNDOCUMENTED (FreeType TT_Hint_Glyph): composite programs
        # refer entirely to the already-hinted subglyph positions —
        # orus := cur and the measurement scale becomes identity
        zone.orus_x[:] = zone.cur_x
        zone.orus_y[:] = zone.cur_y
    else:
        zone.orus_x[:n] = outline.orus[:, 0]
        zone.orus_y[:n] = outline.orus[:, 1]
        zone.orus_x[n:] = outline.phantoms_fu[:, 0]
        zone.orus_y[n:] = outline.phantoms_fu[:, 1]
    zone.on_curve[:n] = outline.on_curve
    # FreeType rounds the phantom CURRENT positions (x of pp1/pp2, y
    # of pp3/pp4) before the program runs; originals stay unrounded
    zone.cur_x[n] = (zone.cur_x[n] + 32) & -64
    zone.cur_x[n + 1] = (zone.cur_x[n + 1] + 32) & -64
    zone.cur_y[n + 2] = (zone.cur_y[n + 2] + 32) & -64
    zone.cur_y[n + 3] = (zone.cur_y[n + 3] + 32) & -64
    ex = Exec(engine, zone, replace(engine.base_gs))
    ex.session = session if session is not None else GlyfSession()
    if is_composite:
        ex.metrics_scale = 0x10000
    ex.run(instructions)
    outline.points[:, 0] = zone.cur_x[:n]
    outline.points[:, 1] = zone.cur_y[:n]
    outline.on_curve[:] = zone.on_curve[:n]
    outline.phantoms[:, 0] = zone.cur_x[n:]
    outline.phantoms[:, 1] = zone.cur_y[n:]


def _round_phantom_curs(pp: np.ndarray) -> None:
    """FT_PIX_ROUND the axes FreeType rounds (x of pp1/pp2, y of
    pp3/pp4) — applied whenever a SIMPLE glyph loads with hinting
    enabled, instructions or not; uninstructed composites skip
    TT_Hint_Glyph and keep raw phantoms (pinned empirically)."""
    pp[0, 0] = (int(pp[0, 0]) + 32) & -64
    pp[1, 0] = (int(pp[1, 0]) + 32) & -64
    pp[2, 1] = (int(pp[2, 1]) + 32) & -64
    pp[3, 1] = (int(pp[3, 1]) + 32) & -64


def _origin_align(out: HintedOutline) -> None:
    """FreeType aligns a hinted glyph to its origin phantom: the
    outline and phantoms are translated by -pp1.x AFTER the glyph
    program, so pp1 lands on x = 0.  Pinned empirically against
    libfreetype: a program-moved pp1 (e.g. DejaVu uni2D45's trailing
    MDRP onto point n) shifts the whole outline by -pp1.x unrounded,
    and the hinted advance becomes FT_PIX_ROUND(pp2.x - pp1.x).
    Applied at the TOP-LEVEL load only: components are assembled raw
    (DejaVuSansMono-Bold uni1F89: the nested-composite part matches
    its standalone render, which proves the child level is never
    aligned; the child's phantoms reach the parent only through
    USE_MY_METRICS)."""
    dx = int(out.phantoms[0, 0])
    if dx:
        if len(out.points):
            out.points[:, 0] -= dx
        out.phantoms[:, 0] -= dx


def hint_glyph(font, index: int, ppem: int,
               _track: tuple[int, ...] = (),
               _session: GlyfSession | None = None) -> HintedOutline:
    """Load glyph ``index``, scale to ``ppem`` and run its hinting
    program (recursively for composites, whose own programs run on the
    combined already-hinted component outline).  Execution model and
    fixed-point arithmetic are pinned bit-exact to FreeType's v35
    interpreter by tests/test_ft_differential.py."""
    from fontrx.font import ttf

    engine = font.hinting_engine(ppem)
    hinting = engine.ok and not engine.skip_glyph_programs
    if _session is None:
        # one CVT/storage copy-on-write session per top-level load
        # (composites share it with their components, like FreeType's
        # exec-held glyfCvt across one TT_Load_Glyph)
        _session = GlyfSession()
    if index in _track:
        raise HintingError(f"composite cycle at {index}")
    desc, data = font._raw_glyph(index)
    if desc is None:
        out = HintedOutline(
            np.zeros((0, 2), np.int64), np.zeros(0, bool), (),
            _scaled_phantoms(engine, font, index, 0, 0),
            np.zeros((0, 2), np.int64),
            _phantoms_fu(font, index, 0, 0))
        if hinting:
            _round_phantom_curs(out.phantoms)
        return out

    if isinstance(data, ttf.SimpleGlyph):
        if len(data.coordinates):
            orus = data.coordinates.astype(np.int64)
            pts = np.empty_like(orus)
            for i in range(len(orus)):
                pts[i, 0] = engine.scale(int(orus[i, 0]))
                pts[i, 1] = engine.scale(int(orus[i, 1]))
        else:
            orus = np.zeros((0, 2), np.int64)
            pts = np.zeros((0, 2), np.int64)
        out = HintedOutline(
            pts, data.on_curve.copy(),
            tuple(int(e) for e in data.end_pts_of_contours),
            _scaled_phantoms(engine, font, index,
                             desc.x_min, desc.y_max),
            orus,
            _phantoms_fu(font, index, desc.x_min, desc.y_max))
        if hinting:
            if data.instructions:
                _run_glyph_program(engine, out, data.instructions,
                                   session=_session)
            else:
                _round_phantom_curs(out.phantoms)
            if not _track:
                _origin_align(out)
        return out

    # composite: combine hinted components, then run the composite's
    # own program on the combined outline
    all_pts: list[np.ndarray] = []
    all_on: list[np.ndarray] = []
    all_orus: list[np.ndarray] = []
    ends: list[int] = []
    base = 0
    my_metrics: HintedOutline | None = None
    for part in data.parts:
        child = hint_glyph(font, part.glyph_index, ppem,
                           _track + (index,), _session)
        if not part.args_are_xy_values:
            raise HintingError("point-index component args")
        a, b, c, d4 = (t.data for t in part.transform)
        identity = (a, b, c, d4) == (0x4000, 0, 0, 0x4000)
        qi = child.points.copy()
        if not identity:
            # FT_Vector_Transform with the 2.14 entries widened to
            # 16.16 (<< 2): each term rounds via FT_MulFix
            m_xx, m_yx, m_xy, m_yy = a << 2, b << 2, c << 2, d4 << 2
            for i in range(len(qi)):
                px, py = int(child.points[i, 0]), int(child.points[i, 1])
                qi[i, 0] = mulfix(px, m_xx) + mulfix(py, m_xy)
                qi[i, 1] = mulfix(px, m_yx) + mulfix(py, m_yy)
        dx = engine.scale(part.argument1)
        dy = engine.scale(part.argument2)
        if part.round_xy_to_grid:
            dx = (dx + 32) & -64
            dy = (dy + 32) & -64
        qi[:, 0] += dx
        qi[:, 1] += dy
        all_pts.append(qi)
        all_on.append(child.on_curve)
        # FreeType does NOT transform or translate orus for composite
        # points — each component keeps its glyph-local font units
        all_orus.append(child.orus)
        ends.extend(base + e for e in child.ends)
        base += len(qi)
        if part.use_my_metrics and my_metrics is None:
            my_metrics = child
    pts = (np.concatenate(all_pts) if all_pts
           else np.zeros((0, 2), np.int64))
    on = (np.concatenate(all_on) if all_on
          else np.zeros(0, bool))
    orus = (np.concatenate(all_orus) if all_orus
            else np.zeros((0, 2), np.int64))
    if my_metrics is not None:
        phantoms = my_metrics.phantoms.copy()
        phantoms_fu = my_metrics.phantoms_fu.copy()
    else:
        phantoms = _scaled_phantoms(engine, font, index,
                                    desc.x_min, desc.y_max)
        phantoms_fu = _phantoms_fu(font, index, desc.x_min, desc.y_max)
    out = HintedOutline(pts, on, tuple(ends), phantoms, orus,
                        phantoms_fu)
    if hinting:
        if data.instructions:
            _run_glyph_program(engine, out, data.instructions,
                               is_composite=True, session=_session)
        # uninstructed composites skip TT_Hint_Glyph entirely, so
        # their phantoms stay UNROUNDED and the origin alignment uses
        # the raw pp1.x (DejaVu uni1F32: pp1 = -1/64 px -> +1 shift)
        if not _track:
            _origin_align(out)
    return out


def hinted_glyph(font, index: int, ppem: int):
    """Public entry: grid-fitted normalized :class:`Glyph` in F26Dot6
    pixel units (64 units = 1 px) plus the hinted advance (26.6).

    Falls back to the scaled unhinted outline on any interpreter
    error (graceful degradation, SURVEY §5.3)."""
    from fontrx.font.glyph import Box, Contour, Glyph, _normalize_contour

    no_bytecode = getattr(font, "_cff", None) is not None
    try:
        if no_bytecode:
            raise HintingError("CFF outlines carry no TrueType bytecode")
        out = hint_glyph(font, index, ppem)
    except HintingError as e:
        if not no_bytecode:
            log.warning("hinting failed for glyph %d at %d ppem: %s "
                        "(falling back to unhinted)", index, ppem, e)
        engine = font.hinting_engine(ppem)
        g = font.load_glyph(index)
        contours = []
        for c in g.contours:
            p = np.stack(
                [[engine.scale(int(v)) for v in c.points[:, 0]],
                 [engine.scale(int(v)) for v in c.points[:, 1]]],
                axis=1).astype(np.int32)
            contours.append(Contour(p))
        adv = engine.scale(int(font.advance_widths[index]))
        box = Box(engine.scale(g.box.x_min), engine.scale(g.box.y_min),
                  engine.scale(g.box.x_max), engine.scale(g.box.y_max))
        return Glyph(box, tuple(contours)), adv

    contours = []
    start = 0
    for end in out.ends:
        stop = end + 1
        pts = _normalize_contour(
            out.points[start:stop].astype(np.int32),
            out.on_curve[start:stop],
        )
        contours.append(Contour(pts))
        start = stop
    if contours:
        allp = np.concatenate([c.points for c in contours])
        box = Box(int(allp[:, 0].min()), int(allp[:, 1].min()),
                  int(allp[:, 0].max()), int(allp[:, 1].max()))
    else:
        box = Box(0, 0, 0, 0)
    return Glyph(box, tuple(contours)), out.advance
