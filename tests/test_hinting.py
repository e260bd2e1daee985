"""TrueType hinting interpreter tests.

No executable oracle exists in this environment (FreeType is not
importable; fontTools does not interpret), so the contract is the
instruction-set spec itself, tested three ways:

1. per-opcode unit tests on hand-assembled programs (fontTools
   ``ttProgram`` assembles the mnemonics) with hand-computed results;
2. whole-font smoke over DejaVu's real fpgm/prep/glyph programs
   (714 kB of production bytecode exercising functions, deltas,
   twilight, vectors) — every glyph at several sizes must execute
   cleanly and produce grid-coherent outlines;
3. integration: hinted outlines flow through the normalization +
   raster pipeline.

The reference PANICS on instructed glyphs
(``/root/reference/src/font/Glyph.zig:85``) — this whole surface is
beyond-reference capability.
"""

import numpy as np
import pytest
from fontTools.ttLib.tables.ttProgram import Program

from fontrx.font import ttf
from fontrx.font.font import Font
from fontrx.font.hinting import (
    AXIS_Y,
    Engine,
    Exec,
    GraphicsState,
    HintingError,
    Zone,
    hint_glyph,
    muldiv,
)
from tests.conftest import DEJAVU

from dataclasses import replace


def asm(*lines) -> bytes:
    p = Program()
    p.fromAssembly(list(lines))
    return p.getBytecode()


class StubFont:
    """Minimal font facade for engine construction.  make_exec passes
    upem == ppem * 64, which makes the FreeType 16.16 scale exactly
    1.0: one font unit == one F26Dot6 unit, so cvt entries and orus
    coordinates are specified directly in 26.6 pixels."""

    def __init__(self, cvt=(), fpgm=b"", prep=b"", upem=16):
        self.maxp = ttf.Maxp(1, 0, 0, 0, 0, 0, 0,
                             max_twilight=16, max_storage=64,
                             max_function_defs=64,
                             max_instruction_defs=16, max_stack=256)

        class _Info:
            units_per_em = upem

        self.info = _Info()
        self._cvt = np.asarray(cvt, np.int16)
        self._extra = {b"fpgm": fpgm, b"prep": prep}

    def _cvt_values(self):
        return self._cvt

    def _table_bytes(self, tag):
        return self._extra.get(tag, b"")


def make_exec(n_points=8, cvt=(), fpgm=b"", prep=b"", ppem=16):
    """Exec over a fresh zone; upem == ppem * 64 makes the scale
    exactly 1.0 (cvt entries and coordinates read in F26Dot6)."""
    font = StubFont(cvt=cvt, fpgm=fpgm, prep=prep, upem=ppem * 64)
    eng = Engine(font, ppem)
    assert eng.ok
    zone = Zone(n_points, ends=(n_points - 1,))
    ex = Exec(eng, zone, replace(eng.base_gs))
    return ex, zone


def set_points(zone, pts):
    # At unity scale orus (font units) == org (26.6) numerically.
    for i, (x, y) in enumerate(pts):
        zone.cur_x[i] = zone.org_x[i] = zone.orus_x[i] = x
        zone.cur_y[i] = zone.org_y[i] = zone.orus_y[i] = y


class TestStackAndArithmetic:
    def test_push_arith(self):
        ex, _ = make_exec()
        ex.run(asm("PUSHB[ ]", "3", "PUSHB[ ]", "4", "ADD[ ]"))
        assert ex.stack == [7]

    def test_wide_push_negative(self):
        ex, _ = make_exec()
        ex.run(asm("PUSHW[ ]", "-300", "ABS[ ]"))
        assert ex.stack == [300]

    def test_f26dot6_mul_div(self):
        ex, _ = make_exec()
        # 2.0 * 3.5 = 7.0 in 26.6
        ex.run(asm("PUSHW[ ]", "128", "PUSHW[ ]", "224", "MUL[ ]"))
        assert ex.stack == [448]
        ex.stack.clear()
        ex.run(asm("PUSHW[ ]", "448", "PUSHW[ ]", "128", "DIV[ ]"))
        assert ex.stack == [224]

    def test_div_by_zero_errors(self):
        # FreeType raises Divide_By_Zero here (ttinterp Ins_DIV);
        # matching that keeps the differential oracle exact.
        ex, _ = make_exec()
        with pytest.raises(HintingError):
            ex.run(asm("PUSHW[ ]", "64", "PUSHB[ ]", "0", "DIV[ ]"))

    def test_stack_shuffles(self):
        ex, _ = make_exec()
        ex.run(asm("PUSHB[ ]", "1", "PUSHB[ ]", "2", "PUSHB[ ]", "3",
                   "ROLL[ ]"))
        assert ex.stack == [2, 3, 1]
        ex.stack.clear()
        ex.run(asm("PUSHB[ ]", "9", "PUSHB[ ]", "8", "SWAP[ ]",
                   "DEPTH[ ]"))
        assert ex.stack == [8, 9, 2]
        ex.stack.clear()
        ex.run(asm("PUSHB[ ]", "5", "PUSHB[ ]", "6", "PUSHB[ ]", "2",
                   "CINDEX[ ]"))
        assert ex.stack == [5, 6, 5]
        ex.stack.clear()
        ex.run(asm("PUSHB[ ]", "5", "PUSHB[ ]", "6", "PUSHB[ ]", "2",
                   "MINDEX[ ]"))
        assert ex.stack == [6, 5]

    def test_comparisons_and_logic(self):
        ex, _ = make_exec()
        ex.run(asm("PUSHB[ ]", "3", "PUSHB[ ]", "4", "LT[ ]",
                   "PUSHB[ ]", "1", "AND[ ]", "NOT[ ]"))
        assert ex.stack == [0]

    def test_floor_ceiling(self):
        ex, _ = make_exec()
        ex.run(asm("PUSHW[ ]", "-65", "FLOOR[ ]"))
        assert ex.stack == [-128]
        ex.stack.clear()
        ex.run(asm("PUSHW[ ]", "65", "CEILING[ ]"))
        assert ex.stack == [128]

    def test_min_max(self):
        ex, _ = make_exec()
        ex.run(asm("PUSHW[ ]", "-3", "PUSHB[ ]", "7", "MAX[ ]"))
        assert ex.stack == [7]

    def test_storage(self):
        ex, _ = make_exec()
        ex.run(asm("PUSHB[ ]", "5", "PUSHW[ ]", "777", "WS[ ]",
                   "PUSHB[ ]", "5", "RS[ ]"))
        assert ex.stack == [777]


class TestRounding:
    def round_with(self, state_ins, v):
        ex, _ = make_exec()
        ex.run(asm(state_ins, "PUSHW[ ]", str(v), "ROUND[00]"))
        return ex.stack[-1]

    def test_rtg(self):
        assert self.round_with("RTG[ ]", 32) == 64
        assert self.round_with("RTG[ ]", 31) == 0
        assert self.round_with("RTG[ ]", 96) == 128
        assert self.round_with("RTG[ ]", -32) == -64
        assert self.round_with("RTG[ ]", -31) == 0

    def test_rthg(self):
        assert self.round_with("RTHG[ ]", 0) == 32
        assert self.round_with("RTHG[ ]", 64) == 96
        assert self.round_with("RTHG[ ]", 63) == 32

    def test_rtdg(self):
        assert self.round_with("RTDG[ ]", 20) == 32
        assert self.round_with("RTDG[ ]", 15) == 0

    def test_rdtg_rutg(self):
        assert self.round_with("RDTG[ ]", 63) == 0
        assert self.round_with("RDTG[ ]", 64) == 64
        assert self.round_with("RUTG[ ]", 1) == 64
        assert self.round_with("RUTG[ ]", 0) == 0

    def test_roff(self):
        assert self.round_with("ROFF[ ]", 37) == 37

    def test_sround_period_phase(self):
        # period 64, phase period/2 = 32, threshold 4/8*period = wait:
        # selector 0x58 = 01 01 1000b: period=64, phase=period/4=16,
        # threshold=(8-4)*64/8=32
        ex, _ = make_exec()
        ex.run(asm("PUSHB[ ]", "88", "SROUND[ ]",
                   "PUSHW[ ]", "48", "ROUND[00]"))
        # 48 + 32 - 16 = 64 -> floor to 64 -> + 16 = 80
        assert ex.stack == [80]

    def test_nround_identity(self):
        ex, _ = make_exec()
        ex.run(asm("PUSHW[ ]", "37", "NROUND[00]"))
        assert ex.stack == [37]


class TestControlFlow:
    def test_if_else(self):
        ex, _ = make_exec()
        ex.run(asm("PUSHB[ ]", "1", "IF[ ]", "PUSHB[ ]", "10",
                   "ELSE[ ]", "PUSHB[ ]", "20", "EIF[ ]"))
        assert ex.stack == [10]
        ex.stack.clear()
        ex.run(asm("PUSHB[ ]", "0", "IF[ ]", "PUSHB[ ]", "10",
                   "ELSE[ ]", "PUSHB[ ]", "20", "EIF[ ]"))
        assert ex.stack == [20]

    def test_nested_if_skip(self):
        ex, _ = make_exec()
        ex.run(asm("PUSHB[ ]", "0",
                   "IF[ ]",
                   "PUSHB[ ]", "1", "IF[ ]", "PUSHB[ ]", "99", "EIF[ ]",
                   "ELSE[ ]", "PUSHB[ ]", "7", "EIF[ ]"))
        assert ex.stack == [7]

    def test_fdef_call_loopcall(self):
        fpgm = asm("PUSHB[ ]", "2", "FDEF[ ]",
                   "PUSHB[ ]", "5", "ADD[ ]", "ENDF[ ]")
        ex, _ = make_exec(fpgm=fpgm)
        ex.run(asm("PUSHB[ ]", "0", "PUSHB[ ]", "2", "CALL[ ]"))
        assert ex.stack == [5]
        ex.stack.clear()
        ex.run(asm("PUSHB[ ]", "0", "PUSHB[ ]", "4", "PUSHB[ ]", "2",
                   "LOOPCALL[ ]"))
        assert ex.stack == [20]

    def test_jmpr_skips(self):
        # bytes: [B0 04 | 1C | B0 63 | B0 01]; JMPR at pc=2, offset
        # +3 lands on the final PUSHB (offsets are relative to the
        # JMPR instruction itself)
        ex, _ = make_exec()
        ex.run(asm("PUSHB[ ]", "3", "JMPR[ ]",
                   "PUSHB[ ]", "99",
                   "PUSHB[ ]", "1"))
        assert ex.stack == [1]

    def test_jrot_backward_loop(self):
        # counter loop: push 3; body decrements; JROT jumps back while
        # the DUPed counter is nonzero.  Exercises backward jumps.
        ex, _ = make_exec()
        # bytes: [B0 03 | B0 01 | 61 | 20 | B8 FFF8 | 23 | 78]:
        # JROT at pc=10, offset -8 -> pc=2 (the PUSHB of the decrement)
        ex.run(asm("PUSHB[ ]", "3",
                   "PUSHB[ ]", "1", "SUB[ ]",
                   "DUP[ ]",
                   "PUSHW[ ]", "-8", "SWAP[ ]",
                   "JROT[ ]"))
        assert ex.stack == [0]

    def test_idef(self):
        # define opcode 0x91 (unassigned) to push 42
        fpgm = asm("PUSHB[ ]", "145", "IDEF[ ]",
                   "PUSHB[ ]", "42", "ENDF[ ]")
        ex, _ = make_exec(fpgm=fpgm)
        ex.run(bytes([0x91]))
        assert ex.stack == [42]

    def test_budget_guard(self):
        ex, _ = make_exec()
        ex.budget = 1000
        with pytest.raises(HintingError):
            # infinite backward jump
            ex.run(asm("PUSHW[ ]", "0", "POP[ ]",
                       "PUSHW[ ]", "-4", "JMPR[ ]"))


class TestPointOps:
    def test_mdap_rounds_to_grid(self):
        ex, zone = make_exec()
        set_points(zone, [(100, 50)])
        ex.run(asm("PUSHB[ ]", "0", "MDAP[1]"))
        assert zone.cur_x[0] == 128          # 100 -> 1.5625px -> 2px
        assert zone.cur_y[0] == 50           # x-axis projection only
        assert zone.touch_x[0] and not zone.touch_y[0]
        assert ex.gs.rp0 == ex.gs.rp1 == 0

    def test_mdap_y_axis(self):
        ex, zone = make_exec()
        set_points(zone, [(100, 50)])
        ex.run(asm("SVTCA[0]", "PUSHB[ ]", "0", "MDAP[1]"))
        assert zone.cur_y[0] == 64
        assert zone.cur_x[0] == 100

    def test_miap_moves_to_cvt(self):
        # cvt[0] = 192 font units = 3 px at unity scale
        ex, zone = make_exec(cvt=[192])
        set_points(zone, [(100, 0)])
        # cut-in: |192 - 100| = 92 > 68 -> falls back to original
        ex.run(asm("PUSHB[ ]", "0", "PUSHB[ ]", "0", "MIAP[1]"))
        assert zone.cur_x[0] == 128          # round(100)
        # without round/cut-in (MIAP[0]) the cvt value is absolute
        ex2, zone2 = make_exec(cvt=[192])
        set_points(zone2, [(100, 0)])
        ex2.run(asm("PUSHB[ ]", "0", "PUSHB[ ]", "0", "MIAP[0]"))
        assert zone2.cur_x[0] == 192

    def test_mdrp_keeps_original_distance(self):
        ex, zone = make_exec()
        set_points(zone, [(64, 0), (200, 0)])
        # move rp0 (point 0) somewhere else first, then MDRP[00000]
        # restores p1's distance-to-rp0 (200-64=136, unrounded)
        zone.cur_x[0] = 90
        ex.run(asm("PUSHB[ ]", "0", "SRP0[ ]",
                   "PUSHB[ ]", "1", "MDRP[00000]"))
        assert zone.cur_x[1] == 90 + 136
        assert ex.gs.rp2 == 1 and ex.gs.rp0 == 0

    def test_mdrp_round_and_set_rp0(self):
        ex, zone = make_exec()
        set_points(zone, [(0, 0), (100, 0)])
        ex.run(asm("PUSHB[ ]", "0", "SRP0[ ]",
                   "PUSHB[ ]", "1", "MDRP[10100]"))
        assert zone.cur_x[1] == 128          # round(100)
        assert ex.gs.rp0 == 1                # set-rp0 flag

    def test_mdrp_minimum_distance(self):
        ex, zone = make_exec()
        set_points(zone, [(0, 0), (20, 0)])
        # min_dist default 64: MDRP[01000] (min dist, no round)
        ex.run(asm("PUSHB[ ]", "0", "SRP0[ ]",
                   "PUSHB[ ]", "1", "MDRP[01000]"))
        assert zone.cur_x[1] == 64

    def test_mirp_uses_cvt_distance(self):
        ex, zone = make_exec(cvt=[128])      # 2px
        set_points(zone, [(0, 0), (120, 0)])
        # |cvt 128 - org 120| = 8 < 68 cut-in -> use cvt, round -> 128
        ex.run(asm("PUSHB[ ]", "0", "SRP0[ ]",
                   "PUSHB[ ]", "1", "PUSHB[ ]", "0", "MIRP[10100]"))
        assert zone.cur_x[1] == 128

    def test_mirp_cut_in_rejects_far_cvt(self):
        ex, zone = make_exec(cvt=[320])      # 5px, far from 120
        set_points(zone, [(0, 0), (120, 0)])
        ex.run(asm("PUSHB[ ]", "0", "SRP0[ ]",
                   "PUSHB[ ]", "1", "PUSHB[ ]", "0", "MIRP[10100]"))
        assert zone.cur_x[1] == 128          # round(org 120)

    def test_mirp_autoflip(self):
        ex, zone = make_exec(cvt=[128])      # +128 vs org -120
        set_points(zone, [(0, 0), (-120, 0)])
        ex.run(asm("PUSHB[ ]", "0", "SRP0[ ]",
                   "PUSHB[ ]", "1", "PUSHB[ ]", "0", "MIRP[10100]"))
        assert zone.cur_x[1] == -128         # flipped sign, cut-in ok

    def test_msirp_sets_exact_distance(self):
        ex, zone = make_exec()
        set_points(zone, [(64, 0), (0, 0)])
        ex.run(asm("PUSHB[ ]", "0", "SRP0[ ]",
                   "PUSHB[ ]", "1", "PUSHW[ ]", "100", "MSIRP[0]"))
        assert zone.cur_x[1] == 164

    def test_ip_interpolates_ratio(self):
        ex, zone = make_exec()
        set_points(zone, [(0, 0), (100, 0), (25, 0)])
        # stretch: move p1 from 100 to 200; IP p2 keeps the 25% ratio
        zone.cur_x[1] = 200
        zone.touch_x[1] = True
        ex.run(asm("PUSHB[ ]", "0", "SRP1[ ]", "PUSHB[ ]", "1",
                   "SRP2[ ]", "PUSHB[ ]", "2", "IP[ ]"))
        assert zone.cur_x[2] == 50

    def test_alignrp(self):
        ex, zone = make_exec()
        set_points(zone, [(64, 0), (100, 0)])
        ex.run(asm("PUSHB[ ]", "0", "SRP0[ ]",
                   "PUSHB[ ]", "1", "ALIGNRP[ ]"))
        assert zone.cur_x[1] == 64

    def test_shpix_moves_along_freedom(self):
        ex, zone = make_exec()
        set_points(zone, [(10, 10)])
        ex.run(asm("SFVTCA[0]",               # freedom = y
                   "PUSHB[ ]", "0", "PUSHW[ ]", "32", "SHPIX[ ]"))
        assert (zone.cur_x[0], zone.cur_y[0]) == (10, 42)
        assert zone.touch_y[0] and not zone.touch_x[0]

    def test_shp_propagates_reference_move(self):
        ex, zone = make_exec()
        set_points(zone, [(0, 0), (50, 0)])
        zone.cur_x[0] = 30                    # rp moved +30
        ex.run(asm("PUSHB[ ]", "0", "SRP1[ ]",
                   "PUSHB[ ]", "1", "SHP[1]"))
        assert zone.cur_x[1] == 80

    def test_sloop_zero_voids_next_loop_ins(self):
        # DejaVu relies on SLOOP 0 making the next SHP pop nothing
        ex, zone = make_exec()
        set_points(zone, [(0, 0), (50, 0)])
        ex.run(asm("PUSHB[ ]", "7",
                   "PUSHB[ ]", "0", "SLOOP[ ]", "SHP[1]"))
        assert ex.stack == [7]               # SHP consumed nothing
        assert ex.gs.loop == 1

    def test_isect(self):
        ex, zone = make_exec(n_points=5)
        set_points(zone, [(0, 0), (128, 128), (0, 128), (128, 0),
                          (999, 999)])
        # lines (p0-p1) and (p2-p3) cross at (64, 64)
        ex.run(asm("PUSHB[ ]", "4", "PUSHB[ ]", "0", "PUSHB[ ]", "1",
                   "PUSHB[ ]", "2", "PUSHB[ ]", "3", "ISECT[ ]"))
        assert (zone.cur_x[4], zone.cur_y[4]) == (64, 64)

    def test_flip_point_and_ranges(self):
        ex, zone = make_exec(n_points=4)
        zone.on_curve[:] = [True, False, True, False]
        ex.run(asm("PUSHB[ ]", "0", "FLIPPT[ ]",
                   "PUSHB[ ]", "1", "PUSHB[ ]", "2", "FLIPRGON[ ]"))
        assert list(zone.on_curve) == [False, True, True, False]
        ex.run(asm("PUSHB[ ]", "0", "PUSHB[ ]", "3", "FLIPRGOFF[ ]"))
        assert not zone.on_curve.any()

    def test_iup_interpolates_untouched(self):
        ex, zone = make_exec(n_points=4)
        set_points(zone, [(0, 0), (40, 0), (80, 0), (120, 0)])
        # touch and move the two ends in x; IUP[1] interpolates p1, p2
        zone.cur_x[0] = 0
        zone.cur_x[3] = 240
        zone.touch_x[0] = zone.touch_x[3] = True
        ex.run(asm("IUP[1]"))
        assert zone.cur_x[1] == 80 and zone.cur_x[2] == 160

    def test_iup_shifts_outside_span(self):
        ex, zone = make_exec(n_points=3)
        set_points(zone, [(50, 0), (100, 0), (10, 0)])
        # touched points at org 50 and 100, both shifted +14; p2's
        # org 10 lies OUTSIDE [50, 100] -> shifted by the nearer end
        zone.cur_x[0] = 64
        zone.cur_x[1] = 114
        zone.touch_x[0] = zone.touch_x[1] = True
        ex.run(asm("IUP[1]"))
        assert zone.cur_x[2] == 24

    def test_deltap_applies_at_matching_ppem_only(self):
        # delta_base 9: arg 0x6F = ppem 9+6=15 -> not 16, no move;
        # arg 0x7F = ppem 16, magnitude 0xF-8=7 -> +1 -> 8 steps of
        # 64>>3 = 8 -> +64
        ex, zone = make_exec()
        set_points(zone, [(0, 0)])
        ex.run(asm("PUSHB[ ]", "111", "PUSHB[ ]", "0",
                   "PUSHB[ ]", "1", "DELTAP1[ ]"))
        assert zone.cur_x[0] == 0
        ex.run(asm("PUSHB[ ]", "127", "PUSHB[ ]", "0",
                   "PUSHB[ ]", "1", "DELTAP1[ ]"))
        assert zone.cur_x[0] == 64

    def test_deltac(self):
        ex, _ = make_exec(cvt=[64])          # 1px at unity scale
        # arg 0x70: ppem 16, mag 0x0-8 = -8 -> -8 * 8 = -64
        ex.run(asm("PUSHB[ ]", "112", "PUSHB[ ]", "0",
                   "PUSHB[ ]", "1", "DELTAC1[ ]"))
        assert ex.e.cvt[0] == 64 - 64

    def test_utp(self):
        ex, zone = make_exec()
        zone.touch_x[0] = zone.touch_y[0] = True
        ex.run(asm("PUSHB[ ]", "0", "UTP[ ]"))
        assert not zone.touch_x[0] and zone.touch_y[0]


class TestVectorsAndMeasurement:
    def test_svtca_gpv_gfv(self):
        ex, _ = make_exec()
        ex.run(asm("SVTCA[0]", "GPV[ ]", "GFV[ ]"))
        assert ex.stack == [0, 0x4000, 0, 0x4000]

    def test_spvtl_diagonal(self):
        ex, zone = make_exec()
        set_points(zone, [(0, 0), (100, 100)])
        ex.run(asm("PUSHB[ ]", "1", "PUSHB[ ]", "0", "SPVTL[0]",
                   "GPV[ ]"))
        x, y = ex.stack
        assert abs(x - 11585) <= 1 and abs(y - 11585) <= 1

    def test_spvfs_normalizes(self):
        ex, _ = make_exec()
        ex.run(asm("PUSHW[ ]", "300", "PUSHW[ ]", "400", "SPVFS[ ]",
                   "GPV[ ]"))
        x, y = ex.stack
        assert abs(x - int(0.6 * 16384)) <= 1
        assert abs(y - int(0.8 * 16384)) <= 1

    def test_gc_measures_projection(self):
        ex, zone = make_exec()
        set_points(zone, [(100, 37)])
        ex.run(asm("PUSHB[ ]", "0", "GC[0]",
                   "SVTCA[0]", "PUSHB[ ]", "0", "GC[0]"))
        assert ex.stack == [100, 37]

    def test_md_current_vs_original(self):
        ex, zone = make_exec()
        set_points(zone, [(0, 0), (100, 0)])
        zone.cur_x[1] = 130
        # MD measures (first-pushed, zp0) minus (last-pushed, zp1)
        ex.run(asm("PUSHB[ ]", "1", "PUSHB[ ]", "0", "MD[0]",
                   "PUSHB[ ]", "1", "PUSHB[ ]", "0", "MD[1]"))
        assert ex.stack == [130, 100]

    def test_scfs(self):
        ex, zone = make_exec()
        set_points(zone, [(10, 0)])
        ex.run(asm("PUSHB[ ]", "0", "PUSHW[ ]", "200", "SCFS[ ]"))
        assert zone.cur_x[0] == 200

    def test_mppem_getinfo(self):
        ex, _ = make_exec(ppem=16)
        ex.run(asm("MPPEM[ ]", "PUSHB[ ]", "1", "GETINFO[ ]",
                   "PUSHB[ ]", "32", "GETINFO[ ]"))
        # GETINFO(1) == 35: the full bidirectional interpreter
        # (FreeType interpreter-version 35), the version the FT
        # differential pins against
        assert ex.stack == [16, 35, 1 << 12]


class TestTwilight:
    def test_miap_establishes_twilight_point(self):
        ex, _ = make_exec(cvt=[192])
        ex.run(asm("PUSHB[ ]", "0", "SZP0[ ]",
                   "PUSHB[ ]", "2", "PUSHB[ ]", "0", "MIAP[0]"))
        assert ex.zone0.cur_x[2] == 192
        assert ex.zone0.org_x[2] == 192

    def test_prep_state_persists_minus_vectors(self):
        prep = asm("SVTCA[0]",                    # y vectors (reset)
                   "PUSHB[ ]", "48", "SMD[ ]",    # persists
                   "RTHG[ ]")                     # persists
        ex, _ = make_exec(prep=prep)
        assert ex.gs.min_dist == 48
        assert ex.gs.round_phase == 32
        assert ex.gs.projection == (0x4000, 0)    # reset to x


class TestDejaVuIntegration:
    @pytest.fixture(scope="class")
    def font(self):
        return Font.open(DEJAVU)

    def test_whole_font_executes(self, font):
        """Every instructed glyph at several sizes runs the real
        fpgm/prep/glyph programs without error and stays finite."""
        for ppem in (12, 16, 40):
            for gid in range(0, font.maxp.num_glyphs, 37):
                out = hint_glyph(font, gid, ppem)
                if len(out.points):
                    span = max(abs(int(out.points[:, 0].max())),
                               abs(int(out.points[:, 1].max())))
                    assert span < 64 * (ppem + 1) * 4

    def test_hinting_moves_points_to_grid(self, font):
        """Grid fitting must actually fit: at 16 ppem the hinted 'A'
        has its extrema on pixel boundaries (DejaVu rounds stems and
        the baseline), unlike the raw scaled outline."""
        idx = font.glyph_index("A")
        g, adv = font.hinted_glyph(idx, 16)
        assert g.box.y_min % 64 == 0
        assert g.box.y_max % 64 == 0
        eng = font.hinting_engine(16)
        desc, data = font._raw_glyph(idx)
        unh = np.stack(
            [[eng.scale(int(x)) for x in data.coordinates[:, 0]],
             [eng.scale(int(y)) for y in data.coordinates[:, 1]]],
            axis=1)
        out = hint_glyph(font, idx, 16)
        assert (np.abs(out.points - unh).sum(axis=1) > 0).all()
        # movement bounded (hints nudge, they don't rearrange)
        assert np.abs(out.points - unh).max() < 2 * 64

    def test_composite_hinted(self, font):
        """Composites: components hinted, combined outline runs the
        composite's own program ('onehalf' exercises SLOOP 0)."""
        for ch in ("Á", "½"):       # Aacute, onehalf
            idx = font.glyph_index(ch)
            g, adv = font.hinted_glyph(idx, 12)
            assert g.contours
            assert adv > 0

    def test_stem_width_consistency(self, font):
        """The point of hinting: at a small size, the two vertical
        stems of 'H' get the SAME pixel width after grid fitting."""
        idx = font.glyph_index("H")
        out = hint_glyph(font, idx, 12)
        xs = np.sort(np.unique(out.points[:, 0]))
        # DejaVu 'H': 4 distinct x positions (two stems)
        assert len(xs) == 4
        w1 = xs[1] - xs[0]
        w2 = xs[3] - xs[2]
        assert w1 == w2
        assert w1 % 64 == 0 or w1 > 0     # a crisp, equal stem pair

    def test_hinted_advance_plausible(self, font):
        idx = font.glyph_index("m")
        for ppem in (12, 24):
            _, adv = font.hinted_glyph(idx, ppem)
            unscaled = int(font.advance_widths[idx])
            expected = unscaled * ppem * 64 / font.info.units_per_em
            assert abs(adv - expected) <= 96   # within 1.5 px

    def test_fallback_on_cff(self):
        """CFF fonts have no TrueType bytecode; hinted_glyph degrades
        to the scaled outline via the HintingError fallback."""
        f = Font.open("tests/data/cidtest.otf")
        g, adv = f.hinted_glyph(1, 16)
        assert adv >= 0

    def test_raster_integration(self, font):
        """Hinted outlines flow through normalization + the winding
        oracle: render hinted 'o' at 14 ppem, expect plausible ink."""
        from fontrx.kernels import oracle

        idx = font.glyph_index("o")
        g, _ = font.hinted_glyph(idx, 14)
        segs = []
        for c in g.contours:
            p = c.points
            for i in range(0, len(p) - 1, 2):
                segs.append([p[i], p[i + 1], p[i + 2]])
        segs = np.asarray(segs, np.float32)
        size = 16
        xs = (np.arange(size) * 64 + g.box.x_min).astype(np.float32)
        ys = (g.box.y_max - np.arange(size) * 64).astype(np.float32)
        w = oracle.winding_at(segs, xs[None, :], ys[:, None])
        filled = (w != 0).sum()
        assert 20 < filled < size * size      # a ring of ink


class TestMulDiv:
    def test_rounding_half_away(self):
        assert muldiv(3, 64, 128) == 2       # 1.5 -> 2
        assert muldiv(-3, 64, 128) == -2
        assert muldiv(5, 64, 128) == 3       # 2.5 -> 3
        with pytest.raises(HintingError):
            muldiv(1, 1, 0)


class TestHintContext:
    """``Font.hint_context``: the bridge from the bytecode interpreter
    to hinted GPOS positioning (device tables / contour-point anchors,
    ``fontrx/font/gpos_shape.py``)."""

    @pytest.fixture(scope="class")
    def font(self):
        return Font.open(DEJAVU)

    def test_point_matches_hinted_outline(self, font):
        idx = font.glyph_index("A")
        hc = font.hint_context(16)
        out = hint_glyph(font, idx, 16)
        for pi in (0, len(out.points) - 1):
            assert hc.point(idx, pi) == (
                int(out.points[pi, 0]), int(out.points[pi, 1]))

    def test_phantom_points_addressable(self, font):
        """Indices past the outline address the four phantoms, per
        spec (anchor points may reference them)."""
        idx = font.glyph_index("A")
        hc = font.hint_context(16)
        out = hint_glyph(font, idx, 16)
        n = len(out.points)
        for k in range(4):
            assert hc.point(idx, n + k) == (
                int(out.phantoms[k, 0]), int(out.phantoms[k, 1]))
        assert hc.point(idx, n + 4) is None

    def test_units_per_px(self, font):
        hc = font.hint_context(16)
        assert hc.ppem == 16
        assert hc.units_per_px == font.info.units_per_em / 16

    def test_cff_font_degrades(self):
        """CFF outlines carry no TrueType point numbering: the
        resolver returns None and anchors keep bare coordinates."""
        f = Font.open("tests/data/cidtest.otf")
        assert f.hint_context(16).point(1, 0) is None

    def test_hinted_kern_cli_narrows_av(self, tmp_path):
        """End-to-end: the hinted CLI path routes kerning through the
        full GPOS engine (with the hint context) — 'AV' must come out
        narrower than unkerned at the same ppem."""
        from fontrx.cli.main import main
        from fontrx.io.qoi import decode

        plain = tmp_path / "p.qoi"
        kerned = tmp_path / "k.qoi"
        assert main(["-f", DEJAVU, "-t", "AVAVAV", "-m", "fill",
                     "-s", "24", "--hinting", "-o", str(plain)]) == 0
        assert main(["-f", DEJAVU, "-t", "AVAVAV", "-m", "fill",
                     "-s", "24", "--hinting", "-k",
                     "-o", str(kerned)]) == 0
        wp = decode(plain.read_bytes()).shape[1]
        wk = decode(kerned.read_bytes()).shape[1]
        assert wk < wp
        # grid fitting holds: kerned hinted fill stays hard-edged
        img = decode(kerned.read_bytes())
        assert set(np.unique(img)) <= {0, 255}


class TestGasp:
    def test_dejavu_ranges(self):
        """DejaVu ships a gasp table; behaviors resolve per size and
        the largest range covers everything above."""
        font = Font.open(DEJAVU)
        for ppem in (4, 8, 16, 100, 5000):
            b = font.gasp_behavior(ppem)
            assert 0 <= b <= 0xF
        # fontTools differential
        from fontTools.ttLib import TTFont

        g = TTFont(DEJAVU)["gasp"].gaspRange
        for ppem in (4, 9, 17, 240):
            exp = None
            for mx in sorted(g):
                if ppem <= mx:
                    exp = g[mx]
                    break
            if exp is None:
                exp = g[max(g)]
            assert font.gasp_behavior(ppem) == exp, ppem

    def test_absent_table_default(self):
        f = Font.open("tests/data/colrtest.ttf")
        assert f.gasp_behavior(12) == 0x3
