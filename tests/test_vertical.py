"""Vertical text layout (vhea/vmtx + GSUB vert) — a capability
extension (the reference's pen is horizontal-only,
``src/Appli.zig:343-351``)."""

import numpy as np
import pytest

from fontrx.font.font import Font
from tests import ttf_builder as tb


def _vfont(num_metrics=3, run_out=(), with_vert_gsub=False):
    """Three glyphs mapped to A/B/C with full vertical metrics."""
    cmap = tb.build_cmap([(3, 1, tb.build_cmap_format4([(65, 67, 0, [1, 2, 3])]))])
    tri = tb.build_simple_glyph(
        [[(0, 0, True), (50, 100, False), (100, 0, True)]],
        box=(0, 0, 100, 100),
    )
    glyphs = [b"", tri, tri, tri]
    metrics = [(1000, 50), (800, 20), (900, 10), (700, 5)][:num_metrics]
    extra = {
        b"vhea": tb.build_vhea(ascent=500, descent=-500, line_gap=100,
                               num_metrics=num_metrics),
        b"vmtx": tb.build_vmtx(metrics, run_out_tsb=list(run_out)),
    }
    if with_vert_gsub:
        extra[b"GSUB"] = tb.build_gsub(
            [(b"vert", [0])], [(1, 0, [tb.gsub_single({1: 3})])]
        )
    return Font(tb.build_font(glyphs, cmap, extra_tables=extra))


class TestVmtxParse:
    def test_fields_and_runout(self):
        f = _vfont(num_metrics=2, run_out=[7, 9])
        vhea, ah, tsb = f.vertical_metrics
        assert (vhea.ascent, vhea.descent, vhea.line_gap) == (500, -500, 100)
        # 4 glyphs, 2 long metrics: advances run out with the last
        np.testing.assert_array_equal(ah, [1000, 800, 800, 800])
        np.testing.assert_array_equal(tsb, [50, 20, 7, 9])

    def test_absent_tables(self, dejavu):
        assert dejavu.vertical_metrics is None

    def test_cached(self):
        f = _vfont()
        assert f.vertical_metrics is f.vertical_metrics


class TestVerticalLayout:
    def test_positions_from_vmtx(self):
        from fontrx.scene.layout import layout_text

        f = _vfont(num_metrics=4)
        lt = layout_text(f, "AB", vertical=True)
        # pitch = 500 - (-500) + 100 = 1100; one column
        assert lt.width == 1100.0
        a, b = lt.instances
        # glyph 1 (A): aw=500 -> x = 1100/2 - 250; tsb=20? no: glyph 1
        # has vmtx metric index 1 (glyph id 1): (800, 20)
        assert a.x == 1100 / 2 - 250
        assert a.y == 0 - 20 - 100     # pen 0 - A's tsb (20) - ymax
        # pen dropped by A's advance height 800; B (glyph 2) hangs with
        # its own tsb (10)
        assert b.y == -800 - 10 - 100
        assert lt.height == 800 + 900  # A's then B's advance heights

    def test_columns_right_to_left(self):
        from fontrx.scene.layout import layout_text

        f = _vfont(num_metrics=4)
        lt = layout_text(f, "A\nB", vertical=True)
        assert lt.width == 2200.0
        a, b = lt.instances
        assert a.x > b.x  # first line is the rightmost column

    def test_vert_feature_applied(self):
        from fontrx.scene.layout import layout_text

        f = _vfont(num_metrics=4, with_vert_gsub=True)
        lt = layout_text(f, "A", vertical=True)
        # GSUB vert maps glyph 1 -> 3; slot must be the substituted one
        assert len(lt.batch) == 1
        horizontal = layout_text(f, "A")
        # vertical form hangs with glyph 3's metrics (700, 5)
        assert lt.instances[0].y == -5 - 100
        assert horizontal.instances[0].y == 0

    def test_fallback_without_vmtx(self, dejavu):
        from fontrx.scene.layout import layout_text

        lt = layout_text(dejavu, "AB", vertical=True)
        upem = dejavu.info.units_per_em
        assert lt.width == float(upem)
        a, b = lt.instances
        assert a.y == -float(dejavu.info.ascent)
        assert b.y == a.y - upem
        assert lt.height == 2.0 * upem


class TestCLIVertical:
    FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"

    def test_vertical_flag_renders(self, tmp_path):
        from fontrx.cli.main import main
        from fontrx.io.qoi import decode

        out = tmp_path / "v.qoi"
        assert main(["-f", self.FONT, "-t", "AB", "-m", "fill",
                     "-s", "32", "--vertical", "-o", str(out)]) == 0
        img = np.asarray(decode(out.read_bytes()))
        # one column, two glyphs stacked: page taller than wide
        assert img.shape[0] > img.shape[1]
        assert img.any()
        # ink in both the top and bottom halves
        h = img.shape[0] // 2
        assert img[:h].any() and img[h:].any()


class TestVkrn:
    """Vertical pair kerning through the GPOS engine
    (``positioning`` + ``kern=True`` in vertical mode): a ``vkrn``
    PairPos with yAdvance deltas must tighten the pen drop."""

    def test_vkrn_adjusts_pen_drop(self):
        import tests.ttf_builder as tb
        from fontrx.font.font import Font
        from fontrx.scene.layout import layout_text

        Z = (0, 0, 0, 0)
        # glyphs 1('A') and 2('B'); pair (1, 2) pulls B 150 units up
        gpos = tb.build_gpos(
            [(b"vkrn", [0])],
            [(2, 0, [tb.gpos_pair1(
                {1: [(2, (0, 0, 0, -150), Z)]}, vf1=0x8, vf2=0,
            )])],
        )
        glyphs = [
            tb.build_simple_glyph(
                [[(50, 0, True), (450, 0, True), (250, 600, True)]]
            ),
        ] * 3
        cmap = tb.build_cmap(
            [(0, 3, tb.build_cmap_format4(
                [(65, 66, 1 - 65, None), (0xFFFF, 0xFFFF, 1, None)]
            ))]
        )
        font = Font(tb.build_font(
            glyphs, cmap,
            extra_tables={
                b"GPOS": gpos,
                b"vhea": tb.build_vhea(ascent=500, descent=-500,
                                       num_metrics=3),
                b"vmtx": tb.build_vmtx([(1000, 100)] * 3),
            },
        ))
        base = layout_text(font, "AB", vertical=True)
        kerned = layout_text(
            font, "AB", vertical=True, kern=True, positioning=(),
        )
        # the second glyph hangs 150 units higher (pen drop tightened)
        dy_base = base.instances[0].y - base.instances[1].y
        dy_kern = kerned.instances[0].y - kerned.instances[1].y
        assert dy_base - dy_kern == 150


class TestVerticalBidi:
    """bidi=True composes with vertical=True: UAX#9 levels resolve per
    column and L2 reordering runs along the column axis (an RTL run's
    cells read bottom-to-top within the run extent)."""

    def _ys(self, lt, font):
        return {
            font.charmap.char_for_glyph(lt.slot_gids[i.glyph_slot]): i.y
            for i in lt.instances
        }

    def test_pure_ltr_identity(self, dejavu):
        from fontrx.scene.layout import layout_text

        a = layout_text(dejavu, "hello", vertical=True)
        b = layout_text(dejavu, "hello", vertical=True, bidi=True)
        assert [(i.glyph_slot, i.x, i.y) for i in a.instances] == \
               [(i.glyph_slot, i.x, i.y) for i in b.instances]

    def test_rtl_run_reverses_down_the_column(self, dejavu):
        from fontrx.scene.layout import layout_text

        lt = layout_text(dejavu, "ab שלום", vertical=True, bidi=True)
        ys = self._ys(lt, dejavu)
        shin, mem = 0x05E9, 0x05DD
        # Latin keeps logical top-to-bottom order (pen drops: y falls)
        assert ys[ord("a")] > ys[ord("b")]
        # the Hebrew run reverses within its extent: the first logical
        # letter (shin) sits at the BOTTOM of the run
        assert ys[shin] < ys[mem]
        # run order down the column: latin above the hebrew span
        assert ys[ord("b")] > max(ys[shin], ys[mem])

    def test_rtl_base_column(self, dejavu):
        from fontrx.scene.layout import layout_text

        lt = layout_text(
            dejavu, "שלום ab", vertical=True, bidi=True, rtl=True)
        ys = self._ys(lt, dejavu)
        shin, mem = 0x05E9, 0x05DD
        # RTL base: reading starts at the BOTTOM of the column (the
        # vertical analog of "starts at the right"), so the Hebrew
        # (first logical) run sits at the bottom reading upward and
        # the embedded Latin run sits at the top, internally
        # top-to-bottom
        assert ys[shin] < ys[ord("b")]
        assert ys[shin] < ys[mem]          # reads bottom-to-top
        assert ys[ord("a")] > ys[ord("b")]

    def test_cells_travel_rigidly(self):
        from fontrx.scene.layout import layout_text

        # synthetic font WITH vmtx: per-glyph tsb offsets must ride
        # with their reversed cells (rigid shift, not re-anchoring)
        f = _vfont(num_metrics=4)
        plain = layout_text(f, "AB", vertical=True)
        # force a reversal of the whole 2-glyph run via RLO override
        rev = layout_text(f, "‮AB‬", vertical=True, bidi=True)
        # cell heights: A: ah=800, B: ah=900 (vmtx)
        # plain tops: A at 0, B at -800; reversed extent [-1700, 0]:
        # B's cell top -> -800+? reflect: new_top = lo+hi - (top-h)
        pa, pb = plain.instances
        ra = next(i for i in rev.instances if i.glyph_slot == pa.glyph_slot)
        rb = next(i for i in rev.instances if i.glyph_slot == pb.glyph_slot)
        # A's cell [(-800, 0)] reflects to [-1700 + 800, ...] top -900:
        # rigid shift of -900; B's cell [-1700, -800] -> top 0: +800
        assert ra.y - pa.y == -900.0
        assert rb.y - pb.y == 800.0
        # x positions (column axis centering) are untouched
        assert ra.x == pa.x and rb.x == pb.x
