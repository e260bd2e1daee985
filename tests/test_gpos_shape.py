"""GPOS positioning-engine tests (capability extension — the
reference has no positioning at all; its pen only adds advance widths,
``src/Appli.zig:343-351``).

Two tiers, mirroring ``test_shape.py``:

- synthetic GPOS/GDEF tables from ``ttf_builder`` exercising every
  lookup type (1-9): single/pair value records, cursive chains,
  mark-to-base/ligature/mark anchors, contextual + chained positioning
  and the extension wrapper, plus lookup-flag skipping;
- real-font differentials on DejaVu: the engine's ``kern`` must agree
  with the flattened ``GposKernTable`` on every kerned pair, and
  engine-driven layout must reproduce the legacy kern/mark layout
  paths exactly.
"""

import numpy as np
import pytest

from fontrx.font.gdef import GdefTable
from fontrx.font.gpos_shape import GposShaper
from fontrx.utils.reader import BigEndianReader
from tests.ttf_builder import (
    build_coverage,
    build_gdef,
    build_gpos,
    gpos_chain2,
    gpos_chain3,
    gpos_anchor3,
    gpos_context1,
    gpos_context3,
    gpos_cursive,
    gpos_device,
    gpos_extension,
    gpos_markbase,
    gpos_marklig,
    gpos_pair1,
    gpos_pair1_dev,
    gpos_pair2,
    gpos_single,
)

Z = (0, 0, 0, 0)


def shaper(gpos: bytes, tags=(b"test",), gdef: bytes | None = None):
    g = GdefTable.parse(BigEndianReader(gdef, 0)) if gdef else None
    return GposShaper.parse(BigEndianReader(gpos, 0), tags=tags, gdef=g)


def pens(pos):
    """Per-glyph absolute positions implied by advances + offsets."""
    pen = np.concatenate([[0.0], np.cumsum(pos.x_advance)[:-1]])
    return pen + pos.x_offset


class TestSinglePos:
    def test_format1_shared_value(self):
        gpos = build_gpos(
            [(b"test", [0])],
            [(1, 0, [gpos_single({10: (5, -3, 40, 0)}, fmt=1)])],
        )
        sh = shaper(gpos)
        pos = sh.positions([10, 11], [100, 100])
        assert pos.x_offset[0] == 5 and pos.y_offset[0] == -3
        assert pos.x_advance[0] == 140
        assert pos.x_offset[1] == 0 and pos.x_advance[1] == 100

    def test_format2_per_index(self):
        gpos = build_gpos(
            [(b"test", [0])],
            [(1, 0, [gpos_single(
                {10: (1, 0, 10, 0), 12: (2, 0, 20, 0)}, fmt=2
            )])],
        )
        pos = shaper(gpos).positions([10, 12], [100, 100])
        assert pos.x_offset.tolist() == [1, 2]
        assert pos.x_advance.tolist() == [110, 120]

    def test_partial_value_format(self):
        # xAdvance-only records (vfmt 0x4)
        gpos = build_gpos(
            [(b"test", [0])],
            [(1, 0, [gpos_single({10: (0, 0, -7, 0)}, fmt=1, vfmt=0x4)])],
        )
        pos = shaper(gpos).positions([10], [100])
        assert pos.x_advance[0] == 93 and pos.x_offset[0] == 0


class TestPairPos:
    def test_format1_adjusts_first(self):
        gpos = build_gpos(
            [(b"test", [0])],
            [(2, 0, [gpos_pair1({10: [(11, (0, 0, -15, 0), Z)]})])],
        )
        pos = shaper(gpos).positions([10, 11], [100, 100])
        assert pos.x_advance.tolist() == [85, 100]
        assert pens(pos).tolist() == [0, 85]

    def test_format1_value2_applies_to_second(self):
        gpos = build_gpos(
            [(b"test", [0])],
            [(2, 0, [gpos_pair1(
                {10: [(11, Z, (3, 0, -10, 0))]}, vf1=0, vf2=0xF,
            )])],
        )
        pos = shaper(gpos).positions([10, 11], [100, 100])
        assert pos.x_offset.tolist() == [0, 3]
        assert pos.x_advance.tolist() == [100, 90]

    def test_format2_class_matrix(self):
        gpos = build_gpos(
            [(b"test", [0])],
            [(2, 0, [gpos_pair2(
                coverage=[10, 11],
                cd1={10: 1, 11: 2}, cd2={10: 1, 11: 2},
                n_c1=3, n_c2=3,
                matrix={(1, 2): ((0, 0, -25, 0), Z)},
            )])],
        )
        sh = shaper(gpos)
        pos = sh.positions([10, 11], [100, 100])
        assert pos.x_advance.tolist() == [75, 100]
        # unkerned class pair: zero adjustment
        pos2 = sh.positions([11, 10], [100, 100])
        assert pos2.x_advance.tolist() == [100, 100]

    def test_format1_zero_pair_overrides_class_kern(self):
        # fonts use explicit all-zero format-1 pairs as exceptions that
        # defeat a following class matrix in the same lookup; any found
        # pair is a match (first-subtable-match-wins per spec)
        gpos = build_gpos(
            [(b"test", [0])],
            [(2, 0, [
                gpos_pair1({10: [(11, Z, Z)]}, vf1=0xF, vf2=0xF),
                gpos_pair2(
                    coverage=[10], cd1={10: 1}, cd2={11: 2},
                    n_c1=2, n_c2=3,
                    matrix={(1, 2): ((0, 0, -25, 0), Z)},
                ),
            ])],
        )
        pos = shaper(gpos).positions([10, 11], [100, 100])
        assert pos.x_advance.tolist() == [100, 100]

    def test_pair_chain_resumes_at_second(self):
        # A-B kern and B-C kern both apply (scan resumes at B)
        gpos = build_gpos(
            [(b"test", [0])],
            [(2, 0, [gpos_pair1({
                10: [(11, (0, 0, -5, 0), Z)],
                11: [(12, (0, 0, -7, 0), Z)],
            })])],
        )
        pos = shaper(gpos).positions([10, 11, 12], [100, 100, 100])
        assert pos.x_advance.tolist() == [95, 93, 100]


class TestCursive:
    def test_exit_meets_entry(self):
        # glyph 10 exit (80, 10); glyph 11 entry (5, -20)
        gpos = build_gpos(
            [(b"test", [0])],
            [(3, 0, [gpos_cursive({
                10: (None, (80, 10)),
                11: ((5, -20), (90, 0)),
            })])],
        )
        pos = shaper(gpos).positions([10, 11], [100, 100])
        # parent's advance lands the pen on its exit x
        assert pos.x_advance[0] == 80
        # child shifts back by its entry x
        assert pos.x_offset[1] == -5 and pos.x_advance[1] == 95
        # child baseline rises by exit.y - entry.y
        assert pos.y_offset[1] == 30
        # entry point of 11 in absolute space == exit point of 10
        assert pens(pos)[1] + 5 == 80

    def test_chain_accumulates_y(self):
        gpos = build_gpos(
            [(b"test", [0])],
            [(3, 0, [gpos_cursive({
                10: (None, (80, 10)),
                11: ((0, 0), (80, 10)),
                12: ((0, 0), None),
            })])],
        )
        pos = shaper(gpos).positions([10, 11, 12], [100, 100, 100])
        assert pos.y_offset.tolist() == [0, 10, 20]

    def test_missing_anchor_no_op(self):
        gpos = build_gpos(
            [(b"test", [0])],
            [(3, 0, [gpos_cursive({10: (None, (80, 10))})])],
        )
        pos = shaper(gpos).positions([10, 10], [100, 100])
        # second 10 has no entry anchor: nothing applies
        assert pos.x_advance.tolist() == [100, 100]


class TestMarkAttach:
    GDEF = build_gdef(glyph_classes={10: 1, 11: 1, 20: 3, 21: 3})

    def test_mark_to_base(self):
        gpos = build_gpos(
            [(b"test", [0])],
            [(4, 0, [gpos_markbase(
                marks={20: (0, (10, 5))},
                bases={10: [(60, 90)]},
                n_classes=1,
            )])],
        )
        pos = shaper(gpos, gdef=self.GDEF).positions([10, 20], [100, 0])
        # mark lands at base origin + (anchor delta); its own pen is at 100
        assert pos.x_offset[1] == (60 - 10) - 100
        assert pos.y_offset[1] == 90 - 5

    def test_mark_skips_intervening_mark(self):
        # base 10, mark 20, mark 21: both attach to 10 (base search
        # ignores marks)
        gpos = build_gpos(
            [(b"test", [0])],
            [(4, 0, [gpos_markbase(
                marks={20: (0, (0, 0)), 21: (0, (0, 0))},
                bases={10: [(50, 70)]},
                n_classes=1,
            )])],
        )
        pos = shaper(gpos, gdef=self.GDEF).positions(
            [10, 20, 21], [100, 0, 0]
        )
        assert pos.x_offset.tolist() == [0, -50, -50]
        assert pos.y_offset.tolist() == [0, 70, 70]

    def test_mark_to_mark_stacks(self):
        base = gpos_markbase(
            marks={20: (0, (0, 0)), 21: (0, (0, 0))},
            bases={10: [(50, 70)]},
            n_classes=1,
        )
        mkmk = gpos_markbase(
            marks={21: (0, (0, 0))},
            bases={20: [(0, 30)]},  # mark2 coverage = glyph 20
            n_classes=1,
        )
        gpos = build_gpos(
            [(b"test", [0, 1])], [(4, 0, [base]), (6, 0, [mkmk])]
        )
        pos = shaper(gpos, gdef=self.GDEF).positions(
            [10, 20, 21], [100, 0, 0]
        )
        # 21 stacks on 20's final position + (0, 30)
        assert pos.y_offset.tolist() == [0, 70, 100]
        assert pos.x_offset.tolist() == [0, -50, -50]

    def test_mark_to_ligature_last_component(self):
        gpos = build_gpos(
            [(b"test", [0])],
            [(5, 0, [gpos_marklig(
                marks={20: (0, (0, 0))},
                ligs={10: [[(10, 10)], [(80, 95)]]},  # two components
                n_classes=1,
            )])],
        )
        pos = shaper(gpos, gdef=self.GDEF).positions([10, 20], [200, 0])
        # no component info: attaches to the LAST component's anchor
        assert pos.x_offset[1] == 80 - 200
        assert pos.y_offset[1] == 95

    def test_mark_to_ligature_threaded_component(self):
        # GSUB-threaded component index 1 picks the FIRST component's
        # anchor (the lam of a lam-alef, not the trailing alef)
        gpos = build_gpos(
            [(b"test", [0])],
            [(5, 0, [gpos_marklig(
                marks={20: (0, (0, 0))},
                ligs={10: [[(10, 10)], [(80, 95)]]},
                n_classes=1,
            )])],
        )
        pos = shaper(gpos, gdef=self.GDEF).positions(
            [10, 20], [200, 0], lig_comps=[0, 1])
        assert pos.x_offset[1] == 10 - 200
        assert pos.y_offset[1] == 10
        # component 2 = the second anchor row
        pos2 = shaper(gpos, gdef=self.GDEF).positions(
            [10, 20], [200, 0], lig_comps=[0, 2])
        assert pos2.x_offset[1] == 80 - 200
        assert pos2.y_offset[1] == 95


class TestContextual:
    def _nested_single(self):
        """lookup 1: move glyph 11 up by 50 (not feature-selected)."""
        return (1, 0, [gpos_single({11: (0, 50, 0, 0)}, fmt=1)])

    def test_context3_applies_nested(self):
        ctx = gpos_context3([[10], [11]], [(1, 1)])
        gpos = build_gpos(
            [(b"test", [0])], [(7, 0, [ctx]), self._nested_single()]
        )
        sh = shaper(gpos)
        pos = sh.positions([10, 11], [100, 100])
        assert pos.y_offset.tolist() == [0, 50]
        # without the context (11 alone) nothing applies
        pos2 = sh.positions([9, 11], [100, 100])
        assert pos2.y_offset.tolist() == [0, 0]

    def test_chain3_backtrack_lookahead(self):
        ctx = gpos_chain3([[9]], [[10], [11]], [[12]], [(0, 1)])
        gpos = build_gpos(
            [(b"test", [0])],
            [(8, 0, [ctx]), (1, 0, [gpos_single({10: (0, -9, 0, 0)})])],
        )
        sh = shaper(gpos)
        ok = sh.positions([9, 10, 11, 12], [100] * 4)
        assert ok.y_offset.tolist() == [0, -9, 0, 0]
        # missing lookahead: no match
        no = sh.positions([9, 10, 11, 13], [100] * 4)
        assert no.y_offset.tolist() == [0, 0, 0, 0]

    def test_chain2_class_rules(self):
        # class-based chained positioning (GPOS 8 fmt 2): in the
        # context "digit digit", raise the second digit (class 1)
        ctx = gpos_chain2(
            coverage_glyphs=[10, 11],
            bt_classes={10: 1, 11: 1},
            in_classes={10: 1, 11: 1},
            la_classes={},
            rule_sets={1: [([], [1], [], [(1, 1)])]},
            n_sets=2,
        )
        gpos = build_gpos(
            [(b"test", [0])],
            [(8, 0, [ctx]), (1, 0, [gpos_single(
                {10: (0, 40, 0, 0), 11: (0, 40, 0, 0)}, fmt=1
            )])],
        )
        sh = shaper(gpos)
        pos = sh.positions([10, 11], [100, 100])
        assert pos.y_offset.tolist() == [0, 40]
        # a lone covered glyph (no class-1 input pair): no-op
        pos2 = sh.positions([9, 10], [100, 100])
        assert pos2.y_offset.tolist() == [0, 0]

    def test_context1_glyph_rules(self):
        ctx = gpos_context1({10: [([11], [(1, 1)])]})
        gpos = build_gpos(
            [(b"test", [0])], [(7, 0, [ctx]), self._nested_single()]
        )
        pos = shaper(gpos).positions([10, 11], [100, 100])
        assert pos.y_offset.tolist() == [0, 50]


class TestExtensionAndFlags:
    def test_extension_unwraps(self):
        inner = gpos_single({10: (0, 0, 33, 0)}, fmt=1, vfmt=0x4)
        gpos = build_gpos(
            [(b"test", [0])], [(9, 0, [gpos_extension(1, inner)])]
        )
        pos = shaper(gpos).positions([10], [100])
        assert pos.x_advance[0] == 133

    def test_ignore_marks_pair(self):
        # kern pair 10-11 with a mark (20) in between, flag ignoreMarks
        gdef = build_gdef(glyph_classes={10: 1, 11: 1, 20: 3})
        gpos = build_gpos(
            [(b"test", [0])],
            [(2, 0x0008, [gpos_pair1({10: [(11, (0, 0, -30, 0), Z)]})])],
        )
        pos = shaper(gpos, gdef=gdef).positions([10, 20, 11], [100, 0, 100])
        assert pos.x_advance.tolist() == [70, 0, 100]


class TestRealFont:
    def test_kern_matches_flat_table_on_all_pairs(self, dejavu):
        """The engine must agree with GposKernTable on every kerned
        pair in DejaVu (both read the same PairPos lookups)."""
        flat = dejavu.gpos_kerning
        sh = dejavu.positioner((b"kern",))
        assert flat is not None and sh is not None
        # the legacy `kern` table's explicit pairs enumerate every
        # kerned pair in the font (test_gpos.py proves the flattened
        # GPOS lookup agrees with it on all of them)
        keys = dejavu.kerning.keys
        assert len(keys) > 1000
        lefts = (keys >> 16).astype(np.int64)
        rights = (keys & 0xFFFF).astype(np.int64)
        flat_vals = flat.lookup(lefts, rights)
        for l, r, fv in zip(
            lefts[::7], rights[::7], flat_vals[::7]
        ):
            pos = sh.positions([int(l), int(r)], [0, 0])
            assert pos.x_advance[0] == fv, (l, r)

    def test_layout_engine_matches_legacy_kern(self, dejavu):
        from fontrx.scene.layout import layout_text

        text = "AVATAR To Wavy L.T.\nYet f)"
        a = layout_text(dejavu, text, kern=True)
        b = layout_text(dejavu, text, kern=True, positioning=())
        pa = np.array([[i.x, i.y] for i in a.instances])
        pb = np.array([[i.x, i.y] for i in b.instances])
        assert pa.shape == pb.shape
        assert np.abs(pa - pb).max() == 0

    def test_layout_engine_matches_legacy_marks(self, dejavu):
        from fontrx.scene.layout import layout_text

        text = "éa̖x À̖"
        a = layout_text(dejavu, text, marks=True, kern=True)
        b = layout_text(dejavu, text, marks=True, kern=True,
                        positioning=())
        pa = np.array([[i.x, i.y] for i in a.instances])
        pb = np.array([[i.x, i.y] for i in b.instances])
        assert pa.shape == pb.shape
        assert np.abs(pa - pb).max() == 0

    def test_positioning_tags_without_gpos_fall_back(self, dejavu):
        from fontrx.scene.layout import layout_text

        # a tag DejaVu doesn't define: positioner is None, layout falls
        # back to the legacy path and still kerns
        a = layout_text(dejavu, "AV", kern=True,
                        positioning=(b"zzzz",))
        b = layout_text(dejavu, "AV", kern=True)
        assert [(i.x, i.y) for i in a.instances] == \
               [(i.x, i.y) for i in b.instances]

    def test_vertical_vkrn_requested_no_crash(self, dejavu):
        from fontrx.scene.layout import layout_text

        # DejaVu has no vkrn; the request degrades to plain vertical
        v = layout_text(dejavu, "AB", vertical=True, kern=True,
                        positioning=())
        assert len(v.instances) == 2


class TestPairConsumption:
    def test_nonempty_value2_consumes_second_glyph(self):
        """Per OpenType, a pair whose second ValueRecord is non-empty
        consumes both glyphs: B must NOT also start a (B, C) pair."""
        gpos = build_gpos(
            [(b"test", [0])],
            [(2, 0, [gpos_pair1({
                10: [(11, Z, (0, 0, -50, 0))],
                11: [(12, (0, 0, -30, 0), Z)],
            }, vf1=0xF, vf2=0xF)])],
        )
        pos = shaper(gpos).positions([10, 11, 12], [100, 100, 100])
        # 11 gets only the v2 of (10, 11); (11, 12) is not formed
        assert pos.x_advance.tolist() == [100, 50, 100]

    def test_empty_value2_lets_second_start_next_pair(self):
        gpos = build_gpos(
            [(b"test", [0])],
            [(2, 0, [gpos_pair1({
                10: [(11, (0, 0, -5, 0), Z)],
                11: [(12, (0, 0, -7, 0), Z)],
            })])],
        )
        pos = shaper(gpos).positions([10, 11, 12], [100, 100, 100])
        assert pos.x_advance.tolist() == [95, 93, 100]


class TestMkmkFlagSkipping:
    def test_mark2_search_skips_filtered_marks(self):
        """A mkmk lookup with a markAttachmentType filter must find the
        nearest preceding NON-skipped glyph as mark2 — an intervening
        below-mark of another attachment class is skipped, so the
        second above-mark still stacks on the first."""
        # glyphs: 10 base; 20/21 above-marks (attach class 1); 30
        # below-mark (attach class 2)
        gdef = build_gdef(
            glyph_classes={10: 1, 20: 3, 21: 3, 30: 3},
            mark_attach={20: 1, 21: 1, 30: 2},
        )
        mkmk = gpos_markbase(
            marks={21: (0, (0, 0))},
            bases={20: [(0, 30)]},     # mark2 coverage = glyph 20
            n_classes=1,
        )
        # lookup flag 0x0100: markAttachmentType filter = class 1
        gpos = build_gpos([(b"test", [0])], [(6, 0x0100, [mkmk])])
        pos = shaper(gpos, gdef=gdef).positions(
            [10, 20, 30, 21], [100, 0, 0, 0]
        )
        # 21 stacks on 20 (the 30 below-mark is skipped by the filter)
        assert pos.y_offset[3] == 30


class TestParseBounds:
    def test_implausible_class_matrix_degrades(self):
        """A corrupt PairPos fmt-2 declaring a u16 x u16 class matrix
        with empty value formats must not spin the parser for minutes —
        the lookup degrades to absent and positioning is a no-op."""
        import struct

        # hand-build: fmt=2, cov_off -> tiny coverage, vf1=vf2=0,
        # cd offsets -> minimal classdefs, 65535 x 65535 classes
        cov = build_coverage([10])
        cd = struct.pack(">HH", 2, 0)  # classdef fmt 2, 0 ranges
        head = struct.pack(
            ">HHHHHHHH", 2, 16, 0, 0, 16 + len(cov), 16 + len(cov) + len(cd),
            0xFFFF, 0xFFFF,
        )
        sub = head + cov + cd + cd
        gpos = build_gpos([(b"test", [0])], [(2, 0, [sub])])
        import time

        t0 = time.perf_counter()
        sh = shaper(gpos)
        took = time.perf_counter() - t0
        assert took < 5.0
        if sh is not None:
            pos = sh.positions([10, 11], [100, 100])
            assert pos.x_advance.tolist() == [100, 100]


class TestCursiveRtlFlag:
    def test_rtl_flag_chains_baseline_backward(self):
        # same anchors as test_exit_meets_entry, but the lookup carries
        # the RIGHT_TO_LEFT flag (0x0001): now the FIRST glyph moves
        # vertically and the LAST stays on the baseline
        gpos = build_gpos(
            [(b"test", [0])],
            [(3, 0x0001, [gpos_cursive(
                {10: (None, (80, 10)), 11: ((5, -20), None)}
            )])],
        )
        pos = shaper(gpos).positions([10, 11], [100, 100])
        # exit of 10 at y=10 meets entry of 11 at y=-20:
        # yo[10] = yo[11] + (entry_y - exit_y) = 0 + (-20 - 10)
        assert pos.y_offset[0] == -30
        assert pos.y_offset[1] == 0
        # x behavior identical to the LTR case (pen runs logically)
        ltr = shaper(build_gpos(
            [(b"test", [0])],
            [(3, 0, [gpos_cursive(
                {10: (None, (80, 10)), 11: ((5, -20), None)}
            )])],
        )).positions([10, 11], [100, 100])
        assert pos.x_advance.tolist() == ltr.x_advance.tolist()
        assert pos.x_offset.tolist() == ltr.x_offset.tolist()
        # and the LTR variant moves the SECOND glyph instead
        assert ltr.y_offset[0] == 0 and ltr.y_offset[1] == 30

    def test_rtl_chain_cascades_back_to_front(self):
        # A -> B -> C with rising joins: C anchors the baseline
        gpos = build_gpos(
            [(b"test", [0])],
            [(3, 0x0001, [gpos_cursive({
                10: (None, (90, 10)),
                11: ((0, 0), (90, 10)),
                12: ((0, 0), None),
            })])],
        )
        pos = shaper(gpos).positions([10, 11, 12], [100, 100, 100])
        assert pos.y_offset[2] == 0
        assert pos.y_offset[1] == -10
        assert pos.y_offset[0] == -20


class TestHintedPositioning:
    """Plain (hinting) device tables and contour-point anchors: both
    degrade to bare coordinates without a hint context (the spec's
    unhinted behavior) and resolve against per-ppem deltas / the
    grid-fitted outline with one (``HintContext``)."""

    GDEF = build_gdef(glyph_classes={10: 1, 20: 3})

    @staticmethod
    def hint(ppem, upem, point=None):
        from fontrx.font.gpos_shape import HintContext

        return HintContext(ppem, upem, point or (lambda gid, idx: None))

    def test_device_table_parse_and_delta(self):
        from fontrx.font.gpos import DeviceTable

        for fmt, deltas in (
            (1, [0, -1, 1, -2, 0, 1, -1, 0, 1]),     # 2-bit
            (2, [0, -8, 7, 3, -4]),                  # 4-bit
            (3, [127, -128, 0, 33]),                 # 8-bit
        ):
            blob = gpos_device(9, 9 + len(deltas) - 1, deltas, fmt=fmt)
            dt = DeviceTable.parse(blob, 0)
            assert dt is not None
            assert [dt.delta(9 + i) for i in range(len(deltas))] == deltas
            # outside [start, end]: zero
            assert dt.delta(8) == 0 and dt.delta(9 + len(deltas)) == 0

    def test_device_auto_format_roundtrip(self):
        from fontrx.font.gpos import DeviceTable

        for deltas in ([1, -2, 0], [7, -8, 3], [100, -100, 5]):
            dt = DeviceTable.parse(gpos_device(12, 14, deltas), 0)
            assert [dt.delta(12 + i) for i in range(3)] == deltas

    def test_variation_index_is_not_a_device(self):
        import struct

        from fontrx.font.gpos import DeviceTable

        # deltaFormat 0x8000 = VariationIndex: not a plain device
        assert DeviceTable.parse(struct.pack(">HHH", 1, 2, 0x8000), 0) is None
        # unknown format / inverted range: rejected
        assert DeviceTable.parse(struct.pack(">HHH", 9, 9, 7), 0) is None
        assert DeviceTable.parse(struct.pack(">HHH", 9, 5, 1), 0) is None

    def test_pair_device_delta(self):
        gpos = build_gpos(
            [(b"test", [0])],
            [(2, 0, [gpos_pair1_dev(
                10, 11, -15, gpos_device(10, 14, [0, -1, 2, 0, 1]),
            )])],
        )
        sh = shaper(gpos)
        # unhinted: the device table is inert, per spec
        pos = sh.positions([10, 11], [100, 100])
        assert pos.x_advance.tolist() == [85, 100]
        # hinted at ppem 12 (delta +2 px, 100 units/px at upem 1200)
        pos = sh.positions([10, 11], [100, 100], hint=self.hint(12, 1200))
        assert pos.x_advance.tolist() == [85 + 200, 100]
        # ppem outside the device range: bare value again
        pos = sh.positions([10, 11], [100, 100], hint=self.hint(20, 1200))
        assert pos.x_advance.tolist() == [85, 100]

    def test_anchor3_device_nudges_mark(self):
        base_anchor = gpos_anchor3(
            60, 90,
            x_dev=gpos_device(12, 12, [-1]),
            y_dev=gpos_device(12, 12, [3]),
        )
        gpos = build_gpos(
            [(b"test", [0])],
            [(4, 0, [gpos_markbase(
                marks={20: (0, (10, 5))},
                bases={10: [base_anchor]},
                n_classes=1,
            )])],
        )
        sh = shaper(gpos, gdef=self.GDEF)
        pos = sh.positions([10, 20], [100, 0])
        assert pos.x_offset[1] == (60 - 10) - 100
        assert pos.y_offset[1] == 90 - 5
        # ppem 12, upem 1200: 100 units/px -> anchor (60-100, 90+300)
        pos = sh.positions([10, 20], [100, 0], hint=self.hint(12, 1200))
        assert pos.x_offset[1] == (-40 - 10) - 100
        assert pos.y_offset[1] == 390 - 5

    def test_anchor2_contour_point(self):
        gpos = build_gpos(
            [(b"test", [0])],
            [(4, 0, [gpos_markbase(
                marks={20: (0, (10, 5))},
                bases={10: [(60, 90, 3)]},   # anchor fmt 2, point 3
                n_classes=1,
            )])],
        )
        sh = shaper(gpos, gdef=self.GDEF)
        # unhinted: bare coordinates, per spec
        pos = sh.positions([10, 20], [100, 0])
        assert pos.x_offset[1] == (60 - 10) - 100
        assert pos.y_offset[1] == 90 - 5

        # hinted: the grid-fitted outline point (F26Dot6) wins
        def point(gid, idx):
            assert gid == 10
            return (640, 320) if idx == 3 else None

        # upem 1000, ppem 16: 62.5 units/px; 640/64 px = 10 px = 625 u
        pos = sh.positions([10, 20], [100, 0],
                           hint=self.hint(16, 1000, point))
        assert pos.x_offset[1] == 625.0 - 10 - 100
        assert pos.y_offset[1] == 312.5 - 5
        # resolver miss (point out of range): bare coordinates
        pos = sh.positions([10, 20], [100, 0],
                           hint=self.hint(16, 1000,
                                          lambda gid, idx: None))
        assert pos.x_offset[1] == (60 - 10) - 100

    def test_cursive_contour_point_exit(self):
        gpos = build_gpos(
            [(b"test", [0])],
            [(3, 0, [gpos_cursive({
                10: (None, (80, 10, 5)),     # exit: fmt-2, point 5
                11: ((5, -20), (90, 0)),
            })])],
        )
        sh = shaper(gpos)
        # unhinted: behaves exactly like a fmt-1 (80, 10) exit
        pos = sh.positions([10, 11], [100, 100])
        assert pos.x_advance[0] == 80
        assert pos.y_offset[1] == 30

        # hinted with upem 2048 @ 32 ppem: 64 units/px, so F26Dot6
        # values map 1:1 to design units — point 5 sits at (100, 30)
        def point(gid, idx):
            return (100, 30) if (gid, idx) == (10, 5) else None

        pos = sh.positions([10, 11], [100, 100],
                           hint=self.hint(32, 2048, point))
        assert pos.x_advance[0] == 100
        assert pos.x_offset[1] == -5
        assert pos.y_offset[1] == 30 - (-20)
