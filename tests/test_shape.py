"""GSUB shaping-engine tests (capability extension — the reference maps
each codepoint straight to one glyph, ``src/Appli.zig:318-341``).

Two test tiers:

- synthetic GSUB/GDEF tables from ``ttf_builder`` exercising every
  lookup type (1-7), every context format (5/6 fmt 1/2/3), and the
  lookup-flag skipping machinery (ignoreMarks, markAttachmentType,
  useMarkFilteringSet);
- real-font cross-checks on DejaVu: the full engine must agree with
  the flattened ``LigatureTable`` on mark-free streams, and its
  chained-contextual ``ccmp`` must perform the soft-dotted
  substitution (i + combining dot above -> dotless i).
"""

import numpy as np
import pytest

from fontrx.font.gdef import GdefTable
from fontrx.font.shape import GsubShaper
from fontrx.utils.reader import BigEndianReader
from tests.ttf_builder import (
    build_gdef,
    build_gsub,
    gsub_alternate,
    gsub_chain2,
    gsub_chain3,
    gsub_context1,
    gsub_context3,
    gsub_extension,
    gsub_ligature,
    gsub_multiple,
    gsub_single,
)


def shaper(gsub: bytes, tags=(b"test",), gdef: bytes | None = None):
    g = GdefTable.parse(BigEndianReader(gdef, 0)) if gdef else None
    return GsubShaper.parse(BigEndianReader(gsub, 0), tags=tags, gdef=g)


class TestSingle:
    def test_format2(self):
        gsub = build_gsub(
            [(b"test", [0])], [(1, 0, [gsub_single({10: 20, 11: 21})])]
        )
        sh = shaper(gsub)
        assert sh.apply([10, 5, 11]) == [20, 5, 21]

    def test_format1_delta(self):
        gsub = build_gsub(
            [(b"test", [0])],
            [(1, 0, [gsub_single({10: 13, 11: 14}, fmt=1)])],
        )
        sh = shaper(gsub)
        assert sh.apply([10, 11, 12]) == [13, 14, 12]

    def test_format1_delta_wraps_u16(self):
        # delta arithmetic is modulo 65536 per spec
        gsub = build_gsub(
            [(b"test", [0])], [(1, 0, [gsub_single({10: 5}, fmt=1)])]
        )
        sh = shaper(gsub)
        assert sh.apply([10]) == [5]


class TestMultipleAlternate:
    def test_multiple_expands(self):
        gsub = build_gsub(
            [(b"test", [0])], [(2, 0, [gsub_multiple({10: [20, 21, 22]})])]
        )
        sh = shaper(gsub)
        assert sh.apply([9, 10, 11]) == [9, 20, 21, 22, 11]

    def test_multiple_empty_seq_deletes(self):
        gsub = build_gsub(
            [(b"test", [0])], [(2, 0, [gsub_multiple({10: []})])]
        )
        sh = shaper(gsub)
        assert sh.apply([9, 10, 11]) == [9, 11]

    def test_multiple_output_not_rescanned(self):
        # type-2 output containing its own trigger must not loop
        gsub = build_gsub(
            [(b"test", [0])], [(2, 0, [gsub_multiple({10: [10, 10]})])]
        )
        sh = shaper(gsub)
        assert sh.apply([10]) == [10, 10]

    def test_alternate_picks_first(self):
        gsub = build_gsub(
            [(b"test", [0])], [(3, 0, [gsub_alternate({10: [30, 31]})])]
        )
        sh = shaper(gsub)
        assert sh.apply([10]) == [30]


class TestLigature:
    def test_basic_and_preference_order(self):
        sub = gsub_ligature({10: [([11, 12], 40), ([11], 41)]})
        gsub = build_gsub([(b"test", [0])], [(4, 0, [sub])])
        sh = shaper(gsub)
        assert sh.apply([10, 11, 12]) == [40]
        assert sh.apply([10, 11, 9]) == [41, 9]
        assert sh.apply([10, 9]) == [10, 9]

    def test_ignore_marks_skips_and_keeps_mark(self):
        # glyph 50 is a GDEF mark; an ignoreMarks ligature lookup must
        # ligate around it and keep the mark after the ligature glyph
        sub = gsub_ligature({10: [([11], 40)]})
        gsub = build_gsub([(b"test", [0])], [(4, 0x0008, [sub])])
        gdef = build_gdef(glyph_classes={10: 1, 11: 1, 50: 3})
        sh = shaper(gsub, gdef=gdef)
        assert sh.apply([10, 50, 11]) == [40, 50]
        # without the flag the mark blocks the match
        gsub_noflag = build_gsub([(b"test", [0])], [(4, 0, [sub])])
        sh2 = shaper(gsub_noflag, gdef=gdef)
        assert sh2.apply([10, 50, 11]) == [10, 50, 11]

    def test_extension_wrapped(self):
        sub = gsub_extension(4, gsub_ligature({10: [([11], 40)]}))
        gsub = build_gsub([(b"test", [0])], [(7, 0, [sub])])
        sh = shaper(gsub)
        assert sh.apply([10, 11]) == [40]


class TestLookupFlags:
    def test_mark_attachment_type_filter(self):
        # markAttachmentType=2 skips marks of attach class != 2 only
        sub = gsub_ligature({10: [([11], 40)]})
        gsub = build_gsub([(b"test", [0])], [(4, 0x0200, [sub])])
        gdef = build_gdef(
            glyph_classes={10: 1, 11: 1, 50: 3, 51: 3},
            mark_attach={50: 1, 51: 2},
        )
        sh = shaper(gsub, gdef=gdef)
        # class-1 mark (50) is skipped; class-2 mark (51) participates
        # (and blocks, since it isn't glyph 11)
        assert sh.apply([10, 50, 11]) == [40, 50]
        assert sh.apply([10, 51, 11]) == [10, 51, 11]

    def test_mark_filtering_set(self):
        sub = gsub_ligature({10: [([11], 40)]})
        gsub = build_gsub(
            [(b"test", [0])],
            [(4, 0x0010, [sub])],
            mark_filter_sets={0: 0},
        )
        gdef = build_gdef(
            glyph_classes={10: 1, 11: 1, 50: 3, 51: 3},
            mark_sets=[[51]],  # set 0 contains only mark 51
        )
        sh = shaper(gsub, gdef=gdef)
        # marks NOT in the filtering set are skipped
        assert sh.apply([10, 50, 11]) == [40, 50]
        # marks in the set participate (and block)
        assert sh.apply([10, 51, 11]) == [10, 51, 11]

    def test_ignore_base_and_ligature_classes(self):
        sub = gsub_ligature({10: [([11], 40)]})
        gdef = build_gdef(glyph_classes={10: 1, 11: 1, 60: 1, 61: 2})
        gsub_b = build_gsub([(b"test", [0])], [(4, 0x0002, [sub])])
        # ignoreBaseGlyphs skips base 60 — but also skips 10/11
        # themselves at scan time?  No: the scan skips them as match
        # *candidates*; position i itself is skipped too, so nothing
        # ligates when first glyphs are bases.
        sh = shaper(gsub_b, gdef=gdef)
        assert sh.apply([10, 60, 11]) == [10, 60, 11]
        gsub_l = build_gsub([(b"test", [0])], [(4, 0x0004, [sub])])
        sh = shaper(gsub_l, gdef=gdef)
        assert sh.apply([10, 61, 11]) == [40, 61]


class TestContext:
    def test_context_format3(self):
        # when [10][11] appears, substitute position 0 via lookup 1
        ctx = gsub_context3([[10], [11]], [(0, 1)])
        single = gsub_single({10: 20})
        gsub = build_gsub(
            [(b"test", [0])], [(5, 0, [ctx]), (1, 0, [single])]
        )
        sh = shaper(gsub)
        assert sh.apply([10, 11]) == [20, 11]
        assert sh.apply([10, 9]) == [10, 9]  # context unmatched

    def test_context_format1(self):
        ctx = gsub_context1({10: [([11, 12], [(2, 1)])]})
        single = gsub_single({12: 22})
        gsub = build_gsub(
            [(b"test", [0])], [(5, 0, [ctx]), (1, 0, [single])]
        )
        sh = shaper(gsub)
        assert sh.apply([10, 11, 12]) == [10, 11, 22]
        assert sh.apply([10, 11, 9]) == [10, 11, 9]

    def test_chain_format3_backtrack_lookahead(self):
        # substitute 11 -> 21 only between 10 and 12
        chain = gsub_chain3([[10]], [[11]], [[12]], [(0, 1)])
        single = gsub_single({11: 21})
        gsub = build_gsub(
            [(b"test", [0])], [(6, 0, [chain]), (1, 0, [single])]
        )
        sh = shaper(gsub)
        assert sh.apply([10, 11, 12]) == [10, 21, 12]
        assert sh.apply([9, 11, 12]) == [9, 11, 12]
        assert sh.apply([10, 11, 9]) == [10, 11, 9]

    def test_chain_format2_classes(self):
        # classes: 1 = {10,13}, 2 = {11}, 3 = {12}; rule on input
        # class 2 with backtrack class 1, lookahead class 3
        chain = gsub_chain2(
            coverage_glyphs=[11],
            bt_classes={10: 1, 13: 1},
            in_classes={11: 2},
            la_classes={12: 3},
            rule_sets={2: [([1], [], [3], [(0, 1)])]},
            n_sets=3,
        )
        single = gsub_single({11: 21})
        gsub = build_gsub(
            [(b"test", [0])], [(6, 0, [chain]), (1, 0, [single])]
        )
        sh = shaper(gsub)
        assert sh.apply([10, 11, 12]) == [10, 21, 12]
        assert sh.apply([13, 11, 12]) == [13, 21, 12]  # same backtrack class
        assert sh.apply([11, 11, 12]) == [11, 11, 12]  # backtrack class 0

    def test_nested_ligature_shrinks_buffer(self):
        # context triggers a ligature at position 0: [10 11] -> 40,
        # with a following lookahead glyph that must survive
        ctx = gsub_context3([[10], [11], [12]], [(0, 1)])
        lig = gsub_ligature({10: [([11], 40)]})
        gsub = build_gsub(
            [(b"test", [0])], [(5, 0, [ctx]), (4, 0, [lig])]
        )
        sh = shaper(gsub)
        assert sh.apply([10, 11, 12]) == [40, 12]

    def test_two_records_with_position_shift(self):
        # record 1 expands position 0 (10 -> 30,31), record 2 then
        # substitutes position 1 (11 -> 21): positions must re-anchor
        ctx = gsub_context3([[10], [11]], [(0, 1), (1, 2)])
        multi = gsub_multiple({10: [30, 31]})
        single = gsub_single({11: 21})
        gsub = build_gsub(
            [(b"test", [0])],
            [(5, 0, [ctx]), (2, 0, [multi]), (1, 0, [single])],
        )
        sh = shaper(gsub)
        assert sh.apply([10, 11]) == [30, 31, 21]

    def test_recursion_depth_capped(self):
        # a context lookup that triggers itself must terminate
        ctx = gsub_context3([[10], [11]], [(0, 0)])
        gsub = build_gsub([(b"test", [0])], [(5, 0, [ctx])])
        sh = shaper(gsub)
        assert sh.apply([10, 11]) == [10, 11]


class TestLookupOrdering:
    def test_lookups_apply_in_list_order(self):
        # lookup 0 maps 10->11; lookup 1 maps 11->12.  In order, the
        # output of lookup 0 is visible to lookup 1.
        gsub = build_gsub(
            [(b"test", [0, 1])],
            [(1, 0, [gsub_single({10: 11})]), (1, 0, [gsub_single({11: 12})])],
        )
        sh = shaper(gsub)
        assert sh.apply([10]) == [12]

    def test_feature_subset_via_apply_features(self):
        gsub = build_gsub(
            [(b"aaaa", [0]), (b"bbbb", [1])],
            [(1, 0, [gsub_single({10: 11})]), (1, 0, [gsub_single({10: 12})])],
        )
        sh = shaper(gsub, tags=(b"aaaa", b"bbbb"))
        assert sh.apply([10]) == [11]  # lookup 0 wins in combined order
        assert sh.apply_features([10], (b"bbbb",)) == [12]
        assert sh.apply_features([10], (b"aaaa",)) == [11]
        assert sh.apply_features([10], (b"zzzz",)) == [10]

    def test_unknown_tags_yield_none(self):
        gsub = build_gsub(
            [(b"aaaa", [0])], [(1, 0, [gsub_single({10: 11})])]
        )
        assert shaper(gsub, tags=(b"zzzz",)) is None


class TestRealFont:
    def test_agrees_with_ligature_table(self, dejavu):
        """The general engine and the flattened LigatureTable must agree
        on mark-free glyph streams."""
        sh = dejavu.shaper((b"liga", b"rlig"))
        lt = dejavu.ligatures
        assert sh is not None and lt is not None
        gi = dejavu.glyph_index
        rng = np.random.default_rng(7)
        corpus = ["fi", "ffl", "affix", "waffle", "offset", "fjord",
                  "The quick brown fox flies off a cliff"]
        for s in corpus:
            stream = [gi(c) for c in s]
            assert sh.apply(stream) == lt.apply(stream), s
        for _ in range(100):
            stream = [gi(chr(c)) for c in rng.integers(32, 127, size=10)]
            assert sh.apply(stream) == lt.apply(stream)

    def test_ccmp_soft_dotted(self, dejavu):
        """DejaVu's ccmp (chained-contextual, GSUB type 6) substitutes
        dotless i before a combining dot above — exercised end-to-end
        on the real font."""
        sh = dejavu.shaper((b"ccmp",))
        assert sh is not None
        gi = dejavu.glyph_index
        stream = [gi("i"), gi(0x0307)]  # i + combining dot above
        out = sh.apply(stream)
        assert out == [gi(0x0131), gi(0x0307)]  # dotless i, dot kept

    def test_gdef_classes(self, dejavu):
        g = dejavu.gdef
        assert g is not None
        assert g.glyph_class(dejavu.glyph_index("a")) == 1  # base
        assert g.glyph_class(dejavu.glyph_index(0x0301)) == 3  # mark
        assert g.is_mark(dejavu.glyph_index(0x0301))
        assert not g.is_mark(dejavu.glyph_index("a"))

    def test_shaper_cache(self, dejavu):
        assert dejavu.shaper((b"liga",)) is dejavu.shaper((b"liga",))
        assert dejavu.shaper((b"zzzz",)) is None


class TestLayoutFeatures:
    def test_layout_features_ccmp(self, dejavu):
        """features=(ccmp,) shapes i+combining-dot into dotless i at
        the layout level."""
        from fontrx.scene.layout import layout_text

        text = "i̇"
        plain = layout_text(dejavu, text)
        shaped = layout_text(dejavu, text, features=(b"ccmp",))
        gi = dejavu.glyph_index
        assert plain.slot_chars[0] == ord("i")
        assert shaped.slot_chars[0] == 0x0131  # dotless i slot

    def test_ligatures_flag_routes_through_engine(self, dejavu):
        """ligatures=True still produces the fi ligature via the full
        engine (differentially proven equal to LigatureTable)."""
        from fontrx.scene.layout import layout_text

        liga = layout_text(dejavu, "fi", ligatures=True)
        assert len(liga.instances) == 1
        assert liga.slot_chars == [0xFB01]

    def test_features_combine_with_ligatures(self, dejavu):
        from fontrx.scene.layout import layout_text

        out = layout_text(dejavu, "fi i̇", ligatures=True,
                          features=(b"ccmp",))
        assert 0xFB01 in out.slot_chars
        assert 0x0131 in out.slot_chars


class TestCLIFeaturesFlag:
    FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"

    def test_features_flag_changes_render(self, tmp_path):
        from fontrx.cli.main import main
        from fontrx.io.qoi import decode

        plain, shaped = tmp_path / "p.qoi", tmp_path / "s.qoi"
        text = "i̇"
        assert main(["-f", self.FONT, "-t", text, "-m", "fill",
                     "-s", "48", "-o", str(plain)]) == 0
        assert main(["-f", self.FONT, "-t", text, "-m", "fill",
                     "-s", "48", "-o", str(shaped),
                     "--features", "ccmp"]) == 0
        import numpy as np
        ip = np.asarray(decode(plain.read_bytes()))
        il = np.asarray(decode(shaped.read_bytes()))
        # dotless i removes the intrinsic dot: pixels must differ
        assert il.any() and (
            ip.shape != il.shape or (ip != il).any()
        )


class TestScriptSelection:
    """Script/language-system-aware lookup selection (VERDICT r2 item
    3): the same feature tag registered under different scripts selects
    different lookups, required features always apply, and fonts with
    no consultable ScriptList keep the tag-global behavior."""

    def _two_script(self):
        # feature 0: 'locl' for latn (10->20); feature 1: 'locl' for
        # grek (10->30); feature 2: 'salt' required by grek (11->31)
        return build_gsub(
            [(b"locl", [0]), (b"locl", [1]), (b"salt", [2])],
            [
                (1, 0, [gsub_single({10: 20})]),
                (1, 0, [gsub_single({10: 30})]),
                (1, 0, [gsub_single({11: 31})]),
            ],
            scripts=[
                (b"latn", {None: (None, [0])}),
                (b"grek", {None: (2, [1])}),
            ],
        )

    def test_same_tag_selects_per_script(self):
        sh = shaper(self._two_script(), tags=(b"locl",))
        assert sh.apply([10, 11], script=b"latn") == [20, 11]
        assert sh.apply([10, 11], script=b"grek") == [30, 31]

    def test_required_feature_applies_regardless_of_tag(self):
        # 'salt' is grek's REQUIRED feature: it applies even though the
        # requested tag set is only ('locl',)
        sh = shaper(self._two_script(), tags=(b"locl",))
        assert sh.apply([11], script=b"grek") == [31]
        assert sh.apply([11], script=b"latn") == [11]

    def test_unknown_script_falls_back_dflt_then_latn(self):
        sh = shaper(self._two_script(), tags=(b"locl",))
        # no DFLT entry -> latn fallback
        assert sh.apply([10], script=b"cyrl") == [20]

    def test_no_script_argument_keeps_tag_global(self):
        sh = shaper(self._two_script(), tags=(b"locl",))
        # tag-global: BOTH locl features' lookups apply in order
        # (lookup 0 first: 10->20; lookup 1 no longer matches)
        assert sh.apply([10]) == [20]

    def test_langsys_selection(self):
        gsub = build_gsub(
            [(b"locl", [0]), (b"locl", [1])],
            [
                (1, 0, [gsub_single({10: 20})]),
                (1, 0, [gsub_single({10: 30})]),
            ],
            scripts=[
                (b"latn", {None: (None, [0]), b"TRK ": (None, [1])}),
            ],
        )
        sh = shaper(gsub, tags=(b"locl",))
        assert sh.apply([10], script=b"latn") == [20]
        assert sh.apply([10], script=b"latn", lang=b"TRK ") == [30]

    def test_empty_scriptlist_fallback(self):
        gsub = build_gsub(
            [(b"locl", [0])], [(1, 0, [gsub_single({10: 20})])],
        )
        sh = shaper(gsub, tags=(b"locl",))
        assert sh.apply([10], script=b"grek") == [20]


class TestScriptItemize:
    def test_itemize_runs(self):
        from fontrx.font.script import itemize, script_of

        assert script_of(ord("a")) == b"latn"
        assert script_of(0x05D0) == b"hebr"
        assert script_of(0x0627) == b"arab"
        assert script_of(0x4E2D) == b"hani"
        assert script_of(ord(" ")) is None
        runs = itemize([ord(c) for c in "ab "] + [0x5D0, 0x5D1])
        assert runs == [(0, 3, b"latn"), (3, 5, b"hebr")]

    def test_leading_common_joins_first_script(self):
        from fontrx.font.script import itemize

        runs = itemize([ord(" "), 0x5D0])
        assert runs == [(0, 2, b"hebr")]


class TestReverseChaining:
    """GSUB lookup type 8 (reverse chaining contextual single
    substitution) — applied in REVERSE buffer order so each position
    sees the already-substituted glyphs to its right (the Nastaliq
    requirement)."""

    def test_simple_lookahead_context(self):
        from tests.ttf_builder import gsub_reverse_chain

        gsub = build_gsub(
            [(b"rclt", [0])],
            [(8, 0, [gsub_reverse_chain(
                [10, 11, 12], [110, 111, 112],
                lookahead=[[20]],
            )])],
        )
        sh = shaper(gsub, tags=(b"rclt",))
        assert sh.apply([10, 20]) == [110, 20]
        assert sh.apply([11, 20, 12]) == [111, 20, 12]  # 12 lacks 20 after
        assert sh.apply([10, 30]) == [10, 30]

    def test_reverse_order_chains_right_to_left(self):
        from tests.ttf_builder import gsub_reverse_chain

        # 10 -> 11 when followed by 11 or 99: only reverse-order
        # application lets the whole run cascade off the trailing 99
        gsub = build_gsub(
            [(b"rclt", [0])],
            [(8, 0, [gsub_reverse_chain(
                [10], [11], lookahead=[[11, 99]],
            )])],
        )
        sh = shaper(gsub, tags=(b"rclt",))
        assert sh.apply([10, 10, 10, 99]) == [11, 11, 11, 99]
        assert sh.apply([10, 10, 10]) == [10, 10, 10]  # no trigger

    def test_backtrack_context(self):
        from tests.ttf_builder import gsub_reverse_chain

        gsub = build_gsub(
            [(b"rclt", [0])],
            [(8, 0, [gsub_reverse_chain(
                [10], [99], backtrack=[[5]],
            )])],
        )
        sh = shaper(gsub, tags=(b"rclt",))
        assert sh.apply([5, 10]) == [5, 99]
        assert sh.apply([6, 10]) == [6, 10]
        assert sh.apply([10]) == [10]

    def test_extension_wrapped_type8(self):
        from tests.ttf_builder import gsub_extension, gsub_reverse_chain

        gsub = build_gsub(
            [(b"rclt", [0])],
            [(7, 0, [gsub_extension(8, gsub_reverse_chain(
                [10], [99], lookahead=[[20]],
            ))])],
        )
        sh = shaper(gsub, tags=(b"rclt",))
        assert sh.apply([10, 20]) == [99, 20]

    def test_fealib_rsub_wire_format(self):
        """Real type-8 wire bytes: feaLib-compiled `rsub` feature."""
        import io

        from fontTools.feaLib.builder import (
            addOpenTypeFeaturesFromString,
        )
        from fontTools.fontBuilder import FontBuilder
        from fontTools.pens.ttGlyphPen import TTGlyphPen

        from fontrx.font.font import Font

        fb = FontBuilder(1000, isTTF=True)
        names = [".notdef", "a", "b", "a.fin"]
        fb.setupGlyphOrder(names)
        fb.setupCharacterMap({ord("a"): "a", ord("b"): "b"})
        glyphs = {}
        for n in names:
            pen = TTGlyphPen(glyphSet={})
            pen.moveTo((0, 0)); pen.lineTo((100, 0))
            pen.lineTo((100, 100)); pen.closePath()
            glyphs[n] = pen.glyph()
        fb.setupGlyf(glyphs)
        fb.setupHorizontalMetrics({n: (500, 0) for n in names})
        fb.setupHorizontalHeader(ascent=800, descent=-200)
        fb.setupNameTable({"familyName": "R", "styleName": "R"})
        fb.setupOS2(); fb.setupPost()
        addOpenTypeFeaturesFromString(fb.font, """
languagesystem DFLT dflt;
feature calt {
    rsub a' b by a.fin;
} calt;
""")
        buf = io.BytesIO()
        fb.font.save(buf)
        f = Font(buf.getvalue())
        sh = f.shaper((b"calt",))
        a, b, afin = 1, 2, 3
        assert sh.apply([a, b]) == [afin, b]
        assert sh.apply([a, a]) == [a, a]


class TestAlternateSelection:
    def test_alt_index_picks_nth(self):
        gsub = build_gsub(
            [(b"salt", [0])],
            [(3, 0, [gsub_alternate({10: [100, 101, 102]})])],
        )
        sh = shaper(gsub, tags=(b"salt",))
        assert sh.apply([10]) == [100]       # default: alternate 0
        sh.alt_index = 1
        assert sh.apply([10]) == [101]
        sh.alt_index = 2
        assert sh.apply([10]) == [102]
        sh.alt_index = 99                    # clamps into the set
        assert sh.apply([10]) == [102]

    def test_layout_threads_alternate(self, dejavu):
        # DejaVu has no salt alternates; the knob must be a no-op there
        from fontrx.scene.layout import layout_text

        a = layout_text(dejavu, "Ag", ligatures=True, alternate=1)
        b = layout_text(dejavu, "Ag", ligatures=True)
        assert [i.x for i in a.instances] == [i.x for i in b.instances]


class TestLigatureComponentTracking:
    """GSUB ligature formation records which component each skipped
    mark followed (`GsubShaper.last_lig_comps`), the side channel GPOS
    mark-to-ligature consumes."""

    def test_marks_between_components_get_indices(self):
        from tests.ttf_builder import build_gdef

        gdef = build_gdef(glyph_classes={50: 3, 51: 3})
        # liga [10, 11, 12] -> 30 under ignore-marks (flag 0x8)
        gsub = build_gsub(
            [(b"liga", [0])],
            [(4, 0x0008, [gsub_ligature({10: [([11, 12], 30)]})])],
        )
        from fontrx.font.gdef import GdefTable
        from fontrx.utils.reader import BigEndianReader

        sh = GsubShaper.parse(
            BigEndianReader(gsub, 0), tags=(b"liga",),
            gdef=GdefTable.parse(BigEndianReader(gdef, 0)))
        # 10 [mark50] 11 [mark51] 12 -> lig 30 with both marks kept
        out = sh.apply([10, 50, 11, 51, 12])
        assert out == [30, 50, 51]
        # mark after the first component -> 1; after the second -> 2
        assert sh.last_lig_comps == [0, 1, 2]

    def test_no_marks_all_zero(self):
        gsub = build_gsub(
            [(b"liga", [0])],
            [(4, 0, [gsub_ligature({10: [([11], 30)]})])],
        )
        sh = shaper(gsub, tags=(b"liga",))
        out = sh.apply([10, 11, 12])
        assert out == [30, 12]
        assert sh.last_lig_comps == [0, 0]
