"""Arabic positional shaping tests (`fontrx/font/arabic.py`) — joining
classes derived from the font's own init/medi/fina coverage, applied
per position in logical order.  DejaVu Sans carries the features."""

import numpy as np
import pytest

U = dict(beh=0x628, seen=0x633, meem=0x645, alef=0x627, lam=0x644,
         fatha=0x64E)


@pytest.fixture(scope="module")
def ar(dejavu):
    sh = dejavu.arabic_shaper
    assert sh is not None
    return sh


class TestJoiningClasses:
    def test_font_derived_classes(self, dejavu, ar):
        gid = dejavu.glyph_index
        assert ar.joining_class(gid(U["beh"])) == "D"
        assert ar.joining_class(gid(U["lam"])) == "D"
        assert ar.joining_class(gid(U["alef"])) == "R"
        assert ar.joining_class(gid(U["fatha"])) == "T"
        assert ar.joining_class(gid(ord("A"))) == "U"


class TestForms:
    def _forms(self, dejavu, ar, cps):
        gids = [dejavu.glyph_index(c) for c in cps]
        return ar.forms(cps, gids)

    def test_basmala_prefix(self, dejavu, ar):
        # beh seen meem: init, medial, final
        assert self._forms(dejavu, ar,
                           [U["beh"], U["seen"], U["meem"]]) == \
            [b"init", b"medi", b"fina"]

    def test_right_joiner_ends_the_chain(self, dejavu, ar):
        # beh alef: alef joins backward only
        assert self._forms(dejavu, ar, [U["beh"], U["alef"]]) == \
            [b"init", b"fina"]
        # alef beh: neither joins (alef cannot join forward)
        assert self._forms(dejavu, ar, [U["alef"], U["beh"]]) == \
            [None, None]

    def test_marks_are_transparent(self, dejavu, ar):
        assert self._forms(
            dejavu, ar, [U["beh"], U["fatha"], U["seen"]]
        ) == [b"init", None, b"fina"]

    def test_latin_untouched(self, dejavu, ar):
        assert self._forms(dejavu, ar, [ord("A"), ord("B")]) == \
            [None, None]


class TestLayoutIntegration:
    def test_positional_glyphs_substituted(self, dejavu):
        from fontrx.scene.layout import layout_text

        text = chr(U["beh"]) + chr(U["seen"]) + chr(U["meem"])
        base = [dejavu.glyph_index(c) for c in text]
        lt = layout_text(dejavu, text, rtl=True)
        shaped = [lt.slot_gids[i.glyph_slot] for i in lt.instances]
        assert len(shaped) == 3
        assert all(s != b for s, b in zip(shaped, base))  # all re-formed
        # the shaped line renders with ink
        assert lt.batch.segments.any()

    def test_lam_alef_ligates_after_forms(self, dejavu):
        from fontrx.scene.layout import layout_text

        lt = layout_text(
            dejavu, chr(U["lam"]) + chr(U["alef"]),
            rtl=True, ligatures=True,
        )
        assert len(lt.instances) == 1  # one lam-alef ligature glyph

    def test_latin_text_does_not_engage_arabic_path(self, dejavu):
        from fontrx.scene.layout import layout_text

        a = layout_text(dejavu, "AV", kern=True)
        gids = [a.slot_gids[i.glyph_slot] for i in a.instances]
        assert gids == [dejavu.glyph_index(c) for c in "AV"]


class TestJoinCausers:
    def test_tatweel_joins_neighbors(self, dejavu, ar):
        # beh + tatweel + beh: kashida elongation — both behs join
        # across it (tatweel is join-causing)
        cps = [U["beh"], 0x0640, U["beh"]]
        gids = [dejavu.glyph_index(c) for c in cps]
        forms = ar.forms(cps, gids)
        assert forms[0] == b"init" and forms[2] == b"fina"

    def test_zwj_causes_joining(self, dejavu, ar):
        # beh + ZWJ: the beh takes its initial form
        cps = [U["beh"], 0x200D]
        gids = [dejavu.glyph_index(U["beh"]), 0]
        assert ar.forms(cps, gids)[0] == b"init"

    def test_single_sub_only_length_stable(self, dejavu, ar):
        # apply() never changes the buffer length, whatever the
        # features contain
        cps = [U["beh"], U["seen"], U["meem"], 0x0640]
        gids = [dejavu.glyph_index(c) for c in cps]
        out = ar.apply(cps, gids)
        assert len(out) == len(gids)
