"""Bidi-lite tests (`fontrx/font/bidi.py` + `layout_text(bidi=True)`):
strong-types run itemization with N1/N2 neutral resolution, per-run
shaping, and per-run visual mirroring."""

import numpy as np
import pytest

from fontrx.font.bidi import char_direction, split_runs


class TestClassification:
    def test_directions(self):
        assert char_direction(ord("A")) == "L"
        assert char_direction(0x05E9) == "R"   # shin
        assert char_direction(0x0628) == "R"   # beh
        assert char_direction(0xFB50) == "R"   # presentation form
        assert char_direction(ord(" ")) == "N"
        assert char_direction(ord(".")) == "N"
        assert char_direction(0x200E) == "L"   # LRM
        assert char_direction(0x200F) == "R"   # RLM


class TestRuns:
    def test_pure_runs(self):
        assert split_runs([ord(c) for c in "abc"], False) == [(0, 3, False)]
        assert split_runs([0x5E9, 0x5DC], False) == [(0, 2, True)]

    def test_mixed_with_neutrals(self):
        cps = [ord(c) for c in "ab "] + [0x5E9, 0x5DC] + [ord(c) for c in " cd"]
        runs = split_runs(cps, False)
        # the spaces split per N1: between L and R they take the base
        assert runs == [(0, 3, False), (3, 5, True), (5, 8, False)]

    def test_neutral_between_same_direction_joins(self):
        cps = [0x5E9, ord(" "), 0x5DC]
        assert split_runs(cps, False) == [(0, 3, True)]

    def test_base_direction_decides_boundary_neutrals(self):
        cps = [ord(" "), 0x5E9]
        assert split_runs(cps, True) == [(0, 2, True)]
        assert split_runs(cps, False) == [(0, 1, False), (1, 2, True)]

    def test_empty(self):
        assert split_runs([], False) == []


class TestLayoutBidi:
    def _positions(self, lt, font):
        return [
            (font.charmap.char_for_glyph(lt.slot_gids[i.glyph_slot]), i.x)
            for i in lt.instances
        ]

    def test_mixed_line_visual_order(self, dejavu):
        from fontrx.scene.layout import layout_text

        text = "abc שלום xyz"
        lt = layout_text(dejavu, text, bidi=True)
        pos = {cp: x for cp, x in self._positions(lt, dejavu)}
        # LTR segments keep order; Hebrew run reverses internally
        assert pos[ord("a")] < pos[ord("b")] < pos[ord("c")]
        assert pos[ord("x")] < pos[ord("y")] < pos[ord("z")]
        shin, mem = 0x05E9, 0x05DD
        assert pos[shin] > pos[mem]       # first logical letter rightmost
        # run order on the line: abc < hebrew-span < xyz
        assert pos[ord("c")] < pos[mem]
        assert pos[shin] < pos[ord("x")]

    def test_rtl_base_mixed(self, dejavu):
        from fontrx.scene.layout import layout_text

        text = "שלום abc"
        lt = layout_text(dejavu, text, bidi=True, rtl=True)
        pos = {cp: x for cp, x in self._positions(lt, dejavu)}
        shin = 0x05E9
        # RTL base: the Hebrew (first logical) run sits at the RIGHT,
        # the Latin run at the left — with Latin internally LTR
        assert pos[shin] > pos[ord("c")]
        assert pos[ord("a")] < pos[ord("b")] < pos[ord("c")]

    def test_pure_rtl_line_matches_rtl_flag(self, dejavu):
        from fontrx.scene.layout import layout_text

        text = "שלום"
        a = layout_text(dejavu, text, rtl=True)
        b = layout_text(dejavu, text, rtl=True, bidi=True)
        pa = sorted((i.glyph_slot, round(i.x)) for i in a.instances)
        pb = sorted((i.glyph_slot, round(i.x)) for i in b.instances)
        assert pa == pb

    def test_pure_ltr_is_identity(self, dejavu):
        from fontrx.scene.layout import layout_text

        a = layout_text(dejavu, "hello", kern=True)
        b = layout_text(dejavu, "hello", kern=True, bidi=True)
        assert [(i.x, i.y) for i in a.instances] == \
               [(i.x, i.y) for i in b.instances]

    def test_arabic_joins_inside_bidi_runs(self, dejavu):
        from fontrx.scene.layout import layout_text

        text = "id: بسم"
        base = [dejavu.glyph_index(c) for c in "بسم"]
        lt = layout_text(dejavu, text, bidi=True)
        gids = {lt.slot_gids[i.glyph_slot] for i in lt.instances}
        # the Arabic letters took positional forms (not the base gids)
        assert not (set(base) & gids)

    def test_ligatures_shape_per_run(self, dejavu):
        from fontrx.scene.layout import layout_text

        lt = layout_text(dejavu, "fi שלום", bidi=True, ligatures=True)
        # the fi ligature formed inside its LTR run: 1 lig + space + 4
        assert len(lt.instances) == 6

    def test_wrap_now_composes(self, dejavu):
        # round 4: wrap_width is no longer ignored under bidi — a
        # tight budget produces multiple lines (full behavior pinned
        # in TestBidiWrap)
        from fontrx.scene.layout import layout_text

        lt = layout_text(
            dejavu, "abc שלום abc", bidi=True, wrap_width=4000
        )
        assert len({round(i.y) for i in lt.instances}) > 1


class TestMirroredForms:
    def test_l4_brackets_mirror_in_rtl_runs(self, dejavu):
        """UAX#9 L4: a '(' inside an RTL run renders as ')'."""
        from fontrx.scene.layout import layout_text

        # paren attached to the Hebrew run under an RTL base
        text = "(שלום)"
        lt = layout_text(dejavu, text, bidi=True, rtl=True)
        open_gid = dejavu.glyph_index("(")
        close_gid = dejavu.glyph_index(")")
        gids = [lt.slot_gids[i.glyph_slot] for i in lt.instances]
        # logical '(' became ')' and vice versa
        assert gids[0] == close_gid and gids[-1] == open_gid
        # visually: the line starts (leftmost) with a '(' shape again
        xs = {gid: x for gid, x in zip(
            gids, (i.x for i in lt.instances))}
        assert xs[open_gid] < xs[close_gid]

    def test_ltr_runs_unmirrored(self, dejavu):
        from fontrx.scene.layout import layout_text

        lt = layout_text(dejavu, "(ab)", bidi=True)
        gids = [lt.slot_gids[i.glyph_slot] for i in lt.instances]
        assert gids[0] == dejavu.glyph_index("(")
        assert gids[-1] == dejavu.glyph_index(")")


class TestBidiMarksRegression:
    def test_rtl_base_double_mirror_keeps_marks_on_base(self, dejavu):
        """Marks in an LTR run under an RTL base survive the double
        mirror: the mark stays within one advance-width of its base
        (a stale-box bug once threw it ~3000 units off the line)."""
        from fontrx.scene.layout import layout_text

        text = "של x\u0302y"  # x-circumflex: no precomposed form
        lt = layout_text(dejavu, text, bidi=True, rtl=True, marks=True)
        gids = [lt.slot_gids[i.glyph_slot] for i in lt.instances]
        e_gid = dejavu.glyph_index("x")
        acc_gid = dejavu.glyph_index(0x0302)
        xs = dict(zip(gids, (i.x for i in lt.instances)))
        assert abs(xs[acc_gid] - xs[e_gid]) < 1300  # one advance box
        # nothing flies off the line
        for i in lt.instances:
            assert -100 <= i.x <= lt.width + 100


class TestBidiWrap:
    """wrap_width composes with bidi (round 4 — previously a
    documented incompatibility): lines break on the LOGICAL order at
    UAX#14 opportunities, then L2 reorders each broken line."""

    @staticmethod
    def _vis_lines(lt):
        ys = sorted({round(i.y) for i in lt.instances}, reverse=True)
        out = []
        for y in ys:
            xs = sorted((i.x, i.glyph_slot) for i in lt.instances
                        if round(i.y) == y)
            out.append([lt.slot_chars[s] for _, s in xs])
        return out

    def test_mixed_direction_wrap(self, dejavu):
        from fontrx.scene.layout import layout_text

        upem = dejavu.info.units_per_em
        lt = layout_text(dejavu,
                         "the שלום עולם quick brown אבג דהו fox",
                         bidi=True, wrap_width=9 * upem)
        lines = self._vis_lines(lt)
        assert len(lines) == 3
        # line 1 = logical "the שלום עולם": Hebrew reversed visually
        assert lines[0][:3] == [ord("t"), ord("h"), ord("e")]
        heb = [c for c in lines[0] if c >= 0x5D0]
        assert heb == [ord(c) for c in "םלוע םולש" if c != " "]
        # every line fits the budget
        assert lt.width <= 9 * upem * 1.05

    def test_rtl_base_wrap_logical_breaks(self, dejavu):
        from fontrx.scene.layout import layout_text

        upem = dejavu.info.units_per_em
        lt = layout_text(dejavu, "שלום עולם הזה abc ארוך מאוד כאן",
                         bidi=True, rtl=True, wrap_width=8 * upem)
        lines = self._vis_lines(lt)
        assert len(lines) == 3
        # line 2 holds logical "abc ארוך מאוד"; RTL base puts the
        # logical-first LTR run RIGHTMOST
        assert lines[1][-3:] == [ord("a"), ord("b"), ord("c")]

    def test_wrap_flag_consistency_with_plain(self, dejavu):
        """All-LTR text wraps identically with and without bidi."""
        from fontrx.scene.layout import layout_text

        upem = dejavu.info.units_per_em
        t = "the quick brown fox jumps over it"
        a = layout_text(dejavu, t, wrap_width=9 * upem)
        b = layout_text(dejavu, t, bidi=True, wrap_width=9 * upem)
        pa = sorted((i.x, i.y, a.slot_gids[i.glyph_slot])
                    for i in a.instances)
        pb = sorted((i.x, i.y, b.slot_gids[i.glyph_slot])
                    for i in b.instances)
        assert pa == pb

    def test_soft_hyphen_inside_bidi(self, dejavu):
        from fontrx.scene.layout import layout_text

        upem = dejavu.info.units_per_em
        lt = layout_text(dejavu, "אבג super­califragilistic",
                         bidi=True, wrap_width=8 * upem)
        lines = self._vis_lines(lt)
        assert len(lines) == 2
        assert lines[0][-1] == ord("-")  # materialized hyphen


class TestBidiJustify:
    """align="justify" composes with rtl/bidi: direction-reordered
    lines stretch their space cells in VISUAL order, both margins
    flush; paragraph-final lines under an RTL base flush right."""

    def test_bidi_justify_flush_both_margins(self, dejavu):
        from fontrx.scene.layout import layout_text

        upem = dejavu.info.units_per_em
        budget = 9 * upem
        lt = layout_text(dejavu,
                         "the שלום עולם quick brown אבג דהו fox",
                         bidi=True, wrap_width=budget, align="justify")
        ys = sorted({round(i.y) for i in lt.instances}, reverse=True)
        assert len(ys) == 3
        # non-final lines span exactly [0, budget]
        for y in ys[:-1]:
            xs = [(i.x, i.glyph_slot) for i in lt.instances
                  if round(i.y) == y]
            left = min(x for x, _ in xs)
            right = max(x + float(lt.batch.advance_widths[s]) for x, s in xs
                        if lt.slot_chars[s] != 0x20)
            assert left == pytest.approx(0.0, abs=1.0)
            assert right == pytest.approx(budget, abs=1.0)

    def test_bidi_justify_preserves_visual_order(self, dejavu):
        from fontrx.scene.layout import layout_text

        upem = dejavu.info.units_per_em
        a = layout_text(dejavu, "abc שלום def עולם ghi jkl",
                        bidi=True, wrap_width=9 * upem)
        b = layout_text(dejavu, "abc שלום def עולם ghi jkl",
                        bidi=True, wrap_width=9 * upem,
                        align="justify")
        # same instance count; per line, the x-sorted glyph sequence
        # is unchanged (stretching only widens gaps at spaces)
        assert len(a.instances) == len(b.instances)
        for y in {round(i.y) for i in a.instances}:
            sa = [s for _, s in sorted((i.x, i.glyph_slot)
                                       for i in a.instances
                                       if round(i.y) == y)]
            sb = [s for _, s in sorted((i.x, i.glyph_slot)
                                       for i in b.instances
                                       if round(i.y) == y)]
            assert sa == sb

    def test_rtl_final_line_flush_right(self, dejavu):
        from fontrx.scene.layout import layout_text

        upem = dejavu.info.units_per_em
        budget = 8 * upem
        lt = layout_text(dejavu, "שלום עולם הזה ארוך מאוד כאן",
                         bidi=True, rtl=True, wrap_width=budget,
                         align="justify")
        ys = sorted({round(i.y) for i in lt.instances}, reverse=True)
        assert len(ys) >= 2
        # the paragraph-final (bottom) line's rightmost ink reaches
        # the right margin: RTL start edge
        last = [(i.x, i.glyph_slot) for i in lt.instances
                if round(i.y) == ys[-1]]
        right = max(x + float(lt.batch.advance_widths[s]) for x, s in last)
        assert right == pytest.approx(budget, abs=1.0)

    def test_ltr_only_bidi_matches_plain_justify(self, dejavu):
        from fontrx.scene.layout import layout_text

        upem = dejavu.info.units_per_em
        t = "the quick brown fox jumps over the lazy dog again"
        a = layout_text(dejavu, t, wrap_width=9 * upem,
                        align="justify")
        b = layout_text(dejavu, t, bidi=True, wrap_width=9 * upem,
                        align="justify")
        pa = sorted((round(i.x, 3), round(i.y, 3),
                     a.slot_gids[i.glyph_slot]) for i in a.instances)
        pb = sorted((round(i.x, 3), round(i.y, 3),
                     b.slot_gids[i.glyph_slot]) for i in b.instances)
        assert pa == pb


class TestKashida:
    """layout_text(kashida=True, align="justify"): Arabic justified
    lines stretch at kashida junctions — detected geometrically from
    the font's own init/medi/fina form glyphs — and the widened gaps
    are tiled with tatweel (U+0640) instances so the baseline stroke
    stays continuous."""

    @staticmethod
    def _line_rows(lt, y):
        return sorted((i.x, i.glyph_slot) for i in lt.instances
                      if round(i.y) == y)

    @staticmethod
    def _tatweel_clusters(lt, dejavu, y):
        """Count maximal runs of tatweel instances between real
        (nonzero-advance, non-tatweel) glyphs along one line."""
        tw = int(dejavu.charmap.glyph_index(0x0640))
        rows = [(x, s) for x, s in TestKashida._line_rows(lt, y)
                if float(lt.batch.advance_widths[s]) > 0.0]
        runs, in_run = 0, False
        for _, s in rows:
            is_tw = lt.slot_gids[s] == tw
            if is_tw and not in_run:
                runs += 1
            in_run = is_tw
        return runs

    def test_kashida_inserts_tatweels_and_flushes(self, dejavu):
        from fontrx.scene.layout import layout_text

        upem = dejavu.info.units_per_em
        budget = 7 * upem
        text = "بسم ببب " * 4
        plain = layout_text(dejavu, text.strip(), bidi=True,
                            wrap_width=budget, align="justify")
        kash = layout_text(dejavu, text.strip(), bidi=True,
                           wrap_width=budget, align="justify",
                           kashida=True)
        tw = int(dejavu.charmap.glyph_index(0x0640))
        assert all(g != tw for g in plain.slot_gids)
        n_tw = sum(1 for i in kash.instances
                   if kash.slot_gids[i.glyph_slot] == tw)
        assert n_tw > 0
        # non-final lines stay flush on both margins, tatweels included
        ys = sorted({round(i.y) for i in kash.instances}, reverse=True)
        assert len(ys) >= 2
        for y in ys[:-1]:
            xs = self._line_rows(kash, y)
            left = min(x for x, _ in xs)
            right = max(x + float(kash.batch.advance_widths[s])
                        for x, s in xs
                        if kash.slot_chars[s] != 0x20)
            assert left == pytest.approx(0.0, abs=1.0)
            assert right == pytest.approx(budget, abs=1.0)

    def test_kashida_junctions_tile_continuously(self, dejavu):
        from fontrx.scene.layout import layout_text

        upem = dejavu.info.units_per_em
        budget = 6 * upem
        lt = layout_text(dejavu, "ببب ببب",
                         bidi=True, rtl=True, wrap_width=budget,
                         align="justify", kashida=True)
        tw = int(dejavu.charmap.glyph_index(0x0640))
        ys = sorted({round(i.y) for i in lt.instances}, reverse=True)
        y0 = ys[0]
        # reconstruct ink intervals of every nonzero-advance glyph on
        # the top (justified) line; each Arabic word must be one
        # connected component (the tatweels bridge every widened gap)
        spans = []
        for x, s in self._line_rows(lt, y0):
            if float(lt.batch.advance_widths[s]) <= 0.0:
                continue
            if lt.slot_chars[s] == 0x20:
                spans.append(None)  # word separator
                continue
            g = dejavu.load_glyph(lt.slot_gids[s])
            spans.append((x + g.box.x_min, x + g.box.x_max))
        words, cur = [], []
        for sp in spans:
            if sp is None:
                if cur:
                    words.append(cur)
                cur = []
            else:
                cur.append(sp)
        if cur:
            words.append(cur)
        assert len(words) >= 1
        for word in words:
            hi = word[0][1]
            for lo2, hi2 in word[1:]:
                assert lo2 <= hi + 0.5, "gap inside a joined word"
                hi = max(hi, hi2)

    def test_kashida_prefers_one_point_per_word(self, dejavu):
        from fontrx.scene.layout import layout_text

        upem = dejavu.info.units_per_em
        word = "ب" * 7  # 7 letters -> 6 junctions per word
        pair = word + " " + word
        # width of two words on one line (paragraph-final: unstretched)
        w0 = layout_text(dejavu, pair, bidi=True, rtl=True).width
        # four words + a tight budget wraps to two 2-word lines; the
        # top line justifies with slack upem/2 (well under 3 tatweel
        # widths per point): only the word-final (leftmost) junction
        # of each connected word stretches -> 2 tatweel clusters
        text2 = pair + " " + pair
        tight = layout_text(dejavu, text2, bidi=True, rtl=True,
                            wrap_width=w0 + upem // 2,
                            align="justify", kashida=True)
        ys = sorted({round(i.y) for i in tight.instances}, reverse=True)
        assert len(ys) == 2
        assert self._tatweel_clusters(tight, dejavu, ys[0]) == 2
        # huge slack (> 3 tatweel widths per preferred point, but still
        # under one extra word): every junction participates -> 12
        wide = layout_text(dejavu, text2, bidi=True, rtl=True,
                           wrap_width=w0 + 3 * upem,
                           align="justify", kashida=True)
        ys = sorted({round(i.y) for i in wide.instances}, reverse=True)
        assert len(ys) == 2
        assert self._tatweel_clusters(wide, dejavu, ys[0]) == 12

    def test_kashida_noop_without_tatweel_glyph(self):
        import os

        from fontrx.font.font import Font
        from fontrx.scene.layout import layout_text

        # the feaLib fixture has forms but no U+0640 in cmap: kashida
        # degrades to plain space justification, bit-identically
        arabic_font = Font.open(os.path.join(
            os.path.dirname(__file__), "data", "arabictest.ttf"))
        text = "بمب لمل بم"
        a = layout_text(arabic_font, text, bidi=True, rtl=True,
                        wrap_width=2500, align="justify")
        b = layout_text(arabic_font, text, bidi=True, rtl=True,
                        wrap_width=2500, align="justify", kashida=True)
        pa = sorted((round(i.x, 3), round(i.y, 3),
                     a.slot_gids[i.glyph_slot]) for i in a.instances)
        pb = sorted((round(i.x, 3), round(i.y, 3),
                     b.slot_gids[i.glyph_slot]) for i in b.instances)
        assert pa == pb

    def test_kashida_ignored_for_ltr_text(self, dejavu):
        from fontrx.scene.layout import layout_text

        upem = dejavu.info.units_per_em
        t = "the quick brown fox jumps over the lazy dog again"
        a = layout_text(dejavu, t, bidi=True, wrap_width=9 * upem,
                        align="justify")
        b = layout_text(dejavu, t, bidi=True, wrap_width=9 * upem,
                        align="justify", kashida=True)
        tw = int(dejavu.charmap.glyph_index(0x0640))
        assert all(g != tw for g in b.slot_gids)
        pa = sorted((round(i.x, 3), round(i.y, 3),
                     a.slot_gids[i.glyph_slot]) for i in a.instances)
        pb = sorted((round(i.x, 3), round(i.y, 3),
                     b.slot_gids[i.glyph_slot]) for i in b.instances)
        assert pa == pb
