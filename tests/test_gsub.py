"""GSUB ligature tests (capability extension — the reference maps each
codepoint straight to one glyph, ``src/Appli.zig:318-341``).

Cross-check: DejaVu also maps the precomposed ligature codepoints
(U+FB00..U+FB06) in cmap, so the GSUB substitution result must equal
the cmap lookup of the corresponding ligature character."""

import numpy as np
import pytest


class TestLigatureTable:
    def test_fi_matches_precomposed_codepoint(self, dejavu):
        lt = dejavu.ligatures
        assert lt is not None
        gi = dejavu.glyph_index
        assert lt.apply([gi("f"), gi("i")]) == [gi(0xFB01)]  # fi
        assert lt.apply([gi("f"), gi("l")]) == [gi(0xFB02)]  # fl
        assert lt.apply([gi("f"), gi("f")]) == [gi(0xFB00)]  # ff

    def test_three_component_preferred(self, dejavu):
        # set order must pick ffi/ffl over ff+i / ff+l
        gi = dejavu.glyph_index
        lt = dejavu.ligatures
        assert lt.apply([gi("f"), gi("f"), gi("i")]) == [gi(0xFB03)]
        assert lt.apply([gi("f"), gi("f"), gi("l")]) == [gi(0xFB04)]

    def test_non_ligating_passthrough(self, dejavu):
        gi = dejavu.glyph_index
        lt = dejavu.ligatures
        stream = [gi(c) for c in "abcf"]
        assert lt.apply(stream) == stream  # trailing f has no follower
        assert lt.apply([]) == []

    def test_mid_stream(self, dejavu):
        gi = dejavu.glyph_index
        lt = dejavu.ligatures
        out = lt.apply([gi(c) for c in "affix"])
        assert out == [gi("a"), gi(0xFB03), gi("x")]


class TestLayoutLigatures:
    def test_layout_substitutes_and_shortens(self, dejavu):
        from fontrx.scene.layout import layout_text

        plain = layout_text(dejavu, "fi")
        liga = layout_text(dejavu, "fi", ligatures=True)
        assert len(plain.instances) == 2
        assert len(liga.instances) == 1
        # DejaVu's fi advance happens to equal f+i exactly; the pen
        # extent may only shrink or stay, never grow
        assert liga.width <= plain.width
        # the single slot is the fi-ligature glyph
        assert liga.slot_chars == [0xFB01]

    def test_ligatures_respect_newlines(self, dejavu):
        from fontrx.scene.layout import layout_text

        liga = layout_text(dejavu, "f\ni", ligatures=True)
        assert len(liga.instances) == 2  # no cross-line ligation

    def test_default_layout_unchanged(self, dejavu):
        from fontrx.scene.layout import layout_text

        lt = layout_text(dejavu, "AAB")
        assert len(lt.batch) == 2
        assert len(lt.instances) == 3

    def test_kern_plus_ligatures(self, dejavu):
        from fontrx.scene.layout import layout_text

        # 'Tfi' kerns T against the ligature glyph, not against 'f'
        both = layout_text(dejavu, "Tfi", kern=True, ligatures=True)
        assert len(both.instances) == 2


class TestCLILigaFlag:
    FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"

    def test_liga_flag_changes_rendered_outline(self, tmp_path):
        from fontrx.cli.main import main
        from fontrx.io.qoi import decode

        plain, liga = tmp_path / "p.qoi", tmp_path / "l.qoi"
        assert main(["-f", self.FONT, "-t", "fi", "-m", "fill",
                     "-s", "48", "-o", str(plain)]) == 0
        assert main(["-f", self.FONT, "-t", "fi", "-m", "fill",
                     "-s", "48", "-o", str(liga), "-l"]) == 0
        ip = np.asarray(decode(plain.read_bytes()))
        il = np.asarray(decode(liga.read_bytes()))
        # DejaVu's fi ligature has the same total advance as f+i, so
        # the pages are the same size — but the ligature is a single
        # connected outline (no separate i dot), so pixels must differ
        assert ip.shape == il.shape
        assert (ip != il).any()
        assert il.any()  # and the ligature actually rendered ink


class TestLigatureTags:
    def test_dlig_beyond_default(self, dejavu):
        """Discretionary ligatures parse via the tags parameter and
        differ from the default liga+rlig set."""
        default = dejavu.ligatures
        dlig = dejavu.ligature_table((b"dlig",))
        assert dlig is not None and dlig.sets
        # DejaVu's dlig set is disjoint from its liga set's coverage
        # for at least one first-glyph
        assert any(k not in default.sets or dlig.sets[k] != default.sets[k]
                   for k in dlig.sets)
        # applying dlig substitutes something liga does not
        ext = dejavu.ligature_table((b"liga", b"rlig", b"dlig"))
        assert ext is not None
        assert sum(len(v) for v in ext.sets.values()) > sum(
            len(v) for v in default.sets.values()
        )

    def test_cache_and_missing(self, dejavu):
        assert dejavu.ligature_table((b"dlig",)) is dejavu.ligature_table(
            (b"dlig",)
        )
        assert dejavu.ligature_table((b"zzzz",)) is None
