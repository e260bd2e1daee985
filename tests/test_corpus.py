"""Cross-font corpus: parse + raster + layout over a set of real
hinted/compound-heavy fonts (ROADMAP testing item: golden-corpus
expansion beyond DejaVuSans).

Every font in the corpus must (a) parse, (b) raster a sample of glyphs
BIT-identically to the float oracle on the jnp backend, (c) survive
layout with every shaping extension enabled, and (d) degrade GSUB/GPOS
/GDEF to None rather than raise when absent or unusable.
"""

import os

import numpy as np
import pytest

from fontrx.font.font import Font

DEJAVU_DIR = "/usr/share/fonts/truetype/dejavu"


def _corpus() -> list[str]:
    paths = [
        os.path.join(DEJAVU_DIR, f)
        for f in (
            "DejaVuSerif.ttf",
            "DejaVuSansMono.ttf",
            "DejaVuSans-Bold.ttf",
            "DejaVuSerif-Bold.ttf",
        )
        if os.path.exists(os.path.join(DEJAVU_DIR, f))
    ]
    try:
        import matplotlib

        ttf_dir = os.path.join(matplotlib.get_data_path(), "fonts", "ttf")
        for f in (
            "STIXGeneral.ttf",        # compound-heavy math font
            "STIXGeneralItalic.ttf",
            "STIXNonUni.ttf",         # non-BMP cmap coverage
            "cmr10.ttf",              # Computer Modern (legacy encodings)
            "cmtt10.ttf",
        ):
            p = os.path.join(ttf_dir, f)
            if os.path.exists(p):
                paths.append(p)
    except ImportError:
        pass
    # OpenType-CFF fixtures (the CFF frontend rides the same corpus
    # checks: parse, oracle-exact raster, layout, degradation)
    pygame_fix = (
        "/opt/venv/lib/python3.12/site-packages/pygame/tests/fixtures/fonts"
    )
    for f in ("test_fixed.otf", "PyGameMono.otf"):
        p = os.path.join(pygame_fix, f)
        if os.path.exists(p):
            paths.append(p)
    # synthetic variable-font fixtures (fvar/gvar path)
    here = os.path.dirname(__file__)
    for f in ("vartest.ttf", "vartest2.ttf"):
        p = os.path.join(here, "data", f)
        if os.path.exists(p):
            paths.append(p)
    return paths


CORPUS = _corpus()


@pytest.fixture(scope="module", params=CORPUS, ids=[os.path.basename(p) for p in CORPUS])
def corpus_font(request):
    return Font.open(request.param)


class TestCorpus:
    def test_parses_and_maps(self, corpus_font):
        f = corpus_font
        assert f.num_glyphs > 0
        # at least one mapped character resolves to a real glyph
        # (STIXNonUni maps only non-BMP supplements, no ASCII)
        dump = f.dump_charmap(limit=4)
        assert dump  # charmap has ranges

    def test_raster_bit_exact_vs_oracle(self, corpus_font):
        """jnp-backend winding maps must equal the float oracle pixel
        for pixel on a glyph sample (every 97th glyph + ASCII 'A g @')."""
        from fontrx.engine.raster import RasterEngine
        from fontrx.kernels import oracle
        from fontrx.kernels.grid import RasterGrid
        from fontrx.pack.segments import pack_glyph

        f = corpus_font
        eng = RasterEngine(backend="jnp")
        step = max(1, f.num_glyphs // 16)
        gids = list(range(1, f.num_glyphs, step))
        gids += [f.glyph_index(c) for c in "Ag@"]
        checked = 0
        for gid in gids:
            g = f.load_glyph_safe(gid)
            p = pack_glyph(g)
            if p.seg_count == 0:
                continue
            grid = RasterGrid.for_glyph_box(p.box, 48, f.info.units_per_em)
            w = np.asarray(eng.winding_glyph(p.segments, grid))
            ys = grid.max_y - np.arange(grid.height, dtype=np.float64)
            xs = grid.min_x + np.arange(grid.width, dtype=np.float64)
            wo = oracle.winding_at(
                p.segments,
                (xs / grid.scale)[None, :].astype(np.float32),
                (ys / grid.scale)[:, None].astype(np.float32),
            )
            np.testing.assert_array_equal(w, wo, err_msg=f"gid {gid}")
            checked += 1
        assert checked >= 4

    def test_layout_all_extensions(self, corpus_font):
        from fontrx.scene.layout import layout_text

        lt = layout_text(
            corpus_font, "Tiffany flies off!\nVA fjord",
            kern=True, ligatures=True, marks=True,
        )
        assert len(lt.instances) >= 20
        assert lt.width > 0 and lt.height > 0

    def test_layout_features_and_vertical(self, corpus_font):
        from fontrx.scene.layout import layout_text

        lt = layout_text(
            corpus_font, "AB", features=(b"ccmp", b"dlig"), vertical=True
        )
        assert len(lt.instances) == 2
        # vertical: single column, instances stacked downward
        assert lt.instances[0].y > lt.instances[1].y

    def test_layout_tables_degrade_not_raise(self, corpus_font):
        f = corpus_font
        # any of these may be None; none may raise
        f.shaper((b"liga", b"rlig"))
        f.gdef
        f.kerning
        f.mark_positioning
        f.vertical_metrics

    def test_gpos_engine_matches_legacy_layout(self, corpus_font):
        """Engine-driven positioning must reproduce the legacy
        flattened kern path on every corpus font that has GPOS kern
        (both read the same PairPos lookups); fonts without one must
        fall back to identical legacy placement either way."""
        from fontrx.scene.layout import layout_text

        text = "AVATAR To.\nWavy f."
        a = layout_text(corpus_font, text, kern=True)
        b = layout_text(corpus_font, text, kern=True, positioning=())
        pa = np.array([[i.x, i.y] for i in a.instances])
        pb = np.array([[i.x, i.y] for i in b.instances])
        assert pa.shape == pb.shape
        # identical unless the font's kern table and GPOS disagree —
        # which test_gpos.py rules out for fonts carrying both
        if corpus_font.gpos_kerning is not None or \
                corpus_font.positioner((b"kern",)) is None:
            np.testing.assert_array_equal(pa, pb)

    def test_positioner_degrades_not_raise(self, corpus_font):
        sh = corpus_font.positioner((b"kern", b"mark", b"mkmk"))
        if sh is not None:
            gids = [corpus_font.glyph_index(c) for c in "AVo"]
            pos = sh.positions(gids, [100, 100, 100])
            assert len(pos.x_advance) == 3
