"""Mixed-script end-to-end canary (VERDICT r3 item 9).

One CLI-rendered page mixing Latin, Arabic (RTL + isolates),
Devanagari, Thai, Khmer, and CJK through a font fallback stack — the
eight shaping engines composing in ONE layout with bidi itemization.
The page hash is pinned (CPU backend is deterministic), and each
script run is hb-pen-differentialed through the full layout path on
its fixture font.  (Emoji ride the color-glyph suites — no fixture
maps emoji codepoints.)
"""

import hashlib

import numpy as np
import pytest

from fontrx.font.font import Font
from fontrx.native import hb

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"

FALLBACKS = [
    "tests/data/arabictest.ttf",
    "tests/data/devatest.ttf",
    "tests/data/thaitest.ttf",
    "tests/data/khmrtest.ttf",
    "tests/data/cjktest.ttf",
]

AR = "السلام"          # السلام
DEVA = "निम्न"              # निम्न
THAI = "ที่"                          # ที่
KHMER = "ខ្មែរ"             # ខ្មែរ
CJK = "一二三"
MIXED = (
    "Fox ⁧" + AR + "⁩ " + DEVA + " " + THAI + " "
    + KHMER + " " + CJK + " end"
)

# sha256 of the CPU-rendered gray page (re-pin deliberately when the
# layout/raster pipeline changes on purpose).  The page mixes the
# system DejaVuSans with the repo fixtures, so the pin is only valid
# for the DejaVuSans build it was rendered with — DEJAVU_SHA guards
# against silently comparing across environments.
# NOTE: pinned under the pytest/conftest environment (CPU backend, 8
# virtual devices, jax pre-imported by sitecustomize) — XLA:CPU emits
# bitwise-different (both deterministic) rasters when jax initializes
# with JAX_PLATFORMS=cpu from the shell, so re-pin through pytest.
PIN = "2221386b2981ecbedd6f44488c0688360ed124c2c43cbcdc437d06248924968b"
DEJAVU_SHA = "abdc775b21b1bc470d50c97e790d276f2054b7504e56e5bd3e64f48d68582322"


def _ours(font, text, **kw):
    from fontrx.scene.layout import layout_text

    kw.setdefault("positioning", ())
    kw.setdefault("marks", True)
    lt = layout_text(font, text, **kw)
    gids = [lt.slot_gids[i.glyph_slot] for i in lt.instances]
    pos = [(round(i.x), round(i.y)) for i in lt.instances]
    return gids, pos


def _theirs(font_bytes, text, direction=None, features=""):
    out = hb.shape(font_bytes, text, direction=direction,
                   features=features)
    gids = [g.gid for g in out]
    pos = []
    pen = 0
    for g in out:
        pos.append((pen + g.x_offset, g.y_offset))
        pen += g.x_advance
    return gids, pos


class TestMixedScriptGolden:
    def test_page_hash_pinned(self, tmp_path):
        from fontrx.cli.main import main
        from fontrx.io.qoi import decode

        with open(DEJAVU, "rb") as f:
            dj_sha = hashlib.sha256(f.read()).hexdigest()
        if dj_sha != DEJAVU_SHA:
            pytest.skip("system DejaVuSans differs from the pinned build")
        out = tmp_path / "mixed.qoi"
        rc = main([
            "-f", DEJAVU, "--fallback", ",".join(FALLBACKS),
            "-t", MIXED, "-m", "gray", "-s", "48", "--bidi", "--marks",
            "-o", str(out),
        ])
        assert rc == 0
        img = decode(out.read_bytes())
        assert img.ndim == 3 and img.shape[2] == 3
        ink = (img < 250).any(axis=2)
        assert ink.sum() > 2000, "page suspiciously empty"
        # ink spans the full line: every quarter of the width has some
        q = img.shape[1] // 4
        for k in range(4):
            assert ink[:, k * q : (k + 1) * q].any(), f"quarter {k} empty"
        sha = hashlib.sha256(np.ascontiguousarray(img).tobytes()).hexdigest()
        assert sha == PIN, f"mixed-script page hash drifted: {sha}"

    @pytest.mark.parametrize("path,text,rtl", [
        ("tests/data/arabictest.ttf", AR, True),
        ("tests/data/devatest.ttf", DEVA, False),
        ("tests/data/thaitest.ttf", THAI, False),
        ("tests/data/khmrtest.ttf", KHMER, False),
        ("tests/data/cjktest.ttf", CJK, False),
    ])
    def test_each_run_hb_pen_exact(self, path, text, rtl):
        """Every script run of the mixed page, shaped through the FULL
        layout path on its fixture font, matches hb's glyph stream and
        pen positions exactly."""
        if not hb.available():
            pytest.skip("libharfbuzz unavailable")
        font = Font.open(path)
        with open(path, "rb") as f:
            data = f.read()
        ours = _ours(font, text, rtl=rtl, bidi=rtl)
        theirs = _theirs(data, text)
        if rtl:
            # layout keeps the LOGICAL stream order with visual pen
            # positions; hb emits the RTL run in VISUAL order — the
            # reversed streams must agree glyph-for-glyph, pens
            # re-anchored to the line's visual origin
            og, op = (list(reversed(s)) for s in ours)
            tg, tp = theirs
            assert og == tg, (og, tg)
            dx = op[0][0] - tp[0][0]
            assert all((x - dx, y) == t for (x, y), t in zip(op, tp)), (
                op, tp)
        else:
            assert ours == theirs, (ours, theirs)
