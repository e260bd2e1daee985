"""Exhaustive FreeType differential sweep for the hinting interpreter.

Usage: python tools/ft_sweep.py [font.ttf] [ppem,ppem,...]

Compares every glyph of the font at each ppem through BOTH engines —
FT_Load_Glyph (interpreter-version 35, via fontrx/native/ft.py) and
fontrx.font.hinting.hint_glyph — checking grid-fitted 26.6 points,
contour structure and hinted advances.  Round-4 pinned result:
0 divergences over all six DejaVu faces x 14 ppems (366,464 loads).
Re-run after ANY interpreter change; CI keeps strided samples
(tests/test_ft_differential.py)."""

import sys

sys.path.insert(0, ".")

from fontrx.font.font import Font                      # noqa: E402
from fontrx.font.hinting import HintingError, hint_glyph  # noqa: E402
from fontrx.native import ft                           # noqa: E402


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
    ppems = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2
                              else ["8", "12", "16", "24", "48"])]
    if not ft.available():
        print("libfreetype unavailable; nothing to compare")
        return 1
    lib = ft.Library(interpreter_version=35)
    data = open(path, "rb").read()
    font = Font(data)
    tot = bad = errs = 0
    examples = []
    for ppem in ppems:
        face = lib.face(data)
        face.set_pixel_sizes(ppem)
        for gid in range(face.num_glyphs):
            ref = face.load(gid)
            try:
                out = hint_glyph(font, gid, ppem)
            except HintingError as e:
                errs += 1
                if len(examples) < 10:
                    examples.append((ppem, gid, "rxerr", str(e)))
                continue
            tot += 1
            n = len(out.points)
            ok = (len(ref.points) == n and ref.ends == out.ends
                  and (n == 0 or (ref.points == out.points).all())
                  and ref.advance_x == ((out.advance + 32) & -64))
            if not ok:
                bad += 1
                if len(examples) < 10:
                    examples.append((ppem, gid, "mismatch"))
    print(f"{path}: compared {tot}, mismatched {bad}, rx errors {errs}")
    for e in examples:
        print(" ", e)
    return 1 if (bad or errs) else 0


if __name__ == "__main__":
    raise SystemExit(main())
