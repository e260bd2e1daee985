"""Exhaustive HarfBuzz differential sweep for one Indic script.

Usage: PYTHONPATH=. python tools/indic_sweep.py <script> [maxlen] [nrand]

Loads ``tests/data/<script>test.ttf`` (make_fixtures.make_indic_corpus),
shapes every string of length <= maxlen over the fixture's mapped
block alphabet with BOTH fontrx's Indic engine and the system
HarfBuzz, and reports divergences (plus nrand seeded-random longer
strings).  Joiner glyphs (ZWJ/ZWNJ and hb's invisible replacement)
are stripped from both streams before comparison: hb hides default
ignorables post-shaping by swapping in the space glyph, which is
presentation, not shaping.  Dev-time tool; the reduced sweeps are
pinned in tests/test_indic_scripts.py.
"""

import itertools
import random
import sys

sys.path.insert(0, ".")

from fontTools.ttLib import TTFont  # noqa: E402

from fontrx.font.font import Font  # noqa: E402
from fontrx.native import hb  # noqa: E402

script = sys.argv[1]
maxlen = int(sys.argv[2]) if len(sys.argv) > 2 else 3
nrand = int(sys.argv[3]) if len(sys.argv) > 3 else 20000

path = f"tests/data/{script}test.ttf"
font = Font.open(path)
data = open(path, "rb").read()
names = TTFont(path).getGlyphOrder()
sh = font.indic_shaper
assert sh is not None and sh.available, "shaper unavailable"

tt = TTFont(path)
cmap = tt.getBestCmap()
ALPHA = sorted(cp for cp in cmap
               if 0x0900 <= cp <= 0x0DFF) + [0x20]
JOIN = {0x200C, 0x200D}
# space: hb's invisible stand-in for hidden joiners; .notdef: what an
# unmapped joiner becomes in fontrx's stream (devatest).  Stripping
# only happens on strings that contain joiners/spaces, where every
# alphabet char is mapped, so no real .notdef can be masked.
STRIP = {"zwnj", "zwj", "space", ".notdef"}
# joiners ride the random corpus only (see module docstring)
RAND_ALPHA = ALPHA + [0x200C, 0x200D]

tag = script.encode()


def ours(text):
    cps = [ord(c) for c in text]
    gids = [int(font.charmap.glyph_index(c)) for c in cps]
    return [names[g] for g in sh.shape(cps, gids, script=tag)]


def theirs(text):
    return [names[g.gid] for g in hb.shape(data, text)]


def diff(text, strip):
    exp, got = theirs(text), ours(text)
    if strip:
        exp = [g for g in exp if g not in STRIP]
        got = [g for g in got if g not in STRIP]
    return None if got == exp else (text, exp, got)


bad = []
total = 0
for n in range(1, maxlen + 1):
    for tup in itertools.product(ALPHA, repeat=n):
        total += 1
        d = diff("".join(map(chr, tup)), strip=(0x20 in tup))
        if d:
            bad.append(d)
    print(f"len<={n}: {total} strings, {len(bad)} diffs", flush=True)

rng = random.Random(20260818)
rbad = []
for _ in range(nrand):
    n = rng.randint(3, 10)
    t = "".join(chr(rng.choice(RAND_ALPHA)) for _ in range(n))
    d = diff(t, strip=True)
    if d:
        rbad.append(d)
print(f"random x{nrand}: {len(rbad)} diffs", flush=True)

for t, exp, got in (bad + rbad)[:12]:
    print("DIFF", [f"{ord(c):04x}" for c in t])
    print("  hb:", exp)
    print("  rx:", got)
print(f"TOTAL: {len(bad)} exhaustive + {len(rbad)} random diffs")
