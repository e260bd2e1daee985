"""Probe which dependent vowels are POST-matras (the reference
shapers' MPst category: a matra that may ride a syllable-modifier
directly, ``SM? MPst`` heading a matra group) and append the set to
fontrx/font/_indic_data.py.

Detection is differential: shape ``C SM m`` for every dependent vowel
``m`` of each Indic block against an in-memory probe font mapping the
whole block.  A plain matra splits off as a broken cluster (the
output gains a dotted circle); an MPst matra merges.  Dev-time tool
(needs fontTools + libharfbuzz).

Usage: PYTHONPATH=. python tools/gen_indic_mpst.py
"""

import ctypes
import sys

sys.path.insert(0, ".")

from gen_vowel_constraints import BLOCKS, build_probe_font, shape_flags  # noqa: E402

from fontrx.native.icu import symbol  # noqa: E402

_get = symbol("u_getIntPropertyValue")
_get.restype = ctypes.c_int32
_get.argtypes = [ctypes.c_int32, ctypes.c_int]
UCHAR_INDIC_SYLLABIC_CATEGORY = 0x1017
U_INSC_VOWEL_DEPENDENT = 34
U_INSC_BINDU = 2
U_INSC_CONSONANT = 5

mpst: list[int] = []
for block in BLOCKS:
    data = build_probe_font(block)
    cps = list(range(*block))
    cons = next(c for c in cps
                if _get(c, UCHAR_INDIC_SYLLABIC_CATEGORY)
                == U_INSC_CONSONANT)
    # the block's STANDARD anusvara (xx02) — the first Bindu in
    # several blocks is a rarer sign (e.g. U+0C80) with different
    # clustering, which confounds the probe
    bindu = block[0] + 0x02
    assert _get(bindu, UCHAR_INDIC_SYLLABIC_CATEGORY) == U_INSC_BINDU
    dc_gid = None
    for m in cps:
        if _get(m, UCHAR_INDIC_SYLLABIC_CATEGORY) != U_INSC_VOWEL_DEPENDENT:
            continue
        out = shape_flags(data, chr(cons) + chr(bindu) + chr(m), 0)
        ref = shape_flags(data, chr(cons) + chr(bindu), 0)
        # merged <=> no dotted-circle glyph added (output grew by 1)
        if len(out) == len(ref) + 1:
            mpst.append(m)

lines = [
    "",
    "# Dependent vowels the reference shapers categorize MPst (post",
    "# matra): may directly follow a syllable modifier inside one",
    "# cluster (matra_group = SM? MPst).  Recovered EXACTLY from the",
    "# system HarfBuzz by tools/gen_indic_mpst.py differential",
    "# probing.",
    "INDIC_MPST = frozenset({",
]
lines.append("    " + ", ".join(f"0x{m:04X}" for m in sorted(mpst)))
lines += ["})"]

path = "fontrx/font/_indic_data.py"
src = open(path).read()
marker = "\n\n# Dependent vowels the reference"
if marker in src:
    src = src[: src.index(marker)]
open(path, "w").write(src.rstrip("\n") + "\n" + "\n".join(lines) + "\n")
print(f"wrote {len(mpst)} MPst codepoints:",
      " ".join(hex(m) for m in sorted(mpst)))
