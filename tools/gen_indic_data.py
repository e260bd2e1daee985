"""Regenerate fontrx/font/_indic_data.py from the system ICU's
Indic_Syllabic_Category / Indic_Positional_Category properties (the
UCD IndicSyllabicCategory.txt / IndicPositionalCategory.txt data,
which this environment doesn't ship as files).  Dev-time tool; the
vendored table is what the Indic shaper consumes at runtime.

The emitted table stores, per codepoint of the covered blocks, the
SHAPING category and position class the OpenType Indic shaping model
uses (the same INSC/INPC -> shaping-class mapping HarfBuzz's
generated table applies), so fontrx's syllable machine and
reordering agree with the reference shaper on every codepoint:

- categories: C consonant, R Ra (script-specific, flagged at runtime),
  V independent vowel, N nukta, H virama/halant, M dependent matra,
  SM syllable modifier (bindu/visarga/...), A cantillation,
  S symbol (avagraha/om), P consonant placeholder (incl. digits),
  q preceding repha (Malayalam dot reph), CM consonant medial/final,
  RS register shifter, J ZWJ, z ZWNJ, X other;
- positions for matras: L left (pre-base), T top, B bottom, R right
  (raw INPC sides; the shaper maps them to reorder slots per script).
"""

import ctypes

from fontrx.native.icu import symbol

get = symbol("u_getIntPropertyValue")
get.restype = ctypes.c_int32
get.argtypes = [ctypes.c_int32, ctypes.c_int]

UCHAR_INDIC_POSITIONAL_CATEGORY = 0x1016
UCHAR_INDIC_SYLLABIC_CATEGORY = 0x1017

# UIndicSyllabicCategory enum (uchar.h order, alphabetical)
INSC = [
    "Other", "Avagraha", "Bindu", "Brahmi_Joining_Number",
    "Cantillation_Mark", "Consonant", "Consonant_Dead",
    "Consonant_Final", "Consonant_Head_Letter",
    "Consonant_Initial_Postfixed", "Consonant_Killer",
    "Consonant_Medial", "Consonant_Placeholder",
    "Consonant_Preceding_Repha", "Consonant_Prefixed",
    "Consonant_Subjoined", "Consonant_Succeeding_Repha",
    "Consonant_With_Stacker", "Gemination_Mark", "Invisible_Stacker",
    "Joiner", "Modifying_Letter", "Non_Joiner", "Nukta", "Number",
    "Number_Joiner", "Pure_Killer", "Register_Shifter",
    "Syllable_Modifier", "Tone_Letter", "Tone_Mark", "Virama",
    "Visarga", "Vowel", "Vowel_Dependent", "Vowel_Independent",
]
# UIndicPositionalCategory enum
INPC = [
    "NA", "Bottom", "Bottom_And_Left", "Bottom_And_Right", "Left",
    "Left_And_Right", "Overstruck", "Right", "Top", "Top_And_Bottom",
    "Top_And_Bottom_And_Right", "Top_And_Left", "Top_And_Left_And_Right",
    "Top_And_Right", "Visual_Order_Left", "Top_And_Bottom_And_Left",
]

# INSC -> shaping category (the HarfBuzz gen-indic-table mapping for
# the categories that occur in the covered blocks)
CAT_MAP = {
    "Other": "X", "Avagraha": "S", "Bindu": "SM",
    "Cantillation_Mark": "A", "Consonant": "C", "Consonant_Dead": "C",
    "Consonant_Final": "CM", "Consonant_Medial": "CM",
    "Consonant_Placeholder": "P", "Consonant_Subjoined": "C",
    "Consonant_Preceding_Repha": "q",
    "Consonant_With_Stacker": "C", "Gemination_Mark": "SM",
    "Invisible_Stacker": "H", "Joiner": "J", "Modifying_Letter": "X",
    "Non_Joiner": "z", "Nukta": "N", "Number": "P",
    "Pure_Killer": "M", "Register_Shifter": "RS",
    "Syllable_Modifier": "SM", "Tone_Letter": "X", "Tone_Mark": "SM",
    "Virama": "H", "Visarga": "SM", "Vowel": "V",
    "Vowel_Dependent": "M", "Vowel_Independent": "V",
}
# INPC -> matra side (first/primary side, the component that matters
# for reordering; split matras are decomposed upstream)
POS_MAP = {
    "NA": "", "Bottom": "B", "Bottom_And_Left": "B",
    "Bottom_And_Right": "B", "Left": "L", "Left_And_Right": "L",
    "Overstruck": "T", "Right": "R", "Top": "T", "Top_And_Bottom": "B",
    "Top_And_Bottom_And_Right": "B", "Top_And_Left": "T",
    "Top_And_Left_And_Right": "T", "Top_And_Right": "R",
    "Visual_Order_Left": "L", "Top_And_Bottom_And_Left": "B",
}

# All ten Indic shaping-model blocks (Devanagari..Sinhala), the
# Devanagari Extended / Vedic Extensions blocks, and the joiners
SWEEP = (list(range(0x0900, 0x0E00))        # Deva..Sinhala contiguous
         + list(range(0xA8E0, 0xA900))       # Devanagari Extended
         + list(range(0x1CD0, 0x1D00))       # Vedic Extensions
         + [0x200C, 0x200D, 0x25CC])

entries = {}
for cp in SWEEP:
    insc = INSC[get(cp, UCHAR_INDIC_SYLLABIC_CATEGORY)]
    inpc = INPC[get(cp, UCHAR_INDIC_POSITIONAL_CATEGORY)]
    cat = CAT_MAP.get(insc, "X")
    side = POS_MAP.get(inpc, "")
    if cat == "X" and not side:
        continue
    entries[cp] = (cat, side)

lines = [
    '"""Indic shaping classes (OpenType Indic model), GENERATED from',
    "the system ICU's Indic_Syllabic_Category / Indic_Positional_",
    "Category properties (tools/gen_indic_data.py regenerates).",
    '',
    'Each entry: codepoint -> (category, matra side).  Categories per',
    'the module docstring of the generator; side is L/T/B/R for',
    'dependent matras (and empty otherwise)."""',
    '',
    'INDIC_CLASSES = {',
]
for cp in sorted(entries):
    cat, side = entries[cp]
    lines.append(f'    0x{cp:04X}: ("{cat}", "{side}"),')
lines += ['}', '', '',
          'def indic_class(cp: int) -> tuple[str, str]:',
          '    """(category, matra side) of one codepoint; ("X", "")',
          '    when outside every covered block."""',
          '    return INDIC_CLASSES.get(cp, ("X", ""))']
with open("fontrx/font/_indic_data.py", "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"wrote {len(entries)} entries")
