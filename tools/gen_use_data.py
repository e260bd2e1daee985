"""Generate the Universal Shaping Engine category table from the
system ICU's Indic_Syllabic_Category / Indic_Positional_Category /
General_Category properties, per the USE specification's default
class assignments, and vendor it into fontrx/font/_use_data.py.

Covers the USE-routed script blocks fontrx ships differentials or
best-effort support for (Sinhala first — the reference shapers route
it to USE — plus the other southeast-asian / indic-adjacent blocks).
Dev-time tool.

Usage: PYTHONPATH=. python tools/gen_use_data.py
"""

import ctypes
import sys
import unicodedata

sys.path.insert(0, ".")

from fontrx.native.icu import symbol  # noqa: E402

_get = symbol("u_getIntPropertyValue")
_get.restype = ctypes.c_int32
_get.argtypes = [ctypes.c_int32, ctypes.c_int]

UCHAR_INDIC_POSITIONAL_CATEGORY = 0x1016
UCHAR_INDIC_SYLLABIC_CATEGORY = 0x1017

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
INPC = [
    "NA", "Bottom", "Bottom_And_Left", "Bottom_And_Right", "Left",
    "Left_And_Right", "Overstruck", "Right", "Top", "Top_And_Bottom",
    "Top_And_Bottom_And_Right", "Top_And_Left",
    "Top_And_Left_And_Right", "Top_And_Right", "Visual_Order_Left",
    "Top_And_Bottom_And_Left",
]

# blocks the table covers (USE-routed scripts fontrx cares about)
BLOCKS = [
    (0x0D80, 0x0E00),    # Sinhala
    (0x0F00, 0x1000),    # Tibetan
    (0x1A00, 0x1A20),    # Buginese
    (0x1A20, 0x1AB0),    # Tai Tham
    (0x1B00, 0x1B80),    # Balinese
    (0x1B80, 0x1BC0),    # Sundanese
    (0x1BC0, 0x1C00),    # Batak
    (0x1C00, 0x1C50),    # Lepcha
    (0xA980, 0xA9E0),    # Javanese
    (0xAA00, 0xAA60),    # Cham
    (0xA880, 0xA8E0),    # Saurashtra
    (0x1900, 0x1950),    # Limbu
    (0x111E0, 0x111E0),  # (placeholder end marker)
]


def _pos_suffix(inpc: str) -> str:
    """USE positional bucket of a dependent mark (the spec's
    pre/above/below/post split; multi-position marks bucket by their
    FIRST visual part, visual-order-left is pre)."""
    if inpc in ("Left", "Visual_Order_Left", "Top_And_Left",
                "Top_And_Left_And_Right", "Left_And_Right"):
        return "Pre" if inpc in ("Left", "Visual_Order_Left") else "Abv"
    if inpc in ("Top", "Top_And_Bottom", "Top_And_Bottom_And_Right",
                "Top_And_Right", "Overstruck",
                "Top_And_Bottom_And_Left"):
        return "Abv"
    if inpc in ("Bottom", "Bottom_And_Left", "Bottom_And_Right"):
        return "Blw"
    return "Pst"


def use_category(cp: int) -> str:
    insc = INSC[_get(cp, UCHAR_INDIC_SYLLABIC_CATEGORY)]
    inpc = INPC[_get(cp, UCHAR_INDIC_POSITIONAL_CATEGORY)]
    gc = unicodedata.category(chr(cp))

    if insc in ("Consonant",):
        return "B"
    if insc in ("Consonant_Head_Letter", "Tone_Letter",
                "Consonant_Initial_Postfixed"):
        return "B"
    if insc in ("Vowel_Independent", "Vowel"):
        return "B"
    if insc == "Consonant_With_Stacker":
        return "CS"
    if insc == "Consonant_Subjoined":
        return "SUB"
    if insc in ("Consonant_Preceding_Repha", "Consonant_Prefixed"):
        return "R"
    if insc in ("Virama", "Invisible_Stacker"):
        return "H"
    if insc == "Pure_Killer":
        return "V" + _pos_suffix(inpc)
    if insc == "Number_Joiner":
        return "HN"
    if insc == "Number":
        # digits act as BASES (hb-pinned: Javanese digit + vowel
        # sign is one cluster, no dotted circle)
        return "B"
    if insc == "Brahmi_Joining_Number":
        return "N"
    if insc == "Consonant_Placeholder":
        return "GB"
    if insc in ("Consonant_Dead", "Modifying_Letter"):
        return "IND"
    if insc == "Consonant_Medial":
        return "M" + _pos_suffix(inpc)
    if insc in ("Consonant_Final", "Consonant_Succeeding_Repha"):
        # final-consonant LETTERS act as bases (hb-pinned: a lone
        # Cham final takes no dotted circle); combining finals keep
        # their positional class
        if gc not in ("Mn", "Mc"):
            return "B"
        return "F" + _pos_suffix(inpc)
    if insc in ("Nukta", "Gemination_Mark", "Consonant_Killer"):
        return "CM" + ("Blw" if _pos_suffix(inpc) == "Blw" else "Abv")
    if insc == "Vowel_Dependent":
        return "V" + _pos_suffix(inpc)
    if insc in ("Bindu", "Visarga", "Tone_Mark",
                "Cantillation_Mark", "Register_Shifter"):
        return "VM" + _pos_suffix(inpc)
    if insc == "Syllable_Modifier":
        return "FM" + ("Blw" if _pos_suffix(inpc) == "Blw"
                       else "Pst" if inpc == "NA" else "Abv")
    if insc == "Avagraha":
        return "IND"
    if gc in ("Mn", "Mc") and inpc != "NA":
        return "VM" + _pos_suffix(inpc)
    if gc in ("Lo", "Lm"):
        return "B"
    if gc == "So":
        return "S"
    return "O"


entries = {}
for lo, hi in BLOCKS:
    for cp in range(lo, hi):
        cat = use_category(cp)
        if cat != "O":
            entries[cp] = cat

lines = [
    '"""Universal Shaping Engine categories, GENERATED from the',
    "system ICU's Indic_Syllabic/Positional_Category properties per",
    'the USE spec default assignments (tools/gen_use_data.py)."""',
    "",
    "USE_CATEGORIES = {",
]
for cp in sorted(entries):
    lines.append(f'    0x{cp:04X}: "{entries[cp]}",')
lines += ["}", "", "",
          "def use_category(cp: int) -> str:",
          '    """USE category of one codepoint ("O" when outside',
          '    every covered block)."""',
          '    return USE_CATEGORIES.get(cp, "O")']
with open("fontrx/font/_use_data.py", "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"wrote {len(entries)} entries")
