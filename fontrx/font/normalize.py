"""HarfBuzz-compatible mark ordering (modified combining classes).

Unicode canonical combining classes order some marks typographically
wrong: Hebrew's shin dot (ccc 24) sorts AFTER the vowels (ccc 10-20),
Arabic's shadda (ccc 33) after the vowels it visually wraps.  Every
real-world shaper reorders with HarfBuzz's "modified combining class"
permutation before applying OpenType lookups — fonts' GPOS anchors
are authored against THAT order (e.g. DejaVu anchors a vowel under
shin against the shin-dot's position, which only resolves when the
dot precedes the vowel in the stream).

The Hebrew and Arabic permutations below were extracted EMPIRICALLY
from the system HarfBuzz (pairwise mark shaping, pinned in
``tests/test_hb_differential.py``) and match hb's published
``_hb_modified_combining_class`` table; Thai/Lao sara-u (ccc 103/118
-> 3/118) follow the same public table (no test font covers them
here, documented).
"""

from __future__ import annotations

import unicodedata

# ccc -> modified ccc (identity where absent)
_MODIFIED = {
    # Hebrew (the SBL ordering: dots/dagesh/rafe/holam first, then
    # hataf vowels, full vowels, sheva/hiriq/qubuts, meteg last)
    24: 10,   # shin dot
    25: 11,   # sin dot
    21: 12,   # dagesh
    23: 13,   # rafe
    19: 14,   # holam
    11: 15,   # hataf segol
    12: 16,   # hataf patah
    13: 17,   # hataf qamats
    15: 18,   # tsere
    16: 19,   # segol
    17: 20,   # patah
    18: 21,   # qamats
    10: 22,   # sheva
    14: 23,   # hiriq
    20: 24,   # qubuts
    22: 25,   # meteg
    # Arabic: shadda precedes the vowels it wraps
    27: 27,   # fathatan
    28: 28,   # dammatan
    29: 29,   # kasratan
    33: 30,   # shadda
    30: 31,   # fatha
    31: 32,   # damma
    32: 33,   # kasra
    34: 34,   # sukun
    35: 35,   # superscript alef
    # Thai / Lao sara u below-vowels reorder before everything
    103: 3,
    118: 118,
    # Tibetan: sign i (130) and sign u (132) SWAP so u sorts first;
    # sign aa (129) stays ahead of both (probed against hb on the
    # Tibetan corpus font, tests/test_use.py)
    130: 132,
    132: 131,
}

# per-CODEPOINT overrides (hb special-cases these ahead of the ccc
# permutation; each probed empirically on the corpus fonts)
_CP_OVERRIDES = {
    0x0F39: 127,  # Tibetan tsa -phru sorts before the vowels
    0x0FC6: 254,  # Tibetan padma sorts after everything
    0x1A60: 254,  # Tai Tham sakot sorts after the tone marks
}


def modified_combining_class(cp: int) -> int:
    hit = _CP_OVERRIDES.get(cp)
    if hit is not None:
        return hit
    ccc = unicodedata.combining(chr(cp))
    return _MODIFIED.get(ccc, ccc)


def sort_marks(text: str) -> str:
    """Stable-sort every maximal combining run by MODIFIED combining
    class (the HarfBuzz normalization order).  Runs NFC first if the
    caller hasn't — this operates on whatever marks remain
    uncomposed."""
    n = len(text)
    if n < 2:
        return text
    out = []
    i = 0
    while i < n:
        if unicodedata.combining(text[i]) == 0:
            out.append(text[i])
            i += 1
            continue
        j = i
        while j < n and unicodedata.combining(text[j]) != 0:
            j += 1
        run = list(text[i:j])
        if j - i > 1:
            run.sort(key=lambda c: modified_combining_class(ord(c)))
        out.extend(run)
        i = j
    return "".join(out)
