"""UAX#14 line breaking — full default algorithm (Unicode 15.0).

Computes break opportunities for the layout wrapper.  The reference
renderer has no text layout at all (it maps codepoints 1:1 and draws a
single line, ``/root/reference/src/main.zig:53-58``); this module backs
the beyond-reference word-wrap machinery in ``fontrx/scene/layout.py``,
replacing the earlier UAX#14-lite ideograph/kinsoku subset with the
complete rule set LB2-LB31.

Classes come from ``fontrx/font/_uax14_data.py``, generated from the
system ICU's Line_Break property with LB1 already resolved
(AI/SG/XX -> AL, SA -> CM/AL by general category, CJ -> NS).  The
numbers rule LB25 is implemented in its regular-expression tailoring
(UAX#14 section 8.2 Example 7) — the form ICU's root rules implement —
so the engine is differential-tested for EXACT agreement with ICU's
``ubrk`` UAX#14 iterator (``tests/test_uax14.py``).  Known deliberate
gap, documented there: dictionary-based segmentation for SA scripts
(Thai/Lao/Khmer...) is out of scope; SA resolves per the UAX#14
default (CM/AL), while ICU consults word dictionaries.
"""

from __future__ import annotations

from bisect import bisect_right
from functools import lru_cache

from fontrx.font._uax14_data import (
    CLASSES,
    EXTPICT_CN,
    LB30_EAW_OPCP,
    LB_IDS,
    LB_STARTS,
)

_HARD = ("BK", "CR", "LF", "NL")
# LB9: classes that cannot carry a following CM/ZWJ
_NO_CM_BASE = frozenset(("BK", "CR", "LF", "NL", "SP", "ZW"))


@lru_cache(maxsize=8192)
def lb_class(cp: int) -> str:
    """LB1-resolved Line_Break class of a codepoint."""
    if cp < 0 or cp > 0x10FFFF:
        return "AL"
    return CLASSES[LB_IDS[bisect_right(LB_STARTS, cp) - 1]]


@lru_cache(maxsize=2048)
def _extpict_cn(cp: int) -> bool:
    for lo, hi in EXTPICT_CN:
        if lo <= cp <= hi:
            return True
        if cp < lo:
            return False
    return False


def break_opportunities(cps: list[int]) -> list[bool]:
    """``allowed[i]`` — the line may break BEFORE codepoint ``i``
    (``allowed[0]`` is always False; mandatory breaks report True).

    Negative codepoints (unmapped glyphs, e.g. ligatures) classify AL.
    """
    n = len(cps)
    if n == 0:
        return []
    cls = [lb_class(c) for c in cps]

    # LB9/LB10 effective-base structure: base_of[i] is the index of
    # the base character i attaches to (itself when i is a base);
    # eff[j] at base positions is the effective class (lone CM/ZWJ
    # bases resolve to AL per LB10).
    base_of = list(range(n))
    eff = list(cls)
    for i in range(n):
        if cls[i] in ("CM", "ZWJ"):
            if i == 0 or cls[i - 1] in _NO_CM_BASE:
                eff[i] = "AL"  # LB10
            else:
                base_of[i] = base_of[i - 1]

    # base sequence (indices into cps) and positions within it
    bases = [i for i in range(n) if base_of[i] == i]
    bpos = {i: k for k, i in enumerate(bases)}
    bcls = [eff[i] for i in bases]
    nb = len(bases)

    def back_skip_sp(k: int) -> str | None:
        """Effective class of the last non-SP base at-or-before base
        index k (None when the SP run reaches sot)."""
        while k >= 0 and bcls[k] == "SP":
            k -= 1
        return bcls[k] if k >= 0 else None

    # LB25 in ICU's tailored form (probed exhaustively against ubrk):
    # boundaries strictly inside a numeric sequence
    #   (PR|PO)? (OP|HY)? IS? NU (NU|SY|IS)* (CL|CP)? (PR|PO)?
    # never break, with spans matched OVERLAPPING from every start
    # ("7%8": the % is both span-1 tail and span-2 head, so neither
    # boundary breaks).  The IS? head covers ",7"; plain-LB25 pairs
    # that the regex does NOT imply (PR×OP, CL×PO, ...) verifiably
    # BREAK under ICU and are deliberately absent.
    in_span = [False] * nb  # True: no break before base k
    for s in range(nb):
        if bcls[s] == "NU" and s > 0 and bcls[s - 1] == "NU":
            continue  # contained in the span starting one earlier
        j = s
        if bcls[j] in ("PR", "PO"):
            j += 1
        if j < nb and bcls[j] in ("OP", "HY"):
            j += 1
        if j < nb and bcls[j] == "IS":
            j += 1
        if j < nb and bcls[j] == "NU":
            j += 1
            while j < nb and bcls[j] in ("NU", "SY", "IS"):
                j += 1
            if j < nb and bcls[j] in ("CL", "CP"):
                j += 1
            if j < nb and bcls[j] in ("PR", "PO"):
                j += 1
            for k in range(s + 1, j):
                in_span[k] = True

    def decide(i: int, allowed: list[bool]) -> bool:
        p = i - 1
        pc, qc = cls[p], cls[i]
        # LB4/LB5 mandatory breaks
        if pc == "BK":
            return True
        if pc == "CR" and qc == "LF":
            return False
        if pc in ("CR", "LF", "NL"):
            return True
        # LB6
        if qc in _HARD:
            return False
        # LB7
        if qc in ("SP", "ZW"):
            return False
        # LB8: ZW SP* ÷
        j = p
        while j >= 0 and cls[j] == "SP":
            j -= 1
        if j >= 0 and cls[j] == "ZW":
            return True
        # LB8a: ZWJ ×
        if pc == "ZWJ":
            return False
        # LB9: X (CM|ZWJ)* attaches — no break inside
        if qc in ("CM", "ZWJ") and pc not in _NO_CM_BASE:
            return False
        eB = eff[base_of[p]]
        eA = eff[i]
        kp = bpos[base_of[p]]   # base index of the left side
        kq = bpos[i]            # q is a base here
        # LB11
        if eA == "WJ" or eB == "WJ":
            return False
        # LB12
        if eB == "GL":
            return False
        # LB12a
        if eA == "GL" and eB not in ("SP", "BA", "HY"):
            return False
        # LB13 (Example-7 tailored: [^NU] × CL/CP/IS/SY, × EX).
        # ICU exception, probed: a space DOES break from an IS that
        # heads a number ("x ,7" breaks before the comma; "x ,a" does
        # not) — fall through to LB18 there.
        if eA == "EX":
            return False
        if eA in ("CL", "CP", "IS", "SY") and eB != "NU":
            if not (eA == "IS" and eB == "SP"
                    and kq + 1 < nb and bcls[kq + 1] == "NU"):
                return False
        # LB14: OP SP* ×
        if back_skip_sp(kp) == "OP":
            return False
        # LB15: QU SP* × OP
        if eA == "OP" and back_skip_sp(kp) == "QU":
            return False
        # LB16: (CL|CP) SP* × NS
        if eA == "NS" and back_skip_sp(kp) in ("CL", "CP"):
            return False
        # LB17: B2 SP* × B2
        if eA == "B2" and back_skip_sp(kp) == "B2":
            return False
        # LB18: SP ÷
        if eB == "SP":
            return True
        # LB19
        if eA == "QU" or eB == "QU":
            return False
        # LB20
        if eA == "CB" or eB == "CB":
            return True
        # ICU tailoring (ICU-20303, "rule 20.09"): a hyphen that
        # STARTS a chunk (sot, or right after a break opportunity —
        # e.g. after SP or ZW) does not break from a following
        # alphabetic ("-select"); verified against ubrk: AL only (HL
        # breaks), HY class + U+2010 only
        hb = base_of[p]
        if (eA == "AL" and (eB == "HY" or cps[hb] == 0x2010)
                and (hb == 0 or allowed[hb])):
            return False
        # LB21
        if eA in ("BA", "HY", "NS") or eB == "BB":
            return False
        # LB21a: HL (HY|BA) ×
        if eB in ("HY", "BA") and kp > 0 and bcls[kp - 1] == "HL":
            return False
        # LB21b
        if eB == "SY" and eA == "HL":
            return False
        # LB22
        if eA == "IN":
            return False
        # LB23
        if eB in ("AL", "HL") and eA == "NU":
            return False
        if eB == "NU" and eA in ("AL", "HL"):
            return False
        # LB23a
        if eB == "PR" and eA in ("ID", "EB", "EM"):
            return False
        if eB in ("ID", "EB", "EM") and eA == "PO":
            return False
        # LB24
        if eB in ("PR", "PO") and eA in ("AL", "HL"):
            return False
        if eB in ("AL", "HL") and eA in ("PR", "PO"):
            return False
        # LB25 (numeric regex spans, overlapping)
        if in_span[kq]:
            return False
        # LB26 (Korean syllable blocks)
        if eB == "JL" and eA in ("JL", "JV", "H2", "H3"):
            return False
        if eB in ("JV", "H2") and eA in ("JV", "JT"):
            return False
        if eB in ("JT", "H3") and eA == "JT":
            return False
        # LB27
        if eB in ("JL", "JV", "JT", "H2", "H3") and eA == "PO":
            return False
        if eB == "PR" and eA in ("JL", "JV", "JT", "H2", "H3"):
            return False
        # LB28
        if eB in ("AL", "HL") and eA in ("AL", "HL"):
            return False
        # LB29
        if eB == "IS" and eA in ("AL", "HL"):
            return False
        # LB30 (East_Asian_Width F/W/H excluded)
        if (eB in ("AL", "HL", "NU") and eA == "OP"
                and cps[i] not in LB30_EAW_OPCP):
            return False
        if (eB == "CP" and cps[base_of[p]] not in LB30_EAW_OPCP
                and eA in ("AL", "HL", "NU")):
            return False
        # LB30a: break between RI pairs only
        if eB == "RI" and eA == "RI":
            run = 0
            k = kp
            while k >= 0 and bcls[k] == "RI":
                run += 1
                k -= 1
            return run % 2 == 0
        # LB30b
        if eA == "EM" and (eB == "EB" or _extpict_cn(cps[base_of[p]])):
            return False
        # LB31
        return True

    allowed = [False] * n
    for i in range(1, n):
        allowed[i] = decide(i, allowed)
    return allowed


def break_positions(text: str) -> list[int]:
    """Character offsets where the next line may start (the ICU
    ``ubrk`` convention, minus ICU's always-reported end-of-text)."""
    cps = [ord(c) for c in text]
    allowed = break_opportunities(cps)
    return [i for i in range(1, len(cps)) if allowed[i]]
