"""Full UAX#9 Unicode bidirectional algorithm.

Implements the complete rule set over one paragraph (in fontrx, one
line — the layout engine splits on newlines, which are rule-B
paragraph breaks anyway):

- P2/P3 paragraph level (skipping isolate runs);
- X1-X8 explicit embeddings/overrides (LRE/RLE/LRO/RLO/PDF),
  X5a-X5c/X6a isolates (LRI/RLI/FSI/PDI), X9 (formatting chars and
  their BN neighbours removed from resolution), X10 isolating run
  sequences with sos/eos types;
- W1-W7 weak types (NSM, EN/AN conversion, separators, terminators);
- N0 bracket pairs (BidiBrackets-derived table, canonical
  equivalence, stack-based pairing, embedding/opposite/context rules);
- N1/N2 neutrals, I1/I2 implicit levels;
- L1 trailing-whitespace/separator reset, L2 reordering (as a visual
  index order), L4 mirroring (mirrored chars at odd levels).

Bidi character classes come from the interpreter's UCD
(``unicodedata.bidirectional``, Unicode 15.0) with the
DerivedBidiClass @missing defaults for unassigned codepoints; bracket
and mirror pairs are the generated tables in ``_bidi_data`` (see
``tools/gen_bidi_data.py`` for the derivations).

The reference renderer has no text handling at all
(``/root/reference/src/main.zig:53-58`` maps codepoints 1:1), so this
module is a capability extension, replacing the round-2 bidi-lite
subset (``fontrx.font.bidi`` keeps the public helpers, now backed by
this implementation).
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass

from fontrx.font._bidi_data import (
    BRACKET_CANONICAL,
    BRACKET_PAIRS,
    DEFAULT_AL_RANGES,
    DEFAULT_ET_RANGES,
    DEFAULT_R_RANGES,
    MIRROR_PAIRS,
)

MAX_DEPTH = 125

def _canon_cp(cp: int) -> int:
    return BRACKET_CANONICAL.get(cp, cp)


_OPEN_SET = {_canon_cp(o) for o in BRACKET_PAIRS}
_CLOSE_TO_OPEN = {_canon_cp(c): _canon_cp(o)
                  for o, c in BRACKET_PAIRS.items()}

_ISOLATE_INITIATORS = ("LRI", "RLI", "FSI")
_EXPLICIT = ("LRE", "RLE", "LRO", "RLO", "PDF",
             "LRI", "RLI", "FSI", "PDI")
_REMOVED_BY_X9 = ("LRE", "RLE", "LRO", "RLO", "PDF", "BN")


def bidi_class(cp: int) -> str:
    """UAX#9 bidi class of one codepoint (UCD + @missing defaults)."""
    c = unicodedata.bidirectional(chr(cp))
    if c:
        return c
    # DerivedBidiClass @missing: noncharacters and unassigned
    # default-ignorables are BN (ICU-differential finding; these never
    # appear in interchange text but the class table should be right)
    if 0xFDD0 <= cp <= 0xFDEF or (cp & 0xFFFE) == 0xFFFE \
            or 0x2060 <= cp <= 0x206F or 0xE0000 <= cp <= 0xE0FFF \
            or 0xFFF0 <= cp <= 0xFFF8:
        return "BN"
    for lo, hi in DEFAULT_AL_RANGES:
        if lo <= cp <= hi:
            return "AL"
    for lo, hi in DEFAULT_R_RANGES:
        if lo <= cp <= hi:
            return "R"
    for lo, hi in DEFAULT_ET_RANGES:
        if lo <= cp <= hi:
            return "ET"
    return "L"


def mirror_cp(cp: int) -> int:
    """L4: the Bidi_Mirrored counterpart (identity when unpaired)."""
    return MIRROR_PAIRS.get(cp, cp)


def paragraph_level(cps: list[int], classes: list[str] | None = None,
                    auto_rtl_default: int = 0) -> int:
    """P2/P3: level of the first strong type, skipping isolate runs."""
    classes = classes or [bidi_class(cp) for cp in cps]
    depth = 0
    for c in classes:
        if depth == 0:
            if c == "L":
                return 0
            if c in ("R", "AL"):
                return 1
        if c in _ISOLATE_INITIATORS:
            depth += 1
        elif c == "PDI" and depth > 0:
            depth -= 1
    return auto_rtl_default


@dataclass
class BidiLine:
    """Resolution result for one line."""

    levels: list[int]        # per codepoint, after L1
    base_level: int
    classes: list[str]       # original classes (pre-W/N), for callers
    removed: list[bool]      # X9-removed formatting characters
    cps: list[int]

    def visual_order(self) -> list[int]:
        """L2: logical indices in left-to-right visual order
        (X9-removed characters excluded)."""
        idx = [i for i in range(len(self.levels)) if not self.removed[i]]
        if not idx:
            return []
        levels = [self.levels[i] for i in idx]
        hi = max(levels)
        lo_odd = min(lv | 1 for lv in levels)
        for lvl in range(hi, lo_odd - 1, -1):
            i = 0
            while i < len(idx):
                if levels[i] >= lvl:
                    j = i
                    while j < len(idx) and levels[j] >= lvl:
                        j += 1
                    idx[i:j] = idx[i:j][::-1]
                    levels[i:j] = levels[i:j][::-1]
                    i = j
                else:
                    i += 1
        return idx

    def mirrored(self, i: int) -> bool:
        """L4: render position ``i`` with its mirrored glyph?"""
        return (self.levels[i] % 2 == 1
                and unicodedata.mirrored(chr(self.cps[i])))


def _isolating_run_sequences(levels, classes, removed, matching_pdi,
                             base_level):
    """X10: level runs joined initiator->matching-PDI, with per-
    sequence sos/eos computed from adjacent levels."""
    n = len(levels)
    # level runs over non-removed positions
    pos = [i for i in range(n) if not removed[i]]
    runs = []  # list[list[int]]
    for i in pos:
        if runs and levels[runs[-1][-1]] == levels[i]:
            runs[-1].append(i)
        else:
            runs.append([i])
    # join runs: a run ending with an isolate initiator whose matching
    # PDI starts another run joins to it
    run_of_start = {r[0]: k for k, r in enumerate(runs)}
    used = [False] * len(runs)
    sequences = []
    for k, r in enumerate(runs):
        if used[k]:
            continue
        seq = list(r)
        used[k] = True
        while True:
            last = seq[-1]
            if classes[last] in _ISOLATE_INITIATORS:
                pdi = matching_pdi.get(last)
                if pdi is not None and pdi in run_of_start:
                    k2 = run_of_start[pdi]
                    if not used[k2]:
                        seq.extend(runs[k2])
                        used[k2] = True
                        continue
            break
        sequences.append(seq)

    out = []
    for seq in sequences:
        first, last = seq[0], seq[-1]
        lvl = levels[first]
        # sos: higher of this level and the preceding non-removed level
        p = first - 1
        while p >= 0 and removed[p]:
            p -= 1
        prev_lvl = levels[p] if p >= 0 else base_level
        sos = "R" if max(lvl, prev_lvl) % 2 else "L"
        # eos: when the sequence ends with an unmatched isolate
        # initiator, eos uses the paragraph level side (spec: the
        # position after the end is the end of the paragraph)
        q = last + 1
        while q < len(levels) and removed[q]:
            q += 1
        if classes[last] in _ISOLATE_INITIATORS and \
                matching_pdi.get(last) is None:
            nxt_lvl = base_level
        else:
            nxt_lvl = levels[q] if q < len(levels) else base_level
        eos = "R" if max(lvl, nxt_lvl) % 2 else "L"
        out.append((seq, sos, eos, lvl))
    return out


def _rule_w(types, seq, sos, eos, levels):
    """W1-W7 in place over one isolating run sequence."""
    # W1: NSM takes the type of the previous character (sos at start;
    # isolate initiators / PDI yield ON)
    prev = sos
    for i in seq:
        t = types[i]
        if t == "NSM":
            types[i] = ("ON" if prev in _ISOLATE_INITIATORS + ("PDI",)
                        else prev)
        prev = types[i]
    # W2: EN -> AN when the last strong type is AL
    strong = sos
    for i in seq:
        t = types[i]
        if t in ("L", "R", "AL"):
            strong = t
        elif t == "EN" and strong == "AL":
            types[i] = "AN"
    # W3: AL -> R
    for i in seq:
        if types[i] == "AL":
            types[i] = "R"
    # W4: single ES between EN pairs -> EN; single CS between a pair of
    # the same number type -> that type
    for k, i in enumerate(seq):
        t = types[i]
        if t not in ("ES", "CS"):
            continue
        before = types[seq[k - 1]] if k > 0 else sos
        after = types[seq[k + 1]] if k + 1 < len(seq) else eos
        if t == "ES" and before == "EN" and after == "EN":
            types[i] = "EN"
        elif t == "CS" and before == after and before in ("EN", "AN"):
            types[i] = before
    # W5: ET runs adjacent to EN -> EN
    k = 0
    while k < len(seq):
        if types[seq[k]] != "ET":
            k += 1
            continue
        j = k
        while j < len(seq) and types[seq[j]] == "ET":
            j += 1
        before = types[seq[k - 1]] if k > 0 else sos
        after = types[seq[j]] if j < len(seq) else eos
        if before == "EN" or after == "EN":
            for m in range(k, j):
                types[seq[m]] = "EN"
        k = j
    # W6: remaining ET/ES/CS -> ON
    for i in seq:
        if types[i] in ("ET", "ES", "CS"):
            types[i] = "ON"
    # W7: EN -> L when the last strong type is L
    strong = sos
    for i in seq:
        t = types[i]
        if t in ("L", "R"):
            strong = t
        elif t == "EN" and strong == "L":
            types[i] = "L"


def _rule_n0(cps, types, seq, sos, eos, lvl, orig_nsm):
    """N0: paired brackets.  Stack-based pairing (BD16), then direction
    assignment by embedding/opposite/context."""
    e_dir = "R" if lvl % 2 else "L"
    o_dir = "L" if lvl % 2 else "R"

    def canon(cp):
        return BRACKET_CANONICAL.get(cp, cp)

    # BD16: identify pairs among ON characters
    stack: list[tuple[int, int]] = []  # (canonical open cp, seq index)
    pairs: list[tuple[int, int]] = []
    for k, i in enumerate(seq):
        if types[i] != "ON":
            continue
        cp = cps[i]
        if canon(cp) in _OPEN_SET:
            if len(stack) >= 63:
                break  # BD16: stop identifying further pairs
            stack.append((canon(cp), k))
        else:
            co = _CLOSE_TO_OPEN.get(canon(cp))
            if co is not None:
                for d in range(len(stack) - 1, -1, -1):
                    if stack[d][0] == co:
                        pairs.append((stack[d][1], k))
                        del stack[d:]
                        break
    pairs.sort()

    def strong_of(t):
        if t in ("R", "EN", "AN"):
            return "R"
        if t == "L":
            return "L"
        return None

    for ko, kc in pairs:
        # strong types inside the pair
        inner = None
        for m in range(ko + 1, kc):
            s = strong_of(types[seq[m]])
            if s == e_dir:
                inner = e_dir
                break
            if s == o_dir:
                inner = inner or o_dir
        if inner == e_dir:
            new = e_dir
        elif inner == o_dir:
            # context: preceding strong type
            prev = sos
            for m in range(ko - 1, -1, -1):
                s = strong_of(types[seq[m]])
                if s:
                    prev = s
                    break
            new = o_dir if prev == o_dir else e_dir
        else:
            continue  # no strong inside: leave as neutral (N1/N2)
        types[seq[ko]] = new
        types[seq[kc]] = new
        # NSMs following a bracket that changed type take its type
        for kk in (ko, kc):
            for m in range(kk + 1, len(seq)):
                # original class check: NSM immediately following
                if orig_nsm[seq[m]]:
                    types[seq[m]] = new
                else:
                    break


def _rule_n1_n2(types, seq, sos, eos, lvl):
    e_dir = "R" if lvl % 2 else "L"

    def ni(t):
        return t in ("B", "S", "WS", "ON", "PDI",
                     "LRI", "RLI", "FSI")

    def strong(t):
        if t in ("R", "EN", "AN"):
            return "R"
        if t == "L":
            return "L"
        return None

    k = 0
    while k < len(seq):
        if not ni(types[seq[k]]):
            k += 1
            continue
        j = k
        while j < len(seq) and ni(types[seq[j]]):
            j += 1
        before = strong(types[seq[k - 1]]) if k > 0 else sos
        after = strong(types[seq[j]]) if j < len(seq) else eos
        fill = before if (before == after and before) else e_dir
        for m in range(k, j):
            types[seq[m]] = fill
        k = j


def resolve(cps: list[int], base_rtl: bool | None = None) -> BidiLine:
    """Run the full algorithm over one line.

    ``base_rtl``: None = auto-detect (P2/P3); True/False force the
    paragraph direction (HL1 higher-level override).
    """
    n = len(cps)
    classes = [bidi_class(cp) for cp in cps]
    if base_rtl is None:
        base = paragraph_level(cps, classes)
    else:
        base = 1 if base_rtl else 0

    # --- BD9: matching PDI for each isolate initiator
    matching_pdi: dict[int, int | None] = {}
    stack = []
    for i, c in enumerate(classes):
        if c in _ISOLATE_INITIATORS:
            stack.append(i)
        elif c == "PDI":
            if stack:
                matching_pdi[stack.pop()] = i
    for i in stack:
        matching_pdi[i] = None

    # --- X1-X8, X5a-c, X6a: explicit levels
    levels = [base] * n
    types = list(classes)
    removed = [False] * n
    # directional status stack entries: (level, override, isolate)
    dss = [(base, None, False)]
    overflow_isolates = 0
    overflow_embedding = 0
    valid_isolates = 0

    def next_odd(lv):
        return lv + 1 if lv % 2 == 0 else lv + 2

    def next_even(lv):
        return lv + 2 if lv % 2 == 0 else lv + 1

    for i, c in enumerate(classes):
        if c in ("RLE", "LRE", "RLO", "LRO"):
            # X2-X5
            removed[i] = True
            types[i] = "BN"
            levels[i] = dss[-1][0]
            new = (next_odd if c in ("RLE", "RLO") else next_even)(
                dss[-1][0])
            ov = {"RLO": "R", "LRO": "L"}.get(c)
            if new <= MAX_DEPTH and not overflow_isolates \
                    and not overflow_embedding:
                dss.append((new, ov, False))
            else:
                if not overflow_isolates:
                    overflow_embedding += 1
        elif c in _ISOLATE_INITIATORS:
            # X5a-X5c
            lvl, ov, _ = dss[-1]
            levels[i] = lvl
            if ov:
                types[i] = ov
            if c == "FSI":
                end = matching_pdi.get(i)
                sub = cps[i + 1:end if end is not None else n]
                c_eff = "RLI" if paragraph_level(sub) == 1 else "LRI"
            else:
                c_eff = c
            new = (next_odd if c_eff == "RLI" else next_even)(lvl)
            if new <= MAX_DEPTH and not overflow_isolates \
                    and not overflow_embedding:
                valid_isolates += 1
                dss.append((new, None, True))
            else:
                overflow_isolates += 1
        elif c == "PDI":
            # X6a
            if overflow_isolates:
                overflow_isolates -= 1
            elif valid_isolates:
                overflow_embedding = 0
                while not dss[-1][2]:
                    dss.pop()
                dss.pop()
                valid_isolates -= 1
            lvl, ov, _ = dss[-1]
            levels[i] = lvl
            if ov:
                types[i] = ov
        elif c == "PDF":
            # X7
            removed[i] = True
            types[i] = "BN"
            if overflow_isolates:
                pass
            elif overflow_embedding:
                overflow_embedding -= 1
            elif not dss[-1][2] and len(dss) > 1:
                dss.pop()
            levels[i] = dss[-1][0]
        elif c == "B":
            # X8 (paragraph separator — lines are pre-split, but be
            # robust): reset to base
            levels[i] = base
        elif c == "BN":
            removed[i] = True
            levels[i] = dss[-1][0]
        else:
            # X6
            lvl, ov, _ = dss[-1]
            levels[i] = lvl
            if ov:
                types[i] = ov

    # --- X10 + W + N + I per isolating run sequence
    orig_nsm = [c == "NSM" for c in classes]
    for seq, sos, eos, lvl in _isolating_run_sequences(
            levels, classes, removed, matching_pdi, base):
        _rule_w(types, seq, sos, eos, levels)
        _rule_n0(cps, types, seq, sos, eos, lvl, orig_nsm)
        _rule_n1_n2(types, seq, sos, eos, lvl)
        # I1/I2
        for i in seq:
            t = types[i]
            lv = levels[i]
            if lv % 2 == 0:
                if t == "R":
                    levels[i] = lv + 1
                elif t in ("AN", "EN"):
                    levels[i] = lv + 2
            else:
                if t in ("L", "AN", "EN"):
                    levels[i] = lv + 1

    # --- L1: B/S to base; whitespace/isolates before B/S and at line
    # end to base (using ORIGINAL classes)
    reset_types = ("WS", "LRI", "RLI", "FSI", "PDI")
    i = n - 1
    while i >= 0:
        c = classes[i]
        if c in ("B", "S"):
            levels[i] = base
            j = i - 1
            while j >= 0 and (classes[j] in reset_types or removed[j]):
                levels[j] = base
                j -= 1
            i = j
        else:
            i -= 1
    j = n - 1
    while j >= 0 and (classes[j] in reset_types or removed[j]):
        levels[j] = base
        j -= 1

    return BidiLine(levels=levels, base_level=base, classes=classes,
                    removed=removed, cps=cps)
