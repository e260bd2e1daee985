"""Indic complex-script shaping (OpenType Indic model, Devanagari
first) — syllable analysis, reordering and staged feature
application.

A capability extension far beyond the reference (which maps
codepoints 1:1 with no text processing, ``src/main.zig:53-58``).
This implements the OpenType Indic shaping model the way modern
shapers do:

1. **classify** each codepoint into shaping categories (consonant,
   Ra, vowel, nukta, halant, matra with side, syllable modifier, ...)
   from the vendored ICU-generated table (``_indic_data.py``);
2. **syllabify** with the Indic syllable machine (consonant/vowel/
   standalone/symbol/broken clusters — the same grammar the
   reference shapers run);
3. **initial reordering** per syllable: base-consonant search (last
   suitable consonant, skipping below-base/post-base forms the FONT
   declares via would-substitute probes of ``blwf``/``pstf``/
   ``pref``), reph identification (``Ra + halant`` at syllable start
   when the font's ``rphf`` would form it), pre-base matra
   classification, position-stable sort;
4. **basic features** applied per syllable in the canonical order
   (``nukt akhn rphf rkrf pref blwf abvf half pstf vatu cjct``), each
   in its own stage, mask-gated per position (pre-base gets ``half``,
   post-base gets ``blwf/abvf/pstf``, only the reph pair gets
   ``rphf``), matching never crossing syllable boundaries;
5. **final reordering**: pre-base matras move against the formed
   half-block, reph repositions per the script's reph-position class
   (Devanagari: before post-base forms, stopping at syllable
   modifiers);
6. **presentation features** (``init pres abvs blws psts haln``)
   applied globally in one stage.

Validated by an exact HarfBuzz differential (glyph streams + pen
positions) over a feaLib-compiled Devanagari corpus font — see
``tests/test_indic.py``.

Scope notes (documented): GSUB lookup types 1/2/3/4 and contextual
5/6 participate in the staged application; broken clusters shape
WITHOUT dotted-circle insertion (fontrx renders them bare); the
per-script configuration table currently carries Devanagari (the
blocks the vendored data covers) — other Indic scripts follow the
same machine and land with their own config rows + differentials.
"""

from __future__ import annotations

import re
import unicodedata

from fontrx.font._indic_data import indic_class
from fontrx.utils.log import get_logger

log = get_logger("Indic")

# -- positions (reorder slots; relative order is the contract) ---------
POS_START = 0
POS_RA_TO_BECOME_REPH = 1
POS_PRE_M = 2
POS_PRE_C = 3
POS_BASE_C = 4
POS_AFTER_MAIN = 5
POS_ABOVE_C = 6
POS_BEFORE_SUB = 7
POS_BELOW_C = 8
POS_AFTER_SUB = 9
POS_BEFORE_POST = 10
POS_POST_C = 11
POS_AFTER_POST = 12
POS_SMVD = 13

# reph target classes
REPH_AFTER_MAIN = 0
REPH_BEFORE_SUB = 1
REPH_AFTER_SUB = 2
REPH_BEFORE_POST = 3
REPH_AFTER_POST = 4

# per-script configuration: (script tags newest-first, Ra codepoints,
# reph position, matra side -> position map)
_DEVA_MATRA = {"L": POS_PRE_M, "T": POS_AFTER_SUB, "B": POS_AFTER_SUB,
               "R": POS_AFTER_SUB}
_CONFIGS = {
    "deva": ((b"dev2", b"deva"), frozenset({0x0930}), REPH_BEFORE_POST,
             _DEVA_MATRA),
}

_BASIC_FEATURES = (b"nukt", b"akhn", b"rphf", b"rkrf", b"pref",
                   b"blwf", b"abvf", b"half", b"pstf", b"vatu",
                   b"cjct")
_GLOBAL_BASIC = frozenset({b"nukt", b"akhn", b"rkrf", b"vatu",
                           b"cjct"})
_PRES_FEATURES = (b"init", b"pres", b"abvs", b"blws", b"psts",
                  b"haln")

# -- syllable machine ---------------------------------------------------
# category letters: C consonant (non-Ra), r Ra, V independent vowel,
# N nukta, H halant, M matra, D syllable modifier, A cantillation,
# Y symbol, P placeholder, J ZWJ, z ZWNJ, E consonant medial,
# R register shifter, X other
_z = "[Jz]"
_n = f"(?:(?:{_z}?R)?(?:NR?){{0,2}})"
_cn = f"[Cr]J?{_n}"
_matra_group = f"(?:{_z}{{0,3}}MN?(?:H|JHJ[Cr])?)"
_syllable_tail = f"(?:{_z}?DD?z?)?A{{0,3}}"
_halant_group = f"(?:{_z}?H(?:JN?)?)"
_final_halant_group = f"(?:{_halant_group}|Hz)"
_halant_or_matra_group = (
    f"(?:{_final_halant_group}|{_matra_group}*)"
)
_complex_tail = (f"(?:{_halant_group}{_cn})*E?"
                 f"{_halant_or_matra_group}{_syllable_tail}")
_PRODUCTIONS = (
    ("consonant", re.compile(f"{_cn}{_complex_tail}")),
    ("vowel", re.compile(f"(?:rH)?V{_n}(?:J|{_complex_tail})")),
    ("standalone", re.compile(f"(?:rH)?P{_n}{_complex_tail}")),
    ("symbol", re.compile(f"YN?{_syllable_tail}")),
    ("broken", re.compile(f"(?:rH)?{_n}{_complex_tail}")),
)


def _syllabify(cats: str) -> list[tuple[int, int, str]]:
    """Split a category string into maximal syllables (longest match
    per start, production priority on ties); unmatched characters
    become single-char ``other`` clusters."""
    out: list[tuple[int, int, str]] = []
    i, n = 0, len(cats)
    while i < n:
        best_len, best_kind = 0, "other"
        for kind, rx in _PRODUCTIONS:
            m = rx.match(cats, i)
            if m and m.end() - i > best_len:
                best_len, best_kind = m.end() - i, kind
        if best_len == 0:
            out.append((i, i + 1, "other"))
            i += 1
        else:
            out.append((i, i + best_len, best_kind))
            i += best_len
    return out


class _Glyph:
    """One buffer slot: glyph id + shaping aux carried through GSUB."""

    __slots__ = ("gid", "cp", "cat", "pos", "mask", "syl", "ligated")

    def __init__(self, gid, cp, cat, pos, syl):
        self.gid = gid
        self.cp = cp
        self.cat = cat
        self.pos = pos
        self.mask: frozenset = frozenset()
        self.syl = syl
        self.ligated = False


def _is_consonant(g: _Glyph) -> bool:
    return g.cat in ("C", "r", "E", "V", "P")


def _is_joiner(g: _Glyph) -> bool:
    return g.cat in ("J", "z")


def _is_halant(g: _Glyph) -> bool:
    return g.cat == "H"


class IndicShaper:
    """Per-font Indic shaping engine (currently Devanagari)."""

    ALL_TAGS = _BASIC_FEATURES + _PRES_FEATURES + (b"locl", b"ccmp")

    def __init__(self, font):
        self.font = font
        self.shaper = font.shaper(self.ALL_TAGS)
        self._would_cache: dict = {}
        self._conspos_cache: dict = {}
        cfg = _CONFIGS["deva"]
        self.script_tags, self.ra_chars, self.reph_pos, self.matra_map \
            = cfg
        self.script = None
        if self.shaper is not None:
            for t in self.script_tags:
                if t in getattr(self.shaper, "scripts", {}):
                    self.script = t
                    break

    @property
    def available(self) -> bool:
        if self.shaper is None:
            return False
        return any(self._feature_lookups(t) for t in _BASIC_FEATURES)

    # -- feature -> lookup indices (script-routed) ----------------------

    def _feature_lookups(self, tag: bytes) -> list[int]:
        s = self.shaper
        if s is None:
            return []
        if self.script is not None:
            return s.lookup_indices_for((tag,), self.script)
        return sorted(s.features.get(tag, ()))

    # -- would-substitute probes (consonant position classification) ----

    def _would_substitute(self, tag: bytes, seq: tuple[int, ...]) -> bool:
        key = (tag, seq)
        hit = self._would_cache.get(key)
        if hit is not None:
            return hit
        ok = False
        for li in self._feature_lookups(tag):
            lk = self.shaper._lookup(li)
            if lk is None:
                continue
            for s_type, sub in lk.subtables:
                if s_type == 4:
                    for lig in sub.ligs_for(seq[0]):
                        if lig.components == tuple(seq[1:]):
                            ok = True
                            break
                elif s_type == 1 and len(seq) == 1:
                    if sub.sub_for(seq[0]) is not None:
                        ok = True
                if ok:
                    break
            if ok:
                break
        self._would_cache[key] = ok
        return ok

    def _consonant_position(self, gid: int, halant_gid: int) -> int:
        """POS_BELOW_C / POS_POST_C / POS_BASE_C for one consonant, by
        probing whether the font's blwf/pstf/pref would substitute
        (halant, C) — both orders, the robustness rule reference
        shapers apply for old-spec-copied lookups."""
        key = gid
        hit = self._conspos_cache.get(key)
        if hit is not None:
            return hit
        pos = POS_BASE_C
        for tag, p in ((b"blwf", POS_BELOW_C), (b"pstf", POS_POST_C),
                       (b"pref", POS_POST_C)):
            if (self._would_substitute(tag, (halant_gid, gid))
                    or self._would_substitute(tag, (gid, halant_gid))):
                pos = p
                break
        self._conspos_cache[key] = pos
        return pos

    # -- classification --------------------------------------------------

    def _classify(self, cps: list[int], gids: list[int]) -> list[_Glyph]:
        halant_gid = int(self.font.charmap.glyph_index(0x094D))
        out = []
        for cp, gid in zip(cps, gids):
            cat, side = indic_class(cp)
            if cat == "C" and cp in self.ra_chars:
                cat = "r"
            if cat == "M":
                pos = self.matra_map.get(side, POS_AFTER_SUB)
            elif cat in ("SM", "A"):
                pos = POS_SMVD
            else:
                pos = POS_BASE_C
            if cat in ("C", "r") and halant_gid:
                cpos = self._consonant_position(gid, halant_gid)
                if cpos != POS_BASE_C:
                    pos = cpos
            cat = {"SM": "D", "S": "Y", "RS": "R", "CM": "E"}.get(
                cat, cat)
            out.append(_Glyph(gid, cp, cat, pos, 0))
        return out

    # -- initial reordering ----------------------------------------------

    def _initial_reorder(self, buf: list[_Glyph], start: int, end: int,
                         kind: str, word_initial: bool) -> None:
        if kind in ("symbol", "other"):
            return
        info = buf

        # 1. find base
        has_reph = False
        base = end
        limit = start
        if (self._feature_lookups(b"rphf") and start + 3 <= end
                and info[start].cat == "r" and _is_halant(info[start + 1])
                and not _is_joiner(info[start + 2])
                and self._would_substitute(
                    b"rphf", (info[start].gid, info[start + 1].gid))):
            limit += 2
            while limit < end and _is_joiner(info[limit]):
                limit += 1
            base = start
            has_reph = True

        i = end
        seen_below = False
        while i > limit:
            i -= 1
            if _is_consonant(info[i]):
                if (info[i].pos != POS_BELOW_C
                        and (info[i].pos != POS_POST_C or seen_below)):
                    base = i
                    break
                if info[i].pos == POS_BELOW_C:
                    seen_below = True
                base = i
            else:
                # halant+ZWJ requests an explicit half form: stop
                if (start < i and info[i].cat == "J"
                        and info[i - 1].cat == "H"):
                    break

        if has_reph and base == start and limit - base <= 2:
            # no other consonant: Ra stays the base, no reph
            has_reph = False

        # positions
        for k in range(start, base):
            info[k].pos = min(POS_PRE_C, info[k].pos)
        if base < end:
            info[base].pos = POS_BASE_C

        # final consonants (post-matra, Khmer-style)
        for k in range(base + 1, end):
            if info[k].cat == "M":
                for j in range(k + 1, end):
                    if _is_consonant(info[j]):
                        info[j].pos = POS_AFTER_MAIN
                        break
                break

        if has_reph:
            info[start].pos = POS_RA_TO_BECOME_REPH

        # attach misc marks (halant/nukta/joiners ride their neighbor)
        last_pos = POS_START
        for k in range(start, end):
            g = info[k]
            if g.cat in ("J", "z", "N", "R", "E", "H"):
                g.pos = last_pos
                if g.cat == "H" and g.pos == POS_PRE_M:
                    # halant after a left matra doesn't move with it
                    for j in range(k, start, -1):
                        if info[j - 1].pos != POS_PRE_M:
                            g.pos = info[j - 1].pos
                            break
            elif g.pos != POS_SMVD:
                last_pos = g.pos

        # things between a consonant/matra and the next consonant move
        # with that consonant
        last = base
        for k in range(base + 1, end):
            if _is_consonant(info[k]):
                for j in range(last + 1, k):
                    if info[j].pos < POS_SMVD:
                        info[j].pos = info[k].pos
                last = k
            elif info[k].cat == "M":
                last = k

        # stable sort by position
        info[start:end] = sorted(info[start:end], key=lambda g: g.pos)

        # consecutive pre-base matra GROUPS (matra + its attached
        # nukta/joiners) emit in REVERSED group order — the
        # reference-shaper behavior, established empirically and
        # pinned by the hb differential from several angles:
        # KA+093F+094E -> 094E 093F KA, KA+I+I+NUKTA -> I N I KA,
        # and it composes unchanged with the final-reorder move into
        # halant blocks (KA+H+TA+I+PE -> KA H PE I TA)
        r0 = start
        while r0 < end and info[r0].pos != POS_PRE_M:
            r0 += 1
        r1 = r0
        while r1 < end and info[r1].pos == POS_PRE_M:
            r1 += 1
        if r1 - r0 > 1:
            groups: list[list[_Glyph]] = []
            for g in info[r0:r1]:
                if g.cat == "M" or not groups:
                    groups.append([g])
                else:
                    groups[-1].append(g)
            if len(groups) > 1:
                info[r0:r1] = [g for grp in reversed(groups)
                               for g in grp]

        # re-find base
        base = end
        for k in range(start, end):
            if info[k].pos == POS_BASE_C:
                base = k
                break

        # masks
        masks: list[set] = [set() for _ in range(start, end)]
        k = start
        while k < end and info[k].pos == POS_RA_TO_BECOME_REPH:
            masks[k - start].add(b"rphf")
            k += 1
        pre = {b"half", b"blwf"}  # Devanagari: blwf pre AND post base
        for k in range(start, min(base, end)):
            masks[k - start] |= pre
        post = {b"blwf", b"abvf", b"pstf"}
        for k in range(base + 1, end):
            masks[k - start] |= post

        # ZWNJ disables half forms on the preceding consonant group
        for k in range(start + 1, end):
            if _is_joiner(info[k]):
                non_joiner = info[k].cat == "z"
                j = k
                while j > start:
                    j -= 1
                    if non_joiner:
                        masks[j - start].discard(b"half")
                    if _is_consonant(info[j]):
                        break

        # init: left matra at word start
        if (self._feature_lookups(b"init") and word_initial
                and info[start].pos == POS_PRE_M):
            masks[0].add(b"init")

        for k in range(start, end):
            info[k].mask = frozenset(masks[k - start])

    # -- masked GSUB application -----------------------------------------

    def _apply_feature(self, buf: list[_Glyph], tag: bytes,
                       global_: bool) -> None:
        s = self.shaper
        for li in self._feature_lookups(tag):
            lk = s._lookup(li)
            if lk is None:
                continue
            i = 0
            while i < len(buf):
                g = buf[i]
                if s.gdef is not None and s.gdef.skips(
                        g.gid, lk.flags, lk.mark_filter_set):
                    i += 1
                    continue
                if not global_ and tag not in g.mask:
                    i += 1
                    continue
                nxt = self._apply_at(buf, i, lk, tag, global_, 0)
                i = nxt if nxt is not None else i + 1

    def _match_forward(self, buf, i, items, lk, tag, global_,
                       class_def=None):
        """Match ``items`` at successive non-skipped positions after
        ``i`` — same syllable, mask-gated.  Returns positions or
        None."""
        s = self.shaper
        out = []
        j = i
        syl = buf[i].syl
        for item in items:
            j += 1
            while j < len(buf) and s.gdef is not None and s.gdef.skips(
                    buf[j].gid, lk.flags, lk.mark_filter_set):
                j += 1
            if j >= len(buf) or buf[j].syl != syl:
                return None
            if not global_ and tag not in buf[j].mask:
                return None
            if not s._item_matches(buf[j].gid, item, class_def):
                return None
            out.append(j)
        return out

    def _apply_at(self, buf: list[_Glyph], i: int, lk, tag: bytes,
                  global_: bool, depth: int) -> int | None:
        if depth > 6:
            return None
        gid = buf[i].gid
        for s_type, sub in lk.subtables:
            if s_type == 1:
                new = sub.sub_for(gid)
                if new is not None:
                    buf[i].gid = new
                    return i + 1
            elif s_type == 2:
                seq = sub.seq_for(gid)
                if seq is not None:
                    head = buf[i]
                    repl = []
                    for q, ng in enumerate(seq):
                        g = _Glyph(ng, head.cp, head.cat, head.pos,
                                   head.syl)
                        g.mask = head.mask
                        repl.append(g)
                    buf[i:i + 1] = repl
                    return i + len(seq) if seq else i
            elif s_type == 3:
                new = sub.sub_for(gid, getattr(self.shaper,
                                               "alt_index", 0))
                if new is not None:
                    buf[i].gid = new
                    return i + 1
            elif s_type == 4:
                for lig in sub.ligs_for(gid):
                    pos = self._match_forward(buf, i, lig.components,
                                              lk, tag, global_)
                    if pos is None:
                        continue
                    buf[i].gid = lig.glyph
                    buf[i].ligated = True
                    for p in reversed(pos):
                        del buf[p]
                    return i + 1
            elif s_type in (5, 6):
                nxt = self._apply_context(buf, i, lk, sub, tag,
                                          global_, depth)
                if nxt is not None:
                    return nxt
        return None

    def _apply_context(self, buf, i, lk, sub, tag, global_, depth):
        s = self.shaper
        rules, bt_cd, in_cd, la_cd = s._context_rules(sub, buf[i].gid)
        for rule in rules:
            items = rule.input_[1:] if sub.fmt == 3 else rule.input_
            pos = self._match_forward(buf, i, items, lk, tag, global_,
                                      in_cd)
            if pos is None:
                continue
            all_pos = [i] + pos
            if rule.lookahead:
                # lookahead/backtrack context is NOT mask-gated
                ids = [g.gid for g in buf]
                if s._match_forward(ids, all_pos[-1], rule.lookahead,
                                    lk, la_cd) is None:
                    continue
            if rule.backtrack:
                ids = [g.gid for g in buf]
                if not s._match_backward(ids, i, rule.backtrack, lk,
                                         bt_cd):
                    continue
            end = all_pos[-1] + 1
            for seq_idx, lk_idx in rule.records:
                if not (0 <= seq_idx < len(all_pos)):
                    continue
                nested = s._lookup(lk_idx)
                if nested is None:
                    continue
                p = all_pos[seq_idx]
                before = len(buf)
                self._apply_at(buf, p, nested, tag, True, depth + 1)
                delta = len(buf) - before
                if delta:
                    for k in range(len(all_pos)):
                        if all_pos[k] > p:
                            all_pos[k] += delta
                    end += delta
            return max(end, i + 1)
        return None

    # -- final reordering --------------------------------------------------

    def _final_reorder(self, buf: list[_Glyph], start: int, end: int,
                       kind: str) -> None:
        if kind in ("symbol", "other") or end - start == 0:
            return
        info = buf

        # find base
        base = start
        while base < end and info[base].pos < POS_BASE_C:
            base += 1
        if base == end and start < base and info[base - 1].cat == "J":
            base -= 1
        if base < end:
            while start < base and info[base].cat in ("N", "H"):
                base -= 1

        # o Reorder pre-base matras against the formed half block
        if start + 1 < end and start < base:
            new_pos = base - 1 if base < end else base - 2
            while (new_pos > start
                   and info[new_pos].cat not in ("M", "H")):
                new_pos -= 1
            if (_is_halant(info[new_pos])
                    and info[new_pos].pos != POS_PRE_M):
                if new_pos + 1 < end and _is_joiner(info[new_pos + 1]):
                    new_pos += 1
            else:
                new_pos = start  # no move

            if start < new_pos and info[new_pos].pos != POS_PRE_M:
                for k in range(new_pos, start, -1):
                    if info[k - 1].pos == POS_PRE_M:
                        old_pos = k - 1
                        if old_pos < base and base <= new_pos:
                            base -= 1
                        tmp = info[old_pos]
                        info[old_pos:new_pos] = info[old_pos + 1:
                                                     new_pos + 1]
                        info[new_pos] = tmp
                        new_pos -= 1

        # o Reorder reph
        if (start + 1 < end
                and info[start].pos == POS_RA_TO_BECOME_REPH
                and info[start].ligated):
            new_reph = None
            if self.reph_pos != REPH_AFTER_POST:
                # step 2: after the first explicit pre-base halant
                p = start + 1
                while p < base and not _is_halant(info[p]):
                    p += 1
                if p < base and _is_halant(info[p]):
                    if p + 1 < base and _is_joiner(info[p + 1]):
                        p += 1
                    new_reph = p
                if new_reph is None and self.reph_pos == REPH_AFTER_MAIN:
                    p = base
                    while (p + 1 < end
                           and info[p + 1].pos <= POS_AFTER_MAIN):
                        p += 1
                    if p < end:
                        new_reph = p
                if (new_reph is None
                        and self.reph_pos == REPH_AFTER_SUB):
                    p = base
                    while (p + 1 < end and info[p + 1].pos not in (
                            POS_POST_C, POS_AFTER_POST, POS_SMVD)):
                        p += 1
                    new_reph = p
            if new_reph is None:
                # step 5 (and the AFTER_POST entry): before the first
                # post-base thing that sorts after the reph slot — a
                # post-base consonant form or syllable modifier — and
                # never past a SYLLABLE-FINAL explicit halant (with
                # its attached nukta): hb-pinned, RA+H+SA+AA+H puts
                # reph between the matra and the final halant, and
                # RA+H+SA+AA+H+ANUSVARA keeps it there (modifiers
                # trail), while a halant buried among later matra
                # groups is skipped.  Residual documented divergence:
                # clusters with THREE-plus dependent vowels AND a
                # final halant (doubly-invalid text) place reph near
                # the middle matra in hb; fontrx stops at the halant.
                stop = end
                q = end - 1
                while q > base and info[q].pos == POS_SMVD:
                    q -= 1
                if (q > base and _is_halant(info[q])
                        and info[q].pos > POS_BASE_C):
                    # base-attached halants (pos BASE_C) are passed
                    # over — reph lands after them and the haln form
                    # still ligates (hb-pinned: RA+H+KA+H -> KA.haln
                    # REPH, vs RA+H+SA+AA+H -> SA AA REPH H)
                    if q - 1 > base and info[q - 1].cat == "N":
                        q -= 1
                    stop = q
                p = base
                while p + 1 < min(end, stop):
                    if info[p + 1].pos in (POS_POST_C, POS_AFTER_POST,
                                           POS_SMVD):
                        break
                    p += 1
                new_reph = p
            reph = info[start]
            info[start:new_reph] = info[start + 1:new_reph + 1]
            info[new_reph] = reph

    # -- entry point --------------------------------------------------------

    def shape(self, cps: list[int], gids: list[int]) -> list[int]:
        """Shape one logical run (substitution stage): returns the
        substituted + reordered glyph-id stream."""
        # canonical mark reordering (the normalizer step reference
        # shapers run before shaping): stable-sort each nonzero-ccc
        # run by combining class, so e.g. halant+nukta presents as
        # nukta+halant to the syllable machine
        cps, gids = _canonical_reorder(cps, gids)

        # vowel constraints: a dotted circle goes between an
        # independent vowel and a following sign when the pair would
        # be visually deceptive (Unicode defective combinations; the
        # vendored table is hb-probe-exact).  Inserted unconditionally
        # — an unmapped U+25CC degrades to .notdef, like the
        # reference shapers
        from fontrx.font._indic_data import DEVA_VOWEL_CONSTRAINTS

        if any(cp in DEVA_VOWEL_CONSTRAINTS for cp in cps):
            dc = int(self.font.charmap.glyph_index(0x25CC))
            nc: list[int] = []
            ng: list[int] = []
            for k, (cp, gid) in enumerate(zip(cps, gids)):
                nc.append(cp)
                ng.append(gid)
                if (k + 1 < len(cps)
                        and cps[k + 1] in DEVA_VOWEL_CONSTRAINTS.get(
                            cp, ())):
                    nc.append(0x25CC)
                    ng.append(dc)
            cps, gids = nc, ng

        buf = self._classify(cps, gids)
        cats = "".join(g.cat for g in buf)
        syllables = _syllabify(cats)

        # dotted-circle insertion for broken clusters (matra/halant
        # runs with no base), when the font can draw one — the
        # reference-shaper behavior; the circle acts as the cluster's
        # placeholder base
        dc_gid = int(self.font.charmap.glyph_index(0x25CC))
        if dc_gid and any(k == "broken" for _, _, k in syllables):
            nb: list[_Glyph] = []
            ns: list[tuple[int, int, str]] = []
            for s_, e_, kind in syllables:
                at = len(nb)
                if kind == "broken":
                    cat, _side = indic_class(0x25CC)
                    nb.append(_Glyph(dc_gid, 0x25CC, cat, POS_BASE_C,
                                     0))
                nb.extend(buf[s_:e_])
                ns.append((at, len(nb),
                           "standalone" if kind == "broken" else kind))
            buf, syllables = nb, ns
        for si, (s_, e_, kind) in enumerate(syllables):
            for k in range(s_, e_):
                buf[k].syl = si
            word_initial = s_ == 0 or unicodedata.category(
                chr(buf[s_ - 1].cp))[0] not in ("L", "M")
            self._initial_reorder(buf, s_, e_, kind, word_initial)

        for tag in _BASIC_FEATURES:
            self._apply_feature(buf, tag, tag in _GLOBAL_BASIC)

        # syllable boundaries survived (per-syllable matching), so
        # recompute each syllable's extent for final reordering
        kinds = {si: kind for si, (s_, e_, kind) in enumerate(syllables)}
        i = 0
        while i < len(buf):
            j = i
            while j < len(buf) and buf[j].syl == buf[i].syl:
                j += 1
            self._final_reorder(buf, i, j, kinds.get(buf[i].syl,
                                                     "other"))
            i = j

        for tag in _PRES_FEATURES:
            self._apply_feature(buf, tag, tag != b"init")

        return [g.gid for g in buf]


def _canonical_reorder(
    cps: list[int], gids: list[int]
) -> tuple[list[int], list[int]]:
    """Canonical ordering of combining marks (stable exchange of
    adjacent pairs with ccc(a) > ccc(b) > 0) by the MODIFIED
    combining classes reference shapers use
    (:mod:`fontrx.font.normalize`), applied to the parallel
    codepoint/glyph streams."""
    from fontrx.font.normalize import modified_combining_class

    ccc = [modified_combining_class(cp) for cp in cps]
    if not any(c > 1 for c in ccc):
        return cps, gids
    cps, gids = list(cps), list(gids)
    n = len(cps)
    changed = True
    while changed:
        changed = False
        for i in range(n - 1):
            if ccc[i] > ccc[i + 1] > 0:
                cps[i], cps[i + 1] = cps[i + 1], cps[i]
                gids[i], gids[i + 1] = gids[i + 1], gids[i]
                ccc[i], ccc[i + 1] = ccc[i + 1], ccc[i]
                changed = True
    return cps, gids


def is_devanagari(cp: int) -> bool:
    return 0x0900 <= cp <= 0x097F or 0xA8E0 <= cp <= 0xA8FF
