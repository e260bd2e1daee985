"""The Universal Shaping Engine (USE) — the reference shapers' model
for the long tail of complex scripts (Sinhala first: hb routes it
here, with clustering that differs from the classic Indic model —
spaces act as generic bases, conjoints ride explicit joiners).

Pipeline (hb-pinned by ``tests/test_use.py``):

1. categories from the ICU-generated USE table (``_use_data.py``);
2. syllabification with the USE cluster grammar (standard /
   virama-terminated / numeral / symbol / broken clusters);
3. reph and pre-base-form RECORDING: ``rphf`` applied masked to each
   cluster's first letters and ``pref`` globally — glyphs they
   substitute re-categorize to R / VPre, steering the reorder;
4. the other early features (``locl nukt akhn``) and the basic set
   (``rkrf abvf blwf half pstf vatu cjct``), all per-syllable;
5. dotted-circle insertion for broken clusters, then the USE
   reorder: a leading repha moves before the first post-base glyph,
   pre-base vowels move to the cluster start (or after the nearest
   preceding halant);
6. the final features (``abvs blws haln pres psts``).

Shares the masked lookup application with the Indic engine.
"""

from __future__ import annotations

import re

from fontrx.font._use_data import use_category
from fontrx.font.indic import IndicShaper, _Glyph
from fontrx.utils.log import get_logger

log = get_logger("USE")

#: OT script tags layout routes to this engine, with their Unicode
#: blocks — the twelve scripts the ICU-generated category table
#: (`tools/gen_use_data.py`) covers.  hb's shaper selection routes
#: all of these to USE.
USE_SCRIPTS: dict[bytes, tuple[tuple[int, int], ...]] = {
    b"sinh": ((0x0D80, 0x0DFF),),
    b"tibt": ((0x0F00, 0x0FFF),),
    b"limb": ((0x1900, 0x194F),),
    b"bugi": ((0x1A00, 0x1A1F),),
    b"lana": ((0x1A20, 0x1AAF),),
    b"bali": ((0x1B00, 0x1B7F),),
    b"sund": ((0x1B80, 0x1BBF), (0x1CC0, 0x1CCF)),
    b"batk": ((0x1BC0, 0x1BFF),),
    b"lepc": ((0x1C00, 0x1C4F),),
    b"saur": ((0xA880, 0xA8DF),),
    b"java": ((0xA980, 0xA9DF),),
    b"cham": ((0xAA00, 0xAA5F),),
}


def is_use_cp(cp: int) -> bool:
    """True for codepoints in any USE-routed script block."""
    for ranges in USE_SCRIPTS.values():
        for lo, hi in ranges:
            if lo <= cp <= hi:
                return True
    return False


_EARLY_FEATURES = (b"locl", b"nukt", b"akhn")
_BASIC_FEATURES = (b"rkrf", b"abvf", b"blwf", b"half", b"pstf",
                   b"vatu", b"cjct")
_FINAL_FEATURES = (b"abvs", b"blws", b"haln", b"pres", b"psts")

#: category -> machine letter
_LETTER = {
    "B": "B", "GB": "G", "CS": "c", "SUB": "U", "R": "R", "H": "H",
    "HN": "n", "N": "N", "IND": "I", "S": "s",
    "VPre": "p", "VAbv": "a", "VBlw": "b", "VPst": "d",
    "VMPre": "P", "VMAbv": "Q", "VMBlw": "W", "VMPst": "E",
    "CMAbv": "x", "CMBlw": "y",
    "FAbv": "f", "FBlw": "g", "FPst": "h",
    "FMAbv": "u", "FMBlw": "i", "FMPst": "o",
    "MPre": "j", "MAbv": "k", "MBlw": "l", "MPst": "m",
    "O": "O",
}

_OVERRIDES = {
    0x0020: "G", 0x00A0: "G", 0x25CC: "G",
    0x200C: "z", 0x200D: "J",
    # the Sinhala al-lakuna is a halant that ALSO rides vowel groups
    # (hb's halant-or-vowel-modifier class; hb-pinned: Sinhala
    # vowel+al-lakuna is one cluster, Javanese vowel+pangkon is two)
    0x0DCA: "K",
    # the Javanese pengkal is a POST medial (hb-pinned:
    # cakra+pengkal is one cluster, pengkal+pengkal splits)
    0xA9BE: "m",
    # Cham AA is a vowel MODIFIER (hb-pinned: VBlw+AA merges as
    # vowel+modifier, AA+vowel splits)
    0xAA29: "Q",
    # Cham medials form a strict once-each chain ra < la < wa < ya
    # (hb pair-matrix, round 4): wa takes its own slot between la
    # (MBlw) and ya (MPst)
    0xAA36: "L",
    # Cham AA4E/AA4F (fixture-mapped) act as full bases: marks
    # attach, the pre-base vowel fronts over them (hb-probed)
    0xAA4E: "B",
    0xAA4F: "B",
    # Javanese pada/rerenggan punctuation hosts marks, and pre-base
    # vowels front over it like any generic base (hb-probed:
    # A9C1..A9CD + VM/vowel attach dc-less; A9C1+taling reorders)
    **{cp: "G" for cp in range(0xA9C1, 0xA9CE)},
    # Balinese pada punctuation hosts marks dc-less (hb-probed), and
    # the fixture-mapped 1B4D..1B4F behave as full bases: marks
    # attach, pre-base vowels front, adeg-adeg conjuncts form off
    # them (hb-probed: 1B4D+adeg-adeg+KA -> one cluster with ka.blw)
    **{cp: "G" for cp in range(0x1B5A, 0x1B61)},
    0x1B4D: "B",
    0x1B4E: "B",
    0x1B4F: "B",
    # Tibetan overrides, every rule hb-probe-pinned on the corpus
    # font: the a-chung (vowel aa) is a consonant modifier (it rides
    # BEFORE subjoined letters in a stack: KA+AA+subjoined-KA is one
    # cluster), the tsheg is a generic base (vowel after tsheg takes
    # no dotted circle), vowel u occupies its own slot before the
    # above vowels (u+i joins, halanta+u splits), and the halanta
    # rides the above-vowel slot (halanta+i joins, halanta+u and
    # halanta+subjoined split)
    0x0F71: "y",
    0x0F0B: "G",
    0x0F74: "t",
    0x0F84: "A",
    # ...and the tsa -phru is a consonant modifier that doubles at
    # the cluster-INITIAL slot but is singular after a subjoined
    # continuation (hb-pinned: KA+tsa-phru+tsa-phru is one cluster,
    # subjoined-KA+tsa-phru+tsa-phru dc-splits the second)
    0x0F39: "X",
    # Tibetan head marks, astrological signs, shads and paired
    # punctuation all HOST marks (hb-probed: sign+vowel takes no
    # dotted circle for every one of these); rnam bcad (0F7F) and
    # paluta (0F85) also stand alone dc-less
    **{cp: "G" for cp in (
        list(range(0x0F00, 0x0F18)) + list(range(0x0F1A, 0x0F20))
        + [0x0F34, 0x0F36, 0x0F38] + list(range(0x0F3A, 0x0F3E))
        + [0x0F7F, 0x0F85])},
    # yar tshes / mar tshes ride as POST/PRE vowels (hb-pinned:
    # 0F3F reorders before its base)
    0x0F3E: "d",
    0x0F3F: "p",
    # the digit-attaching astrological signs (ccc 220) land after
    # the vowels and before VPst/VMs — the below-vowel slot
    0x0F18: "b",
    0x0F19: "b",
    # the undecomposable composite vowels ride the u-vowel slot
    # (hb-pinned: they chain, follow a-chung, precede above vowels,
    # and never follow one)
    0x0F77: "t",
    0x0F79: "t",
    # Tai Tham: the sakot is a stacker that ALSO trails a finished
    # cluster (modified ccc 254 sorts it last; hb-pinned:
    # vowel+sakot and tone+sakot join, sakot+tone splits), and the
    # cryptogrammic dot is a VMBlw (rides before final signs)
    0x1A60: "w",
    0x1A7F: "W",
    # the mai sams CHAIN and mix freely with the vowel-modifier
    # group in either order (one [QM]* slot, hb-probed), and low pa
    # is an above-medial (joins only directly after the base,
    # single)
    0x1A7B: "M",
    0x1A7C: "M",
    0x1A5A: "k",
    # Sundanese: the avagraha is a full BASE (hosts marks, takes the
    # ZWNJ dotted circle); panyecek/panglayar/pangwisad are FINAL
    # consonant signs ordered panyecek < pangwisad < panglayar
    # (hb-pinned); the invisible virama is a TERMINAL stacker — it
    # conjoins a following consonant but nothing may trail it, not
    # even the marks a bare Javanese pangkon accepts
    0x1BBA: "B",
    0x1B80: "f",
    0x1B82: "g",
    0x1B81: "h",
    0x1BAB: "q",
    # ...and the supplement's bindu punctuation hosts marks
    **{cp: "G" for cp in range(0x1CC0, 0x1CC8)},
    # Buginese: vowel sign U rides the SAME slot as the above vowels
    # (hb-pinned: u+i, u+ae join in either order; o+u splits) and
    # the pallawa punctuation hosts marks
    0x1A18: "a",
    0x1A1E: "G",
    0x1A1F: "G",
    # Batak: pangolat/panongonan are vowel KILLERS — repeatable
    # halants that a full vowel group may TRAIL (hb-pinned:
    # killer+vowel and killer+killer join, vowel+killer dc-splits,
    # killer+vowel+killer splits at the second killer — unlike the
    # single-shot Javanese pangkon / Sinhala al-lakuna), and the
    # vowel signs ride the vowel-MODIFIER slots (above before post);
    # the symbols/punctuation host marks
    0x1BF2: "e",
    0x1BF3: "e",
    **{cp: "Q" for cp in (0x1BE8, 0x1BE9, 0x1BED, 0x1BEF)},
    **{cp: "E" for cp in (0x1BE7, 0x1BEA, 0x1BEB, 0x1BEC, 0x1BEE)},
    **{cp: "G" for cp in range(0x1BFC, 0x1C00)},
    # Lepcha: vowel sign OO renders LEFT of the base (hb-pinned: it
    # fronts in the reorder); the ta-rol punctuation hosts marks
    0x1C29: "p",
    **{cp: "G" for cp in range(0x1C3B, 0x1C40)},
    # Saurashtra dandas host marks
    0xA8CE: "G",
    0xA8CF: "G",
    # Limbu: the kemphreng (SA-I) is a vowel MODIFIER — it follows
    # every vowel incl. VPst and precedes the small-letter finals
    # (hb-pinned: u+kemphreng joins, kemphreng+vowel splits,
    # mukphreng+kemphreng splits); loo and the punctuation host
    # marks
    0x193A: "Q",
    0x1940: "G",
    0x1944: "G",
    0x1945: "G",
}

_POST_BASE = frozenset("fghklmabdQWEtA")  # post-base letters (reorder)


def _letter(cp: int) -> str:
    hit = _OVERRIDES.get(cp)
    if hit is not None:
        return hit
    if 0xFE00 <= cp <= 0xFE0F:
        return "v"
    return _LETTER.get(use_category(cp), "O")


# -- the USE cluster grammar --------------------------------------------
# a ZWJ may ride the stacker inside conjunct continuations
# (hb-pinned: KA+H+ZWJ+SA is one cluster, the akhn forms)
# consonant-modifier runs stay together (hb-pinned: base+double
# cecak-telu is one cluster).  Residual documented divergence: a
# modifier run followed by a bare halant regroups differently in hb
# (degenerate text)
#
# Joiner transparency (hb-pinned on every USE corpus font): a joiner
# run carrying at most ONE ZWNJ is transparent between a cluster and
# its continuing marks — base+ZWNJ+vowel/CM/SUB/final all join with
# no dotted circle (the joiner stays put, fronting moves past it, and
# GSUB still sees it, so ligatures stay blocked); a run with two
# ZWNJs is not (base+ZWNJ+ZWNJ+vowel dc-splits).  This holds in
# BROKEN clusters too (dc+mark+ZWNJ+mark is one cluster).
# possessive stars: a joiner run parses ONE way (maximal munch), so
# long runs cannot trigger quadratic backtracking across the nested
# starred slots below.  Equivalent language: every _j slot is followed
# by a class that matches neither J nor z, so the original lazy splits
# could never help a match succeed.
_j = "(?:J*+z?J*+)"
_cm = (f"(?:(?:{_j}[Xx])*(?:{_j}y)*"
       f"(?:(?:{_j}[HKqe]J?B|{_j}U)v?"
       f"(?:{_j}X)?(?:{_j}x)*(?:{_j}y)*)*)")
_med = f"(?:{_j}j)?(?:{_j}k)?(?:{_j}l)?(?:{_j}L)?(?:{_j}m)?"
# halant first: longest-match over ordered alternation — and a BARE
# halant terminates its cluster (no modifiers chain onto it).
# Joiners outside these slots never cluster: they separate like
# "other" characters and hide at render time.  The
# halant-or-vowel-modifier (K) may trail a vowel group
# Tibetan slots: t (vowel u) before the above vowels, A
# (halanta) interleaving them — both hb-probe-pinned
_vm = f"(?:{_j}P)*(?:{_j}[QM])*(?:{_j}W)*(?:{_j}E)*"
_vowels_plain = (f"(?:{_j}p)*(?:{_j}t)*(?:{_j}[Aa])*(?:{_j}b)*"
                 f"(?:{_j}d)*(?:{_j}K)?{_vm}")
_finals = f"(?:{_j}f)*(?:{_j}g)*(?:{_j}h)*"
_fm = f"(?:(?:{_j}u)*(?:{_j}i)*|(?:{_j}o)?)"
_start = "(?:[Rc]?[BG]v?)"
# the Tai Tham sakot stack (w J? B) appears at most ONCE per
# cluster — either before the vowel group or terminally after it
# (hb-pinned: base+sakot+base+vowel and base+vowel+sakot+base both
# join; a second sakot stack starts a new cluster); a bare trailing
# sakot terminates, and finals may follow a terminal stack
_stack = f"{_j}wJ?Bv?(?:{_j}X)?(?:{_j}x)*(?:{_j}y)*"
# a bare halant accepts trailing VMs and finals (hb-pinned:
# Javanese pangkon+layar joins) but the TERMINAL stacker (q)
# accepts nothing
_plain_end = (f"{_vowels_plain}(?:{_j}w(?:J?B(?:{_finals}{_fm})?w?)?"
              f"|{_finals}{_fm})")
# NB: the joiner slot rides each BRANCH head (never a bare {_j}
# prefix before the alternation — composed with the branch-internal
# slots that would admit a two-ZWNJ run, which hb dc-splits)
_tail = (f"(?:{_cm}{_stack}{_cm}{_med}{_vowels_plain}"
         f"(?:{_j}w|{_finals}{_fm})"
         f"|{_cm}{_med}"
         f"(?:{_j}q|{_j}e(?:{_j}e)*{_vm}{_finals}{_fm}"
         # a trailing ZWJ rides a halant-terminated cluster
         # (hb-pinned: Sinhala ra+al-lakuna+ZWJ forms the bare reph)
         f"|{_j}[HK]J?{_vm}{_finals}{_fm}|{_plain_end}))")
_num_tail = "(?:nNv?)"
_sym_tail = "(?:u+i*|i+)"
_PRODUCTIONS = (
    ("standard", re.compile(f"{_start}{_tail}")),
    ("virama", re.compile(f"{_start}{_cm}{_j}[HKwq]J?")),
    ("numeral", re.compile(f"Nv?{_num_tail}*n?")),
    ("symbol", re.compile(f"[sG]v?{_sym_tail}?")),
    ("broken", re.compile(f"R?(?:{_tail}|{_num_tail}+|{_sym_tail})")),

)


def _syllabify(cats: str) -> list[tuple[int, int, str]]:
    out: list[tuple[int, int, str]] = []
    i, n = 0, len(cats)
    while i < n:
        best_len, best_kind = 0, "other"
        for kind, rx in _PRODUCTIONS:
            m = rx.match(cats, i)
            if m and m.end() - i > best_len:
                best_len, best_kind = m.end() - i, kind
        if best_len and all(c in "zJ" for c in cats[i:i + best_len]):
            # a bare joiner run is never a cluster of its own — the
            # joiner slots only admit them BETWEEN real constituents
            best_len = 0
        if best_len == 0:
            out.append((i, i + 1, "other"))
            i += 1
        else:
            out.append((i, i + best_len, best_kind))
            i += best_len
    return out


class UseShaper:
    """Per-font Universal Shaping Engine."""

    ALL_TAGS = (_EARLY_FEATURES + (b"rphf", b"pref")
                + _BASIC_FEATURES + _FINAL_FEATURES + (b"ccmp",))

    _apply_feature = IndicShaper._apply_feature
    _match_forward = IndicShaper._match_forward
    _apply_at = IndicShaper._apply_at
    _apply_context = IndicShaper._apply_context
    _decompose = IndicShaper._decompose

    def __init__(self, font, script: bytes = b"sinh"):
        self.font = font
        self.shaper = font.shaper(self.ALL_TAGS)
        self._lookup_cache: dict = {}
        self.script = None
        if self.shaper is not None:
            if script in getattr(self.shaper, "scripts", {}):
                self.script = script

    @property
    def available(self) -> bool:
        # the USE pipeline applies to any font of a USE script:
        # clustering, dotted circles and reordering are
        # font-independent; features no-op when absent
        return True

    def _feature_lookups(self, tag: bytes, st=None) -> list[int]:
        s = self.shaper
        if s is None:
            return []
        hit = self._lookup_cache.get(tag)
        if hit is not None:
            return hit
        if self.script is not None:
            out = s.lookup_indices_for((tag,), self.script)
        else:
            out = sorted(s.features.get(tag, ()))
        self._lookup_cache[tag] = out
        return out

    def shape(self, cps: list[int], gids: list[int],
              script: bytes = b"sinh") -> list[int]:
        """Shape one logical run: substituted + reordered glyphs."""
        from fontrx.font._indic_data import INDIC_VOWEL_CONSTRAINTS
        from fontrx.font.indic import _canonical_reorder

        # USE normalization, matched to libharfbuzz over a ~35-case
        # probe matrix (round 4, Balinese two-part vowels both ways):
        # every decomposable character DECOMPOSES (font permitting),
        # marks canonically reorder, and then RECOMPOSITION of
        # adjacent (non-mark starter, mark) pairs the font maps runs
        # ONLY when the original run carries a mark at index >= 1
        # (hb's all_simple short circuit: its decompose loop scans for
        # a mark AFTER the first character — a run of bare letters
        # (U+1B06 alone, KA+U+1B06) or a single run-INITIAL mark
        # (suku+U+1B06) stays decomposed, while the same vowel after
        # any non-initial mark (KA+suku+U+1B06, suku+bisah+...) or a
        # decomposed input pair (AKARA+TEDUNG) comes out composed).
        # Mark-led pairs (split matras) never recompose.
        import unicodedata

        def _is_mark(cp):
            return unicodedata.category(chr(cp)).startswith("M")

        has_pair = any(_is_mark(cp) for cp in cps[1:])
        cm = self.font.charmap
        nc: list[int] = []
        ng: list[int] = []
        for cp, gid in zip(cps, gids):
            d = unicodedata.decomposition(chr(cp))
            if d and not d.startswith("<"):
                parts = [ord(c) for c in
                         unicodedata.normalize("NFD", chr(cp))]
                pgids = [int(cm.glyph_index(p)) for p in parts]
                if all(pgids):
                    nc.extend(parts)
                    ng.extend(pgids)
                    continue
            nc.append(cp)
            ng.append(gid)
        cps, gids = nc, ng
        cps, gids = _canonical_reorder(cps, gids)
        if has_pair and len(cps) > 1:
            nc, ng = [cps[0]], [gids[0]]
            for cp, gid in zip(cps[1:], gids[1:]):
                if _is_mark(cp) and not _is_mark(nc[-1]):
                    comp = unicodedata.normalize(
                        "NFC", chr(nc[-1]) + chr(cp))
                    if len(comp) == 1 and ord(comp) != nc[-1]:
                        cgid = int(cm.glyph_index(ord(comp)))
                        if cgid:
                            nc[-1] = ord(comp)
                            ng[-1] = cgid
                            continue
                nc.append(cp)
                ng.append(gid)
            cps, gids = nc, ng
        # vowel constraints (defective combinations) apply to the
        # USE-routed Indic scripts too — the probed table covers all
        # ten blocks incl. Sinhala
        if any(cp in INDIC_VOWEL_CONSTRAINTS for cp in cps):
            dc = int(self.font.charmap.glyph_index(0x25CC))
            nc: list[int] = []
            ng: list[int] = []
            for k, (cp, gid) in enumerate(zip(cps, gids)):
                nc.append(cp)
                ng.append(gid)
                if (k + 1 < len(cps)
                        and cps[k + 1] in INDIC_VOWEL_CONSTRAINTS.get(
                            cp, ())):
                    nc.append(0x25CC)
                    ng.append(dc)
            cps, gids = nc, ng
        buf = [_Glyph(g, c, _letter(c), 0, 0)
               for c, g in zip(cps, gids)]
        # Dangling-joiner dotted circles (round 4, re-derived from a
        # 29-case hb probe matrix — kills the multi-adjacent-joiner
        # residual).  Within a run that carries at least one STRONG
        # character (hb picks its DFLT shaper for common-only runs —
        # bare joiner/space strings never dc):
        #   - ZWJs never take a dotted circle;
        #   - per maximal joiner run, the FIRST ZWNJ is absorbed by a
        #     preceding real cluster (letters, spaces and generic
        #     bases all absorb exactly one);
        #   - the LAST ZWNJ may instead lead a following MARK-led
        #     (broken) cluster — its dotted circle then comes from
        #     that cluster, after the joiner (hb: ZWNJ+vowel ->
        #     zwnj dc vowel, but ZWNJ+base -> dc zwnj base);
        #   - every other ZWNJ becomes its own dc-carrying cluster
        #     (hb: base+ZWNJ+ZWNJ -> base zwnj dc zwnj).
        # Rnam bcad (0F7F) keeps its probed exception: a generic base
        # a dangling ZWNJ neither leads nor dc's before.
        dc_gid0 = int(self.font.charmap.glyph_index(0x25CC))
        if dc_gid0 and any(g.cat == "z" for g in buf):
            def _strong(g):
                # gc=Cn chars carry script Unknown: they never make
                # hb pick a real shaper, so a run of only them (plus
                # joiners/spaces) rides DFLT — no dotted circles
                return (g.cat not in ("z", "J", "O")
                        and not (g.cat == "G"
                                 and g.cp in (0x20, 0xA0, 0x25CC))
                        and unicodedata.category(chr(g.cp)) != "Cn")

            base_led = ("B", "N", "s")

            def _absorber(g):
                return g.cat not in ("z", "J", "O")

            if any(_strong(g) for g in buf):
                k = 0
                while k < len(buf):
                    if buf[k].cat not in ("z", "J"):
                        k += 1
                        continue
                    # maximal joiner run [k, e)
                    e = k
                    while e < len(buf) and buf[e].cat in ("z", "J"):
                        e += 1
                    zs = [i for i in range(k, e)
                          if buf[i].cat == "z"]
                    first_absorbed = (bool(zs) and k > 0
                                      and _absorber(buf[k - 1]))
                    nxt = buf[e] if e < len(buf) else None
                    last_leads = (
                        bool(zs) and nxt is not None
                        and nxt.cat not in ("O",) and not (
                            nxt.cat == "G"
                            or nxt.cat in base_led)
                    ) or (
                        bool(zs) and nxt is not None
                        and nxt.cat == "G"
                        and nxt.cp == 0x25CC
                    )
                    inserted = 0
                    for idx, i in enumerate(zs):
                        if idx == 0 and first_absorbed:
                            continue
                        if (i == zs[-1] and last_leads
                                and not (idx == 0 and first_absorbed)):
                            continue
                        if (i == zs[-1] and nxt is not None
                                and nxt.cat == "G"
                                and nxt.cp == 0x0F7F):
                            continue
                        buf.insert(i + inserted,
                                   _Glyph(dc_gid0, 0x25CC, "G", 0, 0))
                        inserted += 1
                    k = e + inserted
        cats = "".join(g.cat for g in buf)
        syllables = _syllabify(cats)
        for si, (s_, e_, kind) in enumerate(syllables):
            for k in range(s_, e_):
                buf[k].syl = si

        # reph masking: the first letters of every cluster carry the
        # rphf mask; glyphs it substitutes re-categorize to R
        for s_, e_, kind in syllables:
            limit = 1 if buf[s_].cat == "R" else min(3, e_ - s_)
            for k in range(s_, s_ + limit):
                buf[k].mask = buf[k].mask | {b"rphf"}
        for tag in _EARLY_FEATURES:
            self._apply_feature(buf, tag, True, None)
        before = [g.substituted for g in buf]
        self._apply_feature(buf, b"rphf", False, None)
        for g, was in zip(buf, before):
            if g.substituted and not was and b"rphf" in g.mask:
                g.cat = "R"
        before = [g.substituted for g in buf]
        self._apply_feature(buf, b"pref", True, None)
        for g, was in zip(buf, before):
            if g.substituted and not was:
                g.cat = "p"
        for tag in _BASIC_FEATURES:
            self._apply_feature(buf, tag, True, None)

        # ligatures may have shrunk the buffer: recompute syllable
        # runs from the per-glyph ids, then insert dotted circles for
        # broken clusters and reorder
        kinds = {si: kind
                 for si, (s_, e_, kind) in enumerate(syllables)}
        dc_gid = int(self.font.charmap.glyph_index(0x25CC))
        runs: list[tuple[int, int, str]] = []
        i = 0
        while i < len(buf):
            j = i
            while j < len(buf) and buf[j].syl == buf[i].syl:
                j += 1
            runs.append((i, j, kinds.get(buf[i].syl, "other")))
            i = j
        if dc_gid and any(k == "broken" for _, _, k in runs):
            nb: list[_Glyph] = []
            spans: list[tuple[int, int, str]] = []
            for s_, e_, kind in runs:
                at = len(nb)
                if kind == "broken":
                    # the dotted circle goes after a leading repha —
                    # and after leading joiners (hb-pinned:
                    # ZWNJ+vowel renders joiner, dc, vowel)
                    lead = s_
                    while lead < e_ and buf[lead].cat in ("R", "z",
                                                          "J"):
                        lead += 1
                    nb.extend(buf[s_:lead])
                    g = _Glyph(dc_gid, 0x25CC, "G", 0, 0)
                    g.syl = buf[s_].syl
                    nb.append(g)
                    nb.extend(buf[lead:e_])
                    spans.append((at, len(nb), "standard"))
                else:
                    nb.extend(buf[s_:e_])
                    spans.append((at, len(nb), kind))
            buf, runs = nb, spans

        for s_, e_, kind in runs:
            if kind in ("standard", "virama", "broken"):
                self._reorder(buf, s_, e_)

        for tag in _FINAL_FEATURES:
            self._apply_feature(buf, tag, True, None)
        return [g.gid for g in buf]

    def _reorder(self, info: list[_Glyph], start: int,
                 end: int) -> None:
        """The USE reorder, hb-pinned: a leading repha moves to just
        before the first post-base glyph (or the cluster end); then
        pre-base vowels move to the cluster start, or to after the
        nearest preceding halant."""
        if (end - start > 1 and info[start].cat == "R"):
            i = start + 1
            while i < end:
                post = (info[i].cat in _POST_BASE
                        or info[i].cat in ("H", "K"))
                if post or i == end - 1:
                    if post:
                        i -= 1
                    g = info[start]
                    del info[start]
                    info.insert(i, g)
                    break
                i += 1
        j = start
        # pre-base vowels never front past a cluster's LEADING
        # joiners (hb-pinned: ZWNJ+taling renders zwnj, taling, dc)
        while j < end and info[j].cat in ("z", "J"):
            j += 1
        i = start
        while i < end:
            g = info[i]
            if g.cat in ("H", "K", "q") and not g.ligated:
                # a LIGATED halant (consumed into a conjunct form) no
                # longer blocks pre-base vowels from the start
                j = i + 1
            elif g.cat in ("p", "P"):
                # each pre-base vowel moves to the cluster START, so
                # multiple pre-vowels come out REVERSED (hb-pinned:
                # base+e+aue renders aue, e, base)
                if i != j:
                    del info[i]
                    info.insert(j, g)
            i += 1
