"""Indic complex-script shaping (the OpenType Indic model, all ten
scripts Devanagari..Sinhala) — syllable analysis, reordering and
staged feature application.

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

Validated by exact HarfBuzz differentials over feaLib-compiled
per-script corpus fonts: Devanagari len<=4 exhaustive (111,150
strings) — ``tests/test_indic.py`` — and the other scripts len<=3
exhaustive + 20k random-with-joiners each, ZERO divergences
everywhere (round 4 killed the last documented classes: the
Uniscribe-era forced-rakar matra tail hb no longer has, and the
Ra+halant-led broken clusters that take the full strict tail) —
``tests/test_indic_scripts.py``.  Sinhala keeps an Indic-model
config here for completeness, but ``layout_text`` routes it to the
Universal Shaping Engine (:mod:`fontrx.font.use`) matching hb's
shaper selection — its hb differential lives there.

Scope notes (documented): GSUB lookup types 1/2/3/4 and contextual
5/6 participate in the staged application; broken clusters take a
dotted-circle placeholder base when the font maps U+25CC; the
per-script configuration table (``_CONFIGS``) carries all ten
Indic-model scripts — per-script Ra/halant codepoints, reph
formation mode (implicit Ra+halant, explicit Ra+halant+ZWJ, or a
logical repha codepoint), reph target position, blwf pre/post
applicability, base-search rule (incl. Sinhala's forward scan) and
matra position maps; each lands pinned by its own hb differential.
"""

from __future__ import annotations

import re
import unicodedata

from fontrx.font._indic_data import INDIC_MPST, indic_class
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

# reph formation modes
REPH_IMPLICIT = 0   # Ra + halant at syllable start
REPH_EXPLICIT = 1   # Ra + halant + ZWJ
REPH_LOG_REPHA = 2  # a dedicated repha codepoint (category q)

# base-consonant search rules
BASE_LAST = 0
BASE_LAST_SINHALA = 1


class _Config:
    """Per-script Indic shaping parameters (the reference-shaper
    script configs, pinned per script by the hb differentials)."""

    __slots__ = ("tags", "ra", "halant", "reph_pos", "reph_mode",
                 "blwf_pre_and_post", "base_pos", "matra",
                 "matra_exceptions", "matra_block_search",
                 "swap_ra_h_zwj", "strict_tail")

    def __init__(self, tags, ra, halant, reph_pos, reph_mode,
                 blwf_pre_and_post, base_pos, matra,
                 matra_exceptions=None, matra_block_search=True,
                 swap_ra_h_zwj=False, strict_tail=False):
        self.tags = tags
        self.ra = frozenset(ra)
        self.halant = halant
        self.reph_pos = reph_pos
        self.reph_mode = reph_mode
        self.blwf_pre_and_post = blwf_pre_and_post
        self.base_pos = base_pos
        self.matra = matra
        self.matra_exceptions = matra_exceptions or {}
        self.matra_block_search = matra_block_search
        self.swap_ra_h_zwj = swap_ra_h_zwj
        self.strict_tail = strict_tail

    def matra_pos(self, cp: int, side: str) -> int:
        hit = self.matra_exceptions.get(cp)
        if hit is not None:
            return hit
        return self.matra.get(side, POS_AFTER_SUB)


_M = {"L": POS_PRE_M, "T": POS_AFTER_SUB, "B": POS_AFTER_SUB,
      "R": POS_AFTER_SUB}
_CONFIGS: dict[bytes, _Config] = {
    b"deva": _Config((b"dev2", b"deva"), {0x0930}, 0x094D,
                     REPH_BEFORE_POST, REPH_IMPLICIT, True, BASE_LAST,
                     _M),
    b"beng": _Config((b"bng2", b"beng"), {0x09B0, 0x09F0}, 0x09CD,
                     REPH_AFTER_SUB, REPH_IMPLICIT, True, BASE_LAST,
                     {"L": POS_PRE_M, "T": POS_AFTER_SUB,
                      "B": POS_AFTER_SUB, "R": POS_AFTER_POST}),
    b"guru": _Config((b"gur2", b"guru"), {0x0A30}, 0x0A4D,
                     REPH_BEFORE_SUB, REPH_IMPLICIT, True, BASE_LAST,
                     {"L": POS_PRE_M, "T": POS_AFTER_POST,
                      "B": POS_AFTER_POST, "R": POS_AFTER_POST}),
    b"gujr": _Config((b"gjr2", b"gujr"), {0x0AB0}, 0x0ACD,
                     REPH_BEFORE_POST, REPH_IMPLICIT, True, BASE_LAST,
                     {"L": POS_PRE_M, "T": POS_AFTER_SUB,
                      "B": POS_AFTER_POST, "R": POS_AFTER_POST}),
    b"orya": _Config((b"ory2", b"orya"), {0x0B30}, 0x0B4D,
                     REPH_AFTER_MAIN, REPH_IMPLICIT, True, BASE_LAST,
                     {"L": POS_PRE_M, "T": POS_AFTER_MAIN,
                      "B": POS_AFTER_SUB, "R": POS_AFTER_POST}),
    b"taml": _Config((b"tml2", b"taml"), {0x0BB0}, 0x0BCD,
                     REPH_AFTER_POST, REPH_IMPLICIT, False, BASE_LAST,
                     {"L": POS_PRE_M, "T": POS_AFTER_SUB,
                      "B": POS_AFTER_POST, "R": POS_AFTER_POST},
                     matra_block_search=False, strict_tail=True),
    b"telu": _Config((b"tel2", b"telu"), {0x0C30}, 0x0C4D,
                     REPH_AFTER_POST, REPH_EXPLICIT, False, BASE_LAST,
                     {"L": POS_PRE_M, "T": POS_BEFORE_SUB,
                      "B": POS_BEFORE_SUB, "R": POS_AFTER_SUB},
                     {0x0C41: POS_BEFORE_SUB, 0x0C42: POS_BEFORE_SUB},
                     strict_tail=True),
    b"knda": _Config((b"knd2", b"knda"), {0x0CB0}, 0x0CCD,
                     REPH_AFTER_POST, REPH_IMPLICIT, False, BASE_LAST,
                     {"L": POS_PRE_M, "T": POS_BEFORE_SUB,
                      "B": POS_BEFORE_SUB, "R": POS_BEFORE_SUB},
                     swap_ra_h_zwj=True, strict_tail=True),
    b"mlym": _Config((b"mlm2", b"mlym"), {0x0D30}, 0x0D4D,
                     REPH_AFTER_MAIN, REPH_LOG_REPHA, False, BASE_LAST,
                     {"L": POS_PRE_M, "T": POS_AFTER_SUB,
                      "B": POS_AFTER_POST, "R": POS_AFTER_POST},
                     matra_block_search=False, strict_tail=True),
    b"sinh": _Config((b"sinh",), {0x0DBB}, 0x0DCA,
                     REPH_AFTER_POST, REPH_EXPLICIT, False,
                     BASE_LAST_SINHALA,
                     {"L": POS_PRE_M, "T": POS_AFTER_SUB,
                      "B": POS_AFTER_SUB, "R": POS_AFTER_POST}),
}

#: OT script tags the Indic engine covers (layout routing)
INDIC_SCRIPTS = frozenset(_CONFIGS)

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
# NB: no forced-rakar tail (M + ZWJ H ZWJ Ra) — hb removed the
# Uniscribe-era forced_rakar production; a ZWJ-led halant group after
# a matra starts a dc-carrying broken cluster instead (hb-pinned on
# deva/beng/mlym: KA+AA+ZWJ+H+ZWJ+RA -> [KA AA][dc H RA])
_matra_group = f"(?:{_z}*(?:M|D?O)N?H?)"
_syllable_tail = f"(?:{_z}?DD?z?)?A{{0,3}}"
_halant_group = f"(?:{_z}?H(?:JN?)?)"
# Hz first: longest-match over the ordered Python alternation
# (halant+ZWNJ must win over the bare-H arm so the tail can
# still take a joiner-led modifier group; hb-pinned on Tamil
# MA+H+ZWNJ+ZWJ+ANUSVARA merging as one cluster)
_final_halant_group = f"(?:Hz|{_halant_group})"
_halant_or_matra_group = (
    f"(?:{_final_halant_group}|{_matra_group}*)"
)
# (halant consonant) cluster continuations: the PERMISSIVE tail lets
# a joiner ride the halant; the STRICT tail does not.  Northern
# scripts (Devanagari..Oriya) cluster permissively everywhere;
# southern scripts (Tamil/Telugu/Kannada/Malayalam) cluster strictly
# UNLESS the cluster is led by a reph/repha.  All hb-pinned:
# Tamil halant+ZWJ+MA splits [halant ZWJ][MA] while Bengali
# KA+halant+ZWJ+KA+I is ONE cluster (I reorders to the very front,
# Oriya likewise), and the Malayalam repha+halant+ZWJ+KA cluster is
# one unit with the repha repositioning past the joiner.
_tail_perm = (f"(?:{_halant_group}{_cn})*E?"
              f"{_halant_or_matra_group}{_syllable_tail}")
_tail_strict = (f"(?:{_z}?H{_cn})*E?"
                f"{_halant_or_matra_group}{_syllable_tail}")


def _productions(strict: bool, logrepha: bool = False):
    """Production set per script family.  ``strict`` (the southern
    scripts) disallows joiner-riding halants in (halant consonant)
    continuations.  An Ra+halant prefix may lead a BROKEN cluster in
    every strict script — INCLUDING the logical-repha one (round 4,
    hb-pinned on Malayalam: RA+H+H+YA is ONE dc-based cluster whose
    trailing halant+YA takes its pstf form, and RA+H+H+RA's trailing
    pair takes pref and fronts past the dc; the earlier
    'RA+H+H+TA splits' reading was a flat-stream ambiguity — the
    glyph sequence is identical either way when no form applies)."""
    del logrepha  # clustering no longer differs for the repha script
    lead = _tail_perm  # reph/repha-led clusters: permissive always
    tail = _tail_strict if strict else _tail_perm
    if strict:
        rh_broken = [("broken", re.compile(f"rH{_n}{tail}"))]
    else:
        rh_broken = []
    return (
        ("consonant", re.compile(f"q{_cn}{lead}")),
        # a reph prefix (Ra+halant, with the explicit-mode ZWJ)
        # keeps its cluster together even under strict tails
        # (hb-pinned: Telugu RA+H+ZWJ+SA is one cluster, reph
        # repositioning past SA)
        ("consonant", re.compile(f"rHJ?{_cn}{tail}")),
        ("consonant", re.compile(f"{_cn}{tail}")),
        # the (ZWJ | tail) alternatives are separate productions so
        # the machine keeps LONGEST-match semantics (Python
        # alternation is ordered, the reference machine's is not)
        ("vowel", re.compile(f"(?:rH|q)V{_n}{lead}")),
        ("vowel", re.compile(f"V{_n}{tail}")),
        ("vowel", re.compile(f"(?:rH|q)?V{_n}J")),
        ("standalone", re.compile(f"(?:rH|q)P{_n}{lead}")),
        ("standalone", re.compile(f"P{_n}{tail}")),
        ("symbol", re.compile(f"YN?{_syllable_tail}")),
        ("broken", re.compile((f"q{_n}{lead}" if strict
                               else f"(?:rH|q){_n}{lead}"))),
        *rh_broken,
        ("broken", re.compile(f"{_n}{tail}")),
    )


_PRODUCTIONS = _productions(strict=False)
_PRODUCTIONS_STRICT = _productions(strict=True)
_PRODUCTIONS_STRICT_LR = _productions(strict=True, logrepha=True)


def _syllabify(cats: str, strict: bool = False,
               logrepha: bool = False) -> list[tuple[int, int, str]]:
    """Split a category string into maximal syllables (longest match
    per start, production priority on ties); unmatched characters
    become single-char ``other`` clusters."""
    prods = (_PRODUCTIONS_STRICT_LR if strict and logrepha
             else _PRODUCTIONS_STRICT if strict
             else _PRODUCTIONS)
    out: list[tuple[int, int, str]] = []
    i, n = 0, len(cats)
    while i < n:
        best_len, best_kind = 0, "other"
        for kind, rx in prods:
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

    __slots__ = ("gid", "cp", "cat", "pos", "mask", "syl", "ligated",
                 "substituted")

    def __init__(self, gid, cp, cat, pos, syl):
        self.gid = gid
        self.cp = cp
        self.cat = cat
        self.pos = pos
        self.mask: frozenset = frozenset()
        self.syl = syl
        self.ligated = False
        self.substituted = False


def _is_consonant(g: _Glyph) -> bool:
    return g.cat in ("C", "r", "E", "V", "P")


def _is_joiner(g: _Glyph) -> bool:
    return g.cat in ("J", "z")


def _is_halant(g: _Glyph) -> bool:
    return g.cat == "H"


class _ScriptState:
    """Per-(font, script) resolved shaping state."""

    __slots__ = ("cfg", "script", "halant_gid")

    def __init__(self, cfg, script, halant_gid):
        self.cfg = cfg
        self.script = script
        self.halant_gid = halant_gid


class IndicShaper:
    """Per-font Indic shaping engine (all ten Indic-model scripts,
    Devanagari..Sinhala; per-script configs in ``_CONFIGS``)."""

    ALL_TAGS = _BASIC_FEATURES + _PRES_FEATURES + (b"locl", b"ccmp")

    def __init__(self, font):
        self.font = font
        self.shaper = font.shaper(self.ALL_TAGS)
        self._would_cache: dict = {}
        self._conspos_cache: dict = {}
        self._lookup_cache: dict = {}
        self._states: dict[bytes, _ScriptState] = {}

    def _state(self, script: bytes) -> _ScriptState:
        st = self._states.get(script)
        if st is None:
            cfg = _CONFIGS.get(script) or _CONFIGS[b"deva"]
            sel = None
            if self.shaper is not None:
                for t in cfg.tags:
                    if t in getattr(self.shaper, "scripts", {}):
                        sel = t
                        break
            halant_gid = int(self.font.charmap.glyph_index(cfg.halant))
            st = _ScriptState(cfg, sel, halant_gid)
            self._states[script] = st
        return st

    @property
    def available(self) -> bool:
        if self.shaper is None:
            return False
        return any(self._feature_lookups(t, None)
                   for t in _BASIC_FEATURES)

    # -- feature -> lookup indices (script-routed) ----------------------

    def _feature_lookups(self, tag: bytes,
                         st: _ScriptState | None) -> list[int]:
        s = self.shaper
        if s is None:
            return []
        script = st.script if st is not None else None
        key = (tag, script)
        hit = self._lookup_cache.get(key)
        if hit is not None:
            return hit
        if script is not None:
            out = s.lookup_indices_for((tag,), script)
        else:
            out = sorted(s.features.get(tag, ()))
        self._lookup_cache[key] = out
        return out

    # -- would-substitute probes (consonant position classification) ----

    def _would_substitute(self, tag: bytes, seq: tuple[int, ...],
                          st: _ScriptState) -> bool:
        key = (tag, seq, st.script)
        hit = self._would_cache.get(key)
        if hit is not None:
            return hit
        ok = False
        for li in self._feature_lookups(tag, st):
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

    def _consonant_position(self, gid: int, st: _ScriptState) -> int:
        """POS_BELOW_C / POS_POST_C / POS_BASE_C for one consonant, by
        probing whether the font's blwf/pstf/pref would substitute
        (halant, C) — both orders, the robustness rule reference
        shapers apply for old-spec-copied lookups."""
        halant_gid = st.halant_gid
        key = (gid, st.script)
        hit = self._conspos_cache.get(key)
        if hit is not None:
            return hit
        pos = POS_BASE_C
        for tag, p in ((b"blwf", POS_BELOW_C), (b"pstf", POS_POST_C),
                       (b"pref", POS_POST_C)):
            if (self._would_substitute(tag, (halant_gid, gid), st)
                    or self._would_substitute(tag, (gid, halant_gid),
                                              st)):
                pos = p
                break
        self._conspos_cache[key] = pos
        return pos

    # -- classification --------------------------------------------------

    def _classify(self, cps: list[int], gids: list[int],
                  st: _ScriptState) -> list[_Glyph]:
        cfg = st.cfg
        out = []
        for k, (cp, gid) in enumerate(zip(cps, gids)):
            cat, side = indic_class(cp)
            if cat == "M" and cp in INDIC_MPST:
                # POST matras (hb's MPst): may ride a preceding
                # syllable modifier inside one cluster
                cat = "O"
            if cat == "C" and cp in cfg.ra:
                cat = "r"
            if cat in ("M", "O"):
                pos = cfg.matra_pos(cp, side)
            elif cat in ("SM", "A"):
                pos = POS_SMVD
            else:
                pos = POS_BASE_C
            if cat in ("C", "r") and st.halant_gid:
                cpos = self._consonant_position(gid, st)
                if cpos != POS_BASE_C:
                    pos = cpos
            cat = {"SM": "D", "S": "Y", "RS": "R", "CM": "E"}.get(
                cat, cat)
            out.append(_Glyph(gid, cp, cat, pos, 0))
        # a syllable modifier directly before a post matra rides at
        # the matra's slot, not SMVD (hb-pinned: KA+bindi+II keeps
        # the bindi before the matra and the reph passes both)
        for k in range(len(out) - 1):
            if out[k].cat == "D" and out[k + 1].cat == "O":
                out[k].pos = out[k + 1].pos
        return out

    # -- initial reordering ----------------------------------------------

    def _initial_reorder(self, buf: list[_Glyph], start: int, end: int,
                         kind: str, st: _ScriptState) -> None:
        if kind in ("symbol", "other"):
            return
        info = buf
        cfg = st.cfg

        # Kannada quirk (reference-shaper pinned): Ra+halant+ZWJ at
        # syllable start swaps the halant and ZWJ, so explicit-reph
        # style input still forms rakars off the adjacent pair
        if (cfg.swap_ra_h_zwj and start + 3 <= end
                and info[start].cat == "r"
                and _is_halant(info[start + 1])
                and info[start + 2].cat == "J"):
            info[start + 1], info[start + 2] = (info[start + 2],
                                                info[start + 1])

        # 1. find base
        has_reph = False
        base = end
        limit = start
        mode = cfg.reph_mode
        if mode == REPH_LOG_REPHA and info[start].cat == "q" \
                and start + 1 < end:
            limit += 1
            while limit < end and _is_joiner(info[limit]):
                limit += 1
            base = start
            has_reph = True
        elif (mode == REPH_IMPLICIT
                and self._feature_lookups(b"rphf", st)
                and start + 3 <= end
                and info[start].cat == "r"
                and _is_halant(info[start + 1])
                and not _is_joiner(info[start + 2])
                and self._would_substitute(
                    b"rphf", (info[start].gid, info[start + 1].gid),
                    st)):
            limit += 2
            while limit < end and _is_joiner(info[limit]):
                limit += 1
            base = start
            has_reph = True
        elif (mode == REPH_EXPLICIT
                and self._feature_lookups(b"rphf", st)
                and start + 3 <= end
                and info[start].cat == "r"
                and _is_halant(info[start + 1])
                and info[start + 2].cat == "J"
                and (self._would_substitute(
                        b"rphf", (info[start].gid, info[start + 1].gid,
                                  info[start + 2].gid), st)
                     or self._would_substitute(
                        b"rphf", (info[start].gid,
                                  info[start + 1].gid), st))):
            limit += 3
            base = start
            has_reph = True

        if cfg.base_pos == BASE_LAST_SINHALA:
            # Sinhala: forward scan, a ZWJ before a consonant stops
            # the search (conjoined letters are explicit there)
            if not has_reph:
                base = limit
            for i in range(limit, end):
                if _is_consonant(info[i]):
                    if i > limit and info[i - 1].cat == "J":
                        break
                    base = i
        else:
            i = end
            seen_below = False
            while i > limit:
                i -= 1
                if _is_consonant(info[i]):
                    if (info[i].pos != POS_BELOW_C
                            and (info[i].pos != POS_POST_C
                                 or seen_below)):
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
            if info[k].cat in ("M", "O"):
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
            elif info[k].cat in ("M", "O"):
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
                if g.cat in ("M", "O") or not groups:
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
        pre = {b"half"}
        if cfg.blwf_pre_and_post:
            # e.g. Devanagari: blwf applies pre AND post base
            pre.add(b"blwf")
        for k in range(start, min(base, end)):
            masks[k - start] |= pre
        post = {b"blwf", b"abvf", b"pstf"}
        for k in range(base + 1, end):
            masks[k - start] |= post

        # pre-base-reordering Ra: ONLY the specific (halant, Ra) pair
        # the font's pref would substitute is masked — with pref
        # alone, replacing the positional masks (the
        # reference-shaper behavior)
        if self._feature_lookups(b"pref", st) and base + 2 < end:
            for k in range(base + 1, end - 1):
                if self._would_substitute(
                        b"pref", (info[k].gid, info[k + 1].gid), st):
                    masks[k - start] = {b"pref"}
                    masks[k + 1 - start] = {b"pref"}
                    break

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

        for k in range(start, end):
            info[k].mask = frozenset(masks[k - start])

    # -- masked GSUB application -----------------------------------------

    def _apply_feature(self, buf: list[_Glyph], tag: bytes,
                       global_: bool, st: _ScriptState) -> None:
        s = self.shaper
        for li in self._feature_lookups(tag, st):
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
                    buf[i].substituted = True
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
                        g.substituted = True
                        repl.append(g)
                    buf[i:i + 1] = repl
                    return i + len(seq) if seq else i
            elif s_type == 3:
                new = sub.sub_for(gid, getattr(self.shaper,
                                               "alt_index", 0))
                if new is not None:
                    buf[i].gid = new
                    buf[i].substituted = True
                    return i + 1
            elif s_type == 4:
                for lig in sub.ligs_for(gid):
                    pos = self._match_forward(buf, i, lig.components,
                                              lk, tag, global_)
                    if pos is None:
                        continue
                    buf[i].gid = lig.glyph
                    buf[i].ligated = True
                    buf[i].substituted = True
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
                       kind: str, word_initial: bool,
                       st: _ScriptState) -> None:
        if kind in ("symbol", "other") or end - start == 0:
            return
        info = buf
        reph_pos = st.cfg.reph_pos

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
            if st.cfg.matra_block_search:
                while True:
                    while (new_pos > start
                           and info[new_pos].cat
                           not in ("M", "O", "H")):
                        new_pos -= 1
                    if (_is_halant(info[new_pos])
                            and info[new_pos].pos != POS_PRE_M):
                        if (new_pos + 1 < end
                                and _is_joiner(info[new_pos + 1])):
                            # a joiner rides this halant: the matra
                            # never lands after it — keep searching
                            # backward (hb-pinned: MA+U+H+ZWJ+I
                            # leaves I in front, both joiners)
                            if new_pos > start:
                                new_pos -= 1
                                continue
                            new_pos = start  # no move
                    else:
                        new_pos = start  # no move
                    break
            # else: Tamil/Malayalam have no half forms — the matra
            # positions directly before the base block, no search and
            # no halant/joiner adjustment (hb-pinned: KA+H+MA+E puts
            # E between the halant and MA)

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

        # o Reorder reph.  The move fires when formation state matches
        #   the reph kind: an implicit/explicit Ra+halant moved only
        #   if rphf LIGATED it, a logical repha moved only if rphf
        #   did NOT ligate it (single-glyph substitutions keep it a
        #   lone repha that must still reposition — hb-pinned on the
        #   Malayalam dot reph)
        if (start + 1 < end
                and info[start].pos == POS_RA_TO_BECOME_REPH
                and (info[start].cat == "q") != info[start].ligated):
            new_reph = None
            # steps 2/5: after the first explicit pre-base halant.
            # Every reph class runs this search — non-after-post as
            # step 2, after-post via the spec's step 5, which the
            # reference implementation fills with a literal copy of
            # step 2 (hb-pinned on Tamil: RA+H+TA+H+KA puts reph
            # after the TA halant even though Tamil is after-post)
            p = start + 1
            while p < base and not _is_halant(info[p]):
                p += 1
            if p < base and _is_halant(info[p]):
                if p + 1 < base and _is_joiner(info[p + 1]):
                    p += 1
                new_reph = p
            if new_reph is None and reph_pos == REPH_AFTER_MAIN:
                # step 3: after the last thing positioned up to
                # after-main (falls through when the cluster lost its
                # base — e.g. the whole thing ligated away)
                p = base
                while (p + 1 < end
                       and info[p + 1].pos <= POS_AFTER_MAIN):
                    p += 1
                if p < end:
                    new_reph = p
            if new_reph is None and reph_pos == REPH_AFTER_SUB:
                # step 4: before the first post-base form or modifier
                p = base
                while (p + 1 < end and info[p + 1].pos not in (
                        POS_POST_C, POS_AFTER_POST, POS_SMVD)):
                    p += 1
                if p < end:
                    new_reph = p
            if new_reph is None:
                # step 6: end of the syllable, before trailing
                # modifiers; when that lands on a halant and a matra
                # sits after the base, back up one slot — reph goes
                # BEFORE the final halant (hb-pinned: RA+H+SA+AA+H ->
                # SA AA REPH H, but RA+H+KA+H -> KA.haln REPH)
                q = end - 1
                while q > start and info[q].pos == POS_SMVD:
                    q -= 1
                if _is_halant(info[q]):
                    for k in range(base + 1, q):
                        if info[k].cat in ("M", "O"):
                            q -= 1
                            break
                new_reph = q
            reph = info[start]
            info[start:new_reph] = info[start + 1:new_reph + 1]
            info[new_reph] = reph
            if start < base <= new_reph:
                base -= 1

        # o Reorder pref: a pref-substituted glyph (Malayalam
        #   pre-base-reordering Ra) moves to just before the base,
        #   positioned the way pre-base matras are
        if base + 1 < end:
            for i in range(base + 1, end):
                if b"pref" not in info[i].mask:
                    continue
                if info[i].substituted:
                    new_pos = base
                    if st.cfg.matra_block_search:
                        while (new_pos > start
                               and info[new_pos - 1].cat
                               not in ("M", "O", "H")):
                            new_pos -= 1
                    if (new_pos > start
                            and _is_halant(info[new_pos - 1])
                            and new_pos < end
                            and _is_joiner(info[new_pos])):
                        new_pos += 1
                    g = info[i]
                    del info[i]
                    info.insert(new_pos, g)
                    if new_pos <= base < i:
                        base += 1
                break

        # o init on a left matra that FINISHED first: the reference
        #   shapers decide init HERE, between the basic and
        #   presentation GSUB stages — a matra that ended up behind a
        #   dotted circle or half block is no longer word-initial
        #   (hb-pinned via the Bengali differential:
        #   halant+KA+E -> dc H E KA, no init; halant+RA+E ->
        #   E dc rakar, init)
        if (word_initial and start < end
                and info[start].pos == POS_PRE_M
                and self._feature_lookups(b"init", st)):
            info[start].mask = info[start].mask | {b"init"}

    # -- entry point --------------------------------------------------------

    def _decompose(self, cps: list[int], gids: list[int]):
        """Canonical (NFD) decomposition of the run, per character,
        when the font maps every part; characters the font can only
        draw precomposed stay composed (the reference-shaper
        fallback)."""
        if not any(unicodedata.decomposition(chr(cp))
                   and not unicodedata.decomposition(
                       chr(cp)).startswith("<")
                   for cp in cps):
            return cps, gids
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
        return nc, ng

    def shape(self, cps: list[int], gids: list[int],
              script: bytes = b"deva") -> list[int]:
        """Shape one logical run (substitution stage) of ``script``
        (an OT tag from the itemizer): returns the substituted +
        reordered glyph-id stream."""
        st = self._state(script)
        # canonical DECOMPOSITION first: the Indic normalization mode
        # is decomposed — split vowels (e.g. Bengali O = E + AA) and
        # composed consonants (Gurmukhi SHA = SA + nukta) always shape
        # as their parts when the font maps them, even when it also
        # carries the precomposed glyph (hb-pinned)
        cps, gids = self._decompose(cps, gids)
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
        from fontrx.font._indic_data import INDIC_VOWEL_CONSTRAINTS

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

        buf = self._classify(cps, gids, st)
        cats = "".join(g.cat for g in buf)
        syllables = _syllabify(
            cats, strict=st.cfg.strict_tail,
            logrepha=st.cfg.reph_mode == REPH_LOG_REPHA)

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
                    # the dotted circle goes AFTER a leading logical
                    # repha (hb-pinned: Malayalam dot-reph alone ->
                    # repha then dc, reph then repositions off the dc
                    # base)
                    lead = s_
                    while lead < e_ and buf[lead].cat == "q":
                        lead += 1
                    nb.extend(buf[s_:lead])
                    cat, _side = indic_class(0x25CC)
                    nb.append(_Glyph(dc_gid, 0x25CC, cat, POS_BASE_C,
                                     0))
                    nb.extend(buf[lead:e_])
                    ns.append((at, len(nb), "standalone"))
                    continue
                nb.extend(buf[s_:e_])
                ns.append((at, len(nb), kind))
            buf, syllables = nb, ns
        for si, (s_, e_, kind) in enumerate(syllables):
            for k in range(s_, e_):
                buf[k].syl = si
            self._initial_reorder(buf, s_, e_, kind, st)

        for tag in _BASIC_FEATURES:
            self._apply_feature(buf, tag, tag in _GLOBAL_BASIC, st)

        # syllable boundaries survived (per-syllable matching), so
        # recompute each syllable's extent for final reordering
        kinds = {si: kind for si, (s_, e_, kind) in enumerate(syllables)}
        i = 0
        while i < len(buf):
            j = i
            while j < len(buf) and buf[j].syl == buf[i].syl:
                j += 1
            # hb-pinned init boundary: letters, marks, format
            # (ZWJ/ZWNJ), unassigned, private-use and surrogates all
            # block init; punctuation/digits/spaces/controls allow it
            pc = ("" if i == 0
                  else unicodedata.category(chr(buf[i - 1].cp)))
            word_initial = i == 0 or not (
                pc[0] in ("L", "M")
                or pc in ("Cf", "Cn", "Co", "Cs"))
            self._final_reorder(buf, i, j, kinds.get(buf[i].syl,
                                                     "other"),
                                word_initial, st)
            i = j

        for tag in _PRES_FEATURES:
            self._apply_feature(buf, tag, tag != b"init", st)

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


def is_indic(cp: int) -> bool:
    """True for the ten Indic shaping-model blocks
    (Devanagari..Sinhala + Devanagari Extended)."""
    return 0x0900 <= cp <= 0x0DFF or 0xA8E0 <= cp <= 0xA8FF
