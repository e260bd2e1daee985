"""ICU bidi differential: fontrx's full UAX#9 (`fontrx/font/uax9.py`)
vs the system ICU's ubidi engine (`fontrx/native/icu.py`).

This is the BidiTest-grade validation docs/ROADMAP.md wished for (the
UCD test files don't ship here): ICU is the industry UAX#9 reference.
The sound comparison is VISUAL ORDER — ICU deliberately assigns
visually-equivalent (not spec-literal) embedding levels ("the
algorithm may combine levels with the same reordering"), so levels
can differ while the reordering must not.  X9-removed formatting
characters are excluded (their display is implementation-defined).

An exploration run over 3,000 seeded random mixed-direction strings
(Latin/Hebrew/Arabic letters, EN/AN digits, ES/CS/brackets/quotes,
all five embedding controls and all four isolate controls, both
paragraph directions) found ZERO divergences; a 400-string subset is
pinned for CI plus the named rule cases below.
"""

import pytest

from fontrx.font.uax9 import resolve
from fontrx.native import icu

pytestmark = pytest.mark.skipif(
    not icu.available(), reason="system libicuuc not present")


def _compare(cps, rtl):
    ref = icu.bidi_visual_order(cps, rtl)
    assert ref is not None
    bl = resolve(cps, rtl)
    removed = {i for i in range(len(cps)) if bl.removed[i]}
    theirs = [i for i in ref if i not in removed]
    assert bl.visual_order() == theirs, (
        [hex(c) for c in cps], rtl)


class TestRuleCases:
    @pytest.mark.parametrize("text,rtl", [
        ("abc שלום 123", False),       # weak numbers after RTL
        ("שלום abc", True),            # embedded LTR under RTL base
        ("a(ש)b", False),              # N0 bracket pairs
        ("ש(a)ל", True),
        ("a‮b c‬ d", False),  # RLO override
        ("⁦שלום⁩ ok", False),  # LRI isolate
        ("⁨אב⁩x", False),     # FSI resolves RTL
        ("⁨ab⁩x", True),      # FSI resolves LTR, RTL base
        ("a א 1,234.5 ב", False),  # CS in numbers
        ("١٢ ab ا", True),    # AN digits + Arabic
        ("a‫b‪c‬d‬e", False),  # nested embeds
        ("(a[b]ש)", False),            # nested brackets
    ])
    def test_visual_order_matches_icu(self, text, rtl):
        _compare([ord(c) for c in text], rtl)


class TestRandomizedCorpus:
    def test_400_seeded_strings(self):
        import random

        alpha = (list("abc") + [0x5D0, 0x5D1, 0x627, 0x628]
                 + list("0123") + [0x660, 0x661]
                 + list(" ,.+-()[]\"")
                 + [0x202A, 0x202B, 0x202C, 0x202D, 0x202E,
                    0x2066, 0x2067, 0x2068, 0x2069])
        alpha = [ord(c) if isinstance(c, str) else c for c in alpha]
        rng = random.Random(99)
        checked = 0
        for _ in range(400):
            n = rng.randint(1, 18)
            cps = [rng.choice(alpha) for _ in range(n)]
            rtl = rng.random() < 0.5
            if icu.bidi_visual_order(cps, rtl) is None:
                continue
            _compare(cps, rtl)
            checked += 1
        assert checked > 380


class TestLineBreakSoundness:
    """UAX#14-lite soundness vs ICU's line-break iterator: every break
    the fontrx wrapper takes (space / soft-hyphen / after-hyphen / CJK
    boundary) must be a valid ICU break opportunity.  The wrapper is
    deliberately a subset (it finds fewer opportunities, never wrong
    ones)."""

    @staticmethod
    def _our_breaks(text, budget):
        from fontrx.scene.layout import _wrap_lines

        cps = [ord(c) for c in text]
        lines, _hard = _wrap_lines(
            [cps], budget, ord(" "), lambda g: 100,
            lambda g: g, hyphen_gid=ord("-"))
        breaks = []
        p = 0
        for li, line in enumerate(lines[:-1]):
            for g in line:
                # skip text chars the wrapper dropped (consumed
                # spaces, soft hyphens); a MATERIALIZED hyphen has no
                # text counterpart and simply doesn't match
                q = p
                while q < len(cps) and cps[q] != g:
                    q += 1
                if q < len(cps):
                    p = q + 1
            nxt = lines[li + 1]
            if not nxt:
                continue
            q = p
            while q < len(cps) and cps[q] != nxt[0]:
                q += 1
            breaks.append(q)
            p = q
        return breaks

    @pytest.mark.parametrize("text", [
        "well-known words and more here to wrap around",
        "super­califragilistic expialidocious stuff",
        "abc 3-4 def ghi jkl",
        "日本語のテキストは折り返し可能です and latin",
        "one two three four five six seven",
    ])
    def test_every_break_is_an_icu_opportunity(self, text):
        ref = icu.line_breaks(text)
        assert ref is not None
        ref = set(ref)
        for budget in (300, 500, 800, 1200):
            for b in self._our_breaks(text, budget):
                assert b in ref, (text, budget, b)


class TestScriptClassification:
    """Soundness of the script itemizer's ranges vs ICU uscript:
    wherever script_of assigns an OT tag, ICU's script for that
    codepoint must map to the same tag (common/inherited/unknown
    codepoints are itemizer-None by design and excluded).  The sweep
    over the full classified space found two real range bugs (Coptic
    inside the Greek block; Cypriot misfiled as Old Persian), both
    fixed."""

    def test_all_classified_codepoints_agree(self):
        import ctypes

        from fontrx.font.script import script_of
        from fontrx.native.icu import symbol

        get = symbol("uscript_getScript")
        get.restype = ctypes.c_int
        get.argtypes = [ctypes.c_int32, ctypes.POINTER(ctypes.c_int)]
        name = symbol("uscript_getShortName")
        name.restype = ctypes.c_char_p
        name.argtypes = [ctypes.c_int]

        special = {"Hira": b"kana", "Kana": b"kana", "Laoo": b"lao ",
                   "Yiii": b"yi  ", "Nkoo": b"nko ", "Vaii": b"vai "}
        skip = {"Zyyy", "Zinh", "Zzzz"}
        bad = []
        for cp in range(0x20, 0x30000):
            ours = script_of(cp)
            if ours is None:
                continue
            err = ctypes.c_int(0)
            sc = get(cp, ctypes.byref(err))
            if err.value > 0:
                continue
            ref = name(sc).decode()
            if ref in skip:
                continue
            expect = special.get(
                ref, ref.lower().encode().ljust(4)[:4])
            if ours != expect:
                bad.append((hex(cp), ours, ref))
        assert not bad, bad[:10]


class TestBidiClassTable:
    def test_exhaustive_class_agreement(self):
        """Every codepoint's bidi class matches ICU's u_charDirection
        (UCD + DerivedBidiClass @missing defaults, incl. the
        noncharacter/default-ignorable BN rule)."""
        import ctypes

        from fontrx.font.uax9 import bidi_class
        from fontrx.native.icu import symbol

        get = symbol("u_charDirection")
        get.restype = ctypes.c_int
        get.argtypes = [ctypes.c_int32]
        enum = ["L", "R", "EN", "ES", "ET", "AN", "CS", "B", "S",
                "WS", "ON", "LRE", "LRO", "AL", "RLE", "RLO", "PDF",
                "NSM", "BN", "FSI", "LRI", "RLI", "PDI"]
        bad = [(hex(cp), bidi_class(cp), enum[get(cp)])
               for cp in range(0x20, 0x30000)
               if bidi_class(cp) != enum[get(cp)]]
        assert not bad, bad[:10]
