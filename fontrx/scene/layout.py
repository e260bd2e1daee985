"""Text layout: codepoints -> per-instance glyph placements.

Semantics of the reference's ``addChar`` pipeline (``Appli.zig:318-351``):
glyphs dedup by codepoint (cost is O(unique glyphs), not O(text)), each
instance records a pen-position transform, and the pen advances by the
glyph's ``advance_width`` in font units.  Extended with multi-line
layout using hhea metrics (ascent/descent/line gap), which the reference
TODO-lists as "user text input" (``README.md:73``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from fontrx.font.font import Font
from fontrx.pack.segments import PackedBatch, pack_glyphs
from fontrx.scene.transform import Transform


@dataclass(frozen=True, slots=True)
class Instance:
    """One placed glyph: index into the layout's unique-glyph batch +
    pen offset in font units."""

    glyph_slot: int
    x: float
    y: float

    def local_transform(self) -> Transform:
        return Transform(offset=(self.x, self.y))


class LazyInstances:
    """Array-backed instance sequence: behaves like
    ``list[Instance]`` but holds (slots int32 [N], offsets f64 [N, 2])
    columns, so batched consumers skip the per-object round trip.
    Built by the incremental layout merge (vectorized concatenation);
    ``Instance`` objects materialize only if someone iterates."""

    __slots__ = ("slots", "offsets")

    def __init__(self, slots: np.ndarray, offsets: np.ndarray):
        self.slots = slots
        self.offsets = offsets

    def __len__(self) -> int:
        return int(self.slots.shape[0])

    def __getitem__(self, i):
        if isinstance(i, slice):
            return [self[j] for j in range(*i.indices(len(self)))]
        return Instance(int(self.slots[i]),
                        float(self.offsets[i, 0]),
                        float(self.offsets[i, 1]))

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


@dataclass(slots=True)
class TextLayout:
    """A laid-out text run over a deduplicated glyph batch."""

    batch: PackedBatch
    slot_chars: list[int]  # codepoint per unique-glyph slot
    slot_gids: list[int]   # font glyph index per slot (tile-cache key)
    instances: list[Instance] | LazyInstances
    width: float  # pen extent in font units
    height: float

    def instance_arrays(self) -> tuple[np.ndarray, np.ndarray]:
        """(slots int32 [N], offsets float32 [N, 2]) for batched compositing."""
        li = self.instances
        if isinstance(li, LazyInstances):
            return li.slots, li.offsets.astype(np.float32).reshape(-1, 2)
        slots = np.array([i.glyph_slot for i in li], np.int32)
        offs = np.array([[i.x, i.y] for i in li], np.float32)
        return slots, offs.reshape(-1, 2)


def layout_text(
    font: Font,
    text: str,
    pad_batch_to: int | None = None,
    kern: bool = False,
    ligatures: bool = False,
    marks: bool = False,
    features: tuple[bytes, ...] | None = None,
    vertical: bool = False,
    positioning: tuple[bytes, ...] | None = None,
    wrap_width: float | None = None,
    oblique: float = 0.0,
    rtl: bool = False,
    bidi: bool = False,
    alternate: int = 0,
    letter_spacing: float = 0.0,
    word_spacing: float = 0.0,
    underline: bool = False,
    strikethrough: bool = False,
    tracking_ptem: float | None = None,
    aat_features: tuple = (),
    align: str = "left",
    line_height: float | None = None,
    kashida: bool = False,
) -> TextLayout:
    """Lay out ``text`` (supports ``\\n``) at the em scale: glyph slots
    dedup (``Appli.zig:319`` getOrPut — by glyph index here, which
    subsumes the reference's by-codepoint dedup) and instances carry pen
    offsets (``Appli.zig:343-351``).

    Extensions over the reference (whose pen only uses advance widths),
    both off by default so default layout matches it exactly:

    - ``kern=True``: pair kerning (``kern`` table, GPOS fallback);
    - ``ligatures=True``: GSUB standard ligatures (fi/ffl/...) applied
      to each line's glyph stream before placement;
    - ``marks=True``: GPOS MarkToBase attachment — a combining mark
      (e.g. U+0301) is anchor-aligned onto the preceding base glyph and
      consumes no pen advance; kerning pairs skip over marks;
    - ``features=(b"ccmp", b"dlig", ...)``: arbitrary GSUB feature tags
      shaped with the full lookup engine (:mod:`fontrx.font.shape` —
      contextual/chained lookups, GDEF flag skipping); combines with
      ``ligatures=True``, which contributes ``liga``+``rlig``;
    - ``vertical=True``: top-to-bottom columns, right-to-left (CJK
      convention).  Per glyph the pen drops by the ``vmtx`` advance
      height and the glyph hangs with its bbox top at
      ``pen - top_side_bearing``, centered on the column axis
      (``x -= advance_width/2``); the GSUB ``vert`` feature is applied
      automatically when the font has it (rotated punctuation forms).
      Fonts without ``vhea``/``vmtx`` fall back to one em of advance
      and the hhea ascent as the hanging origin.  The legacy kern/marks
      flags are horizontal-only and ignored in this mode; vertical pair
      kerning comes from ``positioning=(b"vkrn",)``;
    - ``positioning=(b"kern", b"cswh", ...)``: GPOS feature tags
      applied through the full positioning engine
      (:mod:`fontrx.font.gpos_shape` — all 9 lookup types including
      cursive attachment and contextual positioning).  When active it
      REPLACES the legacy kern/marks paths for placement: ``kern=True``
      folds into the tag set as ``kern`` (``vkrn`` when vertical) and
      ``marks=True`` as ``mark``+``mkmk``, so the engine is the single
      positioning source and nothing double-applies.  Fonts whose GPOS
      lacks every requested tag fall back to the legacy paths;
    - ``wrap_width`` (font units): greedy word wrap — each shaped line
      breaks at the last UAX#14 break opportunity (full LB2-LB31 via
      :mod:`fontrx.font.uax14`, ICU-differential-exact) that keeps the
      advance-width sum within the budget; breaking spaces are
      consumed; soft hyphens materialize a hyphen glyph when taken; a
      word wider than the budget gets a line of its own rather than
      overflowing forever.  Wrap measurement uses plain advances;
      kerning and GPOS placement apply after the break decisions (like
      most greedy layout engines).  Horizontal modes only;
    - ``oblique`` (slant ratio, e.g. 0.21 for ~12 deg): synthetic
      italic — every glyph outline shears ``x' = x + oblique * y``
      before packing (exact: affine images of quadratics).  Advances
      are unchanged, matching how synthetic-oblique engines behave;
    - ``rtl=True``: right-to-left lines.  Shaping, kerning, GPOS
      positioning and mark attachment all run on the LOGICAL stream
      (so directional kern pairs and attachments stay correct), then
      each line mirrors to visual order by reversing its sequence of
      advance boxes — glyph outlines stay unmirrored, pair gaps stay
      between the same pairs, marks travel with their base's box.
      Pure-RTL runs only (Hebrew and Arabic — Arabic positional forms
      engage automatically via :mod:`fontrx.font.arabic`); for MIXED
      direction text use ``bidi=True``;
    - ``bidi=True``: mixed-direction lines via the FULL UAX#9
      algorithm (:mod:`fontrx.font.uax9` — explicit embeddings/
      overrides/isolates, weak-number rules, N0 bracket pairs).  Each
      line resolves to per-character levels; maximal level runs shape
      INDEPENDENTLY (ligatures/joining never cross level boundaries)
      with L4 mirrored forms at odd levels, explicit directional
      controls drop from display, placement runs in logical order, and
      L2 reordering applies as geometric span reversals per level
      (arbitrary nesting).  ``rtl`` selects the paragraph base
      direction.  Composes with ``wrap_width``: per the UAX#9 model,
      lines break on the LOGICAL order (full UAX#14 opportunities over
      the shaped stream) and L2 reordering applies to each broken
      line.  Composes with ``vertical=True``: level runs resolve
      per column and L2 reordering applies along the column axis
      (an RTL run's cells read bottom-to-top within the run extent);
    - ``alternate=N``: which alternate GSUB type-3 substitutions pick
      (the salt/aalt selection knob; clamped per alternate set);
    - ``letter_spacing`` / ``word_spacing`` (font units): CSS-style
      tracking — letter spacing widens every glyph's advance cell,
      word spacing additionally widens space glyphs.  The extra rides
      inside the advance box, so RTL mirroring and bidi reordering
      keep pair gaps intact; applies to the vertical pen drop too;
    - ``underline`` / ``strikethrough``: per-line decoration bars from
      the ``post``/``OS/2`` metrics (``decoration_metrics``; MVAR
      ``undo``/``unds``/``stro``/``strs`` vary them on variable
      fonts).  Each bar is a synthetic rectangle glyph spanning the
      line's advance extent, composited like any other glyph (its
      batch slot carries a geometry-keyed negative id so tile caches
      never collide with real glyphs).  Horizontal modes only;
    - ``kashida=True`` (with ``align="justify"``): Arabic justified
      lines stretch at KASHIDA points — tatweel (U+0640) elongations
      inserted where two positional-form glyphs render joined — in
      addition to space cells.  Junctions are detected geometrically
      from the font's own ``init``/``medi``/``fina`` form glyphs
      (:meth:`~fontrx.font.arabic.ArabicShaper.connection_sides`), one
      preferred point per connected word (the junction nearest the
      word's final letter, the classic simplified-Naskh rule; every
      junction participates when the slack per point would exceed
      three tatweel widths).  The inserted tatweels tile the widened
      gap with overlap so the baseline stroke stays continuous.
      Ignored when the font has no tatweel glyph or no Arabic forms.
    """
    # canonical composition first (the HarfBuzz convention): NFC
    # prefers precomposed glyphs; anything the font can't serve
    # composed falls back to NFD base + marks at stream build below.
    # Residual mark runs then sort by hb's MODIFIED combining classes
    # (Hebrew dots/dagesh before vowels, Arabic shadda before vowels)
    # — fonts author their GPOS anchors against that order
    import unicodedata

    from fontrx.font.normalize import sort_marks

    text = sort_marks(unicodedata.normalize("NFC", text))

    # AAT trak: size-dependent tracking folds into the letter-spacing
    # machinery (per real advance cell, deferred past attached marks).
    # hb additionally shifts every glyph by trunc(v/2) — a constant
    # line-origin offset fontrx omits (documented; the differential
    # tests compensate).
    if tracking_ptem is not None:
        _trak = getattr(font, "trak", None)
        if _trak is not None:
            letter_spacing += _trak.value(tracking_ptem)

    # variable fonts: advances come from the current design location
    # (phantom-point deltas); static fonts/stacks fall through to hmtx
    if hasattr(font, "varied_advance"):
        _adv = font.varied_advance
    else:
        def _adv(gid):
            if gid < 0:
                return 0  # invisible sentinel
            # loading first lets USE_MY_METRICS composites patch their
            # advance before anything (wrap measurement) reads it; the
            # glyph is cached, so the later dedup load is free
            loader = getattr(font, "load_glyph_safe", None)
            if loader is not None:
                loader(gid)
            return int(font.advance_widths[gid])

    # text -> per-line glyph-id streams (ligatures never cross newlines).
    # Unicode variation selectors (U+FE00..FE0F, U+E0100..E01EF) modify
    # the PRECEDING base character via the cmap format-14 table (beyond
    # the reference) and never occupy a slot themselves.
    lines: list[list[int]] = [[]]
    cp_lines: list[list[int]] = [[]]
    prev_cp: int | None = None
    for ch in text:
        if ch == "\n":
            lines.append([])
            cp_lines.append([])
            prev_cp = None
            continue
        cp = ord(ch)
        if (0xFE00 <= cp <= 0xFE0F or 0xE0100 <= cp <= 0xE01EF):
            if prev_cp is not None and lines[-1]:
                lines[-1][-1] = int(font.glyph_index_variant(prev_cp, cp))
            continue  # selector without a base char: ignored
        if cp == 0xAD:
            # soft hyphen: default-invisible; the wrapping path keeps
            # it in the stream ONLY when the font maps U+00AD to an
            # identifiable dedicated glyph (the wrapper re-derives
            # codepoints from gids; an unmapped SHY would inject
            # .notdef tofu and a hyphen-aliased one a visible hyphen —
            # those fonts degrade to no SHY break opportunity)
            if wrap_width is None:
                continue
            g = int(font.charmap.glyph_index(0xAD))
            if g == 0 or font.charmap.char_for_glyph(g) != 0xAD:
                continue
        gid = int(font.charmap.glyph_index(cp))
        if gid == 0 and _is_default_ignorable(cp):
            # unmapped default-ignorables (ZWNJ/ZWJ/LRM/WJ/...) render
            # INVISIBLE, not as .notdef tofu; the -1 sentinel keeps the
            # position through the shaping passes (the Arabic joiner
            # and bidi read the parallel codepoints) and placement
            # skips it
            lines[-1].append(-1)
            cp_lines[-1].append(cp)
            prev_cp = cp
            continue
        if gid == 0:
            # NFD fallback: a precomposed character the font lacks
            # renders as its canonical base + combining-mark sequence
            # when every part maps (strictly better than .notdef; GPOS
            # mark attachment positions the marks when enabled)
            import unicodedata

            parts = unicodedata.normalize("NFD", ch)
            if len(parts) > 1:
                gids = [int(font.charmap.glyph_index(ord(p)))
                        for p in parts]
                if all(gids):
                    lines[-1].extend(gids)
                    cp_lines[-1].extend(ord(p) for p in parts)
                    prev_cp = cp
                    continue
        lines[-1].append(gid)
        cp_lines[-1].append(cp)
        prev_cp = cp

    # Arabic positional forms (init/medi/fina), selected per position
    # by the font-derived joining algorithm (fontrx/font/arabic.py) —
    # runs before the feature pass so lam-alef rlig sees form glyphs
    if any(
        _is_arabic_cp(cp)
        for cp in {c for line in cp_lines for c in line}
    ) and getattr(font, "arabic_shaper", None) is not None:
        ar = font.arabic_shaper
        lines = [
            ar.apply(cps, line)
            if any(_is_arabic_cp(c) for c in set(cps))
            else line
            for cps, line in zip(cp_lines, lines)
        ]
    # substitution pass: the full GSUB engine over the selected feature
    # tags (ligatures=True contributes liga+rlig); falls back to the
    # flattened LigatureTable when the engine can't parse the font's
    # GSUB but the simple path can
    tags: tuple[bytes, ...] = ()
    if ligatures:
        tags += (b"liga", b"rlig")
    if features:
        tags += tuple(t for t in features if t not in tags)
    if vertical:
        tags += tuple(t for t in (b"vert",) if t not in tags)
    def _shape_stream(seq, seg_cps=None):
        """GSUB over one glyph stream.  With codepoints available the
        stream itemizes into script runs and each run's lookups come
        from its ScriptList entry (script/language-system selection —
        ``locl`` and per-script feature registration resolve correctly
        on multi-script fonts); fonts without a usable ScriptList keep
        the tag-global behavior.  Devanagari runs route through the
        Indic complex-script engine (:mod:`fontrx.font.indic` —
        syllable analysis, reordering, staged basic/presentation
        features) automatically, like the Arabic joiner; user-selected
        feature tags then apply on top (the reference-shaper stage
        order).

        Side channel: ``_shape_stream.last_comps`` holds the 1-based
        ligature-component index per output glyph (marks that rode
        inside formed ligatures; 0 elsewhere) for GPOS
        mark-to-ligature attachment."""
        _shape_stream.last_comps = [0] * len(seq)
        # family predicates run over the UNIQUE codepoints (any() over
        # a set equals any() over the stream; real text repeats few
        # cps, so this turns six 10k-element Python scans per line
        # into six scans of ~dozens — measured on the wrapped-page
        # profile)
        aligned = seg_cps is not None and len(seg_cps) == len(seq)
        uniq = set(seg_cps) if aligned else ()
        indic = None
        if aligned and any(_is_indic_cp(c) for c in uniq):
            indic = getattr(font, "indic_shaper", None)
        thai = None
        if aligned and any(_is_thai_cp(c) for c in uniq):
            thai = font.thai_shaper
        khmer = None
        if aligned and any(0x1780 <= c <= 0x17FF for c in uniq):
            khmer = getattr(font, "khmer_shaper", None)
        mymr = None
        if aligned and any(0x1000 <= c <= 0x109F for c in uniq):
            mymr = getattr(font, "myanmar_shaper", None)
        hang = None
        if aligned and any(_is_hangul_cp(c) for c in uniq):
            hang = font.hangul_shaper
        use = None
        if aligned and any(_is_use_cp(c) for c in uniq):
            use = getattr(font, "use_shaper", None)
        if not tags and indic is None and thai is None \
                and khmer is None and mymr is None and hang is None \
                and use is None:
            return seq
        shaper = font.shaper(tags) if tags else None
        if tags and shaper is None and indic is None and use is None:
            if ligatures and font.ligatures is not None:
                out = font.ligatures.apply(seq)
                _shape_stream.last_comps = [0] * len(out)
                return out
            return seq
        if shaper is not None and hasattr(shaper, "alt_index"):
            shaper.alt_index = alternate
        if (seg_cps is None or len(seg_cps) != len(seq)
                or (indic is None and thai is None and khmer is None
                    and mymr is None and hang is None and use is None
                    and not getattr(shaper, "scripts", None))):
            out = shaper.apply(seq) if shaper is not None else list(seq)
            _shape_stream.last_comps = list(
                getattr(shaper, "last_lig_comps", None)
                or [0] * len(out))
            return out
        from fontrx.font.script import itemize

        out: list[int] = []
        comps: list[int] = []
        for s, e, stag in itemize(seg_cps):
            if (stag is not None and stag in _use_scripts()
                    and getattr(font, "use_shaper", None) is not None):
                part = font.use_shaper.shape(seg_cps[s:e], seq[s:e],
                                             script=stag)
                if shaper is not None:
                    part = shaper.apply(part, script=stag)
                pc = [0] * len(part)
            elif indic is not None and stag is not None \
                    and stag in _indic_scripts():
                part = indic.shape(seg_cps[s:e], seq[s:e],
                                   script=stag)
                if shaper is not None:
                    part = shaper.apply(part, script=stag)
                pc = [0] * len(part)
            elif hang is not None and stag == b"hang":
                part = hang.shape(seg_cps[s:e], seq[s:e])
                if shaper is not None:
                    part = shaper.apply(part, script=stag)
                pc = [0] * len(part)
            elif mymr is not None and stag == b"mymr":
                part = mymr.shape(seg_cps[s:e], seq[s:e])
                if shaper is not None:
                    part = shaper.apply(part, script=stag)
                pc = [0] * len(part)
            elif khmer is not None and stag == b"khmr":
                part = khmer.shape(seg_cps[s:e], seq[s:e])
                if shaper is not None:
                    part = shaper.apply(part, script=stag)
                pc = [0] * len(part)
            elif thai is not None and stag in (b"thai", b"lao "):
                ncps = thai.shape(list(seg_cps[s:e]), script=stag)
                part = [int(font.charmap.glyph_index(c))
                        for c in ncps]
                if shaper is not None:
                    part = shaper.apply(part, script=stag)
                pc = [0] * len(part)
            elif shaper is not None:
                part = shaper.apply(seq[s:e], script=stag or b"DFLT")
                pc = list(getattr(shaper, "last_lig_comps", None)
                          or [0] * len(part))
            else:
                part = list(seq[s:e])
                pc = [0] * len(part)
            out.extend(part)
            comps.extend(pc)
        _shape_stream.last_comps = comps
        return out

    _morx = getattr(font, "morx", None)
    _morx_active = _morx is not None and b"GSUB" not in getattr(
        font, "tables", {})

    hard_breaks = None  # set by the wrapper; None = every line hard
    line_runs = None
    if bidi:
        from fontrx.font.uax9 import mirror_cp
        from fontrx.font.uax9 import resolve as _bidi_resolve

        # explicit directional formatting characters are removed from
        # display (UAX#9 X9); ZWJ/ZWNJ and the rest of class BN stay in
        # the stream so the Arabic joiner still sees them
        controls = frozenset(range(0x202A, 0x202F)) | frozenset(
            range(0x2066, 0x206A))
        line_runs = []
        shaped_lines = []
        comp_lines = []
        for line, cps in zip(lines, cp_lines):
            bl = _bidi_resolve(list(cps), rtl)
            parts: list[int] = []
            line_comps: list[int] = []
            extents: list[tuple[int, int, int]] = []
            idx = [i for i in range(len(cps))
                   if cps[i] not in controls]
            k = 0
            while k < len(idx):
                lvl = bl.levels[idx[k]]
                j = k
                while j < len(idx) and bl.levels[idx[j]] == lvl:
                    j += 1
                # UAX#9 L4: mirrored forms at odd levels; fonts missing
                # the mirrored pair keep the original glyph rather than
                # degrading to .notdef
                seg = []
                for i in idx[k:j]:
                    g = line[i]
                    cp = cps[i]
                    if lvl % 2 and mirror_cp(cp) != cp:
                        g = (int(font.charmap.glyph_index(
                            mirror_cp(cp))) or g)
                    seg.append(g)
                shaped = _shape_stream(
                    seg, [cps[i] for i in idx[k:j]])
                if _morx_active:
                    # AAT substitutions run per level run (ligatures/
                    # machines never cross direction boundaries)
                    shaped = _morx.apply(shaped, vertical=vertical,
                                         features=aat_features)
                    _shape_stream.last_comps = [0] * len(shaped)
                extents.append(
                    (len(parts), len(parts) + len(shaped), lvl)
                )
                parts.extend(shaped)
                line_comps.extend(_shape_stream.last_comps)
                k = j
            shaped_lines.append(parts)
            comp_lines.append(line_comps)
            line_runs.append(extents)
        lines = shaped_lines
        if wrap_width is not None and not vertical:
            # wrap INSIDE bidi (UAX#9 model: line breaking happens on
            # the LOGICAL order, then L2 reorders each broken line):
            # the index-returning wrapper breaks each paragraph's
            # shaped logical stream at UAX#14 opportunities, and the
            # level runs + ligature components slice along the same
            # indices so reordering/positioning see consistent lines
            space = int(font.charmap.glyph_index(0x20))
            _cpc: dict[int, int] = {}

            def _cp_of_bidi(gid: int) -> int:
                if gid not in _cpc:
                    c = font.charmap.char_for_glyph(gid)
                    _cpc[gid] = int(c) if c is not None else -1
                return _cpc[gid]

            hyph = int(font.charmap.glyph_index(0x2D)) or int(
                font.charmap.glyph_index(0x2010))
            nl: list = []
            nc: list = []
            nr: list = []
            hard_breaks = []
            for parts, lcomps, extents in zip(
                    shaped_lines, comp_lines, line_runs):
                levels = [0] * len(parts)
                for s, e, lvl in extents:
                    for i in range(s, e):
                        levels[i] = lvl
                idx_lines, hard = _wrap_lines(
                    [parts], wrap_width, space, _adv, _cp_of_bidi,
                    hyphen_gid=hyph, return_indices=True)
                for ids, hflag in zip(idx_lines, hard):
                    gids: list[int] = []
                    comps: list[int] = []
                    lvls: list[int] = []
                    for i in ids:
                        if i < 0:  # materialized soft hyphen: it
                            # takes the preceding glyph's level
                            gids.append(hyph)
                            comps.append(0)
                            lvls.append(lvls[-1] if lvls else 0)
                        else:
                            gids.append(parts[i])
                            comps.append(lcomps[i])
                            lvls.append(levels[i])
                    runs: list[tuple[int, int, int]] = []
                    k = 0
                    while k < len(lvls):
                        j = k
                        while j < len(lvls) and lvls[j] == lvls[k]:
                            j += 1
                        runs.append((k, j, lvls[k]))
                        k = j
                    nl.append(gids)
                    nc.append(comps)
                    nr.append(runs)
                    hard_breaks.append(hflag)
            lines, comp_lines, line_runs = nl, nc, nr
    elif tags or any(
            _is_indic_cp(c) or _is_thai_cp(c)
            or 0x1780 <= c <= 0x17FF or 0x1000 <= c <= 0x109F
            or _is_hangul_cp(c) or _is_use_cp(c)
            for cps in cp_lines for c in cps):
        shaped_lines = []
        comp_lines = []
        for line, cps in zip(lines, cp_lines):
            shaped_lines.append(_shape_stream(line, cps))
            comp_lines.append(list(_shape_stream.last_comps))
        lines = shaped_lines
    else:
        comp_lines = None

    # AAT fonts: morx metamorphosis applies when the font has no GSUB
    # (the HarfBuzz preference order) — the chains' default feature
    # flags drive the machines, like hb_shape with no feature list.
    # Under bidi the machines ran per level run inside the block above.
    if not bidi and _morx_active:
        lines = [_morx.apply(line, vertical=vertical,
                             features=aat_features)
                 for line in lines]
        comp_lines = None  # streams changed; comps are stale

    if wrap_width is not None and not vertical and line_runs is None:
        space = int(font.charmap.glyph_index(0x20))
        # Break opportunities come from the full UAX#14 engine over
        # the glyph stream's codepoints (charmap reverse scan, cached
        # per gid; unmapped glyphs — e.g. ligatures — classify AL, so
        # no opportunity appears inside them).
        _cp_cache: dict[int, int] = {}

        def cp_of(gid: int) -> int:
            if gid not in _cp_cache:
                c = font.charmap.char_for_glyph(gid)
                _cp_cache[gid] = int(c) if c is not None else -1
            return _cp_cache[gid]

        hyphen = int(font.charmap.glyph_index(0x2D)) or int(
            font.charmap.glyph_index(0x2010))
        lines, hard_breaks = _wrap_lines(
            lines, wrap_width, space, _adv, cp_of,
            hyphen_gid=hyphen)
        comp_lines = None  # wrap reshuffles lines; comps are stale

    # dedup pass (by glyph index: ligature glyphs have no codepoint)
    slot_of: dict[int, int] = {}
    glyphs = []
    widths = []
    slot_ymax: list[int] = []
    slot_chars: list[int] = []
    for line in lines:
        for gid in line:
            if gid >= 0 and gid not in slot_of:
                slot_of[gid] = len(glyphs)
                g = font.load_glyph(gid)
                if oblique:
                    from fontrx.font.glyph import shear_glyph

                    g = shear_glyph(g, oblique)
                glyphs.append(g)
                widths.append(int(_adv(gid)))
                slot_ymax.append(int(g.box.y_max))
                c = font.charmap.char_for_glyph(gid)
                slot_chars.append(int(c) if c is not None else -1)

    # GPOS positioning engine: resolves to a GposShaper when requested
    # (or when kern/marks flags fold in) and the font has the features
    positioner = None
    if positioning is not None:
        ptags = tuple(positioning)
        if kern:
            vk = b"vkrn" if vertical else b"kern"
            if vk not in ptags:
                ptags += (vk,)
        if marks and not vertical:
            ptags += tuple(
                t for t in (b"mark", b"mkmk") if t not in ptags
            )
        positioner = font.positioner(ptags) if ptags else None
        if positioner is not None:
            # variable fonts: GPOS VariationIndex deltas resolve at the
            # current design location
            positioner.var_coords = getattr(font, "_var_coords", None)

    if vertical:
        return _layout_vertical(
            font, lines, slot_of, glyphs, widths, slot_ymax, slot_chars,
            pad_batch_to, positioner, line_runs,
            letter_spacing, word_spacing,
        )

    if line_height is None:
        # hhea metrics (MVAR-varied on variable fonts); callers can
        # override in font units (CSS line-height in absolute terms)
        if hasattr(font, "varied_metric"):
            line_height = (
                font.varied_metric(b"hasc", font.info.ascent)
                - font.varied_metric(b"hdsc", font.info.descent)
                + font.varied_metric(b"hlgp", font.info.line_gap)
            )
        else:
            line_height = (
                font.info.ascent - font.info.descent
                + font.info.line_gap
            )
    kern_table = font.kerning if kern and positioner is None else None
    mark_table = (
        font.mark_positioning if marks and positioner is None else None
    )
    mkmk_table = font.mark_to_mark if marks and positioner is None else None
    gdef = (getattr(font, "gdef", None)
            if marks and positioner is None else None)

    def _is_mark_glyph(gid: int, slot: int) -> bool:
        # hb's GDEF glyph class when the font has one, else the
        # synthesized class from the Unicode general category (hb
        # marks Mn/Me as GDEF class 3 when GDEF is absent)
        if gdef is not None:
            return gdef.is_mark(gid)
        c = slot_chars[slot]
        return c > 0 and unicodedata.category(chr(c)) in ("Mn", "Me")

    def _extra(slot: int) -> float:
        # CSS tracking: letter spacing widens every advance cell, word
        # spacing additionally widens space glyphs; the extra lives
        # INSIDE the box so mirroring/bidi keep pair gaps intact
        e = letter_spacing
        if word_spacing and slot_chars[slot] == 0x20:
            e += word_spacing
        return e

    instances: list[Instance] = []
    max_x = 0.0
    line_ends: list[float] = []
    line_spans: list[tuple[int, int]] = []
    if hard_breaks is None:
        hard_breaks = [True] * len(lines)
    if positioner is not None:
        for line_no, line in enumerate(lines):
            pen_y = -line_no * float(line_height)
            pos = _positions_itemized(
                positioner, line, [widths[slot_of[g]] for g in line],
                (comp_lines[line_no]
                 if comp_lines is not None
                 and line_no < len(comp_lines) else None),
                [slot_chars[slot_of[g]] if g >= 0 else 0x20
                 for g in line],
            )
            pen_x = 0.0
            line_start = len(instances)
            boxes: list = []
            pens: list[float] = []       # pen position per box
            box_of_idx: dict[int, int] = {}
            # tracking applies per typographic unit: the extra joins
            # the pen only after a base's zero-advance attached marks
            # placed (their GPOS offsets anchor against the unspaced
            # advance), and rides the base's box for mirroring
            pending = 0.0
            pending_box = -1
            for idx, gid in enumerate(line):
                if gid < 0:
                    continue  # invisible: no instance, no box
                adv = float(pos.x_advance[idx])
                if adv != 0.0 and pending:
                    pen_x += pending
                    if pending_box >= 0:
                        boxes[pending_box] += pending
                    pending = 0.0
                instances.append(Instance(
                    slot_of[gid],
                    pen_x + float(pos.x_offset[idx]),
                    pen_y + float(pos.y_offset[idx]),
                ))
                box_of_idx[idx] = len(boxes)
                pens.append(pen_x)
                boxes.append(adv)
                pen_x += adv
                if adv != 0.0:
                    pending = _extra(slot_of[gid])
                    pending_box = len(boxes) - 1
                max_x = max(max_x, pen_x)
            if pending:
                pen_x += pending
                if pending_box >= 0:
                    boxes[pending_box] += pending
                max_x = max(max_x, pen_x)
            # attached marks ride their base's advance box under the
            # direction pass: rewrite their box as (base_x, base_w) —
            # the same bookkeeping the legacy mark path records (mkmk
            # chains resolve to the ROOT base)
            att = getattr(pos, "attach_to", None)
            if att is not None and (rtl or line_runs is not None):
                for idx, k in box_of_idx.items():
                    p = int(att[idx])
                    if p < 0:
                        continue
                    seen = set()
                    while p >= 0 and int(att[p]) >= 0 and p not in seen:
                        seen.add(p)
                        p = int(att[p])
                    kb = box_of_idx.get(p)
                    if kb is not None and not isinstance(
                            boxes[kb], tuple):
                        boxes[k] = (pens[kb], boxes[kb])
            if rtl or line_runs is not None:
                # box mirror (GPOS ran on the logical stream);
                # attached marks travel inside their base's box
                _apply_line_direction(
                    instances, line_start, boxes, pen_x, rtl,
                    line_runs[line_no] if line_runs is not None
                    else None,
                )
                max_x = max(max_x, pen_x)
            line_ends.append(pen_x)
            line_spans.append((line_start, len(instances)))
    else:
        for line_no, line in enumerate(lines):
            pen_x = 0.0
            pen_y = -line_no * float(line_height)
            prev_gid: int | None = None
            prev_x = 0.0  # pen position of the previous BASE glyph
            prev_w = 0.0
            last_mark: tuple[int, float, float] | None = None
            line_start = len(instances)
            # per instance: advance-box width, or (base_x, base_w) for
            # attached marks — the bookkeeping RTL mirroring needs
            boxes = []
            # kerx format-1 contextual kerning: per-position pen
            # deltas (inserted BEFORE each glyph, the hb-pinned
            # semantics) on top of the pairwise lookups
            ctx = (kern_table.contextual_deltas(line)
                   if kern_table is not None
                   and hasattr(kern_table, "contextual_deltas")
                   and line else None)
            has_attach = (kern_table is not None
                          and hasattr(kern_table, "attach_offsets")
                          and line)
            pen_log: list[float] = []
            for idx, gid in enumerate(line):
                if gid < 0:
                    continue  # invisible: no instance, no box
                slot = slot_of[gid]
                if ctx is not None:
                    pen_x += float(ctx[idx])
                if marks and prev_gid is not None:
                    # stacked diacritics first: attach to the previous
                    # MARK (mkmk), else to the base (mark); neither
                    # advances the pen, and the base stays "previous"
                    # for kerning
                    d = None
                    if mkmk_table is not None and last_mark is not None:
                        d = mkmk_table.attach(last_mark[0], gid)
                        if d is not None:
                            mx = last_mark[1] + d[0]
                            my = last_mark[2] + d[1]
                    if d is None and mark_table is not None:
                        d = mark_table.attach(prev_gid, gid)
                        if d is not None:
                            mx, my = prev_x + d[0], pen_y + d[1]
                    if d is not None:
                        instances.append(Instance(slot, mx, my))
                        boxes.append((prev_x, prev_w))
                        last_mark = (gid, mx, my)
                        continue
                    if _is_mark_glyph(gid, slot):
                        # hb's BY_GDEF_LATE zero-widthing with offset
                        # adjust: a mark no attachment table covers
                        # still consumes no pen advance, its ink
                        # shifted back by its own advance (x_offset -=
                        # x_advance in hb) so old-style fonts with
                        # pre-positioned mark outlines overlay the base
                        mx = pen_x - float(widths[slot])
                        my = pen_y
                        instances.append(Instance(slot, mx, my))
                        boxes.append((prev_x, prev_w))
                        last_mark = (gid, mx, my)
                        continue
                if kern_table is not None and prev_gid is not None:
                    # .reshape(-1)[0]: the flattened GPOS lookup
                    # returns a length-1 array for scalar inputs
                    # (NumPy deprecates float() on ndim>0)
                    pen_x += float(np.asarray(
                        kern_table.lookup(prev_gid, gid)
                    ).reshape(-1)[0])
                instances.append(Instance(slot, pen_x, pen_y))
                if has_attach:
                    pen_log.append(pen_x)
                adv = float(widths[slot]) + _extra(slot)
                boxes.append(adv)
                prev_x = pen_x
                prev_w = adv
                pen_x += adv
                max_x = max(max_x, pen_x)
                prev_gid = gid
                last_mark = None
            if has_attach and len(pen_log) == len(line):
                # kerx format-4 anchor attachment: pure position
                # offsets computed against the ACTUAL pens (pair
                # kerning, contextual deltas and tracking included —
                # hb attaches after its kerning passes too)
                adx, ady = kern_table.attach_offsets(line, pen_log)
                for k in range(len(line)):
                    if adx[k] or ady[k]:
                        inst = instances[line_start + k]
                        instances[line_start + k] = Instance(
                            inst.glyph_slot,
                            inst.x + float(adx[k]),
                            inst.y + float(ady[k]))
            if rtl or line_runs is not None:
                _apply_line_direction(
                    instances, line_start, boxes, pen_x, rtl,
                    line_runs[line_no] if line_runs is not None
                    else None,
                )
                max_x = max(max_x, pen_x)
            line_ends.append(pen_x)
            line_spans.append((line_start, len(instances)))

    # alignment post-pass: uniform line shifts (right/center) or
    # space-cell stretching (justify; skips paragraph-final lines —
    # rtl/bidi lines stretch in VISUAL order since direction
    # reordering already ran) — marks follow their bases contiguously
    # in instance order, so cumulative shifts after spaces move whole
    # clusters rigidly
    line_geom = [(0.0, w) for w in line_ends]
    # kashida environment: the form-gid -> connector-sides map from
    # the font's own positional lookups plus the tatweel glyph that
    # will tile the widened junctions (both required; the slot is
    # created lazily on the first junction actually stretched)
    kash_env = None
    if (kashida and align == "justify"
            and getattr(font, "arabic_shaper", None) is not None):
        _sides = font.arabic_shaper.connection_sides()
        _tw_gid = int(font.charmap.glyph_index(0x0640))
        _tw_adv = float(_adv(_tw_gid)) if _tw_gid else 0.0
        if _sides and _tw_gid and _tw_adv > 0.0:
            kash_env = (_sides, _tw_gid, _tw_adv)
    gid_of_slot = ({v: k for k, v in slot_of.items()}
                   if kash_env is not None else None)

    def _tw_slot() -> int:
        gid = kash_env[1]
        if gid in slot_of:
            return slot_of[gid]
        slot_of[gid] = len(glyphs)
        g = font.load_glyph(gid)
        if oblique:
            from fontrx.font.glyph import shear_glyph

            g = shear_glyph(g, oblique)
        glyphs.append(g)
        widths.append(int(_adv(gid)))
        slot_ymax.append(int(g.box.y_max))
        slot_chars.append(0x0640)
        return slot_of[gid]

    if align != "left" and line_ends:
        target = (wrap_width if wrap_width is not None
                  else max(line_ends))
        for li, ((s_, e_), w) in enumerate(zip(line_spans, line_ends)):
            if align in ("right", "center"):
                shift = (target - w) / (2.0 if align == "center"
                                        else 1.0)
                for k in range(s_, e_):
                    inst = instances[k]
                    instances[k] = Instance(
                        inst.glyph_slot, inst.x + shift, inst.y)
                line_geom[li] = (shift, w)
                max_x = max(max_x, shift + w)
            elif align == "justify":
                spaces = {k for k in range(s_, e_)
                          if slot_chars[instances[k].glyph_slot]
                          == 0x20}
                hard = li < len(hard_breaks) and hard_breaks[li]
                # kashida points: junctions where two positional-form
                # glyphs render joined, grouped into connected words —
                # stretch at the junction nearest each word's final
                # letter (its LEFTMOST junction: RTL words end at the
                # left), widening to every junction when the slack per
                # point would exceed three tatweel widths
                kash_sel: list[float] = []
                if (kash_env is not None and not hard and target > w
                        and (rtl or line_runs is not None)):
                    chains = _kashida_chains(
                        instances, s_, e_, widths, gid_of_slot,
                        kash_env[0])
                    if chains:
                        tw_adv = kash_env[2]
                        pref = [c[0] for c in chains]
                        kash_sel = pref
                        every = [x for c in chains for x in c]
                        if (len(every) > len(pref)
                                and (target - w)
                                / (len(spaces) + len(pref))
                                > 3.0 * tw_adv):
                            kash_sel = every
                if target <= w or hard or not (spaces or kash_sel):
                    # paragraph-final lines (hard \n or the text end)
                    # never justify — an RTL base keeps them flush at
                    # ITS start edge (the right margin), like CSS
                    # text-align: justify with direction: rtl
                    if rtl and target > w:
                        for k in range(s_, e_):
                            inst = instances[k]
                            instances[k] = Instance(
                                inst.glyph_slot,
                                inst.x + (target - w), inst.y)
                        line_geom[li] = (target - w, w)
                        max_x = max(max_x, target)
                    continue
                per = (target - w) / (len(spaces) + len(kash_sel))
                if rtl or line_runs is not None:
                    # direction-reordered lines: instances hold VISUAL
                    # positions, so stretch in visual order — each
                    # glyph shifts right by one `per` for every stretch
                    # point (space-cell center, or kashida junction —
                    # nudged left an epsilon so the junction's RIGHT
                    # glyph moves) left of its own box edge (marks
                    # share their base's edge, so clusters move
                    # rigidly; both margins end up flush)
                    import bisect

                    coords = sorted(
                        [instances[k].x
                         + float(widths[instances[k].glyph_slot]) / 2.0
                         for k in spaces]
                        + [x - 1e-6 for x in kash_sel])
                    for k in range(s_, e_):
                        inst = instances[k]
                        n = bisect.bisect_left(coords, inst.x)
                        instances[k] = Instance(
                            inst.glyph_slot, inst.x + n * per, inst.y)
                    if kash_sel:
                        # tile each widened junction with tatweels that
                        # overlap their neighbors (and each other) so
                        # the baseline stroke stays continuous
                        tw_adv = kash_env[2]
                        tslot = _tw_slot()
                        pen_y = -li * float(line_height)
                        for xj in kash_sel:
                            n = bisect.bisect_left(coords, xj - 1e-6)
                            left = xj + n * per
                            cnt = max(1, -int(-per // tw_adv))
                            if cnt == 1:
                                xs = [left + (per - tw_adv) / 2.0]
                            else:
                                step = (per - tw_adv) / (cnt - 1)
                                xs = [left + i * step
                                      for i in range(cnt)]
                            for x in xs:
                                instances.append(
                                    Instance(tslot, x, pen_y))
                else:
                    cum = 0.0
                    for k in range(s_, e_):
                        inst = instances[k]
                        instances[k] = Instance(
                            inst.glyph_slot, inst.x + cum, inst.y)
                        if k in spaces:
                            cum += per
                line_geom[li] = (0.0, target)
                max_x = max(max_x, target)

    extra_gids: list[int] = []
    if underline or strikethrough:
        for g, syn_gid, places in _decoration_bars(
                font, line_geom, float(line_height), underline,
                strikethrough):
            slot = len(glyphs)
            glyphs.append(g)
            widths.append(0)
            slot_ymax.append(int(g.box.y_max))
            slot_chars.append(-1)
            extra_gids.append(syn_gid)
            for x, y in places:
                instances.append(Instance(slot, x, y))

    batch = pack_glyphs(glyphs, widths, pad_batch_to=pad_batch_to)
    return TextLayout(
        batch=batch,
        slot_chars=slot_chars,
        slot_gids=list(slot_of) + extra_gids,
        instances=instances,
        width=max_x,
        height=len(lines) * line_height,
    )


# Unicode Default_Ignorable_Code_Point (the ranges real text uses);
# unmapped members render invisible instead of .notdef tofu
_DEFAULT_IGNORABLE = (
    (0x00AD, 0x00AD), (0x034F, 0x034F), (0x061C, 0x061C),
    (0x115F, 0x1160), (0x17B4, 0x17B5), (0x180B, 0x180F),
    (0x200B, 0x200F), (0x202A, 0x202E), (0x2060, 0x206F),
    (0x3164, 0x3164), (0xFE00, 0xFE0F), (0xFEFF, 0xFEFF),
    (0xFFA0, 0xFFA0), (0x1BCA0, 0x1BCA3), (0x1D173, 0x1D17A),
    (0xE0000, 0xE0FFF),
)


def _is_default_ignorable(cp: int) -> bool:
    return any(lo <= cp <= hi for lo, hi in _DEFAULT_IGNORABLE)


def _kashida_chains(
    instances, s_: int, e_: int, widths, gid_of_slot, sides,
    tol: float = 1.0,
) -> list[list[float]]:
    """Kashida junctions for one laid-out line, grouped into connected
    words.  Operates on VISUAL positions (the line has already been
    direction-reordered): a junction exists between two x-adjacent
    nonzero-advance glyphs whose forms render joined — the left glyph
    connects rightward (``"R"`` in its connector sides) and the right
    glyph leftward (``"L"``) and their boxes touch within ``tol`` font
    units (GPOS-kerned or tracked pairs don't join, so they don't
    stretch).  Returns one list per maximal joined run, each the run's
    junction x coordinates (the right glyph's origin) left-to-right;
    zero-advance marks are skipped (they ride their base's box)."""
    bases = []
    for k in range(s_, e_):
        inst = instances[k]
        w = float(widths[inst.glyph_slot])
        if w > 0.0:
            bases.append((inst.x, w, inst.glyph_slot))
    bases.sort(key=lambda t: t[0])
    chains: list[list[float]] = []
    cur: list[float] = []
    for (ax, aw, aslot), (bx, _bw, bslot) in zip(bases, bases[1:]):
        sa = sides.get(gid_of_slot.get(aslot, -1), "")
        sb = sides.get(gid_of_slot.get(bslot, -1), "")
        if "R" in sa and "L" in sb and abs(ax + aw - bx) <= tol:
            cur.append(bx)
        elif cur:
            chains.append(cur)
            cur = []
    if cur:
        chains.append(cur)
    return chains


def _is_arabic_cp(cp: int) -> bool:
    from fontrx.font.arabic import is_arabic

    return is_arabic(cp)


def _is_indic_cp(cp: int) -> bool:
    from fontrx.font.indic import is_indic

    return is_indic(cp)


def _indic_scripts():
    from fontrx.font.indic import INDIC_SCRIPTS

    return INDIC_SCRIPTS


def _is_thai_cp(cp: int) -> bool:
    from fontrx.font.thai import is_thai_lao

    return is_thai_lao(cp)


def _is_hangul_cp(cp: int) -> bool:
    from fontrx.font.hangul import is_hangul

    return is_hangul(cp)


def _is_use_cp(cp: int) -> bool:
    from fontrx.font.use import is_use_cp

    return is_use_cp(cp)


def _use_scripts():
    from fontrx.font.use import USE_SCRIPTS

    return USE_SCRIPTS


def _positions_itemized(positioner, line, advs, lig, cps):
    """GPOS over one shaped line, itemized into script runs (the
    HarfBuzz model: each run applies only ITS script's registered
    features — e.g. DejaVu registers mark but NOT mkmk under `hebr`,
    so pointed Hebrew must not run the mkmk lookups).  Fonts without
    a usable ScriptList keep the tag-global scan; kerning never
    crosses a script boundary (hb splits runs the same way)."""
    if not getattr(positioner, "scripts", None):
        return positioner.positions(line, advs, lig_comps=lig)
    from fontrx.font.script import itemize

    runs = itemize(cps)
    if len(runs) <= 1:
        stag = runs[0][2] if runs else None
        return positioner.positions(
            line, advs, script=stag or b"DFLT", lig_comps=lig)
    parts = []
    for s, e, stag in runs:
        parts.append((s, positioner.positions(
            line[s:e], advs[s:e], script=stag or b"DFLT",
            lig_comps=lig[s:e] if lig is not None else None)))
    from fontrx.font.gpos_shape import GlyphPositions

    att = []
    for s, p in parts:
        a = (p.attach_to if p.attach_to is not None
             else np.full(len(p.x_offset), -1, np.int64))
        att.append(np.where(a >= 0, a + s, -1))
    return GlyphPositions(
        x_offset=np.concatenate([p.x_offset for _, p in parts]),
        y_offset=np.concatenate([p.y_offset for _, p in parts]),
        x_advance=np.concatenate([p.x_advance for _, p in parts]),
        y_advance=np.concatenate([p.y_advance for _, p in parts]),
        attach_to=np.concatenate(att),
    )


def _mirror_line(instances, start, boxes, width, origin: float = 0.0):
    """Mirror a span of instances in place by reversing its sequence
    of ADVANCE BOXES within ``[origin, origin + width)``: box
    ``[x, x+a]`` lands at ``[2*origin + W - x - a, ...]`` with the
    glyph content unmirrored inside it.  Kerning/positioning already
    ran on the logical stream, so pair gaps stay between the same
    glyph pairs.  Attached marks (recorded as ``(base_x, base_w)``)
    travel with their base's box, preserving their offset within it."""
    m = 2.0 * origin + width
    for k, box in enumerate(boxes):
        inst = instances[start + k]
        if isinstance(box, tuple):  # mark: ride the base's box
            base_x, base_w = box
            new_base = m - base_x - base_w
            x = new_base + (inst.x - base_x)
        else:
            x = m - inst.x - box
        instances[start + k] = Instance(inst.glyph_slot, x, inst.y)


def _span_extent(instances, start, boxes, s, e):
    """(origin, width) of the advance-box span covering glyph indices
    ``[s, e)`` of one placed line."""
    origin = None
    end = None
    for k in range(s, e):
        box = boxes[k]
        if isinstance(box, tuple):
            lo, hi = box[0], box[0] + box[1]
        else:
            x = instances[start + k].x
            lo, hi = x, x + box
        origin = lo if origin is None else min(origin, lo)
        end = hi if end is None else max(end, hi)
    if origin is None:
        return 0.0, 0.0
    return origin, end - origin


def _apply_line_direction(
    instances, start, boxes, pen_x, rtl, runs
):
    """Post-placement direction handling for one line: whole-line
    mirror for plain RTL; UAX#9 L2 for bidi.

    ``runs`` is ``None`` (plain path) or ``[(s, e, level)]`` per-glyph
    level runs from the full bidi resolution.  L2 is applied
    geometrically: from the highest level down to the lowest odd
    level, every maximal glyph span at >= that level reverses its own
    advance-box extent.  Reversal preserves intra-pair gaps (kerning
    ran on the logical stream), and mark box tuples are rewritten into
    each mirrored frame so nested reversals compose — this handles
    arbitrary level nesting (embeddings/isolates), not just the
    two-level base/counter-base case."""
    if runs is None:
        if rtl:
            _mirror_line(instances, start, boxes, pen_x)
        return
    levels = [0] * len(boxes)
    for s, e, lvl in runs:
        for k in range(s, e):
            levels[k] = lvl
    if not levels:
        return
    boxes = list(boxes)  # local copy: mark tuples get rewritten
    hi = max(levels)
    lo_odd = min(lv | 1 for lv in levels)
    for lvl in range(hi, lo_odd - 1, -1):
        k = 0
        while k < len(levels):
            if levels[k] < lvl:
                k += 1
                continue
            j = k
            while j < len(levels) and levels[j] >= lvl:
                j += 1
            o, w = _span_extent(instances, start, boxes, k, j)
            _mirror_line(instances, start + k, boxes[k:j], w, origin=o)
            m = 2.0 * o + w
            for t in range(k, j):
                b = boxes[t]
                if isinstance(b, tuple):
                    boxes[t] = (m - b[0] - b[1], b[1])
            k = j


def _bar_glyph(w: int, y0: int, y1: int):
    """A synthetic rectangle glyph (decoration bar) spanning
    ``[0, w] x [y0, y1]`` in font units — composited like any other
    glyph through every render path."""
    from fontrx.font.glyph import Box, Contour, Glyph, _normalize_contour

    pts = np.array([[0, y0], [w, y0], [w, y1], [0, y1]], np.int32)
    on = np.array([True] * 4)
    return Glyph(Box(0, y0, w, y1),
                 (Contour(_normalize_contour(pts, on)),))


def _decoration_bars(font, line_geom, line_height, underline,
                     strikethrough):
    """Underline/strikeout bars per laid-out line: a list of
    ``(Glyph, synthetic_gid, [(x, y) placements])``.  Positions come
    from ``Font.decoration_metrics`` (``post`` underlinePosition = the
    TOP of the bar per the OT spec; ``OS/2`` strikeout likewise),
    varied through the MVAR ``undo``/``unds``/``stro``/``strs`` tags
    on variable fonts.  The synthetic gid is a negative CRC of the bar
    geometry so page tile caches key decorations apart from real
    glyphs (and apart from differently-sized bars)."""
    import zlib

    u_pos, u_thick, s_pos, s_thick = font.decoration_metrics
    if hasattr(font, "varied_metric"):
        u_pos = font.varied_metric(b"undo", u_pos)
        u_thick = font.varied_metric(b"unds", u_thick)
        s_pos = font.varied_metric(b"stro", s_pos)
        s_thick = font.varied_metric(b"strs", s_thick)
    kinds = []
    if underline:
        kinds.append((int(round(u_pos)), max(int(round(u_thick)), 1)))
    if strikethrough:
        kinds.append((int(round(s_pos)), max(int(round(s_thick)), 1)))
    cache: dict = {}
    out = []
    for line_no, (x0, w) in enumerate(line_geom):
        w = int(round(w))
        if w <= 0:
            continue
        for pos, thick in kinds:
            key = (w, pos, thick)
            if key not in cache:
                g = _bar_glyph(w, pos - thick, pos)
                gid = -1 - (zlib.crc32(repr(key).encode()) & 0x7FFFFFFF)
                cache[key] = (g, gid, [])
                out.append(cache[key])
            cache[key][2].append((x0, -line_no * line_height))
    return out


def _apply_column_direction(instances, start, tops, heights, runs):
    """UAX#9 L2 along a vertical column: the y-axis twin of
    :func:`_apply_line_direction`.  Glyph cells occupy
    ``[top - height, top]`` (the pen drops, so tops decrease down the
    column); from the highest level down to the lowest odd level every
    maximal span at >= that level reflects its cells within the span's
    drop extent, shifting each glyph rigidly with its cell.  Nested
    reversals compose by rewriting cell tops into each mirrored frame
    (the same scheme the horizontal path uses for its boxes)."""
    if not runs:
        return
    levels = [0] * len(tops)
    for s, e, lvl in runs:
        for k in range(s, e):
            levels[k] = lvl
    if not levels:
        return
    tops = list(tops)
    hi_lvl = max(levels)
    lo_odd = min(lv | 1 for lv in levels)
    for lvl in range(hi_lvl, lo_odd - 1, -1):
        k = 0
        while k < len(levels):
            if levels[k] < lvl:
                k += 1
                continue
            j = k
            while j < len(levels) and levels[j] >= lvl:
                j += 1
            span_hi = max(tops[t] for t in range(k, j))
            span_lo = min(tops[t] - heights[t] for t in range(k, j))
            m = span_lo + span_hi
            for t in range(k, j):
                new_top = m - (tops[t] - heights[t])
                inst = instances[start + t]
                instances[start + t] = Instance(
                    inst.glyph_slot, inst.x,
                    inst.y + (new_top - tops[t]))
                tops[t] = new_top
            k = j


def _wrap_lines(lines, wrap_width, space_gid, advance_of, cp_of=None,
                hyphen_gid: int = 0, return_indices: bool = False):
    """Greedy wrap over shaped glyph streams: break each line at the
    last break opportunity that keeps the advance sum within
    ``wrap_width``:

    - a full UAX#14 break opportunity (:mod:`fontrx.font.uax14`,
      LB2-LB31 with the ICU tailorings, differential-exact against
      ICU's ubrk) computed over the stream's codepoints via ``cp_of``
      (unmapped glyphs classify AL, so ligatures never split);
      breaking spaces are consumed (trailing spaces hang, then drop);
    - a SOFT HYPHEN (U+00AD): invisible in the stream, it registers a
      break that, when taken, materializes ``hyphen_gid`` at the line
      end (registered only while the hyphen itself still fits).

    An over-budget run breaks after itself rather than mid-glyph.

    Returns ``(lines, hard_breaks)``: flag True for lines that end at
    an ORIGINAL hard break (the paragraph-final fragments — justify
    exempts them).

    ``return_indices=True`` (single input line only): yields lists of
    indices into that line instead of glyph ids, with ``-1`` marking a
    materialized hyphen — the bidi wrapper uses this to slice levels
    and ligature components alongside the glyphs."""
    from fontrx.font.uax14 import break_opportunities

    out: list[list[int]] = []       # index lists (-1 = hyphen)
    src: list[list[int]] = []       # the source line per output line
    hard: list[bool] = []
    hyphen_w = advance_of(hyphen_gid) if hyphen_gid else 0.0
    for line in lines:
        cps = [cp_of(g) if cp_of is not None else -1 for g in line]
        allowed = break_opportunities(cps)
        cur: list[int] = []
        cur_w = 0.0
        last_break = -1       # index in cur AFTER which to break
        mode = "boundary"     # boundary | shy
        for idx, gid in enumerate(line):
            cp = cps[idx]
            if cp == 0xAD:
                # soft hyphen: zero display width; a break opportunity
                # while the materialized hyphen would still fit
                if cur and cur_w + hyphen_w <= wrap_width:
                    last_break = len(cur) - 1
                    mode = "shy"
                continue
            w = advance_of(gid)
            # the boundary BEFORE this glyph is the UAX#14 opportunity
            # — register it ahead of the overflow check so a full line
            # breaks right before the overflowing glyph.  The boundary
            # after a soft hyphen stays with the shy registration
            # above (it materializes the hyphen; a plain boundary
            # would not).
            if cur and allowed[idx] and cps[idx - 1] != 0xAD:
                last_break = len(cur) - 1
                mode = "boundary"
            if (cur and cur_w + w > wrap_width and gid != space_gid
                    and last_break >= 0):
                # break at the opportunity; the remainder restarts the
                # line.  With none (one over-budget word) the line
                # overflows until the next — glyphs never split.
                broken = cur[: last_break + 1]
                if mode == "shy" and hyphen_gid:
                    broken = broken + [-1]
                rest = cur[last_break + 1:]
                out.append(broken)
                src.append(line)
                hard.append(False)  # a soft (wrap) break
                cur = rest
                last_break = -1
                mode = "boundary"
                cur_w = float(sum(advance_of(line[i]) for i in cur))
            cur.append(idx)
            cur_w += w
        out.append(cur)
        src.append(line)
        hard.append(True)   # the original line's final fragment
    # drop trailing spaces left hanging at line ends by the breaks
    for k, (ids, line) in enumerate(zip(out, src)):
        while ids and ids[-1] >= 0 and line[ids[-1]] == space_gid \
                and space_gid != 0:
            ids.pop()
        out[k] = ids
    if return_indices:
        assert len(lines) == 1
        return out, hard
    return [
        [hyphen_gid if i < 0 else line[i] for i in ids]
        for ids, line in zip(out, src)
    ], hard


def _layout_vertical(
    font, lines, slot_of, glyphs, widths, slot_ymax, slot_chars,
    pad_batch_to, positioner=None, line_runs=None,
    letter_spacing: float = 0.0, word_spacing: float = 0.0,
):
    """Vertical (top-to-bottom, columns right-to-left) placement — see
    ``layout_text(vertical=True)``.  The pen drop and hanging origin
    come from ``vhea``/``vmtx``; fonts without them fall back to one em
    of advance with the hhea ascent as the hanging origin.

    ``line_runs`` (from ``bidi=True``): UAX#9 level runs per column.
    L2 reordering applies along the COLUMN axis — the vertical analog
    of the horizontal advance-box reversal: an RTL run's glyph cells
    reverse their top-to-bottom order within the run's drop extent
    (sideways-rotated display of embedded RTL text reads bottom-to-top
    in vertical columns), each glyph traveling rigidly with its cell so
    in-cell offsets (tsb hang, GPOS placement) are preserved."""
    vm = font.vertical_metrics
    upem = font.info.units_per_em
    if vm is not None:
        vhea, adv_h, tsb = vm
        # MVAR vertical tags vary the column pitch on variable fonts
        if hasattr(font, "varied_metric"):
            pitch = float(
                font.varied_metric(b"vasc", vhea.ascent)
                - font.varied_metric(b"vdsc", vhea.descent)
                + font.varied_metric(b"vlgp", vhea.line_gap)
            )
        else:
            pitch = float(vhea.ascent - vhea.descent + vhea.line_gap)
        if pitch <= 0:
            pitch = float(upem)
    else:
        adv_h = tsb = None
        pitch = float(upem)
    # VVAR: per-glyph vertical advance/top-side-bearing deltas
    if hasattr(font, "varied_advance_height"):
        def _vadv(gid):
            return float(font.varied_advance_height(gid, int(adv_h[gid])))

        def _vtsb(gid):
            return float(font.varied_tsb(gid, int(tsb[gid])))
    else:
        def _vadv(gid):
            return float(adv_h[gid])

        def _vtsb(gid):
            return float(tsb[gid])

    n_cols = max(len(lines), 1)
    width = n_cols * pitch
    instances: list[Instance] = []
    max_drop = 0.0
    for col_no, line in enumerate(lines):
        x_axis = width - (col_no + 0.5) * pitch  # columns right-to-left
        pen_y = 0.0
        # GPOS vertical positioning (vkrn): y_advance deltas tighten
        # the pen drop; placement offsets shift the glyph in-cell
        pos = None
        if positioner is not None:
            pos = positioner.positions(
                line, [widths[slot_of[g]] for g in line]
            )
        col_start = len(instances)
        tops: list[float] = []
        heights: list[float] = []
        # tracking widens the drop cell (the vertical advance box),
        # deferred past zero-advance attached marks so their
        # placement anchors against the unspaced drop; the extra
        # rides the previous real cell for column-axis reordering
        v_pending = 0.0
        v_pending_cell = -1
        for idx, gid in enumerate(line):
            if gid < 0:
                continue  # invisible sentinel
            slot = slot_of[gid]
            if adv_h is not None:
                ah = _vadv(gid)
            else:
                ah = float(upem)
            if pos is not None:
                ah += float(pos.y_advance[idx])
            if ah != 0.0 and v_pending:
                pen_y -= v_pending
                if v_pending_cell >= 0:
                    heights[v_pending_cell] += v_pending
                v_pending = 0.0
            if adv_h is not None:
                # glyph bbox top hangs at pen - topSideBearing
                y_off = pen_y - _vtsb(gid) - float(slot_ymax[slot])
            else:
                y_off = pen_y - float(font.info.ascent)
            x_off = x_axis - widths[slot] / 2.0
            if pos is not None:
                x_off += float(pos.x_offset[idx])
                y_off += float(pos.y_offset[idx])
            instances.append(Instance(slot, x_off, y_off))
            tops.append(pen_y)
            heights.append(ah)
            pen_y -= ah
            if ah != 0.0:
                v_pending = letter_spacing
                if word_spacing and slot_chars[slot] == 0x20:
                    v_pending += word_spacing
                v_pending_cell = len(heights) - 1
        if v_pending:
            pen_y -= v_pending
            if v_pending_cell >= 0:
                heights[v_pending_cell] += v_pending
        if line_runs is not None and col_no < len(line_runs):
            _apply_column_direction(
                instances, col_start, tops, heights,
                line_runs[col_no])
        max_drop = max(max_drop, -pen_y)

    batch = pack_glyphs(glyphs, widths, pad_batch_to=pad_batch_to)
    return TextLayout(
        batch=batch,
        slot_chars=slot_chars,
        slot_gids=list(slot_of),
        instances=instances,
        width=width,
        height=max_drop,
    )
