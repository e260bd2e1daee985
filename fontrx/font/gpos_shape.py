"""General GPOS positioning engine — lookup types 1–9.

A capability extension (the reference has no positioning at all; its
pen only adds ``advance_width``, ``src/Appli.zig:343-351``).  Where
:mod:`fontrx.font.gpos` flattens PairPos into one kerning lookup and
Mark(ToBase|ToMark) into ad-hoc attachment tables, this module
implements the full OpenType GPOS application model:

- lookups selected by feature tag are applied **in LookupList order**
  over the (already GSUB-shaped) glyph-id stream;
- lookup types: 1 single adjustment, 2 pair adjustment (formats 1+2),
  3 cursive attachment, 4 mark-to-base, 5 mark-to-ligature, 6
  mark-to-mark, 7 contextual, 8 chained contextual (all formats, via
  the shared :func:`fontrx.font.shape.parse_context_subtable` — the
  wire format is byte-identical to GSUB types 5/6), 9 extension
  (unwrapped at parse);
- ``lookupFlag`` glyph skipping via :mod:`fontrx.font.gdef`, shared
  with the GSUB engine (:class:`GsubShaper`'s match machinery);
- positioning state is (x_placement, y_placement, x_advance,
  y_advance) per glyph; mark/cursive attachments are recorded as
  parent links and resolved after all lookups run, so a later lookup
  adjusting a base's advance still moves its attached marks.

Variable-font positioning (round 3): VariationIndex device records in
ValueRecords AND anchors resolve against GDEF v1.3's
ItemVariationStore at the current design location (variable kerning,
mark and cursive anchors).

Hinted positioning (round 3, after the TrueType bytecode interpreter
landed): plain **device tables** in ValueRecords and format-3 anchors
resolve to per-ppem pixel deltas, and **format-2 contour-point
anchors** resolve to the grid-fitted outline point's position — both
through an optional ``hint`` context (:class:`HintContext`) passed to
:meth:`GposShaper.positions`.  Without a hint context they degrade to
the bare design-unit coordinates, which is the spec's prescribed
behavior for unhinted rendering.  Mark-to-ligature attaches to the
GSUB-threaded component when the shaping pass recorded one
(``GsubShaper.last_lig_comps`` -> ``positions(lig_comps=)``), falling
back to the last component with a usable anchor.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from fontrx.font.gdef import GdefTable
from fontrx.font.gpos import ClassDef, Coverage, DeviceTable, _parse_anchor
from fontrx.font.shape import (
    _ContextSubst,
    _MAX_NESTING,
    GsubShaper,
    parse_context_subtable,
)
from fontrx.utils.reader import BigEndianReader

_GPOS_EXTENSION = 9

# ValueRecord format bits (OpenType GPOS §valueFormat)
_VF_X_PLACEMENT = 0x0001
_VF_Y_PLACEMENT = 0x0002
_VF_X_ADVANCE = 0x0004
_VF_Y_ADVANCE = 0x0008

ZERO_VALUE = (0, 0, 0, 0)


class _VarValue(tuple):
    """A ValueRecord that carries VariationIndex references and/or
    plain device tables: indexes like a plain (xp, yp, xa, ya) 4-tuple
    (and compares equal to one), with ``.var`` = per-field
    (outer, inner) ItemVariationStore indices or None — resolved
    against the GDEF store at the current design location (variable
    kerning) — and ``.dev`` = per-field :class:`DeviceTable` or None —
    resolved to per-ppem pixel deltas when a hint context is active."""

    def __new__(cls, vals, var, dev=None):
        self = super().__new__(cls, vals)
        self.var = var
        self.dev = dev
        return self


def _variation_index(data: bytes, pos: int):
    """(outer, inner) when the device table at ``pos`` is a
    VariationIndex (deltaFormat 0x8000), else None."""
    try:
        outer, inner, fmt = struct.unpack_from(">HHH", data, pos)
    except struct.error:
        return None
    return (outer, inner) if fmt == 0x8000 else None


def _parse_value(
    r: BigEndianReader, fmt: int, dev_base: int | None = None
) -> tuple[int, int, int, int]:
    """(x_placement, y_placement, x_advance, y_advance) design units.
    With ``dev_base`` (the offset device offsets are relative to),
    VariationIndex device tables are captured into a :class:`_VarValue`
    (variable fonts vary their kerning through them) and plain device
    tables are captured as per-ppem pixel deltas (hinted rendering)."""
    xp = r.i16() if fmt & _VF_X_PLACEMENT else 0
    yp = r.i16() if fmt & _VF_Y_PLACEMENT else 0
    xa = r.i16() if fmt & _VF_X_ADVANCE else 0
    ya = r.i16() if fmt & _VF_Y_ADVANCE else 0
    var = [None, None, None, None]
    dev = [None, None, None, None]
    for k, bit in enumerate((0x10, 0x20, 0x40, 0x80)):
        if fmt & bit:
            off = r.u16()
            if off and dev_base is not None:
                var[k] = _variation_index(r.data, dev_base + off)
                if var[k] is None:
                    dev[k] = DeviceTable.parse(r.data, dev_base + off)
    if any(v is not None for v in var) or any(d is not None for d in dev):
        return _VarValue((xp, yp, xa, ya), tuple(var), tuple(dev))
    return xp, yp, xa, ya


class _VarAnchor(tuple):
    """An (x, y) anchor carrying VariationIndex references (``.var`` =
    ((outer, inner) | None, (outer, inner) | None)) — resolved against
    the GDEF store at positioning time (variable mark/cursive anchors)
    — and/or plain device tables (``.dev``, per-axis
    :class:`DeviceTable` or None) — per-ppem pixel nudges resolved
    when a hint context is active."""

    def __new__(cls, xy, var, dev=None):
        self = super().__new__(cls, xy)
        self.var = var
        self.dev = dev
        return self


class _PointAnchor(tuple):
    """A format-2 anchor: (x, y) plus ``.point``, the glyph outline
    point index whose grid-fitted position overrides the bare
    coordinates when a hint context is active (TrueType hinting moves
    outline points; the anchor rides along).  Out-of-range points and
    unhinted rendering use (x, y), per spec."""

    def __new__(cls, xy, point):
        self = super().__new__(cls, xy)
        self.point = point
        return self


def _anchor_at(data: bytes, base: int, off: int) -> tuple[int, int] | None:
    if not off:
        return None
    pos = base + off
    try:
        fmt, x, y = struct.unpack_from(">Hhh", data, pos)
    except struct.error:
        return None
    if fmt == 2:
        # format 2: contour-point anchor — the hinted outline point's
        # position replaces (x, y) when grid fitting is active
        try:
            (point,) = struct.unpack_from(">H", data, pos + 6)
        except struct.error:
            return int(x), int(y)
        return _PointAnchor((int(x), int(y)), int(point))
    if fmt == 3:
        # format 3: x/y device offsets (from the Anchor table start);
        # VariationIndex ones vary the anchor with the design
        # location; plain ones nudge it per ppem (hinting)
        try:
            xo, yo = struct.unpack_from(">HH", data, pos + 6)
        except struct.error:
            xo = yo = 0
        vx = _variation_index(data, pos + xo) if xo else None
        vy = _variation_index(data, pos + yo) if yo else None
        dx = (DeviceTable.parse(data, pos + xo)
              if xo and vx is None else None)
        dy = (DeviceTable.parse(data, pos + yo)
              if yo and vy is None else None)
        if (vx is not None or vy is not None
                or dx is not None or dy is not None):
            return _VarAnchor((int(x), int(y)), (vx, vy), (dx, dy))
    return int(x), int(y)


@dataclass(frozen=True, slots=True)
class HintContext:
    """Size context for hinted positioning.

    Resolves plain device tables to their per-ppem pixel deltas and
    format-2 anchors to the grid-fitted outline point's position.
    Pixel quantities convert to design units at ``upem / ppem`` font
    units per pixel (float; consumers that re-scale to pixels recover
    the whole-pixel delta exactly).  Build one with
    ``Font.hint_context(ppem)``.
    """

    ppem: int
    upem: int
    # (gid, point_index) -> grid-fitted (x, y) in F26Dot6 px, or None
    point: object

    @property
    def units_per_px(self) -> float:
        return self.upem / self.ppem


# -- subtable models -------------------------------------------------------


@dataclass(frozen=True, slots=True)
class _SinglePos:
    """Type 1: one value (fmt 1) or per-coverage-index values (fmt 2)."""

    coverage: Coverage
    values: tuple[tuple[int, int, int, int], ...]
    shared: bool

    def value_for(self, gid: int):
        ci = int(self.coverage.rank([gid])[0])
        if ci < 0:
            return None
        if self.shared:
            return self.values[0]
        return self.values[ci] if ci < len(self.values) else None


@dataclass(frozen=True, slots=True)
class _PairPosGlyphs:
    """Type 2 format 1: per-first-glyph (second_gid, v1, v2) lists."""

    coverage: Coverage
    pair_sets: tuple[tuple[tuple[int, tuple, tuple], ...], ...]

    def values_for(self, first: int, second: int):
        ci = int(self.coverage.rank([first])[0])
        if not (0 <= ci < len(self.pair_sets)):
            return None
        for gid2, v1, v2 in self.pair_sets[ci]:
            if gid2 == second:
                return v1, v2
        return None


@dataclass(frozen=True, slots=True)
class _PairPosClasses:
    """Type 2 format 2: class matrix of (v1, v2)."""

    coverage: Coverage
    cd1: ClassDef
    cd2: ClassDef
    n_c2: int
    matrix: tuple  # flat [c1 * n_c2 + c2] -> (v1, v2)

    def values_for(self, first: int, second: int):
        if int(self.coverage.rank([first])[0]) < 0:
            return None
        c1 = int(self.cd1.class_of([first])[0])
        c2 = int(self.cd2.class_of([second])[0])
        idx = c1 * self.n_c2 + c2
        if 0 <= idx < len(self.matrix):
            return self.matrix[idx]
        return None


@dataclass(frozen=True, slots=True)
class _CursivePos:
    """Type 3: per-covered-glyph (entry, exit) anchors."""

    coverage: Coverage
    entry_exit: tuple  # [(entry|None, exit|None), ...]

    def anchors_for(self, gid: int):
        ci = int(self.coverage.rank([gid])[0])
        if 0 <= ci < len(self.entry_exit):
            return self.entry_exit[ci]
        return None


@dataclass(frozen=True, slots=True)
class _MarkAttach:
    """Types 4/6: MarkArray + per-base per-class anchors.  For type 6
    the "base" coverage is the Mark2 coverage."""

    mark_cov: Coverage
    mark_classes: tuple[int, ...]
    mark_anchors: tuple  # (x, y) per covered mark
    base_cov: Coverage
    base_anchors: tuple  # [base_ci][class] -> (x, y) | None

    def delta(self, base_gid: int, mark_gid: int, resolve=None):
        """(dx, dy) placing the mark's anchor onto the base's, or
        ``None``.  ``resolve`` maps (possibly variable / device /
        contour-point) anchors to concrete coordinates
        (``_PosState.anchor``); it receives the owning glyph id so
        contour-point anchors can look up the hinted outline."""
        mi = int(self.mark_cov.rank([mark_gid])[0])
        bi = int(self.base_cov.rank([base_gid])[0])
        if mi < 0 or bi < 0 or mi >= len(self.mark_classes):
            return None
        klass = self.mark_classes[mi]
        row = self.base_anchors[bi]
        if not (0 <= klass < len(row)) or row[klass] is None:
            return None
        res = resolve or (lambda a, gid=None: a)
        bx, by = res(row[klass], base_gid)
        mx, my = res(self.mark_anchors[mi], mark_gid)
        return bx - mx, by - my


@dataclass(frozen=True, slots=True)
class _MarkLigAttach:
    """Type 5: MarkArray + per-ligature per-component per-class
    anchors.  fontrx attaches to the last component (see module doc)."""

    mark_cov: Coverage
    mark_classes: tuple[int, ...]
    mark_anchors: tuple
    lig_cov: Coverage
    lig_attach: tuple  # [lig_ci][component][class] -> (x, y) | None

    def delta(self, lig_gid: int, mark_gid: int, component: int = 0,
              resolve=None):
        """``component``: 1-based ligature component the mark followed
        (threaded from GSUB ligature formation); 0 = unknown, which
        falls back to the last component with a usable anchor."""
        mi = int(self.mark_cov.rank([mark_gid])[0])
        li = int(self.lig_cov.rank([lig_gid])[0])
        if mi < 0 or li < 0 or mi >= len(self.mark_classes):
            return None
        klass = self.mark_classes[mi]
        comps = self.lig_attach[li]
        res = resolve or (lambda a, gid=None: a)
        mx, my = res(self.mark_anchors[mi], mark_gid)
        if 1 <= component <= len(comps):
            row = comps[component - 1]
            if 0 <= klass < len(row) and row[klass] is not None:
                bx, by = res(row[klass], lig_gid)
                return bx - mx, by - my
        for row in reversed(comps):  # last component with a usable anchor
            if 0 <= klass < len(row) and row[klass] is not None:
                bx, by = res(row[klass], lig_gid)
                return bx - mx, by - my
        return None


# -- positions output ------------------------------------------------------


@dataclass(slots=True)
class GlyphPositions:
    """Resolved per-glyph placement for one glyph run.

    - ``x_offset`` / ``y_offset``: design-unit displacement of the
      glyph from its pen position (includes mark/cursive attachment);
    - ``x_advance``: final pen advance per glyph (``hmtx`` width plus
      GPOS adjustments);
    - ``y_advance``: GPOS vertical-advance *delta* (for ``vkrn``-style
      features; base vertical advances live in ``vmtx``);
    - ``attach_to``: per-glyph index of the mark-attachment parent
      (-1 when unattached) — layout uses it to make attached marks
      ride their base's advance box under RTL mirroring / bidi L2.
    """

    x_offset: np.ndarray
    y_offset: np.ndarray
    x_advance: np.ndarray
    y_advance: np.ndarray
    attach_to: np.ndarray | None = None


@dataclass(slots=True)
class GposShaper(GsubShaper):
    """Feature-selected GPOS lookups, applied in LookupList order.

    Inherits the GSUB engine's lookup-walk machinery (GDEF flag
    skipping, sequence matching, shared contextual-rule model); only
    the subtable parser and the application semantics differ.
    """

    _EXTENSION_TYPE = _GPOS_EXTENSION

    def _parse_subtable(self, s_type: int, s_pos: int):
        r = BigEndianReader(self._data, s_pos)
        base = r.pos
        data = r.data
        if s_type == 1:
            fmt, cov_off, vfmt = r.unpack("HHH")
            cov = Coverage.parse(BigEndianReader(data, base + cov_off))
            if fmt == 1:
                return _SinglePos(
                    cov, (_parse_value(r, vfmt, dev_base=base),), True)
            if fmt == 2:
                n = r.u16()
                vals = tuple(
                    _parse_value(r, vfmt, dev_base=base)
                    for _ in range(n))
                return _SinglePos(cov, vals, False)
            return None
        if s_type == 2:
            fmt, cov_off, vf1, vf2 = r.unpack("HHHH")
            cov = Coverage.parse(BigEndianReader(data, base + cov_off))
            if fmt == 1:
                n_sets = r.u16()
                sets = []
                for so in r.u16_array(n_sets):
                    sr = BigEndianReader(data, base + int(so))
                    n_pairs = sr.u16()
                    pairs = []
                    for _ in range(n_pairs):
                        gid2 = sr.u16()
                        # device offsets are from the PairSet table
                        v1 = _parse_value(sr, vf1, dev_base=base + int(so))
                        v2 = _parse_value(sr, vf2, dev_base=base + int(so))
                        pairs.append((gid2, v1, v2))
                    sets.append(tuple(pairs))
                return _PairPosGlyphs(cov, tuple(sets))
            if fmt == 2:
                cd1_off, cd2_off, n_c1, n_c2 = r.unpack("HHHH")
                # a corrupt font can declare u16 x u16 classes (4.3e9
                # cells); with empty value formats each cell consumes no
                # bytes, so the loop would spin for minutes instead of
                # running off the data end — bound it (1M cells ≈ 515
                # fonts' worth of the largest real matrices seen)
                if n_c1 * n_c2 > 1_000_000:
                    raise ValueError(
                        f"implausible PairPos class matrix {n_c1}x{n_c2}"
                    )
                cd1 = ClassDef.parse(BigEndianReader(data, base + cd1_off))
                cd2 = ClassDef.parse(BigEndianReader(data, base + cd2_off))
                matrix = []
                for _ in range(n_c1 * n_c2):
                    v1 = _parse_value(r, vf1, dev_base=base)
                    v2 = _parse_value(r, vf2, dev_base=base)
                    matrix.append((v1, v2))
                return _PairPosClasses(cov, cd1, cd2, n_c2, tuple(matrix))
            return None
        if s_type == 3:
            fmt, cov_off, n = r.unpack("HHH")
            if fmt != 1:
                return None
            cov = Coverage.parse(BigEndianReader(data, base + cov_off))
            ee = []
            for _ in range(n):
                e_off, x_off = r.unpack("HH")
                ee.append((
                    _anchor_at(data, base, e_off),
                    _anchor_at(data, base, x_off),
                ))
            return _CursivePos(cov, tuple(ee))
        if s_type in (4, 6):
            fmt, m_cov_off, b_cov_off, n_classes, m_arr_off, b_arr_off = (
                r.unpack("HHHHHH")
            )
            if fmt != 1:
                return None
            m_cov = Coverage.parse(BigEndianReader(data, base + m_cov_off))
            b_cov = Coverage.parse(BigEndianReader(data, base + b_cov_off))
            classes, anchors = self._parse_mark_array(base + m_arr_off)
            br = BigEndianReader(data, base + b_arr_off)
            b_base = br.pos
            n_base = br.u16()
            offs = br.u16_array(n_base * n_classes)
            rows = tuple(
                tuple(
                    _anchor_at(data, b_base, int(offs[b * n_classes + k]))
                    for k in range(n_classes)
                )
                for b in range(n_base)
            )
            return _MarkAttach(m_cov, classes, anchors, b_cov, rows)
        if s_type == 5:
            fmt, m_cov_off, l_cov_off, n_classes, m_arr_off, l_arr_off = (
                r.unpack("HHHHHH")
            )
            if fmt != 1:
                return None
            m_cov = Coverage.parse(BigEndianReader(data, base + m_cov_off))
            l_cov = Coverage.parse(BigEndianReader(data, base + l_cov_off))
            classes, anchors = self._parse_mark_array(base + m_arr_off)
            lr = BigEndianReader(data, base + l_arr_off)
            l_base = lr.pos
            n_ligs = lr.u16()
            ligs = []
            for lo in lr.u16_array(n_ligs):
                ar = BigEndianReader(data, l_base + int(lo))
                a_base = ar.pos
                n_comp = ar.u16()
                offs = ar.u16_array(n_comp * n_classes)
                ligs.append(tuple(
                    tuple(
                        _anchor_at(data, a_base, int(offs[c * n_classes + k]))
                        for k in range(n_classes)
                    )
                    for c in range(n_comp)
                ))
            return _MarkLigAttach(m_cov, classes, anchors, l_cov, tuple(ligs))
        if s_type == 7:
            return parse_context_subtable(r, base, chained=False)
        if s_type == 8:
            return parse_context_subtable(r, base, chained=True)
        return None

    def _parse_mark_array(self, pos: int):
        mr = BigEndianReader(self._data, pos)
        m_base = mr.pos
        n_marks = mr.u16()
        classes = []
        anchors = []
        for _ in range(n_marks):
            klass, a_off = mr.unpack("HH")
            classes.append(int(klass))
            anchors.append(
                _anchor_at(self._data, m_base, a_off) or (0, 0)
            )
        return tuple(classes), tuple(anchors)

    # -- application -------------------------------------------------------

    def positions(
        self,
        glyphs: list[int],
        advance_widths: list[int] | np.ndarray,
        script: bytes | None = None,
        lang: bytes | None = None,
        lig_comps: list[int] | None = None,
        hint: HintContext | None = None,
    ) -> GlyphPositions:
        """Apply the selected lookups over the glyph run and resolve
        attachments into final placements (see :class:`GlyphPositions`).
        With ``script`` given, lookups come from that script's language
        system (plus its required feature) instead of the tag-global
        scan.  ``lig_comps`` (from ``GsubShaper.last_lig_comps``)
        carries 1-based ligature-component indices for marks that rode
        inside formed ligatures — mark-to-ligature attaches to the
        recorded component instead of the last one.  ``hint`` (a
        :class:`HintContext`) activates per-ppem device deltas and
        contour-point anchors for grid-fitted rendering."""
        n = len(glyphs)
        st = _PosState(
            xp=[0] * n, yp=[0] * n,
            xa=[int(a) for a in advance_widths], ya=[0] * n,
            attach=[None] * n, cursive=[None] * n,
        )
        st.hint_ctx = hint
        if lig_comps is not None and len(lig_comps) == n:
            st.lig_comps = lig_comps
        # VariationIndex resolution: GDEF's ItemVariationStore at the
        # font's current normalized design location (set by layout via
        # ``var_coords``) — variable kerning/placement deltas
        ivs = (getattr(self.gdef, "item_var_store", None)
               if self.gdef is not None else None)
        coords = getattr(self, "var_coords", None)
        if ivs is not None and coords is not None:
            st.var_ctx = (ivs, coords)
        if script is not None:
            order = self.lookup_indices_for(self.tags, script, lang)
        else:
            order = self.order
        self._apply_order(glyphs, order, st)
        return st.resolve()

    def _apply_order(self, glyphs, order, st: "_PosState") -> None:
        """Apply lookups in LookupList order, each through the native
        walk (fontrx/native/gpos_walk.py — byte-identical for the
        static lookup types) when eligible, else the Python walk.  The
        accumulator arrays live in one NativeRun across consecutive
        native lookups; they sync with the _PosState lists only around
        Python-walk fallbacks and at the end."""
        from fontrx.native import gpos_walk

        run = None
        tried = False
        for li in order:
            lk = self._lookup(li)
            if not lk:
                continue
            if not tried:
                tried = True
                buf_arr = np.asarray(glyphs, np.int32)
                lc = getattr(st, "lig_comps", None)
                lig_arr = (np.asarray(lc, np.int32)
                           if lc is not None and len(lc) == len(glyphs)
                           else None)
                run = gpos_walk.start_run(self, buf_arr, st, lig_arr)
            if run is not None and gpos_walk.apply_lookup(
                    self, li, lk, run, st):
                continue
            if run is not None:
                run.push(st)
            self._apply_lookup(glyphs, lk, st, depth=0)
        if run is not None:
            run.push(st)

    def positions_features(
        self,
        glyphs: list[int],
        advance_widths,
        tags: tuple[bytes, ...],
        hint: HintContext | None = None,
    ) -> GlyphPositions:
        """Like :meth:`positions` but over an ad-hoc feature-tag subset
        (tags outside the parsed table are ignored)."""
        n = len(glyphs)
        st = _PosState(
            xp=[0] * n, yp=[0] * n,
            xa=[int(a) for a in advance_widths], ya=[0] * n,
            attach=[None] * n, cursive=[None] * n,
        )
        st.hint_ctx = hint
        order = sorted({li for t in tags for li in self.features.get(t, ())})
        self._apply_order(glyphs, order, st)
        return st.resolve()

    def _apply_lookup(self, buf, lookup: Lookup, st: "_PosState", depth: int):
        i = 0
        while i < len(buf):
            if self._skips(buf[i], lookup):
                i += 1
                continue
            nxt = self._apply_at(buf, i, lookup, st, depth)
            i = nxt if nxt is not None else i + 1

    def _apply_at(
        self, buf, i: int, lookup: Lookup, st: "_PosState", depth: int
    ) -> int | None:
        gid = buf[i]
        for s_type, sub in lookup.subtables:
            if s_type == 1:
                v = sub.value_for(gid)
                if v is not None:
                    st.add(i, v)
                    return i + 1
            elif s_type == 2:
                j = self._next(buf, i, lookup)
                if j is None:
                    continue
                # any found pair is a match — including explicit all-zero
                # pairs, which fonts use in a format-1 subtable as
                # exceptions overriding a later class matrix in the same
                # lookup (first-subtable-match-wins per spec)
                vv = sub.values_for(gid, buf[j])
                if vv is not None:
                    st.add(i, vv[0])
                    st.add(j, vv[1])
                    # per the OpenType model, an empty second value
                    # record lets the second glyph start the next pair;
                    # a non-empty one consumes it
                    return j + 1 if vv[1] != ZERO_VALUE else j
            elif s_type == 3:
                j = self._next(buf, i, lookup)
                if j is None:
                    continue
                a_i = sub.anchors_for(gid)
                a_j = sub.anchors_for(buf[j])
                if a_i and a_j and a_i[1] and a_j[0]:
                    # OpenType RIGHT_TO_LEFT lookup flag (0x0001): the
                    # flag swaps which glyph of the pair moves
                    # vertically — LTR cursive keeps the FIRST glyph on
                    # the baseline (the second chains from it); RTL
                    # cursive (Nastaliq-style fonts) keeps the LAST
                    # (the first chains backward from the second)
                    st.cursive[j] = (
                        i, st.anchor(a_i[1], gid),
                        st.anchor(a_j[0], buf[j]),
                        bool(lookup.flags & 0x0001),
                    )
                    return j
            elif s_type == 4:
                p = self._prev_base(buf, i)
                if p is not None:
                    d = sub.delta(buf[p], gid, resolve=st.anchor)
                    if d is not None:
                        st.attach[i] = (p, d[0], d[1])
                        return i + 1
            elif s_type == 5:
                p = self._prev_base(buf, i)
                if p is not None:
                    lc = getattr(st, "lig_comps", None)
                    d = sub.delta(
                        buf[p], gid, lc[i] if lc is not None else 0,
                        resolve=st.anchor)
                    if d is not None:
                        st.attach[i] = (p, d[0], d[1])
                        return i + 1
            elif s_type == 6:
                # mark2 = the nearest preceding glyph not skipped by
                # the lookup's flags (markAttachmentType / filtering
                # sets select which mark chain this lookup stacks on)
                p = self._prev(buf, i, lookup)
                if p is not None:
                    d = sub.delta(buf[p], gid, resolve=st.anchor)
                    if d is not None:
                        st.attach[i] = (p, d[0], d[1])
                        return i + 1
            elif s_type in (7, 8):
                nxt = self._apply_context(buf, i, lookup, sub, st, depth)
                if nxt is not None:
                    return nxt
        return None

    def _prev_base(self, buf, i: int) -> int | None:
        """Nearest preceding non-mark glyph (the base search ignores
        marks regardless of lookup flags, per spec)."""
        j = i - 1
        while j >= 0:
            if self.gdef is None or not self.gdef.is_mark(buf[j]):
                return j
            j -= 1
        return None

    def _apply_context(
        self, buf, i: int, lookup: Lookup, sub: _ContextSubst,
        st: "_PosState", depth: int,
    ) -> int | None:
        if depth >= _MAX_NESTING:
            return None
        rules, bt_cd, in_cd, la_cd = self._context_rules(sub, buf[i])
        for rule in rules:
            items = rule.input_[1:] if sub.fmt == 3 else rule.input_
            pos = self._match_forward(buf, i, items, lookup, in_cd)
            if pos is None:
                continue
            all_pos = [i] + pos
            if rule.lookahead and self._match_forward(
                buf, all_pos[-1], rule.lookahead, lookup, la_cd
            ) is None:
                continue
            if rule.backtrack and not self._match_backward(
                buf, i, rule.backtrack, lookup, bt_cd
            ):
                continue
            # matched: positioning never changes buffer length, so no
            # position bookkeeping is needed (unlike the GSUB engine)
            for seq_idx, lk_idx in rule.records:
                if not (0 <= seq_idx < len(all_pos)):
                    continue
                nested = self._lookup(lk_idx)
                if nested is None:
                    continue
                self._apply_at(buf, all_pos[seq_idx], nested, st, depth + 1)
            return all_pos[-1] + 1
        return None

    # GSUB-only entry points are not meaningful on a GPOS table
    def apply(self, glyphs):  # pragma: no cover - misuse guard
        raise TypeError("GposShaper positions glyphs; use .positions()")


@dataclass(slots=True)
class _PosState:
    """Mutable positioning accumulator during lookup application."""

    xp: list[int]
    yp: list[int]
    xa: list[int]
    ya: list[int]
    # mark attachment: glyph i -> (parent index, dx, dy) anchor delta
    attach: list[tuple[int, int, int] | None]
    # cursive: second glyph j -> (first glyph i, exit anchor of i,
    # entry anchor of j, rtl flag)
    cursive: list[tuple[int, tuple, tuple, bool] | None]
    # 1-based ligature component per mark (GSUB-threaded), or None
    lig_comps: list[int] | None = None
    # (ItemVariationStore, normalized coords) for VariationIndex
    # resolution, or None for static positioning
    var_ctx: tuple | None = None
    # HintContext for plain device tables / contour-point anchors, or
    # None (unhinted: both degrade to bare coordinates, per spec)
    hint_ctx: "HintContext | None" = None

    def anchor(self, a, gid: int | None = None):
        """Resolve a (possibly variable / device / contour-point)
        anchor to concrete (x, y) design units.  ``gid`` is the glyph
        the anchor belongs to (contour-point anchors read its hinted
        outline)."""
        if a is None:
            return None
        point = getattr(a, "point", None)
        if point is not None:
            hc = self.hint_ctx
            if hc is not None and gid is not None:
                pt = hc.point(gid, point)
                if pt is not None:
                    # F26Dot6 px -> design units (64 units = 1 px)
                    s = hc.units_per_px / 64.0
                    return (pt[0] * s, pt[1] * s)
            return (a[0], a[1])
        var = getattr(a, "var", None)
        dev = getattr(a, "dev", None)
        if var is None and dev is None:
            return a
        x, y = a[0], a[1]
        if var is not None:
            x += self._dv(var[0])
            y += self._dv(var[1])
        if dev is not None:
            x += self._dd(dev[0])
            y += self._dd(dev[1])
        return (x, y)

    def _dv(self, vi) -> int:
        if vi is None or self.var_ctx is None:
            return 0
        ivs, coords = self.var_ctx
        try:
            d = ivs.delta(vi[0], vi[1], coords)
        except Exception:
            return 0
        return int(np.floor(d + 0.5))

    def _dd(self, dt) -> float:
        """Plain device delta in design units (whole pixels scaled by
        upem/ppem; 0 without a hint context)."""
        if dt is None or self.hint_ctx is None:
            return 0
        d = dt.delta(self.hint_ctx.ppem)
        return d * self.hint_ctx.units_per_px if d else 0

    def add(self, i: int, v) -> None:
        var = getattr(v, "var", None)
        dev = getattr(v, "dev", None)
        if var is not None or dev is not None:
            for k, acc in enumerate((self.xp, self.yp, self.xa, self.ya)):
                val = v[k]
                if var is not None:
                    val += self._dv(var[k])
                if dev is not None:
                    val += self._dd(dev[k])
                acc[i] += val
            return
        self.xp[i] += v[0]
        self.yp[i] += v[1]
        self.xa[i] += v[2]
        self.ya[i] += v[3]

    def resolve(self) -> GlyphPositions:
        n = len(self.xp)
        xo = np.array(self.xp, np.float64)
        yo = np.array(self.yp, np.float64)
        xa = np.array(self.xa, np.float64)
        ya = np.array(self.ya, np.float64)

        # cursive attachment: the exit anchor of glyph i meets the
        # entry anchor of the following glyph j; i's advance shrinks
        # or grows to land the pen on its exit and j shifts back by
        # its entry (pen math runs on the logical stream in both
        # directions).  The VERTICAL chain depends on the lookup's
        # RIGHT_TO_LEFT flag: unset, j's baseline offset chains
        # forward from i's; set, i's chains BACKWARD from j's (so the
        # last glyph of an RTL cascade stays on the baseline) — the
        # same geometric constraint yo[i]+exit_y == yo[j]+entry_y,
        # solved for the other free variable
        for j in range(n):
            link = self.cursive[j]
            if link is None:
                continue
            i, exit_a, entry_a, rtl = link
            xa[i] = exit_a[0] + xo[i]
            d = entry_a[0] + xo[j]
            xa[j] -= d
            xo[j] -= d
            if not rtl:
                yo[j] = yo[i] + (exit_a[1] - entry_a[1])
        # RTL chains resolve back-to-front so each earlier glyph reads
        # its successor's FINAL baseline offset
        for j in range(n - 1, -1, -1):
            link = self.cursive[j]
            if link is None or not link[3]:
                continue
            i, exit_a, entry_a, _rtl = link
            yo[i] = yo[j] + (entry_a[1] - exit_a[1])

        # pen positions from final advances, then mark attachment in
        # buffer order (a mark's parent always precedes it, so parents
        # resolve first — mkmk chains accumulate correctly)
        pen = np.zeros(n + 1, np.float64)
        np.cumsum(xa, out=pen[1:])
        for i in range(n):
            link = self.attach[i]
            if link is None:
                continue
            p, dx, dy = link
            # attachment replaces the mark's own placement: final
            # absolute position = parent absolute position + anchor
            # delta (parents precede children in the buffer, so xo[p]
            # is already final — mkmk chains accumulate correctly)
            xo[i] = (pen[p] + xo[p] + dx) - pen[i]
            yo[i] = yo[p] + dy
            # attached glyphs consume no pen advance beyond their own
            # hmtx width (typically 0 for marks); fonts that rely on
            # mark widths keep them — fontrx does not zero advances

        parent = np.full(n, -1, np.int64)
        for i in range(n):
            if self.attach[i] is not None:
                parent[i] = self.attach[i][0]
        return GlyphPositions(
            x_offset=xo, y_offset=yo, x_advance=xa, y_advance=ya,
            attach_to=parent,
        )
