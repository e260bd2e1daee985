"""Native GPOS lookup walk — flattener + ctypes dispatch.

The positioning engine's per-glyph Python walk
(:meth:`fontrx.font.gpos_shape.GposShaper.positions`) is the host-side
layout bottleneck at page scale (docs/RESULTS.md "Layout-engine
throughput": 13.8k chars/s full-GPOS).  This module flattens each
eligible lookup's subtables into one int32 blob (cached on the Lookup)
and runs the walk in ``gpos_walk.cc`` — byte-identical position
streams, qualified by the hb differentials running over both paths.

Eligibility (per lookup, decided once at flatten time + per call):

- subtable types 1 (single), 2 (pair, both formats), 4 (mark-to-base),
  5 (mark-to-ligature), 6 (mark-to-mark).  Cursive (3) and contextual
  (7/8) lookups stay in Python.
- the call carries no variation store and no hint context — exactly
  the case where ``_PosState.add``/``anchor`` resolve every
  ValueRecord/anchor to its bare design-unit integers, so the
  flattened base values ARE the applied values.
"""

from __future__ import annotations

import ctypes

import numpy as np


def _i(*vals):
    return list(vals)


def _flat_coverage(cov) -> list[int]:
    n = len(cov.start)
    out = [n]
    out += [int(x) for x in cov.start]
    out += [int(x) for x in cov.end]
    out += [int(x) for x in cov.cov_base]
    return out


def _flat_classdef(cd) -> list[int]:
    if cd is None:
        return [0]
    if cd.per_glyph is not None:
        vals = [int(x) for x in cd.per_glyph]
        return [1, int(cd.start[0]), len(vals)] + vals
    n = len(cd.start)
    return ([2, n] + [int(x) for x in cd.start]
            + [int(x) for x in cd.end] + [int(x) for x in cd.cls_value])


def _flat_value(v) -> list[int]:
    # _VarValue/_VarAnchor degrade to their base integers without a
    # var/hint context (see _PosState.add) — tuple indexing gives
    # exactly those
    return [int(v[0]), int(v[1]), int(v[2]), int(v[3])]


def _flat_anchor(a) -> list[int]:
    if a is None:
        return [0, 0, 0]
    return [1, int(a[0]), int(a[1])]


def _flatten_subtable(s_type: int, sub) -> list[int] | None:
    from fontrx.font import gpos_shape as gs

    if s_type == 1 and isinstance(sub, gs._SinglePos):
        vals: list[int] = []
        for v in sub.values:
            vals += _flat_value(v)
        body = (_flat_coverage(sub.coverage)
                + [1 if sub.shared else 0, len(sub.values)] + vals)
        return [1, len(body)] + body
    if s_type == 2 and isinstance(sub, gs._PairPosGlyphs):
        offs = [0]
        pairs: list[int] = []
        for ps in sub.pair_sets:
            for gid2, v1, v2 in ps:
                pairs += [int(gid2)] + _flat_value(v1) + _flat_value(v2)
            offs.append(offs[-1] + len(ps))
        body = (_flat_coverage(sub.coverage)
                + [len(sub.pair_sets)] + offs + pairs)
        return [21, len(body)] + body
    if s_type == 2 and isinstance(sub, gs._PairPosClasses):
        mat: list[int] = []
        for v1, v2 in sub.matrix:
            mat += _flat_value(v1) + _flat_value(v2)
        body = (_flat_coverage(sub.coverage)
                + _flat_classdef(sub.cd1) + _flat_classdef(sub.cd2)
                + [int(sub.n_c2), len(sub.matrix)] + mat)
        return [22, len(body)] + body
    if s_type in (4, 6) and isinstance(sub, gs._MarkAttach):
        n_marks = len(sub.mark_classes)
        if len(sub.mark_anchors) < n_marks:
            return None
        n_class = max(
            (len(r) for r in sub.base_anchors), default=0)
        n_class = max(n_class,
                      max((int(k) + 1 for k in sub.mark_classes),
                          default=0))
        anch: list[int] = []
        for row in sub.base_anchors:
            for k in range(n_class):
                anch += _flat_anchor(row[k] if k < len(row) else None)
        body = (
            _flat_coverage(sub.mark_cov)
            + [n_marks]
            + [int(k) for k in sub.mark_classes]
            + [int(a[0]) for a in sub.mark_anchors[:n_marks]]
            + [int(a[1]) for a in sub.mark_anchors[:n_marks]]
            + _flat_coverage(sub.base_cov)
            + [len(sub.base_anchors), n_class]
            + anch
        )
        return [s_type, len(body)] + body
    if s_type == 5 and isinstance(sub, gs._MarkLigAttach):
        n_marks = len(sub.mark_classes)
        if len(sub.mark_anchors) < n_marks:
            return None
        n_class = 0
        for comps in sub.lig_attach:
            for row in comps:
                n_class = max(n_class, len(row))
        n_class = max(n_class,
                      max((int(k) + 1 for k in sub.mark_classes),
                          default=0))
        comp_off = [0]
        anch = []
        for comps in sub.lig_attach:
            for row in comps:
                for k in range(n_class):
                    anch += _flat_anchor(row[k] if k < len(row) else None)
            comp_off.append(comp_off[-1] + len(comps))
        body = (
            _flat_coverage(sub.mark_cov)
            + [n_marks]
            + [int(k) for k in sub.mark_classes]
            + [int(a[0]) for a in sub.mark_anchors[:n_marks]]
            + [int(a[1]) for a in sub.mark_anchors[:n_marks]]
            + _flat_coverage(sub.lig_cov)
            + [len(sub.lig_attach)] + comp_off + [n_class]
            + anch
        )
        return [5, len(body)] + body
    return None


def flatten_lookup(lookup) -> np.ndarray | None:
    """One int32 blob for ``gpos_apply_lookup``, or ``None`` when the
    lookup has constructs the native walk doesn't cover.  Cached by
    the caller on the Lookup object."""
    if len(lookup.subtables) > 64:
        return None
    words = [
        int(lookup.flags),
        -1 if lookup.mark_filter_set is None else int(lookup.mark_filter_set),
        len(lookup.subtables),
    ]
    for s_type, sub in lookup.subtables:
        flat = _flatten_subtable(s_type, sub)
        if flat is None:
            return None
        words += flat
    return np.asarray(words, np.int32)


def flatten_gdef(gdef) -> np.ndarray | None:
    """GDEF blob (classes + mark-attach classes + filtering sets), or
    ``None`` for no GDEF (nothing skips)."""
    if gdef is None:
        return None
    if len(gdef.mark_sets) > 64:
        # the C++ parser caps filtering sets; unheard-of in practice
        raise ValueError("too many mark filtering sets for native walk")
    words = _flat_classdef(gdef.glyph_classes)
    words += _flat_classdef(gdef.mark_attach)
    words.append(len(gdef.mark_sets))
    for cov in gdef.mark_sets:
        words += _flat_coverage(cov)
    return np.asarray(words, np.int32)


class NativeRun:
    """Shared state for one ``positions()`` call: the accumulator
    arrays live HERE across consecutive native lookups (the page path
    calls positions per line — rebuilding lists/arrays per lookup was
    ~40% of the wrapped-layout profile), syncing with the Python
    ``_PosState`` lists only around Python-walk fallbacks."""

    __slots__ = ("lib", "buf", "n", "lig", "xp", "yp", "xa", "ya",
                 "att_p", "att_dx", "att_dy", "synced", "gblob_ptr")

    def __init__(self, lib, buf_arr, lig_arr, st):
        self.lib = lib
        self.buf = buf_arr
        self.n = len(buf_arr)
        self.lig = lig_arr
        self.xp = self.yp = self.xa = self.ya = None
        self.att_p = np.empty(self.n, np.int32)
        self.att_dx = np.zeros(self.n, np.int32)
        self.att_dy = np.zeros(self.n, np.int32)
        self.synced = False

    def _pull(self, st):
        if not self.synced:
            self.xp = np.asarray(st.xp, np.int32)
            self.yp = np.asarray(st.yp, np.int32)
            self.xa = np.asarray(st.xa, np.int32)
            self.ya = np.asarray(st.ya, np.int32)
            self.synced = True

    def push(self, st):
        """Write the array state back into the Python lists (before a
        Python-walk lookup, and once at the end of the order)."""
        if self.synced:
            st.xp[:] = self.xp.tolist()
            st.yp[:] = self.yp.tolist()
            st.xa[:] = self.xa.tolist()
            st.ya[:] = self.ya.tolist()
            self.synced = False

    def run(self, gblob, blob, st) -> bool:
        self._pull(st)
        self.att_p.fill(-2)
        rc = self.lib.gpos_apply_lookup(
            None if gblob is None else gblob.ctypes.data,
            blob.ctypes.data, self.buf.ctypes.data,
            ctypes.c_long(self.n),
            None if self.lig is None else self.lig.ctypes.data,
            self.xp.ctypes.data, self.yp.ctypes.data,
            self.xa.ctypes.data, self.ya.ctypes.data,
            self.att_p.ctypes.data, self.att_dx.ctypes.data,
            self.att_dy.ctypes.data,
        )
        if rc != 0:
            return False
        hit = np.nonzero(self.att_p != -2)[0]
        if len(hit):
            ap, adx, ady = self.att_p, self.att_dx, self.att_dy
            for i in hit:
                st.attach[int(i)] = (int(ap[i]), int(adx[i]),
                                     int(ady[i]))
        return True


def start_run(shaper, buf_arr: np.ndarray, st,
              lig_arr: np.ndarray | None):
    """A :class:`NativeRun` for this positions() call, or ``None``
    when the native walk cannot apply at all (library missing,
    var/hint context active)."""
    from fontrx.native import _load

    if st.var_ctx is not None or st.hint_ctx is not None:
        return None
    lib = _load()
    if lib is None or not hasattr(lib, "gpos_apply_lookup"):
        return None
    return NativeRun(lib, buf_arr, lig_arr, st)


def apply_lookup(shaper, li: int, lookup, run, st) -> bool:
    """Run lookup ``li`` natively, accumulating into ``run``/``st``.
    Returns False (caller falls back to Python) when the lookup is
    ineligible."""
    blob = shaper._native_blobs.get(li, False)
    if blob is False:
        try:
            blob = flatten_lookup(lookup)
        except Exception:
            blob = None
        shaper._native_blobs[li] = blob
    if blob is None:
        return False
    gblob = shaper._native_gdef
    if gblob is False:
        try:
            gblob = flatten_gdef(shaper.gdef)
        except Exception:
            gblob = "disabled"
        shaper._native_gdef = gblob
    if isinstance(gblob, str):  # GDEF unrepresentable: no native walk
        return False
    return run.run(gblob, blob, st)
