"""Native GSUB lookup walk — flattener + ctypes dispatch (the
substitution half of the host layout fast path; see gpos_walk.py).

Eligible lookups — every subtable of type 1 (single), 3 (alternate)
or 4 (ligature) — flatten into one int32 blob (cached per lookup
index on the shaper) and walk in ``gsub_walk.cc``, mutating the
glyph buffer and ligature-component side channel in place,
byte-identical to ``GsubShaper._apply_lookup``.  Multiple (type 2,
buffer-growing), contextual (5/6/7) and reverse-chain (8) lookups
fall back to the Python walk per lookup."""

from __future__ import annotations

import ctypes

import numpy as np

from fontrx.native.gpos_walk import _flat_coverage, flatten_gdef


def _flatten_subtable(s_type: int, sub) -> list[int] | None:
    from fontrx.font import shape as sh

    if s_type == 1 and isinstance(sub, sh._Single):
        if sub.delta is not None:
            body = (_flat_coverage(sub.coverage)
                    + [1, int(sub.delta), 0])
        else:
            subs = [int(g) for g in (sub.substitutes or ())]
            body = (_flat_coverage(sub.coverage)
                    + [0, 0, len(subs)] + subs)
        return [11, len(body)] + body
    if s_type == 3 and isinstance(sub, sh._Alternate):
        offs = [0]
        alts: list[int] = []
        for aset in sub.alternates:
            alts += [int(g) for g in aset]
            offs.append(len(alts))
        body = (_flat_coverage(sub.coverage)
                + [len(sub.alternates)] + offs + alts)
        return [13, len(body)] + body
    if s_type == 4 and isinstance(sub, sh._LigatureSubst):
        set_off = [0]
        rec_off = [0]
        recs: list[int] = []
        n_recs = 0
        for lset in sub.sets:
            for lig in lset:
                comps = [int(g) for g in lig.components]
                if len(comps) > 64:
                    return None
                recs += [int(lig.glyph), len(comps)] + comps
                rec_off.append(len(recs))
                n_recs += 1
            set_off.append(n_recs)
        body = (_flat_coverage(sub.coverage)
                + [len(sub.sets)] + set_off + [n_recs] + rec_off
                + recs)
        return [14, len(body)] + body
    return None


def flatten_lookup(lookup) -> np.ndarray | None:
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


class SubRun:
    """Array mirror of (buf, comp) for one apply() call: consecutive
    native lookups mutate the arrays in place; the lists sync only
    around Python-walk fallbacks and once at the end."""

    __slots__ = ("lib", "buf", "comp", "n", "synced")

    def __init__(self, lib):
        self.lib = lib
        self.buf = None
        self.comp = None
        self.n = 0
        self.synced = False

    def _pull(self, buf_list, comp_list):
        if not self.synced:
            self.buf = np.asarray(buf_list, np.int32)
            self.comp = (np.asarray(comp_list, np.int32)
                         if comp_list is not None else None)
            self.n = len(self.buf)
            self.synced = True

    def push(self, buf_list, comp_list):
        if self.synced:
            buf_list[:] = self.buf[: self.n].tolist()
            if comp_list is not None and self.comp is not None:
                comp_list[:] = self.comp[: self.n].tolist()
            self.synced = False

    def run(self, gblob, blob, buf_list, comp_list, alt_index) -> bool:
        self._pull(buf_list, comp_list)
        n = ctypes.c_long(self.n)
        rc = self.lib.gsub_apply_lookup(
            None if gblob is None else gblob.ctypes.data,
            blob.ctypes.data, self.buf.ctypes.data,
            None if self.comp is None else self.comp.ctypes.data,
            ctypes.byref(n), ctypes.c_long(alt_index),
        )
        if rc != 0:
            # parse-only failure: nothing mutated, stay synced
            return False
        self.n = n.value
        return True


def start_run(shaper):
    """A :class:`SubRun`, or None when the native library is absent
    or the shaper's GDEF cannot be flattened."""
    from fontrx.native import _load

    lib = _load()
    if lib is None or not hasattr(lib, "gsub_apply_lookup"):
        return None
    gblob = shaper._native_gdef
    if gblob is False:
        try:
            gblob = flatten_gdef(shaper.gdef)
        except Exception:
            gblob = "disabled"
        shaper._native_gdef = gblob
    if isinstance(gblob, str):
        return None
    return SubRun(lib)


def apply_lookup(shaper, li: int, lookup, run: SubRun,
                 buf_list, comp_list) -> bool:
    # cache key disjoint from gpos_walk's plain-int keys: GposShaper
    # inherits the GSUB apply() surface, so one shaper instance could
    # legitimately see both walks
    key = ("gsub", li)
    blob = shaper._native_blobs.get(key, False)
    if blob is False:
        try:
            blob = flatten_lookup(lookup)
        except Exception:
            blob = None
        shaper._native_blobs[key] = blob
    if blob is None:
        return False
    return run.run(shaper._native_gdef, blob, buf_list, comp_list,
                   int(getattr(shaper, "alt_index", 0)))
