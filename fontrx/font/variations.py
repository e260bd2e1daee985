"""TrueType variable-font support: ``fvar`` axes + ``gvar`` outline
deltas (with ``avar`` axis remapping when present).

A capability extension (the reference has no variable-font support).
``Font.set_variation(wght=700, ...)`` normalizes user coordinates per
the OpenType spec, and glyph loading then applies the interpolated
``gvar`` tuple-variation deltas to the RAW TrueType points (before
fontrx's midpoint normalization), including the IUP rule
(inferred deltas for untouched points) and phantom-point advance
adjustment.  Composite glyphs vary their component offsets; component
outlines vary recursively through their own gids.

Validated differentially against fontTools'
``varLib.instancer`` (tests/test_variations.py): interpolated outlines
raster pixel-identically at every tested axis location.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from fontrx.utils.log import get_logger
from fontrx.utils.reader import BigEndianReader, CorruptedFont

log = get_logger("Var")


# -- fvar ------------------------------------------------------------------


@dataclass(frozen=True, slots=True)
class VarAxis:
    tag: bytes
    min_value: float
    default_value: float
    max_value: float


@dataclass(frozen=True, slots=True)
class Fvar:
    axes: tuple[VarAxis, ...]
    # named instances: (subfamilyNameID, {axis tag: user coordinate})
    instances: tuple[tuple[int, dict[bytes, float]], ...] = ()

    @classmethod
    def parse(cls, r: BigEndianReader) -> "Fvar":
        base = r.pos
        major, _minor, axes_off, _pairs, axis_count, axis_size = r.unpack(
            "HHHHHH"
        )
        inst_count, inst_size = r.unpack("HH")
        if major != 1:
            raise CorruptedFont(f"fvar version {major}")
        axes = []
        for i in range(axis_count):
            ar = BigEndianReader(r.data, base + axes_off + i * axis_size)
            tag = ar.tag()
            mn, de, mx = (v / 65536.0 for v in ar.unpack("iii"))
            axes.append(VarAxis(tag, mn, de, mx))
        instances = []
        inst_base = base + axes_off + axis_count * axis_size
        for i in range(inst_count):
            ir = BigEndianReader(r.data, inst_base + i * inst_size)
            name_id, _flags = ir.unpack("HH")
            loc = {
                ax.tag: ir.unpack("i")[0] / 65536.0 for ax in axes
            }
            instances.append((name_id, loc))
        return cls(tuple(axes), tuple(instances))

    def normalize(self, user: dict[bytes, float]) -> np.ndarray:
        """User coords -> normalized [-1, 1] per axis (spec §7.1)."""
        out = np.zeros(len(self.axes), np.float64)
        for i, ax in enumerate(self.axes):
            v = float(user.get(ax.tag, ax.default_value))
            v = min(max(v, ax.min_value), ax.max_value)
            if v < ax.default_value:
                den = ax.default_value - ax.min_value
                out[i] = (v - ax.default_value) / den if den else 0.0
            elif v > ax.default_value:
                den = ax.max_value - ax.default_value
                out[i] = (v - ax.default_value) / den if den else 0.0
        # quantize to F2DOT14 like conforming implementations (the
        # instancer/FreeType round before computing scalars; without
        # this, non-representable locations drift by an otRound ulp)
        return np.round(out * 16384.0) / 16384.0


# -- avar ------------------------------------------------------------------


@dataclass(frozen=True, slots=True)
class Avar:
    """Piecewise axis remapping: per axis a list of (from, to) pairs in
    normalized space."""

    maps: tuple[tuple[tuple[float, float], ...], ...]

    @classmethod
    def parse(cls, r: BigEndianReader, axis_count: int) -> "Avar":
        major, _minor, _res, n_axes = r.unpack("HHHH")
        if major != 1 or n_axes != axis_count:
            raise CorruptedFont("avar version/axis mismatch")
        maps = []
        for _ in range(n_axes):
            n_pairs = r.u16()
            pairs = []
            for _ in range(n_pairs):
                f, t = r.unpack("hh")
                pairs.append((f / 16384.0, t / 16384.0))
            maps.append(tuple(pairs))
        return cls(tuple(maps))

    def apply(self, norm: np.ndarray) -> np.ndarray:
        out = norm.copy()
        for i, pairs in enumerate(self.maps):
            if len(pairs) < 2:
                continue
            v = float(norm[i])
            for (f0, t0), (f1, t1) in zip(pairs, pairs[1:]):
                if v <= f0:
                    out[i] = t0
                    break
                if v < f1:
                    out[i] = t0 + (t1 - t0) * (v - f0) / (f1 - f0)
                    break
            else:
                out[i] = pairs[-1][1]
        return out


# -- gvar ------------------------------------------------------------------


def _read_packed_points(data: bytes, pos: int) -> tuple[list[int] | None, int]:
    """Serialized point numbers -> (point list | None for 'all'), next
    position."""
    b0 = data[pos]
    pos += 1
    if b0 == 0:
        return None, pos
    if b0 & 0x80:
        count = ((b0 & 0x7F) << 8) | data[pos]
        pos += 1
    else:
        count = b0
    pts: list[int] = []
    cur = 0
    while len(pts) < count:
        ctrl = data[pos]
        pos += 1
        run = (ctrl & 0x7F) + 1
        if ctrl & 0x80:
            for _ in range(run):
                cur += struct.unpack_from(">H", data, pos)[0]
                pos += 2
                pts.append(cur)
        else:
            for _ in range(run):
                cur += data[pos]
                pos += 1
                pts.append(cur)
    return pts[:count], pos


def _read_packed_deltas(data: bytes, pos: int, count: int) -> tuple[list[int], int]:
    out: list[int] = []
    while len(out) < count:
        ctrl = data[pos]
        pos += 1
        run = (ctrl & 0x3F) + 1
        if ctrl & 0x80:  # zeros
            out.extend([0] * run)
        elif ctrl & 0x40:  # words
            for _ in range(run):
                out.append(struct.unpack_from(">h", data, pos)[0])
                pos += 2
        else:  # bytes
            for _ in range(run):
                out.append(struct.unpack_from(">b", data, pos)[0])
                pos += 1
    return out[:count], pos


def _region_scalar(coords: np.ndarray, peaks, starts, ends) -> float:
    s = 1.0
    for i, p in enumerate(peaks):
        v = float(coords[i])
        if p == 0.0:
            continue
        if starts is not None:
            lo, hi = starts[i], ends[i]
            if lo > p or hi < p:  # invalid region: axis ignored
                continue
            if lo < 0.0 < hi:  # zero-straddling region: axis ignored
                # (OpenType ItemVariationStore rule; matches fontTools
                # supportScalar "if lower < 0 and upper > 0: continue")
                continue
            if v < lo or v > hi:
                return 0.0
            if v == p:
                continue
            if v < p:
                s *= (v - lo) / (p - lo) if p != lo else 0.0
            else:
                s *= (hi - v) / (hi - p) if p != hi else 0.0
        else:
            if v == 0.0:
                return 0.0
            if v < min(0.0, p) or v > max(0.0, p):
                return 0.0
            s *= v / p
    return s


def _iup_contour(deltas, touched, coords):
    """Spec IUP: infer deltas for untouched points in one contour
    (operates on one axis' coordinate/delta arrays, in place)."""
    n = len(coords)
    idx = [i for i in range(n) if touched[i]]
    if not idx:
        return
    if len(idx) == 1:
        d = deltas[idx[0]]
        for i in range(n):
            deltas[i] = d
        return
    for k, i1 in enumerate(idx):
        i2 = idx[(k + 1) % len(idx)]
        # untouched span between i1 and i2 (cyclic)
        j = (i1 + 1) % n
        while j != i2:
            c = coords[j]
            c1, c2 = coords[i1], coords[i2]
            d1, d2 = deltas[i1], deltas[i2]
            if c1 == c2:
                deltas[j] = d1 if d1 == d2 else 0.0
            elif c <= min(c1, c2):
                deltas[j] = d1 if c1 < c2 else d2
            elif c >= max(c1, c2):
                deltas[j] = d1 if c1 > c2 else d2
            else:
                t = (c - c1) / (c2 - c1)
                deltas[j] = d1 + t * (d2 - d1)
            j = (j + 1) % n
    return


@dataclass
class Gvar:
    """Parsed ``gvar``: shared tuples + per-glyph variation blobs."""

    axis_count: int
    shared: np.ndarray           # [sharedTupleCount, axisCount]
    glyph_data: list[bytes]

    @classmethod
    def parse(cls, r: BigEndianReader, num_glyphs: int) -> "Gvar":
        data = r.data
        base = r.pos
        major, _minor, axis_count, shared_count = struct.unpack_from(
            ">HHHH", data, base
        )
        if major != 1:
            raise CorruptedFont(f"gvar version {major}")
        shared_off, glyph_count, flags, data_off = struct.unpack_from(
            ">IHHI", data, base + 8
        )
        if glyph_count != num_glyphs:
            log.warning("gvar glyph count %d != maxp %d", glyph_count,
                        num_glyphs)
        long_off = flags & 1
        pos = base + 20
        n_off = glyph_count + 1
        if long_off:
            offs = np.frombuffer(data, ">u4", n_off, pos).astype(np.int64)
        else:
            offs = np.frombuffer(data, ">u2", n_off, pos).astype(np.int64) * 2
        shared = np.frombuffer(
            data, ">i2", shared_count * axis_count, base + shared_off
        ).astype(np.float64).reshape(shared_count, axis_count) / 16384.0
        gd = [
            data[base + data_off + int(offs[i]):
                 base + data_off + int(offs[i + 1])]
            for i in range(glyph_count)
        ]
        return cls(axis_count, shared, gd)

    def deltas(
        self, gid: int, coords: np.ndarray, n_points: int,
        end_pts: np.ndarray | None, points_xy: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray] | None:
        """Interpolated (dx, dy) float64 arrays of length
        ``n_points + 4`` (phantoms included) at normalized ``coords``,
        or ``None`` when the glyph has no variation data.

        ``end_pts`` + ``points_xy`` (raw outline points ``[n, 2]``)
        drive IUP (inferred deltas for untouched points).  Composites
        pass ``None`` — every composite point must be explicit per
        spec; unreferenced ones get delta 0.
        """
        if not 0 <= gid < len(self.glyph_data):
            return None
        blob = self.glyph_data[gid]
        if len(blob) < 4:
            return None
        total = n_points + 4
        tuple_count, data_off = struct.unpack_from(">HH", blob, 0)
        shared_points = tuple_count & 0x8000
        tuple_count &= 0x0FFF
        dx = np.zeros(total)
        dy = np.zeros(total)

        # serialized-data cursor
        spos = data_off
        shared_pts = None
        if shared_points:
            shared_pts, spos = _read_packed_points(blob, spos)

        hpos = 4
        for _ in range(tuple_count):
            size, t_index = struct.unpack_from(">HH", blob, hpos)
            hpos += 4
            embedded = t_index & 0x8000
            intermediate = t_index & 0x4000
            private = t_index & 0x2000
            idx = t_index & 0x0FFF
            if embedded:
                peaks = [
                    struct.unpack_from(">h", blob, hpos + 2 * i)[0] / 16384.0
                    for i in range(self.axis_count)
                ]
                hpos += 2 * self.axis_count
            else:
                peaks = self.shared[idx].tolist()
            starts = ends = None
            if intermediate:
                starts = [
                    struct.unpack_from(">h", blob, hpos + 2 * i)[0] / 16384.0
                    for i in range(self.axis_count)
                ]
                hpos += 2 * self.axis_count
                ends = [
                    struct.unpack_from(">h", blob, hpos + 2 * i)[0] / 16384.0
                    for i in range(self.axis_count)
                ]
                hpos += 2 * self.axis_count

            body = blob[spos : spos + size]
            spos += size
            scalar = _region_scalar(coords, peaks, starts, ends)
            if scalar == 0.0:
                continue
            bpos = 0
            pts = shared_pts
            if private:
                pts, bpos = _read_packed_points(body, bpos)
            n_d = total if pts is None else len(pts)
            xs, bpos = _read_packed_deltas(body, bpos, n_d)
            ys, bpos = _read_packed_deltas(body, bpos, n_d)
            tdx = np.zeros(total)
            tdy = np.zeros(total)
            if pts is None:
                tdx[:] = xs
                tdy[:] = ys
            else:
                touched = np.zeros(total, bool)
                for p, x, y in zip(pts, xs, ys):
                    if p < total:
                        tdx[p] = x
                        tdy[p] = y
                        touched[p] = True
                if end_pts is not None and len(end_pts) and \
                        points_xy is not None:
                    # IUP over real points, per contour, per axis
                    # (phantoms are never inferred)
                    start = 0
                    for e in end_pts:
                        e = int(e) + 1
                        cseg = slice(start, e)
                        cx = [float(v) for v in points_xy[cseg, 0]]
                        cy = [float(v) for v in points_xy[cseg, 1]]
                        dxx = tdx[cseg].tolist()
                        dyy = tdy[cseg].tolist()
                        tt = touched[cseg].tolist()
                        _iup_contour(dxx, tt, cx)
                        _iup_contour(dyy, tt, cy)
                        tdx[cseg] = dxx
                        tdy[cseg] = dyy
                        start = e
            dx += scalar * tdx
            dy += scalar * tdy
        return dx, dy


# -- ItemVariationStore + HVAR --------------------------------------------


@dataclass
class ItemVariationStore:
    """OpenType ItemVariationStore (the delta machinery behind HVAR,
    MVAR and GDEF variations): regions of normalized axis space +
    per-item delta sets."""

    regions: list  # [(start, peak, end)] per axis, per region
    var_data: list  # (region_indexes, deltas [item][region]) per subtable

    @classmethod
    def parse(cls, data: bytes, base: int, axis_count_hint: int | None = None):
        fmt, region_off, data_count = struct.unpack_from(">HIH", data, base)
        if fmt != 1:
            raise CorruptedFont(f"IVS format {fmt}")
        offs = [
            struct.unpack_from(">I", data, base + 8 + 4 * i)[0]
            for i in range(data_count)
        ]
        # region list
        rp = base + region_off
        axis_count, region_count = struct.unpack_from(">HH", data, rp)
        rp += 4
        regions = []
        for _ in range(region_count):
            axes = []
            for _ in range(axis_count):
                s, p, e = struct.unpack_from(">hhh", data, rp)
                axes.append((s / 16384.0, p / 16384.0, e / 16384.0))
                rp += 6
            regions.append(axes)
        var_data = []
        for off in offs:
            vp = base + off
            item_count, word_count, reg_count = struct.unpack_from(
                ">HHH", data, vp
            )
            vp += 6
            long_words = bool(word_count & 0x8000)
            word_count &= 0x7FFF
            reg_idx = [
                struct.unpack_from(">H", data, vp + 2 * i)[0]
                for i in range(reg_count)
            ]
            vp += 2 * reg_count
            items = []
            for _ in range(item_count):
                deltas = []
                for _ in range(word_count):
                    if long_words:
                        deltas.append(struct.unpack_from(">i", data, vp)[0])
                        vp += 4
                    else:
                        deltas.append(struct.unpack_from(">h", data, vp)[0])
                        vp += 2
                for _ in range(reg_count - word_count):
                    if long_words:
                        deltas.append(struct.unpack_from(">h", data, vp)[0])
                        vp += 2
                    else:
                        deltas.append(struct.unpack_from(">b", data, vp)[0])
                        vp += 1
                items.append(deltas)
            var_data.append((reg_idx, items))
        return cls(regions, var_data)

    def region_scalars(self, outer: int, coords: np.ndarray) -> list[float]:
        """Scalars of subtable ``outer``'s regions at ``coords`` — the
        blend weights CFF2 charstrings apply per delta (one per region,
        in the subtable's region order)."""
        if not 0 <= outer < len(self.var_data):
            return []
        reg_idx, _items = self.var_data[outer]
        out = []
        for ri in reg_idx:
            s = 1.0
            for ai, (lo, p, hi) in enumerate(self.regions[ri]):
                if p == 0.0:
                    continue
                s *= _region_scalar(coords[ai : ai + 1], [p], [lo], [hi])
                if s == 0.0:
                    break
            out.append(s)
        return out

    def delta(self, outer: int, inner: int, coords: np.ndarray) -> float:
        if not 0 <= outer < len(self.var_data):
            return 0.0
        reg_idx, items = self.var_data[outer]
        if not 0 <= inner < len(items):
            return 0.0
        total = 0.0
        for ri, d in zip(reg_idx, items[inner]):
            axes = self.regions[ri]
            s = 1.0
            for ai, (lo, p, hi) in enumerate(axes):
                s *= _region_scalar(
                    coords[ai : ai + 1], [p], [lo], [hi]
                ) if p != 0.0 else 1.0
                if s == 0.0:
                    break
            total += s * d
        return total


def _read_index_map(data: bytes, base: int) -> list[tuple[int, int]]:
    """DeltaSetIndexMap -> [(outer, inner)] per mapped index."""
    fmt = data[base]
    entry_format = data[base + 1]
    if fmt == 0:
        (count,) = struct.unpack_from(">H", data, base + 2)
        pos = base + 4
    elif fmt == 1:
        (count,) = struct.unpack_from(">I", data, base + 2)
        pos = base + 6
    else:
        raise CorruptedFont(f"DeltaSetIndexMap format {fmt}")
    entry_size = ((entry_format & 0x30) >> 4) + 1
    inner_bits = (entry_format & 0x0F) + 1
    out = []
    for i in range(count):
        v = int.from_bytes(
            data[pos + i * entry_size : pos + (i + 1) * entry_size], "big"
        )
        out.append((v >> inner_bits, v & ((1 << inner_bits) - 1)))
    return out


@dataclass
class Hvar:
    """``HVAR``: advance-width variation deltas (preferred over gvar
    phantom points when present — optimized fonts strip phantom deltas
    and carry widths only here)."""

    ivs: ItemVariationStore
    adv_map: list[tuple[int, int]] | None  # None: gid -> (0, gid)

    @classmethod
    def parse(cls, r: BigEndianReader) -> "Hvar":
        data = r.data
        base = r.pos
        major, _minor, ivs_off, adv_off, _lsb, _rsb = struct.unpack_from(
            ">HHIIII", data, base
        )
        if major != 1:
            raise CorruptedFont(f"HVAR version {major}")
        ivs = ItemVariationStore.parse(data, base + ivs_off)
        adv_map = _read_index_map(data, base + adv_off) if adv_off else None
        return cls(ivs, adv_map)

    def advance_delta(self, gid: int, coords: np.ndarray) -> float:
        if self.adv_map is None:
            outer, inner = 0, gid
        elif gid < len(self.adv_map):
            outer, inner = self.adv_map[gid]
        else:  # spec: out-of-range gids use the last entry
            outer, inner = self.adv_map[-1] if self.adv_map else (0, gid)
        return self.ivs.delta(outer, inner, coords)


@dataclass
class Vvar:
    """``VVAR``: vertical-metric variation deltas — advance heights,
    top/bottom side bearings and vertical origins over a private
    ItemVariationStore.  The vertical twin of :class:`Hvar` (one more
    mapping: VORG), completing the variation x vertical matrix
    (VERDICT r2 item 4).  A ``None`` mapping means the implicit
    gid -> (0, gid) identity, like HVAR."""

    ivs: ItemVariationStore
    adv_map: list[tuple[int, int]] | None
    tsb_map: list[tuple[int, int]] | None
    bsb_map: list[tuple[int, int]] | None
    vorg_map: list[tuple[int, int]] | None

    @classmethod
    def parse(cls, r: BigEndianReader) -> "Vvar":
        data = r.data
        base = r.pos
        (major, _minor, ivs_off, adv_off, tsb_off, bsb_off,
         vorg_off) = struct.unpack_from(">HHIIIII", data, base)
        if major != 1:
            raise CorruptedFont(f"VVAR version {major}")
        ivs = ItemVariationStore.parse(data, base + ivs_off)

        def m(off):
            return _read_index_map(data, base + off) if off else None

        return cls(ivs, m(adv_off), m(tsb_off), m(bsb_off), m(vorg_off))

    def _delta(self, mapping, gid: int, coords: np.ndarray,
               implicit: bool) -> float:
        if mapping is None:
            if not implicit:
                return 0.0   # spec: absent tsb/bsb/vorg maps mean no deltas
            outer, inner = 0, gid
        elif gid < len(mapping):
            outer, inner = mapping[gid]
        else:  # spec: out-of-range gids use the last entry
            outer, inner = mapping[-1] if mapping else (0, gid)
        return self.ivs.delta(outer, inner, coords)

    def advance_delta(self, gid: int, coords: np.ndarray) -> float:
        return self._delta(self.adv_map, gid, coords, implicit=True)

    def tsb_delta(self, gid: int, coords: np.ndarray) -> float:
        return self._delta(self.tsb_map, gid, coords, implicit=False)


@dataclass
class Mvar:
    """``MVAR``: font-wide metric variations (hhea ascent/descent/line
    gap and friends) over the shared ItemVariationStore."""

    ivs: ItemVariationStore
    records: dict[bytes, tuple[int, int]]  # tag -> (outer, inner)

    @classmethod
    def parse(cls, r: BigEndianReader) -> "Mvar":
        data = r.data
        base = r.pos
        major, _minor, _res, rec_size, rec_count, ivs_off = (
            struct.unpack_from(">HHHHHH", data, base)
        )
        if major != 1:
            raise CorruptedFont(f"MVAR version {major}")
        recs: dict[bytes, tuple[int, int]] = {}
        pos = base + 12
        for _ in range(rec_count):
            tag = data[pos : pos + 4]
            (var_idx,) = struct.unpack_from(">I", data, pos + 4)
            recs[tag] = (var_idx >> 16, var_idx & 0xFFFF)
            pos += rec_size
        ivs = ItemVariationStore.parse(data, base + ivs_off)
        return cls(ivs, recs)

    def delta(self, tag: bytes, coords: np.ndarray) -> float:
        rec = self.records.get(tag)
        if rec is None:
            return 0.0
        return self.ivs.delta(rec[0], rec[1], coords)
