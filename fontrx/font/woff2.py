"""WOFF2 (Web Open Font Format 2.0) container decoding.

Capability extension: the reference accepts bare TrueType scalers only
(``src/font/ttf.zig:24-31``).  fontrx opens WOFF2 natively — the
Brotli entropy stage rides the system ``libbrotlidec`` through
``fontrx/native/brotli.py`` (same ctypes native-runtime pattern as the
rest of ``fontrx/native``), and the preprocessing transforms are
reversed here per the W3C WOFF2 spec:

- **glyf transform (version 0)**: per-glyph data is split into seven
  parallel streams (contour counts, point counts, point flags, triplet
  -coded coordinate deltas, composite records, explicit bounding
  boxes, instructions).  Reconstruction re-assembles standard ``glyf``
  records (§5.1) — coordinates re-encoded with the usual short/same
  flag compression, glyphs padded to 4 bytes — and regenerates
  ``loca`` to match.
- **loca transform (version 0)**: zero-length stream; the table is a
  by-product of its paired glyf reconstruction.
- **hmtx transform (version 1)**: omitted lsb arrays are recovered
  from the reconstructed glyphs' ``xMin`` values (§5.4).

The output is a canonical sfnt (or TTC) blob with recomputed table
checksums and ``head.checkSumAdjustment`` — WOFF2 directories carry no
checksums — which then parses through the normal table pipeline, so
every capability (rendering, shaping, variations, hinting, color) is
container-agnostic.  Differential oracle in ``tests/test_woff2.py``:
the same font with and without the wrapper must raster identically,
and fontTools' WOFF2 writer (fed by our Brotli shim) builds the
fixtures.
"""

from __future__ import annotations

import struct

from fontrx.font.ttf import CorruptedFont
from fontrx.utils.log import get_logger

log = get_logger("WOFF2")

WOFF2_SIGNATURE = b"wOF2"

# spec §5.2 "Known Table Tags" — flag-byte values 0..62; 63 = explicit
_KNOWN_TAGS = (
    b"cmap", b"head", b"hhea", b"hmtx", b"maxp", b"name", b"OS/2",
    b"post", b"cvt ", b"fpgm", b"glyf", b"loca", b"prep", b"CFF ",
    b"VORG", b"EBDT", b"EBLC", b"gasp", b"hdmx", b"kern", b"LTSH",
    b"PCLT", b"VDMX", b"vhea", b"vmtx", b"BASE", b"GDEF", b"GPOS",
    b"GSUB", b"EBSC", b"JSTF", b"MATH", b"CBDT", b"CBLC", b"COLR",
    b"CPAL", b"SVG ", b"sbix", b"acnt", b"avar", b"bdat", b"bloc",
    b"bsln", b"cvar", b"fdsc", b"feat", b"fmtx", b"fvar", b"gvar",
    b"hsty", b"just", b"lcar", b"mort", b"morx", b"opbd", b"prop",
    b"trak", b"Zapf", b"Silf", b"Glat", b"Gloc", b"Feat", b"Sill",
)

# glyf flag bits (OpenType `glyf`)
_ON_CURVE = 0x01
_X_SHORT = 0x02
_Y_SHORT = 0x04
_X_SAME_OR_POS = 0x10
_Y_SAME_OR_POS = 0x20
_OVERLAP_SIMPLE = 0x40

# composite component flags
_ARG_1_AND_2_ARE_WORDS = 0x0001
_WE_HAVE_A_SCALE = 0x0008
_MORE_COMPONENTS = 0x0020
_WE_HAVE_AN_X_AND_Y_SCALE = 0x0040
_WE_HAVE_A_TWO_BY_TWO = 0x0080
_WE_HAVE_INSTRUCTIONS = 0x0100


def _read_uint_base128(data: bytes, pos: int) -> tuple[int, int]:
    """Variable-length u32, ≤5 bytes, no leading zeros, no overflow."""
    accum = 0
    for i in range(5):
        if pos >= len(data):
            raise CorruptedFont("UIntBase128 truncated")
        byte = data[pos]
        pos += 1
        if i == 0 and byte == 0x80:
            raise CorruptedFont("UIntBase128 leading zero")
        if accum & 0xFE000000:
            raise CorruptedFont("UIntBase128 overflow")
        accum = (accum << 7) | (byte & 0x7F)
        if not byte & 0x80:
            return accum, pos
    raise CorruptedFont("UIntBase128 exceeds 5 bytes")


def _read_255_uint16(data: bytes, pos: int) -> tuple[int, int]:
    """Variable-length u16 (spec §5.2 255UInt16)."""
    if pos >= len(data):
        raise CorruptedFont("255UInt16 truncated")
    code = data[pos]
    pos += 1
    if code == 253:
        if pos + 2 > len(data):
            raise CorruptedFont("255UInt16 truncated")
        return struct.unpack_from(">H", data, pos)[0], pos + 2
    if code == 255:  # oneMoreByteCode1: value = next + lowestUCode
        if pos >= len(data):
            raise CorruptedFont("255UInt16 truncated")
        return data[pos] + 253, pos + 1
    if code == 254:  # oneMoreByteCode2: value = next + lowestUCode*2
        if pos >= len(data):
            raise CorruptedFont("255UInt16 truncated")
        return data[pos] + 506, pos + 1
    return code, pos


def is_woff2(data: bytes) -> bool:
    return data[:4] == WOFF2_SIGNATURE


class _TableEntry:
    __slots__ = ("tag", "transformed", "orig_length", "transform_length")

    def __init__(self, tag, transformed, orig_length, transform_length):
        self.tag = tag
        self.transformed = transformed
        self.orig_length = orig_length
        # bytes consumed from the decompressed stream
        self.transform_length = (
            transform_length if transformed else orig_length)


def _parse_directory(data: bytes, num_tables: int, pos: int):
    entries = []
    for _ in range(num_tables):
        if pos >= len(data):
            raise CorruptedFont("WOFF2 directory truncated")
        flags = data[pos]
        pos += 1
        tag_index = flags & 0x3F
        version = (flags >> 6) & 0x03
        if tag_index == 0x3F:
            if pos + 4 > len(data):
                raise CorruptedFont("WOFF2 directory truncated")
            tag = data[pos : pos + 4]
            pos += 4
        else:
            tag = _KNOWN_TAGS[tag_index]
        orig_length, pos = _read_uint_base128(data, pos)
        if tag in (b"glyf", b"loca"):
            transformed = version != 3
            if transformed and version != 0:
                raise CorruptedFont(
                    f"WOFF2 reserved transform {version} for {tag!r}")
        else:
            transformed = version != 0
            if transformed and not (tag == b"hmtx" and version == 1):
                raise CorruptedFont(
                    f"WOFF2 unknown transform {version} for {tag!r}")
        transform_length = None
        if transformed:
            transform_length, pos = _read_uint_base128(data, pos)
        if tag == b"loca" and transformed and transform_length != 0:
            raise CorruptedFont("WOFF2 transformed loca must be empty")
        entries.append(_TableEntry(tag, transformed, orig_length,
                                   transform_length))
    return entries, pos


# ---------------------------------------------------------------------------
# glyf/loca reconstruction (spec §5.1)

class _Streams:
    """Cursor-tracked views over the seven transformed-glyf streams."""

    def __init__(self, data: bytes):
        if len(data) < 36:
            raise CorruptedFont("transformed glyf header truncated")
        (version, option_flags, self.num_glyphs, self.index_format,
         n_contour_sz, n_points_sz, flag_sz, glyph_sz, composite_sz,
         bbox_sz, instruction_sz) = struct.unpack_from(">HHHH7I", data, 0)
        del version  # reserved; encoders in the wild write 0 or junk
        pos = 36
        sizes = (n_contour_sz, n_points_sz, flag_sz, glyph_sz,
                 composite_sz, bbox_sz, instruction_sz)
        if pos + sum(sizes) > len(data):
            raise CorruptedFont("transformed glyf streams truncated")
        views = []
        for size in sizes:
            views.append(data[pos : pos + size])
            pos += size
        (self.n_contour, self.n_points, self.flags, self.glyph,
         self.composite, self.bbox, self.instruction) = views
        self.overlap_bitmap = b""
        if option_flags & 1:
            n = (self.num_glyphs + 7) >> 3
            if pos + n > len(data):
                raise CorruptedFont("overlapSimpleBitmap truncated")
            self.overlap_bitmap = data[pos : pos + n]
        # cursors
        self.np_pos = 0       # nPoints stream (255UInt16)
        self.flag_pos = 0
        self.glyph_pos = 0    # triplets + instruction lengths
        self.comp_pos = 0
        self.instr_pos = 0
        bitmap_len = ((self.num_glyphs + 31) >> 5) << 2
        if bbox_sz < bitmap_len:
            raise CorruptedFont("bboxBitmap truncated")
        self.bbox_bitmap = self.bbox[:bitmap_len]
        self.bbox_pos = bitmap_len

    def bbox_bit(self, gid: int) -> bool:
        return bool(self.bbox_bitmap[gid >> 3] & (0x80 >> (gid & 7)))

    def overlap_bit(self, gid: int) -> bool:
        if not self.overlap_bitmap:
            return False
        return bool(self.overlap_bitmap[gid >> 3] & (0x80 >> (gid & 7)))

    def read_bbox(self) -> tuple[int, int, int, int]:
        if self.bbox_pos + 8 > len(self.bbox):
            raise CorruptedFont("bboxStream truncated")
        vals = struct.unpack_from(">4h", self.bbox, self.bbox_pos)
        self.bbox_pos += 8
        return vals

    def read_n_points(self) -> int:
        v, self.np_pos = _read_255_uint16(self.n_points, self.np_pos)
        return v

    def read_glyph_255(self) -> int:
        v, self.glyph_pos = _read_255_uint16(self.glyph, self.glyph_pos)
        return v

    def read_instructions(self, n: int) -> bytes:
        if self.instr_pos + n > len(self.instruction):
            raise CorruptedFont("instructionStream truncated")
        out = self.instruction[self.instr_pos : self.instr_pos + n]
        self.instr_pos += n
        return out


def _decode_triplets(streams: _Streams, n_points: int):
    """Decode n_points (on_curve, x, y) triples (spec §5.2 triplet
    encoding: flag byte selects one of 128 delta packings)."""
    if streams.flag_pos + n_points > len(streams.flags):
        raise CorruptedFont("flagStream truncated")
    flags = streams.flags[streams.flag_pos : streams.flag_pos + n_points]
    streams.flag_pos += n_points
    trip = streams.glyph
    ti = streams.glyph_pos
    x = y = 0
    pts = []
    n_trip = len(trip)
    for i in range(n_points):
        flag = flags[i]
        on_curve = not flag >> 7
        flag &= 0x7F
        # bytes consumed from the triplet stream (flag byte excluded)
        if flag < 84:
            take = 1
        elif flag < 120:
            take = 2
        elif flag < 124:
            take = 3
        else:
            take = 4
        if ti + take > n_trip:
            raise CorruptedFont("glyphStream triplets truncated")
        if flag < 10:
            dx = 0
            dy = ((flag & 14) << 7) + trip[ti]
            dy = dy if flag & 1 else -dy
        elif flag < 20:
            dx = (((flag - 10) & 14) << 7) + trip[ti]
            dx = dx if flag & 1 else -dx
            dy = 0
        elif flag < 84:
            b0 = flag - 20
            b1 = trip[ti]
            dx = 1 + (b0 & 0x30) + (b1 >> 4)
            dy = 1 + ((b0 & 0x0C) << 2) + (b1 & 0x0F)
            dx = dx if flag & 1 else -dx
            dy = dy if (flag >> 1) & 1 else -dy
        elif flag < 120:
            b0 = flag - 84
            dx = 1 + ((b0 // 12) << 8) + trip[ti]
            dy = 1 + (((b0 % 12) >> 2) << 8) + trip[ti + 1]
            dx = dx if flag & 1 else -dx
            dy = dy if (flag >> 1) & 1 else -dy
        elif flag < 124:
            b2 = trip[ti + 1]
            dx = (trip[ti] << 4) + (b2 >> 4)
            dy = ((b2 & 0x0F) << 8) + trip[ti + 2]
            dx = dx if flag & 1 else -dx
            dy = dy if (flag >> 1) & 1 else -dy
        else:
            dx = (trip[ti] << 8) + trip[ti + 1]
            dy = (trip[ti + 2] << 8) + trip[ti + 3]
            dx = dx if flag & 1 else -dx
            dy = dy if (flag >> 1) & 1 else -dy
        ti += take
        x += dx
        y += dy
        if not (-0x8000 <= x <= 0x7FFF and -0x8000 <= y <= 0x7FFF):
            raise CorruptedFont("glyf coordinate out of i16 range")
        pts.append((on_curve, x, y))
    streams.glyph_pos = ti
    return pts


def _encode_coordinates(points, first_flag_extra: int) -> bytes:
    """Standard glyf flag/x/y wire encoding (short/same compression,
    no repeat flags — repeat is an optional size optimization)."""
    flags = bytearray()
    xs = bytearray()
    ys = bytearray()
    px = py = 0
    for i, (on_curve, x, y) in enumerate(points):
        dx = x - px
        dy = y - py
        px, py = x, y
        flag = _ON_CURVE if on_curve else 0
        if i == 0:
            flag |= first_flag_extra
        if dx == 0:
            flag |= _X_SAME_OR_POS
        elif -255 <= dx <= 255:
            flag |= _X_SHORT
            if dx > 0:
                flag |= _X_SAME_OR_POS
            xs.append(abs(dx))
        else:
            xs += struct.pack(">h", dx)
        if dy == 0:
            flag |= _Y_SAME_OR_POS
        elif -255 <= dy <= 255:
            flag |= _Y_SHORT
            if dy > 0:
                flag |= _Y_SAME_OR_POS
            ys.append(abs(dy))
        else:
            ys += struct.pack(">h", dy)
        flags.append(flag)
    return bytes(flags) + bytes(xs) + bytes(ys)


def _parse_composite(streams: _Streams) -> tuple[bytes, bool]:
    """Copy one composite glyph's component records verbatim; report
    whether any component carries WE_HAVE_INSTRUCTIONS."""
    comp = streams.composite
    pos = streams.comp_pos
    out_start = pos
    have_instructions = False
    more = True
    while more:
        if pos + 4 > len(comp):
            raise CorruptedFont("compositeStream truncated")
        flags = struct.unpack_from(">H", comp, pos)[0]
        size = 4 + (4 if flags & _ARG_1_AND_2_ARE_WORDS else 2)
        if flags & _WE_HAVE_A_SCALE:
            size += 2
        elif flags & _WE_HAVE_AN_X_AND_Y_SCALE:
            size += 4
        elif flags & _WE_HAVE_A_TWO_BY_TWO:
            size += 8
        if pos + size > len(comp):
            raise CorruptedFont("compositeStream truncated")
        if flags & _WE_HAVE_INSTRUCTIONS:
            have_instructions = True
        more = bool(flags & _MORE_COMPONENTS)
        pos += size
    streams.comp_pos = pos
    return comp[out_start:pos], have_instructions


def reconstruct_glyf(data: bytes) -> tuple[bytes, bytes, int]:
    """Reverse the glyf transform.  Returns (glyf, loca, index_format)."""
    streams = _Streams(data)
    n = streams.num_glyphs
    if len(streams.n_contour) < 2 * n:
        raise CorruptedFont("nContourStream truncated")
    n_contours = struct.unpack(f">{n}h", streams.n_contour[: 2 * n])
    glyf = bytearray()
    offsets = [0]
    for gid in range(n):
        nc = n_contours[gid]
        if nc == 0:
            if streams.bbox_bit(gid):
                raise CorruptedFont(
                    "empty glyph with explicit bbox")
            offsets.append(len(glyf))
            continue
        record = bytearray()
        if nc > 0:
            counts = [streams.read_n_points() for _ in range(nc)]
            total = sum(counts)
            if total == 0:
                raise CorruptedFont("simple glyph with zero points")
            if total > 0x10000:
                raise CorruptedFont("simple glyph point count overflow")
            points = _decode_triplets(streams, total)
            instr_len = streams.read_glyph_255()
            instructions = streams.read_instructions(instr_len)
            if streams.bbox_bit(gid):
                bbox = streams.read_bbox()
            else:
                xs = [p[1] for p in points]
                ys = [p[2] for p in points]
                bbox = (min(xs), min(ys), max(xs), max(ys))
            record += struct.pack(">h4h", nc, *bbox)
            end = -1
            for c in counts:
                end += c
                record += struct.pack(">H", end)
            record += struct.pack(">H", instr_len)
            record += instructions
            overlap = _OVERLAP_SIMPLE if streams.overlap_bit(gid) else 0
            record += _encode_coordinates(points, overlap)
        else:
            if nc != -1:
                raise CorruptedFont(
                    f"glyph {gid}: invalid contour count {nc}")
            if not streams.bbox_bit(gid):
                raise CorruptedFont(
                    "composite glyph without explicit bbox")
            bbox = streams.read_bbox()
            components, have_instr = _parse_composite(streams)
            record += struct.pack(">h4h", -1, *bbox)
            record += components
            if have_instr:
                instr_len = streams.read_glyph_255()
                record += struct.pack(">H", instr_len)
                record += streams.read_instructions(instr_len)
        if len(record) % 4:
            record += b"\x00" * (4 - len(record) % 4)
        glyf += record
        offsets.append(len(glyf))
    index_format = streams.index_format
    if index_format == 0:
        if offsets[-1] > 0x1FFFE:
            raise CorruptedFont("short loca overflow on reconstruction")
        loca = struct.pack(f">{n + 1}H", *(o >> 1 for o in offsets))
    else:
        loca = struct.pack(f">{n + 1}I", *offsets)
    return bytes(glyf), loca, index_format


def _glyf_x_mins(glyf: bytes, loca_offsets) -> list[int]:
    """xMin per glyph from a reconstructed glyf (0 for empty glyphs)."""
    out = []
    for i in range(len(loca_offsets) - 1):
        if loca_offsets[i + 1] <= loca_offsets[i]:
            out.append(0)
        else:
            out.append(struct.unpack_from(">h", glyf,
                                          loca_offsets[i] + 2)[0])
    return out


def reconstruct_hmtx(data: bytes, num_glyphs: int, num_h_metrics: int,
                     x_mins: list[int]) -> bytes:
    """Reverse the hmtx transform (spec §5.4): omitted lsb arrays are
    the glyphs' xMin values."""
    if not data:
        raise CorruptedFont("transformed hmtx empty")
    flags = data[0]
    if flags & 0xFC:
        raise CorruptedFont("transformed hmtx reserved flags set")
    if not flags:
        raise CorruptedFont("hmtx transform with no omitted arrays")
    if num_h_metrics > num_glyphs:
        raise CorruptedFont("numberOfHMetrics exceeds numGlyphs")
    pos = 1
    need = 2 * num_h_metrics
    if pos + need > len(data):
        raise CorruptedFont("transformed hmtx advances truncated")
    advances = struct.unpack_from(f">{num_h_metrics}H", data, pos)
    pos += need
    if flags & 0x01:
        lsbs = x_mins[:num_h_metrics]
    else:
        if pos + need > len(data):
            raise CorruptedFont("transformed hmtx lsbs truncated")
        lsbs = list(struct.unpack_from(f">{num_h_metrics}h", data, pos))
        pos += need
    n_rest = num_glyphs - num_h_metrics
    if flags & 0x02:
        rest = x_mins[num_h_metrics:num_glyphs]
    else:
        if pos + 2 * n_rest > len(data):
            raise CorruptedFont("transformed hmtx bearings truncated")
        rest = list(struct.unpack_from(f">{n_rest}h", data, pos))
        pos += 2 * n_rest
    out = bytearray()
    for adv, lsb in zip(advances, lsbs):
        out += struct.pack(">Hh", adv, lsb)
    for lsb in rest:
        out += struct.pack(">h", lsb)
    return bytes(out)


# ---------------------------------------------------------------------------
# sfnt assembly

def _checksum(data: bytes) -> int:
    if len(data) % 4:
        data = data + b"\x00" * (4 - len(data) % 4)
    total = 0
    for (word,) in struct.iter_unpack(">I", data):
        total += word
    return total & 0xFFFFFFFF


def _assemble_sfnt(flavor: int, tables: list[tuple[bytes, bytes]]) -> bytes:
    """Build a canonical sfnt: directory sorted by tag, data 4-byte
    aligned, checksums recomputed (WOFF2 stores none), and
    ``head.checkSumAdjustment`` set per the OpenType font-checksum
    procedure."""
    tables = sorted(tables, key=lambda t: t[0])
    fixed = []
    for tag, payload in tables:
        if tag == b"head" and len(payload) >= 12:
            payload = payload[:8] + b"\x00\x00\x00\x00" + payload[12:]
        fixed.append((tag, payload))
    n = len(fixed)
    entry_selector = max(n.bit_length() - 1, 0)
    search_range = (1 << entry_selector) * 16
    range_shift = n * 16 - search_range
    out = bytearray(struct.pack(">IHHHH", flavor, n, search_range,
                                entry_selector, range_shift))
    dir_pos = len(out)
    out += b"\x00" * (16 * n)
    head_off = None
    for i, (tag, payload) in enumerate(fixed):
        off = len(out)
        if tag == b"head":
            head_off = off
        struct.pack_into(">4sIII", out, dir_pos + 16 * i, tag,
                         _checksum(payload), off, len(payload))
        out += payload
        if len(out) % 4:
            out += b"\x00" * (4 - len(out) % 4)
    if head_off is not None:
        adjustment = (0xB1B0AFBA - _checksum(bytes(out))) & 0xFFFFFFFF
        struct.pack_into(">I", out, head_off + 8, adjustment)
    return bytes(out)


def decode_woff2(data: bytes) -> bytes:
    """Unwrap a WOFF2 blob into equivalent sfnt (or TTC) bytes."""
    from fontrx.native import brotli

    if len(data) < 48:
        raise CorruptedFont("WOFF2 header truncated")
    (sig, flavor, length, num_tables, reserved, total_sfnt_size,
     total_compressed, _major, _minor, meta_off, meta_len,
     _meta_orig, priv_off, priv_len) = struct.unpack_from(
        ">4sIIHHIIHHIIIII", data, 0)
    del total_sfnt_size, meta_off, meta_len, priv_off, priv_len
    if sig != WOFF2_SIGNATURE:
        raise CorruptedFont("not a WOFF2 file")
    if reserved != 0:
        raise CorruptedFont("WOFF2 reserved field must be zero")
    if length != len(data):
        raise CorruptedFont(
            f"WOFF2 length field {length} != file size {len(data)}")
    if num_tables == 0:
        raise CorruptedFont("WOFF2 with no tables")
    if not brotli.available():
        raise CorruptedFont(
            "WOFF2 requires the system Brotli decoder "
            "(libbrotlidec), which failed to load")

    entries, pos = _parse_directory(data, num_tables, 48)

    fonts: list[tuple[int, list[int]]] = []  # (flavor, table indices)
    if flavor == 0x74746366:  # 'ttcf' collection
        if pos + 4 > len(data):
            raise CorruptedFont("WOFF2 collection header truncated")
        ttc_version = struct.unpack_from(">I", data, pos)[0]
        pos += 4
        num_fonts, pos = _read_255_uint16(data, pos)
        if num_fonts == 0:
            raise CorruptedFont("WOFF2 collection with no fonts")
        for _ in range(num_fonts):
            n_tab, pos = _read_255_uint16(data, pos)
            if pos + 4 > len(data):
                raise CorruptedFont("WOFF2 collection entry truncated")
            member_flavor = struct.unpack_from(">I", data, pos)[0]
            pos += 4
            indices = []
            for _ in range(n_tab):
                idx, pos = _read_255_uint16(data, pos)
                if idx >= len(entries):
                    raise CorruptedFont(
                        "WOFF2 collection table index out of range")
                indices.append(idx)
            fonts.append((member_flavor, indices))
    else:
        ttc_version = 0
        fonts.append((flavor, list(range(len(entries)))))

    if pos + total_compressed > len(data):
        raise CorruptedFont("WOFF2 compressed block past end of file")
    expected = sum(e.transform_length for e in entries)
    try:
        stream = brotli.decompress(
            data[pos : pos + total_compressed], expected)
    except ValueError as e:
        raise CorruptedFont(f"WOFF2 brotli: {e}") from e

    # slice the decompressed stream per directory order
    raw: list[bytes] = []
    off = 0
    for e in entries:
        raw.append(stream[off : off + e.transform_length])
        off += e.transform_length

    # pass 1: reconstruct transformed glyf tables; each font's
    # transformed loca is the by-product of its own glyf (glyf and
    # loca MUST be transformed together, spec §4.1)
    rebuilt: dict[int, bytes] = {}
    glyf_loca: dict[int, bytes] = {}  # glyf entry index -> loca bytes
    for i, e in enumerate(entries):
        if e.tag == b"glyf" and e.transformed:
            glyf, loca, _fmt = reconstruct_glyf(raw[i])
            rebuilt[i] = glyf
            glyf_loca[i] = loca
    for _, indices in fonts:
        gi = li = None
        for i in indices:
            if entries[i].tag == b"glyf":
                gi = i
            elif entries[i].tag == b"loca":
                li = i
        if li is not None and entries[li].transformed:
            if gi is None or gi not in glyf_loca:
                raise CorruptedFont(
                    "transformed loca without transformed glyf")
            rebuilt[li] = glyf_loca[gi]
        if gi is not None and entries[gi].transformed and (
                li is None or not entries[li].transformed):
            raise CorruptedFont(
                "transformed glyf without transformed loca")

    # pass 2: hmtx needs maxp/hhea/glyf from its own font's table set
    for font_flavor, indices in fonts:
        by_tag = {entries[i].tag: i for i in indices}
        hm = by_tag.get(b"hmtx")
        if hm is None or not entries[hm].transformed:
            continue
        for req in (b"maxp", b"hhea", b"glyf", b"loca"):
            if req not in by_tag:
                raise CorruptedFont(
                    f"transformed hmtx without {req!r}")
        maxp = raw[by_tag[b"maxp"]]
        hhea = raw[by_tag[b"hhea"]]
        if len(maxp) < 6 or len(hhea) < 36:
            raise CorruptedFont("maxp/hhea truncated")
        num_glyphs = struct.unpack_from(">H", maxp, 4)[0]
        num_h_metrics = struct.unpack_from(">H", hhea, 34)[0]
        gi = by_tag[b"glyf"]
        glyf = rebuilt.get(gi, raw[gi])
        li = by_tag[b"loca"]
        loca = rebuilt.get(li, raw[li])
        head = raw[by_tag[b"head"]] if b"head" in by_tag else b""
        if len(head) >= 52:
            long_loca = struct.unpack_from(">h", head, 50)[0] == 1
        else:
            long_loca = len(loca) >= 4 * (num_glyphs + 1)
        width = 4 if long_loca else 2
        if len(loca) < width * (num_glyphs + 1):
            raise CorruptedFont("loca shorter than maxp.numGlyphs")
        if long_loca:
            offsets = struct.unpack(f">{num_glyphs + 1}I",
                                    loca[: 4 * (num_glyphs + 1)])
        else:
            offsets = [2 * v for v in struct.unpack(
                f">{num_glyphs + 1}H", loca[: 2 * (num_glyphs + 1)])]
        x_mins = _glyf_x_mins(glyf, offsets)
        rebuilt[hm] = reconstruct_hmtx(
            raw[hm], num_glyphs, num_h_metrics, x_mins)

    def table_bytes(i: int) -> bytes:
        payload = rebuilt.get(i, raw[i])
        if i not in rebuilt and len(payload) != entries[i].orig_length:
            raise CorruptedFont(
                f"WOFF2 table {entries[i].tag!r} origLength mismatch")
        return payload

    if len(fonts) == 1:
        font_flavor, indices = fonts[0]
        return _assemble_sfnt(
            font_flavor,
            [(entries[i].tag, table_bytes(i)) for i in indices])

    # collection: lay shared tables out once, then per-font directories
    return _assemble_ttc(ttc_version, fonts, entries, table_bytes)


def _assemble_ttc(ttc_version, fonts, entries, table_bytes) -> bytes:
    header_size = 12 + 4 * len(fonts)
    dir_sizes = [12 + 16 * len(idx) for _, idx in fonts]
    data_start = header_size + sum(dir_sizes)
    # unique table layout
    offsets: dict[int, int] = {}
    blob = bytearray()
    payloads: dict[int, bytes] = {}
    for _, indices in fonts:
        for i in indices:
            if i in offsets:
                continue
            payload = table_bytes(i)
            payloads[i] = payload
            offsets[i] = data_start + len(blob)
            blob += payload
            if len(blob) % 4:
                blob += b"\x00" * (4 - len(blob) % 4)
    # ttcf header: tag, version, numFonts (u32), offsets
    out = bytearray(struct.pack(">4sII", b"ttcf",
                                ttc_version or 0x00010000, len(fonts)))
    dir_off = header_size
    for _, idx in fonts:
        out += struct.pack(">I", dir_off)
        dir_off += 12 + 16 * len(idx)
    for font_flavor, indices in fonts:
        n = len(indices)
        entry_selector = max(n.bit_length() - 1, 0)
        search_range = (1 << entry_selector) * 16
        range_shift = n * 16 - search_range
        out += struct.pack(">IHHHH", font_flavor, n, search_range,
                           entry_selector, range_shift)
        for i in sorted(indices, key=lambda k: entries[k].tag):
            out += struct.pack(">4sIII", entries[i].tag,
                               _checksum(payloads[i]), offsets[i],
                               len(payloads[i]))
    out += blob
    return bytes(out)
