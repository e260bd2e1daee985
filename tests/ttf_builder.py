"""Hand-built minimal TrueType blobs for parser unit tests.

Implements just enough of the TTF wire format to exercise the parser's
branches (SURVEY §4 item 1): cmap format 4 (both idDelta and
glyphIndexArray segments) and format 12, short/long loca, simple glyphs
with repeat-flag and short-coordinate encodings, and compound glyphs
with 2.14 transforms.  Written from the public TrueType spec — this is
the *test fixture generator*, independent of the code under test.
"""

from __future__ import annotations

import struct


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def build_head(units_per_em=1000, loca_format=0, flags=1) -> bytes:
    return struct.pack(
        ">IIII HH QQ hhhh HHhhh",
        0x00010000, 0, 0, 0x5F0F3CF5,
        flags, units_per_em,
        0, 0,
        -100, -200, 1000, 800,   # xMin yMin xMax yMax
        0, 8, 2, loca_format, 0,
    )


def build_maxp(num_glyphs) -> bytes:
    return struct.pack(
        ">IHHHHH HHHHHHH HH",
        0x00010000, num_glyphs, 16, 4, 32, 8,
        2, 2, 0, 1, 1, 64, 0,   # maxZones .. maxSizeOfInstructions
        2, 1,                   # maxComponentElements, maxComponentDepth
    )


def build_hhea(num_metrics) -> bytes:
    return struct.pack(
        ">I hhhH hhhhhh hhhh h H",
        0x00010000,
        800, -200, 90, 1200,
        0, 0, 0, 1, 0, 0,    # minLSB minRSB xMaxExtent caretRise caretRun caretOffset
        0, 0, 0, 0,          # reserved
        0,                   # metricDataFormat
        num_metrics,
    )


def build_hmtx(metrics: list[tuple[int, int]]) -> bytes:
    return b"".join(struct.pack(">Hh", aw, lsb) for aw, lsb in metrics)


def build_cmap_format4(segments: list[tuple[int, int, int, list[int] | None]]) -> bytes:
    """``segments``: (start, end, id_delta, glyph_ids-or-None).  A final
    (0xFFFF, 0xFFFF, 1, None) sentinel segment is appended."""
    segments = segments + [(0xFFFF, 0xFFFF, 1, None)]
    seg = len(segments)
    end_codes = [s[1] for s in segments]
    start_codes = [s[0] for s in segments]
    id_deltas = [s[2] & 0xFFFF for s in segments]
    id_range_offsets = []
    glyph_index_array: list[int] = []
    for i, (start, end, delta, ids) in enumerate(segments):
        if ids is None:
            id_range_offsets.append(0)
        else:
            assert len(ids) == end - start + 1
            # offset in bytes from this idRangeOffset slot to the ids
            slots_after = seg - i
            id_range_offsets.append(2 * (slots_after + len(glyph_index_array)))
            glyph_index_array.extend(ids)
    # header: format, length, language, segCountX2, searchRange,
    # entrySelector, rangeShift (length/searchRange unchecked by parser)
    body = struct.pack(
        ">HHHHHHH", 4, 16 + 8 * seg + 2 * len(glyph_index_array), 0, seg * 2, 0, 0, 0
    )
    parts = [body]
    parts.append(struct.pack(f">{seg}H", *end_codes))
    parts.append(struct.pack(">H", 0))  # reservedPad
    parts.append(struct.pack(f">{seg}H", *start_codes))
    parts.append(struct.pack(f">{seg}H", *id_deltas))
    parts.append(struct.pack(f">{seg}H", *id_range_offsets))
    if glyph_index_array:
        parts.append(struct.pack(f">{len(glyph_index_array)}H", *glyph_index_array))
    return b"".join(parts)


def build_cmap_format12(groups: list[tuple[int, int, int]]) -> bytes:
    body = struct.pack(">HHIII", 12, 0, 16 + 12 * len(groups), 0, len(groups))
    for start, end, glyph in groups:
        body += struct.pack(">III", start, end, glyph)
    return body


def build_cmap_format0(glyph_ids: list[int]) -> bytes:
    """``glyph_ids``: up to 256 u8 glyph indices (zero-padded)."""
    ids = (glyph_ids + [0] * 256)[:256]
    return struct.pack(">HHH", 0, 262, 0) + bytes(ids)


def build_cmap_format6(first_code: int, glyph_ids: list[int]) -> bytes:
    n = len(glyph_ids)
    return struct.pack(
        f">HHHHH{n}H", 6, 10 + 2 * n, 0, first_code, n, *glyph_ids
    )


def build_cmap_format13(groups: list[tuple[int, int, int]]) -> bytes:
    """``groups``: (start_char, end_char_inclusive, constant_glyph)."""
    body = struct.pack(">HHIII", 13, 0, 16 + 12 * len(groups), 0, len(groups))
    for start, end, glyph in groups:
        body += struct.pack(">III", start, end, glyph)
    return body


def build_cmap(subtables: list[tuple[int, int, bytes]]) -> bytes:
    """``subtables``: list of (platform_id, platform_specific_id, body)."""
    header = struct.pack(">HH", 0, len(subtables))
    offset = 4 + 8 * len(subtables)
    records = b""
    bodies = b""
    for pid, psid, body in subtables:
        records += struct.pack(">HHI", pid, psid, offset)
        bodies += body
        offset += len(body)
    return header + records + bodies


ON_CURVE = 0x01
X_SHORT = 0x02
Y_SHORT = 0x04
REPEAT = 0x08
X_SAME_OR_POS = 0x10
Y_SAME_OR_POS = 0x20


def build_simple_glyph(
    contours: list[list[tuple[int, int, bool]]],
    box=(0, 0, 100, 100),
    use_repeat=False,
    instructions=b"",
) -> bytes:
    """Build a simple glyf entry from contours of (x, y, on_curve).

    Coordinate encoding: picks short (1-byte) form when |delta| < 256,
    same-flag when delta == 0, long form otherwise.  ``use_repeat``
    exercises the flag RLE path.
    """
    all_pts = [p for c in contours for p in c]
    end_pts = []
    acc = -1
    for c in contours:
        acc += len(c)
        end_pts.append(acc)

    flags = []
    x_bytes = b""
    y_bytes = b""
    px, py = 0, 0
    for x, y, on in all_pts:
        dx, dy = x - px, y - py
        f = ON_CURVE if on else 0
        if dx == 0:
            f |= X_SAME_OR_POS
        elif -256 < dx < 256:
            f |= X_SHORT
            if dx > 0:
                f |= X_SAME_OR_POS
            x_bytes += struct.pack(">B", abs(dx))
        else:
            x_bytes += struct.pack(">h", dx)
        if dy == 0:
            f |= Y_SAME_OR_POS
        elif -256 < dy < 256:
            f |= Y_SHORT
            if dy > 0:
                f |= Y_SAME_OR_POS
            y_bytes += struct.pack(">B", abs(dy))
        else:
            y_bytes += struct.pack(">h", dy)
        flags.append(f)
        px, py = x, y

    if use_repeat:
        flag_bytes = b""
        i = 0
        while i < len(flags):
            run = 1
            while i + run < len(flags) and flags[i + run] == flags[i] and run < 255:
                run += 1
            if run > 1:
                flag_bytes += struct.pack(">BB", flags[i] | REPEAT, run - 1)
            else:
                flag_bytes += struct.pack(">B", flags[i])
            i += run
    else:
        flag_bytes = struct.pack(f">{len(flags)}B", *flags)

    header = struct.pack(
        ">hhhhh", len(contours), box[0], box[1], box[2], box[3]
    )
    body = struct.pack(f">{len(end_pts)}H", *end_pts)
    body += struct.pack(">H", len(instructions)) + instructions
    return header + body + flag_bytes + x_bytes + y_bytes


ARG_WORDS = 0x0001
ARGS_XY = 0x0002
ROUND_GRID = 0x0004
HAVE_SCALE = 0x0008
MORE = 0x0020
XY_SCALE = 0x0040
TWO_BY_TWO = 0x0080


def build_compound_glyph(
    parts: list[dict],
    box=(0, 0, 100, 100),
) -> bytes:
    """``parts``: dicts with keys glyph_index, dx, dy, and optionally
    scale / xy_scale / matrix (2.14 floats), round_to_grid."""
    out = struct.pack(">hhhhh", -1, box[0], box[1], box[2], box[3])
    for i, p in enumerate(parts):
        flags = ARGS_XY | ARG_WORDS
        if p.get("round_to_grid"):
            flags |= ROUND_GRID
        if "scale" in p:
            flags |= HAVE_SCALE
        elif "xy_scale" in p:
            flags |= XY_SCALE
        elif "matrix" in p:
            flags |= TWO_BY_TWO
        if i + 1 < len(parts):
            flags |= MORE
        out += struct.pack(">HHhh", flags, p["glyph_index"], p["dx"], p["dy"])

        def f2d14(v: float) -> int:
            return int(round(v * 16384)) & 0xFFFF

        if "scale" in p:
            out += struct.pack(">H", f2d14(p["scale"]))
        elif "xy_scale" in p:
            out += struct.pack(">HH", *(f2d14(v) for v in p["xy_scale"]))
        elif "matrix" in p:
            out += struct.pack(">HHHH", *(f2d14(v) for v in p["matrix"]))
    return out


def build_font(
    glyphs: list[bytes],
    cmap: bytes,
    units_per_em=1000,
    loca_format=0,
    metrics: list[tuple[int, int]] | None = None,
    extra_tables: dict[bytes, bytes] | None = None,
) -> bytes:
    """Assemble a complete minimal TTF from glyf entries + a cmap.
    ``extra_tables`` adds arbitrary tagged tables (GSUB/GDEF/...)."""
    num_glyphs = len(glyphs)
    if metrics is None:
        metrics = [(500, 0)] * num_glyphs

    glyf = b""
    offsets = [0]
    for g in glyphs:
        glyf += _pad4(g)
        offsets.append(len(glyf))
    if loca_format == 0:
        assert all(o % 2 == 0 and o // 2 <= 0xFFFF for o in offsets)
        loca = struct.pack(f">{len(offsets)}H", *(o // 2 for o in offsets))
    else:
        loca = struct.pack(f">{len(offsets)}I", *offsets)

    tables = {
        b"head": build_head(units_per_em, loca_format),
        b"maxp": build_maxp(num_glyphs),
        b"hhea": build_hhea(len(metrics)),
        b"hmtx": build_hmtx(metrics),
        b"cmap": cmap,
        b"loca": loca,
        b"glyf": glyf,
    }
    if extra_tables:
        tables.update(extra_tables)
    tags = sorted(tables)
    num = len(tags)
    offset = 12 + 16 * num
    directory = struct.pack(">IHHHH", 0x00010000, num, 0, 0, 0)
    bodies = b""
    for tag in tags:
        body = _pad4(tables[tag])
        directory += struct.pack(">4sIII", tag, 0, offset, len(tables[tag]))
        bodies += body
        offset += len(body)
    return directory + bodies


def build_cmap_format14(records):
    """``records``: list of ``(selector, default_ranges, nondefault)``
    with ``default_ranges = [(start_char, additional_count), ...]`` and
    ``nondefault = [(char, glyph), ...]`` (both ascending)."""
    n = len(records)
    header_len = 10 + 11 * n
    bodies: list[bytes] = []
    offsets = []
    pos = header_len
    for sel, defaults, nondef in records:
        if defaults:
            b = struct.pack(">I", len(defaults)) + b"".join(
                start.to_bytes(3, "big") + bytes([extra])
                for start, extra in defaults
            )
            d_off = pos
            bodies.append(b)
            pos += len(b)
        else:
            d_off = 0
        if nondef:
            b = struct.pack(">I", len(nondef)) + b"".join(
                c.to_bytes(3, "big") + struct.pack(">H", g)
                for c, g in nondef
            )
            nd_off = pos
            bodies.append(b)
            pos += len(b)
        else:
            nd_off = 0
        offsets.append((sel, d_off, nd_off))
    out = struct.pack(">HII", 14, pos, n)
    for sel, d_off, nd_off in offsets:
        out += sel.to_bytes(3, "big") + struct.pack(">II", d_off, nd_off)
    return out + b"".join(bodies)


def build_ttc(fonts: list[bytes]) -> bytes:
    """Wrap member .ttf blobs into a TrueType Collection.  TTC table
    offsets are file-absolute, so each member's directory offsets are
    rebased onto its position in the collection."""
    header_len = 12 + 4 * len(fonts)
    blobs: list[bytes] = []
    offs: list[int] = []
    pos = header_len
    for f in fonts:
        num = struct.unpack(">H", f[4:6])[0]
        fb = bytearray(f)
        for i in range(num):
            rec = 12 + 16 * i
            off = struct.unpack(">I", f[rec + 8 : rec + 12])[0]
            fb[rec + 8 : rec + 12] = struct.pack(">I", off + pos)
        offs.append(pos)
        blobs.append(bytes(fb))
        pos += len(f)
    return (
        struct.pack(">4sII", b"ttcf", 0x00010000, len(fonts))
        + b"".join(struct.pack(">I", o) for o in offs)
        + b"".join(blobs)
    )


# ---------------------------------------------------------------------------
# OpenType layout builders (GSUB / GDEF) — written from the public
# OpenType spec, for exercising the shaping engine's parser branches.

def build_coverage(glyphs: list[int]) -> bytes:
    """Coverage format 1 (sorted glyph list)."""
    glyphs = sorted(glyphs)
    return struct.pack(f">HH{len(glyphs)}H", 1, len(glyphs), *glyphs)


def build_classdef(classes: dict[int, int]) -> bytes:
    """ClassDef format 2: one range record per glyph (simple, valid)."""
    items = sorted(classes.items())
    out = struct.pack(">HH", 2, len(items))
    for g, c in items:
        out += struct.pack(">HHH", g, g, c)
    return out


def gsub_single(mapping: dict[int, int], fmt: int = 2) -> bytes:
    """SingleSubst subtable.  fmt 1 requires a constant delta."""
    glyphs = sorted(mapping)
    cov = build_coverage(glyphs)
    if fmt == 1:
        deltas = {(mapping[g] - g) & 0xFFFF for g in glyphs}
        assert len(deltas) == 1, "fmt-1 single subst needs one delta"
        head = struct.pack(">HHh", 1, 6, list(deltas)[0] - (0x10000 if list(deltas)[0] >= 0x8000 else 0))
        return head + cov
    subs = [mapping[g] for g in glyphs]
    head_len = 6 + 2 * len(subs)
    return (
        struct.pack(">HHH", 2, head_len, len(subs))
        + struct.pack(f">{len(subs)}H", *subs)
        + cov
    )


def gsub_multiple(mapping: dict[int, list[int]]) -> bytes:
    """MultipleSubst subtable (format 1)."""
    glyphs = sorted(mapping)
    cov = build_coverage(glyphs)
    n = len(glyphs)
    head_len = 6 + 2 * n
    seq_tables = []
    seq_offsets = []
    pos = head_len
    for g in glyphs:
        seq = mapping[g]
        b = struct.pack(f">H{len(seq)}H", len(seq), *seq)
        seq_offsets.append(pos)
        seq_tables.append(b)
        pos += len(b)
    return (
        struct.pack(">HHH", 1, pos, n)
        + struct.pack(f">{n}H", *seq_offsets)
        + b"".join(seq_tables)
        + cov
    )  # coverage after sequences: cov offset = pos


def gsub_alternate(mapping: dict[int, list[int]]) -> bytes:
    """AlternateSubst subtable (format 1): identical wire shape to
    MultipleSubst format 1 (coverage + per-index glyph lists)."""
    return gsub_multiple(mapping)


def gsub_ligature(sets: dict[int, list[tuple[list[int], int]]]) -> bytes:
    """LigatureSubst subtable: first glyph -> [(components, lig_glyph)]."""
    firsts = sorted(sets)
    cov = build_coverage(firsts)
    n = len(firsts)
    head_len = 6 + 2 * n
    set_tables = []
    set_offsets = []
    pos = head_len
    for g in firsts:
        ligs = sets[g]
        lig_blobs = []
        lig_offsets = []
        lpos = 2 + 2 * len(ligs)
        for comps, lig_glyph in ligs:
            b = struct.pack(
                f">HH{len(comps)}H", lig_glyph, len(comps) + 1, *comps
            )
            lig_offsets.append(lpos)
            lig_blobs.append(b)
            lpos += len(b)
        tbl = (
            struct.pack(f">H{len(ligs)}H", len(ligs), *lig_offsets)
            + b"".join(lig_blobs)
        )
        set_offsets.append(pos)
        set_tables.append(tbl)
        pos += len(tbl)
    return (
        struct.pack(">HHH", 1, pos, n)
        + struct.pack(f">{n}H", *set_offsets)
        + b"".join(set_tables)
        + cov
    )


def gsub_context3(input_covs: list[list[int]],
                  records: list[tuple[int, int]]) -> bytes:
    """ContextSubst format 3: input coverage sequence + records."""
    n_in = len(input_covs)
    covs = [build_coverage(c) for c in input_covs]
    head_len = 6 + 2 * n_in + 4 * len(records)
    out = struct.pack(">HHH", 3, n_in, len(records))
    pos = head_len
    offs = []
    for c in covs:
        offs.append(pos)
        pos += len(c)
    out += struct.pack(f">{n_in}H", *offs)
    for si, li in records:
        out += struct.pack(">HH", si, li)
    return out + b"".join(covs)


def gsub_chain3(backtrack: list[list[int]], input_covs: list[list[int]],
                lookahead: list[list[int]],
                records: list[tuple[int, int]]) -> bytes:
    """ChainContextSubst format 3."""
    all_covs = [build_coverage(c) for c in backtrack + input_covs + lookahead]
    nb, ni, nl = len(backtrack), len(input_covs), len(lookahead)
    head_len = 2 + 2 + 2 * nb + 2 + 2 * ni + 2 + 2 * nl + 2 + 4 * len(records)
    pos = head_len
    offs = []
    for c in all_covs:
        offs.append(pos)
        pos += len(c)
    bo, io, lo = offs[:nb], offs[nb:nb + ni], offs[nb + ni:]
    out = struct.pack(">HH", 3, nb) + struct.pack(f">{nb}H", *bo)
    out += struct.pack(">H", ni) + struct.pack(f">{ni}H", *io)
    out += struct.pack(">H", nl) + struct.pack(f">{nl}H", *lo)
    out += struct.pack(">H", len(records))
    for si, li in records:
        out += struct.pack(">HH", si, li)
    return out + b"".join(all_covs)


def gsub_context1(rules: dict[int, list[tuple[list[int], list[tuple[int, int]]]]]) -> bytes:
    """ContextSubst format 1: first glyph -> [(rest_of_input_glyphs,
    records)]."""
    firsts = sorted(rules)
    cov = build_coverage(firsts)
    n = len(firsts)
    head_len = 6 + 2 * n
    set_tables = []
    set_offsets = []
    pos = head_len
    for g in firsts:
        rs = rules[g]
        rule_blobs = []
        rule_offsets = []
        rpos = 2 + 2 * len(rs)
        for rest, recs in rs:
            b = struct.pack(f">HH{len(rest)}H", len(rest) + 1, len(recs), *rest)
            for si, li in recs:
                b += struct.pack(">HH", si, li)
            rule_offsets.append(rpos)
            rule_blobs.append(b)
            rpos += len(b)
        tbl = (
            struct.pack(f">H{len(rs)}H", len(rs), *rule_offsets)
            + b"".join(rule_blobs)
        )
        set_offsets.append(pos)
        set_tables.append(tbl)
        pos += len(tbl)
    return (
        struct.pack(">HHH", 1, pos, n)
        + struct.pack(f">{n}H", *set_offsets)
        + b"".join(set_tables)
        + cov
    )


def gsub_chain2(
    coverage_glyphs: list[int],
    bt_classes: dict[int, int],
    in_classes: dict[int, int],
    la_classes: dict[int, int],
    rule_sets: dict[int, list[tuple[list[int], list[int], list[int],
                                    list[tuple[int, int]]]]],
    n_sets: int,
) -> bytes:
    """ChainContextSubst format 2: class-based rules.  ``rule_sets``
    maps the first glyph's input class to rules of (backtrack_classes,
    rest_input_classes, lookahead_classes, records)."""
    cov = build_coverage(coverage_glyphs)
    bt_cd = build_classdef(bt_classes)
    in_cd = build_classdef(in_classes)
    la_cd = build_classdef(la_classes)
    head_len = 12 + 2 * n_sets
    blobs: list[bytes] = []
    pos = head_len

    def place(b: bytes) -> int:
        nonlocal pos
        blobs.append(b)
        p = pos
        pos += len(b)
        return p

    cov_off = place(cov)
    bt_off = place(bt_cd)
    in_off = place(in_cd)
    la_off = place(la_cd)
    set_offsets = []
    for ci in range(n_sets):
        rs = rule_sets.get(ci)
        if not rs:
            set_offsets.append(0)
            continue
        rule_blobs = []
        rule_offsets = []
        rpos = 2 + 2 * len(rs)
        for bt, rest, la, recs in rs:
            b = struct.pack(f">H{len(bt)}H", len(bt), *bt)
            b += struct.pack(f">H{len(rest)}H", len(rest) + 1, *rest)
            b += struct.pack(f">H{len(la)}H", len(la), *la)
            b += struct.pack(">H", len(recs))
            for si, li in recs:
                b += struct.pack(">HH", si, li)
            rule_offsets.append(rpos)
            rule_blobs.append(b)
            rpos += len(b)
        tbl = (
            struct.pack(f">H{len(rs)}H", len(rs), *rule_offsets)
            + b"".join(rule_blobs)
        )
        set_offsets.append(place(tbl))
    head = struct.pack(
        ">HHHHHH", 2, cov_off, bt_off, in_off, la_off, n_sets
    ) + struct.pack(f">{n_sets}H", *set_offsets)
    assert len(head) == head_len
    return head + b"".join(blobs)


def gsub_extension(ext_type: int, subtable: bytes) -> bytes:
    """Extension substitution (type 7) wrapping ``subtable``."""
    return struct.pack(">HHI", 1, ext_type, 8) + subtable


def build_script_list(
    scripts: list[tuple[bytes, dict[bytes | None, tuple[int | None, list[int]]]]],
) -> bytes:
    """Assemble a ScriptList: ``[(script_tag, {langsys_tag_or_None:
    (required_feature_index_or_None, feature_indices)})]`` — the None
    langsys key is the script's default LangSys."""
    def langsys(req, idx):
        return struct.pack(
            f">HHH{len(idx)}H", 0,
            0xFFFF if req is None else req, len(idx), *idx)

    n = len(scripts)
    head = struct.pack(">H", n)
    script_tables = []
    pos = 2 + 6 * n
    offs = []
    for _tag, langs in scripts:
        named = [(t, v) for t, v in langs.items() if t is not None]
        t_head_len = 4 + 6 * len(named)
        ls_blobs, ls_offs = [], []
        p = t_head_len
        dflt_off = 0
        if None in langs:
            b = langsys(*langs[None])
            dflt_off = p
            ls_blobs.append(b)
            p += len(b)
        for _lt, v in named:
            b = langsys(*v)
            ls_offs.append(p)
            ls_blobs.append(b)
            p += len(b)
        tbl = struct.pack(">HH", dflt_off, len(named))
        for (lt, _v), off in zip(named, ls_offs):
            tbl += struct.pack(">4sH", lt, off)
        tbl += b"".join(ls_blobs)
        offs.append(pos)
        script_tables.append(tbl)
        pos += len(tbl)
    for (tag, _), off in zip(scripts, offs):
        head += struct.pack(">4sH", tag, off)
    return head + b"".join(script_tables)


def build_gsub(
    features: list[tuple[bytes, list[int]]],
    lookups: list[tuple[int, int, list[bytes]]],
    mark_filter_sets: dict[int, int] | None = None,
    scripts: list | None = None,
) -> bytes:
    """Assemble a GSUB table.  ``lookups``: (type, flags, subtables);
    ``mark_filter_sets``: lookup index -> markFilteringSet value (sets
    flag 0x10 implicitly expected in flags); ``scripts``: optional
    ScriptList spec (see :func:`build_script_list`; empty when
    omitted)."""
    mark_filter_sets = mark_filter_sets or {}
    script_list = (build_script_list(scripts) if scripts
                   else struct.pack(">H", 0))
    # feature list
    n_feat = len(features)
    feat_tables = []
    feat_offsets = []
    pos = 2 + 6 * n_feat
    for _tag, idx in features:
        b = struct.pack(f">HH{len(idx)}H", 0, len(idx), *idx)
        feat_offsets.append(pos)
        feat_tables.append(b)
        pos += len(b)
    feature_list = struct.pack(">H", n_feat)
    for (tag, _idx), off in zip(features, feat_offsets):
        feature_list += struct.pack(">4sH", tag, off)
    feature_list += b"".join(feat_tables)
    # lookup list
    n_lk = len(lookups)
    lk_tables = []
    lk_offsets = []
    pos = 2 + 2 * n_lk
    for li, (ltype, flags, subs) in enumerate(lookups):
        extra = 2 if li in mark_filter_sets else 0
        sub_base = 6 + 2 * len(subs) + extra
        sub_offs = []
        sp = sub_base
        for s in subs:
            sub_offs.append(sp)
            sp += len(s)
        b = struct.pack(f">HHH{len(subs)}H", ltype, flags, len(subs), *sub_offs)
        if li in mark_filter_sets:
            b += struct.pack(">H", mark_filter_sets[li])
        b += b"".join(subs)
        lk_offsets.append(pos)
        lk_tables.append(b)
        pos += len(b)
    lookup_list = struct.pack(f">H{n_lk}H", n_lk, *lk_offsets) + b"".join(lk_tables)

    header_len = 10
    script_off = header_len
    feature_off = script_off + len(script_list)
    lookup_off = feature_off + len(feature_list)
    return (
        struct.pack(">HHHHH", 1, 0, script_off, feature_off, lookup_off)
        + script_list
        + feature_list
        + lookup_list
    )


def build_gdef(
    glyph_classes: dict[int, int] | None = None,
    mark_attach: dict[int, int] | None = None,
    mark_sets: list[list[int]] | None = None,
) -> bytes:
    """Assemble a GDEF table (version 1.0, or 1.2 when mark_sets)."""
    minor = 2 if mark_sets else 0
    header_len = 12 + (2 if minor else 0)
    blobs: list[bytes] = []
    pos = header_len

    def place(b: bytes | None) -> int:
        nonlocal pos
        if not b:
            return 0
        blobs.append(b)
        p = pos
        pos += len(b)
        return p

    gc_off = place(build_classdef(glyph_classes) if glyph_classes else None)
    ma_off = place(build_classdef(mark_attach) if mark_attach else None)
    ms_off = 0
    if mark_sets:
        covs = [build_coverage(s) for s in mark_sets]
        mpos = 4 + 4 * len(covs)
        offs = []
        for c in covs:
            offs.append(mpos)
            mpos += len(c)
        b = struct.pack(f">HH{len(covs)}I", 1, len(covs), *offs) + b"".join(covs)
        ms_off = place(b)
    head = struct.pack(">HHHHHH", 1, minor, gc_off, 0, 0, ma_off)
    if minor:
        head += struct.pack(">H", ms_off)
    assert len(head) == header_len
    return head + b"".join(blobs)


def build_vhea(ascent=500, descent=-500, line_gap=0, num_metrics=1) -> bytes:
    """``vhea`` table — same wire shape as hhea, vertical semantics."""
    return struct.pack(
        ">I hhhH hhhhhh hhhh h H",
        0x00011000,
        ascent, descent, line_gap, 1000,
        0, 0, 0, 0, 0, 0,
        0, 0, 0, 0,
        0,
        num_metrics,
    )


def build_vmtx(metrics: list[tuple[int, int]], run_out_tsb: list[int] = ()) -> bytes:
    """``(advance_height, top_side_bearing)`` long metrics + optional
    run-out topSideBearing i16 array."""
    out = b"".join(struct.pack(">Hh", ah, tsb) for ah, tsb in metrics)
    return out + b"".join(struct.pack(">h", t) for t in run_out_tsb)


# ---------------------------------------------------------------------------
# GPOS builders — the table framing is byte-identical to GSUB, so
# ``build_gpos`` reuses ``build_gsub``; only subtable wire formats
# differ.  Written from the public OpenType spec.

build_gpos = build_gsub
gpos_context3 = gsub_context3        # GPOS type 7 fmt 3 == GSUB 5 fmt 3
gpos_chain3 = gsub_chain3            # GPOS type 8 fmt 3 == GSUB 6 fmt 3
gpos_context1 = gsub_context1
gpos_chain2 = gsub_chain2            # GPOS type 8 fmt 2 == GSUB 6 fmt 2
gpos_extension = gsub_extension      # GPOS type 9 == GSUB 7 wire shape

_VF_BITS = ((0x1, 0), (0x2, 1), (0x4, 2), (0x8, 3))


def gpos_value(v: tuple[int, int, int, int], vfmt: int) -> bytes:
    """Pack a ValueRecord ``(xp, yp, xa, ya)`` under ``vfmt``."""
    out = b""
    for bit, idx in _VF_BITS:
        if vfmt & bit:
            out += struct.pack(">h", v[idx])
    return out


def gpos_anchor(x: int, y: int) -> bytes:
    return struct.pack(">Hhh", 1, x, y)


def gpos_anchor2(x: int, y: int, point: int) -> bytes:
    """Anchor format 2: contour-point anchor."""
    return struct.pack(">HhhH", 2, x, y, point)


def gpos_device(start: int, end: int, deltas: list[int],
                fmt: int | None = None) -> bytes:
    """Plain Device table: per-ppem deltas for sizes [start, end],
    packed at 2/4/8 bits (deltaFormat 1/2/3; auto-picked by range)."""
    assert len(deltas) == end - start + 1
    if fmt is None:
        m_lo, m_hi = min(deltas), max(deltas)
        if -2 <= m_lo and m_hi <= 1:
            fmt = 1
        elif -8 <= m_lo and m_hi <= 7:
            fmt = 2
        else:
            fmt = 3
    bits = {1: 2, 2: 4, 3: 8}[fmt]
    per = 16 // bits
    words = []
    cur = n_in = 0
    for d in deltas:
        cur = (cur << bits) | (d & ((1 << bits) - 1))
        n_in += 1
        if n_in == per:
            words.append(cur)
            cur = n_in = 0
    if n_in:
        words.append(cur << (bits * (per - n_in)))
    return struct.pack(f">HHH{len(words)}H", start, end, fmt, *words)


def gpos_anchor3(x: int, y: int, x_dev: bytes | None = None,
                 y_dev: bytes | None = None) -> bytes:
    """Anchor format 3 with optional plain device tables (offsets are
    from the Anchor table start)."""
    head = 10
    xo = head if x_dev else 0
    yo = (head + (len(x_dev) if x_dev else 0)) if y_dev else 0
    return (struct.pack(">HhhHH", 3, x, y, xo, yo)
            + (x_dev or b"") + (y_dev or b""))


def gpos_pair1_dev(first: int, second: int, xadv: int,
                   dev: bytes) -> bytes:
    """PairPos format 1 with one pair whose first-glyph value carries
    xAdvance + an xAdvance Device table (vf1 = 0x0044; device offsets
    are from the PairSet table start, per spec)."""
    vf1 = 0x0044
    head = struct.pack(">HHHHHH", 1, 0, vf1, 0, 1, 12)  # covOff patched
    pairset = struct.pack(">HHhH", 1, second, xadv, 8)  # dev at +8
    cov_off = 12 + len(pairset) + len(dev)
    head = struct.pack(">HHHHHH", 1, cov_off, vf1, 0, 1, 12)
    return head + pairset + dev + build_coverage([first])


def gpos_single(
    mapping: dict[int, tuple[int, int, int, int]], fmt: int = 2,
    vfmt: int = 0xF,
) -> bytes:
    """SinglePos subtable.  fmt 1 requires one shared value."""
    glyphs = sorted(mapping)
    cov = build_coverage(glyphs)
    if fmt == 1:
        vals = {mapping[g] for g in glyphs}
        assert len(vals) == 1, "fmt-1 single pos needs one value"
        vrec = gpos_value(next(iter(vals)), vfmt)
        return struct.pack(">HHH", 1, 6 + len(vrec), vfmt) + vrec + cov
    recs = b"".join(gpos_value(mapping[g], vfmt) for g in glyphs)
    head_len = 8 + len(recs)
    return (
        struct.pack(">HHHH", 2, head_len, vfmt, len(glyphs)) + recs + cov
    )


def gpos_pair1(
    pairs: dict[int, list[tuple[int, tuple, tuple]]],
    vf1: int = 0x4, vf2: int = 0,
) -> bytes:
    """PairPos format 1: first glyph -> [(second, v1, v2)]."""
    firsts = sorted(pairs)
    n = len(firsts)
    head_len = 10 + 2 * n
    sets, offs = [], []
    pos = head_len
    for g in firsts:
        recs = b""
        for gid2, v1, v2 in pairs[g]:
            recs += struct.pack(">H", gid2)
            recs += gpos_value(v1, vf1) + gpos_value(v2, vf2)
        tbl = struct.pack(">H", len(pairs[g])) + recs
        offs.append(pos)
        sets.append(tbl)
        pos += len(tbl)
    cov_off = pos
    return (
        struct.pack(f">HHHHH{n}H", 1, cov_off, vf1, vf2, n, *offs)
        + b"".join(sets)
        + build_coverage(firsts)
    )


def gpos_pair2(
    coverage: list[int],
    cd1: dict[int, int], cd2: dict[int, int],
    n_c1: int, n_c2: int,
    matrix: dict[tuple[int, int], tuple[tuple, tuple]],
    vf1: int = 0x4, vf2: int = 0,
) -> bytes:
    """PairPos format 2: class matrix; absent cells are zeros."""
    zero = (0, 0, 0, 0)
    recs = b""
    for c1 in range(n_c1):
        for c2 in range(n_c2):
            v1, v2 = matrix.get((c1, c2), (zero, zero))
            recs += gpos_value(v1, vf1) + gpos_value(v2, vf2)
    head_len = 16 + len(recs)
    cd1_b = build_classdef(cd1)
    cov_off = head_len
    cd1_off = cov_off + len(build_coverage(coverage))
    cd2_off = cd1_off + len(cd1_b)
    return (
        struct.pack(
            ">HHHHHHHH", 2, cov_off, vf1, vf2, cd1_off, cd2_off, n_c1, n_c2
        )
        + recs
        + build_coverage(coverage)
        + cd1_b
        + build_classdef(cd2)
    )



def _anchor_bytes(a) -> bytes:
    """Anchor spec -> wire bytes: (x, y) fmt 1, (x, y, point) fmt 2,
    raw bytes pass through (pre-built fmt-3 with devices)."""
    if isinstance(a, bytes):
        return a
    if len(a) == 3:
        return gpos_anchor2(*a)
    return gpos_anchor(*a)

def gpos_cursive(
    anchors: dict[int, tuple[tuple[int, int] | None, tuple[int, int] | None]],
) -> bytes:
    """CursivePos format 1: glyph -> (entry, exit) anchors."""
    glyphs = sorted(anchors)
    n = len(glyphs)
    head_len = 6 + 4 * n
    blob = b""
    offs = []
    pos = head_len
    for g in glyphs:
        rec = []
        for a in anchors[g]:
            if a is None:
                rec.append(0)
            else:
                rec.append(pos)
                ab = _anchor_bytes(a)
                blob += ab
                pos += len(ab)
        offs.append(tuple(rec))
    cov_off = pos
    out = struct.pack(">HHH", 1, cov_off, n)
    for e, x in offs:
        out += struct.pack(">HH", e, x)
    return out + blob + build_coverage(glyphs)


def _gpos_mark_array(
    marks: dict[int, tuple[int, tuple[int, int]]],
) -> tuple[bytes, list[int]]:
    """(MarkArray bytes, covered mark glyph order)."""
    order = sorted(marks)
    n = len(order)
    head_len = 2 + 4 * n
    out = struct.pack(">H", n)
    blob = b""
    pos = head_len
    for g in order:
        klass, anchor = marks[g]
        out += struct.pack(">HH", klass, pos)
        ab = _anchor_bytes(anchor)
        blob += ab
        pos += len(ab)
    return out + blob, order


def gpos_markbase(
    marks: dict[int, tuple[int, tuple[int, int]]],
    bases: dict[int, list[tuple[int, int] | None]],
    n_classes: int,
) -> bytes:
    """MarkBasePos format 1 (also MarkMarkPos — same wire shape):
    ``marks``: gid -> (class, anchor); ``bases``: gid -> per-class
    anchors."""
    mark_arr, mark_order = _gpos_mark_array(marks)
    base_order = sorted(bases)
    nb = len(base_order)
    ba_head = 2 + 2 * nb * n_classes
    ba = struct.pack(">H", nb)
    blob = b""
    pos = ba_head
    for g in base_order:
        for a in bases[g]:
            if a is None:
                ba += struct.pack(">H", 0)
            else:
                ba += struct.pack(">H", pos)
                ab = _anchor_bytes(a)
                blob += ab
                pos += len(ab)
    base_arr = ba + blob
    m_cov = build_coverage(mark_order)
    b_cov = build_coverage(base_order)
    head = 12
    m_cov_off = head
    b_cov_off = m_cov_off + len(m_cov)
    m_arr_off = b_cov_off + len(b_cov)
    b_arr_off = m_arr_off + len(mark_arr)
    return (
        struct.pack(
            ">HHHHHH", 1, m_cov_off, b_cov_off, n_classes, m_arr_off,
            b_arr_off,
        )
        + m_cov + b_cov + mark_arr + base_arr
    )


def gpos_marklig(
    marks: dict[int, tuple[int, tuple[int, int]]],
    ligs: dict[int, list[list[tuple[int, int] | None]]],
    n_classes: int,
) -> bytes:
    """MarkLigPos format 1: ``ligs``: gid -> per-component per-class
    anchors."""
    mark_arr, mark_order = _gpos_mark_array(marks)
    lig_order = sorted(ligs)
    nl = len(lig_order)
    att_tables = []
    for g in lig_order:
        comps = ligs[g]
        at_head = 2 + 2 * len(comps) * n_classes
        at = struct.pack(">H", len(comps))
        blob = b""
        pos = at_head
        for comp in comps:
            for a in comp:
                if a is None:
                    at += struct.pack(">H", 0)
                else:
                    at += struct.pack(">H", pos)
                    blob += gpos_anchor(*a)
                    pos += 6
        att_tables.append(at + blob)
    la_head = 2 + 2 * nl
    offs, pos = [], la_head
    for t in att_tables:
        offs.append(pos)
        pos += len(t)
    lig_arr = struct.pack(f">H{nl}H", nl, *offs) + b"".join(att_tables)
    m_cov = build_coverage(mark_order)
    l_cov = build_coverage(lig_order)
    head = 12
    m_cov_off = head
    l_cov_off = m_cov_off + len(m_cov)
    m_arr_off = l_cov_off + len(l_cov)
    l_arr_off = m_arr_off + len(mark_arr)
    return (
        struct.pack(
            ">HHHHHH", 1, m_cov_off, l_cov_off, n_classes, m_arr_off,
            l_arr_off,
        )
        + m_cov + l_cov + mark_arr + lig_arr
    )


def gsub_reverse_chain(
    coverage: list[int],
    substitutes: list[int],
    backtrack: list[list[int]] | None = None,
    lookahead: list[list[int]] | None = None,
) -> bytes:
    """GSUB type 8 format 1 (reverse chaining contextual single):
    ``coverage[i] -> substitutes[i]`` when the backtrack/lookahead
    coverage sequences (nearest-first) match."""
    backtrack = backtrack or []
    lookahead = lookahead or []
    n_bt, n_la, n_sub = len(backtrack), len(lookahead), len(substitutes)
    head_len = (2 + 2 + 2 + 2 * n_bt + 2 + 2 * n_la
                + 2 + 2 * n_sub)
    covs = [build_coverage(coverage)]
    offs = [head_len]
    pos = head_len + len(covs[0])
    bt_offs, la_offs = [], []
    for g in backtrack:
        b = build_coverage(g)
        bt_offs.append(pos)
        covs.append(b)
        pos += len(b)
    for g in lookahead:
        b = build_coverage(g)
        la_offs.append(pos)
        covs.append(b)
        pos += len(b)
    return (
        struct.pack(">HH", 1, offs[0])
        + struct.pack(f">H{n_bt}H", n_bt, *bt_offs)
        + struct.pack(f">H{n_la}H", n_la, *la_offs)
        + struct.pack(f">H{n_sub}H", n_sub, *substitutes)
        + b"".join(covs)
    )
