"""Font facade: open a ``.ttf``, resolve characters to normalized glyphs.

Behavioral equivalent of the reference's ``src/font/Font.zig``: parses the
table directory plus head/maxp/cmap/loca/glyf/hhea/hmtx, builds the
char->glyph mapping from the best cmap subtable, keeps a lazy per-glyph
cache, handles short/long ``loca`` (short offsets scale by 2) and the
empty-glyph ``loca[i] == loca[i+1]`` case, and flattens compound glyphs
recursively with cycle detection (``Font.zig:31-220``).

Re-design note: the whole file is read into memory once (fonts are a few
MB) instead of the reference's 1 KiB buffered seekable reader — random
access parsing with NumPy bulk decodes is the host-idiomatic fast path.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from fontrx.font import ttf
from fontrx.font.charmap import CharGlyphMapping
from fontrx.font.glyph import Glyph, from_component, from_simple
from fontrx.utils.log import get_logger
from fontrx.utils.reader import BigEndianReader, CorruptedFont, ensure_mono_increase

log = get_logger("Font")


@dataclass(frozen=True, slots=True)
class FontInfo:
    """Rendering-relevant font metadata (reference ``Font.Information``,
    ``Font.zig:25-29``, extended with hhea metrics for layout)."""

    units_per_em: int
    y0_baseline: bool
    loca_format: int
    ascent: int
    descent: int
    line_gap: int


class Font:
    """A parsed TrueType font with lazy glyph loading."""

    def __init__(self, data: bytes, index: int = 0):
        """``index`` selects a member font when ``data`` is a TrueType
        Collection (``ttcf``) — beyond the reference, which only
        accepts bare TrueType scalers.  TTC table offsets are
        file-absolute, so a member parses as a normal directory
        rooted at its collection offset."""
        if data[:4] in (b"wOFF", b"wOF2"):
            # web containers unwrap to a plain sfnt first (WOFF 1.0;
            # WOFF2 raises a clear unsupported error) — every
            # downstream capability is container-agnostic
            from fontrx.font.woff import decode_container

            data = decode_container(data)
        self._reader = BigEndianReader(data)
        start = 0
        if data[:4] == b"ttcf":
            offsets = ttf.parse_ttc_header(BigEndianReader(data))
            self.num_collection_fonts = len(offsets)
            if not 0 <= index < len(offsets):
                raise CorruptedFont(
                    f"TTC font index {index} out of range "
                    f"(collection has {len(offsets)})"
                )
            start = offsets[index]
        else:
            self.num_collection_fonts = 1
            if index != 0:
                raise CorruptedFont("font index given for a non-TTC file")
        self.tables = ttf.parse_table_directory(BigEndianReader(data, start))
        for tag in ttf.REQUIRED_TABLES:
            if tag not in self.tables:
                raise CorruptedFont(f"missing required table {tag!r}")

        head = ttf.Head.parse(self._at(b"head"))
        maxp = ttf.Maxp.parse(self._at(b"maxp"))
        hhea = ttf.Hhea.parse(self._at(b"hhea"))
        self.head = head
        self.maxp = maxp
        self.hhea = hhea
        self.info = FontInfo(
            units_per_em=head.units_per_em,
            y0_baseline=head.y0_is_baseline,
            loca_format=head.index_to_loc_format,
            ascent=hhea.ascent,
            descent=hhea.descent,
            line_gap=hhea.line_gap,
        )

        # char -> glyph mapping from the best cmap encoding subtable
        # (``Font.loadTTFCharGlyphMapping``, ``Font.zig:87-121``)
        self.charmap = self._load_charmap()

        # outline source: TrueType glyf/loca, or CFF for 'OTTO' fonts
        # (a capability extension; the reference rejects OTTO at the
        # scaler check, ``ttf.zig:24-31``)
        self._cff = None
        if b"glyf" in self.tables:
            for tag in ttf.GLYF_TABLES:
                if tag not in self.tables:
                    raise CorruptedFont(f"missing required table {tag!r}")
            # loca: glyph byte offsets into glyf (short offsets are *2,
            # ``Font.zig:173-192``)
            r = self._at(b"loca")
            n = maxp.num_glyphs + 1
            if head.index_to_loc_format == 0:
                self._loca = r.u16_array(n).astype(np.uint32) * 2
            else:
                self._loca = r.u32_array(n)
            ensure_mono_increase(self._loca, "loca")
            self._glyf_offset = self.tables[b"glyf"].offset
        elif b"CFF2" in self.tables:
            from fontrx.font.cff import Cff2Font

            self._cff = Cff2Font.parse(self._at(b"CFF2"))
            if self._cff.num_glyphs < maxp.num_glyphs:
                raise CorruptedFont(
                    f"CFF2 has {self._cff.num_glyphs} charstrings for "
                    f"{maxp.num_glyphs} glyphs"
                )
        elif b"CFF " in self.tables:
            from fontrx.font.cff import CffFont

            self._cff = CffFont.parse(self._at(b"CFF "))
            if self._cff.num_glyphs < maxp.num_glyphs:
                raise CorruptedFont(
                    f"CFF has {self._cff.num_glyphs} charstrings for "
                    f"{maxp.num_glyphs} glyphs"
                )
        else:
            raise CorruptedFont("no outline table (glyf, CFF  or CFF2)")

        # advance widths (``Font.loadAdvanceWidths``, ``Font.zig:123-139``)
        self.advance_widths = ttf.parse_hmtx(
            self._at(b"hmtx"), hhea.num_of_long_hor_metrics, maxp.num_glyphs
        )

        # lazy glyph cache (``Font.zig:21,60-62``)
        self._glyphs: list[Glyph | None] = [None] * maxp.num_glyphs

        # pair kerning — an extension beyond the reference (which does
        # no kerning); None when the font has no usable kern subtable
        self.kerning = None
        if b"kern" in self.tables:
            try:
                self.kerning = ttf.KernTable.parse(self._at(b"kern"))
            except Exception as e:  # malformed kern degrades to none
                log.warning("kern table unusable: %s", e)
        if self.kerning is None and b"kerx" in self.tables:
            # AAT extended kerning: same .lookup interface (ankr
            # feeds format-4 anchor attachment)
            try:
                from fontrx.font.kerx import KerxTable

                self.kerning = KerxTable.parse(
                    self._at(b"kerx"),
                    ankr=(self._at(b"ankr")
                          if b"ankr" in self.tables else None))
            except Exception as e:
                log.warning("kerx table unusable: %s", e)

        # GPOS pair positioning (modern kerning) — also an extension;
        # same .lookup interface as KernTable
        self.gpos_kerning = None
        if b"GPOS" in self.tables:
            try:
                from fontrx.font.gpos import GposKernTable

                self.gpos_kerning = GposKernTable.parse(self._at(b"GPOS"))
            except Exception as e:  # malformed GPOS degrades to none
                log.warning("GPOS table unusable: %s", e)
        if self.kerning is None:
            self.kerning = self.gpos_kerning  # layout fallback

        # GSUB standard ligatures (fi/fl/ffi...) — extension; None when
        # the font has no liga feature
        self.ligatures = None
        if b"GSUB" in self.tables:
            try:
                from fontrx.font.gsub import LigatureTable

                self.ligatures = LigatureTable.parse(self._at(b"GSUB"))
            except Exception as e:  # malformed GSUB degrades to none
                log.warning("GSUB table unusable: %s", e)

    # -- constructors ------------------------------------------------------

    @classmethod
    def open(cls, path: str | os.PathLike, index: int = 0) -> "Font":
        """Open and parse a ``.ttf``/``.ttc`` file (reference
        ``Font.initTTF``, ``Font.zig:31``; ``index`` selects a
        collection member for ``.ttc``)."""
        with open(path, "rb") as f:
            return cls(f.read(), index=index)

    # -- internals ---------------------------------------------------------

    def _at(self, tag: bytes) -> BigEndianReader:
        return BigEndianReader(self._reader.data, self.tables[tag].offset)

    def _table_bytes(self, tag: bytes) -> bytes:
        """Raw table contents (b'' when absent)."""
        entry = self.tables.get(tag)
        if entry is None:
            return b""
        return self._reader.data[entry.offset:entry.offset + entry.length]

    def _cvt_values(self) -> "np.ndarray":
        """``cvt `` control values (FWords), empty when absent."""
        entry = self.tables.get(b"cvt ")
        if entry is None:
            return np.zeros(0, np.int16)
        r = self._at(b"cvt ")
        return r.i16_array(entry.length // 2)

    def _lsb(self, index: int) -> int:
        """Left side bearing from hmtx (long metrics, then the
        run-out leftSideBearing array)."""
        if not hasattr(self, "_lsbs"):
            n_metrics = self.hhea.num_of_long_hor_metrics
            n = self.maxp.num_glyphs
            r = self._at(b"hmtx")
            pairs = np.frombuffer(
                r.data, dtype=">i2", count=2 * n_metrics, offset=r.pos)
            lsbs = np.empty(n, np.int16)
            m = min(n_metrics, n)
            lsbs[:m] = pairs[1:2 * m:2]
            if n > n_metrics:
                r.skip(4 * n_metrics)
                rest = r.i16_array(n - n_metrics)
                lsbs[n_metrics:] = rest
            self._lsbs = lsbs
        return int(self._lsbs[index])

    def _raw_glyph(self, index: int):
        """Undecoded glyph data for the hinting path: ``(description,
        SimpleGlyph | ComponentGlyph)`` or ``(None, None)`` for empty
        glyphs.  Variations are applied to the raw points so hints run
        on the varied outline (cvar CVT variations are not consumed —
        documented limitation)."""
        if self._cff is not None or not hasattr(self, "_loca"):
            raise CorruptedFont("hinting requires TrueType glyf outlines")
        if not 0 <= index < self.maxp.num_glyphs:
            raise CorruptedFont(f"glyph index {index} out of range")
        start, end = int(self._loca[index]), int(self._loca[index + 1])
        if start == end:
            return None, None
        r = BigEndianReader(self._reader.data, self._glyf_offset + start)
        desc = ttf.GlyphDescription.parse(r)
        if desc.number_of_contours >= 0:
            simple = ttf.SimpleGlyph.parse(r, desc.number_of_contours)
            return desc, self._apply_variation_simple(index, simple)
        comp = ttf.ComponentGlyph.parse(r)
        return desc, self._apply_variation_composite(index, comp)

    @property
    def has_hinting(self) -> bool:
        """True when the font carries hinting programs."""
        return (b"glyf" in self.tables
                and (b"fpgm" in self.tables or b"prep" in self.tables
                     or b"cvt " in self.tables))

    def hinting_engine(self, ppem: int):
        """Cached per-ppem hinting engine (fpgm run once per engine,
        prep per ppem — the analog of a size object)."""
        from fontrx.font.hinting import Engine

        cache = getattr(self, "_hint_engines", None)
        if cache is None:
            cache = self._hint_engines = {}
        eng = cache.get(ppem)
        if eng is None:
            eng = cache[ppem] = Engine(self, ppem)
        return eng

    def hinted_glyph(self, index: int, ppem: int):
        """Grid-fitted glyph at ``ppem``: ``(Glyph, advance)`` in
        F26Dot6 pixel units (64 units = one pixel).  The reference
        panics on instructed glyphs (``Glyph.zig:85``); this is the
        full interpreter (``fontrx.font.hinting``)."""
        from fontrx.font.hinting import hinted_glyph

        return hinted_glyph(self, index, ppem)

    def hint_context(self, ppem: int):
        """A :class:`fontrx.font.gpos_shape.HintContext` for hinted
        GPOS positioning at ``ppem``: plain device tables resolve to
        their per-size pixel deltas and format-2 contour-point anchors
        to the grid-fitted outline point (indices past the outline
        address the four phantom points, per spec).  CFF outlines
        carry no TrueType point numbering: the point resolver returns
        None and anchors degrade to their bare coordinates."""
        from fontrx.font.gpos_shape import HintContext
        from fontrx.font.hinting import hint_glyph

        cache: dict[int, object] = {}

        def point(gid: int, idx: int):
            out = cache.get(gid)
            if out is None:
                try:
                    out = hint_glyph(self, gid, ppem)
                except Exception:
                    out = False
                cache[gid] = out
            if out is False:
                return None
            n = len(out.points)
            if 0 <= idx < n:
                return int(out.points[idx, 0]), int(out.points[idx, 1])
            if n <= idx < n + 4:
                return (int(out.phantoms[idx - n, 0]),
                        int(out.phantoms[idx - n, 1]))
            return None

        return HintContext(ppem, self.info.units_per_em, point)

    def _load_charmap(self) -> CharGlyphMapping:
        r = self._at(b"cmap")
        base = r.pos
        subtables = ttf.parse_cmap_index(r)
        best = ttf.select_best_cmap_subtable(subtables)
        # try the best unicode subtable first (the reference stops here,
        # ``Font.zig:87-121``), then fall back to any other parseable
        # subtable — legacy Mac-only fonts carry format 0/6 under
        # platform 1, which fontrx supports beyond the reference
        candidates = ([best] if best is not None else []) + [
            s for s in subtables if s is not best
        ]
        last_err: Exception | None = None
        for cand in candidates:
            try:
                sub = ttf.parse_cmap_subtable(
                    BigEndianReader(r.data, base + cand.offset)
                )
            except (NotImplementedError, CorruptedFont) as e:
                # unknown/corrupt subtable: degrade to the next
                # candidate (SURVEY 5.3 graceful-degradation policy)
                last_err = e
                continue
            if cand is not best:
                log.warning(
                    "no usable unicode cmap subtable; falling back to "
                    "platform %d/%d", cand.platform_id,
                    cand.platform_specific_id,
                )
            self.cmap_subtable = sub
            return CharGlyphMapping(sub.collect_range_mappings())
        raise CorruptedFont(
            "no usable unicode cmap subtable"
            + (f" (last error: {last_err})" if last_err else "")
        )

    def _load_uvs(self) -> "ttf.CmapFormat14 | None":
        """Parse the format-14 Unicode Variation Sequences subtable
        (platform 0, encoding 5) when present — a supplement to the
        charmap, beyond the reference (``ttf.zig:349-360`` stubs it)."""
        r = self._at(b"cmap")
        base = r.pos
        for sub in ttf.parse_cmap_index(r):
            if sub.platform_id == 0 and sub.platform_specific_id == 5:
                sr = BigEndianReader(r.data, base + sub.offset)
                if sr.u16() == 14:
                    return ttf.CmapFormat14.parse(sr, base + sub.offset)
        return None

    # -- public API --------------------------------------------------------

    @property
    def num_glyphs(self) -> int:
        return self.maxp.num_glyphs

    def glyph_index(self, char: int | str) -> int:
        if isinstance(char, str):
            char = ord(char)
        return self.charmap.glyph_index(char)

    def ligature_table(self, tags: tuple[bytes, ...]):
        """LigatureSubst collected from arbitrary GSUB feature tags —
        e.g. ``(b"liga", b"rlig", b"dlig", b"hlig")`` to opt into
        discretionary/historical ligatures beyond the default set, or
        ``(b"ccmp",)`` for composition ligatures.  Cached per tag
        tuple; ``None`` when the font lacks them."""
        cache = getattr(self, "_lig_tables", None)
        if cache is None:
            cache = self._lig_tables = {}
        if tags not in cache:
            cache[tags] = None
            if b"GSUB" in self.tables:
                try:
                    from fontrx.font.gsub import LigatureTable

                    cache[tags] = LigatureTable.parse(
                        self._at(b"GSUB"), tags=tags
                    )
                except Exception as e:
                    log.warning("GSUB %s tables unusable: %s", tags, e)
        return cache[tags]

    @property
    def mark_positioning(self):
        """GPOS MarkToBase attachment (combining diacritics), or
        ``None`` — an extension beyond the reference (which has no
        positioning at all)."""
        if not hasattr(self, "_markpos"):
            self._markpos = None
            if b"GPOS" in self.tables:
                try:
                    from fontrx.font.gpos import MarkBaseTable

                    self._markpos = MarkBaseTable.parse(self._at(b"GPOS"))
                except Exception as e:  # malformed tables degrade to none
                    log.warning("GPOS mark tables unusable: %s", e)
        return self._markpos

    @property
    def mark_to_mark(self):
        """GPOS MarkToMark attachment (stacked diacritics, ``mkmk``
        features), or ``None``."""
        if not hasattr(self, "_markmark"):
            self._markmark = None
            if b"GPOS" in self.tables:
                try:
                    from fontrx.font.gpos import MarkBaseTable

                    self._markmark = MarkBaseTable.parse(
                        self._at(b"GPOS"), tag=b"mkmk", lookup_type=6
                    )
                except Exception as e:
                    log.warning("GPOS mkmk tables unusable: %s", e)
        return self._markmark

    @property
    def vertical_metrics(self):
        """``(vhea, advance_heights uint16[n], top_side_bearings
        int16[n])`` from the ``vhea``/``vmtx`` tables, or ``None`` when
        the font has no vertical layout data — a capability extension
        (the reference's pen is horizontal-only, ``Appli.zig:343-351``)."""
        if not hasattr(self, "_vmetrics"):
            self._vmetrics = None
            if b"vhea" in self.tables and b"vmtx" in self.tables:
                try:
                    vhea = ttf.Vhea.parse(self._at(b"vhea"))
                    heights, tsbs = ttf.parse_vmtx(
                        self._at(b"vmtx"),
                        vhea.num_of_long_ver_metrics,
                        self.maxp.num_glyphs,
                    )
                    self._vmetrics = (vhea, heights, tsbs)
                except Exception as e:  # malformed tables degrade to none
                    log.warning("vhea/vmtx tables unusable: %s", e)
        return self._vmetrics

    @property
    def morx(self):
        """AAT extended metamorphosis table
        (:class:`fontrx.font.morx.MorxTable`) or ``None`` — the Apple
        shaping system's substitutions, applied by the layout engine
        when the font has no GSUB (the HarfBuzz preference order)."""
        if not hasattr(self, "_morx"):
            self._morx = None
            if b"morx" in self.tables:
                try:
                    from fontrx.font.morx import MorxTable

                    self._morx = MorxTable.parse(self._at(b"morx"))
                except Exception as e:
                    log.warning("morx table unusable: %s", e)
        return self._morx

    @property
    def names(self):
        """Decoded ``name`` table records: {nameID: str} for the
        best-available encoding per ID (Windows Unicode BMP platform
        3/1 UTF-16BE preferred, Macintosh Roman 1/0 Latin-1 fallback).
        Common IDs: 1 family, 2 subfamily, 4 full name, 5 version,
        6 PostScript name.  Empty dict when the table is absent or
        unusable."""
        if not hasattr(self, "_names"):
            self._names = {}
            if b"name" in self.tables:
                try:
                    r = self._at(b"name")
                    base = r.pos
                    _fmt, count, str_off = r.unpack("HHH")
                    prefer: dict[int, tuple[int, str]] = {}
                    for _ in range(count):
                        pid, eid, _lang, nid, ln, off = r.unpack(
                            "HHHHHH")
                        if (pid, eid) == (3, 1):
                            rank, enc = 2, "utf-16-be"
                        elif (pid, eid) == (3, 10):
                            rank, enc = 2, "utf-16-be"
                        elif (pid, eid) == (1, 0):
                            rank, enc = 1, "mac-roman"
                        elif (pid, eid) == (0, 3) or pid == 0:
                            rank, enc = 2, "utf-16-be"
                        else:
                            continue
                        if prefer.get(nid, (0, ""))[0] >= rank:
                            continue
                        s = base + str_off + off
                        raw = bytes(r.data[s:s + ln])
                        try:
                            prefer[nid] = (rank, raw.decode(enc))
                        except (UnicodeDecodeError, LookupError):
                            continue
                    self._names = {k: v for k, (_, v)
                                   in prefer.items()}
                except Exception as e:
                    log.warning("name table unusable: %s", e)
        return self._names

    @property
    def family_name(self) -> str:
        """Typographic family (nameID 16 preferred, else 1)."""
        n = self.names
        return n.get(16) or n.get(1, "")

    @property
    def style_name(self) -> str:
        """Typographic subfamily (nameID 17 preferred, else 2)."""
        n = self.names
        return n.get(17) or n.get(2, "")

    @property
    def trak(self):
        """AAT tracking table (:class:`fontrx.font.trak.TrakTable`)
        or ``None`` — size-dependent letter spacing consumed by
        ``layout_text(tracking_ptem=...)``."""
        if not hasattr(self, "_trak"):
            self._trak = None
            if b"trak" in self.tables:
                try:
                    from fontrx.font.trak import TrakTable

                    self._trak = TrakTable.parse(self._at(b"trak"))
                except Exception as e:
                    log.warning("trak table unusable: %s", e)
        return self._trak

    @property
    def decoration_metrics(self):
        """``(underline_pos, underline_thickness, strikeout_pos,
        strikeout_thickness)`` in font units — ``post``
        underlinePosition/underlineThickness (position = top of the
        bar per the OT spec) and ``OS/2`` yStrikeoutPosition/Size,
        with conventional em-fraction fallbacks when the tables are
        absent or degenerate.  Variable fonts vary these through the
        MVAR ``undo``/``unds``/``stro``/``strs`` tags at the current
        design location (the layout consumer applies them via
        ``varied_metric``)."""
        if not hasattr(self, "_decometrics"):
            upem = self.info.units_per_em
            u_pos, u_thick = -round(upem * 0.1), max(round(upem * 0.05), 1)
            s_pos, s_thick = round(upem * 0.25), max(round(upem * 0.05), 1)
            if b"post" in self.tables:
                try:
                    r = self._at(b"post")
                    r.skip(8)  # version, italicAngle
                    p, t = r.unpack("hh")
                    if t > 0:
                        u_pos, u_thick = p, t
                except Exception as e:
                    log.warning("post table unusable: %s", e)
            if b"OS/2" in self.tables:
                try:
                    r = self._at(b"OS/2")
                    r.skip(26)
                    t, p = r.unpack("hh")
                    if t > 0:
                        s_pos, s_thick = p, t
                except Exception as e:
                    log.warning("OS/2 table unusable: %s", e)
            self._decometrics = (u_pos, u_thick, s_pos, s_thick)
        return self._decometrics

    @property
    def gdef(self):
        """GDEF glyph definitions (glyph classes, mark filtering) used
        by GSUB/GPOS lookup skipping, or ``None``."""
        if not hasattr(self, "_gdef"):
            self._gdef = None
            if b"GDEF" in self.tables:
                try:
                    from fontrx.font.gdef import GdefTable

                    self._gdef = GdefTable.parse(self._at(b"GDEF"))
                except Exception as e:  # malformed table degrades to none
                    log.warning("GDEF table unusable: %s", e)
        return self._gdef

    @property
    def arabic_shaper(self):
        """Font-derived Arabic positional shaping
        (:class:`fontrx.font.arabic.ArabicShaper`), or ``None`` when
        the font lacks init/medi/fina features."""
        if not hasattr(self, "_arabic"):
            self._arabic = None
            try:
                from fontrx.font.arabic import ArabicShaper

                sh = ArabicShaper(self)
                if sh.available:
                    self._arabic = sh
            except Exception as e:
                log.warning("arabic shaper unusable: %s", e)
        return self._arabic

    @property
    def indic_shaper(self):
        """Indic complex-script shaping engine
        (:class:`fontrx.font.indic.IndicShaper`), or ``None`` when the
        font carries none of the Indic basic features."""
        if not hasattr(self, "_indic"):
            self._indic = None
            try:
                from fontrx.font.indic import IndicShaper

                sh = IndicShaper(self)
                if sh.available:
                    self._indic = sh
            except Exception as e:
                log.warning("indic shaper unusable: %s", e)
        return self._indic

    @property
    def thai_shaper(self):
        """Thai/Lao preprocessing engine
        (:class:`fontrx.font.thai.ThaiShaper`): SARA AM decomposition
        and, for old-style Thai fonts without a ``thai`` GSUB script,
        the legacy PUA mark shaping."""
        if not hasattr(self, "_thai"):
            from fontrx.font.thai import ThaiShaper

            self._thai = ThaiShaper(self)
        return self._thai

    @property
    def khmer_shaper(self):
        """Khmer shaping engine
        (:class:`fontrx.font.khmer.KhmerShaper`), or ``None`` when
        the font carries none of the Khmer basic features."""
        if not hasattr(self, "_khmer"):
            self._khmer = None
            try:
                from fontrx.font.khmer import KhmerShaper

                sh = KhmerShaper(self)
                if sh.available:
                    self._khmer = sh
            except Exception as e:
                log.warning("khmer shaper unusable: %s", e)
        return self._khmer

    @property
    def myanmar_shaper(self):
        """Myanmar shaping engine
        (:class:`fontrx.font.myanmar.MyanmarShaper`), or ``None``
        when the font carries none of the Myanmar basic features."""
        if not hasattr(self, "_myanmar"):
            self._myanmar = None
            try:
                from fontrx.font.myanmar import MyanmarShaper

                sh = MyanmarShaper(self)
                if sh.available:
                    self._myanmar = sh
            except Exception as e:
                log.warning("myanmar shaper unusable: %s", e)
        return self._myanmar

    @property
    def hangul_shaper(self):
        """Hangul jamo composition engine
        (:class:`fontrx.font.hangul.HangulShaper`)."""
        if not hasattr(self, "_hangul"):
            from fontrx.font.hangul import HangulShaper

            self._hangul = HangulShaper(self)
        return self._hangul

    @property
    def use_shaper(self):
        """Universal Shaping Engine
        (:class:`fontrx.font.use.UseShaper`): always available —
        clustering/reordering are font-independent, features no-op
        when the font lacks them."""
        if not hasattr(self, "_use"):
            self._use = None
            try:
                from fontrx.font.use import UseShaper

                self._use = UseShaper(self)
            except Exception as e:
                log.warning("use shaper unusable: %s", e)
        return self._use

    def shaper(self, tags: tuple[bytes, ...]):
        """Full GSUB shaping engine (:class:`fontrx.font.shape.GsubShaper`)
        over the features tagged ``tags`` — lookup types 1-7 including
        contextual/chained-contextual, with GDEF lookup-flag skipping.
        Cached per tag tuple; ``None`` when the font has no matching
        features."""
        cache = getattr(self, "_shapers", None)
        if cache is None:
            cache = self._shapers = {}
        if tags not in cache:
            cache[tags] = None
            if b"GSUB" in self.tables:
                try:
                    from fontrx.font.shape import GsubShaper

                    cache[tags] = GsubShaper.parse(
                        self._at(b"GSUB"), tags=tags, gdef=self.gdef
                    )
                except Exception as e:
                    log.warning("GSUB shaper %s unusable: %s", tags, e)
        return cache[tags]

    def positioner(self, tags: tuple[bytes, ...]):
        """Full GPOS positioning engine
        (:class:`fontrx.font.gpos_shape.GposShaper`) over the features
        tagged ``tags`` — lookup types 1-9 including cursive
        attachment, mark-to-ligature and (chained) contextual
        positioning, with GDEF lookup-flag skipping.  Cached per tag
        tuple; ``None`` when the font has no matching features."""
        cache = getattr(self, "_positioners", None)
        if cache is None:
            cache = self._positioners = {}
        if tags not in cache:
            cache[tags] = None
            if b"GPOS" in self.tables:
                try:
                    from fontrx.font.gpos_shape import GposShaper

                    cache[tags] = GposShaper.parse(
                        self._at(b"GPOS"), tags=tags, gdef=self.gdef
                    )
                except Exception as e:
                    log.warning("GPOS positioner %s unusable: %s", tags, e)
        return cache[tags]

    @property
    def uvs(self) -> "ttf.CmapFormat14 | None":
        """The variation-sequences subtable, or ``None``."""
        if not hasattr(self, "_uvs"):
            self._uvs = self._load_uvs()
        return self._uvs

    @property
    def colr(self):
        """COLR layer table (:class:`fontrx.font.colr.ColrTable`) or
        ``None`` (monochrome font / unusable table)."""
        if not hasattr(self, "_colr"):
            self._colr = None
            if b"COLR" in self.tables:
                try:
                    from fontrx.font.colr import ColrTable

                    self._colr = ColrTable.parse(self._at(b"COLR"))
                except Exception as e:
                    log.warning("COLR unusable: %s", e)
        return self._colr

    def gasp_behavior(self, ppem: int) -> int:
        """The ``gasp`` table's rasterizer advice bits for ``ppem``:
        1 GRIDFIT, 2 DOGRAY, 4 SYMMETRIC_GRIDFIT, 8
        SYMMETRIC_SMOOTHING (OpenType gasp v0/v1).  Fonts without the
        table get the spec's recommended default for modern
        rasterizers: grid-fit + gray (0x3) at every size."""
        if not hasattr(self, "_gasp"):
            self._gasp = None
            if b"gasp" in self.tables:
                try:
                    r = self._at(b"gasp")
                    _ver, n = r.unpack("HH")
                    ranges = []
                    for _ in range(min(n, 1024)):
                        max_ppem, behavior = r.unpack("HH")
                        ranges.append((int(max_ppem), int(behavior)))
                    ranges.sort()
                    self._gasp = ranges
                except Exception as e:
                    log.warning("gasp unusable: %s", e)
        if self._gasp:
            for max_ppem, behavior in self._gasp:
                if ppem <= max_ppem:
                    return behavior
            return self._gasp[-1][1]
        return 0x3

    @property
    def sbix(self):
        """sbix bitmap-strike table
        (:class:`fontrx.font.sbix.SbixTable`) or ``None``."""
        if not hasattr(self, "_sbix"):
            self._sbix = None
            if b"sbix" in self.tables:
                try:
                    from fontrx.font.sbix import SbixTable

                    self._sbix = SbixTable.parse(
                        self._at(b"sbix"), self.maxp.num_glyphs)
                except Exception as e:
                    log.warning("sbix unusable: %s", e)
        return self._sbix

    def sbix_bitmap(self, gid: int, ppem: float):
        """Best-strike bitmap for ``gid`` at ``ppem``:
        ``(rgba uint8 [h, w, 4], origin_x, origin_y, strike_ppem)``
        or ``None`` (no sbix / no bitmap / non-PNG graphic).  Origin
        offsets are in STRIKE pixels (bottom-left of the bitmap
        relative to the glyph origin), per spec."""
        sb = self.sbix
        if sb is None:
            return None
        strike = sb.best_strike(ppem)
        if strike is None:
            return None
        entry = sb.glyph_image(strike, gid)
        from fontrx.font.sbix import decode_bitmap

        img = decode_bitmap(entry)
        if img is None:
            return None
        return img, entry[0], entry[1], strike.ppem

    @property
    def cbdt(self):
        """CBDT/CBLC bitmap table
        (:class:`fontrx.font.cbdt.CbdtTable`) or ``None``."""
        if not hasattr(self, "_cbdt"):
            self._cbdt = None
            if b"CBDT" in self.tables and b"CBLC" in self.tables:
                try:
                    from fontrx.font.cbdt import CbdtTable

                    self._cbdt = CbdtTable.parse(
                        self._at(b"CBLC"), self._at(b"CBDT"))
                except Exception as e:
                    log.warning("CBDT/CBLC unusable: %s", e)
        return self._cbdt

    @property
    def ebdt(self):
        """EBDT/EBLC monochrome/grayscale bitmap table — same wire
        structure as CBDT/CBLC at version 2
        (:class:`fontrx.font.cbdt.CbdtTable`) — or ``None``."""
        if not hasattr(self, "_ebdt"):
            self._ebdt = None
            if b"EBDT" in self.tables and b"EBLC" in self.tables:
                try:
                    from fontrx.font.cbdt import CbdtTable

                    self._ebdt = CbdtTable.parse(
                        self._at(b"EBLC"), self._at(b"EBDT"))
                except Exception as e:
                    log.warning("EBDT/EBLC unusable: %s", e)
        return self._ebdt

    def embedded_bitmap(self, gid: int, ppem: float, exact: bool = True):
        """Embedded monochrome/grayscale strike for ``gid``:
        ``(alpha uint8 [h, w], bearing_x, bottom, advance,
        strike_ppem)`` in strike pixels, or ``None``.  ``exact``
        restricts to a strike at exactly ``round(ppem)`` — fixed-size
        bitmaps are only faithful unscaled (the FreeType rule);
        ``exact=False`` falls back to the best strike for scaling
        consumers."""
        eb = self.ebdt
        if eb is None:
            return None
        strike = (eb.exact_strike(ppem) if exact
                  else eb.best_strike(ppem))
        if strike is None:
            return None
        entry = eb.glyph_alpha(strike, gid)
        if entry is None:
            return None
        alpha, bx, bottom, adv = entry
        return alpha, bx, bottom, adv, strike.ppem

    def color_bitmap(self, gid: int, ppem: float):
        """Best bitmap glyph across the bitmap families:
        ``(rgba uint8 [h, w, 4], left, bottom, strike_ppem)`` with
        left/bottom the bitmap's bottom-left corner relative to the
        glyph origin in STRIKE pixels, or ``None``.  sbix (Apple)
        takes precedence, then CBDT/CBLC (Google)."""
        sb = self.sbix_bitmap(gid, ppem)
        if sb is not None:
            return sb
        cb = self.cbdt
        if cb is None:
            return None
        strike = cb.best_strike(ppem)
        if strike is None:
            return None
        entry = cb.glyph_image(strike, gid)
        if entry is None:
            return None
        bx, bottom, png = entry
        from fontrx.font.sbix import decode_bitmap

        img = decode_bitmap((0, 0, b"png ", png))
        if img is None:
            return None
        return img, bx, bottom, strike.ppem

    @property
    def cpal(self):
        """CPAL palette table (:class:`fontrx.font.colr.CpalTable`) or
        ``None``."""
        if not hasattr(self, "_cpal"):
            self._cpal = None
            if b"CPAL" in self.tables:
                try:
                    from fontrx.font.colr import CpalTable

                    self._cpal = CpalTable.parse(self._at(b"CPAL"))
                except Exception as e:
                    log.warning("CPAL unusable: %s", e)
        return self._cpal

    def color_layers(
        self, gid: int, palette: int = 0,
        foreground: tuple[int, int, int, int] = (0, 0, 0, 255),
    ) -> list[tuple[int, tuple[int, int, int, int]]] | None:
        """Ordered ``[(layer_gid, rgba), ...]`` painting bottom-to-top
        for a color glyph, or ``None`` when ``gid`` has no COLR v0
        layers (callers render the monochrome outline).  Needs both
        COLR and CPAL; the 0xFFFF palette sentinel resolves to
        ``foreground``, per spec."""
        colr, cpal = self.colr, self.cpal
        if colr is None or cpal is None:
            return None
        # v1 paint graphs take precedence when they flatten to solid
        # fills; gradient-bearing graphs are served by
        # color_paint_layers (this flat-color API falls back to the
        # v0 record for them)
        v1 = colr.layers_v1(gid, getattr(self, "_var_coords", None))
        if v1 is not None and all(
                f[0] == "solid" and xf is None for _, f, xf in v1):
            out = []
            for lg, (_, pe, alpha), _xf in v1:
                r, g, b, a = cpal.color(palette, pe, foreground)
                out.append((lg, (r, g, b, int(round(a * alpha)))))
            return out
        layers = colr.layers(gid)
        if layers is None:
            return None
        return [
            (lg, cpal.color(palette, pe, foreground))
            for lg, pe in layers
        ]

    def color_paint_layers(
        self, gid: int, palette: int = 0,
        foreground: tuple[int, int, int, int] = (0, 0, 0, 255),
    ) -> list[tuple[int, tuple]] | None:
        """Ordered ``[(layer_gid, paint, affine_or_None), ...]``
        with palette-resolved paints — the gradient- and
        transform-capable superset of :meth:`color_layers` (the affine
        maps the layer's local space into glyph space; outlines
        transform forward, gradient fields inverse-map):

        - ``("solid", (r, g, b, a))``
        - ``("linear", (x0, y0, x1, y1, x2, y2), extend, stops)``
        - ``("radial", (x0, y0, r0, x1, y1, r1), extend, stops)``

        with ``stops = [(offset, (r, g, b, a)), ...]`` sorted;
        ``extend``: 0 pad / 1 repeat / 2 reflect.  ``None`` when the
        glyph has no COLR layers (v1-preferred, v0 fallback)."""
        colr, cpal = self.colr, self.cpal
        if colr is None or cpal is None:
            return None

        def rgba(entry, alpha):
            r, g, b, a = cpal.color(palette, entry, foreground)
            return (r, g, b, int(round(a * alpha)))

        v1 = colr.layers_v1(gid, getattr(self, "_var_coords", None))
        if v1 is not None:
            out = []
            for lg, f, xf in v1:
                if f[0] == "solid":
                    out.append((lg, ("solid", rgba(f[1], f[2])), xf))
                else:
                    kind, geom, extend, stops = f
                    out.append((lg, (
                        kind, geom, extend,
                        [(off, rgba(pe, al)) for off, pe, al in stops],
                    ), xf))
            return out
        layers = colr.layers(gid)
        if layers is None:
            return None
        return [
            (lg, ("solid", cpal.color(palette, pe, foreground)), None)
            for lg, pe in layers
        ]

    def color_paint_tree(
        self, gid: int, palette: int = 0,
        foreground: tuple[int, int, int, int] = (0, 0, 0, 255),
    ):
        """``gid``'s palette-resolved COLR render tree (the
        PaintComposite-capable superset of :meth:`color_paint_layers`):

        - ``("glyph", layer_gid, paint, affine_or_None)``
        - ``("layers", [child, ...])`` — src-over bottom-to-top
        - ``("composite", mode, source, backdrop)`` — Porter-Duff
          modes 0-12

        ``None`` when the glyph has no COLR record (v1 preferred; a
        v0 record becomes a ``("layers", [glyph...])`` stack).  OT-SVG
        documents serve as the fallback family: when COLR has nothing
        for ``gid`` but the ``SVG `` table covers it, the lowered SVG
        tree (``("outline", Glyph, paint, xf)`` leaves,
        :mod:`fontrx.font.svgdoc`) is returned instead."""
        colr, cpal = self.colr, self.cpal
        if colr is None or cpal is None:
            return self._svg_paint_tree(gid, foreground)

        def rgba(entry, alpha):
            r, g, b, a = cpal.color(palette, entry, foreground)
            return (r, g, b, int(round(a * alpha)))

        def resolve(f):
            if f[0] == "solid":
                return ("solid", rgba(f[1], f[2]))
            kind, geom, extend, stops = f
            return (kind, geom, extend,
                    [(off, rgba(pe, al)) for off, pe, al in stops])

        tree = colr.paint_tree(gid, getattr(self, "_var_coords", None))
        if tree is not None:
            def conv(node):
                if node[0] == "glyph":
                    return ("glyph", node[1], resolve(node[2]),
                            node[3])
                if node[0] == "layers":
                    return ("layers", [conv(k) for k in node[1]])
                return ("composite", node[1], conv(node[2]),
                        conv(node[3]))
            return conv(tree)
        layers = colr.layers(gid)
        if layers is None:
            return self._svg_paint_tree(gid, foreground)
        return ("layers", [
            ("glyph", lg,
             ("solid", cpal.color(palette, pe, foreground)), None)
            for lg, pe in layers
        ])

    @property
    def svg(self):
        """``SVG `` table (:class:`fontrx.font.svgtable.SvgTable`) or
        ``None``."""
        if not hasattr(self, "_svg"):
            self._svg = None
            if b"SVG " in self.tables:
                try:
                    from fontrx.font.svgtable import SvgTable

                    self._svg = SvgTable.parse(self._at(b"SVG "))
                except Exception as e:
                    log.warning("SVG table unusable: %s", e)
        return self._svg

    def _svg_paint_tree(self, gid: int, foreground):
        """OT-SVG fallback for :meth:`color_paint_tree`: the glyph's
        SVG document lowered to a COLR-style render tree with
        ``("outline", Glyph, paint, xf)`` leaves
        (:mod:`fontrx.font.svgdoc`), or ``None``."""
        svg = self.svg
        if svg is None:
            return None
        try:
            doc = svg.document(gid)
        except Exception as e:
            log.warning("SVG document for glyph %d unusable: %s", gid, e)
            return None
        if doc is None:
            return None
        if not hasattr(self, "_svg_docs"):
            self._svg_docs = {}
        parsed = self._svg_docs.get(doc)
        if parsed is None:
            from fontrx.font.svgdoc import SvgDocument

            try:
                parsed = SvgDocument(doc, self.info.units_per_em)
            except ValueError as e:
                log.warning("SVG document unusable: %s", e)
                parsed = False
            self._svg_docs[doc] = parsed
        if parsed is False:
            return None
        try:
            return parsed.glyph_tree(gid, foreground)
        except Exception as e:
            log.warning("SVG glyph %d render failed: %s", gid, e)
            return None

    def glyph_index_variant(self, char: int | str, selector: int) -> int:
        """Char->glyph resolution honoring a Unicode variation selector
        (U+FE00..FE0F, U+E0100..E01EF).  Sequences absent from the
        format-14 table fall back to the base glyph, per spec."""
        if isinstance(char, str):
            char = ord(char)
        if self.uvs is not None:
            g = self.uvs.glyph_for_variant(
                char, selector, self.charmap.glyph_index
            )
            if g is not None:
                return g
        return self.charmap.glyph_index(char)

    def get_glyph(self, char: int | str) -> tuple[Glyph, int]:
        """Resolve a character to ``(glyph, advance_width)``
        (reference ``Font.getGlyph``, ``Font.zig:161-169``).  At a
        variation location the advance is the varied one, consistent
        with layout."""
        idx = self.glyph_index(char)
        return self.load_glyph(idx), self.varied_advance(idx)

    def load_glyph(self, index: int, _track: tuple[int, ...] = ()) -> Glyph:
        """Load (and cache) glyph by index, recursing into compound
        components with explicit cycle detection
        (``Font.loadGlyph``, ``Font.zig:171-220``)."""
        if not 0 <= index < self.maxp.num_glyphs:
            raise CorruptedFont(f"glyph index {index} out of range")
        cached = self._glyphs[index]
        if cached is not None:
            return cached
        if index in _track:
            raise CorruptedFont(f"compound glyph cycle at index {index}")

        if self._cff is not None:
            glyph = self._cff.glyph(
                index, getattr(self, "_var_coords", None)
            )
            self._glyphs[index] = glyph
            return glyph
        start, end = int(self._loca[index]), int(self._loca[index + 1])
        if start == end:  # empty glyph (``Font.zig:186-192``)
            glyph = Glyph.empty()
            # outline-less glyphs (space) still carry gvar phantom
            # deltas that vary their advance on HVAR-less fonts
            coords = getattr(self, "_var_coords", None)
            if coords is not None and self.gvar is not None:
                d = self.gvar.deltas(index, coords, 0, None, None)
                self._var_adv = getattr(self, "_var_adv", {})
                if d is not None:
                    dx, _dy = d
                    self._var_adv[index] = int(np.floor(dx[1] - dx[0] + 0.5))
                else:
                    self._var_adv[index] = 0
        else:
            r = BigEndianReader(self._reader.data, self._glyf_offset + start)
            desc = ttf.GlyphDescription.parse(r)
            if desc.number_of_contours >= 0:
                simple = ttf.SimpleGlyph.parse(r, desc.number_of_contours)
                simple = self._apply_variation_simple(index, simple)
                glyph = from_simple(desc, simple)
            else:
                comp = ttf.ComponentGlyph.parse(r)
                comp = self._apply_variation_composite(index, comp)
                resolve = {
                    part.glyph_index: self.load_glyph(
                        part.glyph_index, _track + (index,)
                    )
                    for part in comp.parts
                }
                glyph = from_component(desc, comp, resolve)
                if comp.metrics_index is not None:
                    # USE_MY_METRICS: the composite takes the flagged
                    # component's metrics — patch the advance table so
                    # every consumer (layout, packing) sees it.  Most
                    # fonts keep hmtx consistent (the HarfBuzz
                    # differential pins that), so this is usually a
                    # no-op; it matters when they don't.
                    src = comp.parts[comp.metrics_index].glyph_index
                    if (0 <= src < len(self.advance_widths)
                            and src != index):
                        self.advance_widths[index] = (
                            self.advance_widths[src])
        if getattr(self, "_var_coords", None) is not None and glyph.contours:
            # the glyf-header bbox is the STATIC box; varied outlines
            # need a recomputed one or raster grids would clip them
            from fontrx.font.glyph import Box

            allp = np.concatenate([c.points for c in glyph.contours])
            glyph = Glyph(
                Box(int(allp[:, 0].min()), int(allp[:, 1].min()),
                    int(allp[:, 0].max()), int(allp[:, 1].max())),
                glyph.contours,
            )
        log.debug("loaded glyph %d (%d segments)", index, glyph.num_segments)
        self._glyphs[index] = glyph
        return glyph

    def dump_charmap(self, limit: int = 32) -> str:
        """Human-readable cmap dump for debugging (the analog of the
        reference's subtable dumper, ``Font.zig:224-278``)."""
        lines = [
            f"cmap: {type(self.cmap_subtable).__name__}, "
            f"{len(self.charmap)} ranges"
        ]
        for r in self.charmap.ranges[:limit]:
            first_char = r.end_char - r.char_count
            first_glyph = r.end_glyph - 1 - (r.char_count - 1) * r.stride
            lines.append(
                f"  U+{first_char:04X}..U+{r.end_char - 1:04X} -> "
                f"glyphs {max(first_glyph, 0)}..{r.end_glyph - 1}"
                + ("  (constant)" if r.stride == 0 and r.end_glyph else "")
                + ("  (unmapped)" if r.end_glyph == 0 else "")
            )
        if len(self.charmap) > limit:
            lines.append(f"  ... {len(self.charmap) - limit} more ranges")
        return "\n".join(lines)

    # -- variable fonts (fvar/gvar; capability extension) ------------------

    @property
    def fvar(self):
        """Parsed ``fvar`` axes, or ``None`` for a static font."""
        if not hasattr(self, "_fvar"):
            self._fvar = None
            if b"fvar" in self.tables:
                try:
                    from fontrx.font.variations import Fvar

                    self._fvar = Fvar.parse(self._at(b"fvar"))
                except Exception as e:
                    log.warning("fvar unusable: %s", e)
        return self._fvar

    @property
    def gvar(self):
        if not hasattr(self, "_gvar"):
            self._gvar = None
            if b"gvar" in self.tables:
                try:
                    from fontrx.font.variations import Gvar

                    self._gvar = Gvar.parse(
                        self._at(b"gvar"), self.maxp.num_glyphs
                    )
                except Exception as e:
                    log.warning("gvar unusable: %s", e)
        return self._gvar

    def set_variation(self, axes: dict | None = None, **kw) -> None:
        """Select a variable-font design location, e.g.
        ``font.set_variation(wght=700)`` — user-space coordinates,
        clamped to the axis ranges, remapped through ``avar`` when
        present.  Clears the glyph cache; subsequent glyph loads apply
        the interpolated ``gvar`` deltas.  A no-op (with a warning) on
        static fonts."""
        user: dict[bytes, float] = {}
        for k, v in {**(axes or {}), **kw}.items():
            tag = k if isinstance(k, bytes) else k.encode("ascii")
            user[tag[:4].ljust(4)] = float(v)
        fv = self.fvar
        if fv is None:
            log.warning("set_variation on a non-variable font: ignored")
            return
        norm = fv.normalize(user)
        if b"avar" in self.tables:
            try:
                from fontrx.font.variations import Avar

                norm = Avar.parse(
                    self._at(b"avar"), len(fv.axes)
                ).apply(norm)
                # conforming implementations (fontTools instancer,
                # FreeType) re-quantize avar's output to F2DOT14 too
                norm = np.round(norm * 16384.0) / 16384.0
            except Exception as e:
                log.warning("avar unusable: %s", e)
        self._var_coords = None if not norm.any() else norm
        self._var_user = dict(user)  # user-space location (for UIs)
        self._glyphs = [None] * self.maxp.num_glyphs
        self._var_adv = {}

    def _apply_variation_simple(self, index, simple):
        coords = getattr(self, "_var_coords", None)
        if coords is None or self.gvar is None:
            return simple
        n = len(simple.coordinates)
        d = self.gvar.deltas(
            index, coords, n, simple.end_pts_of_contours,
            simple.coordinates,
        )
        if d is None:
            return simple
        dx, dy = d
        moved = simple.coordinates.astype(np.float64)
        moved[:, 0] += dx[:n]
        moved[:, 1] += dy[:n]
        # otRound (round half up), matching fontTools' instancer
        moved = np.floor(moved + 0.5).astype(np.int32)
        # phantom points 0/1 carry the varied advance width
        self._var_adv = getattr(self, "_var_adv", {})
        self._var_adv[index] = int(
            np.floor((dx[n + 1] - dx[n]) + 0.5)
        )
        # phantom points 2/3 (top/bottom origins) carry the vertical
        # metrics: advance height = top - bottom; the varied tsb =
        # (varied top origin) - (varied yMax) — fonts whose VVAR lacks
        # a tsbMapping compute tsb this way per spec
        if n >= 1 and len(dy) >= n + 4:
            self._var_vadv = getattr(self, "_var_vadv", {})
            self._var_vadv[index] = int(
                np.floor((dy[n + 2] - dy[n + 3]) + 0.5)
            )
            self._var_vtsb = getattr(self, "_var_vtsb", {})
            ymax_pre = (
                int(simple.coordinates[:, 1].max()) if n else 0
            )
            ymax_post = int(moved[:, 1].max()) if n else 0
            self._var_vtsb[index] = (
                int(np.floor(dy[n + 2] + 0.5)) + ymax_pre - ymax_post
            )
        import dataclasses as _dc

        return _dc.replace(simple, coordinates=moved)

    def _apply_variation_composite(self, index, comp):
        coords = getattr(self, "_var_coords", None)
        if coords is None or self.gvar is None:
            return comp
        n = len(comp.parts)
        d = self.gvar.deltas(index, coords, n, None, None)
        if d is None:
            return comp
        dx, dy = d
        import dataclasses as _dc

        parts = []
        for i, p in enumerate(comp.parts):
            if p.args_are_xy_values and (dx[i] or dy[i]):
                parts.append(_dc.replace(
                    p,
                    argument1=int(np.floor(p.argument1 + dx[i] + 0.5)),
                    argument2=int(np.floor(p.argument2 + dy[i] + 0.5)),
                ))
            else:
                parts.append(p)
        self._var_adv = getattr(self, "_var_adv", {})
        self._var_adv[index] = int(np.floor((dx[n + 1] - dx[n]) + 0.5))
        return _dc.replace(comp, parts=tuple(parts))

    @property
    def hvar(self):
        """Parsed ``HVAR`` advance-variation table, or ``None``."""
        if not hasattr(self, "_hvar"):
            self._hvar = None
            if b"HVAR" in self.tables:
                try:
                    from fontrx.font.variations import Hvar

                    self._hvar = Hvar.parse(self._at(b"HVAR"))
                except Exception as e:
                    log.warning("HVAR unusable: %s", e)
        return self._hvar

    @property
    def vvar(self):
        """Parsed ``VVAR`` vertical-metric-variation table, or
        ``None``."""
        if not hasattr(self, "_vvar"):
            self._vvar = None
            if b"VVAR" in self.tables:
                try:
                    from fontrx.font.variations import Vvar

                    self._vvar = Vvar.parse(self._at(b"VVAR"))
                except Exception as e:
                    log.warning("VVAR unusable: %s", e)
        return self._vvar

    def varied_advance_height(self, index: int, base: int) -> int:
        """Vertical advance height at the current variation location:
        ``base`` (the ``vmtx`` value) plus the VVAR delta, or the gvar
        vertical-phantom delta (top - bottom origin) on VVAR-less
        fonts."""
        coords = getattr(self, "_var_coords", None)
        if coords is None:
            return base
        vv = self.vvar
        if vv is not None:
            return base + int(
                np.floor(vv.advance_delta(index, coords) + 0.5))
        vadv = getattr(self, "_var_vadv", {})
        if index not in vadv:
            self.load_glyph(index)  # populates the phantom deltas
            vadv = getattr(self, "_var_vadv", {})
        return base + vadv.get(index, 0)

    def varied_tsb(self, index: int, base: int) -> int:
        """Top side bearing at the current variation location: the
        VVAR tsbMapping when present; otherwise computed from the gvar
        top-origin phantom and the varied outline's yMax (the spec
        fallback — fontTools' instancer recalculates vmtx the same
        way)."""
        coords = getattr(self, "_var_coords", None)
        if coords is None:
            return base
        vv = self.vvar
        if vv is not None and vv.tsb_map is not None:
            return base + int(np.floor(vv.tsb_delta(index, coords) + 0.5))
        vtsb = getattr(self, "_var_vtsb", {})
        if index not in vtsb:
            self.load_glyph(index)
            vtsb = getattr(self, "_var_vtsb", {})
        return base + vtsb.get(index, 0)

    @property
    def mvar(self):
        """Parsed ``MVAR`` metric-variation table, or ``None``."""
        if not hasattr(self, "_mvar"):
            self._mvar = None
            if b"MVAR" in self.tables:
                try:
                    from fontrx.font.variations import Mvar

                    self._mvar = Mvar.parse(self._at(b"MVAR"))
                except Exception as e:
                    log.warning("MVAR unusable: %s", e)
        return self._mvar

    def varied_metric(self, tag: bytes, base: int) -> int:
        """A font-wide metric at the current variation location:
        ``base`` plus the MVAR delta for ``tag`` (``b"hasc"`` hhea
        ascent, ``b"hdsc"`` descent, ``b"hlgp"`` line gap, ...)."""
        coords = getattr(self, "_var_coords", None)
        mv = self.mvar
        if coords is None or mv is None:
            return base
        return base + int(np.floor(mv.delta(tag, coords) + 0.5))

    def varied_advance(self, index: int) -> int:
        """Advance width at the current variation location.  ``HVAR``
        deltas when the font has them (the spec-preferred source —
        optimized fonts strip gvar phantom deltas); otherwise the
        phantom-point deltas from gvar.  The base width when
        unvaried."""
        base = int(self.advance_widths[index])
        coords = getattr(self, "_var_coords", None)
        if coords is None:
            return base
        hv = self.hvar
        if hv is not None:
            return base + int(np.floor(hv.advance_delta(index, coords) + 0.5))
        adv = getattr(self, "_var_adv", {})
        if index not in adv:
            self.load_glyph(index)  # populates the phantom delta
        return base + adv.get(index, 0)

    def load_glyph_safe(self, index: int) -> Glyph:
        """Fallible per-glyph loading for batch pipelines: structural
        failures degrade to an empty glyph with a warning instead of
        aborting the batch (SURVEY §5.3 — mask out bad glyphs rather
        than abort)."""
        try:
            return self.load_glyph(index)
        except (CorruptedFont, NotImplementedError) as e:
            log.warning("glyph %d failed to load (%s); masking as empty",
                        index, e)
            return Glyph.empty()
