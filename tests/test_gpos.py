"""GPOS pair-positioning tests (capability extension — the reference
does no kerning, ``src/Appli.zig:343-351``).

The strongest check is differential: DejaVu ships the same kerning
data in both the legacy ``kern`` table and GPOS, so the two lookups
must agree on every pair."""

import struct

import numpy as np
import pytest

from fontrx.font.font import Font
from fontrx.font.gpos import ClassDef, Coverage, GposKernTable
from fontrx.utils.reader import BigEndianReader

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
SERIF = "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf"


class TestPrimitives:
    def test_coverage_format1(self):
        blob = struct.pack(">HHHHH", 1, 3, 5, 9, 12)
        cov = Coverage.parse(BigEndianReader(blob))
        np.testing.assert_array_equal(
            cov.rank(np.array([5, 9, 12, 6, 0])), [0, 1, 2, -1, -1]
        )

    def test_coverage_format2(self):
        blob = struct.pack(">HHHHHHHH", 2, 2, 10, 12, 0, 20, 21, 3)
        cov = Coverage.parse(BigEndianReader(blob))
        np.testing.assert_array_equal(
            cov.rank(np.array([10, 11, 12, 20, 21, 13, 9])),
            [0, 1, 2, 3, 4, -1, -1],
        )

    def test_classdef_format1(self):
        blob = struct.pack(">HHHHHH", 1, 10, 3, 7, 0, 7)
        cd = ClassDef.parse(BigEndianReader(blob))
        np.testing.assert_array_equal(
            cd.class_of(np.array([10, 11, 12, 9, 13])), [7, 0, 7, 0, 0]
        )

    def test_classdef_format2(self):
        blob = struct.pack(">HHHHHHHH", 2, 2, 5, 8, 2, 9, 9, 4)
        cd = ClassDef.parse(BigEndianReader(blob))
        np.testing.assert_array_equal(
            cd.class_of(np.array([5, 8, 9, 4, 10])), [2, 2, 4, 0, 0]
        )


class TestRealFonts:
    @pytest.mark.parametrize("path", [DEJAVU, SERIF])
    def test_gpos_agrees_with_kern_on_every_pair(self, path):
        f = Font.open(path)
        assert f.gpos_kerning is not None
        assert f.kerning is not f.gpos_kerning  # both tables present
        keys = f.kerning.keys
        lefts = (keys >> 16).astype(np.int64)
        rights = (keys & 0xFFFF).astype(np.int64)
        gv = f.gpos_kerning.lookup(lefts, rights)
        kv = f.kerning.values.astype(np.int32)
        np.testing.assert_array_equal(gv, kv)

    def test_unkerned_pairs_are_zero(self, dejavu):
        g = dejavu.gpos_kerning
        oo = dejavu.glyph_index("o")
        assert g.lookup(np.array([oo]), np.array([oo]))[0] == 0
        # glyph 0 (.notdef) never kerns
        assert g.lookup(np.array([0]), np.array([0]))[0] == 0

    def test_scalar_like_shapes(self, dejavu):
        g = dejavu.gpos_kerning
        a = dejavu.glyph_index("A")
        v = dejavu.glyph_index("V")
        out = g.lookup(a, v)  # scalars are promoted to 1-element arrays
        assert out.shape == (1,)
        assert out[0] == dejavu.kerning.lookup(
            np.array([a]), np.array([v])
        )[0]
